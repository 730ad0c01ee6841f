"""Text analysis operators — all pure JVM Column expressions (no UDFs):
token counting, character-class ratios, a deterministic quality score,
n-gram-free stopword language ID, and content fingerprinting.

Every formula here is deliberately expressible in ANSI SQL so the DuckDB
oracle can verify it value-for-value at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small per-language stopword probes (word-boundary counted, lowercased)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "que", "los", "una"],
    "fr": ["le", "les", "des", "est", "une"],
    "zh": ["de", "shi", "zai", "le", "he"],
}


def norm_text_col(text: Column) -> Column:
    """Lowercase, trim, collapse whitespace — the canonical form used by
    fingerprints and dedup."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def token_count_col(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def char_count_col(text: Column) -> Column:
    return F.length(text)


def _class_ratio(text: Column, pattern: str) -> Column:
    """Fraction of characters matching a regex character class."""
    n = F.length(text)
    kept = F.length(F.regexp_replace(text, pattern, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise((n - kept).cast("double") / n)


def punct_ratio_col(text: Column) -> Column:
    return _class_ratio(text, r"[.,;:!?'\"()\[\]{}\-]")


def digit_ratio_col(text: Column) -> Column:
    return _class_ratio(text, r"[0-9]")


def upper_ratio_col(text: Column) -> Column:
    return _class_ratio(text, r"[A-Z]")


def avg_token_len_col(text: Column) -> Column:
    """Mean token length: non-space chars / token count."""
    t = F.trim(text)
    toks = token_count_col(text)
    nonspace = F.length(F.regexp_replace(t, r"\s+", ""))
    return F.when(toks == 0, F.lit(0.0)).otherwise(nonspace.cast("double") / toks)


def stopword_hits_col(text: Column, words: list[str]) -> Column:
    """Total word-boundary occurrences of the given words (lowercased).
    Counted by padding with spaces and counting ' word ' substrings —
    the same length-difference trick as strCount, so the SQL twin is
    mechanical."""
    padded = F.concat(F.lit(" "), norm_text_col(text), F.lit(" "))
    total = F.lit(0).cast("long")
    for w in words:
        needle = f" {w} "
        cnt = (
            (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
            / F.lit(len(needle))
        ).cast("long")
        total = total + cnt
    return total


def lang_id_col(text: Column, langs: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts;
    ties resolve to the alphabetically-first language (deterministic).
    Zero hits everywhere -> 'und' (undetermined)."""
    langs = langs or LANG_STOPWORDS
    hits = {lang: stopword_hits_col(text, ws) for lang, ws in sorted(langs.items())}
    best_lang = F.lit("und")
    best_hits = F.lit(0).cast("long")
    # iterate descending-alphabetical so earlier alphabet wins ties with >
    for lang in sorted(hits, reverse=True):
        h = hits[lang]
        cond = h >= best_hits
        # strictly-greater keeps the later (alphabetically earlier) winner
        best_lang = F.when(h >= best_hits, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, h).otherwise(best_hits)
    return F.when(best_hits == 0, F.lit("und")).otherwise(best_lang)


def quality_score_col(text: Column) -> Column:
    """Deterministic [0,1] quality score:

        0.4 * min(tokens, 100)/100            (enough content)
      + 0.3 * (1 - min(punct_ratio*4, 1))     (not punctuation soup)
      + 0.3 * clamp((avg_token_len-2)/6, 0, 1) (real words)

    The exact formula is arbitrary by design; what matters is that it is
    pure column arithmetic (scales to any corpus) and SQL-mirrorable.
    """
    toks = token_count_col(text).cast("double")
    punct = punct_ratio_col(text)
    awl = avg_token_len_col(text)
    c1 = F.least(toks, F.lit(100.0)) / F.lit(100.0)
    c2 = F.lit(1.0) - F.least(punct * 4, F.lit(1.0))
    c3 = F.least(F.greatest((awl - 2) / 6, F.lit(0.0)), F.lit(1.0))
    return F.round(0.4 * c1 + 0.3 * c2 + 0.3 * c3, 6)


def fingerprint_col(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text. md5 (not xxhash)
    because it is reproducible across engines — the DuckDB oracle computes
    the identical digest."""
    return F.md5(norm_text_col(text))


def shingles_col(text: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of the normalized text (basis for
    MinHash). JVM higher-order functions; short texts yield the whole
    text as a single shingle."""
    t = norm_text_col(text)
    n = F.length(t)
    return F.when(n <= k, F.array(t)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k) + 1),
                lambda i: t.substr(i, F.lit(k)),
            )
        )
    )


def word_ngrams_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams of the normalized text."""
    toks = F.split(norm_text_col(text), " ")
    cnt = F.size(toks)
    return F.when(cnt < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), cnt - F.lit(n)),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    )
