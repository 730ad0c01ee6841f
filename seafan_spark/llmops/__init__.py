"""llmops — large-scale training-data pipeline operators.

Beyond the reference's surface (these have no seafan counterpart): the
operator families a 100 TB LLM-data pipeline needs, designed Spark-first:

- ``text``       language-ID heuristic, quality scoring, token counting,
                 fingerprinting — pure JVM Column expressions.
- ``dedup``      exact (fingerprint), MinHash+LSH banding, SimHash,
                 exact n-gram Jaccard — shuffle-conscious candidate
                 generation, no O(n^2) stages.
- ``similarity`` embedding cosine: brute-force top-k baseline and
                 hyperplane-LSH bucketed variant for scale.
- ``multimodal`` binary media columns with typed metadata; decode/resize/
                 frame-sample plumbing as Arrow-batched pandas iterators
                 (decoders stubbed — image/audio libs not in this
                 environment; schema/partitioning/batching are real).
- ``lm``         n-gram LM perplexity filtering as relational algebra.
- ``labels``     annotator-reliability statistics (Cohen/Fleiss kappa)
                 for preference / classification label quality.
- ``versioning`` corpus snapshot diff by fingerprint — what changed
                 between two corpus versions, text never shuffled.
"""

from seafan_spark.llmops import (  # noqa: F401
    dedup,
    labels,
    lm,
    multimodal,
    similarity,
    text,
    versioning,
)
