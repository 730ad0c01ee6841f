"""Engine-portable decimal rounding of double columns.

Spark's ``F.round`` on a DOUBLE rounds the value's SHORTEST DECIMAL
STRING (java ``BigDecimal.valueOf(double)``, i.e. ``Double.toString``)
HALF_UP, while DuckDB/C++ engines round the BINARY value
(``std::round(x * 10^d) / 10^d``). At half-ulp boundaries the two
disagree: ``202.3904499999999987...`` prints as ``"202.39045"``, so Spark
rounds it UP to 202.3905 while the binary value rounds DOWN to 202.3904.
Rare per row (~1e-5 at 4 dp) but a certainty over enough rows — observed
twice across 77 oracled queries at sf0.1.

``round_col`` reproduces the binary-value rule inside Spark:

    sign(x) * floor(|x| * 10^d + 0.5) / 10^d

Empirically bit-identical to DuckDB ``ROUND(x, d)`` over 50k random +
800 adversarial boundary values at d in {2, 4, 6} (and the identity is
exact whenever ``|x| * 10^d + 0.5`` is exactly representable, i.e. for
everything far below 2^52). Rounding the binary value is also the more
principled semantic: it rounds the number the column actually holds,
not its print form. NULL propagates; NaN/±Inf pass through unchanged
(``floor``'s long cast would reject them under ANSI).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_col(c: Column | str, d: int, expensive: bool = False) -> Column:
    """DuckDB-exact rounding of a double column to ``d`` decimals.

    The NaN/Inf-guarded form references its argument six times, and
    Catalyst does NOT eliminate common subexpressions across CASE
    branches — with a costly argument (a regex ratio, an array/zip_with
    pipeline) the recompute measured ~5x the cost of the rounding itself.
    Pass ``expensive=True`` for such arguments: the input is then
    let-bound ONCE via transform-over-a-singleton-array before the
    branches reference it. The binding is not the default because the
    higher-order-function detour itself costs ~0.2s per 600k rows and
    column — a bad trade for the common case of rounding a plain column
    or aggregate (whose re-reference is free)."""
    col = F.col(c) if isinstance(c, str) else c
    s = F.lit(float(10**d))

    def body(x: Column) -> Column:
        finite = ~(F.isnan(x) | (F.abs(x) == float("inf")))
        scaled = F.abs(x) * s
        # Saturation guard: F.floor on a double yields BIGINT, which
        # saturates at Long.MAX — round_col(1e30, 2) would silently return
        # ~9.22e16. Once |x|*10^d >= 2^52 the double's ulp is >= 1, so the
        # scaled value has no fractional part and rounding is a no-op on
        # the binary value: pass x through unchanged. NOTE: DuckDB ROUND
        # does NOT agree up here — it still computes round(x*10^d)/10^d,
        # whose x*10^d step is LOSSY once it exceeds 2^53 (measured:
        # ROUND(810485591333.0, 6) = 810485591332.9999). Oracle SQL must
        # therefore not apply ROUND to columns that can reach |x| >=
        # 2^52/10^d — emit such values unrounded on both sides (they are
        # only hash-comparable when exact anyway, e.g. integral moments).
        return F.when(
            x.isNotNull() & finite & (scaled < F.lit(float(2**52))),
            F.signum(x) * F.floor(scaled + F.lit(0.5)) / s,
        ).otherwise(x)

    if expensive:
        return F.element_at(F.transform(F.array(col.cast("double")), body), 1)
    return body(col.cast("double"))
