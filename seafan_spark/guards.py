"""Row-count guards for deliberate small-data compatibility paths.

A few operators intentionally centralize data (positional subset/row over a
global row number, expression-language ``index()``'s per-row gather, the
exact all-pairs cosine oracle path). They are correct but must not be
pointed at a 100 TB table by accident — each calls :func:`assert_small`
first so misuse fails loudly with a pointer to the scale path instead of
OOMing a task or the driver.

The ceiling is configurable via the ``SEAFAN_SMALL_DATA_LIMIT`` env var.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

def _default_limit() -> int:
    # read per call: the env var is documented as a runtime override, so a
    # value set after import must be honored
    return int(os.environ.get("SEAFAN_SMALL_DATA_LIMIT", "2000000"))


class SmallDataLimitError(ValueError):
    pass


def assert_small(
    df: DataFrame, op: str, limit: int | None = None, scale_hint: str = ""
) -> int:
    """Raise if ``df`` exceeds the small-data row ceiling; returns the count.

    Costs one count() action — negligible next to the centralized work the
    guarded operator is about to do, and infinitely cheaper than the OOM.
    """
    cap = _default_limit() if limit is None else limit
    n = df.count()
    if n > cap:
        hint = f" {scale_hint}" if scale_hint else ""
        raise SmallDataLimitError(
            f"{op}: {n} rows exceeds the small-data limit {cap} "
            f"(set SEAFAN_SMALL_DATA_LIMIT to override).{hint}"
        )
    return n
