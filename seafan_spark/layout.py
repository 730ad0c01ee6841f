"""Data-layout optimization — multi-dimensional clustering and compaction.

At 100 TB the cheapest query is the one that never reads the data:
parquet row-group min/max statistics let Spark skip row groups whose
range can't match a filter, but only if the data is LAID OUT so those
ranges are tight. Sorting clusters one column; Z-ORDERING (Morton-code
interleaving of several columns' bits) keeps row-group ranges tight on
ALL the interleaved columns at once — the standard layout for tables
filtered on multiple independent dimensions (Delta/Iceberg OPTIMIZE
ZORDER; implemented here on plain parquet with pure Column bit
arithmetic).

``compact_parquet`` addresses the other layout killer: millions of
small files from incremental jobs. One range-free repartition to
size-targeted files, no logic change.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled_rank_col(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear position of ``c`` in [lo, hi] scaled to [0, 2^bits)
    (clamped; NULL -> 0 so null rows cluster together)."""
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    pos = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.greatest(pos, F.lit(0.0)), F.lit(1.0))
    return F.coalesce(
        F.floor(clamped * top).cast("long"), F.lit(0).cast("long")
    )


def morton_code_col(scaled: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each pre-scaled column into one Morton
    (Z-order) key — pure shift/mask arithmetic, whole-stage codegen."""
    n = len(scaled)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(scaled):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, i * n + j)
    return out


def zorder_key_col(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """Morton key over ``cols`` using per-column min/max from ONE tiny
    aggregation (collected: 2 values per column). ``bits`` per column;
    bits * len(cols) must fit a long (<= 62)."""
    if bits * len(cols) > 62:
        raise ValueError("zorder: bits * len(cols) must be <= 62")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    scaled = []
    for c in cols:
        lo, hi = row[f"_lo_{c}"], row[f"_hi_{c}"]
        lo = float(lo) if lo is not None else 0.0
        hi = float(hi) if hi is not None else 0.0
        scaled.append(_scaled_rank_col(F.col(c), lo, hi, bits))
    return morton_code_col(scaled, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-ordered on ``cols``: range-repartition on the
    Morton key, sort within partitions, drop the key. Row-group min/max
    ranges come out tight on EVERY interleaved column, so filters on any
    of them skip most of the file (verified against parquet metadata in
    tests). One shuffle — same cost as any global sort-write.

    ``files`` sets the range-partition count — the skipping granularity
    when each file holds one row group (small/medium outputs). Size it
    like any file-count target (~total_bytes / 128-512 MB); defaults to
    the session shuffle partitioning."""
    key = zorder_key_col(df, cols, bits)
    d = df.withColumn("_zkey", key)
    if files is not None:
        d = d.repartitionByRange(files, "_zkey")
    else:
        d = d.repartitionByRange("_zkey")
    d.sortWithinPartitions("_zkey").drop("_zkey").write.mode(mode).parquet(path)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_mb: int = 256,
    mode: str = "overwrite",
) -> int:
    """Rewrite a (small-file-fragmented) parquet dataset into
    ~``target_mb``-sized files. Returns the output file count. The
    repartition is the only shuffle; at scale run per partition-directory.

    Sizes come from the scan's own file listing (works for any URI Spark
    can read); raises when a file cannot be stat-ed rather than silently
    funneling the dataset into one task."""
    import os
    from urllib.parse import urlparse

    df = spark.read.parquet(src_path)
    files = df.inputFiles()
    if not files:
        raise ValueError(f"compact_parquet: no input files under {src_path!r}")
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            raise ValueError(
                f"compact_parquet: cannot stat remote file {f!r} locally - "
                "size the rewrite explicitly (df.repartition(n).write...)"
            )
        total += os.path.getsize(u.path)
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df.repartition(n).write.mode(mode).parquet(dst_path)
    return n


def write_range_sorted(
    df: DataFrame,
    path: str,
    cols: list[str] | str,
    files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet globally range-sorted on ``cols`` — the 1-D layout
    primitive next to :func:`write_zordered` (multi-dim): range
    repartition on the sort key (balanced by sampling, no single-task
    sort), sort within partitions, write.  Every file owns a DISJOINT
    key range, so a point or range filter on the leading column prunes
    to the owning files via row-group statistics; time-keyed fact
    tables written this way make "last week" scans touch last week's
    bytes only.  One shuffle — the same cost as any global sort."""
    key_cols = [cols] if isinstance(cols, str) else list(cols)
    if files is not None:
        d = df.repartitionByRange(files, *key_cols)
    else:
        d = df.repartitionByRange(*key_cols)
    d.sortWithinPartitions(*key_cols).write.mode(mode).parquet(path)
