"""Z-order layout: row-group min/max ranges must be tight on BOTH
interleaved columns (that's the data-skipping property), measured from
real parquet footer metadata via pyarrow."""

import glob
import random

import pyarrow.parquet as pq
import pytest


def _rowgroup_avg_range(path_glob: str, col: str) -> float:
    spans, total = [], 0.0
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    spans.append(float(c.statistics.max - c.statistics.min))
    assert spans, f"no stats for {col}"
    return sum(spans) / len(spans)


@pytest.fixture(scope="module")
def xy_df(spark):
    rnd = random.Random(7)
    rows = [(rnd.uniform(0, 1000), rnd.uniform(0, 1000), i) for i in range(200_000)]
    return spark.createDataFrame(rows, "x double, y double, i long").coalesce(4)


def test_zorder_tightens_both_columns(spark, xy_df, tmp_path):
    from seafan_spark.layout import write_zordered

    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    xy_df.write.mode("overwrite").parquet(plain)
    write_zordered(xy_df, zed, ["x", "y"], bits=12, files=64)

    # random layout: each row group spans ~the full [0,1000] range of both
    # columns; z-order must shrink BOTH simultaneously (a plain sort could
    # only shrink one). 64 z-cells -> each column's range ~1/8 of full.
    for col in ("x", "y"):
        r_plain = _rowgroup_avg_range(plain + "/*.parquet", col)
        r_zed = _rowgroup_avg_range(zed + "/*.parquet", col)
        assert r_zed < r_plain * 0.3, (col, r_zed, r_plain)

    # content unchanged
    a = spark.read.parquet(plain).agg({"i": "sum"}).collect()[0][0]
    b = spark.read.parquet(zed).agg({"i": "sum"}).collect()[0][0]
    assert a == b


def test_compact_parquet(spark, tmp_path):
    from seafan_spark.layout import compact_parquet

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    df = spark.range(10_000).withColumnRenamed("id", "v")
    df.repartition(64).write.mode("overwrite").parquet(src)  # 64 tiny files
    n = compact_parquet(spark, src, dst, target_mb=256)
    assert n == 1
    files = glob.glob(dst + "/*.parquet")
    assert len(files) == 1
    assert spark.read.parquet(dst).count() == 10_000


def test_write_range_sorted_disjoint_file_ranges(spark, tmp_path):
    """Every output file owns a disjoint key range (range repartition +
    within-partition sort), verified against parquet row-group stats."""
    import os

    import pyarrow.parquet as pq

    from seafan_spark.layout import write_range_sorted
    from seafan_spark.sources import parquet_to_pipe

    ev = parquet_to_pipe(spark, "/root/testdata/sf0.001/events.parquet").df
    out = str(tmp_path / "sorted")
    write_range_sorted(ev.select("event_id", "user_id", "value"), out, "event_id", files=6)

    ranges = []
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == "event_id" and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            ranges.append((min(los), max(his)))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"

    back = spark.read.parquet(out)
    assert back.count() == ev.count()
