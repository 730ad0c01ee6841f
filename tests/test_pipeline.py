"""Relational-op semantics ported from the reference's gdata_test.go /
pipeline_test.go fixtures (see FIXTURES.md §1, §3)."""

import pytest

from seafan_spark.pipeline import JoinError, Pipeline
from seafan_spark.sources import vec_to_pipe


@pytest.fixture()
def base(spark):
    # pipeTest1-ish: 7 rows
    return vec_to_pipe(
        spark,
        {
            "Field1": ["a", "b", "c", "x", "s", "t", "w"],
            "row": [1, 2, 3, 4, 5, 6, 7],
            "Field3": [3.0, 2.2, 1.9, 10.1, 0.5, 8.8, 9.9],
        },
    )


def test_keep_drop(base):
    p = base.keep(["Field1", "Field3"])
    assert p.field_list() == ["Field1", "Field3"]
    with pytest.raises(KeyError):
        base.keep(["nope"])
    p2 = base.drop("Field3")
    assert p2.field_list() == ["Field1", "row"]
    with pytest.raises(KeyError):
        base.drop("nope")


def test_where_subset_row(base):
    p = base.where("Field1", ["a", "x"])
    assert sorted(p.collect_field("row")) == [1, 4]
    with pytest.raises(ValueError):
        base.where("Field1", ["zzz"], strict=True)
    s = base.subset([0, 2, 6])
    assert s.collect_field("row") == [1, 3, 7]
    r = base.row(3)
    assert r.collect_field("Field1") == ["x"]


def test_sort_and_shuffle(base):
    p = base.sort("Field3")
    assert p.collect_field("Field3") == sorted([3.0, 2.2, 1.9, 10.1, 0.5, 8.8, 9.9])
    assert p.is_sorted() and p.sort_field == "Field3"
    d = base.sort("Field3", ascending=False)
    assert d.collect_field("Field3")[0] == 10.1
    sh = base.shuffle(seed=7)
    assert sorted(sh.collect_field("row")) == [1, 2, 3, 4, 5, 6, 7]
    # deterministic
    assert sh.collect_field("row") == base.shuffle(seed=7).collect_field("row")


def test_append(spark, base):
    extra = vec_to_pipe(
        spark,
        {
            "Field1": ["q", "r"],
            "row": [8, 9],
            "Field3": [1.0, 2.0],
            "Field4": ["dropped", "dropped"],
        },
    )
    ap = base.append(extra)
    assert ap.field_list() == ["Field1", "row", "Field3"]
    assert ap.collect_field("row") == [1, 2, 3, 4, 5, 6, 7, 8, 9]
    bad = vec_to_pipe(spark, {"Field1": ["z"]})
    with pytest.raises(ValueError):
        base.append(bad)


# --- join fixtures from gdata_test.go:432-523 (FIXTURES.md §3) -------------
@pytest.fixture()
def join_sides(spark):
    left = vec_to_pipe(
        spark,
        {
            "Field0": [float(i) for i in range(10)],
            "Field1": ["a", "b", "c", "a", "b", "c", "e", "f", "g", "h"],
        },
    )
    right = vec_to_pipe(
        spark,
        {
            "Field2": [0.0, 1.0, 2.0, 3.0, 4.0],
            "Field1": ["a", "b", "c", "k", "a"],
        },
    )
    return left, right


def test_join_inner(join_sides):
    left, right = join_sides
    j = left.join(right, "Field1", "inner")
    assert j.row_count() == 8
    assert sorted(j.collect_field("Field1")) == ["a", "a", "a", "a", "b", "b", "c", "c"]


def test_join_left_default_fill(join_sides):
    left, right = join_sides
    # Default=110.0 on the missing right-side Field2 (gdata_test.go:492-506)
    right.fts.get("Field2").fp.default = 110.0
    j = left.join(right, "Field1", "left")
    assert j.row_count() == 12
    vals = j.df.filter(j.df.Field1.isin(["e", "f", "g", "h"])).select("Field2").collect()
    assert [v[0] for v in vals] == [110.0] * 4


def test_join_right_and_outer(join_sides):
    left, right = join_sides
    j = left.join(right, "Field1", "right")
    assert j.row_count() == 9
    # missing left Field0 fills 0.0 (no default set)
    krow = j.df.filter(j.df.Field1 == "k").select("Field0").collect()
    assert [v[0] for v in krow] == [0.0]
    o = left.join(right, "Field1", "outer")
    assert o.row_count() == 13


def test_join_validation(spark, join_sides):
    left, right = join_sides
    with pytest.raises(JoinError):
        left.join(right, "nope")
    with pytest.raises(JoinError):
        left.join(right, "Field0")  # float key
    fl = vec_to_pipe(spark, {"Field1": [1, 2]})
    with pytest.raises(JoinError):
        left.join(fl, "Field1")  # kind mismatch
    with pytest.raises(JoinError):
        left.join(right, "Field1", how="cross")


def test_join_left_wins_dup_columns(spark):
    left = vec_to_pipe(spark, {"k": ["a", "b"], "v": [1.0, 2.0]})
    right = vec_to_pipe(spark, {"k": ["a", "b"], "v": [9.0, 9.0], "w": [5.0, 6.0]})
    j = left.join(right, "k", "inner")
    assert sorted(j.field_list()) == ["k", "v", "w"]
    assert sorted(j.collect_field("v")) == [1.0, 2.0]  # left wins


def test_iter_rows_streams_in_order(spark):
    from seafan_spark.sources import vec_to_pipe

    p = vec_to_pipe(spark, {"a": list(range(100)), "b": [i * 2.0 for i in range(100)]})
    got = [(r["a"], r["b"]) for r in p.iter_rows()]
    assert got == [(i, i * 2.0) for i in range(100)]
    first = next(iter(p.iter_rows()))
    assert not any(c.startswith("_") for c in first.asDict())  # internals hidden


def test_chained_append_preserves_order(spark):
    from seafan_spark.sources import vec_to_pipe

    p1 = vec_to_pipe(spark, {"x": [1.0, 2.0]})
    p2 = vec_to_pipe(spark, {"x": [3.0, 4.0]})
    p3 = vec_to_pipe(spark, {"x": [5.0, 6.0]})
    out = p1.append(p2).append(p3)
    got = [r["x"] for r in out.ordered_df().select("x").collect()]
    assert got == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    # appending an APPENDED pipe on the right also keeps each side's order
    out2 = p1.append(p2.append(p3))
    got2 = [r["x"] for r in out2.ordered_df().select("x").collect()]
    assert got2 == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]


def test_sinks_hide_internal_columns(spark, tmp_path):
    from seafan_spark.sources import parquet_to_pipe, pipe_to_parquet, vec_to_pipe

    p = vec_to_pipe(spark, {"x": [1.0, 2.0]}).append(vec_to_pipe(spark, {"x": [3.0]}))
    path = str(tmp_path / "clean")
    pipe_to_parquet(p, path)
    cols = spark.read.parquet(path).columns
    assert cols == ["x"], cols
