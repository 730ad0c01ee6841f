"""cdc.py — changelog compaction, MERGE-INTO apply, SCD2 intervals."""

import pytest
from pyspark.sql import functions as F

from seafan_spark.cdc import apply_changes, latest_state, scd2_history
from seafan_spark.sources import vec_to_pipe


def _log(spark, rows):
    return vec_to_pipe(
        spark,
        {
            "k": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "v": [r[2] for r in rows],
            "op": [r[3] for r in rows],
        },
    ).df


def test_latest_state_compaction(spark):
    # out-of-order arrival; key 2's latest is a delete; key 3 deleted then
    # re-upserted (later ts wins)
    log = _log(
        spark,
        [
            (1, 10, "a", "upsert"),
            (1, 30, "c", "upsert"),
            (1, 20, "b", "upsert"),
            (2, 10, "x", "upsert"),
            (2, 20, "x", "delete"),
            (3, 20, "y", "upsert"),
            (3, 10, "y", "delete"),
        ],
    )
    got = {r["k"]: r["v"] for r in latest_state(log, ["k"], "ts", "op").collect()}
    assert got == {1: "c", 3: "y"}


def test_latest_state_no_op_col(spark):
    log = _log(spark, [(1, 1, "a", "u"), (1, 2, "b", "u")]).drop("op")
    got = latest_state(log, ["k"], "ts").collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, "b")]


def test_apply_changes_merge_semantics(spark):
    snap = vec_to_pipe(
        spark, {"k": [1, 2, 3], "ts": [0, 0, 0], "v": ["a", "b", "c"]}
    ).df
    changes = _log(
        spark,
        [
            (2, 5, "B", "upsert"),   # update existing
            (3, 5, "c", "delete"),   # delete existing
            (4, 5, "d", "upsert"),   # insert new
            (5, 5, "e", "delete"),   # delete of absent key: no-op
            (4, 9, "D", "upsert"),   # later change to same key wins
        ],
    )
    got = {r["k"]: (r["ts"], r["v"]) for r in
           apply_changes(snap, changes, ["k"], "ts", "op").collect()}
    assert got == {1: (0, "a"), 2: (5, "B"), 4: (9, "D")}


def test_apply_changes_delete_then_upsert_latest_wins(spark):
    snap = vec_to_pipe(spark, {"k": [1], "ts": [0], "v": ["a"]}).df
    changes = _log(spark, [(1, 5, "x", "delete"), (1, 9, "z", "upsert")])
    got = apply_changes(snap, changes, ["k"], "ts", "op").collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, "z")]


def test_apply_changes_missing_payload_raises(spark):
    snap = vec_to_pipe(spark, {"k": [1], "ts": [0], "v": ["a"], "w": [1.0]}).df
    changes = _log(spark, [(1, 5, "x", "upsert")])  # lacks 'w'
    with pytest.raises(ValueError, match="lack snapshot columns"):
        apply_changes(snap, changes, ["k"], "ts", "op")


def test_scd2_intervals_and_compression(spark):
    log = _log(
        spark,
        [
            (1, 10, "a", "u"),
            (1, 20, "a", "u"),  # no-op change: compressed away
            (1, 30, "b", "u"),
            (1, 40, "a", "u"),  # back to 'a' -> NEW interval, not merged
            (2, 10, "z", "u"),
        ],
    )
    got = sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"])
        for r in scd2_history(log, ["k"], "ts", ["v"]).collect()
    )
    assert got == [
        (1, "a", 10, 30),
        (1, "a", 40, None),
        (1, "b", 30, 40),
        (2, "z", 10, None),
    ]


def test_scd2_null_attr_first_row_kept(spark):
    log = spark.createDataFrame(
        [(1, 10, None), (1, 20, None)], "k long, ts long, v string"
    )
    got = scd2_history(log, ["k"], "ts", ["v"]).collect()
    # first row survives compression; the second NULL==NULL row compresses
    assert [(r["k"], r["v"], r["valid_from"], r["valid_to"]) for r in got] == [
        (1, None, 10, None)
    ]


def test_scd2_no_compress(spark):
    log = _log(spark, [(1, 10, "a", "u"), (1, 20, "a", "u")])
    got = scd2_history(log, ["k"], "ts", ["v"], compress=False).collect()
    assert len(got) == 2
