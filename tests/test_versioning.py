"""Corpus snapshot diff: status classification, include filtering, and
the fingerprint projection contract (llmops.versioning)."""

import pytest
from pyspark.sql import functions as F

from seafan_spark.llmops.versioning import (
    snapshot_diff,
    snapshot_diff_summary,
    snapshot_fingerprints,
)


@pytest.fixture(scope="module")
def sides(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta CHANGED"), (4, "delta"), (5, "epsilon")],
        "doc_id long, text string",
    )
    return (
        snapshot_fingerprints(old, "doc_id"),
        snapshot_fingerprints(new, "doc_id"),
    )


def test_statuses(sides):
    old, new = sides
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_include_unchanged_and_fps(sides):
    old, new = sides
    rows = {
        r["id"]: r
        for r in snapshot_diff(
            old, new, include=("added", "removed", "changed", "unchanged")
        ).collect()
    }
    assert rows[1]["status"] == "unchanged"
    assert rows[1]["old_fp"] == rows[1]["new_fp"] is not None
    assert rows[5]["old_fp"] is None and rows[5]["new_fp"] is not None
    assert rows[3]["new_fp"] is None and rows[3]["old_fp"] is not None
    assert rows[2]["old_fp"] != rows[2]["new_fp"]


def test_summary_counts(sides):
    old, new = sides
    s = {
        r["status"]: r["docs"]
        for r in snapshot_diff_summary(snapshot_diff(old, new)).collect()
    }
    assert s == {"added": 1, "removed": 1, "changed": 1}


def test_bad_status_rejected(sides):
    old, new = sides
    with pytest.raises(ValueError, match="unknown statuses"):
        snapshot_diff(old, new, include=("addded",))


def test_reuses_external_fingerprints(spark):
    """A persisted (id, fp) store works directly as a side — no text
    column required."""
    old = spark.createDataFrame([(1, "aa"), (2, "bb")], "id long, fp string")
    new = spark.createDataFrame([(1, "aa"), (2, "zz")], "id long, fp string")
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {2: "changed"}
