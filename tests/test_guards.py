"""Small-data guards: deliberate compat paths fail loudly above the ceiling."""

import pytest

import seafan_spark.guards as guards
from seafan_spark.guards import SmallDataLimitError, assert_small
from seafan_spark.sources import vec_to_pipe


def test_assert_small_trips(spark):
    p = vec_to_pipe(spark, {"x": [1, 2, 3]})
    with pytest.raises(SmallDataLimitError, match="3 rows exceeds"):
        assert_small(p.df, "op", limit=2)
    assert assert_small(p.df, "op", limit=3) == 3


def test_subset_guard(spark, monkeypatch):
    p = vec_to_pipe(spark, {"x": list(range(10))})
    # the env var is read PER CALL (runtime-configurable, not import-time)
    monkeypatch.setenv("SEAFAN_SMALL_DATA_LIMIT", "5")
    with pytest.raises(SmallDataLimitError, match="subset"):
        p.subset([0, 1])
    monkeypatch.setenv("SEAFAN_SMALL_DATA_LIMIT", "100")
    assert p.subset([0, 1]).row_count() == 2


def test_exact_pairs_guard(spark, monkeypatch):
    from seafan_spark.llmops.dedup import embedding_neardup_pairs

    p = vec_to_pipe(spark, {"vid": [1, 2], "emb": [[1.0, 0.0], [0.0, 1.0]]})
    monkeypatch.setenv("SEAFAN_SMALL_DATA_LIMIT", "100")
    # under the limit: runs
    assert embedding_neardup_pairs(p, "vid", "emb", threshold=0.99, exact=True).count() == 0
    # explicit limit beats the env default, so simulate misuse directly
    with pytest.raises(SmallDataLimitError):
        assert_small(p.df, "embedding_neardup_pairs(exact=True)", limit=1)


def test_collect_field_guard(spark, monkeypatch):
    p = vec_to_pipe(spark, {"x": list(range(10))})
    monkeypatch.setenv("SEAFAN_SMALL_DATA_LIMIT", "5")
    with pytest.raises(SmallDataLimitError, match="collect_field"):
        p.collect_field("x")
    # explicit opt-out collects regardless of the ceiling
    assert sorted(p.collect_field("x", allow_large=True)) == list(range(10))
    monkeypatch.setenv("SEAFAN_SMALL_DATA_LIMIT", "100")
    assert sorted(p.collect_field("x")) == list(range(10))
