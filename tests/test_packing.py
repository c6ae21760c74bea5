"""Sequence packing: deterministic shard assignment, greedy-fill
invariants, and independence from physical row order."""

import pytest
from pyspark.sql import functions as F

from binlogsub_spark.functions.packing import pack_sequences


def _docs(spark, n=300):
    return spark.range(n).select(
        F.concat(F.lit("doc"), F.col("id").cast("string")).alias("doc_id"),
        ((F.col("id") * 37) % 900 + 1).cast("int").alias("n_tokens"),
    )


def test_invalid_budget_raises(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark), "n_tokens", "doc_id", budget=0)


def test_offsets_within_budget_and_contiguous_fill(spark):
    budget = 2048
    out = pack_sequences(
        _docs(spark), "n_tokens", "doc_id", budget=budget, n_groups=8
    ).collect()
    assert len(out) == 300
    by_group: dict[int, list] = {}
    for r in out:
        assert 0 <= r["shard_offset"] < budget
        assert r["n_shards_spanned"] >= 1
        by_group.setdefault(r["pack_group"], []).append(r)
    assert set(by_group) <= set(range(8)) and len(by_group) > 1
    for rows in by_group.values():
        # reconstruct each doc's absolute start; sorted starts must be the
        # exact running sum of token counts in that order (greedy fill)
        rows.sort(key=lambda r: r["shard_id"] * budget + r["shard_offset"])
        cum = 0
        for r in rows:
            start = r["shard_id"] * budget + r["shard_offset"]
            assert start == cum
            assert r["n_shards_spanned"] == (
                (start + max(r["n_tokens"], 1) + budget - 1) // budget
                - start // budget
            )
            cum += r["n_tokens"]


def test_deterministic_under_repartition(spark):
    docs = _docs(spark)
    a = {
        r["doc_id"]: (r["pack_group"], r["shard_id"], r["shard_offset"])
        for r in pack_sequences(docs, "n_tokens", "doc_id", budget=512).collect()
    }
    b = {
        r["doc_id"]: (r["pack_group"], r["shard_id"], r["shard_offset"])
        for r in pack_sequences(
            docs.repartition(13), "n_tokens", "doc_id", budget=512
        ).collect()
    }
    assert a == b


def test_zero_token_docs_survive(spark):
    docs = spark.createDataFrame(
        [("a", 0), ("b", 10), ("c", 0)], "doc_id string, n_tokens int"
    )
    out = pack_sequences(docs, "n_tokens", "doc_id", budget=8, n_groups=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {"a", "b", "c"}
    for r in rows.values():
        assert r["n_shards_spanned"] == 1 or r["doc_id"] == "b"


def test_seed_changes_grouping(spark):
    docs = _docs(spark, 100)
    a = {
        r["doc_id"]: r["pack_group"]
        for r in pack_sequences(docs, "n_tokens", "doc_id", 512, seed="s1").collect()
    }
    b = {
        r["doc_id"]: r["pack_group"]
        for r in pack_sequences(docs, "n_tokens", "doc_id", 512, seed="s2").collect()
    }
    assert a != b
