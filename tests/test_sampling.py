"""Deterministic corpus sampling: reproducibility, stratum rates,
incremental stability, and quota caps."""

from __future__ import annotations

from pyspark.sql import functions as F

from binlogsub_spark.functions.sampling import cap_per_group, hash_unit, sample_mix

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_sample_mix_is_deterministic_and_stratified(spark):
    docs = _docs(spark)
    frac = {"en": 1.0, "de": 0.5, "fr": 0.0}
    a = sample_mix(docs, "lang", frac, key_col="doc_id", seed="s1")
    b = sample_mix(docs, "lang", frac, key_col="doc_id", seed="s1")
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )
    per = {r["lang"]: r["n"] for r in a.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    tot = {r["lang"]: r["n"] for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert per.get("fr", 0) == 0
    assert per["en"] == tot["en"]  # fraction 1.0 keeps everything
    if "de" in tot and tot["de"] >= 20:
        rate = per.get("de", 0) / tot["de"]
        assert 0.3 < rate < 0.7  # Bernoulli(0.5) within a loose band
    # strata not listed keep default_fraction=0
    listed = set(frac)
    assert a.where(~F.col("lang").isin(*listed)).count() == 0


def test_sample_mix_incremental_stability(spark):
    """A document's fate is independent of which other rows are present:
    sampling the corpus in two halves and unioning equals sampling whole."""
    docs = _docs(spark)
    frac = {"en": 0.4, "de": 0.4, "fr": 0.4, "es": 0.4, "zh": 0.4}
    whole = sample_mix(docs, "lang", frac, key_col="doc_id", seed="x", default_fraction=0.4)
    lo = sample_mix(
        docs.where("doc_id % 2 = 0"), "lang", frac, key_col="doc_id", seed="x",
        default_fraction=0.4,
    )
    hi = sample_mix(
        docs.where("doc_id % 2 = 1"), "lang", frac, key_col="doc_id", seed="x",
        default_fraction=0.4,
    )
    assert sorted(r.doc_id for r in whole.collect()) == sorted(
        r.doc_id for r in lo.unionByName(hi).collect()
    )


def test_seed_gives_independent_draw(spark):
    docs = _docs(spark)
    frac = {l: 0.5 for l in ("en", "de", "fr", "es", "zh")}
    a = {r.doc_id for r in sample_mix(docs, "lang", frac, "doc_id", seed="a", default_fraction=0.5).collect()}
    b = {r.doc_id for r in sample_mix(docs, "lang", frac, "doc_id", seed="b", default_fraction=0.5).collect()}
    n = docs.count()
    # different seeds must not give the same (or complementary) subset
    assert 0.1 * n < len(a & b) < 0.4 * n


def test_cap_per_group(spark):
    docs = _docs(spark)
    capped = cap_per_group(docs, "source", max_rows=10, key_col="doc_id")
    per = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 10 for r in per)
    # groups smaller than the cap are untouched
    small = [
        r["source"]
        for r in docs.groupBy("source").count().where("count <= 10").collect()
    ]
    for s in small:
        assert (
            capped.where(F.col("source") == s).count()
            == docs.where(F.col("source") == s).count()
        )
    # deterministic: same rows both times
    again = cap_per_group(docs, "source", max_rows=10, key_col="doc_id")
    assert sorted(r.doc_id for r in capped.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_hash_unit_range(spark):
    docs = _docs(spark).select(hash_unit(F.col("doc_id")).alias("u"))
    row = docs.agg(F.min("u").alias("lo"), F.max("u").alias("hi"), F.avg("u").alias("m")).first()
    assert 0.0 <= row["lo"] and row["hi"] < 1.0
    assert 0.35 < row["m"] < 0.65
