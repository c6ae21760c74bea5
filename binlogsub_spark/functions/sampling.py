"""Deterministic corpus sampling for training-data mixes.

A 100 TB training-data pipeline doesn't take "10% of the corpus" with
``df.sample`` — RNG sampling is non-reproducible across retries, partition
layouts and engine versions, and a re-run of one failed stage would emit a
different corpus. Both operators here decide membership from a HASH of the
row's stable key, so the sample is a pure function of the data:

* reproducible across runs, clusters, and engines (the driver oracle
  replays the identical selection in DuckDB from the same md5 math);
* stable under incremental growth — a document's fate never changes when
  other documents arrive, so daily increments can be sampled independently
  and unioned with historical samples;
* one scan, no shuffle for ``sample_mix`` (a filter), one hash-partitioned
  window for ``cap_per_group``.

The uniform variate is the md5-of-key trick used across this repo's
dedup/similarity family: the top 60 bits of ``md5(key || '|' || seed)``
taken mod 1e6 are uniform enough for mixture weights and portable to any
SQL engine (DuckDB twin: ``('0x' || substr(md5(k),1,15))::BIGINT``).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_DENOM = 1_000_000


def hash_unit(key: Column, seed: str = "") -> Column:
    """Deterministic uniform-ish variate in [0, 1) from a stable key.
    Distinct seeds give independent draws (fresh md5 stream)."""
    h = F.md5(F.concat(key.cast("string"), F.lit("|" + seed)))
    bucket = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _DENOM
    return bucket / F.lit(float(_DENOM))


def sample_mix(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Stratified deterministic Bernoulli sample: keep each row with its
    stratum's probability (the "data mixing weights" step of corpus
    assembly — e.g. {'en': 1.0, 'code': 0.5, 'web': 0.1}).

    Strata absent from ``fractions`` keep ``default_fraction`` of rows.
    Pure filter — no shuffle, pushes past column pruning, scales linearly.
    """
    frac = F.lit(float(default_fraction))
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    # compare in integer space (u_bucket < frac*1e6) so the oracle's
    # integer math matches bit-for-bit with no float-rounding edge
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit("|" + seed)))
    bucket = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _DENOM
    return df.where(bucket < (frac * _DENOM).cast("long"))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Per-group quota: keep at most ``max_rows`` rows per group, chosen by
    deterministic hash order (the "cap any single domain/source" step that
    stops one crawl host from dominating a mix).

    Hash order makes the kept subset a uniform random-looking—but
    reproducible—choice, independent of input row order. One hash-partition
    window on ``group_col``; skew note: a pathologically hot group
    serializes its own partition, but the window needs no full sort of the
    table and AQE splits skewed partitions on the shuffle read side.
    """
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(
            hash_unit(F.col(key_col), seed).asc(), F.col(key_col).asc()
        )
    )
    return df.withColumn("_rn", rn).where(F.col("_rn") <= max_rows).drop("_rn")
