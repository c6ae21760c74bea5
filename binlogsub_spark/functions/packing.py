"""Deterministic sequence packing — documents into fixed-token-budget
training shards.

The last step of a training-data pipeline: stream tokenized documents into
contiguous ~N-token shards (context-window fills, tar-shard manifests).
Doing this with a driver-side loop or a single global sort is exactly what
dies at 100 TB, so the operator is built from two scalable pieces:

1. **Group fan-out**: each document is hash-assigned to one of
   ``n_groups`` independent packing streams (deterministic md5-of-key, the
   same portable variate the sampling/dedup family uses). Groups pack
   independently and in parallel — the global-sort bottleneck becomes
   ``n_groups`` bounded window sorts, and shard ids are stable under
   cluster size, partitioning, and retries because nothing depends on
   physical row order.
2. **In-group greedy fill**: documents are ordered by (hash, key) inside
   the group; a running token total (window cumulative sum) places each
   document at ``offset = cum_before % budget`` in shard
   ``floor(cum_before / budget)`` — the classic sequential packer. A
   document longer than ``budget`` spans ``ceil`` shards; spans are
   reported, not split (the trainer's loader owns chunking).

Output is a pure function of (keys, token counts, seed): re-running any
failed stage, on any engine, reproduces byte-identical shard manifests —
the property RNG/row-order packers lack. The DuckDB twin in
``__spark_entry__.oracle_sql`` replays it exactly (SUM OVER ... ROWS
UNBOUNDED PRECEDING).

Skew note: group sizes are multinomial-uniform over md5, so window
partitions are balanced by construction; pick ``n_groups`` >= cluster
cores at real scale (shard numbering is per-group, so more groups never
changes any document's in-group placement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from binlogsub_spark.functions.sampling import hash_unit


def pack_sequences(
    df: DataFrame,
    token_col: str,
    key_col: str,
    budget: int,
    n_groups: int = 64,
    seed: str = "",
) -> DataFrame:
    """Assign every document a (pack_group, shard_id, shard_offset).

    ``token_col`` is a precomputed token count (see
    ``functions.text.token_count`` / ``bpe_ish_token_count``); documents
    with non-positive counts still land (zero-width) so no id vanishes.

    Adds: ``pack_group`` int, ``shard_id`` bigint (per-group ordinal),
    ``shard_offset`` bigint (token offset of the document's first token
    inside its shard), ``n_shards_spanned`` int.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    h = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit("|pack|" + seed))
    )
    grp = (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % n_groups
    ).cast("int")
    order_u = hash_unit(F.col(key_col), "order|" + seed)
    w = (
        Window.partitionBy("pack_group")
        .orderBy(order_u.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.greatest(F.col(token_col).cast("long"), F.lit(0).cast("long"))
    cum_before = (F.sum(toks).over(w) - toks).alias("_cum_before")
    out = df.withColumn("pack_group", grp).select(
        "*", cum_before
    )
    end = F.col("_cum_before") + F.greatest(
        toks, F.lit(1).cast("long")
    )  # zero-token docs occupy one boundary slot for span math
    return (
        out.withColumn(
            "shard_id", (F.col("_cum_before") / budget).cast("bigint")
        )
        .withColumn(
            "shard_offset", F.col("_cum_before") % budget
        )
        .withColumn(
            "n_shards_spanned",
            (
                F.ceil(end / F.lit(budget)).cast("bigint")
                - F.col("shard_id")
            ).cast("int"),
        )
        .drop("_cum_before")
    )
