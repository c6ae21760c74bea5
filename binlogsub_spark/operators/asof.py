"""Scalable as-of join — the operator Spark lacks natively.

``asof_join(left, right, ...)`` gives every left row the most recent
right row at-or-before it in a sequence ordering, without a range/theta
join: both sides are UNIONed, one window pass computes
``last(value, ignorenulls=True)`` over rows up to the current one, and
the left rows are kept. Cost = one shuffle + one sort per partition key —
O(n log n) per key, no pairwise blowup, the standard distributed trades/
quotes shape.

Engine use: GTID assignment. MySQL emits a GTID control event before each
transaction's rows events; a decoded row's transaction id is "the last
GTID at-or-before my (file_seq, log_pos)" — exactly an as-of join of rows
against control events (binlog position context: the reference keeps this
as mutable per-connection state, /root/reference/packet.cc:56-68; a
parallel engine recovers it relationally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    order_cols: list[str],
    value_cols: list[str],
    partition_cols: list[str] | None = None,
    exact_matches: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row's ``value_cols``
    whose ``order_cols`` are <= (lexicographically) the left row's.

    ``partition_cols`` bound each window sort (always set them at scale —
    e.g. file_seq — so no single task sorts the world). Right rows at the
    SAME order position as a left row match when ``exact_matches`` (the
    pandas merge_asof default), else only strictly-before rows do.
    """
    partition_cols = partition_cols or []
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value columns already exist on left: {sorted(overlap)}")

    # right rows sort before (<=) or after (<) left rows at equal positions
    side_right, side_left = (0, 1) if exact_matches else (1, 0)
    l_tag = left.withColumn("_side", F.lit(side_left))
    r_tag = right.select(*partition_cols, *order_cols, *value_cols).withColumn(
        "_side", F.lit(side_right)
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*[F.col(c) for c in order_cols], F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    keep = [c for c in left.columns] + [F.col(f"_asof_{c}").alias(c) for c in value_cols]
    return filled.where(F.col("_side") == side_left).select(*keep)
