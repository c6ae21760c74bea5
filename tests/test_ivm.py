"""Incremental materialized-view maintenance: every refresh must leave the
view identical to a full GROUP BY recompute over the source's live state —
while reading only the changelog delta and the dirty groups."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from binlogsub_spark.config import EngineConfig
from binlogsub_spark.lake.table import LakeTable
from binlogsub_spark.operators.ivm import IncrementalView
from binlogsub_spark.pipeline import apply_batch
from binlogsub_spark.sources.generator import GeneratorParams, generate_binlog

P = GeneratorParams(n_events=4000, n_convs=60, dup_tail=100)


def _full_recompute(table: LakeTable) -> pd.DataFrame:
    return (
        table.read()
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.max("turn_idx").cast("int").alias("max_turn_idx"),
            F.max("ts").alias("last_ts"),
            F.count("tool").alias("n_tool_turns"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


def _view_state(view: IncrementalView) -> pd.DataFrame:
    return view.read().toPandas().sort_values("conv_id").reset_index(drop=True)


def test_incremental_matches_full_recompute(spark, tmp_path):
    ev = generate_binlog(spark, P).cache()
    table = LakeTable(spark, str(tmp_path / "tbl"), buckets=16)
    view = IncrementalView(table, str(tmp_path / "view"))
    n = P.n_events + P.dup_tail
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        batch = ev.where(
            (ev.delivery_seq >= cuts[i]) & (ev.delivery_seq < cuts[i + 1])
        )
        apply_batch(table, batch, batch_id=i + 1, cfg=EngineConfig())
        m = view.refresh()
        assert m["refreshed"] and not m["replayed"]
        pd.testing.assert_frame_equal(
            _view_state(view), _full_recompute(table), check_dtype=False
        )
    ev.unpersist()


def test_refresh_is_noop_when_up_to_date(spark, tmp_path):
    ev = generate_binlog(spark, GeneratorParams(n_events=500, n_convs=10))
    table = LakeTable(spark, str(tmp_path / "tbl"), buckets=8)
    view = IncrementalView(table, str(tmp_path / "view"))
    apply_batch(table, ev, batch_id=1)
    assert view.refresh()["refreshed"]
    again = view.refresh()
    assert not again["refreshed"] and again["reason"] == "up to date"


def test_vanished_group_is_tombstoned(spark, tmp_path):
    """Deleting every turn of a conversation must remove its view row on
    the next refresh (the D-side of the changelog drives a tombstone)."""
    ev = generate_binlog(spark, GeneratorParams(n_events=800, n_convs=12)).cache()
    table = LakeTable(spark, str(tmp_path / "tbl"), buckets=8)
    view = IncrementalView(table, str(tmp_path / "view"))
    apply_batch(table, ev, batch_id=1)
    view.refresh()
    victim = table.read().select("conv_id").first()["conv_id"]
    assert victim in set(_view_state(view)["conv_id"])

    live = table.read().where(F.col("conv_id") == victim)
    # LWW versions come from the image ts, so the delete image bumps ts a
    # day forward to outrank the live row at every (conv_id, turn_idx)
    bumped = F.struct(
        "conv_id", "turn_idx", "role", "text", "tool",
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts"),
    )
    deletes = live.select(
        F.lit(999).cast("int").alias("file_seq"),
        (F.lit(10_000_000) + F.col("turn_idx").cast("long")).alias("log_pos"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("server_ts"),
        F.lit("D").alias("op"),
        F.lit("test").alias("db_name"),
        F.lit("transcripts").alias("table_name"),
        F.lit(2).cast("int").alias("schema_version"),
        bumped.alias("before"),
    )
    deletes = deletes.withColumn(
        "after", F.lit(None).cast(deletes.schema["before"].dataType)
    )
    apply_batch(table, deletes, batch_id=2)
    m = view.refresh()
    assert m["refreshed"]
    state = _view_state(view)
    assert victim not in set(state["conv_id"])
    pd.testing.assert_frame_equal(state, _full_recompute(table), check_dtype=False)
    ev.unpersist()


def test_streaming_maintains_view(spark, tmp_path):
    """run_stream(views=[...]) keeps the aggregate view current after
    every micro-batch, and a checkpoint-replayed restart leaves it
    untouched (refresh is idempotent on the source snapshot id)."""
    from binlogsub_spark.pipeline import run_stream

    ev = generate_binlog(spark, GeneratorParams(n_events=1500, n_convs=20))
    src = str(tmp_path / "binlog")
    ev.repartition(4).write.parquet(src)
    table = LakeTable(spark, str(tmp_path / "tbl"), buckets=8)
    view = IncrementalView(table, str(tmp_path / "view"))
    q = run_stream(
        spark, src, table, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, views=[view],
    )
    q.awaitTermination()
    pd.testing.assert_frame_equal(
        _view_state(view), _full_recompute(table), check_dtype=False
    )
    snap_before = view.last_refreshed_snapshot()
    # restart on the same checkpoint: everything already applied -> no-op
    q2 = run_stream(
        spark, src, table, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, views=[view],
    )
    q2.awaitTermination()
    assert view.last_refreshed_snapshot() == snap_before
    pd.testing.assert_frame_equal(
        _view_state(view), _full_recompute(table), check_dtype=False
    )


def test_full_refresh_recovers_stale_view(spark, tmp_path):
    """full=True must converge even when the incremental bookkeeping is
    gone (the vacuum-expired-changelog recovery path)."""
    ev = generate_binlog(spark, GeneratorParams(n_events=600, n_convs=10)).cache()
    table = LakeTable(spark, str(tmp_path / "tbl"), buckets=8)
    view = IncrementalView(table, str(tmp_path / "view"))
    half = ev.where(ev.delivery_seq < 300)
    apply_batch(table, half, batch_id=1)
    view.refresh()
    apply_batch(table, ev.where(ev.delivery_seq >= 300), batch_id=2)
    # simulate lost bookkeeping
    import os

    os.remove(view._state_path)
    m = view.refresh(full=True)
    assert m["refreshed"]
    pd.testing.assert_frame_equal(
        _view_state(view), _full_recompute(table), check_dtype=False
    )
    ev.unpersist()
