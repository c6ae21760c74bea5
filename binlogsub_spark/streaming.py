"""Streaming-native operators over the change stream: watermarked windowed
aggregations and a custom stateful operator (applyInPandasWithState).

The core ingest (pipeline.run_stream*) deliberately keeps NO unbounded
streaming state — LWW + MERGE against the table replaces it (SURVEY §2.7
T8). These operators are the complementary *analytics* layer a live CDC
stream feeds: rate/window metrics with late-data handling, and per-key
running state for monitoring — the reference has no analog (it only
applies changes), but any production deployment of it grows one.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from binlogsub_spark.plans.envelope import OP_DELETE


def _image_cols(events: DataFrame) -> DataFrame:
    img = F.when(F.col("op") == OP_DELETE, F.col("before")).otherwise(F.col("after"))
    return events.select(
        F.col("server_ts"),
        img["conv_id"].alias("conv_id"),
        img["turn_idx"].alias("turn_idx"),
        F.col("op"),
    )


def windowed_turn_metrics(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-conversation change rate over event-time windows, with a
    watermark bounding how long state waits for late events (late rows
    beyond it are dropped — the documented trade; the INGEST path never
    drops, this is the metrics side-channel). Works identically on a
    batch DataFrame (withWatermark is a no-op in batch), which is how the
    tests pin streaming == batch equality."""
    base = _image_cols(events).withWatermark("server_ts", watermark)
    return (
        base.groupBy(F.window("server_ts", window, slide or window), "conv_id")
        .agg(
            F.count("*").alias("n_changes"),
            F.sum(F.when(F.col("op") == OP_DELETE, 1).otherwise(0)).alias("n_deletes"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "conv_id",
            "n_changes",
            "n_deletes",
            "max_turn_idx",
        )
    )


def session_metrics(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization of the change stream (F.session_window):
    consecutive changes of one conversation within ``gap`` merge into
    one session; the session's end is last-event-time + gap. An event
    landing exactly ON the end boundary MERGES into the session (Spark's
    boundary-inclusive semantics, pinned empirically in
    test_session_metrics_boundary_semantics). Streaming-native: with the
    watermark, sessions finalize once event time passes end + watermark;
    identical results on a batch frame (how the oracle checks it).

    Scale: session_window is a built-in JVM aggregation — one shuffle on
    the session key, mergeable partial state, no Python."""
    base = _image_cols(events).withWatermark("server_ts", watermark)
    return (
        base.groupBy(F.session_window("server_ts", gap), "conv_id")
        .agg(
            F.count("*").alias("n_changes"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
        .select(
            "conv_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_changes",
            "max_turn_idx",
        )
    )


PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_changes", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

_PROGRESS_STATE = T.StructType(
    [
        T.StructField("n_changes", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def conversation_progress(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-conversation
    RUNNING totals across micro-batches — the kind of live monitoring
    state Structured Streaming's built-in aggregations can't express when
    the update rule grows beyond algebraic aggregates. State is one tiny
    row per conversation; each batch emits the updated snapshot for the
    conversations it touched (output mode: update)."""

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, nd, mt, last = (
            state.get if state.exists else (0, 0, -1, 0)
        )
        for pdf in pdfs:
            n += len(pdf)
            nd += int((pdf["op"] == OP_DELETE).sum())
            if len(pdf):
                mt = max(mt, int(pdf["turn_idx"].max()))
                last = max(last, int(pdf["server_ts"].astype("int64").max() // 1000))
        state.update((n, nd, mt, last))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "n_changes": [n],
                "n_deletes": [nd],
                "max_turn_idx": [mt],
                "last_ts": [pd.Timestamp(last * 1000, unit="ns")],
            }
        )

    pts = _image_cols(events)
    return pts.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=_PROGRESS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
