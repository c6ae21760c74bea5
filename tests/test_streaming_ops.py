"""Streaming-native analytics operators: watermarked windowed metrics and
the applyInPandasWithState running-progress operator, both checked against
independent batch computations of the same stream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from binlogsub_spark.sources.generator import GeneratorParams, generate_binlog, write_binlog
from binlogsub_spark.streaming import conversation_progress, windowed_turn_metrics

PARAMS = GeneratorParams(n_events=6000, n_convs=50, dup_tail=0)


def test_windowed_metrics_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "binlog")
    write_binlog(spark, src, PARAMS, n_files=6)

    batch = windowed_turn_metrics(
        spark.read.parquet(src), window="10 minutes", watermark="10 hours"
    )
    expected = {
        (r["window_start"], r["conv_id"]): (r["n_changes"], r["n_deletes"], r["max_turn_idx"])
        for r in batch.collect()
    }

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        windowed_turn_metrics(stream, window="10 minutes", watermark="10 hours")
        .writeStream.format("memory")
        .queryName("winmetrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"], r["conv_id"]): (r["n_changes"], r["n_deletes"], r["max_turn_idx"])
        for r in spark.sql("SELECT * FROM winmetrics").collect()
    }
    assert got == expected
    assert len(expected) > 10


def test_windowed_metrics_watermark_drops_late(spark, tmp_path):
    """A tight watermark in append mode must finalize (emit) only windows
    the watermark has passed — late-data handling is real, not cosmetic."""
    src = str(tmp_path / "binlog")
    write_binlog(spark, src, PARAMS, n_files=6)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_turn_metrics(stream, window="10 minutes", watermark="1 minute")
        .writeStream.format("memory")
        .queryName("winappend")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emitted = spark.sql("SELECT max(window_end) AS m, count(*) AS n FROM winappend").collect()[0]
    all_windows = windowed_turn_metrics(spark.read.parquet(src)).count()
    # append emitted a strict prefix: finalized windows only (the stream's
    # final watermark cannot pass its own max event time)
    assert 0 < emitted["n"] < all_windows


def test_conversation_progress_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "binlog")
    write_binlog(spark, src, PARAMS, n_files=6)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        conversation_progress(stream)
        .writeStream.format("memory")
        .queryName("convprog")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    prog = spark.sql("SELECT * FROM convprog").toPandas()
    # multiple emissions per conversation prove cross-batch state carried
    assert prog.groupby("conv_id").size().max() > 1
    final = prog.sort_values("n_changes").groupby("conv_id").last()

    ev = spark.read.parquet(src)
    img = F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after"))
    want = (
        ev.select(img["conv_id"].alias("conv_id"), img["turn_idx"].alias("turn_idx"), "op", "server_ts")
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_changes"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
            F.max("turn_idx").alias("max_turn_idx"),
            F.max("server_ts").alias("last_ts"),
        )
        .toPandas()
        .set_index("conv_id")
    )
    assert len(final) == len(want)
    for conv, row in want.iterrows():
        got = final.loc[conv]
        assert got["n_changes"] == row["n_changes"], conv
        assert got["n_deletes"] == row["n_deletes"], conv
        assert got["max_turn_idx"] == row["max_turn_idx"], conv
        assert pd.Timestamp(got["last_ts"]) == pd.Timestamp(row["last_ts"]), conv


def test_session_metrics_stream_equals_batch(spark, tmp_path):
    """Gap sessionization: streaming (session_window + watermark, complete
    mode) lands the identical session set as the batch computation, and
    sessions actually split (more sessions than conversations)."""
    from binlogsub_spark.streaming import session_metrics

    src = str(tmp_path / "binlog")
    write_binlog(spark, src, PARAMS, n_files=6)

    batch = session_metrics(
        spark.read.parquet(src), gap="5 minutes", watermark="10 hours"
    )
    expected = {
        (r["conv_id"], r["session_start"]): (
            r["session_end"], r["n_changes"], r["max_turn_idx"]
        )
        for r in batch.collect()
    }
    n_convs = len({k[0] for k in expected})
    assert len(expected) > n_convs  # the gap genuinely splits sessions

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        session_metrics(stream, gap="5 minutes", watermark="10 hours")
        .writeStream.format("memory")
        .queryName("sessmetrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["conv_id"], r["session_start"]): (
            r["session_end"], r["n_changes"], r["max_turn_idx"]
        )
        for r in spark.sql("SELECT * FROM sessmetrics").collect()
    }
    assert got == expected


def test_session_metrics_boundary_semantics(spark):
    """Pins Spark's session_window boundary rule: an event exactly gap
    after the previous one MERGES into the session (boundary-inclusive);
    the end is last event + gap. The cdc_session_windows DuckDB oracle
    mirrors exactly this rule — if Spark ever changes it, this fails
    before the driver gate does."""
    from datetime import datetime

    from binlogsub_spark.streaming import session_metrics

    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def ev(minute, second=0):
        return (
            1,
            4,
            datetime(2026, 1, 1, 12, minute, second),
            "I",
            {"conv_id": "c1", "turn_idx": 1, "role": "user",
             "text": "x", "tool": None,
             "ts": t0},
            None,
        )

    df = spark.createDataFrame(
        # 9:59 merges (within gap); 30 breaks (>gap after 9:59);
        # 40 lands exactly ON 30's boundary -> MERGES (inclusive);
        # 50:01 is 1s past 40's boundary -> new session
        [ev(0), ev(9, 59), ev(30), ev(40), ev(50, 1)],
        "file_seq int, log_pos long, server_ts timestamp, op string, "
        "after struct<conv_id:string,turn_idx:int,role:string,text:string,"
        "tool:string,ts:timestamp>, "
        "before struct<conv_id:string,turn_idx:int,role:string,text:string,"
        "tool:string,ts:timestamp>",
    )
    rows = sorted(
        session_metrics(df, gap="10 minutes").collect(),
        key=lambda r: r["session_start"],
    )
    assert len(rows) == 3
    assert rows[0]["n_changes"] == 2  # 12:00 + 12:09:59
    assert rows[0]["session_end"] == datetime(2026, 1, 1, 12, 19, 59)
    assert rows[1]["n_changes"] == 2  # 12:30 + 12:40 (boundary merges)
    assert rows[1]["session_end"] == datetime(2026, 1, 1, 12, 50, 0)
    assert rows[2]["n_changes"] == 1
