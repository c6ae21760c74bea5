"""Raw wire path end-to-end: binary payload -> Arrow decode -> scope filter
-> LWW -> MERGE must produce the same table as the structured path."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from binlogsub_spark.codec import encode_decoded_events
from binlogsub_spark.lake.table import LakeTable
from binlogsub_spark.oracle import expected_final_state
from binlogsub_spark.pipeline import apply_raw_batch
from binlogsub_spark.sources.generator import GeneratorParams, generate_binlog

P = GeneratorParams(n_events=4000, n_convs=100, dup_tail=150)


def _raw(spark, ev):
    img = F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after"))
    flat = ev.select(
        "file_seq", "log_pos", "server_ts", "op", "db_name", "table_name",
        "schema_version",
        img["conv_id"].alias("conv_id"),
        img["turn_idx"].alias("turn_idx"),
        img["role"].alias("role"),
        img["text"].alias("text"),
        F.when(F.col("op") == "D", F.lit(None).cast("string"))
        .otherwise(img["tool"]).alias("tool"),
        img["ts"].alias("ts"),
    )
    return encode_decoded_events(flat)


def test_raw_path_matches_oracle(spark, tmp_path):
    ev = generate_binlog(spark, P).cache()
    raw = _raw(spark, ev)
    table = LakeTable(spark, str(tmp_path / "tbl"), buckets=8)
    metrics = apply_raw_batch(table, raw, batch_id=1)
    assert metrics["events"] == P.n_events + P.dup_tail
    got = (
        table.read()
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    )
    # delete-winner keys are absent; before-image text never surfaces
    exp = expected_final_state(ev.toPandas())
    ev.unpersist()
    # the raw encoder stores the before-image text for deletes; winners that
    # are deletes are tombstoned either way, so final state matches exactly
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_raw_path_idempotent_replay(spark, tmp_path):
    ev = generate_binlog(spark, GeneratorParams(n_events=2000, dup_tail=0))
    raw = _raw(spark, ev)
    table = LakeTable(spark, str(tmp_path / "tbl"), buckets=8)
    apply_raw_batch(table, raw, batch_id=1)
    m2 = apply_raw_batch(table, raw, batch_id=1)
    assert m2["replayed"] and m2["applied"] == 0


def test_deadletter_demux(spark):
    """Corrupt payloads route to the dead-letter branch, never crash decode,
    and stay addressable by (file_seq, log_pos) — S5 error demux."""
    from pyspark.sql import functions as F

    from binlogsub_spark.codec import decode_raw_events, split_deadletter

    ev = generate_binlog(spark, GeneratorParams(n_events=1000, dup_tail=0))
    raw = _raw(spark, ev)
    # corrupt ~10%: truncate payloads mid-header
    corrupted = raw.withColumn(
        "payload",
        F.when(F.col("log_pos") % 10 == 4, F.expr("substring(payload, 1, 20)"))
        .otherwise(F.col("payload")),
    )
    valid, dead = split_deadletter(corrupted)
    n_dead = dead.count()
    assert n_dead == corrupted.where("log_pos % 10 = 4").count() > 0
    assert valid.count() + n_dead == 1000
    # decode of the full corrupted stream silently skips invalid rows
    decoded = decode_raw_events(corrupted)
    assert decoded.count() == 1000 - n_dead
    # dead letters keep their addresses
    assert dead.select("file_seq", "log_pos").distinct().count() == n_dead
