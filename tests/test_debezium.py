"""Debezium-JSON source: decode/encode fidelity and full-pipeline
equivalence with the structured path (same generator input, identical
final lake state)."""

import json

from pyspark.sql import functions as F

from binlogsub_spark.config import EngineConfig
from binlogsub_spark.lake.table import LakeTable
from binlogsub_spark.pipeline import apply_batch
from binlogsub_spark.sources.debezium import (
    decode_debezium,
    envelope_to_debezium_json,
)
from binlogsub_spark.sources.generator import GeneratorParams, generate_binlog


def test_decode_real_debezium_document(spark):
    """A hand-written document in the connector's published shape decodes
    to the engine envelope (op map, file suffix, MicroTimestamp image)."""
    doc = {
        "before": None,
        "after": {
            "conv_id": "c1",
            "turn_idx": 3,
            "role": "user",
            "text": "hello",
            "tool": None,
            "ts": 1_700_000_000_123_456,  # epoch micros
        },
        "source": {
            "version": "2.6.0.Final",
            "connector": "mysql",
            "name": "prod",
            "ts_ms": 1_700_000_000_200,
            "db": "test",
            "table": "transcripts",
            "server_id": 1111,
            "gtid": None,
            "file": "mysql-bin.000042",
            "pos": 7788,
            "row": 0,
        },
        "op": "c",
        "ts_ms": 1_700_000_000_201,
    }
    tombstone = None
    df = spark.createDataFrame(
        [(json.dumps(doc),), (json.dumps(tombstone),), ("not json",)],
        "value string",
    )
    rows = decode_debezium(df).collect()
    assert len(rows) == 1  # tombstone + junk dropped
    r = rows[0]
    assert r["file_seq"] == 42 and r["log_pos"] == 7788
    assert r["op"] == "I" and r["db_name"] == "test"
    assert r["before"] is None
    assert r["after"]["conv_id"] == "c1" and r["after"]["turn_idx"] == 3
    assert r["after"]["ts"].microsecond == 123456


def test_op_mapping_including_snapshot_read(spark):
    docs = []
    for op in ("c", "r", "u", "d"):
        docs.append(
            json.dumps(
                {
                    "before": {"conv_id": "x", "turn_idx": 1, "ts": 1},
                    "after": {"conv_id": "x", "turn_idx": 1, "ts": 2},
                    "source": {"db": "d", "table": "t", "file": "b.000001", "pos": 4},
                    "op": op,
                    "ts_ms": 5,
                }
            )
        )
    out = {
        r["op"]
        for r in decode_debezium(
            spark.createDataFrame([(d,) for d in docs], "value string")
        ).collect()
    }
    assert out == {"I", "U", "D"}  # c and r both -> I


def test_round_trip_preserves_envelope(spark):
    ev = generate_binlog(spark, GeneratorParams(n_events=2000, dup_tail=200))
    decoded = decode_debezium(envelope_to_debezium_json(ev))
    # identical framing + images (ts is MicroTimestamp: lossless); the JSON
    # carries no epoch marker, so schema_version and pre-epoch tool values
    # are the documented exceptions (tool nulls where the connector's
    # event-time schema lacked the column)
    a = ev.select(
        "file_seq", "log_pos", "op", "db_name", "table_name",
        F.col("before")["conv_id"].alias("bk"),
        F.col("after")["conv_id"].alias("ak"),
        F.col("after")["text"].alias("at"),
        F.col("after")["ts"].alias("ats"),
        F.when(F.col("schema_version") >= 2, F.col("after")["tool"]).alias("atool"),
    )
    b = decoded.select(
        "file_seq", "log_pos", "op", "db_name", "table_name",
        F.col("before")["conv_id"].alias("bk"),
        F.col("after")["conv_id"].alias("ak"),
        F.col("after")["text"].alias("at"),
        F.col("after")["ts"].alias("ats"),
        F.col("after")["tool"].alias("atool"),
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # server_ts survives at millisecond precision (ts_ms is millis by name)
    ms = decoded.select(
        (F.unix_micros("server_ts") % 1000).alias("sub_ms")
    ).agg(F.max("sub_ms")).collect()[0][0]
    assert ms == 0


def test_debezium_pipeline_matches_structured_final_state(spark, tmp_path):
    """The whole point: a Debezium feed of the same change stream MERGEs
    to a BIT-IDENTICAL final table vs the structured path (epoch-1 rows
    land with tool null on both paths)."""
    ev = generate_binlog(spark, GeneratorParams(n_events=4000, dup_tail=400))

    t_struct = LakeTable(spark, str(tmp_path / "t1"), buckets=8)
    apply_batch(t_struct, ev, batch_id=1, cfg=EngineConfig())

    t_dbz = LakeTable(spark, str(tmp_path / "t2"), buckets=8)
    apply_batch(
        t_dbz,
        decode_debezium(envelope_to_debezium_json(ev)),
        batch_id=1,
        cfg=EngineConfig(),
    )

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = t_struct.read().select(cols)
    b = t_dbz.read().select(cols)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_debezium_stream_end_to_end(spark, tmp_path):
    """run_stream_debezium over a JSON-lines landing zone: multi-batch
    stream lands the same final state as a one-shot structured apply of
    the same generated change stream."""
    from binlogsub_spark.pipeline import run_stream_debezium
    from binlogsub_spark.sources.generator import write_debezium_json

    params = GeneratorParams(n_events=3000, dup_tail=300)
    src = str(tmp_path / "dbz")
    write_debezium_json(spark, src, params, n_files=8)

    table = LakeTable(spark, str(tmp_path / "tbl"), buckets=8)
    q = run_stream_debezium(
        spark,
        src,
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        cfg=EngineConfig(),
        max_files_per_trigger=3,
    )
    q.awaitTermination(180)

    expected = LakeTable(spark, str(tmp_path / "exp"), buckets=8)
    apply_batch(
        expected, generate_binlog(spark, params), batch_id=1, cfg=EngineConfig()
    )
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = expected.read().select(cols)
    b = table.read().select(cols)
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
