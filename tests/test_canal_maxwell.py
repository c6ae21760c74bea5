"""Canal-JSON (flatMessage) and Maxwell-JSON sources: decode/encode
fidelity (incl. the formats' array/partial-old-image quirks) and
full-pipeline equivalence with the structured path."""

import json

from pyspark.sql import functions as F

from binlogsub_spark.config import EngineConfig
from binlogsub_spark.lake.table import LakeTable
from binlogsub_spark.pipeline import apply_batch
from binlogsub_spark.sources.canal import decode_canal, envelope_to_canal_json
from binlogsub_spark.sources.generator import (
    GeneratorParams,
    generate_binlog,
    read_canal_lines,
)
from binlogsub_spark.sources.maxwell import (
    decode_maxwell,
    envelope_to_maxwell_json,
)


def test_decode_real_canal_flatmessage_multirow(spark):
    """A hand-written flatMessage in canal's published shape: MULTI-row
    data array, UPDATE old array carrying only the changed columns (the
    before-image is old overlaid on data), string-serialized values, DDL
    and junk lines dropped."""
    update_msg = {
        "id": 7,
        "database": "test",
        "table": "transcripts",
        "pkNames": ["conv_id", "turn_idx"],
        "isDdl": False,
        "type": "UPDATE",
        "es": 1_700_000_000_200,
        "ts": 1_700_000_000_900,
        "sql": "",
        "sqlType": {"conv_id": 12, "turn_idx": 4},
        "mysqlType": {"conv_id": "varchar(64)", "turn_idx": "int(11)"},
        "data": [
            {"conv_id": "c1", "turn_idx": "3", "role": "user",
             "text": "new-a", "tool": None,
             "ts": "2026-01-02 03:04:05.123456"},
            {"conv_id": "c2", "turn_idx": "4", "role": "assistant",
             "text": "new-b", "tool": "tool_1",
             "ts": "2026-01-02 03:04:06.000000"},
        ],
        # only the CHANGED columns' old values, per canal semantics
        "old": [
            {"text": "old-a"},
            {"text": "old-b", "tool": "tool_0"},
        ],
    }
    ddl_msg = {
        "id": 8, "database": "test", "table": "transcripts", "isDdl": True,
        "type": "ALTER", "es": 1, "ts": 2,
        "sql": "ALTER TABLE transcripts ADD COLUMN tool varchar(32)",
        "data": None, "old": None,
    }
    df = spark.createDataFrame(
        [(json.dumps(update_msg),), (json.dumps(ddl_msg),), ("not json",)],
        "value string",
    )
    rows = decode_canal(df).orderBy("log_pos").collect()
    assert len(rows) == 2  # ddl + junk dropped; 2 data rows exploded
    r0, r1 = rows
    # no framing columns -> ordering synthesized from (id, row index)
    assert r0["file_seq"] == 0 and r0["log_pos"] == 7 * 4096 + 0
    assert r1["log_pos"] == 7 * 4096 + 1
    assert r0["op"] == "U" and r0["db_name"] == "test"
    # after = data (typed); before = old overlaid on data
    assert r0["after"]["text"] == "new-a" and r0["before"]["text"] == "old-a"
    assert r0["before"]["conv_id"] == "c1"  # unchanged col from data
    assert r0["after"]["turn_idx"] == 3  # string -> int
    assert r0["after"]["ts"].microsecond == 123456
    assert r1["before"]["tool"] == "tool_0" and r1["after"]["tool"] == "tool_1"
    # es (source exec time, ms) becomes server_ts
    assert r0["server_ts"].microsecond == 200_000


def test_canal_op_mapping_and_delete_image(spark):
    msgs = []
    for i, typ in enumerate(("INSERT", "UPDATE", "DELETE")):
        msgs.append(json.dumps({
            "id": i, "database": "d", "table": "t", "isDdl": False,
            "type": typ, "es": 1000, "ts": 1000,
            "data": [{"conv_id": "x", "turn_idx": "1", "role": "user",
                      "text": "m", "tool": None,
                      "ts": "2026-01-01 00:00:00.000000"}],
            "old": [{"text": "prev"}] if typ == "UPDATE" else None,
        }))
    rows = {r["op"]: r for r in decode_canal(
        spark.createDataFrame([(m,) for m in msgs], "value string")
    ).collect()}
    assert set(rows) == {"I", "U", "D"}
    assert rows["I"]["before"] is None and rows["I"]["after"] is not None
    # DELETE: data IS the deleted row -> before image, after null
    assert rows["D"]["before"]["text"] == "m" and rows["D"]["after"] is None


def test_canal_round_trip_preserves_envelope(spark):
    ev = generate_binlog(spark, GeneratorParams(n_events=2000, dup_tail=200))
    decoded = decode_canal(envelope_to_canal_json(ev))

    def proj(df, tool_col):
        return df.select(
            "file_seq", "log_pos", "op", "db_name", "table_name",
            F.col("before")["conv_id"].alias("bk"),
            F.col("after")["conv_id"].alias("ak"),
            F.col("after")["turn_idx"].alias("ati"),
            F.col("after")["text"].alias("at"),
            F.col("after")["ts"].alias("ats"),
            tool_col.alias("atool"),
        )

    a = proj(ev, F.when(F.col("schema_version") >= 2, F.col("after")["tool"]))
    b = proj(decoded, F.col("after")["tool"])
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # es is epoch-ms -> server_ts survives at millisecond precision
    sub = decoded.select(
        (F.unix_micros("server_ts") % 1000).alias("s")
    ).agg(F.max("s")).collect()[0][0]
    assert sub == 0


def test_decode_real_maxwell_document(spark):
    """Hand-written maxwell records: typed values, epoch-second ts,
    in-band binlog position, partial old image, bootstrap records."""
    update = {
        "database": "test", "table": "transcripts", "type": "update",
        "ts": 1_700_000_000, "xid": 5555, "commit": True,
        "position": "mysql-bin.000042:91263",
        "data": {"conv_id": "c1", "turn_idx": 3, "role": "user",
                 "text": "new", "tool": None,
                 "ts": "2026-01-02 03:04:05.123456"},
        "old": {"text": "old"},
    }
    bootstrap_start = {
        "database": "test", "table": "transcripts",
        "type": "bootstrap-start", "ts": 1_700_000_000, "data": {},
    }
    bootstrap_insert = {
        "database": "test", "table": "transcripts",
        "type": "bootstrap-insert", "ts": 1_700_000_001,
        "data": {"conv_id": "c9", "turn_idx": 1, "role": "user",
                 "text": "snap", "tool": None,
                 "ts": "2026-01-01 00:00:00.000000"},
    }
    df = spark.createDataFrame(
        [(json.dumps(update),), (json.dumps(bootstrap_start),),
         (json.dumps(bootstrap_insert),), ("junk",)],
        "value string",
    )
    out = decode_maxwell(df)
    rows = out.orderBy("log_pos").collect()
    # bootstrap-start/complete are control records (not in the op map) ->
    # dropped; junk dropped; the update + bootstrap-insert survive.
    assert len(rows) == 2
    boot, upd = rows
    assert upd["file_seq"] == 42 and upd["log_pos"] == 91263
    assert upd["op"] == "U"
    assert upd["after"]["text"] == "new" and upd["before"]["text"] == "old"
    assert upd["before"]["conv_id"] == "c1"  # unchanged col via overlay
    assert upd["after"]["ts"].microsecond == 123456
    # tz-safe epoch check (collect() returns session-local naive datetimes)
    assert out.where(F.col("op") == "U").select(
        F.unix_seconds("server_ts")
    ).collect()[0][0] == 1_700_000_000
    # bootstrap-insert maps to I; no position and no xid -> log_pos
    # null-safe fallback 0
    assert boot["op"] == "I" and boot["after"]["text"] == "snap"
    assert boot["log_pos"] == 0


def test_maxwell_round_trip_preserves_envelope(spark):
    ev = generate_binlog(spark, GeneratorParams(n_events=2000, dup_tail=200))
    decoded = decode_maxwell(envelope_to_maxwell_json(ev))

    def proj(df, tool_col):
        return df.select(
            "file_seq", "log_pos", "op", "db_name", "table_name",
            F.col("before")["conv_id"].alias("bk"),
            F.col("after")["conv_id"].alias("ak"),
            F.col("after")["turn_idx"].alias("ati"),
            F.col("after")["text"].alias("at"),
            F.col("after")["ts"].alias("ats"),
            tool_col.alias("atool"),
        )

    a = proj(ev, F.when(F.col("schema_version") >= 2, F.col("after")["tool"]))
    b = proj(decoded, F.col("after")["tool"])
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # ts is epoch-SECONDS -> server_ts survives at second precision
    sub = decoded.select(
        (F.unix_micros("server_ts") % 1_000_000).alias("s")
    ).agg(F.max("s")).collect()[0][0]
    assert sub == 0


def test_canal_and_maxwell_pipelines_match_structured_final_state(
    spark, tmp_path
):
    """A canal or maxwell feed of the same change stream MERGEs to a
    BIT-IDENTICAL final table vs the structured path."""
    ev = generate_binlog(spark, GeneratorParams(n_events=4000, dup_tail=400))

    t_struct = LakeTable(spark, str(tmp_path / "t0"), buckets=8)
    apply_batch(t_struct, ev, batch_id=1, cfg=EngineConfig())
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = t_struct.read().select(cols)

    for name, decoded in (
        ("canal", decode_canal(envelope_to_canal_json(ev))),
        ("maxwell", decode_maxwell(envelope_to_maxwell_json(ev))),
    ):
        t = LakeTable(spark, str(tmp_path / f"t_{name}"), buckets=8)
        apply_batch(t, decoded, batch_id=1, cfg=EngineConfig())
        b = t.read().select(cols)
        assert a.count() == b.count(), name
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, name


def test_canal_stream_end_to_end(spark, tmp_path):
    """run_stream_canal over a framed landing zone: multi-batch stream
    lands the same final state as a one-shot structured apply."""
    from binlogsub_spark.pipeline import run_stream_canal
    from binlogsub_spark.sources.generator import write_canal_json

    params = GeneratorParams(n_events=3000, dup_tail=300)
    src = str(tmp_path / "canal")
    write_canal_json(spark, src, params, n_files=8)

    # the framing prefix splits back losslessly
    framed = read_canal_lines(spark.read.text(src))
    assert framed.where(F.col("log_pos").isNull()).count() == 0

    table = LakeTable(spark, str(tmp_path / "tbl"), buckets=8)
    q = run_stream_canal(
        spark, src, table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        cfg=EngineConfig(), max_files_per_trigger=3,
    )
    q.awaitTermination(120)

    t_ref = LakeTable(spark, str(tmp_path / "ref"), buckets=8)
    apply_batch(t_ref, generate_binlog(spark, params), batch_id=1,
                cfg=EngineConfig())
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a, b = t_ref.read().select(cols), table.read().select(cols)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_maxwell_stream_end_to_end(spark, tmp_path):
    from binlogsub_spark.pipeline import run_stream_maxwell
    from binlogsub_spark.sources.generator import write_maxwell_json

    params = GeneratorParams(n_events=3000, dup_tail=300)
    src = str(tmp_path / "mw")
    write_maxwell_json(spark, src, params, n_files=8)

    table = LakeTable(spark, str(tmp_path / "tbl"), buckets=8)
    q = run_stream_maxwell(
        spark, src, table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        cfg=EngineConfig(), max_files_per_trigger=3,
    )
    q.awaitTermination(120)

    t_ref = LakeTable(spark, str(tmp_path / "ref"), buckets=8)
    apply_batch(t_ref, generate_binlog(spark, params), batch_id=1,
                cfg=EngineConfig())
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a, b = t_ref.read().select(cols), table.read().select(cols)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
