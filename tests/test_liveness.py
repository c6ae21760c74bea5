"""T7 — source-liveness watchdog (the mysql_ping analog,
mysqlProcess.cc:70-87): data batches are heartbeats, idle streams probe
the source, repeated probe failure fails the query for a
restart-from-checkpoint."""

import os

import pytest

from binlogsub_spark.liveness import (
    LivenessConfig,
    SourceLivenessError,
    SourceLivenessMonitor,
    hadoop_fs_probe,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_busy_stream_never_probes():
    clock = FakeClock()
    calls = []
    mon = SourceLivenessMonitor(
        probe=lambda: calls.append(1) or True,
        cfg=LivenessConfig(ping_interval_sec=10),
        clock=clock,
    )
    for b in range(100):
        clock.t += 60.0  # batches far apart, but every one carries data
        assert mon.on_batch(b, n_events=5) is None
    assert calls == [] and mon.probes == 0


def test_idle_stream_probes_after_interval_and_renews():
    clock = FakeClock()
    mon = SourceLivenessMonitor(
        probe=lambda: True,
        cfg=LivenessConfig(ping_interval_sec=10),
        clock=clock,
    )
    clock.t = 5.0
    assert mon.on_batch(1, 0) is None  # idle 5s < interval: no probe
    clock.t = 11.0
    rec = mon.on_batch(2, 0)  # idle 11s >= interval: probe fires
    assert rec["ok"] is True and rec["consecutive_failures"] == 0
    # success RENEWED the session: the next empty batch inside a fresh
    # interval does not probe (reference pings at most every 10s)
    clock.t = 15.0
    assert mon.on_batch(3, 0) is None
    clock.t = 22.0
    assert mon.on_batch(4, 0)["ok"] is True
    assert mon.probes == 2


def test_consecutive_failures_raise_and_data_resets_streak(tmp_path):
    clock = FakeClock()
    alive = {"ok": False}
    hb_dir = str(tmp_path / "hb")
    mon = SourceLivenessMonitor(
        probe=lambda: alive["ok"],
        cfg=LivenessConfig(ping_interval_sec=10, max_failures=3),
        heartbeat_dir=hb_dir,
        clock=clock,
    )
    clock.t = 20.0
    assert mon.on_batch(1, 0)["consecutive_failures"] == 1
    clock.t = 40.0
    assert mon.on_batch(2, 0)["consecutive_failures"] == 2
    # a data batch is proof of life: streak resets without any probe
    clock.t = 41.0
    assert mon.on_batch(3, 10) is None
    clock.t = 60.0
    assert mon.on_batch(4, 0)["consecutive_failures"] == 1
    clock.t = 80.0
    assert mon.on_batch(5, 0)["consecutive_failures"] == 2
    clock.t = 100.0
    with pytest.raises(SourceLivenessError):
        mon.on_batch(6, 0)
    # every probe left a heartbeat row, including the fatal one
    assert len(os.listdir(hb_dir)) == 5


def test_probe_exception_counts_as_failure():
    clock = FakeClock()

    def bad_probe():
        raise OSError("mount gone")

    mon = SourceLivenessMonitor(
        probe=bad_probe,
        cfg=LivenessConfig(ping_interval_sec=1, max_failures=2),
        clock=clock,
    )
    clock.t = 2.0
    assert mon.on_batch(1, 0)["ok"] is False
    clock.t = 4.0
    with pytest.raises(SourceLivenessError):
        mon.on_batch(2, 0)


def test_hadoop_fs_probe_and_stream_integration(spark, tmp_path):
    """End-to-end: the Hadoop-FS probe sees a real path; run_stream with
    liveness enabled processes a live source normally (data batches are
    heartbeats — no probes fire, no heartbeat log appears)."""
    from binlogsub_spark.config import EngineConfig
    from binlogsub_spark.lake.table import LakeTable
    from binlogsub_spark.pipeline import run_stream
    from binlogsub_spark.sources.generator import GeneratorParams, generate_binlog

    src = str(tmp_path / "src")
    events = generate_binlog(spark, GeneratorParams(n_events=500, dup_tail=0))
    events.write.parquet(src)

    assert hadoop_fs_probe(spark, src) is True
    assert hadoop_fs_probe(spark, str(tmp_path / "missing")) is False

    table = LakeTable(spark, str(tmp_path / "tbl"), buckets=8)
    q = run_stream(
        spark,
        src,
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        cfg=EngineConfig(),
        liveness=LivenessConfig(ping_interval_sec=10),
    )
    q.awaitTermination(120)
    assert table.read().count() > 0
    assert not os.path.exists(os.path.join(table.path, "_heartbeats"))
