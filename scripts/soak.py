"""Soak: 10x the bench volume in ONE batch at local[32] (BENCH/BASELINE.md
addendum). Also emits the raw-vs-structured per-event comparison on 2M
events. Prints one JSON line; update the addenda by hand from it.

Usage: python scripts/soak.py [n_events]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlogsub_spark.config import EngineConfig
from binlogsub_spark.lake.table import LakeTable
from binlogsub_spark.pipeline import apply_batch, apply_raw_batch
from binlogsub_spark.session import get_spark
from binlogsub_spark.sources.generator import (
    GeneratorParams,
    write_binlog,
    write_raw_binlog,
)


def main() -> int:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(pos[0]) if pos else 20_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="soak", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    tmp = tempfile.mkdtemp(prefix="soak_")
    out: dict = {"n_events": n, "cpus": cpus}
    try:
        params = GeneratorParams(
            n_events=n, n_convs=400_000, dup_tail=500_000, events_per_file=262_144
        )
        src = os.path.join(tmp, "binlog")
        write_binlog(spark, src, params, n_files=256)
        events = spark.read.parquet(src)
        events.count()  # warm page cache
        table = LakeTable(spark, os.path.join(tmp, "tbl"), buckets=128)
        t0 = time.time()
        m = apply_batch(table, events, batch_id=1, cfg=EngineConfig())
        dt = time.time() - t0
        out["soak_sec"] = round(dt, 1)
        out["soak_events"] = m["events"]
        out["soak_eps"] = round(m["events"] / dt, 0)
        out["soak_live_rows"] = table.read().count()  # determinism check

        if "--soak-only" in sys.argv:
            print(json.dumps(out))
            spark.stop()
            return 0

        # raw vs structured per-event cost, same 2M volume each
        p2 = GeneratorParams(
            n_events=2_000_000, n_convs=40_000, dup_tail=0, events_per_file=65_536
        )
        ssrc = os.path.join(tmp, "s2m")
        write_binlog(spark, ssrc, p2, n_files=max(cpus, 16))
        sdf = spark.read.parquet(ssrc)
        sdf.count()
        best_s = None
        for _ in range(3):
            t = LakeTable(spark, tempfile.mkdtemp(dir=tmp), buckets=max(cpus, 16))
            t0 = time.time()
            apply_batch(t, sdf, batch_id=1, cfg=EngineConfig())
            best_s = min(best_s or 1e9, time.time() - t0)
        rsrc = os.path.join(tmp, "r2m")
        write_raw_binlog(spark, rsrc, p2, n_files=max(cpus, 16))
        rdf = spark.read.parquet(rsrc)
        rdf.count()
        best_r = None
        for _ in range(3):
            t = LakeTable(spark, tempfile.mkdtemp(dir=tmp), buckets=max(cpus, 16))
            t0 = time.time()
            apply_raw_batch(t, rdf, batch_id=1, cfg=EngineConfig())
            best_r = min(best_r or 1e9, time.time() - t0)
        out["structured_eps_2m"] = round(2_000_000 / best_s, 0)
        out["raw_eps_2m"] = round(2_000_000 / best_r, 0)
        out["raw_vs_structured_gap"] = round(best_r / best_s, 2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
