"""Extra isolation benchmarks (guide §1.4) — NOT the driver bench.

Times each stage of the structured ingest with a noop sink so the
computation is measured, not the sink, plus decode-only passes for the
raw path. Usage:

    SPARK_GRAFT_CPUS=32 EXTRA_EVENTS=8000000 python bench_extra.py

Prints one JSON line with per-stage seconds (best-of-2).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from binlogsub_spark.config import EngineConfig
from binlogsub_spark.lake.table import LakeTable, bucket_expr
from binlogsub_spark.operators.dedup import lww_reduce, partial_lww_reduce
from binlogsub_spark.pipeline import apply_batch, prepare_upserts
from binlogsub_spark.plans.envelope import MERGE_KEY
from binlogsub_spark.session import get_spark
from binlogsub_spark.sources.generator import GeneratorParams, write_binlog

N = int(os.environ.get("EXTRA_EVENTS", "8000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BUCKETS = max(CPUS, 16)

spark = get_spark(app_name="bench-extra", master=f"local[{CPUS}]",
                  shuffle_partitions=max(CPUS, 8))
sc = spark.sparkContext
params = GeneratorParams(n_events=N, n_convs=max(N // 50, 100),
                         dup_tail=N // 40, events_per_file=65536)
tmp = tempfile.mkdtemp(prefix="bench_extra_")
res: dict[str, float] = {}
k = [0]
try:
    src = os.path.join(tmp, "binlog")
    write_binlog(spark, src, params, n_files=max(CPUS, 16))
    events = spark.read.parquet(src)
    events.count()
    cfg = EngineConfig()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def t(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        res[name] = min(res.get(name, 1e9), round(dt, 3))
        sc.setJobDescription(None)
        print(f"  {name}: {dt:.3f}s", flush=True)

    up = prepare_upserts(events, cfg)
    partials = partial_lww_reduce(up, salt=cfg.skew_salt)
    withb = partials.withColumn("_bucket", bucket_expr(MERGE_KEY[0], BUCKETS))
    coloc = withb.repartition(4 * BUCKETS, "_bucket")
    final = lww_reduce(coloc, key=MERGE_KEY + ["_bucket"], salt=1)

    def run_full():
        k[0] += 1
        tb = LakeTable(spark, os.path.join(tmp, f"t{k[0]}"), buckets=BUCKETS)
        apply_batch(tb, events, batch_id=1, cfg=cfg)

    for rep in range(2):
        print(f"round {rep}", flush=True)
        t("scan_flatten_noop", lambda: noop(up))
        t("plus_partial_reduce_noop", lambda: noop(partials))
        t("plus_bucket_exchange_noop", lambda: noop(coloc))
        t("plus_final_reduce_noop", lambda: noop(final))
        t("full_apply_batch", run_full)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
print(json.dumps(res))
spark.stop()
