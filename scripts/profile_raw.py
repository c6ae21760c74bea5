"""Decompose cdc_ingest_raw_decode at the bench config (local[32], 1M events)."""
import os, sys, time, tempfile, shutil, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlogsub_spark.config import EngineConfig
from binlogsub_spark.lake.table import LakeTable
from binlogsub_spark.pipeline import apply_raw_batch
from binlogsub_spark.session import get_spark
from binlogsub_spark.sources.generator import GeneratorParams, write_raw_binlog
from binlogsub_spark.codec import decode_raw_events

N = int(os.environ.get("PROF_EVENTS", "1000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PROF_REPS", "3"))

spark = get_spark(app_name="profile-raw", master=f"local[{CPUS}]",
                  shuffle_partitions=max(CPUS, 8))
from pyspark.sql import functions as F

tmp = tempfile.mkdtemp(prefix="prof_raw_")
res: dict[str, float] = {}
try:
    src = os.path.join(tmp, "rawlog")
    write_raw_binlog(spark, src,
                     GeneratorParams(n_events=N, n_convs=max(N // 50, 100),
                                     dup_tail=0, events_per_file=65536),
                     n_files=max(CPUS, 16))
    raw = spark.read.parquet(src)
    raw.count()

    def timeit(name, fn):
        t0 = time.time(); fn(); dt = time.time() - t0
        res[name] = min(res.get(name, 1e9), dt)
        print(f"  {name}: {dt:.3f}s", flush=True)

    k = [0]
    def run_decode_only():
        decode_raw_events(raw).count()
    def run_decode_novalidate():
        decode_raw_events(raw, skip_invalid=False).count()
    def run_full():
        k[0] += 1
        t = LakeTable(spark, os.path.join(tmp, f"t{k[0]}"), buckets=max(CPUS, 16))
        apply_raw_batch(t, raw, batch_id=1, cfg=EngineConfig())

    for rep in range(REPS):
        print(f"round {rep}", flush=True)
        timeit("decode_only", run_decode_only)
        timeit("decode_novalidate", run_decode_novalidate)
        timeit("full_apply", run_full)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
print(json.dumps({k2: round(v, 3) for k2, v in res.items()}))
spark.stop()
