"""Decompose cdc_ingest_replay time at the bench config (local[32], 2M events).

Times, interleaved best-of-N:
  A  lineage pruned-scan job alone
  B  apply_batch persist_source=False  (r3 default)
  C  apply_batch persist_source=True   (r2 behavior)
and a stage split of the merge (winners-cache job vs write job).
"""
import os, sys, time, tempfile, shutil, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlogsub_spark.config import EngineConfig
from binlogsub_spark.lake.table import LakeTable
from binlogsub_spark.pipeline import apply_batch
from binlogsub_spark.session import get_spark
from binlogsub_spark.sources.generator import GeneratorParams, generate_binlog, write_binlog

N = int(os.environ.get("PROF_EVENTS", "2000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PROF_REPS", "2"))

spark = get_spark(app_name="profile-ingest", master=f"local[{CPUS}]",
                  shuffle_partitions=max(CPUS, 8))
from pyspark.sql import functions as F

params = GeneratorParams(n_events=N, n_convs=max(N // 50, 100),
                         dup_tail=N // 40, events_per_file=65536)
tmp = tempfile.mkdtemp(prefix="prof_ingest_")
res: dict[str, float] = {}
try:
    warm = generate_binlog(spark, GeneratorParams(n_events=20_000, dup_tail=0))
    apply_batch(LakeTable(spark, os.path.join(tmp, "warm"), buckets=8), warm, batch_id=1)

    src = os.path.join(tmp, "binlog")
    write_binlog(spark, src, params, n_files=max(CPUS, 16))
    events = spark.read.parquet(src)
    events.count()

    def timeit(name, fn):
        t0 = time.time(); fn(); dt = time.time() - t0
        res[name] = min(res.get(name, 1e9), dt)
        print(f"  {name}: {dt:.3f}s", flush=True)

    k = [0]
    def run_A():
        # mirrors apply_batch's ACTUAL lineage job (incl. bucket hashing +
        # collect_set) so the A-vs-B decomposition attributes cost correctly
        from binlogsub_spark.lake.table import bucket_expr

        img_conv = F.when(
            F.col("op") == "D", F.col("before.conv_id")
        ).otherwise(F.col("after.conv_id"))
        (events.select("file_seq", "log_pos",
                       bucket_expr(img_conv, max(CPUS, 16)).alias("_b"))
         .groupBy("file_seq")
         .agg(F.max("log_pos"), F.count("*"), F.collect_set("_b")).collect())
    def run_B():
        k[0] += 1
        t = LakeTable(spark, os.path.join(tmp, f"tB{k[0]}"), buckets=max(CPUS, 16))
        apply_batch(t, events, batch_id=1, cfg=EngineConfig(), persist_source=False)
    def run_C():
        k[0] += 1
        t = LakeTable(spark, os.path.join(tmp, f"tC{k[0]}"), buckets=max(CPUS, 16))
        apply_batch(t, events, batch_id=1, cfg=EngineConfig(), persist_source=True)
    def run_D():
        # stage split of the r3 path (no lineage job): winners job vs write job
        k[0] += 1
        from binlogsub_spark.operators.dedup import partial_lww_reduce
        from binlogsub_spark.pipeline import prepare_upserts
        t = LakeTable(spark, os.path.join(tmp, f"tD{k[0]}"), buckets=max(CPUS, 16))
        cfg = EngineConfig()
        t0 = time.time()
        partials = partial_lww_reduce(prepare_upserts(events, cfg), salt=cfg.skew_salt)
        t.merge(partials, batch_id=1, watermark=None, pre_reduced=True)
        print(f"    D merge-only: {time.time()-t0:.3f}s", flush=True)

    for rep in range(REPS):
        print(f"round {rep}", flush=True)
        for name, fn in [("A_lineage_scan", run_A), ("B_r3_nopersist", run_B),
                         ("C_r2_persist", run_C), ("D_merge_only", run_D)]:
            timeit(name, fn)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
print(json.dumps({k2: round(v, 3) for k2, v in res.items()}))
spark.stop()
