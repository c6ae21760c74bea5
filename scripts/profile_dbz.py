"""A/B the Debezium ingest: persist_source=False (2 JSON passes: pruned
lineage parse + full parse in the merge job) vs persist_source=True
(parse once, cache decoded events)."""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlogsub_spark.config import EngineConfig
from binlogsub_spark.lake.table import LakeTable
from binlogsub_spark.pipeline import apply_batch
from binlogsub_spark.session import get_spark
from binlogsub_spark.sources.debezium import decode_debezium
from binlogsub_spark.sources.generator import GeneratorParams, write_debezium_json

N = int(os.environ.get("PROF_EVENTS", "2000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PROF_REPS", "3"))

spark = get_spark(app_name="profile-dbz", master=f"local[{CPUS}]",
                  shuffle_partitions=max(CPUS, 8))

tmp = tempfile.mkdtemp(prefix="prof_dbz_")
res: dict[str, float] = {}
try:
    src = os.path.join(tmp, "dbzlog")
    write_debezium_json(
        spark, src,
        GeneratorParams(n_events=N, n_convs=max(N // 50, 100),
                        dup_tail=N // 40, events_per_file=65536),
        n_files=max(CPUS, 16))
    dbz = spark.read.text(src)
    dbz.count()

    k = [0]
    def run(persist):
        k[0] += 1
        t = LakeTable(spark, os.path.join(tmp, f"t{k[0]}"), buckets=max(CPUS, 16))
        m = apply_batch(t, decode_debezium(dbz), batch_id=1, cfg=EngineConfig(),
                        persist_source=persist)
        return m

    # warmup both shapes
    run(False); run(True)
    for rep in range(REPS):
        for name, persist in (("no_persist", False), ("persist", True)):
            spark.sparkContext.setJobDescription(f"dbz_{name}")
            t0 = time.time(); m = run(persist); dt = time.time() - t0
            res[name] = min(res.get(name, 1e9), dt)
            print(f"round {rep} {name}: {dt:.3f}s events={m['events']}", flush=True)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
print(json.dumps({k2: round(v, 3) for k2, v in res.items()}))
spark.stop()
