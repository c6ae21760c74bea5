"""Decompose dedup_minhash_lsh / dedup_incremental at bench-like scale.

Replicates the sf0.1 documents table REPL times (distinct doc_ids per
replica) to emulate the driver's larger sf, then times each stage of
minhash_lsh_pairs the way bench.py runs it (result_path materialization).
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlogsub_spark.session import get_spark
from binlogsub_spark.functions.dedup import (
    incremental_minhash_pairs,
    minhash_band_store,
    minhash_lsh_pairs,
    minhash_signatures,
    shingle_df,
    write_minhash_band_store,
)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPL = int(os.environ.get("PROF_REPL", "10"))
REPS = int(os.environ.get("PROF_REPS", "2"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="profile-lsh", master=f"local[{CPUS}]",
                  shuffle_partitions=max(CPUS, 8))
from pyspark.sql import functions as F

tmp = tempfile.mkdtemp(prefix="prof_lsh_")
res: dict[str, float] = {}
try:
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    reps = spark.range(REPL).select(F.col("id").alias("rep"))
    docs_src = os.path.join(tmp, "docs")
    (base.crossJoin(reps)
         .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
         .drop("rep")
         .repartition(CPUS)
         .write.mode("overwrite").parquet(docs_src))
    docs = spark.read.parquet(docs_src)
    n_docs = docs.count()
    print(f"docs: {n_docs}", flush=True)

    def timeit(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time(); r = fn(); dt = time.time() - t0
        res[name] = min(res.get(name, 1e9), dt)
        print(f"  {name}: {dt:.3f}s", flush=True)
        return r

    for rep in range(REPS):
        print(f"round {rep}", flush=True)
        # stage decomposition
        sh = shingle_df(docs).persist()
        timeit("shingle_persist_count", lambda: sh.count())
        sig = minhash_signatures(None, shingles=sh)
        timeit("signature_agg", lambda: sig.write.format("noop").mode("overwrite").save())
        from binlogsub_spark.functions.dedup import _band_key_expr
        band = sig.select(
            F.col("doc_id"),
            F.explode(F.array(*_band_key_expr(16, 4, "xxhash64"))).alias("bb"),
        ).select("doc_id", "bb.band", "bb.bh").persist()
        timeit("band_persist_count", lambda: band.count())
        a, b = band.alias("a"), band.alias("b")
        cand = (
            a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
            .distinct()
        ).persist()
        ncand = timeit("cand_join_count", lambda: cand.count())
        print(f"  candidates: {ncand}", flush=True)
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
        inter = (
            cand.join(sh.withColumnsRenamed({"doc_id": "id_a", "shingle": "s"}), "id_a")
            .join(sh.withColumnsRenamed({"doc_id": "id_b", "shingle": "s"}), ["id_b", "s"])
            .groupBy("id_a", "id_b").agg(F.count("*").alias("inter"))
        )
        out = (
            inter.join(sizes.withColumnsRenamed({"doc_id": "id_a", "sz": "sz_a"}), "id_a")
            .join(sizes.withColumnsRenamed({"doc_id": "id_b", "sz": "sz_b"}), "id_b")
            .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
            .where(F.col("jaccard") >= 0.05)
            .select("id_a", "id_b", "jaccard")
        )
        timeit("verify_join", lambda: out.write.format("noop").mode("overwrite").save())
        if rep == 0:
            with open("/tmp/lsh_verify_plan.txt", "w") as f:
                f.write(out._sc._jvm.PythonSQLUtils.explainString(
                    out._jdf.queryExecution(), "formatted"))
        cand.unpersist(); band.unpersist(); sh.unpersist()

        # end-to-end, as bench runs it
        timeit("minhash_lsh_pairs_e2e", lambda: minhash_lsh_pairs(
            docs, threshold=0.05,
            result_path=os.path.join(tmp, f"lsh{rep}")).count())

        corpus = docs.where(F.col("doc_id") % 2 == 0)
        new = docs.where(F.col("doc_id") % 2 == 1)
        t0 = time.time()
        stored = write_minhash_band_store(
            minhash_band_store(corpus), "prof_band_store",
            buckets=max(CPUS, 16), path=os.path.join(tmp, f"band_store{rep}"))
        res["store_build"] = min(res.get("store_build", 1e9), time.time() - t0)
        print(f"  store_build: {time.time()-t0:.3f}s", flush=True)
        timeit("incremental_e2e", lambda: incremental_minhash_pairs(
            new, corpus, stored, threshold=0.05,
            result_path=os.path.join(tmp, f"inc{rep}")).count())
        spark.sql("DROP TABLE IF EXISTS prof_band_store")
finally:
    shutil.rmtree(tmp, ignore_errors=True)
print(json.dumps({k: round(v, 3) for k, v in res.items()}))
spark.stop()
