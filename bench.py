"""Benchmark harness. Prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "events_per_sec_applied": ..., "ingest_events": ...}

Headline: the CDC ingest itself — generate a synthetic binlog sized to the
scale factor, apply it through decode -> scope filter -> salted LWW dedup ->
copy-on-write MERGE, and report change-events/sec applied (BASELINE.json
metric). Plus representative operator timings on the driver's sf tables.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int, ingest_events: int | None = None) -> dict:
    import __spark_entry__ as entry
    from binlogsub_spark.config import EngineConfig
    from binlogsub_spark.lake.table import LakeTable
    from binlogsub_spark.pipeline import apply_batch
    from binlogsub_spark.session import get_spark
    from binlogsub_spark.sources.generator import GeneratorParams, generate_binlog

    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_num = float(sf_label)
    except ValueError:
        sf_num = 0.1
    if ingest_events is None:
        # 20M events/sf-unit: sf0.1 -> 2M change events through the full
        # path (enough work that 32 local threads are compute-bound, not
        # scheduling-bound)
        ingest_events = max(int(20_000_000 * sf_num), 100_000)

    spark = get_spark(
        app_name="binlogsub-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    timings: dict[str, float] = {}

    # ---- headline: full CDC ingest (batch replay of the binlog) ----
    params = GeneratorParams(
        n_events=ingest_events,
        n_convs=max(ingest_events // 50, 100),
        dup_tail=ingest_events // 40,
        events_per_file=65536,
    )
    tmp = tempfile.mkdtemp(prefix="binlogsub_bench_")
    try:
        # JIT/codegen warmup on a throwaway table so the timed replay
        # measures steady-state, not JVM warmup
        warm = generate_binlog(spark, GeneratorParams(n_events=20_000, dup_tail=0))
        apply_batch(
            LakeTable(spark, os.path.join(tmp, "warm"), buckets=8), warm, batch_id=1
        )

        # MySQL sections run FIRST: measured in r5, a session that has
        # already pushed ~6M events through merge jobs drags the first
        # binaryFile rep from ~1.3 s to 30-60 s (JVM heap/GC aging, not
        # host noise) — each component gets a young-JVM measurement and
        # its own untimed plan warmup instead
        # genuine MySQL-format row-event decode (vectorized wave kernel):
        # frames materialized OUTSIDE the timed section (fixture encode is
        # per-row Python by design); timed = table-map registry extraction
        # + broadcast + wave decode of every row image.
        from binlogsub_spark.mysql_binlog import (
            decode_mysql_events,
            encode_rows_df,
            extract_table_maps,
        )

        from pyspark.sql import functions as F

        tmap = entry._mysql_events_tmap()
        mysql_src = os.path.join(tmp, "mysqllog")
        # 8x-replicated input (distinct ids per replica): at 1x the job is
        # dominated by fixed Spark job overhead (~0.5 s) and measures the
        # scheduler, not the decoder; 8x amortizes it so the number reflects
        # the per-event cost that matters at 10^10 events. Best-of-2 like
        # the other components (noisy host).
        flat = entry._mysql_flat_events(spark, sf_dir)
        reps = spark.range(8).select(F.col("id").alias("rep"))
        flat8 = (
            flat.crossJoin(reps)
            .withColumn("id", F.col("id") + F.col("rep") * 10_000_000)
            .drop("rep")
        )
        encode_rows_df(
            flat8.repartition(cpus), tmap, rows_per_event=4, checksum=True
        ).write.mode("overwrite").parquet(mysql_src)
        mframes = spark.read.parquet(mysql_src)
        mframes.count()
        mysql_sec, mysql_rows = None, 0
        for _ in range(2):
            t0 = time.time()
            registry = extract_table_maps(mframes, checksum=True)
            mysql_rows = decode_mysql_events(
                mframes, registry, column_overrides={7: tmap.columns}, checksum=True
            ).count()
            dt = time.time() - t0
            mysql_sec = dt if mysql_sec is None else min(mysql_sec, dt)
        timings["cdc_mysql_row_decode"] = round(mysql_sec, 3)

        # .binlog FILE ingest: real files (magic + FD + table maps +
        # frames + CRC) -> zero-copy frame walk -> registry extract ->
        # wave decode. File writing is driver-side fixture generation
        # (untimed); parallelism = one file per task, so events_per_file
        # sizes the task count.
        from binlogsub_spark.mysql_binlog import binlog_files_to_frames
        from binlogsub_spark.pipeline import override_columns_by_table
        from binlogsub_spark.sources.generator import (
            transcripts_table_maps,
            write_mysql_binlog_files,
        )

        name_map: dict = {}
        for tm_ in transcripts_table_maps().values():
            name_map.setdefault((tm_.db, tm_.table), []).append(tm_.columns)
        # untimed warmup for the FILE plan shape (binaryFile scan + frame
        # walk + python worker spin-up) — the raw path's warmup apply fixed
        # the same first-rep descent in r4; this path lacked one and its
        # driver-bench number swung 6.7x across rounds (VERDICT r4 #1)
        warm_fdir = os.path.join(tmp, "binlogfiles_warm")
        write_mysql_binlog_files(
            spark, warm_fdir,
            GeneratorParams(n_events=4096, n_convs=200, dup_tail=0,
                            events_per_file=1024),
            checksum=True,
        )
        wf = binlog_files_to_frames(spark, warm_fdir)
        wreg = extract_table_maps(wf, checksum=True)
        decode_mysql_events(
            wf, wreg, column_overrides=override_columns_by_table(wreg, name_map),
            checksum=True,
        ).count()

        fdir = os.path.join(tmp, "binlogfiles")
        file_events = max(ingest_events // 10, 50_000)
        # one file = one binaryFile task: size files so the stage carries
        # >= 2x cpus tasks (r4's 25 tasks under-fed 32 threads and made the
        # number scheduling-bound)
        epf = max(1024, file_events // (2 * cpus))
        write_mysql_binlog_files(
            spark, fdir,
            GeneratorParams(
                n_events=file_events, n_convs=params.n_convs, dup_tail=0,
                events_per_file=epf,
            ),
            checksum=True,
        )
        file_sec, n_file_rows = None, 0
        file_reps: list[float] = []
        for _ in range(3):  # best-of-3, rep times carried in the output
            t0 = time.time()
            fframes = binlog_files_to_frames(spark, fdir)
            freg = extract_table_maps(fframes, checksum=True)
            n_file_rows = decode_mysql_events(
                fframes, freg,
                column_overrides=override_columns_by_table(freg, name_map),
                checksum=True,
            ).count()
            dt = time.time() - t0
            file_reps.append(round(dt, 3))
            file_sec = dt if file_sec is None else min(file_sec, dt)
        timings["cdc_mysql_file_ingest"] = round(file_sec, 3)


        # materialize the binlog OUTSIDE the timed section (the source
        # table pre-exists in a real deployment), then time the replay:
        # scan -> scope filter -> salted LWW -> COW MERGE commit
        src = os.path.join(tmp, "binlog")
        from binlogsub_spark.sources.generator import write_binlog

        write_binlog(spark, src, params, n_files=max(cpus, 16))
        events = spark.read.parquet(src)
        events.count()  # warm page cache like the scaling bench

        # raw wire input, LIKE-FOR-LIKE with the structured headline:
        # IDENTICAL generator params (same n_events, same dup_tail), so
        # the per-event ratio in the output JSON compares equal work —
        # r4's half-sized raw input made the fixed job cost read as a
        # fake 4.1x per-event gap
        from binlogsub_spark.pipeline import apply_raw_batch
        from binlogsub_spark.sources.generator import write_raw_binlog

        raw_src = os.path.join(tmp, "rawlog")
        write_raw_binlog(
            spark,
            raw_src,
            GeneratorParams(
                n_events=params.n_events, n_convs=params.n_convs,
                dup_tail=params.dup_tail, events_per_file=65536,
            ),
            n_files=max(cpus, 16),
        )
        raw = spark.read.parquet(raw_src)
        raw.count()
        # untimed warmup for the RAW plan shape (kernel pickling, python
        # worker spin-up, codegen); the structured path got the same via
        # the `warm` apply at the top
        write_raw_binlog(
            spark, os.path.join(tmp, "rawwarm"),
            GeneratorParams(n_events=50_000, dup_tail=0), n_files=8,
        )
        apply_raw_batch(
            LakeTable(spark, os.path.join(tmp, "rawwarmtbl"), buckets=8),
            spark.read.parquet(os.path.join(tmp, "rawwarm")),
            batch_id=1, cfg=EngineConfig(),
        )

        # INTERLEAVED best-of-3: structured and raw alternate within the
        # same session so neither is selectively penalized by session age
        # or a noisy window (the r5 sequential ordering once flipped the
        # per-event ratio from 2.0 to 0.8 on ordering alone)
        ingest_sec, metrics = None, None
        raw_sec, raw_total = None, 0
        for rep in range(3):
            table = LakeTable(
                spark, os.path.join(tmp, f"tbl{rep}"), buckets=max(cpus, 16)
            )
            t0 = time.time()
            metrics = apply_batch(table, events, batch_id=1, cfg=EngineConfig())
            dt = time.time() - t0
            ingest_sec = dt if ingest_sec is None else min(ingest_sec, dt)
            raw_table = LakeTable(
                spark, os.path.join(tmp, f"rawtbl{rep}"), buckets=max(cpus, 16)
            )
            t0 = time.time()
            rm = apply_raw_batch(raw_table, raw, batch_id=1, cfg=EngineConfig())
            dt = time.time() - t0
            raw_sec = dt if raw_sec is None else min(raw_sec, dt)
            raw_total = rm["events"]
        timings["cdc_ingest_replay"] = round(ingest_sec, 3)
        timings["cdc_ingest_raw_decode"] = round(raw_sec, 3)
        total_events = metrics["events"]

        # incremental second batch (MERGE against existing table)
        inc_src = os.path.join(tmp, "binlog_inc")
        write_binlog(
            spark,
            inc_src,
            GeneratorParams(
                n_events=ingest_events // 10,
                n_convs=params.n_convs,
                dup_tail=0,
                seed=43,
                events_per_file=65536,
            ),
            n_files=max(cpus // 2, 8),
        )
        inc = spark.read.parquet(inc_src)
        inc.count()
        pre_inc_snapshot = table.snapshot()["snapshot_id"]
        t0 = time.time()
        apply_batch(table, inc, batch_id=2, cfg=EngineConfig())
        timings["cdc_ingest_incremental"] = round(time.time() - t0, 3)

        # changelog scan (consumption side): net I/U/D feed across the
        # incremental commit — bucket-location diff prunes the read
        chg_sec = None
        for _ in range(2):
            t0 = time.time()
            table.changes(pre_inc_snapshot).count()
            dt = time.time() - t0
            chg_sec = dt if chg_sec is None else min(chg_sec, dt)
        timings["cdc_changelog_scan"] = round(chg_sec, 3)

        # Debezium-JSON ingest: the public envelope most deployments
        # actually land (JSON-lines landing zone). Timed = from_json
        # parse (JVM, inside the scan; Catalyst prunes the parsed schema
        # per job) -> envelope -> identical apply path. Quarter-sized
        # input: JSON is ~5x wider per event than parquet, so this keeps
        # fixture size bounded while still compute-bound at 32 threads.
        from binlogsub_spark.sources.debezium import decode_debezium
        from binlogsub_spark.sources.generator import write_debezium_json

        dbz_src = os.path.join(tmp, "dbzlog")
        dbz_events = max(ingest_events // 4, 50_000)
        write_debezium_json(
            spark, dbz_src,
            GeneratorParams(
                n_events=dbz_events, n_convs=params.n_convs,
                dup_tail=dbz_events // 40, events_per_file=65536,
            ),
            n_files=max(cpus, 16),
        )
        dbz = spark.read.text(dbz_src)
        dbz.count()
        dbz_sec, dbz_total = None, 0
        for rep in range(2):
            dtable = LakeTable(
                spark, os.path.join(tmp, f"dbztbl{rep}"), buckets=max(cpus, 16)
            )
            t0 = time.time()
            dm = apply_batch(
                dtable, decode_debezium(dbz), batch_id=1, cfg=EngineConfig()
            )
            dt = time.time() - t0
            dbz_sec = dt if dbz_sec is None else min(dbz_sec, dt)
            dbz_total = dm["events"]
        timings["cdc_debezium_ingest"] = round(dbz_sec, 3)

    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # ---- operator suite on the driver tables ----
    suite = [
        "cdc_lww_latest_state",
        "cdc_turn_ordering_window",
        "cdc_schema_registry_join",
        "cdc_applied_skipped_metrics",
        "dedup_exact",
        "dedup_simhash",
        "similarity_ann_arrow_topk",
        "text_quality_score",
        "text_fingerprint",
        "multimodal_decode_features",
        "multimodal_audio_features",
        "transcript_assemble",
        "transcript_windows",
        "cdc_gtid_executed_set",
    ]
    qs = entry.queries()
    for name in suite:
        best = None
        for _ in range(2):  # best-of-2: first call pays plan compile +
            # python-worker warmup; the steady-state number is the one
            # that extrapolates (host-noise protocol, BENCH/BASELINE.md)
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # LSH dedup family, timed the way a 100 TB deployment runs it: the
    # operators return lazy plans (caller-owned materialization), and the
    # production caller materializes ONCE to reliable storage via
    # result_path — that end-to-end (shingle once, cached, verify, write,
    # re-read) is the timed unit.
    from pyspark.sql import functions as F

    from binlogsub_spark.functions.dedup import (
        incremental_minhash_pairs,
        minhash_band_store,
        minhash_lsh_pairs,
        write_minhash_band_store,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tmp2 = tempfile.mkdtemp(prefix="binlogsub_bench_ops_")
    try:
        best = None
        for i in range(2):
            t0 = time.time()
            minhash_lsh_pairs(
                docs, threshold=0.05,
                result_path=os.path.join(tmp2, f"lsh{i}"),
            ).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings["dedup_minhash_lsh"] = round(best, 3)

        # incremental dedup, SPLIT (VERDICT r4 #3): the corpus signature
        # store is built ONCE (bucketed+sorted by (band, bh) so every
        # later batch join is one-sided); the steady-state per-batch cost
        # — the number that matters at 100 TB — is the band join + verify
        # against the persisted store only.
        corpus = docs.where(F.col("doc_id") % 2 == 0)
        new = docs.where(F.col("doc_id") % 2 == 1)
        t0 = time.time()
        stored = write_minhash_band_store(
            minhash_band_store(corpus), "bench_band_store",
            buckets=max(cpus, 16), path=os.path.join(tmp2, "band_store"),
        )
        timings["dedup_incremental_store_build"] = round(time.time() - t0, 3)
        best = None
        for i in range(2):
            t0 = time.time()
            incremental_minhash_pairs(
                new, corpus, stored, threshold=0.05,
                result_path=os.path.join(tmp2, f"inc{i}"),
            ).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings["dedup_incremental"] = round(best, 3)
        spark.sql("DROP TABLE IF EXISTS bench_band_store")
    finally:
        shutil.rmtree(tmp2, ignore_errors=True)

    spark.stop()
    total = round(sum(timings.values()), 3)
    per_event_raw = raw_sec / raw_total
    per_event_structured = ingest_sec / total_events
    return {
        "metric": "cdc_ingest_and_operator_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
        "cpus": cpus,
        "ingest_events": total_events,
        "events_per_sec_applied": round(total_events / ingest_sec, 1),
        "raw_decode_events_per_sec": round(raw_total / raw_sec, 1),
        "raw_vs_structured_per_event": round(
            per_event_raw / per_event_structured, 3
        ),
        "debezium_ingest_events_per_sec": round(dbz_total / dbz_sec, 1),
        "mysql_row_decode_rows_per_sec": round(mysql_rows / mysql_sec, 1),
        "mysql_file_ingest_events_per_sec": round(n_file_rows / file_sec, 1),
        "mysql_file_ingest_rep_secs": file_reps,
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    result = run_bench(sf_dir, cpus)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
