"""spark-submit entry point: tail a binlog event table into a LakeTable.

Usage (the deployment shape the north rule asks for — on a cluster this is
``spark-submit --py-files binlogsub_spark.zip -m binlogsub_spark.run …``;
locally plain ``python -m binlogsub_spark.run``):

    python -m binlogsub_spark.run \
        --source /path/to/binlog_parquet \
        --table  /path/to/lake_table \
        --checkpoint /path/to/ckpt \
        [--generate N]        # first synthesize a binlog of N events at --source
        [--buckets 32] [--max-files-per-trigger 4] [--master local[32]]

Prints one JSON line of final metrics (rows, snapshots, applied/skipped).
"""

from __future__ import annotations

import argparse
import json
import sys

from binlogsub_spark.config import EngineConfig
from binlogsub_spark.lake.table import LakeTable
from binlogsub_spark.pipeline import run_stream
from binlogsub_spark.session import get_spark
from binlogsub_spark.sources.generator import GeneratorParams, write_binlog


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--generate", type=int, default=0)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--max-files-per-trigger", type=int, default=4)
    ap.add_argument("--master", default=None)
    ap.add_argument("--timeout-sec", type=int, default=3600)
    ap.add_argument(
        "--raw", action="store_true",
        help="binary wire mode: source rows are (file_seq, log_pos, "
        "payload:binary); decode runs as an Arrow kernel inside each batch",
    )
    ap.add_argument(
        "--mysql", action="store_true",
        help="genuine MySQL binlog-frame mode: source rows are (file_seq, "
        "log_pos, payload) where payload is a full binlog event frame "
        "(19-byte header, TABLE_MAP control frames, rows events v2, CRC32)",
    )
    ap.add_argument("--merge-strategy", choices=["jvm", "arrow_local"], default="jvm")
    ap.add_argument(
        "--gtid", action="store_true",
        help="mysql mode: tag applied rows with their transaction GTID "
             "(as-of assignment from GTID_LOG_EVENT frames)",
    )
    ap.add_argument(
        "--dead-letter", default=None,
        help="mysql mode: parquet path for reason-coded undecodable frames",
    )
    args = ap.parse_args(argv)

    spark = get_spark(app_name="binlogsub-ingest", master=args.master)
    if args.generate:
        params = GeneratorParams(n_events=args.generate)
        if args.mysql:
            from binlogsub_spark.sources.generator import write_mysql_binlog

            write_mysql_binlog(spark, args.source, params, n_files=16)
        elif args.raw:
            from binlogsub_spark.sources.generator import write_raw_binlog

            write_raw_binlog(spark, args.source, params, n_files=16)
        else:
            write_binlog(spark, args.source, params, n_files=16)

    table = LakeTable(
        spark, args.table, buckets=args.buckets, merge_strategy=args.merge_strategy
    )
    extra_kw = {}
    runner = run_stream
    if args.mysql:
        from binlogsub_spark.pipeline import run_stream_mysql as runner
        from binlogsub_spark.sources.generator import transcripts_table_maps

        name_map: dict = {}
        for tm in transcripts_table_maps().values():
            name_map.setdefault((tm.db, tm.table), []).append(tm.columns)
        extra_kw["name_map"] = name_map
        if args.gtid:
            extra_kw["gtid_lineage"] = True
        if args.dead_letter:
            extra_kw["dead_letter_path"] = args.dead_letter
    elif args.raw:
        from binlogsub_spark.pipeline import run_stream_raw as runner
    q = runner(
        spark,
        args.source,
        table,
        args.checkpoint,
        cfg=EngineConfig(table_buckets=args.buckets),
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=True,
        **extra_kw,
    )
    q.awaitTermination(args.timeout_sec)

    snap = table.snapshot() or {}
    lineage = table.lineage().toPandas() if snap else None
    out = {
        "rows": table.read().count() if snap else 0,
        "snapshot_id": snap.get("snapshot_id"),
        "batch_id": snap.get("batch_id"),
        "watermark": snap.get("watermark"),
        "events_seen": int(lineage["events"].sum()) if lineage is not None else 0,
        "batches": int(lineage["batch_id"].nunique()) if lineage is not None else 0,
    }
    print(json.dumps(out, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
