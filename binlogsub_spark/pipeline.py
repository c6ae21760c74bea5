"""The end-to-end apply path: events -> scope filter -> flatten -> LWW -> MERGE.

Stage ordering deliberately mirrors the reference's manual predicate
pushdown: the (db, table) regex filter runs BEFORE any expensive work, just
as the reference skips row decode entirely for unmatched tables
(/root/reference/packet.cc:201-205). Catalyst cannot push filters through a
pandas UDF, so for the raw-payload path the cheap header columns
(file_seq/log_pos) come framed outside the payload and the scope filter on
decoded columns runs immediately after the Arrow decode — before shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from binlogsub_spark.config import EngineConfig
from binlogsub_spark.lake.table import LakeTable
from binlogsub_spark.operators.dedup import partial_lww_reduce
from binlogsub_spark.plans.envelope import OP_DELETE

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType()),
        T.StructField("file_seq", T.IntegerType()),
        T.StructField("max_log_pos", T.LongType()),
        T.StructField("events", T.LongType()),
        T.StructField("applied", T.LongType()),
        T.StructField("skipped", T.LongType()),
        T.StructField("replayed", T.BooleanType()),
        T.StructField("snapshot_id", T.LongType()),
    ]
)


def scope_filter(events: DataFrame, cfg: EngineConfig) -> DataFrame:
    """P2: regex table scoping (F7 rlike ≙ /root/reference/myregex.cc:31-47),
    placed before decode/flatten/shuffle."""
    return events.where(
        F.col("db_name").rlike(cfg.scope.db_regex)
        & F.col("table_name").rlike(cfg.scope.table_regex)
    )


def flatten_envelope(events: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Envelope -> upsert rows: user columns + version columns.

    For deletes the key comes from the before-image
    (/root/reference/event.cc:336-342: DELETE carries only the old image);
    tombstones keep null payload fields. P3 column projection by the
    configured ordinal->name map (/root/reference/row.cc:61-89) happens
    here — only configured columns survive into the sink.
    """
    is_del = F.col("op") == OP_DELETE
    img = F.when(is_del, F.col("before")).otherwise(F.col("after"))
    payload = [
        F.when(~is_del, img[c]).alias(c)
        for c in cfg.scope.column_names
        if c not in ("conv_id", "turn_idx", "ts")
    ]
    return events.select(
        img["conv_id"].alias("conv_id"),
        img["turn_idx"].alias("turn_idx"),
        *payload,
        img["ts"].alias("ts"),
        F.col("op").alias("_op"),
        img["ts"].alias("_ts"),
        F.col("file_seq").alias("_file_seq"),
        F.col("log_pos").alias("_log_pos"),
        F.col("schema_version"),
    )


def project_schema_epoch(upserts: DataFrame) -> DataFrame:
    """In-band schema evolution (T5): schema_version 1 predates the `tool`
    column, so v1 rows must not carry one even if the frame has the field.
    Mirrors the reference's table-map epoch semantics
    (/root/reference/packet.cc:141-148)."""
    if "tool" in upserts.columns:
        upserts = upserts.withColumn(
            "tool", F.when(F.col("schema_version") >= 2, F.col("tool"))
        )
    return upserts.drop("schema_version")


def prepare_upserts(events: DataFrame, cfg: EngineConfig) -> DataFrame:
    return project_schema_epoch(flatten_envelope(scope_filter(events, cfg), cfg))


def _plan_parses_json(df: DataFrame) -> bool:
    """True when the plan contains a ``from_json`` parse — the marker of an
    expensive computed source whose re-evaluation per job dominates (the
    JSON-lines landing zones). Detection reads the ANALYZED plan string
    (cheap: no optimization run); any failure means "not detectably
    expensive" rather than an error."""
    try:
        return "from_json" in df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False


def apply_batch(
    table: LakeTable,
    events: DataFrame,
    batch_id: int,
    cfg: EngineConfig | None = None,
    persist_source: bool = False,
    stage_timings: dict | None = None,
    audit=None,
) -> dict:
    """One micro-batch: returns metrics incl. applied/skipped accounting
    (T2-T4 — the reference checkpoints before each row,
    /root/reference/packet.cc:207-210; we commit offsets atomically WITH
    the merge by writing them into the same snapshot manifest).

    ``audit`` (write-audit-publish): a callable ``(table, staged_snapshot
    _id) -> bool``. When given, the merge STAGES its snapshot instead of
    publishing; the audit inspects the staged state (``table.read(
    snapshot_id=...)``, ``table.changes(...)``) while readers still see
    the prior snapshot. True -> the snapshot publishes atomically;
    False -> it is aborted (data + manifest deleted) and this raises
    ValueError so the stream's supervisor decides — a poisoned batch
    never becomes visible. The IBusiness-callback extension point
    (§2.8), moved to where a lake engine needs it: the commit gate.

    The per-file_seq lineage job reads ONLY (file_seq, log_pos, key) — for
    a columnar source that scan is column-pruned and nearly free — and the
    same aggregation collects the touched-bucket SET per file, so the merge
    runs as ONE job over the source (no winners persist, no distinct-buckets
    job: exactly one full scan of the batch, zero block-store traffic).
    ``persist_source=True`` is for callers whose input is an EXPENSIVE
    computed plan (e.g. an in-flight encode), where recomputing it even
    twice (pruned + full) would dominate.

    ``stage_timings`` (a mutable dict) receives wall seconds of the two
    jobs — ``lineage_sec`` (the pruned per-file aggregation + its driver
    collect barrier) and ``merge_sec`` (the one-pass MERGE write) — so
    scaling runs can attribute parallel-efficiency loss to a stage."""
    import time as _time

    cfg = cfg or EngineConfig()
    from pyspark import StorageLevel

    if not persist_source and _plan_parses_json(events):
        # a from_json source (Debezium/Canal/Maxwell landing zones) would
        # tokenize every line in BOTH jobs this function runs (the pruned
        # lineage aggregation + the merge); persisting the decoded events
        # makes the parse run exactly once (guide §4.4's duplication trap —
        # measured 3.96 s -> 3.24 s on a 2M-line Debezium batch, local[32])
        persist_source = True
    if persist_source:
        events.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        _t0 = _time.time()
        # per-file_seq offset frontier + counts (the per-partition lineage
        # of the north rule) — pruned projection, never the payload columns.
        # The same pass hashes the merge key to its COW bucket: the union of
        # per-file bucket sets is a superset of the buckets the merge will
        # touch (superset because scope filtering happens later), which lets
        # the merge skip its own distinct-buckets job entirely.
        from binlogsub_spark.lake.table import bucket_expr

        fresh = table.snapshot() is None
        if fresh:
            # first batch into an empty table: no current state to union,
            # so the touched set can ride the merge write's Observation —
            # the lineage aggregation drops the per-row bucket hash +
            # collect_set entirely (merge observe mode, lake/table.py)
            sel = ["file_seq", "log_pos"]
            aggs = [
                F.max("log_pos").alias("max_log_pos"),
                F.count("*").alias("events"),
            ]
        else:
            img_conv = F.when(
                F.col("op") == OP_DELETE, F.col("before.conv_id")
            ).otherwise(F.col("after.conv_id"))
            sel = [
                F.col("file_seq"),
                F.col("log_pos"),
                bucket_expr(img_conv, table.buckets).alias("_b"),
            ]
            aggs = [
                F.max("log_pos").alias("max_log_pos"),
                F.count("*").alias("events"),
                F.collect_set("_b").alias("buckets"),
            ]
        per_file = events.select(*sel).groupBy("file_seq").agg(*aggs).collect()
        total = sum(r["events"] for r in per_file)
        touched = (
            None if fresh else sorted({b for r in per_file for b in r["buckets"]})
        )
        watermark = None
        if per_file:
            top = max(per_file, key=lambda r: (r["file_seq"], r["max_log_pos"]))
            watermark = {"file_seq": top["file_seq"], "log_pos": top["max_log_pos"]}

        _t1 = _time.time()
        upserts = prepare_upserts(events, cfg)
        partials = partial_lww_reduce(upserts, salt=cfg.skew_salt)
        res = table.merge(
            partials,
            batch_id=batch_id,
            watermark=watermark,
            pre_reduced=True,
            touched_buckets=touched,
            observe_buckets=touched is None,
            publish=audit is None,
        )
        if audit is not None and not res["replayed"]:
            if audit(table, res["snapshot_id"]):
                table.publish_staged(res["snapshot_id"])
            else:
                table.abort_staged(res["snapshot_id"])
                raise ValueError(
                    f"audit rejected batch {batch_id} (staged snapshot "
                    f"{res['snapshot_id']} aborted; table state unchanged)"
                )
        if stage_timings is not None:
            stage_timings["lineage_sec"] = round(_t1 - _t0, 3)
            stage_timings["merge_sec"] = round(_time.time() - _t1, 3)
    finally:
        if persist_source:
            events.unpersist(blocking=False)
    applied = res["applied"]
    if (
        cfg.compact_every
        and not res["replayed"]
        and res["snapshot_id"] % cfg.compact_every == 0
    ):
        # bound the number of live commit dirs a read must union; commits
        # stay immutable, so this is safe mid-stream (new snapshot only)
        table.compact()
    metrics = {
        "batch_id": batch_id,
        "events": total,
        "applied": applied,
        "skipped": total - applied,  # scope-filtered + LWW losers + replays
        "replayed": res["replayed"],
        "snapshot_id": res["snapshot_id"],
    }

    table.append_lineage(
        [
            (
                batch_id,
                r["file_seq"],
                r["max_log_pos"],
                r["events"],
                applied,
                total - applied,
                res["replayed"],
                res["snapshot_id"],
            )
            for r in per_file
        ]
    )
    return metrics


def bootstrap_from_snapshot(
    table: LakeTable,
    snapshot_df: DataFrame,
    file_seq: int,
    log_pos: int,
    batch_id: int = -1,
    ts_col: str = "ts",
) -> dict:
    """Debezium-style initial snapshot load: bulk-MERGE a consistent table
    read taken at binlog position ``(file_seq, log_pos)``, then tail the
    stream from that position (T3 extended to the cold-start case — the
    reference can only start from the live head or replay everything,
    /root/reference/process.cc:178-183).

    Version stamping makes an at-least-once tail SAFE without any overlap
    bookkeeping: each snapshot row is stamped ``(_ts = its own ts column,
    _file_seq = cut, _log_pos = cut)``. A redelivered event at position
    <= cut has an LWW tuple strictly below its key's snapshot stamp (its
    effects are already IN the snapshot: the key's winner w at the cut has
    tuple_e <= tuple_w <= (ts_w, cut)), so it loses; a genuinely new event
    at position > cut beats the stamp exactly when it would have beaten w
    in a full replay (same ts ordering; positions > cut > pos_w). The final
    state is therefore identical to replaying the whole binlog — the
    invariant the driver query proves against the full-replay oracle.

    ``batch_id`` defaults to -1 so a subsequent stream whose checkpoint
    epochs start at 0 is not mistaken for a replay.

    ``snapshot_df``: user columns only (conv_id, turn_idx, payload..., ts)
    — the shape ``LakeTable.read()`` returns, i.e. you can bootstrap one
    table from another's read.
    """
    stamped = snapshot_df.select(
        "*",
        F.lit("U").alias("_op"),
        F.col(ts_col).alias("_ts"),
        F.lit(file_seq).cast("int").alias("_file_seq"),
        F.lit(log_pos).cast("long").alias("_log_pos"),
    )
    return table.merge(
        stamped,
        batch_id=batch_id,
        watermark={"file_seq": file_seq, "log_pos": log_pos},
        observe_buckets=table.snapshot() is None,
    )


def apply_batch_multi(
    tables: dict[str, LakeTable],
    events: DataFrame,
    batch_id: int,
    cfgs: EngineConfig | dict[str, EngineConfig] | None = None,
    persist_source: bool = True,
) -> dict:
    """Route one envelope micro-batch into N lake tables — the
    one-subscriber-many-tables production shape (the reference dispatches
    per-table inside its business callback, /root/reference/business.h;
    here each destination gets the full exactly-once MERGE path).

    ``tables`` maps ``table_name`` values to destinations. The batch is
    persisted ONCE (MEMORY_AND_DISK) and each destination's lineage+merge
    jobs run over the cached partitions — the source is scanned/decoded a
    single time no matter how many tables it fans out to. ``cfgs`` is a
    shared EngineConfig or a per-table dict; with ``cfgs=None`` each
    destination gets the default config with its table scope pinned to
    exactly its own name (db scope stays the default). The explicit
    ``table_name == name`` filter runs regardless, so even a broad shared
    scope cannot cross-route rows.
    """
    import re

    from pyspark import StorageLevel

    from binlogsub_spark.config import SchemaScope

    if persist_source:
        events.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        out = {}
        for name, table in tables.items():
            cfg = cfgs.get(name) if isinstance(cfgs, dict) else cfgs
            if cfg is None:
                cfg = EngineConfig(
                    scope=SchemaScope(table_regex=f"^{re.escape(name)}$")
                )
            sub = events.where(F.col("table_name") == name)
            out[name] = apply_batch(table, sub, batch_id, cfg)
    finally:
        if persist_source:
            events.unpersist(blocking=False)
    return out


def run_stream_multi(
    spark: SparkSession,
    source_path: str,
    tables: dict[str, LakeTable],
    checkpoint_dir: str,
    cfgs: EngineConfig | dict[str, EngineConfig] | None = None,
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    source_schema: T.StructType | None = None,
):
    """Structured Streaming fan-out: one envelope stream, N destination
    tables, a single shared checkpoint. Each micro-batch is routed with
    :func:`apply_batch_multi`; every destination's merge is idempotent on
    the shared streaming batch_id, so a kill/restart replay is a committed
    no-op on tables that already applied it — per-table exactly-once with
    one checkpoint."""
    if source_schema is None:
        source_schema = spark.read.parquet(source_path).schema
    reader = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch_multi(tables, batch_df, batch_id, cfgs)

    writer = reader.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream(
    spark: SparkSession,
    source_path: str,
    table: LakeTable,
    checkpoint_dir: str,
    cfg: EngineConfig | None = None,
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    source_schema: T.StructType | None = None,
    liveness=None,
    views: list | None = None,
    audit=None,
):
    """Structured Streaming over the binlog event table.

    File source + foreachBatch: Spark's checkpoint gives at-least-once batch
    replay after a kill (same epoch id re-fires); LakeTable.merge's batch_id
    high-water mark plus LWW makes the replay a committed no-op — the
    exactly-once-effective contract the reference lacks
    (/root/reference/process.cc:178-183 can silently skip to live head; we
    never lose events, we only skip duplicates and count them).

    ``liveness``: a :class:`~binlogsub_spark.liveness.LivenessConfig` (the
    monitor is auto-wired with a Hadoop-FS probe of ``source_path`` and a
    ``_heartbeats`` log next to the table) or a pre-built
    :class:`~binlogsub_spark.liveness.SourceLivenessMonitor` — the T7
    mysql_ping analog: empty batches past the idle interval probe the
    source; repeated probe failure fails the query so the supervisor
    restarts from checkpoint (see liveness.py).

    ``views``: :class:`~binlogsub_spark.operators.ivm.IncrementalView`
    instances over ``table``, refreshed after every applied micro-batch —
    continuously-maintained aggregates riding the same stream. Refresh is
    delta-driven (dirty groups only) and idempotent on the source snapshot
    id, so a checkpoint-replayed batch (merge no-op, snapshot unchanged)
    leaves the views untouched.

    ``audit``: write-audit-publish commit gate, forwarded to
    :func:`apply_batch` — every micro-batch stages, is audited, and only
    then publishes (see :mod:`binlogsub_spark.audits` for built-in
    guards). A rejected batch aborts its staged snapshot and fails the
    query; the supervisor restarts from checkpoint with the table
    unchanged.
    """
    cfg = cfg or EngineConfig()
    if source_schema is None:
        source_schema = spark.read.parquet(source_path).schema

    monitor = None
    if liveness is not None:
        from binlogsub_spark.liveness import (
            LivenessConfig,
            SourceLivenessMonitor,
            hadoop_fs_probe,
        )

        if isinstance(liveness, LivenessConfig):
            monitor = SourceLivenessMonitor(
                probe=lambda: hadoop_fs_probe(spark, source_path),
                cfg=liveness,
                heartbeat_dir=os.path.join(table.path, "_heartbeats"),
            )
        else:
            monitor = liveness

    reader = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        m = apply_batch(table, batch_df, batch_id, cfg, audit=audit)
        for v in views or ():
            v.refresh()
        if monitor is not None:
            monitor.on_batch(batch_id, m["events"])

    writer = reader.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_jsonlines(
    spark: SparkSession,
    source_path: str,
    table: LakeTable,
    checkpoint_dir: str,
    decoder,
    cfg: EngineConfig | None = None,
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    schema_version: int = 2,
    liveness=None,
):
    """Structured Streaming over a JSON-lines CDC landing zone (one
    connector value document per line — the file-sink shape of a
    connector->Kafka->files pipeline). ``decoder`` is any
    ``(df, value_col, schema_version) -> ENVELOPE_SCHEMA`` function
    (sources/debezium.py, sources/canal.py, sources/maxwell.py). Each
    micro-batch parses with ``from_json`` (JVM codegen, inside the scan
    stage) into the engine envelope and goes through the identical apply
    path, so exactly-once, schema evolution and LWW semantics are
    byte-identical to the native paths."""
    cfg = cfg or EngineConfig()

    monitor = None
    if liveness is not None:
        from binlogsub_spark.liveness import (
            LivenessConfig,
            SourceLivenessMonitor,
            hadoop_fs_probe,
        )

        if isinstance(liveness, LivenessConfig):
            monitor = SourceLivenessMonitor(
                probe=lambda: hadoop_fs_probe(spark, source_path),
                cfg=liveness,
                heartbeat_dir=os.path.join(table.path, "_heartbeats"),
            )
        else:
            monitor = liveness

    reader = (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(source_path)
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        envelope = decoder(
            batch_df, value_col="value", schema_version=schema_version
        )
        m = apply_batch(table, envelope, batch_id, cfg)
        if monitor is not None:
            monitor.on_batch(batch_id, m["events"])

    writer = reader.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_debezium(spark, source_path, table, checkpoint_dir, **kw):
    """Debezium-JSON landing zone -> lake table (see sources/debezium.py)."""
    from binlogsub_spark.sources.debezium import decode_debezium

    return run_stream_jsonlines(
        spark, source_path, table, checkpoint_dir, decode_debezium, **kw
    )


def run_stream_canal(
    spark, source_path, table, checkpoint_dir, framed: bool = True, **kw
):
    """Canal flatMessage landing zone -> lake table (see sources/canal.py).

    ``framed=True`` expects ``write_canal_json``'s
    ``file_seq\\tlog_pos\\tjson`` lines (the flat format carries no binlog
    position, so the zone carries the Kafka-offset analog out-of-band);
    ``framed=False`` consumes bare flatMessage lines, ordering on the
    message id."""
    from binlogsub_spark.sources.canal import decode_canal
    from binlogsub_spark.sources.generator import read_canal_lines

    def _decode(df, value_col="value", schema_version=2):
        framed_df = read_canal_lines(df) if framed else df
        return decode_canal(
            framed_df, value_col=value_col, schema_version=schema_version
        )

    return run_stream_jsonlines(
        spark, source_path, table, checkpoint_dir, _decode, **kw
    )


def run_stream_maxwell(spark, source_path, table, checkpoint_dir, **kw):
    """Maxwell-JSON landing zone -> lake table (see sources/maxwell.py)."""
    from binlogsub_spark.sources.maxwell import decode_maxwell

    return run_stream_jsonlines(
        spark, source_path, table, checkpoint_dir, decode_maxwell, **kw
    )


def flat_to_upserts(
    decoded: DataFrame, cfg: EngineConfig, pre_scoped: bool = False
) -> DataFrame:
    """Decoded flat change records (codec.DECODED_SCHEMA) -> upsert rows.

    The raw-path analog of flatten_envelope: scope filter FIRST (P2 before
    any shuffle — /root/reference/packet.cc:201-205), then version columns.
    ``pre_scoped=True`` skips the rlike filter — the decode kernel already
    dropped out-of-scope frames on their scope byte (``scope_codes``), so
    db_name/table_name need not even exist in ``decoded``."""
    scoped = (
        decoded
        if pre_scoped
        else decoded.where(
            F.col("db_name").rlike(cfg.scope.db_regex)
            & F.col("table_name").rlike(cfg.scope.table_regex)
        )
    )
    is_del = F.col("op") == OP_DELETE
    payload = [
        F.when(~is_del, F.col(c)).alias(c)
        for c in cfg.scope.column_names
        if c not in ("conv_id", "turn_idx", "ts")
    ]
    return project_schema_epoch(
        scoped.select(
            "conv_id",
            "turn_idx",
            *payload,
            F.col("ts"),
            F.col("op").alias("_op"),
            F.col("ts").alias("_ts"),
            F.col("file_seq").alias("_file_seq"),
            F.col("log_pos").alias("_log_pos"),
            F.col("schema_version"),
        )
    )


def apply_raw_batch(
    table: LakeTable,
    raw_events: DataFrame,
    batch_id: int,
    cfg: EngineConfig | None = None,
    persist_source: bool = False,
    dead_letter_path: str | None = None,
) -> dict:
    """Raw wire path: payload:binary -> Arrow decode -> scope filter ->
    salted partial LWW -> MERGE. The per-partition lineage stats come from
    the framed header columns (file_seq/log_pos), which the source carries
    OUTSIDE the payload — so the stats job reads a column-pruned
    projection and NEVER touches the payload bytes (round-2 persisted the
    full binary column through the block store just for this count,
    tripling per-event cost).

    Job structure (nothing is ever cached, no block-store traffic):
      1. per-file lineage = a PURE-JVM aggregation over the pruned
         (file_seq, log_pos) columns — no payload read, no Python;
      2. touched COW buckets = one header-only kernel pass that derives
         each frame's bucket IN-KERNEL (vectorized CRC32, the same hash
         ``bucket_expr`` compiles to JVM-side) and emits only per-batch
         DISTINCT bucket ids — at most ``table.buckets`` rows per Arrow
         batch cross into the JVM (the r4 shape shipped one (file_seq,
         log_pos, conv_id) row PER FRAME here and spent ~70% of the raw
         path's wall time on it);
      3. full decode (pruned to the scoped columns, scope filter in-kernel
         on the scope byte) -> salted partial LWW -> one-pass MERGE.
    ``persist_source=True`` restores caching for callers whose input is an
    expensive computed plan.

    ``dead_letter_path`` routes structurally corrupt frames to a
    reason-coded, batch_id-partitioned parquet sink (same idempotent
    dynamic-overwrite contract as the MySQL path) instead of letting the
    kernel's validity mask drop them silently; metrics then carry a
    ``dead_letter`` count."""
    from pyspark import StorageLevel

    from binlogsub_spark.codec import (
        DECODED_SCHEMA,
        decode_raw_events,
        raw_touched_buckets_df,
        scope_codes_for,
        split_deadletter,
    )

    cfg = cfg or EngineConfig()
    if persist_source:
        raw_events.persist(StorageLevel.MEMORY_AND_DISK)
    dead_count = None
    try:
        codes = scope_codes_for(cfg.scope.db_regex, cfg.scope.table_regex)
        per_file = (
            raw_events.select("file_seq", "log_pos")
            .groupBy("file_seq")
            .agg(
                F.max("log_pos").alias("max_log_pos"),
                F.count("*").alias("events"),
            )
            .collect()
        )
        total = sum(r["events"] for r in per_file)
        if table.snapshot() is None:
            # first batch into an empty table: the touched-bucket set is
            # only needed BEFORE the job to prune the current-state union,
            # and there is no current state — skip the bucket kernel pass
            # (a full payload scan) and let the merge observe the EXACT
            # set on its write job (one fewer pass over every payload byte)
            touched = None
        else:
            touched = sorted(
                r["bucket"]
                for r in raw_touched_buckets_df(
                    raw_events, table.buckets, scope_codes=codes
                )
                .distinct()
                .collect()
            )
        watermark = None
        if per_file:
            top = max(per_file, key=lambda r: (r["file_seq"], r["max_log_pos"]))
            watermark = {"file_seq": top["file_seq"], "log_pos": top["max_log_pos"]}

        decodable = {f.name for f in DECODED_SCHEMA.fields}
        need = [
            c
            for c in ["file_seq", "log_pos", "op", "schema_version", "ts"]
            + [c for c in cfg.scope.column_names if c != "ts"]
            if c in decodable
        ]
        decode_src, skip_invalid = raw_events, True
        if dead_letter_path is not None:
            from pyspark.sql import Observation

            valid, dead = split_deadletter(raw_events)
            obs = Observation()
            dead = dead.observe(obs, F.count(F.lit(1)).alias("n"))
            (
                dead.withColumn("batch_id", F.lit(batch_id))
                .write.partitionBy("batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(dead_letter_path)
            )
            dead_count = obs.get["n"]
            decode_src, skip_invalid = valid, False  # already verified
        decoded = decode_raw_events(
            decode_src, columns=need, scope_codes=codes, skip_invalid=skip_invalid
        )
        partials = partial_lww_reduce(
            flat_to_upserts(decoded, cfg, pre_scoped=True), salt=cfg.skew_salt
        )
        res = table.merge(
            partials,
            batch_id=batch_id,
            watermark=watermark,
            pre_reduced=True,
            touched_buckets=touched,
            observe_buckets=touched is None,
        )
    finally:
        if persist_source:
            raw_events.unpersist(blocking=False)
    applied = res["applied"]
    if (
        cfg.compact_every
        and not res["replayed"]
        and res["snapshot_id"] % cfg.compact_every == 0
    ):
        table.compact()
    table.append_lineage(
        [
            (batch_id, r["file_seq"], r["max_log_pos"], r["events"], applied,
             total - applied, res["replayed"], res["snapshot_id"])
            for r in per_file
        ]
    )
    metrics = {
        "batch_id": batch_id,
        "events": total,
        "applied": applied,
        "skipped": total - applied,
        "replayed": res["replayed"],
        "snapshot_id": res["snapshot_id"],
    }
    if dead_count is not None:
        metrics["dead_letter"] = dead_count
    return metrics


def run_stream_raw(
    spark: SparkSession,
    source_path: str,
    table: LakeTable,
    checkpoint_dir: str,
    cfg: EngineConfig | None = None,
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    dead_letter_path: str | None = None,
):
    """Structured Streaming over the BINARY wire table (payload:binary):
    the full reference-equivalent path — framing columns outside the
    payload, Arrow decode inside foreachBatch."""
    from binlogsub_spark.plans.envelope import RAW_SCHEMA

    cfg = cfg or EngineConfig()
    reader = (
        spark.readStream.schema(RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_raw_batch(
            table, batch_df, batch_id, cfg, dead_letter_path=dead_letter_path
        )

    writer = reader.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# -------------------------------------------------- genuine MySQL frames --
def scope_registry(registry: dict, cfg: EngineConfig) -> dict:
    """P2 pushdown for the MySQL path: drop out-of-scope tables from the
    broadcast registry — rows-events for unmapped table_ids are then
    skipped inside the decode kernel before any value parse (the exact
    analog of the reference skipping row decode for unmatched tables,
    /root/reference/packet.cc:201-205)."""
    import re

    db_re, tbl_re = re.compile(cfg.scope.db_regex), re.compile(cfg.scope.table_regex)
    return {
        tid: tm
        for tid, tm in registry.items()
        if db_re.search(tm.db) and tbl_re.search(tm.table)
    }


def override_columns_by_table(registry: dict, mapping: dict) -> dict:
    """Ordinal->name projection for parsed registries (a TABLE_MAP carries
    no column names, /root/reference/row.cc:61-89): map (db, table) -> one
    or MORE candidate named layouts (a table ALTERed mid-stream appears
    under several table_ids with different widths — each epoch needs its
    own names). The candidate whose length and type codes match the parsed
    layout wins; no match leaves the parsed col0..colN names."""
    out = {}
    for tid, tm in registry.items():
        cands = mapping.get((tm.db, tm.table))
        if not cands:
            continue
        if cands and not isinstance(cands[0], (list, tuple)):
            cands = [cands]  # single layout
        for cols in cands:
            if len(cols) == len(tm.columns) and all(
                c.ctype == p.ctype for c, p in zip(cols, tm.columns)
            ):
                out[tid] = list(cols)
                break
    return out


def mysql_decoded_to_upserts(decoded: DataFrame, cfg: EngineConfig) -> DataFrame:
    """decode_mysql_events output -> upsert rows (version columns from the
    frame positions; delete payloads nulled — the key comes from the
    delete's before image, which IS the decoded image for op='D').

    Configured columns absent from the decode (a batch whose only tables
    were out of scope / undecodable has NO user columns at all) backfill
    as typed NULLs so the merge still commits — advancing the watermark
    over a content-free batch instead of crashing on resolution. Present
    payload columns keep their NATIVE decoded type (a numeric/decimal/
    timestamp payload column must not silently become string); only the
    backfill NULLs need an explicit type. Backfilled columns carry a
    ``null_backfill`` field-metadata marker so the sink's schema union
    knows the (arbitrary) backfill type is NOT a claim about the column's
    real type — a genuine int-data-for-string-column conflict still
    raises, while an all-NULL epoch backfill casts to the table's type."""
    have = set(decoded.columns)
    BACKFILL_META = {"null_backfill": True}

    def _c(name: str, cast: str):
        # cast ONLY the backfill branch: F.lit(None) is untyped and needs
        # one; a decoded column already carries its correct type
        return F.col(name) if name in have else F.lit(None).cast(cast)

    def _a(expr, name: str):
        # mark backfilled columns so _union_schema treats their type as
        # a placeholder, never a conflict
        return (
            expr.alias(name)
            if name in have
            else expr.alias(name, metadata=BACKFILL_META)
        )

    is_del = F.col("op") == OP_DELETE
    payload = [
        _a(F.when(~is_del, _c(c, "string")), c)
        for c in cfg.scope.column_names
        if c not in ("conv_id", "turn_idx", "ts")
    ]
    if "gtid" in have:  # optional transaction lineage column
        payload.append(F.col("gtid"))
    return decoded.select(
        _a(_c("conv_id", "string"), "conv_id"),
        _a(_c("turn_idx", "int"), "turn_idx"),
        *payload,
        _a(_c("ts", "timestamp"), "ts"),
        F.col("op").alias("_op"),
        _a(_c("ts", "timestamp"), "_ts"),
        F.col("file_seq").alias("_file_seq"),
        F.col("log_pos").alias("_log_pos"),
    )


def apply_mysql_batch(
    table: LakeTable,
    raw_frames: DataFrame,
    batch_id: int,
    cfg: EngineConfig | None = None,
    registry: dict | None = None,
    name_map: dict | None = None,
    checksum: bool = True,
    registry_cache: dict | None = None,
    dead_letter_path: str | None = None,
    persist_source: bool = False,
    gtid_lineage: bool = False,
    skip_gtids=None,
    track_gtid_set: bool = False,
    gtid_cache: dict | None = None,
    atomic_commits: bool = False,
    stash_path: str | None = None,
) -> dict:
    """One micro-batch of GENUINE MySQL binlog frames: registry extract (or
    reuse a pre-extracted one — cheaper per batch) -> scope filter at the
    registry level -> broadcast -> vectorized wave decode -> salted LWW ->
    COW MERGE. Frame counts in lineage include control events (table maps
    etc.), matching how binlog positions advance over them.

    ``registry_cache`` (a mutable dict) persists table maps ACROSS
    micro-batches — the reference's table-map cache (packet.cc:194-200):
    a batch that lost its TABLE_MAP frames to a restart still decodes,
    and genuinely-unknown table_ids become detectable instead of
    silently dropped. ``dead_letter_path`` routes structurally corrupt
    AND semantically undecodable frames (unknown table_id, width
    mismatch, unsupported type) to a reason-coded parquet sink before
    decode; metrics then carry a ``dead_letter`` count.

    ``atomic_commits=True`` enforces TRANSACTION-atomic visibility: frames
    past the last XID_EVENT of their binlog file (a transaction the batch
    boundary cut in half) are split off before the merge and stashed under
    ``stash_path`` (hive-partitioned by batch_id); the next batch unions
    its predecessor's stash back in, where the commit marker lands. The
    stash write is deterministic and dynamically overwritten per batch_id,
    so a checkpoint-replayed batch rewrites its own stash byte-identically
    — exactly-once AND never-half-a-transaction. The watermark and lineage
    derive from the committed side only (deferred rows-frames do not
    advance them; recovery is checkpoint-replay + stash, never a
    watermark seek past unapplied frames).

    GTID auto-positioning: ``skip_gtids`` (a GtidSet or its text form)
    drops decoded rows whose transaction is already in the executed set
    — the source-side resume dedup of a GTID auto-position dump, done as
    a broadcast interval anti-join (the raw watermark still advances
    over skipped frames, matching how a server-side skip advances the
    position). ``track_gtid_set=True`` adds ``gtid_executed`` (canonical
    GTID-set text of THIS batch's transactions) to the returned metrics
    so the caller can maintain the cumulative frontier.

    ``gtid_cache`` (a mutable {file_seq: (log_pos, gtid)} dict) carries
    the LAST GTID seen per binlog file ACROSS micro-batches — the GTID
    analog of ``registry_cache``, and of the reference's mutable
    per-connection position state (packet.cc:56-68): a batch boundary
    that cuts between a GTID_LOG_EVENT and its transaction's rows-events
    would otherwise leave the next batch's leading rows with a NULL
    gtid (un-taggable, un-skippable); the cached frontier seeds the
    as-of assignment instead."""
    from pyspark import StorageLevel

    from binlogsub_spark.mysql_binlog import (
        decode_mysql_events,
        extract_table_maps,
        split_deadletter_mysql,
    )

    cfg = cfg or EngineConfig()
    n_deferred = None
    if atomic_commits:
        from binlogsub_spark.mysql_binlog import split_uncommitted
        from binlogsub_spark.plans.envelope import RAW_SCHEMA

        spark = raw_frames.sparkSession
        if stash_path is not None:
            prev_dir = os.path.join(stash_path, f"batch_id={batch_id - 1}")
            if os.path.isdir(prev_dir):
                raw_frames = (
                    spark.read.schema(RAW_SCHEMA)
                    .parquet(prev_dir)
                    .unionByName(raw_frames)
                )
        committed, deferred = split_uncommitted(raw_frames, checksum=checksum)
        if stash_path is not None:
            from pyspark.sql import Observation

            obs_d = Observation()
            (
                deferred.observe(obs_d, F.count(F.lit(1)).alias("n"))
                .withColumn("batch_id", F.lit(batch_id))
                .write.partitionBy("batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(stash_path)
            )
            n_deferred = obs_d.get["n"]
        raw_frames = committed
    if persist_source:
        raw_frames.persist(StorageLevel.MEMORY_AND_DISK)
    dead_count = None
    try:
        per_file = (
            raw_frames.select("file_seq", "log_pos")
            .groupBy("file_seq")
            .agg(F.max("log_pos").alias("max_log_pos"), F.count("*").alias("events"))
            .collect()
        )
        total = sum(r["events"] for r in per_file)
        watermark = None
        if per_file:
            top = max(per_file, key=lambda r: (r["file_seq"], r["max_log_pos"]))
            watermark = {"file_seq": top["file_seq"], "log_pos": top["max_log_pos"]}

        if registry is None:
            registry = extract_table_maps(raw_frames, checksum=checksum)
            if registry_cache is not None:
                registry_cache.update(registry)
                registry = dict(registry_cache)
        known_ids = set(registry)
        registry = scope_registry(registry, cfg)
        overrides = (
            override_columns_by_table(registry, name_map) if name_map else None
        )
        decode_src, skip_invalid = raw_frames, True
        if dead_letter_path is not None:
            from pyspark.sql import Observation

            valid, dead = split_deadletter_mysql(
                raw_frames, checksum=checksum,
                registry=registry, known_table_ids=known_ids,
            )
            obs = Observation()
            dead = dead.observe(obs, F.count(F.lit(1)).alias("n"))
            # idempotent dead-letter sink: partition by batch_id and
            # dynamically overwrite ONLY this batch's partition, so a
            # replayed micro-batch rewrites its own rows instead of
            # appending duplicates (the merge is checkpoint-idempotent;
            # the dead-letter side must be too)
            (
                dead.withColumn("batch_id", F.lit(batch_id))
                .write.partitionBy("batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(dead_letter_path)
            )
            dead_count = obs.get["n"]
            decode_src, skip_invalid = valid, False  # already fully verified
        decoded = decode_mysql_events(
            decode_src, registry, column_overrides=overrides, checksum=checksum,
            skip_invalid=skip_invalid, known_table_ids=known_ids,
        )
        gtid_exec_str = None
        if (
            gtid_lineage
            or skip_gtids is not None
            or track_gtid_set
            or gtid_cache is not None
        ):
            from binlogsub_spark.mysql_binlog import assign_gtids, extract_gtids

            gtids_df = extract_gtids(raw_frames, checksum=checksum)
            assign_src = gtids_df
            if gtid_cache:
                # seed with the per-file GTID frontier of earlier batches:
                # rows before this batch's first GTID frame belong to the
                # previous batch's last (open) transaction
                seed = raw_frames.sparkSession.createDataFrame(
                    [(fs, lp, g) for fs, (lp, g) in gtid_cache.items()],
                    "file_seq int, log_pos long, gtid string",
                )
                assign_src = gtids_df.unionByName(seed)
            if gtid_lineage or skip_gtids is not None:
                # tag each decoded row with its transaction's GTID (the
                # last GTID event at-or-before it) — the "GTID+log-position
                # ordering" of the north rule carried into the lake as
                # lineage (and the key the resume filter drops on)
                decoded = assign_gtids(decoded, assign_src)
            if gtid_cache is not None:
                # advance the cached frontier (bounded: one row per binlog
                # file in the batch, same cost class as the lineage agg)
                for r in (
                    gtids_df.groupBy("file_seq")
                    .agg(
                        F.max_by("gtid", "log_pos").alias("g"),
                        F.max("log_pos").alias("lp"),
                    )
                    .collect()
                ):
                    prev = gtid_cache.get(int(r["file_seq"]))
                    if prev is None or r["lp"] > prev[0]:
                        gtid_cache[int(r["file_seq"])] = (int(r["lp"]), r["g"])
            if skip_gtids is not None:
                from binlogsub_spark.operators.gtid import filter_executed_gtids

                decoded = filter_executed_gtids(decoded, skip_gtids)
                if not gtid_lineage:
                    decoded = decoded.drop("gtid")
            if track_gtid_set:
                from binlogsub_spark.operators.gtid import (
                    collect_gtid_set,
                    format_gtid_set,
                    gtid_executed_intervals,
                    split_gtid,
                )

                gtid_exec_str = format_gtid_set(
                    collect_gtid_set(
                        gtid_executed_intervals(
                            gtids_df.select(*split_gtid(F.col("gtid")))
                        )
                    )
                )
        partials = partial_lww_reduce(
            mysql_decoded_to_upserts(decoded, cfg), salt=cfg.skew_salt
        )
        res = table.merge(
            partials, batch_id=batch_id, watermark=watermark, pre_reduced=True,
            # fresh table: one-job merge with the touched set observed on
            # the write — skips the winners persist + distinct-buckets job
            observe_buckets=table.snapshot() is None,
        )
    finally:
        if persist_source:
            raw_frames.unpersist(blocking=False)
    applied = res["applied"]
    if (
        cfg.compact_every
        and not res["replayed"]
        and res["snapshot_id"] % cfg.compact_every == 0
    ):
        table.compact()
    table.append_lineage(
        [
            (batch_id, r["file_seq"], r["max_log_pos"], r["events"], applied,
             total - applied, res["replayed"], res["snapshot_id"])
            for r in per_file
        ]
    )
    metrics = {
        "batch_id": batch_id,
        "events": total,
        "applied": applied,
        "skipped": total - applied,
        "replayed": res["replayed"],
        "snapshot_id": res["snapshot_id"],
    }
    if dead_count is not None:
        metrics["dead_letter"] = dead_count
    if gtid_exec_str is not None:
        metrics["gtid_executed"] = gtid_exec_str
    if n_deferred is not None:
        metrics["deferred"] = n_deferred
        # stash partitions <= batch_id-2 can never be read again (batch N
        # only ever unions partition N-1); drop them driver-side AFTER the
        # merge committed so a replay window never loses its input
        if stash_path is not None and os.path.isdir(stash_path):
            import shutil

            for d in os.listdir(stash_path):
                if d.startswith("batch_id="):
                    try:
                        if int(d.split("=", 1)[1]) <= batch_id - 2:
                            shutil.rmtree(os.path.join(stash_path, d))
                    except ValueError:
                        pass
    return metrics


def run_stream_mysql(
    spark: SparkSession,
    source_path: str,
    table: LakeTable,
    checkpoint_dir: str,
    cfg: EngineConfig | None = None,
    name_map: dict | None = None,
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    checksum: bool = True,
    dead_letter_path: str | None = None,
    gtid_lineage: bool = False,
    gtid_auto_position: bool = False,
    atomic_commits: bool = False,
):
    """Structured Streaming over a table of genuine MySQL binlog frames —
    the FULL reference-equivalent path, end to end. The table-map registry
    is CACHED across micro-batches and persisted next to the checkpoint
    (table_maps.json, atomic rename), so a batch whose TABLE_MAP frames
    arrived earlier — or before a kill/restart — still decodes; the
    reference keeps the same cache in memory keyed off its Redis position
    (packet.cc:194-200).

    ``gtid_auto_position=True`` maintains the executed GTID set as a
    second, failover-portable frontier: each batch's transaction ids are
    compressed to intervals and unioned into
    ``<checkpoint>/gtid_executed.txt`` (atomic rename, idempotent on
    checkpoint replay), and transactions already in the set AT STREAM
    START are dropped before the merge — so a table restored onto a new
    source (different binlog file numbering, same GTIDs) resumes without
    double-applying, which a (file, position) watermark cannot express."""
    import os
    import tempfile

    from binlogsub_spark.mysql_binlog import registry_from_json, registry_to_json
    from binlogsub_spark.plans.envelope import RAW_SCHEMA

    cfg = cfg or EngineConfig()
    reader = (
        spark.readStream.schema(RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    maps_path = os.path.join(checkpoint_dir, "table_maps.json")
    registry_cache: dict = {}
    if os.path.exists(maps_path):
        with open(maps_path) as f:
            registry_cache.update(registry_from_json(f.read()))

    gtid_path = os.path.join(checkpoint_dir, "gtid_executed.txt")
    gtid_pos_path = os.path.join(checkpoint_dir, "gtid_positions.json")
    skip_gtids = None
    executed_acc: dict = {}
    gtid_cache: dict | None = None
    if gtid_auto_position or gtid_lineage:
        # per-file GTID frontier: lets a batch cut between a GTID frame
        # and its rows-events (or a restart) still tag the leading rows
        gtid_cache = {}
        if os.path.exists(gtid_pos_path):
            import json as _json

            with open(gtid_pos_path) as f:
                gtid_cache.update(
                    {int(k): tuple(v) for k, v in _json.load(f).items()}
                )
    if gtid_auto_position:
        from binlogsub_spark.operators.gtid import parse_gtid_set

        if os.path.exists(gtid_path):
            with open(gtid_path) as f:
                executed_acc = parse_gtid_set(f.read())
        if executed_acc:
            skip_gtids = executed_acc

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal executed_acc
        m = apply_mysql_batch(
            table, batch_df, batch_id, cfg, name_map=name_map, checksum=checksum,
            registry_cache=registry_cache, dead_letter_path=dead_letter_path,
            gtid_lineage=gtid_lineage,
            skip_gtids=skip_gtids,
            track_gtid_set=gtid_auto_position,
            gtid_cache=gtid_cache,
            atomic_commits=atomic_commits,
            stash_path=(
                os.path.join(checkpoint_dir, "txn_stash")
                if atomic_commits
                else None
            ),
        )
        os.makedirs(checkpoint_dir, exist_ok=True)
        if gtid_auto_position and m.get("gtid_executed"):
            from binlogsub_spark.operators.gtid import (
                format_gtid_set,
                gtid_set_union,
                parse_gtid_set,
            )

            executed_acc = gtid_set_union(
                executed_acc, parse_gtid_set(m["gtid_executed"])
            )
            fd, tmp = tempfile.mkstemp(dir=checkpoint_dir, suffix=".gtids")
            with os.fdopen(fd, "w") as f:
                f.write(format_gtid_set(executed_acc))
            os.replace(tmp, gtid_path)  # atomic + idempotent (set union)
        if gtid_cache:
            import json as _json

            fd, tmp = tempfile.mkstemp(dir=checkpoint_dir, suffix=".gpos")
            with os.fdopen(fd, "w") as f:
                f.write(_json.dumps({str(k): list(v) for k, v in gtid_cache.items()}))
            os.replace(tmp, gtid_pos_path)
        fd, tmp = tempfile.mkstemp(dir=checkpoint_dir, suffix=".maps")
        with os.fdopen(fd, "w") as f:
            f.write(registry_to_json(registry_cache))
        os.replace(tmp, maps_path)  # atomic: readers never see a torn file

    writer = reader.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
