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

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from binlogsub_spark.config import EngineConfig
from binlogsub_spark.lake.table import LakeTable
from binlogsub_spark.operators.dedup import lww_reduce
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


def apply_batch(
    table: LakeTable,
    events: DataFrame,
    batch_id: int,
    cfg: EngineConfig | None = None,
) -> dict:
    """One micro-batch: returns metrics incl. applied/skipped accounting
    (T2-T4 — the reference checkpoints before each row,
    /root/reference/packet.cc:207-210; we commit offsets atomically WITH
    the merge by writing them into the same snapshot manifest)."""
    cfg = cfg or EngineConfig()
    events = events.persist()
    try:
        total = events.count()
        upserts = prepare_upserts(events, cfg)
        winners = lww_reduce(upserts, salt=cfg.skew_salt)

        wm_row = events.agg(
            F.max_by(F.struct("file_seq", "log_pos"), F.struct("file_seq", "log_pos")).alias("w")
        ).collect()[0]["w"]
        watermark = (
            {"file_seq": wm_row["file_seq"], "log_pos": wm_row["log_pos"]}
            if wm_row
            else None
        )

        res = table.merge(winners, batch_id=batch_id, watermark=watermark, pre_reduced=True)
        applied = res["applied"]
        metrics = {
            "batch_id": batch_id,
            "events": total,
            "applied": applied,
            "skipped": total - applied,  # scope-filtered + LWW losers + replays
            "replayed": res["replayed"],
            "snapshot_id": res["snapshot_id"],
        }

        per_file = (
            events.groupBy("file_seq")
            .agg(F.max("log_pos").alias("max_log_pos"), F.count("*").alias("events"))
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .withColumn("applied", F.lit(applied).cast("long"))
            .withColumn("skipped", F.lit(total - applied).cast("long"))
            .withColumn("replayed", F.lit(res["replayed"]))
            .withColumn("snapshot_id", F.lit(res["snapshot_id"]).cast("long"))
            .select([f.name for f in LINEAGE_SCHEMA.fields])
        )
        table.append_lineage(per_file)
        return metrics
    finally:
        events.unpersist()


def run_stream(
    spark: SparkSession,
    source_path: str,
    table: LakeTable,
    checkpoint_dir: str,
    cfg: EngineConfig | None = None,
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    source_schema: T.StructType | None = None,
):
    """Structured Streaming over the binlog event table.

    File source + foreachBatch: Spark's checkpoint gives at-least-once batch
    replay after a kill (same epoch id re-fires); LakeTable.merge's batch_id
    high-water mark plus LWW makes the replay a committed no-op — the
    exactly-once-effective contract the reference lacks
    (/root/reference/process.cc:178-183 can silently skip to live head; we
    never lose events, we only skip duplicates and count them).
    """
    cfg = cfg or EngineConfig()
    if source_schema is None:
        source_schema = spark.read.parquet(source_path).schema

    reader = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch(table, batch_df, batch_id, cfg)

    writer = reader.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
