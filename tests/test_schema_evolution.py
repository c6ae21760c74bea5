"""Schema evolution: the `tool` column appears mid-stream; the sink does
schema-union + null-backfill (SURVEY.md §5 test #4; reference epoch flush
/root/reference/packet.cc:141-148)."""

from __future__ import annotations

from pyspark.sql import functions as F

from binlogsub_spark.lake.table import LakeTable
from binlogsub_spark.pipeline import apply_batch, prepare_upserts
from binlogsub_spark.config import EngineConfig
from binlogsub_spark.sources.generator import GeneratorParams, generate_binlog


def test_v1_rows_never_carry_tool(spark, tmp_path):
    ev = generate_binlog(spark, GeneratorParams(n_events=4000, dup_tail=0))
    table = LakeTable(spark, str(tmp_path / "tbl"), buckets=8)
    apply_batch(table, ev, batch_id=1)
    final = table.read()
    # post-evolution tool-role rows carry a populated tool column
    assert final.where((F.col("role") == "tool") & F.col("tool").isNotNull()).count() > 0


def test_schema_epoch_projection_nulls_pre_evolution_tool(spark):
    """Even if a v1-epoch frame physically carries a tool field, the epoch
    projection must null it (the column did not exist in that table-map
    epoch — /root/reference/packet.cc:141-148 semantics)."""
    from binlogsub_spark.pipeline import project_schema_epoch

    df = spark.createDataFrame(
        [("c", 0, "tool_9", 1), ("c", 1, "tool_9", 2)],
        "conv_id string, turn_idx int, tool string, schema_version int",
    )
    out = {r["turn_idx"]: r["tool"] for r in project_schema_epoch(df).collect()}
    assert out[0] is None and out[1] == "tool_9"


def test_table_schema_union_backfill(spark, tmp_path):
    """Commit a v1-era batch whose frame does not even HAVE the tool column,
    then a v2 batch that does: table schema unions, old rows read as null."""
    ev = generate_binlog(spark, GeneratorParams(n_events=4000, dup_tail=0)).cache()
    evo_point = int(4000 * 0.6)
    v1 = ev.where(F.col("delivery_seq") < evo_point)
    v2 = ev.where(F.col("delivery_seq") >= evo_point)

    table = LakeTable(spark, str(tmp_path / "tbl"), buckets=8)
    u1 = prepare_upserts(v1, EngineConfig()).drop("tool")  # pre-evolution wire frame
    table.merge(u1, batch_id=1)
    assert "tool" not in [f["name"] for f in
                          __import__("json").loads(table.snapshot()["schema_json"])["fields"]]

    u2 = prepare_upserts(v2, EngineConfig())
    table.merge(u2, batch_id=2)
    cols = table.read().columns
    assert "tool" in cols  # schema-union happened

    # rows untouched since batch 1 read back with tool null-backfilled
    final = table.read()
    assert final.where(F.col("tool").isNull()).count() > 0
    assert final.where(F.col("tool").isNotNull()).count() > 0
    ev.unpersist()
