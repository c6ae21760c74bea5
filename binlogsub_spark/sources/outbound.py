"""Outbound CDC: a lake-table changelog re-encoded as a connector feed.

`LakeTable.changes(..., include_before=True)` yields the net I/U/D delta
between two snapshots; these wrappers turn it into the three wire
dialects this engine can also ingest (Debezium value documents, Canal
flatMessages, Maxwell records), so a downstream consumer subscribes to
THIS engine's tables exactly the way it would subscribe to a MySQL
primary — whatever bus dialect it already speaks. The reference is
ingest-only (in-process ``IBusiness`` callbacks,
/root/reference/business.h); at 100 TB the changelog is the product.

All three are pure column expressions over the changelog plan: the
bucket-pruned ``changes()`` scan stays the only data movement and the
encode rides the same whole-stage-codegen stage, no shuffle added. The
driver queries prove decode(encode(changes)) MERGE-replays to the
identical table for each dialect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def changes_to_envelope(
    changes_df: DataFrame,
    db_name: str = "test",
    table_name: str = "transcripts",
) -> DataFrame:
    """Changelog rows -> the engine's CDC envelope (the common input of
    every ``envelope_to_*_json`` encoder).

    Mapping: ``change_op`` I/U/D keeps its letter; before images come
    from the ``_before_*`` columns (I: null; D: the emitted payload,
    which already is the before state); ``file_seq``/``log_pos``/
    ``server_ts`` come from the winning version's ``(_file_seq,
    _log_pos, _ts)``, so positions survive a full out-and-back trip and
    LWW ordering is preserved. The D image's ts is the DELETE's version
    stamp, not the removed row's ts: image ts IS the LWW version in this
    engine, so an out-of-order delete that originally won on ts must
    re-win on ts when the feed is replayed."""
    after_img = F.when(
        F.col("change_op") != "D",
        F.struct(*[F.col(c).alias(c) for c in _PAYLOAD]),
    )
    before_img = F.when(
        F.col("change_op") == "D",
        F.struct(
            *[F.col(c).alias(c) for c in _PAYLOAD[:-1]],
            F.col("_ts").alias("ts"),
        ),
    ).when(
        F.col("change_op") == "U",
        F.struct(
            F.col("conv_id").alias("conv_id"),
            F.col("turn_idx").alias("turn_idx"),
            *[F.col(f"_before_{c}").alias(c) for c in _PAYLOAD[2:]],
        ),
    )
    return changes_df.select(
        F.col("_file_seq").alias("file_seq"),
        F.col("_log_pos").alias("log_pos"),
        F.col("_ts").alias("server_ts"),
        F.col("change_op").alias("op"),
        F.lit(db_name).alias("db_name"),
        F.lit(table_name).alias("table_name"),
        F.lit(2).cast("int").alias("schema_version"),
        before_img.alias("before"),
        after_img.alias("after"),
    )


def changes_to_canal(
    changes_df: DataFrame,
    db_name: str = "test",
    table_name: str = "transcripts",
) -> DataFrame:
    """Changelog -> Canal flatMessage feed (file_seq/log_pos framing
    outside the JSON — the flat format carries no binlog position)."""
    from binlogsub_spark.sources.canal import envelope_to_canal_json

    return envelope_to_canal_json(
        changes_to_envelope(changes_df, db_name, table_name)
    )


def changes_to_maxwell(
    changes_df: DataFrame,
    db_name: str = "test",
    table_name: str = "transcripts",
) -> DataFrame:
    """Changelog -> Maxwell record feed (binlog position carried in-band
    as ``position: "mysql-bin.NNNNNN:pos"``)."""
    from binlogsub_spark.sources.maxwell import envelope_to_maxwell_json

    return envelope_to_maxwell_json(
        changes_to_envelope(changes_df, db_name, table_name)
    )
