"""Maxwell's-daemon-JSON change-event source.

Maxwell is the third widely-deployed public MySQL binlog-to-JSON bridge
(after Debezium and Canal — all three fill the reference's niche of a
`COM_BINLOG_DUMP` replication client pushing row changes downstream,
/root/reference/mysqlProcess.cc:170-242). Its JSON is the leanest of the
three: one flat document per row change, typed values (numbers as JSON
numbers), the full new row in ``data`` and — for updates — the OLD values
of only the CHANGED columns in ``old``.

Format notes (from the public Maxwell docs / dataformat reference):
- ``type``: insert / update / delete; bootstrapping emits
  bootstrap-insert (mapped to INSERT here) plus bootstrap-start/complete
  control records with ``data: {}`` — dropped, they carry no row.
- ``ts`` is epoch-SECONDS (the envelope's server_ts granularity for this
  source); sub-second ordering rides on (file_seq, log_pos) as always.
- With ``output_binlog_position=true`` each record carries
  ``position: "mysql-bin.000042:91263"`` — the same file:pos pair the
  reference checkpoints (/root/reference/business.cc:35-49). The decoder
  parses it into (file_seq, log_pos); records without it fall back to
  framing columns on ``df`` when present (the Kafka offset analog).
- DATETIME values are serialized as "YYYY-MM-DD HH:MM:SS[.ffffff]"
  strings; decoded with a plain timestamp cast (lossless at micros).
- Unparseable lines (``from_json`` -> null in PERMISSIVE mode) drop.

Everything is JVM-side (``from_json`` / ``to_json`` + column
expressions): no Python UDFs, full codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from binlogsub_spark.plans.envelope import ENVELOPE_SCHEMA

# Maxwell emits typed JSON values; DATETIME(6) arrives as a string.
_JSON_IMAGE = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.StringType()),
    ]
)

MAXWELL_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("ts", T.LongType()),  # epoch seconds
        T.StructField("xid", T.LongType()),
        T.StructField("commit", T.BooleanType()),
        T.StructField("server_id", T.LongType()),
        T.StructField("thread_id", T.LongType()),
        T.StructField("position", T.StringType()),  # "mysql-bin.NNNNNN:pos"
        T.StructField("primary_key", T.ArrayType(T.StringType())),
        T.StructField("data", _JSON_IMAGE),
        T.StructField("old", _JSON_IMAGE),
    ]
)

_OP_MAP = {"insert": "I", "bootstrap-insert": "I", "update": "U", "delete": "D"}


def _typed(img):
    return F.when(
        img.isNotNull(),
        F.struct(
            img["conv_id"].alias("conv_id"),
            img["turn_idx"].alias("turn_idx"),
            img["role"].alias("role"),
            img["text"].alias("text"),
            img["tool"].alias("tool"),
            img["ts"].cast("timestamp").alias("ts"),
        ),
    )


def decode_maxwell(
    df: DataFrame, value_col: str = "value", schema_version: int = 2
) -> DataFrame:
    """JSON-lines Maxwell records -> the engine's ENVELOPE_SCHEMA.

    Control records (bootstrap-start/complete, DDL when ``output_ddl`` is
    on — those have no ``data``) and junk lines are dropped. The UPDATE
    before-image is ``old`` overlaid on ``data`` (``old`` carries only the
    changed columns' previous values; a column changed FROM NULL is
    indistinguishable from unchanged — a corner of the format itself)."""
    has_framing = "file_seq" in df.columns and "log_pos" in df.columns
    v = F.from_json(F.col(value_col), MAXWELL_VALUE_SCHEMA)
    # Control-record filter with its own SUBSET probe parse ({type, data}
    # with the identical data struct type, so nullity matches the full
    # parse): predicates referencing the full-schema struct get pushed
    # below the projection with the whole from_json duplicated per
    # conjunct (~3 full parses per line measured on the debezium decoder;
    # see plans/r06/cdc_debezium_decode_before.txt). A junk/null line
    # yields NULL type -> dropped, as the old v.isNotNull() conjunct did.
    probe = F.from_json(
        F.col(value_col),
        T.StructType(
            [
                T.StructField("type", T.StringType()),
                T.StructField("data", _JSON_IMAGE),
            ]
        ),
    )
    base = df.where(
        probe["type"].isin(*_OP_MAP) & probe["data"].isNotNull()
    ).select(*(("file_seq", "log_pos") if has_framing else ()), v.alias("v"))
    v, d, o = F.col("v"), F.col("v")["data"], F.col("v")["old"]
    op = F.when(v["type"] == "update", F.lit("U")).when(
        v["type"] == "delete", F.lit("D")
    ).otherwise(F.lit("I"))
    overlay = F.struct(
        *(
            F.coalesce(o[c], d[c]).alias(c)
            for c in ("conv_id", "turn_idx", "role", "text", "tool")
        ),
        F.coalesce(o["ts"], d["ts"]).alias("ts"),
    )
    pos_file = F.regexp_extract(v["position"], r"(\d+):(\d+)$", 1)
    pos_off = F.regexp_extract(v["position"], r"(\d+):(\d+)$", 2)
    if has_framing:
        file_seq = F.coalesce(
            F.nullif(pos_file, F.lit("")).cast("int"),
            F.col("file_seq").cast("int"),
            F.lit(0),
        )
        log_pos = F.coalesce(
            F.nullif(pos_off, F.lit("")).cast("long"), F.col("log_pos"), F.lit(0)
        )
    else:
        file_seq = F.coalesce(F.nullif(pos_file, F.lit("")).cast("int"), F.lit(0))
        log_pos = F.coalesce(
            F.nullif(pos_off, F.lit("")).cast("long"), v["xid"], F.lit(0)
        )
    out = base.select(
        file_seq.alias("file_seq"),
        log_pos.cast("long").alias("log_pos"),
        F.timestamp_seconds(v["ts"]).alias("server_ts"),
        op.alias("op"),
        v["database"].alias("db_name"),
        v["table"].alias("table_name"),
        F.lit(schema_version).cast("int").alias("schema_version"),
        F.when(op == "D", _typed(d)).when(op == "U", _typed(overlay)).alias(
            "before"
        ),
        F.when(op != "D", _typed(d)).alias("after"),
    )
    assert [f.name for f in out.schema.fields] == [
        f.name for f in ENVELOPE_SCHEMA.fields
    ]
    return out


_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def envelope_to_maxwell_json(
    events: DataFrame, passthrough: tuple = ()
) -> DataFrame:
    """Engine envelope -> Maxwell value documents (fixture/round-trip
    encoder). ``position`` carries the binlog file:pos in-band
    (``output_binlog_position`` shape), so the decoder needs no framing
    columns; they are still emitted outside the JSON for file sinks that
    want to order/partition without re-parsing.

    Epoch fidelity matches the other encoders: ``schema_version < 2``
    rows serialize ``tool`` as null."""

    def _str_img(side: str):
        img = F.col(side)
        return F.when(
            img.isNotNull(),
            F.struct(
                img["conv_id"].alias("conv_id"),
                img["turn_idx"].alias("turn_idx"),
                img["role"].alias("role"),
                img["text"].alias("text"),
                F.when(F.col("schema_version") >= 2, img["tool"]).alias("tool"),
                F.date_format(img["ts"], _TS_FMT).alias("ts"),
            ),
        )

    is_u, is_d = F.col("op") == "U", F.col("op") == "D"
    mw_type = (
        F.when(is_u, F.lit("update"))
        .when(is_d, F.lit("delete"))
        .otherwise(F.lit("insert"))
    )
    value = F.to_json(
        F.struct(
            F.col("db_name").alias("database"),
            F.col("table_name").alias("table"),
            mw_type.alias("type"),
            F.unix_seconds(F.col("server_ts").cast("timestamp")).alias("ts"),
            F.col("log_pos").alias("xid"),
            F.lit(True).alias("commit"),
            F.lit(1111).cast("long").alias("server_id"),
            F.lit(7).cast("long").alias("thread_id"),
            F.format_string(
                "mysql-bin.%06d:%d", F.col("file_seq"), F.col("log_pos")
            ).alias("position"),
            F.array(F.lit("conv_id"), F.lit("turn_idx")).alias("primary_key"),
            F.when(is_d, _str_img("before"))
            .otherwise(_str_img("after"))
            .alias("data"),
            F.when(is_u, _str_img("before")).alias("old"),
        )
    )
    return events.select(
        *passthrough, "file_seq", "log_pos", value.alias("value")
    )
