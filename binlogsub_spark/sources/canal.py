"""Canal-JSON (flatMessage) change-event source.

Alibaba Canal is the other dominant public MySQL-binlog subscriber (the
reference sits in the same ecosystem niche — a `COM_BINLOG_DUMP` client
pushing row changes at a downstream sink, /root/reference/mysqlProcess.cc:
170-242). Canal's Kafka/RocketMQ "flatMessage" JSON is therefore a shape a
team migrating to this engine is very likely to already have landing in
files, so we decode it straight into the engine's ENVELOPE_SCHEMA and the
whole pipeline (scope filter -> salted LWW -> COW MERGE, schema evolution,
exactly-once) is reused unchanged.

Format notes (all from the public Canal docs / FlatMessage.java shape):
- One message may carry MANY row changes: ``data`` is an ARRAY of row
  objects (all values serialized as STRINGS, null for SQL NULL), and for
  UPDATE ``old`` is a same-length array holding the OLD values of only the
  CHANGED columns. The decoder explodes ``data`` and rebuilds the full
  before-image by overlaying ``old[i]`` onto ``data[i]``.
- ``type`` is INSERT/UPDATE/DELETE for row events; DDL messages carry
  ``isDdl: true`` plus the statement in ``sql`` and have no row images —
  they are dropped here (the engine's in-band schema epochs carry DDL).
- ``es`` is the statement's execution time on MySQL in epoch-MILLIseconds
  (the envelope's server_ts granularity for this source), ``ts`` is
  canal's own processing time.
- The flat message does NOT carry the binlog file/pos (canal keeps those
  in its protobuf entry header, not the flat JSON). Ordering therefore
  comes from the transport: if the landing zone carries framing columns
  (``file_seq``/``log_pos`` — the Kafka (partition, offset) analog, and
  what ``envelope_to_canal_json`` emits OUTSIDE the JSON), the decoder
  uses them, adding the within-message row index so multi-row messages
  stay totally ordered; otherwise it falls back to the message ``id``
  (canal's monotone batch id) as ``id * 4096 + row_index``.
- Unparseable lines (``from_json`` -> null in PERMISSIVE mode) are
  dropped, matching the Debezium source's tombstone/junk policy.

Everything is JVM-side (``from_json`` / ``to_json`` / ``posexplode`` +
column expressions): no Python UDFs, full codegen, and the JSON parse
runs inside the scan stage at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from binlogsub_spark.plans.envelope import ENVELOPE_SCHEMA

# Canal-JSON serializes every column value as a string (null for NULL).
_STR_IMAGE = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.StringType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.StringType()),
    ]
)

CANAL_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("pkNames", T.ArrayType(T.StringType())),
        T.StructField("isDdl", T.BooleanType()),
        T.StructField("type", T.StringType()),
        T.StructField("es", T.LongType()),  # source exec time, epoch ms
        T.StructField("ts", T.LongType()),  # canal process time, epoch ms
        T.StructField("sql", T.StringType()),
        T.StructField("sqlType", T.MapType(T.StringType(), T.IntegerType())),
        T.StructField("mysqlType", T.MapType(T.StringType(), T.StringType())),
        T.StructField("data", T.ArrayType(_STR_IMAGE)),
        T.StructField("old", T.ArrayType(_STR_IMAGE)),
    ]
)

_ROW_OPS = ("INSERT", "UPDATE", "DELETE")


def _typed_image(conv, turn, role, text, tool, ts):
    """String-serialized canal values -> the typed engine image."""
    return F.struct(
        conv.alias("conv_id"),
        turn.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.cast("timestamp").alias("ts"),
    )


def decode_canal(
    df: DataFrame, value_col: str = "value", schema_version: int = 2
) -> DataFrame:
    """JSON-lines Canal flatMessages -> the engine's ENVELOPE_SCHEMA.

    ``df[value_col]`` holds one flatMessage per row. If ``df`` also
    carries ``file_seq``/``log_pos`` framing columns (what
    ``envelope_to_canal_json`` writes outside the JSON), they provide the
    ordering; otherwise the message ``id`` does (see module notes).
    Multi-row messages explode to one envelope row per ``data[i]``, the
    within-message index added to log_pos to keep binlog order total.
    """
    has_framing = "file_seq" in df.columns and "log_pos" in df.columns
    v = F.from_json(F.col(value_col), CANAL_VALUE_SCHEMA)
    # Control-record filter with its own TWO-FIELD probe parse: predicates
    # referencing the full-schema struct get pushed below the projection
    # with the whole from_json duplicated per conjunct (the debezium
    # decoder measured ~3 full parses per line from this; see
    # plans/r06/cdc_debezium_decode_before.txt). The probe parses just
    # {isDdl, type} (same field types, so nullity/values match the full
    # parse bit-for-bit); a junk/null line yields NULL type -> dropped,
    # exactly as the old v.isNotNull() conjunct did. The old
    # v.data.isNotNull() conjunct is gone because posexplode of a NULL
    # array emits no rows anyway — same output, one fewer parsed field.
    probe = F.from_json(F.col(value_col), "isDdl boolean, type string")
    base = df.where(
        ~F.coalesce(probe["isDdl"], F.lit(False))
        & probe["type"].isin(*_ROW_OPS)
    ).select(*(("file_seq", "log_pos") if has_framing else ()), v.alias("v"))
    ex = base.select(
        *(("file_seq", "log_pos") if has_framing else ()),
        "v",
        F.posexplode(F.col("v")["data"]).alias("idx", "d"),
    )
    old_i = F.element_at(F.col("v")["old"], F.col("idx") + 1)
    d = F.col("d")
    # UPDATE: `old` holds old values of CHANGED columns only; the full
    # before-image is old overlaid on data. (A column changed FROM NULL is
    # indistinguishable from "unchanged" in the flat JSON — a documented
    # lossy corner of the format itself, not of this decoder.)
    overlay = _typed_image(
        *(
            F.coalesce(old_i[c], d[c])
            for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts")
        )
    )
    plain = _typed_image(*(d[c] for c in _STR_IMAGE.fieldNames()))
    typ = F.col("v")["type"]
    if has_framing:
        file_seq = F.col("file_seq").cast("int")
        log_pos = F.col("log_pos") + F.col("idx")
    else:
        file_seq = F.lit(0).cast("int")
        log_pos = F.col("v")["id"] * 4096 + F.col("idx")
    out = ex.select(
        file_seq.alias("file_seq"),
        log_pos.cast("long").alias("log_pos"),
        F.timestamp_millis(F.col("v")["es"]).alias("server_ts"),
        F.when(typ == "UPDATE", F.lit("U"))
        .when(typ == "DELETE", F.lit("D"))
        .otherwise(F.lit("I"))
        .alias("op"),
        F.col("v")["database"].alias("db_name"),
        F.col("v")["table"].alias("table_name"),
        F.lit(schema_version).cast("int").alias("schema_version"),
        F.when(typ == "UPDATE", overlay)
        .when(typ == "DELETE", plain)
        .alias("before"),
        F.when(typ != "DELETE", plain).alias("after"),
    )
    assert [f.name for f in out.schema.fields] == [
        f.name for f in ENVELOPE_SCHEMA.fields
    ]
    return out


# Canal serializes DATETIME(6) with a 6-digit fraction; formatting with
# exactly that pattern makes encode->decode lossless at micros.
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

# Static column-type tables a real canal server would publish (java.sql
# Types codes for sqlType).
_MYSQL_TYPES = {
    "conv_id": "varchar(64)", "turn_idx": "int(11)", "role": "varchar(16)",
    "text": "longtext", "tool": "varchar(32)", "ts": "datetime(6)",
}
_SQL_TYPES = {
    "conv_id": 12, "turn_idx": 4, "role": 12, "text": 12, "tool": 12,
    "ts": 93,
}


def envelope_to_canal_json(
    events: DataFrame, passthrough: tuple = ()
) -> DataFrame:
    """Engine envelope -> Canal flatMessage documents (fixture/round-trip
    encoder; also a migration path back onto a canal bus). One message per
    change event (single-element ``data`` array — canal's common shape for
    row-level subscriptions; the DECODER additionally handles multi-row
    arrays). Output: (file_seq, log_pos, value:string) — framing rides
    OUTSIDE the JSON, the Kafka (partition, offset) analog, because the
    flat format itself carries no binlog position.

    Epoch fidelity matches the Debezium encoder: rows with
    ``schema_version < 2`` serialize ``tool`` as null — exactly where the
    in-band epoch projection (T5) puts the structured path."""

    def _str_img(side: str):
        img = F.col(side)
        return F.when(
            img.isNotNull(),
            F.struct(
                img["conv_id"].alias("conv_id"),
                img["turn_idx"].cast("string").alias("turn_idx"),
                img["role"].alias("role"),
                img["text"].alias("text"),
                F.when(F.col("schema_version") >= 2, img["tool"]).alias("tool"),
                F.date_format(img["ts"], _TS_FMT).alias("ts"),
            ),
        )

    is_u, is_d = F.col("op") == "U", F.col("op") == "D"
    data_img = F.when(is_d, _str_img("before")).otherwise(_str_img("after"))
    canal_type = (
        F.when(is_u, F.lit("UPDATE"))
        .when(is_d, F.lit("DELETE"))
        .otherwise(F.lit("INSERT"))
    )
    es = F.unix_millis(F.col("server_ts").cast("timestamp"))
    value = F.to_json(
        F.struct(
            F.col("log_pos").alias("id"),
            F.col("db_name").alias("database"),
            F.col("table_name").alias("table"),
            F.array(F.lit("conv_id"), F.lit("turn_idx")).alias("pkNames"),
            F.lit(False).alias("isDdl"),
            canal_type.alias("type"),
            es.alias("es"),
            es.alias("ts"),
            F.lit(None).cast("string").alias("sql"),
            F.create_map(
                *(x for c, t in _SQL_TYPES.items() for x in (F.lit(c), F.lit(t)))
            ).alias("sqlType"),
            F.create_map(
                *(x for c, t in _MYSQL_TYPES.items() for x in (F.lit(c), F.lit(t)))
            ).alias("mysqlType"),
            F.array(data_img).alias("data"),
            F.when(is_u, F.array(_str_img("before"))).alias("old"),
        )
    )
    return events.select(
        *passthrough, "file_seq", "log_pos", value.alias("value")
    )
