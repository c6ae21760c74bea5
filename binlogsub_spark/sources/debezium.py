"""Debezium-JSON change-event source.

The reference consumes the MySQL binlog wire protocol directly; the
dominant PUBLIC way the same change stream is consumed at scale is
Debezium's JSON envelope (one record per row change: ``before`` / ``after``
images, a ``source`` block carrying binlog file/pos, ``op`` in
{c,u,d,r}). Supporting it means a team already landing Debezium topics
into files/Kafka can point this engine at them with zero re-tooling —
the decoded output is the engine's own ENVELOPE_SCHEMA, so the whole
pipeline (scope filter -> salted LWW -> COW MERGE, schema evolution,
exactly-once) is reused unchanged.

Format notes (all from the public Debezium MySQL connector docs):
- ``op``: ``c``=create, ``r``=snapshot read (both map to our INSERT),
  ``u``=update, ``d``=delete. Tombstone records (null value, emitted for
  Kafka log compaction) are dropped here — they carry no image at all.
- ``source.file``/``source.pos`` are the binlog position; the numeric
  suffix of ``mysql-bin.000042`` is the engine's ``file_seq`` — the same
  file-name -> sequence mapping the reference keeps in its position
  context (/root/reference/packet.cc:56-68).
- Temporal encoding: image ``ts`` is epoch-MICROseconds
  (``io.debezium.time.MicroTimestamp``, the connector's encoding for
  DATETIME(4-6)) so last-writer-wins ordering on ``ts`` is lossless;
  the envelope-level ``ts_ms`` is epoch-milliseconds as the name says.
- Schema epochs: plain-JSON Debezium (``schemas.enable=false``) always
  materializes the connector's CURRENT schema and carries no epoch
  marker, so ``decode_debezium`` takes ``schema_version`` as a caller
  knob (default 2 = current transcripts schema). Rows from before the
  ``tool`` column simply carry ``tool: null``, which lands identically.

Everything is JVM-side (``from_json`` / ``to_json`` + column
expressions): no Python UDFs, full codegen, and the JSON parse runs
inside the scan stage at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from binlogsub_spark.plans.envelope import ENVELOPE_SCHEMA

# Debezium images encode DATETIME(6) as epoch-micros int64.
_JSON_IMAGE = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.LongType()),  # MicroTimestamp
    ]
)

DEBEZIUM_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("before", _JSON_IMAGE),
        T.StructField("after", _JSON_IMAGE),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("version", T.StringType()),
                    T.StructField("connector", T.StringType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("ts_ms", T.LongType()),
                    T.StructField("db", T.StringType()),
                    T.StructField("table", T.StringType()),
                    T.StructField("server_id", T.LongType()),
                    T.StructField("gtid", T.StringType()),
                    T.StructField("file", T.StringType()),
                    T.StructField("pos", T.LongType()),
                    T.StructField("row", T.IntegerType()),
                ]
            ),
        ),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def _image_to_envelope(img):
    return F.when(
        img.isNotNull(),
        F.struct(
            img["conv_id"].alias("conv_id"),
            img["turn_idx"].alias("turn_idx"),
            img["role"].alias("role"),
            img["text"].alias("text"),
            img["tool"].alias("tool"),
            F.timestamp_micros(img["ts"]).alias("ts"),
        ),
    )


def decode_debezium(
    df: DataFrame, value_col: str = "value", schema_version: int = 2
) -> DataFrame:
    """JSON-lines Debezium records -> the engine's ENVELOPE_SCHEMA.

    ``df[value_col]`` holds one Debezium value document per row (the
    Kafka record value / one line of a JSON-lines file). Tombstones and
    unparseable lines (``from_json`` -> null in PERMISSIVE mode) are
    dropped: a tombstone is a compaction hint, not a change event.
    """
    v = F.from_json(F.col(value_col), DEBEZIUM_VALUE_SCHEMA)
    # Tombstone/garbage filter with its OWN one-field parse: a filter that
    # references the full-schema struct gets pushed below the projection
    # with the whole from_json DUPLICATED into the condition — measured as
    # ~3 full Jackson parses per line (one per conjunct + the projection;
    # see plans/r06/cdc_debezium_decode_before.txt). Parsing just {op}
    # for the predicate keeps the pushed-down filter nearly free and the
    # full parse runs exactly once. Equivalent: v IS NULL => v.op IS NULL
    # under PERMISSIVE parsing, so filtering on the one-field op alone
    # keeps the same rows.
    op_probe = F.from_json(F.col(value_col), "op string")["op"]
    out = (
        df.where(op_probe.isNotNull())
        .select(v.alias("v"))
        .select(
            F.regexp_extract(F.col("v")["source"]["file"], r"(\d+)$", 1)
            .cast("int")
            .alias("file_seq"),
            F.col("v")["source"]["pos"].alias("log_pos"),
            F.timestamp_millis(F.col("v")["ts_ms"]).alias("server_ts"),
            F.when(F.col("v")["op"] == "u", F.lit("U"))
            .when(F.col("v")["op"] == "d", F.lit("D"))
            .otherwise(F.lit("I"))  # c and r (snapshot read) both insert
            .alias("op"),
            F.col("v")["source"]["db"].alias("db_name"),
            F.col("v")["source"]["table"].alias("table_name"),
            F.lit(schema_version).cast("int").alias("schema_version"),
            _image_to_envelope(F.col("v")["before"]).alias("before"),
            _image_to_envelope(F.col("v")["after"]).alias("after"),
        )
    )
    assert [f.name for f in out.schema.fields] == [
        f.name for f in ENVELOPE_SCHEMA.fields
    ]
    return out


def envelope_to_debezium_json(
    events: DataFrame,
    connector_name: str = "binlogsub",
    passthrough: tuple = (),
) -> DataFrame:
    """Engine envelope -> Debezium value documents (fixture/round-trip
    encoder; also what a migration off this engine back onto a Debezium
    bus would run). Output: (file_seq, log_pos, value:string) — framing
    columns ride OUTSIDE the JSON so file sinks can order/partition
    without re-parsing.

    Epoch fidelity: a record produced BEFORE the ``tool`` ALTER carries no
    ``tool`` key at all in real Debezium output (the connector serializes
    the table's schema at event time), so rows with ``schema_version < 2``
    emit ``tool: null`` — which is what ``from_json`` yields for a missing
    key, making encode->decode land exactly where the in-band epoch
    projection (T5) puts the structured path."""

    def _img_json(side: str):
        img = F.col(side)
        return F.when(
            img.isNotNull(),
            F.struct(
                img["conv_id"].alias("conv_id"),
                img["turn_idx"].alias("turn_idx"),
                img["role"].alias("role"),
                img["text"].alias("text"),
                F.when(F.col("schema_version") >= 2, img["tool"]).alias("tool"),
                F.unix_micros(img["ts"].cast("timestamp")).alias("ts"),
            ),
        )

    dbz_op = (
        F.when(F.col("op") == "U", F.lit("u"))
        .when(F.col("op") == "D", F.lit("d"))
        .otherwise(F.lit("c"))
    )
    value = F.to_json(
        F.struct(
            _img_json("before").alias("before"),
            _img_json("after").alias("after"),
            F.struct(
                F.lit("2.6.0.Final").alias("version"),
                F.lit("mysql").alias("connector"),
                F.lit(connector_name).alias("name"),
                F.unix_millis(F.col("server_ts").cast("timestamp")).alias("ts_ms"),
                F.col("db_name").alias("db"),
                F.col("table_name").alias("table"),
                F.lit(1111).cast("long").alias("server_id"),
                F.lit(None).cast("string").alias("gtid"),
                F.format_string("mysql-bin.%06d", F.col("file_seq")).alias("file"),
                F.col("log_pos").alias("pos"),
                F.lit(0).alias("row"),
            ).alias("source"),
            dbz_op.alias("op"),
            F.unix_millis(F.col("server_ts").cast("timestamp")).alias("ts_ms"),
        )
    )
    return events.select(
        *passthrough, "file_seq", "log_pos", value.alias("value")
    )


def changes_to_debezium(
    changes_df: DataFrame,
    db_name: str = "test",
    table_name: str = "transcripts",
    connector_name: str = "binlogsub",
) -> DataFrame:
    """OUTBOUND CDC: a :meth:`LakeTable.changes(..., include_before=True)
    <binlogsub_spark.lake.table.LakeTable.changes>` feed -> Debezium value
    documents, so downstream consumers subscribe to THIS engine's lake
    tables exactly the way they'd subscribe to a MySQL primary. The
    reference is ingest-only (its consumers are in-process ``IBusiness``
    callbacks, /root/reference/business.h); at 100 TB the changelog is the
    product — this closes the loop: binlog in, Debezium out, and the
    round-trip driver query proves decode(encode(changes)) replays to the
    identical table.

    Mapping: ``change_op`` I/U/D -> Debezium ``c``/``u``/``d``; before
    images come from the ``_before_*`` columns (I: null; D: the emitted
    payload, which already is the before state); ``source.file``/``pos``
    and both ``ts_ms`` fields come from the winning version's
    ``(_file_seq, _log_pos, _ts)``, so positions survive a full
    out-and-back trip and LWW ordering is preserved.

    Pure column expressions over the changelog plan — the bucket-pruned
    ``changes()`` scan stays the only data movement; encoding rides in the
    same stage (whole-stage codegen, no shuffle added).
    """
    from binlogsub_spark.sources.outbound import changes_to_envelope

    return envelope_to_debezium_json(
        changes_to_envelope(changes_df, db_name, table_name),
        connector_name=connector_name,
    )
