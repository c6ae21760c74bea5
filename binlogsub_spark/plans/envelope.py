"""Typed schemas for the CDC envelope and the transcripts sink table.

The envelope is the Spark analog of the reference's ``Row`` IR
(/root/reference/row.h:23-45: action + db/table + new image + old image)
plus the ordering context the reference keeps in ``tagContext``
(/root/reference/packet.cc:56-68: next binlog file / pos). The payload
image is the transcripts shape mandated by BASELINE.json's input hint:
(conv_id, turn_idx, role, text, tool, ts).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Change-record payload image (one conversational turn).
IMAGE_FIELDS = [
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
]
IMAGE_SCHEMA = T.StructType(IMAGE_FIELDS)

# Ops mirror the reference's action enum INSERT/UPDATE/DEL
# (/root/reference/row.h:13-18); single characters keep shuffles narrow.
OP_INSERT, OP_UPDATE, OP_DELETE = "I", "U", "D"

# The full change-event envelope, structured variant (decode stage output).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("file_seq", T.IntegerType(), False),
        T.StructField("log_pos", T.LongType(), False),
        T.StructField("server_ts", T.TimestampType()),
        T.StructField("op", T.StringType(), False),
        T.StructField("db_name", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("schema_version", T.IntegerType()),
        T.StructField("before", IMAGE_SCHEMA),
        T.StructField("after", IMAGE_SCHEMA),
    ]
)

# Raw wire variant: one framed event per row, opaque payload bytes.
# Mirrors what Packet::Read hands to Packet::Parse
# (/root/reference/packet.cc:313-373) — framing already done by the source.
RAW_SCHEMA = T.StructType(
    [
        T.StructField("file_seq", T.IntegerType(), False),
        T.StructField("log_pos", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

# Sink table (user-visible columns). `tool` arrives via schema evolution.
TRANSCRIPTS_COLUMNS_V1 = ["conv_id", "turn_idx", "role", "text", "ts"]
TRANSCRIPTS_COLUMNS_V2 = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# Hidden version/tombstone columns kept in the lake table so cross-batch
# last-writer-wins is decidable without replaying history. `_op == 'D'`
# rows are tombstones, filtered out of the read view.
VERSION_COLUMNS = ["_op", "_ts", "_file_seq", "_log_pos"]

MERGE_KEY = ["conv_id", "turn_idx"]
# LWW ordering: (ts, file_seq, log_pos) lexicographic — BASELINE.json's
# "(ts, log_pos)" with file_seq making log_pos globally monotone, matching
# how the reference's position context orders events across rotates
# (/root/reference/packet.cc:56-68, event.cc:25-35).
LWW_ORDER = ["_ts", "_file_seq", "_log_pos"]
