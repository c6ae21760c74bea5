"""Binary wire codec + vectorized Arrow decode kernels.

The reference spends most of its code decoding MySQL's binary row format
one value at a time (`ParseColumnValue`, /root/reference/event.cc:413-809,
with the little-endian `korr` readers of /root/reference/myconvert.h:19-117
and the length-encoded integer of /root/reference/util.cc:144-172). This
module re-realizes that layer the Spark-idiomatic way: events arrive as an
opaque ``payload: binary`` column and a ``mapInPandas`` kernel decodes an
entire Arrow batch at once with numpy — no per-row Python in the hot path.

Wire format (one event record; all integers little-endian, mirroring the
`korr` convention):

    off len field
      0   4 file_seq       u32
      4   8 log_pos        u64
     12   8 ts_micros      u64 (epoch micros; both server_ts and image ts)
     20   1 op             u8  (0=INSERT 1=UPDATE 2=DELETE; row.h:13-18)
     21   1 schema_version u8
     22   1 scope          u8  (0 -> test.transcripts, 1 -> other.noise)
     23   1 role           u8  (0 user, 1 assistant, 2 tool)
     24   1 tool           u8  (0xff = NULL — the reference degrades NULL to
                                "" (/root/reference/event.cc:386-390); we
                                keep a real null, an explicit improvement)
     25   4 turn_idx       u32
     29  24 conv_id        NUL-padded utf-8 (fixed width => vectorizable)
     53   2 text_len       u16
     55   * text           utf-8

The fixed 55-byte prefix decodes with a single structured ``np.frombuffer``
per batch; only the trailing varlen text needs a (C-level) join+slice pass.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_COMMON_PREFIX = [
    ("file_seq", "<u4"),
    ("log_pos", "<u8"),
    ("ts_micros", "<u8"),
    ("op", "u1"),
    ("schema_version", "u1"),
    ("scope", "u1"),
    ("role", "u1"),
]
_SUFFIX = [("turn_idx", "<u4"), ("conv_id", "S24"), ("text_len", "<u2")]
# Epoch-versioned layouts (in-band schema evolution at the BYTE level, like
# the reference's table-map epochs, /root/reference/packet.cc:141-152):
# schema_version 1 frames physically lack the tool byte.
_HEADER_DTYPES = {
    1: np.dtype(_COMMON_PREFIX + _SUFFIX),
    2: np.dtype(_COMMON_PREFIX + [("tool", "u1")] + _SUFFIX),
}
_VERSION_OFFSET = 21  # schema_version byte position (common prefix)
HEADER_LENS = {v: dt.itemsize for v, dt in _HEADER_DTYPES.items()}
HEADER_LEN = HEADER_LENS[2]  # v2 (current epoch) header size
assert HEADER_LENS == {1: 54, 2: 55}

_OPS = np.array(["I", "U", "D"])
_ROLES = np.array(["user", "assistant", "tool"])
_DBS = np.array(["test", "other"])
_TABLES = np.array(["transcripts", "noise"])

# Flat decoded change record (the engine's IR — analog of the reference's
# Row{action, db, tbl, cols[]} at /root/reference/row.h:23-45, but typed
# and columnar instead of stringly row-at-a-time).
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("file_seq", T.IntegerType()),
        T.StructField("log_pos", T.LongType()),
        T.StructField("server_ts", T.TimestampType()),
        T.StructField("op", T.StringType()),
        T.StructField("db_name", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("schema_version", T.IntegerType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


# ---------------------------------------------------------------- encode --
def encode_record(
    file_seq: int,
    log_pos: int,
    ts_micros: int,
    op: str,
    schema_version: int,
    scope: int,
    role: str,
    tool: str | None,
    turn_idx: int,
    conv_id: str,
    text: str,
) -> bytes:
    """Pack one event (generator/fixture side; not a hot path). The frame
    layout follows the record's own schema_version: epoch-1 frames have no
    tool byte (the column did not exist yet)."""
    text_b = text.encode("utf-8")
    head = struct.pack(
        "<IQQBBBB",
        file_seq,
        log_pos,
        ts_micros,
        {"I": 0, "U": 1, "D": 2}[op],
        schema_version,
        scope,
        {"user": 0, "assistant": 1, "tool": 2}[role],
    )
    if schema_version >= 2:
        tool_code = 0xFF if tool is None else int(tool.rsplit("_", 1)[-1])
        head += struct.pack("<B", tool_code)
    return (
        head
        + struct.pack("<I", turn_idx)
        + conv_id.encode("utf-8").ljust(24, b"\x00")
        + struct.pack("<H", len(text_b))
        + text_b
    )


# ---------------------------------------------------------------- decode --
def _versions_of(payloads_np: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """schema_version byte per record (0 where the frame is too short to
    even carry the common prefix)."""
    vb = np.zeros(len(payloads_np), dtype=np.uint8)
    long_enough = lens > _VERSION_OFFSET
    if long_enough.any():
        vb[long_enough] = np.frombuffer(
            b"".join(bytes(r[_VERSION_OFFSET : _VERSION_OFFSET + 1])
                     for r in payloads_np[long_enough]),
            dtype=np.uint8,
        )
    return vb


def validate_payload_batch(payloads: pd.Series) -> np.ndarray:
    """Vectorized structural validation — the engine's analog of the
    reference's error-packet demux (/root/reference/packet.cc:360-373:
    first byte 0xff -> ErrorPacket branch). Returns a bool mask of valid
    records; invalid ones go to the dead-letter branch instead of
    aborting the stream like the reference does. Validation is
    epoch-aware: the frame's own schema_version byte selects its layout."""
    lens = payloads.map(len).to_numpy()
    raw = payloads.to_numpy()
    versions = _versions_of(raw, lens)
    ok = np.zeros(len(raw), dtype=bool)
    for v, dt in _HEADER_DTYPES.items():
        hl = dt.itemsize
        grp = (versions == v) & (lens >= hl)
        if not grp.any():
            continue
        hdr = b"".join(bytes(r[:hl]) for r in raw[grp])
        h = np.frombuffer(hdr, dtype=dt)
        good = (
            (h["op"] <= 2)
            & (h["role"] <= 2)
            & (h["scope"] <= 1)
            & (h["text_len"] == (lens[grp] - hl))
        )
        idx = np.flatnonzero(grp)
        ok[idx[good]] = True
    return ok


def _decode_group(raw: np.ndarray, dt: np.dtype) -> pd.DataFrame:
    """Decode one same-epoch group: one frombuffer pass + vectorized ops."""
    hl = dt.itemsize
    h = np.frombuffer(b"".join(bytes(r[:hl]) for r in raw), dtype=dt)
    conv = np.char.decode(np.char.rstrip(h["conv_id"], b"\x00"), "utf-8")
    texts = pd.Series(raw).str.slice(hl).str.decode("utf-8")
    if "tool" in dt.names:
        # small-domain dictionary lookup instead of per-row string building
        # (the ENUM decode trick — codes index a table, event.cc:607-636)
        tool_lut = np.array([f"tool_{i}" for i in range(255)] + [None], dtype=object)
        tool = pd.Series(tool_lut[h["tool"]])
    else:
        tool = pd.Series([None] * len(raw), dtype=object)  # pre-evolution epoch
    ts = pd.to_datetime(h["ts_micros"].astype("int64"), unit="us")
    return pd.DataFrame(
        {
            "file_seq": h["file_seq"].astype("int32"),
            "log_pos": h["log_pos"].astype("int64"),
            "server_ts": ts,
            "op": _OPS[h["op"]],
            "db_name": _DBS[h["scope"]],
            "table_name": _TABLES[h["scope"]],
            "schema_version": h["schema_version"].astype("int32"),
            "conv_id": conv,
            "turn_idx": h["turn_idx"].astype("int32"),
            "role": _ROLES[h["role"]],
            "text": texts,
            "tool": tool,
            "ts": ts,
        }
    )


def decode_payload_batch(payloads: pd.Series) -> pd.DataFrame:
    """Decode one Arrow batch of raw event payloads, vectorized. The frame's
    own schema_version byte selects the epoch layout (v1 has no tool byte),
    so the batch splits into per-epoch groups, each decoded in one
    frombuffer pass — the in-band schema lookup the reference does per
    event via its table-map cache (/root/reference/packet.cc:194-200),
    amortized to per-group here.
    Precondition: payloads already validated (see validate_payload_batch)."""
    n = len(payloads)
    if n == 0:
        return pd.DataFrame(
            {f.name: pd.Series([], dtype=object) for f in DECODED_SCHEMA.fields}
        )
    raw = payloads.to_numpy()
    lens = payloads.map(len).to_numpy()
    versions = _versions_of(raw, lens)
    parts = [
        _decode_group(raw[versions == v], dt)
        for v, dt in _HEADER_DTYPES.items()
        if (versions == v).any()
    ]
    if len(parts) == 1:
        return parts[0]
    return pd.concat(parts, ignore_index=True)


def decode_raw_events(raw_df: DataFrame, skip_invalid: bool = True) -> DataFrame:
    """payload:binary -> typed change records via mapInPandas (Arrow batches).
    Structurally invalid payloads are dropped here (route them to a
    dead-letter sink first via ``split_deadletter`` if they must be kept)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if skip_invalid and len(payloads):
                payloads = payloads[validate_payload_batch(payloads)]
            yield decode_payload_batch(payloads.reset_index(drop=True))

    return raw_df.mapInPandas(_decode, schema=DECODED_SCHEMA)


def split_deadletter(raw_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S5 demux: (valid, dead_letter). Both sides keep the framing columns
    so dead-lettered events stay addressable by (file_seq, log_pos) — the
    reference just logs and aborts (/root/reference/packet.cc:16-30); a
    pipeline at scale must keep flowing and account for them."""
    from binlogsub_spark.plans.envelope import RAW_SCHEMA  # noqa: F401

    flag_schema = T.StructType(
        list(raw_df.schema.fields) + [T.StructField("_valid", T.BooleanType())]
    )

    def _flag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["_valid"] = (
                validate_payload_batch(pdf["payload"]) if len(pdf) else []
            )
            yield out

    flagged = raw_df.mapInPandas(_flag, schema=flag_schema)
    return (
        flagged.where(F.col("_valid")).drop("_valid"),
        flagged.where(~F.col("_valid")).drop("_valid"),
    )


# ------------------------------------------------- parity decode kernels --
def read_lenenc_int(buf: np.ndarray, pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized MySQL length-encoded integer reader — parity with
    /root/reference/util.cc:144-172 (<0xfb inline, 0xfc:+2B, 0xfd:+3B,
    0xfe:+8B), little-endian like the korr macros (myconvert.h:19-117).

    ``buf`` is a 1-D uint8 array; ``pos`` an int64 array of offsets.
    Returns (values, next_pos).
    """
    first = buf[pos]
    val = first.astype(np.uint64)
    nxt = pos + 1

    two = first == 0xFC
    if two.any():
        p = pos[two]
        val[two] = buf[p + 1].astype(np.uint64) | (buf[p + 2].astype(np.uint64) << 8)
        nxt[two] = p + 3
    three = first == 0xFD
    if three.any():
        p = pos[three]
        val[three] = (
            buf[p + 1].astype(np.uint64)
            | (buf[p + 2].astype(np.uint64) << 8)
            | (buf[p + 3].astype(np.uint64) << 16)
        )
        nxt[three] = p + 4
    eight = first == 0xFE
    if eight.any():
        p = pos[eight]
        acc = np.zeros(p.shape, dtype=np.uint64)
        for i in range(8):
            acc |= buf[p + 1 + i].astype(np.uint64) << np.uint64(8 * i)
        val[eight] = acc
        nxt[eight] = p + 9
    return val, nxt


def write_lenenc_int(v: int) -> bytes:
    if v < 0xFB:
        return bytes([v])
    if v < 1 << 16:
        return b"\xfc" + v.to_bytes(2, "little")
    if v < 1 << 24:
        return b"\xfd" + v.to_bytes(3, "little")
    return b"\xfe" + v.to_bytes(8, "little")


def uint_korr(buf: np.ndarray, pos: np.ndarray, width: int) -> np.ndarray:
    """Vectorized little-endian fixed-width reader for widths 1..8 —
    parity with uint2korr/uint3korr/.../uint8korr
    (/root/reference/myconvert.h:19-117), including the odd 3/5/6-byte
    widths MySQL uses for log positions and table ids
    (/root/reference/event.cc:246-265 reads a 6-byte table_id)."""
    acc = np.zeros(pos.shape, dtype=np.uint64)
    for i in range(width):
        acc |= buf[pos + i].astype(np.uint64) << np.uint64(8 * i)
    return acc


# ---------------------------------------------------------- DF-level enc --
def encode_decoded_events(
    flat_df: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Inverse of decode_raw_events: flat change records -> RAW_SCHEMA rows
    (plus any ``passthrough`` columns, e.g. delivery_seq for arrival-order
    file layout).

    Fixture-generation path only (the golden-decode tests run
    decode(encode(x)) == x); correctness matters, speed does not.
    """
    from binlogsub_spark.plans.envelope import RAW_SCHEMA

    out_schema = T.StructType(
        list(RAW_SCHEMA.fields)
        + [flat_df.schema[c] for c in passthrough]
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for r in pdf.itertuples(index=False):
                payloads.append(
                    encode_record(
                        int(r.file_seq),
                        int(r.log_pos),
                        int(pd.Timestamp(r.server_ts).value // 1000),
                        r.op,
                        int(r.schema_version),
                        0 if r.db_name == "test" else 1,
                        r.role,
                        r.tool if isinstance(r.tool, str) else None,
                        int(r.turn_idx),
                        r.conv_id,
                        r.text,
                    )
                )
            out = {
                "file_seq": pdf["file_seq"].astype("int32"),
                "log_pos": pdf["log_pos"].astype("int64"),
                "payload": payloads,
            }
            for c in passthrough:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return flat_df.mapInPandas(_encode, schema=out_schema)
