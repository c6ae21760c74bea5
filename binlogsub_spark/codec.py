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
     24   1 tool           u8  (0xff = RESERVED NULL sentinel — tool codes
                                must be 0..254; the reference degrades NULL
                                to "" (/root/reference/event.cc:386-390); we
                                keep a real null, an explicit improvement)
     25   4 turn_idx       u32
     29  24 conv_id        NUL-padded utf-8 (fixed width => vectorizable)
     53   2 text_len       u16
     55   * text           utf-8

Decode operates on the Arrow batch's own buffers, zero-copy: the payload
column's (offsets, data) buffers become ONE contiguous uint8 array plus
int64 frame boundaries; the fixed-width header is a single fancy-indexing
gather viewed as a structured dtype, and the varlen text is one
repeat/cumsum gather into a new Arrow string buffer. No per-row Python
objects exist anywhere on the hot path.
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
        if tool is None:
            tool_code = 0xFF  # reserved NULL sentinel (see module docstring)
        else:
            tool_code = int(tool.rsplit("_", 1)[-1])
            if not 0 <= tool_code <= 0xFE:
                raise ValueError(
                    f"tool code {tool_code} out of range 0..254 "
                    "(0xff is the reserved NULL sentinel)"
                )
        head += struct.pack("<B", tool_code)
    return (
        head
        + struct.pack("<I", turn_idx)
        + conv_id.encode("utf-8").ljust(24, b"\x00")
        + struct.pack("<H", len(text_b))
        + text_b
    )


# ---------------------------------------------------------------- decode --
# Dead-letter reason codes — the analog of ErrorPacket's errcode
# (/root/reference/packet.cc:16-30), recorded per rejected frame so the
# dead-letter table is explainable downstream.
REASON_OK = 0
REASON_SHORT_FRAME = 1
REASON_BAD_VERSION = 2
REASON_BAD_ENUM = 3
REASON_LEN_MISMATCH = 4
REASON_BAD_UTF8 = 5
REASON_NAMES = np.array(
    ["ok", "short_frame", "bad_version", "bad_enum", "len_mismatch", "bad_utf8"]
)


def _binary_buffers(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-copy (starts, ends, data) views of an Arrow Binary/LargeBinary
    array — the whole batch's bytes as ONE contiguous uint8 buffer plus
    int64 frame boundaries. No per-row Python objects are ever created."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off_dtype = (
        np.int64
        if (pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type))
        else np.int32
    )
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64, copy=False)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.zeros(0, np.uint8)
    )
    starts, ends = offsets[:-1], offsets[1:]
    if arr.null_count:
        # null payloads become zero-length frames -> dead-letter short_frame
        valid = np.array(arr.is_valid(), dtype=bool)
        ends = np.where(valid, ends, starts)
    return starts, ends, data


def _gather_headers(data: np.ndarray, starts: np.ndarray, dt: np.dtype) -> np.ndarray:
    """Fixed-width header gather: one fancy-indexing pass builds an (n, hl)
    uint8 matrix viewed as the structured header dtype — the vectorized
    replacement for per-row slice+join."""
    hl = dt.itemsize
    m = data[starts[:, None] + np.arange(hl, dtype=np.int64)]
    return np.ascontiguousarray(m).view(dt).reshape(len(starts))


def _headers_from_arrow(frames, dt: np.dtype):
    """Header gather via the C++ ``binary_slice`` kernel: one memcpy of the
    first ``hl`` bytes per frame, viewed as the structured header dtype.
    The numpy fancy gather above moves ~9 B of index+data traffic per
    header byte (it materializes an (n, hl) int64 index matrix first);
    this path moves exactly the header bytes (measured 287 ms -> ~40 ms
    per 1M frames). Caller guarantees every frame is >= hl bytes (the
    short-frame check precedes every use). Returns None when the slice
    output is ragged (defensive — caller falls back to the numpy gather)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    hl = dt.itemsize
    sl = pc.binary_slice(frames, start=0, stop=hl)
    if isinstance(sl, pa.ChunkedArray):
        sl = sl.combine_chunks()
    n = len(sl)
    if n == 0:
        return np.zeros(0, dtype=dt)
    bufs = sl.buffers()
    off_dtype = (
        np.int64 if pa.types.is_large_binary(sl.type) else np.int32
    )
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[sl.offset : sl.offset + n + 1]
    if int(offsets[-1]) - int(offsets[0]) != n * hl:
        return None
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    m = data[int(offsets[0]) : int(offsets[0]) + n * hl]
    return np.ascontiguousarray(m).view(dt)


def _utf8_invalid_mask(binarr) -> np.ndarray:
    """Per-row UTF-8 validity of an Arrow Binary array, without a per-row
    Python loop: ONE C++ cast (binary -> utf8, safe mode validates) proves
    the common all-valid batch clean; when the batch really does contain
    invalid bytes (dead-letter rarity), bad rows are isolated by bisection —
    O(bad * log n) slice casts, never O(n) Python iterations."""
    import pyarrow as pa

    n = len(binarr)
    out = np.zeros(n, dtype=bool)
    target = (
        pa.large_string()
        if pa.types.is_large_binary(binarr.type)
        else pa.string()
    )

    def _mark(lo: int, hi: int) -> None:  # [lo, hi)
        try:
            binarr.slice(lo, hi - lo).cast(target)
            return
        except pa.ArrowInvalid:
            if hi - lo == 1:
                out[lo] = True
                return
            mid = (lo + hi) // 2
            _mark(lo, mid)
            _mark(mid, hi)

    if n:
        _mark(0, n)
    return out


def validate_reasons(
    starts: np.ndarray,
    ends: np.ndarray,
    data: np.ndarray,
    structural_only: bool = False,
    arr=None,
) -> np.ndarray:
    """Vectorized frame validation returning a per-frame reason code
    (REASON_OK = valid). The engine's analog of the reference's error-packet
    demux (/root/reference/packet.cc:360-373: first byte 0xff -> ErrorPacket
    branch), epoch-aware: the frame's own schema_version byte selects its
    layout. Beyond structure, conv_id/text must decode as UTF-8 — a frame
    with intact framing but garbage text is dead-lettered here rather than
    exploding inside the typed decode. ``structural_only=True`` skips the
    UTF-8 scan (one pass over every payload byte) — for passes that never
    materialize text, e.g. the touched-bucket pre-job, where a bad-UTF-8
    frame merely contributes a harmless extra candidate bucket.

    ``arr``: the SAME frames as an Arrow Binary array (row i ↔ starts[i]).
    With it the UTF-8 check runs as C++ ``binary_slice`` + one validating
    cast per epoch group (see ``_utf8_invalid_mask``). Without it the numpy
    fallback scans the whole buffer for non-ASCII bytes — and because the
    binary HEADER bytes routinely exceed 0x7f, that fallback flags
    essentially EVERY frame as a suspect and walks them in per-row Python
    (measured as ~75%% of the raw decode-only pass at 4M frames); the
    Arrow path exists precisely to kill that."""
    n = len(starts)
    lens = ends - starts
    reasons = np.zeros(n, dtype=np.uint8)
    reasons[lens <= _VERSION_OFFSET] = REASON_SHORT_FRAME
    long_enough = reasons == 0
    versions = np.zeros(n, dtype=np.uint8)
    versions[long_enough] = data[starts[long_enough] + _VERSION_OFFSET]
    known = np.isin(versions, list(_HEADER_DTYPES))
    reasons[long_enough & ~known] = REASON_BAD_VERSION
    # UTF-8 suspects = frames containing ANY non-ASCII byte (usually none):
    # a single max() reduction (no boolean temp) proves the common all-
    # ASCII batch clean before paying the flatnonzero pass, which
    # allocates a bool array the size of the whole payload buffer. (The
    # round-2 version built an int64 cumsum over the whole buffer — 8
    # bytes of memory traffic per payload byte, measured as ~70% of the
    # entire decode cost.)
    nonascii_pos = (
        np.zeros(0, dtype=np.int64)
        if structural_only or arr is not None or len(data) == 0
        or int(data.max()) < 0x80
        else np.flatnonzero(data >= 0x80)
    )
    if len(nonascii_pos):
        f = np.searchsorted(starts, nonascii_pos, side="right") - 1
        in_frame = (f >= 0) & (nonascii_pos < ends[np.clip(f, 0, n - 1)])
        suspect_frames = np.unique(f[in_frame])
    else:
        suspect_frames = np.zeros(0, dtype=np.int64)
    for v, dt in _HEADER_DTYPES.items():
        hl = dt.itemsize
        grp = np.flatnonzero((reasons == 0) & (versions == v))
        if grp.size == 0:
            continue
        short = lens[grp] < hl
        reasons[grp[short]] = REASON_SHORT_FRAME
        grp = grp[~short]
        if grp.size == 0:
            continue
        frames_grp = None
        h = None
        if arr is not None:
            import pyarrow as pa

            frames_grp = arr if grp.size == len(arr) else arr.take(pa.array(grp))
            h = _headers_from_arrow(frames_grp, dt)
        if h is None:
            h = _gather_headers(data, starts[grp], dt)
        bad_enum = (h["op"] > 2) | (h["role"] > 2) | (h["scope"] > 1)
        mismatch = ~bad_enum & (h["text_len"].astype(np.int64) != (lens[grp] - hl))
        reasons[grp[bad_enum]] = REASON_BAD_ENUM
        reasons[grp[mismatch]] = REASON_LEN_MISMATCH
        keep_rel = np.flatnonzero(~bad_enum & ~mismatch)
        cand = grp[keep_rel]
        if cand.size == 0 or structural_only:
            continue
        if arr is not None:
            import pyarrow as pa
            import pyarrow.compute as pc

            frames = (
                frames_grp
                if cand.size == len(grp)
                else frames_grp.take(pa.array(keep_rel))
            )
            # conv_id is the 24 bytes ending 2 before the header end; its
            # trailing NUL padding is valid UTF-8, so validating the padded
            # field gives the same verdict as the stripped value (NUL can
            # neither complete a truncated sequence nor break a valid one)
            conv = pc.binary_slice(frames, start=hl - 26, stop=hl - 2)
            text = pc.binary_slice(frames, start=hl, stop=np.iinfo(np.int32).max)
            bad = _utf8_invalid_mask(conv) | _utf8_invalid_mask(text)
            reasons[cand[bad]] = REASON_BAD_UTF8
        elif suspect_frames.size:
            suspects = np.intersect1d(cand, suspect_frames, assume_unique=False)
            for i in suspects:
                frame = bytes(data[starts[i] : ends[i]])
                try:
                    # conv_id is the 24 bytes ending 2 before the header end
                    frame[hl - 26 : hl - 2].rstrip(b"\x00").decode("utf-8")
                    frame[hl:].decode("utf-8")
                except UnicodeDecodeError:
                    reasons[i] = REASON_BAD_UTF8
    return reasons


_TOOL_LUT = [f"tool_{i}" for i in range(255)] + [None]  # 0xff -> NULL sentinel


def _fixed_to_string_arrow(fixed: np.ndarray, valid: np.ndarray | None = None):
    """NUL-padded fixed-width byte column -> Arrow string array with NO
    per-row Python strings (np.char.decode materializes a str object per
    row — measured as the top cost of the header decode): lengths strip
    TRAILING NUL padding only (vectorized reversed argmax — np.char.rstrip
    parity), then one repeat/cumsum gather into a contiguous UTF-8 buffer.
    ``valid=False`` rows become nulls."""
    import pyarrow as pa

    n = len(fixed)
    w = fixed.dtype.itemsize
    m = np.ascontiguousarray(fixed).view(np.uint8).reshape(n, w)
    # rstrip-TRAILING-NULs semantics (matches the wire spec's NUL padding
    # and the round-3 np.char.rstrip behavior): an embedded NUL inside the
    # value is preserved, only the padding is stripped — truncating at the
    # FIRST NUL would silently collapse distinct keys like 'ab\0cd'/'ab\0ce'
    nonzero = m[:, ::-1] != 0
    lens = np.where(
        nonzero.any(axis=1), w - nonzero.argmax(axis=1), 0
    ).astype(np.int64)
    if valid is not None:
        lens = np.where(valid, lens, 0)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    total = int(off[-1])
    idx = np.repeat(np.arange(n, dtype=np.int64) * w, lens) + (
        np.arange(total, dtype=np.int64) - np.repeat(off[:-1], lens)
    )
    validity = (
        None if valid is None else pa.py_buffer(np.packbits(valid, bitorder="little"))
    )
    return pa.Array.from_buffers(
        pa.string(),
        n,
        [validity, pa.py_buffer(off.astype(np.int32)), pa.py_buffer(m.ravel()[idx])],
    )


def _decode_group_arrow(
    data: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    dt: np.dtype,
    want: frozenset | None = None,
    frames=None,
    utf8_check: bool = False,
):
    """Decode one same-epoch group of frames into Arrow arrays: one header
    gather for the fixed-width numerics, C++ ``binary_slice`` kernels for
    the byte-range columns; every enum is a dictionary `take` (the ENUM
    decode trick — codes index a table, event.cc:607-636).

    ``want`` prunes the output to a column subset: unrequested columns are
    never materialized (the text slice — the dominant cost — is skipped
    entirely when ``text`` is not wanted), and the Arrow IPC batch sent
    back to the JVM carries only the requested columns.

    ``frames``: the group's frames as an Arrow Binary array (same order as
    ``starts``). When given, conv_id/text are produced by
    ``pyarrow.compute.binary_slice`` — the header length is constant
    within an epoch, so both are fixed-offset slices the C++ kernel emits
    with one memcpy per column. The round-5 numpy gather built an int64
    index per PAYLOAD BYTE (repeat + arange + add ≈ 40 B of memory
    traffic per text byte); the slice kernels replace that with offset
    arithmetic in C (measured ~2x on the decode-only pass).

    ``utf8_check=True`` (requires ``frames``) fuses the UTF-8 validation
    into the decode: the conv_id/text slices the decode materializes
    anyway are validated with ``_utf8_invalid_mask`` and bad rows are
    filtered out of the group — callers then skip the standalone UTF-8
    validation pass and its duplicate take+slice of every payload byte
    (structural validation still runs upstream)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    hl = dt.itemsize
    n = len(starts)

    def _want(name: str) -> bool:
        return want is None or name in want

    conv_bin = text_bin = None
    if frames is not None:
        need_conv = utf8_check or _want("conv_id")
        need_text = utf8_check or _want("text")
        if need_text:
            total = int((ends - starts).sum()) - n * hl
            if total > np.iinfo(np.int32).max:
                # int32 Arrow offsets would silently wrap into corrupt
                # slices
                raise ValueError(
                    f"{total} text bytes in one Arrow batch exceeds the "
                    "2 GiB int32-offset limit; lower "
                    "spark.sql.execution.arrow.maxRecordsPerBatch"
                )
            # stop must be explicit (pyarrow 16 rejects an open end); the
            # kernel clamps it to each value's length
            text_bin = pc.binary_slice(
                frames, start=hl, stop=np.iinfo(np.int32).max
            )
        if need_conv:
            conv_bin = pc.binary_slice(frames, start=hl - 26, stop=hl - 2)
        if utf8_check:
            bad = _utf8_invalid_mask(conv_bin) | _utf8_invalid_mask(text_bin)
            if bad.any():
                kp = pa.array(~bad)
                frames = frames.filter(kp)
                conv_bin = conv_bin.filter(kp)
                text_bin = text_bin.filter(kp)
                starts, ends = starts[~bad], ends[~bad]
                n = len(starts)

    h = _headers_from_arrow(frames, dt) if frames is not None else None
    if h is None:
        h = _gather_headers(data, starts, dt)

    def _take(lut: list, codes: np.ndarray):
        return pc.take(pa.array(lut, type=pa.string()), pa.array(codes.astype(np.int64)))

    cols: dict = {}

    def _as_string(binarr):
        # zero-copy layout reinterpret (UTF-8 validity established either
        # by the fused check above or by the caller's validation pass)
        return binarr.view(
            pa.large_string()
            if pa.types.is_large_binary(binarr.type)
            else pa.string()
        )

    if _want("conv_id"):
        if conv_bin is not None:
            # strip the field's TRAILING NUL padding only (embedded NULs
            # inside the value are data — see _fixed_to_string_arrow)
            cols["conv_id"] = pc.ascii_rtrim(
                _as_string(conv_bin), characters="\x00"
            )
        else:
            cols["conv_id"] = _fixed_to_string_arrow(h["conv_id"])
    if _want("text"):
        if text_bin is not None:
            cols["text"] = _as_string(text_bin)
        else:
            total = int((ends - starts).sum()) - n * hl
            if total > np.iinfo(np.int32).max:
                # int32 Arrow offsets would silently wrap into corrupt
                # slices
                raise ValueError(
                    f"{total} text bytes in one Arrow batch exceeds the "
                    "2 GiB int32-offset limit; lower "
                    "spark.sql.execution.arrow.maxRecordsPerBatch"
                )
            # varlen text: one repeat/cumsum gather into a contiguous buffer
            text_lens = ends - starts - hl
            out_off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(text_lens, out=out_off[1:])
            idx = np.repeat(starts + hl - out_off[:-1], text_lens) + np.arange(
                total, dtype=np.int64
            )
            cols["text"] = pa.Array.from_buffers(
                pa.string(),
                n,
                [None, pa.py_buffer(out_off.astype(np.int32)), pa.py_buffer(data[idx])],
            )

    if _want("server_ts") or _want("ts"):
        ts = pa.array(h["ts_micros"].astype("int64")).cast(pa.timestamp("us"))
        if _want("server_ts"):
            cols["server_ts"] = ts
        if _want("ts"):
            cols["ts"] = ts
    if _want("file_seq"):
        cols["file_seq"] = pa.array(h["file_seq"].astype("int32"))
    if _want("log_pos"):
        cols["log_pos"] = pa.array(h["log_pos"].astype("int64"))
    if _want("op"):
        cols["op"] = _take(list(_OPS), h["op"])
    if _want("db_name"):
        cols["db_name"] = _take(list(_DBS), h["scope"])
    if _want("table_name"):
        cols["table_name"] = _take(list(_TABLES), h["scope"])
    if _want("schema_version"):
        cols["schema_version"] = pa.array(h["schema_version"].astype("int32"))
    if _want("turn_idx"):
        cols["turn_idx"] = pa.array(h["turn_idx"].astype("int32"))
    if _want("role"):
        cols["role"] = _take(list(_ROLES), h["role"])
    if _want("tool"):
        cols["tool"] = (
            _take(_TOOL_LUT, h["tool"]) if "tool" in dt.names
            else pa.nulls(n, pa.string())  # pre-evolution epoch
        )
    # mapInArrow matches record batches to the declared schema positionally:
    # emit in DECODED_SCHEMA field order
    return {
        f.name: cols[f.name] for f in DECODED_SCHEMA.fields if f.name in cols
    }


def _decode_frames_arrow(
    data, starts, ends, want: frozenset | None = None, arr=None, sel=None,
    utf8_check: bool = False,
):
    """Valid frames -> list of per-epoch column dicts (the batch splits into
    per-epoch groups, each decoded in one gather pass — the in-band schema
    lookup the reference does per event via its table-map cache,
    /root/reference/packet.cc:194-200, amortized to per-group here).

    ``arr``/``sel``: the source Arrow Binary array and the kept frames'
    indices into it — lets each epoch group hand its frames to the C++
    slice kernels (see _decode_group_arrow) instead of numpy gathers.
    ``utf8_check``: validate conv_id/text UTF-8 on the decode's own slices
    and drop bad frames here (fused mode — only meaningful with ``arr``;
    callers then run structural-only validation upstream)."""
    import pyarrow as pa

    versions = (
        data[starts + _VERSION_OFFSET]
        if len(starts)
        else np.zeros(0, dtype=np.uint8)
    )
    out = []
    for v, dt in _HEADER_DTYPES.items():
        g = versions == v
        if g.any():
            frames = None
            if arr is not None and sel is not None:
                frames = arr.take(pa.array(sel[g]))
            out.append(
                _decode_group_arrow(
                    data, starts[g], ends[g], dt, want, frames,
                    utf8_check=utf8_check and frames is not None,
                )
            )
    return out


def validate_payload_batch(payloads: pd.Series) -> np.ndarray:
    """pandas-facing wrapper: bool mask of structurally+UTF-8-valid frames."""
    import pyarrow as pa

    parr = pa.array(payloads, type=pa.binary())
    starts, ends, data = _binary_buffers(parr)
    return validate_reasons(starts, ends, data, arr=parr) == REASON_OK


def decode_payload_batch(payloads: pd.Series) -> pd.DataFrame:
    """pandas-facing wrapper over the Arrow-buffer decode (tests/fixtures).
    Precondition: payloads already validated (see validate_payload_batch)."""
    import pyarrow as pa

    names = [f.name for f in DECODED_SCHEMA.fields]
    if len(payloads) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=object) for c in names})
    starts, ends, data = _binary_buffers(pa.array(payloads, type=pa.binary()))
    parts = [
        pa.table(cols).to_pandas() for cols in _decode_frames_arrow(data, starts, ends)
    ]
    return parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)


_SCOPE_OFFSET = 22  # scope byte position (common prefix)


def _scope_mask(
    starts: np.ndarray, ends: np.ndarray, data: np.ndarray, scope_codes: frozenset
) -> np.ndarray:
    """Boolean mask of frames whose scope byte is in ``scope_codes``
    (frames too short to carry one are out). The ONE implementation both
    the decode kernel and the stats kernel use — they must agree, because
    the stats pass derives the touched-bucket superset for the exact frame
    set the decode pass keeps."""
    n = len(starts)
    long_enough = (ends - starts) > _SCOPE_OFFSET
    sc = np.zeros(n, dtype=np.uint8)
    sc[long_enough] = data[starts[long_enough] + _SCOPE_OFFSET]
    return long_enough & np.isin(sc, list(scope_codes))


def scope_codes_for(db_regex: str, table_regex: str) -> frozenset:
    """Which wire scope codes satisfy the configured (db, table) regexes —
    the raw-path analog of ``scope_registry`` (P2 pushdown): the filter
    becomes a byte comparison INSIDE the decode kernel, before any value
    is materialized (reference skips row decode for unmatched tables,
    /root/reference/packet.cc:201-205)."""
    import re

    db_re, tbl_re = re.compile(db_regex), re.compile(table_regex)
    return frozenset(
        c
        for c in range(len(_DBS))
        if db_re.search(_DBS[c]) and tbl_re.search(_TABLES[c])
    )


def decode_raw_events(
    raw_df: DataFrame,
    skip_invalid: bool = True,
    columns: list[str] | None = None,
    scope_codes: frozenset | None = None,
) -> DataFrame:
    """payload:binary -> typed change records via mapInArrow: the payload
    column's own Arrow buffers are indexed directly (zero-copy), so the hot
    path never materializes a Python bytes object per row. Structurally
    invalid payloads are dropped here (route them to a dead-letter sink
    first via ``split_deadletter`` if they must be kept).

    ``columns`` prunes the decode to a subset of DECODED_SCHEMA fields —
    unrequested columns are never gathered and never cross the Arrow IPC
    boundary. ``scope_codes`` (see ``scope_codes_for``) drops out-of-scope
    frames on their scope byte before decoding a single value."""
    import pyarrow as pa

    want = frozenset(columns) if columns is not None else None
    out_schema = (
        DECODED_SCHEMA
        if want is None
        else T.StructType([f for f in DECODED_SCHEMA.fields if f.name in want])
    )

    def _decode(batches) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            arr = rb.column(rb.schema.get_field_index("payload"))
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            starts, ends, data = _binary_buffers(arr)
            sel = np.arange(len(starts), dtype=np.int64)
            if skip_invalid:
                # STRUCTURAL validation only: the UTF-8 check is fused
                # into the decode itself (utf8_check below), which
                # validates the conv_id/text slices it materializes
                # anyway — the standalone UTF-8 pass would take+slice
                # every payload byte a second time
                keep = (
                    validate_reasons(
                        starts, ends, data, structural_only=True, arr=arr
                    )
                    == REASON_OK
                )
                starts, ends, sel = starts[keep], ends[keep], sel[keep]
            if scope_codes is not None and len(starts):
                in_scope = _scope_mask(starts, ends, data, scope_codes)
                starts, ends, sel = starts[in_scope], ends[in_scope], sel[in_scope]
            for cols in _decode_frames_arrow(
                data, starts, ends, want, arr=arr, sel=sel,
                utf8_check=skip_invalid,
            ):
                yield pa.RecordBatch.from_pydict(cols)

    # payload-only projection: the kernel re-derives file_seq/log_pos from
    # the frame header bytes, so shipping the framed outer columns across
    # the Arrow boundary (16 B/row of pure serialization) buys nothing
    return raw_df.select("payload").mapInArrow(_decode, schema=out_schema)


RAW_STATS_SCHEMA = T.StructType(
    [
        T.StructField("file_seq", T.IntegerType()),
        T.StructField("log_pos", T.LongType()),
        T.StructField("conv_id", T.StringType()),
    ]
)


def raw_frame_stats_df(
    raw_df: DataFrame, scope_codes: frozenset | None = None
) -> DataFrame:
    """ONE header-only kernel pass emitting (file_seq, log_pos, conv_id?)
    per input frame — the pre-merge job of the raw path. file_seq/log_pos
    pass through from the framed OUTER columns untouched (every frame keeps
    its lineage identity, valid or not); conv_id is gathered only for
    structurally-valid in-scope frames and is NULL otherwise. One
    aggregation over this yields the per-file offset frontier, the event
    counts AND the touched-COW-bucket set — no text gather, no UTF-8 scan,
    no second scan of the source."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _stats(batches) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            arr = rb.column(rb.schema.get_field_index("payload"))
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            starts, ends, data = _binary_buffers(arr)
            n = len(starts)
            valid = (
                validate_reasons(starts, ends, data, structural_only=True, arr=arr)
                == REASON_OK
            )
            if scope_codes is not None and n:
                valid &= _scope_mask(starts, ends, data, scope_codes)
            conv_mat = np.zeros(n, dtype="S24")
            ok = np.flatnonzero(valid)
            if ok.size:
                versions = data[starts[ok] + _VERSION_OFFSET]
                for v, dt in _HEADER_DTYPES.items():
                    g = ok[versions == v]
                    if g.size:
                        conv_mat[g] = _gather_headers(data, starts[g], dt)["conv_id"]
            # cast the passthrough columns to the declared output types — a
            # source carrying file_seq as bigint (accepted by every other
            # path) must not fail inside the kernel on an Arrow type pin
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(
                        rb.column(rb.schema.get_field_index("file_seq")),
                        pa.int32(),
                    ),
                    pc.cast(
                        rb.column(rb.schema.get_field_index("log_pos")),
                        pa.int64(),
                    ),
                    _fixed_to_string_arrow(conv_mat, valid=valid),
                ],
                names=["file_seq", "log_pos", "conv_id"],
            )

    return raw_df.mapInArrow(_stats, schema=RAW_STATS_SCHEMA)


# IEEE 802.3 CRC32 lookup table (the polynomial zlib/Spark's crc32 use)
_CRC32_TABLE = None


def _crc32_table() -> np.ndarray:
    global _CRC32_TABLE
    if _CRC32_TABLE is None:
        t = np.arange(256, dtype=np.uint32)
        for _ in range(8):
            t = np.where(t & 1, (t >> 1) ^ np.uint32(0xEDB88320), t >> 1)
        _CRC32_TABLE = t
    return _CRC32_TABLE


def crc32_of_fixed(mat: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized CRC32 over a fixed-width byte matrix with per-row true
    lengths (NUL-padded fields): one table-lookup step per byte COLUMN,
    all rows in lockstep — the numpy twin of Spark's ``crc32`` /
    zlib.crc32, bit-for-bit. Powers in-kernel bucket derivation
    (``bucket_expr`` is CRC32-based for exactly this dual-computability).

    ``mat``: (n, width) uint8; ``lengths``: (n,) int. Returns (n,) uint32.
    """
    table = _crc32_table()
    n, width = mat.shape
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    for j in range(width):
        active = lengths > j
        if not active.any():
            break
        c = crc[active]
        crc[active] = (c >> np.uint32(8)) ^ table[(c ^ mat[active, j]) & np.uint32(0xFF)]
    return crc ^ np.uint32(0xFFFFFFFF)


def raw_touched_buckets_df(
    raw_df: DataFrame, buckets: int, scope_codes: frozenset | None = None
) -> DataFrame:
    """Per-kernel-batch DISTINCT COW bucket ids of the in-scope valid
    frames — the touched-bucket superset for the one-pass MERGE, computed
    INSIDE the kernel (header gather -> vectorized CRC32 -> unique), so
    the job ships at most ``buckets`` rows per Arrow batch to the JVM
    instead of one row per frame. Replaces the per-frame stats pass as
    the merge's pre-job: at 2M events that pass spent ~70% of the raw
    path's wall time shipping and hash-aggregating 2M (file_seq, log_pos,
    conv_id) rows whose only consumer was a distinct-bucket set and a
    per-file max that a column-pruned JVM aggregation computes for free.
    """
    import pyarrow as pa

    out_schema = T.StructType([T.StructField("bucket", T.IntegerType())])
    # conv_id byte offset by epoch: common prefix (24) [+ tool byte in v2]
    # + turn_idx (4); field width 24 (_SUFFIX). A frame long enough to
    # carry the conv field is ALL the validation the superset needs —
    # frames the decode later rejects (bad enum, len mismatch, utf8) at
    # worst contribute a harmless extra bucket.
    conv_offs = {
        v: dt.itemsize - dt["conv_id"].itemsize - dt["text_len"].itemsize
        for v, dt in _HEADER_DTYPES.items()
    }

    def _buckets(batches) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            arr = rb.column(rb.schema.get_field_index("payload"))
            starts, ends, data = _binary_buffers(arr)
            n = len(starts)
            lens = ends - starts
            valid = lens > _VERSION_OFFSET
            if scope_codes is not None and n:
                valid &= _scope_mask(starts, ends, data, scope_codes)
            versions = np.zeros(n, dtype=np.uint8)
            valid_idx = np.flatnonzero(valid)
            versions[valid_idx] = data[starts[valid_idx] + _VERSION_OFFSET]
            parts = []
            for v, off in conv_offs.items():
                g = np.flatnonzero((versions == v) & (lens >= off + 24))
                if not g.size:
                    continue
                # gather ONLY the 24 conv bytes, never the whole header
                mat = data[starts[g][:, None] + (off + np.arange(24, dtype=np.int64))]
                lengths = np.where(
                    (mat == 0).any(axis=1), (mat == 0).argmax(axis=1), 24
                )
                parts.append(
                    (crc32_of_fixed(mat, lengths) % np.uint32(buckets)).astype(
                        np.int32
                    )
                )
            out = (
                np.unique(np.concatenate(parts))
                if parts
                else np.zeros(0, dtype=np.int32)
            )
            yield pa.RecordBatch.from_pydict({"bucket": pa.array(out)})

    # payload-only projection: the kernel never needs the framing columns
    return raw_df.select("payload").mapInArrow(_buckets, schema=out_schema)


def split_deadletter(raw_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S5 demux: (valid, dead_letter). Both sides keep the framing columns
    so dead-lettered events stay addressable by (file_seq, log_pos), and the
    dead side carries a ``_reason`` code naming the failed check — the
    reference just logs errno and aborts (/root/reference/packet.cc:16-30);
    a pipeline at scale must keep flowing and account for *why*."""
    import pyarrow as pa

    flag_schema = T.StructType(
        list(raw_df.schema.fields)
        + [T.StructField("_valid", T.BooleanType()), T.StructField("_reason", T.StringType())]
    )

    def _flag(batches) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            arr = rb.column(rb.schema.get_field_index("payload"))
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            starts, ends, data = _binary_buffers(arr)
            reasons = validate_reasons(starts, ends, data, arr=arr)
            rb = rb.append_column("_valid", pa.array(reasons == REASON_OK))
            yield rb.append_column("_reason", pa.array(REASON_NAMES[reasons]))

    flagged = raw_df.mapInArrow(_flag, schema=flag_schema)
    return (
        flagged.where(F.col("_valid")).drop("_valid", "_reason"),
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
