"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The codec boundary dispatches on content magic (``_CODECS`` registry):

* **PPM (P6) images decode FOR REAL** — a pure-numpy decoder/encoder/
  resizer below (no external codec libs needed): genuine header parse,
  genuine pixel statistics, genuine nearest-neighbor resample, genuine
  re-encode.
* **BMP (24-bit BI_RGB) images decode FOR REAL too** — pure struct
  header parse (BITMAPFILEHEADER + BITMAPINFOHEADER), BGR bottom-up
  padded rows handled exactly per the public format spec; proves the
  dispatch generalizes past one magic.
* **WAV (RIFF 16-bit PCM) audio decodes FOR REAL** — genuine RIFF chunk
  walk (fmt/data located by id, unknown chunks skipped word-aligned),
  genuine PCM sample statistics (RMS/peak), genuine nearest-sample rate
  conversion and re-encode — the audio modality runs end to end on real
  samples, no audio libs.
* Everything else (JPEG/PNG/MP3/video — libs absent in this container)
  hits ``_decode_image_stub``, clearly marked; everything Spark-side —
  schema, Arrow batch shape, mapInPandas signatures, partitioning — is
  real and tested either way. Swapping the stub for a PIL/ffmpeg call is
  a one-function change; the distributed plumbing does not move.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("mime", T.StringType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("sha256", T.StringType()),
        ])),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_media(df: DataFrame, id_col: str, payload_col: str, kind: str = "image") -> DataFrame:
    """Wrap an existing binary column into the typed media envelope
    (metadata computed JVM-side: octet_length + sha2)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).alias("content"),
        F.struct(
            F.lit(f"{kind}/stub").alias("mime"),
            F.octet_length(payload_col).alias("n_bytes"),
            F.sha2(F.col(payload_col), 256).alias("sha256"),
        ).alias("meta"),
    )


# ------------------------------------------------------- REAL PPM codec --
PPM_MAGIC = b"P6"


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6). Pure numpy/bytes."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(content: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM (P6) -> (width, height, (h, w, 3) uint8 view). Real
    header parse per the Netpbm spec: magic, whitespace/comment-separated
    width, height, maxval, single whitespace, then raw RGB triplets."""
    if content[:2] != PPM_MAGIC:
        raise ValueError("not a P6 PPM (bad magic)")
    pos, fields = 2, []
    n = len(content)
    while len(fields) < 3:
        while pos < n and content[pos : pos + 1].isspace():
            pos += 1
        if pos < n and content[pos : pos + 1] == b"#":  # comment to EOL
            while pos < n and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not content[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(content[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    need = w * h * 3
    if n - pos < need:
        raise ValueError(f"PPM pixel data short: {n - pos} < {need}")
    arr = np.frombuffer(content, dtype=np.uint8, count=need, offset=pos)
    return w, h, arr.reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample, pure numpy (two index gathers)."""
    h, w, _ = pixels.shape
    ys = (np.arange(new_h, dtype=np.int64) * h) // new_h
    xs = (np.arange(new_w, dtype=np.int64) * w) // new_w
    return pixels[ys][:, xs]


# ---------------------------------------------- REAL BMP (24-bit) codec --
BMP_MAGIC = b"BM"
_BMP_HEADER_SIZE = 14 + 40  # BITMAPFILEHEADER + BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (BI_RGB): BGR byte
    order, bottom-up rows, each row padded to a 4-byte boundary — the
    publicly documented Windows DIB layout, pure struct/numpy."""
    import struct

    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, RGB -> BGR
    if pad:
        rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = np.ascontiguousarray(bgr).tobytes()
    file_size = _BMP_HEADER_SIZE + len(body)
    return (
        struct.pack("<2sIHHI", b"BM", file_size, 0, 0, _BMP_HEADER_SIZE)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


def decode_bmp(content: bytes) -> tuple[int, int, np.ndarray]:
    """24-bit BI_RGB BMP -> (width, height, (h, w, 3) uint8 RGB). Handles
    bottom-up (positive height) and top-down (negative height) DIBs and
    the 4-byte row padding; rejects compressed / non-24bpp variants."""
    import struct

    if content[:2] != BMP_MAGIC:
        raise ValueError("not a BMP (bad magic)")
    if len(content) < _BMP_HEADER_SIZE:
        raise ValueError("truncated BMP header")
    _, _, _, _, data_offset = struct.unpack_from("<2sIHHI", content, 0)
    hdr_size, w, h_signed, planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", content, 14
    )
    if hdr_size < 40 or planes != 1:
        raise ValueError("unsupported BMP DIB header")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP dimensions")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = stride * h
    if len(content) - data_offset < need:
        raise ValueError(f"BMP pixel data short: {len(content) - data_offset} < {need}")
    rows = np.frombuffer(
        content, dtype=np.uint8, count=need, offset=data_offset
    ).reshape(h, stride)[:, :row_bytes]
    bgr = rows.reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return w, h, bgr[:, :, ::-1]  # BGR -> RGB


# ------------------------------------------- REAL WAV (RIFF/PCM) codec --
WAV_MAGIC = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) int16 PCM -> canonical RIFF/WAVE bytes (44-byte
    header: 'fmt ' + 'data' chunks), pure struct/numpy — the publicly
    documented WAVE format, no audio libs."""
    import struct

    if samples.ndim != 2 or samples.dtype != np.int16:
        raise ValueError("encode_wav expects (n, channels) int16")
    n, ch = samples.shape
    body = np.ascontiguousarray(samples).tobytes()
    byte_rate = sample_rate * ch * 2
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(body), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16
        )
        + struct.pack("<4sI", b"data", len(body))
        + body
    )


def decode_wav(content: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE -> (sample_rate, channels, (n, channels) int16 view).
    Real chunk walk (fmt/data located by id, unknown chunks skipped per
    the RIFF spec, word-aligned); PCM format 1, 16-bit only — everything
    else raises and falls back to the stub boundary."""
    import struct

    if content[:4] != WAV_MAGIC or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n = 12, len(content)
    fmt = data = None
    while pos + 8 <= n:
        cid, size = struct.unpack_from("<4sI", content, pos)
        pos += 8
        if pos + size > n:
            raise ValueError("truncated RIFF chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", content, pos)
        elif cid == b"data":
            data = content[pos : pos + size]
        pos += size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16 or ch < 1:
        raise ValueError(f"only 16-bit PCM supported (fmt={audio_format}, bits={bits})")
    usable = (len(data) // (ch * 2)) * ch
    samples = np.frombuffer(data, dtype="<i2", count=usable).reshape(-1, ch)
    return rate, ch, samples


def resample_nearest_audio(samples: np.ndarray, rate: int, new_rate: int) -> np.ndarray:
    """Nearest-sample rate conversion, pure numpy (one index gather) —
    the audio analog of resize_nearest."""
    n = samples.shape[0]
    new_n = (n * new_rate) // rate
    idx = (np.arange(new_n, dtype=np.int64) * n) // max(new_n, 1)
    return samples[idx]


# magic -> (decode: bytes -> (w, h, rgb), encode: rgb -> bytes). Adding a
# container = one registry line; the Spark-side plumbing never changes.
_CODECS: dict[bytes, tuple] = {
    PPM_MAGIC: (decode_ppm, encode_ppm),
    BMP_MAGIC: (decode_bmp, encode_bmp),
}


def _decode_pixels(content: bytes):
    """Dispatch on magic; (w, h, rgb) for a decodable container, None for
    anything the registry cannot decode (incl. magic-prefixed garbage)."""
    codec = _CODECS.get(content[:2])
    if codec is None:
        return None
    try:
        return codec[0](content)
    except ValueError:
        return None  # magic-prefixed but invalid: treat as opaque


def _pixel_features(w: int, h: int, arr: np.ndarray) -> np.ndarray:
    """8-dim feature from genuine pixel statistics (channel means, min,
    max, normalized dims)."""
    means = arr.reshape(-1, 3).mean(axis=0) / 255.0
    return np.array(
        [
            means[0], means[1], means[2],
            arr.min() / 255.0, arr.max() / 255.0,
            w / 4096.0, h / 4096.0, 0.0,
        ],
        dtype=np.float32,
    )


def _decode_image(content: bytes) -> tuple[int, int, np.ndarray]:
    """Codec dispatch: registered containers (P6 PPM, 24-bit BMP) decode
    for real; other formats hit the stub (no codec libs in this
    container)."""
    decoded = _decode_pixels(content)
    if decoded is not None:
        w, h, arr = decoded
        return w, h, _pixel_features(w, h, arr)
    return _decode_image_stub(content)


def _decode_image_stub(content: bytes) -> tuple[int, int, np.ndarray]:
    """STUB — deterministic fake decode. A real deployment decodes with
    PIL/libjpeg here. Derives (width, height, 8-dim feature) from the
    payload bytes so tests are stable and content-sensitive."""
    digest = hashlib.sha256(content).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feat = np.frombuffer(digest[:32], dtype=np.uint8).reshape(4, 8).mean(axis=0) / 255.0
    return width, height, feat.astype(np.float32)


def decode_media(media_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction — the real Arrow plumbing around the
    stubbed codec. Batch shape: one pandas frame of (media_id, content)
    per Arrow batch; output one row per media item."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar assembly: the per-row dict + DataFrame.from_records
            # path spent ~a third of the stage building Python row objects
            widths, heights, feats = [], [], []
            for content in pdf["content"]:
                w, h, feat = _decode_image(bytes(content))
                widths.append(w)
                heights.append(h)
                feats.append(feat)
            meta = pdf["meta"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [m["n_bytes"] for m in meta],
                    "sha256": [m["sha256"] for m in meta],
                    "width": widths,
                    "height": heights,
                    "feature": feats,
                }
            )

    return media_df.mapInPandas(_extract, schema=FEATURES_SCHEMA)


def resize_media(media_df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize: the decode gives each image its dimensions; images whose
    longest side exceeds ``max_side`` get integer-exact scaled target
    dimensions (floor((dim * max_side) / longest)) and a resized flag.

    For registered containers (P6 PPM, 24-bit BMP) the pipeline runs ON
    REAL PIXELS end to end: header parse -> nearest-neighbor resample ->
    re-encode IN THE SAME container, with ``new_n_bytes`` reporting the
    re-encoded size. For other formats the pixel re-encode is the stub
    boundary (no codec libs in this container — content passes through
    opaque, new_n_bytes is NULL); decode, dimension math, envelope rewrite
    and Arrow batch shape still run for real and are value-checked by the
    DuckDB oracle."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                content = bytes(content)
                decoded = _decode_pixels(content)
                if decoded is not None:
                    w, h, arr = decoded
                else:
                    arr = None
                    w, h, _ = _decode_image_stub(content)
                longest = max(w, h)
                if longest > max_side:
                    nw = (w * max_side) // longest
                    nh = (h * max_side) // longest
                    resized = True
                else:
                    nw, nh, resized = w, h, False
                new_n_bytes = None
                if arr is not None:
                    encode = _CODECS[content[:2]][1]
                    out_arr = (
                        resize_nearest(arr, nw, nh) if resized else arr
                    )
                    new_n_bytes = len(encode(np.ascontiguousarray(out_arr)))
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "width": w,
                        "height": h,
                        "new_width": nw,
                        "new_height": nh,
                        "resized": resized,
                        "new_n_bytes": new_n_bytes,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height",
                    "new_width", "new_height", "resized", "new_n_bytes",
                ],
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("new_width", T.IntegerType()),
            T.StructField("new_height", T.IntegerType()),
            T.StructField("resized", T.BooleanType()),
            T.StructField("new_n_bytes", T.IntegerType()),
        ]
    )
    return media_df.mapInPandas(_resize, schema=schema)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ]
)


def _decode_audio_stub(content: bytes) -> tuple[int, int, int, float, float]:
    """STUB — deterministic fake audio decode (a real deployment calls
    libsndfile/ffmpeg here). Derives (rate, channels, n_samples, rms,
    peak) from the payload digest so tests are stable and the oracle can
    replay the derivation from the sha256 hex."""
    digest = hashlib.sha256(content).digest()
    rate = 8000 + 100 * digest[0]
    ch = 1 + digest[1] % 2
    n_samples = 1000 + digest[2] * 37
    return rate, ch, n_samples, digest[3] / 255.0, digest[4] / 255.0


def decode_audio(media_df: DataFrame) -> DataFrame:
    """Audio feature extraction over the media envelope: RIFF/WAVE
    payloads decode FOR REAL (chunk walk -> genuine PCM sample stats:
    RMS and peak over all channels, normalized by full scale 32768);
    other containers hit the stub. Same mapInPandas/Arrow batch shape as
    the image path — the modality changes, the plumbing does not."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                content = bytes(content)
                try:
                    rate, ch, samples = decode_wav(content)
                    x = samples.astype(np.float64) / 32768.0
                    n = samples.shape[0]
                    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                    peak = float(np.max(np.abs(x))) if n else 0.0
                except ValueError:
                    rate, ch, n, rms, peak = _decode_audio_stub(content)
                rows.append(
                    {
                        "media_id": mid,
                        "n_bytes": meta["n_bytes"],
                        "sha256": meta["sha256"],
                        "sample_rate": rate,
                        "channels": ch,
                        "n_samples": n,
                        "duration_ms": n * 1000 // rate,
                        "rms": rms,
                        "peak": peak,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return media_df.mapInPandas(_extract, schema=AUDIO_FEATURES_SCHEMA)


def resample_audio(media_df: DataFrame, target_rate: int = 16000) -> DataFrame:
    """Rate conversion: WAV payloads run REAL end to end (decode ->
    nearest-sample resample -> re-encode, ``new_n_bytes`` = re-encoded
    size); non-WAV content passes through opaque with NULL outputs (the
    stub boundary). Already-at-rate files are not re-encoded."""

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                content = bytes(content)
                try:
                    rate, ch, samples = decode_wav(content)
                except ValueError:
                    rows.append(
                        {
                            "media_id": mid, "sample_rate": None,
                            "new_sample_rate": None, "n_samples": None,
                            "new_n_samples": None, "resampled": None,
                            "new_n_bytes": None,
                        }
                    )
                    continue
                n = samples.shape[0]
                if rate != target_rate:
                    out = resample_nearest_audio(samples, rate, target_rate)
                    new_bytes = len(encode_wav(out, target_rate))
                    rows.append(
                        {
                            "media_id": mid, "sample_rate": rate,
                            "new_sample_rate": target_rate, "n_samples": n,
                            "new_n_samples": out.shape[0], "resampled": True,
                            "new_n_bytes": new_bytes,
                        }
                    )
                else:
                    rows.append(
                        {
                            "media_id": mid, "sample_rate": rate,
                            "new_sample_rate": rate, "n_samples": n,
                            "new_n_samples": n, "resampled": False,
                            "new_n_bytes": len(content),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "new_sample_rate", "n_samples",
                    "new_n_samples", "resampled", "new_n_bytes",
                ],
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("new_sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("new_n_samples", T.IntegerType()),
            T.StructField("resampled", T.BooleanType()),
            T.StructField("new_n_bytes", T.IntegerType()),
        ]
    )
    return media_df.select("media_id", "content").mapInPandas(
        _resample, schema=schema
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("f0", T.FloatType()),
    ]
)


def frame_sample(media_df: DataFrame, every_n: int = 8) -> DataFrame:
    """Video frame sampling plumbing: each media item fans out to one row
    per sampled frame (indices 0, every_n, 2*every_n, ... < n_frames) with
    a per-frame feature — the mapInPandas EXPLODE shape a real
    frame-extraction pipeline has (ffmpeg seek + decode per index). The
    stub codec derives n_frames and the per-frame feature from the content
    digest, so the whole fan-out is deterministic and DuckDB-oracled;
    swapping in a real decoder changes only the two derivation lines."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_frames": [], "frame_idx": [], "f0": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                digest = hashlib.sha256(bytes(content)).digest()
                n_frames = 8 + digest[2] % 120  # STUB: a real codec reads
                # the container header here
                for idx in range(0, n_frames, every_n):
                    out["media_id"].append(mid)
                    out["n_frames"].append(n_frames)
                    out["frame_idx"].append(idx)
                    out["f0"].append(
                        np.float32(digest[(3 + idx) % 32] / 255.0)
                    )
            yield pd.DataFrame(out)

    return media_df.select("media_id", "content").mapInPandas(
        _sample, schema=FRAME_SCHEMA
    )
