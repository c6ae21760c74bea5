"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real image/audio/video codecs are not available in this container, so the
DECODE KERNELS ARE STUBS (clearly marked below); everything Spark-side —
schema, Arrow batch shape, mapInPandas signatures, partitioning — is real
and tested. Swapping ``_decode_image_stub`` for a PIL/ffmpeg call is a
one-function change; the distributed plumbing does not move.
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
            rows = []
            for mid, kind, content, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["content"], pdf["meta"]
            ):
                w, h, feat = _decode_image_stub(bytes(content))
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": meta["n_bytes"],
                        "sha256": meta["sha256"],
                        "width": w,
                        "height": h,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return media_df.mapInPandas(_extract, schema=FEATURES_SCHEMA)


def resize_media(media_df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning + metadata rewrite over the (stub) codec space: the
    decode gives each image its dimensions; images whose longest side
    exceeds ``max_side`` get integer-exact scaled target dimensions
    (floor((dim * max_side) / longest)) and a resized flag. The pixel
    re-encode itself is the stub boundary (no codec libs in this
    container — content passes through opaque); every OTHER stage of a
    real resize pipeline — decode, dimension math, envelope rewrite,
    Arrow batch shape — runs for real and is value-checked by the DuckDB
    oracle (the dimensions derive deterministically from the content
    digest)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                w, h, _ = _decode_image_stub(bytes(content))
                longest = max(w, h)
                if longest > max_side:
                    nw = (w * max_side) // longest
                    nh = (h * max_side) // longest
                    resized = True
                else:
                    nw, nh, resized = w, h, False
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "width": w,
                        "height": h,
                        "new_width": nw,
                        "new_height": nh,
                        "resized": resized,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height",
                    "new_width", "new_height", "resized",
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
        ]
    )
    return media_df.mapInPandas(_resize, schema=schema)


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
