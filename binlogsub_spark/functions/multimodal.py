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


def resize_stub(media_df: DataFrame, max_side: int = 256) -> DataFrame:
    """STUB resize: a real pipeline re-encodes pixels; here the plumbing
    (projection + metadata rewrite) is exercised end-to-end."""
    raise NotImplementedError(
        "image resize requires a codec library not present in this "
        "environment; the decode/feature path (decode_media) demonstrates "
        "the identical mapInPandas plumbing"
    )
