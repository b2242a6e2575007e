"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference surface (north star). Images/audio/video are opaque
`binary` columns with a metadata struct; decode / feature-extraction
runs as Arrow-batched pandas iterators (mapInPandas) so each executor
processes whole record batches — the real shape of a multimodal
pipeline at 100 TB (payload bytes never visit the driver; partition
sizing bounds executor memory).

The actual media decode (PIL/librosa/ffmpeg) is NOT available in this
container, so `decode_media` raises NotImplementedError behind the
`codec="real"` gate, and the default is a deterministic fake decoder
(md5-derived features) — the Spark-side plumbing (schema, batching,
UDF signature) is real and tested, and the fake features are
oracle-reproducible in SQL.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 4

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + metadata
    struct (media_type, declared size). In production the payload comes
    from an object store via a binary-file source."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(payload).alias("declared_bytes"),
        ).alias("media_meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for an image/audio feature extractor:
    first FEATURE_DIM hex nibbles of md5(payload), scaled to [0,1]."""
    h = hashlib.md5(payload).hexdigest()
    return [int(h[i], 16) / 15.0 for i in range(FEATURE_DIM)]


def decode_media(df: DataFrame, codec: str = "fake") -> DataFrame:
    """mapInPandas decode: batches arrive as pandas DataFrames via
    Arrow; output schema is fixed. codec='real' is the integration
    point for actual media libs."""
    if codec == "real":
        raise NotImplementedError(
            "real media decode needs PIL/librosa/ffmpeg — not in this container"
        )

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["media_meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": [_fake_features(bytes(p)) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(decode, DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling plan: explode per-item frame indexes
    0, n, 2n, ... derived from metadata (here: one 'frame' per 100
    declared bytes). Pure plan — shows the explode+filter shape used to
    fan a video row out to frame rows without touching pixel data."""
    # explicit floor: Spark's double->long cast truncates but DuckDB's
    # CAST rounds — floor() agrees everywhere.
    n_frames = F.greatest(
        F.floor(F.col("media_meta.declared_bytes") / 100).cast("long"), F.lit(1)
    )
    return df.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % every_n == 0)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes_out", LongType()),
        StructField("payload_md5", StringType()),
    ]
)


def resize_media(df: DataFrame, target_w: int = 64, target_h: int = 64,
                 codec: str = "fake") -> DataFrame:
    """Arrow-batched media resize (mapInPandas): the plumbing — batch
    shape, fixed output schema, payload-stays-on-executor — is real;
    the pixel work is the integration point. codec='fake' deterministic
    stand-in: 'resized' payload = payload truncated to target_w*target_h
    bytes, reported as (width, height, n_bytes_out, md5)."""
    if codec == "real":
        raise NotImplementedError(
            "real image resize needs PIL/opencv — not in this container")
    cap = target_w * target_h

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = [bytes(p)[:cap] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "n_bytes_out": [len(p) for p in out],
                    "payload_md5": [hashlib.md5(p).hexdigest() for p in out],
                }
            )

    return df.mapInPandas(resize, RESIZED_SCHEMA)
