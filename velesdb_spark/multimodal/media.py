"""Multimodal (image/audio/video) column plumbing.

Design for 100 TB of media:
- media rows carry (id, modality, content BINARY, meta STRUCT) — content
  stays opaque to Catalyst; filters/joins run on the typed metadata columns
  so partition pruning and predicate pushdown never touch bytes.
- decode/feature-extract runs in ``mapInPandas`` (Arrow batches, one Python
  worker per core); batch size is bounded by
  spark.sql.execution.arrow.maxRecordsPerBatch so executor memory holds
  decoded frames for one batch only.
- repartition BEFORE the decode stage to spread large objects; never
  collect() binaries to the driver.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("modality", StringType()),      # image | audio | video
    StructField("content", BinaryType()),       # opaque encoded bytes
    StructField("meta", StructType([
        StructField("format", StringType()),    # png/jpeg/wav/mp4/...
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", LongType()),
    ])),
])

FEATURES_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("modality", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("n_bytes", LongType()),
])

# modality → bytes → list[float]  (register real decoders here)
DECODERS: dict[str, Callable[[bytes, dict], list[float]]] = {}


def register_decoder(modality: str, fn: Callable[[bytes, dict], list[float]]) -> None:
    DECODERS[modality] = fn


def fake_image_decoder(content: bytes, meta: dict) -> list[float]:
    """Deterministic stand-in for a real decoder: 16-dim feature derived from
    an md5 digest of the bytes (so pipelines are testable without PIL).
    Replace via register_decoder('image', real_fn)."""
    digest = hashlib.md5(content or b"").digest()
    return [b / 255.0 for b in digest]


def _decoder_for(modality: str) -> Callable[[bytes, dict], list[float]]:
    if modality in DECODERS:
        return DECODERS[modality]
    if modality == "image":
        return fake_image_decoder
    raise NotImplementedError(
        f"no decoder registered for modality {modality!r} — media libraries "
        "are not available in this container; register_decoder() a real one")


def media_table(spark, rows) -> DataFrame:
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_and_featurize(media: DataFrame, batch_partitions: int | None = None) -> DataFrame:
    """content → feature vector via Arrow-batched mapInPandas."""
    if batch_partitions:
        media = media.repartition(batch_partitions)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats, nbytes = [], []
            for _, row in pdf.iterrows():
                dec = _decoder_for(row["modality"])
                content = row["content"] if row["content"] is not None else b""
                feats.append(dec(bytes(content), {}))
                nbytes.append(len(content))
            yield pd.DataFrame({
                "id": pdf["id"], "modality": pdf["modality"],
                "feature": feats, "n_bytes": nbytes,
            })

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → sampled frame timestamps (plumbing: one output row per
    sampled frame; the actual frame decode is the stubbed step). Native
    sequence() keeps the fan-out JVM-side."""
    video = media.filter(F.col("modality") == "video")
    return (
        video.select(
            "id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                           F.lit(every_ms))).alias("frame_ms"))
    )


def resize_meta(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Compute target resize dims from metadata (pure column arithmetic —
    the byte-level resize is decoder work)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(F.greatest(w, h) > max_side,
                   max_side / F.greatest(w, h).cast("double")).otherwise(F.lit(1.0))
    return media.select(
        "id", "modality",
        F.round(w * scale).cast("long").alias("target_width"),
        F.round(h * scale).cast("long").alias("target_height"))
