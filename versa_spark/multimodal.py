"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The container has no codec libraries, so the decode kernels are STUBS
(clearly marked; ``fake=True`` switches in a deterministic fake for tests)
— but the Spark-side plumbing is real: schemas, Arrow batch shapes,
``mapInPandas`` signatures, partition sizing.  At 100 TB the binary column
dominates I/O, so every helper keeps column pruning intact (metadata-only
paths never touch the payload column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image|audio|video
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
    StructField("payload", BinaryType(), True),      # opaque bytes
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("feature", ArrayType(FloatType()), True),
    StructField("n_bytes", IntegerType(), False),
])


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table: payload = repeatable byte pattern
    keyed by media_id (pure column expressions)."""
    kinds = F.element_at(F.array(F.lit("image"), F.lit("audio"),
                                 F.lit("video")),
                         (F.col("id") % 3 + 1).cast("int"))
    payload = F.encode(
        F.concat(F.lit("payload-"), F.col("id").cast("string"),
                 F.lit("-"), F.repeat(F.lit("x"),
                                      (F.col("id") % 64 + 16).cast("int"))),
        "utf-8")
    return spark.range(n).select(
        F.col("id").alias("media_id"), kinds.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kinds).alias("mime"),
        ((F.col("id") % 8 + 1) * 64).cast("int").alias("width"),
        ((F.col("id") % 4 + 1) * 64).cast("int").alias("height"),
        (F.col("id") * 100).cast("int").alias("duration_ms"),
        payload.alias("payload"))


def decode_image(payload: bytes):
    """STUB — image decode requires a codec library not present in this
    environment. The real implementation would return an HxWx3 uint8
    array."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not available in this container")


def _fake_feature(payload: bytes, dim: int = 8):
    """Deterministic stand-in for a decoded-media feature vector: byte
    histogram folded to `dim` buckets, L1-normalized."""
    import numpy as np
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    total = hist.sum()
    return [float(x) for x in (hist / total if total else hist)]


def extract_features(media: DataFrame, dim: int = 8,
                     fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over media batches.  The batch shape
    (iterator of pdf with binary column) and output schema are the real
    production plumbing; only the per-payload kernel is stubbed/faked."""
    def _batches(pdf_iter):
        import pandas as pd
        for pdf in pdf_iter:
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                raw = b"" if payload is None else bytes(payload)
                nbytes.append(len(raw))
                if fake:
                    feats.append(_fake_feature(raw, dim))
                else:
                    feats.append(decode_image(raw))  # pragma: no cover
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "n_bytes": nbytes,
            })

    from versa_spark.shipping import ensure_shipped
    ensure_shipped(media.sparkSession)
    return media.mapInPandas(_batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: (media_id, frame_ts_ms) rows —
    pure expressions (sequence + explode); the decode of each frame is the
    stubbed kernel.  Metadata-only: never reads the payload column."""
    return (media.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata rollup (column pruning: payload never scanned)."""
    return (media.groupBy("kind")
            .agg(F.count("*").alias("n"),
                 F.avg("width").alias("avg_width"),
                 F.avg("duration_ms").alias("avg_duration_ms")))
