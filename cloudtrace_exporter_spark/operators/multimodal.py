"""Multimodal column handling (SURVEY §2 B36 + driver north_star).

Contract: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside. The Spark-side plumbing — schema,
partition sizing, Arrow batch shape, mapInPandas signatures — is real and
tested; the actual codec calls are STUBBED (the decode libraries are not
in this container): ``decode_stub_features`` produces deterministic fake
features derived from the bytes, and ``decode_real`` raises
NotImplementedError where Pillow/ffmpeg would plug in.

Scale notes: binary payloads dominate row size, so (1) metadata-only
queries must never read the blob column (parquet column pruning does this
when the blob is a separate column — verified in tests via ReadSchema),
(2) mapInPandas processes Arrow batches, and
``spark.sql.files.maxPartitionBytes`` (set in session.py) keeps
blob-heavy scan partitions bounded; for row-group-level control at real
scale, write blobs with small parquet row groups.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media metadata carried next to every blob column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|mp4...
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),  # images/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),  # audio/video
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)

#: magic-byte prefixes for format sniffing (public file signatures)
_MAGIC = {
    "89504e47": "png",
    "ffd8ff": "jpeg",
    "52494646": "wav_or_avi",
    "00000018": "mp4",
    "00000020": "mp4",
}


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: synthesize a deterministic binary payload + metadata
    struct from the documents table (no media fixtures exist in the
    container; UTF-8 bytes stand in for encoded media so the plumbing is
    end-to-end real)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("raw").alias("format"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def sniff_format(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Magic-byte format sniff over the first 4 bytes — built-ins only
    (hex + substring), no blob decode."""
    prefix = F.lower(F.hex(F.substring(F.col(payload_col), 1, 4)))
    expr = F.lit("unknown")
    for magic, fmt in _MAGIC.items():
        expr = F.when(prefix.startswith(magic), F.lit(fmt)).otherwise(expr)
    return df.withColumn("sniffed_format", expr)


def decode_stub_features(df: DataFrame, *, n_features: int = 8) -> DataFrame:
    """mapInPandas feature extraction with a STUBBED decoder.

    Real pipeline shape: Arrow batches in → per-row decode → fixed-size
    feature vector out. The stub derives deterministic pseudo-features
    from byte statistics (so tests can assert exact values); swap
    ``_stub_feature`` for a Pillow/torchvision call on a cluster with the
    libs installed. The UDF touches only (doc_id, payload) — column
    pruning keeps every other column out of the Arrow transfer.
    """

    def _stub_feature(buf: bytes) -> list[float]:
        if not buf:
            return [0.0] * n_features
        # deterministic byte-statistics "embedding" (mean/spread per stride)
        out = []
        for i in range(n_features):
            stride = buf[i::n_features]
            out.append(round(sum(stride) / max(len(stride), 1) / 255.0, 6))
        return out

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_meta"].map(
                        lambda m: m["media_type"] if m is not None else None
                    ),
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["payload"].map(_stub_feature),
                }
            )

    return df.select("doc_id", "payload", "media_meta").mapInPandas(_extract, FEATURE_SCHEMA)


def decode_real(df: DataFrame) -> DataFrame:
    """Where the real decoder plugs in (Pillow / torchaudio / ffmpeg).

    Not available in this container — the Spark-side contract is
    decode_stub_features; this function documents the swap point.
    """
    raise NotImplementedError(
        "media codecs are not installed in this environment; use "
        "decode_stub_features for the tested plumbing and swap in the real "
        "decoder on a cluster with the media libraries"
    )


def resize_stub(df: DataFrame, *, width: int, height: int) -> DataFrame:
    """Resize stub: updates metadata (the real op would transform bytes).
    Kept as a narrow column op so pipelines can chain it today."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.col("media_meta.media_type").alias("media_type"),
            F.col("media_meta.format").alias("format"),
            F.col("media_meta.n_bytes").alias("n_bytes"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("media_meta.duration_ms").alias("duration_ms"),
        ),
    )


def frame_sample_stub(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stub for video rows: explodes deterministic frame
    offsets from duration metadata (real impl would emit one blob per
    frame via mapInPandas). Demonstrates the explode/partitioning shape:
    output rows ≈ duration/every_ms × input rows — repartition after."""
    n_frames = F.greatest(
        (F.coalesce(F.col("media_meta.duration_ms"), F.lit(0)) / every_ms).cast("int"), F.lit(1)
    )
    return df.withColumn(
        "frame_offset_ms",
        F.explode(F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)),
    )
