"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery is real and tested — schema contract, Arrow
batch shape, ``mapInPandas`` partition-parallel transforms — while the
actual media decode is stubbed (no image/audio libraries in this
container): ``decode_fn=None`` uses a deterministic fake decoder;
passing ``decode_fn="real"`` raises ``NotImplementedError`` where a
deployment would plug Pillow/torchaudio/PyAV.

Schema contract for a multimodal table:

    asset_id  BIGINT
    modality  STRING            ('image' | 'audio' | 'video')
    content   BINARY            (opaque encoded bytes)
    meta      STRUCT<width INT, height INT, sample_rate INT,
                     n_frames INT, format STRING>

At 100 TB these tables are stored with ``content`` in its own parquet
column (column pruning keeps metadata-only queries from touching
bytes), partitioned by modality/date, and processed with
``mapInPandas`` so each Arrow batch stays bounded
(``spark.sql.execution.arrow.maxRecordsPerBatch``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("content", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("sample_rate", IntegerType(), True),
                    StructField("n_frames", IntegerType(), True),
                    StructField("format", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha256", StringType(), True),
        StructField("feat_mean", LongType(), True),
    ]
)


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake multimodal table (testing stand-in for a real
    lake table of encoded media)."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        content = hashlib.sha256(f"asset-{i}".encode()).digest() * (
            (i % 5) + 1
        )
        meta = {
            "width": 64 + i % 512 if modality != "audio" else None,
            "height": 64 + (i * 7) % 512 if modality != "audio" else None,
            "sample_rate": 16000 if modality == "audio" else None,
            "n_frames": (i % 300) + 1 if modality == "video" else None,
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[
                modality
            ],
        }
        rows.append((i, modality, content, meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _fake_decode(content: bytes) -> dict:
    """Deterministic decode stand-in: stable hash + byte stats."""
    digest = hashlib.sha256(content or b"").hexdigest()
    mean = sum(content) // len(content) if content else 0
    return {"sha256": digest, "mean": mean}


def extract_features(df: DataFrame, decode_fn=None) -> DataFrame:
    """Partition-parallel feature extraction over Arrow batches.

    ``decode_fn=None`` -> deterministic fake decode (CI-safe).
    ``decode_fn='real'`` -> NotImplementedError marker where a real
    deployment plugs its media libraries.
    """
    if decode_fn == "real":
        raise NotImplementedError(
            "media decode requires image/audio libs not present in this "
            "environment; plug Pillow/torchaudio/PyAV here"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["content"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "content_sha256": decoded.map(lambda d: d["sha256"]),
                    "feat_mean": decoded.map(lambda d: d["mean"]),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: filters to images, would re-encode via a
    Pandas-UDF decode→resize→encode per Arrow batch. Decode is stubbed:
    content passes through, meta records the target dims (the schema /
    partition behavior is the tested contract)."""
    return df.where(F.col("modality") == "image").withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.format").alias("format"),
        ),
    )


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: explodes per-video frame indices
    (0, every_n, 2*every_n, ...) from meta.n_frames — the real decoder
    would emit one binary frame per index; here the index plumbing and
    row multiplication are the tested behavior."""
    return (
        df.where(F.col("modality") == "video")
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ),
        )
        .select("asset_id", "frame_idx", "meta")
    )


# ---------------------------------------------------------------------------
# Byte-level integrity screening (round 9) — REAL, no media libs needed
# ---------------------------------------------------------------------------

# (format, hex prefix, byte offset) — enough of the magic register to
# screen the modalities the schema contract names. mp4's brand box
# sits at offset 4 (after the box length), hence the offset field.
MAGIC_HEX: tuple[tuple[str, str, int], ...] = (
    ("png", "89504E470D0A1A0A", 0),
    ("jpeg", "FFD8FF", 0),
    ("wav", "52494646", 0),  # RIFF
    ("mp4", "66747970", 4),  # 'ftyp'
)


def sniff_format(content_col) -> "F.Column":
    """Container-format sniff from the content's magic bytes — the
    integrity primitive that does NOT trust the declared metadata
    (a mislabeled or truncated asset fails downstream decoders at the
    worst possible time: mid-training-job). Pure codegen: one hex()
    of the prefix and a CASE over the magic register; 'unknown' when
    nothing matches."""
    col = F.col(content_col) if isinstance(content_col, str) else content_col
    h = F.hex(col)
    out = F.lit("unknown")
    for fmt, prefix, off in reversed(MAGIC_HEX):
        out = F.when(
            F.substring(h, 2 * off + 1, len(prefix)) == F.lit(prefix),
            F.lit(fmt),
        ).otherwise(out)
    return out


def content_integrity(df: DataFrame) -> DataFrame:
    """Integrity report per asset: byte size, sniffed container format,
    the declared format, and a mismatch flag (sniffed != declared,
    with 'unknown' counting as a mismatch whenever a format IS
    declared — a declared-png asset whose bytes don't open with the
    png magic is exactly the corruption this screen exists to catch).
    All codegen; content bytes are read once for the hex prefix."""
    sniffed = sniff_format("content")
    declared = F.col("meta.format")
    return df.select(
        "asset_id",
        "modality",
        F.length("content").cast("bigint").alias("n_bytes"),
        sniffed.alias("sniffed_format"),
        declared.alias("declared_format"),
        (
            declared.isNotNull() & (sniffed != F.coalesce(declared, F.lit("")))
        ).alias("format_mismatch"),
    )


ENTROPY_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("entropy_bits", StringType(), True),
        StructField("zero_frac", StringType(), True),
    ]
)


def byte_entropy(df: DataFrame) -> DataFrame:
    """Shannon entropy (bits/byte) + zero-byte fraction per asset via
    Arrow-batched numpy — the truncation/padding screen: a zero-filled
    or constant-padded asset shows near-zero entropy, an encrypted or
    well-compressed one sits near 8. Values are returned as repr()
    strings so the cross-engine float-hash question never arises (the
    pytest differential recomputes them bit-exactly in pure Python).
    Vectorized np.bincount per asset; content crosses the Arrow
    boundary once."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ents, zfs, sizes = [], [], []
            for b in pdf["content"]:
                if b is None or len(b) == 0:
                    sizes.append(0)
                    ents.append(repr(0.0))
                    zfs.append(repr(0.0))
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                counts = np.bincount(arr, minlength=256)
                p = counts[counts > 0] / float(len(arr))
                ent = float(-(p * np.log2(p)).sum())
                sizes.append(len(arr))
                ents.append(repr(ent))
                zfs.append(repr(float(counts[0]) / float(len(arr))))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": sizes,
                    "entropy_bits": ents,
                    "zero_frac": zfs,
                }
            )

    return df.select("asset_id", "content").mapInPandas(
        batches, schema=ENTROPY_SCHEMA
    )
