"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata.

The container ships no image/audio codecs, so the *decode* kernels are
deterministic fakes (clearly marked) behind the same Arrow-batched
``mapInPandas`` plumbing a real decoder would use — schema, partitioning,
UDF signature, and batch shape are the real, tested part. Swapping in a
real decoder (PIL / torchaudio / pyav) means replacing the body of one
function per kernel and nothing else.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("media", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

def _frame_schema(id_type: T.DataType) -> T.StructType:
    """:func:`sample_frames` output; ``asset_id`` inherits the input id
    type (string asset ids are common — a hard-coded LongType would fail
    Arrow conversion for them)."""
    return T.StructType(
        [
            T.StructField("asset_id", id_type, False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )


def synthetic_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media assets (binary payload = seeded bytes)."""
    base = spark.range(n)
    payload = F.sha2(F.concat(F.lit(str(seed) + ":"), F.col("id").cast("string")), 512)
    return base.select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode(payload, "utf-8").alias("media"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.pmod(F.col("id"), F.lit(10)) * 1000).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """STUB — deterministic fake decoder. A real implementation would be
    e.g. ``PIL.Image.open(io.BytesIO(payload))``; this derives a stable
    float vector from the bytes so downstream plumbing is testable."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(assets: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Real decoder goes inside ``_fake_decode``; the mapInPandas shape —
    iterator of pandas batches in, long feature rows out — is production
    form.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(b), dim).tolist() for b in pdf["media"]]
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "feature": feats})

    return assets.select("asset_id", "media").mapInPandas(run, FEATURE_SCHEMA)


def resize_images(assets: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """STUB resize: real impl decodes + resamples; fake truncates the
    payload deterministically to width*height bytes. Plumbing (filter to
    images, batch transform, typed output) is real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            out = pdf.copy()
            out["media"] = [bytes(b)[:n] for b in pdf["media"]]
            out["width"] = width
            out["height"] = height
            yield out

    imgs = assets.filter(F.col("media_type") == "image")
    return imgs.mapInPandas(run, assets.schema)


def sample_frames(assets: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """STUB frame sampling for video rows: real impl seeks the container;
    fake emits deterministic byte slices, one row per sampled frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            # zip over columns, not iterrows — iterrows materializes a
            # Series per row (per-row Python object churn in the hot path)
            for aid, dur, media in zip(pdf["asset_id"], pdf["duration_ms"], pdf["media"]):
                if media is None:
                    continue  # no payload → no frames (row skipped, job survives)
                # duration_ms is nullable; NULL arrives as NaN in the pandas
                # batch and int(NaN) raises — treat unknown duration as one
                # sampled frame instead of failing the whole task
                n = 1 if pd.isna(dur) else min(max_frames, max(1, int(dur) // every_ms))
                blob = bytes(media)
                for i in range(n):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(blob[i * 8 : i * 8 + 8])
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    vids = assets.filter(F.col("media_type") == "video")
    return vids.select("asset_id", "duration_ms", "media").mapInPandas(
        run, _frame_schema(assets.schema["asset_id"].dataType)
    )


def content_key_dedup(
    assets: DataFrame, id_col: str = "asset_id", binary_col: str = "media"
) -> DataFrame:
    """Exact byte-identity dedup for opaque media payloads — the
    multimodal twin of ``operators.dedup.exact_dedup``: md5 over the
    binary column, min-id canonical winner per key.

    Output: ``(id_col, content_key, canonical_id, group_size)``.

    Scale shape: the payload bytes NEVER shuffle — only the id and the
    32-hex-char key move (at 100 TB of media the payload column is the
    entire dataset; hashing at the scan and exchanging keys is the only
    viable plan). One shuffle on the content key via a window, exactly
    like the text-side exact dedup.
    """
    from pyspark.sql.window import Window

    keyed = assets.select(
        F.col(id_col), F.md5(F.col(binary_col)).alias("content_key")
    )
    # NULL payload = unknown content: singleton group per asset (same
    # contract as the text-side exact_dedup) — a shared NULL partition
    # would collapse every payload-less asset into one group
    grp = F.coalesce(
        F.col("content_key"), F.concat(F.lit("null:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(grp)
    return (
        keyed.withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("group_size", F.count("*").over(w))
        .select(id_col, "content_key", "canonical_id", "group_size")
    )
