"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing) is real and tested; the actual codec calls are
STUBBED because no image/audio libraries exist in this container — each stub
is deterministic (seeded from the payload hash) so tests are reproducible,
and raises/flags clearly where a real decoder would plug in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, modality string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id string, modality string, ok boolean, error string, "
    "feature array<float>, n_bytes int"
)


def _fake_decode(payload: bytes, modality: str, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+featurizer.

    REAL IMPLEMENTATION WOULD: decode payload (PIL/ffmpeg/soundfile),
    resize/frame-sample, run a feature extractor. Here: a seeded projection
    of the payload hash — stable across runs and partitions.
    """
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**31)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_media_features(
    media: DataFrame, dim: int = 32, batch_hint: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow moves the binary payloads in columnar batches; per-batch numpy work
    is vectorized over the batch. Partition sizing guidance: keep
    spark.sql.files.maxPartitionBytes low enough that a partition of
    payloads fits executor memory (binaries do not split mid-row).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, errs, sizes = [], [], [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    feats.append(_fake_decode(bytes(payload), modality, dim).tolist())
                    oks.append(True)
                    errs.append(None)
                    sizes.append(len(payload))
                except Exception as e:  # noqa: BLE001 - per-row error capture
                    feats.append(None)
                    oks.append(False)
                    errs.append(str(e))
                    sizes.append(0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "ok": oks,
                    "error": errs,
                    "feature": feats,
                    "n_bytes": sizes,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per planned frame timestamp
    (duration-driven, no decode). A real pipeline feeds these (media_id,
    frame_ts_ms) rows to the decoder stage."""
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table in MEDIA_SCHEMA shape for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, 128, dtype=np.uint8))
        rows.append(
            (
                f"m{i:04d}", modality, bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                int(rng.integers(16, 512)) if modality == "image" else None,
                int(rng.integers(16, 512)) if modality == "image" else None,
                int(rng.integers(1000, 60000)) if modality != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
