"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batch iteration, partitioning, UDF
signatures) is real and tested; the codec step is STUBBED because
image/audio libraries are not available in this container — the
``decoder=`` hook takes any ``bytes -> np.ndarray`` callable, the
default raises ``NotImplementedError``, and ``fake_decoder`` provides a
deterministic stand-in used by the tests so the full pipeline shape
(decode -> feature-extract -> resize/frame-sample) is exercised.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("sample_rate", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_intensity", DoubleType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def real_decoder(payload: bytes) -> np.ndarray:  # pragma: no cover - stub
    """Codec decode. STUB: PIL/ffmpeg are not in this container."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; pass decoder= "
        "(e.g. PIL.Image.open + np.asarray) in production"
    )


def fake_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: interpret payload bytes as a uint8 raster."""
    a = np.frombuffer(payload, dtype=np.uint8)
    side = max(1, int(np.sqrt(len(a))))
    return a[: side * side].reshape(side, side)


def synth_media_df(spark, n_rows: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for pipeline tests."""
    from ..core.hashing import splitmix64

    ids = np.arange(n_rows, dtype=np.uint64)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in ids:
        h = int(splitmix64(np.array([i], dtype=np.uint64), seed)[0])
        kind = kinds[h % 3]
        size = 64 + (h >> 3) % 192
        payload = bytes(bytearray(((h >> (j % 48)) + j) % 256 for j in range(size)))
        rows.append(
            (int(i), kind, payload, size, size, (h % 30) + 1, 16000)
        )
    # Parallelize with an EXPLICIT slice count: createDataFrame slices
    # tiny local collections into defaultParallelism partitions (32 at
    # local[32]) and each created slice costs ~200 ms in this sandbox
    # even when later coalesced into fewer tasks (measured round 5:
    # 32-slice + coalesce(8) = ~1.3 s, + coalesce(1) = ~7 s, explicit
    # 1-8 slices = ~0.4 s for the full media_features query). The
    # round-4 coalesce(8) only treated the task count, not the slice
    # count, which is why the query's wall stayed 1.5-2.5x its r3
    # baseline and kept tripping the regression gate.
    n_slices = max(1, min(8, n_rows))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), MEDIA_SCHEMA
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = real_decoder,
    feature_dim: int = 8,
) -> DataFrame:
    """decode -> downsample ("resize"/frame-sample) -> fixed-dim feature
    vector, one Arrow batch at a time. The batch shape (one output row
    per input row, bounded memory per batch) is the production contract."""

    def fn(batches):
        from ..core import memtune  # noqa: F401

        def featurize(payload: bytes) -> tuple[float, list[float]]:
            # decode is inherently per-row (opaque codec); everything
            # around it is numpy over the decoded raster
            flat = decoder(payload).astype(np.float64).ravel()
            pads = (-len(flat)) % feature_dim  # "resize": average-pool
            if pads:
                flat = np.pad(flat, (0, pads))
            return float(flat.mean()), flat.reshape(feature_dim, -1).mean(axis=1).tolist()

        for pdf in batches:
            payloads = pdf["payload"]
            feats = [featurize(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": payloads.map(len).to_numpy(),
                    "mean_intensity": np.array([m for m, _ in feats]),
                    "feature": [f for _, f in feats],
                }
            )

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index
    (codec-free — indices only; decode is the stubbed step)."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
