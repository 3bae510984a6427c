"""Synthetic stream generators mirroring the reference's dataset
generators (SURVEY.md §2.8), index-seeded and partition-invariant:

- ``zipf_stream_df``     <- datasets/Zipfian/src/zipfian.c: N mass
  points with Zipf(alpha) weights over universe m; inverse-CDF sampling
  (equivalent in law to the Walker alias method, alias.c:15-101); ids
  spread over the universe by a seeded affine remap (zipfian.c:156-161's
  shuffle analog)
- ``weighted_stream_df`` <- datasets/Weighted/src/weighted.c:131-140:
  item i carries weight proportional to (i+1)

Exact ground truth comes from ``truth_df`` (groupBy), the analog of the
generator's '#id: freq' header (zipfian.c:190-194).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..core.hashing import splitmix64

STREAM_SCHEMA = StructType([StructField("item", LongType())])


def zipf_stream_df(
    spark: SparkSession,
    n_draws: int,
    n_mass: int = 1 << 20,
    universe: int = (1 << 32) - 1,
    alpha: float = 1.0,
    seed: int = 4242,
    partitions: int | None = None,
) -> DataFrame:
    w = 1.0 / np.power(np.arange(1, n_mass + 1, dtype=np.float64), alpha)
    cdf = np.cumsum(w) / w.sum()
    # seeded odd multiplier spreads rank ids over the universe
    a = int(splitmix64(np.array([1], dtype=np.uint64), seed)[0]) | 1

    def gen(batches):
        from ..core import memtune  # noqa: F401

        for pdf in batches:
            idx = pdf["id"].to_numpy().astype(np.uint64)
            u = splitmix64(idx, seed + 7).astype(np.float64) / 1.8446744073709552e19
            rank = np.searchsorted(cdf, u).astype(np.uint64)
            item = (np.uint64(a) * rank) % np.uint64(universe + 1)
            yield pd.DataFrame({"item": item.astype(np.int64)})

    return spark.range(n_draws, numPartitions=partitions).mapInPandas(gen, STREAM_SCHEMA)


def weighted_stream_df(
    spark: SparkSession, n_items: int, partitions: int | None = None
) -> DataFrame:
    """(item, weight) rows with weight = item+1 (linear weights)."""
    return spark.range(n_items, numPartitions=partitions).select(
        F.col("id").alias("item"), (F.col("id") + 1).alias("weight")
    )


def truth_df(stream: DataFrame, item_col: str = "item", weight_col: str | None = None) -> DataFrame:
    """Exact frequency sidecar (the generator-header analog)."""
    if weight_col:
        return stream.groupBy(item_col).agg(F.sum(weight_col).alias("freq"))
    return stream.groupBy(item_col).agg(F.count("*").alias("freq"))
