"""Fused tokenize->hash->sketch path must be byte-identical to the
exploded Catalyst path (same xxhash64 ids, same seeds)."""

import numpy as np

from heavy_hitters_spark.core import CountMin, HLL, MultiSketch, SeedStream
from heavy_hitters_spark.spark import build_sketch, key_id_col, tokens
from heavy_hitters_spark.spark.fused import build_token_sketch


def _tmpl():
    return MultiSketch(
        {
            "cm": CountMin(width=1 << 12, depth=5, seed_stream=SeedStream(1, 2)),
            "hll": HLL(p=12),
        }
    )


def test_fused_equals_explode(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fused, m1 = build_token_sketch(docs, _tmpl(), text_col="text")
    ids = tokens(docs).withColumn("id", key_id_col("token"))
    exploded, m2 = build_sketch(ids, _tmpl(), id_col="id")
    assert fused.to_bytes() == exploded.to_bytes()
    assert m1["n_updates"] == m2["n_updates"]


def test_fused_partition_invariance(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a, _ = build_token_sketch(docs.repartition(3), _tmpl(), text_col="text")
    b, _ = build_token_sketch(docs.repartition(11), _tmpl(), text_col="text")
    assert a.to_bytes() == b.to_bytes()
