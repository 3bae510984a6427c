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


def test_blob_input_build_matches_text_build(spark):
    """pack_arrow_blobs + blob_col build must produce the IDENTICAL
    merged sketch as the plain text-column build (linear sketches are
    bit-equal; doc/update counts equal) — the blob layer only changes
    the wire representation of the input, never the stream."""
    import numpy as np

    from heavy_hitters_spark.core import CountMin, HLL, MultiSketch, SeedStream
    from heavy_hitters_spark.spark.fused import build_token_sketch, pack_arrow_blobs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("text").repartition(4)

    def tmpl():
        return MultiSketch({
            "cm": CountMin(width=1 << 12, depth=3, seed_stream=SeedStream(1, 2)),
            "hll": HLL(p=12),
        })

    sk_t, m_t = build_token_sketch(docs, tmpl(), text_col="text", n_hint=4)
    blobs = pack_arrow_blobs(docs, ["text"])
    assert blobs.rdd.getNumPartitions() == 4  # partition-preserving
    sk_b, m_b = build_token_sketch(blobs, tmpl(), text_col="text", n_hint=4, blob_col="blob")
    assert m_t["n_rows"] == m_b["n_rows"]
    assert m_t["n_updates"] == m_b["n_updates"]
    assert np.array_equal(sk_t["cm"].table, sk_b["cm"].table)
    assert float(sk_t["hll"].estimate()) == float(sk_b["hll"].estimate())
