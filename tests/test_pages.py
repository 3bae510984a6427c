"""pages synthesizer contracts (FIXTURES.md §1 / BASELINE.json
input_hint): schema, determinism across partitionings, and the per-row
invariant extract(html) == text, byte-identical per url."""

import pytest
from pyspark.sql import functions as F

from heavy_hitters_spark.io import extract_text_col, pages_df
from heavy_hitters_spark.io.pages import extract_text_py


@pytest.fixture(scope="module")
def pages(spark):
    df = pages_df(spark, 1500, partitions=8)
    df.cache()
    df.count()
    return df


def test_schema(pages):
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    kinds = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert kinds["html"] == "binary" and kinds["warc_ts"] == "timestamp"


def test_urls_unique(pages):
    assert pages.select("url").distinct().count() == pages.count()


def test_extract_invariant_vectorized(pages):
    bad = pages.withColumn("ex", extract_text_col(F.col("html"))).where(
        F.col("ex") != F.col("text")
    )
    assert bad.count() == 0


def test_extract_invariant_bytes(pages):
    for r in pages.limit(20).collect():
        assert extract_text_py(r["html"]) == r["text"]
        assert extract_text_py(r["html"]).encode("utf-8") in r["html"].replace(
            b"</p><p>", b"\n\n"
        )


def test_partition_invariance(spark, pages):
    again = pages_df(spark, 1500, partitions=3)
    a = sorted((r["url"], r["text"], r["lang"]) for r in pages.collect())
    b = sorted((r["url"], r["text"], r["lang"]) for r in again.collect())
    assert a == b


def test_zipf_hosts_skewed(pages):
    top = (
        pages.select(F.parse_url("url", F.lit("HOST")).alias("host"))
        .groupBy("host")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .collect()[0]
    )
    assert top["host"] == "h0.example.org"  # Zipf rank 1
    assert top["count"] > 1500 * 0.05
