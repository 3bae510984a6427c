"""Query API vs exact Spark oracles on the synthesized pages table and
the driver-provided testdata (precision_hh.c:641-706 metric definitions:
recall on >= phi*L1, zero reported below (phi-eps)*L1)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from heavy_hitters_spark.core import CountMin, MisraGries, SeedStream
from heavy_hitters_spark.io import pages_df
from heavy_hitters_spark.queries import (
    distinct_tokens_hll,
    phi_heavy_tokens,
    phi_heavy_users,
    point_freq_tokens,
    quantiles_events_value,
    range_count_users,
    topk_tokens,
)
from heavy_hitters_spark.spark import build_sketch, key_id, key_id_col, tokens

SF = "/root/testdata/sf0.001"


def test_topk_tokens_matches_exact(spark):
    got = [(r["token"], r["freq"]) for r in topk_tokens(spark, SF, k=10).collect()]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = [
        (r["token"], r["freq"])
        for r in tokens(docs)
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(10)
        .collect()
    ]
    assert got == exact


def test_phi_heavy_tokens_matches_exact(spark):
    got = {(r["token"], r["freq"]) for r in phi_heavy_tokens(spark, SF, phi=0.02).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tok = tokens(docs)
    total = tok.count()
    exact = {
        (r["token"], r["freq"])
        for r in tok.groupBy("token")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= 0.02 * total)
        .collect()
    }
    assert got == exact


def test_phi_heavy_users_recall_and_precision(spark):
    phi = 0.005
    got = {r["user_id"]: r["freq"] for r in phi_heavy_users(spark, SF, phi=phi).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    total = ev.count()
    exact = {
        r["user_id"]: r["cnt"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    heavy = {u for u, c in exact.items() if c >= phi * total}
    assert set(got) == heavy  # exact-verify pass makes it exactly the heavy set
    assert all(got[u] == exact[u] for u in got)


def test_point_freq_upper_bounds(spark):
    rows = point_freq_tokens(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {
        r["token"]: r["cnt"]
        for r in tokens(docs).groupBy("token").agg(F.count("*").alias("cnt")).collect()
    }
    for r in rows:
        assert r["est_freq"] >= exact.get(r["token"], 0)


def test_hll_distinct_close(spark):
    est = distinct_tokens_hll(spark, SF).collect()[0]["distinct_est"]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = tokens(docs).select("token").distinct().count()
    assert abs(est - exact) / exact < 0.15


def test_kll_quantiles_close(spark):
    rows = quantiles_events_value(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    vals = np.array([r["value"] for r in ev.select("value").collect()])
    for r in rows:
        exact = np.quantile(vals, r["q"])
        assert abs(r["value_est"] - exact) <= 0.05 * (vals.max() - vals.min()) + 0.05


def test_range_count_close(spark):
    row = range_count_users(spark, SF, lo=10, hi=59).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = ev.where(F.col("user_id").between(10, 59)).count()
    total = ev.count()
    assert abs(row["range_est"] - exact) <= 0.01 * total + 1


def test_pages_phi_hh_end_to_end(spark):
    """Full pipeline on the canonical input_hint table: tokens of the
    synthesized pages, sketch candidates + exact verify vs groupBy."""
    pages = pages_df(spark, 3000, partitions=16)
    tok = tokens(pages).withColumn("id", key_id_col("token"))
    tok.cache()
    total = tok.count()
    phi = 0.01
    mg, _ = build_sketch(tok, MisraGries(k=4096), id_col="id")
    cand_df = spark.createDataFrame([(int(i),) for i, _ in mg.candidates()], "id long")
    got = {
        (r["token"], r["freq"])
        for r in tok.join(F.broadcast(cand_df), "id")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= phi * total)
        .collect()
    }
    exact = {
        (r["token"], r["freq"])
        for r in tok.groupBy("token")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= phi * total)
        .collect()
    }
    assert got == exact and len(got) > 0
    tok.unpersist()


def test_mg_exact_topk_certificate_on_ties(spark):
    """Tie-heavy data: MG _shrink can leave zero candidates while
    decrement > 0 — the decrement-based certificate must fall back to
    the exact plan instead of silently returning a wrong 'exact' top-k
    (a len(candidates)-based gate would not)."""
    import numpy as np

    from heavy_hitters_spark.core import MisraGries
    from heavy_hitters_spark.queries import _mg_exact_topk
    from heavy_hitters_spark.spark import key_id_col

    rows = [(f"k{i % 50}",) for i in range(500)]  # 50 keys, 10 each (all tied)
    df = spark.createDataFrame(rows, "token string").withColumn("id", key_id_col("token"))
    mg = MisraGries(k=4)
    ids = np.array([r["id"] for r in df.collect()], dtype=np.uint64)
    mg.update_batch(ids)
    got = _mg_exact_topk(df, mg, "token", 5).collect()
    exact = (
        df.groupBy("token").count().orderBy(F.desc("count"), F.asc("token")).limit(5).collect()
    )
    assert [(r["token"], r["freq"]) for r in got] == [(r["token"], r["count"]) for r in exact]
