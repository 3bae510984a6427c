"""Evaluation harness: the reference's statistical test discipline
(precision.sh / delta.sh grids, scaled down) run through the library's
own distributed build path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from heavy_hitters_spark.core import CountMin, CountSketch, SeedStream
from heavy_hitters_spark.eval import (
    hh_precision_recall,
    sketch_violation_rate,
    tail_error_quantile,
)
from heavy_hitters_spark.hh import DyadicHH
from heavy_hitters_spark.spark import build_sketch


@pytest.fixture(scope="module")
def zipf_df(spark):
    """zipf_stream fixture mirror (FIXTURES.md §4, scaled)."""
    rng = np.random.default_rng(11)
    data = (rng.zipf(1.3, 1 << 17) % (1 << 16)).astype(np.int64)
    return spark.createDataFrame([(int(x),) for x in data], "id long").repartition(8)


def test_hh_precision_recall_perfect(spark, zipf_df):
    phi, eps = 0.02, 0.01
    hh = DyadicHH(phi=phi, epsilon=eps, delta=0.05, m=(1 << 16) - 1, gran=4,
                  seed_stream=SeedStream(1, 2))
    merged, _ = build_sketch(zipf_df, hh, id_col="id")
    reported = [i for i, _ in merged.query()]
    row = hh_precision_recall(spark, zipf_df, reported, phi, eps).collect()[0]
    assert row["recall"] == 1.0          # reference target: full recall
    assert row["errors"] == 0            # nothing below (phi-eps)*L1
    assert row["precision"] == 1.0


def test_cm_violation_rate_under_delta(spark, zipf_df):
    eps, delta = 1 / 512, 0.05
    cm = CountMin(epsilon=eps, delta=delta, b=4, seed_stream=SeedStream(1, 2))
    merged, _ = build_sketch(zipf_df, cm, id_col="id")
    row = sketch_violation_rate(spark, zipf_df, merged, eps).collect()[0]
    assert row["rate_l1"] <= delta


def test_cs_violation_rate_l2(spark, zipf_df):
    eps, delta = 1 / 64, 0.1
    cs = CountSketch(epsilon=eps, delta=delta, b=4, seed_stream=SeedStream(1, 2))
    merged, _ = build_sketch(zipf_df, cs, id_col="id")
    row = sketch_violation_rate(spark, zipf_df, merged, eps).collect()[0]
    assert row["rate_l2"] <= delta


def test_tail_error(spark, zipf_df):
    eps, delta = 1 / 512, 0.05
    cm = CountMin(epsilon=eps, delta=delta, b=4, seed_stream=SeedStream(1, 2))
    merged, _ = build_sketch(zipf_df, cm, id_col="id")
    row = tail_error_quantile(spark, zipf_df, merged, delta).collect()[0]
    # (1-delta)-quantile of error within the eps*L1 guarantee
    assert row["tail_err"] <= eps * merged.norm


def test_ann_recall_scores_missed_queries_zero(spark):
    """eval.ann_recall: per-query hit counts vs the exact ranking; a
    query the index missed entirely must score 0, not vanish."""
    from heavy_hitters_spark.eval import ann_recall

    exact = spark.createDataFrame(
        [(q, i) for q in (0, 1) for i in range(10)], "query_id long, vec_id long"
    )
    approx = spark.createDataFrame(
        [(0, i) for i in range(5)] + [(0, 99)], "query_id long, vec_id long"
    )
    rows = ann_recall(exact, approx, k=10).collect()
    assert [(r["query_id"], r["n_hits"], r["recall_at_10"]) for r in rows] == [
        (0, 5, 0.5),
        (1, 0, 0.0),
    ]
