"""Evaluation harnesses mirroring the reference's three experiment
binaries (SURVEY.md §2.9) as library functions returning DataFrames:

- ``hh_precision_recall``  <- src/precision_hh.c:641-706: recall =
  |reported ∩ exact| / |exact| over items >= phi*L1; precision =
  |reported ∩ allowed| / |reported| with allowed = items >= (phi-eps)*L1;
  errors = reported items outside the allowed set
- ``sketch_violation_rate`` <- src/precision_sketch.c:273-308: fraction
  of probed universe with |est - exact| > eps*L1 (and > eps*L2); the
  (eps, delta) guarantee demands <= delta
- ``tail_error_quantile``  <- src/error_sketch.c:279-326: the
  (1-delta)-quantile of |est - exact| over the universe

Ground truth is an exact groupBy (the Spark analog of the reference's
exact counter arrays / generator headers).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _exact_freqs(ids_df: DataFrame, id_col: str, weight_col: str | None) -> dict[int, int]:
    agg = (
        ids_df.groupBy(id_col).agg(F.sum(weight_col).alias("f"))
        if weight_col
        else ids_df.groupBy(id_col).agg(F.count("*").alias("f"))
    )
    return {r[id_col]: r["f"] for r in agg.collect()}


def hh_precision_recall(
    spark: SparkSession,
    ids_df: DataFrame,
    reported: list[int],
    phi: float,
    epsilon: float,
    id_col: str = "id",
    weight_col: str | None = None,
) -> DataFrame:
    """One-row DataFrame (recall, precision, errors, n_exact,
    n_reported) with the reference's exact definitions."""
    freqs = _exact_freqs(ids_df, id_col, weight_col)
    l1 = sum(freqs.values())
    exact = {i for i, f in freqs.items() if f >= phi * l1}
    allowed = {i for i, f in freqs.items() if f >= (phi - epsilon) * l1}
    rep = set(int(r) for r in reported)
    recalled = rep & exact
    errors = rep - allowed
    recall = len(recalled) / len(exact) if exact else 1.0
    precision = (len(rep & allowed) / len(rep)) if rep else 1.0
    return spark.createDataFrame(
        [(float(recall), float(precision), len(errors), len(exact), len(rep))],
        "recall double, precision double, errors long, n_exact long, n_reported long",
    )


def ann_recall(exact: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """Per-query recall@k of an approximate ANN result vs the exact
    ranking: (query_id, n_hits, recall_at_k), one row per query_id in
    the EXACT result (a query the approximate index missed entirely
    scores 0, not absent). Distributed: a key join on (query_id,
    vec_id) — both sides are top-k lists, k rows per query, so the join
    is broadcast-sized no matter how large the corpus behind it was."""
    ex = exact.select("query_id", "vec_id")
    ap = approx.select("query_id", "vec_id")
    hits = (
        ex.join(ap, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("h"))
    )
    return (
        ex.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(F.coalesce(F.col("h"), F.lit(0)) / F.lit(float(k)), 6).alias(
                f"recall_at_{k}"
            ),
        )
        .orderBy("query_id")
    )


def sketch_violation_rate(
    spark: SparkSession,
    ids_df: DataFrame,
    sketch,
    epsilon: float,
    id_col: str = "id",
    weight_col: str | None = None,
    probe_universe: np.ndarray | None = None,
) -> DataFrame:
    """Fraction of the (probed) universe violating |est-exact| <= eps*L1
    and <= eps*L2; the guarantee demands rate_l1 <= delta for CM (L1
    bound) resp. rate_l2 <= delta for Count-Sketch (L2 bound)."""
    freqs = _exact_freqs(ids_df, id_col, weight_col)
    if probe_universe is None:
        probe_universe = np.array(sorted(freqs), dtype=np.uint64)
    exact = np.array([freqs.get(int(i), 0) for i in probe_universe], dtype=np.int64)
    l1 = float(sum(freqs.values()))
    l2 = float(np.sqrt(sum(f * f for f in freqs.values())))
    est = sketch.point(probe_universe)
    err = np.abs(est - exact)
    return spark.createDataFrame(
        [
            (
                float((err > epsilon * l1).mean()),
                float((err > epsilon * l2).mean()),
                int(len(probe_universe)),
                l1,
                l2,
            )
        ],
        "rate_l1 double, rate_l2 double, n_probed long, l1 double, l2 double",
    )


def tail_error_quantile(
    spark: SparkSession,
    ids_df: DataFrame,
    sketch,
    delta: float,
    id_col: str = "id",
    weight_col: str | None = None,
) -> DataFrame:
    """(1-delta)-quantile of absolute error over the observed universe
    (error_sketch.c sorts abs errors and indexes at (1-delta)*N)."""
    freqs = _exact_freqs(ids_df, id_col, weight_col)
    universe = np.array(sorted(freqs), dtype=np.uint64)
    exact = np.array([freqs[int(i)] for i in universe], dtype=np.int64)
    err = np.sort(np.abs(sketch.point(universe) - exact))
    q = float(err[min(int((1 - delta) * len(err)), len(err) - 1)])
    return spark.createDataFrame(
        [(q, float(err.max()), float(err.mean()))],
        "tail_err double, max_err double, mean_err double",
    )
