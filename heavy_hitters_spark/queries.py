"""User-facing query API (SURVEY.md §7 step 5).

Two families:

**Hybrid sketch→exact queries** (deterministic, oracle-checkable):
the sketch pass scans once and produces a SMALL candidate set with a
recall guarantee; a second exact pass — filtered to candidates via a
broadcast join — rescopes counts exactly and applies the exact
threshold/top-k. The output equals the all-exact answer whenever the
sketch's recall certificate holds, and each function *checks* the
certificate and falls back to the exact plan if it doesn't. At 100 TB
this is the production shape: pass 1 is map-side-only (fixed-size
states, no shuffle of raw updates), pass 2 shuffles only candidate-key
rows.

**Sketch-estimate queries** (approximate, bounds-checked in tests):
point frequency, HLL distinct, KLL quantiles, dyadic range counts, L2
norm — where the estimate itself is the product.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import HLL, KLL, CountMin, CountSketch, MisraGries, SeedStream
from .hh import DyadicHH
from .spark import build_sketch, key_id, key_id_col, tokens
from .spark.keys import MASK32


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokens(_docs(spark, sf_dir)).withColumn("id", key_id_col("token"))


# ----------------------------------------------------------------------
# hybrid sketch -> exact
# ----------------------------------------------------------------------


def topk_tokens(spark: SparkSession, sf_dir: str, k: int = 20, kc: int = 4096) -> DataFrame:
    """Exact top-k tokens via Misra-Gries candidates + exact rescoring.

    Recall certificate: MG guarantees every item with true freq >
    L1/(kc+1) survives; if the exact k-th candidate count clears that
    bar the hybrid answer IS the exact answer; else fall back."""
    ids = _token_ids(spark, sf_dir)
    mg, _ = build_sketch(ids, MisraGries(k=kc), id_col="id")
    cand = [int(i) for i, _ in mg.candidates()]
    cand_df = spark.createDataFrame([(c,) for c in cand], "id long")
    exact = (
        ids.join(F.broadcast(cand_df), "id")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(k)
    )
    rows = exact.collect()
    kth = rows[-1]["freq"] if len(rows) >= k else 0
    if len(cand) >= kc and kth <= mg.norm / (mg.k + 1):
        # certificate failed: candidates may miss a true top-k item
        exact = (
            ids.groupBy("token")
            .agg(F.count("*").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("token"))
            .limit(k)
        )
    return exact


def phi_heavy_tokens(spark: SparkSession, sf_dir: str, phi: float = 0.02) -> DataFrame:
    """All tokens with freq >= phi*L1, exact counts. MG candidate pass
    (kc chosen so the MG bound < phi*L1 ensures full recall) + exact
    verify; precision errors are filtered exactly."""
    kc = max(4096, int(math.ceil(2.0 / phi)))
    ids = _token_ids(spark, sf_dir)
    mg, _ = build_sketch(ids, MisraGries(k=kc), id_col="id")
    cand = [int(i) for i, _ in mg.candidates()]
    cand_df = spark.createDataFrame([(c,) for c in cand], "id long")
    total = mg.norm  # exact L1 (MG tracks it exactly)
    return (
        ids.join(F.broadcast(cand_df), "id")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= phi * total)
        .orderBy(F.asc("token"))
    )


def phi_heavy_users(spark: SparkSession, sf_dir: str, phi: float = 0.005) -> DataFrame:
    """phi-heavy-hitter user_ids over events, via the hierarchical
    dyadic structure (reference semantics: recall of everything >=
    phi*L1 guaranteed) + exact verification pass."""
    ev = _events(spark, sf_dir).withColumn("id", F.col("user_id").bitwiseAND(F.lit(MASK32)))
    hh = DyadicHH(
        phi=phi, epsilon=phi / 2, delta=0.05, m=MASK32, gran=8,
        seed_stream=SeedStream(1234, 5678),
    )
    merged, _ = build_sketch(ev, hh, id_col="id")
    cand = [int(i) for i, _ in merged.query()]
    if not cand:
        return spark.createDataFrame([], "user_id long, freq long")
    cand_df = spark.createDataFrame([(c,) for c in cand], "id long")
    total = merged.norm
    return (
        ev.join(F.broadcast(cand_df), "id")
        .groupBy("user_id")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= phi * total)
        .orderBy(F.asc("user_id"))
    )


def topk_event_types(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    ev = _events(spark, sf_dir).withColumn("id", key_id_col("event_type"))
    mg, _ = build_sketch(ev, MisraGries(k=256), id_col="id")
    cand_df = spark.createDataFrame(
        [(int(i),) for i, _ in mg.candidates()], "id long"
    )
    return (
        ev.join(F.broadcast(cand_df), "id")
        .groupBy("event_type")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("event_type"))
        .limit(k)
    )


# ----------------------------------------------------------------------
# sketch-estimate queries (approximate by design)
# ----------------------------------------------------------------------


def point_freq_tokens(spark: SparkSession, sf_dir: str, probe_tokens: list[str] | None = None) -> DataFrame:
    """Count-Min point-frequency estimates for probe tokens (>= exact,
    within eps*L1 w.p. 1-delta)."""
    probe_tokens = probe_tokens or ["the", "a", "value", "table", "spark"]
    ids = _token_ids(spark, sf_dir)
    cm_t = CountMin(width=1 << 18, depth=5, hash_family="ms", seed_stream=SeedStream(1234, 5678))
    cm, _ = build_sketch(ids, cm_t, id_col="id")
    est = cm.point(np.array([key_id(t) for t in probe_tokens], dtype=np.uint64))
    return spark.createDataFrame(
        [(t, int(e)) for t, e in zip(probe_tokens, est)], "token string, est_freq long"
    ).orderBy("token")


def distinct_tokens_hll(spark: SparkSession, sf_dir: str, p: int = 14) -> DataFrame:
    ids = _token_ids(spark, sf_dir)
    hll, _ = build_sketch(ids, HLL(p=p), id_col="id")
    return spark.createDataFrame([(float(hll.estimate()),)], "distinct_est double")


def quantiles_events_value(spark: SparkSession, sf_dir: str, qs: list[float] | None = None) -> DataFrame:
    """KLL quantile estimates over events.value (values scaled to int
    ids for transport; KLL itself consumes doubles)."""
    qs = qs or [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    ev = _events(spark, sf_dir).select((F.col("value") * 100).cast("long").alias("id"))
    kll, _ = build_sketch(ev, KLL(k=256), id_col="id")
    est = kll.quantile(qs) / 100.0
    return spark.createDataFrame(
        [(float(q), float(v)) for q, v in zip(qs, est)], "q double, value_est double"
    ).orderBy("q")


def range_count_users(spark: SparkSession, sf_dir: str, lo: int = 10, hi: int = 59) -> DataFrame:
    """Dyadic range-count estimate of events with user_id in [lo, hi]
    (O(k log m) point queries on the level sketches — the scalable form
    of the reference's naive range_sum, count_min.c:147-156)."""
    ev = _events(spark, sf_dir).withColumn("id", F.col("user_id").bitwiseAND(F.lit(MASK32)))
    hh = DyadicHH(phi=0.01, epsilon=0.005, delta=0.05, m=MASK32, gran=8,
                  seed_stream=SeedStream(1234, 5678))
    merged, _ = build_sketch(ev, hh, id_col="id")
    return spark.createDataFrame(
        [(lo, hi, int(merged.range_count(lo, hi)))], "lo long, hi long, range_est long"
    )


def l2_norm_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS L2-norm estimate of the token frequency vector from a merged
    Count-Sketch (reference: src/norm/l2-sketch.c, computed associatively)."""
    ids = _token_ids(spark, sf_dir)
    cs_t = CountSketch(width=1 << 14, depth=7, hash_family="ms", seed_stream=SeedStream(1234, 5678))
    cs, _ = build_sketch(ids, cs_t, id_col="id")
    return spark.createDataFrame([(float(cs.l2_norm()), int(cs.norm))], "l2_est double, l1 long")
