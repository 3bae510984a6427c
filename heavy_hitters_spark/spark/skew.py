"""Hot-key skew handling (BASELINE.json north_rule: "salted
repartitioning for hot-key skew").

Sketch state itself is skew-immune (fixed size, map-side only), but the
exact passes (verification groupBy, shingle joins) shuffle raw keys.
These helpers implement the standard two-stage salted patterns:

- ``salted_agg``: groupBy(key, salt) partial -> groupBy(key) final.
  (Spark's hash aggregate already does map-side partials for algebraic
  aggs; explicit salting additionally splits a hot key across REDUCER
  partitions, which partial agg alone cannot.)
- ``salted_join``: replicate the small side per salt value so a skewed
  big-side key spreads over ``n_salts`` reducer partitions.
- ``with_salt``: deterministic per-row salt from a stable hash, so
  retried tasks salt identically.

AQE skew-join splitting (enabled in session.py) is the runtime backstop;
explicit salting is for cases AQE can't see (aggregation skew, custom
plans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, cols: list[str], n_salts: int = 16, name: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, n_salts): stable under task retries
    (hash of the row's own key columns + a monotonic disambiguator)."""
    return df.withColumn(
        name,
        F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.monotonically_increasing_id()), F.lit(n_salts)),
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for re-aggregatable functions
    (count/sum/min/max). agg_exprs: {output_name: 'count'|'sum:col'|...}."""
    stage1_aggs, stage2_aggs = [], []
    for out, spec in agg_exprs.items():
        if spec == "count":
            stage1_aggs.append(F.count(F.lit(1)).alias(out))
            stage2_aggs.append(F.sum(out).alias(out))
        else:
            fn, col = spec.split(":")
            stage1_aggs.append(getattr(F, fn)(col).alias(out))
            refn = {"sum": "sum", "min": "min", "max": "max"}[fn]
            stage2_aggs.append(getattr(F, refn)(out).alias(out))
    salted = with_salt(df, key_cols, n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(*stage1_aggs)
    return partial.groupBy(*key_cols).agg(*stage2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew join: big side gets a random-but-deterministic salt; small
    side is exploded n_salts times so every (key, salt) matches."""
    b = with_salt(big, [on], n_salts)
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))).withColumn(
        "__salt", F.col("__salt").cast("long")
    )
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")
