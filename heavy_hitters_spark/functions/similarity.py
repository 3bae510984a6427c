"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: Arrow-batched numpy matmul per partition
  against a broadcast query matrix — the exact baseline
- LSH-bucketed (random hyperplane) variant: the scale path — candidates
  from sign-pattern buckets, exact rescoring on candidates only
- embedding-cosine near-dup pairs: hyperplane-LSH bucket join + exact
  cosine verify (same shape as MinHash dedup)

At 100 TB the brute-force path is a single map-side pass per query
batch (no shuffle; queries broadcast); the LSH path trades recall for a
bucket-join. Both return exact cosine scores for everything they emit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..core.hashing import splitmix64


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def brute_force_topk(
    emb: DataFrame,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector. Per-partition numpy matmul
    emits each partition's local top-k; a tiny global top-k reduction
    finishes it (total shuffled rows = k * partitions * n_queries)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    nq = q.shape[0]
    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField(id_col, LongType()),
            StructField("score", DoubleType()),
        ]
    )

    def part_topk(batches):
        from ..core import memtune  # noqa: F401

        ids_all, score_all = [], []
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy())
            mat = _normalize(mat.astype(np.float64))
            scores = q @ mat.T  # nq x batch
            ids = pdf[id_col].to_numpy()
            kk = min(k, scores.shape[1])
            top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            for qi in range(nq):
                ids_all.append(np.column_stack([np.full(kk, qi), ids[top[qi]]]))
                score_all.append(scores[qi, top[qi]])
        if not ids_all:
            return
        idm = np.concatenate(ids_all)
        sc = np.concatenate(score_all)
        yield pd.DataFrame({"query_id": idm[:, 0], id_col: idm[:, 1], "score": sc})

    local = emb.select(id_col, vec_col).mapInPandas(part_topk, schema)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, F.round("score", 6).alias("score"), "rank")
        .orderBy("query_id", "rank")
    )


def hyperplane_sig_col(vec_col, n_planes: int = 16, dim: int = 64, seed: int = 0xA11) -> object:
    """LSH bucket id: sign pattern under n_planes random hyperplanes."""
    from pyspark.sql.functions import pandas_udf

    planes = _random_planes(n_planes, dim, seed)

    @pandas_udf(LongType())
    def _sig(s: pd.Series) -> pd.Series:
        from ..core import memtune  # noqa: F401

        if not len(s):
            return pd.Series([], dtype="int64")
        mat = np.stack(s.to_numpy()).astype(np.float64)
        bits = (mat @ planes.T) > 0  # n x planes
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series((bits @ weights).astype(np.int64))

    return _sig(vec_col if not isinstance(vec_col, str) else F.col(vec_col))


def _random_planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic gaussian-ish hyperplanes from splitmix64 bits."""
    u = splitmix64(np.arange(2 * n_planes * dim, dtype=np.uint64), seed).astype(np.float64) / 1.8446744073709552e19
    u1, u2 = u[: n_planes * dim], u[n_planes * dim :]
    g = np.sqrt(-2 * np.log(np.clip(u1, 1e-12, 1))) * np.cos(2 * np.pi * u2)
    return g.reshape(n_planes, dim)


def lsh_topk(
    emb: DataFrame,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH candidate union,
    exact cosine rescoring of candidates only (scale path)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    dim = q.shape[1]
    cand = None
    for t in range(n_tables):
        seed = 0xA11 + 131 * t
        planes = _random_planes(n_planes, dim, seed)
        qsig = ((q @ planes.T) > 0) @ (1 << np.arange(n_planes, dtype=np.int64))
        sigs = emb.select(id_col, vec_col, hyperplane_sig_col(vec_col, n_planes, dim, seed).alias("sig"))
        qdf = sigs.sparkSession.createDataFrame(
            [(int(i), int(s)) for i, s in enumerate(qsig)], "query_id long, sig long"
        )
        c = sigs.join(F.broadcast(qdf), "sig").select("query_id", id_col, vec_col)
        cand = c if cand is None else cand.union(c)
    cand = cand.dropDuplicates(["query_id", id_col])

    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField(id_col, LongType()),
            StructField("score", DoubleType()),
        ]
    )

    def rescore(batches):
        from ..core import memtune  # noqa: F401

        for pdf in batches:
            if not len(pdf):
                continue
            mat = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            qi = pdf["query_id"].to_numpy()
            sc = np.einsum("ij,ij->i", q[qi], mat)
            yield pd.DataFrame({"query_id": qi, id_col: pdf[id_col].to_numpy(), "score": sc})

    scored = cand.mapInPandas(rescore, schema)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, F.round("score", 6).alias("score"), "rank")
        .orderBy("query_id", "rank")
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 14,
    n_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via hyperplane LSH buckets +
    exact cosine verification (emitted pairs carry exact scores)."""
    first = True
    cand = None
    for t in range(n_tables):
        seed = 0xD0D0 + 977 * t
        sigs = emb.select(id_col, hyperplane_sig_col(vec_col, n_planes, _dim_of(emb, vec_col), seed).alias("sig"))
        a, b = sigs.alias("a"), sigs.alias("b")
        c = a.join(
            b, (F.col("a.sig") == F.col("b.sig")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        ).select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        cand = c if first else cand.union(c)
        first = False
    cand = cand.distinct()
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    joined = cand.join(va, "id_a").join(vb, "id_b")
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, v: a + v))  # noqa: E731
    cos = dot / (norm(F.col("va")) * norm(F.col("vb")))
    return (
        joined.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def _dim_of(emb: DataFrame, vec_col: str) -> int:
    row = emb.select(F.size(vec_col).alias("d")).first()
    return int(row["d"]) if row else 0
