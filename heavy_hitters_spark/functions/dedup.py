"""Deduplication operators for training-data pipelines:

- exact dedup                 hash-groupBy, pure Catalyst
- n-gram Jaccard similarity   explode-shingles + self-join, pure Catalyst
- MinHash + LSH near-dup      signatures in an Arrow pandas kernel,
                              banding + bucket-join in DataFrame ops,
                              exact-Jaccard verification on candidates
- SimHash near-dup            64-bit simhash + hamming-ball bucket join

Scale shape: every candidate-generation join is on a *bucket key*
(band hash / simhash chunk), never a cross join; verification touches
only candidate pairs. At 100 TB the LSH band join is the standard
shuffle-bounded near-dup plan; the exact verify is a shingle self-join
restricted to candidates (broadcast when candidate set is small).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..core.hashing import splitmix64

_M64 = 0xFFFFFFFFFFFFFFFF


# ----------------------------------------------------------------------
# exact dedup
# ----------------------------------------------------------------------


def dedup_exact(df: DataFrame, key_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact key. Hash-groupBy on a 128-bit
    key (md5) so shuffle rows stay narrow without the 64-bit collision
    hazard: at 10^12 docs a 64-bit key folds ~10^4-10^5 distinct texts
    together (birthday bound), silently dropping non-duplicates; with
    128 bits the expected collision count is ~10^-14."""
    return (
        df.withColumn("__h", F.md5(F.col(key_col).cast("binary")))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .drop("__h")
    )


# ----------------------------------------------------------------------
# token shingles + exact n-gram Jaccard
# ----------------------------------------------------------------------


def shingle_grams(toks, n: int):
    """array<string> of token n-grams; EMPTY array for docs with fewer
    than n tokens (unguarded, F.sequence(0, size-n) is descending for
    size<n and F.slice start 0 throws INVALID_PARAMETER_VALUE.START)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_df(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct token n-gram shingles per doc (Catalyst-only: split +
    transform + explode). Docs shorter than n tokens produce no
    shingles (matching the SQL-oracle semantics)."""
    toks = F.split(F.col(text_col), " ")
    return (
        df.select(F.col(id_col), F.explode(shingle_grams(toks, n)).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard for all pairs sharing >= 1 shingle.
    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.

    The self-join is on the shingle value — shuffle is bounded by
    shingle frequency; for web-scale, cap hot shingles (stop-shingles)
    before joining."""
    sh = shingles_df(df, n, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ----------------------------------------------------------------------
# MinHash + LSH
# ----------------------------------------------------------------------


def minhash_col(text_col, n_hashes: int = 128, shingle_n: int = 3, seed: int = 0x51A5):
    """array<long> MinHash signature over token n-gram shingles.
    Arrow-batched pandas kernel; per-doc work is vectorized numpy."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(LongType()))
    def _mh(s: pd.Series) -> pd.Series:
        from ..core import memtune  # noqa: F401
        from ..spark.keys import xxh64

        # per-hash affine mixers a*x+b over splitmix-derived constants
        ab = splitmix64(np.arange(2 * n_hashes, dtype=np.uint64), seed)
        a = (ab[:n_hashes] | np.uint64(1))[:, None]
        b = ab[n_hashes:][:, None]
        out = []
        with np.errstate(over="ignore"):
            for txt in s:
                toks = txt.split(" ") if txt else []
                if len(toks) < shingle_n:
                    sh = [" ".join(toks)] if toks else [""]
                else:
                    sh = {" ".join(toks[i : i + shingle_n]) for i in range(len(toks) - shingle_n + 1)}
                hv = np.array([xxh64(x.encode()) for x in sh], dtype=np.uint64)[None, :]
                sig = (a * hv + b).min(axis=1)  # n_hashes minima, uint64 wrap
                out.append(sig.view(np.int64).tolist())
        return pd.Series(out)

    return _mh(text_col if not isinstance(text_col, str) else F.col(text_col))


def lsh_candidates(
    df: DataFrame,
    n_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0x51A5,
) -> DataFrame:
    """Banded-LSH candidate pairs (doc_a < doc_b). rows_per_band =
    n_hashes // bands; collision threshold s* ~ (1/bands)^(1/rows)."""
    rows = n_hashes // bands
    sig = df.select(F.col(id_col), minhash_col(text_col, n_hashes, shingle_n, seed).alias("sig"))
    banded = sig.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.struct(
                    bnd.alias("band"),
                    F.xxhash64(F.slice("sig", bnd * rows + 1, rows)).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def near_dup_pairs_minhash(
    df: DataFrame,
    threshold: float = 0.8,
    n_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidates -> exact-Jaccard verification -> pairs >= threshold.
    Deterministic output (the sketch only prunes; the filter is exact)."""
    cand = lsh_candidates(df, n_hashes, bands, shingle_n, text_col, id_col)
    sh = shingles_df(df, shingle_n, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    # verification via shingle join restricted to candidate docs
    cand_docs = (
        cand.select(F.col("doc_a").alias(id_col))
        .union(cand.select("doc_b"))
        .distinct()
    )
    sh_c = sh.join(F.broadcast(cand_docs), id_col)
    a2, b2 = sh_c.alias("a"), sh_c.alias("b")
    inter = (
        a2.join(b2, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
        .join(cand, ["doc_a", "doc_b"])  # only LSH candidates
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------


def simhash_col(text_col, seed: int = 0x51AA):
    """64-bit SimHash over whitespace tokens (sign of per-bit weight sums)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def _sh(s: pd.Series) -> pd.Series:
        from ..core import memtune  # noqa: F401
        from ..spark.keys import xxh64

        out = np.empty(len(s), dtype=np.int64)
        bits = np.arange(64, dtype=np.uint64)
        for i, txt in enumerate(s):
            toks = txt.split(" ") if txt else []
            if not toks:
                out[i] = 0
                continue
            hv = splitmix64(np.array([xxh64(t.encode()) for t in toks], dtype=np.uint64), seed)
            bitmat = ((hv[:, None] >> bits) & np.uint64(1)).astype(np.int64)  # n x 64
            v = (2 * bitmat - 1).sum(axis=0)
            out[i] = np.int64(np.uint64(((v > 0).astype(np.uint64) << bits).sum(dtype=np.uint64)).view(np.int64))
        return pd.Series(out)

    return _sh(text_col if not isinstance(text_col, str) else F.col(text_col))


def near_dup_pairs_simhash(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dups with GUARANTEED recall at the requested radius:
    bucket on (max_hamming + 1) bit-chunks of the 64-bit simhash — by
    pigeonhole, any pair within hamming distance max_hamming agrees
    exactly on at least one chunk — then verify with popcount on
    candidates only.

    Scale note: chunk width = 64/(max_hamming+1) bits sets the bucket
    count per chunk (2^width); small radii (<= 3, 16-bit chunks) keep
    candidate volume ~n^2/2^16 per chunk and are the web-scale setting;
    larger radii trade exponentially more candidates for recall."""
    n_chunks = max_hamming + 1
    if n_chunks > 64:
        raise ValueError("max_hamming must be < 64")
    base, rem = divmod(64, n_chunks)
    widths = [base + 1] * rem + [base] * (n_chunks - rem)
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    sh = df.select(F.col(id_col), simhash_col(text_col).alias("sh"))
    chunk_structs = [
        F.struct(
            F.lit(i).alias("ck"),
            F.shiftrightunsigned(F.col("sh"), offsets[i])
            .bitwiseAND(F.lit((1 << widths[i]) - 1))
            .alias("cv"),
        )
        for i in range(n_chunks)
    ]
    chunks = sh.select(
        id_col, "sh", F.explode(F.array(*chunk_structs)).alias("c")
    ).select(id_col, "sh", F.col("c.ck").alias("ck"), F.col("c.cv").alias("cv"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ck") == F.col("b.ck"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).where(ham <= max_hamming).select(
        "doc_a", "doc_b", "hamming"
    )
