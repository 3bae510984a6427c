"""Text-analysis operators for training-data pipelines (brief: language
ID, quality scoring, token counting, document fingerprinting). All hot
paths are stock Catalyst expressions (codegen, no Python) except the
rolling-hash fingerprint, which is an Arrow-batched pandas kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..core.hashing import splitmix64

# small fixed stopword lists for the n-gram/heuristic language ID
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "une", "des", "que", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "por", "con", "para"],
}

STOPWORDS = LANG_MARKERS["en"]

# a BPE-ish word/punct segmentation: word pieces, numbers, single punct
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_count_col(text: str | Column = "text") -> Column:
    """Whitespace token count (codegen'd)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(c, " "))


def bpe_ish_count_col(text: str | Column = "text") -> Column:
    """Regex-segmented (BPE-ish) token count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def _marker_hits(tokens: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: length, token stats, punct/stopword
    ratios — all JVM-side expressions."""
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks)
    return df.select(
        "doc_id",
        F.length(text_col).alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        (F.length(text_col) / n_tok).alias("mean_token_len"),
        (
            F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", "")) / F.length(text_col)
        ).alias("punct_ratio"),
        (_marker_hits(toks, STOPWORDS) / n_tok).alias("stopword_ratio"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax over per-language marker-token hit
    counts, 'und' (undetermined) when no marker hits at all. The token
    split is materialized once in a separate projection so the four
    per-language filters share it instead of re-splitting."""
    df = df.withColumn("__toks", F.split(F.lower(F.col(text_col)), " "))
    toks = F.col("__toks")
    scores = {lg: _marker_hits(toks, ms) for lg, ms in LANG_MARKERS.items()}
    best = None
    # deterministic tie-break: language list order
    for lg in LANG_MARKERS:
        s = scores[lg]
        if best is None:
            best = F.struct(s.alias("s"), F.lit(lg).alias("lg"))
        else:
            best = F.when(s > best["s"], F.struct(s.alias("s"), F.lit(lg).alias("lg"))).otherwise(best)
    return df.select(
        "doc_id",
        F.when(best["s"] > 0, best["lg"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["s"].cast("long").alias("marker_hits"),
    )


def fingerprint_col(text: str | Column = "text", seed: int = 0xF1E5) -> Column:
    """64-bit rolling (polynomial) fingerprint over token hashes —
    order-sensitive, unlike a bag-of-words hash.

    Closed form of the Horner recurrence h = h*P + v_j (mod 2^64):
        h = seed * P^L + sum_j v_j * P^(L-1-j)
    Token hashing is JVM-side (xxhash64 in an array transform); the
    Arrow kernel computes the power table once per batch and reduces
    each document with one segmented uint64 sum — no per-token Python."""
    from pyspark.sql.functions import pandas_udf

    from .dedup import token_hashes_col
    from .segmented import flatten_segments, segment_sum

    @pandas_udf(LongType())
    def _fp(hashes: pd.Series) -> pd.Series:
        from ..core import memtune  # noqa: F401

        n = len(hashes)
        if n == 0:
            return pd.Series([], dtype="int64")
        P = np.uint64(1099511628211)  # FNV-ish odd multiplier
        flat, starts, lens_nz, nz = flatten_segments(hashes)
        out = np.full(n, np.int64(np.uint64(seed).view(np.int64)), dtype=np.int64)
        if len(flat):
            with np.errstate(over="ignore"):
                th = splitmix64(flat, seed)
                maxlen = int(lens_nz.max())
                pw = np.empty(maxlen + 1, dtype=np.uint64)
                pw[0] = 1
                np.cumprod(np.full(maxlen, P, dtype=np.uint64), out=pw[1:])
                # exponent of token j in doc: len - 1 - position
                pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, lens_nz)
                expo = np.repeat(lens_nz, lens_nz) - 1 - pos
                h = segment_sum(th * pw[expo], starts)  # wraps mod 2^64
                h += np.uint64(seed) * pw[lens_nz]
            out[nz] = h.view(np.int64)
        return pd.Series(out)

    return _fp(token_hashes_col(text))
