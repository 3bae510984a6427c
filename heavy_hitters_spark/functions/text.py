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
    counts, 'und' (undetermined) when no marker hits at all."""
    toks = F.split(F.lower(F.col(text_col)), " ")
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
    order-sensitive, unlike a bag-of-words hash. Arrow-batched pandas
    kernel (the only Python step in this module)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def _fp(s: pd.Series) -> pd.Series:
        from ..core import memtune  # noqa: F401
        from ..spark.keys import xxh64

        out = np.empty(len(s), dtype=np.int64)
        P = np.uint64(1099511628211)  # FNV-ish odd multiplier
        with np.errstate(over="ignore"):
            for i, txt in enumerate(s):
                toks = txt.split(" ") if txt else []
                h = np.uint64(seed)
                if toks:
                    th = splitmix64(
                        np.array([xxh64(t.encode()) for t in toks], dtype=np.uint64),
                        seed,
                    )
                    for v in th:
                        h = h * P + v  # wraps mod 2^64
                out[i] = np.int64(h.view(np.int64)) if isinstance(h, np.uint64) else int(h)
        return pd.Series(out)

    c = F.col(text) if isinstance(text, str) else text
    return _fp(c)
