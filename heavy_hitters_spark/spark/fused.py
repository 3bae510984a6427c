"""Fused tokenize -> hash -> sketch partials over raw text rows.

The naive plan (explode + xxhash64 in Catalyst, then mapInPandas over
token ids) ships one Arrow row per TOKEN across the JVM->Python
boundary — at ~250 tokens/doc that's 250x more rows than documents and
the IPC dominates the build (measured: it saturates memory bandwidth at
high core counts and kills scaling). This fused path ships one row per
DOCUMENT and does tokenization in pyarrow C kernels inside the worker:

  scan (column-pruned text)
    -> mapInArrow: split_pattern -> list_flatten -> dictionary_encode
       (all Arrow C) -> xxh64 only on NEW dictionary tokens (memoized
       token->id dict, Zipf vocab makes the hit rate ~100%)
    -> numpy sketch update on the id array
    -> one serialized state row per partition

The ids are the same xxhash64&mask32 ids as spark.keys.key_id_col, so
fused-built sketches are interchangeable with explode-built ones
(asserted in tests/test_fused.py).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.base import Sketch, pack_state
from .aggregate import PARTIAL_SCHEMA, tree_merge


def _fused_fn(template_bytes: bytes, text_col: str, split: str = " "):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        from ..core import memtune  # noqa: F401
        from ..core.base import pack_state_bytes, unpack_state
        from .keys import MASK32, xxh64

        sk = unpack_state(template_bytes)
        t0 = time.perf_counter()
        n_rows = n_upd = 0
        memo: dict[str, int] = {}
        for batch in batches:
            texts = batch.column(text_col)
            toks = pc.list_flatten(pc.split_pattern(texts, split))
            if len(toks) == 0:
                continue
            d = toks.dictionary_encode()
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            vocab = d.dictionary.to_pylist()
            lut = np.empty(len(vocab), dtype=np.uint64)
            for j, tok in enumerate(vocab):
                h = memo.get(tok)
                if h is None:
                    h = xxh64(tok.encode()) & MASK32
                    memo[tok] = h
                lut[j] = h
            idx = d.indices.to_numpy(zero_copy_only=False)
            ids = lut[idx]
            # drop empty-string tokens (parity with keys.tokens filter)
            if "" in memo:
                ids = ids[ids != np.uint64(memo[""])]
            sk.update_batch(ids)
            n_rows += len(texts)
            n_upd += len(ids)
        ctx = TaskContext.get()
        raw = sk.to_bytes()
        state = pack_state_bytes(raw)  # ship packed; account raw (SPACE)
        yield pa.RecordBatch.from_pydict(
            {
                "part_id": [ctx.partitionId() if ctx else -1],
                "state": [state],
                "n_rows": [n_rows],
                "n_updates": [n_upd],
                "wall_ms": [(time.perf_counter() - t0) * 1000.0],
                "state_bytes": [len(raw)],
                "files": [""],
            },
            schema=pa.schema(
                [
                    ("part_id", pa.int64()),
                    ("state", pa.binary()),
                    ("n_rows", pa.int64()),
                    ("n_updates", pa.int64()),
                    ("wall_ms", pa.float64()),
                    ("state_bytes", pa.int64()),
                    ("files", pa.string()),
                ]
            ),
        )

    return fn


def build_token_sketch(
    df: DataFrame,
    template: Sketch,
    text_col: str = "text",
    fanin: int = 64,
    n_hint: int | None = None,
) -> tuple[Sketch, dict]:
    """One-pass fused build over a text column; returns (sketch, metrics).
    Equivalent result to tokens(df) -> key_id_col -> build_sketch, at a
    fraction of the JVM->Python transfer."""
    partials = df.select(text_col).mapInArrow(
        _fused_fn(pack_state(template), text_col), PARTIAL_SCHEMA
    )
    if n_hint is None:
        n_hint = df.rdd.getNumPartitions()
    return tree_merge(partials, fanin=fanin, n_hint=n_hint)
