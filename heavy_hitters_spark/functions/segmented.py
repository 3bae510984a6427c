"""Segmented (ragged-array) numpy kernels for Arrow-batched UDFs.

The dedup/fingerprint operators receive one ``array<long>`` of
JVM-computed xxhash64 values per document (hashing happens in Catalyst
via ``F.transform(arr, F.xxhash64)`` — whole-stage codegen, no Python
per token). These helpers flatten a batch of such arrays into ONE
contiguous uint64 vector plus segment offsets, so every per-document
reduction is a vectorized C pass (``np.minimum.reduceat`` /
``np.add.reduceat``), never a Python loop over tokens.

reduceat caveat handled here: zero-length segments return the element
AT the offset (not the reduction identity) and an offset == len(flat)
raises — so empty documents are excluded from the segment list and
written by the caller via the returned mask.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def flatten_segments(s: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Series of int64 arrays -> (flat uint64, starts, lens_nonempty, nonempty_mask).

    ``starts`` indexes ``flat`` for the NON-EMPTY documents only, in
    order; callers scatter results back through ``nonempty_mask``.
    """
    n = len(s)
    lens = np.fromiter((0 if x is None else len(x) for x in s), dtype=np.int64, count=n)
    nz = lens > 0
    if not nz.any():
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64), lens[nz], nz
    chunks = [np.asarray(x, dtype=np.int64) for x, keep in zip(s, nz) if keep]
    flat = np.concatenate(chunks).view(np.uint64)
    lens_nz = lens[nz]
    starts = np.zeros(len(lens_nz), dtype=np.int64)
    np.cumsum(lens_nz[:-1], out=starts[1:])
    return flat, starts, lens_nz, nz


def segment_min(values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-segment minimum along the last axis (segments all non-empty)."""
    return np.minimum.reduceat(values, starts, axis=-1)


def segment_sum(values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-segment sum along the last axis (segments all non-empty);
    integer dtypes wrap mod 2^64 exactly (no float64 round-off)."""
    return np.add.reduceat(values, starts, axis=-1)
