"""KLL quantile sketch, from scratch per the published algorithm
(Karnin-Lang-Liberty 2016: "Optimal Quantile Approximation in Streams").

Not in the reference (added per BASELINE.json north_rule). Compactor
hierarchy with geometrically-decaying capacities (c = 2/3); level h
items carry weight 2^h. Coin flips come from a deterministic counter
PRNG (splitmix64), so a fixed op order reproduces exactly; merge is
bound-preserving under any merge tree but not byte-identical
(SURVEY.md §7 hard parts — tests assert rank-error bounds, not bytes).

Rank error: |est_rank - true_rank| <= eps*n with eps ~ O(1/k)
(empirically ~1.5/k at k=200 for the constants used here).
"""

from __future__ import annotations

import math

import numpy as np

from .base import Sketch, register
from .hashing import splitmix64

_C = 2.0 / 3.0


@register
class KLL(Sketch):
    TYPE = "kll"

    def __init__(self, k: int = 200, seed: int = 0x5EED) -> None:
        self.k = int(k)
        self.seed = int(seed)
        self.compactors: list[list[float]] = [[]]
        self.n = 0
        self._coins = 0  # deterministic coin counter

    # ------------------------------------------------------------------
    def _capacity(self, h: int) -> int:
        height = len(self.compactors)
        return max(2, int(math.ceil(self.k * (_C ** (height - 1 - h)))))

    def _coin(self) -> int:
        self._coins += 1
        h = splitmix64(np.array([self._coins], dtype=np.uint64), self.seed)
        return int(h[0]) & 1

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _compress(self) -> None:
        while self._size() > sum(self._capacity(h) for h in range(len(self.compactors))):
            for h in range(len(self.compactors)):
                if len(self.compactors[h]) > self._capacity(h):
                    self._compact(h)
                    break
            else:
                break

    def _compact(self, h: int) -> None:
        if h + 1 >= len(self.compactors):
            self.compactors.append([])
        items = np.sort(np.asarray(self.compactors[h], dtype=np.float64))
        keep: list[float] = []
        if len(items) % 2 == 1:  # odd tail stays at this level
            keep = [float(items[-1])]
            items = items[:-1]
        promoted = items[self._coin() :: 2]
        self.compactors[h] = keep
        self.compactors[h + 1].extend(promoted.tolist())

    # ------------------------------------------------------------------
    def update_batch(self, items, counts=None) -> None:  # noqa: ARG002 (unweighted)
        vals = np.asarray(items, dtype=np.float64)
        self.n += len(vals)
        self.compactors[0].extend(vals.tolist())
        self._compress()

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vs, ws = [], []
        for h, c in enumerate(self.compactors):
            if c:
                vs.append(np.asarray(c, dtype=np.float64))
                ws.append(np.full(len(c), 1 << h, dtype=np.int64))
        if not vs:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q) -> np.ndarray:
        """Batch quantile query, q in [0,1]."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        v, w = self._weighted()
        if len(v) == 0:
            return np.full(len(qs), np.nan)
        cw = np.cumsum(w)
        targets = np.clip(qs, 0, 1) * cw[-1]
        idx = np.searchsorted(cw, targets, side="left")
        return v[np.minimum(idx, len(v) - 1)]

    def rank(self, values) -> np.ndarray:
        """Estimated number of items <= value."""
        xs = np.atleast_1d(np.asarray(values, dtype=np.float64))
        v, w = self._weighted()
        if len(v) == 0:
            return np.zeros(len(xs), dtype=np.int64)
        cw = np.concatenate([[0], np.cumsum(w)])
        idx = np.searchsorted(v, xs, side="right")
        return cw[idx].astype(np.int64)

    def merge(self, other: "KLL") -> "KLL":
        assert self.k == other.k
        while len(self.compactors) < len(other.compactors):
            self.compactors.append([])
        for h, c in enumerate(other.compactors):
            self.compactors[h].extend(c)
        self.n += other.n
        self._coins = max(self._coins, other._coins) + 1
        self._compress()
        return self

    # ------------------------------------------------------------------
    def _header(self):
        return {
            "k": self.k,
            "seed": self.seed,
            "n": self.n,
            "coins": self._coins,
            "lens": [len(c) for c in self.compactors],
        }

    def _payload(self) -> bytes:
        parts = [np.asarray(c, dtype="<f8").tobytes() for c in self.compactors]
        return b"".join(parts)

    @classmethod
    def _from_parts(cls, header, payload) -> "KLL":
        s = cls(k=header["k"], seed=header["seed"])
        s.n = header["n"]
        s._coins = header["coins"]
        s.compactors = []
        off = 0
        for ln in header["lens"]:
            arr = np.frombuffer(payload[off : off + 8 * ln], dtype="<f8")
            s.compactors.append(arr.tolist())
            off += 8 * ln
        return s
