"""Misra-Gries heavy-hitter summary (k counters), batched + mergeable.

Not in the reference (added per BASELINE.json north_rule/north_star);
follows the published algorithm: maintain at most ``k`` counters; on
overflow subtract the (k+1)-th largest count from all and drop the
non-positive ones (the summary-merge formulation of Agarwal et al.,
"Mergeable Summaries"). Guarantees, for total stream weight N:

    true_count - N/(k+1)  <=  estimate  <=  true_count

Merge = counter-wise add followed by the same (k+1)-th-largest
subtraction — bound-preserving under any merge tree (representation is
merge-order-sensitive; tests assert bounds, not byte equality —
SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import numpy as np

from .base import Sketch, as_i64, as_u64, register


def _shrink(counters: dict[int, int], k: int) -> tuple[dict[int, int], int]:
    """Keep <= k counters; returns (counters, total_decrement_applied)."""
    if len(counters) <= k:
        return counters, 0
    vals = np.fromiter(counters.values(), dtype=np.int64, count=len(counters))
    # (k+1)-th largest == len-k-th smallest... partition for the cut value
    cut = int(np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1])
    out = {i: c - cut for i, c in counters.items() if c > cut}
    return out, cut


@register
class MisraGries(Sketch):
    TYPE = "misra_gries"

    def __init__(self, k: int = 1024) -> None:
        self.k = int(k)
        self.counters: dict[int, int] = {}
        self.norm = 0  # total weight seen (L1)
        self.decrement = 0  # cumulative subtraction (error bound witness)

    def update_batch(self, items, counts=None) -> None:
        x = as_u64(items)
        c = as_i64(counts, len(x))
        self.norm += int(c.sum())
        ux, inv = np.unique(x, return_inverse=True)
        uc = np.zeros(len(ux), dtype=np.int64)
        np.add.at(uc, inv, c)
        g = self.counters
        for i, w in zip(ux.tolist(), uc.tolist()):
            g[i] = g.get(i, 0) + w
        self.counters, dec = _shrink(g, self.k)
        self.decrement += dec

    def point(self, items) -> np.ndarray:
        x = as_u64(np.atleast_1d(np.asarray(items)))
        return np.array([self.counters.get(int(i), 0) for i in x], dtype=np.int64)

    def candidates(self) -> list[tuple[int, int]]:
        """(item, lower-bound estimate) pairs, count-desc. Any item with
        true count > N/(k+1) is guaranteed present."""
        return sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))

    def merge(self, other: "MisraGries") -> "MisraGries":
        assert self.k == other.k
        g = self.counters
        for i, c in other.counters.items():
            g[i] = g.get(i, 0) + c
        self.counters, dec = _shrink(g, self.k)
        self.norm += other.norm
        self.decrement += other.decrement + dec
        return self

    def _header(self):
        return {"k": self.k, "norm": self.norm, "decrement": self.decrement,
                "n": len(self.counters)}

    def _payload(self) -> bytes:
        items = np.fromiter(self.counters.keys(), dtype="<u8", count=len(self.counters))
        cnts = np.fromiter(self.counters.values(), dtype="<i8", count=len(self.counters))
        return items.tobytes() + cnts.tobytes()

    @classmethod
    def _from_parts(cls, header, payload) -> "MisraGries":
        s = cls(k=header["k"])
        n = header["n"]
        items = np.frombuffer(payload[: 8 * n], dtype="<u8")
        cnts = np.frombuffer(payload[8 * n :], dtype="<i8")
        s.counters = dict(zip(items.tolist(), cnts.tolist()))
        s.norm = header["norm"]
        s.decrement = header["decrement"]
        return s
