"""MultiSketch: build several sketches over the same key stream in ONE
pass (the reference updates all hierarchy levels per record in one pass
— src/hh/sketch.c:113-135; this generalizes that to heterogeneous
sketches, e.g. CM + HLL + KLL + DyadicHH per column scan). Merge is
component-wise, so it inherits each component's invariance class."""

from __future__ import annotations

import struct

from .base import Sketch, register


@register
class MultiSketch(Sketch):
    TYPE = "multi"

    def __init__(self, sketches: dict[str, Sketch]) -> None:
        self.sketches = dict(sketches)

    def __getitem__(self, name: str) -> Sketch:
        return self.sketches[name]

    def update_batch(self, items, counts=None) -> None:
        for s in self.sketches.values():
            s.update_batch(items, counts)

    def merge(self, other: "MultiSketch") -> "MultiSketch":
        assert self.sketches.keys() == other.sketches.keys()
        for k in self.sketches:
            self.sketches[k].merge(other.sketches[k])
        return self

    def _header(self):
        return {"names": list(self.sketches.keys())}

    def _payload(self) -> bytes:
        parts = []
        for s in self.sketches.values():
            blob = s.to_bytes()
            parts.append(struct.pack("<Q", len(blob)))
            parts.append(blob)
        return b"".join(parts)

    @classmethod
    def _from_parts(cls, header, payload) -> "MultiSketch":
        out, off = {}, 0
        for name in header["names"]:
            (ln,) = struct.unpack("<Q", payload[off : off + 8])
            off += 8
            out[name] = Sketch.from_bytes(payload[off : off + ln])
            off += ln
        return cls(out)
