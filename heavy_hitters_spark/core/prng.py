"""Seeded PRNG + hash-seed generators, bit-parity with the reference.

Reimplements (from public algorithm descriptions + observed reference
behavior) the Marsaglia two-MWC uniform generator the reference uses for
hash-seed generation (``xuni_rand`` at ``src/util/xutil.h:29-33`` with
state defaults ``I1=1234, I2=5678`` at ``src/util/xutil.c:11-12``), plus
the per-family seed generators from ``src/util/hash.c``:

- ``ms_agen``/``ms_bgen``      (hash.c:84-90)
- ``ms2_agen``/``ms2_bgen``    (hash.c:110-118)
- ``cw_agen``/``cw_bgen``      (hash.c:44-59)
- ``sign_ms_agen``/``sign_ms_bgen`` (hash.h:87-93)
- ``sign_cw_agen``/``sign_cw_bgen`` (hash.h:57-71)

All seeds are drawn on the DRIVER from a single ``SeedStream`` so every
Spark partition builds sketches with identical hash functions — the
precondition for associative, merge-order-invariant combining.
"""

from __future__ import annotations

MOD_P = (1 << 61) - 1  # Mersenne prime, src/util/hash.h:12
UINT32_MAX = 0xFFFFFFFF
_MASK32 = 0xFFFFFFFF
_MASK16 = 0xFFFF


class SeedStream:
    """Marsaglia MWC pair; bit-parity with the reference's xuni_rand.

    >>> s = SeedStream(1234, 5678)
    >>> 0.0 <= s.uni() < 1.0
    True
    """

    __slots__ = ("i1", "i2")

    def __init__(self, seed1: int = 1234, seed2: int = 5678) -> None:
        if seed1 <= 0 or seed2 <= 0:
            raise ValueError("seeds must be positive uint32")
        self.i1 = seed1 & _MASK32
        self.i2 = seed2 & _MASK32

    def uni(self) -> float:
        """double in [0, 1); exact replica of xutil.h:29-33."""
        self.i1 = (36969 * (self.i1 & _MASK16) + (self.i1 >> 16)) & _MASK32
        self.i2 = (18000 * (self.i2 & _MASK16) + (self.i2 >> 16)) & _MASK32
        x = (((self.i1 << 16) & _MASK32) ^ (self.i2 & _MASK16)) & _MASK32
        return x * 2.328306437080797e-10

    # --- per-family seed generators (same draw order as the reference) ---

    def ms_agen(self) -> int:
        """odd 32-bit multiplier (hash.c:84-86)."""
        return (1 | int(self.uni() * 4294967295.0)) & _MASK32

    def ms_bgen(self, M: int) -> int:
        """b < 2^(32-M) (hash.c:88-90)."""
        return int(self.uni() * float(1 << (32 - M)))

    def ms2_agen(self) -> int:
        return (1 | int(self.uni() * 4294967295.0)) & _MASK32

    def ms2_bgen(self, M: int) -> int:  # noqa: ARG002 - parity with hash.c:116-118
        return 0

    def cw_agen(self) -> int:
        """1 <= a < MOD_P (hash.c:44-51)."""
        return 1 + int(self.uni() * float(MOD_P - 1))

    def cw_bgen(self, M: int = 0) -> int:  # noqa: ARG002
        """0 <= b < MOD_P (hash.c:53-59)."""
        return int(self.uni() * float(MOD_P))

    def cw2_bgen(self, M: int = 0) -> int:  # noqa: ARG002
        return 0

    def sign_ms_agen(self) -> int:
        return (1 | int(self.uni() * 4294967295.0)) & _MASK32

    def sign_ms_bgen(self) -> int:
        return int(self.uni() * float(1 << 31))

    def sign_cw_agen(self) -> int:
        return 1 + int(self.uni() * float(MOD_P - 1))

    def sign_cw_bgen(self) -> int:
        return int(self.uni() * float(MOD_P))
