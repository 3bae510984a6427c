"""glibc malloc tuning for allocation-heavy numpy kernels.

numpy temporaries above glibc's mmap threshold (~128 KiB) are mmap'd
and returned to the OS on free, so every batch re-faults its pages. On
hosts where page-fault latency is high (virtualized / overcommitted
memory), that dominates sketch-update time by 100x+. Telling malloc to
(a) never use mmap for ordinary allocations and (b) never trim the heap
keeps pages resident across batches.

Standard glibc mallopt knobs (see mallopt(3)):
  M_TRIM_THRESHOLD = -1, M_TOP_PAD = -2, M_MMAP_THRESHOLD = -3,
  M_MMAP_MAX = -4

Called from package import AND from inside every Spark Python worker
(the UDF closures import this package), so executors get it too.
No-op on non-glibc platforms.
"""

from __future__ import annotations

import ctypes

_done = False


def tune_malloc() -> bool:
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-4, 0)  # M_MMAP_MAX = 0: keep large allocs on the heap
        libc.mallopt(-1, 2**31 - 1)  # M_TRIM_THRESHOLD: never give pages back
        _done = True
        return True
    except Exception:
        return False


tune_malloc()
