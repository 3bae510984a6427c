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
import os

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


def _in_pyspark_worker() -> bool:
    """True inside a pyspark daemon/worker process (the factory exports
    its connection info into the worker environment)."""
    return (
        "PYTHON_WORKER_FACTORY_SECRET" in os.environ
        or "PYTHON_WORKER_FACTORY_PORT" in os.environ
        or "PYTHON_WORKER_FACTORY_SOCK_PATH" in os.environ
    )


_zip_stat_cache: dict[str, tuple[float, int]] = {}
_zip_patched = False


def tune_zipimport_invalidate() -> bool:
    """Make the per-task ``importlib.invalidate_caches()`` cheap.

    pyspark's worker runs ``importlib.invalidate_caches()`` before
    EVERY task (worker_util.setup_spark_files — the hook that makes
    ``sc.addPyFile`` visible to running workers). CPython's
    ``zipimporter.invalidate_caches`` unconditionally re-reads the
    zip's central directory; the worker's sys.path carries ~15 zip
    finders (pyspark.zip and its package-subpath finders, the
    spark-core jar, python311.zip), so on this host class every task
    paid a measured 130-260 ms re-parsing unchanged archives — the
    dominant per-task overhead for short tasks (worker 'init' time
    from report_times; per-finder probe in BENCH/BASELINE.md notes).

    Fix, semantics preserved: memoize per archive by (mtime, size)
    and skip the re-read while unchanged. ``addPyFile``'d plain .py
    files land in the SparkFiles *directory* (a FileFinder, untouched
    here), and a genuinely replaced zip/egg still invalidates because
    its stat changes. The current finders' archives are pre-seeded as
    fresh — they were just used to import this very module."""
    global _zip_patched
    if _zip_patched:
        return True
    if not _in_pyspark_worker():
        return False
    try:
        import sys
        import zipimport

        # measured & verified against CPython 3.11/3.12 zipimport
        # internals; on a future interpreter degrade to stock behavior
        # instead of patching untested code paths
        if sys.version_info[:2] not in ((3, 11), (3, 12)):
            return False

        orig = zipimport.zipimporter.invalidate_caches

        def invalidate_caches(self):  # noqa: ANN001
            try:
                st = os.stat(self.archive)
                val = (st.st_mtime, st.st_size)
            except OSError:
                return orig(self)
            if _zip_stat_cache.get(self.archive) == val:
                return None
            _zip_stat_cache[self.archive] = val
            return orig(self)

        for finder in list(sys.path_importer_cache.values()):
            if isinstance(finder, zipimport.zipimporter):
                try:
                    st = os.stat(finder.archive)
                    _zip_stat_cache[finder.archive] = (st.st_mtime, st.st_size)
                except OSError:
                    pass
        zipimport.zipimporter.invalidate_caches = invalidate_caches
        _zip_patched = True
        return True
    except Exception:
        return False


_gc_frozen = False


def freeze_import_graph() -> bool:
    """Take the import graph out of the between-task GC.

    pyspark's daemon runs a FULL ``gc.collect()`` between reused-worker
    tasks (daemon.py's reuse loop); with pyspark + pyarrow + numpy +
    this package imported that is ~70k tracked objects and a measured
    ~40 ms per task. The import graph lives for the worker's lifetime,
    so ``gc.freeze()`` moves it to the permanent generation once and
    the per-task collection only traverses per-task garbage (~0 ms).
    Refcount-driven frees are unaffected; the only cost is that cycles
    among objects alive at freeze time are never reclaimed — bounded,
    once per worker, and dominated by modules that would never die
    anyway. Worker-only: the driver manages its own heap."""
    global _gc_frozen
    if _gc_frozen:
        return True
    if not _in_pyspark_worker():
        return False
    try:
        import gc

        gc.freeze()
        _gc_frozen = True
        return True
    except Exception:
        return False


tune_malloc()
tune_zipimport_invalidate()
freeze_import_graph()
