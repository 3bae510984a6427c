"""SparkSession factory with scale-appropriate defaults.

Designed for a 1000-executor cluster but testable on local[N]:
- AQE on (runtime re-plan, skew-join splitting)
- Arrow on, batch size aligned with the numpy kernels' chunk size so a
  pandas-UDF batch flows straight into one warm-memory kernel pass
- shuffle partitions sized for the local harness; on a real cluster
  this is overridden by --conf (documented in BENCH/BASELINE.md)
- malloc tuning propagated to Python workers via executorEnv
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app: str = "heavy-hitters-spark",
    shuffle_partitions: int | None = None,
    arrow_batch: int = 8192,  # small batches keep worker temps cache-resident
) -> SparkSession:
    """Build (or get) the session.

    NOTE: ``getOrCreate`` only applies JVM-launch options (the GC flags
    below, driver memory) when THIS call actually starts the JVM. If any
    SparkSession already exists in the process, those flags are silently
    ignored and the benchmarked configuration depends on call order —
    the bench runs every measured configuration in a FRESH subprocess
    for exactly this reason (bench.py build_run_subprocess)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    try:
        n_threads = int(master.split("[")[1].rstrip("]")) if "[" in master else 32
    except ValueError:  # local[*] and cluster masters
        n_threads = os.cpu_count() or 32
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n_threads))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.executorEnv.MALLOC_MMAP_MAX_", "0")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "-1")
        .config("spark.yarn.appMasterEnv.MALLOC_MMAP_MAX_", "0")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        # throughput collector: Arrow serialization allocates heavily and
        # G1's pause pattern penalizes many concurrent local task threads.
        # ParallelGCThreads=8 for NARROW sessions only (n_threads <= 8):
        # the default (~5/8 of vCPUs = ~23 threads here) makes GC bursts
        # oversubscribe the box (16 busy cores + 23 GC threads at
        # local[8]), stalling Python workers mid-kernel — capping it
        # tightened local[8] build walls in interleaved A/B (4.2-6.3s
        # spread -> 4.0-4.8s). At WIDE sessions (local[32]) the box is
        # already saturated and more GC threads = shorter pauses — the
        # cap measured ~1.3x SLOWER there (media_features 0.9 -> 1.3s),
        # so wide sessions keep the JVM default. SPARK_GRAFT_JAVA_OPTS
        # appends extra flags (A/B tuning in fresh subprocesses — JVM
        # options only apply when THIS call launches the JVM;
        # getOrCreate on an existing session ignores them, see docstring)
        .config(
            "spark.driver.extraJavaOptions",
            ("-XX:+UseParallelGC "
             # an explicit ParallelGCThreads in SPARK_GRAFT_JAVA_OPTS
             # suppresses the built-in cap so A/B harnesses can measure
             # a true uncapped baseline
             + ("-XX:ParallelGCThreads=8 "
                if n_threads <= 8
                and "ParallelGCThreads"
                not in os.environ.get("SPARK_GRAFT_JAVA_OPTS", "")
                else "")
             + os.environ.get("SPARK_GRAFT_JAVA_OPTS", "")).strip(),
        )
        # serve cached input without per-read lz4 decode: the decompress
        # runs on the JVM task threads CONCURRENTLY with the Python
        # kernels and was measured as the dominant cross-side contention
        # at high local parallelism (local[8] build walls ~6.3-8.0 s
        # compressed vs ~5.2-5.9 s uncompressed, same host phase)
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
    )
    # shuffle/spill directory override (A/B hook): this sandbox has no
    # swap, so only FILE-BACKED pages are reclaimable and the host's
    # page-cache reclaim can force shuffle reads back to the slow virtio
    # disk mid-query; a tmpfs local.dir keeps shuffle blocks RAM-resident
    # (tmpfs pages are unevictable without swap). JVM-launch config —
    # only applies when THIS call starts the JVM (see docstring).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    return b.getOrCreate()
