"""Host-phase probe: single-thread AND multi-thread memory-bandwidth
stamps. The official bench's per-subprocess gate uses the
single-thread probe (bench.host_calibration); this tool adds an
8-thread aggregate-bandwidth reading because the degradation mode that
actually moves the lo/hi efficiency ratio is multi-core bandwidth
contention, which a single-threaded probe cannot see (today's record:
probes 0.044-0.057 while hi-level walls ran 25% slow). Used to TIME
the launch of an official run (pre-run host selection, endorsed by
VERDICT r04 directive #4), never to gate or select rounds inside one.

Usage: python tools/phase_probe.py [--watch SECONDS]
Prints one JSON line per reading: {"t1": sec, "t8": sec, "agg_ratio": x}
t1     — single-thread 200 MB multiply+reduce (bench.host_calibration)
t8     — wall for 8 threads each doing the same pass concurrently
agg_ratio — t8/t1: 1.0 = perfect multicore bandwidth, higher = contended
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_ARRS = None  # allocated once; first-touch faults are ~10 MB/s here


def probe_once():
    import numpy as np

    from heavy_hitters_spark.core import memtune  # noqa: F401
    import bench

    t1 = bench.host_calibration(passes=3)
    global _ARRS
    if _ARRS is None:
        # 8 x 32 MB: larger than LLC, small enough that the one-time
        # sandbox page-fault cost (~25 s total) is paid once per process
        _ARRS = [np.ones(4_000_000) for _ in range(8)]
        for a in _ARRS:
            a *= 1.0
    arrs = _ARRS
    barrier = threading.Barrier(9)

    def work(a):
        barrier.wait()
        a *= 1.000001
        float(a.sum())

    threads = [threading.Thread(target=work, args=(a,)) for a in arrs]
    for th in threads:
        th.start()
    barrier.wait()
    t0 = time.perf_counter()
    for th in threads:
        th.join()
    t8 = time.perf_counter() - t0
    # bytes moved: multiply = read+write (2x), sum = read (1x) => 3x size
    bw1 = 3 * 200e6 / t1 / 1e9
    bw8 = 3 * 8 * 32e6 / t8 / 1e9
    return {"ts": time.strftime("%H:%M:%S"), "t1": round(t1, 4),
            "t8": round(t8, 4), "bw1_gbs": round(bw1, 1),
            "bw8_gbs": round(bw8, 1)}


if __name__ == "__main__":
    if "--watch" in sys.argv:
        period = float(sys.argv[sys.argv.index("--watch") + 1])
        while True:
            print(json.dumps(probe_once()), flush=True)
            time.sleep(period)
    else:
        print(json.dumps(probe_once()))
