"""A/B: JVM option variants vs scaling efficiency (bracketed lo-hi-lo,
fresh subprocesses — same shape as one bench round per variant)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

VARIANTS = {
    "base": "",
    "gc8": "-XX:ParallelGCThreads=8",
    "gc4": "-XX:ParallelGCThreads=4",
}

for name, opts in VARIANTS.items():
    os.environ["SPARK_GRAFT_JAVA_OPTS"] = opts
    rlo_a = bench.build_run_subprocess("local[2]", n_timed=2)
    rhi = bench.build_run_subprocess("local[8]", n_timed=4)
    rlo_b = bench.build_run_subprocess("local[2]", n_timed=2)
    lo = min(rlo_a["wall_sec"], rlo_b["wall_sec"])
    hi = rhi["wall_sec"]
    print(json.dumps({
        "variant": name,
        "wall_lo": round(lo, 2),
        "wall_hi": round(hi, 2),
        "eff": round(lo / (4 * hi), 3),
        "walls_lo": rlo_a["wall_all"] + rlo_b["wall_all"],
        "walls_hi": rhi["wall_all"],
        "calibs": [rlo_a["calib_sec"], rhi["calib_sec"], rlo_b["calib_sec"]],
    }), flush=True)
