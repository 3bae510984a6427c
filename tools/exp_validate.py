"""Validation: N bracketed rounds with the current engine defaults
(threaded fold + GC cap), same shape as official bench rounds."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3
for rnd in range(N):
    rlo_a = bench.build_run_subprocess("local[2]", n_timed=2)
    rhi = bench.build_run_subprocess("local[8]", n_timed=4)
    rlo_b = bench.build_run_subprocess("local[2]", n_timed=2)
    lo = min(rlo_a["wall_sec"], rlo_b["wall_sec"])
    hi = rhi["wall_sec"]
    print(json.dumps({
        "round": rnd, "eff": round(lo / (4 * hi), 3),
        "wall_lo": round(lo, 2), "wall_hi": round(hi, 2),
        "walls_lo": rlo_a["wall_all"] + rlo_b["wall_all"],
        "walls_hi": rhi["wall_all"],
        "calibs": [rlo_a["calib_sec"], rhi["calib_sec"], rlo_b["calib_sec"]],
    }), flush=True)
