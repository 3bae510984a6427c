"""Interleaved A/B of JVM/Arrow variants: alternating bracketed rounds
so multi-minute host phases hit every variant equally."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

VARIANTS = [
    ("base", {}),
    ("gc8", {"SPARK_GRAFT_JAVA_OPTS": "-XX:ParallelGCThreads=8"}),
    ("b8192", {"BENCH_ARROW_BATCH": "8192"}),
]
N_ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 2

for rnd in range(N_ROUNDS):
    for name, env in VARIANTS:
        for k in ("SPARK_GRAFT_JAVA_OPTS", "BENCH_ARROW_BATCH"):
            os.environ.pop(k, None)
        os.environ.update(env)
        rlo_a = bench.build_run_subprocess("local[2]", n_timed=2)
        rhi = bench.build_run_subprocess("local[8]", n_timed=4)
        rlo_b = bench.build_run_subprocess("local[2]", n_timed=2)
        lo = min(rlo_a["wall_sec"], rlo_b["wall_sec"])
        hi = rhi["wall_sec"]
        print(json.dumps({
            "round": rnd, "variant": name,
            "eff": round(lo / (4 * hi), 3),
            "wall_lo": round(lo, 2), "wall_hi": round(hi, 2),
            "walls_lo": rlo_a["wall_all"] + rlo_b["wall_all"],
            "walls_hi": rhi["wall_all"],
            "calibs": [rlo_a["calib_sec"], rhi["calib_sec"], rlo_b["calib_sec"]],
        }), flush=True)
