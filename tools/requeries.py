"""Re-time the driver query suite alone (no build rounds), stamped
with pre/post host probes, and append an addendum row to
BENCH/BASELINE.md. Used when the main run's query phase landed in a
degraded host window (the probes in the appended record show which)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

pre = bench.host_calibration()
t0 = time.time()
queries = bench.time_queries()
post = bench.host_calibration()
prev_name, prev_walls, _src = bench.baseline_walls()
regressions = bench.compute_regressions(queries, prev_walls)
n_compared = sum(1 for q in queries if q in prev_walls and prev_walls[q] > 0)
rec = {
    "kind": "query_walls_addendum",
    "probe_pre_sec": round(pre, 4),
    "probe_post_sec": round(post, 4),
    "queries": queries,
    "total_sec": round(sum(v for v in queries.values() if v > 0), 3),
    "regressions_vs": prev_name,
    "regressions_baseline_coverage": f"{n_compared}/{len(queries)}",
    "regressions": regressions,
}
print(json.dumps(rec))
with open(os.path.join(bench.BENCH_DIR, "BASELINE.md"), "a") as f:
    f.write(
        f"\n### query-walls addendum {time.strftime('%Y-%m-%d %H:%M:%S')}\n\n"
        "Query phase re-run alone (same steady-state rule: warm-up run, "
        "report second run). Host probes before/after stamp the phase; "
        "compare with the per-round probes of the main record above.\n\n"
        f"| probes (pre/post) | {rec['probe_pre_sec']} / {rec['probe_post_sec']} |\n"
        f"|---|---|\n"
        f"| query timings (sec) | {json.dumps(queries)} |\n"
        f"| regressions > 1.5x vs {prev_name or 'n/a'} | {json.dumps(regressions)} |\n"
    )
