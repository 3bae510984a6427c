"""Interleaved A/B: does the side-channel streaming merge slow the
one-shot query-path builds (point_freq_cm & friends) at local[32]?

Each measurement is a FRESH subprocess (session reuse degrades local
mode); variants alternate round by round (host phases dominate
sequential blocks — see BENCH/BASELINE.md protocol notes). Inside a
subprocess: build the session, run the query once (warm-up), then
time N runs; report all walls plus a host probe.

Usage: python tools/exp_sidech_query.py [rounds=4] [query=point_freq_cm]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import bench
probe = bench.host_calibration()
from heavy_hitters_spark.spark.session import get_spark
import __spark_entry__ as entry
spark = get_spark(master="local[%(cpus)d]")
q = entry.queries()[%(query)r]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
q(spark, sf).collect()  # warm-up
walls = []
for _ in range(%(reps)d):
    t0 = time.perf_counter()
    q(spark, sf).collect()
    walls.append(round(time.perf_counter() - t0, 3))
print(json.dumps({"probe": round(probe, 4), "walls": walls}))
"""


def run_one(query: str, sidech: str, reps: int = 3, cpus: int = 32) -> dict:
    env = dict(os.environ, SKETCH_SIDECH=sidech)
    code = CHILD % {"repo": REPO, "query": query, "reps": reps, "cpus": cpus}
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env, cwd=REPO
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        return {"error": out.stderr[-2000:]}
    return json.loads(line[-1])


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    query = sys.argv[2] if len(sys.argv) > 2 else "point_freq_cm"
    results = {"0": [], "1": []}
    for r in range(rounds):
        order = ["1", "0"] if r % 2 else ["0", "1"]
        for v in order:
            rec = run_one(query, v)
            results[v].append(rec)
            print(f"round {r} sidech={v}: {json.dumps(rec)}", flush=True)
    for v in ("0", "1"):
        walls = [min(r["walls"]) for r in results[v] if "walls" in r]
        if walls:
            print(
                f"sidech={v}: per-subprocess min walls {walls} "
                f"median {sorted(walls)[len(walls) // 2]}"
            )


if __name__ == "__main__":
    main()
