"""Why does the hi level (local[8]) lose throughput at 800k pages?

One fresh subprocess per (pages, master) cell, mirroring
bench.build_run exactly (blob input, prepared builder, side channel),
plus -Xlog:gc to a file. Reports per-pass walls, per-doc rate, and
total GC pause seconds per timed region.

Usage: python tools/exp_hi_scale.py [cells...]
  default cells: 200000:local[8] 800000:local[8]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, re, sys, time
sys.path.insert(0, %(repo)r)
import bench
from heavy_hitters_spark.spark.session import get_spark
from heavy_hitters_spark.spark.fused import TokenSketchBuilder, pack_arrow_blobs

probe = bench.host_calibration()
gclog = %(gclog)r
spark = get_spark(%(master)r, app="exp-hi-scale", arrow_batch=2048)
spark.sparkContext.setLogLevel("ERROR")
base = spark.read.parquet(%(pages_dir)r).select("text").repartition(16)
pages = pack_arrow_blobs(base, ["text"]).cache()
pages.count()

builder = TokenSketchBuilder(
    pages, bench._tmpl(), text_col="text", fanin=64, n_hint=16,
    blob_col="blob", side_channel=True,
)
builder.run()  # warm-up


def gc_secs():
    try:
        tot = 0.0
        with open(gclog) as f:
            for line in f:
                if "Pause" not in line:
                    continue
                m = re.search(r"([0-9.]+)ms\s*$", line)
                if m:
                    tot += float(m.group(1)) / 1000.0
        return tot
    except OSError:
        return -1.0


walls, gcs = [], []
for _ in range(4):
    g0 = gc_secs()
    t0 = time.perf_counter()
    sk, m = builder.run()
    walls.append(round(time.perf_counter() - t0, 3))
    gcs.append(round(gc_secs() - g0, 3))
builder.close()
print(json.dumps({
    "probe": round(probe, 4), "walls": walls, "gc_pause_s": gcs,
    "n_docs": m["n_rows"], "n_updates": m["n_updates"],
    "kernel_wall_ms_sum": m["wall_ms"],
}))
"""


def run_cell(pages_n: int, master: str) -> dict:
    gclog = f"/tmp/exp_gc_{pages_n}_{master.replace('[','').replace(']','')}.log"
    if os.path.exists(gclog):
        os.remove(gclog)
    env = dict(
        os.environ,
        SPARK_GRAFT_JAVA_OPTS=f"-Xlog:gc:{gclog}",
    )
    code = CHILD % {
        "repo": REPO,
        "master": master,
        "pages_dir": os.path.join(REPO, "BENCH", "data", f"pages_{pages_n}"),
        "gclog": gclog,
    }
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env, cwd=REPO
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        return {"error": out.stderr[-2000:]}
    rec = json.loads(line[-1])
    rec["docs_per_sec_best"] = round(rec["n_docs"] / min(rec["walls"]), 1)
    return rec


def main():
    cells = sys.argv[1:] or ["200000:local[8]", "800000:local[8]"]
    for cell in cells:
        pages_s, master = cell.split(":", 1)
        rec = run_cell(int(pages_s), master)
        print(f"{cell}: {json.dumps(rec)}", flush=True)


if __name__ == "__main__":
    main()
