"""Isolate JVM->Python serving scaling: a no-op kernel (drain batches,
count rows) over the same cached input, lo vs hi, fresh subprocesses.
If serving alone loses efficiency 2->8, the inflation of build task
walls at hi is JVM-side serving contention, not the sketch kernels."""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CODE = r"""
import sys, time, json
sys.path.insert(0, %(repo)r)
import bench
from heavy_hitters_spark.spark import get_spark
import pyarrow as pa

spark = get_spark(%(master)r, app="serve-probe", arrow_batch=2048)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(bench.PAGES_DIR).select("text").repartition(bench.BENCH_PARTS).cache()
pages.count()

def drain(batches):
    n = 0
    t0 = time.perf_counter()
    for b in batches:
        n += b.num_rows
    yield pa.RecordBatch.from_pydict({"n": [n], "wall_ms": [(time.perf_counter()-t0)*1000]})

df = pages.mapInArrow(drain, "n long, wall_ms double")
df.collect()  # warm-up
walls = []
for _ in range(4):
    t0 = time.perf_counter()
    rows = df.collect()
    walls.append(round(time.perf_counter() - t0, 3))
task = sorted(r["wall_ms"]/1000 for r in rows)
print("SERVEJSON:" + json.dumps({
    "master": %(master)r, "walls": walls, "min": min(walls),
    "task_sum": round(sum(task), 2), "task_max": round(task[-1], 3)}))
spark.stop()
"""

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for master in ["local[2]", "local[8]", "local[2]"]:
    out = subprocess.run(
        [sys.executable, "-c", CODE % {"repo": repo, "master": master}],
        capture_output=True, text=True, cwd=repo, timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("SERVEJSON:"):
            print(line[len("SERVEJSON:"):], flush=True)
            break
    else:
        print("FAILED", master, out.stderr[-500:], flush=True)
