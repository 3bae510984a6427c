"""Break down the per-build serial term at a given master.

Phases per timed build:
  t_plan  — DataFrame construction (mapInArrow plan object)
  t_job   — Spark job submission + execution + Arrow collect
  t_fold  — driver-side unpack + fold of the partial states
  t_tmpl  — template construction + pack_state
Also reports sum of task wall_ms (parallel kernel time) so
serial ~= t_job - max_task_wall can be estimated.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from heavy_hitters_spark.core.base import pack_state, unpack_state
from heavy_hitters_spark.spark import get_spark
from heavy_hitters_spark.spark.aggregate import PARTIAL_SCHEMA
from heavy_hitters_spark.spark.fused import _fused_fn

master = sys.argv[1] if len(sys.argv) > 1 else "local[8]"
n_timed = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark(master, app=f"prof-{master}", arrow_batch=2048)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(bench.PAGES_DIR).select("text").repartition(bench.BENCH_PARTS).cache()
n_docs = pages.count()

# warm-up (full build, untimed)
t0 = time.perf_counter()
tmpl = bench._tmpl()
tb = pack_state(tmpl)
t_tmpl = time.perf_counter() - t0

part_df = pages.select("text").mapInArrow(_fused_fn(tb, "text"), PARTIAL_SCHEMA)
part_df.collect()  # warm-up

for i in range(n_timed):
    t0 = time.perf_counter()
    tmpl2 = bench._tmpl()
    tb2 = pack_state(tmpl2)
    t_tmpl2 = time.perf_counter() - t0

    t0 = time.perf_counter()
    pdf = pages.select("text").mapInArrow(_fused_fn(tb2, "text"), PARTIAL_SCHEMA)
    t_plan = time.perf_counter() - t0

    t0 = time.perf_counter()
    rows = pdf.collect()
    t_job = time.perf_counter() - t0

    t0 = time.perf_counter()
    acc = unpack_state(rows[0]["state"])
    for r in rows[1:]:
        acc = acc.merge(unpack_state(r["state"]))
    t_fold = time.perf_counter() - t0

    task_walls = sorted(r["wall_ms"] / 1000.0 for r in rows)
    total = t_tmpl2 + t_plan + t_job + t_fold
    print(
        f"[{master}] build {i}: total={total:.3f} tmpl={t_tmpl2:.3f} "
        f"plan={t_plan:.3f} job={t_job:.3f} fold={t_fold:.3f} "
        f"task_sum={sum(task_walls):.2f} task_max={task_walls[-1]:.3f} "
        f"task_min={task_walls[0]:.3f} "
        f"job-minus-ideal={t_job - sum(task_walls)/int(master.split('[')[1].rstrip(']')):.3f}"
    )

# now the PLAN-REUSED variant: same job, collect the SAME DataFrame
print("--- plan-reused collects ---")
for i in range(n_timed):
    t0 = time.perf_counter()
    rows = part_df.collect()
    t_job = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = unpack_state(rows[0]["state"])
    for r in rows[1:]:
        acc = acc.merge(unpack_state(r["state"]))
    t_fold = time.perf_counter() - t0
    task_walls = sorted(r["wall_ms"] / 1000.0 for r in rows)
    print(
        f"[{master}] reuse {i}: total={t_job + t_fold:.3f} job={t_job:.3f} "
        f"fold={t_fold:.3f} task_sum={sum(task_walls):.2f} task_max={task_walls[-1]:.3f} "
        f"job-minus-ideal={t_job - sum(task_walls)/int(master.split('[')[1].rstrip(']')):.3f}"
    )
spark.stop()
