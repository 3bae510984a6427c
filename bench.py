"""Benchmark job (BASELINE.md targets).

Headline: sketch-update + merge throughput (docs/sec) for a one-pass
multi-sketch build (CountMin + HLL + KLL + DyadicHH) over the tokens of
a synthesized Common-Crawl-style ``pages`` table, run at TWO
parallelism levels — local[8] and local[32] — as the sandbox proxy for
N vs 4N executors (driver instruction). Reports throughput at both and
scaling efficiency = rate32 / (4 * rate8); target >= 0.8.

Also times each driver-gated query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) and emits ONE JSON line:
  {"metric": ..., "value": <total suite sec>, "unit": "sec",
   "queries": {...}, "sf": ..., ...extras}

Results are appended in human-readable form to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from heavy_hitters_spark.core import (  # noqa: E402
    HLL,
    KLL,
    CountMin,
    MisraGries,
    MultiSketch,
    SeedStream,
)
from heavy_hitters_spark.hh import DyadicHH  # noqa: E402
from heavy_hitters_spark.spark import build_sketch, get_spark, key_id_col, tokens  # noqa: E402
from heavy_hitters_spark.spark.keys import MASK32  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
PAGES_N = int(os.environ.get("BENCH_PAGES_ROWS", "60000"))
PAGES_DIR = os.path.join(BENCH_DIR, "data", f"pages_{PAGES_N}")


def _tmpl() -> MultiSketch:
    return MultiSketch(
        {
            "cm": CountMin(width=1 << 18, depth=5, seed_stream=SeedStream(1234, 5678)),
            "hll": HLL(p=14),
            "kll": KLL(k=200),
            "hh": DyadicHH(
                phi=0.001, epsilon=0.0005, delta=0.05, m=MASK32, gran=8,
                seed_stream=SeedStream(1234, 5678),
            ),
        }
    )


def ensure_pages() -> None:
    if os.path.exists(os.path.join(PAGES_DIR, "_SUCCESS")):
        return
    from heavy_hitters_spark.io import pages_df

    spark = get_spark(f"local[{CPUS}]", app="bench-gen")
    spark.sparkContext.setLogLevel("ERROR")
    pages_df(spark, PAGES_N, partitions=64).write.mode("overwrite").parquet(PAGES_DIR)
    spark.stop()


def build_run(master: str) -> dict:
    """One full sketch-update + tree-merge pass; returns timing."""
    spark = get_spark(master, app=f"bench-{master}")
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(PAGES_DIR)
    n_docs = pages.count()
    ids = tokens(pages).withColumn("id", key_id_col("token"))
    # warm-up (JIT + page-fault first-touch in workers), small slice
    build_sketch(ids.limit(20000), _tmpl(), id_col="id")
    t0 = time.perf_counter()
    sk, metrics = build_sketch(ids, _tmpl(), id_col="id")
    wall = time.perf_counter() - t0
    spark.stop()
    return {
        "master": master,
        "wall_sec": wall,
        "docs": n_docs,
        "docs_per_sec": n_docs / wall,
        "updates": metrics["n_updates"],
        "updates_per_sec": metrics["n_updates"] / wall,
        "hll_distinct_est": float(sk["hll"].estimate()),
    }


def time_queries() -> dict[str, float]:
    import __spark_entry__ as entry_mod

    spark = get_spark(f"local[{CPUS}]", app="bench-queries")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
            df.collect()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            out[name] = -1.0
            print(f"# query {name} failed: {e}", file=sys.stderr)
    spark.stop()
    return out


def main() -> None:
    os.makedirs(BENCH_DIR, exist_ok=True)
    ensure_pages()
    r8 = build_run("local[8]")
    r32 = build_run(f"local[{CPUS}]")
    eff = r32["docs_per_sec"] / (4.0 * r8["docs_per_sec"])
    queries = time_queries()
    total = sum(v for v in queries.values() if v > 0) + r8["wall_sec"] + r32["wall_sec"]
    result = {
        "metric": "sketch_build_and_query_suite",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "pages_rows": PAGES_N,
        "docs_per_sec_local8": round(r8["docs_per_sec"], 1),
        "docs_per_sec_local32": round(r32["docs_per_sec"], 1),
        "updates_per_sec_local32": round(r32["updates_per_sec"], 1),
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    with open(os.path.join(BENCH_DIR, "BASELINE.md"), "a") as f:
        f.write(
            f"\n## bench run {time.strftime('%Y-%m-%d %H:%M:%S')}\n\n"
            f"| metric | value |\n|---|---|\n"
            f"| pages rows | {PAGES_N} |\n"
            f"| token updates | {r32['updates']} |\n"
            f"| docs/sec local[8] | {r8['docs_per_sec']:.1f} |\n"
            f"| docs/sec local[{CPUS}] | {r32['docs_per_sec']:.1f} |\n"
            f"| updates/sec local[{CPUS}] | {r32['updates_per_sec']:.1f} |\n"
            f"| scaling efficiency 8->{CPUS} (target >= 0.8) | {eff:.3f} |\n"
            f"| query timings (sec) | {json.dumps(queries)} |\n"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
