"""Supplementary per-query benchmark harness (bench.py is FROZEN for
measurement; this file exists for optimization-round instrumentation
only — guide §1.4).

Times any subset of the declared queries at any SF dir with the same
methodology as bench.time_queries (one untimed warm-up run, report the
second steady-state run, .collect() sink since outputs are tiny), and
can dump .explain("formatted") per query.

Usage:
  python bench_extra.py [--sf DIR] [--explain OUTDIR] [--runs N] [q ...]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None, help="dir to write <q>.txt explain dumps")
    ap.add_argument("--runs", type=int, default=1, help="timed runs after warm-up")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from heavy_hitters_spark.spark import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(args.master or f"local[{cpus}]", app="bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    all_q = entry_mod.queries()
    names = args.queries or list(all_q)
    out: dict[str, object] = {}
    for name in names:
        fn = all_q[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        try:
            if args.explain:
                os.makedirs(args.explain, exist_ok=True)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    fn(spark, args.sf).explain("formatted")
                with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                    f.write(buf.getvalue())
            fn(spark, args.sf).collect()  # warm-up
            walls = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn(spark, args.sf).collect()
                walls.append(round(time.perf_counter() - t0, 3))
            out[name] = walls[0] if args.runs == 1 else walls
            print(f"# {name}: {out[name]}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            out[name] = -1.0
            print(f"# query {name} FAILED: {e}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"sf": args.sf, "queries": out}))


if __name__ == "__main__":
    main()
