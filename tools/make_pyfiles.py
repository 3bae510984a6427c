"""Build the spark-submit --py-files artifact (north_rule deploy shape).

Produces dist/heavy_hitters_spark.zip containing the package, suitable
for:

    spark-submit --py-files dist/heavy_hitters_spark.zip your_job.py

The library is pure Python + numpy (no compiled extensions, no data
files), so a zip of the package tree is the entire deployment unit;
executors only additionally need numpy/pandas/pyarrow, which ship with
standard Spark runtime images.

Usage: python tools/make_pyfiles.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "heavy_hitters_spark.zip")
    pkg = os.path.join(ROOT, "heavy_hitters_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, ROOT))
    print(out)


if __name__ == "__main__":
    main()
