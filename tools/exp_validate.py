"""Validation: N bracketed rounds with the current engine defaults
(bench.bracket_round is the shared measurement unit)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3
for rnd in range(N):
    print(json.dumps(dict(round=rnd, **bench.bracket_round())), flush=True)
