"""Interleaved A/B of env-var variants: alternating bracketed rounds so
multi-minute host phases hit every variant equally. Usage:
  python tools/exp_interleaved.py N 'name1=ENV=V,ENV2=V2' 'name2='
An explicit ParallelGCThreads in SPARK_GRAFT_JAVA_OPTS suppresses
get_spark's built-in narrow-session cap, so a true uncapped baseline is
'base=SPARK_GRAFT_JAVA_OPTS=-XX:ParallelGCThreads=23'."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2
specs = sys.argv[2:] or ["base=", "gc23=SPARK_GRAFT_JAVA_OPTS=-XX:ParallelGCThreads=23"]
VARIANTS = []
for spec in specs:
    name, _, envs = spec.partition("=")
    env = {}
    if envs:
        for kv in envs.split(","):
            k, _, v = kv.partition("=")
            env[k] = v
    VARIANTS.append((name, env))
ALL_KEYS = sorted({k for _, e in VARIANTS for k in e})

for rnd in range(N):
    for name, env in VARIANTS:
        for k in ALL_KEYS:
            os.environ.pop(k, None)
        os.environ.update(env)
        print(json.dumps(dict(round=rnd, variant=name, **bench.bracket_round())), flush=True)
