"""Launch the official bench run when the host phase is healthy.

Pre-run host SELECTION only (VERDICT r04 directive #4: "run the
official bench early and re-run if the host probes of the final
snapshot run exceed ~1.15x the day's median probe") — the in-run
probe + sanity gates are unchanged and pre-registered in bench.py.
Criterion: 3 consecutive readings, 60 s apart, with the single-thread
probe t1 <= THRESH (healthy-day reference 0.044; today's degraded
phases read 0.051-0.068) and no foreign java/pytest load running.
Every reading is logged; on trigger, runs `python bench.py` and tees
its stdout to BENCH/official_run.out.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.phase_probe import probe_once  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESH = float(os.environ.get("HEALTHY_T1", "0.048"))
NEED = 3
MAX_WAIT_S = float(os.environ.get("MAX_WAIT_S", "7200"))


def foreign_load() -> bool:
    out = subprocess.run(
        ["ps", "-eo", "comm,args"], capture_output=True, text=True
    ).stdout
    return ("java" in out) or ("pytest" in out)


streak = 0
t_start = time.time()
while True:
    busy = foreign_load()
    r = probe_once()
    r["foreign_load"] = busy
    print(json.dumps(r), flush=True)
    streak = streak + 1 if (r["t1"] <= THRESH and not busy) else 0
    timed_out = time.time() - t_start > MAX_WAIT_S
    if streak >= NEED or timed_out:
        if timed_out:
            print(json.dumps({"note": "MAX_WAIT_S exceeded; launching anyway"}),
                  flush=True)
        break
    time.sleep(60)

print(json.dumps({"launch": time.strftime("%H:%M:%S")}), flush=True)
with open(os.path.join(REPO, "BENCH", "official_run.out"), "w") as f:
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        stdout=f, stderr=subprocess.STDOUT, cwd=REPO,
    ).returncode
print(json.dumps({"bench_rc": rc}), flush=True)
