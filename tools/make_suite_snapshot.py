"""Collect SUITE_rNN.json — one fresh process per BASELINE config.

Each config runs in its own interpreter (the honest cross-process protocol:
no shared jit caches, each line is what a user would measure from a cold
script with a warm AOT/export cache). Config 1 runs three fresh processes
and keeps the median line (verdict r4 next #6: "median of 3 fresh
processes").

Usage: python tools/make_suite_snapshot.py SUITE_r05.json
"""
import json
import subprocess
import sys

out_path = sys.argv[1] if len(sys.argv) > 1 else "SUITE_r05.json"

def run_config(n):
    r = subprocess.run(
        [sys.executable, "bench_suite.py", "--config", str(n)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    sys.stderr.write(r.stderr[-2000:])
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"config {n} produced no JSON (exit {r.returncode})")
    return json.loads(lines[-1])

records = []

# config 1: median of 3 fresh processes
c1 = [run_config(1) for _ in range(3)]
c1.sort(key=lambda r: r["value"])
med = c1[1]
med["detail"]["fresh_process_values"] = [r["value"] for r in c1]
records.append(med)
print(json.dumps(med), flush=True)

for n in (2, 3, 4, 5):
    rec = run_config(n)
    records.append(rec)
    print(json.dumps(rec), flush=True)

with open(out_path, "w") as f:
    for rec in records:
        f.write(json.dumps(rec) + "\n")
print(f"wrote {out_path} ({len(records)} configs)", file=sys.stderr)
