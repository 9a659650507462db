#!/usr/bin/env python
"""Analyze the profiler's event log: per query, sum of job (end-start)
times vs the measured wall — the gap is driver-side work (py4j plan
construction, analysis/optimization, AQE re-planning, result fetch)."""
import json
import sys
from collections import defaultdict
from pathlib import Path

EVLOG_DIR = Path("/tmp/spark_graft_evlog")
prof = json.load(open("PROFILE_r12.json"))
walls = {q: m["wall_s"] for q, m in prof["queries"].items()}

ev_files = []
for d in sorted(EVLOG_DIR.iterdir()):
    if d.is_dir():
        ev_files += sorted(
            p for p in d.iterdir() if p.name.startswith("events")
        )
    elif d.name.startswith("local-"):
        ev_files.append(d)

job_q = {}
job_start = {}
jobtime = defaultdict(float)
njobs = defaultdict(int)
first_sub = {}
last_end = {}
for p in ev_files:
    for line in open(p):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        et = ev.get("Event")
        if et == "SparkListenerJobStart":
            desc = (ev.get("Properties") or {}).get("spark.job.description", "")
            if desc.startswith("PROF::"):
                q = desc[6:]
                job_q[ev["Job ID"]] = q
                job_start[ev["Job ID"]] = ev["Submission Time"]
                first_sub.setdefault(q, ev["Submission Time"])
        elif et == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            q = job_q.get(jid)
            if q is not None:
                dt = (ev["Completion Time"] - job_start[jid]) / 1e3
                jobtime[q] += dt
                njobs[q] += 1
                last_end[q] = ev["Completion Time"]

print(f"{'query':36} {'wall':>6} {'jobs':>4} {'jobsum':>7} {'gap':>6} {'gap%':>5}")
rows = []
for q, w in walls.items():
    js = jobtime.get(q, 0.0)
    gap = w - js
    rows.append((q, w, njobs.get(q, 0), js, gap))
for q, w, nj, js, gap in sorted(rows, key=lambda r: -r[4]):
    print(f"{q:36} {w:6.2f} {nj:4d} {js:7.2f} {gap:6.2f} {100*gap/w:5.0f}")
tw = sum(r[1] for r in rows)
tj = sum(r[3] for r in rows)
print(f"TOTAL wall {tw:.1f}  jobsum {tj:.1f}  gap {tw-tj:.1f}")
