#!/usr/bin/env python
"""Per-query profile of the bench set (r12 optimization round, guide §1).

Runs every bench query with the bench's own policy (untimed warmup, then
one timed run) with ``spark.eventLog`` enabled and the query name set as
the job description, then parses the event log into per-query totals:

- wall seconds (the timed run)
- number of Spark JOBS the timed run launched (fixed-cost proxy: at
  sf0.1 most queries are job-overhead-dominated — BENCH_SF1 median
  scaling ratio 1.7 for 10x data)
- number of stages / tasks
- summed executorRunTime / executorCpuTime / JVM GC time
- shuffle read/write bytes, spill bytes
- Python eval time (from ArrowEvalPython/BatchEvalPython task metrics it
  is folded into executorRunTime; reported via stage names when present)

Usage: python tools_profile_r12.py [query ...]   (default: full bench set)
Writes PROFILE_r12.json and prints a table sorted by wall.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import data_pipeline_spark.queries_llm  # noqa: E402,F401
import data_pipeline_spark.queries_pipeline  # noqa: E402,F401
import data_pipeline_spark.queries_tpch  # noqa: E402,F401
from data_pipeline_spark.queries import QUERIES  # noqa: E402
from data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVLOG_DIR = "/tmp/spark_graft_evlog"


def main() -> None:
    from bench import BENCH_QUERIES

    names = sys.argv[1:] or BENCH_QUERIES
    os.makedirs(EVLOG_DIR, exist_ok=True)
    for old in Path(EVLOG_DIR).glob("*"):
        old.unlink()
    spark = get_spark(
        "profile_r12",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVLOG_DIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext

    walls: dict[str, float] = {}
    for name in names:
        if name not in QUERIES:
            continue
        QUERIES[name].spark(spark, SF_DIR).collect()  # warmup (untimed)
        sc.setJobDescription(f"PROF::{name}")
        t0 = time.perf_counter()
        QUERIES[name].spark(spark, SF_DIR).collect()
        walls[name] = round(time.perf_counter() - t0, 3)
        sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()

    # ---- parse the event log -------------------------------------------
    # Spark 4 rolling layout: eventlog_v2_<appid>/events_N_<appid>[.ext]
    ev_files: list[Path] = []
    d = Path(EVLOG_DIR) / f"eventlog_v2_{app_id}"
    if d.is_dir():
        ev_files = sorted(p for p in d.iterdir() if p.name.startswith("events"))
    else:
        ev_files = list(Path(EVLOG_DIR).glob(f"{app_id}*"))
    assert ev_files, f"no event log for {app_id} in {EVLOG_DIR}"

    job_of_stage: dict[int, int] = {}
    query_of_job: dict[int, str] = {}
    agg = defaultdict(lambda: defaultdict(float))

    def _lines():
        for p in ev_files:
            with open(p) as fh:
                yield from fh

    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                if desc.startswith("PROF::"):
                    q = desc[len("PROF::"):]
                    jid = ev["Job ID"]
                    query_of_job[jid] = q
                    agg[q]["jobs"] += 1
                    for sinfo in ev.get("Stage Infos", []):
                        job_of_stage[sinfo["Stage ID"]] = jid
            elif et == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                jid = job_of_stage.get(sid)
                q = query_of_job.get(jid)
                if q is None:
                    continue
                tm = ev.get("Task Metrics") or {}
                a = agg[q]
                a["tasks"] += 1
                a["run_ms"] += tm.get("Executor Run Time", 0)
                a["cpu_ms"] += tm.get("Executor CPU Time", 0) / 1e6
                a["gc_ms"] += tm.get("JVM GC Time", 0)
                a["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                a["result_bytes"] += tm.get("Result Size", 0)
                srm = tm.get("Shuffle Read Metrics") or {}
                a["shuf_read"] += srm.get("Remote Bytes Read", 0) + srm.get(
                    "Local Bytes Read", 0
                )
                a["fetch_wait_ms"] += srm.get("Fetch Wait Time", 0)
                swm = tm.get("Shuffle Write Metrics") or {}
                a["shuf_write"] += swm.get("Shuffle Bytes Written", 0)
                a["spill_disk"] += tm.get("Disk Bytes Spilled", 0)
                inm = tm.get("Input Metrics") or {}
                a["input_bytes"] += inm.get("Bytes Read", 0)
            elif et == "SparkListenerStageCompleted":
                sid = ev["Stage Info"]["Stage ID"]
                jid = job_of_stage.get(sid)
                q = query_of_job.get(jid)
                if q is not None:
                    agg[q]["stages"] += 1

    out = {}
    for q, wall in walls.items():
        a = agg.get(q, {})
        out[q] = {
            "wall_s": wall,
            "jobs": int(a.get("jobs", 0)),
            "stages": int(a.get("stages", 0)),
            "tasks": int(a.get("tasks", 0)),
            "run_s": round(a.get("run_ms", 0) / 1e3, 2),
            "cpu_s": round(a.get("cpu_ms", 0) / 1e3, 2),
            "gc_s": round(a.get("gc_ms", 0) / 1e3, 2),
            "shuf_read_mb": round(a.get("shuf_read", 0) / 1e6, 2),
            "shuf_write_mb": round(a.get("shuf_write", 0) / 1e6, 2),
            "input_mb": round(a.get("input_bytes", 0) / 1e6, 2),
            "spill_mb": round(a.get("spill_disk", 0) / 1e6, 2),
            "fetch_wait_s": round(a.get("fetch_wait_ms", 0) / 1e3, 2),
        }

    # targeted runs (explicit query args) must not clobber the committed
    # full-bench snapshot
    dest = (
        "PROFILE_r12.json" if not sys.argv[1:] else "/tmp/PROFILE_partial.json"
    )
    with open(dest, "w") as fh:
        json.dump({"sf_dir": SF_DIR, "queries": out}, fh, indent=1)

    hdr = (
        f"{'query':36} {'wall':>6} {'jobs':>4} {'stg':>4} {'task':>5} "
        f"{'run_s':>7} {'cpu_s':>7} {'gc':>5} {'shR_MB':>7} {'shW_MB':>7} "
        f"{'in_MB':>7} {'spill':>6}"
    )
    print(hdr)
    for q, m in sorted(out.items(), key=lambda kv: -kv[1]["wall_s"]):
        print(
            f"{q:36} {m['wall_s']:6.2f} {m['jobs']:4d} {m['stages']:4d} "
            f"{m['tasks']:5d} {m['run_s']:7.2f} {m['cpu_s']:7.2f} "
            f"{m['gc_s']:5.2f} {m['shuf_read_mb']:7.2f} "
            f"{m['shuf_write_mb']:7.2f} {m['input_mb']:7.2f} "
            f"{m['spill_mb']:6.1f}"
        )
    total = sum(m["wall_s"] for m in out.values())
    print(f"TOTAL wall {total:.1f}s over {len(out)} queries")


if __name__ == "__main__":
    main()
