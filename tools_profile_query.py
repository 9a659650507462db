#!/usr/bin/env python
"""Per-job wall-time attribution for one or more catalog queries.

Usage: python tools_profile_query.py <name> [name ...]

Runs each query with the bench policy (1 warmup + 1 timed rep) on a UI-enabled
session, then reads the Spark UI REST API to list every job the timed rep ran:
duration, stage count, shuffle bytes, task count.  This separates
query-CONSTRUCTION jobs (driver probes, sidecar builds, iterative convergence
loops) from the final action — the sf0.1 bench is fixed-cost-dominated, so job
count is often the lever, not bytes.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import data_pipeline_spark.queries_llm  # noqa: E402,F401
import data_pipeline_spark.queries_pipeline  # noqa: E402,F401
import data_pipeline_spark.queries_tpch  # noqa: E402,F401
from data_pipeline_spark.queries import QUERIES  # noqa: E402
from data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    app = rest("applications")[0]["id"]
    for name in names:
        # warmup (codegen, sidecars, caches)
        QUERIES[name].spark(spark, SF_DIR).collect()
        jobs_before = {j["jobId"] for j in rest(f"applications/{app}/jobs")}
        t0 = time.perf_counter()
        tb0 = time.perf_counter()
        df = QUERIES[name].spark(spark, SF_DIR)
        t_build = time.perf_counter() - tb0
        df.collect()
        wall = time.perf_counter() - t0
        jobs = [
            j
            for j in rest(f"applications/{app}/jobs")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: wall {wall:.3f}s (df-construction {t_build:.3f}s), "
              f"{len(jobs)} jobs ===")
        total_job = 0.0
        for j in jobs:
            t_sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            dur = None
            if j.get("completionTime"):
                from datetime import datetime

                dt = datetime.strptime(
                    j["completionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f"
                ) - datetime.strptime(
                    j["submissionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f"
                )
                dur = dt.total_seconds()
                total_job += dur
            print(
                f"  job {j['jobId']:>4} {dur if dur is not None else '?':>7}s "
                f"stages={len(j['stageIds'])} tasks={j['numTasks']:>5} "
                f"{(j.get('description') or j.get('name') or '')[:90]}"
            )
        print(f"  sum(job durations) {total_job:.3f}s; "
              f"gap (driver/scheduling) {wall - total_job:.3f}s")
        job_stage_ids = {s for j in jobs for s in j["stageIds"]}
        stages = [
            s
            for s in rest(f"applications/{app}/stages")
            if s["stageId"] in job_stage_ids and s["status"] == "COMPLETE"
        ]
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print("  slowest stages (executorRunTime desc):")
        for s in stages[:8]:
            print(
                f"    stage {s['stageId']:>4} run={s['executorRunTime']/1e3:6.2f}s "
                f"tasks={s['numCompleteTasks']:>4} "
                f"shR={s.get('shuffleReadBytes',0)>>10}K "
                f"shW={s.get('shuffleWriteBytes',0)>>10}K "
                f"{s['name'][:80]}"
            )
        if os.environ.get("PROFILE_SQL"):
            execs = rest(f"applications/{app}/sql?length=200")
            execs.sort(key=lambda e: -e["id"])
            top = execs[0]
            print(f"  SQL exec {top['id']} ({top['duration']}ms): node metrics")
            for node in top.get("nodes", []):
                mets = {
                    m["name"]: m["value"]
                    for m in node.get("metrics", [])
                    if any(
                        k in m["name"]
                        for k in (
                            "time",
                            "rows",
                            "bytes",
                        )
                    )
                }
                keep = {
                    k: v
                    for k, v in mets.items()
                    if "rows" in k or "time" in k
                }
                if keep:
                    print(f"    [{node['nodeId']:>3}] {node['nodeName'][:45]:45s} {keep}")
    spark.stop()


if __name__ == "__main__":
    main()
