#!/usr/bin/env python
"""Bench-policy timing for named queries: fresh session, per-query warmup +
min of N reps (default 2).  Usage: python tools_time_query.py q1 q2 ..."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import data_pipeline_spark.queries_llm  # noqa: E402,F401
import data_pipeline_spark.queries_pipeline  # noqa: E402,F401
import data_pipeline_spark.queries_tpch  # noqa: E402,F401
from data_pipeline_spark.queries import QUERIES  # noqa: E402
from data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))


def main() -> None:
    spark = get_spark("time_query", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    total = 0.0
    for name in sys.argv[1:]:
        QUERIES[name].spark(spark, SF_DIR).collect()
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            QUERIES[name].spark(spark, SF_DIR).collect()
            best = min(best, time.perf_counter() - t0)
        total += best
        print(f"{name:40s} {best:7.3f}s", flush=True)
    print(f"{'TOTAL':40s} {total:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
