#!/usr/bin/env python
"""Min-of-N walls for the named queries in ONE session (bench policy:
warmup + min of reps).  Usage: tools_bracket.py q1 q2 ... [--reps N]"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import data_pipeline_spark.queries_llm  # noqa
import data_pipeline_spark.queries_pipeline  # noqa
import data_pipeline_spark.queries_tpch  # noqa
from data_pipeline_spark.queries import QUERIES
from data_pipeline_spark.session import get_spark

args = [a for a in sys.argv[1:] if not a.startswith("--")]
reps = 3
for a in sys.argv[1:]:
    if a.startswith("--reps="):
        reps = int(a.split("=")[1])
SF = "/root/testdata/sf0.1"
spark = get_spark("bracket")
out = {}
for name in args:
    QUERIES[name].spark(spark, SF).collect()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        QUERIES[name].spark(spark, SF).collect()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
for k, v in out.items():
    print(f"{v:7.3f} {k}")
spark.stop()
