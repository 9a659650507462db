#!/usr/bin/env python
"""Split per-query driver gap: python plan construction vs Catalyst
analysis+optimization vs execution.  Warmed (2nd iteration reported)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import data_pipeline_spark.queries_llm  # noqa
import data_pipeline_spark.queries_pipeline  # noqa
import data_pipeline_spark.queries_tpch  # noqa
from data_pipeline_spark.queries import QUERIES
from data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
names = sys.argv[1:] or [
    "zorder_curve_keys", "ivfpq_ann_topk", "pq_ann_topk",
    "sessionize_events", "minhash_lsh_candidates", "q1_pricing_summary",
    "ngram_repetition_filter", "envelope_roundtrip", "q5_local_supplier_volume",
    "revenue_by_nation",
]
spark = get_spark("gapsplit")
print(f"{'query':34} {'build':>7} {'opt':>7} {'exec':>7} {'total':>7}")
for name in names:
    for it in range(2):
        t0 = time.perf_counter()
        df = QUERIES[name].spark(spark, SF)
        t1 = time.perf_counter()
        df._jdf.queryExecution().optimizedPlan()
        t2 = time.perf_counter()
        df.collect()
        t3 = time.perf_counter()
    print(
        f"{name:34} {t1-t0:7.3f} {t2-t1:7.3f} {t3-t2:7.3f} {t3-t0:7.3f}"
    )
spark.stop()
