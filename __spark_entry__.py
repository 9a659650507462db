"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()``/``oracle_sql()`` expose the full catalog from
``data_pipeline_spark.queries`` (each Spark implementation paired with the
ANSI SQL its DuckDB oracle runs on the same parquet tables).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

import data_pipeline_spark.queries_llm  # noqa: E402,F401  (registers LLM ops)
import data_pipeline_spark.queries_pipeline  # noqa: E402,F401  (registers wire ops)
import data_pipeline_spark.queries_tpch  # noqa: E402,F401  (registers TPC-H shapes)
from data_pipeline_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


# The driver verifies the first 50 registrations only, so order the catalog
# by evidence need (re-ranked each round): queries that have never received a
# driver verdict come first, queries whose code or oracle changed this round
# second, and a representative spread of the long-green set fills the
# remaining window; the rest follow.
_PRIORITY = [
    # -- r7 evidence targets -------------------------------------------------
    # never driver-verified (registered r6 outside the window) + changed r7
    # (capped posting-list pairing)
    "simhash64_neardup_pairs",
    "simhash_neardup_pairs",
    # r7-changed paths: 4-format codec fixture + vectorized kernels
    # (multimodal), SecureRandom IVs + ciphertext-prefix meta (encrypted
    # wire), publish-id-tagged sidecar reservations (every publish path)
    "multimodal_real_decode",
    "multimodal_features",
    "multimodal_frame_pipeline",
    "encrypted_transport_roundtrip",
    "wire_key_roundtrip",
    "topic_transport_roundtrip",
    "envelope_roundtrip",
    # -- longest-unverified tail: last driver verdict was ROUND 2 ------------
    "tailer_projection",
    "refresh_scan_stats",
    "customers_without_orders",
    "priority_queue_head",
    "top_orders_by_price",
    "topic_set_difference",
    "rollup_event_counts",
    "first_event_at_or_after",
    "sliding_value_avg",
    "cube_lineitem_counts",
    "distinct_users_per_type",
    "pii_redacted_display",
    "q3_shipping_priority",
    "q4_order_priority_check",
    "q6_revenue_forecast",
    "q12_shipmode_priority",
    "q14_promo_revenue_share",
    "cdc_snapshot_apply",
    "q18_large_orders",
    "event_type_intersection",
    "q11_important_parts",
    "namespace_parse",
    "dq_column_stats",
    "sql_api_top_suppliers",
    "doc_text_stats",
    "doc_quality_scores",
    "doc_lang_id",
    "doc_fingerprints",
    "multimodal_meta",
    # -- new in r7, never driver-verified ------------------------------------
    "neardup_cluster_assignment_star",
    "hashed_classifier_score",
    "doc_pii_scrub",
    "segment_dedup_stats",
    "boilerplate_strip",
    "contamination_by_source",
    "url_blocklist_filter",
    "corpus_health_by_source",
    "incremental_dedup_gate",
    # -- last driver verdict was round 5 (missed r6's window) ----------------
    "hypertable_rollup",
    # -- flagship + high-value continuity ------------------------------------
    "q1_pricing_summary",
    "quality_decile_binning",
]


def _ordered() -> list[str]:
    rest = [n for n in QUERIES if n not in set(_PRIORITY)]
    return [n for n in _PRIORITY if n in QUERIES] + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: QUERIES[name].spark for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted => rows-only check)."""
    return {
        name: QUERIES[name].oracle
        for name in _ordered()
        if QUERIES[name].oracle is not None
    }
