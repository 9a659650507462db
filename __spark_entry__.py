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
    # -- r10 evidence targets ------------------------------------------------
    # never driver-checked: the WARC (CommonCrawl) record source, the
    # semantic (embedding) ingest gate, and the late-r10 text-pipeline
    # trio (Gopher rules / Unicode normalization / per-domain quota)
    "gopher_quality_flags",
    "text_normalization",
    "domain_quota_sample",
    "filtered_cosine_topk",
    "ivf_partitioned_exact_topk",
    "warc_extraction",
    "semantic_dedup_gate",
    "warc_file_source",
    "bigram_lm_perplexity",
    # changed r10 internals: the MinHash family moved from unwrapped
    # Kirsch-Mitzenmacher to the universal modular family (oracle changed
    # in lockstep), which also rewrites the gate-index band buckets; the
    # ANN defaults moved to the measured production configs and IVF-PQ
    # codes moved to IVF residuals (exact certificates must stay
    # bit-for-bit through the new path)
    "minhash_lsh_candidates",
    "banded_index_dedup_gate",
    "persisted_index_dedup_gate",
    "ivf_ann_topk",
    "pq_ann_topk",
    "ivfpq_ann_topk",
    # (ivf_exact_topk, pq_exact_topk and ivfpq_exact_topk also changed —
    # k-means default / refactored trainer / residual path — but all are
    # r9-green and locally re-verified bit-for-bit, and yield their
    # window slots to never-driver-checked queries; the window is
    # exactly 50)
    # -- recency rotation: every query whose latest verdict is r7 ------------
    "encrypted_transport_roundtrip",
    "wire_key_roundtrip",
    "topic_transport_roundtrip",
    "envelope_roundtrip",
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
    "doc_fingerprints",
    "hashed_classifier_score",
    "doc_pii_scrub",
    # (segment_dedup_stats yields its slot to the new
    # ivf_partitioned_exact_topk: it is unchanged this round, green in
    # all three r10 local sweeps, and carries independent 1x-100x
    # rehearsal coverage — the same rationale the exact-certificate
    # trio used for their slots)
    "boilerplate_strip",
    "contamination_by_source",
    "url_blocklist_filter",
    "corpus_health_by_source",
    # (q1_pricing_summary, hypertable_rollup and quality_decile_binning
    # stay r7-verdict one more round: the first two carry independent
    # r10 scale-rehearsal arithmetic invariants at 10x/30x, q1 is the
    # entry() flagship the driver smoke-runs every round, and the
    # decile binning is an unchanged pure-SQL shape re-verified in all
    # three full local sweeps this round — the four late-r10 ops take
    # their slots so nothing ships never-driver-checked)
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
