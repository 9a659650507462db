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
# by evidence need: queries that have never received a driver verdict (TPC-H
# pack #2, wire roundtrips, training-mix/sketch ops) and queries whose code
# or oracle changed this round come first; a representative spread of the
# already-green set fills the remaining window; the rest (green in r2,
# unchanged) follow.
_PRIORITY = [
    # never driver-verified (r1+r2 positions 50-78)
    "envelope_roundtrip",
    "topic_transport_roundtrip",
    "neardup_cluster_assignment",
    "tfidf_top_terms",
    "ivf_ann_topk",
    "pretraining_corpus_filter",
    "deterministic_sample",
    "corpus_mix_stats",
    "sequence_packing",
    "bpe_token_stats",
    "temperature_mix_sampling",
    "trailing_7d_user_spend",
    "quality_decile_binning",
    "approx_distinct_users_scale_path",
    "approx_doc_length_quantiles",
    "exact_doc_length_percentiles",
    "q2_min_cost_supplier",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q21_waiting_suppliers",
    "q22_sales_opportunity",
    # changed this round (oracle casts / canon fix / new implementation)
    "props_json_extract",
    "sessionize_events",
    "hypertable_rollup",
    "multimodal_features",
    "lsh_ann_neardup",
    "jaccard_neardup_pairs",
    # representative green coverage (r2-verified, unchanged)
    "q1_pricing_summary",
    "monitor_window_counts",
    "refresh_range_batches",
    "compaction_latest_per_key",
    "broadcast_dim_enrich",
    "shipped_within_90d",
    "cdc_update_diff",
    "revenue_by_nation",
    "asof_click_attribution",
    "doc_exact_dedup",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "embedding_cosine_topk",
    "embedding_neardup_pairs",
    "word_frequencies",
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
