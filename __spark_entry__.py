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
    # never driver-verified (round-5 additions that landed outside r5's window)
    "eval_decontamination",
    "simhash_neardup_pairs",
    "multimodal_frame_pipeline",
    "q20_part_promotion_suppliers",
    # changed this round (de-skewed binning, re-measured LSH formulations,
    # real multimodal codec, JVM-probe wire path)
    "quality_decile_binning",
    "minhash_lsh_candidates",
    "lsh_ann_neardup",
    "multimodal_features",
    "envelope_roundtrip",
    "topic_transport_roundtrip",
    "encrypted_transport_roundtrip",
    "wire_key_roundtrip",
    "ngram_repetition_filter",
    "unigram_logprob_score",
    "multimodal_real_decode",
    "neardup_quality_survivors",
    # representative green coverage (driver-verified in r2/r5, unchanged)
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
    "approx_distinct_users_scale_path",
    "approx_doc_length_quantiles",
    "exact_doc_length_percentiles",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q21_waiting_suppliers",
    "q22_sales_opportunity",
    "props_json_extract",
    "jaccard_neardup_pairs",
    "monitor_window_counts",
    "refresh_range_batches",
    "compaction_latest_per_key",
    "broadcast_dim_enrich",
    "cdc_update_diff",
    "revenue_by_nation",
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
