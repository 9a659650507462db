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
    # -- r12 evidence targets ------------------------------------------------
    # recency rotation: the 7 r8-vintage queries (nothing's latest verdict
    # predates r9 after this window)
    "simhash_neardup_pairs",
    "simhash_signatures",
    "temperature_mix_sampling",
    "tfidf_top_terms",
    "trailing_7d_user_spend",
    "unigram_logprob_score",
    "word_frequencies",
    # CODE CHANGED this round: sidecar builds ride the backend-dispatched
    # process_mutex; the semantic gate's policy hook + model_v back-compat
    # changed; the ADC scan gains list-pruning; the contraction trio gains
    # the duplicate-rate probe; lsh banding gains the recall-cap guard
    "semantic_dedup_gate",
    "banded_index_dedup_gate",
    "persisted_index_dedup_gate",
    "incremental_dedup_gate",
    "neardup_cluster_assignment",
    "neardup_cluster_assignment_star",
    "leakage_safe_split",
    "lsh_ann_neardup",
    "ivf_partitioned_exact_topk",
    "ivf_planted_recall",
    "ivfpq_planted_recall",
    # -- recency rotation: r9-vintage spread (32 of 41; the rest in r13;
    # oracle-paired entries preferred so the window keeps the r11 50/50
    # rows+schema+hash standard outside the 4 rows-only-by-nature slots
    # the verdict asked for by name) -----------------------------------------
    "doc_lang_id",
    "doc_quality_scores",
    "bloom_prefilter_decontamination",
    "doc_text_stats",
    "bpe_pair_counts_exact",
    "cms_bigram_bounds",
    "container_codec_probe",
    "duplicate_span_stats",
    "grouped_heavy_hitters_exact",
    "heavy_hitter_bigrams_exact",
    "hll_user_overlap",
    "html_text_extraction",
    "multimodal_features",
    "multimodal_frame_pipeline",
    "multimodal_jpeg_differential",
    "multimodal_meta",
    "multimodal_quarantine_stats",
    "multimodal_real_decode",
    "q10_returned_items",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_part_promotion_suppliers",
    "q21_waiting_suppliers",
    "q22_sales_opportunity",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "zorder_curve_keys",
    "zorder_box_query",
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
