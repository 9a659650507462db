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
    # -- r11 evidence targets ------------------------------------------------
    # NEW: planted-recall certificates for the pruned ANN paths — these
    # take the driver slots the rows-only ivf/pq/ivfpq_ann_topk entries
    # held (r10 verdict item #2: the window should be 50/50 oracle-green;
    # the rows-only production-config entries remain in the catalog)
    "ivf_planted_recall",
    "ivfpq_planted_recall",
    # ORACLE CHANGED (zero-norm NULLIF guard mirrored into _cos_sql — the
    # r10 ADVICE low): every cosine-oracle query re-verifies this round
    "embedding_cosine_topk",
    "filtered_cosine_topk",
    "embedding_neardup_pairs",
    "embedding_neardup_clusters",
    "lsh_exact_neardup",
    "ivf_exact_topk",
    "ivf_partitioned_exact_topk",
    "pq_exact_topk",
    "ivfpq_exact_topk",
    # CODE CHANGED: exact-dup pre-contraction in the components family,
    # adaptive literal/join crossover + locked sidecar builds in the
    # ingest gates, sidecar lock in the semantic gate path
    "neardup_cluster_assignment",
    "neardup_cluster_assignment_star",
    "leakage_safe_split",
    "banded_index_dedup_gate",
    "persisted_index_dedup_gate",
    "incremental_dedup_gate",
    "semantic_dedup_gate",
    # -- recency rotation: the four r7-vintage stragglers ---------------------
    "q1_pricing_summary",
    "hypertable_rollup",
    "quality_decile_binning",
    "segment_dedup_stats",
    # -- recency rotation: the r8-vintage family (28 of 37 remaining; the
    # rest rotate in r12) ------------------------------------------------
    "asof_click_attribution",
    "bpe_token_stats",
    "broadcast_dim_enrich",
    "cdc_update_diff",
    "compaction_latest_per_key",
    "corpus_mix_stats",
    "deterministic_sample",
    "doc_exact_dedup",
    "eval_decontamination",
    "exact_doc_length_percentiles",
    "gapfill_interpolated_series",
    "jaccard_neardup_pairs",
    "monitor_window_counts",
    "multimodal_flac_roundtrip",
    "multimodal_mp4_keyframes",
    "neardup_quality_survivors",
    "ngram_repetition_filter",
    "pretraining_corpus_filter",
    "props_json_extract",
    "q13_order_count_distribution",
    "q2_min_cost_supplier",
    "refresh_range_batches",
    "revenue_by_nation",
    "sequence_packing",
    "sessionize_events",
    "shipped_within_90d",
    "simhash64_neardup_pairs",
    "simhash_flood_stats",
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
