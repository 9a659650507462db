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
    # -- r9 evidence targets -------------------------------------------------
    # newest, never driver-checked: the container codec probe (avcC/SPS +
    # Ogg granule + MP3 frame + WebP header metadata extraction) and the
    # distributed BPE tokenizer trainer (pair-count certificate oracle-
    # paired; merge table rows-only)
    "container_codec_probe",
    "bpe_pair_counts_exact",
    "bpe_learned_merges",
    "multimodal_quarantine_stats",
    "html_text_extraction",
    # never driver-checked: the late-r9 entries (leakage-safe split over
    # near-dup components; the bucketed no-equi-key interval join), the two
    # earlier r9 entries (band-pruned gate with a decision-only oracle; the
    # z-layout end-to-end box query) and the three rows-only scale paths
    # the r8 verdict asked to rotate in
    "leakage_safe_split",
    "incident_window_counts",
    "doc_chunking",
    "bloom_prefilter_decontamination",
    "session_window_sessions",
    "weighted_sample_topk",
    "duplicate_span_stats",
    "multimodal_jpeg_differential",
    "cms_bigram_bounds",
    "hll_user_overlap",
    "banded_index_dedup_gate",
    "zorder_box_query",
    "heavy_hitter_bigrams",
    "pq_ann_topk",
    "ivfpq_ann_topk",
    # changed r9 internals: the gate family (bands column + pruning seam
    # threaded through doc_shingle_index/indexed_dedup_gate), the sketches
    # (explicit null-exclusion contract), the PQ kernels (empty-batch
    # guards), the z-key op, and the TIFF decode path (photometric/planar
    # seams)
    "persisted_index_dedup_gate",
    "incremental_dedup_gate",
    "heavy_hitter_bigrams_exact",
    "grouped_heavy_hitters_exact",
    "pq_exact_topk",
    "ivfpq_exact_topk",
    "zorder_curve_keys",
    "multimodal_real_decode",
    # -- longest-unverified tail: last driver verdict was ROUND 6 ------------
    "lsh_ann_neardup",
    "ivf_ann_topk",
    "approx_distinct_users_scale_path",
    "approx_doc_length_quantiles",
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
    "q20_part_promotion_suppliers",
    # -- round-7-latest spread fills the remaining window --------------------
    "multimodal_meta",
    "multimodal_features",
    "multimodal_frame_pipeline",
    "doc_text_stats",
    "doc_quality_scores",
    "doc_lang_id",
    "doc_fingerprints",
    "quality_decile_binning",
    "hashed_classifier_score",
    "doc_pii_scrub",
    "segment_dedup_stats",
    "boilerplate_strip",
    "contamination_by_source",
    "url_blocklist_filter",
    "corpus_health_by_source",
    "envelope_roundtrip",
    "topic_transport_roundtrip",
    "wire_key_roundtrip",
    "encrypted_transport_roundtrip",
    "hypertable_rollup",
    "dq_column_stats",
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
