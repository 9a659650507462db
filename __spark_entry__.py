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
    # -- r8 evidence targets: new or changed this round ----------------------
    # new: the real-codec multimodal certifications — MP4 container demux
    # vs an arithmetic sample-table oracle, FLAC lossless roundtrip vs an
    # arithmetic PCM oracle (first driver-level value-checks for the
    # multimodal family)
    "multimodal_mp4_keyframes",
    "multimodal_flac_roundtrip",
    # new: the Morton-layout key op (zorder_write's pruning effect is
    # measured from real parquet footers in tests/test_scale_ops.py)
    "zorder_curve_keys",
    # new: the Misra-Gries exactness limits — global AND per-group —
    # certifying the third sketch scale path like the ANN exact configs
    "heavy_hitter_bigrams_exact",
    "grouped_heavy_hitters_exact",
    # new: the PQ exactness limit (lossless codebooks == brute force) and
    # the IVF-PQ double limit (all-lists probe + lossless codebooks),
    # certifying the compressed-ANN paths end to end
    "pq_exact_topk",
    "ivfpq_exact_topk",
    # new: hypertable gap-fill + LOCF/linear interpolation (~50% of the
    # 15-min buckets are generated gaps at sf0.01)
    "gapfill_interpolated_series",
    # new: the persisted-index gate (the streaming sink's steady-state
    # path) and the two ANN exactness-limit certifications
    "persisted_index_dedup_gate",
    "ivf_exact_topk",
    "lsh_exact_neardup",
    # changed r8: gate rewritten around doc_shingle_index (cache removed,
    # sizes in-row); star-CC rounds fused to one shuffle per phase; the
    # jaccard pairing grew the cache=False seam; simhash banding factored
    # into shared helpers for the flood-stats audit
    "incremental_dedup_gate",
    "neardup_cluster_assignment_star",
    "neardup_cluster_assignment",
    "jaccard_neardup_pairs",
    "simhash_neardup_pairs",
    "simhash64_neardup_pairs",
    # new: the cap's recall-loss audit (ADVICE r7: surface the drop) and
    # the semantic-dedup composition (embedding pairs -> components)
    "simhash_flood_stats",
    "embedding_neardup_clusters",
    # -- longest-unverified tail: last driver verdict was ROUND 5 ------------
    "shipped_within_90d",
    "sessionize_events",
    "asof_click_attribution",
    "doc_exact_dedup",
    "simhash_signatures",
    "embedding_cosine_topk",
    "embedding_neardup_pairs",
    "word_frequencies",
    "q13_order_count_distribution",
    # -- last driver verdict was ROUND 6 (oracle-paired rows) ----------------
    "monitor_window_counts",
    "refresh_range_batches",
    "compaction_latest_per_key",
    "broadcast_dim_enrich",
    "cdc_update_diff",
    "revenue_by_nation",
    "props_json_extract",
    "minhash_lsh_candidates",
    "tfidf_top_terms",
    "pretraining_corpus_filter",
    "deterministic_sample",
    "corpus_mix_stats",
    "sequence_packing",
    "bpe_token_stats",
    "temperature_mix_sampling",
    "trailing_7d_user_spend",
    "exact_doc_length_percentiles",
    "eval_decontamination",
    "ngram_repetition_filter",
    "unigram_logprob_score",
    "neardup_quality_survivors",
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
    "q20_part_promotion_suppliers",
    # (the four r6 rows-only queries — lsh_ann_neardup, ivf_ann_topk and
    # the two sketch scale paths — stay outside the window: their exact
    # configurations are certified above with full oracles, which is
    # strictly stronger evidence than another rows>0 verdict)
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
