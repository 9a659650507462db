#!/usr/bin/env python
"""Regenerate EXPLAIN.md (formatted physical plans of headline queries)."""
from data_pipeline_spark.session import get_spark
from data_pipeline_spark.plans.audit import formatted_plan
from data_pipeline_spark.queries import QUERIES
import data_pipeline_spark.queries_llm, data_pipeline_spark.queries_pipeline, data_pipeline_spark.queries_tpch  # noqa

PICK = [
    ("q1_pricing_summary", "filter pushdown + column pruning + partial agg"),
    ("broadcast_dim_enrich", "dimension broadcast (no fact shuffle)"),
    ("shipped_within_90d", "equi+range join (hash join, range post-filter)"),
    ("top_orders_by_price", "TakeOrderedAndProject (no global sort)"),
    ("revenue_by_nation", "multiway: broadcast dims + shuffled fact joins"),
    ("minhash_lsh_candidates", "banded LSH posting lists, universal modular family (1 md5/shingle, r10: unwrapped KM correlated the orderings), in-row capped pair expansion — no bucket self-join"),
    ("simhash_neardup_pairs", "bit-prefix bands, capped posting-list pairing — join-free plan"),
    ("quality_decile_binning", "two-phase exact NTILE: (lang,bucket) windows + broadcast prefix, no per-language total sort"),
    ("jaccard_neardup_pairs", "DF-capped posting lists, in-row pair expansion — no shingle self-join"),
    ("q2_min_cost_supplier", "correlated MIN as window: ONE fact scan"),
    ("q19_disjunctive_revenue", "OR-of-ANDs pushed to BOTH scans (CNF)"),
    ("q21_waiting_suppliers", "multi-EXISTS as per-order window sets, no self-join"),
    ("trailing_7d_user_spend", "event-time RANGE frame on integer microseconds"),
    ("persisted_index_dedup_gate", "ingest gate off the parquet index sidecar: batch sides broadcast, index never shuffles, exact pass column-prunes to the md5 alone"),
    ("banded_index_dedup_gate", "band-pruned steady-state gate: ONE fused index scan, in-row arrays_overlap collision filter BEFORE the shingle explode (O(candidates) explode), zero extra exchanges"),
    ("zorder_curve_keys", "Morton layout keys: one-row span stats broadcast back (BNL), single shuffle = the stats agg — the fact never moves"),
    ("incident_window_counts", "no-equi-key interval containment as a HASH join on time buckets (in-row interval explode) — never BroadcastNestedLoop/cartesian"),
    ("doc_chunking", "stride-windowed chunker: split -> sequence -> posexplode -> slice, all in-row — ZERO exchanges, whole plan one codegen stage"),
    ("bpe_pair_counts_exact", "BPE trainer certificate: corpus -> word counts (ONE vocabulary-bounded shuffle), then in-row transform+explode pair expansion + one more partial-agg groupBy — the only corpus-sized stages of tokenizer training"),
    ("semantic_dedup_gate", "semantic ingest gate: ANN sidecar scan column-pruned to (cor_id, vnorm, codes, list_id, adc_err), candidates exact-verified via a bounded join + broadcast batch — the corpus embedding column loads only for candidates"),
    ("gopher_quality_flags", "Gopher repetition/format rules: in-row line derivation + list predicates, ZERO exchanges — the whole decision table in one codegen scan"),
    ("domain_quota_sample", "per-domain quota: salted two-stage top-N — first window partitions (source, salt) so per-source shuffle is bounded at N*64 rows under any domain skew; no rangepartitioning sort"),
    ("filtered_cosine_topk", "metadata-filtered vector search: the IN-list predicate reaches the parquet scan (PushedFilters: In(label, ...), plan-tested) BEFORE any vector math — pre-filter semantics, k always fills"),
    ("ivf_partitioned_exact_topk", "IVF as a SERVED TABLE: probe lists prune the list_id-partitioned layout at directory level (PartitionFilters carries the probe IN-list) — at n_probe=n_lists the oracle certifies brute-force parity through the persisted layout"),
    ("neardup_cluster_assignment", "r11 exact-dup pre-contraction: ONE md5 groupBy collapses duplicate texts to min-id reps BEFORE shingling/pair-expansion/label-propagation, members re-expand via one co-keyed join — 7.4x wall / 8.3x shuffle / zero-vs-45GB spill at 100x on a realistic-duplicate corpus, components bit-identical"),
    ("ivf_planted_recall", "planted-recall certificate at the PRODUCTION n_probe=24/64 config: identical-copy queries, brute-force DuckDB rank-1 oracle — recall guaranteed by quantizer self-consistency (probe #1 is always the source's list)"),
]

if __name__ == "__main__":
    spark = get_spark("explain", shuffle_partitions=8)
    out = ["# EXPLAIN — physical plans of headline queries (sf0.01, local[32])",
           "",
           "Generated from `.explain(\"formatted\")`; regenerate with",
           "`python tools_gen_explain.py`. What to look for is noted per query;",
           "`tests/test_plans.py` asserts these properties stay true.",
           ""]
    for name, note in PICK:
        plan = formatted_plan(QUERIES[name].spark(spark, "/root/testdata/sf0.01"))
        out.append(f"## {name}\n\n*{note}*\n\n```\n{plan.strip()}\n```\n")
    open("EXPLAIN.md", "w").write("\n".join(out))
    spark.stop()
