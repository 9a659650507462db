#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

``python bench.py --sf1`` is the cross-round REGRESSION GATE (r11 verdict
item #3): same query set, same warmup + min-of-reps policy, but at the 10x
sf1 corpus ($SPARK_GRAFT_SF1_DIR, default /tmp/spark_graft_sf1, generated
by tools_gen_sf1.py) — three consecutive rounds of sf0.1 cross-round
deltas were scatter-dominated (±17-20%, fixed-cost regime; median
sf1/sf0.1 scaling ratio is only 1.7), while the sf1 leg separates signal
from noise and caught the r11 LSH banding bug.  Judge per-query deltas at
sf1 with an ABA bracket; keep the sf0.1 artifact for the driver contract.

Timing policy (r7): each query gets one UNTIMED warmup execution (Python-UDF
worker spinup, codegen, parquet footer caches, shuffle-service init), then
``SPARK_GRAFT_BENCH_REPS`` (default 2) timed executions of which the MIN is
reported — the reproducible steady-state cost, comparable to the baseline's
sustained-throughput figures.  The r6 drift study measured ±19% on
single-shot figures with most of it first-run codegen/UDF cost
(lsh_ann_neardup: 4.2 s cold vs ~3.0 s steady); warming per-query removes
that term from the number entirely instead of hoping min-of-2 absorbs it.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import data_pipeline_spark.queries_llm  # noqa: E402,F401  (registers LLM ops)
import data_pipeline_spark.queries_pipeline  # noqa: E402,F401  (registers wire ops)
import data_pipeline_spark.queries_tpch  # noqa: E402,F401  (registers TPC-H shapes)
from data_pipeline_spark.queries import QUERIES  # noqa: E402
from data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family (keep bench runtime bounded).
BENCH_QUERIES = [
    "q1_pricing_summary",
    "tailer_projection",
    "monitor_window_counts",
    "refresh_range_batches",
    "compaction_latest_per_key",
    "broadcast_dim_enrich",
    "shipped_within_90d",
    "priority_queue_head",
    "revenue_by_nation",
    "top_orders_by_price",
    "doc_text_stats",
    "doc_exact_dedup",
    "jaccard_neardup_pairs",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "embedding_cosine_topk",
    "lsh_ann_neardup",
    "neardup_cluster_assignment",
    "envelope_roundtrip",
    "cdc_snapshot_apply",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q21_waiting_suppliers",
    "sessionize_events",
    "topic_transport_roundtrip",
    "eval_decontamination",
    "multimodal_frame_pipeline",
    "ngram_repetition_filter",
    "unigram_logprob_score",
    "hashed_classifier_score",
    "segment_dedup_stats",
    # r8 additions: the ingest-admission family carries round-over-round
    # numbers (incremental gate = corpus-scan form, persisted = the
    # steady-state index-sidecar form the streaming sink runs), plus the
    # fused star-CC and the boilerplate stripper
    "incremental_dedup_gate",
    "persisted_index_dedup_gate",
    "boilerplate_strip",
    "neardup_cluster_assignment_star",
    # r8 late additions: the real-codec multimodal paths (MP4 container
    # demux + FLAC lossless roundtrip) carry numbers so codec regressions
    # show up round-over-round, plus the three new scale-path operators
    "multimodal_mp4_keyframes",
    "multimodal_flac_roundtrip",
    "zorder_curve_keys",
    "heavy_hitter_bigrams",
    # r9 additions: the band-pruned steady-state ingest gate and the
    # z-layout end-to-end read path (layout written once per sf, bench
    # reps hit the steady-state pruned scan)
    "banded_index_dedup_gate",
    "zorder_box_query",
    "pq_ann_topk",
    "ivfpq_ann_topk",
    "gapfill_interpolated_series",
    # r9 late additions: the progressive/restart JPEG differential runs
    # the four-way codec comparison distributed (codec-bound, row-capped);
    # the Count-Min certificate sketches the same bigram stream the
    # Misra-Gries entry consumes
    "multimodal_jpeg_differential",
    "cms_bigram_bounds",
    # the Bloom-prefiltered decontamination (broadcast-bitmap gate + exact
    # verify) benches against eval_decontamination's exact-broadcast form
    "bloom_prefilter_decontamination",
    # native session_window sessionization benches against the lag/cumsum
    # sessionize_events entry (same semantics, different physical plan)
    "session_window_sessions",
    # A-ES weighted sampling: TakeOrderedAndProject top-k, no sort shuffle
    "weighted_sample_topk",
    # overlapping-window substring dedup (span union) benches alongside the
    # non-overlapping segment_dedup_stats form
    "duplicate_span_stats",
    # bucketed no-equi-key interval join: hash-keyed containment vs the
    # BroadcastNestedLoop shape a theta join would plan
    "incident_window_counts",
    # cluster-cohesive train/val/test split (near-dup CC + component hash)
    "leakage_safe_split",
    # in-row stride-windowed chunker (zero-shuffle preprocessing path)
    "doc_chunking",
    # container codec probe: per-doc avc1 MP4 synth + avcC/SPS parse and
    # Ogg page write/CRC/granule probe, one mapInPandas (codec-bound)
    "container_codec_probe",
    # BPE tokenizer training: vocabulary-bounded word-count shuffle +
    # in-row pair expansion (certificate) and the incremental driver
    # trainer over the top-20k table (merge loop cost)
    "bpe_pair_counts_exact",
    "bpe_learned_merges",
    # corrupt-input quarantine: safe-decode classification map-side
    "multimodal_quarantine_stats",
    # HTML -> text extraction (stdlib parser, map-side)
    "html_text_extraction",
    # WARC (CommonCrawl) container: per-record-gzip parse + HTTP gate +
    # extraction, one mapInPandas (codec-bound)
    "warc_extraction",
    # semantic (embedding) ingest gate: ANN sidecar probe + per-row-bounded
    # ADC candidate cut + exact verify
    "semantic_dedup_gate",
    # file-level WARC source: binaryFile -> per-response rows off real
    # multi-capture .warc.gz segments (archives built once per sf)
    "warc_file_source",
    # interpolated bigram LM (the real CCNet-style perplexity filter):
    # benches against unigram_logprob_score's broadcast-only form
    "bigram_lm_perplexity",
    # Gopher repetition/format rules: in-row line derivation + list
    # predicates, zero-shuffle scan
    "gopher_quality_flags",
    # Unicode NFC normalization: the one sanctioned pandas-UDF text step
    # (Arrow batches) + JVM regex strip/collapse
    "text_normalization",
    # per-domain quota sampling: salted two-stage top-N (skew-bounded)
    "domain_quota_sample",
    # metadata-filtered vector search (pre-filter semantics, predicate
    # pushed to the scan before any vector math)
    "filtered_cosine_topk",
    # IVF served off the list_id-partitioned parquet layout: probe-pruned
    # scan + rank (layout + centroids materialize once per sf, timed in
    # the first rep's sidecar build like the gate index)
    "ivf_partitioned_exact_topk",
]


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf1",
        action="store_true",
        help="run the cross-round regression gate at the 10x sf1 corpus "
        "($SPARK_GRAFT_SF1_DIR, default /tmp/spark_graft_sf1 — generate "
        "with tools_gen_sf1.py); writes BENCH_SELF_SF1.json",
    )
    args = ap.parse_args()
    global SF_DIR
    if args.sf1:
        SF_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
        if not os.path.isdir(SF_DIR):
            raise SystemExit(
                f"sf1 corpus missing at {SF_DIR}: run tools_gen_sf1.py "
                "first (or point SPARK_GRAFT_SF1_DIR at it)"
            )
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    spark = get_spark("bench")

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in QUERIES:
            continue
        # one untimed warmup (codegen, UDF worker spinup, footer caches),
        # then min of `reps` timed runs: the reproducible steady-state cost
        QUERIES[name].spark(spark, SF_DIR).collect()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            QUERIES[name].spark(spark, SF_DIR).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    if args.sf1:
        sf = "1"
    result = {
        "metric": "headline_query_wall_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "policy": f"per-query warmup + min of {reps} timed runs",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # compact separators: the driver scrapes a bounded stdout tail, which
    # truncated the r9 AND r10 artifacts mid-token ("parsed": null); the
    # per-query map is the bulk of the line, so compacting + 3-decimal
    # rounding keeps it inside the capture window.  BENCH_SELF.json
    # (written BEFORE the print, gitignored so driver re-runs don't dirty
    # the tree) remains the complete evidence of record.
    line = json.dumps(result, separators=(",", ":"))
    # leg-specific self-artifact: an sf1 run must never overwrite the
    # sf0.1 evidence (the r11 measurement pitfall)
    self_name = "BENCH_SELF_SF1.json" if args.sf1 else "BENCH_SELF.json"
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         self_name), "w"
        ) as fh:
            fh.write(line + "\n")
    except OSError:
        pass
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
