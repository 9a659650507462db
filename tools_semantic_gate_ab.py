"""Semantic-gate ADC-scan pruning A/B (r11 verdict item #4).

Fixed-size trigger against committed indexes 10x apart (the 20k / 200k
rehearsal embedding corpora): the PRUNED gate (probed-list membership
pushed into the parquet scan + the compacted list-clustered layout) must
hold a near-flat wall as the index grows, where the unpruned twin's wall
tracks the full index (every row rides Arrow transfer into the ADC
kernel).  Decisions must be identical between the twins at every leg —
the kernel re-tests membership row-by-row, so pruning is invisible in
the output by construction, and this script asserts it.

Usage: python tools_semantic_gate_ab.py [--out SEMANTIC_GATE_AB_r12.json]
"""

from __future__ import annotations

import argparse
import json
import shutil
import time
from pathlib import Path

CORPORA = {
    "x10_20k": "/tmp/spark_graft_scale_rehearsal/sf0.1x10_v3",
    "x100_200k": "/tmp/spark_graft_scale_rehearsal/sf0.1x100_v3",
}
SCRATCH = Path("/tmp/spark_graft_gate_ab")
BATCH = 50  # fixed trigger size at every index scale


def run_leg(spark, corpus_dir: str, label: str) -> dict:
    from pyspark.sql import functions as F

    from data_pipeline_spark.llmops import pq
    from data_pipeline_spark.streaming.ingest import SemanticGatedIngest

    root = SCRATCH / label
    shutil.rmtree(root, ignore_errors=True)
    emb = spark.read.parquet(f"{corpus_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    n_corpus = emb.count()
    sink = SemanticGatedIngest(
        spark,
        corpus_dir=str(root / "corpus"),
        ledger_path=str(root / "ledger"),
        id_col="doc_id",
        vec_col="embedding",
        threshold=0.9,
        n_probe=8,
        n_lists=64,
        m=8,
        within_batch_neardup=False,  # bulk load, no driver pairwise
    )
    t0 = time.time()
    admitted = sink.admit_batch(emb, 0)  # empty index: everything admits
    build_s = time.time() - t0
    t0 = time.time()
    sink.compact()  # the list-clustered bulk rewrite
    compact_s = time.time() - t0

    # fixed trigger: 25 exact copies of corpus vectors (id-shifted; their
    # nearest committed cosine is 1.0 -> near_dup) + 25 perturbed-novel
    copies = emb.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "embedding"
    )
    novel = emb.filter(
        (F.col("doc_id") >= 25) & (F.col("doc_id") < 50)
    ).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.transform(
            "embedding", lambda x, i: x * 0.2 + F.lit(0.1) * (i % 7)
        ).alias("embedding"),
    )
    batch = copies.unionByName(novel).collect()
    batch_df = lambda: spark.createDataFrame(  # noqa: E731
        batch, "doc_id LONG, embedding ARRAY<DOUBLE>"
    )

    index = sink.committed_index()
    v = sink._cached_version()
    coarse, books, _err, _n = sink._models[v]

    out = {
        "leg": label, "index_rows": n_corpus, "admitted": admitted,
        "batch": BATCH, "build_s": round(build_s, 1),
        "compact_s": round(compact_s, 1),
    }
    decisions = {}
    for mode, prune in (("pruned", True), ("unpruned", False)):
        def gate():
            # constructed INSIDE the timer: gate_flags collects the
            # trigger rows driver-side at dataframe-construction time
            flags = pq.semantic_gate_flags(
                index, batch_df(), coarse, books,
                id_col="doc_id", vec_col="embedding",
                threshold=0.9, n_probe=8, prune_scan=prune,
            )
            return {(r.doc_id, r.near_dup, r.keep) for r in flags.collect()}

        decisions[mode] = gate()  # warmup (codegen, worker spinup)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            got = gate()
            best = min(best, time.time() - t0)
            assert got == decisions[mode]
        out[f"{mode}_wall_s"] = round(best, 2)
    out["decision_parity"] = decisions["pruned"] == decisions["unpruned"]
    out["n_flagged"] = sum(r[1] for r in decisions["pruned"])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SEMANTIC_GATE_AB_r12.json")
    args = ap.parse_args()

    from data_pipeline_spark.session import get_spark

    spark = get_spark("gate_ab", shuffle_partitions=32)
    legs = []
    for label, corpus in CORPORA.items():
        leg = run_leg(spark, corpus, label)
        print(json.dumps(leg), flush=True)
        legs.append(leg)
    a, b = legs
    summary = {
        "index_growth": round(b["index_rows"] / a["index_rows"], 1),
        "pruned_wall_growth": round(
            b["pruned_wall_s"] / max(a["pruned_wall_s"], 1e-9), 2
        ),
        "unpruned_wall_growth": round(
            b["unpruned_wall_s"] / max(a["unpruned_wall_s"], 1e-9), 2
        ),
        "pruned_vs_unpruned_at_big": round(
            b["unpruned_wall_s"] / max(b["pruned_wall_s"], 1e-9), 2
        ),
        "decision_parity_all": all(x["decision_parity"] for x in legs),
    }
    print(json.dumps(summary), flush=True)
    Path(args.out).write_text(
        json.dumps({"legs": legs, "summary": summary}, indent=1)
    )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    main()
