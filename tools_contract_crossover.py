"""Measure the exact-dup contraction crossover rate (r11 verdict item #6).

Builds rate-controlled corpora from the 10x rehearsal documents (byte-exact
duplicates planted as PAIRS — victim odd ids copy their even neighbor's
text — the conservative case: pair-style duplication gives the contraction
the least clique mass to remove per duplicate, so the crossover measured
here is an upper bound on where contraction starts paying) and times
``neardup_components`` contracted vs uncontracted vs auto at each rate.
``CONTRACT_MIN_DUP_RATE`` in llmops/dedup.py is pinned from this sweep.

Usage: python tools_contract_crossover.py [--rates 0,0.01,0.02,0.05,0.15,0.30]
"""

from __future__ import annotations

import argparse
import json
import shutil
import time
from pathlib import Path

BASE = "/tmp/spark_graft_scale_rehearsal/sf0.1x10_v2"
SCRATCH = Path("/tmp/spark_graft_crossover")


def build_corpus(spark, rate: float, path: str) -> float:
    """Corpus with ``rate`` of rows byte-identical to another row, size
    and text mass unchanged (victims REPLACE their text, nothing is
    appended — every rate leg does identical base work)."""
    from pyspark.sql import functions as F

    from data_pipeline_spark.llmops.dedup import duplicate_rate

    # uniquify first: the v2 expansion carries a ~4.4% residual exact-dup
    # rate of its own, which would floor every planted rate — a per-row
    # suffix token makes all texts distinct while preserving the near-dup
    # shingle structure, so the planted rate is the measured rate
    docs = spark.read.parquet(f"{BASE}/documents.parquet").withColumn(
        "text",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" uq"),
            F.col("doc_id").cast("string"),
        ),
    )
    # odd ids whose (id % 1009) clears the quota copy text from id-1
    victim = (F.col("doc_id") % 2 == 1) & (
        F.col("doc_id") % 1009 < int(2 * rate * 1009)
    )
    partners = docs.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.col("text").alias("partner_text"),
    )
    out = (
        docs.join(partners, "doc_id", "left")
        .withColumn(
            "text",
            F.when(victim & F.col("partner_text").isNotNull(),
                   F.col("partner_text")).otherwise(F.col("text")),
        )
        .drop("partner_text")
    )
    out.write.mode("overwrite").parquet(path)
    return duplicate_rate(spark.read.parquet(path), "text")


def timed_components(spark, path: str, contract, out_path: str) -> float:
    from pyspark.sql import functions as F  # noqa: F401

    from data_pipeline_spark.llmops import dedup as ld

    docs = spark.read.parquet(path).repartition(
        spark.sparkContext.defaultParallelism
    )
    t0 = time.time()
    # construct INSIDE the timer: connected_components eagerly
    # localCheckpoints at dataframe-construction time
    comp = ld.neardup_components(docs, "doc_id", "text", contract=contract)
    comp.write.mode("overwrite").parquet(out_path)
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", default="0,0.01,0.02,0.05,0.15,0.30")
    ap.add_argument("--out", default="/tmp/contract_crossover.json")
    args = ap.parse_args()

    from data_pipeline_spark.session import get_spark

    spark = get_spark("crossover", shuffle_partitions=32)
    results = []
    for rate in [float(r) for r in args.rates.split(",")]:
        corpus = str(SCRATCH / f"corpus_{rate}")
        measured = build_corpus(spark, rate, corpus)
        row = {"rate_target": rate, "rate_measured": round(measured, 4)}
        for mode, contract in (
            ("contracted", True), ("uncontracted", False), ("auto", "auto")
        ):
            out_path = str(SCRATCH / f"comp_{rate}_{mode}")
            row[mode] = round(
                timed_components(spark, corpus, contract, out_path), 2
            )
        a = spark.read.parquet(str(SCRATCH / f"comp_{rate}_contracted"))
        b = spark.read.parquet(str(SCRATCH / f"comp_{rate}_uncontracted"))
        row["parity_mismatches"] = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(json.dumps(row), flush=True)
        results.append(row)
        shutil.rmtree(SCRATCH, ignore_errors=True)
    Path(args.out).write_text(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    main()
