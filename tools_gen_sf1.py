"""Generate a deterministic sf1 testdata tree in scratch (r11, verdict
item #5): TESTDATA.md stops at sf0.1, where per-query walls are dominated
by fixed job overhead (ivfpq ~8 small jobs); an sf1 leg separates fixed
from data-proportional cost so cross-round bench comparisons stop being
noise-bound.

Relational tables expand 10x by KEY-SHIFTED copies (copy ``i`` shifts
every key by ``i * 10_000_000``; FK references shift together, so each
copy is a self-consistent shard of the star schema — join fan-outs,
selectivities and value distributions are preserved exactly while volume
scales 10x).  region/nation are dimensions and stay as-is.  documents/
embeddings reuse the scale-rehearsal v3 expansion (planted exact copies +
append-token near-dups + salted rest), so the dedup/gate family sees the
same realistic duplicate structure the rehearsal measures.

Usage: python tools_gen_sf1.py   (idempotent; writes /tmp/spark_graft_sf1)
Then:  python bench.py --sf1
(--sf1, not SPARK_GRAFT_SF_DIR=... alone: the flag routes the
self-artifact to BENCH_SELF_SF1.json so an sf1 run can never overwrite
the sf0.1 BENCH_SELF.json evidence — the r11 measurement pitfall.)
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

BASE = "/root/testdata/sf0.1"
OUT = Path("/tmp/spark_graft_sf1")
FACTOR = 10
OFFSET = 10_000_000

# per-table key columns to shift (FKs shift with their parents)
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
COPY_AS_IS = ["region", "nation"]


def expand_table(spark, name: str) -> None:
    dst = OUT / f"{name}.parquet"
    df = spark.read.parquet(f"{BASE}/{name}.parquet")
    parts = [df]
    for i in range(1, FACTOR):
        c = df
        for k in SHIFTS[name]:
            c = c.withColumn(k, F.col(k) + F.lit(i * OFFSET))
        parts.append(c)
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(str(dst))


def main() -> None:
    from data_pipeline_spark.session import get_spark
    from tools_scale_rehearsal import build_scaled

    if (OUT / "_SUCCESS").exists():
        print(f"{OUT} already built")
        return
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark("gen-sf1")

    for name in COPY_AS_IS:
        shutil.copy(f"{BASE}/{name}.parquet", OUT / f"{name}.parquet")
    for name in SHIFTS:
        print(f"expanding {name}", flush=True)
        expand_table(spark, name)

    # documents/embeddings: the rehearsal v3 expansion at the same factor
    reh = build_scaled(spark, FACTOR)
    for name in ("documents", "embeddings"):
        src = Path(reh) / f"{name}.parquet"
        dst = OUT / f"{name}.parquet"
        if dst.exists():
            shutil.rmtree(dst)
        shutil.copytree(src, dst)

    (OUT / "_SUCCESS").touch()
    for t in list(SHIFTS) + COPY_AS_IS + ["documents", "embeddings"]:
        n = spark.read.parquet(str(OUT / f"{t}.parquet")).count()
        print(f"{t}: {n} rows", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
