"""Relational scale rehearsal: the r10 rehearsal (tools_scale_rehearsal.py)
measured the dedup/gate/ANN family at 10x/30x; this tool closes the same
gap for the JOIN/AGGREGATE half of the engine — the TPC-H-shaped queries,
the range/interval joins, the window/sessionization/rollup operators —
plus a SKEW-JOIN rehearsal (AQE skewed-partition split, measured).

Corpus expansion is deterministic and Spark-side: copy ``i`` of the fact
tables shifts the entity keys by ``i * OFFSET`` and keeps every value
column bit-identical; the small dims (supplier, part, nation, region)
stay FIXED — the realistic 100 TB shape (facts grow, dims don't), except
customer, which grows with orders so per-customer behavior is preserved.

Because copies are value-identical modulo key shift, every query result
has an ARITHMETIC ground truth derived from its own 1x run — no DuckDB
needed at scale:

- dim-keyed aggregates (q1/q5/q9/q13/q21, shipped_within_90d,
  hypertable_rollup): additive measures scale exactly by k, ratio
  measures (avg_qty, avg_disc) are invariant;
- per-entity results (sessionize_events, trailing_7d_user_spend,
  priority_queue_head): the scaled result is the base result replicated
  k times under the key shift — exact multiset equality after key mod;
- incident_window_counts: OFFSET is chosen DIVISIBLE BY 997 (the
  incident selector is ``event_id % 997 == 0``), so copy incidents are
  shifted twins of base incidents and both counters scale by k;
- q18_large_orders (top-20 with a deterministic tie-break): the
  expected top-20 is computable by replicating the base qualifying set
  and re-sorting — checked exactly.

Metrics (wall, shuffle read/write, spill, peak execution memory) come
from the same Spark REST status API watermark attribution as the r10
LLM-ops rehearsal (imported from tools_scale_rehearsal).

Usage:  python tools_scale_rehearsal_rel.py [--scales 1,10,30] [--skew]
Writes SCALE_REHEARSAL_REL_r10.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import functions as F

from tools_scale_rehearsal import SCRATCH, _stage_ids, _stage_metrics, _api, timed_run

BASE = "/root/testdata/sf0.1"
# divisible by 997 so incident identity (event_id % 997 == 0) survives the
# key shift; far above every base key space (orderkey < 150k, custkey <
# 15k, event_id < ~100k)
OFFSET = 997_000_000

FACT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
}
FIXED = ["supplier", "part", "nation", "region", "documents", "embeddings"]

HEAVY = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q13_order_count_distribution",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "shipped_within_90d",
    "incident_window_counts",
    "hypertable_rollup",
    "sessionize_events",
    "trailing_7d_user_spend",
    "priority_queue_head",
]


# ------------------------------------------------------------- expansion

def build_scaled(spark, factor: int) -> str:
    """Materialize the factor-x fact tables + fixed-dim symlinks
    (idempotent; scratch only — testdata is read-only)."""
    if factor == 1:
        return BASE
    out = SCRATCH / f"rel_x{factor}"
    if (out / "_SUCCESS").exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)

    from data_pipeline_spark.io import load_table

    copies = F.broadcast(
        spark.range(factor).select(F.col("id").alias("__copy"))
    )
    for tbl, keys in FACT_KEYS.items():
        df = load_table(spark, BASE, tbl)
        shifted = df.crossJoin(copies).select(
            *[
                (F.col(c) + F.col("__copy") * OFFSET).alias(c)
                if c in keys
                else F.col(c)
                for c in df.columns
            ]
        )
        shifted.repartition(32).write.mode("overwrite").parquet(
            str(out / f"{tbl}.parquet")
        )
    for tbl in FIXED:
        link = out / f"{tbl}.parquet"
        if not link.exists():
            os.symlink(f"{BASE}/{tbl}.parquet", link)
    (out / "_SUCCESS").touch()
    return str(out)


# ------------------------------------------------------------- invariants

_TOL = 1e-9


def _viol(cond_col, df) -> int:
    return df.filter(cond_col).count()


def _neq(a, b):
    """Relative-tolerance inequality for double measures (k* an exact
    scaled-integer sum divides out bit-differently on each side)."""
    return F.abs(F.col(a) - F.col(b)) > _TOL * F.greatest(
        F.abs(F.col(a)), F.abs(F.col(b)), F.lit(1.0)
    )


def check_scaled_agg(base, scaled, group_cols, additive, equal=(), k=1):
    """Dim-keyed aggregate: additive cols scale by exactly k, equal cols
    are invariant, and the group-key sets match (full outer join)."""
    b = base.select(
        *group_cols,
        *[F.col(c).alias(f"__b_{c}") for c in additive + list(equal)],
    )
    s = scaled.select(
        *group_cols,
        *[F.col(c).alias(f"__s_{c}") for c in additive + list(equal)],
    )
    j = b.join(s, list(group_cols), "full_outer").cache()
    bad = _viol(
        F.lit(False)
        | F.col(f"__b_{(additive + list(equal))[0]}").isNull()
        | F.col(f"__s_{(additive + list(equal))[0]}").isNull(),
        j,
    )
    for c in additive:
        bad += _viol(
            F.abs(F.col(f"__s_{c}") - F.lit(float(k)) * F.col(f"__b_{c}"))
            > _TOL
            * F.greatest(F.abs(F.lit(float(k)) * F.col(f"__b_{c}")), F.lit(1.0)),
            j,
        )
    for c in equal:
        bad += _viol(_neq(f"__s_{c}", f"__b_{c}"), j)
    j.unpersist()
    return {"violations": bad, "ok": bad == 0}


def check_replicated(base, scaled, mod_keys, k):
    """Per-entity result: scaled == base replicated k times under the
    key shift — exact multiset equality after reducing keys mod OFFSET."""
    cols = base.columns
    s = scaled.select(
        *[
            (F.col(c) % OFFSET).alias(c) if c in mod_keys else F.col(c)
            for c in cols
        ]
    )
    sg = s.groupBy(*cols).agg(F.count(F.lit(1)).alias("__n"))
    bg = base.groupBy(*cols).agg((F.count(F.lit(1)) * k).alias("__n"))
    bad = sg.exceptAll(bg).count() + bg.exceptAll(sg).count()
    return {"violations": bad, "ok": bad == 0}


def _base_q18_qualifying(spark):
    """Recompute q18's qualifying set at 1x (groupBy-HAVING + dims) with
    the engine's integer-cent arithmetic — the tool's own 6-line oracle
    for the top-20 expectation."""
    from data_pipeline_spark.io import load_table

    li = load_table(spark, BASE, "lineitem")
    orders = load_table(spark, BASE, "orders")
    cust = load_table(spark, BASE, "customer")
    q100 = F.round(F.col("l_quantity") * 100, 0).cast("bigint")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(q100).alias("qs"))
        .filter(F.col("qs") > 25000)
        .select("l_orderkey", (F.col("qs").cast("double") / 100.0).alias("total_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "total_qty")
    )


def check_q18(spark, scaled_df, k):
    """Expected scaled top-20 = base qualifying set replicated k times
    under the key shift, re-sorted by the query's deterministic
    (total_qty DESC, o_orderkey ASC) tie-break."""
    qual = _base_q18_qualifying(spark)
    copies = F.broadcast(spark.range(k).select(F.col("id").alias("__copy")))
    expected = (
        qual.crossJoin(copies)
        .select(
            "c_name",
            (F.col("o_orderkey") + F.col("__copy") * OFFSET).alias("o_orderkey"),
            "o_orderdate",
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )
    bad = (
        scaled_df.exceptAll(expected).count()
        + expected.exceptAll(scaled_df).count()
    )
    return {"violations": bad, "ok": bad == 0}


def check_invariants(spark, sf_dir: str, k: int) -> dict:
    from data_pipeline_spark.queries import QUERIES

    def run(name, d):
        return QUERIES[name].spark(spark, d)

    inv = {}
    inv["q1_pricing_summary"] = check_scaled_agg(
        run("q1_pricing_summary", BASE),
        run("q1_pricing_summary", sf_dir),
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge", "count_order"],
        equal=["avg_qty", "avg_disc"],
        k=k,
    )
    inv["q5_local_supplier_volume"] = check_scaled_agg(
        run("q5_local_supplier_volume", BASE),
        run("q5_local_supplier_volume", sf_dir),
        ["n_name"], ["revenue"], k=k,
    )
    inv["q9_product_profit"] = check_scaled_agg(
        run("q9_product_profit", BASE),
        run("q9_product_profit", sf_dir),
        ["nation", "o_year"], ["sum_profit"], k=k,
    )
    inv["q13_order_count_distribution"] = check_scaled_agg(
        run("q13_order_count_distribution", BASE),
        run("q13_order_count_distribution", sf_dir),
        ["c_count"], ["custdist"], k=k,
    )
    inv["q21_waiting_suppliers"] = check_scaled_agg(
        run("q21_waiting_suppliers", BASE),
        run("q21_waiting_suppliers", sf_dir),
        ["s_name"], ["numwait"], k=k,
    )
    inv["shipped_within_90d"] = check_scaled_agg(
        run("shipped_within_90d", BASE),
        run("shipped_within_90d", sf_dir),
        ["o_orderpriority"], ["n_lineitems", "sum_qty"], k=k,
    )
    inv["hypertable_rollup"] = check_scaled_agg(
        run("hypertable_rollup", BASE),
        run("hypertable_rollup", sf_dir),
        ["granularity", "bucket_start", "event_type"],
        ["n_events", "sum_value"],
        k=k,
    )
    # incident counters scale by k AND incident rows replicate k times
    inc_b = run("incident_window_counts", BASE)
    inc_s = run("incident_window_counts", sf_dir).select(
        (F.col("incident_id") % OFFSET).alias("incident_id"),
        "n_events",
        "n_users",
    )
    j = inc_s.join(
        inc_b.select(
            "incident_id",
            F.col("n_events").alias("__be"),
            F.col("n_users").alias("__bu"),
        ),
        "incident_id",
        "left",
    )
    bad = _viol(
        F.col("__be").isNull()
        | (F.col("n_events") != k * F.col("__be"))
        | (F.col("n_users") != k * F.col("__bu")),
        j,
    )
    rows_ok = inc_s.count() == k * inc_b.count()
    inv["incident_window_counts"] = {
        "violations": bad, "rows_x_k": rows_ok, "ok": bad == 0 and rows_ok
    }
    inv["sessionize_events"] = check_replicated(
        run("sessionize_events", BASE),
        run("sessionize_events", sf_dir),
        ["user_id"], k,
    )
    inv["trailing_7d_user_spend"] = check_replicated(
        run("trailing_7d_user_spend", BASE),
        run("trailing_7d_user_spend", sf_dir),
        ["user_id", "event_id"], k,
    )
    inv["priority_queue_head"] = check_replicated(
        run("priority_queue_head", BASE),
        run("priority_queue_head", sf_dir),
        ["o_custkey", "o_orderkey"], k,
    )
    inv["q18_large_orders"] = check_q18(
        spark, run("q18_large_orders", sf_dir), k
    )
    return inv


# ------------------------------------------------------------- skew

def _task_summary(spark, stage_id: int, attempt: int) -> dict:
    app = spark.sparkContext.applicationId
    try:
        s = _api(
            spark,
            f"applications/{app}/stages/{stage_id}/{attempt}/taskSummary"
            "?quantiles=0.5,1.0",
        )
    except Exception:
        return {}
    out = {}
    for key, label in [
        ("executorRunTime", "task_run_ms"),
        ("shuffleReadMetrics", "shuffle_read_bytes"),
    ]:
        v = s.get(key)
        if isinstance(v, dict):
            v = v.get("readBytes", v.get("totalBlocksFetched"))
        if isinstance(v, list) and len(v) == 2:
            out[f"{label}_p50"] = round(v[0], 1)
            out[f"{label}_max"] = round(v[1], 1)
    return out


def skew_rehearsal(spark, factor: int) -> dict:
    """AQE skewed-partition split, measured.

    Builds a deliberately skewed orders table at ``factor``x (every copy
    row with orderkey % 2 == 0 is reassigned to ONE hot customer — ~half
    of the fact on a single join key), shuffles-joins it against the
    scaled customer dim (broadcast disabled), and runs the identical
    plan with AQE skew-join ON vs OFF.  Thresholds are scaled down from
    the 256 MB default so the sandbox partition sizes exercise the same
    split mechanics a 1000-executor cluster sees at defaults; results
    must be bit-identical either way, and the ON run's join stage must
    show more tasks + a smaller max task.
    """
    sf_dir = build_scaled(spark, factor)
    out = SCRATCH / f"rel_x{factor}" / "orders_skew.parquet"
    hot = 7
    if not (out / "_SUCCESS").exists():
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        skewed = orders.withColumn(
            "o_custkey",
            F.when(
                (F.col("o_custkey") >= OFFSET) & (F.col("o_orderkey") % 2 == 0),
                F.lit(hot),
            ).otherwise(F.col("o_custkey")),
        )
        skewed.repartition(32).write.mode("overwrite").parquet(str(out))

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(str(out))

    def run_join():
        j = orders.join(cust, orders.o_custkey == cust.c_custkey)
        return (
            j.groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
                ).alias("price_c"),
            )
        )

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in [
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
        ]
    }
    report: dict = {"factor": factor, "hot_custkey": hot}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        results = {}
        for mode, enabled in [("skew_off", "false"), ("skew_on", "true")]:
            conf.set("spark.sql.adaptive.skewJoin.enabled", enabled)
            before = _stage_ids(spark)
            t0 = time.perf_counter()
            rows = run_join().collect()
            wall = round(time.perf_counter() - t0, 2)
            m = _stage_metrics(spark, before)
            # the join stage = the new stage with the largest shuffle read
            app = spark.sparkContext.applicationId
            stages = [
                s
                for s in _api(spark, f"applications/{app}/stages")
                if (s["stageId"], s["attemptId"]) not in before
                and s.get("status") == "COMPLETE"
            ]
            join_stage = max(stages, key=lambda s: s.get("shuffleReadBytes", 0))
            detail = {
                "wall_s": wall,
                "join_stage_tasks": join_stage.get("numCompleteTasks"),
                "shuffle_read_mb": m["shuffle_read_mb"],
                **_task_summary(
                    spark, join_stage["stageId"], join_stage["attemptId"]
                ),
            }
            results[mode] = {r["c_nationkey"]: (r["n_orders"], r["price_c"]) for r in rows}
            report[mode] = detail
            print(f"    {mode}: {detail}", flush=True)
        report["results_identical"] = results["skew_on"] == results["skew_off"]
        on, off = report["skew_on"], report["skew_off"]
        report["split_happened"] = (
            on["join_stage_tasks"] > off["join_stage_tasks"]
        )
        report["ok"] = report["results_identical"] and report["split_happened"]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
    return report


# ------------------------------------------------------------- fact-shuffle regime

JOIN_FAMILY = [
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q13_order_count_distribution",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "shipped_within_90d",
]


def fact_shuffle_sweep(spark, scales) -> dict:
    """Measure the join family under the 100 TB plan regime.

    At sandbox scale the column-pruned orders estimate still fits the
    engine's 64 MiB broadcast threshold, so the default sweep measures
    BroadcastHashJoin plans for the fact-fact joins — optimal here, but
    not the plan a 1000-executor cluster gets when orders is tens of
    TB.  This sweep drops the threshold to Spark's 10 MB default: the
    genuinely small dims (nation/region/part/supplier — fixed-size at
    any corpus scale by this rehearsal's design) keep broadcasting,
    while the GROWN facts shuffle — the shape that actually exists at
    100 TB.  Row counts must match the default-regime run."""
    from data_pipeline_spark.queries import QUERIES

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in [
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        ]
    }
    out: dict = {}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            str(10 * 1024 * 1024),
        )
        for factor in scales:
            sf_dir = build_scaled(spark, factor)
            entry = {}
            print(f"  fact-shuffle regime, {factor}x:", flush=True)
            for name in JOIN_FAMILY:
                q = QUERIES[name].spark
                entry[name] = timed_run(
                    spark, lambda q=q: len(q(spark, sf_dir).collect()), name
                )
            out[str(factor)] = entry
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
    return out


# ------------------------------------------------------------- spill probe

def spill_probe(spark, factor: int) -> dict:
    """Graceful-degradation probe: every rehearsal so far records ZERO
    spill (128 GiB heap absorbs everything), which leaves the spill path
    itself unexercised.  Run this mode in a memory-constrained process
    (e.g. ``SPARK_GRAFT_DRIVER_MEM=1g SPARK_GRAFT_CPUS=8``) against an
    already-built scaled dir: it executes the two heaviest shuffle
    shapes (the q9 join tree and the sessionize window sort) at
    ``factor``x THROUGH their invariant checkers, so the run proves both
    that the operators spill instead of dying AND that spilled execution
    returns bit-identical results."""
    sf_dir = build_scaled(spark, factor)
    from data_pipeline_spark.queries import QUERIES

    def run(name, d):
        return QUERIES[name].spark(spark, d)

    # the engine default (64 MiB) is sized for full executors; a
    # memory-starved deployment would tune it down, so the probe models
    # that — otherwise the q9 fact-fact join broadcast-OOMs instead of
    # degrading to a spilling sort-merge join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
    )
    out: dict = {
        "factor": factor,
        "driver_mem": spark.sparkContext.getConf().get("spark.driver.memory"),
        "cores": spark.sparkContext.defaultParallelism,
    }
    for name, check in [
        (
            "q9_product_profit",
            lambda: check_scaled_agg(
                run("q9_product_profit", BASE),
                run("q9_product_profit", sf_dir),
                ["nation", "o_year"], ["sum_profit"], k=factor,
            ),
        ),
        (
            "sessionize_events",
            lambda: check_replicated(
                run("sessionize_events", BASE),
                run("sessionize_events", sf_dir),
                ["user_id"], factor,
            ),
        ),
    ]:
        before = _stage_ids(spark)
        t0 = time.perf_counter()
        inv = check()
        m = _stage_metrics(spark, before)
        m["wall_s"] = round(time.perf_counter() - t0, 2)
        m["invariant"] = inv
        out[name] = m
        print(f"    {name}: {m}", flush=True)
    return out


# ------------------------------------------------------------- main

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,30")
    ap.add_argument("--skew-factor", type=int, default=10)
    ap.add_argument(
        "--spill-probe",
        type=int,
        default=0,
        metavar="FACTOR",
        help="run only the constrained-memory spill probe at FACTORx "
        "(use with SPARK_GRAFT_DRIVER_MEM / SPARK_GRAFT_CPUS)",
    )
    ap.add_argument(
        "--fact-shuffle-only",
        action="store_true",
        help="run only the 10 MB-threshold join-family sweep over "
        "--scales and merge it into an existing --out artifact",
    )
    ap.add_argument("--out", default="SCALE_REHEARSAL_REL_r10.json")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    import data_pipeline_spark.queries_llm  # noqa: F401 — registers catalog
    import data_pipeline_spark.queries_tpch  # noqa: F401
    from data_pipeline_spark.queries import QUERIES
    from data_pipeline_spark.session import get_spark

    spark = get_spark(
        "scale-rehearsal-rel",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "10000",
            "spark.ui.retainedJobs": "10000",
        },
    )

    if args.fact_shuffle_only:
        print("== fact-shuffle regime sweep", flush=True)
        sweep = fact_shuffle_sweep(spark, scales)
        try:
            with open(args.out) as fh:
                report = json.load(fh)
        except FileNotFoundError:
            report = {}
        report["fact_shuffle_regime"] = sweep
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {args.out}", flush=True)
        spark.stop()
        return

    if args.spill_probe:
        print(f"== spill probe ({args.spill_probe}x)", flush=True)
        probe = spill_probe(spark, args.spill_probe)
        try:  # merge into an existing artifact like --fact-shuffle-only
            with open(args.out) as fh:
                report = json.load(fh)
        except FileNotFoundError:
            report = {}
        report["spill_probe"] = probe
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {args.out}", flush=True)
        spark.stop()
        return

    report: dict = {"base": BASE, "offset": OFFSET, "scales": {}}

    for factor in scales:
        print(f"== scale {factor}x", flush=True)
        t0 = time.perf_counter()
        sf_dir = build_scaled(spark, factor)
        build_s = round(time.perf_counter() - t0, 2)
        n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
        n_ev = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        print(f"  corpus: {n_li} lineitem, {n_ev} events (build {build_s}s)",
              flush=True)
        entry: dict = {
            "dir": sf_dir,
            "n_lineitem": n_li,
            "n_events": n_ev,
            "corpus_build_s": build_s,
            "queries": {},
        }
        for name in HEAVY:
            q = QUERIES[name].spark
            entry["queries"][name] = timed_run(
                spark, lambda q=q: len(q(spark, sf_dir).collect()), name
            )
        if factor > 1:
            print("  invariants:", flush=True)
            entry["invariants"] = check_invariants(spark, sf_dir, factor)
            for k, v in entry["invariants"].items():
                print(f"    {k}: {v}", flush=True)
        app = spark.sparkContext.applicationId
        execs = _api(spark, f"applications/{app}/executors")
        peaks = [e.get("peakMemoryMetrics", {}) for e in execs]
        entry["executor_peak_heap_mb"] = round(
            max((p.get("JVMHeapMemory", 0) for p in peaks), default=0)
            / (1024 * 1024),
            1,
        )
        report["scales"][str(factor)] = entry

    print(f"== skew rehearsal ({args.skew_factor}x)", flush=True)
    report["skew"] = skew_rehearsal(spark, args.skew_factor)

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.out}", flush=True)

    if "1" in report["scales"] and len(report["scales"]) > 1:
        print(f"\n{'query':30s}", end="")
        for s in scales:
            print(f"  {s}x_wall {s}x_shW", end="")
        print(flush=True)
        for name in HEAVY:
            print(f"{name:30s}", end="")
            for s in scales:
                qq = report["scales"][str(s)]["queries"][name]
                print(f"  {qq['wall_s']:7.1f} {qq['shuffle_write_mb']:6.1f}",
                      end="")
            print(flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
