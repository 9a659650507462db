"""Unit coverage for the relational scale-rehearsal fixtures and
invariant checkers (tools_scale_rehearsal_rel.py): the key-shift
expansion, the x-k aggregate / replicated-multiset checkers (including
that they actually FAIL on corrupted results), and the q18 top-20
expectation logic — so the rehearsal's green invariants rest on
test-pinned checker semantics, not on the checkers being vacuous."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import tools_scale_rehearsal_rel as rel


def test_offset_preserves_incident_identity():
    # incident_window_counts selects incidents by event_id % 997 == 0;
    # the whole incident-invariant rests on the shift being a multiple
    assert rel.OFFSET % 997 == 0
    # and it must clear every base key space (orderkey < 150k at sf0.1)
    assert rel.OFFSET > 10_000_000


def _agg(spark, rows):
    return spark.createDataFrame(rows, "g STRING, n LONG, avg DOUBLE")


def test_check_scaled_agg_accepts_exact_xk(spark):
    base = _agg(spark, [("a", 10, 1.5), ("b", 4, 2.0)])
    scaled = _agg(spark, [("a", 30, 1.5), ("b", 12, 2.0)])
    r = rel.check_scaled_agg(base, scaled, ["g"], ["n"], equal=["avg"], k=3)
    assert r["ok"]


@pytest.mark.parametrize(
    "bad_rows",
    [
        [("a", 31, 1.5), ("b", 12, 2.0)],  # additive off by one
        [("a", 30, 1.6), ("b", 12, 2.0)],  # ratio column drifted
        [("a", 30, 1.5)],                  # group missing
        [("a", 30, 1.5), ("b", 12, 2.0), ("c", 1, 0.0)],  # extra group
    ],
)
def test_check_scaled_agg_rejects_corruption(spark, bad_rows):
    base = _agg(spark, [("a", 10, 1.5), ("b", 4, 2.0)])
    r = rel.check_scaled_agg(
        base, _agg(spark, bad_rows), ["g"], ["n"], equal=["avg"], k=3
    )
    assert not r["ok"]


def _ent(spark, rows):
    return spark.createDataFrame(rows, "user_id LONG, v LONG")


def test_check_replicated_accepts_key_shifted_copies(spark):
    base = _ent(spark, [(1, 7), (2, 9)])
    scaled = _ent(
        spark,
        [(1, 7), (2, 9),
         (1 + rel.OFFSET, 7), (2 + rel.OFFSET, 9)],
    )
    assert rel.check_replicated(base, scaled, ["user_id"], 2)["ok"]


def test_check_replicated_rejects_value_drift_and_miscount(spark):
    base = _ent(spark, [(1, 7), (2, 9)])
    drift = _ent(
        spark,
        [(1, 7), (2, 9), (1 + rel.OFFSET, 8), (2 + rel.OFFSET, 9)],
    )
    assert not rel.check_replicated(base, drift, ["user_id"], 2)["ok"]
    short = _ent(spark, [(1, 7), (2, 9), (1 + rel.OFFSET, 7)])
    assert not rel.check_replicated(base, short, ["user_id"], 2)["ok"]


def test_build_scaled_shifts_keys_and_keeps_values(spark, monkeypatch, tmp_path):
    base = tmp_path / "base"
    base.mkdir()
    spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(6)],
        "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE",
    ).write.parquet(str(base / "orders.parquet"))
    spark.createDataFrame(
        [(i, 10 * i) for i in range(6)], "l_orderkey LONG, l_qty LONG"
    ).write.parquet(str(base / "lineitem.parquet"))
    spark.createDataFrame(
        [(i,) for i in range(3)], "c_custkey LONG"
    ).write.parquet(str(base / "customer.parquet"))
    spark.sql(
        "SELECT id AS event_id, id AS user_id, "
        "timestamp'2024-01-01' AS ts, 'click' AS event_type, "
        "1.0 AS value, '' AS props FROM range(4)"
    ).write.parquet(str(base / "events.parquet"))
    for t in rel.FIXED:
        (base / f"{t}.parquet").touch()

    monkeypatch.setattr(rel, "BASE", str(base))
    monkeypatch.setattr(rel, "SCRATCH", tmp_path / "scratch")
    out = rel.build_scaled(spark, 3)

    orders = spark.read.parquet(f"{out}/orders.parquet")
    assert orders.count() == 18
    # copy rows: both keys shifted together, values bit-identical
    got = {
        (r.o_orderkey, r.o_custkey, r.o_totalprice) for r in orders.collect()
    }
    for i in range(3):
        for k in range(6):
            assert (k + i * rel.OFFSET, k % 3 + i * rel.OFFSET, float(k)) in got
    # lineitem shifts only l_orderkey; events shift both ids, keep ts
    li = spark.read.parquet(f"{out}/lineitem.parquet")
    assert li.filter(F.col("l_qty") % 10 != 0).count() == 0
    assert li.count() == 18
    ev = spark.read.parquet(f"{out}/events.parquet")
    assert ev.select("ts").distinct().count() == 1
    assert ev.count() == 12
    # fixed dims are symlinks to the base files
    assert (tmp_path / "scratch" / "rel_x3" / "nation.parquet").is_symlink()
    # idempotent: a second call returns without rewriting
    assert rel.build_scaled(spark, 3) == out


def test_check_q18_expected_top20_tiebreak(spark, monkeypatch, tmp_path):
    """The expected scaled top-20 interleaves copies by (qty DESC,
    orderkey ASC): all copies of the heaviest order precede the
    runner-up whenever qty values differ, and base keys precede copy
    keys inside a qty tie."""
    base = tmp_path / "b"
    base.mkdir()
    # two qualifying orders (sum qty 400 and 300), one below threshold
    li_rows = []
    for ok, qty in [(1, 400.0), (2, 300.0), (3, 10.0)]:
        li_rows.append((ok, qty))
    spark.createDataFrame(
        li_rows, "l_orderkey LONG, l_quantity DOUBLE"
    ).write.parquet(str(base / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)],
        "o_orderkey LONG, o_custkey LONG",
    ).withColumn(
        "o_orderdate", F.lit("2024-01-01").cast("timestamp")
    ).write.parquet(str(base / "orders.parquet"))
    spark.createDataFrame(
        [(100, "cA"), (200, "cB"), (300, "cC")],
        "c_custkey LONG, c_name STRING",
    ).write.parquet(str(base / "customer.parquet"))
    monkeypatch.setattr(rel, "BASE", str(base))

    k = 30
    copies = list(range(k))
    rows = [("cA", 1 + i * rel.OFFSET, 400.0) for i in copies[:20]]
    good = spark.createDataFrame(
        rows, "c_name STRING, o_orderkey LONG, total_qty DOUBLE"
    ).withColumn("o_orderdate", F.lit("2024-01-01").cast("timestamp")).select(
        "c_name", "o_orderkey", "o_orderdate", "total_qty"
    )
    assert rel.check_q18(spark, good, k)["ok"]
    # swapping in any runner-up row must be rejected
    bad = good.limit(19).unionByName(
        spark.sql(
            "SELECT 'cB' c_name, CAST(2 AS LONG) o_orderkey, "
            "timestamp'2024-01-01' o_orderdate, 300.0D total_qty"
        )
    )
    assert not rel.check_q18(spark, bad, k)["ok"]
