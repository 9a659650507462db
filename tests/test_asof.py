"""asof_join operator semantics: tie visibility, inner-drop, and the
NULL-column hazard (right rows must travel as one struct — per-column
last(ignorenulls) fills would stitch values from different rows)."""

from __future__ import annotations

from data_pipeline_spark.operators.joins import asof_join


def test_asof_join_tie_inner_and_null_integrity(spark):
    right = spark.createDataFrame(
        [
            # (key, ts, x, y) — x NULL in the LATER row: a per-column fill
            # would leak x=10 from ts=5 into the ts=20 match
            (1, 5, 10, None),
            (1, 20, None, 77),
            (2, 50, 1, 1),
        ],
        "k INT, rts INT, x INT, y INT",
    )
    left = spark.createDataFrame(
        [
            (1, 4, "before-any"),   # no right row yet -> dropped (inner)
            (1, 5, "tie"),          # rts == lts counts as visible
            (1, 30, "after-both"),  # must take the ts=20 row wholesale
            (3, 99, "other-key"),   # key never in right -> dropped
        ],
        "k INT, lts INT, tag STRING",
    )
    rows = {
        r.tag: (r.rts, r.x, r.y)
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_cols=["rts", "x", "y"],
        ).collect()
    }
    assert set(rows) == {"tie", "after-both"}
    assert rows["tie"] == (5, 10, None)
    # wholesale row: x stays NULL even though an earlier row had x=10
    assert rows["after-both"] == (20, None, 77)


def test_asof_join_matches_bruteforce_on_random_inputs(spark):
    """Property: on random inputs (drawn once per session — a per-example
    Spark job would be minutes), asof_join == the obvious per-row scan."""
    import random

    rng = random.Random(42)
    right_rows = sorted(
        {(rng.randint(1, 6), rng.randint(0, 40)) for _ in range(60)}
    )
    right_data = [(k, ts, k * 1000 + ts) for k, ts in right_rows]
    left_data = [
        (rng.randint(1, 7), rng.randint(0, 45), i) for i in range(120)
    ]

    right = spark.createDataFrame(right_data, "k INT, rts INT, payload INT")
    left = spark.createDataFrame(left_data, "k INT, lts INT, lid INT")
    got = {
        (r.k, r.lid): (r.rts, r.payload)
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_cols=["rts", "payload"],
        ).collect()
    }

    want = {}
    for k, lts, lid in left_data:
        cands = [(rts, p) for (rk, rts, p) in right_data if rk == k and rts <= lts]
        if cands:
            want[(k, lid)] = max(cands)
    assert got == want
