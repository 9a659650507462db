"""Scale-path operators: salted skew join, bucketed co-located join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_spark.io import load_table
from data_pipeline_spark.operators.bucketing import bucketed_join, write_bucketed
from data_pipeline_spark.operators.joins import salted_join
from data_pipeline_spark.plans import audit
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    dim = spark.createDataFrame(
        [(i, f"seg{i % 3}") for i in range(150)], "user_id LONG, segment STRING"
    )
    plain = ev.join(dim, "user_id").groupBy("segment").count()
    salted = salted_join(ev, dim, "user_id", salt_buckets=4).groupBy("segment").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k LONG, v STRING")
    small = spark.createDataFrame([(1, "one"), (2, "two")], "k LONG, name STRING")
    out = salted_join(big, small, "k", salt_buckets=3, how="left")
    rows = {r.k: r.name for r in out.collect()}
    assert rows == {1: "one", 2: "two", 99: None}


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem",
        "o_orderkey", num_buckets=8,
    )
    # disable auto-broadcast so the planner actually uses bucket co-location
    # (tiny test tables would otherwise broadcast and skip bucketing)
    spark.sql("SET spark.sql.autoBroadcastJoinThreshold=-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = audit.formatted_plan(joined)
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        # and it still computes the right thing
        expected = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.sql(f"SET spark.sql.autoBroadcastJoinThreshold={64*1024*1024}")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
