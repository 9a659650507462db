"""TPC-H-shape workload pack #2: the classic relational patterns not yet
covered by the core catalog — per-group-min join-back (Q2), the full
local-supplier 6-way join (Q5), nation-pair volume (Q7), market share
(Q8), profit rollup (Q9), returned-item ranking (Q10), outer-join count
distribution (Q13), max-scalar-subquery (Q15), NOT-IN + count-distinct
(Q16), correlated-average threshold (Q17), disjunctive predicate pushdown
(Q19), multi-predicate waiting-supplier (Q21) and anti-join +
global-average opportunity (Q22).

Shapes are adapted to the driver corpus (no partsupp table, no
commit/receipt dates — see TESTDATA.md): the *operator structure* of each
query is preserved, the filter constants come from the synthetic domains.

Determinism follows the catalog-wide contract (data_pipeline_spark.queries
docstring): money math in scaled longs, threshold comparisons via integer
cross-multiplication (q*5*cnt < sum rather than q < 0.2*avg), a single
trailing double division, and total tie-break orders under every LIMIT.

These generalize the reference's lookup/join client patterns
(refresh_manager.py:192-251, schematizer.py:455-472, producer.py:291-422)
into the full relational surface SURVEY.md §2.5-§2.7 declares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_spark.io import load_table
from data_pipeline_spark.operators import aggregates as agg
from data_pipeline_spark.operators import ordering
from data_pipeline_spark.queries import register


def _s2(col: str) -> F.Column:
    return agg.scaled_long(col, 2)


# scaled disc price: extendedprice_cents * (100 - discount_cents); /10000 => $
def _rev() -> F.Column:
    return _s2("l_extendedprice") * (F.lit(100) - _s2("l_discount"))


_REV_SQL = (
    "CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount*100, 0) AS BIGINT))"
)


@register(
    "q2_min_cost_supplier",
    f"""
    WITH cand AS (
        SELECT l.l_partkey, l.l_suppkey,
               CAST(ROUND(l.l_extendedprice*100, 0) AS BIGINT) AS price_c
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    ),
    m AS (SELECT l_partkey, MIN(price_c) AS min_c FROM cand GROUP BY l_partkey)
    SELECT DISTINCT c.l_partkey AS p_partkey, s.s_name,
           CAST(m.min_c AS DOUBLE) / 100.0 AS min_price
    FROM cand c
    JOIN m ON c.l_partkey = m.l_partkey AND c.price_c = m.min_c
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    """,
    doc="Min-cost supplier (Q2 shape): per-group MIN correlated subquery. "
    "SQL writes it as agg + join-back; the Spark plan computes the MIN as "
    "a window over the same shuffle — ONE fact scan instead of the two a "
    "literal join-back costs (no common-subplan reuse in Spark), which "
    "halves the corpus read at scale.  Part and supplier dims broadcast.",
    tags=("J2", "J4", "subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supp = load_table(spark, sf_dir, "supplier")
    cand = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_partkey", "l_suppkey", _s2("l_extendedprice").alias("price_c"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        cand.withColumn("min_c", F.min("price_c").over(w))
        .filter(F.col("price_c") == F.col("min_c"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            (F.col("min_c").cast("double") / 100.0).alias("min_price"),
        )
        .distinct()
    )


@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n.n_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    doc="Local-supplier volume (full Q5 shape): the customer-nation = "
    "supplier-nation equality joins two independent dimension paths; dims "
    "broadcast, facts shuffle once on orderkey.",
    tags=("J4", "J7"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ndim = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    sdim = supp.join(
        F.broadcast(ndim), supp.s_nationkey == ndim.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    fact = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(sdim),
            (li.l_suppkey == sdim.s_suppkey)
            & (cust.c_nationkey == sdim.s_nationkey),
        )
    )
    return fact.groupBy("n_name").agg(
        (F.sum(_rev()).cast("double") / 10000.0).alias("revenue")
    )


@register(
    "q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    doc="Volume shipping (Q7 shape): the nation dimension joined twice "
    "under different roles with a disjunctive cross-condition; both "
    "broadcast, facts shuffle once.",
    tags=("J4", "self-join"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    sdim = supp.join(F.broadcast(n1), supp.s_nationkey == n1.n1_key).select(
        "s_suppkey", "supp_nation"
    )
    cdim = cust.join(F.broadcast(n2), cust.c_nationkey == n2.n2_key).select(
        "c_custkey", "cust_nation"
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    fact = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sdim), li.l_suppkey == sdim.s_suppkey)
        .join(F.broadcast(cdim), F.col("o_custkey") == cdim.c_custkey)
        .filter(pair)
    )
    return fact.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg((F.sum(_rev()).cast("double") / 10000.0).alias("revenue"))


@register(
    "q8_market_share",
    f"""
    WITH all_rev AS (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
               {_REV_SQL} AS rev_c,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n2.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_c ELSE 0 END) AS DOUBLE)
             / CAST(SUM(rev_c) AS DOUBLE) AS mkt_share
    FROM all_rev
    GROUP BY o_year
    """,
    doc="Market share (Q8 shape): conditional numerator over a 7-table "
    "join, integer accumulation with one trailing double division per "
    "group.",
    tags=("J4", "A-ext"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2dim = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("n2_key"))
    cdim = cust.join(F.broadcast(n2dim), cust.c_nationkey == F.col("n2_key")).select(
        "c_custkey"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    sdim = supp.join(F.broadcast(n1), supp.s_nationkey == n1.n1_key).select(
        "s_suppkey", "supp_nation"
    )
    fact = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cdim), F.col("o_custkey") == cdim.c_custkey)
        .join(F.broadcast(sdim), li.l_suppkey == sdim.s_suppkey)
    )
    nat_rev = F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(
        F.lit(0).cast("bigint")
    )
    return fact.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        (F.sum(nat_rev).cast("double") / F.sum(_rev()).cast("double")).alias(
            "mkt_share"
        )
    )


@register(
    "q9_product_profit",
    f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0 AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    doc="Product-type profit (Q9 shape, supply-cost term dropped — no "
    "partsupp table in the corpus): LIKE-filtered part dim broadcast, "
    "profit rolled up by supplier nation and order year.",
    tags=("J4", "A-ext"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    sdim = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    fact = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sdim), li.l_suppkey == sdim.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return fact.groupBy("nation", F.year("o_orderdate").alias("o_year")).agg(
        (F.sum(_rev()).cast("double") / 10000.0).alias("sum_profit")
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
    doc="Returned-item ranking (Q10 shape): selective return-flag filter "
    "pushes to the fact scan; top-k after the grouped join, total "
    "tie-break on custkey.",
    tags=("J4", "O5"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    cdim = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "n_name")
    grouped = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cdim), F.col("o_custkey") == cdim.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(_rev()).cast("double") / 10000.0).alias("revenue"))
    )
    return ordering.top_k(
        grouped.select("c_custkey", "c_name", "n_name", "revenue"),
        [F.col("revenue").desc(), F.col("c_custkey").asc()],
        20,
    )


@register(
    "q13_order_count_distribution",
    """
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
    doc="Customer order-count distribution (Q13 shape): left outer join "
    "with an extra join-side predicate (kept out of the WHERE so "
    "no-order customers survive), then a distribution re-aggregation.",
    tags=("J-outer", "A-ext"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (orders.o_custkey == cust.c_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    f"""
    WITH rev AS (
        SELECT l_suppkey, SUM({_REV_SQL}) AS rev_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(rev.rev_c AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.rev_c = (SELECT MAX(rev_c) FROM rev)
    """,
    doc="Top supplier (Q15 shape): MAX scalar subquery over a derived "
    "aggregation, equality back on the exact scaled revenue (no double "
    "knife-edge), supplier dim broadcast.  The MAX is a window over the "
    "already-aggregated (|suppliers|-sized) frame, not a crossJoin back — "
    "one fact scan, and the single-partition window only ever sees "
    "dimension-cardinality rows.",
    tags=("subquery", "O4"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("rev_c"))
    return (
        rev.withColumn("max_c", F.max("rev_c").over(Window.partitionBy()))
        .filter(F.col("rev_c") == F.col("max_c"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_c").cast("double") / 10000.0).alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 15, 20)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
    doc="Supplier-part relation counts (Q16 shape): NOT IN as a broadcast "
    "left-anti join against the excluded-supplier set, then exact "
    "count-distinct per (brand, type, size).",
    tags=("J6", "A-ext"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 15, 20))
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    kept = li.join(
        F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti"
    )
    return (
        kept.join(F.broadcast(part), kept.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    """
    WITH per_part AS (
        SELECT l_partkey,
               SUM(CAST(ROUND(l_quantity*100, 0) AS BIGINT)) AS sq,
               COUNT(*) AS cnt
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice*100, 0) AS BIGINT)) AS DOUBLE) / 100.0
             AS small_qty_revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#5'
    JOIN per_part a ON a.l_partkey = l.l_partkey
    WHERE CAST(ROUND(l.l_quantity*100, 0) AS BIGINT) * 5 * a.cnt < a.sq
    """,
    doc="Small-quantity revenue (Q17 shape): correlated per-part average "
    "threshold, evaluated as integer cross-multiplication "
    "(q*5*cnt < sum == q < 0.2*avg) so both engines agree bit-exactly.  "
    "The per-part stats are window aggregates over the partkey shuffle — "
    "one fact scan (the SQL's agg + probe-join would scan lineitem "
    "twice); the brand filter joins AFTER the stats so the average stays "
    "over all lineitems of the part.",
    tags=("subquery", "A-ext"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    w = Window.partitionBy("l_partkey")
    stats = li.select(
        "l_partkey", _s2("l_quantity").alias("qs"), _s2("l_extendedprice").alias("pc")
    ).select(
        "l_partkey",
        "qs",
        "pc",
        F.sum("qs").over(w).alias("sq"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    small = stats.join(F.broadcast(part), stats.l_partkey == part.p_partkey).filter(
        F.col("qs") * 5 * F.col("cnt") < F.col("sq")
    )
    return small.agg(
        (F.sum("pc").cast("double") / 100.0).alias("small_qty_revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_matches
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="Disjunctive predicates (Q19 shape): OR-of-ANDs across both join "
    "sides — Catalyst extracts the common brand/size/quantity bounds as "
    "pushable filters; the join stays a broadcast hash join, never a "
    "cartesian.",
    tags=("P6", "J1"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#17") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return joined.filter(cond).agg(
        (F.sum(_rev()).cast("double") / 10000.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_matches"),
    )


@register(
    "q21_waiting_suppliers",
    """
    WITH flagged AS (
        SELECT l.l_orderkey, l.l_suppkey,
               (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
    ),
    per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
        FROM flagged
        GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(DISTINCT f.l_orderkey) AS numwait
    FROM flagged f
    JOIN per_order po ON po.l_orderkey = f.l_orderkey
    JOIN supplier s   ON s.s_suppkey = f.l_suppkey
    WHERE f.late AND po.n_supp > 1 AND po.n_late = 1
    GROUP BY s.s_name
    """,
    doc="Waiting suppliers (Q21 shape, lateness = shipped >60 days after "
    "order — the corpus has no commit/receipt dates): the classic "
    "EXISTS(other supplier) AND NOT EXISTS(other late supplier) pair "
    "computed as per-order distinct supplier sets in a window over ONE "
    "orderkey shuffle — no self-joins of the fact table at all (the "
    "literal SQL costs two extra fact scans; supplier sets per order are "
    "tiny, so collect_set stays cheap).",
    tags=("J6", "semi", "self-join"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    flagged = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("late"),
    )
    w = Window.partitionBy("l_orderkey")
    per_order = flagged.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late"),
    )
    culprits = per_order.filter(
        F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
    )
    return (
        culprits.join(F.broadcast(supp), culprits.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count_distinct("l_orderkey").alias("numwait"))
    )


@register(
    "q22_sales_opportunity",
    """
    WITH pos AS (
        SELECT c_custkey, c_nationkey,
               CAST(ROUND(c_acctbal*100, 0) AS BIGINT) AS bal_c
        FROM customer
        WHERE c_nationkey IN (1, 3, 5, 7, 9) AND c_acctbal > 0.0
    ),
    stats AS (SELECT SUM(bal_c) AS s, COUNT(*) AS n FROM pos)
    SELECT p.c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(p.bal_c) AS DOUBLE) / 100.0 AS totacctbal
    FROM pos p CROSS JOIN stats
    WHERE p.bal_c * stats.n > stats.s
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey)
    GROUP BY p.c_nationkey
    """,
    doc="Sales opportunity (Q22 shape): global-average threshold via "
    "integer cross-multiplication (bal*n > sum == bal > avg) broadcast "
    "back, then a left-anti join against orders for never-ordered "
    "customers.",
    tags=("J6", "subquery"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    pos = cust.filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9) & (F.col("c_acctbal") > 0.0)
    ).select("c_custkey", "c_nationkey", _s2("c_acctbal").alias("bal_c"))
    stats = pos.agg(F.sum("bal_c").alias("s"), F.count(F.lit(1)).alias("n"))
    rich = pos.crossJoin(F.broadcast(stats)).filter(
        F.col("bal_c") * F.col("n") > F.col("s")
    )
    no_orders = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        (F.sum("bal_c").cast("double") / 100.0).alias("totacctbal"),
    )


@register(
    "q20_part_promotion_suppliers",
    """
    WITH shipped AS (
        SELECT l.l_suppkey, l.l_partkey,
               SUM(CAST(ROUND(l.l_quantity*100, 0) AS BIGINT)) AS qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE '%red%'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey, l.l_partkey
    ),
    tot AS (
        SELECT l_partkey, SUM(qty) AS part_qty FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
    FROM shipped sh
    JOIN tot      ON sh.l_partkey = tot.l_partkey
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE sh.qty * 2 > tot.part_qty
    """,
    doc="Potential part promotion (Q20 shape, availqty-free adaptation: "
    "the testdata has no partsupp table, so the 'excess stock' predicate "
    "becomes 'dominant supplier' — shipped more than half of the part's "
    "1997 volume).  Nested aggregate -> correlated threshold via a "
    "partkey join -> semi-join up to supplier/nation; integer "
    "cross-multiplication keeps the share test exact.  Ref: the Q20 "
    "workload class in tests/ of the reference's query surface.",
    tags=("A-ext", "J4", "subquery"),
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    red_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    shipped = (
        li.join(F.broadcast(red_parts), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_s2("l_quantity")).alias("qty"))
    )
    tot = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("part_qty"))
    dominant = shipped.join(tot, "l_partkey").filter(
        F.col("qty") * 2 > F.col("part_qty")
    )
    return (
        dominant.join(
            F.broadcast(supplier), dominant.l_suppkey == supplier.s_suppkey
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )
