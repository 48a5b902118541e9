"""Relational layer — the join/agg/window/sort/set-op surface.

The reference has NO server-side relational operators: it delegates
SQL to MySQL over `ha_tera` full scans (`sql/src/ha_tera.cc:781-880`)
and its TPC-C harness hand-joins via index tables
(`src/benchmark/tpcc/tera_tpccdb.cc`). In the rebuild this whole layer
is Spark SQL/Catalyst; the queries below pin its semantics against a
DuckDB oracle and double as the bench workload.

Scale notes (100 TB stance): facts (lineitem/orders) are never
broadcast; true dimensions (region/nation, and supplier/part where a
real deployment keeps them dimension-sized) get explicit broadcast
hints; aggregates are expressed so Catalyst plans partial (map-side)
aggregation; money sums are rounded identically on both engines to
make value-hash comparison float-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tera_spark.queries import query
from tera_spark.sources.tables import load


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           cast(count(*) AS bigint)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_rev()), 2).alias("sum_disc_price"),
            F.round(F.sum(_rev() * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < timestamp '1998-03-15 00:00:00'
      AND l_shipdate  > timestamp '1998-03-15 00:00:00'
    GROUP BY l_orderkey, orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3(spark: SparkSession, sf: str) -> DataFrame:
    # aggregate-before-join: per-order revenue folds on the fact alone
    # (map-side partials on one long key), then order/customer predicates
    # apply to the order-cardinality result — correct because revenue
    # depends only on lineitem rows of the order.
    cutoff = F.lit("1998-03-15 00:00:00")
    cust = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = li.groupBy("l_orderkey").agg(F.sum(_rev()).alias("_rev"))
    return (
        rev.join(orders, rev.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "l_orderkey",
            F.round(F.col("_rev"), 2).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= timestamp '1996-01-01 00:00:00'
      AND o_orderdate <  timestamp '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00"))
    )
    li = load(spark, sf, "lineitem")
    supp = load(spark, sf, "supplier")
    nation = F.broadcast(load(spark, sf, "nation"))
    region = F.broadcast(load(spark, sf, "region").filter(F.col("r_name") == "ASIA"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@query(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
      AND l_shipdate <  timestamp '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
)
def q6(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "q7_volume_shipping",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           cast(extract(year FROM l_shipdate) AS int) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1','NATION_2') AND cn.n_name IN ('NATION_1','NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    supp = load(spark, sf, "supplier")
    nat = load(spark, sf, "nation").filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    sn = F.broadcast(nat.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")))
    cn = F.broadcast(nat.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(sn, supp.s_nationkey == F.col("sk"))
        .join(cn, cust.c_nationkey == F.col("ck"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= timestamp '1997-01-01 00:00:00'
      AND o_orderdate <  timestamp '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00"))
    )
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(load(spark, sf, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_effect",
    """
    SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END) / sum(l_extendedprice * (1 - l_discount)), 4)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= timestamp '1997-03-01 00:00:00'
      AND l_shipdate <  timestamp '1997-04-01 00:00:00'
    """,
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00"))
    )
    part = load(spark, sf, "part")
    rev = _rev()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "q18_large_volume_customer",
    """
    SELECT c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, orderdate, totalprice
    HAVING sum(l_quantity) > 150
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    # aggregate-before-join: the fact shuffles only (l_orderkey, qty)
    # with map-side partials, the HAVING filter runs before any join,
    # and the surviving handful of orders joins order/customer attrs.
    # Equivalent because the grouped order attributes are constant per
    # o_orderkey; at 100 TB this removes the fact×orders×customer
    # pre-aggregation join entirely.
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    heavy = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_raw_qty"))
        .filter(F.col("_raw_qty") > 150)
    )
    return (
        heavy.join(orders, heavy.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round(F.col("_raw_qty"), 2).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "q_topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@query(
    "q_window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend,
           cast(lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                AS bigint) AS prev_order
    FROM orders WHERE o_custkey < 200
    """,
)
def q_window_running(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders").filter(F.col("o_custkey") < 200)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias(
            "running_spend"
        ),
        F.lag("o_orderkey").over(w).cast("long").alias("prev_order"),
    )


@query(
    "q_rollup_revenue",
    """
    SELECT coalesce(l_returnflag, '@ALL') AS returnflag,
           coalesce(l_linestatus, '@ALL') AS linestatus,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select(
            F.coalesce("l_returnflag", F.lit("@ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("@ALL")).alias("linestatus"),
            "revenue",
        )
    )


@query(
    "q_semi_anti_join",
    """
    SELECT cast(count(*) AS bigint) AS n_customers_without_orders
    FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_anti(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
    )


@query(
    "q_set_ops",
    """
    WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
    SELECT 'both' AS tag, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
    UNION ALL
    SELECT 'cust_only' AS tag, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
    """,
)
def q_setops(spark: SparkSession, sf: str) -> DataFrame:
    cn = load(spark, sf, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    sn = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    both = cn.intersect(sn).select(F.lit("both").alias("tag"), "nk")
    conly = cn.exceptAll(sn).select(F.lit("cust_only").alias("tag"), "nk")
    return both.unionByName(conly)


@query(
    "q_distinct_agg",
    """
    SELECT l_returnflag,
           cast(count(DISTINCT l_suppkey) AS bigint) AS n_supp,
           cast(count(DISTINCT l_partkey) AS bigint) AS n_part,
           cast(count(*) AS bigint) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_distinct(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_pivot_status",
    """
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS spend_f,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS spend_o,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS spend_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    agg = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .sum("o_totalprice")
    )
    return agg.select(
        "o_orderpriority",
        F.round(F.coalesce("F", F.lit(0.0)), 2).alias("spend_f"),
        F.round(F.coalesce("O", F.lit(0.0)), 2).alias("spend_o"),
        F.round(F.coalesce("P", F.lit(0.0)), 2).alias("spend_p"),
    )


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, cast(count(*) AS bigint) AS order_count
    FROM orders
    WHERE o_orderdate >= timestamp '1997-01-01 00:00:00'
      AND o_orderdate <  timestamp '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4(spark: SparkSession, sf: str) -> DataFrame:
    """EXISTS → left-semi join (tera has no subqueries; MySQL executes
    them above ha_tera full scans, sql/src/ha_tera.cc:781-880)."""
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00"))
    )
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q11_important_parts",
    """
    WITH pr AS (
      SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, round(value, 2) AS value
    FROM pr WHERE value > (SELECT avg(value) * 1.5 FROM pr)
    """,
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    # fraction-of-total: scalar subquery → cross-join of a 1-row aggregate
    li = load(spark, sf, "lineitem")
    pr = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("value"))
    total = pr.agg((F.avg("value") * 1.5).alias("cut"))
    return (
        pr.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("cut"))
        .select("l_partkey", F.round("value", 2).alias("value"))
    )


@query(
    "q13_cust_order_distribution",
    """
    SELECT c_count, cast(count(*) AS bigint) AS custdist FROM (
      SELECT c_custkey, cast(count(o_orderkey) AS bigint) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
        AND l_shipdate <  timestamp '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00"))
    )
    rev = li.groupBy("l_suppkey").agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = load(spark, sf, "supplier")
    return (
        supp.join(rev, supp.s_suppkey == rev.l_suppkey)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_qty_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    # correlated scalar subquery → per-key aggregate then equi-join
    li = load(spark, sf, "lineitem")
    part = F.broadcast(load(spark, sf, "part").filter(F.col("p_brand") == "Brand#1"))
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q19_disjunctive_filter",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    part = F.broadcast(load(spark, sf, "part"))
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 21))
        | ((b == "Brand#2") & s.between(1, 25) & q.between(10, 30))
        | ((b == "Brand#3") & s.between(1, 35) & q.between(20, 40))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@query(
    "q22_idle_rich_customers",
    """
    SELECT c_nationkey, cast(count(*) AS bigint) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= timestamp '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00")
    ).select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("cut"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("cut"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q_cube_agg",
    """
    SELECT coalesce(o_orderstatus, '@ALL') AS status,
           coalesce(o_orderpriority, '@ALL') AS priority,
           cast(count(*) AS bigint) AS n,
           round(sum(o_totalprice), 2) AS spend
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .select(
            F.coalesce("o_orderstatus", F.lit("@ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("@ALL")).alias("priority"),
            "n",
            "spend",
        )
    )


@query(
    "q_sql_surface",
    """
    SELECT n_name, o_orderstatus,
           cast(count(*) AS bigint) AS n_orders,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= timestamp '1998-01-01 00:00:00'
    GROUP BY n_name, o_orderstatus
    """,
)
def q_sql_surface(spark: SparkSession, sf: str) -> DataFrame:
    """The SQL entry point itself (the reference's MySQL frontend,
    sql/src/ha_tera.cc): tables registered as views, query typed as
    SQL, planned by Catalyst."""
    from tera_spark.sources.tables import register_views

    register_views(spark, sf)
    return spark.sql(
        """
        SELECT n_name, o_orderstatus,
               count(*) AS n_orders,
               round(avg(o_totalprice), 2) AS avg_price
        FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= timestamp '1998-01-01 00:00:00'
        GROUP BY n_name, o_orderstatus
        """
    )


# --- Remaining TPC-H shapes, adapted to the driver schema ------------------
# The testdata has no partsupp table and lineitem carries no
# shipmode/commitdate/receiptdate, so q2/q9/q12/q16/q20/q21 keep their
# *plan shape* (correlated min, profit rollup, conditional counts,
# NOT-IN anti-join, nested semi-joins, exists/not-exists self-join) with
# supply-cost/ship-delay stand-ins derived from lineitem/part columns.


@query(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, s_name, n_name,
           (floor(unit_cost * 10000)::double / 10000) AS unit_cost
    FROM cost
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size <= 10
      AND unit_cost = (SELECT min(c2.unit_cost) FROM cost c2
                       WHERE c2.l_partkey = cost.l_partkey)
    """,
)
def q2(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated-min subquery (TPC-H Q2 shape): cheapest supplier per
    part. The correlated scalar subquery becomes a window-min over the
    aggregated cost table — one shuffle on l_partkey serves both the
    aggregation and the window, so the correlation adds no exchange."""
    li = load(spark, sf, "lineitem").filter(F.col("l_quantity") > 0)
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = W.partitionBy("l_partkey")
    best = cost.withColumn("best_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("best_cost")
    )
    part = load(spark, sf, "part").filter(F.col("p_size") <= 10)
    supp = F.broadcast(load(spark, sf, "supplier"))
    nation = F.broadcast(load(spark, sf, "nation"))
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .join(supp, best.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            # floor-truncation, not round: a half-way double (…x.xxxx5)
            # rounds differently across engines (observed at sf0.1)
            (F.floor(F.col("unit_cost") * 10000).cast("double") / 10000).alias("unit_cost"),
        )
    )


@query(
    "q8_market_share",
    """
    SELECT cast(extract(year FROM o_orderdate) AS int) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_1'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY o_year
    """,
)
def q8(spark: SparkSession, sf: str) -> DataFrame:
    """Market-share (TPC-H Q8 shape): one nation's fraction of regional
    revenue per year — conditional-sum ratio over a 6-way join; both
    nation sides broadcast."""
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    supp = F.broadcast(load(spark, sf, "supplier"))
    n1 = F.broadcast(
        load(spark, sf, "nation").select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
        )
    )
    n2 = F.broadcast(
        load(spark, sf, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    region = F.broadcast(load(spark, sf, "region").filter(F.col("r_name") == "ASIA"))
    rev = _rev()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, cust.c_nationkey == F.col("c_nk"))
        .join(region, F.col("c_rk") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n2, supp.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    """
    SELECT n_name AS nation, cast(extract(year FROM l_shipdate) AS int) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.4 * p_retailprice * l_quantity), 2) AS profit
    FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type IN ('PROMO', 'ECONOMY')
    GROUP BY n_name, o_year
    """,
)
def q9(spark: SparkSession, sf: str) -> DataFrame:
    """Product-profit rollup (TPC-H Q9 shape) by supplier nation and
    year; supply cost stands in as 0.4 * p_retailprice (no partsupp in
    the driver schema)."""
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part").filter(F.col("p_type").isin("PROMO", "ECONOMY"))
    supp = F.broadcast(load(spark, sf, "supplier"))
    nation = F.broadcast(load(spark, sf, "nation"))
    profit = _rev() - 0.4 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@query(
    "q12_priority_shipping",
    """
    SELECT l_linestatus,
           cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
           cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS bigint) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
      AND l_shipdate <  timestamp '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional-count join (TPC-H Q12 shape); the driver lineitem has
    no l_shipmode, so lines group by l_linestatus instead."""
    orders = load(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q16_supplier_part_count",
    """
    SELECT p_brand, p_type, p_size,
           cast(count(DISTINCT l_suppkey) AS bigint) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    """NOT-IN exclusion + distinct count (TPC-H Q16 shape); lineitem is
    the part-supplier bridge (no partsupp). The NOT IN becomes a
    broadcast anti-join on the tiny exclusion list."""
    part = load(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = load(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = load(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_excess_stock_suppliers",
    """
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= timestamp '1997-01-01 00:00:00'
        AND l_shipdate <  timestamp '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 300
    )
    """,
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    """Nested semi-join chain (TPC-H Q20 shape): suppliers who moved
    excess volume of PROMO parts in a year. The aggregated HAVING
    subquery is computed once and semi-joined (broadcast: supplier-count
    sized)."""
    part = load(spark, sf, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    supp = load(spark, sf, "supplier")
    nation = F.broadcast(load(spark, sf, "nation"))
    return (
        supp.join(F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
    )


@query(
    "q21_waiting_suppliers",
    """
    WITH l1 AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT s_name, cast(count(*) AS bigint) AS numwait
    FROM l1
      JOIN orders   ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
      JOIN supplier ON l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    """EXISTS + NOT-EXISTS self-join (TPC-H Q21 shape): the supplier
    solely responsible for returns on a multi-supplier finished order.
    Both correlated subqueries become self-joins of lineitem keyed on
    l_orderkey — the same shuffle partitioning serves the join pair."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    others = li.select(
        F.col("l_orderkey").alias("o_key"),
        F.col("l_suppkey").alias("o_supp"),
        "l_returnflag",
    )
    has_other = others.select("o_key", "o_supp").alias("l2")
    other_returned = others.filter(F.col("l_returnflag") == "R").select("o_key", "o_supp").alias("l3")
    orders = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    supp = F.broadcast(load(spark, sf, "supplier").select("s_suppkey", "s_name"))
    waiting = (
        l1.join(
            has_other,
            (l1.l_orderkey == F.col("l2.o_key")) & (l1.l_suppkey != F.col("l2.o_supp")),
            "left_semi",
        )
        .join(
            other_returned,
            (l1.l_orderkey == F.col("l3.o_key")) & (l1.l_suppkey != F.col("l3.o_supp")),
            "left_anti",
        )
        .join(orders, l1.l_orderkey == orders.o_orderkey)
        .join(supp, l1.l_suppkey == supp.s_suppkey)
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q_grouping_sets",
    """
    SELECT coalesce(l_returnflag, '@ALL') AS returnflag,
           coalesce(l_linestatus, '@ALL') AS linestatus,
           cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS bigint) AS gid,
           cast(count(*) AS bigint) AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Arbitrary grouping-set combinations with GROUPING() disambiguation
    (rollup/cube's general form) — straight SQL on both engines."""
    from tera_spark.sources.tables import register_views

    register_views(spark, sf)
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, '@ALL') AS returnflag,
               coalesce(l_linestatus, '@ALL') AS linestatus,
               cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS bigint) AS gid,
               count(*) AS n,
               round(sum(l_quantity), 2) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "q_percentile_profile",
    """
    SELECT l_returnflag,
           cast(count(*) AS bigint) AS n,
           round(quantile_cont(l_quantity, 0.25), 4) AS p25,
           round(quantile_cont(l_quantity, 0.50), 4) AS p50,
           round(quantile_cont(l_quantity, 0.75), 4) AS p75,
           round(quantile_cont(l_quantity, 0.90), 4) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear-interpolation on doubles). The
    four quantiles come out of ONE aggregate buffer (array form), not
    four — and at scale exact percentile is the operator you replace
    with approx_percentile; both share this plan shape."""
    li = load(spark, sf, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D, 0.9D))").alias("_p"),
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(F.element_at("_p", 1), 4).alias("p25"),
        F.round(F.element_at("_p", 2), 4).alias("p50"),
        F.round(F.element_at("_p", 3), 4).alias("p75"),
        F.round(F.element_at("_p", 4), 4).alias("p90"),
    )
