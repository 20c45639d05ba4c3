"""Relational query surface over the TPC-H-ish fixture tables.

The reference's paradigm can *express* all of this (any Map/Reduce pair,
SURVEY.md §2.4) but implements none of it as named operators; here each is
a declarative DataFrame plan so Catalyst supplies pushdown, pruning, join
selection, partial aggregation, and AQE re-planning.

Cross-engine determinism convention (used by every money aggregate):
floating-point arithmetic happens in double (IEEE, deterministic per-row),
the per-row result is cast once to DECIMAL(18,6) (exact), SUMmed exactly,
and the exact sum is cast back to double.  This removes summation-order
nondeterminism entirely, so Spark and the DuckDB oracle agree bit-for-bit
without rounding tolerances.

Scale notes inline per query; the common ones:
* small dims (region 5 rows, nation 25, supplier) are broadcast
  explicitly — no shuffle of the fact side for those joins;
* fact-fact joins (orders⋈lineitem) shuffle on the join key, which is
  also their natural bucketing key at 100 TB (bucket both by orderkey);
* AQE (session default) handles skewed keys and runtime partition
  coalescing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_mapreduce_spark.sources.fixtures import load_table


def _dec(expr: str) -> str:
    """Exact-decimal cast of a per-row double expression (see module doc)."""
    return f"CAST(({expr}) AS DECIMAL(18,6))"


# --- TPC-H-shaped aggregations -----------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with 4 groups.

    Plan: parquet scan with pushed l_shipdate filter -> partial hash agg
    -> exchange on (returnflag, linestatus) -> final agg.  4 groups means
    the shuffle carries only partial-agg rows (constant bytes per map
    partition) — scales linearly in input, constant in shuffle.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= F.lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(f"CAST(SUM({_dec('l_quantity')}) AS DOUBLE)").alias("sum_qty"),
            F.expr(f"CAST(SUM({_dec('l_extendedprice')}) AS DOUBLE)").alias("sum_base_price"),
            F.expr(
                f"CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS DOUBLE)"
            ).alias("sum_disc_price"),
            F.expr(
                f"CAST(SUM({_dec('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}) AS DOUBLE)"
            ).alias("sum_charge"),
            F.expr(f"CAST(SUM({_dec('l_quantity')}) AS DOUBLE) / COUNT(*)").alias("avg_qty"),
            F.expr(f"CAST(SUM({_dec('l_extendedprice')}) AS DOUBLE) / COUNT(*)").alias("avg_price"),
            F.expr(f"CAST(SUM({_dec('l_discount')}) AS DOUBLE) / COUNT(*)").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({_dec('l_quantity')}) AS DOUBLE) AS sum_qty,
       CAST(SUM({_dec('l_extendedprice')}) AS DOUBLE) AS sum_base_price,
       CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({_dec('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}) AS DOUBLE) AS sum_charge,
       CAST(SUM({_dec('l_quantity')}) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM({_dec('l_extendedprice')}) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM({_dec('l_discount')}) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + top-10 by revenue.

    customer is filtered then joined to orders (both shuffle on custkey;
    at scale, customer is the smaller side and AQE picks broadcast when it
    fits), then orders⋈lineitem shuffles on orderkey.  The top-10 is a
    global sort of the aggregated (small) result, not of the fact table.
    """
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-03-15"))
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-03-15"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.expr(
                f"CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS DOUBLE)"
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a broadcast dim chain.

    region(5)⋈nation(25) are broadcast explicitly — the fact side never
    shuffles for them.  The c_nationkey = s_nationkey condition makes the
    customer⋈supplier correlation part of the join tree as in TPC-H.
    """
    r = F.broadcast(
        load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.expr(
                f"CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS DOUBLE)"
            ).alias("revenue")
        )
    )


Q5_SQL = f"""
SELECT n_name,
       CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate is
    parquet-pushable, the aggregate is a single global sum (partial
    map-side, one row shuffled per partition)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(
                f"CAST(SUM({_dec('l_extendedprice * l_discount')}) AS DOUBLE)"
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q6_SQL = f"""
SELECT CAST(SUM({_dec('l_extendedprice * l_discount')}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.
    nation broadcasts; customer⋈orders⋈lineitem shuffle on their keys."""
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.expr(
                f"CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS DOUBLE)"
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- join varieties ----------------------------------------------------

def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join: every customer with order count/total, zeros kept.
    At scale both sides shuffle on custkey; pre-aggregating orders before
    the join (done here) shrinks the join's right side to one row per
    customer — join-then-aggregate would shuffle the full orders table."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.expr(f"CAST(SUM({_dec('o_totalprice')}) AS DOUBLE)").alias("total_spend"),
        )
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
    )


JOIN_LEFT_SQL = f"""
SELECT c_custkey, c_name,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(total_spend, 0.0) AS total_spend
FROM customer
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM({_dec('o_totalprice')}) AS DOUBLE) AS total_spend
  FROM orders GROUP BY o_custkey
) o ON c_custkey = o_custkey
"""


def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers having any order > 400k.
    Semi-join ships only the join key of the right side — at 100 TB this
    is the cheapest existence test Spark has."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
"""


def join_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no urgent orders
    (the no-orders-at-all variant is empty on the fixtures — every
    customer has orders — so the predicate keeps the anti-join
    observable)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_nationkey"
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


# --- grouping sets ------------------------------------------------------

def agg_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — subtotal rows labelled 'ALL'
    (the fixture columns are never null, so COALESCE is unambiguous)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.expr(f"CAST(SUM({_dec('l_quantity')}) AS DOUBLE)").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


AGG_ROLLUP_SQL = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n,
       CAST(SUM({_dec('l_quantity')}) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.expr(f"CAST(SUM({_dec('o_totalprice')}) AS DOUBLE)").alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "sum_price",
        )
    )


AGG_CUBE_SQL = f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       COUNT(*) AS n,
       CAST(SUM({_dec('o_totalprice')}) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISTINCT aggregation per nation (Spark expands this into a
    two-phase aggregate; the approx_count_distinct variant for 100 TB is
    in textstats/approx notes — HLL sketches aren't oracle-comparable)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.count("*").alias("n_customers"),
    )


DISTINCT_SQL = """
SELECT c_nationkey,
       COUNT(DISTINCT c_mktsegment) AS n_segments,
       COUNT(*) AS n_customers
FROM customer
GROUP BY c_nationkey
"""


# --- windows (row-based) ------------------------------------------------

def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price: the scalable top-k pattern
    (partitioned window + row_number, never a global sort).  Determinism:
    ties broken by o_orderkey."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + rank per customer over order history.  Exact-decimal
    prefix sums keep every row's running value engine-identical."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.expr(
            f"CAST(SUM({_dec('o_totalprice')}) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW) AS DOUBLE)"
        ).alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


WINDOW_RUNNING_SQL = f"""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM({_dec('o_totalprice')}) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
"""


# --- set operations -----------------------------------------------------

def set_ops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION in one result: BUILDING-segment customers
    vs customers with any order > 300k, tagged by membership."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    spenders = (
        o.where(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    both = building.intersect(spenders).select(F.lit("both").alias("tag"), "custkey")
    b_only = building.subtract(spenders).select(
        F.lit("building_only").alias("tag"), "custkey"
    )
    s_only = spenders.subtract(building).select(
        F.lit("spender_only").alias("tag"), "custkey"
    )
    return both.unionAll(b_only).unionAll(s_only)


SET_OPS_SQL = """
WITH building AS (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
), spenders AS (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
)
SELECT 'both' AS tag, custkey FROM (SELECT custkey FROM building INTERSECT SELECT custkey FROM spenders)
UNION ALL
SELECT 'building_only', custkey FROM (SELECT custkey FROM building EXCEPT SELECT custkey FROM spenders)
UNION ALL
SELECT 'spender_only', custkey FROM (SELECT custkey FROM spenders EXCEPT SELECT custkey FROM building)
"""


# --- scalar function library -------------------------------------------

def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math scalar expressions — all JVM-side, codegen'd, no UDFs."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("#", "p_brand", F.col("p_size").cast("string")).alias("brand_size"),
        F.expr("regexp_extract(p_name, '^([a-z]+)', 1)").alias("first_word"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_bump"),
        F.when(F.col("p_size") >= 25, "large").otherwise("small").alias("size_class"),
    )


SCALAR_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       substr(p_type, 1, 5) AS type_prefix,
       LENGTH(p_name) AS name_len,
       p_brand || '#' || CAST(p_size AS VARCHAR) AS brand_size,
       regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
       ROUND(SQRT(p_retailprice), 6) AS price_sqrt,
       ROUND(p_retailprice * 1.1, 2) AS price_bump,
       CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class
FROM part
"""


def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar expressions over order dates."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
    )


DATE_SQL = """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(quarter FROM o_orderdate) AS qtr,
       EXTRACT(month FROM o_orderdate) AS mo,
       EXTRACT(day FROM o_orderdate) AS dom,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
FROM orders
"""


def json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON props field -> typed aggregation.
    get_json_object evaluates JVM-side; at scale prefer from_json with an
    explicit schema once the props shape is known (single parse, typed)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.expr("CAST(SUM(k) AS DOUBLE) / COUNT(*)").alias("avg_k"),
        )
    )


JSON_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


def json_events_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path json_events' docstring names, implemented:
    ``from_json`` with an explicit schema parses each props string ONCE
    into a typed struct (get_json_object re-parses per extracted path —
    at k paths that is k parses per row).  Distribution of k values per
    event type, not just the sum, to exercise the typed field further."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.from_json("props", "k BIGINT").alias("p"),
    ).select("event_type", F.col("p.k").alias("k"))
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.expr("CAST(SUM(k) AS BIGINT)").alias("sum_k"),
        F.expr("CAST(COUNT(DISTINCT k) AS BIGINT)").alias("n_distinct_k"),
    )


JSON_TYPED_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


# --- more TPC-H query shapes -------------------------------------------

def q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one late lineitem (EXISTS →
    left-semi join), counted per priority.  The semi-join ships only
    orderkeys of the filtered lineitem side."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    # the fixture lineitem has no commitdate column; "late" here is
    # shipped-after-the-window, preserving the EXISTS query shape
    late = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-06-01")
    )
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > TIMESTAMP '1997-06-01')
GROUP BY o_orderpriority
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio (promo revenue share).
    Both sums use the exact-decimal convention; the final ratio is double
    division of two deterministic values."""
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-02-01"))
    )
    rev = _dec("l_extendedprice * (1 - l_discount)")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.expr(
                f"ROUND(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {rev} ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)"
                f" / CAST(SUM({rev}) AS DOUBLE), 6)"
            ).alias("promo_share_pct"),
            F.count("*").alias("n_items"),
        )
    )


Q14_SQL = f"""
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_dec('l_extendedprice * (1 - l_discount)')} ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS DOUBLE), 6) AS promo_share_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-02-01'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped sum feeding an IN-subquery
    (customers' largest orders).  The aggregate-then-join order keeps the
    heavy side small before it touches customer."""
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.expr(f"CAST(SUM({_dec('l_quantity')}) AS DOUBLE)").alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
FROM (
  SELECT l_orderkey, CAST(SUM({_dec('l_quantity')}) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM({_dec('l_quantity')}) AS DOUBLE) > 150
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def correlated_min_price_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar subquery — parts priced at the
    minimum of their type.  Expressed through the SQL surface; Catalyst
    rewrites the correlated subquery into an aggregate + join."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_type, p_retailprice
        FROM part_v p
        WHERE p_retailprice = (SELECT MIN(p2.p_retailprice)
                               FROM part_v p2
                               WHERE p2.p_type = p.p_type)
        """
    )


CORRELATED_MIN_SQL = """
SELECT p_partkey, p_name, p_type, p_retailprice
FROM part p
WHERE p_retailprice = (SELECT MIN(p2.p_retailprice)
                       FROM part p2
                       WHERE p2.p_type = p.p_type)
"""


def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint gate over the warehouse tables — one row
    per declared constraint with the rows checked and the violations
    found (the Great-Expectations/Deequ-style audit a 100 TB pipeline
    runs before every publish; the reference engine has no notion of a
    schema to audit — its records are untyped "k v" lines,
    `mr/worker.go` — so this is pure extension surface).

    Constraint classes and their plan shapes:
    * single-table checks (range / sign / null / uniqueness) are ONE
      scan per table computing all of that table's conditional counts
      as algebraic aggregates, then `stack`-unpivoted — adding a
      constraint to a table adds a column to an existing pass, not a
      pass;
    * referential checks (FK orphans) are left-anti joins on the key —
      one shuffle each at scale (or a runtime bloom: see
      runtime_filtered_join for the manual form);
    * cross-table row predicates (lineitem ships after its order is
      placed) join fact-to-fact on the natural bucketing key.

    The audit's output is constant-size (|constraints| rows) regardless
    of input, so the gate itself is never the bottleneck."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")

    def _viol(cond: F.Column) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    li = l.agg(
        F.count("*").alias("n"),
        _viol(~F.col("l_quantity").between(1.0, 50.0)).alias("v_qty"),
        _viol(~F.col("l_discount").between(0.0, 0.10)).alias("v_disc"),
    ).select(
        F.expr(
            "stack(2, 'lineitem_quantity_1_50', n, v_qty, "
            "'lineitem_discount_0_to_0_10', n, v_disc) "
            "AS (constraint, n_checked, n_violations)"
        )
    )
    od = o.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("o_orderkey")).cast("bigint").alias("v_dup"),
        _viol(F.col("o_totalprice") <= 0.0).alias("v_price"),
    ).select(
        F.expr(
            "stack(2, 'orders_pk_unique', n, v_dup, "
            "'orders_totalprice_positive', n, v_price) "
            "AS (constraint, n_checked, n_violations)"
        )
    )
    cu = c.agg(
        F.count("*").alias("n"),
        _viol(F.col("c_acctbal") < 0.0).alias("v_bal"),
    ).select(
        F.expr(
            "stack(1, 'customer_acctbal_nonneg', n, v_bal) "
            "AS (constraint, n_checked, n_violations)"
        )
    )
    fk_o = (
        o.join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"), "left_anti")
        .agg(F.count("*").cast("bigint").alias("orphans"))
        .crossJoin(o.agg(F.count("*").alias("n")))
        .select(
            F.lit("orders_fk_customer").alias("constraint"),
            F.col("n").alias("n_checked"),
            F.col("orphans").alias("n_violations"),
        )
    )
    fk_l = (
        l.join(o.select("o_orderkey"), l.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count("*").cast("bigint").alias("orphans"))
        .crossJoin(l.agg(F.count("*").alias("n")))
        .select(
            F.lit("lineitem_fk_orders").alias("constraint"),
            F.col("n").alias("n_checked"),
            F.col("orphans").alias("n_violations"),
        )
    )
    ship = (
        l.select("l_orderkey", "l_shipdate")
        .join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == o.o_orderkey)
        .agg(
            F.count("*").alias("n"),
            _viol(F.col("l_shipdate") < F.col("o_orderdate")).alias("v"),
        )
        .select(
            F.lit("lineitem_ships_after_order").alias("constraint"),
            F.col("n").alias("n_checked"),
            F.col("v").alias("n_violations"),
        )
    )
    out = li.unionByName(od).unionByName(cu).unionByName(fk_o).unionByName(fk_l).unionByName(ship)
    return out.select(
        "constraint",
        F.col("n_checked").cast("bigint").alias("n_checked"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
    )


DQ_AUDIT_SQL = """
SELECT 'lineitem_quantity_1_50' AS constraint, COUNT(*) AS n_checked,
       CAST(SUM(CASE WHEN l_quantity NOT BETWEEN 1.0 AND 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_0_to_0_10', COUNT(*),
       CAST(SUM(CASE WHEN l_discount NOT BETWEEN 0.0 AND 0.10 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders_pk_unique', COUNT(*), COUNT(*) - COUNT(DISTINCT o_orderkey)
FROM orders
UNION ALL
SELECT 'orders_totalprice_positive', COUNT(*),
       CAST(SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'customer_acctbal_nonneg', COUNT(*),
       CAST(SUM(CASE WHEN c_acctbal < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
FROM customer
UNION ALL
SELECT 'orders_fk_customer', (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'lineitem_fk_orders', (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem_ships_after_order', COUNT(*),
       CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


# --- fuzzy key join (round 9, batch 6) -------------------------------------

FUZZY_KEY_LIM = 400  # customer-id cutoff keeping the demo pair set compact


def fuzzy_key_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate string-key self-join (record linkage): customer-name
    pairs within Levenshtein distance 1, found by FastSS-style
    deletion-variant BLOCKING (Bocek et al. 2007) — never an all-pairs
    distance matrix.  Two same-length names within distance 1 differ by
    one substitution, so deleting that position from both yields the
    same string: block on (position, 1-deletion variant).  Insert/
    delete matches surface by joining a variant directly against full
    names.  Every candidate is then VERIFIED with the engine's exact
    levenshtein — blocking buys recall cheaply, verification keeps
    precision exact.

    Scale shape: variants explode each key into |key| rows (bounded by
    key length — metadata scale, not corpus scale), the blocking joins
    are equi-joins on (pos, variant) / (variant = name), and verify
    touches candidates only.  This is the dedup-by-typo shape for
    entity keys (user handles, SKUs, file paths) where MinHash shingles
    are too coarse; at 100 TB the variant relation is ~|keys| x len
    rows, partial-shuffled on the variant hash — linear, and the
    blocking guarantees recall 1.0 at distance 1 by construction."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") < FUZZY_KEY_LIM
    )
    names = c.select("c_custkey", "c_name")
    variants = names.select(
        "c_custkey",
        "c_name",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(c_name)), i -> "
                "concat(substring(c_name, 1, i - 1), "
                "substring(c_name, i + 1, length(c_name))))"
            )
        ).alias("pos", "var"),
    )
    va = variants.select(
        F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"),
        "pos", "var",
    )
    vb = variants.select(
        F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"),
        "pos", "var",
    )
    cand_sub = (
        va.join(vb, ["pos", "var"])
        .where(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "name_a", "name_b")
    )
    nb = names.select(
        F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b")
    )
    cand_indel = (
        variants.join(nb, variants.var == F.col("name_b"))
        .select(
            F.least(F.col("c_custkey"), F.col("key_b")).alias("key_a"),
            F.greatest(F.col("c_custkey"), F.col("key_b")).alias("key_b2"),
            F.when(F.col("c_custkey") < F.col("key_b"), F.col("c_name"))
            .otherwise(F.col("name_b")).alias("name_a"),
            F.when(F.col("c_custkey") < F.col("key_b"), F.col("name_b"))
            .otherwise(F.col("c_name")).alias("name_b2"),
        )
        .where(F.col("key_a") != F.col("key_b2"))
        .select(
            "key_a", F.col("key_b2").alias("key_b"),
            "name_a", F.col("name_b2").alias("name_b"),
        )
    )
    return (
        cand_sub.unionAll(cand_indel)
        .distinct()
        .where(F.levenshtein("name_a", "name_b") <= 1)
        .select(
            F.col("key_a").cast("bigint").alias("custkey_a"),
            F.col("key_b").cast("bigint").alias("custkey_b"),
            F.levenshtein("name_a", "name_b").cast("int").alias("distance"),
        )
    )


FUZZY_KEY_JOIN_SQL = f"""
WITH names AS (
  SELECT c_custkey, c_name FROM customer WHERE c_custkey < {FUZZY_KEY_LIM}
),
variants AS (
  SELECT c_custkey, c_name, g.i AS pos,
         substr(c_name, 1, g.i - 1) || substr(c_name, g.i + 1) AS var
  FROM names, UNNEST(generate_series(1, len(c_name))) AS g(i)
),
cand_sub AS (
  SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
         a.c_name AS name_a, b.c_name AS name_b
  FROM variants a
  JOIN variants b ON a.pos = b.pos AND a.var = b.var
                 AND a.c_custkey < b.c_custkey
),
cand_indel AS (
  SELECT LEAST(v.c_custkey, n.c_custkey) AS key_a,
         GREATEST(v.c_custkey, n.c_custkey) AS key_b,
         CASE WHEN v.c_custkey < n.c_custkey THEN v.c_name ELSE n.c_name END
           AS name_a,
         CASE WHEN v.c_custkey < n.c_custkey THEN n.c_name ELSE v.c_name END
           AS name_b
  FROM variants v
  JOIN names n ON v.var = n.c_name AND v.c_custkey <> n.c_custkey
),
cand AS (
  SELECT DISTINCT key_a, key_b, name_a, name_b FROM (
    SELECT * FROM cand_sub UNION ALL SELECT * FROM cand_indel
  )
)
SELECT CAST(key_a AS BIGINT) AS custkey_a,
       CAST(key_b AS BIGINT) AS custkey_b,
       CAST(levenshtein(name_a, name_b) AS INT) AS distance
FROM cand
WHERE levenshtein(name_a, name_b) <= 1
"""



# --- Benford leading-digit audit (round 10) ---------------------------------

#: log10(1 + 1/d) for d in 1..9 — the Benford first-digit law, computed
#: once in Python and embedded as shared double literals in both plans
#: (the cross-engine shared-constant convention).
import math as _math

_BENFORD_P = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}
#: 9-dp feed / 6-dp display forms, computed once in Python and embedded as
#: identical literals in both engines (shared-constant convention) — the
#: r11 ulp-immunity fix: every engine-side operation downstream of these
#: literals is an IEEE basic op (+ − × ÷, all correctly rounded by the
#: standard) or exact DECIMAL arithmetic; no POW, no raw-double ROUND of a
#: transcendental (ADVICE r10 / the one hash-mismatch in CORRECTNESS_r10).
_BENFORD_P9 = {d: round(p, 9) for d, p in _BENFORD_P.items()}
_BENFORD_P6 = {d: round(p, 6) for d, p in _BENFORD_P.items()}


def _benford_case(engine_digit: str, table: dict) -> str:
    whens = " ".join(f"WHEN {d} THEN {p!r}" for d, p in sorted(table.items()))
    return f"CAST(CASE {engine_digit} {whens} END AS DOUBLE)"


def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance audit over the two monetary fact
    columns (orders.o_totalprice, lineitem.l_extendedprice): observed
    leading-digit shares against log10(1+1/d), with per-digit and total
    chi-square — the forensic screen for synthetic, capped, or
    manually-entered amounts (organic multiplicative data follows
    Benford; a generator that draws uniform prices fails it loudly,
    which is itself a useful fixture fact).

    Determinism: the leading digit comes from the integer CENTS string
    (FLOOR(x*100) is exact IEEE in both engines; BIGINT-to-string is
    engine-identical) — never from double formatting.  The expected
    share p is a 9-dp Python-rounded literal shared by both engines;
    every downstream step is an IEEE basic op (no POW — the square is
    an explicit multiply) rounded to 9 dp, cast to DECIMAL(28,9), and
    only then rounded to 6 dp in exact decimal space, so a driver-side
    POW/ROUND ulp difference between DuckDB versions cannot flip a
    6-dp boundary (the CORRECTNESS_r10 hash-mismatch fix).

    Scale shape: two fact scans pruned to one column each, one
    partial-agg'd groupBy(col, digit) whose output is <= 18 rows;
    everything after the count is arithmetic on that tiny relation."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").select(
        F.lit("o_totalprice").alias("col_name"),
        F.col("o_totalprice").alias("x"),
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        F.lit("l_extendedprice").alias("col_name"),
        F.col("l_extendedprice").alias("x"),
    )
    digit = F.substring(
        F.floor(F.col("x") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = (
        o.unionAll(l)
        .where(F.col("x") > 0)
        .select("col_name", digit.alias("digit"))
        .groupBy("col_name", "digit")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("col_name")
    p9 = F.expr(_benford_case("digit", _BENFORD_P9))
    tot = F.sum("n").over(w)
    exp9 = F.round(tot * p9, 9)
    diff = F.col("n") - exp9
    term9 = F.round(diff * diff / exp9, 9).cast("decimal(28,9)")
    share9 = F.round(F.col("n") / tot, 9).cast("decimal(28,9)")
    with_terms = counts.select(
        "col_name",
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(share9, 6).cast("double").alias("share"),
        F.expr(_benford_case("digit", _BENFORD_P6)).alias("expected_share"),
        F.round(term9, 6).cast("double").alias("chi2_term"),
        term9.alias("_t9"),
    )
    return with_terms.select(
        "col_name",
        "digit",
        "n",
        "share",
        "expected_share",
        "chi2_term",
        F.expr(
            "CAST(ROUND(SUM(_t9) OVER (PARTITION BY col_name), 6)"
            " AS DOUBLE)"
        ).alias("chi2_total"),
    )


BENFORD_SQL = f"""
WITH vals AS (
  SELECT 'o_totalprice' AS col_name, o_totalprice AS x FROM orders
  UNION ALL
  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
),
counts AS (
  SELECT col_name,
         CAST(substr(CAST(CAST(FLOOR(x * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS digit,
         COUNT(*) AS n
  FROM vals WHERE x > 0
  GROUP BY 1, 2
),
terms AS (
  SELECT col_name, digit, n,
         CAST(SUM(n) OVER (PARTITION BY col_name) AS DOUBLE) AS tot,
         {_benford_case("digit", _BENFORD_P9)} AS p9
  FROM counts
),
feeds AS (
  SELECT col_name, digit, n,
         CAST(ROUND(CAST(n AS DOUBLE) / tot, 9) AS DECIMAL(28,9)) AS share9,
         ROUND(tot * p9, 9) AS exp9
  FROM terms
),
t9 AS (
  SELECT col_name, digit, n, share9,
         CAST(ROUND((n - exp9) * (n - exp9) / exp9, 9) AS DECIMAL(28,9))
           AS term9
  FROM feeds
)
SELECT col_name, digit,
       CAST(n AS BIGINT) AS n,
       CAST(ROUND(share9, 6) AS DOUBLE) AS share,
       {_benford_case("digit", _BENFORD_P6)} AS expected_share,
       CAST(ROUND(term9, 6) AS DOUBLE) AS chi2_term,
       CAST(ROUND(SUM(term9) OVER (PARTITION BY col_name), 6) AS DOUBLE)
         AS chi2_total
FROM t9
"""


QUERIES = {
    "fuzzy_key_join_customers": fuzzy_key_join_customers,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_revenue_forecast": q6_revenue_forecast,
    "q10_returned_items": q10_returned_items,
    "q4_priority_count": q4_priority_count,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "correlated_min_price_parts": correlated_min_price_parts,
    "join_left_order_counts": join_left_order_counts,
    "join_semi_big_spenders": join_semi_big_spenders,
    "join_anti_inactive_customers": join_anti_inactive_customers,
    "agg_rollup_returns": agg_rollup_returns,
    "agg_cube_orders": agg_cube_orders,
    "distinct_stats": distinct_stats,
    "topk_orders_per_customer": topk_orders_per_customer,
    "window_running_spend": window_running_spend,
    "set_ops_segments": set_ops_segments,
    "scalar_funcs": scalar_funcs,
    "date_funcs": date_funcs,
    "json_events": json_events,
    "json_events_typed": json_events_typed,
    "dq_constraint_audit": dq_constraint_audit,
    "benford_price_audit": benford_price_audit,
}

ORACLES = {
    "fuzzy_key_join_customers": FUZZY_KEY_JOIN_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "q6_revenue_forecast": Q6_SQL,
    "q10_returned_items": Q10_SQL,
    "q4_priority_count": Q4_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q18_large_orders": Q18_SQL,
    "correlated_min_price_parts": CORRELATED_MIN_SQL,
    "join_left_order_counts": JOIN_LEFT_SQL,
    "join_semi_big_spenders": JOIN_SEMI_SQL,
    "join_anti_inactive_customers": JOIN_ANTI_SQL,
    "agg_rollup_returns": AGG_ROLLUP_SQL,
    "agg_cube_orders": AGG_CUBE_SQL,
    "distinct_stats": DISTINCT_SQL,
    "topk_orders_per_customer": TOPK_SQL,
    "window_running_spend": WINDOW_RUNNING_SQL,
    "set_ops_segments": SET_OPS_SQL,
    "scalar_funcs": SCALAR_SQL,
    "date_funcs": DATE_SQL,
    "json_events": JSON_SQL,
    "json_events_typed": JSON_TYPED_SQL,
    "dq_constraint_audit": DQ_AUDIT_SQL,
    "benford_price_audit": BENFORD_SQL,
}
