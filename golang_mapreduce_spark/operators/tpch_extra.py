"""The remaining TPC-H query shapes (Q2, Q7–Q9, Q11–Q13, Q15–Q17,
Q19–Q22) over the reduced fixture schema.

The fixtures carry no ``partsupp`` table and no ship-mode / commit-date /
phone columns, so shapes that need them are re-anchored on what exists —
``lineitem`` doubles as the part↔supplier bridge (distinct
(l_partkey, l_suppkey)) where TPC-H uses partsupp, and "late" is
l_shipdate > o_orderdate + N days where TPC-H compares commit/receipt
dates.  What is preserved is the *plan shape* each query exists to
exercise: correlated scalar subqueries, HAVING over a global scalar,
two-sided nation joins, disjunctive pushdown, multi-EXISTS self-joins.
(The reference computes none of these; this is the SURVEY §2.4
expressible-surface widening, same contract as operators/relational.py.)

Scale notes per query live in the docstrings; the common rules:
dims (region/nation/part/supplier at TPC-H proportions) broadcast; facts
shuffle at most once per aggregation level; scalar subqueries become
1-row broadcast cross joins, never driver collects; decimal-exact sums
(CAST ... DECIMAL(18,6)) keep every aggregate bit-identical to the
DuckDB oracle regardless of partitioning or fold order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_mapreduce_spark.caching import with_shared_caches
from golang_mapreduce_spark.operators.relational import _dec
from golang_mapreduce_spark.sources.fixtures import load_table

_REV = "l_extendedprice * (1 - l_discount)"


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.
    Both nation joins are broadcast; the OR of the two direction pairs is
    evaluated on the broadcast side, so lineitem shuffles only for the
    final 3-key aggregation."""
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        )
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(n1, s.s_nationkey == n1.s_nk)
        .join(n2, c.c_nationkey == n2.c_nk)
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.expr(f"CAST(SUM({_dec(_REV)}) AS DOUBLE)").alias("revenue"))
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM({_dec(_REV)}) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year, l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of ECONOMY-part order volume inside
    ASIA, by year.  The share is a conditional-sum ratio inside one
    aggregate — no second pass, no self-join; decimal sums make the
    ratio's numerator/denominator exact before the single final divide."""
    r = F.broadcast(
        load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    n_c = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
        )
    )
    n_s = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    )
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n_c, c.c_nationkey == F.col("c_nk"))
        .join(r, F.col("c_rk") == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(n_s, s.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # both operands cast to double BEFORE dividing: decimal/decimal
            # scale-widening rules differ between engines, double÷double
            # of identical inputs does not
            F.expr(
                f"CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN {_dec(_REV)} "
                f"ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)"
                f" / CAST(SUM({_dec(_REV)}) AS DOUBLE)"
            ).alias("mkt_share")
        )
    )


Q8_SQL = f"""
SELECT year(o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_2' THEN {_dec(_REV)}
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
         / CAST(SUM({_dec(_REV)}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA'
  AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY year(o_orderdate)
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × year for parts whose
    name contains 'widget'.  The fixture has no partsupp/supplycost, so
    amount = revenue (shape preserved: dim-filtered fact, two broadcast
    dims, 2-key agg)."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(F.col("p_name").contains("widget"))
    )
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.expr(f"CAST(SUM({_dec(_REV)}) AS DOUBLE)").alias("sum_profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(SUM({_dec(_REV)}) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value from NATION_3 suppliers
    exceeds a fraction of the total (HAVING over a global scalar).  The
    scalar total is a 1-row broadcast cross join — the distributed form of
    a correlated HAVING; no driver collect."""
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        n, F.col("s_nationkey") == F.col("n_nationkey")
    )
    l = load_table(spark, sf_dir, "lineitem")
    value = l.join(s, l.l_suppkey == s.s_suppkey).groupBy("l_partkey").agg(
        F.expr(f"CAST(SUM({_dec('l_extendedprice')}) AS DOUBLE)").alias("value")
    )
    total = value.agg(
        F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").alias("total")
    )
    return (
        value.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("total") * 0.002)
        .select("l_partkey", "value")
    )


Q11_SQL = f"""
WITH value AS (
  SELECT l_partkey, CAST(SUM({_dec('l_extendedprice')}) AS DOUBLE) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey, value
FROM value
WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               FROM value) * 0.002
"""


def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: orders shipped late (> 90 days after order date;
    the fixture has no commit/receipt dates), counted by how many carried
    urgent priority.  The CASE-counted aggregate keeps it one pass."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.expr(
                "SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)"
            ).alias("urgent_count"),
            F.expr(
                "SUM(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END)"
            ).alias("other_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_count,
       CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS other_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_returnflag
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the distribution of customers by order count, zeros
    included (LEFT join → per-customer count → count-of-counts; two
    aggregation levels, the second one tiny)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum revenue in 1997H1.  The max is
    a 1-row broadcast joined back — equality on doubles is safe because
    both sides come from the identical decimal sum."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-07-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = l.groupBy("l_suppkey").agg(
        F.expr(f"CAST(SUM({_dec(_REV)}) AS DOUBLE)").alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, CAST(SUM({_dec(_REV)}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-07-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) for
    shipped parts — lineitem is the part↔supplier bridge (the fixture has
    no partsupp) — excluding one brand and negative-balance suppliers
    (the complaints stand-in)."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(
            (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17)
        )
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    bridge = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        bridge.join(p, F.col("l_partkey") == p.p_partkey)
        .join(bad, F.col("l_suppkey") == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders
    for one brand's small parts were dropped.  The correlated per-part
    AVG subquery becomes a broadcast of the per-part averages (tiny: one
    row per filtered part) joined back to lineitem — one fact scan."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(
            (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 10)
        )
    )
    l = load_table(spark, sf_dir, "lineitem")
    lp = l.join(p, l.l_partkey == p.p_partkey)
    avg_qty = F.broadcast(
        lp.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
            F.expr(
                f"CAST(SUM({_dec('l_quantity')}) AS DOUBLE) / COUNT(l_quantity)"
            ).alias("avg_qty")
        )
    )
    return (
        lp.join(avg_qty, lp.l_partkey == F.col("a_partkey"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.expr(
                f"CAST(SUM({_dec('l_extendedprice')}) / 7.0 AS DOUBLE)"
            ).alias("avg_yearly")
        )
    )


Q17_SQL = f"""
SELECT CAST(SUM({_dec('l_extendedprice')}) / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3' AND p_size <= 10
  AND l_quantity < 0.5 * (
    SELECT CAST(SUM({_dec('l_quantity')}) AS DOUBLE) / COUNT(l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
      AND l2.l_partkey IN (SELECT p_partkey FROM part
                           WHERE p_brand = 'Brand#3' AND p_size <= 10)
  )
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under three disjunctive brand/size/quantity
    clauses.  The OR-of-ANDs predicate is a single join condition; Spark
    pushes the shared l_quantity bounds to the scan and evaluates the
    rest on the broadcast part dim."""
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    l = load_table(spark, sf_dir, "lineitem")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 5))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .where(clause)
        .agg(F.expr(f"CAST(SUM({_dec(_REV)}) AS DOUBLE)").alias("revenue"))
    )


Q19_SQL = f"""
SELECT CAST(SUM({_dec(_REV)}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who shipped a significant
    volume (> 100 units in 1997) of PROMO-type parts — semi join against
    an aggregated bridge (fixture stand-in for the partsupp availqty
    subquery)."""
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_4")
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    heavy = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.expr(f"CAST(SUM({_dec('l_quantity')}) AS DOUBLE)").alias("qty"))
        .where(F.col("qty") > 100.0)
    )
    s = load_table(spark, sf_dir, "supplier").join(
        n, F.col("s_nationkey") == F.col("n_nationkey")
    )
    return s.join(
        heavy, s.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


Q20_SQL = f"""
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_4'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey
    HAVING CAST(SUM({_dec('l_quantity')}) AS DOUBLE) > 100.0
  )
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier finished order (late = shipped > 60 days after order
    date; fixture has no commit/receipt dates).  EXISTS → left-semi on
    (orderkey, other-supplier), NOT EXISTS → left-anti on (orderkey,
    other-late-supplier); both semi/anti sides ship keys only."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = l.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    ).distinct()
    late_others = late.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    ).distinct()
    waiting = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


Q21_SQL = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per nation, customers with above-average positive
    balance and no RECENT orders (none since 1999 — every fixture
    customer has some order, so "no orders at all" would be vacuously
    empty; TPC-H's own predicate is also a recency window).  Global
    scalar AVG broadcast + anti join; the fixture has no phone country
    codes, so nations group the output."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.expr(
            f"CAST(SUM({_dec('c_acctbal')}) AS DOUBLE) / COUNT(c_acctbal)"
        ).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.expr(f"CAST(SUM({_dec('c_acctbal')}) AS DOUBLE)").alias("totacctbal"),
        )
    )


Q22_SQL = f"""
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM({_dec('c_acctbal')}) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM({_dec('c_acctbal')}) AS DOUBLE) / COUNT(c_acctbal)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: minimum-cost supplier per size-15 part, EUROPE only.

    No ``partsupp`` in the fixtures, so the part↔supplier bridge is the
    distinct (l_partkey, l_suppkey) pairs observed in lineitem, and
    "supply cost" is the minimum extended price the supplier ever shipped
    the part at (MIN is fold-order invariant — no decimal dance needed).
    Q2's correlated minimum over region suppliers becomes a window MIN
    over l_partkey after the region filter; every dim (supplier, nation,
    region, filtered part) broadcasts, so the only shuffles are the
    bridge aggregation and the per-part window — both keyed on partkey,
    both fine at 100 TB because the bridge is |part|×|supp-per-part|,
    orders of magnitude below lineitem."""
    bridge = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(F.col("p_size") == 15)
    )
    w = Window.partitionBy("l_partkey")
    return (
        bridge.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("min_cost", F.min("supply_cost").over(w))
        .where(F.col("supply_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


Q2_SQL = """
WITH bridge AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT l_partkey, supply_cost, s_name, s_acctbal, n_name
  FROM bridge
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
FROM eu JOIN part ON l_partkey = p_partkey
WHERE p_size = 15
  AND supply_cost = (SELECT MIN(e2.supply_cost) FROM eu e2
                     WHERE e2.l_partkey = eu.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --- market-basket association rules over order baskets (round 10) ---------

BASKET_MIN_ORDERS = 5


def brand_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules at the brand level: for every
    pair of part brands co-purchased in the same order, the classic
    support / confidence / lift triple — lift > 1 marks genuinely
    associated brands, the table behind "frequently bought together"
    and assortment planning.  Pairs under {BASKET_MIN_ORDERS} shared
    orders are pruned before scoring (the standard min-support cut).

    Scale shape: the basket relation is DISTINCT (order, brand) — the
    brand vocabulary is a curated ~25-value dimension attribute, so
    per-order fanout in the self-join is bounded by |brands|²/2
    regardless of order width, the item_cooccurrence cap argument with
    the cap supplied by the dimension itself.  The part join shuffles
    on partkey once (broadcastable when the part dim fits); pair and
    per-brand counts partial-aggregate; the N divisor is a 1-row
    broadcast.

    The basket relation feeds FOUR consumers (the total, the per-brand
    counts, and both sides of the pair self-join): before round 15 each
    re-derived the lineitem⋈part distinct — the full-registry plan audit
    measured 10 scans and 3 SortMergeJoins (VERDICT r14 #2b) — so it is
    persisted once (two narrow columns), and the per-brand count joins
    broadcast their |brands|-row sides, leaving the okey self-join as
    the only exchange that scales with data (``_gmrs_shared_caches``
    lifecycle)."""
    from pyspark.storagelevel import StorageLevel

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    baskets = li.join(part, "l_partkey").select(
        F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
    ).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    total = baskets.agg(
        F.countDistinct("okey").alias("n_orders")
    )
    per_brand = baskets.groupBy("brand").agg(F.count("*").alias("n_brand"))
    a = baskets.select("okey", F.col("brand").alias("brand_a"))
    b = baskets.select("okey", F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "okey")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_both"))
        .where(F.col("n_both") >= BASKET_MIN_ORDERS)
    )
    na = per_brand.select(
        F.col("brand").alias("brand_a"), F.col("n_brand").alias("n_a")
    )
    nb = per_brand.select(
        F.col("brand").alias("brand_b"), F.col("n_brand").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(total))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_both").cast("bigint").alias("n_orders_both"),
            F.col("n_a").cast("bigint").alias("n_orders_a"),
            F.col("n_b").cast("bigint").alias("n_orders_b"),
            F.round(F.col("n_both") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_both") / F.col("n_a"), 6).alias("confidence_a_to_b"),
            # both products go through DOUBLE (mirrored in the oracle):
            # a BIGINT n_orders*n_both or n_a*n_b silently overflows at
            # extreme scale and IEEE multiply is deterministic anyway
            # (ADVICE r10).
            F.round(
                F.col("n_orders").cast("double") * F.col("n_both")
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
    return with_shared_caches(out, baskets)


BRAND_BASKET_SQL = f"""
WITH baskets AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
n AS (
  SELECT COUNT(DISTINCT okey) AS n_orders FROM baskets
),
per_brand AS (
  SELECT brand, COUNT(*) AS n_brand FROM baskets GROUP BY brand
),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_both
  FROM baskets a JOIN baskets b
    ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY a.brand, b.brand
  HAVING COUNT(*) >= {BASKET_MIN_ORDERS}
)
SELECT brand_a, brand_b,
       CAST(n_both AS BIGINT) AS n_orders_both,
       CAST(na.n_brand AS BIGINT) AS n_orders_a,
       CAST(nb.n_brand AS BIGINT) AS n_orders_b,
       ROUND(CAST(n_both AS DOUBLE) / n_orders, 6) AS support,
       ROUND(CAST(n_both AS DOUBLE) / na.n_brand, 6) AS confidence_a_to_b,
       ROUND(CAST(n_orders AS DOUBLE) * n_both
             / (CAST(na.n_brand AS DOUBLE) * nb.n_brand), 6)
         AS lift
FROM pairs
JOIN per_brand na ON na.brand = pairs.brand_a
JOIN per_brand nb ON nb.brand = pairs.brand_b
CROSS JOIN n
"""


# --- Supplier concentration (round 11) --------------------------------------


def supplier_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supply-concentration index per nation:
    each supplier's share of its nation's lineitem revenue, squared and
    summed — the antitrust-style concentration screen (HHI > 0.25 on
    the 0-1 scale marks a concentrated market; scaled by the customary
    10,000 in the output).  The procurement twin of
    join_skew_diagnostics: that one finds skewed JOIN keys, this
    prices how skewed the SUPPLY is.

    Scale shape: lineitem is first reduced to one decimal-exact revenue
    row per suppkey (partial-agg'd, the only big shuffle), then joined
    to the broadcast supplier dim and rolled up to <= 25 nation rows;
    shares are computed against a per-nation window over the
    supplier-count-bounded relation.  Exactness: revenue via the
    per-row DECIMAL(18,6) cast; each share² feed rounds to 9 dp and
    sums as DECIMAL before the 6-dp display round (the
    benford_price_audit ulp discipline)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per_supp = l.groupBy("l_suppkey").agg(
        F.expr(
            f"SUM({_dec('l_extendedprice * (1 - l_discount)')})"
        ).alias("rev")
    )
    dim = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", "n_name"
        )
    )
    joined = per_supp.join(dim, per_supp.l_suppkey == dim.s_suppkey)
    w = Window.partitionBy("n_name")
    share = F.col("rev").cast("double") / F.sum("rev").over(w).cast("double")
    sq9 = F.round(share * share, 9).cast("decimal(19,9)")
    return (
        joined.select("n_name", "rev", sq9.alias("sq9"))
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.round(F.sum("rev").cast("double"), 2).alias("nation_revenue"),
            F.expr(
                "CAST(ROUND(SUM(sq9) * 10000, 6) AS DOUBLE)"
            ).alias("hhi"),
        )
        .withColumnRenamed("n_name", "nation")
    )


SUPPLIER_HHI_SQL = """
WITH per_supp AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev
  FROM lineitem
  GROUP BY l_suppkey
),
joined AS (
  SELECT n_name, rev,
         CAST(rev AS DOUBLE)
           / CAST(SUM(rev) OVER (PARTITION BY n_name) AS DOUBLE) AS share
  FROM per_supp
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
)
SELECT n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS nation_revenue,
       CAST(ROUND(SUM(CAST(ROUND(share * share, 9) AS DECIMAL(19,9))) * 10000,
                  6) AS DOUBLE) AS hhi
FROM joined
GROUP BY n_name
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_late_shipments": q12_late_shipments,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_counts": q16_supplier_counts,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_dormant_rich_customers": q22_dormant_rich_customers,
    "q20_promo_suppliers": q20_promo_suppliers,
    "brand_basket_lift": brand_basket_lift,
    "supplier_hhi_by_nation": supplier_hhi_by_nation,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q12_late_shipments": Q12_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_supplier_counts": Q16_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q19_discounted_revenue": Q19_SQL,
    "q21_waiting_suppliers": Q21_SQL,
    "q22_dormant_rich_customers": Q22_SQL,
    "q20_promo_suppliers": Q20_SQL,
    "brand_basket_lift": BRAND_BASKET_SQL,
    "supplier_hhi_by_nation": SUPPLIER_HHI_SQL,
}
