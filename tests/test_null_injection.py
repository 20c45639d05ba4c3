"""Null-robustness parity for the join / rollup / cube / pivot family.

The generated fixtures are null-free, so the COALESCE and null-key paths
of these operators were only half-exercised (VERDICT r1 #8): a data NULL
in a rollup key must coalesce exactly like a subtotal NULL, a NULL join
key must match nothing on both engines, and SUM/COUNT DISTINCT must skip
NULLs identically.  This suite injects deterministic NULLs into sf0.001
copies and re-runs the full Spark-vs-DuckDB comparison.

Columns used in window ORDER BY are deliberately left null-free: Spark
(ASC=NULLS FIRST) and DuckDB (ASC=NULLS LAST) disagree on default null
ordering, which is an ordering-semantics choice, not an operator bug.
"""

from __future__ import annotations

import os
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from golang_mapreduce_spark.operators import advanced, relational, tpch_extra, windows
from golang_mapreduce_spark.sources.fixtures import TABLES, load_table
from tests.oracle import compare

#: (table, column, null-every-Nth-row) — deterministic injection
NULL_PLAN = {
    ("customer", "c_mktsegment", 7),
    ("orders", "o_orderpriority", 5),
    ("orders", "o_custkey", 11),
    ("orders", "o_totalprice", 9),
    ("lineitem", "l_returnflag", 7),
    ("lineitem", "l_linestatus", 13),
    ("lineitem", "l_quantity", 17),
    ("lineitem", "l_extendedprice", 19),
    # event *values* only: ts stays null-free (a null event-time is a
    # source-contract violation both engines would have to invent
    # semantics for), and temporal.asof_purchase_click is deliberately
    # NOT in FAMILY — Spark's last(ignorenulls=True) skips a null click
    # value while DuckDB's ASOF JOIN carries it, a real semantic fork
    # pinned here as documentation rather than papered over.
    ("events", "value", 5),
}

FAMILY = [
    "join_left_order_counts",
    "join_semi_big_spenders",
    "join_anti_inactive_customers",
    "agg_rollup_returns",
    "agg_cube_orders",
    "distinct_stats",
    "pivot_segment_revenue",
    "grouping_sets_orders",
    # tpch_extra shapes over nulled group keys / join keys / CASE inputs
    "q12_late_shipments",
    "q13_customer_distribution",
    "q22_dormant_rich_customers",
    # MIN over a nulled measure + NULL==NULL filter semantics in the
    # correlated-minimum rewrite (both engines drop all-null groups)
    "q2_min_cost_supplier",
    # event-time window family over nulled aggregation values (SUM/AVG
    # must skip NULLs identically; window membership is ts-driven and
    # unaffected)
    "tumbling_hourly",
    "sliding_10m_5m",
    "session_windows_30m",
]


@pytest.fixture(scope="module")
def null_dir():
    src = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    d = tempfile.mkdtemp(prefix="gmrs_nulls_")
    plan: dict[str, list[tuple[str, int]]] = {}
    for t, c, step in NULL_PLAN:
        plan.setdefault(t, []).append((c, step))
    for t in TABLES:
        table = pq.read_table(f"{src}/{t}.parquet")
        for col, step in plan.get(t, []):
            i = table.schema.get_field_index(col)
            mask = pa.array([j % step == 0 for j in range(len(table))])
            nulled = pc.if_else(mask, pa.nulls(len(table), table.column(i).type), table.column(i))
            table = table.set_column(i, table.schema.field(i), nulled)
        pq.write_table(table, f"{d}/{t}.parquet")
    return d


@pytest.fixture(scope="module")
def null_duck(null_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{null_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", FAMILY)
def test_null_injected_parity(name, spark, null_dir, null_duck):
    queries = {
        **relational.QUERIES,
        **advanced.QUERIES,
        **tpch_extra.QUERIES,
        **windows.QUERIES,
    }
    oracles = {
        **relational.ORACLES,
        **advanced.ORACLES,
        **tpch_extra.ORACLES,
        **windows.ORACLES,
    }
    df = queries[name](spark, null_dir)
    compare(df, null_duck, oracles[name], name=f"nulls:{name}")


def test_window_order_by_nullable_column_pinned(spark, null_dir, null_duck):
    """Spark's ASC default is NULLS FIRST, DuckDB's is NULLS LAST — a
    window ORDER BY over a nullable column silently diverges unless the
    null position is pinned.  Pin it explicitly on BOTH engines
    (asc_nulls_last / NULLS LAST + full tie-break) and require exact
    rank parity over the nulled o_totalprice column."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    o = load_table(spark, null_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc_nulls_last(), F.col("o_orderkey").asc()
    )
    df = o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rk"),
    )
    sql = """
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice ASC NULLS LAST,
                                       o_orderkey ASC) AS rk
    FROM orders
    """
    compare(df, null_duck, sql, name="nulls:window_order_pinned")


def test_nulls_actually_injected(null_dir):
    t = pq.read_table(f"{null_dir}/orders.parquet")
    assert t.column("o_custkey").null_count > 0
    assert t.column("o_orderpriority").null_count > 0
