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

from golang_mapreduce_spark.operators import advanced, relational, tpch_extra
from golang_mapreduce_spark.sources.fixtures import TABLES
from tests.oracle import compare

#: (table, column, null-every-Nth-row) — deterministic injection
NULL_PLAN = {
    ("customer", "c_mktsegment", 7),
    ("orders", "o_orderpriority", 5),
    ("orders", "o_custkey", 11),
    ("lineitem", "l_returnflag", 7),
    ("lineitem", "l_linestatus", 13),
    ("lineitem", "l_quantity", 17),
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
    queries = {**relational.QUERIES, **advanced.QUERIES, **tpch_extra.QUERIES}
    oracles = {**relational.ORACLES, **advanced.ORACLES, **tpch_extra.ORACLES}
    df = queries[name](spark, null_dir)
    compare(df, null_duck, oracles[name], name=f"nulls:{name}")


def test_nulls_actually_injected(null_dir):
    t = pq.read_table(f"{null_dir}/orders.parquet")
    assert t.column("o_custkey").null_count > 0
    assert t.column("o_orderpriority").null_count > 0
