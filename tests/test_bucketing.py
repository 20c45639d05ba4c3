"""Bucketed co-located join: writing both join sides bucketed on the key
eliminates the join-time shuffle entirely — the 100 TB layout strategy
SCALE.md prescribes for the orders⋈lineitem family, proven here on the
actual plan."""

from __future__ import annotations

import re

from golang_mapreduce_spark.plans.checks import formatted_plan
from golang_mapreduce_spark.sources.fixtures import load_table


def count_nodes(plan: str, op: str) -> int:
    return len(set(re.findall(rf"\((\d+)\) {op}\b", plan)))


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        load_table(spark, sf_dir, "orders").write.bucketBy(
            8, "o_orderkey"
        ).sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_bkt")
        load_table(spark, sf_dir, "lineitem").write.bucketBy(
            8, "l_orderkey"
        ).sortBy("l_orderkey").mode("overwrite").saveAsTable("lineitem_bkt")

        lb = spark.table("lineitem_bkt")
        ob = spark.table("orders_bkt")
        plan = formatted_plan(lb.join(ob, lb.l_orderkey == ob.o_orderkey))
        assert count_nodes(plan, "Exchange") == 0, plan

        # and an unbucketed equivalent does shuffle (both sides)
        lp = load_table(spark, sf_dir, "lineitem")
        op = load_table(spark, sf_dir, "orders")
        plain = lp.join(op, lp.l_orderkey == op.o_orderkey)
        assert count_nodes(formatted_plan(plain), "Exchange") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
