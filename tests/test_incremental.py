"""Semantic invariants for the incremental-maintenance operators
(incremental.py) and the resample/gap-fill temporal operator.  Oracle
parity for all three is covered by tests/test_oracle_parity.py; these
pin the MERGE semantics and plan shapes the oracles alone would not
make obvious."""

from __future__ import annotations

from pyspark.sql import functions as F

from golang_mapreduce_spark.operators.incremental import (
    DEL_MOD,
    INS_KEY_OFFSET,
    INS_MOD,
    UPD_MOD,
    merge_upsert_orders,
    runtime_filtered_join,
)
from golang_mapreduce_spark.operators.temporal import resample_gapfill_hourly
from golang_mapreduce_spark.sources.fixtures import load_table


def test_merge_upsert_semantics(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    base_keys = {r[0] for r in orders.select("o_orderkey").collect()}
    merged = {r["o_orderkey"]: r for r in merge_upsert_orders(spark, sf_dir).collect()}
    base_price = {
        r[0]: (r[1], r[2])
        for r in orders.select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
    }

    n_del = sum(1 for k in base_keys if k % DEL_MOD == 0)
    n_ins = sum(1 for k in base_keys if k % INS_MOD == 0)
    assert len(merged) == len(base_keys) - n_del + n_ins

    for k in base_keys:
        if k % DEL_MOD == 0:
            # delete wins over any same-batch update (higher version)
            assert k not in merged
        elif k % UPD_MOD == 0:
            assert merged[k]["o_orderstatus"] == "P"
            assert merged[k]["o_totalprice"] == base_price[k][1] * 1.1
        else:
            assert merged[k]["o_orderstatus"] == base_price[k][0]
            assert merged[k]["o_totalprice"] == base_price[k][1]
        if k % INS_MOD == 0:
            ins = merged[k + INS_KEY_OFFSET]
            assert ins["o_orderstatus"] == "N"
            assert ins["o_totalprice"] == base_price[k][1]


def test_runtime_filtered_join_plan(spark, sf_dir):
    """The fact side must be pruned by a broadcast LeftSemi BEFORE the
    (pinned shuffle-merge) wide join."""
    plan = (
        runtime_filtered_join(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    assert "SortMergeJoin" in plan


def test_resample_gapfill_invariants(spark, sf_dir):
    rows = resample_gapfill_hourly(spark, sf_dir).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: r["hour"])
        # dense hourly grid, no leading null, forward-fill holds
        assert user_rows[0]["observed"]
        prev = None
        for i, r in enumerate(user_rows):
            assert r["value"] is not None
            if i:
                assert (r["hour"] - user_rows[i - 1]["hour"]).total_seconds() == 3600
                if not r["observed"]:
                    assert r["value"] == prev
            prev = r["value"]


def test_resample_grid_is_min_to_max(spark, sf_dir):
    from golang_mapreduce_spark.operators.temporal import RESAMPLE_USER_MOD

    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") % RESAMPLE_USER_MOD == 0)
        .groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
    )
    spans = {
        r["user_id"]: int((r["hi"] - r["lo"]).total_seconds() // 3600) + 1
        for r in e.collect()
    }
    got = (
        resample_gapfill_hourly(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert {r["user_id"]: r["n"] for r in got} == spans
