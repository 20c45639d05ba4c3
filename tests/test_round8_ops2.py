"""Structural invariants for the second round-8 operator batch
(dq_constraint_audit, snapshot_diff, bitext_margin_pairs,
neardup_pagerank, pmi_bigrams) — oracle parity is covered by the
parameterized tests/test_oracle_parity.py sweep; these tests pin the
semantics parity alone can't see: injected violations are DETECTED,
planted pairs are MINED, and the composed relations stay mutually
consistent."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from golang_mapreduce_spark.operators.dedup import (
    dup_graph_degree_stats,
    neardup_pagerank,
)
from golang_mapreduce_spark.operators.incremental import (
    DEL_MOD,
    INS_KEY_OFFSET,
    INS_MOD,
    UPD_MOD,
    snapshot_diff,
)
from golang_mapreduce_spark.operators.relational import dq_constraint_audit
from golang_mapreduce_spark.operators.similarity import (
    BITEXT_SRC_LIM,
    bitext_margin_pairs,
)
from golang_mapreduce_spark.operators.textstats import (
    PMI_MIN_SUPPORT,
    bigram_counts,
    pmi_bigrams,
    token_stats,
)
from golang_mapreduce_spark.sources.fixtures import load_table


def test_dq_audit_clean_fixture_profile(spark, sf_dir):
    """On the generated fixture the referential/key/range constraints
    hold and the two deliberately data-dependent ones (negative account
    balances, lineitems shipped before their order date) have non-zero
    violation mass — the audit is provably not an always-green stub."""
    rows = {r["constraint"]: r for r in dq_constraint_audit(spark, sf_dir).collect()}
    n_orders = load_table(spark, sf_dir, "orders").count()
    n_lineitem = load_table(spark, sf_dir, "lineitem").count()
    assert rows["orders_fk_customer"]["n_violations"] == 0
    assert rows["orders_fk_customer"]["n_checked"] == n_orders
    assert rows["lineitem_fk_orders"]["n_violations"] == 0
    assert rows["lineitem_fk_orders"]["n_checked"] == n_lineitem
    assert rows["orders_pk_unique"]["n_violations"] == 0
    assert rows["orders_totalprice_positive"]["n_violations"] == 0
    assert rows["lineitem_quantity_1_50"]["n_violations"] == 0
    assert rows["lineitem_discount_0_to_0_10"]["n_violations"] == 0
    assert rows["customer_acctbal_nonneg"]["n_violations"] > 0
    assert rows["lineitem_ships_after_order"]["n_violations"] > 0
    assert rows["lineitem_ships_after_order"]["n_checked"] == n_lineitem


def test_dq_audit_detects_injected_violations(spark, tmp_path):
    """A corrupted 3-table micro-fixture: one FK orphan order, one
    duplicated order key, one negative price, one orphan lineitem —
    every injected defect must surface with the exact count."""
    d = str(tmp_path)
    spark.createDataFrame(
        [(1, "alice", 1, 100.0, "BUILDING"), (2, "bob", 1, -5.0, "AUTO")],
        "c_custkey int, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).write.parquet(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        [
            (10, 1, "O", 50.0, "1995-01-01", "1-URGENT"),
            (10, 1, "O", 50.0, "1995-01-01", "1-URGENT"),   # dup key
            (11, 99, "O", 10.0, "1995-01-01", "2-HIGH"),    # FK orphan
            (12, 2, "F", -1.0, "1995-02-01", "3-MEDIUM"),   # bad price
        ],
        "o_orderkey int, o_custkey int, o_orderstatus string, o_totalprice double, "
        "o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate", "o_orderpriority",
    ).write.parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        [
            (10, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", "1995-01-10"),
            (99, 1, 1, 1, 99.0, 100.0, 0.95, 0.02, "N", "O", "1994-12-01"),  # orphan + ranges
        ],
        "l_orderkey int, l_partkey int, l_suppkey int, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))

    rows = {r["constraint"]: r for r in dq_constraint_audit(spark, d).collect()}
    assert rows["orders_fk_customer"]["n_violations"] == 1
    assert rows["orders_pk_unique"]["n_violations"] == 1
    assert rows["orders_totalprice_positive"]["n_violations"] == 1
    assert rows["customer_acctbal_nonneg"]["n_violations"] == 1
    assert rows["lineitem_fk_orders"]["n_violations"] == 1
    assert rows["lineitem_quantity_1_50"]["n_violations"] == 1
    assert rows["lineitem_discount_0_to_0_10"]["n_violations"] == 1


def test_snapshot_diff_rederives_the_cdc_batch(spark, sf_dir):
    """The diff of (base snapshot, maintained snapshot) must be exactly
    the CDC batch the maintenance applied: inserts are the %INS_MOD
    spawns above the key offset, deletes the %DEL_MOD wins, updates the
    surviving %UPD_MOD price bumps — with per-class counts derived
    independently from the base table."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    n_ins = orders.where(F.col("o_orderkey") % INS_MOD == 0).count()
    n_del = orders.where(F.col("o_orderkey") % DEL_MOD == 0).count()
    n_upd = orders.where(
        (F.col("o_orderkey") % UPD_MOD == 0) & (F.col("o_orderkey") % DEL_MOD != 0)
    ).count()

    rows = snapshot_diff(spark, sf_dir).collect()
    by_class: dict[str, list] = {}
    for r in rows:
        by_class.setdefault(r["change"], []).append(r)
    assert set(by_class) == {"insert", "delete", "update"}
    assert len(by_class["insert"]) == n_ins
    assert len(by_class["delete"]) == n_del
    assert len(by_class["update"]) == n_upd
    for r in by_class["insert"]:
        assert r["o_orderkey"] >= INS_KEY_OFFSET
        assert (r["o_orderkey"] - INS_KEY_OFFSET) % INS_MOD == 0
        assert r["old_totalprice"] is None and r["new_totalprice"] is not None
    for r in by_class["delete"]:
        assert r["o_orderkey"] % DEL_MOD == 0
        assert r["new_totalprice"] is None and r["old_totalprice"] is not None
    for r in by_class["update"]:
        assert r["o_orderkey"] % UPD_MOD == 0 and r["o_orderkey"] % DEL_MOD != 0
        assert abs(r["new_totalprice"] - r["old_totalprice"] * 1.1) < 1e-9


def _write_emb(spark, path: str, vecs: dict[int, list[float]]) -> None:
    rows = [(vid, [float(x) for x in v], vid % 3) for vid, v in vecs.items()]
    spark.createDataFrame(
        rows, "vec_id int, embedding array<float>, label int"
    ).write.parquet(os.path.join(path, "embeddings.parquet"))


def test_bitext_planted_translation_pair_is_mined(spark, tmp_path):
    """A target embedding identical to source 0 must be mined as its
    pair with sim 1.0 — and hub-ness is normalized: every source gets
    exactly one mined pair with an odd-id target."""
    dim = 8
    vecs: dict[int, list[float]] = {}
    for vid in range(2 * BITEXT_SRC_LIM):
        base = [math.sin(vid * 37.0 + i * 3.1) for i in range(dim)]
        vecs[vid] = base
    vecs[7] = list(vecs[0])  # the planted translation of source 0
    d = str(tmp_path)
    _write_emb(spark, d, vecs)

    rows = bitext_margin_pairs(spark, d).collect()
    by_q = {r["query_id"]: r for r in rows}
    assert set(by_q) == {q for q in range(0, BITEXT_SRC_LIM, 2)}
    for r in rows:
        assert r["pair_id"] % 2 == 1
        assert r["margin"] is not None and r["margin"] > 0
    assert by_q[0]["pair_id"] == 7
    assert by_q[0]["sim"] == 1.0


def test_pagerank_degrees_match_histogram_and_isolated_mass(spark, sf_dir):
    """The per-doc degrees inside neardup_pagerank must reproduce
    dup_graph_degree_stats' histogram exactly; isolated docs settle at
    1-d = 0.15 after the fixed iterations, and every connected doc
    outranks them."""
    pr = neardup_pagerank(spark, sf_dir).collect()
    hist = {
        r["degree"]: r["n_docs"] for r in dup_graph_degree_stats(spark, sf_dir).collect()
    }
    got: dict[int, int] = {}
    for r in pr:
        got[r["degree"]] = got.get(r["degree"], 0) + 1
    assert got == hist
    for r in pr:
        if r["degree"] == 0:
            assert r["pagerank"] == 0.15
        else:
            assert r["pagerank"] > 0.15
    spark.catalog.clearCache()


def test_pmi_values_recompute_from_counts(spark, sf_dir):
    """Every emitted PMI must equal ln(n_pair·N1²/(n_w1·n_w2·N2))
    recomputed from the row's own counts and independently-derived
    corpus totals; support filter holds."""
    n1 = token_stats(spark, sf_dir).agg(F.sum("n_tokens")).collect()[0][0]
    n2 = bigram_counts(spark, sf_dir).agg(F.sum("cnt")).collect()[0][0]
    rows = pmi_bigrams(spark, sf_dir).collect()
    assert rows, "support threshold dropped everything — fixture too small"
    for r in rows:
        assert r["n_pair"] >= PMI_MIN_SUPPORT
        want = math.log(
            (float(r["n_pair"]) * float(n1) * float(n1))
            / (float(r["n_w1"]) * float(r["n_w2"]) * float(n2))
        )
        assert abs(r["pmi"] - round(want, 6)) < 1e-9, (r, want)


def test_span_manifest_reconciles_with_dup_fraction(spark, sf_dir):
    """Cross-operator invariant: per doc, the sum of shingles inside
    the manifest's maximal spans must equal dup_ngram_fraction's
    dup_pos exactly (the manifest is the same duplicated-position set,
    merged), spans must be disjoint and ordered, and each span's
    shingle count must match its width."""
    from golang_mapreduce_spark.operators.dedup import (
        JACCARD_NGRAM,
        dup_ngram_fraction,
        dup_span_manifest,
    )

    spans = dup_span_manifest(spark, sf_dir).collect()
    frac = {
        r["doc_id"]: r["dup_pos"]
        for r in dup_ngram_fraction(spark, sf_dir).collect()
    }
    per_doc: dict[int, list] = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append(r)
        # width check: a run of k shingle starts covers k + n - 1 tokens
        assert r["span_end"] - r["span_start"] + 1 == r["n_shingles"] + JACCARD_NGRAM - 1
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r["span_start"])
        for a, b in zip(rows, rows[1:]):
            # maximal: next span starts strictly past this one's last
            # shingle start + 1 (else they'd have merged)
            assert b["span_start"] > a["span_end"] - JACCARD_NGRAM + 2
        assert sum(r["n_shingles"] for r in rows) == frac[doc_id]
