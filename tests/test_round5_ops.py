"""Semantic invariants for the round-5 batch: PII detection/redaction,
SemDeDup-style semantic dedup, event-sequence n-gram mining, and the
temperature-rebalance stage composed into training_data_run."""

from __future__ import annotations

import re
from collections import defaultdict

from pyspark.sql import functions as F

from golang_mapreduce_spark.operators.analytics import (
    SEQ_NGRAM_TOP,
    event_ngram_patterns,
    event_transition_matrix,
)
from golang_mapreduce_spark.operators.dedup import semantic_dedup_keep
from golang_mapreduce_spark.operators.pii import (
    EMAIL_MOD,
    ID_MOD,
    PHONE_MOD,
    pii_rates,
    pii_redacted_sample,
)
from golang_mapreduce_spark.operators.similarity import (
    NEARDUP_COS,
    emb_neardup_pairs,
)
from golang_mapreduce_spark.operators.textstats import quality_scores
from golang_mapreduce_spark.sources.fixtures import load_table


def test_pii_rates_accounting(spark, sf_dir):
    """Injection is residue-class-exact: total email hits across sources
    equal |{doc_id % EMAIL_MOD == 0}| (one injected address each), and
    docs_with_pii counts exactly the union of the three classes."""
    docs = load_table(spark, sf_dir, "documents")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    rows = pii_rates(spark, sf_dir).collect()
    tot = lambda c: sum(r[c] for r in rows)  # noqa: E731
    assert tot("email_hits") == sum(1 for i in ids if i % EMAIL_MOD == 0)
    assert tot("phone_hits") == sum(1 for i in ids if i % PHONE_MOD == 0)
    assert tot("id_hits") == sum(1 for i in ids if i % ID_MOD == 0)
    expected_any = sum(
        1
        for i in ids
        if i % EMAIL_MOD == 0 or i % PHONE_MOD == 0 or i % ID_MOD == 0
    )
    assert tot("docs_with_pii") == expected_any
    assert tot("n_docs") == len(ids)
    for r in rows:
        assert abs(r["pii_rate"] - round(r["docs_with_pii"] / r["n_docs"], 6)) < 1e-12


def test_pii_redaction_complete(spark, sf_dir):
    """No raw PII survives redaction: every sampled row contains the
    placeholder for each class its doc_id residue implies and no
    email/phone/ID-shaped substring."""
    email_re = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    num_re = re.compile(r"\d{3}-\d{2,3}-\d{4}")
    rows = pii_redacted_sample(spark, sf_dir).collect()
    assert rows
    for r in rows:
        t = r["redacted"]
        assert not email_re.search(t), t
        assert not num_re.search(t), t
        if r["doc_id"] % EMAIL_MOD == 0:
            assert "[EMAIL]" in t
        if r["doc_id"] % PHONE_MOD == 0:
            assert "[PHONE]" in t
        if r["doc_id"] % ID_MOD == 0:
            assert "[ID]" in t
        assert r["injected_chars"] > 0


def test_semantic_dedup_covers_pair_graph(spark, sf_dir):
    """Every doc that appears in a near-dup pair lands in exactly one
    semantic group; the kept doc has the group's max quality; dropped
    count is members-1; no singleton groups are emitted."""
    pairs = emb_neardup_pairs(spark, sf_dir).select("vec_a", "vec_b").collect()
    in_pairs = {r["vec_a"] for r in pairs} | {r["vec_b"] for r in pairs}
    q = {
        r["doc_id"]: r["quality_score"]
        for r in quality_scores(spark, sf_dir).collect()
    }
    rows = semantic_dedup_keep(spark, sf_dir).collect()
    assert sum(r["n_members"] for r in rows) == len(in_pairs)
    for r in rows:
        assert r["n_members"] >= 2
        assert r["n_dropped"] == r["n_members"] - 1
        assert r["keep_doc_id"] in in_pairs
        assert abs(r["best_quality"] - q[r["keep_doc_id"]]) < 1e-12
    # kept docs are pairwise distinct and so are cluster ids
    assert len({r["cluster_id"] for r in rows}) == len(rows)
    assert len({r["keep_doc_id"] for r in rows}) == len(rows)


def test_semantic_pairs_meet_threshold(spark, sf_dir):
    rows = emb_neardup_pairs(spark, sf_dir).collect()
    assert rows
    assert all(r["cos_sim"] >= NEARDUP_COS for r in rows)


def test_event_ngrams_extend_transitions(spark, sf_dir):
    """Trigram occurrences sum to sum over users of max(len-2, 0); the
    rank is contiguous; every trigram's (first, second) prefix is a
    transition the first-order matrix also saw."""
    e = load_table(spark, sf_dir, "events")
    per_user = {
        r["user_id"]: r["n"]
        for r in e.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    rows = event_ngram_patterns(spark, sf_dir).collect()
    assert len(rows) == SEQ_NGRAM_TOP
    assert sorted(r["rank"] for r in rows) == list(range(1, SEQ_NGRAM_TOP + 1))
    total_grams = sum(max(n - 2, 0) for n in per_user.values())
    # top-k covers at most the total; with 5 event types there are at
    # most 125 patterns, so the top 20 must carry a large share
    assert 0 < sum(r["n_occurrences"] for r in rows) <= total_grams
    trans = {
        (r["prev_type"], r["next_type"])
        for r in event_transition_matrix(spark, sf_dir).collect()
    }
    n_users = len(per_user)
    for r in rows:
        a, b, c = r["pattern"].split(">")
        assert (a, b) in trans and (b, c) in trans
        assert 0 < r["n_users"] <= n_users
        assert abs(r["user_support"] - round(r["n_users"] / n_users, 6)) < 1e-12


def test_training_run_respects_temperature_stage(spark, sf_dir):
    """Every packed doc passes the composed temperature filter: the
    chain's output ids are a subset of the standalone sampler's keep
    set (same rate table, same salt)."""
    from golang_mapreduce_spark.operators.pipeline import training_data_run
    from golang_mapreduce_spark.operators.sampling import (
        temperature_rebalance_sample,
    )

    kept = {
        r["doc_id"]
        for r in temperature_rebalance_sample(spark, sf_dir).collect()
    }
    packed = training_data_run(spark, sf_dir).collect()
    assert packed
    assert {r["doc_id"] for r in packed} <= kept


def test_dsir_weights_accounting(spark, sf_dir):
    """Weights exist for exactly the pool docs that share a feature
    bucket with anything (all of them: every bucket is pool-populated),
    n_feats = unigrams + bigrams per doc, and weights are finite."""
    import math

    from golang_mapreduce_spark.operators.corpus import (
        DECON_MOD,
        dsir_importance_weights,
    )
    from golang_mapreduce_spark.functions.text import ws_words

    docs = load_table(spark, sf_dir, "documents")
    toks = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(ws_words("text")).alias("n")
        ).collect()
    }
    rows = dsir_importance_weights(spark, sf_dir).collect()
    pool = [i for i in toks if i % DECON_MOD != 0 and toks[i] > 0]
    assert len(rows) == len(pool)
    for r in rows:
        n = toks[r["doc_id"]]
        assert r["n_feats"] == n + max(n - 1, 0)
        assert math.isfinite(r["log_weight"])


def test_source_budget_select_greedy(spark, sf_dir):
    """Within each source the kept set is a quality-desc prefix whose
    token total stays within budget, and adding the first excluded doc
    would break the budget."""
    from collections import defaultdict

    from golang_mapreduce_spark.operators.sampling import (
        SRC_TOKEN_BUDGET,
        source_budget_select,
    )

    rows = source_budget_select(spark, sf_dir).collect()
    assert rows
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (-r["quality_score"], r["doc_id"]))
        cum = 0
        for r in rs:
            cum += r["n_toks"]
            assert r["cum_toks"] == cum
        assert cum <= SRC_TOKEN_BUDGET


def test_dedup_normalized_collapses_variants(spark):
    """Case/punctuation/whitespace variants collapse to one group while
    genuinely different text stays apart."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from golang_mapreduce_spark.operators.dedup import dedup_normalized

    texts = [
        "Hello, World!",
        "hello   world",
        "HELLO WORLD.",
        "hello\tworld\n",
        "goodbye world",
    ]
    d = tempfile.mkdtemp(prefix="gmrs_norm_")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    rows = {r["keep_doc_id"]: r["n_copies"] for r in dedup_normalized(spark, d).collect()}
    assert rows == {0: 4, 4: 1}


def test_novelty_curve_saturates(spark, sf_dir):
    """Bucket 0's novelty rate is maximal (everything is first-seen at
    the start), totals of n_new equal the corpus's distinct n-gram
    count, and rates stay in (0, 1]."""
    from golang_mapreduce_spark.operators.dedup import _shingles
    from golang_mapreduce_spark.operators.textstats import (
        NOVELTY_NGRAM,
        ngram_novelty_curve,
    )
    from golang_mapreduce_spark.functions.text import ws_words

    docs = load_table(spark, sf_dir, "documents")
    n_distinct_total = (
        docs.select("doc_id", ws_words("text").alias("toks"))
        .where(F.size("toks") >= NOVELTY_NGRAM)
        .select(F.explode(_shingles(NOVELTY_NGRAM)).alias("g"))
        .distinct()
        .count()
    )
    rows = sorted(ngram_novelty_curve(spark, sf_dir).collect(), key=lambda r: r["bucket"])
    assert rows[0]["bucket"] == 0 and rows[0]["novelty_rate"] == 1.0
    assert sum(r["n_new"] for r in rows) == n_distinct_total
    for r in rows:
        assert 0 <= r["n_new"] <= r["n_distinct"]
        assert 0.0 <= r["novelty_rate"] <= 1.0
    # saturation: the last bucket discovers less than the first
    assert rows[-1]["n_new"] <= rows[0]["n_new"]


def test_blocked_components_match_iterative_cc(spark, sf_dir):
    """The one-shuffle per-cluster union-find must produce EXACTLY the
    labels the iterative pointer-doubling walk converges to on the same
    single-probe pair graph — the blocking invariant (no component
    spans clusters) is what makes the localization sound."""
    from golang_mapreduce_spark.operators.dedup import (
        blocked_components,
        clusters_from,
    )

    pairs = emb_neardup_pairs(spark, sf_dir).select(
        "cluster",
        F.col("vec_a").alias("doc_a"),
        F.col("vec_b").alias("doc_b"),
    )
    local = {
        (r["doc_id"], r["cluster_id"])
        for r in blocked_components(pairs).collect()
    }
    global_cc = {
        (r["doc_id"], r["cluster_id"])
        for r in clusters_from(pairs.select("doc_a", "doc_b")).collect()
    }
    assert local == global_cc
    # and the invariant itself: every edge is intra-cluster (each doc
    # appears under exactly one blocking cluster)
    doc_clusters = (
        pairs.select(F.col("doc_a").alias("d"), "cluster")
        .union(pairs.select(F.col("doc_b").alias("d"), "cluster"))
        .groupBy("d")
        .agg(F.countDistinct("cluster").alias("nc"))
        .agg(F.max("nc").alias("m"))
        .collect()[0]["m"]
    )
    assert doc_clusters == 1


def test_incremental_triage_partition(spark, sf_dir):
    """Exactly one verdict per incoming doc; precedence exact > near;
    every match id is a BASE doc; novel rows have no match."""
    from golang_mapreduce_spark.operators.dedup import (
        INGEST_MOD,
        INGEST_RES,
        dedup_incremental_triage,
    )

    docs = load_table(spark, sf_dir, "documents")
    incoming = {
        r["doc_id"]
        for r in docs.where(
            F.col("doc_id") % INGEST_MOD == INGEST_RES
        ).collect()
    }
    rows = dedup_incremental_triage(spark, sf_dir).collect()
    assert {r["doc_id"] for r in rows} == incoming
    assert len(rows) == len(incoming)
    for r in rows:
        if r["verdict"] == "novel":
            assert r["match_doc_id"] is None
        else:
            assert r["verdict"] in ("exact_dup", "near_dup")
            assert r["match_doc_id"] % INGEST_MOD != INGEST_RES
