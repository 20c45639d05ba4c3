"""Structural invariants for the round-10 operator batch — oracle parity
is covered by the parameterized tests/test_oracle_parity.py sweep and the
adversarial corpora by tests/test_text_fuzz_parity.py; these pin the
semantics parity alone can't see: the BPE census agrees with a pure-Python
recount, the Zipf fit reproduces a hand-computed OLS on planted
frequencies, and the JSD matrix hits its closed-form extremes (identical
sources -> 0, disjoint sources -> ln 2)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from pyspark.sql import functions as F

from golang_mapreduce_spark.operators.textstats import (
    JS_TOPV,
    MERGE_TOP,
    ZIPF_TOP,
    bpe_merge_candidates,
    js_divergence_sources,
    zipf_slope_by_lang,
)
from golang_mapreduce_spark.sources.fixtures import load_table


def test_bpe_merge_candidates_match_python_recount(spark, sf_dir):
    """The distributed pair census equals a pure-Python Counter over the
    same corpus: every adjacent index of every token occurrence, weighted
    by corpus frequency (functions/bpe.py train_merges semantics at
    corpus weight)."""
    rows = bpe_merge_candidates(spark, sf_dir).collect()
    assert 0 < len(rows) <= MERGE_TOP
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))

    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
        if r["text"] is not None
    ]
    pairs: Counter = Counter()
    for text in texts:
        for w in text.split():
            for i in range(len(w) - 1):
                pairs[w[i : i + 2]] += 1
    expected = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:MERGE_TOP]
    got = [(r["pair"], r["pair_count"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert got == expected


def test_zipf_fit_reproduces_hand_ols(spark, tmp_path):
    """Planted single-lang corpus with exact token frequencies 8/4/2/1:
    the operator's slope/intercept/r2 equal the closed-form OLS computed
    here (on the same 9-dp-rounded ln values)."""
    freqs = {"aa": 8, "bb": 4, "cc": 2, "dd": 1}
    text = " ".join(" ".join([w] * n) for w, n in freqs.items())
    d = str(tmp_path / "zipf")
    spark.createDataFrame(
        [(0, text, "en", "s0", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    rows = zipf_slope_by_lang(spark, d).collect()
    assert len(rows) == 1 and rows[0]["lang"] == "en"
    xs = [round(math.log(r), 9) for r in range(1, 5)]
    ys = [round(math.log(c), 9) for c in sorted(freqs.values(), reverse=True)]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert rows[0]["n_ranks"] == 4
    assert rows[0]["zipf_slope"] == pytest.approx(slope, abs=2e-6)
    assert rows[0]["intercept"] == pytest.approx(intercept, abs=2e-6)
    assert rows[0]["r2"] == pytest.approx(r2, abs=2e-6)
    # geometric frequencies on log-spaced ranks are NOT collinear, but a
    # Zipf-ish corpus must still fit tightly and fall
    assert rows[0]["zipf_slope"] < 0
    assert 0.9 < rows[0]["r2"] <= 1.0


def test_zipf_real_corpus_bounds(spark, sf_dir):
    rows = zipf_slope_by_lang(spark, sf_dir).collect()
    langs = {
        r["lang"]
        for r in load_table(spark, sf_dir, "documents").select("lang").distinct().collect()
    }
    assert {r["lang"] for r in rows} <= langs
    for r in rows:
        assert 3 <= r["n_ranks"] <= ZIPF_TOP
        assert r["zipf_slope"] < 0  # frequency falls with rank by construction
        if r["r2"] is not None:
            assert 0.0 <= r["r2"] <= 1.0


def test_jsd_extremes_on_planted_sources(spark, tmp_path):
    """Three planted sources: s0 and s1 share the exact token
    distribution (JSD 0), s2 is token-disjoint from both (JSD ln 2,
    js_normalized 1).  Also pins symmetry-by-construction: the operator
    emits each unordered pair once with source_a < source_b."""
    body_a = "alpha beta gamma delta " * 5
    body_b = "epsilon zeta eta theta " * 5
    docs = [
        (0, body_a, "en", "s0", len(body_a)),
        (1, body_a, "en", "s1", len(body_a)),
        (2, body_b, "en", "s2", len(body_b)),
    ]
    d = str(tmp_path / "jsd")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    rows = js_divergence_sources(spark, d).collect()
    by_pair = {(r["source_a"], r["source_b"]): r for r in rows}
    assert set(by_pair) == {("s0", "s1"), ("s0", "s2"), ("s1", "s2")}
    assert by_pair[("s0", "s1")]["js_divergence"] == pytest.approx(0.0, abs=1e-6)
    for pair in (("s0", "s2"), ("s1", "s2")):
        assert by_pair[pair]["n_common_tokens"] == 0
        assert by_pair[pair]["js_divergence"] == pytest.approx(math.log(2), abs=1e-6)
        assert by_pair[pair]["js_normalized"] == pytest.approx(1.0, abs=1e-6)


def test_jsd_real_corpus_bounds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    rows = js_divergence_sources(spark, sf_dir).collect()
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 <= r["n_common_tokens"] <= JS_TOPV
        # rounding of the shared-mass decimals can nudge past the ideal
        # bounds by strictly less than a rounding quantum
        assert -1e-6 <= r["js_divergence"] <= math.log(2) + 1e-6
        assert -1e-6 <= r["js_normalized"] <= 1.0 + 1e-6
