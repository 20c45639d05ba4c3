"""Semantic invariants for the round-7 observability/governance batch:
Gopher rule accounting, near-dup split-leakage audit, LSH band-load
stats, and the closed-form sliding-chunk manifest."""

from __future__ import annotations

from pyspark.sql import functions as F

from golang_mapreduce_spark.operators.corpus import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    sliding_chunk_stats,
)
from golang_mapreduce_spark.operators.dedup import (
    BANDS,
    dedup_minhash_pairs,
    minhash_band_stats,
    minhash_signatures,
)
from golang_mapreduce_spark.operators.sampling import (
    TRAIN_PCT,
    split_leakage_audit,
)
from golang_mapreduce_spark.operators.textstats import gopher_quality_rules
from golang_mapreduce_spark.functions.text import ws_words
from golang_mapreduce_spark.sources.fixtures import load_table


def test_gopher_rules_accounting(spark, sf_dir):
    """kept + any_rule == corpus size; any_rule is bounded by the sum
    of individual rule counts and by each rule's count from below."""
    rows = {r["rule"]: r["n_docs"] for r in gopher_quality_rules(spark, sf_dir).collect()}
    n_docs = load_table(spark, sf_dir, "documents").count()
    rule_keys = [
        "too_short", "too_long", "bad_mean_word_len",
        "low_stopword", "low_alpha", "symbol_heavy",
    ]
    assert set(rows) == set(rule_keys) | {"any_rule", "kept"}
    assert rows["kept"] + rows["any_rule"] == n_docs
    assert rows["any_rule"] <= sum(rows[k] for k in rule_keys)
    assert all(rows[k] <= rows["any_rule"] for k in rule_keys)
    assert all(rows[k] >= 0 for k in rows)


def test_split_leakage_against_pairs(spark, sf_dir):
    """The audit's leaked counts equal a direct recomputation from the
    engine's own pair relation and split assignment."""
    from golang_mapreduce_spark.functions.hashing import hash32

    docs = load_table(spark, sf_dir, "documents")
    buckets = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", (hash32(F.col("doc_id").cast("string")) % 100).alias("b")
        ).collect()
    }
    split = {
        i: ("train" if b < TRAIN_PCT else ("val" if b < TRAIN_PCT + 10 else "test"))
        for i, b in buckets.items()
    }
    pairs = dedup_minhash_pairs(spark, sf_dir).select("doc_a", "doc_b").collect()
    leaked = set()
    for r in pairs:
        a, b = r["doc_a"], r["doc_b"]
        if split[a] == "train" and split[b] != "train":
            leaked.add(b)
        if split[b] == "train" and split[a] != "train":
            leaked.add(a)
    expect = {}
    for s in ("val", "test"):
        members = [i for i in split if split[i] == s]
        expect[s] = (len(members), sum(1 for i in members if i in leaked))
    got = {
        r["split"]: (r["n_docs"], r["n_leaked_docs"])
        for r in split_leakage_audit(spark, sf_dir).collect()
    }
    assert got == expect


def test_band_stats_consistency(spark, sf_dir):
    """Every band indexes every signed doc exactly once (n_docs equals
    the signature count in all BANDS rows), loads are sane, and the
    candidate-pair mass upper-bounds the distinct pair count."""
    n_sigs = minhash_signatures(spark, sf_dir).count()
    rows = minhash_band_stats(spark, sf_dir).collect()
    assert len(rows) == BANDS
    for r in rows:
        assert r["n_docs"] == n_sigs
        assert 1 <= r["max_load"] <= r["n_docs"]
        assert r["n_buckets"] <= r["n_docs"]
        assert r["cand_pairs"] >= 0
    # sum of per-band bucket pair mass >= number of distinct candidate
    # pairs (a pair colliding in several bands is counted per band)
    n_pairs = (
        dedup_minhash_pairs(spark, sf_dir).select("doc_a", "doc_b").distinct().count()
    )
    assert sum(r["cand_pairs"] for r in rows) >= n_pairs


def test_cross_source_matrix_accounts_every_pair(spark, sf_dir):
    """The matrix's pair mass equals the pair relation's cardinality,
    and source pairs are direction-folded (source_a <= source_b)."""
    from golang_mapreduce_spark.operators.dedup import cross_source_dup_matrix

    rows = cross_source_dup_matrix(spark, sf_dir).collect()
    n_pairs = dedup_minhash_pairs(spark, sf_dir).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs
    assert all(r["source_a"] <= r["source_b"] for r in rows)


def test_source_sketch_is_merged_doc_sketch(spark, sf_dir):
    """MinHash merge property: the source-level signature equals the
    elementwise min of its documents' signatures (sketch of a union =
    min-merge of sketches), and the pair table covers every source
    pair with estimates in [0, 1]."""
    from collections import defaultdict

    from golang_mapreduce_spark.operators.dedup import (
        NUM_HASHES,
        _signatures_df,
        source_minhash_similarity,
    )

    docs = load_table(spark, sf_dir, "documents")
    src_of = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    doc_sigs = _signatures_df(spark, sf_dir).collect()
    merged = defaultdict(lambda: [None] * NUM_HASHES)
    for r in doc_sigs:
        m = merged[src_of[r["doc_id"]]]
        for i in range(NUM_HASHES):
            v = r[f"m{i}"]
            if m[i] is None or v < m[i]:
                m[i] = v
    # recompute the source sketch through the operator's own SQL path
    # by checking pair estimates against the merged doc sketches
    est = {}
    sources = sorted(merged)
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            eq = sum(1 for x, y in zip(merged[a], merged[b]) if x == y)
            est[(a, b)] = round(eq / NUM_HASHES, 6)
    rows = source_minhash_similarity(spark, sf_dir).collect()
    assert len(rows) == len(est)
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert round(r["est_jaccard"], 6) == est[(r["source_a"], r["source_b"])]


def test_tumbling_append_equals_batch(spark, sf_dir):
    """The finalized append-mode log equals the batch tumbling table
    row-for-row (same windows, counts, and decimal-quantized sums) and
    contains no sentinel residue."""
    from golang_mapreduce_spark.operators.windows import tumbling_hourly
    from golang_mapreduce_spark.streaming.jobs import streaming_tumbling_append

    got = {
        (str(r["wstart"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in streaming_tumbling_append(spark, sf_dir).collect()
    }
    want = {
        (str(r["wstart"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in tumbling_hourly(spark, sf_dir).collect()
    }
    assert got == want
    assert all(et != "sentinel" for _, et in got)


def test_oov_rate_against_python_vocab(spark, sf_dir):
    """The operator's OOV counts equal a direct python recomputation of
    the deterministic top-K vocabulary membership."""
    from collections import Counter

    from golang_mapreduce_spark.operators.textstats import (
        OOV_VOCAB_K,
        oov_rate_by_lang,
    )

    docs = load_table(spark, sf_dir, "documents").select("lang", "text").collect()
    counts: Counter = Counter()
    per_lang: dict[str, list[str]] = {}
    for r in docs:
        toks = [t for t in (r["text"] or "").split() if t]
        counts.update(toks)
        per_lang.setdefault(r["lang"], []).extend(toks)
    vocab = {
        t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:OOV_VOCAB_K]
    }
    got = {
        r["lang"]: (r["n_tokens"], r["n_oov"])
        for r in oov_rate_by_lang(spark, sf_dir).collect()
    }
    want = {
        lang: (len(toks), sum(1 for t in toks if t not in vocab))
        for lang, toks in per_lang.items()
    }
    assert got == want


def test_entropy_bounds_and_recompute(spark, sf_dir):
    """Per-source entropy is within [0, ln(n_distinct)] and equals the
    python recomputation under the same micro-unit rounding."""
    import math
    from collections import Counter

    from golang_mapreduce_spark.operators.textstats import ngram_entropy_by_source

    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    per_src: dict[str, Counter] = {}
    for r in docs:
        per_src.setdefault(r["source"], Counter()).update(
            t for t in (r["text"] or "").split() if t
        )
    rows = ngram_entropy_by_source(spark, sf_dir).collect()
    assert {r["source"] for r in rows} == set(per_src)
    for r in rows:
        c = per_src[r["source"]]
        total = sum(c.values())
        assert r["n_tokens"] == total
        assert r["n_distinct"] == len(c)
        h_u = sum(
            round(round(-(n / total) * math.log(n / total), 6) * 1_000_000)
            for n in c.values()
        )
        assert r["entropy"] == round(h_u / 1_000_000, 6)
        assert -1e-9 <= r["entropy"] <= math.log(max(len(c), 2)) + 1e-6


def test_quality_by_dup_class_partitions_corpus(spark, sf_dir):
    """Classes partition the corpus (counts sum to |docs|) and the
    class labels come from the fixed ladder."""
    from golang_mapreduce_spark.operators.dedup import quality_by_dup_class

    rows = quality_by_dup_class(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert {r["dup_class"] for r in rows} <= {"exact_dup", "near_dup", "unique"}
    for r in rows:
        assert r["min_quality"] <= r["avg_quality"] <= r["max_quality"]


def test_session_append_equals_batch(spark, sf_dir):
    """The finalized native-session append log equals the batch
    session_windows_30m table, with no sentinel residue."""
    from golang_mapreduce_spark.operators.windows import session_windows_30m
    from golang_mapreduce_spark.streaming.jobs import streaming_session_append

    got = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"], r["sum_value"])
        for r in streaming_session_append(spark, sf_dir).collect()
    )
    want = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"], r["sum_value"])
        for r in session_windows_30m(spark, sf_dir).collect()
    )
    assert got == want
    assert all(u >= 0 for u, *_ in got)


def _brute_chunks(n: int) -> tuple[int, int]:
    """Reference chunker: enumerate windows of CHUNK_TOKENS with stride
    CHUNK_STRIDE until the doc is covered; return (k, chunked_tokens)."""
    if n == 0:
        return 0, 0
    k, toks, start = 0, 0, 0
    while True:
        k += 1
        toks += min(CHUNK_TOKENS, n - start)
        if start + CHUNK_TOKENS >= n:
            return k, toks
        start += CHUNK_STRIDE


def test_chunk_closed_form_matches_enumeration(spark, sf_dir):
    """The closed-form manifest equals brute-force window enumeration,
    both per length value (property check) and on the corpus totals."""
    for n in list(range(0, 200)) + [1_000, 99_999]:
        if n == 0:
            k = 0
        elif n <= CHUNK_TOKENS:
            k = 1
        else:
            k = 1 + -(-(n - CHUNK_TOKENS) // CHUNK_STRIDE)
        bk, btoks = _brute_chunks(n)
        assert k == bk, n
        if n > 0:
            assert (k - 1) * CHUNK_TOKENS + (n - (k - 1) * CHUNK_STRIDE) == btoks, n

    docs = load_table(spark, sf_dir, "documents")
    lens = [
        r["n"]
        for r in docs.select(
            F.coalesce(F.size(ws_words("text")), F.lit(0)).alias("n")
        ).collect()
    ]
    exp_chunks = sum(_brute_chunks(n)[0] for n in lens)
    exp_ctoks = sum(_brute_chunks(n)[1] for n in lens)
    rows = sliding_chunk_stats(spark, sf_dir).collect()
    assert sum(r["n_chunks"] for r in rows) == exp_chunks
    assert sum(r["n_chunk_tokens"] for r in rows) == exp_ctoks
    for r in rows:
        if r["n_tokens"] > 0:
            assert r["overlap_factor"] >= 1.0
