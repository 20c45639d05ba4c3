"""Structural invariants for the round-11 operator batch — oracle parity
is covered by tests/test_oracle_parity.py and the adversarial corpora by
tests/test_text_fuzz_parity.py; these pin the semantics parity alone
can't see: the chunk manifest reproduces the closed-form chunk plan and
hashes identical windows identically, the richness census matches a
hand count, MI hits its closed-form extremes (independent -> 0,
bijective -> ln 2), the trend OLS reproduces a planted slope, the LTV
curve accumulates exactly, HHI hits the monopoly/duopoly closed forms,
and the k-fold audit is a deterministic md5 recomputation."""

from __future__ import annotations

import hashlib
import math

import pytest

from golang_mapreduce_spark.operators.analytics import (
    cohort_ltv_curves,
    customer_order_trend,
)
from golang_mapreduce_spark.operators.corpus import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    rag_chunk_manifest,
)
from golang_mapreduce_spark.operators.sampling import (
    KFOLD_K,
    kfold_assignment_audit,
)
from golang_mapreduce_spark.operators.textstats import (
    hapax_richness_by_source,
    mutual_information_lang_source,
)
from golang_mapreduce_spark.operators.tpch_extra import supplier_hhi_by_nation

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.parquet(
        f"{path}/documents.parquet"
    )


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_rag_chunk_manifest_closed_form_and_hashes(spark, tmp_path):
    """50 tokens -> 3 chunks at starts 0/16/32 with lens 32/32/18; a
    1-token doc emits exactly one chunk; an empty doc emits nothing;
    two docs with identical text produce identical chunk hashes."""
    assert (CHUNK_TOKENS, CHUNK_STRIDE) == (32, 16)
    t50 = " ".join(f"w{i}" for i in range(50))
    t1 = "solo"
    d = str(tmp_path / "rag")
    _docs(
        spark,
        d,
        [
            (0, t50, "en", "s0", len(t50)),
            (1, t1, "en", "s0", len(t1)),
            (2, "", "en", "s0", 0),
            (3, t50, "en", "s1", len(t50)),
        ],
    )
    rows = rag_chunk_manifest(spark, d).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {0, 1, 3}
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_idx"])
    assert [(r["token_start"], r["chunk_len"]) for r in c0] == [
        (0, 32),
        (16, 32),
        (32, 18),
    ]
    toks = t50.split()
    for r in c0:
        want = _h32(" ".join(toks[r["token_start"] : r["token_start"] + r["chunk_len"]]))
        assert r["chunk_hash"] == want
    assert [(r["token_start"], r["chunk_len"]) for r in by_doc[1]] == [(0, 1)]
    # identical text => identical hashes (the chunk-level dedup key)
    assert sorted(r["chunk_hash"] for r in by_doc[0]) == sorted(
        r["chunk_hash"] for r in by_doc[3]
    )


def test_rag_chunk_tiling_invariants_all_lengths(spark, tmp_path):
    """For EVERY token count n in 0..200 (one doc per n, one Spark
    job): the chunk count equals the closed form sliding_chunk_stats
    prices, chunk starts tile 0/S/2S/..., every chunk except possibly
    the last is exactly W tokens, the last chunk ends exactly at n, and
    consecutive chunks overlap by exactly W - S tokens."""
    from golang_mapreduce_spark.operators.corpus import (
        CHUNK_STRIDE as S,
        CHUNK_TOKENS as W,
    )

    d = str(tmp_path / "tile")
    _docs(
        spark,
        d,
        [(n, " ".join(f"t{i}" for i in range(n)), "en", "s0", n) for n in range(201)],
    )
    rows = rag_chunk_manifest(spark, d).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 0 not in by_doc  # n = 0 emits nothing
    for n in range(1, 201):
        cs = sorted(by_doc[n], key=lambda r: r["chunk_idx"])
        want_k = 1 if n <= W else 1 + -(-(n - W) // S)  # ceil div
        assert len(cs) == want_k, (n, len(cs), want_k)
        assert [c["chunk_idx"] for c in cs] == list(range(want_k))
        for i, c in enumerate(cs):
            assert c["token_start"] == i * S, (n, i)
            want_len = min(W, n - i * S)
            assert c["chunk_len"] == want_len, (n, i)
        last = cs[-1]
        assert last["token_start"] + last["chunk_len"] == n, n
        assert all(c["chunk_len"] >= 1 for c in cs), n


def test_hapax_richness_hand_count(spark, tmp_path):
    """'a a b c' -> 4 tokens, vocab 3, hapax {b, c}."""
    d = str(tmp_path / "hapax")
    _docs(spark, d, [(0, "a a b c", "en", "s0", 7)])
    rows = hapax_richness_by_source(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["total_tokens"], r["vocab_size"], r["hapax_count"]) == (4, 3, 2)
    assert r["hapax_ratio"] == pytest.approx(round(2 / 3, 6))
    assert r["type_token_ratio"] == pytest.approx(0.75)


def test_mutual_information_extremes(spark, tmp_path):
    """Independent uniform grid -> MI = 0 (every PMI 0); a bijective
    lang<->source mapping with equal masses -> MI = ln 2."""
    d_ind = str(tmp_path / "mi_ind")
    _docs(
        spark,
        d_ind,
        [
            (i, "x", lang, src, 1)
            for i, (lang, src) in enumerate(
                (l, s) for l in ("en", "fr") for s in ("s0", "s1")
            )
        ],
    )
    rows = mutual_information_lang_source(spark, d_ind).collect()
    assert len(rows) == 4
    assert all(r["pmi"] == 0.0 and r["mi_total"] == 0.0 for r in rows)

    d_dep = str(tmp_path / "mi_dep")
    _docs(
        spark,
        d_dep,
        [(0, "x", "en", "s0", 1), (1, "x", "fr", "s1", 1)],
    )
    rows = mutual_information_lang_source(spark, d_dep).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["pmi"] == pytest.approx(math.log(2), abs=2e-6)
        assert r["mi_total"] == pytest.approx(math.log(2), abs=2e-6)


ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _orders(spark, path, rows):
    spark.createDataFrame(rows, ORD_SCHEMA).coalesce(1).write.parquet(
        f"{path}/orders.parquet"
    )


def test_customer_order_trend_planted_slope(spark, tmp_path):
    """Quarterly counts 1/2/3 over 1992 Q1-Q3 -> slope exactly 1; a
    customer with only 2 quarters is dropped by the n>=3 guard."""
    import datetime as dt

    rows = []
    ok = 0
    for q, cnt in ((1, 1), (4, 2), (7, 3)):  # months 1, 4, 7 = Q1..Q3
        for _ in range(cnt):
            ok += 1
            rows.append(
                (ok, 1, "O", 10.0, dt.datetime(1992, q, 15), "1-URGENT")
            )
    for q in (1, 4):  # 2-quarter customer: filtered out
        ok += 1
        rows.append((ok, 2, "O", 10.0, dt.datetime(1992, q, 15), "1-URGENT"))
    d = str(tmp_path / "trend")
    _orders(spark, d, rows)
    out = customer_order_trend(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["custkey"], r["n_quarters"], r["total_orders"]) == (1, 3, 6)
    assert r["slope_orders_per_quarter"] == pytest.approx(1.0)


def test_cohort_ltv_accumulates_exactly(spark, tmp_path):
    """One customer, 100.0 in the cohort month and 50.0 a month later:
    cum_revenue 100 -> 150, ltv = cum / cohort_size(=1)."""
    import datetime as dt

    d = str(tmp_path / "ltv")
    _orders(
        spark,
        d,
        [
            (1, 1, "O", 100.0, dt.datetime(1995, 3, 10), "1-URGENT"),
            (2, 1, "O", 50.0, dt.datetime(1995, 4, 20), "1-URGENT"),
        ],
    )
    rows = sorted(cohort_ltv_curves(spark, d).collect(), key=lambda r: r["month_offset"])
    assert [(r["cohort_year"], r["cohort_month"]) for r in rows] == [(1995, 3)] * 2
    assert [r["month_offset"] for r in rows] == [0, 1]
    assert [r["cohort_size"] for r in rows] == [1, 1]
    assert [r["cum_revenue"] for r in rows] == [100.0, 150.0]
    assert [r["ltv_per_customer"] for r in rows] == [100.0, 150.0]


def test_supplier_hhi_closed_forms(spark, tmp_path):
    """A monopoly nation reads HHI 10000; an equal-revenue duopoly 5000."""
    d = str(tmp_path / "hhi")
    spark.createDataFrame(
        [(1, "S1", 0, 0.0), (2, "S2", 1, 0.0), (3, "S3", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.parquet(f"{d}/supplier.parquet")
    spark.createDataFrame(
        [(0, "MONO", 0), (1, "DUO", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.parquet(f"{d}/nation.parquet")
    spark.createDataFrame(
        [(1, 100.0, 0.0), (2, 40.0, 0.0), (3, 40.0, 0.0)],
        "l_suppkey long, l_extendedprice double, l_discount double",
    ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")
    rows = {r["nation"]: r for r in supplier_hhi_by_nation(spark, d).collect()}
    assert rows["MONO"]["n_suppliers"] == 1
    assert rows["MONO"]["hhi"] == pytest.approx(10000.0)
    assert rows["DUO"]["n_suppliers"] == 2
    assert rows["DUO"]["hhi"] == pytest.approx(5000.0)


def test_bot_heuristic_planted_cadence(spark, tmp_path):
    """A user firing every 500 ms flags as a bot; a user on a 60 s
    cadence does not; a low-volume user is not scored at all."""
    import datetime as dt

    from golang_mapreduce_spark.operators.analytics import BOT_MIN_EVENTS

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(BOT_MIN_EVENTS):  # bot: 500 ms cadence
        eid += 1
        rows.append((eid, t0 + dt.timedelta(milliseconds=500 * i), 1, "click", 0.0, "{}"))
    for i in range(BOT_MIN_EVENTS):  # human: 60 s cadence
        eid += 1
        rows.append((eid, t0 + dt.timedelta(seconds=60 * i), 2, "click", 0.0, "{}"))
    for i in range(3):  # below the volume floor
        eid += 1
        rows.append((eid, t0 + dt.timedelta(milliseconds=100 * i), 3, "click", 0.0, "{}"))
    d = str(tmp_path / "bot")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    from golang_mapreduce_spark.operators.analytics import bot_activity_heuristic

    out = {r["user_id"]: r for r in bot_activity_heuristic(spark, d).collect()}
    assert set(out) == {1, 2}
    assert out[1]["is_bot"] and out[1]["median_gap_ms"] == 500.0
    assert not out[2]["is_bot"] and out[2]["burst_ratio"] == 0.0


def test_keyness_prefers_source_exclusive_token(spark, tmp_path):
    """A token appearing 6 times in s0 and never in s1 tops s0's
    keyness; the shared filler token never outranks it."""
    from golang_mapreduce_spark.operators.textstats import source_keyness_logodds

    d = str(tmp_path / "keyness")
    _docs(
        spark,
        d,
        [
            (0, "zebra zebra zebra zebra zebra zebra common common", "en", "s0", 1),
            (1, "common common common common common common", "en", "s1", 1),
        ],
    )
    rows = sorted(
        source_keyness_logodds(spark, d).collect(),
        key=lambda r: (r["source"], r["rank"]),
    )
    s0 = [r for r in rows if r["source"] == "s0"]
    assert s0 and s0[0]["term"] == "zebra" and s0[0]["count_in_rest"] == 0
    assert s0[0]["log_odds"] > 0


def test_context_length_closed_forms(spark, tmp_path):
    """One 50-token doc: L=32 -> 2 sequences, 14 padded; L=64 -> 1
    sequence, 14 padded; L=128 -> 1 sequence, 78 padded."""
    from golang_mapreduce_spark.operators.corpus import context_length_sensitivity

    d = str(tmp_path / "ctx")
    t50 = " ".join(f"w{i}" for i in range(50))
    _docs(spark, d, [(0, t50, "en", "s0", len(t50))])
    rows = {r["context_len"]: r for r in context_length_sensitivity(spark, d).collect()}
    assert rows[32]["total_sequences"] == 2 and rows[32]["padded_tokens"] == 14
    assert rows[64]["total_sequences"] == 1 and rows[64]["padded_tokens"] == 14
    assert rows[128]["total_sequences"] == 1 and rows[128]["padded_tokens"] == 78
    assert rows[64]["fill_ratio"] == pytest.approx(round(50 / 64, 6))


def test_kfold_audit_is_md5_recomputation(spark, tmp_path):
    """Fold counts equal a pure-Python md5 recount and each stratum's
    shares sum to 1."""
    d = str(tmp_path / "kfold")
    docs = [(i, "x", "en" if i % 2 else "fr", f"s{i % 3}", 1) for i in range(60)]
    _docs(spark, d, docs)
    rows = kfold_assignment_audit(spark, d).collect()
    from collections import Counter

    want: Counter = Counter()
    for doc_id, _, lang, src, _ in docs:
        want[(_h32(f"fold:{doc_id}") % KFOLD_K, lang, src)] += 1
    got = {(r["fold"], r["lang"], r["source"]): r["n_docs"] for r in rows}
    assert got == dict(want)
    strata: dict = {}
    for r in rows:
        strata.setdefault((r["lang"], r["source"]), []).append(r["stratum_share"])
    for shares in strata.values():
        assert sum(shares) == pytest.approx(1.0, abs=1e-5)


def test_bot_heuristic_even_gap_interpolation_both_engines(spark, tmp_path):
    """ADVICE r11: engine/oracle parity for the median hinges on Spark
    percentile() and DuckDB quantile_cont() agreeing on LINEAR
    INTERPOLATION when the middle order statistics differ — the planted
    cadences above use constant gaps, which never exercises that path.
    Plant two users whose sorted gaps have an even count with DISTINCT
    middle values (user 1: 20 distinct gaps 1000..20000 ms -> median
    10500.0; user 2: gaps cycling 1000/2000/3000/4000 ms x5 -> median
    2500.0, the ADVICE example scaled to the volume floor), run the
    Spark operator AND the DuckDB oracle on the SAME parquet, and hold
    them to the driver's own compare (rows + schema kinds + values)."""
    import datetime as dt

    import duckdb

    from golang_mapreduce_spark.operators.analytics import (
        BOT_HEURISTIC_SQL,
        BOT_MIN_EVENTS,
        bot_activity_heuristic,
    )
    from tests.oracle import compare

    assert BOT_MIN_EVENTS <= 21  # both fixtures must clear the floor
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def _user(uid, gaps_ms):
        nonlocal eid
        ts, cum = t0, 0
        eid += 1
        rows.append((eid, ts, uid, "click", 0.0, "{}"))
        for g in gaps_ms:
            cum += g
            eid += 1
            rows.append(
                (eid, t0 + dt.timedelta(milliseconds=cum), uid, "click", 0.0, "{}")
            )

    _user(1, [1000 * (i + 1) for i in range(20)])  # distinct ascending
    _user(2, [1000, 2000, 3000, 4000] * 5)  # the ADVICE 1,2,3,4 shape
    d = str(tmp_path / "bot_even")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{d}/events.parquet")

    out = {r["user_id"]: r for r in bot_activity_heuristic(spark, d).collect()}
    assert out[1]["median_gap_ms"] == 10500.0  # (10000 + 11000) / 2
    assert out[2]["median_gap_ms"] == 2500.0  # (2000 + 3000) / 2

    con = duckdb.connect()
    try:
        # Spark writes a parquet DIRECTORY; DuckDB wants the part glob
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
        )
        compare(
            bot_activity_heuristic(spark, d),
            con,
            BOT_HEURISTIC_SQL,
            name="bot_even_gaps",
        )
    finally:
        con.close()
