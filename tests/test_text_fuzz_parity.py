"""Adversarial-text parity for the text/dedup/sampling family.

The generated fixtures are well-behaved prose (min 44 chars, plain
ASCII, single spaces), so the tokenizer/segmentation edge paths —
empty text, whitespace runs, tabs and newlines, punctuation-only docs,
multibyte scripts, astral-plane emoji, exact duplicates — were only
covered implicitly.  This suite builds a deterministic adversarial
documents.parquet with the fixture schema and re-runs the full
Spark-vs-DuckDB comparison for every text-shaped oracle-backed operator
that reads only the documents table.

Deliberately absent from the corpus: the vertical tab \\x0B (Java's \\s
matches it, RE2's does not — an engine regex-dialect fork, not an
operator bug) — pinned here as documentation."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from golang_mapreduce_spark.operators import corpus, dedup, multimodal, sampling, textstats
from tests.oracle import compare

#: (text, lang) — adversarial shapes; doc_id/source/n_chars derived.
_DOCS = [
    ("", "en"),                                  # empty text
    (" ", "en"),                                 # whitespace only
    ("\t\n  \t", "en"),                          # mixed whitespace only
    ("...!!!???", "en"),                         # punctuation only
    ("word", "en"),                              # single token
    ("a  b\tc\nd", "en"),                        # runs of mixed separators
    ("One. Two! Three? Four", "en"),             # classic sentences
    ("No terminal punctuation at all", "en"),
    ("...leading. and trailing...", "en"),
    ("spark spark spark spark", "en"),           # heavy repetition
    ("the quick brown fox jumps over the lazy dog", "en"),
    ("ﬀ ligature and ümlauts über äll", "de"),   # latin-1-ish multibyte
    ("数据 处理 管道 测试", "zh"),                  # CJK tokens
    ("смесь кириллицы и latin", "ru"),           # mixed scripts
    ("emoji 😀 in 🚀 the 🌍 stream", "en"),        # astral-plane chars
    ("a.b.c.d.e.f", "en"),                       # dot-separated single run
    ("  padded   with   spaces  ", "en"),
    ("word " * 50, "en"),                        # long repetitive doc
    ("exact duplicate body", "en"),              # dup group (see below)
    ("exact duplicate body", "en"),
    ("exact duplicate body", "fr"),              # same text, other lang
    ("ALL CAPS SHOUTING DOC!!!", "en"),
    # round-11 widening: a multi-window doc (3+ sliding chunks at
    # W=32/S=16 — before this, no adversarial doc produced more than
    # one chunk), a digits-only doc (script census digit class with
    # zero letters), a Cyrillic-only doc (the mixed-script flag's
    # negative case: non-Latin WITHOUT Latin), and a genuinely
    # mixed-script doc (the flag's positive case)
    (" ".join(f"tok{i}" for i in range(80)), "en"),
    ("0123 456 789 000 42", "en"),
    ("только кириллица без латиницы", "ru"),
    ("mixed латиница and 漢字 inline", "ru"),
]

#: every oracle-backed op here reads ONLY the documents table
FAMILY = [
    (textstats, "sentence_stats"),
    (textstats, "quality_linear_score"),
    (textstats, "doc_length_histogram"),
    (textstats, "subword_sample_stats"),
    (textstats, "token_stats"),
    (textstats, "lang_doc_stats"),
    (dedup, "dedup_exact"),
    (multimodal, "blob_exact_dedup"),
    (sampling, "balance_langs_sample"),
    (sampling, "hash_sample_docs"),
    # round-8 additions: PMI over adversarial tokenization (empty docs,
    # separator runs, CJK/emoji tokens, the repetition docs that are the
    # only ones clearing min-support on a tiny corpus) and the weighted
    # reservoir (weights include n_chars=0 docs — the GREATEST(...,1)
    # guard's only live test)
    (textstats, "pmi_bigrams"),
    (sampling, "weighted_reservoir_sample"),
    # median/MAD on tiny per-lang groups: MAD=0 langs must NULL out
    # (nullif) rather than divide-by-zero under ANSI mode
    (textstats, "robust_quality_outliers"),
    # span merging over the dup group + the "word "*50 repetition doc
    (dedup, "dup_span_manifest"),
    # round-9 additions: both mergeable sketches over adversarial
    # tokenization (CJK/emoji tokens hash like any others; empty docs
    # contribute nothing), the novelty/ladder/coverage trio (empty and
    # whitespace-only docs are exactly where their guards live), vocab
    # overlap across the lang-tagged scripts, the quantile normalizer
    # (tiny per-source strata stress the permille mapping), the packing
    # manifest (zero-token docs take zero budget), and the triangle
    # counts over the dup-group near-dup graph
    (textstats, "cms_heavy_hitters"),
    (textstats, "hll_distinct_by_source"),
    (dedup, "rare_ngram_uniqueness"),
    (dedup, "normalization_ladder"),
    (textstats, "char_coverage_audit"),
    (textstats, "lang_vocab_overlap"),
    (textstats, "quality_quantile_normalize"),
    (corpus, "token_budget_pack_plan"),
    (dedup, "graph_triangle_counts"),
    # round-10 additions: the BPE merge census (multi-byte chars must
    # pair by CODE POINT identically in both engines; single-char and
    # empty tokens contribute nothing), the Zipf fit (langs with < 3
    # ranks must drop, constant-frequency langs must NULL their r²),
    # and the source JSD (a source whose docs tokenize to nothing gets
    # the disjoint-distribution reading ln 2, never a div-by-zero)
    (textstats, "bpe_merge_candidates"),
    (textstats, "zipf_slope_by_lang"),
    (textstats, "js_divergence_sources"),
    # k-core peeling over the adversarial corpus's dup-pair graph (the
    # exact-duplicate trio is the only structure that pairs at all)
    (dedup, "graph_kcore_membership"),
    # group-level split over the 3-source adversarial corpus (tiny
    # strata: some splits legitimately empty)
    (sampling, "source_level_split"),
    # per-doc keyword extraction: empty/whitespace docs emit nothing,
    # the dup trio shares df, idf-0 ties break lexicographically
    (textstats, "doc_keywords_tfidf"),
    # vocabulary growth over a corpus where early deciles may tokenize
    # to NOTHING (the cum_tokens > 0 guard's only live test)
    (textstats, "heaps_law_fit"),
    # round-11 additions: richness over sources whose docs tokenize to
    # nothing (such sources must drop, never divide by zero), the MI
    # census over the tiny lang x source contingency (empty-text docs
    # still count — MI reads labels, not text), the k-fold audit over
    # strata of size 1-2 (shares must still sum to 1 per stratum), and
    # the chunk manifest over empty/whitespace/one-token docs (n = 0
    # emits nothing; 1 <= n <= window emits exactly one chunk)
    (textstats, "hapax_richness_by_source"),
    (textstats, "mutual_information_lang_source"),
    (sampling, "kfold_assignment_audit"),
    (corpus, "rag_chunk_manifest"),
    # batch 2: the chunk-dup spectrum over the dup trio + "word "*50
    # (identical windows MUST collide), and the script census over the
    # CJK/Cyrillic/emoji docs (mixed-script flags live here; the
    # vertical-tab dialect fork is excluded by the corpus, and the
    # whitespace class is an explicit range anyway)
    (corpus, "chunk_dup_spectrum"),
    (textstats, "script_mix_audit"),
    # batch 3: keyness over a corpus where only the repetition docs
    # clear the min-count floor (smoothing must keep zero-rest tokens
    # finite), and the context-length curve over empty/one-token docs
    # (n = 0 drops; n = 1 pads L-1 tokens at every L)
    (textstats, "source_keyness_logodds"),
    (corpus, "context_length_sensitivity"),
    # round-12 addition: the shard-level dup manifest over the dup trio
    # (the only groups that can span shards) plus empty/whitespace docs
    # (trim-normalized: "" and "   " collide into ONE hash group — the
    # cross-shard path's densest case in this corpus)
    (dedup, "shard_dup_manifest"),
    # round-13 addition: the writer-layout balance audit over the same
    # corpus — the ""/"   " collision and the dup trio are the only
    # keep-one survivors that differ from raw counts, and the tiny doc
    # set leaves some hash ranges legitimately EMPTY (absent rows, not
    # zero rows, in both engines)
    (dedup, "training_shard_balance_audit"),
    # round-14 addition: the threshold sweep over a corpus whose LSH
    # candidates are exactly the dup trio (est_jaccard 1.0 pairs, so
    # the 1.00 grid row keeps them and the floor row's conditional
    # recall is 1.0) — empty/whitespace docs never reach the banding
    # (< 3 tokens), exercising the sweep's empty-selection NULLs at
    # every intermediate threshold in both engines
    (dedup, "lsh_threshold_sweep"),
]


@pytest.fixture(scope="module")
def fuzz_dir():
    d = tempfile.mkdtemp(prefix="gmrs_textfuzz_")
    table = pa.table(
        {
            "doc_id": pa.array(range(len(_DOCS)), pa.int64()),
            "text": pa.array([t for t, _ in _DOCS], pa.string()),
            "lang": pa.array([lg for _, lg in _DOCS], pa.string()),
            "source": pa.array(
                [f"src{i % 3}" for i in range(len(_DOCS))], pa.string()
            ),
            "n_chars": pa.array([len(t) for t, _ in _DOCS], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(d, "documents.parquet"))
    return d


@pytest.fixture(scope="module")
def fuzz_duck(fuzz_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{fuzz_dir}/documents.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("mod,name", FAMILY, ids=[n for _, n in FAMILY])
def test_text_fuzz_parity(mod, name, spark, fuzz_dir, fuzz_duck):
    df = mod.QUERIES[name](spark, fuzz_dir)
    compare(df, fuzz_duck, mod.ORACLES[name], name=f"fuzz:{name}")


def test_fuzz_corpus_hits_the_edges(spark, fuzz_dir, fuzz_duck):
    """The corpus must actually exercise the edges the suite claims:
    a doc with zero sentences, a doc with zero tokens, and a duplicate
    group that spans languages."""
    n_sent = fuzz_duck.execute(
        "SELECT COUNT(*) FROM documents WHERE "
        "len(list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),"
        " s -> trim(s)), s -> s <> '')) = 0"
    ).fetchone()[0]
    n_tok = fuzz_duck.execute(
        "SELECT COUNT(*) FROM documents WHERE "
        "len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) = 0"
    ).fetchone()[0]
    dup_langs = fuzz_duck.execute(
        "SELECT COUNT(DISTINCT lang) FROM documents"
        " WHERE text = 'exact duplicate body'"
    ).fetchone()[0]
    assert n_sent >= 3 and n_tok >= 3 and dup_langs == 2
