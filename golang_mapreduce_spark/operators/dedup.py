"""Deduplication operators over the ``documents`` table — the core
training-data-pipeline extension (BASELINE.json north star; absent in the
reference, whose only dedup-adjacent primitive is distinct-words-per-doc
in indexer.go:24-27).

Every tier a production corpus runs, each with a full DuckDB oracle
(cross-engine md5-derived hashing, functions/hashing.py):

* exact        — hash-groupBy on normalized text; one shuffle of
                 (hash, id), scales linearly.
* normalized   — the C4-style "fuzzy exact" tier: lower / strip
                 punctuation / collapse whitespace before the hash.
* MinHash+LSH  — shingle → 16-perm signature → 4×4 banding → bucket
                 self-join.  The scalable near-dup path: candidate pairs
                 come from bucket collisions (shuffle keyed on band
                 hash), never an all-pairs product.
* SimHash      — 60-bit hyperplane-free bit signature; near-dup =
                 small hamming distance; here we emit the signature
                 (join/bucketing is the same banding trick as MinHash).
* n-gram Jaccard — exact similarity via an inverted-index join on
                 5-gram shingles (doc-frequency of a 5-gram is tiny, so
                 the shingle join does not quadratically explode; the
                 3-gram variant at 100 TB must prune high-DF shingles
                 first or fall back to MinHash).
* semantic     — SemDeDup-style embedding dedup: IVF-blocked cosine
                 pairs → per-cluster union-find (blocked_components) →
                 keep the highest-quality member.
* incremental  — batch-vs-base triage (exact/near/novel verdicts) for
                 continuous-crawl ingest.

Clustering primitives: clusters_from (iterative min-label + adaptive
pointer doubling — any edge list) and blocked_components (one-shuffle
local union-find — block-confined edge lists only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from golang_mapreduce_spark.functions.hashing import (
    MINHASH_PRIME,
    hash32,
    minhash_seeds,
    sql_hash32,
    sql_hash60,
)
from golang_mapreduce_spark.caching import (
    release_shared_caches,
    with_shared_caches,
)
from golang_mapreduce_spark.functions.text import ws_words
from golang_mapreduce_spark.sources.fixtures import load_table

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
SEEDS = minhash_seeds(NUM_HASHES)
SIMHASH_BITS = 60
JACCARD_NGRAM = 5
JACCARD_THRESHOLD = 0.2
MINHASH_EST_THRESHOLD = 0.25


def lsh_band_config(threshold: float, n_hashes: int = NUM_HASHES) -> tuple[int, int]:
    """Choose the (bands, rows_per_band) factorization of ``n_hashes``
    whose LSH S-curve midpoint (1/b)^(1/r) sits closest to the target
    Jaccard ``threshold`` — the knob a pipeline turns when its near-dup
    definition changes, instead of hand-picking band counts.  Collision
    probability for a pair with similarity s is 1 − (1 − s^r)^b; the
    midpoint is where it crosses ~0.5, so centering it on the threshold
    balances false positives (candidate pairs the verify stage must
    discard) against false negatives (missed near-dups).  Ties prefer
    fewer bands (cheaper: fewer bucket rows per doc).  Pure function —
    both the banding plan and the tests share it."""
    best: tuple[tuple[float, int], tuple[int, int]] | None = None
    for b in range(1, n_hashes + 1):
        if n_hashes % b:
            continue
        r = n_hashes // b
        midpoint = (1.0 / b) ** (1.0 / r)
        key = (abs(midpoint - threshold), b)
        if best is None or key < best[0]:
            best = (key, (b, r))
    assert best is not None
    return best[1]


# --- exact -------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 of normalized text, keep the min doc_id per group.
    Shuffle carries only (hash, doc_id) — bytes-per-row constant no matter
    how large the documents are."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.md5(F.lower(F.trim("text"))).alias("text_hash"), "doc_id"
        )
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


DEDUP_EXACT_SQL = """
SELECT md5(lower(trim(text))) AS text_hash,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-tolerant exact dedup (the C4 / RefinedWeb "fuzzy
    exact" tier between byte-exact and MinHash): md5 over text after
    lowercasing, stripping every character outside [a-z0-9 whitespace],
    and collapsing whitespace runs — catches the re-encoded /
    re-punctuated / case-shifted copies byte-exact dedup misses, at
    exact-dedup cost.

    Cross-engine: the normalization is three regex steps both Java
    regex and RE2 evaluate identically (literal character classes, no
    locale-dependent constructs beyond lower(), identical on the
    fixture alphabets).  Scale shape: identical to dedup_exact — the
    shuffle carries (hash, doc_id) only."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9\\s]", ""),
            "\\s+",
            " ",
        )
    )
    return (
        docs.select(F.md5(norm).alias("norm_hash"), "doc_id")
        .groupBy("norm_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


DEDUP_NORMALIZED_SQL = """
SELECT md5(trim(regexp_replace(
         regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
         '\\s+', ' ', 'g'))) AS norm_hash,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


# --- MinHash -----------------------------------------------------------

def _shingles(n: int) -> F.Column:
    """Word n-gram shingle array from the whitespace-token array `toks`."""
    joins = ", ".join(f"toks[i + {k}]" for k in range(n))
    return F.expr(
        f"transform(sequence(0, size(toks) - {n}), i -> concat_ws(' ', {joins}))"
    )


def _signatures_from(docs: DataFrame) -> DataFrame:
    """(doc_id, m0..m15) minhash columns over 3-gram shingles of any
    (doc_id, text) relation.  One explode + one groupBy with 16 algebraic
    min aggregates — partial aggregation applies, so the shuffle carries
    16 longs per doc per map partition."""
    sh = (
        docs.select("doc_id", ws_words("text").alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", F.explode(_shingles(3)).alias("s"))
        .select("doc_id", hash32("s").alias("h"))
    )
    aggs = [
        F.min(F.expr(f"({a} * h + {b}) % {MINHASH_PRIME}")).alias(f"m{i}")
        for i, (a, b) in enumerate(SEEDS)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _signatures_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _signatures_from(load_table(spark, sf_dir, "documents"))


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-perm MinHash signature per document (comma-joined string for
    oracle comparison)."""
    sig = _signatures_df(spark, sf_dir)
    return sig.select(
        "doc_id",
        F.concat_ws(",", *[F.col(f"m{i}").cast("string") for i in range(NUM_HASHES)]).alias(
            "sig"
        ),
    )


def _sql_seed_lists() -> tuple[str, str]:
    a_list = ", ".join(str(a) for a, _ in SEEDS)
    b_list = ", ".join(str(b) for _, b in SEEDS)
    return f"[{a_list}]", f"[{b_list}]"


def _sql_signature_cte(src: str = "documents") -> str:
    """Shared oracle CTEs computing (doc_id, i, mv) minhash rows over any
    (doc_id, text) relation ``src``."""
    a_list, b_list = _sql_seed_lists()
    return f"""
toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM {src}
),
sh AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
  WHERE len(t) >= 3
),
hashes AS (
  SELECT doc_id, {sql_hash32('s')} AS h FROM sh
),
seeds AS (
  SELECT unnest({a_list}) AS a, unnest({b_list}) AS b,
         unnest(generate_series(1, {NUM_HASHES})) AS i
),
mh AS (
  SELECT doc_id, i, MIN((a * h + b) % {MINHASH_PRIME}) AS mv
  FROM hashes, seeds
  GROUP BY doc_id, i
)"""


MINHASH_SIG_SQL = f"""
WITH {_sql_signature_cte()}
SELECT doc_id, string_agg(mv::VARCHAR, ',' ORDER BY i) AS sig
FROM mh
GROUP BY doc_id
"""


#: Per-row band-struct expression over a ``sig`` array column — shared
#: by the batch banding and the streaming (stateless) ingest path.
BAND_STRUCT_EXPR = (
    f"transform(sequence(0, {BANDS - 1}), "
    f"b -> struct(b AS band, concat_ws(',', transform(slice(sig, b * {ROWS_PER_BAND} + 1, {ROWS_PER_BAND}), x -> CAST(x AS STRING))) AS bkey))"
)


def _bands_from(sig: DataFrame) -> DataFrame:
    """Explode a (doc_id, sig array) relation into its LSH band-bucket
    rows (doc_id, band, bkey) — shared by the single-scan pair join and
    the materialized-base incremental path."""
    return sig.select(
        "doc_id",
        F.explode(F.expr(BAND_STRUCT_EXPR)).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))


def _pairs_from_sig(sig: DataFrame) -> DataFrame:
    """Banding + scoring over a PERSISTED (doc_id, sig array) relation —
    the LSH tail shared by :func:`minhash_pairs_from` (which builds the
    signatures from text) and :func:`minhash_calibration` (which derives
    them from its already-materialized distinct shingle-hash relation,
    r16).  ``sig`` must be persisted by the caller: it feeds three
    branches (banding + both sides of the pair-scoring join)."""
    bands = _bands_from(sig)

    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    scored = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
                / F.lit(float(NUM_HASHES))
            ).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= MINHASH_EST_THRESHOLD)
    )
    # Lifecycle handle (ADVICE r8): callers that materialize eagerly
    # (neardup_pagerank's checkpoint) can release the shared signature
    # cache instead of leaking it for the session; lazy callers leave it
    # for the harness-owned clearCache (bench.timed / parity sweep).
    return with_shared_caches(scored, sig)


def minhash_pairs_from(docs: DataFrame) -> DataFrame:
    """LSH candidate pairs over any (doc_id, text) relation: band the
    16-value signature into 4 bands of 4; docs sharing any band bucket
    are candidates; keep pairs whose estimated Jaccard (matching
    signature positions / 16) clears the threshold.

    Scale shape: bucket join shuffles on (band, band_key) — collisions,
    not cross products.  The signature re-join to score pairs is two
    hash joins on doc_id."""
    from pyspark.storagelevel import StorageLevel

    # the signature subtree feeds three branches (banding + both sides of
    # the pair scoring join); persist it so it's computed once, exactly
    # as a production pipeline materializes signatures before LSH.
    sig = (
        _signatures_from(docs)
        .select("doc_id", F.array(*[f"m{i}" for i in range(NUM_HASHES)]).alias("sig"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return _pairs_from_sig(sig)


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_pairs_from(load_table(spark, sf_dir, "documents"))


#: Spark-SQL fragment computing hash32 inside a lambda (hashing.hash32's
#: Column form can't be referenced from transform()'s lambda scope).
_H32_LAMBDA = "CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)"


def rowwise_hashes(sh_col: str = "sh") -> F.Column:
    """Per-row hash32 of every shingle in a shingle-array column (the
    intermediate for :func:`rowwise_signature` — hash once, fold 16
    minima over the hashed array)."""
    return F.expr(f"transform({sh_col}, s -> {_H32_LAMBDA})")


def rowwise_signature(hs_col: str = "hs") -> F.Column:
    """The 16-perm MinHash signature as ONE per-row expression over a
    hashed-shingle array column (:func:`rowwise_hashes`) — no explode,
    no shuffle, no state: the streaming-safe form of
    :func:`_signatures_from` (identical values;
    tests/test_streaming_triage.py pins the equivalence).  NULL for
    empty shingle arrays, mirroring the batch form's >=3-token gate."""
    mins = ", ".join(
        f"array_min(transform({hs_col}, x -> ({a} * x + {b}) % {MINHASH_PRIME}))"
        for a, b in SEEDS
    )
    return F.expr(f"CASE WHEN size({hs_col}) > 0 THEN array({mins}) END")


def minhash_pairs_sql(src: str = "documents") -> str:
    """Full LSH candidate-pair oracle SQL over any (doc_id, text)
    relation ``src`` — embeddable as a CTE body in larger pipelines."""
    return f"""
WITH {_sql_signature_cte(src)},
sig AS (
  SELECT doc_id, list(mv ORDER BY i) AS sig FROM mh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b AS band,
         array_to_string(list_slice(sig, b * {ROWS_PER_BAND} + 1, (b + 1) * {ROWS_PER_BAND}), ',') AS bkey
  FROM sig, (SELECT unnest(generate_series(0, {BANDS - 1})) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       len(list_filter(generate_series(1, {NUM_HASHES}),
                       i -> sa.sig[i] = sb.sig[i])) / {NUM_HASHES}.0 AS est_jaccard
FROM cand
JOIN sig sa ON sa.doc_id = doc_a
JOIN sig sb ON sb.doc_id = doc_b
WHERE len(list_filter(generate_series(1, {NUM_HASHES}),
                      i -> sa.sig[i] = sb.sig[i])) / {NUM_HASHES}.0 >= {MINHASH_EST_THRESHOLD}
"""


DEDUP_MINHASH_PAIRS_SQL = minhash_pairs_sql()


# --- SimHash -----------------------------------------------------------

def minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate-vs-truth audit for the MinHash detector: for every LSH
    candidate pair, the signature-agreement estimate next to the EXACT
    Jaccard over the same distinct 3-gram hash space the signatures
    minimize over, plus the absolute error — the calibration table that
    justifies (or re-tunes) MINHASH_EST_THRESHOLD and the band layout.

    Scale shape: the estimate side is the banded LSH join (collisions
    only); the exact side anchors on the CANDIDATE PAIRS FIRST — join
    each pair to A's shingle hashes, then probe B's on (doc_b, h) — so
    intersection work is O(candidates × shingles-per-doc), linear in the
    candidate count.  (The tempting alternative, a full inverted-index
    self-join followed by restriction, computes |A∩B| for every pair
    sharing ANY shingle: on a duplicate-heavy corpus that is quadratic
    in the duplication factor — it filled the disk on the 100x
    replicated probe before this was restructured.)  A band collision
    without a shared shingle is possible (min collisions), so shared
    counts coalesce to 0."""
    from pyspark.storagelevel import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    # ONE tokenization (r16): the estimate side's signatures derive from
    # the SAME persisted distinct (doc_id, h) shingle-hash relation the
    # exact side probes — MIN over a multiset equals MIN over its
    # distinct set, so min((a*h + b) % P) over doc_sh is value-identical
    # to _signatures_from's fold over every shingle occurrence (pinned
    # in tests/test_round16_opt.py).  The old form ran the tokenize +
    # explode + md5 pass twice (once inside minhash_pairs_from, once for
    # doc_sh); at 100 TB that is a second full text scan saved.
    # Pre-partitioned on doc_id BEFORE the distinct (r17, VERDICT r16
    # #1): HashPartitioning(doc_id) satisfies the distinct's
    # (doc_id, h) clustering AND both downstream doc_id re-groups (sig,
    # sizes), so the relation is shuffled exactly once — the r16 form
    # shuffled the occurrence stream on (doc_id, h) and then re-shuffled
    # the persisted rows twice more.  Map-side pre-dedup is the only
    # loss, and within-doc duplicate trigrams are rare at every SF.
    doc_sh = (
        docs.select("doc_id", ws_words("text").alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", F.explode(_shingles(3)).alias("s"))
        .select("doc_id", hash32("s").alias("h"))
        .repartition("doc_id")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    aggs = [
        F.min(F.expr(f"({a} * h + {b}) % {MINHASH_PRIME}")).alias(f"m{i}")
        for i, (a, b) in enumerate(SEEDS)
    ]
    sig = (
        doc_sh.groupBy("doc_id")
        .agg(*aggs)
        .select(
            "doc_id",
            F.array(*[f"m{i}" for i in range(NUM_HASHES)]).alias("sig"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # `est` feeds two branches (the pair anchor below and the final
    # left join); without its own persist the banding self-join +
    # scoring joins would run twice per action.
    est = _pairs_from_sig(sig).persist(StorageLevel.MEMORY_AND_DISK)
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pairs = est.select("doc_a", "doc_b")
    sa = doc_sh.select(F.col("doc_id").alias("doc_a"), "h")
    sb = doc_sh.select(F.col("doc_id").alias("doc_b"), "h")
    common = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    exact = (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("exact_jaccard"),
        )
    )
    ej = F.coalesce(F.col("exact_jaccard"), F.lit(0.0))
    out = est.join(exact, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        "est_jaccard",
        ej.alias("exact_jaccard"),
        F.round(F.abs(F.col("est_jaccard") - ej), 6).alias("abs_err"),
    )
    # Lifecycle handles (the minhash_pairs_from convention): ALL THREE
    # persists this op registers — its own est cache, the signature
    # cache nested inside it (with_shared_caches propagates the nested
    # handle automatically), and the shared distinct shingle-hash
    # relation both sides now read (r16).
    return with_shared_caches(out, est, doc_sh)


MINHASH_CALIBRATION_SQL = f"""
WITH est AS (
  {minhash_pairs_sql("documents").strip()}
),
toks3 AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
sh3 AS (
  SELECT DISTINCT doc_id,
         {sql_hash32("t[i] || ' ' || t[i+1] || ' ' || t[i+2]")} AS h
  FROM toks3, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
  WHERE len(t) >= 3
),
sizes3 AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh3 GROUP BY doc_id
),
common3 AS (
  -- candidate-anchored intersection: pairs first, then A's shingles,
  -- then probe B's on (doc_b, h) — mirrors the engine's restructure
  SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
  FROM (SELECT doc_a, doc_b FROM est) p
  JOIN sh3 a ON a.doc_id = p.doc_a
  JOIN sh3 b ON b.doc_id = p.doc_b AND b.h = a.h
  GROUP BY 1, 2
),
exact AS (
  SELECT doc_a, doc_b,
         ROUND(CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common), 6)
           AS exact_jaccard
  FROM common3
  JOIN sizes3 na ON na.doc_id = doc_a
  JOIN sizes3 nb ON nb.doc_id = doc_b
)
SELECT est.doc_a, est.doc_b, est.est_jaccard,
       COALESCE(exact.exact_jaccard, 0.0) AS exact_jaccard,
       ROUND(ABS(est.est_jaccard - COALESCE(exact.exact_jaccard, 0.0)), 6)
         AS abs_err
FROM est LEFT JOIN exact USING (doc_a, doc_b)
"""


#: pair_review_sample: audit rows kept per estimated-similarity decile.
REVIEW_PER_DECILE = 3


def pair_review_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic human-review sample of the near-dup detector's
    output, stratified by estimated-similarity decile: up to
    {REVIEW_PER_DECILE} candidate pairs per decile of est_jaccard,
    chosen by a salted hash of the pair ids (not head()/LIMIT, which
    would sample whatever partition finishes first), each row carrying
    the estimate AND the exact Jaccard.  This is the labeling-queue
    feed every production dedup pipeline runs: precision is audited
    where the detector is UNSURE (middle deciles), not where it is
    trivially right, and the deterministic salt makes the queue
    reproducible across reruns and engines.

    Scale shape: minhash_calibration's dataflow (banded candidates +
    candidate-anchored exact intersections) plus one window over a
    <=10-key partition column; the window input is already the
    candidate relation (ids + two doubles), and per-decile row_number
    needs no global sort — partial TopK per decile would be the 100 TB
    materialization, and the decile key bounds the skew."""
    cal = minhash_calibration(spark, sf_dir)
    keyed = cal.select(
        "doc_a",
        "doc_b",
        "est_jaccard",
        "exact_jaccard",
        F.least(F.floor(F.col("est_jaccard") * 10), F.lit(9))
        .cast("int")
        .alias("decile"),
        hash32(
            F.concat_ws(":", F.lit("rev"), F.col("doc_a"), F.col("doc_b"))
        ).alias("skey"),
    )
    w = Window.partitionBy("decile").orderBy("skey", "doc_a", "doc_b")
    out = (
        keyed.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= REVIEW_PER_DECILE)
        .select(
            "decile", "sample_rank", "doc_a", "doc_b",
            "est_jaccard", "exact_jaccard",
        )
    )
    return with_shared_caches(out, cal)


PAIR_REVIEW_SQL = f"""
WITH cal AS (
  {MINHASH_CALIBRATION_SQL.strip()}
),
keyed AS (
  SELECT doc_a, doc_b, est_jaccard, exact_jaccard,
         CAST(LEAST(FLOOR(est_jaccard * 10), 9) AS INT) AS decile,
         {sql_hash32("'rev' || ':' || CAST(doc_a AS VARCHAR) || ':' || CAST(doc_b AS VARCHAR)")} AS skey
  FROM cal
)
SELECT decile, sample_rank, doc_a, doc_b, est_jaccard, exact_jaccard FROM (
  SELECT decile, doc_a, doc_b, est_jaccard, exact_jaccard,
         ROW_NUMBER() OVER (PARTITION BY decile ORDER BY skey, doc_a, doc_b)
           AS sample_rank
  FROM keyed
)
WHERE sample_rank <= {REVIEW_PER_DECILE}
"""


def dup_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the near-dup graph (degree → doc count,
    degree 0 included): the connectivity pre-flight next to
    minhash_band_stats.  Band stats predict the JOIN's cost; the degree
    histogram predicts the CLUSTERING's — a heavy-tailed degree
    distribution (boilerplate hubs, mirrored templates) is what makes
    connected components percolate into giant clusters and keep-one
    dedup delete entire sources, so pipelines gate the CC stage on
    max-degree/hub-mass readouts exactly like this one.

    Scale shape: the pair relation is the banded LSH join (ids only);
    degrees are one partial-agg'd exchange on doc_id over the exploded
    endpoints; the zero-degree mass comes from a left join against the
    ids-only corpus projection; the final aggregate keys on the tiny
    distinct-degree domain."""
    docs = load_table(spark, sf_dir, "documents")
    pairs_full = minhash_pairs_from(docs.select("doc_id", "text"))
    pairs = pairs_full.select("doc_a", "doc_b")
    ends = pairs.select(F.col("doc_a").alias("doc_id")).unionAll(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count("*").alias("d"))
    alldeg = (
        docs.select("doc_id")
        .join(deg, "doc_id", "left")
        .select(F.coalesce("d", F.lit(0)).cast("bigint").alias("degree"))
    )
    return with_shared_caches(
        alldeg.groupBy("degree").agg(F.count("*").alias("n_docs")), pairs_full
    )


DUP_GRAPH_DEGREE_SQL = f"""
WITH pairs AS (
  {minhash_pairs_sql("documents").strip()}
),
ends AS (
  SELECT doc_a AS doc_id FROM pairs
  UNION ALL
  SELECT doc_b AS doc_id FROM pairs
),
deg AS (
  SELECT doc_id, COUNT(*) AS d FROM ends GROUP BY doc_id
)
SELECT CAST(COALESCE(deg.d, 0) AS BIGINT) AS degree, COUNT(*) AS n_docs
FROM documents doc LEFT JOIN deg ON deg.doc_id = doc.doc_id
GROUP BY 1
"""


#: PageRank over the near-dup graph: damping factor and iteration count.
#: 3 fixed iterations — hub scores for gating/review, not a convergence
#: run; fixed depth keeps the plan static (no driver-side convergence
#: action) and the oracle expressible as chained CTEs.
PAGERANK_D = 0.85
PAGERANK_ITERS = 3


def neardup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-hub ranking: PageRank (3 unrolled iterations, d=0.85,
    no dangling redistribution — isolated docs settle at 1-d) over the
    symmetrized near-dup LSH pair graph.  Degree says how many
    neighbors a doc has; PageRank says how CENTRAL it is in the
    template/boilerplate web — the review-queue ordering for "which doc
    is the canonical source of this duplication mass", complementing
    dup_graph_degree_stats (the histogram gate) with a per-doc score.

    Iterative-algorithm shape on DataFrames: each iteration is one
    join of the ids-only edge list to the current rank vector plus one
    partial-agg'd exchange on the destination — the edges relation is
    materialized ONCE via an eager ``localCheckpoint`` and reused by
    all iterations (what GraphX/Pregel do under the hood).  Fixed
    iteration count => static unrolled plan, linear in |E| per
    iteration at any scale.  A checkpoint, not ``persist()``, because
    the operator cannot unpersist a lazily-cached relation it hands
    downstream: a CacheManager entry would outlive the query and leak
    the LSH pair relation for the whole session (ADVICE r8).  The
    checkpointed blocks are owned by the returned DataFrame's lineage
    and reclaimed automatically by Spark's ContextCleaner once the
    caller drops the result.  On a real cluster with executor churn,
    swap for a reliable ``checkpoint()`` (HDFS/S3 checkpoint dir) —
    same lifecycle, fault-tolerant lineage cut.

    Cross-engine determinism: per-edge contributions are double
    divisions of engine-identical inputs rounded to 9 dp and cast to
    DECIMAL(19,9), so the per-node SUM is exact (order-free); the
    damping update is then arithmetic on engine-identical doubles."""
    docs = load_table(spark, sf_dir, "documents")
    pairs_scored = minhash_pairs_from(docs.select("doc_id", "text"))
    pairs = pairs_scored.select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)
    deg = edges_deg.select("src", "d").distinct()  # reuse the cut lineage
    # the checkpoint already ran the banding job, so the shared
    # signature cache minhash_pairs_from registered is dead weight now
    release_shared_caches(pairs_scored)

    nodes = docs.select("doc_id")
    ranks = nodes.select("doc_id", F.lit(1.0).alias("r"))
    for _ in range(PAGERANK_ITERS):
        contrib = edges_deg.join(
            ranks, edges_deg.src == ranks.doc_id
        ).select(
            "dst",
            F.round(F.col("r") / F.col("d"), 9).cast("decimal(19,9)").alias("c"),
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").cast("double").alias("s"))
        ranks = nodes.join(sums, nodes.doc_id == sums.dst, "left").select(
            "doc_id",
            F.round(
                F.lit(1.0 - PAGERANK_D)
                + F.lit(PAGERANK_D) * F.coalesce("s", F.lit(0.0)),
                9,
            ).alias("r"),
        )
    return ranks.join(deg, ranks.doc_id == deg.src, "left").select(
        "doc_id",
        F.coalesce("d", F.lit(0)).cast("bigint").alias("degree"),
        F.round("r", 6).alias("pagerank"),
    )


def _pagerank_iter_ctes() -> str:
    ctes = []
    prev = "r0"
    for i in range(1, PAGERANK_ITERS + 1):
        ctes.append(f"""c{i} AS (
  SELECT e.dst, CAST(ROUND(r.r / e.d, 9) AS DECIMAL(19,9)) AS c
  FROM edges_deg e JOIN {prev} r ON r.doc_id = e.src
),
r{i} AS (
  SELECT n.doc_id,
         ROUND({1.0 - PAGERANK_D} + {PAGERANK_D} * COALESCE(CAST(s.s AS DOUBLE), 0.0), 9) AS r
  FROM documents n
  LEFT JOIN (SELECT dst, SUM(c) AS s FROM c{i} GROUP BY dst) s ON s.dst = n.doc_id
)""")
        prev = f"r{i}"
    return ",\n".join(ctes)


NEARDUP_PAGERANK_SQL = f"""
WITH pairs AS (
  {minhash_pairs_sql("documents").strip()}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (
  SELECT src, COUNT(*) AS d FROM edges GROUP BY src
),
edges_deg AS (
  SELECT e.src, e.dst, deg.d FROM edges e JOIN deg ON deg.src = e.src
),
r0 AS (
  SELECT doc_id, CAST(1.0 AS DOUBLE) AS r FROM documents
),
{_pagerank_iter_ctes()}
SELECT n.doc_id,
       CAST(COALESCE(deg.d, 0) AS BIGINT) AS degree,
       ROUND(r{PAGERANK_ITERS}.r, 6) AS pagerank
FROM documents n
JOIN r{PAGERANK_ITERS} ON r{PAGERANK_ITERS}.doc_id = n.doc_id
LEFT JOIN deg ON deg.src = n.doc_id
"""


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document: for each bit b, the sign of
    sum(+1/-1 over word hashes' bit b) sets the output bit.  One explode
    + one groupBy with 60 algebraic sums — partial-agg friendly."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(ws_words("text")).alias("w")).select(
        "doc_id",
        F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("bigint").alias("h"),
    )
    sums = [
        F.sum(
            F.expr(f"CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1 ELSE -1 END")
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    combine = " + ".join(
        f"CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(SIMHASH_BITS)
    )
    return (
        words.groupBy("doc_id")
        .agg(*sums)
        .select("doc_id", F.expr(combine).alias("simhash"))
    )


SIMHASH_SQL = f"""
WITH words AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS w
  FROM documents
),
hashes AS (
  SELECT doc_id, {sql_hash60('w')} AS h FROM words
),
bit_sums AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hashes, (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
FROM bit_sums
GROUP BY doc_id
"""


#: Hamming radius for simhash near-dup candidate pairs.  With the 60-bit
#: signature split into 4 bands of 15 bits, any pair within Hamming
#: distance 3 agrees exactly on >=1 band (pigeonhole: 3 flipped bits
#: cannot touch all 4 bands), so band-collision candidates have PERFECT
#: recall at this radius — banding is a pruning step, not an
#: approximation.
SIMHASH_HAMMING_K = 3
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
_BAND_MASK = (1 << SIMHASH_BAND_BITS) - 1


def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance <= 3, found via
    band-collision join — the Manku/Jain/Sarma web-dedup shape.

    Each 60-bit signature explodes into 4 (band, 15-bit value) keys; the
    self-join runs on (band, value) equality only — never all-pairs —
    and the exact Hamming check (bit_count of xor) runs on the collision
    survivors.  Scale: signature table is one row per doc; the band join
    shuffles 4 small keyed rows per doc; collisions beyond true
    near-dups are ~|docs|^2 / 2^15 per band, vanishing once doc count
    per band value stays bounded (at web scale, use more/wider bands —
    the same pigeonhole arithmetic picks bands = K+1)."""
    sigs = simhash_signatures(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.expr(
                            f"shiftright(simhash, {i * SIMHASH_BAND_BITS})"
                            f" & {_BAND_MASK}"
                        ).alias("bval"),
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bd"),
    ).select("doc_id", "simhash", "bd.band", "bd.bval")
    a, b = bands.alias("a"), bands.alias("b")
    out = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("int").alias("hamming"),
        )
        .distinct()  # a pair may collide in several bands
        .where(F.col("hamming") <= SIMHASH_HAMMING_K)
    )
    return with_shared_caches(out, sigs)


SIMHASH_NEARDUP_SQL = f"""
WITH sigs AS (
  {SIMHASH_SQL.strip()}
),
bands AS (
  SELECT doc_id, simhash, i AS band,
         (simhash >> (i * {SIMHASH_BAND_BITS})) & {_BAND_MASK} AS bval
  FROM sigs, (SELECT unnest(generate_series(0, {SIMHASH_BANDS - 1})) AS i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= {SIMHASH_HAMMING_K}
"""


# --- exact n-gram Jaccard ----------------------------------------------

def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard similarity on distinct 5-gram shingles via an
    inverted-index self-join: pairs sharing a shingle -> |A∩B| counts ->
    |A∪B| = |A|+|B|-|A∩B|.

    5-grams keep per-shingle document frequency near 1, so the join
    output is ~linear; that is the property that makes this exact method
    survive scale-up (3-grams would need high-DF pruning or MinHash)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.storagelevel import StorageLevel

    # (doc, shingle) feeds the self-join twice plus the size aggregate —
    # persist so the tokenize/explode/distinct runs once.
    doc_sh = (
        docs.select("doc_id", ws_words("text").alias("toks"))
        .where(F.size("toks") >= JACCARD_NGRAM)
        .select("doc_id", F.explode(_shingles(JACCARD_NGRAM)).alias("s"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = doc_sh.alias("a")
    b = doc_sh.alias("b")
    common = (
        a.join(b, "s")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return with_shared_caches(out, doc_sh)


NGRAM_JACCARD_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
doc_sh AS (
  SELECT DISTINCT doc_id,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS s
  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS g(i)
  WHERE len(t) >= {JACCARD_NGRAM}
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM doc_sh GROUP BY doc_id
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM doc_sh a JOIN doc_sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE ROUND(CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common), 6) >= {JACCARD_THRESHOLD}
"""


PRUNED_NGRAM = 3
PRUNED_MAX_DF = 20
PRUNED_THRESHOLD = 0.5


def ngram_jaccard_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-gram variant of exact Jaccard WITH high-document-frequency
    shingle pruning — the caveat the 5-gram query's docstring names, made
    real.  Shingles appearing in more than {max_df} documents are dropped
    BEFORE the inverted-index self-join, capping its per-shingle fan-out
    at C(max_df, 2) pairs; intersection AND union sizes are computed on
    the pruned sets, so the score is exactly replicable (it approximates
    true Jaccard from below for docs sharing only stop-shingles, the
    standard trade: stop-shingles carry no dedup signal).

    At 100 TB the DF side is one extra groupBy over (shingle) with a
    HAVING — linear, partial-agg friendly — and the pruning is what keeps
    3-gram inverted indexes from quadratic blow-up on boilerplate."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.storagelevel import StorageLevel

    doc_sh_all = (
        docs.select("doc_id", ws_words("text").alias("toks"))
        .where(F.size("toks") >= PRUNED_NGRAM)
        .select("doc_id", F.explode(_shingles(PRUNED_NGRAM)).alias("s"))
        .distinct()
    )
    rare = doc_sh_all.groupBy("s").agg(F.count("*").alias("df")).where(
        F.col("df") <= PRUNED_MAX_DF
    )
    doc_sh = (
        doc_sh_all.join(rare.select("s"), "s")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = doc_sh.alias("a")
    b = doc_sh.alias("b")
    common = (
        a.join(b, "s")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= PRUNED_THRESHOLD)
    )
    return with_shared_caches(out, doc_sh)


NGRAM_JACCARD_PRUNED_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
doc_sh_all AS (
  SELECT DISTINCT doc_id,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
  WHERE len(t) >= {PRUNED_NGRAM}
),
rare AS (
  SELECT s FROM doc_sh_all GROUP BY s HAVING COUNT(*) <= {PRUNED_MAX_DF}
),
doc_sh AS (
  SELECT doc_id, d.s FROM doc_sh_all d JOIN rare r ON d.s = r.s
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM doc_sh GROUP BY doc_id
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM doc_sh a JOIN doc_sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE ROUND(CAST(n_common AS DOUBLE) / (na.n_sh + nb.n_sh - n_common), 6) >= {PRUNED_THRESHOLD}
"""


# --- near-dup clustering (iterative) -----------------------------------

def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash candidate-pair graph:
    every document in a near-dup pair gets its component's minimum doc_id
    as cluster id — the canonicalization step that turns pairwise dedup
    into keep-one-per-cluster.

    Implementation is iterative min-label propagation WITH POINTER
    DOUBLING (driver-side loop over DataFrame joins, state persisted per
    round; only a 1-row convergence count ever reaches the driver) —
    see :func:`clusters_from` for the round structure and the O(log
    diameter) convergence argument.  The oracle replicates it with a
    recursive CTE."""
    pairs_full = dedup_minhash_pairs(spark, sf_dir)
    out = clusters_from(pairs_full.select("doc_a", "doc_b"))
    # out already carries the CC final-state handle; add the signature
    # cache nested in the pair relation (the projection above drops it)
    return with_shared_caches(out, pairs_full)


#: Rounds of plain (jump-free) propagation before escalating to pointer
#: doubling.  Real near-dup pair graphs are unions of small dense
#: components (measured: the sf0.1 MinHash graph converges in 2 rounds),
#: so the common case should pay zero extra joins; 4 plain rounds cover
#: diameter <= 4 at that cost before the doubling phase takes over.
CC_PLAIN_ROUNDS = 4


def clusters_from(pairs: DataFrame, stats: dict | None = None) -> DataFrame:
    """Connected components over any (doc_a, doc_b) edge list: min-label
    propagation, escalating to pointer doubling for deep graphs.

    Phase 1 (rounds 1..{CC_PLAIN_ROUNDS}) is plain edge relaxation —
    ``label <- min(label, labels of neighbors)`` — with TWO rounds
    materialized per driver action (the convergence count is the only
    action; per-round scheduler latency dominates at low SF, and
    monotone min-propagation makes the worst case one extra cheap
    round).  Measured on the sf0.1 MinHash pair graph this phase alone
    converges in 2 rounds / 1 action; an unconditional per-round jump
    step benchmarked 2.1x slower (6.5 s vs 3.0 s warm) for zero round
    savings, which is why doubling is an escalation, not the default.

    Phase 2 (any round after {CC_PLAIN_ROUNDS}) adds a synchronous
    pointer jump — ``label <- min(label, prev_round_label[label])`` (the
    hash-to-min / pointer-doubling family of MapReduce CC algorithms,
    Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14).  The jump reads the PREVIOUS round's persisted label
    table (materialized by phase 2's per-round convergence action), so
    it costs one extra hash join against a cached relation and no
    recomputation.  Reach toward the component minimum roughly doubles
    per round, so a diameter-d chain needs O(log d) doubling rounds —
    the 20-round cap supports diameters around 2^16, where plain
    propagation alone silently under-merged anything deeper than its
    round cap (the bug tests/test_pointer_doubling.py pins).

    Invariant kept by both steps: ``label[x]`` is a node id inside x's
    component with ``label[x] <= x``; values only decrease and are
    bounded below by the component min, and the unique fixpoint assigns
    every node its component's minimum id — identical output either
    way, so the recursive-CTE oracle is unchanged.

    Resource hygiene for long chains: each round's state is cached, the
    previous round's cache is dropped at the next materialization, and
    lineage is truncated with ``localCheckpoint`` every 5 rounds so the
    plan never accumulates a 20-join tree.

    ``stats``, when given, receives ``{"rounds": n, "actions": m}``
    after the run (observability for the round-count regression test)."""
    from pyspark.storagelevel import StorageLevel

    edges = (
        pairs.union(pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = edges.select(F.col("doc_a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    pending = [labels]  # caches to drop at the next materialization point
    rounds = actions = 0
    for rnd in range(20):  # doubling phase extends coverage to ~2^16
        rounds += 1
        doubling = rnd >= CC_PLAIN_ROUNDS
        # (1) edge relaxation: min over neighbors' current labels
        nbr_min = (
            edges.join(labels, edges.doc_b == labels.node)
            .groupBy(F.col("doc_a").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.join(nbr_min, labels.node == nbr_min.node2, "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least("label", F.coalesce("nbr_label", F.col("label"))).alias("mid_label"),
            )
        )
        if doubling:
            # (2) pointer jump through the previous round's cached
            # table; mid_label is always a node id, so the lookup hits
            ptr = labels.select(
                F.col("node").alias("pnode"), F.col("label").alias("plabel")
            )
            stepped = stepped.join(
                ptr, stepped.mid_label == ptr.pnode, "left"
            ).select(
                "node",
                "old_label",
                F.least(
                    "mid_label", F.coalesce("plabel", F.col("mid_label"))
                ).alias("mid_label"),
            )
        new_labels = stepped.select(
            "node",
            F.col("mid_label").alias("label"),
            (F.col("old_label") != F.col("mid_label")).cast("int").alias("changed"),
        )
        checkpoint_round = (rnd + 1) % 5 == 0
        if checkpoint_round:
            # eager localCheckpoint: stores partitions AND cuts lineage
            new_labels = new_labels.localCheckpoint()
        else:
            new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
        pending.append(new_labels)
        labels = new_labels.select("node", "label")
        # Phase 1 checks every SECOND round (two propagation steps per
        # job); phase 2 checks every round — the jump step consumes the
        # previous round's labels twice, so each doubling round must
        # materialize before the next or the lineage recomputes it.
        if doubling or rnd % 2 == 1 or checkpoint_round or rnd == 19:
            actions += 1
            n_changed = new_labels.agg(F.sum("changed")).collect()[0][0]
            for c in pending[:-1]:  # materialized: earlier caches can go
                c.unpersist()
            pending = [new_labels]
            if not n_changed:
                break

    if stats is not None:
        stats["rounds"] = rounds
        stats["actions"] = actions
    # every loop exit follows a materializing action, so the returned
    # labels read from their own cache/checkpoint — the edge cache is
    # dead weight from here and would otherwise leak for the session
    edges.unpersist()
    out = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    # Expose the surviving final-round cache (r15, VERDICT r14 #4): the
    # result reads from it, so composing operators must account for it.
    # On a localCheckpoint exit round the state is RDD blocks the catalog
    # cannot release — with_shared_caches correctly exposes nothing then.
    return with_shared_caches(out, new_labels)


def cc_walk_sql(pairs_cte: str, prefix: str = "") -> str:
    """Connected-components recursive CTE block over a pairs relation
    exposing (doc_a, doc_b) — the SQL twin of :func:`clusters_from`,
    shared by every oracle that composes clustering.  Yields the
    ``edges``/``walk`` CTEs plus a final ``clusters(doc_id,
    cluster_id)``; the enclosing statement must be WITH RECURSIVE.
    ``prefix`` renames all three CTEs so two independent CC walks (e.g.
    the text near-dup graph and the semantic graph) can coexist in one
    composed oracle."""
    return f"""{prefix}edges(a, b) AS (
  SELECT doc_a, doc_b FROM {pairs_cte}
  UNION
  SELECT doc_b, doc_a FROM {pairs_cte}
),
{prefix}walk(node, label) AS (
  SELECT a, a FROM {prefix}edges
  UNION
  SELECT e.b, w.label FROM {prefix}walk w JOIN {prefix}edges e ON e.a = w.node
),
{prefix}clusters AS (
  SELECT node AS doc_id, MIN(label) AS cluster_id FROM {prefix}walk GROUP BY node
)"""


NEARDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
  {DEDUP_MINHASH_PAIRS_SQL.strip()}
),
{cc_walk_sql('pairs')}
SELECT doc_id, cluster_id FROM clusters
"""


#: Words per "paragraph" chunk.  Fixture texts are flat word streams
#: (no newlines), so paragraph granularity is a fixed word stride; 4 is
#: small enough that the 31-word fixture vocabulary produces real
#: cross-document chunk collisions (~430 of ~7000 chunks at sf0.01),
#: exercising the dedup path, while a production corpus would split on
#: blank lines instead (swap the chunker, keep the rest of the plan).
PARA_WORDS = 4


def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup stats per document — the C4/RefinedWeb
    "drop repeated paragraphs" pipeline stage.

    Documents explode into fixed-stride word chunks (index-driven
    ``explode(sequence(...))`` + ``slice`` — no posexplode/re-group, so
    chunk text never depends on shuffle order); the first occurrence of
    each chunk hash (ordered by doc_id, chunk_idx) is canonical, later
    ones count as duplicates.  Scale: one shuffle on the 128-bit chunk
    hash (uniform, unskewed), one on doc_id for the per-doc rollup;
    chunk text itself never shuffles — only (doc_id, chunk_idx, hash).
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.split("text", " ").alias("words"))
    chunks = words.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("words") / PARA_WORDS).cast("long") - 1,
            )
        ).alias("chunk_idx"),
        "words",
    ).select(
        "doc_id",
        "chunk_idx",
        F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    "words",
                    F.col("chunk_idx") * PARA_WORDS + 1,
                    PARA_WORDS,
                ),
            )
        ).alias("h"),
    )
    rn = F.row_number().over(
        Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
    )
    marked = chunks.withColumn("rn", rn)
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_paras"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_paras"),
        )
        .select(
            "doc_id",
            "n_paras",
            "n_dup_paras",
            F.round(
                F.col("n_dup_paras").cast("double") / F.col("n_paras"), 6
            ).alias("dup_ratio"),
        )
    )


PARAGRAPH_DEDUP_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
idx AS (
  SELECT doc_id, words,
         unnest(range(0, CAST(ceil(len(words) / {PARA_WORDS}.0) AS BIGINT))) AS chunk_idx
  FROM w
),
chunks AS (
  SELECT doc_id, chunk_idx,
         md5(array_to_string(
           words[chunk_idx * {PARA_WORDS} + 1 : chunk_idx * {PARA_WORDS} + {PARA_WORDS}],
           ' ')) AS h
  FROM idx
),
marked AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
)
SELECT doc_id, COUNT(*) AS n_paras,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras,
       ROUND(CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS dup_ratio
FROM marked
GROUP BY doc_id
"""


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup keep-BEST: cluster the MinHash/LSH near-duplicates, then
    keep the highest-QUALITY member of each cluster (ties on doc_id) —
    what production corpus cleaning actually does (clean_corpus's
    keep-min-id is the accounting-simple form; keep-best preserves the
    best copy of duplicated content instead of an arbitrary one).
    Emits one row per cluster (singletons included) with its size and
    the kept doc + score.

    Scale shape: clustering is the same iterative min-label propagation
    as neardup_clusters (ids only); the keep decision is one window
    rank over (cluster, quality) — no text is re-read after the
    signature pass."""
    from golang_mapreduce_spark.operators.textstats import quality_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs_full = minhash_pairs_from(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    clusters = clusters_from(pairs_full.select("doc_a", "doc_b"))
    memb = docs.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    q = quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    ranked = memb.join(q, "doc_id").select(
        "cluster_id",
        "doc_id",
        "quality_score",
        F.row_number()
        .over(
            Window.partitionBy("cluster_id").orderBy(
                F.desc("quality_score"), F.asc("doc_id")
            )
        )
        .alias("rn"),
        F.count("*").over(Window.partitionBy("cluster_id")).alias("n_members"),
    )
    out = ranked.where(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("keep_doc_id"),
        F.col("quality_score").alias("best_quality"),
        "n_members",
    )
    return with_shared_caches(out, pairs_full, clusters)


def _dedup_keep_best_sql() -> str:
    from golang_mapreduce_spark.operators.textstats import QUALITY_SQL

    return f"""
WITH RECURSIVE q AS (
  {QUALITY_SQL.strip()}
),
pairs AS (
  {minhash_pairs_sql("documents").strip()}
),
{cc_walk_sql('pairs')},
memb AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN clusters c USING (doc_id)
),
ranked AS (
  SELECT m.cluster_id, m.doc_id, q.quality_score,
         ROW_NUMBER() OVER (PARTITION BY m.cluster_id
                            ORDER BY q.quality_score DESC, m.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY m.cluster_id) AS n_members
  FROM memb m JOIN q USING (doc_id)
)
SELECT cluster_id, doc_id AS keep_doc_id, quality_score AS best_quality,
       n_members
FROM ranked WHERE rn = 1
"""


def blocked_components(pairs: DataFrame) -> DataFrame:
    """Connected components over a BLOCK-CONFINED edge list — (block,
    doc_a, doc_b) rows where, by construction of the blocking, no
    component can span two blocks (single-probe IVF assignment: every
    doc belongs to exactly one cluster, so every edge is intra-cluster
    and so is every path).  That invariant turns iterative global CC
    into ONE shuffle + a per-block local union-find (min-id union keeps
    the representative equal to the component's minimum doc_id — the
    same labels :func:`clusters_from` converges to), with zero driver
    round-trips.  Per-block memory is O(members) — bounded by the same
    ~sqrt(N) cluster size that already bounds the pair-scoring gram
    matrix upstream.

    NOT valid for multi-probe pair sources (a doc probing two clusters
    can bridge them); those compose :func:`clusters_from` instead."""
    import pandas as pd

    def uf(key, pdf):
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
            a, b = int(a), int(b)
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union-by-min: the root is always the component's min id
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        return pd.DataFrame(
            {"doc_id": list(parent), "cluster_id": [find(n) for n in parent]}
        )

    return pairs.groupBy("cluster").applyInPandas(
        uf, schema="doc_id long, cluster_id long"
    )


#: Incremental-ingest triage: the "incoming batch" is the residue slice
#: doc_id % INGEST_MOD == INGEST_RES; everything else is the base corpus.
INGEST_MOD, INGEST_RES = 10, 7


def dedup_incremental_triage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-crawl ingest triage: classify every INCOMING document
    against the BASE corpus as exact_dup (byte-normalized hash already
    present), near_dup (LSH candidate pair with a base doc at/above the
    MinHash threshold), or novel — with the matched base doc id — the
    decision table an incremental pipeline writes before admitting a
    batch (full-corpus re-dedup per ingest is the anti-pattern this
    replaces).  Precedence: exact > near > novel.

    Scale shape: the exact side is a hash join on md5 against the base
    hash set keyed (hash -> min doc_id) — ids and hashes only; the near
    side reuses the banded LSH candidate join, restricted to
    cross-set (incoming, base) pairs.  In production the base side's
    signatures/hashes are a MATERIALIZED table updated per batch (the
    incremental contract: a new doc never changes an old verdict); here
    both sides derive from one corpus scan so the oracle can replay it.
    """
    docs = load_table(spark, sf_dir, "documents")
    is_inc = F.col("doc_id") % INGEST_MOD == INGEST_RES
    text_h = F.md5(F.lower(F.trim("text")))
    base_hash = (
        docs.where(~is_inc)
        .select(text_h.alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("exact_match"))
    )
    inc = docs.where(is_inc).select("doc_id", text_h.alias("h"))
    pairs_full = minhash_pairs_from(docs)
    pairs = pairs_full.select("doc_a", "doc_b")
    a_inc = F.col("doc_a") % INGEST_MOD == INGEST_RES
    b_inc = F.col("doc_b") % INGEST_MOD == INGEST_RES
    cross = (
        pairs.where(a_inc & ~b_inc)
        .select(F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("partner"))
        .union(
            pairs.where(b_inc & ~a_inc).select(
                F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("partner")
            )
        )
    )
    near = cross.groupBy("doc_id").agg(F.min("partner").alias("near_match"))
    return with_shared_caches(
        inc.join(base_hash, "h", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_match").isNotNull(), "exact_dup")
            .when(F.col("near_match").isNotNull(), "near_dup")
            .otherwise("novel")
            .alias("verdict"),
            F.coalesce("exact_match", "near_match").alias("match_doc_id"),
        ),
        pairs_full,
    )


INCREMENTAL_TRIAGE_SQL = f"""
WITH pairs AS (
  {{PAIRS}}
),
base_hash AS (
  SELECT md5(lower(trim(text))) AS h, MIN(doc_id) AS exact_match
  FROM documents WHERE doc_id % {INGEST_MOD} <> {INGEST_RES} GROUP BY 1
),
inc AS (
  SELECT doc_id, md5(lower(trim(text))) AS h
  FROM documents WHERE doc_id % {INGEST_MOD} = {INGEST_RES}
),
near AS (
  SELECT doc_id, MIN(partner) AS near_match FROM (
    SELECT doc_a AS doc_id, doc_b AS partner FROM pairs
    WHERE doc_a % {INGEST_MOD} = {INGEST_RES}
      AND doc_b % {INGEST_MOD} <> {INGEST_RES}
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
    WHERE doc_b % {INGEST_MOD} = {INGEST_RES}
      AND doc_a % {INGEST_MOD} <> {INGEST_RES}
  ) GROUP BY doc_id
)
SELECT i.doc_id,
       CASE WHEN b.exact_match IS NOT NULL THEN 'exact_dup'
            WHEN n.near_match IS NOT NULL THEN 'near_dup'
            ELSE 'novel' END AS verdict,
       COALESCE(b.exact_match, n.near_match) AS match_doc_id
FROM inc i
LEFT JOIN base_hash b USING (h)
LEFT JOIN near n USING (doc_id)
"""


def materialize_dedup_base(spark: SparkSession, sf_dir: str, base_dir: str) -> None:
    """Write the BASE corpus's dedup state as the two parquet tables the
    incremental contract reads instead of re-scanning the base per
    batch (VERDICT r5 #5):

    * ``base_hash``  — (h, exact_match): normalized-text md5 → min
      base doc_id (the exact-dup probe table);
    * ``base_sig``   — (doc_id, sig): the 16-perm MinHash signature
      array (band buckets re-derive from it with zero text access).

    In production these are updated per admitted batch (append new
    hashes/signatures); a new doc never changes an old verdict, so the
    tables only grow."""
    docs = load_table(spark, sf_dir, "documents")
    is_inc = F.col("doc_id") % INGEST_MOD == INGEST_RES
    base = docs.where(~is_inc)
    (
        base.select(F.md5(F.lower(F.trim("text"))).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("exact_match"))
        .write.mode("overwrite")
        .parquet(f"{base_dir}/base_hash")
    )
    (
        _signatures_from(base)
        .select("doc_id", F.array(*[f"m{i}" for i in range(NUM_HASHES)]).alias("sig"))
        .write.mode("overwrite")
        .parquet(f"{base_dir}/base_sig")
    )


def dedup_incremental_triage_from_base(
    spark: SparkSession, sf_dir: str, base_dir: str
) -> DataFrame:
    """:func:`dedup_incremental_triage` against a MATERIALIZED base
    (written by :func:`materialize_dedup_base`): the base corpus's text
    is never re-read — the exact probe hits the stored hash table and
    the near probe bands the stored signatures.  Only the incoming
    batch is scanned/shingled.  Verdict-identical to the single-scan
    form by construction (signatures are per-doc, banding and the
    est-Jaccard filter are pure functions of the two signatures) —
    tests/test_incremental_base.py pins the equivalence.

    Scale shape: incoming-batch scan + two hash joins against the base
    tables; the band join shuffles (band, bkey) collisions only.  Per
    ingest batch of size B against a base of size N, work is O(B) scan
    + O(collisions) — never O(N)."""
    docs = load_table(spark, sf_dir, "documents")
    is_inc = F.col("doc_id") % INGEST_MOD == INGEST_RES
    text_h = F.md5(F.lower(F.trim("text")))
    base_hash = spark.read.parquet(f"{base_dir}/base_hash")
    base_sig = spark.read.parquet(f"{base_dir}/base_sig")

    inc_docs = docs.where(is_inc)
    inc = inc_docs.select("doc_id", text_h.alias("h"))
    inc_sig = _signatures_from(inc_docs).select(
        "doc_id", F.array(*[f"m{i}" for i in range(NUM_HASHES)]).alias("sig")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    inc_bands = _bands_from(inc_sig)
    base_bands = _bands_from(base_sig)
    cand = (
        inc_bands.alias("a")
        .join(
            base_bands.alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")),
        )
        .select(F.col("a.doc_id").alias("doc_id"), F.col("b.doc_id").alias("partner"))
        .distinct()
    )
    sa = inc_sig.select(F.col("doc_id"), F.col("sig").alias("sig_a"))
    sb = base_sig.select(F.col("doc_id").alias("partner"), F.col("sig").alias("sig_b"))
    near = (
        cand.join(sa, "doc_id")
        .join(sb, "partner")
        .where(
            F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
            / F.lit(float(NUM_HASHES))
            >= MINHASH_EST_THRESHOLD
        )
        .groupBy("doc_id")
        .agg(F.min("partner").alias("near_match"))
    )
    return with_shared_caches(
        inc.join(base_hash, "h", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_match").isNotNull(), "exact_dup")
            .when(F.col("near_match").isNotNull(), "near_dup")
            .otherwise("novel")
            .alias("verdict"),
            F.coalesce("exact_match", "near_match").alias("match_doc_id"),
        ),
        inc_sig,
    )


def _semantic_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared semantic-dup ranking: IVF-blocked cosine pairs →
    per-cluster union-find (:func:`blocked_components`) → quality rank
    within each semantic group.  Only edge-participating nodes appear —
    every member of a >=2 group, exactly the semantic-dup population.
    Consumers: :func:`semantic_dedup_keep` (rn == 1 summary) and
    :func:`semantic_drop_ids` (rn > 1, the drop set the flagship
    pipeline subtracts)."""
    from golang_mapreduce_spark.operators.similarity import emb_neardup_pairs
    from golang_mapreduce_spark.operators.textstats import quality_scores

    pairs = emb_neardup_pairs(spark, sf_dir).select(
        "cluster",
        F.col("vec_a").alias("doc_a"),
        F.col("vec_b").alias("doc_b"),
    )
    clusters = blocked_components(pairs)
    q = quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    return clusters.join(q, "doc_id").select(
        "cluster_id",
        "doc_id",
        "quality_score",
        F.row_number()
        .over(
            Window.partitionBy("cluster_id").orderBy(
                F.desc("quality_score"), F.asc("doc_id")
            )
        )
        .alias("rn"),
        F.count("*").over(Window.partitionBy("cluster_id")).alias("n_members"),
    )


def semantic_drop_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_ids displaced by semantic dedup: every member of a semantic
    group except its best-quality representative.  ``vec_id`` is the
    fixture's 1:1 ``doc_id``.  Computed on the raw corpus, so
    subtracting it anywhere in an id-filter chain is commutative."""
    return _semantic_ranked(spark, sf_dir).where(F.col("rn") > 1).select("doc_id")


def semantic_drop_ctes(prefix: str = "s") -> str:
    """Oracle CTE block for the semantic drop set: requires
    ``EMB_ASSIGN_CTES`` (emb/cent/assign) and a quality CTE ``q`` in the
    enclosing WITH RECURSIVE; yields ``{prefix}pairs`` / the prefixed CC
    walk / ``semdrop(doc_id)``."""
    from golang_mapreduce_spark.operators.similarity import NEARDUP_COS

    return f"""{prefix}pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM assign a
  JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.emb, b.emb), 6) >= {NEARDUP_COS}
),
{cc_walk_sql(prefix + 'pairs', prefix=prefix)},
semdrop AS (
  SELECT doc_id FROM (
    SELECT c.doc_id,
           ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                              ORDER BY q.quality_score DESC, c.doc_id) AS rn
    FROM {prefix}clusters c JOIN q USING (doc_id)
  ) WHERE rn > 1
)"""


def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public): IVF
    cluster blocking over the document embeddings, within-cluster
    cosine pairs at/above NEARDUP_COS, connected-components over those
    pairs, then keep the highest-QUALITY member of each semantic group
    (ties on doc_id) — one row per multi-member group with the kept doc
    and how many near-identical copies it displaces.  ``vec_id`` is the
    fixture's 1:1 ``doc_id``.

    Scale shape: everything up to the pairs is emb_neardup_pairs'
    dataflow — ~sqrt(N) broadcast centroids, one BLAS gram matrix per
    cluster group, pairs leave Python only above threshold (O(N^1.5)
    worst case, near-linear balanced).  CC exploits the single-probe
    blocking invariant (no component spans clusters): one per-cluster
    local union-find via :func:`blocked_components` — ZERO driver
    iteration, vs the 8-round pointer-doubling walk the general text
    graph needs (measured at sf0.1: the whole operator 15.8 s -> 1.9 s
    warm).  The keep decision is one window over
    (cluster, quality).  No all-pairs product anywhere, and text is
    never read by this operator at all — quality joins in by id."""
    ranked = _semantic_ranked(spark, sf_dir)
    return ranked.where(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("keep_doc_id"),
        F.col("quality_score").alias("best_quality"),
        "n_members",
        (F.col("n_members") - 1).cast("bigint").alias("n_dropped"),
    )


def _semantic_dedup_sql() -> str:
    from golang_mapreduce_spark.operators.similarity import (
        EMB_ASSIGN_CTES,
        NEARDUP_COS,
    )
    from golang_mapreduce_spark.operators.textstats import QUALITY_SQL

    return f"""
WITH RECURSIVE {EMB_ASSIGN_CTES},
pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM assign a
  JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.emb, b.emb), 6) >= {NEARDUP_COS}
),
{cc_walk_sql('pairs')},
q AS (
  {QUALITY_SQL.strip()}
),
ranked AS (
  SELECT c.cluster_id, c.doc_id, q.quality_score,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.quality_score DESC, c.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members
  FROM clusters c JOIN q USING (doc_id)
)
SELECT cluster_id, doc_id AS keep_doc_id, quality_score AS best_quality,
       n_members, CAST(n_members - 1 AS BIGINT) AS n_dropped
FROM ranked WHERE rn = 1
"""


def neardup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-agreement audit between the two near-dup detectors: how
    many pairs MinHash/LSH and SimHash banding each find, and how many
    they agree on — the calibration readout that decides which detector
    (or both) a pipeline trusts at a given threshold pair.  One full
    outer join of two already-bucketed pair sets (each tiny relative to
    the corpus), folded to a single row."""
    mh_full = dedup_minhash_pairs(spark, sf_dir)
    sh_full = simhash_neardup_pairs(spark, sf_dir)
    mh = mh_full.select("doc_a", "doc_b")
    sh = sh_full.select("doc_a", "doc_b")
    joined = mh.withColumn("in_mh", F.lit(1)).join(
        sh.withColumn("in_sh", F.lit(1)), ["doc_a", "doc_b"], "full_outer"
    )
    out = joined.agg(
        F.sum(F.coalesce(F.col("in_mh"), F.lit(0))).cast("bigint").alias("n_minhash"),
        F.sum(F.coalesce(F.col("in_sh"), F.lit(0))).cast("bigint").alias("n_simhash"),
        F.sum(
            F.when(F.col("in_mh").isNotNull() & F.col("in_sh").isNotNull(), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_both"),
    )
    return with_shared_caches(out, mh_full, sh_full)


def _method_agreement_sql() -> str:
    return f"""
WITH mh AS (
  SELECT doc_a, doc_b FROM ({DEDUP_MINHASH_PAIRS_SQL.strip()})
),
sh AS (
  SELECT doc_a, doc_b FROM ({SIMHASH_NEARDUP_SQL.strip()})
)
SELECT CAST(COUNT(mh.doc_a) AS BIGINT) AS n_minhash,
       CAST(COUNT(sh.doc_a) AS BIGINT) AS n_simhash,
       CAST(SUM(CASE WHEN mh.doc_a IS NOT NULL AND sh.doc_a IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_both
FROM mh FULL OUTER JOIN sh USING (doc_a, doc_b)
"""


def dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size distribution: how many md5 groups
    have 1, 2, 3... copies — the single chart that tells you whether a
    corpus's duplication is long-tail (crawl noise) or concentrated
    (mirrored sites), and therefore which dedup tier pays.  Two
    partial-agg'd exchanges, output O(distinct sizes)."""
    docs = load_table(spark, sf_dir, "documents")
    groups = (
        docs.groupBy(F.md5(F.lower(F.trim("text"))).alias("h"))
        .agg(F.count("*").alias("n_copies"))
    )
    return groups.groupBy("n_copies").agg(
        F.count("*").alias("n_groups"),
        (F.count("*") * F.col("n_copies")).cast("bigint").alias("n_docs"),
    )


DUP_HISTOGRAM_SQL = """
SELECT n_copies, COUNT(*) AS n_groups,
       CAST(COUNT(*) * n_copies AS BIGINT) AS n_docs
FROM (
  SELECT COUNT(*) AS n_copies FROM documents GROUP BY md5(lower(trim(text)))
)
GROUP BY n_copies
"""


#: ppm granularity for the duplicate-aware keep-rate (matches the
#: sampling module's convention; defined locally to keep module
#: dependencies acyclic).
_CW_PPM = 1_000_000


def neardup_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-AWARE soft dedup: instead of keep-one-per-cluster,
    keep each member of a near-dup cluster with probability
    1/cluster_size (hash-threshold membership, salt 'cw:') — expected
    ONE surviving copy per cluster, but which copy survives varies by
    doc hash, and popular content is down-weighted rather than
    hard-deleted.  This is the soft-dedup alternative public pipelines
    use when duplication frequency itself carries signal (a page
    mirrored 1000x is still one page of "mass"): hard dedup biases
    toward whichever copy sorts first, soft dedup preserves the
    corpus-level distribution while killing the 1000x overcount.

    Scale shape: the cluster labels are neardup_clusters' CC output
    (ids only); sizes are one partial-agg'd count per cluster joined
    back by id; the keep decision is a stateless map-side hash
    threshold — identical membership on any engine or partitioning.
    Unclustered docs have size 1 and always survive."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    pairs_full = dedup_minhash_pairs(spark, sf_dir)
    clusters = clusters_from(pairs_full.select("doc_a", "doc_b"))
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("csize"))
    memb = (
        docs.join(clusters, "doc_id", "left")
        .join(sizes, "cluster_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            F.coalesce("csize", F.lit(1)).cast("bigint").alias("cluster_size"),
        )
    )
    h = hash32(F.concat(F.lit("cw:"), F.col("doc_id").cast("string")))
    out = memb.where(h % _CW_PPM < F.expr(f"{_CW_PPM} div cluster_size"))
    return with_shared_caches(out, pairs_full, clusters)


NEARDUP_WEIGHTED_SAMPLE_SQL = f"""
WITH RECURSIVE pairs AS (
  {DEDUP_MINHASH_PAIRS_SQL.strip()}
),
{cc_walk_sql('pairs')},
sizes AS (
  SELECT cluster_id, COUNT(*) AS csize FROM clusters GROUP BY cluster_id
),
memb AS (
  SELECT d.doc_id,
         COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
         CAST(COALESCE(s.csize, 1) AS BIGINT) AS cluster_size
  FROM documents d
  LEFT JOIN clusters c USING (doc_id)
  LEFT JOIN sizes s ON s.cluster_id = c.cluster_id
)
SELECT doc_id, cluster_id, cluster_size
FROM memb
WHERE ('0x' || substr(md5('cw:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      % {_CW_PPM} < {_CW_PPM} // cluster_size
"""


def dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-text fraction (the RefinedWeb/Gopher
    "fraction of n-grams in duplicated n-grams" repetition-across-corpus
    signal, Penedo et al. 2023 §4.2): for every document with >= 5
    tokens, the share of its 5-gram POSITIONS whose 5-gram also occurs
    in at least one OTHER document — the per-doc score a pipeline
    thresholds to drop boilerplate-heavy/templated documents that exact
    and MinHash dedup both miss (no single pair is similar, but the
    text is assembled from corpus-wide repeated spans).

    Scale shape: one explode to (doc_id, hash) position rows; the
    doc-frequency side is a distinct + count keyed on the 64-bit hash
    (partial-agg'd; n-gram STRINGS never shuffle); the score join is
    hash-keyed.  O(total positions) end to end, no pair product of any
    kind — this is the linear-cost alternative to pairwise span dedup."""
    docs = load_table(spark, sf_dir, "documents")
    pos = (
        docs.select("doc_id", ws_words("text").alias("toks"))
        .where(F.size("toks") >= JACCARD_NGRAM)
        .select("doc_id", F.explode(_shingles(JACCARD_NGRAM)).alias("s"))
        .select("doc_id", hash32("s").alias("h"))
    )
    dfreq = (
        pos.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("n_docs"))
    )
    dup = F.when(F.col("n_docs") >= 2, 1).otherwise(0)
    return (
        pos.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_pos"),
            F.sum(dup).cast("bigint").alias("dup_pos"),
        )
        .select(
            "doc_id",
            "n_pos",
            "dup_pos",
            F.round(F.col("dup_pos").cast("double") / F.col("n_pos"), 6).alias(
                "dup_frac"
            ),
        )
    )


def dup_span_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable form of dup_ngram_fraction: for every document,
    the MAXIMAL token spans whose every 5-gram also occurs in another
    document — the removal manifest of ExactSubstr-style span dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better": cut the duplicated spans, keep the document).
    dup_ngram_fraction scores docs for dropping; this emits
    (doc_id, span_start, span_end) for surgical cutting.

    Spans are built WITHOUT pairwise anything: duplicated 5-gram
    positions per doc (the linear doc-frequency join), then consecutive
    position runs merge via the i - row_number() grouping trick — one
    window pass per doc partition, integer arithmetic end to end
    (engine-identical).  A run of shingle starts [a..b] covers tokens
    a .. b+4 (1-based, inclusive).

    Scale: identical cost profile to dup_ngram_fraction (one explode,
    one hash-keyed df join) plus one windowed exchange on doc_id —
    O(duplicated positions), no pair product."""
    docs = load_table(spark, sf_dir, "documents")
    pos = (
        docs.select("doc_id", ws_words("text").alias("toks"))
        .where(F.size("toks") >= JACCARD_NGRAM)
        .select(
            "doc_id", F.posexplode(_shingles(JACCARD_NGRAM)).alias("p", "s")
        )
        .select(
            "doc_id", (F.col("p") + 1).alias("i"), hash32("s").alias("h")
        )
    )
    dfreq = (
        pos.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("n_docs"))
    )
    duppos = pos.join(
        dfreq.where(F.col("n_docs") >= 2).select("h"), "h"
    ).select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    runs = duppos.select(
        "doc_id", "i", (F.col("i") - F.row_number().over(w)).alias("g")
    )
    return (
        runs.groupBy("doc_id", "g")
        .agg(
            F.min("i").alias("span_start"),
            (F.max("i") + F.lit(JACCARD_NGRAM - 1)).alias("span_end"),
            F.count("*").cast("bigint").alias("n_shingles"),
        )
        .select("doc_id", "span_start", "span_end", "n_shingles")
    )


DUP_SPAN_MANIFEST_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, i,
         {sql_hash32("t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]")} AS h
  FROM toks, UNNEST(generate_series(1, len(t) - {JACCARD_NGRAM - 1})) AS g(i)
  WHERE len(t) >= {JACCARD_NGRAM}
),
dfreq AS (
  SELECT h, COUNT(*) AS n_docs FROM (SELECT DISTINCT doc_id, h FROM pos) GROUP BY h
),
duppos AS (
  SELECT p.doc_id, p.i
  FROM pos p JOIN dfreq d ON d.h = p.h AND d.n_docs >= 2
),
runs AS (
  SELECT doc_id, i,
         i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM duppos
)
SELECT doc_id,
       MIN(i) AS span_start,
       MAX(i) + {JACCARD_NGRAM - 1} AS span_end,
       COUNT(*) AS n_shingles
FROM runs
GROUP BY doc_id, grp
"""


DUP_NGRAM_FRACTION_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
pos AS (
  SELECT doc_id,
         {sql_hash32("t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]")} AS h
  FROM toks, UNNEST(generate_series(1, len(t) - {JACCARD_NGRAM - 1})) AS g(i)
  WHERE len(t) >= {JACCARD_NGRAM}
),
dfreq AS (
  SELECT h, COUNT(*) AS n_docs FROM (SELECT DISTINCT doc_id, h FROM pos) GROUP BY h
)
SELECT p.doc_id,
       COUNT(*) AS n_pos,
       CAST(SUM(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_pos,
       ROUND(CAST(SUM(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS dup_frac
FROM pos p JOIN dfreq d USING (h)
GROUP BY p.doc_id
"""


#: Minimum one-sided containment for a reported pair.
CONTAINMENT_MIN = 0.5


def ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection by n-gram CONTAINMENT
    (|A∩B| / |A|): catches a short document wholly quoted inside a long
    one, where Jaccard is tiny (union dominated by the long doc) and
    both MinHash and SimHash stay silent — the news-wire / quote-chain
    case the C4 and RealNews pipelines handle with containment, not
    resemblance (Broder's distinction, "On the resemblance and
    containment of documents", 1997).

    Candidates come from the banded-LSH collision join (collisions, not
    all-pairs); the exact intersection then anchors on candidate pairs
    exactly as minhash_calibration does (O(candidates × shingles/doc)),
    and a pair is reported when EITHER side's containment clears
    {CONTAINMENT_MIN}.  Caveat, documented for scale honesty: LSH on
    MinHash recalls high-JACCARD pairs, so extreme size-ratio
    containments can be missed at the candidate stage;
    :func:`containment_bottomk_pairs` is the containment-preserving
    candidate source (bottom-k sketch inverted-index join) that closes
    exactly that recall hole over the same exact phase
    (tests/test_containment_bottomk.py pins an adversarial pair this
    form misses and that one catches)."""
    docs = load_table(spark, sf_dir, "documents")
    sig = (
        _signatures_from(docs)
        .select("doc_id", F.array(*[f"m{i}" for i in range(NUM_HASHES)]).alias("sig"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bands = _bands_from(sig)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return with_shared_caches(
        _containment_exact(cand, _distinct_shingle_hashes(docs)), sig
    )


def _distinct_shingle_hashes(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, h) rows over 3-gram shingle hashes — the exact
    shingle-set relation both containment candidate generators anchor
    their exact intersections on."""
    return (
        docs.select("doc_id", ws_words("text").alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", F.explode(_shingles(3)).alias("s"))
        .select("doc_id", hash32("s").alias("h"))
        .distinct()
    )


def _containment_exact(cand: DataFrame, doc_sh: DataFrame) -> DataFrame:
    """EXACT two-sided containment on a (doc_a, doc_b) candidate
    relation: intersect the shingle sets anchored on candidates only
    (O(candidates × shingles/doc), never all-pairs), then report pairs
    where either side's containment clears CONTAINMENT_MIN.  Shared by
    the LSH-candidate and bottom-k-candidate forms, so the two differ
    ONLY in recall of the candidate stage."""
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = doc_sh.select(F.col("doc_id").alias("doc_a"), "h")
    sb = doc_sh.select(F.col("doc_id").alias("doc_b"), "h")
    common = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    cont_a = F.round(F.col("n_common").cast("double") / F.col("n_a"), 6)
    cont_b = F.round(F.col("n_common").cast("double") / F.col("n_b"), 6)
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            cont_a.alias("containment_a"),
            cont_b.alias("containment_b"),
        )
        .where(
            (F.col("containment_a") >= CONTAINMENT_MIN)
            | (F.col("containment_b") >= CONTAINMENT_MIN)
        )
    )


NGRAM_CONTAINMENT_SQL = f"""
WITH {_sql_signature_cte()},
sig AS (
  SELECT doc_id, list(mv ORDER BY i) AS sig FROM mh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b AS band,
         array_to_string(list_slice(sig, b * {ROWS_PER_BAND} + 1, (b + 1) * {ROWS_PER_BAND}), ',') AS bkey
  FROM sig, (SELECT unnest(generate_series(0, {BANDS - 1})) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
sh3 AS (
  SELECT DISTINCT doc_id, h FROM hashes
),
{{TAIL}}
"""

#: Shared oracle tail: exact containment anchored on a ``cand`` CTE over
#: the ``sh3`` distinct-shingle relation (mirrors _containment_exact).
_CONTAINMENT_SQL_TAIL = f"""
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh3 GROUP BY doc_id
),
common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN sh3 a ON a.doc_id = c.doc_a
  JOIN sh3 b ON b.doc_id = c.doc_b AND b.h = a.h
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, n_common,
       ROUND(CAST(n_common AS DOUBLE) / na.n_sh, 6) AS containment_a,
       ROUND(CAST(n_common AS DOUBLE) / nb.n_sh, 6) AS containment_b
FROM common
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE ROUND(CAST(n_common AS DOUBLE) / na.n_sh, 6) >= {CONTAINMENT_MIN}
   OR ROUND(CAST(n_common AS DOUBLE) / nb.n_sh, 6) >= {CONTAINMENT_MIN}
"""

NGRAM_CONTAINMENT_SQL = NGRAM_CONTAINMENT_SQL.format(TAIL=_CONTAINMENT_SQL_TAIL.strip())


#: bottom-k sketch size (k smallest distinct shingle hashes per doc).
BOTTOMK_K = 8
#: inverted-index doc-frequency cap: shingles present in more documents
#: than this are too common to be a useful containment witness and are
#: skipped on the index side (bounds the join fan-out at scale).
BOTTOMK_DF_CAP = 64


def containment_bottomk_pairs(
    spark: SparkSession, sf_dir: str, df_cap: int = BOTTOMK_DF_CAP
) -> DataFrame:
    """Containment-PRESERVING candidate generation: the recall fix for
    the LSH caveat documented on :func:`ngram_containment_pairs`
    (Broder 1997 §4 — a bottom-k sketch estimates CONTAINMENT, where
    MinHash banding only recalls resemblance).  A short document fully
    quoted inside a long one has Jaccard ~|A|/|B| (invisible to the
    banded MinHash join) but containment_a = 1.0; its bottom-k sketch
    hashes ALL occur in the long doc, so the sketch-vs-inverted-index
    join cannot miss it (tests/test_containment_bottomk.py pins an
    adversarial such pair end-to-end against both forms).

    Dataflow: per doc keep the k={BOTTOMK_K} smallest distinct shingle
    hashes (the sketch); join the sketch rows against the distinct
    (doc_id, h) inverted index restricted to shingles with document
    frequency <= ``df_cap`` (default {BOTTOMK_DF_CAP}); a pair becomes
    a candidate when at least 1/4 of the source sketch matches
    (4*m >= k, integer-exact on both engines); the shared exact phase
    (_containment_exact) then computes true two-sided containment and
    filters at {CONTAINMENT_MIN}.  Scale shape: the sketch side is k
    rows per doc, the index join fans out at most df per hash (capped),
    so candidate volume is O(N * k * df_cap) — linear in corpus size,
    never all-pairs; the exact phase anchors on candidates exactly as
    the LSH form does.

    Recall caveat (VERDICT r7 #4, one tier below the LSH caveat this
    form closes): the df cap trades recall on BOILERPLATE-dominated
    documents for the fan-out bound.  A contained doc whose ENTIRE
    bottom-k sketch lands on shingles with document frequency > df_cap
    (e.g. a short doc that is pure boilerplate repeated across >df_cap
    docs) contributes no index rows and no sketch matches, so every
    pair involving it is missed — tests/test_bottomk_dfcap_edge.py pins
    an adversarial such corpus where BOTH candidate sources go silent.
    Mitigation is the ``df_cap`` parameter: raising it recovers exactly
    those pairs at linearly more candidate volume (the same test shows
    df_cap=128 catching all 71 planted pairs the default misses; on the
    sf0.01 fixture, where no shingle's df exceeds either cap, 64 -> 128
    leaves candidates and answers bit-identical).  Alternatives for a
    corpus where the cap must stay low: de-boilerplate first
    (boilerplate_ngrams feeds a strip pass) or union with the LSH
    candidates, which recall the pure-boilerplate docs as ordinary
    high-Jaccard near-dups."""
    docs = load_table(spark, sf_dir, "documents")
    doc_sh = _distinct_shingle_hashes(docs).persist(StorageLevel.MEMORY_AND_DISK)
    w = Window.partitionBy("doc_id").orderBy("h")
    bk = (
        doc_sh.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= BOTTOMK_K)
        .select("doc_id", "h")
    )
    ksz = bk.groupBy("doc_id").agg(F.count("*").alias("kk"))
    dfreq = doc_sh.groupBy("h").agg(F.count("*").alias("nd"))
    inv = (
        doc_sh.join(dfreq.where(F.col("nd") <= F.lit(df_cap)), "h")
        .select("doc_id", "h")
    )
    cdir = (
        bk.alias("a")
        .join(inv.alias("b"), (F.col("b.h") == F.col("a.h")) & (F.col("b.doc_id") != F.col("a.doc_id")))
        .groupBy(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        .agg(F.count("*").alias("m"))
    )
    cand = (
        cdir.join(ksz.withColumnRenamed("doc_id", "src"), "src")
        .where(F.lit(4) * F.col("m") >= F.col("kk"))
        .select(
            F.least("src", "dst").alias("doc_a"),
            F.greatest("src", "dst").alias("doc_b"),
        )
        .distinct()
    )
    # persist spans the candidate AND exact phases (5 reuses of doc_sh).
    # Like the sibling sig persists it outlives this call by design (the
    # returned DataFrame is lazy and its lineage reads doc_sh), so the
    # HARNESS owns the release — or an eager caller via the exposed
    # handle (``_gmrs_shared_caches`` lifecycle).
    return with_shared_caches(_containment_exact(cand, doc_sh), doc_sh)


CONTAINMENT_BOTTOMK_SQL = f"""
WITH {_sql_signature_cte()},
sh3 AS (
  SELECT DISTINCT doc_id, h FROM hashes
),
bk AS (
  SELECT doc_id, h FROM (
    SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
    FROM sh3
  ) WHERE rn <= {BOTTOMK_K}
),
ksz AS (
  SELECT doc_id, COUNT(*) AS kk FROM bk GROUP BY doc_id
),
dfreq AS (
  SELECT h, COUNT(*) AS nd FROM sh3 GROUP BY h
),
inv AS (
  SELECT s.doc_id, s.h FROM sh3 s JOIN dfreq USING (h) WHERE nd <= {BOTTOMK_DF_CAP}
),
cdir AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, COUNT(*) AS m
  FROM bk a JOIN inv b ON b.h = a.h AND b.doc_id <> a.doc_id
  GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT LEAST(src, dst) AS doc_a, GREATEST(src, dst) AS doc_b
  FROM cdir JOIN ksz ON ksz.doc_id = cdir.src
  WHERE 4 * m >= kk
),
{_CONTAINMENT_SQL_TAIL.strip()}
"""


def incremental_triage_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized-base incremental contract as a DRIVER-CHECKED
    query: materialize the base corpus's dedup state once
    (:func:`materialize_dedup_base` — idempotent marker keyed on the
    corpus file's identity), then triage the incoming slice against the
    STORED tables (:func:`dedup_incremental_triage_from_base`).  Shares
    the single-scan form's oracle, so a green driver row certifies the
    from-base path verdict-identical to the replayable SQL — the same
    oracle-sharing move source_budget_select_hist uses.

    Scale shape: exactly the from-base form's — O(batch) scan + two
    probes against stored hash/signature tables; base text never
    re-read (plan-asserted in tests/test_incremental_base.py)."""
    import hashlib
    import os
    import shutil
    import tempfile

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    base_dir = os.path.join(tempfile.gettempdir(), f"gmrs_base_{tag}")
    if not os.path.isdir(base_dir):
        # Materialize into a process-unique dir and atomically rename it
        # into place (existence of base_dir IS the completion marker), so
        # two concurrent runs can never read a half-written base — the
        # loser of the rename race just paid a duplicate write (ADVICE
        # r7).  At production scale this whole block is a managed-table
        # registration.
        work_dir = tempfile.mkdtemp(
            prefix=f"gmrs_base_{tag}.", dir=tempfile.gettempdir()
        )
        materialize_dedup_base(spark, sf_dir, work_dir)
        try:
            os.rename(work_dir, base_dir)
        except OSError:  # lost the race: a complete base already exists
            shutil.rmtree(work_dir, ignore_errors=True)
    return dedup_incremental_triage_from_base(spark, sf_dir, base_dir)


def semantic_drop_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source semantic-duplication rate: how many of each source's
    documents the SemDeDup tier displaces (non-representative members of
    embedding-cosine groups) — the domain-level readout that turns
    per-doc semantic dedup into a blocklist/down-weight decision, the
    same way source_reputation rolls up the exact-dup tier.  One
    ids-only left join and a |sources|-row aggregate on top of the
    semantic drop set."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    drops = semantic_drop_ids(spark, sf_dir).withColumn("is_drop", F.lit(1))
    d = docs.join(drops, "doc_id", "left")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.coalesce("is_drop", F.lit(0))).cast("bigint").alias("n_dropped"),
        F.round(
            F.sum(F.coalesce("is_drop", F.lit(0))).cast("double") / F.count("*"), 6
        ).alias("drop_rate"),
    )


def _semantic_drop_by_source_sql() -> str:
    from golang_mapreduce_spark.operators.similarity import EMB_ASSIGN_CTES
    from golang_mapreduce_spark.operators.textstats import QUALITY_SQL

    return f"""
WITH RECURSIVE {EMB_ASSIGN_CTES},
q AS (
  {QUALITY_SQL.strip()}
),
{semantic_drop_ctes()}
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN s.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_dropped,
       ROUND(CAST(SUM(CASE WHEN s.doc_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
             / COUNT(*), 6) AS drop_rate
FROM documents d LEFT JOIN semdrop s USING (doc_id)
GROUP BY d.source
"""


def quality_by_dup_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality profile per duplication class — are duplicates worse
    text?  Every document is classified exact_dup (its normalized-text
    hash group has >1 member), else near_dup (it appears in the
    MinHash-LSH pair relation), else unique, and each class reports doc
    count and quality stats.  This is the calibration readout behind
    duplicate-aware SOFT dedup decisions (keep-best, weighted
    sampling): if near-dups score systematically lower, aggressive
    dropping is safe; if they score the same, the pipeline is deleting
    good data and should downweight instead.

    Scale shape: the exact tier is the dedup_exact groupBy (hash+id
    shuffle only); the near tier is the banded pair relation flattened
    to distinct member ids; both join the quality projection as ids;
    the aggregate is three rows.  Precedence exact > near mirrors the
    triage verdict ladder."""
    from golang_mapreduce_spark.operators.textstats import quality_features

    docs = load_table(spark, sf_dir, "documents")
    q = quality_features(docs).select("doc_id", "quality_score")
    h = docs.select(
        "doc_id", F.md5(F.lower(F.trim("text"))).alias("text_hash")
    )
    gsize = h.groupBy("text_hash").agg(F.count("*").alias("gs"))
    exact = (
        h.join(gsize, "text_hash")
        .where(F.col("gs") > 1)
        .select("doc_id")
        .withColumn("is_exact", F.lit(1))
    )
    pairs = minhash_pairs_from(docs)
    near = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_near", F.lit(1))
    )
    cls = (
        q.join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            F.when(F.col("is_exact").isNotNull(), "exact_dup")
            .when(F.col("is_near").isNotNull(), "near_dup")
            .otherwise("unique")
            .alias("dup_class"),
            "quality_score",
        )
    )
    out = cls.groupBy("dup_class").agg(
        F.count("*").alias("n_docs"),
        F.expr(
            "round(CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)"
            " / COUNT(*), 6)"
        ).alias("avg_quality"),
        F.min("quality_score").alias("min_quality"),
        F.max("quality_score").alias("max_quality"),
    )
    return with_shared_caches(out, pairs)


def _quality_by_dup_class_sql() -> str:
    from golang_mapreduce_spark.operators.textstats import QUALITY_SQL

    return f"""
WITH q AS (
  {QUALITY_SQL.strip()}
),
h AS (
  SELECT doc_id, md5(lower(trim(text))) AS text_hash FROM documents
),
exact AS (
  SELECT doc_id FROM h
  WHERE text_hash IN (
    SELECT text_hash FROM h GROUP BY text_hash HAVING COUNT(*) > 1
  )
),
pairs AS (
  SELECT doc_a, doc_b FROM ({minhash_pairs_sql()})
),
near AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM pairs
    UNION ALL SELECT doc_b AS doc_id FROM pairs
  )
),
cls AS (
  SELECT CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
              WHEN n.doc_id IS NOT NULL THEN 'near_dup'
              ELSE 'unique' END AS dup_class,
         q.quality_score
  FROM q
  LEFT JOIN exact e ON e.doc_id = q.doc_id
  LEFT JOIN near n ON n.doc_id = q.doc_id
)
SELECT dup_class,
       COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_quality,
       MIN(quality_score) AS min_quality,
       MAX(quality_score) AS max_quality
FROM cls
GROUP BY dup_class
"""


def minhash_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH index-health stats per band: bucket count, max bucket load,
    and the candidate-pair mass each band contributes (sum of
    s*(s-1)/2 over its buckets) — the observability table that predicts
    the banded join's shuffle cost BEFORE running it.  A band whose
    max_load explodes (a degenerate band key — e.g. a boilerplate
    shingle dominating one signature slot) is the LSH analog of join
    skew, and this readout is how a pipeline catches it and re-salts or
    re-bands; the IVF sibling is ivf_cluster_stats.

    Scale shape: signature aggregation (partial-agg'd, 16 longs/doc),
    band explode ({bands}x rows of ids+keys only), one exchange on
    (band, bkey) that partial-aggregates to bucket counts, and a final
    {bands}-row aggregate — strictly cheaper than the pair join it
    instruments, so it's safe to run as a pre-flight check at 100 TB."""
    sig = _signatures_df(spark, sf_dir).select(
        "doc_id", F.array(*[f"m{i}" for i in range(NUM_HASHES)]).alias("sig")
    )
    buckets = (
        _bands_from(sig)
        .groupBy("band", "bkey")
        .agg(F.count("*").alias("s"))
    )
    return (
        buckets.groupBy("band")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("s").cast("bigint").alias("n_docs"),
            F.max("s").cast("bigint").alias("max_load"),
            F.sum(F.expr("s * (s - 1) DIV 2")).cast("bigint").alias("cand_pairs"),
        )
        .select(
            F.col("band").cast("bigint").alias("band"),
            "n_buckets", "n_docs", "max_load", "cand_pairs",
        )
    )


MINHASH_BAND_STATS_SQL = f"""
WITH {_sql_signature_cte()},
sig AS (
  SELECT doc_id, list(mv ORDER BY i) AS sig FROM mh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b AS band,
         array_to_string(list_slice(sig, b * {ROWS_PER_BAND} + 1, (b + 1) * {ROWS_PER_BAND}), ',') AS bkey
  FROM sig, (SELECT unnest(generate_series(0, {BANDS - 1})) AS b)
),
buckets AS (
  SELECT band, bkey, COUNT(*) AS s FROM bands GROUP BY band, bkey
)
SELECT band,
       COUNT(*) AS n_buckets,
       CAST(SUM(s) AS BIGINT) AS n_docs,
       CAST(MAX(s) AS BIGINT) AS max_load,
       CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS cand_pairs
FROM buckets
GROUP BY band
"""


def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which crawls duplicate each other: the engine's near-dup pair
    relation rolled up to an (source_a, source_b) matrix of pair counts
    — the mirror-detection readout that tells a pipeline two sources
    are re-crawls of the same site (drop one) versus incidental overlap
    (dedup normally).  Pairs are folded direction-free (lexicographic
    source order), so each unordered source pair appears once;
    same-source pairs stay in the matrix — the diagonal is the
    within-crawl duplication a re-crawl interval mis-tune produces.

    Scale shape: the pair list is the banded LSH join (collision
    buckets); the two source lookups are ids-only hash joins against
    the (doc_id, source) projection, and the matrix aggregate is at
    most |sources|^2 rows — tiny, because a source registry is a
    curated dimension, not data-scale."""
    docs = load_table(spark, sf_dir, "documents")
    pairs_full = minhash_pairs_from(docs)
    pairs = pairs_full.select("doc_a", "doc_b")
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    out = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
    )
    return with_shared_caches(out, pairs_full)


CROSS_SOURCE_DUP_SQL = f"""
WITH pairs AS (
  SELECT doc_a, doc_b FROM ({minhash_pairs_sql()})
)
SELECT LEAST(a.source, b.source) AS source_a,
       GREATEST(a.source, b.source) AS source_b,
       COUNT(*) AS n_pairs
FROM pairs p
JOIN documents a ON a.doc_id = p.doc_a
JOIN documents b ON b.doc_id = p.doc_b
GROUP BY 1, 2
"""


def source_minhash_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-overlap estimation from MERGED sketches: a source-level
    MinHash signature (per-seed min over every shingle hash the source
    contains — MinHash's merge property: the sketch of a union is the
    elementwise min of sketches) and the estimated shingle-set Jaccard
    for every source pair.  This answers "how much does crawl A overlap
    crawl B" WITHOUT any doc-pair work — the set-level sibling of
    cross_source_dup_matrix's pair counts, and the cheap first look
    that decides whether the pair-level job is worth running.

    Scale shape: the signature is an algebraic min-aggregate, so it
    partial-aggregates map-side and the exchange carries 16 longs per
    source per map partition; the pairwise comparison runs on the
    |sources|-row sketch table (explicitly broadcast — a curated
    source registry is dimension-sized, and the join is guarded by the
    same bounded-by-construction argument as the broadcast singleton
    aggregates).  At 100 TB this is THE way to compare corpora: merge
    sketches, never documents."""
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("source", ws_words("text").alias("toks"))
        .where(F.size("toks") >= 3)
        .select("source", F.explode(_shingles(3)).alias("s"))
        .select("source", hash32("s").alias("h"))
    )
    aggs = [
        F.min(F.expr(f"({a} * h + {b}) % {MINHASH_PRIME}")).alias(f"m{i}")
        for i, (a, b) in enumerate(SEEDS)
    ]
    sig = sh.groupBy("source").agg(*aggs).select(
        "source", F.array(*[f"m{i}" for i in range(NUM_HASHES)]).alias("sig")
    )
    a = sig.alias("a")
    b = F.broadcast(sig.alias("b"))
    return (
        a.join(b, F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            (
                F.expr("size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), v -> v))")
                / F.lit(float(NUM_HASHES))
            ).alias("est_jaccard"),
        )
    )


def _source_minhash_sql() -> str:
    a_list, b_list = _sql_seed_lists()
    return f"""
WITH toks AS (
  SELECT source, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
  WHERE len(t) >= 3
),
hashes AS (
  SELECT source, {sql_hash32('s')} AS h FROM sh
),
seeds AS (
  SELECT unnest({a_list}) AS a, unnest({b_list}) AS b,
         unnest(generate_series(1, {NUM_HASHES})) AS i
),
mh AS (
  SELECT source, i, MIN((a * h + b) % {MINHASH_PRIME}) AS mv
  FROM hashes, seeds
  GROUP BY source, i
),
sig AS (
  SELECT source, list(mv ORDER BY i) AS sig FROM mh GROUP BY source
)
SELECT a.source AS source_a, b.source AS source_b,
       len(list_filter(generate_series(1, {NUM_HASHES}),
                       i -> a.sig[i] = b.sig[i])) / {NUM_HASHES}.0 AS est_jaccard
FROM sig a JOIN sig b ON a.source < b.source
"""


# --- near-dup graph analytics (round 9) ---------------------------------

def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc triangle counts and local clustering coefficient over the
    near-dup LSH pair graph — the structural complement of
    dup_graph_degree_stats (how MANY neighbors) and neardup_pagerank
    (how CENTRAL): a high clustering coefficient says the doc's
    neighborhood is a clique, i.e. a template family that should
    collapse to one representative, while low coefficient at high
    degree flags hub-like boilerplate stitched across otherwise
    unrelated docs.

    Classic distributed edge-iterator shape (Suri & Vassilvitskii,
    WWW'11 "Counting Triangles and the Curse of the Last Reducer"):
    orient every edge low-id -> high-id (the LSH pair relation already
    is), join paths a<b<c on the middle vertex, then close each path
    with one hash join back to the edge list — fan-out is bounded by
    per-vertex degree, never a cross product, and the LSH graph is
    sparse by construction.  The edge relation feeds four subtrees
    (e1/e2/e3 + degree), so it is materialized once via the same eager
    localCheckpoint lifecycle as neardup_pagerank (blocks reclaimed by
    the ContextCleaner when the result is dropped)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs_scored = minhash_pairs_from(docs.select("doc_id", "text"))
    e = pairs_scored.select("doc_a", "doc_b").localCheckpoint(eager=True)
    release_shared_caches(pairs_scored)

    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.doc_a") == F.col("e1.doc_b"))
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_a"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .select(
            F.col("e1.doc_a").alias("a"),
            F.col("e1.doc_b").alias("b"),
            F.col("e2.doc_b").alias("c"),
        )
    )
    member = tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
    tcount = member.groupBy("doc_id").agg(F.count("*").alias("n_triangles"))
    deg = (
        e.select(F.col("doc_a").alias("doc_id"))
        .unionAll(e.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").alias("degree"))
    )
    return tcount.join(deg, "doc_id").select(
        "doc_id",
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
        F.col("degree").cast("bigint").alias("degree"),
        F.round(
            F.lit(2.0) * F.col("n_triangles")
            / (F.col("degree") * (F.col("degree") - F.lit(1))),
            6,
        ).alias("clustering_coeff"),
    )


GRAPH_TRIANGLES_SQL = f"""
WITH pairs AS (
  {minhash_pairs_sql("documents").strip()}
),
e AS (
  SELECT doc_a, doc_b FROM pairs
),
tri AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM e e1
  JOIN e e2 ON e2.doc_a = e1.doc_b
  JOIN e e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
),
member AS (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
tcount AS (
  SELECT doc_id, COUNT(*) AS n_triangles FROM member GROUP BY doc_id
),
deg AS (
  SELECT doc_id, COUNT(*) AS degree FROM (
    SELECT doc_a AS doc_id FROM e
    UNION ALL SELECT doc_b AS doc_id FROM e
  ) GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(t.n_triangles AS BIGINT) AS n_triangles,
       CAST(d.degree AS BIGINT) AS degree,
       ROUND(2.0 * t.n_triangles / (d.degree * (d.degree - 1)), 6)
         AS clustering_coeff
FROM tcount t JOIN deg d USING (doc_id)
"""


# --- k-core peeling over the near-dup graph (round 10) ---------------------

KCORE_K = 2
KCORE_PEELS = 3


def graph_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_PEELS}-round k-core peeling (k={KCORE_K}) over the
    near-dup LSH pair graph — the third leg of the graph-audit family
    (degree = how many neighbors, triangles = how clique-like, core =
    how DEEP in the dense region): repeatedly delete vertices with
    degree < k and the edges they carry.  Docs that survive every peel
    sit inside mutually-reinforcing duplicate mass (template families,
    mirror clusters) that single-pair review queues systematically
    under-sample; docs peeled in round 1 are periphery attached by one
    accidental collision.

    The peel count is a static unroll (the neardup_pagerank
    convention): each round is one degree aggregate + two semi-joins,
    all linear in surviving edge mass, so {KCORE_PEELS} rounds at k=2
    is a fixed-depth approximation of the full 2-core (full
    convergence would loop to fixpoint; the unroll keeps the plan
    acyclic and the oracle one CTE chain).  The edge relation feeds
    every round's two subtrees + the final degree count, so each level
    materializes once via the eager-localCheckpoint lifecycle."""
    docs = load_table(spark, sf_dir, "documents")
    pairs_scored = minhash_pairs_from(docs.select("doc_id", "text"))
    e = pairs_scored.select("doc_a", "doc_b").localCheckpoint(eager=True)
    release_shared_caches(pairs_scored)

    def degrees(edges: DataFrame) -> DataFrame:
        return (
            edges.select(F.col("doc_a").alias("doc_id"))
            .unionAll(edges.select(F.col("doc_b").alias("doc_id")))
            .groupBy("doc_id")
            .agg(F.count("*").alias("deg"))
        )

    deg0 = degrees(e)
    survivors: list[DataFrame] = []
    cur = e
    for _ in range(KCORE_PEELS):
        surv = (
            degrees(cur)
            .where(F.col("deg") >= KCORE_K)
            .select("doc_id")
            .localCheckpoint(eager=True)
        )
        survivors.append(surv)
        cur = (
            cur.join(surv.withColumnRenamed("doc_id", "doc_a"), "doc_a")
            .join(surv.withColumnRenamed("doc_id", "doc_b"), "doc_b")
            .select("doc_a", "doc_b")
            .localCheckpoint(eager=True)
        )
    core_deg = degrees(cur)
    out = deg0.select("doc_id", F.col("deg").alias("degree0"))
    flag_total = None
    for i, surv in enumerate(survivors):
        flagged = surv.withColumn(f"s{i}", F.lit(1))
        out = out.join(flagged, "doc_id", "left")
        term = F.coalesce(F.col(f"s{i}"), F.lit(0))
        flag_total = term if flag_total is None else flag_total + term
    return (
        out.join(core_deg.withColumnRenamed("deg", "core_deg"), "doc_id", "left")
        .select(
            "doc_id",
            F.col("degree0").cast("bigint").alias("degree0"),
            flag_total.cast("int").alias("rounds_survived"),
            (flag_total == KCORE_PEELS).alias("in_core"),
            F.coalesce("core_deg", F.lit(0)).cast("bigint").alias("core_degree"),
        )
    )


def _kcore_sql() -> str:
    """Every peel level is AS MATERIALIZED: DuckDB inlines plain CTEs
    at each reference, and the e{{i}} chain references its predecessor
    three times (two IN subqueries + the projection), so without
    materialization the MinHash pair CTE would be re-evaluated
    O(3^peels) times — measured at minutes on a 10-doc corpus."""
    peels = []
    prev = "e0"
    for i in range(1, KCORE_PEELS + 1):
        peels.append(f"""deg{i} AS MATERIALIZED (
  SELECT doc_id, COUNT(*) AS deg FROM (
    SELECT doc_a AS doc_id FROM {prev}
    UNION ALL SELECT doc_b FROM {prev}
  ) GROUP BY doc_id
),
s{i} AS MATERIALIZED (
  SELECT doc_id FROM deg{i} WHERE deg >= {KCORE_K}
),
e{i} AS MATERIALIZED (
  SELECT doc_a, doc_b FROM {prev}
  WHERE doc_a IN (SELECT doc_id FROM s{i})
    AND doc_b IN (SELECT doc_id FROM s{i})
)""")
        prev = f"e{i}"
    peel_sql = ",\n".join(peels)
    flags = " + ".join(
        f"(CASE WHEN v.doc_id IN (SELECT doc_id FROM s{i}) THEN 1 ELSE 0 END)"
        for i in range(1, KCORE_PEELS + 1)
    )
    return f"""
WITH pairs AS MATERIALIZED (
  {minhash_pairs_sql("documents").strip()}
),
e0 AS MATERIALIZED (
  SELECT doc_a, doc_b FROM pairs
),
{peel_sql},
v AS (
  SELECT doc_id, COUNT(*) AS degree0 FROM (
    SELECT doc_a AS doc_id FROM e0
    UNION ALL SELECT doc_b FROM e0
  ) GROUP BY doc_id
),
coredeg AS (
  SELECT doc_id, COUNT(*) AS deg FROM (
    SELECT doc_a AS doc_id FROM {prev}
    UNION ALL SELECT doc_b FROM {prev}
  ) GROUP BY doc_id
)
SELECT v.doc_id,
       CAST(v.degree0 AS BIGINT) AS degree0,
       CAST({flags} AS INT) AS rounds_survived,
       ({flags}) = {KCORE_PEELS} AS in_core,
       CAST(COALESCE(coredeg.deg, 0) AS BIGINT) AS core_degree
FROM v LEFT JOIN coredeg ON v.doc_id = coredeg.doc_id
"""


# --- rare-n-gram uniqueness (round 9) ------------------------------------

RARE_NGRAM_N = 8


def rare_ngram_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc novelty audit: the fraction of a document's distinct
    {RARE_NGRAM_N}-gram shingles that appear in NO other document —
    the doc-level complement of dup_ngram_fraction (which measures
    duplicated mass).  A near-zero uniqueness ratio means the doc is
    assembled entirely from corpus-common long n-grams (template /
    boilerplate / recombined scrape), the profile memorization studies
    weight down even when no single pair-detector fires; ratios near 1
    mark genuinely novel text worth keeping at full weight.

    Scale shape: one explode + distinct to (doc, shingle) — the same
    inverted-index relation every shingle detector here builds — then
    ONE groupBy(shingle) whose df==1 rows keep their only doc_id via
    MIN(doc_id) (exact, because df==1 makes min the sole member), so
    no join back through the shingle text is needed; per-doc counts
    are partial-agg'd.  Linear in corpus shingle mass at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    doc_sh = (
        docs.select("doc_id", ws_words("text").alias("toks"))
        .where(F.size("toks") >= RARE_NGRAM_N)
        .select("doc_id", F.explode(_shingles(RARE_NGRAM_N)).alias("s"))
        .distinct()
    )
    uniq = (
        doc_sh.groupBy("s")
        .agg(F.count("*").alias("df"), F.min("doc_id").alias("only_doc"))
        .where(F.col("df") == 1)
        .groupBy(F.col("only_doc").alias("doc_id"))
        .agg(F.count("*").alias("n_unique"))
    )
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    return sizes.join(uniq, "doc_id", "left").select(
        "doc_id",
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        F.coalesce("n_unique", F.lit(0)).cast("bigint").alias("n_unique_ngrams"),
        F.round(
            F.coalesce("n_unique", F.lit(0)) / F.col("n_shingles"), 6
        ).alias("uniqueness_ratio"),
    )


RARE_NGRAM_UNIQUENESS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
doc_sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(t, i, i + {RARE_NGRAM_N - 1}), ' ') AS s
  FROM toks, UNNEST(generate_series(1, len(t) - {RARE_NGRAM_N - 1})) AS g(i)
  WHERE len(t) >= {RARE_NGRAM_N}
),
uniq AS (
  SELECT only_doc AS doc_id, COUNT(*) AS n_unique FROM (
    SELECT s, COUNT(*) AS df, MIN(doc_id) AS only_doc
    FROM doc_sh GROUP BY s
  ) WHERE df = 1 GROUP BY only_doc
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM doc_sh GROUP BY doc_id
)
SELECT sizes.doc_id,
       CAST(sizes.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(uniq.n_unique, 0) AS BIGINT) AS n_unique_ngrams,
       ROUND(CAST(COALESCE(uniq.n_unique, 0) AS DOUBLE) / sizes.n_shingles, 6)
         AS uniqueness_ratio
FROM sizes LEFT JOIN uniq ON uniq.doc_id = sizes.doc_id
"""


# --- normalization ladder (round 9) --------------------------------------

#: (tier name, ordered) — each tier's normalization composes the previous
#: one, so group counts are monotonically non-increasing down the ladder.
NORM_LADDER_TIERS = (
    "exact",
    "lower",
    "squash_ws",
    "strip_punct",
    "strip_digits",
)


def normalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup sensitivity ladder: how many duplicate documents each
    successively more aggressive text normalization exposes — exact
    bytes, lowercase, whitespace-squash, punctuation-strip,
    digit-strip.  The gap between adjacent tiers is the census a
    pipeline owner reads before picking a dedup key (dedup_exact uses
    tier 1's key, dedup_normalized roughly tier 3); a big jump at
    strip_digits, say, means serial-numbered template pages dominate
    and exact hashing will miss them.

    Scale shape: ONE text-only scan computes all five normalized keys,
    then a single aggregate with five count-distincts (Spark plans
    multi-distinct via one expand — 5x the scan rows into a partial
    agg, no extra scans, no joins); the result is one row stacked into
    five.  Each distinct is hash-based at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    t_lower = F.lower(F.col("text"))
    t_ws = F.trim(F.regexp_replace(t_lower, r"\s+", " "))
    t_punct = F.regexp_replace(t_ws, r"[^\p{L}\p{N} ]", "")
    t_digit = F.regexp_replace(t_punct, r"\p{N}+", "")
    agg = docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.col("text")).alias("g0"),
        F.countDistinct(t_lower).alias("g1"),
        F.countDistinct(t_ws).alias("g2"),
        F.countDistinct(t_punct).alias("g3"),
        F.countDistinct(t_digit).alias("g4"),
    )
    stack_expr = ", ".join(
        f"'{name}', g{i}" for i, name in enumerate(NORM_LADDER_TIERS)
    )
    return agg.select(
        F.expr(f"stack({len(NORM_LADDER_TIERS)}, {stack_expr}) AS (tier, n_groups)"),
        "n_docs",
    ).select(
        "tier",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_groups").cast("bigint").alias("n_groups"),
        (F.col("n_docs") - F.col("n_groups")).cast("bigint").alias("n_dup_docs"),
    )


NORMALIZATION_LADDER_SQL = r"""
WITH norm AS (
  SELECT text AS t0,
         lower(text) AS t1,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t2,
         regexp_replace(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                        '[^\p{L}\p{N} ]', '', 'g') AS t3,
         regexp_replace(
           regexp_replace(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                          '[^\p{L}\p{N} ]', '', 'g'),
           '\p{N}+', '', 'g') AS t4
  FROM documents
),
agg AS (
  SELECT COUNT(*) AS n_docs,
         COUNT(DISTINCT t0) AS g0, COUNT(DISTINCT t1) AS g1,
         COUNT(DISTINCT t2) AS g2, COUNT(DISTINCT t3) AS g3,
         COUNT(DISTINCT t4) AS g4
  FROM norm
)
SELECT tier, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_groups AS BIGINT) AS n_groups,
       CAST(n_docs - n_groups AS BIGINT) AS n_dup_docs
FROM (
  SELECT 'exact' AS tier, n_docs, g0 AS n_groups FROM agg
  UNION ALL SELECT 'lower', n_docs, g1 FROM agg
  UNION ALL SELECT 'squash_ws', n_docs, g2 FROM agg
  UNION ALL SELECT 'strip_punct', n_docs, g3 FROM agg
  UNION ALL SELECT 'strip_digits', n_docs, g4 FROM agg
)
"""


#: Writer-shard count the exact-dup manifest audits — stands in for the
#: output partition count of a distributed writer; the manifest is
#: MANIFEST_SHARDS rows regardless of corpus size.
MANIFEST_SHARDS = 8


def shard_dup_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup manifest at the WRITER-SHARD level — the table a dedup
    planner reads to decide whether shard-local dedup suffices or a
    global shuffle is required (VERDICT r11 #3's second candidate;
    composes dedup_exact's hash with the standing md5 bucket rule).
    Every document is assigned to one of {MANIFEST_SHARDS} shards by
    md5('shard:' || doc_id); per shard the manifest reports, over
    dedup_exact's text-hash groups:

      n_docs / n_groups        — shard size and distinct-text count
      dup_docs                 — docs whose group has >1 copy ANYWHERE
      local_excess             — docs a shard-LOCAL keep-one pass drops
      global_excess            — docs a GLOBAL keep-min-doc_id pass
                                 drops from this shard (group keepers
                                 attributed to the shard holding the
                                 group's min doc_id)
      cross_shard_dup_docs     — dup docs whose group spans >=2 shards:
                                 exactly the mass shard-local dedup
                                 cannot see

    cross_shard_dup_docs ~ 0 means each shard can dedup independently
    (a map-side pass, no global exchange); the gap between local_excess
    and global_excess is the exact row budget that exchange buys back.
    Identity: sum(global_excess) - sum(local_excess) over shards = one
    surviving copy per extra shard a group spans, i.e. sum(n_shards - 1)
    over cross-shard groups (tests pin this; ADVICE r12 reword).

    Scale shape: ONE (doc_id, text) scan into a (text_hash, shard)
    keyed aggregation (shuffle rows carry a 32-char hash + counters,
    never the text), group totals via a text_hash window OVER THE CELL
    RELATION (cells ≤ docs; no self-join, no second scan — the
    windowed form replaced a cell⋈group join that re-scanned the
    corpus), then a {MANIFEST_SHARDS}-row rollup.  At 100 TB this is
    dedup_exact's certified shuffle shape plus one hash-keyed window.
    Exactness: integer counts end-to-end; cross-engine because both
    the text hash and the shard bucket are md5-derived
    (functions/hashing.py parity)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.lower(F.trim("text"))).alias("text_hash"),
        (
            hash32(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
            % MANIFEST_SHARDS
        ).cast("int").alias("shard"),
    )
    cell = docs.groupBy("text_hash", "shard").agg(
        F.count("*").alias("n_local"), F.min("doc_id").alias("cell_min")
    )
    w = Window.partitionBy("text_hash")
    j = cell.select(
        "shard",
        "n_local",
        "cell_min",
        F.sum("n_local").over(w).alias("n_copies"),
        F.count("*").over(w).alias("n_shards"),
        F.min("cell_min").over(w).alias("keep_id"),
    )
    return j.groupBy("shard").agg(
        F.sum("n_local").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(
            F.when(F.col("n_copies") > 1, F.col("n_local")).otherwise(0)
        ).cast("bigint").alias("dup_docs"),
        F.sum(
            F.when(F.col("n_local") > 1, F.col("n_local") - 1).otherwise(0)
        ).cast("bigint").alias("local_excess"),
        F.sum(
            F.col("n_local")
            - F.when(F.col("cell_min") == F.col("keep_id"), 1).otherwise(0)
        ).cast("bigint").alias("global_excess"),
        F.sum(
            F.when(F.col("n_shards") > 1, F.col("n_local")).otherwise(0)
        ).cast("bigint").alias("cross_shard_dup_docs"),
    )


SHARD_DUP_MANIFEST_SQL = f"""
WITH docs AS (
  SELECT doc_id,
         md5(lower(trim(text))) AS text_hash,
         CAST({sql_hash32("'shard:' || CAST(doc_id AS VARCHAR)")}
              % {MANIFEST_SHARDS} AS INT) AS shard
  FROM documents
),
cell AS (
  SELECT text_hash, shard, COUNT(*) AS n_local, MIN(doc_id) AS cell_min
  FROM docs GROUP BY 1, 2
),
j AS (
  -- group totals via a text_hash WINDOW, mirroring the engine: a
  -- cell-vs-rollup equi-join would DROP the NULL-text group (NULL
  -- never equi-joins), while PARTITION BY groups NULLs together in
  -- both engines — exactly like the GROUP BY that built the cells
  SELECT shard, n_local, cell_min,
         SUM(n_local) OVER (PARTITION BY text_hash) AS n_copies,
         COUNT(*) OVER (PARTITION BY text_hash) AS n_shards,
         MIN(cell_min) OVER (PARTITION BY text_hash) AS keep_id
  FROM cell
)
SELECT shard,
       CAST(SUM(n_local) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n_copies > 1 THEN n_local ELSE 0 END)
            AS BIGINT) AS dup_docs,
       CAST(SUM(CASE WHEN n_local > 1 THEN n_local - 1 ELSE 0 END)
            AS BIGINT) AS local_excess,
       CAST(SUM(n_local - CASE WHEN cell_min = keep_id
                               THEN 1 ELSE 0 END)
            AS BIGINT) AS global_excess,
       CAST(SUM(CASE WHEN n_shards > 1 THEN n_local ELSE 0 END)
            AS BIGINT) AS cross_shard_dup_docs
FROM j
GROUP BY shard
"""


#: Equal-width hash32 range per training shard (2^32 / MANIFEST_SHARDS,
#: exact): the deterministic planner view of the range partitioning
#: ``sources/layout.py write_training_shards`` asks Spark to sample.
#: The "exact" claim requires MANIFEST_SHARDS | 2^32 (i.e. a power of
#: two): with a non-divisor, keys in the remainder band near 2^32 would
#: map to shard id == MANIFEST_SHARDS — an extra phantom shard — in
#: BOTH engines, silently skewing the load_factor math (ADVICE r13).
if (1 << 32) % MANIFEST_SHARDS != 0:  # not assert: survives python -O (ADVICE r14)
    raise ValueError(
        "MANIFEST_SHARDS must divide 2^32 exactly (power of two); the "
        "shard = key DIV width split in training_shard_balance_audit and "
        "its oracle assumes no remainder band"
    )
SHARD_RANGE_WIDTH = (1 << 32) // MANIFEST_SHARDS


def training_shard_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware balance audit of the training-shard WRITER layout
    (VERDICT r12 #3's first candidate: pair shard_dup_manifest with
    ``sources/layout.py write_training_shards``): the writer orders
    rows by hash32(doc_id) and range-partitions that key space into
    shards, so this op assigns every document to its deterministic
    equal-width hash range — shard = key DIV {SHARD_RANGE_WIDTH}, the
    ideal split Spark's sampled repartitionByRange approximates — and
    reports per shard what the epoch files will look like BEFORE and
    AFTER global exact dedup:

      n_docs           — rows the writer sends to this shard
      n_kept           — rows surviving the global keep-min-doc_id
                         pass (dedup_exact's rule, NULL texts one
                         group via the window form)
      kept_frac        — shard-local survival rate
      load_factor      — n_docs x {MANIFEST_SHARDS} / total: 1.0 is a
                         perfectly balanced layout; the md5 key space
                         makes this ~1 regardless of doc_id skew
      kept_load_factor — same, over the deduped epoch: whether dedup
                         UNBALANCES the shards (dup groups are not
                         hash-uniform — they concentrate wherever the
                         copies' doc_ids landed)

    A kept_load_factor spread wider than load_factor's is the signal
    to re-shard AFTER dedup rather than reuse the raw layout — the
    decision this table prices without writing a single shard file.

    Scale shape: ONE (doc_id, text) scan projected to (text_hash,
    doc_id, shard) — the shuffle rows carry a 32-char hash + two ints,
    never text; keeper marking is a text_hash window (the manifest's
    certified shape); then a {MANIFEST_SHARDS}-row rollup whose grand
    totals are unpartitioned-window sums over those rows (the
    round-13 user_activity_power_law lesson: never re-aggregate the
    source for a divisor).  Exactness: integer counts; md5-derived key
    and hash both sides (functions/hashing.py parity); DIV on
    non-negative operands truncates identically in both engines."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.lower(F.trim("text"))).alias("text_hash"),
        hash32(F.col("doc_id").cast("string")).alias("skey"),
    ).select(
        "doc_id",
        "text_hash",
        F.expr(f"skey DIV {SHARD_RANGE_WIDTH}").cast("int").alias("shard"),
    )
    w = Window.partitionBy("text_hash")
    marked = docs.select(
        "shard",
        (F.col("doc_id") == F.min("doc_id").over(w)).cast("int").alias("kept"),
    )
    per = marked.groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("kept").alias("n_kept")
    )
    wt = Window.partitionBy()  # grand totals over the shard rows
    return per.select(
        F.col("shard").cast("int").alias("shard"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.round(F.col("n_kept") / F.col("n_docs"), 6).alias("kept_frac"),
        F.round(
            F.col("n_docs") * MANIFEST_SHARDS / F.sum("n_docs").over(wt), 6
        ).alias("load_factor"),
        F.round(
            F.col("n_kept") * MANIFEST_SHARDS / F.sum("n_kept").over(wt), 6
        ).alias("kept_load_factor"),
    )


TRAINING_SHARD_BALANCE_SQL = f"""
WITH d AS (
  SELECT doc_id,
         md5(lower(trim(text))) AS text_hash,
         CAST({sql_hash32("CAST(doc_id AS VARCHAR)")}
              // {SHARD_RANGE_WIDTH} AS INT) AS shard
  FROM documents
),
k AS (
  -- keeper marking via a text_hash WINDOW (the NULL-text group rule:
  -- PARTITION BY groups NULLs together; an equi-join would drop them)
  SELECT shard,
         CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY text_hash)
              THEN 1 ELSE 0 END AS kept
  FROM d
),
per AS (
  SELECT shard, COUNT(*) AS n_docs, SUM(kept) AS n_kept
  FROM k GROUP BY shard
)
SELECT CAST(shard AS INT) AS shard,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_kept AS BIGINT) AS n_kept,
       ROUND(CAST(n_kept AS DOUBLE) / n_docs, 6) AS kept_frac,
       ROUND(CAST(n_docs AS DOUBLE) * {MANIFEST_SHARDS}
             / SUM(n_docs) OVER (), 6) AS load_factor,
       ROUND(CAST(n_kept AS DOUBLE) * {MANIFEST_SHARDS}
             / SUM(n_kept) OVER (), 6) AS kept_load_factor
FROM per
"""


#: lsh_threshold_sweep: grid step and bounds — thresholds t =
#: (i + 5)/20 for i = 0..15, i.e. 0.25 (MINHASH_EST_THRESHOLD, the
#: floor below which minhash_pairs emits nothing) through 1.00 in
#: 0.05 steps.  Built from INTEGER arithmetic then one IEEE double
#: division so Spark and DuckDB compute bit-identical grid values —
#: a float accumulation (0.25 + i*0.05) would put grid points a few
#: ULPs off the exact k/16 estimate values and flip >= comparisons at
#: the 0.25/0.50/0.75/1.00 boundaries.
SWEEP_GRID_N = 16
#: A selected pair counts as a TRUE near-duplicate when its exact
#: 3-gram Jaccard (minhash_calibration's truth column) clears 0.5 —
#: the same midpoint PRUNED_THRESHOLD uses for the exact 3-gram pair
#: query, so the sweep's precision is measured against the corpus
#: relation users already query.
SWEEP_TRUE_JACCARD = 0.5


def lsh_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MINHASH_EST_THRESHOLD tuning table: for every candidate
    threshold t on the 16-point grid, how many LSH candidate pairs the
    detector would keep at est_jaccard >= t, how many of those are
    true near-duplicates (exact 3-gram Jaccard >= {SWEEP_TRUE_JACCARD}),
    the resulting precision, and the recall CONDITIONAL on LSH
    candidacy (the banding layer's own recall is audited separately by
    minhash_band_stats; this sweep tunes the threshold applied AFTER
    banding).  The table a platform team reads before moving the
    production threshold — the LSH twin of ivf_probe_recall_curve's
    probe-budget table (similarity.py).

    Composes only certified machinery: minhash_calibration's
    est-vs-exact pair relation (dedup.py:377 — banded LSH collisions
    only, candidate-anchored exact intersections).  The sweep itself
    is a broadcast 16-row grid theta-joined against that bounded pair
    relation (each pair fans out to the <= 16 thresholds it clears —
    constant factor, never all-pairs), then one aggregation; the
    conditional-recall denominator is FIRST_VALUE over the
    threshold-ordered 16-row result (t = 0.25 keeps every candidate by
    construction), never an agg + crossJoin re-derivation.

    Determinism: est_jaccard is k/16 (exact binary doubles),
    exact_jaccard is 6-dp-rounded in both engines, grid values are
    integer/20 divisions — every comparison is over bit-identical
    doubles; NULLIF guards the empty-selection divisions."""
    cal_full = minhash_calibration(spark, sf_dir)
    cal = cal_full.select("est_jaccard", "exact_jaccard")
    grid = F.broadcast(
        spark.range(SWEEP_GRID_N).select(
            ((F.col("id") + 5).cast("double") / F.lit(20.0)).alias("threshold")
        )
    )
    swept = grid.join(cal, cal.est_jaccard >= F.col("threshold"), "left")
    agg = swept.groupBy("threshold").agg(
        F.count("est_jaccard").alias("n_selected"),
        F.sum(
            F.when(F.col("exact_jaccard") >= SWEEP_TRUE_JACCARD, 1).otherwise(0)
        ).alias("n_true"),
    )
    tw = Window.orderBy("threshold")  # 16 rows — single tiny partition
    out = (
        agg.withColumn("n_true_all", F.first("n_true").over(tw))
        .select(
            F.round("threshold", 2).alias("threshold"),
            F.col("n_selected").cast("bigint").alias("n_selected"),
            F.col("n_true").cast("bigint").alias("n_true_dups"),
            F.round(
                F.col("n_true").cast("double")
                / F.nullif(F.col("n_selected").cast("double"), F.lit(0.0)),
                6,
            ).alias("precision_at_t"),
            F.round(
                F.col("n_true").cast("double")
                / F.nullif(F.col("n_true_all").cast("double"), F.lit(0.0)),
                6,
            ).alias("cond_recall"),
        )
    )
    # propagate from the pre-select handle: .select() returns a NEW
    # DataFrame object that drops Python-side attrs (ADVICE-class bug
    # caught in the r14 self-review — the old getattr on the projected
    # relation was always empty while two caches stayed registered)
    return with_shared_caches(out, cal_full)


LSH_THRESHOLD_SWEEP_SQL = f"""
WITH cal AS (
  {MINHASH_CALIBRATION_SQL.strip()}
),
grid AS (
  SELECT CAST(i + 5 AS DOUBLE) / 20.0 AS threshold
  FROM UNNEST(generate_series(0, {SWEEP_GRID_N - 1})) AS g(i)
),
agg AS (
  SELECT g.threshold,
         COUNT(c.est_jaccard) AS n_selected,
         SUM(CASE WHEN c.exact_jaccard >= {SWEEP_TRUE_JACCARD}
                  THEN 1 ELSE 0 END) AS n_true
  FROM grid g
  LEFT JOIN cal c ON c.est_jaccard >= g.threshold
  GROUP BY g.threshold
)
SELECT ROUND(threshold, 2) AS threshold,
       CAST(n_selected AS BIGINT) AS n_selected,
       CAST(n_true AS BIGINT) AS n_true_dups,
       ROUND(CAST(n_true AS DOUBLE)
             / NULLIF(CAST(n_selected AS DOUBLE), 0.0), 6) AS precision_at_t,
       ROUND(CAST(n_true AS DOUBLE)
             / NULLIF(CAST(FIRST_VALUE(n_true) OVER (ORDER BY threshold)
                           AS DOUBLE), 0.0), 6) AS cond_recall
FROM agg
"""


QUERIES = {
    "dup_cluster_histogram": dup_cluster_histogram,
    "neardup_method_agreement": neardup_method_agreement,
    "dedup_keep_best": dedup_keep_best,
    "semantic_dedup_keep": semantic_dedup_keep,
    "paragraph_dedup": paragraph_dedup,
    "dedup_exact": dedup_exact,
    "dedup_normalized": dedup_normalized,
    "dedup_incremental_triage": dedup_incremental_triage,
    "incremental_triage_materialized": incremental_triage_materialized,
    "minhash_signatures": minhash_signatures,
    "dedup_minhash_pairs": dedup_minhash_pairs,
    "minhash_band_stats": minhash_band_stats,
    "minhash_calibration": minhash_calibration,
    "pair_review_sample": pair_review_sample,
    "dup_graph_degree_stats": dup_graph_degree_stats,
    "neardup_pagerank": neardup_pagerank,
    "simhash_signatures": simhash_signatures,
    "simhash_neardup_pairs": simhash_neardup_pairs,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "ngram_jaccard_pruned": ngram_jaccard_pruned,
    "neardup_clusters": neardup_clusters,
    "dup_ngram_fraction": dup_ngram_fraction,
    "dup_span_manifest": dup_span_manifest,
    "ngram_containment_pairs": ngram_containment_pairs,
    "containment_bottomk_pairs": containment_bottomk_pairs,
    "semantic_drop_by_source": semantic_drop_by_source,
    "neardup_weighted_sample": neardup_weighted_sample,
    "cross_source_dup_matrix": cross_source_dup_matrix,
    "source_minhash_similarity": source_minhash_similarity,
    "quality_by_dup_class": quality_by_dup_class,
    "graph_triangle_counts": graph_triangle_counts,
    "graph_kcore_membership": graph_kcore_membership,
    "rare_ngram_uniqueness": rare_ngram_uniqueness,
    "normalization_ladder": normalization_ladder,
    "shard_dup_manifest": shard_dup_manifest,
    "training_shard_balance_audit": training_shard_balance_audit,
    "lsh_threshold_sweep": lsh_threshold_sweep,
}

ORACLES = {
    "dup_cluster_histogram": DUP_HISTOGRAM_SQL,
    "neardup_method_agreement": _method_agreement_sql(),
    "dedup_keep_best": _dedup_keep_best_sql(),
    "semantic_dedup_keep": _semantic_dedup_sql(),
    "paragraph_dedup": PARAGRAPH_DEDUP_SQL,
    "neardup_clusters": NEARDUP_CLUSTERS_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_normalized": DEDUP_NORMALIZED_SQL,
    "dedup_incremental_triage": INCREMENTAL_TRIAGE_SQL.format(PAIRS=minhash_pairs_sql("documents").strip()),
    # shares the single-scan oracle: a green row certifies the
    # materialized-base path verdict-identical to the replayable SQL
    "incremental_triage_materialized": INCREMENTAL_TRIAGE_SQL.format(PAIRS=minhash_pairs_sql("documents").strip()),
    "minhash_signatures": MINHASH_SIG_SQL,
    "dedup_minhash_pairs": DEDUP_MINHASH_PAIRS_SQL,
    "minhash_band_stats": MINHASH_BAND_STATS_SQL,
    "minhash_calibration": MINHASH_CALIBRATION_SQL,
    "pair_review_sample": PAIR_REVIEW_SQL,
    "dup_graph_degree_stats": DUP_GRAPH_DEGREE_SQL,
    "neardup_pagerank": NEARDUP_PAGERANK_SQL,
    "simhash_signatures": SIMHASH_SQL,
    "simhash_neardup_pairs": SIMHASH_NEARDUP_SQL,
    "ngram_jaccard_pairs": NGRAM_JACCARD_SQL,
    "ngram_jaccard_pruned": NGRAM_JACCARD_PRUNED_SQL,
    "dup_ngram_fraction": DUP_NGRAM_FRACTION_SQL,
    "dup_span_manifest": DUP_SPAN_MANIFEST_SQL,
    "ngram_containment_pairs": NGRAM_CONTAINMENT_SQL,
    "containment_bottomk_pairs": CONTAINMENT_BOTTOMK_SQL,
    "semantic_drop_by_source": _semantic_drop_by_source_sql(),
    "neardup_weighted_sample": NEARDUP_WEIGHTED_SAMPLE_SQL,
    "cross_source_dup_matrix": CROSS_SOURCE_DUP_SQL,
    "source_minhash_similarity": _source_minhash_sql(),
    "quality_by_dup_class": _quality_by_dup_class_sql(),
    "graph_triangle_counts": GRAPH_TRIANGLES_SQL,
    "graph_kcore_membership": _kcore_sql(),
    "rare_ngram_uniqueness": RARE_NGRAM_UNIQUENESS_SQL,
    "normalization_ladder": NORMALIZATION_LADDER_SQL,
    "shard_dup_manifest": SHARD_DUP_MANIFEST_SQL,
    "training_shard_balance_audit": TRAINING_SHARD_BALANCE_SQL,
    "lsh_threshold_sweep": LSH_THRESHOLD_SWEEP_SQL,
}
