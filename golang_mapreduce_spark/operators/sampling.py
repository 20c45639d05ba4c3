"""Deterministic sampling and dataset splitting over ``documents`` —
the reproducibility primitives a training-data pipeline needs.

`df.sample()` is seed-deterministic only per Spark version/partitioning;
these operators hash the ROW KEY instead, so membership is a pure
function of the data: stable across engines, re-runs, repartitioning,
and incremental appends (a new document never changes an old one's
split).  That is exactly how production corpora pin train/val/test —
hash(id) mod buckets — and it is trivially replicable in the oracle.

Scale: both queries are single-scan narrow projections plus one bounded
aggregation; sampling pushes nothing to the driver and needs no global
coordination (contrast reservoir sampling, which needs a merge pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_mapreduce_spark.caching import with_shared_caches
from golang_mapreduce_spark.functions.hashing import hash32, sql_hash32
from golang_mapreduce_spark.sources.fixtures import load_table

SAMPLE_PCT = 10           # hash_sample keeps buckets [0, 10) of 100
TRAIN_PCT, VAL_PCT = 80, 10  # split: [0,80) train, [80,90) val, rest test

#: hash the doc_id AS TEXT via md5 (cross-engine); bucket in [0, 100)
_BUCKET = "h % 100"


def _bucket_col() -> F.Column:
    return (hash32(F.col("doc_id").cast("string")) % 100).alias("bucket")


def hash_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~{pct}% document sample: keep doc ids whose md5
    bucket falls in [0, {pct}).  Membership is a pure function of
    doc_id — the same rows are sampled on any cluster, any partitioning,
    any engine."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "lang", "n_chars", _bucket_col())
        .where(F.col("bucket") < SAMPLE_PCT)
        .select("doc_id", "lang", "n_chars")
    )


HASH_SAMPLE_SQL = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < {SAMPLE_PCT}
"""


N_SHARDS = 8


def shuffle_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-data shuffle: every document gets a
    (shard, position) from the hash of its id — the manifest a trainer
    consumes to read a reproducible pseudo-random document order without
    any engine-side randomness.  shard = hash bucket; position = rank of
    the hash within the shard (ties broken by doc_id).

    Scale shape: this is how you shuffle 100 TB — never a global sort.
    One exchange hash-partitions on shard, and each shard sorts
    independently (its size is N/{N_SHARDS}, and a trainer that needs
    smaller units raises N_SHARDS; position is per-shard, so no
    cross-shard coordination exists).  Appends are stable: a new doc
    lands at a deterministic (shard, hash) and only shifts positions
    after it within one shard."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    h = hash32(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", h.alias("h"))
        .withColumn("shard", (F.col("h") % N_SHARDS).cast("int"))
        .select(
            "doc_id",
            "shard",
            F.row_number().over(w).alias("pos"),
        )
    )


SHUFFLE_SHARD_SQL = f"""
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM documents
)
SELECT doc_id,
       CAST(h % {N_SHARDS} AS INT) AS shard,
       ROW_NUMBER() OVER (PARTITION BY h % {N_SHARDS}
                          ORDER BY h, doc_id) AS pos
FROM h
"""


def dataset_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment by hash bucket ([0,80) / [80,90) /
    [90,100)), summarized per (split, lang).  Appending new documents
    never reassigns existing ones — the property that keeps eval sets
    stable as a corpus grows."""
    docs = load_table(spark, sf_dir, "documents")
    split = (
        F.when(F.col("bucket") < TRAIN_PCT, "train")
        .when(F.col("bucket") < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        docs.select("doc_id", "lang", "n_chars", _bucket_col())
        .select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


DATASET_SPLIT_SQL = f"""
SELECT CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
            WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT lang, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
  FROM documents
)
GROUP BY 1, 2
"""


#: Rebalancing granularity: keep-rates are expressed in parts-per-million
#: so integer arithmetic stays exact cross-engine.
PPM = 1_000_000


def balance_langs_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalanced sample: downsample every language to
    (approximately) the size of the SMALLEST language, membership decided
    by hash threshold — the corpus-rebalancing step that stops one
    dominant language from swamping a multilingual training mix.

    keep-rate(lang) = floor(min_count * 1e6 / count(lang)) ppm; a doc
    stays iff hash32('bal:' || doc_id) % 1e6 < rate.  Membership is a
    pure function of (doc_id, per-lang totals): stable across engines and
    partitionings.

    Scale shape: the per-lang counts aggregate to |langs| rows (tiny,
    broadcast back); the sample itself is a stateless map-side filter —
    no shuffle of document rows at all.  The alternative exact-K design
    (row_number over a per-lang window, keep K) needs a full sort of
    every stratum and makes each language one partition — a skew trap at
    100 TB; the hash-threshold form trades exact counts (binomial
    concentration gives ±O(sqrt(K)) at scale) for a shuffle-free scan."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    min_cnt = counts.agg(F.min("cnt").alias("m"))
    rates = F.broadcast(
        counts.crossJoin(F.broadcast(min_cnt)).select(
            # integer division on BOTH engines (Spark `div`, DuckDB `//`):
            # double-division-then-cast rounds in DuckDB but truncates in
            # Spark, so the exact-integer form is the only portable one
            "lang",
            F.expr(f"m * {PPM} div cnt").alias("rate_ppm"),
        )
    )
    h = hash32(F.concat(F.lit("bal:"), F.col("doc_id").cast("string")))
    return (
        docs.join(rates, "lang")
        .where(h % PPM < F.col("rate_ppm"))
        .select("doc_id", "lang", "source")
    )


BALANCE_LANGS_SQL = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
),
rates AS (
  SELECT lang,
         (SELECT MIN(cnt) FROM counts) * {PPM} // cnt AS rate_ppm
  FROM counts
)
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN rates r USING (lang)
WHERE ('0x' || substr(md5('bal:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
      % {PPM} < r.rate_ppm
"""


def temperature_rebalance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed language rebalancing (alpha = 1/2):
    keep-rate(lang) = (min_count / count)^alpha — the standard
    multilingual-corpus smoothing that interpolates between keeping
    everything (alpha=0) and full equalization (alpha=1,
    balance_langs_sample).  sqrt is IEEE correctly-rounded, and both
    engines evaluate the identical expression tree on the identical
    integers, so the double rate (and its ppm floor) is bit-identical
    cross-engine; membership is the same hash-threshold scheme as
    balance_langs_sample under a distinct salt.

    Scale: identical to balance_langs_sample — a |langs|-row broadcast
    and a stateless map-side filter."""
    docs = load_table(spark, sf_dir, "documents")
    h = hash32(F.concat(F.lit("temp:"), F.col("doc_id").cast("string")))
    return (
        docs.join(temp_rates(docs), "lang")
        .where(h % PPM < F.col("rate_ppm"))
        .select("doc_id", "lang", "source")
    )


def temp_rates(docs: DataFrame) -> DataFrame:
    """Broadcast (lang, rate_ppm) table for alpha=1/2 temperature
    smoothing over any (…, lang) relation — shared by the standalone
    sampler and the training_data_run composition.  sqrt is IEEE
    correctly-rounded on identical integers, so the ppm floor is
    bit-identical cross-engine."""
    counts = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    min_cnt = counts.agg(F.min("cnt").alias("m"))
    return F.broadcast(
        counts.crossJoin(F.broadcast(min_cnt)).select(
            "lang",
            F.floor(F.sqrt(F.col("m") / F.col("cnt")) * PPM).alias("rate_ppm"),
        )
    )


#: SQL twin of :func:`temp_rates` (CTE block; enclosing WITH required).
TEMP_RATES_CTES = f"""tcounts AS (
  SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
),
trates AS (
  SELECT lang,
         CAST(FLOOR(SQRT((SELECT MIN(cnt) FROM tcounts) / CAST(cnt AS DOUBLE))
                    * {PPM}) AS BIGINT) AS rate_ppm
  FROM tcounts
)"""

#: SQL membership predicate for the 'temp:' hash-threshold sample; the
#: enclosing query must join ``trates r`` on lang.
TEMP_KEEP_PRED = (
    "('0x' || substr(md5('temp:' || CAST({alias}.doc_id AS VARCHAR)), 1, 8))"
    f"::BIGINT % {PPM} < r.rate_ppm"
)

TEMPERATURE_REBALANCE_SQL = f"""
WITH {TEMP_RATES_CTES}
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN trates r USING (lang)
WHERE {TEMP_KEEP_PRED.format(alias='d')}
"""


#: Per-source token budget for quality-ranked selection (fixture docs
#: run 10-99 tokens, ~25 docs/source at any SF — 400 keeps the best
#: handful per source and exercises the boundary).
SRC_TOKEN_BUDGET = 400


def source_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked data selection under a per-source token budget:
    within each source, take documents best-quality-first (ties on
    doc_id) while the running token total stays within
    {SRC_TOKEN_BUDGET} — the "skim the best K tokens per domain" stage
    of corpus assembly (the budgeted form of quality filtering: a fixed
    threshold can't cap a mega-domain, a budget can).

    Scale shape: ONE window pass partitioned by source — the partition
    key is the high-cardinality domain, so the sort is per-stratum, not
    global.  A pathological mega-domain (one source >> executor memory)
    shifts this to the histogram-threshold form: per-(source,
    quality-bucket) token sums (tiny), cumulative over the histogram to
    find each source's cutoff bucket, exact ranking only inside the one
    boundary bucket — same answer, bounded memory.  Tokens are counted
    from the same whitespace tokenizer every token stat shares."""
    from pyspark.sql.window import Window

    from golang_mapreduce_spark.functions.text import ws_words
    from golang_mapreduce_spark.operators.textstats import quality_scores

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(ws_words("text")).cast("bigint").alias("n_toks")
    )
    q = quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.join(q, "doc_id")
        .select(
            "source",
            "doc_id",
            "quality_score",
            "n_toks",
            F.sum("n_toks").over(w).alias("cum_toks"),
        )
        .where(F.col("cum_toks") <= SRC_TOKEN_BUDGET)
    )


def _source_budget_sql() -> str:
    from golang_mapreduce_spark.operators.textstats import QUALITY_SQL

    return f"""
WITH q AS (
  {QUALITY_SQL.strip()}
),
toks AS (
  SELECT doc_id, source,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_toks
  FROM documents
),
ranked AS (
  SELECT t.source, t.doc_id, q.quality_score, t.n_toks,
         CAST(SUM(t.n_toks) OVER (PARTITION BY t.source
                                  ORDER BY q.quality_score DESC, t.doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_toks
  FROM toks t JOIN q USING (doc_id)
)
SELECT source, doc_id, quality_score, n_toks, cum_toks
FROM ranked WHERE cum_toks <= {SRC_TOKEN_BUDGET}
"""


#: Quality-bucket count for the histogram-threshold budget fallback.
#: Bucketing is a monotone coarsening of the quality order, so the
#: per-bucket window refines to the identical global answer; more
#: buckets = smaller per-sort partitions (memory bound ~1/N_QBUCKETS of
#: the stratum).
N_QBUCKETS = 20


def source_budget_select_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MEGA-DOMAIN form of :func:`source_budget_select` (VERDICT r5
    #6) — same answer, bounded memory.  The plain form sorts each whole
    source stratum in one window partition; a source bigger than
    executor memory breaks that.  This form:

    1. buckets quality into {N_QBUCKETS} monotone bins and aggregates a
       per-(source, bucket) token HISTOGRAM (tiny: |sources|x{N_QBUCKETS}
       rows, partial-agg'd);
    2. computes each bucket's ``above`` = tokens in strictly better
       buckets via a window over the histogram rows only;
    3. PRUNES every bucket whose ``above`` already exceeds the budget —
       the bulk of a mega-domain is dropped map-side before any sort;
    4. ranks the surviving docs in windows partitioned by
       (source, bucket) — each sort is one bucket of one source, ~1/{N_QBUCKETS}
       the stratum — and keeps ``above + within-bucket running sum <=
       budget``.

    Equivalence to the window form is exact because bucket order refines
    quality order: a doc's global running sum equals its bucket's
    ``above`` plus its within-bucket running sum
    (tests/test_sampling_hist.py pins it; the driver oracle is the SAME
    SQL as source_budget_select)."""
    from pyspark.sql.window import Window

    from golang_mapreduce_spark.functions.text import ws_words
    from golang_mapreduce_spark.operators.textstats import quality_scores

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(ws_words("text")).cast("bigint").alias("n_toks")
    )
    q = quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    d = (
        docs.join(q, "doc_id")
        .withColumn(
            "qb", F.floor(F.col("quality_score") * N_QBUCKETS).cast("int")
        )
    )
    hist = d.groupBy("source", "qb").agg(F.sum("n_toks").alias("b_toks"))
    wh = (
        Window.partitionBy("source")
        .orderBy(F.desc("qb"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    above = hist.select(
        "source",
        "qb",
        F.coalesce(F.sum("b_toks").over(wh), F.lit(0)).alias("above_toks"),
    ).where(F.col("above_toks") <= SRC_TOKEN_BUDGET)
    wb = (
        Window.partitionBy("source", "qb")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.join(F.broadcast(above), ["source", "qb"])
        .select(
            "source",
            "doc_id",
            "quality_score",
            "n_toks",
            (F.col("above_toks") + F.sum("n_toks").over(wb)).alias("cum_toks"),
        )
        .where(F.col("cum_toks") <= SRC_TOKEN_BUDGET)
    )


#: Per-topic (IVF-cluster) token budget: clusters are the ~sqrt(N)
#: centroid family (~20 docs/cluster on the fixtures), so 400 keeps the
#: best handful per topic and exercises the boundary, mirroring
#: SRC_TOKEN_BUDGET.
TOPIC_TOKEN_BUDGET = 400


def topic_balanced_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-balanced data selection (VERDICT r5 #4) — the
    embedding-space analog of :func:`source_budget_select`: assign every
    document to its IVF cluster (single-probe, broadcast ~sqrt(N)
    centroids — the same assignment SemDeDup blocks on), then take
    documents best-quality-first within each TOPIC under a per-cluster
    token budget.  This is the cluster-balancing stage public pipelines
    run after dedup: source budgets cap domains, topic budgets cap
    semantic redundancy a domain split can't see (one topic spread
    across 1000 mirrors).

    Scale shape: the assignment is one BLAS pass against broadcast
    centroids (no all-pairs, no shuffle of embeddings beyond the scan);
    the budget window is partitioned by cluster — per-stratum sorts of
    ~N/sqrt(N) docs, never a global sort; a mega-cluster falls back to
    the same histogram-threshold form as source_budget_select_hist.
    ``vec_id`` is the fixture's 1:1 ``doc_id``."""
    from pyspark.sql.window import Window

    from golang_mapreduce_spark.functions.text import ws_words
    from golang_mapreduce_spark.operators.similarity import _centroids, _emb, _ivf_assign
    from golang_mapreduce_spark.operators.textstats import quality_scores

    emb = _emb(spark, sf_dir)
    assign = _ivf_assign(emb, _centroids(emb)).select(
        F.col("vec_id").alias("doc_id"), "cluster"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(ws_words("text")).cast("bigint").alias("n_toks")
    )
    q = quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    w = (
        Window.partitionBy("cluster")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        assign.join(docs, "doc_id")
        .join(q, "doc_id")
        .select(
            "cluster",
            "doc_id",
            "quality_score",
            "n_toks",
            F.sum("n_toks").over(w).alias("cum_toks"),
        )
        .where(F.col("cum_toks") <= TOPIC_TOKEN_BUDGET)
    )


def _topic_balanced_sql() -> str:
    from golang_mapreduce_spark.operators.similarity import EMB_ASSIGN_CTES
    from golang_mapreduce_spark.operators.textstats import QUALITY_SQL

    return f"""
WITH {EMB_ASSIGN_CTES},
q AS (
  {QUALITY_SQL.strip()}
),
toks AS (
  SELECT doc_id, CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_toks
  FROM documents
),
ranked AS (
  SELECT a.cluster, a.vec_id AS doc_id, q.quality_score, t.n_toks,
         CAST(SUM(t.n_toks) OVER (PARTITION BY a.cluster
                                  ORDER BY q.quality_score DESC, a.vec_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_toks
  FROM assign a
  JOIN toks t ON t.doc_id = a.vec_id
  JOIN q ON q.doc_id = a.vec_id
)
SELECT cluster, doc_id, quality_score, n_toks, cum_toks
FROM ranked WHERE cum_toks <= {TOPIC_TOKEN_BUDGET}
"""


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: for the val and test splits of
    the standard hash assignment (dataset_split_counts' buckets), count
    documents with a NEAR-DUP partner in train — eval examples the
    model has effectively seen in training.  "Near-dup" is the engine's
    own MinHash-LSH pair relation (est_jaccard >= threshold), so the
    audit subsumes exact copies (est = 1.0) and catches the lightly
    edited ones exact hashing misses; this is the per-release eval gate
    the GPT-3 train-test overlap postmortem argues for (Brown et al.
    2020 §4) — dedup-before-split doesn't retire it, because post-split
    appends re-open the hole.

    Scale shape: the pair relation is the banded LSH join (collision
    buckets, never all-pairs); split assignment is a per-row hash
    expression joined to the pair list as ids only — no text moves.
    The leaked-id distinct and the two-row aggregate are bounded by the
    pair count, which the banding keeps linear in corpus size."""
    from golang_mapreduce_spark.operators.dedup import minhash_pairs_from

    docs = load_table(spark, sf_dir, "documents")
    split = (
        F.when(F.col("bucket") < TRAIN_PCT, "train")
        .when(F.col("bucket") < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    splits = docs.select("doc_id", _bucket_col()).select(
        "doc_id", split.alias("split")
    )
    pairs_full = minhash_pairs_from(docs)
    pairs = pairs_full.select("doc_a", "doc_b")
    sa = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    tagged = pairs.join(sa, "doc_a").join(sb, "doc_b")
    leaked = (
        tagged.where(
            (F.col("split_a") == "train") & (F.col("split_b") != "train")
        )
        .select(F.col("doc_b").alias("doc_id"))
        .union(
            tagged.where(
                (F.col("split_b") == "train") & (F.col("split_a") != "train")
            ).select(F.col("doc_a").alias("doc_id"))
        )
        .distinct()
        .withColumn("leaked", F.lit(1))
    )
    out = (
        splits.where(F.col("split") != "train")
        .join(leaked, "doc_id", "left")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum("leaked"), F.lit(0)).cast("bigint").alias(
                "n_leaked_docs"
            ),
            F.round(
                F.coalesce(F.sum("leaked"), F.lit(0)) / F.count("*"), 6
            ).alias("leak_rate"),
        )
    )
    return with_shared_caches(out, pairs_full)


def _split_leakage_sql() -> str:
    from golang_mapreduce_spark.operators.dedup import minhash_pairs_sql

    return f"""
WITH pairs AS (
  SELECT doc_a, doc_b FROM ({minhash_pairs_sql()})
),
splits AS (
  SELECT doc_id,
         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < {TRAIN_PCT} THEN 'train'
              WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
leaked AS (
  SELECT DISTINCT doc_id FROM (
    SELECT p.doc_b AS doc_id
    FROM pairs p
    JOIN splits a ON a.doc_id = p.doc_a
    JOIN splits b ON b.doc_id = p.doc_b
    WHERE a.split = 'train' AND b.split <> 'train'
    UNION ALL
    SELECT p.doc_a AS doc_id
    FROM pairs p
    JOIN splits a ON a.doc_id = p.doc_a
    JOIN splits b ON b.doc_id = p.doc_b
    WHERE b.split = 'train' AND a.split <> 'train'
  )
)
SELECT split,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN leaked.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked_docs,
       ROUND(CAST(SUM(CASE WHEN leaked.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS leak_rate
FROM splits LEFT JOIN leaked USING (doc_id)
WHERE split <> 'train'
GROUP BY split
"""


#: weighted reservoir: sample size and the uniform-hash modulus (prime,
#: so doc_id patterns can't alias the bucket).
RESERVOIR_K = 50
_RES_MOD = 1_000_003


def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample without replacement (Efraimidis &
    Spirakis 2006 A-Res): each doc gets key = ln(u)/w with u a
    deterministic hash-uniform in (0,1) and w its weight (chars here —
    in production a quality score); the K LARGEST keys are a
    probability-proportional-to-weight sample.  This is how you
    subsample a corpus toward quality without a global shuffle: the
    key is a per-row expression and the top-K is Spark's distributed
    TakeOrdered (per-partition heaps merged on the driver — the "merge
    pass" of classic reservoir sampling, but over K-row partials, not
    data).  Deterministic end-to-end: u is a pure function of doc_id,
    so the sample is stable across re-runs, engines, and partitioning,
    like every sampler in this module.

    Keys are rounded to 12 dp before ranking (ties then break on
    doc_id), the established quantum argument: engine ln() ulp
    differences sit ~1e-16, four orders below the rounding step."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    u = (hash32(F.col("doc_id").cast("string")) % _RES_MOD + 1) / F.lit(
        float(_RES_MOD + 1)
    )
    w = F.greatest(F.col("n_chars").cast("double"), F.lit(1.0))
    keyed = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").alias("weight_chars"),
        F.round(F.ln(u) / w, 12).alias("res_key"),
    )
    top = keyed.orderBy(F.desc("res_key"), F.asc("doc_id")).limit(RESERVOIR_K)
    w_rank = Window.orderBy(F.desc("res_key"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "source",
        "weight_chars",
        "res_key",
        F.row_number().over(w_rank).alias("sample_rank"),
    )


WEIGHTED_RESERVOIR_SQL = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars AS weight_chars,
         ROUND(ln((({sql_hash32("doc_id::VARCHAR")}) % {_RES_MOD} + 1)
                  / {float(_RES_MOD + 1)})
               / GREATEST(CAST(n_chars AS DOUBLE), 1.0), 12) AS res_key
  FROM documents
)
SELECT doc_id, source, weight_chars, res_key,
       ROW_NUMBER() OVER (ORDER BY res_key DESC, doc_id) AS sample_rank
FROM keyed
ORDER BY res_key DESC, doc_id
LIMIT {RESERVOIR_K}
"""


# --- source-level (group) split (round 10) ----------------------------------


def source_level_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe GROUP-level train/val/test split: the hash bucket is
    keyed on the SOURCE, so every document of a source lands in the same
    split — the assignment discipline when documents within a group
    correlate (near-dups, shared boilerplate, same crawl seed) and a
    doc-level split would leak train text into eval via its siblings
    (the failure split_leakage_audit measures after the fact; this
    prevents it by construction).  The manifest is the per-split rollup
    with the realized doc share against the target — coarse groups make
    shares drift, which is exactly why the audit column exists.

    Scale shape: one scan, the split is a pure projection of a hash of
    the source key (no join against a split table), one 3-row
    aggregate.  Appends are stable: a new source hashes to a fixed
    split and never reassigns an old one."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = hash32(F.concat(F.lit("srcsplit:"), F.col("source"))) % 100
    split = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    target = (
        F.when(F.col("split") == "train", TRAIN_PCT / 100.0)
        .when(F.col("split") == "val", VAL_PCT / 100.0)
        .otherwise((100 - TRAIN_PCT - VAL_PCT) / 100.0)
    )
    agg = (
        docs.select(split.alias("split"), "source", "n_chars")
        .groupBy("split")
        .agg(
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )
    total = agg.agg(F.sum("n_docs").alias("n_total"))
    return agg.crossJoin(F.broadcast(total)).select(
        "split",
        "n_sources",
        "n_docs",
        "total_chars",
        F.round(F.col("n_docs") / F.col("n_total"), 6).alias("doc_share"),
        F.round(target, 6).alias("target_share"),
        F.round(F.abs(F.col("n_docs") / F.col("n_total") - target), 6).alias(
            "abs_dev"
        ),
    )


SOURCE_SPLIT_SQL = f"""
WITH assigned AS (
  SELECT CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
              WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
              ELSE 'test' END AS split,
         source, n_chars
  FROM (
    SELECT source, n_chars,
           {sql_hash32("'srcsplit:' || source")} % 100 AS bucket
    FROM documents
  )
),
agg AS (
  SELECT split,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM assigned GROUP BY split
),
tot AS (
  SELECT SUM(n_docs) AS n_total FROM agg
)
SELECT split, n_sources, n_docs, total_chars,
       ROUND(CAST(n_docs AS DOUBLE) / n_total, 6) AS doc_share,
       ROUND(CAST(CASE split WHEN 'train' THEN {TRAIN_PCT / 100.0!r}
                             WHEN 'val' THEN {VAL_PCT / 100.0!r}
                             ELSE {(100 - TRAIN_PCT - VAL_PCT) / 100.0!r} END
                  AS DOUBLE), 6) AS target_share,
       ROUND(ABS(CAST(n_docs AS DOUBLE) / n_total
                 - CAST(CASE split WHEN 'train' THEN {TRAIN_PCT / 100.0!r}
                                   WHEN 'val' THEN {VAL_PCT / 100.0!r}
                                   ELSE {(100 - TRAIN_PCT - VAL_PCT) / 100.0!r} END
                        AS DOUBLE)), 6) AS abs_dev
FROM agg, tot
"""


# --- Deterministic k-fold assignment (round 11) -----------------------------

KFOLD_K = 5


def kfold_assignment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {k}-fold cross-validation assignment audit: every
    document's fold is md5('fold:' || doc_id) mod {k} (the standing
    hash-bucket convention — the same rows land in the same fold on any
    cluster, any partitioning, any engine), and the audit reports each
    (fold, lang, source) cell's count plus its share WITHIN the
    (lang, source) stratum and the deviation from the ideal 1/{k} —
    the imbalance table an eval harness checks before trusting
    per-fold metrics.  Fold membership itself is the full-table
    assignment rule; the audit relation is what ships.

    Scale shape: one map-side-combined groupBy over the
    (fold, lang, source) grid — k x |langs| x |sources| cells
    regardless of corpus size — then stratum shares via a window over
    that tiny relation.  Exactness: counts exact; share and deviation
    are single IEEE divides rounded 6 dp."""
    docs = load_table(spark, sf_dir, "documents")
    fold = (hash32(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))) % KFOLD_K)
    cells = (
        docs.select(fold.cast("int").alias("fold"), "lang", "source")
        .groupBy("fold", "lang", "source")
        .agg(F.count("*").alias("n_docs"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang", "source")
    share = F.col("n_docs").cast("double") / F.sum("n_docs").over(w)
    return cells.select(
        "fold",
        "lang",
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(share, 6).alias("stratum_share"),
        F.round(share - 1.0 / KFOLD_K, 6).alias("dev_from_ideal"),
    )


KFOLD_AUDIT_SQL = f"""
WITH cells AS (
  SELECT CAST({sql_hash32("'fold:' || CAST(doc_id AS VARCHAR)")} % {KFOLD_K}
              AS INT) AS fold,
         lang, source, COUNT(*) AS n_docs
  FROM documents
  GROUP BY 1, 2, 3
)
SELECT fold, lang, source,
       CAST(n_docs AS BIGINT) AS n_docs,
       ROUND(CAST(n_docs AS DOUBLE)
             / SUM(n_docs) OVER (PARTITION BY lang, source), 6)
         AS stratum_share,
       ROUND(CAST(n_docs AS DOUBLE)
             / SUM(n_docs) OVER (PARTITION BY lang, source)
             - 1.0 / {KFOLD_K}, 6) AS dev_from_ideal
FROM cells
"""


QUERIES = {
    "hash_sample_docs": hash_sample_docs,
    "weighted_reservoir_sample": weighted_reservoir_sample,
    "temperature_rebalance_sample": temperature_rebalance_sample,
    "dataset_split_counts": dataset_split_counts,
    "shuffle_shard_manifest": shuffle_shard_manifest,
    "balance_langs_sample": balance_langs_sample,
    "source_budget_select": source_budget_select,
    "source_budget_select_hist": source_budget_select_hist,
    "topic_balanced_select": topic_balanced_select,
    "split_leakage_audit": split_leakage_audit,
    "source_level_split": source_level_split,
    "kfold_assignment_audit": kfold_assignment_audit,
}

ORACLES = {
    "hash_sample_docs": HASH_SAMPLE_SQL,
    "weighted_reservoir_sample": WEIGHTED_RESERVOIR_SQL,
    "dataset_split_counts": DATASET_SPLIT_SQL,
    "shuffle_shard_manifest": SHUFFLE_SHARD_SQL,
    "balance_langs_sample": BALANCE_LANGS_SQL,
    "source_budget_select": _source_budget_sql(),
    # the histogram fallback is answer-identical by construction, so it
    # shares the window form's oracle — the driver row certifies the
    # equivalence end-to-end
    "source_budget_select_hist": _source_budget_sql(),
    "topic_balanced_select": _topic_balanced_sql(),
    "temperature_rebalance_sample": TEMPERATURE_REBALANCE_SQL,
    "split_leakage_audit": _split_leakage_sql(),
    "source_level_split": SOURCE_SPLIT_SQL,
    "kfold_assignment_audit": KFOLD_AUDIT_SQL,
}
