"""Corpus-construction operators a production LLM training-data pipeline
runs between raw crawl and tokenized shards — benchmark decontamination,
boilerplate detection, source mixing, and sequence packing.  Extends the
dedup/quality family (no analog in the reference, whose text surface is
wc/indexer tokenization, 6.5840/src/mrapps/wc.go:19-40); every operator
here is oracle-backed.

Scale design notes per operator are on the functions; the common theme:
shuffles carry (id, 64-bit hash) pairs — never text bodies — and the
only Python boundary is the per-group Arrow fold in packed_sequences,
whose per-partition state is O(1).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from golang_mapreduce_spark.functions.hashing import (
    hash32,
    minhash_seeds,
    sql_hash32,
)
from golang_mapreduce_spark.caching import with_shared_caches
from golang_mapreduce_spark.functions.text import ws_words
from golang_mapreduce_spark.operators.dedup import _shingles
from golang_mapreduce_spark.sources.fixtures import load_table

#: Decontamination: the held-out "benchmark" slice is every doc with
#: doc_id % DECON_MOD == 0 (a stand-in for an eval set like MMLU); a
#: training doc is contaminated if it shares any DECON_NGRAM-gram with
#: that slice.  13-grams are the published convention (GPT-3 appendix C);
#: fixture docs are 10-99 tokens, so 5 keeps the check meaningful.
DECON_MOD = 5
DECON_NGRAM = 5

#: Boilerplate: a 3-gram occurring in >= BOILER_MIN_DF distinct docs
#: (headers, footers, licence lines in a real crawl).
BOILER_NGRAM = 3
BOILER_MIN_DF = 3

#: Mixture sampling rates by source group (source id % 4): domain
#: up/down-weighting in corpus assembly.
MIX_PCTS = (100, 50, 25, 10)

#: Sequence packing: token budget per packed training sequence.
PACK_BUDGET = 128


def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs that share at least one {DECON_NGRAM}-gram with the
    held-out benchmark slice, with the count of distinct shared shingles
    — the decontamination report a pipeline acts on before training.

    Scale shape: the benchmark side is distinct shingle HASHES of the
    eval slice — eval sets are
    tiny (thousands of docs) against a 100 TB corpus, so it broadcasts
    and the corpus side is a map-side semi-probe with no shuffle of
    shingle strings; the only wide exchange is the per-doc
    count-distinct keyed on doc_id, carrying (doc_id, hash) longs."""
    docs = load_table(spark, sf_dir, "documents")
    ng = (
        docs.select("doc_id", ws_words("text").alias("toks"))
        .where(F.size("toks") >= DECON_NGRAM)
        .select("doc_id", F.explode(_shingles(DECON_NGRAM)).alias("s"))
        .select("doc_id", hash32("s").alias("h"))
    )
    bench = (
        ng.where(F.col("doc_id") % DECON_MOD == 0).select("h").distinct()
    )
    return (
        ng.where(F.col("doc_id") % DECON_MOD != 0)
        .join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("shared_ngrams"))
    )


DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
ng AS (
  SELECT doc_id,
         {sql_hash32("t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]")} AS h
  FROM toks, UNNEST(generate_series(1, len(t) - {DECON_NGRAM - 1})) AS g(i)
  WHERE len(t) >= {DECON_NGRAM}
),
bench AS (
  SELECT DISTINCT h FROM ng WHERE doc_id % {DECON_MOD} = 0
)
SELECT ng.doc_id, COUNT(DISTINCT ng.h) AS shared_ngrams
FROM ng JOIN bench USING (h)
WHERE ng.doc_id % {DECON_MOD} <> 0
GROUP BY ng.doc_id
"""


def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate ratio: the fraction of a doc's distinct
    {BOILER_NGRAM}-grams that occur in >= {BOILER_MIN_DF} distinct
    documents corpus-wide (the C4/RefinedWeb repeated-line filter,
    shingle-granularity since fixture text has no newlines).

    Scale shape: one exchange keyed on shingle hash computes document
    frequency via a window count over the DISTINCT (hash, doc) stream
    (no second join against a DF table), then one exchange keyed on
    doc_id folds the per-doc ratio.  Both shuffles carry two longs per
    row; partial aggregation applies to the final fold."""
    docs = load_table(spark, sf_dir, "documents")
    ng = (
        docs.select("doc_id", ws_words("text").alias("toks"))
        .where(F.size("toks") >= BOILER_NGRAM)
        .select("doc_id", F.explode(_shingles(BOILER_NGRAM)).alias("s"))
        .select("doc_id", hash32("s").alias("h"))
        .distinct()
    )
    w = Window.partitionBy("h")
    return (
        ng.withColumn("df", F.count("*").over(w))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum((F.col("df") >= BOILER_MIN_DF).cast("bigint")).alias(
                "n_boiler"
            ),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_boiler",
            F.round(F.col("n_boiler") / F.col("n_ngrams"), 6).alias(
                "boiler_ratio"
            ),
        )
    )


BOILERPLATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
ng AS (
  SELECT DISTINCT doc_id,
         {sql_hash32("t[i] || ' ' || t[i+1] || ' ' || t[i+2]")} AS h
  FROM toks, UNNEST(generate_series(1, len(t) - {BOILER_NGRAM - 1})) AS g(i)
  WHERE len(t) >= {BOILER_NGRAM}
),
flagged AS (
  SELECT doc_id, COUNT(*) OVER (PARTITION BY h) AS df FROM ng
)
SELECT doc_id,
       COUNT(*) AS n_ngrams,
       CAST(SUM(CASE WHEN df >= {BOILER_MIN_DF} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       round(SUM(CASE WHEN df >= {BOILER_MIN_DF} THEN 1 ELSE 0 END)
             / COUNT(*), 6) AS boiler_ratio
FROM flagged
GROUP BY doc_id
"""


def source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted source mixing: each source keeps
    MIX_PCTS[src_num % 4] percent of its documents, membership decided
    by md5 bucket of 'source:doc_id' — the domain-reweighting step of
    corpus assembly, reproducible across engines/partitionings/appends
    like the hash split in sampling.py.  Summarized per source.

    Scale shape: pure narrow projection + one bounded agg (one row per
    source); no sampling state, no driver coordination."""
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    pct = (
        F.when(src_num % 4 == 0, MIX_PCTS[0])
        .when(src_num % 4 == 1, MIX_PCTS[1])
        .when(src_num % 4 == 2, MIX_PCTS[2])
        .otherwise(MIX_PCTS[3])
    )
    bucket = (
        hash32(F.concat_ws(":", F.col("source"), F.col("doc_id").cast("string")))
        % 100
    )
    return (
        docs.select("source", (bucket < pct).cast("bigint").alias("kept"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("kept").alias("n_kept"),
        )
    )


SOURCE_MIXTURE_SQL = f"""
SELECT source,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN bucket < pct THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM (
  SELECT source,
         {sql_hash32("source || ':' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
         CASE CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 4
           WHEN 0 THEN {MIX_PCTS[0]} WHEN 1 THEN {MIX_PCTS[1]}
           WHEN 2 THEN {MIX_PCTS[2]} ELSE {MIX_PCTS[3]} END AS pct
  FROM documents
)
GROUP BY source
"""


def greedy_pack(sizes: list[int], budget: int) -> list[int]:
    """Bin id per element for greedy sequential packing: accumulate in
    order, start a new bin when adding the next element would exceed
    ``budget``; an oversized element always gets a bin of its own.  Pure
    function shared by the Arrow fold and the property tests (the oracle
    SQL replays the identical recurrence)."""
    bins, acc, cur = [], 0, 0
    for n in sizes:
        if acc and acc + n > budget:
            cur += 1
            acc = 0
        acc += n
        bins.append(cur)
    return bins


_PACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("n_toks", LongType()),
        StructField("bin_id", LongType()),
    ]
)


def pack_docs(toks: DataFrame) -> DataFrame:
    """Greedy packing of a (doc_id, lang, n_toks) relation — the shared
    engine behind packed_sequences and the end-to-end training run."""

    def _pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pdf["bin_id"] = greedy_pack(list(pdf["n_toks"]), PACK_BUDGET)
        return pdf

    return toks.groupBy("lang").applyInPandas(_pack, _PACK_SCHEMA)


def packed_walk_sql(src: str) -> str:
    """The recursive greedy-pack walk over any relation exposing
    (doc_id, lang, n_toks) — the SQL twin of :func:`pack_docs`.  Returns
    CTE text (``packd`` and ``packwalk``; names chosen to never collide
    with the clean-corpus chain's CTEs when composed); the enclosing
    statement must be WITH RECURSIVE."""
    return f"""packd AS (
  SELECT doc_id, lang, n_toks,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM {src}
),
packwalk(lang, rn, doc_id, n_toks, bin_id, acc) AS (
  SELECT lang, rn, doc_id, n_toks, CAST(0 AS BIGINT), n_toks
  FROM packd WHERE rn = 1
  UNION ALL
  SELECT d.lang, d.rn, d.doc_id, d.n_toks,
         CASE WHEN w.acc + d.n_toks <= {PACK_BUDGET} THEN w.bin_id
              ELSE w.bin_id + 1 END,
         CASE WHEN w.acc + d.n_toks <= {PACK_BUDGET} THEN w.acc + d.n_toks
              ELSE d.n_toks END
  FROM packwalk w JOIN packd d ON d.lang = w.lang AND d.rn = w.rn + 1
)"""


def packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential sequence packing: within each language, docs in
    doc_id order accumulate into bins of at most {PACK_BUDGET} tokens; a
    doc that would overflow starts the next bin (an oversized doc gets a
    bin alone).  This is the packing step that turns variable-length
    documents into fixed-budget training sequences without splitting
    docs.

    Inherently sequential per group, so it runs as an Arrow
    `applyInPandas` fold over the (lang) partition — O(1) state, one
    pass, one shuffle keyed on lang.  At 100 TB the group key becomes
    (lang, shard) with shards pre-bucketed by doc_id range so each
    packing task stays bounded; each shard packs independently from bin
    0 and a cheap per-shard bin-count scan offsets the ids afterward.
    The oracle replays the same greedy fold as a recursive CTE."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.size(ws_words("text")).cast("bigint").alias("n_toks")
    )
    return pack_docs(toks)


PACKED_SEQUENCES_SQL = f"""
WITH RECURSIVE toksrc AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_toks
  FROM documents
),
{packed_walk_sql('toksrc')}
SELECT doc_id, lang, n_toks, bin_id FROM packwalk
"""


def packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window utilization of the packed corpus, per language:
    bins produced, docs packed, mean fill ratio against the
    {PACK_BUDGET}-token budget, and the worst (fullest) bin — the
    efficiency readout that decides whether the packing budget or the
    chunking policy needs tuning (utilization << 1 means wasted compute
    on padding at training time).

    Pure rollup over the packing output: one (lang, bin) partial agg,
    one per-lang fold — cells are O(bins), never corpus-sized."""
    p = packed_sequences(spark, sf_dir)
    per_bin = p.groupBy("lang", "bin_id").agg(
        F.sum("n_toks").alias("fill"), F.count("*").alias("n_docs")
    )
    return per_bin.groupBy("lang").agg(
        F.count("*").alias("n_bins"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.expr(
            f"round(CAST(SUM(fill) AS DOUBLE) / (COUNT(*) * {PACK_BUDGET}), 6)"
        ).alias("utilization"),
        F.max("fill").cast("bigint").alias("max_fill"),
    )


PACKING_EFFICIENCY_SQL = f"""
WITH RECURSIVE toksrc AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_toks
  FROM documents
),
{packed_walk_sql('toksrc')},
per_bin AS (
  SELECT lang, bin_id, CAST(SUM(n_toks) AS BIGINT) AS fill, COUNT(*) AS n_docs
  FROM packwalk GROUP BY lang, bin_id
)
SELECT lang,
       COUNT(*) AS n_bins,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       round(CAST(SUM(fill) AS DOUBLE) / (COUNT(*) * {PACK_BUDGET}), 6)
         AS utilization,
       CAST(MAX(fill) AS BIGINT) AS max_fill
FROM per_bin
GROUP BY lang
"""


def source_token_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass concentration by source: per-source token totals with
    global share and cumulative share in descending-mass order — the
    "is one crawl dominating the mix" audit behind up/down-weighting
    decisions (MIX_PCTS exists because of exactly this readout).

    Scale shape: per-doc token counts are a map-side size() (no explode);
    the aggregate reduces to |sources| rows, and the ranking windows run
    over that tiny relation — the global Window.orderBy is safe because
    its input is already aggregate-small, never row-scale data."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = (
        docs.select("source", F.size(ws_words("text")).alias("n_toks"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )
    w = Window.orderBy(F.desc("n_tokens"), F.asc("source"))
    total = Window.partitionBy()
    return per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        F.row_number().over(w).alias("rank"),
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(total), 6).alias(
            "token_share"
        ),
        F.round(
            F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0))
            / F.sum("n_tokens").over(total),
            6,
        ).alias("cum_share"),
    )


SOURCE_CONCENTRATION_SQL = """
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM documents
  GROUP BY source
)
SELECT source, n_docs, n_tokens,
       CAST(ROW_NUMBER() OVER (ORDER BY n_tokens DESC, source) AS INT) AS rank,
       ROUND(n_tokens / (SELECT SUM(n_tokens)::DOUBLE FROM per_source), 6) AS token_share,
       ROUND(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, source
                                 ROWS UNBOUNDED PRECEDING)
             / (SELECT SUM(n_tokens)::DOUBLE FROM per_source), 6) AS cum_share
FROM per_source
"""


def contamination_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination rolled up to the actionable granularity: per
    source, how many training docs share a {DECON_NGRAM}-gram with the
    benchmark slice and what fraction that is — the table that decides
    whether a source gets filtered doc-by-doc or dropped wholesale.

    Scale shape: inherits decontaminate_docs' broadcast-probe plan (the
    benchmark shingle set broadcasts; corpus shingles never shuffle as
    strings), then one extra tiny aggregate keyed on source."""
    docs = load_table(spark, sf_dir, "documents")
    flagged = decontaminate_docs(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("flag")
    )
    train = docs.where(F.col("doc_id") % DECON_MOD != 0)
    return (
        train.join(flagged, "doc_id", "left")
        .select(
            "source",
            F.when(F.col("flag").isNotNull(), 1).otherwise(0).alias(
                "is_contaminated"
            ),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_train_docs"),
            F.sum("is_contaminated").alias("n_contaminated"),
        )
        .select(
            "source",
            "n_train_docs",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_train_docs"), 6).alias(
                "contamination_rate"
            ),
        )
    )


CONTAMINATION_BY_SOURCE_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
ng AS (
  SELECT doc_id,
         {sql_hash32("t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]")} AS h
  FROM toks, UNNEST(generate_series(1, len(t) - {DECON_NGRAM - 1})) AS g(i)
  WHERE len(t) >= {DECON_NGRAM}
),
bench AS (
  SELECT DISTINCT h FROM ng WHERE doc_id % {DECON_MOD} = 0
),
flagged AS (
  SELECT DISTINCT ng.doc_id
  FROM ng JOIN bench USING (h)
  WHERE ng.doc_id % {DECON_MOD} <> 0
)
SELECT d.source,
       COUNT(*) AS n_train_docs,
       CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       ROUND(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             / COUNT(*)::DOUBLE, 6) AS contamination_rate
FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
WHERE d.doc_id % {DECON_MOD} <> 0
GROUP BY d.source
"""


#: DSIR hashed-feature space: unigrams + bigrams hashed into this many
#: buckets (Xie et al. 2023 use ~10^4; the 31-word fixture vocabulary
#: saturates 64).  The "target" distribution is the held-out slice
#: (doc_id % DECON_MOD == 0) — the same stand-in eval set the
#: decontamination operator anchors on.
DSIR_BUCKETS = 64


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    public): per raw-pool document, the hashed-ngram log importance
    weight log p_target(doc)/p_pool(doc) under bag-of-hashed-features
    unigram+bigram models with add-1 smoothing — the score a pipeline
    exponentiates/ranks to resample a web pool toward a target domain.

    Cross-engine determinism: the per-bucket log-ratio is ONE ln of an
    exactly-computed rational ((t+1)(s_tot+B)) / ((s+1)(t_tot+B)) —
    integer products, single division — rounded to 6 dp and cast to
    DECIMAL(18,6); the per-doc sum is then exact decimal arithmetic
    (partition-order independent), cast back to double at the end.

    Scale shape: ONE tokenization/hash pass reduced to the (doc_id,
    bucket, cnt) aggregate, which is persisted (three ints per row —
    thousands of times smaller than the exploded feature stream) and
    feeds EVERYTHING downstream: the per-bucket target/pool counts are
    re-groups of it, the two totals are sums of those B-row relations,
    and the per-doc fold consumes it directly.  Before round 15 the five
    consumers each re-derived the exploded ``feats`` relation — the
    full-registry plan audit measured 10 scans per op (VERDICT r14 #2a);
    now the corpus text is read once.  The B-row stats broadcast back;
    the only big exchange is the partial-agg'd (doc_id, b) reduction.
    At 100 TB the target side is a tiny eval set: its stats come from
    one broadcastable aggregate exactly like decontaminate_docs' shingle
    set (``_gmrs_shared_caches`` lifecycle)."""
    from pyspark.storagelevel import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", ws_words("text").alias("toks"))
    uni = toks.select("doc_id", F.explode("toks").alias("g"))
    bi = (
        toks.where(F.size("toks") >= 2)
        .select("doc_id", F.explode(_shingles(2)).alias("g"))
    )
    feats = uni.union(bi).select(
        "doc_id", (hash32("g") % DSIR_BUCKETS).alias("b")
    )
    docb = (
        feats.groupBy("doc_id", "b")
        .agg(F.count("*").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    is_target = F.col("doc_id") % DECON_MOD == 0
    # per-bucket and total stats derived from the docb aggregate, never
    # from a second pass over the text: SUM(cnt) over docb's rows is
    # exactly COUNT(*) over the exploded feature stream.  ONE
    # conditional-sum re-group replaces the four docb re-groups the
    # round-15 form ran (tcnt/scnt/ttot/stot — ROADMAP r16 #2): docb
    # consumers drop 4 -> 2, and the two grand totals become a window
    # over the <= B-row stats relation (single tiny partition) instead
    # of two more docb jobs + broadcasts.  SUM(CASE) over an empty side
    # is NULL exactly where the old per-side SUM was absent: a bucket
    # with no pool rows had no scnt row (ratio is pool-anchored), so the
    # s IS NOT NULL filter reproduces the old scnt LEFT JOIN tcnt frame,
    # and COALESCE(t, 0) reproduces the old left-join NULL handling.
    from pyspark.sql.window import Window as _W

    stats = docb.groupBy("b").agg(
        F.sum(F.when(is_target, F.col("cnt"))).alias("t"),
        F.sum(F.when(~is_target, F.col("cnt"))).alias("s"),
    )
    tw = _W.partitionBy()  # grand total over <= DSIR_BUCKETS rows
    ratio = (
        stats.select(
            "b",
            "t",
            "s",
            F.sum(F.coalesce(F.col("t"), F.lit(0))).over(tw).alias("tt"),
            F.sum(F.coalesce(F.col("s"), F.lit(0))).over(tw).alias("st"),
        )
        .where(F.col("s").isNotNull())
        .select(
            "b",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("t"), F.lit(0)) + 1)
                        * (F.col("st") + DSIR_BUCKETS)
                    ).cast("double")
                    / ((F.col("s") + 1) * (F.col("tt") + DSIR_BUCKETS))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lr"),
        )
    )
    out = (
        docb.where(F.col("doc_id") % DECON_MOD != 0)
        .join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_feats"),
            F.round(
                F.sum(F.col("cnt").cast("decimal(18,6)") * F.col("lr"))
                .cast("double"),
                6,
            ).alias("log_weight"),
        )
    )
    return with_shared_caches(out, docb)


DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
uni AS (
  SELECT doc_id, t[i] AS g
  FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)
),
bi AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS g
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
feats AS (
  SELECT doc_id, {sql_hash32('g')} % {DSIR_BUCKETS} AS b
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
),
docb AS (
  SELECT doc_id, b, COUNT(*) AS cnt FROM feats GROUP BY doc_id, b
),
stats AS (
  SELECT b,
         SUM(CASE WHEN doc_id % {DECON_MOD} = 0 THEN cnt END) AS t,
         SUM(CASE WHEN doc_id % {DECON_MOD} <> 0 THEN cnt END) AS s
  FROM docb GROUP BY b
),
ratio AS (
  SELECT b,
         CAST(ROUND(LN(
           CAST((COALESCE(t, 0) + 1) * (st + {DSIR_BUCKETS}) AS DOUBLE)
           / ((s + 1) * (tt + {DSIR_BUCKETS}))
         ), 6) AS DECIMAL(18,6)) AS lr
  FROM (
    SELECT b, t, s,
           SUM(COALESCE(t, 0)) OVER () AS tt,
           SUM(COALESCE(s, 0)) OVER () AS st
    FROM stats
  )
  WHERE s IS NOT NULL
)
SELECT d.doc_id,
       CAST(SUM(d.cnt) AS BIGINT) AS n_feats,
       ROUND(CAST(SUM(CAST(d.cnt AS DECIMAL(18,6)) * r.lr) AS DOUBLE), 6)
         AS log_weight
FROM docb d JOIN ratio r USING (b)
WHERE d.doc_id % {DECON_MOD} <> 0
GROUP BY d.doc_id
"""


DSIR_TOP = 100  # selected-pool size for the rank-based DSIR selection


def dsir_topk_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR SELECTION step: the {DSIR_TOP} raw-pool documents whose
    hashed-ngram importance weight ranks highest (ties on doc_id) —
    i.e. the slice of the web pool most target-like under the bag
    models, the set the original method resamples from.  Rank-based
    selection (not exp-weight thresholding) keeps the decision exactly
    reproducible cross-engine: ranking is on the DECIMAL-summed
    log-weight, so no transcendental function sits on a comparison
    boundary.

    Scale shape: dsir_importance_weights' dataflow (B-row broadcast
    stats, (doc_id, bucket, cnt) shuffle) followed by
    ``orderBy().limit(k)`` — TakeOrderedAndProject per-partition heaps,
    never a global sort of the pool; the rank window then runs over the
    k-row prefix only (the vocab_topk pattern)."""
    from pyspark.sql.window import Window

    w = dsir_importance_weights(spark, sf_dir)
    topk = w.orderBy(F.desc("log_weight"), F.asc("doc_id")).limit(DSIR_TOP)
    wr = Window.orderBy(F.desc("log_weight"), F.asc("doc_id"))
    out = topk.withColumn("rank", F.row_number().over(wr)).select(
        "rank", "doc_id", "n_feats", "log_weight"
    )
    return with_shared_caches(out, w)  # the docb cache rides along


DSIR_TOPK_SQL = f"""
WITH w AS (
  {{DSIR}}
)
SELECT rank, doc_id, n_feats, log_weight FROM (
  SELECT doc_id, n_feats, log_weight,
         ROW_NUMBER() OVER (ORDER BY log_weight DESC, doc_id) AS rank
  FROM w
)
WHERE rank <= {DSIR_TOP}
"""


#: Sliding-window chunking: context windows of CHUNK_TOKENS tokens with
#: CHUNK_STRIDE-token hops (50% overlap) — the long-doc counterpart of
#: packed_sequences (which bins docs WITHOUT splitting them).
CHUNK_TOKENS = 32
CHUNK_STRIDE = 16


def sliding_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source manifest stats for sliding-window chunking (window
    {W} tokens, stride {S}): chunk count, average chunks per doc, and
    the OVERLAP FACTOR — total chunked tokens over corpus tokens, i.e.
    the token-duplication cost the stride choice imposes on training.
    packed_sequences bins whole docs; this is the other half of
    sequence construction — splitting docs longer than the context
    window — and the overlap factor is the number that prices a stride
    change in GPU-hours before anyone re-tokenizes anything.

    Scale shape: chunk counts have a CLOSED FORM (every chunk except
    the last is exactly {W} tokens, because the chunk count k is
    minimal with (k-1)*{S} + {W} >= n), so the manifest aggregates
    without materializing a single chunk: one scan, per-row integer
    arithmetic, one partial-agg'd exchange on the tiny source key.
    The integer math is DIV/// on non-negative operands — identical
    truncation on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        F.coalesce(F.size(ws_words("text")), F.lit(0))
        .cast("bigint")
        .alias("n"),
    ).select(
        "source",
        "n",
        F.expr(
            f"CASE WHEN n = 0 THEN 0L"
            f" WHEN n <= {CHUNK_TOKENS} THEN 1L"
            f" ELSE 1L + (n - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1) DIV {CHUNK_STRIDE} END"
        ).alias("k"),
    ).select(
        "source",
        "n",
        "k",
        F.expr(
            f"CASE WHEN n = 0 THEN 0L"
            f" ELSE (k - 1) * {CHUNK_TOKENS}L + (n - (k - 1) * {CHUNK_STRIDE}L) END"
        ).alias("chunk_toks"),
    )
    return base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("k").cast("bigint").alias("n_chunks"),
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.sum("chunk_toks").cast("bigint").alias("n_chunk_tokens"),
        F.round(F.sum("k") / F.count("*"), 6).alias("avg_chunks_per_doc"),
        F.round(
            F.coalesce(
                F.sum("chunk_toks") / F.nullif(F.sum("n"), F.lit(0)), F.lit(0.0)
            ),
            6,
        ).alias("overlap_factor"),
    )


SLIDING_CHUNK_SQL = f"""
WITH base AS (
  SELECT source,
         CAST(COALESCE(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')), 0) AS BIGINT) AS n
  FROM documents
),
k AS (
  SELECT source, n,
         CASE WHEN n = 0 THEN 0
              WHEN n <= {CHUNK_TOKENS} THEN 1
              ELSE 1 + (n - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} END AS k
  FROM base
),
ct AS (
  SELECT source, n, k,
         CASE WHEN n = 0 THEN 0
              ELSE (k - 1) * {CHUNK_TOKENS} + (n - (k - 1) * {CHUNK_STRIDE}) END AS chunk_toks
  FROM k
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(k) AS BIGINT) AS n_chunks,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(chunk_toks) AS BIGINT) AS n_chunk_tokens,
       ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(*), 6) AS avg_chunks_per_doc,
       ROUND(COALESCE(CAST(SUM(chunk_toks) AS DOUBLE) / NULLIF(SUM(n), 0), 0.0), 6) AS overlap_factor
FROM ct
GROUP BY source
"""


#: Bloom decontamination: bits per bench key and probe count.  16 bits
#: per key with 8 probes gives a ~5e-4 false-positive rate; FPs cost
#: only a wasted exact recheck, never a wrong answer.
BLOOM_BITS_PER_KEY = 16
BLOOM_PROBES = 8
#: Position family modulus — the minhash universal-hash prime, reused so
#: the probe family is integer-exact and seedable on both engines.
_BLOOM_PRIME = 4294967311


def decontaminate_bloom(
    spark: SparkSession,
    sf_dir: str,
    bits_per_key: int = BLOOM_BITS_PER_KEY,
    n_probes: int = BLOOM_PROBES,
) -> DataFrame:
    """:func:`decontaminate_docs` behind a BLOOM pre-filter — the memory
    shape that survives a real eval suite at 100 TB.  The broadcast side
    of the exact check is a hash RELATION (~50 JVM bytes per bench
    n-gram: a 100M-ngram eval suite is a multi-GB broadcast that evicts
    the executors' working set); a Bloom filter at {BLOOM_BITS_PER_KEY}
    bits/key is ~25× smaller (200 MB for the same suite), so the corpus
    scan probes the bitset map-side and only Bloom SURVIVORS — true
    matches plus a ~5e-4 false-positive trickle — reach the exact
    semi-join.  The exact recheck makes the output bit-identical to the
    plain form (Bloom has no false negatives), so this shares
    DECONTAMINATE_SQL as its oracle — the same oracle-sharing move
    source_budget_select_hist uses, and tests/test_decon_bloom.py forces
    FPs with a degenerate bits_per_key to pin that the recheck absorbs
    them.

    Dataflow: bench distinct shingle hashes collect to the driver (eval
    sets are tiny relative to any corpus; at true scale this is a
    one-time artifact build), a numpy bitset is built with
    {BLOOM_PROBES} positions per key from the minhash universal-hash
    family, and the corpus side probes it inside an Arrow-batched
    mapInPandas-style predicate (vectorized numpy gather, no per-row
    Python).  The only exchange is the final per-doc count-distinct,
    identical to the plain form's."""
    import numpy as np
    from pyspark.sql.types import BooleanType

    docs = load_table(spark, sf_dir, "documents")
    ng = (
        docs.select("doc_id", ws_words("text").alias("toks"))
        .where(F.size("toks") >= DECON_NGRAM)
        .select("doc_id", F.explode(_shingles(DECON_NGRAM)).alias("s"))
        .select("doc_id", hash32("s").alias("h"))
    )
    bench = ng.where(F.col("doc_id") % DECON_MOD == 0).select("h").distinct()
    bench_h = np.array([r["h"] for r in bench.collect()], dtype=np.int64)
    m = max(64, int(bits_per_key) * max(1, len(bench_h)))
    seeds = minhash_seeds(n_probes)
    bits = np.zeros(m, dtype=bool)
    for a, b in seeds:
        bits[(bench_h * a + b) % _BLOOM_PRIME % m] = True

    @F.pandas_udf(BooleanType())
    def might_contain(h: pd.Series) -> pd.Series:
        hv = h.to_numpy(dtype=np.int64)
        ok = np.ones(len(hv), dtype=bool)
        for a, b in seeds:
            ok &= bits[(hv * a + b) % _BLOOM_PRIME % m]
        return pd.Series(ok)

    survivors = ng.where(F.col("doc_id") % DECON_MOD != 0).where(
        might_contain(F.col("h"))
    )
    return (
        survivors.join(F.broadcast(bench), "h")  # exact recheck: kills FPs
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("shared_ngrams"))
    )


#: Sequence-length bucket histogram: power-of-2 context buckets.
def seq_len_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram over power-of-2 buckets with the PADDING
    BILL per bucket: each doc lands in the smallest 2^k >= its token
    count (its padded slot in a bucketed-batching trainer), and the
    bucket reports doc count, real tokens, padding tokens, and padding
    fraction.  This is the table that decides bucket boundaries and
    predicts wasted FLOPs before anyone tokenizes — the batch-shape
    planner next to packed_sequences (which avoids padding by packing)
    and sliding_chunk_stats (which prices splitting).

    Scale shape: one scan, per-row integer arithmetic (the bucket is
    2^ceil(log2 n) — exact in IEEE for the relevant range since log2 of
    a power of two is exact and log2 of anything else sits >=1e-7 from
    an integer), one partial-agg'd exchange on a <=16-row key."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        F.coalesce(F.size(ws_words("text")), F.lit(0)).cast("bigint").alias("n")
    ).select(
        "n",
        F.expr(
            "CASE WHEN n <= 1 THEN n"
            " ELSE CAST(pow(2, ceil(log2(CAST(n AS DOUBLE)))) AS BIGINT) END"
        ).alias("bucket_toks"),
    )
    return base.groupBy("bucket_toks").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.sum(F.col("bucket_toks") - F.col("n")).cast("bigint").alias("n_padding"),
        F.round(
            F.coalesce(
                F.sum(F.col("bucket_toks") - F.col("n"))
                / F.nullif(F.sum("bucket_toks"), F.lit(0)),
                F.lit(0.0),
            ),
            6,
        ).alias("pad_frac"),
    )


SEQ_LEN_BUCKET_SQL = """
WITH base AS (
  SELECT CAST(COALESCE(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')), 0) AS BIGINT) AS n
  FROM documents
),
b AS (
  SELECT n,
         CASE WHEN n <= 1 THEN n
              ELSE CAST(pow(2, ceil(log2(CAST(n AS DOUBLE)))) AS BIGINT) END AS bucket_toks
  FROM base
)
SELECT bucket_toks,
       COUNT(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(bucket_toks - n) AS BIGINT) AS n_padding,
       ROUND(COALESCE(CAST(SUM(bucket_toks - n) AS DOUBLE) / NULLIF(SUM(bucket_toks), 0), 0.0), 6) AS pad_frac
FROM b
GROUP BY bucket_toks
"""


# --- token-budget shard planning (round 9) --------------------------------

PACK_PLAN_BUDGET = 4096  # tokens per shard


def token_budget_pack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative shard manifest: assign each source's documents (in
    doc_id order) to consecutive token-budget shards via an exclusive
    prefix-sum, and report per-shard doc counts, token mass, and fill
    ratio — the PLANNING view of sequence packing (packed_sequences is
    the applyInPandas executor that actually concatenates; this is the
    pure-DataFrame manifest a scheduler reads to size writer tasks,
    and its fill-ratio column is the padding bill forecast).

    A doc starting inside shard k stays in shard k even if it crosses
    the boundary (exclusive prefix sum), matching the greedy
    one-pass packer; shards can therefore overflow by at most one doc,
    never underflow-fragment.

    Scale shape: ONE window cumsum partitioned by source ordered by
    doc_id (the natural write order), then a partial-agg'd groupBy on
    (source, shard).  No joins, no collects; token counting is the
    same ws_words size() every text operator uses — all codegen."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(ws_words("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    planned = docs.select(
        "source",
        "n_tokens",
        (
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            / F.lit(PACK_PLAN_BUDGET)
        ).cast("bigint").alias("shard"),
    )
    return planned.groupBy("source", "shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
        F.round(
            F.sum("n_tokens") / F.lit(float(PACK_PLAN_BUDGET)), 6
        ).alias("fill_ratio"),
    )


TOKEN_PACK_PLAN_SQL = f"""
WITH docs AS (
  SELECT source, doc_id,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
           AS n_tokens
  FROM documents
),
planned AS (
  SELECT source, n_tokens,
         CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens)
              // {PACK_PLAN_BUDGET} AS BIGINT) AS shard
  FROM docs
)
SELECT source, shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / {PACK_PLAN_BUDGET}.0, 6)
         AS fill_ratio
FROM planned
GROUP BY source, shard
"""



# --- RAG chunk manifest (round 11) -------------------------------------------


def rag_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized sliding-window chunk manifest (window {W} tokens,
    stride {S}): one row per retrieval chunk with its token offset,
    length, and a content hash — the ingestion table a RAG indexer
    embeds and the chunk-level dedup key (dedup_exact at chunk
    granularity: boilerplate shared across docs collides on
    chunk_hash even when the full documents differ).
    sliding_chunk_stats prices this plan in closed form without
    materializing it; this operator EMITS it.

    Scale shape: narrow per-row work end-to-end — tokenize, closed-form
    chunk count k (minimal with (k-1)*{S} + {W} >= n), explode
    sequence(0, k-1), slice + hash.  No shuffle at all: the manifest
    inherits the scan's partitioning, and output volume is
    token-mass / {S} rows (the overlap factor sliding_chunk_stats
    reports).  Exactness: pure integer arithmetic plus the md5-derived
    hash32 — engine-identical by construction."""
    docs = load_table(spark, sf_dir, "documents")
    sized = (
        docs.select("doc_id", ws_words("text").alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.coalesce(F.size("toks"), F.lit(0)).cast("bigint").alias("n"),
        )
        .where(F.col("n") > 0)
        .select(
            "doc_id",
            "toks",
            "n",
            F.expr(
                f"CASE WHEN n <= {CHUNK_TOKENS} THEN 1L"
                f" ELSE 1L + (n - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)"
                f" DIV {CHUNK_STRIDE} END"
            ).alias("k"),
        )
    )
    return sized.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.expr("sequence(0L, k - 1)")).alias("ci"),
    ).select(
        "doc_id",
        F.col("ci").cast("int").alias("chunk_idx"),
        (F.col("ci") * CHUNK_STRIDE).cast("bigint").alias("token_start"),
        F.least(
            F.lit(CHUNK_TOKENS).cast("bigint"),
            F.col("n") - F.col("ci") * CHUNK_STRIDE,
        ).alias("chunk_len"),
        hash32(
            F.expr(
                f"concat_ws(' ', slice(toks,"
                f" CAST(ci * {CHUNK_STRIDE} + 1 AS INT),"
                f" CAST(LEAST({CHUNK_TOKENS}, n - ci * {CHUNK_STRIDE}) AS INT)))"
            )
        ).alias("chunk_hash"),
    )


RAG_CHUNK_SQL = f"""
WITH sized AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
         CASE WHEN len(toks) <= {CHUNK_TOKENS} THEN 1
              ELSE 1 + (len(toks) - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)
                   // {CHUNK_STRIDE} END AS k
  FROM (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
    FROM documents
  )
  WHERE len(toks) > 0
),
chunks AS (
  SELECT doc_id, toks, n, unnest(range(0, k)) AS ci FROM sized
)
SELECT doc_id,
       CAST(ci AS INT) AS chunk_idx,
       CAST(ci * {CHUNK_STRIDE} AS BIGINT) AS token_start,
       CAST(LEAST({CHUNK_TOKENS}, n - ci * {CHUNK_STRIDE}) AS BIGINT)
         AS chunk_len,
       {sql_hash32(
           "array_to_string(toks[ci * " + str(CHUNK_STRIDE) + " + 1"
           " : ci * " + str(CHUNK_STRIDE) + " + LEAST(" + str(CHUNK_TOKENS)
           + ", n - ci * " + str(CHUNK_STRIDE) + ")], ' ')"
       )} AS chunk_hash
FROM chunks
"""


def chunk_dup_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level duplication spectrum: the multiplicity histogram of
    rag_chunk_manifest content hashes — how much of the chunk mass
    a RAG index would store redundantly (multiplicity 1 = unique
    content; the tail is boilerplate shared across documents that
    doc-level dedup can NEVER remove because the surrounding documents
    differ).  chunk_mass_share prices each multiplicity bucket as a
    fraction of all chunks — the number that says whether chunk-hash
    dedup is worth a pipeline stage.

    Scale shape: the manifest is shuffle-free; this adds two
    map-side-combined keyed aggregations (hash -> multiplicity ->
    spectrum) whose output is bounded by the distinct-multiplicity
    count (tens of rows), plus a window total over that tiny relation.
    Exactness: pure integer counts; one IEEE divide rounded 6 dp."""
    manifest = rag_chunk_manifest(spark, sf_dir)
    mult = manifest.groupBy("chunk_hash").agg(
        F.count("*").alias("multiplicity")
    )
    spec = mult.groupBy("multiplicity").agg(F.count("*").alias("n_hashes"))
    wg = Window.partitionBy()
    return (
        spec.select(
            F.col("multiplicity").cast("bigint").alias("multiplicity"),
            F.col("n_hashes").cast("bigint").alias("n_hashes"),
            (F.col("multiplicity") * F.col("n_hashes"))
            .cast("bigint")
            .alias("n_chunks"),
        )
        .select(
            "multiplicity",
            "n_hashes",
            "n_chunks",
            F.round(
                F.col("n_chunks").cast("double")
                / F.sum("n_chunks").over(wg),
                6,
            ).alias("chunk_mass_share"),
        )
    )


_CHUNK_DUP_SPECTRUM_SQL = """
WITH manifest AS (
  {MANIFEST}
),
mult AS (
  SELECT chunk_hash, COUNT(*) AS multiplicity FROM manifest GROUP BY chunk_hash
),
spec AS (
  SELECT multiplicity, COUNT(*) AS n_hashes FROM mult GROUP BY multiplicity
)
SELECT CAST(multiplicity AS BIGINT) AS multiplicity,
       CAST(n_hashes AS BIGINT) AS n_hashes,
       CAST(multiplicity * n_hashes AS BIGINT) AS n_chunks,
       ROUND(CAST(multiplicity * n_hashes AS DOUBLE)
             / SUM(multiplicity * n_hashes) OVER (), 6) AS chunk_mass_share
FROM spec
"""


#: Candidate context lengths for the padding-sensitivity curve.
CONTEXT_LENGTHS = (32, 64, 128)


def context_length_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length sensitivity curve: for each candidate sequence
    length L, the closed-form cost of NON-overlapping chunk-and-pad
    sequence construction — total sequences, padded-token share, and
    fill ratio — the three-row table a pretraining team reads to pick a
    context length before committing GPU-hours.
    packing_efficiency prices greedy BIN-PACKING at one length;
    this prices the simpler chunk-and-pad ladder ACROSS lengths (the
    upper bound packing then improves on).

    Scale shape: per-doc token counts once, then one k=|{lengths}|-row
    explode and a partial-agg'd rollup to exactly |lengths| rows — the
    per-L arithmetic is a closed form (CEIL(n/L) sequences, k*L - n
    padding), never a materialized chunk.  Exactness: exact BIGINT
    sums; two IEEE divides rounded 6 dp."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        F.coalesce(F.size(ws_words("text")), F.lit(0))
        .cast("bigint")
        .alias("n")
    ).where(F.col("n") > 0)
    ls = ", ".join(str(x) for x in CONTEXT_LENGTHS)
    per = base.select(
        "n", F.explode(F.expr(f"array({ls})")).alias("context_len")
    ).select(
        "context_len",
        "n",
        F.expr("(n + context_len - 1) DIV context_len").alias("k"),
    )
    return (
        per.groupBy("context_len")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_tokens"),
            F.sum("k").cast("bigint").alias("total_sequences"),
            F.sum(F.col("k") * F.col("context_len") - F.col("n"))
            .cast("bigint")
            .alias("padded_tokens"),
        )
        .select(
            F.col("context_len").cast("int").alias("context_len"),
            "n_docs",
            "total_tokens",
            "total_sequences",
            "padded_tokens",
            F.round(
                F.col("padded_tokens").cast("double")
                / (F.col("total_tokens") + F.col("padded_tokens")),
                6,
            ).alias("pad_share"),
            F.round(
                F.col("total_tokens").cast("double")
                / (F.col("total_sequences") * F.col("context_len")),
                6,
            ).alias("fill_ratio"),
        )
    )


CONTEXT_LENGTH_SQL = f"""
WITH base AS (
  SELECT CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                              x -> x <> '')) AS BIGINT) AS n
  FROM documents
),
per AS (
  SELECT context_len, n, (n + context_len - 1) // context_len AS k
  FROM base, unnest([{", ".join(str(x) for x in CONTEXT_LENGTHS)}])
       AS u(context_len)
  WHERE n > 0
)
SELECT CAST(context_len AS INT) AS context_len,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       CAST(SUM(k) AS BIGINT) AS total_sequences,
       CAST(SUM(k * context_len - n) AS BIGINT) AS padded_tokens,
       ROUND(CAST(SUM(k * context_len - n) AS DOUBLE)
             / (SUM(n) + SUM(k * context_len - n)), 6) AS pad_share,
       ROUND(CAST(SUM(n) AS DOUBLE)
             / (SUM(k) * context_len), 6) AS fill_ratio
FROM per
GROUP BY context_len
"""


QUERIES = {
    "packing_efficiency": packing_efficiency,
    "decontaminate_docs": decontaminate_docs,
    "boilerplate_ngrams": boilerplate_ngrams,
    "source_mixture_sample": source_mixture_sample,
    "packed_sequences": packed_sequences,
    "source_token_concentration": source_token_concentration,
    "contamination_rate_by_source": contamination_rate_by_source,
    "dsir_importance_weights": dsir_importance_weights,
    "dsir_topk_selection": dsir_topk_selection,
    "sliding_chunk_stats": sliding_chunk_stats,
    "decontaminate_bloom": decontaminate_bloom,
    "seq_len_bucket_histogram": seq_len_bucket_histogram,
    "token_budget_pack_plan": token_budget_pack_plan,
    "rag_chunk_manifest": rag_chunk_manifest,
    "chunk_dup_spectrum": chunk_dup_spectrum,
    "context_length_sensitivity": context_length_sensitivity,
}

ORACLES = {
    "packing_efficiency": PACKING_EFFICIENCY_SQL,
    "decontaminate_docs": DECONTAMINATE_SQL,
    "boilerplate_ngrams": BOILERPLATE_SQL,
    "source_mixture_sample": SOURCE_MIXTURE_SQL,
    "packed_sequences": PACKED_SEQUENCES_SQL,
    "source_token_concentration": SOURCE_CONCENTRATION_SQL,
    "contamination_rate_by_source": CONTAMINATION_BY_SOURCE_SQL,
    "dsir_importance_weights": DSIR_SQL,
    "dsir_topk_selection": DSIR_TOPK_SQL.format(DSIR=DSIR_SQL.strip()),
    "sliding_chunk_stats": SLIDING_CHUNK_SQL,
    # bit-identical to the plain form by construction (exact recheck) —
    # the same oracle-sharing move source_budget_select_hist uses
    "decontaminate_bloom": DECONTAMINATE_SQL,
    "seq_len_bucket_histogram": SEQ_LEN_BUCKET_SQL,
    "token_budget_pack_plan": TOKEN_PACK_PLAN_SQL,
    "rag_chunk_manifest": RAG_CHUNK_SQL,
    "chunk_dup_spectrum": _CHUNK_DUP_SPECTRUM_SQL.format(
        MANIFEST=RAG_CHUNK_SQL.strip()
    ),
    "context_length_sensitivity": CONTEXT_LENGTH_SQL,
}
