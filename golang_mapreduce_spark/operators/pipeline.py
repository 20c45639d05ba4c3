"""End-to-end corpus-cleaning pipeline — the LLM-training-data flagship:

    quality filter  →  exact dedup (md5, keep-min)  →  MinHash+LSH
    near-dup clustering  →  keep one representative per cluster

composed from the same building blocks the individual queries() entries
expose (textstats.quality_scores, dedup.minhash_pairs_from,
dedup.clusters_from), all stages parameterized by source relation so the
oracle replicates the whole chain in one WITH RECURSIVE statement.

Scale shape of the composition: stage boundaries are all id-keyed
joins/semi-joins (shuffle carries ids + hashes, never text bodies except
the single signature pass); the only iterative piece is the min-label
propagation, which converges in O(cluster diameter) rounds with constant
driver traffic (1-row convergence counts).  At 100 TB each stage is the
exact shape you would materialize as an intermediate table; composing
them in one DAG lets Spark pipeline the scans instead.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from golang_mapreduce_spark.caching import with_shared_caches
from golang_mapreduce_spark.operators.dedup import (
    cc_walk_sql,
    clusters_from,
    minhash_pairs_from,
    minhash_pairs_sql,
)
from golang_mapreduce_spark.functions.text import ws_words
from golang_mapreduce_spark.operators.textstats import QUALITY_SQL, quality_scores
from golang_mapreduce_spark.sources.fixtures import load_table

QUALITY_MIN = 0.5


@contextmanager
def _overlapped_job(spark: SparkSession, label: str, work):
    """Run ``work()`` (a driver-side job submission — e.g. forcing a
    persisted marker relation) on a separate driver thread while the
    ``with`` body runs its own jobs (guide §2.6: Spark's scheduler runs
    several jobs at once inside one application; actions are only
    sequential because driver code calls them sequentially).  FIFO
    scheduling lets the overlapped job's tasks back-fill executors the
    body's job tails leave idle.

    Yields the Future.  The exit waits for the thread either way; a
    side-thread failure propagates unless the body already raised (the
    body's exception wins).  ``inheritable_thread_target`` keeps JVM
    thread-local properties (job group/description) correct per the
    PySpark contract for driver threads."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    def run():
        spark.sparkContext.setJobDescription(label)
        try:
            return work()
        finally:
            spark.sparkContext.setJobDescription(None)

    pool = ThreadPoolExecutor(max_workers=1)
    fut = pool.submit(inheritable_thread_target(run))
    body_ok = False
    try:
        yield fut
        body_ok = True
    finally:
        pool.shutdown(wait=True)
        if body_ok:
            fut.result()  # propagate a side-thread failure


def _overlapped_force(spark: SparkSession, df: DataFrame, label: str):
    """Materialize a PERSISTED marker relation concurrently with the
    ``with`` body: count() fills the cache, so every later consumer
    reads the materialized rows instead of recomputing the subtree."""
    return _overlapped_job(spark, label, df.count)


def clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving documents (doc_id, lang, n_chars) after quality
    filtering, exact dedup, and near-dup keep-one-per-cluster."""
    docs = load_table(spark, sf_dir, "documents")
    # the quality-survivor id set feeds TWO consumers of docs_f (the
    # md5-keeper grouping and the docs_d join): persisted as ids only,
    # the quality tokenization pass runs ONCE — unpersisted, each
    # consumer re-ran the whole scan+tokenize+score subtree (r16; the
    # same marker-relation discipline pipeline_drop_attribution uses).
    # ids, never text: at 100 TB this cache is |survivors| longs.
    good = (
        quality_scores(spark, sf_dir)
        .where(F.col("quality_score") >= QUALITY_MIN)
        .select("doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    docs_f = docs.join(good, "doc_id")

    keep_exact = (
        docs_f.groupBy(F.md5(F.lower(F.trim("text"))).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # survivors of exact dedup, reused by the signature pass AND the
    # final projection — persist once
    docs_d = docs_f.join(keep_exact, "doc_id").persist(StorageLevel.MEMORY_AND_DISK)

    pairs_full = minhash_pairs_from(docs_d.select("doc_id", "text"))
    clusters = clusters_from(pairs_full.select("doc_a", "doc_b"))
    drop = clusters.where(F.col("cluster_id") != F.col("doc_id")).select("doc_id")
    out = docs_d.join(drop, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )
    # account for every cache this composition registers: the quality
    # survivor ids, the survivor relation, the nested signature cache,
    # and the CC final state (with_shared_caches propagates the latter
    # two from the subtrees)
    return with_shared_caches(out, good, docs_d, pairs_full, clusters)


CLEAN_CORPUS_SQL = f"""
WITH RECURSIVE q AS (
  {QUALITY_SQL.strip()}
),
docs_f AS (
  SELECT d.* FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM q WHERE quality_score >= {QUALITY_MIN})
),
keep1 AS (
  SELECT MIN(doc_id) AS doc_id FROM docs_f GROUP BY md5(lower(trim(text)))
),
docs_d AS (
  SELECT * FROM docs_f WHERE doc_id IN (SELECT doc_id FROM keep1)
),
pairs AS (
  {minhash_pairs_sql("docs_d").strip()}
),
{cc_walk_sql('pairs')},
dropped AS (
  SELECT doc_id FROM clusters WHERE cluster_id <> doc_id
)
SELECT doc_id, lang, n_chars
FROM docs_d
WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
"""


def clean_corpus_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-construction chain: clean_corpus (quality → exact
    dedup → near-dup keep-one) followed by benchmark DECONTAMINATION —
    the held-out eval slice itself is excluded from training data, and so
    is every surviving doc that shares an n-gram with it (the REMOVAL
    composition of corpus.decontaminate_docs' report; cf. the GPT-3
    appendix-C procedure).  This is the last filter a corpus passes
    before tokenization/packing.

    Scale shape: the contamination check runs on the raw corpus exactly
    as in decontaminate_docs (broadcast eval-shingle hashes, map-side
    probe), and its flagged-ids output joins the survivor set as a
    left-anti on doc_id — ids only, no second pass over text.  The
    eval-slice exclusion is a pushdown-able predicate.

    The decon probe is INDEPENDENT of the clean chain (it reads the raw
    corpus), so its ids are materialized on a driver thread while the
    main thread runs the CC convergence actions (guide §2.6: overlap
    independent jobs so the probe's tasks back-fill executors idled by
    the CC rounds' driver synchronization) — r17; the composed op used
    to pay the two job chains strictly serially."""
    from golang_mapreduce_spark.operators.corpus import (
        DECON_MOD,
        decontaminate_docs,
    )

    flagged = (
        decontaminate_docs(spark, sf_dir)
        .select("doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    with _overlapped_force(spark, flagged, "decon probe (overlapped)"):
        survivors = clean_corpus(spark, sf_dir)
    out = (
        survivors.where(F.col("doc_id") % DECON_MOD != 0)
        .join(flagged, "doc_id", "left_anti")
    )
    return with_shared_caches(out, survivors, flagged)


def _clean_corpus_decon_sql() -> str:
    from golang_mapreduce_spark.operators.corpus import (
        DECON_MOD,
        DECONTAMINATE_SQL,
    )

    # splice the decontamination report in as one more CTE of the
    # clean-corpus chain, then subtract eval slice + flagged ids
    base = CLEAN_CORPUS_SQL.strip()
    head, tail = base.rsplit("SELECT doc_id, lang, n_chars", 1)
    decon_body = DECONTAMINATE_SQL.strip()
    return f"""{head}, decon AS (
{decon_body}
)
SELECT doc_id, lang, n_chars{tail}
  AND doc_id % {DECON_MOD} <> 0
  AND doc_id NOT IN (SELECT doc_id FROM decon)
"""


def source_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (domain) reputation rollup — the table a pipeline uses
    to build domain blocklists and mixture weights: for every source,
    its document count, exact-mean quality score, how many of its docs
    are non-canonical exact-duplicate copies (corpus-wide md5, keep-min),
    and how many are contaminated against the held-out eval slice.  A
    source with high dup or contamination mass gets down-weighted or
    dropped wholesale — cheaper than per-doc filtering when rot
    concentrates by domain (it does).

    Scale shape: the quality join is doc_id-keyed; the duplicate flag
    comes from the same (hash → min doc_id) aggregation dedup_exact
    runs (ids only cross the join); the contamination flag is the
    broadcast-probe report.  The final rollup is one partial-agg'd
    exchange with one row per source.  Quality means sum as
    DECIMAL(18,6) — exact, partition-order independent."""
    from golang_mapreduce_spark.operators.corpus import decontaminate_docs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    q = quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    keep = (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.md5(F.lower(F.trim("text"))).alias("h"))
        .agg(F.min("doc_id").alias("keep_doc_id"))
        .select(F.col("keep_doc_id").alias("doc_id"), F.lit(1).alias("is_keeper"))
    )
    cont = decontaminate_docs(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("is_cont")
    )
    d = (
        docs.join(q, "doc_id")
        .join(keep, "doc_id", "left")
        .join(cont, "doc_id", "left")
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.expr(
            "round(CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)"
            " / COUNT(*), 6)"
        ).alias("avg_quality"),
        F.sum(F.when(F.col("is_keeper").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_copies"),
        F.sum(F.coalesce(F.col("is_cont"), F.lit(0)))
        .cast("bigint")
        .alias("n_contaminated"),
    )


def _source_reputation_sql() -> str:
    from golang_mapreduce_spark.operators.corpus import DECONTAMINATE_SQL

    return f"""
WITH q AS (
  {QUALITY_SQL.strip()}
),
keep AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(lower(trim(text)))
),
decon AS (
{DECONTAMINATE_SQL.strip()}
)
SELECT d.source,
       COUNT(*) AS n_docs,
       round(CAST(SUM(CAST(q.quality_score AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_quality,
       CAST(SUM(CASE WHEN k.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_copies,
       CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_contaminated
FROM documents d
JOIN q USING (doc_id)
LEFT JOIN keep k ON k.doc_id = d.doc_id
LEFT JOIN (SELECT DISTINCT doc_id FROM decon) c ON c.doc_id = d.doc_id
GROUP BY d.source
"""


def training_data_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-data pipeline, raw corpus to packed
    training sequences in one DAG:

        quality filter → exact dedup → near-dup keep-one →
        eval-slice decontamination → source mixture sampling →
        temperature language rebalancing → greedy sequence packing

    i.e. clean_corpus_decontaminated's survivor set, down-weighted per
    source by the deterministic mixture rule, rebalanced across
    languages by the alpha=1/2 temperature rule
    (sampling.temperature_rebalance_sample's exact rate table and salt),
    then packed into fixed-budget bins per language — the manifest a
    tokenizer/trainer consumes.  Every stage is the already-certified
    operator; this query pins that the COMPOSITION stays exact
    end-to-end (one recursive-CTE oracle replays the whole chain).

    Scale: stage boundaries are id-keyed anti/semi-joins carrying ids
    and hashes; both sampling stages are stateless map-side hash
    filters against broadcast rate tables (the temperature rates come
    from the raw corpus language histogram — one |langs|-row aggregate
    off the same scan, never a second pass over the cleaned chain);
    text is re-read only for the final token count of the surviving
    slice, and the packing fold's state is O(1) per language."""
    ccd = clean_corpus_decontaminated(spark, sf_dir)
    return with_shared_caches(
        _mixture_temp_pack(spark, sf_dir, ccd.select("doc_id")), ccd
    )


def _mix_keep_col() -> F.Column:
    """Source-mixture keep predicate (expects ``source``/``doc_id``
    columns in scope) — shared by the flagship tail and the funnel
    attribution so the two can never disagree on a sampling decision."""
    from golang_mapreduce_spark.operators.corpus import MIX_PCTS
    from golang_mapreduce_spark.functions.hashing import hash32

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
    return bucket < pct


def _temp_keep_col() -> F.Column:
    """Temperature keep predicate (expects ``doc_id`` and a joined
    ``rate_ppm`` in scope)."""
    from golang_mapreduce_spark.operators.sampling import PPM
    from golang_mapreduce_spark.functions.hashing import hash32

    h_temp = hash32(F.concat(F.lit("temp:"), F.col("doc_id").cast("string")))
    return h_temp % PPM < F.col("rate_ppm")


def _mix_pred_sql(alias: str) -> str:
    """DuckDB twin of :func:`_mix_keep_col`."""
    from golang_mapreduce_spark.functions.hashing import sql_hash32
    from golang_mapreduce_spark.operators.corpus import MIX_PCTS

    hash_expr = sql_hash32(f"{alias}.source || ':' || CAST({alias}.doc_id AS VARCHAR)")
    digit_re = "'(" + "\\d" + "+)'"
    return (
        f"{hash_expr} % 100 < "
        f"CASE CAST(regexp_extract({alias}.source, {digit_re}, 1) AS INT) % 4 "
        f"WHEN 0 THEN {MIX_PCTS[0]} WHEN 1 THEN {MIX_PCTS[1]} "
        f"WHEN 2 THEN {MIX_PCTS[2]} ELSE {MIX_PCTS[3]} END"
    )


def _mixture_temp_pack(spark: SparkSession, sf_dir: str, surv: DataFrame) -> DataFrame:
    """Shared tail of the flagship pipelines: source mixture sampling →
    temperature language rebalancing → greedy per-language sequence
    packing, over any survivor id set.  Both sampling stages are
    stateless map-side hash filters against broadcast rate tables; text
    is re-read only for the final token count of the surviving slice."""
    from golang_mapreduce_spark.operators.corpus import pack_docs
    from golang_mapreduce_spark.operators.sampling import temp_rates
    from golang_mapreduce_spark.functions.text import ws_words

    docs = load_table(spark, sf_dir, "documents")
    kept = (
        docs.join(surv, "doc_id")
        .where(_mix_keep_col())
        .join(temp_rates(docs), "lang")
        .where(_temp_keep_col())
    )
    toks = kept.select(
        "doc_id", "lang", F.size(ws_words("text")).cast("bigint").alias("n_toks")
    )
    return pack_docs(toks)


def _training_tail_sql(extra_ctes: str = "", extra_pred: str = "") -> str:
    """Assemble the full training-run oracle: the clean+decontaminate
    chain, optional extra CTEs spliced before ``surv`` (and an optional
    extra predicate on ``surv``), then the shared mixture → temperature
    → pack tail."""
    from golang_mapreduce_spark.operators.corpus import packed_walk_sql
    from golang_mapreduce_spark.operators.sampling import (
        TEMP_KEEP_PRED,
        TEMP_RATES_CTES,
    )

    full = _clean_corpus_decon_sql().strip()
    head, final = full.split("SELECT doc_id, lang, n_chars", 1)
    mix_pred = _mix_pred_sql("d")
    extra_ctes_clause = f"{extra_ctes},\n" if extra_ctes else ""
    return f"""{head.rstrip().rstrip(',')},
{extra_ctes_clause}surv AS (
  SELECT doc_id, lang, n_chars{final}
  {extra_pred}
),
{TEMP_RATES_CTES},
toksrc AS (
  SELECT d.doc_id, d.lang,
         CAST(len(list_filter(regexp_split_to_array(d.text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_toks
  FROM documents d
  JOIN surv s USING (doc_id)
  JOIN trates r ON r.lang = d.lang
  WHERE {mix_pred}
    AND {TEMP_KEEP_PRED.format(alias='d')}
),
{packed_walk_sql('toksrc')}
SELECT doc_id, lang, n_toks, bin_id FROM packwalk
"""


def _training_data_run_sql() -> str:
    return _training_tail_sql()


def training_data_run_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship pipeline with the SEMANTIC dedup tier composed in
    (VERDICT r5 #3):

        quality filter → exact dedup → near-dup keep-one →
        SEMANTIC dedup (IVF-blocked cosine groups, keep-best-quality) →
        eval-slice decontamination → source mixture sampling →
        temperature language rebalancing → greedy sequence packing

    The semantic stage subtracts :func:`dedup.semantic_drop_ids` — the
    non-representative members of every embedding-cosine group — so the
    end-to-end chain exercises blocked_components' one-shuffle
    union-find and the quality-keep decision inside the composition.
    The drop set is computed on the raw corpus (embeddings are per-doc),
    so the anti-join commutes with the other id filters and the oracle
    replays the whole chain in the same single recursive-CTE statement.

    Scale: adds exactly the SemDeDup dataflow (broadcast ~sqrt(N)
    centroids, per-cluster BLAS gram, ids-only drop set) between two
    id-keyed anti-joins; no new text scan, no new global shuffle."""
    from golang_mapreduce_spark.operators.dedup import semantic_drop_ids

    # the semantic drop set is computed on the raw corpus — independent
    # of the clean/decon chain, so its whole dataflow (IVF centroids,
    # per-cluster union-find, quality rank) builds and materializes on
    # a driver thread while the main thread runs the CC chain (guide
    # §2.6, r17); ids only, one long per dropped doc in cache
    def _build_drop() -> DataFrame:
        drop = semantic_drop_ids(spark, sf_dir).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        drop.count()
        return drop

    with _overlapped_job(
        spark, "semantic drop ids (overlapped)", _build_drop
    ) as fut:
        ccd = clean_corpus_decontaminated(spark, sf_dir)
    drop = fut.result()
    surv = ccd.select("doc_id").join(drop, "doc_id", "left_anti")
    return with_shared_caches(
        _mixture_temp_pack(spark, sf_dir, surv), ccd, drop
    )


def _training_data_run_semantic_sql() -> str:
    from golang_mapreduce_spark.operators.dedup import semantic_drop_ctes
    from golang_mapreduce_spark.operators.similarity import EMB_ASSIGN_CTES

    return _training_tail_sql(
        extra_ctes=f"{EMB_ASSIGN_CTES},\n{semantic_drop_ctes()}",
        extra_pred="AND doc_id NOT IN (SELECT doc_id FROM semdrop)",
    )


def pipeline_drop_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE DID MY DATA GO — the funnel table for the flagship
    pipeline: every document is attributed to the FIRST stage that
    drops it, in the pipeline's own order (quality → exact dedup →
    near-dup keep-one → eval-slice exclusion → decontamination →
    source mixture → temperature rebalance → kept), and the result is
    one row per (stage, source) with the doc count.  This is the
    retention/funnel readout every published pipeline reports (the
    RefinedWeb/Dolma-style "removal rate by stage" table) and the
    first thing anyone asks when a source's token count comes up short
    — gopher_quality_rules gives it for the quality rules, this gives
    it for the whole pipeline.

    Every stage predicate is the certified operator's own machinery
    (quality_scores, the keep-min md5 groups over quality survivors,
    clusters_from over the banded pairs, decontaminate_docs,
    _mix_keep_col/_temp_keep_col shared with the flagship tail), so
    attribution can never disagree with what training_data_run actually
    drops; the CASE precedence mirrors the stage order exactly.

    Scale shape: each stage contributes an ids-only marker relation
    joined on doc_id (the text is scanned by the quality/signature/
    decon passes exactly as in the flagship run — no new text scan);
    the final aggregate is one partial-agg'd exchange on a
    (8 × |sources|)-row key.  The quality-score and exact-dup-keeper
    marker relations each feed TWO consumers (the survivor filter
    chain and the final attribution join), so both are persisted once
    — ids + one score/flag per row, never text — instead of re-running
    the quality tokenization and the md5 keeper grouping per branch
    (the round-14 subtree-reuse discipline; ``_gmrs_shared_caches``
    lifecycle, harness-owned clearCache)."""
    from pyspark.storagelevel import StorageLevel

    from golang_mapreduce_spark.operators.corpus import (
        DECON_MOD,
        decontaminate_docs,
    )
    from golang_mapreduce_spark.operators.sampling import temp_rates

    docs = load_table(spark, sf_dir, "documents")
    q = (
        quality_scores(spark, sf_dir)
        .select("doc_id", "quality_score")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    good = q.where(F.col("quality_score") >= QUALITY_MIN).select("doc_id")
    docs_f = docs.join(good, "doc_id")
    keepers = (
        docs_f.groupBy(F.md5(F.lower(F.trim("text"))).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(1).alias("is_keeper"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    docs_d = docs_f.join(keepers.select("doc_id"), "doc_id")
    pairs_full = minhash_pairs_from(docs_d.select("doc_id", "text"))
    # the decon probe reads the raw corpus — independent of the CC
    # chain, so its ids materialize on a driver thread while the main
    # thread runs the convergence actions (guide §2.6, r17; see
    # clean_corpus_decontaminated)
    cont = (
        decontaminate_docs(spark, sf_dir)
        .select("doc_id", F.lit(1).alias("is_cont"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    with _overlapped_force(spark, cont, "decon probe (overlapped)"):
        clusters = clusters_from(pairs_full.select("doc_a", "doc_b"))
    neardrop = (
        clusters
        .where(F.col("cluster_id") != F.col("doc_id"))
        .select("doc_id", F.lit(1).alias("is_neardrop"))
    )
    d = (
        docs.select("doc_id", "source", "lang")
        .join(q, "doc_id")
        .join(keepers.select("doc_id", "is_keeper"), "doc_id", "left")
        .join(neardrop, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .join(temp_rates(docs), "lang")
    )
    stage = (
        F.when(F.col("quality_score") < QUALITY_MIN, "quality")
        .when(F.col("is_keeper").isNull(), "exact_dup")
        .when(F.col("is_neardrop").isNotNull(), "near_dup")
        .when(F.col("doc_id") % DECON_MOD == 0, "eval_slice")
        .when(F.col("is_cont").isNotNull(), "contaminated")
        .when(~_mix_keep_col(), "mixture")
        .when(~_temp_keep_col(), "temperature")
        .otherwise("kept")
    )
    out = (
        d.select(stage.alias("stage"), "source")
        .groupBy("stage", "source")
        .agg(F.count("*").alias("n_docs"))
    )
    # ALL five caches this op registers: its own three marker relations
    # (q, keepers, and r17's overlapped decon ids) plus the two nested
    # in the composed subtrees — the signature cache inside
    # minhash_pairs_from and the CC final state — which the old
    # hand-attached tuple leaked to eager callers (ADVICE r14 medium)
    return with_shared_caches(out, q, keepers, cont, pairs_full, clusters)


def _pipeline_drop_attribution_sql() -> str:
    from golang_mapreduce_spark.operators.corpus import (
        DECON_MOD,
        DECONTAMINATE_SQL,
    )
    from golang_mapreduce_spark.operators.sampling import (
        TEMP_KEEP_PRED,
        TEMP_RATES_CTES,
    )

    return f"""
WITH RECURSIVE q AS (
  {QUALITY_SQL.strip()}
),
docs_f AS (
  SELECT d.* FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM q WHERE quality_score >= {QUALITY_MIN})
),
keep1 AS (
  SELECT MIN(doc_id) AS doc_id FROM docs_f GROUP BY md5(lower(trim(text)))
),
docs_d AS (
  SELECT * FROM docs_f WHERE doc_id IN (SELECT doc_id FROM keep1)
),
pairs AS (
  {minhash_pairs_sql("docs_d").strip()}
),
{cc_walk_sql('pairs')},
neardrop AS (
  SELECT doc_id FROM clusters WHERE cluster_id <> doc_id
),
decon AS (
{DECONTAMINATE_SQL.strip()}
),
{TEMP_RATES_CTES},
staged AS (
  SELECT d.source,
         CASE WHEN qq.quality_score < {QUALITY_MIN} THEN 'quality'
              WHEN d.doc_id NOT IN (SELECT doc_id FROM keep1) THEN 'exact_dup'
              WHEN d.doc_id IN (SELECT doc_id FROM neardrop) THEN 'near_dup'
              WHEN d.doc_id % {DECON_MOD} = 0 THEN 'eval_slice'
              WHEN d.doc_id IN (SELECT doc_id FROM decon) THEN 'contaminated'
              WHEN NOT ({_mix_pred_sql('d')}) THEN 'mixture'
              WHEN NOT ({TEMP_KEEP_PRED.format(alias='d')}) THEN 'temperature'
              ELSE 'kept' END AS stage
  FROM documents d
  JOIN q qq USING (doc_id)
  JOIN trates r USING (lang)
)
SELECT stage, source, COUNT(*) AS n_docs
FROM staged
GROUP BY stage, source
"""


# --- quality-filter ablation matrix (round 9) -----------------------------

#: Spark-SQL boolean predicate expressions, mirrored verbatim (modulo
#: function spelling) in the oracle.  Integer/ratio thresholds chosen on
#: the synthetic corpus so every flag has both populations.
ABLATION_FLAGS = (
    ("len_ok", "n_chars BETWEEN 80 AND 5000"),
    # 5*distinct >= 2*n + 5  <=>  distinct >= 0.4*n + 1, in exact BIGINT
    # arithmetic (a double->INT cast truncates in Spark but rounds in
    # DuckDB, so the float form drifts at e.g. n=34)
    ("ttr_ok", "5 * size(array_distinct(toks)) >= 2 * size(toks) + 5"),
    # explicit empty/NULL branch: ANSI mode makes the bare division
    # throw on zero tokens (adversarial edge corpus), and the FALSE it
    # maps to must be spelled out identically in the oracle
    ("awl_ok",
     "CASE WHEN size(toks) IS NULL OR size(toks) = 0 THEN false "
     "ELSE (CAST(n_chars - size(toks) + 1 AS DOUBLE) / size(toks)) "
     "BETWEEN 3.0 AND 8.0 END"),
)


def quality_ablation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter ablation census: survivor counts for EVERY combination of
    the quality predicates (CUBE over the flag booleans, NULL = the
    "don't care" rollup), with each cell's share of the corpus — the
    table that answers "what does each filter cost, alone and jointly"
    BEFORE anyone re-runs the pipeline 2^k times.  Complements
    pipeline_drop_attribution (which sequences ONE pipeline's stages;
    this measures every subset in one pass).

    Scale shape: one text scan computes the three flags, one CUBE
    aggregate (Spark expands each row into the 8 grouping sets in the
    map side, partial-agg'd — no extra scans, no joins); the share
    divides by the corpus count taken from the cube's own grand-total
    row via a 1-row broadcast cross join.  Output is 8 grouping sets ×
    the observed flag values (27 rows when no flag is NULL as data).

    The ``gid`` column is ``grouping_id()`` (len_ok = MSB): it
    distinguishes a rollup-NULL cell from a NULL *data* value (a
    NULL-text doc yields ttr_ok = NULL as data — ADVICE r9), and the
    grand total is selected by gid = 7, never by IS NULL."""
    docs = load_table(spark, sf_dir, "documents").select(
        "n_chars", ws_words("text").alias("toks")
    )
    flagged = docs.select(
        *[F.expr(expr).alias(name) for name, expr in ABLATION_FLAGS]
    )
    cube = flagged.cube("len_ok", "ttr_ok", "awl_ok").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count("*").alias("n_docs"),
    )
    total = cube.where(F.col("gid") == 7).select(
        F.col("n_docs").alias("n_total")
    )
    return cube.crossJoin(F.broadcast(total)).select(
        "len_ok",
        "ttr_ok",
        "awl_ok",
        "gid",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(F.col("n_docs") / F.col("n_total"), 6).alias("share"),
    )


QUALITY_ABLATION_SQL = r"""
WITH flagged AS (
  SELECT n_chars BETWEEN 80 AND 5000 AS len_ok,
         5 * len(list_distinct(toks)) >= 2 * len(toks) + 5 AS ttr_ok,
         CASE WHEN len(toks) IS NULL OR len(toks) = 0 THEN false
              ELSE (CAST(n_chars - len(toks) + 1 AS DOUBLE) / len(toks))
                   BETWEEN 3.0 AND 8.0 END AS awl_ok
  FROM (
    SELECT n_chars,
           list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
    FROM documents
  )
),
cube_agg AS (
  SELECT len_ok, ttr_ok, awl_ok,
         CAST(GROUPING(len_ok, ttr_ok, awl_ok) AS BIGINT) AS gid,
         COUNT(*) AS n_docs
  FROM flagged GROUP BY CUBE (len_ok, ttr_ok, awl_ok)
),
total AS (
  SELECT n_docs AS n_total FROM cube_agg WHERE gid = 7
)
SELECT len_ok, ttr_ok, awl_ok, gid,
       CAST(n_docs AS BIGINT) AS n_docs,
       ROUND(CAST(n_docs AS DOUBLE) / n_total, 6) AS share
FROM cube_agg, total
"""



QUERIES = {
    "clean_corpus": clean_corpus,
    "clean_corpus_decontaminated": clean_corpus_decontaminated,
    "source_reputation": source_reputation,
    "training_data_run": training_data_run,
    "training_data_run_semantic": training_data_run_semantic,
    "pipeline_drop_attribution": pipeline_drop_attribution,
    "quality_ablation_matrix": quality_ablation_matrix,
}
ORACLES = {
    "clean_corpus": CLEAN_CORPUS_SQL,
    "clean_corpus_decontaminated": _clean_corpus_decon_sql(),
    "source_reputation": _source_reputation_sql(),
    "training_data_run": _training_data_run_sql(),
    "training_data_run_semantic": _training_data_run_semantic_sql(),
    "pipeline_drop_attribution": _pipeline_drop_attribution_sql(),
    "quality_ablation_matrix": QUALITY_ABLATION_SQL,
}
