"""Round-16 optimization pins.

1. Bounded-state streaming drains run their state stores at
   ``BOUNDED_STATE_PARTITIONS`` (not the session core count) — the
   drain must RESTORE the session's shuffle-partition conf and produce
   the identical result it produced at the session default (state
   partitioning cannot change an aggregation's output; this pins it).
2. The DSIR conditional-sum consolidation (ROADMAP r16 #2) keeps the
   docb cache as the op's only registered handle and the per-bucket
   ratio relation equal to the old four-re-group derivation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from golang_mapreduce_spark.streaming import jobs as sj


def test_bounded_state_drain_restores_conf_and_result(spark, sf_dir):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    bounded = sj.streaming_cms_cells(spark, sf_dir)
    rows_bounded = sorted(map(tuple, bounded.collect()))
    assert spark.conf.get(key) == before, "drain leaked its conf override"
    # same drain with the session-default state partitioning: the
    # result must be identical (partition count is invisible to the
    # aggregation) — run via the raw helper with state_partitions=None
    docs = (
        spark.readStream.schema(sj.docs_stream_schema())
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    from golang_mapreduce_spark.functions.hashing import hash32
    from golang_mapreduce_spark.functions.text import ws_words
    from golang_mapreduce_spark.operators.textstats import CMS_ROWS, CMS_WIDTH

    toks = docs.select(F.explode(ws_words("text")).alias("tok"))
    buckets = toks.select(
        F.posexplode(
            F.array(
                *[
                    (hash32(F.concat(F.col("tok"), F.lit(f"#cms{i}")))
                     % CMS_WIDTH).cast("int")
                    for i in range(CMS_ROWS)
                ]
            )
        ).alias("row_i", "bucket")
    )
    cells = buckets.groupBy("row_i", "bucket").agg(
        F.count("*").cast("bigint").alias("cell_n")
    )
    default_parts = sj.run_stream_to_batch(cells, spark)
    rows_default = sorted(map(tuple, default_parts.collect()))
    assert rows_bounded == rows_default
    assert spark.conf.get(key) == before


def test_run_stream_to_batch_never_raises_parallelism(spark, sf_dir):
    """A session benching at fewer cores than BOUNDED_STATE_PARTITIONS
    must keep its own (smaller) partition count: the cap only ever
    lowers.  Exercised through a real drain with a floor larger than
    the test session's 8 shuffle partitions."""
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    events = sj.read_events_stream(spark, sf_dir)
    out = sj.run_stream_to_batch(
        sj.hourly_counts_stream(events),
        spark,
        state_partitions=10_000,  # larger than the session's 8
    )
    assert out.count() > 0
    assert spark.conf.get(key) == before


def test_dsir_ratio_consolidation_matches_four_regroup_form(spark, sf_dir):
    """The single conditional-sum re-group (stats -> windowed totals ->
    s IS NOT NULL) must reproduce the old tcnt/scnt/ttot/stot algebra
    bucket for bucket."""
    from golang_mapreduce_spark.operators.corpus import (
        DECON_MOD,
        DSIR_BUCKETS,
        dsir_importance_weights,
    )
    from golang_mapreduce_spark.functions.text import ws_words
    from golang_mapreduce_spark.functions.hashing import hash32
    from golang_mapreduce_spark.operators.dedup import _shingles
    from golang_mapreduce_spark.sources.fixtures import load_table

    new = dsir_importance_weights(spark, sf_dir)
    new_rows = sorted(map(tuple, new.collect()))

    # legacy derivation, verbatim from the round-15 form
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
    docb = feats.groupBy("doc_id", "b").agg(F.count("*").alias("cnt"))
    is_target = F.col("doc_id") % DECON_MOD == 0
    tcnt = docb.where(is_target).groupBy("b").agg(F.sum("cnt").alias("t"))
    scnt = docb.where(~is_target).groupBy("b").agg(F.sum("cnt").alias("s"))
    ttot = tcnt.agg(F.coalesce(F.sum("t"), F.lit(0)).alias("tt"))
    stot = scnt.agg(F.coalesce(F.sum("s"), F.lit(0)).alias("st"))
    ratio = (
        scnt.join(tcnt, "b", "left")
        .crossJoin(F.broadcast(ttot))
        .crossJoin(F.broadcast(stot))
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
    legacy = (
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
    legacy_rows = sorted(map(tuple, legacy.collect()))
    assert new_rows == legacy_rows
    spark.catalog.clearCache()


def test_tfidf_df_from_tf_matches_distinct_recount(spark, sf_dir):
    """tfidf's document frequency now re-groups the persisted tf
    relation; it must equal the old words.distinct() recount."""
    from golang_mapreduce_spark.functions.text import ws_words
    from golang_mapreduce_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(ws_words("text")).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_new = tf.groupBy("word").agg(F.count("*").alias("df"))
    df_old = words.distinct().groupBy("word").agg(F.count("*").alias("df"))
    assert df_new.exceptAll(df_old).count() == 0
    assert df_old.exceptAll(df_new).count() == 0
