"""Skew-handling operators — salting patterns for hot keys.

AQE's skew-join splitting (on in the session factory) handles most skew
at runtime; these operators are the *manual* patterns for the cases AQE
can't see (skewed aggregation state, skewed broadcast-ineligible joins),
written so that salting provably does not change results: both queries
are oracle-checked against their unsalted SQL equivalents.

The reference has no skew story at all — one hot key lands on one of its
10 static reduce buckets and serializes (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_mapreduce_spark.functions.text import letter_words
from golang_mapreduce_spark.operators.relational import _dec
from golang_mapreduce_spark.sources.fixtures import load_table

SALT_BUCKETS = 8


def salted_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count with two-phase salted aggregation: phase 1 aggregates
    (word, salt) — a hot word's rows spread over SALT_BUCKETS partitions —
    phase 2 merges the per-salt partials.  Identical results to plain wc
    (same oracle), one extra (tiny) shuffle: the trade a 100 TB pipeline
    makes when one key dominates a partition.

    Spark's own partial aggregation already does this *within* each map
    partition; explicit salting additionally splits a hot key across
    *reduce* partitions, which partial agg cannot."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(letter_words("text")).alias("word"))
    salted = words.withColumn(
        "salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(SALT_BUCKETS))
    )
    partial = salted.groupBy("word", "salt").agg(F.count("*").alias("c"))
    return partial.groupBy("word").agg(F.sum("c").alias("cnt"))


# salting must not change the answer: the oracle is plain word count
from golang_mapreduce_spark.operators.mr_parity import WORD_COUNT_SQL  # noqa: E402

SALTED_WC_SQL = WORD_COUNT_SQL


def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed fact-to-fact join with key salting: the probe side gets a
    random salt in [0, S); the build side is replicated S× with every
    salt value; the join key becomes (key, salt), splitting a hot key
    across S reduce partitions.  Results provably identical to the
    unsalted join (oracle below).

    Use when the hot side is too big to broadcast and AQE's split sizes
    still leave stragglers.  Cost: S× replication of the build side —
    only worth it for the skewed key range (production: salt only keys
    above a frequency threshold, union the rest unsalted)."""
    l = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.hash("l_linenumber", "l_partkey"), F.lit(SALT_BUCKETS))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .crossJoin(F.broadcast(spark.range(SALT_BUCKETS).select(F.col("id").cast("int").alias("salt"))))
    )
    return (
        l.join(o, (l.l_orderkey == o.o_orderkey) & (l.salt == o.salt))
        .groupBy("o_orderpriority")
        .agg(
            F.expr(
                f"CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS DOUBLE)"
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


SALTED_JOIN_SQL = f"""
SELECT o_orderpriority,
       CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


#: keys with at least this many fact rows count as "hot" (fixture orders
#: carry 1-7 lineitems, so >=6 selects a real non-empty subset)
HOT_KEY_THRESHOLD = 6


def hotkey_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production form of salted_join_revenue: salt ONLY the hot
    keys.  A frequency pass finds keys above HOT_KEY_THRESHOLD (at
    100 TB this is a sample-based sketch, not an exact count — the list
    just has to be a superset of the true stragglers); the hot slice of
    the probe side gets a salt and only the matching build keys are
    replicated S×, while the cold majority joins completely unsalted.
    Replication cost drops from S × |build| to S × |hot build keys| —
    the difference between salting being free and doubling the job.
    Results provably identical to the plain join (same oracle as the
    fully-salted variant)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hot = F.broadcast(
        l.groupBy("l_orderkey")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= HOT_KEY_THRESHOLD)
        .select(F.col("l_orderkey").alias("hk"))
    )
    l_hot = l.join(hot, l.l_orderkey == F.col("hk"), "left_semi").withColumn(
        "salt",
        F.pmod(F.hash("l_linenumber", "l_partkey"), F.lit(SALT_BUCKETS)).cast("int"),
    )
    l_cold = l.join(hot, l.l_orderkey == F.col("hk"), "left_anti").withColumn(
        "salt", F.lit(0).cast("int")
    )
    salts = F.broadcast(
        spark.range(SALT_BUCKETS).select(F.col("id").cast("int").alias("salt"))
    )
    o_hot = o.join(hot, o.o_orderkey == F.col("hk"), "left_semi").crossJoin(salts)
    o_cold = o.join(hot, o.o_orderkey == F.col("hk"), "left_anti").withColumn(
        "salt", F.lit(0).cast("int")
    )
    lu = l_hot.unionByName(l_cold)
    ou = o_hot.unionByName(o_cold)
    return (
        lu.join(ou, (lu.l_orderkey == ou.o_orderkey) & (lu.salt == ou.salt))
        .groupBy("o_orderpriority")
        .agg(
            F.expr(
                f"CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS DOUBLE)"
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


SKEW_TOP = 5


def join_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MEASURE step that precedes any salting decision: per join key
    (lineitem.l_orderkey — the build side of the salted joins above),
    the {SKEW_TOP} heaviest keys with their row count, share of the
    table, and skew factor vs the mean key weight.  A pipeline runs this
    before choosing between plain join / AQE skew split / hot-key
    salting; keys with skew_factor near 1 never justify a salt pass.

    Shape: one partial-agg'd exchange for the frequency pass (the same
    pass hotkey_salted_join_revenue's hot-key detection runs), a 1-row
    broadcast of the global stats, and a top-k window over the key
    histogram."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    tot = F.broadcast(
        freq.agg(
            F.sum("cnt").alias("total_rows"),
            F.count("*").alias("n_keys"),
        )
    )
    # orderBy().limit(k) compiles to TakeOrderedAndProject — a true
    # streaming top-k (per-partition heaps + driver merge of k rows),
    # never a sort of the key histogram; the rank is then recomputed
    # over just those k rows.  (A global row_number window would also be
    # safe on Spark 4 via WindowGroupLimit pushdown, but this is the
    # plan you'd write on purpose.)
    topk = freq.orderBy(F.desc("cnt"), F.asc("l_orderkey")).limit(SKEW_TOP)
    w = Window.orderBy(F.desc("cnt"), F.asc("l_orderkey"))
    return (
        topk.withColumn("rk", F.row_number().over(w))
        .crossJoin(tot)
        .select(
            F.col("l_orderkey").alias("join_key"),
            "cnt",
            F.round(F.col("cnt") / F.col("total_rows"), 6).alias("share"),
            F.round(
                F.col("cnt") / (F.col("total_rows") / F.col("n_keys")), 6
            ).alias("skew_factor"),
            "rk",
        )
    )


SKEW_DIAG_SQL = f"""
WITH freq AS (
  SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey
),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows, COUNT(*) AS n_keys FROM freq
)
SELECT l_orderkey AS join_key, cnt,
       ROUND(CAST(cnt AS DOUBLE) / total_rows, 6) AS share,
       ROUND(CAST(cnt AS DOUBLE) / (CAST(total_rows AS DOUBLE) / n_keys), 6)
         AS skew_factor,
       rk
FROM (
  SELECT l_orderkey, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, l_orderkey) AS rk
  FROM freq
), tot
WHERE rk <= {SKEW_TOP}
"""


QUERIES = {
    "salted_word_count": salted_word_count,
    "salted_join_revenue": salted_join_revenue,
    "hotkey_salted_join_revenue": hotkey_salted_join_revenue,
    "join_skew_diagnostics": join_skew_diagnostics,
}

ORACLES = {
    "salted_word_count": SALTED_WC_SQL,
    "salted_join_revenue": SALTED_JOIN_SQL,
    "hotkey_salted_join_revenue": SALTED_JOIN_SQL,
    "join_skew_diagnostics": SKEW_DIAG_SQL,
}
