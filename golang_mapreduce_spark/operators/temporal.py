"""Temporal join operators over the ``events`` table: as-of (merge-asof)
join and bounded range join — primitives Spark's join syntax lacks but a
training-data / feature pipeline needs constantly ("the latest feature
value at label time", "activity in the trailing window").

The reference cannot express either (one M→R round, no ordered state,
SURVEY.md §2.4); DuckDB has both natively (ASOF JOIN, inequality join),
which makes the oracles direct.

Spark-first implementations, chosen for the 100 TB shape:

* as-of: the UNION-AND-SORT form — tag both sides, one shuffle on the
  key, one in-partition sort by (ts, tag), then last_value(...) IGNORE
  NULLS carries the most recent right-side row forward.  Cost is a
  single Exchange + sort regardless of how many left rows map to the
  same right row — there is NO join fan-out at all, which is why this
  beats the join-then-argmax form (whose candidate set explodes on
  skewed keys).
* bounded range join: quantize time into buckets of the range width,
  replicate the probe side into (bucket, bucket+1), equi-join on
  (key, bucket), post-filter the exact bounds.  Each row joins ≤2
  buckets, so the worst-case blow-up is 2×, not O(rows-in-range) —
  the standard bounded-interval join strategy (Spark's own range-join
  hints on Databricks do the same binning internally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_mapreduce_spark.sources.fixtures import load_table

RANGE_SECONDS = 300  # bounded range join: trailing 5 minutes


def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event: the same user's most recent click at or
    before the purchase (classic merge-asof, LEFT semantics — purchases
    with no prior click keep NULLs).

    Union-and-sort: clicks sort before purchases at equal ts (tag 0 < 1),
    giving the inclusive <= of ASOF JOIN; event_id breaks any remaining
    tie deterministically."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        "event_id",
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        "event_id",
        F.lit(None).cast("timestamp").alias("c_ts"),
        F.lit(None).cast("double").alias("c_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .select(
            "user_id",
            "ts",
            "tag",
            "event_id",
            F.last("c_ts", ignorenulls=True).over(w).alias("last_click_ts"),
            F.last("c_value", ignorenulls=True).over(w).alias("last_click_value"),
        )
        .where(F.col("tag") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "last_click_ts",
            "last_click_value",
        )
    )


# NOT DuckDB's ASOF JOIN: under click-timestamp ties ASOF picks an
# arbitrary row, while the Spark union-and-sort side deterministically
# takes the highest event_id among clicks at the max ts <= purchase ts.
# The explicit ROW_NUMBER tie-break (c.ts DESC, c.event_id DESC) pins the
# same choice, so the oracle stays deterministic even if a regenerated
# fixture introduces duplicate (user_id, ts) click pairs (ADVICE r2).
ASOF_SQL = """
SELECT user_id, purchase_id, purchase_ts, last_click_ts, last_click_value
FROM (
  SELECT p.user_id,
         p.event_id AS purchase_id,
         p.ts AS purchase_ts,
         c.ts AS last_click_ts,
         c.value AS last_click_value,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND c.ts <= p.ts
)
WHERE rn = 1
"""


def range_clicks_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event: how many clicks the same user made in the
    trailing 5 minutes (inclusive bounds).  Bucketed equi-join: clicks
    replicate into their bucket and the next, so an error's bucket always
    covers [ts-300s, ts]; exact bounds filter after the join."""
    e = load_table(spark, sf_dir, "events")
    errors = e.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("e_ts"),
        (F.unix_timestamp("ts") / RANGE_SECONDS).cast("long").alias("bucket"),
    )
    clicks = (
        e.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.explode(
                F.array(
                    (F.unix_timestamp("ts") / RANGE_SECONDS).cast("long"),
                    (F.unix_timestamp("ts") / RANGE_SECONDS).cast("long") + 1,
                )
            ).alias("bucket"),
        )
    )
    # exact bounds INSIDE the left-join condition: a post-join filter
    # would drop errors whose only bucket-candidates are out of range,
    # losing their count-0 rows
    matched = errors.join(
        clicks,
        (errors.user_id == clicks.c_user)
        & (errors.bucket == clicks.bucket)
        & (clicks.c_ts <= errors.e_ts)
        & (clicks.c_ts >= errors.e_ts - F.expr(f"INTERVAL {RANGE_SECONDS} SECONDS")),
        "left",
    )
    return matched.groupBy("user_id", "error_id", F.col("e_ts").alias("error_ts")).agg(
        F.count("c_ts").alias("n_recent_clicks")
    )


RANGE_SQL = f"""
SELECT e.user_id,
       e.event_id AS error_id,
       e.ts AS error_ts,
       (SELECT COUNT(*) FROM events c
        WHERE c.event_type = 'click'
          AND c.user_id = e.user_id
          AND c.ts BETWEEN e.ts - INTERVAL {RANGE_SECONDS} SECOND AND e.ts
       ) AS n_recent_clicks
FROM events e
WHERE e.event_type = 'error'
"""


QUERIES = {
    "asof_purchase_click": asof_purchase_click,
    "range_clicks_before_error": range_clicks_before_error,
}

ORACLES = {
    "asof_purchase_click": ASOF_SQL,
    "range_clicks_before_error": RANGE_SQL,
}
