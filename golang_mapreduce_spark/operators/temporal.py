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


RESAMPLE_USER_MOD = 20  # resample the 1-in-20 user slice (bounds output rows)


def resample_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample with gap filling: the last observed event
    value in each hour, forward-filled across hours with no events —
    the standard feature-store "latest known value on a regular grid"
    materialization (pandas resample().ffill(), at Spark scale).

    Three distributed steps, each shuffling on user_id only:
    1. last value per (user, hour): row_number over (ts, event_id) DESC
       — event_id breaks ts ties deterministically (same discipline as
       the as-of join above);
    2. the hourly grid per user: sequence(min hour, max hour, 1h) from a
       tiny per-user aggregate, exploded — grid rows ~ users x hours,
       generated distributed, never on the driver;
    3. left join grid<-observed on (user, hour), then forward fill via
       last(value, ignorenulls) over an unbounded-preceding ROWS frame.
    No leading-null case exists: each user's grid starts at an observed
    hour.  At 100 TB the grid join and the fill reuse the same hash
    partitioning on user_id, so steps 2-3 are one Exchange."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("user_id") % RESAMPLE_USER_MOD == 0
    )
    hourly = e.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("hour"),
        "ts",
        "event_id",
        "value",
    )
    w_last = Window.partitionBy("user_id", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    observed = (
        hourly.withColumn("rn", F.row_number().over(w_last))
        .where(F.col("rn") == 1)
        .select("user_id", "hour", F.col("value").alias("obs_value"))
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("h_lo"), F.max("hour").alias("h_hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h_lo", "h_hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(observed, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.last("obs_value", ignorenulls=True).over(w_fill).alias("value"),
            F.col("obs_value").isNotNull().alias("observed"),
        )
    )


RESAMPLE_SQL = f"""
WITH slice AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, ts, event_id, value
  FROM events WHERE user_id % {RESAMPLE_USER_MOD} = 0
), observed AS (
  SELECT user_id, hour, value AS obs_value
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id, hour ORDER BY ts DESC, event_id DESC) AS rn
    FROM slice
  ) WHERE rn = 1
), grid AS (
  SELECT user_id, UNNEST(generate_series(h_lo, h_hi, INTERVAL 1 HOUR)) AS hour
  FROM (SELECT user_id, MIN(hour) AS h_lo, MAX(hour) AS h_hi
        FROM slice GROUP BY user_id)
)
SELECT g.user_id, g.hour,
       LAST_VALUE(o.obs_value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       o.obs_value IS NOT NULL AS observed
FROM grid g LEFT JOIN observed o
  ON g.user_id = o.user_id AND g.hour = o.hour
"""


QUERIES = {
    "asof_purchase_click": asof_purchase_click,
    "range_clicks_before_error": range_clicks_before_error,
    "resample_gapfill_hourly": resample_gapfill_hourly,
}

ORACLES = {
    "asof_purchase_click": ASOF_SQL,
    "range_clicks_before_error": RANGE_SQL,
    "resample_gapfill_hourly": RESAMPLE_SQL,
}
