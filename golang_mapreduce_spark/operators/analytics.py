"""Analytics window shapes beyond ROWS frames: RANGE-by-value frames,
ntile bucketing, and event-sequence (funnel) analysis.

These complete the window-function surface (SURVEY §2.4): running sums
and top-k use ROWS frames (operators/relational.py); here RANGE frames
bound by a VALUE interval (trailing 7 days, not 7 rows — the two differ
whenever a key has gaps or multiple rows per day), ntile's standard
larger-buckets-first distribution, and the min-timestamp-ordering form
of funnel analysis (one aggregation, no self-joins per funnel step).

Scale: all three shuffle once on their partition key; the funnel is a
single groupBy(user) with conditional MINs — the O(steps) self-join
formulation it replaces is the classic funnel anti-pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_mapreduce_spark.operators.relational import _dec
from golang_mapreduce_spark.sources.fixtures import load_table


def window_range_7day_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer: each order with the trailing-7-DAY order total — a
    RANGE frame keyed on the order date VALUE (epoch days), so same-day
    orders aggregate together and calendar gaps shrink the frame, which
    no ROWS frame can express."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.expr(
            f"CAST(SUM({_dec('o_totalprice')}) OVER ("
            "PARTITION BY o_custkey ORDER BY unix_date(CAST(o_orderdate AS DATE)) "
            "RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)"
        ).alias("trailing_7d_spend"),
    )


RANGE_7DAY_SQL = f"""
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(SUM({_dec('o_totalprice')}) OVER (
         PARTITION BY o_custkey
         ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_7d_spend
FROM orders
"""


def ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance quartiles: ntile(4) over a total order (ties broken by
    custkey), rolled up to per-quartile count and decimal-exact balance
    sum.  ntile's standard distribution (larger buckets first) is shared
    by both engines."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select("c_custkey", "c_acctbal", F.ntile(4).over(w).alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.expr(f"CAST(SUM({_dec('c_acctbal')}) AS DOUBLE)").alias("total_bal"),
        )
    )


NTILE_SQL = f"""
SELECT quartile, COUNT(*) AS n_customers,
       CAST(SUM({_dec('c_acctbal')}) AS DOUBLE) AS total_bal
FROM (
  SELECT c_custkey, c_acctbal,
         NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
  FROM customer
)
GROUP BY quartile
"""


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel: a user converts at a step if their
    FIRST event of that type happens strictly after the previous step's
    first event.  One groupBy(user) with conditional MINs replaces the
    per-step self-join formulation (O(steps) scans and joins)."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return per_user.agg(
        F.count(F.col("t_view")).alias("users_viewed"),
        F.count(
            F.when(F.col("t_click") > F.col("t_view"), F.lit(1))
        ).alias("users_view_then_click"),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                F.lit(1),
            )
        ).alias("users_full_funnel"),
    )


FUNNEL_SQL = """
SELECT CAST(COUNT(t_view) AS BIGINT) AS users_viewed,
       CAST(COUNT(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT) AS users_view_then_click,
       CAST(COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END) AS BIGINT)
         AS users_full_funnel
FROM (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
)
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention-cohort matrix: users are cohorted by the week of
    their FIRST event, and each (cohort_week, weeks_since) cell counts
    distinct users from that cohort active that many weeks later — the
    standard retention triangle every activity dashboard starts from.

    Shape: one groupBy(user) for first-seen, a broadcast-free re-join on
    user_id (both sides hash-partition on it), then one partial-agg'd
    exchange keyed on the (cohort, offset) cell — cells are O(weeks²)
    regardless of event volume.  Weeks are epoch-day integer division
    (not date_trunc), so the bucketing is engine-portable arithmetic."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_date(CAST(ts AS DATE)) DIV 7").alias("wk")
    )
    first = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        e.join(first, "user_id")
        .groupBy(
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).cast("int").alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


RETENTION_SQL = """
WITH e AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk
  FROM events
),
first AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id
)
SELECT f.cohort_wk,
       CAST(e.wk - f.cohort_wk AS INT) AS weeks_since,
       COUNT(DISTINCT e.user_id) AS n_users
FROM e JOIN first f USING (user_id)
GROUP BY f.cohort_wk, e.wk - f.cohort_wk
"""


ANOMALY_Z = 2.0


def hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume anomaly detection per event type: bucket events
    into (type, hour) counts, z-score each bucket against ITS type's
    hourly distribution, and report buckets with |z| >= {ANOMALY_Z} —
    the monitoring query an ingest pipeline alerts on (traffic drops,
    bot spikes) before bad data reaches training.

    Exactness: hourly counts are integers, so the per-type moment sums
    (Σc, Σc²) are exact BIGINT arithmetic — means and stds are
    bit-identical across engines with no decimal machinery needed.
    Shape: one (type, hour) partial-agg'd exchange over the events
    scan, a per-type 1-row-per-type stats broadcast, and a narrow
    filter; cells are O(types × hours) regardless of event volume."""
    e = load_table(spark, sf_dir, "events")
    hc = (
        e.groupBy(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour_start"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    stats = F.broadcast(
        hc.groupBy("event_type").agg(
            F.count("*").alias("n_hours"),
            F.sum("cnt").alias("s1"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
        )
    )
    z = F.expr(
        "ROUND((cnt - CAST(s1 AS DOUBLE) / n_hours)"
        " / NULLIF(SQRT(GREATEST((CAST(s2 AS DOUBLE)"
        " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_hours)"
        " / NULLIF(n_hours - 1, 0), 0.0)), 0.0), 6)"
    )
    return (
        hc.join(stats, "event_type")
        .select("event_type", "hour_start", "cnt", z.alias("z_score"))
        .where(F.abs(F.col("z_score")) >= ANOMALY_Z)
    )


HOURLY_ANOMALY_SQL = f"""
WITH hc AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_start, COUNT(*) AS cnt
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
stats AS (
  SELECT event_type, COUNT(*) AS n_hours,
         CAST(SUM(cnt) AS BIGINT) AS s1,
         CAST(SUM(cnt * cnt) AS BIGINT) AS s2
  FROM hc GROUP BY event_type
)
SELECT hc.event_type, hc.hour_start, hc.cnt,
       ROUND((hc.cnt - CAST(s1 AS DOUBLE) / n_hours)
             / NULLIF(SQRT(GREATEST((CAST(s2 AS DOUBLE)
                                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_hours)
                                    / NULLIF(n_hours - 1, 0), 0.0)), 0.0), 6)
         AS z_score
FROM hc JOIN stats USING (event_type)
WHERE ABS(ROUND((hc.cnt - CAST(s1 AS DOUBLE) / n_hours)
          / NULLIF(SQRT(GREATEST((CAST(s2 AS DOUBLE)
                                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_hours)
                                 / NULLIF(n_hours - 1, 0), 0.0)), 0.0), 6)) >= {ANOMALY_Z}
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: order each user's events by (ts, event_id), count
    (previous type -> type) transitions, and row-normalize into
    transition probabilities — the behavioral-sequence summary that
    feeds next-event prediction features and funnel sanity checks.

    Scale shape: one shuffle partitions by user_id for the LAG window
    (users are high-cardinality, so partitions balance), then the pair
    counts collapse to |types|^2 rows; the row totals come from a window
    over that tiny aggregate.  event_id breaks timestamp ties so the
    sequence order is total and engine-identical."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )
    row_tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(row_tot), 6
        ).alias("prob"),
    )


EVENT_TRANSITION_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n_transitions,
       ROUND(CAST(n_transitions AS DOUBLE)
             / SUM(n_transitions) OVER (PARTITION BY prev_type), 6) AS prob
FROM pairs
"""


SEQ_NGRAM_K = 3     # event-type k-gram order
SEQ_NGRAM_TOP = 20  # patterns reported


def event_ngram_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining, k-gram form: the {SEQ_NGRAM_TOP} most
    frequent ordered {SEQ_NGRAM_K}-grams of event types within per-user
    timelines, with occurrence counts, distinct-user support, and the
    share of all users exhibiting the pattern — the k-th-order extension
    of event_transition_matrix (first-order is the k=2 special case).

    Scale shape: ONE window pass (the same per-user (ts, event_id)
    sort event_transition_matrix makes — two LEADs share one sort) and
    ONE aggregate; patterns collapse to at most |types|^k rows before
    the top-k, which is orderBy().limit() — TakeOrderedAndProject,
    per-partition heaps, never a global sort of the pattern relation.
    The user-count per pattern is a distinct-agg on (pattern, user)
    pairs, bounded by |types|^k x |users|, itself partial-agg'd.
    event_id breaks timestamp ties so sequences are engine-identical."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    grams = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .where(F.col("t3").isNotNull())
        .select(
            "user_id",
            F.concat_ws(">", "event_type", "t2", "t3").alias("pattern"),
        )
    )
    agg = grams.groupBy("pattern").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("user_id").alias("n_users"),
    )
    tot = F.broadcast(
        e.agg(F.countDistinct("user_id").alias("n_total_users"))
    )
    topk = agg.orderBy(F.desc("n_occurrences"), F.asc("pattern")).limit(
        SEQ_NGRAM_TOP
    )
    wr = Window.orderBy(F.desc("n_occurrences"), F.asc("pattern"))
    return (
        topk.withColumn("rank", F.row_number().over(wr))
        .crossJoin(tot)
        .select(
            "pattern",
            "rank",
            "n_occurrences",
            "n_users",
            F.round(F.col("n_users") / F.col("n_total_users"), 6).alias(
                "user_support"
            ),
        )
    )


EVENT_NGRAM_SQL = f"""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS t2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS t3
  FROM events
),
grams AS (
  SELECT user_id, event_type || '>' || t2 || '>' || t3 AS pattern
  FROM seq WHERE t3 IS NOT NULL
),
agg AS (
  SELECT pattern, COUNT(*) AS n_occurrences,
         COUNT(DISTINCT user_id) AS n_users
  FROM grams GROUP BY pattern
),
tot AS (
  SELECT COUNT(DISTINCT user_id) AS n_total_users FROM events
),
ranked AS (
  SELECT pattern, n_occurrences, n_users,
         ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, pattern)
           AS rank
  FROM agg
)
SELECT pattern, rank, n_occurrences, n_users,
       ROUND(CAST(n_users AS DOUBLE) / n_total_users, 6) AS user_support
FROM ranked, tot
WHERE rank <= {SEQ_NGRAM_TOP}
"""


# --- session funnel paths (round 9) --------------------------------------

FUNNEL_GAP_SECONDS = 1800  # 30-minute inactivity gap, as session_windows_30m
FUNNEL_PATH_LEN = 3
FUNNEL_TOP = 25


def session_funnel_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel entry-path mining: the {FUNNEL_TOP} most common ordered
    prefixes (first {FUNNEL_PATH_LEN} event types) of 30-minute-gap
    sessions — where journeys START, the complement of
    event_ngram_patterns (which slides k-grams over whole timelines
    with no session boundary) and event_transition_matrix (first-order
    only).  This is the table a funnel dashboard's "top entry flows"
    widget reads.

    Scale shape: gap sessionization is the session_windows_30m double
    window (lag + running sum) over ONE per-user (ts, event_id) sort;
    the per-session prefix is an ordered struct sort_array + slice
    inside the session aggregate (sessions are short — bounded
    collect), and the final top-k is orderBy().limit() =
    TakeOrderedAndProject, per-partition heaps, never a global sort of
    the path relation.  (ts, event_id) ordering is total, so paths are
    engine-identical."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        e.withColumn(
            # exact integer microseconds: cast("long") floors to seconds
            # and DuckDB's epoch() is fractional, so a gap like 1800.5 s
            # would land on different sides of the boundary per engine
            "gap_us",
            F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w),
        )
        .withColumn(
            "new_s",
            F.when(
                F.col("gap_us").isNull()
                | (F.col("gap_us") > FUNNEL_GAP_SECONDS * 1_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn("sess", F.sum("new_s").over(w))
    )
    paths = (
        sess.groupBy("user_id", "sess")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                1,
                FUNNEL_PATH_LEN,
            ).alias("head")
        )
        .select(
            F.concat_ws(
                ">", F.expr("transform(head, x -> x.event_type)")
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(FUNNEL_TOP)
    )


SESSION_FUNNEL_SQL = f"""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {FUNNEL_GAP_SECONDS * 1_000_000}
                   OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sess
  FROM seq
),
paths AS (
  SELECT array_to_string(
           list_slice(list(event_type ORDER BY ts, event_id),
                      1, {FUNNEL_PATH_LEN}), '>') AS path
  FROM sess GROUP BY user_id, sess
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT {FUNNEL_TOP}
"""



# --- user-activity power law (round 9, batch 5) ----------------------------

def user_activity_power_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events-per-user tail census in power-of-2 buckets: how many users
    sit in each activity magnitude, what share of ALL events each
    magnitude carries, and the cumulative share from the heaviest
    bucket down — the skew diagnostic that decides whether user-keyed
    shuffles (sessionization, stream-stream joins, per-user windows)
    need salting before they hit a 100 TB event log.  A heavy tail
    (top bucket carrying a large event share) is exactly the hot-key
    profile join_skew_diagnostics flags on the TPC-H side, measured
    here on the behavioral axis.

    Scale shape: ONE events scan into one partial-agg'd groupBy(user)
    for counts, then the bucket rollup is |buckets| rows (≈ log2 of
    the max user) and BOTH divisors come from windows over that tiny
    relation — the grand total is an unpartitioned-window SUM fused
    into the same single-partition Window stage as the cumulative
    share (round-13 plan fix: the original form derived the total via
    ev.agg(...) + crossJoin, which re-computed the whole ev subtree —
    a second events scan and a second user_id exchange that the
    BENCH_r12 flag on this query paid for twice per run).  The bucket
    id is the count's BIT LENGTH (length of the base-2 string — exact
    integer arithmetic in both engines, no float log2 whose half-ulp
    could flip a boundary); shares divide exact BIGINTs."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count("*").alias("n"))
    ev = per_user.select(
        F.length(F.conv(F.col("n").cast("string"), 10, 2)).alias("bucket"),
        "n",
    ).groupBy("bucket").agg(
        F.count("*").alias("n_users"), F.sum("n").alias("n_events")
    )
    w = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy()  # grand total over the ~log2(max) rows
    return ev.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(
            F.col("n_events") / F.sum("n_events").over(wt), 6
        ).alias("event_share"),
        F.round(
            F.sum("n_events").over(w) / F.sum("n_events").over(wt), 6
        ).alias("cum_share_from_top"),
    )


USER_POWER_LAW_SQL = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
),
ev AS (
  SELECT length(printf('%b', n)) AS bucket,
         COUNT(*) AS n_users, SUM(n) AS n_events
  FROM per_user GROUP BY length(printf('%b', n))
),
tot AS (SELECT SUM(n_events) AS tot FROM ev)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_events AS BIGINT) AS n_events,
       ROUND(CAST(n_events AS DOUBLE) / tot, 6) AS event_share,
       ROUND(CAST(SUM(n_events) OVER (ORDER BY bucket DESC
                                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / tot, 6) AS cum_share_from_top
FROM ev, tot
"""



# --- conversion latency quantiles (round 9, batch 7) ------------------------

def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View-to-purchase latency distribution: for every user whose
    first purchase follows their first view, the exact interpolated
    p50/p90/p99 of the latency (seconds) plus the converting-user count
    — funnel_conversion tells you HOW MANY convert; this tells you HOW
    LONG they take, the number an attribution window (e.g. the 10-min
    click join) is tuned against.

    Exactness: latencies are integer microsecond diffs divided by 1e6
    (exact doubles), and the percentiles use the engines' shared
    linear-interpolation definition on identical inputs, rounded to
    6 dp — the percentile_prices convention.  One groupBy(user) with
    conditional MINs, then a single global aggregate."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("t_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("t_purchase"),
    )
    lat = per_user.where(
        F.col("t_view").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") > F.col("t_view"))
    ).select(
        ((F.col("t_purchase") - F.col("t_view")) / F.lit(1_000_000.0))
        .alias("latency_s")
    )
    return lat.agg(
        F.count("*").cast("bigint").alias("n_converting"),
        F.round(F.expr("percentile(latency_s, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(latency_s, 0.9)"), 6).alias("p90_s"),
        F.round(F.expr("percentile(latency_s, 0.99)"), 6).alias("p99_s"),
    )


CONVERSION_LATENCY_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS t_purchase
  FROM events GROUP BY user_id
),
lat AS (
  SELECT (t_purchase - t_view) / 1000000.0 AS latency_s
  FROM per_user
  WHERE t_view IS NOT NULL AND t_purchase IS NOT NULL
        AND t_purchase > t_view
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converting,
       ROUND(CAST(quantile_cont(latency_s, 0.5) AS DOUBLE), 6) AS p50_s,
       ROUND(CAST(quantile_cont(latency_s, 0.9) AS DOUBLE), 6) AS p90_s,
       ROUND(CAST(quantile_cont(latency_s, 0.99) AS DOUBLE), 6) AS p99_s
FROM lat
"""



# --- attribution model comparison (round 9, r10 carryover) ------------------

ATTR_WINDOW_MIN = 10  # minutes, matching streaming_click_attribution


def attribution_model_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch attribution, side by side: for every
    purchase with at least one click in the preceding {ATTR_WINDOW_MIN}
    minutes by the same user, credit the FIRST click (first-touch) and
    the LAST click (last-touch) in the window, then roll up how often
    the two models agree and how much credit volume each assigns — the
    table a marketing-analytics owner reads before standardizing on a
    model, and the batch twin of the streaming click-attribution join.

    Scale shape: ONE interval join (the streaming_click_attribution
    predicate exactly) shuffled on user_id, then one purchase-keyed
    aggregate taking MIN/MAX click over the window (no per-model
    re-join), then a two-row rollup.  Ties on click ts break by
    event_id, so both models are total orders."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_MIN} MINUTES")
        ),
    )
    per_purchase = joined.groupBy(
        "purchase_id", "purchase_value"
    ).agg(
        F.min(F.struct("click_ts", "click_id")).alias("first_touch"),
        F.max(F.struct("click_ts", "click_id")).alias("last_touch"),
    )
    return per_purchase.agg(
        F.count("*").cast("bigint").alias("n_attributed"),
        F.sum(
            F.when(
                F.col("first_touch.click_id") == F.col("last_touch.click_id"), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_models_agree"),
        F.round(
            F.sum(
                F.when(
                    F.col("first_touch.click_id") == F.col("last_touch.click_id"),
                    1.0,
                ).otherwise(0.0)
            ) / F.count("*"),
            6,
        ).alias("agreement_rate"),
        F.expr(
            "CAST(SUM(CAST(purchase_value AS DECIMAL(18,6))) AS DOUBLE)"
        ).alias("attributed_value"),
    )


ATTRIBUTION_COMPARE_SQL = f"""
WITH joined AS (
  SELECT p.event_id AS purchase_id, p.value AS purchase_value,
         c.ts AS click_ts, c.event_id AS click_id
  FROM events p
  JOIN events c
    ON p.event_type = 'purchase' AND c.event_type = 'click'
   AND c.user_id = p.user_id
   AND c.ts <= p.ts
   AND c.ts >= p.ts - INTERVAL {ATTR_WINDOW_MIN} MINUTE
),
per_purchase AS (
  SELECT purchase_id, purchase_value,
         MIN(ROW(click_ts, click_id)) AS first_touch,
         MAX(ROW(click_ts, click_id)) AS last_touch
  FROM joined GROUP BY purchase_id, purchase_value
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_attributed,
       CAST(SUM(CASE WHEN first_touch = last_touch THEN 1 ELSE 0 END)
            AS BIGINT) AS n_models_agree,
       ROUND(SUM(CASE WHEN first_touch = last_touch THEN 1.0 ELSE 0.0 END)
             / COUNT(*), 6) AS agreement_rate,
       CAST(SUM(CAST(purchase_value AS DECIMAL(18,6))) AS DOUBLE)
         AS attributed_value
FROM per_purchase
"""



# --- RFM segmentation (round 9, r10 carryover) -------------------------------

RFM_TILES = 4


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-Frequency-Monetary customer segmentation over orders:
    each customer is quartiled independently on days-since-last-order
    (recency — lower is better), order count (frequency), and
    decimal-exact total spend (monetary); the rollup counts customers
    and spend per (r, f, m) cell — the classic CRM segmentation, and a
    stress of three simultaneous ntile windows over one scan.

    Exactness: recency is integer epoch-day arithmetic against the
    corpus max date (a deterministic anchor — no wall clock, per the
    no-Date.now discipline); spend sums as DECIMAL(18,2) before the
    double cast; every ntile orders by (metric, custkey) so tiles are
    total orders.  Scale: one groupBy(custkey) then three window
    passes over the |customers| aggregate (each a single exchange of
    ids + three numbers), then a <= {RFM_TILES}^3-row rollup."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    anchor_day = o.agg(
        F.max(F.expr("unix_date(CAST(o_orderdate AS DATE))"))
    ).first()[0]
    per_cust = o.groupBy("o_custkey").agg(
        (
            F.lit(int(anchor_day))
            - F.max(F.expr("unix_date(CAST(o_orderdate AS DATE))"))
        ).alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    wr = Window.orderBy("recency_days", "o_custkey")
    wf = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    wm = Window.orderBy(F.desc("monetary"), F.asc("o_custkey"))
    tiled = per_cust.select(
        "monetary",
        F.ntile(RFM_TILES).over(wr).alias("r_tile"),
        F.ntile(RFM_TILES).over(wf).alias("f_tile"),
        F.ntile(RFM_TILES).over(wm).alias("m_tile"),
    )
    return tiled.groupBy("r_tile", "f_tile", "m_tile").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.round(F.sum("monetary").cast("double"), 2).alias("segment_spend"),
    )


RFM_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         (SELECT MAX(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
          FROM orders)
         - MAX(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
           AS recency_days,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT monetary,
         NTILE({RFM_TILES}) OVER (ORDER BY recency_days, o_custkey) AS r_tile,
         NTILE({RFM_TILES}) OVER (ORDER BY frequency DESC, o_custkey) AS f_tile,
         NTILE({RFM_TILES}) OVER (ORDER BY monetary DESC, o_custkey) AS m_tile
  FROM per_cust
)
SELECT r_tile, f_tile, m_tile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(monetary) AS DOUBLE), 2) AS segment_spend
FROM tiled GROUP BY r_tile, f_tile, m_tile
"""



# --- exponentially decayed event counts (round 10) --------------------------

DECAY_HALF_LIFE_DAYS = 7
#: ln 2 / half-life-in-seconds, one Python-formatted double literal
#: shared by both engines (the cross-engine shared-constant convention).
_DECAY_LAMBDA = 0.6931471805599453 / (DECAY_HALF_LIFE_DAYS * 86400.0)


def decayed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exponentially time-decayed activity: each event
    weighs exp(-λ·age) with a {DECAY_HALF_LIFE_DAYS}-day half-life
    against the corpus max timestamp (a deterministic anchor — no wall
    clock), giving the freshness-weighted counters every trending /
    ranking / feature-store pipeline keeps.  decay_ratio (decayed over
    raw count) reads as "how recent is this event type's mass":
    1.0 = all just now, ->0 = all ancient.

    Mergeability is the point at scale: the decayed sum is a plain SUM
    of per-event terms, so it partial-aggregates map-side and can be
    maintained incrementally by adding new events' weights and
    multiplying the old total by exp(-λ·Δt) at anchor advance — the
    streaming twin of the CMS/HLL mergeable-sketch family.

    Exactness: age is integer-microsecond arithmetic / 1e6 (exact
    doubles), weights round to 9 dp then sum as DECIMAL (order-free),
    λ is one shared Python-formatted literal in both plans."""
    e = load_table(spark, sf_dir, "events")
    anchor = e.agg(F.max(F.unix_micros("ts")).alias("anchor_us"))
    aged = e.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        "value",
        (
            (F.col("anchor_us") - F.unix_micros("ts")) / F.lit(1_000_000.0)
        ).alias("age_s"),
    )
    return aged.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(
            F.expr(
                f"CAST(SUM(CAST(ROUND(EXP(-({_DECAY_LAMBDA!r}) * age_s), 9)"
                " AS DECIMAL(19,9))) AS DOUBLE)"
            ),
            6,
        ).alias("decayed_count"),
        F.round(
            F.expr(
                f"CAST(SUM(CAST(ROUND(EXP(-({_DECAY_LAMBDA!r}) * age_s) * value, 9)"
                " AS DECIMAL(28,9))) AS DOUBLE)"
            ),
            6,
        ).alias("decayed_value"),
        F.round(
            F.expr(
                f"CAST(SUM(CAST(ROUND(EXP(-({_DECAY_LAMBDA!r}) * age_s), 9)"
                " AS DECIMAL(19,9))) AS DOUBLE)"
            )
            / F.count("*"),
            6,
        ).alias("decay_ratio"),
    )


DECAYED_COUNTS_SQL = f"""
WITH anchor AS (
  SELECT MAX(epoch_us(ts)) AS anchor_us FROM events
),
aged AS (
  SELECT event_type, value,
         (anchor_us - epoch_us(ts)) / 1000000.0 AS age_s
  FROM events, anchor
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(ROUND(EXP(-({_DECAY_LAMBDA!r}) * age_s), 9)
                          AS DECIMAL(19,9))) AS DOUBLE), 6) AS decayed_count,
       ROUND(CAST(SUM(CAST(ROUND(EXP(-({_DECAY_LAMBDA!r}) * age_s) * value, 9)
                          AS DECIMAL(28,9))) AS DOUBLE), 6) AS decayed_value,
       ROUND(CAST(SUM(CAST(ROUND(EXP(-({_DECAY_LAMBDA!r}) * age_s), 9)
                          AS DECIMAL(19,9))) AS DOUBLE) / COUNT(*), 6)
         AS decay_ratio
FROM aged
GROUP BY event_type
"""


# --- traffic seasonality profile (round 10) ---------------------------------


def traffic_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (ISO weekday × hour-of-day) traffic heatmap: event count,
    share of total traffic, and decimal-exact mean value per cell —
    the capacity-planning / anomaly-baseline profile every event
    pipeline keeps (hourly_anomalies z-scores the TIMELINE; this is
    the periodic-structure marginal it normalizes against).

    Cross-engine calendar parity: Spark's ``weekday()`` is 0=Monday,
    DuckDB's ``isodow`` is 1=Monday — the +1 shift is applied on the
    Spark side so both emit ISO 1..7.  One scan, one partial-agg'd
    groupBy over at most 168 cells, a 1-row total broadcast."""
    e = load_table(spark, sf_dir, "events")
    cells = e.select(
        (F.expr("weekday(ts)") + 1).alias("iso_dow"),
        F.hour("ts").alias("hod"),
        "value",
    ).groupBy("iso_dow", "hod").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.expr(
            "ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"
            " / COUNT(*), 6)"
        ).alias("avg_value"),
    )
    total = cells.agg(F.sum("n_events").alias("n_total"))
    return cells.crossJoin(F.broadcast(total)).select(
        F.col("iso_dow").cast("int").alias("iso_dow"),
        "hod",
        "n_events",
        F.round(F.col("n_events") / F.col("n_total"), 6).alias("traffic_share"),
        "avg_value",
    )


SEASONALITY_SQL = """
WITH cells AS (
  SELECT CAST(isodow(ts) AS INT) AS iso_dow,
         CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*), 6) AS avg_value
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT SUM(n_events) AS n_total FROM cells
)
SELECT iso_dow, hod, n_events,
       ROUND(CAST(n_events AS DOUBLE) / n_total, 6) AS traffic_share,
       avg_value
FROM cells, tot
"""


# --- item co-occurrence similarity (round 10) --------------------------------

ITEM_CAP = 50
COOC_MIN_USERS = 2


def item_cooccurrence_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering similarities from click
    co-occurrence: items are the typed ``props.k`` of click events,
    "users who clicked both" is the signal, cosine and Jaccard over
    the user sets are the scores — the classic "people who viewed X
    also viewed Y" table, computed without ever materializing the
    user×item matrix.

    Scale shape: the (user, item) relation is DISTINCT then capped at
    each user's first {ITEM_CAP} items (by first-click time, item
    tie-break — deterministic), so the per-user self-join fans out at
    most {ITEM_CAP}²/2 pairs per user regardless of how degenerate a
    power user is — THE standard guard against the quadratic heavy-user
    blowup in co-occurrence mining (the LSH hot-bucket lesson, user
    edition).  Pair counts and per-item user counts partial-aggregate;
    pairs below {COOC_MIN_USERS} co-users are pruned before scoring."""
    e = load_table(spark, sf_dir, "events")
    ui = (
        e.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("item"),
            "ts",
        )
        .where(F.col("item").isNotNull())
        .groupBy("user_id", "item")
        .agg(F.min("ts").alias("first_ts"))
    )
    w = Window.partitionBy("user_id").orderBy("first_ts", "item")
    capped = (
        ui.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= ITEM_CAP)
        .select("user_id", "item")
    )
    n_users = capped.groupBy("item").agg(F.count("*").alias("n_users"))
    a = capped.select("user_id", F.col("item").alias("item_a"))
    b = capped.select("user_id", F.col("item").alias("item_b"))
    co = (
        a.join(b, "user_id")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_co_users"))
        .where(F.col("n_co_users") >= COOC_MIN_USERS)
    )
    na = n_users.select(
        F.col("item").alias("item_a"), F.col("n_users").alias("n_users_a")
    )
    nb = n_users.select(
        F.col("item").alias("item_b"), F.col("n_users").alias("n_users_b")
    )
    return (
        co.join(na, "item_a")
        .join(nb, "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("n_co_users").cast("bigint").alias("n_co_users"),
            F.col("n_users_a").cast("bigint").alias("n_users_a"),
            F.col("n_users_b").cast("bigint").alias("n_users_b"),
            F.round(
                F.col("n_co_users")
                / F.sqrt(F.col("n_users_a") * F.col("n_users_b")),
                6,
            ).alias("cosine"),
            F.round(
                F.col("n_co_users")
                / (F.col("n_users_a") + F.col("n_users_b") - F.col("n_co_users")),
                6,
            ).alias("jaccard"),
        )
    )


ITEM_COOC_SQL = f"""
WITH ui AS (
  SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         MIN(ts) AS first_ts
  FROM events
  WHERE event_type = 'click'
        AND json_extract_string(props, '$.k') IS NOT NULL
  GROUP BY user_id, item
),
capped AS (
  SELECT user_id, item FROM (
    SELECT user_id, item,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY first_ts, item) AS rn
    FROM ui
  ) WHERE rn <= {ITEM_CAP}
),
n_users AS (
  SELECT item, COUNT(*) AS n_users FROM capped GROUP BY item
),
co AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_co_users
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= {COOC_MIN_USERS}
)
SELECT item_a, item_b,
       CAST(n_co_users AS BIGINT) AS n_co_users,
       CAST(na.n_users AS BIGINT) AS n_users_a,
       CAST(nb.n_users AS BIGINT) AS n_users_b,
       ROUND(n_co_users / SQRT(CAST(na.n_users AS DOUBLE) * nb.n_users), 6)
         AS cosine,
       ROUND(CAST(n_co_users AS DOUBLE)
             / (na.n_users + nb.n_users - n_co_users), 6) AS jaccard
FROM co
JOIN n_users na ON na.item = co.item_a
JOIN n_users nb ON nb.item = co.item_b
"""


# --- Customer trend + cohort LTV (round 11) ---------------------------------

#: Quarter index origin: TPC-H order dates span 1992-1998, so quarters
#: are indexed from 1992Q1 = 0 — small exact integers in both engines.
TREND_YEAR0 = 1992
#: A slope needs >= this many distinct quarters (the zipf_slope n>=3
#: convention: 2 points fit trivially and say nothing).
TREND_MIN_QUARTERS = 3


def customer_order_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-frequency trend: OLS slope of quarterly order
    counts over the quarter index — the churn/growth screen (negative
    slope = cooling customer, positive = ramping) that a lifecycle
    pipeline segments on before rfm_segments snapshots recency.

    Exactness: x (quarter index from {TREND_YEAR0}Q1) and y (order
    count) are small exact integers, so every OLS moment sum (Σx, Σy,
    Σx², Σxy) is exact BIGINT arithmetic — order-free with no decimal
    machinery; the single division happens once at the end, NULLIF-
    guarded (the heaps_law_fit degeneracy convention), rounded 6 dp.

    Scale shape: one partial-agg'd exchange to (custkey, quarter) —
    bounded at 28 quarters per customer — then one reduce to custkey.
    No joins, no windows; both shuffles keyed on custkey-first keys so
    AQE coalesces them back-to-back."""
    o = load_table(spark, sf_dir, "orders")
    per_q = o.select(
        "o_custkey",
        (
            (F.year(F.col("o_orderdate").cast("date")) - TREND_YEAR0) * 4
            + F.quarter(F.col("o_orderdate").cast("date"))
            - 1
        ).alias("x"),
    ).groupBy("o_custkey", "x").agg(F.count("*").alias("y"))
    fit = per_q.groupBy("o_custkey").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return (
        fit.where(F.col("n") >= TREND_MIN_QUARTERS)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("n").cast("int").alias("n_quarters"),
            F.col("sy").cast("bigint").alias("total_orders"),
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                    "double"
                )
                / F.expr("CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)"),
                6,
            ).alias("slope_orders_per_quarter"),
        )
    )


CUSTOMER_TREND_SQL = f"""
WITH per_q AS (
  SELECT o_custkey,
         (year(CAST(o_orderdate AS DATE)) - {TREND_YEAR0}) * 4
           + quarter(CAST(o_orderdate AS DATE)) - 1 AS x,
         COUNT(*) AS y
  FROM orders
  GROUP BY 1, 2
),
fit AS (
  SELECT o_custkey,
         COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM per_q
  GROUP BY o_custkey
)
SELECT o_custkey AS custkey,
       CAST(n AS INT) AS n_quarters,
       CAST(sy AS BIGINT) AS total_orders,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE), 6)
         AS slope_orders_per_quarter
FROM fit
WHERE n >= {TREND_MIN_QUARTERS}
"""


def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers are cohorted by the month
    of their FIRST order; each (cohort_month, month_offset) cell gets
    the cohort's order count, revenue, cumulative revenue, and
    cumulative revenue PER COHORT CUSTOMER — the LTV curve a growth
    team reads next to retention_cohorts (that one counts active
    users; this one accumulates the money).

    Exactness: months are integer indexes (year*12 + month), revenue
    sums go through the per-row DECIMAL(18,6) cast (the q1 convention)
    so the cumulative window stays exact; the single LTV division is
    one IEEE divide rounded 6 dp.

    Scale shape: one groupBy(custkey) for first-month, one
    hash-partitioned re-join on custkey (both sides keyed, no
    broadcast needed), one partial-agg'd exchange to the
    (cohort, offset) cell grid — O(months²) cells regardless of order
    volume — and a cumulative window over per-cohort cells (<= 84
    offsets per cohort)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        (
            F.year(F.col("o_orderdate").cast("date")) * 12
            + F.month(F.col("o_orderdate").cast("date"))
            - 1
        ).alias("m"),
    )
    first = o.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    cohort_sizes = first.groupBy("cohort_m").agg(
        F.count("*").alias("cohort_size")
    )
    cells = (
        o.join(first, "o_custkey")
        .groupBy(
            "cohort_m",
            (F.col("m") - F.col("cohort_m")).cast("int").alias("month_offset"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.expr(f"SUM({_dec('o_totalprice')})").alias("rev"),
        )
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.join(cohort_sizes, "cohort_m")
        .select(
            (F.col("cohort_m") / 12).cast("int").alias("cohort_year"),
            (F.col("cohort_m") % 12 + 1).cast("int").alias("cohort_month"),
            "month_offset",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            F.col("rev").cast("double").alias("revenue"),
            F.sum("rev").over(w).alias("_cum"),
        )
        .select(
            "cohort_year",
            "cohort_month",
            "month_offset",
            "n_orders",
            "cohort_size",
            F.round("revenue", 2).alias("revenue"),
            F.round(F.col("_cum").cast("double"), 2).alias("cum_revenue"),
            F.round(
                F.col("_cum").cast("double") / F.col("cohort_size"), 6
            ).alias("ltv_per_customer"),
        )
    )


COHORT_LTV_SQL = """
WITH o AS (
  SELECT o_custkey, o_totalprice,
         year(CAST(o_orderdate AS DATE)) * 12
           + month(CAST(o_orderdate AS DATE)) - 1 AS m
  FROM orders
),
first AS (
  SELECT o_custkey, MIN(m) AS cohort_m FROM o GROUP BY o_custkey
),
sizes AS (
  SELECT cohort_m, COUNT(*) AS cohort_size FROM first GROUP BY cohort_m
),
cells AS (
  SELECT f.cohort_m,
         CAST(o.m - f.cohort_m AS INT) AS month_offset,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
  FROM o JOIN first f USING (o_custkey)
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort_m, month_offset, n_orders, rev,
         SUM(rev) OVER (PARTITION BY cohort_m ORDER BY month_offset
                        ROWS UNBOUNDED PRECEDING) AS cum_rev
  FROM cells
)
SELECT CAST(cohort_m // 12 AS INT) AS cohort_year,
       CAST(cohort_m % 12 + 1 AS INT) AS cohort_month,
       month_offset,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(cohort_size AS BIGINT) AS cohort_size,
       ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
       ROUND(CAST(cum_rev AS DOUBLE), 2) AS cum_revenue,
       ROUND(CAST(cum_rev AS DOUBLE) / cohort_size, 6) AS ltv_per_customer
FROM cum JOIN sizes USING (cohort_m)
"""


#: Bot screen thresholds — shared literals in both engines.
BOT_MIN_EVENTS = 20       # users below this volume are not scored
BOT_BURST_MS = 1000       # a gap <= this is a "burst" interval
BOT_MEDIAN_GAP_MS = 2000  # median gap <= this flags machine cadence
BOT_BURST_RATIO = 0.5     # ... or half the gaps being bursts does


def bot_activity_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-traffic screen over per-user event cadence: for every user
    with >= {BOT_MIN_EVENTS} events, the median inter-event gap and the
    burst ratio (share of gaps <= {BOT_BURST_MS} ms); users with
    machine cadence (median gap <= {BOT_MEDIAN_GAP_MS} ms) or
    burst-dominated traffic are flagged — the ingest screen that keeps
    scripted traffic out of behavioral training data, complementing
    user_activity_power_law (volume skew) with TIMING.

    Scale shape: ONE shuffle on user_id for the lag window (gaps), then
    a keyed aggregate; output bounded by the flagge-able user count.
    The exact per-user percentile becomes the approx_percentile sketch
    at 100 TB (the standing perplexity_tail_split contract).
    Exactness: gaps are exact BIGINT milliseconds (unix_millis /
    epoch_ms); the median interpolates between integers identically in
    both engines; burst_ratio is one IEEE divide rounded 6 dp."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("unix_millis(ts)").alias("ms")
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    gaps = e.select(
        "user_id", (F.col("ms") - F.lag("ms").over(w)).alias("gap_ms")
    ).where(F.col("gap_ms").isNotNull())
    per = gaps.groupBy("user_id").agg(
        (F.count("*") + 1).cast("bigint").alias("n_events"),
        F.round(
            F.expr("percentile(gap_ms, CAST(0.5 AS DOUBLE))"), 3
        ).alias("median_gap_ms"),
        F.round(
            F.avg((F.col("gap_ms") <= BOT_BURST_MS).cast("double")), 6
        ).alias("burst_ratio"),
    )
    return per.where(F.col("n_events") >= BOT_MIN_EVENTS).select(
        "user_id",
        "n_events",
        "median_gap_ms",
        "burst_ratio",
        (
            (F.col("median_gap_ms") <= BOT_MEDIAN_GAP_MS)
            | (F.col("burst_ratio") >= BOT_BURST_RATIO)
        ).alias("is_bot"),
    )


BOT_HEURISTIC_SQL = f"""
WITH gaps AS (
  SELECT user_id,
         ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id)
           AS gap_ms
  FROM (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events)
),
per AS (
  SELECT user_id,
         CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
         ROUND(quantile_cont(gap_ms, CAST(0.5 AS DOUBLE)), 3)
           AS median_gap_ms,
         ROUND(AVG(CASE WHEN gap_ms <= {BOT_BURST_MS}
                        THEN 1.0 ELSE 0.0 END), 6) AS burst_ratio
  FROM gaps WHERE gap_ms IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n_events, median_gap_ms, burst_ratio,
       (median_gap_ms <= {BOT_MEDIAN_GAP_MS}
        OR burst_ratio >= {BOT_BURST_RATIO}) AS is_bot
FROM per
WHERE n_events >= {BOT_MIN_EVENTS}
"""


QUERIES = {
    "hourly_anomalies": hourly_anomalies,
    "event_transition_matrix": event_transition_matrix,
    "session_funnel_paths": session_funnel_paths,
    "user_activity_power_law": user_activity_power_law,
    "conversion_latency_quantiles": conversion_latency_quantiles,
    "attribution_model_compare": attribution_model_compare,
    "rfm_segments": rfm_segments,
    "decayed_event_counts": decayed_event_counts,
    "item_cooccurrence_similarity": item_cooccurrence_similarity,
    "traffic_seasonality_profile": traffic_seasonality_profile,
    "event_ngram_patterns": event_ngram_patterns,
    "retention_cohorts": retention_cohorts,
    "window_range_7day_spend": window_range_7day_spend,
    "ntile_customer_quartiles": ntile_customer_quartiles,
    "funnel_conversion": funnel_conversion,
    "customer_order_trend": customer_order_trend,
    "cohort_ltv_curves": cohort_ltv_curves,
    "bot_activity_heuristic": bot_activity_heuristic,
}

ORACLES = {
    "hourly_anomalies": HOURLY_ANOMALY_SQL,
    "event_transition_matrix": EVENT_TRANSITION_SQL,
    "session_funnel_paths": SESSION_FUNNEL_SQL,
    "user_activity_power_law": USER_POWER_LAW_SQL,
    "conversion_latency_quantiles": CONVERSION_LATENCY_SQL,
    "attribution_model_compare": ATTRIBUTION_COMPARE_SQL,
    "rfm_segments": RFM_SQL,
    "decayed_event_counts": DECAYED_COUNTS_SQL,
    "item_cooccurrence_similarity": ITEM_COOC_SQL,
    "traffic_seasonality_profile": SEASONALITY_SQL,
    "event_ngram_patterns": EVENT_NGRAM_SQL,
    "retention_cohorts": RETENTION_SQL,
    "window_range_7day_spend": RANGE_7DAY_SQL,
    "ntile_customer_quartiles": NTILE_SQL,
    "funnel_conversion": FUNNEL_SQL,
    "customer_order_trend": CUSTOMER_TREND_SQL,
    "cohort_ltv_curves": COHORT_LTV_SQL,
    "bot_activity_heuristic": BOT_HEURISTIC_SQL,
}
