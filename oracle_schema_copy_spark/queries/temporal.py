"""Temporal join queries over the events fixture: as-of join and bounded
range join — alignment primitives a training-data pipeline needs (join
each observation to the latest prior state; find neighbors in a time
window) that Spark has no native operator for. See operators/temporal.py
for the shuffle-safe formulations; the oracles use DuckDB's native
``ASOF JOIN`` and a plain inequality join respectively — independent
implementations that must agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_schema_copy_spark.operators import temporal
from oracle_schema_copy_spark.queries import query
from oracle_schema_copy_spark.sources.tables import load_table


@query(
    "asof_join_last_click",
    """
    SELECT e.user_id, e.ts, e.event_id,
           c.event_id AS q_event_id, c.ts AS q_ts, c.value AS q_value
    FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error') e
    ASOF JOIN (SELECT user_id, ts, event_id, value FROM events
               WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    headline=True,
)
def q_asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, the user's most recent click at-or-before it
    (union + tagged window sort — one shuffle on (user, ts); the oracle is
    DuckDB's native ASOF JOIN)."""
    ev = load_table(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    quotes = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    return temporal.asof_join(
        probes, quotes, key="user_id", ts="ts", quote_cols=["event_id", "ts", "value"]
    )


@query(
    "asof_join_planted_ties",
    """
    WITH p AS (
        SELECT user_id, date_trunc('hour', ts) AS ts, event_id
        FROM events WHERE event_type = 'error'),
    q AS (
        SELECT user_id, date_trunc('hour', ts) AS ts, event_id, value
        FROM events WHERE event_type = 'click'),
    j AS (
        SELECT p.user_id, p.ts, p.event_id,
               q.event_id AS q_event_id, q.ts AS q_ts, q.value AS q_value,
               row_number() OVER (
                   PARTITION BY p.user_id, p.ts, p.event_id
                   ORDER BY q.ts DESC, q.event_id DESC) AS rn
        FROM p JOIN q ON p.user_id = q.user_id AND q.ts <= p.ts)
    SELECT user_id, ts, event_id, q_event_id, q_ts, q_value
    FROM j WHERE rn = 1
    """,
)
def q_asof_join_planted_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join on DELIBERATELY tie-bearing data: truncating both sides'
    timestamps to the hour collides many quotes onto the same (user, ts),
    so this query exercises the operator's documented tie rule (carry the
    MAX quote tuple in quote_cols order — here the max event_id among the
    latest-hour clicks) instead of relying on tie-free fixtures
    (r4 VERDICT "what's wrong" #2). The oracle mirrors the rule exactly
    with a row_number window (native ASOF JOIN picks ties arbitrarily, so
    it cannot oracle this input). Same single shuffle+sort plan as
    asof_join_last_click."""
    ev = load_table(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("ts"), "event_id"
    )
    quotes = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("ts"), "event_id", "value"
    )
    return temporal.asof_join(
        probes, quotes, key="user_id", ts="ts", quote_cols=["event_id", "ts", "value"]
    )


@query(
    "range_join_error_views",
    """
    SELECT e.event_id, CAST(count(*) AS BIGINT) AS n_nearby_views
    FROM events e JOIN events v
      ON e.user_id = v.user_id
     AND e.event_type = 'error' AND v.event_type = 'view'
     AND abs(epoch(e.ts) - epoch(v.ts)) <= 3600
    GROUP BY e.event_id
    """,
)
def q_range_join_error_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event, how many views by the same user fall within ±1h —
    a bounded range join expressed as an equi-join on (user, time-bin)
    with neighbor-bin replication, never a nested loop. The oracle is the
    direct inequality join."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    joined = temporal.range_join_binned(
        errors,
        views,
        key="user_id",
        window_seconds=3600,
        right_cols=[],
    )
    return joined.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_nearby_views"))


@query(
    "sessionize_events",
    """
    WITH o AS (
        SELECT event_id, user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                             PARTITION BY user_id ORDER BY ts)) >= 14400000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events)
    SELECT event_id, user_id, ts,
           CAST(sum(new_s) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
    FROM o
    """,
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session ordinals (4-hour gap) — the row-level counterpart
    of the session-window aggregate; lag + running sum, one shuffle+sort
    per user."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return temporal.sessionize(ev, key="user_id", ts="ts", gap_seconds=14_400)


@query(
    "trailing_window_features",
    """
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS trailing_n,
           round(avg(value) OVER w, 6) AS trailing_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_trailing_window_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free trailing 1-hour count/mean of value per user, per
    event — a RANGE frame over the microsecond epoch (no self-join, no
    replication)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    return temporal.trailing_features(
        ev, key="user_id", ts="ts", value="value", trailing_seconds=3600
    ).drop("value")


@query(
    "funnel_view_click_error",
    """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
        WHERE e.event_type = 'error' GROUP BY e.user_id)
    SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
           CAST(1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
                AS BIGINT) AS reached
    FROM s1
    LEFT JOIN s2 ON s2.user_id = s1.user_id
    LEFT JOIN s3 ON s3.user_id = s1.user_id
    """,
)
def q_funnel_view_click_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → error per user: earliest qualifying
    event per step, strictly after the previous step — N-1 co-partitioned
    key joins, min-aggregations only (order-free, hence exactly
    oracle-able). The conversion-path analytic over the events stream."""
    ev = load_table(spark, sf_dir, "events")
    return temporal.funnel(
        ev, key="user_id", ts="ts", step_col="event_type",
        steps=["view", "click", "error"],
    )


@query(
    "asof_forward_next_error",
    """
    SELECT e.user_id, e.ts, e.event_id, n.event_id AS q_event_id, n.ts AS q_ts
    FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') e
    ASOF JOIN (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'error') n
      ON e.user_id = n.user_id AND e.ts <= n.ts
    WHERE n.ts - e.ts <= INTERVAL 2 HOUR
    """,
)
def q_asof_forward_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's NEXT error within 2 hours — the forward
    as-of direction with a tolerance bound (same single shuffle+sort; the
    oracle is DuckDB's forward ASOF JOIN plus the tolerance predicate)."""
    ev = load_table(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    quotes = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    return temporal.asof_join(
        probes, quotes, key="user_id", ts="ts", quote_cols=["event_id", "ts"],
        direction="forward", tolerance_seconds=7200,
    )


@query(
    "events_rollup_cascade",
    """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 9) AS hv
        FROM events GROUP BY 1)
    SELECT CAST(date_trunc('day', h) AS DATE) AS day,
           CAST(sum(n) AS BIGINT) AS n_events,
           round(sum(hv), 6) AS sum_value
    FROM hourly GROUP BY 1
    """,
)
def q_events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade (the hypertable rollup pattern): the
    daily grain is computed FROM the hourly partials, not from raw rows —
    at scale the hourly frame is a materialized incremental aggregate and
    every coarser grain reuses it, so each event is read once ever. The
    intermediate is rounded at 9 dp and the final at 6 dp on BOTH sides,
    absorbing double-summation order differences at each stage."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 9).alias("hv")
    )
    return hourly.groupBy(
        F.date_trunc("day", F.col("h")).cast("date").alias("day")
    ).agg(
        F.sum("n").alias("n_events"),
        F.round(F.sum("hv"), 6).alias("sum_value"),
    )


@query(
    "gapfill_locf_hourly",
    """
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS hv
        FROM events WHERE user_id < 12 GROUP BY 1, 2),
    bounds AS (
        SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
    grid AS (
        SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds)
    SELECT g.user_id, g.h,
           CAST(coalesce(hy.n, 0) AS BIGINT) AS n,
           last_value(hy.hv IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM grid g LEFT JOIN hourly hy ON hy.user_id = g.user_id AND hy.h = g.h
    """,
)
def q_gapfill_locf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling + last-observation-carried-forward (the
    hypertable `time_bucket_gapfill` + `locf` pattern): a dense hourly
    grid per user (sequence over that user's own [min, max] span — no
    global calendar join) left-joined to the sparse hourly aggregate,
    then one ordered window carries the last seen value across the gaps.
    Hours before a user's first value stay NULL on both engines. Grid
    size is users x span-hours — bounded, independent of event count."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 12)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("hv"))
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(h0, h1, INTERVAL 1 HOUR)")).alias("h"),
        )
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "h",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.last("hv", ignorenulls=True).over(w).alias("v_filled"),
    )


@query(
    "regr_value_by_hour",
    """
    SELECT event_type,
           round(regr_slope(value, CAST(hour(ts) AS DOUBLE)), 6) AS slope,
           round(regr_intercept(value, CAST(hour(ts) AS DOUBLE)), 6) AS intercept,
           round(regr_r2(value, CAST(hour(ts) AS DOUBLE)), 6) AS r2,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q_regr_value_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend via the SQL regr_* aggregate family (slope,
    intercept, R^2 of event value against hour-of-day) — one partial-
    aggregated pass; both engines accumulate the same moment sums, agreeing
    at 6-dp rounding (same tolerance class as agg_stats_moments)."""
    ev = load_table(spark, sf_dir, "events")
    x = F.hour("ts").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.regr_slope(F.col("value"), x), 6).alias("slope"),
        F.round(F.regr_intercept(F.col("value"), x), 6).alias("intercept"),
        F.round(F.regr_r2(F.col("value"), x), 6).alias("r2"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "cohort_retention_daily",
    """
    WITH first AS (
        SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS cohort
        FROM events GROUP BY 1),
    act AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events)
    SELECT f.cohort,
           CAST(datediff('day', f.cohort, a.day) AS BIGINT) AS offset_days,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM act a JOIN first f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_cohort_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, counted
    on each later active day — the standard engagement decay analysis.
    Two aggregations over one scan lineage (first-seen min, distinct
    activity days) joined on the user key; the cohort frame is small and
    broadcast. At 100 TB the distinct-day frame is the incremental daily
    rollup, not a raw re-scan."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    first = ev.groupBy("user_id").agg(F.min(day).alias("cohort"))
    act = ev.select("user_id", day.alias("day")).distinct()
    return (
        act.join(F.broadcast(first), "user_id")
        .groupBy(
            "cohort",
            F.datediff(F.col("day"), F.col("cohort")).cast("long").alias("offset_days"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "wau_rolling_7d",
    """
    WITH act AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        FROM events),
    days AS (SELECT DISTINCT day FROM act)
    SELECT d.day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
    FROM days d JOIN act a ON a.day BETWEEN d.day - 6 AND d.day
    GROUP BY 1
    """,
)
def q_wau_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the windowed-distinct metric
    window functions cannot express (COUNT(DISTINCT) is not a window
    aggregate). Shape: the distinct (day, user) rollup — tiny relative to
    raw events — joins a broadcast day grid on a bounded date-range
    predicate, then one distinct-count per day. At 100 TB the rollup is
    the maintained daily aggregate; the range join touches days x 7
    copies of it, never raw events."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    act = ev.select(day.alias("day"), "user_id").distinct()
    days = act.select(F.col("day").alias("d")).distinct()
    return (
        act.join(
            F.broadcast(days),
            (F.col("day") >= F.date_sub(F.col("d"), 6)) & (F.col("day") <= F.col("d")),
        )
        .groupBy(F.col("d").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )


@query(
    "session_event_paths",
    """
    WITH s AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events GROUP BY 1, 2)
    SELECT path, CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY path
    ORDER BY n DESC, path LIMIT 25
    """,
)
def q_session_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top day-session event paths ('view>click>...'): ordered
    per-session event-type concatenation (sorted struct collect — exact,
    tie-broken on event_id) then a path histogram — the behavioral
    sequence-mining primitive behind funnel discovery. Shuffle carries
    one path string per session, never events."""
    ev = load_table(spark, sf_dir, "events")
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ),
        ">",
    )
    s = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(path.alias("path"))
    return (
        s.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(25)
    )


@query(
    "events_value_cusum",
    """
    WITH v AS (SELECT user_id, ts, event_id,
                      CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm
               FROM events),
    m AS (SELECT CAST(sum(vm) // count(*) AS BIGINT) AS mu_micro FROM v),
    dev AS (
        SELECT user_id, ts, event_id, vm - m.mu_micro AS d
        FROM v, m WHERE user_id < 8)
    SELECT user_id, event_id,
           CAST(sum(d) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cusum_micro
    FROM dev
    """,
)
def q_events_value_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point signal per user: the running sum of deviations
    from the global mean — a sustained drift shows as a ramp. One
    broadcast scalar (the integer micro-unit mean), one ordered window
    per user with a deterministic tie-break; exact BIGINT micro-units
    throughout (see inline note — the double mean's last-ulp engine
    difference accumulated through the running sum at sf1)."""
    # exact BIGINT micro-units end to end (r9): the global mean as a
    # double differed between engines in the last ulps (parallel vs
    # sequential partial sums) and the per-row drift accumulated through
    # the running sum until a round(_, 6) boundary flipped at sf1. One
    # per-row floor quantization is engine-identical; integer mean and
    # integer running sum are order-independent and exact at any scale.
    ev = load_table(spark, sf_dir, "events").withColumn(
        "vm", F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long")
    )
    mu = ev.agg(F.expr("CAST(sum(vm) DIV count(*) AS BIGINT)").alias("mu_micro"))
    dev = (
        ev.filter(F.col("user_id") < 8)
        .join(F.broadcast(mu))
        .select(
            "user_id", "ts", "event_id", (F.col("vm") - F.col("mu_micro")).alias("d")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dev.select(
        "user_id", "event_id", F.sum("d").over(w).cast("long").alias("cusum_micro")
    )


@query(
    "events_markov_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events)
    SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event sequences
    (lag window with deterministic tie-break, then one map-side-combined
    count per (prev, next) pair) — the behavioral-model fit that pairs
    with the bigram and session-path operators. Shuffle carries |types|^2
    rows after the window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "events_time_weighted_avg",
    """
    WITH seq AS (
        SELECT user_id, value,
               CAST(epoch_us(lead(ts) OVER w) - epoch_us(ts) AS BIGINT) AS dt_us
        FROM events WHERE user_id < 40
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id,
           CAST(count(dt_us) AS BIGINT) AS n_intervals,
           round(sum(value * dt_us) / sum(dt_us), 6) AS time_weighted_avg
    FROM seq WHERE dt_us IS NOT NULL
    GROUP BY user_id
    """,
)
def q_events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user (irregular samples: each value
    weighted by how long it was current, last observation carries no
    weight) — the hypertable `time_weight` aggregate. Interval widths are
    exact integer microseconds from a lead window with deterministic
    tie-break; only the final weighted mean needs rounding."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = ev.select(
        "user_id",
        "value",
        (F.unix_micros(F.lead("ts").over(w)) - us).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return seq.groupBy("user_id").agg(
        F.count("dt_us").alias("n_intervals"),
        F.round(
            F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 6
        ).alias("time_weighted_avg"),
    )


@query(
    "scd2_point_in_time_join",
    """
    WITH dim AS (
        SELECT c_custkey, c_acctbal,
               CAST('1992-01-01' AS DATE) AS valid_from,
               CASE WHEN c_custkey % 11 = 0 THEN CAST('1996-07-01' AS DATE)
                    ELSE CAST('9999-12-31' AS DATE) END AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, c_acctbal + 100,
               CAST('1996-07-01' AS DATE), CAST('9999-12-31' AS DATE)
        FROM customer WHERE c_custkey % 11 = 0),
    j AS (
        SELECT (d.valid_to = CAST('9999-12-31' AS DATE)) AS is_open_version,
               d.c_acctbal, o.o_totalprice
        FROM orders o JOIN dim d
          ON o.o_custkey = d.c_custkey
         AND o.o_orderdate >= d.valid_from
         AND o.o_orderdate <  d.valid_to)
    SELECT is_open_version,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_acctbal_cents,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_totalprice_cents
    FROM j GROUP BY 1
    """,
)
def q_scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join of the orders fact stream against an SCD2
    customer dimension (scd2_merge, effective 1996-07-01, acctbal bump on
    %11 keys): every order sees the acctbal that was true ON ITS ORDER
    DATE — pre-change orders of changed customers aggregate under the
    closed version, the leakage-free temporal-attribute semantics training
    pipelines need. Equi-join on the key + half-open interval residual:
    the dimension broadcasts, the fact side never shuffles (see
    operators/temporal.py point_in_time_join). The oracle builds the same
    two-version dimension arithmetically — %11 keys close at the
    effective date and reopen bumped — and joins with the same half-open
    predicate."""
    from oracle_schema_copy_spark.operators import mutate

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    current = cust.withColumn(
        "valid_from", F.lit("1992-01-01").cast("date")
    ).withColumn("valid_to", F.lit("9999-12-31").cast("date"))
    updates = cust.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 11 == 0, F.col("c_acctbal") + 100).otherwise(
            F.col("c_acctbal")
        ),
    )
    dim = mutate.scd2_merge(
        current, updates, "c_custkey", effective_date="1996-07-01"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    j = temporal.point_in_time_join(
        orders,
        dim,
        fact_key="o_custkey",
        dim_key="c_custkey",
        fact_ts="o_orderdate",
    )
    return j.groupBy(
        (F.col("valid_to") == F.lit("9999-12-31").cast("date")).alias(
            "is_open_version"
        )
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        # exact BIGINT cents (per-row floor of one IEEE multiply, order-
        # independent integer sum): round(double-sum, 2) diverged at sf1,
        # where 1.5M-term summation order shifts the 3.7e11 total by 0.02
        F.sum(F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("sum_acctbal_cents"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("sum_totalprice_cents"),
    )


@query(
    "scd2_point_in_time_attribution",
    """
    WITH dim AS (
        SELECT c_custkey, c_acctbal,
               CAST('1992-01-01' AS DATE) AS valid_from,
               CASE WHEN c_custkey % 11 = 0 THEN CAST('1996-07-01' AS DATE)
                    ELSE CAST('9999-12-31' AS DATE) END AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, c_acctbal + 100,
               CAST('1996-07-01' AS DATE), CAST('9999-12-31' AS DATE)
        FROM customer WHERE c_custkey % 11 = 0)
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           d.c_acctbal AS acctbal_at_order,
           (d.valid_to = CAST('9999-12-31' AS DATE)) AS is_open_version
    FROM orders o JOIN dim d
      ON o.o_custkey = d.c_custkey
     AND o.o_orderdate >= d.valid_from
     AND o.o_orderdate <  d.valid_to
    """,
)
def q_scd2_point_in_time_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture-wide point-in-time attribution (r6 VERDICT ask #7): EVERY
    orders fact row resolved against the SCD2 customer dimension at
    row level — the result has fact cardinality (one row per order), not
    the 2-row aggregate of scd2_point_in_time_join, so the gate verifies
    each individual order's as-of attribute, and the sf1 run carries the
    broadcast-dimension claim (operators/temporal.py point_in_time_join:
    the versioned dimension broadcasts, the fact side never shuffles) at
    ~1.5M output rows. Same dimension arithmetic as the aggregate twin:
    %11 keys close at 1996-07-01 and reopen with acctbal + 100."""
    from oracle_schema_copy_spark.operators import mutate

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    current = cust.withColumn(
        "valid_from", F.lit("1992-01-01").cast("date")
    ).withColumn("valid_to", F.lit("9999-12-31").cast("date"))
    updates = cust.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 11 == 0, F.col("c_acctbal") + 100).otherwise(
            F.col("c_acctbal")
        ),
    )
    dim = mutate.scd2_merge(
        current, updates, "c_custkey", effective_date="1996-07-01"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    j = temporal.point_in_time_join(
        orders,
        dim,
        fact_key="o_custkey",
        dim_key="c_custkey",
        fact_ts="o_orderdate",
    )
    return j.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("c_acctbal").alias("acctbal_at_order"),
        (F.col("valid_to") == F.lit("9999-12-31").cast("date")).alias(
            "is_open_version"
        ),
    )


@query(
    "events_session_funnel",
    """
    WITH o AS (
        SELECT user_id, event_type, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                             PARTITION BY user_id ORDER BY ts)) >= 14400000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events),
    s AS (
        SELECT user_id, event_type, ts,
               CAST(sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM o),
    v AS (SELECT user_id, session_seq, min(ts) AS v_ts
          FROM s WHERE event_type = 'view' GROUP BY 1, 2),
    c AS (SELECT s.user_id, s.session_seq, min(s.ts) AS c_ts
          FROM s JOIN v ON v.user_id = s.user_id AND v.session_seq = s.session_seq
          WHERE s.event_type = 'click' AND s.ts > v.v_ts GROUP BY 1, 2),
    p AS (SELECT s.user_id, s.session_seq, min(s.ts) AS p_ts
          FROM s JOIN c ON c.user_id = s.user_id AND c.session_seq = s.session_seq
          WHERE s.event_type = 'purchase' AND s.ts > c.c_ts GROUP BY 1, 2),
    sess AS (SELECT DISTINCT user_id, session_seq FROM s)
    SELECT sess.user_id, sess.session_seq,
           v.v_ts IS NOT NULL AS reached_view,
           c.c_ts IS NOT NULL AS reached_click,
           p.p_ts IS NOT NULL AS reached_purchase
    FROM sess
    LEFT JOIN v ON v.user_id = sess.user_id AND v.session_seq = sess.session_seq
    LEFT JOIN c ON c.user_id = sess.user_id AND c.session_seq = sess.session_seq
    LEFT JOIN p ON p.user_id = sess.user_id AND p.session_seq = sess.session_seq
    """,
)
def q_events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis per session — the product-analytics staple:
    a session reaches the click step only via a click AFTER its first
    view, and the purchase step only via a purchase AFTER that click
    (strict event-time ordering, not mere co-occurrence). Built on the
    gated sessionize operator; each funnel stage is one aggregate + one
    equi-join on the session key, all co-partitioned after sessionize's
    single shuffle+sort — no self-join fan-out, no window re-sort per
    stage. Row-level gate at session cardinality: every session's
    (reached_view, reached_click, reached_purchase) triple is pinned."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = temporal.sessionize(ev, key="user_id", ts="ts", gap_seconds=14_400)
    keys = ["user_id", "session_seq"]
    v = (
        s.filter(F.col("event_type") == "view")
        .groupBy(*keys)
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        s.filter(F.col("event_type") == "click")
        .join(v, keys)
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy(*keys)
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        s.filter(F.col("event_type") == "purchase")
        .join(c, keys)
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy(*keys)
        .agg(F.min("ts").alias("p_ts"))
    )
    sess = s.select(*keys).distinct()
    return (
        sess.join(v, keys, "left")
        .join(c, keys, "left")
        .join(p, keys, "left")
        .select(
            "user_id",
            "session_seq",
            F.col("v_ts").isNotNull().alias("reached_view"),
            F.col("c_ts").isNotNull().alias("reached_click"),
            F.col("p_ts").isNotNull().alias("reached_purchase"),
        )
    )
