"""Temporal join queries over the events fixture: as-of join and bounded
range join — alignment primitives a training-data pipeline needs (join
each observation to the latest prior state; find neighbors in a time
window) that Spark has no native operator for. See operators/temporal.py
for the shuffle-safe formulations; the oracles use DuckDB's native
``ASOF JOIN`` and a plain inequality join respectively — independent
implementations that must agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
