"""Temporal join operators: as-of join and bounded range join.

Spark has no built-in ASOF JOIN (pandas-on-Spark ``merge_asof`` exists but
routes through pandas semantics); a naive ``a.ts >= b.ts`` inequality join
plans as a broadcast-nested-loop — quadratic per key. Both operators here
are expressed in shuffle-safe DataFrame shapes:

- ``asof_join``: union the two sides with a tag, one window sort per key
  (``last(quote_struct, ignorenulls=True)`` over rows ordered by (ts,
  tag)), then keep probe rows. The quote attributes travel as ONE struct
  so the carried match is row-atomic — a NULL attribute inside the
  matching quote row stays NULL instead of being back-filled from an
  older quote. ONE shuffle+sort on (key, ts) of rows proportional to
  both inputs — the canonical distributed as-of.
- ``range_join_binned``: equi-join on (key, time-bin) with each right row
  replicated into the neighbor bins its window can reach, then an exact
  range filter. Turns the inequality join into an equi-join Catalyst can
  hash-partition; replication factor = window/bin_width + 1 (bounded,
  chosen by the caller).

At 100 TB both are single-shuffle plans keyed on (entity, time) — no
nested-loop anywhere, AQE handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    probes: DataFrame,
    quotes: DataFrame,
    *,
    key: str,
    ts: str = "ts",
    quote_cols: list[str],
    prefix: str = "q_",
    inclusive: bool = True,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each probe row, the nearest quote row for the same key:
    ``direction="backward"`` (default) picks the most recent quote with
    ``quote.ts <= probe.ts``; ``"forward"`` the earliest with ``quote.ts
    >= probe.ts`` (``<`` / ``>`` when ``inclusive=False``). Inner
    semantics: probes with no matching quote are dropped (matches SQL
    ``ASOF JOIN``). ``tolerance_seconds`` additionally drops matches
    farther than that from the probe (pandas ``merge_asof`` tolerance) —
    it requires ``ts`` in ``quote_cols`` so the matched quote's own
    timestamp is available to compare.

    Implementation: tag quotes 0 / probes 1, union, window ordered by
    (ts, tag) per key — ts DESCENDS for the forward direction, which
    turns "earliest at-or-after" into the same carry-last-seen traversal —
    and carry the last non-null quote ROW (one struct — never a
    per-column fill that could mix attributes of different quote rows).
    With ``inclusive=False`` quotes sort AFTER probes at equal ts (tag
    order flips), so same-instant quotes don't match. Still ONE
    shuffle+sort on (key, ts) regardless of direction or tolerance.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    if tolerance_seconds is not None and ts not in quote_cols:
        raise ValueError("tolerance_seconds requires ts in quote_cols")
    q_tag, p_tag = (0, 1) if inclusive else (1, 0)
    q_struct_type = StructType(
        [StructField(c, quotes.schema[c].dataType) for c in quote_cols]
    )
    q = quotes.select(
        F.col(key), F.col(ts), F.lit(q_tag).alias("__tag"),
        F.struct(*[F.col(c) for c in quote_cols]).alias("__q"),
        *[
            F.lit(None).cast(probes.schema[c].dataType).alias(c)
            for c in probes.columns
            if c not in (key, ts)
        ],
    )
    p = probes.select(
        F.col(key), F.col(ts), F.lit(p_tag).alias("__tag"),
        F.lit(None).cast(q_struct_type).alias("__q"),
        *[F.col(c) for c in probes.columns if c not in (key, ts)],
    )
    u = q.unionByName(p)
    ts_order = F.col(ts) if direction == "backward" else F.col(ts).desc()
    # final __q tie-break: several quotes at the SAME (key, ts) would
    # otherwise be carried nondeterministically (partition-order luck).
    # Ordering by the quote struct makes the carried row the MAX quote
    # tuple (in quote_cols order) — deterministic on any partitioning,
    # and part of the operator CONTRACT: lead quote_cols with a unique id
    # to pin a specific row. Only disambiguates among equal-(ts, tag)
    # QUOTE rows: probes sort apart via __tag and their __q is NULL (and
    # tied probes all see the same quote prefix — quotes sort strictly
    # before/after every equal-ts probe via __tag, so the row frame's
    # last non-null __q is identical across them). The rule is SQL-
    # expressible (row_number over q.ts DESC then quote_cols DESC, keep
    # rn=1), so oracles can mirror it exactly on tie-bearing data — see
    # the asof_join_planted_ties query and tests/test_temporal.py's
    # planted-tie case; native SQL ASOF JOIN picks ties arbitrarily and
    # is only used as oracle on tie-free inputs.
    w = (
        Window.partitionBy(key)
        .orderBy(ts_order, "__tag", "__q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        key,
        ts,
        "__tag",
        F.last("__q", ignorenulls=True).over(w).alias("__q"),
        *[c for c in probes.columns if c not in (key, ts)],
    )
    out_cols = [key, ts] + [c for c in probes.columns if c not in (key, ts)] + [
        f"{prefix}{c}" for c in quote_cols
    ]
    out = filled.filter(F.col("__tag") == p_tag).filter(F.col("__q").isNotNull())
    if tolerance_seconds is not None:
        gap_us = F.abs(
            F.unix_micros(F.col(ts)) - F.unix_micros(F.col(f"__q.{ts}"))
        )
        out = out.filter(gap_us <= tolerance_seconds * 1_000_000)
    return (
        out.select(
            key,
            ts,
            *[c for c in probes.columns if c not in (key, ts)],
            *[F.col(f"__q.{c}").alias(f"{prefix}{c}") for c in quote_cols],
        )
        .select(*out_cols)
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int,
    bin_seconds: int | None = None,
    right_cols: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """All (left, right) rows with the same key and ``|left.ts - right.ts|
    <= window_seconds`` — as an equi-join on (key, time-bin).

    Each right row is replicated into every bin a matching left row could
    occupy (window/bin + 1 bins); the exact range predicate then filters.
    ``bin_seconds`` defaults to ``window_seconds`` (replication factor 3:
    bin-1, bin, bin+1).
    """
    bin_s = bin_seconds or window_seconds
    reach = -(-window_seconds // bin_s)  # ceil: bins a window edge can cross
    lbin = F.floor(F.unix_timestamp(F.col(left_ts)) / bin_s).cast("long")
    rbin = F.floor(F.unix_timestamp(F.col(right_ts)) / bin_s).cast("long")
    l2 = left.withColumn("__bin", lbin)
    r2 = right.select(
        F.col(key).alias("__rkey"),
        F.col(right_ts).alias("__rts"),
        F.explode(F.sequence(rbin - reach, rbin + reach)).alias("__bin"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    # timestamp->double = epoch seconds incl. fractional microseconds
    in_range = (
        F.abs(F.col(left_ts).cast("double") - F.col("__rts").cast("double"))
        <= F.lit(float(window_seconds))
    )
    return (
        l2.join(r2, (l2[key] == r2["__rkey"]) & (l2["__bin"] == r2["__bin"]))
        .filter(in_range)
        .drop("__bin", "__rkey", "__rts")
    )


def funnel(
    events: DataFrame,
    *,
    key: str,
    ts: str = "ts",
    step_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel progression per key: for step i, the EARLIEST event
    of type ``steps[i]`` strictly after the key's step-(i-1) time; keys
    enter the result by completing step 1. Output: (key, t1..tN nullable,
    reached = furthest completed step) — the product-analytics funnel
    (view → click → convert) over the events fixture.

    Shape: one filtered min-aggregation per step, each an equi-join on
    the key against the (shrinking) survivors of the previous step —
    N-1 co-partitioned hash joins on the same key, no windows over the
    full stream, no row explosion; every aggregation map-side combines.
    Deterministic: ``min(ts)`` is order-free.
    """
    out = (
        events.filter(F.col(step_col) == steps[0])
        .groupBy(F.col(key))
        .agg(F.min(ts).alias("t1"))
    )
    for i, s in enumerate(steps[1:], start=2):
        e = events.filter(F.col(step_col) == s).select(
            F.col(key).alias("__k"), F.col(ts).alias("__t")
        )
        nxt = (
            e.join(
                out.select(key, f"t{i - 1}"),
                (e["__k"] == F.col(key)) & (e["__t"] > F.col(f"t{i - 1}")),
            )
            .groupBy("__k")
            .agg(F.min("__t").alias(f"t{i}"))
        )
        out = out.join(nxt, out[key] == nxt["__k"], "left").drop("__k")
    reached = F.lit(1)
    for i in range(2, len(steps) + 1):
        reached = reached + F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
    return out.select(
        key, *[f"t{i}" for i in range(1, len(steps) + 1)],
        reached.cast("long").alias("reached"),
    )


def sessionize(
    df: DataFrame,
    *,
    key: str,
    ts: str = "ts",
    gap_seconds: int = 14_400,
) -> DataFrame:
    """Assign each event its per-key session ordinal: a new session starts
    when the gap to the previous event reaches ``gap_seconds``.

    The per-EVENT counterpart of the session-window aggregate
    (``streaming/ops.session_agg``): lag + running sum of new-session
    flags, one shuffle+sort on (key, ts) — the canonical distributed
    sessionization. Gap rule matches Spark ``session_window`` merge
    semantics (an event exactly ``gap`` after the previous one opens a
    NEW session).
    """
    w = Window.partitionBy(key).orderBy(ts)
    prev = F.lag(ts).over(w)
    new_s = F.when(
        prev.isNull()
        | (F.unix_micros(F.col(ts)) - F.unix_micros(prev) >= gap_seconds * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_seq",
        F.sum(new_s)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )


def trailing_features(
    df: DataFrame,
    *,
    key: str,
    ts: str = "ts",
    value: str = "value",
    trailing_seconds: int = 3600,
) -> DataFrame:
    """Trailing time-window features per event: count and mean of ``value``
    over the last ``trailing_seconds`` (inclusive of the current event) for
    the same key — the standard leakage-free rolling feature for training
    data (only PAST rows enter each feature).

    A RANGE window frame over the microsecond epoch: one shuffle+sort per
    key, no self-join, no replication — Spark evaluates the sliding frame
    incrementally within each sorted partition.
    """
    us = F.unix_micros(F.col(ts))
    w = (
        Window.partitionBy(key)
        .orderBy(us)
        .rangeBetween(-trailing_seconds * 1_000_000, 0)
    )
    return df.withColumn(
        "trailing_n", F.count(F.lit(1)).over(w).cast("long")
    ).withColumn("trailing_avg", F.round(F.avg(value).over(w), 6))


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time (temporal) join: each fact row picks the dimension
    VERSION that was valid when the fact happened — the leakage-free way
    to attach slowly-changing attributes to training examples (joining the
    current version would leak future attribute values into past facts).

    Validity intervals are HALF-OPEN ``[valid_from, valid_to)``, matching
    :func:`oracle_schema_copy_spark.operators.mutate.scd2_merge`, which
    closes a version at the effective date and opens its successor at the
    same date — half-open intervals make that boundary instant belong to
    exactly one version, so the join stays 1:1 per fact.

    Scale shape: an EQUI-join on the business key with the interval
    predicate as a residual filter — never an interval/nested-loop join.
    SCD2 dimensions are versions-per-key small (a few rows) while facts
    are the 100 TB side, so Catalyst broadcasts the dimension and the
    fact table never shuffles; the residual interval check runs inside
    the broadcast hash join's stream side.
    """
    cond = (
        (facts[fact_key] == dim[dim_key])
        & (facts[fact_ts] >= dim[valid_from])
        & (facts[fact_ts] < dim[valid_to])
    )
    return facts.join(dim, cond, how)
