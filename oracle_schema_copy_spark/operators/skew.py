"""Skew-mitigation operators.

A groupBy on a skewed key puts one key's entire row set on one reducer —
at 100 TB a hot key (boilerplate doc hash, NULL join key, celebrity user)
becomes the straggler that defines job latency. ``salted_agg`` is the
standard two-phase fix as a first-class operator: salt the key into N
sub-keys, partial-aggregate on (key, salt) — spreading the hot key over N
reducers — then final-aggregate on the key alone. Works for any algebraic
aggregate (sum/count/min/max, and avg as sum+count recombined).

AQE's skew-join splitting handles skewed *joins* automatically;
aggregations get no such help — the salt must be explicit, which is why
this exists. Result is bit-identical to the unsalted groupBy (the SQL
oracle for any salted query is the plain GROUP BY).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial aggregate over salted groups, final recombination) per metric
SALTABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    metrics: dict[str, tuple[str, Column]],
    *,
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``metrics`` maps output column name -> (agg kind, input column), kind
    in SALTABLE. The salt is a deterministic per-row value (a hash of the
    whole row's partition id via ``spark_partition_id`` would bind to
    physical layout; ``monotonically_increasing_id() % N`` keeps the salt
    stable per row within a run and uniform across the hot key's rows).
    """
    salted = df.withColumn("__salt", F.monotonically_increasing_id() % salt_buckets)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            SALTABLE[kind][0](col).alias(f"__p_{name}")
            for name, (kind, col) in metrics.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            SALTABLE[kind][1](F.col(f"__p_{name}")).alias(name)
            for name, (kind, col) in metrics.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: spread a hot LEFT join key over ``salt_buckets``
    reducers by salting the (large, skewed) left side and replicating the
    (smaller) right side once per salt value, then joining on
    (key..., salt).

    The result is row-identical to the plain join — salting is pure
    mechanics, so any salted query's SQL oracle is the unsalted join. Only
    ``inner`` and ``left`` are legal: an unmatched RIGHT row exists once
    per replica, so right/full-outer would emit it ``salt_buckets`` times.

    At 100 TB: reach for AQE's skew-join splitting first (it needs no
    replication); explicit salting is for the key so hot that even a split
    shuffle partition exceeds one executor, or for joins AQE won't split
    (e.g. under a required distribution). Replication multiplies the right
    side's shuffle volume by ``salt_buckets`` — keep it small or pre-filter
    the right side to the hot keys and union with a plain join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    l = left.withColumn(
        "__salt", (F.monotonically_increasing_id() % salt_buckets).cast("int")
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return l.join(r, on + ["__salt"], how).drop("__salt")
