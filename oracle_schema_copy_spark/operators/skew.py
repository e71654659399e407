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
