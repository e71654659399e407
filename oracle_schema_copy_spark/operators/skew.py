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

def _row_salt(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt in [0, buckets): xxhash64 of every
    column. Unlike ``monotonically_increasing_id`` (attempt-dependent),
    a recomputed task re-derives identical salts, so salted shuffles stay
    exactly-once under partial stage retries."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))


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
    in SALTABLE. The salt must be DETERMINISTIC per row (a recomputed map
    task after a shuffle-fetch failure must re-emit the same salt, or rows
    can be double-counted/lost across partial stage retries): hash of the
    whole row, modulo the bucket count. Exact duplicate rows share a salt,
    which only matters if one key is dominated by identical rows.
    """
    salted = df.withColumn("__salt", _row_salt(df, salt_buckets))
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
    the right side to the hot keys and union with a plain join. The salt
    is a JOIN key, so it must be deterministic under task retries — see
    ``_row_salt``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    l = left.withColumn("__salt", _row_salt(left, salt_buckets).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return l.join(r, on + ["__salt"], how).drop("__salt")
