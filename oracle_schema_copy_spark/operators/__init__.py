"""Engine operators (FK walk, mutations, dedup, similarity, multimodal)."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered_pair_array(
    items: Column, make: Callable[[Column, Column], Column] | None = None
) -> Column:
    """All ordered pairs (items[i], items[j]) for i < j, generated locally
    inside the row — the posting-list pair primitive shared by every
    LSH/shingle candidate generator (no self-join, one pass per posting).
    ``make(x, y)`` builds the emitted pair struct; default ``(id_a, id_b)``.
    """
    if make is None:
        make = lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b"))  # noqa: E731
    return F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                F.slice(items, i + 2, F.size(items)),
                lambda y: make(x, y),
            ),
        )
    )


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    arrives under-partitioned (e.g. single-row-group parquet at test
    scale, which Spark cannot byte-range split). The shuffle moves the raw
    rows once, before per-row compute fans out; at production scale inputs
    already exceed the target and this is a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    # df.rdd.getNumPartitions() is driver-side plan analysis only (no job,
    # no data movement) — the one public way to see the scan's split count.
    # The alternative, an unconditional repartition, would impose a full
    # shuffle on inputs that are already well-partitioned; at production
    # scale this branch is simply never taken.
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
