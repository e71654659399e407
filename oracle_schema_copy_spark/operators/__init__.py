"""Engine operators (FK walk, mutations, dedup, similarity, multimodal)."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
