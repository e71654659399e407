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
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
