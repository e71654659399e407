"""Named query registry: every engine operator exposed as a
(spark, sf_dir) -> DataFrame callable, paired (where SQL-expressible) with
an ANSI-SQL oracle that DuckDB runs over the same parquet tables.

Conventions (the driver compares row-count + schema + order-insensitive
value hash, columns sorted by name):
- every computed/aggregate column is aliased identically in Spark and SQL;
- integer aggregates are cast to BIGINT on both sides (DuckDB widens to
  HUGEINT otherwise);
- double aggregates over many terms are rounded identically on both sides
  (summation order differs between engines);
- ``date_trunc`` results are cast to DATE on both sides (DuckDB returns
  DATE, Spark TIMESTAMP);
- timestamps run under UTC sessions on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    headline: bool = False  # include in bench.py


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, headline: bool = False):
    def deco(fn):
        assert name not in REGISTRY, f"duplicate query name {name}"
        REGISTRY[name] = QuerySpec(fn, oracle, headline)
        return fn

    return deco


def _load_all() -> None:
    from oracle_schema_copy_spark.queries import (  # noqa: F401
        pipeline,
        reference_surface,
        relational,
        streaming,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle.strip()
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }


def headline_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.headline}
