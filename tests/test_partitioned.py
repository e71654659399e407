"""Partitioned-layout source: pruning plan contract + dynamic overwrite
semantics (sources/partitioned.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_schema_copy_spark.sources import partitioned
from oracle_schema_copy_spark.sources.tables import load_table


def test_partition_filter_reaches_planning(spark, sf_dir, tmp_path):
    """A predicate on the partition column must appear as a
    PartitionFilter (directory pruning), not a data-column pushdown, and
    the scan must read only the matching partition's files."""
    path = str(tmp_path / "ev")
    ev = load_table(spark, sf_dir, "events")
    partitioned.write_partitioned(ev, path, ["event_type"])
    back = partitioned.read_partitioned(spark, path).filter(
        F.col("event_type") == "click"
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1].split("]")[0]
    n_clicks = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == n_clicks
    # behavioral proof of directory pruning: a corrupt file planted in a
    # SIBLING partition must not be touched by the pruned scan (the
    # unpruned scan chokes on it)
    import os

    import pytest
    from py4j.protocol import Py4JJavaError

    sib = next(
        d for d in os.listdir(path) if d.startswith("event_type=") and d != "event_type=click"
    )
    with open(os.path.join(path, sib, "junk.parquet"), "wb") as f:
        f.write(b"this is not parquet")
    fresh = partitioned.read_partitioned(spark, path)
    assert (
        fresh.filter(F.col("event_type") == "click").count() == n_clicks
    )  # pruned: fine
    with pytest.raises(Py4JJavaError):
        fresh.count()  # unpruned: reads the junk file and fails


def test_dynamic_overwrite_replaces_only_incoming_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, p string"
    )
    partitioned.write_partitioned(df, path, ["p"])
    # refresh partition 'a' only, with different rows
    fresh = spark.createDataFrame([(9, "a")], "id long, p string")
    partitioned.overwrite_partitions(fresh, path, ["p"])
    got = sorted(
        (r.id, r.p) for r in partitioned.read_partitioned(spark, path).collect()
    )
    # 'a' replaced wholesale, 'b' untouched
    assert got == [(3, "b"), (9, "a")]
