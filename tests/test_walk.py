from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_schema_copy_spark import catalog as cat
from oracle_schema_copy_spark.operators import walk
from oracle_schema_copy_spark.sources.tables import load_tables

PATHS = ["CUSTOMER->ORDERS.O_CUSTKEY", "ORDERS->LINEITEM.L_ORDERKEY"]


@pytest.fixture(scope="module")
def ctx(spark, sf_dir):
    c = cat.tpch_catalog(sf_dir)
    tables = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "part"))
    return c, tables


def test_walk_reaches_all_tables(spark, ctx):
    c, tables = ctx
    sels = walk.walk_linked(spark, tables, c, PATHS, [1, 2, 3])
    assert [s.table for s in sels] == ["customer", "orders", "lineitem"]
    n_orders = sels[1].keys.count()
    expected = (
        tables["orders"].filter(F.col("o_custkey").isin([1, 2, 3])).select("o_orderkey").distinct().count()
    )
    assert n_orders == expected


def test_walk_errors_on_unreached_parent(spark, ctx):
    c, tables = ctx
    with pytest.raises(ValueError, match="could not find path to part"):
        walk.walk_linked(
            spark, tables, c, ["CUSTOMER->ORDERS.O_CUSTKEY", "PART->LINEITEM.L_PARTKEY"], [1]
        )


def test_walk_dedupes_seed_keys(spark, ctx):
    c, tables = ctx
    sels = walk.walk_linked(spark, tables, c, PATHS, [1, 1, 2, 2, 2])
    assert sels[0].keys.count() == 2


def test_walk_unions_when_child_reached_twice(spark, ctx, sf_dir):
    """Documented delta from the reference: two edges into the same child
    UNION their key sets (the reference overwrites, CopyUtils.java:566-567)."""
    c, tables = ctx
    paths = [
        "CUSTOMER->ORDERS.O_CUSTKEY",
        "ORDERS->LINEITEM.L_ORDERKEY",
        "CUSTOMER->ORDERS.O_CUSTKEY",  # same child reached again
    ]
    sels = walk.walk_linked(spark, tables, c, paths, [1, 2])
    dedup = walk.walk_linked(spark, tables, c, PATHS, [1, 2])
    # frontiers tolerate duplicates (no per-edge dedup shuffle); compare SETS
    assert sels[1].keys.distinct().count() == dedup[1].keys.distinct().count()


def test_copy_selections_counts_match(spark, ctx):
    c, tables = ctx
    copied = walk.copy_tree(spark, tables, c, PATHS, [1, 2, 3])
    n_li = copied["lineitem"].count()
    expected = (
        tables["lineitem"]
        .join(
            tables["orders"].filter(F.col("o_custkey").isin([1, 2, 3])),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .count()
    )
    assert n_li == expected and n_li > 0


def test_copy_selection_count_assertion_fires(spark, ctx):
    """Keys not present in the table must fail the coverage assertion."""
    c, tables = ctx
    sels = [
        walk.TableSelection(
            "customer", "c_custkey", walk.seed_frame(spark, "c_custkey", [1, 999999999])
        )
    ]
    with pytest.raises(AssertionError, match="matched 1 of 2"):
        walk.copy_selections(tables, sels)


def test_delete_tree_removes_exactly_subtree(spark, ctx):
    c, tables = ctx
    surviving = walk.delete_tree(spark, tables, c, PATHS, [1, 2, 3])
    total = tables["orders"].count()
    gone = tables["orders"].filter(F.col("o_custkey").isin([1, 2, 3])).count()
    assert surviving["orders"].count() == total - gone
    assert surviving["customer"].filter(F.col("c_custkey").isin([1, 2, 3])).count() == 0


def test_large_frontier_uses_shuffled_semi_join(spark, ctx):
    """Without a forced broadcast hint, a frontier above the broadcast
    threshold must plan as a shuffled semi-join (driver-OOM safety at
    scale); a small frontier still broadcasts under normal thresholds."""
    c, tables = ctx
    old_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        old_aqe = None
    try:
        # model "frontier too big to broadcast" by disabling broadcast joins
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        frontier = spark.range(0, 200_000).select(F.col("id").alias("o_orderkey"))
        scanned = walk.keyed_scan(tables["orders"], "o_orderkey", frontier)
        plan = scanned._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        expected = tables["orders"].filter(F.col("o_orderkey") < 200_000).count()
        assert scanned.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_static)
        if old_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
