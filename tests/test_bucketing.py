"""Co-located joins via bucketed tables, and salted-join semantics.

Bucketing is the 100 TB co-location story: two tables written bucketed by
the join key into the same bucket count join WITHOUT a shuffle exchange —
the scan layout already satisfies the join's required distribution.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from oracle_schema_copy_spark.operators.skew import salted_join


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-based joins so the exchange-elision assertion is
    about bucketing, not broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_elides_exchange(no_broadcast):
    spark = no_broadcast
    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"bkt_a_{suffix}", f"bkt_b_{suffix}"
    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    try:
        a.write.bucketBy(8, "k").sortBy("k").saveAsTable(ta)
        b.write.bucketBy(8, "k").sortBy("k").saveAsTable(tb)
        joined = spark.table(ta).join(spark.table(tb), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 500
        # the same join over unbucketed frames DOES shuffle both sides
        plain = a.join(b, "k")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (3, "w")], ["k", "lv"]
    )
    right = spark.createDataFrame([(1, "A"), (2, "B")], ["k", "rv"])
    got = sorted(
        (r.k, r.lv, r.rv)
        for r in salted_join(left, right, ["k"], salt_buckets=4).collect()
    )
    want = sorted((r.k, r.lv, r.rv) for r in left.join(right, "k").collect())
    assert got == want

    # left join keeps unmatched left rows exactly once
    got_left = sorted(
        (r.k, r.lv, r.rv)
        for r in salted_join(left, right, ["k"], salt_buckets=4, how="left").collect()
    )
    want_left = sorted(
        (r.k, r.lv, r.rv) for r in left.join(right, "k", "left").collect()
    )
    assert got_left == want_left

    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="full")
