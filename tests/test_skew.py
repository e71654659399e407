"""salted_agg must be invisible in results and spread hot keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_schema_copy_spark.operators.skew import salted_agg


def test_salted_agg_matches_plain_agg_on_hot_key(spark):
    # one key holds 90% of rows — the shape that straggles unsalted
    df = spark.range(100_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 97).cast("long").alias("v"),  # exact sums: no float-order flake
    )
    got = {
        r.k: (r.total, r.n, r.vmin, r.vmax)
        for r in salted_agg(
            df,
            ["k"],
            {
                "total": ("sum", F.col("v")),
                "n": ("count", F.lit(1)),
                "vmin": ("min", F.col("v")),
                "vmax": ("max", F.col("v")),
            },
        ).collect()
    }
    want = {
        r.k: (r.total, r.n, r.vmin, r.vmax)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }
    assert got == want
    assert got["hot"][1] == 90_000


def test_aqe_splits_skewed_join_partitions(spark):
    """Runtime skew mitigation proof: a sort-merge join with one hot key
    must get its oversized shuffle partition SPLIT by AQE's skew-join
    rule (OptimizeSkewedJoin) — the mechanism that saves a 100 TB join
    from one straggler executor. Thresholds are lowered so the local
    fixture trips the same code path production data would."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 190k rows share key 0 -> one shuffle partition ~50x the median
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") < 190_000, F.lit(0)).otherwise(F.col("id")).alias("k"),
            (F.col("id") * 3).alias("v"),
        )
        right = spark.range(0, 64).select(F.col("id").alias("k"), F.col("id").alias("w"))
        joined = left.join(right, "k")
        # collect() executes THIS DataFrame's query execution, so its
        # adaptive plan finalizes (count() would build a separate tree
        # and leave joined's own plan isFinalPlan=false)
        rows = joined.collect()
        # only the hot key matches (left keys are 0 or >= 190000)
        assert len(rows) == 190_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, "skew rule only applies to shuffled joins"
        assert "skewed" in plan, f"no skew split in final plan:\n{plan[:2000]}"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
