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
