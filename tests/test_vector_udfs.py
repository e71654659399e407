"""Vectorized pandas-UDF paths agree with their exact JVM twins."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from oracle_schema_copy_spark.functions import vectors
from oracle_schema_copy_spark.sources.tables import load_table


def test_dot_vectorized_matches_exact_dot(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = (
        emb.alias("a")
        .join(emb.alias("b"), F.col("a.vec_id") + 1 == F.col("b.vec_id"))
        .select(
            vectors.dot(F.col("a.embedding"), F.col("b.embedding")).alias("exact"),
            vectors.dot_vectorized(F.col("a.embedding"), F.col("b.embedding")).alias("fast"),
        )
    )
    rows = pairs.collect()
    assert rows and all(abs(r.exact - r.fast) < 1e-9 for r in rows)


def test_grouped_geo_mean_matches_exp_avg_log(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", (F.length("text") + F.lit(1)).cast("double").alias("v")
    )
    got = {
        r.lang: r.gm
        for r in docs.groupBy("lang").agg(vectors.grouped_geo_mean(F.col("v")).alias("gm")).collect()
    }
    want = {
        r.lang: r.gm
        for r in docs.groupBy("lang").agg(F.exp(F.avg(F.log("v"))).alias("gm")).collect()
    }
    assert set(got) == set(want)
    assert all(math.isclose(got[k], want[k], rel_tol=1e-12) for k in got)
