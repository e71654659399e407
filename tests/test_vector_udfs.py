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


def test_banded_bucket_keys_arrow_matches_codegen_path(spark, sf_dir):
    """The Arrow signature path (taken when bands*r exceeds the janino
    whole-stage limit) must produce the EXACT same (id, band, key) set as
    the codegen'd unrolled-SQL projection — its sequential-float64
    accumulation claims bit-identity, and candidate sets (hence oracle
    MATCHes) rest on it."""
    from oracle_schema_copy_spark.operators import similarity
    from oracle_schema_copy_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    kw = dict(
        id_col="vec_id", vec_col="embedding", bands=8,
        planes_per_band=3, dim=64, plane_stride=similarity.LSH_R_MAX,
    )
    # 8*3=24 planes > _CODEGEN_MAX_PLANES -> Arrow path
    assert 8 * 3 > similarity._CODEGEN_MAX_PLANES
    arrow = similarity.banded_bucket_keys(emb, **kw)
    old = similarity._CODEGEN_MAX_PLANES
    similarity._CODEGEN_MAX_PLANES = 10_000  # force the SQL projection
    try:
        codegen = similarity.banded_bucket_keys(emb, **kw)
    finally:
        similarity._CODEGEN_MAX_PLANES = old
    a = {(r.vec_id, r.bk.band, r.bk.key) for r in arrow.collect()}
    c = {(r.vec_id, r.bk.band, r.bk.key) for r in codegen.collect()}
    assert a == c and len(a) > 0
