"""Count-min sketch invariants: never-undercount, exactness below
width, and counter-linearity merging (the property that makes per-source
sketches distributable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_schema_copy_spark.operators import sketches

DEPTH, WIDTH = 4, 64


def _keys_df(spark, rows):
    return spark.createDataFrame([(k,) for k in rows], ["k"])


def test_estimates_never_undercount_and_small_domains_are_exact(spark):
    # 40 distinct keys, skewed multiplicities, against a 64-wide grid:
    # estimates must be >= exact everywhere; most rows should be exact
    # (collision probability per depth row ~ 40/64, min over 4 rows).
    rows = [f"key{i}" for i in range(40) for _ in range(i + 1)]
    df = _keys_df(spark, rows)
    sk = sketches.cms_sketch(df, "k", depth=DEPTH, width=WIDTH)
    keys = df.select("k").distinct()
    est = {
        r["k"]: r["estimate"]
        for r in sketches.cms_estimate(
            sk, keys, "k", depth=DEPTH, width=WIDTH
        ).collect()
    }
    exact = {f"key{i}": i + 1 for i in range(40)}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    # the grid itself conserves mass: every depth row sums to |input|
    per_row = {
        r["row"]: r["s"]
        for r in sk.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    }
    assert per_row == {j: len(rows) for j in range(DEPTH)}


def test_sketches_merge_by_counter_addition(spark):
    rows = [f"t{i % 7}" for i in range(50)]
    a, b = rows[:20], rows[20:]
    sk_union = sketches.cms_sketch(_keys_df(spark, rows), "k", depth=DEPTH, width=WIDTH)
    merged = (
        sketches.cms_sketch(_keys_df(spark, a), "k", depth=DEPTH, width=WIDTH)
        .unionAll(sketches.cms_sketch(_keys_df(spark, b), "k", depth=DEPTH, width=WIDTH))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    as_set = lambda f: {(r["row"], r["bucket"], r["cnt"]) for r in f.collect()}  # noqa: E731
    assert as_set(merged) == as_set(sk_union)
