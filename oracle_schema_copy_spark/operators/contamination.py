"""Benchmark-contamination detection (train/eval n-gram overlap).

Every public LLM data pipeline decontaminates its training corpus against
the evaluation benchmarks before training: a document that shares a large
fraction of its n-gram shingles with any benchmark document leaks the
eval set and must be flagged or dropped.

100 TB shape: the benchmark side is tiny (eval suites are megabytes), so
its DISTINCT shingle set broadcasts to every executor; the corpus
explodes its shingles once and probes the broadcast hash set — the scan
side never shuffles text. The only shuffles are the per-doc hit count
(map-side combined longs) and the final co-keyed join of hits back onto
per-doc shingle counts. Corpus size can grow 1000x without changing the
plan; only the broadcast must stay small, which eval benchmarks do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oracle_schema_copy_spark.functions.text import shingles


def contamination_scores(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per corpus document: how many of its distinct n-gram shingles occur
    anywhere in the benchmark, and the contaminated fraction.

    Returns ``(id_col, n_shingles, n_common, contamination)`` for every
    corpus document with at least one overlapping shingle (clean documents
    produce no row — at scale the overwhelming majority, so the output
    stays proportional to actual contamination, not corpus size).
    """
    from oracle_schema_copy_spark.operators import spread

    # ONE plan branch: carry the per-doc shingle count through the explode
    # (the ngram_jaccard_pairs pattern) so the text->shingle parse runs
    # once and no size-lookup join is needed afterwards
    sh = (
        spread(corpus)
        .select(F.col(id_col), shingles(F.col(text_col), n).alias("__sh"))
        .where(F.size("__sh") > 0)
    )
    ex = sh.select(
        F.col(id_col),
        F.size("__sh").cast("long").alias("n_shingles"),
        F.explode("__sh").alias("s"),
    )
    bench = (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("s"))
        .distinct()
    )
    return (
        ex.join(F.broadcast(bench), "s")
        .groupBy(id_col)
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.count("*").cast("long").alias("n_common"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_common",
            (F.col("n_common").cast("double") / F.col("n_shingles")).alias(
                "contamination"
            ),
        )
    )
