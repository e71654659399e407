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
    from oracle_schema_copy_spark.operators.dedup import shingle_sets

    # ONE plan branch: carry the per-doc shingle count through the explode
    # (the ngram_jaccard_pairs pattern) so the text->shingle parse runs
    # once and no size-lookup join is needed afterwards. shingle_sets
    # filters on TOKEN count, not size(shingle_set) — a filter on the
    # computed array would be pushed below the projection and re-evaluate
    # the whole shingle expression per row (its docstring documents this).
    sh = shingle_sets(corpus, id_col, text_col, n).withColumnRenamed(
        "shingle_set", "__sh"
    )
    # explode_outer, not explode: with plain explode Catalyst rewrites the
    # Generate in a way that re-evaluates the shingle expression per
    # OUTPUT row (~10x slower here); outer keeps it evaluated once per
    # input row (same fix as dedup.py's posting generators — empties are
    # already filtered, so outer == inner semantically)
    ex = sh.select(
        F.col(id_col),
        F.size("__sh").cast("long").alias("n_shingles"),
        F.explode_outer("__sh").alias("s"),
    )
    bench = (
        benchmark.select(F.explode_outer(shingles(F.col(text_col), n)).alias("s"))
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
