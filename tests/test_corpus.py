"""Corpus-level text statistics: tf-idf keywords, vocabulary, OOV rate."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_schema_copy_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tfidf_ranks_rare_terms_highest(spark):
    docs = _docs(
        spark,
        [
            (1, "common common rare"),
            (2, "common common common"),
            (3, "common unique unique unique"),
        ],
    )
    top = corpus.tfidf_top_terms(docs, k=1)
    got = {r.doc_id: r.term for r in top.collect()}
    # 'common' appears in every doc -> idf = ln(1) = 0; rare terms win
    assert got[1] == "rare" and got[3] == "unique"
    # doc 2 has only the zero-idf term; it still gets a (zero-scored) row
    assert got[2] == "common"
    assert top.filter((F.col("doc_id") == 2)).collect()[0].tfidf == 0.0


def test_top_vocabulary_deterministic_boundary(spark):
    docs = _docs(spark, [(1, "a a a b b c d"), (2, "b c c d e")])
    # counts: a=3, b=3, c=3, d=2, e=1 -> top-3 tie at 3 broken by term asc
    v = corpus.top_vocabulary(docs, size=3)
    assert [r.term for r in v.collect()] == ["a", "b", "c"]


def test_oov_rate_exact_counts(spark):
    docs = _docs(spark, [(1, "a a x y"), (2, "a b"), (3, "z z z")])
    vocab = spark.createDataFrame([("a",), ("b",)], ["term"])
    got = {r.doc_id: r for r in corpus.oov_rate(docs, vocab).collect()}
    assert (got[1].n_tokens, got[1].n_oov, got[1].oov_rate) == (4, 2, 0.5)
    assert (got[2].n_tokens, got[2].n_oov, got[2].oov_rate) == (2, 0, 0.0)
    assert (got[3].n_tokens, got[3].n_oov, got[3].oov_rate) == (3, 3, 1.0)


def test_mixture_rates_equalize_to_smallest(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "big"),
            (2, "a b c d", "big"),      # big: 8 tokens
            (3, "a b", "small"),        # small: 2 tokens
        ],
        ["doc_id", "text", "source"],
    )
    rates = {r.source: r for r in corpus.mixture_rates(docs).collect()}
    assert rates["small"].rate_bp == 10000          # keep everything
    assert rates["big"].rate_bp == 2500             # 2/8 of the ring
    assert rates["big"].n_tokens == 8 and rates["small"].n_tokens == 2


def test_sample_to_mixture_is_deterministic_subset(spark):
    rows = [(i, "tok " * (i % 5 + 1), f"s{i % 3}") for i in range(60)]
    docs = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], ["doc_id", "text", "source"]
    )
    a = sorted(r.doc_id for r in corpus.sample_to_mixture(docs).collect())
    b = sorted(r.doc_id for r in corpus.sample_to_mixture(docs.repartition(7)).collect())
    assert a == b and 0 < len(a) <= 60  # partitioning-independent


def test_bm25_rewards_tf_and_penalizes_length(spark):
    docs = spark.createDataFrame(
        [
            (1, "hash hash hash pad"),                   # dense, short
            (2, "hash " + "pad " * 20 + "end"),          # one hit, long
            (3, "pad pad pad"),                          # no hit -> absent
        ],
        ["doc_id", "text"],
    )
    got = corpus.bm25_topk(docs, ["hash"], k=10).collect()
    assert [r.doc_id for r in got] == [1, 2]  # doc 3 never appears
    assert got[0].bm25 > got[1].bm25 > 0
