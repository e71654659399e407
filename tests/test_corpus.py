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


def test_remove_repeated_spans_excises_planted_duplicates(spark):
    """Two docs share a 16-token span (planted cross-document duplicate):
    both copies are excised, the unique prefix/suffix survive in order,
    an untouched doc and a short (<16 tokens) doc pass through verbatim."""
    span = " ".join(f"dup{i}" for i in range(16))
    rows = [
        (1, "p1 p2 p3 p4 p5 " + span + " s1 s2 s3 s4 s5"),
        (2, "q1 q2 q3 " + span + " t1 t2"),
        (3, " ".join(f"u{i}" for i in range(20))),
        (4, "tiny doc under sixteen tokens"),
    ]
    out = {
        r.doc_id: r
        for r in corpus.remove_repeated_spans(_docs(spark, rows)).collect()
    }
    assert out[1].kept_text == "p1 p2 p3 p4 p5 s1 s2 s3 s4 s5"
    assert (out[1].n_tok, out[1].n_kept, out[1].n_removed) == (26, 10, 16)
    assert out[2].kept_text == "q1 q2 q3 t1 t2"
    assert (out[2].n_tok, out[2].n_kept, out[2].n_removed) == (21, 5, 16)
    assert out[3].kept_text == rows[2][1] and out[3].n_removed == 0
    assert out[4].kept_text == rows[3][1] and out[4].n_removed == 0


def test_remove_repeated_spans_merges_overlapping_windows(spark):
    """A 17-token duplicated run produces TWO flagged 16-token windows
    offset by one; the union removes all 17 tokens, not 32."""
    run = " ".join(f"d{i}" for i in range(17))
    rows = [(1, "a1 a2 " + run + " z1 z2"), (2, "b1 " + run + " y1")]
    out = {
        r.doc_id: r
        for r in corpus.remove_repeated_spans(_docs(spark, rows)).collect()
    }
    assert out[1].kept_text == "a1 a2 z1 z2"
    assert (out[1].n_tok, out[1].n_removed) == (21, 17)
    assert out[2].kept_text == "b1 y1"


def test_paragraph_dedup_keeps_first_and_reconstructs(spark):
    """Corpus-wide paragraph dedup with deterministic keeper (smallest
    (doc_id, index)) and in-order reconstruction; a doc made entirely of
    already-seen paragraphs rebuilds to ''. Paragraphs = 5-token chunks."""
    p_shared = "s1 s2 s3 s4 s5"
    p_a = "a1 a2 a3 a4 a5"
    p_b = "b1 b2 b3 b4 b5"
    rows = [
        (1, p_a + " " + p_shared),          # keeps both (first occurrence)
        (2, p_shared + " " + p_b),          # loses shared, keeps b
        (3, p_shared),                      # loses everything -> ''
        (4, p_shared + " " + p_shared),     # within-doc dup: both lost
    ]
    out = {
        r.doc_id: r
        for r in corpus.paragraph_dedup_docs(_docs(spark, rows)).collect()
    }
    assert out[1].deduped_text == p_a + " " + p_shared
    assert (out[1].n_paras, out[1].n_kept) == (2, 2)
    assert out[2].deduped_text == p_b and out[2].n_kept == 1
    assert out[3].deduped_text == "" and out[3].n_kept == 0
    assert out[4].deduped_text == "" and (out[4].n_paras, out[4].n_kept) == (2, 0)


def test_paragraph_dedup_short_tail_chunk(spark):
    """The last paragraph may be shorter than the chunk size; it dedups
    and reconstructs like any other."""
    rows = [(1, "x1 x2 x3 x4 x5 tail"), (2, "tail")]
    out = {
        r.doc_id: r
        for r in corpus.paragraph_dedup_docs(_docs(spark, rows)).collect()
    }
    assert out[1].deduped_text == rows[0][1] and out[1].n_paras == 2
    assert out[2].deduped_text == "" and out[2].n_paras == 1


def test_remove_contaminated_spans_scrubs_eval_overlap(spark):
    """Training docs lose exactly the 16-token windows that collide with
    the eval set; eval-internal text is untouched elsewhere and training
    docs without overlap pass through."""
    span = " ".join(f"e{i}" for i in range(16))
    train = _docs(
        spark,
        [
            (1, "p1 p2 " + span + " s1 s2"),
            (2, " ".join(f"u{i}" for i in range(20))),
        ],
    )
    ev = _docs(spark, [(100, "h1 h2 " + span + " h3")])
    out = {
        r.doc_id: r
        for r in corpus.remove_contaminated_spans(train, ev).collect()
    }
    assert out[1].kept_text == "p1 p2 s1 s2"
    assert (out[1].n_tok, out[1].n_removed) == (20, 16)
    assert out[2].kept_text == train.collect()[1].text
    assert out[2].n_removed == 0
    assert set(out) == {1, 2}  # eval docs are not rewritten


def _ref_remove_spans(rows, L):
    counts = {}
    for _i, t in rows:
        ws = t.split(" ")
        for s in range(len(ws) - L + 1):
            k = " ".join(ws[s : s + L])
            counts[k] = counts.get(k, 0) + 1
    out = {}
    for i, t in rows:
        ws = t.split(" ")
        covered = [False] * len(ws)
        for s in range(len(ws) - L + 1):
            if counts[" ".join(ws[s : s + L])] > 1:
                for p in range(s, s + L):
                    covered[p] = True
        kept = [w for w, c in zip(ws, covered) if not c]
        out[i] = (len(ws), len(kept), len(ws) - len(kept), " ".join(kept))
    return out


def test_remove_repeated_spans_random_batch_matches_reference(spark):
    """One Spark job over a seeded random batch (tiny vocabulary forces
    organic span collisions) vs a pure-Python third-way reference —
    independent of both the Spark expressions and the DuckDB twin."""
    import random

    rng = random.Random(8)
    rows = [
        (i, " ".join(rng.choice("abc") for _ in range(rng.randint(1, 12))))
        for i in range(60)
    ]
    got = {
        r.doc_id: (r.n_tok, r.n_kept, r.n_removed, r.kept_text)
        for r in corpus.remove_repeated_spans(
            _docs(spark, rows), span_tokens=4
        ).collect()
    }
    assert got == _ref_remove_spans(rows, 4)


def _ref_paragraph_dedup(rows, K):
    seen = {}
    order = []
    for i, t in rows:
        ws = t.split(" ")
        paras = [
            " ".join(ws[s * K : s * K + K]) for s in range((len(ws) - 1) // K + 1)
        ]
        for idx, p in enumerate(paras):
            key = p.strip().lower()
            if key not in seen:
                seen[key] = (i, idx)
            order.append((i, idx, p, key))
    out = {}
    for i, t in rows:
        ws = t.split(" ")
        n = (len(ws) - 1) // K + 1
        kept = [
            p
            for (d, idx, p, key) in order
            if d == i and seen[key] == (d, idx)
        ]
        out[i] = (n, len(kept), " ".join(kept))
    return out


def test_paragraph_dedup_random_batch_matches_reference(spark):
    import random

    rng = random.Random(9)
    rows = [
        (i, " ".join(rng.choice("ab") for _ in range(rng.randint(1, 9))))
        for i in range(50)
    ]
    got = {
        r.doc_id: (r.n_paras, r.n_kept, r.deduped_text)
        for r in corpus.paragraph_dedup_docs(
            _docs(spark, rows), para_tokens=2
        ).collect()
    }
    assert got == _ref_paragraph_dedup(rows, 2)
