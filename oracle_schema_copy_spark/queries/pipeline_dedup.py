"""LLM-pipeline queries: exact/near deduplication and corpus rewrite
(ExactSubstr span removal, paragraph dedup, decontamination, cleaning
capstone). Split out of queries/pipeline.py in round 9 (VERDICT r8 #8);
query names and implementations unchanged."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_schema_copy_spark.functions import text as tf
from oracle_schema_copy_spark.operators import dedup, multimodal, similarity
from oracle_schema_copy_spark.queries import query
from oracle_schema_copy_spark.sources.tables import load_table
from oracle_schema_copy_spark.queries._fragments import (
    _SQL_SHINGLES,
    _sql_h,
    _SQL_BUCKET,
    _SQL_JACCARD_PAIRS,
    _SQL_JACCARD_PAIRS_CAPPED,
    _sql_dot,
    _STOP_EN,
)



@query(
    "dedup_exact",
    "SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one surviving id per distinct text (digest-grouped —
    the shuffle carries a fixed-width hash, never the document body)."""
    return dedup.exact_dedup(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "dedup_normalized",
    """
    SELECT min(doc_id) AS doc_id FROM documents
    GROUP BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
    """,
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case/punctuation-insensitive dedup over normalized text."""
    return dedup.normalized_dedup(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "dedup_edit1_supplier_names",
    """
    SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
           CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
    FROM supplier a JOIN supplier b
      ON a.s_suppkey < b.s_suppkey
     AND abs(length(a.s_name) - length(b.s_name)) <= 1
    WHERE levenshtein(a.s_name, b.s_name) = 1
    """,
)
def q_dedup_edit1_supplier_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 entity-resolution self-join over supplier names via
    FastSS deletion-neighborhood signatures — typo-level matching, the
    string-edit shape none of the token/embedding dedup families cover.
    The signature filter is LOSSLESS for ed <= 1 (pytest-pinned against
    brute force), so the oracle is the brute-force levenshtein pair set —
    it cannot know the filter exists, which is the point (the
    prefix-filter convention). Supplier names share a long constant
    prefix, exactly the corpus shape where prefix/segment blocking
    degenerates into one hot bucket; deletion signatures keep buckets
    alphabet-bounded. Scale: len+1 signature rows per string, one
    (signature, id) shuffle, exact verification on candidates only."""
    sup = load_table(spark, sf_dir, "supplier")
    return dedup.edit1_pairs(sup, id_col="s_suppkey", name_col="s_name").select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "dist",
    )


@query(
    "text_repeated_spans",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    w AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 15),
                      s -> md5(array_to_string(t[s:s+15], ' ')))) AS h
        FROM toks WHERE len(t) >= 16),
    c AS (SELECT h, count(*) AS cnt FROM w GROUP BY h)
    SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans,
           round(CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS dup_fraction
    FROM w JOIN c USING (h)
    GROUP BY w.doc_id
    """,
)
def q_text_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication profile (Lee et al. 2022): fraction of
    each document's 16-token sliding windows whose hash recurs anywhere
    in the corpus. Window hashing is per-row expression work; the one
    shuffle carries fixed-width hashes, never text. The input a
    drop-duplicated-spans rewrite consumes."""
    from oracle_schema_copy_spark.operators import corpus

    return corpus.repeated_spans(
        load_table(spark, sf_dir, "documents"), span_tokens=16
    )


@query(
    "text_exactsubstr_removal",
    """
    WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
    w AS (
        SELECT doc_id, gs.s AS s, md5(array_to_string(t[gs.s:gs.s+15], ' ')) AS h
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 15)) AS s) gs
        WHERE len(t) >= 16),
    c AS (SELECT h FROM w GROUP BY h HAVING count(*) > 1),
    flag AS (SELECT w.doc_id, w.s FROM w JOIN c USING (h)),
    tp AS (SELECT doc_id, gs.p AS p, t[gs.p] AS tok
           FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS p) gs),
    keep AS (SELECT tp.doc_id, tp.p, tp.tok FROM tp
             WHERE NOT EXISTS (SELECT 1 FROM flag f
                               WHERE f.doc_id = tp.doc_id
                                 AND f.s <= tp.p AND tp.p < f.s + 16)),
    agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                   string_agg(tok, ' ' ORDER BY p) AS kept_text
            FROM keep GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
           CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(string_split(d.text, ' ')) - coalesce(a.n_kept, 0) AS BIGINT)
               AS n_removed,
           coalesce(a.kept_text, '') AS kept_text
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def q_text_exactsubstr_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span REMOVAL (Lee et al. 2022, the ExactSubstr
    rewrite stage): excise every 16-token window whose hash recurs
    anywhere in the corpus (both copies — the paper's conservative
    variant) and emit the rewritten corpus with overlapping flagged
    windows merged. Row-level gate at corpus cardinality: n_tok / n_kept
    / n_removed AND the rewritten text of every document are pinned.
    The fixture carries real cross-document duplicate spans (~1.7k dup
    windows at sf0.01), so the excision path fires, not just the
    passthrough. Scale: shuffles carry (id, hash) and (id, start) pairs
    only; the excision is per-row array arithmetic against a
    per-document flagged-starts array."""
    from oracle_schema_copy_spark.operators import corpus

    return corpus.remove_repeated_spans(
        load_table(spark, sf_dir, "documents"), span_tokens=16
    )


@query(
    "text_decontamination_removal",
    """
    WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
    w AS (
        SELECT doc_id, gs.s AS s, md5(array_to_string(t[gs.s:gs.s+15], ' ')) AS h
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 15)) AS s) gs
        WHERE len(t) >= 16),
    ev AS (SELECT DISTINCT h FROM w WHERE doc_id % 7 = 0),
    flag AS (SELECT w.doc_id, w.s FROM w JOIN ev USING (h) WHERE w.doc_id % 7 <> 0),
    tp AS (SELECT doc_id, gs.p AS p, t[gs.p] AS tok
           FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS p) gs
           WHERE doc_id % 7 <> 0),
    keep AS (SELECT tp.doc_id, tp.p, tp.tok FROM tp
             WHERE NOT EXISTS (SELECT 1 FROM flag f
                               WHERE f.doc_id = tp.doc_id
                                 AND f.s <= tp.p AND tp.p < f.s + 16)),
    agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                   string_agg(tok, ' ' ORDER BY p) AS kept_text
            FROM keep GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
           CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(string_split(d.text, ' ')) - coalesce(a.n_kept, 0) AS BIGINT)
               AS n_removed,
           coalesce(a.kept_text, '') AS kept_text
    FROM documents d LEFT JOIN agg a USING (doc_id)
    WHERE d.doc_id % 7 <> 0
    """,
)
def q_text_decontamination_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level benchmark DECONTAMINATION: excise from every TRAINING
    document exactly the 16-token windows that collide with the held-out
    eval slice's window-hash set (doc_id % 7 == 0 stands in for the
    benchmark; 538 flagged windows across 8 training docs at sf0.01,
    1951/49 at sf0.1 — the scrub path fires), keeping the remainder —
    the GPT-3/PaLM n-gram scrub, surgical where text_contamination's
    document-level screen is all-or-nothing. Row-level gate pins counts
    and rewritten text of every training document. Scale: the eval hash
    set is benchmark-sized and BROADCAST; the corpus never shuffles
    wider than (id, start)."""
    from oracle_schema_copy_spark.operators import corpus

    docs = load_table(spark, sf_dir, "documents")
    return corpus.remove_contaminated_spans(
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0),
        span_tokens=16,
    )


@query(
    "dedup_paragraph_reconstruct",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    p AS (SELECT doc_id, gs.s AS idx,
                 array_to_string(t[(gs.s*5+1):(gs.s*5+5)], ' ') AS para
          FROM toks,
               LATERAL (SELECT unnest(generate_series(0, (len(t)-1)//5)) AS s) gs),
    k AS (SELECT doc_id, idx, para, md5(trim(lower(para))) AS h FROM p),
    surv AS (SELECT doc_id, idx, para,
                    row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn
             FROM k),
    reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                   string_agg(para, ' ' ORDER BY idx) AS deduped_text
            FROM surv WHERE rn = 1 GROUP BY doc_id)
    SELECT d.doc_id,
           CAST((len(string_split(d.text, ' ')) - 1) // 5 + 1 AS BIGINT) AS n_paras,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
           coalesce(r.deduped_text, '') AS deduped_text
    FROM documents d LEFT JOIN reb r USING (doc_id)
    """,
)
def q_dedup_paragraph_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level dedup + document reconstruction (the CCNet /
    RefinedWeb pipeline shape): hash normalized paragraphs, keep only the
    corpus-wide first occurrence (deterministic keeper = smallest
    (doc_id, index)), rebuild every document from its surviving
    paragraphs in original order. The fixture's documents are single-line
    word streams, so a paragraph is a fixed 5-token chunk (320 duplicate
    paragraphs at sf0.01, 3.8k at sf0.1 — the drop/rebuild path fires);
    real corpora split on blank lines, and the machinery is
    delimiter-agnostic. Row-level gate: every document's reconstructed
    text is pinned. Scale: one explode + one per-hash argmin window
    (shuffle carries (hash, doc_id, idx) + the 5-token paragraph) + one
    ordered re-aggregate by document."""
    from oracle_schema_copy_spark.operators import corpus

    return corpus.paragraph_dedup_docs(
        load_table(spark, sf_dir, "documents"), para_tokens=5
    )


# Final keep rule of the cleaning capstone — mirrored into its SQL twin
# (kept in sync with _GOPHER_MIN_WORDS by tests/test_registry-style value
# equality below the Gopher constants; both are 25 by design).
_CLEAN_MIN_TOK = 25


@query(
    "curation_cleaning_capstone",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    p AS (SELECT doc_id, gs.s AS idx,
                 array_to_string(t[(gs.s*5+1):(gs.s*5+5)], ' ') AS para
          FROM toks,
               LATERAL (SELECT unnest(generate_series(0, (len(t)-1)//5)) AS s) gs),
    k AS (SELECT doc_id, idx, para, md5(trim(lower(para))) AS h FROM p),
    surv AS (SELECT doc_id, idx, para,
                    row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn
             FROM k),
    reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                   string_agg(para, ' ' ORDER BY idx) AS deduped_text
            FROM surv WHERE rn = 1 GROUP BY doc_id),
    t2 AS (SELECT doc_id, string_split(deduped_text, ' ') AS t FROM reb
           WHERE n_kept > 0),
    w2 AS (SELECT doc_id, gs.s AS s,
                  md5(array_to_string(t[gs.s:gs.s+15], ' ')) AS h
           FROM t2, LATERAL (SELECT unnest(generate_series(1, len(t) - 15)) AS s) gs
           WHERE len(t) >= 16),
    c2 AS (SELECT h FROM w2 GROUP BY h HAVING count(*) > 1),
    fl2 AS (SELECT w2.doc_id, w2.s FROM w2 JOIN c2 USING (h)),
    tp2 AS (SELECT doc_id, gs.p AS p, t[gs.p] AS tok
            FROM t2, LATERAL (SELECT unnest(generate_series(1, len(t))) AS p) gs),
    keep2 AS (SELECT tp2.doc_id, tp2.p, tp2.tok FROM tp2
              WHERE NOT EXISTS (SELECT 1 FROM fl2 f
                                WHERE f.doc_id = tp2.doc_id
                                  AND f.s <= tp2.p AND tp2.p < f.s + 16)),
    agg2 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fin,
                    string_agg(tok, ' ' ORDER BY p) AS fin_text
             FROM keep2 GROUP BY doc_id)
    SELECT d.doc_id, d.lang,
           CAST((len(string_split(d.text, ' ')) - 1) // 5 + 1 AS BIGINT) AS n_paras,
           CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_paras_kept,
           CAST(CASE WHEN coalesce(reb.n_kept, 0) > 0
                THEN len(string_split(reb.deduped_text, ' ')) ELSE 0 END
                AS BIGINT) AS n_tok_rebuilt,
           CAST(coalesce(a.n_fin, 0) AS BIGINT) AS n_tok_final,
           coalesce(a.fin_text, '') AS final_text,
           coalesce(a.n_fin, 0) >= {_CLEAN_MIN_TOK} AS kept
    FROM documents d
    LEFT JOIN reb USING (doc_id)
    LEFT JOIN agg2 a USING (doc_id)
    """,
)
def q_curation_cleaning_capstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus CLEANING pipeline capstone — the RefinedWeb /
    SlimPajama shape, composing the round-8 rewrite stages in their
    production order: (1) corpus-wide paragraph dedup with first-
    occurrence keeper and document reconstruction, (2) ExactSubstr
    duplicated-span excision over the REBUILT corpus (recurrence is
    recomputed post-dedup — stage 1 already removed whole-paragraph
    recurrences, stage 2 catches the cross-paragraph remainder),
    (3) a Gopher-style minimum-length keep rule (>= _CLEAN_MIN_TOK
    surviving tokens) on the final text. One row per input document with
    per-stage counts and the final rewritten text — row-level gate over
    the entire three-stage composition; the oracle chains the same CTE
    pipelines verbatim.

    Scale: stage shuffles carry (hash, doc_id, idx) / (id, hash) /
    (id, start) — text bodies ride only inside their own document's
    row; the keep rule is per-row arithmetic."""
    from oracle_schema_copy_spark.operators import corpus

    docs = load_table(spark, sf_dir, "documents")
    reb = corpus.paragraph_dedup_docs(docs, para_tokens=5)
    reb2 = reb.filter(F.col("n_kept") > 0).select(
        "doc_id", F.col("deduped_text").alias("text")
    )
    sc = corpus.remove_repeated_spans(reb2, span_tokens=16)
    return (
        docs.select("doc_id", "lang")
        .join(
            reb.select(
                "doc_id",
                F.col("n_paras").cast("long").alias("n_paras"),
                F.col("n_kept").cast("long").alias("n_paras_kept"),
            ),
            "doc_id",
        )
        .join(
            sc.select(
                "doc_id",
                F.col("n_tok").cast("long").alias("n_tok_rebuilt"),
                F.col("n_kept").cast("long").alias("n_tok_final"),
                F.col("kept_text").alias("final_text"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            "lang",
            "n_paras",
            "n_paras_kept",
            F.coalesce(F.col("n_tok_rebuilt"), F.lit(0))
            .cast("long")
            .alias("n_tok_rebuilt"),
            F.coalesce(F.col("n_tok_final"), F.lit(0))
            .cast("long")
            .alias("n_tok_final"),
            F.coalesce(F.col("final_text"), F.lit("")).alias("final_text"),
            (F.coalesce(F.col("n_tok_final"), F.lit(0)) >= _CLEAN_MIN_TOK).alias(
                "kept"
            ),
        )
    )


# Twin of prefix_filter_jaccard_pairs: the prefix filter is LOSSLESS, so
# the oracle is simply the brute-force exact-Jaccard pair set at t=0.3 —
# the oracle literally cannot know the filter exists, which is the point.
_SQL_JACCARD_PAIRS_T03 = f"""
    WITH {_SQL_SHINGLES},
    ex AS (SELECT doc_id, unnest(ss) AS s FROM sh),
    sizes AS (SELECT doc_id, len(ss) AS n_sh FROM sh WHERE len(ss) > 0),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_common
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.3
"""


@query("dedup_jaccard_prefix_filter", _SQL_JACCARD_PAIRS_T03)
def q_dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AllPairs/PPJoin prefix filtering: LOSSLESS candidate pruning that
    indexes only each doc's rarest (1-t)-fraction of shingles — the
    third, exact, scale path of the near-dup stack (vs the probabilistic
    LSH one). The oracle is the brute-force pair set: any lost candidate
    turns the row red."""
    return dedup.prefix_filter_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.3
    )


# Twin of incremental_jaccard_pairs: the SAME brute-force pair set as the
# prefix-filter oracle, restricted to pairs with a "new"-batch side
# (doc_id % 10 == 0 plays the new batch) — derived, not duplicated, so the
# two oracles cannot drift apart.
_SQL_JACCARD_INCREMENTAL = (
    _SQL_JACCARD_PAIRS_T03 + "      AND (id_a % 10 = 0 OR id_b % 10 = 0)\n"
)


@query("dedup_jaccard_incremental", _SQL_JACCARD_INCREMENTAL)
def q_dedup_jaccard_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: pairs touching the new batch only (new-new
    and new-old, never old-old) by probing the new docs' prefixes against
    the corpus prefix index — the daily-increment scale path, candidate
    cost O(|new| x posting), not corpus-quadratic. The oracle is the
    brute-force pair set filtered to new-sided pairs, so a missed
    cross-batch duplicate turns the row red."""
    return dedup.incremental_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        F.col("doc_id") % 10 == 0,
        n=3,
        threshold=0.3,
    )


@query("dedup_ngram_jaccard", _SQL_JACCARD_PAIRS_CAPPED, headline=True)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs: 3-word-shingle Jaccard >= 0.2 via explode +
    shingle-key self-join (the verifier stage of the near-dup stack)."""
    return dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.2
    )


def _minhash_sig_sql() -> str:
    cols = []
    for i, (a, b) in enumerate(dedup.MINHASH_PERMS):
        h = _sql_h("s", dedup.MINHASH_HEX_DIGITS)
        cols.append(
            f"list_min(list_transform(ss, s -> ({a} * {h} + {b}) % {dedup.MINHASH_P})) AS mh{i}"
        )
    return ",\n               ".join(cols)


@query(
    "dedup_minhash_lsh",
    f"""
    WITH {_SQL_SHINGLES},
    sig AS (
        SELECT doc_id, {_minhash_sig_sql()}
        FROM sh WHERE len(ss) > 0),
    buckets AS (
        SELECT doc_id, band,
               CASE band {' '.join(f'WHEN {b} THEN [mh{2*b}, mh{2*b+1}]' for b in range(8))} END AS key
        FROM sig, (SELECT unnest(generate_series(0, 7)) AS band)),
    bsz AS (SELECT band, key, count(*) AS c FROM buckets GROUP BY 1, 2),
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        JOIN bsz ON bsz.band = a.band AND bsz.key = a.key AND bsz.c <= 1000),
    exact AS ({_SQL_JACCARD_PAIRS})
    SELECT c.id_a, c.id_b, e.jaccard
    FROM cands c JOIN exact e ON e.id_a = c.id_a AND e.id_b = c.id_b
    """,
    headline=True,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pipeline: 16 md5-derived permutations, 8 bands
    x 2 rows, candidate pairs verified by exact shingle Jaccard >= 0.2.
    The scale path: signatures are one pass, the join touches only
    band-bucket collisions."""
    return dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=3, bands=8, threshold=0.2
    )


def _simhash_sql() -> str:
    h = _sql_h("s", 15)
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, x -> CASE WHEN (x >> {b}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(dedup.SIMHASH_BITS)
    )
    return f"""
    WITH {_SQL_SHINGLES},
    hashed AS (
        SELECT doc_id, list_transform(ss, s -> {h}) AS hs FROM sh WHERE len(ss) > 0),
    sig AS (SELECT doc_id, {bit_terms} AS simhash FROM hashed)
    """


_MINHASH_MERGE_SQL = (
    f"""
    WITH {_SQL_SHINGLES},
    sig AS (
        SELECT doc_id, {_minhash_sig_sql()}
        FROM sh WHERE len(ss) > 0)
    SELECT d.source,
    """
    + ",\n           ".join(
        f"CAST(min(mh{i}) AS BIGINT) AS mh{i}" for i in range(16)
    )
    + """,
           TRUE AS merged_equals_direct
    FROM sig JOIN documents d USING (doc_id)
    GROUP BY d.source
    """
)


@query("minhash_merge_contract", _MINHASH_MERGE_SQL)
def q_minhash_merge_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY contract — the property that makes MinHash
    distributable at 100 TB: signatures aggregated per source, then
    min-merged across sources, must equal the signature computed over
    the whole corpus in one pass (elementwise min is associative and
    commutative, so partial sketches combine exactly — same algebra HLL
    registers use). The gated rows are the per-source signatures (DuckDB
    recomputes them from the same md5-derived permutations) plus a
    BOOLEAN the Spark side computes by ACTUALLY merging: the oracle
    states TRUE, so any nonassociative drift turns the row red."""
    from functools import reduce

    docs = load_table(spark, sf_dir, "documents")
    # three consumers (per_src twice via merged, direct) — materialize the
    # signatures once instead of re-parsing the corpus per plan branch
    sigs = dedup.minhash_signatures(docs, "doc_id", "text").localCheckpoint()
    per_src = (
        sigs.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            *[F.min(f"mh{i}").cast("bigint").alias(f"mh{i}") for i in range(16)]
        )
    )
    merged = per_src.agg(*[F.min(f"mh{i}").alias(f"__m{i}") for i in range(16)])
    direct = sigs.agg(*[F.min(f"mh{i}").alias(f"__d{i}") for i in range(16)])
    eq = (
        merged.join(F.broadcast(direct))
        .select(
            reduce(
                lambda a, b: a & b,
                [F.col(f"__m{i}") == F.col(f"__d{i}") for i in range(16)],
            ).alias("merged_equals_direct")
        )
    )
    return per_src.join(F.broadcast(eq))


@query(
    "dedup_simhash_signatures",
    _simhash_sql() + "SELECT doc_id, simhash FROM sig",
)
def q_dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit shingle SimHash per document (single-pass, no explode)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id", "text")


@query(
    "dedup_simhash_pairs",
    _simhash_sql()
    + """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with Hamming <= 3 via 4 banded 15-bit keys —
    exhaustive for distance <= 3 by pigeonhole (the oracle checks against
    the brute-force pair set)."""
    return dedup.simhash_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )


@query(
    "dedup_embedding_cosine",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_sql_dot('a.embedding', 'b.embedding')} AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_sql_dot('a.embedding', 'b.embedding')} >= 0.45
    """,
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (dot >= 0.45 on pre-normalized vectors);
    brute-force baseline — LSH-bucketed pruning is the scale path."""
    return dedup.embedding_cosine_pairs(
        load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=0.45
    )


@query(
    "dedup_components",
    f"""
    WITH RECURSIVE
    pairs AS ({_SQL_JACCARD_PAIRS_CAPPED}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs),
    reach AS (
        SELECT src AS id, src AS r FROM edges
        UNION
        SELECT src AS id, dst AS r FROM edges
        UNION
        SELECT reach.id, e.dst AS r
        FROM reach JOIN edges e ON reach.r = e.src)
    SELECT id AS doc_id, min(r) AS component
    FROM reach GROUP BY id
    """,
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the 3-gram Jaccard
    pair graph (component = min reachable doc id — the canonical survivor
    of each duplicate group). Spark side is iterative min-label
    propagation with lineage checkpoints; the oracle is a recursive-CTE
    transitive closure — two very different algorithms that must agree
    exactly."""
    pairs = dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.2
    )
    return dedup.near_dup_components(pairs)


@query(
    "dedup_components_star",
    f"""
    WITH RECURSIVE
    pairs AS ({_SQL_JACCARD_PAIRS_CAPPED}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs),
    reach AS (
        SELECT src AS id, src AS r FROM edges
        UNION
        SELECT src AS id, dst AS r FROM edges
        UNION
        SELECT reach.id, e.dst AS r
        FROM reach JOIN edges e ON reach.r = e.src)
    SELECT id AS doc_id, min(r) AS component
    FROM reach GROUP BY id
    """,
)
def q_dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering via alternating large-star/small-star — the
    O(log n)-round scale path for dedup_components (min-label propagation
    needs O(diameter) rounds). Same pair graph, same oracle, third
    independent algorithm (recursive CTE vs propagation vs star
    contraction) — all three must agree exactly."""
    pairs = dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.2
    )
    return dedup.near_dup_components_star(pairs)


def _banded_lsh_sql(bands: int = 8, max_bucket: int = 1000) -> str:
    """DuckDB twin of similarity.lsh_banded_candidates with the ADAPTIVE
    planes-per-band wired in: same md5-seeded hyperplane grid (plane
    (b, j) at index b * LSH_R_MAX + j — stable across r), same band/key
    packing, and the same integer count->r map as
    similarity.auto_planes_per_band (smallest r in [1, r_max] with
    (max_bucket // 4) * 2**r >= count(*) — pure-integer comparisons, so
    both engines derive the SAME r from the same parquet). Bits for slots
    j >= r are CASE-gated to 0; DuckDB evaluates CASE branches lazily, so
    unused plane dots are never computed. The sf1 scale audit motivated
    this: a fixed r=2 at 20k vectors put every one of the 32 buckets over
    max_bucket and the degenerate-bucket cap dropped 100% of signature
    rows — ANN returned zero candidates (SCALE_sf1.md, VERDICT r5 #1)."""
    r_max = similarity.LSH_R_MAX
    target = max(1, max_bucket // 4)
    planes = similarity.hyperplanes(bands * r_max, 64)

    def plane_dot(plane):
        # plane weights inlined as float literals (vectorized unrolled
        # arithmetic — no per-row array construction, no lambda)
        return " + ".join(
            f"(CAST(embedding[{i + 1}] AS DOUBLE) * {v:.1f})"
            for i, v in enumerate(plane)
        )

    keys = []
    for b in range(bands):
        terms = []
        for j in range(r_max):
            bit = (
                f"(CASE WHEN ({plane_dot(planes[b * r_max + j])}) > 0 "
                f"THEN {1 << j} ELSE 0 END)"
            )
            # slot 0 is always live (r >= 1); higher slots gate on prm.r
            terms.append(bit if j == 0 else f"(CASE WHEN {j} < prm.r THEN {bit} ELSE 0 END)")
        keys.append(f"({' + '.join(terms)}) AS k{b}")
    case = " ".join(f"WHEN {b} THEN k{b}" for b in range(bands))
    # sig/buckets MATERIALIZED: the downstream CTEs reference buckets up
    # to three times; without the hint DuckDB re-inlines (and re-computes
    # the full plane grid) per reference
    return f"""
    prm AS (
        SELECT coalesce(min(t.r), {r_max}) AS r
        FROM generate_series(1, {r_max}) AS t(r)
        WHERE {target} * (1 << t.r) >= (SELECT count(*) FROM embeddings)),
    sig AS MATERIALIZED (SELECT vec_id, {', '.join(keys)} FROM embeddings, prm),
    buckets AS MATERIALIZED (
        SELECT vec_id, band, CASE band {case} END AS key
        FROM sig, (SELECT unnest(generate_series(0, {bands - 1})) AS band)),
    vbsz AS (SELECT band, key, count(*) AS c FROM buckets GROUP BY 1, 2),
    cands AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
        JOIN vbsz ON vbsz.band = a.band AND vbsz.key = a.key AND vbsz.c <= {max_bucket})
    """


_LSH_R_BY_DIR: dict[str, int] = {}


def _auto_lsh_r(emb, sf_dir: str) -> int:
    """The Spark-side half of the wired count->r map: one count() job at
    query-build time (parquet row-group metadata count — cheap), then the
    integer rule auto_planes_per_band. MUST stay the mirror of the prm
    CTE in _banded_lsh_sql.

    Memoized per sf_dir (the embeddings corpus is a pure function of the
    fixture directory): a session that builds all four LSH queries runs
    ONE count job, not four (r6 VERDICT "what's wrong" #2 — the three
    redundant driver jobs were bench jitter). Asserted by a job-count
    test (tests/test_pipeline_queries.py::test_auto_lsh_r_memoized)."""
    if sf_dir not in _LSH_R_BY_DIR:
        _LSH_R_BY_DIR[sf_dir] = similarity.auto_planes_per_band(
            emb.count(), max_bucket=1000
        )
    return _LSH_R_BY_DIR[sf_dir]


@query(
    "dedup_embedding_lsh",
    f"""
    WITH {_banded_lsh_sql()}
    SELECT c.id_a, c.id_b, {_sql_dot('ea.embedding', 'eb.embedding')} AS cosine
    FROM cands c
    JOIN embeddings ea ON ea.vec_id = c.id_a
    JOIN embeddings eb ON eb.vec_id = c.id_b
    WHERE {_sql_dot('ea.embedding', 'eb.embedding')} >= 0.45
    """,
)
def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded hyperplane-LSH embedding dedup (8 bands, ADAPTIVE planes
    per band from the corpus count) with exact dot-product re-score on
    candidates only — the pruned scale path for dedup_embedding_cosine.
    The oracle mirrors the exact same plane grid, band packing, and
    integer count->r rule, so the candidate sets (and therefore the
    verified pairs) agree bit-for-bit at every scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_lsh_pairs(
        emb,
        "vec_id",
        "embedding",
        threshold=0.45,
        bands=8,
        planes_per_band=_auto_lsh_r(emb, sf_dir),
        plane_stride=similarity.LSH_R_MAX,
    )


