"""LLM-data-pipeline queries: dedup, similarity search, text analysis,
multimodal columns (documents / embeddings fixtures).

Several oracles are generated programmatically so the SQL uses the exact
same constants (MinHash permutations, SimHash bit weights, LSH hyperplane
literals) as the Spark operators — both sides derive hashes from md5, the
one hash function the two engines implement identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_schema_copy_spark.functions import text as tf
from oracle_schema_copy_spark.operators import dedup, multimodal, similarity
from oracle_schema_copy_spark.queries import query
from oracle_schema_copy_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect)
# ---------------------------------------------------------------------------

# distinct 3-word shingles of documents.text
_SQL_SHINGLES = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(
                    generate_series(1, len(t) - 2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    ELSE [] END AS ss
        FROM toks)
"""

# 28-bit md5 hash of a string s (matches functions.text.token_hash(s, 7))
def _sql_h(expr: str, digits: int = 7) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, {digits})) AS BIGINT)"


# deterministic md5 sampling ring (operators/sampling.py twin)
_SQL_BUCKET = (
    "CAST(('0x' || substr(md5({salt} || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 10000"
)

_SQL_JACCARD_PAIRS = f"""
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
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.2
"""

# Twin of ngram_jaccard_pairs INCLUDING its max_df posting cap (default
# 10000): shingles above the document-frequency cutoff contribute no
# pair counts. The uncapped fragment above mirrors the set-intersection
# verify used by minhash_lsh_pairs, which has no df cap. The cap never
# fires at test SFs (max df ~25) — mirroring it keeps the oracle exact at
# ANY scale, not just the gated ones.
_SQL_JACCARD_PAIRS_CAPPED = f"""
    WITH {_SQL_SHINGLES},
    ex AS (SELECT doc_id, unnest(ss) AS s FROM sh),
    sizes AS (SELECT doc_id, len(ss) AS n_sh FROM sh WHERE len(ss) > 0),
    keepsh AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 10000),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_common
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        JOIN keepsh k ON k.s = a.s
        GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.2
"""

# sequential-double dot product of two 64-dim float lists (bit-identical
# to functions.vectors.dot — verified empirically). Unrolled + chain, not
# a list_transform lambda: identical values (checked IS NOT DISTINCT FROM
# over the sf1 corpus), but DuckDB executes the unrolled arithmetic
# vectorized while the lambda form costs ~15s PER PLANE per 20k rows —
# the r6 sf1 pass died on exactly that.
def _sql_dot(a: str, b: str, dim: int = 64) -> str:
    return (
        "("
        + " + ".join(
            f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))"
            for i in range(1, dim + 1)
        )
        + ")"
    )


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------


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


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "similarity_topk_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {_sql_dot('e.embedding', 'q.qv')} AS score
        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
    ranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored)
    SELECT * FROM ranked WHERE rank <= 10
    """,
    headline=True,
)
def q_similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for 5 query vectors: broadcast query
    set, one corpus scan, window ranking."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


def _sql_int_dot(a: str, b: str, dim: int = 64) -> str:
    return (
        "("
        + " + ".join(f"({a}[{i}] * {b}[{i}])" for i in range(1, dim + 1))
        + ")"
    )


# SQ8 quantization chain, mirrored between engines: exact floor(x+0.5)
# rounding, per-vector scale frozen to BIGINT micro-units (see
# operators/similarity.py sq8_quantize).
_SQ8_CTES = """
    base AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
                   AS max_abs
        FROM embeddings),
    qz AS (
        SELECT vec_id, embedding,
               CAST(floor(max_abs * 1000000 + 0.5) AS BIGINT) AS su,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 127 / max_abs + 0.5)
                             AS BIGINT)) AS qv
        FROM base WHERE max_abs > 0)
"""


@query(
    "similarity_topk_sq8_rescore",
    f"""
    WITH {_SQ8_CTES},
    qs AS (SELECT vec_id AS query_id, qv AS qa FROM qz WHERE vec_id < 20),
    approx AS (
        SELECT qs.query_id, n.vec_id AS neighbor_id,
               {_sql_int_dot('n.qv', 'qs.qa')} * n.su AS approx_u
        FROM qz n CROSS JOIN qs WHERE n.vec_id <> qs.query_id),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY approx_u DESC, neighbor_id) AS r
            FROM approx) WHERE r <= 20),
    rer AS (
        SELECT s.query_id, s.neighbor_id,
               {_sql_dot('ne.embedding', 'qe.embedding')} AS score
        FROM short s
        JOIN embeddings qe ON qe.vec_id = s.query_id
        JOIN embeddings ne ON ne.vec_id = s.neighbor_id)
    SELECT * FROM (
        SELECT query_id, neighbor_id, score,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, neighbor_id)
                   AS BIGINT) AS rank
        FROM rer) WHERE rank <= 5
    """,
)
def q_similarity_topk_sq8_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantization ANN serving path — completes the
    quantized-serving triad next to pure PQ-ADC and IVF-PQ + refine:
    rank by the exact-BIGINT surrogate int_dot(codes) * neighbor-scale
    (within one query's ranking the true dot is the surrogate times a
    per-query constant, so the quantized order is preserved with NO
    float anywhere), shortlist 20, exact re-rank of the shortlist
    against the raw vectors. At rest the codes are 4 bytes/dim smaller
    and the surrogate dot is integer SIMD; the raw corpus is touched
    only for shortlist rows. Every step mirrored in the twin (exact
    floor(x+0.5) rounding, micro-unit scale)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.sq8_rescore_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=5, shortlist_k=20
    )


@query(
    "sq8_recall_contract",
    f"""
    WITH {_SQ8_CTES},
    qs AS (SELECT vec_id AS query_id, qv AS qa FROM qz WHERE vec_id < 20),
    approx AS (
        SELECT qs.query_id, n.vec_id AS neighbor_id,
               {_sql_int_dot('n.qv', 'qs.qa')} * n.su AS approx_u
        FROM qz n CROSS JOIN qs WHERE n.vec_id <> qs.query_id),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY approx_u DESC, neighbor_id) AS r
            FROM approx) WHERE r <= 20),
    rer AS (
        SELECT s.query_id, s.neighbor_id,
               {_sql_dot('ne.embedding', 'qe.embedding')} AS score
        FROM short s
        JOIN embeddings qe ON qe.vec_id = s.query_id
        JOIN embeddings ne ON ne.vec_id = s.neighbor_id),
    sq AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY score DESC, neighbor_id)
                       AS rank
            FROM rer) WHERE rank <= 5),
    bq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
    bscored AS (
        SELECT bq.query_id, e.vec_id AS neighbor_id,
               {_sql_dot('e.embedding', 'bq.qv')} AS score
        FROM embeddings e CROSS JOIN bq WHERE e.vec_id <> bq.query_id),
    brute AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
            FROM bscored) WHERE rank <= 5)
    SELECT b.query_id,
           CAST(count(l.neighbor_id) AS BIGINT) AS n_hits,
           CAST(count(l.neighbor_id) AS DOUBLE) / 5 AS recall_at_5
    FROM brute b LEFT JOIN sq l
      ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    """,
)
def q_sq8_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the SQ8 + exact-rescore path against brute force —
    completes the quality-contract family across all four ANN serving
    paths (LSH, IVF, IVF-PQ, now SQ8): an int8 rounding/scale regression
    that degrades the quantized shortlist turns this row red. SQ8 recall
    should sit near 1.0 (int8 is the gentlest quantizer; the shortlist
    is 4x the final k), and because both rankings are deterministic the
    recall itself is oracle-gated."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    sq = similarity.sq8_rescore_topk(emb, q, k=5, shortlist_k=20).select(
        "query_id", "neighbor_id", F.lit(1).alias("__hit")
    )
    brute = similarity.brute_force_topk(emb, q, k=5).select(
        "query_id", "neighbor_id"
    )
    return (
        brute.join(sq, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("__hit").cast("long").alias("n_hits"),
            (F.count("__hit").cast("double") / 5).alias("recall_at_5"),
        )
    )


@query(
    "similarity_topk_ivf_label",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label FROM embeddings WHERE vec_id < 20),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {_sql_dot('e.embedding', 'q.qv')} AS score
        FROM embeddings e JOIN q ON e.label = q.label AND e.vec_id <> q.query_id),
    ranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored)
    SELECT * FROM ranked WHERE rank <= 5
    """,
)
def q_similarity_topk_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: search only the query's coarse cell (label column as
    the quantizer) — at scale this is partition pruning on the cell id."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.label_partitioned_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)


# IVF coarse-quantizer CTE chain (train centroids -> route 20 queries to
# their top-2 cells -> exact-score cell members), shared by the
# similarity_topk_ivf_nprobe oracle and the ivf_recall_contract oracle.
_IVF_NPROBE_CTES = f"""cents AS (
        SELECT label, k - 1 AS pos,
               round(avg(CAST(embedding[k] AS DOUBLE)), 6) AS centroid
        FROM embeddings, unnest(generate_series(1, 64)) AS t(k)
        GROUP BY label, k),
    cvec AS (
        SELECT label, array_agg(centroid ORDER BY pos) AS cv
        FROM cents GROUP BY label),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
    qcell AS (
        SELECT query_id, qv, label,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY {_sql_dot('qv', 'cv')} DESC, label) AS pr
        FROM q CROSS JOIN cvec),
    probed AS (SELECT query_id, qv, label FROM qcell WHERE pr <= 2),
    scored AS (
        SELECT p.query_id, e.vec_id AS neighbor_id,
               {_sql_dot('e.embedding', 'p.qv')} AS score
        FROM embeddings e JOIN probed p
          ON e.label = p.label AND e.vec_id <> p.query_id)"""


@query(
    "similarity_topk_ivf_nprobe",
    f"""
    WITH {_IVF_NPROBE_CTES},
    ranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored)
    SELECT * FROM ranked WHERE rank <= 5
    """,
)
def q_similarity_topk_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF: train the coarse quantizer (per-label centroids), route
    each of 20 queries to its top-2 centroid cells, search only those
    cells — the recall/cost dial of production IVF indexes (nprobe=1 is
    similarity_topk_ivf_label). Centroids broadcast; the corpus joins the
    probe list on the cell id, which at scale is partition pruning."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.group_centroids(emb, group_col="label", vec_col="embedding")
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 20), cents, nprobe=2, k=5
    )


@query(
    "ivf_recall_contract",
    f"""
    WITH {_IVF_NPROBE_CTES},
    ivf AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
            FROM scored) WHERE rank <= 5),
    bq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
    bscored AS (
        SELECT bq.query_id, e.vec_id AS neighbor_id,
               {_sql_dot('e.embedding', 'bq.qv')} AS score
        FROM embeddings e CROSS JOIN bq WHERE e.vec_id <> bq.query_id),
    brute AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
            FROM bscored) WHERE rank <= 5)
    SELECT b.query_id,
           CAST(count(l.neighbor_id) AS BIGINT) AS n_hits,
           CAST(count(l.neighbor_id) AS DOUBLE) / 5 AS recall_at_5
    FROM brute b LEFT JOIN ivf l
      ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    """,
)
def q_ivf_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF nprobe=2 path against the exact brute-force
    top-5, per query — the same in-engine quality contract
    ann_recall_contract pins for banded LSH, now covering the OTHER
    pruned ANN family: a quantizer/routing regression (centroid rounding,
    cell tie-break, probe count) that silently degrades IVF recall turns
    this row red rather than just returning different-but-plausible
    neighbors. Both rankings are deterministic (exact re-score,
    neighbor-id tie-break), so recall itself is oracle-gated."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    cents = similarity.group_centroids(emb, group_col="label", vec_col="embedding")
    ivf = similarity.ivf_topk(emb, q, cents, nprobe=2, k=5).select(
        "query_id", "neighbor_id", F.lit(1).alias("__hit")
    )
    brute = similarity.brute_force_topk(emb, q, k=5).select(
        "query_id", "neighbor_id"
    )
    return (
        brute.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("__hit").cast("long").alias("n_hits"),
            (F.count("__hit").cast("double") / 5).alias("recall_at_5"),
        )
    )


# Sequential-double dot of a subspace slice against a codebook entry:
# DuckDB list_sum runs the same left-to-right float64 loop as the Spark
# unrolled sum (0.0 seed is IEEE-exact), so both engines agree bit-for-bit.
def _sql_subspace_dot(vec: str, cv: str, sub: int = 8) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {sub}), "
        f"j -> CAST({vec}[subspace * {sub} + j] AS DOUBLE) * CAST({cv}[j] AS DOUBLE)))"
    )


@query(
    "similarity_topk_pq_adc",
    f"""
    WITH cents AS (
        SELECT label, k - 1 AS pos,
               round(avg(CAST(embedding[k] AS DOUBLE)), 6) AS centroid
        FROM embeddings, unnest(generate_series(1, 64)) AS t(k)
        GROUP BY label, k),
    cb AS (
        SELECT CAST(pos // 8 AS BIGINT) AS subspace, label AS code,
               pos % 8 AS spos, centroid
        FROM cents),
    cbv AS (
        SELECT subspace, code, array_agg(centroid ORDER BY spos) AS cv
        FROM cb GROUP BY subspace, code),
    esc AS (
        SELECT e.vec_id, c.subspace, c.code,
               {_sql_subspace_dot('e.embedding', 'c.cv')} AS d
        FROM embeddings e CROSS JOIN cbv c),
    codes AS (
        SELECT vec_id, subspace, code FROM (
            SELECT vec_id, subspace, code,
                   row_number() OVER (
                       PARTITION BY vec_id, subspace ORDER BY d DESC, code) AS rk
            FROM esc) WHERE rk = 1),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
    lut AS (
        SELECT q.query_id, c.subspace, c.code,
               CAST(round({_sql_subspace_dot('q.qv', 'c.cv')} * 1000000) AS BIGINT) AS term
        FROM q CROSS JOIN cbv c),
    scored AS (
        SELECT l.query_id, cd.vec_id AS neighbor_id,
               CAST(sum(l.term) AS BIGINT) AS score_micro
        FROM codes cd JOIN lut l ON l.subspace = cd.subspace AND l.code = cd.code
        WHERE cd.vec_id <> l.query_id
        GROUP BY l.query_id, cd.vec_id)
    SELECT query_id, neighbor_id, score_micro, rank FROM (
        SELECT query_id, neighbor_id, score_micro,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY score_micro DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored) WHERE rank <= 5
    """,
)
def q_similarity_topk_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jegou et al. 2011): the corpus is
    PQ-encoded to 8 subspace codes per vector (codebooks = subspace
    slices of the rounded label centroids — the deterministic
    centroids-as-codebook seeding the IVF family uses), and each of the
    20 queries ranks the WHOLE corpus by asymmetric distance: one
    query x codebook lookup table, per-vector score = exact BIGINT sum of
    its 8 LUT terms in integer micro-units (order-independent, so Spark
    and DuckDB agree bit-for-bit with no float-summation tolerance).
    This is the memory-bound scale path the IVF/LSH queries don't cover:
    at 100 TB the scored corpus representation is 8 small ints per
    vector (~32x below the raw floats), vectors never move, LUT and
    codebook broadcast, and the per-(query, vector) sum combines
    map-side. Recall/precision tuning (more subspaces, residual
    codebooks, IVF-PQ composition) trades accuracy against the same
    plan shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    cbv = similarity.pq_codebooks(emb, group_col="label", vec_col="embedding")
    return similarity.pq_adc_topk(
        emb,
        emb.filter(F.col("vec_id") < 20),
        cbv,
        k=5,
        queries_are_corpus_subset=True,
    )


# Full IVF-PQ CTE chain (routing + codebooks + codes + LUT + ADC
# scores), shared by the similarity_topk_ivfpq oracle and the
# ivfpq_recall_contract oracle.
_IVFPQ_CTES = f"""{_IVF_NPROBE_CTES},
    cb AS (
        SELECT CAST(pos // 8 AS BIGINT) AS subspace, label AS code,
               pos % 8 AS spos, centroid
        FROM cents),
    cbv AS (
        SELECT subspace, code, array_agg(centroid ORDER BY spos) AS cv
        FROM cb GROUP BY subspace, code),
    esc AS (
        SELECT e.vec_id, c.subspace, c.code,
               {_sql_subspace_dot('e.embedding', 'c.cv')} AS d
        FROM embeddings e CROSS JOIN cbv c),
    codes AS (
        SELECT vec_id, subspace, code FROM (
            SELECT vec_id, subspace, code,
                   row_number() OVER (
                       PARTITION BY vec_id, subspace ORDER BY d DESC, code) AS rk
            FROM esc) WHERE rk = 1),
    lut AS (
        SELECT q.query_id, c.subspace, c.code,
               CAST(round({_sql_subspace_dot('q.qv', 'c.cv')} * 1000000) AS BIGINT) AS term
        FROM q CROSS JOIN cbv c),
    cand AS (
        SELECT p.query_id, e.vec_id
        FROM embeddings e JOIN probed p ON e.label = p.label
        WHERE e.vec_id <> p.query_id),
    pscored AS (
        SELECT ca.query_id, ca.vec_id AS neighbor_id,
               CAST(sum(l.term) AS BIGINT) AS score_micro
        FROM cand ca
        JOIN codes cd ON cd.vec_id = ca.vec_id
        JOIN lut l ON l.query_id = ca.query_id
                  AND l.subspace = cd.subspace AND l.code = cd.code
        GROUP BY ca.query_id, ca.vec_id)"""


@query(
    "similarity_topk_ivfpq",
    f"""
    WITH {_IVFPQ_CTES}
    SELECT query_id, neighbor_id, score_micro, rank FROM (
        SELECT query_id, neighbor_id, score_micro,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY score_micro DESC, neighbor_id) AS BIGINT) AS rank
        FROM pscored) WHERE rank <= 5
    """,
)
def q_similarity_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-5 — the production billion-vector index layout (FAISS
    IndexIVFPQ), composed from the two separately-gated primitives: IVF
    routing prunes each query's search set to its nprobe=2 cells, PQ/ADC
    scores the candidates from their 8 codebook codes in integer
    micro-units. The oracle reuses the IVF routing CTEs verbatim (the
    unused exact-score CTE is dead in this plan) plus the PQ code/LUT
    CTEs, so the composition is gated end-to-end exactly like each half.
    At 100 TB: probe list, codebook and LUT broadcast; with the corpus
    bucketed by cell the candidate join is partition pruning; scoring
    reads codes only — the raw vectors never leave storage."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.group_centroids(emb, group_col="label", vec_col="embedding")
    cbv = similarity.pq_codebooks(emb, group_col="label", vec_col="embedding")
    return similarity.ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") < 20),
        cents,
        cbv,
        nprobe=2,
        k=5,
        queries_are_corpus_subset=True,
    )


# ADC shortlist size for the two-stage rerank path (mirrored constant).
_IVFPQ_SHORTLIST = 50


@query(
    "similarity_topk_ivfpq_rerank",
    f"""
    WITH {_IVFPQ_CTES},
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score_micro DESC, neighbor_id) AS rk
            FROM pscored) WHERE rk <= {_IVFPQ_SHORTLIST}),
    rescored AS (
        SELECT s.query_id, s.neighbor_id,
               {_sql_dot('e.embedding', 'q.qv')} AS score
        FROM short s
        JOIN embeddings e ON e.vec_id = s.neighbor_id
        JOIN q ON q.query_id = s.query_id)
    SELECT query_id, neighbor_id, score, rank FROM (
        SELECT query_id, neighbor_id, score,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
        FROM rescored) WHERE rank <= 5
    """,
)
def q_similarity_topk_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage IVF-PQ: ADC shortlist (50 per query, codes only) +
    exact re-rank of the shortlist against raw vectors — the production
    serving pattern (FAISS refine) that restores recall to the routing
    ceiling while touching shortlist_k x |queries| vectors instead of
    the corpus. The quantization loss the ivfpq_recall_contract measures
    (0.30 routing ceiling -> 0.07 pure-ADC at sf0.01) is recovered by
    this plan: measured re-ranked recall@5 is 0.26 at sf0.01 — nearly
    the 0.30 ceiling, limited only by true neighbors that miss the
    shortlist. Oracle reuses the shared IVF-PQ CTE chain plus a two-CTE
    shortlist/rescore tail."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.group_centroids(emb, group_col="label", vec_col="embedding")
    cbv = similarity.pq_codebooks(emb, group_col="label", vec_col="embedding")
    return similarity.ivfpq_rerank_topk(
        emb,
        emb.filter(F.col("vec_id") < 20),
        cents,
        cbv,
        nprobe=2,
        shortlist_k=_IVFPQ_SHORTLIST,
        k=5,
        queries_are_corpus_subset=True,
    )


@query(
    "ivfpq_recall_contract",
    f"""
    WITH {_IVFPQ_CTES},
    pq AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score_micro DESC, neighbor_id) AS rank
            FROM pscored) WHERE rank <= 5),
    bq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
    bscored AS (
        SELECT bq.query_id, e.vec_id AS neighbor_id,
               {_sql_dot('e.embedding', 'bq.qv')} AS score
        FROM embeddings e CROSS JOIN bq WHERE e.vec_id <> bq.query_id),
    brute AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
            FROM bscored) WHERE rank <= 5)
    SELECT b.query_id,
           CAST(count(l.neighbor_id) AS BIGINT) AS n_hits,
           CAST(count(l.neighbor_id) AS DOUBLE) / 5 AS recall_at_5
    FROM brute b LEFT JOIN pq l
      ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    """,
)
def q_ivfpq_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the composed IVF-PQ path against the exact brute-force
    top-5 — completing the quality-contract triad (ann_recall_contract
    pins banded LSH, ivf_recall_contract pins IVF routing): this one also
    pins the PQ quantization loss on top of the routing loss, so a
    codebook/encode/LUT regression that silently degrades the composed
    index turns a correctness row red. Both rankings are deterministic
    (integer micro-unit ADC scores, neighbor-id tie-break), so the recall
    value itself is oracle-gated, not merely bounded. Measured
    decomposition at sf0.01: IVF routing alone caps recall at 0.30 (the
    ivf_recall_contract value — near-random synthetic embeddings cluster
    poorly), and the crude label-derived codebooks cut ADC ranking to
    0.07; on a real corpus the production remedy is an ADC shortlist +
    exact re-rank, whose exact-re-score stage is the already-gated
    brute_force_topk applied to the candidate set."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    cents = similarity.group_centroids(emb, group_col="label", vec_col="embedding")
    cbv = similarity.pq_codebooks(emb, group_col="label", vec_col="embedding")
    pq = similarity.ivfpq_topk(
        emb, q, cents, cbv, nprobe=2, k=5, queries_are_corpus_subset=True
    ).select("query_id", "neighbor_id", F.lit(1).alias("__hit"))
    brute = similarity.brute_force_topk(emb, q, k=5).select(
        "query_id", "neighbor_id"
    )
    return (
        brute.join(pq, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("__hit").cast("long").alias("n_hits"),
            (F.count("__hit").cast("double") / 5).alias("recall_at_5"),
        )
    )


@query(
    "similarity_topk_lsh_banded",
    f"""
    WITH {_banded_lsh_sql()},
    qb AS (SELECT vec_id AS query_id, band, key FROM buckets WHERE vec_id < 20),
    ok AS (SELECT band, key FROM buckets GROUP BY band, key HAVING count(*) <= 1000),
    cand AS (
        SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
        FROM buckets b JOIN ok USING (band, key)
        JOIN qb ON b.band = qb.band AND b.key = qb.key
         AND b.vec_id <> qb.query_id),
    scored AS (
        SELECT c.query_id, c.neighbor_id,
               {_sql_dot('n.embedding', 'q.embedding')} AS score
        FROM cand c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings n ON n.vec_id = c.neighbor_id),
    ranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored)
    SELECT * FROM ranked WHERE rank <= 5
    """,
    headline=True,
)
def q_similarity_topk_lsh_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 for 20 query vectors through banded-LSH buckets + exact
    re-score — the pruned scale path for similarity_topk_bruteforce. The
    oracle mirrors the same plane grid, band packing, candidate join
    and max_bucket cap, so ranks agree exactly. planes_per_band is now
    ADAPTIVE (auto_planes_per_band from the corpus count, mirrored by the
    prm CTE in the SQL twin): the sf1 audit showed a fixed test-scale r=2
    drops 100% of signature rows at 20k vectors (every bucket over cap)
    and returns zero candidates; the wired rule keeps expected bucket
    load at max_bucket/4 as the corpus grows."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_banded_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=5, bands=8,
        planes_per_band=_auto_lsh_r(emb, sf_dir), plane_stride=similarity.LSH_R_MAX,
        max_bucket=1000, queries_are_corpus_subset=True,
    )


# Hard-negative exclusion ceiling: the SAME threshold the embedding
# dedup pipeline flags near-duplicates at (dedup_embedding_lsh), so
# "negative" is defined consistently with "duplicate" across the engine.
_HARDNEG_MAX_SCORE = 0.45


@query(
    "mine_hard_negatives",
    f"""
    WITH {_banded_lsh_sql()},
    qb AS (SELECT vec_id AS query_id, band, key FROM buckets WHERE vec_id < 20),
    ok AS (SELECT band, key FROM buckets GROUP BY band, key HAVING count(*) <= 1000),
    cand AS (
        SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
        FROM buckets b JOIN ok USING (band, key)
        JOIN qb ON b.band = qb.band AND b.key = qb.key
         AND b.vec_id <> qb.query_id),
    scored AS (
        SELECT c.query_id, c.neighbor_id,
               {_sql_dot('n.embedding', 'q.embedding')} AS score
        FROM cand c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings n ON n.vec_id = c.neighbor_id
        WHERE n.label <> q.label),
    eligible AS (
        SELECT query_id, neighbor_id, score FROM scored
        WHERE score < {_HARDNEG_MAX_SCORE}),
    ranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
        FROM eligible)
    SELECT * FROM ranked WHERE rank <= 5
    """,
)
def q_mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR/SBERT
    curation step): per anchor, the top-5 MOST similar candidates that
    are (a) not near-duplicates — score below the embedding-dedup
    threshold 0.45, the engine's own definition of duplicate — and
    (b) not likely-positives — the anchor's own cluster label is
    excluded. Candidates come from the same adaptive banded-LSH buckets
    as the gated ANN queries (never all-pairs), exclusions apply BEFORE
    ranking (top-k among eligible), and at sf0.01 the label exclusion
    alone changes 13% of the unfiltered top-5 rows, so both knobs are
    demonstrably active. Scale: identical to similarity_topk_lsh_banded
    plus one broadcastable attribute join per side."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_banded_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=5, bands=8,
        planes_per_band=_auto_lsh_r(emb, sf_dir), plane_stride=similarity.LSH_R_MAX,
        max_bucket=1000, queries_are_corpus_subset=True,
        max_score=_HARDNEG_MAX_SCORE, exclude_same_col="label",
    )


@query(
    "similarity_topk_lsh_vectorized",
    f"""
    WITH {_banded_lsh_sql()},
    qb AS (SELECT vec_id AS query_id, band, key FROM buckets WHERE vec_id < 20),
    ok AS (SELECT band, key FROM buckets GROUP BY band, key HAVING count(*) <= 1000),
    cand AS (
        SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
        FROM buckets b JOIN ok USING (band, key)
        JOIN qb ON b.band = qb.band AND b.key = qb.key
         AND b.vec_id <> qb.query_id),
    scored AS (
        SELECT c.query_id, c.neighbor_id,
               round({_sql_dot('n.embedding', 'q.embedding')}, 6) AS score
        FROM cand c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings n ON n.vec_id = c.neighbor_id),
    ranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored)
    SELECT * FROM ranked WHERE rank <= 5
    """,
    headline=True,
)
def q_similarity_topk_lsh_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION-scorer twin of similarity_topk_lsh_banded: identical
    banded-LSH candidate generation (bit-exact buckets on both engines),
    but candidate scoring runs through ``dot_vectorized`` — Arrow-batched
    numpy, one ``einsum`` per batch instead of an interpreted per-row HOF
    loop. Scores are rounded to 6 decimals and ranked on the rounded
    value on BOTH sides, absorbing numpy's pairwise-vs-sequential
    last-ulp difference (|Δ| < 1e-12 ≪ 0.5e-6).

    Measured scorer-only comparison (400k 64-dim dots, one stage, sf0.1
    corpus × 200 queries, local[8]): HOF ``dot()`` 2.4-3.4s, Arrow
    ``dot_vectorized`` 1.1-1.2s steady — 2-3× here, Arrow-transfer-bound;
    the gap widens with vector width since einsum time is negligible. At
    THIS query's sf0.1 workload (20 queries, ~30k candidate dots) total
    runtime is fixed-job-overhead-bound, so the two bench entries sit
    within environment noise of each other — the scorer advantage is the
    per-dot number above, not the headline delta."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_banded_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=5, bands=8,
        planes_per_band=_auto_lsh_r(emb, sf_dir), plane_stride=similarity.LSH_R_MAX,
        max_bucket=1000, scorer="vectorized", queries_are_corpus_subset=True,
    )


@query(
    "ann_recall_contract",
    f"""
    WITH {_banded_lsh_sql()},
    qb AS (SELECT vec_id AS query_id, band, key FROM buckets WHERE vec_id < 20),
    ok AS (SELECT band, key FROM buckets GROUP BY band, key HAVING count(*) <= 1000),
    lcand AS (
        SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
        FROM buckets b JOIN ok USING (band, key)
        JOIN qb ON b.band = qb.band AND b.key = qb.key
         AND b.vec_id <> qb.query_id),
    lscored AS (
        SELECT c.query_id, c.neighbor_id,
               {_sql_dot('n.embedding', 'q.embedding')} AS score
        FROM lcand c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings n ON n.vec_id = c.neighbor_id),
    lsh AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
            FROM lscored) WHERE rank <= 5),
    bq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
    bscored AS (
        SELECT bq.query_id, e.vec_id AS neighbor_id,
               {_sql_dot('e.embedding', 'bq.qv')} AS score
        FROM embeddings e CROSS JOIN bq WHERE e.vec_id <> bq.query_id),
    brute AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
            FROM bscored) WHERE rank <= 5)
    SELECT b.query_id,
           CAST(count(l.neighbor_id) AS BIGINT) AS n_hits,
           CAST(count(l.neighbor_id) AS DOUBLE) / 5 AS recall_at_5
    FROM brute b LEFT JOIN lsh l
      ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    """,
)
def q_ann_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the ADAPTIVE banded-LSH ANN path against the exact
    brute-force top-5, per query — the quality contract every production
    ANN deployment monitors, computed IN-ENGINE: both rankings are
    deterministic (exact re-score, neighbor-id tie-break, the same wired
    r on both engines), so recall itself is deterministic and
    oracle-gated — a plane-grid or count->r regression that silently
    degrades ANN quality turns this row red, not just slow. Cost: the
    brute side is |queries| x corpus (broadcast cross-score — the
    documented baseline shape); the LSH side is candidates-only."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    lsh = similarity.lsh_banded_topk(
        emb, q, k=5, bands=8,
        planes_per_band=_auto_lsh_r(emb, sf_dir), plane_stride=similarity.LSH_R_MAX,
        max_bucket=1000, queries_are_corpus_subset=True,
    ).select("query_id", "neighbor_id", F.lit(1).alias("__hit"))
    brute = similarity.brute_force_topk(emb, q, k=5).select(
        "query_id", "neighbor_id"
    )
    return (
        brute.join(lsh, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("__hit").cast("long").alias("n_hits"),
            (F.count("__hit").cast("double") / 5).alias("recall_at_5"),
        )
    )


def _hyperplane_sql_literals(n_planes: int = 8, dim: int = 64) -> list[str]:
    planes = similarity.hyperplanes(n_planes, dim)
    return ["[" + ", ".join(f"{v:.1f}" for v in plane) + "]" for plane in planes]


@query(
    "similarity_lsh_bucket_histogram",
    f"""
    WITH b AS (
        SELECT vec_id,
               {' + '.join(f"(CASE WHEN {_sql_dot('embedding', _hyperplane_sql_literals()[p])} > 0 THEN {1 << p} ELSE 0 END)" for p in range(8))} AS bucket
        FROM embeddings)
    SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_vectors
    FROM b GROUP BY bucket
    """,
)
def q_similarity_lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing (8 fixed md5-seeded planes): the
    bucket histogram. Same-bucket vectors are the ANN candidate set; at
    scale the corpus is written bucketed by this column."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        similarity.lsh_bucket(emb, n_planes=8)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_STOP_EN = ", ".join(f"'{w}'" for w in tf.LANG_STOPWORDS["en"])


@query(
    "text_stats_quality",
    f"""
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
           len(list_filter(toks, x -> x IN ({_STOP_EN}))) / len(toks) AS stop_ratio,
           length(regexp_replace(text, '[a-zA-Z0-9\\s]+', '', 'g')) / length(text) AS punct_ratio,
           (least(length(text) / 500.0, 1.0) * 0.4
            + least(len(list_filter(toks, x -> x IN ({_STOP_EN}))) / len(toks) * 4, 1.0) * 0.4)
            + (1.0 - least(length(regexp_replace(text, '[a-zA-Z0-9\\s]+', '', 'g')) / length(text) * 5, 1.0)) * 0.2
             AS quality
    FROM t
    """,
)
def q_text_stats_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics + composite quality score (length,
    stopword mass, punctuation density) — all JVM-side expressions."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        tf.char_count(t).alias("n_chars"),
        tf.token_count(t).alias("n_tokens"),
        F.size(tf.bpe_ish_tokens(t)).cast("long").alias("n_bpe_tokens"),
        tf.stopword_ratio(t).alias("stop_ratio"),
        tf.punct_ratio(t).alias("punct_ratio"),
        tf.quality_score(t).alias("quality"),
    )


def _lang_scores_sql() -> str:
    parts = []
    for lang in sorted(tf.LANG_STOPWORDS):
        words = ", ".join(f"'{w}'" for w in tf.LANG_STOPWORDS[lang])
        parts.append(f"len(list_intersect(toks, [{words}])) AS s_{lang}")
    return ", ".join(parts)


@query(
    "text_lang_id",
    f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    scores AS (SELECT doc_id, lang, {_lang_scores_sql()} FROM t)
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) > 0 THEN
               CASE WHEN s_fr > greatest(s_de, s_en, s_es) THEN 'fr'
                    WHEN s_es > greatest(s_de, s_en) THEN 'es'
                    WHEN s_en > s_de THEN 'en'
                    ELSE 'de' END
           ELSE 'und' END AS pred_lang
    FROM scores
    """,
)
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID (distinct-stopword hits per language,
    alphabetical tie-break, 'und' when nothing matches)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        tf.lang_id(F.col("text")).alias("pred_lang"),
    )


@query(
    "text_token_histogram",
    """
    SELECT tok, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok ORDER BY n DESC, tok LIMIT 20
    """,
)
def q_text_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token histogram (explode -> partial-agg -> top-20)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tf.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
    )


@query(
    "text_fingerprint",
    f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(text, ' '), s -> {_sql_h('s', 8)})),
               (acc, x) -> (acc * 31 + x) % {tf.MOD}) AS fingerprint
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial hash over token hashes — an order-sensitive
    document fingerprint (reordered tokens change it; dedup hashes don't)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", tf.fingerprint(F.col("text")).alias("fingerprint"))


@query(
    "text_repetition_ratio",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    raw AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 3 THEN list_transform(
                    generate_series(1, len(t) - 2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                    ELSE [] END AS allsh
        FROM toks)
    SELECT doc_id,
           CAST(len(allsh) AS BIGINT) AS n_shingles,
           CAST(len(list_distinct(allsh)) AS BIGINT) AS n_distinct,
           CASE WHEN len(allsh) > 0
                THEN 1.0 - CAST(len(list_distinct(allsh)) AS DOUBLE) / len(allsh)
                ELSE 0.0 END AS repetition
    FROM raw
    """,
)
def q_text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-3-gram fraction per document (boilerplate/loop detector) —
    pure per-row array math, no explode, no shuffle. The shingle stream
    appears in several output expressions; runtime subexpression
    elimination (SubExprEvaluationRuntime, on by default) evaluates it
    once per row — measured 0.26s for the whole query at sf0.1."""
    docs = load_table(spark, sf_dir, "documents")
    stream = tf.shingle_stream(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(stream).cast("long").alias("n_shingles"),
        F.size(F.array_distinct(stream)).cast("long").alias("n_distinct"),
        tf.repetition_ratio(F.col("text")).alias("repetition"),
    )


@query(
    "text_tfidf_top_terms",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
    dfr AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS nd FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(CAST(nd AS DOUBLE) / CAST(dfr.df AS DOUBLE)), 6) AS tfidf
        FROM tf JOIN dfr USING (term) CROSS JOIN n),
    ranked AS (
        SELECT doc_id, term, tfidf,
               CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rank
        FROM scored)
    SELECT * FROM ranked WHERE rank <= 3
    """,
)
def q_text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf keywords per document (tf * ln(N/df), 6-dp rounded,
    term tie-break) — corpus-level keyword extraction: one explode, two
    map-side-combined aggregations, broadcast df join, rank window."""
    from oracle_schema_copy_spark.operators import corpus

    return corpus.tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


@query(
    "text_oov_rate",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    vocab AS (
        SELECT term FROM (
            SELECT term, count(*) AS n FROM tok GROUP BY 1
            ORDER BY n DESC, term LIMIT 10)),
    tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM tok GROUP BY 1),
    oov AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_oov
        FROM tok ANTI JOIN vocab USING (term) GROUP BY 1)
    SELECT d.doc_id,
           COALESCE(t.n_tokens, 0) AS n_tokens,
           COALESCE(o.n_oov, 0) AS n_oov,
           CASE WHEN COALESCE(t.n_tokens, 0) > 0
                THEN CAST(COALESCE(o.n_oov, 0) AS DOUBLE) / t.n_tokens
                ELSE 0.0 END AS oov_rate
    FROM documents d
    LEFT JOIN tot t USING (doc_id)
    LEFT JOIN oov o USING (doc_id)
    """,
)
def q_text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage analysis: per-document OOV token count/rate
    against the corpus top-10 vocabulary (count-desc, term-asc ties — the
    fixture vocabulary is 31 words, so top-10 leaves real OOV mass).
    Exact-integer ratios; the vocabulary boundary is deterministic on
    both engines. The tokenizer-coverage question every training shard
    gets asked, as one broadcast anti-join."""
    from oracle_schema_copy_spark.operators import corpus

    docs = load_table(spark, sf_dir, "documents")
    return corpus.oov_rate(docs, corpus.top_vocabulary(docs, size=10))


_BM25_TERMS = ["hash", "scan", "filter"]

# every literal CAST to DOUBLE: bare 2.2 is DECIMAL in DuckDB and decimal
# arithmetic diverges from the double math Spark does
_SQL_BM25 = f"""
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    ftok AS (SELECT * FROM tok WHERE term IN ({', '.join(f"'{t}'" for t in _BM25_TERMS)})),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM ftok GROUP BY 1, 2),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM ftok GROUP BY 1),
    dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (SELECT count(*) AS n, sum(len(string_split(text, ' '))) AS sumdl
              FROM documents),
    sc AS (
        SELECT tf.doc_id, tf.term,
               ln(CAST(1.0 AS DOUBLE) + (n - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
               * (tf * CAST(2.2 AS DOUBLE))
               / (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
                  + CAST(0.75 AS DOUBLE) * dl / (CAST(sumdl AS DOUBLE) / n))) AS s
        FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
    pt AS (
        SELECT doc_id,
               {', '.join(f"max(CASE WHEN term = '{t}' THEN s END) AS s{i}" for i, t in enumerate(_BM25_TERMS))}
        FROM sc GROUP BY doc_id),
    bm AS (
        SELECT doc_id,
               round({' + '.join(f'COALESCE(s{i}, CAST(0.0 AS DOUBLE))' for i in range(len(_BM25_TERMS)))}, 6) AS bm25
        FROM pt)
"""


@query(
    "search_bm25_topk",
    f"WITH {_SQL_BM25} SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 10",
)
def q_search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword retrieval: BM25 top-10 for a 3-term query (Lucene idf
    form, k1=1.2 b=0.75) — integer tf/dl/df, fixed-order per-term sum,
    6-dp rounding; see operators/corpus.bm25_topk for the determinism
    engineering."""
    from oracle_schema_copy_spark.operators import corpus

    return corpus.bm25_topk(load_table(spark, sf_dir, "documents"), _BM25_TERMS, k=10)


@query(
    "search_hybrid_rrf",
    f"""
    WITH {_SQL_BM25},
    bmr AS (
        SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rb
        FROM bm ORDER BY bm25 DESC, doc_id LIMIT 50),
    qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
    cosr AS (
        SELECT vec_id, CAST(row_number() OVER (
            ORDER BY {_sql_dot('embedding', 'v')} DESC, vec_id) AS BIGINT) AS rc
        FROM embeddings CROSS JOIN qv
        ORDER BY {_sql_dot('embedding', 'v')} DESC, vec_id LIMIT 50)
    SELECT COALESCE(b.doc_id, c.vec_id) AS doc_id,
           (CASE WHEN b.rb IS NOT NULL THEN CAST(1.0 AS DOUBLE) / (60 + b.rb) ELSE CAST(0.0 AS DOUBLE) END)
           + (CASE WHEN c.rc IS NOT NULL THEN CAST(1.0 AS DOUBLE) / (60 + c.rc) ELSE CAST(0.0 AS DOUBLE) END) AS rrf
    FROM bmr b FULL OUTER JOIN cosr c ON b.doc_id = c.vec_id
    ORDER BY rrf DESC, doc_id LIMIT 10
    """,
)
def q_search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (k=60) of BM25 top-50 and
    embedding-cosine top-50 for one query (vec_id 0; the fixture's doc
    and vector id spaces align) — the lexical+semantic fusion every
    retrieval-based curation/dedup pipeline runs. Ranks are integers and
    the two 1/(60+r) terms add in fixed order, so the fused score is
    bit-identical to the SQL twin with no rounding at all."""
    from oracle_schema_copy_spark.functions.vectors import dot
    from oracle_schema_copy_spark.operators import corpus

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    bm = corpus.bm25_topk(docs, _BM25_TERMS, k=50)
    wb = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    bmr = bm.select("doc_id", F.row_number().over(wb).cast("long").alias("rb"))
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__qv"))
    scored = emb.crossJoin(F.broadcast(qv)).select(
        "vec_id", dot(F.col("embedding"), F.col("__qv")).alias("__cos")
    )
    # top-50 FIRST (distributed TakeOrdered), then rank the 50 survivors —
    # a global rank window over the whole corpus would single-partition it
    top50 = scored.orderBy(F.desc("__cos"), F.asc("vec_id")).limit(50)
    wc = Window.orderBy(F.desc("__cos"), F.asc("vec_id"))
    cosr = top50.select("vec_id", F.row_number().over(wc).cast("long").alias("rc"))
    fused = bmr.join(cosr, bmr["doc_id"] == cosr["vec_id"], "full_outer").select(
        F.coalesce(bmr["doc_id"], cosr["vec_id"]).alias("doc_id"),
        (
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rb")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rc")), F.lit(0.0))
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(10)


_SQL_MIX_RATES = """
    per AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
    mixr AS (
        SELECT source, n_docs, n_tokens,
               CAST(floor(10000 * CAST((SELECT min(n_tokens) FROM per) AS DOUBLE)
                          / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS rate_bp
        FROM per)
"""


# UniMax budget: 4/5 of the corpus token mass (mirrored formula). At the
# fixture's lang mix (~40% en, ~15% each of 4 others) this caps exactly
# the head language and grants the tail languages their full counts —
# both branches of the water-filling are active at every SF.
_UNIMAX_BUDGET_NUM, _UNIMAX_BUDGET_DEN = 4, 5


@query(
    "corpus_unimax_budgets",
    f"""
    WITH c AS (
        SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        FROM documents GROUP BY lang),
    tot AS (
        SELECT CAST(sum(n_tok) * {_UNIMAX_BUDGET_NUM} // {_UNIMAX_BUDGET_DEN}
                    AS BIGINT) AS budget,
               CAST(count(*) AS BIGINT) AS n_langs
        FROM c),
    o AS (
        SELECT lang, n_tok,
               CAST(row_number() OVER (ORDER BY n_tok, lang) AS BIGINT) AS j,
               CAST(sum(n_tok) OVER (ORDER BY n_tok, lang
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pfx
        FROM c),
    f AS (
        SELECT o.*, tot.budget, tot.n_langs,
               CASE WHEN pfx + (n_langs - j) * n_tok <= budget
                    THEN 1 ELSE 0 END AS feasible
        FROM o CROSS JOIN tot),
    lvl AS (
        SELECT CAST(coalesce(max(CASE WHEN feasible = 1 THEN j END), 0)
                    AS BIGINT) AS js,
               CAST(coalesce(max(CASE WHEN feasible = 1 THEN pfx END), 0)
                    AS BIGINT) AS pfx_js
        FROM f)
    SELECT f.lang, f.n_tok,
           CAST(CASE WHEN f.j <= lvl.js OR lvl.js = f.n_langs THEN f.n_tok
                ELSE least(f.n_tok,
                           (f.budget - lvl.pfx_js) // (f.n_langs - lvl.js))
                END AS BIGINT) AS alloc_tok,
           CASE WHEN f.j <= lvl.js OR lvl.js = f.n_langs THEN FALSE
                ELSE least(f.n_tok,
                           (f.budget - lvl.pfx_js) // (f.n_langs - lvl.js))
                     < f.n_tok END AS capped
    FROM f CROSS JOIN lvl
    """,
)
def q_corpus_unimax_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023): distribute
    a total token budget across languages by WATER-FILLING — every
    language below the water level keeps its full token count, the rest
    are capped at a common level so no head language starves the tail.
    The level is found in closed form with window functions: sort
    languages by token count, find the last sorted position js where
    granting everyone up to that count fits the budget
    (prefix + remaining_langs * count <= budget), then the level is the
    leftover budget floor-divided among the languages above js. All
    arithmetic is BIGINT (floor division, <= langs_left rounding slack
    documented), so both engines agree exactly. At the fixture mix the
    head language (en) is capped and every tail language runs free —
    both branches exercised at every SF. Scale: the per-lang count is
    the only corpus-sized aggregate; the water-filling itself runs on
    |languages| rows."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("n_tok")
    )
    tot = c.agg(
        F.expr(
            f"sum(n_tok) * {_UNIMAX_BUDGET_NUM} DIV {_UNIMAX_BUDGET_DEN}"
        )
        .cast("long")
        .alias("budget"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )
    w_ord = Window.orderBy("n_tok", "lang")
    o = c.select(
        "lang",
        "n_tok",
        F.row_number().over(w_ord).cast("long").alias("j"),
        F.sum("n_tok")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("pfx"),
    )
    f = o.crossJoin(F.broadcast(tot)).withColumn(
        "feasible",
        F.when(
            F.col("pfx") + (F.col("n_langs") - F.col("j")) * F.col("n_tok")
            <= F.col("budget"),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    lvl = f.agg(
        F.coalesce(
            F.max(F.when(F.col("feasible") == 1, F.col("j"))), F.lit(0)
        )
        .cast("long")
        .alias("js"),
        F.coalesce(
            F.max(F.when(F.col("feasible") == 1, F.col("pfx"))), F.lit(0)
        )
        .cast("long")
        .alias("pfx_js"),
    )
    j_full = (F.col("j") <= F.col("js")) | (F.col("js") == F.col("n_langs"))
    level = F.least(
        F.col("n_tok"),
        F.expr("(budget - pfx_js) DIV (n_langs - js)"),
    )
    return (
        f.crossJoin(F.broadcast(lvl))
        .select(
            "lang",
            "n_tok",
            F.when(j_full, F.col("n_tok"))
            .otherwise(level)
            .cast("long")
            .alias("alloc_tok"),
            F.when(j_full, F.lit(False))
            .otherwise(level < F.col("n_tok"))
            .alias("capped"),
        )
    )


@query(
    "corpus_mixture_rates",
    f"WITH {_SQL_MIX_RATES} SELECT * FROM mixr",
)
def q_corpus_mixture_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing rates: per-source doc/token mass and the basis-point
    sampling rate equalizing every source to the smallest one — the 'mix
    sources to a target ratio' computation, one aggregation shuffle."""
    from oracle_schema_copy_spark.operators import corpus

    return corpus.mixture_rates(load_table(spark, sf_dir, "documents"))


@query(
    "sample_mix_by_source",
    f"""
    WITH {_SQL_MIX_RATES}
    SELECT d.doc_id, d.source
    FROM documents d JOIN mixr USING (source)
    WHERE {_SQL_BUCKET.format(salt="'mix'")} < mixr.rate_bp
    """,
)
def q_sample_mix_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applied mixture: deterministic md5-ring downsampling of every
    source toward the smallest source's token mass (rates broadcast back;
    membership engine-independent — the reproducible 'remix the corpus'
    primitive)."""
    from oracle_schema_copy_spark.operators import corpus

    return corpus.sample_to_mixture(load_table(spark, sf_dir, "documents"))


# synthetic PII appended identically on both engines (the fixture corpus is
# a clean word stream, so redaction needs planted positives to prove itself)
_SQL_PII_AUG = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com"
    " call 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' acct 9' || lpad(CAST(doc_id AS VARCHAR), 9, '0')"
)


@query(
    "text_pii_redaction",
    f"""
    WITH aug AS (SELECT doc_id, {_SQL_PII_AUG} AS text FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '\\+?[0-9]{{3}}[- .][0-9]{{3}}[- .][0-9]{{4}}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text, '[0-9]{{9,}}')) AS BIGINT) AS n_id_number,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
               '\\+?[0-9]{{3}}[- .][0-9]{{3}}[- .][0-9]{{4}}', '[PHONE]', 'g'),
               '[0-9]{{9,}}', '[ID]', 'g')) AS redacted_md5
    FROM aug
    """,
)
def q_text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents with planted emails/phones/account numbers:
    per-category match counts plus a digest of the redacted text (the full
    redacted body stays distributed; only the md5 comes back)."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com call 555-123-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" acct 9"),
        F.lpad(F.col("doc_id").cast("string"), 9, "0"),
    )
    counts = tf.pii_counts(aug)
    return docs.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["id_number"].alias("n_id_number"),
        F.md5(tf.redact_pii(aug)).alias("redacted_md5"),
    )


@query(
    "text_contamination",
    f"""
    WITH {_SQL_SHINGLES},
    bench AS (SELECT DISTINCT unnest(ss) AS s FROM sh WHERE doc_id < 50),
    corp AS (SELECT doc_id, ss FROM sh WHERE doc_id >= 50 AND len(ss) > 0),
    ex AS (SELECT doc_id, unnest(ss) AS s FROM corp),
    hits AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_common
        FROM ex JOIN bench USING (s) GROUP BY doc_id)
    SELECT c.doc_id, CAST(len(c.ss) AS BIGINT) AS n_shingles, h.n_common,
           CAST(h.n_common AS DOUBLE) / len(c.ss) AS contamination
    FROM corp c JOIN hits h USING (doc_id)
    """,
    headline=True,
)
def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination scan: docs >= 50 checked for 3-gram overlap against
    the 'benchmark' docs < 50 (broadcast benchmark shingle set, corpus
    never shuffles text)."""
    from oracle_schema_copy_spark.operators import contamination

    docs = load_table(spark, sf_dir, "documents")
    return contamination.contamination_scores(
        docs.filter(F.col("doc_id") >= 50),
        docs.filter(F.col("doc_id") < 50),
        id_col="doc_id",
        text_col="text",
        n=3,
    )


@query(
    "pack_sequences_by_lang",
    """
    WITH t AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
    c AS (
        SELECT *,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM t)
    SELECT doc_id, lang, n_tokens,
           CAST(floor(cum_before / 512) AS BIGINT) AS pack_id,
           CAST(cum_before % 512 AS BIGINT) AS pack_offset,
           CAST(CASE WHEN cum_before % 512 + n_tokens > 512 THEN 1 ELSE 0 END
                AS BIGINT) AS straddles
    FROM c
    """,
    headline=True,
)
def q_pack_sequences_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop sequence packing into 512-token packs per language
    shard — one cumulative-sum window per shard, no iteration."""
    from oracle_schema_copy_spark.operators import packing

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", tf.token_count(F.col("text")).alias("n_tokens")
    )
    return packing.pack_sequences(
        t, id_col="doc_id", tokens_col="n_tokens", budget=512, part_col="lang"
    )


# ---------------------------------------------------------------------------
# Deterministic sampling / splits
# ---------------------------------------------------------------------------

@query(
    "sample_stratified_by_lang",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_SQL_BUCKET.format(salt="''")} <
          CASE lang WHEN 'en' THEN 2000 WHEN 'fr' THEN 10000
                    WHEN 'es' THEN 10000 WHEN 'de' THEN 10000 ELSE 0 END
    """,
)
def q_sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sampling: downsample the dominant language
    (en -> 20%), keep the rest whole — membership is a pure function of
    md5(doc_id), identical on any engine/partitioning (unlike sampleBy's
    per-partition RNG)."""
    from oracle_schema_copy_spark.operators import sampling

    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 2000, "fr": 10000, "es": 10000, "de": 10000}
    return sampling.stratified_hash_sample(docs, "doc_id", "lang", rates).select(
        "doc_id", "lang"
    )


@query(
    "train_val_test_split",
    f"""
    SELECT doc_id,
           CASE WHEN {_SQL_BUCKET.format(salt="'split'")} < 500 THEN 'val'
                WHEN {_SQL_BUCKET.format(salt="'split'")} < 1000 THEN 'test'
                ELSE 'train' END AS split
    FROM documents
    """,
)
def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test assignment by disjoint hash ranges of
    the doc id (5%/5%/90%) — stable under reprocessing and dedup."""
    from oracle_schema_copy_spark.operators import sampling

    docs = load_table(spark, sf_dir, "documents")
    return sampling.train_val_test_split(docs, "doc_id").select("doc_id", "split")


@query(
    "curation_pipeline",
    f"""
    WITH survivors AS (
        SELECT min(doc_id) AS doc_id FROM documents
        GROUP BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))),
    scored AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               (least(length(text) / 500.0, 1.0) * 0.4
                + least(len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_EN}))) / len(string_split(text, ' ')) * 4, 1.0) * 0.4)
                + (1.0 - least(length(regexp_replace(text, '[a-zA-Z0-9\\s]+', '', 'g')) / length(text) * 5, 1.0)) * 0.2 AS quality
        FROM documents)
    SELECT s.doc_id, s.lang, s.n_tokens, s.quality,
           CASE WHEN {_SQL_BUCKET.format(salt="'split'").replace('doc_id', 's.doc_id')} < 500 THEN 'val'
                WHEN {_SQL_BUCKET.format(salt="'split'").replace('doc_id', 's.doc_id')} < 1000 THEN 'test'
                ELSE 'train' END AS split
    FROM scored s JOIN survivors sv ON sv.doc_id = s.doc_id
    WHERE s.quality >= 0.5
    """,
    headline=True,
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation: normalized-dedup survivors, quality
    gate, token accounting, leakage-free split assignment — the composed
    training-data pipeline (dedup -> filter -> split) as one declarative
    plan: Catalyst fuses the per-row scoring into the scan, the only
    shuffle is the dedup groupBy, and the survivor semi-join stays
    broadcast-able."""
    from oracle_schema_copy_spark.operators import sampling

    docs = load_table(spark, sf_dir, "documents")
    survivors = dedup.normalized_dedup(docs, "doc_id", "text")
    t = F.col("text")
    scored = docs.select(
        "doc_id",
        "lang",
        tf.token_count(t).alias("n_tokens"),
        tf.quality_score(t).alias("quality"),
    )
    kept = (
        scored.join(survivors, "doc_id", "left_semi")
        .filter(F.col("quality") >= 0.5)
    )
    return sampling.train_val_test_split(kept, "doc_id")


# ---------------------------------------------------------------------------
# Multimodal columns
# ---------------------------------------------------------------------------


@query(
    "multimodal_binary_metadata",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           lower(sha256(text)) AS sha256,
           upper(hex(encode(substr(text, 1, 4)))) AS magic
    FROM documents
    """,
)
def q_multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata (byte length, digest, magic
    prefix) — the BLOB-analog columns flowing through the engine."""
    docs = multimodal.attach_binary(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("meta.byte_len").alias("byte_len"),
        F.lower(F.col("meta.sha256")).alias("sha256"),
        F.col("meta.magic").alias("magic"),
    )


@query(
    "multimodal_frame_sample",
    """
    WITH f AS (SELECT doc_id, CAST(floor(octet_length(encode(text)) / 10) AS INT) AS nf
               FROM documents)
    SELECT doc_id, CAST(u AS BIGINT) AS frame_idx, CAST(u * 10 AS BIGINT) AS byte_offset
    FROM (SELECT doc_id, unnest(generate_series(0, nf - 1, 5)) AS u FROM f WHERE nf > 0)
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: every 5th 10-byte frame as (idx, byte
    offset) rows — row explosion without byte duplication."""
    docs = multimodal.attach_binary(load_table(spark, sf_dir, "documents"))
    return multimodal.frame_offsets(docs, bytes_per_frame=10, stride=5)


@query(
    "multimodal_feature_extract",
    """
    WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents)
    SELECT doc_id,
           CAST(16 + CAST(('0x' || substr(hx, 1, 2)) AS INT) % 16 AS INT) AS width,
           CAST(16 + CAST(('0x' || substr(hx, 3, 2)) AS INT) % 16 AS INT) AS height,
           CAST(3 AS INT) AS n_channels,
           CAST(u AS INT) AS feat_pos,
           CAST(CAST(('0x' || substr(hx, 5 + 2 * u, 2)) AS INT) / 256.0 AS REAL) AS feat_value
    FROM h, (SELECT unnest(generate_series(0, 7)) AS u)
    """,
)
def q_multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched (mapInPandas) feature extraction over binary payloads
    with a deterministic stub decoder (codec libs absent — the schema /
    batching / partition plumbing is the production shape). The query
    posexplodes the feature vector to scalar rows so every value is
    driver-hashable; the oracle re-derives each feature byte from the
    sha256 hex digest (b/256 is exact in float32 on both engines)."""
    docs = multimodal.attach_binary(load_table(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(docs)
    return feats.select(
        "doc_id",
        "width",
        "height",
        "n_channels",
        F.posexplode("features").alias("feat_pos", "feat_value"),
    )


@query(
    "multimodal_resize_stub",
    """
    WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents)
    SELECT doc_id,
           CAST(16 + CAST(('0x' || substr(hx, 1, 2)) AS INT) % 16 AS INT) AS in_w,
           CAST(16 + CAST(('0x' || substr(hx, 3, 2)) AS INT) % 16 AS INT) AS in_h,
           CAST(8 AS INT) AS out_w,
           CAST(8 AS INT) AS out_h,
           CAST(8 AS DOUBLE) / (16 + CAST(('0x' || substr(hx, 1, 2)) AS INT) % 16) AS scale_x,
           CAST(8 AS DOUBLE) / (16 + CAST(('0x' || substr(hx, 3, 2)) AS INT) % 16) AS scale_y,
           md5(hx || '|8x8') AS thumb_md5
    FROM h
    """,
)
def q_multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail/resize over binary payloads (stub decoder, real
    mapInPandas Arrow plumbing): source dims, target dims, exact scale
    factors, and a deterministic thumbnail digest the oracle re-derives
    from the payload sha256 — completing the decode / feature-extract /
    resize / frame-sample multimodal quartet."""
    docs = multimodal.attach_binary(load_table(spark, sf_dir, "documents"))
    return multimodal.resize_stub(docs, out_w=8, out_h=8)


@query(
    "embedding_centroids_by_label",
    """
    SELECT label, CAST(k - 1 AS BIGINT) AS pos,
           round(avg(CAST(embedding[k] AS DOUBLE)), 6) AS centroid
    FROM embeddings, unnest(generate_series(1, 64)) AS t(k)
    GROUP BY label, k
    """,
)
def q_embedding_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors (the k-means/IVF coarse-quantizer step):
    posexplode + mean per (label, dimension) — the shuffle carries
    |labels| x 64 doubles regardless of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.group_centroids(emb, group_col="label", vec_col="embedding")


@query(
    "assign_nearest_centroid",
    f"""
    WITH cents AS (
        SELECT label, k - 1 AS pos,
               round(avg(CAST(embedding[k] AS DOUBLE)), 6) AS centroid
        FROM embeddings, unnest(generate_series(1, 64)) AS t(k)
        GROUP BY label, k),
    cvec AS (
        SELECT label, array_agg(centroid ORDER BY pos) AS cv
        FROM cents GROUP BY label),
    scored AS (
        SELECT e.vec_id, c.label AS assigned,
               {_sql_dot('e.embedding', 'c.cv')} AS d
        FROM embeddings e CROSS JOIN cvec c),
    ranked AS (
        SELECT vec_id, assigned, d,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d DESC, assigned) AS rk
        FROM scored)
    SELECT vec_id, assigned, round(d, 6) AS dot FROM ranked WHERE rk = 1
    """,
)
def q_assign_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantizer assignment: every vector routed to its max-dot label
    centroid (centroids from group_centroids, broadcast; one corpus
    scan + a per-vector rank window). With group_centroids this is one
    Lloyd/k-means iteration expressed declaratively."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.group_centroids(emb, group_col="label", vec_col="embedding")
    return similarity.assign_nearest_centroid(
        emb, cents, id_col="vec_id", vec_col="embedding", group_col="label"
    )


@query(
    "sample_weighted_topk",
    f"""
    WITH keyed AS (
        SELECT doc_id, lang, n_chars,
               round(pow(({_SQL_BUCKET.format(salt="'w'")} + 0.5) / 10000,
                         1.0 / CAST(n_chars AS DOUBLE)), 9) AS sample_key
        FROM documents WHERE n_chars > 0)
    SELECT doc_id, lang, n_chars, sample_key
    FROM keyed ORDER BY sample_key DESC, doc_id LIMIT 100
    """,
)
def q_sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES top-k on
    md5-derived uniforms, weight = document length): the 'mix sources by
    weight' curation primitive, reproducible on any engine/partitioning."""
    from oracle_schema_copy_spark.operators import sampling

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return sampling.weighted_hash_sample(docs, "doc_id", "n_chars", k=100)


@query(
    "dedup_fuzzy_name_pairs",
    """
    WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 200)
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS distance
    FROM c a JOIN c b
      ON substr(a.c_name, 1, 14) = substr(b.c_name, 1, 14)
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def q_dedup_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: candidate pairs share a 14-char name prefix
    (an EQUI-join — the blocking key that keeps the pair space linear at
    scale), verified by edit distance <= 1. Levenshtein is exact-integer
    on both engines, so the oracle needs no rounding."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select("c_custkey", "c_name", F.substring("c_name", 1, 14).alias("__blk"))
    )
    a = c.select(
        F.col("c_custkey").alias("id_a"), F.col("c_name").alias("__na"), "__blk"
    )
    b = c.select(
        F.col("c_custkey").alias("id_b"), F.col("c_name").alias("__nb"), "__blk"
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("__na", "__nb").cast("long"))
        .filter(F.col("distance") <= 1)
        .select("id_a", "id_b", "distance")
    )


# ---------------------------------------------------------------------------
# Graph analytics / corpus statistics (round-4 additions)
# ---------------------------------------------------------------------------

_PAGERANK_EDGES_SQL = """SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src,
               't:' || event_type AS dst FROM events
        UNION
        SELECT DISTINCT 't:' || event_type AS src,
               'u:' || CAST(user_id AS VARCHAR) AS dst FROM events"""


def _pagerank_oracle() -> str:
    from oracle_schema_copy_spark.operators import graph

    return (
        graph.pagerank_sql(_PAGERANK_EDGES_SQL, iterations=3)
        + "\n    SELECT node, rank FROM r3"
    )


@query("graph_pagerank_user_type", _pagerank_oracle())
def q_graph_pagerank_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the bipartite user <-> event-type
    graph — the iterative-algorithm shape (driver loop, one shuffle per
    iteration, localCheckpoint lineage cuts). Ranks are exact BIGINT
    micro-units (integer floor division everywhere), so the unrolled-CTE
    oracle matches bit-for-bit with no float tolerance."""
    from oracle_schema_copy_spark.operators import graph

    ev = load_table(spark, sf_dir, "events")
    ue = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    ).distinct()
    edges = ue.union(ue.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return graph.pagerank(edges, iterations=3)


@query(
    "text_bigram_counts",
    """
    WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
    bg AS (
        SELECT t[i] || ' ' || t[i + 1] AS bigram
        FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i))
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM bg GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
    """,
)
def q_text_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams — the n-gram language-model counting step.
    Bigrams are generated per row with a codegen'd transform over index
    sequences (no self-join); one explode, one map-side-combined count.
    The empty-guard matters: Spark's sequence(1, 0) DESCENDS, so short
    docs must map to an empty array explicitly."""
    docs = load_table(spark, sf_dir, "documents")
    bigrams = F.expr(
        "CASE WHEN size(split(text, ' ')) > 1 THEN "
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> concat(element_at(split(text, ' '), i), ' ', "
        "element_at(split(text, ' '), i + 1))) "
        "ELSE array() END"
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@query(
    "embedding_dim_stats",
    """
    SELECT CAST(pos AS BIGINT) AS dim,
           round(avg(CAST(c AS DOUBLE)), 6) AS mean,
           CAST(min(c) AS DOUBLE) AS lo,
           CAST(max(c) AS DOUBLE) AS hi,
           CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(embedding) AS c,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings)
    GROUP BY pos
    """,
)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (mean/min/max) — the feature-
    drift / normalization profile of an embedding column. posexplode then
    aggregate: the shuffle carries dim x 4 numbers per map partition
    (partial aggregation), never the vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("pos", "c"))
    return (
        ex.groupBy("pos")
        .agg(
            F.round(F.avg(F.col("c").cast("double")), 6).alias("mean"),
            F.min("c").cast("double").alias("lo"),
            F.max("c").cast("double").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .select((F.col("pos") + 1).cast("long").alias("dim"), "mean", "lo", "hi", "n")
    )


@query(
    "chunk_documents_overlap",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    ex AS (
        SELECT doc_id, len(t) AS n, s AS chunk_id,
               list_slice(t, s * 48 + 1, s * 48 + 64) AS toks
        FROM tok, unnest(generate_series(0, (len(t) - 1) // 48)) AS g(s))
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(toks) AS BIGINT) AS n_tok,
           md5(array_to_string(toks, ' ')) AS chunk_hash
    FROM ex
    WHERE chunk_id = 0 OR chunk_id * 48 + 16 < n
    """,
)
def q_chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks at stride 48 (16-token overlap) per document —
    the chunking step ahead of embedding/retrieval indexing. Pure per-row
    index arithmetic + one explode (no shuffle); pure-overlap tail
    windows are dropped on both sides. Chunk content is compared via md5
    of the re-joined tokens, the hash both engines share."""
    from oracle_schema_copy_spark.operators import corpus

    return corpus.chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    )


@query(
    "udtf_token_runs",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents),
    g AS (
        SELECT doc_id, token, pos,
               pos - row_number() OVER (
                   PARTITION BY doc_id, token ORDER BY pos) AS grp
        FROM tok)
    SELECT doc_id, token, CAST(min(pos) - 1 AS BIGINT) AS run_start,
           CAST(count(*) AS BIGINT) AS run_len
    FROM g
    GROUP BY doc_id, token, grp
    HAVING count(*) >= 2
    """,
)
def q_udtf_token_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4 ``@udtf`` + ``LATERAL``): maximal
    consecutive-repeat token runs per document, one emitted row per run —
    the last Spark-4 Python extension point without an oracle-gated query
    (r4 VERDICT §missing #4; Variant / recursive CTE / Python Data Source
    landed in r4). The UDTF is a single forward pass per row and is
    embarrassingly parallel; the SQL twin proves the semantics via the
    gaps-and-islands window trick. See functions/udtfs.py for the scale
    posture (UDTFs are the slow path, reserved for non-explodable logic)."""
    from oracle_schema_copy_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, r.token, r.run_start, r.run_len
        FROM __udtf_docs d, LATERAL token_runs(d.text) r
        """
    )


@query(
    "mad_outlier_flags",
    """
    WITH med AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
    dev AS (SELECT e.event_type, e.event_id, e.value,
                   abs(e.value - m.med) AS deviation
            FROM events e JOIN med m USING (event_type)),
    mad AS (SELECT event_type, median(deviation) AS mad FROM dev GROUP BY 1)
    SELECT d.event_type, CAST(d.event_id AS BIGINT) AS event_id, d.value,
           d.deviation,
           d.deviation > (CASE WHEN m.mad > 0 THEN 3.0 * m.mad ELSE 0.0 END)
               AS is_outlier
    FROM dev d JOIN mad m USING (event_type)
    """,
)
def q_mad_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier flags (|x - median| > 3 * MAD) via a
    grouped-map applyInPandas: ONE shuffle computes both order statistics
    and the flags numpy-side, where the SQL twin needs two aggregate+join
    rounds. Medians are order statistics — no float summation — so the
    two formulations agree bit-for-bit with no rounding."""
    from oracle_schema_copy_spark.operators import quality

    return quality.mad_outliers(load_table(spark, sf_dir, "events"))


def _bfs_oracle() -> str:
    from oracle_schema_copy_spark.operators import graph

    return graph.bfs_hops_sql(_PAGERANK_EDGES_SQL, "'u:0'", max_hops=4)


@query("graph_bfs_hops_user0", _bfs_oracle())
def q_graph_bfs_hops_user0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first hop counts from user 0 through the bipartite
    user <-> event-type graph — the iterative-traversal shape (frontier
    semi-join + visited anti-join per level, localCheckpoint lineage
    cuts). Hop levels are exact, so the unrolled-CTE oracle matches
    without tolerance."""
    from oracle_schema_copy_spark.operators import graph

    ev = load_table(spark, sf_dir, "events")
    ue = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    ).distinct()
    edges = ue.union(ue.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return graph.bfs_hops(edges, "u:0", max_hops=4)


@query(
    "text_unigram_logprob",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    freq AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY t),
    total AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM freq)
    SELECT tok.doc_id,
           CAST(count(*) AS BIGINT) AS n_tok,
           round(sum(ln(freq.n / total.tot)) / count(*), 6) AS avg_logprob
    FROM tok JOIN freq USING (t) CROSS JOIN total
    GROUP BY tok.doc_id
    """,
)
def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average unigram log-probability under the corpus's own
    unigram LM — the classic perplexity-proxy quality filter (gibberish
    and boilerplate-free rare-token soup score low). The frequency table
    is corpus-derived and broadcast; one explode + one broadcast join +
    one aggregation. Every token occurs at least once (the LM is fit on
    the same corpus), so no smoothing branch is needed."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tf.tokens(F.col("text"))).alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    total = freq.agg(F.sum("n").cast("double").alias("tot"))
    return (
        tok.join(F.broadcast(freq), "t")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.round(
                F.sum(F.log(F.col("n") / F.col("tot"))) / F.count(F.lit(1)), 6
            ).alias("avg_logprob"),
        )
    )


@query(
    "quality_perplexity_buckets",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    freq AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY t),
    total AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM freq),
    lpu AS (SELECT freq.t,
                   CAST(round(ln(freq.n / total.tot) * 1000000) AS BIGINT) AS lp_u
            FROM freq CROSS JOIN total),
    lp AS (
        SELECT tok.doc_id,
               CAST(count(*) AS BIGINT) AS n_tok,
               CAST(sum(lpu.lp_u) AS BIGINT) AS sum_u
        FROM tok JOIN lpu USING (t)
        GROUP BY tok.doc_id)
    SELECT d.doc_id, d.lang,
           round(lp.sum_u / 1000000.0 / lp.n_tok, 6) AS avg_logprob,
           CAST(ntile(3) OVER (
               PARTITION BY d.lang
               ORDER BY CAST(lp.sum_u AS DOUBLE) / lp.n_tok DESC, d.doc_id)
               AS INTEGER) AS ppl_bucket
    FROM documents d JOIN lp ON lp.doc_id = d.doc_id
    """,
)
def q_quality_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per
    LANGUAGE, rank every document by its LM quality score (the
    text_unigram_logprob perplexity proxy — higher avg logprob = more
    fluent) and cut the ranking into terciles; bucket 1 = head (kept for
    training), 2 = middle, 3 = tail (filtered or down-weighted). The
    per-language partition is what makes the filter fair across
    high/low-resource languages — a global cut would discard whole
    languages. Row-level gate at corpus cardinality: the bucket of EVERY
    document is pinned — the per-TOKEN log-prob is frozen to integer
    MICRO-UNITS first (the PQ/DSIR convention), so the per-document score
    is an exact BIGINT sum whose ordering cannot flip on float
    summation-order last-ulp differences (the ntile rank key is the
    deterministic double division of two exact integers, tie-broken by
    doc_id; Spark and DuckDB share the same first-buckets-get-extras
    ntile semantics).

    Scale: the LM table is corpus-derived and broadcast; one explode +
    broadcast join + per-doc aggregate, then one window over (lang)
    partitions — the only full shuffle carries (doc_id, lang, score)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tf.tokens(F.col("text"))).alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    total = freq.agg(F.sum("n").cast("double").alias("tot"))
    lpu = freq.join(F.broadcast(total)).select(
        "t",
        F.round(F.log(F.col("n") / F.col("tot")) * 1_000_000)
        .cast("long")
        .alias("lp_u"),
    )
    lp = (
        tok.join(F.broadcast(lpu), "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum("lp_u").cast("long").alias("sum_u"),
        )
    )
    rank_key = (F.col("sum_u").cast("double") / F.col("n_tok")).desc()
    w = Window.partitionBy("lang").orderBy(rank_key, "doc_id")
    return (
        docs.select("doc_id", "lang")
        .join(lp, "doc_id")
        .select(
            "doc_id",
            "lang",
            F.round(F.col("sum_u") / 1_000_000.0 / F.col("n_tok"), 6).alias(
                "avg_logprob"
            ),
            F.ntile(3).over(w).cast("int").alias("ppl_bucket"),
        )
    )


# Gopher-rule thresholds (Rae et al. 2021, Table A1 §A1.1), adapted to
# the synthetic corpus so every rule is ACTIVE (splits the fixture;
# probed at sf0.01: words 10-99, mean word length 3.7-5.3, max-word
# fraction 0.05-0.30, distinct stopwords 0-2). Real-corpus values noted
# inline. Mirrored constants — the SQL twin embeds the same numbers.
_GOPHER_MIN_WORDS = 25  # Gopher: 50
_GOPHER_MAX_WORDS = 90  # Gopher: 100_000
_GOPHER_MIN_MWL = 4  # Gopher: 3  (mean word length lower bound)
_GOPHER_MAX_MWL = 5  # Gopher: 10
_GOPHER_REP_DENOM = 8  # top word must be <= 1/8 of tokens (Gopher: top
# 2-gram <= 0.2; the fixture has no duplicate-line structure to test)
_GOPHER_MIN_STOPWORDS = 2  # Gopher: >= 2 of a fixed stop list
_GOPHER_STOPLIST = ("the", "a", "and", "of", "to", "in", "is")
_SQL_STOPLIST = ", ".join(f"'{w}'" for w in _GOPHER_STOPLIST)


@query(
    "quality_gopher_rules",
    f"""
    WITH w AS (
        SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents)
        GROUP BY doc_id, word),
    per AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_words,
               CAST(sum(c * length(word)) AS BIGINT) AS n_word_chars,
               CAST(max(c) AS BIGINT) AS max_word_count,
               CAST(count(DISTINCT CASE WHEN word IN ({_SQL_STOPLIST})
                                        THEN word END) AS BIGINT)
                   AS n_stop_distinct
        FROM w GROUP BY doc_id)
    SELECT doc_id, n_words,
           n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
               AS ok_word_count,
           n_word_chars >= {_GOPHER_MIN_MWL} * n_words
               AND n_word_chars <= {_GOPHER_MAX_MWL} * n_words
               AS ok_mean_word_len,
           {_GOPHER_REP_DENOM} * max_word_count <= n_words AS ok_repetition,
           n_stop_distinct >= {_GOPHER_MIN_STOPWORDS} AS ok_stopwords,
           (n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
               AND n_word_chars >= {_GOPHER_MIN_MWL} * n_words
               AND n_word_chars <= {_GOPHER_MAX_MWL} * n_words
               AND {_GOPHER_REP_DENOM} * max_word_count <= n_words
               AND n_stop_distinct >= {_GOPHER_MIN_STOPWORDS}
               AS pass_gopher
    FROM per
    """,
)
def q_quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality rules (Rae et al. 2021 §A1.1) as
    one relational pass: per-document word count bounds, mean-word-length
    band, single-word repetition cap, and minimum distinct-stopword
    presence, each emitted as a flag plus the conjunction — the standard
    pre-dedup curation screen. Every comparison is INTEGER cross-
    multiplied (mean word length never materialized as a float), so the
    gate is exact, not tolerance-dependent. Scale: one shuffle on
    (doc_id, word) with map-side combine, one on doc_id; no UDFs, no
    corpus re-scan per rule — the five rules share the same aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stop = F.col("word").isin(*_GOPHER_STOPLIST)
    per = w.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.sum(F.col("c") * F.length("word")).cast("long").alias("n_word_chars"),
        F.max("c").cast("long").alias("max_word_count"),
        F.count_distinct(F.when(stop, F.col("word")))
        .cast("long")
        .alias("n_stop_distinct"),
    )
    nw, nc = F.col("n_words"), F.col("n_word_chars")
    ok_wc = nw.between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
    ok_mwl = (nc >= _GOPHER_MIN_MWL * nw) & (nc <= _GOPHER_MAX_MWL * nw)
    ok_rep = _GOPHER_REP_DENOM * F.col("max_word_count") <= nw
    ok_stop = F.col("n_stop_distinct") >= _GOPHER_MIN_STOPWORDS
    return per.select(
        "doc_id",
        "n_words",
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_rep.alias("ok_repetition"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_mwl & ok_rep & ok_stop).alias("pass_gopher"),
    )


# DSIR feature space: hashed bigram buckets (Xie et al. 2023 use 10k
# buckets over hashed n-grams; 64 keeps the per-bucket counts dense on
# the 31-word fixture vocabulary). Mirrored constant.
_DSIR_BUCKETS = 64
_DSIR_TARGET_LANG = "en"


@query(
    "sample_dsir_importance",
    f"""
    WITH bg AS (
        SELECT doc_id, lang,
               {_sql_h("ws[i] || ' ' || ws[i+1]")} % {_DSIR_BUCKETS} AS b
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws
              FROM documents) t,
             unnest(generate_series(1, len(ws) - 1)) AS s(i)),
    doc_b AS (SELECT doc_id, lang, b, CAST(count(*) AS BIGINT) AS c
              FROM bg GROUP BY doc_id, lang, b),
    raw AS (SELECT b, CAST(count(*) AS BIGINT) AS c_raw FROM bg GROUP BY b),
    tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS c_tgt FROM bg
            WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b),
    tot AS (SELECT CAST(sum(c_raw) AS BIGINT) AS n_raw FROM raw),
    tott AS (SELECT CAST(coalesce(sum(c_tgt), 0) AS BIGINT) AS n_tgt FROM tgt),
    lr AS (
        SELECT raw.b,
               CAST(round((ln(CAST(coalesce(tgt.c_tgt, 0) + 1 AS DOUBLE)
                              / (tott.n_tgt + {_DSIR_BUCKETS}))
                         - ln(CAST(raw.c_raw + 1 AS DOUBLE)
                              / (tot.n_raw + {_DSIR_BUCKETS}))) * 1000000)
                    AS BIGINT) AS lr_u
        FROM raw LEFT JOIN tgt ON tgt.b = raw.b
        CROSS JOIN tot CROSS JOIN tott),
    wts AS (
        SELECT doc_b.doc_id, doc_b.lang,
               CAST(sum(doc_b.c) AS BIGINT) AS n_bigrams,
               CAST(sum(doc_b.c * lr.lr_u) AS BIGINT) AS dsir_logw_micro
        FROM doc_b JOIN lr ON lr.b = doc_b.b
        GROUP BY doc_b.doc_id, doc_b.lang)
    SELECT d.doc_id, d.lang,
           CAST(coalesce(w.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(w.dsir_logw_micro, 0) AS BIGINT) AS dsir_logw_micro,
           coalesce(w.dsir_logw_micro, 0) > 0 AS selected
    FROM documents d LEFT JOIN wts w ON w.doc_id = d.doc_id
    """,
)
def q_sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data-selection importance weights (Xie et al. 2023): score
    every document by how much its hashed-bigram profile leans toward a
    target distribution (here the 'en' slice standing in for the curated
    reference corpus) versus the raw corpus — log importance weight =
    sum over the doc's hashed-bigram buckets of
    count * (ln p_target(b) - ln p_raw(b)), add-one smoothed. The
    per-bucket log-ratio is frozen to integer MICRO-UNITS first, so the
    per-document sum is an exact BIGINT — no float summation-order
    tolerance between engines (the PQ/ADC micro-unit convention).
    selected = weight > 0 (more target-like than average). Scale: the
    bucket distributions aggregate to 64 rows and broadcast back; the
    corpus shuffles once on (doc_id, bucket) and once on doc_id — both
    with map-side combine; the estimator state (the bucket tables) is
    feature-space-sized, never corpus-sized."""
    docs = load_table(spark, sf_dir, "documents")
    bg = docs.select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("ws")
    ).select(
        "doc_id",
        "lang",
        F.explode(
            # size(ws) < 2 must yield ZERO bigrams: Spark's sequence()
            # auto-steps -1 when start > stop, so sequence(0, -1) would
            # emit [0, -1] and two NULL-bigram rows per 1-word doc; the
            # DuckDB twin's generate_series(1, len-1) is empty there.
            F.expr(
                "CASE WHEN size(ws) >= 2 THEN"
                " transform(sequence(0, size(ws) - 2),"
                " i -> concat(ws[i], ' ', ws[i+1]))"
                " ELSE array() END"
            )
        ).alias("bgram"),
    ).select(
        "doc_id",
        "lang",
        (tf.token_hash(F.col("bgram"), 7) % _DSIR_BUCKETS).alias("b"),
    )
    doc_b = bg.groupBy("doc_id", "lang", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    raw = bg.groupBy("b").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt = (
        bg.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c_tgt"))
    )
    tot = raw.agg(F.sum("c_raw").cast("long").alias("n_raw"))
    tott = tgt.agg(
        F.coalesce(F.sum("c_tgt"), F.lit(0)).cast("long").alias("n_tgt")
    )
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tott))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("c_tgt"), F.lit(0)) + 1).cast(
                            "double"
                        )
                        / (F.col("n_tgt") + _DSIR_BUCKETS)
                    )
                    - F.log(
                        (F.col("c_raw") + 1).cast("double")
                        / (F.col("n_raw") + _DSIR_BUCKETS)
                    )
                )
                * 1_000_000
            )
            .cast("long")
            .alias("lr_u"),
        )
    )
    wts = (
        doc_b.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("lr_u"))
            .cast("long")
            .alias("dsir_logw_micro"),
        )
    )
    return (
        docs.select("doc_id", "lang")
        .join(wts.drop("lang"), "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("long")
            .alias("n_bigrams"),
            F.coalesce(F.col("dsir_logw_micro"), F.lit(0))
            .cast("long")
            .alias("dsir_logw_micro"),
            (F.coalesce(F.col("dsir_logw_micro"), F.lit(0)) > 0).alias(
                "selected"
            ),
        )
    )


@query(
    "dedup_keep_best_per_cluster",
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
        FROM reach JOIN edges e ON reach.r = e.src),
    comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
    everyone AS (
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component, d.n_chars
        FROM documents d LEFT JOIN comp c USING (doc_id)),
    ranked AS (
        SELECT component, doc_id, n_chars,
               row_number() OVER (PARTITION BY component
                                  ORDER BY n_chars DESC, doc_id) AS rn,
               count(*) OVER (PARTITION BY component) AS nm
        FROM everyone)
    SELECT component, doc_id AS kept_doc, CAST(nm AS BIGINT) AS n_members
    FROM ranked WHERE rn = 1
    """,
)
def q_dedup_keep_best_per_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup endgame: near-dup clusters (connected components over the
    Jaccard pair graph) reduced to ONE survivor each — the longest member,
    ties to the smallest id; singleton docs survive as their own cluster.
    Composition of three operators (pair generation -> components ->
    windowed argmax) in one lineage; this is the row every curation
    pipeline actually keeps."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    comp = dedup.near_dup_components(pairs)
    everyone = docs.select("doc_id", "n_chars").join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        "n_chars",
    )
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    wc = Window.partitionBy("component")
    return (
        everyone.withColumn("rn", F.row_number().over(w))
        .withColumn("nm", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("kept_doc"),
            F.col("nm").cast("long").alias("n_members"),
        )
    )


@query(
    "embedding_int8_quantize_error",
    """
    WITH s AS (
        SELECT vec_id,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
                   AS max_abs
        FROM embeddings),
    q AS (
        SELECT e.vec_id, s.max_abs,
               list_sum(list_transform(e.embedding,
                   x -> abs(CAST(x AS DOUBLE)
                        - floor(CAST(x AS DOUBLE) * 127 / s.max_abs + 0.5)
                          * s.max_abs / 127))) AS err_sum
        FROM embeddings e JOIN s USING (vec_id)
        WHERE s.max_abs > 0)
    SELECT vec_id, round(max_abs, 6) AS max_abs,
           round(err_sum / 64, 8) AS mean_abs_err
    FROM q
    """,
)
def q_embedding_int8_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization profile: per-vector symmetric scale
    (max_abs/127), each component quantized with exact floor(x+0.5)
    rounding (identical on both engines, unlike round()'s half-up vs
    half-even ambiguity), and the mean absolute reconstruction error —
    the compression/recall dial every embedding store tunes. Per-row
    arithmetic only; no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = "CAST(x AS DOUBLE)"
    out = emb.selectExpr(
        "vec_id",
        f"array_max(transform(embedding, x -> abs({x}))) AS max_abs",
        f"""aggregate(transform(embedding,
            x -> abs({x} - floor({x} * 127 / array_max(transform(embedding, x -> abs({x}))) + 0.5D)
                 * array_max(transform(embedding, x -> abs({x}))) / 127)),
            0D, (acc, v) -> acc + v) AS err_sum""",
    ).filter("max_abs > 0")
    return out.selectExpr(
        "vec_id",
        "round(max_abs, 6) AS max_abs",
        "round(err_sum / 64, 8) AS mean_abs_err",
    )


@query(
    "dedup_rate_by_source",
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
        FROM reach JOIN edges e ON reach.r = e.src),
    comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
    marked AS (
        SELECT d.source,
               CASE WHEN c.doc_id IS NOT NULL AND c.component <> d.doc_id
                    THEN 1 ELSE 0 END AS is_dup
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_dup) AS BIGINT) AS n_dups,
           round(CAST(sum(is_dup) AS DOUBLE) / count(*), 6) AS dup_rate
    FROM marked GROUP BY source
    """,
)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication rate per crawl source — the curation metric that
    decides which source gets down-weighted: a doc counts as a duplicate
    when it belongs to a near-dup cluster and is not the cluster's
    canonical (min-id) survivor. Components join back to the document
    dimension; one aggregate per source."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    comp = dedup.near_dup_components(pairs)
    marked = docs.select("doc_id", "source").join(comp, "doc_id", "left").select(
        "source",
        F.when(
            F.col("component").isNotNull()
            & (F.col("component") != F.col("doc_id")),
            1,
        )
        .otherwise(0)
        .alias("is_dup"),
    )
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_dup").cast("long").alias("n_dups"),
        F.round(F.sum("is_dup").cast("double") / F.count(F.lit(1)), 6).alias(
            "dup_rate"
        ),
    )


@query(
    "split_by_dedup_cluster",
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
        FROM reach JOIN edges e ON reach.r = e.src),
    comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
    lab AS (SELECT d.doc_id,
                   CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS cluster
            FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
    SELECT doc_id, cluster,
           CASE WHEN CAST(('0x' || substr(md5('split'
                          || CAST(cluster AS VARCHAR)), 1, 7)) AS BIGINT)
                     % 10000 < 8000
                THEN 'train' ELSE 'test' END AS split
    FROM lab
    """,
)
def q_split_by_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/test split: hash-split on the NEAR-DUP CLUSTER
    key (connected component of the capped n-gram-Jaccard pair graph;
    singletons are their own cluster) instead of the document id, so two
    near-duplicate documents can never straddle the split — the leakage
    mode a plain per-id split (train_val_test_split) cannot prevent and a
    classic eval-contamination bug in LLM corpora ("dedup before you
    split"). Same md5-ring membership convention as every subset op;
    80/20. Row-level gate at corpus cardinality pins both the cluster
    assignment and the split label of every document.

    Scale: pair generation is the df-capped posting-list path, components
    are the gated min-label propagation (shallow boilerplate clusters),
    and the split itself is per-row hash arithmetic — no new shuffles
    beyond the already-gated pieces."""
    docs = load_table(spark, sf_dir, "documents")
    from oracle_schema_copy_spark.operators.sampling import hash_bucket

    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    comp = dedup.near_dup_components(pairs)
    lab = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id"))
            .cast("long")
            .alias("cluster"),
        )
    )
    return lab.select(
        "doc_id",
        "cluster",
        F.when(hash_bucket(F.col("cluster"), "split") < 8000, "train")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Graph analytics (round-5 additions)
# ---------------------------------------------------------------------------

_COPURCHASE_EDGES_SQL = """SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"""


def _triangle_oracle() -> str:
    from oracle_schema_copy_spark.operators import graph

    return graph.triangle_counts_sql(_COPURCHASE_EDGES_SQL)


# Degree cap for the scale-subset triangle gate: must be the SAME value
# in the Spark call and the SQL twin (oracle conventions — any cap/guard
# is mirrored or the gate diverges at scale).
_TRIANGLE_MAX_DEGREE = 100


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("dst"))
    return a.join(b, "__ok").where(F.col("src") < F.col("dst")).select("src", "dst")


@query("graph_triangle_counts", _triangle_oracle())
def q_graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the part co-purchase graph (two parts
    are adjacent when some order contains both — per-order fan-out is
    bounded by the ~7-lineitem order size, so edge generation is linear).
    Degree-ordered orientation keeps wedge enumeration O(m^1.5) with no
    hub cap needed; counts are exact integers, matching the unrolled SQL
    twin bit-for-bit. Reference tie-in: the FK-graph layer
    (CopyTreeUtils.groovy) walks the schema DAG; this is the data-graph
    analytics shape that layer never needed, built on the same edge-list
    DataFrame contract as pagerank/bfs_hops."""
    from oracle_schema_copy_spark.operators import graph

    return graph.triangle_counts(_copurchase_edges(spark, sf_dir))


def _triangle_capped_oracle() -> str:
    from oracle_schema_copy_spark.operators import graph

    return graph.triangle_counts_sql(
        _COPURCHASE_EDGES_SQL, max_degree=_TRIANGLE_MAX_DEGREE
    )


@query("graph_triangle_counts_capped", _triangle_capped_oracle())
def q_graph_triangle_counts_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts on the degree-capped (<= _TRIANGLE_MAX_DEGREE,
    currently 100) induced co-purchase
    subgraph — the scale-subset gate for graph_triangle_counts (r6
    VERDICT ask #4): the FULL-graph DuckDB oracle is wedge-join
    infeasible at sf1 (>80 GB spill), so the full query's sf1 row was a
    documented drop; this variant keeps the triangle PLAN (same
    canonicalization, orientation, wedge join, closing semi-join —
    operators/graph.py triangle_counts) under a hard gate at every
    scale. The cap is applied identically on both engines (induced
    subgraph on canonical-undirected degree), per the mirrored-guard
    oracle convention."""
    from oracle_schema_copy_spark.operators import graph

    return graph.triangle_counts(
        _copurchase_edges(spark, sf_dir), max_degree=_TRIANGLE_MAX_DEGREE
    )


# Peel threshold / round budget for the k-core gate: mirrored constants
# (oracle conventions). k=80 sits inside the co-purchase degree
# distribution at every SF (probed: min 38, median 89-119, max 138-222),
# so the peel is non-degenerate everywhere — full cascade collapse at
# sf0.001 (every node labeled), a 1.9k/18.9k-node surviving core at
# sf0.01/sf0.1. Fixpoint is reached in <= 6 rounds at every probed SF;
# rounds=8 leaves margin, and post-fixpoint rounds are no-ops on an
# empty-or-stable edge list.
_KCORE_K = 80
_KCORE_ROUNDS = 8


def _k_core_oracle() -> str:
    from oracle_schema_copy_spark.operators import graph

    return graph.k_core_peel_sql(
        _COPURCHASE_EDGES_SQL, k=_KCORE_K, rounds=_KCORE_ROUNDS
    )


@query("graph_k_core_decomposition", _k_core_oracle())
def q_graph_k_core_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the part co-purchase graph by iterative
    peeling (Matula-Beck coreness step, the standard dense-subgraph /
    community-seed primitive): each round drops every part whose degree
    in the current induced subgraph is below k, together with its
    edges; output is one row per node with the round it was peeled
    (NULL = survives in the k-core) and its final-subgraph degree. The
    fixed round count makes the unrolled-CTE DuckDB twin exact — the
    same contract as graph_triangle_counts_capped's mirrored cap and
    kmeans_two_iterations' fixed iteration count. Scale: each round is
    a degree aggregation plus two semi-joins on a monotonically
    shrinking edge list with localCheckpoint lineage cuts; no
    all-pairs, no wedge join, so the sf1 oracle stays feasible where
    the uncapped triangle oracle was not."""
    from oracle_schema_copy_spark.operators import graph

    return graph.k_core_peel(
        _copurchase_edges(spark, sf_dir), k=_KCORE_K, rounds=_KCORE_ROUNDS
    )


@query(
    "dedup_semantic_clusters",
    f"""
    WITH cents AS (
        SELECT label, k - 1 AS pos,
               round(avg(CAST(embedding[k] AS DOUBLE)), 6) AS centroid
        FROM embeddings, unnest(generate_series(1, 64)) AS t(k)
        GROUP BY label, k),
    cvec AS (
        SELECT label, array_agg(centroid ORDER BY pos) AS cv
        FROM cents GROUP BY label),
    scored AS (
        SELECT e.vec_id, c.label AS assigned,
               {_sql_dot('e.embedding', 'c.cv')} AS d
        FROM embeddings e CROSS JOIN cvec c),
    ranked AS (
        SELECT vec_id, assigned,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d DESC, assigned) AS rk
        FROM scored),
    v AS (
        SELECT e.vec_id, r.assigned, e.embedding
        FROM embeddings e JOIN ranked r ON r.vec_id = e.vec_id AND r.rk = 1),
    dropped AS (
        SELECT DISTINCT b.vec_id
        FROM v a JOIN v b ON a.assigned = b.assigned AND a.vec_id < b.vec_id
        WHERE {_sql_dot('a.embedding', 'b.embedding')} >= 0.45)
    SELECT v.vec_id, v.assigned AS cluster,
           v.vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
    FROM v
    """,
)
def q_dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): nearest-centroid routing, then
    near-dup pruning WITHIN each cluster only — sum(c_k^2) pair work
    instead of n^2, expressed as one equi-join on the assigned cell. The
    label centroids stand in for the k-means codebook exactly as in the
    IVF queries; kept=false iff a smaller-id same-cluster neighbor dots
    >= 0.45. Pairwise (non-transitive) per the paper."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.group_centroids(emb, group_col="label", vec_col="embedding")
    return dedup.semantic_cluster_dedup(
        emb, cents, id_col="vec_id", vec_col="embedding",
        group_col="label", threshold=0.45,
    )


def _cms_oracle(depth: int = 4, width: int = 1024) -> str:
    from oracle_schema_copy_spark.operators.sketches import cms_bucket_sql

    grid_arms = "\n        UNION ALL ".join(
        f"SELECT {j} AS j, {cms_bucket_sql('tok', j, width)} AS bucket FROM toks"
        for j in range(depth)
    )
    probe_arms = "\n        UNION ALL ".join(
        f"SELECT tok, {j} AS j, {cms_bucket_sql('tok', j, width)} AS bucket FROM exact"
        for j in range(depth)
    )
    return f"""
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    exact AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS exact_n
        FROM toks GROUP BY tok ORDER BY exact_n DESC, tok LIMIT 20),
    grid AS (
        SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt
        FROM ({grid_arms})
        GROUP BY j, bucket),
    probes AS ({probe_arms}),
    est AS (
        SELECT p.tok, min(g.cnt) AS cms_estimate
        FROM probes p JOIN grid g ON g.j = p.j AND g.bucket = p.bucket
        GROUP BY p.tok)
    SELECT e.tok, e.exact_n, s.cms_estimate,
           CAST(s.cms_estimate - e.exact_n AS BIGINT) AS overcount
    FROM exact e JOIN est s ON s.tok = e.tok
    """


@query("sketch_cms_heavy_hitters", _cms_oracle())
def q_sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters with the exact-verify contract: the top-20
    exact tokens joined against their sketch estimates. Structural CMS
    invariant on display: overcount >= 0 always (min over depth counters
    never undercounts), bounded by collisions at width=1024. The sketch
    is depth x width rows whatever the corpus size and merges across
    sources by counter addition — the fixed-memory frequency summary a
    100 TB token stream needs (operators/sketches.py)."""
    from oracle_schema_copy_spark.operators import sketches

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tf.tokens(F.col("text"))).alias("tok"))
    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("tok"))
        .limit(20)
    )
    sk = sketches.cms_sketch(toks, "tok", depth=4, width=1024)
    est = sketches.cms_estimate(sk, exact.select("tok"), "tok", depth=4, width=1024)
    return exact.join(est, "tok").select(
        "tok",
        "exact_n",
        F.col("estimate").alias("cms_estimate"),
        (F.col("estimate") - F.col("exact_n")).cast("long").alias("overcount"),
    )


@query(
    "train_shard_manifest",
    """
    WITH s AS (
        SELECT doc_id, n_chars,
               CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 7))
                    AS BIGINT) % 16 AS shard,
               CAST(('0x' || substr(md5('shard-pos:' || CAST(doc_id AS VARCHAR)), 1, 12))
                    AS BIGINT) AS pos
        FROM documents)
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(pos) AS BIGINT) AS pos_checksum,
           CAST(min(pos) AS BIGINT) AS first_pos
    FROM s GROUP BY shard
    """,
)
def q_train_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest: the verification summary a shard writer
    emits — per-shard document count, char mass, an order-free position
    checksum (sum of the md5-derived positions) and the first epoch-order
    position. shard/pos come from packing.shard_assignment, the
    reproducible global pseudo-shuffle (two independent md5 draws per
    id): any engine recomputes the same manifest from the same ids, which
    is how a 100 TB shard write is audited without re-reading payloads."""
    from oracle_schema_copy_spark.operators import packing

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    s = packing.shard_assignment(docs, id_col="doc_id", n_shards=16)
    return s.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum("pos").cast("long").alias("pos_checksum"),
        F.min("pos").cast("long").alias("first_pos"),
    )


def _kmeans_oracle(iterations: int = 2) -> str:
    """Unrolled-CTE twin of similarity.kmeans_iterations: per iteration a
    centroid update (round 6) and a broadcast-codebook re-assignment
    (ties to the smallest cluster id), exactly the published
    group_centroids / assign_nearest_centroid semantics."""
    parts = [
        """a0 AS (SELECT vec_id, label AS cluster FROM embeddings)"""
    ]
    for i in range(iterations):
        parts.append(
            f"""c{i} AS (
        SELECT a{i}.cluster, k - 1 AS pos,
               round(avg(CAST(e.embedding[k] AS DOUBLE)), 6) AS centroid
        FROM embeddings e JOIN a{i} USING (vec_id),
             unnest(generate_series(1, 64)) AS t(k)
        GROUP BY a{i}.cluster, k)"""
        )
        parts.append(
            f"""cv{i} AS (
        SELECT cluster, array_agg(centroid ORDER BY pos) AS cv
        FROM c{i} GROUP BY cluster)"""
        )
        parts.append(
            f"""a{i + 1} AS (
        SELECT vec_id, cluster FROM (
            SELECT e.vec_id, c.cluster,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_sql_dot('e.embedding', 'c.cv')} DESC,
                                c.cluster) AS rk
            FROM embeddings e CROSS JOIN cv{i} c)
        WHERE rk = 1)"""
        )
    n = iterations
    parts.append(
        f"""cfin AS (
        SELECT a{n}.cluster, k - 1 AS pos,
               round(avg(CAST(e.embedding[k] AS DOUBLE)), 6) AS centroid
        FROM embeddings e JOIN a{n} USING (vec_id),
             unnest(generate_series(1, 64)) AS t(k)
        GROUP BY a{n}.cluster, k)"""
    )
    parts.append(
        f"""sizes AS (
        SELECT cluster, CAST(count(*) AS BIGINT) AS n_assigned
        FROM a{n} GROUP BY cluster)"""
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + """
    SELECT cfin.cluster, CAST(cfin.pos AS BIGINT) AS pos,
           cfin.centroid, sizes.n_assigned
    FROM cfin JOIN sizes USING (cluster)"""
    )


@query("kmeans_two_iterations", _kmeans_oracle(2))
def q_kmeans_two_iterations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations seeded from the label column — the iterative
    ML-training shape (driver loop, localCheckpoint lineage cuts, one
    k x dim centroid shuffle + one broadcast-codebook scan per
    iteration). Centroids round to 6 decimals before each re-assignment
    and ties break on the smallest cluster id, so the unrolled-CTE twin
    reproduces every iteration exactly. Returns the final codebook with
    cluster populations."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.kmeans_iterations(
        emb, id_col="vec_id", vec_col="embedding", seed_col="label", iterations=2
    )


@query(
    "curation_shard_capstone",
    f"""
    WITH dropped AS (
        SELECT DISTINCT id_b AS doc_id FROM ({_SQL_JACCARD_PAIRS_T03})),
    kept AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               (least(length(text) / 500.0, 1.0) * 0.4
                + least(len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_EN}))) / len(string_split(text, ' ')) * 4, 1.0) * 0.4)
                + (1.0 - least(length(regexp_replace(text, '[a-zA-Z0-9\\s]+', '', 'g')) / length(text) * 5, 1.0)) * 0.2 AS quality
        FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
    sharded AS (
        SELECT doc_id, n_tokens,
               CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 7))
                    AS BIGINT) % 16 AS shard,
               CAST(('0x' || substr(md5('shard-pos:' || CAST(doc_id AS VARCHAR)), 1, 12))
                    AS BIGINT) AS pos
        FROM kept WHERE quality >= 0.5)
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(sum(pos) AS BIGINT) AS pos_checksum
    FROM sharded GROUP BY shard
    """,
)
def q_curation_shard_capstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 curation capstone — the full write-side story in one plan:
    LOSSLESS prefix-filter near-dup pruning (pairwise min-id survivor,
    the SemDeDup drop rule applied to the exact-Jaccard pair set), the
    quality gate, then reproducible shard assignment and the per-shard
    audit manifest a training data-loader consumes. Shuffle inventory:
    the prefix posting join, one anti-join against the dropped set
    (broadcast-able — dropped docs are a small fraction), one groupBy on
    shard. Every stage is the already-gated operator; this row proves
    they COMPOSE."""
    from oracle_schema_copy_spark.operators import packing

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.3
    )
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    t = F.col("text")
    kept = (
        docs.join(dropped, "doc_id", "left_anti")
        .select(
            "doc_id",
            tf.token_count(t).alias("n_tokens"),
            tf.quality_score(t).alias("quality"),
        )
        .filter(F.col("quality") >= 0.5)
    )
    sharded = packing.shard_assignment(
        kept.select("doc_id", "n_tokens"), id_col="doc_id", n_shards=16
    )
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.sum("pos").cast("long").alias("pos_checksum"),
    )


@query(
    "multimodal_feature_extract_arrow",
    """
    WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents)
    SELECT doc_id,
           CAST(16 + CAST(('0x' || substr(hx, 1, 2)) AS INT) % 16 AS INT) AS width,
           CAST(16 + CAST(('0x' || substr(hx, 3, 2)) AS INT) % 16 AS INT) AS height,
           CAST(3 AS INT) AS n_channels,
           CAST(u AS INT) AS feat_pos,
           CAST(CAST(('0x' || substr(hx, 5 + 2 * u, 2)) AS INT) / 256.0 AS REAL) AS feat_value
    FROM h, (SELECT unnest(generate_series(0, 7)) AS u)
    """,
)
def q_multimodal_feature_extract_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInArrow twin of multimodal_feature_extract: same stub
    decode, same oracle, but batches stay pyarrow RecordBatches — payload
    bytes go straight from Arrow buffers into the decoder with no pandas
    boxing, the lower-overhead production path for codec-style UDFs
    (operators/multimodal.py extract_features_arrow)."""
    docs = multimodal.attach_binary(load_table(spark, sf_dir, "documents"))
    feats = multimodal.extract_features_arrow(docs)
    return feats.select(
        "doc_id",
        "width",
        "height",
        "n_channels",
        F.posexplode("features").alias("feat_pos", "feat_value"),
    )


@query(
    "bpe_pair_merge_step",
    """
    WITH words AS (
        SELECT w, CAST(count(*) AS BIGINT) AS wn
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) >= 2
        GROUP BY w),
    p1 AS (
        SELECT pair, CAST(sum(wn) AS BIGINT) AS n
        FROM (SELECT wn,
                     unnest(list_transform(generate_series(1, length(w) - 1),
                                           i -> substr(w, i, 2))) AS pair
              FROM words)
        GROUP BY pair),
    top1 AS (SELECT pair AS mp FROM p1 ORDER BY n DESC, pair LIMIT 1),
    words2 AS (
        SELECT w, CAST(sum(wn) AS BIGINT) AS wn
        FROM (SELECT replace(w, (SELECT mp FROM top1), '_') AS w, wn
              FROM words)
        WHERE length(w) >= 2
        GROUP BY w),
    p2 AS (
        SELECT pair, CAST(sum(wn) AS BIGINT) AS n
        FROM (SELECT wn,
                     unnest(list_transform(generate_series(1, length(w) - 1),
                                           i -> substr(w, i, 2))) AS pair
              FROM words2)
        GROUP BY pair),
    r1 AS (SELECT CAST(1 AS INTEGER) AS merge_round,
                  CAST(row_number() OVER (ORDER BY n DESC, pair) AS INTEGER)
                      AS pair_rank,
                  pair, n
           FROM p1),
    r2 AS (SELECT CAST(2 AS INTEGER) AS merge_round,
                  CAST(row_number() OVER (ORDER BY n DESC, pair) AS INTEGER)
                      AS pair_rank,
                  pair, n
           FROM p2)
    SELECT * FROM r1 WHERE pair_rank <= 10
    UNION ALL
    SELECT * FROM r2 WHERE pair_rank <= 10
    """,
)
def q_bpe_pair_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One byte-pair-encoding training iteration, fully relational: count
    adjacent symbol pairs over the word-frequency-weighted vocabulary,
    merge the single most frequent pair (deterministic tie-break: count
    DESC then pair ASC, applied leftmost-first non-overlapping — exactly
    what ``replace()`` does in both engines), re-count on the merged
    vocabulary, and emit the top-10 pairs of BOTH rounds — a gated
    contract that round 2 sees the merge's effect (the winning pair is
    gone, new pairs touching the '_' merge symbol appear).

    Scale shape: the corpus collapses to its VOCABULARY in the first
    aggregation (one shuffle over words), and every later step — pair
    explode, re-count, the 1-row broadcast of the winning pair, the merged
    re-group — is vocabulary-sized, independent of corpus row count.
    That is why classical BPE trainers run on word-count tables; at
    100 TB the only corpus-sized work is the first word count. Adjacent
    pairs come from ``transform(sequence(...), i -> substr(w, i, 2))`` —
    built-in higher-order functions, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("wn"))
    pair_expr = (
        "explode(transform(sequence(1, length(w) - 1),"
        " i -> substr(w, i, 2))) AS pair"
    )
    p1 = (
        vocab.selectExpr("wn", pair_expr)
        .groupBy("pair")
        .agg(F.sum("wn").cast("long").alias("n"))
    )
    top1 = (
        p1.orderBy(F.desc("n"), "pair").limit(1).select(F.col("pair").alias("mp"))
    )
    vocab2 = (
        vocab.crossJoin(F.broadcast(top1))
        .select(F.expr("replace(w, mp, '_')").alias("w"), "wn")
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.sum("wn").cast("long").alias("wn"))
    )
    p2 = (
        vocab2.selectExpr("wn", pair_expr)
        .groupBy("pair")
        .agg(F.sum("wn").cast("long").alias("n"))
    )
    w_rank = Window.orderBy(F.desc("n"), "pair")

    def _top(df: DataFrame, rnd: int) -> DataFrame:
        return (
            df.withColumn(
                "pair_rank", F.row_number().over(w_rank).cast("int")
            )
            .filter(F.col("pair_rank") <= 10)
            .select(
                F.lit(rnd).cast("int").alias("merge_round"),
                "pair_rank",
                "pair",
                "n",
            )
        )

    return _top(p1, 1).unionByName(_top(p2, 2))


# Private-use-area merge symbols: one fresh single-character symbol per
# BPE merge round. Unicode PUA characters cannot appear in the fixture
# text, so a merge never collides with real corpus symbols; both engines
# count string length / substr in code points, so a merged pair behaves
# as ONE symbol in every later round's adjacent-pair window.
_BPE_SYMS = [chr(0xE000 + i) for i in range(16)]


def _bpe_cte_prefix(k_merges: int) -> tuple[str, list[str]]:
    """(CTE chain, per-round winner SELECTs) shared by the BPE train and
    encode oracles: w0 is the
    corpus word count, then per round k — pair count p{k} over w{k-1},
    winner t{k} (count DESC, pair ASC), merged vocabulary w{k} via
    replace() with round k's private-use symbol — exactly the Spark
    driver loop's per-round plan."""
    ctes = [
        """w0 AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS wn
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) >= 2
        GROUP BY w)"""
    ]
    selects = []
    for k in range(1, k_merges + 1):
        prev, sym = f"w{k - 1}", _BPE_SYMS[k - 1]
        ctes.append(
            f"""p{k} AS (
        SELECT pair, CAST(sum(wn) AS BIGINT) AS n
        FROM (SELECT wn,
                     unnest(list_transform(generate_series(1, length(w) - 1),
                                           i -> substr(w, i, 2))) AS pair
              FROM {prev})
        GROUP BY pair)"""
        )
        ctes.append(
            f"t{k} AS (SELECT pair AS mp, n FROM p{k} ORDER BY n DESC, pair LIMIT 1)"
        )
        ctes.append(
            f"""w{k} AS MATERIALIZED (
        SELECT w, CAST(sum(wn) AS BIGINT) AS wn
        FROM (SELECT replace(w, (SELECT mp FROM t{k}), '{sym}') AS w, wn
              FROM {prev})
        WHERE length(w) >= 2
        GROUP BY w)"""
        )
        selects.append(
            f"SELECT CAST({k} AS INTEGER) AS merge_round, mp AS merged_pair, n"
            f" FROM t{k}"
        )
    return ",\n    ".join(ctes), selects


def _bpe_train_sql(k_merges: int) -> str:
    prefix, selects = _bpe_cte_prefix(k_merges)
    return "WITH " + prefix + "\n    " + "\n    UNION ALL ".join(selects)


_BPE_K_MERGES = 6
_BPE_MERGES_BY_DIR: dict[str, list[tuple[int, str, int]]] = {}


def _bpe_learn(spark: SparkSession, sf_dir: str) -> list[tuple[int, str, int]]:
    """The K-merge BPE training driver loop; returns the merge table rows
    (round, winning pair, count). Memoized per sf_dir (pure function of
    the fixture) so the train and encode queries share one training run
    per session, like _auto_lsh_r."""
    if sf_dir in _BPE_MERGES_BY_DIR:
        return _BPE_MERGES_BY_DIR[sf_dir]
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("wn"))
        .localCheckpoint(eager=True)
    )
    pair_expr = (
        "explode(transform(sequence(1, length(w) - 1),"
        " i -> substr(w, i, 2))) AS pair"
    )
    merges: list[tuple[int, str, int]] = []
    for k in range(1, _BPE_K_MERGES + 1):
        pairs = (
            vocab.selectExpr("wn", pair_expr)
            .groupBy("pair")
            .agg(F.sum("wn").cast("long").alias("n"))
        )
        win = pairs.orderBy(F.desc("n"), "pair").limit(1).collect()[0]
        merges.append((k, win["pair"], win["n"]))
        vocab = (
            vocab.select(
                F.replace(F.col("w"), F.lit(win["pair"]), F.lit(_BPE_SYMS[k - 1]))
                .alias("w"),
                "wn",
            )
            .filter(F.length("w") >= 2)
            .groupBy("w")
            .agg(F.sum("wn").cast("long").alias("wn"))
            .localCheckpoint(eager=True)
        )
    _BPE_MERGES_BY_DIR[sf_dir] = merges
    return merges


@query("bpe_train_k_merges", _bpe_train_sql(_BPE_K_MERGES))
def q_bpe_train_k_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, K=6 merge rounds — the multi-merge
    extension of bpe_pair_merge_step (r6 VERDICT ask #6), emitting the
    MERGE TABLE (merge_round, merged_pair, n): the actual artifact a
    tokenizer trainer produces. A driver loop over DataFrame rounds with
    localCheckpoint lineage cuts (the kmeans_iterations /
    connected_components pattern): per round, count adjacent symbol
    pairs over the word-frequency vocabulary, collect the single winning
    pair (1-row bounded collect — the same driver-frontier shape as the
    FK walk), replace it with a fresh private-use single-char symbol,
    and re-aggregate the merged vocabulary.

    Scale shape: the corpus collapses to its VOCABULARY in w0's one
    corpus-wide shuffle; all K rounds after that are vocabulary-sized
    (pair explode bounded by Σ word_len, 1-row winner, replace +
    re-group), independent of corpus row count — at 100 TB only w0
    touches the data. replace() uses F.replace with literal COLUMNS (no
    SQL-string splicing, so winning pairs containing quotes are safe).
    The eager checkpoint per round both cuts lineage and makes the
    winner's 1-row collect read cached partitions, not recompute the
    chain. The loop itself lives in _bpe_learn (memoized per sf_dir, so
    the encode query reuses this training run)."""
    return spark.createDataFrame(
        _bpe_learn(spark, sf_dir),
        schema="merge_round INT, merged_pair STRING, n BIGINT",
    )


def _bpe_encode_sql(k_merges: int) -> str:
    prefix, _selects = _bpe_cte_prefix(k_merges)
    chain = "w"
    for k in range(1, k_merges + 1):
        chain = f"replace({chain}, (SELECT mp FROM t{k}), '{_BPE_SYMS[k - 1]}')"
    return f"""
    WITH {prefix},
    enc AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    applied AS (SELECT doc_id, {chain} AS m FROM enc)
    SELECT doc_id, CAST(sum(length(m)) AS BIGINT) AS n_tokens_bpe
    FROM applied GROUP BY doc_id
    """


@query("bpe_encode_token_counts", _bpe_encode_sql(_BPE_K_MERGES))
def q_bpe_encode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of BPE training — encode the corpus with the
    learned K-merge table and emit per-document token counts, the number
    a sequence-packing / context-budget pipeline actually consumes.
    Closes the train->apply loop: a merge-table regression now turns a
    row-level, fact-cardinality gate red.

    Scale shape: the merge chain is applied to the DISTINCT WORD
    VOCABULARY (one replace chain per vocabulary entry, K built-in
    replace() calls, no UDF), then per-document counts come from an
    equi-join of the exploded corpus against that (word -> token count)
    map — at 100 TB the map is millions of rows (broadcastable), and the
    corpus-sized work is one explode + one broadcast join + one groupBy
    doc_id, with only (doc_id, wtok) ever shuffling. The oracle applies
    the identical nested-replace chain with each round's winner bound by
    scalar subquery."""
    merges = _bpe_learn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    merged = F.col("w")
    for k, pair, _n in merges:
        merged = F.replace(merged, F.lit(pair), F.lit(_BPE_SYMS[k - 1]))
    vocab_map = (
        words.select("w")
        .distinct()
        .select("w", F.length(merged).alias("wtok"))
    )
    return (
        words.join(vocab_map, "w")
        .groupBy("doc_id")
        .agg(F.sum("wtok").cast("long").alias("n_tokens_bpe"))
    )


def _bpe_fertility_sql(k_merges: int) -> str:
    prefix, _selects = _bpe_cte_prefix(k_merges)
    chain = "w"
    for k in range(1, k_merges + 1):
        chain = f"replace({chain}, (SELECT mp FROM t{k}), '{_BPE_SYMS[k - 1]}')"
    return f"""
    WITH {prefix},
    enc AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
    applied AS (SELECT lang, length(w) AS wc, length({chain}) AS wtok FROM enc),
    per AS (
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(wtok) AS BIGINT) AS n_tokens_bpe,
               CAST(sum(wc) AS BIGINT) AS n_chars
        FROM applied GROUP BY lang)
    SELECT lang, n_words, n_tokens_bpe, n_chars,
           CAST(n_tokens_bpe * 1000000 // n_words AS BIGINT) AS fertility_micro,
           CAST(n_chars * 1000000 // n_tokens_bpe AS BIGINT) AS compression_micro
    FROM per
    """


@query("bpe_fertility_by_lang", _bpe_fertility_sql(_BPE_K_MERGES))
def q_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY evaluation per language — the standard metric
    for how fairly a learned tokenizer treats each language (Acs 2019;
    BLOOM's tokenizer analysis): tokens-per-word (fertility) and
    chars-per-token (compression) under the learned K-merge BPE, in
    exact integer micro-units via BIGINT floor division (no float
    ratios). A tokenizer whose merges overfit one language shows up as
    a fertility gap across rows — the go/no-go artifact reviewed before
    committing to a tokenizer at scale. Reuses the memoized _bpe_learn
    training run; corpus-sized work is one explode + per-lang aggregate
    with the merge chain applied as K built-in replace calls (the
    vocabulary-map join of bpe_encode_token_counts is skipped: per-word
    token length is computed inline since no per-doc map is needed)."""
    merges = _bpe_learn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    merged = F.col("w")
    for k, pair, _n in merges:
        merged = F.replace(merged, F.lit(pair), F.lit(_BPE_SYMS[k - 1]))
    per = words.select(
        "lang", F.length("w").alias("wc"), F.length(merged).alias("wtok")
    ).groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("wtok").cast("long").alias("n_tokens_bpe"),
        F.sum("wc").cast("long").alias("n_chars"),
    )
    return per.select(
        "lang",
        "n_words",
        "n_tokens_bpe",
        "n_chars",
        F.expr("n_tokens_bpe * 1000000 DIV n_words")
        .cast("long")
        .alias("fertility_micro"),
        F.expr("n_chars * 1000000 DIV n_tokens_bpe")
        .cast("long")
        .alias("compression_micro"),
    )


# ---------------------------------------------------------------------------
# distributed linear algebra: Gram matrix + integer power-iteration PCA
# ---------------------------------------------------------------------------

# quantized embedding components as exact BIGINTs (operators/linalg.py
# QUANT_SCALE twin): float32 -> float64 widening and one IEEE multiply are
# identical in both engines, floor makes the result integral.
_SQL_QVEC = (
    "list_transform(embedding, x -> "
    "CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
)

# full (i, j) index grid, 1-based (DuckDB lists are 1-based)
_SQL_DIM_IDX = "SELECT unnest(generate_series(1, 64)) AS a"


@query(
    "embedding_gram_matrix",
    f"""
    WITH q AS (SELECT {_SQL_QVEC} AS qv FROM embeddings),
    idx AS ({_SQL_DIM_IDX})
    SELECT CAST(ia.a - 1 AS INT) AS i, CAST(ib.a - 1 AS INT) AS j,
           CAST(sum(q.qv[ia.a] * q.qv[ib.a]) AS BIGINT) AS g
    FROM q CROSS JOIN idx ia CROSS JOIN idx ib
    WHERE ia.a <= ib.a
    GROUP BY 1, 2
    """,
)
def q_embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix X^T X of the quantized embedding corpus (upper
    triangle, exact BIGINT entries) — the building block of distributed
    PCA/whitening/covariance. The Spark side is the scale shape: one
    mapInPandas pass emits a per-partition partial Gram via a numpy
    matmul (2,080 rows per partition for dim=64), then a dimension-sized
    groupBy-sum — the corpus never shuffles, and the plan is identical
    at 100 TB. The oracle rebuilds the same integers relationally
    (double-unnest cross grid); integer sums are order-independent, so
    the gate is exact."""
    from oracle_schema_copy_spark.operators import linalg

    return linalg.gram_upper(load_table(spark, sf_dir, "embeddings"))


def _pca_oracle(iters: int = 48) -> str:
    """Unrolled-CTE twin of the integer power iteration: Gram -> rescale
    to ±10^6 -> `iters` exact BIGINT matvec+rescale steps -> per-row
    projection. Truncating division is spelled CASE-wise so only
    non-negative operands reach `//` (floor == trunc there on both
    engines)."""
    steps = []
    prev = "v0"
    for k in range(1, iters + 1):
        steps.append(
            f"""w{k} AS MATERIALIZED (
        SELECT gn.i, CAST(sum(gn.g * {prev}.v) AS BIGINT) AS w
        FROM gn JOIN {prev} ON {prev}.i = gn.j GROUP BY 1),
    d{k} AS MATERIALIZED (SELECT greatest(max(abs(w)), 1) // 1000000 + 1 AS den FROM w{k}),
    v{k} AS MATERIALIZED (SELECT i, CASE WHEN w >= 0 THEN w // den
                            ELSE -((-w) // den) END AS v
             FROM w{k} CROSS JOIN d{k})"""
        )
        prev = f"v{k}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH q AS MATERIALIZED (SELECT vec_id, {_SQL_QVEC} AS qv FROM embeddings),
    idx AS ({_SQL_DIM_IDX}),
    gr AS MATERIALIZED (
        SELECT CAST(ia.a AS INT) AS i, CAST(ib.a AS INT) AS j,
               CAST(sum(q.qv[ia.a] * q.qv[ib.a]) AS BIGINT) AS g
        FROM q CROSS JOIN idx ia CROSS JOIN idx ib
        GROUP BY 1, 2),
    gd AS (SELECT max(abs(g)) // 1000000 + 1 AS den FROM gr),
    gn AS MATERIALIZED (SELECT i, j, CASE WHEN g >= 0 THEN g // den
                             ELSE -((-g) // den) END AS g
           FROM gr CROSS JOIN gd),
    v0 AS MATERIALIZED (SELECT CAST(a AS INT) AS i, CAST(1000000 AS BIGINT) AS v FROM idx),
    {chain}
    SELECT q.vec_id, CAST(sum(q.qv[v.i] * v.v) AS BIGINT) AS score_q
    FROM q CROSS JOIN {prev} v
    GROUP BY 1
    """


@query("embedding_pca_projection", _pca_oracle())
def q_embedding_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-principal-direction projection score per vector — distributed
    PCA with a fully oracle-gated, EXACT-integer pipeline: (1) the
    mapInPandas partial-Gram reduction (corpus never shuffles), (2) 48
    power-iteration steps on the 64x64 Gram ON THE DRIVER — dimension-
    sized, data-independent work, the same rationale as the codebook
    training in operators/similarity.py — in integer arithmetic sized so
    every intermediate fits BIGINT (Python ints replay BIGINT exactly),
    and (3) one generated-projection pass scoring every row against the
    iterated direction (a single selectExpr — one py4j round-trip). A
    pytest pins that the integer direction is genuinely the top
    eigenvector (|cos| vs numpy eigh > 0.99); this gate pins that both
    engines compute the identical chain at corpus cardinality."""
    from oracle_schema_copy_spark.operators import linalg

    emb = load_table(spark, sf_dir, "embeddings")
    rows = linalg.gram_upper(emb).collect()
    v = linalg.power_iteration_intvec([(r["i"], r["j"], r["g"]) for r in rows])
    return linalg.project_intvec(emb, v)


@query(
    "corpus_temperature_budgets",
    f"""
    WITH c AS (
        SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        FROM documents GROUP BY lang),
    tot AS (
        SELECT CAST(sum(n_tok) * {_UNIMAX_BUDGET_NUM} // {_UNIMAX_BUDGET_DEN}
                    AS BIGINT) AS budget
        FROM c),
    o AS (
        SELECT lang, n_tok, sqrt(CAST(n_tok AS DOUBLE)) AS s,
               sum(sqrt(CAST(n_tok AS DOUBLE))) OVER (
                   ORDER BY lang ROWS UNBOUNDED PRECEDING) AS pfx
        FROM c),
    st AS (SELECT max(pfx) AS stot FROM o)
    SELECT o.lang, o.n_tok,
           CAST(floor(CAST(1000000 AS DOUBLE) * o.s / st.stot) AS BIGINT)
               AS share_micro,
           CAST(floor(CAST(tot.budget AS DOUBLE) * o.s / st.stot) AS BIGINT)
               AS alloc_tok
    FROM o CROSS JOIN st CROSS JOIN tot
    """,
)
def q_corpus_temperature_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language sampling (mT5 / XLM-R style): budget
    share proportional to n_tok^alpha with alpha = 0.5, boosting tail
    languages relative to natural frequency — the OTHER standard
    training-mix policy next to UniMax water-filling (same 4/5 budget,
    so the two allocations are directly comparable on the fixture).

    Cross-engine exactness without integer freezing: sqrt is correctly
    rounded in IEEE-754 (Java Math.sqrt == libm sqrt bit-for-bit), and
    the one order-dependent float reduction — the sum of per-language
    sqrts — is forced into lang-order sequential addition on BOTH
    engines via a running-sum window (all terms positive, so the final
    prefix is max(pfx)). The remaining ops are one multiply, one divide,
    one floor — identical IEEE chains. Scale: the per-lang token count
    is the only corpus-sized work; the allocation runs on |languages|
    rows."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tok")
    )
    tot = c.agg(
        F.expr(f"sum(n_tok) * {_UNIMAX_BUDGET_NUM} DIV {_UNIMAX_BUDGET_DEN}")
        .cast("long")
        .alias("budget")
    )
    w = Window.orderBy("lang").rowsBetween(Window.unboundedPreceding, 0)
    o = c.select(
        "lang",
        "n_tok",
        F.sqrt(F.col("n_tok").cast("double")).alias("s"),
        F.sum(F.sqrt(F.col("n_tok").cast("double"))).over(w).alias("pfx"),
    )
    st = o.agg(F.max("pfx").alias("stot"))
    return (
        o.crossJoin(F.broadcast(st))
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_tok",
            F.floor(F.lit(1000000.0) * F.col("s") / F.col("stot"))
            .cast("long")
            .alias("share_micro"),
            F.floor(F.col("budget").cast("double") * F.col("s") / F.col("stot"))
            .cast("long")
            .alias("alloc_tok"),
        )
    )


# DoReMi one-shot reweighting constants — mirrored verbatim into the SQL
# twin (the oracle contract): multiplicative-update surrogate
# m(e) = 1 + e + e^2/2 in micro-units (the 2nd-order Taylor expansion of
# exp(e); exp itself is NOT correctly-rounded across libm implementations,
# so the surrogate keeps the whole allocation in exact BIGINT arithmetic —
# same determinism reasoning as the PQ/DSIR micro-unit convention), then
# 1/5 uniform smoothing (DoReMi's epsilon).
_DOREMI_MICRO = 1_000_000
_DOREMI_SMOOTH_KEEP = 800_000  # (1 - eps) in micro-units
_DOREMI_SMOOTH_EPS = 200_000  # eps in micro-units

# Factored DoReMi CTE chain ending in `wts` — shared verbatim by the
# weights query and the subset materializer (the _kcenter_parts pattern).
_DOREMI_CTES = f"""
    tok AS (SELECT source, unnest(string_split(text, ' ')) AS t
                 FROM documents),
    freq AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY t),
    total AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM freq),
    lpu AS (SELECT freq.t,
                   CAST(round(ln(freq.n / total.tot) * {_DOREMI_MICRO}) AS BIGINT)
                       AS lp_u
            FROM freq CROSS JOIN total),
    dom AS (SELECT tok.source, CAST(count(*) AS BIGINT) AS n_tok,
                   CAST(sum(lpu.lp_u) AS BIGINT) AS sum_u
            FROM tok JOIN lpu USING (t) GROUP BY tok.source),
    ref AS (SELECT CAST(sum(n_tok) AS BIGINT) AS tot_tok,
                   CAST((-sum(sum_u)) // sum(n_tok) AS BIGINT) AS ref_loss_micro
            FROM dom),
    sc AS (SELECT d.source, d.n_tok,
                  CAST((-d.sum_u) // d.n_tok AS BIGINT) AS loss_micro,
                  CAST(greatest(0, (-d.sum_u) // d.n_tok - r.ref_loss_micro)
                       AS BIGINT) AS excess_micro,
                  CAST(d.n_tok * {_DOREMI_MICRO} // r.tot_tok AS BIGINT)
                      AS u_share_micro
           FROM dom d CROSS JOIN ref r),
    m AS (SELECT source, n_tok, loss_micro, excess_micro, u_share_micro,
                 CAST({_DOREMI_MICRO} + excess_micro
                      + excess_micro * excess_micro // {2 * _DOREMI_MICRO}
                      AS BIGINT) AS m_micro
          FROM sc),
    z AS (SELECT CAST(sum(u_share_micro * m_micro) AS BIGINT) AS zs,
                 CAST(count(*) AS BIGINT) AS k FROM m),
    wts AS (
        SELECT m.source, m.n_tok, m.loss_micro, m.excess_micro,
               CAST(m.u_share_micro * m.m_micro // (z.zs // {_DOREMI_MICRO})
                    AS BIGINT) AS raw_share_micro,
               CAST({_DOREMI_SMOOTH_KEEP}
                    * (m.u_share_micro * m.m_micro // (z.zs // {_DOREMI_MICRO}))
                    // {_DOREMI_MICRO}
                    + {_DOREMI_SMOOTH_EPS} // z.k AS BIGINT) AS weight_micro
        FROM m CROSS JOIN z)
"""


@query(
    "corpus_doremi_weights",
    f"""
    WITH {_DOREMI_CTES}
    SELECT source, n_tok, loss_micro, excess_micro, raw_share_micro,
           weight_micro
    FROM wts
    """,
)
def q_corpus_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023) — the third
    training-mix policy next to UniMax water-filling and temperature
    sampling: a one-shot Group-DRO multiplicative update over per-domain
    EXCESS loss. Per domain (the ``source`` column): proxy loss = the
    corpus-unigram-LM negative avg logprob (the same lp_u micro-unit
    table quality_perplexity_buckets uses), reference loss = the
    corpus-wide average, excess = max(0, domain - reference); weight
    share ∝ baseline-token-share × m(excess) with
    m(e) = 1 + e + e²/2 (the 2nd-order surrogate of DoReMi's exp(η·e),
    η = 1 — exp is not correctly-rounded across libm implementations, so
    the surrogate keeps every step in exact BIGINT micro-units; it is
    monotone in e, preserving the DRO ordering), then ε = 0.2 uniform
    smoothing, DoReMi eq. (3). All divisions are integer DIV on
    non-negative operands — bit-exact on both engines.

    Scale: the LM table is vocabulary-sized and broadcast; one explode +
    two map-side-combined aggregations; the allocation arithmetic runs on
    |domains| rows."""
    return _doremi_weights(spark, sf_dir)


def _doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DoReMi weights frame (see q_corpus_doremi_weights) — factored
    so sample_doremi_mixture composes the identical chain."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tf.tokens(F.col("text"))).alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = freq.agg(F.sum("n").cast("double").alias("tot"))
    lpu = freq.join(F.broadcast(total)).selectExpr(
        "t",
        f"CAST(round(ln(n / tot) * {_DOREMI_MICRO}) AS BIGINT) AS lp_u",
    )
    dom = (
        tok.join(F.broadcast(lpu), "t")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum("lp_u").cast("long").alias("sum_u"),
        )
    )
    ref = dom.agg(
        F.sum("n_tok").cast("long").alias("tot_tok"),
        F.expr("CAST((-sum(sum_u)) DIV sum(n_tok) AS BIGINT)").alias(
            "ref_loss_micro"
        ),
    )
    m = dom.crossJoin(F.broadcast(ref)).selectExpr(
        "source",
        "n_tok",
        "CAST((-sum_u) DIV n_tok AS BIGINT) AS loss_micro",
        "CAST(greatest(0, (-sum_u) DIV n_tok - ref_loss_micro) AS BIGINT)"
        " AS excess_micro",
        f"CAST(n_tok * {_DOREMI_MICRO} DIV tot_tok AS BIGINT) AS u_share_micro",
    ).selectExpr(
        "*",
        f"CAST({_DOREMI_MICRO} + excess_micro"
        f" + excess_micro * excess_micro DIV {2 * _DOREMI_MICRO} AS BIGINT)"
        " AS m_micro",
    )
    z = m.agg(
        F.sum(F.col("u_share_micro") * F.col("m_micro")).cast("long").alias("zs"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return m.crossJoin(F.broadcast(z)).selectExpr(
        "source",
        "n_tok",
        "loss_micro",
        "excess_micro",
        # share = u*m*1e6 DIV zs, computed as u*m DIV (zs DIV 1e6): the
        # naive triple product overflows int64 once a dominant domain's
        # excess loss passes ~3.2 nats (u_share ~1e6, m ~1e6+e+e²/2e6) and
        # Spark (ANSI off) would wrap SILENTLY where DuckDB raises (ADVICE
        # r8). Invariant making the reduction safe: zs = Σ u_share*m ≥
        # (Σ u_share)*1e6 ≈ 1e12, so zs DIV 1e6 ≥ ~1e6 - |domains|, never
        # 0; the divisor truncation shifts shares by ≤1 ppm, identically
        # on both engines.
        f"CAST(u_share_micro * m_micro DIV (zs DIV {_DOREMI_MICRO}) AS BIGINT)"
        " AS raw_share_micro",
        f"CAST({_DOREMI_SMOOTH_KEEP}"
        f" * (u_share_micro * m_micro DIV (zs DIV {_DOREMI_MICRO}))"
        f" DIV {_DOREMI_MICRO}"
        f" + {_DOREMI_SMOOTH_EPS} DIV k AS BIGINT) AS weight_micro",
    )


# Budget for the DoReMi subset materializer: 4/5 of the corpus DOC count
# (the UniMax/temperature budget convention, document-denominated).
_DOREMI_BUDGET_NUM, _DOREMI_BUDGET_DEN = 4, 5


@query(
    "sample_doremi_mixture",
    f"""
    WITH {_DOREMI_CTES},
    budget AS (SELECT CAST(count(*) * {_DOREMI_BUDGET_NUM}
                           // {_DOREMI_BUDGET_DEN} AS BIGINT) AS b
               FROM documents),
    alloc AS (SELECT wts.source,
                     CAST(wts.weight_micro * budget.b // {_DOREMI_MICRO}
                          AS BIGINT) AS n_take
              FROM wts CROSS JOIN budget),
    ranked AS (SELECT doc_id, source,
                      CAST(row_number() OVER (
                          PARTITION BY source
                          ORDER BY {_SQL_BUCKET.format(salt="'doremi'")},
                                   doc_id) AS BIGINT) AS r
               FROM documents)
    SELECT ranked.doc_id, ranked.source, alloc.n_take,
           ranked.r <= alloc.n_take AS selected
    FROM ranked JOIN alloc USING (source)
    """,
)
def q_sample_doremi_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DoReMi policy MATERIALIZED: turn the domain weight shares into
    an actual training subset — per-domain document quota = weight_micro
    x (4/5 corpus budget), membership = the first n_take documents on the
    domain's deterministic md5 ring (the sampling convention every other
    subset op uses, so selection is engine- and partitioning-independent).
    Quota ranking instead of rate thresholding makes the per-domain counts
    EXACT, not expected-value. Row-level gate at corpus cardinality; the
    oracle reuses the factored DoReMi CTE chain verbatim.

    Scale: weights are |domains| rows broadcast back; the ring ranking is
    one window per domain partition keyed by an 8-byte hash."""
    from oracle_schema_copy_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    wts = _doremi_weights(spark, sf_dir)
    budget = docs.agg(
        F.expr(
            f"CAST(count(*) * {_DOREMI_BUDGET_NUM}"
            f" DIV {_DOREMI_BUDGET_DEN} AS BIGINT)"
        ).alias("b")
    )
    alloc = wts.crossJoin(F.broadcast(budget)).selectExpr(
        "source",
        f"CAST(weight_micro * b DIV {_DOREMI_MICRO} AS BIGINT) AS n_take",
    )
    w = Window.partitionBy("source").orderBy(
        hash_bucket(F.col("doc_id"), "doremi"), "doc_id"
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("r", F.row_number().over(w).cast("long"))
        .join(F.broadcast(alloc), "source")
        .select(
            "doc_id",
            "source",
            "n_take",
            (F.col("r") <= F.col("n_take")).alias("selected"),
        )
    )


@query(
    "curriculum_interleave_order",
    """
    WITH r AS (
        SELECT doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id)
                   AS BIGINT) AS src_rank,
               CAST(dense_rank() OVER (ORDER BY source) AS BIGINT) AS src_idx
        FROM documents),
    ns AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_src
           FROM documents)
    SELECT r.doc_id, r.source, r.src_rank,
           CAST((r.src_rank - 1) * ns.n_src + r.src_idx AS BIGINT) AS slot
    FROM r CROSS JOIN ns
    """,
)
def q_curriculum_interleave_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order curriculum: rank every document within its source by
    a quality proxy (n_chars, descending — longer documents first), then
    interleave sources round-robin via strided slots
    (slot = (rank-1) x n_sources + source_index) — the deterministic
    'one pass over each source per cycle' ordering training loaders use
    so no source is exhausted early and quality decays monotonically
    within each source's subsequence. Slots are a TOTAL order with gaps
    where a source runs out; consumers sort by slot — a distributed
    range sort, deliberately NOT densified here because a global
    row_number would funnel the corpus through one partition. Row-level
    gate at corpus cardinality.

    Scale: one per-source window + one broadcast source-count frame; no
    global shuffle beyond the per-source partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    # source indexes on the DISTINCT source frame (|domains| rows — a
    # single-partition window is fine there), broadcast back; a global
    # dense_rank over the corpus would funnel it through one partition
    srcs = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            F.row_number()
            .over(Window.orderBy("source"))
            .cast("long")
            .alias("src_idx"),
        )
    )
    ns = docs.agg(F.count_distinct("source").cast("long").alias("n_src"))
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("long").alias("src_rank"),
    ).join(F.broadcast(srcs), "source")
    return ranked.crossJoin(F.broadcast(ns)).select(
        "doc_id",
        "source",
        "src_rank",
        ((F.col("src_rank") - 1) * F.col("n_src") + F.col("src_idx"))
        .cast("long")
        .alias("slot"),
    )


# NDCG@10 discount weights, frozen to integer micro-units from the SAME
# Python constants for both engines (round(1e6 / log2(p+1)) at position p);
# ideal DCG places graded relevance 10..1 in order, so IDCG is a constant.
import math as _math

_NDCG_K = 10
_NDCG_W = [round(1_000_000 / _math.log2(p + 1)) for p in range(1, _NDCG_K + 1)]
_NDCG_IDCG = sum(
    (_NDCG_K + 1 - p) * w for p, w in zip(range(1, _NDCG_K + 1), _NDCG_W)
)
_NDCG_W_SQL = ", ".join(f"({p}, {w})" for p, w in enumerate(_NDCG_W, start=1))


@query(
    "ivf_ndcg_contract",
    f"""
    WITH {_IVF_NPROBE_CTES},
    ivf AS (
        SELECT query_id, neighbor_id, rank FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
            FROM scored) WHERE rank <= {_NDCG_K}),
    bq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
    bscored AS (
        SELECT bq.query_id, e.vec_id AS neighbor_id,
               {_sql_dot('e.embedding', 'bq.qv')} AS score
        FROM embeddings e CROSS JOIN bq WHERE e.vec_id <> bq.query_id),
    brute AS (
        SELECT query_id, neighbor_id,
               {_NDCG_K + 1} - rank AS rel FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
            FROM bscored) WHERE rank <= {_NDCG_K}),
    w(rank, wt) AS (VALUES {_NDCG_W_SQL})
    SELECT i.query_id,
           CAST(sum(coalesce(b.rel, 0) * w.wt) AS BIGINT) AS dcg_q,
           CAST(CAST(sum(coalesce(b.rel, 0) * w.wt) AS BIGINT) * 1000000
                // {_NDCG_IDCG} AS BIGINT) AS ndcg_micro
    FROM ivf i
    JOIN w ON w.rank = i.rank
    LEFT JOIN brute b
      ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
    GROUP BY 1
    """,
)
def q_ivf_ndcg_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the IVF nprobe=2 retrieval against brute-force graded
    relevance — the position-weighted quality contract the recall@k
    contracts can't express: recall treats a hit at rank 1 and rank 10
    the same, NDCG pins WHERE the true neighbors land. Relevance grades
    come from the exact ranking (rel = 11 - brute_rank for the true
    top-10, else 0); discount weights are log2 position discounts frozen
    to integer micro-units from the same Python constants in both
    engines, so DCG and the floor-divided NDCG are exact BIGINTs. A
    routing or tie-break regression that reshuffles result order — even
    with recall unchanged — turns this row red."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    cents = similarity.group_centroids(emb, group_col="label", vec_col="embedding")
    ivf = similarity.ivf_topk(emb, q, cents, nprobe=2, k=_NDCG_K).select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank")
    )
    brute = similarity.brute_force_topk(emb, q, k=_NDCG_K).select(
        "query_id",
        "neighbor_id",
        (F.lit(_NDCG_K + 1) - F.col("rank")).cast("long").alias("rel"),
    )
    wt = F.element_at(
        F.array(*[F.lit(w) for w in _NDCG_W]), F.col("rank")
    )
    per = (
        # brute's output is k x |queries| rows — bounded by the probe set,
        # so it broadcasts at any corpus scale (BHJ, not a sort-merge)
        ivf.join(F.broadcast(brute), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("rel"), F.lit(0)) * wt)
            .cast("long")
            .alias("dcg_q")
        )
    )
    return per.select(
        "query_id",
        "dcg_q",
        F.expr(f"dcg_q * 1000000 DIV {_NDCG_IDCG}")
        .cast("long")
        .alias("ndcg_micro"),
    )


@query(
    "embedding_covariance_matrix",
    f"""
    WITH q AS MATERIALIZED (SELECT {_SQL_QVEC} AS qv FROM embeddings),
    idx AS ({_SQL_DIM_IDX}),
    gr AS (
        SELECT CAST(ia.a - 1 AS INT) AS i, CAST(ib.a - 1 AS INT) AS j,
               CAST(sum(q.qv[ia.a] * q.qv[ib.a]) AS BIGINT) AS g
        FROM q CROSS JOIN idx ia CROSS JOIN idx ib
        WHERE ia.a <= ib.a
        GROUP BY 1, 2),
    sums AS (
        SELECT CAST(a - 1 AS INT) AS i, CAST(sum(q.qv[a]) AS BIGINT) AS s
        FROM q CROSS JOIN idx GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q)
    SELECT g.i, g.j,
           CAST(nn.n * g.g - sa.s * sb.s AS BIGINT) AS cov_n2
    FROM gr g
    JOIN sums sa ON sa.i = g.i
    JOIN sums sb ON sb.i = g.j
    CROSS JOIN nn
    """,
)
def q_embedding_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered covariance of the embedding corpus, exact at integer
    scale: ``cov_n2 = n * gram - s_i * s_j`` (= n^2 times the population
    covariance of the quantized components) — centering via the
    algebraic identity instead of a mean-subtraction pass, so no float
    mean ever materializes and the BIGINT gate is exact. Two corpus
    scans (partial-Gram pass + one generated projection of 64 sum
    aggregates), dimension-sized shuffles only, one broadcast stats row
    against the 2,080 Gram rows. Headroom at 100x the sf1 fixture:
    n*g <~ 1e18 < 2^63."""
    from oracle_schema_copy_spark.operators import linalg

    return linalg.covariance_scaled(load_table(spark, sf_dir, "embeddings"))


def _sql_dist2_lists(a: str, b: str, dim: int = 64) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
    )


def _kcenter_parts(k: int = 8) -> tuple[list[str], str]:
    """Composable unrolled twin of the greedy k-center chain (assumes a
    CTE named ``q`` with (vec_id, qv) exists): returns the CTE parts plus
    the name of the assignment CTE emitting (vec_id, rnd, cid, d2).
    Running least-distance CTEs (all MATERIALIZED — the self-referencing
    chain would otherwise inline exponentially), NOT-IN exclusion of
    already-selected ids."""
    parts = [
        "c1 AS MATERIALIZED (SELECT vec_id AS cid, qv FROM q ORDER BY vec_id LIMIT 1)",
        "d1 AS MATERIALIZED (SELECT q.vec_id, q.qv, "
        + _sql_dist2_lists("q.qv", "c1.qv")
        + " AS d FROM q CROSS JOIN c1)",
    ]
    for r in range(2, k + 1):
        ex = " UNION ALL ".join(f"SELECT cid FROM c{i}" for i in range(1, r))
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT vec_id AS cid, qv FROM d{r-1} "
            f"WHERE vec_id NOT IN ({ex}) ORDER BY d DESC, vec_id LIMIT 1)"
        )
        if r < k:
            parts.append(
                f"d{r} AS MATERIALIZED (SELECT p.vec_id, p.qv, least(p.d, "
                + _sql_dist2_lists("p.qv", f"c{r}.qv")
                + f") AS d FROM d{r-1} p CROSS JOIN c{r})"
            )
    cents = " UNION ALL ".join(
        f"SELECT {i} AS rnd, cid, qv FROM c{i}" for i in range(1, k + 1)
    )
    parts.append(f"cents AS (SELECT * FROM ({cents}))")
    parts.append(
        "ass AS (SELECT q.vec_id, c.rnd, c.cid, "
        + _sql_dist2_lists("q.qv", "c.qv")
        + " AS d2 FROM q CROSS JOIN cents c)"
    )
    return parts, "ass"


def _kcenter_oracle(k: int = 8) -> str:
    parts, ass = _kcenter_parts(k)
    joined = ",\n    ".join(
        [f"q AS MATERIALIZED (SELECT vec_id, {_SQL_QVEC} AS qv FROM embeddings)"]
        + parts
    )
    return f"""
    WITH {joined}
    SELECT vec_id, CAST(cid AS BIGINT) AS center_id, d2 AS d2_min FROM (
        SELECT vec_id, cid, d2,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, rnd) AS rk
        FROM {ass}) WHERE rk = 1
    """


@query("sample_kcenter_coreset", _kcenter_oracle())
def q_sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (Gonzalez) coreset selection over the embedding
    corpus: 8 farthest-point rounds, then every vector assigned to its
    nearest selected center — the DIVERSITY-maximizing selection policy
    (cover the embedding space) complementing the importance (DSIR),
    stratified, and temperature samplers. Exact-BIGINT squared distances
    under the shared floor(x*1e4) quantization make the whole greedy
    chain engine-reproducible: seed = smallest id, each round takes the
    max-min-distance point (ties to smallest id), assignment ties break
    to the earliest round. Scale: k sequential passes (inherent to
    greedy k-center) over a localCheckpointed quantized column; each
    pass updates a running min-distance column with ONE new distance
    term (O(k) work per point total) and reduces with top-1 TakeOrdered
    — no full shuffle anywhere; corpus-cardinality gate."""
    return similarity.kcenter_greedy(load_table(spark, sf_dir, "embeddings"))


@query(
    "embedding_standardize_outliers",
    f"""
    WITH q AS MATERIALIZED (SELECT vec_id, {_SQL_QVEC} AS qv FROM embeddings),
    idx AS ({_SQL_DIM_IDX}),
    sums AS (
        SELECT CAST(a AS INT) AS i, CAST(sum(q.qv[a]) AS BIGINT) AS s
        FROM q CROSS JOIN idx GROUP BY 1),
    diag AS (
        SELECT CAST(a AS INT) AS i, CAST(sum(q.qv[a] * q.qv[a]) AS BIGINT) AS g
        FROM q CROSS JOIN idx GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
    st AS (
        SELECT s.i, s.s, nn.n,
               sqrt(CAST(nn.n * d.g - s.s * s.s AS DOUBLE)) AS sd
        FROM sums s JOIN diag d ON d.i = s.i CROSS JOIN nn),
    z AS (
        SELECT q.vec_id,
               CAST(floor(CAST(1000000 AS DOUBLE) *
                    (CAST(st.n * q.qv[st.i] - st.s AS DOUBLE) / st.sd))
                    AS BIGINT) AS zm
        FROM q CROSS JOIN st)
    SELECT vec_id,
           CAST(sum(CASE WHEN abs(zm) >= 3000000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dims_over3,
           CAST(max(abs(zm)) AS BIGINT) AS max_abs_z_micro
    FROM z GROUP BY 1
    """,
)
def q_embedding_standardize_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier screen: z-score every quantized component
    against the corpus column mean/std (z = (n*q - s) / sqrt(n*g - s^2),
    the integer-identity standardization — no float mean/variance ever
    materializes), then per vector count dims with |z| >= 3 and keep the
    max |z|. The engine-exact float chain: exact BIGINT inputs,
    nearest-even BIGINT->DOUBLE casts, correctly-rounded IEEE sqrt, one
    divide + one multiply + floor — identical in the JVM, DuckDB, and
    the Python literal embedding. Scale: two dimension-sized stats
    reductions (sums projection + Gram diagonal) collected to the driver
    (64 values each), then ONE corpus scoring pass with the stats as
    generated-projection literals; the oracle recomputes its own stats
    in-engine, so the gate also pins the stats reductions."""
    from oracle_schema_copy_spark.operators import linalg

    return linalg.standardize_outliers(load_table(spark, sf_dir, "embeddings"))


def _diversity_capstone_oracle(k: int = 8) -> str:
    """Composed twin: outlier z-screen -> greedy k-center on the
    survivors -> sqrt-temperature allocation of half the survivor budget
    across centers. Every stage reuses the factored chain of its
    standalone gated query."""
    kparts, ass = _kcenter_parts(k)
    head = [
        f"q0 AS MATERIALIZED (SELECT vec_id, {_SQL_QVEC} AS qv FROM embeddings)",
        f"idx AS ({_SQL_DIM_IDX})",
        "sums AS (SELECT CAST(a AS INT) AS i, CAST(sum(q0.qv[a]) AS BIGINT) AS s"
        " FROM q0 CROSS JOIN idx GROUP BY 1)",
        "diag AS (SELECT CAST(a AS INT) AS i, CAST(sum(q0.qv[a] * q0.qv[a]) AS BIGINT) AS g"
        " FROM q0 CROSS JOIN idx GROUP BY 1)",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q0)",
        "st AS (SELECT s.i, s.s, nn.n, sqrt(CAST(nn.n * d.g - s.s * s.s AS DOUBLE)) AS sd"
        " FROM sums s JOIN diag d ON d.i = s.i CROSS JOIN nn)",
        "z AS (SELECT q0.vec_id, CAST(floor(CAST(1000000 AS DOUBLE) *"
        " (CAST(st.n * q0.qv[st.i] - st.s AS DOUBLE) / st.sd)) AS BIGINT) AS zm"
        " FROM q0 CROSS JOIN st)",
        "keepv AS (SELECT vec_id FROM z GROUP BY 1"
        " HAVING sum(CASE WHEN abs(zm) >= 3000000 THEN 1 ELSE 0 END) = 0)",
        "q AS MATERIALIZED (SELECT q0.vec_id, q0.qv FROM q0 JOIN keepv USING (vec_id))",
    ]
    tail = [
        "assign AS (SELECT vec_id, cid FROM ("
        "SELECT vec_id, cid, row_number() OVER ("
        f"PARTITION BY vec_id ORDER BY d2, rnd) AS rk FROM {ass}) WHERE rk = 1)",
        "counts AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_assigned"
        " FROM assign GROUP BY 1)",
        "tb AS (SELECT CAST(count(*) // 2 AS BIGINT) AS budget FROM q)",
        "o AS (SELECT cid, n_assigned, sqrt(CAST(n_assigned AS DOUBLE)) AS s2,"
        " sum(sqrt(CAST(n_assigned AS DOUBLE))) OVER ("
        "ORDER BY cid ROWS UNBOUNDED PRECEDING) AS pfx FROM counts)",
        "sb AS (SELECT max(pfx) AS stot FROM o)",
    ]
    joined = ",\n    ".join(head + kparts + tail)
    return f"""
    WITH {joined}
    SELECT CAST(o.cid AS BIGINT) AS center_id, o.n_assigned,
           CAST(floor(CAST(tb.budget AS DOUBLE) * o.s2 / sb.stot) AS BIGINT)
               AS alloc_vecs
    FROM o CROSS JOIN sb CROSS JOIN tb
    """


@query("curation_diversity_capstone", _diversity_capstone_oracle())
def q_curation_diversity_capstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-curation capstone composing this round's three new
    operators end-to-end, the way a training-data pipeline would chain
    them: (1) drop embedding-space outliers (any >=3-sigma dim — the
    standardization screen), (2) greedy k-center over the SURVIVORS to
    carve the space into 8 coverage regions, (3) allocate half the
    survivor budget across regions by sqrt-temperature sampling, so
    sparse regions keep proportionally more of their mass. Each stage is
    the already-gated chain (same constants, same arithmetic); the
    composed oracle reuses the factored CTE parts verbatim. Scale: the
    screen and assignment are the audited corpus passes; the allocation
    runs on |centers| rows."""
    from oracle_schema_copy_spark.operators import linalg

    emb = load_table(spark, sf_dir, "embeddings")
    keep = (
        linalg.standardize_outliers(emb)
        .where(F.col("n_dims_over3") == 0)
        .select("vec_id")
    )
    surv = emb.join(keep, "vec_id")
    assign = similarity.kcenter_greedy(surv)
    counts = assign.groupBy("center_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_assigned")
    )
    tb = surv.agg(F.expr("count(1) DIV 2").cast("long").alias("budget"))
    w = Window.orderBy("center_id").rowsBetween(Window.unboundedPreceding, 0)
    o = counts.select(
        "center_id",
        "n_assigned",
        F.sqrt(F.col("n_assigned").cast("double")).alias("__s"),
        F.sum(F.sqrt(F.col("n_assigned").cast("double"))).over(w).alias("__pfx"),
    )
    sb = o.agg(F.max("__pfx").alias("__stot"))
    return (
        o.crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(tb))
        .select(
            "center_id",
            "n_assigned",
            F.floor(F.col("budget").cast("double") * F.col("__s") / F.col("__stot"))
            .cast("long")
            .alias("alloc_vecs"),
        )
    )


def _matryoshka_oracle(dims: tuple[int, ...] = (16, 32)) -> str:
    """Recall@5 of PREFIX-dimension brute-force retrieval vs the full
    64-dim ranking, one arm per truncation width."""
    arms = []
    for d in dims:
        arms.append(
            f"""t{d} AS (
        SELECT query_id, neighbor_id FROM (
            SELECT bq.query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY bq.query_id
                       ORDER BY {_sql_dot('e.embedding', 'bq.qv', d)} DESC,
                                e.vec_id) AS rank
            FROM embeddings e CROSS JOIN bq WHERE e.vec_id <> bq.query_id)
        WHERE rank <= 5)"""
        )
    union = " UNION ALL ".join(
        f"SELECT CAST({d} AS BIGINT) AS trunc_dim, query_id, neighbor_id FROM t{d}"
        for d in dims
    )
    arms_sql = ",\n    ".join(arms)
    return f"""
    WITH bq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                WHERE vec_id < 20),
    fullk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT bq.query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY bq.query_id
                       ORDER BY {_sql_dot('e.embedding', 'bq.qv')} DESC,
                                e.vec_id) AS rank
            FROM embeddings e CROSS JOIN bq WHERE e.vec_id <> bq.query_id)
        WHERE rank <= 5),
    {arms_sql},
    tr AS ({union}),
    dims(trunc_dim) AS (VALUES (CAST(16 AS BIGINT)), (CAST(32 AS BIGINT))),
    fx AS (SELECT d.trunc_dim, f.query_id, f.neighbor_id
           FROM fullk f CROSS JOIN dims d)
    SELECT fx.trunc_dim, fx.query_id,
           CAST(count(tr.neighbor_id) AS BIGINT) AS n_hits,
           CAST(count(tr.neighbor_id) AS DOUBLE) / 5 AS recall_at_5
    FROM fx
    LEFT JOIN tr ON tr.trunc_dim = fx.trunc_dim
         AND tr.query_id = fx.query_id AND tr.neighbor_id = fx.neighbor_id
    GROUP BY 1, 2
    """


@query("matryoshka_recall_contract", _matryoshka_oracle())
def q_matryoshka_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka / truncated-dimension retrieval quality: recall@5 of
    brute-force search over only the FIRST 16 and 32 embedding
    components against the full 64-dim ranking — the
    dimension-vs-quality dial MRL-style embeddings expose for cheap
    first-stage serving (prefix dots cost d/64 of the FLOPs and
    bandwidth; at scale the truncated columns also shrink the scan).
    Deterministic both sides (sequential-double prefix dots, id
    tie-breaks), so recall itself is oracle-gated per (width, query) —
    the same contract family as the LSH/IVF/IVF-PQ recall rows, here
    pinning the truncation loss instead of the index loss."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    full = similarity.brute_force_topk(emb, q, k=5).select(
        "query_id", "neighbor_id"
    )
    arms = []
    for d in (16, 32):
        arms.append(
            similarity.brute_force_topk(emb, q, k=5, dim=d).select(
                F.lit(d).cast("long").alias("t_dim"),
                F.col("query_id").alias("t_query_id"),
                F.col("neighbor_id").alias("t_neighbor_id"),
            )
        )
    tr = arms[0].unionByName(arms[1])
    dims = spark.createDataFrame([(16,), (32,)], "trunc_dim LONG")
    fx = full.crossJoin(F.broadcast(dims))
    j = fx.join(
        F.broadcast(tr),
        (fx["trunc_dim"] == tr["t_dim"])
        & (fx["query_id"] == tr["t_query_id"])
        & (fx["neighbor_id"] == tr["t_neighbor_id"]),
        "left",
    )
    return j.groupBy("trunc_dim", "query_id").agg(
        F.count("t_neighbor_id").cast("long").alias("n_hits"),
        (F.count("t_neighbor_id").cast("double") / 5).alias("recall_at_5"),
    )


@query(
    "dedup_minhash_recall_contract",
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
    exact AS ({_SQL_JACCARD_PAIRS}),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM exact),
    nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cands FROM cands),
    nh AS (SELECT CAST(count(*) AS BIGINT) AS n_hits
           FROM cands c JOIN exact e ON e.id_a = c.id_a AND e.id_b = c.id_b)
    SELECT nt.n_truth, nc.n_cands, nh.n_hits,
           CAST(nh.n_hits * 1000000 // nt.n_truth AS BIGINT) AS recall_micro,
           CAST(nh.n_hits * 1000000 // nc.n_cands AS BIGINT) AS precision_micro
    FROM nt CROSS JOIN nc CROSS JOIN nh
    """,
)
def q_dedup_minhash_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup QUALITY contract — the near-dup analogue of the retrieval
    recall contracts: recall and precision of the banded-MinHash
    candidate pre-filter against LOSSLESS ground truth (the AllPairs
    prefix-filter path finds every pair with Jaccard >= 0.2 exactly).
    Recall follows the banding S-curve 1-(1-j^2)^8 (~0.28 at the j=0.2
    threshold edge, ~1.0 for the planted near-identical dups), so the
    gated value is a fixture-stable quality number: a permutation,
    banding, or bucket-cap regression that silently loses true dup
    pairs turns this row red rather than shrinking the dedup output
    unnoticed. All counts exact BIGINTs, ratios in floor-divided
    micro-units. Scale: the candidate side is the audited bucket join,
    the truth side the audited prefix filter — both corpus passes are
    the already-gated plans."""
    docs = load_table(spark, sf_dir, "documents")
    sets = dedup.shingle_sets(docs, "doc_id", "text", 3).localCheckpoint()
    cands = dedup.minhash_candidate_pairs(sets, "doc_id", bands=8, max_bucket=1000)
    truth = dedup.prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2
    ).select("id_a", "id_b")
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    nc = cands.agg(F.count(F.lit(1)).cast("long").alias("n_cands"))
    nh = cands.join(truth, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )
    return (
        nt.crossJoin(nc)
        .crossJoin(nh)
        .select(
            "n_truth",
            "n_cands",
            "n_hits",
            F.expr("n_hits * 1000000 DIV n_truth").cast("long").alias("recall_micro"),
            F.expr("n_hits * 1000000 DIV n_cands").cast("long").alias("precision_micro"),
        )
    )


@query(
    "bpe_roundtrip_contract",
    """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
           CAST(0 AS BIGINT) AS n_roundtrip_fail,
           TRUE AS roundtrip_ok
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY lang
    """,
)
def q_bpe_roundtrip_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer integrity contract: decode(encode(w)) == w for EVERY
    corpus word under the learned K-merge BPE — encode applies the merge
    chain in training order, decode expands the private-use-area merge
    symbols in REVERSE order (later merges may contain earlier symbols,
    so reverse expansion is what reconstructs chained merges). The
    symbols live outside the text alphabet, so the round-trip must be
    lossless; a merge-table ordering or symbol-collision regression
    makes n_roundtrip_fail nonzero and turns the row red. Corpus work:
    one explode + 2K replace calls per word + a per-lang aggregate."""
    merges = _bpe_learn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    enc = F.col("w")
    for k, pair, _n in merges:
        enc = F.replace(enc, F.lit(pair), F.lit(_BPE_SYMS[k - 1]))
    dec = enc
    for k, pair, _n in reversed(merges):
        dec = F.replace(dec, F.lit(_BPE_SYMS[k - 1]), F.lit(pair))
    per = words.select(
        "lang", (dec != F.col("w")).cast("long").alias("__fail")
    ).groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("__fail").cast("long").alias("n_roundtrip_fail"),
    )
    return per.select(
        "lang",
        "n_words",
        "n_roundtrip_fail",
        (F.col("n_roundtrip_fail") == 0).alias("roundtrip_ok"),
    )
