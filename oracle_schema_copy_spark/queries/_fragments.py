"""Shared SQL fragments (DuckDB dialect) for the LLM-pipeline query
family modules — the constants both engines must derive identically
(md5-based hashing, shingle/bucket conventions, unrolled dot products).
Split out of queries/pipeline.py in round 9 (VERDICT r8 #8)."""

from __future__ import annotations

from oracle_schema_copy_spark.functions import text as tf


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




_STOP_EN = ", ".join(f"'{w}'" for w in tf.LANG_STOPWORDS["en"])
