"""LLM-pipeline queries: distributed linear algebra (Gram/PCA/
covariance in exact integer micro-units), training-mixture policies
(temperature, DoReMi, curriculum), coresets, and quality contracts.
Split out of queries/pipeline.py in round 9 (VERDICT r8 #8); query
names and implementations unchanged."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_schema_copy_spark.functions import text as tf
from oracle_schema_copy_spark.operators import dedup, multimodal, similarity
from oracle_schema_copy_spark.queries import query
from oracle_schema_copy_spark.sources.tables import load_table
from oracle_schema_copy_spark.queries.pipeline import _UNIMAX_BUDGET_DEN
from oracle_schema_copy_spark.queries.pipeline import _UNIMAX_BUDGET_NUM
from oracle_schema_copy_spark.queries._fragments import (
    _SQL_SHINGLES,
    _sql_h,
    _SQL_BUCKET,
    _SQL_JACCARD_PAIRS,
    _SQL_JACCARD_PAIRS_CAPPED,
    _sql_dot,
    _STOP_EN,
)
from oracle_schema_copy_spark.queries.pipeline_dedup import _minhash_sig_sql
from oracle_schema_copy_spark.queries.pipeline_similarity import _IVF_NPROBE_CTES
from oracle_schema_copy_spark.queries.pipeline_graph import _BPE_SYMS, _bpe_learn


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
