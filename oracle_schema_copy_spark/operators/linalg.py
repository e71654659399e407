"""Distributed linear algebra over embedding columns: Gram matrix and
dimension-space power iteration (the PCA building blocks).

Scale design — the two-phase shape every distributed PCA uses
(e.g. Spark MLlib's ``RowMatrix.computeGramianMatrix``):

1. **Map-side partial Gram.** Each Arrow batch is stacked into a numpy
   matrix and contributes ``Q^T Q`` to a per-partition accumulator; one
   ``mapInPandas`` pass emits at most ``dim*(dim+1)/2`` rows PER
   PARTITION (2,080 for dim=64). The shuffle that follows carries only
   those — the corpus itself never shuffles, and the reduce side sums a
   dimension-sized table however many input rows there are. At 100 TB
   this is a scan + a 2,080-row-per-task shuffle.
2. **Dimension-space iteration on the driver.** The Gram matrix is
   ``dim x dim`` — data-independent — so collecting it is legitimate
   driver work (same rationale as the FAISS-style codebook training in
   ``operators/similarity.py``). Power iteration runs there.

Cross-engine exactness: embeddings are quantized to integer units
(``floor(x * 10_000)`` — float32→float64 widening and one IEEE multiply,
identical in Spark and DuckDB), so Gram entries are exact BIGINTs whose
sums are order-independent. Power iteration stays in integers too: the
Gram is first rescaled to ±10^6 with a truncating division, each
iterate is rescaled the same way, and every intermediate product fits
comfortably in 64 bits (|G'| ≤ 10^6, |v| ≤ ~10^6, 64-term sums ≤
~6.4e13). Python's arbitrary-precision ints therefore compute exactly
the BIGINT arithmetic the unrolled-CTE DuckDB twin replays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# integer units per 1.0 of embedding component (quantization scale)
QUANT_SCALE = 10_000
# target magnitude for rescaled Gram entries / power iterates
ITER_SCALE = 1_000_000


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division for b > 0 — what both
    Spark's ``DIV`` and DuckDB's ``//`` compute on the non-negative
    operands we feed them (the sign is peeled off first so floor ==
    trunc on both engines)."""
    return a // b if a >= 0 else -((-a) // b)


def gram_upper(
    df: DataFrame, *, vec_col: str = "embedding", dim: int = 64, scale: int = QUANT_SCALE
) -> DataFrame:
    """Upper triangle (i <= j) of the quantized Gram matrix ``Q^T Q`` as
    (i, j, g) with exact BIGINT entries.

    One ``mapInPandas`` pass accumulates a per-partition int64 partial
    Gram with a numpy matmul (vectorized — no per-row Python), emits the
    triangle once per partition, and a dimension-sized groupBy-sum
    finishes the reduction."""
    iu, ju = np.triu_indices(dim)

    def run(batches):
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(m * scale).astype(np.int64)
            acc += q.T @ q
            seen = True
        if seen:
            yield pd.DataFrame(
                {"i": iu.astype(np.int32), "j": ju.astype(np.int32), "g": acc[iu, ju]}
            )

    partials = df.select(vec_col).mapInPandas(run, "i INT, j INT, g LONG")
    return partials.groupBy("i", "j").agg(F.sum("g").cast("long").alias("g"))


def gram_upper_relational(
    df: DataFrame, *, vec_col: str = "embedding", dim: int = 64, scale: int = QUANT_SCALE
) -> DataFrame:
    """Pure-DataFrame twin of :func:`gram_upper` (double posexplode +
    groupBy) — used by the parity pytest to pin the Arrow path's
    arithmetic; the mapInPandas path is the production one (the explode
    materializes dim^2 rows per input row before the map-side combine)."""
    q = df.select(
        F.expr(
            f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"
        ).alias("qv")
    )
    e = q.select(F.posexplode("qv").alias("i", "a"), F.col("qv"))
    ee = e.select(
        F.col("i").cast("int").alias("i"),
        F.col("a"),
        F.posexplode("qv").alias("j", "b"),
    ).where(F.col("i") <= F.col("j"))
    return ee.groupBy("i", F.col("j").cast("int").alias("j")).agg(
        F.sum(F.col("a") * F.col("b")).cast("long").alias("g")
    )


def power_iteration_intvec(
    gram_rows: list[tuple[int, int, int]],
    *,
    dim: int = 64,
    iters: int = 48,
    scale: int = ITER_SCALE,
) -> list[int]:
    """Top-eigenvector direction of the (upper-triangle) Gram by ``iters``
    power-iteration steps in EXACT integer arithmetic (the fixture
    embeddings are near-isotropic — eigengap ~1.07 — so the default is
    48 steps; each is a 64x64 matvec, trivial on both engines):

    - rescale the Gram to ±``scale``: ``g' = tdiv(g, max|g| // scale + 1)``
    - start from the all-ones vector ``v0 = [scale] * dim``
    - each step: ``w = G' v`` (exact 64-term BIGINT sums), then rescale
      ``v = tdiv(w, max|w| // scale + 1)``

    Every operation is replayable in SQL BIGINTs (the unrolled-CTE
    oracle does), so the returned direction is bit-identical across
    engines; a pytest checks it is also genuinely the top eigenvector
    (|cos| vs numpy's ``eigh`` > 0.99 on the fixture)."""
    G = [[0] * dim for _ in range(dim)]
    mg = 1
    for i, j, g in gram_rows:
        G[i][j] = g
        G[j][i] = g
        mg = max(mg, abs(g))
    den = mg // scale + 1
    Gn = [[_tdiv(G[i][j], den) for j in range(dim)] for i in range(dim)]
    v = [scale] * dim
    for _ in range(iters):
        w = [sum(Gn[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        mw = max(max(abs(x) for x in w), 1)
        dv = mw // scale + 1
        v = [_tdiv(x, dv) for x in w]
    return v


def component_sums(
    df: DataFrame, *, vec_col: str = "embedding", dim: int = 64, scale: int = QUANT_SCALE
) -> DataFrame:
    """One row holding n and the per-dimension sums of the quantized
    components (exact BIGINTs) — no explode: one generated projection of
    dim aggregate expressions (a single selectExpr round-trip), reduced
    by a plain aggregate. Combined with :func:`gram_upper` this gives
    the exact CENTERED covariance without a second corpus shape:
    ``n^2 * cov[i,j] = n * gram[i,j] - s[i] * s[j]``."""
    qs = [
        f"CAST(sum(CAST(floor(CAST({vec_col}[{i}] AS DOUBLE) * {scale}) AS BIGINT)) AS BIGINT) AS s{i}"
        for i in range(dim)
    ]
    row = df.selectExpr(
        "CAST(count(*) AS BIGINT) AS n",
        *qs,
    )
    return row.selectExpr("n", f"array({', '.join(f's{i}' for i in range(dim))}) AS s")


def covariance_scaled(
    df: DataFrame, *, vec_col: str = "embedding", dim: int = 64, scale: int = QUANT_SCALE
) -> DataFrame:
    """Upper triangle of the exact integer-scaled centered covariance:
    ``cov_n2[i,j] = n * gram[i,j] - s[i] * s[j]`` (= n^2 times the
    population covariance of the quantized components). Same scale
    shape as the Gram: the corpus is scanned twice (Gram pass + sums
    pass), shuffles carry only dimension-sized rows, and the combine is
    a broadcast of one stats row against 2,080 Gram rows."""
    g = gram_upper(df, vec_col=vec_col, dim=dim, scale=scale)
    stats = component_sums(df, vec_col=vec_col, dim=dim, scale=scale)
    return g.crossJoin(F.broadcast(stats)).select(
        "i",
        "j",
        (
            F.col("n") * F.col("g")
            - F.element_at("s", F.col("i") + 1) * F.element_at("s", F.col("j") + 1)
        )
        .cast("long")
        .alias("cov_n2"),
    )


def project_intvec(
    df: DataFrame,
    v: list[int],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """Exact-integer projection score per row: ``sum_i q_i * v_i`` with
    the same quantization as the Gram build. The dot is ONE generated
    SQL expression (selectExpr — a single py4j round-trip, per the
    repo's generated-projection rule) over JVM codegen; v rides along as
    literals (it is dimension-sized)."""
    terms = " + ".join(
        f"CAST(floor(CAST({vec_col}[{i}] AS DOUBLE) * {scale}) AS BIGINT) * ({int(c)})"
        for i, c in enumerate(v)
    )
    return df.selectExpr(id_col, f"CAST({terms} AS BIGINT) AS score_q")


def standardize_outliers(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = QUANT_SCALE,
    z_thresh_micro: int = 3_000_000,
) -> DataFrame:
    """Per-vector standardization outlier stats: z-score every quantized
    component against the corpus column mean/std, count dims with
    |z| >= 3 and keep the max |z| — the embedding-space outlier signal
    (curation: flag vectors with corrupted / out-of-distribution dims).

    Exactness without an exact sqrt: z = (n*q_i - s_i) / sqrt(n*g_ii -
    s_i^2) multiplied to micro-units and floored. The integer inputs are
    exact; BIGINT->DOUBLE casts round nearest-even identically in
    Python, the JVM, and DuckDB; sqrt is correctly rounded in IEEE-754
    everywhere; one divide + one multiply + floor complete an identical
    IEEE chain, so the floored micro-z is engine-exact. Two dimension-
    sized driver collects (sums row + Gram diagonal) feed the generated
    projection; the corpus is scanned for stats then once for scoring."""
    import math

    stats = component_sums(df, vec_col=vec_col, dim=dim, scale=scale).collect()[0]
    n, s = int(stats["n"]), [int(x) for x in stats["s"]]
    diag = {
        r["i"]: int(r["g"])
        for r in gram_upper(df, vec_col=vec_col, dim=dim, scale=scale)
        .where(F.col("i") == F.col("j"))
        .collect()
    }
    sd = [math.sqrt(float(n * diag[i] - s[i] * s[i])) for i in range(dim)]

    def qx(i: int) -> str:
        return f"CAST(floor(CAST({vec_col}[{i}] AS DOUBLE) * {scale}) AS BIGINT)"

    zcols = [
        f"CAST(floor(CAST(1000000 AS DOUBLE) * "
        f"(CAST({n} * {qx(i)} - ({s[i]}) AS DOUBLE) / CAST('{sd[i]!r}' AS DOUBLE)))"
        f" AS BIGINT) AS __z{i}"
        for i in range(dim)
    ]
    staged = df.selectExpr(id_col, *zcols)
    n_over = " + ".join(
        f"CASE WHEN abs(__z{i}) >= {z_thresh_micro} THEN 1 ELSE 0 END"
        for i in range(dim)
    )
    max_abs = ", ".join(f"abs(__z{i})" for i in range(dim))
    return staged.selectExpr(
        id_col,
        f"CAST({n_over} AS BIGINT) AS n_dims_over3",
        f"CAST(greatest({max_abs}) AS BIGINT) AS max_abs_z_micro",
    )
