"""Distributed linear-algebra operators (operators/linalg.py): Arrow
partial-Gram parity, exact-integer power iteration quality, and the
projection's overflow headroom."""

from __future__ import annotations

import numpy as np

from oracle_schema_copy_spark.operators import linalg
from oracle_schema_copy_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _gram_dict(df):
    return {(r["i"], r["j"]): r["g"] for r in df.collect()}


def test_gram_mapinpandas_matches_relational(spark):
    """The Arrow/numpy partial-Gram path and the pure-DataFrame
    double-posexplode twin must produce identical BIGINT entries."""
    emb = load_table(spark, SF, "embeddings")
    a = _gram_dict(linalg.gram_upper(emb))
    b = _gram_dict(linalg.gram_upper_relational(emb))
    assert a == b
    assert len(a) == 64 * 65 // 2


def test_gram_matches_numpy(spark):
    """Gram entries equal an independent numpy int64 computation on the
    same quantization."""
    emb = load_table(spark, SF, "embeddings")
    got = _gram_dict(linalg.gram_upper(emb))
    m = np.stack(
        emb.select("embedding").toPandas()["embedding"].to_numpy()
    ).astype(np.float64)
    q = np.floor(m * linalg.QUANT_SCALE).astype(np.int64)
    ref = q.T @ q
    for (i, j), g in got.items():
        assert g == ref[i, j]


def test_power_iteration_finds_top_eigenvector(spark):
    """The exact-integer power iteration must land on numpy's top
    eigenvector of the same Gram (|cosine| > 0.99 — the fixture Gram is
    near-isotropic, eigengap ~1.07, hence the 48-step default)."""
    emb = load_table(spark, SF, "embeddings")
    rows = [(r["i"], r["j"], r["g"]) for r in linalg.gram_upper(emb).collect()]
    v = np.array(
        linalg.power_iteration_intvec(rows), dtype=np.float64
    )
    G = np.zeros((64, 64))
    for i, j, g in rows:
        G[i, j] = g
        G[j, i] = g
    evals, evecs = np.linalg.eigh(G)
    top = evecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.99, cos


def test_projection_bounds_fit_bigint(spark):
    """Every intermediate in the gated chain has BIGINT headroom: |q| <=
    QUANT_SCALE, |v| bounded by ~ITER_SCALE, so the 64-term projection
    sum stays far below 2^63."""
    emb = load_table(spark, SF, "embeddings")
    rows = [(r["i"], r["j"], r["g"]) for r in linalg.gram_upper(emb).collect()]
    v = linalg.power_iteration_intvec(rows)
    assert max(abs(x) for x in v) <= 2 * linalg.ITER_SCALE
    worst = 64 * linalg.QUANT_SCALE * max(abs(x) for x in v)
    assert worst < 2**62
    proj = linalg.project_intvec(emb, v)
    assert proj.count() == emb.count()
    assert dict(proj.dtypes)["score_q"] == "bigint"


def test_covariance_matches_numpy(spark):
    """cov_n2 must equal the integer identity n*Gram - outer(sums)
    computed independently in numpy, and n^2 * population covariance."""
    from oracle_schema_copy_spark.operators.linalg import covariance_scaled

    emb = load_table(spark, SF, "embeddings")
    got = {(r["i"], r["j"]): r["cov_n2"] for r in covariance_scaled(emb).collect()}
    m = np.stack(
        emb.select("embedding").toPandas()["embedding"].to_numpy()
    ).astype(np.float64)
    q = np.floor(m * linalg.QUANT_SCALE).astype(np.int64)
    n = q.shape[0]
    ref = n * (q.T @ q) - np.outer(q.sum(axis=0), q.sum(axis=0))
    for (i, j), c in got.items():
        assert c == ref[i, j]
    # and the identity really is n^2 * population covariance
    cov = np.cov(q.T, bias=True)
    assert np.allclose(ref / n**2, cov)


def test_kcenter_greedy_covers_better_than_prefix(spark):
    """Greedy k-center sanity: corpus-cardinality assignment, 8 distinct
    centers each at distance 0 from itself, and the greedy coverage
    radius (max over points of min distance to a center) beats the
    arbitrary first-8-ids subset — the diversity property the operator
    exists for."""
    from oracle_schema_copy_spark.operators.similarity import kcenter_greedy

    emb = load_table(spark, SF, "embeddings")
    out = kcenter_greedy(emb).toPandas()
    n = emb.count()
    assert len(out) == n
    centers = sorted(out["center_id"].unique())
    assert len(centers) == 8
    zero = out[out["d2_min"] == 0]
    assert set(centers) <= set(zero["vec_id"])
    greedy_radius = out["d2_min"].max()

    m = np.stack(
        emb.orderBy("vec_id").select("embedding").toPandas()["embedding"].to_numpy()
    ).astype(np.float64)
    q = np.floor(m * linalg.QUANT_SCALE).astype(np.int64)
    prefix = q[:8]
    d2 = ((q[:, None, :] - prefix[None, :, :]) ** 2).sum(axis=2)
    prefix_radius = d2.min(axis=1).max()
    assert greedy_radius <= prefix_radius
