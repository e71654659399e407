"""Vector column expressions for embedding similarity (array<float> columns).

All math stays JVM-side: ``zip_with``/``aggregate`` compile to codegen'd
loops — no Python UDF in the hot path. Accumulation is sequential in
double precision, which is deterministic and (verified empirically)
bit-identical to DuckDB's ``list_sum(list_transform(...))`` — the property
our SQL oracles rely on.

At 100 TB: these are per-row projections (no shuffle); a brute-force
top-k against Q query vectors broadcasts the (small) query set and scans
the corpus once; the LSH/partitioned variants below prune the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-double dot product of two array columns."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def plane_dot(vec_col: str, plane) -> Column:
    """Dot of an array column (by NAME) with a LITERAL plane, unrolled to
    a flat left-associated sum: ``vec[0]*p0 + vec[1]*p1 + ...``.

    Same addition order as ``dot()`` and the DuckDB
    ``list_sum(list_transform(generate_series...))`` twin (an IEEE leading
    ``0.0 + x`` is bit-equal to ``x``), so results stay bit-identical —
    but the expression is plain arithmetic that whole-stage codegen
    compiles, where ``dot()``'s higher-order functions are interpreted
    CodegenFallback. This is the hot projection of LSH bucketing (16
    plane projections per row); only works when the plane is a Python
    literal list, which LSH hyperplanes always are.

    Built as ONE ``F.expr`` over a generated SQL string: building the
    same tree with Column operators costs ~4 py4j round-trips per element
    (measured 14s of pure driver time per banded-LSH query construction);
    one SQL parse JVM-side is milliseconds. ``D`` suffixes keep the
    literals DOUBLE (bare ``1.0`` parses as DECIMAL in Spark SQL, which
    would silently switch the whole sum to decimal arithmetic). Spark SQL
    ``arr[i]`` indexing is 0-based."""
    return F.expr(plane_dot_sql(vec_col, plane))


def dot_unrolled(a_col: str, b_col: str, dim: int) -> Column:
    """Dot of two array columns (by NAME) with a KNOWN fixed dimension,
    unrolled to a flat left-associated sum — whole-stage-codegen'd, where
    ``dot()``'s higher-order functions are interpreted CodegenFallback.

    Bit-equal to ``dot()`` for ``dim``-length inputs: same multiply and
    addition order, and IEEE ``0.0 + x == x`` for the HOF's seed. If an
    input array is SHORTER than ``dim`` the out-of-range index RAISES
    under ANSI mode (Spark 4 default) — loud, where ``dot()`` would
    quietly sum the shorter prefix — so pass ``dim=None`` at call sites
    that must handle ragged vectors."""
    return F.expr(
        " + ".join(
            f"(CAST(`{a_col}`[{i}] AS DOUBLE) * CAST(`{b_col}`[{i}] AS DOUBLE))"
            for i in range(dim)
        )
    )


def plane_dot_sql(vec_col: str, plane) -> str:
    """The SQL-string form of :func:`plane_dot`, for callers composing it
    into a larger single-parse ``selectExpr`` (one py4j round-trip for a
    whole projection instead of hundreds of Column-operator calls)."""
    return " + ".join(
        f"(CAST(`{vec_col}`[{i}] AS DOUBLE) * {float(p)!r}D)"
        for i, p in enumerate(plane)
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; for pre-normalized embeddings this equals dot()
    — prefer dot() there (cheaper, and avoids sqrt dialect differences)."""
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))


def dot_vectorized(a: Column, b: Column) -> Column:
    """Arrow-batched numpy dot product — the PRODUCTION fast path.

    ``dot()`` above runs interpreted (higher-order functions are
    CodegenFallback): ~µs per 64-dim row. This pandas_udf receives whole
    Arrow batches and does one numpy matmul-shaped reduction: 10-100×
    faster on wide vectors / large corpora. Trade-off: numpy's pairwise
    summation order differs from strict sequential addition in the last
    ulp, so results are NOT bit-identical to the SQL oracles — use
    ``dot()`` for oracle-paired queries, this for production scoring
    (tests assert 1e-9 agreement).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _dot_np(xs, ys):
        ax = np.asarray(list(xs), dtype="float64")
        ay = np.asarray(list(ys), dtype="float64")
        return pd.Series(np.einsum("ij,ij->i", ax, ay))

    # real annotation objects: the module's postponed annotations (PEP 563
    # strings) are invisible to pandas_udf's signature inference
    _dot_np.__annotations__ = {"xs": pd.Series, "ys": pd.Series, "return": pd.Series}
    return pandas_udf(_dot_np, "double")(a, b)


def grouped_geo_mean(value: Column) -> Column:
    """Grouped-aggregate pandas UDF: geometric mean of a positive metric
    per group (Arrow-batched, one numpy reduction per group) — the
    custom-UDAF escape hatch when no builtin aggregate fits."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _geo(v):
        arr = np.asarray(v, dtype="float64")
        return float(np.exp(np.mean(np.log(arr))))

    _geo.__annotations__ = {"v": pd.Series, "return": float}
    return pandas_udf(_geo, "double")(value)
