"""Mini-driver: run each suite query on Spark and its DuckDB oracle on the
same parquet, compare row-count + sorted-column values. Mirrors the
verification driver's t2 gate so regressions surface in pytest first."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, (str, bytes)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, duck_df: pd.DataFrame, name: str, float_tol: float = 1e-9) -> None:
    s = _normalize(spark_df.toPandas())
    d = _normalize(duck_df)
    assert len(s) == len(d), f"{name}: row count {len(s)} != oracle {len(d)}"
    assert list(s.columns) == list(d.columns), f"{name}: columns {list(s.columns)} != {list(d.columns)}"
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            sa = sv.astype(float).to_numpy()
            da = dv.astype(float).to_numpy()
            for i, (a, b) in enumerate(zip(sa, da)):
                na, nb = math.isnan(a), math.isnan(b)
                assert na == nb and (na or math.isclose(a, b, rel_tol=float_tol, abs_tol=float_tol)), (
                    f"{name}: col {c} row {i}: {a!r} != {b!r}"
                )
        else:
            mism = (sv.astype(str) != dv.astype(str))
            assert not mism.any(), (
                f"{name}: col {c} first mismatch row {mism.idxmax()}: "
                f"{sv[mism.idxmax()]!r} != {dv[mism.idxmax()]!r}"
            )
