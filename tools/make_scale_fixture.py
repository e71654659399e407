"""Deterministic scale-up of a fixture directory: replicate every fact
table N times with a fixed key stride so FK relationships stay exact.

Usage:
    python tools/make_scale_fixture.py [src_dir] [dst_dir] [factor]
    # defaults: /root/testdata/sf0.1  .localdata/sf1  10

Replica i shifts every entity key by ``i * STRIDE`` (uniform stride,
comfortably above any key at the source scale), on BOTH sides of each FK
— so joins, walks and subgraph selections behave exactly as a natively
generated fixture of that size would. Dimension tables (region, nation)
are shared across replicas, mirroring TPC-H where their cardinality is
scale-free. Texts/embeddings/timestamps are copied verbatim: replicated
documents and vectors deliberately create cross-replica exact duplicates
and identical-vector neighbors, which stress the dedup/max_df/max_bucket
cap guards — the point of scale testing (r4 VERDICT ask #2).

Generation runs in DuckDB (one streamed UNION ALL per table, no Spark
JVM needed). events.ts is written as TIMESTAMP (micros, NTZ) — the same
physical type the sf0.1 fixture uses; ``sources.tables.load_table``
normalizes either encoding.
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 10_000_000

# table -> columns shifted by replica stride
SHIFTS: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
SHARED_DIMS = ("region", "nation")


def make(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in SHARED_DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, keys in SHIFTS.items():
        repl = ", ".join(f"{k} + i * {STRIDE} AS {k}" for k in keys)
        con.execute(
            f"""
            COPY (
                SELECT src.* REPLACE ({repl})
                FROM '{src}/{t}.parquet' src, range({factor}) r(i)
            ) TO '{dst}/{t}.parquet' (FORMAT PARQUET)
            """
        )
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else ".localdata/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make(src, dst, factor)
