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
scale-free.

Documents and embeddings are MUTATED per replica, not copied verbatim
(r5 VERDICT ask #3): verbatim copies make every document 10x-duplicated,
so near-dup PAIR cardinality grows ~100x and a dedup bench at sf1
measures the fixture's pair explosion, not the plan. Instead:
- replica i > 0 suffixes every WORD of ``text`` with ``x{i}`` (and
  recomputes ``n_chars``). Word-level shingle overlap WITHIN a replica
  is exactly isomorphic to the source corpus (same jaccard values, same
  planted dup groups), while overlap ACROSS replicas is zero — so dup
  groups, near-dup pairs and connected components all scale linearly
  with the factor, like a real corpus at that size;
- replica i > 0 ROTATES each embedding left by ``i % dim`` components.
  Rotation preserves the unit norm and all WITHIN-replica dot products
  (planted identical/near vectors stay planted per replica), while
  rotations of independent random vectors are near-orthogonal across
  replicas; ``label`` shifts by ``i * LABEL_STRIDE`` so coarse cells
  stay pure and cell count grows with the corpus.
Timestamps are copied verbatim.

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
LABEL_STRIDE = 1000

# per-replica mutation expressions (see module docstring); i = 0 is the
# verbatim source replica in every case
MUTATIONS: dict[str, str] = {
    "documents": """
        CASE WHEN i = 0 THEN text
             ELSE array_to_string(
                 list_transform(string_split(text, ' '), w -> w || 'x' || i),
                 ' ')
        END AS text,
        CASE WHEN i = 0 THEN n_chars
             ELSE CAST(length(array_to_string(
                 list_transform(string_split(text, ' '), w -> w || 'x' || i),
                 ' ')) AS BIGINT)
        END AS n_chars
    """,
    "embeddings": f"""
        CAST(list_concat(embedding[(i % 64) + 1:64], embedding[1:(i % 64)])
             AS FLOAT[]) AS embedding,
        label + i * {LABEL_STRIDE} AS label
    """,
}


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
        if t in MUTATIONS:
            repl += ", " + MUTATIONS[t]
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
