"""Table-integrity operators: z-order clustering codes and merkle-style
bucket checksums.

Both serve the reference's core mission — copying tables and proving the
copy is right — at a scale where "prove" cannot mean row-by-row
comparison:

- ``bucket_checksums`` turns a table into ``buckets`` (count, checksum)
  rows. Comparing source and target checksum frames localizes any
  divergence to a 1/buckets key range, which is then re-copied or
  re-diffed (``mutate.snapshot_diff``) alone — the anti-entropy pattern,
  vs the reference's whole-table count asserts
  (``CopyUtils.java:907-917``).
- ``zorder_code`` interleaves the bits of two key columns so that
  range-partitioning by the code co-locates rows that are close in BOTH
  dimensions — the data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER)
  expressed as a plain deterministic column: cluster with
  ``repartitionByRange(z).sortWithinPartitions(z)`` before a parquet
  write and min/max row-group pruning serves 2-D point/range predicates.

Checksums use the md5-derived BIGINT convention every oracle shares
(``functions.text.token_hash``); the per-bucket aggregate is an exact
integer SUM (28-bit terms: no overflow below ~2^35 rows per bucket), so
Spark and any SQL engine agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_digest_sql(cols: list[str], *, dialect: str, hex_digits: int = 7) -> str:
    """Engine-dialect SQL for a deterministic per-row BIGINT digest:
    md5 over '|'-joined columns, first ``hex_digits`` hex chars as an
    integer. One generator emits both dialects so the hash definition
    cannot drift between the Spark plan and its oracle."""
    joined = ", ".join(f"CAST({c} AS {'STRING' if dialect == 'spark' else 'VARCHAR'})" for c in cols)
    concat = f"concat_ws('|', {joined})"
    if dialect == "spark":
        return f"CAST(conv(substring(md5({concat}), 1, {hex_digits}), 16, 10) AS BIGINT)"
    if dialect == "duckdb":
        return f"CAST(('0x' || substr(md5({concat}), 1, {hex_digits})) AS BIGINT)"
    raise ValueError(f"unknown dialect {dialect!r}")


def bucket_checksums(
    df: DataFrame,
    key_col: str,
    cols: list[str],
    *,
    buckets: int = 64,
) -> DataFrame:
    """(bucket, n_rows, checksum) per key-range bucket: bucket is the key
    modulo ``buckets``; checksum is the exact integer sum of per-row md5
    digests over ``cols``. Shuffle carries ``buckets`` rows of partial
    sums (map-side combine), never data — comparing two tables costs one
    scan each regardless of width."""
    digest = F.expr(row_digest_sql(cols, dialect="spark"))
    return (
        df.select(
            F.pmod(F.col(key_col), F.lit(buckets)).cast("long").alias("bucket"),
            digest.alias("__d"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__d").alias("checksum"),
        )
    )


def bucket_checksums_sql(
    table: str, key_col: str, cols: list[str], *, buckets: int = 64
) -> str:
    """DuckDB twin of :func:`bucket_checksums` from the same generator."""
    digest = row_digest_sql(cols, dialect="duckdb")
    return f"""
    SELECT CAST({key_col} % {buckets} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({digest}) AS BIGINT) AS checksum
    FROM {table}
    GROUP BY 1
    """


def zorder_code_sql(col_a: str, col_b: str, *, bits: int = 16, dialect: str) -> str:
    """Bit-interleave SQL (Morton code) for two columns, low ``bits`` bits
    each: a's bit i lands at position 2i, b's at 2i+1. Spark spells shifts
    ``shiftleft/shiftright``; DuckDB uses ``<<``/``>>`` — one generator,
    two dialects, identical arithmetic."""
    terms = []
    for i in range(bits):
        if dialect == "spark":
            a = f"shiftleft(shiftright(CAST({col_a} AS BIGINT), {i}) & 1, {2 * i})"
            b = f"shiftleft(shiftright(CAST({col_b} AS BIGINT), {i}) & 1, {2 * i + 1})"
        elif dialect == "duckdb":
            a = f"((((CAST({col_a} AS BIGINT) >> {i}) & 1)) << {2 * i})"
            b = f"((((CAST({col_b} AS BIGINT) >> {i}) & 1)) << {2 * i + 1})"
        else:
            raise ValueError(f"unknown dialect {dialect!r}")
        terms.append(a)
        terms.append(b)
    return "(" + " + ".join(terms) + ")"


def zorder_code(col_a: str, col_b: str, *, bits: int = 16) -> Column:
    return F.expr(zorder_code_sql(col_a, col_b, bits=bits, dialect="spark"))


def cluster_by_zorder(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    bits: int = 16,
    partitions: int = 64,
) -> DataFrame:
    """Physically cluster rows by their Morton code: range-partition +
    sort-within, so a parquet write produces row groups whose (col_a,
    col_b) min/max envelopes are tight in both dimensions — the layout
    step before data-skipping scans. The code column is dropped; it is
    derivable, not data."""
    z = zorder_code(col_a, col_b, bits=bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
