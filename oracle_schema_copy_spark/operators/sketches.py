"""Count-min sketch: fixed-size, mergeable frequency summaries.

The streaming/approximate counterpart of an exact groupBy-count: a
depth x width grid of counters where every key increments one counter
per row (hash_j(key) mod width), and a key's estimate is the MIN of its
depth counters — never an undercount, overcount bounded by e*N/width
with probability 1 - (1/e)^depth (Cormode & Muthukrishnan 2005).

Spark-first shape: the sketch IS a DataFrame of (row, bucket, cnt) —
depth*width rows regardless of input size — built in ONE scan (explode
to depth probe rows per key, map-side combine collapses them before the
shuffle). Merging sketches across sources/partitions/days is a unionAll
+ groupBy-sum (counter linearity), the same algebra that makes the
MinHash sketches distributable (see queries/pipeline.py
minhash_merge_contract).

Hashes are md5-derived (row index salted into the digest), the one hash
both engines share, so a DuckDB twin reproduces the sketch bit-for-bit
— estimates are deterministic, not just bounded.

At 100 TB: the sketch never grows past depth*width counters, so heavy-
hitter tracking over an unbounded token stream shuffles depth rows per
input row into a grid that fits in one executor's L2 cache; the exact
top-k verify pass joins only the k candidate keys against the grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, row: int, width: int) -> Column:
    """md5-derived counter index for hash row ``row``: first 8 hex digits
    of md5('<row>:' || key) as a positive long, mod width. Mirrored in
    SQL as CAST('0x' || substr(md5(...), 1, 8) AS BIGINT) % width."""
    digest = F.md5(F.concat(F.lit(f"{row}:"), key))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % width


def cms_bucket_sql(key_sql: str, row: int, width: int) -> str:
    """DuckDB twin of :func:`_bucket` — identical digest, digits, mod."""
    return (
        f"CAST(('0x' || substr(md5('{row}:' || {key_sql}), 1, 8)) AS BIGINT)"
        f" % {width}"
    )


def cms_sketch(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the (row, bucket, cnt) counter grid in one scan: each input
    row explodes to ``depth`` (row, bucket) probes; partial aggregation
    collapses them map-side, so the shuffle carries at most depth*width
    rows per task — the sketch size, not the data size."""
    probes = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _bucket(F.col(key_col), j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(probes).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the grid for each key in ``keys``: re-derive the key's
    depth (row, bucket) coordinates, equi-join against the sketch (which
    the planner broadcasts — it is at most depth*width rows), and take
    the MIN counter. Returns (key_col, estimate)."""
    probes = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _bucket(F.col(key_col), j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    probed = keys.select(key_col, F.explode(probes).alias("p")).select(
        key_col, F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket")
    )
    return (
        probed.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("estimate"))
    )
