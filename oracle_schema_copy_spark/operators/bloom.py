"""Bloom-filter pruned semi-join — runtime-filter mechanics as an operator.

At 100 TB the dominant cost of ``fact SEMI JOIN keys`` is shuffling the
fact side. Spark's own runtime row-level filtering (InjectRuntimeFilter)
fixes this by building a bloom filter over the build side and pushing a
``might_contain`` probe into the fact scan — but it only fires for plans
the optimizer picks, and ``bloom_filter_agg`` is not exposed as a public
function. This module is the same mechanic as an explicit operator:

1. build: hash every key k ways, map each hash to a bit in an m-bit
   filter, OR the bits together per 64-bit word — a groupBy on word index
   with ``bit_or`` partial aggregation, so the shuffle carries at most
   m/64 rows regardless of key count;
2. collect: the packed words come to the driver — BOUNDED by m/8 bytes
   (16 KiB for the default m = 2^17), the same driver hop Spark's
   runtime filter and every broadcast build makes;
3. probe: the words are embedded as an array literal and each fact row
   tests its k bit positions with shift/AND expressions — whole-stage
   codegen, no UDF, evaluated before the shuffle, so non-matching rows
   die at the scan.

A bloom hit is probabilistic (false positives only), so the pruned frame
feeds an exact semi-join for the final answer — the filter removes
shuffle volume, never correctness. The SQL oracle of any bloom-pruned
query is therefore the plain semi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_positions(col: Column, n_hashes: int, m_bits: int) -> list[Column]:
    """k deterministic bit positions per value: xxhash64 seeded by the
    hash index (an extra literal column folded into the hash input)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(n_hashes)
    ]


def build_bloom(
    keys: DataFrame,
    key_col: str,
    *,
    n_hashes: int = 3,
    m_bits: int = 1 << 17,
) -> list[int]:
    """Distributed bloom build: returns the packed filter as m_bits/64
    signed-long words (index w holds bits [64w, 64w+64)). False-positive
    rate ~ (1 - e^(-k*n/m))^k; the default (k=3, m=2^17) gives < 1% up to
    ~12k distinct keys — size m to the build side, it is the only memory
    the filter ever occupies (16 KiB here; the probe embeds it as a
    constant-folded array literal, so keep m under a few MiB)."""
    assert m_bits % 64 == 0
    pos = keys.select(
        F.explode(F.array(*_bit_positions(F.col(key_col), n_hashes, m_bits))).alias(
            "pos"
        )
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            # shiftleft via expr: the python helper only takes int literals
            F.expr("shiftleft(1L, cast(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("word"))
        .collect()
    )
    packed = [0] * (m_bits // 64)
    for r in words:
        packed[r["w"]] = r["word"]
    return packed


def might_contain(
    col_name: str, packed: list[int], *, n_hashes: int = 3
) -> Column:
    """Codegen'd bloom membership probe against a packed-words literal.

    Built as ONE parsed SQL expression: element-wise ``F.array(*lits)``
    would cost thousands of py4j round-trips per query build (see
    CLAUDE.md's generated-expression lesson), and the shift helpers in the
    python API only accept int-literal shift amounts. Catalyst constant-
    folds the words array to a single Literal, so codegen sees an O(1)
    constant lookup per hash, not a per-row array construction."""
    m_bits = len(packed) * 64
    words_sql = "array(" + ",".join(f"{w}L" for w in packed) + ")"
    probes = []
    for i in range(n_hashes):
        pos = f"pmod(xxhash64(`{col_name}`, {i}), {m_bits})"
        word = f"element_at({words_sql}, cast({pos} DIV 64 AS INT) + 1)"
        probes.append(
            f"(shiftrightunsigned({word}, cast({pos} % 64 AS INT)) & 1L) = 1L"
        )
    return F.expr(" AND ".join(probes))


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    on: str,
    key_col: str | None = None,
    *,
    n_hashes: int = 3,
    m_bits: int = 1 << 17,
) -> DataFrame:
    """``fact`` rows whose ``on`` value appears in ``keys[key_col]`` —
    exact semi-join semantics, with a bloom pre-filter pruning the fact
    side before the join shuffle. Result is row-identical to the plain
    semi-join (the oracle); the bloom only changes where rows are
    dropped."""
    key_col = key_col or on
    packed = build_bloom(keys, key_col, n_hashes=n_hashes, m_bits=m_bits)
    pruned = fact.filter(might_contain(on, packed, n_hashes=n_hashes))
    probe = keys.select(F.col(key_col).alias(on)).distinct()
    return pruned.join(probe, on, "left_semi")
