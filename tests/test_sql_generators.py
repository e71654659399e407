"""Pure-python invariants of the dialect-parameterized SQL generators
(no SparkSession — these guard the strings both engines must share)."""

from __future__ import annotations

import pytest

from oracle_schema_copy_spark.operators import graph, integrity


def test_pagerank_sql_unrolls_requested_iterations():
    sql = graph.pagerank_sql("SELECT 'a' AS src, 'b' AS dst", iterations=4)
    for i in range(5):
        assert f"r{i} AS (" in sql
    assert "r5" not in sql
    # exact-integer contract: floor division, never a float divide
    assert "//" in sql and "/ 100.0" not in sql


def test_row_digest_sql_dialects_share_structure():
    cols = ["k", "v"]
    spark = integrity.row_digest_sql(cols, dialect="spark")
    duck = integrity.row_digest_sql(cols, dialect="duckdb")
    # same concat payload, same hex width, engine-native hex->int casts
    assert "concat_ws('|'" in spark and "concat_ws('|'" in duck
    assert "md5(" in spark and "md5(" in duck
    assert "conv(" in spark and "'0x'" in duck
    with pytest.raises(ValueError):
        integrity.row_digest_sql(cols, dialect="postgres")


def test_zorder_sql_dialects_interleave_identically():
    s = integrity.zorder_code_sql("a", "b", bits=3, dialect="spark")
    d = integrity.zorder_code_sql("a", "b", bits=3, dialect="duckdb")
    # 3 bits per column -> 6 addends in both dialects
    assert s.count(" + ") == 5 and d.count(" + ") == 5
    # spark spells shifts as functions, duckdb as operators
    assert "shiftleft" in s and "<<" not in s
    assert "<<" in d and "shiftleft" not in d
    # a's bit i lands at 2i, b's at 2i+1 (positions appear in both)
    for pos in (0, 2, 4):
        assert f", {pos})" in s or f"<< {pos})" in d


def test_bucket_checksums_sql_mirrors_modulo_and_width():
    sql = integrity.bucket_checksums_sql("orders", "o_orderkey", ["o_orderkey"], buckets=32)
    assert "% 32" in sql and "FROM orders" in sql
