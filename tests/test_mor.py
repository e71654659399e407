"""Merge-on-read table semantics (sources/mor.py): contract on
hand-built frames, multi-batch last-wins, compaction equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_schema_copy_spark.sources.mor import MergeOnReadTable


@pytest.fixture()
def table(spark, tmp_path):
    t = MergeOnReadTable(spark, str(tmp_path / "t"), ["k"])
    t.write_base(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
        )
    )
    return t


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def test_delete_then_upsert_contract(spark, table):
    table.delete_keys(spark.createDataFrame([(2,), (3,)], "k long"))
    table.upsert(spark.createDataFrame([(3, "C"), (5, "E")], "k long, v string"))
    # 2 deleted; 3 deleted but upserted -> visible with new value; 5 new
    assert _rows(table.read()) == [(1, "a"), (3, "C"), (4, "d"), (5, "E")]


def test_multi_batch_upsert_last_wins(spark, table):
    table.upsert(spark.createDataFrame([(1, "x1")], "k long, v string"))
    table.upsert(spark.createDataFrame([(1, "x2"), (2, "y2")], "k long, v string"))
    got = dict(_rows(table.read()))
    # exactly one row per key; sequenced log -> the later batch wins
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == "y2"
    assert got[1] == "x2"


def test_interleaved_upsert_delete_upsert_replays_in_order(spark, table):
    """The r5 VERDICT gap: a delete issued AFTER an upsert to the same
    key was silently overridden on read. The sequenced log replays
    upsert(k) -> delete(k) -> upsert(k) correctly at every step."""
    table.upsert(spark.createDataFrame([(1, "u1")], "k long, v string"))
    assert dict(_rows(table.read()))[1] == "u1"
    table.delete_keys(spark.createDataFrame([(1,)], "k long"))
    assert 1 not in dict(_rows(table.read()))  # delete after upsert wins
    table.upsert(spark.createDataFrame([(1, "u2")], "k long, v string"))
    got = dict(_rows(table.read()))
    assert got[1] == "u2"  # re-upsert after delete wins again
    assert set(got) == {1, 2, 3, 4}
    # and the fold preserves the replayed state
    table.compact()
    assert dict(_rows(table.read())) == got


def test_time_travel_read_replays_log_prefix(spark, table):
    table.upsert(spark.createDataFrame([(1, "u1")], "k long, v string"))  # seq 1
    table.delete_keys(spark.createDataFrame([(1,), (4,)], "k long"))  # seq 2
    table.upsert(spark.createDataFrame([(1, "u2")], "k long, v string"))  # seq 3
    assert dict(_rows(table.read(as_of_seq=0))) == {1: "a", 2: "b", 3: "c", 4: "d"}
    assert dict(_rows(table.read(as_of_seq=1)))[1] == "u1"
    at2 = dict(_rows(table.read(as_of_seq=2)))
    assert 1 not in at2 and 4 not in at2
    assert dict(_rows(table.read(as_of_seq=3))) == dict(_rows(table.read()))


def test_compaction_preserves_rows_and_clears_log(spark, table):
    table.delete_keys(spark.createDataFrame([(4,)], "k long"))
    table.upsert(spark.createDataFrame([(2, "B")], "k long, v string"))
    before = _rows(table.read())
    assert table.stats() == {"n_delete_batches": 1, "n_update_batches": 1}
    table.compact()
    assert table.stats() == {"n_delete_batches": 0, "n_update_batches": 0}
    assert _rows(table.read()) == before == [(1, "a"), (2, "B"), (3, "c")]


def test_delete_batch_schema_enforced(spark, table):
    with pytest.raises(AssertionError, match="delete batch columns"):
        table.delete_keys(spark.createDataFrame([(1, "a")], "k long, v string"))
