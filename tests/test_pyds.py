"""Unit tests for the oplog_history Python Data Source (sources/pyds.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from oracle_schema_copy_spark.plans import oplog
from oracle_schema_copy_spark.sources import pyds


@pytest.fixture()
def log_dir(spark, tmp_path):
    base = str(tmp_path / "log")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    with oplog.OperationLogWriter(base) as log:
        log.ddl(["CREATE TABLE t (k BIGINT, v BIGINT)"])
        log.insert("t", df)
        log.delete("t", "k", df.filter(F.col("k") % 10 == 0).select("k"))
    return base


def test_history_rows_and_stats(spark, log_dir):
    pyds.register(spark)
    hist = (
        spark.read.format("oplog_history").load(log_dir).orderBy("seq").collect()
    )
    assert [(r["seq"], r["kind"], r["table_name"]) for r in hist] == [
        (0, "ddl", None),
        (1, "insert", "t"),
        (2, "delete", "t"),
    ]
    assert hist[0]["n_statements"] == 1 and hist[0]["n_rows"] == 0
    assert hist[1]["n_rows"] == 100 and hist[1]["n_files"] >= 1
    assert hist[2]["n_rows"] == 10
    assert all(r["n_bytes"] > 0 for r in hist[1:])


def test_one_partition_per_op(spark, log_dir):
    pyds.register(spark)
    df = spark.read.format("oplog_history").load(log_dir)
    assert df.rdd.getNumPartitions() == 3


def test_half_written_log_is_unreadable(spark, tmp_path):
    """The manifest only exists after the writer's atomic close-rename:
    an open (crashed) writer's directory must read as no-log, never as a
    partial history."""
    base = str(tmp_path / "open_log")
    log = oplog.OperationLogWriter(base)
    log.ddl(["CREATE TABLE t (x INT)"])  # not closed
    pyds.register(spark)
    with pytest.raises(Exception, match="manifest|No such file|not exist"):
        spark.read.format("oplog_history").load(base).collect()


def test_missing_path_option_raises(spark):
    pyds.register(spark)
    with pytest.raises(Exception, match="path"):
        spark.read.format("oplog_history").load().collect()
