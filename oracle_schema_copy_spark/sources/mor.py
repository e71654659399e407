"""Merge-on-read parquet table: key-level deletes and upserts WITHOUT
rewriting base data files.

The reference mutates rows only through live JDBC statements
(`DeleteByPk.java:15-43`, `ExecuteTableUpdate` batches); our staged-swap
upsert (`operators/mutate.py`, K4/K5) re-expresses that as copy-on-write
— correct, but a copy-on-write of a 100 TB table rewrites 100 TB to
delete a million rows. This module is the merge-on-read counterpart
(the Iceberg v2 / Delta deletion-vector pattern re-expressed on plain
parquet): mutations append small KEY files; readers subtract them.

Layout under the table root:
    base/      data parquet (immutable between compactions)
    deletes/   key-only parquet, one directory per delete batch
    updates/   full-row parquet, one directory per upsert batch

Read semantics (documented contract, mirrored by every SQL oracle):
    read() = (base ANTI-JOIN all delete keys
                   ANTI-JOIN all update keys)  UNION ALL  updates,
    with LAST-batch-wins dedup among updates to the same key.
    An upserted key is therefore visible even if also deleted — ordered
    replay semantics live in plans/oplog.py; merge-on-read trades that
    for O(|mutation|) write cost.

Scale shape: delete/update key sets are tiny relative to base, so the
anti-joins broadcast (Catalyst picks by size); base file scans stay
pruned/pushed-down because read() is plain DataFrame composition over
parquet scans. ``compact()`` folds the log into a new base via the same
staged-directory-swap used by the oplog warehouse, bounding read
amplification; ``stats()`` reports the log size that triggers it.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class MergeOnReadTable:
    def __init__(self, spark: SparkSession, path: str, key_columns: Sequence[str]):
        self.spark = spark
        self.path = path
        self.key_columns = list(key_columns)

    # -- write side ---------------------------------------------------------

    def write_base(self, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(f"{self.path}/base")

    def delete_keys(self, keys: DataFrame) -> None:
        """Append a delete batch: a key-only frame (columns must equal
        ``key_columns``)."""
        assert set(keys.columns) == set(self.key_columns), (
            f"delete batch columns {keys.columns} != key {self.key_columns}"
        )
        keys.select(*self.key_columns).write.mode("overwrite").parquet(
            f"{self.path}/deletes/b_{uuid.uuid4().hex[:12]}"
        )

    def upsert(self, rows: DataFrame) -> None:
        """Append an upsert batch: full rows, keyed by ``key_columns``."""
        rows.withColumn("__batch", F.lit(uuid.uuid4().hex)).write.mode(
            "overwrite"
        ).parquet(f"{self.path}/updates/b_{uuid.uuid4().hex[:12]}")

    # -- read side ----------------------------------------------------------

    def _log(self, kind: str) -> list[str]:
        d = f"{self.path}/{kind}"
        if not os.path.isdir(d):
            return []
        return sorted(
            f"{d}/{b}" for b in os.listdir(d) if b.startswith("b_")
        )

    def read(self) -> DataFrame:
        base = self.spark.read.parquet(f"{self.path}/base")
        del_dirs = self._log("deletes")
        upd_dirs = self._log("updates")
        out = base
        if del_dirs:
            dels = self.spark.read.parquet(*del_dirs).distinct()
            out = out.join(dels, self.key_columns, "left_anti")
        if upd_dirs:
            ups = self.spark.read.parquet(*upd_dirs)
            # last-batch-wins among updates to the same key: batches are
            # uuid-tagged; "last" is defined as max tag, which is
            # arbitrary-but-deterministic — callers needing true ordering
            # use the oplog. Single-batch upserts (the common case) are
            # unaffected.
            w_cols = [c for c in ups.columns if c != "__batch"]
            latest = (
                ups.withColumn(
                    "__rn",
                    F.row_number().over(
                        Window.partitionBy(*self.key_columns).orderBy(
                            F.desc("__batch")
                        )
                    ),
                )
                .filter(F.col("__rn") == 1)
                .select(*w_cols)
            )
            out = out.join(
                latest.select(*self.key_columns), self.key_columns, "left_anti"
            ).unionByName(latest)
        return out

    # -- maintenance --------------------------------------------------------

    def stats(self) -> dict:
        return {
            "n_delete_batches": len(self._log("deletes")),
            "n_update_batches": len(self._log("updates")),
        }

    def compact(self) -> None:
        """Fold the mutation log into a fresh base (staged swap: write to
        a staging dir, swap in, drop the log) — the read-amplification
        bound. Readers opened after the swap see identical rows."""
        staged = f"{self.path}/base_staged_{uuid.uuid4().hex[:8]}"
        self.read().write.mode("overwrite").parquet(staged)
        old = f"{self.path}/base_old_{uuid.uuid4().hex[:8]}"
        os.rename(f"{self.path}/base", old)
        os.rename(staged, f"{self.path}/base")
        for kind in ("deletes", "updates"):
            shutil.rmtree(f"{self.path}/{kind}", ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
