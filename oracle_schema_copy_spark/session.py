"""SparkSession factory tuned for this engine.

Used by tests and bench; the verification driver passes its own session
into ``__spark_entry__`` functions, so nothing here is required at query
time — but the configs below document the intended cluster posture:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
- shuffle partitions sized to the local core count (on a real cluster this
  would be ~2-3x total cores; AQE coalesces small ones anyway)
- Arrow enabled for the few pandas-UDF paths (vectorized Python)
- nanosAsLong so parquet TIMESTAMP(NANOS) columns (events.ts) are readable
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def tuning_confs(cpus: int) -> dict[str, str]:
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(max(cpus, 8)),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Python UDTF output rides Arrow too (functions/udtfs.py)
        "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.session.timeZone": "UTC",
        # dim tables (region/nation/customer at test SFs) stay broadcast-able
        "spark.sql.autoBroadcastJoinThreshold": "64MB",
        "spark.sql.files.maxPartitionBytes": "128MB",
        # Parquet scan split target is min(maxPartitionBytes,
        # max(openCostInBytes, totalBytes/defaultParallelism)). The 4MB
        # openCostInBytes default exists to stop tiny-FILE thrash on
        # many-file tables; with single-file fixtures it only FLOORS the
        # split size, so a 10MB multi-row-group table could never split
        # past ~3 tasks on 32 cores. 128KB keeps small fixtures splitting
        # to the core count while changing nothing at production scale,
        # where totalBytes/parallelism >> 4MB dominates the max() anyway
        # (r14; pairs with tools/split_row_groups.py re-chunking the
        # sf0.1 fixture — a single-row-group file is 1 task regardless).
        # CPU-heavy operators additionally repartition (operators.spread)
        # when the scan still arrives under-partitioned.
        "spark.sql.files.openCostInBytes": os.environ.get(
            "SPARK_GRAFT_OPEN_COST", "131072"
        ),
        # local[N] runs all N executor threads inside the driver JVM — an
        # undersized heap turns shuffle/agg working sets into GC storms
        # (observed: same query 5.6s vs 63s run-to-run at 8g). On a real
        # cluster this maps to executor memory, not driver.
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        # ParallelGC, not the Java-17 default G1: with a large heap and 32
        # executor threads, G1's first-touch behavior produced a 30-60×
        # cold-run cliff (measured: the same 1.2s query taking 66-194s on
        # its first execution under G1, stable 1.1-2.0s under ParallelGC).
        # Batch/throughput executors don't need G1's pause targets.
        "spark.driver.extraJavaOptions": (
            "-XX:+UseParallelGC " + os.environ.get("SPARK_GRAFT_EXTRA_JAVA", "")
        ).strip(),
        # collect_list/collect_set aggs use ObjectHashAggregate, which falls
        # back to sort-based aggregation after 128 distinct groups per
        # partition by default — posting-list builds (dedup) have 10⁴-10⁶
        # groups per partition and never want the sort. Env-overridable for
        # scale A/Bs; an sf10 A/B (OPTIMIZATION_r13.md §6) showed the bound
        # never engages even at the 100× fixture (shingle universe stays
        # under 128k groups/partition, zero spill either way), so the r4
        # value is kept — the dedup stages' GC load is allocation churn
        # (collect_list buffer growth), not a too-large live map.
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": os.environ.get(
            "SPARK_GRAFT_OBJAGG_FALLBACK", "4194304"
        ),
    }


def get_spark(app: str = "oracle-schema-copy-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app)
    builder = builder.config("spark.ui.enabled", "false")
    for k, v in tuning_confs(cpus).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
