"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    from oracle_schema_copy_spark import suite
    from oracle_schema_copy_spark.session import get_spark

    spark = get_spark("oscs-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Steady-state warmup (not the timed queries): JVM/codegen, shuffle
    # machinery, broadcast path, and the Arrow python-worker pool all have
    # multi-second first-use costs that would otherwise land on whichever
    # query happens to run first.
    from pyspark.sql import functions as F

    r = spark.range(100_000)
    r.groupBy((F.col("id") % 7).alias("k")).count().join(
        F.broadcast(spark.range(7).toDF("k")), "k"
    ).count()
    spark.range(1000).toPandas()

    timings: dict[str, float] = {}
    for name, fn in suite.headline_queries().items():
        # warm the JVM/page cache distinction is irrelevant at this scale;
        # measure plan+execute end-to-end with a count-style action
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
