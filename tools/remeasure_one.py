"""Re-measure one registered query's resource metrics at a fixture scale
(the scale_audit per-query instrument, standalone) — used to verify a
scale fix without re-running the whole audit.

Usage: python tools/remeasure_one.py <sf_dir> <query> [query2 ...]
Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_audit import query_resource_metrics  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    from oracle_schema_copy_spark.session import get_spark

    spark = get_spark("remeasure", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    spark.sparkContext.setLogLevel("ERROR")
    for q in sys.argv[2:]:
        print(json.dumps(query_resource_metrics(spark, sf_dir, q)), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
