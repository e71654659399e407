"""Split a headline query's timed-sample cost into DRIVER BUILD
(py4j + analysis + any eager checkpoint jobs inside the builder) vs
EXECUTION (.count() on the built frame) — bench.py times the sum.

Usage: python tools/build_exec_profile.py <sf_dir> q1,q2[,...] [reps]

One fresh JVM per query (bench isolation), bench-identical warmup
(two untimed full executions), then ``reps`` samples each recording
(build_sec, exec_sec, total_sec). Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _one(name: str, sf_dir: str, reps: int) -> None:
    from oracle_schema_copy_spark import suite
    from oracle_schema_copy_spark.session import get_spark

    fn = suite.headline_queries()[name]
    spark = get_spark(f"oscs-profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    bench._warmup(spark)
    fn(spark, sf_dir).count()
    fn(spark, sf_dir).count()
    rows = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        rows.append({
            "build": round(t1 - t0, 3),
            "exec": round(t2 - t1, 3),
            "total": round(t2 - t0, 3),
        })
    print("PROFILE " + json.dumps({"name": name, "samples": rows}), flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--one":
        _one(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    for name in names:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name, sf_dir, str(reps)],
            capture_output=True, text=True,
        )
        for line in p.stdout.splitlines():
            if line.startswith("PROFILE "):
                print(line[len("PROFILE "):], flush=True)
                break
        else:
            print(json.dumps({"name": name, "error": p.stderr[-800:]}), flush=True)


if __name__ == "__main__":
    main()
