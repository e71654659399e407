"""A/B: does remove_repeated_spans' span-frame localCheckpoint repay
itself vs recomputing the per-row hashing for both consumers? (ADVICE r8
#3 — the checkpoint pins ~corpus x windows (id, start, hash) rows to
executor memory/disk, which is exactly the footprint class the sf1 notes
blame for co-tenant OOM kills.)

Usage: python tools/checkpoint_ab.py [sf_dir] [rounds]
Prints one JSON line per (variant, round) plus a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from oracle_schema_copy_spark.operators.corpus import remove_repeated_spans
    from oracle_schema_copy_spark.session import get_spark
    from oracle_schema_copy_spark.sources.tables import load_table

    spark = get_spark("ckpt-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    times: dict[bool, list[float]] = {True: [], False: []}
    # warmup once per variant (codegen/JIT)
    for ck in (True, False):
        remove_repeated_spans(docs, checkpoint_spans=ck).count()
    for rnd in range(rounds):
        for ck in (True, False):
            t0 = time.perf_counter()
            n = remove_repeated_spans(docs, checkpoint_spans=ck).count()
            dt = round(time.perf_counter() - t0, 3)
            times[ck].append(dt)
            print(
                json.dumps(
                    {"round": rnd, "checkpoint": ck, "sec": dt, "rows": n}
                ),
                flush=True,
            )
    summary = {
        "sf_dir": sf_dir,
        "checkpoint_min": min(times[True]),
        "recompute_min": min(times[False]),
        "checkpoint_over_recompute": round(min(times[True]) / min(times[False]), 3),
    }
    print("SUMMARY " + json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
