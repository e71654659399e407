"""Per-stage resource profile of one registered query at a fixture scale
— the instrument behind the r13/r14 GC-share evidence (OPTIMIZATION_r13.md
§6, OPTIMIZATION_r14.md). For each stage the query ran: executor run time,
executor CPU time, JVM GC time, spill bytes, shuffle bytes.

Usage: python tools/stage_profile.py <sf_dir> <query> [query2 ...]
Prints one JSON line per query: {"query", "wall_sec", "stages": [...],
"totals": {...}} — compare GC share (gc_ms / run_ms) across A/B arms in
the SAME host window only (sf10 walls vary 4x cross-window).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _iter_seq(seq):
    it = seq.iterator()
    while it.hasNext():
        yield it.next()


def profile_query(spark, sf_dir: str, qname: str) -> dict:
    import __spark_entry__ as m

    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()

    def _stages():
        return store.stageList(
            sc._jvm.java.util.ArrayList(),
            False,
            False,
            sc._gateway.new_array(sc._jvm.double, 0),
            sc._jvm.java.util.ArrayList(),
        )

    seen = {s.stageId() for s in _iter_seq(_stages())}
    sc.setJobDescription(f"stage_profile:{qname}")
    t0 = time.perf_counter()
    df = m.queries()[qname](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 2)
    stages = []
    tot = {"run_ms": 0, "cpu_ms": 0, "gc_ms": 0, "spill_bytes": 0}
    for s in _iter_seq(_stages()):
        if s.stageId() in seen:
            continue
        try:
            gc = s.jvmGcTime()
        except Exception:
            gc = -1
        row = {
            "stage": s.stageId(),
            "run_ms": s.executorRunTime(),
            "cpu_ms": s.executorCpuTime() // 1_000_000,
            "gc_ms": gc,
            "spill_bytes": s.memoryBytesSpilled() + s.diskBytesSpilled(),
            "shuffle_read": s.shuffleReadBytes(),
            "shuffle_write": s.shuffleWriteBytes(),
        }
        stages.append(row)
        tot["run_ms"] += row["run_ms"]
        tot["cpu_ms"] += row["cpu_ms"]
        tot["gc_ms"] += max(gc, 0)
        tot["spill_bytes"] += row["spill_bytes"]
    stages.sort(key=lambda r: -r["run_ms"])
    tot["gc_share"] = (
        round(tot["gc_ms"] / tot["run_ms"], 3) if tot["run_ms"] else 0.0
    )
    return {"query": qname, "wall_sec": wall, "totals": tot, "stages": stages}


def main() -> int:
    sf_dir = sys.argv[1]
    from oracle_schema_copy_spark.session import get_spark

    spark = get_spark(
        "stage-profile", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    )
    spark.sparkContext.setLogLevel("ERROR")
    for q in sys.argv[2:]:
        print(json.dumps(profile_query(spark, sf_dir, q)), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
