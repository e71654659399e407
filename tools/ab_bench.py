"""Probe-normalized A/B of headline queries between two checkouts
(VERDICT r8 #2). Alternates fresh-JVM bench.py --one runs between the two
trees, recording the CPU-speed probe immediately before and after each
run, so per-sample minima can be compared at matched probe_sec.

Usage: python tools/ab_bench.py <treeA> <treeB> <query[,query...]> <rounds>
Prints one JSON line per (tree, query, round)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def probe() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(5_000_000):
        s += i
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    tree_a, tree_b, queries, rounds = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3].split(","),
        int(sys.argv[4]),
    )
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "SPARK_GRAFT_BENCH_RUNS": os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"),
    }
    for rnd in range(rounds):
        for q in queries:
            for label, tree in (("A", tree_a), ("B", tree_b)):
                p0 = probe()
                r = subprocess.run(
                    [sys.executable, f"{tree}/bench.py", "--one", q],
                    capture_output=True,
                    text=True,
                    timeout=900,
                    env=env,
                    cwd=tree,
                )
                p1 = probe()
                line = next(
                    (
                        ln.removeprefix("BENCH_ONE ")
                        for ln in r.stdout.splitlines()
                        if ln.startswith("BENCH_ONE ")
                    ),
                    None,
                )
                rec = json.loads(line) if line else {"error": r.stderr[-400:]}
                print(
                    json.dumps(
                        {
                            "round": rnd,
                            "tree": label,
                            "query": q,
                            "probe_before": p0,
                            "probe_after": p1,
                            "loadavg": round(os.getloadavg()[0], 2),
                            **rec,
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
