"""Matched-window alternating stage-profile A/B between two checkouts at a
fixture scale — the wrapper behind AB_SF10_r14*.jsonl (OPTIMIZATION_r14.md
§2 and the continuation-3 pin evidence). Each (tree, query) run is a fresh
process (fresh JVM); the single-thread CPU probe is recorded immediately
before and after every run so records can be read per the CLAUDE.md sf10
rules (compare Σcpu/GC share within matched windows, never wall across
windows).

Usage: python tools/ab_stage_profile.py <treeA> <treeB> <sf_dir> \
           <query[,query...]> <rounds> <out.jsonl>
Appends one JSON line per (tree, query, round): {"tree", "round",
"probe_before", "probe_after", "rec": stage_profile record}.
"""

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


def bw_probe() -> float | None:
    """All-core bandwidth (GB/s) — the single-thread probe alone cannot
    gate sf10 A/B windows (r14 session 4: fastest-ever probe on a host
    with degraded all-core throughput). Same workload as bench._bw_probe."""
    try:
        import threading

        import numpy as np

        threads = min(8, os.cpu_count() or 1)
        words = 1024 * 1024  # 8 MiB/buffer — see bench._bw_probe
        reps = 16
        bufs = [(np.ones(words), np.empty(words)) for _ in range(threads)]
        for src, dst in bufs:  # fault pages in before timing
            np.copyto(dst, src)

        def trial() -> float | None:
            barrier = threading.Barrier(threads + 1)

            def work(i: int) -> None:
                src, dst = bufs[i]
                barrier.wait()
                for _ in range(reps):
                    np.copyto(dst, src)

            ts = [
                threading.Thread(target=work, args=(i,)) for i in range(threads)
            ]
            for t in ts:
                t.start()
            barrier.wait()
            t0 = time.perf_counter()
            for t in ts:
                t.join()
            dt = time.perf_counter() - t0
            return (threads * reps * 2 * words * 8 / 1e9 / dt) if dt > 0 else None

        best = max(filter(None, (trial() for _ in range(3))), default=None)
        return round(best, 2) if best else None
    except Exception:
        return None


def main() -> None:
    tree_a, tree_b, sf_dir, queries, rounds, out = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        sys.argv[4].split(","),
        int(sys.argv[5]),
        sys.argv[6],
    )
    for rnd in range(rounds):
        for q in queries:
            for tree in (tree_a, tree_b):
                # optional all-core bandwidth launch gate (r14 session 4:
                # single-thread probe provably insufficient at sf10) —
                # wait up to SPARK_GRAFT_AB_BW_WAIT s for bw_gbps >=
                # SPARK_GRAFT_AB_BW_GATE, else launch anyway and let the
                # recorded bw_before mark the row as gate-failed
                gate = float(os.environ.get("SPARK_GRAFT_AB_BW_GATE", "0"))
                wait = float(os.environ.get("SPARK_GRAFT_AB_BW_WAIT", "300"))
                deadline = time.monotonic() + wait
                bw0 = bw_probe()
                while (
                    gate
                    and (bw0 or 0) < gate
                    and time.monotonic() < deadline
                ):
                    time.sleep(15)
                    bw0 = bw_probe()
                p0 = probe()
                r = subprocess.run(
                    [sys.executable, f"{tree}/tools/stage_profile.py", sf_dir, q],
                    capture_output=True,
                    text=True,
                    timeout=1800,
                    cwd=tree,
                )
                p1 = probe()
                rec = None
                for line in r.stdout.splitlines():
                    line = line.strip()
                    if line.startswith("{"):
                        try:
                            cand = json.loads(line)
                        except json.JSONDecodeError:
                            continue
                        if cand.get("query") == q:
                            rec = cand
                row = {
                    "tree": tree,
                    "round": rnd + 1,
                    "probe_before": p0,
                    "probe_after": p1,
                    "bw_before": bw0,
                    "bw_after": bw_probe(),
                    "rec": rec,
                }
                if rec is None:
                    row["err"] = (r.stderr or "")[-800:]
                with open(out, "a") as f:
                    f.write(json.dumps(row) + "\n")
                print(
                    f"round {rnd + 1} {q} {tree}: "
                    f"wall={rec and rec.get('wall_sec')} probes={p0}/{p1}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
