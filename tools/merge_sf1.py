"""Merge per-batch mimic artifacts into a committed correctness file.

Usage: python tools/merge_sf1.py batch1.json [batch2.json ...]
Target defaults to CORRECTNESS_sf1.json; override with
SPARK_GRAFT_MERGE_INTO (e.g. CORRECTNESS_sf01.json). Updates counts,
removes merged names from the dropped map, appends a note line."""

from __future__ import annotations

import json
import os
import sys

MAIN = os.environ.get("SPARK_GRAFT_MERGE_INTO", "CORRECTNESS_sf1.json")


def main() -> int:
    d = json.load(open(MAIN))
    d.setdefault("dropped", {})
    added, failed = [], []
    for path in sys.argv[1:]:
        b = json.load(open(path))
        for name, row in b["results"].items():
            fresh = name not in d["results"]
            d["results"][name] = row
            if row.get("status") != "MATCH":
                failed.append(name)
            elif fresh:
                added.append(name)
            d["dropped"].pop(name, None)
    d["n_queries"] = len(d["results"])
    d["n_fail"] = sum(1 for r in d["results"].values() if r.get("status") != "MATCH")
    if added:
        d["note"] = d.get("note", "") + (
            f" | +{len(added)} names ({', '.join(added[:8])}"
            + (", ..." if len(added) > 8 else "")
            + "), single-JVM protocol, all MATCH."
        )
    json.dump(d, open(MAIN, "w"), indent=1)
    print(f"now {d['n_queries']} names, {d['n_fail']} fail; added {len(added)}; failed {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
