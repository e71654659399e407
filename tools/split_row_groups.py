"""Rewrite single-row-group parquet fixtures into multi-row-group files
with IDENTICAL content (values, order, schema) — VERDICT r13 #5.

The driver's sf0.1 fixture is one row group per table, so every scan is
one task regardless of core count: Spark splits parquet by byte range but
a reader only does work when a row-group MIDPOINT falls inside its range,
so a single-group 10 MB file is always a 1-task scan. That made the
driver's 8-vs-32-core scaling block read ~1.0 for most queries (a fixture
artifact, not a plan property — VERDICT r13 "What's wrong" #3). This tool
re-chunks each file in place and VERIFIES equality (pyarrow Table.equals:
schema + values + order) before atomically replacing the original.

Sizing: aim for ~384 KB of compressed bytes per row group, capped at 32
groups per file (the bench core count) and floored at 1 — small tables
stay single-group, lineitem at sf0.1 (10.8 MB) gets ~28.

Usage: python tools/split_row_groups.py <dir> [--min-bytes 393216] [--max-groups 32]
"""

from __future__ import annotations

import argparse
import glob
import math
import os
import sys

import pyarrow.parquet as pq


def split_file(path: str, min_bytes: int, max_groups: int) -> str:
    size = os.path.getsize(path)
    pf = pq.ParquetFile(path)
    rows = pf.metadata.num_rows
    n_groups = max(1, min(max_groups, size // min_bytes))
    if pf.metadata.num_row_groups >= n_groups or n_groups == 1 or rows == 0:
        return f"{os.path.basename(path)}: kept ({pf.metadata.num_row_groups} rgs)"
    rg_rows = math.ceil(rows / n_groups)
    table = pq.read_table(path)
    tmp = path + ".split.tmp"
    pq.write_table(table, tmp, row_group_size=rg_rows)
    back = pq.read_table(tmp)
    if not (back.schema.equals(table.schema) and back.equals(table)):
        os.remove(tmp)
        raise AssertionError(f"rewrite of {path} is not content-identical")
    mode = os.stat(path).st_mode
    os.replace(tmp, path)
    os.chmod(path, mode)
    got = pq.ParquetFile(path).metadata.num_row_groups
    return f"{os.path.basename(path)}: 1 -> {got} rgs ({rows} rows, {size} B)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dir")
    ap.add_argument("--min-bytes", type=int, default=384 * 1024)
    ap.add_argument("--max-groups", type=int, default=32)
    args = ap.parse_args()
    for path in sorted(glob.glob(os.path.join(args.dir, "*.parquet"))):
        print(split_file(path, args.min_bytes, args.max_groups), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
