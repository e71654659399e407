"""Registry / check-order invariants (no SparkSession needed).

Round 3 shipped three _CHECK_FIRST names with no implementation behind
them — silently dropped by the old _check_order, so the list claimed
coverage that didn't exist. These tests pin the loud-failure behavior.
"""

from __future__ import annotations

import pytest

from oracle_schema_copy_spark import queries as q


def test_check_order_names_all_resolve():
    names = list(q.queries())  # raises on ghosts / duplicates
    assert set(q._CHECK_FIRST) <= set(names)
    assert set(q._CHECK_LAST) <= set(names)
    assert len(names) == len(set(names)) == len(q.REGISTRY)


def test_r4_deliverables_are_registered_with_oracles():
    names = q.queries()
    oracles = q.oracle_sql()
    for new in (
        "similarity_topk_lsh_vectorized",
        "copy_tree_lineitem_composite",
        "oplog_atomic_replay_orders",
    ):
        assert new in names and new in oracles


def test_ghost_check_order_name_raises():
    q._CHECK_FIRST.append("query_that_does_not_exist")
    try:
        with pytest.raises(ValueError, match="ghosts"):
            q.queries()
    finally:
        q._CHECK_FIRST.remove("query_that_does_not_exist")


def test_never_driver_checked_queries_lead_check_order():
    """VERDICT r4 ask #1 (generalized in r6 to every recorded round):
    queries with no driver row in ANY committed CORRECTNESS_r*.json round record must
    occupy the contiguous front of the check order, so the next driver
    budget lands on exactly the zero-evidence set first."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r[0-9]*.json")):
        seen |= set(json.load(open(f)))
    names = list(q.queries())
    never = [n for n in names if n not in seen]
    if not never:  # every registered query already has a driver row
        return
    # every never-checked name must appear before every already-checked one
    last_never = max(names.index(n) for n in never)
    assert last_never == len(never) - 1, (
        "never-driver-checked queries are not contiguous at the front: "
        f"{[n for n in names[: last_never + 1] if n in seen]}"
    )


def test_driver_mimic_unknown_only_name_fails_fast():
    """VERDICT r4 "what's wrong" #1: a typo'd --only name must exit
    non-zero naming the unknowns, before any Spark work."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, "tools/driver_mimic.py", "/root/testdata/sf0.001", "nope_xyz"],
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert p.returncode == 2
    assert "nope_xyz" in p.stdout


def test_duplicate_check_order_name_raises():
    q._CHECK_LAST.append(q._CHECK_FIRST[0])
    try:
        with pytest.raises(ValueError, match="twice"):
            q.queries()
    finally:
        q._CHECK_LAST.pop()
