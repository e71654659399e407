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


def test_duplicate_check_order_name_raises():
    q._CHECK_LAST.append(q._CHECK_FIRST[0])
    try:
        with pytest.raises(ValueError, match="twice"):
            q.queries()
    finally:
        q._CHECK_LAST.pop()
