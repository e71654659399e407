"""Round-4 operators: integer PageRank, bloom-pruned semi-join, CDC
snapshot diff. (Their registered queries are oracle-gated end-to-end by
test_suite_oracle; these tests pin the operator semantics directly on
hand-checkable inputs.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_schema_copy_spark.operators import bloom, graph, mutate


def test_pagerank_two_node_cycle_is_symmetric_and_mass_conserving(spark):
    # a <-> b: perfect symmetry — ranks must stay equal; with no dangling
    # nodes the only mass loss is integer-division remainders (< outdeg
    # per node per iteration)
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    got = {r.node: r.rank for r in graph.pagerank(edges, iterations=4).collect()}
    assert got["a"] == got["b"]
    # closed form for the symmetric 2-cycle: rank is a fixpoint at unit
    # (0.15u + 0.85u = u), so every iteration returns exactly unit
    assert got["a"] == graph.UNIT


def test_pagerank_star_sinks_rank_into_center(spark):
    # 3 leaves all point at the center; center points at leaf a only
    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("d", "c"), ("c", "a")], ["src", "dst"]
    )
    got = {r.node: r.rank for r in graph.pagerank(edges, iterations=3).collect()}
    assert got["c"] > got["a"] > got["b"]  # a gets c's outflow, b/d only base
    assert got["b"] == got["d"]  # symmetric leaves tie exactly


def test_bloom_semi_join_is_exact_and_prunes(spark):
    keys = spark.range(0, 1000, 7).select(F.col("id").alias("k"))  # 143 keys
    fact = spark.range(10_000).select(F.col("id").alias("k"))
    got = bloom.bloom_semi_join(fact, keys, on="k", m_bits=1 << 12)
    want = fact.join(keys.distinct(), "k", "left_semi")
    assert sorted(r.k for r in got.collect()) == sorted(r.k for r in want.collect())
    # the bloom filter itself must prune most non-members before the join
    packed = bloom.build_bloom(keys, "k", m_bits=1 << 12)
    pruned = fact.filter(bloom.might_contain("k", packed)).count()
    assert pruned < 3000  # 143 true + false positives, far below 10k


def test_snapshot_diff_classifies_all_three_ops(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "s", "v"]
    )
    current = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (4, "d", 40.0)], ["id", "s", "v"]
    )
    got = {r.id: r.op for r in mutate.snapshot_diff(base, current, "id").collect()}
    assert got == {2: "update", 3: "delete", 4: "insert"}  # id 1 unchanged: absent


def test_snapshot_diff_null_safe_comparison(spark):
    base = spark.createDataFrame([(1, None), (2, None)], "id INT, v DOUBLE")
    current = spark.createDataFrame([(1, None), (2, 5.0)], "id INT, v DOUBLE")
    got = {r.id: r.op for r in mutate.snapshot_diff(base, current, "id").collect()}
    assert got == {2: "update"}  # NULL == NULL must not read as a change


def test_bfs_hops_levels_and_unreachable(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], ["src", "dst"]
    )
    got = {r.node: r.hops for r in graph.bfs_hops(edges, "a", max_hops=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}  # d beyond max_hops; x/y unreachable
    full = {r.node: r.hops for r in graph.bfs_hops(edges, "a", max_hops=9).collect()}
    assert full == {"a": 0, "b": 1, "c": 2, "d": 3}  # early-exit on empty frontier


def test_k_core_peel_labels_cascade_and_survivors(spark):
    # Path a-b-c-d plus triangle d-e-f-d: 2-core is exactly the triangle.
    # a (deg 1) peels round 1; b then drops to deg 1 -> round 2; c -> 3.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"), ("f", "d")],
        ["src", "dst"],
    )
    got = {
        r.node: (r.peel_round, r.core_deg)
        for r in graph.k_core_peel(edges, k=2, rounds=6).collect()
    }
    assert got == {
        "a": (1, 0),
        "b": (2, 0),
        "c": (3, 0),
        "d": (None, 2),
        "e": (None, 2),
        "f": (None, 2),
    }


def test_k_core_peel_extra_rounds_are_noops_after_fixpoint(spark):
    # The gated query relies on rounds being a BUDGET, not a semantic
    # knob: once the peel converges, more rounds change nothing. Star
    # graph: leaves peel round 1, the isolated center round 2.
    edges = spark.createDataFrame(
        [("c", "l1"), ("c", "l2"), ("c", "l3")], ["src", "dst"]
    )

    def run(rounds):
        return sorted(
            (r.node, r.peel_round, r.core_deg)
            for r in graph.k_core_peel(edges, k=2, rounds=rounds).collect()
        )

    assert run(3) == run(7)
    assert run(3) == [("c", 2, 0), ("l1", 1, 0), ("l2", 1, 0), ("l3", 1, 0)]
