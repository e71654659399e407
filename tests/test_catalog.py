from __future__ import annotations

import pytest

from oracle_schema_copy_spark import catalog as cat


def edges():
    c = cat.tpch_catalog("/root/testdata/sf0.001")
    return c.edges


def test_parse_path_roundtrip():
    pk_of = {"customer": "c_custkey", "orders": "o_orderkey"}
    e = cat.parse_path("CUSTOMER->ORDERS.O_CUSTKEY", pk_of)
    assert e.parent_table == "customer"
    assert e.parent_column == "c_custkey"
    assert e.child_table == "orders"
    assert e.child_column == "o_custkey"


def test_parse_path_rejects_garbage():
    with pytest.raises(ValueError):
        cat.parse_path("customer orders", {"customer": "c_custkey"})


def test_parse_path_requires_parent_pk():
    with pytest.raises(KeyError):
        cat.parse_path("CUSTOMER->ORDERS.O_CUSTKEY", {})


def test_tables_and_root_from_paths():
    paths = ["CUSTOMER->ORDERS.O_CUSTKEY", "ORDERS->LINEITEM.L_ORDERKEY"]
    assert cat.tables_from_paths(paths) == {"customer", "orders", "lineitem"}
    assert cat.root_table_of_paths(paths) == "customer"


def test_topo_sort_parent_before_child():
    c = cat.tpch_catalog("/root/testdata/sf0.001")
    tables = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
    order = cat.topo_sort(tables, c.edges)
    pos = {t: i for i, t in enumerate(order)}
    for e in c.edges:
        assert pos[e.parent_table] < pos[e.child_table], e.name
    assert set(order) == set(tables)


def test_topo_sort_raises_on_cycle():
    es = [
        cat.FkEdge("a->b", "a", "ak", "b", "bfk"),
        cat.FkEdge("b->a", "b", "bk", "a", "afk"),
    ]
    with pytest.raises(ValueError, match="forward progress"):
        cat.topo_sort(["a", "b"], es)


def test_topo_sort_ignores_self_edges():
    es = [cat.FkEdge("a->a", "a", "ak", "a", "parent_id")]
    assert cat.topo_sort(["a"], es) == ["a"]


def test_topo_depth():
    c = cat.tpch_catalog("/root/testdata/sf0.001")
    tables = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
    d = cat.topo_depth(tables, c.edges)
    assert d["region"] == 0 and d["part"] == 0
    assert d["nation"] == 1
    assert d["customer"] == 2 and d["supplier"] == 2
    assert d["orders"] == 3
    assert d["lineitem"] == 4


def test_edge_exclusion_both_orientations():
    es = edges()
    kept = cat.filter_edges(es, ["nation.n_nationkey=customer.c_nationkey"])
    kept2 = cat.filter_edges(es, ["customer.c_nationkey=nation.n_nationkey"])
    assert kept == kept2
    assert len(kept) == len(es) - 1
    assert not any(e.child_table == "customer" for e in kept)


def test_edge_exclusion_rejects_bad_spec():
    with pytest.raises(ValueError):
        cat.filter_edges(edges(), ["customer=nation"])


def test_table_exclusion():
    kept = cat.exclude_tables(["a", "b", "c"], {"B"})
    assert kept == ["a", "c"]


def test_composite_pk_fast_path_guard():
    c = cat.tpch_catalog("/root/testdata/sf0.001")
    with pytest.raises(ValueError, match="more than one column"):
        c.single_pk("lineitem")
    assert c.single_pk("orders") == "o_orderkey"
