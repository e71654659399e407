"""Planted-violation tests for operators/constraints.py: each rule family
must count exactly the violations planted in a tiny frame (the registered
dq_constraint_checks query only ever sees clean fixture data, so these
prove the rules actually fire)."""

from __future__ import annotations

import pytest

from oracle_schema_copy_spark.operators import constraints as dq


@pytest.fixture(scope="module")
def frames(spark):
    rows = [
        # (k, status, price, fk)
        (1, "O", 10.0, 100),
        (1, "F", -5.0, 100),  # duplicate k, negative price
        (2, "X", 20.0, 999),  # bad status, dangling fk
        (3, None, None, None),  # null status/price/fk
    ]
    df = spark.createDataFrame(rows, "k long, status string, price double, fk long")
    dim = spark.createDataFrame([(100,), (200,)], "ref long")
    return df, dim


RULES = [
    dq.Rule("fk_not_null", "not_null", ("fk",)),
    dq.Rule("k_unique", "unique", ("k",)),
    dq.Rule("status_accepted", "accepted_values", ("status",), values=("O", "F", "P")),
    dq.Rule("price_range", "in_range", ("price",), lo=0.0, hi=100.0),
    dq.Rule("fk_ref", "foreign_key", ("fk",), ref_column="ref"),
]


def test_planted_violations(frames):
    df, dim = frames
    out = dq.validate(df, RULES, dims={"fk_ref": dim})
    got = {r["rule"]: r["n_violations"] for r in out.collect()}
    assert got == {
        "fk_not_null": 1,  # row 4
        "k_unique": 1,  # one surplus row for k=1
        "status_accepted": 1,  # 'X' (null is not a violation)
        "price_range": 1,  # -5.0 (null is not a violation)
        "fk_ref": 2,  # 999 dangles; NULL fk never matches the dim
    }


def test_single_scan_for_row_rules(frames):
    """All non-FK rules compile into ONE aggregate (one scan): the plan
    has exactly one scan of the fact frame."""
    df, dim = frames
    out = dq.validate(df, [r for r in RULES if r.kind != "foreign_key"])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1


def test_unknown_kind_raises(frames):
    df, _ = frames
    with pytest.raises(ValueError, match="unknown rule kind"):
        dq.validate(df, [dq.Rule("bad", "regexp", ("k",))])


def test_empty_input_reports_zero_not_null(frames):
    """ADVICE r4: sum(when(...)) over an empty frame is NULL unless
    coalesced — an empty table must report 0 violations, so a `== 0`
    gate downstream doesn't silently misread NULL."""
    df, _ = frames
    empty = df.limit(0)
    out = dq.validate(empty, [r for r in RULES if r.kind != "foreign_key"])
    got = {r["rule"]: r["n_violations"] for r in out.collect()}
    assert got == {
        "fk_not_null": 0,
        "k_unique": 0,
        "status_accepted": 0,
        "price_range": 0,
    }


def test_quote_in_rule_name_rejected():
    """ADVICE r4: rule names are embedded in generated stack() SQL;
    quotes/backticks must be rejected at construction time."""
    for bad in ("it's", "a`b", "x;drop", "a'||'b"):
        with pytest.raises(ValueError, match="embedded in generated SQL"):
            dq.Rule(bad, "not_null", ("k",))
