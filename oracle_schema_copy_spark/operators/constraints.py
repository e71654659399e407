"""Declarative data-quality constraint validation.

The reference's only integrity checks are row-count asserts after a copy
(`CopyUtils.java:44-46` count-equality, `:907-917` per-table tally) —
re-expressed and generalized here into the rule families a warehouse
copy/curation pipeline actually gates on: not-null, primary-key
uniqueness, accepted value domains, numeric ranges, and referential
integrity, each reported as a (rule, n_violations) row.

Plan shape: every ROW-LEVEL rule (not-null / accepted-values / range)
and every uniqueness rule over the same table compiles into ONE
aggregate pass — conditional sums and count_distincts are sibling
aggregate expressions, so N rules cost one scan and one 1-row shuffle,
not N scans. Each foreign-key rule is a broadcast/shuffled LEFT ANTI
join (Catalyst picks by dimension size) reduced to a single count.
The per-rule frames are unioned into one tiny result — at 100 TB the
cost is one pass over the fact table plus one semi-reduction per FK,
the same shape as the engine's copy count-asserts (walk.py fuses those
identically).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One constraint. ``kind`` selects the family:

    - ``not_null``: ``columns[0]`` must not be NULL
    - ``unique``: the ``columns`` tuple must be row-unique (surplus rows
      count as violations)
    - ``accepted_values``: non-null ``columns[0]`` must be in ``values``
    - ``in_range``: non-null ``columns[0]`` must satisfy lo <= x <= hi
    - ``foreign_key``: ``columns[0]`` must exist in ``ref_column`` of the
      dimension frame passed to :func:`validate`
    """

    name: str
    kind: str
    columns: tuple[str, ...]
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    ref_column: str | None = None

    def __post_init__(self) -> None:
        # Rule names are interpolated into a generated stack() SQL string
        # and into alias positions; restrict them to identifier-safe
        # characters so a quote or backtick can't break the generated SQL
        # or mislabel another rule's output.
        if not re.fullmatch(r"[A-Za-z0-9_.:\- ]+", self.name):
            raise ValueError(
                f"rule name {self.name!r} must match [A-Za-z0-9_.:- ]+ "
                "(it is embedded in generated SQL)"
            )


def _row_rule_expr(rule: Rule) -> F.Column:
    c = F.col(rule.columns[0])
    if rule.kind == "not_null":
        bad = c.isNull()
    elif rule.kind == "accepted_values":
        bad = c.isNotNull() & ~c.isin(*rule.values)
    elif rule.kind == "in_range":
        bad = c.isNotNull() & ((c < F.lit(rule.lo)) | (c > F.lit(rule.hi)))
    else:  # pragma: no cover - guarded by validate()
        raise ValueError(f"not a row rule: {rule.kind}")
    return (
        F.coalesce(F.sum(F.when(bad, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias(rule.name)
    )


def validate(
    df: DataFrame, rules: list[Rule], *, dims: dict[str, DataFrame] | None = None
) -> DataFrame:
    """Evaluate every rule against ``df`` -> (rule, n_violations) rows.

    ``dims`` maps a foreign_key rule's name to its dimension DataFrame.
    """
    dims = dims or {}
    agg_exprs: list[F.Column] = []
    fk_frames: list[DataFrame] = []
    for rule in rules:
        if rule.kind in ("not_null", "accepted_values", "in_range"):
            agg_exprs.append(_row_rule_expr(rule))
        elif rule.kind == "unique":
            agg_exprs.append(
                (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in rule.columns]))
                .cast("bigint")
                .alias(rule.name)
            )
        elif rule.kind == "foreign_key":
            dim = dims[rule.name].select(
                F.col(rule.ref_column).alias("__ref")
            )
            fk_frames.append(
                df.select(F.col(rule.columns[0]).alias("__k"))
                .join(dim, F.col("__k") == F.col("__ref"), "left_anti")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
                .select(F.lit(rule.name).alias("rule"), "n_violations")
            )
        else:
            raise ValueError(f"unknown rule kind: {rule.kind}")
    out: DataFrame | None = None
    if agg_exprs:
        wide = df.agg(*agg_exprs)
        stacked = ", ".join(f"'{e}', `{e}`" for e in [r.name for r in rules if r.kind != "foreign_key"])
        out = wide.selectExpr(
            f"stack({len(agg_exprs)}, {stacked}) AS (rule, n_violations)"
        )
    for fk in fk_frames:
        out = fk if out is None else out.unionByName(fk)
    if out is None:
        raise ValueError("no rules given")
    return out
