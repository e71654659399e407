"""FK-subgraph selection: the engine's flagship query capability.

Given seed key values in a root table and an ordered list of FK paths
("PARENT->CHILD.FK_COL"), walk the foreign-key graph breadth-wise and
compute, per table, exactly the set of reachable primary keys; then copy
(or delete) those rows.

Reference behavior being re-expressed (not ported):
- walk         ≈ ``walkLinked``      (``CopyUtils.java:533-574``)
- child probe  ≈ ``findLinkedRows``  (``CopyUtils.java:480-531``)
- keyed scan   ≈ ``exportTable(criteriaColumn, ids)`` (``CopyUtils.java:621-670``)
- copy + count assertion ≈ ``copySelections`` (``CopyUtils.java:33-47``)
- delete       ≈ ``deleteSelections`` (``CopyUtils.java:23-31``)

Spark-first design: the reference batches key lists into 500-element
IN-list SQL statements; here every probe is a single ``left_semi`` join
whose build side is the (bounded, cached) key-frontier DataFrame — Catalyst
broadcasts it when small, shuffles when not, and AQE re-plans at runtime.
No driver-side collect of data rows ever happens; only frontier *counts*
are materialized for the copy assertion.

Semantic deltas from the reference, on purpose (SURVEY.md §4 quirks):
- when two declared edges reach the same child table, reachable key sets
  are UNIONED (the reference overwrites, ``CopyUtils.java:566-567``);
- seed/frontier keys are de-duplicated before counting, so the copy
  assertion holds under duplicate root ids;
- composite-PK tables may be walked via any declared single join column.

Scale: frontiers are cached and typically tiny relative to the fact
tables (the use case is subgraph extraction), so every probe compiles to
a broadcast semi-join against a full scan of the child. The broadcast
decision is deliberately LEFT TO THE PLANNER (no explicit hint): an
explicit ``F.broadcast`` is honored regardless of size, so a frontier of
10^8 keys would be collected to the driver and OOM it — whereas the
size-threshold planner plus AQE (which re-plans a shuffled join into a
broadcast join from the runtime map-stage statistics, reading the big
side with local shuffle readers) broadcasts exactly when it's safe.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_schema_copy_spark.catalog import Catalog, FkEdge, parse_paths, root_table_of_paths


@dataclass
class TableSelection:
    """A keyed row-set: (table, key column, distinct key values as a 1-col DF)."""

    table: str
    key_column: str
    keys: DataFrame


def keyed_scan(table_df: DataFrame, key_column: str, keys: DataFrame) -> DataFrame:
    """Rows of ``table_df`` whose ``key_column`` appears in ``keys`` (S2).

    ``keys`` must be a single-column DataFrame; it is the build side of a
    left-semi join — broadcast by the planner/AQE when under the size
    threshold, shuffled when not (no forced hint; see module docstring).
    """
    kcol = keys.columns[0]
    return table_df.join(keys, table_df[key_column] == keys[kcol], "left_semi")


def find_linked_rows(
    child_df: DataFrame, child_column: str, child_pk: str, parent_keys: DataFrame
) -> DataFrame:
    """Child PKs whose FK column matches any parent key (S3): semi-join probe."""
    kcol = parent_keys.columns[0]
    return (
        child_df.join(
            parent_keys, child_df[child_column] == parent_keys[kcol], "left_semi"
        )
        .select(F.col(child_pk))
        # frontiers are key SETS: child_pk may repeat across matched rows
        # (e.g. l_orderkey over lineitem's composite PK), and the frontier
        # is broadcast on the next hop — dedup here keeps it minimal
        .distinct()
    )


def seed_frame(spark: SparkSession, key_column: str, values: Iterable) -> DataFrame:
    """Build the root key frontier from driver-side seed values (bounded)."""
    vals = list(values)
    return spark.createDataFrame([(v,) for v in vals], [key_column]).distinct()


def walk_linked(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    catalog: Catalog,
    paths: list[str],
    root_ids: Iterable | DataFrame,
) -> list[TableSelection]:
    """Walk declared FK edges in order, accumulating reachable keys per table.

    Each declared edge is evaluated exactly once, in order (a bounded
    transitive closure over a user-declared DAG — not a fixpoint, matching
    the reference). Raises if an edge's parent table was never reached.
    """
    edges: list[FkEdge] = parse_paths(paths, catalog.pk_of_map() | _walk_pks(catalog))
    root_table = root_table_of_paths(paths)
    root_pk = _walk_pk(catalog, root_table)

    if isinstance(root_ids, DataFrame):
        roots = root_ids.toDF(root_pk).distinct()
    else:
        roots = seed_frame(spark, root_pk, root_ids)
    roots = roots.cache()

    ids_by_table: dict[str, DataFrame] = {root_table: roots}
    order: list[str] = [root_table]
    key_col: dict[str, str] = {root_table: root_pk}

    for edge in edges:
        parent_ids = ids_by_table.get(edge.parent_table)
        if parent_ids is None:
            raise ValueError(f"could not find path to {edge.parent_table}")
        child = edge.child_table
        child_pk = _walk_pk(catalog, child)
        found = find_linked_rows(tables[child], edge.child_column, child_pk, parent_ids)
        if child in ids_by_table:
            # union semantics (reference overwrites here — documented delta);
            # duplicates across edges are tolerated (see find_linked_rows)
            ids_by_table[child] = ids_by_table[child].union(found).cache()
        else:
            ids_by_table[child] = found.cache()
            order.append(child)
            key_col[child] = child_pk

    return [TableSelection(t, key_col[t], ids_by_table[t]) for t in order]


def copy_selections(
    tables: dict[str, DataFrame], selections: list[TableSelection], assert_counts: bool = True
) -> dict[str, DataFrame]:
    """Materialize each selection's rows (G3). Asserts per-table that the
    scanned rows cover every requested key, like the reference's post-copy
    verification (``CopyUtils.java:44-46``) — but set-based: composite-PK
    tables may legitimately yield more rows than keys.

    All per-table checks are fused into ONE Spark job (a union of tiny
    aggregates) — per-job overhead dominates otherwise, and at scale each
    check is a broadcast semi-join + partial agg, never a shuffle of the
    fact table.
    """
    out: dict[str, DataFrame] = {
        sel.table: keyed_scan(tables[sel.table], sel.key_column, sel.keys)
        for sel in selections
    }
    if assert_counts and selections:
        checks = None
        for sel in selections:
            found = (
                out[sel.table]
                .agg(F.count_distinct(F.col(sel.key_column)).alias("n_found"))
                .select(F.lit(sel.table).alias("table_name"), "n_found")
            )
            want = sel.keys.agg(
                F.count_distinct(F.col(sel.keys.columns[0])).alias("n_keys")
            )
            row = found.crossJoin(want)
            checks = row if checks is None else checks.unionByName(row)
        bad = [r for r in checks.collect() if r.n_found != r.n_keys]
        if bad:
            r = bad[0]
            raise AssertionError(
                f"selection copy of {r.table_name} matched {r.n_found} of {r.n_keys} keys"
            )
    return out


def delete_selections(
    tables: dict[str, DataFrame], selections: list[TableSelection]
) -> dict[str, DataFrame]:
    """Per-table surviving rows after deleting each selection (G4): anti-join.

    Child-before-parent ordering is the caller's responsibility via path
    order, as in the reference; on immutable parquet the result is a
    rewrite, so ordering only matters for JDBC targets.
    """
    out: dict[str, DataFrame] = {}
    for sel in selections:
        kcol = sel.keys.columns[0]
        out[sel.table] = tables[sel.table].join(
            sel.keys,
            tables[sel.table][sel.key_column] == sel.keys[kcol],
            "left_anti",
        )
    return out


def copy_tree(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    catalog: Catalog,
    paths: list[str],
    root_ids: Iterable | DataFrame,
) -> dict[str, DataFrame]:
    """walk + copy: the reference's ``copyTree`` verb (``Main.java:142-155``)."""
    sels = walk_linked(spark, tables, catalog, paths, root_ids)
    return copy_selections(tables, sels)


def delete_tree(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    catalog: Catalog,
    paths: list[str],
    root_ids: Iterable | DataFrame,
) -> dict[str, DataFrame]:
    """walk + delete: the reference's ``deleteTree`` verb (``Main.java:156-169``)."""
    sels = walk_linked(spark, tables, catalog, paths, root_ids)
    return delete_selections(tables, sels)


def _walk_pk(catalog: Catalog, table: str) -> str:
    """Key column used to identify rows of ``table`` during a walk: the
    single-column PK when there is one, else the first PK column (composite
    PK tables are addressed by their leading/declared walk column)."""
    pk = catalog.primary_keys[table.lower()]
    return pk[0]


def _walk_pks(catalog: Catalog) -> dict[str, str]:
    return {t: pk[0] for t, pk in catalog.primary_keys.items()}
