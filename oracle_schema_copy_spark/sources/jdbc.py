"""JDBC source/sink: the database-facing half of the engine.

Reference analogs: connection factory (``Main.java:46-58``,
``SqlUtils.groovy:20-32``), direct-execute target (``ExecuteTarget.java``),
batched INSERT (``CopyUtils.java:805-834``), and the Gradle prod-URL guard
(``GradleUtils.groovy:42-51``).

No database ships in this environment, so this module is exercised by
unit tests on its config/SQL-generation logic only; the Spark calls are
the standard ``spark.read/write.jdbc`` surface.

Scale notes baked into the defaults:
- reads partition on a numeric column (``partitionColumn/lowerBound/
  upperBound/numPartitions``) so a 100 TB table fans out across executors
  instead of one connection;
- ``pushDownPredicate`` (default on) sends filters to the database;
- writes batch at ``batchsize`` (the reference's 500 → 10k default here,
  modern drivers handle it) and cap ``numPartitions`` to bound concurrent
  connections.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


class ProductionGuardError(RuntimeError):
    pass


def prod_check(url: str, *, allow_production: bool = False) -> None:
    """Refuse destination URLs that look like production unless explicitly
    allowed (the reference's -PdstProduction guard)."""
    if "prod" in url.lower() and not allow_production:
        raise ProductionGuardError(
            f"destination JDBC url {url!r} looks like production; "
            "pass allow_production=True to proceed"
        )


@dataclass
class JdbcConnection:
    """Alias -> connection info (the reference's ~/.oracle-schema-copy
    properties file becomes an explicit config object)."""

    url: str
    user: str = ""
    password: str = ""
    driver: str | None = None
    options: dict[str, str] = field(default_factory=dict)

    def spark_options(self) -> dict[str, str]:
        opts = {"url": self.url, **self.options}
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        if self.driver:
            opts["driver"] = self.driver
        return opts


def read_table(
    spark: SparkSession,
    conn: JdbcConnection,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    predicate: str | None = None,
) -> DataFrame:
    """Partitioned JDBC table read; single-connection only when no
    partition column is given (fine for dimension tables)."""
    reader = spark.read.format("jdbc").options(**conn.spark_options())
    src = f"(SELECT * FROM {table} WHERE {predicate}) t" if predicate else table
    reader = reader.option("dbtable", src)
    if partition_column is not None:
        assert lower_bound is not None and upper_bound is not None
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def read_table_keyed(
    spark: SparkSession,
    conn: JdbcConnection,
    table: str,
    key_column: str,
    keys,
    *,
    keys_per_probe: int = 1000,
) -> DataFrame:
    """Keyed scan PUSHED to the database: ``WHERE key IN (...)`` batched
    ``keys_per_probe`` keys per probe, one probe per Spark partition
    (``DataFrameReader.jdbc(predicates=...)``) so probes run in parallel
    over separate connections. The database answers each probe with an
    index lookup; only matching rows cross the wire.

    This is SURVEY §4's custom-strategy candidate for walking a subgraph
    OUT of a live database (``S2 keyed scan``): the A/B against the
    default read-all + Spark semi-join is tools/inlist_ab.py, recorded in
    BENCH_NOTES_r10.md — pushed probes win when the frontier is a small
    fraction of the child table (the common copy_tree shape) because the
    read-all path ships the entire child table through JDBC first.

    ``keys`` is a driver-side sequence — bounded by the same
    ``max_inline_keys``-scale contract as the keyed-delete path (key
    lists, never rows, and a frontier larger than that belongs on the
    staged/semi-join path anyway).
    """
    from oracle_schema_copy_spark.sources.jdbc_mutations import sql_literal

    # dedupe: predicates must partition the keyspace DISJOINTLY — a key
    # landing in two probe batches would return its rows twice. None is
    # dropped, not rendered: a bare NULL inside IN (...) is a syntax error
    # on Derby (found by the r12 hypothesis probe test), and SQL equality
    # can never match a NULL key anyway — dropping preserves semantics.
    ks = list(dict.fromkeys(k for k in keys if k is not None))
    if not ks:
        # no keys -> empty probe; one FALSE predicate keeps the schema
        preds = ["1 = 0"]
    else:
        preds = [
            f"{key_column} IN ({', '.join(sql_literal(k) for k in ks[i : i + keys_per_probe])})"
            for i in range(0, len(ks), keys_per_probe)
        ]
    props = {k: v for k, v in conn.spark_options().items() if k != "url"}
    return spark.read.jdbc(conn.url, table, predicates=preds, properties=props)


def read_table_keyed_staged(
    spark: SparkSession,
    conn: JdbcConnection,
    table: str,
    key_column: str,
    keys_df: DataFrame,
    *,
    allow_production: bool = False,
    write_options: dict[str, str] | None = None,
) -> DataFrame:
    """Keyed scan for frontiers ABOVE the inline budget (VERDICT r10 #7):
    the key DataFrame stages into the database with a parallel batched
    write, the probe is ONE set-oriented join the database answers with
    an index lookup, and the keys NEVER pass through the driver — the
    read twin of the staged-EXISTS delete (``jdbc_mutations.jdbc_delete``).

    The matched rows are materialized eagerly (localCheckpoint) so the
    staging table can be dropped before returning — the result frame has
    no remaining dependency on the database, mirroring the livedb
    read-back convention. Size is bounded by the probe result itself
    (the same rows the pushed path would ship).

    ``write_options`` mirrors ``jdbc_delete``'s passthrough (r11
    ADVICE): a STRING key column stages as CLOB under Derby's default
    overwrite type mapping, and the staging index + equality join then
    fail (CLOB has no equality) — pass
    ``{"createTableColumnTypes": f"{key_column} VARCHAR(n)"}``."""
    from oracle_schema_copy_spark.sources.jdbc_mutations import (
        jvm_statement_executor,
        staging_index_sql,
        staging_name,
    )

    staging = staging_name(table, "probe")
    write_table(
        keys_df.toDF(key_column).distinct(),
        conn,
        staging,
        mode="overwrite",
        allow_production=allow_production,
        write_options=write_options,
    )
    executor = jvm_statement_executor(spark, conn)
    executor([staging_index_sql(staging, [key_column])])
    try:
        probe = (
            f"(SELECT t.* FROM {table} t JOIN {staging} s "
            f"ON t.{key_column} = s.{key_column}) w"
        )
        props = {k: v for k, v in conn.spark_options().items() if k != "url"}
        return spark.read.jdbc(conn.url, probe, properties=props).localCheckpoint(
            eager=True
        )
    finally:
        executor([f"DROP TABLE {staging}"])


def read_table_keyed_auto(
    spark: SparkSession,
    conn: JdbcConnection,
    table: str,
    key_column: str,
    keys_df: DataFrame,
    *,
    max_inline_keys: int = 100_000,
    keys_per_probe: int = 1000,
    allow_production: bool = False,
    write_options: dict[str, str] | None = None,
) -> tuple[DataFrame, str]:
    """The keyed-read strategy matrix as one entry point, mirroring the
    delete verb's automatic scale switch: frontiers up to
    ``max_inline_keys`` collect driver-side (keys only, bounded) and go
    as batched pushed IN-list probes; larger frontiers stage into the
    database and probe with one set-oriented join — no driver collect.
    Returns (rows, path) with path in {'pushed', 'staged'} so callers
    (and the gating oracle) can assert the crossover rule itself."""
    distinct = keys_df.toDF(key_column).distinct()
    n = distinct.count()  # bounded probe: count before any collect
    if n > max_inline_keys:
        return (
            read_table_keyed_staged(
                spark, conn, table, key_column, distinct,
                allow_production=allow_production,
                write_options=write_options,
            ),
            "staged",
        )
    frontier = [r[0] for r in distinct.collect()]  # keys only, bounded
    return (
        read_table_keyed(
            spark, conn, table, key_column, frontier,
            keys_per_probe=keys_per_probe,
        ),
        "pushed",
    )


def read_query(spark: SparkSession, conn: JdbcConnection, query: str) -> DataFrame:
    """Push an arbitrary query to the database (dictionary-view reads:
    the reference's user_objects/user_constraints catalog scans, S4-S6)."""
    return spark.read.format("jdbc").options(**conn.spark_options()).option("query", query).load()


ORACLE_DICTIONARY_QUERIES = {
    # The same dictionary interrogations the reference issues, reusable when
    # the source really is Oracle (S4/S5/S6/S7 via JDBC pushdown).
    "tables": (
        "SELECT object_name FROM user_objects WHERE object_type = 'TABLE' "
        "AND secondary = 'N' AND object_name NOT LIKE 'BIN$%'"
    ),
    "primary_keys": (
        "SELECT ucc.table_name, ucc.column_name, ucc.position "
        "FROM user_constraints uc JOIN user_cons_columns ucc "
        "ON uc.constraint_name = ucc.constraint_name "
        "WHERE uc.constraint_type = 'P'"
    ),
    "fk_edges": (
        "SELECT uc.constraint_name AS name, uccp.table_name AS parent_table, "
        "uccp.column_name AS parent_column, uccc.table_name AS child_table, "
        "uccc.column_name AS child_column "
        "FROM user_constraints uc "
        "JOIN user_cons_columns uccc ON uc.constraint_name = uccc.constraint_name "
        "JOIN user_cons_columns uccp ON uc.r_constraint_name = uccp.constraint_name "
        "AND uccc.position = uccp.position "
        "WHERE uc.constraint_type = 'R'"
    ),
    "columns": (
        "SELECT table_name, column_name, data_type, column_id FROM user_tab_columns "
        "ORDER BY table_name, column_id"
    ),
}


def write_table(
    df: DataFrame,
    conn: JdbcConnection,
    table: str,
    *,
    mode: str = "append",
    batchsize: int = 10_000,
    max_connections: int = 16,
    allow_production: bool = False,
    write_options: dict[str, str] | None = None,
) -> None:
    """Batched JDBC write (K1/K3). Caps write parallelism so a wide cluster
    doesn't open thousands of connections against the database.
    ``write_options`` carries per-write, table-specific options — e.g.
    ``createTableColumnTypes`` so overwrite-mode staging tables get
    comparable VARCHAR strings instead of a dialect's CLOB default."""
    prod_check(conn.url, allow_production=allow_production)
    # coalesce never increases partition count, so this caps concurrent
    # connections without the plan->RDD conversion a getNumPartitions()
    # probe would force, and without a shuffle
    df = df.coalesce(max_connections)
    (
        df.write.format("jdbc")
        .options(**conn.spark_options())
        .options(**(write_options or {}))
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
        .save()
    )
