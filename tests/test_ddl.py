from __future__ import annotations

from pyspark.sql import functions as F

from oracle_schema_copy_spark.plans import ddl
from oracle_schema_copy_spark.sources.tables import load_table


def test_schema_to_ddl_generates_create_table(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    stmt = ddl.schema_to_ddl("customer", cust.schema)
    assert stmt.startswith("CREATE TABLE customer (")
    assert "c_custkey BIGINT" in stmt
    assert "c_acctbal DOUBLE" in stmt
    assert stmt.endswith("USING PARQUET")


def test_generated_ddl_is_executable(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    stmt = ddl.schema_to_ddl("ddl_smoke_customer", cust.schema).replace(
        "CREATE TABLE", "CREATE TABLE IF NOT EXISTS", 1
    )
    try:
        spark.sql(stmt)
        assert spark.catalog.tableExists("ddl_smoke_customer")
    finally:
        spark.sql("DROP TABLE IF EXISTS ddl_smoke_customer")


def test_drop_schema_name():
    s = 'CREATE TABLE "SCOTT"."EMP" ("ID" NUMBER, FOREIGN KEY REFERENCES "SCOTT"."DEPT")'
    out = ddl.drop_schema_name(s, "SCOTT")
    assert '"SCOTT".' not in out
    assert '"EMP"' in out and '"DEPT"' in out


def test_strip_trigger_tail_iterates():
    s = (
        'CREATE OR REPLACE TRIGGER t1 BEFORE INSERT ON emp BEGIN NULL; END;\n'
        'ALTER TRIGGER "SCOTT"."T1" ENABLE;\n'
        "ALTER TRIGGER t1 ENABLE"
    )
    out = ddl.strip_trigger_tail(s)
    assert "ALTER TRIGGER" not in out
    assert out.endswith("END;")


def test_column_rewrites_match_driver_side(spark):
    rows = [
        ('CREATE INDEX "S"."I1" ON "S"."T1"(C1)',),
        ('CREATE TRIGGER trg ...; ALTER TRIGGER "S"."TRG" ENABLE;',),
    ]
    df = spark.createDataFrame(rows, "raw string")
    out = df.select(
        ddl.strip_trigger_tail_col(ddl.drop_schema_name_col(F.col("raw"), "S")).alias("ddl")
    ).collect()
    expected = [ddl.strip_trigger_tail(ddl.drop_schema_name(r[0], "S")) for r in rows]
    assert [r.ddl for r in out] == expected
