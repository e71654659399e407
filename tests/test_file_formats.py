"""Generic file-format source/sink round trips (csv/json/orc/parquet)."""

from __future__ import annotations

import pytest

from oracle_schema_copy_spark.sources.tables import (
    load_table,
    read_file_table,
    write_file_table,
)


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "parquet"])
def test_roundtrip_preserves_rows(spark, sf_dir, tmp_path, fmt):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    write_file_table(nation, path, fmt=fmt)
    back = read_file_table(spark, path, fmt=fmt, schema=nation.schema)
    assert back.count() == 25
    assert back.join(nation, nation.columns).count() == 25


def test_format_inferred_from_extension(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation.json")
    write_file_table(nation, path, fmt="json")
    back = read_file_table(spark, path, schema=nation.schema)
    assert back.count() == 25
