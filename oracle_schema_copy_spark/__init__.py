"""oracle_schema_copy_spark — a PySpark-native analytics/copy engine.

A ground-up Spark reimplementation of the capabilities of the reference
``oracle-schema-copy`` utility (schema export/import, bulk copy, upsert,
keyed delete, FK-subgraph selection, dependency ordering, operation-log
export/import) plus the large-scale data-pipeline surface the reference
lacks (joins/aggregations/windows, dedup, similarity search, multimodal
columns, text analysis, streaming).

Everything is expressed with the DataFrame/SQL API so Catalyst picks the
physical strategy; driver-side Python handles only bounded orchestration
(FK walks over key frontiers, topo sorts, manifests).
"""

from oracle_schema_copy_spark.catalog import (  # noqa: F401
    Catalog,
    FkEdge,
    parse_paths,
    topo_sort,
)
from oracle_schema_copy_spark.sources.tables import load_table, load_tables  # noqa: F401

__version__ = "0.1.0"
