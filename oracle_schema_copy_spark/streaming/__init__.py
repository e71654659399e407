"""Structured Streaming surface: event-time windowed aggregations
(tumbling / sliding / session), watermark late-data policy, and a custom
stateful operator (applyInPandasWithState).

The reference engine has no streaming at all (SURVEY.md §2.5); this package
is part of the mandated extension surface. Every transformation is written
once against a plain DataFrame and applied unchanged to both the batch
table and the file-source stream — the batch run is what the DuckDB oracle
checks, the streaming run (trigger=availableNow into a memory sink) is
pytest-verified to produce identical rows.
"""

from oracle_schema_copy_spark.streaming.ops import (  # noqa: F401
    events_stream,
    run_stream_to_df,
    session_agg,
    sliding_agg,
    stateful_user_totals_stream,
    tumbling_agg,
    with_late_rows_dropped,
)
