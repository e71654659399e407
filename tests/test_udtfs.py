"""Edge-case pins for the Python UDTF surface (functions/udtfs.py)."""

from __future__ import annotations

from oracle_schema_copy_spark.functions.udtfs import register_udtfs


def test_token_runs_edges(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [
            (1, "a a b c c c"),  # run at start, singleton, run at end
            (2, "x"),  # single token, no runs
            (3, ""),  # empty text
            (4, None),  # null text
            (5, "z z"),  # whole text is one run
        ],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("__udtf_edge")
    rows = spark.sql(
        """
        SELECT d.doc_id, r.token, r.run_start, r.run_len
        FROM __udtf_edge d, LATERAL token_runs(d.text) r
        """
    ).collect()
    got = sorted((r.doc_id, r.token, r.run_start, r.run_len) for r in rows)
    assert got == [
        (1, "a", 0, 2),
        (1, "c", 3, 3),
        (5, "z", 0, 2),
    ]
