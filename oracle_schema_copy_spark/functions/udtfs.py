"""Python user-defined TABLE functions (Spark 4 `@udtf` surface).

The reference exposes no user-function extension point at all — its only
"functions" are fixed SQL strings (`CopyUtils.java:204-290`); this module
completes OUR engine's UDF-surface contract (SURVEY.md §2.5: pandas/Arrow
scalar UDFs in functions/vectors.py, grouped-map in operators/quality.py,
and — here — table functions that emit a variable number of rows per
input row, consumed via ``LATERAL`` joins in SQL).

Scale posture: a Python UDTF is the SLOW path (per-partition Python
workers; Arrow transfer when ``spark.sql.execution.pythonUDTF.arrow.
enabled`` is on, which ``session.py`` sets). Use it only for logic a
built-in explode/window composition can't express — the registered
``udtf_token_runs`` query exists to pin the API surface and its oracle,
with the run-detection loop itself being genuinely iterative per row.
Everything shuffles AFTER the UDTF only if the consumer asks for it; the
function itself is embarrassingly parallel over input partitions.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token string, run_start bigint, run_len bigint")
class TokenRuns:
    """Runs of the SAME token at consecutive positions within a
    space-tokenized text: one output row per maximal run of length >= 2,
    with the 0-based start position and run length.

    The gaps-and-islands SQL twin (pos - row_number() partition trick)
    proves the semantics; the UDTF form is a single forward pass per
    document."""

    def eval(self, text):  # noqa: ANN001 - UDTF protocol signature
        if text is None:
            return
        toks = text.split(" ")
        n = len(toks)
        i = 0
        while i < n:
            j = i
            while j + 1 < n and toks[j + 1] == toks[i]:
                j += 1
            run_len = j - i + 1
            if run_len >= 2:
                yield toks[i], i, run_len
            i = j + 1


def register_udtfs(spark) -> None:
    """Idempotently register every engine UDTF on the given session."""
    spark.udtf.register("token_runs", TokenRuns)
