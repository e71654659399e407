"""Grouped-map (applyInPandas) data-quality operators.

``mad_outliers`` flags per-group outliers by median absolute deviation —
the robust-statistics filter (|x - median| > k * MAD) every numeric
curation pass needs, immune to the outliers it hunts (unlike z-scores).

Why ``applyInPandas`` and not window/agg composition: the SQL
formulation needs TWO aggregate+join rounds over the data — one to get
each group's median, a second for the median of |x - median| — i.e. two
shuffles plus two joins back. A grouped map computes both medians and
the flags in ONE shuffle of the (group, value) pairs, with numpy doing
the per-group work Arrow-batch-side. This is the documented pattern for
custom operators whose per-group logic composes poorly from built-ins;
medians are order-statistics (no float summation), so numpy and any SQL
engine agree bit-for-bit and the two-round SQL twin is an exact oracle.

Scale: one shuffle on the group key; a group's rows must fit one
executor's memory (pandas materializes the group — same constraint as
any grouped-map). For billion-row groups, pre-aggregate to (group,
value, count) first or fall back to approx quantiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def mad_outliers(
    df: DataFrame,
    *,
    group_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    k: float = 3.0,
) -> DataFrame:
    """(group, id, value, deviation, is_outlier) per row: deviation is
    |value - group median|, outlier iff deviation > k * MAD(group).
    Groups where MAD == 0 (over half the values identical) flag only
    values different from the median, matching the SQL twin's
    ``deviation > 0`` degenerate branch."""
    import pandas as pd  # noqa: F401 — applyInPandas contract

    schema = StructType(
        [
            StructField(group_col, df.schema[group_col].dataType),
            StructField(id_col, LongType()),
            StructField(value_col, DoubleType()),
            StructField("deviation", DoubleType()),
            StructField("is_outlier", BooleanType()),
        ]
    )

    def per_group(pdf):
        import numpy as np

        v = pdf[value_col].to_numpy(dtype="float64")
        med = float(np.median(v))
        dev = np.abs(v - med)
        mad = float(np.median(dev))
        out = dev > (k * mad if mad > 0.0 else 0.0)
        return pdf.assign(deviation=dev, is_outlier=out)[
            [group_col, id_col, value_col, "deviation", "is_outlier"]
        ]

    return (
        df.select(group_col, id_col, value_col)
        .groupBy(group_col)
        .applyInPandas(per_group, schema)
    )
