"""Prefix-filter dedup: cap guards must fail LOUDLY, never silently drop.

(Losslessness vs brute force is covered by the hypothesis property test in
test_properties.py and the registered oracle queries; these tests pin the
failure mode of the boilerplate guards.)"""

from __future__ import annotations

import pytest

from oracle_schema_copy_spark.operators import dedup


@pytest.fixture(scope="module")
def boilerplate(spark):
    # five identical docs: every prefix shingle's posting has 5 entries
    rows = [(i, "the same exact boilerplate text repeated here") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_filter_cap_raises(spark, boilerplate):
    out = dedup.prefix_filter_jaccard_pairs(
        boilerplate, "doc_id", "text", threshold=0.3, max_bucket=2
    )
    with pytest.raises(Exception, match="max_bucket"):
        out.collect()


def test_incremental_cap_raises(spark, boilerplate):
    from pyspark.sql import functions as F

    out = dedup.incremental_jaccard_pairs(
        boilerplate, "doc_id", "text", F.col("doc_id") % 2 == 0,
        threshold=0.3, max_posting=2,
    )
    with pytest.raises(Exception, match="max_posting"):
        out.collect()


def test_caps_do_not_fire_below_bound(spark, boilerplate):
    pairs = dedup.prefix_filter_jaccard_pairs(
        boilerplate, "doc_id", "text", threshold=0.3, max_bucket=10
    ).collect()
    # 5 identical docs -> all 10 ordered pairs at jaccard 1.0
    assert len(pairs) == 10 and all(r["jaccard"] == 1.0 for r in pairs)
