"""Sequence packing: assign documents to fixed-token-budget training packs.

LLM pre-training concatenates documents into fixed-length sequences
("concat-and-chop"): lay the token stream end to end and cut every
``budget`` tokens. The pack assignment for a document is therefore a pure
function of the running token total before it — expressible as ONE
window cumulative sum, no iteration.

100 TB shape: a single global ordering would funnel everything through
one sort, so packing is done per ``part_col`` group (shard / language /
source) — each group sorts independently after one hash shuffle, exactly
how production packers shard the corpus. Determinism comes from the
explicit ``order_col``, so re-runs reproduce identical packs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int,
    part_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Concat-and-chop pack assignment.

    Adds ``pack_id`` (which pack the document STARTS in), ``pack_offset``
    (token offset inside that pack) and ``straddles`` (1 when the document
    crosses a pack boundary and is split by the chop). Input columns pass
    through unchanged.
    """
    order_col = order_col or id_col
    w = (
        Window.partitionBy(part_col).orderBy(order_col)
        if part_col is not None
        else Window.partitionBy().orderBy(order_col)
    )
    cum_before = F.coalesce(
        F.sum(tokens_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    return (
        df.withColumn("__cum_before", cum_before)
        .withColumn(
            "pack_id", F.floor(F.col("__cum_before") / budget).cast("long")
        )
        .withColumn("pack_offset", (F.col("__cum_before") % budget).cast("long"))
        .withColumn(
            "straddles",
            (F.col("pack_offset") + F.col(tokens_col) > budget).cast("long"),
        )
        .drop("__cum_before")
    )


def shard_assignment(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    n_shards: int = 16,
    salt: str = "shard",
) -> DataFrame:
    """Deterministic training-shard assignment: shard = md5-bucket of the
    id, position = a SECOND independent md5 draw — so reading shards in
    position order is a reproducible global pseudo-shuffle of the corpus
    (the property a training data-loader needs: any engine, any input
    partitioning, same epoch order).

    Adds (shard, pos) to the input rows. The write plan at scale is
    ``df.repartition(n_shards, 'shard')
    .sortWithinPartitions('shard', 'pos')`` + ``partitionBy('shard')``
    (``maxRecordsPerFile`` for chunking) — one shuffle, no global sort.
    ``shard`` must LEAD the sort: a partitioned write requires rows
    ordered by the partition columns and inserts its own NON-STABLE sort
    on them when they are not already the sort prefix, silently
    destroying the epoch order (caught by
    tests/test_pipeline_ops.py::test_shard_assignment_writer_plan).
    This helper keeps the assignment separate so the manifest/
    verification queries and the writer share one definition."""
    sid = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 7),
        16,
        10,
    ).cast("long")
    pos = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}-pos:"), F.col(id_col).cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")
    return df.withColumn("shard", sid % n_shards).withColumn("pos", pos)
