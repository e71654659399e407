"""integrity operators: bucket checksums and z-order clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_schema_copy_spark.operators import integrity


def test_bucket_checksum_localizes_a_single_row_change(spark):
    base = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("string").alias("v")
    )
    tampered = base.withColumn(
        "v", F.when(F.col("k") == 123, F.lit("X")).otherwise(F.col("v"))
    )
    a = {r.bucket: (r.n_rows, r.checksum) for r in
         integrity.bucket_checksums(base, "k", ["k", "v"], buckets=16).collect()}
    b = {r.bucket: (r.n_rows, r.checksum) for r in
         integrity.bucket_checksums(tampered, "k", ["k", "v"], buckets=16).collect()}
    diff = [bk for bk in a if a[bk] != b[bk]]
    assert diff == [123 % 16]  # exactly the tampered key's bucket diverges
    assert a[diff[0]][0] == b[diff[0]][0]  # same row count, different checksum


def test_zorder_code_interleaves_bits(spark):
    # a=0b11 -> bits at even positions (1+4); b=0b1 -> bit at position 1
    df = spark.createDataFrame([(3, 1)], ["a", "b"])
    z = df.select(integrity.zorder_code("a", "b", bits=4).alias("z")).first().z
    assert z == 0b111  # a0->pos0, b0->pos1, a1->pos2
    z2 = df.selectExpr("2 AS a", "2 AS b").select(
        integrity.zorder_code("a", "b", bits=4).alias("z")
    ).first().z
    assert z2 == 0b1100  # a1->pos2, b1->pos3


def test_cluster_by_zorder_tightens_partition_envelopes(spark):
    import itertools

    rows = [(a, b) for a, b in itertools.product(range(32), range(32))]
    df = spark.createDataFrame(rows, ["a", "b"]).repartition(16)
    clustered = integrity.cluster_by_zorder(df, "a", "b", bits=5, partitions=16)
    spans = (
        clustered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("a") - F.min("a")).alias("sa"),
            (F.max("b") - F.min("b")).alias("sb"),
        )
        .collect()
    )
    # 1024 points over 16 z-range partitions: every partition's 2-D
    # envelope must be far tighter than the full 31x31 domain
    avg_area = sum((r.sa + 1) * (r.sb + 1) for r in spans) / len(spans)
    assert avg_area <= 0.35 * 32 * 32  # z-order: ~64-point tiles, not slabs


def test_chunk_documents_drops_pure_overlap_tail(spark):
    from oracle_schema_copy_spark.operators import corpus

    # 8 tokens, chunk=4, overlap=2 (stride 2): starts 0,2,4 are real;
    # start 6 covers tokens 7-8 which chunk@4 already fully covered
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c")], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.chunk_id): r.n_tok
        for r in corpus.chunk_documents(
            docs, chunk_tokens=4, overlap=2
        ).collect()
    }
    assert got == {
        (1, 0): 4,  # a b c d
        (1, 1): 4,  # c d e f
        (1, 2): 4,  # e f g h  (start 6: "g h" = pure overlap -> dropped)
        (2, 0): 3,  # short doc: one short chunk
    }


def test_zorder_layout_prunes_2d_predicates_in_parquet_stats(spark, tmp_path):
    """The point of cluster_by_zorder: files written from z-ordered
    partitions carry tight (a, b) min/max envelopes in their parquet
    footers, so a 2-D box predicate can skip most files — where a
    1-D hash layout leaves every file's b-range wide open."""
    import glob

    import itertools
    import pyarrow.parquet as pq

    rows = [(a, b) for a, b in itertools.product(range(32), range(32))]
    df = spark.createDataFrame(rows, ["a", "b"])
    zdir, hdir = str(tmp_path / "z"), str(tmp_path / "h")
    integrity.cluster_by_zorder(df, "a", "b", bits=5, partitions=16).write.parquet(zdir)
    df.repartition(16, "a").write.parquet(hdir)

    def files_touched(d, lo=0, hi=7):
        touched, total = 0, 0
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                total += 1
                stats = {
                    md.row_group(rg).column(i).path_in_schema:
                        md.row_group(rg).column(i).statistics
                    for i in range(md.row_group(rg).num_columns)
                }
                sa, sb = stats["a"], stats["b"]
                if sa.min <= hi and sa.max >= lo and sb.min <= hi and sb.max >= lo:
                    touched += 1
        return touched, total

    zt, ztot = files_touched(zdir)
    ht, htot = files_touched(hdir)
    assert ztot >= 8 and htot >= 8  # enough granularity to mean anything
    # z-order: the 8x8 box lives in a few tiles; hash-on-a: every file's
    # b-range spans the domain, so pruning can only use the a slabs
    assert zt < ht
    assert zt <= ztot // 4
