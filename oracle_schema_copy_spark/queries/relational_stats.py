"""Relational surface, part 3 of 3 (r10 split of queries/relational.py,
VERDICT r9 #7): statistical profiling (Benford/entropy/Zipf/mutual
information/KS drift), mergeable-sketch contracts (HLL, KLL, theta,
approx top-k), SQL scripting, parameterized GROUP BY ALL, bucketed
no-shuffle joins, and observed pipeline metrics.

Distribution-shape diagnostics generalize the reference's count-only copy
asserts (CopyUtils.java count verification), like the DQ constraint rules
do for row-level checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_schema_copy_spark.queries import query
from oracle_schema_copy_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Statistical profiling family: distribution-shape diagnostics a warehouse
# copy validates beyond row counts (generalizing the reference's
# count-only asserts, like the DQ constraint rules do for row-level checks)
# ---------------------------------------------------------------------------


@query(
    "stats_benford_digits",
    """
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                           1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1),
    t AS (SELECT CAST(count(*) AS DOUBLE) AS tot FROM d)
    SELECT digit, CAST(count(*) AS BIGINT) AS n,
           round(CAST(count(*) AS DOUBLE) / t.tot, 6) AS observed_freq,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_expected
    FROM d, t
    GROUP BY digit, t.tot
    """,
)
def q_stats_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law digit profile of order totals — the classic
    fabricated-data screen: observed first-significant-digit frequencies
    against log10(1 + 1/d). One aggregation over an integer digit key;
    the 1x1 total broadcasts into the frequency projection. floor()
    before the BIGINT cast on BOTH engines — a bare double->bigint cast
    truncates in Spark but rounds in DuckDB."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = orders.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    tot = d.agg(F.count(F.lit(1)).cast("double").alias("__tot"))
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .join(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("__tot"), 6).alias(
                "observed_freq"
            ),
            F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6).alias(
                "benford_expected"
            ),
        )
    )


@query(
    "stats_entropy_by_source",
    """
    WITH c AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
    t AS (SELECT source, CAST(sum(n) AS DOUBLE) AS tot FROM c GROUP BY 1)
    SELECT c.source, CAST(count(*) AS BIGINT) AS n_langs,
           round(sum(-(CAST(n AS DOUBLE) / t.tot)
                     * log2(CAST(n AS DOUBLE) / t.tot)), 6) AS lang_entropy_bits
    FROM c JOIN t USING (source)
    GROUP BY c.source
    """,
)
def q_stats_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each crawl source's language mix — the
    diversity/balance diagnostic of a corpus mixture (0 bits = monolingual
    source; log2(k) = uniform over k languages). Exact counts first (one
    shuffle on (source, lang) — never rows), then the entropy arithmetic
    over the tiny count frame."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("__n"))
    t = c.groupBy("source").agg(F.sum("__n").cast("double").alias("__tot"))
    p = F.col("__n").cast("double") / F.col("__tot")
    return (
        c.join(t, "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_langs"),
            F.round(F.sum(-p * F.log2(p)), 6).alias("lang_entropy_bits"),
        )
    )


@query(
    "stats_zipf_bigram_slope",
    """
    WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
    bg AS (
        SELECT t[i] || ' ' || t[i + 1] AS bigram
        FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)),
    f AS (SELECT bigram, count(*) AS freq FROM bg GROUP BY 1),
    top AS (SELECT bigram, freq FROM f ORDER BY freq DESC, bigram LIMIT 1000),
    r AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, bigram) AS rank
          FROM top)
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           round(regr_slope(log(CAST(freq AS DOUBLE)),
                            log(CAST(rank AS DOUBLE))), 6) AS zipf_slope,
           round(regr_r2(log(CAST(freq AS DOUBLE)),
                         log(CAST(rank AS DOUBLE))), 6) AS fit_r2
    FROM r
    """,
)
def q_stats_zipf_bigram_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over corpus bigrams: the log-log slope and
    R² of the top-1000 terms — the distributional-health screen for a
    training corpus (natural text sits near slope -1; template/boilerplate
    corpora flatten it, near-duplicate floods steepen it). Scale shape:
    the rank is NOT a global window over the vocabulary — the top-1000
    cut runs as a distributed TakeOrderedAndProject (sort+limit), and the
    row_number window only orders those 1000 survivors on one partition.
    The regression itself is regr_slope/regr_r2, identical built-ins on
    both engines."""
    from oracle_schema_copy_spark.functions import text as tf

    docs = load_table(spark, sf_dir, "documents")
    # bigram stream == 2-token shingle stream (zip_with over slices —
    # one split per row; the inline element_at(split(...)) form re-split
    # per element, the r13 HOF-trap fix)
    f = (
        docs.select(F.split("text", " ").alias("__toks"))
        .select(
            F.explode(tf.shingle_stream_from_tokens(F.col("__toks"), 2)).alias(
                "bigram"
            )
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = f.orderBy(F.desc("freq"), F.asc("bigram")).limit(1000)
    r = top.select(
        F.log(F.col("freq").cast("double")).alias("__lf"),
        F.log(
            F.row_number()
            .over(Window.orderBy(F.desc("freq"), F.asc("bigram")))
            .cast("double")
        ).alias("__lr"),
    )
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.round(F.expr("regr_slope(__lf, __lr)"), 6).alias("zipf_slope"),
        F.round(F.expr("regr_r2(__lf, __lr)"), 6).alias("fit_r2"),
    )


@query(
    "stats_mutual_information",
    """
    WITH joint AS (
        SELECT o_orderpriority AS x, o_orderstatus AS y,
               CAST(count(*) AS DOUBLE) AS nxy
        FROM orders GROUP BY 1, 2),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM orders),
    mx AS (SELECT x, sum(nxy) AS nx FROM joint GROUP BY 1),
    my AS (SELECT y, sum(nxy) AS ny FROM joint GROUP BY 1)
    SELECT CAST((SELECT count(*) FROM joint) AS BIGINT) AS n_cells,
           round(sum((nxy / tot.n)
                     * log2((nxy * tot.n) / (mx.nx * my.ny))), 6) AS mi_bits
    FROM joint JOIN mx USING (x) JOIN my USING (y), tot
    """,
)
def q_stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between order priority and status in bits —
    the categorical-association diagnostic (0 = independent columns; a
    copy that scrambles one column relative to the other shifts it).
    One count aggregation builds the contingency table; marginals and
    the MI sum are arithmetic over the tiny (x, y) count frame."""
    orders = load_table(spark, sf_dir, "orders")
    joint = (
        orders.groupBy(
            F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("__nxy"))
    )
    tot = orders.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    mx = joint.groupBy("x").agg(F.sum("__nxy").alias("__nx"))
    my = joint.groupBy("y").agg(F.sum("__nxy").alias("__ny"))
    cells = joint.agg(F.count(F.lit(1)).cast("bigint").alias("n_cells"))
    mi = (
        joint.join(mx, "x")
        .join(my, "y")
        .join(F.broadcast(tot))
        .agg(
            F.round(
                F.sum(
                    (F.col("__nxy") / F.col("__n"))
                    * F.log2(
                        (F.col("__nxy") * F.col("__n"))
                        / (F.col("__nx") * F.col("__ny"))
                    )
                ),
                6,
            ).alias("mi_bits")
        )
    )
    return cells.join(F.broadcast(mi))


@query(
    "sketch_hll_merge_contract",
    """
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_nd,
           TRUE AS merged_within_5pct,
           TRUE AS global_within_5pct
    FROM lineitem
    """,
)
def q_sketch_hll_merge_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache DataSketches HLL mergeability contract (Spark 4 datasketches
    surface): per-returnflag HLL sketches of l_partkey union-merged with
    hll_union_agg, and one global sketch, must BOTH estimate within 5% of
    exact NDV. The merge property is what distributes a 100 TB NDV:
    per-partition sketches + a tiny register merge, no global distinct
    expand. Measured nuance, documented rather than hidden: the union
    path re-targets registers through the datasketches union gadget, so
    merged and single-pass estimates are NOT bit-equal (sf0.01: 1991
    merged vs 2023 global vs 2000 exact) — the contract is the epsilon
    band, same as agg_approx_distinct_contract. Booleans are TRUE in the
    oracle; drift past the band turns the row red."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    per = li.groupBy("l_returnflag").agg(F.hll_sketch_agg("l_partkey").alias("sk"))
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("m_est")
    )
    glob = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("g_est"),
        F.count_distinct("l_partkey").alias("exact_nd"),
    )
    exact_d = F.col("exact_nd").cast("double")
    return glob.crossJoin(merged).select(
        F.col("exact_nd").cast("long").alias("exact_nd"),
        (F.abs(F.col("m_est").cast("double") - exact_d) <= 0.05 * exact_d).alias(
            "merged_within_5pct"
        ),
        (F.abs(F.col("g_est").cast("double") - exact_d) <= 0.05 * exact_d).alias(
            "global_within_5pct"
        ),
    )


@query(
    "sketch_kll_quantile_contract",
    """
    SELECT CAST(round(100 * percentile_cont(0.45)
                      WITHIN GROUP (ORDER BY l_extendedprice)) AS BIGINT)
               AS exact_p45_cents,
           CAST(round(100 * percentile_cont(0.55)
                      WITHIN GROUP (ORDER BY l_extendedprice)) AS BIGINT)
               AS exact_p55_cents,
           TRUE AS merged_median_in_band
    FROM lineitem
    """,
)
def q_sketch_kll_quantile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile-sketch mergeability contract: per-returnflag KLL
    sketches over integer price cents, merged with kll_sketch_merge, must
    put the merged median inside the exact P45-P55 band. KLL's rank error
    at the default k is ~1% (randomized compaction — hence a band
    contract, not equality); the merge property is what distributes a
    100 TB quantile: per-partition sketches + one tiny merge, no global
    sort. Oracle states the band bounds exactly and the boolean TRUE."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    per = li.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_bigint("cents").alias("sk")
    )
    # kll_sketch_merge_bigint is a BINARY merge, not an aggregate: fold
    # the collected per-group sketches with the aggregate() HOF (first
    # sketch seeds the accumulator)
    merged = per.agg(F.collect_list("sk").alias("sks")).select(
        F.kll_sketch_get_quantile_bigint(
            F.aggregate(
                F.slice(F.col("sks"), 2, 1_000_000),
                F.element_at(F.col("sks"), 1),
                lambda acc, s: F.kll_sketch_merge_bigint(acc, s),
            ),
            F.lit(0.5),
        ).alias("m_p50")
    )
    bands = li.agg(
        F.round(F.expr("percentile(cents, 0.45D)")).cast("long").alias("exact_p45_cents"),
        F.round(F.expr("percentile(cents, 0.55D)")).cast("long").alias("exact_p55_cents"),
    )
    return bands.crossJoin(merged).select(
        "exact_p45_cents",
        "exact_p55_cents",
        (
            (F.col("m_p50") >= F.col("exact_p45_cents"))
            & (F.col("m_p50") <= F.col("exact_p55_cents"))
        ).alias("merged_median_in_band"),
    )


@query(
    "sketch_theta_setops_contract",
    """
    WITH c95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'),
    c96 AS (SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31')
    SELECT CAST((SELECT count(*) FROM (SELECT * FROM c95 UNION SELECT * FROM c96)) AS BIGINT)
               AS exact_union,
           CAST((SELECT count(*) FROM c95 WHERE o_custkey IN (SELECT o_custkey FROM c96)) AS BIGINT)
               AS exact_intersect,
           CAST((SELECT count(*) FROM c95 WHERE o_custkey NOT IN (SELECT o_custkey FROM c96)) AS BIGINT)
               AS exact_difference,
           TRUE AS union_within_5pct,
           TRUE AS intersect_within_5pct,
           TRUE AS difference_within_5pct
    """,
)
def q_sketch_theta_setops_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA contract (Spark 4 datasketches surface):
    unlike HLL, theta sketches support intersection and difference, not
    just union — the sketch family for 'how many 1995 customers also
    ordered in 1996' over 100 TB without a distinct self-join. Two
    per-year sketches of o_custkey; theta_union / theta_intersection /
    theta_difference estimates must each land within 5% of the exact set
    cardinalities (at this sample-free sketch size estimates are exact;
    the band keeps the contract honest if defaults change). Oracle states
    the exact counts and three TRUEs."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    sk95 = o.filter(
        F.col("o_orderdate").between("1995-01-01", "1995-12-31")
    ).agg(F.expr("theta_sketch_agg(o_custkey)").alias("s95"))
    sk96 = o.filter(
        F.col("o_orderdate").between("1996-01-01", "1996-12-31")
    ).agg(F.expr("theta_sketch_agg(o_custkey)").alias("s96"))
    ex95 = o.filter(F.col("o_orderdate").between("1995-01-01", "1995-12-31")).select(
        F.col("o_custkey")
    ).distinct()
    ex96 = o.filter(F.col("o_orderdate").between("1996-01-01", "1996-12-31")).select(
        F.col("o_custkey")
    ).distinct()
    exact = (
        ex95.unionAll(ex96).distinct().agg(F.count(F.lit(1)).alias("exact_union"))
        .crossJoin(
            ex95.join(ex96, "o_custkey", "left_semi").agg(
                F.count(F.lit(1)).alias("exact_intersect")
            )
        )
        .crossJoin(
            ex95.join(ex96, "o_custkey", "left_anti").agg(
                F.count(F.lit(1)).alias("exact_difference")
            )
        )
    )
    est = sk95.crossJoin(sk96).select(
        F.expr("theta_sketch_estimate(theta_union(s95, s96))").alias("e_u"),
        F.expr("theta_sketch_estimate(theta_intersection(s95, s96))").alias("e_i"),
        F.expr("theta_sketch_estimate(theta_difference(s95, s96))").alias("e_d"),
    )

    def band(est_col, exact_col):
        e = F.col(exact_col).cast("double")
        return F.abs(F.col(est_col).cast("double") - e) <= 0.05 * e

    return exact.crossJoin(est).select(
        F.col("exact_union").cast("long").alias("exact_union"),
        F.col("exact_intersect").cast("long").alias("exact_intersect"),
        F.col("exact_difference").cast("long").alias("exact_difference"),
        band("e_u", "exact_union").alias("union_within_5pct"),
        band("e_i", "exact_intersect").alias("intersect_within_5pct"),
        band("e_d", "exact_difference").alias("difference_within_5pct"),
    )


@query(
    "sql_scripting_threshold_loop",
    """
    WITH rev AS (
        SELECT o_custkey, CAST(round(100 * sum(o_totalprice)) AS BIGINT) AS revenue_cents
        FROM orders GROUP BY o_custkey),
    tot AS (SELECT count(*) // 10 AS k FROM rev),
    ks AS (SELECT CAST(100000 * (1::BIGINT << i) AS BIGINT) AS t
           FROM generate_series(0, 40) AS g(i)),
    counts AS (SELECT t, (SELECT count(*) FROM rev WHERE revenue_cents > t) AS n FROM ks),
    fin AS (SELECT min(t) AS t FROM counts, tot WHERE n <= tot.k)
    SELECT r.o_custkey, r.revenue_cents, fin.t AS threshold_cents
    FROM rev r, fin WHERE r.revenue_cents > fin.t
    """,
)
def q_sql_scripting_threshold_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4): a procedural WHILE loop — double a revenue
    threshold until at most 10% of customers clear it — run as ONE
    scripted SQL statement (DECLARE / WHILE / SET), the migration path
    for stored-procedure logic. All arithmetic is integer cents, the
    doubling sequence is powers of two, and the stop count is an integer
    floor division, so the DuckDB twin finds the identical fixpoint
    declaratively (min t in the doubling grid whose survivor count <=
    n_customers DIV 10; the count is monotone in t). The 10%-of-customers
    stop makes the survivor set non-empty at every fixture scale."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__script_orders")
    return spark.sql(
        """
        BEGIN
          DECLARE t BIGINT DEFAULT 100000;
          DECLARE k BIGINT;
          SET k = (SELECT count(DISTINCT o_custkey) DIV 10 FROM __script_orders);
          WHILE (SELECT count(*) FROM (
                     SELECT o_custkey FROM __script_orders
                     GROUP BY o_custkey
                     HAVING CAST(round(100 * sum(o_totalprice)) AS BIGINT) > t)
                ) > k DO
            SET t = t * 2;
          END WHILE;
          SELECT o_custkey,
                 CAST(round(100 * sum(o_totalprice)) AS BIGINT) AS revenue_cents,
                 t AS threshold_cents
          FROM __script_orders GROUP BY o_custkey
          HAVING CAST(round(100 * sum(o_totalprice)) AS BIGINT) > t;
        END
        """
    )


@query(
    "sql_parameterized_group_by_all",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(100 * o_totalprice) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def q_sql_parameterized_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL ergonomics surface: a PARAMETERIZED query — table name
    bound through the injection-safe IDENTIFIER() clause, the date
    through a named :param — using GROUP BY ALL / ORDER BY ALL. This is
    the templated-SQL migration path (no string interpolation anywhere);
    the oracle is the identical query with bindings inlined and grouping
    spelled out.

    Cents are exact per-ROW BIGINTs summed as integers (o_totalprice is
    2-decimal by construction, so round(100*x) per row is exact) —
    round(100 * sum(double)) drifted by one cent at the sf10 fixture
    once groups reached ~4M doubles (the r9/r10 micro-unit convention's
    drift regime; caught by the r11 100x gate widening). The scripting
    twin keeps round-of-sum: its per-customer groups are sf-invariant
    (~10 rows), permanently below the regime."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__param_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(100 * o_totalprice) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM IDENTIFIER(:tbl)
        WHERE o_orderdate >= :cutoff
        GROUP BY ALL
        ORDER BY ALL
        """,
        args={"tbl": "__param_orders", "cutoff": "1995-01-01"},
    )


@query(
    "sketch_approx_topk_contract",
    """
    SELECT event_type AS item, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q_sketch_approx_topk_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable top-k sketch (Spark 4 approx_top_k family) gated at full
    strength: per-user-parity shards each ACCUMULATE a top-k state,
    COMBINE merges the states, ESTIMATE reads out (item, count) pairs.
    With k >= NDV (5 event types, k=10) the sketch is EXACT, so the
    merged estimate must equal the plain histogram value-for-value — the
    strongest possible mergeability gate, same spirit as
    minhash_merge_contract. At scale this is how per-partition top-k
    states combine into a corpus trending list without a global sort."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 4).alias("__shard")
    )
    acc = ev.groupBy("__shard").agg(
        F.expr("approx_top_k_accumulate(event_type, 10)").alias("st")
    )
    est = acc.agg(F.expr("approx_top_k_combine(st, 10)").alias("c")).select(
        F.explode(F.expr("approx_top_k_estimate(c, 10)")).alias("e")
    )
    return est.select(
        F.col("e.item").alias("item"), F.col("e.count").cast("long").alias("n")
    )


@query(
    "join_bucketed_no_shuffle",
    """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_join_bucketed_no_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketing as a first-class gated query (not just a pytest): both
    fact tables are written bucketed by the join key into the same bucket
    count, and the fact-fact join then requires NO shuffle exchange — the
    scan layout already satisfies the join's distribution. The query
    EXECUTES that claim inline: with broadcast disabled it asserts the
    joined plan contains no Exchange (loud failure if a Spark upgrade or
    layout change ever re-introduces the shuffle), then returns the
    priority rollup. At 100 TB this is the difference between shuffling
    both fact tables per join and shuffling neither, amortized over every
    downstream join on the same key."""
    import shutil

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    # managed-table trap: a FRESH session's catalog does not know the
    # table, but its warehouse directory survives from a prior session
    # and saveAsTable then refuses the location. Drop both the catalog
    # entry and any stale directory before (re)writing.
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("__bkt_orders", "__bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    (
        orders.write
        .bucketBy(16, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("__bkt_orders")
    )
    (
        li.write
        .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("__bkt_lineitem")
    )
    bo, bl = spark.table("__bkt_orders"), spark.table("__bkt_lineitem")
    joined = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # explicit raise, not `assert` (stripped under python -O); the
        # private _jdf/queryExecution hook is the only executed-plan
        # accessor PySpark exposes. Note: the two bucketed-table WRITES
        # above are intentionally inside the query (and therefore inside
        # any timed phase) — the query's claim is layout+join end-to-end.
        plan = joined._jdf.queryExecution().executedPlan().toString()
        if "Exchange" in plan:
            raise RuntimeError(
                f"bucketed join re-introduced a shuffle:\n{plan}"
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # exact per-row integer cents summed as BIGINT (both engines): the 5
    # priority groups grow with the corpus (~12M doubles/group at sf10),
    # where round-of-double-sum drifts — the group-growth-class rule; the
    # r12 sf10 widening caught a 1-cent drift here (third such bug).
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(cents).cast("long").alias("revenue_cents"),
    )


@query(
    "observe_pipeline_metrics",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_len_pass,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM documents
    """,
)
def q_observe_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Observation API — production pipeline health metrics collected
    ON the data flow, not by a second scan: df.observe() attaches
    accumulator-style aggregates that materialize as a side effect of the
    ONE action the pipeline already runs. At 100 TB the alternative is
    re-scanning the corpus for row counts and gate rates; observe() gets
    them for free. The observed metrics are returned as the result frame,
    gated against a plain aggregate twin."""
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents")
    obs = Observation("curation_metrics")
    flowed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_chars") >= 200).cast("long")).alias("n_len_pass"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("sum_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )
    flowed.write.format("noop").mode("overwrite").save()
    m = obs.get

    # on an EMPTY input min/max/sum observe as None — keep them NULL
    # (matching the SQL twin's aggregates) instead of dying in int()
    def _i(x):
        return None if x is None else int(x)

    return spark.createDataFrame(
        [
            (
                int(m["n_docs"]),
                _i(m["n_len_pass"]),
                _i(m["sum_tokens"]),
                _i(m["min_doc_id"]),
                _i(m["max_doc_id"]),
            )
        ],
        "n_docs long, n_len_pass long, sum_tokens long, min_doc_id long, max_doc_id long",
    )


@query(
    "stats_ks_drift_by_source",
    """
    WITH vals AS (SELECT DISTINCT n_chars AS v FROM documents),
    srcs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM documents GROUP BY source),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM documents),
    cnt AS (SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
            FROM documents GROUP BY source, n_chars),
    grid AS (
        SELECT s.source, s.n_src, vals.v, COALESCE(cnt.c, 0) AS c
        FROM srcs s CROSS JOIN vals
        LEFT JOIN cnt ON cnt.source = s.source AND cnt.v = vals.v),
    cum AS (
        SELECT source, n_src, v,
               sum(c) OVER (PARTITION BY source ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS c_src
        FROM grid),
    gcum AS (
        SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c_all
        FROM (SELECT vals.v, COALESCE(t.c, 0) AS c FROM vals
              LEFT JOIN (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
                         FROM documents GROUP BY n_chars) t ON t.v = vals.v)),
    diffs AS (
        SELECT cum.source, cum.n_src, tot.n_tot - cum.n_src AS n_rest,
               abs(cum.c_src * (tot.n_tot - cum.n_src)
                   - (gcum.c_all - cum.c_src) * cum.n_src) AS d
        FROM cum JOIN gcum ON gcum.v = cum.v, tot)
    SELECT source, CAST(n_src AS BIGINT) AS n_src, CAST(n_rest AS BIGINT) AS n_rest,
           CAST(max(d) AS BIGINT) AS ks_numerator,
           round(CAST(max(d) AS DOUBLE) / (n_src * n_rest), 9) AS ks
    FROM diffs GROUP BY source, n_src, n_rest
    """,
)
def q_stats_ks_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detection: the exact two-sample Kolmogorov-
    Smirnov statistic of each source's document-length distribution
    against the REST of the corpus — the screen that catches a crawl
    source whose content shifted even when its row counts look normal.
    Exact by construction: ECDFs are compared cross-multiplied
    (|c_src*n_rest - c_rest*n_src|, an INTEGER), so the max is exact and
    the final single division is IEEE-identical on both engines. Shape:
    one count aggregation, a (sources x distinct-lengths) broadcast grid
    (bounded — length domain, not corpus size), one cumulative window per
    source."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    vals = docs.select(F.col("n_chars").alias("v")).distinct()
    srcs = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    # corpus total derived IN-PLAN from the per-source counts (1-row
    # frame broadcast below) — not a separate driver-side count() job
    tot = srcs.agg(F.sum("n_src").alias("n_tot"))
    cnt = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    grid = (
        srcs.crossJoin(F.broadcast(vals))
        .join(cnt, ["source", "v"], "left")
        .select("source", "n_src", "v", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w_src = (
        Window.partitionBy("source").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "source", "n_src", "v", F.sum("c").over(w_src).alias("c_src")
    )
    gl = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # unpartitioned global-ECDF window: safe because it runs over the
    # DISTINCT length domain (bounded — document lengths, not rows; ~1k
    # values at any corpus scale), never over the corpus itself
    w_all = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gcum = (
        vals.join(gl, "v", "left")
        .select("v", F.coalesce("c", F.lit(0)).alias("c"))
        .select("v", F.sum("c").over(w_all).alias("c_all"))
    )
    diffs = cum.join(gcum, "v").crossJoin(F.broadcast(tot)).select(
        "source",
        "n_src",
        (F.col("n_tot") - F.col("n_src")).alias("n_rest"),
        F.abs(
            F.col("c_src") * (F.col("n_tot") - F.col("n_src"))
            - (F.col("c_all") - F.col("c_src")) * F.col("n_src")
        ).alias("d"),
    )
    return diffs.groupBy("source", "n_src", "n_rest").agg(
        F.max("d").cast("long").alias("ks_numerator"),
        F.round(
            F.max("d").cast("double") / (F.col("n_src") * F.col("n_rest")), 9
        ).alias("ks"),
    ).select(
        "source",
        F.col("n_src").cast("long").alias("n_src"),
        F.col("n_rest").cast("long").alias("n_rest"),
        "ks_numerator",
        "ks",
    )

