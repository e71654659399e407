"""Relational surface, part 2 of 3 (r10 split of queries/relational.py,
VERDICT r9 #7 — registry names and order preserved byte-identical via the
loader's import sequence): advanced analytics — bloom-pruned semi-joins,
histograms, incremental aggregate maintenance, scalar/correlated
subqueries, winsorized stats, TPC-H-shaped revenue queries, lateral and
recursive SQL, skyline, ABC/RFM/YoY business analytics.

Scale notes are per-query in the docstrings; the family-level contracts
(broadcast dims, pushed filters, one shuffle per window spec) are
inherited from queries/relational.py's module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_schema_copy_spark.queries import query
from oracle_schema_copy_spark.queries.relational import _dec, _dsum2, _one
from oracle_schema_copy_spark.sources.tables import load_table

@query(
    "join_bloom_pruned_semi",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS qty
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 31 = 0)
    GROUP BY l_returnflag
    """,
)
def q_join_bloom_pruned_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join with an explicit bloom-filter runtime pre-filter: the
    build side's keys become a 2^17-bit bloom probed in the fact scan
    (codegen'd shift/AND on xxhash64 positions — rows die before the join
    shuffle), then the exact semi-join removes the false positives. Result
    is row-identical to the plain semi-join, which is the oracle; see
    operators/bloom.py for why this is Spark's own InjectRuntimeFilter
    mechanic as a first-class operator."""
    from oracle_schema_copy_spark.operators import bloom

    lineitem = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 31 == 0)
        .select("o_orderkey")
    )
    pruned = bloom.bloom_semi_join(lineitem, keys, on="l_orderkey", key_col="o_orderkey")
    return pruned.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum2(_dec("l_quantity")).alias("qty"),
    )


@query(
    "histogram_price_buckets",
    """
    SELECT CAST(CASE WHEN l_extendedprice < 0 THEN 0
                     WHEN l_extendedprice >= 120000 THEN 25
                     ELSE floor(l_extendedprice / 5000) + 1 END AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY bucket
    """,
)
def q_histogram_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via the SQL-standard width_bucket — the
    profiling primitive behind range-partition planning and data-skew
    reports. Bucket edges are closed-open and identical in both engines;
    one map-side-combined aggregation, shuffle carries <= 26 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "bucket",
            F.expr("width_bucket(l_extendedprice, 0, 120000, 24)").cast("long"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum2(F.col("l_extendedprice").cast("decimal(14,2)")).alias("total"),
        )
    )


@query(
    "incremental_agg_maintenance",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-aggregate maintenance: the standing aggregate over the
    base partition (orders before 2000) is NOT rescanned when a delta
    arrives — base partials and delta partials union and re-combine
    (count: sum of counts; sum: sum of sums — any algebraic aggregate
    works). At 100 TB the base partial frame is a tiny stored table and
    each refresh costs one scan of the delta only. The oracle is the
    direct GROUP BY over the union — result-identical by construction
    (exact decimal sums, so re-association cannot drift)."""
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("2000-01-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("__s"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cut))
    delta = partial(orders.filter(F.col("o_orderdate") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("__n").alias("n"),
            F.round(F.sum("__s"), 2).cast("double").alias("total"),
        )
    )


@query(
    "scalar_subquery_share",
    """
    SELECT o_orderstatus,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                 / (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                    FROM orders), 6) AS share
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_scalar_subquery_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total via a scalar subquery: the grand total is a
    single-row aggregate broadcast into every group row (Spark plans the
    1x1 frame as a broadcast nested loop that costs one row) — no second
    scan of the groups, no window over the whole table. Division happens
    in DOUBLE after exact decimal sums on both sides."""
    orders = load_table(spark, sf_dir, "orders")
    per_status = orders.groupBy("o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("__s")
    )
    grand = orders.agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("__g")
    )
    return per_status.join(F.broadcast(grand)).select(
        "o_orderstatus",
        F.round(F.col("__s"), 2).cast("double").alias("total"),
        F.round(F.col("__s").cast("double") / F.col("__g").cast("double"), 6).alias(
            "share"
        ),
    )


@query(
    "stats_column_profile",
    """
    SELECT 'o_custkey' AS col, CAST(count(*) - count(o_custkey) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) - count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) - count(o_orderpriority) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders
    """,
)
def q_stats_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column profile (null count, exact NDV) — the
    statistics a cost-based optimizer and a data-quality gate both feed
    on. ONE scan computes every column's metrics as sibling aggregates
    (Spark expands multi-distinct into one Expand node), then a tiny
    unpivot shapes (col, n_null, n_distinct) rows; the oracle's UNION ALL
    of per-column scans is the semantic twin."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = []
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(F.col(c))).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    wide = orders.agg(*aggs)
    stacked = ", ".join(f"'{c}', __null_{c}, __nd_{c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stacked}) AS (col, n_null, n_distinct)"
    ).selectExpr(
        "col", "CAST(n_null AS LONG) AS n_null", "CAST(n_distinct AS LONG) AS n_distinct"
    )


@query(
    "agg_approx_distinct_contract",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_nd,
           TRUE AS approx_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_distinct_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ epsilon contract: the approx NDV itself is not
    portable across engines, so the gated columns are the exact NDV plus
    a BOOLEAN asserting |approx - exact| <= 5% — the oracle states TRUE
    unconditionally, so any sketch drift past the bound breaks the hash
    match and turns the row red. HLL register-merge is a max — order- and
    partitioning-independent — so the Spark side is deterministic. At
    100 TB the approx pass is the one you run (no two-phase expand); the
    exact twin here is the auditor."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_nd"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", rsd=0.02).cast("double")
                - F.count_distinct("l_partkey").cast("double")
            )
            <= 0.05 * F.count_distinct("l_partkey").cast("double")
        ).alias("approx_within_5pct"),
    )


@query(
    "agg_approx_percentile_contract",
    """
    SELECT l_returnflag,
           CAST(round(200 * percentile_cont(0.5)
                      WITHIN GROUP (ORDER BY l_extendedprice)) AS BIGINT)
               AS exact_p50_halfcents,
           TRUE AS approx_in_band
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_percentile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-quantile (Greenwald-Khanna) epsilon contract, the
    percentile twin of agg_approx_distinct_contract: the sketch value is
    not portable across engines, so the gated columns are the exact
    median plus a BOOLEAN asserting the approx median lands inside the
    exact P45-P55 band — the oracle states TRUE unconditionally, so
    sketch drift past the band turns the row red. The median is gated in
    HALF-CENTS: an even-count interpolated median of 2-dp data is
    (a+b)/2, whose last-ulp differs between the engines' interpolation
    formulas and flips round(x, 2) at the .005 boundary (seen at
    sf0.001); 200x the median is an exact integer (100a + 100b), so
    integer rounding absorbs the ulp. At 100 TB percentile_approx is the
    pass you run (mergeable fixed-size sketch, no per-group full sort);
    the exact twin is the auditor."""
    li = load_table(spark, sf_dir, "lineitem")
    approx = F.percentile_approx("l_extendedprice", 0.5, 10_000)
    return li.groupBy("l_returnflag").agg(
        F.round(F.lit(200) * F.percentile("l_extendedprice", F.lit(0.5)), 0)
        .cast("bigint")
        .alias("exact_p50_halfcents"),
        (
            (approx >= F.percentile("l_extendedprice", F.lit(0.45)))
            & (approx <= F.percentile("l_extendedprice", F.lit(0.55)))
        ).alias("approx_in_band"),
    )


@query(
    "winsorized_price_stats",
    """
    WITH b AS (
        SELECT percentile_cont(0.01) WITHIN GROUP (ORDER BY l_extendedprice) AS p01,
               percentile_cont(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99
        FROM lineitem)
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(round(least(greatest(l_extendedprice, b.p01), b.p99), 2)
                    AS DECIMAL(14,2))), 2) AS DOUBLE) AS clipped_total
    FROM lineitem, b
    GROUP BY l_returnflag
    """,
)
def q_winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (clip to [P1, P99]) — the robust-sum curation step
    that caps outlier influence. Exact interpolated percentiles from ONE
    aggregate row broadcast into the scan (same 1x1 plan as
    scalar_subquery_share); clipped values are rounded to the column's
    2-dp grain BEFORE the exact decimal sum, so both engines sum
    identical quantities regardless of summation order."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.percentile("l_extendedprice", F.lit(0.01)).alias("p01"),
        F.percentile("l_extendedprice", F.lit(0.99)).alias("p99"),
    )
    clipped = F.round(
        F.least(F.greatest(F.col("l_extendedprice"), F.col("p01")), F.col("p99")), 2
    ).cast("decimal(14,2)")
    return (
        li.join(F.broadcast(bounds))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum2(clipped).alias("clipped_total"),
        )
    )


@query(
    "scalar_map_functions",
    """
    SELECT key, value, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT 'type' AS key, event_type AS value FROM events
        UNION ALL
        SELECT 'kmod', CAST(CAST(props->>'$.k' AS BIGINT) % 5 AS VARCHAR) FROM events)
    GROUP BY key, value
    """,
)
def q_scalar_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column functions: build a map per row (create_map),
    explode its entries, aggregate per (key, value) — the map construct/
    flatten round-trip of the scalar function family. The oracle is the
    semantic twin as a UNION of key-value pairs (DuckDB's map type isn't
    needed to state the expected RESULT)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("kmod"),
        (F.get_json_object("props", "$.k").cast("long") % 5).cast("string"),
    )
    return (
        ev.select(F.explode(m).alias("key", "value"))
        .groupBy("key", "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_forecast_revenue_q6",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue_delta,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_agg_forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): every predicate reaches
    the parquet scan as a pushed filter — the whole query is one
    filtered scan plus a map-side-combined global aggregate; no shuffle
    beyond the single final-merge row. Exact decimal products make the
    sum engine-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        _dsum2(_dec("l_extendedprice") * _dec("l_discount")).alias("revenue_delta"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "join_promo_revenue_share_q14",
    """
    SELECT round(
        100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
            THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(12,2))) ELSE 0 END) AS DOUBLE)
        / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE), 6)
        AS promo_share_pct,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q_join_promo_revenue_share_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promo revenue share): the part dimension is
    broadcast against the date-pruned lineitem scan; conditional and
    total revenue accumulate in ONE pass as exact decimals, with the
    ratio taken in double at the end."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "join_top_supplier_revenue_q15",
    """
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(round(r.total_rev, 2) AS DOUBLE) AS total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q_join_top_supplier_revenue_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    equality against the scalar max — safe on EXACT decimal sums where a
    double aggregate would make the tie test engine-dependent. The rev
    frame is computed once and reused for both the ranking and the max
    (Spark reuses the exchange under AQE)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount"))).alias(
            "total_rev"
        )
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev["total_rev"] == mx["__mx"])
        .join(F.broadcast(sup), rev["l_suppkey"] == sup["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_rev"),
        )
    )


@query(
    "agg_late_orders_by_priority_q4",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_agg_late_orders_by_priority_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): orders having at least
    one line item shipped >60 days after the order date — a correlated
    EXISTS planned as a LEFT SEMI join on the order key, with the date
    comparison as the join residual; one count per priority after."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li["l_orderkey"] == orders["o_orderkey"]) & (
        li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
    )


@query(
    "join_anti_customers_without_orders",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The plain anti-join surface (NOT EXISTS): customers with no urgent
    order — the complement of every semi-join in the walk/delete family,
    registered explicitly (predicate chosen so the fixture yields a
    non-degenerate result; the no-orders-at-all variant is empty here)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "window_order_gap_stats",
    """
    WITH gaps AS (
        SELECT o_custkey,
               datediff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
        FROM orders)
    SELECT o_custkey,
           CAST(count(gap_days) AS BIGINT) AS n_gaps,
           CAST(min(gap_days) AS BIGINT) AS min_gap,
           CAST(max(gap_days) AS BIGINT) AS max_gap,
           round(avg(gap_days), 6) AS avg_gap
    FROM gaps
    WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    """,
)
def q_window_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap statistics per customer: a lag window (deterministic
    tie-break on the key) feeding a second aggregation stage — the
    window-then-agg composition pattern; gaps are exact integer day
    differences, only the average needs rounding."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return gaps.groupBy("o_custkey").agg(
        F.count("gap_days").alias("n_gaps"),
        F.min("gap_days").cast("long").alias("min_gap"),
        F.max("gap_days").cast("long").alias("max_gap"),
        F.round(F.avg("gap_days"), 6).alias("avg_gap"),
    )


@query(
    "correlated_scalar_below_max",
    """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice < (SELECT max(o2.o_totalprice) FROM orders o2
                            WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_correlated_scalar_below_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, decorrelated: every order strictly
    below its own customer's best order. Planned as a per-customer MAX
    aggregate joined back on the correlation key — one shuffle each side
    instead of a per-row subquery. MAX is an exact order statistic, so
    the comparison is engine-stable (an AVG here would flip boundary rows
    on last-ulp division differences)."""
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.groupBy(F.col("o_custkey").alias("__ck")).agg(
        F.max("o_totalprice").alias("__mx")
    )
    return (
        orders.join(mx, orders["o_custkey"] == mx["__ck"])
        .filter(F.col("o_totalprice") < F.col("__mx"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "sql_text_revenue_report",
    """
    SELECT n.n_name, o.o_orderpriority,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name, o.o_orderpriority
    """,
)
def q_sql_text_revenue_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure SQL-text surface: temp views + ``spark.sql`` running the
    IDENTICAL statement the DuckDB oracle runs — the entry path a
    reference user migrating raw SQL takes. Catalyst plans it exactly as
    the DataFrame twin (broadcast dims, one fact shuffle); the only
    difference is the front-end."""
    for t in ("lineitem", "orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    from oracle_schema_copy_spark.queries import REGISTRY

    return spark.sql(REGISTRY["sql_text_revenue_report"].oracle)


@query(
    "sql_recursive_cte_bfs",
    """
    WITH RECURSIVE walk(node, hop) AS (
        SELECT 'u:0' AS node, 0 AS hop
        UNION ALL
        SELECT DISTINCT e.dst AS node, w.hop + 1 AS hop
        FROM walk w
        JOIN (
            SELECT 'u:' || CAST(user_id AS STRING) AS src,
                   't:' || event_type AS dst
            FROM events
            UNION ALL
            SELECT 't:' || event_type, 'u:' || CAST(user_id AS STRING)
            FROM events
        ) e ON e.src = w.node
        WHERE w.hop < 3
    )
    SELECT node, CAST(min(hop) AS BIGINT) AS hops
    FROM walk GROUP BY node
    """,
)
def q_sql_recursive_cte_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE, SPARK-24497): BFS hop
    counts from user 0 through the bipartite user<->event-type graph as
    ONE SQL statement — the IDENTICAL text runs on both engines (same
    migration-surface contract as sql_text_revenue_report). The
    DISTINCT inside the recursive member dedups each level to at most
    |nodes| rows, so path-count blowup (exponential in hops on a dense
    bipartite graph) never materializes — the same per-level dedup the
    DataFrame BFS (graph_bfs_hops_user0) does with frontier distinct;
    min(hop) collapses levels to first-reach depth. Spark executes the
    recursion as an iterative UnionLoop over the same join plan a
    driver-loop BFS would build."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    from oracle_schema_copy_spark.queries import REGISTRY

    return spark.sql(REGISTRY["sql_recursive_cte_bfs"].oracle)


@query(
    "scalar_variant_functions",
    """
    SELECT CAST(CAST(props->>'$.k' AS BIGINT) % 7 AS BIGINT) AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_min,
           CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_max
    FROM events
    GROUP BY 1
    """,
)
def q_scalar_variant_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType surface: ``parse_json`` to a binary variant
    once, then typed ``variant_get`` extraction — the open-schema
    semi-structured path that replaces per-access string re-parsing
    (variant decode is O(1) per path on the encoded form, vs
    get_json_object re-parsing the text per call). The oracle states the
    same result through DuckDB's JSON operators."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(F.parse_json("props").alias("__v"))
    k = F.variant_get(F.col("__v"), "$.k", "long")
    return (
        v.select(k.alias("__k"))
        .groupBy((F.col("__k") % 7).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__k").alias("k_min"),
            F.max("__k").alias("k_max"),
        )
    )


@query(
    "lateral_top_orders_per_segment",
    """
    SELECT d.c_mktsegment, top.o_orderkey, top.o_totalprice
    FROM (SELECT DISTINCT c_mktsegment FROM customer) d,
    LATERAL (
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment = d.c_mktsegment
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 2) top
    """,
)
def q_lateral_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: the top-2 orders per market segment
    written as a per-row subquery with ORDER BY/LIMIT — the SQL-standard
    alternative to the rank-window formulation (Spark decorrelates it
    into a domain join + limit per key; DuckDB executes the same text).
    Deterministic tie-break on the order key."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    from oracle_schema_copy_spark.queries import REGISTRY

    return spark.sql(REGISTRY["lateral_top_orders_per_segment"].oracle)


@query(
    "skyline_orders_price_date",
    """
    WITH bydate AS (
        SELECT o_orderdate, max(o_totalprice) AS mx FROM orders GROUP BY 1),
    run AS (
        SELECT o_orderdate,
               max(mx) OVER (ORDER BY o_orderdate
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS best_earlier
        FROM bydate)
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
    FROM orders o JOIN run r USING (o_orderdate)
    WHERE r.best_earlier IS NULL OR r.best_earlier <= o.o_totalprice
    """,
)
def q_skyline_orders_price_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto front over (maximize price, minimize date): an
    order survives unless some other order is strictly better on BOTH
    axes — dominated iff some strictly earlier date carries a strictly
    higher price, i.e. iff the running max price over earlier dates
    exceeds its own. The oracle used to state the O(n^2) NOT-EXISTS
    definition verbatim; at sf1 (1.5M orders) DuckDB ran it as the
    actual quadratic anti-join, so the oracle now states the equivalent
    date-sweep (per-date max, running max over strictly-earlier dates —
    comparisons only, no arithmetic, identical row set at any scale).
    The Spark plan is the mirrored O(n log n) sweep along the price axis — per-price-group min date, one ordered
    window carrying the running min over STRICTLY higher price groups
    (rowsBetween ... -1 over the distinct-price frame, so equal-price
    peers never dominate each other), then a join back. One sort, no
    self-join. The unpartitioned window runs on the DISTINCT-PRICE frame
    only (not the fact rows); at 100 TB with ~billions of distinct prices
    the sweep shards by price range with one boundary-min fixup pass —
    the frame is (price, min_date) pairs either way, never orders."""
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy("o_totalprice").agg(F.min("o_orderdate").alias("__gmin"))
    w = (
        Window.orderBy(F.desc("o_totalprice"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g2 = g.withColumn("__runmin", F.min("__gmin").over(w)).select(
        "o_totalprice", "__runmin"
    )
    return (
        orders.join(g2, "o_totalprice")
        .filter(
            F.col("__runmin").isNull()
            | (F.col("__runmin") >= F.col("o_orderdate"))
        )
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@query(
    "window_distribution_position",
    """
    SELECT o_custkey, o_orderkey,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_distribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position window functions (percent_rank, cume_dist)
    per customer with a deterministic total order — both are exact small-
    integer ratios (k/n), so the doubles agree bit-for-bit with no
    rounding."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "abc_classification_parts",
    """
    WITH rev AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS r
        FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT sum(r) AS t FROM rev),
    run AS (
        SELECT l_partkey, r,
               sum(r) OVER (ORDER BY r DESC, l_partkey) AS cum
        FROM rev)
    SELECT run.l_partkey,
           CAST(round(run.r, 2) AS DOUBLE) AS revenue,
           CASE WHEN run.cum <= tot.t * 0.8 THEN 'A'
                WHEN run.cum <= tot.t * 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM run, tot
    """,
)
def q_abc_classification_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: the running
    cumulative share over a deterministic total order, cut at 80/95%.
    Revenue and its running sum are EXACT decimals, and the thresholds
    are decimal-times-literal comparisons — no float boundary can flip a
    class between engines. Like the skyline, the window runs on the
    per-part aggregate frame, never on line items."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount"))).alias("r")
    )
    tot = rev.agg(F.sum("r").alias("t"))
    w = Window.orderBy(F.desc("r"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = rev.withColumn("cum", F.sum("r").over(w))
    return run.join(F.broadcast(tot)).select(
        "l_partkey",
        F.round("r", 2).cast("double").alias("revenue"),
        F.when(F.col("cum") <= F.col("t") * 0.8, "A")
        .when(F.col("cum") <= F.col("t") * 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "rfm_customer_segments",
    """
    WITH base AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_order,
               CAST(count(*) AS BIGINT) AS freq,
               sum(CAST(o_totalprice AS DECIMAL(14,2))) AS monetary
        FROM orders GROUP BY o_custkey)
    SELECT o_custkey,
           CAST(ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS BIGINT) AS r_score,
           CAST(ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS BIGINT) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT) AS m_score
    FROM base
    """,
)
def q_rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quintiles per
    customer — three ntile windows over deterministic total orders (key
    tie-break; monetary is an exact decimal so its sort order cannot
    differ between engines). The per-customer base aggregate is one
    map-side-combined pass."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("monetary"),
    )
    def quint(col):
        return F.ntile(5).over(
            Window.orderBy(F.desc(col), F.asc("o_custkey"))
        ).cast("long")
    return base.select(
        "o_custkey",
        quint("last_order").alias("r_score"),
        quint("freq").alias("f_score"),
        quint("monetary").alias("m_score"),
    )


@query(
    "yoy_revenue_growth",
    """
    WITH yearly AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
               sum(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
        FROM orders GROUP BY 1)
    SELECT yr,
           CAST(round(rev, 2) AS DOUBLE) AS revenue,
           round(CAST(rev AS DOUBLE)
                 / CAST(lag(rev) OVER (ORDER BY yr) AS DOUBLE) - 1, 6) AS yoy_growth
    FROM yearly
    """,
)
def q_yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth: exact decimal yearly sums, one lag
    window over the tiny yearly frame, ratio taken in double at the end
    (first year's growth is NULL on both engines)."""
    orders = load_table(spark, sf_dir, "orders")
    yearly = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("yr")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("rev"))
    w = Window.orderBy("yr")
    return yearly.select(
        "yr",
        F.round("rev", 2).cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.lag("rev").over(w).cast("double") - 1,
            6,
        ).alias("yoy_growth"),
    )

