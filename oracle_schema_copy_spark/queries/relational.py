"""Spark-native relational surface (SURVEY.md §2.5 gap table).

The reference delegates all relational computation to Oracle; this module
is the engine's own coverage of joins, aggregations, window functions,
sorts/top-k, set operations, and the scalar function library — each a
declarative DataFrame program whose physical plan (broadcast vs shuffle
join, partial aggregation, whole-stage codegen) is Catalyst's choice.

Scale notes per family:
- joins: dimension sides are broadcast (explicit hint where we know the
  cardinality; AQE converts at runtime otherwise); fact-fact joins shuffle
  on the join key only after filters are pushed down;
- aggregations: map-side partial aggregation is automatic; high-cardinality
  count_distinct uses the two-phase expand strategy;
- windows: partitioned by bounded keys (custkey/orderkey), sorted within
  partitions — one shuffle per window spec;
- top-k: global sort-limit uses TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oracle_schema_copy_spark.queries import query
from oracle_schema_copy_spark.sources.tables import load_table


def _dec(name: str):
    """Exact DECIMAL(12,2) view of a 2-dp money/rate column: double sums
    differ between engines in the last ulp (and flip round() at boundaries);
    decimal sums are exact and engine-independent."""
    return F.col(name).cast("decimal(12,2)")


def _one() -> F.Column:
    return F.lit(1).cast("decimal(12,2)")


def _dsum2(expr):
    """Deterministic money aggregate: exact decimal sum, round 2, -> double."""
    return F.round(F.sum(expr), 2).cast("double")

# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "join_inner_revenue_by_order",
    """
    SELECT o.o_orderkey, o.o_orderdate,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
    headline=True,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + aggregation (TPC-H Q3 shape). The status filter is
    pushed to the orders scan; the join shuffles both sides on orderkey."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(_dsum2(_dec("l_extendedprice") * (_one() - _dec("l_discount"))).alias("revenue"))
    )


@query(
    "join_left_outer_order_counts",
    """
    SELECT c.c_custkey, c.c_name, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer_customers_orders",
    """
    SELECT coalesce(c.c_custkey, oa.o_custkey) AS custkey, c.c_acctbal, oa.n_orders
    FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000) c
    FULL OUTER JOIN (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY o_custkey
    ) oa ON oa.o_custkey = c.c_custkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: rich customers without orders ∪ order counts whose
    customer fails the filter — both null sides exercised."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_acctbal")
    )
    oa = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return c.join(oa, c["c_custkey"] == oa["o_custkey"], "full_outer").select(
        F.coalesce(c["c_custkey"], oa["o_custkey"]).alias("custkey"),
        c["c_acctbal"],
        oa["n_orders"],
    )


@query(
    "join_multiway_revenue_by_nation",
    """
    SELECT n.n_name, CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
    headline=True,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with explicitly-broadcast dimensions —
    the fact table shuffles only for the final aggregation."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    dims = (
        customer.join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("c_custkey", "n_name")
    )
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(dims), orders["o_custkey"] == dims["c_custkey"])
        .groupBy("n_name")
        .agg(_dsum2(_dec("l_extendedprice") * (_one() - _dec("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical partial-aggregation benchmark — one scan,
    map-side combine, 6-group shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum2(_dec("l_quantity")).alias("sum_qty"),
        _dsum2(_dec("l_extendedprice")).alias("sum_base_price"),
        _dsum2(disc).alias("sum_disc_price"),
        _dsum2(disc * (_one() + _dec("l_tax"))).alias("sum_charge"),
        F.round(F.sum(_dec("l_quantity")).cast("double") / n, 6).alias("avg_qty"),
        F.round(F.sum(_dec("l_extendedprice")).cast("double") / n, 6).alias("avg_price"),
        F.round(F.sum(_dec("l_discount")).cast("double") / n, 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_filtered_revenue",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24
    """,
)
def q_agg_filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg; every predicate reaches the parquet
    row-group stats (verify: PushedFilters in the plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.02, 0.04))
        & (F.col("l_quantity") < 24)
    ).agg(_dsum2(_dec("l_extendedprice") * _dec("l_discount")).alias("revenue"))


@query(
    "agg_count_distinct",
    """
    SELECT c_mktsegment,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand-based two-phase plan)."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count_distinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
            _dsum2(_dec("c_acctbal")).alias("total_bal"),
        )
    )


@query(
    "agg_rollup_flag_status",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total as NULL rows)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum2(_dec("l_quantity")).alias("sum_qty"),
        )
    )


@query(
    "agg_cube_priority_status",
    """
    SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 grouping combinations)."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "window_rank_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT) AS price_rank,
           CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
    FROM orders
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows: one shuffle on the partition key, sort within."""
    w_rank = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    w_rn = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w_rank).cast("long").alias("price_rank"),
        F.row_number().over(w_rn).cast("long").alias("rn"),
    )


@query(
    "window_lag_lead_order_dates",
    """
    SELECT o_custkey, o_orderkey,
           lag(o_orderdate) OVER w AS prev_order,
           lead(o_orderdate) OVER w AS next_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead over a deterministic (tie-broken) ordering."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderdate").over(w).alias("prev_order"),
        F.lead("o_orderdate").over(w).alias("next_order"),
    )


@query(
    "window_running_quantity",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) OVER (
               PARTITION BY l_orderkey ORDER BY l_linenumber
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
    FROM lineitem
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit RANGE frame (peer rows — duplicate
    (orderkey, linenumber) pairs exist in the data — receive equal values,
    keeping the result deterministic where a ROWS frame would not be)."""
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.sum(_dec("l_quantity")).over(w).cast("double").alias("running_qty"),
    )


@query(
    "topk_per_group_lineitems",
    """
    SELECT * FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem) t
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k = row_number + filter (Catalyst pushes the rank
    limit into the sort as a group-limit at execution)."""
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "sort_limit_top_orders",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: compiles to TakeOrderedAndProject (per-partition heap +
    merge), never a full sort."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "setops_customer_segments",
    """
    WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT 'union' AS op, CAST(count(*) AS BIGINT) AS n FROM (SELECT * FROM a UNION SELECT * FROM b)
    UNION ALL
    SELECT 'intersect', CAST(count(*) AS BIGINT) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
    UNION ALL
    SELECT 'except', CAST(count(*) AS BIGINT) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
    """,
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union/intersect/except (distinct variants), fused into one job."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    counts = [
        ("union", a.union(b).distinct()),
        ("intersect", a.intersect(b)),
        ("except", a.exceptAll(b).distinct()),
    ]
    out = None
    for op, df in counts:
        one = df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")
        out = one if out is None else out.unionByName(one)
    return out


# ---------------------------------------------------------------------------
# Scalar function library
# ---------------------------------------------------------------------------


@query(
    "scalar_string_functions",
    """
    SELECT c_custkey,
           lower(c_name) AS lname,
           upper(c_mktsegment) AS useg,
           CAST(length(c_name) AS BIGINT) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_key,
           replace(c_name, '#', '-') AS name_dashed,
           trim(c_name) AS name_trim,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           split_part(c_name, '#', 1) AS name_head
    FROM customer
    """,
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function coverage: case, length, substr, concat, replace,
    trim, pad, regex extract, split."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.trim("c_name").alias("name_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_head"),
    )


@query(
    "scalar_date_functions",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(extract(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(extract(month FROM o_orderdate) AS BIGINT) AS order_mon,
           CAST(extract(day FROM o_orderdate) AS BIGINT) AS order_day,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95
    FROM orders
    """,
)
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function coverage: trunc, extract, interval arithmetic,
    datediff."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
    )


@query(
    "scalar_math_functions",
    """
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 50000), 6) AS abs_delta,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(power(l_discount + 1, 2), 6) AS disc_sq,
           CAST(l_orderkey % 97 AS BIGINT) AS key_mod,
           round(greatest(l_tax, l_discount), 2) AS max_rate,
           round(least(l_tax, l_discount), 2) AS min_rate
    FROM lineitem
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function coverage: abs/ceil/floor/sqrt/ln/pow/mod/greatest/least."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 50000), 6).alias("abs_delta"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_discount") + 1, 2), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 97).cast("long").alias("key_mod"),
        F.round(F.greatest("l_tax", "l_discount"), 2).alias("max_rate"),
        F.round(F.least("l_tax", "l_discount"), 2).alias("min_rate"),
    )


@query(
    "scalar_array_functions",
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
           round(list_sum(list_transform(list_slice(embedding, 1, 8), x -> CAST(x AS DOUBLE))), 6) AS head_sum
    FROM embeddings
    """,
)
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function coverage over the embedding column: size, transform +
    aggregate (dot/norm building blocks), max, slice."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("sq_norm"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(
            F.aggregate(F.slice(dbl, 1, 8), F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("head_sum"),
    )


@query(
    "scalar_json_events",
    """
    SELECT event_id, event_type,
           CAST(props->>'$.k' AS BIGINT) AS k,
           CAST(props->>'$.k' AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
)
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        "event_type",
        k.alias("k"),
        (k % 10).alias("k_bucket"),
    )


@query(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_cont(l_extendedprice, 0.95) AS p95_price,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile aggregation (continuous interpolation at rank
    p*(n-1) — identical definition in Spark ``percentile`` and DuckDB
    ``quantile_cont``). Exact percentiles sort within each group; at 100 TB
    prefer ``percentile_approx`` (t-digest sketch, mergeable map-side) and
    keep this as the verifier."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("p50_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
        F.percentile("l_extendedprice", 0.95).alias("p95_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_salted_skew_safe",
    """
    SELECT l_returnflag,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_salted_skew_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py): the hot-key-safe
    plan — partial agg on (key, salt) spreads any single key over 32
    reducers, final agg recombines. The oracle is the PLAIN group-by: the
    salting must be invisible in the result."""
    from oracle_schema_copy_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "total_price_raw": ("sum", F.col("l_extendedprice").cast("decimal(12,2)")),
            "n_rows": ("count", F.lit(1)),
            "first_ship": ("min", F.col("l_shipdate")),
            "last_ship": ("max", F.col("l_shipdate")),
        },
    )
    return out.select(
        "l_returnflag",
        F.round(F.col("total_price_raw"), 2).cast("double").alias("total_price"),
        F.col("n_rows").cast("long").alias("n_rows"),
        "first_ship",
        "last_ship",
    )


@query(
    "join_salted_skew",
    """
    SELECT o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators/skew.py): the hot-left-key-safe join
    plan — left rows salted over 8 sub-keys, right replicated per salt.
    The oracle is the PLAIN join: salting must be invisible in the
    result. Revenue in exact BIGINT cents (per-row floor of one IEEE
    multiply, identical on both engines; integer SUM is order-independent)
    — a round(double-sum, 4) diverged at sf1, where 2M-term summation
    order shifts the 1e11-magnitude total by ~1e-3."""
    from oracle_schema_copy_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    return (
        salted_join(li, orders, ["l_orderkey"], salt_buckets=8)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(cents).cast("long").alias("revenue_cents"),
        )
    )


@query(
    "agg_pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                      FILTER (WHERE o_orderstatus = 'F'), 2) AS DOUBLE) AS total_f
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority spread across status columns
    (Spark ``groupBy().pivot(values)`` with explicit pivot values — no
    extra distinct-scan job; the oracle is the equivalent FILTERed
    aggregation). Pivoted counts get 0 for empty cells like the SQL."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total"),
        )
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("n_p"),
        F.col("F_total").alias("total_f"),
    )


@query(
    "unpivot_order_metrics",
    """
    SELECT o_orderkey, metric, value FROM (
        SELECT o_orderkey, 'totalprice' AS metric, CAST(o_totalprice AS DOUBLE) AS value
        FROM orders WHERE o_orderkey <= 1000
        UNION ALL
        SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE)
        FROM orders WHERE o_orderkey <= 1000)
    """,
)
def q_unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide metric columns to (key, metric, value) rows via
    ``unpivot`` — the inverse reshape, one narrow scan, no shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    ).unpivot("o_orderkey", ["totalprice", "custkey"], "metric", "value")


@query(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the generalization rollup/cube sugar over):
    per-status totals, per-priority totals, and the grand total in one
    pass — Spark plans a single Expand + aggregate, not three scans."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _dsum2(F.col("o_totalprice").cast("decimal(14,2)")).alias("total"),
    )


@query(
    "feature_binning_ntile",
    """
    SELECT doc_id, n_chars,
           CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS len_decile
    FROM documents
    """,
)
def q_feature_binning_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile feature discretization: equal-population deciles of
    document length via ntile — the binning step before bucketed
    histograms / stratified policies. Deterministic total order (ties by
    id) so both engines cut identically."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id", "n_chars", F.ntile(10).over(w).cast("long").alias("len_decile")
    )


@query(
    "agg_stats_moments",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates (sample stddev, Pearson correlation) —
    both engines use merge-formula accumulation whose results agree at
    these rounding levels (verified empirically at sf0.01 and sf0.1:
    stddev rounded to 4, corr to 6)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )

