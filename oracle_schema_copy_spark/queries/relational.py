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
    docs = load_table(spark, sf_dir, "documents")
    bigrams = F.expr(
        "CASE WHEN size(split(text, ' ')) > 1 THEN "
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> concat(element_at(split(text, ' '), i), ' ', "
        "element_at(split(text, ' '), i + 1))) "
        "ELSE array() END"
    )
    f = (
        docs.select(F.explode(bigrams).alias("bigram"))
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
           CAST(round(100 * sum(o_totalprice)) AS BIGINT) AS revenue_cents
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
    spelled out."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__param_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(100 * sum(o_totalprice)) AS BIGINT) AS revenue_cents
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
           CAST(round(100 * sum(l.l_extendedprice)) AS BIGINT) AS revenue_cents
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
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.round(100 * F.sum("l_extendedprice")).cast("long").alias("revenue_cents"),
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
