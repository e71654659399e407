"""TPC-H query-shape completion (SURVEY.md §2.5 relational surface).

The reference delegates all relational computation to the warehouse it
copies between (reference: `SchemaCopy.groovy` executes user SQL verbatim
— re-expressed here as engine-native coverage, per SURVEY.md §2.5); a
user switching to this engine needs the full decision-support query
surface to run natively.  Q1/Q4/Q6/Q14/Q15 shapes live in
``relational.py``; this module completes the remaining TPC-H shapes,
adapted to the fixture schema where TPC-H columns are absent (no
partsupp table, no comment/phone/shipmode/commitdate columns — each
adaptation is noted per query and preserves the ORIGINAL query's plan
shape: the correlated subquery, the OR-of-ANDs pushdown, the
exists/not-exists pair, and so on).

Scale notes (100 TB framing):
- region/nation/supplier are dimension tables — always broadcast;
  part/customer are broadcast here (20k/150k rows at sf0.1) and would be
  shuffle-join sides at true TPC-H SF100k, which Catalyst picks by
  statistics without a code change (hints are on the provably-small
  sides only);
- every money aggregate is an exact DECIMAL(12,2) sum (engine-
  independent) rounded once at the end, per the registry convention;
- all correlated subqueries are decorrelated into aggregate+join-back
  (what Catalyst's RewriteCorrelatedScalarSubquery does internally) so
  the plan is explicit: one extra shuffle per decorrelation, reusing the
  probe side's partitioning where possible;
- top-k outputs sort on (measure, unique key) so LIMIT is deterministic
  across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_schema_copy_spark.queries import query
from oracle_schema_copy_spark.queries.relational import _dec, _dsum2, _one
from oracle_schema_copy_spark.sources.tables import load_table

def _rev():
    return _dec("l_extendedprice") * (_one() - _dec("l_discount"))


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part (adapted: no partsupp; supply cost is
# the minimum extended price at which a EUROPE supplier ever shipped the
# part, from lineitem)
# ---------------------------------------------------------------------------


@query(
    "tpch_q2_min_cost_supplier",
    """
    WITH eligible AS (
        SELECT l.l_partkey, l.l_suppkey,
               min(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS cost
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
        GROUP BY l.l_partkey, l.l_suppkey)
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
           CAST(s.s_acctbal AS DOUBLE) AS s_acctbal,
           CAST(e.cost AS DOUBLE) AS min_cost
    FROM eligible e
    JOIN part p     ON p.p_partkey = e.l_partkey
    JOIN supplier s ON s.s_suppkey = e.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = 15
      AND e.cost = (SELECT min(e2.cost) FROM eligible e2
                    WHERE e2.l_partkey = e.l_partkey)
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): the correlated MIN subquery is
    decorrelated into a per-part MIN aggregate joined back on the SAME
    (l_partkey) grouping key — AQE reuses the exchange, so the probe side
    shuffles once. Costs are exact decimals, making the min-equality tie
    test engine-independent (a double min would be last-ulp lottery).
    Region->nation->supplier dimension chain is broadcast."""
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nat = load_table(spark, sf_dir, "nation").join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    eligible = (
        li.join(
            F.broadcast(sup.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_dec("l_extendedprice")).alias("cost"))
    )
    best = eligible.groupBy("l_partkey").agg(F.min("cost").alias("__best"))
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", "p_name")
    )
    return (
        eligible.join(
            best,
            (eligible["l_partkey"] == best["l_partkey"])
            & (eligible["cost"] == best["__best"]),
        )
        .drop(best["l_partkey"])
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(sup.select("s_suppkey", "s_name", "s_acctbal", "n_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            F.col("cost").cast("double").alias("min_cost"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 — shipping priority (o_shippriority column absent; o_orderpriority
# stands in)
# ---------------------------------------------------------------------------


@query(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment-filtered customers are
    broadcast into the date-pruned orders scan, revenue aggregates per
    order, and the top-10 runs as TakeOrderedAndProject (per-partition
    heap + driver merge, never a full sort). The sort key ends with the
    unique order key so LIMIT is deterministic on both engines."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum2(_rev()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume
# ---------------------------------------------------------------------------


@query(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the distinguishing
    condition is the non-key equi-join s_nationkey = c_nationkey — the
    supplier must be in the CUSTOMER's nation. Orders are date-pruned at
    the scan; supplier/nation/region broadcast; customer joins on
    custkey then the nationkey condition rides as a residual on the
    broadcast supplier probe, so the only shuffle is orders><lineitem."""
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nat = load_table(spark, sf_dir, "nation").join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey", "n_name")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(_dsum2(_rev()).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------


@query(
    "tpch_q7_volume_shipping",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate <  TIMESTAMP '2000-01-01'
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): two aliases of the nation
    dimension (supplier-side, customer-side) with a symmetric pair
    predicate. Both nation probes and supplier/customer are broadcast;
    the pair filter lands AFTER the broadcast joins but BEFORE the
    aggregate, so only qualifying rows enter the shuffle."""
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    sn = nat.withColumnRenamed("n_name", "supp_nation").withColumnRenamed(
        "n_nationkey", "__sn_key"
    )
    cn = nat.withColumnRenamed("n_name", "cust_nation").withColumnRenamed(
        "n_nationkey", "__cn_key"
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("__sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(cn), F.col("__cn_key") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dsum2(_rev()).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------


@query(
    "tpch_q8_market_share",
    """
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                     THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE),
                 6) AS mkt_share
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY year(o.o_orderdate)
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): conditional share of one
    supplier nation within a consumer region-year. Numerator and
    denominator accumulate in the SAME exact-decimal aggregate pass (one
    shuffle); the ratio is taken in double at the end. Part filter
    prunes the probe before the fact join."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_in_region = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("__k2"), "n_name")),
        F.col("s_nationkey") == F.col("__k2"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = _rev()
    nation_rev = F.when(F.col("n_name") == "NATION_3", rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(sup.select("s_suppkey", "n_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(nation_rev).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (adapted: no partsupp/supplycost; profit is
# discounted revenue)
# ---------------------------------------------------------------------------


@query(
    "tpch_q9_product_profit",
    """
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation-year): a LIKE
    pattern on the part name prunes the probe (pushed to the part scan,
    then a broadcast semi-reduction of lineitem), supplier nation is the
    grouping dimension, and the only shuffle is lineitem><orders."""
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(
            load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(sup.select("s_suppkey", "n_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(_dsum2(_rev()).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting
# ---------------------------------------------------------------------------


@query(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal, n.n_name, c.c_mktsegment
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-10-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned items): quarter-pruned orders and
    returnflag-pruned lineitems (both filters reach their scans) join on
    the order key — the one real shuffle — then revenue per customer
    with the customer/nation attributes broadcast in. Top-20 via
    TakeOrderedAndProject with the unique custkey tiebreak."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(
            load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(
                cust.select("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(_dsum2(_rev()).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
            "c_mktsegment",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 — important part values (adapted: no partsupp; a part's "value" is
# its total extended price shipped by suppliers of one region)
# ---------------------------------------------------------------------------


@query(
    "tpch_q11_important_values",
    """
    WITH val AS (
        SELECT l.l_partkey,
               sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS value_
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_regionkey = 0
        GROUP BY l.l_partkey)
    SELECT l_partkey AS p_partkey,
           CAST(round(value_, 2) AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(value_ AS DOUBLE) >
          (SELECT 2 * CAST(sum(value_) AS DOUBLE) / count(*) FROM val)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock values): per-part value vs a
    scalar threshold subquery. The threshold is 2x the AVERAGE part value
    (TPC-H's fixed fraction of the grand total degenerates to an empty
    result as the part count grows with SF; the multiple-of-average form
    is scale-invariant), computed from the already-aggregated per-part
    frame (no second fact scan) and broadcast as a 1x1 frame into the
    filter. Sums stay exact decimal until the final double comparison,
    identical on both engines."""
    sup0 = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    val = (
        li.join(F.broadcast(sup0), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("value_"))
    )
    thresh = val.agg(
        (F.lit(2) * F.sum("value_").cast("double") / F.count(F.lit(1))).alias("__t")
    )
    return (
        val.join(F.broadcast(thresh))
        .filter(F.col("value_").cast("double") > F.col("__t"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value_", 2).cast("double").alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-delay priority classes (adapted: no shipmode/commit/
# receipt dates; "late" is shipped >60 days after order, classes come
# from l_linestatus)
# ---------------------------------------------------------------------------


@query(
    "tpch_q12_late_priority_classes",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode priority classes): high/low priority
    line counts per class for late shipments. The year filter reaches
    the lineitem scan; the lateness predicate is the join residual; the
    two conditional counts run in one aggregate pass."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (adapted: the comment NOT LIKE
# filter becomes an order-priority exclusion)
# ---------------------------------------------------------------------------


@query(
    "tpch_q13_customer_distribution",
    """
    WITH c_orders AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): two-level aggregation —
    orders per customer (LEFT join keeps zero-order customers, the
    filter rides INSIDE the join condition so it cannot turn the join
    inner), then a histogram of those counts. count(o_orderkey) counts
    matched rows only, exactly like the SQL twin."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .select(F.col("c_count").cast("bigint").alias("c_count"), "custdist")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes (adapted: part-supplier pairs
# come from lineitem; the complaint exclusion becomes negative-balance
# suppliers)
# ---------------------------------------------------------------------------


@query(
    "tpch_q16_supplier_count_by_part",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#11'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier count by part attributes): the NOT IN
    subquery is a broadcast ANTI join on the (non-null) supplier key;
    the part attribute filter is a broadcast semi-reduction; then one
    distinct-count aggregate per attribute triple."""
    bad_sup = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#11")
            & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(bad_sup), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue
# ---------------------------------------------------------------------------


@query(
    "tpch_q17_small_quantity_revenue",
    """
    SELECT CAST(round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)))
                           AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#21'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity revenue): the correlated AVG
    subquery decorrelates to a per-part average joined back on the part
    key. Quantities are integer-valued doubles, so their sums (hence the
    average and the 0.2x threshold) are exact and engine-independent;
    the revenue sum itself stays decimal until the final divide."""
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#21")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
    # The correlated subquery averages over ALL lineitems of the part;
    # partkey determines brand, so averaging within the branded subset is
    # identical — and skips a full-fact aggregation.
    avg_qty = branded.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.avg("l_quantity").alias("__avg_qty")
    )
    return (
        branded.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("__avg_qty"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0), 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers
# ---------------------------------------------------------------------------


@query(
    "tpch_q18_large_volume_customers",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(round(sum(CAST(l.l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): the IN subquery is a
    HAVING aggregate over the same fact — planned as one groupBy
    producing both the filter set and the total (no second aggregate or
    semi-join needed: the per-order sum IS the output measure, a
    simplification Catalyst cannot make from the SQL form). Customer
    attributes broadcast in after the reduction."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    # r14 note: the survivors join runs as SMJ at scale because the
    # HAVING filter's ~2% selectivity is fused into the final-agg stage
    # and invisible to AQE. Two fixes were measured at the 100x fixture
    # and NOT kept: a post-filter repartition("l_orderkey") is elided as
    # redundant (same keys as the groupBy partitioning — no observation
    # point), and an eager localCheckpoint does flip the join to
    # broadcast but cannot elide the orders shuffle (AQE materializes
    # that stage in parallel before the survivor size is known) while
    # adding a serializing driver job. OPTIMIZATION_r14.md has the
    # numbers.
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(_dec("l_quantity")).alias("__qty")
    ).filter(F.col("__qty") > 250)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        per_order.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.round("__qty", 2).cast("double").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue under an OR-of-ANDs predicate (adapted:
# container/shipmode clauses dropped; brand x size x quantity bands kept)
# ---------------------------------------------------------------------------


@query(
    "tpch_q19_disjunctive_revenue",
    """
    SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive predicate revenue): the classic
    OR-of-ANDs. The part side is pre-filtered to the UNION of brand/size
    bands (derivable single-table implication of the disjunction —
    Catalyst does not infer it, so we state it) and broadcast; the mixed
    part x lineitem disjunction evaluates as the join residual; a
    single-table quantity implication prunes the fact scan too."""
    p = load_table(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 15))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 30)
    )
    residual = (
        ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#24") & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            (F.col("l_partkey") == F.col("p_partkey")) & residual,
        )
        .agg(
            _dsum2(_rev()).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (adapted: "late" is shipped
# >60 days after the order date, since commit/receipt dates are absent)
# ---------------------------------------------------------------------------


@query(
    "tpch_q21_suppliers_kept_waiting",
    """
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        GROUP BY l.l_orderkey, l.l_suppkey)
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS/NOT-EXISTS pair decorrelates to per-order counts — EXISTS
    another supplier <=> distinct suppliers >= 2; NOT EXISTS another
    late supplier <=> late suppliers == 1 (the row itself is late).
    Both counts come from ONE aggregation each over frames already
    partitioned by order key, replacing two correlated probes of the
    fact table with two cheap join-backs."""
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(
            orders_f.select("o_orderkey", "o_orderdate"),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    n_supp = li.groupBy(F.col("l_orderkey").alias("__ok1")).agg(
        F.count_distinct("l_suppkey").alias("__n_supp")
    )
    n_late = late.groupBy(F.col("l_orderkey").alias("__ok2")).agg(
        F.count(F.lit(1)).alias("__n_late")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        late.join(n_supp, F.col("l_orderkey") == F.col("__ok1"))
        .join(n_late, F.col("l_orderkey") == F.col("__ok2"))
        .filter((F.col("__n_supp") >= 2) & (F.col("__n_late") == 1))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (adapted: the phone-prefix filter
# becomes a nationkey range; "no orders" becomes "no urgent orders"
# since every fixture customer has orders)
# ---------------------------------------------------------------------------


@query(
    "tpch_q22_sales_opportunity",
    """
    WITH stats AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / count(*) AS avg_bal
        FROM customer
        WHERE c_acctbal > 0 AND c_nationkey < 13)
    SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS totacctbal
    FROM customer c
    WHERE c.c_nationkey < 13
      AND c.c_acctbal > (SELECT avg_bal FROM stats)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): above-average-balance
    customers in a nation band with no urgent orders. The scalar average
    is computed as exact-decimal-sum / count (identical IEEE division on
    both engines) and broadcast; the NOT EXISTS is a broadcast ANTI join
    against the pruned urgent-orders key set."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 13)
    stats = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("__avg_bal")
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(stats))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (adapted: no partsupp/availqty — a
# supplier's "available" quantity of a part is its all-time shipped
# quantity from lineitem, and the promotion-year demand is its 1996
# shipments; the nested IN-subquery chain of the original is preserved)
# ---------------------------------------------------------------------------


@query(
    "tpch_q20_potential_promotion",
    """
    WITH sp AS (
        SELECT l.l_partkey, l.l_suppkey,
               sum(l.l_quantity) AS total_qty,
               sum(CASE WHEN l.l_shipdate >= DATE '1996-01-01'
                         AND l.l_shipdate <  DATE '1997-01-01'
                        THEN l.l_quantity ELSE 0 END) AS qty_1996
        FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'small%')
        GROUP BY l.l_partkey, l.l_suppkey)
    SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_7'
      AND s.s_suppkey IN (SELECT l_suppkey FROM sp
                          WHERE qty_1996 > 0
                            AND total_qty > 2 * qty_1996)
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion) — the last missing
    TPC-H query shape (r4 bench covered 21 of 22). Plan: the part
    name-prefix filter SEMI-joins into the lineitem scan (broadcast — a
    name-filtered part list is always small), ONE grouped aggregation
    computes both the all-time and the 1996 quantities per (part,
    supplier) with conditional sums (the original's correlated scalar
    subquery, decorrelated), and the qualifying supplier keys SEMI-join
    into the nation-filtered supplier dim. Quantities are whole-number
    doubles, so the 2x comparison is exact on both engines. At scale the
    only shuffle is the (partkey, suppkey) aggregation; everything else
    broadcasts."""
    part_small = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    in_1996 = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date")) & (
        F.col("l_shipdate") < F.lit("1997-01-01").cast("date")
    )
    sp = (
        li.join(F.broadcast(part_small), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.sum(F.when(in_1996, F.col("l_quantity")).otherwise(F.lit(0.0))).alias(
                "qty_1996"
            ),
        )
        .filter((F.col("qty_1996") > 0) & (F.col("total_qty") > 2 * F.col("qty_1996")))
        .select("l_suppkey")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    return (
        sup.join(
            F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
        )
        .join(sp, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )
