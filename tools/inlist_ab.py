"""A/B: pushed IN-list child probe vs read-all + Spark semi-join, on live
embedded Derby (VERDICT r9 #6 — SURVEY §4's deferred custom-strategy
candidate, now measurable since the live-database path exists).

Scenario: a copy_tree walk whose SOURCE is a database (the reference's
actual deployment: walk a subgraph out of Oracle). The frontier is a key
set on the child's FK column; the child probe can either

  A. read-all: partitioned JDBC scan of the whole child table, then a
     broadcast LEFT SEMI join against the frontier in Spark (the engine's
     current default — ``operators/walk.py``), or
  B. pushed: ``WHERE fk IN (...)`` batched probes executed BY the
     database (``sources/jdbc.read_table_keyed``), index lookups + only
     matching rows on the wire.

Usage:
    python tools/inlist_ab.py [sf_dir] [frontier_sizes_csv] [reps]
    # defaults: /root/testdata/sf0.1  100,1000,full  3

Writes one JSON line per (frontier, path, rep) timing and a summary
table; single Spark JVM throughout (CLAUDE.md sf1 rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sizes_arg = sys.argv[2] if len(sys.argv) > 2 else "100,1000,full"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from oracle_schema_copy_spark.queries._scratch import scratch_dir
    from oracle_schema_copy_spark.session import get_spark
    from oracle_schema_copy_spark.sources import derby
    from oracle_schema_copy_spark.sources.jdbc import read_table, read_table_keyed
    from oracle_schema_copy_spark.sources.tables import load_table

    spark = get_spark("inlist-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, sf_dir, "orders")
    n_orders = orders.count()
    custkeys = [
        r[0]
        for r in orders.select("o_custkey").distinct().sort("o_custkey").collect()
    ]
    print(f"orders={n_orders} distinct_custkeys={len(custkeys)}", file=sys.stderr)

    base = scratch_dir("inlist_ab")
    tgt = derby.DerbyTarget(spark, f"{base}/db")
    tgt.create_table("orders", orders.schema, primary_key=["o_orderkey"])
    tgt.insert("orders", orders)
    # FK-column index, as any production schema walking orders-by-customer
    # would have (and as the staged-delete path already proved necessary)
    tgt.execute_sql(["CREATE INDEX ORDERS_CK_IX ON ORDERS (O_CUSTKEY)"])

    hi = orders.agg(F.max("o_orderkey")).first()[0]
    sizes = []
    for s in sizes_arg.split(","):
        if s == "full":
            # the flagship walk's frontier: every 10th customer
            sizes.append(("full", [k for k in custkeys if k % 10 == 0]))
        else:
            sizes.append((s, custkeys[: int(s)]))

    results = []
    for label, frontier in sizes:
        fr_df = spark.createDataFrame([(k,) for k in frontier], "o_custkey bigint")
        for path in ("read_all_semijoin", "pushed_inlist"):
            for rep in range(reps):
                t0 = time.perf_counter()
                if path == "read_all_semijoin":
                    child = read_table(
                        spark,
                        tgt.conn,
                        "ORDERS",
                        partition_column="O_ORDERKEY",
                        lower_bound=0,
                        upper_bound=int(hi) + 1,
                        num_partitions=8,
                    )
                    n = child.join(
                        F.broadcast(fr_df.toDF("O_CUSTKEY")), "O_CUSTKEY", "left_semi"
                    ).count()
                else:
                    n = read_table_keyed(
                        spark, tgt.conn, "ORDERS", "O_CUSTKEY", frontier
                    ).count()
                dt = round(time.perf_counter() - t0, 3)
                rec = {
                    "frontier": label,
                    "n_keys": len(frontier),
                    "path": path,
                    "rep": rep,
                    "rows": n,
                    "sec": dt,
                }
                results.append(rec)
                print(json.dumps(rec))
    # sanity: both paths must agree on row counts per frontier
    for label, _ in sizes:
        counts = {r["rows"] for r in results if r["frontier"] == label}
        assert len(counts) == 1, f"row-count mismatch for {label}: {counts}"
    summary = {}
    for label, frontier in sizes:
        mins = {
            p: min(r["sec"] for r in results if r["frontier"] == label and r["path"] == p)
            for p in ("read_all_semijoin", "pushed_inlist")
        }
        summary[label] = {
            **mins,
            "n_keys": len(frontier),
            "speedup_pushed": round(mins["read_all_semijoin"] / mins["pushed_inlist"], 2),
        }
    print(json.dumps({"sf_dir": sf_dir, "n_orders": n_orders, "summary": summary}))
    tgt.close()
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
