"""asof_join / range_join_binned semantics on hand-built frames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from oracle_schema_copy_spark.operators import temporal


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_picks_latest_at_or_before(spark):
    probes = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(30), 101), (2, _ts(5), 102)],
        ["user_id", "ts", "event_id"],
    )
    quotes = spark.createDataFrame(
        [(1, _ts(0), 900, 1.0), (1, _ts(10), 901, 2.0), (1, _ts(20), 902, 3.0)],
        ["user_id", "ts", "event_id", "value"],
    )
    out = temporal.asof_join(
        probes, quotes, key="user_id", ts="ts", quote_cols=["event_id", "value"]
    )
    got = {r.event_id: (r.q_event_id, r.q_value) for r in out.collect()}
    # probe@10 matches quote@10 (inclusive); probe@30 matches quote@20;
    # user 2 has no quotes -> dropped (inner semantics)
    assert got == {100: (901, 2.0), 101: (902, 3.0)}


def test_asof_join_exclusive(spark):
    probes = spark.createDataFrame([(1, _ts(10), 100)], ["user_id", "ts", "event_id"])
    quotes = spark.createDataFrame(
        [(1, _ts(0), 900, 1.0), (1, _ts(10), 901, 2.0)],
        ["user_id", "ts", "event_id", "value"],
    )
    out = temporal.asof_join(
        probes, quotes, key="user_id", ts="ts",
        quote_cols=["event_id", "value"], inclusive=False,
    )
    got = {r.event_id: r.q_event_id for r in out.collect()}
    assert got == {100: 900}  # same-instant quote excluded


def test_asof_join_null_quote_attribute_stays_null(spark):
    """The matched quote row is carried atomically: a NULL attribute in it
    must NOT be back-filled from an older quote (no franken-rows), and the
    probe must not be dropped just because one quote column is NULL."""
    probes = spark.createDataFrame([(1, _ts(20), 100)], ["user_id", "ts", "event_id"])
    quotes = spark.createDataFrame(
        [(1, _ts(0), 800, 5.0), (1, _ts(10), 900, None)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    out = temporal.asof_join(
        probes, quotes, key="user_id", ts="ts", quote_cols=["event_id", "value"]
    )
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0].q_event_id, rows[0].q_value) == (900, None)

    # NULL in the FIRST quote column must not drop the probe either
    out2 = temporal.asof_join(
        probes, quotes, key="user_id", ts="ts", quote_cols=["value", "event_id"]
    )
    rows2 = out2.collect()
    assert len(rows2) == 1
    assert (rows2[0].q_value, rows2[0].q_event_id) == (None, 900)


def test_asof_join_planted_ties_follow_contract(spark):
    """Planted (key, ts) collisions on BOTH sides (r4 VERDICT #2): among
    quotes tied at the matching ts the MAX quote tuple in quote_cols
    order must be carried, on every repartitioning; tied probes must each
    keep their own row and receive the same quote. Verified against a
    DuckDB oracle expressing the same tie rule (row_number over q.ts
    DESC, then quote_cols DESC)."""
    import duckdb

    probe_rows = [
        (1, _ts(10), 100),
        (1, _ts(10), 101),  # probe-side tie: same (key, ts), distinct id
        (1, _ts(30), 102),
        (2, _ts(10), 103),
    ]
    quote_rows = [
        (1, _ts(10), 900, 1.0),
        (1, _ts(10), 902, 2.0),  # quote-side tie at ts=10: max id 902 wins
        (1, _ts(10), 901, 9.0),
        (1, _ts(20), 800, 3.0),  # later ts beats any tied earlier group
        (2, _ts(10), 910, 4.0),
        (2, _ts(10), 911, 5.0),
    ]
    probes = spark.createDataFrame(probe_rows, ["user_id", "ts", "event_id"])
    quotes = spark.createDataFrame(
        quote_rows, ["user_id", "ts", "event_id", "value"]
    )
    expected = {100: 902, 101: 902, 102: 800, 103: 911}

    for nparts in (1, 7):
        out = temporal.asof_join(
            probes.repartition(nparts),
            quotes.repartition(nparts),
            key="user_id",
            ts="ts",
            quote_cols=["event_id", "ts", "value"],
        )
        got = {r.event_id: r.q_event_id for r in out.collect()}
        assert got == expected, f"nparts={nparts}: {got}"

    con = duckdb.connect()
    con.execute("CREATE TABLE p(user_id BIGINT, ts TIMESTAMP, event_id BIGINT)")
    con.execute(
        "CREATE TABLE q(user_id BIGINT, ts TIMESTAMP, event_id BIGINT, value DOUBLE)"
    )
    con.executemany("INSERT INTO p VALUES (?,?,?)", probe_rows)
    con.executemany("INSERT INTO q VALUES (?,?,?,?)", quote_rows)
    oracle = {
        r[0]: r[1]
        for r in con.sql(
            """
            WITH j AS (
                SELECT p.event_id, q.event_id AS q_event_id,
                       row_number() OVER (
                           PARTITION BY p.user_id, p.ts, p.event_id
                           ORDER BY q.ts DESC, q.event_id DESC, q.value DESC
                       ) AS rn
                FROM p JOIN q ON p.user_id = q.user_id AND q.ts <= p.ts)
            SELECT event_id, q_event_id FROM j WHERE rn = 1
            """
        ).fetchall()
    }
    assert oracle == expected


def test_range_join_binned_equals_naive_inequality_join(spark, sf_dir):
    """The binned equi-join must reproduce the naive range join exactly,
    including matches that straddle bin boundaries."""
    from oracle_schema_copy_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    window = 1800
    binned = temporal.range_join_binned(
        errors, views.select(F.col("vu").alias("user_id"), F.col("vts").alias("ts")),
        key="user_id", window_seconds=window, right_cols=["ts"],
    )
    naive = errors.join(
        views,
        (F.col("user_id") == F.col("vu"))
        & (F.abs(F.col("ts").cast("double") - F.col("vts").cast("double")) <= window),
    )
    assert binned.count() == naive.count() > 0


def test_sessionize_gap_rule(spark):
    # events at minute 0, 10, 300 (gap 290min >= 240min -> new session)
    ev = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, dt.datetime(2024, 1, 1, 0, 10)),
         (3, 1, dt.datetime(2024, 1, 1, 5, 0)), (4, 2, _ts(0))],
        ["event_id", "user_id", "ts"],
    )
    got = {
        r.event_id: r.session_seq
        for r in temporal.sessionize(ev, key="user_id", gap_seconds=14_400).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_trailing_features_range_frame(spark):
    # user 1: values 1.0@0min, 3.0@30min, 5.0@90min (1h frame drops the first)
    ev = spark.createDataFrame(
        [(1, 1, _ts(0), 1.0), (2, 1, _ts(30), 3.0),
         (3, 1, dt.datetime(2024, 1, 1, 1, 30), 5.0)],
        ["event_id", "user_id", "ts", "value"],
    )
    out = temporal.trailing_features(ev, key="user_id", trailing_seconds=3600)
    got = {r.event_id: (r.trailing_n, r.trailing_avg) for r in out.collect()}
    assert got == {1: (1, 1.0), 2: (2, 2.0), 3: (2, 4.0)}


def test_asof_join_forward_and_tolerance(spark):
    probes = spark.createDataFrame([(1, _ts(10), 100)], ["user_id", "ts", "event_id"])
    quotes = spark.createDataFrame(
        [(1, _ts(0), 900, 1.0), (1, _ts(20), 901, 2.0), (1, _ts(50), 902, 3.0)],
        ["user_id", "ts", "event_id", "value"],
    )
    fwd = temporal.asof_join(
        probes, quotes, key="user_id", ts="ts",
        quote_cols=["event_id", "ts"], direction="forward",
    ).collect()
    assert len(fwd) == 1 and fwd[0].q_event_id == 901  # earliest at-or-after

    # tolerance: only quotes within 5 minutes of the probe qualify -> none
    tol = temporal.asof_join(
        probes, quotes, key="user_id", ts="ts",
        quote_cols=["event_id", "ts"], direction="forward", tolerance_seconds=300,
    ).collect()
    assert tol == []

    import pytest as _pytest

    with _pytest.raises(ValueError):
        temporal.asof_join(
            probes, quotes, key="user_id", ts="ts",
            quote_cols=["event_id"], tolerance_seconds=60,
        )
    with _pytest.raises(ValueError):
        temporal.asof_join(
            probes, quotes, key="user_id", ts="ts",
            quote_cols=["event_id"], direction="sideways",
        )


def test_funnel_ordered_progression(spark):
    from datetime import datetime as dt

    from oracle_schema_copy_spark.operators.temporal import funnel

    rows = [
        # u1 completes all three in order
        (1, dt(2024, 1, 1, 10), "view"), (1, dt(2024, 1, 1, 11), "click"),
        (1, dt(2024, 1, 1, 12), "error"),
        # u2: click BEFORE view -> step 2 not reached
        (2, dt(2024, 1, 1, 9), "click"), (2, dt(2024, 1, 1, 10), "view"),
        # u3: never views -> absent entirely (despite click+error)
        (3, dt(2024, 1, 1, 10), "click"), (3, dt(2024, 1, 1, 11), "error"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r.user_id: r
        for r in funnel(
            ev, key="user_id", ts="ts", step_col="event_type",
            steps=["view", "click", "error"],
        ).collect()
    }
    assert set(got) == {1, 2}
    assert got[1].reached == 3 and got[1].t3 == dt(2024, 1, 1, 12)
    assert got[2].reached == 1 and got[2].t2 is None


def test_point_in_time_join_half_open_boundary(spark):
    """A fact ON the version boundary matches only the SUCCESSOR version
    (half-open [valid_from, valid_to)), and every fact matches exactly one
    version."""
    from datetime import date

    from oracle_schema_copy_spark.operators.temporal import point_in_time_join

    dim = spark.createDataFrame(
        [
            (1, "v1", date(2020, 1, 1), date(2021, 1, 1)),
            (1, "v2", date(2021, 1, 1), date(9999, 12, 31)),
            (2, "only", date(2020, 1, 1), date(9999, 12, 31)),
        ],
        ["k", "attr", "valid_from", "valid_to"],
    )
    facts = spark.createDataFrame(
        [
            (10, 1, date(2020, 6, 1)),   # inside v1
            (11, 1, date(2021, 1, 1)),   # ON the boundary -> v2
            (12, 1, date(2019, 1, 1)),   # before first version -> no match
            (13, 2, date(2025, 1, 1)),   # single open version
        ],
        ["fid", "k", "d"],
    )
    got = {
        r.fid: r.attr
        for r in point_in_time_join(
            facts, dim, fact_key="k", dim_key="k", fact_ts="d"
        ).collect()
    }
    assert got == {10: "v1", 11: "v2", 13: "only"}
