"""Relational/window breadth beyond the catalog — each op verified
against an in-test DuckDB oracle (same gate as the driver: column
names, row count, order-insensitive value hash).

These are engine-capability proofs that don't need a catalog slot:
range frames, ntile, lag/lead defaults, percent_rank/cume_dist, pivot,
and unpivot.  Inputs stick to integer-exact values (v_milli, counts)
so cross-engine equality is bitwise, per the repo's canonicalization
rules.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_dns_spark.functions.dnsfn import epoch_micros
from spark_dns_spark.plans.feeds import load_events
from tools.check_oracle import TABLES, table_hash


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def _assert_match(sdf, duck, sql):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(sql)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert table_hash(srows, scols) == table_hash(drows, dcols)


def _milli_events(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    return ev.select(
        "event_id",
        "user_id",
        epoch_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 1000 + F.lit(0.5))
        .cast("long")
        .alias("v_milli"),
    )


def test_range_frame_moving_sum(spark, sf_dir, duck):
    """RANGE frame over event time: per-user trailing-1h sum.

    Scale shape: one shuffle on user_id, sort within partition — the
    standard time-series rollup; integer sums so both engines agree
    exactly.
    """
    b = _milli_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    sdf = b.select(
        "event_id", "user_id", F.sum("v_milli").over(w).alias("mov_sum")
    )
    _assert_match(
        sdf,
        duck,
        """
        WITH b AS (
          SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                 CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v_milli
          FROM events
        )
        SELECT event_id, user_id,
               sum(v_milli) OVER (
                 PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               )::BIGINT AS mov_sum
        FROM b
        """,
    )


def test_ntile_quartiles(spark, sf_dir, duck):
    """ntile(4) with a total order (acctbal, custkey) — deterministic
    bucket assignment in both engines."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    w = Window.orderBy("c_acctbal", "c_custkey")
    sdf = c.select("c_custkey", F.ntile(4).over(w).alias("quartile"))
    _assert_match(
        sdf,
        duck,
        """
        SELECT c_custkey,
               ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
        FROM customer
        """,
    )


def test_lag_lead_with_defaults(spark, sf_dir, duck):
    b = _milli_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    sdf = b.select(
        "event_id",
        "user_id",
        F.lag("v_milli", 1, -1).over(w).alias("prev_v"),
        F.lead("v_milli", 2, -2).over(w).alias("next2_v"),
    )
    _assert_match(
        sdf,
        duck,
        """
        WITH b AS (
          SELECT event_id, user_id,
                 CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v_milli
          FROM events
        )
        SELECT event_id, user_id,
               lag(v_milli, 1, -1) OVER
                 (PARTITION BY user_id ORDER BY event_id) AS prev_v,
               lead(v_milli, 2, -2) OVER
                 (PARTITION BY user_id ORDER BY event_id) AS next2_v
        FROM b
        """,
    )


def test_percent_rank_cume_dist(spark, sf_dir, duck):
    """percent_rank = (rank-1)/(n-1) and cume_dist = peers/n are exact
    rationals computed identically by both engines — bitwise-safe
    doubles despite being floats."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.orderBy("o_orderkey")
    sdf = o.select(
        "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    _assert_match(
        sdf,
        duck,
        """
        SELECT o_orderkey,
               percent_rank() OVER (ORDER BY o_orderkey) AS pr,
               cume_dist() OVER (ORDER BY o_orderkey) AS cd
        FROM orders
        """,
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def test_pivot_counts(spark, sf_dir, duck):
    """Pivot event counts into one column per event type.  Explicit
    value list (the scale-correct form — no extra distinct pass) and
    integer counts only."""
    ev = load_events(spark, sf_dir)
    sdf = (
        ev.withColumn("cohort", (F.col("user_id") % 10).cast("long"))
        .groupBy("cohort")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
    )
    cases = ", ".join(
        f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)::BIGINT AS {t}"
        for t in EVENT_TYPES
    )
    _assert_match(
        sdf,
        duck,
        f"""
        SELECT CAST(user_id % 10 AS BIGINT) AS cohort, {cases}
        FROM events GROUP BY cohort
        """,
    )


def test_unpivot_stack(spark, sf_dir, duck):
    """Unpivot (wide->long) via stack(): per-returnflag counts of
    orders vs distinct parts, normalized into (flag, metric, n)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    sdf = agg.select(
        "l_returnflag",
        F.expr(
            "stack(2, 'n_rows', n_rows, 'n_parts', n_parts) "
            "AS (metric, n)"
        ),
    )
    _assert_match(
        sdf,
        duck,
        """
        WITH agg AS (
          SELECT l_returnflag, count(*)::BIGINT AS n_rows,
                 count(DISTINCT l_partkey)::BIGINT AS n_parts
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'n_rows' AS metric, n_rows AS n FROM agg
        UNION ALL
        SELECT l_returnflag, 'n_parts' AS metric, n_parts AS n FROM agg
        """,
    )
