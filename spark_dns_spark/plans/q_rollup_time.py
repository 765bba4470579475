"""Hierarchical time rollups (hypertable-style continuous aggregates)
and incremental snapshot maintenance — the two patterns that turn a
batch engine into an incremental one at 100 TB:

- ``hypertable_rollup`` — minute → hour → day aggregates computed by
  RE-AGGREGATING THE PREVIOUS LEVEL'S PARTIALS (sum-of-sums,
  min-of-mins, count-of-counts), never rescanning raw events.  The
  oracle computes every level directly from raw events, so the query
  proves partial re-aggregation is lossless.
- ``changelog_incremental_merge`` — materialized snapshot at T1 merged
  with only the (T1, T2] delta must equal the from-scratch snapshot at
  T2: the CDC-merge correctness property that lets a 100 TB snapshot be
  maintained by touching only each batch's delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.operators import changelog as cl
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import DNS_CHANGES_CTE, dns_changes, load_events

#: Midpoint cut for the incremental merge (events span 2024-01+).
T_CUT = "2024-01-14 00:00:00"


def _level_sql(trunc: str) -> str:
    # value summed as milli-int units: order-proof across engines AND
    # across the partial re-aggregation levels (int sum is associative;
    # a rounded double sum is not).
    return f"""
SELECT '{trunc}' AS level, date_trunc('{trunc}', ts) AS w_start,
       count(*) AS n,
       sum(CAST(floor(value * 1000 + 0.5) AS BIGINT))::BIGINT AS value_milli,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 2
"""


@register(
    "hypertable_rollup",
    " UNION ALL ".join(_level_sql(t) for t in ("minute", "hour", "day")),
    doc="continuous-aggregate hierarchy: hour re-aggregates the minute "
    "partials, day re-aggregates hour (sum-of-sums / min-of-mins / "
    "count-of-counts) — raw events are scanned exactly once; the "
    "oracle computes all three levels directly, proving the partial "
    "re-aggregation is lossless",
    tags=("rollup", "window", "agg"),
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("ts", "value")

    def reagg(df: DataFrame, trunc: str, src_start: str) -> DataFrame:
        return df.groupBy(
            F.date_trunc(trunc, F.col(src_start)).alias("w_start")
        ).agg(
            F.sum("n").alias("n"),
            F.sum("sum_raw").alias("sum_raw"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )

    minute = ev.groupBy(F.date_trunc("minute", "ts").alias("w_start")).agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")).alias(
            "sum_raw"
        ),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    hour = reagg(minute, "hour", "w_start")
    day = reagg(hour, "day", "w_start")

    def finish(df: DataFrame, level: str) -> DataFrame:
        return df.select(
            F.lit(level).alias("level"),
            "w_start",
            "n",
            F.col("sum_raw").alias("value_milli"),
            "min_value",
            "max_value",
        )

    return (
        finish(minute, "minute")
        .unionByName(finish(hour, "hour"))
        .unionByName(finish(day, "day"))
    )


@register(
    "changelog_incremental_merge",
    DNS_CHANGES_CTE
    + f"""
SELECT fqdn, ip, action, ts FROM (
  SELECT fqdn, ip, action, ts,
         ROW_NUMBER() OVER (PARTITION BY fqdn, ip
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM dns_changes
) WHERE rn = 1 AND action IN ('AXFR', 'IXFR_ADD')
""",
    doc="incremental snapshot maintenance: snapshot(<=T1) outer-merged "
    "with latest-wins(delta (T1,T2]) equals snapshot(<=T2) computed from "
    "scratch (the oracle) — the CDC-merge property that maintains a "
    "100 TB snapshot touching only each batch's delta",
    tags=("changelog", "incremental"),
)
def changelog_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    feed = dns_changes(spark, sf_dir)
    prev = feed.filter(F.col("ts") <= T_CUT)
    delta = feed.filter(F.col("ts") > T_CUT)

    # previous materialized state: latest row per key, adds AND deletes
    # kept (a delete tombstone must shadow an older add at merge time)
    prev_latest = cl.latest_wins(
        prev, ["fqdn", "ip"], ts_col="ts", tiebreak=["event_id"]
    ).select("fqdn", "ip", "action", "ts", "event_id")
    delta_latest = cl.latest_wins(
        delta, ["fqdn", "ip"], ts_col="ts", tiebreak=["event_id"]
    ).select("fqdn", "ip", "action", "ts", "event_id")

    # merge: delta wins wherever present (every delta ts > every prev ts)
    merged = (
        prev_latest.alias("p")
        .join(
            delta_latest.alias("d"),
            ["fqdn", "ip"],
            "full_outer",
        )
        .select(
            "fqdn",
            "ip",
            F.coalesce(F.col("d.action"), F.col("p.action")).alias("action"),
            F.coalesce(F.col("d.ts"), F.col("p.ts")).alias("ts"),
        )
    )
    return merged.filter(F.col("action").isin(["AXFR", "IXFR_ADD"]))


#: Fact-side CDC cut for the join-IVM property (orders span 1995-2001).
IVM_CUT = "2000-01-01 00:00:00"


@register(
    "ivm_join_delta",
    """
SELECT o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
       c_custkey, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
""",
    doc="incremental view maintenance for a JOIN view: with orders "
    f"split into base/delta at {IVM_CUT} and customers split on "
    "c_custkey % 97, the maintained view is the union of the four "
    "delta-algebra terms  B_o⋈B_c ∪ Δo⋈B_c ∪ B_o⋈Δc ∪ Δo⋈Δc — the "
    "three delta terms are |Δ|-proportional, which is what lets a "
    "100 TB join view absorb a batch without re-joining the base "
    "(B_o⋈B_c stands in for the stored view here).  The oracle is the "
    "plain full join, so hash equality proves the delta algebra",
    tags=("incremental", "join", "cdc"),
)
def ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_dns_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cut = F.lit(IVM_CUT).cast("timestamp")
    b_o = orders.filter(F.col("o_orderdate") < cut)
    d_o = orders.filter(F.col("o_orderdate") >= cut)
    b_c = customer.filter(F.col("c_custkey") % 97 != 0)
    d_c = customer.filter(F.col("c_custkey") % 97 == 0)

    def term(o: DataFrame, c: DataFrame) -> DataFrame:
        return o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("total_cents"),
            "c_custkey",
            "c_name",
        )

    # stored-view stand-in ∪ the three delta-proportional terms
    return (
        term(b_o, b_c)
        .unionAll(term(d_o, b_c))
        .unionAll(term(b_o, d_c))
        .unionAll(term(d_o, d_c))
    )


@register(
    "ivm_agg_delta",
    """
SELECT o_custkey,
       count(*)::BIGINT AS n_orders,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT
         AS total_cents
FROM orders GROUP BY o_custkey
""",
    doc="incremental view maintenance for an AGGREGATE view (the twin "
    f"of ivm_join_delta): orders split base/delta at {IVM_CUT}; the "
    "maintained per-customer (count, sum) view is the PARTIAL-"
    "AGGREGATE MERGE of the stored base partials with the delta "
    "batch's partials — count-of-counts / sum-of-sums, the same "
    "re-aggregation lossless-ness hypertable_rollup proves across "
    "time levels, here proving a 100 TB agg view absorbs a batch "
    "touching only |delta| partials.  The oracle is the plain full "
    "aggregate, so hash equality proves the merge algebra",
    tags=("incremental", "agg", "cdc"),
)
def ivm_agg_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_dns_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit(IVM_CUT).cast("timestamp")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")

    def partials(o: DataFrame) -> DataFrame:
        return o.groupBy("o_custkey").agg(
            F.count("*").alias("n_orders"),
            F.sum(cents).alias("total_cents"),
        )

    # stored-view stand-in (base partials) merged with delta partials:
    # the merge is itself one map-side-combinable aggregate over a
    # relation sized by |affected keys|, never the base fact
    base = partials(orders.filter(F.col("o_orderdate") < cut))
    delta = partials(orders.filter(F.col("o_orderdate") >= cut))
    return (
        base.unionAll(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_cents").alias("total_cents"),
        )
    )
