"""Dataset-level quality gates — the validation pass a training
pipeline runs before accepting a new data drop (the Deequ /
great-expectations pattern, expressed as plain Spark aggregates):

- ``validate_quality_constraints`` — a constraint SUITE evaluated in
  one conditional-aggregate pass per table plus one anti-join for
  referential integrity; emits (constraint, n_checked, n_violations)
  so a scheduler can gate on ``sum(n_violations) == 0``.
- ``changelog_scd2_intervals`` — slowly-changing-dimension type-2
  reshape of the change feed: each fqdn's change rows become
  [valid_from, valid_to) versions via ``lead()`` over one fqdn-keyed
  window, with a deterministic (ts, event_id) tie-break.  The standard
  way a mutable-entity history is stored for point-in-time joins.

Scale notes: every per-table constraint folds into ONE scan with
conditional aggregation (map-side combinable, scalar output); the
referential check is the only shuffle-bearing step and keys on
l_orderkey/o_orderkey.  SCD2 is one shuffle on fqdn; version numbering
is per-entity (row_number inside the same window), never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import DNS_CHANGES_CTE, dns_changes
from spark_dns_spark.session import load_table


def _n(cond) -> F.Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


@register(
    "validate_quality_constraints",
    """
WITH o AS (
  SELECT count(*) AS n, count(DISTINCT o_orderkey) AS n_keys,
         sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS neg_price,
         sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
           AS bad_status,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
         sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                    OR o_orderdate >= TIMESTAMP '1999-01-01'
                  THEN 1 ELSE 0 END) AS bad_date
  FROM orders
), l AS (
  SELECT count(*) AS n,
         sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
           AS bad_qty,
         sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
           AS bad_disc
  FROM lineitem
), orphans AS (
  SELECT count(*) AS n_orphan FROM lineitem li
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = li.l_orderkey)
)
SELECT 'orders.orderkey_unique' AS constraint_name, o.n::BIGINT AS n_checked,
       (o.n - o.n_keys)::BIGINT AS n_violations FROM o
UNION ALL SELECT 'orders.totalprice_positive', o.n::BIGINT,
       o.neg_price::BIGINT FROM o
UNION ALL SELECT 'orders.status_in_domain', o.n::BIGINT,
       o.bad_status::BIGINT FROM o
UNION ALL SELECT 'orders.custkey_complete', o.n::BIGINT,
       o.null_cust::BIGINT FROM o
UNION ALL SELECT 'orders.orderdate_in_range', o.n::BIGINT,
       o.bad_date::BIGINT FROM o
UNION ALL SELECT 'lineitem.quantity_in_range', l.n::BIGINT,
       l.bad_qty::BIGINT FROM l
UNION ALL SELECT 'lineitem.discount_in_range', l.n::BIGINT,
       l.bad_disc::BIGINT FROM l
UNION ALL SELECT 'lineitem.orderkey_references_orders', l.n::BIGINT,
       orphans.n_orphan::BIGINT FROM l, orphans
""",
    doc="constraint-suite validation (the Deequ pattern): uniqueness, "
    "range, domain, completeness checks fold into ONE conditional-"
    "aggregate scan per table (map-side combinable, scalar outputs); "
    "referential integrity is the single shuffle-bearing step (left-"
    "anti on l_orderkey).  Output is (constraint, n_checked, "
    "n_violations) rows a scheduler gates on",
    tags=("validate", "agg", "quality"),
)
def validate_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    o = orders.agg(
        F.count("*").alias("n"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        _n(F.col("o_totalprice") <= 0).alias("neg_price"),
        _n(~F.col("o_orderstatus").isin("O", "F", "P")).alias("bad_status"),
        _n(F.col("o_custkey").isNull()).alias("null_cust"),
        _n(
            (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        ).alias("bad_date"),
    )
    li = lineitem.agg(
        F.count("*").alias("n"),
        _n(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
        ).alias("bad_qty"),
        _n(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
        ).alias("bad_disc"),
    )
    orphans = (
        lineitem.join(
            orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        ).agg(F.count("*").alias("n_orphan"))
    )

    def row(name: str, src: DataFrame, n_col: str, v_col) -> DataFrame:
        return src.select(
            F.lit(name).alias("constraint_name"),
            F.col(n_col).cast("long").alias("n_checked"),
            v_col.cast("long").alias("n_violations"),
        )

    return (
        row("orders.orderkey_unique", o, "n", F.col("n") - F.col("n_keys"))
        .unionAll(row("orders.totalprice_positive", o, "n", F.col("neg_price")))
        .unionAll(row("orders.status_in_domain", o, "n", F.col("bad_status")))
        .unionAll(row("orders.custkey_complete", o, "n", F.col("null_cust")))
        .unionAll(row("orders.orderdate_in_range", o, "n", F.col("bad_date")))
        .unionAll(row("lineitem.quantity_in_range", li, "n", F.col("bad_qty")))
        .unionAll(row("lineitem.discount_in_range", li, "n", F.col("bad_disc")))
        .unionAll(
            row(
                "lineitem.orderkey_references_orders",
                li.crossJoin(orphans),
                "n",
                F.col("n_orphan"),
            )
        )
    )


@register(
    "changelog_scd2_intervals",
    DNS_CHANGES_CTE
    + """
SELECT fqdn, ip, action, ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       ROW_NUMBER() OVER w AS version_no,
       (lead(ts) OVER w IS NULL) AS is_current
FROM dns_changes
WINDOW w AS (PARTITION BY fqdn ORDER BY ts, event_id)
""",
    doc="SCD type-2 reshape of the change feed: per-fqdn [valid_from, "
    "valid_to) version intervals via lead() + row_number over ONE "
    "fqdn-keyed window (deterministic (ts, event_id) tie-break) — the "
    "point-in-time-join layout for mutable entity history; one shuffle, "
    "version numbering is per-entity, never global",
    tags=("changelog", "window", "scd2"),
)
def changelog_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = dns_changes(spark, sf_dir)
    w = Window.partitionBy("fqdn").orderBy("ts", "event_id")
    return ch.select(
        "fqdn",
        "ip",
        "action",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version_no"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


#: Histogram bin width in milli-units (50 value units per bin).
HIST_BIN_MILLI = 50_000


@register(
    "events_value_histogram",
    f"""
SELECT event_type,
       CAST(CAST(floor(value * 1000 + 0.5) AS BIGINT) // {HIST_BIN_MILLI}
            AS BIGINT) AS bin,
       count(*)::BIGINT AS n,
       min(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS min_milli,
       max(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS max_milli
FROM events GROUP BY 1, 2
""",
    doc="equi-width value histogram per event type — the profiling "
    "pass a validation report draws distributions from: one map-side-"
    "combinable aggregate, integer milli-unit bin edges, key space = "
    "types x bins (bounded), single exchange",
    tags=("validate", "agg", "profile"),
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_dns_spark.plans.feeds import load_events

    ev = load_events(spark, sf_dir).select("event_type", "value")
    v = F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")
    return (
        ev.withColumn("v_milli", v)
        .groupBy(
            "event_type",
            F.expr(f"v_milli div {HIST_BIN_MILLI}").alias("bin"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min("v_milli").alias("min_milli"),
            F.max("v_milli").alias("max_milli"),
        )
    )


@register(
    "events_equidepth_quartiles",
    """
WITH b AS (
  SELECT event_type, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
  FROM events
), q AS (
  SELECT event_type,
         CAST(4 * quantile_cont(v, 0.25) AS BIGINT) AS q1_x4,
         CAST(4 * quantile_cont(v, 0.50) AS BIGINT) AS q2_x4,
         CAST(4 * quantile_cont(v, 0.75) AS BIGINT) AS q3_x4
  FROM b GROUP BY event_type
)
SELECT b.event_type,
       (CASE WHEN 4 * b.v >= q.q1_x4 THEN 1 ELSE 0 END
        + CASE WHEN 4 * b.v >= q.q2_x4 THEN 1 ELSE 0 END
        + CASE WHEN 4 * b.v >= q.q3_x4 THEN 1 ELSE 0 END)::BIGINT AS qbin,
       count(*)::BIGINT AS n,
       min(b.v) AS min_milli,
       max(b.v) AS max_milli
FROM b JOIN q USING (event_type)
GROUP BY 1, 2
""",
    doc="equi-depth (quartile) histogram per event type — the profiling "
    "complement of the equi-width one: exact interpolated quartiles of "
    "milli-int values land on exact quarter-integers, carried x4 as "
    "longs so bucket assignment is pure integer comparison; the "
    "5-row quartile dim broadcasts back onto the fact.  At 100 TB "
    "approx_percentile swaps in with the same plan shape",
    tags=("validate", "agg", "profile"),
)
def events_equidepth_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_dns_spark.plans.feeds import load_events

    b = load_events(spark, sf_dir).select(
        "event_type",
        F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v"),
    )
    q = b.groupBy("event_type").agg(
        *[
            (F.percentile("v", F.lit(p)) * 4)
            .cast("long")
            .alias(f"q{i}_x4")
            for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )
    v4 = 4 * F.col("v")
    qbin = (
        (v4 >= F.col("q1_x4")).cast("int")
        + (v4 >= F.col("q2_x4")).cast("int")
        + (v4 >= F.col("q3_x4")).cast("int")
    ).cast("long")
    return (
        b.join(F.broadcast(q), "event_type")
        .groupBy("event_type", qbin.alias("qbin"))
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("min_milli"),
            F.max("v").alias("max_milli"),
        )
    )


#: Snapshot-diff simulation parameters (orders keyed by o_orderkey):
#: keys ≡ 0 (mod ADD_M) are new in B, ≡ 0 (mod DEL_M) deleted in B,
#: ≡ 0 (mod CHG_M) price-bumped in B.
DIFF_ADD_M, DIFF_DEL_M, DIFF_CHG_M = 13, 11, 7
DIFF_BUMP_CENTS = 100_000


@register(
    "snapshot_diff_orders",
    f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % {DIFF_ADD_M} != 0
), head AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
           + CASE WHEN o_orderkey % {DIFF_CHG_M} = 0
                  THEN {DIFF_BUMP_CENTS} ELSE 0 END AS cents
  FROM orders WHERE o_orderkey % {DIFF_DEL_M} != 0
), d AS (
  SELECT coalesce(b.o_orderkey, h.o_orderkey) AS k,
         CASE WHEN b.o_orderkey IS NULL THEN 'added'
              WHEN h.o_orderkey IS NULL THEN 'deleted'
              WHEN b.cents != h.cents
                OR b.o_orderstatus != h.o_orderstatus THEN 'changed'
              ELSE 'unchanged' END AS diff_class,
         CASE WHEN b.o_orderkey IS NOT NULL AND h.o_orderkey IS NOT NULL
              THEN abs(h.cents - b.cents) ELSE 0 END AS delta_cents
  FROM base b FULL OUTER JOIN head h ON b.o_orderkey = h.o_orderkey
)
SELECT diff_class, count(*)::BIGINT AS n,
       sum(delta_cents)::BIGINT AS sum_delta_cents
FROM d GROUP BY diff_class
""",
    doc="dataset-versioning snapshot diff: two simulated snapshots of "
    "orders (adds, deletes, price-bump changes derived "
    "deterministically by key residues) compared with ONE full-outer "
    "join on the key — both sides hash-partition identically, so the "
    "join is co-located; per-class counts + exact integer cent drift. "
    "The operation every incremental pipeline runs to audit what a "
    "batch actually changed",
    tags=("validate", "diff", "join"),
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    base = orders.filter(
        F.col("o_orderkey") % DIFF_ADD_M != 0
    ).select(
        F.col("o_orderkey").alias("b_key"),
        F.col("o_orderstatus").alias("b_status"),
        cents.alias("b_cents"),
    )
    head = orders.filter(
        F.col("o_orderkey") % DIFF_DEL_M != 0
    ).select(
        F.col("o_orderkey").alias("h_key"),
        F.col("o_orderstatus").alias("h_status"),
        (
            cents
            + F.when(
                F.col("o_orderkey") % DIFF_CHG_M == 0, DIFF_BUMP_CENTS
            ).otherwise(0)
        ).alias("h_cents"),
    )
    d = base.join(
        head, base.b_key == head.h_key, "full_outer"
    ).select(
        F.when(F.col("b_key").isNull(), "added")
        .when(F.col("h_key").isNull(), "deleted")
        .when(
            (F.col("b_cents") != F.col("h_cents"))
            | (F.col("b_status") != F.col("h_status")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("diff_class"),
        F.when(
            F.col("b_key").isNotNull() & F.col("h_key").isNotNull(),
            F.abs(F.col("h_cents") - F.col("b_cents")),
        )
        .otherwise(0)
        .alias("delta_cents"),
    )
    return d.groupBy("diff_class").agg(
        F.count("*").alias("n"),
        F.sum("delta_cents").cast("long").alias("sum_delta_cents"),
    )
