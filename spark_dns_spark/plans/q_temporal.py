"""Temporal join operators the engine composes from DataFrame
primitives — operators Spark has no native physical operator for, each
with an exact DuckDB oracle (which *does* ship ASOF JOIN, making it the
perfect cross-check).

- ``asof_join_last_error`` — per event, the latest 'error' event at or
  before it for the same user.  Implemented as the union-and-carry
  composition: tag both streams, union, one window pass carrying the
  last build-side value forward.  ONE shuffle on (user_id), no range
  predicate ever reaches a join — this is the shape that scales to
  100 TB (a naive `a.ts >= b.ts` theta-join is a per-key cross
  product).
- ``range_join_bucketed`` — pairs of same-user events within a bounded
  time window, via bucketing: each probe row joins only its own and the
  previous 5-minute bucket, turning the range predicate into an
  equi-join on (user_id, bucket) + residual filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.functions.dnsfn import epoch_micros
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import load_events

RANGE_S = 300  #: range-join window (5 minutes)


@register(
    "asof_join_last_error",
    """
SELECT a.user_id, a.event_id, a.ts,
       b.ts AS last_error_ts,
       CASE WHEN b.ts IS NULL THEN NULL
            ELSE epoch_us(a.ts) - epoch_us(b.ts) END AS us_since_error
FROM events a
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
""",
    doc="as-of join (latest error at-or-before each event, per user) as "
    "a union-and-carry window composition — one hash shuffle on "
    "user_id; oracle is DuckDB's native ASOF JOIN",
    tags=("temporal", "join"),
)
def asof_join_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    probe = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("err_ts"),
        F.lit(1).alias("side"),  # probe sorts AFTER build at equal ts
    )
    build = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("err_ts"),
        F.lit(0).alias("side"),
    )
    # one window pass over the union: the build side's ts is carried
    # forward to every later probe row of the same user ('>=' semantics
    # come from ordering build before probe at equal ts)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        probe.unionByName(build)
        .withColumn("last_error_ts", F.last("err_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
    )
    return carried.select(
        "user_id",
        "event_id",
        "ts",
        "last_error_ts",
        F.when(
            F.col("last_error_ts").isNotNull(),
            epoch_micros("ts") - epoch_micros("last_error_ts"),
        ).alias("us_since_error"),
    )


@register(
    "range_join_bucketed",
    f"""
SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts
 AND b.ts <= a.ts + INTERVAL {RANGE_S} SECOND
 AND a.event_id < b.event_id
""",
    doc="range join (same-user event pairs within 5 min) via time-bucket "
    "equi-join + residual filter: each row joins only 2 buckets instead "
    "of the per-key cross product a theta-join would plan",
    tags=("temporal", "join"),
)
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_id")
    bucket = (epoch_micros("ts") / F.lit(RANGE_S * 1_000_000)).cast("long")
    # probe each row against its own and the NEXT bucket of the build
    # side (b.ts ∈ [a.ts, a.ts+300s] spans at most 2 buckets)
    a = ev.select(
        F.col("user_id"),
        F.col("ts").alias("ts_a"),
        F.col("event_id").alias("id_a"),
        F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
    )
    b = ev.select(
        F.col("user_id"),
        F.col("ts").alias("ts_b"),
        F.col("event_id").alias("id_b"),
        bucket.alias("bucket"),
    )
    pairs = a.join(b, ["user_id", "bucket"]).filter(
        (F.col("ts_b") >= F.col("ts_a"))
        & (
            epoch_micros("ts_b")
            <= epoch_micros("ts_a") + RANGE_S * 1_000_000
        )
        & (F.col("id_a") < F.col("id_b"))
    )
    return pairs.select(
        "id_a",
        "id_b",
        "user_id",
        (epoch_micros("ts_b") - epoch_micros("ts_a")).alias("gap_us"),
    )
