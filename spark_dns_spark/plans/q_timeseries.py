"""Time-series regularization operators — resampling an irregular event
stream onto a fixed grid, the preprocessing step every monitoring /
feature-extraction pipeline runs before modeling:

- ``events_gap_fill_ffill`` — per-user hourly resample with
  forward-fill: build each user's own hourly grid (``sequence`` +
  ``explode`` — distributed, sized by the user's active span, never a
  global driver-side calendar), left-join the observed hourly
  aggregates, and carry the last observed value across gap hours with
  ``last(..., ignorenulls=True)``.  Output is per-user gap statistics
  (count + the sum of *filled* values over gap hours), which pins the
  fill semantics exactly without hashing a multi-hundred-thousand-row
  grid.
- ``events_ohlc_bars`` — OHLC downsampling (open/high/low/close per
  user per hour), the standard bar-chart / candle aggregation.  One
  map-side-combinable aggregate; open/close are ``min_by``/``max_by``
  over a composite (ts, event_id) ordering key packed into
  decimal(38,0) so ties on the same microsecond are deterministic in
  both engines (DuckDB compares the same key as HUGEINT).

Scale notes (100 TB): the raw-events scan feeds exactly one partial
aggregation each; everything after ``hourly`` is sized by
``active-hours × users`` (time span), not event volume.  All shuffles
key on ``user_id`` (or ``user_id, hour``), so AQE coalesces and the
window/join stages reuse the same hash partitioning.  The composite
ordering key is integer arithmetic end-to-end — no float comparisons
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.functions.dnsfn import epoch_micros
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import load_events

#: Composite deterministic ordering key: micros-since-epoch shifted by
#: 1e6 plus the globally-unique event_id — total ~1e21, beyond int64,
#: exact in decimal(38,0) (Spark) / HUGEINT (DuckDB).
_ORD_KEY_SQL = "CAST(epoch_us(ts) AS HUGEINT) * 1000000 + event_id"


def _with_ord_key(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "ord_key",
        epoch_micros("ts").cast("decimal(38,0)") * F.lit(1_000_000)
        + F.col("event_id"),
    )


def _v_milli(df: DataFrame) -> DataFrame:
    # value in exact milli-int units (shared catalog convention).
    return df.withColumn(
        "v_milli",
        F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long"),
    )


@register(
    "events_gap_fill_ffill",
    f"""
WITH ev AS (
  SELECT user_id, ts,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v_milli,
         {_ORD_KEY_SQL} AS ord_key
  FROM events
), hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         count(*) AS n, arg_max(v_milli, ord_key) AS v_last
  FROM ev GROUP BY 1, 2
), bounds AS (
  SELECT user_id, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.user_id, g.g AS h
  FROM bounds b,
       LATERAL unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) g(g)
), filled AS (
  SELECT g.user_id, g.h,
         hr.n IS NULL AS is_gap,
         last_value(hr.v_last IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.h) AS v_fill
  FROM grid g LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h
)
SELECT user_id,
       count(*)::BIGINT AS n_hours,
       sum(CASE WHEN is_gap THEN 1 ELSE 0 END)::BIGINT AS n_gaps,
       sum(CASE WHEN is_gap THEN v_fill ELSE 0 END)::BIGINT AS gap_fill_milli
FROM filled GROUP BY user_id
""",
    doc="per-user hourly resample + forward fill: per-user sequence() "
    "grid (distributed, span-sized), left join of observed hours, "
    "last(ignorenulls) carry-forward; output = per-user gap stats so "
    "the fill itself is value-hashed without shipping the full grid",
    tags=("timeseries", "window", "resample"),
)
def events_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _with_ord_key(
        _v_milli(
            load_events(spark, sf_dir).select(
                "user_id", "ts", "value", "event_id"
            )
        )
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count("*").alias("n"),
        F.max_by("v_milli", "ord_key").alias("v_last"),
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    w = Window.partitionBy("user_id").orderBy("h")
    filled = joined.select(
        "user_id",
        "h",
        F.col("n").isNull().alias("is_gap"),
        F.last("v_last", ignorenulls=True).over(w).alias("v_fill"),
    )
    return filled.groupBy("user_id").agg(
        F.count("*").alias("n_hours"),
        F.sum(F.when(F.col("is_gap"), 1).otherwise(0))
        .cast("long")
        .alias("n_gaps"),
        F.sum(F.when(F.col("is_gap"), F.col("v_fill")).otherwise(0))
        .cast("long")
        .alias("gap_fill_milli"),
    )


@register(
    "events_ohlc_bars",
    f"""
WITH ev AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v_milli,
         {_ORD_KEY_SQL} AS ord_key
  FROM events
)
SELECT user_id, h,
       arg_min(v_milli, ord_key) AS open_milli,
       max(v_milli) AS high_milli,
       min(v_milli) AS low_milli,
       arg_max(v_milli, ord_key) AS close_milli,
       count(*)::BIGINT AS n_ticks,
       sum(v_milli)::BIGINT AS vol_milli
FROM ev GROUP BY user_id, h
""",
    doc="OHLC candle downsampling per (user, hour): single map-side-"
    "combinable aggregate; open/close via min_by/max_by over the "
    "decimal-packed (ts, event_id) key so same-microsecond ties are "
    "deterministic across engines",
    tags=("timeseries", "agg", "downsample"),
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _with_ord_key(
        _v_milli(
            load_events(spark, sf_dir).select(
                "user_id", "ts", "value", "event_id"
            )
        )
    )
    return ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.min_by("v_milli", "ord_key").alias("open_milli"),
        F.max("v_milli").alias("high_milli"),
        F.min("v_milli").alias("low_milli"),
        F.max_by("v_milli", "ord_key").alias("close_milli"),
        F.count("*").alias("n_ticks"),
        F.sum("v_milli").alias("vol_milli"),
    )


#: CUSUM drift parameters (milli-units): target level and alarm bound.
CUSUM_TARGET = 40_000
CUSUM_H = 500_000


@register(
    "events_cusum_drift",
    f"""
WITH b AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) - {CUSUM_TARGET} AS d
  FROM events
), p AS (
  SELECT user_id, ts, event_id,
         sum(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS pre
  FROM b
), r AS (
  SELECT user_id, pre,
         min(pre) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS runmin
  FROM p
), s AS (
  SELECT user_id,
         CAST(pre - least(runmin, 0) AS BIGINT) AS cusum FROM r
)
SELECT user_id, count(*)::BIGINT AS n,
       max(cusum)::BIGINT AS max_cusum,
       sum(CASE WHEN cusum > {CUSUM_H} THEN 1 ELSE 0 END)::BIGINT
         AS n_alarms
FROM s GROUP BY user_id
""",
    doc="CUSUM drift detection per user (the sequential data-drift "
    "monitor): S_k = max(0, S_k-1 + (x_k - target)) looks like an "
    "unexpressible recurrence, but has the closed form "
    "S_k = P_k - min(0, running-min of P) over the prefix sums — two "
    "stacked windows on ONE user_id partitioning, no applyInPandas, "
    "no iteration; integer milli-units end-to-end.  Output per user: "
    "max drift statistic + alarm count at h",
    tags=("timeseries", "window", "drift"),
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = load_events(spark, sf_dir).select(
        "user_id",
        "ts",
        "event_id",
        (
            F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")
            - CUSUM_TARGET
        ).alias("d"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = b.withColumn("pre", F.sum("d").over(w))
    r = p.withColumn("runmin", F.min("pre").over(w))
    s = r.select(
        "user_id",
        (F.col("pre") - F.least(F.col("runmin"), F.lit(0))).alias("cusum"),
    )
    return s.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.max("cusum").alias("max_cusum"),
        F.sum(F.when(F.col("cusum") > CUSUM_H, 1).otherwise(0))
        .cast("long")
        .alias("n_alarms"),
    )
