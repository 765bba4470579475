"""Sessionization over ``events`` (SURVEY.md §7.1 M5) — 30-minute
inactivity gap, two formulations:

- ``sessionize_events`` — gap-and-island via lag + running sum; the
  portable formulation with an exact DuckDB oracle (identical window
  semantics in both engines).
- ``sessionize_window_native`` — Spark's built-in ``F.session_window``
  (the Structured-Streaming-compatible operator); oracle mirrors its
  semantics (session end = last event + gap, new session when the next
  event lands on/after the previous window's exclusive end).

Scale shape: one hash shuffle on ``user_id`` for the window/groupBy;
sessions never cross users, so there is no global ordering and skewed
users are split by AQE.  The same ``session_window`` expression runs
unchanged under ``readStream`` + watermark for the streaming case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import load_events

GAP_MIN = 30


@register(
    "sessionize_events",
    f"""
WITH lagged AS (
  SELECT event_id, ts, user_id, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR ts > prev_ts + INTERVAL {GAP_MIN} MINUTE
                 THEN 1 ELSE 0 END AS new_s
  FROM lagged
), sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
       count(*) AS n_events,
       round(sum(value), 3) AS sum_value
FROM sess GROUP BY user_id, session_id
""",
    doc="gap-and-island sessionization (30-min inactivity gap): lag + "
    "running-sum session ids, then per-session rollup",
    tags=("sessions", "window", "bench"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("event_id", "ts", "user_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = GAP_MIN * 60 * 1_000_000
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull()
        | (F.unix_micros(F.col("ts")) > F.unix_micros(prev) + gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.withColumn(
        "session_id",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 3).alias("sum_value"),
    )


@register(
    "sessionize_window_native",
    f"""
WITH lagged AS (
  SELECT ts, user_id, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR ts >= prev_ts + INTERVAL {GAP_MIN} MINUTE
                 THEN 1 ELSE 0 END AS new_s
  FROM lagged
), sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       min(ts) AS w_start,
       max(ts) + INTERVAL {GAP_MIN} MINUTE AS w_end,
       count(*) AS n_events
FROM sess GROUP BY user_id, sid
""",
    doc="F.session_window sessionization — the Structured-Streaming "
    "operator run in batch; window end = last event + gap, boundary "
    "event at exactly prev+gap starts a new session (exclusive end)",
    tags=("sessions", "window"),
)
def sessionize_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("ts", "user_id")
    out = ev.groupBy(
        F.session_window("ts", f"{GAP_MIN} minutes"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    return out.select(
        "user_id",
        F.col("session_window.start").alias("w_start"),
        F.col("session_window.end").alias("w_end"),
        "n_events",
    )
