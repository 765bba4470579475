"""Streaming catalog queries beyond the DNS connector — exactly-once
patterns every ingestion pipeline needs, run to completion under
``availableNow`` so results are deterministic and oracle-checkable:

- ``stream_dedup_replay`` — the kafka-redelivery / backfill-overlap
  case: the SAME events file is delivered twice in two micro-batches
  (``maxFilesPerTrigger=1`` + distinct mtimes) and
  ``dropDuplicates(event_id)`` must emit each row exactly once, with
  the dedup state crossing the micro-batch boundary in the state
  store.  The oracle aggregates the batch table directly — a replayed
  stream that dedups correctly is indistinguishable from a
  single-delivery batch, which is precisely the exactly-once contract.

Scale note: the unbounded 10-year watermark retains all dedup state to
make replay-at-any-distance exact; a real 100 TB feed bounds state with
``dropDuplicatesWithinWatermark`` at the feed's true lateness bound —
the plan is otherwise identical (hash state store keyed on event_id).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.functions.dnsfn import epoch_micros
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import (
    await_or_fail as _await_or_fail,
    legacy_parquet_nanos as _legacy_parquet_nanos,
    normalize_ts,
    scratch_dir as _scratch,
)


@register(
    "stream_dedup_replay",
    """
SELECT event_type,
       count(*)::BIGINT AS n,
       count(DISTINCT user_id)::BIGINT AS n_users,
       sum(CAST(floor(value * 1000 + 0.5) AS BIGINT))::BIGINT AS sum_v_milli
FROM events GROUP BY event_type
""",
    doc="streaming exactly-once dedup under replay: the events file "
    "delivered twice in two micro-batches, dropDuplicates(event_id) "
    "state spanning the batch boundary; per-type aggregate of the "
    "deduped stream must equal the single-delivery batch aggregate "
    "(the oracle).  dropDuplicatesWithinWatermark bounds the state at "
    "real scale with the same plan",
    tags=("streaming", "dedup", "exactly-once"),
)
def stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _scratch("stream_dedup_replay_")
    src_dir = os.path.join(root, "src")
    os.makedirs(src_dir)
    # two COPIES (not symlinks — their mtimes must differ without
    # touching the read-only testdata) so the replay arrives in a
    # later micro-batch under maxFilesPerTrigger=1
    events_file = os.path.join(sf_dir, "events.parquet")
    first = os.path.join(src_dir, "00_first.parquet")
    replay = os.path.join(src_dir, "01_replay.parquet")
    shutil.copy(events_file, first)
    shutil.copy(events_file, replay)
    base = os.stat(first).st_mtime
    os.utime(first, (base - 10, base - 10))
    os.utime(replay, (base, base))

    out = os.path.join(root, "out")
    with _legacy_parquet_nanos(spark):
        physical = spark.read.parquet(src_dir).schema
        src = normalize_ts(
            spark.readStream.schema(physical)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        q = (
            src.withWatermark("ts", "3650 days")  # keep all dedup state live
            .dropDuplicates(["event_id"])
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(root, ".ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _await_or_fail(q, 300)

    got = spark.read.parquet(out)
    return got.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")
        ).alias("sum_v_milli"),
    )


#: Attribution window: click within 30 min after the view.
ATTR_WINDOW_US = 1_800_000_000


@register(
    "stream_attribution_join",
    f"""
WITH v AS (
  SELECT user_id, event_id AS view_id, ts AS view_ts
  FROM events WHERE event_type = 'view'
), c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
)
SELECT v.user_id,
       count(*)::BIGINT AS n_pairs,
       sum((epoch_us(c.click_ts) - epoch_us(v.view_ts)) // 1000)::BIGINT
         AS sum_gap_ms
FROM v JOIN c
  ON v.user_id = c.user_id
 AND epoch_us(c.click_ts) > epoch_us(v.view_ts)
 AND epoch_us(c.click_ts) <= epoch_us(v.view_ts) + {ATTR_WINDOW_US}
GROUP BY v.user_id
""",
    doc="stream-stream interval join (the canonical attribution "
    "pattern): views x clicks per user with the click inside 30 min "
    "after the view, BOTH sides watermarked so join state is bounded "
    "by event-time; inner-join matches emit eagerly under availableNow "
    "so the result equals the batch range join, which IS the oracle. "
    "Output aggregated per user (pairs + integer gap-ms sum)",
    tags=("streaming", "join", "attribution"),
)
def stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import DataFrame as _DF

    root = _scratch("stream_attr_")

    def stage(name: str, df: _DF) -> str:
        d = os.path.join(root, name)
        df.coalesce(1).write.parquet(d)
        return d

    # the legacy-nanos conf is only needed while READING the testdata
    # events parquet; the staged copies are written with plain types,
    # so the scope ends once staging completes
    with _legacy_parquet_nanos(spark):
        batch = normalize_ts(
            spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        )
        v_dir = stage(
            "views",
            batch.filter(F.col("event_type") == "view").select(
                "user_id", F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            ),
        )
        c_dir = stage(
            "clicks",
            batch.filter(F.col("event_type") == "click").select(
                F.col("user_id").alias("c_user_id"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"),
            ),
        )

    views = (
        spark.readStream.schema(spark.read.parquet(v_dir).schema)
        .parquet(v_dir)
        .withWatermark("view_ts", "1 hour")
    )
    clicks = (
        spark.readStream.schema(spark.read.parquet(c_dir).schema)
        .parquet(c_dir)
        .withWatermark("click_ts", "1 hour")
    )
    joined = views.join(
        clicks,
        F.expr(
            "user_id = c_user_id "
            "AND click_ts > view_ts "
            "AND click_ts <= view_ts + INTERVAL 30 MINUTES"
        ),
    )
    out = os.path.join(root, "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(root, ".ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_or_fail(q, 300)

    got = spark.read.parquet(out)
    gap_ms = (
        (epoch_micros("click_ts") - epoch_micros("view_ts")) / F.lit(1000)
    ).cast("long")
    return got.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.sum(gap_ms).alias("sum_gap_ms"),
    )
