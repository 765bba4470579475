"""Streaming exact-dedup: replayed input (the kafka-redelivery /
backfill-overlap case) must come out exactly once, including across
micro-batch boundaries where the dedup state lives in the state store."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from spark_dns_spark.plans.feeds import load_events

SF = "/root/testdata/sf0.001"


def test_replayed_stream_dedups_across_batches(spark, tmp_path):
    ev = load_events(spark, SF).select("event_id", "ts", "user_id", "value")
    n_distinct = ev.count()

    staged = tmp_path / "stage"
    ev.coalesce(1).write.parquet(str(staged))
    part = next(f for f in os.listdir(staged) if f.endswith(".parquet"))

    # the same data delivered TWICE, in two separate files ⇒ with
    # maxFilesPerTrigger=1 the duplicate arrives in a later micro-batch
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(staged / part, src / "00_first.parquet")
    shutil.copy(staged / part, src / "01_replay.parquet")

    out = str(tmp_path / "out")
    q = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withWatermark("ts", "10 years")  # keep all dedup state live
        .dropDuplicates(["event_id"])
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    assert got.count() == n_distinct, "replay must not duplicate rows"
    assert (
        got.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0
    )
