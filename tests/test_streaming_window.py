"""Streaming tumbling-window aggregation with late data.

Spark's watermark contract: once a window's state has been EVICTED
(watermark passed its end and the append-mode row was emitted), a late
event for that window is guaranteed to be dropped — it must neither
re-open the window nor emit a second row for it.  (While state is still
live, late-but-within-state merging is allowed; we test the guaranteed
side.)
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F


def test_late_event_after_eviction_is_dropped(spark, tmp_path):
    base = datetime(2024, 1, 1, 0, 0, 0)
    schema = "ts timestamp, value double"

    def write_batch(name, rows, order):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / name)
        )
        src = tmp_path / "src"
        src.mkdir(exist_ok=True)
        for f in os.listdir(tmp_path / name):
            if f.endswith(".parquet"):
                dst = src / f"{name}_{f}"
                os.rename(tmp_path / name / f, dst)
                # the file source orders micro-batches by modification
                # time; same-second writes collapse into ONE batch
                os.utime(dst, (time.time() + order * 600,) * 2)

    # batch 1: hour-0 events + an hour-5 event that will push the
    # watermark (10-min delay) to 04:50
    write_batch(
        "b1",
        [
            (base + timedelta(minutes=10), 1.0),
            (base + timedelta(minutes=20), 2.0),
            (base + timedelta(hours=5), 8.0),
        ],
        order=0,
    )
    # batch 2: hour-6 event — during this batch the watermark is 04:50,
    # so hour-0 closes, emits (3.0, 2), and its state is evicted
    write_batch("b2", [(base + timedelta(hours=6), 16.0)], order=1)
    # batch 3: a LATE hour-0 event — state is gone; the row must be
    # dropped, not re-open the window or emit a duplicate hour-0 row
    write_batch("b3", [(base + timedelta(minutes=30), 100.0)], order=2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "src"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.sum("value").alias("total"), F.count("*").alias("n"))
        .select(F.col("window.start").alias("w_start"), "total", "n")
    )
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = spark.read.parquet(out).collect()
    hour0 = [r for r in rows if r.w_start == base]
    # exactly ONE hour-0 row, closed with only the on-time events
    assert len(hour0) == 1, rows
    assert (hour0[0].total, hour0[0].n) == (3.0, 2), rows
    assert all(r.total != 100.0 and r.total != 103.0 for r in rows), rows
