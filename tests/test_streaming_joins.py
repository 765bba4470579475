"""Streaming breadth beyond the reference (round 3): stream-stream
interval join with watermark-bounded state, and
``dropDuplicatesWithinWatermark`` replay suppression.

Both follow the file-source micro-batch recipe of
``test_streaming_window.py`` (distinct mtimes ⇒ distinct batches) and
assert equivalence with the batch formulation of the same semantics —
the property that lets the engine's batch oracle vouch for the
streaming operator.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F

BASE = datetime(2024, 1, 1, 0, 0, 0)


def _writer(spark, tmp_path, src_name):
    src = tmp_path / src_name
    src.mkdir(exist_ok=True)

    def write_batch(name, rows, schema, order):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / name)
        )
        for f in os.listdir(tmp_path / name):
            if f.endswith(".parquet"):
                dst = src / f"{name}_{f}"
                os.rename(tmp_path / name / f, dst)
                # file source orders micro-batches by mtime; same-second
                # writes collapse into one batch
                os.utime(dst, (time.time() + order * 600,) * 2)

    return src, write_batch


def test_stream_stream_interval_join(spark, tmp_path):
    """Impressions ⋈ clicks on user_id with click within 30 min AFTER
    the impression — the canonical stream-stream join; watermarks bound
    both state stores."""
    imp_schema = "imp_ts timestamp, user_id long, imp_id long"
    clk_schema = "clk_ts timestamp, user_id long, clk_id long"
    imp_src, write_imp = _writer(spark, tmp_path, "imp_src")
    clk_src, write_clk = _writer(spark, tmp_path, "clk_src")

    imps = [
        (BASE + timedelta(minutes=0), 1, 100),
        (BASE + timedelta(minutes=5), 2, 101),
        (BASE + timedelta(minutes=10), 1, 102),
    ]
    clks = [
        (BASE + timedelta(minutes=20), 1, 900),  # joins imp 100 AND 102
        (BASE + timedelta(minutes=50), 2, 901),  # 45 min after imp 101: NO join
        (BASE + timedelta(minutes=12), 1, 902),  # joins imp 100 and 102
        # watermark pushers so all join state evicts and rows emit
        (BASE + timedelta(hours=6), 99, 998),
    ]
    write_imp("i1", imps, imp_schema, order=0)
    write_imp("i2", [(BASE + timedelta(hours=6), 98, 199)], imp_schema, order=1)
    write_clk("c1", clks, clk_schema, order=0)
    write_clk("c2", [(BASE + timedelta(hours=7), 99, 999)], clk_schema, order=1)

    def build(imp_df, clk_df):
        i = imp_df.withWatermark("imp_ts", "1 hour")
        c = clk_df.withWatermark("clk_ts", "1 hour")
        return i.join(
            c,
            (i.user_id == c.user_id)
            & (c.clk_ts >= i.imp_ts)
            & (c.clk_ts <= i.imp_ts + F.expr("INTERVAL 30 MINUTES")),
        ).select("imp_id", "clk_id")

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        build(
            spark.readStream.schema(imp_schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(imp_src)),
            spark.readStream.schema(clk_schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(clk_src)),
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = {
        (r.imp_id, r.clk_id) for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r.imp_id, r.clk_id)
        for r in build(
            spark.createDataFrame(
                imps + [(BASE + timedelta(hours=6), 98, 199)], imp_schema
            ),
            spark.createDataFrame(
                clks + [(BASE + timedelta(hours=7), 99, 999)], clk_schema
            ),
        ).collect()
    }
    # the intended pairs, and stream == batch formulation
    assert {(100, 900), (102, 900), (100, 902), (102, 902)} <= streamed
    assert (101, 901) not in streamed
    assert streamed == batch


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: replays of the same event_id
    across micro-batches within the watermark horizon are suppressed."""
    schema = "ts timestamp, event_id long, value double"
    src, write_batch = _writer(spark, tmp_path, "src")

    write_batch(
        "b1",
        [
            (BASE + timedelta(minutes=1), 1, 1.0),
            (BASE + timedelta(minutes=2), 2, 2.0),
        ],
        schema,
        order=0,
    )
    # batch 2 replays event 1 (same id, slightly different ts — an
    # at-least-once redelivery) and adds event 3
    write_batch(
        "b2",
        [
            (BASE + timedelta(minutes=3), 1, 1.0),
            (BASE + timedelta(minutes=4), 3, 3.0),
        ],
        schema,
        order=1,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        stream.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.read.parquet(out_dir).collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == [1, 2, 3], f"replay not suppressed: {ids}"
