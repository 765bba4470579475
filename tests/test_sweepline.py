"""Hand-computed fixture for the sweep-line concurrency query: the
two-level prefix-sum plan must reproduce interval-overlap counts,
including sessions that close inside a LATER hour than they opened."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spark_dns_spark.plans.q_sessions import SESSION_SECS


def test_peak_concurrency_hand_fixture(spark, tmp_path, sf_dir):
    # Reuse the registered plan via a scratch sf dir holding only the
    # events table (the query reads events.parquet from sf_dir).
    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        # three sessions overlapping inside 10:00 (peak 3)
        (1, base + dt.timedelta(seconds=0)),
        (2, base + dt.timedelta(seconds=60)),
        (3, base + dt.timedelta(seconds=120)),
        # one isolated session at 11:58 whose -1 endpoint falls in 12:00;
        # nothing else in 12:00, so hour 12's peak comes from the
        # carried-over concurrency prefix, not from any 12:00 start
        (4, base + dt.timedelta(hours=1, minutes=58)),
    ]
    df = spark.createDataFrame(
        [(i, ts, i, "click", 0.0, '{"k": 1}') for i, ts in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    scratch = str(tmp_path / "sf")
    df.write.parquet(scratch + "/events.parquet")

    from spark_dns_spark.plans.catalog import catalog

    got = {
        r["hr"]: r["peak"]
        for r in catalog()["sessions_peak_concurrency"]
        .fn(spark, scratch)
        .collect()
    }
    assert got[dt.datetime(2024, 3, 1, 10, 0, 0)] == 3
    assert got[dt.datetime(2024, 3, 1, 11, 0, 0)] == 1
    # 12:00 contains ONLY the close of session 4: concurrency entering
    # the hour is 1 and the close drops it to 0 -> peak is 1 only if
    # the cross-hour prefix carried correctly, 0 if it was dropped
    assert got[dt.datetime(2024, 3, 1, 12, 0, 0)] == 1
    assert len(got) == 3
