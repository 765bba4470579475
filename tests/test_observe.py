"""Per-zone serial / transfer observability (VERDICT r2 item 8 —
ZoneVersion.java:13-53 parity): serials surface in streaming progress
``endOffset``; row metrics surface via ``observe_transfer`` on both the
batch path (Observation) and the stream path (observedMetrics)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import Observation

from spark_dns_spark.functions.dnsfn import observe_transfer
from spark_dns_spark.sources import register_all
from spark_dns_spark.sources.zonestore import ZoneStore

ZONE = "example.acme."


@pytest.fixture()
def store(tmp_path):
    s = ZoneStore(str(tmp_path / "zones"))
    s.create_zone(
        ZONE,
        records=[
            ("workstation1.example.acme.", "192.168.1.1"),
            ("server1.example.acme.", "192.168.1.10"),
        ],
        serial=4,
    )
    return s


def test_batch_observation_metrics(spark, store):
    register_all(spark)
    df = (
        spark.read.format("dns")
        .option("store", store.root)
        .option("zones", ZONE)
        .load()
    )
    obs = Observation("dns")
    observe_transfer(df, obs).collect()
    got = obs.get
    assert got["n_rows"] == 2
    assert got["n_zones"] == 1
    assert got["max_transfer_ts"] is not None


def test_stream_progress_carries_serials_and_metrics(spark, store, tmp_path):
    register_all(spark)
    stream = (
        spark.readStream.format("dns")
        .option("store", store.root)
        .option("zones", ZONE)
        .load()
    )
    q = (
        observe_transfer(stream, "dns")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # find the progress entry of the data-carrying batch
    progresses = [json.loads(p.json) for p in q.recentProgress]
    with_rows = [p for p in progresses if p.get("numInputRows", 0) > 0]
    assert with_rows, f"no data batch in progress: {progresses}"
    p = with_rows[-1]
    # ZoneVersion parity: per-zone serial is a first-class progress
    # field — the source's end offset is the {zone: serial} map
    end = p["sources"][0]["endOffset"]
    if isinstance(end, str):
        end = json.loads(end)
    assert end == {ZONE: 4}
    # observed row metrics ride the same progress record
    om = p.get("observedMetrics", {}).get("dns")
    assert om is not None, f"observedMetrics missing: {p}"
    assert om["n_rows"] == 2
    assert om["n_zones"] == 1
