"""Unit tests for the change-log operators — semantics the reference
pins in its Java tests (SURVEY.md §5), re-asserted on tiny in-memory
frames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spark_dns_spark.operators import changelog as cl


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _updates(spark):
    rows = [
        # duplicate identity (action,fqdn,ip) — latest ts must win
        ("IXFR_ADD", "Host1.example.acme", "127.0.0.1", _ts(1), 10),
        ("IXFR_ADD", "host1.example.acme.", "127.0.0.1", _ts(5), 20),
        ("IXFR_ADD", "host1.example.acme", "127.0.0.1", _ts(3), 30),
        # different ip → different identity
        ("IXFR_ADD", "host1.example.acme", "127.0.0.2", _ts(2), 40),
        # delete for another host
        ("IXFR_DELETE", "host2.example.acme", "127.0.0.9", _ts(4), 50),
        # other zone
        ("IXFR_ADD", "www.another.zone.", "10.0.0.1", _ts(6), 60),
    ]
    return spark.createDataFrame(
        rows, "action string, fqdn string, ip string, timestamp timestamp, ttl int"
    )


def test_latest_wins_global_dedup(spark):
    """A2: one survivor per (action,fqdn,ip) — global, unlike the
    reference's per-partition dedup (DnsUpdate.java:46-54)."""
    df = cl.dedup_updates_for_send(_updates(spark))
    rows = {(r.action, r.fqdn, r.ip): r for r in df.collect()}
    assert len(rows) == 4
    # normalization folded 3 variants of host1 into one, ts=5 survived
    key = ("IXFR_ADD", "host1.example.acme.", "127.0.0.1")
    assert rows[key].timestamp == _ts(5)


def test_zone_derivation_and_normalize(spark):
    df = cl.group_updates_by_zone(cl.normalize_updates(_updates(spark)))
    zones = {r.fqdn: r.zone for r in df.collect()}
    assert zones["host1.example.acme."] == "example.acme."
    assert zones["www.another.zone."] == "another.zone."


def test_snapshot_applies_deletes(spark):
    rows = [
        ("AXFR", "a.z.", "1.1.1.1", _ts(0)),
        ("IXFR_DELETE", "a.z.", "1.1.1.1", _ts(1)),  # deleted after snapshot
        ("AXFR", "b.z.", "2.2.2.2", _ts(0)),
        ("IXFR_DELETE", "c.z.", "3.3.3.3", _ts(1)),
        ("IXFR_ADD", "c.z.", "3.3.3.3", _ts(2)),  # re-added after delete
    ]
    df = spark.createDataFrame(
        rows, "action string, fqdn string, ip string, timestamp timestamp"
    )
    snap = cl.snapshot(df, ["fqdn", "ip"])
    alive = {r.fqdn for r in snap.collect()}
    assert alive == {"b.z.", "c.z."}


def test_validate_updates_flags(spark):
    rows = [
        ("IXFR_ADD", "h.z", "1.1.1.1", _ts(0), 1),  # ok
        ("IXFR_ADD", "h.z", "", _ts(0), 1),  # empty ip
        ("IXFR_ADD", " ", "1.1.1.1", _ts(0), 1),  # empty fqdn
        (None, "h.z", "1.1.1.1", _ts(0), 1),  # null action
        ("IXFR_ADD", "h.z", "1.1.1.1", None, 1),  # null ts
        ("IXFR_ADD", "h.z", "1.1.1.1", _ts(0), 0),  # ttl <= 0
    ]
    df = spark.createDataFrame(
        rows, "action string, fqdn string, ip string, timestamp timestamp, ttl int"
    )
    out = cl.validate_updates(df).collect()
    got = [r.violation for r in out]
    assert got == [
        None,
        "empty ip",
        "empty fqdn",
        "null action",
        "null timestamp",
        "non-positive ttl",
    ]


def test_latest_wins_deterministic_tiebreak(spark):
    rows = [
        ("IXFR_ADD", "h.z.", "1.1.1.1", _ts(1), 1),
        ("IXFR_ADD", "h.z.", "1.1.1.1", _ts(1), 2),  # same ts, higher id wins
    ]
    df = spark.createDataFrame(
        rows, "action string, fqdn string, ip string, timestamp timestamp, id int"
    )
    out = cl.latest_wins(df, ["action", "fqdn", "ip"], tiebreak=["id"]).collect()
    assert len(out) == 1 and out[0].id == 2
