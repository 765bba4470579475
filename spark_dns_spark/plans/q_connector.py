"""Connector queries — the ``dns`` DataSource read path as
oracle-checked catalog entries.

A zone store is provisioned deterministically from the ``dns_changes``
feed (one serial per change, ordered by (ts, event_id) within each
zone), so the connector's AXFR/IXFR output is exactly reproducible in
ANSI SQL over ``events`` — giving the *connector itself* a DuckDB
oracle, which the reference could only approximate with a live Bind9
container (SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.functions.dnsfn import fqdn_normalize, zone_from_fqdn
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import DNS_CHANGES_CTE, await_or_fail, dns_changes

_SCRATCH = Path(__file__).resolve().parent.parent.parent / ".scratch" / "zonestores"

#: IXFR cutoff serial for the delta query — valid at every test SF
#: (per-zone history is ≥143 changes even at sf0.001).
IXFR_CUT = 100

#: Normalized change feed with per-zone serials — shared CTE tail for
#: the oracles below.  Serial = row_number within zone by (ts, event_id),
#: mirroring one store serial bump per applied change.
_NORM_CTE = """
, norm AS (
  SELECT action,
         CASE WHEN lower(fqdn) LIKE '%.' THEN lower(fqdn)
              ELSE lower(fqdn) || '.' END AS fqdn,
         ip, ts, event_id
  FROM dns_changes
), zoned AS (
  SELECT action, fqdn, ip, ts, event_id,
         CASE WHEN z LIKE '%.' THEN z ELSE z || '.' END AS zone
  FROM (SELECT *, regexp_replace(fqdn, '^[^.]+\\.', '') AS z FROM norm)
), serialed AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY zone ORDER BY ts, event_id) AS serial
  FROM zoned
)
"""


def _store_root(spark: SparkSession, sf_dir: str) -> str:
    """Provision (once per sf_dir) the zone store derived from the feed.

    The marker records the provisioned row count; the feed is a pure
    function of sf_dir, so marker presence alone proves completeness —
    no per-invocation count() over the feed (a full scan per connector
    query otherwise)."""
    name = Path(sf_dir).name or "sf"
    root = _SCRATCH / name
    marker = root / ".complete.v2"  # v2: base+replay store format
    if marker.exists():
        return str(root)

    df = dns_changes(spark, sf_dir).select(
        "action",
        fqdn_normalize(F.lower(F.col("fqdn"))).alias("fqdn"),
        "ip",
        "ts",
        "event_id",
    )
    df = df.withColumn("zone", zone_from_fqdn("fqdn"))

    w = Window.partitionBy("zone").orderBy("ts", "event_id")
    serialed = df.withColumn("serial", F.row_number().over(w)).select(
        "zone", "serial", "action", "fqdn", "ip"
    )
    os.makedirs(root, exist_ok=True)
    root_s = str(root)

    # Distributed provisioning: repartition co-locates each zone on one
    # executor task, which builds and atomically writes that zone's
    # store file — no driver collect, so the same path works when the
    # feed is 100 TB and the "store" is a real server per zone.
    def _write_zones(rows) -> None:
        from spark_dns_spark.sources.zonestore import ZoneStore

        by_zone: dict[str, list] = {}
        for r in rows:
            by_zone.setdefault(r.zone, []).append(
                (r.serial, r.action, r.fqdn, r.ip)
            )
        store = ZoneStore(root_s)
        for zone, hist in by_zone.items():
            hist.sort()
            state: dict[tuple, bool] = {}
            for _, action, fqdn, ip in hist:
                state[(fqdn, ip)] = action in ("AXFR", "IXFR_ADD")
            records = [k for k, alive in state.items() if alive]
            store.create_zone(zone, records=records, serial=len(hist), history=hist)

    serialed.repartition("zone").foreachPartition(_write_zones)
    marker.write_text("provisioned")
    return str(root)


def _dns_reader(spark: SparkSession, root: str, **opts):
    from spark_dns_spark.sources import register_all

    register_all(spark)
    reader = spark.read.format("dns").option("store", root).option(
        "organization", "Acme Inc."
    )
    for k, v in opts.items():
        reader = reader.option(k.replace("_", "-"), str(v))
    return reader.load()


@register(
    "dns_axfr_read",
    DNS_CHANGES_CTE
    + _NORM_CTE
    + """
SELECT 'AXFR' AS action, fqdn, ip, 'Acme Inc.' AS organization, zone FROM (
  SELECT fqdn, ip, zone, action AS last_action,
         ROW_NUMBER() OVER (PARTITION BY zone, fqdn, ip
                            ORDER BY serial DESC) AS rn
  FROM serialed
) WHERE rn = 1 AND last_action IN ('AXFR', 'IXFR_ADD')
""",
    doc="S1-S4: full AXFR snapshot read through the dns DataSource equals "
    "the change-log's materialized state",
    tags=("connector",),
)
def dns_axfr_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _store_root(spark, sf_dir)
    df = _dns_reader(spark, root, xfr="axfr")
    return df.select("action", "fqdn", "ip", "organization", "zone")


@register(
    "dns_ixfr_delta_read",
    DNS_CHANGES_CTE
    + _NORM_CTE
    + f"""
SELECT action, fqdn, ip, zone, count(*) AS n
FROM serialed
WHERE serial > {IXFR_CUT}
GROUP BY action, fqdn, ip, zone
""",
    doc="S5/S6: IXFR delta read from a fixed serial returns exactly the "
    "per-zone change-log tail",
    tags=("connector",),
)
def dns_ixfr_delta_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _store_root(spark, sf_dir)
    df = _dns_reader(spark, root, xfr="ixfr", serial=IXFR_CUT)
    return df.groupBy("action", "fqdn", "ip", "zone").agg(F.count("*").alias("n"))


@register(
    "dns_read_zone_pushdown",
    DNS_CHANGES_CTE
    + _NORM_CTE
    + """
SELECT 'AXFR' AS action, fqdn, ip, zone FROM (
  SELECT fqdn, ip, zone, action AS last_action,
         ROW_NUMBER() OVER (PARTITION BY zone, fqdn, ip
                            ORDER BY serial DESC) AS rn
  FROM serialed
  WHERE zone = 'zone3.example.'
) WHERE rn = 1 AND last_action IN ('AXFR', 'IXFR_ADD')
""",
    doc="zone-filter pushdown: EqualTo('zone') prunes partitions inside "
    "the Python reader before any transfer (beyond-reference, SURVEY §4)",
    tags=("connector", "pushdown"),
)
def dns_read_zone_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _store_root(spark, sf_dir)
    df = _dns_reader(spark, root, xfr="axfr")
    return df.filter(F.col("zone") == "zone3.example.").select(
        "action", "fqdn", "ip", "zone"
    )


@register(
    "dns_stream_sink_roundtrip",
    DNS_CHANGES_CTE
    + _NORM_CTE
    + """
SELECT 'AXFR' AS action, fqdn, ip, zone FROM (
  SELECT fqdn, ip, zone, action AS last_action,
         ROW_NUMBER() OVER (PARTITION BY fqdn, ip
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM serialed
) WHERE rn = 1 AND last_action IN ('AXFR', 'IXFR_ADD')
""",
    doc="S7-S10/T1-T5 e2e under the oracle: the whole change feed is "
    "written through the dns_update sink (global dedup + ts-ordered "
    "apply) into a fresh store, then streamed back with the dns stream "
    "reader (availableNow, offsets 0→current, commit+progress files); "
    "the streamed snapshot must equal the feed's latest-wins state.  "
    "Mirrors the reference's two hardest e2e tests "
    "(DnsSourceRelationProviderTest.java:203-226, "
    "DnsSinkRelationProviderTest.java:182-197)",
    tags=("connector", "streaming", "sink"),
)
def dns_stream_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from spark_dns_spark.sources import register_all
    from spark_dns_spark.sources.dns_sink import send_updates
    from spark_dns_spark.sources.zonestore import ZoneStore

    register_all(spark)
    # ONE reusable scratch root per sf, wiped at entry — repeated
    # bench/oracle runs must not accumulate store+checkpoint dirs
    # (VERDICT r2 item 9).
    root = str(_SCRATCH / "roundtrip" / (Path(sf_dir).name or "sf"))
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)

    upd = dns_changes(spark, sf_dir).select(
        "action",
        fqdn_normalize(F.lower(F.col("fqdn"))).alias("fqdn"),
        "ip",
        F.col("ts").alias("timestamp"),
        F.lit(3600).cast("int").alias("ttl"),
        # feed sequence number: pins equal-timestamp latest-wins ties in
        # the sink exactly like the oracle's ORDER BY ts DESC, event_id DESC
        "event_id",
    )
    # zone DDL: provision empty zones (the one driver-side collect —
    # ~#zones rows, the provisioning step a live server wouldn't need)
    zones = [
        r.z
        for r in upd.select(zone_from_fqdn("fqdn").alias("z")).distinct().collect()
    ]
    store = ZoneStore(root)
    for z in zones:
        store.create_zone(z, records=[], serial=1)

    # S8: batch sink with global dedup + one update message per zone
    send_updates(upd, root)

    # S7/T1-T5: stream the store back from offset 0, availableNow
    out = os.path.join(root, "out")
    q = (
        spark.readStream.format("dns")
        .option("store", root)
        .option("organization", "Acme Inc.")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(root, ".ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_fail(q, 300)
    return spark.read.parquet(out).select("action", "fqdn", "ip", "zone")


@register(
    "dns_ip_cidr_attribution",
    DNS_CHANGES_CTE
    + """
, ips AS (
  SELECT DISTINCT
    CAST(string_split(ip, '.')[2] AS BIGINT) AS o2,
    CAST(string_split(ip, '.')[4] AS BIGINT) AS o4
  FROM dns_changes
), c24 AS (
  -- a /24 exists where the data shows a dense third-level block
  SELECT o2, '10.' || o2 || '.0.0/24' AS block, 24 AS pfx
  FROM (SELECT o2, count(*) AS n FROM ips GROUP BY o2)
  WHERE n >= 32
), c16 AS (
  SELECT DISTINCT o2, '10.' || o2 || '.0.0/16' AS block, 16 AS pfx FROM ips
), matched AS (
  SELECT i.o2, i.o4, block, pfx,
         row_number() OVER (PARTITION BY i.o2, i.o4 ORDER BY pfx DESC) AS rn
  FROM ips i JOIN (SELECT * FROM c24 UNION ALL SELECT * FROM c16) c
    USING (o2)
)
SELECT block, pfx::BIGINT AS prefix_len, count(*)::BIGINT AS n_ips
FROM matched WHERE rn = 1
GROUP BY block, pfx
""",
    doc="longest-prefix-match CIDR attribution — the network-analytics "
    "join DNS logs feed into: the block table is derived from the data "
    "(/24 where a second-octet block is dense, /16 everywhere), each "
    "distinct IP matches the LONGEST covering prefix (hierarchy as a "
    "broadcast equi-join on the shared octet key + argmax on prefix "
    "length, the scalable form of an interval/trie lookup — the dim "
    "broadcasts at any corpus scale because the routing table, not the "
    "traffic, bounds it), aggregated to per-block address counts",
    tags=("connector", "join", "network"),
)
def dns_ip_cidr_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = dns_changes(spark, sf_dir)
    ips = (
        ch.select(
            F.split("ip", "\\.").getItem(1).cast("long").alias("o2"),
            F.split("ip", "\\.").getItem(3).cast("long").alias("o4"),
        )
        .distinct()
        .persist()
    )
    c24 = (
        ips.groupBy("o2")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 32)
        .select(
            "o2",
            F.concat(F.lit("10."), F.col("o2").cast("string"),
                     F.lit(".0.0/24")).alias("block"),
            F.lit(24).alias("pfx"),
        )
    )
    c16 = ips.select("o2").distinct().select(
        "o2",
        F.concat(F.lit("10."), F.col("o2").cast("string"),
                 F.lit(".0.0/16")).alias("block"),
        F.lit(16).alias("pfx"),
    )
    cidr = c24.unionAll(c16)
    w = Window.partitionBy("o2", "o4").orderBy(F.desc("pfx"))
    matched = (
        ips.join(F.broadcast(cidr), "o2")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return matched.groupBy("block", "pfx").agg(
        F.count(F.lit(1)).alias("n_ips")
    ).select(
        "block", F.col("pfx").cast("long").alias("prefix_len"), "n_ips"
    )
