"""Skew-mitigation queries — salting demonstrated on the change feed's
naturally skewed key: only ~7 zones serve the whole feed, so any
zone-keyed shuffle collapses to 7 reduce tasks (and one hot zone
dominates).  Both queries produce results identical to their unsalted
formulations, which is exactly what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.functions.dnsfn import zone_from_fqdn
from spark_dns_spark.operators import skew
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import DNS_CHANGES_CTE, dns_changes

_ZONED = """
, zoned AS (
  SELECT CASE WHEN z LIKE '%.' THEN z ELSE z || '.' END AS zone, fqdn, ip
  FROM (
    SELECT regexp_replace(
             CASE WHEN fqdn LIKE '%.' THEN fqdn ELSE fqdn || '.' END,
             '^[^.]+\\.', '') AS z, fqdn, ip
    FROM dns_changes
  )
)
"""


@register(
    "skew_salted_count",
    DNS_CHANGES_CTE
    + _ZONED
    + """
SELECT zone, count(*) AS n FROM zoned GROUP BY zone
""",
    doc="two-phase salted aggregation over the 7-zone skewed key: "
    "partial groupBy(zone, md5-salt-of-fqdn) restores K×16 parallelism, "
    "final groupBy(zone) — result identical to the plain count (the "
    "oracle), parallelism is the only difference",
    tags=("skew", "agg"),
)
def skew_salted_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = dns_changes(spark, sf_dir).withColumn("zone", zone_from_fqdn("fqdn"))
    return skew.salted_count(df, key="zone", salt_src="fqdn")


@register(
    "skew_salted_join",
    DNS_CHANGES_CTE
    + _ZONED
    + """
SELECT zone, count(*) AS n_changes, any_value(zone_ord) AS zone_ord
FROM (
  SELECT f.zone, f.fqdn, d.zone_ord
  FROM zoned f
  JOIN (SELECT zone, ROW_NUMBER() OVER (ORDER BY zone) AS zone_ord
        FROM (SELECT DISTINCT zone FROM zoned)) d
    ON f.zone = d.zone
)
GROUP BY zone
""",
    doc="skew-safe fact⋈dim join: fact side salted on md5(fqdn)%16, the "
    "7-row zone dim replicated ×16 — the hot zone spreads across 16 "
    "reducers instead of one; rolled up to prove result identity",
    tags=("skew", "join"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = dns_changes(spark, sf_dir).withColumn("zone", zone_from_fqdn("fqdn"))
    from pyspark.sql import Window

    dim = (
        fact.select("zone")
        .distinct()
        .withColumn(
            # constant partitionBy keeps the single-partition WindowExec
            # warning out of the audit log; the dim is 7 rows, the rank
            # is still total because the partition key is constant
            "zone_ord",
            F.row_number().over(Window.partitionBy(F.lit(1)).orderBy("zone")),
        )
    )
    joined = skew.salted_join(
        fact.select("zone", "fqdn"), dim, key="zone", salt_src="fqdn"
    )
    return joined.groupBy("zone").agg(
        F.count("*").alias("n_changes"),
        F.any_value("zone_ord").alias("zone_ord"),
    )
