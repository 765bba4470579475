from spark_dns_spark.sources.dns_source import DnsDataSource  # noqa: F401
from spark_dns_spark.sources.dns_sink import DnsUpdateDataSource  # noqa: F401
from spark_dns_spark.sources.zonestore import ZoneStore  # noqa: F401


def register_all(spark) -> None:
    """Register the ``dns`` and ``dns_update`` formats on a session
    (idempotent) — the Python-API equivalent of the reference's
    META-INF/services DataSourceRegister entries
    (src/main/resources/META-INF/services/...DataSourceRegister:1-2)."""
    spark.dataSource.register(DnsDataSource)
    spark.dataSource.register(DnsUpdateDataSource)
    try:
        # zone-filter pushdown needs this runtime conf (Spark 4.1)
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # locked-down conf: reader falls back to full scan
