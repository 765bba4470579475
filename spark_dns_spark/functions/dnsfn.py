"""Scalar column functions — SURVEY.md §2.8 (F1–F9).

Each mirrors a transformation the reference performs imperatively in
Java; here they are Catalyst ``Column`` expressions (JVM-side, codegen,
no Python in the hot path).

Reference parity (cited file:line relative to /root/reference):
- F1  lower(fqdn)            dao/DnsChangeFactory.java:20
- F3  to_json(struct(*))     spark/write/DnsSinkRelationProvider.java:25-27
- F4  json decode            spark/write/DnsBatchPartitionHandler.java:47-51
- F5  zone-from-fqdn         spark/write/DnsPartitionHandler.java:52-62
- F6  fqdn normalize         spark/write/DnsPartitionHandler.java:85-94
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def fqdn_lower(c: Column | str) -> Column:
    """F1 — lower-case an FQDN at ingest (DnsChangeFactory.java:20)."""
    return F.lower(_col(c))


def fqdn_normalize(c: Column | str) -> Column:
    """F6 — make an FQDN absolute: append trailing dot if missing
    (DnsPartitionHandler.java:85-94)."""
    c = _col(c)
    return F.when(c.endswith("."), c).otherwise(F.concat(c, F.lit(".")))


def zone_from_fqdn(c: Column | str) -> Column:
    """F5 — derive the zone from an FQDN by stripping the first label and
    forcing a trailing dot: ``mail.google.com.`` → ``google.com.``
    (DnsPartitionHandler.java:52-62).

    Works on absolute and relative names; single-label names map to the
    root zone ``.`` like the reference's split-and-drop-first would.
    """
    return fqdn_normalize(F.regexp_replace(fqdn_normalize(c), r"^[^.]+\.", ""))


def epoch_micros(c: Column | str) -> Column:
    """Microseconds since epoch, robust to TIMESTAMP vs TIMESTAMP_NTZ.

    ``F.unix_micros`` only accepts TIMESTAMP (with-local-timezone), but
    parquet written without the isAdjustedToUTC flag is inferred as
    TIMESTAMP_NTZ by PySpark 4.x.  Casting NTZ → TIMESTAMP interprets
    the naive wall-clock in the session timezone — pinned to UTC by
    :data:`spark_dns_spark.session.RUNTIME_CONF` — so the result is
    exact either way, and a no-op cast when the column is already LTZ.
    Use this everywhere instead of raw ``F.unix_micros``.
    """
    return F.unix_micros(_col(c).cast("timestamp"))


def json_get(c: Column | str, path: str) -> Column:
    """F4 — extract one field from a JSON string column.

    The reference decodes the whole JSON row to a POJO via Jackson
    (DnsBatchPartitionHandler.java:47-51); the declarative equivalent is
    ``get_json_object`` which Catalyst can evaluate JVM-side.
    """
    return F.get_json_object(_col(c), f"$.{path}")


def encode_update_json(*cols: str) -> Column:
    """F3 — serialize a row to one JSON string column, the sink's wire
    encoding (DnsSinkRelationProvider.java:25-27)."""
    return F.to_json(F.struct(*[F.col(c) for c in cols]))


def observe_transfer(df, observer="dns"):
    """Per-batch transfer observability — parity with the reference's
    ``ZoneVersion`` accumulators (ZoneVersion.java:13-53, registered in
    DnsSourceRelationProvider.java:82-83, surfaced in the Spark UI per
    README.md:194).

    The max-merge semantics of those accumulators live in this engine's
    OFFSETS: the stream's ``{zone: serial}`` end offsets appear verbatim
    in every ``StreamingQueryProgress.sources[].endOffset`` (and in the
    source's own progress files), so per-zone serials are already a
    first-class progress metric.  This helper adds the row-level batch
    metrics next to them: pass a name (streaming — metrics appear in
    ``StreamingQueryProgress.observedMetrics``) or a
    ``pyspark.sql.Observation`` (batch — read ``obs.get`` after the
    action).
    """
    return df.observe(
        observer,
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct("zone").alias("n_zones"),
        F.max("timestamp").alias("max_transfer_ts"),
    )


def portable_hash60(c: Column | str) -> Column:
    """Deterministic 60-bit hash computable identically in Spark and
    ANSI-ish SQL (DuckDB oracle): first 15 hex chars of md5, parsed
    base-16.  Used by MinHash/SimHash so the oracle can reproduce
    signatures bit-for-bit.

    DuckDB equivalent: ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(_col(c)), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str) -> str:
    """DuckDB-side rendering of :func:`portable_hash60` for oracles."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def portable_hash32(c: Column | str) -> Column:
    """32-bit variant of :func:`portable_hash60` (first 8 hex chars of
    md5).  Small enough that ``h * a + b`` with 31-bit multipliers stays
    inside int64 — the base hash for affine-reseeded MinHash, where one
    md5 feeds all K hash functions instead of K md5 passes."""
    return F.conv(F.substring(F.md5(_col(c)), 1, 8), 16, 10).cast("long")


def portable_hash32_sql(expr: str) -> str:
    """DuckDB-side rendering of :func:`portable_hash32` for oracles."""
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"
