"""spark_dns_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference DNS change-log connector
(yurkao/spark-dns), re-expressed Spark-first.

Layers
------
- ``functions``  — scalar column functions (fqdn/zone derivation, json,
  portable hashing) mirroring SURVEY.md §2.8 F1–F9.
- ``operators``  — relational change-log operators (latest-wins dedup,
  snapshot materialization, group-by-zone, validation) plus the
  training-data-pipeline operators (dedup family, similarity search,
  text analysis, sessionization).
- ``sources``    — Python DataSource connectors: format ``dns`` (batch +
  streaming read of a zone store) and ``dns_update`` (batch + streaming
  write), mirroring SURVEY.md §2.1 S1–S10.
- ``plans``      — the query catalog wired into ``__spark_entry__.py``.
- ``streaming``  — streaming-specific helpers (offsets, progress log).

Everything is built on the public PySpark 4.x API (DataFrame, SQL,
``pyspark.sql.datasource``); no JVM extensions.
"""

__version__ = "0.1.0"
