"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship change-log → current-state query at sf0.001.
``queries()``   — the full catalog (spark_dns_spark.plans.catalog), one
                  entry per implemented operator from SURVEY.md §2.
``oracle_sql()``— DuckDB-runnable ANSI SQL per query (omitted for
                  non-SQL-expressible ops → driver does rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the co-located package importable no matter the driver's cwd.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: change-log → current-state snapshot (SURVEY.md §7.1
    M0) on /root/testdata/sf0.001."""
    from spark_dns_spark.plans.catalog import catalog

    return catalog()["changelog_snapshot"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spark_dns_spark.plans.catalog import catalog

    return {name: q.fn for name, q in catalog().items()}


def oracle_sql() -> dict[str, str]:
    from spark_dns_spark.plans.catalog import catalog

    return {name: q.sql for name, q in catalog().items() if q.sql is not None}
