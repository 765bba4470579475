"""Data-layout optimization — Z-order (Morton) clustering keys.

At 100 TB the scan you avoid is the cheapest scan: parquet/Delta/Iceberg
prune files and row groups by min-max column stats, and a table sorted
by ONE column has useless bounds for every OTHER predicate column.
Interleaving the bits of two predicate columns (Morton order) gives
every file a tight bounding BOX in (user_id, k) space, so 2-D
predicates prune on both axes — the same technique Delta's OPTIMIZE
ZORDER BY ships.  The key is pure integer bit arithmetic, so it is a
whole-stage-codegen expression here and a bit-identical DuckDB oracle;
``tests/test_layout.py`` proves the pruning claim with real parquet
footers (files written z-sorted have ~sqrt(n) tighter per-file bounds
than single-column sort on the secondary axis).

Scale shape: computing the key is map-only (zero shuffles); laying out
the table is ONE range-partitioned sort (`repartitionByRange(zkey)` +
local sort) — the normal big-table rewrite job, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import load_events

BITS = 16  #: bits interleaved per dimension (key fits in 32 bits)


def _morton_terms(a: str, b: str) -> str:
    """``a`` bits land on odd positions, ``b`` bits on even — shared
    verbatim by the Spark expression and the DuckDB oracle (shifts are
    spelled as multiplications by power-of-two literals so operator
    precedence can't differ between engines)."""
    terms = []
    for i in range(BITS):
        terms.append(f"(({a} >> {i}) & 1) * {1 << (2 * i + 1)}")
        terms.append(f"(({b} >> {i}) & 1) * {1 << (2 * i)}")
    return " + ".join(terms)


def zorder_key(a: str, b: str) -> F.Column:
    """Morton-interleave two non-negative integer columns (codegen)."""
    return F.expr(_morton_terms(a, b)).cast("long")


@register(
    "layout_zorder_events",
    f"""
WITH ev AS (
  SELECT event_id, user_id,
         CAST(props->>'$.k' AS BIGINT) AS k
  FROM events
)
SELECT event_id, user_id, k,
       ({_morton_terms("user_id", "k")})::BIGINT AS zkey
FROM ev
""",
    doc=f"Z-order (Morton) clustering key over (user_id, props.k): "
    f"{BITS} bits per dimension interleaved in one codegen integer "
    "expression — the data-layout primitive behind OPTIMIZE ZORDER "
    "BY; map-only, bit-identical across engines.  The pruning payoff "
    "is proven against real parquet footers in tests/test_layout.py",
    tags=("layout", "relational"),
)
def layout_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return ev.select("event_id", "user_id", "k", zorder_key("user_id", "k").alias("zkey"))
