"""File-format round-trips (SURVEY.md §2.1 S11) — the reference only
ever touches parquet (via its tests); an engine replacing it needs the
other interchange formats working end-to-end.  Each query writes the
feed out in the format under test, reads it back, and aggregates; the
oracle aggregates the source directly, so the round-trip must be
value-exact (including double text-serialization round-trips).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import load_events, scratch_dir

_AGG_SQL = """
SELECT event_type, count(*) AS n,
       sum(CAST(floor(value * 1000 + 0.5) AS BIGINT))::BIGINT AS value_milli,
       min(event_id) AS min_id, max(event_id) AS max_id
FROM events GROUP BY event_type
"""


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    out = scratch_dir(f"fmt_{fmt}_")
    path = os.path.join(out, "data")
    writer = ev.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path)
    reader = spark.read.schema(
        "event_id long, user_id long, event_type string, value double"
    ).format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    back = reader.load(path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        # milli-int sum: order-proof across engines AND proves the text
        # round-trip was value-exact (any serde drift would shift it).
        F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")).alias(
            "value_milli"
        ),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


@register(
    "format_json_roundtrip",
    _AGG_SQL,
    doc="S11 breadth: events written as JSON lines and read back with an "
    "explicit schema must aggregate identically to the source (double "
    "text round-trip exact)",
    tags=("formats",),
)
def format_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "json")


@register(
    "format_csv_roundtrip",
    _AGG_SQL,
    doc="S11 breadth: same round-trip through headered CSV",
    tags=("formats",),
)
def format_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "csv")


@register(
    "format_orc_roundtrip",
    _AGG_SQL,
    doc="S11 breadth: same round-trip through ORC (Spark-native binary "
    "columnar; typed storage makes value-exactness structural, the "
    "query proves the write/read path end-to-end)",
    tags=("formats",),
)
def format_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "orc")
