"""Bucketing = the co-located-join strategy for repeated fact⋈fact
joins at 100 TB: both tables pre-hashed into the same bucket count on
the join key, so the join plans WITHOUT a shuffle on either side.

This is the storage-layout complement to the broadcast strategy
asserted in test_plan_shapes.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_dns_spark.session import load_table

BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    for name, df, key in (
        ("orders_b", orders, "o_orderkey"),
        ("lineitem_b", lineitem, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(BUCKETS, key)
            .sortBy(key)
            .option("path", f"{wh}/{name}")
            .saveAsTable(name)
        )
    yield spark
    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(bucketed, spark):
    # disable broadcast so the join strategy is genuinely SMJ/SHJ and
    # the absence of Exchange is attributable to bucketing
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("lineitem_b")
            .join(
                spark.table("orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("HashAggregate")[-1]  # below the agg
        assert "Exchange" not in join_part, (
            "bucketed join must not shuffle either side:\n" + plan
        )
        # correctness: same result as the unbucketed join
        expected = {
            (r.o_orderstatus, r.n)
            for r in spark.table("lineitem_b")
            .join(
                spark.table("orders_b").hint("shuffle_hash"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        got = {(r.o_orderstatus, r.n) for r in j.collect()}
        assert got == expected and got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
