"""Partition pruning: a year-partitioned layout + a year filter must
prune at PLAN time (PartitionFilters on the scan, only matching
partition directories read) — the layout decision that turns a 100 TB
scan into a 1-year scan before any I/O happens."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_dns_spark.session import load_table


@pytest.fixture(scope="module")
def partitioned_orders(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("orders_by_year"))
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    orders.write.mode("overwrite").partitionBy("o_year").parquet(root)
    return root


def test_year_filter_prunes_partitions(spark, partitioned_orders, sf_dir):
    df = spark.read.parquet(partitioned_orders).filter(F.col("o_year") == 1997)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_year" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan

    # behavioral proof: the scan touches ONLY the 1997 directory
    files = [r[0] for r in df.select(F.input_file_name()).distinct().collect()]
    assert files and all("o_year=1997" in f for f in files)

    # and the pruned read is still correct
    expected = (
        load_table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .count()
    )
    assert df.count() == expected > 0


def test_unpartitioned_filter_does_not_prune(spark, partitioned_orders):
    # sanity: a non-partition predicate shows up as PushedFilters (data
    # skipping), NOT PartitionFilters — the two mechanisms are distinct
    df = spark.read.parquet(partitioned_orders).filter(
        F.col("o_totalprice") > 100000
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    part_section = plan.split("PartitionFilters")[1].split("]")[0]
    assert "o_totalprice" not in part_section
    assert "GreaterThan(o_totalprice" in plan
