"""Property tests for the sweep-line span clustering primitive: the
distributed two-level break-detection + island numbering must equal a
sequential interval-union reference on random interval sets."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _ref_islands(intervals):
    """Sequential interval union: sort by (a, b), break when a exceeds
    the running max end; return island id per interval."""
    order = sorted(range(len(intervals)), key=lambda i: intervals[i])
    out = [0] * len(intervals)
    island = 0  # the distributed cumsum numbers islands from 1
    run_end = None
    for i in order:
        a, b = intervals[i]
        if run_end is None or a > run_end:
            island += 1
            run_end = b
        else:
            run_end = max(run_end, b)
        out[i] = island
    return out


def _spark_islands(spark, intervals, nb=8):
    """The exact two-level formulation dedup_snm_span_clusters uses."""
    from pyspark.sql import Window

    iv = spark.createDataFrame(intervals, "rnk_a long, rnk_b long")
    max_r = max(b for _, b in intervals)
    span = max_r // nb + 1
    b = iv.withColumn("bucket", F.expr(f"rnk_a div {span}"))
    w_prev = (
        Window.partitionBy("bucket")
        .orderBy("rnk_a", "rnk_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_pre_b = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bstats = (
        b.groupBy("bucket")
        .agg(F.max("rnk_b").alias("bmax"))
        .withColumn("prefix_end", F.max("bmax").over(w_pre_b))
        .select("bucket", "prefix_end")
    )
    flg = (
        b.join(F.broadcast(bstats), "bucket")
        .withColumn("prev_local", F.max("rnk_b").over(w_prev))
        .withColumn(
            "prev_end",
            F.greatest(
                F.coalesce(F.col("prefix_end"), F.lit(-1)),
                F.coalesce(F.col("prev_local"), F.lit(-1)),
            ),
        )
        .withColumn(
            "brk", F.when(F.col("rnk_a") > F.col("prev_end"), 1).otherwise(0)
        )
    )
    w_cum = (
        Window.partitionBy("bucket")
        .orderBy("rnk_a", "rnk_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    btot = (
        flg.groupBy("bucket")
        .agg(F.sum("brk").alias("btot"))
        .withColumn(
            "prefix_cnt", F.coalesce(F.sum("btot").over(w_pre_b), F.lit(0))
        )
        .select("bucket", "prefix_cnt")
    )
    rows = (
        flg.join(F.broadcast(btot), "bucket")
        .withColumn("island", F.col("prefix_cnt") + F.sum("brk").over(w_cum))
        .select("rnk_a", "rnk_b", "island")
        .collect()
    )
    return {(r["rnk_a"], r["rnk_b"]): r["island"] for r in rows}


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_two_level_islands_match_sequential_union(spark, seed):
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, 500, size=80)
    lengths = rng.integers(1, 12, size=80)
    intervals = sorted(
        {(int(a), int(a + l)) for a, l in zip(starts, lengths)}
    )
    want = _ref_islands(intervals)
    got = _spark_islands(spark, intervals)
    # same grouping (island numbering may differ only by order — here
    # both number in (a, b) order, so ids match exactly)
    assert [got[iv] for iv in intervals] == want


def test_touching_intervals_merge(spark):
    # [1,5] and [5,9] share endpoint 5 -> one island; [11,12] separate
    got = _spark_islands(spark, [(1, 5), (5, 9), (11, 12)])
    assert got[(1, 5)] == got[(5, 9)] != got[(11, 12)]
