"""Persisted term-bucketed BM25 postings index (VERDICT r14 item 3).

Pins the two halves of the r14 revisit condition:

1. the index layout is real — term-bucketed ``tf``/``dfreq`` parquet
   directories, doc-length and 1-row stats tables, all reused across
   serves via the content-keyed disk cache;
2. the probe join can never re-enter the reverted r14 regression
   (12-33 s at one task): both probe sides are REPARTITION_BY_NUM
   shuffles, the one shuffle origin Spark's AQE coalesce rule is
   defined to skip — so the exploding probe stage keeps its pinned
   ``spark.sql.shuffle.partitions`` parallelism no matter how tiny
   the compacted index files make the shuffle-write stats.
"""

from __future__ import annotations

import os

from spark_dns_spark.plans.q_retrieval import (
    BM25_BUCKETS,
    BM25_QMOD_DENSE,
    _bm25_topk,
    _postings_root,
)


def test_index_layout_term_bucketed(spark, sf_dir):
    root = _postings_root(spark, sf_dir)
    for sub in ("postings", "stats"):
        assert os.path.isdir(os.path.join(root, sub)), sub
    buckets = [
        d
        for d in os.listdir(os.path.join(root, "postings"))
        if d.startswith("bucket=")
    ]
    # terms hash-spread over the bucket space (empty buckets write no
    # directory, so a tiny test vocabulary fills only a subset)
    assert 1 < len(buckets) <= BM25_BUCKETS, buckets
    # the build is cached: a second call returns the same root
    assert _postings_root(spark, sf_dir) == root
    # stats is the 1-row corpus summary
    stats = spark.read.parquet(os.path.join(root, "stats")).collect()
    assert len(stats) == 1 and stats[0]["n_docs"] > 0
    # impact-ordered: the stored contribution is strictly positive
    post = spark.read.parquet(os.path.join(root, "postings"))
    assert post.filter("part_milli <= 0").count() == 0


def test_probe_join_partitions_pinned(spark, sf_dir):
    df = _bm25_topk(spark, sf_dir, BM25_QMOD_DENSE)
    rows = df.limit(1).count()  # execute so AQE finalizes the plan
    assert rows >= 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The postings side is a user-pinned doc-keyed repartition.
    # AQE's coalesce rule only applies to ENSURE_REQUIREMENTS /
    # REPARTITION (no-num) shuffle origins; REPARTITION_BY_NUM is
    # exempt by definition, so the presence of this exchange IS the
    # >1-task guarantee for the probe-join stage — the reverted r14
    # scenario (AQE coalescing the tiny-stats probe shuffle to one
    # task, 12-33 s) cannot recur while this holds.
    assert "REPARTITION_BY_NUM" in plan, plan[:4000]
    # The doc-keyed pin must keep satisfying the score aggregate's
    # clustered distribution: partial and final HashAggregate run
    # back-to-back in the SAME stage, with no exchange consuming the
    # exploded match stream (the 6x win over the r8-r14 in-query
    # plan).  An exchange between them means the fan-out key drifted
    # off the aggregate keys.
    lines = plan.splitlines()
    fin = next(
        i for i, ln in enumerate(lines)
        if "HashAggregate" in ln and "functions=[sum(part_milli" in ln
    )
    par = next(
        i for i, ln in enumerate(lines)
        if "partial_sum(part_milli" in ln
    )
    between = lines[min(fin, par) + 1 : max(fin, par)]
    assert not any("Exchange" in ln for ln in between), between
