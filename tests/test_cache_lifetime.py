"""Cache-lifetime discipline (VERDICT r3 item 8): after a consuming
harness releases, NO persistent RDDs may survive — neither SQL-cache
persists (fan-out caches in dedup/similarity) nor localCheckpoint
blocks (iterative cluster queries)."""

from __future__ import annotations

import pytest

from spark_dns_spark.session import release_all_caches


def _persistent_count(spark) -> int:
    return int(spark.sparkContext._jsc.getPersistentRDDs().size())


@pytest.mark.parametrize(
    "name",
    [
        "dedup_minhash_lsh",  # signature persist at fan-out
        "similarity_topk_lsh",  # vector + band-key persists
        "dedup_cluster_pointer_doubling",  # localCheckpoint per round
    ],
)
def test_no_cache_residue_after_release(spark, sf_dir, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, sf_dir)
    df.count()  # consume
    assert _persistent_count(spark) > 0, "expected live caches mid-query"
    leftover = release_all_caches(spark)
    assert leftover == 0
    assert _persistent_count(spark) == 0
