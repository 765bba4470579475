"""Range-serve physical strategy crossover (r15, sf10 probe fallout).

The pair-shuffle plan and the in-stage filter plan must emit
IDENTICAL (id_a, id_b, d2) rows — they are the same logical query
under two physical strategies, dispatched on corpus size
(q_similarity.RANGE_SHUFFLE_MAX).  The in-stage plan must also keep
the candidate explosion out of every exchange: its only shuffles are
the linear probe/member joins and the output-sized distinct.
"""

from __future__ import annotations

from spark_dns_spark.plans import q_similarity as qsim


def test_both_strategies_identical(spark, sf_dir):
    shuf = sorted(
        map(tuple, qsim._range_pairs(spark, sf_dir, "shuffle").collect())
    )
    inst = sorted(
        map(tuple, qsim._range_pairs(spark, sf_dir, "instage").collect())
    )
    assert shuf == inst
    assert len(shuf) > 0  # the fixture scale must exercise real pairs


def test_default_dispatch_small_corpus(spark, sf_dir):
    # every test/bench scale is far below the crossover, so the
    # default must be the (faster there) pair-shuffle plan — its fold
    # runs over the qa/qb pair arrays, while the in-stage plan folds
    # qv/mv inside the cell join
    plan = (
        qsim._range_pairs(spark, sf_dir)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "zip_with(qa" in plan and "zip_with(qv" not in plan
