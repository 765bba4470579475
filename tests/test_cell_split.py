"""Invariants of the oversized-cell rebalance (similarity_ivf_cell_split).

The oracle proves cross-engine value equality; these pin the operator
SEMANTICS: the rebalance is a permutation of postings (nothing lost or
invented), kept cells respect the cap, spilled postings land on cells
the vector was NOT already posted to, and the spill is non-vacuous at
the tested scale (a cap nobody exceeds would test nothing).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_dns_spark.plans import q_similarity as qs


def test_cell_split_invariants(spark, sf_dir):
    import __spark_entry__ as e

    out = e.queries()["similarity_ivf_cell_split"](spark, sf_dir).persist()
    root = qs.ivf_index_path(spark, sf_dir)
    asg = spark.read.parquet(f"{root}/asg")

    n_post = asg.count()
    assert out.count() == n_post  # permutation: postings conserved
    # one posting per (vec_id, cell)
    assert out.select("vec_id", "cell").distinct().count() == n_post
    # every vector keeps exactly IVF_ASSIGN postings
    bad = (
        out.groupBy("vec_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") != qs.IVF_ASSIGN)
        .count()
    )
    assert bad == 0

    moved = out.filter("moved = 1")
    assert moved.count() > 0, "cap never exceeded — the spill path is untested"
    # spilled postings land outside the vector's original cells
    overlap = moved.join(
        asg.select("vec_id", "cell"), ["vec_id", "cell"]
    ).count()
    assert overlap == 0

    # kept postings respect the cap in every cell
    kc = spark.read.parquet(f"{root}/cents").count()
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    cap = (qs.CAP_NUM * qs.IVF_ASSIGN * n + qs.CAP_DEN * kc - 1) // (
        qs.CAP_DEN * kc
    )
    over_cap = (
        out.filter("moved = 0")
        .groupBy("cell")
        .agg(F.count("*").alias("sz"))
        .filter(F.col("sz") > cap)
        .count()
    )
    assert over_cap == 0
    out.unpersist()
