"""Dedup cluster assignment — connected components over the near-dup
pair graph, the step that turns pairwise LSH matches into "keep one doc
per cluster" decisions.

Spark side: Pregel-style min-label propagation — each iteration is one
equi-join + groupBy (labels hop one edge), looping until a fixpoint.
The driver loop only runs a convergence count per round; all data stays
distributed.  Rounds needed = cluster diameter, which for near-dup
graphs is tiny (dup clusters are dense cliques, not chains).

Oracle: DuckDB recursive CTE computing full reachability, then
min-per-source — an independent formulation of the same components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.q_dedup import MINHASH_LSH_SQL, dedup_minhash_lsh

MAX_ITERS = 20  #: safety cap; fixpoint is reached at cluster diameter


@register(
    "dedup_cluster_assign",
    f"""
WITH RECURSIVE pairs AS (
{MINHASH_LSH_SQL}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(src, dst) AS (
  SELECT DISTINCT src, src AS dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), comp AS (
  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp
""",
    doc="connected components over the LSH near-dup graph (iterative "
    "min-label propagation to a fixpoint; one join+groupBy per round, "
    "no data on the driver) — cluster_id = min doc_id in component; "
    "oracle is an independent recursive-CTE reachability formulation",
    tags=("dedup", "cluster", "iterative"),
)
def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b").persist()
    edges = pairs.union(
        pairs.select(F.col("id_b"), F.col("id_a"))
    ).toDF("src", "dst").persist()

    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .persist()
    )
    labels.count()
    changed = 0
    for _ in range(MAX_ITERS):
        # hop: every node adopts the min label among itself + neighbors
        neigh = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("neigh_label"))
        )
        new_labels = (
            labels.join(neigh, labels.doc_id == neigh.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("neigh_label"), F.col("label")),
                ).alias("label"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # A silent stop here would return labels that diverge from the
        # recursive-CTE oracle with no error (possible when chained LSH
        # pairs give a component min-label eccentricity > MAX_ITERS).
        raise RuntimeError(
            f"dedup_cluster_assign did not converge in {MAX_ITERS} "
            f"iterations ({changed} labels still moving); raise MAX_ITERS "
            "for graphs with longer chains"
        )

    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )
