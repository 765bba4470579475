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

#: Shared recursive-CTE oracle: full reachability, then min-per-source
#: — an independent formulation both Spark variants must match.
CLUSTER_SQL = f"""
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
"""


def _edges_and_labels(spark: SparkSession, sf_dir: str):
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
    return edges, labels


def _with_sizes(labels: DataFrame) -> DataFrame:
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )


def propagate_labels(
    edges: DataFrame,
    labels: DataFrame,
    doubling: bool,
    max_iters: int = MAX_ITERS,
    name: str = "connected components",
) -> DataFrame:
    """Min-label fixpoint over ``edges`` (src,dst) starting from
    ``labels`` (doc_id,label) — the shared core of both cluster queries.

    ``doubling=False``: one neighbor-min hop per round; rounds needed =
    component min-label eccentricity (fine for dense dup cliques).
    ``doubling=True``: after the hop, every label is rewritten to its
    label's label (pointer doubling / path halving), so the distance to
    the component minimum roughly halves per round — O(log diameter)
    rounds, the formulation that survives a 100x chainier graph.

    Raises RuntimeError instead of returning silently-wrong labels when
    the fixpoint is not reached within ``max_iters``.
    """
    changed = 0
    for _ in range(max_iters):
        # hop: every node adopts the min label among itself + neighbors
        neigh = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("neigh_label"))
        )
        hop = labels.join(neigh, labels.doc_id == neigh.src, "left").select(
            "doc_id",
            F.least(
                F.col("label"),
                F.coalesce(F.col("neigh_label"), F.col("label")),
            ).alias("label"),
        )
        if doubling:
            # persist: hop feeds BOTH sides of the pointer join — the
            # cache stops the join+groupBy lineage running twice.
            hop = hop.persist()
            # doubling: label <- hop(label).  Every label value IS a
            # node id (labels start as ids and only take mins of ids),
            # so the lookup hits; labels are monotone non-increasing,
            # hence hop(label) <= label and the chase shortcuts toward
            # the component min.
            ptr = hop.select(
                F.col("doc_id").alias("p_id"), F.col("label").alias("p_label")
            )
            new_labels = hop.join(ptr, hop.label == ptr.p_id, "left").select(
                "doc_id",
                F.coalesce(F.col("p_label"), F.col("label")).alias("label"),
            )
        else:
            new_labels = hop
        # localCheckpoint (eager), not persist: persist only truncates
        # recomputation — the LOGICAL plan still nests round over round,
        # and the doubling self-join references hop twice, doubling the
        # plan tree per round (exponential planning memory by round
        # ~12).  Truncating lineage is the standard shape for iterative
        # graph algorithms (same reason GraphX/GraphFrames checkpoint).
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        if doubling:
            hop.unpersist()
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # A silent stop here would return labels that diverge from the
        # recursive-CTE oracle with no error.
        raise RuntimeError(
            f"{name} did not converge in {max_iters} iterations "
            f"({changed} labels still moving); "
            + (
                "with path halving this needs a component min-label "
                f"eccentricity over ~2^{max_iters} — almost certainly a "
                "bug, not a graph"
                if doubling
                else "raise max_iters for graphs with longer chains"
            )
        )
    return labels


@register(
    "dedup_cluster_assign",
    CLUSTER_SQL,
    doc="connected components over the LSH near-dup graph (iterative "
    "min-label propagation to a fixpoint; one join+groupBy per round, "
    "no data on the driver) — cluster_id = min doc_id in component; "
    "oracle is an independent recursive-CTE reachability formulation",
    tags=("dedup", "cluster", "iterative"),
)
def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, labels = _edges_and_labels(spark, sf_dir)
    return _with_sizes(
        propagate_labels(edges, labels, doubling=False, name="dedup_cluster_assign")
    )


@register(
    "dedup_cluster_pointer_doubling",
    CLUSTER_SQL,
    doc="connected components via pointer doubling (path halving): each "
    "round does one neighbor-min hop AND then rewrites every label to "
    "its label's label, so the distance to the component minimum "
    "roughly HALVES per round — O(log diameter) rounds vs plain "
    "propagation's O(diameter), the 100x-graph formulation (VERDICT r3 "
    "item 6); result-identical to dedup_cluster_assign and checked "
    "against the same recursive-CTE oracle",
    tags=("dedup", "cluster", "iterative"),
)
def dedup_cluster_pointer_doubling(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, labels = _edges_and_labels(spark, sf_dir)
    return _with_sizes(
        propagate_labels(
            edges, labels, doubling=True, name="dedup_cluster_pointer_doubling"
        )
    )
