"""Graph ranking over the event-transition graph — PageRank, the
corpus-curation quality signal (CommonCrawl-style pipelines rank the
domain/page graph to pick what to crawl and keep; this catalog runs the
same algorithm over the navigation graph hidden in ``events.props``).

Shape: JSON key extract (JVM-side ``get_json_object``) → per-user
``lead()`` window (one shuffle on user_id) → weighted edge aggregation
→ THREE fixed Lloyd-style iterations of the rank recurrence.  Per
iteration the data that moves is (edges ⋈ ranks) + a groupBy(dst) —
edges are keyed by src and ranks by node, so at 100 TB both sides
pre-bucket on the same key and each iteration is one co-located join
plus one map-side-combinable aggregate; rank state never leaves the
cluster (the only driver scalar is the node COUNT).

Cross-engine exactness (the oracle problem for float PageRank is float
summation order): total mass is ``1e9`` integer units, damping 0.85 is
the rational 17/20, and every term is an integer floor division —
``contrib = (rank*17*w) div (20*out_w)``, ``base = 3e9 div (20*n)`` —
bit-identical in Spark (`div`), DuckDB (`//`) and Python (`//`).
Headroom: rank ≤ 1e9 so the widest product is ``17e9 * w`` — exact in
BIGINT while any single edge weight stays < 5e8; beyond that, widen the
product to decimal(38,0) in BOTH engines (the events_user_zscore
pattern).  Dangling nodes (in-edges only) leak their mass by design —
standard simplified PageRank; floor losses also shrink total mass, so
``sum(rank) <= 1e9`` is a tested invariant, not an equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import load_events

E9 = 1_000_000_000  #: total rank mass, integer units
ITERS = 3  #: fixed iteration count (keeps the oracle a finite CTE chain)

_EDGE_CTE = """
WITH ev AS (
  SELECT user_id, ts, event_id,
         CAST(props->>'$.k' AS BIGINT) AS k
  FROM events
), tr AS (
  SELECT k AS src,
         lead(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM ev
), edges AS (
  SELECT src, dst, count(*)::BIGINT AS w
  FROM tr WHERE dst IS NOT NULL AND dst <> src
  GROUP BY src, dst
), outw AS (
  SELECT src, sum(w)::BIGINT AS wt FROM edges GROUP BY src
), nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges
  )
), nn AS (
  SELECT count(*)::BIGINT AS n FROM nodes
)
"""


def _pr_step(prev: str, out: str) -> str:
    """One oracle iteration: rank(v) = base + Σ floor-div contributions."""
    return f""", {out} AS (
  SELECT nd.node,
         ((3::BIGINT * {E9}) // (20 * nn.n)
          + coalesce(c.s, 0))::BIGINT AS rank
  FROM nodes nd CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node,
           sum((p.rank * 17 * e.w) // (20 * o.wt))::BIGINT AS s
    FROM edges e
    JOIN {prev} p ON p.node = e.src
    JOIN outw o ON o.src = e.src
    GROUP BY e.dst
  ) c ON c.node = nd.node
)"""


_PAGERANK_SQL = (
    _EDGE_CTE
    + f""", pr0 AS (
  SELECT node, ({E9} // nn.n)::BIGINT AS rank FROM nodes CROSS JOIN nn
)"""
    + "".join(_pr_step(f"pr{i}", f"pr{i + 1}") for i in range(ITERS))
    + f"""
SELECT node, rank AS rank_e9 FROM pr{ITERS}
"""
)


@register(
    "graph_pagerank_transitions",
    _PAGERANK_SQL,
    doc=f"integer-exact PageRank ({ITERS} iterations, damping 17/20, "
    "1e9-unit mass) over the per-user event-transition graph: JSON "
    "extract -> lead() window -> weighted edges -> iterated "
    "co-located join + aggregate; every term an integer floor "
    "division so the oracle is hash EQUALITY on an iterative "
    "algorithm, no tolerance",
    tags=("graph", "iterative", "window"),
)
def graph_pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("k").alias("src"), F.lead("k").over(w_user).alias("dst")
    ).filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    edges = (
        tr.groupBy("src", "dst").agg(F.count("*").alias("w")).persist()
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("wt"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # the ONLY driver scalar (a count, like kmeans K)
    if n == 0:
        return spark.createDataFrame([], "node long, rank_e9 long")

    base = (3 * E9) // (20 * n)
    ranks = nodes.withColumn("rank", F.lit(E9 // n).cast("long"))
    src_side = edges.join(outw, "src")
    for _ in range(ITERS):
        contrib = (
            src_side.join(ranks, src_side.src == ranks.node)
            .select(
                "dst",
                F.expr("(rank * 17 * w) div (20 * wt)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
            # Truncate the lineage each iteration (guide §3.3): the
            # planner auto-broadcasts the tiny contrib/rank relations,
            # and each BroadcastExchange build is its own job that
            # re-executes the WHOLE rank chain so far — profiled at
            # ~3 s of overlapping lineage re-execution jobs over 3
            # iterations.  Checkpointing the n-row rank state makes
            # every iteration's broadcast read n materialized rows
            # instead of replaying its predecessors.  (Blocks are
            # released by the harness's release_all_caches, the
            # iterative-query convention.)
            .localCheckpoint()
        )
    return ranks.select("node", F.col("rank").alias("rank_e9"))
