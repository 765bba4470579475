"""Market-basket co-occurrence over the order fact — the association
step (pair support + lift) that frequent-itemset mining runs before
rule generation.

``basket_copurchase_lift``: parts bought together in one order, pair
support counts, and integer milli-lift
``(1000 · n_orders · n_ab) div (n_a · n_b)``.  Pair generation happens
INSIDE the order-keyed aggregate (per-order part sets are bounded by
order width — ≤ 13 parts here, ≤ 7 lineitems in TPC-H — so the nested
comprehension is O(width²) per order, map-side bounded, never a
corpus-sized self-join).  Marginals re-join the pair relation on the
part keys; the scalar order count broadcasts as a 1-row relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.session import load_table

#: Minimum pair support to report.
MIN_SUPPORT = 3


@register(
    "basket_copurchase_lift",
    f"""
WITH baskets AS (
  SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS parts
  FROM lineitem GROUP BY l_orderkey
), pairs AS (
  SELECT u.p.a AS part_a, u.p.b AS part_b
  FROM (
    SELECT flatten(list_transform(range(1, len(parts) + 1),
      i -> list_transform(range(i + 1, len(parts) + 1),
           j -> {{'a': parts[i], 'b': parts[j]}}))) AS ps
    FROM baskets
  ), LATERAL unnest(ps) u(p)
), support AS (
  SELECT part_a, part_b, count(*) AS n_ab
  FROM pairs GROUP BY part_a, part_b HAVING count(*) >= {MIN_SUPPORT}
), marg AS (
  SELECT l_partkey, count(DISTINCT l_orderkey) AS n_p
  FROM lineitem GROUP BY l_partkey
), tot AS (SELECT count(DISTINCT l_orderkey) AS n FROM lineitem)
SELECT s.part_a, s.part_b, s.n_ab::BIGINT AS n_ab,
       CAST((1000 * t.n * s.n_ab) // (ma.n_p * mb.n_p) AS BIGINT)
         AS lift_milli
FROM support s
JOIN marg ma ON s.part_a = ma.l_partkey
JOIN marg mb ON s.part_b = mb.l_partkey
CROSS JOIN tot t
""",
    doc="market-basket pair mining: per-order part sets (bounded by "
    "order width) expand to pairs inside the order-keyed aggregate — "
    "never a corpus-sized self-join; support filter, then marginal "
    "joins on the part keys and a broadcast 1-row order total for the "
    "integer milli-lift",
    tags=("basket", "agg", "mlprep"),
)
def basket_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pairs_expr = """
    flatten(transform(sequence(1, size(parts)),
      i -> CASE WHEN i >= size(parts) THEN
             array()
           ELSE
             transform(sequence(i + 1, size(parts)),
               j -> struct(element_at(parts, i) AS a,
                           element_at(parts, j) AS b))
           END))
    """
    support = (
        baskets.select(F.explode(F.expr(pairs_expr)).alias("p"))
        .select(F.col("p.a").alias("part_a"), F.col("p.b").alias("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= MIN_SUPPORT)
    )
    marg = li.groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").alias("n_p")
    )
    tot = li.agg(F.countDistinct("l_orderkey").alias("n"))
    ma = marg.select(
        F.col("l_partkey").alias("part_a"), F.col("n_p").alias("n_a")
    )
    mb = marg.select(
        F.col("l_partkey").alias("part_b"), F.col("n_p").alias("n_b")
    )
    return (
        support.join(ma, "part_a")
        .join(mb, "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.expr("(1000 * n * n_ab) div (n_a * n_b)").alias("lift_milli"),
        )
    )
