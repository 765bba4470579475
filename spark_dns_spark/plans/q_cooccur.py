"""Embedding-training preprocessing and behavioral funnels:

- ``cooccurrence_glove_window`` — the GloVe/word2vec co-occurrence
  matrix build: for every directed token pair within distance ≤ 4
  inside a document, accumulate count and the 1/d distance weight
  (carried as ``1000 div d`` milli-units so the sum is integer-exact).
  Pair generation is a MAP-ONLY nested array comprehension inside
  whole-stage codegen — no self-join on position, no shuffle until the
  final (w1, w2)-keyed aggregate, whose key space is vocab², not
  corpus-sized.
- ``events_funnel_conversion`` — ordered 3-step funnel (signup →
  click → purchase within 1 h of the signup) per user: earliest
  qualifying timestamp per stage via conditional ``min`` aggregates
  over ONE user_id-keyed pass, then integer stage comparisons.  The
  standard product-analytics conversion measurement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.functions.dnsfn import epoch_micros
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import load_events
from spark_dns_spark.session import load_table

#: Co-occurrence window (max token distance).
CO_W = 4


@register(
    "cooccurrence_glove_window",
    f"""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '),
                     t -> regexp_full_match(t, '[a-z]+')) AS a
  FROM documents
), pairs AS (
  SELECT u.f.w1 AS w1, u.f.w2 AS w2, u.f.d AS d
  FROM (
    SELECT flatten(list_transform(range(1, len(a) + 1),
      i -> list_transform(range(i + 1, least(i + {CO_W}, len(a)) + 1),
           j -> {{'w1': a[i], 'w2': a[j], 'd': j - i}}))) AS ps
    FROM toks
  ), LATERAL unnest(ps) u(f)
)
SELECT w1, w2, count(*)::BIGINT AS n_pairs,
       sum(1000 // d)::BIGINT AS weight_milli
FROM pairs GROUP BY w1, w2
""",
    doc="GloVe co-occurrence build: directed token pairs within "
    "distance 4, count + integer 1/d milli-weight.  Pair generation is "
    "map-only (nested transform/flatten in codegen, no positional "
    "self-join); the single shuffle keys on (w1, w2) — vocab-squared, "
    "not corpus-sized — and is map-side combinable",
    tags=("text", "mlprep", "agg"),
)
def cooccurrence_glove_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    pairs_expr = f"""
    flatten(transform(sequence(1, size(a)),
      i -> CASE WHEN i >= size(a) THEN
             array()
           ELSE
             transform(sequence(i + 1, least(i + {CO_W}, size(a))),
               j -> struct(element_at(a, i) AS w1,
                           element_at(a, j) AS w2,
                           j - i AS d))
           END))
    """
    toks = docs.select(
        F.expr(
            "filter(split(text, ' '), t -> t rlike '^[a-z]+$')"
        ).alias("a")
    )
    pairs = toks.select(F.explode(F.expr(pairs_expr)).alias("p")).select(
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
        F.col("p.d").alias("d"),
    )
    return pairs.groupBy("w1", "w2").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.expr("1000 div d")).alias("weight_milli"),
    )


#: Funnel definition: ordered stages and the conversion deadline
#: (micros after the stage-1 event).
FUNNEL_WINDOW_US = 3_600_000_000


@register(
    "events_funnel_conversion",
    f"""
WITH stages AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t1,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS t_purchase
  FROM events GROUP BY user_id
), flags AS (
  SELECT user_id,
         (t1 IS NOT NULL) AS s1,
         (t1 IS NOT NULL AND t_click IS NOT NULL AND t_click > t1
          AND t_click <= t1 + {FUNNEL_WINDOW_US}) AS s2,
         (t1 IS NOT NULL AND t_purchase IS NOT NULL AND t_purchase > t1
          AND t_purchase <= t1 + {FUNNEL_WINDOW_US}) AS s3
  FROM stages
)
SELECT count(*) FILTER (WHERE s1)::BIGINT AS n_signup,
       count(*) FILTER (WHERE s1 AND s2)::BIGINT AS n_clicked_1h,
       count(*) FILTER (WHERE s1 AND s2 AND s3)::BIGINT AS n_converted_1h,
       count(*)::BIGINT AS n_users
FROM flags
""",
    doc="3-step behavioral funnel (signup -> click -> purchase within "
    "1h of signup): earliest qualifying timestamp per stage via "
    "conditional min aggregates in ONE user_id-keyed map-side-"
    "combinable pass, then integer epoch-micros comparisons — no "
    "window function, no self-join, two exchanges total (user agg + "
    "the 4-counter scalar rollup)",
    tags=("events", "funnel", "agg"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    us = epoch_micros("ts")
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", us)).alias("t1"),
        F.min(F.when(F.col("event_type") == "click", us)).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias(
            "t_purchase"
        ),
    )
    s1 = F.col("t1").isNotNull()
    s2 = (
        s1
        & F.col("t_click").isNotNull()
        & (F.col("t_click") > F.col("t1"))
        & (F.col("t_click") <= F.col("t1") + FUNNEL_WINDOW_US)
    )
    s3 = (
        s1
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") > F.col("t1"))
        & (F.col("t_purchase") <= F.col("t1") + FUNNEL_WINDOW_US)
    )
    flags = stages.select(
        s1.alias("s1"), s2.alias("s2"), s3.alias("s3")
    )
    return flags.agg(
        F.sum(F.when(F.col("s1"), 1).otherwise(0)).cast("long").alias(
            "n_signup"
        ),
        F.sum(F.when(F.col("s1") & F.col("s2"), 1).otherwise(0))
        .cast("long")
        .alias("n_clicked_1h"),
        F.sum(
            F.when(F.col("s1") & F.col("s2") & F.col("s3"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_converted_1h"),
        F.count(F.lit(1)).alias("n_users"),
    )
