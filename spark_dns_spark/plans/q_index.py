"""Corpus index-building operators:

- ``index_inverted_postings`` — the inverted-index build (term →
  document-frequency + bounded posting-list sample), the structure
  behind every sharded text-search / decontamination lookup.  The
  posting lists are capped BEFORE collection (row_number ≤ 16 inside
  the same term-keyed shuffle), so per-key aggregation state is bounded
  no matter how common a term is — the unbounded-collect_list trap is
  the thing this plan exists to avoid at 100 TB.
- ``heavy_hitters_events`` — exact frequent-items over a wide key
  space via the two-phase Misra-Gries pattern
  (:mod:`spark_dns_spark.operators.heavyhitters`): map-only candidate
  sketch (O(k) state per task), broadcast-verified exact counts.  The
  driver's testdata is deliberately uniform, so the skewed key stream
  is DERIVED deterministically from events (the same convention as the
  ``dns_changes`` feed): even event_ids collapse onto 16 hot keys
  (~3% of mass each), odd ones spread over ~100k cold keys — the
  hot/cold mixture real click/crawl streams exhibit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.operators import heavyhitters as hh
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import load_events
from spark_dns_spark.session import load_table

#: Minimum document frequency for an index row (prunes hapax noise).
MIN_DF = 5
#: Posting-list sample size per term.
POSTINGS_CAP = 16


@register(
    "index_inverted_postings",
    f"""
WITH terms AS (
  SELECT DISTINCT doc_id, t AS term
  FROM documents, LATERAL unnest(string_split(text, ' ')) s(t)
  WHERE regexp_full_match(t, '[a-z]{{3,}}')
)
SELECT term, count(*)::BIGINT AS df_count,
       array_to_string(list_sort(list(doc_id))[1:{POSTINGS_CAP}], ',')
         AS postings{POSTINGS_CAP},
       min(doc_id) AS first_doc
FROM terms GROUP BY term HAVING count(*) >= {MIN_DF}
""",
    doc="inverted-index build: whitespace tokens (the q_text tokenizer) "
    "deduped per (term, doc) MAP-SIDE (array_distinct before the "
    "explode — a doc's token set IS the distinct relation, so no "
    "distinct aggregate and no (doc,term) exchange exists at all), "
    "then document frequency + a sorted 16-doc posting sample; the "
    "sample is selected by row_number INSIDE the single term-keyed "
    "shuffle before any collect, so per-term state is bounded however "
    "common the term.  One exchange total, shuffling exactly the "
    "distinct (doc, term) pairs (r8: was two — the r7 shape shuffled "
    "raw pairs for a distinct, then reshuffled for the window)",
    tags=("index", "text", "agg"),
)
def index_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    terms = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split("text", " "),
                    lambda t: t.rlike("^[a-z]{3,}$"),
                )
            )
        ).alias("term"),
    )
    rn = F.row_number().over(
        Window.partitionBy("term").orderBy("doc_id")
    )
    ranked = terms.withColumn("rn", rn)
    return (
        ranked.groupBy("term")
        .agg(
            F.count("*").alias("df_count"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("rn") <= POSTINGS_CAP, F.col("doc_id"))
                )
            ).alias("plist"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("df_count") >= MIN_DF)
        .select(
            "term",
            "df_count",
            F.concat_ws(
                ",", F.transform("plist", lambda x: x.cast("string"))
            ).alias(f"postings{POSTINGS_CAP}"),
            "first_doc",
        )
    )


#: Heavy-hitter threshold divisor: report keys with freq > n/100.
HH_T = 100

_HH_KEY_SQL = """
CASE WHEN event_id % 2 = 0
     THEN 'hot_' || CAST(event_id % 16 AS VARCHAR)
     ELSE 'cold_' || CAST(event_id % 100000 AS VARCHAR) END
"""


def _hh_key() -> F.Column:
    return F.when(
        F.col("event_id") % 2 == 0,
        F.concat(F.lit("hot_"), (F.col("event_id") % 16).cast("string")),
    ).otherwise(
        F.concat(F.lit("cold_"), (F.col("event_id") % 100000).cast("string"))
    )


@register(
    "heavy_hitters_events",
    f"""
WITH stream AS (
  SELECT {_HH_KEY_SQL} AS hh_key FROM events
), tot AS (SELECT count(*) AS n FROM stream),
cnt AS (SELECT hh_key, count(*) AS freq FROM stream GROUP BY hh_key)
SELECT c.hh_key, c.freq::BIGINT AS freq,
       CAST(c.freq * 1000000 // t.n AS BIGINT) AS freq_ppm
FROM cnt c, tot t WHERE c.freq * {HH_T} > t.n
""",
    doc="exact heavy hitters (freq > n/100) over a ~100k-key hot/cold "
    "stream: per-partition batched Misra-Gries sketch in mapInPandas "
    "(vectorized value_counts per Arrow batch, O(k)=512 counters of "
    "state), candidate union broadcast back for an exact "
    "map-side-combinable verify count — no shuffle ever carries the "
    "full key space; result provably exact for any partitioning "
    "(operators/heavyhitters.py has the superset-guarantee argument, "
    "tests/test_heavyhitters.py the property test)",
    tags=("sketch", "agg", "mapInPandas"),
)
def heavy_hitters_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("event_id")
    return hh.exact_heavy_hitters(ev, _hh_key(), HH_T)
