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
from spark_dns_spark.plans import q_similarity as qs
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import load_events
from spark_dns_spark.session import load_table

#: Minimum document frequency for an index row (prunes hapax noise).
MIN_DF = 5
#: Posting-list sample size per term.
POSTINGS_CAP = 16


_INDEX_SQL = f"""
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
"""


@register(
    "index_inverted_postings",
    _INDEX_SQL,
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
    return _format_index(_term_stats(docs).filter(F.col("df_count") >= MIN_DF))


def _term_stats(docs: DataFrame) -> DataFrame:
    """UNPRUNED per-term index stats (term, df_count, plist, first_doc)
    over a (doc_id, text) relation — the mergeable representation: df
    sums across disjoint doc sets, the capped plist is an order
    statistic (each side's first-{CAP} contains every candidate for
    the union's first-{CAP}), first_doc is a min."""
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
    return (
        terms.withColumn("rn", rn)
        .groupBy("term")
        .agg(
            F.count("*").alias("df_count"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("rn") <= POSTINGS_CAP, F.col("doc_id"))
                )
            ).alias("plist"),
            F.min("doc_id").alias("first_doc"),
        )
    )


def _format_index(stats: DataFrame) -> DataFrame:
    return stats.select(
        "term",
        "df_count",
        F.concat_ws(
            ",", F.transform("plist", lambda x: x.cast("string"))
        ).alias(f"postings{POSTINGS_CAP}"),
        "first_doc",
    )


#: process-lifetime cache of the BASE-corpus inverted index (UNPRUNED
#: per-term stats over doc_id % UP_MOD != UP_REM — the df < MIN_DF
#: tail must be stored, or a term crossing the threshold only via the
#: delta would be lost in the merge).
_POSTINGS_BASE_INDEX: dict = {}


def postings_base_index_path(spark: SparkSession, sf_dir: str) -> str:
    """The persisted inverted index of the base corpus only: ``terms/``
    (term, df_count, plist, first_doc), unpruned."""

    def build(root: str) -> None:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        _term_stats(
            docs.filter((F.col("doc_id") % qs.UP_MOD) != qs.UP_REM)
        ).write.mode("overwrite").parquet(f"{root}/terms")

    from spark_dns_spark.plans.feeds import cached_index_path  # noqa: PLC0415

    return cached_index_path(
        _POSTINGS_BASE_INDEX, sf_dir, "documents.parquet", build,
        name="postings_base",
    )


@register(
    "index_postings_upsert",
    _INDEX_SQL,
    doc=f"INCREMENTAL inverted-index maintenance — the retrieval-side "
    "twin of the dedup/ANN upserts (the Lucene-segment-merge shape): "
    "the base corpus's UNPRUNED term stats are a persisted parquet "
    f"index; the new doc batch (doc_id%{qs.UP_MOD}=={qs.UP_REM}) "
    "tokenizes and aggregates ALONE (batch cost proportional to "
    "|delta|), then ONE vocabulary-sized full-outer merge by term: df "
    "sums across the disjoint doc sets, the capped posting sample is "
    "an order-statistic merge (sort the two first-"
    f"{POSTINGS_CAP} lists, keep the first {POSTINGS_CAP}), first_doc "
    "is a min, and the df >= "
    f"{MIN_DF} prune applies AFTER the merge so delta-crossing terms "
    "surface.  The merged index equals a from-scratch build over the "
    "full corpus — which is exactly the oracle (the full-build SQL); "
    "at 100 TB the per-batch cost is |delta| tokenization + a "
    "vocab-keyed merge, never a corpus rescan",
    tags=("index", "text", "incremental"),
)
def index_postings_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = postings_base_index_path(spark, sf_dir)
    base = spark.read.parquet(f"{root}/terms").select(
        "term",
        F.col("df_count").alias("bdf"),
        F.col("plist").alias("bpl"),
        F.col("first_doc").alias("bfd"),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    delta = _term_stats(
        docs.filter((F.col("doc_id") % qs.UP_MOD) == qs.UP_REM)
    ).select(
        "term",
        F.col("df_count").alias("ddf"),
        F.col("plist").alias("dpl"),
        F.col("first_doc").alias("dfd"),
    )
    empty = F.expr("CAST(array() AS array<bigint>)")
    merged = (
        base.join(delta, "term", "full")
        .select(
            "term",
            (
                F.coalesce("bdf", F.lit(0)) + F.coalesce("ddf", F.lit(0))
            ).alias("df_count"),
            F.slice(
                F.sort_array(
                    F.concat(
                        F.coalesce(F.col("bpl"), empty),
                        F.coalesce(F.col("dpl"), empty),
                    )
                ),
                1,
                POSTINGS_CAP,
            ).alias("plist"),
            # least() skips nulls: a term present on one side only
            # keeps that side's first_doc
            F.least("bfd", "dfd").alias("first_doc"),
        )
        .filter(F.col("df_count") >= MIN_DF)
    )
    return _format_index(merged)


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
