"""End-to-end corpus-curation pipeline — the composed query a
training-data engineer actually runs: quality-filter → exact-dedup →
per-language corpus stats, in ONE declarative plan so Catalyst can
pipeline the filters into the scan and dedup only what survives.

Plan shape at 100 TB: the quality filter is map-only and runs inside
the scan stage (nothing low-quality is ever shuffled); the dedup
shuffle carries (digest, doc_id, n_words, lang) — never the text; the
final rollup is a tiny second shuffle on lang.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.q_text import STOPWORDS, _marker_hits, _marker_hits_sql, _toks
from spark_dns_spark.session import load_table, spread

MIN_QUALITY = 0.70
#: integer threshold on floor(quality*1e4 + 0.5) — pure-IEEE rounding
#: BEFORE the cut so a last-ulp blend difference between engines can't
#: flip a doc across the boundary (catalog conventions / VERDICT r2).
MIN_QUALITY_E4 = 7000
MIN_WORDS = 20


@register(
    "pipeline_curate_corpus",
    f"""
WITH feat AS (
  SELECT doc_id, lang, md5(text) AS digest,
         len(string_split(text, ' ')) AS n_words,
         floor((0.35 * least(len(string_split(text, ' ')) / 80, 1)
         + 0.35 * (1 - CASE WHEN len(string_split(text, ' ')) > 0
                            THEN {_marker_hits_sql("string_split(text, ' ')", STOPWORDS)}
                                 / len(string_split(text, ' '))
                            ELSE 0 END)
         + 0.30 * CASE WHEN length(text) > 0
                       THEN length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
                            / length(text)
                       ELSE 0 END) * 10000 + 0.5) AS quality_e4
  FROM documents
), kept AS (
  SELECT * FROM feat
  WHERE quality_e4 >= {MIN_QUALITY_E4} AND n_words >= {MIN_WORDS}
), canon AS (
  SELECT digest AS canon_digest, min(doc_id) AS keep_id
  FROM kept GROUP BY digest
)
SELECT lang, count(*) AS n_docs, sum(n_words)::BIGINT AS total_words
FROM kept JOIN canon ON kept.digest = canon.canon_digest
                    AND kept.doc_id = canon.keep_id
GROUP BY lang
""",
    doc="composed curation pipeline: quality-filter (map-only, inside "
    "the scan) → exact dedup (digest-keyed shuffle, text never moves) → "
    "per-language corpus stats; the deliverable query of the "
    "training-data brief",
    tags=("pipeline", "text", "dedup", "bench"),
)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = _toks()
    n_chars = F.length("text")
    n_words = F.size(toks)
    stop_hits = _marker_hits(toks, STOPWORDS)
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    alnum_frac = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(F.col("text"), "[^a-z0-9 ]", "")) / n_chars,
    ).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.35) * F.least(n_words / F.lit(80), F.lit(1.0))
        + F.lit(0.35) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.30) * alnum_frac
    )
    kept = docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("digest"),
        n_words.alias("n_words"),
        F.floor(quality * 10000 + F.lit(0.5)).alias("quality_e4"),
    ).filter(
        (F.col("quality_e4") >= MIN_QUALITY_E4) & (F.col("n_words") >= MIN_WORDS)
    )
    # Alias the aggregated digest so the self-derived join can't resolve
    # to a trivially-true `digest == digest` predicate under refactor.
    canon = kept.groupBy("digest").agg(F.min("doc_id").alias("keep_id")).select(
        F.col("digest").alias("canon_digest"), "keep_id"
    )
    curated = kept.join(
        canon,
        (kept.digest == canon.canon_digest) & (kept.doc_id == canon.keep_id),
    )
    return curated.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("total_words"),
    )
