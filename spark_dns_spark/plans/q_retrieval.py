"""BM25 retrieval over the corpus — the ranking function behind every
sharded text-search / RAG-retrieval stack, served from the same
inverted-index machinery as ``index_inverted_postings``.

``index_bm25_topk``: every QMOD-th document acts as a query; its
distinct index terms probe the corpus postings and each candidate
document is scored with BM25 (k1 = 1.2, b = 0.75), top-K per query.

Cross-engine exactness (the oracle problem for BM25 is ``ln()`` in the
idf and float tf-saturation): the whole score is computed in positive
integer arithmetic —

- ``idf_bits = length(bin(N div df))`` = floor(log2(N/df)) + 1, the
  integer-exact log2 idf (``bin`` renders a positive BIGINT without
  leading zeros in both engines, so its length IS the bit length);
- k1/b enter as milli-rationals (1200/750), every division is a
  positive-integer floor division (Spark ``div`` ≡ DuckDB ``//``), so
  ``bm25_milli`` is EXACTLY equal in both engines and the oracle is
  hash equality, never tolerance (the standing catalog convention).

100 TB story: the corpus side never shuffles for retrieval — ``tf``,
``dl`` and ``df`` all derive from ONE (doc, term)-keyed aggregation
(the inverted-index build); the corpus-stats row and the per-term df
table are broadcast; the query-term relation (Q query docs' distinct
terms) is broadcast into the postings join so candidate generation is
a map-side hash probe of the term-partitioned index; the per-(query,
doc) score sum partial-aggregates map-side; top-K is a WindowGroupLimit
(map-side partial top-K before the exchange).  At scale the postings
table is the PERSISTED index (partitioned BY term-bucket) and queries
read only their terms' buckets.

Reference parity note: the reference engine (a DNS connector,
SURVEY.md §2) has no retrieval surface — this is part of the
LLM-data-pipeline brief (text analysis / indexing first-class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.session import load_table

BM25_QMOD = 50  #: query set = doc_id % BM25_QMOD == 0 (same budget as ANN's QMOD)
BM25_TOPK = 5  #: results kept per query
K1_MILLI = 1200  #: BM25 k1 = 1.2 in milli-units
B_MILLI = 750  #: BM25 b = 0.75 in milli-units

_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, t AS term
  FROM documents, LATERAL unnest(string_split(text, ' ')) s(t)
  WHERE regexp_full_match(t, '[a-z]{{3,}}')
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM toks GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id
), stats AS (
  SELECT count(*)::BIGINT AS n_docs,
         (sum(dl) * 1000) // count(*) AS avgdl_milli
  FROM dl
), dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term,
         length(bin(stats.n_docs // dfreq.df))
           * ((tf.tf * 2200 * 1000) //
              (tf.tf * 1000 +
               ({K1_MILLI} * (1000 - {B_MILLI} +
                 ({B_MILLI} * ((dl.dl * 1000000) // stats.avgdl_milli))
                   // 1000)) // 1000)) AS part_milli
  FROM tf
  JOIN dl USING (doc_id)
  JOIN dfreq USING (term), stats
), qterms AS (
  SELECT doc_id AS query_id, term FROM tf
  WHERE doc_id % {BM25_QMOD} = 0
)
SELECT query_id, doc_id, bm25_milli, rank FROM (
  SELECT q.query_id, s.doc_id,
         sum(s.part_milli)::BIGINT AS bm25_milli,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY sum(s.part_milli) DESC, s.doc_id) AS rank
  FROM qterms q JOIN scored s USING (term)
  WHERE s.doc_id <> q.query_id
  GROUP BY q.query_id, s.doc_id
) WHERE rank <= {BM25_TOPK}
"""


def _qualifying_terms() -> F.Column:
    """The index tokenizer (same as index_inverted_postings): whitespace
    tokens, lowercase alpha, length >= 3."""
    return F.filter(
        F.split("text", " "), lambda t: t.rlike("^[a-z]{3,}$")
    )


@register(
    "index_bm25_topk",
    _BM25_SQL,
    doc=f"BM25 retrieval (k1=1.2, b=0.75, integer-exact): every "
    f"{BM25_QMOD}-th doc queries the corpus with its index terms; "
    f"idf = bit-length of N div df (exact log2 — no ln()), tf "
    "saturation and length normalization in milli-integer floor "
    "division, so both engines rank identically; top-"
    f"{BM25_TOPK} per query.  Corpus never shuffles for the probe: "
    "df/stats/query-terms broadcast against the one (doc,term) "
    "aggregation, top-K via WindowGroupLimit",
    tags=("index", "text", "retrieval"),
)
def index_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(_qualifying_terms()).alias("term")
    )
    # ONE (doc, term)-keyed aggregation feeds tf, dl and df — the
    # inverted-index build; persist so the three derivations (and the
    # candidate join below) scan it, not the raw text, once each.
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("(sum(dl) * 1000) div count(*)").alias("avgdl_milli"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    # Per-(doc, term) BM25 contribution — all positive-integer floor
    # divisions; dl re-joins on doc_id (map-side: dl is doc-keyed like
    # tf's first grouping), df + the 1-row stats broadcast.
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "part_milli",
            F.expr(
                f"length(bin(n_docs div df)) * "
                f"((tf * 2200 * 1000) div "
                f" (tf * 1000 + "
                f"  ({K1_MILLI} * (1000 - {B_MILLI} + "
                f"    ({B_MILLI} * ((dl * 1000000) div avgdl_milli))"
                f"      div 1000)) div 1000))"
            ),
        )
        .select("doc_id", "term", "part_milli")
    )
    qterms = (
        tf.filter(F.col("doc_id") % BM25_QMOD == 0)
        .select(F.col("doc_id").alias("query_id"), "term")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25_milli"), "doc_id"
    )
    return (
        # query terms are a tiny relation — broadcast them so the
        # corpus postings are probed in place, never reshuffled.
        scored.join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("part_milli").alias("bm25_milli"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("query_id", "doc_id", "bm25_milli", "rank")
    )
