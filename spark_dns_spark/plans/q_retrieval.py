"""BM25 retrieval over the corpus — the ranking function behind every
sharded text-search / RAG-retrieval stack, served from the same
inverted-index machinery as ``index_inverted_postings``.

``index_bm25_topk``: every QMOD-th document acts as a query; its
distinct index terms probe the corpus postings and each candidate
document is scored with BM25 (k1 = 1.2, b = 0.75), top-K per query.
``index_bm25_dense`` is the SAME plan at 10x query density
(VERDICT r8 item 6: real retrieval evaluates thousands of queries —
the dense tier measures how probe cost scales with |Q| and is the
bench's crossover evidence).

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

100 TB story (r15: the index is now PERSISTED, not rebuilt per
query): one tokenize + (doc, term) aggregation at build time computes
tf/dl/df/corpus-stats AND folds them into the final per-(doc, term)
integer score contribution, which lands as term-bucketed parquet
under a content-keyed cache dir (:func:`_postings_root`) — the
IMPACT-ORDERED index design (Lucene impacts).  Serving reads one
skinny (doc_id, term, part_milli) table and does join -> sum ->
top-K; the raw text is tokenized exactly once per corpus version and
dl/dfreq/stats never re-join at serve time.  The query-term relation
carries NO pinned broadcast hint (it grows with the query load —
ADVICE r8): AQE broadcasts it while it fits and switches to a
term-keyed shuffle join (with skew splitting) past that.  The
postings side fans out through a pinned REPARTITION_BY_NUM
DOC-KEYED repartition — compacted index files give AQE near-zero
shuffle-write stats for a join whose OUTPUT explodes, and its
coalesce rule collapsed the probe to one task (BASELINE.md r14
negative result); REPARTITION_BY_NUM shuffles are exempt from
coalescing, so the explosion keeps full parallelism.  Doc-keyed is
the load-bearing choice: HashPartitioning(doc) satisfies the score
aggregate's ClusteredDistribution(query, doc), so the exploded
match stream is consumed by an IN-STAGE hash aggregate and only the
final per-(query, doc) sums reach an exchange — measured 6x faster
than the r8-r14 in-query plan at sf0.1 (1.3 s vs 7-8.7 s dense
tier; see the decision table at the probe site).  Top-K is a
WindowGroupLimit (map-side partial top-K before the exchange).  At
100 TB, queries that know their terms prune to their terms' bucket
directories.

Reference parity note: the reference engine (a DNS connector,
SURVEY.md §2) has no retrieval surface — this is part of the
LLM-data-pipeline brief (text analysis / indexing first-class).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import cached_index_path
from spark_dns_spark.session import load_table

BM25_QMOD = 50  #: query set = doc_id % BM25_QMOD == 0 (same budget as ANN's QMOD)
BM25_QMOD_DENSE = 5  #: the 10x-density tier (|Q| = corpus/5)
BM25_TOPK = 5  #: results kept per query
K1_MILLI = 1200  #: BM25 k1 = 1.2 in milli-units
B_MILLI = 750  #: BM25 b = 0.75 in milli-units

#: Term-bucket count for the persisted postings layout.  At catalog
#: scale this matches local[32]; at 100 TB the bucket count scales
#: with the cluster (buckets are directory partitions, so a serving
#: query that knows its terms reads ONLY its terms' buckets).
BM25_BUCKETS = 32

#: process cache for the postings index root (feeds.cached_index_path)
_POSTINGS_CACHE: dict = {}


def _bm25_sql(qmod: int) -> str:
    return f"""
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
  WHERE doc_id % {qmod} = 0
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


def _postings_root(spark: SparkSession, sf_dir: str) -> str:
    """Build-or-open the PERSISTED term-bucketed BM25 postings index
    (VERDICT r14 item 3 — the revisit condition of BASELINE.md's r14
    negative result, now with both halves of the prescribed fix).

    Layout under the content-keyed cache dir:

    - ``postings/bucket=<0..31>/`` — IMPACT-ORDERED postings
      (doc_id, term, part_milli): the full integer BM25 contribution
      of each (doc, term) pair, precomputed at build time from
      tf/dl/df/corpus-stats (the Lucene-impacts design), directory-
      partitioned by ``pmod(xxhash64(term), 32)``.  At 100 TB this is
      the real index file layout: a serving query that knows its
      probe terms computes their buckets driver-side and the scan
      prunes to exactly those directories; bucket count scales with
      the cluster.
    - ``stats/`` — the 1-row (n_docs, avgdl_milli) corpus stats,
      kept as index metadata.

    Everything derives from ONE tokenize+aggregate pass over the
    corpus at build time; every serve afterwards reads the skinny
    integer postings and never touches the raw text — or re-joins
    dl/dfreq — again (the r8-r14 in-query form re-tokenized and
    re-joined on every query).
    """

    def build(root: str) -> None:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        # explode-then-WHERE, not filter-the-array-then-explode: the
        # higher-order array filter is INTERPRETED (no codegen for
        # lambda expressions) while a post-explode rlike predicate
        # runs inside WholeStageCodegen — measured 1.7x faster on the
        # tokenize+tf stage at sf0.1 with an identical (count, hash)
        # result.  Same tokenizer contract as index_inverted_postings:
        # whitespace tokens, lowercase alpha, length >= 3.
        toks = docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        ).filter(F.col("term").rlike("^[a-z]{3,}$"))
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
        # IMPACT-ORDERED postings (the Lucene-impacts design): the
        # whole per-(doc, term) BM25 contribution depends only on
        # corpus-static quantities (tf, dl, df, corpus stats), so it
        # is computed ONCE here and stored in the postings — serving
        # never joins dl/dfreq/stats again.
        (
            tf.join(dl, "doc_id")
            .join(dfreq, "term")
            .crossJoin(F.broadcast(stats))
            .withColumn("part_milli", F.expr(_PART_MILLI_SQL))
            .withColumn(
                "bucket",
                F.pmod(F.xxhash64("term"), F.lit(BM25_BUCKETS)).cast("int"),
            )
            .select("doc_id", "term", "part_milli", "bucket")
            .repartition(BM25_BUCKETS, "bucket")
            .write.partitionBy("bucket")
            .parquet(os.path.join(root, "postings"))
        )
        stats.coalesce(1).write.parquet(os.path.join(root, "stats"))
        tf.unpersist()

    return cached_index_path(
        _POSTINGS_CACHE, sf_dir, "documents.parquet", build,
        name="bm25_postings",
    )


#: The integer-exact per-(doc, term) BM25 contribution — evaluated at
#: INDEX BUILD time over (tf, dl, df, n_docs, avgdl_milli).  SQL text
#: (not a Column) so module import never needs a live SparkContext.
_PART_MILLI_SQL = (
    f"length(bin(n_docs div df)) * "
    f"((tf * 2200 * 1000) div "
    f" (tf * 1000 + "
    f"  ({K1_MILLI} * (1000 - {B_MILLI} + "
    f"    ({B_MILLI} * ((dl * 1000000) div avgdl_milli))"
    f"      div 1000)) div 1000))"
)


def _bm25_topk(spark: SparkSession, sf_dir: str, qmod: int) -> DataFrame:
    root = _postings_root(spark, sf_dir)
    # Explicit schema: an EMPTY corpus builds an index whose
    # partitionBy("bucket") write emits zero part-files, and a bare
    # read.parquet of that directory fails schema inference
    # (UNABLE_TO_INFER_SCHEMA).  The postings layout is fixed at build
    # time, so spelling it out costs nothing and makes the zero-row
    # path a plain empty relation.
    scored = (
        spark.read.schema("doc_id BIGINT, term STRING, part_milli BIGINT")
        .parquet(os.path.join(root, "postings"))
        .select("doc_id", "term", "part_milli")
    )

    qterms = (
        scored.filter(F.col("doc_id") % qmod == 0)
        .select(F.col("doc_id").alias("query_id"), "term")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25_milli"), "doc_id"
    )
    # PINNED DOC-KEYED fan-out on the postings side — the "probe-side
    # size hint" half of the r14 revisit condition, and the load-
    # bearing perf decision of the whole query.  Three candidates
    # were measured head-to-head at sf0.1 (dense tier, warm index,
    # min-of-3 interleaved):
    #
    # - term-keyed pin:   ~15 s  (posting-list skew serializes common
    #                             terms' exploded output on stragglers
    #                             and a pinned partitioning opts out
    #                             of AQE's skew splitting)
    # - round-robin pin:  ~8.2 s (explosion parallel, but a (q, d)
    #                             group's term contributions scatter
    #                             over every task, so the partial agg
    #                             barely dedups and ~tens of millions
    #                             of partial rows hit the exchange)
    # - doc_id-keyed pin: ~1.3 s (every match row for doc d lands in
    #                             d's task, so HashPartitioning(doc)
    #                             SATISFIES the aggregate's
    #                             ClusteredDistribution(query, doc) —
    #                             the 86M-row explosion is consumed
    #                             by an in-stage hash agg and only
    #                             the 5M final (q, d) sums ever reach
    #                             an exchange.  Skew-free: documents
    #                             have comparable lengths, unlike
    #                             posting lists.)
    #
    # A user-specified repartition(N, col) additionally has shuffle
    # origin REPARTITION_BY_NUM, which AQE's coalesce rule is defined
    # to skip — so the compacted index's near-zero scan stats can
    # never re-trigger the one-task collapse that got the r14
    # disk-cache attempt reverted at 12-33 s.  The query side keeps
    # NO pinned hint (ADVICE r8: it grows with the query load): AQE
    # broadcasts it while it fits — the probe stays map-side on the
    # pinned fan-out — and switches to a shuffle join (with skew
    # splitting) past that.  tests/test_bm25_postings.py pins the
    # >1-task guarantee and the no-exchange-before-agg shape.
    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return (
        scored.repartition(npart, "doc_id")
        .join(qterms, "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("part_milli").alias("bm25_milli"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("query_id", "doc_id", "bm25_milli", "rank")
    )


@register(
    "index_bm25_topk",
    _bm25_sql(BM25_QMOD),
    doc=f"BM25 retrieval (k1=1.2, b=0.75, integer-exact): every "
    f"{BM25_QMOD}-th doc queries the corpus with its index terms; "
    f"idf = bit-length of N div df (exact log2 — no ln()), tf "
    "saturation and length normalization in milli-integer floor "
    "division, so both engines rank identically; top-"
    f"{BM25_TOPK} per query.  Serves from the PERSISTED impact-ordered "
    "term-bucketed postings index (r15): scores precomputed at build, "
    "probe parallelism pinned via REPARTITION_BY_NUM, query side "
    "AQE-chosen (no pinned broadcast), top-K via WindowGroupLimit",
    tags=("index", "text", "retrieval"),
)
def index_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bm25_topk(spark, sf_dir, BM25_QMOD)


@register(
    "index_bm25_dense",
    _bm25_sql(BM25_QMOD_DENSE),
    doc=f"BM25 at 10x query density (every {BM25_QMOD_DENSE}-th doc "
    "queries — the corpus-scale retrieval shape, VERDICT r8 item 6): "
    "identical integer-exact scoring plan as index_bm25_topk, served "
    "from the same persisted impact-ordered postings; the bench times "
    "both so the probe's |Q|-scaling (and the AQE broadcast->shuffle "
    "crossover) is measured, not asserted",
    tags=("index", "text", "retrieval", "bench"),
)
def index_bm25_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bm25_topk(spark, sf_dir, BM25_QMOD_DENSE)
