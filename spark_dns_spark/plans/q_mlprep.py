"""ML-data-prep operator queries beyond the curation tier: TF-IDF
keyword extraction, vocabulary building, incremental corpus dedup,
quantile-based quality gating, and per-entity outlier flagging — the
remaining staples of a training-data pipeline (builder brief: dedup /
text-analysis first-class operators), each with an exact DuckDB oracle.

Scale notes (the 100 TB lens):
- tf-idf: two keyed shuffles (doc-term, then term); the doc-frequency
  table is vocabulary-sized and broadcast; the 1-row corpus count is a
  scalar broadcast (whitelisted BNLJ, same class as domain_mix's).
- vocab: explode -> partial-agg count -> top-k; map-side combine does
  the heavy lifting, only (bigram, count) partials shuffle.
- incremental dedup: digest-keyed anti-join; text never moves, only
  md5 digests shuffle.  This is the daily-crawl-vs-corpus shape.
- quantile gate: one small per-source percentile agg broadcast back.
- z-score: one shuffle on user_id; integer-exact flag predicate (no
  float summation-order hazard; see the algebra at the query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.functions.chunking import chunk_expr
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.feeds import load_events
from spark_dns_spark.plans.q_text import (
    STOPWORDS,
    _marker_hits,
    _marker_hits_sql,
    _toks,
)
from spark_dns_spark.session import load_table

TOP_TERMS = 3  #: tf-idf terms kept per document
TOP_BIGRAMS = 50  #: vocabulary entries kept corpus-wide
QUANTILE = 0.8  #: per-source quality gate
Z_NUM, Z_DEN = 9, 1  #: z^2 threshold as an exact rational (z > 3)


@register(
    "tfidf_top_terms",
    f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), total AS (
  SELECT count(*)::BIGINT AS n_docs FROM documents
)
SELECT doc_id, term, score_e4, rank FROM (
  SELECT tf.doc_id, tf.term,
         tf.tf * ((total.n_docs * 10000) // dfreq.df) AS score_e4,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ((total.n_docs * 10000) // dfreq.df) DESC,
                    tf.term) AS rank
  FROM tf JOIN dfreq USING (term), total
) WHERE rank <= {TOP_TERMS}
""",
    doc="per-document top-3 keywords by integer-scaled tf-idf "
    "(tf * (N*1e4 div df) — integer arithmetic end-to-end, so both "
    "engines rank identically with no float/log last-ulp hazard)",
    tags=("text", "mlprep"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(_toks()).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency: tf is already one row per (doc, term)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # total is one row — pinned broadcast; dfreq is vocabulary-sized
    # and grows with the corpus, so NO pinned hint (the ADVICE-r8 rule
    # applied to q_lm/q_retrieval): AQE broadcasts it while it fits and
    # falls back to a term-keyed shuffle join past the envelope.  The
    # integer-scaled idf ((N*1e4) div df) avoids ln(): floats never
    # enter the score, so cross-engine ranking is exact.
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "score_e4", F.col("tf") * F.expr("(n_docs * 10000) div df")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_e4"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_TERMS)
        .select("doc_id", "term", "score_e4", "rank")
    )


@register(
    "vocab_top_bigrams",
    f"""
WITH t AS (
  SELECT string_split(text, ' ') AS t FROM documents
), b AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM t WHERE len(t) >= 2
)
SELECT bigram, count(*)::BIGINT AS n
FROM b GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT {TOP_BIGRAMS}
""",
    doc="corpus-wide top-50 token bigrams (vocabulary/BPE-merge prep); "
    "explode -> partial-agg -> top-k, map-side combine carries the load",
    tags=("text", "mlprep", "agg"),
)
def vocab_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(_toks().alias("t")).filter(F.size("t") >= 2)
    bi = t.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2), "
                "i -> concat(element_at(t, i + 1), ' ', element_at(t, i + 2)))"
            )
        ).alias("bigram")
    )
    return (
        bi.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(TOP_BIGRAMS)
    )


@register(
    "dedup_incremental_batch",
    """
WITH batch AS (
  SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 10 = 0
), corpus AS (
  SELECT DISTINCT md5(text) AS digest
  FROM documents WHERE doc_id % 10 <> 0
)
SELECT min(doc_id)::BIGINT AS keep_id, digest, count(*)::BIGINT AS batch_dupes
FROM batch
WHERE NOT EXISTS (SELECT 1 FROM corpus WHERE corpus.digest = batch.digest)
GROUP BY digest
""",
    doc="incremental dedup: admit only new-batch docs whose digest is "
    "absent from the existing corpus (daily-crawl-vs-corpus shape); "
    "digest-keyed anti-join + min-id dedup within the batch — text "
    "bytes never shuffle",
    tags=("dedup", "mlprep"),
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    digest = F.md5("text").alias("digest")
    batch = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", digest)
    corpus = (
        docs.filter(F.col("doc_id") % 10 != 0).select(digest).distinct()
    )
    fresh = batch.join(corpus, "digest", "left_anti")
    return fresh.groupBy("digest").agg(
        F.min("doc_id").cast("long").alias("keep_id"),
        F.count(F.lit(1)).alias("batch_dupes"),
    ).select("keep_id", "digest", "batch_dupes")


_QE4_SQL = f"""
  SELECT source,
         floor((0.35 * least(len(string_split(text, ' ')) / 80, 1)
               + 0.35 * (1 - CASE WHEN len(string_split(text, ' ')) > 0
                    THEN {_marker_hits_sql("string_split(text, ' ')", STOPWORDS)}
                         / len(string_split(text, ' ')) ELSE 0 END)
               + 0.30 * CASE WHEN length(text) > 0
                    THEN length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
                         / length(text) ELSE 0 END)
               * 10000 + 0.5)::BIGINT AS q_e4
  FROM documents
"""


def _quality_e4() -> F.Column:
    """Integer e4 quality blend — same expression as q_text's
    ``text_quality_score`` (floor-round BEFORE any comparison, per the
    cross-engine canonicalization rule)."""
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
    return F.floor(quality * 10000 + F.lit(0.5)).cast("long")


@register(
    "quality_quantile_cutoff",
    f"""
WITH q AS (
{_QE4_SQL}
), cut AS (
  SELECT source, quantile_cont(q_e4, {QUANTILE}) AS cutoff
  FROM q GROUP BY source
)
SELECT q.source,
       floor(max(cut.cutoff))::BIGINT AS cutoff_floor,
       sum(CASE WHEN q.q_e4 >= cut.cutoff THEN 1 ELSE 0 END)::BIGINT
         AS n_above,
       count(*)::BIGINT AS n_docs
FROM q JOIN cut USING (source)
GROUP BY q.source
""",
    doc=f"per-source quality gate at the {QUANTILE} quantile "
    "(keep-the-best-20% curation policy); Spark percentile == DuckDB "
    "quantile_cont on integer e4 scores, so the cutoff is bit-identical",
    tags=("text", "mlprep", "agg"),
)
def quality_quantile_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select("source", _quality_e4().alias("q_e4"))
    cut = q.groupBy("source").agg(
        F.percentile("q_e4", F.lit(QUANTILE)).alias("cutoff")
    )
    return (
        q.join(F.broadcast(cut), "source")
        .groupBy("source")
        .agg(
            F.floor(F.max("cutoff")).cast("long").alias("cutoff_floor"),
            F.sum((F.col("q_e4") >= F.col("cutoff")).cast("long")).alias(
                "n_above"
            ),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


CHUNK_MAX, CHUNK_STRIDE = 64, 48  #: context window + overlap stride


@register(
    "text_chunk_windows",
    f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), s AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, len(toks), {CHUNK_STRIDE})) AS start
  FROM t
)
SELECT doc_id,
       CAST((start - 1) // {CHUNK_STRIDE} AS INT) AS chunk_idx,
       md5(array_to_string(
         toks[start : start + {CHUNK_MAX} - 1], ' ')) AS chunk_digest,
       len(toks[start : start + {CHUNK_MAX} - 1]) AS n_tokens
FROM s
""",
    doc=f"LLM context-window chunking ({CHUNK_MAX}-token windows, "
    f"stride {CHUNK_STRIDE}): map-only sequence->slice->posexplode, "
    "no Python in the hot path (functions/chunking.py; the UDTF twin "
    "is the tokenizer extension point); chunks reported by digest so "
    "the verified surface is exact while rows stay narrow",
    tags=("text", "mlprep"),
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = chunk_expr(docs, max_tokens=CHUNK_MAX, stride=CHUNK_STRIDE)
    return out.select(
        "doc_id",
        "chunk_idx",
        F.md5("chunk_text").alias("chunk_digest"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


@register(
    "events_user_zscore",
    f"""
WITH b AS (
  SELECT event_id, user_id,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v_milli
  FROM events
), s AS (
  SELECT user_id, sum(v_milli) AS s, sum(v_milli * v_milli) AS q,
         count(*) AS n
  FROM b GROUP BY user_id
)
SELECT b.event_id, b.user_id, b.v_milli
FROM b JOIN s USING (user_id)
WHERE (b.v_milli * s.n - s.s) * (b.v_milli * s.n - s.s) * {Z_DEN}
      > {Z_NUM} * (s.n * s.q - s.s * s.s)
""",
    doc="per-user outlier events at |z| > 3 — the flag predicate is the "
    "z-test cleared of denominators ((n*x - s)^2 > 9*(n*q - s^2)), so "
    "it is integer-exact: no float mean/stddev, no summation-order "
    "hazard, identical rows in both engines",
    tags=("events", "mlprep", "agg"),
)
def events_user_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    b = ev.select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 1000 + F.lit(0.5))
        .cast("long")
        .alias("v_milli"),
    )
    # Aggregate in decimal(38,0) from the start: Spark's sum(long) stays
    # long (wraps / throws under ANSI at ~1e19), while DuckDB promotes
    # integer sums to HUGEINT — at 100 TB sum(v_milli^2) clears int64
    # long before the filter arithmetic does.
    dec = "decimal(38,0)"
    s = b.groupBy("user_id").agg(
        F.sum(F.col("v_milli").cast(dec)).alias("s"),
        F.sum(F.col("v_milli").cast(dec) * F.col("v_milli")).alias("q"),
        F.count(F.lit(1)).alias("n"),
    )
    # No broadcast hint: per-user stats grow with user cardinality, so
    # at 100 TB this must be a user_id-keyed shuffle join (both sides
    # already partition on user_id); AQE still broadcasts it when small.
    # decimal(38,0) arithmetic (ADVICE r3): DuckDB auto-promotes these
    # sums to HUGEINT (int128), so beyond test SFs the int64 products
    # could overflow on the Spark side only — wrapping (or throwing
    # under ANSI) while the oracle stays exact.  decimal(38,0) gives
    # both engines the same ~1e38 headroom, still integer-exact.
    x = F.col("v_milli").cast(dec)
    n_, s_, q_ = (F.col(c).cast(dec) for c in ("n", "s", "q"))
    d = x * n_ - s_
    return (
        b.join(s, "user_id")
        .filter(d * d * Z_DEN > Z_NUM * (n_ * q_ - s_ * s_))
        .select("event_id", "user_id", "v_milli")
    )


@register(
    "events_rolling_features",
    """
SELECT event_id, user_id,
       (count(*) OVER w)::BIGINT AS n_1h,
       (sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) OVER w)::BIGINT
         AS val_milli_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
    doc="per-user rolling 1h window features (event count + exact "
    "milli-int value sum) via a RANGE-interval frame — the standard "
    "feature-engineering shape for per-entity activity signals.  One "
    "shuffle on user_id, frames evaluated in a single sorted pass per "
    "partition; Spark's frame is expressed in epoch micros so the "
    "inclusive [-1h, now] bounds match DuckDB's INTERVAL frame "
    "exactly, and same-timestamp peers are frame-complete in both "
    "engines (no order dependence)",
    tags=("mlprep", "window"),
)
def events_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_dns_spark.functions.dnsfn import epoch_micros

    ev = load_events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(
            F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")
        ).over(w).alias("val_milli_1h"),
    )


@register(
    "events_mad_outliers",
    """
WITH b AS (
  SELECT user_id, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v_milli
  FROM events
), med AS (
  SELECT user_id, CAST(2 * median(v_milli) AS BIGINT) AS med_x2
  FROM b GROUP BY user_id
), dev AS (
  SELECT b.user_id, abs(2 * b.v_milli - m.med_x2) AS adev2
  FROM b JOIN med m USING (user_id)
), mad AS (
  SELECT user_id, CAST(2 * median(adev2) AS BIGINT) AS mad4
  FROM dev GROUP BY user_id
)
SELECT d.user_id, max(m.med_x2) AS med_x2, max(a.mad4) AS mad4,
       sum(CASE WHEN 2 * d.adev2 > 3 * a.mad4 THEN 1 ELSE 0 END)::BIGINT
         AS n_outliers,
       count(*)::BIGINT AS n
FROM dev d JOIN med m USING (user_id) JOIN mad a USING (user_id)
GROUP BY d.user_id
""",
    doc="robust outlier detection per user: median + median-absolute-"
    "deviation, flag |dev| > 3*MAD.  Medians of ints land on exact "
    "half-integers, so everything is carried doubled (med_x2, mad4 = "
    "4*MAD/2) and the flag predicate 2*adev2 > 3*mad4 is integer-exact "
    "— no float quantile/tolerance anywhere.  Every join/agg keys on "
    "user_id (one hash partitioning end-to-end); exact median IS a "
    "full-shuffle agg by definition — at 100 TB swap percentile for "
    "approx_percentile (t-digest, map-side combinable) with the same "
    "plan shape",
    tags=("events", "mlprep", "agg", "robust"),
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = load_events(spark, sf_dir).select(
        "user_id",
        F.floor(F.col("value") * 1000 + F.lit(0.5))
        .cast("long")
        .alias("v_milli"),
    )
    med = b.groupBy("user_id").agg(
        (F.percentile("v_milli", F.lit(0.5)) * 2).cast("long").alias("med_x2")
    )
    dev = b.join(med, "user_id").select(
        "user_id",
        "med_x2",
        F.abs(2 * F.col("v_milli") - F.col("med_x2")).alias("adev2"),
    )
    mad = dev.groupBy("user_id").agg(
        (F.percentile("adev2", F.lit(0.5)) * 2).cast("long").alias("mad4")
    )
    return (
        dev.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("med_x2").alias("med_x2"),
            F.max("mad4").alias("mad4"),
            F.sum(
                F.when(2 * F.col("adev2") > 3 * F.col("mad4"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "events_quantile_normalize",
    """
WITH b AS (
  SELECT event_id, event_type,
         CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v_milli
  FROM events
), r AS (
  SELECT event_id, event_type, v_milli,
         RANK() OVER (PARTITION BY event_type ORDER BY v_milli) AS rnk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM b
)
SELECT event_id, event_type, v_milli,
       CAST(CASE WHEN n > 1 THEN ((rnk - 1) * 1000000) // (n - 1)
                 ELSE 0 END AS BIGINT) AS qnorm_ppm
FROM r
""",
    doc="quantile normalization (the rank-based feature transform): "
    "percent_rank computed as INTEGER arithmetic ((rank-1)*1e6 div "
    "(n-1)) from RANK() + a count window — tie-stable and exact in "
    "both engines, no float window function.  Both windows share the "
    "event_type partitioning: one shuffle total; at 100 TB the "
    "per-type rank is the same distributed-rank problem the "
    "sorted-neighborhood dedup solves with the two-level prefix count",
    tags=("events", "mlprep", "window"),
)
def events_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = load_events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 1000 + F.lit(0.5))
        .cast("long")
        .alias("v_milli"),
    )
    w_rank = Window.partitionBy("event_type").orderBy("v_milli")
    w_all = Window.partitionBy("event_type")
    r = b.select(
        "event_id",
        "event_type",
        "v_milli",
        # rank() is IntegerType: the *1e6 product clears int32 at
        # ~2.1k rows per type, so widen BEFORE the arithmetic (ANSI
        # mode throws instead of wrapping — caught at sf0.1)
        F.rank().over(w_rank).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    return r.select(
        "event_id",
        "event_type",
        "v_milli",
        F.when(
            F.col("n") > 1,
            F.expr("((rnk - 1) * 1000000) div (n - 1)"),
        )
        .otherwise(0)
        .cast("long")
        .alias("qnorm_ppm"),
    )
