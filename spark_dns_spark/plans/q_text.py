"""Text-analysis operators over ``documents`` — the quality-filtering
front end of a training-data pipeline (builder brief; SURVEY.md §7.1 M5).

Five operators, each a map-only Catalyst expression pipeline (zero
Python UDFs) with a bit-exact DuckDB oracle:

- token counting (whitespace + regex + BPE-style byte estimate);
- quality scoring (length / stopword-ratio / alnum-fraction blend);
- language ID (marker-token n-gram heuristic; the ``lang`` metadata
  column is carried through for agreement measurement, not consulted
  by the heuristic);
- document fingerprinting (polynomial rolling hash over token hashes);
- per-source quality rollup (integer-exact aggregation — no
  cross-engine float-summation-order hazard).

At 100 TB every one of these is a single pass over the text column:
no shuffle except the final groupBys, whose keys (fingerprint, source)
are tiny compared to the text, so the wide column never moves twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.session import load_table

#: Marker-token sets for the language-ID heuristic (tiny stopword
#: profiles; a real deployment would use char-trigram profiles, same
#: plan shape).  Order of the CASE chain below is the deterministic
#: tie-break: en > de > es > fr.
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "los", "las", "es", "y", "una"),
    "fr": ("le", "la", "les", "et", "est", "une"),
}

#: English stopwords for the quality score's stopword ratio.
STOPWORDS = ("the", "a", "of", "and", "to", "is", "in", "it", "for", "on")

#: Rolling-hash modulus — small enough that ``acc*31 + h32`` stays far
#: below int64 overflow (DuckDB raises on overflow, Spark wraps).
FP_MOD = 1_000_000_007


def _toks(c: Column | str = "text") -> Column:
    return F.split(F.col(c) if isinstance(c, str) else c, " ")


def _hash32(c: Column) -> Column:
    """32-bit md5-prefix hash — identical in Spark and the oracle
    (``CAST('0x' || substr(md5(x),1,8) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


_HASH32_SQL = "CAST('0x' || substr(md5({x}), 1, 8) AS BIGINT)"


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))


def _marker_hits_sql(toks_expr: str, markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({toks_expr}, w -> list_contains([{lst}], w)))"


@register(
    "text_token_counts",
    """
SELECT doc_id,
       length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
       len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_tokens,
       (length(text) + 3) // 4 AS n_bpe_est
FROM documents
""",
    doc="token counting: whitespace tokens, distinct tokens, regex word "
    "tokens, and the standard chars/4 BPE-token estimate — one map-only "
    "pass, integer outputs",
    tags=("text",),
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks()
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_ws_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), F.lit(0))).alias(
            "n_alpha_tokens"
        ),
        ((F.length("text") + F.lit(3)) / F.lit(4)).cast("long").alias("n_bpe_est"),
    )


_QUALITY_SQL = f"""
WITH feat AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_words,
         {_marker_hits_sql("string_split(text, ' ')", STOPWORDS)} AS stop_hits,
         length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS n_clean
  FROM documents
)
SELECT doc_id,
       n_words,
       round(CASE WHEN n_words > 0 THEN stop_hits / n_words ELSE 0 END, 4)
         AS stop_ratio,
       round(CASE WHEN n_chars > 0 THEN n_clean / n_chars ELSE 0 END, 4)
         AS alnum_frac,
       round(CASE WHEN n_words > 0
                  THEN (n_chars - n_words + 1) / n_words ELSE 0 END, 4)
         AS avg_word_len,
       floor((0.35 * least(n_words / 80, 1)
             + 0.35 * (1 - CASE WHEN n_words > 0
                                THEN stop_hits / n_words ELSE 0 END)
             + 0.30 * CASE WHEN n_chars > 0
                           THEN n_clean / n_chars ELSE 0 END)
             * 10000 + 0.5) / 10000 AS quality
FROM feat
"""


@register(
    "text_quality_score",
    _QUALITY_SQL,
    doc="quality scoring: length + stopword-ratio + alnum-fraction blend "
    "(the step-1 filter of every training-data pipeline); map-only",
    tags=("text", "bench"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks()
    n_chars = F.length("text")
    n_words = F.size(toks)
    stop_hits = _marker_hits(toks, STOPWORDS)
    n_clean = F.length(F.regexp_replace(F.col("text"), "[^a-z0-9 ]", ""))
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    alnum_frac = F.when(n_chars > 0, n_clean / n_chars).otherwise(F.lit(0.0))
    avg_word_len = F.when(
        n_words > 0, (n_chars - n_words + 1) / n_words
    ).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.35) * F.least(n_words / F.lit(80), F.lit(1.0))
        + F.lit(0.35) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.30) * alnum_frac
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(alnum_frac, 4).alias("alnum_frac"),
        F.round(avg_word_len, 4).alias("avg_word_len"),
        # floor(x*1e4+0.5)/1e4 instead of round(): Spark and DuckDB round
        # doubles differently at exact .5 boundaries; floor is pure IEEE
        # arithmetic, so identical inputs give identical outputs.
        (F.floor(quality * 10000 + F.lit(0.5)) / 10000).alias("quality"),
    )


_LANG_CASE_SQL = """
CASE WHEN en_hits = 0 AND de_hits = 0 AND es_hits = 0 AND fr_hits = 0
       THEN 'und'
     WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits
       THEN 'en'
     WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
     WHEN es_hits >= fr_hits THEN 'es'
     ELSE 'fr' END
"""


@register(
    "text_language_id",
    f"""
WITH hits AS (
  SELECT doc_id, lang,
         {_marker_hits_sql("string_split(text, ' ')", LANG_MARKERS["en"])} AS en_hits,
         {_marker_hits_sql("string_split(text, ' ')", LANG_MARKERS["de"])} AS de_hits,
         {_marker_hits_sql("string_split(text, ' ')", LANG_MARKERS["es"])} AS es_hits,
         {_marker_hits_sql("string_split(text, ' ')", LANG_MARKERS["fr"])} AS fr_hits
  FROM documents
)
SELECT doc_id, lang, en_hits, de_hits, es_hits, fr_hits,
       {_LANG_CASE_SQL} AS predicted,
       CAST({_LANG_CASE_SQL} = lang AS INTEGER) AS agrees
FROM hits
""",
    doc="language ID: marker-token n-gram heuristic with deterministic "
    "argmax tie-break; the lang metadata column is only compared, never "
    "consulted",
    tags=("text",),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks()
    hits = docs.select(
        "doc_id",
        "lang",
        *[
            _marker_hits(toks, LANG_MARKERS[lang]).alias(f"{lang}_hits")
            for lang in ("en", "de", "es", "fr")
        ],
    )
    en, de, es, fr = [F.col(f"{lang}_hits") for lang in ("en", "de", "es", "fr")]
    predicted = (
        F.when((en == 0) & (de == 0) & (es == 0) & (fr == 0), F.lit("und"))
        .when((en >= de) & (en >= es) & (en >= fr), F.lit("en"))
        .when((de >= es) & (de >= fr), F.lit("de"))
        .when(es >= fr, F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return hits.select(
        "doc_id",
        "lang",
        "en_hits",
        "de_hits",
        "es_hits",
        "fr_hits",
        predicted.alias("predicted"),
        (predicted == F.col("lang")).cast("int").alias("agrees"),
    )


@register(
    "text_fingerprint",
    f"""
WITH fp AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(text, ' '),
                            s -> {_HASH32_SQL.format(x="s")})),
           (acc, x) -> (acc * 31 + x) % {FP_MOD}) AS fingerprint
  FROM documents
)
SELECT fingerprint, min(doc_id) AS canonical_id, count(*) AS n_docs
FROM fp GROUP BY fingerprint
""",
    doc="document fingerprinting: order-sensitive polynomial rolling hash "
    "over token hashes (Rabin-Karp style), then dedup-group on the "
    "8-byte fingerprint — the wide text column never reaches the shuffle",
    tags=("text", "dedup"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.aggregate(
        F.transform(_toks(), _hash32),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(FP_MOD),
    )
    return (
        docs.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_docs"))
    )


_QUALITY_BY_SOURCE_SQL = f"""
WITH feat AS (
  SELECT source,
         length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_words,
         {_marker_hits_sql("string_split(text, ' ')", STOPWORDS)} AS stop_hits,
         length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS n_clean
  FROM documents
), scored AS (
  SELECT source, n_words,
         floor((0.35 * least(n_words / 80, 1)
         + 0.35 * (1 - CASE WHEN n_words > 0
                            THEN stop_hits / n_words ELSE 0 END)
         + 0.30 * CASE WHEN n_chars > 0
                       THEN n_clean / n_chars ELSE 0 END) * 10000 + 0.5)
           AS quality_e4
  FROM feat
)
SELECT source,
       count(*) AS n_docs,
       sum(CASE WHEN quality_e4 >= 7500 THEN 1 ELSE 0 END)::BIGINT
         AS n_high_quality,
       sum(n_words)::BIGINT AS total_words,
       floor((sum(n_words) / count(*)) * 100 + 0.5) / 100 AS avg_words
FROM scored GROUP BY source
"""


@register(
    "text_quality_by_source",
    _QUALITY_BY_SOURCE_SQL,
    doc="per-source quality rollup with integer-exact aggregates (no "
    "float-summation-order hazard across engines)",
    tags=("text", "agg"),
)
def text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks()
    n_chars = F.length("text")
    n_words = F.size(toks)
    stop_hits = _marker_hits(toks, STOPWORDS)
    n_clean = F.length(F.regexp_replace(F.col("text"), "[^a-z0-9 ]", ""))
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    alnum_frac = F.when(n_chars > 0, n_clean / n_chars).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.35) * F.least(n_words / F.lit(80), F.lit(1.0))
        + F.lit(0.35) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.30) * alnum_frac
    )
    feat = docs.select(
        "source",
        n_words.alias("n_words"),
        # floor-round the blend BEFORE the threshold (same rule as
        # text_quality_score) so a last-ulp cross-engine difference
        # can't flip a doc across the 0.75 cut.
        F.floor(quality * 10000 + F.lit(0.5)).alias("quality_e4"),
    )
    return feat.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("quality_e4") >= 7500).cast("long")).alias("n_high_quality"),
        F.sum("n_words").alias("total_words"),
        (F.floor((F.sum("n_words") / F.count("*")) * 100 + F.lit(0.5)) / 100)
        .alias("avg_words"),
    )


@register(
    "text_langid_confusion",
    f"""
WITH hits AS (
  SELECT doc_id, lang,
         {_marker_hits_sql("string_split(text, ' ')", LANG_MARKERS["en"])} AS en_hits,
         {_marker_hits_sql("string_split(text, ' ')", LANG_MARKERS["de"])} AS de_hits,
         {_marker_hits_sql("string_split(text, ' ')", LANG_MARKERS["es"])} AS es_hits,
         {_marker_hits_sql("string_split(text, ' ')", LANG_MARKERS["fr"])} AS fr_hits
  FROM documents
), pred AS (
  SELECT lang, {_LANG_CASE_SQL} AS predicted FROM hits
), cells AS (
  SELECT lang, predicted, count(*)::BIGINT AS n_docs
  FROM pred GROUP BY lang, predicted
), totals AS (
  SELECT lang, sum(n_docs)::BIGINT AS label_total FROM cells GROUP BY lang
)
SELECT c.lang, c.predicted, c.n_docs, t.label_total,
       c.n_docs * 10000 // t.label_total AS row_pct_e4
FROM cells c JOIN totals t ON c.lang = t.lang
""",
    doc="language-ID EVALUATION: the confusion matrix of the marker "
    "heuristic against the lang metadata labels — per (label, "
    "predicted) cell counts plus the per-label recall share (integer "
    "e4, floor-div).  The classifier family's accountability metric, "
    "the same self-measuring pattern as the ANN recall gates: the "
    "operator ships WITH the query that scores it.  Two aggregations "
    "whose input collapses to <=25 label-pairs after the first "
    "(map-side combine does the real work); the second join is on a "
    "handful of rows",
    tags=("text", "metric"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks()
    hits = docs.select(
        "lang",
        *[
            _marker_hits(toks, LANG_MARKERS[lang]).alias(f"{lang}_hits")
            for lang in ("en", "de", "es", "fr")
        ],
    )
    en, de, es, fr = [F.col(f"{lang}_hits") for lang in ("en", "de", "es", "fr")]
    predicted = (
        F.when((en == 0) & (de == 0) & (es == 0) & (fr == 0), F.lit("und"))
        .when((en >= de) & (en >= es) & (en >= fr), F.lit("en"))
        .when((de >= es) & (de >= fr), F.lit("de"))
        .when(es >= fr, F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    cells = (
        hits.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    totals = cells.groupBy("lang").agg(
        F.sum("n_docs").alias("label_total")
    )
    return cells.join(totals, "lang").select(
        "lang",
        "predicted",
        "n_docs",
        "label_total",
        F.expr("n_docs * 10000 div label_total").alias("row_pct_e4"),
    )
