"""Corpus-curation operators round 2 (builder brief, beyond-reference):
the cleanup/governance passes a training-data pipeline runs between
quality filtering and packing — PII redaction, repetition filtering,
benchmark decontamination, cluster-representative selection, and
domain-mix rebalancing.  Every query has a bit-exact DuckDB oracle
(integer or floor-rounded outputs only — catalog conventions).

Scale notes (100 TB): redaction/repetition are map-only expression
pipelines (text scanned once, nothing wide shuffled); decontamination
broadcasts the benchmark-gram set (benchmarks are tiny vs the corpus)
and joins corpus grams against it with map-side distinct; rep-selection
rides the cluster-assign fixpoint's output; mix-rebalance is a 20-row
aggregate broadcast back over a per-source rank window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.operators import dedup as dd
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.plans.q_text import STOPWORDS, _marker_hits, _marker_hits_sql, _toks
from spark_dns_spark.session import load_table, spread

#: Regexes are deliberately RE2∩Java-identical subsets: char classes,
#: bounded counts, \\b word boundaries — no lookaround, no backrefs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: Synthetic PII riders: the test corpus carries no natural PII, so
#: every 10th doc gets a deterministic contact suffix — the redaction
#: path is exercised on real matches, and BOTH engines append the same
#: suffix before scanning.
_PII_SUFFIX_SQL = (
    "CASE WHEN doc_id % 10 = 0 THEN text || ' contact user' || "
    "CAST(doc_id AS VARCHAR) || '@example.com at 10.0.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.1 now' ELSE text END"
)


def _pii_text():
    return F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1 now"),
        ),
    ).otherwise(F.col("text"))


@register(
    "text_pii_redact",
    f"""
WITH aug AS (
  SELECT doc_id, {_PII_SUFFIX_SQL} AS t FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(t, '{IPV4_RE}')) AS n_ips,
       md5(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{IPV4_RE}', '<IP>', 'g')) AS redacted_digest,
       strlen(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                             '{IPV4_RE}', '<IP>', 'g')) AS redacted_len
FROM aug
""",
    doc="PII redaction (emails + IPv4 → placeholder tokens): match "
    "counts and the digest of the fully-redacted text per doc, proving "
    "replacement byte-exactness across engines; map-only — the "
    "compliance scrub every assembled corpus runs before packing",
    tags=("curation", "text", "redact"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    t = _pii_text()
    redacted = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.md5(redacted).alias("redacted_digest"),
        F.octet_length(redacted).cast("long").alias("redacted_len"),
    )


@register(
    "text_repetition_filter",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), freq AS (
  SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2
), stats AS (
  SELECT doc_id,
         sum(c)::BIGINT AS n_tokens,
         count(*)::BIGINT AS n_distinct,
         max(c)::BIGINT AS max_tok_freq
  FROM freq GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct, max_tok_freq,
       CAST(floor((1 - CAST(n_distinct AS DOUBLE) / n_tokens) * 10000 + 0.5)
            AS BIGINT) AS dup_ratio_e4,
       CASE WHEN max_tok_freq * 5 >= n_tokens THEN 1 ELSE 0 END
         AS is_repetitive
FROM stats
""",
    doc="repetition-ratio quality filter: token/distinct-token counts, "
    "hottest-token share, duplicate ratio (integer e4), and the >=20% "
    "single-token flag — the boilerplate/spam cut of every corpus "
    "pipeline; explode + codegen hash-agg, partial combine map-side",
    tags=("curation", "text", "quality"),
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(_toks()).alias("w"))
    freq = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    stats = freq.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("max_tok_freq"),
    )
    return stats.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "max_tok_freq",
        F.floor(
            (F.lit(1) - F.col("n_distinct").cast("double") / F.col("n_tokens"))
            * 10000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("dup_ratio_e4"),
        F.when(F.col("max_tok_freq") * 5 >= F.col("n_tokens"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_repetitive"),
    )


#: Benchmark membership: stable md5 bucket of doc_id, ~5% of docs.
_BENCH_BUCKETS = 20
SHINGLE_N = 5
_BUCKET_SQL = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 20"
)


@register(
    "contamination_ngram_overlap",
    f"""
WITH marked AS (
  SELECT doc_id, text, {_BUCKET_SQL} = 0 AS is_bench FROM documents
), toks AS (
  SELECT doc_id, is_bench, string_split(text, ' ') AS t FROM marked
), grams AS (
  SELECT doc_id, is_bench,
         unnest(list_distinct({dd.word_shingles_sql("t", SHINGLE_N)})) AS g
  FROM toks
), bench_grams AS (
  SELECT DISTINCT g FROM grams WHERE is_bench
), corpus AS (
  SELECT doc_id, g FROM grams WHERE NOT is_bench
), hits AS (
  SELECT c.doc_id, count(*)::BIGINT AS n_contaminated
  FROM corpus c JOIN bench_grams b ON c.g = b.g
  GROUP BY c.doc_id
), totals AS (
  SELECT doc_id, count(*)::BIGINT AS n_grams FROM corpus GROUP BY doc_id
)
SELECT t.doc_id, t.n_grams,
       coalesce(h.n_contaminated, 0)::BIGINT AS n_contaminated,
       CASE WHEN coalesce(h.n_contaminated, 0) * 2 >= t.n_grams
            THEN 1 ELSE 0 END AS contaminated
FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id
""",
    doc="benchmark decontamination: a stable 5% hash bucket plays the "
    "held-out benchmark; corpus docs count their distinct 5-gram overlap "
    "against the benchmark gram set and flag >=50% overlap — at 100 TB "
    "the benchmark grams broadcast (benchmarks are MBs, the corpus is "
    "the big side) so contamination is a map-side hash probe per gram",
    tags=("curation", "dedup", "contamination"),
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _BENCH_BUCKETS
    )
    toks = docs.select(
        "doc_id", (bucket == 0).alias("is_bench"), _toks().alias("t")
    )
    grams = toks.select(
        "doc_id",
        "is_bench",
        F.explode(
            F.array_distinct(dd.word_shingles(F.col("t"), SHINGLE_N))
        ).alias("g"),
    )
    bench = F.broadcast(
        grams.filter("is_bench").select("g").distinct()
    )
    corpus = grams.filter(~F.col("is_bench")).select("doc_id", "g")
    totals = corpus.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        corpus.join(bench, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
        F.when(
            F.coalesce(F.col("n_contaminated"), F.lit(0)) * 2 >= F.col("n_grams"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("contaminated"),
    )


#: quality_e4 expression (same blend as q_text.text_quality_score,
#: floor-rounded to integer e4 units — driver-proof by construction).
_QUALITY_E4_SQL = f"""
SELECT doc_id,
       CAST(floor((0.35 * least(len(string_split(text, ' ')) / 80, 1)
       + 0.35 * (1 - CASE WHEN len(string_split(text, ' ')) > 0
                          THEN {_marker_hits_sql("string_split(text, ' ')", STOPWORDS)}
                               / len(string_split(text, ' '))
                          ELSE 0 END)
       + 0.30 * CASE WHEN length(text) > 0
                     THEN length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
                          / length(text)
                     ELSE 0 END) * 10000 + 0.5) AS BIGINT) AS quality_e4
FROM documents
"""


def _quality_e4():
    toks = _toks()
    n_chars = F.length("text")
    n_words = F.size(toks)
    stop_ratio = F.when(
        n_words > 0, _marker_hits(toks, STOPWORDS) / n_words
    ).otherwise(F.lit(0.0))
    alnum = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(F.col("text"), "[^a-z0-9 ]", "")) / n_chars,
    ).otherwise(F.lit(0.0))
    q = (
        F.lit(0.35) * F.least(n_words / F.lit(80), F.lit(1.0))
        + F.lit(0.35) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.30) * alnum
    )
    return F.floor(q * 10000 + F.lit(0.5)).cast("long")


def _cluster_rep_sql() -> str:
    from spark_dns_spark.plans.q_dedup import MINHASH_LSH_SQL

    return f"""
WITH RECURSIVE pairs AS (
{MINHASH_LSH_SQL}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(src, dst) AS (
  SELECT DISTINCT src, src AS dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), comp AS (
  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
), sized AS (
  SELECT doc_id, cluster_id,
         count(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM comp
), feat AS (
{_QUALITY_E4_SQL}
)
SELECT cluster_id, doc_id AS rep_doc_id, cluster_size,
       quality_e4 AS rep_quality_e4
FROM (
  SELECT s.doc_id, s.cluster_id, s.cluster_size, f.quality_e4,
         ROW_NUMBER() OVER (PARTITION BY s.cluster_id
                            ORDER BY f.quality_e4 DESC, s.doc_id) AS rn
  FROM sized s JOIN feat f ON s.doc_id = f.doc_id
) WHERE rn = 1
"""


@register(
    "dedup_cluster_representatives",
    _cluster_rep_sql(),
    doc="cluster-representative selection: for every LSH near-dup "
    "cluster keep the HIGHEST-QUALITY member (argmax quality_e4, doc_id "
    "tie-break) — the decision step that turns pairwise dedup into an "
    "actual curated corpus; rides the cluster-assign fixpoint plus one "
    "rank window on cluster_id",
    tags=("curation", "dedup", "cluster"),
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_dns_spark.plans.q_cluster import dedup_cluster_assign

    clusters = dedup_cluster_assign(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    feat = docs.select("doc_id", _quality_e4().alias("quality_e4"))
    joined = clusters.join(feat, "doc_id")
    rn = F.row_number().over(
        Window.partitionBy("cluster_id").orderBy(
            F.col("quality_e4").desc(), F.col("doc_id")
        )
    )
    return (
        joined.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            "cluster_size",
            F.col("quality_e4").alias("rep_quality_e4"),
        )
    )


#: Per-source weight: 20 + h32(source)%80 (deterministic, both engines).
_W_SQL = "20 + CAST('0x' || substr(md5(source), 1, 8) AS BIGINT) % 80"


@register(
    "domain_mix_rebalance",
    f"""
WITH weighted AS (
  SELECT source, count(*)::BIGINT AS n_docs, {_W_SQL} AS w
  FROM documents GROUP BY source
), wtot AS (
  SELECT sum(w)::BIGINT AS w_total FROM weighted
), caps AS (
  SELECT weighted.*, w_total,
         CAST(floor(n_docs * w_total / w) AS BIGINT) AS cap
  FROM weighted, wtot
), nmax AS (
  SELECT min(cap)::BIGINT AS n_max FROM caps
), plan AS (
  SELECT source, n_docs, w,
         CAST(floor(w * 1000.0 / w_total + 0.5) AS BIGINT) AS w_permille,
         CAST(floor(w * n_max / w_total) AS BIGINT) AS keep_n
  FROM caps, nmax
), ranked AS (
  SELECT d.source, d.doc_id,
         ROW_NUMBER() OVER (PARTITION BY d.source
                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
           AS rk,
         p.keep_n
  FROM documents d JOIN plan p ON d.source = p.source
)
SELECT p.source, p.n_docs, p.w_permille, p.keep_n,
       min(r.doc_id) AS first_kept, max(r.doc_id) AS last_kept
FROM plan p JOIN ranked r ON r.source = p.source AND r.rk <= p.keep_n
GROUP BY 1, 2, 3, 4
""",
    doc="domain-mix rebalancing: hash-derived per-source target weights "
    "→ the largest corpus size N where every source can fill its share "
    "→ per-source keep_n, selected EXACTLY via a stable md5 rank (not "
    "a percent bucket: reruns keep identical rows and hit keep_n "
    "exactly).  One 20-row aggregate broadcast back over a per-source "
    "rank window; integer arithmetic end-to-end",
    tags=("curation", "sampling"),
)
def domain_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = (
        F.lit(20)
        + F.conv(F.substring(F.md5("source"), 1, 8), 16, 10).cast("long") % 80
    )
    weighted = docs.groupBy("source").agg(F.count("*").alias("n_docs")).select(
        "source", "n_docs", w.alias("w")
    )
    # tiny (one row per source): scalar totals via cross-joined 1-row aggs
    w_total = weighted.agg(F.sum("w").alias("w_total"))
    caps = weighted.crossJoin(F.broadcast(w_total))
    caps = caps.withColumn(
        "cap", F.floor(F.col("n_docs") * F.col("w_total") / F.col("w"))
    )
    n_max = caps.agg(F.min("cap").alias("n_max"))
    plan = caps.crossJoin(F.broadcast(n_max)).select(
        "source",
        "n_docs",
        "w",
        F.floor(F.col("w") * 1000.0 / F.col("w_total") + F.lit(0.5))
        .cast("long")
        .alias("w_permille"),
        F.floor(F.col("w") * F.col("n_max") / F.col("w_total"))
        .cast("long")
        .alias("keep_n"),
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    ranked = docs.join(F.broadcast(plan.select("source", "keep_n")), "source")
    ranked = (
        ranked.withColumn("rk", rk)
        .filter(F.col("rk") <= F.col("keep_n"))
        .drop("keep_n", "rk")
    )
    return (
        plan.join(ranked, "source")
        .groupBy("source", "n_docs", "w_permille", "keep_n")
        .agg(
            F.min("doc_id").alias("first_kept"),
            F.max("doc_id").alias("last_kept"),
        )
    )


#: Global token budget apportioned across sources (Hamilton method).
MIX_BUDGET = 100_000


@register(
    "mix_token_budget_apportion",
    f"""
WITH src AS (
  SELECT source, sum(n_chars)::BIGINT AS w
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(w) AS tw, count(*) AS ns FROM src
), base AS (
  SELECT source, w,
         ({MIX_BUDGET} * w) // (SELECT tw FROM tot) AS floor_quota,
         ({MIX_BUDGET} * w) % (SELECT tw FROM tot) AS remainder
  FROM src
), seats AS (
  SELECT (SELECT CAST({MIX_BUDGET} AS BIGINT) FROM tot)
         - sum(floor_quota) AS extra
  FROM base
), ranked AS (
  SELECT source, w, floor_quota, remainder,
         row_number() OVER (ORDER BY remainder DESC, source) AS rr
  FROM base
)
SELECT source, w, floor_quota::BIGINT AS floor_quota,
       remainder::BIGINT AS remainder,
       (floor_quota + CASE WHEN rr <= (SELECT extra FROM seats)
                           THEN 1 ELSE 0 END)::BIGINT AS quota
FROM ranked
""",
    doc=f"largest-remainder (Hamilton) apportionment of a global "
    f"{MIX_BUDGET}-token budget across sources by char mass — the "
    "integer-exact core of data-mixture quota allocation: floor "
    "quotas always sum <= budget, the leftover seats go to the "
    "largest remainders (deterministic source tie-break), so quotas "
    "sum to EXACTLY the budget with no float weights anywhere; one "
    "aggregate + one window over a source-sized relation",
    tags=("curation", "mlprep", "sampling"),
)
def mix_token_budget_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("w"))
    )
    tot = src.agg(
        F.sum("w").alias("tw"), F.count(F.lit(1)).alias("ns")
    )
    base = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "w",
        F.expr(f"({MIX_BUDGET}L * w) div tw").alias("floor_quota"),
        F.expr(f"({MIX_BUDGET}L * w) % tw").alias("remainder"),
    )
    seats = base.agg(
        (F.lit(MIX_BUDGET).cast("long") - F.sum("floor_quota")).alias("extra")
    )
    w_rank = Window.orderBy(F.desc("remainder"), F.asc("source"))
    # NB the single-partition window is over the SOURCE dimension
    # (tens of rows at any corpus scale), not the corpus
    return (
        base.withColumn("rr", F.row_number().over(w_rank))
        .crossJoin(F.broadcast(seats))
        .select(
            "source",
            "w",
            "floor_quota",
            "remainder",
            (
                F.col("floor_quota")
                + F.when(F.col("rr") <= F.col("extra"), 1).otherwise(0)
            ).cast("long").alias("quota"),
        )
    )


# --- boilerplate detection --------------------------------------------------

BOILER_N = 4  #: shingle width (words) for the boilerplate unit
BOILER_MIN_DOCS = 3  #: a shingle in >= this many docs OF ONE SOURCE is boilerplate


def _boiler_sql() -> str:
    from spark_dns_spark.functions.dnsfn import portable_hash32_sql

    return f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
           {dd.word_shingles_sql("t", BOILER_N)},
           s -> {portable_hash32_sql("s")}))) AS h
  FROM toks
), dfreq AS (
  SELECT source, h, count(*)::BIGINT AS df FROM sh GROUP BY source, h
), per AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_shingles,
         sum(CASE WHEN df >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END)::BIGINT
           AS n_boiler
  FROM sh JOIN dfreq USING (source, h)
  GROUP BY doc_id
)
SELECT doc_id, n_shingles, n_boiler,
       n_boiler * 10000 // n_shingles AS boiler_pct_e4
FROM per WHERE n_shingles > 0
"""


@register(
    "curation_boilerplate_fraction",
    _boiler_sql(),
    doc=f"CCNet-style boilerplate detection: a {BOILER_N}-word shingle "
    f"appearing in >= {BOILER_MIN_DOCS} distinct documents of the SAME "
    "source (nav bars, footers, license headers repeat within a crawl "
    "domain) is boilerplate; each doc gets its boilerplate fraction "
    "(integer e4, floor-div — exact in both engines).  Per-doc "
    "DISTINCT shingle hashes are computed map-side BEFORE the explode, "
    "then two skinny-key shuffles — (source, hash32) doc-frequency and "
    "the doc_id rollup; the corpus text itself never shuffles, the "
    "same budget shape as the exact-substring dedup family",
    tags=("curation", "text"),
)
def curation_boilerplate_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from spark_dns_spark.functions.dnsfn import portable_hash32

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("t")
    )
    # persist at the fan-out: sh feeds BOTH the doc-frequency aggregate
    # and the join-back — without the cache the interpreted
    # shingle-hash pipeline runs twice (the q_dedup._signatures_of
    # lesson; released by the standard cache-lifetime discipline).
    sh = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(
                F.transform(
                    dd.word_shingles("t", BOILER_N), portable_hash32
                )
            )
        ).alias("h"),
    ).persist()
    dfreq = sh.groupBy("source", "h").agg(F.count(F.lit(1)).alias("df"))
    per = (
        sh.join(dfreq, ["source", "h"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("df") >= BOILER_MIN_DOCS, 1).otherwise(0)
            ).alias("n_boiler"),
        )
    )
    return per.filter(F.col("n_shingles") > 0).select(
        "doc_id",
        "n_shingles",
        "n_boiler",
        F.expr("n_boiler * 10000 div n_shingles").alias("boiler_pct_e4"),
    )


# --- bloom-filter decontamination -------------------------------------------

BLOOM_M = 8192  #: filter bits; ~1 KB of state whatever the benchmark size
BLOOM_K = 3  #: hash functions (the md5-affine family minhash/CMS use)


def _bloom_sql() -> str:
    from spark_dns_spark.functions.dnsfn import portable_hash32_sql
    from spark_dns_spark.operators.dedup import MINHASH_P, _affine_consts

    consts = _affine_consts(BLOOM_K)
    pos = ", ".join(
        f"(hg * {a} + {b}) % {MINHASH_P} % {BLOOM_M}" for a, b in consts
    )
    return f"""
WITH marked AS (
  SELECT doc_id, text, {_BUCKET_SQL} = 0 AS is_bench FROM documents
), toks AS (
  SELECT doc_id, is_bench, string_split(text, ' ') AS t FROM marked
), grams AS (
  SELECT doc_id, is_bench,
         unnest(list_distinct({dd.word_shingles_sql("t", SHINGLE_N)})) AS g
  FROM toks
), hashed AS (
  SELECT doc_id, is_bench, g, {portable_hash32_sql("g")} AS hg FROM grams
), positions AS (
  SELECT doc_id, is_bench, g, unnest([{pos}]) AS pos FROM hashed
), bits AS (
  SELECT DISTINCT pos FROM positions WHERE is_bench
), bench_grams AS (
  SELECT DISTINCT g FROM grams WHERE is_bench
), probe AS (
  SELECT p.doc_id, p.g,
         sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_set
  FROM positions p LEFT JOIN bits b ON p.pos = b.pos
  WHERE NOT p.is_bench
  GROUP BY p.doc_id, p.g
), per_doc AS (
  SELECT pr.doc_id,
         count(*)::BIGINT AS n_grams,
         sum(CASE WHEN pr.n_set = {BLOOM_K} THEN 1 ELSE 0 END)::BIGINT
           AS n_bloom_hits,
         sum(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_exact_hits
  FROM probe pr LEFT JOIN bench_grams bg ON pr.g = bg.g
  GROUP BY pr.doc_id
)
SELECT doc_id, n_grams, n_bloom_hits, n_exact_hits,
       n_bloom_hits - n_exact_hits AS n_false_pos
FROM per_doc
"""


#: process-lifetime cache of built bloom word arrays, (sf_dir, mtime)
#: keyed — build-once/probe-many, the pq_index_path lesson: the 1 KB
#: filter must not be re-aggregated from the bench slice on every
#: invocation (a production job persists it alongside the benchmark).
_BLOOM_WORDS: dict = {}
_BLOOM_LOCK = __import__("threading").Lock()


def _bloom_words(spark, sf_dir, grams, consts) -> list[int]:
    """The BLOOM_M-bit filter as 64-bit words (signed, Spark's long
    domain).  One aggregate over the bench slice, then cached for the
    process keyed on the backing parquet's mtime (stale-index rule,
    ADVICE r8)."""
    import os

    from spark_dns_spark.functions.dnsfn import portable_hash32
    from spark_dns_spark.operators.dedup import MINHASH_P

    try:
        key = (sf_dir, os.path.getmtime(os.path.join(sf_dir, "documents.parquet")))
    except OSError:
        key = (sf_dir, None)
    with _BLOOM_LOCK:
        hit = _BLOOM_WORDS.get(key)
    if hit is not None:
        return hit
    # <= BLOOM_M rows by construction: the whitelisted constant-size-
    # model-state collect (the SKETCH is the model, like Lloyd
    # centroids).
    bit_rows = (
        grams.filter("is_bench")
        .select(
            F.explode(
                F.array(
                    *[
                        (portable_hash32("g") * F.lit(a) + F.lit(b))
                        % F.lit(MINHASH_P)
                        % F.lit(BLOOM_M)
                        for a, b in consts
                    ]
                )
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (BLOOM_M // 64)
    for r in bit_rows:
        p = int(r["pos"])
        words[p // 64] |= 1 << (p % 64)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    with _BLOOM_LOCK:
        _BLOOM_WORDS[key] = words
    return words



@register(
    "contamination_bloom_filter",
    _bloom_sql(),
    doc=f"bloom-filter decontamination: the benchmark gram set is "
    f"compressed to {BLOOM_M} bits x {BLOOM_K} md5-affine hashes "
    "(~1 KB of CONSTANT state however large the benchmark grows — the "
    "scale path when the exact gram set outgrows its broadcast "
    "envelope), corpus grams probe it map-side (a gram is positive "
    "iff ALL k bits are set), and the exact gram join runs alongside "
    "to measure the sketch: n_bloom_hits >= n_exact_hits per doc "
    "(one-sided error, pytest-pinned) with n_false_pos recording the "
    "cost of the compression.  Deterministic md5-affine hashing means "
    "the oracle reproduces every bit",
    tags=("curation", "contamination", "sketch"),
)
def contamination_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_dns_spark.functions.dnsfn import portable_hash32
    from spark_dns_spark.operators.dedup import MINHASH_P, _affine_consts

    consts = _affine_consts(BLOOM_K)
    docs = spread(load_table(spark, sf_dir, "documents"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _BENCH_BUCKETS
    )
    toks = docs.select(
        "doc_id", (bucket == 0).alias("is_bench"), _toks().alias("t")
    )
    grams = toks.select(
        "doc_id",
        "is_bench",
        F.explode(
            F.array_distinct(dd.word_shingles(F.col("t"), SHINGLE_N))
        ).alias("g"),
    )

    # Build the filter: distinct bit positions of the bench grams —
    # <= BLOOM_M rows by construction, collected into the BLOOM_M-bit
    # word array (the whitelisted constant-size-model-state pattern,
    # like a Lloyd centroid collect: the SKETCH is the model).  A
    # production job persists these 1 KB alongside the benchmark and
    # ships them as literals, exactly as below — the probe is then a
    # pure MAP, no join, no per-position explode of the corpus.
    words = _bloom_words(spark, sf_dir, grams, consts)
    bmap = "array(" + ",".join(f"{w}L" for w in words) + ")"
    # (w >> p) & 1 reads bit p regardless of sign extension.
    bloom_pos = F.expr(
        f"forall(posarr, p -> ((shiftright(element_at({bmap}, "
        f"CAST(p DIV 64 AS INT) + 1), CAST(p % 64 AS INT))) & 1) = 1)"
    )

    # The exact probe runs alongside to measure the sketch; ITS
    # broadcast envelope (bench grams are MBs vs the corpus) is the
    # documented contamination_ngram_overlap contract.
    bench_grams = F.broadcast(
        grams.filter("is_bench").select("g").distinct()
        .withColumn("in_bench", F.lit(1))
    )
    corpus = grams.filter(~F.col("is_bench")).select(
        "doc_id",
        "g",
        F.array(
            *[
                (portable_hash32("g") * F.lit(a) + F.lit(b))
                % F.lit(MINHASH_P)
                % F.lit(BLOOM_M)
                for a, b in consts
            ]
        ).alias("posarr"),
    )
    per_doc = (
        corpus.withColumn("bloom_hit", bloom_pos)
        .join(bench_grams, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).alias(
                "n_bloom_hits"
            ),
            F.sum(F.coalesce(F.col("in_bench"), F.lit(0))).alias(
                "n_exact_hits"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_bloom_hits",
        "n_exact_hits",
        (F.col("n_bloom_hits") - F.col("n_exact_hits")).alias("n_false_pos"),
    )


def _boiler_clean_sql() -> str:
    from spark_dns_spark.functions.dnsfn import portable_hash32_sql

    return f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), hs AS (
  SELECT doc_id, source, t,
         list_transform({dd.word_shingles_sql("t", BOILER_N)},
                        s -> {portable_hash32_sql("s")}) AS ha
  FROM toks
), dist AS (
  SELECT doc_id, source, unnest(list_distinct(ha)) AS h FROM hs
), dfreq AS (
  SELECT source, h, count(*)::BIGINT AS df FROM dist GROUP BY source, h
), boiler AS (
  SELECT source, h FROM dfreq WHERE df >= {BOILER_MIN_DOCS}
), pos AS (
  SELECT doc_id, source, u.i AS sp, u.h AS h FROM (
    SELECT doc_id, source,
           unnest(list_transform(generate_series(1, len(ha)),
                                 i -> {{'i': i, 'h': ha[i]}})) AS u
    FROM hs
  )
), starts AS (
  SELECT p.doc_id, p.sp FROM pos p JOIN boiler b USING (source, h)
), covered AS (
  SELECT DISTINCT doc_id, sp + o AS wp
  FROM starts, (SELECT unnest(generate_series(0, {BOILER_N - 1})) AS o)
), cov AS (
  SELECT doc_id, list(wp) AS cov FROM covered GROUP BY doc_id
), clean AS (
  SELECT t.doc_id,
         list_filter(
           list_transform(generate_series(1, len(t.t)),
             p -> CASE WHEN c.cov IS NOT NULL AND list_contains(c.cov, p)
                       THEN NULL ELSE t.t[p] END),
           x -> x IS NOT NULL) AS kept,
         len(t.t)::BIGINT AS n_words
  FROM toks t LEFT JOIN cov c USING (doc_id)
)
SELECT doc_id, n_words, len(kept)::BIGINT AS n_kept,
       md5(array_to_string(kept, ' ')) AS clean_digest
FROM clean
"""


@register(
    "curation_boilerplate_clean",
    _boiler_clean_sql(),
    doc=f"the APPLY side of boilerplate detection (the detect→rewrite "
    "pair, like dedup_exact_substring→dedup_substring_clean): every "
    f"occurrence of a per-source repeated {BOILER_N}-gram is a covered "
    f"word span [i, i+{BOILER_N - 1}], the union of covered positions "
    "is dropped, and the doc is re-emitted as its cleaned text "
    "(digest + kept-count — the hash proves byte-exact reconstruction "
    "across engines without shipping text through the compare).  The "
    "frequency side shuffles only (source, hash32) keys; the text "
    "rides exactly ONE doc_id-keyed join into the per-doc "
    "reconstruction — unavoidable for a rewrite operator whose OUTPUT "
    "is the text",
    tags=("curation", "text"),
)
def curation_boilerplate_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_dns_spark.functions.dnsfn import portable_hash32

    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("t")
    )
    # persist at the fan-out: the tokenize→shingle→md5 pipeline is an
    # interpreted HOF chain that projection-collapse would duplicate
    # into all three consumers below (dist / pos / the final rebuild)
    # — the q_dedup._signatures_of lesson.  Released by the consuming
    # harness / the next catalog entry's release_all_caches.
    hs = toks.select(
        "doc_id",
        "source",
        "t",
        F.transform(
            dd.word_shingles("t", BOILER_N), portable_hash32
        ).alias("ha"),
    ).persist()
    dist = hs.select(
        "doc_id", "source", F.explode(F.array_distinct("ha")).alias("h")
    )
    boiler = (
        dist.groupBy("source", "h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= BOILER_MIN_DOCS)
        .select("source", "h")
    )
    pos = hs.select(
        "doc_id", "source", F.posexplode("ha").alias("i0", "h")
    ).select("doc_id", "source", (F.col("i0") + 1).alias("sp"), "h")
    starts = pos.join(boiler, ["source", "h"]).select("doc_id", "sp")
    covered = (
        starts.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("sp"), F.col("sp") + (BOILER_N - 1))
            ).alias("wp"),
        )
        .distinct()
    )
    cov = covered.groupBy("doc_id").agg(F.collect_list("wp").alias("cov"))
    clean = hs.select("doc_id", "t").join(cov, "doc_id", "left").select(
        "doc_id",
        F.size("t").cast("long").alias("n_words"),
        F.expr(
            "filter(transform(sequence(1, size(t)), "
            "p -> CASE WHEN cov IS NOT NULL AND array_contains(cov, p) "
            "THEN NULL ELSE element_at(t, p) END), x -> x IS NOT NULL)"
        ).alias("kept"),
    )
    return clean.select(
        "doc_id",
        "n_words",
        F.size("kept").cast("long").alias("n_kept"),
        F.md5(F.array_join("kept", " ")).alias("clean_digest"),
    )
