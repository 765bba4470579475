"""Dedup queries over ``documents`` — exact, fingerprint, MinHash+LSH,
SimHash, and brute-force n-gram Jaccard, each with a bit-exact DuckDB
oracle (portable md5-based hashing, SURVEY.md build-plan M5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.functions.dnsfn import portable_hash60
from spark_dns_spark.operators import dedup as dd
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.session import load_table

NUM_HASHES = 12
ROWS_PER_BAND = 2
NUM_BANDS = NUM_HASHES // ROWS_PER_BAND
SHINGLE_N = 5
JACCARD_T = 0.5

#: Shared DuckDB CTE: tokens → shingles → minhash signature per doc.
_SIG_CTE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), shingled AS (
  SELECT doc_id, {dd.word_shingles_sql("t", SHINGLE_N)} AS sh FROM toks
), sig AS (
  SELECT doc_id, sh, {", ".join(dd.minhash_signature_sql("sh", NUM_HASHES))}
  FROM shingled WHERE len(sh) > 0
)
"""


def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", dd.word_shingles("text", SHINGLE_N).alias("sh")
    ).filter(F.size("sh") > 0)
    return sh.select("doc_id", "sh", *dd.minhash_signature(F.col("sh"), NUM_HASHES))


@register(
    "dedup_exact_documents",
    """
SELECT canonical_id, n_copies FROM (
  SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
  FROM documents GROUP BY md5(text)
)
""",
    doc="exact dedup: content-digest groupBy, canonical = min id",
    tags=("dedup",),
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(docs, "text", "doc_id")


@register(
    "dedup_minhash_signatures",
    _SIG_CTE
    + f"""
SELECT doc_id, {", ".join(f"mh{k}" for k in range(NUM_HASHES))} FROM sig
""",
    doc="MinHash signatures (K=12) — map-only, bit-exact vs the oracle",
    tags=("dedup", "minhash"),
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _signatures(spark, sf_dir).drop("sh")


@register(
    "dedup_minhash_lsh",
    _SIG_CTE
    + f"""
, banded AS (
  SELECT doc_id, band_idx,
         mhs[band_idx*{ROWS_PER_BAND}+1] || ',' || mhs[band_idx*{ROWS_PER_BAND}+2]
           AS band_key
  FROM (
    SELECT doc_id,
           [{", ".join(f"CAST(mh{k} AS VARCHAR)" for k in range(NUM_HASHES))}] AS mhs
    FROM sig
  ), (SELECT unnest(generate_series(0, {NUM_BANDS - 1})) AS band_idx)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, round(jac, 4) AS jaccard FROM (
  SELECT id_a, id_b,
         CAST(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh))) AS DOUBLE)
         / (len(list_distinct(sa.sh)) + len(list_distinct(sb.sh))
            - len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh)))) AS jac
  FROM cand
  JOIN shingled sa ON sa.doc_id = id_a
  JOIN shingled sb ON sb.doc_id = id_b
) WHERE jac >= {JACCARD_T}
""",
    doc="near-dup dedup: MinHash signature → LSH banding (b=6,r=2) → "
    "bucket-join candidates → exact-Jaccard verification ≥ 0.5; "
    "never all-pairs (the 100 TB scale path)",
    tags=("dedup", "minhash", "lsh", "bench"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _signatures(spark, sf_dir).select(
        "doc_id", "sh", *dd.band_keys(NUM_HASHES, ROWS_PER_BAND)
    )
    cand = dd.lsh_candidates(sig, "doc_id", NUM_BANDS)
    sh = sig.select("doc_id", "sh")
    pairs = (
        cand.join(sh.withColumnRenamed("doc_id", "id_a").alias("sa"), "id_a")
        .join(
            sh.withColumnRenamed("doc_id", "id_b")
            .withColumnRenamed("sh", "sh_b")
            .alias("sb"),
            "id_b",
        )
        .withColumn("jaccard", F.round(dd.jaccard(F.col("sh"), F.col("sh_b")), 4))
        .filter(F.col("jaccard") >= JACCARD_T)
    )
    return pairs.select("id_a", "id_b", "jaccard")


@register(
    "dedup_ngram_jaccard",
    _SIG_CTE
    + f"""
, pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
  FROM (SELECT doc_id, unnest(list_distinct(sh)) AS s FROM shingled) a
  JOIN (SELECT doc_id, unnest(list_distinct(sh)) AS s FROM shingled) b
    ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(jac, 4) AS jaccard FROM (
  SELECT id_a, id_b,
         CAST(n_shared AS DOUBLE)
         / (len(list_distinct(sa.sh)) + len(list_distinct(sb.sh)) - n_shared) AS jac
  FROM pairs
  JOIN shingled sa ON sa.doc_id = id_a
  JOIN shingled sb ON sb.doc_id = id_b
) WHERE jac >= {JACCARD_T}
""",
    doc="brute-force n-gram Jaccard near-dup (shingle equi-join, no LSH) — "
    "the exact baseline the LSH path approximates; quadratic in shared "
    "shingles, test-SF only",
    tags=("dedup", "ngram"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.array_distinct(dd.word_shingles("text", SHINGLE_N)).alias("sh"),
    ).filter(F.size("sh") > 0)
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    pairs = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    out = (
        pairs.join(sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_shared")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_T)
    )
    return out.select("id_a", "id_b", "jaccard")


@register(
    "dedup_simhash",
    """
WITH toks AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM documents
), th AS (
  SELECT doc_id,
         list_transform(t, w -> CAST('0x' || substr(md5(w), 1, 15) AS BIGINT)) AS hs
  FROM toks WHERE len(t) > 0
), sh AS (
  SELECT doc_id, {SIMHASH} AS simhash FROM th
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sh a JOIN sh b
  ON a.doc_id < b.doc_id
 AND (
      (a.simhash >> 45) = (b.simhash >> 45)
   OR ((a.simhash >> 30) & 32767) = ((b.simhash >> 30) & 32767)
   OR ((a.simhash >> 15) & 32767) = ((b.simhash >> 15) & 32767)
   OR (a.simhash & 32767) = (b.simhash & 32767)
 )
WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
""".replace(
        "{SIMHASH}", dd.simhash64_sql("hs")
    ),
    doc="SimHash near-dup: 60-bit majority fingerprint, 4×15-bit band "
    "bucketing (any band equal ⇒ candidate), hamming ≤ 8 verification",
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    th = docs.select(
        "doc_id",
        F.transform(
            F.array_distinct(F.split("text", " ")), lambda w: portable_hash60(w)
        ).alias("hs"),
    ).filter(F.size("hs") > 0)
    sh = th.select("doc_id", dd.simhash64(F.col("hs")).alias("simhash"))
    a, b = sh.alias("a"), sh.alias("b")
    sa, sb = F.col("a.simhash"), F.col("b.simhash")
    band_match = (
        (F.shiftright(sa, 45) == F.shiftright(sb, 45))
        | (F.shiftright(sa, 30).bitwiseAND(F.lit(32767))
           == F.shiftright(sb, 30).bitwiseAND(F.lit(32767)))
        | (F.shiftright(sa, 15).bitwiseAND(F.lit(32767))
           == F.shiftright(sb, 15).bitwiseAND(F.lit(32767)))
        | (sa.bitwiseAND(F.lit(32767)) == sb.bitwiseAND(F.lit(32767)))
    )
    return (
        a.join(b, (F.col("a.doc_id") < F.col("b.doc_id")) & band_match)
        .withColumn("hamming", dd.hamming60(sa, sb))
        .filter(F.col("hamming") <= 8)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            "hamming",
        )
    )
