"""Dedup queries over ``documents`` — exact, fingerprint, MinHash+LSH,
SimHash, and brute-force n-gram Jaccard, each with a bit-exact DuckDB
oracle (portable md5-based hashing, SURVEY.md build-plan M5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.functions.dnsfn import (
    portable_hash32_sql,
    portable_hash60,
    portable_hash60_sql,
)
from spark_dns_spark.operators import dedup as dd
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.session import load_table, spread

NUM_HASHES = 12
ROWS_PER_BAND = 2
NUM_BANDS = NUM_HASHES // ROWS_PER_BAND
SHINGLE_N = 5
JACCARD_T = 0.5

#: Shared DuckDB CTE: tokens → shingles → ONE 32-bit hash per shingle →
#: K affine-reseeded minhashes (mirrors shingle_hashes +
#: minhash_signature exactly; dedup.py MINHASH_P rationale).
_SIG_CTE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), shingled AS (
  SELECT doc_id, {dd.word_shingles_sql("t", SHINGLE_N)} AS sh FROM toks
), hashed AS (
  SELECT doc_id,
         list_distinct(list_transform(sh, s -> {portable_hash32_sql("s")})) AS hs
  FROM shingled WHERE len(sh) > 0
), sig AS (
  SELECT doc_id, hs, {", ".join(dd.minhash_signature_sql("hs", NUM_HASHES))}
  FROM hashed
)
"""


def _signatures(
    spark: SparkSession, sf_dir: str, where: F.Column | None = None
) -> DataFrame:
    """(doc_id, hs, mh0..mhK) — one md5 per shingle, K affine reseeds.

    ``hs`` (the distinct shingle-hash set) doubles as the exact-Jaccard
    verification payload, so raw text never enters any join.
    ``where`` restricts the scan BEFORE tokenization (pushed to the
    parquet read), so the incremental path's signature cost is
    proportional to the batch, not the corpus."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    if where is not None:
        docs = docs.filter(where)
    return _signatures_of(docs)


def _signatures_of(
    docs: DataFrame, caches: list[DataFrame] | None = None
) -> DataFrame:
    """The tokenize→shingle→hash→sign pipeline over an arbitrary
    (doc_id, text) relation — also the per-micro-batch stage of the
    streaming incremental path (it is a stateless map, so it runs
    unchanged inside foreachBatch).  The internal cache is normally
    released by the catalog wrapper's release_all_caches safety net at
    the NEXT query entry; callers that invoke this repeatedly WITHIN
    one query (foreachBatch) pass ``caches`` to collect the persisted
    frame and unpersist it per batch."""
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    sh = toks.select("doc_id", dd.word_shingles("t", SHINGLE_N).alias("sh"))
    # persist BEFORE the filter and the 12-way signature fan-out:
    # interpreted higher-order expressions get duplicated into every
    # consumer by filter-pushdown/projection-collapse, so without this
    # cache the tokenize→shingle→md5 pipeline re-runs per consumer.
    hs = sh.select("doc_id", dd.shingle_hashes(F.col("sh")).alias("hs")).persist()
    if caches is not None:
        caches.append(hs)
    return hs.filter(F.size("hs") > 0).select(
        "doc_id", "hs", *dd.minhash_signature("hs", NUM_HASHES)
    )


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
    doc="MinHash signatures (K=12, affine-reseeded from one md5/shingle) "
    "— map-only, bit-exact vs the oracle",
    tags=("dedup", "minhash"),
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _signatures(spark, sf_dir).drop("hs")


#: Full LSH near-dup SQL, exported so the cluster-assignment query can
#: embed it as a CTE subquery (q_cluster.py).
MINHASH_LSH_SQL = (
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
         CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
         / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jac
  FROM cand
  JOIN sig sa ON sa.doc_id = id_a
  JOIN sig sb ON sb.doc_id = id_b
) WHERE jac >= {JACCARD_T}
"""
)


@register(
    "dedup_minhash_lsh",
    MINHASH_LSH_SQL,
    doc="near-dup dedup: MinHash signature → LSH banding (b=6,r=2) → "
    "bucket-join candidates → exact-Jaccard verification ≥ 0.5 over the "
    "shingle-hash sets; never all-pairs (the 100 TB scale path)",
    tags=("dedup", "minhash", "lsh", "bench"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist(): the signature lineage fans out to three plan branches
    # (bucket self-join ×2 + verification); without the cache the whole
    # tokenize→shingle→hash scan re-runs per branch — at 100 TB this is
    # written to a staging table instead, same idea.
    sig = (
        _signatures(spark, sf_dir)
        .select("doc_id", "hs", *dd.band_keys(NUM_HASHES, ROWS_PER_BAND))
        .persist()
    )
    cand = dd.lsh_candidates(sig, "doc_id", NUM_BANDS)
    hs = sig.select("doc_id", "hs")
    pairs = (
        cand.join(hs.withColumnRenamed("doc_id", "id_a").alias("sa"), "id_a")
        .join(
            hs.withColumnRenamed("doc_id", "id_b")
            .withColumnRenamed("hs", "hs_b")
            .alias("sb"),
            "id_b",
        )
        .withColumn("jaccard", F.round(dd.jaccard(F.col("hs"), F.col("hs_b")), 4))
        .filter(F.col("jaccard") >= JACCARD_T)
    )
    return pairs.select("id_a", "id_b", "jaccard")


#: Incremental-batch membership: doc_id % 10 == 7 is "the new crawl
#: batch", everything else is "the already-indexed corpus".
BATCH_MOD, BATCH_REM = 10, 7

#: process-lifetime cache of built corpus signature indexes —
#: build-once/query-many, exactly like a production pipeline that
#: maintains the index as a table between crawl batches; lock +
#: source-mtime keyed via feeds.cached_index_path (ADVICE r8).
_MINHASH_INDEX: dict = {}


def minhash_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per sf) the persisted corpus MinHash
    index: ``bands/`` (doc_id, band_idx, band_key) and ``sigs/``
    (doc_id, hs) parquet tables for all NON-batch docs."""

    def build(root: str) -> None:
        corpus = _signatures(
            spark, sf_dir,
            where=F.col("doc_id") % BATCH_MOD != BATCH_REM,
        ).persist()
        bands = corpus.select(
            "doc_id", *dd.band_keys(NUM_HASHES, ROWS_PER_BAND)
        )
        exploded = bands.select(
            "doc_id",
            F.posexplode(
                F.array(*[F.col(f"band{b}") for b in range(NUM_BANDS)])
            ).alias("band_idx", "band_key"),
        )
        exploded.write.mode("overwrite").parquet(f"{root}/bands")
        corpus.select("doc_id", "hs").write.mode("overwrite").parquet(
            f"{root}/sigs"
        )
        corpus.unpersist()

    from spark_dns_spark.plans.feeds import cached_index_path  # noqa: PLC0415

    return cached_index_path(
        _MINHASH_INDEX, sf_dir, "documents.parquet", build,
        name="minhash",
    )


_MINHASH_INCR_SQL = (
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
SELECT id_a, id_b, round(jac, 4) AS jaccard,
       CASE WHEN id_a % {BATCH_MOD} = {BATCH_REM}
             AND id_b % {BATCH_MOD} = {BATCH_REM}
            THEN 'new_new' ELSE 'new_corpus' END AS pair_kind
FROM (
  SELECT id_a, id_b,
         CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
         / (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jac
  FROM cand
  JOIN sig sa ON sa.doc_id = id_a
  JOIN sig sb ON sb.doc_id = id_b
) WHERE jac >= {JACCARD_T}
  AND (id_a % {BATCH_MOD} = {BATCH_REM} OR id_b % {BATCH_MOD} = {BATCH_REM})
"""
)


@register(
    "dedup_minhash_incremental",
    _MINHASH_INCR_SQL,
    doc="INCREMENTAL near-dup dedup (VERDICT-r7 item 4): the corpus's "
    "signature+band tables are a persisted parquet index (built once "
    "per process, minhash_index_path); a new crawl batch (doc_id%10==7) "
    "computes signatures for ITS docs only, band-joins against the "
    "index (new-vs-corpus) and itself (new-vs-new), then verifies "
    "exact Jaccard >= 0.5.  Batch cost is proportional to the delta: "
    "the corpus text is never re-tokenized, the only corpus reads are "
    "one scan of each skinny index table (asserted in "
    "tests/test_incremental_minhash.py).  Oracle = the full-corpus LSH "
    "pairs restricted to pairs touching the batch",
    tags=("dedup", "minhash", "lsh", "incremental"),
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = minhash_index_path(spark, sf_dir)
    idx_bands = spark.read.parquet(f"{root}/bands")
    idx_sigs = spark.read.parquet(f"{root}/sigs")

    # Δ only: the predicate is pushed into the parquet scan, so this
    # lineage never touches corpus text.  persist(): fans out to the
    # two candidate joins + verification.
    delta = (
        _signatures(
            spark, sf_dir, where=F.col("doc_id") % BATCH_MOD == BATCH_REM
        )
        .select("doc_id", "hs", *dd.band_keys(NUM_HASHES, ROWS_PER_BAND))
        .persist()
    )
    return _probe_index_pairs(delta, idx_bands, idx_sigs).unionByName(
        _batch_self_pairs(delta)
    )


def _pair_kind(id_a, id_b) -> F.Column:
    """'new_new' iff BOTH ids are batch docs — derived from the ids so
    the same probe serves the base-corpus index (always new_corpus)
    and a streaming run's accumulated-new index (new_new when the
    partner arrived in an earlier micro-batch)."""
    return F.when(
        ((id_a % BATCH_MOD) == BATCH_REM) & ((id_b % BATCH_MOD) == BATCH_REM),
        F.lit("new_new"),
    ).otherwise(F.lit("new_corpus"))


def _probe_index_pairs(
    delta: DataFrame, idx_bands: DataFrame, idx_sigs: DataFrame
) -> DataFrame:
    """Band-probe a persisted (bands, sigs) index with the delta's
    signatures and verify exact Jaccard.  Shuffle keys are (band_idx,
    band_key); at 100 TB the index is bucketed on them so the probe
    co-locates without a corpus-side shuffle."""
    d_bands = delta.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"band{b}") for b in range(NUM_BANDS)])
        ).alias("band_idx", "band_key"),
    )
    d_hs = delta.select("doc_id", "hs")
    cand = (
        d_bands.alias("d")
        .join(idx_bands.alias("i"), ["band_idx", "band_key"])
        .select(
            F.col("d.doc_id").alias("did"), F.col("i.doc_id").alias("cid")
        )
        .distinct()
    )
    return (
        cand.join(d_hs.withColumnRenamed("doc_id", "did"), "did")
        .join(
            idx_sigs.withColumnRenamed("doc_id", "cid")
            .withColumnRenamed("hs", "hs_c"),
            "cid",
        )
        .withColumn(
            "jaccard", F.round(dd.jaccard(F.col("hs"), F.col("hs_c")), 4)
        )
        .filter(F.col("jaccard") >= JACCARD_T)
        .select(
            F.least("did", "cid").alias("id_a"),
            F.greatest("did", "cid").alias("id_b"),
            "jaccard",
            _pair_kind(F.least("did", "cid"), F.greatest("did", "cid")).alias(
                "pair_kind"
            ),
        )
    )


def _batch_self_pairs(delta: DataFrame) -> DataFrame:
    """LSH self-join within one batch of signatures (new-vs-new)."""
    d_hs = delta.select("doc_id", "hs")
    cand_nn = dd.lsh_candidates(delta, "doc_id", NUM_BANDS)
    return (
        cand_nn.join(d_hs.withColumnRenamed("doc_id", "id_a"), "id_a")
        .join(
            d_hs.withColumnRenamed("doc_id", "id_b")
            .withColumnRenamed("hs", "hs_b"),
            "id_b",
        )
        .withColumn(
            "jaccard", F.round(dd.jaccard(F.col("hs"), F.col("hs_b")), 4)
        )
        .filter(F.col("jaccard") >= JACCARD_T)
        .select(
            "id_a", "id_b", "jaccard", F.lit("new_new").alias("pair_kind")
        )
    )


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
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    sh = (
        toks.select(
            "doc_id",
            F.array_distinct(dd.word_shingles("t", SHINGLE_N)).alias("sh"),
        )
        .persist()  # 4 consumers below (explode ×2, verify ×2)
        .filter(F.size("sh") > 0)
    )
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
), bands AS (
  SELECT doc_id, simhash, i AS band_idx,
         CASE WHEN i = 0 THEN simhash >> 40
              WHEN i = 1 THEN (simhash >> 20) & 1048575
              ELSE simhash & 1048575 END AS band_val
  FROM sh, (SELECT unnest(generate_series(0, 2)) AS i)
)
SELECT DISTINCT id_a, id_b, hamming FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
) WHERE hamming <= 8
""".replace(
        "{SIMHASH}", dd.simhash64_sql("hs")
    ),
    doc="SimHash near-dup: 60-bit majority fingerprint, 3×20-bit bands "
    "exploded to (band_idx, band_val) rows and equi-joined (any shared "
    "band ⇒ candidate), hamming ≤ 8 verification computed INLINE on the "
    "join output (the simhash rides through the explode), so no "
    "second-stage fetch joins and the DISTINCT runs on the post-filter "
    "survivors only.  20-bit bands keep random-collision candidates at "
    "O(n²/2²⁰) per band — 32× fewer than the r2 15-bit layout; at a "
    "larger corpus, widen bands so log2(bucket space) tracks ~2·log2(n). "
    "Recall: any pair with ≤ 2 flipped bits shares a band by pigeonhole "
    "(3 bands); beyond that, banding recall is probabilistic — the "
    "precision-oriented setting for near-dup removal",
    tags=("dedup", "simhash", "bench"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    th = docs.select(
        "doc_id",
        F.transform(
            F.array_distinct(F.split("text", " ")), lambda w: portable_hash60(w)
        ).alias("hs"),
    ).filter(F.size("hs") > 0)
    # explode + codegen hash-agg (simhash_agg) instead of 60 interpreted
    # array traversals — the simhash compute was 80% of this query's
    # wall-clock; persist() because the result feeds both sides of the
    # band self-join.
    sh = dd.simhash_agg(th, "doc_id", "hs").persist()
    m = F.lit(1048575)  # 2^20 - 1
    bands = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                F.shiftright("simhash", 40),
                F.shiftright("simhash", 20).bitwiseAND(m),
                F.col("simhash").bitwiseAND(m),
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")

    def _b0(c):
        return F.shiftright(c, 40)

    def _b1(c):
        return F.shiftright(c, 20).bitwiseAND(m)

    # A pair sharing k bands would surface k times; instead of a
    # DISTINCT shuffle over the (large) survivor set, keep each pair
    # only at its FIRST shared band — both sides carry the simhash, so
    # "every earlier band differs" is a few inline bit ops inside the
    # same codegen stage.  Identical result set, one less wide shuffle.
    first_shared_band = (
        F.when(F.col("a.band_idx") == 0, F.lit(True))
        .when(
            F.col("a.band_idx") == 1,
            _b0(F.col("a.simhash")) != _b0(F.col("b.simhash")),
        )
        .otherwise(
            (_b0(F.col("a.simhash")) != _b0(F.col("b.simhash")))
            & (_b1(F.col("a.simhash")) != _b1(F.col("b.simhash")))
        )
    )
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(first_shared_band)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            dd.hamming60(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= 8)
    )


#: Sorted-neighborhood parameters: comparison window and the integer
#: Jaccard report threshold (per-mille; filter is cross-multiplied so
#: no float division anywhere).
SNM_W = 4
SNM_T_PM = 200
#: Max sort-key buckets per language for the distributed ranking.
SNM_NB = 64


#: Shared DuckDB CTE chain for the sorted-neighborhood candidate pairs
#: — ends in a ``snm`` relation (doc_a, doc_b, rank_gap, jaccard_x1000)
#: so the entity-resolution pipeline can build on the SAME oracle text.
SNM_CTES = f"""
snm_toks AS (
  SELECT doc_id, lang, n_chars,
         list_distinct(string_split(text, ' ')) AS tok
  FROM documents
), snm_ranked AS (
  SELECT doc_id, tok,
         ROW_NUMBER() OVER (ORDER BY lang, n_chars, doc_id) AS rnk
  FROM snm_toks
), snm_cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.rnk AS rnk_a, b.rnk AS rnk_b,
         CAST(b.rnk - a.rnk AS BIGINT) AS rank_gap,
         len(list_intersect(a.tok, b.tok)) AS ni,
         len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok)) AS nu
  FROM snm_ranked a JOIN snm_ranked b ON b.rnk - a.rnk BETWEEN 1 AND {SNM_W}
), snm AS (
  SELECT doc_a, doc_b, rnk_a, rnk_b, rank_gap,
         CAST((1000 * ni) // nu AS BIGINT) AS jaccard_x1000
  FROM snm_cand WHERE 1000 * ni >= {SNM_T_PM} * nu
)"""


def snm_ranked_pairs(spark: SparkSession, sf_dir: str):
    """Shared sorted-neighborhood machinery: the distributed global
    ranking and the Jaccard-thresholded neighbor pairs WITH their
    ranks — consumed by both the pair query and the sweep-line
    component query.

    Returns ``(ranked, pairs)``: ``ranked`` is (doc_id, rnk) from the
    two-level distributed prefix count (within-bucket row_number + a
    broadcast bucket-offset table — the oracle's single-partition
    ROW_NUMBER window is the semantic spec, not the plan); ``pairs``
    is (doc_a, doc_b, rnk_a, rnk_b, rank_gap, jaccard_x1000) built by
    the 2-bucket-explode neighbor join + exact token-set Jaccard with
    an integer cross-multiplied threshold.  Ranking runs on SKINNY
    columns; token arrays join back by doc_id afterwards so text never
    rides the ranking shuffles.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    skinny = docs.select("doc_id", "lang", "n_chars")

    # bucket span from a footer-cheap min/max agg (q_packing's move);
    # buckets are ordered ranges of the sort key, so cross-bucket
    # concatenation preserves the total (lang, n_chars, doc_id) order
    lo, hi = skinny.agg(F.min("n_chars"), F.max("n_chars")).first()
    span = ((int(hi) - int(lo)) // SNM_NB + 1) if hi is not None else 1
    b = skinny.withColumn(
        "bin", F.expr(f"(n_chars - {int(lo or 0)}) div {span}")
    )

    w_in = Window.partitionBy("lang", "bin").orderBy("n_chars", "doc_id")
    within = b.withColumn("within", F.row_number().over(w_in))

    # the only global window runs over the <= 5*NB-row bucket totals,
    # then broadcasts back (two-level prefix count)
    w_pre = Window.orderBy("lang", "bin").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = (
        b.groupBy("lang", "bin")
        .agg(F.count("*").alias("tot"))
        .withColumn("prefix", F.coalesce(F.sum("tot").over(w_pre), F.lit(0)))
        .select("lang", "bin", "prefix")
    )
    ranked = (
        within.join(F.broadcast(prefix), ["lang", "bin"])
        .select("doc_id", (F.col("prefix") + F.col("within")).alias("rnk"))
    )

    # candidate pairs: rank distance in [1, W] via 2-bucket explode —
    # blocks of width W; a pair within W spans adjacent blocks only
    left = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("rnk").alias("rnk_a"),
        F.explode(
            F.array(
                F.expr(f"rnk div {SNM_W}"), F.expr(f"rnk div {SNM_W} + 1")
            )
        ).alias("jblock"),
    )
    right = ranked.select(
        F.col("doc_id").alias("doc_b"),
        F.col("rnk").alias("rnk_b"),
        F.expr(f"rnk div {SNM_W}").alias("jblock"),
    )
    cand = (
        left.join(right, "jblock")
        .filter(
            (F.col("rnk_b") - F.col("rnk_a") >= 1)
            & (F.col("rnk_b") - F.col("rnk_a") <= SNM_W)
        )
        .select(
            "doc_a",
            "doc_b",
            "rnk_a",
            "rnk_b",
            (F.col("rnk_b") - F.col("rnk_a")).cast("long").alias("rank_gap"),
        )
    )

    tok = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tok")
    )
    ta = tok.select(
        F.col("doc_id").alias("doc_a"), F.col("tok").alias("tok_a")
    )
    tb = tok.select(
        F.col("doc_id").alias("doc_b"), F.col("tok").alias("tok_b")
    )
    ni = F.size(F.array_intersect("tok_a", "tok_b"))
    nu = F.size("tok_a") + F.size("tok_b") - ni
    pairs = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("ni", ni)
        .withColumn("nu", nu)
        .filter(F.lit(1000) * F.col("ni") >= SNM_T_PM * F.col("nu"))
        .select(
            "doc_a",
            "doc_b",
            "rnk_a",
            "rnk_b",
            "rank_gap",
            F.expr("(1000 * ni) div nu").cast("long").alias("jaccard_x1000"),
        )
    )
    return ranked, pairs


@register(
    "dedup_sorted_neighborhood",
    "WITH " + SNM_CTES + "\nSELECT doc_a, doc_b, rank_gap, jaccard_x1000 FROM snm",
    doc="sorted-neighborhood dedup (the blocking method that needs NO "
    "hashing): docs globally ranked by (lang, n_chars, doc_id) via the "
    "two-level distributed prefix count, candidate pairs = rank "
    "distance <= 4 via the 2-bucket-explode equi-join idiom shared "
    "with range_join_bucketed, then exact token-set Jaccard (integer "
    "cross-multiplied filter); machinery shared with the sweep-line "
    "component query (snm_ranked_pairs)",
    tags=("dedup", "similarity", "window"),
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, pairs = snm_ranked_pairs(spark, sf_dir)
    return pairs.select("doc_a", "doc_b", "rank_gap", "jaccard_x1000")


# ---------------------------------------------------------------------------
# Exact-substring (span) dedup — the Lee et al. 2022 "Deduplicating
# Training Data Makes Language Models Better" family: find every
# W-token span whose exact text occurs earlier in the corpus (global
# first occurrence keeps it; position order = (doc_id, pos)), merge
# overlapping/adjacent duplicate spans per doc into maximal removed
# regions (the sweep-line islands idiom shared with
# dedup_snm_span_clusters), and account removal per document.
#
# Scale shape: the corpus text never shuffles — the W-gram is hashed
# map-side to a 60-bit key, so the first-occurrence ranking shuffles
# only (h, doc_id, pos) 24-byte rows (O(corpus tokens)); the island
# merge shuffles the per-doc duplicate spans (skinny ints).  At 100 TB
# this is one hash-keyed exchange + one doc-keyed exchange, no
# self-join of documents.  A 2^-60 hash collision would mark a span
# duplicate spuriously; at n = 10^12 shingles the expected collision
# count is ~0.4 — the same md5-keyed trade every family here makes.

W_SUB = 10  #: span width in whitespace tokens (docs are 10..100 tokens)

#: Shared CTE prefix: shingle hash -> global first occurrence -> the
#: duplicate-span relation ``dup(doc_id, pos, fin)``.  ONE definition
#: for both the accounting and the apply query, so the first-occurrence
#: rule can never silently desynchronize between them.
_SUBSTR_DUP_CTES = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS arr FROM documents
), sh AS (
  SELECT doc_id, i AS pos,
         {portable_hash60_sql(f"list_aggregate(arr[i:i+{W_SUB}-1], 'string_agg', ' ')")} AS h
  FROM w, LATERAL unnest(generate_series(1, len(arr) - {W_SUB} + 1)) s(i)
), occ AS (
  SELECT doc_id, pos, pos + {W_SUB} - 1 AS fin,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM sh
), dup AS (
  SELECT doc_id, pos, fin FROM occ WHERE rn > 1
)
"""

_SUBSTR_SQL = (
    _SUBSTR_DUP_CTES
    + f"""
, isl AS (
  SELECT doc_id, pos, fin,
         sum(CASE WHEN prev_fin IS NULL OR pos > prev_fin + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM (
    SELECT doc_id, pos, fin,
           max(fin) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_fin
    FROM dup
  )
), reg AS (
  SELECT doc_id, island, min(pos) AS rs, max(fin) AS re
  FROM isl GROUP BY doc_id, island
), acct AS (
  SELECT doc_id, count(*) AS dup_regions, sum(re - rs + 1) AS dup_tokens
  FROM reg GROUP BY doc_id
)
SELECT d.doc_id,
       len(string_split(d.text, ' '))::BIGINT AS n_tokens,
       coalesce(a.dup_regions, 0)::BIGINT AS dup_regions,
       coalesce(a.dup_tokens, 0)::BIGINT AS dup_tokens,
       (len(string_split(d.text, ' ')) - coalesce(a.dup_tokens, 0))::BIGINT
         AS keep_tokens
FROM documents d LEFT JOIN acct a USING (doc_id)
"""
)


@register(
    "dedup_exact_substring",
    _SUBSTR_SQL,
    doc=f"exact-substring span dedup (Lee et al. 2022 style): every "
    f"{W_SUB}-token span hashed map-side to a 60-bit key, global "
    "first occurrence (doc_id, pos) kept, later occurrences merged "
    "into maximal per-doc removal regions via sweep-line islands; "
    "per-doc accounting (regions, removed tokens, kept tokens) — the "
    "one major public dedup family the repo lacked (VERDICT-r6 item 4)",
    tags=("dedup", "text", "window"),
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    arr = docs.select(
        "doc_id", F.split("text", " ").alias("arr")
    ).persist()
    # NB: F.sequence(1, n) DESCENDS when n < 1 — guard short docs out
    # before building shingle positions.
    sh = (
        arr.filter(F.size("arr") >= W_SUB)
        .select(
            "doc_id",
            "arr",
            F.explode(
                F.sequence(F.lit(1), F.size("arr") - F.lit(W_SUB - 1))
            ).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            portable_hash60(
                F.array_join(F.slice("arr", F.col("pos"), W_SUB), " ")
            ).alias("h"),
        )
    )
    wh = Window.partitionBy("h").orderBy("doc_id", "pos")
    dup = (
        sh.withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") > 1)
        .select("doc_id", "pos", (F.col("pos") + W_SUB - 1).alias("fin"))
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    isl = (
        dup.withColumn(
            "prev_fin",
            F.max("fin").over(wd.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "new_i",
            F.when(
                F.col("prev_fin").isNull()
                | (F.col("pos") > F.col("prev_fin") + 1),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("new_i").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    acct = (
        isl.groupBy("doc_id", "island")
        .agg(F.min("pos").alias("rs"), F.max("fin").alias("re"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("dup_regions"),
            F.sum(F.col("re") - F.col("rs") + 1).alias("dup_tokens"),
        )
    )
    return (
        arr.select("doc_id", F.size("arr").cast("long").alias("n_tokens"))
        .join(acct, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_regions", F.lit(0)).cast("long").alias(
                "dup_regions"
            ),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias(
                "dup_tokens"
            ),
            (
                F.col("n_tokens") - F.coalesce("dup_tokens", F.lit(0))
            ).cast("long").alias("keep_tokens"),
        )
    )


_SUBSTR_CLEAN_SQL = (
    _SUBSTR_DUP_CTES
    + f"""
, tok AS (
  SELECT doc_id, i AS pos, string_split(text, ' ')[i] AS word
  FROM documents,
       LATERAL unnest(generate_series(1, len(string_split(text, ' ')))) s(i)
), removed AS (
  SELECT DISTINCT t.doc_id, t.pos
  FROM tok t JOIN dup d
    ON d.doc_id = t.doc_id AND t.pos BETWEEN d.pos AND d.fin
), kept AS (
  SELECT t.doc_id, t.pos, t.word
  FROM tok t LEFT JOIN removed r ON r.doc_id = t.doc_id AND r.pos = t.pos
  WHERE r.pos IS NULL
)
SELECT d.doc_id,
       coalesce(k.clean_text, '') AS clean_text,
       coalesce(k.n_kept, 0)::BIGINT AS n_kept
FROM documents d
LEFT JOIN (
  SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
) k USING (doc_id)
"""
)


@register(
    "dedup_substring_clean",
    _SUBSTR_CLEAN_SQL,
    doc=f"exact-substring dedup APPLY side: rewrite each document with "
    f"its duplicate {W_SUB}-token spans removed (keep-first-occurrence "
    "semantics shared with dedup_exact_substring), emitting the "
    "cleaned text + kept-token count for every doc — the transform a "
    "training pipeline actually ships, not just the accounting.  The "
    "span->token expansion joins per-doc (skinny int ranges); text "
    "tokens only move in the per-doc reassembly shuffle",
    tags=("dedup", "text", "window"),
)
def dedup_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    arr = docs.select("doc_id", F.split("text", " ").alias("arr")).persist()
    sh = (
        arr.filter(F.size("arr") >= W_SUB)
        .select(
            "doc_id",
            "arr",
            F.explode(
                F.sequence(F.lit(1), F.size("arr") - F.lit(W_SUB - 1))
            ).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            portable_hash60(
                F.array_join(F.slice("arr", F.col("pos"), W_SUB), " ")
            ).alias("h"),
        )
    )
    wh = Window.partitionBy("h").orderBy("doc_id", "pos")
    dup = (
        sh.withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") > 1)
        .select(
            F.col("doc_id").alias("d_doc"),
            F.col("pos").alias("d_pos"),
            (F.col("pos") + W_SUB - 1).alias("d_fin"),
        )
    )
    tok = arr.select(
        "doc_id", F.posexplode("arr").alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    removed = (
        tok.select("doc_id", "pos")
        .join(
            dup,
            (F.col("d_doc") == F.col("doc_id"))
            & F.col("pos").between(F.col("d_pos"), F.col("d_fin")),
        )
        .select("doc_id", "pos")
        .distinct()
        .withColumn("rm", F.lit(1))
    )
    kept = (
        tok.join(removed, ["doc_id", "pos"], "left")
        .filter(F.col("rm").isNull())
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    return (
        arr.select("doc_id")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Entity-resolution scoring (Fellegi-Sunter shape): the step between
# candidate generation (SNM / LSH blocking) and clustering — per-pair
# FIELD-LEVEL evidence combined into an integer score and a
# match / possible / non_match decision.  Weights are fixed integer
# evidence values standing in for trained log-odds (the public F-S
# formulation learns them via EM; the plan shape — candidate pairs ⋈
# attribute table, map-only scoring — is identical either way).

#: agreement / disagreement weights (integer 'log-odds' stand-ins)
LNK_W = {
    "lang_agree": 3, "lang_dis": -1,
    "src_agree": 2, "src_dis": -1,
    "len_agree": 2, "len_dis": -1,
    "jac_strong": 8, "jac_weak": 3, "jac_dis": -4,
}
LNK_JAC_STRONG = 500  #: per-mille Jaccard for strong agreement
LNK_JAC_WEAK = 350  #: per-mille Jaccard for weak agreement
LNK_MATCH_T = 12  #: score >= T  -> match
LNK_POSSIBLE_T = 5  #: score >= T -> possible (clerical-review band)

_LINK_SCORE_SQL = f"""
  (CASE WHEN a.lang = b.lang THEN {LNK_W["lang_agree"]}
        ELSE {LNK_W["lang_dis"]} END)
+ (CASE WHEN a.source = b.source THEN {LNK_W["src_agree"]}
        ELSE {LNK_W["src_dis"]} END)
+ (CASE WHEN abs(a.n_chars - b.n_chars) * 10 <= greatest(a.n_chars, b.n_chars)
        THEN {LNK_W["len_agree"]} ELSE {LNK_W["len_dis"]} END)
+ (CASE WHEN jaccard_x1000 >= {LNK_JAC_STRONG} THEN {LNK_W["jac_strong"]}
        WHEN jaccard_x1000 >= {LNK_JAC_WEAK} THEN {LNK_W["jac_weak"]}
        ELSE {LNK_W["jac_dis"]} END)
"""


@register(
    "linkage_field_scores",
    "WITH "
    + SNM_CTES
    + f"""
, lk AS (
  SELECT s.doc_a, s.doc_b, s.jaccard_x1000,
         CAST({_LINK_SCORE_SQL} AS BIGINT) AS score
  FROM snm s
  JOIN documents a ON a.doc_id = s.doc_a
  JOIN documents b ON b.doc_id = s.doc_b
)
SELECT doc_a, doc_b, jaccard_x1000, score,
       CASE WHEN score >= {LNK_MATCH_T} THEN 'match'
            WHEN score >= {LNK_POSSIBLE_T} THEN 'possible'
            ELSE 'non_match' END AS decision
FROM lk
""",
    doc="entity-resolution scoring (Fellegi-Sunter shape): SNM "
    "candidate pairs scored field-by-field (lang / source / length "
    "within 10% / Jaccard bands) with integer evidence weights, "
    "classified into match / possible / non_match — the "
    "clerical-review triage between blocking and clustering; "
    "candidates x broadcast-attribute join, map-only scoring",
    tags=("dedup", "linkage", "mlprep"),
)
def linkage_field_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, pairs = snm_ranked_pairs(spark, sf_dir)
    attrs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    a = attrs.toDF("doc_a", "lang_a", "src_a", "len_a")
    b = attrs.toDF("doc_b", "lang_b", "src_b", "len_b")
    lk = (
        pairs.select("doc_a", "doc_b", "jaccard_x1000")
        .join(F.broadcast(a), "doc_a")
        .join(F.broadcast(b), "doc_b")
    )
    w = LNK_W
    score = (
        F.when(F.col("lang_a") == F.col("lang_b"), w["lang_agree"]).otherwise(
            w["lang_dis"]
        )
        + F.when(F.col("src_a") == F.col("src_b"), w["src_agree"]).otherwise(
            w["src_dis"]
        )
        + F.when(
            F.abs(F.col("len_a") - F.col("len_b")) * 10
            <= F.greatest("len_a", "len_b"),
            w["len_agree"],
        ).otherwise(w["len_dis"])
        + F.when(
            F.col("jaccard_x1000") >= LNK_JAC_STRONG, w["jac_strong"]
        )
        .when(F.col("jaccard_x1000") >= LNK_JAC_WEAK, w["jac_weak"])
        .otherwise(w["jac_dis"])
    ).cast("long")
    return (
        lk.withColumn("score", score)
        .withColumn(
            "decision",
            F.when(F.col("score") >= LNK_MATCH_T, "match")
            .when(F.col("score") >= LNK_POSSIBLE_T, "possible")
            .otherwise("non_match"),
        )
        .select("doc_a", "doc_b", "jaccard_x1000", "score", "decision")
    )


@register(
    "dedup_minhash_stream",
    _MINHASH_INCR_SQL,
    doc="the incremental near-dup path as a CONTINUOUS crawl pipeline "
    "with a SELF-UPDATING index: new documents arrive as a parquet "
    "file stream (two micro-batches under maxFilesPerTrigger=1); each "
    "micro-batch signs its docs (the stateless _signatures_of map), "
    "band-probes the persisted corpus index PLUS the accumulated "
    "index of earlier micro-batches, self-joins within the batch, "
    "emits verified pairs, and APPENDS its own bands/sigs to the "
    "accumulated index — so a pair spanning two micro-batches is "
    "found exactly once (when the later doc arrives) and labeled "
    "new_new from the ids.  All foreachBatch writes are IDEMPOTENT "
    "under the sink's at-least-once retry contract: pairs and index "
    "appendices land in per-batch subdirs with mode=overwrite, and a "
    "batch's probe excludes its own appendix — a retried batch "
    "rewrites its output instead of duplicating it.  Final pair set "
    "is byte-identical to the batch dedup_minhash_incremental, whose "
    "SQL is the oracle.  At "
    "100 TB this is daily-crawl dedup at micro-batch latency: "
    "per-batch cost is |batch| signing + skinny index probes, and "
    "the index grows by exactly the batch's bands",
    tags=("dedup", "minhash", "lsh", "incremental", "streaming"),
)
def dedup_minhash_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from spark_dns_spark.plans.feeds import (  # noqa: PLC0415
        await_or_fail,
        scratch_dir,
        single_part_file,
    )

    idx_root = minhash_index_path(spark, sf_dir)
    root = scratch_dir("minhash_stream_")
    src_dir = os.path.join(root, "src")
    os.makedirs(src_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    delta = docs.filter((F.col("doc_id") % BATCH_MOD) == BATCH_REM)
    for i, half in enumerate(
        (
            delta.filter(F.expr(f"(doc_id div {BATCH_MOD}) % 2 = 0")),
            delta.filter(F.expr(f"(doc_id div {BATCH_MOD}) % 2 = 1")),
        )
    ):
        part_dir = os.path.join(root, f"half{i}")
        half.coalesce(1).write.parquet(part_dir)
        part = single_part_file(part_dir, f"dedup_minhash_stream half{i}")
        dst = os.path.join(src_dir, f"{i:02d}_batch.parquet")
        shutil.copy(part, dst)
        mt = os.stat(dst).st_mtime
        os.utime(dst, (mt - 10 * (1 - i), mt - 10 * (1 - i)))

    out = os.path.join(root, "out")
    acc_bands = os.path.join(root, "acc_bands")
    acc_sigs = os.path.join(root, "acc_sigs")

    def _earlier(base_dir: str, batch_id: int) -> list[str]:
        """Subdirs of strictly earlier micro-batches — excluding the
        current batch_id makes a foreachBatch RETRY idempotent: the
        retried batch never probes its own (half-written) appendix,
        and every write below is an overwrite keyed by batch_id."""
        if not os.path.isdir(base_dir):
            return []
        return [
            os.path.join(base_dir, d)
            for d in sorted(os.listdir(base_dir))
            if d.startswith("b") and d != f"b{batch_id}"
        ]

    def process(batch_docs: DataFrame, batch_id: int) -> None:
        sp = batch_docs.sparkSession
        inner_caches: list[DataFrame] = []
        sigs = _signatures_of(batch_docs, caches=inner_caches).select(
            "doc_id", "hs", *dd.band_keys(NUM_HASHES, ROWS_PER_BAND)
        ).persist()
        idx_bands = sp.read.parquet(f"{idx_root}/bands")
        idx_sigs = sp.read.parquet(f"{idx_root}/sigs")
        prior_b = _earlier(acc_bands, batch_id)
        if prior_b:
            # earlier micro-batches' docs are index members too
            idx_bands = idx_bands.unionByName(sp.read.parquet(*prior_b))
            idx_sigs = idx_sigs.unionByName(
                sp.read.parquet(*_earlier(acc_sigs, batch_id))
            )
        pairs = _probe_index_pairs(sigs, idx_bands, idx_sigs).unionByName(
            _batch_self_pairs(sigs)
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(out, f"b{batch_id}")
        )
        # publish this batch to the accumulated index AFTER probing it
        sigs.select(
            "doc_id",
            F.posexplode(
                F.array(*[F.col(f"band{b}") for b in range(NUM_BANDS)])
            ).alias("band_idx", "band_key"),
        ).write.mode("overwrite").parquet(
            os.path.join(acc_bands, f"b{batch_id}")
        )
        sigs.select("doc_id", "hs").write.mode("overwrite").parquet(
            os.path.join(acc_sigs, f"b{batch_id}")
        )
        sigs.unpersist()
        for c in inner_caches:  # per-batch release: the catalog-entry
            c.unpersist()  # safety net can't run WITHIN an invocation

    physical = spark.read.parquet(src_dir).schema
    q = (
        spark.readStream.schema(physical)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(root, ".ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_fail(q, 300)
    batch_outs = [
        os.path.join(out, d)
        for d in sorted(os.listdir(out))
        if d.startswith("b")
    ] if os.path.isdir(out) else []
    if not batch_outs:
        return spark.createDataFrame(
            [],
            "id_a bigint, id_b bigint, jaccard double, pair_kind string",
        )
    return spark.read.parquet(*batch_outs)


# --- URL canonicalization dedup ---------------------------------------------

#: Path-id modulus for the synthetic URL (below): distinct docs of one
#: source sharing ``doc_id % URL_PATH_MOD`` are the SAME page fetched
#: under different raw URLs — the duplicate population.
URL_PATH_MOD = 100

#: The synthetic raw URL, derived deterministically from (doc_id,
#: source) — the feeds.py precedent (the testdata has no URL column).
#: Noise axes a crawler actually sees: scheme/host casing (%3, %2),
#: trailing slash (%4), utm tracking params (%5), fragment (%7).
_URL_SQL = """
CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'https://' END
|| CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
|| '.example.com/articles/' || CAST(doc_id % {mod} AS VARCHAR)
|| CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
|| CASE WHEN doc_id % 5 = 0
        THEN '?utm_source=feed&utm_id=' || CAST(doc_id AS VARCHAR)
        ELSE '' END
|| CASE WHEN doc_id % 7 = 0 THEN '#section2' ELSE '' END
""".format(mod=URL_PATH_MOD)


def _url_col() -> Column:
    """Spark mirror of :data:`_URL_SQL`."""
    return F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("HTTPS://")).otherwise(
            F.lit("https://")
        ),
        F.when(F.col("doc_id") % 2 == 0, F.upper("source")).otherwise(
            F.col("source")
        ),
        F.lit(".example.com/articles/"),
        (F.col("doc_id") % URL_PATH_MOD).cast("string"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit("?utm_source=feed&utm_id="),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#section2")).otherwise(
            F.lit("")
        ),
    )


@register(
    "dedup_url_canonical",
    f"""
WITH raw AS (
  SELECT doc_id, {_URL_SQL} AS url FROM documents
), nofrag AS (
  SELECT doc_id, string_split(url, '#')[1] AS u FROM raw
), noq AS (
  SELECT doc_id, string_split(u, '?')[1] AS u FROM nofrag
), split AS (
  SELECT doc_id,
         array_to_string(string_split(u, '/')[1:3], '/') AS pre,
         substr(u, len(array_to_string(string_split(u, '/')[1:3], '/')) + 1)
           AS rest
  FROM noq
), canon AS (
  SELECT doc_id, lower(pre) || rtrim(rest, '/') AS url_canonical FROM split
)
SELECT url_canonical,
       count(*) AS n_variants,
       min(doc_id) AS keep_doc_id,
       max(doc_id) AS max_doc_id
FROM canon
GROUP BY url_canonical
HAVING count(*) > 1
""",
    doc="URL canonicalization dedup — step 1 of a crawl pipeline, "
    "BEFORE any content hashing: lowercase scheme+host (never the "
    "path — paths are case-significant), strip the fragment, strip "
    "tracking query params, strip the trailing slash, then group on "
    "the canonical form (min-doc_id canonical representative, the "
    "exact-dedup convention).  Entirely map-side string expressions + "
    "ONE skinny-key aggregate on the canonical URL; at 100 TB this "
    "runs ahead of fetch/content dedup and its key cardinality is the "
    "distinct-page count, not the crawl-log size.  The raw URL is "
    "derived deterministically from (doc_id, source) with the noise "
    "axes a crawler sees (casing, utm params, fragments, trailing "
    "slashes) — the feeds.py synthetic-derivation precedent, the "
    "testdata has no URL column.",
    tags=("dedup", "curation", "text"),
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _url_col().alias("url")
    )
    nofrag = docs.select(
        "doc_id", F.substring_index("url", "#", 1).alias("u")
    )
    noq = nofrag.select(
        "doc_id", F.substring_index("u", "?", 1).alias("u")
    )
    split = noq.select(
        "doc_id",
        F.substring_index("u", "/", 3).alias("pre"),
        F.expr("substr(u, length(substring_index(u, '/', 3)) + 1)").alias(
            "rest"
        ),
    )
    canon = split.select(
        "doc_id",
        F.concat(F.lower("pre"), F.expr("rtrim('/', rest)")).alias(
            "url_canonical"
        ),
    )
    return (
        canon.groupBy("url_canonical")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keep_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("n_variants") > 1)
    )
