"""Deterministic corpus sampling / splitting / quantization — the
bookkeeping operators of a training-data pipeline, all map-only and
idempotent (hash-based, not RNG-based, so backfills and reruns pick the
SAME rows — the property that matters when the corpus is rebuilt
incrementally at 100 TB).

- ``sample_stratified_hash`` — per-language sampling rates applied via
  a stable md5-derived bucket, plus train/val/test split assignment in
  the same pass.
- ``embedding_quantize_int8`` — symmetric per-vector int8 quantization
  (scale = max|x|/127), the standard ANN-index compression; emits an
  integer checksum per vector so the oracle verifies every quantized
  element without shipping arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.session import load_table

#: Per-language keep-rate (percent) — upsample scarce langs, downsample en.
RATES = {"en": 40, "de": 80, "fr": 80, "es": 80, "zh": 90}
SPLITS = (80, 10, 10)  #: train/val/test percent


@register(
    "sample_stratified_hash",
    f"""
WITH bucketed AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5('s|' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS sbucket,
         CAST('0x' || substr(md5('p|' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS pbucket
  FROM documents
), kept AS (
  SELECT doc_id, lang, pbucket FROM bucketed
  WHERE sbucket < CASE lang
    WHEN 'en' THEN {RATES["en"]} WHEN 'de' THEN {RATES["de"]}
    WHEN 'fr' THEN {RATES["fr"]} WHEN 'es' THEN {RATES["es"]}
    WHEN 'zh' THEN {RATES["zh"]} ELSE 0 END
)
SELECT lang,
       CASE WHEN pbucket < {SPLITS[0]} THEN 'train'
            WHEN pbucket < {SPLITS[0] + SPLITS[1]} THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
FROM kept GROUP BY 1, 2
""",
    doc="stratified sampling + train/val/test split via stable hash "
    "buckets (no RNG): per-language keep-rates and split assignment are "
    "pure functions of doc_id, so reruns/backfills select identical "
    "rows; map-only, one tiny rollup shuffle",
    tags=("sampling", "text"),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")

    def bucket(prefix: str) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(prefix + "|"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 100
        )

    rate = F.lit(0)
    for lang, r in RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    kept = docs.withColumn("sbucket", bucket("s")).withColumn(
        "pbucket", bucket("p")
    ).filter(F.col("sbucket") < rate)
    split = (
        F.when(F.col("pbucket") < SPLITS[0], F.lit("train"))
        .when(F.col("pbucket") < SPLITS[0] + SPLITS[1], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return kept.select("lang", split.alias("split"), "doc_id").groupBy(
        "lang", "split"
    ).agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "embedding_quantize_int8",
    """
WITH ev AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), scaled AS (
  SELECT vec_id, v,
         list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127.0 AS scale
  FROM ev
)
SELECT vec_id, floor(scale * 1e9 + 0.5) / 1e9 AS scale,
       list_aggregate(
         list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)),
         'sum')::BIGINT AS q_sum,
       list_aggregate(
         list_transform(v, x -> abs(CAST(floor(x / scale + 0.5) AS BIGINT))),
         'sum')::BIGINT AS q_l1
FROM scaled
""",
    doc="symmetric per-vector int8 quantization (scale = max|x|/127), "
    "verified element-exactly via integer sum/L1 checksums; map-only — "
    "the compression pass before building a 100 TB ANN index",
    tags=("similarity", "quantize"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scaled = emb.withColumn(
        "scale",
        F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))) / F.lit(127.0),
    )
    # floor(x/scale + 0.5) instead of round(): identical IEEE ops in
    # both engines (round() half-rule differs at exact .5)
    q = F.transform(
        F.col("v"),
        lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("long"),
    )
    return scaled.select(
        "vec_id",
        (F.floor(F.col("scale") * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)).alias(
            "scale"
        ),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda a, x: a + F.abs(x)
        ).alias("q_l1"),
    )


KMV_K = 64  #: sketch size; relative error ~ 1/sqrt(K-2) ~ 13%


@register(
    "sketch_kmv_distinct",
    f"""
WITH hashed AS (
  SELECT DISTINCT l_returnflag,
         CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8) AS BIGINT)
           AS h
  FROM lineitem
), ranked AS (
  SELECT l_returnflag, h,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n_exact
  FROM hashed
)
SELECT l_returnflag,
       n_exact AS exact_distinct,
       CAST(floor(({KMV_K} - 1) * 4294967296.0 / h + 0.5) AS BIGINT)
         AS kmv_estimate
FROM ranked WHERE rk = {KMV_K}
""",
    doc=f"KMV (K minimum values) distinct-count sketch, K={KMV_K}: the "
    "k-th smallest 32-bit hash per group yields the estimate "
    "(k-1)*2^32/h_k.  Unlike HLL the whole sketch is a deterministic "
    "function of md5, so the oracle checks the ESTIMATE itself — and "
    "the k smallest hashes are mergeable partials (min-merge), the "
    "property that makes the sketch shuffle-light at 100 TB",
    tags=("sketch", "agg"),
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    hashed = li.select(
        "l_returnflag",
        F.conv(
            F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8), 16, 10
        )
        .cast("long")
        .alias("h"),
    ).distinct()
    w = Window.partitionBy("l_returnflag").orderBy("h")
    ranked = hashed.select(
        "l_returnflag",
        "h",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("l_returnflag")).alias("n_exact"),
    )
    return ranked.filter(F.col("rk") == KMV_K).select(
        "l_returnflag",
        F.col("n_exact").alias("exact_distinct"),
        F.floor((KMV_K - 1) * F.lit(4294967296.0) / F.col("h") + F.lit(0.5))
        .cast("long")
        .alias("kmv_estimate"),
    )


#: docs kept per source by the weighted priority sample.
PRI_K = 8


@register(
    "sample_weighted_priority",
    f"""
WITH pri AS (
  SELECT doc_id, source, n_chars,
         -- priority = hash / weight (integer division): a doc with 2x
         -- the weight is ~2x as likely to be among the k smallest —
         -- the deterministic integer form of priority sampling
         CAST('0x' || substr(md5('w|' || CAST(doc_id AS VARCHAR)), 1, 12)
              AS BIGINT) // greatest(n_chars, 1) AS priority
  FROM documents
), ranked AS (
  SELECT doc_id, source, n_chars, priority,
         row_number() OVER (PARTITION BY source
                            ORDER BY priority, doc_id) AS rn
  FROM pri
)
SELECT doc_id, source, n_chars::BIGINT AS n_chars,
       priority::BIGINT AS priority, rn::BIGINT AS rn
FROM ranked WHERE rn <= {PRI_K}
""",
    doc=f"weighted priority sampling: top-{PRI_K} docs per source by "
    "priority = md5-hash div weight (weight = n_chars), the "
    "deterministic integer form of priority/weighted-reservoir "
    "sampling — longer docs are proportionally likelier to be kept, "
    "reruns and backfills pick the SAME rows (no RNG), and the "
    "per-group top-k is one window over skinny columns.  At 100 TB "
    "this replaces rand()-based weighted sampling whose resample "
    "changes every run",
    tags=("sampling", "mlprep"),
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    # integer `div`, never float `/`+cast: the 48-bit hash over a small
    # weight is exactly representable in a double but its QUOTIENT is
    # not, and truncating a rounded double can differ from true floor
    pri = docs.withColumn(
        "priority",
        F.expr(
            "CAST(conv(substring(md5(concat('w|', CAST(doc_id AS STRING))),"
            " 1, 12), 16, 10) AS BIGINT) div greatest(n_chars, 1L)"
        ),
    )
    w = Window.partitionBy("source").orderBy("priority", "doc_id")
    return (
        pri.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PRI_K)
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            "priority",
            F.col("rn").cast("long").alias("rn"),
        )
    )


# --- count-min sketch -------------------------------------------------------

CMS_D = 4  #: sketch depth (independent hash rows)
CMS_W = 512  #: sketch width (buckets per row); error ~ N/W per row
CMS_PROBE_K = 20  #: probe terms: the exact top-K (deterministic ties)


def _cms_sql() -> str:
    """DuckDB oracle: same md5-derived affine hashes, same cells, same
    min-over-rows estimate as the Spark plan."""
    from spark_dns_spark.functions.dnsfn import portable_hash32_sql
    from spark_dns_spark.operators.dedup import MINHASH_P, _affine_consts

    consts = _affine_consts(CMS_D)
    rows = "\n    UNION ALL ".join(
        f"SELECT {k} AS k, (h * {a} + {b}) % {MINHASH_P} % {CMS_W} AS bucket"
        " FROM h"
        for k, (a, b) in enumerate(consts)
    )
    probe_or = " OR ".join(
        f"(c.k = {k} AND c.bucket = (t.h * {a} + {b})"
        f" % {MINHASH_P} % {CMS_W})"
        for k, (a, b) in enumerate(consts)
    )
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), h AS (
  SELECT {portable_hash32_sql("w")} AS h FROM toks
), cells AS (
  SELECT k, bucket, count(*)::BIGINT AS cnt FROM (
    {rows}
  ) GROUP BY k, bucket
), exact AS (
  SELECT w, count(*)::BIGINT AS exact_n FROM toks GROUP BY w
), probe AS (
  SELECT w, exact_n FROM (
    SELECT w, exact_n,
           ROW_NUMBER() OVER (ORDER BY exact_n DESC, w) AS rk
    FROM exact
  ) WHERE rk <= {CMS_PROBE_K}
), est AS (
  SELECT t.w, t.exact_n, min(c.cnt) AS est_n
  FROM (SELECT w, exact_n, {portable_hash32_sql("w")} AS h FROM probe) t
  JOIN cells c ON {probe_or}
  GROUP BY t.w, t.exact_n
)
SELECT w, exact_n, est_n, est_n - exact_n AS overcount FROM est
"""


@register(
    "sketch_countmin_freq",
    _cms_sql(),
    doc=f"count-min sketch frequency estimation, d={CMS_D} x w={CMS_W}: "
    "one pass builds the sketch (a fixed d*w-cell integer grid — "
    "map-side-combinable counts, CONSTANT state at any corpus size, "
    "the property that matters at 100 TB where an exact term-frequency "
    "table is itself corpus-sized), then the exact top-"
    f"{CMS_PROBE_K} terms are probed against it: est = min over rows "
    "of the term's cell, always >= exact (one-sided error).  The "
    "sketch (not the corpus) broadcasts to the probe join; hashes are "
    "the md5-affine family the minhash path uses, so the oracle "
    "reproduces every cell bit-for-bit",
    tags=("sketch", "agg"),
)
def sketch_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("w"))
    return _cms_probe(_cms_cells(toks), toks)


def _cms_buckets() -> F.Column:
    """The CMS_D cell coordinates of the hash column ``h`` as an array
    (posexplode to (k, bucket))."""
    from spark_dns_spark.operators.dedup import MINHASH_P, _affine_consts

    return F.array(
        *[
            (F.col("h") * F.lit(a) + F.lit(b))
            % F.lit(MINHASH_P)
            % F.lit(CMS_W)
            for (a, b) in _affine_consts(CMS_D)
        ]
    )


def _cms_cells(toks: DataFrame) -> DataFrame:
    """One pass token stream -> (k, bucket, cnt) sketch cells.  Cells
    are ADDITIVE: sketches of disjoint corpus slices merge by cell-wise
    sum — the property the streaming variant proves by oracle."""
    from spark_dns_spark.functions.dnsfn import portable_hash32

    hs = toks.select(portable_hash32("w").alias("h"))
    return (
        hs.select(F.posexplode(_cms_buckets()).alias("k", "bucket"))
        .groupBy("k", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _cms_probe(cells: DataFrame, toks: DataFrame) -> DataFrame:
    """Probe the exact top-K terms against a (k, bucket, cnt) sketch:
    est = min over rows of the term's cell."""
    from pyspark.sql import Window

    from spark_dns_spark.functions.dnsfn import portable_hash32

    exact = toks.groupBy("w").agg(F.count(F.lit(1)).alias("exact_n"))
    rk = Window.orderBy(F.desc("exact_n"), F.asc("w"))
    probe = (
        exact.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= CMS_PROBE_K)
        .select("w", "exact_n", portable_hash32("w").alias("h"))
    )
    pcells = probe.select(
        "w", "exact_n", F.posexplode(_cms_buckets()).alias("k", "bucket")
    )
    # cells is bounded by d*w (a constant), so the broadcast hint is
    # legitimate at ANY corpus size — unlike corpus-derived dims.
    return (
        pcells.join(F.broadcast(cells), ["k", "bucket"])
        .groupBy("w", "exact_n")
        .agg(F.min("cnt").alias("est_n"))
        .select(
            "w",
            "exact_n",
            "est_n",
            (F.col("est_n") - F.col("exact_n")).alias("overcount"),
        )
    )


@register(
    "sketch_countmin_stream",
    _cms_sql(),
    doc=f"count-min MERGEABILITY as a streaming stage: the corpus "
    "arrives as two micro-batches (file stream, maxFilesPerTrigger=1), "
    "each batch builds ITS OWN d x w sketch and lands it in a "
    "per-batch-id overwrite dir (idempotent under foreachBatch "
    "retries), and the serving sketch is the CELL-WISE SUM of the "
    "batch sketches.  The oracle is the one-pass batch CMS SQL: "
    "cross-engine hash equality PROVES merged == batch-built, the "
    "additivity that lets a 100 TB pipeline maintain term-frequency "
    "state at d*w integers per partition/day and merge at read time",
    tags=("sketch", "streaming", "incremental"),
)
def sketch_countmin_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from spark_dns_spark.plans.feeds import (  # noqa: PLC0415
        await_or_fail,
        scratch_dir,
        single_part_file,
    )

    root = scratch_dir("cms_stream_")
    src_dir = os.path.join(root, "src")
    os.makedirs(src_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for i, half in enumerate(
        (docs.filter(F.col("doc_id") % 2 == 0),
         docs.filter(F.col("doc_id") % 2 == 1))
    ):
        part_dir = os.path.join(root, f"half{i}")
        half.coalesce(1).write.parquet(part_dir)
        part = single_part_file(part_dir, f"sketch_countmin_stream half{i}")
        dst = os.path.join(src_dir, f"{i:02d}_batch.parquet")
        shutil.copy(part, dst)
        mt = os.stat(dst).st_mtime
        os.utime(dst, (mt - 10 * (1 - i), mt - 10 * (1 - i)))

    acc = os.path.join(root, "cells")

    def process(batch_docs: DataFrame, batch_id: int) -> None:
        toks_b = batch_docs.select(
            F.explode(F.split("text", " ")).alias("w")
        )
        _cms_cells(toks_b).write.mode("overwrite").parquet(
            os.path.join(acc, f"b{batch_id}")
        )

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
    batch_dirs = [
        os.path.join(acc, d)
        for d in sorted(os.listdir(acc))
        if d.startswith("b")
    ] if os.path.isdir(acc) else []
    if not batch_dirs:
        return spark.createDataFrame(
            [], "w string, exact_n bigint, est_n bigint, overcount bigint"
        )
    merged = (
        spark.read.parquet(*batch_dirs)
        .groupBy("k", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    toks = docs.select(F.explode(F.split("text", " ")).alias("w"))
    return _cms_probe(merged, toks)
