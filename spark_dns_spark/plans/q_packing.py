"""Sequence-packing queries — the step between a curated corpus and a
training run: fitting documents into fixed token budgets.

Two standard formulations, both exact and integer-deterministic:

- :func:`pack_tokens_stream` — GPT-style token-stream packing: the
  corpus is one deterministic token stream (doc_id order), cut every
  ``BUDGET`` tokens; a document may span packs.  The interesting part
  is the *distributed prefix sum*: a naive ``sum() OVER (ORDER BY
  doc_id)`` is a single-partition window — a non-starter at 100 TB.
  The Spark plan is the classic two-level scan: within-bucket cumsum
  windows (fully parallel), a prefix-offset table over the ≤``NB``
  bucket totals (tiny), broadcast-joined back.  One shuffle on the
  bucket key, one broadcast, no global sort.

- :func:`pack_greedy_bins` — no-split first-fit packing: documents are
  greedily accumulated into bins of capacity ``BUDGET`` (next-fit in
  doc_id order, the streaming-standard variant).  Greedy state (fill
  resets at overflow) is not window-expressible, so this is the repo's
  canonical ``applyInPandas`` stateful group operator: docs shard by
  ``doc_id % nsh`` with ``nsh`` scaled so a shard stays ~``SHARD_DOCS``
  docs at ANY corpus size — per-group memory is bounded by a constant,
  which is what makes a sequential per-group loop legal at 100 TB.
  The DuckDB oracle replays the same greedy recurrence with a
  recursive CTE over row_number-linked rows.

Reference parity note: the reference engine has no packing operator
(no join/agg surface at all — SURVEY §2.3/§2.4); this tier is part of
the training-data-pipeline surface the builder brief adds on top.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import register
from spark_dns_spark.session import load_table

#: Pack capacity in (estimated) tokens — chars/4, the same BPE
#: estimate text_token_counts reports.  512 keeps several documents
#: per pack at the testdata's ~40-100-token docs.
BUDGET = 512
#: Max buckets for the stream-packing prefix table: the offsets
#: relation stays ≤ NB rows at any scale, so its global window and
#: broadcast are O(1) in corpus size.
NB = 256
#: Target docs per greedy shard: nsh = max(64, ceil(n/SHARD_DOCS))
#: keeps every applyInPandas group a bounded, cache-sized unit of
#: sequential work no matter how large the corpus grows.
SHARD_DOCS = 4096

_NTOK = "(length(text) + 3) // 4"  # DuckDB oracle spelling


def _ntok_col():
    """Spark spelling of the same integer token estimate (lazy: a
    Column can only be built under an active session)."""
    return ((F.length("text") + F.lit(3)) / F.lit(4)).cast("long")


@register(
    "pack_tokens_stream",
    f"""
WITH t AS (
  SELECT doc_id, {_NTOK} AS n_tok FROM documents
), s AS (
  SELECT doc_id, n_tok,
         (sum(n_tok) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum
  FROM t
)
SELECT doc_id, n_tok,
       (cum - n_tok) // {BUDGET} AS pack_first,
       CASE WHEN n_tok > 0 THEN (cum - 1) // {BUDGET}
            ELSE (cum - n_tok) // {BUDGET} END AS pack_last,
       CASE WHEN n_tok > 0
            THEN (cum - 1) // {BUDGET} - (cum - n_tok) // {BUDGET} + 1
            ELSE 1 END AS n_packs,
       (cum - n_tok) % {BUDGET} AS pack_offset
FROM s
""",
    doc=f"token-stream sequence packing: cut the doc_id-ordered token "
    f"stream every {BUDGET} tokens; per doc its first/last pack and "
    "in-pack offset.  Spark plans a two-level distributed prefix sum "
    f"(parallel within-bucket cumsum + a <={NB}-row broadcast offset "
    "table) — no global-sort window.  The oracle's naive global window "
    "is the semantic spec, not the physical plan",
    tags=("text", "mlprep", "packing"),
)
def pack_tokens_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _ntok_col().alias("n_tok")
    )
    # Bucket span from parquet max(doc_id): ≤ NB contiguous doc_id
    # ranges.  A one-column min/max agg is footer-cheap; the same move
    # _lsh_geometry makes for its corpus count.
    max_id = docs.agg(F.max("doc_id")).first()[0]
    span = (int(max_id) // NB + 1) if max_id is not None else 1

    b = docs.withColumn("bucket", F.expr(f"doc_id div {span}"))
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = b.withColumn("within", F.sum("n_tok").over(w_in))

    # ≤ NB rows: the only global window in the plan runs over the
    # bucket-totals relation, then ships back as a broadcast hash join.
    w_pre = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = (
        b.groupBy("bucket")
        .agg(F.sum("n_tok").alias("tot"))
        .withColumn("prefix", F.coalesce(F.sum("tot").over(w_pre), F.lit(0)))
        .select("bucket", "prefix")
    )

    cum = F.col("prefix") + F.col("within")
    first = F.expr(f"(prefix + within - n_tok) div {BUDGET}")
    last = F.when(
        F.col("n_tok") > 0, F.expr(f"(prefix + within - 1) div {BUDGET}")
    ).otherwise(first)
    return (
        within.join(F.broadcast(prefix), "bucket")
        .select(
            "doc_id",
            "n_tok",
            first.alias("pack_first"),
            last.alias("pack_last"),
            F.when(F.col("n_tok") > 0, last - first + 1)
            .otherwise(F.lit(1))
            .cast("long")
            .alias("n_packs"),
            ((cum - F.col("n_tok")) % BUDGET).cast("long").alias("pack_offset"),
        )
    )


def greedy_pack(tokens: list[int], budget: int = BUDGET) -> tuple[list[int], list[int]]:
    """Next-fit greedy recurrence: accumulate into the current bin
    until it would overflow, then open a new one.  Returns per-item
    (bin_id, fill-after-insert).  Inputs must already be capped at
    ``budget`` — the query does ``least(n_tok, budget)`` upstream."""
    fill = 0
    bin_id = 0
    bins, fills = [], []
    for t in tokens:
        if fill + t > budget:
            bin_id += 1
            fill = t
        else:
            fill += t
        bins.append(bin_id)
        fills.append(fill)
    return bins, fills


_NSH_SQL = f"(SELECT greatest(64, (count(*) + {SHARD_DOCS - 1}) // {SHARD_DOCS}) FROM documents)"


@register(
    "pack_greedy_bins",
    f"""
WITH RECURSIVE t AS (
  SELECT doc_id,
         doc_id % {_NSH_SQL} AS shard,
         least({_NTOK}, {BUDGET}) AS n_tok,
         row_number() OVER (PARTITION BY doc_id % {_NSH_SQL}
                            ORDER BY doc_id) AS rn
  FROM documents
), g AS (
  SELECT shard, rn, doc_id, n_tok, n_tok AS bin_fill, 0 AS bin_id
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.shard, t.rn, t.doc_id, t.n_tok,
         CASE WHEN g.bin_fill + t.n_tok > {BUDGET}
              THEN t.n_tok ELSE g.bin_fill + t.n_tok END AS bin_fill,
         CASE WHEN g.bin_fill + t.n_tok > {BUDGET}
              THEN g.bin_id + 1 ELSE g.bin_id END AS bin_id
  FROM g JOIN t ON t.shard = g.shard AND t.rn = g.rn + 1
)
SELECT doc_id, shard, n_tok,
       bin_id::BIGINT AS bin_id, bin_fill::BIGINT AS bin_fill
FROM g
""",
    doc=f"greedy no-split sequence packing (next-fit, capacity {BUDGET}): "
    "per data-scaled shard, docs accumulate into a bin until it would "
    "overflow, then a new bin opens.  Sequential greedy state via "
    "applyInPandas; shard count grows with the corpus so each group "
    f"stays ~{SHARD_DOCS} docs.  Oracle replays the recurrence with a "
    "recursive CTE",
    tags=("text", "mlprep", "packing"),
)
def pack_greedy_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.least(_ntok_col(), F.lit(BUDGET).cast("long")).alias("n_tok")
    )
    n = docs.count()
    nsh = max(64, -(-n // SHARD_DOCS))  # ceil-div, same rule as _NSH_SQL

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        bins, fills = greedy_pack([int(t) for t in pdf["n_tok"]])
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf[["doc_id", "shard", "n_tok", "bin_id", "bin_fill"]]

    return (
        docs.withColumn("shard", F.col("doc_id") % nsh)
        .groupBy("shard")
        .applyInPandas(
            _pack, "doc_id long, shard long, n_tok long, bin_id long, bin_fill long"
        )
    )


#: Length-grouped batching geometry.
LG_BUCKET_CHARS = 256
LG_BATCH_DOCS = 16


@register(
    "batching_length_grouped",
    f"""
WITH ranked AS (
  SELECT doc_id, n_chars,
         n_chars // {LG_BUCKET_CHARS} AS bucket,
         ROW_NUMBER() OVER (PARTITION BY n_chars // {LG_BUCKET_CHARS}
                            ORDER BY n_chars, doc_id) AS rnk
  FROM documents
), batched AS (
  SELECT bucket, (rnk - 1) // {LG_BATCH_DOCS} AS batch_no, n_chars
  FROM ranked
)
SELECT bucket, batch_no,
       count(*)::BIGINT AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
       (count(*) * max(n_chars) - sum(n_chars))::BIGINT AS padding_waste
FROM batched GROUP BY bucket, batch_no
""",
    doc="length-grouped batching (the HF group_by_length pattern): "
    "docs bucketed by length band, ranked inside each band "
    "(per-bucket row_number — a PARTITIONED window, never global), "
    "cut into 16-doc batches, and each batch's padding waste "
    "(n*max - sum) computed exactly.  One shuffle on the bucket key; "
    "the batch agg reuses the window's partitioning.  The waste "
    "metric is what justifies the operator: random batching pads to "
    "the global max, length-grouped pads to the band max",
    tags=("packing", "window", "batching"),
)
def batching_length_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    b = docs.withColumn(
        "bucket", F.expr(f"n_chars div {LG_BUCKET_CHARS}")
    )
    w = Window.partitionBy("bucket").orderBy("n_chars", "doc_id")
    batched = b.withColumn("rnk", F.row_number().over(w)).select(
        "bucket",
        F.expr(f"(rnk - 1) div {LG_BATCH_DOCS}").alias("batch_no"),
        "n_chars",
    )
    return batched.groupBy("bucket", "batch_no").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (F.count("*") * F.max("n_chars") - F.sum("n_chars"))
        .cast("long")
        .alias("padding_waste"),
    )
