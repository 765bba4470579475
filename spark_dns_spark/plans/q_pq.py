"""Product quantization (PQ) of the embedding corpus — the compression
half of the IVF-PQ ANN stack (similarity_topk_ivf is the coarse half):
each 64-dim vector is split into ``PQ_M`` = 16 subspaces of 4 dims, a
``PQ_K`` = 16-centroid Lloyd codebook is trained per subspace, and
every vector is stored as 16 nibble codes + its reconstruction error.
At 100 TB this is the difference between serving ANN from 256 GB of
raw floats and from ~8 GB of codes: the codebooks are M x K x SUBD
integers of driver/broadcast state, and distance tables against a
query are M x K lookups.

Execution shape (same as kmeans_lloyd_cells, q_kmeans.py): vectors are
integer-quantized once; per training round each subspace does ONE
codegen argmin assignment (its 8 centroid literals inlined — the
vectors never shuffle) plus one map-side-combinable aggregate shipping
K x (SUBD+1) partials; the only driver state is the M x K codebook.
The final pass emits all 8 codes and the total squared reconstruction
error in a single map-only projection.

Cross-engine exactness: the standing integer convention — quantized
inputs, integer squared distances, ``floor(sum/count)`` centroid
updates, argmin ties to the smaller cell — makes every code and the
error EXACT in both engines; the oracle is hash equality.

Part of the LLM-data-pipeline brief (similarity search at scale); the
reference engine has no ANN surface (SURVEY.md §2).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.plans import q_kmeans as km
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.session import load_table

PQ_M = 16  #: subspaces
SUBD = km.DIM // PQ_M  #: dims per subspace (64 / 16 = 4)
PQ_K = 16  #: codebook size per subspace
PQ_ITERS = 3  #: Lloyd iterations per subspace (assign -> update x2, then final)
#: Seed spread: seeds are the PQ_K vectors minimizing an LCG hash of
#: vec_id (deterministic, engine-exact integer arithmetic) — id-order
#: seeding picks correlated rows (adjacent ids share clusters in any
#: id-clustered corpus) and Lloyd can't escape it in few iterations.
SEED_A, SEED_B, SEED_M = 1103515245, 12345, 2147483648


def _sub_dist_expr(cv: list[int], off: int) -> str:
    """Spark codegen integer ||q[off:off+SUBD] - cv||^2, centroid inlined."""
    return "0L" + "".join(
        f" + (q{off + i} - {int(c)})*(q{off + i} - {int(c)})"
        for i, c in enumerate(cv)
    )


def _sub_dist_sql(qv: str, off: int, cv: str) -> str:
    """DuckDB integer ||qv[off+1 .. off+SUBD] - cv[1..SUBD]||^2."""
    return "0" + "".join(
        f" + ({qv}[{off + i}]-{cv}[{i}])*({qv}[{off + i}]-{cv}[{i}])"
        for i in range(1, SUBD + 1)
    )


def _pq_sql() -> str:
    """Codes + reconstruction error off the shared CTE chain."""
    codes = ", ".join(f"c{m}" for m in range(PQ_M))
    err = " + ".join(f"d{m}" for m in range(PQ_M))
    joins = " ".join(f"JOIN f{m} USING (vec_id)" for m in range(1, PQ_M))
    return (
        _pq_chain()
        + f"""
SELECT vec_id, {codes}, ({err})::BIGINT AS err2
FROM f0 {joins}"""
    )


def _pq_chain() -> str:
    """The full per-subspace train + assign CTE chain (one Lloyd update
    round per subspace, mirroring the Spark path exactly)."""
    parts = [
        f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id, [{km.Q_COLS_SQL}] AS qv FROM e
), seeds AS (
  SELECT row_number() OVER (
           ORDER BY (vec_id * {SEED_A} + {SEED_B}) % {SEED_M}, vec_id
         ) - 1 AS cell, qv
  FROM q
  ORDER BY (vec_id * {SEED_A} + {SEED_B}) % {SEED_M}, vec_id
  LIMIT {PQ_K}
)"""
    ]
    for m in range(PQ_M):
        off = m * SUBD
        parts.append(
            f"""
, s{m}r0 AS (
  SELECT cell, list_transform(generate_series(1, {SUBD}),
                              i -> qv[{off} + i]) AS cv
  FROM seeds
)"""
        )
        # PQ_ITERS - 1 assign/update rounds, mirroring _train_books.
        for t in range(1, PQ_ITERS):
            d_cur = _sub_dist_sql("q.qv", off, "s.cv")
            parts.append(
                f"""
, a{m}r{t} AS (
  SELECT vec_id, qv, cell FROM (
    SELECT q.vec_id, q.qv, s.cell,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {d_cur} ASC, s.cell) AS rn
    FROM q, s{m}r{t - 1} s
  ) WHERE rn = 1
), u{m}r{t} AS (
  SELECT cell, i,
         CAST(floor((sum(qv[{off} + i]))::DOUBLE / count(*)) AS BIGINT) AS c
  FROM a{m}r{t}, (SELECT unnest(generate_series(1, {SUBD})) AS i)
  GROUP BY cell, i
), g{m}r{t} AS (
  SELECT cell, list(c ORDER BY i) AS cv FROM u{m}r{t} GROUP BY cell
), s{m}r{t} AS (
  SELECT s.cell, coalesce(g.cv, s.cv) AS cv
  FROM s{m}r{t - 1} s LEFT JOIN g{m}r{t} g USING (cell)
)"""
            )
        d_fin = _sub_dist_sql("q.qv", off, "c.cv")
        parts.append(
            f"""
, c{m} AS (
  SELECT cell, cv FROM s{m}r{PQ_ITERS - 1}
), f{m} AS (
  SELECT vec_id, cell AS c{m}, d AS d{m} FROM (
    SELECT q.vec_id, c.cell, {d_fin} AS d,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {d_fin} ASC, c.cell) AS rn
    FROM q, c{m} c
  ) WHERE rn = 1
)"""
        )
    return "".join(parts)


def _sub_assign(q: DataFrame, cents: list[list[int]], m: int) -> DataFrame:
    """One argmin assignment for subspace ``m`` (centroid literals
    inlined; ties to the smaller cell, matching the oracle's
    ORDER BY dist, cell)."""
    off = m * SUBD
    arr = F.array(
        *[F.expr(_sub_dist_expr(cv, off)) for cv in cents]
    )
    return q.select(
        "*",
        (F.array_position(arr, F.array_min(arr)) - 1).alias(f"c{m}"),
        F.array_min(arr).alias(f"d{m}"),
    )


@register(
    "similarity_pq_codes",
    _pq_sql(),
    doc=f"product quantization: {PQ_M} subspaces x {SUBD} dims, "
    f"{PQ_K}-centroid integer-exact Lloyd codebook per subspace "
    f"({PQ_ITERS} iters, LCG-hash-spread seeds), emitting per-vector "
    f"codes c0..c{PQ_M - 1} + total squared reconstruction error; "
    "vectors never shuffle (codebook literals inlined into codegen "
    "argmin; per round each subspace ships only K x (SUBD+1) aggregate "
    "partials) — the IVF-PQ compression layer at 100 TB",
    tags=("similarity", "mlprep", "iterative"),
)
def similarity_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _quantized(spark, sf_dir)
    books = _train_books(q)
    if books is None:
        return q.select(
            "vec_id",
            *[F.lit(0).cast("long").alias(f"c{m}") for m in range(PQ_M)],
            F.lit(0).cast("long").alias("err2"),
        )
    # Final pass: all 8 codes + the error in ONE map-only projection.
    out = _assign_all(q, books)
    err = sum(
        (F.col(f"d{m}") for m in range(1, PQ_M)), F.col("d0")
    )
    return out.select(
        "vec_id",
        *[f"c{m}" for m in range(PQ_M)],
        err.cast("long").alias("err2"),
    )


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return km.quantize(e).persist()


def _train_books(q: DataFrame) -> list[list[list[int]]] | None:
    """Train the PQ_M per-subspace codebooks (None on an empty corpus)."""
    rows = (
        q.orderBy(
            (F.col("vec_id") * SEED_A + SEED_B) % SEED_M, "vec_id"
        )
        .limit(PQ_K)
        .collect()
    )
    seeds = [
        [int(r[f"q{i}"]) for i in range(km.DIM)] for r in rows
    ]  # full 64-dim rows; sliced per subspace
    if not seeds:
        return None
    books: list[list[list[int]]] = []
    for m in range(PQ_M):
        off = m * SUBD
        cents = [cv[off : off + SUBD] for cv in seeds]
        for _ in range(PQ_ITERS - 1):
            asg = _sub_assign(q, cents, m)
            sums = asg.groupBy(f"c{m}").agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(f"q{off + i}").alias(f"s{i}") for i in range(SUBD)],
            ).collect()
            upd = {
                int(r[f"c{m}"]): [
                    math.floor(int(r[f"s{i}"]) / int(r["n"]))
                    for i in range(SUBD)
                ]
                for r in sums
            }
            cents = [upd.get(j, cents[j]) for j in range(PQ_K)]
        books.append(cents)
    return books


def _assign_all(q: DataFrame, books: list[list[list[int]]]) -> DataFrame:
    """Add c0..c{PQ_M-1} + d0..d{PQ_M-1} to ``q`` (map-only codegen)."""
    out = q
    for m in range(PQ_M):
        out = _sub_assign(out, books[m], m)
    return out


# ---------------------------------------------------------------------------
# ADC serving + recall gate: the PQ index actually answering queries.
# ---------------------------------------------------------------------------

ADC_QMOD = 50  #: query set = vec_id % ADC_QMOD == 0 (the ANN-tier budget)
RECALL_K = 10  #: top-K for both the exact ground truth and the ADC ranking
#: ADC shortlist before the exact re-rank (the standard two-stage PQ
#: serve: codes prune the corpus to the shortlist, exact distances are
#: computed only on those).  Scale-adaptive like the IVF/LSH probe
#: budgets: max(5x the final K, corpus/10) — a fixed shortlist would
#: silently degrade recall as the corpus grows.
SHORTLIST_MIN = 5 * RECALL_K
SHORTLIST_DIV = 10


def _recon_sql_joins() -> tuple[str, str]:
    """(concat-of-codewords expression, join chain) for the recon CTE."""
    rv = " || ".join(f"b{m}.cv" for m in range(PQ_M))
    joins = ["FROM f0 JOIN c0 b0 ON b0.cell = f0.c0"]
    joins += [
        f"JOIN f{m} ON f{m}.vec_id = f0.vec_id "
        f"JOIN c{m} b{m} ON b{m}.cell = f{m}.c{m}"
        for m in range(1, PQ_M)
    ]
    return rv, " ".join(joins)


def _adc_sql() -> str:
    rv, joins = _recon_sql_joins()
    return (
        _pq_chain()
        + f"""
, recon AS (
  SELECT f0.vec_id, {rv} AS rv {joins}
), qrs AS (
  SELECT vec_id AS query_id, qv FROM q WHERE vec_id % {ADC_QMOD} = 0
), ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qr.query_id, dd.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY qr.query_id
             ORDER BY {km.dist_sql("qr.qv", "dd.qv")} ASC, dd.vec_id) AS rn
    FROM qrs qr JOIN q dd ON dd.vec_id <> qr.query_id
  ) WHERE rn <= {RECALL_K}
), sl AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qr.query_id, rc.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY qr.query_id
             ORDER BY {km.dist_sql("qr.qv", "rc.rv")} ASC, rc.vec_id) AS rn
    FROM qrs qr JOIN recon rc ON rc.vec_id <> qr.query_id
  ) WHERE rn <= greatest({SHORTLIST_MIN},
                         (SELECT count(*) FROM q) // {SHORTLIST_DIV})
), ad AS (
  SELECT query_id, neighbor_id FROM (
    SELECT sl.query_id, sl.neighbor_id,
           row_number() OVER (
             PARTITION BY sl.query_id
             ORDER BY {km.dist_sql("qr.qv", "dd.qv")} ASC,
                      sl.neighbor_id) AS rn
    FROM sl JOIN qrs qr ON qr.query_id = sl.query_id
            JOIN q dd ON dd.vec_id = sl.neighbor_id
  ) WHERE rn <= {RECALL_K}
)
SELECT ex.query_id,
       sum(CASE WHEN ad.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS hits,
       (sum(CASE WHEN ad.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         * {10000 // RECALL_K})::BIGINT AS recall_e4
FROM ex LEFT JOIN ad
  ON ad.query_id = ex.query_id AND ad.neighbor_id = ex.neighbor_id
GROUP BY ex.query_id"""
    )


def _recon_expr(books: list[list[list[int]]], i: int) -> str:
    """Reconstructed coordinate ``i``: the trained codeword table for
    its subspace inlined as an array literal, indexed by the code."""
    m, j = divmod(i, SUBD)
    arr = ", ".join(str(int(books[m][k][j])) for k in range(PQ_K))
    return f"element_at(array({arr}), CAST(c{m} + 1 AS INT))"


@register(
    "similarity_pq_adc_recall",
    _adc_sql(),
    doc=f"two-stage PQ-ADC serving + its accountability metric: each "
    f"vector is reconstructed ONCE from its {PQ_M} codes (map-only "
    "codeword-literal lookups — the asymmetric-distance decode), the "
    f"ADC ranking prunes the corpus to a max({SHORTLIST_MIN}, "
    f"corpus/{SHORTLIST_DIV})-candidate "
    f"shortlist, exact distances re-rank ONLY the shortlist to "
    f"top-{RECALL_K}, and recall@{RECALL_K} is measured against the "
    "exact ground truth — the same self-measuring pattern as "
    "similarity_ivf_recall/lsh_recall, completing the IVF-PQ serving "
    "story; at 100 TB the first stage touches only codes "
    "(PQ_M bytes/vector) and the vectors are read for ~SHORTLIST "
    "candidates per query, never scanned",
    tags=("similarity", "metric", "iterative"),
)
def similarity_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _quantized(spark, sf_dir)
    books = _train_books(q)
    if books is None:
        return spark.createDataFrame(
            [], "query_id bigint, hits bigint, recall_e4 bigint"
        )
    recon = _assign_all(q, books).select(
        F.col("vec_id").alias("neighbor_id"),
        *[
            F.expr(_recon_expr(books, i)).alias(f"r{i}")
            for i in range(km.DIM)
        ],
    )
    queries = q.filter(F.col("vec_id") % ADC_QMOD == 0).select(
        F.col("vec_id").alias("query_id"),
        *[F.col(f"q{i}").alias(f"a{i}") for i in range(km.DIM)],
    )
    d_exact = "0L" + "".join(
        f" + (a{i} - q{i})*(a{i} - q{i})" for i in range(km.DIM)
    )
    d_adc = "0L" + "".join(
        f" + (a{i} - r{i})*(a{i} - r{i})" for i in range(km.DIM)
    )

    def topk(pairs: DataFrame, dist: str, k: int) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
        return (
            pairs.withColumn("d2", F.expr(dist))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id")
        )

    # Q-row query set broadcast onto the corpus / the recon table — the
    # whitelisted brute-force class (this IS the ground-truth metric).
    exact = topk(
        q.withColumnRenamed("vec_id", "neighbor_id").join(
            F.broadcast(queries),
            F.col("neighbor_id") != F.col("query_id"),
        ),
        d_exact,
        RECALL_K,
    )
    # Two-stage serve: ADC over the codes prunes the corpus to the
    # scale-adaptive shortlist; exact distances only on the shortlist.
    shortlist_k = max(SHORTLIST_MIN, q.count() // SHORTLIST_DIV)
    shortlist = topk(
        recon.join(
            F.broadcast(queries),
            F.col("neighbor_id") != F.col("query_id"),
        ),
        d_adc,
        shortlist_k,
    )
    adc = topk(
        shortlist.join(
            q.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
        ).join(F.broadcast(queries), "query_id"),
        d_exact,
        RECALL_K,
    ).withColumn("hit", F.lit(1))
    return (
        exact.join(adc, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("hits"))
        .select(
            "query_id",
            "hits",
            (F.col("hits") * F.lit(10000 // RECALL_K)).alias("recall_e4"),
        )
    )
