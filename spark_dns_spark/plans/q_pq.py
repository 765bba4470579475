"""Product quantization (PQ) of the embedding corpus — the compression
half of the IVF-PQ ANN stack (similarity_topk_ivf is the coarse half):
each 64-dim vector is split into ``PQ_M`` = 8 subspaces of 8 dims, a
``PQ_K`` = 8-centroid Lloyd codebook is trained per subspace, and every
vector is stored as 8 one-byte codes + its reconstruction error.  At
100 TB this is the difference between serving ANN from 256 GB of raw
floats and from 4 GB of codes: the codebooks are M x K x SUBD integers
of driver/broadcast state, and distance tables against a query are
M x K lookups.

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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_dns_spark.plans import q_kmeans as km
from spark_dns_spark.plans.catalog import register
from spark_dns_spark.session import load_table

PQ_M = 8  #: subspaces
SUBD = km.DIM // PQ_M  #: dims per subspace (64 / 8 = 8)
PQ_K = 8  #: codebook size per subspace (seeds = PQ_K smallest vec_ids)
PQ_ITERS = 2  #: Lloyd iterations per subspace (assign -> update, then final)


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
    """The full per-subspace train + assign CTE chain (one Lloyd update
    round per subspace, mirroring the Spark path exactly)."""
    parts = [
        f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id, [{km.Q_COLS_SQL}] AS qv FROM e
), seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, qv
  FROM q ORDER BY vec_id LIMIT {PQ_K}
)"""
    ]
    for m in range(PQ_M):
        off = m * SUBD
        d_seed = _sub_dist_sql("q.qv", off, "s.cv")
        d_fin = _sub_dist_sql("q.qv", off, "c.cv")
        parts.append(
            f"""
, s{m} AS (
  SELECT cell, list_transform(generate_series(1, {SUBD}),
                              i -> qv[{off} + i]) AS cv
  FROM seeds
), a{m} AS (
  SELECT vec_id, qv, cell FROM (
    SELECT q.vec_id, q.qv, s.cell,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {d_seed} ASC, s.cell) AS rn
    FROM q, s{m} s
  ) WHERE rn = 1
), u{m} AS (
  SELECT cell, i,
         CAST(floor((sum(qv[{off} + i]))::DOUBLE / count(*)) AS BIGINT) AS c
  FROM a{m}, (SELECT unnest(generate_series(1, {SUBD})) AS i)
  GROUP BY cell, i
), g{m} AS (
  SELECT cell, list(c ORDER BY i) AS cv FROM u{m} GROUP BY cell
), c{m} AS (
  SELECT s.cell, coalesce(g.cv, s.cv) AS cv
  FROM s{m} s LEFT JOIN g{m} g USING (cell)
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
    codes = ", ".join(f"c{m}" for m in range(PQ_M))
    err = " + ".join(f"d{m}" for m in range(PQ_M))
    joins = " ".join(f"JOIN f{m} USING (vec_id)" for m in range(1, PQ_M))
    parts.append(
        f"""
SELECT vec_id, {codes}, ({err})::BIGINT AS err2
FROM f0 {joins}"""
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
    f"({PQ_ITERS} iters, seeds = the {PQ_K} smallest vec_ids), emitting "
    "per-vector codes c0..c7 + total squared reconstruction error; "
    "vectors never shuffle (codebook literals inlined into codegen "
    "argmin; per round each subspace ships only K x (SUBD+1) aggregate "
    "partials) — the IVF-PQ compression layer at 100 TB",
    tags=("similarity", "mlprep", "iterative"),
)
def similarity_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = km.quantize(e).persist()

    seeds = km.seed_cents(q, PQ_K)  # full 64-dim rows; sliced per subspace
    if not seeds:
        return q.select(
            "vec_id",
            *[F.lit(0).cast("long").alias(f"c{m}") for m in range(PQ_M)],
            F.lit(0).cast("long").alias("err2"),
        )

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

    # Final pass: all 8 codes + the error in ONE map-only projection.
    out = q
    for m in range(PQ_M):
        out = _sub_assign(out, books[m], m)
    err = sum(
        (F.col(f"d{m}") for m in range(1, PQ_M)), F.col("d0")
    )
    return out.select(
        "vec_id",
        *[f"c{m}" for m in range(PQ_M)],
        err.cast("long").alias("err2"),
    )
