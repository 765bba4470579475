"""Product quantization (PQ) of the embedding corpus — the compression
half of the IVF-PQ ANN stack — plus the composed ``similarity_topk_ivfpq``
serve (probe IVF cells, ADC-rank only those cells' codes, exact re-rank
the shortlist): each 64-dim vector is split into ``PQ_M`` = 16 subspaces
of ``SUBD`` = 4 dims, a ``PQ_K``-centroid Lloyd codebook is trained per
subspace, and every vector is stored as ``PQ_M`` nibble codes + its
reconstruction error.  At 100 TB this is the difference between serving
ANN from 256 GB of raw floats and from ~8 GB of codes: the codebooks are
``PQ_M x PQ_K x SUBD`` integers of driver/broadcast state, and distance
tables against a query are ``PQ_M x PQ_K`` lookups.

Execution shape (train-once/serve-many, the ivf_index_path precedent —
VERDICT r8 item 2): :func:`pq_index_path` builds the index ONCE per
process per sf and persists ``books/`` (m, cell, cv) and ``codes/``
(vec_id, c0..c{PQ_M-1}, err2) to parquet; both catalog queries serve
from it.  Training is FUSED across subspaces: per Lloyd round there is
ONE Arrow-batched argmin pass computing all ``PQ_M`` assignments (the
codebook rides the UDF closure — the vectors never shuffle) and ONE
map-side-combinable aggregate over the exploded (m, cell) keys shipping
``PQ_M x PQ_K x (SUBD+1)`` partials — 2 jobs per round total, not
``PQ_M`` sequential per-subspace jobs (the r8 shape VERDICT flagged).
The final pass emits all ``PQ_M`` codes and the total squared
reconstruction error in a single map-only projection.

Oracle shape (the r8 driver-gate OOM fix — VERDICT r8 item 1): the SQL
trains all subspaces in ONE CTE chain over the exploded (vec_id, m,
subvector) relation — ~4 CTEs per Lloyd round instead of the r8 chain's
~11 per SUBSPACE (179 total, most multiply-referenced, which DuckDB
materialized and which blew the driver's tight memory cap).  The slim
chain is regression-pinned under a deliberately starved engine in
``tests/test_oracle_memory.py`` (``SET memory_limit='500MB'``).

Cross-engine exactness: the standing integer convention — quantized
inputs, integer squared distances, ``floor(sum/count)`` centroid
updates, argmin ties to the smaller cell — makes every code and the
error EXACT in both engines; the oracle is hash equality.

Part of the LLM-data-pipeline brief (similarity search at scale); the
reference engine has no ANN surface (SURVEY.md §2).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_dns_spark.plans import q_kmeans as km
from spark_dns_spark.plans import q_similarity as qs
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


def _sv_dist_sql(sv: str, cv: str) -> str:
    """DuckDB integer ||sv - cv||^2 over two SUBD-element lists."""
    return "0" + "".join(
        f" + ({sv}[{i}]-{cv}[{i}])*({sv}[{i}]-{cv}[{i}])"
        for i in range(1, SUBD + 1)
    )


def _pq_chain_body() -> str:
    """The fused train+assign CTE chain, assuming prior CTEs ``e``
    (vec_id, v) and ``q`` (vec_id, qv) exist.  ALL subspaces train in
    one chain over the exploded (vec_id, m, subvector) relation:
    ``pseeds`` are the PQ_K LCG-spread seed vectors, ``sub``/``ps0``
    slice them per subspace, then each Lloyd round is ONE windowed
    argmin (``pa{t}``) + ONE (m, cell, i) aggregate (``pu{t}``) +
    centroid refresh (``ps{t}``, empty cells keep their centroid);
    ``fin`` is the final per-(vec_id, m) code + distance."""
    subv = "[" + ", ".join(
        f"qv[m*{SUBD} + {i}]" for i in range(1, SUBD + 1)
    ) + "]"
    parts = [
        f"""
, pseeds AS (
  SELECT row_number() OVER (
           ORDER BY (vec_id * {SEED_A} + {SEED_B}) % {SEED_M}, vec_id
         ) - 1 AS cell, qv
  FROM q
  ORDER BY (vec_id * {SEED_A} + {SEED_B}) % {SEED_M}, vec_id
  LIMIT {PQ_K}
), ms AS (
  SELECT unnest(generate_series(0, {PQ_M - 1})) AS m
), sub AS (
  SELECT vec_id, m, {subv} AS sv FROM q, ms
), ps0 AS (
  SELECT m, cell, {subv} AS cv FROM pseeds, ms
)"""
    ]
    # Operator-lean argmin (VERDICT r13 item 1, the lloyd_cents_sql
    # shape): ONE hash aggregate per round over skinny (vec_id, m,
    # cell, d) rows — min of the injective d*ENC + cell encode, ties
    # decoded to the smaller cell exactly like the previous ORDER BY
    # d, cell window.  The update is one aggregate with SUBD explicit
    # sums.  Fewer blocking operators per round keeps the deep
    # composed oracle texts inside the driver's no-spill DuckDB
    # budget (plan size, not data size, was the r13 OOM).
    cv_sums = ", ".join(
        f"CAST(floor((sum(sv[{i}]))::DOUBLE / count(*)) AS BIGINT)"
        for i in range(1, SUBD + 1)
    )
    for t in range(1, PQ_ITERS):
        d_cur = _sv_dist_sql("b.sv", "s.cv")
        parts.append(
            f"""
, pa{t} AS (
  SELECT w.vec_id, w.m, b.sv, w.cell FROM (
    SELECT vec_id, m,
           CAST(min(d * {km.ARGMIN_ENC} + cell) % {km.ARGMIN_ENC}
                AS BIGINT) AS cell
    FROM (SELECT b.vec_id, b.m, s.cell, {d_cur} AS d
          FROM sub b JOIN ps{t - 1} s ON s.m = b.m)
    GROUP BY vec_id, m
  ) w JOIN sub b ON b.vec_id = w.vec_id AND b.m = w.m
), pg{t} AS (
  SELECT m, cell, [{cv_sums}] AS cv
  FROM pa{t} GROUP BY m, cell
), ps{t} AS (
  SELECT s.m, s.cell, coalesce(g.cv, s.cv) AS cv
  FROM ps{t - 1} s
  LEFT JOIN pg{t} g ON g.m = s.m AND g.cell = s.cell
)"""
        )
    d_fin = _sv_dist_sql("b.sv", "s.cv")
    parts.append(
        f"""
, fin AS (
  SELECT vec_id, m,
         CAST(mc % {km.ARGMIN_ENC} AS BIGINT) AS cell,
         CAST(mc // {km.ARGMIN_ENC} AS BIGINT) AS d
  FROM (
    SELECT vec_id, m, min(d * {km.ARGMIN_ENC} + cell) AS mc
    FROM (SELECT b.vec_id, b.m, s.cell, {d_fin} AS d
          FROM sub b JOIN ps{PQ_ITERS - 1} s ON s.m = b.m)
    GROUP BY vec_id, m
  )
)"""
    )
    return "".join(parts)


_PQ_PRELUDE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id, [{km.Q_COLS_SQL}] AS qv FROM e
)"""


def _pq_sql() -> str:
    """Codes + reconstruction error off the fused chain: one pivot of
    ``fin`` per vector."""
    codes = ", ".join(
        f"max(CASE WHEN m = {m} THEN cell END)::BIGINT AS c{m}"
        for m in range(PQ_M)
    )
    return (
        _PQ_PRELUDE
        + _pq_chain_body()
        + f"""
SELECT vec_id, {codes}, sum(d)::BIGINT AS err2
FROM fin GROUP BY vec_id"""
    )


def _quantize_arr(e: DataFrame) -> DataFrame:
    """(vec_id, v: array<double>) -> (vec_id, qv: array<bigint>) in the
    shared integer domain — ONE higher-order-function expression (the
    Spark mirror of ``[Q_COLS_SQL]``), identical values to
    :func:`km.quantize`'s 64 scalar projections but trivial to
    analyze/compile (the PQ path's expression trees stay small — see
    :func:`_assign_codes`)."""
    return e.select(
        "vec_id",
        F.expr(
            f"transform(v, x -> CAST(floor(x * {km.SCALE}D + 0.5D)"
            " AS BIGINT))"
        ).alias("qv"),
    )


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return _quantize_arr(e)


def _l2(a: str, b: str) -> F.Column:
    """Integer ||a - b||^2 between two array<bigint> columns — one HOF
    fold (exact int64 arithmetic, same values as the unrolled scalar
    form; the 64-term literal expansions the r8 path used cost seconds
    of analysis/janino per distinct plan)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, e) -> acc + e)"
    )


def _assign_codes(q: DataFrame, books: list[list[list[int]]]) -> DataFrame:
    """(vec_id, qv) -> (vec_id, qv, cd) where ``cd`` =
    [c0..c{PQ_M-1}, d0..d{PQ_M-1}]: every subspace's argmin code +
    squared distance in ONE Arrow-batched pandas UDF (numpy int64 —
    exact; ``argmin`` returns the FIRST minimum, i.e. ties break to
    the smaller cell, matching the oracle's ORDER BY d, cell).  The
    codebook rides the UDF closure (PQ_M x kk x SUBD ints — model
    state, not data), so the plan shape is identical across Lloyd
    rounds: no per-round recompilation, vectors never shuffle.

    Why a pandas UDF and not inlined-literal codegen (the kmeans/IVF
    pattern): PQ's codebook is PQ_M*PQ_K cells x SUBD dims = 1024+
    distance terms; as literals that is a fresh multi-second janino
    compile per round (measured — it dominated the r8 runtime), while
    one einsum-shaped numpy pass is a single stable Arrow stage.  The
    same trade sim.band_keys_arrow makes for LSH signatures."""
    cb = np.array(books, dtype=np.int64)  # (PQ_M, kk, SUBD)

    @F.pandas_udf("array<long>")
    def assign(qv: pd.Series) -> pd.Series:
        if not len(qv):
            return pd.Series([], dtype=object)
        x = np.stack(qv.to_numpy()).astype(np.int64)  # (b, DIM)
        return pd.Series(list(pq_encode_np(x, cb)))

    return q.select("vec_id", "qv", assign("qv").alias("cd"))


def pq_encode_np(x: "np.ndarray", cb: "np.ndarray") -> "np.ndarray":
    """The pure PQ encode kernel: ``(b, DIM)`` int64 vectors against a
    ``(PQ_M, kk, SUBD)`` codebook -> ``(b, 2*PQ_M)`` [codes, sq-dists].
    Module-level (not a closure) so the upsert family's merge algebra
    is property-testable without Spark (tests/test_upsert_properties.py
    replays adversarial batch splits against rebuild equality —
    VERDICT r9 item 7).  ``argmin`` returns the FIRST minimum: ties
    break to the smaller cell, matching the oracle's ORDER BY d, cell."""
    s = x.reshape(len(x), PQ_M, 1, SUBD)
    d = ((s - cb[None, :, :, :]) ** 2).sum(axis=3)  # (b, PQ_M, kk)
    c = d.argmin(axis=2)
    dm = np.take_along_axis(d, c[:, :, None], axis=2)[:, :, 0]
    return np.concatenate([c, dm], axis=1)


def _codes_df(out: DataFrame) -> DataFrame:
    """Pivot :func:`_assign_codes` output ``cd`` into the stored codes
    shape (vec_id, c0..c{PQ_M-1}, err2): the code columns are the first
    PQ_M entries, err2 is the sum of the trailing PQ_M squared
    subspace distances."""
    return out.select(
        "vec_id",
        *[F.expr(f"cd[{m}]").alias(f"c{m}") for m in range(PQ_M)],
        F.expr(
            f"aggregate(slice(cd, {PQ_M + 1}, {PQ_M}), 0L, "
            "(acc, e) -> acc + e)"
        ).alias("err2"),
    )


def _train_books(q: DataFrame) -> list[list[list[int]]] | None:
    """Train ALL per-subspace codebooks fused (None on an empty corpus).

    Per Lloyd round: ONE projection computes every subspace's argmin
    (:func:`_assign_codes` — Arrow-batched, vectors never shuffle),
    then ONE aggregate over the exploded (m, cell) keys
    ships ``PQ_M x PQ_K x (SUBD+1)`` map-side-combined partials — 2
    jobs per round, vs the r8 shape's PQ_M sequential per-subspace
    jobs (VERDICT r8 item 2).  A corpus with 1..PQ_K-1 vectors trains
    that many cells (codes stay in range — ADVICE r8)."""
    rows = (
        q.orderBy(
            (F.col("vec_id") * SEED_A + SEED_B) % SEED_M, "vec_id"
        )
        .limit(PQ_K)
        .collect()
    )
    seeds = [
        [int(x) for x in r["qv"]] for r in rows
    ]  # full 64-dim rows; sliced per subspace
    if not seeds:
        return None
    kk = len(seeds)  # < PQ_K on a tiny corpus: train only kk cells
    books = [
        [sv[m * SUBD : (m + 1) * SUBD] for sv in seeds] for m in range(PQ_M)
    ]
    for _ in range(PQ_ITERS - 1):
        asg = _assign_codes(q, books)
        ex = asg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            F.expr(f"cd[{m}]").alias("cell"),
                            *[
                                F.expr(f"qv[{m * SUBD + i}]").alias(f"x{i}")
                                for i in range(SUBD)
                            ],
                        )
                        for m in range(PQ_M)
                    ]
                )
            ).alias("s")
        ).select("s.*")
        sums = ex.groupBy("m", "cell").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(f"x{i}").alias(f"s{i}") for i in range(SUBD)],
        ).collect()
        upd = {
            (int(r["m"]), int(r["cell"])): [
                math.floor(int(r[f"s{i}"]) / int(r["n"]))
                for i in range(SUBD)
            ]
            for r in sums
        }
        books = [
            [upd.get((m, j), books[m][j]) for j in range(kk)]
            for m in range(PQ_M)
        ]
    return books


#: process-lifetime cache of built PQ indexes — train-once/serve-many
#: via feeds.cached_index_path (lock + source-mtime keyed, ADVICE r8).
_PQ_INDEX: dict = {}


def _build_pq_index(spark: SparkSession, q: DataFrame, root: str) -> None:
    """Train books on ``q`` and persist ``books/`` + its codes to
    ``root`` (the shared body of the full and base-corpus builds)."""
    q = q.persist()
    books = _train_books(q)
    if books is None:
        codes = spark.createDataFrame(
            [],
            "vec_id bigint, "
            + ", ".join(f"c{m} bigint" for m in range(PQ_M))
            + ", err2 bigint",
        )
        bdf = spark.createDataFrame(
            [], "m bigint, cell bigint, cv array<bigint>"
        )
    else:
        codes = _codes_df(_assign_codes(q, books))
        bdf = spark.createDataFrame(
            [
                (m, j, cv)
                for m, book in enumerate(books)
                for j, cv in enumerate(book)
            ],
            "m bigint, cell bigint, cv array<bigint>",
        )
    bdf.coalesce(1).write.mode("overwrite").parquet(f"{root}/books")
    codes.write.mode("overwrite").parquet(f"{root}/codes")
    q.unpersist()


def pq_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per sf) the persisted PQ index:
    ``books/`` (m, cell, cv) — the trained codebooks — and ``codes/``
    (vec_id, c0..c{PQ_M-1}, err2) — every vector's nibble codes + its
    squared reconstruction error.  At 100 TB the codes table is ~PQ_M
    bytes/vector (vs 8*DIM raw) and is what ADC serving scans."""

    def build(root: str) -> None:
        _build_pq_index(spark, _quantized(spark, sf_dir), root)

    from spark_dns_spark.plans.feeds import cached_index_path  # noqa: PLC0415

    return cached_index_path(
        _PQ_INDEX, sf_dir, "embeddings.parquet", build, name="pq"
    )


def _load_books(spark: SparkSession, root: str) -> list[list[list[int]]]:
    """The PQ_M x kk x SUBD codebook model from ``books/`` (a K-row
    collect — the whitelisted model-state class).

    Unlike the IVF coarse centroids (KC = isqrt(n), a GROWER — served
    via q_similarity.load_cents' sharded path above KC_DRIVER_MAX),
    this model is corpus-size-INDEPENDENT: PQ_M x PQ_K x SUBD =
    16 x 16 x 4 = 1024 ints regardless of n, so collect-and-close-over
    is the permanently correct shape here (VERDICT r10 item 3 note).
    Loaded via pyarrow (km.read_parquet_dir) instead of a
    ``spark.read...collect()`` job — same r15 driver-overhead fix as
    q_similarity.load_cents (~0.35 s of per-serve job latency)."""
    rows = km.read_parquet_dir(f"{root}/books", ["m", "cell", "cv"]).to_pylist()
    rows.sort(key=lambda r: (r["m"], r["cell"]))
    books: list[list[list[int]]] = [[] for _ in range(PQ_M)]
    for r in rows:
        books[int(r["m"])].append([int(x) for x in r["cv"]])
    return books


@register(
    "similarity_pq_codes",
    _pq_sql(),
    doc=f"product quantization: {PQ_M} subspaces x {SUBD} dims, "
    f"{PQ_K}-centroid integer-exact Lloyd codebook per subspace "
    f"({PQ_ITERS} iters, LCG-hash-spread seeds), emitting per-vector "
    f"codes c0..c{PQ_M - 1} + total squared reconstruction error; "
    "served from the PREBUILT parquet index (pq_index_path — "
    "train-once/serve-many); training is fused (2 jobs per Lloyd "
    "round for ALL subspaces: one Arrow-batched argmin pass + one "
    "exploded (m,cell) aggregate, vectors never shuffle) — the "
    "IVF-PQ compression layer at 100 TB",
    tags=("similarity", "mlprep", "iterative"),
)
def similarity_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = pq_index_path(spark, sf_dir)
    return spark.read.parquet(f"{root}/codes").select(
        "vec_id", *[f"c{m}" for m in range(PQ_M)], "err2"
    )


# ---------------------------------------------------------------------------
# ADC serving + recall gate: the PQ index actually answering queries.
# ---------------------------------------------------------------------------

ADC_QMOD = 50  #: query set = vec_id % ADC_QMOD == 0 (the ANN-tier budget)
#: Cap on the recall sample size: recall@K is a SAMPLED statistic, so
#: the ground-truth budget must not grow linearly with the corpus —
#: this metric runs TWO brute-force |Q|x|C| windows (exact + decoded)
#: on top of the PQ training chain, and a linear |Q| made the DuckDB
#: oracle exceed a 15 GB memory cap at sf1 (ORACLE_SF1_r9).  The
#: effective modulus ADC_QMOD * max(1, n // (ADC_QMOD*ADC_QBUDGET)) is
#: the identity for n <= 5000 (so sf0.001/0.01/0.1 results are
#: byte-unchanged) and bounds |Q| near ADC_QBUDGET beyond that; the
#: same integer formula is evaluated in both engines.
ADC_QBUDGET = 100
RECALL_K = 10  #: top-K for both the exact ground truth and the ADC ranking
#: ADC shortlist before the exact re-rank (the standard two-stage PQ
#: serve: codes prune the corpus to the shortlist, exact distances are
#: computed only on those).  Scale-adaptive like the IVF/LSH probe
#: budgets: max(5x the final K, corpus/10) — a fixed shortlist would
#: silently degrade recall as the corpus grows.
SHORTLIST_MIN = 5 * RECALL_K
SHORTLIST_DIV = 10


def _recon_cte() -> str:
    """Reconstructed vectors off the fused chain: decode = join codes
    to their codewords, concat in subspace order."""
    return f"""
, recon AS (
  SELECT f.vec_id, flatten(list(s.cv ORDER BY f.m)) AS rv
  FROM fin f JOIN ps{PQ_ITERS - 1} s ON s.m = f.m AND s.cell = f.cell
  GROUP BY f.vec_id
)"""


def _adc_sql() -> str:
    return (
        _PQ_PRELUDE
        + _pq_chain_body()
        + _recon_cte()
        + f"""
, qn AS (
  SELECT {ADC_QMOD} * greatest(
           1, count(*) // {ADC_QMOD * ADC_QBUDGET}) AS m
  FROM q
), qrs AS (
  SELECT vec_id AS query_id, qv FROM q, qn WHERE vec_id % qn.m = 0
), ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY d ASC, neighbor_id) AS rn
    FROM (SELECT qr.query_id, dd.vec_id AS neighbor_id,
                 {km.dist_sql("qr.qv", "dd.qv")} AS d
          FROM qrs qr JOIN q dd ON dd.vec_id <> qr.query_id)
  ) WHERE rn <= {RECALL_K}
), sl AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY d ASC, neighbor_id) AS rn
    FROM (SELECT qr.query_id, rc.vec_id AS neighbor_id,
                 {km.dist_sql("qr.qv", "rc.rv")} AS d
          FROM qrs qr JOIN recon rc ON rc.vec_id <> qr.query_id)
  ) WHERE rn <= greatest({SHORTLIST_MIN},
                         (SELECT count(*) FROM q) // {SHORTLIST_DIV})
), ad AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY d ASC, neighbor_id) AS rn
    FROM (SELECT sl.query_id, sl.neighbor_id,
                 {km.dist_sql("qr.qv", "dd.qv")} AS d
          FROM sl JOIN qrs qr ON qr.query_id = sl.query_id
                  JOIN q dd ON dd.vec_id = sl.neighbor_id)
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


def _recon_from_codes(
    spark: SparkSession, root: str, books: list[list[list[int]]]
) -> DataFrame:
    """(neighbor_id, rv: array<bigint>): map-only ADC decode of the
    stored codes — one Arrow-batched numpy gather per batch, the
    codeword tables riding the UDF closure (model state, no join)."""
    cb = np.array(books, dtype=np.int64)  # (PQ_M, kk, SUBD)

    @F.pandas_udf("array<long>")
    def decode(codes: pd.Series) -> pd.Series:
        if not len(codes):
            return pd.Series([], dtype=object)
        cm = np.stack(codes.to_numpy()).astype(np.int64)  # (b, PQ_M)
        rv = cb[np.arange(PQ_M)[None, :], cm]  # (b, PQ_M, SUBD)
        return pd.Series(list(rv.reshape(len(cm), PQ_M * SUBD)))

    return spark.read.parquet(f"{root}/codes").select(
        F.col("vec_id").alias("neighbor_id"),
        decode(F.array(*[f"c{m}" for m in range(PQ_M)])).alias("rv"),
    )


@register(
    "similarity_pq_adc_recall",
    _adc_sql(),
    doc=f"two-stage PQ-ADC serving + its accountability metric: each "
    f"vector is reconstructed ONCE from its {PQ_M} stored codes "
    "(map-only codeword-literal lookups — the asymmetric-distance "
    f"decode), the ADC ranking prunes the corpus to a "
    f"max({SHORTLIST_MIN}, corpus/{SHORTLIST_DIV})-candidate "
    f"shortlist, exact distances re-rank ONLY the shortlist to "
    f"top-{RECALL_K}, and recall@{RECALL_K} is measured against the "
    "exact ground truth — the same self-measuring pattern as "
    f"similarity_ivf_recall/lsh_recall, over a query sample bounded "
    f"near {ADC_QBUDGET} at any corpus size (recall is a sampled "
    "statistic; the ground-truth cost must not scale with the "
    "corpus); serves from the prebuilt "
    "pq_index_path index (no per-invocation retrain); at 100 TB the "
    "first stage touches only codes (PQ_M bytes/vector) and the "
    "vectors are read for ~SHORTLIST candidates per query, never "
    "scanned",
    tags=("similarity", "metric", "iterative"),
)
def similarity_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = pq_index_path(spark, sf_dir)
    books = _load_books(spark, root)
    if not any(books):
        return spark.createDataFrame(
            [], "query_id bigint, hits bigint, recall_e4 bigint"
        )
    # Lifetime: released by the consuming harness / the catalog
    # wrapper's release_all_caches at the next query entry (the result
    # is consumed after return, so a finally-unpersist here would
    # recompute the final collect — see session.release_all_caches).
    q = _quantized(spark, sf_dir).persist()
    recon = _recon_from_codes(spark, root, books)
    # Bounded recall sample (see ADC_QBUDGET): identical integer
    # modulus formula as the oracle's qn CTE.  The count comes from
    # parquet footers (guide §5) — _quantized is a 1:1 map of
    # embeddings, so the footer row count IS the frame count.
    nq = qs.corpus_rows(sf_dir)
    qmod = ADC_QMOD * max(1, nq // (ADC_QMOD * ADC_QBUDGET))
    queries = q.filter(F.col("vec_id") % qmod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )

    # Q-row query set broadcast onto the corpus / the recon table — the
    # whitelisted brute-force class (this IS the ground-truth metric).
    exact = _topk_by(
        q.withColumnRenamed("vec_id", "neighbor_id").join(
            F.broadcast(queries),
            F.col("neighbor_id") != F.col("query_id"),
        ),
        _l2("qq", "qv"),
        RECALL_K,
    )
    # Two-stage serve: ADC over the codes prunes the corpus to the
    # scale-adaptive shortlist; exact distances only on the shortlist.
    shortlist_k = max(SHORTLIST_MIN, nq // SHORTLIST_DIV)
    shortlist = _topk_by(
        recon.join(
            F.broadcast(queries),
            F.col("neighbor_id") != F.col("query_id"),
        ),
        _l2("qq", "rv"),
        shortlist_k,
    )
    adc = _topk_by(
        shortlist.join(
            q.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
        ).join(F.broadcast(queries), "query_id"),
        _l2("qq", "qv"),
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


def _topk_by(pairs: DataFrame, dist: F.Column, k: int) -> DataFrame:
    """Per-query top-k of (query_id, neighbor_id) pairs by the given
    integer distance column (ties to the smaller neighbor_id —
    WindowGroupLimit pushes the partial top-k map-side)."""
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        pairs.withColumn("d2", dist)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id")
    )


# ---------------------------------------------------------------------------
# IVF-PQ composition: the serve a 100 TB similarity service actually runs.
# ---------------------------------------------------------------------------

#: ADC shortlist per query AFTER the IVF probe prune (the probe already
#: cuts the corpus to ~NPROBE of the isqrt(n) cells — a SHRINKING
#: fraction as the corpus grows; the codes then cut the survivors
#: to the shortlist before any raw vector is read).  Scale-adaptive
#: like SHORTLIST_*: max(10K, corpus/10) — wider than the pure-ADC
#: shortlist because this stage re-ranks by cosine while ADC prunes by
#: L2, and the probe has already cut the candidate pool (measured
#: recall@10 vs brute force: 0.84/0.85 at sf0.001/0.01 at this width;
#: 0.78/0.77 at half of it).
IVFPQ_SHORT_MIN = 10 * qs.K
IVFPQ_SHORT_DIV = 10

_IVFPQ_CHAIN = (
    qs._IVF_CTE
    + f"""
, probes AS (
  SELECT query_id, cell FROM (
    SELECT query_id, cell,
           row_number() OVER (
             PARTITION BY query_id ORDER BY d ASC, cell) AS rn
    FROM (SELECT q.vec_id AS query_id, c.cell,
                 {km.dist_sql("q.qv", "c.cv")} AS d
          FROM (SELECT * FROM q WHERE vec_id % {qs.QMOD} = 0) q,
               {qs._IVF_CENTS_CTE} c)
  ) WHERE rn <= (SELECT np FROM nprm)
), icand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.query_id
)"""
    + _pq_chain_body()
    + _recon_cte()
    + f"""
, cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY d ASC, neighbor_id) AS rn
    FROM (SELECT ic.query_id, ic.neighbor_id,
                 {km.dist_sql("qq.qv", "rc.rv")} AS d
          FROM icand ic
          JOIN q qq ON qq.vec_id = ic.query_id
          JOIN recon rc ON rc.vec_id = ic.neighbor_id)
  ) WHERE rn <= greatest({IVFPQ_SHORT_MIN},
                         (SELECT count(*) FROM q) // {IVFPQ_SHORT_DIV})
)
"""
)

_IVFPQ_SQL = _IVFPQ_CHAIN + qs._scored_topk_sql("")


@register(
    "similarity_topk_ivfpq",
    _IVFPQ_SQL,
    doc=f"IVF-PQ ANN serving — the FAISS-style composition of both "
    f"prebuilt indexes (VERDICT r8 item 3): queries probe "
    "ceil(log2 n) of the corpus-scaled isqrt(n) IVF "
    "cells from the stored postings "
    "(ivf_index_path), the survivors are ADC-ranked using ONLY their "
    f"stored PQ codes (pq_index_path; map-only codeword-literal "
    f"decode) down to a max({IVFPQ_SHORT_MIN}, "
    f"corpus/{IVFPQ_SHORT_DIV}) shortlist, and exact cosine re-ranks "
    f"the shortlist to top-{qs.K}; at 100 TB a query reads ~30% of "
    "the (cell-partitioned) postings, the codes for those postings "
    f"({PQ_M} bytes/vector), and raw vectors only for the shortlist",
    tags=("similarity", "ivf", "pq"),
)
def similarity_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivfpq_topk(spark, sf_dir)


def _ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed serve as an unwrapped builder (the recall metric
    composes it without re-entering the catalog wrapper, which would
    release the outer query's caches — the _ivf_topk precedent)."""
    n = qs._vectors(spark, sf_dir)
    ivf_root = qs.ivf_index_path(spark, sf_dir)
    pq_root = pq_index_path(spark, sf_dir)
    cents = qs.load_cents(spark, f"{ivf_root}/cents")
    books = _load_books(spark, pq_root)
    if not cents or not any(books):
        return qs._scored_topk(
            n,
            n.select(F.col("vec_id").alias("query_id")).limit(0).select(
                "query_id", F.col("query_id").alias("neighbor_id")
            ),
        )
    asg = spark.read.parquet(f"{ivf_root}/asg").withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    qq = km.quantize(
        n.filter(F.col("vec_id") % qs.QMOD == 0).select("vec_id", "v")
    )
    # footer-metadata row count (qs._nrows), not a count() job: the
    # composed serve paid TWO full-scan driver jobs per invocation
    # (nprobe + shortlist sizing) that every other serve already reads
    # from the _corpus_rows attribute (guide §5, the r15 pattern)
    nv = qs._nrows(n)
    probes = qs._nearest_cells(qq, cents, qs.nprobe(nv)).withColumnRenamed(
        "vec_id", "query_id"
    )
    # Pin the candidate-dedup exchange's post-shuffle side to full
    # shuffle parallelism (r16, the range-serve fix): the stage after
    # it decodes PQ codes and evaluates the interpreted L2 fold on
    # every candidate — compute-heavy, byte-light, so AQE's byte-based
    # coalescing collapsed it to a single task (profiled two ~0.5 s
    # 1-task stages per recall run).  REPARTITION_BY_NUM is exempt
    # from the coalesce rule and satisfies the distinct's clustering
    # requirement (no extra exchange).
    icand = (
        qs._pin(
            probes.join(asg, "cell")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id"),
            "query_id", "neighbor_id",
        )
        .distinct()
    )
    # ADC stage: decode survivors from their stored codes (map-only),
    # rank by integer L2 against the (broadcast) quantized queries.
    recon = _recon_from_codes(spark, pq_root, books)
    # Reuse the probe stage's quantized queries (km.quantize == the
    # array form value-for-value) — one query scan, not two.
    queries = qq.select(
        F.col("vec_id").alias("query_id"), km._qarr().alias("qq")
    )
    shortlist_k = max(IVFPQ_SHORT_MIN, nv // IVFPQ_SHORT_DIV)
    cand = _topk_by(
        icand.join(recon, "neighbor_id").join(F.broadcast(queries), "query_id"),
        _l2("qq", "rv"),
        shortlist_k,
    )
    # Exact re-rank: raw vectors are read ONLY for the shortlist pairs.
    return qs._scored_topk(n, cand)


@register(
    "similarity_ivfpq_recall",
    # ONE shared WITH chain (VERDICT r13 item 1): the previous form
    # nested the full brute-force AND IVF-PQ serve texts as separate
    # derived-table subqueries, so the corpus/centroid/codebook CTEs
    # were planned and executed twice — the doubled plan is what blew
    # the driver's no-spill DuckDB budget.  Here the serve chain is
    # built once and the brute-force truth is two extra CTEs over the
    # already-shared n.
    _IVFPQ_CHAIN
    + f"""
, ivfk AS ({qs._scored_topk_body("cand")}
), bfc AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id % {qs.QMOD} = 0
), bfk AS ({qs._scored_topk_body("bfc")}
)
SELECT bfk.query_id,
       sum(CASE WHEN iv.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS hits,
       (sum(CASE WHEN iv.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         * {10000 // qs.K})::BIGINT AS recall_e4
FROM bfk LEFT JOIN ivfk iv
  ON iv.query_id = bfk.query_id AND iv.neighbor_id = bfk.neighbor_id
GROUP BY bfk.query_id
""",
    doc=f"self-measuring ANN quality for the composed IVF-PQ serve: "
    f"recall@{qs.K} against the exact brute-force ground truth per "
    "query (measured mean 0.84/0.85 at sf0.001/0.01) — completes the "
    "measured-quality story for every serving tier (LSH, IVF, pure "
    "ADC, and now the composition production actually runs); "
    "integer-exact hit counts, hash-equality oracle",
    tags=("similarity", "ivf", "pq", "metric"),
)
def similarity_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = qs._bf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    iv = (
        _ivfpq_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        bf.join(iv, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("hits"))
        .select(
            "query_id",
            "hits",
            (F.col("hits") * F.lit(10000 // qs.K)).alias("recall_e4"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental PQ index maintenance: encode-only upsert of a new batch.
# ---------------------------------------------------------------------------

#: process-lifetime cache of the BASE-corpus PQ index (books + codes
#: trained/encoded without the vec_id % UP_MOD == UP_REM batch).
_PQ_BASE_INDEX: dict = {}


def pq_base_index_path(spark: SparkSession, sf_dir: str) -> str:
    """The persisted PQ index of the base corpus only (codebooks
    trained and codes encoded WITHOUT the new batch) — the stored
    model state an incremental upsert appends to."""

    def build(root: str) -> None:
        q = _quantized(spark, sf_dir).filter(
            (F.col("vec_id") % qs.UP_MOD) != qs.UP_REM
        )
        _build_pq_index(spark, q, root)

    from spark_dns_spark.plans.feeds import cached_index_path  # noqa: PLC0415

    return cached_index_path(
        _PQ_BASE_INDEX, sf_dir, "embeddings.parquet", build,
        name="pq_base",
    )


def _pq_upsert_sql() -> str:
    """Oracle: train the chain on the BASE corpus, then ONE assignment
    of every vector against the final codebooks — identical to stored
    base codes + encode-only delta because the stored codes were
    themselves produced by that same final-book assignment."""
    subv = "[" + ", ".join(
        f"qv[m*{SUBD} + {i}]" for i in range(1, SUBD + 1)
    ) + "]"
    d = _sv_dist_sql("b.sv", "s.cv")
    codes = ", ".join(
        f"max(CASE WHEN m = {m} THEN cell END)::BIGINT AS c{m}"
        for m in range(PQ_M)
    )
    return (
        f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), qa AS (
  SELECT vec_id, [{km.Q_COLS_SQL}] AS qv FROM e
), q AS (
  SELECT * FROM qa WHERE vec_id % {qs.UP_MOD} <> {qs.UP_REM}
)"""
        + _pq_chain_body()
        + f"""
, asub AS (
  SELECT vec_id, m, {subv} AS sv FROM qa, ms
), afin AS (
  SELECT vec_id, m, cell, d FROM (
    SELECT b.vec_id, b.m, s.cell, {d} AS d,
           row_number() OVER (
             PARTITION BY b.vec_id, b.m
             ORDER BY {d} ASC, s.cell) AS rn
    FROM asub b JOIN ps{PQ_ITERS - 1} s ON s.m = b.m
  ) WHERE rn = 1
)
SELECT vec_id, {codes}, sum(d)::BIGINT AS err2,
       CASE WHEN vec_id % {qs.UP_MOD} = {qs.UP_REM} THEN 1 ELSE 0 END
         AS is_new
FROM afin GROUP BY vec_id"""
    )


@register(
    "similarity_pq_upsert",
    _pq_upsert_sql(),
    doc=f"INCREMENTAL PQ index maintenance — completes the "
    "minhash/IVF/PQ upsert symmetry (dedup_minhash_incremental, "
    f"similarity_ivf_upsert): the base corpus's PQ index (codebooks + "
    f"codes trained without the new batch vec_id%{qs.UP_MOD}=="
    f"{qs.UP_REM}) is a persisted parquet index (pq_base_index_path); "
    "the new batch is ENCODED against the stored codebooks (one "
    "Arrow-batched argmin pass over the delta only — the corpus is "
    "never re-encoded) and appended with is_new=1; the merged codes "
    "equal a from-scratch encode-all at the same model state "
    "(tests/test_pq_upsert.py proves byte-identity + one stored-codes "
    "scan).  Oracle = train-on-base then encode-everything.  At "
    "100 TB this is the daily-crawl shape: batch cost is proportional "
    "to |delta| x PQ_M lookups, and codebook drift is a deliberate, "
    "monitorable retrain decision (err2 on new batches), not an "
    "implicit per-run retrain",
    tags=("similarity", "pq", "incremental"),
)
def similarity_pq_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pq_upsert(spark, sf_dir)


def _pq_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unwrapped upsert builder (the _ivfpq_topk precedent): callable
    from other catalog queries without re-entering the registration
    wrapper, whose release_all_caches must not run mid-query
    (ADVICE r9)."""
    root = pq_base_index_path(spark, sf_dir)
    base = spark.read.parquet(f"{root}/codes").withColumn(
        "is_new", F.lit(0)
    )
    books = _load_books(spark, root)
    if not any(books):
        return base
    delta = _quantized(spark, sf_dir).filter(
        (F.col("vec_id") % qs.UP_MOD) == qs.UP_REM
    )
    dcodes = _codes_df(_assign_codes(delta, books)).withColumn(
        "is_new", F.lit(1)
    )
    return base.unionByName(dcodes)


@register(
    "similarity_pq_upsert_stream",
    _pq_upsert_sql(),
    doc="the PQ encoder as a CONTINUOUS pipeline stage: the new-batch "
    "embeddings arrive as a parquet file stream (two micro-batches "
    "under maxFilesPerTrigger=1), and the encode-against-stored-"
    "codebooks step runs UNCHANGED inside Structured Streaming — it "
    "is a stateless Arrow map (quantize + argmin, codebooks in the "
    "UDF closure), so no state store, no watermark, no shuffle; each "
    "micro-batch appends its codes exactly as the batch upsert "
    "would.  Final state (stored base codes + streamed delta codes) "
    "is byte-identical to similarity_pq_upsert, which IS the oracle. "
    "At 100 TB this is the daily-crawl ingestion loop: new vectors "
    "become servable codes at micro-batch latency for PQ_M lookups "
    "each, while codebook retrain stays a deliberate offline decision",
    tags=("similarity", "pq", "incremental", "streaming"),
)
def similarity_pq_upsert_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    from spark_dns_spark.plans.feeds import (  # noqa: PLC0415
        await_or_fail,
        scratch_dir,
        single_part_file,
    )

    root_idx = pq_base_index_path(spark, sf_dir)
    base = spark.read.parquet(f"{root_idx}/codes").withColumn(
        "is_new", F.lit(0)
    )
    books = _load_books(spark, root_idx)
    if not any(books):
        return base

    root = scratch_dir("pq_upsert_stream_")
    src_dir = os.path.join(root, "src")
    os.makedirs(src_dir)
    # The delta batch split into two arrivals (staged mtimes +
    # maxFilesPerTrigger=1 => two micro-batches crossing an encode
    # boundary), mirroring stream_dedup_replay's delivery setup.
    e = load_table(spark, sf_dir, "embeddings")
    delta = e.filter((F.col("vec_id") % qs.UP_MOD) == qs.UP_REM)
    for i, half in enumerate(
        (
            delta.filter(F.expr(f"(vec_id div {qs.UP_MOD}) % 2 = 0")),
            delta.filter(F.expr(f"(vec_id div {qs.UP_MOD}) % 2 = 1")),
        )
    ):
        part_dir = os.path.join(root, f"half{i}")
        half.coalesce(1).write.parquet(part_dir)
        part = single_part_file(part_dir, f"similarity_pq_upsert_stream half{i}")
        dst = os.path.join(src_dir, f"{i:02d}_batch.parquet")
        shutil.copy(part, dst)
        mt = os.stat(dst).st_mtime
        os.utime(dst, (mt - 10 * (1 - i), mt - 10 * (1 - i)))

    out = os.path.join(root, "out")
    physical = spark.read.parquet(src_dir).schema
    src = (
        spark.readStream.schema(physical)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    enc = _codes_df(
        _assign_codes(
            _quantize_arr(
                src.select(
                    "vec_id",
                    F.col("embedding").cast("array<double>").alias("v"),
                )
            ),
            books,
        )
    )
    q = (
        enc.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(root, ".ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_or_fail(q, 300)
    dcodes = spark.read.parquet(out).withColumn("is_new", F.lit(1))
    return base.unionByName(dcodes)


@register(
    "similarity_pq_drift",
    f"""
SELECT is_new, count(*)::BIGINT AS n,
       (sum(err2) // count(*))::BIGINT AS avg_err2
FROM ({_pq_upsert_sql()})
GROUP BY is_new
""",
    doc="the retrain trigger for the incremental PQ pipeline: mean "
    "squared reconstruction error of the NEW batch's codes (encoded "
    "against the stored codebooks) vs the base corpus's — when the "
    "delta's avg_err2 drifts above the base's, the frozen codebooks "
    "no longer fit the incoming distribution and a retrain is due; "
    "this turns 'codebook drift is a monitorable decision' from a "
    "docstring claim into a 2-row integer-exact metric (one map-side "
    "combinable aggregate over the upsert output)",
    tags=("similarity", "pq", "incremental", "metric"),
)
def similarity_pq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _pq_upsert(spark, sf_dir)
        .groupBy("is_new")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("sum(err2) div count(1)").alias("avg_err2"),
        )
    )


# ---------------------------------------------------------------------------
# FILTERED IVF-PQ: the composed serve a 100 TB *filtered* similarity
# service actually runs (VERDICT r11 item 3) — label prune -> probe
# stored cells -> ADC-rank stored codes -> exact re-rank.
# ---------------------------------------------------------------------------

#: The filtered ADC shortlist scales with the ELIGIBLE pool, not the
#: corpus: a rare label shrinks the candidate set to ~n/|labels| per
#: query, so the unfiltered corpus/10 width would exceed the whole
#: pool and the ADC stage would prune nothing — the shortlist is
#: max(IVFPQ_SHORT_MIN, n / (IVFPQ_SHORT_DIV * |labels|)), the same
#: pool/10 fraction the unfiltered serve keeps of the corpus.  At sf1
#: (600k vectors, 100 labels) that is a 600-candidate shortlist over a
#: ~6k eligible pool; at toy scale the MIN floor covers the pool and
#: the exact re-rank makes the serve equal the filtered-IVF serve.
_FLCNT_CTE = f"""
, flcnt AS (
  SELECT greatest(count(DISTINCT vec_id % {qs.RARE_MOD}), 1) AS nl FROM e
)"""

_FILT_IVFPQ_CHAIN = (
    qs._IVF_CTE
    + f"""
, rlab AS (
  SELECT vec_id, vec_id % {qs.RARE_MOD} AS rlabel FROM e
)"""
    + qs._LPRM_CTE
    + _FLCNT_CTE
    + f"""
, probes AS (
  SELECT query_id, cell FROM (
    SELECT query_id, cell,
           row_number() OVER (
             PARTITION BY query_id ORDER BY d ASC, cell) AS rn
    FROM (SELECT q.vec_id AS query_id, c.cell,
                 {km.dist_sql("q.qv", "c.cv")} AS d
          FROM (SELECT * FROM q WHERE vec_id % {qs.QMOD} = 0) q,
               {qs._IVF_CENTS_CTE} c)
  ) WHERE rn <= (SELECT wd FROM lprm) * (SELECT np FROM nprm)
), icand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM probes p
  JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.query_id
  JOIN rlab lq ON lq.vec_id = p.query_id
  JOIN rlab ln ON ln.vec_id = a.vec_id AND ln.rlabel = lq.rlabel
)"""
    + _pq_chain_body()
    + _recon_cte()
    + f"""
, cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY d ASC, neighbor_id) AS rn
    FROM (SELECT ic.query_id, ic.neighbor_id,
                 {km.dist_sql("qq.qv", "rc.rv")} AS d
          FROM icand ic
          JOIN q qq ON qq.vec_id = ic.query_id
          JOIN recon rc ON rc.vec_id = ic.neighbor_id)
  ) WHERE rn <= greatest({IVFPQ_SHORT_MIN},
                         (SELECT count(*) FROM q)
                           // ({IVFPQ_SHORT_DIV} * (SELECT nl FROM flcnt)))
)
"""
)

_FILT_IVFPQ_SQL = _FILT_IVFPQ_CHAIN + qs._scored_topk_sql("")


def _filtered_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-label filtered IVF-PQ serve (unwrapped; the recall metric
    composes it): :func:`_ivfpq_topk` with the rare-label prune at the
    postings join and the selectivity-scaled probe widening of
    ``_filtered_rare_topk`` — the four-stage filtered production
    serve: label prune -> probe stored cells -> ADC-rank stored codes
    -> exact re-rank."""
    parts = qs._filtered_icand(spark, sf_dir)
    books = _load_books(spark, pq_index_path(spark, sf_dir))
    n = parts["n"]
    if parts["icand"] is None or not any(books):
        return qs._scored_topk(
            n,
            n.select(F.col("vec_id").alias("query_id")).limit(0).select(
                "query_id", F.col("query_id").alias("neighbor_id")
            ),
        )
    return qs._scored_topk(
        n, _ivfpq_shortlist_from_icand(spark, sf_dir, parts, books)
    )


def _ivfpq_shortlist_from_icand(
    spark: SparkSession, sf_dir: str, parts: dict, books
) -> DataFrame:
    """The ADC half of the filtered IVF-PQ serve over a prebuilt
    ``_filtered_icand`` dict: decode stored codes, rank the eligible
    candidates by approximate L2, keep the pool-scaled shortlist.
    Split out (r15) so the fused retrieval pipeline shares ONE icand
    subplan between its two serves instead of building both serves
    from scratch."""
    pq_root = pq_index_path(spark, sf_dir)
    # label prune BEFORE the ADC stage: two skinny (id, label) joins —
    # at scale the label rides the postings table, so no decoded or
    # raw vector is ever read for an ineligible candidate
    recon = _recon_from_codes(spark, pq_root, books)
    queries = parts["qq"].select(
        F.col("vec_id").alias("query_id"), km._qarr().alias("qq")
    )
    shortlist_k = max(
        IVFPQ_SHORT_MIN,
        parts["n_count"] // (IVFPQ_SHORT_DIV * parts["n_labels"]),
    )
    return _topk_by(
        parts["icand"]
        .join(recon, "neighbor_id")
        .join(F.broadcast(queries), "query_id"),
        _l2("qq", "rv"),
        shortlist_k,
    )


@register(
    "similarity_topk_filtered_ivfpq",
    _FILT_IVFPQ_SQL,
    doc="FILTERED IVF-PQ ANN serve (VERDICT r11 item 3) — the "
    "composition a 100 TB filtered vector service actually runs, at "
    f"the ~1%-selectivity rare tier (vec_id % {qs.RARE_MOD}): label "
    "prune at the postings join (no decoded or raw vector is read for "
    "an ineligible candidate), selectivity-scaled probe widening "
    "(filter_widen of the measured label count — the rare serve's "
    "rule), ADC-rank the eligible survivors from their STORED PQ "
    "codes down to a pool-scaled shortlist (max("
    f"{IVFPQ_SHORT_MIN}, n/({IVFPQ_SHORT_DIV}*|labels|)) — the "
    "corpus-scaled width would exceed the whole eligible pool), and "
    "exact cosine re-rank only the shortlist.  Exact-oracle: the same "
    "index algebra + label equi-join + ADC decode in both engines",
    tags=("similarity", "ivf", "pq", "filtered"),
    tier=5.5,
)
def similarity_topk_filtered_ivfpq(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _filtered_ivfpq_topk(spark, sf_dir)


@register(
    "similarity_filtered_ivfpq_recall",
    _FILT_IVFPQ_SQL.replace(
        "SELECT query_id, neighbor_id, cosine, rank FROM (",
        ", flt AS (\nSELECT query_id, neighbor_id, cosine, rank FROM (",
        1,
    )
    + f"""
), btr AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id) AS rank
    FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round({qs.sim.dot_sql("q.v", "c.v")} / (q.nm * c.nm), 4)
                   AS cosine
          FROM n q
          JOIN e ec ON ec.vec_id % {qs.RARE_MOD} = q.vec_id % {qs.RARE_MOD}
                   AND ec.vec_id <> q.vec_id
          JOIN n c ON c.vec_id = ec.vec_id
          WHERE q.vec_id % {qs.QMOD} = 0)
  ) WHERE rank <= {qs.K}
)
SELECT b.query_id,
       count(*)::BIGINT AS truth_n,
       sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS hits,
       CAST((sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             * 10000) // count(*) AS BIGINT) AS recall_e4
FROM btr b LEFT JOIN flt f
  ON f.query_id = b.query_id AND f.neighbor_id = b.neighbor_id
GROUP BY b.query_id
""",
    doc="self-measuring quality for the FILTERED IVF-PQ serve — the "
    "standing rule that every approximate serve ships with the query "
    "that scores it: exact same-rare-label brute top-k over the "
    "bounded query sample vs the composed filtered serve.  This is "
    "the metric that would catch BOTH filtered-ANN failure modes at "
    "once: a selective filter starving the probed cells (probe "
    "widening is the fix) and PQ quantization error evicting true "
    "neighbors from the ADC shortlist (the pool-scaled shortlist is "
    "the fix).  Floor gated at 0.75 in tests/test_ann_recall_gate.py",
    tags=("similarity", "ivf", "pq", "filtered", "metric"),
    tier=5.5,
)
def similarity_filtered_ivfpq_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    n = qs._vectors(spark, sf_dir)
    rlab = n.select(
        "vec_id", (F.col("vec_id") % qs.RARE_MOD).alias("rlabel")
    )
    qn = n.filter(F.col("vec_id") % qs.QMOD == 0)
    cand = (
        qn.select(F.col("vec_id").alias("query_id"))
        .join(
            rlab.select(
                F.col("vec_id").alias("query_id"),
                F.col("rlabel").alias("q_label"),
            ),
            "query_id",
        )
        .join(
            rlab.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("rlabel").alias("n_label"),
            ),
            F.col("n_label") == F.col("q_label"),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    truth = qs._scored_topk(n, cand).select("query_id", "neighbor_id")
    served = (
        _filtered_ivfpq_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        truth.join(served, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("truth_n"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("hits"),
        )
        .select(
            "query_id",
            "truth_n",
            "hits",
            F.expr("hits * 10000 div truth_n").alias("recall_e4"),
        )
    )


# ---------------------------------------------------------------------------
# Fused filtered retrieval: the production RAG serving shape
# (VERDICT r11 item 5) — filter -> retrieve (two families) -> RRF-fuse
# -> MMR-diversify, all at the ~1%-selectivity rare tier.
# ---------------------------------------------------------------------------

_FUSED_MMR_SQL = (
    # ONE shared WITH chain (VERDICT r13 item 1): the previous form
    # nested the full RARE serve and the full filtered IVF-PQ serve as
    # two independent derived-table subqueries — the corpus, centroid
    # chain, postings, label, and widening CTEs were all planned and
    # executed TWICE, and this 44.7 KB text was the single biggest
    # oracle OOM on the driver's no-spill DuckDB.  Both serves share
    # probes/icand verbatim (same widened bound, same label prune), so
    # the fused chain computes them once: r1k is the RARE serve (exact
    # re-rank of icand), r2k the IVF-PQ serve (ADC shortlist `cand`
    # re-ranked), then RRF + greedy MMR exactly as before.  n replaces
    # the old nv CTE — same vec_id/v/nm expressions, shared upstream.
    _FILT_IVFPQ_CHAIN
    + f"""
, r1k AS ({qs._scored_topk_body("icand")}
), r2k AS ({qs._scored_topk_body("cand")}
), allr AS (
  SELECT query_id, neighbor_id,
         {qs.RRF_SCALE} // ({qs.RRF_K} + rank) AS contrib FROM r1k
  UNION ALL
  SELECT query_id, neighbor_id,
         {qs.RRF_SCALE} // ({qs.RRF_K} + rank) AS contrib FROM r2k
), fusedt AS (
  SELECT query_id, neighbor_id,
         CAST(sum(contrib) AS BIGINT) AS rrf_e6
  FROM allr GROUP BY query_id, neighbor_id
), shortl AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rrf_e6 DESC, neighbor_id) AS rank
    FROM fusedt
  ) WHERE rank <= {qs.K}
), base AS MATERIALIZED (
  SELECT s.query_id, s.neighbor_id,
         CAST(round(round({qs.sim.dot_sql("va.v", "vb.v")}
                          / (va.nm * vb.nm), 4) * 10000) AS BIGINT)
           AS rel_e4
  FROM shortl s
  JOIN n va ON va.vec_id = s.query_id
  JOIN n vb ON vb.vec_id = s.neighbor_id
), pair AS MATERIALIZED (
  SELECT b1.query_id, b1.neighbor_id AS a, b2.neighbor_id AS b,
         CAST(round(round({qs.sim.dot_sql("va.v", "vb.v")}
                          / (va.nm * vb.nm), 4) * 10000) AS BIGINT)
           AS sim_e4
  FROM base b1
  JOIN base b2 ON b2.query_id = b1.query_id
              AND b2.neighbor_id <> b1.neighbor_id
  JOIN n va ON va.vec_id = b1.neighbor_id
  JOIN n vb ON vb.vec_id = b2.neighbor_id
)"""
    + qs._mmr_rounds_sql(qs.MMR_SELECT)
)


@register(
    "retrieval_filtered_fused_mmr",
    _FUSED_MMR_SQL,
    doc="the full production RAG serving pipeline in ONE entry "
    "(VERDICT r11 item 5): FILTER (the ~1%-selectivity rare label) -> "
    "RETRIEVE from two stored-index families (the widened-probe "
    "filtered IVF serve and the filtered IVF-PQ serve) -> FUSE by "
    "reciprocal-rank (Cormack k=60, exact integer contributions) -> "
    f"DIVERSIFY the fused top-{qs.K} shortlist with greedy MMR "
    f"(select {qs.MMR_SELECT}, λ=0.7 as the integer pair 7/3 over e4 "
    "cosines; relevance is the exact cosine recomputed on the "
    "shortlist, so fusion rank and MMR relevance stay on one scale).  "
    "Scale shape: both retrievers are index-served with label prune "
    "at the postings join; fusion runs on their OUTPUTS (|Q| x k rows "
    "each); everything past the fuse is shortlist-sized (|Q| x k(k-1) "
    "pairs, greedy selection in one cogrouped int64 Arrow kernel per "
    "query) — the corpus is touched only through the indexes.  Oracle "
    "unrolls the identical greedy rounds",
    tags=("similarity", "retrieval", "fusion", "rerank", "filtered"),
    tier=5.5,
)
def retrieval_filtered_fused_mmr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # ONE shared icand subplan for both serves (r15) — the Spark twin
    # of the oracle's shared probes/icand CTEs: the rare serve re-ranks
    # icand directly, the IVF-PQ serve ADC-shortlists the same icand.
    # Both consumers reference the SAME DataFrame, so the candidate
    # build (probe widen -> postings join -> distinct -> label prune)
    # plans once and its exchanges are reused instead of recomputed.
    # r16 negative result (measured, reverted): an eager localCheckpoint
    # of the shared icand did NOT help (interleaved A/B {5.17, 4.86} s
    # checkpointed vs {4.73, 4.81} s not) — exchange reuse already
    # dedups the icand chain between the two serve branches, so the
    # checkpoint only added its own blocking job.
    parts = qs._filtered_icand(spark, sf_dir)
    n = parts["n"]
    books = _load_books(spark, pq_index_path(spark, sf_dir))
    if parts["icand"] is None or not any(books):
        empty = qs._scored_topk(
            n,
            n.select(F.col("vec_id").alias("query_id")).limit(0).select(
                "query_id", F.col("query_id").alias("neighbor_id")
            ),
        )
        r1 = r2 = empty.select("query_id", "neighbor_id", "rank")
    else:
        r1 = qs._scored_topk(n, parts["icand"]).select(
            "query_id", "neighbor_id", "rank"
        )
        r2 = qs._scored_topk(
            n, _ivfpq_shortlist_from_icand(spark, sf_dir, parts, books)
        ).select("query_id", "neighbor_id", "rank")
    allr = r1.unionByName(r2).select(
        "query_id",
        "neighbor_id",
        F.expr(f"{qs.RRF_SCALE} div ({qs.RRF_K} + rank)").alias("contrib"),
    )
    fused = allr.groupBy("query_id", "neighbor_id").agg(
        F.sum("contrib").alias("rrf_e6")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_e6").desc(), "neighbor_id"
    )
    shortl = (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= qs.K)
        .select("query_id", "neighbor_id")
    )
    base = qs.sim.attach_cosine(shortl, n, "query_id", "neighbor_id").select(
        "query_id",
        "neighbor_id",
        F.expr("CAST(round(round(cosine, 4) * 10000) AS BIGINT)").alias(
            "rel_e4"
        ),
    )
    return qs._mmr_greedy(n, base)


