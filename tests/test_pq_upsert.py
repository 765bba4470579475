"""Incremental PQ index maintenance (the similarity_ivf_upsert twin
for the compression layer).

Contracts:
1. upsert (stored base codes + delta ENCODED against the stored
   codebooks) is byte-identical to a from-scratch encode-all at the
   same model state — appending never changes what a full rebuild
   with the same books would store;
2. the upsert plan scans the stored codes parquet exactly once and
   its embeddings scans all carry the delta batch filter (batch cost
   proportional to |delta| — the corpus is never re-encoded); the
   books are driver-side model state, never joined;
3. the batch split is total: every corpus vector appears exactly
   once, base rows flagged is_new=0 and delta rows is_new=1, every
   code within [0, PQ_K).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_dns_spark.plans import q_pq as qp
from spark_dns_spark.plans import q_similarity as qs


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _rebuild_encode_all(spark, sf_dir):
    """Encode the FULL corpus against the base-trained codebooks in
    one lineage — the rebuild the upsert must equal."""
    root = qp.pq_base_index_path(spark, sf_dir)
    books = qp._load_books(spark, root)
    q = qp._quantized(spark, sf_dir)
    return qp._codes_df(qp._assign_codes(q, books)).withColumn(
        "is_new",
        ((F.col("vec_id") % qs.UP_MOD) == qs.UP_REM).cast("int"),
    )


def test_upsert_equals_full_rebuild(spark, sf_dir):
    up = _rows(qp.similarity_pq_upsert(spark, sf_dir))
    rb = _rows(_rebuild_encode_all(spark, sf_dir))
    assert up, "no codes at this sf — vacuous"
    assert up == rb


def test_upsert_plan_is_delta_proportional(spark, sf_dir):
    df = qp.similarity_pq_upsert(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    root = qp.pq_base_index_path(spark, sf_dir)
    assert plan.count(f"{root}/codes") == 1, "stored codes scanned != once"
    emb_scans = [
        ln for ln in plan.splitlines() if "embeddings.parquet" in ln
    ]
    assert emb_scans, "expected a batch-filtered embeddings scan"
    for ln in emb_scans:
        assert f"% {qs.UP_MOD}) = {qs.UP_REM}" in ln, (
            f"unfiltered embeddings scan in upsert plan: {ln[:160]}"
        )
    assert f"{root}/books" not in plan, (
        "codebooks must be collected driver-side (model state), not joined"
    )


def test_upsert_split_is_total(spark, sf_dir):
    up = qp.similarity_pq_upsert(spark, sf_dir)
    n_corpus = qp._quantized(spark, sf_dir).count()
    assert up.count() == n_corpus
    assert up.select("vec_id").distinct().count() == n_corpus
    flags = {
        (int(r["is_new"]), int(r["vec_id"]) % qs.UP_MOD == qs.UP_REM)
        for r in up.select("is_new", "vec_id").collect()
    }
    assert flags <= {(0, False), (1, True)}
    assert (1, True) in flags, "delta batch empty at this sf — vacuous"
    code_cols = [f"c{m}" for m in range(qp.PQ_M)]
    bad = up.filter(
        " OR ".join(f"({c} < 0 OR {c} >= {qp.PQ_K})" for c in code_cols)
    )
    assert bad.count() == 0, "code out of [0, PQ_K)"


def test_stream_upsert_equals_batch_upsert(spark, sf_dir):
    """The streaming encode (two micro-batches, stateless Arrow map)
    must land byte-identical to the batch upsert — micro-batch
    boundaries cannot change any code."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    e = qp.load_table(spark, sf_dir, "embeddings")
    delta = e.filter((F.col("vec_id") % qs.UP_MOD) == qs.UP_REM)
    halves = [
        delta.filter(F.expr(f"(vec_id div {qs.UP_MOD}) % 2 = {p}")).count()
        for p in (0, 1)
    ]
    assert all(halves), f"a delivery half is empty at this sf: {halves}"
    st = _rows(qp.similarity_pq_upsert_stream(spark, sf_dir))
    bt = _rows(qp.similarity_pq_upsert(spark, sf_dir))
    assert st == bt
