"""Incremental IVF index maintenance (VERDICT-r8 item 5).

Contracts:
1. upsert (stored base postings + delta assigned to STORED centroids)
   is byte-identical to a from-scratch assign-all over the same
   base-trained centroids — i.e. appending never changes what a full
   rebuild at the same model state would serve;
2. the upsert plan scans the stored postings parquet exactly once and
   its embeddings scans all carry the batch DataFilter (batch cost is
   proportional to |delta| — the corpus is never re-quantized);
3. the batch split is total: every corpus vector appears, base rows
   flagged is_new=0 and delta rows is_new=1, each under IVF_ASSIGN
   cells.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_dns_spark.plans import q_kmeans as km
from spark_dns_spark.plans import q_similarity as qs


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _rebuild_assign_all(spark, sf_dir):
    """Assign the FULL corpus to the base-trained centroids in one
    fused lineage — the rebuild the upsert must equal."""
    root = qs.ivf_base_index_path(spark, sf_dir)
    crows = spark.read.parquet(f"{root}/cents").orderBy("cell").collect()
    cents = [[int(x) for x in r["cv"]] for r in crows]
    n = qs._vectors(spark, sf_dir)
    q = km.quantize(n.select("vec_id", "v"))
    return qs._nearest_cells(q, cents, qs.IVF_ASSIGN).withColumn(
        "is_new",
        ((F.col("vec_id") % qs.UP_MOD) == qs.UP_REM).cast("int"),
    )


def test_upsert_equals_full_rebuild(spark, sf_dir):
    up = _rows(qs.similarity_ivf_upsert(spark, sf_dir))
    rb = _rows(_rebuild_assign_all(spark, sf_dir))
    assert up, "no postings at sf0.001 — vacuous"
    assert up == rb


def test_upsert_plan_is_delta_proportional(spark, sf_dir):
    df = qs.similarity_ivf_upsert(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    root = qs.ivf_base_index_path(spark, sf_dir)
    assert plan.count(f"{root}/asg") == 1, "stored postings scanned != once"
    # the only embeddings scan is the delta lineage, batch-filtered
    emb_scans = [
        ln for ln in plan.splitlines() if "embeddings.parquet" in ln
    ]
    assert emb_scans, "expected a batch-filtered embeddings scan"
    for ln in emb_scans:
        assert f"% {qs.UP_MOD}) = {qs.UP_REM}" in ln, (
            f"unfiltered embeddings scan in upsert plan: {ln[:160]}"
        )
    assert f"{root}/cents" not in plan, (
        "centroids must be collected driver-side (K rows), not joined"
    )


def test_upsert_split_is_total(spark, sf_dir):
    up = qs.similarity_ivf_upsert(spark, sf_dir)
    n_corpus = qs._vectors(spark, sf_dir).count()
    per_vec = up.groupBy("vec_id", "is_new").agg(F.count("*").alias("n"))
    assert per_vec.count() == n_corpus
    assert per_vec.filter(F.col("n") != qs.IVF_ASSIGN).count() == 0
    flags = {
        (int(r["is_new"]), int(r["vec_id"]) % qs.UP_MOD == qs.UP_REM)
        for r in up.select("is_new", "vec_id").collect()
    }
    assert flags <= {(0, False), (1, True)}
    assert (1, True) in flags, "delta batch empty at this sf — vacuous"
