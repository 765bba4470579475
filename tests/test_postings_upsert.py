"""Incremental inverted-index maintenance — the retrieval-side twin of
the dedup/ANN upserts.

Contracts:
1. the merged index (stored base term stats + delta-only tokenize +
   vocab-keyed merge) is byte-identical to a from-scratch build over
   the full corpus (also the DuckDB oracle);
2. the upsert plan scans the stored terms parquet exactly once and its
   documents scans all carry the delta batch filter (batch cost
   proportional to |delta| — the corpus is never re-tokenized);
3. storing the UNPRUNED base is load-bearing: a term under MIN_DF on
   the base side that crosses the threshold only with the delta must
   appear in the merged index.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_dns_spark.plans import q_index as qi
from spark_dns_spark.plans import q_similarity as qs


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_upsert_equals_full_rebuild(spark, sf_dir):
    up = _rows(qi.index_postings_upsert(spark, sf_dir))
    full = _rows(qi.index_inverted_postings(spark, sf_dir))
    assert up, "empty index at this sf — vacuous"
    assert up == full


def test_upsert_plan_is_delta_proportional(spark, sf_dir):
    df = qi.index_postings_upsert(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    root = qi.postings_base_index_path(spark, sf_dir)
    assert plan.count(f"{root}/terms") == 1, "stored terms scanned != once"
    doc_scans = [
        ln for ln in plan.splitlines() if "documents.parquet" in ln
    ]
    assert doc_scans, "expected a batch-filtered documents scan"
    for ln in doc_scans:
        assert f"% {qs.UP_MOD}) = {qs.UP_REM}" in ln, (
            f"unfiltered documents scan in upsert plan: {ln[:160]}"
        )


def test_threshold_crossing_term_survives_merge(spark, sf_dir):
    """Storing the UNPRUNED base is load-bearing: a term under MIN_DF
    on the base side that crosses the threshold only with the delta
    must appear in the merged index — proven on a synthetic corpus
    where the split is controlled (the driver corpora may have no
    natural sub-threshold term at the test sf)."""
    base_n = qi.MIN_DF - 2  # 3 base docs contain the term
    delta_n = qi.MIN_DF - base_n  # 2 delta docs push it to exactly MIN_DF
    rows = []
    did = 0
    for _ in range(base_n):  # base side: doc_id % UP_MOD != UP_REM
        if did % qs.UP_MOD == qs.UP_REM:
            did += 1
        rows.append((did, "crossing filler"))
        did += 1
    delta_ids = [
        qs.UP_REM + k * qs.UP_MOD for k in range(delta_n)
    ]
    rows += [(d, "crossing other") for d in delta_ids]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    stats = qi._term_stats(docs)
    by_term = {r["term"]: r for r in stats.collect()}
    assert by_term["crossing"]["df_count"] == qi.MIN_DF
    # sub-threshold terms are present in the mergeable representation
    assert by_term["filler"]["df_count"] == base_n < qi.MIN_DF
    # and the served output prunes them while keeping the crossing term
    served = qi._format_index(
        stats.filter(F.col("df_count") >= qi.MIN_DF)
    )
    names = [r["term"] for r in served.collect()]
    assert "crossing" in names and "filler" not in names
