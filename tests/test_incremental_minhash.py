"""Incremental MinHash near-dup dedup (VERDICT-r7 item 4).

Three contracts beyond the cross-engine oracle row:

1. semantics — incremental output == the FULL-corpus LSH pair set
   restricted to pairs touching the batch, with the correct kind tag;
2. Δ-proportionality — the probe plan reads each persisted corpus
   index table (bands, sigs) at most once and never re-tokenizes
   corpus text (no second documents scan without the batch filter);
3. build-once/query-many — the index is built once per process and
   reused byte-identically by later invocations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_dns_spark.plans import q_dedup
from spark_dns_spark.plans.q_dedup import (
    BATCH_MOD,
    BATCH_REM,
    dedup_minhash_incremental,
    dedup_minhash_lsh,
    minhash_index_path,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_incremental_matches_full_lsh_restriction(spark, sf_dir):
    inc = {
        (r["id_a"], r["id_b"], r["jaccard"], r["pair_kind"])
        for r in dedup_minhash_incremental(spark, sf_dir).collect()
    }
    batch = lambda i: i % BATCH_MOD == BATCH_REM  # noqa: E731
    full = {
        (
            r["id_a"],
            r["id_b"],
            r["jaccard"],
            "new_new" if batch(r["id_a"]) and batch(r["id_b"]) else "new_corpus",
        )
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
        if batch(r["id_a"]) or batch(r["id_b"])
    }
    assert inc == full
    assert inc, "fixture produced no touching pairs — test is vacuous"
    kinds = {k for *_ignore, k in inc}
    # sf0.001's ~5-doc batch may legitimately have no intra-batch pair;
    # the oracle gate at sf0.01/0.1 exercises both kinds
    assert kinds <= {"new_new", "new_corpus"} and "new_corpus" in kinds


def test_probe_plan_reads_each_index_table_once(spark, sf_dir):
    df = dedup_minhash_incremental(spark, sf_dir)
    plan = _plan(df)
    root = minhash_index_path(spark, sf_dir)
    # each skinny index table appears as exactly one parquet scan
    for sub in ("bands", "sigs"):
        n = plan.count(f"{root}/{sub}")
        assert n == 1, f"index table {sub} scanned {n} times (want 1)"
    # every documents.parquet scan carries the batch DataFilter —
    # corpus text is never re-tokenized in the probe plan
    doc_scans = [
        ln for ln in plan.splitlines() if "documents.parquet" in ln
    ]
    assert doc_scans, "expected a batch-filtered documents scan"
    for ln in doc_scans:
        assert f"% {BATCH_MOD}) = {BATCH_REM}" in ln, (
            f"unfiltered documents scan in probe plan: {ln[:160]}"
        )


def test_index_built_once_and_reused(spark, sf_dir):
    p1 = minhash_index_path(spark, sf_dir)
    p2 = minhash_index_path(spark, sf_dir)
    assert p1 == p2
    # cache key is (sf_dir, source mtime) — regenerated testdata
    # invalidates the cached index within the process (ADVICE r8)
    assert any(k[0] == sf_dir for k in q_dedup._MINHASH_INDEX)
    # index content: only non-batch docs, both tables non-empty
    sigs = spark.read.parquet(f"{p1}/sigs")
    assert sigs.filter(F.col("doc_id") % BATCH_MOD == BATCH_REM).count() == 0
    assert sigs.count() > 0
    assert spark.read.parquet(f"{p1}/bands").count() > 0
    # query-many: two invocations agree exactly
    a = sorted(map(tuple, dedup_minhash_incremental(spark, sf_dir).collect()))
    b = sorted(map(tuple, dedup_minhash_incremental(spark, sf_dir).collect()))
    assert a == b
