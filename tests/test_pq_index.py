"""PQ index persistence (VERDICT-r8 item 2): train-once/serve-many.

Contracts:
1. the index builds once per process and is reused (cache keyed on
   (sf_dir, source mtime) via feeds.cached_index_path);
2. `similarity_pq_codes` SERVES from the stored parquet — its plan is
   a pure index scan (no training aggregates, no embeddings scan);
3. stored codes are complete and in range: every corpus vector has
   PQ_M codes in [0, PQ_K) and a non-negative reconstruction error;
4. the decode side (`_recon_from_codes`) reproduces exactly the
   codeword vectors the stored books dictate.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spark_dns_spark.plans import q_pq


def test_index_built_once_and_reused(spark, sf_dir):
    p1 = q_pq.pq_index_path(spark, sf_dir)
    p2 = q_pq.pq_index_path(spark, sf_dir)
    assert p1 == p2
    assert any(k[0] == sf_dir for k in q_pq._PQ_INDEX)
    books = q_pq._load_books(spark, p1)
    assert len(books) == q_pq.PQ_M
    assert all(len(b) == q_pq.PQ_K for b in books)
    assert all(len(cv) == q_pq.SUBD for b in books for cv in b)


def test_codes_serve_is_pure_index_scan(spark, sf_dir):
    df = q_pq.similarity_pq_codes(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    root = q_pq.pq_index_path(spark, sf_dir)
    assert f"{root}/codes" in plan
    assert "embeddings.parquet" not in plan, (
        "codes serve must not touch the raw corpus"
    )
    assert "Exchange" not in plan, "codes serve must be exchange-free"


def test_stored_codes_complete_and_in_range(spark, sf_dir):
    from spark_dns_spark.session import load_table

    codes = q_pq.similarity_pq_codes(spark, sf_dir)
    n = load_table(spark, sf_dir, "embeddings").count()
    assert codes.count() == n
    agg = codes.agg(
        F.min(F.least(*[f"c{m}" for m in range(q_pq.PQ_M)])).alias("lo"),
        F.max(F.greatest(*[f"c{m}" for m in range(q_pq.PQ_M)])).alias("hi"),
        F.min("err2").alias("emin"),
    ).collect()[0]
    assert agg["lo"] >= 0 and agg["hi"] < q_pq.PQ_K
    assert agg["emin"] >= 0


def test_decode_matches_books(spark, sf_dir):
    root = q_pq.pq_index_path(spark, sf_dir)
    books = q_pq._load_books(spark, root)
    cb = np.array(books, dtype=np.int64)
    recon = q_pq._recon_from_codes(spark, root, books)
    codes = {
        int(r["vec_id"]): [int(r[f"c{m}"]) for m in range(q_pq.PQ_M)]
        for r in q_pq.similarity_pq_codes(spark, sf_dir).collect()
    }
    for r in recon.limit(50).collect():
        cs = codes[int(r["neighbor_id"])]
        want = np.concatenate(
            [cb[m, cs[m]] for m in range(q_pq.PQ_M)]
        ).tolist()
        assert [int(x) for x in r["rv"]] == want


def test_train_books_on_tiny_corpus(spark):
    """A corpus with fewer than PQ_K vectors trains that many cells and
    every emitted code stays in [0, kk) — the ADVICE-r8 regression
    (the update loop used to index cents[j] past the seed list)."""
    n = q_pq.PQ_K - 11  # 5 vectors, well under the codebook size
    rows = [
        (i, [((i + 1) * (d + 1)) % 97 for d in range(q_pq.PQ_M * q_pq.SUBD)])
        for i in range(n)
    ]
    q = spark.createDataFrame(rows, "vec_id bigint, qv array<bigint>")
    books = q_pq._train_books(q)
    assert books is not None and len(books) == q_pq.PQ_M
    assert all(len(book) == n for book in books), "must train only kk cells"
    codes = q_pq._codes_df(q_pq._assign_codes(q, books)).collect()
    assert len(codes) == n
    for r in codes:
        for m in range(q_pq.PQ_M):
            assert 0 <= r[f"c{m}"] < n
        assert r["err2"] >= 0


def test_train_books_empty_corpus(spark):
    q = spark.createDataFrame([], "vec_id bigint, qv array<bigint>")
    assert q_pq._train_books(q) is None
