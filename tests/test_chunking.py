"""Contract tests for the context-window chunker: the codegen
expression formulation and the Python UDTF must produce identical
rows, and both must obey the chunk rule exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_dns_spark.functions.chunking import (
    chunk_expr,
    register_chunk_udtf,
)

MAX_TOKENS, STRIDE = 16, 12


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .persist()
    )


def _key(rows):
    return sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in rows
    )


def test_expr_matches_udtf(spark, docs):
    expr_rows = chunk_expr(docs, max_tokens=MAX_TOKENS, stride=STRIDE).select(
        "doc_id", "chunk_idx", "chunk_text", "n_tokens"
    ).collect()
    register_chunk_udtf(spark)
    docs.createOrReplaceTempView("chunk_docs")
    udtf_rows = spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM chunk_docs d, LATERAL chunk_text(d.text, {MAX_TOKENS}, {STRIDE}) c
        """
    ).collect()
    assert _key(expr_rows) == _key(udtf_rows)
    assert expr_rows  # non-degenerate


def test_chunk_rule_exact(docs):
    """Independent Python recompute of the chunk rule on a sample."""
    sample = {r["doc_id"]: r["text"] for r in docs.limit(25).collect()}
    got = {}
    rows = (
        chunk_expr(docs, max_tokens=MAX_TOKENS, stride=STRIDE)
        .filter(F.col("doc_id").isin(list(sample)))
        .collect()
    )
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        )
    for doc_id, text in sample.items():
        toks = text.split(" ")
        want = []
        for idx, start in enumerate(range(0, len(toks), STRIDE)):
            chunk = toks[start : start + MAX_TOKENS]
            want.append((idx, " ".join(chunk), len(chunk)))
        assert sorted(got[doc_id]) == sorted(want), doc_id


def test_overlap_and_coverage(docs):
    """Every token index is covered; consecutive chunks overlap by
    max_tokens - stride (except possibly the tail)."""
    out = chunk_expr(docs, max_tokens=MAX_TOKENS, stride=STRIDE)
    agg = (
        out.groupBy("doc_id")
        .agg(
            F.sum("n_tokens").alias("sum_tokens"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .join(
            docs.select(
                "doc_id", F.size(F.split("text", " ")).alias("n_toks")
            ),
            "doc_id",
        )
    )
    bad = agg.filter(
        # coverage: chunked token instances >= source tokens (overlap
        # duplicates some); and chunk count == ceil(n/stride)
        (F.col("sum_tokens") < F.col("n_toks"))
        | (
            F.col("n_chunks")
            != F.ceil(F.col("n_toks") / F.lit(STRIDE)).cast("long")
        )
    )
    assert bad.count() == 0
