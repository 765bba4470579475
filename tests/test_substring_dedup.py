"""Exact-substring dedup vs an INDEPENDENT pure-Python reference.

The DuckDB oracle shares the SQL formulation (shingle ranking + island
merge), so these tests validate the semantics against a third,
deliberately naive implementation: dict-of-lists first-occurrence
tracking + interval union by scanning — no windows, no SQL.
"""

from __future__ import annotations

import random

import pytest

from spark_dns_spark.plans.q_dedup import W_SUB, dedup_exact_substring
from spark_dns_spark.plans.q_dedup import dedup_substring_clean


def _naive(docs: dict[int, list[str]]):
    """Reference: per-doc duplicate-span accounting + cleaned text.

    First occurrence of each W-gram is the globally smallest
    (doc_id, pos); every other occurrence marks tokens [pos, pos+W-1]
    removed.  Regions = maximal runs of removed token positions.
    """
    first: dict[tuple, tuple[int, int]] = {}
    occs: list[tuple[int, int, tuple]] = []
    for d in sorted(docs):
        toks = docs[d]
        for p in range(len(toks) - W_SUB + 1):
            g = tuple(toks[p : p + W_SUB])
            occs.append((d, p, g))
            if g not in first:
                first[g] = (d, p)
    removed: dict[int, set[int]] = {d: set() for d in docs}
    for d, p, g in occs:
        if first[g] != (d, p):
            removed[d].update(range(p, p + W_SUB))
    out = {}
    clean = {}
    for d in docs:
        toks = docs[d]
        rm = removed[d]
        regions = 0
        prev = False
        for i in range(len(toks)):
            cur = i in rm
            if cur and not prev:
                regions += 1
            prev = cur
        out[d] = (len(toks), regions, len(rm), len(toks) - len(rm))
        clean[d] = " ".join(t for i, t in enumerate(toks) if i not in rm)
    return out, clean


def _corpus(seed: int, n_docs: int = 24) -> dict[int, list[str]]:
    """Small vocab + copied runs force genuine cross-doc duplicate
    spans at W=10 and overlapping/adjacent regions within docs."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(6)]
    docs: dict[int, list[str]] = {}
    for d in range(n_docs):
        n = rng.randint(W_SUB, 40)
        toks = [rng.choice(vocab) for _ in range(n)]
        docs[d] = toks
    # inject verbatim copies of earlier spans (the Lee et al. scenario)
    for d in range(1, n_docs, 3):
        src = rng.randrange(d)
        s_toks = docs[src]
        if len(s_toks) >= W_SUB + 2:
            start = rng.randint(0, len(s_toks) - W_SUB - 1)
            span = s_toks[start : start + W_SUB + rng.randint(0, 2)]
            pos = rng.randint(0, len(docs[d]))
            docs[d] = docs[d][:pos] + span + docs[d][pos:]
    return docs


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_substring_accounting_matches_naive(spark, tmp_path, seed):
    docs = _corpus(seed)
    sf = str(tmp_path / f"sf_{seed}")
    import os

    os.makedirs(sf)
    spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()], "doc_id long, text string"
    ).write.parquet(os.path.join(sf, "documents.parquet"))

    want, want_clean = _naive(docs)
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["dup_regions"], r["dup_tokens"], r["keep_tokens"]
        )
        for r in dedup_exact_substring(spark, sf).collect()
    }
    assert got == want

    got_clean = {
        r["doc_id"]: r["clean_text"]
        for r in dedup_substring_clean(spark, sf).collect()
    }
    assert got_clean == want_clean


def test_substring_no_dups_is_identity(spark, tmp_path):
    # fully distinct tokens: zero duplicate spans, clean text == text
    import os

    docs = {d: [f"d{d}t{i}" for i in range(15)] for d in range(5)}
    sf = str(tmp_path / "sf_nodup")
    os.makedirs(sf)
    spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()], "doc_id long, text string"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    rows = dedup_exact_substring(spark, sf).collect()
    assert all(r["dup_tokens"] == 0 and r["dup_regions"] == 0 for r in rows)
    assert all(r["keep_tokens"] == r["n_tokens"] == 15 for r in rows)
