"""BM25 retrieval invariants (q_retrieval) beyond oracle hash equality:
a pure-Python third implementation of the integer-exact BM25 pipeline
reproduces every (query, doc, score, rank) row, and ranks are dense
top-K per query.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import duckdb
import pytest

from spark_dns_spark.plans.catalog import catalog
from spark_dns_spark.plans.q_retrieval import (
    B_MILLI,
    BM25_QMOD,
    BM25_TOPK,
    K1_MILLI,
)

_TOK = re.compile(r"[a-z]{3,}")


@pytest.fixture(scope="module")
def result(spark, sf_dir):
    df = catalog()["index_bm25_topk"].fn(spark, sf_dir)
    return [r.asDict() for r in df.collect()]


@pytest.fixture(scope="module")
def replay(sf_dir):
    """Driver-side reference BM25 with the exact same integer arithmetic."""
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    tf: dict[int, Counter] = {}
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if _TOK.fullmatch(t)]
        if toks:
            tf[doc_id] = Counter(toks)
    dl = {d: sum(c.values()) for d, c in tf.items()}
    n_docs = len(dl)
    avgdl_milli = (sum(dl.values()) * 1000) // n_docs
    df_: Counter = Counter()
    for c in tf.values():
        df_.update(c.keys())

    def part(t, d):
        idf_bits = len(bin(n_docs // df_[t])) - 2  # bit length
        ratio_milli = (dl[d] * 1000000) // avgdl_milli
        norm_milli = 1000 - B_MILLI + (B_MILLI * ratio_milli) // 1000
        denom = tf[d][t] * 1000 + (K1_MILLI * norm_milli) // 1000
        return idf_bits * ((tf[d][t] * 2200 * 1000) // denom)

    out = []
    for q in sorted(tf):
        if q % BM25_QMOD != 0:
            continue
        scores: dict[int, int] = defaultdict(int)
        for t in tf[q]:
            for d in tf:
                if d != q and t in tf[d]:
                    scores[d] += part(t, d)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (d, s) in enumerate(ranked[:BM25_TOPK], 1):
            out.append(
                {"query_id": q, "doc_id": d, "bm25_milli": s, "rank": rank}
            )
    return out


def test_matches_python_replay(result, replay):
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(result, key=key) == sorted(replay, key=key)


def test_ranks_dense_topk(result):
    per_q: dict[int, list[int]] = defaultdict(list)
    for r in result:
        per_q[r["query_id"]].append(r["rank"])
    assert per_q, "query set must be non-empty at sf0.001"
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= BM25_TOPK


def test_scores_positive_and_ordered(result):
    per_q: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for r in result:
        assert r["bm25_milli"] > 0
        per_q[r["query_id"]].append((r["rank"], r["bm25_milli"]))
    for q, pairs in per_q.items():
        pairs.sort()
        scores = [s for _, s in pairs]
        assert scores == sorted(scores, reverse=True)
