"""Bigram-LM quality-score invariants (q_lm) beyond oracle hash
equality: a pure-Python third implementation reproduces every
(doc, n_bigrams, score) row, and scores are valid milli-probabilities.
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from spark_dns_spark.plans.catalog import catalog


@pytest.fixture(scope="module")
def result(spark, sf_dir):
    df = catalog()["quality_lm_bigram_score"].fn(spark, sf_dir)
    return {r["doc_id"]: r.asDict() for r in df.collect()}


@pytest.fixture(scope="module")
def replay(sf_dir):
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    toks = {d: t.split(" ") for d, t in rows}
    occ = {
        d: list(zip(ts, ts[1:])) for d, ts in toks.items() if len(ts) >= 2
    }
    cbi: Counter = Counter()
    for pairs in occ.values():
        cbi.update(pairs)
    cpre: Counter = Counter()
    for (w1, _), c in cbi.items():
        cpre[w1] += c
    out = {}
    for d, pairs in occ.items():
        ps = [(cbi[p] * 1000) // cpre[p[0]] for p in pairs]
        out[d] = {
            "doc_id": d,
            "n_bigrams": len(ps),
            "score_milli": sum(ps) // len(ps),
        }
    return out


def test_matches_python_replay(result, replay):
    assert result == replay


def test_scores_are_milli_probabilities(result):
    assert result, "corpus must produce scored docs at sf0.001"
    for r in result.values():
        assert 0 <= r["score_milli"] <= 1000
        assert r["n_bigrams"] >= 1
