"""Product-quantization invariants (q_pq) beyond oracle hash equality:
a pure-Python replay of the per-subspace Lloyd training reproduces every
code and the reconstruction error, codes are in range, and the error
decomposes exactly into the per-subspace argmin distances.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from spark_dns_spark.plans.catalog import catalog
from spark_dns_spark.plans.q_kmeans import SCALE
from spark_dns_spark.plans.q_pq import (
    PQ_ITERS,
    PQ_K,
    PQ_M,
    SEED_A,
    SEED_B,
    SEED_M,
    SUBD,
)


@pytest.fixture(scope="module")
def result(spark, sf_dir):
    df = catalog()["similarity_pq_codes"].fn(spark, sf_dir)
    return {r["vec_id"]: r.asDict() for r in df.collect()}


@pytest.fixture(scope="module")
def vectors(sf_dir):
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    return {
        vid: [math.floor(float(x) * SCALE + 0.5) for x in emb]
        for vid, emb in rows
    }


def _dist(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


@pytest.fixture(scope="module")
def replay(vectors):
    """Reference per-subspace Lloyd run with the exact same arithmetic."""
    ids = sorted(vectors)
    seed_ids = sorted(ids, key=lambda v: ((v * SEED_A + SEED_B) % SEED_M, v))
    seeds = [vectors[i] for i in seed_ids[:PQ_K]]
    books = []
    for m in range(PQ_M):
        off = m * SUBD
        sub = {i: vectors[i][off : off + SUBD] for i in ids}
        cents = [s[off : off + SUBD] for s in seeds]
        for _ in range(PQ_ITERS - 1):
            groups: dict[int, list[list[int]]] = {}
            for i in ids:
                d = [_dist(sub[i], c) for c in cents]
                cell = d.index(min(d))  # first index = smallest cell
                groups.setdefault(cell, []).append(sub[i])
            cents = [
                [
                    math.floor(sum(v[j] for v in g) / len(g))
                    for j in range(SUBD)
                ]
                if (g := groups.get(c))
                else cents[c]
                for c in range(PQ_K)
            ]
        books.append(cents)
    out = {}
    for i in ids:
        codes, err = [], 0
        for m in range(PQ_M):
            off = m * SUBD
            d = [_dist(vectors[i][off : off + SUBD], c) for c in books[m]]
            codes.append(d.index(min(d)))
            err += min(d)
        out[i] = (codes, err)
    return out


def test_matches_python_replay(result, replay):
    assert set(result) == set(replay)
    for vid, (codes, err) in replay.items():
        got = result[vid]
        assert [got[f"c{m}"] for m in range(PQ_M)] == codes, vid
        assert got["err2"] == err, vid


def test_codes_in_range(result):
    assert result, "corpus must be non-empty at sf0.001"
    for r in result.values():
        for m in range(PQ_M):
            assert 0 <= r[f"c{m}"] < PQ_K
        assert r["err2"] >= 0


def test_training_improves_objective(result, vectors):
    """Total reconstruction error with the TRAINED codebooks is no worse
    than with the untrained seed codebooks (Lloyd monotonicity; the
    floor-rounded centroid update can cost at most SUBD per cell per
    subspace, covered by the slack term)."""
    ids = sorted(vectors)
    seed_ids = sorted(ids, key=lambda v: ((v * SEED_A + SEED_B) % SEED_M, v))
    seeds = [vectors[i] for i in seed_ids[:PQ_K]]
    seed_err = 0
    for i in ids:
        for m in range(PQ_M):
            off = m * SUBD
            seed_err += min(
                _dist(vectors[i][off : off + SUBD], s[off : off + SUBD])
                for s in seeds
            )
    trained_err = sum(r["err2"] for r in result.values())
    slack = PQ_M * PQ_K * SUBD * len(ids)
    assert trained_err <= seed_err + slack
