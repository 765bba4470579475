"""Lloyd k-means invariants (q_kmeans) beyond oracle hash equality:
assignments are genuine argmins, the iteration actually improves the
clustering objective, and every cell id is in range.
"""

from __future__ import annotations

import math

import pytest

from spark_dns_spark.plans.catalog import catalog
from spark_dns_spark.plans.q_kmeans import DIM, ITERS, K, SCALE


@pytest.fixture(scope="module")
def result(spark, sf_dir):
    df = catalog()["kmeans_lloyd_cells"].fn(spark, sf_dir)
    return [r.asDict() for r in df.collect()]


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    from spark_dns_spark.session import load_table

    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    return {
        r["vec_id"]: [math.floor(float(x) * SCALE + 0.5) for x in r["embedding"]]
        for r in rows
    }


def _replay(vectors):
    """Driver-side reference Lloyd run with the exact same arithmetic."""
    ids = sorted(vectors)
    cents = [list(vectors[i]) for i in ids[:K]]

    def assign(cents):
        out = {}
        for vid in ids:
            q = vectors[vid]
            best, bd = 0, None
            for j, c in enumerate(cents):
                d = sum((a - b) * (a - b) for a, b in zip(q, c))
                if bd is None or d < bd:
                    best, bd = j, d
            out[vid] = (best, bd)
        return out

    for _ in range(ITERS - 1):
        asg = assign(cents)
        sums = {}
        for vid, (j, _) in asg.items():
            s = sums.setdefault(j, [0] * (DIM + 1))
            s[DIM] += 1
            for i, x in enumerate(vectors[vid]):
                s[i] += x
        cents = [
            [math.floor(sums[j][i] / sums[j][DIM]) for i in range(DIM)]
            if j in sums
            else cents[j]
            for j in range(K)
        ]
    return assign(cents), cents


def test_matches_driver_side_replay(result, vectors):
    """The distributed plan reproduces a sequential Lloyd run exactly —
    integer quantization makes the comparison equality, not tolerance."""
    expected, _ = _replay(vectors)
    assert len(result) == len(vectors)
    for r in result:
        j, d = expected[r["vec_id"]]
        assert (r["cell"], r["dist2"]) == (j, d), f"vec {r['vec_id']}"


def test_cells_in_range_and_populated(result):
    cells = {r["cell"] for r in result}
    assert cells <= set(range(K))
    # with K=8 seeds over the synthetic label structure, the iteration
    # should keep more than one cluster alive
    assert len(cells) > 1


def test_iteration_improves_objective(result, vectors):
    """Total within-cluster distance after ITERS iterations must not
    exceed the seed assignment's — Lloyd monotonicity."""
    ids = sorted(vectors)
    seeds = [list(vectors[i]) for i in ids[:K]]
    seed_cost = 0
    for vid in ids:
        q = vectors[vid]
        seed_cost += min(
            sum((a - b) * (a - b) for a, b in zip(q, c)) for c in seeds
        )
    final_cost = sum(r["dist2"] for r in result)
    assert final_cost <= seed_cost
