"""The large-KC sharded assignment path (VERDICT r10 item 3).

``q_similarity._nearest_cells`` dispatches on the centroid-state size:
below ``KC_DRIVER_MAX`` the matrix rides the UDF closure
(collect-and-close-over — cheapest at tested scales); at/above it the
closure carries only the parquet PATH and each worker loads the matrix
itself (``km.cells_udf_from_path``).  These tests pin that the two
paths are bit-identical on a synthetic KC > 16384 codebook, and that
``load_cents`` picks the right representation at both sizes.
"""

from __future__ import annotations

import numpy as np
import pytest

from spark_dns_spark.plans import q_kmeans as km
from spark_dns_spark.plans import q_similarity as qs

DIM = km.DIM
KC_BIG = qs.KC_DRIVER_MAX + 16  # 16400 cells — the sharded regime
N_VEC = 64


@pytest.fixture(scope="module")
def big_index(spark, tmp_path_factory):
    """A synthetic cents parquet with KC > KC_DRIVER_MAX, plus query
    vectors, both deterministic (seeded rng)."""
    rng = np.random.default_rng(42)
    cents = rng.integers(-1000, 1000, size=(KC_BIG, DIM)).tolist()
    vecs = rng.integers(-1000, 1000, size=(N_VEC, DIM)).tolist()
    root = tmp_path_factory.mktemp("large_kc")
    cdf = spark.createDataFrame(
        [(j, [int(x) for x in cv]) for j, cv in enumerate(cents)],
        "cell bigint, cv array<bigint>",
    )
    cents_dir = str(root / "cents")
    cdf.coalesce(1).write.mode("overwrite").parquet(cents_dir)
    q = spark.createDataFrame(
        [
            tuple([i] + [int(x) for x in v])
            for i, v in enumerate(vecs)
        ],
        "vec_id bigint, " + ", ".join(f"q{i} bigint" for i in range(DIM)),
    )
    return cents, cents_dir, q


def test_load_cents_dispatches_on_size(spark, big_index, tmp_path):
    cents, cents_dir, _ = big_index
    # big index -> the PATH (no driver collect)
    assert qs.load_cents(spark, cents_dir) == cents_dir
    # small index -> the list, cell-ordered
    small = spark.createDataFrame(
        [(1, [1] * DIM), (0, [0] * DIM)], "cell bigint, cv array<bigint>"
    )
    small_dir = str(tmp_path / "small_cents")
    small.write.mode("overwrite").parquet(small_dir)
    got = qs.load_cents(spark, small_dir)
    assert got == [[0] * DIM, [1] * DIM]  # list, sorted by cell


def test_sharded_path_bit_identical_to_closure_path(spark, big_index):
    cents, cents_dir, q = big_index
    kk = 4
    via_closure = sorted(
        tuple(r)
        for r in qs._nearest_cells(q, cents, kk, meta=True).collect()
    )
    via_path = sorted(
        tuple(r)
        for r in qs._nearest_cells(q, cents_dir, kk, meta=True).collect()
    )
    assert via_closure == via_path
    # sanity: every vector got exactly kk cells with rn 1..kk and
    # nondecreasing d2
    per_vec: dict[int, list] = {}
    for vec_id, cell, d2, rn in via_path:
        per_vec.setdefault(vec_id, []).append((rn, d2, cell))
    assert len(per_vec) == N_VEC
    for rows in per_vec.values():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, kk + 1))
        d2s = [r[1] for r in rows]
        assert d2s == sorted(d2s)


def test_worker_cb_cache_matches_driver_matrix(big_index):
    cents, cents_dir, _ = big_index
    cb = km._load_cb(cents_dir)
    assert cb.shape == (KC_BIG, DIM)
    assert cb.dtype == np.int64
    assert cb.tolist() == cents  # cell-ordered, value-exact
    assert km._load_cb(cents_dir) is cb  # cached per process
