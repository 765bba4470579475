"""Property-based exactly-once torture for the incremental-index
family (VERDICT r9 item 7): similarity_pq_upsert / similarity_ivf_
upsert / their streaming twins prove delta-vs-rebuild equality for ONE
batch split; these hypothesis tests replay ARBITRARY splits, orders,
and retries against the pure encode/assign kernels the upserts run
(q_pq.pq_encode_np, q_kmeans.nearest_cells_np), proving the merge
algebra itself — encoding against a FROZEN model is pointwise, so any
batching unions to the rebuild — not just the tested split.

Pure numpy (the test_zonestore_properties.py pattern: no Spark, so
hypothesis can run hundreds of cases fast).  The Spark plumbing that
APPLIES these kernels is pinned separately: tests/test_pq_upsert.py /
test_ivf_upsert.py prove the registered queries equal a full rebuild
byte-for-byte and scan the stored index exactly once.
"""

from __future__ import annotations

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from spark_dns_spark.plans import q_kmeans as km  # noqa: E402
from spark_dns_spark.plans import q_pq as qp  # noqa: E402

DIM = km.DIM


@st.composite
def _corpus_and_batching(draw):
    """A small vector corpus, a codebook/centroid seed, and an
    adversarial batching: a permutation of row ids split at arbitrary
    points, with an arbitrary subset of batches REPLAYED (retry
    semantics: a replayed batch overwrites its own output — the
    foreachBatch idempotency contract)."""
    n = draw(st.integers(min_value=1, max_value=24))
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    x = rng.integers(-1000, 1000, size=(n, DIM), dtype=np.int64)
    # duplicate some rows on purpose: identical vectors in different
    # batches must encode identically
    if n >= 2 and draw(st.booleans()):
        x[draw(st.integers(0, n - 1))] = x[draw(st.integers(0, n - 1))]
    perm = list(draw(st.permutations(range(n))))
    n_cuts = draw(st.integers(min_value=0, max_value=min(4, n - 1)))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(1, n - 1),
                min_size=n_cuts,
                max_size=n_cuts,
                unique=True,
            )
        )
    ) if n > 1 else []
    batches = [
        perm[lo:hi] for lo, hi in zip([0] + cuts, cuts + [n]) if perm[lo:hi]
    ]
    replay = draw(
        st.lists(
            st.integers(0, max(len(batches) - 1, 0)),
            max_size=3,
        )
    )
    kk_cells = draw(st.integers(min_value=1, max_value=6))
    return x, batches, replay, kk_cells, rng


def _codebook(rng, kk: int) -> np.ndarray:
    cb = rng.integers(-1000, 1000, size=(qp.PQ_M, kk, qp.SUBD), dtype=np.int64)
    return cb


@settings(max_examples=150, deadline=None)
@given(data=_corpus_and_batching(), kk=st.integers(2, 5))
def test_pq_encode_split_replay_invariance(data, kk):
    x, batches, replay, _, rng = data
    cb = _codebook(rng, kk)
    full = qp.pq_encode_np(x, cb)  # the rebuild
    # replay = run some batches twice; overwrite-by-batch-id keeps ONE
    # output per batch, so the merged state is the union over batches
    outputs: dict[int, tuple[list[int], np.ndarray]] = {}
    order = list(range(len(batches))) + replay
    for b in order:
        ids = batches[b % len(batches)] if batches else []
        if not ids:
            continue
        outputs[b % len(batches)] = (ids, qp.pq_encode_np(x[ids], cb))
    merged = np.zeros_like(full)
    seen = np.zeros(len(x), dtype=bool)
    for ids, enc in outputs.values():
        merged[ids] = enc
        seen[ids] = True
    assert seen.all()
    assert (merged == full).all()


@settings(max_examples=150, deadline=None)
@given(data=_corpus_and_batching())
def test_ivf_assign_split_replay_invariance(data):
    x, batches, replay, kk, rng = data
    n_cells = int(rng.integers(kk, kk + 20))
    cb = rng.integers(-1000, 1000, size=(n_cells, DIM), dtype=np.int64)
    full = km.nearest_cells_np(x, cb, kk)
    merged = np.zeros_like(full)
    seen = np.zeros(len(x), dtype=bool)
    for b in list(range(len(batches))) + replay:
        ids = batches[b % len(batches)] if batches else []
        if not ids:
            continue
        merged[ids] = km.nearest_cells_np(x[ids], cb, kk)
        seen[ids] = True
    assert seen.all()
    assert (merged == full).all()


@settings(max_examples=100, deadline=None)
@given(data=_corpus_and_batching())
def test_probe_budget_is_prefix_monotonic(data):
    # growing nprobe (the r10 log2 scaling) only APPENDS probed cells:
    # the kk-nearest list is a prefix of the (kk+1)-nearest list, so a
    # probe-budget retune can only add candidates, never change or
    # drop the ones already served
    x, _, _, kk, rng = data
    n_cells = int(rng.integers(kk + 1, kk + 20))
    cb = rng.integers(-1000, 1000, size=(n_cells, DIM), dtype=np.int64)
    small = km.nearest_cells_np(x, cb, kk)
    big = km.nearest_cells_np(x, cb, kk + 1)
    assert (small[:, :kk] == big[:, :kk]).all()  # cells prefix
    assert (small[:, kk:] == big[:, kk + 1 : 2 * kk + 1]).all()  # dists


@settings(max_examples=100, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_tie_break_to_smaller_cell(seed):
    # duplicate centroids force exact distance ties; both kernels must
    # pick the SMALLER cell id (the oracle's ORDER BY dist, cell)
    rng = np.random.default_rng(seed)
    x = rng.integers(-1000, 1000, size=(4, DIM), dtype=np.int64)
    base = rng.integers(-1000, 1000, size=(3, DIM), dtype=np.int64)
    cb = np.concatenate([base, base[1:2]])  # cell 3 duplicates cell 1
    cells = km.nearest_cells_np(x, cb, cb.shape[0])
    assert (cells[:, 0] != 3).all() or (cells[:, 1] != 1).all()
    for row in cells:
        # cell 1 must always rank before its duplicate cell 3
        assert list(row[: cb.shape[0]]).index(1) < list(
            row[: cb.shape[0]]
        ).index(3)
    pq_base = rng.integers(-1000, 1000, size=(qp.PQ_M, 3, qp.SUBD), dtype=np.int64)
    pq_cb = np.concatenate([pq_base, pq_base[:, 1:2, :]], axis=1)
    enc = qp.pq_encode_np(x, pq_cb)
    assert (enc[:, : qp.PQ_M] != 3).all()  # first-min == smaller cell
