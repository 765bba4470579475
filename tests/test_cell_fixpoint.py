"""Cell-maintenance fixpoint invariants (VERDICT r10 item 6).

A pure-pandas reference of the spill->demote round algebra (identical
tie-breaks to the Spark/DuckDB implementations) is property-tested
under hypothesis-generated skew, including the adversarial case every
production index fears: a whole batch of near-identical vectors
landing in one cell.  The catalog entries are then driven end-to-end
at sf0.001 and asserted BALANCED (max cell load <= cap) — the oracle
gate proves cross-engine equality; these tests prove the invariants
the operator exists for.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_dns_spark.plans import q_similarity as qs

ASSIGN = qs.IVF_ASSIGN


def ref_fixpoint(post: pd.DataFrame, ext: pd.DataFrame, cap: int,
                 max_rounds: int = 200):
    """Reference spill->demote fixpoint: ``post`` = (vec_id, cell, d2),
    ``ext`` = (vec_id, rn, cell, d2) per-vector full cell ranking.
    Returns (final postings, rounds).  Raises on slot exhaustion or
    non-termination — the failure modes the invariants rule out."""
    ext = ext.set_index(["vec_id", "rn"]).sort_index()
    hw: dict[int, int] = {}
    st_ = post.copy()
    for rnd in range(max_rounds):
        st_ = st_.sort_values(["cell", "d2", "vec_id"], kind="stable")
        st_["crn"] = st_.groupby("cell").cumcount() + 1
        sp = st_[st_.crn > cap].copy()
        if not len(sp):
            return st_[["vec_id", "cell", "d2"]], rnd
        sp = sp.sort_values(["vec_id", "d2", "cell"], kind="stable")
        sp["j"] = sp.groupby("vec_id").cumcount() + 1
        kept = st_[st_.crn <= cap][["vec_id", "cell", "d2"]]
        rows = []
        for vec, grp in sp.groupby("vec_id"):
            base = hw.get(vec, ASSIGN)
            for i in range(1, len(grp) + 1):
                key = (vec, base + i)
                if key not in ext.index:
                    raise AssertionError(f"slot exhausted for vec {vec}")
                x = ext.loc[key]
                rows.append((vec, int(x["cell"]), int(x["d2"])))
            hw[vec] = base + len(grp)
        st_ = pd.concat(
            [kept, pd.DataFrame(rows, columns=["vec_id", "cell", "d2"])],
            ignore_index=True,
        )
    # check-then-move boundary (ADVICE r11): converging on exactly the
    # last move is a fixpoint — one final spill check decides
    st_ = st_.sort_values(["cell", "d2", "vec_id"], kind="stable")
    st_["crn"] = st_.groupby("cell").cumcount() + 1
    if not len(st_[st_.crn > cap]):
        return st_[["vec_id", "cell", "d2"]], max_rounds
    raise AssertionError("no fixpoint within max_rounds")


def make_instance(vecs: np.ndarray, kc: int):
    """Postings + full per-vector cell ranking from integer vectors and
    ``kc`` deterministic centroids (same tie-breaks as the engine:
    ascending d2 then cell)."""
    rng = np.random.default_rng(7)
    cents = rng.integers(-50, 50, size=(kc, vecs.shape[1])).astype(np.int64)
    d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    order = np.argsort(d, axis=1, kind="stable")
    ext = pd.DataFrame(
        [
            (v, r + 1, int(order[v, r]), int(d[v, order[v, r]]))
            for v in range(len(vecs))
            for r in range(kc)
        ],
        columns=["vec_id", "rn", "cell", "d2"],
    )
    post = ext[ext.rn <= ASSIGN][["vec_id", "cell", "d2"]].reset_index(
        drop=True
    )
    return post, ext


def cap_for(n: int, kc: int) -> int:
    return (qs.CAP_NUM * ASSIGN * n + qs.CAP_DEN * kc - 1) // (
        qs.CAP_DEN * kc
    )


def check_invariants(post0: pd.DataFrame, fin: pd.DataFrame, cap: int):
    # conservation: every posting still exists, none duplicated
    assert len(fin) == len(post0)
    # balance: no cell above cap
    assert fin.groupby("cell").size().max() <= cap
    # a vector never holds two postings in the same cell
    assert not fin.duplicated(["vec_id", "cell"]).any()
    # per-vector posting count unchanged
    assert (fin.groupby("vec_id").size() == ASSIGN).all()


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(30, 120),
    kc=st.integers(20, 40),
    spread=st.integers(0, 40),
    seed=st.integers(0, 10_000),
)
def test_fixpoint_invariants_under_random_skew(n, kc, spread, seed):
    """Vectors drawn from a few tight clusters (spread=0 -> every
    cluster collapses to literally identical vectors) — the skewed
    regimes that overfill cells."""
    rng = np.random.default_rng(seed)
    centers = rng.integers(-50, 50, size=(3, 8))
    which = rng.integers(0, 3, size=n)
    vecs = centers[which] + rng.integers(
        -spread, spread + 1, size=(n, 8)
    )
    post, ext = make_instance(vecs.astype(np.int64), kc)
    cap = cap_for(n, kc)
    fin, rounds = ref_fixpoint(post, ext, cap)
    check_invariants(post, fin, cap)


def test_fixpoint_adversarial_identical_batch():
    """The worst case: EVERY vector identical — all postings land in
    the same ASSIGN cells and the fixpoint must fan them out layer by
    layer without dropping or duplicating any."""
    n, kc = 40, 20
    vecs = np.tile(np.arange(8, dtype=np.int64), (n, 1))
    post, ext = make_instance(vecs, kc)
    cap = cap_for(n, kc)
    fin, rounds = ref_fixpoint(post, ext, cap)
    check_invariants(post, fin, cap)
    assert rounds >= 2  # genuinely needed iteration, not a no-op


def test_catalog_fixpoint_is_balanced(spark, sf_dir):
    import __spark_entry__ as e

    df = e.queries()["similarity_ivf_cell_split_fixpoint"](spark, sf_dir)
    pdf = df.toPandas()
    from spark_dns_spark.session import load_table

    n_total = load_table(spark, sf_dir, "embeddings").count()
    cap = cap_for(n_total, qs.ivf_kc(n_total))
    assert len(pdf) == ASSIGN * n_total  # conservation
    assert pdf.groupby("cell").size().max() <= cap
    assert not pdf.duplicated(["vec_id", "cell"]).any()


def test_catalog_upsert_rebalance_is_bounded(spark, sf_dir):
    import __spark_entry__ as e

    pdf = e.queries()["similarity_ivf_upsert_rebalance"](
        spark, sf_dir
    ).toPandas()
    assert len(pdf) > 0
    assert (pdf.max_sz <= pdf.cap_sz).all()
    # skew itself bounded by the cap/median ratio the cap implies
    assert (pdf.skew_e4 <= pdf.cap_sz * 10000 // pdf.median_sz).all()


def test_ref_boundary_exact_last_move_is_fixpoint():
    """ADVICE r11 off-by-one: a corpus converging on exactly the
    max_rounds-th move must RETURN (the SQL oracle unrolls that many
    move rounds and returns the balanced result), not raise."""
    n, kc = 40, 20
    vecs = np.tile(np.arange(8, dtype=np.int64), (n, 1))
    post, ext = make_instance(vecs, kc)
    cap = cap_for(n, kc)
    _, rounds = ref_fixpoint(post, ext, cap)
    assert rounds >= 2
    fin, r2 = ref_fixpoint(post, ext, cap, max_rounds=rounds)
    assert r2 == rounds
    check_invariants(post, fin, cap)
    with pytest.raises(AssertionError, match="no fixpoint"):
        ref_fixpoint(post, ext, cap, max_rounds=rounds - 1)


def test_spark_boundary_exact_last_move_is_fixpoint(spark, sf_dir):
    """The Spark implementation has the same boundary semantics: with
    rounds_max pinned to the measured fixpoint it returns the same
    balanced state; one fewer raises."""
    from spark_dns_spark.plans import q_kmeans as km
    from spark_dns_spark.session import load_table

    root = qs.ivf_index_path(spark, sf_dir)
    cents = qs.load_cents(spark, f"{root}/cents")
    n_total = load_table(spark, sf_dir, "embeddings").count()
    cap = cap_for(n_total, qs.ivf_kc(n_total))
    st0 = spark.read.parquet(f"{root}/asg").select("vec_id", "cell", "d2")
    q = km.quantize(qs._vectors(spark, sf_dir).select("vec_id", "v"))
    fin, rounds = qs._split_to_fixpoint(spark, q, cents, st0, cap)
    want = sorted(map(tuple, fin.select("vec_id", "cell").collect()))
    fin2, r2 = qs._split_to_fixpoint(
        spark, q, cents, st0, cap, rounds_max=rounds
    )
    assert r2 == rounds
    assert sorted(map(tuple, fin2.select("vec_id", "cell").collect())) == want
    if rounds >= 1:
        with pytest.raises(RuntimeError, match="did not reach fixpoint"):
            qs._split_to_fixpoint(
                spark, q, cents, st0, cap, rounds_max=rounds - 1
            )
