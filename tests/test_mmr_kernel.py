"""Unit pins for the cogrouped MMR greedy kernel (r12).

The kernel replaced the r11 lazy DataFrame chain (321 exchanges / 120
SMJs over shortlist-sized rows) — these tests pin the selection
semantics the unrolled SQL oracle encodes, on hand-built groups, so a
kernel regression is caught without a Spark session.
"""

from __future__ import annotations

import pandas as pd

from spark_dns_spark.plans.q_similarity import (
    MMR_DIV_W,
    MMR_REL_W,
    MMR_SELECT,
    _mmr_kernel,
)


def _b(rows):
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rel_e4"])


def _p(qid, sims):
    return pd.DataFrame(
        [(qid, a, b, s) for (a, b), s in sims.items()],
        columns=["qid", "a", "b", "sim_e4"],
    )


def _full_pairs(rel, sims):
    """Symmetric pair table over every distinct shortlist pair (the
    production shape: pair is built base x base)."""
    out = {}
    for a in rel:
        for b in rel:
            if a != b:
                key = (min(a, b), max(a, b))
                out[(a, b)] = sims.get(key, 0)
    return out


def test_round1_pure_relevance_tie_to_smaller_id():
    rel = {10: 9000, 3: 9000, 7: 8000}
    bdf = _b([(1, n, r) for n, r in rel.items()])
    out = _mmr_kernel(bdf, _p(1, _full_pairs(rel, {})))
    first = out[out.sel_rank == 1].iloc[0]
    assert first.neighbor_id == 3  # ties to the smaller neighbor_id
    assert first.mmr_score == MMR_REL_W * 9000


def test_diversity_beats_relevance():
    # 2 is nearly a copy of 1 (sim 9900); 5 is less relevant but
    # diverse — MMR must pick 5 second.
    rel = {1: 9500, 2: 9400, 5: 7000}
    sims = {(1, 2): 9900, (1, 5): 1000, (2, 5): 1000}
    bdf = _b([(9, n, r) for n, r in rel.items()])
    out = _mmr_kernel(bdf, _p(9, _full_pairs(rel, sims)))
    ranks = dict(zip(out.sel_rank, out.neighbor_id))
    assert ranks[1] == 1
    assert ranks[2] == 5
    # and the score is exactly 7*rel - 3*maxsim
    second = out[out.sel_rank == 2].iloc[0]
    assert second.mmr_score == MMR_REL_W * 7000 - MMR_DIV_W * 1000


def test_maxsim_is_over_the_whole_selected_set():
    # candidate 4: far from pick 1, near pick 2 — round 3 must use the
    # max over BOTH selected, not just the latest.
    rel = {1: 9000, 2: 8000, 4: 7900, 6: 100}
    sims = {(1, 2): 0, (1, 4): 0, (2, 4): 9500, (1, 6): 0, (2, 6): 0, (4, 6): 0}
    bdf = _b([(2, n, r) for n, r in rel.items()])
    out = _mmr_kernel(bdf, _p(2, _full_pairs(rel, sims)))
    ranks = dict(zip(out.sel_rank, out.neighbor_id))
    assert ranks[1] == 1 and ranks[2] == 2
    # 4's penalized score: 7*7900 - 3*9500 = 26800; 6's: 7*100 = 700
    assert ranks[3] == 4
    row3 = out[out.sel_rank == 3].iloc[0]
    assert row3.mmr_score == MMR_REL_W * 7900 - MMR_DIV_W * 9500


def test_short_group_stops_early_and_singleton_has_no_round2():
    # 2 candidates -> exactly 2 rows; 1 candidate -> exactly 1 row
    # (the oracle's inner join on pair drops a pairless candidate).
    rel = {1: 5000, 2: 4000}
    out = _mmr_kernel(
        _b([(5, n, r) for n, r in rel.items()]),
        _p(5, _full_pairs(rel, {(1, 2): 100})),
    )
    assert sorted(out.sel_rank) == [1, 2]
    solo = _mmr_kernel(_b([(5, 1, 5000)]), _p(5, {}))
    assert list(solo.sel_rank) == [1]


def test_selects_at_most_mmr_select():
    rel = {i: 1000 * i for i in range(1, 12)}
    sims = {}
    out = _mmr_kernel(
        _b([(7, n, r) for n, r in rel.items()]),
        _p(7, _full_pairs(rel, sims)),
    )
    assert len(out) == MMR_SELECT
    assert sorted(out.sel_rank) == list(range(1, MMR_SELECT + 1))


def test_empty_group_returns_schema_stable_empty():
    out = _mmr_kernel(_b([]), _p(1, {}))
    assert list(out.columns) == [
        "query_id",
        "neighbor_id",
        "mmr_score",
        "sel_rank",
    ]
    assert out.empty


# --- property pin: kernel == independent greedy reference --------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:

    def _reference_mmr(rel, sims):
        """Straight-line reimplementation of the oracle's greedy rounds
        (independent of the kernel's data structures)."""
        out = []
        sel = []
        cands = sorted(rel, key=lambda c: (-rel[c], c))
        if not cands:
            return out
        out.append((cands[0], MMR_REL_W * rel[cands[0]], 1))
        sel.append(cands[0])
        for t in range(2, MMR_SELECT + 1):
            scored = []
            for c in rel:
                if c in sel:
                    continue
                ss = [sims[(c, s)] for s in sel if (c, s) in sims]
                if not ss:
                    continue
                scored.append(
                    (MMR_REL_W * rel[c] - MMR_DIV_W * max(ss), c)
                )
            if not scored:
                break
            score, pick = max(scored, key=lambda x: (x[0], -x[1]))
            out.append((pick, score, t))
            sel.append(pick)
        return out

    @settings(max_examples=300, deadline=None)
    @given(
        st.dictionaries(
            st.integers(0, 30),
            st.integers(-10_000, 10_000),
            min_size=1,
            max_size=12,
        ),
        st.data(),
    )
    def test_kernel_matches_reference_on_random_groups(rel, data):
        ids = sorted(rel)
        sims = {}
        for a in ids:
            for b in ids:
                if a != b:
                    # draw each directed sim independently: the SQL pair
                    # table is built from two cosine evaluations, so the
                    # kernel must not assume symmetry
                    sims[(a, b)] = data.draw(
                        st.integers(-10_000, 10_000)
                    )
        bdf = pd.DataFrame(
            [(1, n, r) for n, r in rel.items()],
            columns=["query_id", "neighbor_id", "rel_e4"],
        )
        pdf = pd.DataFrame(
            [(1, a, b, s) for (a, b), s in sims.items()],
            columns=["qid", "a", "b", "sim_e4"],
        )
        got = [
            (int(r.neighbor_id), int(r.mmr_score), int(r.sel_rank))
            for r in _mmr_kernel(bdf, pdf).itertuples()
        ]
        assert got == _reference_mmr(rel, sims)
