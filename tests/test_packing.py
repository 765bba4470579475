"""Sequence-packing invariants (q_packing) — properties the oracle's
hash equality can't articulate:

- stream packing is a conserved prefix sum: offsets/pack ids are
  consistent with each doc's token count and the global stream order;
- greedy bins never overflow the budget, fill resets exactly at bin
  boundaries, and bin ids are dense per shard.
"""

from __future__ import annotations

import pytest

from spark_dns_spark.plans.catalog import catalog
from spark_dns_spark.plans.q_packing import BUDGET


@pytest.fixture(scope="module")
def stream_rows(spark, sf_dir):
    df = catalog()["pack_tokens_stream"].fn(spark, sf_dir)
    return sorted((r.asDict() for r in df.collect()), key=lambda r: r["doc_id"])


@pytest.fixture(scope="module")
def greedy_rows(spark, sf_dir):
    df = catalog()["pack_greedy_bins"].fn(spark, sf_dir)
    return [r.asDict() for r in df.collect()]


def test_stream_is_a_conserved_prefix_sum(stream_rows):
    assert stream_rows, "documents table should not be empty"
    cum = 0
    for r in stream_rows:
        assert r["pack_first"] == cum // BUDGET
        assert r["pack_offset"] == cum % BUDGET
        cum += r["n_tok"]
        if r["n_tok"] > 0:
            assert r["pack_last"] == (cum - 1) // BUDGET
        else:
            assert r["pack_last"] == r["pack_first"]
        assert r["n_packs"] == max(1, r["pack_last"] - r["pack_first"] + 1)


def test_stream_packs_are_contiguous(stream_rows):
    """No pack index is skipped: consecutive docs' pack ranges chain."""
    prev_last = 0
    for r in stream_rows:
        assert r["pack_first"] in (prev_last, prev_last + 1), (
            "a doc must start in its predecessor's last pack, or the "
            "next one when the boundary fell exactly between them "
            f"(doc {r['doc_id']}: first={r['pack_first']} prev_last={prev_last})"
        )
        prev_last = r["pack_last"]


def test_greedy_bins_respect_budget(greedy_rows):
    assert greedy_rows
    for r in greedy_rows:
        assert 0 < r["bin_fill"] <= BUDGET or r["n_tok"] == 0
        assert r["n_tok"] <= BUDGET  # capped input contract


def test_greedy_fill_replays_per_shard(greedy_rows):
    """Replaying next-fit per shard in doc_id order reproduces the
    distributed result exactly — the applyInPandas groups ARE the
    sequential semantics, not an approximation of them."""
    by_shard: dict[int, list[dict]] = {}
    for r in greedy_rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        fill, bin_id = 0, 0
        for r in rows:
            if fill + r["n_tok"] > BUDGET:
                bin_id += 1
                fill = r["n_tok"]
            else:
                fill += r["n_tok"]
            assert (r["bin_id"], r["bin_fill"]) == (bin_id, fill), (
                f"shard {shard} doc {r['doc_id']}"
            )


def test_greedy_bin_ids_dense(greedy_rows):
    by_shard: dict[int, set[int]] = {}
    for r in greedy_rows:
        by_shard.setdefault(r["shard"], set()).add(r["bin_id"])
    for shard, bins in by_shard.items():
        assert bins == set(range(max(bins) + 1)), f"shard {shard} skips a bin"


# ---- property tests: the greedy recurrence as a pure function ----

from hypothesis import given, strategies as st

from spark_dns_spark.plans.q_packing import greedy_pack


@given(st.lists(st.integers(min_value=0, max_value=BUDGET), max_size=200))
def test_greedy_pack_properties(tokens):
    bins, fills = greedy_pack(tokens)
    assert len(bins) == len(fills) == len(tokens)
    fill = 0
    bin_id = 0
    for t, b, f in zip(tokens, bins, fills):
        # never overflows; fill is the exact running content
        assert f <= BUDGET
        if fill + t > BUDGET:
            assert (b, f) == (bin_id + 1, t)
        else:
            assert (b, f) == (bin_id, fill + t)
        bin_id, fill = b, f
    # bin ids are a nondecreasing dense sequence starting at 0
    if bins:
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))


@given(
    st.lists(st.integers(min_value=1, max_value=BUDGET), min_size=1, max_size=200)
)
def test_greedy_pack_wastes_less_than_one_budget_per_bin(tokens):
    """Next-fit guarantee: any two consecutive bins together hold more
    than one budget — the classic 2x bound on wasted space."""
    bins, fills = greedy_pack(tokens)
    per_bin: dict[int, int] = {}
    for b, t in zip(bins, tokens):
        per_bin[b] = per_bin.get(b, 0) + t
    totals = [per_bin[b] for b in sorted(per_bin)]
    for a, b in zip(totals, totals[1:]):
        assert a + b > BUDGET
