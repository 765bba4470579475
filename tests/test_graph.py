"""PageRank over the event-transition graph — sequential replay and
structural invariants (the cross-engine hash equality itself is pinned
by the oracle gate; these tests pin the ALGORITHM)."""

from __future__ import annotations

import json
from collections import defaultdict

from spark_dns_spark.plans.catalog import catalog
from spark_dns_spark.plans.feeds import load_events
from spark_dns_spark.plans.q_graph import E9, ITERS


def _sequential_pagerank(rows):
    """Pure-Python replay of the exact integer recurrence."""
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["k"]))
    edges = defaultdict(int)
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            if a is not None and b is not None and a != b:
                edges[(a, b)] += 1
    outw = defaultdict(int)
    for (a, _), w in edges.items():
        outw[a] += w
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    if n == 0:
        return {}
    base = (3 * E9) // (20 * n)
    rank = {v: E9 // n for v in nodes}
    for _ in range(ITERS):
        s = defaultdict(int)
        for (a, b), w in edges.items():
            s[b] += (rank[a] * 17 * w) // (20 * outw[a])
        rank = {v: base + s[v] for v in nodes}
    return rank


def test_pagerank_matches_sequential_replay(spark, sf_dir):
    got = {
        r["node"]: r["rank_e9"]
        for r in catalog()["graph_pagerank_transitions"]
        .fn(spark, sf_dir)
        .collect()
    }
    ev = load_events(spark, sf_dir).collect()
    rows = [
        {
            "user_id": r["user_id"],
            "ts": r["ts"],
            "event_id": r["event_id"],
            "k": (lambda p: p.get("k"))(json.loads(r["props"]))
            if r["props"]
            else None,
        }
        for r in ev
    ]
    want = _sequential_pagerank(rows)
    assert got == want


def test_pagerank_mass_conserved_within_floor_loss(spark, sf_dir):
    """sum(rank) <= 1e9 (floor losses + dangling leak only shrink the
    mass), and every node keeps at least the teleport base."""
    rows = catalog()["graph_pagerank_transitions"].fn(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    total = sum(r["rank_e9"] for r in rows)
    assert total <= E9
    # floor loss is < 1 unit per edge-term per iteration; the teleport
    # base alone accounts for 15% of the mass
    base = (3 * E9) // (20 * n)
    assert all(r["rank_e9"] >= base for r in rows)
    assert total >= int(E9 * 0.9)
