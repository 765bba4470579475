"""Independent pure-Python references for graph_triangle_count and
linkage_field_scores — both DuckDB oracles share their query's join
formulation, so these recompute the answers from the engine's own
collected pair lists with plain set/loop code."""

from __future__ import annotations

from itertools import combinations

from spark_dns_spark.plans.q_cluster import graph_triangle_count
from spark_dns_spark.plans.q_dedup import (
    LNK_JAC_STRONG,
    LNK_JAC_WEAK,
    LNK_MATCH_T,
    LNK_POSSIBLE_T,
    LNK_W,
    dedup_minhash_lsh,
    linkage_field_scores,
    snm_ranked_pairs,
)
from spark_dns_spark.session import load_table


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b").collect()
    }
    # brute force: every unordered pair is stored as (lo, hi) already
    nodes = sorted({x for p in pairs for x in p})
    tri_per_node: dict[int, int] = {}
    adj = {n: set() for n in nodes}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    for n in nodes:
        for u, v in combinations(sorted(adj[n]), 2):
            if v in adj[u]:
                # triangle (n,u,v) discovered from its lowest... no:
                # count per node by membership, each triangle found
                # once per corner via this loop — divide later
                tri_per_node[n] = tri_per_node.get(n, 0) + 1
    got = {
        r["doc_id"]: r["n_triangles"]
        for r in graph_triangle_count(spark, sf_dir).collect()
    }
    want = {n: c for n, c in tri_per_node.items() if c > 0}
    assert got == want


def test_linkage_scores_match_python_reference(spark, sf_dir):
    _, pairs = snm_ranked_pairs(spark, sf_dir)
    cand = {
        (r["doc_a"], r["doc_b"]): r["jaccard_x1000"]
        for r in pairs.select("doc_a", "doc_b", "jaccard_x1000").collect()
    }
    attrs = {
        r["doc_id"]: (r["lang"], r["source"], r["n_chars"])
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .collect()
    }
    w = LNK_W
    want = {}
    for (a, b), jac in cand.items():
        la, sa, ca = attrs[a]
        lb, sb, cb = attrs[b]
        score = (
            (w["lang_agree"] if la == lb else w["lang_dis"])
            + (w["src_agree"] if sa == sb else w["src_dis"])
            + (w["len_agree"] if abs(ca - cb) * 10 <= max(ca, cb) else w["len_dis"])
            + (
                w["jac_strong"]
                if jac >= LNK_JAC_STRONG
                else w["jac_weak"] if jac >= LNK_JAC_WEAK else w["jac_dis"]
            )
        )
        decision = (
            "match"
            if score >= LNK_MATCH_T
            else "possible" if score >= LNK_POSSIBLE_T else "non_match"
        )
        want[(a, b)] = (jac, score, decision)
    got = {
        (r["doc_a"], r["doc_b"]): (r["jaccard_x1000"], r["score"], r["decision"])
        for r in linkage_field_scores(spark, sf_dir).collect()
    }
    assert got == want


def test_clustering_coefficient_matches_bruteforce(spark, sf_dir):
    from spark_dns_spark.plans.q_cluster import graph_clustering_coefficient

    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b").collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for n, nb in adj.items():
        t = sum(1 for u, v in combinations(sorted(nb), 2) if v in adj[u])
        d = len(nb)
        want[n] = (d, t, (2000 * t) // (d * (d - 1)) if d >= 2 else 0)
    got = {
        r["doc_id"]: (r["degree"], r["n_triangles"], r["coeff_milli"])
        for r in graph_clustering_coefficient(spark, sf_dir).collect()
    }
    assert got == want
