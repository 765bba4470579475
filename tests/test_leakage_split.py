"""Leakage-free split vs an INDEPENDENT union-find reference.

The DuckDB oracle shares the recursive-reachability formulation, so
this validates the split's defining property against a third
implementation: classic path-compressed union-find over the ACTUAL
near-dup pairs the engine reports at sf0.001.
"""

from __future__ import annotations

from spark_dns_spark.plans.q_cluster import (
    mlprep_leakage_free_split,
    mlprep_split_leakage_audit,
)
from spark_dns_spark.plans.q_dedup import dedup_minhash_lsh


class _UF:
    def __init__(self):
        self.p: dict[int, int] = {}

    def find(self, x: int) -> int:
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def test_split_respects_unionfind_components(spark, sf_dir):
    pairs = [
        (r["id_a"], r["id_b"])
        for r in dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b").collect()
    ]
    split = {
        r["doc_id"]: (r["cluster_id"], r["split"])
        for r in mlprep_leakage_free_split(spark, sf_dir).collect()
    }

    uf = _UF()
    for a, b in pairs:
        uf.union(a, b)

    # 1. cluster_id is exactly the union-find component minimum
    roots: dict[int, int] = {}
    for d in uf.p:
        roots.setdefault(uf.find(d), d)
        roots[uf.find(d)] = min(roots[uf.find(d)], d)
    for d in uf.p:
        assert split[d][0] == roots[uf.find(d)], d
    # 2. every pair lands in ONE split (the leakage-free property,
    #    checked against the independent components, not the SQL)
    for a, b in pairs:
        assert split[a][1] == split[b][1], (a, b)
    # 3. docs outside the graph are singletons keyed by their own id
    for d, (cid, _s) in split.items():
        if d not in uf.p:
            assert cid == d
    # 4. all three splits are populated with plausible 80/10/10 mass
    from collections import Counter

    c = Counter(s for _cid, s in split.values())
    n = sum(c.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.6 < c["train"] / n < 0.95


def test_leakage_audit_reports_zero_cross_pairs(spark, sf_dir):
    rows = mlprep_split_leakage_audit(spark, sf_dir).collect()
    assert {r["split"] for r in rows} == {"train", "val", "test"}
    assert all(r["cross_split_pairs"] == 0 for r in rows)
    assert all(r["n_docs"] >= r["n_clusters"] >= 1 for r in rows)
