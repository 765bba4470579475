"""BPE merge training: the distributed run must equal a sequential
pure-Python replay of the same recurrence (the kmeans/pagerank
convention for iterative operators), and the merge semantics must be
left-to-right non-overlapping."""

from __future__ import annotations

from collections import Counter

import pytest

from spark_dns_spark.plans.q_bpe import N_MERGES


def _replay(word_freq: dict[str, int], n_merges: int):
    """Sequential reference BPE: space-delimited sequences, every
    adjacent position counted, argmax with lexicographic tie-break."""
    seqs = {w: " " + " ".join(w) + " " for w in word_freq}
    merges = []
    for k in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, f in word_freq.items():
            syms = seqs[w].split()
            for a, b in zip(syms, syms[1:]):
                counts[f"{a}|{b}"] += f
        if not counts:
            break
        pr = min(counts, key=lambda p: (-counts[p], p))
        a, b = pr.split("|")
        merges.append((k, a, b, a + b, counts[pr]))
        for w in seqs:
            seqs[w] = seqs[w].replace(f" {a} {b} ", f" {a+b} ")
    return merges


def test_replay_overlap_semantics():
    # 'aaa' with pair (a,a): left-to-right gives [aa, a]; the pair
    # count saw BOTH adjacent positions (standard BPE counting)
    merges = _replay({"aaa": 1}, 2)
    assert merges[0] == (1, "a", "a", "aa", 2)
    # second merge: sequence is now ' aa a ' -> pair (aa, a)
    assert merges[1] == (2, "aa", "a", "aaa", 1)


def test_distributed_matches_sequential_replay(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_dns_spark.plans.catalog import catalog
    from spark_dns_spark.session import load_table

    got = sorted(
        tuple(r)
        for r in catalog()["vocab_bpe_merges"].fn(spark, sf_dir).collect()
    )

    words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .count()
        .collect()
    )
    expected = sorted(_replay({r["w"]: r["count"] for r in words}, N_MERGES))
    assert got == expected


def test_replay_deterministic_tiebreak():
    # equal counts: 'ab' vs 'ba' both appear once -> lexicographic win
    merges = _replay({"ab": 1, "ba": 1}, 1)
    assert merges[0][1:3] == ("a", "b")
