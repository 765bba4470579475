"""BPE merge training: the distributed run must equal a sequential
pure-Python replay of the same recurrence (the kmeans/pagerank
convention for iterative operators), and the merge semantics must be
left-to-right non-overlapping."""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

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


def test_degenerate_corpus_fewer_merges_than_rounds(spark, tmp_path):
    """A valid corpus can exhaust merges before N_MERGES rounds (all
    words collapse to one symbol).  Spark breaks its loop; the oracle's
    no-winner round must be a NO-OP (coalesce to the empty pattern, a
    replace identity), not a NULL-poisoning replace — both engines must
    still agree on the apply/fertility outputs built on the final
    sequences (code-review r7 finding)."""
    import os

    import duckdb

    from spark_dns_spark.plans import q_bpe
    from tools.check_oracle import _pandas_rows, configure_duck, table_hash

    # every matching word is 'ab': round 1 merges a|b, round 2 has no
    # adjacent pair anywhere -> degenerate
    docs = [(d, "ab ab XX ab") for d in range(6)]
    sf = str(tmp_path / "sf_degen")
    os.makedirs(sf)
    spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "source", F.lit("s0")
    ).write.parquet(os.path.join(sf, "documents.parquet"))

    con = duckdb.connect()
    configure_duck(con)
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    for name in ("vocab_bpe_merges", "vocab_bpe_apply", "vocab_bpe_fertility"):
        sdf = getattr(q_bpe, name)(spark, sf)
        scols, srows = _pandas_rows(sdf.toPandas())
        from spark_dns_spark.plans.catalog import catalog

        dcur = con.execute(catalog()[name].sql)
        dcols = [c[0] for c in dcur.description]
        dcols_rows = _pandas_rows(dcur.df())
        assert len(srows) == len(dcols_rows[1]), name
        assert table_hash(srows, scols) == table_hash(
            dcols_rows[1], dcols_rows[0]
        ), name
    # and the single learned merge is the expected one
    merges, _ = q_bpe._train(spark, sf)
    assert [(m[1], m[2]) for m in merges] == [("a", "b")]
