"""Semantics pins for the SemDeDup family (r12): the dominance drop
rule on constructed cells where the interesting paths — d2 ties, the
corpus-wins rule, chains of domination — actually occur (the synthetic
testdata never produces exact integer-d2 ties, so the oracle gate
alone would leave the tie-break arm unexercised).

These tests drive the REGISTERED Spark queries over hand-built parquet
tables, then assert the decision table row by row.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from spark_dns_spark.plans import q_similarity as qs


def _write_embeddings(spark, path: str, rows):
    """rows: list of (vec_id, vector[list[float]], label)."""
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v], int(lb)) for i, v, lb in rows],
        "vec_id bigint, embedding array<float>, label int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "embeddings.parquet")
    )


def _mk_corpus(n_total: int, dim: int, dup_groups):
    """A base corpus of well-separated random vectors plus injected
    near-duplicate groups: dup_groups is a list of lists of vec_ids
    that must be near-identical (cosine ~1 >> COS_T)."""
    rng = np.random.RandomState(7)
    vecs = {}
    for i in range(n_total):
        v = rng.normal(size=dim)
        vecs[i] = v / np.linalg.norm(v)
    for grp in dup_groups:
        base = vecs[grp[0]]
        for g in grp[1:]:
            # tiny jitter: cosine stays ~0.9999, far above COS_T
            v = base + rng.normal(scale=1e-4, size=dim)
            vecs[g] = v / np.linalg.norm(v)
    return [(i, vecs[i].tolist(), i % 3) for i in range(n_total)]


@pytest.fixture(scope="module")
def semdedup_sf(spark, tmp_path_factory):
    """A corpus whose duplicate groups span the batch/incremental
    boundary: 60 vectors, dups {3, 13} (both base), {7, 17, 27} (all
    delta: vec_id%10==7), {4, 47} (base 4 vs delta 47)."""
    sf = str(tmp_path_factory.mktemp("semdedup_sf"))
    rows = _mk_corpus(60, qs.sim.DIM, [[3, 13], [7, 17, 27], [4, 47]])
    _write_embeddings(spark, sf, rows)
    return sf


def _decisions(df):
    return {
        int(r["vec_id"]): (int(r["kept"]), int(r["cell"]), int(r["d2"]))
        for r in df.collect()
    }


def test_batch_semdedup_drops_exactly_one_of_a_pair(spark, semdedup_sf):
    out = _decisions(
        qs.dedup_semantic_semdedup(spark, semdedup_sf)
    )
    assert len(out) == 60
    for grp in ([3, 13], [7, 17, 27], [4, 47]):
        cells = {out[g][1] for g in grp}
        if len(cells) > 1:
            pytest.skip("near-identical vectors landed in different cells")
        kept = [g for g in grp if out[g][0] == 1]
        # exactly one survivor per near-identical clique, and it is the
        # priority-max: (d2 DESC, vec_id ASC)
        assert len(kept) == 1
        expect = sorted(grp, key=lambda g: (-out[g][2], g))[0]
        assert kept == [expect]
    # far-apart vectors are never dropped
    n_dropped = sum(1 for v in out.values() if v[0] == 0)
    assert n_dropped == 4  # one of {3,13}, two of {7,17,27}, one of {4,47}


def test_incremental_corpus_always_wins(spark, semdedup_sf):
    out = _decisions(
        qs.dedup_semantic_incremental(spark, semdedup_sf)
    )
    # only the delta batch is decided
    assert set(out) == {i for i in range(60) if i % 10 == 7}
    # 47 duplicates base member 4 -> dropped regardless of priority
    assert out[47][0] == 0
    # {7, 17, 27} are all IN the delta: exactly one survives, by the
    # batch rule (d2 DESC, vec_id ASC)
    grp = [7, 17, 27]
    kept = [g for g in grp if out[g][0] == 1]
    assert len(kept) == 1
    expect = sorted(grp, key=lambda g: (-out[g][2], g))[0]
    assert kept == [expect]
    # the rest of the delta (37, 57) is far from everything: kept
    assert out[37][0] == 1 and out[57][0] == 1


def test_d2_tie_breaks_to_smaller_vec_id(spark, tmp_path):
    """EXACT duplicates (identical vectors -> identical quantization ->
    identical integer d2) exercise the tie arm: the smaller vec_id is
    the keep-priority winner."""
    sf = str(tmp_path)
    rows = _mk_corpus(40, qs.sim.DIM, [])
    # make 11 and 31 byte-identical to 21 (same cell, same d2)
    rows = [
        (i, (rows[21][1] if i in (11, 31) else v), lb)
        for i, v, lb in rows
    ]
    _write_embeddings(spark, sf, rows)
    out = _decisions(qs.dedup_semantic_semdedup(spark, sf))
    trio = [11, 21, 31]
    assert len({out[g][1] for g in trio}) == 1, "identical vectors share a cell"
    assert len({out[g][2] for g in trio}) == 1, "identical vectors share d2"
    assert [g for g in trio if out[g][0] == 1] == [11]
