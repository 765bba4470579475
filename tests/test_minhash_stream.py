"""Streaming incremental MinHash dedup with a self-updating index.

Contracts:
1. the streamed pair set is byte-identical to the batch
   dedup_minhash_incremental over the same corpus;
2. cross-micro-batch pairs work: a near-dup pair whose two docs arrive
   in DIFFERENT micro-batches is found exactly once (when the later
   doc probes the accumulated index) and labeled new_new — proven on a
   synthetic corpus where the batch split is controlled (the driver
   corpora may have no natural cross-batch near-dup at the test sf);
3. new-vs-corpus pairs keep working through the same probe.
"""

from __future__ import annotations

from spark_dns_spark.plans import q_dedup as qd


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _synthetic_sf(spark, tmp_path) -> str:
    """documents.parquet where (under BATCH_MOD=10, BATCH_REM=7,
    halves split on (doc_id div 10) % 2):

    - doc 7 (delta, half 0) and doc 17 (delta, half 1) are identical
      -> the cross-micro-batch new_new pair;
    - doc 3 (corpus) and doc 27 (delta, half 0) are identical
      -> a new_corpus pair;
    - every other doc is unique filler (no accidental near-dups).
    """
    dup_a = " ".join(f"alpha{i}" for i in range(20))
    dup_b = " ".join(f"beta{i}" for i in range(20))
    rows = []
    for did in range(40):
        if did in (7, 17):
            text = dup_a
        elif did in (3, 27):
            text = dup_b
        else:
            text = " ".join(f"w{did}x{i}" for i in range(20))
        rows.append((did, text))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    return sf


def test_stream_equals_batch_and_crosses_batches(spark, tmp_path):
    sf = _synthetic_sf(spark, tmp_path)
    st = _rows(qd.dedup_minhash_stream(spark, sf))
    bt = _rows(qd.dedup_minhash_incremental(spark, sf))
    assert st == bt
    by_pair = {(r[0], r[1]): r[3] for r in st}
    assert by_pair[(7, 17)] == "new_new", (
        "cross-micro-batch pair missing or mislabeled: the later doc "
        "must find the earlier one in the accumulated index"
    )
    assert by_pair[(3, 27)] == "new_corpus"
    assert len(by_pair) == len(st), "duplicate pair rows emitted"


def test_stream_equals_batch_on_driver_corpus(spark, sf_dir):
    st = _rows(qd.dedup_minhash_stream(spark, sf_dir))
    bt = _rows(qd.dedup_minhash_incremental(spark, sf_dir))
    assert st == bt
    assert st, "no pairs at this sf — vacuous"
