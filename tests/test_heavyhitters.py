"""Property tests for the batched Misra-Gries summary
(operators/heavyhitters.py): the undercount bound and the
candidate-superset guarantee the exact verify pass relies on, checked
on adversarial synthetic streams — plus the Spark-level contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_dns_spark.operators import heavyhitters as hh


def _chunks(values, size):
    for i in range(0, len(values), size):
        yield pd.DataFrame({"k": values[i : i + size]})


def _zipf_stream(seed: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, size=n).clip(max=10_000)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("batch", [97, 1000])
def test_mg_bounds_on_zipf(seed, batch):
    vals = _zipf_stream(seed, 20_000)
    k = 64
    summary = hh.mg_partition_summary(_chunks(vals, batch), "k", k)
    exact = pd.Series(vals).value_counts()
    n = len(vals)
    assert len(summary) < k
    for key, c in summary.items():
        # never overcounts, undercounts by at most n/k
        assert c <= exact[key]
        assert c >= exact[key] - n / k
    # superset guarantee: every key above n/k is tracked
    for key, c in exact[exact > n / k].items():
        assert key in summary.index, f"heavy key {key} lost"


def test_mg_multi_partition_superset():
    vals = _zipf_stream(7, 30_000)
    k = 64
    parts = np.array_split(vals, 5)
    cand = set()
    for p in parts:
        cand |= set(hh.mg_partition_summary(_chunks(p, 500), "k", k).index)
    exact = pd.Series(vals).value_counts()
    heavy = set(exact[exact > len(vals) / k].index)
    assert heavy <= cand


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=2000),
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=1, max_value=300),
)
@settings(max_examples=60, deadline=None)
def test_mg_bounds_property(values, k, batch):
    vals = np.array(values)
    summary = hh.mg_partition_summary(_chunks(vals, batch), "k", k)
    exact = pd.Series(vals).value_counts()
    n = len(vals)
    assert len(summary) < max(k, 2)
    for key, c in summary.items():
        assert 0 < c <= exact[key]
    for key, c in exact[exact > n / k].items():
        assert key in summary.index


def test_mg_reduce_is_noop_below_k():
    s = pd.Series([5, 3, 2], index=["a", "b", "c"])
    out = hh.mg_reduce(s, 4)
    assert out.equals(s)


def test_exact_hh_rejects_k_below_threshold(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_dns_spark.plans.feeds import load_events

    ev = load_events(spark, sf_dir).select("event_id")
    with pytest.raises(ValueError):
        hh.exact_heavy_hitters(ev, F.col("event_id").cast("string"), 100, k=50)


def test_exact_hh_nonstring_and_null_keys(spark):
    """ADVICE r6: the operator casts arbitrary-typed keys to string
    (sketch and verify share one domain — no implicit-cast candidate
    loss for float keys) and excludes NULL keys explicitly; n counts
    the non-null domain."""
    from pyspark.sql import functions as F

    rows = (
        [(1.5,)] * 60
        + [(2.25,)] * 30
        + [(None,)] * 40
        + [(float(i),) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "k double")
    out = hh.exact_heavy_hitters(df, F.col("k"), threshold_div=4, k=64)
    got = {r["hh_key"]: r["freq"] for r in out.collect()}
    # n = 100 non-null; freq > 25 ⇒ only 1.5 (60) and 2.25 (30) qualify
    assert got == {"1.5": 60, "2.25": 30}
    ppm = {r["hh_key"]: r["freq_ppm"] for r in out.collect()}
    assert ppm == {"1.5": 600000, "2.25": 300000}
