"""Distributed exact heavy hitters — the two-phase frequent-items
pattern (Misra-Gries candidate sketch + exact verification pass) that
finds every key with frequency > n/T over a stream too wide to count
exactly per key.

Phase 1 runs a *batched* Misra-Gries summary per partition inside
``mapInPandas`` (Arrow batches; per-batch ``value_counts`` is
vectorized C, the summary merge touches only the batch's unique keys —
never a Python row loop).  The classical decrement step generalizes to
"subtract the k-th largest counter value from all counters, drop
non-positives": one such step with subtrahend m removes ≥ m·k total
mass while any single key loses ≤ m, so across a partition the total
decrement is ≤ n_p/k and every key's final counter satisfies

    c_p(x) - n_p/k  ≤  counter_p(x)  ≤  c_p(x).

Summing over partitions: any key with global count > n/k survives in at
least one partition's summary, so the union of per-partition candidates
is a SUPERSET of the true heavy hitters whenever k > T.  Phase 2
broadcast-semi-joins the (≤ k × partitions)-row candidate set back onto
the stream and counts candidates exactly — output is therefore exact,
independent of partitioning and batch order.

At 100 TB this is the standard shape: the sketch pass is map-only with
O(k) state per task, the verify pass aggregates only candidate keys
(map-side combinable), and no shuffle ever carries the full key space.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Counters per partition summary.  Must exceed the global threshold
#: divisor T (freq > n/T) for the superset guarantee; 4× headroom.
DEFAULT_K = 512


def mg_reduce(counters: pd.Series, k: int) -> pd.Series:
    """One batched Misra-Gries decrement: subtract the k-th largest
    counter value from every counter and drop non-positive results,
    leaving < k survivors.  No-op while fewer than k counters exist."""
    if len(counters) < k:
        return counters
    m = counters.nlargest(k).iloc[-1]
    out = counters - m
    return out[out > 0]


def mg_partition_summary(
    batches: Iterator[pd.DataFrame], col: str, k: int
) -> pd.Series:
    """Fold Arrow batches of one partition into a ≤ k-1-counter
    Misra-Gries summary (int64 counts indexed by key)."""
    counters = pd.Series(dtype="int64")
    for pdf in batches:
        batch = pdf[col].value_counts()
        counters = (
            counters.add(batch, fill_value=0).astype("int64")
            if len(counters)
            else batch.astype("int64")
        )
        counters = mg_reduce(counters, k)
    return counters


def candidates(df: DataFrame, col: str, k: int = DEFAULT_K) -> DataFrame:
    """Per-partition Misra-Gries candidate keys for ``df[col]``."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = mg_partition_summary(batches, col, k)
        yield pd.DataFrame(
            {col: counters.index.astype(str), "approx_count": counters.values}
        )

    return df.select(col).mapInPandas(
        summarize, schema=f"{col} string, approx_count long"
    )


def exact_heavy_hitters(
    df: DataFrame,
    key: Column,
    threshold_div: int,
    k: int = DEFAULT_K,
) -> DataFrame:
    """All keys with exact frequency > n/``threshold_div`` plus their
    integer ppm share.  ``k`` must exceed ``threshold_div``.

    Key domain contract (ADVICE r6): the key is CAST TO STRING at
    entry, so the sketch (whose pandas index is stringly-typed) and
    the exact verify join always agree — a float/decimal key can't be
    silently dropped by an implicit cast mismatch.  NULL keys are
    excluded up front (pandas ``value_counts`` never counts them, so
    they could never be reported anyway); ``n`` therefore counts
    non-null keys and the output is exact over the non-null domain.
    """
    if k <= threshold_div:
        raise ValueError(
            f"MG counters k={k} must exceed threshold divisor "
            f"{threshold_div} for the candidate-superset guarantee"
        )
    stream = df.select(key.cast("string").alias("hh_key")).filter(
        F.col("hh_key").isNotNull()
    )
    cand = candidates(stream, "hh_key", k).select("hh_key").distinct()
    exact = (
        stream.join(F.broadcast(cand), "hh_key")
        .groupBy("hh_key")
        .agg(F.count("*").alias("freq"))
    )
    total = stream.agg(F.count("*").alias("n"))
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("freq") * threshold_div > F.col("n"))
        .select(
            "hh_key",
            "freq",
            F.expr("freq * 1000000 div n").alias("freq_ppm"),
        )
    )
