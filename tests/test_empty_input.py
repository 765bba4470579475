"""Zero-row robustness: every engine-tier catalog query must execute
cleanly over EMPTY copies of all input tables.

This is where ANSI-mode traps live (array index on empty, division in
an empty aggregate, sequence() with degenerate bounds, percentile of
nothing, iterative loops with no edges) — a 100 TB pipeline routinely
hits empty partitions, empty date slices, and empty incremental
batches, and an operator that throws on empty input is not
production-shaped.  Connector/streaming queries are exercised
elsewhere against their own stores and are excluded here.
"""

from __future__ import annotations

import pytest

from spark_dns_spark.plans.catalog import catalog
from tools.check_oracle import TABLES


@pytest.fixture(scope="module")
def empty_sf(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    from pathlib import Path

    for t in TABLES:
        src = Path(sf_dir) / f"{t}.parquet"
        if not src.exists():
            continue
        if t == "events":
            # preserve the NANOS-as-long read path the feed layer handles
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        (
            spark.read.parquet(str(src))
            .limit(0)
            .write.mode("overwrite")
            .parquet(str(d / f"{t}.parquet"))
        )
    return str(d)


def _engine_queries():
    out = []
    for name, q in catalog().items():
        if {"connector", "streaming"} & set(q.tags):
            continue
        out.append(name)
    return sorted(out)


@pytest.mark.parametrize("name", _engine_queries())
def test_runs_on_empty_input(name, spark, empty_sf):
    df = catalog()[name].fn(spark, empty_sf)
    # must plan and execute without raising; result is a valid (almost
    # always empty, occasionally all-zero-aggregate) relation
    n = df.count()
    assert n >= 0
    assert df.columns
