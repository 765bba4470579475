"""Z-order layout — key correctness vs a sequential Morton replay, and
the PRUNING claim proven against real parquet footers: a z-sorted
layout gives every file a tight bounding box in BOTH dimensions, while
a single-column sort leaves the secondary axis unprunable."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from spark_dns_spark.plans.catalog import catalog
from spark_dns_spark.plans.q_layout import BITS


def _morton(a: int, b: int) -> int:
    z = 0
    for i in range(BITS):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_key_matches_sequential_replay(spark, sf_dir):
    rows = catalog()["layout_zorder_events"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["zkey"] == _morton(r["user_id"], r["k"]), r


def _file_bounds(path_glob: str, col: str):
    """(min, max) of ``col`` per parquet file, from footer stats only."""
    bounds = []
    for p in sorted(glob.glob(path_glob)):
        md = pq.read_metadata(p)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            c = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == col
            )
            st = c.statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        bounds.append((lo, hi))
    return bounds


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Write the same table (a) sorted by user_id only and (b) sorted
    by zkey, 8 files each.  For a point predicate on k (the SECONDARY
    axis), footer min-max stats must let the z-layout skip files the
    user_id-layout cannot skip at all."""
    df = catalog()["layout_zorder_events"].fn(spark, sf_dir)
    n_files = 8
    base = str(tmp_path)

    (
        df.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(os.path.join(base, "by_user"))
    )
    (
        df.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(os.path.join(base, "by_zkey"))
    )

    k_vals = [r["k"] for r in df.select("k").distinct().collect()]
    probe = sorted(k_vals)[len(k_vals) // 2]  # a mid-range point lookup

    user_bounds = _file_bounds(os.path.join(base, "by_user", "*.parquet"), "k")
    z_bounds = _file_bounds(os.path.join(base, "by_zkey", "*.parquet"), "k")
    assert len(user_bounds) >= n_files // 2  # layouts actually split

    skip_user = sum(1 for lo, hi in user_bounds if probe < lo or probe > hi)
    skip_z = sum(1 for lo, hi in z_bounds if probe < lo or probe > hi)
    # user_id-sorted files each span ~the whole k domain: nothing skips;
    # z-sorted files cover k-boxes: at least a quarter of them skip
    assert skip_user == 0
    assert skip_z >= len(z_bounds) // 4, (skip_z, z_bounds)
