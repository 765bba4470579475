"""Derived input feeds for the query catalog.

The driver's testdata (TESTDATA.md) has no DNS tables, so the
change-log feed the reference emits (FIXTURES.md §1) is *derived
deterministically* from ``events`` — identically in Spark (DataFrame
ops, below) and in the DuckDB oracle (CTE string, below).  Every
catalog query over the feed therefore has an exact ANSI-SQL oracle.

Mapping (FIXTURES.md §3): ``event_type`` → action, synthetic
fqdn/ip from integer id columns (integer-only arithmetic — float→int
casts round differently across engines), ``ts`` → transfer time.
Some fqdns deliberately lack the trailing dot to exercise F6.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading
from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scratch_dir(prefix: str) -> str:
    """mkdtemp whose tree is reclaimed at interpreter exit — plan
    builders run many times per process (bench/oracle loops), so
    leaked source copies + checkpoints add up (ADVICE r6)."""
    root = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


#: Guards ONLY the cache-dict / latch-dict lookups (never held across
#: a build): a hit on one index cache must not stall behind another
#: index's seconds-long in-flight build.  Per-(cache, key) latches
#: below serialize concurrent SAME-index first builds so a bare
#: check/insert race can't produce a duplicate build + leaked scratch
#: dir (ADVICE r8).
_INDEX_LOCK = threading.Lock()

#: (id(cache), key) -> lock for an in-flight build.  Keyed by the
#: cache identity too: different indexes legitimately share
#: (sf_dir, mtime) keys.
_BUILD_LATCHES: dict = {}


def cached_index_path(
    cache: dict, sf_dir: str, source: str, build: Callable[[str], None]
) -> str:
    """Thread-safe process-lifetime cache of a built parquet index.

    ``build(root)`` populates a fresh scratch dir; the cache key is
    ``(sf_dir, mtime(source parquet))`` so a regenerated backing
    dataset invalidates the cached index within the process instead of
    silently serving stale postings (ADVICE r8).  Locking: the global
    lock covers only dict lookups, so a cache HIT never waits on an
    unrelated index's in-flight build; a per-(cache, key) latch makes
    two simultaneous first calls produce ONE build and ONE scratch
    dir."""
    src = os.path.join(sf_dir, source)
    try:
        key = (sf_dir, os.path.getmtime(src))
    except OSError:
        key = (sf_dir, None)
    with _INDEX_LOCK:
        hit = cache.get(key)
        if hit is not None:
            return hit
        latch = _BUILD_LATCHES.setdefault((id(cache), key), threading.Lock())
    with latch:
        with _INDEX_LOCK:  # the build may have finished while we waited
            hit = cache.get(key)
        if hit is not None:
            return hit
        root = scratch_dir("idx_")
        build(root)
        with _INDEX_LOCK:
            cache[key] = root
            # Publish-then-drop: late arrivals hit the cache before ever
            # reaching the latch dict, and threads already parked on this
            # latch hold their own reference, so popping here can't strand
            # anyone — it just stops per-(cache, mtime-key) locks from
            # accumulating across dataset regenerations (ADVICE r9).
            _BUILD_LATCHES.pop((id(cache), key), None)
        return root


def single_part_file(part_dir: str, what: str) -> str:
    """Path of the one data file a ``coalesce(1)`` parquet write emitted.

    The streaming queries stage each delivery half as exactly one file;
    an empty half (possible at an untested scale factor) makes Spark
    emit ZERO part files, and a bare ``(part,) = [...]`` unpack would
    die with an opaque ValueError — name the half instead (ADVICE r9)."""
    parts = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    if len(parts) != 1:
        raise ValueError(
            f"staging {what}: expected exactly 1 parquet part file in "
            f"{part_dir}, found {len(parts)} — an empty delivery half "
            "means this scale factor cannot exercise the two-batch split"
        )
    return os.path.join(part_dir, parts[0])


@contextmanager
def legacy_parquet_nanos(spark: SparkSession):
    """Scoped ``spark.sql.legacy.parquet.nanosAsLong=true`` (needed
    only while planning a read of the pre-r5 nanos-typed events
    parquet); restores the prior value so the shared session config is
    not permanently mutated for later plans (ADVICE r6)."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, "true")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def await_or_fail(q, seconds: int) -> None:
    """availableNow queries must FINISH; a timeout means the output
    directory is partial — fail loudly instead of returning wrong
    aggregates from it (ADVICE r6)."""
    if not q.awaitTermination(seconds):
        q.stop()
        raise RuntimeError(
            f"streaming query {q.name or q.id} did not finish within "
            f"{seconds}s; refusing to read a partial output"
        )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read ``events.parquet`` robustly across testdata generations.

    The driver has regenerated this table with different writers:
    parquet TIMESTAMP(NANOS) (Spark refuses; read nanos-as-long and
    truncate to micros like DuckDB's scan does) and arrow
    ``timestamp[us]`` without the UTC flag (inferred TIMESTAMP_NTZ
    unless the session conf disables that; cast to LTZ — exact under
    the pinned UTC session timezone).  All paths land on a plain
    ``timestamp`` column with identical micros values in both engines.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return normalize_ts(ev)


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Land ``col`` on plain ``timestamp`` whatever the scan produced:
    nanos-as-long (truncate to micros), TIMESTAMP_NTZ (cast — exact
    under the pinned UTC session timezone), or already LTZ (no-op)."""
    ts_type = dict(df.dtypes).get(col)
    if ts_type in ("bigint", "long"):
        return df.withColumn(
            col, F.timestamp_micros(F.expr(f"{col} div 1000"))
        )
    if ts_type == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def dns_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change-log feed: columns
    ``action fqdn ip organization ts event_id user_id value`` —
    the reference read schema (SURVEY.md §1.2) plus lineage ids."""
    ev = load_events(spark, sf_dir)
    action = (
        F.when(F.col("event_type") == "error", F.lit("IXFR_DELETE"))
        .when(F.col("event_type") == "signup", F.lit("AXFR"))
        .otherwise(F.lit("IXFR_ADD"))
    )
    fqdn = F.concat(
        F.lit("host"),
        (F.col("event_id") % 1000).cast("string"),
        F.lit(".zone"),
        (F.col("user_id") % 7).cast("string"),
        F.lit(".example"),
        F.when(F.col("event_id") % 3 == 0, F.lit(".")).otherwise(F.lit("")),
    )
    ip = F.concat(
        F.lit("10."),
        (F.col("user_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("event_id") % 256).cast("string"),
    )
    return ev.select(
        action.alias("action"),
        fqdn.alias("fqdn"),
        ip.alias("ip"),
        F.lit("Acme Inc.").alias("organization"),
        F.col("ts"),
        "event_id",
        "user_id",
        "value",
    )


#: DuckDB CTE equivalent of :func:`dns_changes` — prepend to oracle SQL.
DNS_CHANGES_CTE = """
WITH dns_changes AS (
  SELECT
    CASE WHEN event_type = 'error' THEN 'IXFR_DELETE'
         WHEN event_type = 'signup' THEN 'AXFR'
         ELSE 'IXFR_ADD' END AS action,
    'host' || CAST(event_id % 1000 AS VARCHAR)
      || '.zone' || CAST(user_id % 7 AS VARCHAR)
      || '.example'
      || CASE WHEN event_id % 3 = 0 THEN '.' ELSE '' END AS fqdn,
    '10.' || CAST(user_id % 256 AS VARCHAR)
      || '.0.' || CAST(event_id % 256 AS VARCHAR) AS ip,
    'Acme Inc.' AS organization,
    ts,
    event_id,
    user_id,
    value
  FROM events
)
"""
