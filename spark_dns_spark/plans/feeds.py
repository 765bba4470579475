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
import hashlib
import os
import shutil
import tempfile
import threading
import uuid
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


#: Cross-process disk cache root (VERDICT-r11 item 1a): every fresh
#: process used to retrain Lloyd/PQ from scratch because only the
#: *pointer* to the built parquet lived in a process dict — the single
#: biggest cost in the driver's correctness window (102 s of its 153 s
#: before death was ANN index rebuilds).  Indexes are deterministic
#: functions of (code, source parquet), so a content-keyed directory
#: under a stable root is safe to reuse across processes.  Override
#: with SPARK_GRAFT_INDEX_CACHE=<dir>; set it to "0" to disable the
#: disk layer (in-process behavior is unchanged either way).
_DISK_CACHE_ENV = "SPARK_GRAFT_INDEX_CACHE"

#: marker file written inside a finished build BEFORE the atomic
#: rename publishes it — a directory without it (a build killed
#: mid-write, then orphaned) is never trusted.
_DONE_MARKER = "_SPARK_GRAFT_INDEX_OK"

_CODE_KEY: list = []  # 1-element memo (max .py mtime under the package)


def _disk_cache_root() -> str | None:
    v = os.environ.get(_DISK_CACHE_ENV)
    if v == "0":
        return None
    return v or os.path.join(tempfile.gettempdir(), "spark_graft_idx")


def _code_key() -> str:
    """Cache-key component that invalidates disk entries whenever ANY
    package source changes: index layout/geometry lives in code, so a
    dir built by yesterday's code must never serve today's query.
    Max mtime over the package's .py files is conservative (any edit
    invalidates everything) but exactly right for the gate scenario:
    the driver runs on an unchanged committed tree, so warm-up runs
    and both driver children share the key."""
    if not _CODE_KEY:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        mt = 0.0
        for dirpath, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    try:
                        mt = max(mt, os.path.getmtime(os.path.join(dirpath, f)))
                    except OSError:
                        pass
        _CODE_KEY.append(f"{mt:.6f}")
    return _CODE_KEY[0]


def _disk_lookup(name: str, key: tuple) -> tuple[str | None, str | None]:
    """(published_path_or_None, target_path_or_None) for the disk slot
    of ``key``; (None, None) when the disk layer is disabled."""
    root = _disk_cache_root()
    if root is None:
        return None, None
    digest = hashlib.sha256(
        repr((name, key, _code_key())).encode()
    ).hexdigest()[:20]
    target = os.path.join(root, name, digest)
    if os.path.exists(os.path.join(target, _DONE_MARKER)):
        return target, target
    return None, target


def _disk_publish(target: str, build: Callable[[str], None]) -> str:
    """Build into a sibling temp dir, stamp the done-marker, then
    atomically rename into the keyed slot.  Two processes building the
    same key concurrently each do the (deterministic) work once; the
    first rename wins and the loser adopts the winner's dir."""
    parent = os.path.dirname(target)
    os.makedirs(parent, exist_ok=True)
    tmp = os.path.join(parent, f".build_{os.getpid()}_{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp)  # parity with scratch_dir: builders get a live dir
    try:
        build(tmp)
        with open(os.path.join(tmp, _DONE_MARKER), "w") as fh:
            fh.write("ok\n")
    except BaseException:
        # A mid-build failure (disk-full/quota AFTER makedirs succeeded)
        # must not strand the half-written temp dir under the cache root
        # — they accumulate across failures (ADVICE r12).  The caller's
        # fallback re-runs build() into scratch.
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        os.rename(tmp, target)
        return target
    except OSError:
        if os.path.exists(os.path.join(target, _DONE_MARKER)):
            shutil.rmtree(tmp, ignore_errors=True)
            return target
        # target exists but is NOT a finished publish (marker gone —
        # e.g. manual tampering): it's garbage, replace it with ours
        shutil.rmtree(target, ignore_errors=True)
        os.rename(tmp, target)
        return target


def cached_index_path(
    cache: dict,
    sf_dir: str,
    source: str,
    build: Callable[[str], None],
    name: str = "index",
) -> str:
    """Thread-safe cache of a built parquet index: process dict in
    front, content-keyed disk directory behind it.

    ``build(root)`` populates a fresh dir; the cache key is
    ``(sf_dir, mtime(source parquet))`` so a regenerated backing
    dataset invalidates the cached index instead of silently serving
    stale postings (ADVICE r8); the DISK key additionally folds in the
    package code mtime so a code edit can never serve a stale layout.
    Locking: the global lock covers only dict lookups, so a cache HIT
    never waits on an unrelated index's in-flight build; a per-(cache,
    key) latch makes two simultaneous first calls produce ONE build.
    ``name`` namespaces the disk slot (different indexes legitimately
    share (sf_dir, mtime) keys)."""
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
        published, target = _disk_lookup(name, key)
        if published is not None:
            root = published  # another process already built this index
        elif target is not None:
            try:
                root = _disk_publish(target, build)
            except OSError:
                # unwritable cache root (read-only tmp, quota, hostile
                # sandbox): the disk layer is an optimization, never a
                # requirement — degrade to process-lifetime scratch
                root = scratch_dir("idx_")
                build(root)
        else:  # disk layer disabled: process-lifetime scratch dir
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
