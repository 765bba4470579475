"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship change-log → current-state query at sf0.001.
``queries()``   — the full catalog (spark_dns_spark.plans.catalog), one
                  entry per implemented operator from SURVEY.md §2.
``oracle_sql()``— DuckDB-runnable ANSI SQL per query (omitted for
                  non-SQL-expressible ops → driver does rows-only check).

Gate breadcrumbs (VERDICT r10 item 1): the driver's correctness artifact
came back empty (``{}``) in rounds 9 and 10 with no repo-side signal of
where the harness stopped.  Every contract call below appends one JSON
line to ``.gate_trace.jsonl`` next to this file — fsync'd, so the trail
survives a hard kill/OOM of the harness process.  Cost is ~2 fsyncs of a
<200-byte line per query (sub-millisecond each); set
``SPARK_GRAFT_TRACE=0`` to disable (our own bench/oracle harnesses do,
so the trace mostly records *external* driver runs).
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the co-located package importable no matter the driver's cwd.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_TRACE_PATH = os.path.join(_REPO, ".gate_trace.jsonl")
_TRACE_ON = os.environ.get("SPARK_GRAFT_TRACE", "1") != "0"


def _trace(phase: str, name: str | None = None, **extra) -> None:
    """Append one breadcrumb line; never raise, never block the caller
    beyond the fsync (needed so a SIGKILL'd harness still leaves the
    trail on disk)."""
    if not _TRACE_ON:
        return
    try:
        rec = {"ts": round(time.time(), 3), "pid": os.getpid(), "phase": phase}
        try:
            # current RSS (MB) of the harness process: the r12 window
            # died to memory pressure (a .so mmap and a DuckDB malloc);
            # with RSS on every breadcrumb, the NEXT pressure kill is
            # attributable from the surviving trail alone.
            with open("/proc/self/statm") as sf:
                rec["rss_mb"] = (
                    int(sf.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")
                ) >> 20
        except Exception:
            pass
        if name is not None:
            rec["name"] = name
        if extra:
            rec.update(extra)
        with open(_TRACE_PATH, "a", encoding="utf-8") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
    except Exception:
        pass


def _traced(name: str, fn: Callable[[SparkSession, str], DataFrame]):
    """Wrap a catalog builder so the trace shows which query the harness
    was building (fn_call → fn_built) when it stopped.  The builder only
    *plans* — the driver collects after return, so a gap after fn_built
    with no following fn_call means death during collect/compare of
    ``name``."""

    def call(spark: SparkSession, sf_dir: str) -> DataFrame:
        _trace("fn_call", name, sf=sf_dir)
        try:
            df = fn(spark, sf_dir)
        except BaseException as e:  # noqa: BLE001 — re-raised; trace only
            _trace("fn_error", name, err=type(e).__name__)
            raise
        _trace("fn_built", name)
        return df

    call.__name__ = getattr(fn, "__name__", name)
    call.__doc__ = getattr(fn, "__doc__", None)
    return call


_trace("import")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: change-log → current-state snapshot (SURVEY.md §7.1
    M0) on /root/testdata/sf0.001."""
    _trace("entry")
    from spark_dns_spark.plans.catalog import catalog

    df = catalog()["changelog_snapshot"].fn(spark, "/root/testdata/sf0.001")
    _trace("entry_built")
    return df


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _trace("queries_build")
    from spark_dns_spark.plans.catalog import catalog

    out = {name: _traced(name, q.fn) for name, q in catalog().items()}
    _trace("queries_ready", n=len(out))
    return out


def oracle_sql() -> dict[str, str]:
    _trace("oracle_build")
    from spark_dns_spark.plans.catalog import catalog

    out = {name: q.sql for name, q in catalog().items() if q.sql is not None}
    _trace("oracle_ready", n=len(out), sql_bytes=sum(len(s) for s in out.values()))
    return out
