"""Oracle SQL must run under a STARVED DuckDB — the r8 regression gate.

The driver's correctness harness runs each oracle in a DuckDB whose
memory cap is much tighter than tools/check_oracle.py's 40%-of-RAM
bound; in r8 the (then 179-CTE) `similarity_pq_codes` oracle OOMed
THERE while passing locally, producing the round's only red gate row
(VERDICT r8 item 1).  This test runs the largest oracles by SQL size
under ``SET memory_limit='500MB'`` so a memory-hungry oracle shape is
caught before the round ships, not by the driver.

Correctness of the VALUES is the full oracle gate's job
(tools/check_oracle.py); here only "executes under starvation" is
asserted (plus non-empty output as a sanity floor).
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

#: How many of the largest oracles (by SQL length) to starve-test
#: BEYOND the driver window (size was a bad predictor in r12:
#: `dedup_semantic_semdedup` OOM'd the driver's DuckDB while ranking
#: ~13th by length — VERDICT r12 item 3 — so the whole 50-query window
#: is now starved unconditionally and the size heuristic only extends
#: coverage to big out-of-window oracles).
TOP_N = 8

#: Driver correctness-window size (first N catalog entries).
WINDOW_N = 50


def _top_oracles() -> list[tuple[str, str]]:
    import __spark_entry__ as e

    oracles = e.oracle_sql()
    window = [
        (n, oracles[n]) for n in list(e.queries())[:WINDOW_N] if n in oracles
    ]
    in_window = {n for n, _ in window}
    biggest = [
        kv
        for kv in sorted(oracles.items(), key=lambda kv: -len(kv[1]))[:TOP_N]
        if kv[0] not in in_window
    ]
    return window + biggest


#: The driver gate runs at sf0.01 — starve-test at the SAME scale (the
#: session sf_dir fixture is sf0.001, too small to reproduce pressure).
SF_GATE = "/root/testdata/sf0.01"


@pytest.mark.parametrize(
    "name,sql", _top_oracles(), ids=[n for n, _ in _top_oracles()]
)
def test_oracle_runs_under_500mb(name: str, sql: str):
    con = duckdb.connect()
    con.execute("SET threads=4")
    con.execute("SET memory_limit='500MB'")
    with tempfile.TemporaryDirectory(prefix="duck_starve_") as spill:
        con.execute(f"SET temp_directory='{spill}'")
        for t in TABLES:
            p = Path(SF_GATE) / f"{t}.parquet"
            if p.exists():
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{p}'"
                )
        df = con.execute(sql).df()
    assert len(df) > 0, f"{name}: starved oracle returned no rows"


def test_configure_duck_tolerates_malformed_env(monkeypatch):
    """A malformed SPARK_GRAFT_DUCK_MEM_GB ('16GB', ' ') must not kill
    the oracle run — fall back to the computed coexistence cap
    (ADVICE r12)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.check_oracle import configure_duck

    for bad in ("16GB", "", "  ", "4.5"):
        monkeypatch.setenv("SPARK_GRAFT_DUCK_MEM_GB", bad)
        con = duckdb.connect()
        configure_duck(con)  # must not raise
        lim = con.execute(
            "SELECT current_setting('memory_limit')"
        ).fetchone()[0]
        assert lim  # a limit was still applied
        con.close()
