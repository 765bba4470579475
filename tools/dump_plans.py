"""Dump ``explain("formatted")`` for catalog queries to files.

The optimization rounds require committed before/after physical plans
for every query a round touches (``plans/rN/<query>_{before,after}.txt``)
so the judge can check plan claims without running Spark.

Usage:
    python tools/dump_plans.py --out plans/r15 --suffix after \
        [--sf /root/testdata/sf0.1] query [query ...]

The "before" side of a diff is produced by running this same tool from a
git worktree checked out at the pre-change commit with ``--suffix
before`` and the SAME --out directory (pass an absolute path).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

os.environ.setdefault("SPARK_GRAFT_TRACE", "0")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    import __spark_entry__ as entrymod
    from spark_dns_spark.session import get_session

    qs = entrymod.queries()
    spark = get_session("dump_plans")
    rc = 0
    for name in args.queries:
        fn = qs.get(name)
        if fn is None:
            print(f"MISSING {name}", file=sys.stderr)
            rc = 1
            continue
        df = fn(spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = out / f"{name}_{args.suffix}.txt"
        path.write_text(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
