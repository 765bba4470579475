"""Scaling evidence at sf1 (VERDICT-r7 item 2): time the heaviest
catalog queries at sf0.1 and at the generated sf1 (10x rows in
documents/embeddings/events; tools/make_sf1.py) and record the
wall-clock ratio.  Linear-or-sublinear scaling (ratio <= ~10 for 10x
data, modulo fixed per-query planning overhead) is the evidence that
the plan shapes hold under growth — the complement to the plan audit's
static checks.

Timing protocol: per query per SF, one untimed warm run (absorbs
process-lifetime index builds — the MinHash and IVF indexes build once
per (process, sf); production amortizes them the same way) then the
min of 2 timed count() runs.

Usage: python tools/bench_sf1.py [--json OUT.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF01 = "/root/testdata/sf0.1"

#: the top-10 slowest heavy-tier queries (r7 bench detail + VERDICT's
#: plan-audit list), spanning every tier the sf1 gate covers
QUERIES = [
    "graph_pagerank_transitions",
    "dedup_snm_span_clusters",
    "mlprep_leakage_free_split",
    "kmeans_lloyd_cells",
    "similarity_topk_lsh",
    "dedup_minhash_lsh",
    "dedup_exact_substring",
    "pack_tokens_stream",
    "vocab_bpe_merges",
    "graph_triangle_count",
]


def main() -> None:
    out_path = None
    args = sys.argv[1:]
    if args and args[0] == "--json":
        out_path = args[1]
        args = args[2:]

    from tools.make_sf1 import build

    sf1 = build(str(Path(__file__).resolve().parent.parent / ".scratch" / "sf1"))

    from spark_dns_spark.session import get_session

    spark = get_session("bench_sf1")
    import __spark_entry__ as e

    qs = e.queries()
    results: dict[str, dict] = {}
    for name in QUERIES:
        fn = qs[name]
        row: dict = {}
        for label, sf in (("sf0.1", SF01), ("sf1", sf1)):
            fn(spark, sf).count()  # warm (index builds, code paths)
            times = []
            for _ in range(2):
                t0 = time.monotonic()
                n = fn(spark, sf).count()
                times.append(time.monotonic() - t0)
            row[label] = round(min(times), 3)
            row[f"rows_{label}"] = n
        row["ratio"] = round(row["sf1"] / max(row["sf0.1"], 1e-9), 2)
        results[name] = row
        print(
            f"# {name}: sf0.1 {row['sf0.1']}s -> sf1 {row['sf1']}s "
            f"(x{row['ratio']}, rows {row['rows_sf0.1']} -> {row['rows_sf1']})",
            file=sys.stderr,
        )

    doc = {
        "metric": "sf1_scaling",
        "data_growth_x": 10,
        "queries": results,
        "max_ratio": max(r["ratio"] for r in results.values()),
        "sf1_dir": sf1,
    }
    print(json.dumps(doc))
    if out_path:
        Path(out_path).write_text(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
