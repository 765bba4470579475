"""Scaling evidence at sf10 (VERDICT r14 item 4): time the top-10
heaviest catalog queries at sf0.1 and at a generated sf10 (100x rows
in documents/embeddings/events + the TPC-H fact web;
tools/make_sf1.py build(copies=100)) and record the wall-clock ratio
against each query's designed work-growth class.  This moves the
100 TB claim from design argument to measurement at TWO orders of
magnitude of data growth — the largest scale the local[32] host can
hold.

Work classes are inherited from tools/bench_sf1.py and squared for
the extra decade: linear work -> 100x, n^1.5 -> 1000x, |Q| x corpus
quadratic -> 10000x.  The OUTPUT_BOUND allowlist and the 1.15
NOISE_TOLERANCE follow bench_sf1 exactly.

Timing protocol (documented deviation from bench_sf1): per query per
SF one untimed warm run (absorbs process-lifetime index builds, as
production amortizes them), then ONE timed count() run at sf10 and
the min of two at sf0.1 — the sf10 side of the heavy tier runs
minutes per query, and a second timed rep would double a multi-hour
wall for a number the NOISE_TOLERANCE already absorbs.

Usage: python tools/bench_sf10.py [--json OUT.json]
"""

from __future__ import annotations

import json
import sys

# Keep the gate breadcrumb trail (.gate_trace.jsonl) for EXTERNAL
# driver runs only (must be set before __spark_entry__ import).
import os as _os_trace
_os_trace.environ.setdefault("SPARK_GRAFT_TRACE", "0")

import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_sf1 import (  # noqa: E402
    NOISE_TOLERANCE,
    OUTPUT_BOUND,
    QUADRATIC_WORK,
    SESQUI_WORK,
    SF01,
)

DATA_GROWTH_X = 100

#: The verdict's named top-10 heavies — one representative per heavy
#: family (near-dup LSH, span clustering, range ANN, composed IVF-PQ
#: serve + its recall gate, iterative graph, streaming-order packing,
#: multimodal near-dup, dense BM25, fused retrieval pipeline).
QUERIES = [
    "graph_pagerank_transitions",
    "pack_tokens_stream",
    "dedup_minhash_lsh",
    "dedup_snm_span_clusters",
    "multimodal_phash_neardup",
    "similarity_topk_ivfpq",
    "similarity_ivfpq_recall",
    "similarity_range_ivf",
    # index_bm25_TOPK, not _dense: the dense tier (|Q| = corpus/5 =
    # 100k queries at sf10) performs ~8.7e9 exact integer score
    # updates whose aggregate state spills ~260 GB on ONE node — it
    # filled this host's disk in the first probe run.  That is a
    # single-node disk bound, not a plan defect (a 100-executor
    # cluster holds ~2.6 GB/node of the same spill); the topk tier
    # measures the IDENTICAL plan at 10x lower query density, which
    # one node can hold.
    "index_bm25_topk",
    "retrieval_filtered_fused_mmr",
]


def main() -> None:
    out_path = None
    args = sys.argv[1:]
    if args and args[0] == "--json":
        out_path = args[1]
        args = args[2:]
    only = None
    if args and args[0] == "--only":
        only = set(args[1].split(","))
        args = args[2:]

    # 100x data in one local JVM needs a bigger heap than the 8g test
    # default (the first probe run OOM'd the driver inside
    # similarity_range_ivf's shuffle buffers); a cluster would scale
    # executor memory with the data the same way.  Overridable, and
    # recorded in the artifact.
    _os_trace.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from tools.make_sf1 import build

    sf10 = build(
        str(Path(__file__).resolve().parent.parent / ".scratch" / "sf10"),
        copies=100,
    )

    from spark_dns_spark.session import get_session, release_all_caches

    spark = get_session("bench_sf10")
    import __spark_entry__ as e

    qs = e.queries()
    results: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in QUERIES:
        if only is not None and name not in only:
            continue
        fn = qs[name]
        row: dict = {}
        try:
            for label, sf, reps in (("sf0.1", SF01, 2), ("sf10", sf10, 1)):
                fn(spark, sf).count()  # warm (index builds, code paths)
                release_all_caches(spark)
                times = []
                for _ in range(reps):
                    t0 = time.monotonic()
                    n = fn(spark, sf).count()
                    times.append(time.monotonic() - t0)
                    release_all_caches(spark)
                row[label] = round(min(times), 3)
                row[f"rows_{label}"] = n
        except Exception as exc:  # noqa: BLE001
            # one dead query must not zero out the probe (the first
            # run died whole on a heap OOM five queries in)
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# ERROR {name}: {errors[name]}", file=sys.stderr)
            release_all_caches(spark)
            continue
        row["ratio"] = round(row["sf10"] / max(row["sf0.1"], 1e-9), 2)
        row["work_growth_x"] = (
            DATA_GROWTH_X**2 if name in QUADRATIC_WORK
            else 1000 if name in SESQUI_WORK
            else DATA_GROWTH_X
        )
        row["output_growth_x"] = round(
            row["rows_sf10"] / max(row["rows_sf0.1"], 1), 2
        )
        row["bound_x"] = round(
            (
                max(row["work_growth_x"], row["output_growth_x"])
                if name in OUTPUT_BOUND
                else row["work_growth_x"]
            )
            * NOISE_TOLERANCE,
            2,
        )
        row["in_bounds"] = row["ratio"] <= row["bound_x"]
        if name in OUTPUT_BOUND:
            row["rows_per_sec_sf0.1"] = round(
                row["rows_sf0.1"] / max(row["sf0.1"], 1e-9)
            )
            row["rows_per_sec_sf10"] = round(
                row["rows_sf10"] / max(row["sf10"], 1e-9)
            )
        results[name] = row
        print(
            f"# {name}: sf0.1 {row['sf0.1']}s -> sf10 {row['sf10']}s "
            f"(x{row['ratio']} on x{row['work_growth_x']} work, "
            f"rows {row['rows_sf0.1']} -> {row['rows_sf10']})",
            file=sys.stderr,
            flush=True,
        )

    doc = {
        "metric": "sf10_scaling",
        "data_growth_x": DATA_GROWTH_X,
        "queries": results,
        "max_ratio_linear_work": max(
            (
                r["ratio"]
                for n, r in results.items()
                if n not in QUADRATIC_WORK and n not in SESQUI_WORK
            ),
            default=None,
        ),
        "max_ratio_quadratic_work": max(
            (r["ratio"] for n, r in results.items() if n in QUADRATIC_WORK),
            default=None,
        ),
        "max_ratio_sesqui_work": max(
            (r["ratio"] for n, r in results.items() if n in SESQUI_WORK),
            default=None,
        ),
        "breaches": sorted(
            n for n, r in results.items() if not r["in_bounds"]
        ),
        "errors": errors,
        "driver_mem": _os_trace.environ.get("SPARK_GRAFT_DRIVER_MEM"),
        "sf10_dir": sf10,
        "note": (
            "ratios are weak scaling on FIXED local[32] hardware over "
            "100x data growth: <= work_growth_x is sublinear. sf10 side "
            "is a single timed rep after an untimed warm (documented "
            "protocol deviation; NOISE_TOLERANCE covers rep noise). "
            "Compare ABSOLUTE sf10 seconds across rounds, not ratios."
        ),
    }
    print(json.dumps(doc))
    if out_path:
        Path(out_path).write_text(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
