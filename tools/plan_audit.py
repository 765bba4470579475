"""Physical-plan audit for every catalog query — the scale checklist as
a report: join strategies, nested-loop red flags, pushdown reaching the
scans, and exchange counts.

Since r11 (VERDICT r10 item 5) the audit also REGRESSION-checks against
a committed baseline: ``PLAN_BASELINE.json`` stores each query's
{join strategy counts, exchanges, scans-with-pushdown}; a silent new
Exchange, a lost broadcast, or a new nested loop vs baseline fails the
run even when it passes the static anti-pattern checks.  A DELIBERATE
plan change regenerates the baseline in the same commit:

Usage:  python tools/plan_audit.py [sf_dir] [query ...]
        python tools/plan_audit.py --write-baseline   # regenerate
"""

from __future__ import annotations

import json
import re
import sys

# Keep the gate breadcrumb trail (.gate_trace.jsonl) for EXTERNAL
# driver runs only (must be set before __spark_entry__ import).
import os as _os_trace
_os_trace.environ.setdefault("SPARK_GRAFT_TRACE", "0")

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASELINE_PATH = Path(__file__).resolve().parent.parent / "PLAN_BASELINE.json"

#: Queries that run real streaming jobs when built — skip planning them.
SKIP = {
    "dns_stream_sink_roundtrip",
    "sessionize_stream_stateful",
    "stream_dedup_replay",
    "stream_attribution_join",
    "similarity_pq_upsert_stream",
    "dedup_minhash_stream",
    "sketch_countmin_stream",
    "dedup_semantic_stream",
}

#: Documented deliberate small-broadcast nested loops.
BNLJ_OK = {
    "similarity_topk_bruteforce",
    # recall metric embeds the brute-force ground truth as a subplan
    "similarity_lsh_recall",
    "similarity_topk_ivf",
    "similarity_ivf_recall",
    # Q-row query set broadcast onto the corpus + the recon table for
    # the exact ground truth and the ADC scan — the same class
    "similarity_pq_adc_recall",
    # embeds the brute-force ground truth as a subplan (like the other
    # recall metrics)
    "similarity_ivfpq_recall",
    "similarity_range_recall",
    "dns_typosquat_levenshtein",
    # 1-row scalar aggregates (w_total, n_max) cross-joined onto a
    # 20-row dim — broadcast of single-row relations, the right plan
    "domain_mix_rebalance",
    # 1-row corpus count (N for idf) cross-joined onto the vocab-sized
    # doc-frequency dim — same single-row-broadcast class
    "tfidf_top_terms",
    # 1-row corpus stats (n_docs, avgdl) cross-joined onto the
    # (doc, term) tf relation — same single-row-broadcast class
    "index_bm25_topk",
    "index_bm25_dense",
    # 1-row stream total cross-joined onto the candidate-count dim
    "heavy_hitters_events",
    # two 1-row conditional-aggregate relations joined for the
    # referential-integrity constraint row
    "validate_quality_constraints",
    # 1-row order total cross-joined onto the pair-support dim
    "basket_copurchase_lift",
    # 1-row cross-split leak count cross-joined onto the 3-row split
    # sizes dim — same single-row-broadcast class
    "mlprep_split_leakage_audit",
    # two 1-row relations (grand total tw, leftover seats) broadcast
    # onto the source-sized dim — same single-row-broadcast class
    "mix_token_budget_apportion",
    # two 1-row relations (global min/max/count, the median row)
    # broadcast onto the KC-row size histogram — same
    # single-row-broadcast class (everything past the postings scan
    # is model-scale)
    "similarity_ivf_cell_balance",
    # same class: the upsert-rebalance balance summary cross-joins two
    # 1-row relations (global stats, median) onto the KC-row histogram
    "similarity_ivf_upsert_rebalance",
    # 1-row global inventory total cross-joined onto the per-part value
    # relation for the integer HAVING threshold — same class
    "tpch_q11_important_stock",
}


def plan_stats(plan: str) -> dict[str, int]:
    """The plan-shape signature the baseline pins."""
    return {
        "BHJ": plan.count("BroadcastHashJoin"),
        "SMJ": plan.count("SortMergeJoin"),
        "SHJ": plan.count("ShuffledHashJoin"),
        "BNLJ": plan.count("BroadcastNestedLoopJoin"),
        "CART": plan.count("CartesianProduct"),
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        "pushdown": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
    }


def audit(name: str, plan: str) -> tuple[str, str]:
    """Return (verdict, detail) for one executed plan (static checks)."""
    s = plan_stats(plan)
    joins = {k: s[k] for k in ("BHJ", "SMJ", "SHJ", "BNLJ", "CART")}
    detail = (
        ", ".join(f"{k}={v}" for k, v in joins.items() if v)
        or "no joins"
    )
    detail += f"; exchanges={s['exchanges']}; scans-with-pushdown={s['pushdown']}"
    bad = (joins["BNLJ"] or joins["CART"]) and name not in BNLJ_OK
    return ("FLAG" if bad else "ok  "), detail


def drift(name: str, cur: dict, base: dict | None) -> list[str]:
    """Regressions of ``cur`` vs the baseline signature (empty = none).

    Flags only CHANGES FOR THE WORSE — a new Exchange, a lost
    broadcast (BHJ down / SMJ up), any new nested loop or cartesian,
    or a scan losing its pushdown; improvements are reported by the
    caller as a reminder to refresh the baseline, never as failures.
    """
    if base is None:
        return [f"not in baseline (new query? run --write-baseline)"]
    out = []
    if cur["exchanges"] > base["exchanges"]:
        out.append(f"exchanges {base['exchanges']} -> {cur['exchanges']}")
    if cur["BNLJ"] > base["BNLJ"]:
        out.append(f"BNLJ {base['BNLJ']} -> {cur['BNLJ']}")
    if cur["CART"] > base["CART"]:
        out.append(f"CART {base['CART']} -> {cur['CART']}")
    if cur["BHJ"] < base["BHJ"]:
        out.append(f"lost broadcast: BHJ {base['BHJ']} -> {cur['BHJ']}")
    if cur["SMJ"] > base["SMJ"]:
        out.append(f"SMJ {base['SMJ']} -> {cur['SMJ']}")
    if cur["pushdown"] < base["pushdown"]:
        out.append(f"pushdown {base['pushdown']} -> {cur['pushdown']}")
    return out


def main() -> int:
    import __spark_entry__ as entrymod
    from spark_dns_spark.session import get_session

    args = sys.argv[1:]
    write_baseline = "--write-baseline" in args
    if write_baseline:
        args.remove("--write-baseline")
    sf_dir = args[0] if args and Path(args[0]).is_dir() else "/root/testdata/sf0.01"
    only = args[1:] if args and Path(args[0]).is_dir() else args

    baseline: dict = {}
    if BASELINE_PATH.exists() and not write_baseline:
        baseline = json.loads(BASELINE_PATH.read_text())

    spark = get_session("plan-audit")
    qs = entrymod.queries()
    flagged, drifted, improved = [], [], []
    stats_all: dict[str, dict] = {}
    for name in only or sorted(qs):
        if name in SKIP:
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - report and continue
            print(f"ERR  {name}: {e}")
            flagged.append(name)
            continue
        verdict, detail = audit(name, plan)
        if verdict == "FLAG":
            flagged.append(name)
        cur = plan_stats(plan)
        stats_all[name] = cur
        note = ""
        if baseline:
            regressions = drift(name, cur, baseline.get(name))
            if regressions:
                drifted.append(name)
                verdict, note = "DRIFT", " | " + "; ".join(regressions)
            elif cur != baseline.get(name):
                improved.append(name)
                note = " | improved vs baseline (refresh when deliberate)"
        print(f"{verdict} {name}: {detail}{note}")

    if write_baseline:
        if only:
            # partial regen: merge into the existing baseline
            merged = (
                json.loads(BASELINE_PATH.read_text())
                if BASELINE_PATH.exists()
                else {}
            )
            merged.update(stats_all)
            stats_all = merged
        BASELINE_PATH.write_text(
            json.dumps(dict(sorted(stats_all.items())), indent=1) + "\n"
        )
        print(f"\nwrote {BASELINE_PATH.name} ({len(stats_all)} plans)")

    print(f"\n{len(flagged)} flagged" + (f": {' '.join(flagged)}" if flagged else ""))
    if baseline:
        print(f"{len(drifted)} drifted" + (f": {' '.join(drifted)}" if drifted else ""))
        if improved:
            print(f"{len(improved)} improved vs baseline: {' '.join(improved)}")
    return 1 if (flagged or drifted) else 0


if __name__ == "__main__":
    sys.exit(main())
