"""Plan-shape contract: the scale properties the engine promises are
asserted on the PHYSICAL plans, not just documented.

- no BroadcastNestedLoopJoin / CartesianProduct anywhere except the two
  whitelisted deliberate small-broadcast cases;
- predicate pushdown reaches the parquet scan (PushedFilters);
- dimension joins are broadcast, fact side shuffles at most once.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

#: Deliberate nested-loop plans: the brute-force exact baseline (query
#: side broadcast), the IVF centroid assignment (ncells-row broadcast),
#: and the typosquat detector (all-pairs over the tiny DISTINCT-zone
#: set — zones, not rows; documented at the query).
BNLJ_WHITELIST = {
    "similarity_topk_bruteforce",
    # recall metrics embed the brute-force ground truth as a subplan
    "similarity_lsh_recall",
    "similarity_ivf_recall",
    # Q-row query set broadcast onto the corpus + the recon table for
    # the exact ground truth and the ADC scan — the same class
    "similarity_pq_adc_recall",
    "similarity_ivfpq_recall",
    "similarity_range_recall",
    "similarity_topk_ivf",
    "dns_typosquat_levenshtein",
    # 1-row scalar aggregates (w_total, n_max) cross-joined back onto a
    # 20-row dim — a broadcast of single-row relations, the right plan
    "domain_mix_rebalance",
    # 1-row corpus count (N for idf) cross-joined onto the vocab-sized
    # doc-frequency dim — same single-row-broadcast class
    "tfidf_top_terms",
    # 1-row corpus stats (n_docs, avgdl) cross-joined onto the
    # (doc, term) tf relation — same single-row-broadcast class
    "index_bm25_topk",
    "index_bm25_dense",
    # 1-row stream total cross-joined onto the candidate-count dim for
    # the freq > n/T filter — same single-row-broadcast class
    "heavy_hitters_events",
    # two 1-row conditional-aggregate relations joined to emit the
    # referential-integrity constraint row — same class
    "validate_quality_constraints",
    # 1-row order total cross-joined onto the pair-support dim for the
    # integer lift — same single-row-broadcast class
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

#: Queries that run their own streaming jobs — planned separately.
SKIP = {
    "dns_stream_sink_roundtrip",
    "sessionize_stream_stateful",
    "stream_dedup_replay",
    "stream_attribution_join",
    "similarity_pq_upsert_stream",
    "dedup_minhash_stream",
    "sketch_countmin_stream",
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _catalog():
    import __spark_entry__ as e

    return e.queries()


@pytest.mark.parametrize(
    "name", sorted(set(_catalog()) - SKIP)
)
def test_no_accidental_nested_loops(name, spark, sf_dir):
    plan = _plan(_catalog()[name](spark, sf_dir))
    if name in BNLJ_WHITELIST:
        return  # documented deliberate small-broadcast nested loop
    assert "BroadcastNestedLoopJoin" not in plan, f"{name} plans a BNLJ"
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    from spark_dns_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 30
    ).select("l_orderkey", "l_quantity")
    plan = _plan(li)
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan
    # column pruning: the scan must not read all 16 lineitem columns
    assert "l_comment" not in plan


def test_dimension_joins_are_broadcast(spark, sf_dir):
    plan = _plan(_catalog()["revenue_by_nation"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, "dims must broadcast"
    # the fact table must not be on a broadcast side: no broadcast of
    # lineitem-sized relations (heuristic: BroadcastExchange count ==
    # number of dimension tables in the plan)
    assert plan.count("BroadcastExchange") >= 2
