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

# Keep the gate breadcrumb trail (.gate_trace.jsonl) for EXTERNAL
# driver runs only (must be set before __spark_entry__ import).
import os as _os_trace
_os_trace.environ.setdefault("SPARK_GRAFT_TRACE", "0")

import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF01 = "/root/testdata/sf0.1"

#: the top slowest heavy-tier queries (r7 bench detail + VERDICT's
#: plan-audit list), spanning every tier the sf1 gate covers; the
#: r8/r9 additions (PQ, composed IVF-PQ, incremental paths, BM25
#: density tiers, bigram LM) joined in r9 — VERDICT r8 item 4: the
#: 100x-scale claim for new flagship operators must be measured.
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
    # r9 additions
    "similarity_pq_codes",
    "similarity_pq_adc_recall",
    "similarity_topk_ivfpq",
    "similarity_ivf_upsert",
    "similarity_pq_upsert",
    "dedup_minhash_incremental",
    "index_bm25_topk",
    "index_bm25_dense",
    "quality_lm_bigram_score",
    # r9 continuation-2 additions (corpus-scaling; the TPC-H pack II is
    # NOT here — make_sf1 scales documents/embeddings/events only)
    "curation_boilerplate_fraction",
    "sketch_countmin_freq",
    "contamination_bloom_filter",
    "dedup_url_canonical",
    "curation_boilerplate_clean",
    "text_langid_confusion",
    "multimodal_phash_neardup",
    # r10 additions: the range pair (VERDICT r9 items 2+3 — the exact
    # queries whose density-coupled cost most needed the 10x
    # measurement), the cell-balance metric that makes the KC retune
    # measurable, and the TPC-H pack-II join tier (make_sf1 grows the
    # TPC-H fact web FK-consistently since r10)
    "similarity_range_ivf",
    "similarity_range_recall",
    "similarity_ivf_cell_balance",
    "similarity_topk_filtered",
    "similarity_ivf_cell_split",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    # r11 additions: the last TPC-H shapes (derived shipping columns /
    # partsupp, q_tpch2 header note) — Q21's per-order sole-late-supplier
    # agg is the shape whose scaling most needs evidence
    "tpch_q12_shipmode_priority",
    "tpch_q16_supplier_part_counts",
    "tpch_q21_waiting_suppliers",
    "similarity_ivf_cell_split_fixpoint",
    "similarity_ivf_upsert_rebalance",
    "similarity_topk_filtered_rare",
    "similarity_filtered_rare_recall",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit",
    "similarity_hybrid_rrf",
    "retrieval_mmr_rerank",
    "dedup_cluster_label_propagation",
    # r12 additions: the filtered IVF-PQ pair, the upserted-index
    # serve-freshness proof, the fused filtered RAG pipeline, and the
    # SemDeDup semantic-dedup family
    "similarity_topk_filtered_ivfpq",
    "similarity_filtered_ivfpq_recall",
    "similarity_upsert_serve_fresh",
    "retrieval_filtered_fused_mmr",
    "dedup_semantic_semdedup",
    "dedup_semantic_incremental",
    "similarity_ivf_delete_serve",
]

#: the full heavy-tier ORACLE list for the sf1 cross-engine gate
#: (make sf1-oracle -> ORACLE_SF1_r{N}.json): the r8 41-query list +
#: the r8/r9 additions that were missing from it (VERDICT r8 item 4).
ORACLE_QUERIES = [
    "batching_length_grouped", "contamination_ngram_overlap",
    "dedup_cluster_assign", "dedup_cluster_pointer_doubling",
    "dedup_cluster_representatives", "dedup_cluster_star_contraction",
    "dedup_embedding_cosine", "dedup_exact_documents",
    "dedup_exact_substring", "dedup_incremental_batch",
    "dedup_minhash_incremental", "dedup_minhash_lsh",
    "dedup_minhash_signatures", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_snm_span_clusters", "dedup_sorted_neighborhood",
    "dedup_substring_clean", "embedding_quantize_int8",
    "graph_clustering_coefficient", "graph_pagerank_transitions",
    "graph_triangle_count", "kmeans_lloyd_cells",
    "linkage_field_scores", "mlprep_leakage_free_split",
    "mlprep_split_leakage_audit", "multimodal_binary_dedup",
    "pack_greedy_bins", "pack_tokens_stream", "pipeline_curate_corpus",
    "sessions_peak_concurrency", "similarity_ivf_build",
    "similarity_ivf_recall", "similarity_lsh_recall",
    "similarity_topk_bruteforce", "similarity_topk_ivf",
    "similarity_topk_lsh", "text_fingerprint", "vocab_bpe_apply",
    "vocab_bpe_fertility", "vocab_bpe_merges",
    # r8/r9 additions
    "similarity_pq_codes", "similarity_pq_adc_recall",
    "similarity_topk_ivfpq", "similarity_ivf_upsert",
    "index_bm25_topk", "index_bm25_dense", "quality_lm_bigram_score",
    "similarity_ivfpq_recall", "similarity_pq_upsert",
    "similarity_pq_drift", "similarity_pq_upsert_stream",
    "index_postings_upsert", "dedup_minhash_stream",
    "curation_boilerplate_fraction", "sketch_countmin_freq",
    "contamination_bloom_filter", "dedup_url_canonical",
    "curation_boilerplate_clean", "text_langid_confusion",
    "multimodal_phash_neardup",
    # r10 additions (VERDICT r9 items 3+5+6)
    "similarity_range_ivf", "similarity_range_recall",
    "similarity_ivf_cell_balance", "sketch_countmin_stream",
    "tpch_q5_local_supplier_volume", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q10_returned_items",
    "tpch_q14_promo_revenue", "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_revenue", "tpch_q12_shipmode_priority",
    "tpch_q16_supplier_part_counts", "tpch_q21_waiting_suppliers",
    "similarity_topk_filtered", "similarity_filtered_recall",
    "similarity_ivf_cell_split",
    # r11 additions
    "similarity_ivf_cell_split_fixpoint", "similarity_ivf_upsert_rebalance",
    "similarity_topk_filtered_rare", "similarity_filtered_rare_recall",
    "tpch_q2_min_cost_supplier", "tpch_q9_product_type_profit",
    "tpch_q11_important_stock", "tpch_q20_potential_promotion",
    "similarity_hybrid_rrf", "retrieval_mmr_rerank",
    "dedup_cluster_label_propagation",
    # r12 additions
    "similarity_topk_filtered_ivfpq", "similarity_filtered_ivfpq_recall",
    "similarity_upsert_serve_fresh", "retrieval_filtered_fused_mmr",
    "dedup_semantic_semdedup", "dedup_semantic_incremental",
    "similarity_ivf_delete_serve", "dedup_semantic_stream",
]


#: Queries whose WORK grows ~100x when the data grows 10x: their query
#: set is drawn from the corpus (|Q| grows 10x) and their cost is
#: |Q| x candidates (brute-force ground truth inside recall metrics;
#: the BM25 probe joins every query term against the postings).  Their
#: wall-clock ratio is judged against 100x work, not 10x data — the
#: artifact records both so a 30x ratio on 100x work reads as the
#: sublinear result it is instead of a scaling failure.
QUADRATIC_WORK = {
    "similarity_pq_adc_recall",
    "similarity_topk_ivfpq",
    "index_bm25_topk",
    "index_bm25_dense",
    "similarity_ivfpq_recall",
    # every vector is a query AND the QMOD ground-truth sample grows
    # 10x against a 10x corpus
    "similarity_range_recall",
    # 10x queries x 10x same-label brute ground truth
    "similarity_filtered_recall",
    # 10x queries x growing per-query probe scan (widened probes x
    # sqrt-sized cells)
    "similarity_topk_filtered",
    # the rare-label pair: same query/probe growth shape as the base
    # filtered pair
    "similarity_topk_filtered_rare",
    "similarity_filtered_rare_recall",
    # fuses two QMOD-sampled serves — inherits their growth class
    "similarity_hybrid_rrf",
    # shortlist post-processing on a QMOD-sampled serve — same class
    "retrieval_mmr_rerank",
    # r12: compose the filtered-serve and ADC classes (both quadratic)
    "similarity_topk_filtered_ivfpq",
    "similarity_filtered_ivfpq_recall",
    # r12: filtered fused pipeline — inherits its two retrievers' class
    "retrieval_filtered_fused_mmr",
}

#: Queries whose work grows ~n^1.5 (x~32 at 10x data): the all-pairs
#: range serve under the corpus-scaled IVF geometry — candidates per
#: vector ~ nprobe x cell size ~ sqrt(n) log n (VERDICT r9 item 2's
#: done-criterion: candidate growth tamed from quadratic).
SESQUI_WORK = {
    "similarity_range_ivf",
    # r12: QMOD queries x10 against per-query probe work ~ sqrt(n) log n
    "similarity_upsert_serve_fresh",
    # r12: within-cell pair prune — KC x cell^2 ~ n^1.5 pair work
    "dedup_semantic_semdedup",
    # r12: delta x within-cell base members — same n^1.5 class
    "dedup_semantic_incremental",
    # r12: a QMOD-sampled serve over pruned postings — the base IVF
    # serve class (queries x10, per-query probe ~ sqrt(n) log n)
    "similarity_ivf_delete_serve",
}

#: Queries allowed to claim the OUTPUT-growth bound (ADVICE r11: the
#: bound used to apply to every query, so any entry whose output grew
#: faster than its input could never breach — masking real
#: regressions).  Only pair-emitting shapes belong here: their output
#: is quadratic in duplicate-cluster size, so at a growing SF the
#: result set legitimately outgrows the input and time ~ output.
#: Everything else is judged purely on its designed work growth, and
#: these entries still carry a falsifiable rows/sec throughput check
#: in the artifact.
OUTPUT_BOUND = {
    "multimodal_phash_neardup",  # phash-band near-dup pairs
    "dedup_snm_span_clusters",  # span-cluster pair emission
    "similarity_range_ivf",  # radius pairs (also sesqui work)
}

#: Multiplicative noise headroom applied to every bound (VERDICT r13
#: item 6) — see the bound computation for the r13 episode that
#: motivated it.
NOISE_TOLERANCE = 1.15


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
        row["work_growth_x"] = (
            100 if name in QUADRATIC_WORK
            else 32 if name in SESQUI_WORK
            else 10
        )
        # Output-aware bound (VERDICT r10 item 2): a pair-emitting query
        # (near-dup joins) legitimately spends time proportional to its
        # OUTPUT when that grows faster than the input — e.g. phash
        # pairs grew 261x on 10x data in r10 because identical binary
        # payloads recur across copies.  Only the OUTPUT_BOUND allowlist
        # may claim that bound (ADVICE r11: applied unconditionally it
        # made output-growing queries unbreachable); those entries also
        # record rows/sec at both SFs as a falsifiable throughput check.
        row["output_growth_x"] = round(
            row["rows_sf1"] / max(row["rows_sf0.1"], 1), 2
        )
        # NOISE_TOLERANCE (VERDICT r13 item 6): r13's
        # curation_boilerplate_fraction first sampled 10.06x against a
        # bare 10x bound — storage-pool noise on the min-of-2 protocol
        # — and needed a disclosed re-run.  A bound with zero headroom
        # measures the host, not the design; 1.15 stays far below the
        # 2x that could mask a real super-linear regression.
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
            row["rows_per_sec_sf1"] = round(
                row["rows_sf1"] / max(row["sf1"], 1e-9)
            )
        results[name] = row
        print(
            f"# {name}: sf0.1 {row['sf0.1']}s -> sf1 {row['sf1']}s "
            f"(x{row['ratio']} on x{row['work_growth_x']} work, "
            f"rows {row['rows_sf0.1']} -> {row['rows_sf1']})",
            file=sys.stderr,
        )

    doc = {
        "metric": "sf1_scaling",
        "data_growth_x": 10,
        "queries": results,
        "max_ratio_linear_work": max(
            r["ratio"]
            for n, r in results.items()
            if n not in QUADRATIC_WORK and n not in SESQUI_WORK
        ),
        "max_ratio_quadratic_work": max(
            (r["ratio"] for n, r in results.items() if n in QUADRATIC_WORK),
            default=None,
        ),
        # every work class gets a headline bound (ADVICE r10: sesqui
        # queries previously escaped all summary statistics)
        "max_ratio_sesqui_work": max(
            (r["ratio"] for n, r in results.items() if n in SESQUI_WORK),
            default=None,
        ),
        "breaches": sorted(
            n for n, r in results.items() if not r["in_bounds"]
        ),
        "sf1_dir": sf1,
        "note": (
            "ratios are weak scaling on FIXED local[32] hardware: "
            "<= work_growth_x is sublinear; overhead-bound queries sit "
            "near 1x while compute-bound ones approach the work growth. "
            "Compare ABSOLUTE sf1 seconds across rounds, not ratios — "
            "optimizing the sf0.1 side inflates the ratio of an "
            "unchanged-or-faster sf1 run."
        ),
    }
    print(json.dumps(doc))
    if out_path:
        Path(out_path).write_text(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
