#!/usr/bin/env python3
"""Build BENCH_SCALING.md from three Bench sweep outputs (NOT shipped code).

Usage: python3 tools/scaling_report.py /tmp/bench_sweep_0.001.json \
    /tmp/bench_sweep_0.01.json /tmp/bench_sweep_0.1.json > BENCH_SCALING.md

The interesting number per query family is the sf0.01 -> sf0.1 wall-clock
ratio against the 10x data ratio: ~1x means the cost is dominated by fixed
per-query overhead (scheduling, stream engine floors), ~10x means linear in
data, >>10x means a super-linear shuffle/sort hiding in the plan.
"""
import json
import sys

FAMILIES = {
    "scan": ["q_scan_project_filter", "q_pred_pushdown_scan"],
    "join": ["q_join_inner_hash", "q_join_broadcast", "q_join_multiway",
             "q_join_left_outer", "q_join_full_outer", "q_join_semi",
             "q_join_anti", "q_join_salted", "q_join_bucketed",
             "q_join_theta_range", "q_join_asof"],
    "agg": ["q_agg_hash", "q_agg_distinct", "q_agg_salted", "q_agg_minmax",
            "q_agg_median", "q_agg_variance", "q_agg_argmax",
            "q_agg_approx_distinct", "q_agg_approx_quantile",
            "q_agg_hll_merge", "q_heavy_hitters"],
    "grouping": ["q_rollup", "q_cube", "q_grouping_sets", "q_having",
                 "q_pivot", "q_pivot_dynamic", "q_unpivot", "q_listagg"],
    "window": ["q_window_rank", "q_window_running", "q_window_lag",
               "q_window_ntile", "q_window_first_last", "q_window_range",
               "q_window_pct"],
    "topk/setop": ["q_sort_limit_topk", "q_topk_per_group", "q_lateral_topn",
                   "q_scalar_subquery", "q_union", "q_except", "q_intersect"],
    "functions": ["q_string_funcs", "q_date_funcs", "q_math_funcs",
                  "q_regex_funcs", "q_map_funcs", "q_struct_funcs",
                  "q_conditional_funcs", "q_bitwise_funcs", "q_try_funcs",
                  "q_json_extract", "q_array_funcs", "q_date_arith"],
    "analytics": ["q_funnel_conversion", "q_retention_cohort", "q_sessionize",
                  "q_scd_intervals", "q_event_paths", "q_stats_corr",
                  "q_histogram", "q_anomaly_zscore", "q_incremental_agg",
                  "q_generator_gapfill", "q_sample_hash",
                  "q_sample_stratified"],
    "graph": ["q_graph_pagerank"],
    "cdc/etl": ["q_cdc_apply", "q_cdc_apply_scale", "q_envelope_json",
                "q_table_stats"],
    "stream-shape": ["q_stream_tumbling", "q_stream_sliding",
                     "q_stream_session"],
    "stream-engine": ["q_stream_stateful", "q_stream_join", "q_stream_dedup"],
    "dedup": ["q_dedup_exact", "q_dedup_fuzzy", "q_dedup_minhash_lsh",
              "q_dedup_ngram_jaccard", "q_dedup_simhash", "q_dedup_embedding",
              "q_dedup_clusters", "q_cluster_canonical"],
    "similarity": ["q_similarity_topk", "q_similarity_ann_lsh",
                   "q_similarity_ann_ivf", "q_similarity_filtered"],
    "text": ["q_text_analysis", "q_text_langid", "q_text_quality",
             "q_text_ngrams", "q_token_count", "q_text_tfidf",
             "q_text_redact", "q_doc_fingerprint", "q_doc_chunks",
             "q_pack_batches"],
    "multimodal": ["q_multimodal_pipeline", "q_multimodal_features"],
}


def main():
    runs = []
    for p in sys.argv[1:4]:
        with open(p) as f:
            runs.append(json.load(f))
    sfs = [r["sf"].rsplit("sf", 1)[-1] for r in runs]
    qs = [r["queries"] for r in runs]
    print("# BENCH_SCALING — wall-clock vs scale factor")
    print()
    print(f"Bench (median of 3, local[32], 8g heap) at sf = {', '.join(sfs)}.")
    print("`x(01->1)` is the sf0.01->sf0.1 time ratio against 10x the data:")
    print("~1x = fixed per-query overhead dominates (floor), ~10x = linear")
    print("in data, >>10x = a super-linear shuffle/sort would bite at 100 TB.")
    print()
    print("| family | n | " + " | ".join(f"sf{s} (s)" for s in sfs) +
          " | x(01->1) |")
    print("|---|---|" + "---|" * (len(sfs) + 1))
    famtot = {}
    for fam, names in FAMILIES.items():
        present = [n for n in names if all(n in q for q in qs)]
        if not present:
            continue
        tots = [sum(q[n] for n in present) for q in qs]
        ratio = tots[2] / tots[1] if tots[1] > 0 else float("nan")
        famtot[fam] = (len(present), tots, ratio)
        print(f"| {fam} | {len(present)} | " +
              " | ".join(f"{t:.2f}" for t in tots) + f" | {ratio:.1f}x |")
    alltots = [sum(q.values()) for q in qs]
    print(f"| **total** | {sum(v[0] for v in famtot.values())} | " +
          " | ".join(f"{t:.2f}" for t in alltots) +
          f" | {alltots[2] / alltots[1]:.1f}x |")
    print()
    print("Per-query outliers (x(01->1) > 6x, i.e. approaching data-linear or worse):")
    print()
    print("| query | " + " | ".join(f"sf{s}" for s in sfs) + " | x(01->1) |")
    print("|---|" + "---|" * (len(sfs) + 1))
    for n in sorted(qs[0], key=lambda n: -(qs[2][n] / max(qs[1][n], 1e-9))):
        r = qs[2][n] / max(qs[1][n], 1e-9)
        if r > 6:
            print(f"| {n} | " + " | ".join(f"{q[n]:.2f}" for q in qs) +
                  f" | {r:.1f}x |")


if __name__ == "__main__":
    main()
