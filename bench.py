"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a noop write (full plan execution, no driver
collect bottleneck, no result materialization cost).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from padua_spark.session import get_spark

HEADLINE = [
    "volcano_stats",
    "ttest_ind_stats",
    "anova_1way_stats",
    "volcano_pvalues",
    "median_normalize",
    "min_valid_in_any_group",
    "qvalues_bh",
    "pairwise_correlation",
    "impute_gaussian",
    "unpivot_long",
    "dim_join_rollup",
    "ngram_jaccard",
    "minhash_lsh_candidates",
    "ann_cosine_topk",
    "token_quality",
    "event_window_agg",
    "sessionize",
    "multimodal_features",
    "language_id",
    "simhash_candidates",
    "embedding_near_dup",
    "asof_join",
    "range_join",
    "time_rollup",
    "cube_aggregate",
    "ivf_topk",
    "bpe_token_count",
    "contamination_check",
    "dedup_clusters",
    "knn_join",
    "token_frequencies",
    "chunk_documents",
    "pii_scrub",
    "tfidf_top_terms",
    "bigram_lm_score",
    "weighted_sample",
    "winsorize",
    "kmv_distinct_tokens",
    "novel_documents",
    "kmv_overlap",
    "quantile_normalize",
    "token_frequencies_by_group",
    "quantize_embeddings",
    "quantized_topk",
    "funnel",
    "retention_cohorts",
    "decayed_score",
    "gopher_quality",
    "quality_classifier",
    "random_projection",
    "shipping_priority",
    "local_supplier_volume",
    "rollup_revenue",
    "running_balance",
    "event_lag_gaps",
    "above_avg_orders",
    "sliding_window_agg",
    "semdedup",
    "json_props_agg",
    "pricing_summary",
    "revenue_delta",
    "grouping_sets_mix",
    "upsert_segments",
    "order_percentiles",
    "priority_customers",
    "dormant_customers",
    "salted_event_stats",
    "time_to_conversion",
    "event_transitions",
    "rolling_user_mean",
    "order_value_rank_pct",
    "view_purchase_pairs",
    "referential_audit",
    "null_profile",
    "source_token_divergence",
    "ks_test_stats",
    "mannwhitney_u",
    "chi2_independence",
    "event_calendar_profile",
    "monthly_revenue_growth",
    "anova_pvalues",
    "ttest_1samp_pvalues",
    "ks_test_pvalues",
    "mannwhitney_z",
    "qvalues_storey",
    "enrichment_hypergeom",
    "pca_scores",
    "pls_scores_pc1",
    "cms_heavy_hitters",
    "dedup_spans",
    "psi_value_drift",
    "char_entropy",
    "robust_zscore",
    "trimmed_mean",
    "windowed_psi",
    "windowed_token_divergence",
    "windowed_confusion",
    "jarque_bera",
    "dagostino_k2",
    "durbin_watson",
    "runs_test",
    "sign_test",
    "sign_test_normal",
    "ordinal_association",
    "clustering_coefficient",
    "assortativity",
    "gains_table",
    "brier_decomposition",
    "kfold_assign",
    "acf_pacf",
    "granger_causality",
    "textrank_keywords",
    "cuzick_trend",
    "tost_equivalence",
    "process_capability",
    "grubbs_test",
    "benford_test",
    "hhi_concentration",
    "lilliefors_normal",
    "boxcox_lambda",
    "jackknife_ratio",
    "smd_balance",
    "ratio_delta_ci",
    "weighted_kappa",
    "bland_altman",
    "icc_2_1",
    "bowker_symmetry",
    "morans_i",
    "inequality_indices",
    "cronbachs_alpha",
    "stuart_maxwell",
    "script_profile",
    "mojibake_score",
    "rbo_rankings",
    "ece_calibration",
    "temperature_scaling",
    "windowed_ece",
    "windowed_binned_auc",
    "windowed_average_precision",
    "windowed_gains_table",
    "snht_test",
    "buishand_range",
    "turning_points_test",
    "bartels_rank_test",
    "variance_ratio_test",
    "records_test",
    "iv_wald",
    "sobel_mediation",
    "rdd_sharp",
    "goldfeld_quandt",
    "lexical_constants",
    "richness_estimators",
    "srm_check",
    "winsorized_correlation",
    "edge_reciprocity",
    "degree_powerlaw",
    "ams_f2_sketch",
    "windowed_srm",
    "retrieval_mrr",
    "davies_bouldin",
    "periodogram",
    "hurst_rs",
    "haar_energy",
    "kuiper_2samp",
    "bloom_membership",
    "mde_two_mean",
    "windowed_binned_gini",
    "windowed_embedding_drift",
    "overdispersion_test",
    "ccf_lags",
    "engle_granger",
    "breusch_pagan",
    "chow_test",
    "cooks_distance",
    "mahalanobis_outliers",
    "huber_regression",
    "url_profile",
    "negbin_fit",
    "mde_two_proportion",
    "holm_adjust",
    "delong_test",
    "ipw_ate",
    "diff_in_diff",
    "randomization_test_mean",
    "bayes_ab_beta",
    "bayes_ab_normal",
    "eb_rate_shrinkage",
    "chapman_estimate",
    "data_profile",
    "json_profile",
    "spiegelhalter_z",
    "hosmer_lemeshow",
    "hotelling_t2",
    "graph_modularity",
    "rake_keywords",
    "code_prose_profile",
    "ngram_novelty",
    "hodges_lehmann_shift",
    "hodges_lehmann_pseudomedian",
    "personalized_pagerank",
    "windowed_quality_screen",
    "croston_forecast",
    "abc_analysis",
    "two_proportion_effects",
    "propensity_strata_att",
    "rolling_correlation",
    "decomposition_strength",
    "calinski_harabasz",
    "silhouette_simplified",
    "binned_divergences",
    "mmr_rerank",
    "windowed_novelty",
    "fleming_harrington_test",
    "l_moments",
    "log_log_elasticity",
    "hard_negative_mining",
    "rayleigh_uniformity",
    "deming_regression",
    "score_separation",
    "coec_position_bias",
    "hodges_lehmann_shift_ci",
    "rate_standardization",
    "control_chart_limits",
    "roc_points",
    "windowed_circular_stats",
    "value_at_risk",
    "burstiness",
    "anova_2way_stats",
    "levene_stats",
    "ttest_paired_stats",
    "correlation_pvalues",
    "filter_funnel",
    "wilcoxon_signed_rank_stats",
    "wilcoxon_signed_rank_pvalues",
    "bm25_topk",
    "repeated_ngrams",
    "windowed_heavy_hitters",
    "split_leakage_audit",
    "kmeans_assign",
    "retrieval_precision",
    "wilcoxon_exact_small",
    "classifier_calibration",
    "filter_agreement_kappa",
    "embedding_drift_psi",
    "ann_recall",
    "minhash_estimate_error",
    "kruskal_wallis",
    "spearman_rho",
    "qvalues_by",
    "zipf_slope",
    "hapax_stats",
    "pq_encode",
    "pq_topk",
    "gini_spend",
    "benford_audit",
    "chi2_gof",
    "decontaminate_ngrams",
    "anderson_darling_ksamp",
    "skew_profile",
    "join_cardinality",
    "two_proportion_z",
    "welch_anova_stats",
    "mutual_information",
    "theil_sen_trend",
    "ewma_user_value",
    "ppjoin_pairs",
    "containment_pairs",
    "token_pmi",
    "edit_distance_verify",
    "target_encode_loo",
    "woe_iv",
    "cusum_changepoint",
    "group_auc",
    "rrf_fusion",
    "keyness_llr",
    "retrieval_ndcg",
    "classifier_loss",
    "zorder_key",
    "attribution_last_touch",
    "triangle_count",
    "kaplan_meier",
    "sprt_bernoulli",
    "hll_distinct",
    "dunn_posthoc",
    "mann_kendall",
    "logrank_test",
    "pipeline_phospho_lfq",
    "pipeline_silac_ratio",
    "pipeline_msp_enrichment",
    "youden_threshold",
    "kpss_level",
    "good_turing",
    "dictionary_coverage",
    "category_diversity",
    "pettitt_test",
    "lorenz_curve",
    "pinball_loss",
    "meta_analysis",
    "ancova_1cov",
    "dickey_fuller",
    "seasonal_mann_kendall",
    "cox_stuart_trend",
    "cox_stuart_normal",
    "packing_efficiency",
    "msprt_normal",
    "gsea_prerank",
    "windowed_pinball_loss",
    "dimension_truncation_recall",
    "windowed_control_check",
    "hilbert_key",
    "yuen_trimmed_ttest",
    "passing_bablok",
    "lsh_candidate_eval",
    "vocabulary_coverage_curve",
    "fairness_report",
    "embedding_mmd",
    "binary_segmentation",
    "median_ci",
    "rm_anova_1way",
    "windowed_fairness_check",
    "longest_dup_substring",
    "nelson_aalen",
    "harrells_c",
    "bartlett_stats",
    "mcnemar_flags",
    "cochran_armitage",
    "friedman_counts",
    "two_segment_changepoint",
    "mixing_weights",
    "cluster_aware_split",
    "dsir_weights",
    "heaps_law",
    "quality_topq",
    "rmst",
    "acf_user_value",
    "conformal_intervals",
    "poisson_bootstrap",
    "cox_ph",
    "cumulative_incidence",
    "wilson_ci",
    "odds_ratio",
    "qini_uplift",
    "markov_attribution",
    "cox_baseline",
    "kcore_parts",
    "mh_odds_ratio",
    "cochrans_q",
    "logistic_regression",
    "ols_regression",
    "isotonic_calibration",
    "label_propagation",
    "link_prediction",
    "association_rules",
    "effect_sizes",
    "kendall_tau_b",
    "holt_forecast",
    "mood_median_test",
    "cvm_2samp",
    "jonckheere_terpstra",
    "moments_normality",
    "ansari_bradley",
    "fisher_exact",
    "cramers_v",
    "concordance_ccc",
    "fleiss_kappa",
    "ljung_box",
    "forecast_accuracy",
    "naive_bayes_lang",
    "confusion_stats",
    "average_precision",
    "cuped_adjusted",
    "hits_scores",
    "item_cosine",
    "readability",
    "partial_correlation",
    "theils_u",
    "kendalls_w",
    "page_trend_test",
    "ddsketch_quantiles",
    "holt_winters",
    "brunner_munzel",
    "quade_test",
    "krippendorff_alpha",
    "windowed_ddsketch",
    "seasonal_decompose",
    "tokenizer_stats",
    "chatterjee_xi",
    "breslow_day",
    "yuen_test",
    "binom_exact",
    "mcnemar_exact",
    "poisson_rate_test",
    "g_test",
    "boilerplate_lines",
    "ks_1samp",
    "weibull_fit",
    "wasserstein_1d",
    "js_hellinger",
    "rfm_segments",
    "van_der_waerden",
    "fligner_killeen",
    "normality_ppcc",
    # Round-10 completion of the bench tail: EVERY queries() entry is
    # benched (tests/test_survey_coverage.py asserts the lockstep), so
    # an entry that errors or regresses at bench scale can never hide
    # in an unbenched remainder.
    "ann_lsh_topk",
    "apply_design_template",
    "chunks_ntile",
    "collapse_replicates_median",
    "combine_columns_mean",
    "corpus_stats",
    "covariance_ellipse",
    "curate_corpus",
    "dedup_canonical",
    "dedup_exact_groups",
    "dedup_exact_rows",
    "duplicate_spans",
    "enrichment_ratio",
    "expand_side_table",
    "filter_threshold",
    "find_nearest",
    "fingerprint",
    "group_mean_ratio",
    "hier_cluster_assign",
    "histogram",
    "kegg_color_bins",
    "label_regex_extract",
    "linregress",
    "localization_classes",
    "log2_transform",
    "mean_pool",
    "mix_corpus",
    "nonzero_sum",
    "pack_sequences",
    "pagerank_trade",
    "pca_gram",
    "phosphopath_ratio",
    "pivot_group_means",
    "pls_weights_pc1",
    "plsda_scores",
    "protein_id_functions",
    "quality_control_counts",
    "rank_by_value",
    "remove_rows_containing",
    "remove_rows_matching",
    "repetition_signals",
    "s0_classify",
    "sample_k_per_stratum",
    "search",
    "stratified_sample",
    "strip_labels",
    "summary_counts",
    "top_decile_share",
    "topk_orders",
    "train_test_split",
    "ttest_1samp_stats",
    "image_header_profile",
    "lepage_test",
    "cucconi_test",
    "conover_squared_ranks",
    "variance_outlier_screen",
    "edf_normality_battery",
    "f_variance_ratio_test",
    "poisson_two_rate_test",
    "wallis_moore_test",
    "katz_centrality",
    "rich_club_coefficient",
    "geary_c",
    "getis_ord_g",
    "readability_battery2",
    "burrows_delta",
    "winnowing_fingerprints",
    "embedding_isotropy",
    "return_risk_profile",
    "quantile_shares",
    "retrieval_err",
    "agreement_battery",
    "dfa_hurst",
    "oaxaca_blinder",
    "event_study_did",
    "post_stratified_mean",
    "cliffs_delta",
    "mood_scale_test",
    "white_test",
    "ramsey_reset",
    "arch_lm",
    "pot_gpd_fit",
    "windowed_extremes",
    "windowed_entropy",
    "avg_neighbor_degree",
    "dunning_keywords",
    "rank_list_distance",
    "windowed_benford",
    "windowed_concentration",
    "windowed_binned_ks",
    "union_all_counts",
    "user_event_type_sets",
    "value_anomaly_counts",
    "value_counts",
    "venn_counts",
    "ward_first_merge",
    "zscore_median",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # Diagnostic subset mode (comma-separated query names): used to
    # time a family in ISOLATION when bisecting suite-interference
    # from real plan regressions. Subset passes go to a separate
    # artifact so they never pollute the full-suite medians.
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    only = [q.strip() for q in only_env.split(",") if q.strip()]
    headline = [q for q in HEADLINE if q in only] if only else HEADLINE
    spark = get_spark(app_name="padua_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    # Warm shared infrastructure outside the timed region (standard
    # JIT-warm-up practice; no query-specific plan is pre-compiled):
    # JVM + codegen framework, parquet reader, noop committer, window /
    # hash-agg / broadcast-join executors, and the Python UDF worker
    # pool (first pandas_udf call otherwise pays worker fork + Arrow
    # init inside whatever query hits it first).
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark.range(1000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.write.format("noop").mode("overwrite").save()
    w = Window.partitionBy("r_regionkey").orderBy("r_name")
    (
        warm.withColumn("_rn", F.row_number().over(w))
        .groupBy("_rn")
        .agg(F.count(F.lit(1)).alias("_c"))
        .join(F.broadcast(warm.limit(1)), how="cross")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    try:
        import pandas as pd

        @F.pandas_udf("double")
        def _warm_udf(s: pd.Series) -> pd.Series:
            return s * 1.0

        spark.range(1000).select(
            _warm_udf(F.col("id").cast("double"))
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    # Pre-generate the pipeline macro-bench fixture so its one-time
    # pandas/CSV generation cost never lands inside a timed query
    # (cached on disk after the first pass anyway).
    try:
        from padua_spark.benchdata import (
            ensure_maxquant_fixture,
            ensure_msp_fixture,
        )

        ensure_maxquant_fixture(sf_dir)
        ensure_msp_fixture(sf_dir)
    except Exception:
        pass
    # Machine-speed calibration: a fixed, data-independent 3-probe
    # mini-suite timed at pass start. Absolute query times drift 1.3x+
    # between rounds purely from machine conditions (round-7 bisect:
    # r5 vs r6 code interleaved on one machine were within noise of
    # each other while BOTH sat ~1.3x above r5's committed medians) —
    # cross-round comparisons must normalize by these probes, not
    # compare raw seconds. Round-12 change (VERDICT r11 item 2): the
    # old single codegen-sum scalar moved OPPOSITE directions in two
    # same-round artifacts because one CPU-bound job can't track a
    # machine whose scan, shuffle, and window paths drift differently.
    # Now three probes spanning the execution paths the suite actually
    # exercises: parquet scan+decode, hash-agg shuffle, ordered window.
    # `calibration` = probe total (NOT comparable to pre-r12 scalars —
    # re-baselined this round); per-probe values in calibration_probes.
    probes = _calibration_probes(spark)
    calibration = round(sum(probes.values()), 3)
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in headline:
        if name not in queries:
            continue
        # One failing query must never abort the whole run — record the
        # error, keep benchmarking the rest, and still emit the JSON line.
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"BENCH ERROR {name}: {errors[name]}", file=sys.stderr)
        finally:
            # Isolate queries: operators that persist() shared stages
            # (LSH signatures, exploded shingles) leave MEMORY_AND_DISK
            # blocks behind; letting them accumulate adds GC/eviction
            # pressure to every LATER query's timing (measured: the
            # multimodal_features 0.8s->1.8s drift across rounds 2-4
            # tracked the growing number of persisting queries).
            # Outside the timed region.
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
    total = round(sum(times.values()), 3)
    doc = _update_local_artifact(
        sf, times, total, errors, subset=bool(only),
        calibration=calibration, calibration_probes=probes,
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    out = {
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        # parsed medians over the accumulated local passes, so the
        # driver-shape artifact carries them directly (no regexing
        # BENCH_LOCAL out of a truncated tail)
        "median_queries": doc.get("median_queries", {}),
        "median_total": doc.get("median_total"),
        "n_passes": doc.get("n_passes"),
    }
    if errors:
        out["errors"] = errors
    # Full per-query record first (compact separators), then a SMALL
    # summary as the FINAL stdout line: the driver archives only a
    # bounded stdout tail, which front-truncates the full line every
    # round ("parsed": null in BENCH_r*.json). The last line is sized
    # to always fit the tail window so the artifact is self-parsing;
    # the complete per-query medians live in BENCH_LOCAL.json.
    print(json.dumps(out, separators=(",", ":")))
    slowest5 = dict(
        sorted(times.items(), key=lambda kv: -kv[1])[:5]
    )
    summary = {
        "metric": "headline_query_wall_time",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "queries": slowest5,
        "n_queries": len(times),
        "n_errors": len(errors),
        "median_total": doc.get("median_total"),
        "n_passes": doc.get("n_passes"),
        "calibration": calibration,
        "full_record": "BENCH_LOCAL.json",
    }
    print(json.dumps(summary, separators=(",", ":")))


def _calibration_probes(spark) -> dict[str, float]:
    """Fixed, data-independent machine-speed probes (round 12): one per
    execution path whose drift has actually been observed to diverge —
    parquet scan+decode, hash-aggregation shuffle, ordered window. Each
    probe is sized to ~0.5-1 s on the reference machine so the suite
    costs ~2 s per pass. The scan probe reads a fixed synthetic parquet
    materialized ONCE outside the timed region (stable path under
    /tmp, rebuilt only if missing), so pass N>=1 times pure read+decode,
    never the generation."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    probes: dict[str, float] = {}
    scan_path = "/tmp/padua_calib_scan.parquet"
    if not os.path.isdir(scan_path):
        (
            spark.range(8_000_000)
            .select(
                "id",
                (F.col("id") % 9973).cast("double").alias("v"),
                F.concat(F.lit("k"), F.col("id") % 1000).alias("s"),
            )
            .write.mode("overwrite")
            .parquet(scan_path)
        )
    t0 = time.perf_counter()
    (
        spark.read.parquet(scan_path)
        .where(F.col("v") > 10.0)
        .agg(F.sum("v"), F.count(F.lit(1)), F.max("s"))
        .collect()
    )
    probes["scan"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    (
        spark.range(6_000_000)
        .withColumn("k", F.col("id") % 100_000)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("id").alias("s"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    probes["shuffle"] = round(time.perf_counter() - t0, 3)
    w = Window.partitionBy(F.col("id") % 64).orderBy("id")
    t0 = time.perf_counter()
    (
        spark.range(3_000_000)
        .select(
            F.row_number().over(w).alias("rn"),
            F.sum("id").over(w).alias("cs"),
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    probes["window"] = round(time.perf_counter() - t0, 3)
    return probes


def _update_local_artifact(
    sf: float | None,
    times: dict[str, float],
    total: float,
    errors: dict[str, str],
    subset: bool = False,
    calibration: float | None = None,
    calibration_probes: dict[str, float] | None = None,
    cpus: int | None = None,
) -> dict:
    """Accumulate per-pass times into BENCH_LOCAL.json next to this
    file and keep per-query MEDIANS over the recorded passes — the
    driver's own artifact stores only a truncated stdout tail, so this
    file is the machine-readable per-query record (committed each
    round). Passes reset when the scale factor changes."""
    # The committed artifact tracks the driver's sf0.1 runs; smoke runs
    # at other scale factors get their own file instead of resetting it.
    if subset:
        fname = "BENCH_SUBSET.json"
    elif sf == 0.1:
        fname = "BENCH_LOCAL.json"
    else:
        fname = f"BENCH_LOCAL_sf{sf}.json"
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), fname
    )
    doc: dict = {}
    try:
        with open(path) as fh:
            doc = json.load(fh)
    except Exception:
        doc = {}
    if doc.get("sf") != sf:
        doc = {"sf": sf, "passes": []}
    rec = {"total": total, "queries": times, "calibration": calibration}
    if calibration_probes:
        rec["calibration_probes"] = calibration_probes
    if cpus is not None:
        rec["cpus"] = cpus
    doc.setdefault("passes", []).append(rec)
    doc["passes"] = doc["passes"][-10:]
    # Medians are computed over the HEADLINE core count only (VERDICT
    # r13 #8): the driver also benches at a lower core count to measure
    # scaling, and that pass must not pollute the 32-core medians. The
    # headline is the modal recorded cpus (tie -> larger); passes
    # without a cpus tag (pre-r14 ledgers) are included only when no
    # tagged pass exists. Raw per-pass rows all stay in "passes".
    tagged = [p.get("cpus") for p in doc["passes"] if p.get("cpus")]
    if tagged:
        head_cpus = max(set(tagged), key=lambda c: (tagged.count(c), c))
        doc["headline_cpus"] = head_cpus
        med_passes = [
            p for p in doc["passes"] if p.get("cpus") == head_cpus
        ]
    else:
        med_passes = doc["passes"]
    names = sorted({n for p in med_passes for n in p["queries"]})

    def _median(vals: list[float]) -> float:
        s = sorted(vals)
        k = len(s)
        mid = (
            s[k // 2] if k % 2 else (s[k // 2 - 1] + s[k // 2]) / 2.0
        )
        return round(mid, 3)

    doc["median_queries"] = {
        n: _median([p["queries"][n] for p in med_passes
                    if n in p["queries"]])
        for n in names
    }
    doc["median_total"] = _median([p["total"] for p in med_passes])
    cals = [p.get("calibration") for p in med_passes]
    cals = [c for c in cals if c is not None]
    doc["median_calibration"] = _median(cals) if cals else None
    probe_passes = [
        p["calibration_probes"]
        for p in med_passes
        if p.get("calibration_probes")
    ]
    if probe_passes:
        doc["median_calibration_probes"] = {
            k: _median([pp[k] for pp in probe_passes if k in pp])
            for k in sorted({k for pp in probe_passes for k in pp})
        }
    # Probe-normalized ledger (round-12 verdict #1): per query, the
    # ratio wall / (scan+shuffle+window probe sum) OF THE SAME PASS —
    # machine drift cancels because the probes ran seconds away from
    # the query. Medians over passes; the raw-second medians above
    # stay as the absolute record.
    norm_passes = [
        p for p in med_passes
        if p.get("calibration_probes")
        and sum(p["calibration_probes"].values()) > 0
    ]
    if norm_passes:
        def _psum(p):
            return sum(p["calibration_probes"].values())

        doc["median_queries_normalized"] = {
            n: _median([
                p["queries"][n] / _psum(p)
                for p in norm_passes if n in p["queries"]
            ])
            for n in names
            if any(n in p["queries"] for p in norm_passes)
        }
        doc["median_total_normalized"] = _median(
            [p["total"] / _psum(p) for p in norm_passes]
        )
    # n_passes keeps its historical meaning (passes in the medians);
    # n_passes_total counts every retained pass including low-core ones.
    doc["n_passes"] = len(med_passes)
    doc["n_passes_total"] = len(doc["passes"])
    doc["n_queries"] = len(names)
    if errors:
        doc["last_errors"] = errors
    else:
        doc.pop("last_errors", None)
    try:
        with open(path, "w") as fh:
            json.dump(doc, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:  # read-only checkout: never fail the bench
        print(f"BENCH WARN could not write {path}: {exc}", file=sys.stderr)
    return doc


if __name__ == "__main__":
    main()
