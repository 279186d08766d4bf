"""Query registry: the single source of truth behind ``__spark_entry__.py``.

Each operator family module registers its queries here with the ``@query``
decorator. A query is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional DuckDB-runnable ANSI SQL oracle string with IDENTICAL column names
and value semantics (the driver hash-compares, order-insensitive, columns
sorted by name).

Determinism rules every registered query follows:
- every computed column is aliased, identically in Spark and SQL;
- no un-ordered LIMIT — any top-k orders by a unique tiebreaker;
- double aggregations go through exact integer scaling (``functions.exact``)
  so partition-order / engine differences cannot produce differing bits;
- ANSI-safe Spark (try_element_at / try_cast) since Spark 4 runs ANSI mode.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# The driver walks ``queries()`` in dict order and checks exactly the
# first 50 entries per round (each CORRECTNESS_r0N covers 50). Order is
# therefore a correctness lever. Round-6 rotation (executes the plan the
# round-5 VERDICT ratified as its #1 ask): all 46 queries that have
# NEVER had a driver row take positions 0-45, and the 4 spare slots
# refresh the oldest r2-vintage greens. After this head lands green the
# never-checked backlog is ZERO for the first time since round 2.
#
# Head composition:
# - positions 0-8: never-checked queries whose CODE CHANGED in round 6,
#   so their first driver row certifies current code — the CDC
#   skinny-window fix (cdc_chunk_dedup), the SemDeDup second-level
#   re-split (semantic_dedup_pairs), the all-zero-label fix
#   (sq8_quantization_error), and the six never-checked queries routed
#   through the shared rank_after_limit helper;
# - positions 9-24: the remaining 16 round-5 additions;
# - positions 25-45: the remaining 21 round-4 leftovers;
# - positions 46-49: stale-green refresh — the 4 oldest r2-vintage rows
#   (cube_flag_status, scalar_subquery_big_orders,
#   recursive_cte_month_spine, media_metadata).
#
# CAPACITY WARNING: the head is at exactly 50 entries. Anything past
# position 49 gets no driver row this round — add new queries by
# REPLACING a proven-green head entry, never by growing past 50. New
# round-6 queries therefore queue for round 7, NOT the head.
#
# ROUND-7/8 ROTATION PLAN: with the pre-round-6 never-checked backlog
# at zero, round 7's head takes (a) the 36 round-6 additions, none yet
# driver-checked (benchmark_decontamination, char_entropy_quality,
# bpe_merge_sequence, density_core_clusters, cusum_changepoint,
# chi_square_independence, naive_bayes_source_classifier,
# textrank_keywords, typo_variant_pairs, greedy_stock_allocation,
# item_cofiltering_similarity, theil_sen_trend, zipf_exponent_fit,
# slo_burn_rate, k_anonymity_audit, ab_test_uplift, abc_xyz_matrix,
# decayed_part_demand, retrieval_mrr_eval, funnel_latency_percentiles,
# hourly_autocorrelation, cohort_ltv_matrix, data_expectations_report,
# semantic_decontamination, seasonal_naive_backtest,
# jain_fairness_index, recsys_holdout_hitrate, kaplan_meier_retention,
# NOTE 36 + 2 re-certs = 38 head slots; the 22-name stale list in (c)
# overflows round 7 by 10 — roll the last 10 of (c) to round 8.
# scd2_status_history, kcore_trade_graph, margin_candidate_mining_ivf,
# hyperball_harmonic_trade, domain_mixture_reweight, event_rate_anomaly,
# sketch_join_size_estimate, pca_power_iteration — all selfcheck-green
# at sf0.01, the round-6-batch also at sf0.1), then (b)
# dedup_minhash_lsh + minhash_signatures (code
# touched by the round-6 signatures_from_docs refactor — re-certify on
# current code), then (c) stale-green refresh from the 22 remaining
# r2-vintage greens: (media_feature_stats, media_frame_sample,
# media_resize, udaf_median_order_value, grouped_map_spend_share,
# order_value_percentiles, approx_percentiles, pivot_status_by_priority,
# sql_cte_above_nation_avg, train_test_split, corpus_quality_filter,
# sequence_packing, corpus_end_to_end, stratified_source_cap,
# corpus_temperature_mix, domain_doc_stats, global_size_stats,
# metadata_extract, wordcount, udtf_bigrams, date_features,
# string_functions_showcase) — roll the remainder through round 8;
# after that no green row predates round 3.
PRIORITY_HEAD: tuple[str, ...] = (
    # -- 0-8: first driver rows ON ROUND-6-CHANGED CODE
    "cdc_chunk_dedup",
    "semantic_dedup_pairs",
    "sq8_quantization_error",
    "bigram_backoff_logprob",
    "margin_candidate_mining",
    "weighted_sample_wor",
    "seasonal_hourly_residuals",
    "token_association_rules",
    "part_popularity_rec",
    # -- 9-24: the remaining round-5 additions (never driver-checked)
    "dedup_incremental_lsh",
    "tokenizer_fertility_by_lang",
    "embedding_dispersion",
    "corpus_drift_psi",
    "feature_hashing_buckets",
    "column_mutual_information",
    "skyline_price_size",
    "vocab_frequency_spectrum",
    "source_token_kl",
    "benford_price_audit",
    "cross_source_overlap",
    "reciprocal_nn_pairs",
    "doc_novelty_decay",
    "bootstrap_mean_ci",
    "harmonic_centrality_trade",
    "contrastive_triplet_mining",
    # -- 25-45: the round-4 leftovers (never driver-checked)
    "vocab_growth_curve",
    "markov_event_transitions",
    "parts_abc_pareto",
    "watermark_lateness_audit",
    "doc_readability_scores",
    "monthly_seasonality_index",
    "embedding_norm_profile",
    "functional_dependency_profile",
    "dup_cluster_size_histogram",
    "source_language_mix",
    "user_feature_matrix",
    "incremental_monthly_rollup",
    "shipping_latency_percentiles",
    "rolling_weekly_active_users",
    "trade_graph_degree_stats",
    "media_prefix_clusters",
    "label_centroid_distances",
    "top_sources_with_other",
    "customer_spend_gini",
    "corpus_health_scorecard",
    "order_size_distribution",
    # -- 46-49: stale-green refresh (oldest r2-vintage rows)
    "cube_flag_status",
    "scalar_subquery_big_orders",
    "recursive_cte_month_spine",
    "media_metadata",
)

# Proven green in round 2 against current code: after the 50-row window.
PRIORITY_TAIL: tuple[str, ...] = ()


def _ordered(names: list[str]) -> list[str]:
    head = [n for n in PRIORITY_HEAD if n in names]
    tail = [n for n in PRIORITY_TAIL if n in names]
    placed = set(head) | set(tail)
    return head + [n for n in names if n not in placed] + tail


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as query ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module (side effect: registration)."""
    from bigdata_2025_1_spark import operators  # noqa: F401

    operators.load_all()


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return {n: QUERIES[n] for n in _ordered(list(QUERIES))}


def all_oracles() -> dict[str, str]:
    load_all()
    return {n: ORACLES[n] for n in _ordered(list(ORACLES))}


def describe() -> list[dict[str, Any]]:
    load_all()
    return [
        {"name": n, "has_oracle": n in ORACLES, "doc": (f.__doc__ or "").strip().splitlines()[0] if f.__doc__ else ""}
        for n, f in sorted(QUERIES.items())
    ]
