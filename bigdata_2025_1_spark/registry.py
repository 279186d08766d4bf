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
# therefore a correctness lever. Round-8 rotation (executes the plan the
# round-7 VERDICT ratified as its #1 ask, WITH its 2-slot amendment: the
# round-7 plan's stale list named 11 r2-vintage greens but 13 exist, so
# the two spare slots go to cross_join_enumeration and
# events_json_decode — the two rows the list omitted — instead of
# r3-vintage refreshes; with them 37 + 13 = 50 exactly).
#
# Head composition:
# - positions 0-36: the 37 round-7 additions — the only queries that
#   have never had a driver row (all selfcheck-green tuned AND vanilla;
#   the round-7 VERDICT independently re-verified all 37 under the
#   vanilla driver-like session: 37/37 pass);
# - positions 37-47: the 11 r2-vintage stale greens the round-7 plan
#   listed;
# - positions 48-49: cross_join_enumeration + events_json_decode — the
#   amendment slots. After this lands green, NO green row predates
#   round 3 and the never-checked backlog is the round-8 additions
#   alone.
#
# CAPACITY WARNING: the head is at exactly 50 entries. Anything past
# position 49 gets no driver row this round — add new queries by
# REPLACING a proven-green head entry, never by growing past 50. Per
# the round-7 VERDICT ask #2, round-8 additions are BATCHED (<=13) and
# queue for round 9, NOT the head.
#
# ROUND-9 ROTATION PLAN: head takes (a) every round-8 addition (each
# selfchecked tuned + vanilla the day it lands; exact names appended to
# the list below as they land); then (b) the oldest stale greens by
# driver-row vintage, oldest first, until the head reaches exactly 50.
# Round-8 additions — COMPLETE at the 13-query cap (VERDICT r7 ask #2):
#   kruskal_wallis_priority_spend, welch_t_spend,
#   wasserstein_value_drift, mcnemar_paired_returns,
#   cramers_v_association, zorder_layout_cells,
#   holt_linear_forecast, piecewise_linear_breakpoint,
#   durbin_watson_hourly, logrank_priority_survival,
#   scc_trade_graph, jsd_source_divergence,
#   difference_in_differences.
# The round-9 head is therefore: these 13 (never driver-checked; each
# selfchecked tuned + vanilla and green on empty tables the day it
# landed) + the 37 oldest stale greens by driver-row vintage = exactly
# 50. After the round-8 rotation lands, the oldest vintage is r3;
# the 37 r3-vintage rows to refresh (alphabetical within the vintage,
# computed from CORRECTNESS_r0{1..7}.json + the round-8 head):
#   ann_topk_cosine, anti_join_idle_customers, array_map_builders,
#   bloom_filter_membership, customer_running_spend,
#   dedup_char_ngram_jaccard, dedup_connected_components,
#   dedup_embedding_cosine, dedup_exact,
#   dedup_first_event_per_user_type, distinct_counts, doc_fingerprints,
#   doc_pii_redaction, doc_quality_scores, events_hourly_windows,
#   events_sliding_windows, filter_project_preview,
#   full_outer_reconciliation, grouping_sets_priority_status,
#   html_to_markdown_docs, inverted_index, kafka_roundtrip_counts,
#   lang_id_heuristic, normalize_text, null_safe_equality,
#   orders_by_month, outer_join_order_counts, part_price_bands,
#   part_price_rank_in_brand, posexplode_tokens, q3_top_revenue_orders,
#   q5_region_revenue, quantile_sketch_merge, rolling_30d_revenue,
#   rollup_nation_segment, semi_join_active_customers,
#   sessionized_path_3grams.
# (More r3-vintage greens remain after these 37 — set_ops_customer_
# segments, simhash_values, ... — they take the round-10 stale slots.)
PRIORITY_HEAD: tuple[str, ...] = (
    # -- 0-36: the 37 round-7 additions (never driver-checked)
    "mann_whitney_segment_spend",
    "spearman_qty_price",
    "ks_value_drift",
    "gini_stump_threshold",
    "roc_auc_holdout",
    "average_precision_holdout",
    "calibration_ece_bins",
    "decile_lift_table",
    "anova_f_segment_spend",
    "brown_forsythe_spend_variance",
    "jarque_bera_order_values",
    "link_prediction_trade",
    "degree_assortativity_trade",
    "isotonic_calibration",
    "crossval_auc_folds",
    "kendall_tau_qty_discount",
    "kneser_ney_bigram",
    "negative_sampling_pairs",
    "linear_attribution_revenue",
    "qini_uplift_curve",
    "woe_information_value",
    "conformal_interval_coverage",
    "eb_shrunk_supplier_rates",
    "median_ci_orderstat",
    "cuped_adjusted_uplift",
    "kmv_intersection_estimate",
    "ipf_raking_weights",
    "chao1_vocab_coverage",
    "capture_recapture_population",
    "neyman_allocation",
    "hill_tail_index",
    "mahalanobis_outliers",
    "cochran_armitage_trend",
    "bradley_terry_nation_strength",
    "shapley_variance_attribution",
    "risk_ratio_odds_ratio",
    "cohens_kappa_agreement",
    # -- 37-47: the 11 r2-vintage stale greens from the round-7 plan
    "sequence_packing",
    "corpus_end_to_end",
    "stratified_source_cap",
    "corpus_temperature_mix",
    "domain_doc_stats",
    "global_size_stats",
    "metadata_extract",
    "wordcount",
    "udtf_bigrams",
    "date_features",
    "string_functions_showcase",
    # -- 48-49: the round-7 VERDICT's 2-slot amendment (the two
    #    r2-vintage rows the original stale list omitted)
    "cross_join_enumeration",
    "events_json_decode",
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
