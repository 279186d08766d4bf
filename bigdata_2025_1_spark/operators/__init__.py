"""Operator families. Importing a module registers its queries."""

from __future__ import annotations

import importlib

_MODULES = (
    "reference_parity",
    "relational",
    "tpch_more",
    "analytic_windows",
    "events_ops",
    "text_analysis",
    "dedup",
    "similarity",
    "multimodal",
    "pandas_surface",
    "scalar_funcs",
    "pipeline_ops",
    "statistics",
    "timeseries_ops",
    "streaming_ops",
    "graph_ops",
    "crawl_ops",
    "corpus_ops",
    "retrieval_ops",
    "model_eval",
    "table_ops",
    "layout_ops",
    "incremental_ops",
    "cdc_ops",
    "backfill_ops",
    "platform_ops",
)


def load_all() -> None:
    for m in _MODULES:
        importlib.import_module(f"bigdata_2025_1_spark.operators.{m}")
