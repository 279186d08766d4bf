"""Capture ``explain`` output programmatically.

The charter's scale bar — "is the filter pushed down? is the small side
broadcast? is the hot path in whole-stage codegen?" — is checkable from
the formatted plan string. tests/test_plans.py pins these properties for
the headline queries so a refactor that silently drops a broadcast or
blocks pushdown fails CI, not a 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) executed plan — run the query first; codegen /
    AQE-chosen join strategies only appear here."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}


def count_single_partition_exchanges(df: DataFrame) -> int:
    """Number of ``Exchange SinglePartition`` nodes — the whole-data
    funnel that unpartitioned windows and global sorts insert. Scalar
    aggregates also produce one (they move one row per input partition:
    harmless); tests pin the exact expected count per query so an
    accidental doc-sized unpartitioned window fails CI."""
    plan = formatted_plan(df)
    return len(re.findall(r"^Arguments: SinglePartition", plan, flags=re.MULTILINE))


def single_partition_exchange_inputs(df: DataFrame) -> list[str]:
    """The ``Input`` column list of every ``Exchange SinglePartition``
    node in the formatted plan. The scale pin: none of these may carry a
    row-per-document/row-per-fact column (e.g. ``doc_id``) — a
    SinglePartition exchange is only acceptable for scalar-aggregate
    rows and distinct-value-domain tables."""
    plan = formatted_plan(df)
    out = []
    blocks = re.split(r"^\(\d+\) ", plan, flags=re.MULTILINE)
    for b in blocks:
        if not b.startswith("Exchange"):
            continue
        if not re.search(r"^Arguments: SinglePartition", b, flags=re.MULTILINE):
            continue
        m = re.search(r"^Input(?: \[\d+\])?: (.*)$", b, flags=re.MULTILINE)
        out.append(m.group(1) if m else "")
    return out


def window_node_inputs(df: DataFrame) -> list[str]:
    """The ``Input`` column list of every ``Window`` node in the
    formatted plan. The row-width pin: a window's sort buffers its whole
    input rows, so no wide payload column (e.g. a document ``text``
    body) may enter a window — compute on skinny keys first, join the
    payload back after."""
    plan = formatted_plan(df)
    out = []
    blocks = re.split(r"^\(\d+\) ", plan, flags=re.MULTILINE)
    for b in blocks:
        if not (b.startswith("Window ") or b.startswith("Window\n")):
            continue
        m = re.search(r"^Input(?: \[\d+\])?: (.*)$", b, flags=re.MULTILINE)
        out.append(m.group(1) if m else "")
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan — the scale
    currency. (Broadcast exchanges are not counted; they are the cheap
    kind.)"""
    plan = formatted_plan(df)
    # count only the numbered node-detail lines, not the tree summary
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))
