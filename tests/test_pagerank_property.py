"""Property test: the vectorized integer PageRank kernel must agree
EXACTLY (int64 for int64) with a dict-based scalar reference on random
graphs — the np.add.at scatter, the ppm floor divisions, and the damping
mix leave no room for "close enough".

The generator produces CONTRACT-VALID inputs: raw positive edge weights
normalized to ppm exactly the way the operator does (w·PPM // out_total),
so per-source sums are ≤ PPM. The kernel's overflow guard (a first
hypothesis run caught an int64 wrap on contract-violating weights) is
pinned separately.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_2025_1_spark.operators.graph_ops import (
    PR_ITERS,
    PR_ONE,
    PR_PPM,
    pagerank_int_kernel,
)

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = pytest.mark.slow


def _normalize(raw_edges: list[tuple[int, int, int]]):
    """(src, dst, w) → (src, dst, w·PPM // out_total), the operator's rule."""
    totals: dict[int, int] = {}
    for s, _, w in raw_edges:
        totals[s] = totals.get(s, 0) + w
    return [(s, d, (w * PR_PPM) // totals[s]) for s, d, w in raw_edges]


def _reference_pagerank(nodes: list[int], edges: list[tuple[int, int, int]]):
    n = len(nodes)
    r0 = PR_ONE // n
    rank = {k: r0 for k in nodes}
    base = (15 * r0) // 100
    for _ in range(PR_ITERS):
        contrib = {k: 0 for k in nodes}
        for s, d, w in edges:
            contrib[d] += (rank[s] * w) // PR_PPM
        rank = {k: base + (85 * contrib[k]) // 100 for k in nodes}
    return rank


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=12).flatmap(
        lambda n: st.tuples(
            st.just(list(range(n))),
            st.lists(
                st.tuples(
                    st.integers(0, n - 1),
                    st.integers(0, n - 1),
                    st.integers(1, 10_000),
                ),
                max_size=40,
            ),
        )
    )
)
def test_kernel_matches_scalar_reference(graph):
    nodes, raw_edges = graph
    edges = _normalize(raw_edges)
    rows = list(edges) + [(k, k, -1) for k in nodes]
    df = pd.DataFrame(rows, columns=["src", "dst", "w_ppm"])
    out = pagerank_int_kernel(df)
    got = dict(zip(out["nation_key"].tolist(), out["rank"].tolist()))
    expected = _reference_pagerank(nodes, edges)
    assert got == expected


def test_kernel_empty_and_isolated():
    assert pagerank_int_kernel(pd.DataFrame(columns=["src", "dst", "w_ppm"])) is None
    # isolated node: rank = base (no inbound mass)
    df = pd.DataFrame([(7, 7, -1)], columns=["src", "dst", "w_ppm"])
    out = pagerank_int_kernel(df)
    assert out["rank"].tolist() == [(15 * PR_ONE) // 100]


def test_kernel_rejects_unnormalized_weights():
    """The int64 bound argument requires per-source ppm sums ≤ 1e6; the
    kernel must refuse (not silently wrap) when the invariant is broken."""
    rows = [(0, 0, PR_PPM), (0, 0, PR_PPM), (0, 0, -1)]
    df = pd.DataFrame(rows, columns=["src", "dst", "w_ppm"])
    with pytest.raises(ValueError, match="ppm-normalized"):
        pagerank_int_kernel(df)
