"""Property test: the SCC closure kernel vs a scalar DFS reference."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_2025_1_spark.operators.graph_ops import scc_closure_kernel

import pytest as _pytest_mark

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = _pytest_mark.mark.slow


def _scc_reference(nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    """Kosaraju's algorithm, plain Python — the independent reference."""
    adj: dict[int, list[int]] = {u: [] for u in nodes}
    radj: dict[int, list[int]] = {u: [] for u in nodes}
    for s, d in edges:
        adj[s].append(d)
        radj[d].append(s)
    seen: set[int] = set()
    order: list[int] = []
    for u in nodes:
        if u in seen:
            continue
        stack = [(u, iter(adj[u]))]
        seen.add(u)
        while stack:
            node, it = stack[-1]
            advanced = False
            for v in it:
                if v not in seen:
                    seen.add(v)
                    stack.append((v, iter(adj[v])))
                    advanced = True
                    break
            if not advanced:
                order.append(node)
                stack.pop()
    comp: dict[int, int] = {}
    for u in reversed(order):
        if u in comp:
            continue
        members = []
        stack2 = [u]
        comp[u] = u
        while stack2:
            x = stack2.pop()
            members.append(x)
            for v in radj[x]:
                if v not in comp:
                    comp[v] = u
                    stack2.append(v)
        mid = min(members)
        for x in members:
            comp[x] = mid
    return comp


def _run_kernel(nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    rows = [(u, u, -1) for u in nodes] + [(s, d, 1) for s, d in edges]
    df = pd.DataFrame(rows, columns=["src", "dst", "w"])
    out = scc_closure_kernel(df)
    return dict(zip(out["nation_key"], out["scc_id"]))


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=12),
    edge_bits=st.lists(st.tuples(st.integers(0, 11), st.integers(0, 11)), max_size=40),
)
def test_scc_kernel_matches_kosaraju(n, edge_bits):
    nodes = list(range(n))
    edges = sorted({(a % n, b % n) for a, b in edge_bits if a % n != b % n})
    assert _run_kernel(nodes, edges) == _scc_reference(nodes, edges)


def test_scc_kernel_cycle_and_tail():
    # 0->1->2->0 is one SCC labeled 0; 3 hangs off it as a singleton
    got = _run_kernel([0, 1, 2, 3], [(0, 1), (1, 2), (2, 0), (2, 3)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3}


def test_scc_kernel_empty_edges_all_singletons():
    got = _run_kernel([5, 7, 9], [])
    assert got == {5: 5, 7: 7, 9: 9}
