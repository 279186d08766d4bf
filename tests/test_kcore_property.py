"""kcore_peel_kernel vs an order-independent reference: the k-core is
unique, so one-at-a-time peeling (any order) must land on the same core
as the kernel's round-synchronous peeling."""

from __future__ import annotations

import random

from bigdata_2025_1_spark.operators.graph_ops import kcore_peel_kernel

import pytest as _pytest_mark

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = _pytest_mark.mark.slow


def _brute_core(edges: set[tuple[int, int]], k: int) -> set[int]:
    """Remove ANY single node with degree < k until none — uniqueness of
    the k-core makes the removal order irrelevant."""
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    while True:
        deg: dict[int, int] = {}
        for u, _ in edges:
            deg[u] = deg.get(u, 0) + 1
        low = sorted(u for u in nodes if deg.get(u, 0) < k)
        if not low:
            return nodes
        drop = random.Random(len(nodes)).choice(low)  # arbitrary-but-seeded
        nodes.discard(drop)
        edges = {(u, v) for (u, v) in edges if u != drop and v != drop}


def test_kernel_matches_brute_force_on_random_graphs():
    import pandas as pd

    rng = random.Random(42)
    for trial in range(25):
        n = rng.randint(2, 18)
        und = {
            tuple(sorted((rng.randrange(n), rng.randrange(n))))
            for _ in range(rng.randint(1, 40))
        }
        und = {(a, b) for a, b in und if a != b}
        sym = {(a, b) for a, b in und} | {(b, a) for a, b in und}
        df = pd.DataFrame(sym, columns=["u", "v"]) if sym else pd.DataFrame(
            {"u": [], "v": []}
        )
        for k in (2, 3):
            out = kcore_peel_kernel(df, k)
            core = set(out.loc[out["removed_round"].isna(), "u"].astype(int))
            assert core == _brute_core(set(sym), k), (trial, k, sorted(sym))
            # core members' reported degree counts core-internal edges only
            for _, r in out.dropna(subset=["core_degree"]).iterrows():
                u = int(r["u"])
                d = sum(1 for (a, b) in sym if a == u and b in core)
                assert int(r["core_degree"]) == d


def test_kernel_empty_and_tiny():
    import pandas as pd

    empty = kcore_peel_kernel(pd.DataFrame({"u": [], "v": []}), 3)
    assert len(empty) == 0
    tri = {(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)}
    out = kcore_peel_kernel(pd.DataFrame(tri, columns=["u", "v"]), 2)
    assert out["removed_round"].isna().all()  # a triangle IS a 2-core
    out3 = kcore_peel_kernel(pd.DataFrame(tri, columns=["u", "v"]), 3)
    assert out3["removed_round"].notna().all()  # and not a 3-core
