"""Round-6 algorithmic cores vs scalar references on random inputs:
the distributed DBSCAN role assignment and the greedy allocation
waterfall must agree with straightforward single-threaded Python on
graphs/order-books small enough to enumerate."""

from __future__ import annotations

import random
from datetime import date

from pyspark.sql import functions as F

from bigdata_2025_1_spark.operators.analytic_windows import allocate_greedy
from bigdata_2025_1_spark.operators.similarity import dbscan_roles_from_pairs

import pytest as _pytest_mark

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = _pytest_mark.mark.slow


def _ref_dbscan(ids, pairs, minpts):
    adj: dict[int, set[int]] = {i: set() for i in ids}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    deg = {i: len(adj[i]) for i in ids}
    core = {i for i in ids if deg[i] >= minpts}
    # components of the core-core graph, label = min core id
    label: dict[int, int] = {}
    for s in sorted(core):
        if s in label:
            continue
        comp, stack = [], [s]
        seen = {s}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in adj[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    out = {}
    for i in ids:
        if i in core:
            out[i] = (deg[i], "core", label[i])
        else:
            neigh_cores = [label[v] for v in adj[i] if v in core]
            if neigh_cores:
                out[i] = (deg[i], "border", min(neigh_cores))
            else:
                out[i] = (deg[i], "noise", None)
    return out


def test_dbscan_roles_match_reference_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(5):
        n = rng.randint(3, 16)
        ids = list(range(n))
        und = {
            tuple(sorted((rng.randrange(n), rng.randrange(n))))
            for _ in range(rng.randint(0, 28))
        }
        und = sorted((a, b) for a, b in und if a != b)
        minpts = rng.choice((1, 2, 3))
        ids_df = spark.createDataFrame([(i,) for i in ids], "vec_id long")
        pairs_df = (
            spark.createDataFrame(und, "a long, b long")
            if und
            else spark.createDataFrame([], "a long, b long")
        )
        got = {
            r.vec_id: (r.degree, r.role, r.cluster_id)
            for r in dbscan_roles_from_pairs(ids_df, pairs_df, minpts).collect()
        }
        assert got == _ref_dbscan(ids, und, minpts), (trial, und, minpts)
        spark.catalog.clearCache()


def _ref_allocate(rows):
    # rows: (part, okey, lnum, shipdate, qty)
    from collections import defaultdict

    byp = defaultdict(list)
    for p, ok, ln, d, q in rows:
        byp[p].append((d, ok, ln, q))
    out = {}
    for p, lines in byp.items():
        demand = sum(q for *_, q in lines)
        capacity = demand // 2
        left = capacity
        n_full = n_partial = n_zero = alloc_total = 0
        for *_, q in sorted(lines):
            a = min(q, max(left, 0))
            left -= q
            alloc_total += a
            if a == q:
                n_full += 1
            elif a > 0:
                n_partial += 1
            else:
                n_zero += 1
        out[p] = (capacity, demand, n_full, n_partial, n_zero, alloc_total)
    return out


def test_greedy_allocation_matches_reference(spark):
    rng = random.Random(11)
    for trial in range(4):
        rows = []
        for ok in range(rng.randint(2, 10)):
            for ln in range(rng.randint(1, 4)):
                rows.append(
                    (
                        rng.randrange(4),
                        ok,
                        ln,
                        date(2024, 1, rng.randint(1, 28)),
                        rng.randint(1, 50),
                    )
                )
        df = spark.createDataFrame(
            rows,
            "l_partkey long, l_orderkey long, l_linenumber int, "
            "l_shipdate date, qty long",
        )
        got = {
            r.partkey: (
                r.capacity,
                r.demand,
                r.n_full,
                r.n_partial,
                r.n_zero,
                r.qty_allocated,
            )
            for r in allocate_greedy(df).collect()
        }
        assert got == _ref_allocate(rows), (trial, rows)
        spark.catalog.clearCache()
