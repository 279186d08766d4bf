"""Link-prediction scores vs a scalar reference on random undirected
graphs: common neighbors, i12-frozen resource allocation, and Jaccard
must match set arithmetic exactly, and adjacent pairs must never
appear."""

from __future__ import annotations

import random

from bigdata_2025_1_spark.operators.graph_ops import _I12, link_scores_from_und

import pytest


def _ref_scores(n, edges):
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for x in range(n):
        for y in range(x + 1, n):
            if y in adj[x]:
                continue
            common = adj[x] & adj[y]
            if not common:
                continue
            ra12 = sum(_I12 // len(adj[m]) for m in common)
            jac = len(common) / (len(adj[x]) + len(adj[y]) - len(common))
            out[(x, y)] = (len(common), ra12 / _I12, jac)
    return out


@pytest.mark.slow
def test_link_scores_match_reference_on_random_graphs(spark):
    rng = random.Random(23)
    for trial in range(5):
        n = rng.randint(4, 14)
        edges = sorted(
            {
                tuple(sorted((rng.randrange(n), rng.randrange(n))))
                for _ in range(rng.randint(n, 3 * n))
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        und = spark.createDataFrame(edges, "a long, b long")
        adj = und.unionAll(und.selectExpr("b as a", "a as b")).toDF("u", "v")
        deg = adj.groupBy("u").count().withColumnRenamed("count", "d")
        got = {
            (r.x, r.y): (r.common_neighbors, r.resource_allocation, r.jaccard)
            for r in link_scores_from_und(und, adj, deg).collect()
        }
        ref = _ref_scores(n, edges)
        assert set(got) == set(ref), (trial, edges)
        for pair, (cn, ra, jac) in ref.items():
            gcn, gra, gjac = got[pair]
            assert gcn == cn
            assert abs(gra - ra) < 1e-8
            assert abs(gjac - jac) < 1e-8
