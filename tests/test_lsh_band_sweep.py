"""lsh_band_sweep: the deployed-config row must reconcile exactly with
lsh_recall_eval (shared truth AND shared band machinery), the grid must
show the S-curve monotonicity, and the theoretical column must be the
exact 1-(1-J^r)^b float."""

from __future__ import annotations

import inspect

from bigdata_2025_1_spark.operators.dedup import (
    BANDS,
    JACCARD_THRESHOLD,
    NUM_HASHES,
    _sweep_oracle,
    signatures_from_docs,
)
from bigdata_2025_1_spark.registry import all_queries
from tests.test_r10_scalar_refs import _write_docs_bigint


def test_deployed_row_reconciles_with_recall_eval(spark, sf_dir):
    qs = all_queries()
    grid = {r.bands: r for r in qs["lsh_band_sweep"](spark, sf_dir).collect()}
    eval_row = qs["lsh_recall_eval"](spark, sf_dir).collect()[0]
    dep = grid[BANDS]
    assert dep.rows_per_band == NUM_HASHES // BANDS
    assert dep.n_true_pairs == eval_row.n_true_pairs
    assert dep.n_candidates == eval_row.n_lsh_candidates
    assert dep.n_verified == eval_row.n_lsh_pairs
    assert dep.recall == eval_row.recall
    spark.catalog.clearCache()


def test_grid_monotonicity_and_theory_column(spark, sf_dir):
    rows = all_queries()["lsh_band_sweep"](spark, sf_dir).collect()
    assert [r.bands for r in rows] == [1, 2, 4, 8]
    # candidate sets NEST along this divisor chain: sharing a band of
    # 2r rows means sharing both its r-row halves, so 1x8 ⊆ 2x4 ⊆
    # 4x2 ⊆ 8x1 — counts and recall are monotone by construction
    cands = [r.n_candidates for r in rows]
    assert all(a <= b for a, b in zip(cands, cands[1:]))
    recalls = [r.recall for r in rows]
    assert all(a <= b for a, b in zip(recalls, recalls[1:]))
    # verified pairs are a subset of truth under every config
    for r in rows:
        assert r.n_verified <= r.n_true_pairs
        j = float(JACCARD_THRESHOLD)
        assert r.p_cand_at_thresh == 1.0 - (1.0 - j**r.rows_per_band) ** r.bands
    spark.catalog.clearCache()


def test_crafted_scalar_reference_all_configs(spark, tmp_path):
    """Hand-computed scalar reference covering the NON-DEPLOYED configs
    (1x8, 4x2, 8x1), not just the (2,4) reconciliation row.

    Crafted corpus: docs 1 and 2 are DIFFERENT texts with the SAME
    3-shingle set ("p q r" repeated 2x vs 3x -> the same three cyclic
    shingles {'p q r','q r p','r p q'} after list_distinct), so their
    8-hash MinHash signatures are identical and they are a candidate
    under EVERY banding — including 1x8, where candidacy requires
    full-signature equality. Docs 3 and 4 have vocabularies disjoint
    from each other and from 1/2, so no rotation minimum can coincide
    (distinct shingles -> distinct md5s) and no pair involving them is
    a candidate under ANY banding. Hand-derived expectation for every
    config row: n_true_pairs=1 ((1,2) at J=1.0 is the only pair at
    J>=0.8), n_candidates=1, n_verified=1, recall=1.0; the theory
    column is the closed form at the shared threshold."""
    sf = _write_docs_bigint(
        spark,
        tmp_path,
        {
            1: "p q r p q r",
            2: "p q r p q r p q r",
            3: " ".join(f"w{i}" for i in range(20)),
            4: " ".join(f"v{i}" for i in range(18)),
        },
    )
    # premise check: same shingle set -> same signature, different text
    sig = {
        r.doc_id: (sorted(r.shingles), list(r.sig))
        for r in signatures_from_docs(
            spark.read.parquet(f"{sf}/documents.parquet")
        ).collect()
    }
    assert sig[1] == sig[2]
    assert sig[1][0] == sorted(["p q r", "q r p", "r p q"])
    rows = all_queries()["lsh_band_sweep"](spark, sf).collect()
    j = float(JACCARD_THRESHOLD)
    assert [
        (r.bands, r.rows_per_band, r.n_true_pairs, r.n_candidates,
         r.n_verified, r.recall, r.p_cand_at_thresh)
        for r in rows
    ] == [
        (b, NUM_HASHES // b, 1, 1, 1, 1.0, 1.0 - (1.0 - j ** (NUM_HASHES // b)) ** b)
        for b in (1, 2, 4, 8)
    ]
    spark.catalog.clearCache()


def test_sweep_oracle_is_single_substitution_pass():
    """ADVICE r11 regression: the oracle template must be assembled in
    ONE f-string pass — a trailing .format() over already-interpolated
    band SQL would KeyError at import time on any future curly brace in
    the fragments."""
    import ast
    import textwrap

    tree = ast.parse(textwrap.dedent(inspect.getsource(_sweep_oracle)))
    format_calls = [
        n
        for n in ast.walk(tree)
        if isinstance(n, ast.Call)
        and isinstance(n.func, ast.Attribute)
        and n.func.attr == "format"
    ]
    assert format_calls == []
    oracle = _sweep_oracle()
    for placeholder in ("{toks}", "{shingles}", "{truth}", "{sig}"):
        assert placeholder not in oracle
