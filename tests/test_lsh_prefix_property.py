"""Property test for lsh_recall_eval's ground-truth completeness claim.

The query's docstring asserts the prefix-filter candidate generation
(index each doc's ``sz div 5 + 1`` globally rarest shingles + the
PPJoin 5*min >= 4*max length filter) loses NO pair with true shingle
Jaccard >= 0.8. That is a theorem (SSJoin/PPJoin prefix principle), but
the implementation of it — the (df, shingle) global order, the integer
prefix length, the length-filter inequalities — is exactly the kind of
off-by-one surface a theorem citation hides.

This suite drives the REGISTERED DuckDB oracle (the same algebra the
Spark side is hash-locked to by selfcheck) over hypothesis-generated
corpora and compares n_true_pairs against an all-pairs brute force in
plain Python. DuckDB-only on purpose: milliseconds per example, so the
search is wide; Spark-vs-oracle equality is already pinned per-commit
by tools/selfcheck.py and the scalar tests in test_r10_scalar_refs.py.
"""

from __future__ import annotations

import itertools

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_2025_1_spark.registry import all_oracles, load_all

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = pytest.mark.slow

load_all()
_ORACLE = all_oracles()["lsh_recall_eval"]

# tiny vocabulary + repeated/edited docs => dense near-dup structure,
# so thresholds and prefix boundaries actually get exercised
_VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]


def _sh3(text: str) -> set[str]:
    toks = [t for t in text.lower().split() if t]
    if len(toks) < 3:
        return set()
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _brute_truth(texts: dict[int, str], thr: float = 0.8) -> int:
    nz = {d: _sh3(t) for d, t in texts.items() if _sh3(t)}
    ids = sorted(nz)
    return sum(
        1
        for a, b in itertools.combinations(ids, 2)
        if len(nz[a] & nz[b]) / len(nz[a] | nz[b]) >= thr
    )


def _oracle_truth(texts: dict[int, str]) -> int:
    con = duckdb.connect()
    vals = ", ".join(
        f"({d}::BIGINT, '{t}', 'en', 'x', {len(t)}::BIGINT)"
        for d, t in texts.items()
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals})"
        " t(doc_id, text, lang, source, n_chars)"
    )
    return con.execute(_ORACLE).fetchone()[0]


@st.composite
def corpora(draw):
    """Corpora biased toward near-duplicates: base docs plus copies with
    single-word substitutions, prepends, and truncations — the edits
    that move Jaccard right around the 0.8 boundary."""
    n_base = draw(st.integers(min_value=1, max_value=4))
    texts: dict[int, str] = {}
    did = 0
    for _ in range(n_base):
        words = draw(
            st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=18)
        )
        texts[did] = " ".join(words)
        did += 1
        for _ in range(draw(st.integers(min_value=0, max_value=3))):
            kind = draw(st.sampled_from(["copy", "edit", "cut", "pad"]))
            w2 = list(words)
            if kind == "edit" and w2:
                w2[draw(st.integers(0, len(w2) - 1))] = draw(
                    st.sampled_from(_VOCAB)
                )
            elif kind == "cut" and w2:
                w2 = w2[:-1]
            elif kind == "pad":
                w2 = [draw(st.sampled_from(_VOCAB))] + w2
            texts[did] = " ".join(w2)
            did += 1
    return texts


@given(corpora())
@settings(max_examples=150, deadline=None)
def test_oracle_truth_equals_brute_force(texts):
    """The prefix-filtered truth count must equal all-pairs brute force
    on every corpus — completeness AND no over-counting."""
    assert _oracle_truth(texts) == _brute_truth(texts)


@pytest.mark.parametrize(
    "texts",
    [
        {},  # empty corpus
        {0: ""},  # empty doc
        {0: "aa bb"},  # sub-shingle doc
        {0: "aa bb cc", 1: "aa bb cc"},  # minimal exact dup (1 shingle)
        {0: "aa bb cc", 1: "aa bb dd"},  # 1-shingle docs, J=0
        # one-word edit near the threshold (J = 3/5)
        {0: "aa bb cc dd ee ff", 1: "aa bb cc dd ee gg"},
        # J exactly at the 0.8 boundary: B's 4 shingles all inside A's 5
        {0: "aa bb cc dd ee ff gg", 1: "aa bb cc dd ee ff"},
    ],
)
def test_oracle_truth_crafted_edges(texts):
    if texts:
        assert _oracle_truth(texts) == _brute_truth(texts)
