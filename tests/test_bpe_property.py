"""BPE merge-application semantics (ADVICE r6 medium): the fold must
merge EVERY non-overlapping adjacent occurrence left-to-right, exactly
like the scalar Sennrich greedy scan — including repeating-pair words
('abab', 'aaa', 'aaaaa') where a literal ' A B ' -> ' AB ' replace
silently skips every second occurrence (consecutive matches share the
delimiter space)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdata_2025_1_spark.operators.corpus_ops import bpe_apply_merge

import pytest as _pytest_mark

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = _pytest_mark.mark.slow


def scalar_greedy_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Reference: Sennrich et al. 2016 greedy scan — on (A, B) match,
    fuse and continue AFTER the fused token (non-overlapping)."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


CRAFTED = [
    # (symbols, pair) — the adversarial shapes from the advice
    (["a", "b", "a", "b"], "a b"),  # 'abab': BOTH occurrences merge
    (["a", "b", "a", "b", "a", "b"], "a b"),
    (["a", "a", "a"], "a a"),  # odd run: [aa, a]
    (["a", "a", "a", "a"], "a a"),  # even run: [aa, aa]
    (["a", "a", "a", "a", "a"], "a a"),  # [aa, aa, a] — NOT [aa, a, aa]
    (["x", "a", "b", "y"], "a b"),
    (["a"], "a b"),  # single symbol: untouched
    (["b", "a", "b", "a"], "a b"),  # match not at position 0
    (["ab", "a", "b"], "a b"),  # fused-lookalike prefix must not consume
    (["a", "b", "b"], "a b"),  # B repeat after a fuse
    (["aa", "a", "a"], "a a"),  # pre-existing 'aa' token is not an A
]


def _spark_merge(spark, words: list[list[str]], pair: str) -> list[list[str]]:
    merged = pair.replace(" ", "")
    df = spark.createDataFrame(
        [(i, " " + " ".join(w) + " ") for i, w in enumerate(words)], "i int, s string"
    )
    rows = (
        df.select("i", bpe_apply_merge(F.col("s"), pair, merged).alias("s"))
        .orderBy("i")
        .collect()
    )
    return [r.s.strip().split(" ") for r in rows]


def test_crafted_repeating_pair_words(spark):
    words = [w for w, _ in CRAFTED]
    # group by pair so each createDataFrame round-trip covers one rule
    for pair in {p for _, p in CRAFTED}:
        subset = [w for w, p in CRAFTED if p == pair]
        got = _spark_merge(spark, subset, pair)
        a, b = pair.split(" ")
        want = [scalar_greedy_merge(w, a, b) for w in subset]
        assert got == want, (pair, subset, got, want)


SYM = st.sampled_from(["a", "b", "c", "ab", "bc"])


@settings(max_examples=20, deadline=None)
@given(st.lists(st.lists(SYM, min_size=1, max_size=8), min_size=1, max_size=6))
def test_fold_matches_scalar_greedy(spark, words):
    for pair in ("a b", "a a", "b c", "ab c"):
        a, b = pair.split(" ")
        got = _spark_merge(spark, words, pair)
        want = [scalar_greedy_merge(w, a, b) for w in words]
        assert got == want, (pair, words, got, want)
