"""Pigeonhole banding is EXACT for hamming ≤ k: the banded equi-join
pair set must equal the brute-force all-pairs set — not approximately,
identically (banding only widens candidates; the bit_count filter
restores precision, and k+1 bands guarantee recall 1). SCALE.md promises
the same algebra at any k; this pins k=1 (the oracle-checked query's
instance) and k=2/k=3 against an in-test numpy brute force."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import text as T
from bigdata_2025_1_spark.io import load
from bigdata_2025_1_spark.operators.dedup import simhash_hamming_pairs


def _sim_frame(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.simhash_bits(F.col("text"), bits=16).alias("simhash")
    )


def _brute_pairs(rows, k):
    out = set()
    for (ida, sa), (idb, sb) in itertools.combinations(rows, 2):
        if bin(sa ^ sb).count("1") <= k:
            out.add((min(ida, idb), max(ida, idb)))
    return out


@pytest.mark.parametrize("k", [1, 2, 3])
def test_banded_pairs_equal_brute_force(spark, sf_dir, k):
    sim = _sim_frame(spark, sf_dir)
    rows = [(r.doc_id, r.simhash) for r in sim.collect()]
    expected = _brute_pairs(rows, k)
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_hamming_pairs(sim, k=k, bits=16).collect()
    }
    assert got == expected
    # hamming column itself is right (spot-check against python bit_count)
    by_sim = dict(rows)
    for r in simhash_hamming_pairs(sim, k=k, bits=16).collect():
        assert r.hamming == bin(by_sim[r.doc_a] ^ by_sim[r.doc_b]).count("1")


def test_k1_band_layout_matches_oracle_bytes(spark):
    """The k=1 split must stay the byte halves the dedup_simhash_hamming
    oracle SQL hardcodes (div 256 / mod 256): a pair agreeing only on the
    HIGH byte and a pair agreeing only on the LOW byte must both surface,
    and a hamming-2 pair must not pass the k=1 filter even though its
    bands collide."""
    sim = spark.createDataFrame(
        [
            (1, 0xAB00),
            (2, 0xAB01),  # hi byte equal to 1, hamming 1  -> pair (1,2)
            (3, 0x00CD),
            (4, 0x01CD),  # lo byte equal to 3, hamming 1  -> pair (3,4)
            (5, 0xAB03),  # hi byte equal to 1/2; hamming 2 from 1 (dropped),
            #              hamming 1 from 2 (kept)
        ],
        "doc_id int, simhash bigint",
    )
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_hamming_pairs(sim, k=1, bits=16).collect()
    }
    assert got == {(1, 2, 1), (3, 4, 1), (2, 5, 1)}


def test_too_many_bands_raises(spark, sf_dir):
    sim = _sim_frame(spark, sf_dir)
    with pytest.raises(ValueError):
        simhash_hamming_pairs(sim, k=16, bits=16)


def test_banding_property_random_hashes(spark):
    """Property: for ANY set of 16-bit hashes and any k in 1..3, the
    banded pair set equals brute force. Deterministic pseudo-random
    hashes (md5-derived) — no flaky seeds, still adversarial enough to
    hit band-boundary collisions."""
    import hashlib

    vals = [
        int(hashlib.md5(f"sb:{i}".encode()).hexdigest()[:4], 16) for i in range(120)
    ]
    # inject near-dup clusters at controlled hamming distances
    vals += [vals[0] ^ 1, vals[1] ^ 0x8000, vals[2] ^ 0x0101, vals[3] ^ 0x7000]
    rows = list(enumerate(vals))
    sim = spark.createDataFrame(rows, "doc_id int, simhash bigint")
    for k in (1, 2, 3):
        got = {
            (r.doc_a, r.doc_b)
            for r in simhash_hamming_pairs(sim, k=k, bits=16).collect()
        }
        assert got == _brute_pairs(rows, k), k
