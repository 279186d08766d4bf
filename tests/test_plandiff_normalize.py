"""Regression pins for tools/plandiff.py's normalizer — the two
documented false-positive classes that fired in round 12 on exactly the
queries a bench panic checks first (VERDICT r12 ask #3):

1. multi-count-distinct Expand gid<->column renumbering
   (friedman_priority_monthly): the session-global expression-id
   counter permutes the synthetic gid values, the Expand projection-row
   order, AND the scaffolding column order, all semantically void;
2. RDD creation call-site strings (hdbscan_lite_clusters's
   localCheckpoint): ``NativeMethodAccessorImpl.java:0`` on one build,
   ``<unknown>:0`` on another — JVM reflection noise.

Both must normalize to EQUAL (CHANGED means changed), while genuine
shape changes on the same lines must still differ. These are pure
string tests — no Spark session — so they pin the normalizer itself,
not a lucky counter alignment.
"""

from __future__ import annotations

from tools.plandiff import normalize

# A faithful excerpt of the friedman-class diff (captured from the real
# round-12 adjudication): the gid<->column assignment renumbered — rows
# permuted, gid literals swapped, scaffolding column order flipped —
# with the FILTER still following its column.
_EXPAND_OLD = """(3) Expand
Input [2]: [g#101L, m#102L]
Arguments: [[g#101L, null, 1], [null, m#102L, 2]], [g#110L, m#111L, gid#109]

(4) HashAggregate
Input [3]: [g#110L, m#111L, gid#109]
Keys [3]: [g#110L, m#111L, gid#109]
Functions: []

(5) Exchange
Input [3]: [g#110L, m#111L, gid#109]
Arguments: hashpartitioning(g#110L, m#111L, gid#109, 8), ENSURE_REQUIREMENTS, [plan_id=31]

(7) HashAggregate
Functions [2]: [count(g#110L) FILTER (WHERE (gid#109 = 1)), count(m#111L) FILTER (WHERE (gid#109 = 2))]
"""

_EXPAND_NEW = """(3) Expand
Input [2]: [g#201L, m#202L]
Arguments: [[null, m#202L, 1], [g#201L, null, 2]], [m#211L, g#210L, gid#209]

(4) HashAggregate
Input [3]: [m#211L, g#210L, gid#209]
Keys [3]: [m#211L, g#210L, gid#209]
Functions: []

(5) Exchange
Input [3]: [m#211L, g#210L, gid#209]
Arguments: hashpartitioning(m#211L, g#210L, gid#209, 8), ENSURE_REQUIREMENTS, [plan_id=77]

(7) HashAggregate
Functions [2]: [count(g#210L) FILTER (WHERE (gid#209 = 2)), count(m#211L) FILTER (WHERE (gid#209 = 1))]
"""


def test_gid_renumbering_normalizes_equal():
    assert normalize(_EXPAND_OLD) == normalize(_EXPAND_NEW)


def test_genuine_change_on_gid_line_still_flags():
    # same renumbering, but ONE aggregate genuinely changed: count -> sum
    broken = _EXPAND_NEW.replace("count(m#211L)", "sum(m#211L)")
    assert normalize(_EXPAND_OLD) != normalize(broken)


def test_genuine_expand_row_change_still_flags():
    # a projection row genuinely lost a column (null where g was carried)
    broken = _EXPAND_NEW.replace(
        "[g#201L, null, 2]", "[null, null, 2]"
    )
    assert normalize(_EXPAND_OLD) != normalize(broken)


def test_callsite_string_normalizes_equal():
    old = (
        "Arguments: [id#23L], MapPartitionsRDD[3] at localCheckpoint "
        "at NativeMethodAccessorImpl.java:0, ExistingRDD"
    )
    new = (
        "Arguments: [id#23L], MapPartitionsRDD[17] at localCheckpoint "
        "at <unknown>:0, ExistingRDD"
    )
    assert normalize(old) == normalize(new)


def test_ordinary_lists_stay_order_sensitive():
    # no gid on the line -> element order is load-bearing (sort keys,
    # literal arrays) and must NOT be canonicalized away
    a = "Arguments: [x#1L ASC NULLS FIRST, y#2L ASC NULLS FIRST]"
    b = "Arguments: [y#2L ASC NULLS FIRST, x#1L ASC NULLS FIRST]"
    assert normalize(a) != normalize(b)


def test_literal_arrays_keep_their_integers():
    # bare ints are blanked ONLY inside gid-bearing lines' brackets
    a = "Arguments: [1, 2, 3]"
    b = "Arguments: [1, 2, 4]"
    assert normalize(a) != normalize(b)


def test_literal_change_beside_the_gid_still_flags():
    # ADVICE r13: only the TRAILING gid slot of an Expand row is
    # blanked — a genuine constant change elsewhere in the row must
    # still read CHANGED (blanking every bare int hid it)
    a = "Arguments: [[g#201L, 5, 2]], [g#210L, gid#209]"
    b = "Arguments: [[g#201L, 7, 2]], [g#210L, gid#209]"
    assert normalize(a) != normalize(b)
    # while the trailing gid value itself stays neutralized
    c = "Arguments: [[g#201L, 5, 9]], [g#210L, gid#209]"
    assert normalize(a) == normalize(c)


def test_non_trailing_gid_value_shards_neutralize():
    # Round-14 sweep FP (table_profile): once the innermost-out sort
    # shears a deeply nested Expand row apart, gid VALUES surface as
    # non-trailing bare ints and bracket shards ("6," / "[4, [5]") that
    # renumber between builds. They must blank — the value set is read
    # off the plan's own gid filters.
    a = (
        "Functions: [count(1) FILTER (WHERE (gid#100 = 4)), "
        "count(1) FILTER (WHERE (gid#100 = 5)), "
        "count(1) FILTER (WHERE (gid#100 = 6))]\n"
        "Arguments: [x) as bigint), 6, [0, [4, [5], gid#100]"
    )
    b = (
        "Functions: [count(1) FILTER (WHERE (gid#200 = 4)), "
        "count(1) FILTER (WHERE (gid#200 = 5)), "
        "count(1) FILTER (WHERE (gid#200 = 6))]\n"
        "Arguments: [x) as bigint), 4, [0, [5, [6], gid#200]"
    )
    assert normalize(a) == normalize(b)
    # ...but an integer OUTSIDE the gid value set still flags
    c = a.replace(" 6, [0,", " 7, [0,")
    assert normalize(a) != normalize(c)


def test_trailing_literal_outside_gid_set_flags():
    # Self-review r14: the trailing-slot blank must require membership
    # in the harvested gid value set — a genuine constant that merely
    # SITS last in a bracketed list on a gid-bearing line flags.
    a = (
        "Functions: [count(1) FILTER (WHERE (gid#100 = 4))]\n"
        "Arguments: [[a#1, b#2, 99], gid#100]"
    )
    b = a.replace("99", "98")
    assert normalize(a) != normalize(b)
    # the actual gid trailing slot (value IN the set) still neutralizes
    g1 = (
        "Functions: [count(1) FILTER (WHERE (gid#100 = 4))]\n"
        "Arguments: [[a#1, b#2, 4], gid#100]"
    )
    g2 = g1.replace("#100", "#200")
    assert normalize(g1) == normalize(g2)
