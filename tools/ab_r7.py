"""One-off A/B for the round-7 plan changes (bench.py discipline:
old-vs-new interleaved in ONE session, clearCache between runs,
best-of-4 at sf0.1). Old code is exec'd from git HEAD with the @query
decorator stubbed so nothing re-registers."""

from __future__ import annotations

import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import bigdata_2025_1_spark.registry as R
from bigdata_2025_1_spark.session import get_spark

MODS = {
    "relational": "bigdata_2025_1_spark/operators/relational.py",
    "corpus_ops": "bigdata_2025_1_spark/operators/corpus_ops.py",
    "similarity": "bigdata_2025_1_spark/operators/similarity.py",
    "text_analysis": "bigdata_2025_1_spark/operators/text_analysis.py",
}
TARGETS = {
    "supplier_shipping_latency": "relational",
    "bpe_merge_sequence": "corpus_ops",
    "pca_power_iteration": "similarity",
    "naive_bayes_source_classifier": "text_analysis",
}


def load_old():
    orig = R.query
    R.query = lambda name, oracle=None: (lambda fn: fn)
    out = {}
    try:
        for mod, path in MODS.items():
            src = subprocess.run(
                ["git", "-C", "/root/repo", "show", f"HEAD:{path}"],
                capture_output=True, text=True, check=True,
            ).stdout
            ns = {"__name__": f"old_{mod}"}
            exec(compile(src, f"old_{mod}.py", "exec"), ns)
            for q, m in TARGETS.items():
                if m == mod:
                    out[q] = ns[q]
    finally:
        R.query = orig
    return out


def main():
    sf = "/root/testdata/sf0.1"
    spark = get_spark("ab-r7", master="local[32]")
    # load the CURRENT registry first: old modules do module-level
    # QUERIES lookups (retrieval compositions) that must resolve
    R.load_all()
    new = dict(R.all_queries())
    old = load_old()
    for q in TARGETS:
        best = {"old": 1e9, "new": 1e9}
        for _ in range(4):
            for tag, fn in (("old", old[q]), ("new", new[q])):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                fn(spark, sf).collect()
                best[tag] = min(best[tag], time.monotonic() - t0)
        print(f"{q}: old {best['old']:.2f} s -> new {best['new']:.2f} s")


if __name__ == "__main__":
    main()
