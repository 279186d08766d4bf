"""Local mirror of the driver's correctness gate (CLI).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from bigdata_2025_1_spark.oracle import check_query, connect_oracle  # noqa: E402
from bigdata_2025_1_spark.registry import all_oracles, all_queries  # noqa: E402
from bigdata_2025_1_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    queries = all_queries()
    oracles = all_oracles()
    spark = get_spark("selfcheck", master="local[8]")
    con = connect_oracle(sf_dir)

    failures = []
    n_run = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        n_run += 1
        try:
            problems = check_query(spark, con, fn, oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            problems = [f"error: {e}"]
        finally:
            # queries that persist() intermediates (LSH signatures etc.)
            # cannot unpersist before the caller's action — drop their
            # cached blocks between queries
            spark.catalog.clearCache()
        if problems:
            print(f"FAIL  {name}: {problems[0]}")
            for p in problems[1:]:
                print(f"      {p}")
            failures.append(name)
        elif name not in oracles:
            print(f"ok*   {name}: rows-only (no oracle)")
        else:
            print(f"ok    {name}")

    print()
    print(f"{n_run - len(failures)}/{n_run} queries pass; failures: {failures or 'none'}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
