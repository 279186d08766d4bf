"""Plan-shape regression harness (explain-diff): compare the NORMALIZED
formatted physical plan of registered queries between a git ref (old
code) and the working tree, in one session — the plan-level counterpart
of tools/ab.py (VERDICT r9 ask #2's explain()-diff candidate).

Plans are deterministic, so unlike ab.py there is no run-to-run noise
and ``--ref HEAD`` (the default) is the meaningful "did my uncommitted
edit silently change any plan?" check. Normalization strips expression
ids, plan ids, statistics, and file paths; what remains is the shape a
scale review cares about — node kinds, join strategies, exchange
placement, pushed filters.

Usage:
    python tools/plandiff.py [--ref REF] [--sf DIR] [--full] query ...
    python tools/plandiff.py --all            # every registered query

Exit status: 0 = all plans unchanged, 1 = at least one differs (so CI
or a pre-commit hook can gate on it).
"""

from __future__ import annotations

import argparse
import difflib
import re
import sys

sys.path.insert(0, "/root/repo")

import bigdata_2025_1_spark.registry as R
from bigdata_2025_1_spark.plans.explain import formatted_plan
from bigdata_2025_1_spark.session import get_spark
from tools.ab import load_old, module_path

_NOISE = [
    (re.compile(r"#\d+L?"), "#_"),
    (re.compile(r"plan_id=\d+"), "plan_id=_"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics(_)"),
    (re.compile(r"file:[^\s\],)]+"), "file:_"),
    (re.compile(r"\[id=[^\]]*\]"), "[id=_]"),
    (re.compile(r"cteId=\d+"), "cteId=_"),
    (re.compile(r"exprId=\d+"), "exprId=_"),
    (re.compile(r"Location: \S+"), "Location: _"),
    (re.compile(r"subquery\d+"), "subquery_"),
    # lambda-variable ids (x_8, y_3, ...) come from a SESSION-GLOBAL
    # counter — same expression, different numbers per invocation
    (re.compile(r"\b([a-z])_\d+#"), r"\1_#"),
]


def normalize(plan: str) -> str:
    for pat, rep in _NOISE:
        plan = pat.sub(rep, plan)
    return "\n".join(ln.rstrip() for ln in plan.splitlines())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="HEAD", help="git ref for the OLD side")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--full", action="store_true", help="print unified diffs")
    ap.add_argument("--all", action="store_true", help="diff every query")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark("plandiff", master="local[8]", shuffle_partitions=8)
    R.load_all()
    new = dict(R.all_queries())
    names = list(new) if args.all else args.queries
    missing = [q for q in names if q not in new]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 2
    if not names:
        print("no queries given (use --all or list names)", file=sys.stderr)
        return 2
    targets = {q: module_path(new[q]) for q in names}
    old = load_old(args.ref, targets)
    changed = []
    for q in names:
        spark.catalog.clearCache()
        try:
            p_old = normalize(formatted_plan(old[q](spark, args.sf)))
        except Exception as e:  # noqa: BLE001 — old code may predate a query
            print(f"{q}: OLD side failed to plan ({e.__class__.__name__}) — new query?")
            continue
        spark.catalog.clearCache()
        p_new = normalize(formatted_plan(new[q](spark, args.sf)))
        if p_old == p_new:
            print(f"{q}: unchanged")
            continue
        changed.append(q)
        print(f"{q}: PLAN CHANGED vs {args.ref}")
        if args.full:
            sys.stdout.writelines(
                difflib.unified_diff(
                    p_old.splitlines(keepends=True),
                    p_new.splitlines(keepends=True),
                    fromfile=f"{q}@{args.ref}",
                    tofile=f"{q}@worktree",
                )
            )
            print()
    print(f"\n{len(changed)}/{len(names)} plans changed"
          + (f": {', '.join(changed)}" if changed else ""))
    return 1 if changed else 0


if __name__ == "__main__":
    raise SystemExit(main())
