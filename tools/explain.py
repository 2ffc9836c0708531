"""Dump the physical plan of one or more named queries.

Usage:
    python tools/explain.py <query_name> [more names...] [--sf DIR]

Prints ``explain("formatted")`` output — the artifact to review for
pushed filters (PushedFilters), column pruning (ReadSchema), join
strategy (BroadcastHashJoin vs SortMergeJoin vs *NestedLoop*), partial
aggregation, and exchange count. The plan-quality regression suite
(tests/test_plans.py) pins the properties that must not rot; this CLI
is for eyeballing new queries while writing them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineer_project_spark.queries import QUERIES  # noqa: E402
from data_engineer_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf":
            sf_dir = sys.argv[1:][i + 1]
            args.remove(sf_dir) if sf_dir in args else None
    if not args:
        print(__doc__)
        print("known queries:", ", ".join(sorted(QUERIES)))
        raise SystemExit(2)

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args:
        matches = [q for q in QUERIES if q == name or q.startswith(name)]
        if not matches:
            print(f"no query matches {name!r}")
            continue
        for m in matches:
            print(f"\n{'=' * 70}\n{m}\n{'=' * 70}")
            df = QUERIES[m].fn(spark, sf_dir)
            df.explain("formatted")


if __name__ == "__main__":
    main()
