#!/usr/bin/env python3
"""Dump the formatted physical plan for any registered query.

Usage: python scripts/explain_query.py <query_name> [sf_dir] [--cpus N]

The plan-review workflow (SCALE.md / tests/test_plans_shape.py) in one
command: look for narrow ReadSchema, PushedFilters, partial_* aggregates
below each Exchange, TakeOrderedAndProject for top-k, broadcast joins on
dimension sides — and the absence of CartesianProduct / SinglePartition
stages over corpus-scaling inputs.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    cpus = 8
    if "--cpus" in args:
        i = args.index("--cpus")
        cpus = int(args[i + 1])
        del args[i : i + 2]
    if not args:
        print(__doc__)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    from flink_wordcount_spark.plans import QUERIES
    from flink_wordcount_spark.session import get_spark

    if name not in QUERIES:
        import difflib

        close = difflib.get_close_matches(name, QUERIES, n=5)
        print(f"unknown query {name!r}; did you mean: {close}")
        return 2
    spark = get_spark("explain", cpus=cpus)
    QUERIES[name](spark, sf_dir).explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
