#!/usr/bin/env python3
"""Dump .explain('formatted') for the r16-touched queries in ONE sweep.

VERDICT r15 #5: regenerate every dump from the closed tree in one scripted
sweep so the committed plans are audit-grade (the r15 mistake was a dump
committed mid-commit, before a later edit in the same commit changed the
plan).

Usage: python scripts/dump_plans_r16.py <suffix> <out_dir> [names...]
  suffix:  'before' (run from the r15-close worktree) or 'after' (HEAD)
  out_dir: where to write plans/r16/<name>_<suffix>.txt
Run from the tree whose plans you want (cwd's repo is imported).
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path.cwd()))

DEFAULT = [
    "dedup_shared_spans_hashed",
    "dedup_shared_spans",
    "ev_rolling_active_users",
    "q5_local_supplier_volume",
]


def main() -> int:
    suffix = sys.argv[1]
    out_dir = Path(sys.argv[2])
    names = sys.argv[3:] or DEFAULT
    out_dir.mkdir(parents=True, exist_ok=True)

    from flink_wordcount_spark.plans import QUERIES
    from flink_wordcount_spark.session import get_spark

    spark = get_spark("dump_plans_r16")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"
    for name in names:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            QUERIES[name](spark, sf_dir).explain("formatted")
        text = buf.getvalue()
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(
            f"== {name} @ {sf_dir} — .explain('formatted'), {suffix} tree ==\n"
            + text
        )
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
