"""A/B: eager localCheckpoint vs the retired until-clearCache persist on
the three rankops-prescribed sites (VERDICT r10 #5).

Variant A runs the committed code (``.localCheckpoint()`` at each site).
Variant B monkeypatches ``DataFrame.localCheckpoint`` to ``.persist()``,
which reproduces the pre-r11 code at the SAME call sites bit-for-bit (the
old code called ``.persist()`` exactly there).  Each variant runs every
query ``--reps`` times at the given sf dir with a cache clear between
runs; the per-query MIN (steady-state plan cost, same policy as the bench
suite's two-pass min) and all raw times are written to
``PERSIST_AB_r11.json`` so the retirement carries a measured verdict
instead of an assertion.

Usage: python scripts/persist_ab.py [sf_dir] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

QUERIES_UNDER_TEST = [
    "ev_user_value_deciles",
    "ev_rfm_segmentation",
    "qa_equi_depth_histogram",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.1"
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 3

    from pyspark.sql import DataFrame

    from flink_wordcount_spark.plans import QUERIES
    from flink_wordcount_spark.session import get_spark

    spark = get_spark("persist_ab")
    spark.sparkContext.setLogLevel("ERROR")

    real_local_checkpoint = DataFrame.localCheckpoint

    def run(variant: str) -> dict[str, list[float]]:
        if variant == "persist":
            DataFrame.localCheckpoint = lambda self, eager=True: self.persist()
        else:
            DataFrame.localCheckpoint = real_local_checkpoint
        try:
            out: dict[str, list[float]] = {q: [] for q in QUERIES_UNDER_TEST}
            for _ in range(reps):
                for q in QUERIES_UNDER_TEST:
                    t0 = time.time()
                    QUERIES[q](spark, sf_dir).collect()
                    out[q].append(round(time.time() - t0, 3))
                    spark.catalog.clearCache()
            return out
        finally:
            DataFrame.localCheckpoint = real_local_checkpoint

    # interleave variants per rep? No — run A fully then B, then A's first
    # rep is the JIT-cold one; use min-of-reps on both sides so warm-up
    # lands on neither variant's published number. B (persist) runs FIRST
    # so any residual JVM warmth favors the NEW code's competitor.
    b = run("persist")
    a = run("localCheckpoint")
    result = {
        "sf_dir": sf_dir,
        "reps": reps,
        "order": "persist variant first (residual warmth favors the old code's side)",
        "persist_sec": b,
        "local_checkpoint_sec": a,
        "min_persist": {q: min(v) for q, v in b.items()},
        "min_local_checkpoint": {q: min(v) for q, v in a.items()},
        "ratio_local_over_persist": {
            q: round(min(a[q]) / min(b[q]), 3) for q in QUERIES_UNDER_TEST
        },
    }
    out_path = Path(__file__).resolve().parents[1] / "PERSIST_AB_r11.json"
    out_path.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result["ratio_local_over_persist"]))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
