#!/usr/bin/env python3
"""Stage-level dissection of embed_hard_negatives (r16, guide §1/§7.2).

The sf1 sweep flagged it as the repo's largest ABSOLUTE cost (36.8 s min at
sf0.1, 73 s at sf1 — vs 3.1 s for dedup_embed_cosine which shares the
candidate stage).  This probe times each pipeline stage as its own action
(noop-materialized, clearCache between) with per-pass /proc/stat steal
shares, at sf0.1 and optionally sf1.

Usage: python scripts/probe_hardneg_r16.py <out.json> [--sf1] [passes]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build_sf1, materialize  # noqa: E402
from flink_wordcount_spark.plans import QUERIES  # noqa: E402
from flink_wordcount_spark.plans.similarity_q import (  # noqa: E402
    _BITS,
    _MAX_BUCKET,
    _N_TABLES,
    _emb_nn,
)
from flink_wordcount_spark.operators.similarity import (  # noqa: E402
    rhp_buckets,
    rhp_candidate_pairs,
)
from flink_wordcount_spark.session import get_spark  # noqa: E402


def cpu_totals() -> tuple[int, int]:
    parts = Path("/proc/stat").read_text().splitlines()[0].split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def timed(fn):
    t0, s0 = time.time(), cpu_totals()
    out = fn()
    t1, s1 = time.time(), cpu_totals()
    tot = s1[0] - s0[0]
    steal_pct = 100.0 * (s1[1] - s0[1]) / tot if tot else 0.0
    return round(t1 - t0, 3), round(steal_pct, 2), out


def main() -> int:
    out_path = Path(sys.argv[1])
    with_sf1 = "--sf1" in sys.argv
    passes = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 2

    spark = get_spark("probe_hardneg_r16")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["wordcount_stats"](spark, "/root/testdata/sf0.1").collect()

    dirs = {"sf01": "/root/testdata/sf0.1"}
    if with_sf1:
        dirs["sf1"] = build_sf1(spark)

    results: dict = {}
    for tag, d in dirs.items():
        r: dict = {}

        def stage(name, fn):
            runs = []
            for _ in range(passes):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"hardneg:{tag}:{name}")
                sec, steal, out = timed(fn)
                runs.append({"sec": sec, "steal_pct": steal})
                if out is not None:
                    runs[-1]["n"] = out
            r[name] = runs
            print(f"{tag} {name}: {runs}", flush=True)

        emb = _emb_nn(spark, d)
        cands = rhp_candidate_pairs(
            rhp_buckets(emb, _N_TABLES, _BITS), max_bucket_size=_MAX_BUCKET
        )
        stage("cand_count", lambda: cands.count())
        stage("full_query", lambda: materialize(QUERIES["embed_hard_negatives"](spark, d)))
        results[tag] = r

    out_path.write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
