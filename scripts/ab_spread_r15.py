#!/usr/bin/env python3
"""Interleaved same-process A/B: spread() active vs identity, per query.

Patches every module-level binding of hints.spread. DAG is rebuilt per pass,
so the toggle changes the plan each time. Prints min-of-N per config.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import materialize  # noqa: E402
from flink_wordcount_spark import hints  # noqa: E402
from flink_wordcount_spark.operators import dedup as op_dedup  # noqa: E402
from flink_wordcount_spark.operators import similarity as op_sim  # noqa: E402
from flink_wordcount_spark.plans import QUERIES  # noqa: E402
from flink_wordcount_spark.plans import dedup_q, similarity_q, textstats_q  # noqa: E402
from flink_wordcount_spark.session import get_spark  # noqa: E402

MODS = [hints, op_dedup, op_sim, dedup_q, similarity_q, textstats_q]
REAL = hints.spread
IDENT = lambda df, *a, **k: df  # noqa: E731


def set_spread(fn):
    for m in MODS:
        m.spread = fn


NAMES = sys.argv[1].split(",")
SF = "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark("ab_spread")
spark.sparkContext.setLogLevel("ERROR")
QUERIES["wordcount_stats"](spark, SF).collect()  # warm

out = {}
for name in NAMES:
    t = {"spread": [], "nospread": []}
    for r in range(ROUNDS):
        for tag, fn in (("spread", REAL), ("nospread", IDENT)):
            set_spread(fn)
            spark.catalog.clearCache()
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"ab:{name}:{tag}:{r}")
            materialize(QUERIES[name](spark, SF))
            t[tag].append(round(time.time() - t0, 3))
    set_spread(REAL)
    out[name] = {k: {"min": min(v), "runs": v} for k, v in t.items()}
    d = out[name]["spread"]["min"] - out[name]["nospread"]["min"]
    print(f"{name:30s} spread {out[name]['spread']['min']:6.3f}  nospread {out[name]['nospread']['min']:6.3f}  delta {d:+6.3f}", flush=True)

print(json.dumps(out))
spark.stop()
