#!/usr/bin/env python3
"""Interleaved A/B for the r16 prefix-filtered exact Jaccard join.

Three arms, interleaved:
OLD: inverted-index self-join (every co-occurring pair shuffled, sum df²).
NEW (shipped): NATURAL-ORDER prefix filter -> candidate pairs -> exact
verify from per-doc sorted key arrays (operators/dedup._prefix_jaccard_pairs).
DF_ORDER (rejected): rarest-first prefixes — harder pruning, but pays a
corpus df aggregate + tag join.

Interleaved same-process min-of-N per config per scale, clearCache between
runs, noop-sink materialize (r15 discipline).  r16 addition: HOST STEAL
share recorded per pass (/proc/stat) — this box has bursty hypervisor
steal that produced the round's 60s phantom readings; quiet-min = min over
passes with steal < 5%.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame  # noqa: E402

from bench import build_sf1, materialize  # noqa: E402
from flink_wordcount_spark.io import table  # noqa: E402
from flink_wordcount_spark.operators.dedup import (  # noqa: E402
    jaccard_pairs,
    shingle_hashes,
)
from flink_wordcount_spark.session import get_spark  # noqa: E402


def cpu_totals() -> tuple[int, int]:
    parts = Path("/proc/stat").read_text().splitlines()[0].split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def df_order_prefix(sh: DataFrame, threshold: float) -> DataFrame:
    """The REJECTED df-ordered arm: rarest-first prefixes prune harder
    (probe: 254k vs ~1.2M prefix pair multiplicity at sf1) but pay a
    corpus-wide df aggregate + df tag join that the natural-order arm
    avoids entirely."""
    from flink_wordcount_spark.hints import maybe_broadcast
    from pyspark.sql import functions as F

    key = "h"
    t_eff = threshold - 1e-6
    dfreq = sh.groupBy(key).agg(F.count(F.lit(1)).alias("_df"))
    packed = (
        sh.join(dfreq, key)
        .groupBy("id")
        .agg(
            F.sort_array(F.collect_list(F.struct(F.col("_df"), F.col(key)))).alias("sk")
        )
    )
    n = F.size("sk")
    plen = (n - F.ceil(F.lit(t_eff) * n) + 1).cast("int")
    pref = packed.select(
        "id", F.explode(F.slice("sk", F.lit(1), plen)).alias("s")
    ).select("id", F.col(f"s.{key}").alias(key))
    cand = (
        pref.select(F.col("id").alias("id_a"), key)
        .join(pref.select(F.col("id").alias("id_b"), key), key)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sets = packed.select("id", F.transform("sk", lambda x: x[key]).alias("hs"))
    s = F.size(F.array_intersect("ha", "hb")).cast("bigint")
    sim = F.round(
        s / (F.size("ha").cast("bigint") + F.size("hb").cast("bigint") - s), 6
    )
    return (
        maybe_broadcast(cand)
        .join(sets.withColumnsRenamed({"id": "id_a", "hs": "ha"}), "id_a")
        .join(sets.withColumnsRenamed({"id": "id_b", "hs": "hb"}), "id_b")
        .select("id_a", "id_b", s.alias("n_shared"), sim.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def build(which: str, spark, sf_dir: str) -> DataFrame:
    sh = shingle_hashes(table(spark, sf_dir, "documents"), "text", "doc_id", n=3)
    if which == "df_order":
        return df_order_prefix(sh, 0.8)
    return jaccard_pairs(sh, 0.8, prefix=(which == "new"))


def main() -> int:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab_ngram_prefix_r16")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = build_sf1(spark)
    scales = {"sf01": "/root/testdata/sf0.1", "sf1": sf1}
    materialize(build("new", spark, scales["sf01"]))  # warm codegen path
    rows: dict[str, dict[str, list[dict]]] = {
        w: {s: [] for s in scales} for w in ("old", "new", "df_order")
    }
    for p in range(passes):
        for which in (("old", "new", "df_order") if p % 2 == 0 else ("df_order", "new", "old")):
            for tag, d in scales.items():
                spark.catalog.clearCache()
                tot0, st0 = cpu_totals()
                t0 = time.time()
                spark.sparkContext.setJobDescription(f"ab:{which}:{tag}:{p}")
                materialize(build(which, spark, d))
                wall = round(time.time() - t0, 3)
                spark.sparkContext.setJobDescription(None)
                tot1, st1 = cpu_totals()
                rows[which][tag].append(
                    {
                        "wall": wall,
                        "steal_pct": round(
                            100.0 * (st1 - st0) / max(1, tot1 - tot0), 2
                        ),
                    }
                )
                print(which, tag, rows[which][tag][-1], flush=True)
    out: dict = {}
    for which, per in rows.items():
        out[which] = {}
        for tag, rs in per.items():
            quiet = [r["wall"] for r in rs if r["steal_pct"] < 5.0]
            out[which][tag] = {
                "min": min(r["wall"] for r in rs),
                "min_quiet": min(quiet) if quiet else None,
                "passes": rs,
            }
        m0 = out[which]["sf01"]["min_quiet"]
        m1 = out[which]["sf1"]["min_quiet"]
        out[which]["warm_ratio_quiet"] = round(m1 / m0, 2) if m0 and m1 else None
    print(json.dumps(out, indent=1))
    Path("plans/r16/ab_ngram_prefix.json").write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
