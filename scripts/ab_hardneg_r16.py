#!/usr/bin/env python3
"""Interleaved A/B: embed_hard_negatives old vs score-once rewrite (r16).

OLD shape: symmetrize CANDIDATES (unionAll) -> join vectors on both sides of
each directed pair -> interpreted cosine per DIRECTED pair (2x per unordered
pair, and the union duplicates the whole candidate pipeline in the physical
plan — 0 reused exchanges in plans/r15/embed_hard_negatives_ab1m.txt) ->
window row_number argmax.

NEW shape (guide §2.3 shuffle/compute less + §2.5 partial aggregation):
score each UNORDERED pair once, symmetrize the thin scored rows with
explode(array(struct,struct)) (one pass, no plan duplication), and take the
per-anchor argmax with max(struct(cos_sim, -negative_id, ...)) — a
partial-aggregable groupBy instead of a sort-based window.

Usage: python scripts/ab_hardneg_r16.py <out.json> [--sf1] [passes]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession, functions as F

from bench import build_sf1, materialize  # noqa: E402
from flink_wordcount_spark.plans import QUERIES  # noqa: E402
from flink_wordcount_spark.plans.similarity_q import (  # noqa: E402
    _BITS,
    _MAX_BUCKET,
    _N_TABLES,
    _emb_nn,
)
from flink_wordcount_spark.operators.similarity import (  # noqa: E402
    as_double,
    dot,
    norm,
    rhp_buckets,
    rhp_candidate_pairs,
)
from flink_wordcount_spark.hints import maybe_broadcast  # noqa: E402
from flink_wordcount_spark.session import get_spark  # noqa: E402


def cpu_totals() -> tuple[int, int]:
    parts = Path("/proc/stat").read_text().splitlines()[0].split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def new_shape(spark: SparkSession, sf_dir: str, unroll: int | None = None) -> DataFrame:
    emb = _emb_nn(spark, sf_dir)
    cands = rhp_candidate_pairs(
        rhp_buckets(emb, _N_TABLES, _BITS), max_bucket_size=_MAX_BUCKET
    )
    e = emb.select(
        F.col("vec_id").alias("id"),
        "label",
        as_double(F.col("embedding")).alias("v"),
    ).withColumn("n", norm(F.col("v"), unroll))
    xa = e.withColumnsRenamed({"id": "id_a", "label": "la", "v": "va", "n": "na"})
    xb = e.withColumnsRenamed({"id": "id_b", "label": "lb", "v": "vb", "n": "nb"})
    scored = (
        cands.join(maybe_broadcast(xa), "id_a")
        .join(maybe_broadcast(xb), "id_b")
        .filter(F.col("la") != F.col("lb"))
        .select(
            "id_a",
            "la",
            "id_b",
            "lb",
            F.round(
                dot(F.col("va"), F.col("vb"), unroll)
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos_sim"),
        )
    )
    sym = scored.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("anchor"),
                    F.col("la").alias("anchor_label"),
                    F.col("id_b").alias("negative_id"),
                    F.col("lb").alias("negative_label"),
                ),
                F.struct(
                    F.col("id_b").alias("anchor"),
                    F.col("lb").alias("anchor_label"),
                    F.col("id_a").alias("negative_id"),
                    F.col("la").alias("negative_label"),
                ),
            )
        ).alias("s"),
        "cos_sim",
    ).select("s.*", "cos_sim")
    best = sym.groupBy("anchor", "anchor_label").agg(
        F.max(
            F.struct(
                F.col("cos_sim"),
                (-F.col("negative_id")).alias("neg_id_inv"),
                F.col("negative_id"),
                F.col("negative_label"),
            )
        ).alias("b")
    )
    return best.select(
        F.col("anchor").alias("vec_id"),
        "anchor_label",
        F.col("b.negative_id").alias("negative_id"),
        F.col("b.negative_label").alias("negative_label"),
        F.col("b.cos_sim").alias("cos_sim"),
    )


def main() -> int:
    out_path = Path(sys.argv[1])
    with_sf1 = "--sf1" in sys.argv
    passes = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 4

    spark = get_spark("ab_hardneg_r16")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["wordcount_stats"](spark, "/root/testdata/sf0.1").collect()

    dirs = {"sf01": "/root/testdata/sf0.1"}
    if with_sf1:
        dirs["sf1"] = build_sf1(spark)

    from flink_wordcount_spark.operators.similarity import EMB_DIM

    arms = {
        "old": lambda d: QUERIES["embed_hard_negatives"](spark, d),
        "new_fold": lambda d: new_shape(spark, d, None),
        "new": lambda d: new_shape(spark, d, EMB_DIM),
    }

    # Result equality check first (collect + compare, both scales).
    for tag, d in dirs.items():
        rows_old = sorted(map(tuple, arms["old"](d).collect()))
        for arm in arms:
            if arm == "old":
                continue
            rows_arm = sorted(map(tuple, arms[arm](d).collect()))
            assert rows_old == rows_arm, (
                f"MISMATCH {arm} at {tag}: {len(rows_old)} vs {len(rows_arm)}"
            )
        print(f"{tag}: all arms identical ({len(rows_old)} rows)", flush=True)

    results: dict = {t: {a: [] for a in arms} for t in dirs}
    for p in range(passes):
        order = list(arms) if p % 2 == 0 else list(reversed(list(arms)))
        for tag, d in dirs.items():
            for arm in order:
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"ab_hardneg:{tag}:{arm}:p{p}")
                t0, s0 = time.time(), cpu_totals()
                materialize(arms[arm](d))
                t1, s1 = time.time(), cpu_totals()
                tot = s1[0] - s0[0]
                results[tag][arm].append(
                    {
                        "sec": round(t1 - t0, 3),
                        "steal_pct": round(
                            100.0 * (s1[1] - s0[1]) / tot if tot else 0.0, 2
                        ),
                    }
                )
                print(f"p{p} {tag} {arm}: {results[tag][arm][-1]}", flush=True)

    summary = {}
    for tag in dirs:
        summary[tag] = {}
        for arm in arms:
            quiet = [r["sec"] for r in results[tag][arm] if r["steal_pct"] < 5.0]
            allv = [r["sec"] for r in results[tag][arm]]
            summary[tag][arm] = {
                "min_quiet": min(quiet) if quiet else None,
                "min_all": min(allv),
                "n_quiet": len(quiet),
            }
    out = {"passes": results, "summary": summary}
    out_path.write_text(json.dumps(out, indent=1))
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
