"""Similarity-search query surface over ``embeddings``.

- ``embed_cosine_topk``: exact brute-force top-k, oracle-checked against
  DuckDB ``list_cosine_similarity`` (both sides compute in float64 and rank
  AFTER rounding to 6 decimals so ordering is engine-neutral).
- ``lsh_ivf_topk``: IVF-pruned approximate top-k (deterministic centroids),
  rows-only (approximate results are parameter-shaped, not SQL semantics).
- ``embed_norm_stats``: vector arithmetic sanity surface, oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..operators.similarity import (
    as_double,
    brute_force_topk,
    cosine_pairs,
    dot,
    ivf_topk,
    norm,
    rhp_buckets,
    rhp_candidate_pairs,
)
from .catalog import query

_N_QUERIES = 10
_K = 5


@query(
    "embed_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id,
               round(list_cosine_similarity(qv, cv), 6) AS cos_sim
        FROM q CROSS JOIN c WHERE neighbor_id != query_id
    ), ranked AS (
        SELECT query_id, neighbor_id, cos_sim,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {_K}
    """,
)
def embed_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: brute-force cosine top-{k} for 10 query vectors."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return brute_force_topk(emb, queries, k=_K).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


@query("lsh_ivf_topk")  # rows-only: approximate (recall depends on nprobe)
def lsh_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned top-k: centroids = every 50th vector (deterministic),
    nprobe=3 cells per query. The 100 TB path: corpus stored partitioned by
    cell_id -> per-query partition pruning instead of a full scan."""
    emb = table(spark, sf_dir, "embeddings")
    centroids = (
        emb.filter(F.col("vec_id") % 50 == 0)
        .select((F.col("vec_id") / 50).cast("int").alias("cell_id"), "embedding")
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(emb, queries, centroids, k=_K, nprobe=3).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


_DUP_T = 0.45


@query(
    "dedup_embed_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM e a CROSS JOIN e b
    WHERE a.vec_id < b.vec_id
      AND round(list_cosine_similarity(a.v, b.v), 6) >= {_DUP_T}
    """,
)
def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact all-pairs baseline (the dedup
    method the LSH path verifies against)."""
    emb = table(spark, sf_dir, "embeddings")
    return cosine_pairs(emb, _DUP_T)


@query("lsh_cosine_candidates")  # rows-only: recall is (tables, bits)-shaped
def lsh_cosine_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH near-dup path: signed-projection buckets ->
    in-bucket candidate pairs -> exact cosine verification. The 100 TB shape:
    the O(n²) compare runs only inside (table, bucket) groups."""
    emb = table(spark, sf_dir, "embeddings")
    cands = rhp_candidate_pairs(rhp_buckets(emb))
    # norm is per-vector, so compute it once before the pair join instead of
    # twice per candidate pair; dot/(na*nb) is the same float arithmetic as
    # cosine(), so cos_sim values are bit-identical
    e = emb.select(
        F.col("vec_id").alias("id"), as_double(F.col("embedding")).alias("v")
    ).withColumn("n", norm(F.col("v")))
    va = e.withColumnsRenamed({"id": "id_a", "v": "va", "n": "na"})
    vb = e.withColumnsRenamed({"id": "id_b", "v": "vb", "n": "nb"})
    return (
        cands.join(F.broadcast(va), "id_a")
        .join(F.broadcast(vb), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= _DUP_T)
        .orderBy("id_a", "id_b")
    )


@query(
    "embed_norm_stats",
    oracle="""
    SELECT label,
           count(*) AS n,
           round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                  x -> x * x)))), 4) AS avg_norm,
           CAST(min(len(embedding)) AS INTEGER) AS dim_min,
           CAST(max(len(embedding)) AS INTEGER) AS dim_max
    FROM embeddings GROUP BY label
    """,
)
def embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector stats: L2 norm mean + dimensionality bounds."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(norm(as_double(F.col("embedding")))), 4).alias("avg_norm"),
        F.min(F.size("embedding")).alias("dim_min"),
        F.max(F.size("embedding")).alias("dim_max"),
    )
