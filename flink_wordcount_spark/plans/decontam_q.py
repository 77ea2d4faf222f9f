"""Corpus-curation queries: eval-set decontamination + boilerplate detection.

Two staples of a training-data pipeline the dedup family doesn't cover:

- ``decontam_eval_overlap``: flag training documents sharing word n-grams
  with a held-out eval split — the standard "did the benchmark leak into the
  training set" check (run before every pretraining job; at 100 TB the eval
  n-gram set is benchmark-sized and broadcastable, so the corpus is touched
  in ONE pass with a map-side hash join).
- ``text_ngram_boilerplate``: find n-grams repeated across many documents
  (navigation chrome, license headers, templated spam) and score each doc by
  its boilerplate fraction — C4-style repeated-line filtering generalized to
  n-grams.

Both reuse the shingling machinery from ``operators.dedup`` (reference parity:
the reference tokenizes with ``\\W+`` — StatefulWordCount.java:76 — and these
queries keep the same token split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..hints import maybe_broadcast
from ..io import table
from ..operators.dedup import shingles
from .catalog import query

# Deterministic pseudo eval split: doc_id % 10 == 7 (a real pipeline joins
# against the benchmark's own n-gram set; the modulus stands in for it so the
# query is self-contained on the fixture tables).
_EVAL_MOD, _EVAL_RES = 10, 7
_DECON_N = 4  # word n-gram size for contamination matching
_BOILER_N = 3
_BOILER_MIN_DOCS = 5  # a shingle in >= this many docs is boilerplate

from ..operators.text import TOKS_SQL as _TOKS  # shared tokenizer SQL


@query(
    "decontam_eval_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+{_DECON_N - 1}], ' ') AS s
        FROM toks, unnest(range(1, len(t) - {_DECON_N - 2})) AS u(i)
    ), ev AS (
        SELECT DISTINCT s FROM sh WHERE doc_id % {_EVAL_MOD} = {_EVAL_RES}
    )
    SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_eval_grams
    FROM sh JOIN ev USING (s)
    WHERE sh.doc_id % {_EVAL_MOD} <> {_EVAL_RES}
    GROUP BY sh.doc_id
    """,
)
def decontam_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing >= 1 word 4-gram with the eval split, with the
    count of distinct shared grams (the decision surface for drop/keep).

    Scale shape: the eval gram set (small side) is distinct-reduced and
    broadcast when under the threshold, so the full-corpus shingle stream
    joins map-side — one shuffle-free pass over the big side after shingling.
    """
    d = table(spark, sf_dir, "documents")
    sh = shingles(d, "text", "doc_id", n=_DECON_N)
    is_eval = (F.col("id") % _EVAL_MOD) == _EVAL_RES
    ev_grams = sh.filter(is_eval).select("shingle").distinct()
    return (
        sh.filter(~is_eval)
        .join(maybe_broadcast(ev_grams), "shingle")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_eval_grams"))
    )


@query(
    "text_ngram_boilerplate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+{_BOILER_N - 1}], ' ') AS s
        FROM toks, unnest(range(1, len(t) - {_BOILER_N - 2})) AS u(i)
    ), hot AS (
        SELECT s FROM sh GROUP BY s HAVING count(*) >= {_BOILER_MIN_DOCS}
    ), per_doc AS (
        SELECT doc_id, count(*) AS n_grams FROM sh GROUP BY doc_id
    ), boiler AS (
        SELECT doc_id, count(*) AS n_boiler FROM sh JOIN hot USING (s) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(b.n_boiler, 0) AS BIGINT) AS n_boiler,
           coalesce(b.n_boiler, 0) / CAST(greatest(coalesce(p.n_grams, 0), 1) AS DOUBLE)
               AS boiler_ratio
    FROM documents d
    LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    LEFT JOIN boiler b ON b.doc_id = d.doc_id
    """,
)
def text_ngram_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate fraction: share of the doc's distinct 3-grams
    that appear in >= {_BOILER_MIN_DOCS} documents corpus-wide.

    The ratio is raw IEEE division (never rounded: integer-quotient ratios
    land on exact decimal halves where engines' rounding modes diverge).
    The hot-gram set scales with *shared content*, not corpus size, and is
    size-gate broadcast; per-doc counts fold into one shuffle each.
    """
    d = table(spark, sf_dir, "documents")
    sh = shingles(d, "text", "doc_id", n=_BOILER_N)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= _BOILER_MIN_DOCS)
        .select("shingle")
    )
    per_doc = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    boiler = (
        sh.join(maybe_broadcast(hot), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    return (
        d.select("doc_id")
        .join(per_doc.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .join(boiler.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_boiler", F.lit(0)).cast("bigint").alias("n_boiler"),
            (
                F.coalesce("n_boiler", F.lit(0))
                / F.greatest(F.coalesce("n_grams", F.lit(0)), F.lit(1)).cast("double")
            ).alias("boiler_ratio"),
        )
    )


#: Semantic-contamination threshold: the fixture's near-dup embedding
#: clusters sit at cos >= 0.45 (same operating point as similarity_q._DUP_T);
#: real pipelines calibrate this against the eval benchmark's own paraphrase
#: distance.
_SEM_T = 0.45


@query(
    "decontam_semantic",
    oracle=f"""
    WITH ev AS (
        SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS evv
        FROM embeddings WHERE vec_id % {_EVAL_MOD} = {_EVAL_RES}
    ), tr AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS tvv
        FROM embeddings WHERE vec_id % {_EVAL_MOD} <> {_EVAL_RES}
    ), scored AS (
        SELECT tr.vec_id, eval_id,
               round(list_cosine_similarity(tvv, evv), 6) AS cos_sim
        FROM tr CROSS JOIN ev
    ), flagged AS (
        SELECT vec_id, eval_id, cos_sim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos_sim DESC, eval_id) AS rn
        FROM scored WHERE cos_sim >= {_SEM_T}
    )
    SELECT vec_id, eval_id, cos_sim FROM flagged WHERE rn = 1
    """,
)
def decontam_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic decontamination: flag training vectors whose
    embedding sits within cosine >= {_SEM_T} of ANY held-out eval vector —
    the paraphrase-leak check n-gram decontamination misses (a reworded
    benchmark question shares no 4-gram but lands next to it in embedding
    space).  Emits each contaminated vector with its nearest eval neighbor
    (ties -> min eval_id), the evidence row a curation run logs before
    dropping.

    Scale shape: same as decontam_eval_overlap — the eval side is
    benchmark-sized by design, so it broadcasts (size-gated) and the
    training corpus is scanned ONCE with no corpus shuffle; the only
    exchange is the per-flagged-vector argmax window, whose input is the
    (tiny) above-threshold pair set.  Both engines widen float32 -> float64
    before arithmetic and rank AFTER rounding to 6 decimals, the
    embed_cosine_topk convention."""
    from ..operators.similarity import as_double, dot, norm

    emb = table(spark, sf_dir, "embeddings")
    is_eval = (F.col("vec_id") % _EVAL_MOD) == _EVAL_RES
    ev = emb.filter(is_eval).select(
        F.col("vec_id").alias("eval_id"), as_double(F.col("embedding")).alias("evv")
    ).withColumn("evn", norm(F.col("evv")))
    tr = emb.filter(~is_eval).select(
        "vec_id", as_double(F.col("embedding")).alias("tvv")
    ).withColumn("tvn", norm(F.col("tvv")))
    scored = tr.crossJoin(maybe_broadcast(ev)).select(
        "vec_id",
        "eval_id",
        F.round(
            dot(F.col("tvv"), F.col("evv")) / (F.col("tvn") * F.col("evn")), 6
        ).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), "eval_id")
    return (
        scored.filter(F.col("cos_sim") >= _SEM_T)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "eval_id", "cos_sim")
    )
