"""Text-analysis query surface over ``documents`` (all oracle-checked).

The oracle SQL is generated from the same STOPWORDS/BPE constants the Spark
operators use, so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..operators.textstats import (
    BPE_REGEX,
    FNV_MOD,
    STOPWORDS,
    fingerprint,
    lang_predict,
    lang_scores,
    quality_features,
    token_counts,
)
from .catalog import query

_TOKS = "list_filter(regexp_split_to_array(text, '\\W+'), x -> length(x) > 0)"


def _score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"CAST(len(list_filter({_TOKS}, w -> list_contains([{words}], lower(w)))) "
        f"AS INTEGER)"
    )


def _langid_oracle() -> str:
    langs = sorted(STOPWORDS)
    scores = ",\n           ".join(f"{_score_sql(lg)} AS score_{lg}" for lg in langs)
    best = f"greatest({', '.join('score_' + lg for lg in langs)})"
    case = " ".join(f"WHEN score_{lg} = {best} THEN '{lg}'" for lg in langs)
    return f"""
    WITH scored AS (SELECT doc_id, lang AS lang_actual, {scores} FROM documents)
    SELECT doc_id, lang_actual, {', '.join('score_' + lg for lg in langs)},
           CASE {case} END AS lang_pred
    FROM scored
    """


@query("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-frequency language ID with deterministic alphabetical
    tie-break (argmax over per-language hit counts)."""
    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", F.col("lang").alias("lang_actual"), *lang_scores("text")
    )
    return scored.withColumn("lang_pred", lang_predict())


@query(
    "text_quality",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               length(text) AS n_chars_m,
               len({_TOKS}) AS n_toks,
               len(list_filter({_TOKS},
                   w -> list_contains([{', '.join(repr(w) for w in STOPWORDS['en'])}], lower(w)))) AS n_stop,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
               length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS n_punct,
               list_sum(list_transform({_TOKS}, w -> length(w))) AS tok_chars
        FROM documents
    )
    SELECT doc_id,
           CAST(n_chars_m AS BIGINT) AS n_chars_m,
           CAST(n_toks AS BIGINT) AS n_tokens,
           tok_chars / greatest(n_toks, 1) AS mean_tok_len,
           n_stop / greatest(n_toks, 1) AS stop_ratio,
           n_digits / greatest(n_chars_m, 1) AS digit_ratio,
           n_punct / greatest(n_chars_m, 1) AS punct_ratio,
           least(n_toks / 400.0, 1.0) * 0.4
               + (n_stop / greatest(n_toks, 1)) * 0.3
               + (1 - n_punct / greatest(n_chars_m, 1)) * 0.2
               + (1 - n_digits / greatest(n_chars_m, 1)) * 0.1 AS quality_score
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality features + composite score (filtering surface for
    training-data curation)."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", *quality_features("text"))


@query(
    "text_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, ' +'), w -> length(w) > 0)) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_REGEX}')) AS BIGINT) AS bpe_tokens
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts (cost estimation surface)."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", *token_counts("text"))


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(0::BIGINT,
                   list_transform({_TOKS},
                                  w -> (ascii(w) * 7 + length(w))::BIGINT)),
               (h, x) -> (h * 31 + x) % {FNV_MOD}) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial document fingerprint (order-sensitive, exact in
    both engines via bigint modular arithmetic)."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fp"))
