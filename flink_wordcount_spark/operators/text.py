"""Tokenization and word counting (reference-parity semantics).

Reference behavior being re-expressed (citations into /root/reference):
- Tokenizer splits sentences on the regex ``\\W+`` and drops empty tokens
  (src/main/java/flinkwordcount/StatefulWordCount.java:118-121); it does NOT
  lowercase. ``"don't"`` -> ``["don", "t"]``.
- CountWords keeps a per-word running total, summed with plain addition
  (StatefulWordCount.java:160, Count.reduce at :173-179). In batch this is
  exactly ``groupBy(word).count()``.

Spark-first notes: explode+split+filter+groupBy stays entirely in built-in
expressions -> whole-stage codegen; the groupBy plans a partial (map-side)
aggregation before the hash exchange, so the shuffle carries one row per
distinct word per partition, not one per token. At 100 TB the distinct-word
domain is small relative to token count, so this partial-agg reduction is the
whole ballgame; AQE coalesces the post-shuffle side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Reference tokenizer regex (StatefulWordCount.java:118).
TOKEN_SPLIT_REGEX = r"\W+"

#: The SAME tokenizer as a DuckDB SQL snippet — the single source of truth
#: every oracle interpolates (review r07: four hand-written copies meant a
#: token-split change had four places to miss).  Mirrors TOKEN_SPLIT_REGEX +
#: the drop-empties rule exactly.
TOKS_SQL = "list_filter(regexp_split_to_array(text, '\\W+'), x -> length(x) > 0)"

#: Per-row word-trigram array as a DuckDB SQL snippet — the single oracle
#: definition of the trigram window (review r08: the block was hand-copied
#: in two oracles).  NULL text propagates NULL; <3 tokens yields [].
TRIGRAMS_SQL = (
    f"list_transform(generate_series(1, len({TOKS_SQL}) - 2), "
    f"i -> {TOKS_SQL}[i] || ' ' || {TOKS_SQL}[i+1] || ' ' || {TOKS_SQL}[i+2])"
)


def tokenize(df: DataFrame, text_col: str = "text", out_col: str = "word") -> DataFrame:
    """One output row per non-empty ``\\W+``-separated token; other columns kept."""
    return df.select(
        "*", F.explode(F.split(F.col(text_col), TOKEN_SPLIT_REGEX)).alias(out_col)
    ).filter(F.length(out_col) > 0)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, cnt)`` — the batch equivalent of the reference's running count."""
    return (
        tokenize(df.select(text_col), text_col=text_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def top_k_words(df: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """Top-k words by count, ties broken by word for determinism."""
    return word_counts(df, text_col).orderBy(F.desc("cnt"), F.asc("word")).limit(k)


def token_count_expr(text_col: str = "text") -> Column:
    """Token count per row without exploding (size of the split array)."""
    arr = F.split(F.col(text_col), TOKEN_SPLIT_REGEX)
    return F.size(F.filter(arr, lambda w: F.length(w) > 0))


def shingle_pair_cte_sql(n: int, rel: str = "documents") -> str:
    """The toks/sh/sizes/shared CTE chain over ``rel`` — the DuckDB twin of
    :func:`operators.dedup.shingles` + the inverted-index pair join, emitted
    as the CTE body every near-dup oracle interpolates after ``WITH``
    (review r08: the block was hand-copied in four oracles, so a
    shingle-bound or tokenizer change had four more places to miss; this is
    the SQL-side analog of the TOKS_SQL rule above).  Exposes CTEs ``sh``
    (distinct doc shingles), ``sizes`` (shingle count per doc) and
    ``shared`` (co-shingle counts per id-ordered doc pair)."""
    return f"""toks AS (
    SELECT doc_id, {TOKS_SQL} AS t
    FROM {rel}
), sh AS (
    SELECT DISTINCT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS s
    FROM toks, unnest(range(1, len(t) - {n - 2})) AS u(i)
), sizes AS (
    SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), shared AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
    FROM sh a JOIN sh b USING (s)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
)"""


#: The Jaccard score as a DuckDB SQL expression over the builder's
#: shared/sizes aliases — the SINGLE definition (review r08 second pass: the
#: round/denominator convention lived in four oracle copies; a rounding
#: tweak had four places to miss).
JACCARD_SCORE_SQL = "round(n_shared / (x.n + y.n - n_shared), 6)"


def jaccard_pairs_cte_sql(threshold: float) -> str:
    """The ``pairs`` CTE (id-ordered near-dup pairs at ``threshold`` Jaccard)
    over :func:`shingle_pair_cte_sql`'s ``shared``/``sizes`` — appended with
    a leading ``, `` by the oracles that consume the pair SET rather than
    the scored pairs."""
    return f"""pairs AS (
    SELECT id_a, id_b
    FROM shared JOIN sizes x ON x.doc_id = id_a JOIN sizes y ON y.doc_id = id_b
    WHERE {JACCARD_SCORE_SQL} >= {threshold}
)"""
