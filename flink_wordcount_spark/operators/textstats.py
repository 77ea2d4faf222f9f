"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All built-in expressions (codegen'd, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import TOKEN_SPLIT_REGEX

#: Small per-language stopword inventories for the n-gram/stopword heuristic.
#: (Real pipelines ship larger lists; the operator shape is identical.)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "fr": ("le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans"),
    "es": ("el", "la", "y", "de", "un", "una", "es", "que", "para", "en"),
    "de": ("der", "die", "das", "und", "ein", "eine", "ist", "zu", "von", "mit"),
    "zh": ("de", "shi", "le", "zai", "he", "you", "wo", "ta", "men", "bu"),
}

#: BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
#: Same RE2/Java-compatible pattern used on the oracle side.
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

FNV_MOD = 1_000_000_007


def tokens_arr(text_col: str = "text") -> Column:
    return F.filter(F.split(F.col(text_col), TOKEN_SPLIT_REGEX), lambda w: F.length(w) > 0)


def word_trigrams_from(toks: Column) -> Column:
    """Per-row word-trigram array ('a b c' strings) from an ALREADY-PROJECTED
    token-array column — the Spark twin of operators.text.TRIGRAMS_SQL
    (review r08: two hand-rolled copies had already drifted on the NULL
    branch).  NULL tokens (<=> NULL text: split/filter are NULL-propagating)
    -> NULL (the textstats family convention); <3 tokens -> [] (guarded
    explicitly: Spark's sequence(1, 0) is the DESCENDING [1, 0]).

    ``toks`` MUST be a materialized column reference (``F.col(...)`` over a
    prior ``.select(tokens_arr(...).alias(...))``), never the raw
    ``tokens_arr(...)`` expression: higher-order functions are interpreted
    (no codegen, no subexpression elimination inside the lambda), so a
    captured split+filter expression would re-tokenize the document once per
    element_at call — O(3·n²) per doc.  Measured at sf0.1:
    text_repetition_ratio 7.7 s -> 0.4 s from this restructure alone
    (r15 optimization round, guide §4.1)."""
    return (
        F.when(toks.isNull(), F.lit(None).cast("array<string>"))
        .when(
            F.size(toks) >= 3,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                    F.element_at(toks, i + 3),
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
    )


def lang_scores(text_col: str = "text") -> list[Column]:
    """One hit-count column per language: |tokens ∩ stopwords(lang)|, counting
    repeats (a real frequency heuristic, not just set overlap)."""
    toks = tokens_arr(text_col)
    cols = []
    for lang, words in STOPWORDS.items():
        wl = F.array(*[F.lit(w) for w in words])
        cols.append(
            F.size(F.filter(toks, lambda w: F.array_contains(wl, F.lower(w)))).alias(
                f"score_{lang}"
            )
        )
    return cols


def lang_predict() -> Column:
    """Argmax over the score_* columns; ties resolved alphabetically so the
    prediction is deterministic (and SQL-reproducible)."""
    pred = None
    # iterate langs in ascending alphabetical order: the FIRST branch of the
    # when-chain that equals the max wins, so ties resolve to the
    # alphabetically smallest language (must match the oracle's CASE order)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    for lang in langs:
        cond = F.col(f"score_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return pred


def quality_features(text_col: str = "text") -> list[Column]:
    """Length / punctuation / digit / stopword-ratio features + a composite
    quality score in [0, 1] (heuristic linear blend)."""
    t = F.col(text_col)
    toks = tokens_arr(text_col)
    n_chars = F.length(t)
    n_toks = F.size(toks)
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(en, F.lower(w))))
    n_digits = F.length(F.regexp_replace(t, "[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(t, "[A-Za-z0-9 ]", ""))
    # Ratios stay UNROUNDED: they are quotients of small integers, which land
    # on exact decimal half-boundaries (e.g. 54/128) where Spark's BigDecimal
    # HALF_UP and DuckDB's float-multiply round() disagree. Unrounded, both
    # engines run the identical IEEE ops in the same order -> bit-equal.
    mean_tok_len = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
    ) / F.greatest(n_toks, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_toks, F.lit(1))
    digit_ratio = n_digits / F.greatest(n_chars, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    score = (
        F.least(n_toks / F.lit(400.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.3
        + (1 - punct_ratio) * 0.2
        + (1 - digit_ratio) * 0.1
    )
    return [
        n_chars.cast("bigint").alias("n_chars_m"),
        n_toks.cast("bigint").alias("n_tokens"),
        mean_tok_len.alias("mean_tok_len"),
        stop_ratio.alias("stop_ratio"),
        digit_ratio.alias("digit_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    ]


def quality_score_sql(
    n_toks: str = "n_toks",
    n_stop: str = "n_stop",
    n_punct: str = "n_punct",
    n_digits: str = "n_digits",
    n_chars: str = "n_chars_m",
) -> str:
    """The composite quality score as a DuckDB SQL expression — the SINGLE
    definition both text_quality's and quality_cutoff_per_lang's oracles
    interpolate (review r07: a second hand-written copy of the formula
    would let a weight tweak silently decouple the calibration from the
    score it calibrates).  Arguments are the SQL snippets for each feature
    (CTE column names or inline expressions); the formula mirrors
    :func:`quality_features`'s Python/Spark blend exactly."""
    return (
        f"least({n_toks} / 400.0, 1.0) * 0.4\n"
        f"               + ({n_stop} / greatest({n_toks}, 1)) * 0.3\n"
        f"               + (1 - {n_punct} / greatest({n_chars}, 1)) * 0.2\n"
        f"               + (1 - {n_digits} / greatest({n_chars}, 1)) * 0.1"
    )


def token_counts(text_col: str = "text") -> list[Column]:
    """Whitespace token count and BPE-ish regex token count."""
    ws = F.size(F.filter(F.split(F.col(text_col), " +"), lambda w: F.length(w) > 0))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), 0))
    return [ws.cast("bigint").alias("ws_tokens"), bpe.cast("bigint").alias("bpe_tokens")]


def fingerprint(text_col: str = "text") -> Column:
    """Rolling polynomial hash over token (first-byte, length) pairs mod 1e9+7.

    Engine-neutral integer arithmetic (no string-hash dependency): the fold
    state stays < 2^63 so both Spark and DuckDB evaluate it exactly.
    """
    toks = tokens_arr(text_col)
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda h, w: (h * 31 + F.ascii(w) * 7 + F.length(w)) % FNV_MOD,
    ).alias("fp")
