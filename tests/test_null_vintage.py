"""NULL-text vintage parity (review r08).

The generated fixtures contain zero NULL-text rows, so neither the driver
gate nor the sf-dir oracle-parity sweep can exercise the NULL paths; these
tests build a synthetic NULL-heavy documents table and check Spark-vs-DuckDB
parity for the two queries whose NULL behavior the r08 review flagged:

- ``qa_partition_checksums``: the keyed digest must FOLD NULL-text rows in
  as md5('<id>:') on both engines (DuckDB concat skips NULL args; Spark
  coalesces), while the plain content digest skips them (md5(NULL) IS NULL).
- ``quality_cutoff_per_lang``: a language whose cutoff rank lands on a NULL
  quality score must still emit its row as (lang, n_docs, NULL, n_kept=0)
  instead of vanishing from the output.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd

from flink_wordcount_spark.oracle import canon_rows
from flink_wordcount_spark.plans import ORACLES, QUERIES

# lang 'xx' / source 'src0': 2 of 5 texts NULL, so the 80% cutoff rank
# (ceil(0.8*5) = 4) lands on a NULL quality score (NULLS LAST under DESC).
_XX_TEXTS = [
    "alpha beta gamma",
    "delta epsilon",
    "zeta eta theta iota",
    None,
    None,
]
# lang 'en' / source 'src1': all texts present (control group).
_EN_TEXTS = [
    "the quick brown fox",
    "jumps over the lazy dog",
    "and runs away again",
    "plain text here",
    "one more document",
]


def _null_docs_dir(tmp_path) -> str:
    rows = [(i + 1, t, "xx", "src0") for i, t in enumerate(_XX_TEXTS)]
    rows += [(100 + i, t, "en", "src1") for i, t in enumerate(_EN_TEXTS)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("Int64")
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def _parity(spark, sf_dir: str, name: str) -> pd.DataFrame:
    spdf = QUERIES[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    opdf = con.execute(ORACLES[name]).df()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert len(spdf) == len(opdf), f"{name}: spark={len(spdf)} oracle={len(opdf)}"
    assert canon_rows(spdf) == canon_rows(opdf), f"{name}: value mismatch"
    return spdf


def _md5_60bit(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_partition_checksums_keyed_digest_folds_null_rows(spark, tmp_path):
    sf = _null_docs_dir(tmp_path)
    spdf = _parity(spark, sf, "qa_partition_checksums")
    row = spdf.set_index("source").loc["src0"]
    assert row["n_rows"] == len(_XX_TEXTS)
    # independent ground truth (hashlib, no engine): content digest XORs the
    # non-NULL texts only; keyed digest XORs EVERY row, NULL text as '<id>:'
    content = 0
    keyed = 0
    for i, t in enumerate(_XX_TEXTS):
        if t is not None:
            content ^= _md5_60bit(t)
        keyed ^= _md5_60bit(f"{i + 1}:{t if t is not None else ''}")
    assert int(row["content_xor"]) == content
    assert int(row["keyed_xor"]) == keyed


def test_quality_cutoff_emits_null_cutoff_language(spark, tmp_path):
    sf = _null_docs_dir(tmp_path)
    spdf = _parity(spark, sf, "quality_cutoff_per_lang")
    assert set(spdf["lang"]) == {"xx", "en"}, "NULL-cutoff language must not vanish"
    xx = spdf.set_index("lang").loc["xx"]
    assert xx["n_docs"] == len(_XX_TEXTS)
    assert pd.isna(xx["cutoff_score"])  # cutoff rank landed on a NULL score
    assert xx["n_kept"] == 0
    en = spdf.set_index("lang").loc["en"]
    assert en["n_kept"] >= 1  # control language calibrates normally
