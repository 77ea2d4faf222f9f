"""NULL/empty vintage parity (review r08).

The generated fixtures contain zero NULLs in text, event value/type/props,
and embedding columns, so neither the driver gate nor the sf-dir
oracle-parity sweep can exercise those paths — yet dirty vintages are a
planned-for input (the streaming gate's NULL hardening,
qa_preflight_report's null_text_rate).  Two layers:

1. A catalog-wide sweep: EVERY single-table oracle query over documents,
   events, or embeddings runs on a NULL-injected copy of its fixture table
   and must match its oracle there too.  First runs of this sweep surfaced
   SEVENTEEN real latent divergences, all fixed: an ANSI divide-by-zero
   crash (mm_featurize on empty payloads), DuckDB list_prepend(0, NULL) =
   [0] fingerprinting NULL docs as 0, DuckDB list_sum([]) = NULL vs
   Spark's 0 fold-init, NULL docs counted as zero-trigram docs, collect_set
   vs DISTINCT NULL-type drift in the gap-fill spine, all-NULL session
   paths ('' vs NULL), Spark NULLS-FIRST vs DuckDB NULLS-LAST rank shifts
   in the percentile/histogram rank selections, a NULL-group row silently
   dropped by an internal equi-join (sketch_hll_shard_merge), and the
   whole embeddings distance family crashing the DuckDB oracle on NULL
   vectors (now excluded by convention on both sides).
2. Targeted semantics tests for the two queries whose NULL behavior the
   r08 review flagged, with engine-independent hashlib ground truth:

- ``qa_partition_checksums``: the keyed digest must FOLD NULL-text rows in
  as md5('<id>:') on both engines (DuckDB concat skips NULL args; Spark
  coalesces), while the plain content digest skips them (md5(NULL) IS NULL).
- ``quality_cutoff_per_lang``: a language whose cutoff rank lands on a NULL
  quality score must still emit its row as (lang, n_docs, NULL, n_kept=0)
  instead of vanishing from the output.
"""

from __future__ import annotations

import hashlib
import re

import duckdb
import pandas as pd
import pytest

from flink_wordcount_spark.oracle import canon_rows
from flink_wordcount_spark.plans import ORACLES, QUERIES

_ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


#: Tables the vintage fixture injects NULLs into; single-table queries over
#: any of these are swept.
_INJECTED = ("documents", "events", "embeddings")


def _swept_queries() -> list[str]:
    """Oracle queries that touch AT LEAST ONE NULL-injected table
    (streaming queries excluded: their staging machinery has its own
    NULL-hardening tests and restages files per run).  r09 (VERDICT r08
    #7): the sweep now includes MULTI-table queries — joins/semi-joins over
    NULL-injected documents x events x TPC-H dims are where NULL-key
    equi-join semantics hide (the sketch_hll_shard_merge bug class); the
    vintage dir carries the TPC-H tables un-injected (NOT-NULL by schema
    contract) so those plans run unmodified."""
    out = []
    for name, sql in ORACLES.items():
        if name.startswith("stream_"):
            continue
        used = {t for t in _ALL_TABLES if re.search(rf"\b{t}\b", sql)}
        if used & set(_INJECTED):
            out.append(name)
    return sorted(out)


@pytest.fixture(scope="session")
def null_sf_dir(tmp_path_factory, sf_dir) -> str:
    """The fixture corpus with dirty-vintage NULLs injected (deterministic
    by row id): documents get ~10% NULL + ~10% empty texts (n_chars kept
    consistent); events get NULL value/props/event_type slices; embeddings
    get NULL vectors and NULL labels."""
    con = duckdb.connect()
    d = tmp_path_factory.mktemp("null_vintage")

    docs = con.execute(
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    ).df()
    docs.loc[docs.doc_id % 10 == 3, "text"] = None
    docs.loc[docs.doc_id % 10 == 7, "text"] = ""
    docs["n_chars"] = docs["text"].str.len().astype("Int64")
    docs.to_parquet(d / "documents.parquet", index=False)

    ev = con.execute(f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')").df()
    ev.loc[ev.event_id % 10 == 3, "value"] = None
    ev.loc[ev.event_id % 20 == 7, "props"] = None
    ev.loc[ev.event_id % 25 == 11, "event_type"] = None
    # one user with EVERY value NULL: exercises all-NULL rollups (RFM
    # monetary NULL -> NULLS-FIRST quintile, ts-profile ssd NULL -> sorts
    # last) that the per-row slice above cannot reach
    ev.loc[ev.user_id == ev.user_id.max(), "value"] = None
    ev.to_parquet(d / "events.parquet", index=False)

    emb = con.execute(
        f"SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).df()
    emb.loc[emb.vec_id % 10 == 3, "embedding"] = None
    emb.loc[emb.vec_id % 20 == 7, "label"] = None
    # one label with EVERY vector NULL: the ghost-centroid case (an oracle
    # computing per-label centroids from unfiltered embeddings emits an
    # all-NULL centroid for it while the filtered Spark side has none)
    emb.loc[emb.label == emb.label.max(), "embedding"] = None
    emb["label"] = emb["label"].astype("Int32")
    emb.to_parquet(d / "embeddings.parquet", index=False)

    # multi-table sweep (r09): the TPC-H tables ride along UN-injected
    # (NOT-NULL by schema contract) so queries joining an injected table
    # against them run unmodified
    import os

    for t in _ALL_TABLES:
        if t in _INJECTED:
            continue
        src = f"{sf_dir}/{t}.parquet"
        if os.path.exists(src):
            os.symlink(src, d / f"{t}.parquet")
    return str(d)


@pytest.mark.parametrize("name", _swept_queries())
def test_query_matches_oracle_on_null_vintage(spark, null_sf_dir, name):
    spark.catalog.clearCache()  # unfreeze persisted frames between queries
    ok_cols_rows_vals = _parity(spark, null_sf_dir, name)
    assert ok_cols_rows_vals is not None

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
    import os

    spdf = QUERIES[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in _ALL_TABLES:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
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
