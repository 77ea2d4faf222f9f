"""Property tests for the near-dup core (operators/dedup.py) against a
pure-Python reference: the inverted-index pair join must equal brute-force
pairwise Jaccard on any corpus, and containment must dominate Jaccard."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from flink_wordcount_spark.operators.dedup import jaccard_pairs, shingle_hashes

_N = 3

# Small vocab + repeated draws manufactures genuine near-dups often.
_doc = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=8
).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=6)


def _py_shingles(text: str) -> set[str]:
    toks = [t for t in text.split(" ") if t]
    return {" ".join(toks[i : i + _N]) for i in range(len(toks) - _N + 1)}


def _py_pairs(texts, threshold):
    out = {}
    for i, a in enumerate(texts):
        for j in range(i + 1, len(texts)):
            sa, sb = _py_shingles(a), _py_shingles(texts[j])
            inter = len(sa & sb)
            if inter:
                jac = inter / (len(sa) + len(sb) - inter)
                if round(jac, 6) >= threshold:
                    out[(i, j)] = (inter, round(jac, 6))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=_corpus, threshold=st.sampled_from([0.3, 0.6, 0.9]))
def test_jaccard_pairs_matches_bruteforce(spark, texts, threshold):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sh = shingle_hashes(df, "text", "doc_id", n=_N)
    got = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["jaccard"])
        for r in jaccard_pairs(sh, threshold).collect()
    }
    assert got == _py_pairs(texts, threshold)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=_corpus)
def test_containment_dominates_jaccard_property(spark, texts):
    """containment = s/min(a,b) >= s/(a+b-s) = jaccard: every 0-threshold
    pair must satisfy the dominance, pinning the two metrics' shared
    machinery against sign/denominator mixups."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sh = shingle_hashes(df, "text", "doc_id", n=_N)
    pairs = jaccard_pairs(sh, 0.0).collect()
    sizes = {i: len(_py_shingles(t)) for i, t in enumerate(texts)}
    for r in pairs:
        cont = r["n_shared"] / min(sizes[r["id_a"]], sizes[r["id_b"]])
        assert cont >= r["jaccard"] - 1e-9


def test_operators_handle_empty_and_degenerate_inputs(spark):
    """Empty corpus, single doc, and all-short docs must flow through the
    near-dup machinery without errors and produce empty pair sets."""
    from flink_wordcount_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        minhash_signatures,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert jaccard_pairs(shingle_hashes(empty, "text", "doc_id", n=3), 0.5).count() == 0
    assert exact_dedup(empty, "text", "doc_id").count() == 0

    one = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    assert jaccard_pairs(shingle_hashes(one, "text", "doc_id", n=3), 0.5).count() == 0

    # docs shorter than the shingle width: no shingles, no pairs, no crash
    short = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "")], "doc_id long, text string"
    )
    assert shingle_hashes(short, "text", "doc_id", n=3).count() == 0

    # connected components on an empty edge set: empty assignment
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges).count() == 0

    # minhash on empty: no signatures
    assert minhash_signatures(shingle_hashes(empty, "text", "doc_id", n=3)).count() == 0


def test_shared_spans_hashed_agrees_with_string_keyed(spark, sf_dir):
    """VERDICT r07 #4: the 64-bit-hashed span profile (the 100 TB shuffle
    shape) must agree row-for-row with the string-keyed twin — any
    divergence means a real xxhash64 collision, which at fixture scale
    (~1e-11) indicates a plumbing bug, not chance."""
    from flink_wordcount_spark.plans import QUERIES

    a = sorted(map(tuple, QUERIES["dedup_shared_spans"](spark, sf_dir).collect()))
    b = sorted(
        map(tuple, QUERIES["dedup_shared_spans_hashed"](spark, sf_dir).collect())
    )
    assert a == b
