"""Property tests for the shared sentence-generation core (pure numpy).

``sentences_for_ids`` is the single implementation behind the Arrow UDF
source AND the Python DataSource's offset replay; its exactly-once story
rests on one property: the sentence for row id r is a pure function of
(r, seed, size, skew) — independent of which batch, chunk, or partition the
id arrives in.  The Spark-level tests exercise this through the engines;
these pin it at the function level, where a chunking bug would originate.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_wordcount_spark.streaming.sentences import (
    sentences_for_ids,
    synthetic_wordlist,
)

_WORDS = np.array(synthetic_wordlist(), dtype=object)


@settings(max_examples=25, deadline=None)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=60),
    cut=st.integers(min_value=0, max_value=60),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_chunk_boundaries_do_not_change_output(ids, cut, seed):
    """Replaying ids in one call == any split into chunks (the offset-replay
    exactly-once property)."""
    cut = min(cut, len(ids))
    whole = sentences_for_ids(np.array(ids, dtype=np.uint64), 5, seed, 0, _WORDS)
    parts = sentences_for_ids(
        np.array(ids[:cut], dtype=np.uint64), 5, seed, 0, _WORDS
    ) + sentences_for_ids(np.array(ids[cut:], dtype=np.uint64), 5, seed, 0, _WORDS)
    assert whole == parts


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31))
def test_sentence_shape_and_vocabulary(seed):
    rids = np.arange(40, dtype=np.uint64)
    out = sentences_for_ids(rids, 7, seed, 0, _WORDS)
    vocab = set(synthetic_wordlist())
    for s in out:
        toks = s.split(" ")
        assert len(toks) == 7
        assert all(t in vocab for t in toks)


def test_seed_changes_output_order_independent_ids_do_not():
    rids = np.arange(100, dtype=np.uint64)
    a = sentences_for_ids(rids, 5, 42, 0, _WORDS)
    b = sentences_for_ids(rids, 5, 43, 0, _WORDS)
    assert a != b  # seed is load-bearing
    # permuting input ids permutes output identically (row-wise purity)
    perm = np.random.default_rng(0).permutation(100)
    shuffled = sentences_for_ids(rids[perm], 5, 42, 0, _WORDS)
    assert shuffled == [a[i] for i in perm]


def test_skew_knob_is_deterministic_and_bounded():
    """skew_percent injects the literal 'skew' with a deterministic per-slot
    hash decision — same ids, same result, and the observed rate lands near
    the requested probability (binomial, 3000 slots)."""
    rids = np.arange(600, dtype=np.uint64)
    a = sentences_for_ids(rids, 5, 42, 30, _WORDS)
    b = sentences_for_ids(rids, 5, 42, 30, _WORDS)
    assert a == b
    toks = [t for s in a for t in s.split(" ")]
    rate = sum(t == "skew" for t in toks) / len(toks)
    assert 0.25 < rate < 0.35
    assert sentences_for_ids(rids, 5, 42, 0, _WORDS) != a
