"""Unit tests for the LLM-pipeline operators (dedup / similarity /
multimodal) beyond the oracle parity suite: invariants the oracle can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_wordcount_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash,
)
from flink_wordcount_spark.operators.multimodal import (
    attach_binary,
    decode_image,
    featurize,
    sample_frames,
)
from flink_wordcount_spark.operators.similarity import brute_force_topk, ivf_topk
from flink_wordcount_spark.io import normalize_event_ts


def test_exact_dedup_idempotent(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    once = exact_dedup(d, "text", "doc_id")
    keep = d.join(once.select(F.col("keep_id").alias("doc_id")), "doc_id", "leftsemi")
    twice = exact_dedup(keep, "text", "doc_id")
    assert twice.filter(F.col("n_copies") > 1).count() == 0
    assert twice.count() == once.count()


def test_minhash_contains_exact_pairs(spark, sf_dir):
    """LSH candidates must cover every truly-similar pair (recall check on
    the fixture's planted near-dups)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = shingles(d, "text", "doc_id", n=3)
    exact = {(r.id_a, r.id_b) for r in jaccard_pairs(sh, 0.8).collect()}
    cands = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(minhash_signatures(sh, 32), 32, 8).collect()
    }
    assert exact <= cands


def test_minhash_signature_deterministic(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    sh = shingles(d, "text", "doc_id", n=3)
    a = sorted(minhash_signatures(sh, 8).collect())
    b = sorted(minhash_signatures(sh, 8).collect())
    assert a == b


def test_simhash_identical_docs_collide(spark):
    df = spark.createDataFrame(
        [(1, "spark streams words fast"), (2, "spark streams words fast"), (3, "entirely different content here")],
        "doc_id long, text string",
    )
    fps = {r.id: r.simhash for r in simhash(df, "text", "doc_id").collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=3)
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") / 50).cast("int").alias("cell_id"), "embedding"
    )
    approx = ivf_topk(emb, queries, centroids, k=3, nprobe=3)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.4  # pruned search keeps a useful fraction at tiny SF
    # every approx hit must be a real corpus vector with correct sim ordering
    ranks = [(r.query_id, r.rank) for r in approx.collect()]
    assert len(ranks) == len(set(ranks))


def test_decode_stub_contract():
    # compressed formats stay honestly unimplemented (no codec libs here)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01", codec="real")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....", codec="real")
    fake = decode_image(b"\x00\x01\x02", codec="fake")
    assert fake == {"n": 3, "sum": 3}


def test_ppm_round_trip_and_header_grammar():
    """r12: binary Netpbm decodes for REAL — round trip, comment handling,
    and the malformed-input contract."""
    from flink_wordcount_spark.operators.multimodal import decode_ppm, encode_ppm

    raster = bytes(range(2 * 2 * 3))
    img = decode_ppm(encode_ppm(2, 2, raster))
    assert (img["format"], img["width"], img["height"], img["maxval"]) == (
        "P6", 2, 2, 255,
    )
    assert img["samples"].tobytes() == raster

    # decode_image routes Netpbm magics to the real parser
    routed = decode_image(encode_ppm(2, 2, raster), codec="real")
    assert routed["width"] == 2 and routed["samples"].tobytes() == raster

    # hand-built header with comments + multi-whitespace (spec grammar);
    # raster starts after EXACTLY one whitespace following maxval
    buf = b"P5 # magic comment\n# full-line comment\n 3\n#c\n2 255\n" + bytes(6)
    gray = decode_ppm(buf)
    assert (gray["format"], gray["width"], gray["height"]) == ("P5", 3, 2)

    with pytest.raises(ValueError):  # truncated raster
        decode_ppm(b"P6\n2 2\n255\n" + bytes(5))
    with pytest.raises(ValueError):  # 2-byte samples unsupported
        decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))
    with pytest.raises(ValueError):  # not a Netpbm payload
        decode_ppm(b"JFIF....")
    with pytest.raises(ValueError):  # encode validates sample count
        encode_ppm(2, 2, bytes(5))
    # ADVICE r12: glued magic must reject, not parse width=3 from "P63"
    with pytest.raises(ValueError, match="after magic"):
        decode_ppm(b"P63 2\n255\n" + bytes(18))
    # but a comment directly after the magic is legal header grammar
    commented = decode_ppm(b"P5#c\n3 2 255\n" + bytes(6))
    assert (commented["width"], commented["height"]) == (3, 2)


def test_intradoc_dedup_matches_python(spark, sf_dir):
    """r13: text_intradoc_dedup's chunk accounting equals a pure-Python
    recompute (tokenize \\W+, 10-token chunks, first-occurrence-wins), and
    the synthetic edge cases (exact repeated chunk, short doc, empty text,
    NULL text) behave per the textstats NULL convention."""
    import re

    from flink_wordcount_spark.plans import QUERIES

    def expected(text):
        if text is None:
            return (None, None, None, None)
        toks = [t for t in re.split(r"\W+", text) if t]
        chunks = [" ".join(toks[i : i + 10]) for i in range(0, len(toks), 10)]
        kept = list(dict.fromkeys(chunks))
        return (
            len(chunks),
            len(chunks) - len(kept),
            len(toks),
            sum(len(c.split(" ")) for c in kept),
        )

    rows = {
        r.doc_id: r
        for r in QUERIES["text_intradoc_dedup"](spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    assert len(rows) == len(docs)
    for d in docs[:50]:
        r = rows[d.doc_id]
        assert (
            r.n_chunks, r.n_dup_chunks, r.n_tokens_total, r.n_tokens_kept
        ) == expected(d.text), f"doc {d.doc_id}"

    # synthetic edges through the same plan on a temp table
    ten = " ".join(f"w{i}" for i in range(10))
    cases = [
        (0, ten + " " + ten, (2, 1, 20, 10)),          # exact repeat dropped
        (1, ten + " " + ten + " tail", (3, 1, 21, 11)),  # short last chunk kept
        (2, "one two", (1, 0, 2, 2)),                   # sub-chunk doc
        (3, "", (0, 0, 0, 0)),                          # empty: zeros, not NULL
        (4, None, (None, None, None, None)),            # NULL text: NULL stats
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, t, "en", "src0", len(t) if t else None) for i, t, _ in cases],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).write.parquet(f"{tmp}/documents.parquet")
        got = {
            r.doc_id: r
            for r in QUERIES["text_intradoc_dedup"](spark, tmp).collect()
        }
    for i, _, exp in cases:
        r = got[i]
        assert (
            r.n_chunks, r.n_dup_chunks, r.n_tokens_total, r.n_tokens_kept
        ) == exp, f"case {i}"


def test_bmp_round_trip_and_layout_normalization():
    """r13: uncompressed 24-bit BMP decodes for REAL — the decoder must
    undo all three layout wrinkles (bottom-up rows, BGR order, 4-byte row
    padding) and return the original top-down RGB raster."""
    import struct

    import numpy as np

    from flink_wordcount_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        encode_bmp,
    )

    # widths 4..8 cover every stride-padding residue (12/15/18/21/24 bytes)
    for w, h in [(4, 3), (5, 4), (6, 5), (7, 3), (8, 4), (1, 1)]:
        raster = ((np.arange(w * h * 3) * 37 + 11) % 256).astype(np.uint8)
        img = decode_bmp(encode_bmp(w, h, raster.tobytes()))
        assert (img["format"], img["width"], img["height"]) == ("BMP24", w, h)
        assert img["samples"].tobytes() == raster.tobytes()

    # a NEGATIVE height means top-down rows per the spec: flip the encoded
    # (bottom-up) raster by hand and the decode must agree with the original
    raster = ((np.arange(5 * 3 * 3) * 7 + 3) % 256).astype(np.uint8)
    buf = bytearray(encode_bmp(5, 3, raster.tobytes()))
    stride = 5 * 3 + ((-5 * 3) % 4)
    rows = [bytes(buf[54 + i * stride : 54 + (i + 1) * stride]) for i in range(3)]
    topdown = buf[:54] + b"".join(reversed(rows))
    topdown = bytearray(topdown)
    struct.pack_into("<i", topdown, 22, -3)  # height := -3
    img = decode_bmp(bytes(topdown))
    assert img["samples"].tobytes() == raster.tobytes()

    # decode_image routes the 'BM' magic to the real parser
    routed = decode_image(encode_bmp(4, 3, bytes(range(36))), codec="real")
    assert routed["width"] == 4 and routed["samples"].tobytes() == bytes(range(36))

    # malformed-input contract
    with pytest.raises(ValueError):  # not a BMP
        decode_bmp(b"PNG.....")
    with pytest.raises(ValueError):  # truncated header
        decode_bmp(b"BM" + bytes(20))
    good = bytearray(encode_bmp(4, 3, bytes(36)))
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 8)  # 8-bit palette: unsupported
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad_bpp))
    with pytest.raises(ValueError):  # truncated raster
        decode_bmp(bytes(good[:-4]))
    # ADVICE r13: an offset pointing back INTO the header region must be
    # rejected, not silently decoded as pixels (pad the tail so the
    # truncated-raster check can't mask the offset check)
    bad_offset = bytearray(good) + bytes(64)
    struct.pack_into("<I", bad_offset, 10, 40)  # < 14 + hdr_size(40) = 54
    with pytest.raises(ValueError, match="overlaps headers"):
        decode_bmp(bytes(bad_offset))
    # ...while a LEGAL gap (offset past the headers, spec-allowed) still
    # decodes: shift the raster 16 bytes right and declare offset 70
    raster = ((np.arange(4 * 3 * 3) * 13 + 5) % 256).astype(np.uint8)
    with_gap = bytearray(encode_bmp(4, 3, raster.tobytes()))
    with_gap = with_gap[:54] + bytes(16) + with_gap[54:]
    struct.pack_into("<I", with_gap, 10, 70)
    img = decode_bmp(bytes(with_gap))
    assert img["samples"].tobytes() == raster.tobytes()
    with pytest.raises(ValueError):  # encode validates sample count
        encode_bmp(4, 3, bytes(35))


def test_bmp_decode_stats_distributed(spark, sf_dir):
    """mm_decode_bmp's mapInPandas stage agrees with a local re-decode,
    including the order-sensitive px_dot."""
    import numpy as np

    from flink_wordcount_spark.operators.multimodal import decode_bmp_stats

    ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").limit(25)
    rows = {r.doc_id: r for r in decode_bmp_stats(ids).collect()}
    assert len(rows) == 25
    for i, r in rows.items():
        w, h = 4 + i % 5, 3 + i % 3
        n = w * h * 3
        s = ((i * 11 + 17 * np.arange(n)) % 256).astype(np.int64)
        assert (r.width, r.height, r.n_samples) == (w, h, n)
        assert (r.px_sum, r.px_min, r.px_max) == (s.sum(), s.min(), s.max())
        assert r.px_dot == ((np.arange(n) + 1) * s).sum()


def test_ppm_decode_stats_distributed(spark, sf_dir):
    """mm_decode_ppm's mapInPandas stage agrees with a local re-decode."""
    import numpy as np

    from flink_wordcount_spark.operators.multimodal import (
        decode_ppm_stats,
        encode_ppm,
        decode_ppm,
    )

    ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").limit(25)
    rows = {r.doc_id: r for r in decode_ppm_stats(ids).collect()}
    assert len(rows) == 25
    for i, r in rows.items():
        w, h = 4 + i % 5, 3 + i % 3
        n = w * h * 3
        raster = ((i * 7 + 13 * np.arange(n)) % 256).astype(np.uint8)
        img = decode_ppm(encode_ppm(w, h, raster.tobytes()))
        s = img["samples"].astype(np.int64)
        assert (r.width, r.height, r.n_samples) == (w, h, n)
        assert (r.px_sum, r.px_min, r.px_max) == (s.sum(), s.min(), s.max())


def test_featurize_matches_python(spark, sf_dir):
    d = attach_binary(spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20))
    rows = featurize(d).collect()
    texts = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}
    for r in rows:
        b = texts[r.doc_id].encode()
        assert r.n_bytes == len(b)
        assert r.byte_sum == sum(b)
        assert r.header_hex == b[:8].hex()
        assert sum(r.histogram8) == len(b)


def test_frame_sampling_shape(spark, sf_dir):
    d = attach_binary(spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10))
    frames = sample_frames(d, frame_size=100, every_k=2).collect()
    by_doc = {}
    for fr in frames:
        by_doc.setdefault(fr.doc_id, []).append(fr)
    lens = {r.doc_id: r.n_bytes for r in featurize(d).collect()}
    for doc_id, frs in by_doc.items():
        n_frames = (lens[doc_id] + 99) // 100
        assert [f.frame_idx for f in sorted(frs, key=lambda f: f.frame_idx)] == list(
            range(0, n_frames, 2)
        )


def test_rhp_cosine_lsh_recall(spark, sf_dir):
    """Random-hyperplane LSH: verified pairs are a subset of the exact
    cosine pairs with usable recall at the tuned (tables, bits)."""
    from flink_wordcount_spark.operators.similarity import (
        cosine_pairs,
        rhp_buckets,
        rhp_candidate_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r.id_a, r.id_b) for r in cosine_pairs(emb, 0.45).collect()}
    cands = {(r.id_a, r.id_b) for r in rhp_candidate_pairs(rhp_buckets(emb)).collect()}
    hits = exact & cands
    assert hits <= exact
    if exact:  # recall bound from 1-(1-p^k)^L at cos=0.45 is ~0.79
        assert len(hits) / len(exact) >= 0.4


def test_connected_components_chain(spark):
    """A chain-shaped dup group (A~B~C~D, no A~C edge) must collapse to the
    min id — the single-step min-propagation answer (rep(C)=B) is wrong."""
    from flink_wordcount_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (77, 99), (5, 6)],
        "id_a: long, id_b: long",
    )
    got = {r.doc_id: r.rep_id for r in connected_components(pairs).collect()}
    assert got == {10: 10, 20: 10, 30: 10, 40: 10, 77: 77, 99: 77, 5: 5, 6: 5}


def test_cluster_reps_jaccard_chain(spark):
    """End-to-end: overlapping-window docs form a Jaccard chain (consecutive
    docs >= 0.8, distant docs < 0.8); all members must map to the min id."""
    from flink_wordcount_spark.operators.dedup import (
        connected_components,
        jaccard_pairs,
        shingles,
    )

    words = [f"w{i:03d}" for i in range(40)]
    docs = [
        # shift 3: neighbors J=25/31~0.806 (>=0.8), distance-2 J=22/34~0.647
        (100 + k, " ".join(words[3 * k : 3 * k + 30]))
        for k in range(4)
    ] + [(500, " ".join(f"z{i}" for i in range(30)))]
    d = spark.createDataFrame(docs, "doc_id: long, text: string")
    sh = shingles(d, "text", "doc_id", n=3)
    pairs = jaccard_pairs(sh, 0.8).select("id_a", "id_b")
    got_pairs = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (100, 101) in got_pairs and (100, 103) not in got_pairs  # chain, not clique
    got = {r.doc_id: r.rep_id for r in connected_components(pairs).collect()}
    assert got == {100: 100, 101: 100, 102: 100, 103: 100}


def test_rhp_hot_bucket_cap(spark):
    """1,000 identical vectors all hash to one bucket per table; the cap
    drops those buckets so the pair expansion stays bounded instead of
    exploding to ~500k pairs per table."""
    from flink_wordcount_spark.operators.similarity import (
        rhp_buckets,
        rhp_candidate_pairs,
    )

    base = [float((i % 7) - 3) or 1.0 for i in range(64)]
    rows = [(i, base) for i in range(1000)] + [
        (2000 + i, [float(((i + j) % 11) - 5) for j in range(64)]) for i in range(20)
    ]
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    buckets = rhp_buckets(emb)
    capped = rhp_candidate_pairs(buckets, max_bucket_size=100)
    uncapped_dup_pairs = 1000 * 999 // 2
    n_capped = capped.count()
    assert n_capped < uncapped_dup_pairs / 100  # hot buckets dropped
    # no pair of the identical-vector group survives (its buckets are all hot)
    hot = capped.filter((F.col("id_a") < 1000) & (F.col("id_b") < 1000)).count()
    assert hot == 0


def test_minhash_hot_bucket_cap(spark):
    """1,000 identical-prefix docs collapse into shared MinHash band buckets;
    the cap keeps the pipeline from expanding ~500k pairs per band."""
    docs = [(i, "the same long boilerplate prefix repeated here " * 5) for i in range(1000)]
    docs += [(5000 + i, f"unique doc {i} with its own words alpha beta {i}") for i in range(10)]
    d = spark.createDataFrame(docs, "doc_id: long, text: string")
    sh = shingles(d, "text", "doc_id", n=3)
    sig = minhash_signatures(sh, 32)
    capped = lsh_candidate_pairs(sig, 32, 8, max_bucket_size=100)
    assert capped.count() < 1000  # vs ~499,500 uncapped from the hot group


def test_jaccard_hot_shingle_filter(spark):
    """A shingle shared by every doc is dropped by the frequency cap; the
    join no longer receives the freq² hot key, and disjoint docs that only
    shared the hot shingle produce no pair at all."""
    docs = [(i, f"common filler phrase unique{i} tail{i} end{i}") for i in range(50)]
    d = spark.createDataFrame(docs, "doc_id: long, text: string")
    sh = shingles(d, "text", "doc_id", n=3)
    # every doc contains the 'common filler phrase' shingle -> freq 50
    uncapped = jaccard_pairs(sh, 0.01)
    capped = jaccard_pairs(sh, 0.01, max_shingle_freq=10)
    assert uncapped.count() == 50 * 49 // 2
    assert capped.count() == 0


def test_dedup_embed_cosine_no_cartesian(spark, sf_dir):
    """The declared embed-dedup plan must not cross-join corpus x corpus."""
    from flink_wordcount_spark.plans.similarity_q import dedup_embed_cosine

    plan = dedup_embed_cosine(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_asof_join_matches_window_form(spark, sf_dir):
    """Two-table as-of (cogroup + merge_asof) agrees with the window-based
    as-of on the last-purchase-before-event problem."""
    from flink_wordcount_spark.operators.asof import asof_join
    from flink_wordcount_spark.plans.events_q import ev_asof_last_purchase

    e = spark.read.parquet(f"{sf_dir}/events.parquet").transform(normalize_event_ts)
    left = e.select("event_id", "user_id", "event_type", "ts")
    right = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.col("ts").alias("purchase_ts"))
    )
    out = asof_join(
        left,
        right,
        by="user_id",
        on="ts",
        schema="event_id long, user_id long, event_type string, ts timestamp, purchase_ts timestamp",
    )
    got = {
        r.event_id: (r.purchase_ts.strftime("%Y-%m-%d %H:%M:%S") if r.purchase_ts else None)
        for r in out.collect()
    }
    want = {
        r.event_id: r.last_purchase_ts
        for r in ev_asof_last_purchase(spark, sf_dir).collect()
    }
    assert got == want


def test_asof_join_tolerance_bounds_not_widens(spark):
    """The tolerance contract (pandas merge_asof, kdb wj): a nearest match
    FARTHER than the tolerance becomes NULL — the join must NOT fall back
    to the next-nearest row, which is what distinguishes an as-of tolerance
    from a banded range join picking any in-window row."""
    import pandas as pd

    from flink_wordcount_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00"), (2, "2024-01-01 12:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            # user 1: nearest is 10:00 (2h stale) but an 11:30 row EXISTS
            # within tolerance... order matters: nearest = 11:30, in-window.
            (1, "2024-01-01 11:30:00", 9.0),
            (1, "2024-01-01 10:00:00", 1.0),
            # user 2: NEAREST prior row is 09:00 (3h stale, out of the 1h
            # tolerance); no fallback to anything else — NULL.
            (2, "2024-01-01 09:00:00", 5.0),
        ],
        "user_id long, ts_s string, v double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    out = asof_join(
        left,
        right,
        by="user_id",
        on="ts",
        schema="user_id long, ts timestamp, v double",
        tolerance=pd.Timedelta(hours=1),
    )
    got = {r.user_id: r.v for r in out.collect()}
    assert got == {1: 9.0, 2: None}


def test_apply_cdc(spark):
    """CDC apply: last change per key wins; deletes remove; inserts add."""
    from flink_wordcount_spark.operators.merge import apply_cdc

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", "U", 1),  # update 2
            (3, None, "D", 1),  # delete 3
            (4, "d", "I", 1),   # insert 4
            (2, "b3", "U", 2),  # later update of 2 wins
        ],
        "k long, v string, op string, seq long",
    )
    out = {r.k: r.v for r in apply_cdc(target, changes, "k").collect()}
    assert out == {1: "a", 2: "b3", 4: "d"}


def test_shingle_hashes_match_string_shingles(spark, sf_dir):
    """(id, xxhash64(shingle)) must be exactly the hashed image of the string
    shingle set — same per-doc cardinalities, so Jaccard values agree."""
    from flink_wordcount_spark.operators.dedup import shingle_hashes

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    via_strings = (
        shingles(d, "text", "doc_id", 3)
        .select("id", F.xxhash64("shingle").alias("h"))
        .distinct()
    )
    direct = shingle_hashes(d, "text", "doc_id", 3)
    assert direct.subtract(via_strings).count() == 0
    assert via_strings.subtract(direct).count() == 0


def test_minhash_signature_dedup_invariant(spark, sf_dir):
    """MinHash min is duplicate-invariant: signatures from the deduped and
    non-deduped shingle-hash streams are identical."""
    from flink_wordcount_spark.operators.dedup import shingle_hashes

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    with_dedup = minhash_signatures(shingle_hashes(d, "text", "doc_id", 3), 8)
    without = minhash_signatures(
        shingle_hashes(d, "text", "doc_id", 3, dedup=False), 8
    )
    assert sorted(with_dedup.collect()) == sorted(without.collect())


def test_decontam_flags_planted_overlap(spark):
    """A training doc sharing a 4-gram with an eval doc is flagged with the
    right distinct-gram count; non-overlapping docs are absent."""
    from flink_wordcount_spark.plans.decontam_q import _EVAL_MOD, _EVAL_RES

    eval_id = _EVAL_RES  # doc_id % _EVAL_MOD == _EVAL_RES
    rows = [
        (eval_id, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta unrelated tail words here"),  # 2 shared 4-grams? no: 1
        (2, "completely different content with no overlap at all"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    import flink_wordcount_spark.plans.decontam_q as dq
    from flink_wordcount_spark.hints import maybe_broadcast
    from flink_wordcount_spark.operators.dedup import shingles

    sh = shingles(d, "text", "doc_id", n=4)
    is_eval = (F.col("id") % _EVAL_MOD) == _EVAL_RES
    ev = sh.filter(is_eval).select("shingle").distinct()
    out = (
        sh.filter(~is_eval)
        .join(maybe_broadcast(ev), "shingle")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_eval_grams"))
        .collect()
    )
    got = {r["doc_id"]: r["n_eval_grams"] for r in out}
    assert got == {1: 1}  # "alpha beta gamma delta" is the one shared 4-gram


def test_bm25_score_orders_by_tf(spark):
    """More occurrences of a query term -> strictly higher BM25 (same dl)."""
    from flink_wordcount_spark.plans import QUERIES  # noqa: F401  (registration)
    from flink_wordcount_spark.plans.similarity_q import bm25_keyword_search

    import tempfile, os
    rows = [
        (0, "spark spark spark filler filler filler"),
        (1, "spark filler filler filler filler filler"),
        (2, "filler filler filler filler filler filler"),
    ]
    d = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t, in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as tmp:
        d.write.parquet(os.path.join(tmp, "documents.parquet"))
        out = bm25_keyword_search(spark, tmp).collect()
    got = {r["doc_id"]: r["bm25"] for r in out}
    assert set(got) == {0, 1}  # doc 2 has no query term
    assert got[0] > got[1] > 0


def test_incremental_pairs_match_bipartite_subset(spark, sf_dir):
    """Incremental (new-vs-old) pairs == the full pair set restricted to
    pairs straddling the shard boundary."""
    from flink_wordcount_spark.operators.dedup import (
        incremental_jaccard_pairs,
        shingle_hashes,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = (F.col("doc_id") % 5) == 4
    sh_all = shingle_hashes(d, "text", "doc_id", 3)
    sh_new = shingle_hashes(d.filter(new), "text", "doc_id", 3)
    sh_old = shingle_hashes(d.filter(~new), "text", "doc_id", 3)
    inc = {
        (r["new_id"], r["old_id"], r["n_shared"], r["jaccard"])
        for r in incremental_jaccard_pairs(sh_new, sh_old, 0.8).collect()
    }
    full = jaccard_pairs(sh_all, 0.8).collect()
    expected = set()
    for r in full:
        a_new, b_new = r["id_a"] % 5 == 4, r["id_b"] % 5 == 4
        if a_new and not b_new:
            expected.add((r["id_a"], r["id_b"], r["n_shared"], r["jaccard"]))
        elif b_new and not a_new:
            expected.add((r["id_b"], r["id_a"], r["n_shared"], r["jaccard"]))
    assert inc == expected and inc
