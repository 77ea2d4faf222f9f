"""Deduplication operators for training-data pipelines.

Four families, all pure DataFrame (no Python in the hot path):

- exact:   group on content (or its hash) and keep the min-id representative.
- n-gram Jaccard: exact near-dup via an inverted-index self-join on shingles —
  the verification step every approximate method funnels into.
- MinHash + LSH: banded signature bucketing to prune the candidate space; at
  100 TB the shingle self-join above is only run *within* LSH buckets, which
  is what makes near-dedup tractable (candidates ~ O(n·dups), not O(n²)).
- SimHash: 64-bit weighted-projection fingerprint; near-dup = small Hamming
  distance, bucketed by bit-prefix.

Hash functions are Spark's xxhash64 (seeded per-permutation via suffix
literals) — deterministic across runs/partitions, engine-specific (so the
LSH/SimHash queries are declared rows-only for the oracle; the exact-Jaccard
query is fully oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..hints import spread
from .text import TOKEN_SPLIT_REGEX


def bucket_pair_expansion(ids: Column) -> Column:
    """All ordered (id_a < id_b) pair structs from a SORTED bucket-member
    array, in-array (flatten/transform/slice) — the one definition shared by
    every collect_set-based candidate generator (MinHash bands, RHP tables,
    SimHash bands), so a fix to the expansion can never diverge between the
    LSH families (r08 review: it was copy-pasted)."""
    return F.flatten(
        F.transform(
            ids,
            lambda a, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
            ),
        )
    )


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """One surviving (min-id) row per distinct content value + dup count."""
    return df.groupBy(content_col).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def shingles(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, dedup: bool = True
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    ``dedup=False`` skips the distinct (its own shuffle) for consumers whose
    aggregate is duplicate-invariant — MinHash mins over a multiset equal
    mins over its set — mirroring :func:`shingle_hashes`.

    NOT spread(): every shingle consumer (MinHash signatures, Jaccard
    grouping, span hashing) aggregates by a shuffled key immediately after
    the slice/explode, so the heavy per-shingle work already runs after an
    exchange that distributes it; an interleaved spread-vs-identity A/B
    (r15, min-of-3 per config, same process) measured the extra text-column
    shuffle as a pure loss across the family (dedup_minhash_estimate +0.71 s,
    dedup_shared_spans_hashed +0.22 s, dedup_minhash_verified +0.10 s,
    dedup_ngram_jaccard ±0).
    """
    toks = F.filter(F.split(F.col(text_col), TOKEN_SPLIT_REGEX), lambda w: F.length(w) > 0)
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    # guard: sequence(1, 0) in Spark is the DESCENDING [1, 0], so short docs
    # must short-circuit to an empty shingle list explicitly
    sh = F.expr(
        f"CASE WHEN size(toks) >= {n} THEN "
        f"transform(sequence(1, size(toks) - {n - 1}), i -> concat_ws(' ', slice(toks, i, {n}))) "
        f"ELSE array() END"
    )
    out = base.select("id", F.explode(sh).alias("shingle"))
    return out.distinct() if dedup else out


def jaccard_pairs(
    sh: DataFrame,
    threshold: float,
    max_shingle_freq: int | None = None,
    *,
    prefix: bool = False,
) -> DataFrame:
    """Exact Jaccard-similar pairs from a (id, shingle) set via inverted index.

    Shuffle keys on `shingle`; a pair is produced once per shared shingle and
    aggregated — the standard scalable exact-near-dup join.

    ``max_shingle_freq`` is the hot-shingle cap: a shingle appearing in more
    than that many documents (stopword n-grams, boilerplate) contributes
    freq² rows to the self-join; dropping it bounds the blowup at the cost of
    undercounting n_shared for pairs whose overlap includes the hot shingle
    (similarity becomes a lower bound — safe for a >= threshold near-dup
    filter's precision, lossy for recall; leave None for the exact oracle
    path, set it at 100 TB).

    Accepts ``(id, h)`` from :func:`shingle_hashes` (preferred: the join and
    both aggregations key on fixed-width longs — measured ~30% faster at
    sf0.1 and the shape you want when the shuffle is petabytes) or
    ``(id, shingle)`` from :func:`shingles` (string keys). With hashed keys
    n_shared counts shared distinct *hashes*; a cross-doc collision altering
    a pair's count has probability ~v²/2⁶⁵ for v distinct shingles in the
    pair's union — immaterial against a 0.8 threshold.

    The threshold compares against the ROUNDED(6) similarity, deliberately:
    round-before-compare is this catalog's cross-engine parity convention
    (the IVF selection does the same), so a pair within 5e-7 of the
    threshold is admitted or rejected IDENTICALLY by Spark and the DuckDB
    oracle instead of by their low-order float bits.  The cost — a pair at
    e.g. 0.7999996 passing a 0.8 gate — is half a rounding ulp of
    similarity, far below the metric's meaningfulness.

    ``prefix=True`` (r16) routes through the EXACT prefix-filtered join
    (:func:`_prefix_jaccard_pairs`): identical output, but the pair
    expansion is bounded by per-doc key-order prefixes instead of every
    co-occurring pair — ~(1−t)² of the inverted-index join's sum-df²
    shuffle rows on a 100 TB corpus.  Use it for FULL-CORPUS
    pair generation; leave it off for candidate-bounded verify branches
    (minhash_verified's semi-joined members), where the input is already
    pruned and the prefix machinery's extra aggregates cost more than they
    save.  Requires ``max_shingle_freq is None`` (the cap's
    lower-bound-n_shared semantics would need capped-stream prefixes with
    uncapped denominators — unimplemented until a caller needs both).
    """
    if prefix and max_shingle_freq is None:
        return _prefix_jaccard_pairs(sh, threshold)
    return _similar_pairs(
        sh,
        threshold,
        lambda s, a, b: s / (a + b - s),
        "jaccard",
        max_shingle_freq,
    )


def containment_pairs(
    sh: DataFrame, threshold: float, max_shingle_freq: int | None = None
) -> DataFrame:
    """Asymmetric shingle-containment pairs: n_shared / min(|A|, |B|).

    The metric that catches a short doc embedded in a long one, which
    Jaccard misses (the union term dilutes it).  Same inverted-index
    machinery, same hot-shingle cap, same round-before-compare convention
    as :func:`jaccard_pairs` — only the denominator differs (review r08:
    the machinery was previously forked inline in the containment query,
    so a fix here would not have reached it)."""
    return _similar_pairs(
        sh,
        threshold,
        lambda s, a, b: s / F.least(a, b),
        "containment",
        max_shingle_freq,
    )


def _similar_pairs(
    sh: DataFrame,
    threshold: float,
    metric,
    out_col: str,
    max_shingle_freq: int | None,
) -> DataFrame:
    """Shared inverted-index pair join: ``metric(n_shared, n_a, n_b)`` is the
    similarity, rounded(6) BEFORE the threshold compare (cross-engine parity
    convention — see :func:`jaccard_pairs`'s docstring)."""
    key = "h" if "h" in sh.columns else "shingle"
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    joinable = sh
    if max_shingle_freq is not None:
        freq = sh.groupBy(key).agg(F.count(F.lit(1)).alias("df"))
        joinable = sh.join(
            freq.filter(F.col("df") <= max_shingle_freq).select(key), key
        )
    a = joinable.select(F.col("id").alias("id_a"), key)
    b = joinable.select(F.col("id").alias("id_b"), key)
    shared = (
        a.join(b, key)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            out_col,
            F.round(metric(F.col("n_shared"), F.col("n_a"), F.col("n_b")), 6),
        )
        .filter(F.col(out_col) >= threshold)
        .select("id_a", "id_b", "n_shared", out_col)
    )


def _prefix_jaccard_pairs(sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard pairs via PREFIX FILTERING (AllPairs / PPJoin prefix
    principle: Chaudhuri et al. ICDE'06, Xiao et al. WWW'08) — same output
    as the plain inverted-index join, shuffle rows bounded by prefixes.

    Principle: under ANY global total order of the key universe, two sets
    with |A∩B| >= α must share an element inside their (|A|−α+1)-prefixes.
    A pair passing ``round(jaccard,6) >= t`` has true similarity
    >= t − 5e-7, hence overlap s >= ceil(t_eff·|A|) with t_eff = t − 1e-6
    (s >= t_eff·|A∪B| >= t_eff·|A| and s integral; the 1e-6 slack keeps the
    round-before-compare convention's boundary pairs inside the filter).
    So candidate generation only joins each doc's (n − ceil(t_eff·n) + 1)
    smallest keys — ~(1−t)·n + 1 of them — and every qualifying pair is
    still produced: recall is EXACT, by pigeonhole, not probabilistic.

    The global order is (document frequency, key) — rarest-first, the
    classic choice: corpus-hot shingles (stopword n-grams, boilerplate)
    sort LAST and almost never enter a prefix, so the in-prefix join loses
    the df² term that motivates this operator (r16 probe at synthetic sf1:
    pair multiplicity 29.7M → 254k, max per-key fan 164 → 22 under
    df-order vs ~0.04× under the key's natural order;
    plans/r16/probe_ngram_prefix.json).  The df tag comes from
    ``count() over (partition by key)`` — ONE shuffle+sort of the stream —
    not from a separate df aggregate joined back (that three-arm A/B lost
    to the window form at both scales: plans/r16/ab_ngram_windf.json).

    Candidates are then verified EXACTLY from per-doc key-set arrays (one
    groupBy(id) builds both the (df,key)-sorted array that yields the
    prefix and, via transform, the full key set): n_shared =
    size(array_intersect), sizes = array sizes — no separate sizes
    branch, and the only corpus-width shuffles are the window by key and
    the groupBy(id).  Requires the per-(id,key) DISTINCT stream every
    jaccard_pairs consumer already provides (the count semantics assume
    it).
    """
    from pyspark.sql import Window

    from ..hints import maybe_broadcast

    key = "h" if "h" in sh.columns else "shingle"
    t_eff = threshold - 1e-6
    tagged = sh.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy(key))
    )
    packed = tagged.groupBy("id").agg(
        F.sort_array(F.collect_list(F.struct(F.col("_df"), F.col(key)))).alias(
            "sk"
        )
    )
    n = F.size("sk")
    plen = (n - F.ceil(F.lit(t_eff) * n) + 1).cast("int")
    pref = packed.select(
        "id", F.explode(F.slice("sk", F.lit(1), plen)).alias("s")
    ).select("id", F.col(f"s.{key}").alias(key))
    cand = (
        pref.select(F.col("id").alias("id_a"), key)
        .join(pref.select(F.col("id").alias("id_b"), key), key)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sets = packed.select("id", F.transform("sk", lambda x: x[key]).alias("hs"))
    s = F.size(F.array_intersect("ha", "hb")).cast("bigint")
    sim = F.round(
        s / (F.size("ha").cast("bigint") + F.size("hb").cast("bigint") - s), 6
    )
    return (
        maybe_broadcast(cand)
        .join(sets.withColumnsRenamed({"id": "id_a", "hs": "ha"}), "id_a")
        .join(sets.withColumnsRenamed({"id": "id_b", "hs": "hb"}), "id_b")
        .select("id_a", "id_b", s.alias("n_shared"), sim.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def shingle_hashes(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, dedup: bool = True
) -> DataFrame:
    """xxhash64'd word n-gram shingles per document: (id, h).

    The 100 TB variant of :func:`shingles`: the shingle string is collapsed to
    a 64-bit key *before* the distinct, so the dedup shuffle carries 16-byte
    rows instead of n-word strings, and everything downstream (MinHash
    permutations, band hashing) operates on fixed-width longs. A within-doc
    hash collision merges two shingles (prob ~m²/2⁶⁵ per doc, m = shingles per
    doc — negligible) and only perturbs *candidate generation*, which the
    exact verify pass downstream corrects.

    ``dedup=False`` skips the distinct — for consumers whose aggregate is
    duplicate-invariant (MinHash: min over a multiset == min over its set),
    which turns the signature pipeline into a single shuffle.

    Composes :func:`shingles` (dedup deferred past the hashing so the
    distinct shuffles 16-byte keys) rather than restating the tokenizer and
    short-doc guard — r08 review: the copy-pasted expression let a guard
    change diverge the string and hashed shingle paths.
    """
    out = shingles(df, text_col, id_col, n=n, dedup=False).select(
        "id", F.xxhash64("shingle").alias("h")
    )
    return out.distinct() if dedup else out


def minhash_signatures(sh: DataFrame, num_hashes: int = 32) -> DataFrame:
    """(id, h0..h{k-1}) MinHash signature via k seeded min-aggregates.

    One groupBy computes all k mins — a single shuffle on id regardless of k.
    Accepts either ``(id, h)`` from :func:`shingle_hashes` (preferred: each
    permutation is a cheap long-rehash) or ``(id, shingle)`` from
    :func:`shingles` (the string is hashed once, then rehashed per
    permutation).
    """
    if "h" in sh.columns:
        hashed = sh.select("id", "h")
    else:
        hashed = sh.select("id", F.xxhash64("shingle").alias("h"))
    aggs = [
        F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return hashed.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signature, bucket per band, emit distinct candidate pairs.

    rows_per_band = num_hashes // bands. Collision probability for docs with
    Jaccard s is 1-(1-s^r)^b — tune (b, r) to the target threshold.

    Pairs are generated per-bucket from a sorted collect_set (one shuffle,
    no self-join). ``max_bucket_size`` is the hot-bucket cap: a degenerate
    bucket (e.g. thousands of identical or identical-prefix documents whose
    signatures agree) expands to O(size²) pairs; buckets above the cap are
    dropped entirely. Identical documents are the exact-dedup pass's job —
    near-dup LSH losing them is the documented trade.
    """
    if num_hashes % bands != 0:
        # fail loudly: the trailing num_hashes % bands signature columns
        # would be silently ignored and the effective (b, r) collision curve
        # would differ from the caller's intended tuning (r08 review)
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}); "
            f"{num_hashes % bands} signature columns would go unused"
        )
    r = num_hashes // bands
    band_cols = [
        F.xxhash64(*[F.col(f"h{band * r + j}") for j in range(r)]).alias(f"band{band}")
        for band in range(bands)
    ]
    banded = sig.select("id", *band_cols)
    stacked = banded.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band_idx"), F.col(f"band{i}").alias("band_hash"))
                for i in range(bands)
            ])
        ).alias("b"),
    ).select("id", "b.band_idx", "b.band_hash")
    members = stacked.groupBy("band_idx", "band_hash").agg(
        F.sort_array(F.collect_set("id")).alias("ids")
    )
    if max_bucket_size is not None:
        members = members.filter(F.size("ids") <= max_bucket_size)
    return (
        members.select(F.explode(bucket_pair_expansion(F.col("ids"))).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def minhash_verified_pairs(
    d: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket_size: int | None = 1024,
) -> DataFrame:
    """MinHash-LSH candidate pruning + exact-Jaccard verification, as ONE
    operator: the candidate->verify chain shared by dedup_minhash_verified
    and curation_end_to_end (extracted so a band/threshold/bucket-cap tuning
    can never silently diverge between the standalone query and the funnel).

    Candidate generation runs on 64-bit shingle hashes without the distinct
    (MinHash mins are duplicate-invariant -> one shuffle); the verify branch
    re-shingles only the semi-joined candidate member docs; verified pairs
    are intersected with the candidate set to keep LSH semantics honest.
    Returns (id_a, id_b, n_shared, jaccard) with jaccard >= threshold.

    The candidate pair list is deliberately NOT persisted even though three
    plan branches consume it (candidate-member id extraction, the verify
    semi-join's build side, the final candidate-intersection semi-join):
    the duplicated plan segments are cheap map-side work feeding exchanges
    that AQE's runtime stage reuse already shares, so a cache only adds a
    job barrier + block-write cost (r15 interleaved A/B at sf0.1: persist
    2.5-7.2 s vs no-persist 1.8-2.1 s per run).
    """
    from ..hints import maybe_broadcast

    sh = shingle_hashes(d, text_col, id_col, n=n, dedup=False)
    cands = lsh_candidate_pairs(
        minhash_signatures(sh, num_hashes), num_hashes, bands,
        max_bucket_size=max_bucket_size,
    )
    cand_ids = cands.select(F.explode(F.array("id_a", "id_b")).alias("id")).distinct()
    cand_docs = d.join(
        maybe_broadcast(cand_ids.withColumnRenamed("id", id_col)), id_col, "leftsemi"
    )
    cand_sh = shingle_hashes(cand_docs, text_col, id_col, n=n)
    return jaccard_pairs(cand_sh, threshold).join(cands, ["id_a", "id_b"], "leftsemi")


def connected_components(pairs: DataFrame, max_iter: int = 50) -> DataFrame:
    """Min-id connected components over an undirected similar-pair list.

    Returns (doc_id, rep_id): every node in a component maps to the
    component's minimum id — correct for chains (A~B~C but not A~C), not
    just cliques. Each round does one propagate step (take the min rep over
    direct neighbors) and one pointer-jump (rep <- rep(rep)), so convergence
    is O(log diameter) rounds; the loop stops at the first round with no
    changed assignment. Every round is a pair of shuffles on a frontier
    that is only the near-dup pair membership (tiny relative to the corpus),
    and each iteration is localCheckpoint'd to truncate lineage.
    """
    edges = (
        pairs.select(F.col("id_a").alias("s"), F.col("id_b").alias("t"))
        .union(pairs.select(F.col("id_b").alias("s"), F.col("id_a").alias("t")))
        # materialize once: edges feed every fixpoint round, and without this
        # each round re-executes the (expensive) upstream pair-generation plan
        .localCheckpoint()
    )
    reps = (
        edges.groupBy("s")
        .agg(F.min("t").alias("nbr_min"))
        .select(
            F.col("s").alias("doc_id"),
            F.least("s", "nbr_min").alias("rep_id"),
        )
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_best = (
            edges.join(
                reps.withColumnsRenamed({"doc_id": "t", "rep_id": "nbr_rep"}), "t"
            )
            .groupBy("s")
            .agg(F.min("nbr_rep").alias("nbr_rep"))
            .withColumnRenamed("s", "doc_id")
        )
        propagated = (
            reps.join(nbr_best, "doc_id", "left")
            .select(
                "doc_id",
                F.col("rep_id").alias("old_rep"),
                F.least("rep_id", F.coalesce("nbr_rep", "rep_id")).alias("rep_id"),
            )
        )
        # convergence witness rides along as an 8-byte column instead of a
        # post-hoc join of the new assignment against the old one (r15: the
        # old join added two shuffles + a second action's worth of work per
        # round); min-propagation only ever lowers rep_id, so
        # rep_id != old_rep on any row iff the round changed something
        jumped = (
            propagated.alias("x")
            .join(
                propagated.select(
                    F.col("doc_id").alias("rep_id"), F.col("rep_id").alias("rep2")
                ).alias("y"),
                "rep_id",
                "left",
            )
            .select(
                "doc_id",
                "old_rep",
                F.least("rep_id", F.coalesce("rep2", "rep_id")).alias("rep_id"),
            )
            .localCheckpoint()
        )
        changed = jumped.filter(F.col("rep_id") != F.col("old_rep")).count()
        reps = jumped.select("doc_id", "rep_id")
        if changed == 0:
            break
    return reps


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash: per-token xxhash64, weighted by term frequency.

    Bit i of the fingerprint is 1 iff the tf-weighted sum of (±1 per token's
    hash bit i) is positive. Expressed as 64 conditional-sum aggregates over
    the exploded token stream — one shuffle on id.
    """
    # per-occurrence ±1 sums are identical to tf-weighted per-distinct-word
    # sums, so no (id, word) pre-aggregation shuffle is needed — the single
    # groupBy(id) partial-aggregates map-side; spread() parallelizes the
    # explode + 64 conditional partial sums off the single-row-group scan
    # task (guide §2.5; no-op at scan sizes that already parallelize)
    toks = (
        spread(df).select(F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), TOKEN_SPLIT_REGEX)).alias("w"))
        .filter(F.length("w") > 0)
        .withColumn("h", F.xxhash64("w"))
    )
    one = F.lit(1).cast("long")
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, one).otherwise(-one)
        ).alias(f"s{i}")
        for i in range(bits)
    ]
    sums = toks.groupBy("id").agg(*bit_sums)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)  # disjoint bits: XOR == OR
    return sums.select("id", fp.alias("simhash"))


def hamming64(a, b):
    """Hamming distance between two 64-bit fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_band_pairs(
    fp: DataFrame,
    fp_cols: list,
    band_vals: list,
    hamming_fn,
    *,
    max_hamming: int = 8,
    max_bucket_size: int | None = 1024,
) -> DataFrame:
    """Banded SimHash candidate search, shared by the production (xxhash64,
    one 64-bit column) and the md5 verify-twin (two 32-bit halves) pipelines
    so a banding change can never silently diverge between them (review r07).

    ``fp`` carries column ``id`` plus ``fp_cols``; ``band_vals`` is one
    Column per band (already shifted/masked); ``hamming_fn(a, b)`` receives
    dicts of the two sides' fingerprint Columns and returns the distance.
    Pairs sharing ANY band with Hamming <= ``max_hamming`` are emitted once.
    Pigeonhole: with B disjoint bands, recall is exact for Hamming <= B-1
    CONDITIONAL on the hot-bucket cap not dropping every shared band (the
    cap bounds the O(size²) in-bucket expansion).

    Shape (r08 review): pairs come from a sorted collect_set of
    (id, fingerprint) structs per (band_idx, band_val) — ONE shuffle of the
    banded projection, the same form as :func:`lsh_candidate_pairs` /
    ``rhp_candidate_pairs`` — instead of the former two-sided self-join
    that evaluated and shuffled the fingerprint columns twice; the cap
    becomes a plain array-size filter (the count-join it replaces is gone).
    Struct sort orders by ``id`` first, so the in-array expansion emits
    id_a < id_b directly."""
    bands = fp.select(
        "id",
        *fp_cols,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band_idx"), v.alias("band_val"))
                    for i, v in enumerate(band_vals)
                ]
            )
        ).alias("b"),
    ).select("id", *fp_cols, "b.band_idx", "b.band_val")
    member = F.struct("id", *fp_cols)
    members = bands.groupBy("band_idx", "band_val").agg(
        F.sort_array(F.collect_set(member)).alias("ms")
    )
    if max_bucket_size is not None:
        members = members.filter(F.size("ms") <= max_bucket_size)
    pairs = members.select(F.explode(bucket_pair_expansion(F.col("ms"))).alias("p"))
    ham = hamming_fn(
        {c: F.col(f"p.id_a.{c}") for c in fp_cols},
        {c: F.col(f"p.id_b.{c}") for c in fp_cols},
    ).cast("bigint")
    return (
        pairs.select(
            F.col("p.id_a.id").alias("id_a"),
            F.col("p.id_b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def incremental_jaccard_pairs(
    sh_new: DataFrame, sh_old: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard pairs BETWEEN a new shard and the existing corpus.

    The daily-ingest shape of near-dedup at 100 TB: the corpus side's shingle
    index is written once (bucketed by the shingle key), and each incoming
    shard probes it — the expensive corpus-wide self-join never re-runs, and
    with a bucketed index only the (small) new side shuffles. Accepts hashed
    ``(id, h)`` or string ``(id, shingle)`` streams like :func:`jaccard_pairs`.

    Returns (new_id, old_id, n_shared, jaccard) with jaccard >= threshold.
    """
    key = "h" if "h" in sh_new.columns else "shingle"
    sizes_new = sh_new.groupBy("id").agg(F.count(F.lit(1)).alias("n_new"))
    sizes_old = sh_old.groupBy("id").agg(F.count(F.lit(1)).alias("n_old"))
    shared = (
        sh_new.select(F.col("id").alias("new_id"), key)
        .join(sh_old.select(F.col("id").alias("old_id"), key), key)
        .groupBy("new_id", "old_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(sizes_new.withColumnRenamed("id", "new_id"), "new_id")
        .join(sizes_old.withColumnRenamed("id", "old_id"), "old_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.col("n_new") + F.col("n_old") - F.col("n_shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "old_id", "n_shared", "jaccard")
    )
