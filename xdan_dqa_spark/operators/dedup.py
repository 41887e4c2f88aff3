"""Deduplication operators for web-scale corpora.

The reference dedups only by exact id (anti-join ``src/data_transformer.py:458-473``,
merge ``:303-311``). A 100 TB training-data pipeline needs content dedup —
these operators add the standard stack (exact hash, word-set, MinHash+LSH,
SimHash, n-gram Jaccard) as DataFrame compositions.

Design notes for scale:
  * Exact/word-set dedup is one shuffle on the content key.
  * MinHash-LSH is the linear-time near-dup path: signature (map-side,
    pure exprs) → explode bands (×B rows) → self-join per band bucket →
    verified pairs. No O(n²) anywhere; AQE handles hot buckets.
  * The hash family is md5(prefix:token) — chosen because it's available
    and bit-identical in DuckDB too, so every operator here is
    oracle-checkable end to end.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenize import WS_PLUS

_LOG = logging.getLogger(__name__)

# LSH geometry: K = BANDS * ROWS_PER_BAND min-hashes.
MINHASH_BANDS = 4
MINHASH_ROWS = 2


def cap_band_buckets(bandsdf: DataFrame, id_col: str,
                     max_bucket: int | None) -> DataFrame:
    """Bound LSH band buckets to ``max_bucket`` members each (opt-in).

    Exact-collapse removes byte-identical groups, but a cluster of K
    near-identical-but-not-byte-identical boilerplate pages (template
    spam) still shares band keys, so the bucket self-join emits ~K²
    candidate pairs — at 100 TB such clusters reach millions of members.
    The standard mitigation is a per-(band_id, band_key) representative
    cap: keep the ``max_bucket`` LOWEST ids (deterministic, and the ids
    the min-id survivor policy keeps anyway), drop the rest from the
    candidate stage only. This bounds every bucket's pair output at
    C(max_bucket, 2) at the cost of bounded recall: a dropped member can
    still collide in its other bands, and anything it would have matched
    is ~always also matched by a kept low-id rep of the same cluster.

    No silent caps: the dropped-row and hot-bucket counts are computed
    (one cheap aggregate over the materialized bands) and logged. The
    bands input is localCheckpoint-ed first so the expensive signature
    aggregate runs ONCE for the stats probe, the join's left side, and
    its right side."""
    if max_bucket is None:
        return bandsdf
    if max_bucket < 2:
        raise ValueError(f"max_bucket must be >= 2 (got {max_bucket}); "
                         "a 1-member bucket can emit no pairs at all")
    bandsdf = bandsdf.localCheckpoint(eager=True)
    w = Window.partitionBy("band_id", "band_key").orderBy(id_col)
    ranked = bandsdf.withColumn("_rn", F.row_number().over(w))
    over = ranked.filter(F.col("_rn") > max_bucket)
    stats = over.agg(
        F.count("*").alias("rows_dropped"),
        F.count_distinct("band_id", "band_key").alias("buckets_capped"),
    ).collect()[0]
    if stats["rows_dropped"]:
        _LOG.warning(
            "LSH bucket cap: dropped %d band rows across %d hot buckets "
            "(max_bucket=%d) — bounded-recall mode, lowest ids kept",
            stats["rows_dropped"], stats["buckets_capped"], max_bucket,
        )
    return ranked.filter(F.col("_rn") <= max_bucket).drop("_rn")


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: keep the lowest id per distinct text.

    groupBy(md5) + min(id) + rejoin — one shuffle, no window, and the
    representative choice is deterministic (unlike dropDuplicates)."""
    keyed = df.withColumn("_k", F.md5(F.col(text_col)))
    reps = keyed.groupBy("_k").agg(F.min(id_col).alias(id_col))
    return keyed.join(reps, ["_k", id_col], "left_semi").drop("_k")


def wordset_signature(text_col: str) -> F.Column:
    """Canonical word-set signature: sorted distinct whitespace tokens.
    Jaccard=1 duplicates share it exactly. Tokenizes on the explicit
    Java-``\\s`` class (``tokenize.WS_PLUS`` — RE2-portable, see that
    module) like ``shingles``/SimHash — a tab- or newline-separated
    duplicate of a space-separated doc collapses under all three dedup
    families."""
    words = F.filter(F.split(F.col(text_col), WS_PLUS), lambda w: F.length(w) > 0)
    return F.array_join(F.array_sort(F.array_distinct(words)), " ")


def wordset_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Bag-of-words dedup: docs with identical word SETS collapse to the
    lowest id (near-dup for shuffled/reordered spam pages)."""
    keyed = df.withColumn("_k", F.md5(wordset_signature(text_col)))
    reps = keyed.groupBy("_k").agg(F.min(id_col).alias(id_col))
    return keyed.join(reps, ["_k", id_col], "left_semi").drop("_k")


def shingles(text_col: str, n: int = 3) -> F.Column:
    """Word n-gram shingles as an array column (pure exprs, no UDF).

    Built with arrays_zip over n shifted slices so the lambda body is
    O(1) per element — `transform(sequence(...), i -> slice(words, i, n))`
    would re-evaluate the tokenization per element (O(words²) per doc)."""
    words = F.filter(F.split(F.col(text_col), WS_PLUS), lambda w: F.length(w) > 0)
    count = F.greatest(F.size(words) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(words, i + 1, count) for i in range(n)])
    return F.when(count <= 0, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(zipped, lambda t: F.concat_ws(" ", *[t[str(i)] for i in range(n)]))
    )


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       n_shingle: int = 3,
                       k: int = MINHASH_BANDS * MINHASH_ROWS) -> DataFrame:
    """(id, h0..h{k-1}) min-hash signature table.

    hash_j(s) = md5('<j>:'+s), min taken lexicographically (a
    uniform-permutation proxy; identical bytes in any engine with md5).

    Shape: explode(shingles) → groupBy(id).agg(k mins). The k hashes ride
    one hash-aggregate with map-side partial combine — shuffle rows out =
    docs, not shingles — and stay inside whole-stage codegen. (A nested
    transform/array_min formulation is interpreted per-element and was
    ~100x slower.)"""
    ex = df.select(F.col(id_col), F.explode(shingles(text_col, n_shingle)).alias("_sh"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("_sh")))).alias(f"h{j}")
        for j in range(k)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def minhash_bands(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n_shingle: int = 3, bands: int = MINHASH_BANDS,
                  rows: int = MINHASH_ROWS) -> DataFrame:
    """(id, band_id, band_key) — one row per band per doc."""
    sig = minhash_signatures(df, text_col, id_col, n_shingle, bands * rows)
    # one explode, not a union of per-band selects — a union re-executes
    # the signature aggregate once per band
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws("|", *[F.col(f"h{b * rows + r}") for r in range(rows)])
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(band_structs).alias("_b")).select(
        F.col(id_col), F.col("_b.band_id").alias("band_id"), F.col("_b.band_key").alias("band_key")
    )


def minhash_candidate_pairs(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            max_bucket: int | None = None) -> DataFrame:
    """Distinct candidate near-dup pairs (a<b) that collide in ≥1 LSH band.

    The self-join is per (band_id, band_key) bucket — linear in collisions,
    never all-pairs. ``max_bucket`` (opt-in) additionally bounds each
    bucket to its lowest-id members before the join, for template-spam
    clusters whose members are near-identical without being byte-identical
    (see cap_band_buckets — logged, bounded-recall). Returns (a, b)."""
    bandsdf = cap_band_buckets(
        minhash_bands(df, text_col, id_col), id_col, max_bucket
    )
    left = bandsdf.select(F.col("band_id"), F.col("band_key"), F.col(id_col).alias("a"))
    right = bandsdf.select(F.col("band_id"), F.col("band_key"), F.col(id_col).alias("b"))
    return (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_verify(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", threshold: float = 0.7) -> DataFrame:
    """Exact word-shingle Jaccard on candidate pairs; keeps pairs ≥ threshold.
    Returns (a, b, jaccard).

    Each shingle is keyed to a 60-bit integer (md5 prefix) before the
    pair join: equality-preserving in practice (collision odds across a
    pair's union of ~10⁴ shingles ≈ 1e-11, and a collision perturbs one
    intersect count by 1), so intersect/union sizes — hence the Jaccard
    value — are unchanged, while the join ships fixed 8-byte keys instead
    of shingle strings and compares longs instead of strings. Measured
    same-window on a pair-heavy corpus (2 400 near-dup docs × 300 tokens,
    73 146 candidate pairs, local[16]): raw strings 22.8 s, md5 HEX
    strings 26.4 s (32-char hex is LONGER than the 15.5-char average
    shingle — a pessimization), 60-bit longs 9.2 s (2.5×). The DuckDB
    oracle twin computes the identical key, so values stay bit-green."""
    key = lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")  # noqa: E731
    sh = df.select(
        F.col(id_col),
        F.array_distinct(F.transform(shingles(text_col), key)).alias("_sh"),
    )
    a = sh.select(F.col(id_col).alias("a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col(id_col).alias("b"), F.col("_sh").alias("_shb"))
    joined = pairs.join(a, "a").join(b, "b")
    inter = F.size(F.array_intersect("_sha", "_shb")).cast("double")
    union = F.size(F.array_union("_sha", "_shb")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def containment_verify(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       threshold: float = 0.8) -> DataFrame:
    """Asymmetric shingle CONTAINMENT on candidate pairs: keeps pairs
    where either direction's containment |Sₐ∩S_b| / |S_x| reaches
    ``threshold``. Returns (a, b, cont_a_in_b, cont_b_in_a).

    Containment is the quote/superset detector Jaccard misses: a short
    doc pasted verbatim inside a long one has J = |A|/|B| ≈ 0 but
    C(A→B) = 1 — the aggregation-page / quote-farm signature, and the
    dedup policy question "is this article already inside that digest?".
    Same fixed-8-byte-key discipline as jaccard_verify (shingles ship
    as 60-bit md5-derived longs, never strings); intersect/size counts
    are integers divided once, so values are oracle-exact.

    Recall caveat (documented, inherent): candidates here come from
    Jaccard-tuned MinHash bands, which under-sample high-containment /
    low-Jaccard pairs with extreme size skew. For a dedicated
    containment search at scale, band the SMALL side's full signature
    against per-size-stratum signatures of the large side, or use the
    spans index (span_dedup) whose granularity is containment-native."""
    key = lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")  # noqa: E731
    sh = df.select(
        F.col(id_col),
        F.array_distinct(F.transform(shingles(text_col), key)).alias("_sh"),
    )
    a = sh.select(F.col(id_col).alias("a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col(id_col).alias("b"), F.col("_sh").alias("_shb"))
    joined = pairs.join(a, "a").join(b, "b")
    inter = F.size(F.array_intersect("_sha", "_shb")).cast("double")
    ca = F.when(F.size("_sha") > 0, inter / F.size("_sha").cast("double")).otherwise(F.lit(0.0))
    cb = F.when(F.size("_shb") > 0, inter / F.size("_shb").cast("double")).otherwise(F.lit(0.0))
    out = joined.select(
        "a", "b",
        F.round(ca, 6).alias("cont_a_in_b"),
        F.round(cb, 6).alias("cont_b_in_a"),
    )
    return out.filter(
        (F.col("cont_a_in_b") >= threshold) | (F.col("cont_b_in_a") >= threshold)
    )


def containment_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", threshold: float = 0.8,
                      max_bucket: int | None = None) -> DataFrame:
    """LSH candidates + containment verify end-to-end; (a, b,
    cont_a_in_b, cont_b_in_a) — see containment_verify for semantics
    and the recall caveat."""
    pairs = minhash_candidate_pairs(df, text_col, id_col, max_bucket)
    return containment_verify(df, pairs, text_col, id_col, threshold)


def minhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.7, collapse_exact: bool = True,
                  max_bucket: int | None = None) -> DataFrame:
    """Drop docs that are verified near-duplicates of a lower-id doc.

    Pair-based (not transitive-closure): b is dropped iff some a<b with
    J(a,b) ≥ τ — the standard single-pass web-dedup policy; full connected
    components would need an iterative join (see GraphFrames) and is
    rarely worth it for dedup.

    ``collapse_exact`` (default on) exact-dedups BEFORE the LSH stage: a
    group of byte-identical texts shares every shingle, hence every band
    key, so at web scale (~30% exact dups, Zipf-headed) it forms one hot
    bucket whose candidate-pair count is quadratic in the group size — the
    one skew AQE cannot fix, because the blow-up is in the join OUTPUT.
    Collapsing each group to its min-id representative first is
    value-identical (identical text ⇒ identical shingle set ⇒ identical
    Jaccard to every other doc, and the min-id rep drops exactly the rows
    the pair policy would), removes the quadratic bucket, and skips
    shingling the duplicates. Verified value-identical under 10%-identical
    skew in tests/test_dedup.py.

    ``max_bucket`` opts into bounded LSH buckets for near-identical
    template-spam clusters (see cap_band_buckets)."""
    base = exact_dedup(df, text_col, id_col) if collapse_exact else df
    pairs = minhash_candidate_pairs(base, text_col, id_col, max_bucket)
    dups = (
        jaccard_verify(base, pairs, text_col, id_col, threshold)
        .select(F.col("b").alias(id_col))
        .distinct()
    )
    return base.join(dups, id_col, "left_anti")


def levenshtein_refine(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", prefix: int = 200,
                       max_ratio: float = 0.4) -> DataFrame:
    """Edit-distance verify of candidate near-dup pairs (the fuzzy-dedup
    refine for small character-level edits — boilerplate with injected
    dates/ids — that set-based Jaccard over-penalizes).

    Keeps (a, b, lev) where levenshtein(prefix_a, prefix_b) ≤ max_ratio ×
    max(len_a, len_b). Two scale guards: (1) candidates come from LSH
    banding, never all-pairs; (2) the comparison window is a fixed
    ``prefix`` (default 200 chars), bounding per-pair cost at O(prefix²)
    regardless of document length — full-text edit distance on a pair of
    100 KB docs is 10¹⁰ cell updates, a per-pair cost no cluster survives.
    The prefix substring is projected BEFORE the pair join so the shuffle
    ships ≤ prefix chars per side, not whole documents. ``levenshtein`` is
    a JVM built-in on the Spark side and computes the classic
    (unit-cost) distance — identical to DuckDB's, so the values are
    oracle-checkable bit-for-bit."""
    p = F.substring(F.coalesce(F.col(text_col), F.lit("")), 1, prefix)
    t = df.select(F.col(id_col), p.alias("_p"))
    a = t.select(F.col(id_col).alias("a"), F.col("_p").alias("_pa"))
    b = t.select(F.col(id_col).alias("b"), F.col("_p").alias("_pb"))
    joined = pairs.join(a, "a").join(b, "b").select(
        "a", "b",
        F.levenshtein("_pa", "_pb").alias("lev"),
        F.greatest(F.length("_pa"), F.length("_pb")).alias("_mx"),
    )
    keep = joined.filter(
        F.col("lev").cast("double") <= F.lit(max_ratio) * F.col("_mx").cast("double")
    )
    return keep.select("a", "b", "lev")


def levenshtein_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      prefix: int = 200, max_ratio: float = 0.4,
                      max_bucket: int | None = None) -> DataFrame:
    """LSH candidates + edit-distance refine end-to-end; (a, b, lev)."""
    pairs = minhash_candidate_pairs(df, text_col, id_col, max_bucket)
    return levenshtein_refine(df, pairs, text_col, id_col, prefix, max_ratio)


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.5,
                        max_bucket: int | None = None) -> DataFrame:
    """All-pairs n-gram Jaccard via LSH candidates (the scalable route to
    'n-gram Jaccard dedup'); returns (a, b, jaccard)."""
    pairs = minhash_candidate_pairs(df, text_col, id_col, max_bucket)
    return jaccard_verify(df, pairs, text_col, id_col, threshold)


# ------------------------------------------------- connected components

def connected_components(pairs: DataFrame, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 25) -> DataFrame:
    """(node, comp) labels: comp = min doc id reachable through the pair
    graph — the transitive-closure upgrade over pair-based dedup policy.

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels; converges in O(component
    diameter) rounds (near-dup clusters are shallow — a chain A~B~C is
    diameter 2). Each round is one shuffle join + aggregate; lineage is
    cut per round with localCheckpoint so the plan stays O(1) deep. For
    adversarially long chains the alternating large-star/small-star
    variant (Kiveris et al. 2014) drops rounds to O(log²n); not needed
    for dedup-shaped graphs."""
    e = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    edges = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().localCheckpoint(eager=True)
    labels = edges.select("u").distinct().withColumn("comp", F.col("u"))
    changed = 1
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # ONE job per round: the convergence probe itself materializes the
        # LAZY localCheckpoint (a FULL count — a limit(1) short-circuit
        # would checkpoint only the partitions it touched), and the
        # carried previous label makes the probe a scan, not a join. The
        # earlier eager-checkpoint + probe shape cost two jobs per round;
        # the round-1 shape (probe-side join back to `labels`) cost three.
        new_labels = labels.join(nbr_min, "u", "left").select(
            "u",
            F.col("comp").alias("_old"),
            F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
        ).localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("comp") != F.col("_old")).count()
        labels = new_labels.select("u", "comp")
        if changed == 0:
            break
    if changed != 0:
        import warnings

        warnings.warn(
            f"connected_components: not converged after {max_iters} rounds; "
            "labels may split long chains — raise max_iters or switch to the "
            "large-star/small-star variant",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("u").alias("node"), "comp")


def cc_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             threshold: float = 0.7, collapse_exact: bool = True,
             max_bucket: int | None = None) -> DataFrame:
    """Transitive near-dup dedup: verified MinHash pairs become edges, each
    connected component collapses to its minimum doc id. Unlike the
    pair-based policy (minhash_dedup), a chain A~B~C with J(A,C) < τ still
    collapses to {A} — B links the cluster.

    ``collapse_exact`` pre-collapses byte-identical groups to their min-id
    rep (see minhash_dedup): value-identical here too — an identical
    member has exactly the rep's neighbors, so component connectivity and
    the component-min survivor are unchanged — while removing the
    quadratic hot band bucket AND its quadratic edge set from the CC
    input."""
    base = exact_dedup(df, text_col, id_col) if collapse_exact else df
    pairs = jaccard_verify(base,
                           minhash_candidate_pairs(base, text_col, id_col,
                                                   max_bucket),
                           text_col, id_col, threshold)
    labels = connected_components(pairs.select("a", "b"))
    drop = labels.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return base.join(drop, id_col, "left_anti")


# ---------------------------------------------------------------- SimHash

# 64-bit fingerprints: the per-token hash is the first 16 md5 hex chars,
# carried as TWO 32-bit halves (bits 0-31 from hex[1:8], bits 32-63 from
# hex[9:16]) because the composed 64-bit value doesn't fit a signed long
# unsigned — each half casts cleanly in any engine (DuckDB:
# CAST('0x'||substr(md5(w),…,8) AS BIGINT)), so the whole construction
# stays oracle-checkable. 4 bands × 16 bits: hamming ≤ 3 ⇒ ≥1 shared band
# (pigeonhole), and each band keys 65 536 buckets. Capacity math: the
# expected candidate-pair output of one band over n docs with uniformly
# spread fingerprints is ~n²/2/2^16 per band — at 10⁸ docs that is ~10¹¹
# pairs/band from RANDOM collisions alone, so at web scale the band key
# must be composed with a pre-partitioning key (language, length bucket)
# or bounded with ``max_bucket``; the earlier 60-bit/4×15-bit layout hit
# the same wall 2× sooner (32 768 buckets/band). Round 1 used 32-bit fp /
# 8-bit bands — only 256 buckets per band.
SIMHASH_BITS = 64
_SIMHASH_LANES = 16          # 4 bit-counters per long at 16-bit offsets
# Counter headroom bound: the top (r=3) counter occupies bits 48-63 of the
# packed long INCLUDING the sign bit, so the lane sum must stay < 2^63.
# With <= 32767 tokens, max packed value = 32767 * (2^48 + 2^32 + 2^16 + 1)
# < 2^63 — safe under ANSI mode (which PySpark 4 enables by default and
# would abort the job with ARITHMETIC_OVERFLOW at 65535).
_SIMHASH_MAX_TOKENS = 32767


def simhash_fingerprints(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """(id, _fp) SimHash fingerprint table (Charikar 2002).

    Each token votes ±1 per bit using bits of its 64-bit md5 hash (two
    32-bit halves — see the capacity note above); the fingerprint sets
    bit i iff the vote sum is positive (ones-count strictly > half the
    tokens). Shaped as explode(words) → ONE hash-aggregate of 16 packed
    lanes — each lane sums 4 bit-counters at 16-bit offsets of one long,
    so the aggregation buffer is 16 longs + a count (the round-1 shape
    needed 32 separate conditional sums for half the fingerprint width).
    Map-side combine keeps shuffle rows = docs. Tokens beyond 32767 are
    ignored (sign-bit headroom on the top packed counter — see
    _SIMHASH_MAX_TOKENS). Bit 63 of the fingerprint lands in the long's
    sign bit (its addend is −2^63, applied LAST so every ANSI-checked
    partial sum stays in range); band extraction masks after the
    arithmetic shift, so sign-fill never leaks into a band key."""
    words = F.slice(
        F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), WS_PLUS),
                 lambda w: F.length(w) > 0),
        1, _SIMHASH_MAX_TOKENS,
    )
    ex = (
        df.select(F.col(id_col), F.explode(words).alias("_w"))
        .withColumn("_md5", F.md5(F.col("_w")))
        .withColumn("_hl", F.conv(F.substring(F.col("_md5"), 1, 8), 16, 10).cast("long"))
        .withColumn("_hh", F.conv(F.substring(F.col("_md5"), 9, 8), 16, 10).cast("long"))
    )
    lanes = []
    for j in range(_SIMHASH_LANES):
        lane = None
        for r in range(4):
            i = 4 * j + r
            src, shift = ("_hl", i) if i < 32 else ("_hh", i - 32)
            bit = F.shiftright(F.col(src), shift).bitwiseAND(F.lit(1))
            term = bit.cast("long") * F.lit(1 << (16 * r)).cast("long")
            lane = term if lane is None else lane + term
        lanes.append(F.sum(lane).alias(f"l{j}"))
    votes = ex.groupBy(id_col).agg(*lanes, F.count("*").alias("_n"))
    fp = None
    for i in range(SIMHASH_BITS):
        j, r = divmod(i, 4)
        c = F.shiftright(F.col(f"l{j}"), 16 * r).bitwiseAND(F.lit(0xFFFF))
        # bit 63's addend is int64 min; added last, partial sums of the
        # lower 63 positive terms max out at 2^63-1 — no ANSI overflow.
        addend = (1 << i) if i < 63 else -(1 << 63)
        term = F.when(c * 2 > F.col("_n"), F.lit(addend).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    return votes.select(F.col(id_col), fp.alias("_fp"))


def simhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, collapse_exact: bool = True,
                  max_bucket: int | None = None) -> DataFrame:
    """Near-dup dedup on SimHash: candidates via 4-way band blocking
    (docs within hamming distance d ≤ 3 share ≥1 of 4 16-bit bands), then
    exact popcount verify. Keeps the lowest id per near-dup pair.

    ``collapse_exact`` (default on) exact-dedups BEFORE fingerprinting,
    exactly like minhash_dedup/cc_dedup: byte-identical texts have
    identical fingerprints, hence share ALL four bands, so an identical
    group forms one hot bucket whose candidate-pair output is quadratic
    in the group size — the join-OUTPUT blow-up AQE cannot split.
    Value-identical: identical text ⇒ identical fingerprint ⇒ identical
    hamming distance to every other doc, so the min-id rep drops exactly
    the rows the pair policy would (verified under 10%-identical skew in
    tests/test_dedup.py). ``max_bucket`` additionally bounds each band
    bucket for near-identical template clusters (see cap_band_buckets)."""
    base = exact_dedup(df, text_col, id_col) if collapse_exact else df
    fp = simhash_fingerprints(base, text_col, id_col)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftright(F.col("_fp"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("band_key"),
            )
            for b in range(4)
        ]
    )
    bandsdf = fp.select(F.col(id_col), F.explode(band_structs).alias("_b")).select(
        F.col(id_col), F.col("_b.band_id").alias("band_id"), F.col("_b.band_key").alias("band_key")
    )
    bandsdf = cap_band_buckets(bandsdf, id_col, max_bucket)
    left = bandsdf.select("band_id", "band_key", F.col(id_col).alias("a"))
    right = bandsdf.select("band_id", "band_key", F.col(id_col).alias("b"))
    cand = (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    fa = fp.select(F.col(id_col).alias("a"), F.col("_fp").alias("_fa"))
    fb = fp.select(F.col(id_col).alias("b"), F.col("_fp").alias("_fb"))
    ham = F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb")))
    dups = (
        cand.join(fa, "a").join(fb, "b")
        .filter(ham <= max_hamming)
        .select(F.col("b").alias(id_col))
        .distinct()
    )
    return base.join(dups, id_col, "left_anti")


def span_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               span_tokens: int = 10) -> DataFrame:
    """Corpus-wide exact duplicate-SPAN scrub: segment every document into
    non-overlapping ``span_tokens``-token spans, keep only the FIRST
    occurrence (lowest ``(doc_id, pos)``) of each distinct span anywhere
    in the corpus, and rebuild each document from its surviving spans.

    This is the span-granularity exact dedup of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better") —
    document-level dedup misses the boilerplate PARAGRAPHS (navbars,
    cookie banners, license blurbs) that repeat across otherwise-distinct
    pages; span-level scrubbing removes exactly those. (The paper's
    suffix-array substring dedup needs a global sort of every suffix;
    fixed non-overlapping spans are the shuffle-friendly approximation —
    a duplicated region of length L is caught up to span alignment,
    ≥ L − 2·span_tokens of it guaranteed.)

    Returns (doc_id, n_spans, n_spans_kept, text_clean) for EVERY input
    doc (empty/whitespace-only docs get 0/0/''). A span repeated WITHIN
    one doc collapses too (its 2nd occurrence has a higher pos).

    Scale shape: one explode (rows = tokens/span_tokens, ~10× fewer than
    a shingle explode), then the first-occurrence rule is a
    groupBy(span_hash).agg(min(struct(id, pos))) + rejoin — NOT a
    row_number window, because a span repeated 10⁹ times (a universal
    cookie banner at web scale) would put 10⁹ rows into ONE window
    partition's sort, while the min-struct aggregate folds it map-side
    and AQE can skew-split the flag join (output is 1 row per input row
    — no blow-up). Reconstruction is one groupBy(doc_id) whose state is
    bounded by the doc's own span count."""
    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1 (got {span_tokens})")
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), WS_PLUS),
        lambda w: F.length(w) > 0,
    )
    w = df.select(F.col(id_col), words.alias("_ws"))
    n_seg = F.ceil(F.size("_ws") / F.lit(span_tokens)).cast("int")
    # sequence(0, -1) would DESCEND in Spark — guard the empty-doc case.
    idx = F.when(n_seg > 0, F.sequence(F.lit(0), n_seg - 1)).otherwise(
        F.array().cast("array<int>")
    )
    seg = lambda i: F.concat_ws(  # noqa: E731
        " ", F.slice(F.col("_ws"), i * span_tokens + 1, span_tokens)
    )
    ex = (
        w.select(
            F.col(id_col),
            F.explode(
                F.transform(idx, lambda i: F.struct(i.alias("pos"), seg(i).alias("seg")))
            ).alias("_s"),
        )
        .select(
            F.col(id_col),
            F.col("_s.pos").alias("pos"),
            F.col("_s.seg").alias("seg"),
            F.md5(F.col("_s.seg")).alias("_k"),
        )
    )
    firsts = ex.groupBy("_k").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first")
    )
    flagged = ex.join(firsts, "_k").select(
        F.col(id_col),
        F.col("pos"),
        F.col("seg"),
        (
            (F.col(id_col) == F.col(f"_first.{id_col}"))
            & (F.col("pos") == F.col("_first.pos"))
        ).alias("_keep"),
    )
    agg = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("n_spans_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct(F.col("pos"), F.col("seg")))
                    )
                ),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("text_clean"),
    )
    return df.select(F.col(id_col)).join(agg, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
        F.coalesce(F.col("n_spans_kept"), F.lit(0)).alias("n_spans_kept"),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
    )


def span_dedup_within(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      span_tokens: int = 10) -> DataFrame:
    """MAP-ONLY within-document duplicate-span scrub: drop every repeat of
    a span that already occurred EARLIER IN THE SAME DOC (template-spam
    self-repetition — SEO pages that loop the same paragraph dozens of
    times). The corpus-wide variant (``span_dedup``) needs a shuffle on
    the span hash; this one needs NO exchange at all — each doc is
    scrubbed from its own spans with higher-order array functions, so it
    composes into the flagship's map-only scoring stage for free.

    Same output contract as span_dedup: (doc_id, n_spans, n_spans_kept,
    text_clean). Per-doc cost is O(k²) span compares with k =
    tokens/span_tokens (a 100 KB doc ⇒ k≈2 000 ⇒ 4M compares — fine);
    for adversarially huge single docs, md5 the spans first so each
    compare is 32 bytes."""
    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1 (got {span_tokens})")
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), WS_PLUS),
        lambda w: F.length(w) > 0,
    )
    w = df.select(F.col(id_col), words.alias("_ws"))
    n_seg = F.ceil(F.size("_ws") / F.lit(span_tokens)).cast("int")
    idx = F.when(n_seg > 0, F.sequence(F.lit(0), n_seg - 1)).otherwise(
        F.array().cast("array<int>")
    )
    segs = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(F.col("_ws"), i * span_tokens + 1,
                                                span_tokens))
    )
    staged = w.select(F.col(id_col), segs.alias("_segs"))
    # keep seg i iff it does not appear among spans 0..i-1 (array_position
    # over the length-i prefix; 0 = absent). The (x, i) filter lambda's
    # index is 0-based.
    kept = F.filter(
        F.col("_segs"),
        lambda s, i: F.array_position(F.slice(F.col("_segs"), 1, i), s) == 0,
    )
    return staged.select(
        F.col(id_col),
        F.size("_segs").alias("n_spans"),
        F.size(kept).alias("n_spans_kept"),
        F.array_join(kept, " ").alias("text_clean"),
    )


def canonical_dedup(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Exact dedup after canonical whitespace/case normalization: keep
    the lowest id among documents whose ``lower(text)`` with every
    whitespace run collapsed to one space (and edges trimmed) is
    byte-identical. Catches the trivially-reformatted copies exact
    dedup misses (re-wrapped lines, CASE-variant mirrors, indentation
    churn) without any near-dup machinery — the cheap first rung of the
    CCNet-style dedup ladder, run before MinHash.

    Same scale shape as ``exact_dedup``: the canonical form is hashed to
    a fixed 32-byte key map-side (the document text itself never ships),
    then one groupBy(md5)+min(id)+left_semi shuffle. The whitespace
    class is the engine-identical 6-char set (functions/tokenize.py), so
    the whole operator is oracle-checkable.
    """
    canon = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), WS_PLUS, " "
        )
    )
    keyed = df.withColumn("_k", F.md5(canon))
    reps = keyed.groupBy("_k").agg(F.min(id_col).alias(id_col))
    return keyed.join(reps, ["_k", id_col], "left_semi").drop("_k")


def minhash_index_write(df: DataFrame, path: str, text_col: str = "text",
                        id_col: str = "doc_id", mode: str = "overwrite",
                        n_shingle: int = 3) -> None:
    """Persist the corpus MinHash band table to parquet, hive-partitioned
    by ``band_id``.

    This is the corpus-side half of incremental dedup: at 100 TB you
    LSH the historical corpus ONCE and append each ingested batch's
    bands (``mode="append"``), instead of re-shingling petabytes per
    increment. Partitioning by band_id means a probe that joins on
    (band_id, band_key) prunes to the matching band directories; within
    a band the key is uniform md5, so files split evenly. The row
    payload is (doc_id, band_key) — 8 bytes + 32 hex chars — so the
    index is ~1/1000th of the corpus bytes."""
    minhash_bands(df, text_col, id_col, n_shingle).write.partitionBy(
        "band_id"
    ).mode(mode).parquet(path)


def minhash_incremental_dedup(new_df: DataFrame, corpus_df: DataFrame,
                              index_bands: DataFrame,
                              text_col: str = "text", id_col: str = "doc_id",
                              threshold: float = 0.7,
                              collapse_exact: bool = True,
                              max_bucket: int | None = None) -> DataFrame:
    """Dedup a NEW batch against an already-indexed corpus without
    re-LSHing the corpus — the steady-state shape of web-crawl ingestion
    (the reference re-reads the full hub dataset per run,
    src/data_transformer.py:458-473; here the historical work is a
    persisted band table from :func:`minhash_index_write`).

    Policy (mirrors :func:`minhash_dedup`): a new doc is dropped iff it
    is a verified near-dup (shingle Jaccard ≥ ``threshold``) of ANY
    corpus doc, or of a lower-id doc within its own batch. Exact
    duplicates of corpus docs need no special case: identical text ⇒
    identical signature ⇒ shared bands ⇒ candidate pair with J = 1.

    Scale shape — the whole point is what does NOT get touched:
      * corpus shingling: never re-run; only ``index_bands`` is read,
        and the band join prunes to the new batch's (band_id, band_key)
        set (partition pruning on band_id when the index is read from
        its hive layout).
      * corpus text: read ONLY for candidate ids — a left-semi prune
        before the verify join, so at 100 TB the verify touches the
        handful of colliding corpus rows, not the corpus.
      * new batch: exact-collapsed first (default), then the standard
        band self-join for within-batch pairs; ``max_bucket`` bounds
        template-spam buckets on BOTH the self-join and the index probe
        (see cap_band_buckets).
      * verify: cross and within-batch pairs are unioned and verified in
        ONE jaccard pass, so the batch is shingled once.

    Corpus and batch ids must be DISJOINT (they are distinct ingests;
    id collisions would conflate verify texts).

    Returns the surviving rows of ``new_df`` (post exact-collapse)."""
    base = exact_dedup(new_df, text_col, id_col) if collapse_exact else new_df
    new_bands = cap_band_buckets(
        minhash_bands(base, text_col, id_col), id_col, max_bucket
    )
    old_bands = cap_band_buckets(index_bands, id_col, max_bucket)

    # cross candidates: one distinct (old a, new b) per band collision
    probe = new_bands.select("band_id", "band_key", F.col(id_col).alias("b"))
    idx = old_bands.select("band_id", "band_key", F.col(id_col).alias("a"))
    cross = (
        probe.join(idx, ["band_id", "band_key"]).select("a", "b").distinct()
    )
    # within-batch candidates: standard lowest-id-wins band self-join
    left = new_bands.select("band_id", "band_key", F.col(id_col).alias("a"))
    right = new_bands.select("band_id", "band_key", F.col(id_col).alias("b"))
    within = (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    pairs = cross.unionByName(within).distinct()

    # verify texts: corpus pruned to candidate ids BEFORE the pair join
    cand_old = corpus_df.join(
        cross.select(F.col("a").alias(id_col)).distinct(), id_col, "left_semi"
    )
    both = cand_old.select(F.col(id_col), F.col(text_col)).unionByName(
        base.select(F.col(id_col), F.col(text_col))
    )
    dropped = (
        jaccard_verify(both, pairs, text_col, id_col, threshold)
        .select(F.col("b").alias(id_col))
        .distinct()
    )
    return base.join(dropped, id_col, "left_anti")


def minhash_calibration(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        k: int = MINHASH_BANDS * MINHASH_ROWS) -> DataFrame:
    """Sketch-calibration report: for every LSH candidate pair, the
    MinHash Jaccard ESTIMATE (matching-signature fraction, the
    unbiased estimator the banding geometry is built on) next to the
    EXACT shingle Jaccard. Returns (a, b, n_match, est, jaccard).

    This is the diagnostics query a dedup rollout runs before trusting
    a threshold: if |est − jaccard| drifts, the shingle granularity or
    k is wrong for the corpus (e.g. tiny docs → high-variance
    estimates), and the keep/drop threshold must move. Estimator
    variance is J(1−J)/k by construction — the report makes that
    visible on real pairs instead of asserted.

    Scale: candidates only (never all-pairs); the signature table is
    ONE map-side-combined aggregate reused by the pair join; counts
    are integers divided once."""
    sig = minhash_signatures(df, text_col, id_col, k=k)
    pairs = minhash_candidate_pairs(df, text_col, id_col)
    sa = sig.select(F.col(id_col).alias("a"),
                    *[F.col(f"h{j}").alias(f"_a{j}") for j in range(k)])
    sb = sig.select(F.col(id_col).alias("b"),
                    *[F.col(f"h{j}").alias(f"_b{j}") for j in range(k)])
    n_match = None
    for j in range(k):
        term = (F.col(f"_a{j}") == F.col(f"_b{j}")).cast("long")
        n_match = term if n_match is None else n_match + term
    est_tbl = (
        pairs.join(sa, "a").join(sb, "b")
        .select("a", "b", n_match.alias("n_match"))
        .withColumn(
            "est",
            F.round(F.col("n_match").cast("double") / F.lit(float(k)), 6),
        )
    )
    exact = jaccard_verify(df, pairs, text_col, id_col, threshold=0.0).select(
        "a", "b", F.round(F.col("jaccard"), 6).alias("jaccard")
    )
    return est_tbl.join(exact, ["a", "b"])


def dedup_provenance(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", threshold: float = 0.7,
                     max_hamming: int = 3) -> DataFrame:
    """Per-document dedup PROVENANCE dashboard: for every input doc,
    whether each family keeps it — exact hash, word-set, MinHash-
    Jaccard pair policy, SimHash hamming — plus how many families drop
    it. The triage report a dedup rollout runs to pick a policy: docs
    dropped by all four are safe kills, docs dropped only by word-set
    are reorderings worth eyeballing, and family disagreement rates
    tell you which knob (threshold, hamming radius) is doing the work.

    Diagnostics-grade cost, documented: this executes all four dedup
    pipelines over the input (each with its own documented scale
    shape) and four id-keyed left joins — run it on a sample or a
    shard, not the full 100 TB, which is how such dashboards are used.
    Output is one row per input doc regardless of family verdicts."""
    fams = {
        "exact": exact_dedup(df, text_col, id_col),
        "wordset": wordset_dedup(df, text_col, id_col),
        "minhash": minhash_dedup(df, text_col, id_col, threshold),
        "simhash": simhash_dedup(df, text_col, id_col, max_hamming),
    }
    out = df.select(F.col(id_col))
    kept_cols = []
    for name, kept in fams.items():
        marker = kept.select(F.col(id_col)).withColumn(
            f"_k_{name}", F.lit(True)
        )
        out = out.join(marker, id_col, "left")
        kept_cols.append(
            F.coalesce(F.col(f"_k_{name}"), F.lit(False)).alias(f"kept_{name}")
        )
    res = out.select(F.col(id_col), *kept_cols)
    n_dropped = F.lit(len(fams)) - sum(
        F.col(f"kept_{n}").cast("int") for n in fams
    )
    return res.withColumn("n_families_dropped", n_dropped)


def exact_dedup_best(df: DataFrame, score_col: str, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup keeping the BEST-SCORING member of each
    byte-identical cluster (ties → lowest id) — the quality-aware
    upgrade of :func:`exact_dedup`'s min-id policy: identical TEXT can
    carry different metadata (crawl freshness, source reputation, a
    quality score), and the survivor should be the copy worth keeping,
    not the accidental id minimum.

    Scale shape: the argmax is max(struct(score, −id)) — ONE map-side-
    combinable hash aggregate whose per-cluster state is a single
    struct, then a left-semi rejoin. Deliberately NOT a row_number
    window: at web scale an identical-text cluster is the Zipf head
    (one cookie-banner page duplicated 10⁹×), and a window would sort
    that entire cluster in one task, while the struct-max folds it
    map-side. Selection is deterministic: lexicographic (score, −id)
    max ⇒ highest score, ties to the LOWEST id."""
    keyed = df.withColumn("_k", F.md5(F.col(text_col)))
    reps = keyed.groupBy("_k").agg(
        F.max(F.struct(F.col(score_col).alias("_s"),
                       (-F.col(id_col)).alias("_ni"))).alias("_m")
    ).select("_k", (-F.col("_m._ni")).alias(id_col))
    return keyed.join(reps, ["_k", id_col], "left_semi").drop("_k")


def prefix_filter_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        threshold_num: int = 4,
                        threshold_den: int = 5) -> DataFrame:
    """EXACT token-set similarity join via prefix filtering (the
    PPJoin family, Xiao et al. 2008): every pair of documents whose
    distinct-token Jaccard is >= threshold (default 4/5 = 0.8), with
    GUARANTEED recall 1.0 — the exact complement to MinHash-LSH, whose
    banding misses a tunable fraction of true pairs. Returns
    (a, b, n_shared, jaccard).

    The filter: order the vocabulary by ascending document frequency
    (rarest first); a pair with Jaccard >= t MUST share a token within
    each side's first |s| - ceil(t*|s|) + 1 rarest tokens (pigeonhole
    on the overlap bound), so candidates come from an equi-join on
    PREFIX tokens only — and prefix tokens are by construction the
    RARE ones, so join buckets stay small exactly where a naive
    token join would explode (the stopword bucket never joins).

    Determinism/exactness discipline: the prefix length is pure
    integer arithmetic (s - (num*s + den - 1) DIV den + 1 — float
    s*(1-t) straddles a ULP at integer boundaries); the verify is
    all-integer (c shared tokens, sizes sa/sb; keep iff
    c*den >= num*(sa+sb-c) — an exact rational boundary), and jaccard
    is reported with ONE terminal division. Global-frequency ties
    break by token asc so the vocabulary order is total.

    Scale shape: the vocabulary rank is a window over the VOCAB table
    (not the corpus; ~10^7 rows at web scale — a single sorted task;
    at larger vocabularies replace with a two-level (df-bucket, token)
    composite rank, value-identical for the filter's purpose); per-doc
    rarity ranks ride doc-partitioned windows bounded by doc length;
    the candidate join is equi-keyed on rare tokens; the verify join
    ships token rows for candidate pairs only."""
    if not (0 < threshold_num <= threshold_den):
        raise ValueError(
            f"threshold must be in (0, 1]: {threshold_num}/{threshold_den}")
    words = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), WS_PLUS),
                     lambda w: F.length(w) > 0)
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(words)).alias("term")
    )
    vocab = tok.groupBy("term").agg(F.count("*").alias("_df"))
    wv = Window.orderBy(F.asc("_df"), F.asc("term"))
    ranks = vocab.select("term", F.row_number().over(wv).alias("_grank"))
    sizes = tok.groupBy(id_col).agg(F.count("*").alias("_s"))
    plen = (
        F.col("_s")
        - F.expr(f"({threshold_num} * _s + {threshold_den - 1}) "
                 f"DIV {threshold_den}")
        + F.lit(1)
    )
    wd = Window.partitionBy(id_col).orderBy("_grank")
    pref = (
        tok.join(ranks, "term")
        .join(sizes, id_col)
        .withColumn("_dr", F.row_number().over(wd))
        .filter(F.col("_dr") <= plen)
        .select(F.col(id_col), F.col("term"), F.col("_s"))
    )
    # PPJoin's SIZE filter rides the candidate join: J(A,B) >= t forces
    # t*|B| <= |A| <= |B|/t, so size-incompatible prefix collisions are
    # dropped BEFORE the distinct/verify (integer cross-multiply — no
    # float boundary). On a template corpus this cut candidates 3x in
    # measurement; on Zipfian corpora more.
    pa = pref.select(F.col("term"), F.col(id_col).alias("a"),
                     F.col("_s").alias("_pa"))
    pb = pref.select(F.col("term"), F.col(id_col).alias("b"),
                     F.col("_s").alias("_pb"))
    cand = (
        pa.join(pb, "term")
        .filter(
            (F.col("a") < F.col("b"))
            & (F.col("_pb") * threshold_den >= F.col("_pa") * threshold_num)
            & (F.col("_pa") * threshold_den >= F.col("_pb") * threshold_num)
        )
        .select("a", "b")
        .distinct()
    )
    ta = tok.select(F.col(id_col).alias("a"), "term")
    tb = tok.select(F.col(id_col).alias("b"), "term")
    shared = (
        cand.join(ta, "a").join(tb, ["b", "term"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("_s").alias("_sa"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("_s").alias("_sb"))
    keep = (
        shared.join(sa, "a").join(sb, "b")
        .filter(
            F.col("n_shared") * threshold_den
            >= F.lit(threshold_num) * (F.col("_sa") + F.col("_sb") - F.col("n_shared"))
        )
    )
    return keep.select(
        "a", "b", "n_shared",
        F.round(
            F.col("n_shared").cast("double")
            / (F.col("_sa") + F.col("_sb") - F.col("n_shared")).cast("double"),
            6,
        ).alias("jaccard"),
    )


# ------------------------------------------- content-defined chunking

def cdc_chunks(text_col: str, mask_bits: int = 4,
               salt: str = "cdc") -> F.Column:
    """Array of CONTENT-DEFINED chunks of a document: the token stream
    splits after every token whose 32-bit md5 hash is ≡ 0 mod
    2^mask_bits (expected chunk length 2^mask_bits tokens). This is the
    Rabin/FastCDC boundary rule at token granularity — the property
    fixed spans (span_dedup) lack is SHIFT RESISTANCE: inserting one
    token early in a doc shifts every fixed-span boundary after it, but
    content-defined boundaries re-synchronize at the next boundary
    token, so all later chunks hash identically again. That is what
    makes chunk-grain dedup work on near-identical pages with small
    head edits (cookie notices, injected dates).

    Pure-expression construction, O(tokens) per doc and map-only: the
    boundary POSITIONS are one indexed transform+filter, chunk (start,
    end) ranges are a zip of the shifted boundary list, and each chunk
    is one slice+concat — no per-element array rebuilding (an
    aggregate() fold that appends to an accumulator array would copy
    the accumulator per boundary, O(tokens²/2^mask_bits))."""
    if mask_bits < 1:
        raise ValueError(f"mask_bits must be >= 1, got {mask_bits}")
    mod = 1 << mask_bits
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), WS_PLUS),
        lambda w: F.length(w) > 0,
    )

    def is_boundary(w):
        h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}:"), w)), 1, 8),
                   16, 10).cast("long")
        return h % mod == 0

    # 1-based positions of boundary tokens (Spark transform index is
    # 0-based; the DuckDB twin's lambda index is 1-based — hence i+1).
    bpos = F.filter(
        F.transform(words,
                    lambda w, i: F.when(is_boundary(w), i + 1).otherwise(F.lit(-1))),
        lambda p: p > 0,
    )
    starts = F.concat(F.array(F.lit(1)), F.transform(bpos, lambda p: p + 1))
    ends = F.concat(bpos, F.array(F.size(words)))
    return F.filter(
        F.zip_with(
            starts, ends,
            lambda s, e: F.when(
                s <= e, F.concat_ws(" ", F.slice(words, s, e - s + 1))
            ),
        ),
        lambda c: c.isNotNull(),
    )


def cdc_chunk_census(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", mask_bits: int = 4) -> DataFrame:
    """Per-document chunk-grain duplication census over content-defined
    chunks: (doc_id, n_chunks, n_dup_chunks, dup_frac), where a chunk
    is "dup" iff its text occurs in at least one OTHER document (or
    more than once overall). The chunk-level complement to exact/
    near-dup dedup — it measures how much of each page is boilerplate
    shared with the rest of the corpus, robust to small edits because
    the chunking is content-defined (see cdc_chunks).

    Scale shape: chunks are built map-side (O(tokens) pure exprs), the
    census is explode (rows ≈ tokens/2^mask_bits) → ONE md5-keyed
    aggregate counting occurrences and distinct docs — map-side
    combinable; a universal chunk (cookie banner) is one hot reduce key
    whose partial counts fold before the exchange, never a blown-up
    join output. The rejoin back to chunks is at (hash) grain with
    output = input rows."""
    ch = df.select(
        F.col(id_col),
        F.explode(cdc_chunks(text_col, mask_bits)).alias("_c"),
    ).select(F.col(id_col), F.md5(F.col("_c")).alias("_h"))
    census = ch.groupBy("_h").agg(
        F.count("*").alias("_n_occ"),
        F.count_distinct(id_col).alias("_n_docs"),
    )
    flagged = ch.join(census, "_h").groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        F.sum(
            F.when((F.col("_n_docs") > 1) | (F.col("_n_occ") > 1), 1).otherwise(0)
        ).alias("n_dup_chunks"),
    )
    return df.select(F.col(id_col)).join(flagged, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_chunks"), F.lit(0)).alias("n_chunks"),
        F.coalesce(F.col("n_dup_chunks"), F.lit(0)).alias("n_dup_chunks"),
        F.round(
            F.coalesce(F.col("n_dup_chunks"), F.lit(0)).cast("double")
            / F.greatest(F.coalesce(F.col("n_chunks"), F.lit(0)), F.lit(1)).cast("double"),
            6,
        ).alias("dup_frac"),
    )


def cc_dedup_best(df: DataFrame, score_col: str, text_col: str = "text",
                  id_col: str = "doc_id", threshold: float = 0.7,
                  collapse_exact: bool = True,
                  max_bucket: int | None = None) -> DataFrame:
    """Transitive near-dup dedup keeping the BEST-SCORING member of each
    connected component (ties → lowest id) — the quality-aware upgrade
    of :func:`cc_dedup`'s min-id survivor, mirroring what
    :func:`exact_dedup_best` does for byte-identical clusters: in a
    near-dup cluster the copies differ (truncated mirrors, ad-injected
    variants), and the survivor should be the longest / highest-quality
    copy, not the accidental id minimum.

    Survivor selection is max(struct(score, −id)) per component — ONE
    map-side-combinable aggregate (never a per-component window; the
    Zipf-head cluster would sort in a single task). The exact-collapse
    pre-step uses :func:`exact_dedup_best` (NOT min-id exact_dedup):
    each byte-identical group keeps its best-scoring member, so the
    component argmax over collapsed reps equals the argmax over the
    full component — the group maximum is always still present, and
    identical texts always land in the same component (J = 1 edges).
    Value-identity is pinned in tests; the DuckDB twin computes the
    argmax over the UNCOLLAPSED component, so the oracle check itself
    verifies the equivalence."""
    base = (
        exact_dedup_best(df, score_col, text_col, id_col)
        if collapse_exact else df
    )
    pairs = jaccard_verify(
        base,
        minhash_candidate_pairs(base, text_col, id_col, max_bucket),
        text_col, id_col, threshold,
    )
    labels = connected_components(pairs.select("a", "b"))
    lab = (
        base.select(F.col(id_col), F.col(score_col))
        .join(labels.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col), F.col(score_col),
            F.coalesce(F.col("comp"), F.col(id_col)).alias("comp"),
        )
    )
    best = lab.groupBy("comp").agg(
        F.max(F.struct(F.col(score_col).alias("_s"),
                       (-F.col(id_col)).alias("_ni"))).alias("_m")
    ).select((-F.col("_m._ni")).alias(id_col))
    return base.join(best, id_col, "left_semi")


def cc_incremental(old_labels: DataFrame, new_pairs: DataFrame,
                   max_iters: int = 25) -> DataFrame:
    """Incrementally maintain connected-component labels when NEW edges
    arrive — the steady-state shape of a persisted dedup-cluster table
    under continuous ingestion (full CC over a 100 TB corpus per batch
    is the thing you never want to redo). ``old_labels`` is a prior
    (node, comp) table; ``new_pairs`` the batch's verified (a, b)
    edges. Returns the updated (node, comp) covering every node seen.

    Correctness shape: a component's labels form a STAR (every node →
    its min id), so the old state is equivalent to its label edges
    (node, comp); union those stars with the new edges and re-run
    min-label propagation. Stars re-converge in O(1) rounds unless new
    edges actually bridge components, and propagation cost is bounded
    by the AFFECTED subgraph's diameter — untouched components pass
    through as fixed points (their min never changes). The ≡-to-full-
    recompute guarantee is pinned by the oracle query, whose twin
    computes CC over the ENTIRE corpus from scratch."""
    star = old_labels.select(F.col("node").alias("a"),
                             F.col("comp").alias("b"))
    edges = star.unionByName(new_pairs.select("a", "b"))
    labels = connected_components(edges, max_iters=max_iters)
    # nodes can be isolated in old_labels (comp == node, no other member):
    # connected_components keeps them (self-edge from the star), so the
    # union covers every previously-seen node plus both ends of new pairs.
    return labels
