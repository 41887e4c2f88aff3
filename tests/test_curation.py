"""Curation operator invariants (operators/curation.py): the
decontamination join must broadcast the benchmark side, chunking and
packing must conserve token counts exactly, OOV/mixture outputs obey
their algebraic identities, and the Simpson gibberish signal hits its
closed-form extremes. Value-level cross-engine identity is pinned by
the DuckDB twins (decon/oov/mixture/chunk/pack/char_diversity in
plans/entry_queries.py); these tests pin the invariants and plan shapes
the oracle can't see."""

from __future__ import annotations

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def small(spark):
    return _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog", "en", "a"),
            (2, "pack my box with five dozen liquor jugs", "en", "a"),
            (3, "el rapido zorro marron salta sobre el perro", "es", "b"),
            (4, "", "en", "b"),
            (5, None, "en", "b"),
            (6, "aaaa aaaa aaaa", "en", "c"),
        ],
    ).cache()


def test_benchmark_overlap_flags_leak_and_broadcasts(spark, small):
    from xdan_dqa_spark.operators.curation import benchmark_overlap

    bench = _docs(spark, [(100, "over the lazy dog today", "en", "x")])
    out = benchmark_overlap(small, bench, n=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 1 shares the "over the lazy" / "the lazy dog" trigrams; nothing
    # else overlaps the benchmark text.
    assert set(rows) == {1}
    assert rows[1]["n_hits"] == 2
    assert 0.0 < rows[1]["hit_frac"] <= 1.0
    # The benchmark key set must ride a broadcast — the corpus side of
    # the contamination probe never shuffles.
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_benchmark_overlap_self_is_total(spark, small):
    from xdan_dqa_spark.operators.curation import benchmark_overlap

    docs = small.filter("text is not null and length(text) > 0")
    out = benchmark_overlap(docs, docs, n=3).collect()
    # Every doc with >=3 words is 100% contaminated against itself.
    assert all(r["hit_frac"] == 1.0 for r in out)
    assert all(r["n_hits"] == r["n_shingles"] for r in out)


def test_chunk_plan_conserves_tokens_and_is_map_only(spark, small):
    from xdan_dqa_spark.operators.curation import chunk_plan

    out = chunk_plan(small, chunk_tokens=4)
    rows = out.collect()
    # doc 1: 9 tokens -> chunks of 4,4,1; doc 2: 8 -> 4,4; doc 6: 3 -> 3.
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert sorted(c["chunk_tokens"] for c in by_doc[1]) == [1, 4, 4]
    assert sorted(c["chunk_tokens"] for c in by_doc[2]) == [4, 4]
    assert sorted(c["chunk_tokens"] for c in by_doc[6]) == [3]
    # Empty / NULL text documents emit zero chunks, not 0-length rows.
    assert 4 not in by_doc and 5 not in by_doc
    # Every chunk is positive, every non-tail chunk is full, chunk_ids
    # are 0..n_chunks-1.
    for doc, cs in by_doc.items():
        cs = sorted(cs, key=lambda c: c["chunk_id"])
        assert [c["chunk_id"] for c in cs] == list(range(len(cs)))
        assert all(c["n_chunks"] == len(cs) for c in cs)
        assert all(c["chunk_tokens"] == 4 for c in cs[:-1])
        assert cs[-1]["chunk_tokens"] > 0
    # Map-only: no Exchange anywhere in the chunking plan.
    assert "Exchange" not in _plan(out)


def test_pack_bins_conserves_tokens_and_orders(spark, small):
    from xdan_dqa_spark.operators.curation import pack_bins

    out = pack_bins(small, capacity_tokens=10)
    rows = {(r["source"], r["bin_id"]): r for r in out.collect()}
    # source a: doc1 (9 tok) then doc2 (8 tok): doc2's exclusive prefix
    # is 9 -> bin 0; both land in bin 0 (offset packing fills past the
    # boundary with the doc that straddles it).
    assert rows[("a", 0)]["n_docs"] == 2
    assert rows[("a", 0)]["bin_tokens"] == 17
    assert rows[("a", 0)]["first_doc"] == 1 and rows[("a", 0)]["last_doc"] == 2
    # Token conservation per source.
    import collections

    tot = collections.Counter()
    for (src, _), r in rows.items():
        tot[src] += r["bin_tokens"]
    assert tot["a"] == 17 and tot["b"] == 8 and tot["c"] == 3


def test_oov_rate_bounds(spark, small):
    from xdan_dqa_spark.operators.curation import oov_rate

    # Vocabulary covering every term -> zero OOV everywhere.
    full = {r["lang"]: r for r in oov_rate(small, vocab_size=10_000).collect()}
    assert all(r["n_oov"] == 0 and r["oov_rate"] == 0.0 for r in full.values())
    # A 1-term vocabulary ("aaaa" x3 ties with "el" x3, term ASC keeps
    # "aaaa"): rates stay in (0, 1] and token counts are unchanged.
    tiny = {r["lang"]: r for r in oov_rate(small, vocab_size=1).collect()}
    assert tiny["en"]["n_tokens"] == full["en"]["n_tokens"]
    for r in tiny.values():
        assert 0.0 < r["oov_rate"] <= 1.0
        assert r["n_oov"] <= r["n_tokens"]


def test_mixture_plan_algebra(spark, small):
    from xdan_dqa_spark.operators.curation import mixture_plan

    rows = mixture_plan(small).collect()
    assert {r["source"] for r in rows} == {"a", "b", "c"}
    assert abs(sum(r["current_share"] for r in rows) - 1.0) < 1e-6
    for r in rows:
        # epochs = target_share / current_share; sampling_rate caps at 1.
        assert r["epochs"] == pytest.approx(
            r["target_share"] / r["current_share"], rel=1e-6
        )
        assert r["sampling_rate"] == pytest.approx(min(1.0, r["epochs"]), rel=1e-6)
    # a=17, b=8, c=3 tokens: 'c' is under-represented -> epochs > 1.
    by = {r["source"]: r for r in rows}
    assert by["c"]["epochs"] > 1.0 > by["a"]["epochs"]


def test_char_diversity_extremes(spark):
    from xdan_dqa_spark.operators.curation import char_diversity

    df = _docs(
        spark,
        [
            (1, "aaaaaaaa", "spam", "s"),
            (2, "abcdefgh", "prose", "s"),
        ],
    )
    rows = {r["lang"]: r for r in char_diversity(df).collect()}
    # Repeated-character spam: P(two draws equal) == 1 exactly.
    assert rows["spam"]["mean_simpson"] == 1.0
    assert rows["spam"]["sum_distinct_chars"] == 1
    # All-distinct text: Simpson == 1/n.
    assert rows["prose"]["mean_simpson"] == pytest.approx(1 / 8, abs=1e-9)
    assert rows["prose"]["sum_distinct_chars"] == 8


def test_stopword_coverage_separates_prose_from_stuffing(spark):
    from xdan_dqa_spark.operators.curation import stopword_coverage

    docs = _docs(
        spark,
        [
            (1, "The cat sat on the mat and the dog was in the house", "en", "a"),
            (2, "buy cheap pills discount pills cheap buy pills", "en-stuff", "a"),
        ],
    )
    rows = {r["lang"]: r for r in stopword_coverage(docs).collect()}
    # Lowercased membership: "The" counts. Prose carries function words;
    # keyword stuffing carries none.
    assert rows["en"]["n_stop"] >= 4
    assert rows["en"]["stop_rate"] > 0.2
    assert rows["en-stuff"]["n_stop"] == 0 and rows["en-stuff"]["stop_rate"] == 0.0
    # The lexicon must ride a broadcast, never a shuffle join.
    plan = _plan(stopword_coverage(docs))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_host_of_parses_authority_variants(spark):
    """host_of strips scheme, userinfo, port, path/query/fragment and
    lowercases; malformed/NULL urls map to '' (never NULL — the
    blocklist join key must be total)."""
    from pyspark.sql import functions as F

    from xdan_dqa_spark.operators.curation import host_of

    rows = [
        (1, "https://Example.COM/path?q=1"),
        (2, "http://user:pw@sub.example.com:8080/x"),
        (3, "ftp://files.example.org"),
        (4, "not a url"),
        (5, None),
        (6, "https://h.example.com#frag"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r["h"] for r in df.select("doc_id", host_of("url").alias("h")).collect()}
    assert got[1] == "example.com"
    assert got[2] == "sub.example.com"
    assert got[3] == "files.example.org"
    assert got[4] == "" and got[5] == ""
    assert got[6] == "h.example.com"


def test_domain_blocklist_drops_below_mean_hosts(spark):
    """Host reputation on an integer signal: hosts whose mean is below
    the corpus mean are blocked; blocklist_filter removes exactly their
    pages, and the anti-join broadcasts the blocklist side (the corpus
    never shuffles)."""
    from xdan_dqa_spark.operators.curation import (
        blocklist_filter,
        domain_blocklist,
        domain_reputation,
    )

    rows = [
        (1, "https://good.example.com/a", 100),
        (2, "https://good.example.com/b", 120),
        (3, "https://spam.example.com/a", 5),
        (4, "https://spam.example.com/b", 7),
        (5, "https://mid.example.com/a", 58),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, score long")
    rep = {r["host"]: r for r in domain_reputation(df, "url", "score").collect()}
    assert rep["good.example.com"]["n_docs"] == 2
    assert rep["good.example.com"]["score_sum"] == 220
    assert rep["spam.example.com"]["avg_score"] == 6.0

    # corpus mean = 290/5 = 58; spam (6) below, mid (58) NOT below (strict <)
    blocked = {r["host"] for r in
               domain_blocklist(domain_reputation(df, "url", "score")).collect()}
    assert blocked == {"spam.example.com"}

    kept = blocklist_filter(df, domain_blocklist(domain_reputation(df, "url", "score")))
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 5]
    assert "BroadcastHashJoin" in _plan(kept)


def test_blocklist_integer_boundary_is_exact(spark):
    """The below-mean test is integer cross-multiplication, so a host
    sitting EXACTLY at the mean is kept on any engine — no float-divide
    epsilon can flip it (3 hosts × 1 doc, scores 1, 2, 3: mean 2)."""
    from xdan_dqa_spark.operators.curation import domain_blocklist, domain_reputation

    df = spark.createDataFrame(
        [(1, "https://a.x/1", 1), (2, "https://b.x/1", 2), (3, "https://c.x/1", 3)],
        "doc_id long, url string, score long",
    )
    blocked = {r["host"] for r in
               domain_blocklist(domain_reputation(df, "url", "score")).collect()}
    assert blocked == {"a.x"}


def test_host_quota_sample_thins_big_hosts_only(spark):
    """Small hosts pass whole; a big host thins to ~quota in expectation;
    the keep set is deterministic AND partitioning-invariant (the hash
    test reads only (doc_id, n) — cluster size can't change fates)."""
    from xdan_dqa_spark.operators.curation import host_quota_sample

    rows = [(i, "https://big.example.com/%d" % i) for i in range(400)]
    rows += [(1000 + i, "https://small.example.com/%d" % i) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = host_quota_sample(df, quota=40)
    got = sorted(r["doc_id"] for r in kept.collect())
    small = [d for d in got if d >= 1000]
    big = [d for d in got if d < 1000]
    assert small == [1000, 1001, 1002]          # under quota: all kept
    assert 10 <= len(big) <= 100                # ~40 expected of 400
    # deterministic + repartition-invariant
    again = sorted(r["doc_id"] for r in host_quota_sample(df.repartition(7), quota=40).collect())
    assert again == got

    with pytest.raises(ValueError):
        host_quota_sample(df, quota=0)


def test_canonical_url_variants_collapse(spark):
    """The five fixture mess patterns (tracking params, fragment,
    trailing slash, uppercase host, default port) all map to the clean
    canonical form; distinct pages stay distinct."""
    from xdan_dqa_spark.operators.curation import canonical_url

    clean = "https://example.com/p/7"
    rows = [
        (1, clean),
        (2, clean + "?utm_source=feed"),
        (3, clean + "#section"),
        (4, clean + "/"),
        (5, "HTTPS://EXAMPLE.COM/p/7"),
        (6, "https://example.com:443/p/7"),
        (7, "https://example.com/p/8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r["c"]
           for r in df.select("doc_id", canonical_url("url").alias("c")).collect()}
    assert all(got[i] == clean for i in (1, 2, 3, 4, 5, 6))
    assert got[7] == "https://example.com/p/8"


def test_url_dedup_last_crawl_wins_no_window(spark):
    """Of N crawls of one canonical URL the newest survives (ties broken
    by highest id); n_crawls counts all of them; and the plan is ONE
    map-side-combinable aggregate — no Window, exactly one Exchange (a
    SortAggregate's partition-local sort is fine; a Window's per-key
    global sort is the straggler the operator exists to avoid)."""
    from pyspark.sql import functions as F

    from xdan_dqa_spark.operators.curation import url_dedup

    rows = [
        (1, "https://a.com/x?utm_source=s", "2024-01-01 00:00:00"),
        (2, "https://a.com/x#f", "2024-03-01 00:00:00"),   # newest → wins
        (3, "https://a.com/x/", "2024-02-01 00:00:00"),
        (4, "https://b.com/y", "2024-01-01 00:00:00"),     # tie on ts...
        (5, "https://b.com/y/", "2024-01-01 00:00:00"),    # ...higher id wins
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, crawl_ts string") \
        .withColumn("crawl_ts", F.col("crawl_ts").cast("timestamp"))
    out = url_dedup(df)
    got = {r["canonical_url"]: r for r in out.collect()}
    assert got["https://a.com/x"]["doc_id"] == 2
    assert got["https://a.com/x"]["n_crawls"] == 3
    assert got["https://b.com/y"]["doc_id"] == 5
    assert got["https://b.com/y"]["n_crawls"] == 2
    plan = _plan(out)
    assert "Window" not in plan
    assert plan.count("Exchange") - plan.count("AQEShuffleRead") <= 1


def test_leak_safe_split_keeps_variants_together(spark):
    """A case/whitespace-variant copy must land in the SAME split as its
    original (the anti-leakage contract); assignment is map-only (zero
    Exchanges) and deterministic; bad weights raise."""
    from pyspark.sql import functions as F

    from xdan_dqa_spark.operators.curation import leak_safe_split

    rows = [(i, f"document number {i} with some words " * 3) for i in range(200)]
    rows += [(1000, rows[7][1].upper()), (1001, "  " + rows[7][1].replace(" ", "\t"))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leak_safe_split(df)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert got[1000] == got[7] and got[1001] == got[7]
    # all three labels appear on 200 distinct docs
    assert set(got.values()) == {"train", "val", "test"}
    assert "Exchange" not in _plan(out)

    with pytest.raises(ValueError):
        leak_safe_split(df, weights=(70, 10, 10))


def test_robots_filter_drops_disallowed_prefixes(spark):
    """Rows on a ruled host whose path starts with the disallow prefix
    drop; same path on an unruled host and other paths on the ruled
    host survive; the anti-join broadcasts the rule side."""
    from xdan_dqa_spark.operators.curation import robots_filter

    pages = spark.createDataFrame(
        [
            (1, "https://a.com/private/x"),   # ruled host + prefix → drop
            (2, "https://a.com/public/x"),    # ruled host, other path → keep
            (3, "https://b.com/private/x"),   # unruled host → keep
            (4, "https://a.com/private"),     # exact prefix → drop
            (5, "https://a.com"),             # no path → '/' → keep
        ],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [("a.com", "/private")], "host string, path_prefix string"
    )
    out = robots_filter(pages, rules)
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3, 5]
    assert "BroadcastHashJoin" in _plan(out) or "BroadcastNestedLoopJoin" in _plan(out)


def test_mixture_apply_rebalances_and_is_deterministic(spark):
    """After resampling, every source's token mass lands within one doc
    of the uniform target T/S; copy_ids are dense 0..n-1 per doc; the
    result is bit-identical under repartition (integer/hash arithmetic
    only); zero-token sources drop."""
    from pyspark.sql import functions as F

    from xdan_dqa_spark.operators.curation import mixture_apply

    rows = [(i, "w " * 20, "big", "big") for i in range(90)]          # 1800 tok
    rows += [(100 + i, "w " * 20, "small", "small") for i in range(10)]  # 200 tok
    rows += [(200, "", "empty", "empty")]
    docs = spark.createDataFrame(
        [(i, t.strip(), l, s) for i, t, l, s in rows],
        "doc_id long, text string, lang string, source string",
    )
    out = mixture_apply(docs, by="source").cache()
    got = out.collect()
    assert not [r for r in got if r["source"] == "empty"]
    # per-source resampled token mass ~ T/S = 2000/2 = 1000 → big thins
    # to ~1000/1800 rate, small upsamples to 5 copies each
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    n_big = len(by_src["big"])
    assert 30 <= n_big <= 70                     # ~50 expected of 90
    assert len(by_src["small"]) == 50            # exact: epochs = 5.0
    copies = sorted(r["copy_id"] for r in by_src["small"]
                    if r["doc_id"] == 100)
    assert copies == [0, 1, 2, 3, 4]
    again = mixture_apply(docs.repartition(7), by="source")
    assert sorted((r["doc_id"], r["copy_id"]) for r in again.collect()) \
        == sorted((r["doc_id"], r["copy_id"]) for r in got)


def test_normalize_punct_maps_and_is_idempotent(spark):
    from pyspark.sql import functions as F

    from xdan_dqa_spark.operators.curation import normalize_punct

    rows = [
        (1, "‘a’ “b” ‚c′"),
        (2, "x–y—z―w"),
        (3, "wait… ok"),
        (4, "a​b­c﻿d"),
        (5, "nb sp and　wide"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = df.select("doc_id", normalize_punct("text").alias("n"))
    got = {r["doc_id"]: r["n"] for r in once.collect()}
    assert got[1] == "'a' \"b\" 'c'"
    assert got[2] == "x-y-z-w"
    assert got[3] == "wait... ok"
    assert got[4] == "abd" or got[4] == "abcd"  # soft hyphen removed
    assert got[5] == "nb sp and wide"
    assert got[6] == ""
    # idempotent: a second pass changes nothing
    twice = once.select("doc_id", normalize_punct(F.col("n")).alias("n2"))
    assert {r["doc_id"]: r["n2"] for r in twice.collect()} == got


def _gv(spark, rows):
    return spark.createDataFrame(rows, "source string, n_chars long")


def test_ks_drift_identical_distributions_is_zero(spark):
    from xdan_dqa_spark.operators.curation import ks_drift

    rows = [("a", v) for v in range(1, 101)] + [("b", v) for v in range(1, 101)]
    got = {r["source"]: r for r in ks_drift(_gv(spark, rows)).collect()}
    assert got["a"]["ks_stat"] == 0.0
    assert got["b"]["ks_stat"] == 0.0
    assert got["a"]["n_in"] == 100 and got["a"]["n_rest"] == 100


def test_ks_drift_disjoint_and_mixed(spark):
    """C is fully above A∪B → D(C)=1; A vs rest(B+C): at x=100 F_A=1,
    F_rest=0.5 → D(A)=0.5 exactly."""
    from xdan_dqa_spark.operators.curation import ks_drift

    rows = (
        [("a", v) for v in range(1, 101)]
        + [("b", v) for v in range(1, 101)]
        + [("c", v) for v in range(201, 301)]
    )
    got = {r["source"]: r["ks_stat"] for r in ks_drift(_gv(spark, rows)).collect()}
    assert got["c"] == 1.0
    assert got["a"] == 0.5 and got["b"] == 0.5


def test_ks_drift_single_group_is_null(spark):
    from xdan_dqa_spark.operators.curation import ks_drift

    rows = [("a", v) for v in range(10)]
    r = ks_drift(_gv(spark, rows)).collect()[0]
    assert r["ks_stat"] is None and r["n_rest"] == 0


def test_boilerplate_prefix_flags_shared_opening(spark):
    """Three docs of source s1 open with the same 8-token banner -> all
    three flagged, share = 3/4; the odd doc out is not flagged."""
    from xdan_dqa_spark.plans.entry_queries import QUERIES  # noqa: F401
    import xdan_dqa_spark.plans.entry_queries as eq
    import os, tempfile

    banner = "cookie notice please accept our tracking policy now"
    rows = [
        (1, banner + " article one", "s1"),
        (2, banner + " article two", "s1"),
        (3, banner + " article three", "s1"),
        (4, "completely original opening text for this one page", "s1"),
        (5, "another site entirely different text here", "s2"),
    ]
    df = spark.createDataFrame(
        [(i, t, s, len(t)) for i, t, s in rows],
        "doc_id long, text string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        got = {r["doc_id"]: r for r in
               eq.QUERIES["boilerplate_prefix"](spark, tmp).collect()}
    assert [got[i]["is_boilerplate_prefix"] for i in (1, 2, 3)] == [True] * 3
    assert got[4]["is_boilerplate_prefix"] is False
    assert got[1]["prefix_share"] == 0.75
    assert got[5]["prefix_share"] == 1.0  # single-doc source: its own mode


def _kl_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_unigram_kl_identical_sources_is_zero(spark):
    """Two sources with byte-identical term distributions: every cell
    has p = q exactly (same counts, same smoothing) -> KL = 0.0."""
    from xdan_dqa_spark.operators.curation import unigram_kl_drift

    text = "alpha beta gamma alpha beta alpha"
    got = unigram_kl_drift(
        _kl_docs(spark, [(1, text, "a"), (2, text, "b")]), group_col="source"
    ).collect()
    assert {r["kl_vs_rest"] for r in got} == {0.0}


def test_unigram_kl_disjoint_sources_positive_and_ordered(spark):
    from xdan_dqa_spark.operators.curation import unigram_kl_drift

    rows = (
        [(1, "red green blue red green", "a"), (2, "red green blue", "a")]
        + [(3, "qqq www eee qqq www", "b"), (4, "qqq www eee", "b")]
    )
    got = {r["source"]: r["kl_vs_rest"]
           for r in unigram_kl_drift(_kl_docs(spark, rows),
                                     group_col="source").collect()}
    assert got["a"] > 0.3 and got["b"] > 0.3


def test_snapshot_diff_statuses(spark):
    from xdan_dqa_spark.operators.curation import (snapshot_diff,
                                                   snapshot_diff_census)

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "url long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c CHANGED"), (4, None), (5, "new page")],
        "url long, text string",
    )
    got = {r["url"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "unchanged", 5: "added"}
    census = {r["status"]: r["n"]
              for r in snapshot_diff_census(old, new).collect()}
    assert census == {"removed": 1, "unchanged": 2, "changed": 1, "added": 1}


def test_chunk_plan_strided_coverage_and_overlap(spark):
    from xdan_dqa_spark.operators.curation import chunk_plan_strided

    df = spark.createDataFrame(
        [(1, "w " * 100), (2, "w " * 64), (3, "w " * 10), (4, "")],
        "doc_id long, text string",
    )
    got = {}
    for r in chunk_plan_strided(df, chunk_tokens=64, stride=48).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["chunk_len"])
        )
    # 100 tokens: windows at 0 and 48; second is 52 long (reaches end)
    assert sorted(got[1]) == [(0, 0, 64), (1, 48, 52)]
    # exactly one window when doc fits
    assert got[2] == [(0, 0, 64)]
    assert got[3] == [(0, 0, 10)]
    assert 4 not in got                      # empty doc: no chunks
    # every token covered: max(start+len) == n_tok and starts stride apart
    assert max(s + ln for _, s, ln in got[1]) == 100


def test_chunk_plan_strided_rejects_token_skipping(spark):
    import pytest as _pytest

    from xdan_dqa_spark.operators.curation import chunk_plan_strided

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_plan_strided(df, chunk_tokens=8, stride=9)


def test_mixture_temperature_limits_and_direction(spark):
    """T→1 keeps natural shares; T=2 moves small sources UP and large
    sources DOWN but never past uniform; shares always sum to 1."""
    from xdan_dqa_spark.operators.curation import mixture_plan_temperature

    rows = [(i, "w " * 90, "big") for i in range(9)] + [(100, "w " * 10, "small")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    t1 = {r["source"]: r for r in
          mixture_plan_temperature(df, temperature=1.0).collect()}
    assert t1["big"]["target_share"] == t1["big"]["current_share"]
    assert t1["big"]["epochs"] == 1.0

    t2 = {r["source"]: r for r in
          mixture_plan_temperature(df, temperature=2.0).collect()}
    assert t2["small"]["target_share"] > t2["small"]["current_share"]
    assert t2["big"]["target_share"] < t2["big"]["current_share"]
    assert 0.5 > t2["small"]["target_share"]      # never past uniform
    assert abs(sum(r["target_share"] for r in t2.values()) - 1.0) < 1e-6
    assert t2["small"]["epochs"] > 1.0 > t2["big"]["epochs"]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        mixture_plan_temperature(df, temperature=0.0)


def test_benford_digit_extraction_edges(spark):
    """First-significant-digit extraction must survive negatives,
    sub-1 magnitudes, and interior zeros (stripping [0.,] keeps the
    significant digits in order — interior zeros are never FIRST)."""
    import os
    import tempfile

    import xdan_dqa_spark.plans.entry_queries as eq

    rows = [
        (1, -123.4),    # -> 1
        (2, 0.00456),   # -> 4
        (3, 102.5),     # -> 1 (interior zero must not shift)
        (4, 0.0),       # filtered out
        (5, 900.0),     # -> 9
    ]
    df = spark.createDataFrame(
        [(i, __import__("datetime").datetime(2024, 1, 1), 7, "t", v, "{}")
         for i, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        got = {r["digit"]: r["n"]
               for r in eq.QUERIES["benford_census"](spark, tmp).collect()}
    assert got == {1: 2, 4: 1, 9: 1}


def test_scd2_intervals_runs_and_reappearance(spark):
    """A -> B -> A over one page: three intervals (re-appearing content
    opens a NEW interval), contiguous valid ranges, exactly one current."""
    from pyspark.sql import functions as F

    from xdan_dqa_spark.operators.curation import scd2_intervals

    rows = [("u", 100, "A"), ("u", 200, "A"), ("u", 300, "B"),
            ("u", 400, "A"), ("u", 500, "A"), ("v", 100, "X")]
    df = spark.createDataFrame(rows, "page string, t long, content_hash string")
    df = df.withColumn("crawl_ts", F.timestamp_seconds(F.col("t")))
    out = scd2_intervals(df, "page", "crawl_ts", "content_hash")
    u = sorted(
        ((r["content_hash"], r["valid_from"].timestamp(),
          None if r["valid_to"] is None else r["valid_to"].timestamp(),
          r["is_current"]) for r in out.filter(F.col("page") == "u").collect()),
        key=lambda x: x[1],
    )
    assert [(h, vf, vt) for h, vf, vt, _ in u] == [
        ("A", 100.0, 300.0), ("B", 300.0, 400.0), ("A", 400.0, None)]
    assert [c for *_, c in u] == [False, False, True]
    v = out.filter(F.col("page") == "v").collect()
    assert len(v) == 1 and v[0]["is_current"]


# ------------------------------------------------ quantile normalization

def test_quantile_normalize_identical_distributions_are_identity(spark):
    """Two groups with the SAME value multiset: normalization maps every
    value to itself (the pooled distribution equals each group's)."""
    from xdan_dqa_spark.operators.curation import quantile_normalize

    rows = [(i, "a", v) for i, v in enumerate([10, 20, 30, 40])] + [
        (100 + i, "b", v) for i, v in enumerate([10, 20, 30, 40])
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = quantile_normalize(df, "n_chars", "source").collect()
    assert all(r["norm_n_chars"] == r["n_chars"] for r in out)


def test_quantile_normalize_aligns_shifted_group(spark):
    """Group b is group a shifted by +1000: after normalization both
    groups land on the SAME pooled values rank-for-rank, so a global
    threshold treats them identically."""
    from xdan_dqa_spark.operators.curation import quantile_normalize

    a_vals = [10, 20, 30, 40, 50]
    rows = [(i, "a", v) for i, v in enumerate(a_vals)] + [
        (100 + i, "b", v + 1000) for i, v in enumerate(a_vals)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = quantile_normalize(df, "n_chars", "source").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(
            (r["n_chars"], r["norm_n_chars"])
        )
    norm_a = [n for _, n in sorted(by_group["a"])]
    norm_b = [n for _, n in sorted(by_group["b"])]
    assert norm_a == norm_b          # rank-aligned onto the pooled scale
    assert norm_a == sorted(norm_a)  # monotone within group


def test_quantile_normalize_singleton_group_maps_to_pooled_median(spark):
    from xdan_dqa_spark.operators.curation import quantile_normalize

    rows = [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "a", 40),
            (9, "solo", 999999)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r["doc_id"]: r["norm_n_chars"]
           for r in quantile_normalize(df, "n_chars", "source").collect()}
    # pooled rank (N+1) DIV 2 = 3rd of [10,20,30,40,999999] -> 30
    assert out[9] == 30


# ------------------------------------------------------------- DSIR

def test_dsir_target_like_docs_score_higher(spark):
    """Docs sharing the target slice's vocabulary must outweigh docs
    from a disjoint vocabulary — the selector's defining property."""
    from pyspark.sql import functions as F

    from xdan_dqa_spark.operators.curation import dsir_weights

    rows = []
    for i in range(30):          # target exemplars: vocab A
        rows.append((i, "en", " ".join(f"alpha{j % 7}" for j in range(20))))
    for i in range(30, 60):      # source-only: vocab B
        rows.append((i, "zh", " ".join(f"beta{j % 7}" for j in range(20))))
    # probes: one doc of each vocab, tagged outside the target slice
    rows += [(100, "xx", " ".join(f"alpha{j % 7}" for j in range(20))),
             (101, "xx", " ".join(f"beta{j % 7}" for j in range(20)))]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w = {r["doc_id"]: r["dsir_weight"]
         for r in dsir_weights(df, F.col("lang") == "en").collect()}
    assert w[100] > 0 > w[101]


def test_bigram_lm_frequent_patterns_score_lower_surprise(spark):
    """A held-out doc repeating the train slice's dominant bigram must
    have lower avg negative log prob than unseen-vocab gibberish."""
    from xdan_dqa_spark.plans.entry_queries import q_bigram_lm_ppl
    import duckdb, hashlib

    # find doc_ids landing in the test bucket (md5 'sp:' rule, >= 80)
    def bk(i):
        return int(hashlib.md5(f"sp:{i}".encode()).hexdigest()[:8], 16) % 100

    test_ids = [i for i in range(1000) if bk(i) >= 80]
    train_ids = [i for i in range(1000) if bk(i) < 80][:40]
    common = "the cat sat on the mat and the cat ran"
    rows = [(i, common) for i in train_ids]
    rows.append((test_ids[0], common))                     # familiar
    rows.append((test_ids[1], "zzq qqz zqz qzz zzq wwx"))  # gibberish
    df = spark.createDataFrame(rows, "doc_id long, text string")

    import tempfile, os
    tmp = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    out = {r["doc_id"]: r["avg_neg_logprob"]
           for r in q_bigram_lm_ppl(spark, tmp).collect()}
    assert out[test_ids[0]] < out[test_ids[1]]


# --------------------------------------------------- coverage selection

def test_greedy_coverage_picks_complement_not_second_best(spark):
    """Doc 1 covers {a..e}; doc 2 covers {a..d,f} (second-highest raw
    coverage but mostly redundant); doc 3 covers {x,y,z} (small but
    disjoint). Greedy must pick 1 then 3 — the submodular gain, not
    the raw count."""
    from xdan_dqa_spark.operators.curation import greedy_coverage_select

    rows = [(1, "a b c d e"), (2, "a b c d f"), (3, "x y z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = [(r["step"], r["doc_id"], r["new_terms"])
           for r in greedy_coverage_select(df, k=2).orderBy("step").collect()]
    assert out == [(1, 1, 5), (2, 3, 3)]


def test_greedy_coverage_stops_when_nothing_new(spark):
    from xdan_dqa_spark.operators.curation import greedy_coverage_select

    rows = [(1, "a b c"), (2, "a b"), (3, "c a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = greedy_coverage_select(df, k=3).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1


def test_cluster_safe_split_keeps_near_dups_together(spark):
    """A 3-doc near-dup chain plus its byte-identical copy must all land
    in ONE split; unrelated docs split independently."""
    from xdan_dqa_spark.operators.curation import cluster_safe_split

    base = " ".join(f"w{i}" for i in range(60))
    rows = [
        (1, base + " tail1"),
        (2, base + " tail2"),
        (3, base + " tail3"),
        (4, base + " tail1"),            # exact copy of doc 1
        (50, " ".join(f"z{i}" for i in range(60))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["comp"], r["split"])
           for r in cluster_safe_split(df).collect()}
    assert len(got) == 5
    cluster_splits = {got[i][1] for i in (1, 2, 3, 4)}
    assert len(cluster_splits) == 1          # whole cluster in one split
    assert got[1][0] == got[2][0] == got[3][0] == got[4][0] == 1
    assert got[50][0] == 50


def test_cluster_safe_split_covers_every_row_and_is_stable(spark):
    from xdan_dqa_spark.operators.curation import cluster_safe_split

    df = spark.range(120).selectExpr(
        "id AS doc_id",
        "concat('unique doc ', id, ' body ', id * 7919) AS text",
    )
    a = sorted(map(tuple, cluster_safe_split(df).collect()))
    b = sorted(map(tuple, cluster_safe_split(df.repartition(7)).collect()))
    assert a == b and len(a) == 120
    splits = {s for _, _, s in a}
    assert splits <= {"train", "val", "test"} and "train" in splits


def test_hamilton_apportionment_sums_exactly(spark):
    """Largest-remainder slots must sum EXACTLY to the budget for any
    weight profile — the invariant float-proportional rounding breaks."""
    from xdan_dqa_spark.plans.entry_queries import q_slot_apportionment
    import pyspark.sql.functions as F

    r = q_slot_apportionment(spark, "/root/testdata/sf0.001")
    rows = r.collect()
    assert sum(x["slots"] for x in rows) == 1000
    # monotone-ish: more weight never means fewer base slots
    by_w = sorted(rows, key=lambda x: x["w"])
    bases = [x["base"] for x in by_w]
    assert bases == sorted(bases)
