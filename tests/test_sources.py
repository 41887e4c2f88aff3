"""Source connectors: field mapping, deterministic sampling, union, sinks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from xdan_dqa_spark.sources.readers import (
    SourceConfig,
    apply_field_mapping,
    deterministic_sample,
    read_many,
    read_source,
)
from xdan_dqa_spark.sources.sinks import output_name, write_keep_drop, write_scored


@pytest.fixture(scope="module")
def webtext_parquet(spark, webtext, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("src") / "webtext.parquet")
    webtext.drop("_kind", "html").withColumn("html", F.lit(None).cast("binary")).select(
        "url", "warc_ts", "html", "text", "lang"
    ).write.parquet(p)
    return p


def test_field_mapping_renames(spark):
    df = spark.createDataFrame([("u", "body", "extra")], "page_url string, content string, x string")
    out = apply_field_mapping(df, {"url": "page_url", "text": "content"})
    assert out.columns == ["url", "text", "x"]
    row = out.collect()[0]
    assert row["url"] == "u" and row["text"] == "body"


def test_field_mapping_absorbs_metadata(spark):
    """Open-map absorption (reference src/data_loader.py:116-125): with
    absorb_metadata=True the unmapped source columns fold into ONE
    map<string,string> column, sorted-key order, values stringified."""
    df = spark.createDataFrame(
        [("u1", "body", "alpaca", 7), ("u2", "other", "oasst", None)],
        "page_url string, content string, origin string, rank int",
    )
    out = apply_field_mapping(df, {"url": "page_url", "text": "content"},
                              absorb_metadata=True)
    assert out.columns == ["url", "text", "metadata"]
    assert dict(out.dtypes)["metadata"] == "map<string,string>"
    rows = {r["url"]: r for r in out.collect()}
    assert rows["u1"]["metadata"] == {"origin": "alpaca", "rank": "7"}
    assert rows["u2"]["metadata"] == {"origin": "oasst", "rank": None}


def test_field_mapping_empty_mapping_still_absorbs(spark):
    """absorb_metadata=True with NO renames folds every column into the
    metadata map (the early no-mapping fast path must not swallow it)."""
    df = spark.createDataFrame([("a", 1)], "x string, y int")
    out = apply_field_mapping(df, {}, absorb_metadata=True)
    assert out.columns == ["metadata"]
    assert out.collect()[0]["metadata"] == {"x": "a", "y": "1"}


def test_metadata_roundtrip_through_publish_table(spark):
    """The absorbed map survives a publish_table create→read cycle and
    JSON-encodes like the reference's published metadata dict."""
    from xdan_dqa_spark.sources.readers import metadata_to_json
    from xdan_dqa_spark.sources.sinks import publish_table

    df = spark.createDataFrame(
        [("u1", "t1", "cc", 3)], "page_url string, content string, src string, n int"
    )
    mapped = apply_field_mapping(df, {"url": "page_url", "text": "content"},
                                 absorb_metadata=True)
    try:
        publish_table(mapped, "meta_rt_tbl")
        back = spark.table("meta_rt_tbl")
        row = back.select("url", "metadata",
                          metadata_to_json().alias("mj")).collect()[0]
        assert row["metadata"] == {"n": "3", "src": "cc"}
        assert row["mj"] == '{"n":"3","src":"cc"}'
    finally:
        spark.sql("DROP TABLE IF EXISTS meta_rt_tbl")


def test_field_mapping_missing_source_raises(spark):
    df = spark.createDataFrame([("u",)], "a string")
    with pytest.raises(ValueError, match="not in input"):
        apply_field_mapping(df, {"url": "nope"})


def test_deterministic_sample_stable_across_partitioning(spark, webtext):
    base = webtext.select("url", "text")
    s1 = {r["url"] for r in deterministic_sample(base, 50).collect()}
    s2 = {r["url"] for r in deterministic_sample(base.repartition(13), 50).collect()}
    assert s1 == s2 and len(s1) == 50


def test_read_source_enforces_schema(spark, webtext_parquet):
    df = read_source(spark, SourceConfig(path=webtext_parquet), enforce_webtext=True)
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    assert df.count() == 800


def test_read_many_union_and_sample(spark, webtext_parquet):
    cfgs = [
        SourceConfig(path=webtext_parquet, num_samples=30),
        SourceConfig(path=webtext_parquet, num_samples=20),
    ]
    df = read_many(spark, cfgs)
    assert df.count() == 50  # 30 + 20 (same rows may repeat across sources)


def test_write_keep_drop_lanes(spark, scored, tmp_path):
    out = str(tmp_path / "lanes")
    sc = scored.select("url", "keep", "score").cache()
    write_keep_drop(sc, out)
    keep = spark.read.parquet(f"{out}/keep")
    drop = spark.read.parquet(f"{out}/drop")
    assert keep.filter(~F.col("keep")).count() == 0
    assert drop.filter(F.col("keep")).count() == 0
    assert keep.count() + drop.count() == sc.count()


def test_write_scored_partitioned_segments(spark, scored, tmp_path):
    out = str(tmp_path / "seg")
    write_scored(scored.select("url", "pred_lang", "score"), out,
                 partition_by=("pred_lang",))
    langs = {d.split("=")[1] for d in os.listdir(out) if d.startswith("pred_lang=")}
    assert "en" in langs and len(langs) >= 3
    assert spark.read.parquet(out).count() == scored.count()


def test_output_name_parts():
    assert output_name("assess", "cc/web 01", 42) == "assess_cc-web-01_42"
    assert output_name("t", "d", 1, ts=0.0) == "t_d_1_19700101_000000"


def test_publish_table_create_then_append(spark, scored):
    from xdan_dqa_spark.sources.sinks import publish_table

    small = scored.select("doc_id", "pred_lang", "score", "keep").limit(50)
    try:
        name = publish_table(small, "pub_test_tbl")
        assert name == "pub_test_tbl"
        n1 = spark.table(name).count()
        publish_table(small, "pub_test_tbl")          # append
        assert spark.table(name).count() == 2 * n1
        # checkpoint variant publishes to a suffixed table
        cname = publish_table(small, "pub_test_tbl", checkpoint_variant=3)
        assert cname == "pub_test_tbl_checkpoint_3"
        assert spark.table("pub_test_tbl_checkpoint_3").count() == n1
    finally:
        spark.sql("DROP TABLE IF EXISTS pub_test_tbl")
        spark.sql("DROP TABLE IF EXISTS pub_test_tbl_checkpoint_3")


def test_partition_roundtrip_numeric_looking_values(spark, tmp_path):
    """Read-back of a hive-partitioned sink must use the writer's schema:
    partition type inference would turn a numeric-looking partition value
    ('123') into an int column and break the identity roundtrip
    (q_sink_roundtrip reads with an explicit schema for this reason)."""
    df = spark.createDataFrame(
        [(1, "a", "123"), (2, "b", "007"), (3, "c", "src")],
        "doc_id long, text string, source string",
    )
    out = str(tmp_path / "seg")
    write_scored(df, out, fmt="parquet", partition_by=("source",))
    back = spark.read.schema(df.schema).parquet(out)
    assert dict(back.dtypes)["source"] == "string"
    got = sorted((r.doc_id, r.source) for r in back.collect())
    # '007' survives byte-identically; inference would read it back as 7
    assert got == [(1, "123"), (2, "007"), (3, "src")]


def test_s8_output_naming_matches_python_convention(spark):
    """The distributed S8 naming query (one output name per source
    partition) must agree with the driver-side output_name() convention
    on every fixture source — ties the oracle-paired column expression
    to the Python function sinks actually use."""
    from xdan_dqa_spark.plans.entry_queries import q_s8_output_naming
    from xdan_dqa_spark.sources.sinks import output_name

    rows = q_s8_output_naming(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["output_name"] == output_name(
            "assessment", r["source"], r["n_rows"]
        )


def test_stratified_hash_sample_deterministic_and_rated(spark):
    import hashlib

    from xdan_dqa_spark.sources.readers import stratified_hash_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    picked = stratified_hash_sample(
        docs, key_col="doc_id", strata_col="lang", pct={"en": 0}, default_pct=100
    )
    langs = {r["lang"] for r in picked.select("lang").distinct().collect()}
    assert "en" not in langs and langs          # en fully dropped, rest fully kept

    # the bucket is md5-derived: recompute one row's membership in python
    sample = stratified_hash_sample(docs, pct=None, default_pct=37)
    ids = {r["doc_id"] for r in sample.select("doc_id").collect()}
    for r in docs.select("doc_id").limit(50).collect():
        bucket = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15], 16) % 100
        assert (r["doc_id"] in ids) == (bucket < 37)

    # stable across cluster layouts
    again = stratified_hash_sample(docs.repartition(13), pct=None, default_pct=37)
    assert {r["doc_id"] for r in again.select("doc_id").collect()} == ids


def test_j4_reconcile_exercises_all_three_segments(spark, tmp_path):
    """The sf fixtures are referentially intact (only 'both' appears), so
    pin the customer_only / order_only branches on a synthetic mismatch."""
    import datetime as dt

    from xdan_dqa_spark.plans.entry_queries import q_j4_reconcile

    spark.createDataFrame(
        [(1, "a", 0, 1.0, "SEG"), (2, "b", 0, 2.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(10, 1, "O", 100.0, dt.datetime(2024, 1, 1), "1-URGENT"),
         (11, 1, "O", 50.0, dt.datetime(2024, 1, 2), "1-URGENT"),
         (12, 99, "O", 7.0, dt.datetime(2024, 1, 3), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp_ntz, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    got = {r["segment"]: (r["n_keys"], r["n_orders"], r["order_value"])
           for r in q_j4_reconcile(spark, str(tmp_path)).collect()}
    assert got == {
        "both": (1, 2, 150.0),          # customer 1 with two orders
        "customer_only": (1, 0, 0.0),   # customer 2, no orders
        "order_only": (1, 1, 7.0),      # order for unknown custkey 99
    }


def test_a15_zscore_outliers_hand_computed(spark, tmp_path):
    import math

    from xdan_dqa_spark.plans.entry_queries import q_a15_zscore_outliers

    # lang 'en': nine docs at 100 chars, one at 1000 — the 1000 is the
    # only |z| > 2 outlier; lang 'fr' is uniform → no outliers.
    rows = [(i, "t", "en", "s", 100) for i in range(9)] + [(9, "t", "en", "s", 1000)]
    rows += [(10 + i, "t", "fr", "s", 50 + i) for i in range(5)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = q_a15_zscore_outliers(spark, str(tmp_path)).collect()
    assert [(r["doc_id"], r["lang"], r["n_chars"]) for r in got] == [(9, "en", 1000)]
    n, sx, sx2 = 10, 9 * 100 + 1000, 9 * 100**2 + 1000**2
    mean = sx / n
    var = (sx2 - sx * sx / n) / (n - 1)
    assert got[0]["z"] == round((1000 - mean) / math.sqrt(var), 9)


def _write_events(spark, tmp_path, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).replace(tzinfo=None)
    data = [(i, base + dt.timedelta(seconds=sec), uid, et, val, "{}")
            for i, (sec, uid, et, val) in enumerate(rows)]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))


def test_a16_daily_gapfill_zero_fills_missing_day(spark, tmp_path):
    from xdan_dqa_spark.plans.entry_queries import q_a16_daily_gapfill

    day = 86400
    # 'click': days 0 and 2 active, day 1 silent → must appear as zeros
    _write_events(spark, tmp_path, [
        (10, 1, "click", 1.5), (20, 2, "click", 2.5),
        (2 * day + 30, 1, "click", 4.0),
        (5, 9, "buy", 10.0),          # single-day type → one row, no fill
    ])
    got = {(r["event_type"], r["day"]): (r["n_events"], r["total_value"])
           for r in q_a16_daily_gapfill(spark, str(tmp_path)).collect()}
    d0 = 19723  # 2024-01-01 epoch days
    assert got[("click", d0)] == (2, 4.0)
    assert got[("click", d0 + 1)] == (0, 0.0)
    assert got[("click", d0 + 2)] == (1, 4.0)
    assert got[("buy", d0)] == (1, 10.0)
    assert len(got) == 4


def test_a17_user_percentile_hand_computed(spark, tmp_path):
    from xdan_dqa_spark.plans.entry_queries import q_a17_user_percentile

    # user event counts: u1=1, u2=1, u3=2, u4=4  (N=4, N-1=3)
    counts = {1: 1, 2: 1, 3: 2, 4: 4}
    rows = [(u * 100 + k, u, "e", 0.0)
            for u, n in counts.items() for k in range(n)]
    _write_events(spark, tmp_path, rows)
    got = {r["user_id"]: (r["n_events"], r["pct_rank"], r["tier"])
           for r in q_a17_user_percentile(spark, str(tmp_path)).collect()}
    assert got[1] == (1, 0.0, "light")          # 0 smaller / 3
    assert got[2] == (1, 0.0, "light")          # tie shares the rank
    assert got[3] == (2, round(2 / 3, 9), "normal")
    assert got[4] == (4, 1.0, "heavy")


def test_cc_cluster_histogram_identical_pair_plus_singletons(spark, tmp_path):
    from xdan_dqa_spark.plans.entry_queries import q_cc_cluster_histogram

    long_a = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (1, long_a, "en", "s", len(long_a)),
        (2, long_a, "en", "s", len(long_a)),                # J(1,2)=1 → cluster
        (3, " ".join(f"other{i}" for i in range(40)), "en", "s", 10),
        (4, "completely different words here entirely", "en", "s", 10),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = {r["cluster_size"]: (r["n_clusters"], r["n_docs"])
           for r in q_cc_cluster_histogram(spark, str(tmp_path)).collect()}
    assert got == {2: (1, 2), 1: (2, 2)}


def test_gopher_stats_hand_computed(spark, tmp_path):
    from xdan_dqa_spark.plans.entry_queries import q_gopher_stats

    rows = [
        # 4 words, 14 non-ws chars, one @ symbol, dup line 'foo' (3 lines,
        # 1 dup), all words alphabetic
        (1, "foo bar\nfoo\n@ok x", "en", "s", 0),
        (2, "", "en", "s", 0),                       # empty → zero ratios
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r.asDict() for r in q_gopher_stats(spark, str(tmp_path)).collect()}
    r = got[1]
    # tokens: foo bar foo @ok x → 5 words; non-ws chars = 13
    assert r["n_words"] == 5
    assert r["mean_word_len"] == round(13 / 5, 9)
    assert r["symbol_ratio"] == round(1 / 5, 9)
    # lines after trim-split: foo bar / foo / @ok x → no dups (line1 != line2)
    assert r["dup_line_frac"] == 0.0
    # '@ok' contains a letter → 5/5 alpha
    assert r["alpha_ratio"] == 1.0
    assert r["distinct_word_ratio"] == round(4 / 5, 9)
    assert got[2]["n_words"] == 0 and got[2]["mean_word_len"] == 0.0


def test_a19_event_lift_hand_computed(spark, tmp_path):
    from xdan_dqa_spark.plans.entry_queries import q_a19_event_lift

    # users: 1 {x,y}, 2 {x,y}, 3 {x}, 4 {y,z} → N=4
    # n_x=3, n_y=3, n_z=1; pairs: (x,y)=2, (y,z)=1
    rows = [(0, 1, "x", 0.0), (1, 1, "y", 0.0), (2, 2, "x", 0.0),
            (3, 2, "y", 0.0), (4, 3, "x", 0.0), (5, 4, "y", 0.0),
            (6, 4, "z", 0.0), (7, 1, "x", 0.0)]   # dup (1,x) must not count
    _write_events(spark, tmp_path, rows)
    got = {(r["type_a"], r["type_b"]): (r["n_ab"], r["n_a"], r["n_b"], r["lift"])
           for r in q_a19_event_lift(spark, str(tmp_path)).collect()}
    assert got[("x", "y")] == (2, 3, 3, round((2 / 4) / ((3 / 4) * (3 / 4)), 9))
    assert got[("y", "z")] == (1, 3, 1, round((1 / 4) / ((3 / 4) * (1 / 4)), 9))
    assert ("x", "z") not in got


def test_a20_log2_hist_bucket_edges(spark, tmp_path):
    from xdan_dqa_spark.plans.entry_queries import q_a20_length_log2_hist

    # n_chars 1→bucket 1, 2,3→2, 4..7→3, 1024→11 (exact power of two —
    # the case where floor(log2) would be ULP-fragile)
    rows = [(i, "t", "en", "s", n) for i, n in
            enumerate([1, 2, 3, 4, 7, 1024])]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["log2_bucket"]: (r["n_docs"], r["min_chars"], r["max_chars"])
           for r in q_a20_length_log2_hist(spark, str(tmp_path)).collect()}
    assert got == {1: (1, 1, 1), 2: (2, 2, 3), 3: (2, 4, 7), 11: (1, 1024, 1024)}
