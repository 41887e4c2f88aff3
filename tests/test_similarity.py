"""Similarity search: brute-force exactness, ANN recall, near-dup pairs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xdan_dqa_spark.operators.similarity import (
    ann_topk,
    brute_force_topk,
    cosine_to_query,
    pairwise_neardup,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


@pytest.fixture(scope="module")
def query(emb):
    row = emb.filter(F.col("vec_id") == 0).collect()[0]
    return [float(x) for x in row["embedding"]]


def test_cosine_matches_numpy(emb, query):
    got = (
        emb.select("vec_id", cosine_to_query("embedding", query).alias("c"))
        .orderBy("vec_id").limit(20).toPandas()
    )
    pdf = emb.orderBy("vec_id").limit(20).toPandas()
    q = np.asarray(query)
    for _, r in pdf.iterrows():
        v = np.asarray(r["embedding"], dtype="float64")
        expected = float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        got_c = float(got[got["vec_id"] == r["vec_id"]]["c"].iloc[0])
        assert abs(got_c - expected) < 1e-9


def test_brute_force_topk_self_first(emb, query):
    top = brute_force_topk(emb, query, k=5).collect()
    assert top[0]["vec_id"] == 0          # the query vector itself
    assert abs(top[0]["cosine"] - 1.0) < 1e-9
    cosines = [r["cosine"] for r in top]
    assert cosines == sorted(cosines, reverse=True)


def test_ann_recall_vs_brute_force(emb, query):
    exact = [r["vec_id"] for r in brute_force_topk(emb, query, k=10).collect()]
    approx = [r["vec_id"] for r in ann_topk(emb, query, k=10, bits=3).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.6, f"ANN recall {recall}"
    assert approx[0] == 0                 # self always lands in its own bucket


def test_pairwise_neardup_blocked(emb):
    pairs = pairwise_neardup(emb, threshold=0.3, block_col="label")
    rows = pairs.collect()
    for r in rows:
        assert r["a"] < r["b"]
        assert r["cosine"] >= 0.3


def test_ivf_topk_recall_and_determinism(emb, query):
    from xdan_dqa_spark.operators.similarity import ivf_assign, ivf_centroids, ivf_topk

    exact = [r["vec_id"] for r in brute_force_topk(emb, query, k=10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(emb, query, k=10, n_lists=8, n_probe=4).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"IVF recall {recall}"
    # full probe == exact search
    allprobe = [r["vec_id"] for r in ivf_topk(emb, query, k=10, n_lists=8, n_probe=8).collect()]
    assert allprobe == exact
    # centroid seeds + assignment are partition-invariant
    c1 = ivf_centroids(emb, 8)
    c2 = ivf_centroids(emb.repartition(7), 8)
    assert c1 == c2
    a1 = {r["vec_id"]: r["_list"] for r in ivf_assign(emb, c1).select("vec_id", "_list").collect()}
    a2 = {r["vec_id"]: r["_list"] for r in ivf_assign(emb.repartition(5), c1).select("vec_id", "_list").collect()}
    assert a1 == a2


def test_ivf_kmeans_refinement(emb, query):
    from xdan_dqa_spark.operators.similarity import (
        brute_force_topk,
        ivf_centroids,
        ivf_refine_centroids,
        ivf_topk,
    )

    # Mean recall over several queries (single-query recall@10 is noisy on
    # the weakly-clustered synthetic embeddings; refined k-means centroids
    # must beat the raw seeds and clear 0.7 at n_probe=4 of n_lists=8).
    seeds = ivf_centroids(emb, 8)
    refined = ivf_refine_centroids(emb, seeds, iters=3)
    qids = [0, 7, 23, 41, 77]
    queries = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }

    def mean_recall(cents):
        total = 0.0
        for qid, q in queries.items():
            exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
            approx = {
                r["vec_id"]
                for r in ivf_topk(emb, q, k=10, n_lists=8, n_probe=4,
                                  centroids=cents).collect()
            }
            total += len(exact & approx) / 10
        return total / len(queries)

    seed_recall, refined_recall = mean_recall(seeds), mean_recall(refined)
    assert refined_recall >= seed_recall, (seed_recall, refined_recall)
    assert refined_recall >= 0.7, f"refined IVF mean recall@10 {refined_recall}"

    # decimal-sum refinement is bit-deterministic across partitionings
    r2 = ivf_refine_centroids(emb.repartition(7), seeds, iters=3)
    assert refined == r2
    # refinement moves centroids (they stop being raw data vectors)
    assert refined != seeds


def _assert_partition_pruned(df, part_col: str, probes: set[int]) -> None:
    """Two proofs that a scan over a partitioned index is pruned to the
    probed directories:
      (1) the physical plan's FileScan carries a PartitionFilters entry on
          the partition column (Catalyst prunes the file listing itself —
          un-probed directories are never listed or opened; note
          ``inputFiles()`` can NOT show this, it reports the relation's
          full listing regardless of filters);
      (2) input_file_name() over the executed scan confirms every row
          came from a probed directory."""
    from pyspark.sql import functions as F

    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.split("\n") if "PartitionFilters" in ln]
    assert pf, plan
    filters = pf[0].split("PartitionFilters: [", 1)[1]
    assert part_col in filters and " IN " in filters, pf[0]
    touched = {
        int(r[0].split(f"{part_col}=")[1].split("/")[0])
        for r in df.select(F.input_file_name()).distinct().collect()
    }
    assert touched and touched <= probes, (touched, probes)


def test_persisted_index_partition_pruning(emb, query, tmp_path):
    """The 'probes prune I/O' claim, proven: a persisted IVF/LSH index is
    parquet partitioned by its list/bucket id, and a probe query's scan
    reads ONLY files under the probed directories (Catalyst partition
    pruning on the isin() filter) while returning the same top-k as the
    in-line operator."""
    from xdan_dqa_spark.operators.similarity import (
        _hyperplane_probes,
        ivf_probe_lists,
        ivf_topk,
        ivf_topk_from_index,
        lsh_topk_from_index,
        write_ivf_index,
        write_lsh_index,
    )

    spark = emb.sparkSession

    # ---- IVF ----
    ivf_path = str(tmp_path / "ivf_index")
    cents = write_ivf_index(emb, ivf_path, n_lists=8)
    probes = set(ivf_probe_lists(query, cents, 4))
    scan = spark.read.parquet(ivf_path).filter(F.col("_list").isin(list(probes)))
    _assert_partition_pruned(scan, "_list", probes)
    # same answer as the in-line operator with the same centroids
    res = ivf_topk_from_index(spark, ivf_path, cents, query, k=10, n_probe=4)
    inline = [r["vec_id"] for r in ivf_topk(emb, query, k=10, n_lists=8,
                                            n_probe=4, centroids=cents).collect()]
    assert [r["vec_id"] for r in res.collect()] == inline

    # ---- hyperplane LSH ----
    lsh_path = str(tmp_path / "lsh_index")
    planes = write_lsh_index(emb, lsh_path, bits=3)
    probes = set(_hyperplane_probes(query, planes, True))
    scan = spark.read.parquet(lsh_path).filter(F.col("_bucket").isin(list(probes)))
    _assert_partition_pruned(scan, "_bucket", probes)
    approx = [r["vec_id"] for r in
              lsh_topk_from_index(spark, lsh_path, planes, query, k=10).collect()]
    assert approx[0] == 0  # self lands in its own bucket


def test_pairwise_neardup_cartesian_guard(emb):
    with pytest.raises(ValueError):
        pairwise_neardup(emb, block_col=None)
    # explicit opt-in works
    n = pairwise_neardup(emb.limit(20), threshold=0.3, block_col=None,
                         allow_cartesian=True).count()
    assert n >= 0


def test_emb_norm_stats_hand_computed(spark):
    import math

    import os
    import tempfile

    from xdan_dqa_spark.plans.entry_queries import q_emb_norm_stats

    with tempfile.TemporaryDirectory() as td:
        emb = spark.createDataFrame(
            [
                (0, [3.0, 4.0], 1),        # norm 5
                (1, [1.0, 0.0], 1),        # norm 1
                (2, [0.0, 0.0], 2),        # broken zero vector
            ],
            "vec_id long, embedding array<float>, label int",
        )
        emb.write.parquet(os.path.join(td, "embeddings.parquet"))
        rows = {r["label"]: r for r in q_emb_norm_stats(spark, td).collect()}
    assert rows[1]["n_vecs"] == 2
    assert rows[1]["min_norm"] == 1.0 and rows[1]["max_norm"] == 5.0
    assert rows[1]["mean_norm"] == pytest.approx(3.0, abs=1e-9)
    assert rows[2]["max_norm"] == 0.0


def test_ivf_append_equals_oneshot_and_stays_pruned(emb, query, tmp_path):
    """Incremental ingest contract: building the index over a corpus
    slice with frozen centroids, then ivf_append-ing the rest, must
    yield (a) the same file-per-list layout a one-shot build over the
    union with the SAME centroids produces — probe results identical —
    and (b) unchanged probe-side partition pruning."""
    from xdan_dqa_spark.operators.similarity import (
        ivf_append,
        ivf_centroids,
        ivf_probe_lists,
        ivf_topk_from_index,
        write_ivf_index,
    )

    spark = emb.sparkSession
    corpus = emb.filter(F.col("vec_id") % 4 != 0)
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    cents = ivf_centroids(corpus, 8)

    incr = str(tmp_path / "ivf_incr")
    write_ivf_index(corpus, incr, centroids=cents)
    ivf_append(batch, incr, cents)

    oneshot = str(tmp_path / "ivf_oneshot")
    write_ivf_index(emb, oneshot, centroids=cents)

    got_incr = [r["vec_id"] for r in
                ivf_topk_from_index(spark, incr, cents, query, k=10,
                                    n_probe=4).collect()]
    got_one = [r["vec_id"] for r in
               ivf_topk_from_index(spark, oneshot, cents, query, k=10,
                                   n_probe=4).collect()]
    assert got_incr == got_one and len(got_incr) == 10

    # appended batch rows land in the probed directories and pruning holds
    probes = set(ivf_probe_lists(query, cents, 4))
    scan = spark.read.parquet(incr).filter(F.col("_list").isin(list(probes)))
    _assert_partition_pruned(scan, "_list", probes)
    # row conservation: nothing lost or duplicated by the append
    assert spark.read.parquet(incr).count() == emb.count()


def test_int8_topk_recall_vs_exact(spark, emb, query):
    """Quantized ranking must track the float ranking: recall@10 of the
    int8 top-10 against brute-force cosine top-10 well above chance, and
    the self-vector (the query IS vec 0) ranks first."""
    from xdan_dqa_spark.operators.similarity import brute_force_topk, int8_topk

    got = int8_topk(emb, query, k=10).collect()
    assert got[0]["vec_id"] == 0               # exact self-match survives SQ8
    int_ids = {r["vec_id"] for r in got}
    # note: int8 ranks by rescaled dot product, exact ranks by cosine —
    # on unit-ish synthetic embeddings these agree closely
    exact_ids = {r["vec_id"] for r in brute_force_topk(emb, query, k=10).collect()}
    assert len(int_ids & exact_ids) >= 6


def test_int8_topk_repartition_invariant(spark, emb, query):
    from xdan_dqa_spark.operators.similarity import int8_topk

    a = [tuple(r) for r in int8_topk(emb, query, k=10).collect()]
    b = [tuple(r) for r in int8_topk(emb.repartition(7), query, k=10).collect()]
    assert a == b   # integer inner product: exact at any partitioning


def test_embedding_dim_stats_exact_and_invariant(spark):
    from xdan_dqa_spark.operators.similarity import embedding_dim_stats

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [3.0, 0.0], 0), (3, [5.0, 2.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {(r["label"], r["dim"]): (r["n"], r["mean_val"], r["var_val"])
           for r in embedding_dim_stats(emb).collect()}
    assert got[(0, 0)] == (2, 2.0, 1.0)       # mean(1,3)=2, var=1
    assert got[(0, 1)] == (2, 0.0, 0.0)
    assert got[(1, 0)] == (1, 5.0, 0.0)
    a = sorted(map(tuple, embedding_dim_stats(emb).collect()))
    b = sorted(map(tuple, embedding_dim_stats(emb.repartition(5)).collect()))
    assert a == b


def test_nearest_centroid_confusion_separable_clusters(spark):
    """Two well-separated clusters classify perfectly; ties break to
    the lower label."""
    from pyspark.sql import functions as F  # noqa: F401

    from xdan_dqa_spark.operators.similarity import nearest_centroid_confusion

    rows = ([(i, [10.0, 0.0, 0.0], 0) for i in range(20)]
            + [(100 + i, [0.0, 10.0, 0.0], 1) for i in range(20)]
            + [(200, [10.0, 0.5, 0.0], 0)])       # near cluster 0
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {(r["true_label"], r["pred_label"]): r["n"]
           for r in nearest_centroid_confusion(df).collect()}
    assert got == {(0, 0): 21, (1, 1): 20}


# ------------------------------------------------- product quantization

def test_pq_codes_shape_and_range(spark):
    from xdan_dqa_spark.operators.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cbs = pq_codebooks(emb, n_codes=8, m_sub=4)
    assert len(cbs) == 4 and len(cbs[0]) == 8 and len(cbs[0][0]) == 16
    codes = pq_encode(emb, cbs).select("_codes").collect()
    for r in codes:
        assert len(r["_codes"]) == 4
        assert all(0 <= c < 8 for c in r["_codes"])


def test_pq_topk_reranks_self_query_high(spark):
    """Querying with vec 0's own embedding: the ADC scan plus exact
    rerank must keep vec 0 in the top-10 with the top exact cosine
    (1.0) — the recall sanity every PQ rollout checks first."""
    from pyspark.sql import functions as F

    from xdan_dqa_spark.operators.similarity import pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    rows = pq_topk(emb, q, k=10).collect()
    by_id = {r["vec_id"]: r for r in rows}
    assert 0 in by_id
    assert by_id[0]["cosine_r"] == max(r["cosine_r"] for r in rows)


def test_pq_topk_repartition_invariant(spark):
    from pyspark.sql import functions as F

    from xdan_dqa_spark.operators.similarity import pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]]
    a = sorted(map(tuple, pq_topk(emb, q, k=10).collect()))
    b = sorted(map(tuple, pq_topk(emb.repartition(7), q, k=10).collect()))
    assert a == b


# ----------------------------------------------------- energy distance

def test_energy_distance_zero_for_identical_sets(spark):
    """Same sample on both sides: the plug-in between-mean includes the
    n self-pairs (distance 0), so the statistic lands at exactly
    −2·mean_within/n — the known small-sample bias of the V-statistic
    form, pinned here rather than hidden, and vanishing as n grows."""
    from xdan_dqa_spark.operators.similarity import energy_distance

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    r = energy_distance(emb, emb, n_sample=30).collect()[0]
    expected_bias = -2.0 * r["mean_within_a"] / 30
    assert abs(r["energy_distance"] - expected_bias) < 1e-2
    assert r["n_a"] == r["n_b"] == 30


def test_energy_distance_detects_mean_shift(spark):
    """Shifting one side by a constant vector must produce a clearly
    positive statistic (distribution mismatch)."""
    from pyspark.sql import functions as F

    from xdan_dqa_spark.operators.similarity import energy_distance

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    shifted = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x + F.lit(5.0))
        .alias("embedding"),
    )
    r = energy_distance(emb, shifted, n_sample=30).collect()[0]
    assert r["energy_distance"] > 1.0


def test_conformal_bounds_guarantee_on_fixture(spark):
    from xdan_dqa_spark.plans.entry_queries import q_conformal_bounds

    r = q_conformal_bounds(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["lo_bound"] <= r["hi_bound"]
    assert r["n_covered"] <= r["n_test"]
    # 90%-nominal split conformal: allow finite-sample slack
    assert r["coverage"] >= 0.8


def test_mmr_prefers_diverse_over_redundant(spark):
    """Vectors: q-aligned near-duplicates 1,2 and an orthogonal-ish 3.
    Plain top-2 takes {1,2}; MMR at lam=0.3 must take 1 then 3. (When
    the query IS the top vector, sim(c, top) == qsim(c) for every c, so
    lam=0.5 cancels exactly and lam must sit below it for the penalty
    to bite — the diversity-weight calibration note, pinned here.)"""
    from xdan_dqa_spark.operators.similarity import mmr_rerank

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.04, 0.0, 0.0]),
        (3, [0.5, 0.0, 0.86, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = [(r["step"], r["vec_id"])
           for r in mmr_rerank(df, [1.0, 0.0, 0.0, 0.0], k=2, pool=3,
                               lam=0.3).orderBy("step").collect()]
    assert out == [(1, 1), (2, 3)]
