"""Similarity search over embedding columns (array<float>).

Not present in the reference (its similarity notion is the LLM's category
label); required for a training-data pipeline at scale. Three paths:

  * brute-force cosine top-k — exact baseline; one pass over the table,
    TakeOrdered top-k (no full sort shuffle).
  * LSH-bucketed ANN — random-hyperplane signatures (sign of dot with
    frozen seed planes) bucket the table; the scan touches only the
    query's bucket (± multiprobe neighbors at 1 bit flipped).
  * IVF-Flat ANN — coarse quantizer over deterministic seed centroids
    (optionally k-means-refined); probes the n_probe nearest inverted
    lists. The list id is the storage partition key at scale, so probing
    prunes I/O, not just CPU.

All per-row vector math here is Arrow-vectorized: ONE numpy matmul per
batch against a closure-held query/plane/centroid matrix (float64). The
round-1 formulation used interpreted higher-order functions
(F.aggregate/zip_with) with the matrices inlined as plan literals — HOF
lambdas are not whole-stage-codegen'd and the plan itself exploded at
real dims (768) × real list counts (1024); a pandas UDF moves the same
arithmetic into one BLAS call per Arrow batch and keeps the plan O(1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _matrix(s: pd.Series) -> np.ndarray:
    """Arrow array column batch → (n, dim) float64 matrix."""
    return np.vstack(s.to_numpy()).astype("float64", copy=False)


def cosine_to_query(vec_col: str | Column, query: list[float]) -> Column:
    """Cosine similarity of an array column vs a constant query vector.
    One matmul per Arrow batch; the query rides the UDF closure (broadcast
    with the serialized task, not inlined into the plan)."""
    q = np.asarray(query, dtype="float64")
    qn = float(np.linalg.norm(q)) or 1.0

    @pandas_udf("double")
    def _cos(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="float64")
        m = _matrix(v)
        return pd.Series((m @ q) / (np.linalg.norm(m, axis=1) * qn))

    return _cos(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def _pair_cosine_udf():
    # built lazily — pandas_udf schema parsing needs an active session
    @pandas_udf("double")
    def _pair_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        ma, mb = _matrix(a), _matrix(b)
        dots = np.einsum("ij,ij->i", ma, mb)
        return pd.Series(dots / (np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)))

    return _pair_cosine


def brute_force_topk(df: DataFrame, query: list[float], k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k: map-side scoring + a k-row ORDER BY (TakeOrdered
    — partial top-k per partition, no full sort shuffle)."""
    return (
        df.select(F.col(id_col), cosine_to_query(vec_col, query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def pairwise_neardup(df: DataFrame, threshold: float = 0.95,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     block_col: str | None = "label",
                     allow_cartesian: bool = False) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b, cosine ≥ τ).

    A blocking column bounds the join (same-label pairs only). With no
    natural block, LSH-bucket first (`hyperplane_bucket`) — the unblocked
    path is a cartesian product and must be requested explicitly with
    ``allow_cartesian=True`` (a silent crossJoin is a scale-killer)."""
    if block_col is None and not allow_cartesian:
        raise ValueError(
            "pairwise_neardup without block_col is O(n^2); pass a blocking "
            "column (e.g. hyperplane_bucket) or allow_cartesian=True"
        )
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"),
                  *([F.col(block_col)] if block_col else []))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"),
                  *([F.col(block_col)] if block_col else []))
    joined = a.join(b, [block_col]) if block_col else a.crossJoin(b)
    joined = joined.filter(F.col("a") < F.col("b"))
    return (
        joined.withColumn("cosine", _pair_cosine_udf()(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def hyperplane_planes(dim: int, bits: int = 8, seed: int = 42) -> np.ndarray:
    """Frozen random hyperplanes (deterministic; part of the index spec)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def hyperplane_bucket(vec_col: str | Column, planes: np.ndarray) -> Column:
    """Sign-of-dot LSH bucket id (int): one (batch × planes) matmul."""
    p = np.asarray(planes, dtype="float64")
    weights = (1 << np.arange(p.shape[0])).astype("int64")

    @pandas_udf("int")
    def _bucket(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        signs = _matrix(v) @ p.T > 0
        return pd.Series((signs @ weights).astype("int32"))

    return _bucket(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def ivf_centroids(df: DataFrame, n_lists: int = 16, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> list[list[float]]:
    """Deterministic IVF seed centroids: the vectors with the n_lists
    smallest md5(id) digests — a fixed pseudo-random sample, stable across
    runs/partitionings and reproducible in ANY engine with md5 (the
    round-1 xxhash64 ordering was Spark-only, so the IVF query could not
    be oracle-checked).

    At 100 TB this is a driver-side collect of n_lists rows (tiny); the
    assignment pass is the heavy, fully-distributed part."""
    rows = (
        df.select(F.col(vec_col).alias("v"),
                  F.md5(F.col(id_col).cast("string")).alias("h"))
        .orderBy("h")
        .limit(n_lists)
        .collect()
    )
    return [[float(x) for x in r["v"]] for r in rows]


def _assign_udf(centroids: list[list[float]]):
    c = np.asarray(centroids, dtype="float64")
    cn = np.linalg.norm(c, axis=1)
    cn[cn == 0] = 1.0

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        m = _matrix(v)
        cos = (m @ c.T) / (np.linalg.norm(m, axis=1)[:, None] * cn[None, :])
        # argmax returns the FIRST max index — same tie-break as a strict
        # `>` scan, and the same rule the SQL oracle expresses
        return pd.Series(np.argmax(cos, axis=1).astype("int32"))

    return _assign


def ivf_assign(df: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine, first-max
    tie-break) — one matmul per batch against the closure-held centroid
    matrix. Adds ``_list`` (inverted-list id). At scale, write partitioned
    by ``_list`` so probes prune to n_probe/n_lists of the data."""
    return df.withColumn("_list", _assign_udf(centroids)(F.col(vec_col)))


def ivf_refine_centroids(df: DataFrame, centroids: list[list[float]],
                         iters: int = 2, vec_col: str = "embedding") -> list[list[float]]:
    """Distributed Lloyd iterations over the seed centroids (mini k-means).

    Each iteration: assign (matmul UDF) → per-list mean via posexplode +
    DECIMAL sums. Decimal accumulation is exact, so the refined centroids
    are bit-deterministic regardless of partitioning/row order — the index
    spec stays reproducible from the data alone. Cost per iter: one
    shuffle of rows×dim exploded (id, pos, value) triples with map-side
    partial aggregation; empty lists keep their previous centroid."""
    cents = [list(map(float, c)) for c in centroids]
    for _ in range(iters):
        assigned = ivf_assign(df, cents, vec_col)
        sums = (
            assigned.select(F.col("_list"), F.posexplode(F.col(vec_col)).alias("_p", "_x"))
            .groupBy("_list", "_p")
            .agg(
                F.sum(F.col("_x").cast("decimal(28,12)")).alias("_s"),
                F.count("*").alias("_n"),
            )
            .collect()
        )
        by_list: dict[int, dict[int, tuple[float, int]]] = {}
        for r in sums:
            by_list.setdefault(r["_list"], {})[r["_p"]] = (float(r["_s"]), r["_n"])
        for li, dims in by_list.items():
            cents[li] = [dims[p][0] / dims[p][1] for p in sorted(dims)]
    return cents


def ivf_topk(df: DataFrame, query: list[float], k: int = 10, n_lists: int = 16,
             n_probe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id",
             centroids: list[list[float]] | None = None,
             refine_iters: int = 0) -> DataFrame:
    """IVF approximate top-k: exact-score only the n_probe inverted lists
    whose centroids are closest to the query (classic IVF-Flat). With
    ``_list`` as the storage partition key the scan reads n_probe/n_lists
    of the table; recall is tuned by n_probe (n_probe=n_lists → exact)
    and by refine_iters (k-means passes over the seed centroids)."""
    cents = centroids if centroids is not None else ivf_centroids(df, n_lists, vec_col, id_col)
    if refine_iters > 0:
        cents = ivf_refine_centroids(df, cents, refine_iters, vec_col)
    probes = ivf_probe_lists(query, cents, n_probe)
    assigned = ivf_assign(df, cents, vec_col)
    return (
        assigned.filter(F.col("_list").isin(probes))
        .select(F.col(id_col), cosine_to_query(vec_col, query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplane_probes(query: list[float], planes: np.ndarray,
                       multiprobe: bool = True) -> list[int]:
    """Query's bucket id plus (optionally) every 1-bit-flip neighbor."""
    bits = planes.shape[0]
    qv = np.asarray(query, dtype="float64")
    qbucket = int(sum((1 << i) for i, p in enumerate(planes) if float(p @ qv) > 0))
    return [qbucket] + ([qbucket ^ (1 << i) for i in range(bits)] if multiprobe else [])


def ann_topk(df: DataFrame, query: list[float], k: int = 10, bits: int = 8,
             vec_col: str = "embedding", id_col: str = "vec_id",
             multiprobe: bool = True) -> DataFrame:
    """Approximate top-k: score only vectors in the query's hyperplane
    bucket (plus all 1-bit-flip neighbor buckets when multiprobe=True).

    At scale the bucket id is a table partition/cluster key, so this scan
    prunes to ~ (1+bits)/2^bits of the data (see write_lsh_index /
    lsh_topk_from_index for the persisted form that proves the pruning)."""
    planes = hyperplane_planes(len(query), bits)
    probes = _hyperplane_probes(query, planes, multiprobe)
    bucketed = df.withColumn("_bucket", hyperplane_bucket(vec_col, planes))
    return (
        bucketed.filter(F.col("_bucket").isin(probes))
        .select(F.col(id_col), cosine_to_query(vec_col, query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# -------------------------------------------------- persisted ANN indexes
#
# The in-line ann_topk/ivf_topk paths recompute bucket/list assignment per
# query — right for one-shot jobs, wrong for a served index at 100 TB.
# The persisted form writes the assignment ONCE as a Hive-style partition
# column; every probe then becomes a parquet scan whose partition filter
# prunes listing AND I/O to the probed directories (Catalyst partition
# pruning — verified by inputFiles() in tests/test_similarity.py). The
# index spec (planes seed / centroid list) is frozen at build time and is
# all a reader needs.

def write_lsh_index(df: DataFrame, path: str, bits: int = 8, dim: int | None = None,
                    vec_col: str = "embedding", seed: int = 42) -> np.ndarray:
    """Materialize a hyperplane-LSH index: parquet partitioned by _bucket.
    Returns the frozen plane matrix (the index spec)."""
    if dim is None:
        dim = len(df.select(vec_col).head()[0])
    planes = hyperplane_planes(dim, bits, seed)
    (df.withColumn("_bucket", hyperplane_bucket(vec_col, planes))
       .write.partitionBy("_bucket").mode("overwrite").parquet(path))
    return planes


def lsh_topk_from_index(spark, path: str, planes: np.ndarray, query: list[float],
                        k: int = 10, vec_col: str = "embedding",
                        id_col: str = "vec_id", multiprobe: bool = True) -> DataFrame:
    """ANN top-k over a persisted LSH index: the _bucket isin() filter is a
    partition-pruning predicate — only probed directories are listed/read."""
    probes = _hyperplane_probes(query, planes, multiprobe)
    return (
        spark.read.parquet(path)
        .filter(F.col("_bucket").isin(probes))
        .select(F.col(id_col), cosine_to_query(vec_col, query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def write_ivf_index(df: DataFrame, path: str, n_lists: int = 16,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    refine_iters: int = 0,
                    centroids: list[list[float]] | None = None) -> list[list[float]]:
    """Materialize an IVF-Flat index: parquet partitioned by _list.
    Returns the frozen centroid list (the index spec)."""
    cents = centroids if centroids is not None else ivf_centroids(df, n_lists, vec_col, id_col)
    if refine_iters > 0:
        cents = ivf_refine_centroids(df, cents, refine_iters, vec_col)
    (ivf_assign(df, cents, vec_col)
       .write.partitionBy("_list").mode("overwrite").parquet(path))
    return cents


def ivf_probe_lists(query: list[float], centroids: list[list[float]],
                    n_probe: int) -> list[int]:
    """The n_probe inverted lists nearest the query (max cosine)."""
    qv = np.asarray(query, dtype="float64")
    qn = np.linalg.norm(qv) or 1.0
    sims = []
    for i, c in enumerate(centroids):
        cv = np.asarray(c, dtype="float64")
        cn = np.linalg.norm(cv) or 1.0
        sims.append((float(qv @ cv / (qn * cn)), i))
    return [i for _, i in sorted(sims, key=lambda t: (-t[0], t[1]))[:n_probe]]


def ivf_topk_from_index(spark, path: str, centroids: list[list[float]],
                        query: list[float], k: int = 10, n_probe: int = 4,
                        vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF top-k over a persisted index: the _list isin() filter prunes the
    scan to n_probe/n_lists of the stored files."""
    probes = ivf_probe_lists(query, centroids, n_probe)
    return (
        spark.read.parquet(path)
        .filter(F.col("_list").isin(probes))
        .select(F.col(id_col), cosine_to_query(vec_col, query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_append(df_new: DataFrame, path: str, centroids: list[list[float]],
               vec_col: str = "embedding", id_col: str = "vec_id") -> None:
    """Append a new ingest batch to a persisted IVF index WITHOUT
    touching the existing lists — the steady-state embedding-ingest
    shape (pair of operators/dedup.py:minhash_index_write for the text
    side): vectors are assigned to the FROZEN centroids the index was
    built with, then appended under their _list partition directories.

    Freezing the centroids is the correctness contract: re-clustering
    per ingest would silently re-home OLD vectors' nearest lists while
    their files stay put, making probes miss them. Drift is handled the
    way production ANN systems do — periodic offline rebuild (a new
    write_ivf_index under a fresh spec), never incremental mutation.

    Scale shape: assignment is the same Arrow-batched argmax-matmul as
    the initial build (centroids broadcast inside the UDF closure,
    n_lists × dim floats); the write only creates files under the
    _list=… directories it appends to, so probe-side partition pruning
    (inputFiles-proven in tests) is unchanged."""
    ivf_assign(df_new, centroids, vec_col).write.partitionBy(
        "_list"
    ).mode("append").parquet(path)


def int8_topk(emb: DataFrame, query: list[float], k: int = 10,
              vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Brute-force top-k on INT8-QUANTIZED embeddings — the standard
    4× memory / bandwidth optimization for at-scale vector search
    (float32 corpus → int8 codes + one float scale per vector; FAISS
    SQ8 / ScaNN's quantized distance). Each vector is symmetric-range
    quantized (codes = round(x·127/max|x|) ∈ [−127, 127]); the score
    is the EXACT INTEGER dot product of codes, rescaled by the two
    scalar factors: score ≈ ⟨a, q⟩ with error O(1/127) per dimension.
    Returns (vec_id, score) — the quantized ranking, top-k.

    Determinism: the inner product is INTEGER arithmetic (exact in any
    engine, any order); only the two per-vector scale factors are
    floats, applied in one fixed IEEE sequence and rounded — so unlike
    a float32 dot product (summation-order-dependent), the quantized
    ranking is bit-identical cross-engine and cross-partitioning BY
    CONSTRUCTION, which is also why the DuckDB twin can hash-match it.
    Shape: map-only scoring + TakeOrdered top-k; codes never
    materialize corpus-wide (computed in the scan projection) — a
    PERSISTED int8 index would store (codes, scale) columns and cut
    scan bytes ~4×, same probe plan."""
    qm = max(abs(float(x)) for x in query) or 1.0
    qcodes = [int(_round_half_away(x * 127.0 / qm)) for x in query]
    qarr = F.array(*[F.lit(c).cast("long") for c in qcodes])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    m = F.array_max(F.transform(v, lambda x: F.abs(x)))
    codes = F.transform(v, lambda x: F.round(x * F.lit(127.0) / m).cast("long"))
    dot = F.aggregate(
        F.zip_with(codes, qarr, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    score = F.when(
        m > 0,
        F.round(dot.cast("double") * (m / F.lit(127.0))
                * F.lit(qm / 127.0), 6),
    ).otherwise(F.lit(0.0))
    scored = emb.select(F.col(id_col), score.alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def _round_half_away(x: float) -> float:
    """Round half away from zero — the rule Spark's round() and
    DuckDB's round() share (Python's built-in round is half-to-EVEN
    and would disagree on exact .5 code boundaries)."""
    import math

    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def embedding_dim_stats(emb: DataFrame, by: str = "label",
                        vec_col: str = "embedding",
                        ) -> DataFrame:
    """Per-group, per-DIMENSION embedding statistics (mean and spread of
    each coordinate) — the embedding-space drift monitor completing the
    drift trio (ks_drift: numeric columns; unigram_kl_drift: vocabulary;
    this: representation space). A retrained encoder, a normalization
    bug, or a poisoned slice shows up as coordinate means walking away
    from the corpus baseline long before downstream recall moves.
    Returns (group, dim, n, mean_val, var_val).

    Scale shape: ONE posexplode (rows = vectors × dims, map-only) into
    ONE hash aggregate keyed (group, dim) — bounded output (groups ×
    dims), map-side combinable, no windows, no driver state. Float
    discipline: coordinates are rounded to 9 dp and DECIMAL-summed
    (order-free) for both Σx and Σx²; mean/variance come from the
    closed form with one fixed IEEE sequence each, rounded. Variance is
    the population form Σx²/n − mean² — exact-moment arithmetic, the
    same pattern as feature_correlation."""
    ex = emb.select(
        F.col(by),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double")))
        .alias("dim", "x"),
    )
    dec = lambda c: F.round(c, 9).cast("decimal(30,9)")  # noqa: E731
    agg = ex.groupBy(by, "dim").agg(
        F.count("*").alias("n"),
        F.sum(dec(F.col("x"))).alias("_sx"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("_sxx"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("_sx").cast("double") / nd
    var = F.col("_sxx").cast("double") / nd - mean * mean
    return agg.select(
        by, "dim", "n",
        F.round(mean, 6).alias("mean_val"),
        F.round(var, 6).alias("var_val"),
    )


def nearest_centroid_confusion(emb: DataFrame, vec_col: str = "embedding",
                               label_col: str = "label",
                               id_col: str = "vec_id") -> DataFrame:
    """Nearest-centroid classifier confusion census: per-label centroids
    (the embedding_dim_stats mean discipline), every vector assigned to
    its max-dot-product centroid, folded to the (true_label,
    pred_label, n) matrix — the cheapest possible read on whether the
    embedding space SEPARATES the labels (a collapsed encoder shows a
    near-uniform confusion matrix long before a trained probe could
    tell you).

    Determinism discipline: centroid components are rounded exact-
    decimal means (bit-identical cross-engine); each (vector, centroid)
    dot is a sum of ROUNDED per-dim terms accumulated as DECIMAL
    (order-free — a float dot over parallel partitions is not);
    argmax ties break label ASC via a bounded per-vector window
    (n_labels rows). Shape: one posexplode, one bounded (label × dim)
    centroid fold, a dim-keyed join (the vector side never
    broadcasts), one per-(vector, label) fold, one census fold."""
    ex = emb.select(
        F.col(id_col),
        F.col(label_col).alias("_true"),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double")))
        .alias("dim", "x"),
    )
    dec = lambda c: F.round(c, 9).cast("decimal(30,9)")  # noqa: E731
    cent = ex.groupBy(F.col("_true").alias("_cl"), F.col("dim")).agg(
        F.count("*").alias("_n"), F.sum(dec(F.col("x"))).alias("_sx")
    ).select(
        "_cl", "dim",
        F.round(
            F.col("_sx").cast("double") / F.col("_n").cast("double"), 6
        ).alias("c"),
    )
    scored = (
        ex.join(cent, "dim")
        .groupBy(id_col, "_true", "_cl")
        .agg(F.sum(dec(F.col("x") * F.col("c"))).alias("_dot"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc(F.col("_dot")), F.asc("_cl")
    )
    best = scored.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") == 1
    )
    return best.groupBy(
        F.col("_true").alias("true_label"), F.col("_cl").alias("pred_label")
    ).agg(F.count("*").alias("n"))


# ------------------------------------------------- product quantization

def pq_codebooks(df: DataFrame, n_codes: int = 8, m_sub: int = 4,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> list[list[list[float]]]:
    """Deterministic PQ codebooks (Jégou et al. 2011): split the vector
    into ``m_sub`` contiguous subspaces; each subspace's ``n_codes``
    codewords are the corresponding subvectors of the n_codes rows with
    the smallest md5(id) digests — the same engine-portable seed rule
    as ivf_centroids, so the whole index spec is reproducible from the
    data alone in any engine with md5. Returns [m][j] -> subvector.

    At 100 TB this collects n_codes rows (tiny); encoding is the heavy
    distributed part. A production build would Lloyd-refine per
    subspace exactly like ivf_refine_centroids (same DECIMAL-exact
    recipe); seeds-only keeps the spec closed-form."""
    rows = (
        df.select(F.col(vec_col).alias("v"),
                  F.md5(F.col(id_col).cast("string")).alias("h"))
        .orderBy("h")
        .limit(n_codes)
        .collect()
    )
    vecs = [[float(x) for x in r["v"]] for r in rows]
    dim = len(vecs[0])
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    d = dim // m_sub
    return [[v[m * d:(m + 1) * d] for v in vecs] for m in range(m_sub)]


def pq_encode(df: DataFrame, codebooks: list[list[list[float]]],
              vec_col: str = "embedding") -> DataFrame:
    """Encode each vector as ``m_sub`` byte codes: per subspace, the
    codeword maximizing the raw inner product (first-max tie-break,
    matching the SQL twin's ORDER BY d DESC, j ASC). Adds ``_codes``
    (array<int>). One numpy matmul per (subspace, Arrow batch); at
    dim=768, m=96 this is 96 skinny matmuls per batch — still one
    Python crossing. The codes are what an index stores: m_sub bytes
    per vector vs 4·dim — the 64-256x footprint cut that makes
    billion-vector rerank RAM-resident."""
    cbs = [np.asarray(cb, dtype="float64") for cb in codebooks]
    d = cbs[0].shape[1]

    @pandas_udf("array<int>")
    def _enc(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        x = _matrix(v)
        codes = [
            np.argmax(x[:, m * d:(m + 1) * d] @ cbs[m].T, axis=1)
            for m in range(len(cbs))
        ]
        stacked = np.stack(codes, axis=1).astype("int32")
        return pd.Series(list(stacked))

    return df.withColumn("_codes", _enc(F.col(vec_col)))


def pq_topk(df: DataFrame, query: list[float], k: int = 10,
            n_codes: int = 8, m_sub: int = 4, vec_col: str = "embedding",
            id_col: str = "vec_id") -> DataFrame:
    """PQ asymmetric-distance top-k with exact rerank evidence:
    (id, pq_score, cosine_r). The query is NOT quantized (ADC): its
    per-subspace inner products against every codeword form an
    m_sub × n_codes lookup table, and each document's approximate inner
    product is the sum of m_sub table lookups on its stored codes — the
    compressed-domain scan that never touches the original vectors.
    The exact cosine of the winners rides along as the rerank column.

    Determinism discipline: each LUT entry is one left-to-right float
    dot rounded to 9 dp (≡ the twin's round(list_dot_product, 9));
    per-doc scores are DECIMAL sums of those rounded terms
    (order-independent); ranking ties break by id. Scale shape: the
    LUT is m_sub · n_codes plan literals; scoring is a pure Column
    expression over the codes column (no vector bytes read); top-k is
    TakeOrdered; only the ≤k winners' vectors are touched for the
    exact-cosine rerank (id-keyed semi join)."""
    cbs = pq_codebooks(df, n_codes, m_sub, vec_col, id_col)
    d = len(cbs[0][0])
    lut = [
        [
            round(sum(query[m * d + i] * cbs[m][j][i] for i in range(d)), 9)
            for j in range(n_codes)
        ]
        for m in range(m_sub)
    ]
    enc = pq_encode(df, cbs, vec_col)
    score = None
    for m in range(m_sub):
        tbl = F.array(*[F.lit(x) for x in lut[m]])
        term = F.element_at(tbl, F.element_at(F.col("_codes"), m + 1) + 1)
        term = term.cast("decimal(28,9)")
        score = term if score is None else score + term
    top = (
        enc.select(F.col(id_col), F.round(score.cast("double"), 9).alias("pq_score"))
        .orderBy(F.desc("pq_score"), F.asc(id_col))
        .limit(k)
    )
    rerank = df.join(top, id_col, "left_semi").select(
        F.col(id_col), F.round(cosine_to_query(vec_col, query), 6).alias("cosine_r")
    )
    return top.join(rerank, id_col).select(id_col, "pq_score", "cosine_r")


def _pair_l2_udf():
    @pandas_udf("double")
    def _pair_l2(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        d = _matrix(a) - _matrix(b)
        return pd.Series(np.sqrt(np.einsum("ij,ij->i", d, d)))

    return _pair_l2


def energy_distance(df_a: DataFrame, df_b: DataFrame,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    n_sample: int = 100) -> DataFrame:
    """Multivariate two-sample drift by the ENERGY DISTANCE (Székely &
    Rizzo): E = 2·E‖X−Y‖ − E‖X−X′‖ − E‖Y−Y′‖ over deterministic
    md5-smallest subsamples of each side — zero iff the distributions
    match, sensitive to ANY multivariate change (mean shift, scale,
    rotation), where per-dimension stats (emb_dim_stats) miss
    correlated drift. One row: (n_a, n_b, mean_between, mean_within_a,
    mean_within_b, energy_distance).

    Subsampling IS the scale strategy (the statistic is all-pairs
    O(n²) by definition; every production use subsamples): the
    md5-order sample is reproducible in any engine, the three pair
    sets are bounded crossJoins of n_sample-row broadcasts (≤ n² =
    10⁴ pairs at the default), and each distance is one Arrow-batch
    numpy op rounded to 6 dp with DECIMAL means — cross-engine
    bit-identical. Within-side pairs take i<j (unordered, no self
    pairs), matching the unbiased V-statistic form."""
    if n_sample < 2:
        raise ValueError(f"n_sample must be >= 2, got {n_sample}")
    dist = _pair_l2_udf()

    def sample(df, tag):
        return (
            df.select(F.col(id_col).alias(f"_i{tag}"),
                      F.col(vec_col).alias(f"_v{tag}"),
                      F.md5(F.col(id_col).cast("string")).alias("_h"))
            .orderBy("_h").limit(n_sample).drop("_h")
        )

    sa, sb = sample(df_a, "a"), sample(df_b, "b")
    d6 = lambda x, y: F.round(dist(x, y), 6).cast("decimal(28,6)")  # noqa: E731
    between = sa.crossJoin(sb).agg(
        F.sum(d6(F.col("_va"), F.col("_vb"))).alias("_s"),
        F.count("*").alias("_n"),
    ).select(
        F.round((F.col("_s") / F.col("_n")).cast("double"), 6).alias("mean_between")
    )
    sa2 = sa.select(F.col("_ia").alias("_ja"), F.col("_va").alias("_wa"))
    wa = (
        sa.crossJoin(sa2).filter(F.col("_ia") < F.col("_ja"))
        .agg(F.sum(d6(F.col("_va"), F.col("_wa"))).alias("_s"),
             F.count("*").alias("_n"))
        .select(F.round((F.col("_s") / F.col("_n")).cast("double"), 6)
                .alias("mean_within_a"))
    )
    sb2 = sb.select(F.col("_ib").alias("_jb"), F.col("_vb").alias("_wb"))
    wb = (
        sb.crossJoin(sb2).filter(F.col("_ib") < F.col("_jb"))
        .agg(F.sum(d6(F.col("_vb"), F.col("_wb"))).alias("_s"),
             F.count("*").alias("_n"))
        .select(F.round((F.col("_s") / F.col("_n")).cast("double"), 6)
                .alias("mean_within_b"))
    )
    na = sa.agg(F.count("*").alias("n_a"))
    nb = sb.agg(F.count("*").alias("n_b"))
    return (
        na.crossJoin(nb).crossJoin(between).crossJoin(wa).crossJoin(wb)
        .select(
            "n_a", "n_b", "mean_between", "mean_within_a", "mean_within_b",
            F.round(
                F.lit(2.0) * F.col("mean_between")
                - F.col("mean_within_a") - F.col("mean_within_b"),
                6,
            ).alias("energy_distance"),
        )
    )


def mmr_rerank(df: DataFrame, query: list[float], k: int = 5,
               pool: int = 10, lam: float = 0.7,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """Maximal Marginal Relevance diversity rerank (Carbonell &
    Goldstein, SIGIR 1998): from the cosine top-``pool`` candidates,
    greedily pick ``k`` docs maximizing λ·sim(q,d) − (1−λ)·max_{s∈S}
    sim(d,s) — the standard de-redundancy pass that keeps a results
    page (or a few-shot example set) from being five near-copies of
    the best hit. Returns (step, id, qsim, mmr_score).

    Shape: retrieval does the distributed work (brute-force/ANN top-
    pool); the greedy loop then runs DRIVER-SIDE on the collected
    pool — deliberately: MMR is sequential by definition and the pool
    is ≤ tens of rows, so pushing k dependent distributed jobs would
    be pure overhead. Determinism: query sims and the pool×pool sim
    matrix are rounded to 6 dp BEFORE the greedy (both engines compare
    identical values), each step's score is one fixed float sequence
    round(λ·qs − (1−λ)·maxsim, 6), ties → lowest id."""
    if not (0.0 <= lam <= 1.0):
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if k < 1 or pool < k:
        raise ValueError(f"need 1 <= k <= pool, got k={k}, pool={pool}")
    cand = brute_force_topk(df, query, pool).select(
        F.col(id_col), F.round(F.col("cosine"), 6).alias("_qs")
    )
    withv = cand.join(df.select(F.col(id_col), F.col(vec_col)), id_col)
    left = withv.select(F.col(id_col).alias("_a"), F.col("_qs"),
                        F.col(vec_col).alias("_va"))
    right = withv.select(F.col(id_col).alias("_b"),
                         F.col(vec_col).alias("_vb"))
    pc = _pair_cosine_udf()
    sim_rows = (
        left.crossJoin(right).filter(F.col("_a") != F.col("_b"))
        .select("_a", "_b",
                F.round(pc(F.col("_va"), F.col("_vb")), 6).alias("_s"))
        .collect()
    )
    qs = {r["_a"]: r["_qs"] for r in
          left.select("_a", "_qs").distinct().collect()}
    sims: dict[tuple, float] = {(r["_a"], r["_b"]): r["_s"] for r in sim_rows}
    selected: list = []
    out = []
    for step in range(1, k + 1):
        best = None
        for c in sorted(qs):
            if c in selected:
                continue
            ms = max((sims[(c, s)] for s in selected), default=0.0)
            score = round(lam * qs[c] - (1.0 - lam) * ms, 6)
            if best is None or score > best[1]:
                best = (c, score)
        if best is None:
            break
        selected.append(best[0])
        out.append((step, best[0], qs[best[0]], best[1]))
    return df.sparkSession.createDataFrame(
        out, f"step int, {id_col} long, qsim double, mmr_score double"
    )
