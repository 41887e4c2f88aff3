"""Similarity search over embedding columns (array<float>).

Not present in the reference (its similarity notion is the LLM's category
label); required for a training-data pipeline at scale. Three paths:

  * brute-force cosine top-k — exact baseline; one pass over the table,
    JVM-side arithmetic (zip_with/aggregate), broadcast query vector.
  * LSH-bucketed ANN — the 100 TB path: random-hyperplane signatures
    (sign of dot with frozen seed planes) bucket the table; the scan
    touches only the query's bucket (± multiprobe neighbors at 1 bit
    flipped). Recall tunable by bits/probes.
  * IVF-Flat ANN — coarse quantizer over deterministic seed centroids;
    probes the n_probe nearest inverted lists. The list id is the
    storage partition key at scale, so probing prunes I/O, not just CPU.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_to_query(vec_col: str, query: list[float]) -> F.Column:
    """Cosine similarity of an array column vs a literal query vector —
    all JVM higher-order functions; the query is a plan-time literal
    (broadcast by the plan itself)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    a = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qn = float(np.sqrt(np.sum(np.asarray(query, dtype="float64") ** 2))) or 1.0
    return _dot(a, q) / (_norm(a) * F.lit(qn))


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
                     block_col: str | None = "label") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b, cosine ≥ τ).

    A blocking column bounds the join (same-label pairs only); with no
    natural block, callers should LSH-bucket first (`hyperplane_bucket`).
    """
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"),
                  *( [F.col(block_col)] if block_col else [] ))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"),
                  *( [F.col(block_col)] if block_col else [] ))
    on = [block_col] if block_col else []
    joined = a.join(b, on) if on else a.crossJoin(b)
    joined = joined.filter(F.col("a") < F.col("b"))
    va = F.transform(F.col("_va"), lambda x: x.cast("double"))
    vb = F.transform(F.col("_vb"), lambda x: x.cast("double"))
    cos = _dot(va, vb) / (_norm(va) * _norm(vb))
    return (
        joined.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def hyperplane_planes(dim: int, bits: int = 8, seed: int = 42) -> np.ndarray:
    """Frozen random hyperplanes (deterministic; part of the index spec)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def hyperplane_bucket(vec_col: str, planes: np.ndarray) -> F.Column:
    """Sign-of-dot LSH bucket id (int) for an embedding column."""
    a = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    acc = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        acc = acc + F.when(_dot(a, p) > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return acc


def ivf_centroids(df: DataFrame, n_lists: int = 16, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> list[list[float]]:
    """Deterministic IVF coarse quantizer: the centroid seeds are the
    vectors with the n_lists smallest id-hashes (a fixed pseudo-random
    sample — stable across runs/partitionings, no iterative k-means so
    the index spec is reproducible from the data alone).

    At 100 TB this is a driver-side collect of n_lists rows (tiny); the
    assignment pass below is the heavy, fully-distributed part."""
    rows = (
        df.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(n_lists)
        .collect()
    )
    return [[float(x) for x in r["v"]] for r in rows]


def ivf_assign(df: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine) — one
    map-side pass, centroids inlined as plan literals (broadcast-by-plan).
    Adds ``_list`` (inverted-list id). At scale, write partitioned by
    ``_list`` so probes prune to n_probe/n_lists of the data."""
    best_id, best_cos = F.lit(0), F.lit(-2.0)
    for i, c in enumerate(centroids):
        cos = cosine_to_query(vec_col, c)
        better = cos > best_cos
        best_id = F.when(better, F.lit(i)).otherwise(best_id)
        best_cos = F.when(better, cos).otherwise(best_cos)
    return df.withColumn("_list", best_id)


def ivf_topk(df: DataFrame, query: list[float], k: int = 10, n_lists: int = 16,
             n_probe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id",
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF approximate top-k: exact-score only the n_probe inverted lists
    whose centroids are closest to the query (classic IVF-Flat). With
    ``_list`` as the storage partition key the scan reads n_probe/n_lists
    of the table; recall is tuned by n_probe (n_probe=n_lists → exact)."""
    cents = centroids if centroids is not None else ivf_centroids(df, n_lists, vec_col, id_col)
    qv = np.asarray(query, dtype="float64")
    qn = np.linalg.norm(qv) or 1.0
    sims = []
    for i, c in enumerate(cents):
        cv = np.asarray(c, dtype="float64")
        cn = np.linalg.norm(cv) or 1.0
        sims.append((float(qv @ cv / (qn * cn)), i))
    probes = [i for _, i in sorted(sims, key=lambda t: (-t[0], t[1]))[:n_probe]]
    assigned = ivf_assign(df, cents, vec_col)
    return (
        assigned.filter(F.col("_list").isin(probes))
        .select(F.col(id_col), cosine_to_query(vec_col, query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ann_topk(df: DataFrame, query: list[float], k: int = 10, bits: int = 8,
             vec_col: str = "embedding", id_col: str = "vec_id",
             multiprobe: bool = True) -> DataFrame:
    """Approximate top-k: score only vectors in the query's hyperplane
    bucket (plus all 1-bit-flip neighbor buckets when multiprobe=True).

    At scale the bucket id is a table partition/cluster key, so this scan
    prunes to ~ (1+bits)/2^bits of the data."""
    dim = len(query)
    planes = hyperplane_planes(dim, bits)
    qv = np.asarray(query, dtype="float64")
    qbucket = int(sum((1 << i) for i, p in enumerate(planes) if float(p @ qv) > 0))
    probes = [qbucket] + ([qbucket ^ (1 << i) for i in range(bits)] if multiprobe else [])
    bucketed = df.withColumn("_bucket", hyperplane_bucket(vec_col, planes))
    return (
        bucketed.filter(F.col("_bucket").isin(probes))
        .select(F.col(id_col), cosine_to_query(vec_col, query).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
