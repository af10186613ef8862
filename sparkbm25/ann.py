"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (exact; JVM-side column math or a
vectorized Arrow stage). Scale path: LSH-bucketed (random hyperplane)
cosine search — candidates come from sign-bucket joins so a query
never scans all vectors; IVF-style coarse quantization variant
included for the ANN inventory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def cosine_topk_bruteforce(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector. Dot products as
    JVM column expressions (zip_with + aggregate) — no Python in the
    scan; the top-k is a two-stage (partial heaps would be overkill:
    k rows per partition survive the window)."""
    emb = _as_double(emb, vec_col)
    q = [float(x) for x in query_vec]
    qn = float(np.sqrt(np.dot(q, q)))
    qlit = F.array(*[F.lit(x) for x in q])
    dot = F.aggregate(F.zip_with(vec_col, qlit, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))
    scored = emb.select(
        F.col(id_col), (dot / (norm * F.lit(qn))).alias("cos"))
    w = Window.orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def hyperplane_signatures(
    emb: DataFrame,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH signature (sign bits packed into an int).
    Vectors with equal signatures have high cosine similarity with
    high probability; bucket = signature."""
    emb = _as_double(emb, vec_col)
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    @F.pandas_udf("int")
    def sig(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy())
        bits = (M @ planes.T) > 0
        return pd.Series((bits.astype(np.int64)
                          << np.arange(n_planes, dtype=np.int64)).sum(axis=1).astype(np.int32))

    return emb.select(F.col(id_col), F.col(vec_col), sig(F.col(vec_col)).alias("bucket"))


def cosine_topk_lsh(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 10,
    probe_hamming: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: score only vectors whose hyperplane
    bucket is within `probe_hamming` bits of the query's bucket
    (multi-probe LSH). At scale the signatures table is partitioned by
    bucket so this is a partition-pruned scan, not a full pass."""
    q = np.asarray(query_vec, dtype=np.float64)
    sigs = hyperplane_signatures(emb, n_planes, seed, id_col, vec_col, dim=q.size)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, q.size))
    qsig = int(((q @ planes.T > 0).astype(np.int64)
                << np.arange(n_planes, dtype=np.int64)).sum())
    probe = {qsig}
    if probe_hamming >= 1:
        probe |= {qsig ^ (1 << i) for i in range(n_planes)}
    if probe_hamming >= 2:
        probe |= {qsig ^ (1 << i) ^ (1 << j)
                  for i in range(n_planes) for j in range(i + 1, n_planes)}
    cand = sigs.where(F.col("bucket").isin([int(x) for x in probe]))
    return cosine_topk_bruteforce(cand, query_vec, k, id_col, vec_col)


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 16,
    sample_fraction: float = 0.1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: sample-KMeans(1 Lloyd round, driver-side
    on a bounded sample) then assign every vector to its nearest
    centroid. Returns (assignments, centroids). At 100 TB the sample
    is a bounded collect; assignment is one Arrow pass."""
    emb = _as_double(emb, vec_col)
    sample = np.stack(
        emb.sample(fraction=min(sample_fraction, 1.0), seed=seed)
        .limit(50_000).select(vec_col).toPandas()[vec_col].to_numpy())
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(sample.shape[0], size=min(n_centroids, sample.shape[0]),
                             replace=False)]
    # one Lloyd refinement on the sample
    d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    asg = d.argmin(axis=1)
    for c in range(cent.shape[0]):
        m = asg == c
        if m.any():
            cent[c] = sample[m].mean(axis=0)

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy())
        d2 = ((M[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    return emb.withColumn("centroid", assign(F.col(vec_col))), cent


def cosine_topk_ivf(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the n_probe nearest centroids' inverted lists
    only."""
    assigned, cent = ivf_assign(emb, n_centroids, seed=seed,
                                id_col=id_col, vec_col=vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((cent - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(d2)[:n_probe]]
    cand = assigned.where(F.col("centroid").isin(probe))
    return cosine_topk_bruteforce(cand, query_vec, k, id_col, vec_col)
