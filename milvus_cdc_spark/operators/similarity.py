"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the scale path buckets
vectors with deterministic LSH (sign-random-projection) so each query
only scans its bucket — the same coarse-quantize-then-scan shape as IVF.

The dot product is ``F.zip_with`` + ``F.aggregate`` — JVM-side higher-
order functions, no Python per row. For very wide vectors a pandas UDF
over Arrow batches can beat HOF; both are provided and cross-checked in
tests (`cosine_topk(..., impl="pandas")`).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "builtin",
) -> DataFrame:
    """Exact brute-force cosine top-k against one query vector.

    One scan + a driver-side top-k reduce (Spark's ``orderBy().limit(k)``
    is a per-partition partial top-k followed by a k-row merge — no full
    sort at scale). Score rounded to 6 dp for engine-portable comparison.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    if impl == "pandas":
        qlist = [float(x) for x in query_vec]

        @F.pandas_udf(DoubleType())
        def cos(col: pd.Series) -> pd.Series:
            import numpy as np

            qv = np.asarray(qlist, dtype=np.float64)
            qn_ = np.linalg.norm(qv)
            mat = np.stack(col.map(lambda v: np.asarray(v, dtype=np.float64)).values)
            return pd.Series(mat @ qv / (np.linalg.norm(mat, axis=1) * qn_))

        scored = embeddings.select(F.col(id_col), cos(F.col(vec_col)).alias("raw"))
    else:
        scored = embeddings.select(
            F.col(id_col),
            (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))).alias("raw"),
        )
    return (
        scored.select(F.col(id_col), F.round(F.col("raw"), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def srp_bucket(vec_col, planes: list[list[float]]):
    """Sign-random-projection bucket id: bit j = sign(v · plane_j).
    Planes are deterministic (seeded) driver-side constants — broadcast
    as literals into the plan, no shuffle to assign buckets."""
    bucket = F.lit(0)
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(_dot(vec_col, plane) > 0, F.lit(2**j)).otherwise(F.lit(0))
    return bucket


def make_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG-based, no numpy RNG
    state) — same planes on every run/cluster size."""
    planes = []
    state = seed or 1
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (2**64)
            row.append(((state >> 33) / 2**31) - 1.0)  # [-1, 1)
        planes.append(row)
    return planes


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: scan only the query's SRP bucket (+ optionally
    neighbors). At 100 TB this is the coarse-quantization step that turns
    a full scan into a 1/2^n_planes partition-pruned scan; store the
    table partitioned by bucket to get file-level pruning."""
    dim = len(query_vec)
    planes = make_planes(dim, n_planes, seed)
    qbucket = 0
    for j, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) > 0:
            qbucket += 2**j
    bucketed = embeddings.withColumn("__bucket", srp_bucket(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("__bucket") == qbucket).drop("__bucket")
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def pairwise_cosine_neardup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs: SRP-bucketed self-join (scale path
    — only same-bucket pairs are scored), cosine ≥ threshold."""
    dim_row = embeddings.select(F.size(vec_col)).first()
    planes = make_planes(dim_row[0], n_planes, seed)
    b = embeddings.withColumn("__bucket", srp_bucket(F.col(vec_col), planes))
    left = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "__bucket"
    )
    right = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "__bucket"
    )
    return (
        left.join(right, "__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
