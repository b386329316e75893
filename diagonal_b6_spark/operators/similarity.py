"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce``: exact top-k by cosine for a small probe set
  (broadcast probes; dot products via JVM-side F.zip_with/F.aggregate,
  whole-stage codegen, no Python).
- ``cosine_topk_lsh``: scale path -- random-hyperplane LSH buckets
  (SimHash for vectors) prune candidates before the exact re-rank;
  same filter-refine shape as the spatial joins.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_unit_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    n = _norm(F.col(vec_col))
    return df.withColumn(
        "_unit", F.transform(F.col(vec_col), lambda x: x.cast("double") / n)
    )


def cosine_topk_bruteforce(
    vectors: DataFrame,
    probes: DataFrame,
    k: int,
    vec_id: str = "vec_id",
    probe_id: str = "probe_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(probe_id, rank, vec_id, cos): exact k most-similar vectors per
    probe (self-matches excluded when ids collide)."""
    cand = vectors.alias("v").join(F.broadcast(probes.alias("p")), F.lit(True), "cross")
    cos = _dot(F.col(f"v.{vec_col}"), F.col(f"p.{vec_col}")) / (
        _norm(F.col(f"v.{vec_col}")) * _norm(F.col(f"p.{vec_col}"))
    )
    scored = cand.select(
        F.col(f"p.{probe_id}").alias(probe_id),
        F.col(f"v.{vec_id}").alias(vec_id),
        cos.alias("cos"),
    ).filter(F.col(probe_id) != F.col(vec_id))
    w = Window.partitionBy(probe_id).orderBy(F.col("cos").desc(), F.col(vec_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, "rank", vec_id, "cos")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Random-hyperplane signature as a bucket id (JVM-side)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(float(v)) for v in p]), lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def cosine_topk_lsh(
    vectors: DataFrame,
    probes: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    vec_id: str = "vec_id",
    probe_id: str = "probe_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: equi-join on hyperplane signature, exact cosine
    re-rank inside the bucket.  Recall < 1 by construction (candidates
    limited to the probe's bucket) -- the 100TB-scale path where the
    cross join is infeasible; multi-probe across bands raises recall."""
    planes = _hyperplanes(dim, n_planes)
    v = vectors.withColumn("_bkt", lsh_bucket_col(F.col(vec_col), planes)).alias("v")
    p = probes.withColumn("_bkt", lsh_bucket_col(F.col(vec_col), planes)).alias("p")
    cand = v.join(F.broadcast(p), F.col("v._bkt") == F.col("p._bkt"))
    cos = _dot(F.col(f"v.{vec_col}"), F.col(f"p.{vec_col}")) / (
        _norm(F.col(f"v.{vec_col}")) * _norm(F.col(f"p.{vec_col}"))
    )
    scored = cand.select(
        F.col(f"p.{probe_id}").alias(probe_id),
        F.col(f"v.{vec_id}").alias(vec_id),
        cos.alias("cos"),
    ).filter(F.col(probe_id) != F.col(vec_id))
    w = Window.partitionBy(probe_id).orderBy(F.col("cos").desc(), F.col(vec_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, "rank", vec_id, "cos")
    )
