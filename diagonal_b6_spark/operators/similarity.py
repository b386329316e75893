"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce``: exact top-k by cosine for a small probe set
  (broadcast probes; dot products via JVM-side F.zip_with/F.aggregate,
  whole-stage codegen, no Python).
- ``cosine_topk_lsh``: scale path #1 -- random-hyperplane LSH buckets
  (SimHash for vectors) prune candidates before the exact re-rank;
  same filter-refine shape as the spatial joins.
- ``ivf_*``: scale path #2 -- IVF (inverted-file) index: k-means coarse
  quantizer trained with DataFrame-only Lloyd iterations (assignment =
  broadcast-centroid join + min; update = posexplode + per-dimension
  mean), search probes the ``nprobe`` nearest centroids' inverted lists
  and re-ranks exactly.  With nprobe == k the candidate set is the whole
  collection, so IVF results equal brute force (the exactness gate the
  oracle checks); smaller nprobe trades recall for a candidate set that
  is ~nprobe/k of the data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def _brute_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k: int,
    vec_id: str,
    probe_id: str,
    cos_of,
) -> DataFrame:
    """Shared brute top-k scaffold: broadcast-cross-join, self-match
    exclusion, per-probe (cos desc, vec_id asc) window top-k.  Both
    cosine variants (JVM expression vs Arrow UDF) MUST share this shape
    -- they share one oracle, so a tie-break or self-exclusion change in
    only one would silently desynchronize them.  ``cos_of(vcol, pcol)``
    returns the cosine Column."""
    cand = vectors.alias("v").join(F.broadcast(probes.alias("p")), F.lit(True), "cross")
    scored = cand.select(
        F.col(f"p.{probe_id}").alias(probe_id),
        F.col(f"v.{vec_id}").alias(vec_id),
        cos_of(F.col("v.__vec"), F.col("p.__vec")).alias("cos"),
    ).filter(F.col(probe_id) != F.col(vec_id))
    w = Window.partitionBy(probe_id).orderBy(F.col("cos").desc(), F.col(vec_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, "rank", vec_id, "cos")
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
    return _brute_topk(
        vectors.withColumn("__vec", F.col(vec_col)),
        probes.withColumn("__vec", F.col(vec_col)),
        k,
        vec_id,
        probe_id,
        lambda a, b: _dot(a, b) / (_norm(a) * _norm(b)),
    )


def cosine_topk_bruteforce_arrow(
    vectors: DataFrame,
    probes: DataFrame,
    k: int,
    vec_id: str = "vec_id",
    probe_id: str = "probe_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``cosine_topk_bruteforce`` with the dot product in an
    Arrow-batched pandas UDF instead of JVM ``zip_with``/``aggregate``.

    Spark's higher-order array functions are INTERPRETED (no whole-stage
    codegen) and allocate a zipped array per row: measured ~25-30%
    slower warm (0.75 s vs 0.55 s, sf0.1 local[32]) and far spikier
    under heap pressure (the HOF variant's allocation storm amplifies
    GC pauses 3-7x on a loaded heap).  The per-batch numpy einsum here
    is the 'UDFs are the slow path EXCEPT when the built-in falls out
    of codegen' exception.  Join shape is identical (broadcast probes,
    cross join, per-probe window top-k); only the cosine column moves
    to Arrow.  Ranks match the JVM variant (same oracle)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos_pd(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack(a.to_numpy())
        B = np.stack(b.to_numpy())
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return _brute_topk(
        vectors.withColumn("__vec", F.col(vec_col).cast("array<double>")),
        probes.withColumn("__vec", F.col(vec_col).cast("array<double>")),
        k,
        vec_id,
        probe_id,
        cos_pd,
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


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int,
    iters: int = 5,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd's k-means as pure DataFrame ops.

    Init: the k vectors with the smallest ids (deterministic, no RNG).
    `orderBy(id).limit(k)` plans as TakeOrderedAndProject -- per-partition
    top-k heaps + a k-row driver merge, NOT a global sort -- so the init
    is one O(N) scan at any scale.  Each iteration: broadcast the k
    centroids, assign every vector to its nearest (one shuffle for the
    min), rebuild centroids by per-dimension mean (posexplode + groupBy).
    Returns DataFrame[cent_id, centroid].
    """
    cents = (
        vectors.orderBy(vec_id)
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(vec_id)).alias("cent_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
        )
    )
    for _ in range(iters):
        assigned = _assign(vectors, cents, vec_id, vec_col)
        cents = (
            assigned.join(vectors, vec_id)
            .select("cent_id", F.posexplode(F.col(vec_col)).alias("pos", "val"))
            .groupBy("cent_id", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .groupBy("cent_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cent_id", F.transform(F.col("pm"), lambda s: s["m"]).alias("centroid"))
        )
    return cents


def _assign(vectors: DataFrame, cents: DataFrame, vec_id: str, vec_col: str) -> DataFrame:
    """(vec_id, cent_id): nearest centroid per vector (broadcast join +
    min-struct; deterministic tie-break on cent_id)."""
    cand = vectors.alias("v").join(F.broadcast(cents.alias("c")), F.lit(True), "cross")
    d = _sq_dist(F.col(f"v.{vec_col}"), F.col("c.centroid"))
    return (
        cand.select(
            F.col(f"v.{vec_id}").alias(vec_id),
            F.struct(d.alias("d"), F.col("c.cent_id").alias("cent_id")).alias("s"),
        )
        .groupBy(vec_id)
        .agg(F.min("s").alias("best"))
        .select(vec_id, F.col("best.cent_id").alias("cent_id"))
    )


def ivf_index(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(assignments, centroids): the inverted-file index.  At 10^12 scale
    the assignment table is written partitioned by cent_id so a search
    touches only its nprobe partitions."""
    cents = kmeans_fit(vectors, k, iters, vec_id, vec_col)
    return _assign(vectors, cents, vec_id, vec_col), cents


def ivf_topk(
    vectors: DataFrame,
    probes: DataFrame,
    k_neighbors: int,
    n_clusters: int = 8,
    nprobe: int = 2,
    iters: int = 3,
    vec_id: str = "vec_id",
    probe_id: str = "probe_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: probe the nprobe nearest centroids' lists, exact cosine
    re-rank.  nprobe == n_clusters -> identical to brute force."""
    assigned, cents = ivf_index(vectors, n_clusters, iters, vec_id, vec_col)
    # nprobe nearest centroids per probe
    pc = probes.alias("p").join(F.broadcast(cents.alias("c")), F.lit(True), "cross")
    d = _sq_dist(F.col(f"p.{vec_col}"), F.col("c.centroid"))
    w = Window.partitionBy(f"p.{probe_id}").orderBy(d.asc(), F.col("c.cent_id").asc())
    probe_cells = (
        pc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select(F.col(f"p.{probe_id}").alias(probe_id), F.col(f"p.{vec_col}").alias("_pvec"), F.col("c.cent_id").alias("cent_id"))
    )
    # candidates: vectors in the probed cells
    cand = (
        assigned.join(F.broadcast(probe_cells), "cent_id")
        .join(vectors.select(vec_id, vec_col), vec_id)
    )
    cos = _dot(F.col(vec_col), F.col("_pvec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("_pvec"))
    )
    scored = cand.select(
        probe_id, vec_id, cos.alias("cos")
    ).filter(F.col(probe_id) != F.col(vec_id))
    w2 = Window.partitionBy(probe_id).orderBy(F.col("cos").desc(), F.col(vec_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k_neighbors)
        .select(probe_id, "rank", vec_id, "cos")
    )


def cosine_topk_lsh(
    vectors: DataFrame,
    probes: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    vec_id: str = "vec_id",
    probe_id: str = "probe_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """LSH-bucketed ANN: equi-join on hyperplane signature, exact cosine
    re-rank inside the bucket.  Recall < 1 by construction (candidates
    limited to the probe's bucket) -- the 100TB-scale path where the
    cross join is infeasible; multi-probe across bands raises recall.

    `planes` overrides the default seeded-numpy hyperplanes; passing
    arithmetic-generated planes (dedup.emb_plane_weight) makes the whole
    bucketing SQL-replayable, which the oracle key uses."""
    if planes is None:
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
