"""Connected components via alternating large-star / small-star.

The O(log n)-round connected-components algorithm of Kiveris, Lattanzi,
Mirrokni, Rastogi & Vassilvitskii, "Connected Components in MapReduce
and Beyond" (SOCC 2014) -- the planetary-scale replacement for
round-per-hop min-label propagation (operators/network.py's flood
fill), whose round count is the component hop-diameter.  Street graphs
of continental extent have diameters in the thousands; the star
alternation converges in O(log n) rounds regardless of diameter.

Spark-first shape: each star round is ONE groupBy (per-node min
neighbor) plus ONE equi-join (link every neighbor to that min) --
no collect_list, so a hub node of any degree costs a single shuffled
aggregate, never a driver or single-task materialization.  Convergence
is an edge-set fixpoint, checked with a count+checksum aggregate (one
tiny job per round); lineage truncates at every round via
localCheckpoint, same as the flood fill.

Semantics: returns the same labeling as min-label propagation run to
fixpoint -- every node maps to the MINIMUM node id of its component --
so callers can swap algorithms without changing any downstream rule.
Reference behavior being reproduced: b6/graph/connectivity.go:39-114's
transitive flood-fill classification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to m(u) = min(N(u) + u).

    Input/output: directed pair list held in BOTH orientations.
    """
    m = e.groupBy("a").agg(F.least(F.min("b"), F.col("a")).alias("m"))
    out = (
        e.join(m, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    return out


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u (and u itself) to
    m(u) = min of those neighbors.  Input: canonical a > b pairs."""
    m = e.groupBy("a").agg(F.min("b").alias("m"))
    linked = e.join(m, "a").select(
        F.when(F.col("b") == F.col("m"), F.col("a")).otherwise(F.col("b")).alias("a"),
        F.col("m").alias("b"),
    )
    return linked


def _canonical(e: DataFrame) -> DataFrame:
    """a > b orientation, self-loops dropped, deduped."""
    return (
        e.select(
            F.greatest(F.col("a"), F.col("b")).alias("a"),
            F.least(F.col("a"), F.col("b")).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _both_orientations(e: DataFrame) -> DataFrame:
    return e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))


def _fingerprint(e: DataFrame) -> tuple:
    # per-row terms bounded to 2^31 so the ANSI-mode sum cannot overflow
    # int64 below ~4e9 rows; a missed collision just costs one extra round
    row = e.agg(
        F.count("*").alias("n"),
        F.sum(F.pmod(F.xxhash64("a", "b"), F.lit(2**31))).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    edges: DataFrame, a: str = "a", b: str = "b", max_iters: int = 50
) -> DataFrame:
    """(node k, comp) for every node appearing in `edges`; comp is the
    minimum node id of the component.  Edges may arrive in either or
    both orientations.  Raises if the edge fixpoint is not reached in
    `max_iters` star rounds (the paper's bound is O(log n); 50 covers
    any input that fits on hardware)."""
    e = _canonical(edges.select(F.col(a).alias("a"), F.col(b).alias("b")))
    nodes = (
        e.select(F.col("a").alias("k"))
        .unionByName(e.select(F.col("b").alias("k")))
        .distinct()
    )
    prev = None
    converged = False
    for _ in range(max_iters):
        e = _canonical(_small_star(_canonical(_large_star(_both_orientations(e)))))
        e = e.localCheckpoint(eager=True)
        fp = _fingerprint(e)
        if fp == prev:
            converged = True
            break
        prev = fp
    if not converged:
        raise ValueError(
            f"large-star/small-star did not reach an edge fixpoint in "
            f"{max_iters} rounds"
        )
    # at the fixpoint e is a set of rooted stars (child > root = component
    # minimum); map children to roots, roots and isolated-in-e nodes to self
    labels = nodes.join(
        e.select(F.col("a").alias("k"), F.col("b").alias("lbl")), "k", "left"
    ).select("k", F.coalesce("lbl", "k").alias("lbl"))
    return labels
