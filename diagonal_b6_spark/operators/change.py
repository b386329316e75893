"""Mutation operators: b6's Change system as snapshot-delta DataFrames.

The reference applies `add-tag(s)/remove-tag(s)/add-point/...` deltas
transactionally onto a mutable overlay world keyed by a root FeatureID
(reference: fn change.go:20-255, b6/ingest/change.go:1-184, layered
worlds b6/ingest/mutable.go:248-1088, docs/docs/backend/worlds.md).

Spark-first: a world is an immutable snapshot table; a Change is a small
delta DataFrame; "applying" is a join/union producing the next snapshot
(written via checkpoint.write_snapshot for lineage).  Overlay semantics
(`add-world-with-change`) = union-with-override on feature_id, the same
shape as join-missing (fn collections.go:485-583).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def add_tags(features: DataFrame, delta: DataFrame) -> DataFrame:
    """Apply (feature_id, k, v) tag additions; existing keys overwrite
    (fn change.go:20-45 AddTags semantics)."""
    patch = (
        delta.groupBy("feature_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("k", "v"))).alias("_patch"))
    )
    out = features.join(patch, "feature_id", "left")
    merged = F.when(
        F.col("_patch").isNotNull(), F.map_concat(
            # drop keys being overwritten first: map_concat on duplicate
            # keys is ambiguous, so filter them out of the base map
            F.map_filter(F.col("tags"), lambda k, _: ~F.array_contains(F.map_keys(F.col("_patch")), k)),
            F.col("_patch"),
        )
    ).otherwise(F.col("tags"))
    return out.withColumn("tags", merged).drop("_patch")


def remove_tags(features: DataFrame, delta: DataFrame) -> DataFrame:
    """Apply (feature_id, k) tag removals (fn change.go:47-67)."""
    patch = delta.groupBy("feature_id").agg(F.collect_set("k").alias("_rm"))
    out = features.join(patch, "feature_id", "left")
    pruned = F.when(
        F.col("_rm").isNotNull(),
        F.map_filter(F.col("tags"), lambda k, _: ~F.array_contains(F.col("_rm"), k)),
    ).otherwise(F.col("tags"))
    return out.withColumn("tags", pruned).drop("_rm")


def add_features(features: DataFrame, new_rows: DataFrame) -> DataFrame:
    """`add-point`/`add-relation`/... : append feature rows; ids colliding
    with existing features override them (mutable-world add semantics)."""
    return overlay_world(features, new_rows)


def overlay_world(base: DataFrame, overlay: DataFrame) -> DataFrame:
    """`add-world-with-change`: overlay rows win on feature_id collision,
    base rows otherwise -- the layered-world read view
    (b6/ingest/worlds.go:1-75)."""
    keep_base = base.join(overlay.select("feature_id"), "feature_id", "left_anti")
    return keep_base.unionByName(overlay)


def merge_changes(*deltas: DataFrame) -> DataFrame:
    """Combine a collection of change deltas (fn change.go merge-changes);
    later deltas win per (feature_id, k)."""
    out = None
    for i, d in enumerate(deltas):
        d = d.withColumn("_seq", F.lit(i))
        out = d if out is None else out.unionByName(d)
    w = F.row_number().over(
        Window.partitionBy("feature_id", "k").orderBy(F.col("_seq").desc())
    )
    return out.withColumn("_rn", w).filter(F.col("_rn") == 1).drop("_rn", "_seq")
