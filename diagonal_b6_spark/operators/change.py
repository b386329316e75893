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


class ChangeApplyError(ValueError):
    """A change failed validation; the world is left unmodified
    (reference: MergedChange.Apply's canary overlay,
    b6/ingest/change.go:160-186)."""


def _point_locations(features: DataFrame) -> DataFrame:
    """(feature_id, _lng, _lat) for point rows -- the LocationsByID view
    pathPoints resolves references through (b6/ingest/validate.go:79-95)."""
    return features.filter(F.col("feature_type") == "point").select(
        F.col("feature_id").alias("_ref"),
        F.col("xs")[0].alias("_lng"),
        F.col("ys")[0].alias("_lat"),
    )


def validate_features(
    world: DataFrame,
    delta: DataFrame,
    invert_clockwise_paths: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """ValidateFeature over a delta of feature rows, distributed
    (b6/ingest/validate.go:12-134).

    ``delta`` rows follow the engine feature schema (feature_id,
    feature_type, ns, tags, xs, ys, ring_offsets) plus an optional
    ``vertex_refs array<string>`` column: a path whose geometry is a list
    of point-feature references (the reference's FeatureIDExpression
    vertices, b6/world.go:747-795).  References resolve against the
    delta's own points first, then ``world`` -- the order AddFeatures
    sees when features arrive in-stream (change_test.go:41-84).

    Checks mirrored from the reference:
      * invalid (empty) feature ids  -> "invalid ID"
      * paths with < 2 vertices      -> "N points, expected 2 or more"
      * unresolved vertex references -> "missing point <id>"
      * closed paths wound clockwise -> "ordered clockwise", or the ring
        inverts when invert_clockwise_paths is set
        (ValidateOptions.InvertClockwisePaths)
      * area rings with < 3 vertices -> "expected 3 or more"
        (ValidatePathForArea; engine rings are packed without the
        closing vertex, so closure is structural)

    Returns ``(resolved, errors)``: the delta with reference-paths
    resolved to inline geometry (and clockwise rings inverted when
    requested), and an (feature_id, error) DataFrame -- empty means
    valid.  Everything is joins + array expressions plus one Arrow
    batch for the orientation test; nothing collects.
    """
    from pyspark.sql.types import BooleanType
    import pandas as pd

    has_refs = "vertex_refs" in delta.columns
    cols = [c for c in delta.columns if c != "vertex_refs"]

    bad_id = delta.filter(
        F.col("feature_id").isNull() | (F.length("feature_id") == 0)
    ).select(
        F.col("feature_id"),
        F.concat(F.coalesce("feature_id", F.lit("")), F.lit(": invalid ID")).alias("error"),
    )
    errors = [bad_id]

    if has_refs:
        ref_paths = delta.filter(
            (F.col("feature_type") == "path") & F.col("vertex_refs").isNotNull()
        )
        inline = delta.filter(
            ~((F.col("feature_type") == "path") & F.col("vertex_refs").isNotNull())
        ).select(*cols)

        # Resolution base: the delta's own points override/precede the
        # world's (in-stream features arrive before they are referenced).
        # Scale shape: a change delta is small but the world is not --
        # semi-filter the world's point table down to the referenced ids
        # with a broadcast BEFORE any join, so the world is scanned once
        # and never shuffled; the surviving lookup table is delta-sized
        # and broadcasts into the left join.
        exploded = ref_paths.select(
            "feature_id", F.posexplode("vertex_refs").alias("_pos", "_ref")
        )
        world_pts = _point_locations(world).join(
            F.broadcast(exploded.select("_ref").distinct()), "_ref", "semi"
        )
        delta_pts = _point_locations(delta)
        locs = delta_pts.unionByName(
            world_pts.join(F.broadcast(delta_pts.select("_ref")), "_ref", "left_anti")
        )
        resolved_refs = exploded.join(F.broadcast(locs), "_ref", "left")
        errors.append(
            resolved_refs.filter(F.col("_lng").isNull()).select(
                "feature_id",
                F.concat(
                    F.lit("Path "), "feature_id", F.lit(" missing point "), "_ref"
                ).alias("error"),
            )
        )
        assembled = (
            resolved_refs.filter(F.col("_lng").isNotNull())
            .groupBy("feature_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_lng", "_lat", "_ref"))
                ).alias("_v")
            )
            .select(
                "feature_id",
                F.transform("_v", lambda s: s["_lng"]).alias("_xs"),
                F.transform("_v", lambda s: s["_lat"]).alias("_ys"),
                (
                    (F.col("_v")[0]["_ref"] == F.element_at("_v", -1)["_ref"])
                    & (F.size("_v") >= 2)
                ).alias("_closed"),
            )
        )
        resolved_paths = (
            ref_paths.join(assembled, "feature_id", "left")
            .withColumn("xs", F.coalesce("_xs", F.array().cast("array<double>")))
            .withColumn("ys", F.coalesce("_ys", F.array().cast("array<double>")))
            .withColumn("ring_offsets", F.array(F.lit(0)))
            .withColumn("_n_declared", F.size("vertex_refs"))
            .select(*cols, F.coalesce("_closed", F.lit(False)).alias("_closed"),
                    "_n_declared")
        )
    else:
        inline = delta.select(*cols)
        resolved_paths = None

    # Path arity: < 2 points is invalid (validate.go:41-43).  For
    # reference-paths count DECLARED vertices so a path that also failed
    # resolution reports both errors, like sequential Go checks would.
    def _arity_errors(df: DataFrame, n_col) -> DataFrame:
        return (
            df.filter(F.col("feature_type") == "path")
            .withColumn("_n", n_col)
            .filter(F.col("_n") < 2)
            .select(
                "feature_id",
                F.concat(
                    "feature_id", F.lit(": "), F.col("_n").cast("string"),
                    F.lit(" points, expected 2 or more"),
                ).alias("error"),
            )
        )

    errors.append(_arity_errors(inline, F.size("xs")))
    if resolved_paths is not None:
        errors.append(_arity_errors(resolved_paths, F.col("_n_declared")))

    # Area rings: >= 3 vertices each (ValidatePathForArea; packed rings
    # carry no closing duplicate, so closure is structural).
    ring_lens = (
        inline.filter(F.col("feature_type") == "area")
        .select(
            "feature_id",
            F.expr(
                "transform(ring_offsets, (o, i) -> "
                "coalesce(try_element_at(ring_offsets, i + 2), size(xs)) - o)"
            ).alias("_lens"),
        )
        .filter(F.exists("_lens", lambda n: n < 3))
    )
    errors.append(
        ring_lens.select(
            "feature_id",
            F.concat(
                "feature_id", F.lit(": "),
                F.array_min("_lens").cast("string"),
                F.lit(" points, expected 3 or more"),
            ).alias("error"),
        )
    )

    # Closed-path orientation (validate.go:47-59): clockwise closed paths
    # are invalid unless InvertClockwisePaths, which reverses the ring.
    from pyspark.sql.functions import pandas_udf

    def _ccw_impl(xs, ys):
        from ..kernels.geom import ring_is_ccw

        return pd.Series(
            [ring_is_ccw(x[:-1], y[:-1]) if len(x) >= 4 else True
             for x, y in zip(xs, ys)]
        )

    _ccw = pandas_udf(_ccw_impl, BooleanType())

    def _orient(df: DataFrame, closed_col) -> DataFrame:
        checked = df.withColumn(
            "_ccw", F.when(closed_col, _ccw("xs", "ys")).otherwise(F.lit(True))
        )
        if not invert_clockwise_paths:
            errors.append(
                checked.filter(~F.col("_ccw")).select(
                    "feature_id",
                    F.concat("feature_id", F.lit(": ordered clockwise")).alias("error"),
                )
            )
        return checked.withColumn(
            "xs", F.when(F.col("_ccw"), F.col("xs")).otherwise(F.reverse("xs"))
        ).withColumn(
            "ys", F.when(F.col("_ccw"), F.col("ys")).otherwise(F.reverse("ys"))
        ).select(*cols)

    # Inline paths close by first==last vertex; reference paths by
    # first==last ref (ClosedPath, world.go:953-957).  Both get the
    # validate.go:47-59 orientation treatment.
    inline_closed = (
        (F.col("feature_type") == "path")
        & (F.size("xs") >= 4)
        & (F.col("xs")[0] == F.element_at("xs", -1))
        & (F.col("ys")[0] == F.element_at("ys", -1))
    )
    oriented_inline = _orient(inline, inline_closed)
    if resolved_paths is not None:
        resolved = oriented_inline.unionByName(
            _orient(resolved_paths, F.col("_closed"))
        )
    else:
        resolved = oriented_inline

    all_errors = errors[0]
    for e in errors[1:]:
        all_errors = all_errors.unionByName(e)
    return resolved, all_errors


def apply_changes(
    world: DataFrame,
    *changes: DataFrame,
    invert_clockwise_paths: bool = False,
) -> DataFrame:
    """MergedChange.Apply: validate every change against the overlaid
    canary view FIRST; any error raises ChangeApplyError and the input
    world is returned untouched -- all-or-nothing
    (b6/ingest/change.go:160-186, change_test.go:211-231).

    Each change is a feature-row delta (validate_features schema).  A
    change may reference points added by an EARLIER change in the merge
    (change_test.go:180-209): resolution runs against world + the
    already-validated prefix.  Returns the new world snapshot.
    """
    view = world
    pending_errors = None
    for delta in changes:
        resolved, errs = validate_features(
            view, delta, invert_clockwise_paths=invert_clockwise_paths
        )
        pending_errors = errs if pending_errors is None else pending_errors.unionByName(errs)
        view = overlay_world(view, resolved)

    if pending_errors is not None:
        # The one action in this module: the transactional gate itself.
        # Apply in the reference is equally eager (change.go:160-186);
        # the sample is bounded to 8 error rows.
        sample = [r["error"] for r in pending_errors.take(8)]
        if sample:
            raise ChangeApplyError(
                "change failed validation, world unmodified: " + "; ".join(sample)
            )

    # `view` IS world overlaid with every resolved delta in order.
    return view


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
