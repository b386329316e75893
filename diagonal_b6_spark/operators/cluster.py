"""Density-based point clustering (DBSCAN) as a distributed DataFrame
plan -- a training-data-pipeline operator beyond the reference's own
surface (grouping POI/image capture locations by density), built from
the same scale primitives the engine already trusts:

  * eps-neighborhood discovery is the grid-cell candidate join
    (operators/gridjoin.py): each point explodes into the cells its
    eps-inflated bbox overlaps, probes key by their single cell, one
    equi-join on (gy, gx) yields every pair within eps exactly once --
    never an all-pairs cross join;
  * cluster formation is connected components over the core-core
    eps-graph via alternating large-star/small-star
    (operators/components.py, O(log n) rounds);
  * everything else is whole-stage-codegen column expressions.

Semantics (deterministic variant of Ester et al. 1996 / sklearn):

  * a point is CORE iff its eps-neighborhood holds >= min_pts points,
    counting itself (sklearn's convention);
  * clusters are the connected components of core points under the
    "within eps" relation; the cluster id is the MINIMUM core point id
    of the component (so labels are stable under any execution order);
  * a non-core point within eps of >= 1 core point is a BORDER point
    and joins the MINIMUM cluster id among its core neighbors --
    sklearn assigns border points to whichever core claimed them
    first (scan-order-dependent); the min rule is the deterministic
    refinement, documented here because an oracle must replay it;
  * remaining points are noise: cluster NULL.

Scale shape: one shuffled candidate join per consumer (counts, edges,
border attach -- the components loop checkpoints its edge set after the
first materialization), one groupBy for counts, O(log n) tiny star
rounds.  No driver-side data-dependent materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import gridjoin
from .components import connected_components


def _eps_pairs(
    points: DataFrame, eps_m: float, id_col: str, lat: str, lng: str
) -> DataFrame:
    """(id_col, nbr) for every ordered pair within eps meters,
    INCLUDING the self pair -- each pair materializes exactly once
    (the probe owns a single grid cell)."""
    cell = gridjoin.margin_deg(eps_m)
    sites = gridjoin.explode_bbox_cells(
        points.select(
            F.col(id_col).alias("_sid"),
            F.col(lat).alias("_slat"),
            F.col(lng).alias("_slng"),
        ),
        cell,
        eps_m,
        F.col("_slng"),
        F.col("_slng"),
        F.col("_slat"),
        F.col("_slat"),
    )
    probes = gridjoin.probe_cells(points.select(id_col, lat, lng), cell, lat, lng)
    d = gridjoin.haversine_col(
        F.col(lat), F.col(lng), F.col("_slat"), F.col("_slng")
    )
    return (
        probes.join(sites, ["gy", "gx"])
        .where(d <= F.lit(eps_m))
        .select(id_col, F.col("_sid").alias("nbr"))
    )


def dbscan(
    points: DataFrame,
    eps_m: float,
    min_pts: int,
    id_col: str = "pid",
    lat: str = "lat",
    lng: str = "lng",
) -> DataFrame:
    """DBSCAN over (id_col, lat, lng) -> (id_col, n_nbrs, is_core,
    cluster); cluster is NULL for noise.  Ids must be orderable (the
    component label is the component's minimum core id)."""
    nbrs = _eps_pairs(points, eps_m, id_col, lat, lng)
    counts = nbrs.groupBy(id_col).agg(F.count("*").alias("n_nbrs"))
    core = counts.where(F.col("n_nbrs") >= F.lit(min_pts)).select(id_col)

    edges = (
        nbrs.where(F.col(id_col) != F.col("nbr"))
        .join(core, id_col, "leftsemi")
        .join(core.withColumnRenamed(id_col, "nbr"), "nbr", "leftsemi")
        .select(F.col(id_col).alias("a"), F.col("nbr").alias("b"))
    )
    labels = connected_components(edges)

    # isolated core points (no core neighbor) label themselves
    core_lbl = core.join(
        labels.withColumnRenamed("k", id_col), id_col, "left"
    ).select(id_col, F.coalesce("lbl", F.col(id_col)).alias("cluster"))

    # border points: non-core within eps of a core point take the
    # minimum cluster id among their core neighbors
    border_lbl = (
        nbrs.join(core, id_col, "left_anti")
        .join(
            core_lbl.select(
                F.col(id_col).alias("nbr"), F.col("cluster").alias("_nc")
            ),
            "nbr",
        )
        .groupBy(id_col)
        .agg(F.min("_nc").alias("cluster"))
    )

    assigned = core_lbl.unionByName(border_lbl)
    return (
        counts.join(assigned, id_col, "left")
        .join(core.withColumn("_is_core", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "n_nbrs",
            F.coalesce("_is_core", F.lit(False)).alias("is_core"),
            "cluster",
        )
    )
