"""Network-connection joins (SURVEY.md §2.5, §2.9 tail).

`connect-to-network`: project each feature onto the closest street-network
segment within a threshold (reference: fn graph.go:522-586,
b6/graph/connectivity.go:39-114, 500 m threshold ConnectFeature).
Spark-first: explode paths into a segment table once (small relative to
the point side), broadcast it, compute point-to-segment distances in one
vectorized kernel pass, keep the argmin per point under the threshold.
At planet scale the broadcast side is the cell-local segment subset (the
same cell-cover prefilter as the containment join); the per-point work is
unchanged.

Elevation IDW join: inverse-distance-weighted average of spot heights
within a radius (reference: b6/elevation.go:18-64 sorted-cell range scan
-> here a broadcast join + weighted aggregation).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import geom


def path_segments(paths: DataFrame) -> DataFrame:
    """Explode path features into (feature_id, seg_idx, x1, y1, x2, y2)."""
    z = F.arrays_zip(
        F.slice(F.col("xs"), 1, F.size(F.col("xs")) - 1).alias("x1"),
        F.slice(F.col("ys"), 1, F.size(F.col("ys")) - 1).alias("y1"),
        F.slice(F.col("xs"), 2, F.size(F.col("xs")) - 1).alias("x2"),
        F.slice(F.col("ys"), 2, F.size(F.col("ys")) - 1).alias("y2"),
    )
    return paths.select(
        "feature_id", F.posexplode(z).alias("seg_idx", "s")
    ).select(
        "feature_id", "seg_idx",
        F.col("s.x1").alias("x1"), F.col("s.y1").alias("y1"),
        F.col("s.x2").alias("x2"), F.col("s.y2").alias("y2"),
    )


def connect_to_network(
    points: DataFrame,
    paths: DataFrame,
    threshold_m: float = 500.0,
    point_id: str = "image_id",
    lat: str = "lat",
    lng: str = "lng",
) -> DataFrame:
    """Closest segment within threshold per point:
    (point_id, path_id, seg_idx, dist_m).  Segment table broadcast; the
    distance kernel runs one numpy pass per Arrow batch over all
    (point x segment) candidates."""
    segs = path_segments(paths).collect()
    sx1 = np.array([s["x1"] for s in segs])
    sy1 = np.array([s["y1"] for s in segs])
    sx2 = np.array([s["x2"] for s in segs])
    sy2 = np.array([s["y2"] for s in segs])
    sid = [(s["feature_id"], s["seg_idx"]) for s in segs]

    pid_type = points.schema[point_id].dataType.simpleString()
    schema = f"{point_id} {pid_type}, path_id string, seg_idx int, dist_m double"

    def nearest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # (n_points, n_segs) distance matrix in one vectorized call
            d = geom.point_segment_distance_m(
                pdf[lng].to_numpy()[:, None],
                pdf[lat].to_numpy()[:, None],
                sx1[None, :], sy1[None, :], sx2[None, :], sy2[None, :],
            )
            best = np.argmin(d, axis=1)
            bd = d[np.arange(len(pdf)), best]
            keep = bd <= threshold_m
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    point_id: pdf[point_id].to_numpy()[keep],
                    "path_id": [sid[b][0] for b in best[keep]],
                    "seg_idx": [int(sid[b][1]) for b in best[keep]],
                    "dist_m": bd[keep],
                }
            )

    return points.select(point_id, lat, lng).mapInPandas(nearest, schema)


def elevation_idw(
    points: DataFrame,
    spots: DataFrame,
    radius_m: float,
    point_id: str = "image_id",
    power: float = 2.0,
) -> DataFrame:
    """IDW elevation per point from broadcast spot heights within radius
    (b6/elevation.go:18-64): elev = sum(w*e)/sum(w), w = 1/d^power; a
    spot at distance ~0 short-circuits to its exact height."""
    sp = spots.collect()
    slat = np.array([s["lat"] for s in sp])
    slng = np.array([s["lng"] for s in sp])
    sel = np.array([s["elev"] for s in sp])

    pid_type = points.schema[point_id].dataType.simpleString()
    schema = f"{point_id} {pid_type}, elev double"

    def idw(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            d = geom.haversine_m(
                pdf["lat"].to_numpy()[:, None], pdf["lng"].to_numpy()[:, None],
                slat[None, :], slng[None, :],
            )
            w = np.where(d <= radius_m, 1.0 / np.maximum(d, 1e-9) ** power, 0.0)
            denom = w.sum(axis=1)
            elev = np.where(denom > 0, (w * sel[None, :]).sum(axis=1) / np.maximum(denom, 1e-30), np.nan)
            keep = denom > 0
            yield pd.DataFrame({point_id: pdf[point_id].to_numpy()[keep], "elev": elev[keep]})

    return points.select(point_id, "lat", "lng").mapInPandas(idw, schema)
