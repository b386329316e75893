"""Sightline / viewshed: visible region from an origin, occluded by
building edges within a radius.

Reference: `sightline` computes a ~300 m-scale viewshed polygon by
subtracting occlusion shapes cast by front-facing `#building` edges
inside the cap (reference: b6/api/functions/sightline.go:21-35, 100-226,
581-854 — two algorithms, v2 shipped).  Re-expression here is an angular
sweep: the visibility radius r(theta) over N uniform bearings is the
nearest ray-segment intersection among candidate edges (or the cap
radius), and the viewshed is the polygon traced by r(theta).  The sweep
is one vectorized numpy pass over the (bins x edges) matrix -- no Python
loops over edges -- and runs per-origin inside ``applyInPandas``,
mirroring b6's per-origin fan-out.

Candidate edges arrive via the standard cap prefilter (cell cover at
fixture scale: broadcast the building table); the local frame is an
equirectangular projection around the origin (adequate at sub-km radii,
same planar treatment as the reference's occlusion builder).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import geom

M_PER_DEG = 111195.0


def sweep_visibility(
    ox_m: np.ndarray,
    oy_m: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
    x2: np.ndarray,
    y2: np.ndarray,
    radius_m: float,
    n_bins: int = 720,
) -> np.ndarray:
    """r(theta) for one origin at (0,0) in meters: nearest intersection of
    each of n_bins rays with the segment set, capped at radius_m.
    Vectorized (n_bins x n_edges)."""
    theta = np.linspace(0.0, 2.0 * np.pi, n_bins, endpoint=False)
    if len(x1) == 0:
        return np.full(n_bins, radius_m)
    dx = np.cos(theta)[:, None]
    dy = np.sin(theta)[:, None]
    ex = (x2 - x1)[None, :]
    ey = (y2 - y1)[None, :]
    sx = x1[None, :]
    sy = y1[None, :]
    denom = dx * ey - dy * ex  # cross(ray, edge)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (sx * ey - sy * ex) / denom  # distance along ray
        u = (sx * dy - sy * dx) / denom  # position along edge
    hit = (np.abs(denom) > 1e-12) & (t > 1e-9) & (u >= 0.0) & (u <= 1.0)
    t = np.where(hit, t, np.inf)
    return np.minimum(t.min(axis=1), radius_m)


def _viewshed_one(
    olat: float, olng: float, edges_xy: tuple, radius_m: float, n_bins: int
) -> tuple[float, np.ndarray, np.ndarray]:
    """(visible_area_m2, lats, lngs) of the viewshed polygon."""
    x1, y1, x2, y2 = edges_xy
    # local equirectangular meters around the origin
    kx = M_PER_DEG * np.cos(np.radians(olat))
    exm1, eym1 = (x1 - olng) * kx, (y1 - olat) * M_PER_DEG
    exm2, eym2 = (x2 - olng) * kx, (y2 - olat) * M_PER_DEG
    r = sweep_visibility(None, None, exm1, eym1, exm2, eym2, radius_m, n_bins)
    theta = np.linspace(0.0, 2.0 * np.pi, n_bins, endpoint=False)
    # polygon area by the polar form: 1/2 * sum r_i * r_{i+1} * sin(dtheta)
    dtheta = 2.0 * np.pi / n_bins
    area = 0.5 * np.sum(r * np.roll(r, -1)) * np.sin(dtheta)
    px = r * np.cos(theta)
    py = r * np.sin(theta)
    return float(area), olat + py / M_PER_DEG, olng + px / kx


_RING_SEG_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("x1", T.DoubleType()),
            T.StructField("y1", T.DoubleType()),
            T.StructField("x2", T.DoubleType()),
            T.StructField("y2", T.DoubleType()),
        ]
    )
)


@F.pandas_udf(_RING_SEG_SCHEMA)
def _ring_segments_udf(xs: pd.Series, ys: pd.Series, offs: pd.Series) -> pd.Series:
    """Closed-ring segments (wrapping each ring back to its start)."""
    out = []
    for x, y, o in zip(xs, ys, offs):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        bounds = list(np.asarray(o, dtype=np.int64)) + [len(x)]
        segs = []
        for a, b in zip(bounds[:-1], bounds[1:]):
            rx, ry = x[a:b], y[a:b]
            nx, ny = np.roll(rx, -1), np.roll(ry, -1)
            segs.extend(
                {"x1": float(rx[k]), "y1": float(ry[k]), "x2": float(nx[k]), "y2": float(ny[k])}
                for k in range(len(rx))
            )
        out.append(segs)
    return pd.Series(out)


def ring_segments(areas: DataFrame) -> DataFrame:
    """Explode area features into their ring edge segments."""
    return areas.select(
        F.explode(
            _ring_segments_udf(F.col("xs"), F.col("ys"), F.col("ring_offsets"))
        ).alias("s")
    ).select(
        F.col("s.x1").alias("x1"), F.col("s.y1").alias("y1"),
        F.col("s.x2").alias("x2"), F.col("s.y2").alias("y2"),
    )


def ring_segments_with_ids(areas: DataFrame) -> DataFrame:
    """(feature_id, seg_idx, x1, y1, x2, y2) closed-ring segments,
    seg_idx contiguous across a feature's rings in ring order."""
    return areas.select(
        "feature_id",
        F.posexplode(
            _ring_segments_udf(F.col("xs"), F.col("ys"), F.col("ring_offsets"))
        ).alias("seg_idx", "s"),
    ).select(
        "feature_id", "seg_idx",
        F.col("s.x1").alias("x1"), F.col("s.y1").alias("y1"),
        F.col("s.x2").alias("x2"), F.col("s.y2").alias("y2"),
    )


def viewshed_clip_one(
    ex1: np.ndarray,
    ey1: np.ndarray,
    ex2: np.ndarray,
    ey2: np.ndarray,
    radius_m: float,
    n_cap: int = 96,
) -> float:
    """Viewshed area by boolean subtraction (the reference's v2
    algorithm shape, b6/api/functions/sightline.go:581-854: cap polygon
    minus per-edge occlusion shadows, clipped with the Foster kernel).

    Inputs are edge endpoints in origin-local METERS.  Each front-facing
    edge casts a shadow quad (edge endpoints projected radially past the
    cap); the visible region is cap minus all shadows.  Returns m^2."""
    from ..kernels import clip as clip_kernel

    theta = np.linspace(0.0, 2.0 * np.pi, n_cap, endpoint=False)
    cap = (radius_m * np.cos(theta), radius_m * np.sin(theta))
    pieces = [cap]
    far = 4.0  # projection factor: well past the cap radius
    r_pad = 1.05 * radius_m
    for x1, y1, x2, y2 in zip(ex1, ey1, ex2, ey2):
        # clip the edge to the padded cap disk first (a long wall whose
        # ENDPOINTS are outside the cap still occludes), solving
        # |p1 + t (p2 - p1)| = r_pad
        dx, dy = x2 - x1, y2 - y1
        a = dx * dx + dy * dy
        b = 2.0 * (x1 * dx + y1 * dy)
        c = x1 * x1 + y1 * y1 - r_pad * r_pad
        if a < 1e-18:
            continue
        disc = b * b - 4.0 * a * c
        if disc <= 0:
            continue  # line misses the disk entirely
        sq = float(np.sqrt(disc))
        tlo = max(0.0, (-b - sq) / (2.0 * a))
        thi = min(1.0, (-b + sq) / (2.0 * a))
        if tlo >= thi:
            continue  # the in-disk portion is outside the segment
        x1c, y1c = x1 + tlo * dx, y1 + tlo * dy
        x2c, y2c = x1 + thi * dx, y1 + thi * dy
        d1 = np.hypot(x1c, y1c)
        d2 = np.hypot(x2c, y2c)
        if max(d1, d2) < 1e-9:
            continue
        # far boundary follows the ARC at far*radius: a straight chord
        # between the two projected endpoints dips back inside the cap
        # when the edge subtends a wide angle (long wall close by)
        ang1 = float(np.arctan2(y1c, x1c))
        ang2 = float(np.arctan2(y2c, x2c))
        delta = (ang1 - ang2 + np.pi) % (2.0 * np.pi) - np.pi  # short way
        steps = max(1, int(np.ceil(abs(delta) / 0.5)))
        arc = ang2 + delta * np.arange(0, steps + 1) / steps
        rq = far * radius_m
        qx = np.concatenate([[x1c, x2c], rq * np.cos(arc)])
        qy = np.concatenate([[y1c, y2c], rq * np.sin(arc)])
        nxt = []
        for px, py in pieces:
            for rx, ry in clip_kernel.clip(px, py, qx, qy, "difference"):
                if len(rx) >= 3:
                    nxt.append((rx, ry))
        pieces = nxt
        if not pieces:
            break
    return float(sum(abs(clip_kernel.ring_area(px, py)) for px, py in pieces))


def sightline(
    origins: DataFrame,
    buildings: DataFrame,
    radius_m: float = 300.0,
    n_bins: int = 720,
    origin_id: str = "origin_id",
    cell_deg: float | None = None,
    algorithm: str = "sweep",
) -> DataFrame:
    """Per-origin viewshed against `#building` area edges within radius.

    Returns (origin_id, visible_area_m2, cap_area_m2, n_edges,
    boundary_lats, boundary_lngs).

    algorithm='sweep' (default): angular sweep, r(theta) over n_bins
    bearings -- fast, resolution-bounded.  algorithm='clip': boolean
    subtraction of per-edge shadow polygons via the Foster kernel (the
    reference's v2 shape, sightline.go:581-854) -- exact polygon
    boundaries, costlier per edge; boundary columns are empty (the
    visible region may be multiple disjoint polygons).

    Distributed shape (no driver collect): building rings explode into
    edge segments, each segment replicates into the grid cells its
    1.05*radius-inflated bbox overlaps, origins join their own cell, a
    pure-JVM point-to-segment distance prefilter keeps edges inside the
    padded cap, and one groupBy collects each origin's candidate edge
    arrays.  The numpy angular sweep then runs per origin row inside an
    Arrow-batched mapInPandas -- per-origin work identical to the
    collect-based round-1 version, with the edge feed now an ordinary
    shuffle that scales with executors."""
    from . import gridjoin
    from .network import segment_cells

    pad = 1.05 * radius_m
    if cell_deg is None:
        cell_deg = gridjoin.margin_deg(pad)
    edges = segment_cells(ring_segments(buildings), cell_deg, pad)
    orc = gridjoin.probe_cells(origins.select(origin_id, "lat", "lng"), cell_deg)
    d = gridjoin.point_segment_dist_col(
        F.col("lng"), F.col("lat"), F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")
    )
    cand = orc.join(edges, ["gy", "gx"]).filter(d <= pad)
    lists = cand.groupBy(origin_id).agg(
        F.collect_list("x1").alias("ex1"),
        F.collect_list("y1").alias("ey1"),
        F.collect_list("x2").alias("ex2"),
        F.collect_list("y2").alias("ey2"),
    )
    joined = origins.select(origin_id, "lat", "lng").join(lists, origin_id, "left")

    cap_area = float(np.pi * radius_m * radius_m)
    schema = (
        f"{origin_id} long, visible_area_m2 double, cap_area_m2 double, n_edges int, "
        "boundary_lats array<double>, boundary_lngs array<double>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                olat, olng = float(r.lat), float(r.lng)
                empty = r.ex1 is None or (isinstance(r.ex1, float) and pd.isna(r.ex1))
                ex1 = np.empty(0) if empty else np.asarray(r.ex1, dtype=np.float64)
                ey1 = np.empty(0) if empty else np.asarray(r.ey1, dtype=np.float64)
                ex2 = np.empty(0) if empty else np.asarray(r.ex2, dtype=np.float64)
                ey2 = np.empty(0) if empty else np.asarray(r.ey2, dtype=np.float64)
                if algorithm == "clip":
                    kx = M_PER_DEG * np.cos(np.radians(olat))
                    area = viewshed_clip_one(
                        (ex1 - olng) * kx, (ey1 - olat) * M_PER_DEG,
                        (ex2 - olng) * kx, (ey2 - olat) * M_PER_DEG,
                        radius_m,
                    )
                    blats = blngs = np.empty(0)
                else:
                    area, blats, blngs = _viewshed_one(
                        olat, olng, (ex1, ey1, ex2, ey2), radius_m, n_bins
                    )
                out.append(
                    (
                        getattr(r, origin_id),
                        area,
                        cap_area,
                        int(len(ex1)),
                        [float(v) for v in blats],
                        [float(v) for v in blngs],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    origin_id, "visible_area_m2", "cap_area_m2", "n_edges",
                    "boundary_lats", "boundary_lngs",
                ],
            )

    return joined.mapInPandas(run, schema=schema)
