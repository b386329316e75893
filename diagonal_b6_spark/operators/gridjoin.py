"""Grid-cell candidate joins: the shared de-collect primitive.

Round-1 versions of connect-to-network / elevation-IDW / sightline /
snap-area-edges collected their small side to the driver and shipped it
in the task closure -- fine at fixture scale, a scale-killer when that
side is 10^8 street segments.  This module replaces the pattern with a
distributed candidate join on a fixed lat/lng grid:

  * the "site" side (segments / spots / building edges) explodes into
    every grid cell its bbox -- inflated by the search threshold --
    overlaps (one sequence x sequence explode, pure JVM);
  * the "probe" side (points / origins) keys by its single containing
    cell;
  * an equi-join on (gy, gx) yields exactly the candidate pairs within
    the threshold guarantee: any site within `margin` meters of a probe
    shares the probe's cell.

Each (probe, site) pair materializes at most once (the probe owns one
cell), so downstream argmin/aggregations need no dedup.  The join
shuffles on the grid key -- skew from dense cells is the ordinary
equi-join kind AQE splits, and `cell_deg` tunes fan-out vs candidate
breadth.  Reference analogue: the s2-cell range scans b6 uses for its
spatial index walks (b6/search/spatial.go:85-113).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371010.0
M_PER_DEG = float(np.radians(1.0) * EARTH_RADIUS_M)  # ~111195.08


def margin_deg(margin_m: float) -> float:
    """Meters -> latitude degrees (the conservative axis)."""
    return margin_m / M_PER_DEG


def probe_cells(df: DataFrame, cell_deg: float, lat: str = "lat", lng: str = "lng") -> DataFrame:
    """Key each probe point by its single containing grid cell."""
    return df.withColumn("gy", F.floor(F.col(lat) / cell_deg).cast("long")).withColumn(
        "gx", F.floor(F.col(lng) / cell_deg).cast("long")
    )


def explode_bbox_cells(
    df: DataFrame,
    cell_deg: float,
    margin_m: float,
    min_x,
    max_x,
    min_y,
    max_y,
) -> DataFrame:
    """Explode each row into the grid cells its bbox + margin overlaps.

    min_x/max_x/min_y/max_y are Column expressions (degrees).  The
    longitude margin widens by 1/cos(lat) at the row's own extreme
    latitude so the meter-radius guarantee holds away from the equator.
    """
    m_lat = F.lit(margin_deg(margin_m))
    extreme_lat = F.least(
        F.greatest(F.abs(min_y), F.abs(max_y)) + m_lat, F.lit(89.0)
    )
    m_lng = m_lat / F.cos(F.radians(extreme_lat))
    gy0 = F.floor((min_y - m_lat) / cell_deg).cast("long")
    gy1 = F.floor((max_y + m_lat) / cell_deg).cast("long")
    gx0 = F.floor((min_x - m_lng) / cell_deg).cast("long")
    gx1 = F.floor((max_x + m_lng) / cell_deg).cast("long")
    return (
        df.withColumn("gy", F.explode(F.sequence(gy0, gy1)))
        .withColumn("gx", F.explode(F.sequence(gx0, gx1)))
    )


def haversine_col(lat1, lng1, lat2, lng2):
    """Haversine meters as a whole-stage-codegen column expression
    (identical formula to kernels/geom.haversine_m)."""
    rlat1, rlng1 = F.radians(lat1), F.radians(lng1)
    rlat2, rlng2 = F.radians(lat2), F.radians(lng2)
    a = F.pow(F.sin((rlat2 - rlat1) / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(
        F.sin((rlng2 - rlng1) / 2), 2
    )
    return 2 * F.lit(EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def point_segment_t_col(px, py, x1, y1, x2, y2):
    """Clamped projection parameter t of the point onto the segment, in
    the same local frame as point_segment_dist_col (the projected point
    is then p1 + t*(p2-p1) in lat/lng)."""
    kx = F.cos(F.radians(py)) * F.lit(M_PER_DEG)
    ky = F.lit(M_PER_DEG)
    ax = (F.pmod(x1 - px + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)) * kx
    bx = (F.pmod(x2 - px + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)) * kx
    ay = (y1 - py) * ky
    by = (y2 - py) * ky
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    t_raw = F.when(seg2 > 0, -(ax * dx + ay * dy) / seg2).otherwise(F.lit(0.0))
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), t_raw))


def point_segment_dist_col(px, py, x1, y1, x2, y2):
    """Point->segment distance in meters as pure column expressions --
    the same local-equirectangular formula as
    kernels/geom.point_segment_distance_m, kept JVM-side so candidate
    refinement never crosses into Python."""
    kx = F.cos(F.radians(py)) * F.lit(M_PER_DEG)
    ky = F.lit(M_PER_DEG)
    # antimeridian-safe normalized longitude differences
    ax = (F.pmod(x1 - px + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)) * kx
    bx = (F.pmod(x2 - px + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)) * kx
    ay = (y1 - py) * ky
    by = (y2 - py) * ky
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    t_raw = F.when(seg2 > 0, -(ax * dx + ay * dy) / seg2).otherwise(F.lit(0.0))
    t = F.greatest(F.lit(0.0), F.least(F.lit(1.0), t_raw))
    cx = ax + t * dx
    cy = ay + t * dy
    return F.sqrt(cx * cx + cy * cy)
