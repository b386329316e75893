"""Raster-tile source + raster↔vector sampling join.

Reference surface: b6 consumes DEM rasters for elevation
(b6/elevation.go) and GDAL-ingested coverages.  No raster data ships in
this sandbox, so the source side is a deterministic synthetic DEM tile
table with the standard web-raster layout -- (zoom, tile_x, tile_y,
band array<double>) with row-major w*h pixels per tile -- and the JOIN
side (the part that matters at 100 TB) is real:

  * a point's sampling tile and pixel derive from the SAME mercator
    expressions as the vector tiling (operators/cover.tile_xy_cols
    formulas), pure whole-stage codegen;
  * the raster table joins on (tile_x, tile_y) -- broadcast for region
    extracts, shuffle for planet-scale coverages -- and `element_at`
    reads the pixel from the packed band, still JVM-side;
  * nothing crosses into Python anywhere in the sampling path.

The synthetic DEM is a closed-form function of the GLOBAL pixel index,
so a DuckDB oracle can verify the whole tile-join + pixel-addressing
machinery by evaluating the formula directly at each point's global
pixel -- any tiling/offset/indexing bug breaks value equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TILE_W = 64
TILE_H = 64
# closed-form DEM: elevation = ((gx*7 + gy*13) % 500) / 2.0 meters
_ELEV_MOD = 500


def _elev_expr(gx, gy):
    return ((gx * 7 + gy * 13) % _ELEV_MOD).cast("double") / 2.0


def synth_dem_tiles(
    spark: SparkSession,
    zoom: int,
    tx0: int,
    tx1: int,
    ty0: int,
    ty1: int,
    w: int = TILE_W,
    h: int = TILE_H,
) -> DataFrame:
    """Deterministic DEM tiles covering [tx0..tx1] x [ty0..ty1]."""
    nx = tx1 - tx0 + 1
    ny = ty1 - ty0 + 1
    tiles = spark.range(nx * ny).select(
        (F.lit(tx0) + F.col("id") % nx).alias("tile_x"),
        (F.lit(ty0) + (F.col("id") / nx).cast("long")).alias("tile_y"),
    )
    band = F.transform(
        F.sequence(F.lit(0), F.lit(w * h - 1)),
        lambda i: _elev_expr(
            F.col("tile_x") * w + i % w, F.col("tile_y") * h + (i / w).cast("long")
        ),
    )
    return tiles.select(
        F.lit(zoom).alias("zoom"), "tile_x", "tile_y",
        F.lit(w).alias("w"), F.lit(h).alias("h"), band.alias("band"),
    )


def _global_pixel_cols(zoom: int, w: int, h: int, lat: str = "lat", lng: str = "lng"):
    """Global mercator pixel indices (gx, gy) -- same formulas as
    operators/cover.tile_xy_cols, scaled to pixel resolution."""
    import numpy as np

    n = float(1 << zoom)
    latc = F.greatest(F.lit(-85.05112878), F.least(F.col(lat), F.lit(85.05112878)))
    latr = F.radians(latc)
    xf = (F.col(lng) + F.lit(180.0)) / F.lit(360.0) * F.lit(n)
    yf = (
        (F.lit(1.0) - F.log(F.tan(latr) + F.lit(1.0) / F.cos(latr)) / F.lit(float(np.pi)))
        / F.lit(2.0)
        * F.lit(n)
    )
    gx = F.floor(xf * w).cast("long")
    gy = F.floor(yf * h).cast("long")
    return gx, gy


def raster_sample(
    points: DataFrame,
    tiles: DataFrame,
    zoom: int,
    w: int = TILE_W,
    h: int = TILE_H,
    point_id: str = "image_id",
    value_name: str = "elev",
) -> DataFrame:
    """Nearest-pixel raster sample per point: (point_id, <value_name>).

    tile = global_pixel // tile_size, pixel offset = remainder; one
    equi-join on (tile_x, tile_y) + element_at -- fully JVM-side."""
    gx, gy = _global_pixel_cols(zoom, w, h)
    pts = points.withColumn("_gx", gx).withColumn("_gy", gy).withColumn(
        "tile_x", (F.col("_gx") / w).cast("long")
    ).withColumn("tile_y", (F.col("_gy") / h).cast("long"))
    joined = pts.join(F.broadcast(tiles.select("tile_x", "tile_y", "band")), ["tile_x", "tile_y"])
    px = F.col("_gx") - F.col("tile_x") * w
    py = F.col("_gy") - F.col("tile_y") * h
    val = F.element_at(F.col("band"), (py * w + px + 1).cast("int"))
    return joined.select(point_id, val.alias(value_name))
