"""Vector-tile sink: render features into MVT protobuf tiles per (z, x, y).

Reference lifecycle: a tile request runs the query against the world,
projects to tile coordinates, simplifies and encodes MVT
(b6/renderer/query.go:48-119, renderer.go:109-143, encoder.go;
b6/tiles.go:52-63 tile bounds; 10k features/tile cap).  Spark-first:
batch-materialize ALL tiles of a zoom in one job -- explode each feature
to the tiles it covers (tile_cover), groupBy tile, and encode each
group's features in an ``applyInPandas`` kernel using the pure-Python
MVT writer (kernels/mvt.py).  The shuffle key is the tile id, so tile
render parallelism equals tile count; a per-tile feature cap mirrors the
reference's 10k limit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import geom as geom_kernel
from ..kernels import mvt
from . import geo_fn

_GEOM_TYPE = {"point": mvt.GEOM_POINT, "path": mvt.GEOM_LINESTRING, "area": mvt.GEOM_POLYGON}


def render_tiles(
    features: DataFrame,
    zoom: int,
    layer_name: str = "features",
    max_features_per_tile: int = 10_000,
) -> DataFrame:
    """(zoom, tile_x, tile_y, n_features, mvt binary) per covered tile."""
    cover = geo_fn.tile_cover(features, zoom).select("feature_id", "tile_x", "tile_y")
    tagged = features.select(
        "feature_id", "feature_type", "tags", "xs", "ys", "ring_offsets"
    )
    joined = cover.join(tagged, "feature_id")

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tile_x"].iloc[0])
        ty = int(pdf["tile_y"].iloc[0])
        pdf = pdf.iloc[:max_features_per_tile]
        keys: list[str] = []
        values: list[str] = []
        kidx: dict[str, int] = {}
        vidx: dict[str, int] = {}
        feats: list[bytes] = []
        for fid_num, r in enumerate(pdf.itertuples(index=False)):
            xs = np.asarray(r.xs, dtype=np.float64)
            ys = np.asarray(r.ys, dtype=np.float64)
            offs = list(r.ring_offsets) + [len(xs)]
            rings = []
            for a, b in zip(offs[:-1], offs[1:]):
                x, y = mvt.latlng_to_tile_local(ys[a:b], xs[a:b], zoom, tx, ty)
                if len(x) > 1000:
                    # reference encoder.go:80-84: rings over 1000 points
                    # are Douglas-Peucker-simplified at 5.0 tile-pixel
                    # units before encoding (kernels/geom.douglas_peucker
                    # matches renderer/simplify.go exactly)
                    keep = geom_kernel.douglas_peucker(x, y, 5.0)
                    x, y = x[keep], y[keep]
                rings.append(np.stack([x, y], axis=1))
            tag_idx: list[int] = []
            for k, v in sorted((r.tags or {}).items()):
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                if v not in vidx:
                    vidx[v] = len(values)
                    values.append(v)
                tag_idx += [kidx[k], vidx[v]]
            feats.append(
                mvt.encode_feature(fid_num, _GEOM_TYPE[r.feature_type], rings, tag_idx)
            )
        tile = mvt.encode_layer(layer_name, feats, keys, values)
        return pd.DataFrame(
            {
                "zoom": [zoom],
                "tile_x": [tx],
                "tile_y": [ty],
                "n_features": [len(feats)],
                "mvt": [tile],
            }
        )

    return joined.groupBy("tile_x", "tile_y").applyInPandas(
        encode, schema="zoom int, tile_x long, tile_y long, n_features int, mvt binary"
    )
