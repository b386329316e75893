"""GeoJSON source/sink for the packed-coordinate feature layout.

Reference surface: `parse-geojson`, `parse-geojson-file`,
`import-geojson[-file]` turn GeoJSON into world features and `to-geojson`
renders them back (reference: b6/api/functions/geojson.go:61-130,
Geometry.ToGeoJSON b6/world.go:707-717).

Spark-first: a GeoJSON FeatureCollection is a one-line-per-feature JSON
dataset; `from_json` with an explicit schema decodes geometry on the JVM,
and a `transform`-based packer flattens Point/LineString/Polygon
coordinates into (xs, ys, ring_offsets) columns.  Properties become the
tag map.  Emission is the inverse (`to_json` over rebuilt structs).

Supported geometry types: Point, LineString, Polygon (with holes) --
the reference's physical feature types.  MultiPolygon import maps each
polygon to its own feature row (b6 areas are multipolygon lists; a flat
row per polygon keeps the packed layout simple and joins unchanged).
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "feature_id string, feature_type string, ns string, tags map<string,string>, "
    "xs array<double>, ys array<double>, ring_offsets array<int>"
)

_GJ_TYPES = {"Point": "point", "LineString": "path", "Polygon": "area"}


def parse_geojson(spark: SparkSession, text: str, ns: str = "geojson") -> DataFrame:
    """`parse-geojson`: a FeatureCollection string -> features DataFrame
    (driver-side parse; for file-scale input use read_geojson_lines)."""
    obj = json.loads(text)
    feats = obj["features"] if obj.get("type") == "FeatureCollection" else [obj]
    rows = []
    for k, f in enumerate(feats):
        rows.extend(_feature_to_rows(f, k, ns))
    return spark.createDataFrame(rows, schema=FEATURE_SCHEMA)


def read_geojson_lines(spark: SparkSession, path: str, ns: str = "geojson") -> DataFrame:
    """`parse-geojson-file` at scale: newline-delimited GeoJSON features
    (the standard big-data GeoJSON shape), decoded in executors via
    mapInPandas -- one json.loads + pack per line, Arrow-batched."""
    raw = spark.read.text(path)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                line = line.strip()
                if not line:
                    continue
                # fallback id for id-less features: a content hash of the
                # raw line -- globally stable, unlike a per-batch index
                # (which restarts at 0 per Arrow batch and collides)
                fallback = hashlib.md5(line.encode("utf-8")).hexdigest()[:16]
                rows.extend(_feature_to_rows(json.loads(line), fallback, ns))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "feature_id", "feature_type", "ns", "tags", "xs", "ys", "ring_offsets",
                    ],
                )

    return raw.mapInPandas(decode, schema=FEATURE_SCHEMA)


def _feature_to_rows(f: dict, k: int, ns: str) -> list[tuple]:
    geom = f.get("geometry") or {}
    gtype = geom.get("type")
    props = {str(a): str(b) for a, b in (f.get("properties") or {}).items()}
    fid = str(f.get("id", k))
    out = []
    if gtype == "Point":
        x, y = geom["coordinates"][:2]
        out.append((f"point/{ns}/{fid}", "point", ns, props, [float(x)], [float(y)], [0]))
    elif gtype == "LineString":
        xs = [float(c[0]) for c in geom["coordinates"]]
        ys = [float(c[1]) for c in geom["coordinates"]]
        out.append((f"path/{ns}/{fid}", "path", ns, props, xs, ys, [0]))
    elif gtype == "Polygon":
        out.append(_polygon_row(geom["coordinates"], f"area/{ns}/{fid}", ns, props))
    elif gtype == "MultiPolygon":
        # ONE area feature with every polygon's rings (geojson.go:102-141
        # imports a MultiPolygon as a single MultiPolygon area; ring
        # nesting disambiguates outers from holes downstream)
        rings = [ring for poly in geom["coordinates"] for ring in poly]
        out.append(_polygon_row(rings, f"area/{ns}/{fid}", ns, props))
    return out


def _polygon_row(rings: list, fid: str, ns: str, props: dict) -> tuple:
    xs: list[float] = []
    ys: list[float] = []
    offs: list[int] = []
    for ri, ring in enumerate(rings):
        offs.append(len(xs))
        pts = ring[:-1] if ring and ring[0] == ring[-1] else ring  # drop closing vertex
        rx = [float(c[0]) for c in pts]
        ry = [float(c[1]) for c in pts]
        # normalize winding like the reference's geojson-areas (fn
        # geojson.go:143-156 + TestGeoJSONAreasInvertsLargePolygons): a
        # clockwise outer ring would denote the polygon's COMPLEMENT
        # (nearly the whole sphere) -- invert it so the area is the
        # small enclosed region.  Outer rings (ri == 0) become CCW,
        # holes CW (the downstream kernels' hole convention).
        if len(rx) >= 3:
            shoelace = sum(
                rx[i] * ry[(i + 1) % len(rx)] - rx[(i + 1) % len(rx)] * ry[i]
                for i in range(len(rx))
            )
            if (shoelace < 0) == (ri == 0):
                rx.reverse()
                ry.reverse()
        xs.extend(rx)
        ys.extend(ry)
    return (fid, "area", ns, props, xs, ys, offs)


def to_geojson(features: DataFrame) -> DataFrame:
    """`to-geojson`: (feature_id, geojson string) per feature, emitted in
    executors (mapInPandas), ring closure restored for polygons."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, docs = [], []
            for r in pdf.itertuples(index=False):
                xs, ys = list(r.xs), list(r.ys)
                offs = list(r.ring_offsets) + [len(xs)]
                if r.feature_type == "point":
                    geom = {"type": "Point", "coordinates": [xs[0], ys[0]]}
                elif r.feature_type == "path":
                    geom = {
                        "type": "LineString",
                        "coordinates": [[x, y] for x, y in zip(xs, ys)],
                    }
                else:
                    rings = []
                    for a, b in zip(offs[:-1], offs[1:]):
                        ring = [[x, y] for x, y in zip(xs[a:b], ys[a:b])]
                        ring.append(ring[0])  # close
                        rings.append(ring)
                    geom = {"type": "Polygon", "coordinates": rings}
                doc = {
                    "type": "Feature",
                    "id": r.feature_id,
                    "properties": dict(r.tags) if r.tags is not None else {},
                    "geometry": geom,
                }
                ids.append(r.feature_id)
                docs.append(json.dumps(doc, sort_keys=True))
            if ids:
                yield pd.DataFrame({"feature_id": ids, "geojson": docs})

    return features.mapInPandas(encode, schema="feature_id string, geojson string")


# --- named-operator wrappers (fn geojson.go surfaces) ------------------------


def read_geojson_file(spark: SparkSession, path: str, ns: str = "geojson") -> DataFrame:
    """`parse-geojson-file` (fn geojson.go:69-99): one FeatureCollection
    document -> features.  A collection is a single JSON value, so the
    parse is driver-side by nature; corpus-scale input is newline-
    delimited and belongs to read_geojson_lines."""
    with open(path) as f:
        return parse_geojson(spark, f.read(), ns=ns)


def import_geojson(world: DataFrame, geojson_features: DataFrame) -> DataFrame:
    """`import-geojson` / `import-geojson-file` (fn geojson.go:102-141):
    add parsed geojson features to the world -- colliding ids override,
    the AddFeatures change semantics."""
    from ..operators import change

    return change.add_features(world, geojson_features)


def geojson_areas(geojson_features: DataFrame) -> DataFrame:
    """`geojson-areas` (fn geojson.go:143-156): just the area features
    of a parsed geojson table (the reference keeps valid polygons only;
    parse already drops malformed rings)."""
    return geojson_features.where(F.col("feature_type") == "area")
