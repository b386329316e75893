"""GeoJSON source/sink: parse -> packed layout -> emit round-trip, file
path via newline-delimited features, and interop with the spatial ops."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from diagonal_b6_spark import fixtures
from diagonal_b6_spark.sources import geojson as gj

FC = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "id": "pt1",
            "properties": {"#amenity": "cafe"},
            "geometry": {"type": "Point", "coordinates": [-0.12, 51.51]},
        },
        {
            "type": "Feature",
            "id": "road",
            "properties": {"#highway": "primary"},
            "geometry": {
                "type": "LineString",
                "coordinates": [[-0.13, 51.50], [-0.12, 51.51], [-0.11, 51.52]],
            },
        },
        {
            "type": "Feature",
            "id": "poly",
            "properties": {"#building": "yes"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    [[-0.13, 51.50], [-0.11, 51.50], [-0.11, 51.52], [-0.13, 51.52], [-0.13, 51.50]],
                    [[-0.125, 51.505], [-0.115, 51.505], [-0.115, 51.515], [-0.125, 51.515], [-0.125, 51.505]],
                ],
            },
        },
    ],
}


def test_parse_geojson(spark):
    df = gj.parse_geojson(spark, json.dumps(FC))
    rows = {r["feature_id"]: r for r in df.collect()}
    assert set(rows) == {"point/geojson/pt1", "path/geojson/road", "area/geojson/poly"}
    poly = rows["area/geojson/poly"]
    assert poly["ring_offsets"] == [0, 4]  # closing vertices dropped
    assert len(poly["xs"]) == 8
    assert rows["point/geojson/pt1"]["tags"] == {"#amenity": "cafe"}


def test_roundtrip_emit_parse(spark):
    df = gj.parse_geojson(spark, json.dumps(FC))
    emitted = gj.to_geojson(df).collect()
    # re-parse every emitted feature; packed layout identical
    for r in emitted:
        back = gj.parse_geojson(spark, r["geojson"]).collect()[0]
        orig = df.filter(F.col("feature_id") == r["feature_id"]).collect()[0]
        assert back["xs"] == orig["xs"]
        assert back["ys"] == orig["ys"]
        assert back["ring_offsets"] == orig["ring_offsets"]
        assert back["tags"] == orig["tags"]


def test_read_geojson_lines(spark, tmp_path):
    p = str(tmp_path / "features.jsonl")
    with open(p, "w") as f:
        for feat in FC["features"]:
            f.write(json.dumps(feat) + "\n")
    df = gj.read_geojson_lines(spark, p)
    assert df.count() == 3
    assert set(r["feature_type"] for r in df.collect()) == {"point", "path", "area"}


def test_geojson_features_join_with_engine(spark):
    """Imported polygon works in the containment join like any fixture."""
    from diagonal_b6_spark.operators import cover as cover_ops
    from diagonal_b6_spark.operators import spatial_join

    feats = gj.parse_geojson(spark, json.dumps(FC))
    pts = spark.createDataFrame(
        [("in_hole", 51.51, -0.12), ("in_solid", 51.5025, -0.128), ("outside", 51.60, -0.3)],
        "image_id string, lat double, lng double",
    )
    out = spatial_join.containment_join_broadcast(
        cover_ops.with_point_cells(pts), feats
    ).collect()
    got = {r["image_id"] for r in out}
    assert got == {"in_solid"}  # hole excluded, outside excluded


def test_fixture_features_roundtrip(spark):
    feats = fixtures.features_table(spark)
    emitted = gj.to_geojson(feats)
    assert emitted.count() == feats.count()
    sample = json.loads(emitted.filter(F.col("feature_id") == "area/test/2").collect()[0]["geojson"])
    assert sample["geometry"]["type"] == "Polygon"
    assert len(sample["geometry"]["coordinates"]) == 2  # outer + hole


def test_geojson_areas_inverts_clockwise_polygons(spark):
    """Mirror of the reference's TestGeoJSONAreasInvertsLargePolygons
    (fn geojson_test.go:43-70): a clockwise outer ring denotes the
    polygon's complement, so parse must invert it to the small CCW
    region (holes keep the opposite winding)."""
    import json

    cw = [  # the reference's exact coordinates, ordered clockwise
        [-0.1240464, 51.5371371],
        [-0.1236840, 51.5370778],
        [-0.1243698, 51.5354848],
        [-0.1247150, 51.5355393],
        [-0.1240464, 51.5371371],
    ]
    doc = json.dumps(
        {"type": "FeatureCollection", "features": [
            {"type": "Feature", "geometry": {"type": "Polygon", "coordinates": [cw]},
             "properties": {}}]}
    )
    rows = gj.parse_geojson(spark, doc).collect()
    areas = gj.geojson_areas(
        gj.parse_geojson(spark, doc)
    ).collect()
    assert len(areas) == 1
    xs, ys = rows[0]["xs"], rows[0]["ys"]
    shoelace = sum(
        xs[i] * ys[(i + 1) % len(xs)] - xs[(i + 1) % len(xs)] * ys[i]
        for i in range(len(xs))
    )
    assert shoelace > 0, "outer ring must be normalized to CCW (small region)"
