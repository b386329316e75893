"""MVT encoder + tile-render sink: wire-format round-trip, coordinate
precision, tag table integrity, per-tile grouping."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from diagonal_b6_spark import fixtures
from diagonal_b6_spark.kernels import mvt
from diagonal_b6_spark.operators import render


def test_varint_zigzag_roundtrip():
    for v in [0, 1, 127, 128, 300, 1 << 20, (1 << 32) + 5]:
        buf = mvt._varint(v)
        got, i = mvt._read_varint(buf, 0)
        assert got == v and i == len(buf)
    for v in [0, -1, 1, -64, 64, 4095, -4096]:
        assert mvt._unzigzag(mvt._zigzag(v)) == v


def test_geometry_command_roundtrip():
    ring = np.array([[10, 10], [200, 10], [200, 300], [10, 300]])
    cmds = mvt.encode_geometry(mvt.GEOM_POLYGON, [ring])
    # first command: MoveTo count 1
    assert cmds[0] == (1 & 7) | (1 << 3)
    # encode a feature + layer, decode the tile
    feat = mvt.encode_feature(7, mvt.GEOM_POLYGON, [ring], [0, 0])
    tile = mvt.encode_layer("l", [feat], ["#building"], ["yes"])
    layers = mvt.decode_tile(tile)
    assert len(layers) == 1
    lay = layers[0]
    assert lay["name"] == "l" and lay["version"] == 2 and lay["extent"] == mvt.EXTENT
    assert lay["keys"] == ["#building"] and lay["values"] == ["yes"]
    f = lay["features"][0]
    assert f["id"] == 7 and f["type"] == mvt.GEOM_POLYGON and f["tags"] == [0, 0]
    assert (f["rings"][0] == ring).all()


def test_mapbox_spec_geometry_vectors():
    """encoder_test.go TestEncodeVectorTileGeometry: the worked examples
    from the published Mapbox vector-tile spec 2.1 (4.3.5.1-2)."""
    # Example Point (25, 17)
    assert mvt.encode_geometry(mvt.GEOM_POINT, [np.array([[25, 17]])]) == [9, 50, 34]
    # Example Multi Point (5,7) (3,2)
    assert mvt.encode_geometry(mvt.GEOM_POINT, [np.array([[5, 7], [3, 2]])]) == [
        17, 10, 14, 3, 9,
    ]
    # Example Linestring (2,2)->(2,10)->(10,10)
    assert mvt.encode_geometry(
        mvt.GEOM_LINESTRING, [np.array([[2, 2], [2, 10], [10, 10]])]
    ) == [9, 4, 4, 18, 0, 16, 16, 0]
    # Example Multi Linestring adds (1,1)->(3,5)
    assert mvt.encode_geometry(
        mvt.GEOM_LINESTRING,
        [np.array([[2, 2], [2, 10], [10, 10]]), np.array([[1, 1], [3, 5]])],
    ) == [9, 4, 4, 18, 0, 16, 16, 0, 9, 17, 17, 10, 4, 8]


def test_encode_relative_to_origin_reference_vector():
    """encoder_test.go TestEncodeVectorTileGeometryRelativeToOrigin: the
    two Granary Square points project into tile 16/32744/21784 at
    exactly (3732, 582) and (4217, -749) -- i.e. geometry ints
    {17, 7464, 1164, 970, 2661} -- under the reference's int()
    truncation of the zoom+12 mercator coordinate."""
    lat = np.array([51.53560, 51.53671])
    lng = np.array([-0.12683, -0.12618])
    x, y = mvt.latlng_to_tile_local(lat, lng, 16, 32744, 21784)
    assert list(x) == [3732, 4217] and list(y) == [582, -749]
    cmds = mvt.encode_geometry(mvt.GEOM_POINT, [np.stack([x, y], axis=1)])
    assert cmds == [17, 7464, 1164, 970, 2661]


def test_background_layer_reference_shape():
    """encoder_test.go TestEncodeTile: the background layer leads every
    tile and its polygon encodes to exactly 11 geometry command ints."""
    lay = mvt.decode_tile(mvt.background_layer())[0]
    assert lay["name"] == "background"
    f = lay["features"][0]
    assert f["type"] == mvt.GEOM_POLYGON and f["id"] is None and f["tags"] == []
    # 1 MoveTo + 2 params + 1 LineTo + 6 params + 1 ClosePath = 11
    ring = f["rings"][0]
    assert [list(v) for v in ring] == [[0, 0], [4095, 0], [4095, 4095], [0, 4095]]


def test_render_tiles_fixture(spark):
    feats = fixtures.features_table(spark).filter(F.col("feature_id") != "area/test/4")
    out = render.render_tiles(feats, zoom=14).collect()
    assert len(out) > 0
    total_feats = sum(r["n_features"] for r in out)
    assert total_feats >= feats.count()  # features span multiple tiles
    # every tile decodes and its features' coords sit near the tile window
    for r in out:
        layers = mvt.decode_tile(bytes(r["mvt"]))
        assert layers[0]["name"] == "background"  # encoder.go:34-38
        assert layers[1]["name"] == "features"
        assert len(layers[1]["features"]) == r["n_features"]
        for f in layers[1]["features"]:
            for ring in f["rings"]:
                assert (np.abs(ring) < 40 * mvt.EXTENT).all()


def test_render_roundtrip_coordinates(spark):
    """A point feature's decoded tile-local coords re-project to its
    lat/lng within half a pixel (extent 4096)."""
    feats = fixtures.features_table(spark).filter(F.col("feature_type") == "point")
    zoom = 16
    out = render.render_tiles(feats, zoom=zoom).collect()
    pois = {f["feature_id"]: (f["ys"][0], f["xs"][0]) for f in fixtures.feature_rows() if f["feature_type"] == "point"}
    n_checked = 0
    for r in out:
        lay = mvt.decode_tile(bytes(r["mvt"]))[1]  # [0] is background
        for f in lay["features"]:
            x, y = f["rings"][0][0]
            n = float(1 << zoom)
            xf = (r["tile_x"] + x / mvt.EXTENT) / n
            yf = (r["tile_y"] + y / mvt.EXTENT) / n
            lng = xf * 360.0 - 180.0
            lat = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * yf))))
            # match against the nearest fixture POI
            best = min(pois.values(), key=lambda p: (p[0] - lat) ** 2 + (p[1] - lng) ** 2)
            assert abs(best[0] - lat) < 1e-4 and abs(best[1] - lng) < 1e-4
            n_checked += 1
    assert n_checked >= len(pois)


def test_polygon_ring_winding_normalized():
    """Spec 2.1: exterior ring positive signed area (y-down surveyor's
    formula), holes negative -- regardless of input winding."""
    import numpy as np
    from diagonal_b6_spark.kernels import mvt

    # a CCW-in-screen-coords square (negative area under y-down) exterior
    ext = np.array([[0, 0], [0, 10], [10, 10], [10, 0]])
    hole = np.array([[2, 2], [8, 2], [8, 8], [2, 8]])  # positive area
    cmds = mvt.encode_geometry(mvt.GEOM_POLYGON, [ext, hole])
    # decode the command stream and re-check orientation
    feat = {"rings": []}
    ring, i, cx, cy = [], 0, 0, 0
    rings = []
    while i < len(cmds):
        c = cmds[i]
        cmd, count = c & 7, c >> 3
        i += 1
        if cmd in (1, 2):
            for _ in range(count):
                dx = (cmds[i] >> 1) ^ -(cmds[i] & 1)
                dy = (cmds[i + 1] >> 1) ^ -(cmds[i + 1] & 1)
                i += 2
                cx += dx
                cy += dy
                if cmd == 1 and ring:
                    rings.append(ring)
                    ring = []
                ring.append((cx, cy))
        else:  # ClosePath
            pass
    if ring:
        rings.append(ring)
    a2 = [mvt._signed_area2(np.array(r)) for r in rings]
    assert a2[0] > 0, "exterior must be positive"
    assert a2[1] < 0, "hole must be negative"


def test_douglas_peucker_reference_vectors():
    """The reference's own TestSimplify vectors (renderer/simplify_test.go:
    29-81) and TestDistanceBetweenPointAndLine semantics: squares with
    collinear midpoints collapse to corners (+ the trailing endpoint),
    plain squares survive untouched, and the metric is distance to the
    infinite line (point beyond the segment end still measures 1.0)."""
    from diagonal_b6_spark.kernels import geom

    xs = np.array([0, 0.5, 1, 1, 1, 0.5, 0, 0.0])
    ys = np.array([0, 0, 0, 0.5, 1, 1, 1, 0.5])
    idx = geom.douglas_peucker(xs, ys, 0.1)
    assert list(zip(xs[idx], ys[idx])) == [
        (0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.5)
    ]
    # offset copy (reference case 3)
    idx2 = geom.douglas_peucker(xs + 10, ys + 10, 0.1)
    assert list(idx2) == list(idx)
    # square corners: nothing removable
    assert list(geom.douglas_peucker(np.array([0.0, 1, 1, 0]), np.array([0.0, 0, 1, 1]), 0.1)) == [0, 1, 2, 3]
    # infinite-line metric: (10,2) vs line through (1,1)-(3,1) is 1.0 away
    # -> with eps 0.9 the midpoint of a 3-chain splits; with eps 1.1 it drops
    cx = np.array([1.0, 10.0, 3.0]); cy = np.array([1.0, 2.0, 1.0])
    assert len(geom.douglas_peucker(cx, cy, 0.9)) == 3
    assert len(geom.douglas_peucker(cx, cy, 1.1)) == 2


def test_render_simplifies_dense_rings(spark):
    """A 2000-vertex near-circular area (reference encoder.go:80-84: rings
    over 1000 points simplify at 5.0 tile units) must encode with far
    fewer vertices, every decoded vertex on the original circle within
    the epsilon budget."""
    t = np.linspace(0, 2 * np.pi, 2001)[:-1]
    clat, clng, r = 51.51, -0.13, 0.02
    xs = (clng + r * np.cos(t)).tolist()
    ys = (clat + r * np.sin(t)).tolist()
    feats = spark.createDataFrame(
        [("area/test/dense", "area", {"kind": "circle"}, xs, ys, [0])],
        "feature_id string, feature_type string, tags map<string,string>, "
        "xs array<double>, ys array<double>, ring_offsets array<int>",
    )
    zoom = 12
    out = render.render_tiles(feats, zoom=zoom).collect()
    assert out
    total_vertices = 0
    for rrow in out:
        for lay in mvt.decode_tile(bytes(rrow["mvt"])):
            if lay["name"] == "background":
                continue
            for f in lay["features"]:
                for ring in f["rings"]:
                    total_vertices += len(ring)
    # unsimplified this is ~2000 per covered tile; simplified it collapses
    assert 0 < total_vertices < 600


def test_gradient_interpolate_reference_vectors(spark):
    """Mirrors renderer/colours_test.go TestGradient: 0.5 on the default
    blue-to-red gradient is #f99256; below/above the stops clamp."""
    from pyspark.sql import functions as F

    from diagonal_b6_spark.operators import render

    df = spark.createDataFrame([(0.5,), (-1.0,), (2.0,)], "v double")
    got = [r[0] for r in df.select(render.gradient_interpolate_col(F.col("v"))).collect()]
    assert got == ["#f99256", "#d3d6fd", "#f96c53"]


def test_colour_from_hex_roundtrip_and_invalid(spark):
    """Mirrors TestColourFromHexString: valid hex roundtrips; anything
    unparseable reads as #000000; Sscanf stops at the first bad channel
    (colours.go:15-23)."""
    from pyspark.sql import functions as F

    from diagonal_b6_spark.operators import render

    df = spark.createDataFrame(
        [("#d3d6fd",), ("invalid",), ("#12zzzz",), ("#1234zz",)], "v string"
    )
    got = [r[0] for r in df.select(render.colour_from_hex_col(F.col("v"))).collect()]
    assert got == ["#d3d6fd", "#000000", "#120000", "#123400"]


def test_colour_from_tag_value_dispatch(spark):
    """colourFromTagValue (renderer.go:383-394): hex sanitises, ints pass
    through as palette indices, floats hit the gradient, else ''."""
    from pyspark.sql import functions as F

    from diagonal_b6_spark.operators import render

    df = spark.createDataFrame(
        [("#D3D6FD",), ("7",), ("-3",), ("0.5",), ("1e-1",), ("nope",)], "v string"
    )
    got = [r[0] for r in df.select(render.colour_from_tag_value_col(F.col("v"))).collect()]
    # gradient(0.1): ratio 1/3 into the first bracket -> (225, 197, 202)
    assert got == ["#d3d6fd", "7", "-3", "#f99256", "#e1c5ca", ""]


def test_render_rules_zoom_and_layers(spark):
    """BasemapRenderRules (renderer.go:171-211): min-zoom gating, any-value
    key rules, first-match layer/label, and the max-zoom place rules."""
    from diagonal_b6_spark.operators import render

    FEATURE_SCHEMA = (
        "feature_id string, feature_type string, ns string, tags map<string,string>, "
        "xs array<double>, ys array<double>, ring_offsets array<int>"
    )
    rows = [
        {"feature_id": "a", "feature_type": "area", "ns": "t",
         "tags": {"#building": "yes"}, "xs": [0.0], "ys": [0.0], "ring_offsets": [0]},
        {"feature_id": "b", "feature_type": "path", "ns": "t",
         "tags": {"#highway": "primary"}, "xs": [0.0], "ys": [0.0], "ring_offsets": [0]},
        {"feature_id": "c", "feature_type": "point", "ns": "t",
         "tags": {"#place": "city"}, "xs": [0.0], "ys": [0.0], "ring_offsets": [0]},
        {"feature_id": "d", "feature_type": "path", "ns": "t",
         "tags": {"#highway": "footway"}, "xs": [0.0], "ys": [0.0], "ring_offsets": [0]},
        {"feature_id": "e", "feature_type": "area", "ns": "t",
         "tags": {"#building": "train_station"}, "xs": [0.0], "ys": [0.0], "ring_offsets": [0]},
    ]
    feats = spark.createDataFrame(rows, FEATURE_SCHEMA)

    def at(z):
        return {
            r.feature_id: (r.layer, r.label)
            for r in render.apply_render_rules(feats, z).collect()
        }

    z8 = at(8)
    # min-zoom: generic buildings and footways hidden at 8; the
    # train_station building rule starts at 8; city labels (max 12) show
    assert set(z8) == {"b", "c", "e"}
    assert z8["b"] == ("road", True)
    assert z8["c"] == ("label", True)
    assert z8["e"] == ("building", False)
    z14 = at(14)
    # max-zoom: city label gone above 12; footway appears at 14
    assert set(z14) == {"a", "b", "d", "e"}
    assert z14["d"] == ("road", False)


def test_render_query_tiles_reference_semantics(spark):
    """QueryRenderer (renderer/query.go:48-119 + query_test.go): layer
    is named 'query'; matched features carry the first matching
    QueryRenderRules key with '#' stripped; the value function's result
    rides as tag 'v' (string/int only); the name label rides along;
    #building is NOT a rule key so buildings get no type attribute."""
    from diagonal_b6_spark import fixtures
    from diagonal_b6_spark.kernels import mvt
    from diagonal_b6_spark.operators import render as render_ops

    feats = fixtures.features_table(spark)

    def tile_tags(row):
        layer = mvt.decode_tile(bytes(row["mvt"]))[1]  # [0] is background
        assert layer["name"] == "query"
        out = []
        for f in layer["features"]:
            out.append(
                {
                    layer["keys"][k]: layer["values"][v]
                    for k, v in zip(f["tags"][::2], f["tags"][1::2])
                }
            )
        return out

    rows = render_ops.render_query_tiles(
        spark, feats, '[#amenity=bench]', 16, v='get-string "name"'
    ).collect()
    n = sum(r["n_features"] for r in rows)
    assert n == 7  # benches: every third of the 20 POI points
    for r in rows:
        for tags in tile_tags(r):
            assert tags["amenity"] == "bench"
            assert tags["v"] == ""  # benches are unnamed; get-string -> ""

    rows2 = render_ops.render_query_tiles(spark, feats, "[#building]", 15).collect()
    assert sum(r["n_features"] for r in rows2) >= 3
    for r in rows2:
        for tags in tile_tags(r):
            assert "building" not in tags  # not a QueryRenderRules key
            assert "name" in tags  # label rides along


def test_render_collection_tiles_both_test_cases(spark):
    """CollectionRenderer (renderer/collection_test.go): a collection's
    member ids come from BOTH keys and values (distinct union); layer is
    named 'collection'; members carry the render-rules type attribute
    and the name label."""
    from diagonal_b6_spark import fixtures
    from diagonal_b6_spark.kernels import mvt
    from diagonal_b6_spark.operators import render as render_ops
    from diagonal_b6_spark.shell import run

    feats = fixtures.features_table(spark)

    # case 1 (TestCollectionWithBoundaries): int keys, two area values
    ch1 = run(
        spark, feats,
        'add-collection /collection/test/1 {} {0: /area/test/1, 1: /area/test/2}',
    )
    world1 = feats.unionByName(ch1.added)
    out1 = render_ops.render_collection_tiles(world1, "collection/test/1", 14)
    rows1 = out1.collect()
    assert sum(r["n_features"] for r in rows1) >= 2
    seen = set()
    for r in rows1:
        layer = mvt.decode_tile(bytes(r["mvt"]))[1]  # [0] is background
        assert layer["name"] == "collection"
        for f in layer["features"]:
            tags = {
                layer["keys"][k]: layer["values"][v]
                for k, v in zip(f["tags"][::2], f["tags"][1::2])
            }
            assert tags.get("building") == "yes"  # basemap type attribute
            seen.add(tags["name"])
    assert seen == {"square", "hole"}

    # case 2 (TestCollectionWithFeatureKeysAndValues): feature-id keys
    # contribute a THIRD distinct member
    ch2 = run(
        spark, feats,
        'add-collection /collection/test/2 {} '
        "{/point/test/7: /area/test/1, /point/test/7: /area/test/2}",
    )
    world2 = feats.unionByName(ch2.added)
    # zoom 10: one tile covers the whole fixture, mirroring the
    # reference's single-tile render (3 = two values + one distinct key)
    out2 = render_ops.render_collection_tiles(world2, "collection/test/2", 10)
    rows2 = out2.collect()
    assert len(rows2) == 1 and rows2[0]["n_features"] == 3


def test_render_histogram_tiles(spark):
    """HistogramRenderer (renderer/histogram.go:23-81 +
    histogram_test.go): bucketed features render with tag
    bucket=<index>; features absent from the histogram don't render."""
    from diagonal_b6_spark import fixtures
    from diagonal_b6_spark.kernels import mvt
    from diagonal_b6_spark.operators import render as render_ops

    feats = fixtures.features_table(spark)
    buckets = spark.createDataFrame(
        [("area/test/1", 0), ("area/test/2", 2)], "feature_id string, bucket int"
    )
    rows = render_ops.render_histogram_tiles(feats, buckets, 10).collect()
    assert len(rows) == 1
    layer = mvt.decode_tile(bytes(rows[0]["mvt"]))[1]  # [0] is background
    assert layer["name"] == "histogram"
    assert rows[0]["n_features"] == 2
    got = {}
    for f in layer["features"]:
        tags = {
            layer["keys"][k]: layer["values"][v]
            for k, v in zip(f["tags"][::2], f["tags"][1::2])
        }
        got[tags["name"]] = (tags["bucket"], tags.get("building"))
    assert got == {"square": ("0", "yes"), "hole": ("2", "yes")}
