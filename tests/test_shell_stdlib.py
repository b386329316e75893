"""Shell stdlib surface (shell/stdlib.py): the rest of the reference's
VM function table (b6/api/functions/functions.go:22-178) evaluated as
shell strings over the fixture world, asserted against the engine's
already-tested operators or closed-form values."""

import json

import numpy as np
import pytest

from diagonal_b6_spark import fixtures
from diagonal_b6_spark.kernels import geom as geom_k
from diagonal_b6_spark.shell import run
from diagonal_b6_spark.shell.stdlib import ChangeVal, _tile_feature_id

from pyspark.sql import DataFrame


@pytest.fixture(scope="module")
def feats(spark):
    return fixtures.features_table(spark)


# ---------------------------------------------------------------- geometry --


def test_ll_and_distance_meters(spark, feats):
    got = run(spark, feats, "distance-meters (ll 51.535 -0.125) (ll 51.535 -0.135)")
    want = float(geom_k.haversine_m(51.535, -0.125, 51.535, -0.135))
    assert got == pytest.approx(want)


def test_centroid_of_square(spark, feats):
    out = run(spark, feats, "find-feature /area/test/1 | centroid")
    if isinstance(out, DataFrame):
        r = out.collect()[0]
        lat, lng = r["lat"], r["lng"]
    else:
        lat, lng = out.lat, out.lng
    assert lat == pytest.approx(51.535, abs=1e-4)
    assert lng == pytest.approx(-0.125, abs=1e-4)


def test_rectangle_and_cap_polygon(spark, feats):
    rect = run(spark, feats, "rectangle-polygon (ll 51.0 0.0) (ll 51.01 0.01)")
    r = rect.collect()[0]
    assert min(r.ys) == pytest.approx(51.0) and max(r.ys) == pytest.approx(51.01)
    cap = run(spark, feats, "cap-polygon (ll 51.5 -0.1) 250.0")
    c = cap.collect()[0]
    # every boundary vertex sits ~radius from the centre
    d = geom_k.haversine_m(
        np.array(c.ys), np.array(c.xs), np.full(len(c.ys), 51.5), np.full(len(c.xs), -0.1)
    )
    assert np.allclose(d, 250.0, rtol=0.02)


def test_interpolate_midpoint_on_street(spark, feats):
    out = run(spark, feats, "find-feature /path/test/6 | interpolate 0.5")
    r = out.collect()[0]
    # the street spans lat 51.5305..51.5395; the midpoint is inside
    assert 51.5305 < r.lat < 51.5395
    assert -0.131 < r.lng < -0.117


def test_sample_points_spacing(spark, feats):
    out = run(spark, feats, "find-feature /path/test/6 | sample-points 200.0")
    rows = sorted(out.collect(), key=lambda r: r.sample_idx)
    assert len(rows) >= 5
    d = geom_k.haversine_m(rows[0].lat, rows[0].lng, rows[1].lat, rows[1].lng)
    # consecutive samples are <= spacing apart along the line (straight-line
    # distance is <= the 200 m arc distance)
    assert 0 < float(d) <= 200.0 + 1e-6


def test_convex_hull_contains_all_amenity_points(spark, feats):
    hull = run(spark, feats, "convex-hull (find [#amenity])")
    hrows = hull.collect()
    assert len(hrows) >= 3
    lats = [r.lat for r in hrows]
    lngs = [r.lng for r in hrows]
    # hull bbox covers the POI spread (square cluster + outside points)
    assert min(lats) < 51.53 and max(lats) > 51.569
    assert min(lngs) < -0.126 and max(lngs) > -0.059


def test_distance_to_point_meters(spark, feats):
    """Along-path distance to the projection (fn geometry.go:44-54),
    pinned against the numpy kernel twin."""
    out = run(
        spark, feats, "find-feature /path/test/6 | distance-to-point-meters 51.535, -0.125"
    )
    v = out.collect()[0].value
    street = next(
        r for r in __import__("diagonal_b6_spark.fixtures", fromlist=["x"]).feature_rows()
        if r["feature_id"] == "path/test/6"
    )
    want = geom_k.arc_length_to_projection_m(
        -0.125, 51.535, np.array(street["xs"]), np.array(street["ys"])
    )
    assert v == pytest.approx(want)
    assert 0 <= v <= geom_k.polyline_length_m(
        np.array(street["xs"]), np.array(street["ys"])
    )


# --------------------------------------------------------------------- s2 --


def test_s2_covering_center_polygon_consistent(spark, feats):
    cov = run(spark, feats, "find-feature /area/test/1 | s2-covering 4 16")
    tokens = [r.token for r in cov.collect()]
    assert tokens
    tok = tokens[0]
    center = run(spark, feats, f's2-center "{tok}"')
    poly = run(spark, feats, f's2-polygon "{tok}"')
    corners = poly.collect()[0].corners
    lats = [c.lat for c in corners]
    lngs = [c.lng for c in corners]
    # the cell's center lies inside its own boundary quad's bbox
    assert min(lats) - 1e-9 <= center.lat <= max(lats) + 1e-9
    assert min(lngs) - 1e-9 <= center.lng <= max(lngs) + 1e-9


def test_s2_grid_levels(spark, feats):
    from diagonal_b6_spark.kernels import cellmath as cm

    out = run(spark, feats, "find-feature /area/test/1 | s2-grid 12")
    tokens = [r.token for r in out.collect()]
    assert tokens
    levels = cm.level(cm.token_to_id(np.array(tokens)))
    assert all(int(v) == 12 for v in np.atleast_1d(levels))


# ------------------------------------------------------------------- tiles --


def test_tile_ids_match_fnv_kernel(spark, feats):
    out = run(spark, feats, "find-feature /area/test/1 | tile-ids")
    r = out.collect()[0]
    want = int(np.uint64(_tile_feature_id("area/test/1")).astype(np.int64))
    assert r.tile_id == want


def test_tile_paths_format(spark, feats):
    out = run(spark, feats, "find-feature /area/test/1 | tile-paths 16")
    rows = out.collect()
    assert rows
    z, x, y = rows[0].path.split("/")
    assert z == "16" and x.isdigit() and y.isdigit()


# ----------------------------------------------------------------- geojson --


def test_to_geojson_parse_roundtrip(spark, feats):
    gj = run(spark, feats, "find-feature /area/test/1 | to-geojson")
    doc = gj.collect()[0].geojson
    parsed = json.loads(doc)
    assert parsed["geometry"]["type"] in ("Polygon", "MultiPolygon")
    back = run(spark, feats, f"parse-geojson {json.dumps(doc)}")
    b = back.collect()[0]
    assert b.feature_type == "area"


def test_import_geojson_is_a_change(spark, feats):
    gj = json.dumps(
        {
            "type": "Feature",
            "properties": {"#amenity": "pub"},
            "geometry": {"type": "Point", "coordinates": [-0.2, 51.6]},
        }
    )
    n = run(
        spark,
        feats,
        f'with-change (import-geojson (parse-geojson {json.dumps(gj)}) "shelltest")'
        " {-> find [#amenity=pub] | count}",
    )
    assert n.collect()[0].value == 7  # 6 fixture pubs + 1 imported


# ------------------------------------------------------------------ change --


def test_add_tag_on_feature_id_is_a_change(spark, feats):
    n = run(
        spark,
        feats,
        "with-change (add-tag /area/test/2 #reviewed=yes) {-> find [#reviewed=yes] | count}",
    )
    assert n.collect()[0].value == 1


def test_add_point_change_and_count(spark, feats):
    n = run(
        spark,
        feats,
        'with-change (add-point 51.6, -0.2 /point/test/100 {"#amenity": "pub"})'
        " {-> find [#amenity=pub] | count}",
    )
    assert n.collect()[0].value == 7


def test_changes_file_roundtrip(spark, feats, tmp_path):
    p = str(tmp_path / "delta.yaml")
    run(spark, feats, f'changes-to-file (add-tag /area/test/1 #audit=done) "{p}"')
    n = run(
        spark,
        feats,
        f'with-change (changes-from-file "{p}") {{-> find [#audit=done] | count}}',
    )
    assert n.collect()[0].value == 1


def test_add_collection_then_list_feature(spark, feats):
    out = run(
        spark,
        feats,
        'with-change (add-collection /collection/test/50 {"#kind": "pois"}'
        ' {"point/test/7", "point/test/8"})'
        " {-> list-feature /collection/test/50}",
    )
    rows = sorted(out.collect(), key=lambda r: r.key)
    assert [r.value for r in rows] == ["point/test/7", "point/test/8"]


def test_add_expression_then_evaluate_feature(spark, feats):
    out = run(
        spark,
        feats,
        "with-change (add-expression /expression/test/9 #kind=count "
        '"find [#amenity=pub] | count") {-> evaluate-feature /expression/test/9}',
    )
    assert out.collect()[0].value == 6


# ------------------------------------------------------------- collections --


def test_histogram_over_amenities(spark, feats):
    # get returns a TAG, so histogram buckets label as "key=value"
    # (ui/lines_test.go:103-128 TestHistogramWithTagKeys)
    out = run(
        spark,
        feats,
        'find [#amenity] | map {f -> get f "#amenity"} | histogram',
    )
    got = {r.lo: r.n for r in out.collect()}
    assert got == {"#amenity=bench": 7, "#amenity=cafe": 7, "#amenity=pub": 6}


def test_sum_by_key_shell(spark, feats):
    out = run(spark, feats, '{"a": 1.0, "a": 2.0, "b": 3.0} | sum-by-key')
    got = {r.key: float(r.total) for r in out.collect()}
    assert got == {"a": 3.0, "b": 3.0}


def test_percentiles_shell(spark, feats):
    out = run(spark, feats, "all-areas | area | percentiles")
    rows = out.collect()
    assert len(rows) == 5
    assert all(0.0 <= r.pct <= 1.0 for r in rows)
    # the largest area carries the highest percentile
    biggest = max(rows, key=lambda r: r.value)
    assert biggest.pct == max(r.pct for r in rows)


def test_add_divide_number_types(spark, feats):
    """api/functions/math_test.go TestAdd/TestDivide: int op int stays
    int (divide is Go integer division, truncating toward zero); any
    float operand promotes the result to float."""
    cases = [
        ("add 2 3", 5, int),
        ("add 2 3.0", 5.0, float),
        ("add 2.0 3", 5.0, float),
        ("add 2.0 3.0", 5.0, float),
        ("divide 6 2", 3, int),
        ("divide 7 2", 3, int),       # truncation, not float 3.5
        ("divide -7 2", -3, int),     # Go truncates toward zero (not floor)
        ("divide 6 2.0", 3.0, float),
        ("divide 6.0 2", 3.0, float),
        ("divide 6.0 2.0", 3.0, float),
    ]
    for expr, want, typ in cases:
        got = run(spark, feats, expr)
        assert got == want and type(got) is typ, (expr, got)


def test_gt_mixed_width_integers(spark, feats):
    """b6/values_test.go TestGreaterHappyPath: Greater compares across
    integer widths, including uint64 values above 2^33 that a float32
    or int32 comparison would corrupt.  The shell's scalar path rides
    Python's arbitrary-precision ints, so the same table must hold."""
    big = (1 << 33) + 1
    cases = [
        ("gt 3 0", True),
        ("gt 0 3", False),
        (f"gt {big} 0", True),
        (f"gt 0 {big}", False),
        (f"gt {big + 1} {big}", True),
        (f"gt {big} {big + 1}", False),
    ]
    for expr, want in cases:
        got = run(spark, feats, expr)
        assert got is want, (expr, got)


def test_feature_id_leading_slash(spark, feats):
    """b6/world_test.go TestFeatureFromStringHandlesLeadingSlash: the
    full id form parses identically with and without a leading slash
    (and the alias expansion round-trips its own output)."""
    from diagonal_b6_spark.shell.parse import normalize_feature_id

    full = "path/openstreetmap.org/way/687471322"
    assert normalize_feature_id("/" + full) == full
    assert normalize_feature_id(full) == full
    expanded = normalize_feature_id("/w/687471322")
    assert expanded == "path/osm/687471322"
    assert normalize_feature_id("/" + expanded) == expanded


def test_divide_int_collection_stays_int(spark, feats):
    """The value-column twin of TestDivide: an int literal collection
    divided by an int yields ints (Spark's double-divide would leak
    3.5)."""
    out = run(spark, feats, "{6, 7} | divide 2")
    vals = sorted(r.value for r in out.collect())
    assert vals == [3, 3]
    assert all(isinstance(v, int) for v in vals)


def test_percentiles_uniform_mirror(spark, feats):
    """api/functions/math_test.go TestPercentiles: 1000 uniform draws in
    [0,5) -> every percentile within 0.05 of value/5."""
    import numpy as np
    from diagonal_b6_spark.operators import agg as agg_ops

    rng = np.random.default_rng(42)
    vals = (rng.random(1000) * 5.0).tolist()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k int, v double"
    )
    rows = agg_ops.percentiles(df, "v", "k").collect()
    assert len(rows) == 1000
    for r in rows:
        assert abs(r["pct"] - r["v"] / 5.0) <= 0.05


def test_count_valid_ids(spark, feats):
    out = run(spark, feats, "all-areas | count-valid-ids")
    assert out.collect()[0].value == 5


def test_count_keys_on_collection(spark, feats):
    out = run(spark, feats, '{"a": 1.0, "a": 2.0, "b": 3.0} | count-keys')
    got = {r.key: r.n for r in out.collect()}
    assert got == {"a": 2, "b": 1}


# ------------------------------------------------------------------- graph --


def test_reachable_and_closest_consistent(spark, feats):
    # origin and shops sit ON street vertices: the reference's reachable
    # sees only point features on reached network nodes (graph.go:35-52)
    r = run(
        spark,
        feats,
        'find-feature /point/test/29 | reachable {"mode": "walk"} 5000.0 [#shop]',
    )
    rows = r.collect()
    assert rows and all(row.origin == "point/test/29" for row in rows)
    assert {row.feature_id for row in rows} == {"point/test/27", "point/test/28"}
    assert all(row.dist <= 5000.0 for row in rows)
    best = run(
        spark,
        feats,
        'find-feature /point/test/29 | closest {"mode": "walk"} 5000.0 [#shop]',
    ).collect()[0]
    assert best.dist == pytest.approx(min(row.dist for row in rows))


def test_reachable_excludes_detached_features(spark, feats):
    # a detached origin seeds nothing; detached amenity points are never
    # candidates (no projection fallback in the reference's search)
    r = run(
        spark,
        feats,
        'find-feature /point/test/9 | reachable {"mode": "walk"} 5000.0 [#amenity=cafe]',
    )
    assert r.count() == 0


def test_paths_to_reach_names_the_street(spark, feats):
    out = run(
        spark,
        feats,
        'find-feature /point/test/29 | paths-to-reach {"mode": "walk"} 5000.0 [#shop]',
    )
    rows = out.collect()
    assert rows and rows[0].feature_id == "path/test/6" and rows[0].n_paths > 0


def test_connect_to_network_is_a_change(spark, feats):
    n = run(
        spark,
        feats,
        "with-change (connect-to-network (find-feature /point/test/9))"
        " {-> find [#diagonal=connection] | count}",
    )
    assert n.collect()[0].value == 1


# ------------------------------------------------------------------- misc --


def test_degree_of_isolated_point_is_zero(spark, feats):
    out = run(spark, feats, "find-feature /point/test/7 | degree")
    assert out.collect()[0].degree == 0


def test_filter_accessible(spark, feats):
    out = run(spark, feats, "find [#amenity] | filter-accessible [#amenity=pub]")
    rows = out.collect()
    assert len(rows) == 6


def test_map_items_swaps(spark, feats):
    out = run(
        spark,
        feats,
        '{"a": 1.0, "b": 2.0} | map-items {p -> pair (second p) (first p)}',
    )
    got = {r.key: r.value for r in out.collect()}
    assert got == {1.0: "a", 2.0: "b"}  # keys keep their type


# ----------------------------------------------------------- symbol parity --

# The reference VM's complete function table
# (b6/api/functions/functions.go:22-178), 140 symbols.
REFERENCE_SYMBOLS = [
    "accessible-all", "accessible-routes", "add", "add-collection",
    "add-expression", "add-ints", "add-point", "add-relation", "add-tag",
    "add-tags", "add-world-with-change", "all", "all-tags", "and",
    "apply-to-area", "apply-to-path", "apply-to-point", "area",
    "building-access", "call", "cap-polygon", "centroid",
    "changes-from-file", "changes-to-file", "clamp", "closest",
    "closest-distance", "collect-areas", "collection", "connect",
    "connect-to-network", "connect-to-network-all", "containing-areas",
    "convex-hull", "count", "count-keys", "count-tag-value",
    "count-valid-ids", "count-valid-keys", "count-values",
    "debug-all-query", "debug-tokens", "degree", "distance-meters",
    "distance-to-point-meters", "divide", "divide-int",
    "entrance-approach", "evaluate-feature", "export-world", "filter",
    "filter-accessible", "find", "find-area", "find-areas",
    "find-collection", "find-feature", "find-relation", "find-relations",
    "first", "flatten", "float-value", "geojson-areas", "get",
    "get-centroid", "get-float", "get-int", "get-string", "gt",
    "histogram", "histogram-swatch", "histogram-swatch-with-id",
    "histogram-with-id", "id-to-relation-id", "import-geojson",
    "import-geojson-file", "int-value", "interpolate", "intersecting",
    "intersecting-cap", "is-valid", "join", "join-missing", "keyed",
    "length", "list-feature", "ll", "map", "map-geometries", "map-items",
    "map-parallel", "matches", "materialise", "materialise-map",
    "merge-changes", "or", "ordered-join", "pair", "parse-geojson",
    "parse-geojson-file", "paths-to-reach", "percentiles",
    "point-features", "point-paths", "points", "reachable",
    "reachable-area", "rectangle-polygon", "remove-tag", "remove-tags",
    "s2-center", "s2-covering", "s2-grid", "s2-points", "s2-polygon",
    "sample-points", "sample-points-along-paths", "second", "sightline",
    "snap-area-edges", "sum", "sum-by-key", "tag", "tagged", "take",
    "tile-ids", "tile-ids-hex", "tile-paths", "to-geojson",
    "to-geojson-collection", "to-str", "top", "type-area", "type-path",
    "type-point", "typed", "value", "with-change", "within", "within-cap",
]


def test_every_reference_symbol_is_registered():
    from diagonal_b6_spark.shell.evaluate import REGISTRY

    assert len(REFERENCE_SYMBOLS) == 140
    missing = [s for s in REFERENCE_SYMBOLS if s not in REGISTRY]
    assert missing == []
