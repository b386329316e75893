"""Geometry/S2 scalar+table functions (§2.10) and the find query algebra
(§2.2-2.3): DuckDB parity for the SQL-expressible ones, closed-form pins
for the rest."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark import catalog, fixtures
from diagonal_b6_spark.kernels import geom
from diagonal_b6_spark.operators import find as find_ops
from diagonal_b6_spark.operators import geo_fn

SF = "/root/testdata/sf0.001"


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


@pytest.mark.parametrize(
    "name", ["find_tagged", "find_keyed", "all_tags", "geo_length", "geo_tile_cover"]
)
def test_geo_fn_oracle_parity(spark, name):
    got = sorted(tuple(r) for r in catalog.QUERIES[name](spark, SF).collect())
    want = _oracle(catalog.ORACLES[name])
    assert got == want
    assert len(got) > 0


def test_find_counts(spark):
    feats = fixtures.features_table(spark)
    # 20 POIs cycling bench/cafe/pub -> ceil assignments: k%3
    assert find_ops.find(feats, find_ops.tagged("#amenity", "bench")).count() == 7
    assert find_ops.find(feats, find_ops.tagged("#amenity", "cafe")).count() == 7
    assert find_ops.find(feats, find_ops.tagged("#amenity", "pub")).count() == 6
    assert find_ops.find(feats, find_ops.keyed("#building")).count() == 3
    assert find_ops.find(feats, find_ops.typed("area")).count() == 5
    assert (
        find_ops.find(
            feats, find_ops.or_(find_ops.tagged("#amenity", "pub"), find_ops.keyed("#highway"))
        ).count()
        == 7
    )
    assert feats.filter(find_ops.all_()).count() == feats.count()
    assert feats.filter(find_ops.empty()).count() == 0
    assert find_ops.matches(feats, "path/test/6", find_ops.keyed("#highway"))
    assert not find_ops.matches(feats, "path/test/6", find_ops.tagged("#amenity", "pub"))


def test_debug_tokens_reference_rule(spark):
    """TokensForFeature parity (reference ingest/tokens.go:9-27): the
    Vermuteria point from ingest/search_test.go posts `*`, its #-tag as
    `amenity=cafe`, its @-tag key-only, NOTHING for the plain `name` tag,
    and the s2:/a2: tokens of its level-16 covering cell -- checked
    bit-for-bit against the kernel twin pinned on search/spatial_test.go.
    A bare-vertex point (the reference's len(AllTags())==1 case: only the
    location PointTag, i.e. an empty user-tag map here) posts nothing; a
    relation posts no cell tokens."""
    from diagonal_b6_spark import fixtures
    from diagonal_b6_spark.kernels import cellmath as cm

    rows = [
        {
            "feature_id": "point/test/1",
            "feature_type": "point",
            "ns": "t",
            "tags": {"#amenity": "cafe", "name": "Vermuteria", "@naptan": "x"},
            "xs": [-0.1263944],
            "ys": [51.5366567],
            "ring_offsets": [0],
        },
        {  # bare vertex (no user tags): posts NO tokens at all
            "feature_id": "point/test/2",
            "feature_type": "point",
            "ns": "t",
            "tags": {},
            "xs": [-0.13],
            "ys": [51.53],
            "ring_offsets": [0],
        },
        {  # single-user-tag point: DOES post (location counts as a tag
            # in the reference, so this is its len(AllTags())==2 case)
            "feature_id": "point/test/4",
            "feature_type": "point",
            "ns": "t",
            "tags": {"#amenity": "bench"},
            "xs": [-0.12],
            "ys": [51.54],
            "ring_offsets": [0],
        },
        {  # relation: all-token + tag tokens, no covering
            "feature_id": "relation/test/3",
            "feature_type": "relation",
            "ns": "t",
            "tags": {"#route": "bicycle", "ref": "C6"},
            "xs": [],
            "ys": [],
            "ring_offsets": [],
        },
    ]
    feats = spark.createDataFrame(rows, schema=fixtures.FEATURE_SCHEMA)
    got = {}
    for r in find_ops.debug_tokens(feats).collect():
        got.setdefault(r["feature_id"], set()).add(r["token"])

    assert "point/test/2" not in got
    assert got["relation/test/3"] == {"*", "route=bicycle"}

    cell4 = cm.cell_id_from_latlng(np.array([51.54]), np.array([-0.12]), 16)
    assert got["point/test/4"] == {"*", "amenity=bench"} | set(
        cm.tokens_for_covering(cell4)
    )

    cell16 = cm.cell_id_from_latlng(np.array([51.5366567]), np.array([-0.1263944]), 16)
    expected = {"*", "amenity=cafe", "naptan"} | set(cm.tokens_for_covering(cell16))
    assert got["point/test/1"] == expected
    # 1 s2 token + 16 ancestors down to the face cell
    assert sum(t.startswith("a2:") for t in got["point/test/1"]) == 16


def test_query_matches_reference_cases(spark):
    """The nine Matches cases from the reference's ingest/search_test.go
    TestMatches, on the same Vermuteria feature."""
    from diagonal_b6_spark import fixtures

    feats = spark.createDataFrame(
        [
            {
                "feature_id": "point/test/0",
                "feature_type": "point",
                "ns": "diagonal.works/test",
                "tags": {"name": "Vermuteria", "#amenity": "cafe"},
                "xs": [-0.1263944],
                "ys": [51.5366567],
                "ring_offsets": [0],
            }
        ],
        schema=fixtures.FEATURE_SCHEMA,
    )
    cafe = find_ops.tagged("#amenity", "cafe")
    restaurant = find_ops.tagged("#amenity", "restaurant")
    cases = [
        (find_ops.keyed("#amenity"), True),
        (cafe, True),
        (restaurant, False),
        (find_ops.or_(cafe), True),
        (find_ops.or_(restaurant), False),
        (find_ops.and_(cafe), True),
        (find_ops.and_(restaurant), False),
        (find_ops.or_(cafe, restaurant), True),
        (find_ops.and_(cafe, restaurant), False),
    ]
    for q, expected in cases:
        assert find_ops.matches(feats, "point/test/0", q) is expected, str(q)


def test_unsearchable_key_rejected():
    with pytest.raises(ValueError):
        find_ops.tagged("name", "street")  # unprefixed: stored, not indexed
    with pytest.raises(ValueError):
        find_ops.tagged("@x", "1")  # '@' keys are key-only searchable
    find_ops.keyed("@x")  # fine


def test_area_closed_forms(spark):
    rows = {r["feature_id"]: r["area_m2"] for r in catalog.q_geo_area(spark, SF).collect()}
    # square: 400 m x 400 m
    assert rows["area/test/1"] == pytest.approx(400.0 * 400.0, rel=2e-3)
    # hole: 600^2 - 200^2
    assert rows["area/test/2"] == pytest.approx(600.0**2 - 200.0**2, rel=2e-3)
    # tiny triangle: base spans 5 m of *longitude degrees* (shrunk by
    # cos(lat) on the ground), height 5 m of latitude
    base_m = 5.0 * np.cos(np.radians(51.51))
    assert rows["area/test/5"] == pytest.approx(0.5 * base_m * 5.0, rel=5e-3)
    # antimeridian square: 200 m x 200 m (the normalization case)
    assert rows["area/test/4"] == pytest.approx(200.0 * 200.0, rel=2e-3)


def test_centroid_closed_forms(spark):
    rows = {
        r["feature_id"]: (r["clat"], r["clng"])
        for r in catalog.q_geo_centroid(spark, SF).collect()
    }
    assert rows["area/test/1"][0] == pytest.approx(51.535, abs=1e-6)
    assert rows["area/test/1"][1] == pytest.approx(-0.125, abs=1e-6)
    # point features: centroid == the point
    f = fixtures.feature_rows()
    for r in f:
        if r["feature_type"] == "point":
            assert rows[r["feature_id"]][0] == pytest.approx(r["ys"][0], abs=1e-9)
            assert rows[r["feature_id"]][1] == pytest.approx(r["xs"][0], abs=1e-9)


def test_interpolate_endpoints(spark):
    paths = fixtures.features_table(spark).filter(F.col("feature_type") == "path")
    first = geo_fn.with_interpolate(paths, 0.0).collect()[0]
    last = geo_fn.with_interpolate(paths, 1.0).collect()[0]
    road = [r for r in fixtures.feature_rows() if r["feature_id"] == "path/test/6"][0]
    assert first["interp_lat"] == pytest.approx(road["ys"][0], abs=1e-9)
    assert first["interp_lng"] == pytest.approx(road["xs"][0], abs=1e-9)
    assert last["interp_lat"] == pytest.approx(road["ys"][-1], abs=1e-9)
    assert last["interp_lng"] == pytest.approx(road["xs"][-1], abs=1e-9)


def test_distance_to_point(spark):
    paths = fixtures.features_table(spark).filter(F.col("feature_type") == "path")
    road = [r for r in fixtures.feature_rows() if r["feature_id"] == "path/test/6"][0]
    # probe exactly on the first vertex -> projection at arc length ~0
    out = geo_fn.with_distance_to_point_m(paths, road["ys"][0], road["xs"][0]).collect()[0]
    assert out["dist_m"] < 0.5
    # probe at the last vertex -> arc length ~ the full polyline length
    out2 = geo_fn.with_distance_to_point_m(paths, road["ys"][-1], road["xs"][-1]).collect()[0]
    want = geom.polyline_length_m(np.array(road["xs"]), np.array(road["ys"]))
    assert out2["dist_m"] == pytest.approx(want, rel=1e-6)


def test_s2_covering_contains_feature_cells(spark):
    """Covering invariant: every POI's level-16 cell is contained in some
    covering cell of an area that contains the point."""
    from diagonal_b6_spark.kernels import cellmath as cm

    cov = catalog.q_geo_s2_covering(spark, SF).collect()
    by_f = {}
    for r in cov:
        by_f.setdefault(r["feature_id"], []).append(r["token"])
    assert len(by_f) == len(fixtures.feature_rows())
    # square's covering must contain the cell of its centre point
    centre = cm.cell_id_from_latlng(np.array([51.535]), np.array([-0.125]), 16)[0]
    sq = [cm.token_to_id(t) for t in by_f["area/test/1"]]
    assert any(cm.contains(np.array([c]), np.array([centre]))[0] for c in sq)


def test_tile_cover_antimeridian_wraps(spark):
    """The +-180-straddling square must cover a handful of tiles on BOTH
    edges of the x range, not a world-spanning bbox."""
    feats = fixtures.features_table(spark).filter(F.col("feature_id") == "area/test/4")
    out = geo_fn.tile_cover(feats, zoom=12).collect()
    xs = sorted({r["tile_x"] for r in out})
    assert len(out) <= 8  # ~200 m square: a few tiles, never thousands
    assert 0 in xs and 4095 in xs  # wraps across the antimeridian


def test_s2_polygon_corners(spark):
    df = catalog.q_geo_s2_cells(spark, SF).limit(5)
    out = geo_fn.s2_polygon(df, "min_cell16").collect()
    for r in out:
        assert len(r["corners"]) == 4


def test_convex_hull_agg(spark):
    pts = catalog._events_points(spark, SF)
    hull = catalog.q_geo_convex_hull(spark, SF).collect()
    assert 3 <= len(hull) <= 64
    # cross-check with the numpy kernel run on the full point set
    pdf = pts.toPandas()
    x, y = pdf["lng"].to_numpy(), pdf["lat"].to_numpy()
    idx = geom.convex_hull(x, y)
    got = sorted((round(float(r["lat"]), 9), round(float(r["lng"]), 9)) for r in hull)
    want = sorted((round(float(la), 9), round(float(ln), 9)) for la, ln in zip(y[idx], x[idx]))
    assert got == want


def test_rect_and_cap_polygon(spark):
    r = geo_fn.rectangle_polygon(spark, 51.0, -0.1, 51.01, -0.08)
    out = geo_fn.with_area_m2(r).collect()[0]
    # ~1.11 km x ~1.4 km
    assert out["area_m2"] == pytest.approx(1112.0 * 1398.0, rel=0.02)
    c = geo_fn.cap_polygon(spark, 51.5, -0.1, 500.0)
    out = geo_fn.with_area_m2(c).collect()[0]
    assert out["area_m2"] == pytest.approx(np.pi * 500.0**2, rel=0.01)


def test_points_of(spark):
    feats = fixtures.features_table(spark)
    out = geo_fn.points_of(feats.filter(F.col("feature_id") == "path/test/6"))
    assert out.count() == 12
    assert [r["idx"] for r in out.orderBy("idx").collect()] == list(range(12))


def test_snap_area_edges(spark):
    """A square 10 m from a straight path: near-side vertices snap onto
    the path (distance ~0), far-side vertices stay put."""
    M = 111195.0
    lat0 = 51.60
    kx = M * np.cos(np.radians(lat0))
    path = spark.createDataFrame(
        [("path/t/1", "path", "t", {},
          [float(-0.30), float(-0.30)], [float(lat0 - 0.01), float(lat0 + 0.01)], [0])],
        "feature_id string, feature_type string, ns string, tags map<string,string>, "
        "xs array<double>, ys array<double>, ring_offsets array<int>",
    )
    # square: west side 10 m east of the path, east side 200 m away
    x_w = float(-0.30 + 10.0 / kx)
    x_e = float(-0.30 + 200.0 / kx)
    y0, y1 = float(lat0 - 50.0 / M), float(lat0 + 50.0 / M)
    area = spark.createDataFrame(
        [("area/t/2", "area", "t", {}, [x_w, x_e, x_e, x_w], [y0, y0, y1, y1], [0])],
        "feature_id string, feature_type string, ns string, tags map<string,string>, "
        "xs array<double>, ys array<double>, ring_offsets array<int>",
    )
    out = geo_fn.snap_area_edges(area, path, threshold_m=20.0).collect()[0]
    assert out["n_snapped"] == 2
    xs = out["xs"]
    assert xs[0] == pytest.approx(-0.30, abs=1e-9)  # west vertices snapped onto path
    assert xs[3] == pytest.approx(-0.30, abs=1e-9)
    assert xs[1] == pytest.approx(x_e, abs=1e-12)  # east vertices untouched
    assert out["ys"] == [y0, y0, y1, y1]


def test_histogram_auto_modes(spark):
    from diagonal_b6_spark.operators import agg as agg_ops

    cat = spark.createDataFrame([(v,) for v in [1, 1, 2, 2, 2, 3]], "v int")
    got = {r["bucket"]: r["n"] for r in agg_ops.histogram_auto(cat, "v").collect()}
    assert got == {"1": 2, "2": 3, "3": 1}  # categorical mode
    num = spark.createDataFrame([(float(v),) for v in range(100)], "v double")
    got = {r["bucket"]: r["n"] for r in agg_ops.histogram_auto(num, "v", n_buckets=4).collect()}
    assert got == {"0": 25, "1": 25, "2": 25, "3": 25}  # equal-width numeric


def test_ordered_join_branches(spark):
    """All four reversal branches + the error case (reference
    fn features.go:487-520 branch order)."""
    from diagonal_b6_spark import catalog

    out = {r["pair_id"]: r for r in catalog.q_ordered_join(spark, SF).collect()}
    n00, n01, n02 = (-0.1, 51.5), (-0.0971, 51.5), (-0.0942, 51.5)
    n10 = (-0.1, 51.5018)
    def ring(r): return list(zip(r["xs"], r["ys"]))
    assert ring(out["street/h/0/0|street/h/0/1"]) == [n00, n01, n02]
    assert ring(out["street/h/0/1|street/h/0/0"]) == [n02, n01, n00]
    assert ring(out["street/v/0/0|street/h/0/0"]) == [n10, n00, n01]
    assert ring(out["street/h/0/0|street/v/0/0"]) == [n01, n00, n10]
    bad = out["street/h/0/0|street/driveway"]
    assert not bad["ok"] and bad["xs"] is None


def test_count_tag_value_and_id_to_relation(spark):
    from pyspark.sql import functions as F
    from diagonal_b6_spark import fixtures
    from diagonal_b6_spark.operators import find as find_ops

    feats = fixtures.features_table(spark)
    rows = find_ops.count_tag_value(feats, "#building").collect()
    assert {(r.feature_id, r.v, r.n) for r in rows} == {
        ("area/test/1", "yes", 1), ("area/test/2", "yes", 1), ("area/test/5", "hut", 1)
    }
    rid = (
        spark.range(1)
        .select(find_ops.id_to_relation_id(F.lit("test/fixtures"), F.lit(42)).alias("rid"))
        .first()["rid"]
    )
    assert rid == "relation/test/fixtures/42"


def test_apply_to_type_gates_transform(spark):
    """apply-to-area: the transform touches only areas; points/paths pass
    through unchanged (reference wraps the fn as identity elsewhere)."""
    from pyspark.sql import functions as F
    from diagonal_b6_spark import fixtures
    from diagonal_b6_spark.operators import geo_fn

    feats = fixtures.features_table(spark)

    def centroidize(df):
        c = geo_fn.with_centroid(df)
        return c.select(
            "feature_id", F.lit("point").alias("feature_type"), "ns", "tags",
            F.array("centroid_lng").alias("xs"), F.array("centroid_lat").alias("ys"),
            F.array(F.lit(0)).alias("ring_offsets"),
        )

    out = geo_fn.map_geometries(feats, lambda df: geo_fn.apply_to_type(df, "area", centroidize))
    got = {r.feature_id: r for r in out.collect()}
    assert len(got) == feats.count()
    assert all(len(got[f"area/test/{i}"].xs) == 1 for i in range(1, 6))  # centroidized
    street = got["path/test/6"]
    assert street.feature_type == "path" and len(street.xs) == 12  # untouched


def test_s2_center_points_grid_wrappers(spark):
    """s2-center / s2-points / s2-grid named wrappers (fn s2.go:13-65):
    center is the decoded cell centroid; points are the distinct covering
    centroids; grid is the distinct fixed-level token set."""
    from diagonal_b6_spark.kernels import cellmath as cm

    feats = fixtures.features_table(spark).where(F.col("feature_type") == "area").limit(3)
    cov = geo_fn.s2_covering(feats)
    centered = geo_fn.s2_center(cov.select("token", "center_lat", "center_lng")).collect()
    assert len(centered) > 0
    for r in centered:
        # wrapper's token->center decode equals the covering's own center
        assert r["center_lat"] == pytest.approx(r["center_lat"], abs=0)
        cid = cm.token_to_id(r["token"])
        lat, lng = cm.cell_center_latlng(cid)
        assert r["center_lat"] == pytest.approx(float(lat[0]), abs=1e-12)
        assert r["center_lng"] == pytest.approx(float(lng[0]), abs=1e-12)

    pts = geo_fn.s2_points(feats).collect()
    toks = {r["token"] for r in pts}
    assert toks == {r["token"] for r in cov.select("token").distinct().collect()}
    assert len(pts) == len(toks)  # keyed by token, deduped

    lvl = 16
    grid = {r["token"] for r in geo_fn.s2_grid(feats, lvl).collect()}
    assert grid and all(int(cm.level(cm.token_to_id(t))[0]) == lvl for t in grid)


def test_geojson_wrappers_roundtrip(spark, tmp_path):
    """parse-geojson-file / import-geojson / geojson-areas compositions
    (fn geojson.go:69-156)."""
    import json

    from diagonal_b6_spark.sources import geojson as gj

    doc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {"name": "pt"},
             "geometry": {"type": "Point", "coordinates": [-0.1, 51.5]}},
            {"type": "Feature", "properties": {"name": "sq"},
             "geometry": {"type": "Polygon", "coordinates": [
                 [[-0.1, 51.5], [-0.1, 51.51], [-0.09, 51.51], [-0.09, 51.5], [-0.1, 51.5]]]}},
        ],
    }
    p = tmp_path / "fc.geojson"
    p.write_text(json.dumps(doc))
    parsed = gj.read_geojson_file(spark, str(p), ns="imp")
    assert parsed.count() == 2
    areas = gj.geojson_areas(parsed).collect()
    assert len(areas) == 1 and dict(areas[0].tags)["name"] == "sq"
    world = fixtures.features_table(spark)
    merged = gj.import_geojson(world, parsed)
    assert merged.count() == world.count() + 2
    assert merged.where(F.col("ns") == "imp").count() == 2


def test_collect_areas_by_groups(spark):
    """Grouped boolean union: a chain group merges to one piece with the
    inclusion-exclusion area; a disjoint group keeps two pieces."""
    rows = [
        # group 0: two overlapping unit-ish squares [0,2]x[0,2] & [1,3]x[0,2]
        (0, [0.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0]),
        (0, [1.0, 3.0, 3.0, 1.0], [0.0, 0.0, 2.0, 2.0]),
        # group 1: two disjoint squares
        (1, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0]),
        (1, [5.0, 6.0, 6.0, 5.0], [5.0, 5.0, 6.0, 6.0]),
    ]
    df = spark.createDataFrame(
        rows, "group_id long, xs array<double>, ys array<double>"
    )
    out = {
        r["group_id"]: (r["n_pieces"], r["area_deg2"])
        for r in geo_fn.collect_areas_by(df, "group_id").collect()
    }
    assert out[0][0] == 1 and out[0][1] == pytest.approx(6.0)
    assert out[1][0] == 2 and out[1][1] == pytest.approx(2.0)


def test_geohash_published_vector(spark):
    """Pinned against the canonical public geohash example
    (57.64911, 10.40744) -> u4pruydq, plus prefix-nesting."""
    from diagonal_b6_spark.operators import cover as cover_ops

    df = spark.createDataFrame(
        [(57.64911, 10.40744), (-90.0, -180.0), (89.999999, 179.999999)],
        "lat double, lng double",
    )
    rows = df.select(
        cover_ops.geohash_col(8).alias("g8"), cover_ops.geohash_col(5).alias("g5")
    ).collect()
    assert rows[0]["g8"] == "u4pruydq"
    # a shorter geohash is always a prefix of the longer one (same point)
    for r in rows:
        assert r["g8"].startswith(r["g5"])
    # corners stay in-domain (clamped, 8 chars, alphabet-only)
    for r in rows:
        assert len(r["g8"]) == 8
        assert set(r["g8"]) <= set("0123456789bcdefghjkmnpqrstuvwxyz")


def test_hull_partial_keeps_lone_point_partitions(spark):
    """Regression: the per-partition hull stage used to DROP a batch of
    fewer than 3 points (the kernel hulls a lone point to nothing), so
    a partition holding one true hull vertex lost it.  Four square
    corners spread across 8 partitions must all survive."""
    rows = [(0, 0.0, 0.0, 0, 0), (1, 0.0, 1.0, 0, 1024), (2, 1.0, 0.0, 1024, 0), (3, 1.0, 1.0, 1024, 1024)]
    df = spark.createDataFrame(
        rows, "id long, lat double, lng double, klat long, klng long"
    ).repartition(8)
    hull = geo_fn.convex_hull_agg(df).collect()
    assert sorted((r.lat, r.lng) for r in hull) == [
        (0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0)
    ]
    hv = geo_fn.convex_hull_vertices(df).collect()
    assert sorted((r.lat, r.lng) for r in hv) == [
        (0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0)
    ]


def test_join_paths_plain(spark):
    """Plain `join` (fn features.go:468-485 + TestJoin): b appends as
    given; its first vertex drops only when exactly shared with a's
    last; NO reversal happens (that is ordered-join's job)."""
    from diagonal_b6_spark.operators import geo_fn

    pairs = spark.createDataFrame(
        [
            # shared endpoint: joined length = len(a) + len(b) - 1
            ("shared", [0.0, 1.0], [0.0, 0.0], [1.0, 2.0], [0.0, 0.0]),
            # no shared endpoint: straight concatenation
            ("disjoint", [0.0, 1.0], [0.0, 0.0], [5.0, 6.0], [0.0, 0.0]),
            # b would stitch if reversed -- plain join must NOT reverse
            ("reversed", [0.0, 1.0], [0.0, 0.0], [2.0, 1.0], [0.0, 0.0]),
        ],
        "pair_id string, axs array<double>, ays array<double>, "
        "bxs array<double>, bys array<double>",
    )
    out = {r.pair_id: (r.xs, r.ys) for r in geo_fn.join_paths(pairs).collect()}
    assert out["shared"][0] == [0.0, 1.0, 2.0]
    assert out["disjoint"][0] == [0.0, 1.0, 5.0, 6.0]
    assert out["reversed"][0] == [0.0, 1.0, 2.0, 1.0]
    # TestJoin's length invariant: shared join length == sum of parts
    xs, ys = out["shared"]
    assert len(xs) == 2 + 2 - 1


def test_quadkey_published_example(spark):
    """Bing Maps Tile System worked example: tile (3, 5) at level 3 is
    quadkey '213'; plus the level-1 quadrants."""
    from diagonal_b6_spark.operators.cover import quadkey_col
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(3, 5)], "x long, y long")
    (qk,) = [r.qk for r in df.select(quadkey_col(F.col("x"), F.col("y"), 3).alias("qk")).collect()]
    assert qk == "213"
    quads = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (1, 1)], "x long, y long")
    got = {(r.x, r.y): r.qk for r in quads.select(
        "x", "y", quadkey_col(F.col("x"), F.col("y"), 1).alias("qk")).collect()}
    assert got == {(0, 0): "0", (1, 0): "1", (0, 1): "2", (1, 1): "3"}
