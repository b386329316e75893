"""End-to-end parity on the reference's OWN Granary Square / Camden data.

The reference's entire api/functions test suite runs against worlds
built from data/tests/granary-square.osm.pbf and camden.osm.pbf
(test/camden/camden.go BuildGranarySquareForTests).  This module drives
the SAME files through our full distributed pipeline -- blob-parallel
PBF decode (sources/pbf.py) -> world assembly with the reference's OSM
tag mapping (sources/osm.world_from_pbf) -> the operator under test --
and pins the reference's own expected values:

  * osm/pbf_test.go TestParsePBF: element/tag count bounds + the
    fountain way's "inner" role in relation 5735955.
  * test/camden/camden.go BuildingsInGranarySquare = 13 via
    find(keyed("#building")).
  * api/functions/features_test.go: TestSamplePointsAlongPaths (300-350
    deduped points at 20 m over #highway, all within 500 m of the
    square), TestInterpolate (way 377974549 midpoint), TestOrderedJoin
    (+ the no-shared-point error), TestJoin (length additivity),
    TestAllTags (Vermuteria #amenity=cafe, Camden world),
    TestFindAreasContainingPoints (Vermuteria inside the #shop-tagged
    Coal Drops Yard enclosure, Camden world).
  * api/functions/geometry_test.go TestDistanceToPointMeters.
  * api/functions/access_test.go TestBuildingAccessibility (>= 2
    buildings within 1000 m walking of the Lighterman, graph seeded and
    measured exactly like graph/graph.go's ShortestPathSearch:
    building-boundary nodes that lie on a #highway way seed at 0,
    weights are segment meters, an area is reached when a boundary
    node is).
  * api/functions/sightline_test.go TestSightlineDoesntHaveSpikes: the
    sightline polygon at the reference's spike-prone location crosses a
    100 m circle exactly twice.
  * spatial_test.go ValidateCapPolygonIntersection's five cap/polygon
    vectors.
  * path_test.go TestSamplePoints: the spacing-walk kernel emits
    floor(length)+1 points at 1 m spacing, consecutive gaps within the
    reference's ~10 cm tolerance.

Everything decodes from the reference's binary fixtures at test time;
no geometry is copied into this repo.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark.kernels import geom
from diagonal_b6_spark.operators import find as find_ops
from diagonal_b6_spark.operators.geo_fn import (
    join_paths,
    ordered_join,
    sample_points_every,
    with_interpolate,
)
from diagonal_b6_spark.operators.graph import bounded_sssp, building_access
from diagonal_b6_spark.operators.sightline import sightline
from diagonal_b6_spark.operators.spatial_join import containment_join_broadcast
from diagonal_b6_spark.sources.osm import world_from_pbf
from diagonal_b6_spark.sources.pbf import read_pbf

REF_DATA = "/root/reference/data/tests"
GRANARY = f"{REF_DATA}/granary-square.osm.pbf"
CAMDEN = f"{REF_DATA}/camden.osm.pbf"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(GRANARY), reason="reference fixture directory not present"
)

# test/camden/camden.go constants
LIGHTERMAN_WAY = 427900370
VERMUTERIA_NODE = 6082053666
COAL_DROPS_ENCLOSURE_WAY = 500008118
BUILDINGS_IN_GRANARY_SQUARE = 13


@pytest.fixture(scope="module")
def granary_tables(spark):
    t = read_pbf(spark, GRANARY)
    return {k: v.cache() for k, v in t.items()}


@pytest.fixture(scope="module")
def granary_world(spark):
    return world_from_pbf(spark, GRANARY).cache()


def _way_xy(tables, way_id):
    row = (
        tables["ways"]
        .filter(F.col("id") == way_id)
        .select(F.explode("refs").alias("id"))
        .join(tables["nodes"].select("id", "lat", "lon"), "id")
        .collect()
    )
    by_id = {r["id"]: (r["lon"], r["lat"]) for r in row}
    refs = tables["ways"].filter(F.col("id") == way_id).collect()[0]["refs"]
    xs = [by_id[r][0] for r in refs]
    ys = [by_id[r][1] for r in refs]
    return xs, ys


def test_parse_pbf_reference_bounds(granary_tables):
    """osm/pbf_test.go TestParsePBF, against the same file."""
    n_nodes = granary_tables["nodes"].count()
    n_ways = granary_tables["ways"].count()
    n_rels = granary_tables["relations"].count()
    assert 1500 <= n_nodes <= 1600 and n_nodes == 1550
    assert 160 <= n_ways <= 180 and n_ways == 174
    assert 15 <= n_rels <= 20 and n_rels == 19
    tags = sum(
        t.select(F.sum(F.size("tags"))).collect()[0][0]
        for t in granary_tables.values()
    )
    assert 1000 <= tags <= 1100 and tags == 1048

    members = (
        granary_tables["relations"]
        .filter(F.col("id") == 5735955)
        .select(F.explode("members").alias("m"))
        .filter(F.col("m.ref") == 167318943)
        .collect()
    )
    assert len(members) == 1 and members[0]["m"]["role"] == "inner"


def test_buildings_in_granary_square(granary_world):
    """camden.go BuildingsInGranarySquare = 13: 12 closed building ways
    + the Gasholders multipolygon relation, via the search surface."""
    buildings = find_ops.find(granary_world, find_ops.keyed("#building"))
    assert buildings.count() == BUILDINGS_IN_GRANARY_SQUARE
    ids = {r["feature_id"] for r in buildings.select("feature_id").collect()}
    assert f"area/osm/{LIGHTERMAN_WAY}" in ids
    assert "area/osm/r7972217" in ids  # camden.go GasholdersRelation


def test_sample_points_along_paths_real(granary_world):
    """features_test.go TestSamplePointsAlongPaths: 20 m sampling over
    every #highway path -> 300-350 globally-deduped points, all within
    500 m of the square's center."""
    paths = find_ops.find(
        granary_world, find_ops.typed("path", find_ops.keyed("#highway"))
    )
    pts = sample_points_every(paths, 20.0).collect()
    assert 300 <= len(pts) <= 350
    d = geom.haversine_m(
        np.array([p["lat"] for p in pts]),
        np.array([p["lng"] for p in pts]),
        51.53539,
        -0.12537,
    )
    assert float(d.max()) <= 500.0


def test_sample_points_spacing_kernel():
    """path_test.go TestSamplePoints: floor(length)+1 points at 1 m
    spacing, consecutive gaps within ~10 cm (the path isn't straight)."""
    xs = np.array([-0.125961, -0.1260701, -0.126080, -0.125291])
    ys = np.array([51.535317, 51.535364, 51.535407, 51.537327])
    length = geom.polyline_length_m(xs, ys)
    lat, lng = geom.sample_points_spacing(xs, ys, 1.0)
    assert len(lat) == math.floor(length) + 1
    gaps = geom.haversine_m(lat[:-1], lng[:-1], lat[1:], lng[1:])
    assert float(np.abs(gaps[:-1] - 1.0).max()) <= 0.102


def test_interpolate_way_377974549(spark, granary_tables):
    """features_test.go TestInterpolate: the midpoint of way 377974549
    lands within 0.1 m of (51.5361869, -0.1258445)."""
    xs, ys = _way_xy(granary_tables, 377974549)
    df = spark.createDataFrame([("w", xs, ys)], "feature_id string, xs array<double>, ys array<double>")
    r = with_interpolate(df, 0.5).collect()[0]
    d = float(geom.haversine_m(r["interp_lat"], r["interp_lng"], 51.5361869, -0.1258445))
    assert d <= 0.1


def test_ordered_join_real(spark, granary_tables):
    """features_test.go TestOrderedJoin: split way 377974549 at its mid
    vertex, reverse the first half, ordered-join and compare the joined
    midpoint with the original path's midpoint."""
    xs, ys = _way_xy(granary_tables, 377974549)
    mid = len(xs) // 2
    axs, ays = list(reversed(xs[: mid + 1])), list(reversed(ys[: mid + 1]))
    bxs, bys = xs[mid:], ys[mid:]
    pairs = spark.createDataFrame(
        [("p", axs, ays, bxs, bys)],
        "pair_id string, axs array<double>, ays array<double>, "
        "bxs array<double>, bys array<double>",
    )
    j = ordered_join(pairs).collect()[0]
    assert j["ok"]
    jlat, jlng = geom.interpolate_along(np.array(j["xs"]), np.array(j["ys"]), 0.5)
    elat, elng = geom.interpolate_along(np.array(xs), np.array(ys), 0.5)
    # the reference allows 1e-6 rad (~6 mm); same scale here
    assert float(geom.haversine_m(jlat, jlng, elat, elng)) <= 0.01


def test_ordered_join_no_shared_point(spark, granary_tables):
    """features_test.go TestOrderedJoinPathsWithNoSharedPoint: dropping
    the shared vertex leaves no stitch branch -> ok=false (the
    reference errors)."""
    xs, ys = _way_xy(granary_tables, 377974549)
    mid = len(xs) // 2
    axs, ays = list(reversed(xs[: mid + 1])), list(reversed(ys[: mid + 1]))
    bxs, bys = xs[mid + 1 :], ys[mid + 1 :]
    pairs = spark.createDataFrame(
        [("p", axs, ays, bxs, bys)],
        "pair_id string, axs array<double>, ays array<double>, "
        "bxs array<double>, bys array<double>",
    )
    j = ordered_join(pairs).collect()[0]
    assert not j["ok"]


def test_join_real(spark, granary_tables):
    """features_test.go TestJoin: joining connected ways 377974549 and
    834245629 preserves total length to within the reference's 1e-4
    relative tolerance."""
    axs, ays = _way_xy(granary_tables, 377974549)
    bxs, bys = _way_xy(granary_tables, 834245629)
    la = geom.polyline_length_m(np.array(axs), np.array(ays))
    lb = geom.polyline_length_m(np.array(bxs), np.array(bys))
    # the reference joins a's end to b's start; orient the inputs so
    # they connect (join is the PLAIN concatenation form)
    if (axs[-1], ays[-1]) != (bxs[0], bys[0]):
        if (axs[0], ays[0]) == (bxs[0], bys[0]):
            axs, ays = list(reversed(axs)), list(reversed(ays))
        elif (axs[-1], ays[-1]) == (bxs[-1], bys[-1]):
            bxs, bys = list(reversed(bxs)), list(reversed(bys))
        elif (axs[0], ays[0]) == (bxs[-1], bys[-1]):
            axs, ays, bxs, bys = bxs, bys, axs, ays
    pairs = spark.createDataFrame(
        [("p", axs, ays, bxs, bys)],
        "pair_id string, axs array<double>, ays array<double>, "
        "bxs array<double>, bys array<double>",
    )
    j = join_paths(pairs).collect()[0]
    lj = geom.polyline_length_m(np.array(j["xs"]), np.array(j["ys"]))
    assert abs(lj / (la + lb) - 1.0) <= 1e-4


def test_distance_to_point_real(granary_tables):
    """geometry_test.go TestDistanceToPointMeters: closest-approach
    distance from (51.53586, -0.12564) to way 377974549 is within 1.5x
    of the first-vertex distance (the reference's sanity bound)."""
    xs, ys = _way_xy(granary_tables, 377974549)
    d = float(
        np.asarray(
            geom.point_polyline_distance_m(
                -0.12564, 51.53586, np.array(xs), np.array(ys)
            )
        ).reshape(-1)[0]
    )
    baseline = float(geom.haversine_m(51.53586, -0.12564, ys[0], xs[0]))
    assert d > 0 and baseline / d <= 1.5


def _highway_edges(spark, tables):
    """#highway ways -> (src, dst, w) meter-weighted symmetric edges,
    the SimpleHighwayWeights graph (graph/graph.go:47-66)."""
    hw = tables["ways"].filter(F.col("tags")["highway"].isNotNull())
    refs = hw.select(F.col("id").alias("way_id"), F.posexplode("refs").alias("pos", "node"))
    locs = tables["nodes"].select(F.col("id").alias("node"), "lat", "lon")
    refs = refs.join(locs, "node")
    from pyspark.sql import Window

    w = Window.partitionBy("way_id").orderBy("pos")
    segs = refs.select(
        "way_id",
        F.col("node").alias("src"),
        F.col("lat").alias("y1"),
        F.col("lon").alias("x1"),
        F.lead("node").over(w).alias("dst"),
        F.lead("lat").over(w).alias("y2"),
        F.lead("lon").over(w).alias("x2"),
    ).filter(F.col("dst").isNotNull())
    dist = (
        F.lit(2 * 6371010.0)
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("y2") - F.col("y1")) / 2), 2)
                + F.cos(F.radians("y1"))
                * F.cos(F.radians("y2"))
                * F.pow(F.sin(F.radians(F.col("x2") - F.col("x1")) / 2), 2)
            )
        )
    )
    fwd = segs.select("src", "dst", dist.alias("w"))
    rev = segs.select(F.col("dst").alias("src"), F.col("src").alias("dst"), dist.alias("w"))
    return fwd.unionByName(rev)


def test_building_access_real(spark, granary_tables):
    """access_test.go TestBuildingAccessibility: from the Lighterman,
    1000 m of walking reaches at least two #building areas (every
    result a building by construction of the destination table).

    Seeding and area-reach both follow graph/graph.go exactly:
    FillOriginsFromBuildings seeds the building's boundary nodes that
    lie on a usable (#highway) way; AddOrUpdate marks an area reached
    when one of its boundary nodes is."""
    edges = _highway_edges(spark, granary_tables)
    hw_nodes = edges.select(F.col("src").alias("node")).distinct()

    def boundary_nodes(tag):
        return (
            granary_tables["ways"]
            .filter(F.col("tags")[tag].isNotNull())
            .filter(F.element_at("refs", 1) == F.element_at("refs", -1))
            .select(F.col("id").alias("building"), F.explode("refs").alias("node"))
        )

    lighterman = (
        granary_tables["ways"]
        .filter(F.col("id") == LIGHTERMAN_WAY)
        .select(F.explode("refs").alias("node"))
        .join(hw_nodes, "node", "leftsemi")
        .select(F.lit("lighterman").alias("origin"), "node")
    )
    assert lighterman.count() >= 1  # the origin connects to the network

    dist = bounded_sssp(edges, lighterman, rounds=64, max_cost=1000.0)
    building_nodes = boundary_nodes("building").select("node").distinct()
    reached = building_access(dist, building_nodes, 1000.0)
    reached_buildings = (
        reached.join(boundary_nodes("building"), "node")
        .select("building")
        .distinct()
        .collect()
    )
    ids = {r["building"] for r in reached_buildings}
    assert len(ids) >= 2
    assert LIGHTERMAN_WAY in ids  # distance 0 by seeding


def test_sightline_spike_real(spark, granary_world):
    """sightline_test.go TestSightlineDoesntHaveSpikes: at the
    reference's spike-prone location the 250 m sightline polygon
    crosses a 100 m circle exactly twice (6 before spike removal in the
    reference's original algorithm; our angular sweep produces no
    spikes by construction)."""
    ll = (51.536703, -0.126709)
    origins = spark.createDataFrame(
        [(1, ll[0], ll[1])], "origin_id long, lat double, lng double"
    )
    buildings = find_ops.find(granary_world, find_ops.keyed("#building"))
    out = sightline(origins, buildings, radius_m=250.0).collect()[0]
    blat = np.asarray(out["boundary_lats"])
    blng = np.asarray(out["boundary_lngs"])
    assert len(blat) >= 3

    # 100 m circle around the origin, 128 vertices (the reference's
    # s2.RegularLoop), in the same local planar frame
    coslat = math.cos(math.radians(ll[0]))
    m_per_deg = 111194.9  # 2*pi*R/360 at b6's radius
    theta = np.linspace(0.0, 2 * np.pi, 128, endpoint=False)
    clat = ll[0] + 100.0 * np.sin(theta) / m_per_deg
    clng = ll[1] + 100.0 * np.cos(theta) / (m_per_deg * coslat)

    def crossings(ax, ay, bx, by):
        n = 0
        a2x, a2y = np.roll(ax, -1), np.roll(ay, -1)
        b2x, b2y = np.roll(bx, -1), np.roll(by, -1)
        for i in range(len(ax)):
            d1x, d1y = a2x[i] - ax[i], a2y[i] - ay[i]
            for j in range(len(bx)):
                d2x, d2y = b2x[j] - bx[j], b2y[j] - by[j]
                den = d1x * d2y - d1y * d2x
                if den == 0:
                    continue
                t = ((bx[j] - ax[i]) * d2y - (by[j] - ay[i]) * d2x) / den
                u = ((bx[j] - ax[i]) * d1y - (by[j] - ay[i]) * d1x) / den
                if 0 <= t < 1 and 0 <= u < 1:
                    n += 1
        return n

    assert crossings(blng, blat, clng, clat) == 2


def test_cap_intersects_polygon_vectors():
    """spatial_test.go ValidateCapPolygonIntersection: the five
    cap-vs-quad vectors, through containment + boundary distance (the
    CapIntersectsPolygon decomposition)."""
    qx = np.array([-0.125801, -0.125887, -0.124957, -0.124826])
    qy = np.array([51.535623, 51.535401, 51.535245, 51.535447])
    cases = [
        (51.535437, -0.125363, 15.0, True),
        (51.535437, -0.125363, 100.0, True),
        (51.535437, -0.125363, 1.0, True),
        (51.535269, -0.124520, 1.0, False),
        (51.535269, -0.124520, 30.0, True),
    ]
    ring_x = np.concatenate([qx, qx[:1]])
    ring_y = np.concatenate([qy, qy[:1]])
    for lat, lng, radius, expected in cases:
        inside = bool(
            geom.points_in_polygon(
                np.array([lng]), np.array([lat]), qx, qy, np.array([0])
            )[0]
        )
        d = float(
            np.asarray(
                geom.point_polyline_distance_m(lng, lat, ring_x, ring_y)
            ).reshape(-1)[0]
        )
        assert (inside or d <= radius) == expected, (lat, lng, radius)


# ---------------------------------------------------------------- camden --


@pytest.fixture(scope="module")
def camden_tables(spark):
    t = read_pbf(spark, CAMDEN)
    return {k: v.cache() for k, v in t.items()}


def test_all_tags_vermuteria(spark, camden_tables):
    """features_test.go TestAllTags (Camden world): Vermuteria carries
    at least two tags and #amenity=cafe through the search mapping."""
    from diagonal_b6_spark.sources.osm import nodes_to_points

    pts = nodes_to_points(
        camden_tables["nodes"].filter(F.col("id") == VERMUTERIA_NODE)
    )
    rows = find_ops.all_tags(pts).collect()
    tags = {r["k"]: r["v"] for r in rows}
    assert len(tags) >= 2
    assert tags.get("#amenity") == "cafe"


def test_find_areas_containing_points_camden(spark, camden_tables):
    """features_test.go TestFindAreasContainingPoints (Camden world):
    the Vermuteria point is contained in the #shop-tagged Coal Drops
    Yard enclosure."""
    from diagonal_b6_spark.sources.osm import (
        fill_tags_from_osm,
        ways_to_features,
    )

    shops = (
        ways_to_features(camden_tables["nodes"], camden_tables["ways"])
        .withColumn("tags", fill_tags_from_osm(F.col("tags")))
        .filter(find_ops.typed("area", find_ops.keyed("#shop")))
    )
    v = camden_tables["nodes"].filter(F.col("id") == VERMUTERIA_NODE).select(
        F.concat(F.lit("point/osm/"), F.col("id")).alias("point_id"),
        F.col("lat"),
        F.col("lon").alias("lng"),
    )
    hits = containment_join_broadcast(v, shops, point_id="point_id").collect()
    containing = {r["feature_id"] for r in hits}
    assert f"area/osm/{COAL_DROPS_ENCLOSURE_WAY}" in containing


# ------------------------------------------------------- materialise-map --


def test_materialise_map_real(spark, granary_world):
    """materialise_test.go TestMaterialiseMap (Granary Square world):
    materialise-map over the buildings stores one collection feature per
    building; the Lighterman's materialised collection carries its
    website tag, readable back through list-feature."""
    from diagonal_b6_spark.shell import run
    from diagonal_b6_spark.shell.stdlib import ChangeVal

    ch = run(
        spark,
        granary_world,
        "materialise-map (find [#building]) /collection/test/0 all-tags",
    )
    assert isinstance(ch, ChangeVal)
    world2 = ch.apply(granary_world)
    top = (
        world2.filter(F.col("feature_id") == "collection/test/0")
        .select(F.explode("tags").alias("k", "v"))
        .collect()
    )
    tags = {r["k"]: r["v"] for r in top}
    keys = {v: k for k, v in tags.items() if k.startswith("member_key:")}
    assert f"area/osm/{LIGHTERMAN_WAY}" in keys
    idx = keys[f"area/osm/{LIGHTERMAN_WAY}"].split(":", 1)[1]
    mat_id = tags[f"member:{idx}"]
    members = (
        world2.filter(F.col("feature_id") == mat_id)
        .select(F.explode("tags").alias("k", "v"))
        .collect()
    )
    values = {r["v"] for r in members if r["k"].startswith("member:")}
    assert "website=https://thelighterman.co.uk/" in values
    # 13 buildings -> 13 materialised collections + 13 bound expressions
    assert (
        world2.filter(
            F.col("feature_id").startswith("collection/materialised/")
        ).count()
        == BUILDINGS_IN_GRANARY_SQUARE
    )


def test_materialise_map_merges_existing_items(spark, granary_world):
    """materialise_test.go TestMaterialiseMapMergesExistingCollectionItems:
    an entry already stored under the target id whose key (the Stable
    Street bridge -- not a building, so not re-produced) survives the
    re-materialisation."""
    from diagonal_b6_spark.shell import run

    bridge = "path/osm/140633010"  # camden.go StableStreetBridgeWay
    pre = spark.createDataFrame(
        [
            (
                "collection/test/0",
                "collection",
                "test",
                {"member:0": "collection/test/1", "member_key:0": bridge},
                [],
                [],
                [0],
            )
        ],
        granary_world.schema,
    )
    world_pre = granary_world.unionByName(pre)
    ch = run(
        spark,
        world_pre,
        "materialise-map (find [#building]) /collection/test/0 all-tags",
    )
    world2 = ch.apply(world_pre)
    rows = (
        world2.filter(F.col("feature_id") == "collection/test/0")
        .select(F.explode("tags").alias("k", "v"))
        .collect()
    )
    tags_list = [(r["k"], r["v"]) for r in rows]
    # the world overlay keeps the NEW feature's tags; find the carried
    # bridge entry: its member_key survives pointing at the old value
    tags = dict(tags_list)
    keys = {v: k for k, v in tags.items() if k.startswith("member_key:")}
    assert bridge in keys
    idx = keys[bridge].split(":", 1)[1]
    assert tags[f"member:{idx}"] == "collection/test/1"
    # and the buildings are all present alongside it
    assert sum(1 for k in tags if k.startswith("member:")) == (
        BUILDINGS_IN_GRANARY_SQUARE + 1
    )


def test_connect_granary_square_increases_accessibility(spark, granary_world):
    """graph/connectivity_test.go:262-297 TestConnectGranarySquare:
    connecting [#building]/[#amenity] features to the street network
    (thresholds 100 m) and folding the output back into the world makes
    MORE buildings AND amenities walk-reachable from the Coal Drops
    Yard footway south end (node 6083735356) within 1000."""
    from diagonal_b6_spark.operators import network as net_ops
    from diagonal_b6_spark.shell import parse as P
    from diagonal_b6_spark.shell import stdlib
    from diagonal_b6_spark.shell.evaluate import Env

    out = net_ops.connect_world(
        granary_world,
        connection_threshold_m=100.0,
        network_threshold_m=100.0,
        connect_keys=("#building", "#amenity"),
    )
    world2 = net_ops.apply_connect_to_world(granary_world, out).localCheckpoint()

    def counts(world):
        env = Env(spark, world)
        origin = world.filter(F.col("feature_id") == "point/osm/6083735356")
        dist, omap = stdlib._sssp(env, origin, {"walk:speed": "1.0"}, 1000.0)
        return {
            key: stdlib._reachable_features(env, dist, omap, P.QKeyed(key))
            .select("feature_id")
            .distinct()
            .count()
            for key in ("#building", "#amenity")
        }

    before = counts(granary_world)
    after = counts(world2)
    assert after["#building"] > before["#building"], (before, after)
    assert after["#amenity"] > before["#amenity"], (before, after)
