"""The reference's graph seeding/reach tests, re-run on the camden world.

graph/graph_test.go builds test/camden/camden.go's world (camden.osm.pbf)
and pins how ShortestPathSearch SEEDS from buildings and points and what
it REACHES.  These are the contracts behind shell/stdlib._snap(
fallback=False) and _reachable_features:

  * a building with NO entrance tags still seeds from every boundary
    vertex shared with a usable path (graph_test.go:316-347),
  * a building with MANY entrances seeds from ALL of them -- both sides
    of St Pancras are <= 30 m away (graph_test.go:349-391),
  * an unconnected point ON a building seeds as that building
    (graph_test.go:393-434),
  * the search reaches AREAS via boundary-vertex membership
    (graph_test.go:436-465).

SimpleWeights/SimpleHighwayWeights cost raw meters; walk:speed=1.0
reproduces that scale through weights_from_options.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark.operators.network import _vertex_key
from diagonal_b6_spark.shell import stdlib
from diagonal_b6_spark.shell.evaluate import Env
from diagonal_b6_spark.sources.osm import world_from_pbf

CAMDEN = "/root/reference/data/tests/camden.osm.pbf"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(CAMDEN), reason="reference fixture directory not present"
)

LIGHTERMAN = "area/osm/427900370"
ST_PANCRAS = "area/osm/4256246"
BRIDGE_NORTH_END = "point/osm/1447052073"
CDY_SOUTH_END = "point/osm/6083735356"
CDY_WEST = "area/osm/222021572"
THE_GRANARY = "area/osm/222021576"
RAW_METERS = {"walk:speed": "1.0"}  # SimpleWeights' cost scale

STATE: dict = {}


@pytest.fixture()
def world(spark):
    if "world" not in STATE:
        STATE["world"] = world_from_pbf(spark, CAMDEN).localCheckpoint()
    return STATE["world"]


def _node_keys(world, feature_id):
    """Vertex keys of one feature's geometry."""
    return (
        world.filter(F.col("feature_id") == feature_id)
        .select(F.explode(F.arrays_zip("xs", "ys")).alias("v"))
        .select(_vertex_key(F.col("v.ys"), F.col("v.xs")).alias("node"))
        .distinct()
    )


def _entrance_count(world, area_id):
    """Entrance-tagged point features sitting on the area's boundary."""
    pts = world.filter(
        (F.col("feature_type") == "point") & F.col("tags")["entrance"].isNotNull()
    ).select(
        _vertex_key(F.element_at("ys", 1), F.element_at("xs", 1)).alias("node")
    )
    return _node_keys(world, area_id).join(pts, "node").count()


def test_building_with_no_entrance_seeds_from_boundary(spark, world):
    """graph_test.go:316-347: The Lighterman has no entrance-tagged
    nodes, yet a 100 m search from it reaches the Stable Street bridge
    north end."""
    assert _entrance_count(world, LIGHTERMAN) == 0
    env = Env(spark, world)
    origin = world.filter(F.col("feature_id") == LIGHTERMAN)
    dist, _ = stdlib._sssp(env, origin, RAW_METERS, 100.0)
    assert dist.join(_node_keys(world, BRIDGE_NORTH_END), "node").count() == 1


def test_building_with_many_entrances_seeds_from_all(spark, world):
    """graph_test.go:349-391: St Pancras has >= 2 entrances; junction
    nodes on OPPOSITE sides of the station are both <= 30 m from it --
    impossible unless every connected boundary vertex seeds at 0."""
    assert _entrance_count(world, ST_PANCRAS) >= 2
    env = Env(spark, world)
    origin = world.filter(F.col("feature_id") == ST_PANCRAS)
    dist, _ = stdlib._sssp(env, origin, RAW_METERS, 500.0)
    for node_id in ("point/osm/6481824008", "point/osm/1237701825"):
        rows = dist.join(_node_keys(world, node_id), "node").collect()
        assert rows, node_id
        assert min(r.dist for r in rows) <= 30.0, (node_id, rows)


def test_unconnected_point_on_building_seeds_as_building(spark, world):
    """graph_test.go:393-434: a St Pancras boundary node referenced by
    no #highway path still expands a search -- it seeds from the
    building's connected vertices."""
    env = Env(spark, world)
    net_nodes = stdlib._network(env)["nodes"].select("node").distinct()
    detached = (
        world.filter(F.col("feature_type") == "point")
        .select(
            "feature_id",
            _vertex_key(F.element_at("ys", 1), F.element_at("xs", 1)).alias("node"),
        )
        .join(_node_keys(world, ST_PANCRAS), "node")
        .join(net_nodes, "node", "left_anti")
        .limit(1)
        .collect()
    )
    assert detached, "expected an unconnected point on St Pancras"
    origin = world.filter(F.col("feature_id") == detached[0].feature_id)
    dist, _ = stdlib._sssp(env, origin, RAW_METERS, 500.0)
    assert dist.count() > 1


def test_search_reaches_buildings(spark, world):
    """graph_test.go:436-465: a point search reaches Coal Drops Yard
    West as an AREA; a building-origin search reaches The Lighterman."""
    env = Env(spark, world)
    from diagonal_b6_spark.shell import parse as P

    q = P.QKeyed("#building")
    origin = world.filter(F.col("feature_id") == CDY_SOUTH_END)
    dist, omap = stdlib._sssp(env, origin, RAW_METERS, 500.0)
    reached = stdlib._reachable_features(env, dist, omap, q)
    ids = {r.feature_id for r in reached.select("feature_id").distinct().collect()}
    assert CDY_WEST in ids

    origin = world.filter(F.col("feature_id") == THE_GRANARY)
    dist, omap = stdlib._sssp(env, origin, RAW_METERS, 500.0)
    reached = stdlib._reachable_features(env, dist, omap, q)
    ids = {r.feature_id for r in reached.select("feature_id").distinct().collect()}
    assert LIGHTERMAN in ids


def _first_vertex_node(world, fid):
    return world.filter(F.col("feature_id") == fid).select(
        _vertex_key(F.element_at("ys", 1), F.element_at("xs", 1)).alias("node")
    )


def _bus_route_ways(spark, world, from_nodes, to_nodes, budget):
    """Way feature-ids on the bus-weight shortest path between two node
    sets (ComputeShortestPath + BusWeights, graph/graph.go:95-107):
    directed bus edges (oneway honored), cogrouped Dijkstra, predecessor
    walk, then each DIRECTED route step mapped back to its path."""
    from diagonal_b6_spark.operators import graph as graph_ops
    from diagonal_b6_spark.operators.conflate import bus_edges_from_paths

    paths = world.filter(F.col("feature_type") == "path")
    edges = bus_edges_from_paths(paths)
    origins = from_nodes.select(F.lit(1).cast("long").alias("origin"), "node")
    dist = graph_ops.dijkstra_cogrouped(
        origins, edges.select("src", "dst", "w"), max_cost=float(budget)
    )
    routes = graph_ops.routes_from_pred(dist, to_nodes)
    a = routes.select(
        "origin", "dest", (F.col("step_idx") + 1).alias("step_idx"),
        F.col("node").alias("u"),
    )
    b = routes.select("origin", "dest", "step_idx", F.col("node").alias("v"))
    steps = a.join(b, ["origin", "dest", "step_idx"])
    hit = steps.join(
        edges, (steps["u"] == edges["src"]) & (steps["v"] == edges["dst"])
    )
    return {r.path_id for r in hit.select("path_id").distinct().collect()}


def test_bus_shortest_path_prefers_roads(spark, world):
    """graph_test.go:13-56 TestShortestPath: the bus route between the
    two pinned ways uses 673733343 and 207107599, and avoids the Midland
    Road cycleway (681764413) and an off-route highway (673447483)."""
    ways = _bus_route_ways(
        spark, world,
        _first_vertex_node(world, "path/osm/687471322"),
        _first_vertex_node(world, "path/osm/367808662"),
        1000.0,
    )
    assert ways, "expected a route"
    for wid in ("path/osm/673733343", "path/osm/207107599"):
        assert wid in ways, wid
    for wid in ("path/osm/681764413", "path/osm/673447483"):
        assert wid not in ways, wid


def test_bus_shortest_path_honors_oneway(spark, world):
    """graph_test.go:160-200: at the 51.5452312,-0.1415558 junction the
    west fork is shorter southbound but oneway northbound -- the route
    takes 835618252 and never 502802551."""
    ways = _bus_route_ways(
        spark, world,
        _node_keys(world, "point/osm/33000703"),
        _node_keys(world, "point/osm/970237231"),
        500.0,
    )
    assert ways, "expected a route"
    assert "path/osm/835618252" in ways
    assert "path/osm/502802551" not in ways


BRIDGE_SOUTH_END = "point/osm/1540349979"
STABLE_STREET_BRIDGE = "path/osm/140633010"


def test_find_reachable_features_transit(spark, world):
    """api/functions/transit_test.go TestFindReachableFeatures: walking
    1000 from the Stable Street bridge south end, the #amenity query
    reaches the Lighterman."""
    from diagonal_b6_spark.shell import parse as P

    env = Env(spark, world)
    origin = world.filter(F.col("feature_id") == BRIDGE_SOUTH_END)
    dist, omap = stdlib._sssp(env, origin, {"mode": "walk"}, 1000.0)
    reached = stdlib._reachable_features(env, dist, omap, P.QKeyed("#amenity"))
    ids = {r.feature_id for r in reached.select("feature_id").distinct().collect()}
    assert LIGHTERMAN in ids


def test_paths_to_reach_features_transit(spark, world):
    """api/functions/transit_test.go TestPathsToReachFeatures: counts
    for over 60 paths, with the bridge itself used by >= 2 routes."""
    from diagonal_b6_spark.shell import parse as P

    env = Env(spark, world)
    origin = world.filter(F.col("feature_id") == BRIDGE_SOUTH_END)
    out = stdlib._fn_paths_to_reach(
        env, origin, {"mode": "walk"}, 1000.0, P.QKeyed("#amenity")
    )
    counts = {r["feature_id"]: r["n_paths"] for r in out.collect()}
    assert len(counts) >= 60, len(counts)
    assert counts.get(STABLE_STREET_BRIDGE, 0) >= 2


def _walk_edges(world):
    """Directed walking edges with per-segment elevation gains
    (elevation_gain_edges keeps path_id for the way assertions)."""
    from diagonal_b6_spark.operators.network import elevation_gain_edges

    return elevation_gain_edges(world)


def _route_hops(spark, edges, from_nodes, to_nodes, options, budget):
    """(hops, routes): directed route-step hops joined back to edges, and
    the raw (step_idx, node, cum_cost) rows, between two node sets."""
    from diagonal_b6_spark.operators import graph as graph_ops
    from diagonal_b6_spark.operators import weights as weights_ops

    weighted = weights_ops.weights_from_options(edges, options)
    origins = from_nodes.select(F.lit(1).cast("long").alias("origin"), "node")
    dist = graph_ops.dijkstra_cogrouped(origins, weighted, max_cost=float(budget))
    routes = graph_ops.routes_from_pred(dist, to_nodes)
    a = routes.select(
        "origin", "dest", (F.col("step_idx") + 1).alias("step_idx"),
        F.col("node").alias("u"),
    )
    b = routes.select("origin", "dest", "step_idx", F.col("node").alias("v"))
    hops = a.join(b, ["origin", "dest", "step_idx"]).join(
        edges.select("path_id", "src", "dst").distinct(),
        (F.col("u") == F.col("src")) & (F.col("v") == F.col("dst")),
    )
    return hops, routes


def test_elevation_route_avoids_hill(spark, world):
    """graph_test.go:466-495 TestElevationWeights: with ele=100 on node
    4931754283 and ele=200 on node 6773349520 and UpHillPenalty 1.2, the
    walk from 33000703 to 970237231 takes the longer flat way 835618252
    and avoids the shorter elevated way 502802551."""
    tagged = world.withColumn(
        "tags",
        F.when(
            F.col("feature_id") == "point/osm/4931754283",
            F.map_concat(
                F.map_filter(F.col("tags"), lambda k, _v: k != "ele"),
                F.create_map(F.lit("ele"), F.lit("100")),
            ),
        )
        .when(
            F.col("feature_id") == "point/osm/6773349520",
            F.map_concat(
                F.map_filter(F.col("tags"), lambda k, _v: k != "ele"),
                F.create_map(F.lit("ele"), F.lit("200")),
            ),
        )
        .otherwise(F.col("tags")),
    )
    edges = _walk_edges(tagged)
    # the tagged nodes must bound a shared charged segment, and the
    # charge must be direction-insensitive (index-order rule)
    charged = edges.filter(F.abs("elev_gain_m") > 0).collect()
    assert charged, "expected elevation-charged edges"
    assert {abs(r.elev_gain_m) for r in charged} == {100.0}
    hops, _ = _route_hops(
        spark,
        edges,
        _node_keys(world, "point/osm/33000703"),
        _node_keys(world, "point/osm/970237231"),
        {"elevation": "yes", "elevation:uphill": "1.2"},
        500.0,
    )
    ways = {r.path_id for r in hops.select("path_id").distinct().collect()}
    assert ways, "expected a route"
    assert "path/osm/835618252" in ways
    assert "path/osm/502802551" not in ways


def test_build_route_step_count_and_cost(spark, world):
    """graph_test.go:497-530 TestBuildRoute: the walking-time route from
    the first vertex of way 687471322 to the first vertex of way
    367808662 has 35-45 segment steps and a final cost in [850, 950]
    (weight units: meters x 1.25 m/s, the reference's multiply-by-speed
    convention)."""
    from diagonal_b6_spark.operators.network import graph_node_flags

    edges = _walk_edges(world)
    hops, routes = _route_hops(
        spark,
        edges,
        _first_vertex_node(world, "path/osm/687471322"),
        _first_vertex_node(world, "path/osm/367808662"),
        {},
        1000.0,
    )
    cost = routes.agg(F.max("cum_cost")).collect()[0][0]
    assert cost is not None, "expected a route"
    assert 850.0 <= cost <= 950.0, cost
    # reference Steps are SEGMENTS: count route vertices (origin
    # excluded) that end a segment -- a graph node (junction/tagged) or
    # an endpoint of the path the hop rides on (ingest/basic.go:256-260)
    hw = world.filter(
        (F.col("feature_type") == "path")
        & F.col("tags")["#highway"].isNotNull()
    )
    first = hw.select(
        F.col("feature_id").alias("path_id"),
        _vertex_key(F.element_at("ys", 1), F.element_at("xs", 1)).alias("end_node"),
    )
    last = hw.select(
        F.col("feature_id").alias("path_id"),
        _vertex_key(F.element_at("ys", -1), F.element_at("xs", -1)).alias("end_node"),
    )
    ends = first.unionByName(last).distinct()
    flags = graph_node_flags(world).filter(F.col("is_node")).select(
        F.col("node").alias("v")
    )
    boundary_hops = hops.join(flags, "v", "left_semi").unionByName(
        hops.join(
            ends,
            (hops["path_id"] == ends["path_id"]) & (hops["v"] == ends["end_node"]),
            "left_semi",
        )
    )
    steps = boundary_hops.select("step_idx").distinct().count()
    assert 35 <= steps <= 45, steps
