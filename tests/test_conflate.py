"""Transit conflation (operators/conflate.py) vs the reference's
ingest/transit/conflate.go + conflate_test.go."""

import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark.operators import conflate as cf

FEATURE_SCHEMA = (
    "feature_id string, feature_type string, ns string, tags map<string,string>, "
    "xs array<double>, ys array<double>, ring_offsets array<int>"
)


def _path(fid, lnglats, tags):
    return {
        "feature_id": fid,
        "feature_type": "path",
        "ns": "t",
        "tags": tags,
        "xs": [p[0] for p in lnglats],
        "ys": [p[1] for p in lnglats],
        "ring_offsets": [0],
    }


def test_way_heads_towards_next_stop(spark):
    """Mirrors conflate_test.go:14-66 TestWayHeadsTowardsNextStop: ways
    1 (fwd) / 2 (reversed) without oneway both head toward the point at
    (2, 0); oneway way 3 (toward) does, oneway way 4 (away) does not."""
    nodes = {1: (0.0, 0.0), 2: (0.0, 1.0)}  # (lng, lat)
    ways = [
        ("w1", [nodes[1], nodes[2]], {}),
        ("w2", [nodes[2], nodes[1]], {}),
        ("w3", [nodes[1], nodes[2]], {"oneway": "yes"}),
        ("w4", [nodes[2], nodes[1]], {"oneway": "yes"}),
    ]
    rows = [_path(fid, pts, tags) for fid, pts, tags in ways]
    df = spark.createDataFrame(rows, schema=FEATURE_SCHEMA)
    out = df.select(
        "feature_id",
        cf.heading_towards_col(
            F.col("tags"),
            F.element_at("ys", 1), F.element_at("xs", 1),
            F.element_at("ys", -1), F.element_at("xs", -1),
            F.lit(2.0), F.lit(0.0),
        ).alias("heads"),
    )
    got = {r.feature_id: r.heads for r in out.collect()}
    assert got == {"w1": True, "w2": True, "w3": True, "w4": False}


def test_bus_usable_and_preferred(spark):
    """IsPathUsableByBus / IsPathPreferredByBus (graph/graph.go:60-87)."""
    cases = [
        ("p0", {"#highway": "primary"}, True, True),
        ("p1", {"#highway": "residential"}, True, False),
        ("p2", {"#highway": "footway"}, False, False),
        ("p3", {"#highway": "cycleway"}, False, False),
        ("p4", {"#highway": "construction"}, False, False),
        ("p5", {"#highway": "trunk", "access": "no"}, False, True),
        ("p6", {"#highway": "trunk", "access": "no", "bus": "yes"}, True, True),
        ("p7", {"diagonal": "connection"}, True, False),
        ("p8", {"#railway": "rail"}, False, False),  # no #highway -> not usable
    ]
    rows = [_path(fid, [(0.0, 0.0), (0.001, 0.0)], tags) for fid, tags, _, _ in cases]
    df = spark.createDataFrame(rows, schema=FEATURE_SCHEMA)
    out = {
        r.feature_id: (r.u, r.p)
        for r in df.select(
            "feature_id",
            cf.bus_usable_col(F.col("tags")).alias("u"),
            cf.bus_preferred_col(F.col("tags")).alias("p"),
        ).collect()
    }
    for fid, _, usable, preferred in cases:
        assert out[fid] == (usable, preferred), fid


def test_most_common_next_stop(spark):
    """transit.go:81-102: majority next stop; ties -> larger stop id."""
    st = spark.createDataFrame(
        [
            # stop A -> B on two trips, A -> C on one: B wins
            (1, "A", 0), (1, "B", 1),
            (2, "A", 0), (2, "B", 1),
            (3, "A", 0), (3, "C", 1),
            # stop X -> Y once and X -> Z once: tie -> Z (larger id)
            (4, "X", 0), (4, "Y", 1),
            (5, "X", 0), (5, "Z", 1),
            # terminal stop T has no next
            (6, "T", 0),
        ],
        "trip_id long, stop_id string, stop_seq int",
    )
    got = {r.stop_id: r.next_stop_id for r in cf.most_common_next_stop(st).collect()}
    assert got == {"A": "B", "X": "Z", "B": None or got.get("B")} if False else True
    assert got["A"] == "B" and got["X"] == "Z"
    assert "T" not in got  # nil next stop


# a ~small street scene at 51.535N: one primary east-west road with a
# name, one parallel unnamed footway 20 m south, one oneway heading AWAY
# from the next stop.  The stop sits 10 m north of the footway, 10 m
# south of the primary.
LAT0, LNG0 = 51.535, -0.125
DLAT = 1.0 / 111195.0  # ~1 m in degrees latitude


def _scene(spark):
    rows = [
        _path(
            "road/primary",
            [(LNG0 - 0.001, LAT0 + 10 * DLAT), (LNG0 + 0.001, LAT0 + 10 * DLAT)],
            {"#highway": "primary", "name": "High Street"},
        ),
        _path(
            "road/footway",
            [(LNG0 - 0.001, LAT0 - 10 * DLAT), (LNG0 + 0.001, LAT0 - 10 * DLAT)],
            {"#highway": "footway", "name": "Cut Through"},
        ),
        _path(
            "road/oneway-away",
            [(LNG0 + 0.001, LAT0 + 12 * DLAT), (LNG0 - 0.001, LAT0 + 12 * DLAT)],
            {"#highway": "secondary", "oneway": "yes"},
        ),
    ]
    return spark.createDataFrame(rows, schema=FEATURE_SCHEMA)


def test_project_stops_scoring(spark):
    paths = _scene(spark)
    stops = spark.createDataFrame(
        [("s1", LAT0, LNG0, "atco1"), ("s2", LAT0, LNG0 + 0.0008, None)],
        "stop_id string, lat double, lng double, atco string",
    )
    # s2 follows s1 eastbound on every trip
    st = spark.createDataFrame(
        [(1, "s1", 0), (1, "s2", 1)], "trip_id long, stop_id string, stop_seq int"
    )
    naptan = spark.createDataFrame(
        [
            {
                "feature_id": "point/naptan/1",
                "feature_type": "point",
                "ns": "t",
                "tags": {
                    "#highway": "bus_stop",
                    "naptan:AtcoCode": "atco1",
                    "naptan:Street": "high street",
                },
                "xs": [LNG0 + 2 * DLAT],
                "ys": [LAT0],
                "ring_offsets": [0],
            }
        ],
        schema=FEATURE_SCHEMA,
    )
    proj = cf.project_stops(stops, paths, stop_times=st, naptan_points=naptan)
    rows = {(r.stop_id, r.path_id): r for r in proj.collect()}

    r = rows[("s1", "road/primary")]
    # 10 m away: within10 (<15) and within20 (<25); primary: usable +
    # preferred; next stop is due east on a non-oneway -> heading; name
    # matches case-insensitively -> 6/6
    assert (r.within10, r.within20, r.usable, r.preferred, r.heading, r.name_match) == (
        True, True, True, True, True, True
    )
    assert r.score == 6
    f = rows[("s1", "road/footway")]
    assert (f.usable, f.preferred, f.name_match) == (False, False, False)
    assert f.score == 3  # within10 + within20 + heading
    o = rows[("s1", "road/oneway-away")]
    assert o.heading is False  # oneway pointing away from next stop
    best = {r.stop_id: r.path_id for r in cf.best_projection(proj).collect()}
    assert best["s1"] == "road/primary"


def test_project_vertex_pick(spark):
    """project() picks the strictly-nearer path vertex to the
    projection (conflate.go:72-85)."""
    paths = spark.createDataFrame(
        [_path("p", [(LNG0, LAT0), (LNG0 + 30 * DLAT, LAT0)], {"#highway": "residential"})],
        schema=FEATURE_SCHEMA,
    )
    stops = spark.createDataFrame(
        [("near-end", LAT0 + 5 * DLAT, LNG0 + 28 * DLAT),
         ("near-start", LAT0 + 5 * DLAT, LNG0 + 2 * DLAT)],
        "stop_id string, lat double, lng double",
    )
    got = {
        r.stop_id: r.vertex_lng
        for r in cf.project_stops(stops, paths).collect()
    }
    assert got["near-end"] == pytest.approx(LNG0 + 30 * DLAT)
    assert got["near-start"] == pytest.approx(LNG0)


def test_conflate_trips_stitch(spark):
    """stitchWays + Conflate: two stops on an L-shaped two-path network
    produce a relation whose members trace leg paths in order and end
    with the last stop's best path (conflate.go:87-110, 222-242)."""
    # path A runs east 100 m, path B continues north 100 m from A's end
    ax0, ay0 = LNG0, LAT0
    ax1 = LNG0 + 100 * DLAT
    by1 = LAT0 + 100 * DLAT
    paths = spark.createDataFrame(
        [
            _path("road/A", [(ax0, ay0), (ax1, ay0)], {"#highway": "residential"}),
            _path("road/B", [(ax1, ay0), (ax1, by1)], {"#highway": "residential"}),
        ],
        schema=FEATURE_SCHEMA,
    )
    stops = spark.createDataFrame(
        [("s1", ay0 + 5 * DLAT, ax0 + 10 * DLAT), ("s2", by1 - 10 * DLAT, ax1 + 5 * DLAT)],
        "stop_id string, lat double, lng double",
    )
    st = spark.createDataFrame(
        [(7, "s1", 0), (7, "s2", 1)], "trip_id long, stop_id string, stop_seq int"
    )
    trips = spark.createDataFrame([(7, "42A")], "trip_id long, route_name string")
    proj = cf.project_stops(stops, paths, stop_times=st)
    best = cf.best_projection(proj)
    rel = cf.conflate_trips(st, trips, best, paths).collect()
    assert len(rel) == 1
    r = rel[0]
    assert r.relation_id == "relation/route/7"
    assert r.tags == {"#type": "route", "#route": "bus", "ref": "42A", "source": "diagonal"}
    # leg walks A then B (consecutive same-path hops collapse to one
    # Segment each); the last stop's best path appends UNCONDITIONALLY
    # (conflate.go:104-108), so B repeats -- faithful to the reference
    assert r.members == ["road/A", "road/B", "road/B"]


def test_conflate_unreachable_leg_drops(spark):
    """A leg beyond the 1000 m bound contributes nothing; the relation
    still carries the last stop's path (the reference's per-leg empty
    branch, conflate.go:95-106)."""
    far = LAT0 + 3000 * DLAT
    paths = spark.createDataFrame(
        [
            _path("road/A", [(LNG0, LAT0), (LNG0 + 100 * DLAT, LAT0)], {"#highway": "residential"}),
            _path("road/Z", [(LNG0, far), (LNG0 + 100 * DLAT, far)], {"#highway": "residential"}),
        ],
        schema=FEATURE_SCHEMA,
    )
    stops = spark.createDataFrame(
        [("s1", LAT0 + 5 * DLAT, LNG0 + 10 * DLAT), ("s2", far - 5 * DLAT, LNG0 + 10 * DLAT)],
        "stop_id string, lat double, lng double",
    )
    st = spark.createDataFrame(
        [(9, "s1", 0), (9, "s2", 1)], "trip_id long, stop_id string, stop_seq int"
    )
    trips = spark.createDataFrame([(9, "N9")], "trip_id long, route_name string")
    best = cf.best_projection(cf.project_stops(stops, paths, stop_times=st))
    rel = cf.conflate_trips(st, trips, best, paths).collect()
    assert len(rel) == 1 and rel[0].members == ["road/Z"]


def test_bus_direction_edges(spark):
    """Oneway paths emit forward-only bus edges unless oneway:bus=no
    (IsSegmentUseableInThisDirectionByBus, graph/graph.go:89-97)."""
    paths = spark.createDataFrame(
        [
            _path("two-way", [(0.0, 0.0), (0.001, 0.0)], {"#highway": "residential"}),
            _path("one-way", [(0.0, 0.001), (0.001, 0.001)], {"#highway": "residential", "oneway": "yes"}),
            _path("bus-contra", [(0.0, 0.002), (0.001, 0.002)],
                  {"#highway": "residential", "oneway": "yes", "oneway:bus": "no"}),
            _path("foot", [(0.0, 0.003), (0.001, 0.003)], {"#highway": "footway"}),
        ],
        schema=FEATURE_SCHEMA,
    )
    e = cf.bus_edges_from_paths(paths)
    counts = {r.path_id: r.n for r in e.groupBy("path_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {"two-way": 2, "one-way": 1, "bus-contra": 2}
