"""Transit conflation: match GTFS stops onto the street network and
stitch trips into bus-route relations.

Reference behavior being reproduced: b6/ingest/transit/conflate.go --
  * Project (conflate.go:160-199): candidate #highway/#railway paths
    within 30 m of the stop (StopSearchRadiusMeters, conflate.go:113);
    the stop projects onto each path's polyline; each projection gets
    six boolean features (Features, conflate.go:23-52):
      Within10Meters   dist < 15 m   (the reference's constants really
      Within20Meters   dist < 25 m    are 15/25, conflate.go:180-185)
      UseableByVehicle   IsPathUsableByBus   (graph/graph.go:60-82)
      PreferredByVehicle IsPathPreferredByBus (graph/graph.go:84-87)
      HeadingTowardsNextStop isPathHeadingTowardsPoint toward the most
        common next stop (conflate.go:154-158; transit.go:81-102);
        true when there is no next stop
      NameMatchesTransitData path name equals the stop's NaPTAN street
        (conflate.go:115-151), matched case-insensitively via a nearby
        naptan:AtcoCode point's naptan:Street tag
    and candidates rank by score desc then distance asc
    (ByScoreThenDistance, conflate.go:62-70).
  * project() vertex pick (conflate.go:72-85): the projection's nearest
    path VERTEX -- the segment's far vertex iff strictly closer.
  * stitchWays (conflate.go:87-110): consecutive stops connect by the
    shortest bus-weighted path bounded at 1000 m
    (PathSearchMaxDistanceMeters); the trip's last stop contributes its
    best path id; Conflate (conflate.go:201-259) emits one relation per
    trip with #type=route, #route=bus, ref=<route name>, source=diagonal.

Spark-first shape: the stop->path candidate set is the grid-cell
equi-join from operators/network.py (one shuffle on the grid key); the
per-(stop, path) projection argmin, the six features, and the final
rank are pure whole-stage-codegen column expressions -- no Python in
the scoring path.  Stitching reuses the distributed routing spine:
bus-usable directed segment edges -> dijkstra_cogrouped (per-origin
cogrouped exact Dijkstra) -> routes_from_pred step walk -> hop->path-id
equi-join, so no task sees more than one origin's subgraph.

Deviation, documented: the reference admits candidates via an S2 cap
COVERING (MightIntersect), which can include paths slightly beyond
30 m depending on covering slop; this implementation uses the exact
distance cutoff (the covering's intent).  The reference's own tests pin
only the direction predicate and feature scoring, which are exact here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import gridjoin
from .graph import dijkstra_cogrouped, routes_from_pred
from .network import _vertex_key, path_segments, segment_cells

STOP_SEARCH_RADIUS_M = 30.0  # conflate.go:112
PATH_SEARCH_MAX_DISTANCE_M = 1000.0  # conflate.go:113

_BUS_REJECT = (
    "footway", "steps", "corridor", "path", "pedestrian",
    "cycleway", "bridleway", "escape", "proposed", "construction",
)


def _tag(tags: Column, key: str) -> Column:
    """Go's Get(...).Value.String(): missing tag reads as ''. """
    return F.coalesce(tags.getItem(key), F.lit(""))


def bus_usable_col(tags: Column) -> Column:
    """IsPathUsableByBus (graph/graph.go:60-82) as one expression."""
    hw = _tag(tags, "#highway")
    return F.when(_tag(tags, "diagonal") == "connection", F.lit(True)).otherwise(
        F.when(hw == "", F.lit(False)).otherwise(
            F.when(hw.isin(*_BUS_REJECT), F.lit(False)).otherwise(
                F.when(_tag(tags, "access") == "no", _tag(tags, "bus") == "yes")
                .otherwise(F.lit(True))
            )
        )
    )


def bus_preferred_col(tags: Column) -> Column:
    """IsPathPreferredByBus (graph/graph.go:84-87)."""
    return _tag(tags, "#highway").isin("primary", "secondary", "trunk")


def heading_towards_col(
    tags: Column, first_lat, first_lng, last_lat, last_lng, pt_lat, pt_lng
) -> Column:
    """isPathHeadingTowardsPoint (conflate.go:154-158): non-oneway paths
    always head toward the point; oneway paths do iff their LAST vertex
    is closer to it than their first."""
    return F.when(_tag(tags, "oneway") != "yes", F.lit(True)).otherwise(
        gridjoin.haversine_col(pt_lat, pt_lng, last_lat, last_lng)
        < gridjoin.haversine_col(pt_lat, pt_lng, first_lat, first_lng)
    )


def bus_direction_usable(edges_fwd: DataFrame) -> DataFrame:
    """IsSegmentUseableInThisDirectionByBus (graph/graph.go:89-97) over
    forward segment rows carrying a `tags` column: forward is always
    usable; the reverse direction only on non-oneway paths or with an
    explicit oneway:bus=no override."""
    rev_ok = (_tag(F.col("tags"), "oneway") != "yes") | (
        _tag(F.col("tags"), "oneway:bus") == "no"
    )
    rev = (
        edges_fwd.filter(rev_ok)
        .select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w", "path_id", "tags"
        )
    )
    return edges_fwd.unionByName(rev)


def bus_edges_from_paths(paths: DataFrame) -> DataFrame:
    """Directed (src, dst, w, path_id) bus-graph edges from path
    features: BusWeights.IsUseable = usable path AND usable direction
    (graph/graph.go:101-107); w = segment haversine meters.  Vertex ids
    are the 1e-7-degree coordinate keys shared with the street-network
    family, so projections snap onto the same graph."""
    usable = paths.filter(bus_usable_col(F.col("tags")))
    # path_segments keeps feature_id; re-attach tags with one small join
    segs = path_segments(usable).withColumnRenamed("feature_id", "path_id").join(
        usable.select(F.col("feature_id").alias("path_id"), "tags"), "path_id"
    )
    fwd = segs.select(
        _vertex_key(F.col("y1"), F.col("x1")).alias("src"),
        _vertex_key(F.col("y2"), F.col("x2")).alias("dst"),
        gridjoin.haversine_col(F.col("y1"), F.col("x1"), F.col("y2"), F.col("x2")).alias("w"),
        "path_id",
        "tags",
    )
    return bus_direction_usable(fwd).select("src", "dst", "w", "path_id")


def most_common_next_stop(stop_times: DataFrame) -> DataFrame:
    """(stop_id, next_stop_id): the stop following this one on the
    majority of trips; ties break to the LARGER next stop id
    (MostCommonNextStop, transit.go:81-102)."""
    a, b = stop_times.alias("a"), stop_times.alias("b")
    nxt = a.join(
        b,
        (F.col("a.trip_id") == F.col("b.trip_id"))
        & (F.col("b.stop_seq") == F.col("a.stop_seq") + 1),
    ).select(F.col("a.stop_id").alias("stop_id"), F.col("b.stop_id").alias("next_id"))
    counts = nxt.groupBy("stop_id", "next_id").agg(F.count("*").alias("n"))
    best = counts.groupBy("stop_id").agg(
        F.max(F.struct(F.col("n"), F.col("next_id"))).alias("b")
    )
    return best.select("stop_id", F.col("b.next_id").alias("next_stop_id"))


def lookup_naptan_streets(
    stops: DataFrame, points: DataFrame, radius_m: float = STOP_SEARCH_RADIUS_M
) -> DataFrame:
    """(stop_id, naptan_street): the naptan:Street tag of a #highway
    point within `radius_m` whose naptan:AtcoCode equals the stop's atco
    id (lookupNaptanStreet, conflate.go:115-135).  Grid candidate join;
    deterministic nearest-then-id pick where the reference takes the
    first iteration hit."""
    cell_deg = gridjoin.margin_deg(radius_m)
    cands = points.filter(
        F.col("tags").getItem("#highway").isNotNull()
        & F.col("tags").getItem("naptan:AtcoCode").isNotNull()
        & F.col("tags").getItem("naptan:Street").isNotNull()
    ).select(
        F.col("tags").getItem("naptan:AtcoCode").alias("atco"),
        F.col("tags").getItem("naptan:Street").alias("naptan_street"),
        F.element_at("ys", 1).alias("nlat"),
        F.element_at("xs", 1).alias("nlng"),
    )
    pcells = gridjoin.explode_bbox_cells(
        cands, cell_deg, radius_m,
        F.col("nlng"), F.col("nlng"), F.col("nlat"), F.col("nlat"),
    )
    scells = gridjoin.probe_cells(
        stops.filter(F.col("atco").isNotNull()).select("stop_id", "lat", "lng", "atco"),
        cell_deg,
    )
    hits = (
        scells.join(pcells, ["gy", "gx", "atco"])
        .withColumn(
            "d",
            gridjoin.haversine_col(F.col("lat"), F.col("lng"), F.col("nlat"), F.col("nlng")),
        )
        .filter(F.col("d") <= radius_m)
    )
    best = hits.groupBy("stop_id").agg(
        F.min(F.struct("d", "naptan_street")).alias("b")
    )
    return best.select("stop_id", F.col("b.naptan_street").alias("naptan_street"))


def project_stops(
    stops: DataFrame,
    paths: DataFrame,
    stop_times: DataFrame | None = None,
    naptan_points: DataFrame | None = None,
    radius_m: float = STOP_SEARCH_RADIUS_M,
) -> DataFrame:
    """Every (stop, candidate path) projection with the six scored
    features (Project, conflate.go:160-199): one row per candidate,
    columns (stop_id, path_id, dist_m, proj_lat, proj_lng, vertex_lat,
    vertex_lng, within10, within20, usable, preferred, heading,
    name_match, score).

    stops: (stop_id, lat, lng[, atco]).  paths: feature table rows of
    type path.  stop_times: (trip_id, stop_id, stop_seq) for the
    most-common-next-stop direction test (omitted -> heading true, the
    reference's nil-next-stop branch).  naptan_points: point features
    for the NaPTAN street-name match (omitted -> name_match false).
    """
    cand_paths = paths.filter(
        (F.col("feature_type") == "path")
        & (
            F.col("tags").getItem("#highway").isNotNull()
            | F.col("tags").getItem("#railway").isNotNull()
        )
    )
    cell_deg = gridjoin.margin_deg(radius_m)
    segs = segment_cells(path_segments(cand_paths), cell_deg, radius_m).withColumnRenamed(
        "feature_id", "path_id"
    )
    # pre-join the per-stop lookups (next-stop target, NaPTAN street)
    # onto the STOP table before the grid fan-out: stops are the small
    # side of the candidate join, so this costs two joins on the stop
    # table instead of two extra shuffles of the much larger candidate
    # table afterwards
    stops_aug = stops.select("stop_id", "lat", "lng")
    if stop_times is not None:
        nxt = most_common_next_stop(stop_times).join(
            stops.select(F.col("stop_id").alias("next_stop_id"),
                         F.col("lat").alias("next_lat"), F.col("lng").alias("next_lng")),
            "next_stop_id",
        ).select("stop_id", "next_lat", "next_lng")
        stops_aug = stops_aug.join(nxt, "stop_id", "left")
    else:
        stops_aug = stops_aug.withColumn("next_lat", F.lit(None).cast("double")) \
            .withColumn("next_lng", F.lit(None).cast("double"))
    if naptan_points is not None:
        streets = lookup_naptan_streets(stops, naptan_points, radius_m)
        stops_aug = stops_aug.join(streets, "stop_id", "left")
    else:
        stops_aug = stops_aug.withColumn("naptan_street", F.lit(None).cast("string"))
    pts = gridjoin.probe_cells(stops_aug, cell_deg)
    cand = pts.join(segs, ["gy", "gx"])
    d = gridjoin.point_segment_dist_col(
        F.col("lng"), F.col("lat"), F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")
    )
    t = gridjoin.point_segment_t_col(
        F.col("lng"), F.col("lat"), F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")
    )
    # per-(stop, path) argmin over segments = Polyline.Project
    scored = cand.select(
        "stop_id", "lat", "lng", "next_lat", "next_lng", "naptan_street", "path_id",
        F.struct(
            d.alias("dist_m"),
            F.col("seg_idx"),
            (F.col("y1") + t * (F.col("y2") - F.col("y1"))).alias("proj_lat"),
            (F.col("x1") + t * (F.col("x2") - F.col("x1"))).alias("proj_lng"),
            F.col("y1").alias("sy1"), F.col("x1").alias("sx1"),
            F.col("y2").alias("sy2"), F.col("x2").alias("sx2"),
        ).alias("c"),
    ).filter(F.col("c.dist_m") <= radius_m)
    best_seg = scored.groupBy(
        "stop_id", "lat", "lng", "next_lat", "next_lng", "naptan_street", "path_id"
    ).agg(F.min("c").alias("c"))
    # nearest path vertex to the projection: far vertex iff strictly
    # closer (project(), conflate.go:72-85)
    dnext = gridjoin.haversine_col(
        F.col("c.proj_lat"), F.col("c.proj_lng"), F.col("c.sy2"), F.col("c.sx2")
    )
    dprev = gridjoin.haversine_col(
        F.col("c.proj_lat"), F.col("c.proj_lng"), F.col("c.sy1"), F.col("c.sx1")
    )
    proj = best_seg.select(
        "stop_id", "lat", "lng", "next_lat", "next_lng", "naptan_street", "path_id",
        F.col("c.dist_m").alias("dist_m"),
        F.col("c.proj_lat").alias("proj_lat"),
        F.col("c.proj_lng").alias("proj_lng"),
        F.when(dnext < dprev, F.col("c.sy2")).otherwise(F.col("c.sy1")).alias("vertex_lat"),
        F.when(dnext < dprev, F.col("c.sx2")).otherwise(F.col("c.sx1")).alias("vertex_lng"),
    )
    # path-level columns for the feature tests (the only remaining join;
    # AQE broadcasts it when the searched path set is small)
    pcols = cand_paths.select(
        F.col("feature_id").alias("path_id"),
        "tags",
        F.element_at("ys", 1).alias("first_lat"),
        F.element_at("xs", 1).alias("first_lng"),
        F.element_at("ys", -1).alias("last_lat"),
        F.element_at("xs", -1).alias("last_lng"),
    )
    out = proj.join(pcols, "path_id")
    heading = F.when(F.col("next_lat").isNull(), F.lit(True)).otherwise(
        heading_towards_col(
            F.col("tags"), F.col("first_lat"), F.col("first_lng"),
            F.col("last_lat"), F.col("last_lng"),
            F.col("next_lat"), F.col("next_lng"),
        )
    )
    name_match = (
        F.col("naptan_street").isNotNull()
        & F.col("tags").getItem("name").isNotNull()
        & (F.lower(F.col("tags").getItem("name")) == F.lower(F.col("naptan_street")))
    )
    feats = out.select(
        "stop_id", "path_id", "dist_m", "proj_lat", "proj_lng",
        "vertex_lat", "vertex_lng",
        (F.col("dist_m") < 15.0).alias("within10"),
        (F.col("dist_m") < 25.0).alias("within20"),
        bus_usable_col(F.col("tags")).alias("usable"),
        bus_preferred_col(F.col("tags")).alias("preferred"),
        heading.alias("heading"),
        name_match.alias("name_match"),
    )
    score = sum(
        F.col(c).cast("int")
        for c in ["within10", "within20", "usable", "preferred", "heading", "name_match"]
    )
    return feats.withColumn("score", score)


def best_projection(projections: DataFrame) -> DataFrame:
    """One row per stop: highest score, then nearest
    (ByScoreThenDistance, conflate.go:62-70; path_id breaks exact ties
    deterministically where the reference's sort is unstable)."""
    packed = projections.select(
        "stop_id",
        F.struct(
            (-F.col("score")).alias("negscore"),
            F.col("dist_m").alias("d"),
            F.col("path_id").alias("p"),
            F.struct(*[F.col(c) for c in projections.columns]).alias("row"),
        ).alias("b"),
    )
    best = packed.groupBy("stop_id").agg(F.min("b").alias("b"))
    return best.select(F.col("b.row.*"))


def conflate_trips(
    stop_times: DataFrame,
    trips: DataFrame,
    best: DataFrame,
    paths: DataFrame,
    max_distance_m: float = PATH_SEARCH_MAX_DISTANCE_M,
) -> DataFrame:
    """stitchWays + Conflate (conflate.go:87-110, 201-259): per trip, the
    ordered list of path feature ids tracing the route -- the shortest
    bus-weighted path (bounded at `max_distance_m`) between consecutive
    stops' best projection vertices, with the last stop contributing its
    best path id -- as relation rows
    (relation_id, members array<string>, tags map).

    trips: (trip_id, route_name).  Unreachable or unprojected legs drop
    (the reference's empty-projection branches)."""
    edges = bus_edges_from_paths(paths)
    seq = stop_times.join(best.select("stop_id", "vertex_lat", "vertex_lng", "path_id"), "stop_id")
    seq = seq.select(
        "trip_id", "stop_seq", "path_id",
        _vertex_key(F.col("vertex_lat"), F.col("vertex_lng")).alias("vkey"),
    )
    a, b = seq.alias("a"), seq.alias("b")
    legs = a.join(
        b,
        (F.col("a.trip_id") == F.col("b.trip_id"))
        & (F.col("b.stop_seq") == F.col("a.stop_seq") + 1),
    ).select(
        F.col("a.trip_id").alias("trip_id"),
        F.col("a.stop_seq").alias("stop_seq"),
        F.col("a.vkey").alias("from_v"),
        F.col("b.vkey").alias("to_v"),
    )
    origins = legs.select(F.col("from_v").alias("origin")).distinct().select(
        "origin", F.col("origin").alias("node")
    )
    pred = dijkstra_cogrouped(origins, edges, max_cost=max_distance_m)
    # walk ONLY the requested legs (origin, dest) -- the accessible-routes
    # every-dest-per-origin cross join would be quadratic in stop count
    leg_pairs = legs.select(
        F.col("from_v").alias("origin"), F.col("to_v").alias("node")
    )
    steps = routes_from_pred(pred, leg_pairs.select("node"), pairs=leg_pairs)
    wanted = legs.select(
        "trip_id", "stop_seq",
        F.col("from_v").alias("origin"), F.col("to_v").alias("dest"),
    )
    leg_steps = steps.join(wanted, ["origin", "dest"])
    # hop -> path id: each (node, next node) step pair maps to its edge's
    # path (min path_id where parallel edges tie)
    s1, s2 = leg_steps.alias("s1"), leg_steps.alias("s2")
    hops = s1.join(
        s2,
        (F.col("s1.trip_id") == F.col("s2.trip_id"))
        & (F.col("s1.stop_seq") == F.col("s2.stop_seq"))
        & (F.col("s1.origin") == F.col("s2.origin"))
        & (F.col("s1.dest") == F.col("s2.dest"))
        & (F.col("s2.step_idx") == F.col("s1.step_idx") + 1),
    ).select(
        F.col("s1.trip_id").alias("trip_id"),
        F.col("s1.stop_seq").alias("stop_seq"),
        F.col("s1.step_idx").alias("step_idx"),
        F.col("s1.node").alias("u"),
        F.col("s2.node").alias("v"),
    )
    hop_paths = hops.join(
        edges.groupBy("src", "dst").agg(F.min("path_id").alias("hop_path")),
        (hops["u"] == F.col("src")) & (hops["v"] == F.col("dst")),
    ).select("trip_id", "stop_seq", "step_idx", "hop_path")
    # ordered member list per trip: legs in stop order, steps in walk
    # order; consecutive duplicate path ids collapse WITHIN a leg (a
    # contiguous run on one path is one Segment of ComputeShortestPath),
    # never across legs (each leg is its own segment list in the
    # reference, conflate.go:95-103); then the last stop's best path id,
    # appended unconditionally like conflate.go:104-108 -- so a trailing
    # duplicate is faithful when the final leg already ends on that path
    leg_members = hop_paths.groupBy("trip_id").agg(
        F.sort_array(F.collect_list(F.struct("stop_seq", "step_idx", "hop_path"))).alias("s")
    ).select(
        "trip_id",
        F.expr(
            "filter(transform(s, (x, i) -> "
            "CASE WHEN i = 0 OR s[i-1].stop_seq <> x.stop_seq "
            "     OR s[i-1].hop_path <> x.hop_path THEN x.hop_path END), "
            "m -> m IS NOT NULL)"
        ).alias("members"),
    )
    last = stop_times.groupBy("trip_id").agg(F.max("stop_seq").alias("stop_seq"))
    last_member = last.join(stop_times, ["trip_id", "stop_seq"]).join(
        best.select("stop_id", F.col("path_id").alias("last_path")), "stop_id"
    ).select("trip_id", "last_path")
    members = (
        trips.join(leg_members, "trip_id", "left")
        .join(last_member, "trip_id", "left")
        .select(
            "trip_id", "route_name",
            F.filter(
                F.concat(
                    F.coalesce(F.col("members"), F.array().cast("array<string>")),
                    F.array(F.col("last_path")),
                ),
                lambda m: m.isNotNull(),
            ).alias("members"),
        )
        .filter(F.size("members") > 0)
    )
    return members.select(
        F.concat(F.lit("relation/route/"), F.col("trip_id").cast("string")).alias(
            "relation_id"
        ),
        "members",
        F.map_from_arrays(
            F.array(F.lit("#type"), F.lit("#route"), F.lit("ref"), F.lit("source")),
            F.array(F.lit("route"), F.lit("bus"), F.col("route_name"), F.lit("diagonal")),
        ).alias("tags"),
    )
