"""Incremental world maintenance, mirroring ingest/mutable_test.go's
fixtures (the reference's mutable overlay worlds):

* TestModifyPointsOnPathInExistingWorld -- relocating a path's points
  (Stable Street bridge -> Bank) moves the path in the spatial index.
* TestModifyPointsOnClosedPathInExistingWorld -- same for a closed way
  (in our packed world a closed way is the area row).
* TestModifyPathInExistingWorld -- swapping references in a path
  re-geometries the dependent area (Western Transit Shed extended over
  the Eastern Handyside Canopy).
* TestModifyPathWithIntersectionsInExistingWorld -- a rewrite that keeps
  a shared vertex retains connectivity at that vertex.

All through sources.osm.apply_osm_mutations: override raw tables by id,
rebuild only the dirty subset, replace stale snapshot rows by source id.
"""

import pyspark.sql.functions as F
import pytest

from diagonal_b6_spark.sources import osm as osm_src


def _tables(spark, nodes, ways):
    n = spark.createDataFrame(
        [(i, la, lo, {}) for i, la, lo in nodes],
        "id long, lat double, lon double, tags map<string,string>",
    )
    w = spark.createDataFrame(
        [(wid, refs, tags) for wid, refs, tags in ways],
        "id long, refs array<long>, tags map<string,string>",
    )
    return n, w


def _world(nodes, ways):
    pts = osm_src.nodes_to_points(nodes)
    wf = osm_src.ways_to_features(nodes, ways).withColumn(
        "tags", osm_src.fill_tags_from_osm(F.col("tags"))
    )
    return pts.unionByName(wf, allowMissingColumns=True)


def _cap_hits(world, ftype, lat, lng, radius_m):
    """Cap-vs-polyline intersection (the reference's IntersectsCap tests
    the geometry, not just vertices): min point-to-segment distance via
    the shared kernel, over the collected fixture-sized rows."""
    import numpy as np

    from diagonal_b6_spark.kernels import geom

    hits = set()
    for r in world.filter(F.col("feature_type") == ftype).collect():
        xs = list(r["xs"])
        ys = list(r["ys"])
        if ftype == "area":  # closed ring: include the wrap segment
            xs = xs + [xs[0]]
            ys = ys + [ys[0]]
        for i in range(len(xs) - 1):
            d = geom.point_segment_distance_m(
                np.array([lng]), np.array([lat]),
                xs[i], ys[i], xs[i + 1], ys[i + 1],
            )
            if float(d[0]) <= radius_m:
                hits.add(r["feature_id"])
                break
    return sorted(hits)


def test_modify_points_on_path(spark):
    """TestModifyPointsOnPathInExistingWorld, exact fixture."""
    a = (1447052073, 51.5350350, -0.1247934)
    b = (1540349979, 51.5348204, -0.1246405)
    nodes, ways = _tables(spark, [a, b], [(140633010, [a[0], b[0]], {})])
    world = _world(nodes, ways)

    mid = ((a[1] + b[1]) / 2, (a[2] + b[2]) / 2)
    assert _cap_hits(world, "path", *mid, 10.0) == ["path/osm/140633010"]

    moves = spark.createDataFrame(
        [(1447052073, 51.5132689, -0.0988335), (1540349979, 51.5129188, -0.0985641)],
        "id long, lat double, lon double",
    )
    world2, nodes2, ways2 = osm_src.apply_osm_mutations(
        world, nodes, ways, node_moves=moves
    )
    bank_mid = ((51.5132689 + 51.5129188) / 2, (-0.0988335 + -0.0985641) / 2)
    assert _cap_hits(world2, "path", *bank_mid, 10.0) == ["path/osm/140633010"]
    assert _cap_hits(world2, "path", *mid, 10.0) == []  # index updated
    # the path still references point a (FindReferences)
    refs = (
        ways2.select("id", F.explode("refs").alias("nid"))
        .filter(F.col("nid") == 1447052073)
        .collect()
    )
    assert [r["id"] for r in refs] == [140633010]
    # relocated point features replace the originals
    pts = {
        r["feature_id"]: (r["ys"][0], r["xs"][0])
        for r in world2.filter(F.col("feature_type") == "point").collect()
    }
    assert pts["point/osm/1447052073"] == (51.5132689, -0.0988335)
    assert len(pts) == 2


def test_modify_points_on_closed_path(spark):
    """TestModifyPointsOnClosedPathInExistingWorld: our packed world
    holds a closed way as its area row; the move re-indexes it."""
    a = (4270651271, 51.5353986, -0.1243711)
    b = (5693730033, 51.5352871, -0.1244193)
    c = (4270651273, 51.5351278, -0.1243315)
    nodes, ways = _tables(
        spark, [a, b, c], [(140633010, [a[0], b[0], c[0], a[0]], {})]
    )
    world = _world(nodes, ways)

    mid = ((a[1] + b[1]) / 2, (a[2] + b[2]) / 2)
    assert _cap_hits(world, "area", *mid, 10.0) == ["area/osm/140633010"]

    moves = spark.createDataFrame(
        [
            (4270651271, 51.5137306, -0.0905139),
            (5693730033, 51.5134981, -0.0898162),
            (4270651273, 51.5138208, -0.0896115),
        ],
        "id long, lat double, lon double",
    )
    world2, _, _ = osm_src.apply_osm_mutations(world, nodes, ways, node_moves=moves)
    bank_mid = ((51.5137306 + 51.5134981) / 2, (-0.0905139 + -0.0898162) / 2)
    assert _cap_hits(world2, "area", *bank_mid, 10.0) == ["area/osm/140633010"]
    assert _cap_hits(world2, "area", *mid, 10.0) == []
    # still exactly one area row for the way (no stale duplicate)
    n = world2.filter(F.col("feature_id") == "area/osm/140633010").count()
    assert n == 1


def test_modify_path_extends_area(spark):
    """TestModifyPathInExistingWorld: swapping points c, d for e, f
    extends the closed way over the Eastern Handyside Canopy; a 10 m cap
    at f intersects only after the change."""
    a = (2309943873, 51.5373249, -0.1251784)
    b = (2309943847, 51.5357239, -0.1258568)
    c = (2309943846, 51.5356657, -0.1254957)
    d = (2309943872, 51.5372656, -0.1248160)
    e = (2309943852, 51.5358965, -0.1230551)
    f = (2309943867, 51.5370349, -0.1232719)
    g = (4031177264, 51.5368549, -0.1256275)
    nodes, ways = _tables(
        spark,
        [a, b, c, d, e, f, g],
        [(222021577, [a[0], b[0], c[0], d[0], a[0]], {})],
    )
    world = _world(nodes, ways)
    assert _cap_hits(world, "area", f[1], f[2], 10.0) == []

    rewrites = spark.createDataFrame(
        [(222021577, [a[0], b[0], e[0], f[0], a[0]])], "id long, refs array<long>"
    )
    world2, _, ways2 = osm_src.apply_osm_mutations(
        world, nodes, ways, way_rewrites=rewrites
    )
    assert _cap_hits(world2, "area", f[1], f[2], 10.0) == ["area/osm/222021577"]
    # FindReferences(a, Path): the way still references point a
    refs = (
        ways2.select("id", F.explode("refs").alias("nid"))
        .filter(F.col("nid") == a[0])
        .select("id").distinct().collect()
    )
    assert [r["id"] for r in refs] == [222021577]


def test_modify_path_retains_intersections(spark):
    """TestModifyPathWithIntersectionsInExistingWorld: rewriting ad from
    [a,b,c,d] to [a,c,d] keeps the shared vertex c, so both ways stay
    reachable from c."""
    a = (6083741698, 51.5352814, -0.1266217)
    b = (7787634237, 51.5354236, -0.1267632)
    c = (6083735356, 51.5355776, -0.1268618)
    d = (6083735379, 51.5361482, -0.1264835)
    e = (7787634210, 51.5355869, -0.1269299)
    nodes, ways = _tables(
        spark,
        [a, b, c, d, e],
        [(647895239, [a[0], b[0], c[0], d[0]], {}), (647895212, [e[0], c[0]], {})],
    )
    world = _world(nodes, ways)

    def reachable_from_c(w):
        return sorted(
            r["id"]
            for r in w.select("id", F.explode("refs").alias("nid"))
            .filter(F.col("nid") == c[0])
            .select("id").distinct().collect()
        )

    assert reachable_from_c(ways) == [647895212, 647895239]
    rewrites = spark.createDataFrame(
        [(647895239, [a[0], c[0], d[0]])], "id long, refs array<long>"
    )
    world2, _, ways2 = osm_src.apply_osm_mutations(
        world, nodes, ways, way_rewrites=rewrites
    )
    assert reachable_from_c(ways2) == [647895212, 647895239]
    # and the rewritten path's packed geometry shrank to three vertices
    row = world2.filter(F.col("feature_id") == "path/osm/647895239").collect()
    assert len(row) == 1 and len(row[0]["xs"]) == 3


def test_rewrite_can_flip_path_to_area(spark):
    """A rewrite that closes an open way re-runs the normal assembly
    rule (osm.go:357): the path row disappears, an area row appears."""
    a = (1, 51.5350, -0.1250)
    b = (2, 51.5351, -0.1249)
    c = (3, 51.5352, -0.1251)
    nodes, ways = _tables(spark, [a, b, c], [(10, [1, 2, 3], {})])
    world = _world(nodes, ways)
    assert world.filter(F.col("feature_id") == "path/osm/10").count() == 1

    rewrites = spark.createDataFrame([(10, [1, 2, 3, 1])], "id long, refs array<long>")
    world2, _, _ = osm_src.apply_osm_mutations(world, nodes, ways, way_rewrites=rewrites)
    assert world2.filter(F.col("feature_id") == "path/osm/10").count() == 0
    rows = world2.filter(F.col("feature_id") == "area/osm/10").collect()
    assert len(rows) == 1 and len(rows[0]["xs"]) == 3  # closing vertex dropped


def test_point_move_invalidating_area_fails(spark):
    """ValidateUpdatingPointLocationsWillFailIfAreasAreInvalidated:
    moving point c of the Western Shed to the Lewis Cubitt fountain
    makes the polygon self-intersect; validate=True rejects it."""
    a = (2309943873, 51.5373249, -0.1251784)
    b = (2309943847, 51.5357239, -0.1258568)
    c = (2309943846, 51.5356657, -0.1254957)
    d = (2309943872, 51.5372656, -0.1248160)
    nodes, ways = _tables(
        spark, [a, b, c, d], [(222021577, [a[0], b[0], c[0], d[0], a[0]], {})]
    )
    world = _world(nodes, ways)
    moves = spark.createDataFrame(
        [(c[0], 51.5368549, -0.1256275)], "id long, lat double, lon double"
    )
    with pytest.raises(ValueError, match="self-intersecting"):
        osm_src.apply_osm_mutations(
            world, nodes, ways, node_moves=moves, validate=True
        )
    # a benign move of the same point passes validation
    ok = spark.createDataFrame(
        [(c[0], 51.5356600, -0.1254900)], "id long, lat double, lon double"
    )
    world2, _, _ = osm_src.apply_osm_mutations(
        world, nodes, ways, node_moves=ok, validate=True
    )
    assert world2.filter(F.col("feature_id") == "area/osm/222021577").count() == 1


def test_path_rewrite_invalidating_area_fails(spark):
    """ValidateUpdatingPathWillFailIfAreasAreInvalidated: replacing
    vertex c with the fountain e self-intersects the ring."""
    a = (2309943873, 51.5373249, -0.1251784)
    b = (2309943847, 51.5357239, -0.1258568)
    c = (2309943846, 51.5356657, -0.1254957)
    d = (2309943872, 51.5372656, -0.1248160)
    e = (4031177264, 51.5368549, -0.1256275)
    nodes, ways = _tables(
        spark, [a, b, c, d, e], [(222021577, [a[0], b[0], c[0], d[0], a[0]], {})]
    )
    world = _world(nodes, ways)
    rewrites = spark.createDataFrame(
        [(222021577, [a[0], b[0], e[0], d[0], a[0]])], "id long, refs array<long>"
    )
    with pytest.raises(ValueError, match="self-intersecting"):
        osm_src.apply_osm_mutations(
            world, nodes, ways, way_rewrites=rewrites, validate=True
        )


def test_update_relations_by_feature(spark):
    """ValidateUpdateRelationsByFeatureWhenChangingRelations
    (mutable_test.go:353-392): membership queries follow the CURRENT
    relation row -- replacing the relation feature IS the index update."""
    from diagonal_b6_spark.operators import change as change_ops
    from diagonal_b6_spark.operators import find as find_ops

    schema = (
        "feature_id string, feature_type string, ns string, "
        "tags map<string,string>"
    )
    world = spark.createDataFrame(
        [
            ("path/osm/807925586", "path", "osm", {}),
            ("path/osm/558345068", "path", "osm", {}),
            (
                "relation/osm/11139964",
                "relation",
                "osm",
                {"type": "route", "member:0": "path/osm/807925586"},
            ),
        ],
        schema,
    )
    hit = find_ops.find_relations_by_feature(world, "path/osm/807925586").collect()
    assert [r["feature_id"] for r in hit] == ["relation/osm/11139964"]
    assert find_ops.find_relations_by_feature(world, "path/osm/558345068").count() == 0

    # swap the member to bc by replacing the relation feature
    modified = spark.createDataFrame(
        [
            (
                "relation/osm/11139964",
                "relation",
                "osm",
                {"type": "route", "member:0": "path/osm/558345068"},
            )
        ],
        schema,
    )
    world2 = change_ops.overlay_world(world, modified)
    hit = find_ops.find_relations_by_feature(world2, "path/osm/558345068").collect()
    assert [r["feature_id"] for r in hit] == ["relation/osm/11139964"]
    assert find_ops.find_relations_by_feature(world2, "path/osm/807925586").count() == 0


def test_mutation_plan_has_no_nested_loop_join(spark):
    """The stale-removal anti-join must be a broadcast HASH join on
    (_val, _kind) -- the array_contains form degrades to a nested-loop
    join over the whole world snapshot."""
    a = (1, 51.5350, -0.1250)
    b = (2, 51.5351, -0.1249)
    nodes, ways = _tables(spark, [a, b], [(10, [1, 2], {})])
    world = _world(nodes, ways)
    moves = spark.createDataFrame([(1, 51.6, -0.2)], "id long, lat double, lon double")
    w2, _, _ = osm_src.apply_osm_mutations(world, nodes, ways, node_moves=moves)
    plan = w2._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
