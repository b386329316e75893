"""AddFeatures validation + transactional merge, mirroring the reference's
ingest/change_test.go (TestAddPoints/Paths/Areas/Relations/Collections,
TestMergeChanges, TestMergeChangesLeavesWorldUnmodfiedFollowingError) and
ingest/validate.go semantics, with the reference's own coordinates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark.fixtures import FEATURE_SCHEMA
from diagonal_b6_spark.kernels.geom import haversine_m, ring_is_ccw
from diagonal_b6_spark.operators import change as change_ops

DELTA_SCHEMA = FEATURE_SCHEMA + ", vertex_refs array<string>"


def _pt(fid, lat, lng, tags=None):
    return {
        "feature_id": fid,
        "feature_type": "point",
        "ns": fid.rsplit("/", 1)[0],
        "tags": tags or {},
        "xs": [lng],
        "ys": [lat],
        "ring_offsets": [0],
        "vertex_refs": None,
    }


def _ref_path(fid, refs, tags=None):
    return {
        "feature_id": fid,
        "feature_type": "path",
        "ns": fid.rsplit("/", 1)[0],
        "tags": tags or {},
        "xs": [],
        "ys": [],
        "ring_offsets": [0],
        "vertex_refs": refs,
    }


def _empty_world(spark):
    return spark.createDataFrame([], FEATURE_SCHEMA)


# change_test.go:11-39 TestAddPoints -- the reference's exact coordinates.
def test_add_points(spark):
    world = _empty_world(spark)
    delta = spark.createDataFrame(
        [
            _pt("point/openstreetmap.org/node/6082053666", 51.5366467, -0.1263796),
            _pt("point/diagonal.works/ns/private/1", 51.5351906, -0.1245464),
        ],
        DELTA_SCHEMA,
    )
    out = change_ops.apply_changes(world, delta)
    rows = {r["feature_id"]: r for r in out.collect()}
    assert len(rows) == 2
    got = rows["point/diagonal.works/ns/private/1"]
    assert haversine_m(got["ys"][0], got["xs"][0], 51.5351906, -0.1245464) < 1.0


# change_test.go:41-84 TestAddPaths: the path's vertex references resolve to
# a point already in the world AND a point added by the same change.
def test_add_paths_resolves_references(spark):
    world = spark.createDataFrame(
        [_pt("point/openstreetmap.org/node/6082053666", 51.5366467, -0.1263796)],
        DELTA_SCHEMA,
    ).drop("vertex_refs")
    delta = spark.createDataFrame(
        [
            _pt("point/diagonal.works/ns/private/1", 51.5351906, -0.1245464),
            _ref_path(
                "path/diagonal.works/ns/private/1/1",
                [
                    "point/openstreetmap.org/node/6082053666",
                    "point/diagonal.works/ns/private/1",
                ],
            ),
        ],
        DELTA_SCHEMA,
    )
    out = change_ops.apply_changes(world, delta)
    path = out.filter(F.col("feature_type") == "path").collect()[0]
    assert len(path["xs"]) == 2
    # vertex 0 = the world point, vertex 1 = the in-delta point
    assert haversine_m(path["ys"][0], path["xs"][0], 51.5366467, -0.1263796) < 1.0
    assert haversine_m(path["ys"][1], path["xs"][1], 51.5351906, -0.1245464) < 1.0


# change_test.go:85-122 TestAddAreas: a closed ring over the reference's
# three points (plus implicit closure) becomes a valid area; CCW enforced.
def test_add_area_ring_from_reference_points(spark):
    world = _empty_world(spark)
    pts = [
        ("point/openstreetmap.org/node/4270651271", 51.5354124, -0.1243817),
        ("point/openstreetmap.org/node/5693730034", 51.5353117, -0.1244943),
        ("point/diagonal.works/ns/private/1", 51.5353736, -0.1242415),
    ]
    ring_refs = [p[0] for p in pts] + [pts[0][0]]
    delta = spark.createDataFrame(
        [_pt(*p) for p in pts]
        + [_ref_path("path/diagonal.works/ns/private/1/1", ring_refs)],
        DELTA_SCHEMA,
    )
    out = change_ops.apply_changes(world, delta, invert_clockwise_paths=True)
    path = out.filter(F.col("feature_type") == "path").collect()[0]
    assert len(path["xs"]) == 4 and path["xs"][0] == path["xs"][-1]
    assert ring_is_ccw(path["xs"][:-1], path["ys"][:-1])


# validate.go:47-59: a clockwise closed path is rejected unless
# InvertClockwisePaths, in which case it inverts.
def test_clockwise_closed_path(spark):
    world = _empty_world(spark)
    pts = [
        ("point/test/1", 51.0, 0.0),
        ("point/test/2", 51.001, 0.0),
        ("point/test/3", 51.001, 0.0015),  # clockwise winding
    ]
    refs = [p[0] for p in pts] + [pts[0][0]]
    delta = spark.createDataFrame(
        [_pt(*p) for p in pts] + [_ref_path("path/test/9", refs)], DELTA_SCHEMA
    )
    with pytest.raises(change_ops.ChangeApplyError, match="ordered clockwise"):
        change_ops.apply_changes(world, delta)
    out = change_ops.apply_changes(world, delta, invert_clockwise_paths=True)
    path = out.filter(F.col("feature_type") == "path").collect()[0]
    assert ring_is_ccw(path["xs"][:-1], path["ys"][:-1])


# validate.go:41-43: paths need at least two vertices.
def test_short_path_rejected(spark):
    world = _empty_world(spark)
    delta = spark.createDataFrame(
        [
            _pt("point/test/1", 51.0, 0.0),
            _ref_path("path/test/1", ["point/test/1"]),
        ],
        DELTA_SCHEMA,
    )
    with pytest.raises(change_ops.ChangeApplyError, match="1 points, expected 2 or more"):
        change_ops.apply_changes(world, delta)


# ValidatePathForArea: area rings need >= 3 vertices (packed, no closing dup).
def test_degenerate_area_ring_rejected(spark):
    world = _empty_world(spark)
    delta = spark.createDataFrame(
        [
            {
                "feature_id": "area/test/1",
                "feature_type": "area",
                "ns": "test",
                "tags": {},
                "xs": [0.0, 0.001],
                "ys": [51.0, 51.0],
                "ring_offsets": [0],
                "vertex_refs": None,
            }
        ],
        DELTA_SCHEMA,
    )
    with pytest.raises(change_ops.ChangeApplyError, match="expected 3 or more"):
        change_ops.apply_changes(world, delta)


# change_test.go:180-209 TestMergeChanges: change 2's path references points
# added by change 1; the stitched path is ~200 m long.
def test_merge_changes_cross_reference(spark):
    world = _empty_world(spark)
    add1 = spark.createDataFrame(
        [
            _pt("point/diagonal.works/test/1", 51.5366467, -0.1263796),
            _pt("point/diagonal.works/test/2", 51.5351906, -0.1245464),
        ],
        DELTA_SCHEMA,
    )
    add2 = spark.createDataFrame(
        [
            _ref_path(
                "path/diagonal.works/test/3",
                ["point/diagonal.works/test/1", "point/diagonal.works/test/2"],
            )
        ],
        DELTA_SCHEMA,
    )
    out = change_ops.apply_changes(world, add1, add2)
    path = out.filter(F.col("feature_type") == "path").collect()[0]
    length = float(
        haversine_m(path["ys"][0], path["xs"][0], path["ys"][1], path["xs"][1])
    )
    assert abs(length - 200.0) / 200.0 < 0.1  # the reference's 10% bound


# change_test.go:211-231: a failing change leaves the world unmodified, even
# when an earlier change in the merge was itself valid.
def test_merge_changes_transactional(spark):
    world = _empty_world(spark)
    add1 = spark.createDataFrame(
        [_pt("point/diagonal.works/test/1", 51.5366467, -0.1263796)], DELTA_SCHEMA
    )
    add2 = spark.createDataFrame(
        [
            _ref_path(
                "path/diagonal.works/test/3",
                ["point/nonexistant/0", "point/nonexistant/1"],
            )
        ],
        DELTA_SCHEMA,
    )
    with pytest.raises(change_ops.ChangeApplyError, match="missing point"):
        change_ops.apply_changes(world, add1, add2)
    # the input world DataFrame is immutable by construction; the pinned
    # semantic is that no output snapshot was produced -- the raise above.
    assert world.count() == 0


# change_test.go TestAddRelations/TestAddCollections: relations and
# collections validate by id only and land in the snapshot unchanged.
def test_add_relation_and_collection_rows(spark):
    world = _empty_world(spark)
    delta = spark.createDataFrame(
        [
            _pt("point/diagonal.works/test/1", 51.5366467, -0.1263796),
            {
                "feature_id": "relation/diagonal.works/diagonal/access-points/1",
                "feature_type": "relation",
                "ns": "diagonal.works/diagonal/access-points",
                "tags": {"member:0": "point/diagonal.works/test/1"},
                "xs": [],
                "ys": [],
                "ring_offsets": [0],
                "vertex_refs": None,
            },
            {
                "feature_id": "collection/diagonal.works/ns/private/1",
                "feature_type": "collection",
                "ns": "diagonal.works/ns/private",
                "tags": {
                    "member:0": "i dont need to be humble",
                    "member_key:0": "path/diagonal.works/diagonal/entrances/777",
                },
                "xs": [],
                "ys": [],
                "ring_offsets": [0],
                "vertex_refs": None,
            },
        ],
        DELTA_SCHEMA,
    )
    out = change_ops.apply_changes(world, delta)
    rows = {r["feature_id"]: r for r in out.collect()}
    assert rows["collection/diagonal.works/ns/private/1"]["tags"]["member:0"] == (
        "i dont need to be humble"
    )
    assert "relation/diagonal.works/diagonal/access-points/1" in rows


# Empty feature ids are invalid regardless of type (validate.go:13-15).
def test_invalid_id_rejected(spark):
    world = _empty_world(spark)
    delta = spark.createDataFrame([_pt("", 51.0, 0.0)], DELTA_SCHEMA)
    with pytest.raises(change_ops.ChangeApplyError, match="invalid ID"):
        change_ops.apply_changes(world, delta)


# validate_features itself is lazy: building the plan launches no job.
def test_validate_features_construction_is_lazy(spark):
    tracker = spark.sparkContext.statusTracker()
    world = _empty_world(spark)
    delta = spark.createDataFrame(
        [
            _pt("point/test/1", 51.0, 0.0),
            _ref_path("path/test/1", ["point/test/1", "point/test/missing"]),
        ],
        DELTA_SCHEMA,
    )
    before = len(tracker.getJobIdsForGroup(None) or [])
    resolved, errors = change_ops.validate_features(world, delta)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
    assert [r["error"] for r in errors.collect()] == [
        "Path path/test/1 missing point point/test/missing"
    ]


# Scale shape: resolving a delta's references never shuffles the world --
# the world point table is semi-filtered by the (small, broadcast)
# referenced-id set and every resolution join is a broadcast join.
def test_validate_features_plan_broadcasts_world_probe(spark):
    world = spark.createDataFrame(
        [_pt(f"point/test/{i}", 51.0 + i * 1e-4, 0.0) for i in range(64)],
        DELTA_SCHEMA,
    ).drop("vertex_refs")
    delta = spark.createDataFrame(
        [_ref_path("path/test/1", ["point/test/1", "point/test/2"])], DELTA_SCHEMA
    )
    _, errors = change_ops.validate_features(world, delta)
    plan = errors._jdf.queryExecution().executedPlan().toString()
    # world semi-filtered by the broadcast referenced-id set, the
    # delta-override anti-join broadcast, the resolution left join
    # probing only the broadcast delta-sized lookup.  (The one
    # SortMergeJoin left is delta-vs-delta -- the assembled-geometry
    # join-back -- which is the right plan for bulk-import deltas.)
    assert "LeftSemi, BuildRight" in plan
    assert "LeftAnti, BuildRight" in plan
    assert "LeftOuter, BuildRight" in plan


# Inline-geometry closed paths get the same orientation treatment as
# reference paths (validate.go validates EVERY closed path).
def test_inline_clockwise_closed_path(spark):
    world = _empty_world(spark)
    cw = {
        "feature_id": "path/test/inline",
        "feature_type": "path",
        "ns": "test",
        "tags": {},
        # clockwise square, closed by repeating the first vertex
        "xs": [0.0, 0.0, 0.0015, 0.0015, 0.0],
        "ys": [51.0, 51.001, 51.001, 51.0, 51.0],
        "ring_offsets": [0],
        "vertex_refs": None,
    }
    delta = spark.createDataFrame([cw], DELTA_SCHEMA)
    with pytest.raises(change_ops.ChangeApplyError, match="ordered clockwise"):
        change_ops.apply_changes(world, delta)
    out = change_ops.apply_changes(world, delta, invert_clockwise_paths=True)
    path = out.collect()[0]
    assert ring_is_ccw(path["xs"][:-1], path["ys"][:-1])
