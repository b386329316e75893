"""Parity against the reference's OWN binary test fixtures.

Round 3/4 proved the PBF, shapefile and GTFS readers on fixtures we
encode ourselves (encoder round-trips).  These tests go one step
further: they consume the reference repo's real checked-in data files
-- produced by real-world encoders (osmium-era PBF writers, a real TfGM
GTFS export), not by our own code -- and pin the exact expectations the
reference's Go tests assert on the same files:

  * london-boundaries.osm.pbf -> relation 65606 (Greater London)
    assembles to a polygon with exactly 2 loops whose spherical area is
    within 10% of 1500 km^2 (osm/polygons_test.go:51-75,
    TestBoundaryRelationToPolygon).
  * gtfs-manchester -> stop 1800NB04091 at (53.48348, -2.24705) tagged
    #gtfs=stop (ingest/gtfs/gtfs_test.go:24-45, TestGTFSWorldPoint) and
    the consolidated connection 1800NB04431 -> 1800NB04091 with
    gtfs:peak=180 / gtfs:off-peak=120 seconds
    (gtfs_test.go:47-66, TestGTFSWorldPath).
  * granary-square.osm.pbf / camden.osm.pbf -> structural invariants of
    a real extract (non-empty element tables, way refs resolving against
    the node table, known tags present).

The fixture directory is read-only; nothing here writes outside /tmp.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from diagonal_b6_spark.kernels.geom import spherical_ring_area_m2
from diagonal_b6_spark.sources.gtfs import (
    gtfs_connections,
    gtfs_features,
    read_gtfs,
)
from diagonal_b6_spark.sources.osm import relations_to_polygons, ways_to_features
from diagonal_b6_spark.sources.pbf import read_pbf

REF_DATA = "/root/reference/data/tests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixture directory not present"
)


def test_london_boundary_relation_to_polygon(spark):
    """TestBoundaryRelationToPolygon (osm/polygons_test.go:51-75):
    relation 65606 -> 2 loops, spherical area within 10% of 1500 km^2."""
    dfs = read_pbf(spark, f"{REF_DATA}/london-boundaries.osm.pbf")
    rows = relations_to_polygons(
        dfs["nodes"], dfs["ways"], dfs["relations"], relation_ids=[65606]
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.tags["name"] == "London"
    assert len(r.ring_offsets) == 2  # reference: polygon.NumLoops() == 2
    offs = list(r.ring_offsets) + [len(r.xs)]
    area = 0.0
    for i in range(len(offs) - 1):
        a = spherical_ring_area_m2(
            np.asarray(r.xs[offs[i] : offs[i + 1]]),
            np.asarray(r.ys[offs[i] : offs[i + 1]]),
        )
        area += a if r.ring_depths[i] % 2 == 0 else -a
    expected = 1500.0 * 1000.0 * 1000.0
    assert abs(area - expected) / expected <= 0.1
    # Structural detail the reference relies on via s2.PolygonFromLoops:
    # the hole (the City of London, the note tag says so) nests inside.
    assert r.ring_depths == [0, 1]


def test_simplify_boundary_polygon(spark):
    """TestSimplifyBoundaryPolygon (osm/polygons_test.go:283-316): the
    London boundary simplified at a 100 m^2 triangle-area budget keeps
    its area within 1% and drops >50% of the vertices of every loop."""
    from diagonal_b6_spark.operators.geo_fn import simplify_areas

    dfs = read_pbf(spark, f"{REF_DATA}/london-boundaries.osm.pbf")
    poly = relations_to_polygons(
        dfs["nodes"], dfs["ways"], dfs["relations"], relation_ids=[65606]
    ).withColumn("feature_type", F.lit("area"))
    before = poly.collect()[0]
    after = simplify_areas(poly, 100.0).collect()[0]

    def ring_bounds(r):
        offs = list(r.ring_offsets) + [len(r.xs)]
        return [(offs[i], offs[i + 1]) for i in range(len(offs) - 1)]

    def total_area(r):
        area = 0.0
        for i, (a, b) in enumerate(ring_bounds(r)):
            ra = spherical_ring_area_m2(
                np.asarray(r.xs[a:b]), np.asarray(r.ys[a:b])
            )
            area += ra if r.ring_depths[i] % 2 == 0 else -ra
        return area

    assert len(after.ring_offsets) == len(before.ring_offsets) == 2
    assert (
        abs(total_area(after) - total_area(before)) / total_area(before) <= 0.01
    )
    for (a0, b0), (a1, b1) in zip(ring_bounds(before), ring_bounds(after)):
        assert (b1 - a1) / (b0 - a0) <= 0.5, (b0 - a0, b1 - a1)


def test_london_boundaries_pbf_structure(spark):
    """A real-world PBF (zlib blobs, dense nodes, real string tables)
    decodes into consistent tables.  The extract is NOT referentially
    complete (ways clipped at the extract boundary keep refs to outside
    nodes -- measured 10.2% dangling), so the invariant is a high
    resolution fraction, not closure; the London relation itself
    resolves fully (the assembly test above proves that)."""
    dfs = read_pbf(spark, f"{REF_DATA}/london-boundaries.osm.pbf")
    n_nodes = dfs["nodes"].count()
    n_ways = dfs["ways"].count()
    n_rels = dfs["relations"].count()
    assert n_nodes > 10_000 and n_ways > 500 and n_rels > 50
    from pyspark.sql import functions as F

    refs = dfs["ways"].select(F.explode("refs").alias("id")).distinct()
    total = refs.count()
    unresolved = refs.join(dfs["nodes"].select("id"), "id", "left_anti").count()
    assert unresolved / total < 0.15


def test_granary_square_pbf_known_content(spark):
    """granary-square.osm.pbf is the fixture behind the reference's
    Granary Square tests: the fountain-square ways and their tags decode
    through our wire reader."""
    dfs = read_pbf(spark, f"{REF_DATA}/granary-square.osm.pbf")
    assert dfs["nodes"].count() > 1000
    feats = ways_to_features(dfs["nodes"], dfs["ways"])
    names = {
        r.tags.get("name")
        for r in feats.collect()
        if r.tags and r.tags.get("name")
    }
    assert "Granary Square" in names


def test_camden_pbf_smoke(spark):
    """The 3.5 MB camden extract (the reference's largest fixture)
    decodes without error and carries highways -- exercises multi-blob
    parallel decode on a file our encoder did not produce."""
    dfs = read_pbf(spark, f"{REF_DATA}/camden.osm.pbf")
    from pyspark.sql import functions as F

    n_highways = (
        dfs["ways"].where(F.col("tags")["highway"].isNotNull()).count()
    )
    assert n_highways > 1000


def test_gtfs_manchester_stop_point(spark):
    """TestGTFSWorldPoint (gtfs_test.go:24-45): stop 1800NB04091
    'Manchester City Centre, Parsonage (Stop NC)' at 53.48348,-2.24705,
    emitted as a #gtfs=stop point feature."""
    feed = read_gtfs(spark, f"{REF_DATA}/gtfs-manchester")
    row = feed["stops"].where("stop_id = '1800NB04091'").collect()
    assert len(row) == 1
    assert row[0].stop_lat == pytest.approx(53.48348)
    assert row[0].stop_lon == pytest.approx(-2.24705)
    feats = gtfs_features(feed)
    pts = [
        r
        for r in feats.where("feature_type = 'point'").collect()
        if r.tags.get("name") == "Manchester City Centre, Parsonage (Stop NC)"
    ]
    assert len(pts) == 1
    assert pts[0].tags["#gtfs"] == "stop"
    assert pts[0].xs[0] == pytest.approx(-2.24705)
    assert pts[0].ys[0] == pytest.approx(53.48348)


def test_gtfs_manchester_connection_weights(spark):
    """TestGTFSWorldPath (gtfs_test.go:47-66): the consolidated
    connection Victoria Stn Approach (1800NB04431) -> Parsonage
    (1800NB04091) carries gtfs:peak=180 and gtfs:off-peak=120 -- the
    ceil-minute averages of the observed peak/off-peak travel times."""
    feed = read_gtfs(spark, f"{REF_DATA}/gtfs-manchester")
    rows = gtfs_connections(feed).where(
        "from_stop = '1800NB04431' and to_stop = '1800NB04091'"
    ).collect()
    assert len(rows) == 1
    assert rows[0].peak_s == 180
    assert rows[0].offpeak_s == 120
