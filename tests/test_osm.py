"""OSM-shaped assembly: ways -> paths/areas, multipolygon relations ->
multi-ring areas (reference parity target: b6/osm/polygons.go ring
assembly), against synthetic PBF-shaped tables."""

import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark.operators import geo_fn
from diagonal_b6_spark.sources import osm

NODE_SCHEMA = "id long, lat double, lon double"
WAY_SCHEMA = "id long, refs array<long>, tags map<string,string>"
REL_SCHEMA = (
    "id long, members array<struct<type:string, ref:long, role:string>>, "
    "tags map<string,string>"
)


def _nodes(spark):
    # a 3x3 grid of nodes at ~51.5
    rows = []
    for i in range(3):
        for j in range(3):
            rows.append((i * 3 + j, 51.5 + i * 0.001, -0.1 + j * 0.001))
    # inner-square nodes for the hole relation
    rows += [(100, 51.5003, -0.0997), (101, 51.5003, -0.0993),
             (102, 51.5007, -0.0993), (103, 51.5007, -0.0997)]
    return spark.createDataFrame(rows, NODE_SCHEMA)


def test_closed_way_becomes_area(spark):
    """The reference's exact classification (ingest/osm.go:214-216,357):
    ANY closed way is an area -- including an untagged barrier loop --
    and any open way a path.  No tag check."""
    ways = spark.createDataFrame(
        [
            (1, [0, 2, 8, 6, 0], {"building": "yes"}),   # closed square -> area
            (2, [0, 1, 2], {"highway": "primary"}),      # open -> path
            (3, [0, 2, 8, 6, 0], {"barrier": "fence"}),  # closed -> area too
        ],
        WAY_SCHEMA,
    )
    out = {r["feature_id"]: r for r in osm.ways_to_features(_nodes(spark), ways).collect()}
    assert out["area/osm/1"]["feature_type"] == "area"
    assert len(out["area/osm/1"]["xs"]) == 4  # closing vertex dropped
    assert out["path/osm/2"]["feature_type"] == "path"
    assert out["path/osm/2"]["xs"] == [-0.1, -0.099, -0.098]
    assert out["area/osm/3"]["feature_type"] == "area"


def test_way_vertex_order_preserved(spark):
    ways = spark.createDataFrame([(9, [6, 4, 2], {"highway": "x"})], WAY_SCHEMA)
    out = osm.ways_to_features(_nodes(spark), ways).collect()[0]
    # refs 6 (51.502,-0.1), 4 (51.501,-0.099), 2 (51.5,-0.098) in order
    assert out["ys"] == [51.502, 51.501, 51.5]


def test_multipolygon_relation_stitches_rings(spark):
    # outer square split across TWO open ways (stitching required), with
    # one of them REVERSED; inner hole as one closed way
    ways = spark.createDataFrame(
        [
            (10, [0, 2, 8], {}),        # half of the outer ring
            (11, [0, 6, 8], {}),        # other half, shares endpoints 0/8
            (12, [100, 101, 102, 103, 100], {}),  # hole ring (closed)
        ],
        WAY_SCHEMA,
    )
    rels = spark.createDataFrame(
        [
            (
                5,
                [
                    {"type": "way", "ref": 10, "role": "outer"},
                    {"type": "way", "ref": 11, "role": "outer"},
                    {"type": "way", "ref": 12, "role": "inner"},
                ],
                {"type": "multipolygon", "landuse": "forest"},
            )
        ],
        REL_SCHEMA,
    )
    out = osm.relations_to_areas(_nodes(spark), ways, rels).collect()
    assert len(out) == 1
    area = out[0]
    assert area["feature_id"] == "area/osm/r5"
    assert area["ring_offsets"] == [0, 4]  # outer ring (4 verts) + hole
    assert len(area["xs"]) == 8
    # outer ring area > hole area, and the PIP operator sees the hole
    from diagonal_b6_spark.operators import spatial_join
    import pandas as pd

    areas_df = osm.relations_to_areas(_nodes(spark), ways, rels)
    pts = spark.createDataFrame(
        [(1, 51.5005, -0.0995), (2, 51.5010, -0.0990)],  # 1 = in hole, 2 = in solid
        "pid long, lat double, lng double",
    )
    hits = spatial_join.containment_join_broadcast(pts, areas_df, point_id="pid").collect()
    assert [r["pid"] for r in hits] == [2]


def test_unclosable_chain_discarded(spark):
    ways = spark.createDataFrame([(20, [0, 1], {}), (21, [7, 8], {})], WAY_SCHEMA)
    rels = spark.createDataFrame(
        [
            (
                6,
                [
                    {"type": "way", "ref": 20, "role": "outer"},
                    {"type": "way", "ref": 21, "role": "outer"},
                ],
                {"type": "multipolygon"},
            )
        ],
        REL_SCHEMA,
    )
    assert osm.relations_to_areas(_nodes(spark), ways, rels).count() == 0
