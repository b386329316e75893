"""Area colouring (operators/colouring.py) vs the reference's
ingest/colouring.go + ingest/colouring_test.go."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark.operators import colouring as col

FEATURE_SCHEMA = (
    "feature_id string, feature_type string, ns string, tags map<string,string>, "
    "xs array<double>, ys array<double>, ring_offsets array<int>"
)

# data/tests/colour-areas.geojson, inlined: feature 0 shares (near-)vertices
# with 1, 1 with 2; 3 is isolated.  "Shared" means same level-21 S2 cell
# (~3 m): the fixture's coordinates differ in the low digits on purpose.
_COLOUR_AREAS_RINGS = [
    [
        (-0.12548024756694076, 51.53552639279806),
        (-0.12548024756694076, 51.535485915088884),
        (-0.12540897646698568, 51.535485915088884),
        (-0.12540897646698568, 51.53552639279806),
    ],
    [
        (-0.1254800611566509, 51.5354858759689),
        (-0.1254800611566509, 51.535447226974924),
        (-0.1254088827442672, 51.535447226974924),
        (-0.1254088827442672, 51.5354858759689),
    ],
    [
        (-0.1254800611566509, 51.535447226974924),
        (-0.1254800611566509, 51.53541200254634),
        (-0.1254088827442672, 51.53541200254634),
        (-0.1254088827442672, 51.535447226974924),
    ],
    [
        (-0.12532315415722906, 51.53552599229323),
        (-0.12532315415722906, 51.53548587565055),
        (-0.1252594475117519, 51.53548587565055),
        (-0.1252594475117519, 51.53552599229323),
    ],
]


def _fixture_features(spark):
    rows = []
    for i, ring in enumerate(_COLOUR_AREAS_RINGS):
        rows.append(
            {
                "feature_id": f"area/test/{i}",
                "feature_type": "area",
                "ns": "t",
                "tags": {"k": "v"},
                "xs": [p[0] for p in ring],
                "ys": [p[1] for p in ring],
                "ring_offsets": [0],
            }
        )
    return spark.createDataFrame(rows, schema=FEATURE_SCHEMA)


def test_reference_colour_areas_fixture(spark):
    """Mirrors ingest/colouring_test.go's TestColourAreas contract:
    neighbours coloured differently, disconnected area gets "0"."""
    feats = _fixture_features(spark)
    adj = col.area_adjacency(feats)
    edges = sorted((r.a, r.b) for r in adj.collect())
    assert edges == [
        ("area/test/0", "area/test/1"),
        ("area/test/1", "area/test/2"),
    ]
    out = col.colour_areas(feats)
    res = {r.feature_id: r.tags["b6:colour"] for r in out.collect()}
    assert res["area/test/0"] != res["area/test/1"]
    assert res["area/test/1"] != res["area/test/2"]
    assert res["area/test/3"] == "0"
    # pre-existing tags survive the map_concat
    assert all(r.tags["k"] == "v" for r in out.collect())


def test_non_area_features_pass_through(spark):
    rows = [
        {
            "feature_id": "point/test/0",
            "feature_type": "point",
            "ns": "t",
            "tags": {},
            "xs": [-0.1],
            "ys": [51.5],
            "ring_offsets": [0],
        }
    ]
    feats = spark.createDataFrame(rows, schema=FEATURE_SCHEMA)
    out = col.colour_areas(feats).collect()
    assert len(out) == 1 and "b6:colour" not in out[0].tags


def test_dsatur_proper_and_deterministic():
    """DSATUR output is a proper colouring, uses colours 0..k densely,
    and is a pure function of the edge set (order-independent)."""
    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"),
        ("e", "a"), ("b", "e"), ("f", "g"),
    ]
    pdf = pd.DataFrame(edges, columns=["a", "b"])
    r1 = col._dsatur(pdf)
    r2 = col._dsatur(pdf.iloc[::-1].reset_index(drop=True))
    m1 = dict(zip(r1.feature_id, r1.colour))
    m2 = dict(zip(r2.feature_id, r2.colour))
    assert m1 == m2
    for a, b in edges:
        assert m1[a] != m1[b]
    used = sorted(set(m1.values()))
    assert used == list(range(len(used)))


def test_dsatur_brelaz_order():
    """Brelaz: highest saturation first, then highest degree, then id.
    On a star K(1,3), the hub (degree 3) is coloured first -> colour 0;
    all leaves see it -> colour 1."""
    pdf = pd.DataFrame([("hub", "l1"), ("hub", "l2"), ("hub", "l3")], columns=["a", "b"])
    m = dict(zip(*(lambda r: (r.feature_id, r.colour))(col._dsatur(pdf))))
    assert m == {"hub": 0, "l1": 1, "l2": 1, "l3": 1}


def test_hot_cell_guard(spark):
    """> max_cell_features distinct areas in one 3 m cell raises loudly."""
    rows = [
        {
            "feature_id": f"area/test/{i}",
            "feature_type": "area",
            "ns": "t",
            "tags": {},
            "xs": [-0.125, -0.1249, -0.1249],
            "ys": [51.535, 51.535, 51.5351],
            "ring_offsets": [0],
        }
        for i in range(4)
    ]
    feats = spark.createDataFrame(rows, schema=FEATURE_SCHEMA)
    with pytest.raises(Exception, match="degenerate stacked geometry"):
        col.area_adjacency(feats, max_cell_features=3).collect()


def test_bucket_col_matches_cellmath(spark):
    """The pure-expression bucket equals kernels/cellmath's full cell id
    truncated to the level (same cell <=> same (face, i, j) prefix)."""
    import numpy as np

    from diagonal_b6_spark.kernels import cellmath as cm

    lats = np.array([51.535, 51.5352195, -33.8568, 0.0001, 89.9, -89.9, 0.0])
    lngs = np.array([-0.125, -0.1254286, 151.2153, -0.0001, 10.0, -170.0, 180.0])
    expected = cm.parent(cm.cell_id_from_latlng(lats, lngs, cm.MAX_LEVEL), 21)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lats, lngs)], "lat double, lng double"
    )
    got = [
        r.cell
        for r in df.select(col.s2_bucket_col(F.col("lat"), F.col("lng"), 21)).collect()
    ]
    # equality as a BUCKETING function: pairwise same/different must agree
    for i in range(len(got)):
        for j in range(len(got)):
            assert (got[i] == got[j]) == (expected[i] == expected[j])
