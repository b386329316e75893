"""End-to-end mirror of cmd/b6-connect (b6-connect.go): street-network
gating, the default connect query, point and area connection, access
clustering, and path modification -- over a closed-form scene where
every projection is checkable by hand.

Scene (lat ~51.535, 1 deg lng ~ 69.27 km):
  highway    3-vertex straight street, 692 m long  -> in network
  stub       short isolated #highway, 138 m        -> NOT in network
  shop       point 10 m north of the highway       -> connects (itself
             the entrance)
  building   20 m square, north side 23 m south of the highway
             -> connects via the north-side midpoint
  cafe a/b   two #amenity points whose accesses land ~2.4 m apart on
             the highway -> clustered into one access vertex
  far        #building 200 m south -> outside the 100 m threshold
  lonely     #amenity next to the stub only -> no connection (the stub
             is not street network)
  fountain   untagged point -> not a connect target
"""

import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark import fixtures
from diagonal_b6_spark.operators import network as net


HIGHWAY = "path/test/1"
STUB = "path/test/2"


@pytest.fixture(scope="module")
def world(spark):
    rows = [
        (HIGHWAY, "path", "test", {"#highway": "primary"},
         [-0.1300, -0.1250, -0.1200], [51.5350, 51.5350, 51.5350], [0]),
        (STUB, "path", "test", {"#highway": "service"},
         [-0.1295, -0.1275], [51.5310, 51.5310], [0]),
        ("point/test/10", "point", "test", {"#shop": "bakery"},
         [-0.1260], [51.53509], [0]),
        ("area/test/20", "area", "test", {"#building": "yes"},
         [-0.12414, -0.12386, -0.12386, -0.12414],
         [51.53461, 51.53461, 51.53479, 51.53479], [0]),
        ("point/test/31", "point", "test", {"#amenity": "cafe"},
         [-0.12550], [51.53510], [0]),
        ("point/test/32", "point", "test", {"#amenity": "cafe"},
         [-0.125465], [51.53510], [0]),
        ("area/test/40", "area", "test", {"#building": "yes"},
         [-0.12414, -0.12386, -0.12386, -0.12414],
         [51.53301, 51.53301, 51.53319, 51.53319], [0]),
        ("point/test/50", "point", "test", {"#amenity": "bar"},
         [-0.1285], [51.53105], [0]),
        ("point/test/60", "point", "test", {"natural": "water"},
         [-0.1262], [51.53505], [0]),
    ]
    return spark.createDataFrame(rows, fixtures.FEATURE_SCHEMA)


@pytest.fixture(scope="module")
def result(world):
    return net.connect_world(world)


def test_network_membership(result):
    got = {r["path_id"]: r["in_network"] for r in result["network"].collect()}
    assert got == {HIGHWAY: True, STUB: False}


def test_connected_set(result):
    rows = {r["feature_id"]: r for r in result["connections"].collect()}
    assert set(rows) == {
        "point/test/10", "area/test/20", "point/test/31", "point/test/32"
    }
    # every access lands on the street-network path
    assert {r["path_id"] for r in rows.values()} == {HIGHWAY}


def test_point_connection_is_its_own_entrance(result):
    shop = {r["feature_id"]: r for r in result["connections"].collect()}[
        "point/test/10"
    ]
    assert (shop["entrance_lat"], shop["entrance_lng"]) == (51.53509, -0.1260)
    # projects straight down onto the street: ~10 m
    assert shop["access_lat"] == pytest.approx(51.5350, abs=1e-9)
    assert shop["access_lng"] == pytest.approx(-0.1260, abs=1e-9)
    assert shop["dist_m"] == pytest.approx(10.0, abs=0.5)


def test_area_connects_via_best_side_midpoint(result):
    b = {r["feature_id"]: r for r in result["connections"].collect()}[
        "area/test/20"
    ]
    # north side midpoint (ConnectArea probes every side, keeps the
    # closest projection)
    assert b["entrance_lat"] == pytest.approx(51.53479, abs=1e-9)
    assert b["entrance_lng"] == pytest.approx(-0.1240, abs=1e-7)
    assert b["access_lat"] == pytest.approx(51.5350, abs=1e-9)
    assert b["access_lng"] == pytest.approx(-0.1240, abs=1e-7)
    assert b["dist_m"] == pytest.approx(23.4, abs=0.5)


def test_close_accesses_cluster(result):
    kinds = {
        r["point_id"]: r["kind"] for r in result["clustered"].collect()
    }
    pair = {kinds["access/point/test/31"], kinds["access/point/test/32"]}
    assert pair == {"new", "point"}  # one survives, one merges into it
    assert kinds["access/point/test/10"] == "new"
    assert kinds["access/area/test/20"] == "new"


def test_modified_path_gains_access_vertices(result):
    rows = {r["feature_id"]: r for r in result["modified_paths"].collect()}
    hw = rows[HIGHWAY]
    # 3 originals + shop + merged cafe pair + building = 6
    assert hw["n_vertices"] == 6
    labels = list(hw["labels"])
    assert labels[0] == "v0" and labels[3] == "v1" and labels[5] == "v2"
    assert labels[1] == "access/point/test/10"          # ~277 m along
    assert labels[2].startswith("access/point/test/3")  # merged pair rep
    assert labels[4] == "access/area/test/20"           # ~415 m along
    # the untouched stub passes through unchanged
    assert rows[STUB]["n_vertices"] == 2


def test_along_matches_haversine_prefix(result):
    import numpy as np

    from diagonal_b6_spark.kernels import geom

    c = {r["feature_id"]: r for r in result["connections"].collect()}
    # shop projects onto segment 0 at lng -0.1260; along = hav(start, proj)
    want = float(
        geom.haversine_m(
            np.array([51.5350]), np.array([-0.1300]),
            np.array([51.5350]), np.array([-0.1260]),
        )[0]
    )
    assert c["point/test/10"]["along_m"] == pytest.approx(want, abs=1e-6)
    assert c["point/test/10"]["seg_idx"] == 0
    # building projects onto segment 1: full segment 0 plus the partial hop
    seg0 = float(
        geom.haversine_m(
            np.array([51.5350]), np.array([-0.1300]),
            np.array([51.5350]), np.array([-0.1250]),
        )[0]
    )
    hop = float(
        geom.haversine_m(
            np.array([51.5350]), np.array([-0.1250]),
            np.array([51.5350]), np.array([-0.1240]),
        )[0]
    )
    assert c["area/test/20"]["seg_idx"] == 1
    assert c["area/test/20"]["along_m"] == pytest.approx(seg0 + hop, abs=1e-6)
