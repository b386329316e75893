"""DBSCAN operator (operators/cluster.py) on a closed-form scene where
every neighborhood is checkable by hand (eps=100 m, min_pts=3;
0.001 deg lat ~ 111.2 m, 0.001 deg lng ~ 69.3 m at 51.5N):

  blob A (1,2,3)   pairwise 33 / 34.6 / 47.8 m -> three core points,
                   cluster 1
  border (4)       79.7 m from point 3 only; own neighborhood {4,3} = 2
                   < min_pts -> border, joins cluster 1
  blob C (10-12)   blob A translated to lat 51.52 -> cluster 10
  noise (20)       alone
  pair (30,31)     34.6 m apart but n=2 < min_pts and neither is core
                   -> both noise
"""

import pytest

from diagonal_b6_spark.kernels import geom
from diagonal_b6_spark.operators.cluster import dbscan

EPS = 100.0
MIN_PTS = 3

POINTS = [
    (1, 51.5000, -0.10000),
    (2, 51.5003, -0.10000),
    (3, 51.5000, -0.09950),
    (4, 51.5000, -0.09835),
    (10, 51.5200, -0.10000),
    (11, 51.5203, -0.10000),
    (12, 51.5200, -0.09950),
    (20, 51.5400, -0.10000),
    (30, 51.5600, -0.10000),
    (31, 51.5600, -0.09950),
]


@pytest.fixture(scope="module")
def result(spark):
    pts = spark.createDataFrame(POINTS, "pid long, lat double, lng double")
    rows = dbscan(pts, EPS, MIN_PTS, id_col="pid").collect()
    return {r["pid"]: r for r in rows}


def test_scene_distances_are_as_documented():
    assert 30 < geom.haversine_m(51.5000, -0.1, 51.5003, -0.1) < 36
    assert 30 < geom.haversine_m(51.5, -0.1, 51.5, -0.0995) < 36
    d43 = float(geom.haversine_m(51.5, -0.09835, 51.5, -0.0995))
    assert 75 < d43 < EPS
    d41 = float(geom.haversine_m(51.5, -0.09835, 51.5, -0.1))
    assert d41 > EPS


def test_every_point_labelled(result):
    assert set(result) == {p[0] for p in POINTS}


def test_core_flags(result):
    core = {pid for pid, r in result.items() if r["is_core"]}
    assert core == {1, 2, 3, 10, 11, 12}


def test_neighbor_counts(result):
    # self-inclusive counts: 3 gains the border point, 4 sees {4, 3}
    assert result[1]["n_nbrs"] == 3
    assert result[3]["n_nbrs"] == 4
    assert result[4]["n_nbrs"] == 2
    assert result[20]["n_nbrs"] == 1
    assert result[30]["n_nbrs"] == 2


def test_clusters_and_noise(result):
    got = {pid: r["cluster"] for pid, r in result.items()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: None, 30: None, 31: None,
    }


@pytest.mark.parametrize("lat0,lat1,seed", [(51.0, 51.2, 7), (78.0, 79.5, 11)])
def test_matches_brute_force(spark, lat0, lat1, seed):
    """Grid-join DBSCAN == brute-force DBSCAN on random points,
    including a 78-79.5N band where the longitude cell margin must
    widen by 1/cos(lat) for the eps guarantee to hold."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = 80
    lats = rng.uniform(lat0, lat1, n)
    lngs = rng.uniform(-0.5, 0.5, n)
    eps, min_pts = 4000.0, 3

    within = np.zeros((n, n), dtype=bool)
    for i in range(n):
        within[i] = geom.haversine_m(lats, lngs, lats[i], lngs[i]) <= eps
    cnt = within.sum(1)
    core = cnt >= min_pts
    # components of core points under `within`, label = min core id
    lbl = {i: i for i in range(n) if core[i]}
    changed = True
    while changed:
        changed = False
        for i in lbl:
            for j in lbl:
                if within[i][j] and lbl[j] < lbl[i]:
                    lbl[i] = lbl[j]
                    changed = True
    cluster = {}
    for i in range(n):
        if core[i]:
            cluster[i] = lbl[i]
        else:
            cores_near = [lbl[j] for j in np.where(within[i] & core)[0]]
            cluster[i] = min(cores_near) if cores_near else None

    pts = spark.createDataFrame(
        [(i, float(lats[i]), float(lngs[i])) for i in range(n)],
        "pid long, lat double, lng double",
    )
    got = {r["pid"]: r for r in dbscan(pts, eps, min_pts, id_col="pid").collect()}
    assert len(got) == n
    for i in range(n):
        assert got[i]["n_nbrs"] == int(cnt[i]), i
        assert got[i]["is_core"] == bool(core[i]), i
        assert got[i]["cluster"] == cluster[i], i


def test_isolated_core_labels_itself(spark):
    """A 3-point blob whose members all see only each other still forms
    a cluster; a core point with zero CORE neighbors (min_pts=1 ->
    every point core, all isolated) labels itself."""
    pts = spark.createDataFrame(
        [(7, 51.5, -0.1), (9, 51.6, -0.1)], "pid long, lat double, lng double"
    )
    rows = {r["pid"]: r for r in dbscan(pts, 50.0, 1, id_col="pid").collect()}
    assert rows[7]["is_core"] and rows[7]["cluster"] == 7
    assert rows[9]["is_core"] and rows[9]["cluster"] == 9
