"""Sightline/viewshed: closed-form scenes (open cap, blocking wall,
enclosing box) plus the b6-style fixture ratio band."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark import fixtures
from diagonal_b6_spark.operators import sightline as sl

R = 300.0
OLAT, OLNG = 51.60, -0.30  # empty countryside (no fixture buildings)
M = sl.M_PER_DEG


def _origins(spark, pts):
    return spark.createDataFrame(
        [(k, float(la), float(ln)) for k, (la, ln) in enumerate(pts)],
        "origin_id long, lat double, lng double",
    )


def _wall(spark, lat, lng_w_m, dist_m, half_len_m):
    """A north-south wall dist_m east of (lat, lng_w_m) as an area feature."""
    kx = M * np.cos(np.radians(lat))
    x0 = float(lng_w_m + dist_m / kx)
    y0, y1 = float(lat - half_len_m / M), float(lat + half_len_m / M)
    t = float(0.5 / kx)  # 0.5 m thick
    return spark.createDataFrame(
        [("wall", "area", "t", {}, [x0, x0 + 2 * t, x0 + 2 * t, x0], [y0, y0, y1, y1], [0])],
        "feature_id string, feature_type string, ns string, tags map<string,string>, "
        "xs array<double>, ys array<double>, ring_offsets array<int>",
    )


def test_open_cap_full_visibility(spark):
    empty = _wall(spark, 0.0, 100.0, 1e6, 1.0)  # wall far away
    out = sl.sightline(_origins(spark, [(OLAT, OLNG)]), empty, radius_m=R).collect()[0]
    # n-gon area -> pi r^2 as bins -> inf; 720 bins: within 0.01%
    assert out["visible_area_m2"] == pytest.approx(np.pi * R * R, rel=1e-3)
    assert out["n_edges"] == 0


def test_enclosing_box_limits_visibility(spark):
    """Origin inside a 20 m box: visible area == box interior area."""
    half = 10.0
    kx = M * np.cos(np.radians(OLAT))
    xs = [float(v) for v in (OLNG - half / kx, OLNG + half / kx, OLNG + half / kx, OLNG - half / kx)]
    ys = [float(v) for v in (OLAT - half / M, OLAT - half / M, OLAT + half / M, OLAT + half / M)]
    box = spark.createDataFrame(
        [("box", "area", "t", {}, xs, ys, [0])],
        "feature_id string, feature_type string, ns string, tags map<string,string>, "
        "xs array<double>, ys array<double>, ring_offsets array<int>",
    )
    out = sl.sightline(_origins(spark, [(OLAT, OLNG)]), box, radius_m=R).collect()[0]
    assert out["visible_area_m2"] == pytest.approx((2 * half) ** 2, rel=2e-3)


def test_wall_blocks_sector(spark):
    """A long wall 50 m east: everything beyond it in the eastern sector is
    occluded; area must drop well below the open cap but beat the
    half-plane bound."""
    wall = _wall(spark, OLAT, OLNG, 50.0, 2000.0)
    out = sl.sightline(_origins(spark, [(OLAT, OLNG)]), wall, radius_m=R).collect()[0]
    full = np.pi * R * R
    # west half-disc + eastern strip up to the wall (~ 0.5*full + 50m strip)
    assert out["visible_area_m2"] < 0.62 * full
    assert out["visible_area_m2"] > 0.5 * full
    assert out["n_edges"] > 0


def test_fixture_scene_ratio_band(spark):
    """b6-style invariant (python/diagonal_b6/b6_test.py:252-256 asserts a
    sightline/cap area ratio band): origins inside the dense fixture
    square see a bounded fraction of the cap."""
    buildings = fixtures.features_table(spark).filter(
        F.col("tags")["#building"].isNotNull()
    )
    pts = [(51.5352, -0.1248), (51.5280, -0.1452)]  # inside square / hole centre
    out = {r["origin_id"]: r for r in sl.sightline(_origins(spark, pts), buildings, radius_m=300.0).collect()}
    for r in out.values():
        ratio = r["visible_area_m2"] / r["cap_area_m2"]
        assert 0.0 < ratio <= 1.0001
    # origin 1 sits at the hole centre: the 200 m hole ring encloses it
    assert out[1]["visible_area_m2"] == pytest.approx(200.0 * 200.0, rel=0.02)


def test_boundary_polygon_shape(spark):
    empty = _wall(spark, 0.0, 100.0, 1e6, 1.0)
    out = sl.sightline(_origins(spark, [(OLAT, OLNG)]), empty, radius_m=R, n_bins=90).collect()[0]
    assert len(out["boundary_lats"]) == 90
    # all boundary points ~R meters away
    from diagonal_b6_spark.kernels import geom
    d = geom.haversine_m(
        np.array(out["boundary_lats"]), np.array(out["boundary_lngs"]), OLAT, OLNG
    )
    assert np.allclose(d, R, rtol=5e-3)


def test_viewshed_clip_matches_sweep_scenes():
    """The clip-based v2 viewshed (cap minus shadow quads, Foster
    kernel) agrees with the angular sweep on the closed-form scenes."""
    # open cap: no edges
    area = sl.viewshed_clip_one(
        np.empty(0), np.empty(0), np.empty(0), np.empty(0), R
    )
    assert area == pytest.approx(np.pi * R * R, rel=2e-3)

    # wall 50 m east (N-S, 2000 m long): same band as the sweep test
    x = 50.0
    area = sl.viewshed_clip_one(
        np.array([x]), np.array([-2000.0]), np.array([x]), np.array([2000.0]), R
    )
    full = np.pi * R * R
    assert 0.5 * full < area < 0.62 * full

    # enclosing 20 m box: visible == box interior
    h = 10.0
    ex1 = np.array([-h, h, h, -h])
    ey1 = np.array([-h, -h, h, h])
    ex2 = np.array([h, h, -h, -h])
    ey2 = np.array([-h, h, h, -h])
    area = sl.viewshed_clip_one(ex1, ey1, ex2, ey2, R)
    assert area == pytest.approx((2 * h) ** 2, rel=2e-2)


def test_sightline_clip_algorithm_agrees(spark):
    """DataFrame op with algorithm='clip' agrees with the sweep on the
    fixture scene within discretization tolerance."""
    buildings = fixtures.features_table(spark).filter(
        F.col("tags")["#building"].isNotNull()
    )
    pts = [(51.5352, -0.1248), (51.5280, -0.1452)]
    sweep = {r["origin_id"]: r["visible_area_m2"]
             for r in sl.sightline(_origins(spark, pts), buildings, radius_m=300.0).collect()}
    clip = {r["origin_id"]: r["visible_area_m2"]
            for r in sl.sightline(_origins(spark, pts), buildings, radius_m=300.0,
                                  algorithm="clip").collect()}
    for k in sweep:
        assert clip[k] == pytest.approx(sweep[k], rel=0.05)


def test_occlude_center_close_to_edge():
    """sightline_test.go:134-146 TestOccludeWithCenterCloseToEdge: with
    the view center (51.51891,-0.09657) nearly ON the edge
    (51.51898,-0.09662)-(51.51869,-0.09539), the point
    (51.51957,-0.09439) falls inside the occlusion (NOT visible) at
    radius 250 m -- the wrap-around case the reference pins.  Behavioral
    mirror: our sweep returns r(theta) < |p| at p's bearing."""
    clat, clng = 51.51891, -0.09657
    kx = M * np.cos(np.radians(clat))

    def loc(lat, lng):
        return np.array([(lng - clng) * kx]), np.array([(lat - clat) * M])

    ax, ay = loc(51.51898, -0.09662)
    bx, by = loc(51.51869, -0.09539)
    r = sl.sweep_visibility(
        None, None,
        np.array([ax[0]]), np.array([ay[0]]),
        np.array([bx[0]]), np.array([by[0]]),
        250.0, n_bins=2880,
    )
    th = np.linspace(0.0, 2.0 * np.pi, 2880, endpoint=False)

    def r_at(px, py):
        ang = float(np.arctan2(py, px)) % (2.0 * np.pi)
        return float(r[int(round(ang / (2.0 * np.pi / 2880))) % 2880])

    px, py = loc(51.51957, -0.09439)
    d = float(np.hypot(px[0], py[0]))
    assert d < 250.0  # the probe is inside the cap
    assert r_at(px[0], py[0]) < d  # occluded: the edge cuts the ray short
    # a probe on the center's side of the edge stays visible
    qx, qy = loc(51.51895, -0.09680)
    dq = float(np.hypot(qx[0], qy[0]))
    assert r_at(qx[0], qy[0]) >= dq
