"""Polygon boolean kernel: closed-form rectangle/triangle/concave cases
(reference parity target: b6/geometry/foster.go clip semantics)."""

import numpy as np
import pytest

from diagonal_b6_spark.kernels import clip as C


def _rect(x0, y0, x1, y1):
    return np.array([x0, x1, x1, x0]), np.array([y0, y0, y1, y1])


def _area(rings):
    return sum(abs(C.ring_area(xs, ys)) for xs, ys in rings)


def test_overlapping_rects_intersection():
    a = _rect(0, 0, 4, 4)
    b = _rect(2, 1, 6, 3)
    out = C.clip(*a, *b, "intersection")
    assert len(out) == 1
    assert _area(out) == pytest.approx(2 * 2)  # overlap = [2,4]x[1,3]


def test_overlapping_rects_union_and_difference():
    a = _rect(0, 0, 4, 4)
    b = _rect(2, 1, 6, 3)
    assert _area(C.clip(*a, *b, "union")) == pytest.approx(16 + 8 - 4)
    assert _area(C.clip(*a, *b, "difference")) == pytest.approx(16 - 4)
    assert _area(C.clip(*b, *a, "difference")) == pytest.approx(8 - 4)


def test_contained_and_disjoint():
    outer = _rect(0, 0, 10, 10)
    inner = _rect(2, 2, 3, 3)
    far = _rect(20, 20, 21, 21)
    assert _area(C.clip(*inner, *outer, "intersection")) == pytest.approx(1.0)
    assert _area(C.clip(*outer, *inner, "intersection")) == pytest.approx(1.0)
    assert C.clip(*inner, *far, "intersection") == []
    assert _area(C.clip(*inner, *far, "union")) == pytest.approx(2.0)
    assert _area(C.clip(*inner, *outer, "difference")) == pytest.approx(0.0, abs=1e-12)


def test_concave_subject_two_components():
    """Clipping a C-shape with a bar across its opening yields TWO
    disjoint intersection pieces."""
    # C-shape: outer 0..3 x 0..3 with a notch [1,3]x[1,2] removed
    sx = np.array([0, 3, 3, 1, 1, 3, 3, 0], dtype=float)
    sy = np.array([0, 0, 1, 1, 2, 2, 3, 3], dtype=float)
    # vertical bar crossing both arms
    bx, by = _rect(1.5, -1, 2.5, 4)
    out = C.clip(sx, sy, bx, by, "intersection")
    assert len(out) == 2
    assert _area(out) == pytest.approx(2 * 1.0)  # two 1x1 arm pieces


def test_triangle_rect_intersection():
    tx = np.array([0.0, 4.0, 0.0])
    ty = np.array([0.0, 0.0, 4.0])
    rx, ry = _rect(-1, -1, 2, 2)
    out = C.clip(tx, ty, rx, ry, "intersection")
    # clipped region: triangle cut at x<=2, y<=2 -> area 16/2 - small tri
    # region = {x,y>=0, x+y<=4, x<=2, y<=2}: square 2x2 shaved? compute:
    # full tri area 8; removed: x>2 part (tri with verts (2,0),(4,0),(2,2)) = 2
    # and y>2 part (symmetric) = 2 -> 4
    assert _area(out) == pytest.approx(4.0)


def test_degenerate_shared_edge_perturbs():
    a = _rect(0, 0, 2, 2)
    b = _rect(2, 0, 4, 2)  # shares the x=2 edge exactly
    out = C.clip(*a, *b, "intersection")
    assert _area(out) == pytest.approx(0.0, abs=1e-6)


def test_latlng_scale_fixture():
    """Realistic coordinates: 400 m square at lat 51.5 clipped by an
    offset window; area ratio is exact in degree space."""
    k = 200.0 / 111195.0
    a = _rect(-0.125 - k, 51.535 - k, -0.125 + k, 51.535 + k)
    b = _rect(-0.125, 51.535 - 2 * k, -0.125 + 2 * k, 51.535 + 2 * k)
    out = C.clip(*a, *b, "intersection")
    assert _area(out) == pytest.approx(abs(C.ring_area(*a)) / 2, rel=1e-9)


def test_union_all_merges_chain():
    """Three overlapping squares in a row merge to ONE ring with the
    inclusion-exclusion area; a distant square stays separate."""
    rings = [_rect(0, 0, 2, 2), _rect(1, 0, 3, 2), _rect(2.5, 0, 4, 2), _rect(10, 10, 11, 11)]
    out = C.union_all([(xs, ys) for xs, ys in rings])
    assert len(out) == 2
    areas = sorted(abs(C.ring_area(xs, ys)) for xs, ys in out)
    assert areas[0] == pytest.approx(1.0)   # the distant unit square
    assert areas[1] == pytest.approx(8.0)   # 0..4 x 0..2 fully covered


def test_union_all_disjoint_passthrough():
    rings = [_rect(0, 0, 1, 1), _rect(5, 5, 6, 6)]
    out = C.union_all(rings)
    assert len(out) == 2
    assert sum(abs(C.ring_area(xs, ys)) for xs, ys in out) == pytest.approx(2.0)


def test_output_ring_has_no_duplicate_vertices():
    """Regression: an intersection point enters the traversal twice (its
    subject-list and clip-list copies share coordinates); the output
    ring must collapse exact consecutive/wraparound duplicates.  The
    dyadic-lattice rect x window case below used to emit 5 vertices."""
    import numpy as np

    u = 1.0 / 1024.0
    sx = np.array([512, 516, 516, 512], float) * u - 0.25
    sy = 51.25 + np.array([256, 256, 272, 272], float) * u
    wx = np.array([256.5, 768.5, 768.5, 256.5]) * u - 0.25
    wy = 51.25 + np.array([256.5, 256.5, 768.5, 768.5]) * u
    out = C.clip(sx, sy, wx, wy, "intersection")
    assert len(out) == 1
    xs, ys = out[0]
    assert len(xs) == 4
    pts = list(zip(xs.tolist(), ys.tolist()))
    assert len(set(pts)) == 4
    assert abs(C.ring_area(xs, ys)) == pytest.approx(4 * 15.5 * u * u)


def _regular_loop(lat, lng, radius_m, n):
    """s2.RegularLoop equivalent: n vertices at constant geodesic
    distance radius_m around (lat, lng), CCW (spherical direct
    formula)."""
    R = 6371008.8
    d = radius_m / R
    la1, lo1 = np.radians(lat), np.radians(lng)
    th = 2.0 * np.pi * np.arange(n) / n
    la2 = np.arcsin(np.sin(la1) * np.cos(d) + np.cos(la1) * np.sin(d) * np.cos(th))
    lo2 = lo1 + np.arctan2(
        np.sin(th) * np.sin(d) * np.cos(la1),
        np.cos(d) - np.sin(la1) * np.sin(la2),
    )
    return np.degrees(lo2), np.degrees(la2)


def test_collect_polygons_union_contains_centers():
    """api/functions/geometry_test.go:13-31 TestCollectPolygons: the
    union of two 300 m 128-gons around (51.535239,-0.124416) and
    (51.536631,-0.126495) contains both centers and the in-between point
    (51.536255,-0.126154) -- and merges into ONE outer ring (the loops
    overlap: centers ~210 m apart)."""
    from diagonal_b6_spark.kernels import geom as G

    p1 = _regular_loop(51.535239, -0.124416, 300.0, 128)
    p2 = _regular_loop(51.536631, -0.126495, 300.0, 128)
    out = C.union_all([p1, p2])
    assert len(out) == 1
    xs = np.concatenate([r[0] for r in out])
    ys = np.concatenate([r[1] for r in out])
    offs = np.cumsum([0] + [len(r[0]) for r in out[:-1]]).astype(np.int64)
    probe_lat = np.array([51.535239, 51.536631, 51.536255])
    probe_lng = np.array([-0.124416, -0.126495, -0.126154])
    inside = G.points_in_polygon(probe_lng, probe_lat, xs, ys, offs)
    assert inside.all(), inside
    # a point well outside both circles stays outside
    far = G.points_in_polygon(
        np.array([-0.110000]), np.array([51.535239]), xs, ys, offs
    )
    assert not far.any()
