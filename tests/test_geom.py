"""Geometry kernel tests vs closed-form / brute-force oracles (SURVEY.md §5.2)."""

import numpy as np

from diagonal_b6_spark.kernels import geom


def test_haversine_known_values():
    # London -> Paris ~ 343-344 km
    d = geom.haversine_m(51.5074, -0.1278, 48.8566, 2.3522)
    assert 342_000 < float(d) < 345_000
    assert float(geom.haversine_m(0, 0, 0, 0)) == 0.0
    # one degree of latitude ~ 111.19 km with R=6371010
    d1 = geom.haversine_m(0, 0, 1, 0)
    assert abs(float(d1) - np.pi * geom.EARTH_RADIUS_M / 180.0) < 1.0


def square(cx, cy, half):
    xs = np.array([cx - half, cx + half, cx + half, cx - half])
    ys = np.array([cy - half, cy - half, cy + half, cy + half])
    return xs, ys


def test_pip_square():
    xs, ys = square(-0.125, 51.535, 0.01)
    px = np.array([-0.125, -0.125, -0.2, -0.1151, -0.1349])
    py = np.array([51.535, 51.6, 51.535, 51.5351, 51.5349])
    got = geom.points_in_polygon(px, py, xs, ys, [0])
    assert got.tolist() == [True, False, False, True, True]


def test_pip_hole():
    oxs, oys = square(-0.125, 51.535, 0.03)
    hxs, hys = square(-0.125, 51.535, 0.01)
    xs = np.concatenate([oxs, hxs])
    ys = np.concatenate([oys, hys])
    offs = [0, 4]
    px = np.array([-0.125, -0.105, -0.2])
    py = np.array([51.535, 51.535, 51.535])
    got = geom.points_in_polygon(px, py, xs, ys, offs)
    # center is inside the hole -> NOT contained; ring between hole and outer -> contained
    assert got.tolist() == [False, True, False]


def test_pip_concave_c_shape():
    # C-shape opening to the right
    xs = np.array([0.0, 4.0, 4.0, 1.0, 1.0, 4.0, 4.0, 0.0])
    ys = np.array([0.0, 0.0, 1.0, 1.0, 3.0, 3.0, 4.0, 4.0])
    px = np.array([0.5, 2.0, 2.0, 2.0, 4.5])
    py = np.array([2.0, 2.0, 0.5, 3.5, 2.0])
    got = geom.points_in_polygon(px, py, xs, ys, [0])
    # inside the left bar; inside the notch (outside); inside bottom arm; top arm; outside
    assert got.tolist() == [True, False, True, True, False]


def test_pip_antimeridian():
    # 2-degree square straddling lng=180 at the equator
    xs = np.array([179.0, -179.0, -179.0, 179.0])
    ys = np.array([-1.0, -1.0, 1.0, 1.0])
    px = np.array([179.9, -179.9, 178.0, 0.0])
    py = np.array([0.0, 0.0, 0.0, 0.0])
    got = geom.points_in_polygon(px, py, xs, ys, [0])
    assert got.tolist() == [True, True, False, False]


def test_pip_matches_bruteforce_random():
    rng = np.random.default_rng(3)
    # random star-ish polygon around a center
    n = 11
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.5, 1.5, n)
    xs = 10 + rad * np.cos(ang)
    ys = 50 + rad * np.sin(ang)
    px = rng.uniform(8, 12, 500)
    py = rng.uniform(48, 52, 500)
    got = geom.points_in_polygon(px, py, xs, ys, [0])

    def brute(qx, qy):
        inside = False
        for k in range(n):
            x1, y1 = xs[k], ys[k]
            x2, y2 = xs[(k + 1) % n], ys[(k + 1) % n]
            if (y1 > qy) != (y2 > qy):
                if qx < x1 + (qy - y1) * (x2 - x1) / (y2 - y1):
                    inside = not inside
        return inside

    want = np.array([brute(px[k], py[k]) for k in range(500)])
    assert (got == want).all()


def test_point_segment_distance():
    # point 100 m east of a north-south segment through it
    d = geom.point_segment_distance_m(
        np.array([-0.1236]), np.array([51.5]), -0.125, 51.49, -0.125, 51.51
    )
    expect = geom.haversine_m(51.5, -0.1236, 51.5, -0.125)
    assert abs(float(d) - float(expect)) < 1.0
    # beyond the end -> distance to endpoint
    d2 = geom.point_segment_distance_m(
        np.array([-0.125]), np.array([51.52]), -0.125, 51.49, -0.125, 51.51
    )
    expect2 = geom.haversine_m(51.52, -0.125, 51.51, -0.125)
    assert abs(float(d2) - float(expect2)) < 2.0


def test_polyline_length_and_interpolate():
    ys = np.array([51.5, 51.51, 51.52])
    xs = np.array([-0.125, -0.125, -0.125])
    ln = geom.polyline_length_m(xs, ys)
    expect = float(geom.haversine_m(51.5, -0.125, 51.52, -0.125))
    assert abs(ln - expect) < 0.5
    lat, lng = geom.interpolate_along(xs, ys, 0.5)
    assert abs(lat - 51.51) < 1e-6 and abs(lng + 0.125) < 1e-9


def test_ring_centroid_and_area():
    xs, ys = square(-0.125, 51.535, 0.01)
    clat, clng = geom.ring_centroid(xs, ys)
    assert abs(clat - 51.535) < 1e-9 and abs(clng + 0.125) < 1e-9
    # area of 0.02 x 0.02 degree square at lat 51.535
    a = geom.spherical_ring_area_m2(xs, ys)
    side_ns = float(geom.haversine_m(51.525, -0.125, 51.545, -0.125))
    side_ew = float(geom.haversine_m(51.535, -0.135, 51.535, -0.115))
    assert abs(a - side_ns * side_ew) / (side_ns * side_ew) < 0.01


def test_polygon_area_with_hole():
    oxs, oys = square(0.0, 0.0, 0.03)
    hxs, hys = square(0.0, 0.0, 0.01)
    xs = np.concatenate([oxs, hxs])
    ys = np.concatenate([oys, hys])
    a_outer = geom.spherical_ring_area_m2(oxs, oys)
    a_hole = geom.spherical_ring_area_m2(hxs, hys)
    a = geom.polygon_area_m2(xs, ys, [0, 4])
    assert abs(a - (a_outer - a_hole)) < 1.0


def test_polygon_area_multi_outer():
    """Disjoint sibling rings ADD (OSM multipolygon relation with
    several outer parts, e.g. granary-square building relation 7972217
    whose 3 rings the old outer-minus-rest rule clamped to 0)."""
    axs, ays = square(0.0, 0.0, 0.01)
    bxs, bys = square(0.1, 0.0, 0.01)
    cxs, cys = square(0.2, 0.0, 0.01)
    xs = np.concatenate([axs, bxs, cxs])
    ys = np.concatenate([ays, bys, cys])
    a = geom.polygon_area_m2(xs, ys, [0, 4, 8])
    parts = sum(
        geom.spherical_ring_area_m2(x, y)
        for x, y in ((axs, ays), (bxs, bys), (cxs, cys))
    )
    assert abs(a - parts) < 1.0
    # island-in-hole nests back to additive (depth 2)
    oxs, oys = square(0.0, 0.0, 0.05)
    hxs, hys = square(0.0, 0.0, 0.03)
    ixs, iys = square(0.0, 0.0, 0.01)
    a2 = geom.polygon_area_m2(
        np.concatenate([oxs, hxs, ixs]), np.concatenate([oys, hys, iys]), [0, 4, 8]
    )
    want = (
        geom.spherical_ring_area_m2(oxs, oys)
        - geom.spherical_ring_area_m2(hxs, hys)
        + geom.spherical_ring_area_m2(ixs, iys)
    )
    assert abs(a2 - want) < 1.0


def test_arc_length_to_projection():
    """distanceToPointMeters semantics (fn geometry.go:44-54): arc
    length along the path to the probe's projection."""
    xs = np.array([0.0, 1.0, 1.0])
    ys = np.array([0.0, 0.0, 1.0])
    # probe beside the midpoint of the first segment
    d = geom.arc_length_to_projection_m(0.5, 0.1, xs, ys)
    assert abs(d - float(geom.haversine_m(0, 0, 0, 0.5))) / d < 1e-3
    # probe beside the second segment: full first segment + partial
    d2 = geom.arc_length_to_projection_m(1.1, 0.5, xs, ys)
    want = float(geom.haversine_m(0, 0, 0, 1)) + float(geom.haversine_m(0, 1, 0.5, 1))
    assert abs(d2 - want) / want < 1e-3


def test_convex_hull():
    rng = np.random.default_rng(5)
    xs = rng.uniform(0, 1, 100)
    ys = rng.uniform(0, 1, 100)
    # plant the 4 extreme corners
    xs[:4] = [-1, 2, 2, -1]
    ys[:4] = [-1, -1, 2, 2]
    hull = geom.convex_hull(xs, ys)
    assert set(hull.tolist()) == {0, 1, 2, 3}


def test_tiles_known_values():
    # slippy tile of central London at z=12: x = floor((179.8722/360)*4096) = 2046
    xt, yt = geom.latlng_to_tile(np.array([51.5074]), np.array([-0.1278]), 12)
    assert (int(xt[0]), int(yt[0])) == (2046, 1362)
    # equator/greenwich at z=1 -> (1, 1) just SE of origin
    xt, yt = geom.latlng_to_tile(np.array([-0.0001]), np.array([0.0001]), 1)
    assert (int(xt[0]), int(yt[0])) == (1, 1)


def test_tile_packing_roundtrip_and_parent_order():
    xs = np.array([2047, 100, 0])
    ys = np.array([1362, 7, 0])
    p = geom.tile_to_packed(xs, ys, 12)
    x2, y2, z2 = geom.packed_to_tile(p)
    assert (x2 == xs).all() and (y2 == ys).all() and (z2 == 12).all()
    # lower zoom sorts before higher zoom (parents before children)
    p_lo = geom.tile_to_packed(np.array([1023]), np.array([681]), 11)
    assert int(p_lo[0]) < int(p[0])


def test_point_segment_distance_antimeridian():
    """The numpy twin must agree with gridjoin's pmod form across the
    180th meridian: a point at 179.9E vs a segment at 179.9W-179.8W is
    ~22 km away, not most of the planet."""
    import numpy as np

    from diagonal_b6_spark.kernels import geom

    d = geom.point_segment_distance_m(
        np.array([179.9]), np.array([0.0]),
        np.array([-179.9]), np.array([0.0]),
        np.array([-179.8]), np.array([0.0]),
    )
    assert 20000 < d[0] < 25000


def test_convex_hull_single_point():
    import numpy as np

    from diagonal_b6_spark.kernels import geom

    idx = geom.convex_hull_planar(np.array([3.0]), np.array([7.0]))
    assert list(idx) == [0]
    idx2 = geom.convex_hull_planar(np.array([0.0, 1.0]), np.array([0.0, 2.0]))
    assert sorted(idx2) == [0, 1]


def test_visvalingam_drops_tiny_kinks_keeps_corners():
    """Closed-form Visvalingam (osm/polygons.go:219-270): a square ring
    with one midpoint nudged ~1 m off an edge forms a tiny triangle --
    simplification at a budget above that triangle's area removes the
    midpoint and only it; a budget below keeps everything."""
    import numpy as np

    from diagonal_b6_spark.kernels import geom

    # square ~200 m across at the equator, plus a midpoint on the south
    # edge nudged 1 m north: triangle area ~ (200 m * 1 m) / 2 = 100 m^2
    d = 100.0 / 111195.0
    eps = 1.0 / 111195.0
    xs = np.array([-d, 0.0, d, d, -d])
    ys = np.array([-d, -d + eps, -d, d, d])
    keep_hi = geom.visvalingam_indices(xs, ys, 150.0)
    assert list(keep_hi) == [0, 2, 3, 4]
    keep_lo = geom.visvalingam_indices(xs, ys, 10.0)
    assert list(keep_lo) == [0, 1, 2, 3, 4]
    # never below a triangle
    tri = geom.visvalingam_indices(xs[:3], ys[:3], 1e12)
    assert len(tri) == 3


def test_ring_is_ccw_matches_planar_shoelace():
    """Orientation = sign of the planar shoelace for small mid-latitude
    rings; random polygons both ways, plus antimeridian + both poles."""
    import numpy as np

    from diagonal_b6_spark.kernels import geom

    rng = np.random.default_rng(42)
    for _ in range(50):
        n = int(rng.integers(3, 12))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))  # star-shaped: no self-x
        r = rng.uniform(0.001, 0.01, n)
        clat = rng.uniform(-60, 60)
        clng = rng.uniform(-179, 179)
        xs = clng + r * np.cos(ang)
        ys = clat + r * np.sin(ang)
        shoelace = 0.5 * np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys)
        assert geom.ring_is_ccw(xs, ys) == (shoelace >= 0)
        assert geom.ring_is_ccw(xs[::-1], ys[::-1]) == (shoelace < 0)

    # antimeridian-straddling square, east-then-north = CCW
    assert geom.ring_is_ccw([179.9, -179.9, -179.9, 179.9], [10.0, 10.0, 10.1, 10.1])
    assert not geom.ring_is_ccw([179.9, 179.9, -179.9, -179.9], [10.0, 10.1, 10.1, 10.0])
    # around the north pole, eastbound = CCW; the southern twin flips
    lngs = np.linspace(-180, 180, 13)[:-1]
    assert geom.ring_is_ccw(lngs, np.full(12, 89.0))
    assert not geom.ring_is_ccw(lngs, np.full(12, -89.0))
