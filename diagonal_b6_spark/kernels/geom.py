"""Vectorized geometry kernels over packed coordinate arrays.

Geometry layout (SURVEY.md §1.5): a feature's rings are concatenated into
``xs`` (lngs) / ``ys`` (lats) with ``ring_offsets`` giving the start index
of each ring; the first ring is the outer loop, later rings are holes
(reference semantics: b6/world.go:981-1048 multipolygon loops).

All kernels are numpy-vectorized -- they run inside Arrow-batched pandas
UDFs (never per-row Python, per the north rule).

Point-in-polygon uses even-odd ray casting with the half-open rule, which
handles concave rings and holes uniformly (reference exact test:
Polygon.ContainsPoint, b6/spatial.go:473-491).  Longitudes are normalized
around the polygon's first vertex so rings straddling the antimeridian
test correctly (SURVEY.md §7.3.3).
"""

from __future__ import annotations

import math

import numpy as np

EARTH_RADIUS_M = 6371010.0  # b6/units/units.go:7-23


def haversine_m(lat1, lng1, lat2, lng2):
    """Great-circle distance in meters (spherical earth, b6 radius)."""
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lng1 = np.radians(np.asarray(lng1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lng2 = np.radians(np.asarray(lng2, dtype=np.float64))
    dlat = lat2 - lat1
    dlng = lng2 - lng1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlng / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def cum_arc_length_m(xs, ys) -> np.ndarray:
    """Cumulative haversine arc length (meters) along a polyline --
    out[0] = 0, out[-1] = total length.  The single shared kernel for
    every per-vertex distance/interpolation consumer."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    out = np.zeros(len(xs))
    if len(xs) > 1:
        out[1:] = np.cumsum(haversine_m(ys[:-1], xs[:-1], ys[1:], xs[1:]))
    return out


def _norm_lng(lng, ref):
    """Shift longitudes into (ref-180, ref+180] -- antimeridian handling."""
    return ((np.asarray(lng, dtype=np.float64) - ref + 180.0) % 360.0) - 180.0 + ref


def points_in_polygon(px, py, xs, ys, ring_offsets):
    """Even-odd PIP: points (px=lng, py=lat) vs one multi-ring polygon.

    Returns a boolean array over points.  Crossing parity is accumulated
    across ALL rings, so holes (and islands-in-holes) fall out naturally.
    Uses the half-open edge rule ((y1 > py) != (y2 > py)) so points never
    double-count a vertex-level crossing.
    """
    return _points_in_polygon_impl(px, py, xs, ys, ring_offsets, normalize=True)


def points_in_polygon_planar(px, py, xs, ys, ring_offsets):
    """Even-odd PIP WITHOUT longitude normalization: for projected
    planar coordinates (e.g. shapefile data in a metric CRS, where the
    mod-360 antimeridian shift would scramble the geometry)."""
    return _points_in_polygon_impl(px, py, xs, ys, ring_offsets, normalize=False)


def _points_in_polygon_impl(px, py, xs, ys, ring_offsets, normalize):
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    offs = list(np.asarray(ring_offsets, dtype=np.int64)) + [len(xs)]
    ref = float(xs[0])
    pxn = _norm_lng(px, ref) if normalize else px
    inside = np.zeros(px.shape, dtype=bool)
    for r in range(len(offs) - 1):
        rx = _norm_lng(xs[offs[r] : offs[r + 1]], ref) if normalize else xs[offs[r] : offs[r + 1]]
        ry = ys[offs[r] : offs[r + 1]]
        if len(rx) < 3:
            continue
        x1, y1 = rx, ry
        x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
        # (P points, E edges) crossing matrix; E is small per feature.
        cond = (y1[None, :] > py[:, None]) != (y2[None, :] > py[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[None, :] + (py[:, None] - y1[None, :]) * (x2[None, :] - x1[None, :]) / (
                y2[None, :] - y1[None, :]
            )
        crossings = (cond & (pxn[:, None] < xint)).sum(axis=1)
        inside ^= (crossings % 2).astype(bool)
    return inside


def point_segment_distance_m(px, py, x1, y1, x2, y2):
    """Approx distance point->segment in meters via local equirectangular
    projection (adequate at the sub-10km scales the reference operates on;
    reference tolerance model: b6/spatial.go:420-507)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    lat0 = np.radians(py)
    kx = np.cos(lat0) * np.radians(1.0) * EARTH_RADIUS_M
    ky = np.radians(1.0) * EARTH_RADIUS_M
    # normalize the longitude DIFFERENCE into [-180, 180) -- identical
    # to gridjoin.point_segment_dist_col's pmod form, so the numpy
    # brute-force twin and the JVM column expression agree at the
    # antimeridian (normalizing each operand separately does not)
    ax = (np.mod(np.asarray(x1, dtype=np.float64) - px + 180.0, 360.0) - 180.0) * kx
    ay = (y1 - py) * ky
    bx = (np.mod(np.asarray(x2, dtype=np.float64) - px + 180.0, 360.0) - 180.0) * kx
    by = (y2 - py) * ky
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(seg2 > 0, -(ax * dx + ay * dy) / seg2, 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = ax + t * dx, ay + t * dy
    return np.sqrt(cx * cx + cy * cy)


def point_polyline_distance_m(px, py, xs, ys):
    """Min distance from each point to a polyline (meters)."""
    px = np.atleast_1d(np.asarray(px, dtype=np.float64))
    py = np.atleast_1d(np.asarray(py, dtype=np.float64))
    best = np.full(px.shape, np.inf)
    for k in range(len(xs) - 1):
        d = point_segment_distance_m(px, py, xs[k], ys[k], xs[k + 1], ys[k + 1])
        best = np.minimum(best, d)
    return best


def arc_length_to_projection_m(px, py, xs, ys):
    """Distance ALONG a polyline from its start to the projection of a
    point onto it -- the reference's distanceToPointMeters (fn
    geometry.go:44-54: polyline.Project gives (projection, vertex);
    result = Length(polyline[0:vertex]) + dist(polyline[vertex-1],
    projection)).  NOT the closest-approach distance."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) < 2:
        return 0.0
    lat0 = math.radians(float(py))
    kx = math.cos(lat0) * math.radians(1.0) * EARTH_RADIUS_M
    ky = math.radians(1.0) * EARTH_RADIUS_M
    dlng = np.mod(xs - float(px) + 180.0, 360.0) - 180.0
    sx = -dlng * kx  # segment-local planar coords with the probe at 0
    sy = (ys - float(py)) * ky
    ex, ey = sx[1:] - sx[:-1], sy[1:] - sy[:-1]
    seg_len2 = ex * ex + ey * ey
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.clip(np.where(seg_len2 > 0, -(sx[:-1] * ex + sy[:-1] * ey) / seg_len2, 0.0), 0.0, 1.0)
    qx, qy = sx[:-1] + t * ex, sy[:-1] + t * ey
    d2 = qx * qx + qy * qy
    k = int(np.argmin(d2))
    seg = haversine_m(ys[:-1], xs[:-1], ys[1:], xs[1:])
    return float(seg[:k].sum() + t[k] * seg[k])


def polyline_length_m(xs, ys):
    """Great-circle length of a polyline (meters). Reference: fn features.go:222-224."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) < 2:
        return 0.0
    return float(haversine_m(ys[:-1], xs[:-1], ys[1:], xs[1:]).sum())


def interpolate_along(xs, ys, fraction):
    """Point at fraction of a polyline's length (fn geometry.go:78-82)."""
    seg = haversine_m(ys[:-1], xs[:-1], ys[1:], xs[1:])
    total = seg.sum()
    if total == 0:
        return float(ys[0]), float(xs[0])
    target = float(fraction) * total
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    k = int(np.searchsorted(cum, target, side="right") - 1)
    k = min(k, len(seg) - 1)
    t = (target - cum[k]) / seg[k] if seg[k] > 0 else 0.0
    return float(ys[k] + t * (ys[k + 1] - ys[k])), float(xs[k] + t * (xs[k + 1] - xs[k]))


def sample_points_spacing(xs, ys, spacing_m):
    """b6.SamplePoints (b6/path.go SamplePoints): walk the polyline
    emitting a point every `spacing_m` meters of arc length, skipping
    sub-epsilon (~1 cm) segments, and ALWAYS finishing with the exact
    final vertex.  The start vertex is NOT emitted (the first sample
    lands `spacing_m` along) -- so a path of length L yields
    floor(L / spacing_m) interior samples plus the endpoint, the count
    b6/path_test.go pins.  Returns (lats, lngs) float64 arrays."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    out_lat: list[float] = []
    out_lng: list[float] = []
    if len(xs) < 2:
        return np.asarray(out_lat), np.asarray(out_lng)
    eps_m = 0.0102  # the reference's 1.6e-9 rad epsilon, in meters
    i = 0
    px, py = float(xs[0]), float(ys[0])
    remaining = float(spacing_m)
    while True:
        if i + 1 == len(xs):
            out_lat.append(float(ys[i]))
            out_lng.append(float(xs[i]))
            break
        nx, ny = float(xs[i + 1]), float(ys[i + 1])
        d = float(haversine_m(np.float64(py), np.float64(px), np.float64(ny), np.float64(nx)))
        if d < eps_m:
            px, py = nx, ny
            i += 1
        elif d < remaining:
            remaining -= d
            px, py = nx, ny
            i += 1
        else:
            t = remaining / d
            px, py = px + t * (nx - px), py + t * (ny - py)
            out_lat.append(py)
            out_lng.append(px)
            remaining = float(spacing_m)
    return np.asarray(out_lat), np.asarray(out_lng)


def sample_fractions_stepped(xs, ys, distance_m):
    """The api/functions sampler's fraction ladder
    (fn features.go appendUnseenSampledPoints): step = distance_m /
    length; samples at j = 0, step, 2*step, ... and a final clamped
    j = 1.0.  Endpoints are emitted as the EXACT input vertices (the
    reference interpolates at j=0/1 which returns the vertex unchanged;
    float-exactness is what makes the caller's seen-point dedup
    collapse shared path junctions).  Returns (lats, lngs)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) == 0:
        return np.asarray([]), np.asarray([])
    eps_m = 0.0102
    total = polyline_length_m(xs, ys)
    step = (float(distance_m) / total) if total > eps_m else 1.0
    out_lat: list[float] = []
    out_lng: list[float] = []
    j = 0.0
    while True:
        if j >= 1.0:
            out_lat.append(float(ys[-1]))
            out_lng.append(float(xs[-1]))
            break
        if j == 0.0:
            out_lat.append(float(ys[0]))
            out_lng.append(float(xs[0]))
        else:
            lat, lng = interpolate_along(xs, ys, j)
            out_lat.append(lat)
            out_lng.append(lng)
        j += step
    return np.asarray(out_lat), np.asarray(out_lng)


def ring_centroid(xs, ys):
    """Planar area-weighted centroid of a ring (shoelace), adequate at
    city scales (reference: b6/world.go:868-886 uses loop centroids).

    Computed in ring-local coordinates (origin at the first vertex):
    analytically identical, but avoids the catastrophic cancellation of
    x*y2 - x2*y at |lat| ~ 50 (which cost ~8 significant digits and
    broke bit-stable oracle comparison)."""
    x = _norm_lng(np.asarray(xs, dtype=np.float64), float(xs[0]))
    y = np.asarray(ys, dtype=np.float64)
    lx, ly = x - x[0], y - y[0]
    lx2, ly2 = np.roll(lx, -1), np.roll(ly, -1)
    cross = lx * ly2 - lx2 * ly
    a = cross.sum() / 2.0
    if abs(a) < 1e-18:
        return float(y.mean()), float(x.mean())
    cx = x[0] + ((lx + lx2) * cross).sum() / (6.0 * a)
    cy = y[0] + ((ly + ly2) * cross).sum() / (6.0 * a)
    return float(cy), float(cx)


def hull_centroid(xs, ys):
    """Centroid of the convex hull of a vertex set -- the reference's
    area centroid (fn geometry.go:59-76: s2.ConvexHullQuery over every
    polygon, then the hull loop's centroid).  Planar hull + shoelace
    centroid, adequate at city scales like ring_centroid."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) < 3:
        return float(ys.mean()), float(xs.mean())
    idx = convex_hull(xs, ys)
    if len(idx) < 3:
        return float(ys.mean()), float(xs.mean())
    return ring_centroid(xs[idx], ys[idx])


def polyline_centroid(xs, ys):
    """Length-weighted centroid of a polyline, returned (lat, lng)
    (reference: path centroid = polyline centroid, b6/world.go:868-886)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) < 2:
        return float(ys[0]), float(xs[0])
    x = _norm_lng(xs, float(xs[0]))
    seg = haversine_m(ys[:-1], x[:-1], ys[1:], x[1:])
    total = seg.sum()
    if total == 0:
        return float(ys[0]), float(xs[0])
    midx = (x[:-1] + x[1:]) / 2.0
    midy = (ys[:-1] + ys[1:]) / 2.0
    return float((midy * seg).sum() / total), float((midx * seg).sum() / total)


def _signed_ring_excess(xs, ys) -> float:
    """Trapezoid-form spherical excess of a ring (steradians; 0 for
    degenerate rings).  Over a closed ring the ``2 +`` term telescopes
    away and what remains is MINUS the shoelace area in (lng, sin lat):
    negative = counter-clockwise.  Shared by area (abs) and orientation
    (sign) so the two can never disagree."""
    lat = np.radians(np.asarray(ys, dtype=np.float64))
    if len(lat) < 3:
        return 0.0
    lng = np.radians(_norm_lng(np.asarray(xs, dtype=np.float64), float(xs[0])))
    lat2 = np.roll(lat, -1)
    lng2 = np.roll(lng, -1)
    return float(np.sum((lng2 - lng) * (2.0 + np.sin(lat) + np.sin(lat2))) / 2.0)


def spherical_ring_area_m2(xs, ys):
    """Spherical excess area of a single ring in m^2 (fn geometry.go:97-106).

    The standard GIS trapezoid formula, exact on the sphere (L'Huilier
    per triangle fan is overkill at our scales)."""
    return abs(_signed_ring_excess(xs, ys)) * EARTH_RADIUS_M * EARTH_RADIUS_M


def ring_is_ccw(xs, ys) -> bool:
    """True when the ring's vertices run counter-clockwise on the sphere.

    The reference validates closed paths with ``loop.Area() > 2*pi``
    (s2 loops keep the region to the LEFT of the edges, so a clockwise
    vertex order encloses the complement, > hemisphere;
    b6/ingest/validate.go:47-59).  For rings far smaller than a
    hemisphere that test is exactly the sign of _signed_ring_excess:
    negative = CCW.  Degenerate rings (<3 vertices) count as CCW --
    the loop-validity check catches them separately.
    """
    return _signed_ring_excess(xs, ys) <= 0.0


def polygon_area_m2(xs, ys, ring_offsets):
    """Multi-ring polygon area with even-odd ring nesting.

    A ring contained in an odd number of OTHER rings is a hole and
    subtracts; even depth (incl. disjoint sibling outers of an OSM
    multipolygon relation, e.g. granary-square's 3-part building
    relation 7972217) adds.  Matches s2.Polygon/GEOS semantics for
    single polygons with holes AND multi-outer multipolygons; the old
    rule (ring 0 outer, every later ring a hole) clamped multi-outer
    relations to 0."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    offs = list(np.asarray(ring_offsets, dtype=np.int64)) + [len(xs)]
    n = len(offs) - 1
    if n <= 1:
        return spherical_ring_area_m2(xs, ys)
    rings = [
        (xs[offs[r] : offs[r + 1]], ys[offs[r] : offs[r + 1]]) for r in range(n)
    ]
    total = 0.0
    for i, (rx, ry) in enumerate(rings):
        if len(rx) < 3:
            continue
        depth = 0
        for j, (ox, oy) in enumerate(rings):
            if i == j or len(ox) < 3:
                continue
            if bool(
                points_in_polygon(
                    rx[:1], ry[:1], ox, oy, np.array([0], dtype=np.int64)
                )[0]
            ):
                depth += 1
        a = spherical_ring_area_m2(rx, ry)
        total += a if depth % 2 == 0 else -a
    return max(total, 0.0)


def convex_hull(xs, ys):
    """Andrew monotone chain in lng/lat (fn geometry.go:207-232 analogue).

    Returns hull vertex indices in counter-clockwise order.
    """
    return convex_hull_planar(
        _norm_lng(np.asarray(xs, dtype=np.float64), float(xs[0])),
        np.asarray(ys, dtype=np.float64),
    )


def convex_hull_planar(xs, ys):
    """Monotone chain WITHOUT longitude normalization: for coordinates
    that are already planar -- in particular exact integer lattice keys
    (values < 2^20, so every cross product is < 2^41 and float64-exact:
    the hull is then deterministic and exactly oracle-matchable even for
    collinear lattice triples)."""
    pts = np.stack(
        [np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64)],
        axis=1,
    )
    if len(pts) == 1:
        # monotone chain degenerates to an empty hull for a lone point;
        # the point is its own hull (callers batching partitions rely on
        # no input vanishing -- the r4 lone-point fix at the operator
        # level now also holds at the kernel level)
        return np.array([0], dtype=np.int64)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts_sorted = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[int] = []
    for idx in range(len(pts_sorted)):
        while len(lower) >= 2 and cross(pts_sorted[lower[-2]], pts_sorted[lower[-1]], pts_sorted[idx]) <= 0:
            lower.pop()
        lower.append(idx)
    upper: list[int] = []
    for idx in range(len(pts_sorted) - 1, -1, -1):
        while len(upper) >= 2 and cross(pts_sorted[upper[-2]], pts_sorted[upper[-1]], pts_sorted[idx]) <= 0:
            upper.pop()
        upper.append(idx)
    hull = lower[:-1] + upper[:-1]
    return order[np.array(hull, dtype=np.int64)]


# ---------------------------------------------------------------------------
# Web-mercator tile math (b6/tiles.go:202-257 semantics).
# ---------------------------------------------------------------------------


def latlng_to_tile(lat, lng, zoom):
    """Slippy-map tile (x, y) at zoom.  Vectorized."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    n = float(1 << int(zoom))
    xt = np.floor((lng + 180.0) / 360.0 * n)
    lat_rad = np.radians(np.clip(lat, -85.05112878, 85.05112878))
    yt = np.floor((1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n)
    xt = np.clip(xt, 0, n - 1).astype(np.int64)
    yt = np.clip(yt, 0, n - 1).astype(np.int64)
    return xt, yt


def tile_to_packed(x, y, zoom):
    """Pack (x, y, z) into one int64: 5 zoom bits semantics like the
    reference's TileID (b6/tiles.go:126-133): parents sort before children."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    z = np.int64(zoom)
    return (z << np.int64(58)) | (x << np.int64(29)) | y


def packed_to_tile(packed):
    p = np.asarray(packed, dtype=np.int64)
    z = p >> np.int64(58)
    x = (p >> np.int64(29)) & np.int64((1 << 29) - 1)
    y = p & np.int64((1 << 29) - 1)
    return x, y, z


def visvalingam_indices(xs, ys, max_area_error_m2: float):
    """Visvalingam ring simplification keep-indices, mirroring the
    reference's SimplifyLoop (osm/polygons.go:219-270): iteratively
    delete the vertex whose removal changes the ring's area least (the
    area of the triangle it forms with its neighbours, absolute
    spherical excess), stopping once the smallest remaining triangle
    exceeds max_area_error_m2 or only 3 vertices remain.

    The ring is CLOSED implicitly (first vertex not repeated), like
    s2.Loop.  Documented deviation: after a deletion the reference
    recomputes only the triangle starting at the deleted vertex's
    predecessor, leaving the one before it stale in its heap
    (polygons.go:250-262); this implementation recomputes BOTH adjacent
    triangles (Visvalingam's published algorithm), which can differ in
    which near-threshold vertices survive.  The reference's own
    acceptance bands (area within 1 %, >=50 % vertex reduction on the
    London boundary) hold for both.  Returns sorted keep indices."""
    x = np.asarray(xs, dtype=np.float64)
    y = np.asarray(ys, dtype=np.float64)
    n = len(x)
    if n <= 3:
        return np.arange(n, dtype=np.int64)
    import heapq

    prv = np.roll(np.arange(n), 1)
    nxt = np.roll(np.arange(n), -1)
    alive = np.ones(n, dtype=bool)
    stamp = np.zeros(n, dtype=np.int64)

    def tri_area(i):
        idx = (int(prv[i]), int(i), int(nxt[i]))
        return spherical_ring_area_m2(x[list(idx)], y[list(idx)])

    heap = [(tri_area(i), 0, i) for i in range(n)]
    heapq.heapify(heap)
    remaining = n
    while remaining > 3 and heap:
        area, ver, i = heapq.heappop(heap)
        if not alive[i] or ver != stamp[i]:
            continue  # lazy deletion: superseded or already removed
        if area > max_area_error_m2:
            break
        alive[i] = False
        remaining -= 1
        p, q = int(prv[i]), int(nxt[i])
        nxt[p], prv[q] = q, p
        for j in (p, q):
            stamp[j] += 1
            heapq.heappush(heap, (tri_area(j), int(stamp[j]), j))
    return np.flatnonzero(alive).astype(np.int64)


def douglas_peucker(xs, ys, epsilon: float):
    """Douglas-Peucker keep-indices over an open point chain, matching the
    reference renderer's semantics (renderer/simplify.go:40-102): the
    split metric is perpendicular distance to the infinite LINE through
    the interval's endpoints (not the clamped segment), endpoints always
    survive, and intervals split at the farthest point until every
    interior point lies within epsilon.  Iterative stack (the
    reference's production variant), numpy-vectorized distance per
    interval.  Returns sorted keep indices."""
    x = np.asarray(xs, dtype=np.float64)
    y = np.asarray(ys, dtype=np.float64)
    n = len(x)
    if n < 3:
        return np.arange(n, dtype=np.int64)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        dx, dy = x[b] - x[a], y[b] - y[a]
        norm = np.hypot(dx, dy)
        px = x[a + 1 : b] - x[a]
        py = y[a + 1 : b] - y[a]
        if norm == 0.0:
            # degenerate interval (coincident endpoints): distance to the point
            d = np.hypot(px, py)
        else:
            d = np.abs(px * dy - py * dx) / norm
        i = int(np.argmax(d))
        if d[i] > epsilon:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return np.nonzero(keep)[0].astype(np.int64)


def ring_self_intersects(xs, ys) -> bool:
    """True iff the closed ring (closing vertex implicit) has two
    non-adjacent edges that properly cross -- the invalidity the
    reference rejects when a mutation moves a polygon vertex or swaps a
    path under an area (s2.Loop validation behind MutableWorld.AddFeature;
    fixtures ingest/mutable_test.go:521-574).  Pairwise orientation
    tests, vectorized per edge over its non-adjacent partners; rings are
    feature-sized so the O(n^2) pair count is trivial."""
    x = np.asarray(xs, dtype=np.float64)
    y = np.asarray(ys, dtype=np.float64)
    n = len(x)
    if n < 4:
        return False  # a triangle cannot properly self-intersect
    x2 = np.append(x, x[0])
    y2 = np.append(y, y[0])
    ax, ay = x2[:-1], y2[:-1]
    bx, by = x2[1:], y2[1:]
    for i in range(n - 2):
        # non-adjacent partners of edge i (skip i+1; edge 0 also skips
        # the closing edge n-1, which shares its first vertex)
        j_end = n if i > 0 else n - 1
        j = np.arange(i + 2, j_end)
        if len(j) == 0:
            continue
        d1 = (bx[i] - ax[i]) * (ay[j] - ay[i]) - (by[i] - ay[i]) * (ax[j] - ax[i])
        d2 = (bx[i] - ax[i]) * (by[j] - ay[i]) - (by[i] - ay[i]) * (bx[j] - ax[i])
        d3 = (bx[j] - ax[j]) * (ay[i] - ay[j]) - (by[j] - ay[j]) * (ax[i] - ax[j])
        d4 = (bx[j] - ax[j]) * (by[i] - ay[j]) - (by[j] - ay[j]) * (bx[i] - ax[j])
        if bool(np.any((d1 * d2 < 0) & (d3 * d4 < 0))):
            return True
    return False
