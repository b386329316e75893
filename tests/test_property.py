"""Property-based kernel invariants (hypothesis): cell-id algebra, token
round-trips, signed-order preservation, PIP edge behavior, tile packing."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from diagonal_b6_spark.kernels import cellmath as cm
from diagonal_b6_spark.kernels import geom

lat_s = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False)
lng_s = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
level_s = st.integers(min_value=1, max_value=16)


@settings(max_examples=200, deadline=None)
@given(lat_s, lng_s, level_s)
def test_cell_id_hierarchy(lat, lng, level):
    leaf = cm.cell_id_from_latlng(np.array([lat]), np.array([lng]), 16)
    anc = cm.parent(leaf, np.int64(level))
    # ancestor contains descendant; levels match; ranges nest
    assert cm.contains(anc, leaf)[0]
    assert cm.level(anc)[0] == level
    assert cm.range_min(anc)[0] <= cm.range_min(leaf)[0]
    assert cm.range_max(anc)[0] >= cm.range_max(leaf)[0]


@settings(max_examples=200, deadline=None)
@given(lat_s, lng_s)
def test_token_roundtrip(lat, lng):
    cid = cm.cell_id_from_latlng(np.array([lat]), np.array([lng]), 16)
    tok = cm.token(cid)[0]
    assert cm.token_to_id(tok) == cid[0]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(lat_s, lng_s), min_size=2, max_size=32))
def test_signed_order_preserved(pts):
    lat = np.array([p[0] for p in pts])
    lng = np.array([p[1] for p in pts])
    ids = cm.cell_id_from_latlng(lat, lng, 16)
    signed = cm.id_to_signed(ids)
    a, b = np.argsort(ids, kind="stable"), np.argsort(signed, kind="stable")
    assert (a == b).all()  # same total order after the sign-bit flip
    back = cm.signed_to_id(signed)
    assert (back == ids).all()


@settings(max_examples=150, deadline=None)
@given(lat_s, lng_s)
def test_cell_center_stays_inside(lat, lng):
    """The decoded center of a point's cell maps back to the SAME cell."""
    cid = cm.cell_id_from_latlng(np.array([lat]), np.array([lng]), 16)
    clat, clng = cm.cell_center_latlng(cid)
    cid2 = cm.cell_id_from_latlng(clat, clng, 16)
    assert cid2[0] == cid[0]


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=-80, max_value=80, allow_nan=False),
    st.floats(min_value=-170, max_value=170, allow_nan=False),
    st.floats(min_value=0.001, max_value=0.2, allow_nan=False),
    st.floats(min_value=0.001, max_value=0.2, allow_nan=False),
)
def test_pip_rectangle(clat, clng, hw, hh):
    """Points strictly inside an axis-aligned rect test inside; points
    strictly outside test outside."""
    xs = np.array([clng - hw, clng + hw, clng + hw, clng - hw])
    ys = np.array([clat - hh, clat - hh, clat + hh, clat + hh])
    offs = np.array([0], dtype=np.int64)
    inside = geom.points_in_polygon(
        np.array([clng, clng + 0.5 * hw]), np.array([clat, clat - 0.5 * hh]), xs, ys, offs
    )
    assert inside.all()
    outside = geom.points_in_polygon(
        np.array([clng + 2 * hw, clng]), np.array([clat, clat + 3 * hh]), xs, ys, offs
    )
    assert not outside.any()


@settings(max_examples=200, deadline=None)
@given(lat_s, lng_s, st.integers(min_value=1, max_value=20))
def test_tile_pack_roundtrip(lat, lng, zoom):
    xt, yt = geom.latlng_to_tile(np.array([lat]), np.array([lng]), zoom)
    packed = geom.tile_to_packed(xt, yt, zoom)
    x2, y2, z2 = geom.packed_to_tile(packed)
    assert x2[0] == xt[0] and y2[0] == yt[0] and z2[0] == zoom
    assert 0 <= xt[0] < (1 << zoom) and 0 <= yt[0] < (1 << zoom)


@settings(max_examples=100, deadline=None)
@given(lat_s, lng_s, lat_s, lng_s)
def test_haversine_metric_properties(a1, o1, a2, o2):
    d12 = float(geom.haversine_m(a1, o1, a2, o2))
    d21 = float(geom.haversine_m(a2, o2, a1, o1))
    assert abs(d12 - d21) < 1e-6  # symmetry
    assert d12 >= 0.0
    assert float(geom.haversine_m(a1, o1, a1, o1)) < 1e-6  # identity
    assert d12 <= np.pi * geom.EARTH_RADIUS_M + 1.0  # bounded by half-circumference


# --- polygon boolean kernel invariants --------------------------------------

from hypothesis import given, settings as hsettings
from hypothesis import strategies as st


def _convex_poly(seed: int, cx: float, cy: float, r: float):
    """Genuinely convex simple polygon: hull of random points.  (A naive
    sorted-angle star construction is NOT simple when the angles don't
    wrap the anchor -- the kernel requires simple rings.)"""
    import numpy as np

    rng = np.random.default_rng(seed)
    while True:
        pts = rng.uniform(-r, r, (10, 2))
        idx = geom.convex_hull(pts[:, 0], pts[:, 1])
        if len(idx) >= 3:
            return cx + pts[idx, 0], cy + pts[idx, 1]


@hsettings(max_examples=40, deadline=None)
@given(
    seed_a=st.integers(0, 10_000),
    seed_b=st.integers(0, 10_000),
    dx=st.floats(-1.5, 1.5),
    dy=st.floats(-1.5, 1.5),
)
def test_clip_inclusion_exclusion(seed_a, seed_b, dx, dy):
    """area(A) + area(B) == area(A∪B) + area(A∩B) for random convex
    polygon pairs at random offsets -- a traversal bug in any of the
    three ops breaks the identity."""
    from diagonal_b6_spark.kernels import clip as C

    ax, ay = _convex_poly(seed_a, 0.0, 0.0, 1.0)
    bx, by = _convex_poly(seed_b, dx, dy, 1.0)
    area = lambda rings: sum(abs(C.ring_area(x, y)) for x, y in rings)
    a = abs(C.ring_area(ax, ay))
    b = abs(C.ring_area(bx, by))
    inter = area(C.clip(ax, ay, bx, by, "intersection"))
    union = area(C.clip(ax, ay, bx, by, "union"))
    assert a + b == pytest.approx(union + inter, rel=1e-6, abs=1e-9)


@hsettings(max_examples=40, deadline=None)
@given(
    seed_a=st.integers(0, 10_000),
    seed_b=st.integers(0, 10_000),
    dx=st.floats(-1.5, 1.5),
    dy=st.floats(-1.5, 1.5),
)
def test_clip_difference_partitions_subject(seed_a, seed_b, dx, dy):
    """area(A\\B) + area(A∩B) == area(A).  Difference output uses SIGNED
    areas (outer rings CCW, hole rings CW -- the kernel's orientation
    contract), so fully-contained clips subtract correctly."""
    from diagonal_b6_spark.kernels import clip as C

    ax, ay = _convex_poly(seed_a, 0.0, 0.0, 1.0)
    bx, by = _convex_poly(seed_b, dx, dy, 1.0)
    area = lambda rings: sum(abs(C.ring_area(x, y)) for x, y in rings)
    signed = lambda rings: sum(C.ring_area(x, y) for x, y in rings)
    a = abs(C.ring_area(ax, ay))
    inter = area(C.clip(ax, ay, bx, by, "intersection"))
    diff = signed(C.clip(ax, ay, bx, by, "difference"))
    assert diff + inter == pytest.approx(a, rel=1e-6, abs=1e-9)


# --- boolean-op kernels vs closed-form rectangle arithmetic -----------------

from diagonal_b6_spark.kernels import clip as clip_kernel

_coord = st.integers(min_value=0, max_value=40)
_side = st.integers(min_value=1, max_value=24)


def _rect_ring(x1, y1, w, h):
    xs = np.array([x1, x1 + w, x1 + w, x1], dtype=np.float64)
    ys = np.array([y1, y1, y1 + h, y1 + h], dtype=np.float64)
    return xs, ys


def _overlap(a, b):
    w = min(a[0] + a[2], b[0] + b[2]) - max(a[0], b[0])
    h = min(a[1] + a[3], b[1] + b[3]) - max(a[1], b[1])
    return max(0.0, w) * max(0.0, h)


_rect = st.tuples(_coord, _coord, _side, _side)


@settings(max_examples=150, deadline=None)
@given(_rect, _rect)
def test_clip_intersection_matches_closed_form(ra, rb):
    """GH clip of ANY two integer-lattice rects (shared edges, corner
    touches, containment included -- the degeneracy-perturbation path
    runs here) matches the closed-form overlap to perturbation noise."""
    out = clip_kernel.clip(*_rect_ring(*ra), *_rect_ring(*rb), "intersection")
    got = sum(abs(clip_kernel.ring_area(xs, ys)) for xs, ys in out)
    assert got == pytest.approx(_overlap(ra, rb), abs=1e-4)


@settings(max_examples=100, deadline=None)
@given(_rect, _rect)
def test_clip_union_difference_partition(ra, rb):
    """area(union) == A + B - overlap and area(difference) == A - overlap
    for every rect pair, degenerate contacts included."""
    a = float(ra[2] * ra[3])
    b = float(rb[2] * rb[3])
    ov = _overlap(ra, rb)
    un = clip_kernel.clip(*_rect_ring(*ra), *_rect_ring(*rb), "union")
    # union pieces: sum of signed areas (difference emits CW holes)
    got_u = sum(abs(clip_kernel.ring_area(xs, ys)) for xs, ys in un)
    assert got_u == pytest.approx(a + b - ov, abs=1e-4)
    df = clip_kernel.clip(*_rect_ring(*ra), *_rect_ring(*rb), "difference")
    got_d = sum(clip_kernel.ring_area(xs, ys) for xs, ys in df)
    assert got_d == pytest.approx(a - ov, abs=1e-4)


@settings(max_examples=75, deadline=None)
@given(st.lists(_rect, min_size=1, max_size=5))
def test_union_all_bounded_by_inclusion_exclusion(rects):
    """union_all total area vs a unit-cell rasterization: at least the
    true covered area, at most covered + enclosed pockets (the
    documented hole-free absorption -- clip.py union_all docstring;
    pockets counted 4-connected, the sealed-by-edges case.  A
    hypothesis stress run falsified the old <= sum-of-areas bound with
    a pocket-forming U: absorption is contract, not a bug)."""
    rings = [_rect_ring(*r) for r in rects]
    out = clip_kernel.union_all(rings)
    got = sum(abs(clip_kernel.ring_area(xs, ys)) for xs, ys in out)
    areas = [float(r[2] * r[3]) for r in rects]

    # rasterize: coords <= 40 + 24; shift by +1 for an empty border ring
    grid = np.zeros((67, 67), dtype=bool)
    for x, y, w, h in rects:
        grid[y + 1 : y + 1 + h, x + 1 : x + 1 + w] = True
    exact = float(grid.sum())
    # outside flood fill (4-connected) from the border
    from collections import deque

    outside = np.zeros_like(grid)
    dq = deque([(0, 0)])
    outside[0, 0] = True
    while dq:
        i, j = dq.popleft()
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            a, b = i + di, j + dj
            if 0 <= a < 67 and 0 <= b < 67 and not grid[a, b] and not outside[a, b]:
                outside[a, b] = True
                dq.append((a, b))
    pockets = float((~grid & ~outside).sum())
    assert exact - 1e-4 <= got <= exact + pockets + 1e-4
    assert got >= max(areas) - 1e-4
    # exact check when the overlap structure is pairwise-only
    triple = any(
        _overlap(a, b) > 0 and _overlap(b, c) > 0 and _overlap(a, c) > 0
        and min(a[0] + a[2], b[0] + b[2], c[0] + c[2]) > max(a[0], b[0], c[0])
        and min(a[1] + a[3], b[1] + b[3], c[1] + c[3]) > max(a[1], b[1], c[1])
        for i, a in enumerate(rects)
        for j, b in enumerate(rects)
        for c in rects[j + 1:]
        if i < j
    )
    if not triple and len(rects) <= 3:
        expect = sum(areas) - sum(
            _overlap(a, b) for i, a in enumerate(rects) for b in rects[i + 1:]
        )
        assert got == pytest.approx(expect, abs=1e-3)


# --- DSATUR colouring invariants (operators/colouring._dsatur) -------------

edge_s = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


@settings(max_examples=150, deadline=None)
@given(edge_s)
def test_dsatur_proper_and_order_free(edges):
    """Any random graph: the colouring is proper, uses a dense 0..k
    palette, and is invariant to edge-list order and duplication."""
    import pandas as pd

    from diagonal_b6_spark.operators.colouring import _dsatur

    pdf = pd.DataFrame([(f"n{a}", f"n{b}") for a, b in edges], columns=["a", "b"])
    r1 = _dsatur(pdf)
    m1 = dict(zip(r1.feature_id, r1.colour))
    # proper
    for a, b in edges:
        assert m1[f"n{a}"] != m1[f"n{b}"]
    # dense palette
    used = sorted(set(m1.values()))
    assert used == list(range(len(used)))
    # order/duplication invariance
    shuffled = pd.concat([pdf.iloc[::-1], pdf]).reset_index(drop=True)
    r2 = _dsatur(shuffled)
    assert m1 == dict(zip(r2.feature_id, r2.colour))


@settings(max_examples=100, deadline=None)
@given(edge_s, edge_s)
def test_dsatur_per_component_equals_global(e1, e2):
    """Two vertex-disjoint subgraphs coloured together equal each
    coloured alone -- the property the cogrouped per-component plan
    relies on (global DSATUR restricted to a component)."""
    import pandas as pd

    from diagonal_b6_spark.operators.colouring import _dsatur

    p1 = pd.DataFrame([(f"x{a}", f"x{b}") for a, b in e1], columns=["a", "b"])
    p2 = pd.DataFrame([(f"y{a}", f"y{b}") for a, b in e2], columns=["a", "b"])
    both = pd.concat([p1, p2]).reset_index(drop=True)
    g = _dsatur(both)
    gm = dict(zip(g.feature_id, g.colour))
    for part in (p1, p2):
        r = _dsatur(part)
        for fid, c in zip(r.feature_id, r.colour):
            assert gm[fid] == c


# --- shell parser totality -------------------------------------------------

from hypothesis import example as hexample


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60))
@hsettings(max_examples=300, deadline=2000)
@hexample('find [#a=')
@hexample('{x -> ')
@hexample('map {')
@hexample('"unterminated')
@hexample("1 | | 2")
@hexample("((((((((((")
def test_shell_parser_is_total(s):
    """The recursive-descent parser must either return a tree or raise
    ParseError -- never hang, never raise anything else -- on arbitrary
    printable input (the reference's goyacc grammar has the same
    guarantee via yacc error recovery)."""
    from diagonal_b6_spark.shell import ParseError, parse_expression

    try:
        parse_expression(s)
    except ParseError:
        pass


@given(st.recursive(
    st.sampled_from(["1", "2.5", '"x"', "[#k=v]", "[#k]", "all"]),
    lambda inner: st.builds(
        lambda a, b, op: {
            "pipe": f"{a} | take 3",
            "call": f"(and {a} {b})" if a.startswith("[") and b.startswith("[") else f"(add 1 2)",
            "lambda": "{f -> " + a + "}" if not a.startswith("{") else a,
            # collection values are STRING|INT|FEATURE_ID|FLOAT|tag|group
            # (shell.y:149-156) -- anything else must be a '(...)' group
            "coll": "{0: " + (a if __import__("re").fullmatch(r'[0-9.]+|"[^"]*"', a) else "(" + a + ")") + "}",
        }[op],
        inner, inner, st.sampled_from(["pipe", "call", "lambda", "coll"]),
    ),
    max_leaves=8,
))
@hsettings(max_examples=200, deadline=2000)
def test_shell_parser_accepts_generated_grammar(s):
    """Well-formed expressions produced from the grammar's own
    constructors always parse."""
    from diagonal_b6_spark.shell import parse_expression

    parse_expression(s)
