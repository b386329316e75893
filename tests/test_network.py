"""Network-connection joins: IDW elevation vs DuckDB oracle; nearest-
segment connect vs numpy brute force."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from diagonal_b6_spark import catalog, fixtures
from diagonal_b6_spark.operators import network
from diagonal_b6_spark.kernels import geom

SF = "/root/testdata/sf0.001"


def test_elevation_idw_oracle_parity(spark):
    got = sorted(tuple(r) for r in catalog.QUERIES["geo_elevation_idw"](spark, SF).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    want = sorted(tuple(r) for r in con.execute(catalog.ORACLES["geo_elevation_idw"]).fetchall())
    assert got == want
    assert len(got) > 0


def test_connect_network_matches_bruteforce(spark):
    out = {
        r["event_id"]: (r["path_id"], r["seg_idx"], r["dist_m"])
        for r in catalog.QUERIES["geo_connect_network"](spark, SF).collect()
    }
    pts = catalog._events_points(spark, SF).toPandas()
    road = [r for r in fixtures.feature_rows() if r["feature_type"] == "path"][0]
    xs, ys = np.array(road["xs"]), np.array(road["ys"])
    n_checked = 0
    for _, p in pts.iterrows():
        d = geom.point_segment_distance_m(
            p["lng"], p["lat"], xs[:-1], ys[:-1], xs[1:], ys[1:]
        )
        d = np.atleast_1d(d)
        best = int(np.argmin(d))
        if d[best] <= 500.0:
            assert p["event_id"] in out
            got = out[p["event_id"]]
            assert got[0] == road["feature_id"]
            assert got[1] == best
            assert got[2] == pytest.approx(d[best], abs=1e-2)
            n_checked += 1
        else:
            assert p["event_id"] not in out
    assert n_checked > 0


def test_street_network_excludes_stubs(spark):
    """BuildStreetNetwork semantics: the 5x5 grid (~800 m span) is
    network; the isolated driveway and the ~330 m cul-de-sac cluster are
    not; each cluster forms exactly one component."""
    from diagonal_b6_spark.operators import network as net_ops

    out = net_ops.build_street_network(catalog.street_paths_table(spark), 500.0).collect()
    by_path = {r.path_id: r for r in out}
    assert len(by_path) == 44
    assert all(by_path[p].in_network for p in by_path if p.startswith("street/h/") or p.startswith("street/v/"))
    assert not by_path["street/driveway"].in_network
    assert not by_path["street/cul/a"].in_network
    grid_comps = {r.comp for r in out if r.in_network}
    cul_comps = {by_path[f"street/cul/{s}"].comp for s in "abc"}
    assert len(grid_comps) == 1 and len(cul_comps) == 1
    assert by_path["street/driveway"].comp not in grid_comps | cul_comps


def test_connect_to_network_snaps_only_to_members(spark):
    """The reference's ConnectFeature projects onto the street NETWORK:
    a point right next to the driveway stub must snap past it to the
    nearest grid street once the membership filter is applied."""
    from pyspark.sql import functions as F
    from diagonal_b6_spark.operators import network as net_ops

    paths = catalog.street_paths_table(spark)
    # 5 m east of the driveway (at 51.52015, -0.08); nearest grid street
    # is far away but within the 3 km threshold
    pts = spark.createDataFrame([(1, 51.52015, -0.07993)], "pid long, lat double, lng double")
    free = net_ops.connect_to_network(pts, paths, 3000.0, point_id="pid").collect()
    assert free[0].path_id == "street/driveway"
    member = net_ops.build_street_network(paths, 500.0)
    snapped = net_ops.connect_to_network(
        pts, paths, 3000.0, point_id="pid", network=member
    ).collect()
    assert snapped[0].path_id.startswith(("street/h/", "street/v/"))
    assert snapped[0].dist_m > free[0].dist_m


def _chain_paths(spark, n_segs: int, seg_deg: float = 0.001):
    """A single west-east chain of n_segs 2-point paths, each sharing an
    endpoint with the next: hop diameter == n_segs."""
    rows = [
        {
            "feature_id": f"chain/{i}",
            "feature_type": "path",
            "ns": "test",
            "tags": {"highway": "residential"},
            "xs": [i * seg_deg, (i + 1) * seg_deg],
            "ys": [51.5, 51.5],
            "ring_offsets": [0],
        }
        for i in range(n_segs)
    ]
    return spark.createDataFrame(rows, fixtures.FEATURE_SCHEMA)


def test_street_network_converges_past_rounds_hint(spark):
    """ADVICE r3: hop diameter (40) far above the rounds hint (12) must
    NOT fragment -- the convergence loop keeps going to the fixpoint, so
    the chain is one component and (being ~2.8 km long) in-network."""
    from diagonal_b6_spark.operators import network as net_ops

    out = net_ops.build_street_network(_chain_paths(spark, 40), 500.0, rounds=12).collect()
    assert len(out) == 40
    assert len({r.comp for r in out}) == 1
    assert all(r.in_network for r in out)


def test_street_network_raises_past_max_rounds(spark):
    from diagonal_b6_spark.operators import network as net_ops

    with pytest.raises(ValueError, match="max_rounds"):
        net_ops.build_street_network(
            _chain_paths(spark, 40), 500.0, rounds=2, max_rounds=8
        ).collect()


def test_street_network_star_equals_labelprop(spark):
    """The O(log n) large-star/small-star path must produce the identical
    (path_id, comp, in_network) labeling as min-label propagation, on the
    street fixture AND on a chain whose diameter exceeds the hint."""
    from diagonal_b6_spark.operators import network as net_ops

    for paths in (catalog.street_paths_table(spark), _chain_paths(spark, 40)):
        lp = sorted(tuple(r) for r in net_ops.build_street_network(paths, 500.0).collect())
        st = sorted(
            tuple(r)
            for r in net_ops.build_street_network(paths, 500.0, algorithm="star").collect()
        )
        assert st == lp


def test_connected_components_closed_forms(spark):
    """Stars converge to min-rooted components on shapes label-prop finds
    hard: a long chain, two disjoint cliques, an isolated self-loop-free
    pair."""
    from diagonal_b6_spark.operators import components

    chain = [(i, i + 1) for i in range(100, 160)]        # 61 nodes, one comp
    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    pair = [(999, 998)]
    e = spark.createDataFrame(chain + clique + pair, "a long, b long")
    got = {r["k"]: r["lbl"] for r in components.connected_components(e).collect()}
    assert all(got[i] == 100 for i in range(100, 161))
    assert all(got[i] == 0 for i in range(5))
    assert got[998] == 998 and got[999] == 998
    assert len(got) == 61 + 5 + 2


# --- Connections cluster/apply (b6/graph/connectivity_test.go mirrors) ------

_STABLE_ST_XS = [-0.1252851, -0.1255689, -0.1256803]
_STABLE_ST_YS = [51.5373281, 51.5366646, 51.5363904]  # spaced 0, 76, 108 m


def _conn_paths(spark):
    return spark.createDataFrame(
        [("stable_street", _STABLE_ST_XS, _STABLE_ST_YS),
         ("handyside", [-0.1235755, -0.1252412], [51.5371597, 51.5374419])],
        "feature_id string, xs array<double>, ys array<double>",
    )


def _cluster(spark, ins_rows, threshold=4.0):
    ins = spark.createDataFrame(
        ins_rows, "point_id string, path_id string, along_m double"
    )
    return network.cluster_connections(ins, _conn_paths(spark), threshold)


def test_merge_insertions(spark):
    """Mirror of TestMergeInsertions (connectivity_test.go:28-75):
    insertions at 10 m and 85 m on Stable Street (vertices at 0/76/108)
    splice into a 5-vertex path in along order; an insertion on another
    path is untouched."""
    out = _cluster(spark, [
        ("A", "stable_street", 10.0),
        ("B", "stable_street", 85.0),
        ("C", "handyside", 10.0),
    ])
    applied = network.apply_connections_to_paths(_conn_paths(spark), out)
    row = {r["feature_id"]: r for r in applied.collect()}["stable_street"]
    assert row["n_vertices"] == 5
    assert row["labels"] == ["v0", "A", "v1", "B", "v2"]


def test_cluster_close_insertions(spark):
    """Mirror of TestClusterCloseInsertions: 10 m and 13 m merge under a
    4 m threshold (midpoint representative), 85 m stays separate."""
    out = _cluster(spark, [
        ("A", "stable_street", 10.0),
        ("B", "stable_street", 13.0),
        ("C", "stable_street", 85.0),
    ])
    rows = {r["point_id"]: r for r in out.collect()}
    assert rows["B"]["kind"] == "point" and rows["B"]["target"] == "A"
    assert rows["A"]["kind"] == "new" and rows["A"]["along_m"] == 11.5
    assert rows["C"]["kind"] == "new"
    applied = network.apply_connections_to_paths(_conn_paths(spark), out)
    row = {r["feature_id"]: r for r in applied.collect()}["stable_street"]
    assert row["n_vertices"] == 5
    assert row["labels"] == ["v0", "A", "v1", "C", "v2"]


def test_cluster_insertions_onto_existing_points(spark):
    """Mirror of TestClusterInsertionsOntoExistingPoints: 78 m and 80 m
    merge to 79 m, which is 3 m past the 76 m vertex -> snapped onto it
    (nearer side under threshold); 85 m survives as a new vertex."""
    out = _cluster(spark, [
        ("A", "stable_street", 78.0),
        ("B", "stable_street", 80.0),
        ("C", "stable_street", 85.0),
    ])
    rows = {r["point_id"]: r for r in out.collect()}
    assert rows["B"]["kind"] == "point" and rows["B"]["target"] == "A"
    assert rows["A"]["kind"] == "vertex" and rows["A"]["target"] == "1"
    assert rows["C"]["kind"] == "new"
    applied = network.apply_connections_to_paths(_conn_paths(spark), out)
    row = {r["feature_id"]: r for r in applied.collect()}["stable_street"]
    assert row["n_vertices"] == 4
    assert row["labels"] == ["v0", "v1", "C", "v2"]


def test_resolve_connection_targets_follows_chains(spark):
    """Mirror of Cluster()'s clustered-map chain following: B merged into
    A, A snapped onto vertex 1 -> B's final attachment is vertex 1 (the
    reference rewrites addition endpoints the same way)."""
    out = _cluster(spark, [
        ("A", "stable_street", 78.0),
        ("B", "stable_street", 80.0),
        ("C", "stable_street", 85.0),
    ])
    res = {r["point_id"]: r for r in network.resolve_connection_targets(out).collect()}
    assert res["A"]["attach_kind"] == "vertex" and res["A"]["attach_to"] == "1"
    assert res["B"]["attach_kind"] == "vertex" and res["B"]["attach_to"] == "1"
    assert res["C"]["attach_kind"] == "self" and res["C"]["attach_to"] is None
    # merge-only chain: B attaches to A's new vertex
    out2 = _cluster(spark, [
        ("A", "stable_street", 10.0),
        ("B", "stable_street", 13.0),
    ])
    res2 = {r["point_id"]: r for r in network.resolve_connection_targets(out2).collect()}
    assert res2["A"]["attach_kind"] == "self"
    assert res2["B"]["attach_kind"] == "point" and res2["B"]["attach_to"] == "A"
    assert res2["B"]["along_m"] == 11.5


def test_cluster_connections_edge_cases(spark):
    """Empty insertions produce an empty frame; insertions on a path
    with no known geometry still cluster (pass 1) but skip vertex
    snapping; a single insertion survives untouched."""
    empty = spark.createDataFrame([], "point_id string, path_id string, along_m double")
    assert network.cluster_connections(empty, _conn_paths(spark), 4.0).count() == 0
    ins = spark.createDataFrame(
        [("A", "ghost_path", 10.0), ("B", "ghost_path", 12.0), ("C", "ghost_path", 50.0)],
        "point_id string, path_id string, along_m double",
    )
    rows = {r["point_id"]: r for r in network.cluster_connections(ins, _conn_paths(spark), 4.0).collect()}
    assert rows["A"]["kind"] == "new" and rows["B"]["kind"] == "point" and rows["C"]["kind"] == "new"
    one = spark.createDataFrame([("A", "stable_street", 40.0)],
                                "point_id string, path_id string, along_m double")
    r = network.cluster_connections(one, _conn_paths(spark), 4.0).collect()
    assert len(r) == 1 and r[0]["kind"] == "new" and r[0]["along_m"] == 40.0


def test_elevation_field_reference_fixture(spark):
    """Mirrors b6's TestElevationField (elevation_test.go:11-28): four
    spot heights around a query point, radius 500 m, weight 1/d --
    the estimate lands within 30% of the surveyed 54.0 m."""
    from diagonal_b6_spark.operators import network as net_ops

    spots = spark.createDataFrame(
        [
            (55.9913178, -3.4858895, 28.9),
            (55.9895487, -3.4857895, 39.8),
            (55.9895694, -3.4825841, 50.8),
            (55.9914559, -3.4826242, 34.3),
        ],
        "lat double, lng double, elev double",
    )
    pts = spark.createDataFrame(
        [("q", 55.9905299, -3.4841599)], "image_id string, lat double, lng double"
    )
    out = net_ops.elevation_idw(pts, spots, radius_m=500.0).collect()
    assert len(out) == 1
    assert abs(out[0].elev - 54.0) / 54.0 < 0.3


def test_elevation_strict_radius(spark):
    """elevation.go:53 uses d < Radius: a spot exactly AT the radius is
    excluded (no elevation row when nothing else is in range)."""
    from diagonal_b6_spark.operators import network as net_ops
    from diagonal_b6_spark.operators import gridjoin

    lat0, lng0 = 51.5, -0.1
    # place one spot ~600 m away, radius 500 -> excluded entirely
    spots = spark.createDataFrame(
        [(lat0 + 600.0 / 111195.0, lng0, 10.0)], "lat double, lng double, elev double"
    )
    pts = spark.createDataFrame(
        [("q", lat0, lng0)], "image_id string, lat double, lng double"
    )
    assert net_ops.elevation_idw(pts, spots, radius_m=500.0).count() == 0


def test_annotate_elevations_terrain_semantics(spark):
    """b6-ingest-terrain.go:185-215: only point features lying on a
    #highway path gain ele; the value is Go math.Round (half away from
    zero) of the strict-radius IDW estimate, stringified."""
    from diagonal_b6_spark.operators import network as net_ops

    lat0, lng0 = 51.5, -0.1
    d = 100.0 / 111195.0  # ~100 m in degrees lat
    feats = spark.createDataFrame(
        [
            # highway path through (lat0, lng0) and (lat0+d, lng0)
            ("path/h", "path", "t", {"#highway": "primary"}, [lng0, lng0], [lat0, lat0 + d], [0]),
            # service path (no #highway) through (lat0+5d, lng0)
            ("path/s", "path", "t", {"#service": "alley"}, [lng0, lng0], [lat0 + 5 * d, lat0 + 6 * d], [0]),
            # node on the highway
            ("point/on", "point", "t", {"name": "n"}, [lng0], [lat0], [0]),
            # node on the service path only
            ("point/service", "point", "t", {}, [lng0], [lat0 + 5 * d], [0]),
            # free-standing point
            ("point/free", "point", "t", {}, [lng0 + 5 * d], [lat0], [0]),
            # highway node with NO spot in radius
            ("point/far", "point", "t", {}, [lng0], [lat0 + d], [0]),
        ],
        fixtures.FEATURE_SCHEMA,
    )
    # two spots ~25 m either side of (lat0, lng0): IDW = mean = 36.5 -> "37"
    # (round half away from zero); nothing within 60 m of (lat0+d, lng0)
    s = 25.0 / 111195.0
    spots = spark.createDataFrame(
        [(lat0 + s, lng0, 36.0), (lat0 - s, lng0, 37.0)],
        "lat double, lng double, elev double",
    )
    out = net_ops.annotate_elevations(feats, spots, radius_m=60.0)
    tags = {r["feature_id"]: dict(r["tags"]) for r in out.collect()}
    assert tags["point/on"] == {"name": "n", "ele": "37"}
    assert "ele" not in tags["point/service"]
    assert "ele" not in tags["point/free"]
    assert "ele" not in tags["point/far"]
    assert tags["path/h"] == {"#highway": "primary"}  # non-points untouched
    assert out.count() == feats.count()


def test_annotate_elevations_rounds_half_away_from_zero(spark):
    """math.Round(-2.5) = -3, math.Round(2.5) = 3 (not banker's)."""
    from diagonal_b6_spark.operators import network as net_ops

    lat0, lng0 = 10.0, 10.0
    feats = spark.createDataFrame(
        [
            ("path/h", "path", "t", {"#highway": "x"}, [lng0, lng0 + 0.001], [lat0, lat0], [0]),
            ("point/a", "point", "t", {}, [lng0], [lat0], [0]),
            ("point/b", "point", "t", {}, [lng0 + 0.001], [lat0], [0]),
        ],
        fixtures.FEATURE_SCHEMA,
    )
    s = 10.0 / 111195.0
    spots = spark.createDataFrame(
        [
            (lat0 + s, lng0, 2.5), (lat0 - s, lng0, 2.5),
            (lat0 + s, lng0 + 0.001, -2.5), (lat0 - s, lng0 + 0.001, -2.5),
        ],
        "lat double, lng double, elev double",
    )
    out = net_ops.annotate_elevations(feats, spots, radius_m=30.0)
    tags = {r["feature_id"]: dict(r["tags"]) for r in out.collect()}
    assert tags["point/a"]["ele"] == "3"
    assert tags["point/b"]["ele"] == "-3"


def test_annotate_elevations_overwrites_existing_ele(spark):
    """AddTag semantics (fn change.go:20-45): an existing ele tag is
    REPLACED, not duplicated -- re-annotation and OSM points that
    already carry ele (peaks, survey points) must not crash with
    DUPLICATED_MAP_KEY."""
    from diagonal_b6_spark.operators import network as net_ops

    lat0, lng0 = 51.5, -0.1
    feats = spark.createDataFrame(
        [
            ("path/h", "path", "t", {"#highway": "x"}, [lng0, lng0 + 0.001], [lat0, lat0], [0]),
            ("point/peak", "point", "t", {"ele": "999", "name": "peak"}, [lng0], [lat0], [0]),
        ],
        fixtures.FEATURE_SCHEMA,
    )
    s = 10.0 / 111195.0
    spots = spark.createDataFrame(
        [(lat0 + s, lng0, 42.0)], "lat double, lng double, elev double"
    )
    out = net_ops.annotate_elevations(feats, spots, radius_m=30.0)
    tags = {r["feature_id"]: dict(r["tags"]) for r in out.collect()}
    assert tags["point/peak"] == {"name": "peak", "ele": "42"}


# --- ElevationWeights gain equivalence (graph/graph.go:163-212) -------------


def _go_gains(paths, pts):
    """Literal reimplementation of the reference's per-segment walk:
    split each path at graph nodes (ingest/basic.go:256-260), then run
    ElevationWeights' memory loop (graph.go:174-207) per segment, in
    vertex-index order.  Returns {(pid, i): signed_gain} per pair."""
    from collections import Counter

    refs = Counter(c for _, cs in paths for c in cs)

    def ele_of(c):
        t = pts.get(c)
        if not t or "ele" not in t:
            return None
        try:
            return float(t["ele"])
        except ValueError:
            return None

    out = {}
    for pid, cs in paths:
        def is_node(i):
            if i == 0 or i == len(cs) - 1:
                return True
            if refs[cs[i]] > 1:
                return True
            t = pts.get(cs[i])
            return bool(t)

        node_idx = [i for i in range(len(cs)) if is_node(i)]
        gains = [0.0] * (len(cs) - 1)
        for a, b in zip(node_idx, node_idx[1:]):
            elevation, from_memory = 0.0, False
            for i in range(a, b):
                start = ele_of(cs[i])
                if start is not None:
                    elevation, from_memory = start, True
                stop = ele_of(cs[i + 1])
                if from_memory and stop is not None:
                    gains[i] = stop - elevation
        for i, g in enumerate(gains):
            out[(pid, i)] = g
    return out


def _vk(lat, lng):
    import math

    q = lambda v: int(math.floor(v * 1e7 + 0.5))  # HALF_UP, positive inputs
    return q(lat) * 10_000_000_000 + q(lng + 360.0)


def test_elevation_gain_edges_matches_go_walk(spark):
    """Property: on seeded random worlds (shared-vertex junctions,
    tagged/junk/bare points), elevation_gain_edges' signed per-pair
    gains equal the reference algorithm run literally in Python."""
    import random

    from diagonal_b6_spark import fixtures
    from diagonal_b6_spark.operators.network import elevation_gain_edges

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        pool = [
            (51.5 + i * 0.001, -0.2 + j * 0.001)
            for i in range(4)
            for j in range(3)
        ]
        paths = []
        for p in range(6):
            n = rng.randint(2, 5)
            cs = rng.sample(pool, n)
            paths.append((f"path/t/{p}", cs))
        pts = {}
        for c in pool:
            r = rng.random()
            if r < 0.3:
                pts[c] = {"ele": str(rng.choice([10, 25.5, -4, 80]))}
            elif r < 0.45:
                pts[c] = {"ele": rng.choice(["93m", "junk", ""])}
            elif r < 0.6:
                pts[c] = {"amenity": "bench"}
            elif r < 0.7:
                pts[c] = {}
        rows = [
            {"feature_id": pid, "feature_type": "path", "ns": "t",
             "tags": {"#highway": "path"},
             "xs": [c[1] for c in cs], "ys": [c[0] for c in cs],
             "ring_offsets": [0]}
            for pid, cs in paths
        ] + [
            {"feature_id": f"point/t/{k}", "feature_type": "point", "ns": "t",
             "tags": t, "xs": [c[1]], "ys": [c[0]], "ring_offsets": [0]}
            for k, (c, t) in enumerate(pts.items())
        ]
        world = spark.createDataFrame(rows, fixtures.FEATURE_SCHEMA)
        got = {
            (r.path_id, r.src, r.dst): r.elev_gain_m
            for r in elevation_gain_edges(world).collect()
        }
        want = {}
        for pid, cs in paths:
            gains = _go_gains(paths, pts)
            for i in range(len(cs) - 1):
                u, v = _vk(*cs[i]), _vk(*cs[i + 1])
                g = gains[(pid, i)]
                want[(pid, u, v)] = g
                want[(pid, v, u)] = g
        assert got == want, (seed, {k: (got.get(k), want.get(k))
                                    for k in set(got) ^ set(want) | {
                                        k for k in want if got.get(k) != want[k]}})
