"""Graph/routing operators (SURVEY.md §2.9): bounded relaxation vs the
DuckDB unrolled oracle, and exact Dijkstra vs the iterative path run to
convergence on the same DAG."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark import catalog
from diagonal_b6_spark.operators import graph as graph_ops

SF = "/root/testdata/sf0.001"


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


@pytest.mark.parametrize("name", ["graph_sssp", "graph_closest", "graph_reachable"])
def test_graph_oracle_parity(spark, name):
    got = sorted(tuple(r) for r in catalog.QUERIES[name](spark, SF).collect())
    want = _oracle(catalog.ORACLES[name])
    assert got == want


def test_dijkstra_matches_converged_relaxation(spark):
    """On a DAG, relaxation run for >= longest-path rounds equals exact
    Dijkstra distances."""
    edges = catalog._graph_edges(spark, SF)
    origins = catalog._graph_origins(spark)
    # DAG on 500 ordered nodes: 16 rounds is far beyond its depth at sf0.001
    converged = graph_ops.bounded_sssp(edges, origins, rounds=16)
    e = edges.toPandas()
    routes = graph_ops.dijkstra_per_origin(
        origins,
        e["src"].to_numpy(np.int64),
        e["dst"].to_numpy(np.int64),
        e["w"].to_numpy(np.float64),
    )
    a = {(r["origin"], r["node"]): r["dist"] for r in converged.collect()}
    b = {(r["origin"], r["node"]): r["dist"] for r in routes.collect()}
    assert a == b


def test_dijkstra_pred_forms_tree(spark):
    """Every non-origin node's predecessor is itself reachable and the
    pred edge weight is consistent with the distance delta."""
    edges = catalog._graph_edges(spark, SF)
    e = edges.toPandas()
    w = {(s, d): ww for s, d, ww in zip(e["src"], e["dst"], e["w"])}
    routes = graph_ops.dijkstra_per_origin(
        catalog._graph_origins(spark),
        e["src"].to_numpy(np.int64),
        e["dst"].to_numpy(np.int64),
        e["w"].to_numpy(np.float64),
    ).collect()
    dist = {(r["origin"], r["node"]): r["dist"] for r in routes}
    n_edges_checked = 0
    for r in routes:
        if r["pred"] < 0:
            assert r["dist"] == 0.0
            continue
        key = (r["pred"], r["node"])
        assert key in w
        assert abs(dist[(r["origin"], r["pred"])] + w[key] - r["dist"]) < 1e-9
        n_edges_checked += 1
    assert n_edges_checked > 0


def test_paths_to_reach_counts(spark):
    out = catalog.q_graph_paths_to_reach(spark, SF).collect()
    assert len(out) > 0
    # usage counts bounded by the number of origins
    assert all(1 <= r["n_paths"] <= catalog.GRAPH_N_ORIGINS for r in out)


def test_undirected_doubles_edges(spark):
    edges = catalog._graph_edges(spark, SF)
    assert graph_ops.undirected(edges).count() == 2 * edges.count()


def test_max_cost_prunes(spark):
    edges = catalog._graph_edges(spark, SF)
    origins = catalog._graph_origins(spark)
    full = graph_ops.bounded_sssp(edges, origins, rounds=3)
    pruned = graph_ops.bounded_sssp(edges, origins, rounds=3, max_cost=20.0)
    assert pruned.filter(F.col("dist") > 20.0).count() == 0
    assert pruned.count() <= full.count()


def test_dijkstra_cogrouped_matches_closure_variant(spark):
    """The distributed (cogrouped subgraph) feed must equal the
    closure-fed per-origin Dijkstra exactly."""
    import numpy as np

    edges = catalog._graph_edges(spark, SF)
    origins = catalog._graph_origins(spark)
    e = edges.toPandas()
    closure = graph_ops.dijkstra_per_origin(
        origins,
        e["src"].to_numpy(np.int64),
        e["dst"].to_numpy(np.int64),
        e["w"].to_numpy(np.float64),
    )
    cg = graph_ops.dijkstra_cogrouped(origins, edges)
    a = {(r.origin, r.node): r.dist for r in closure.collect()}
    b = {(r.origin, r.node): r.dist for r in cg.collect()}
    assert set(a) == set(b)
    assert all(abs(a[k] - b[k]) < 1e-9 for k in a)


def test_dijkstra_isolated_seed_does_not_crash(spark):
    """A seed node with no incident edges returns dist=0 for itself
    (round-1 ADVICE: CSR sizing from edge endpoints only crashed)."""
    import numpy as np

    origins = spark.createDataFrame([(0, 10_000)], "origin long, node long")
    out = graph_ops.dijkstra_per_origin(
        origins,
        np.array([0, 1], dtype=np.int64),
        np.array([1, 2], dtype=np.int64),
        np.array([1.0, 1.0]),
    ).collect()
    assert [(r.origin, r.node, r.dist) for r in out] == [(0, 10_000, 0.0)]


def test_routes_from_pred_step_semantics(spark):
    """accessible-routes rebuild: every emitted route starts at the
    origin (step 0, cost 0), ends at the dest with the shortest-path
    cost, follows pred edges (each step's node is the next step's
    predecessor), and has strictly increasing cum_cost on positive
    weights."""
    from pyspark.sql import functions as F

    edges = catalog._graph_edges(spark, SF)
    origins = catalog._graph_origins(spark)
    tree = graph_ops.dijkstra_cogrouped(origins, edges)
    dests = spark.range(0, 500, 7).filter("id > 0").select(F.col("id").alias("node"))
    out = graph_ops.routes_from_pred(tree, dests).collect()
    assert out, "no routes produced"

    dist = {(r.origin, r.node): r.dist for r in tree.collect()}
    pred = {(r.origin, r.node): r.pred for r in tree.collect()}
    routes = {}
    for r in out:
        routes.setdefault((r.origin, r.dest), []).append(r)
    for (origin, dest), steps in routes.items():
        steps.sort(key=lambda r: r.step_idx)
        assert [s.step_idx for s in steps] == list(range(len(steps)))
        assert steps[0].node == origin and steps[0].cum_cost == 0.0
        assert steps[-1].node == dest
        assert abs(steps[-1].cum_cost - dist[(origin, dest)]) < 1e-9
        for a, b in zip(steps, steps[1:]):
            assert pred[(origin, b.node)] == a.node  # follows the tree
            assert b.cum_cost > a.cum_cost
    # unreachable dests emit nothing; reachable ones emit exactly once
    reach = {(o, d) for (o, d) in dist if d % 7 == 0 and d > 0}
    assert set(routes) == reach


def test_weights_from_options_reference_cases(spark):
    """Mirrors fn graph_test.go TestWeightsFromOptions: transit mode with
    walk:speed override; elevation with downhill penalty 1.2 and the
    uphill default 1.0; junk floats and unknown modes raise."""
    import pytest

    from diagonal_b6_spark.operators import weights as w_ops

    edges = spark.createDataFrame(
        [
            (1, 2, 125.0, 0.0, None, None),
            (2, 3, 100.0, -10.0, None, None),   # 10 m descent
            (3, 4, 100.0, 10.0, None, None),    # 10 m ascent
            (4, 5, 50.0, 0.0, 42.0, 77.0),      # a GTFS edge with timed hops
        ],
        "src long, dst long, dist_m double, elev_gain_m double, "
        "gtfs_peak_s double, gtfs_offpeak_s double",
    )

    # case 1 (graph_test.go:93-105): transit + walk:speed=7.6, peak default
    out = {
        (r.src, r.dst): r.w
        for r in w_ops.weights_from_options(
            edges, {"mode": "transit", "walk:speed": "7.6"}
        ).collect()
    }
    assert out[(1, 2)] == pytest.approx(125.0 * 7.6)
    assert out[(4, 5)] == 42.0  # GTFS peak time wins over walk time

    # peak=no flips to the off-peak column (graph.go:300-305)
    out = {
        (r.src, r.dst): r.w
        for r in w_ops.weights_from_options(
            edges, {"mode": "transit", "peak": "no"}
        ).collect()
    }
    assert out[(4, 5)] == 77.0

    # case 2 (graph_test.go:107-129): elevation, downhill=1.2, uphill
    # defaults to 1.0; walk:speed=8.7
    out = {
        (r.src, r.dst): r.w
        for r in w_ops.weights_from_options(
            edges,
            {"mode": "transit", "elevation": "true",
             "elevation:downhill": "1.2", "walk:speed": "8.7"},
        ).collect()
    }
    assert out[(2, 3)] == pytest.approx(100.0 * 8.7 + 10.0 * 6.0 * 1.2)
    assert out[(3, 4)] == pytest.approx(100.0 * 8.7 + 10.0 * 6.0 * 1.0)
    # bare walk mode: NO elevation penalty, default 1.25 m/s speed
    out = {
        (r.src, r.dst): r.w
        for r in w_ops.weights_from_options(edges, {}).collect()
    }
    assert out[(3, 4)] == pytest.approx(100.0 * 1.25)

    with pytest.raises(ValueError, match="mode=walk or mode=transit"):
        w_ops.weights_from_options(edges, {"mode": "flying"})
    with pytest.raises(ValueError, match="float string for walk:speed"):
        w_ops.weights_from_options(edges, {"walk:speed": "fast"})


def test_weight_factor_column(spark):
    """weightFromSegment's diagonal:weight factor (graph.go:22-30):
    a weight_factor column multiplies the effective length."""
    from diagonal_b6_spark.operators import weights as w_ops

    edges = spark.createDataFrame(
        [(1, 2, 100.0, 2.0), (2, 3, 100.0, None)],
        "src long, dst long, dist_m double, weight_factor double",
    )
    out = {
        (r.src, r.dst): r.w
        for r in w_ops.weights_from_options(edges, {"walk:speed": "1.0"}).collect()
    }
    assert out[(1, 2)] == 200.0 and out[(2, 3)] == 100.0


def test_interpolate_shortest_path_distances_reference_vectors(spark):
    """graph_test.go:201-244 TestInterpolateShortestPathDistances: the
    reference's own way 558345071 with all four first/last cases,
    expected values within 1 m."""
    import math

    from diagonal_b6_spark.operators import graph as graph_ops

    xs = [-0.1272493, -0.1271810, -0.1271628, -0.1270125]
    ys = [51.5358664, 51.5359780, 51.5360033, 51.5362126]
    n = len(xs)
    cases = [
        (0, n - 1, 100.0, 200.0, [100.0, 113.0, 116.0, 141.0]),
        (0, n - 1, 100.0, 50.0, [91.0, 78.0, 75.0, 50.0]),
        (n - 1, 0, 200.0, 100.0, [141.0, 116.0, 113.0, 100.0]),
        (0, n - 1, 100.0, math.inf, [100.0, 113.0, 116.0, 141.0]),
    ]
    rows = [
        (i, xs, ys, f, l, fm, lm) for i, (f, l, fm, lm, _) in enumerate(cases)
    ]
    df = spark.createDataFrame(
        rows,
        "case_id int, xs array<double>, ys array<double>, first int, last int, "
        "first_m double, last_m double",
    )
    got = {
        r["case_id"]: r["dists"]
        for r in graph_ops.interpolate_shortest_path_distances(df).collect()
    }
    for i, (_, _, _, _, want) in enumerate(cases):
        assert len(got[i]) == len(want)
        for g, w in zip(got[i], want):
            assert abs(g - w) <= 1.0, (i, got[i], want)


def test_shortest_path_with_overridden_weight(spark):
    """graph_test.go:58-98 TestShortestPathWithOverriddenWeight: between
    the two Royal College Street intersections the direct road wins; a
    diagonal:weight=0.1 tag on the cycleway re-routes down it."""
    from diagonal_b6_spark.operators import weights as w_ops
    from diagonal_b6_spark.operators.network import _vertex_key, elevation_gain_edges

    I1 = (51.5409703, -0.1376308)
    I2 = (51.5416858, -0.1382541)
    MID = (51.5416379, -0.1382604)

    def world(cycle_tags):
        rows = [
            {"feature_id": "path/osm/835622320", "feature_type": "path",
             "ns": "osm", "tags": {"#highway": "primary"},
             "xs": [I1[1], I2[1]], "ys": [I1[0], I2[0]], "ring_offsets": [0]},
            {"feature_id": "path/osm/835622319", "feature_type": "path",
             "ns": "osm", "tags": cycle_tags,
             "xs": [I1[1], MID[1], I2[1]], "ys": [I1[0], MID[0], I2[0]],
             "ring_offsets": [0]},
        ]
        from diagonal_b6_spark import fixtures
        return spark.createDataFrame(rows, fixtures.FEATURE_SCHEMA)

    def route_ways(w):
        edges = elevation_gain_edges(w)
        weighted = w_ops.weights_from_options(edges, {"walk:speed": "1.0"})
        origins = spark.createDataFrame([(1,)], "origin long").crossJoin(
            spark.range(1).select(
                _vertex_key(F.lit(I1[0]), F.lit(I1[1])).alias("node"))
        )
        dist = graph_ops.dijkstra_cogrouped(origins, weighted, max_cost=500.0)
        dests = spark.range(1).select(
            _vertex_key(F.lit(I2[0]), F.lit(I2[1])).alias("node"))
        routes = graph_ops.routes_from_pred(dist, dests)
        a = routes.select(
            "origin", "dest", (F.col("step_idx") + 1).alias("step_idx"),
            F.col("node").alias("u"))
        b = routes.select("origin", "dest", "step_idx", F.col("node").alias("v"))
        hit = a.join(b, ["origin", "dest", "step_idx"]).join(
            edges.select("path_id", "src", "dst").distinct(),
            (F.col("u") == F.col("src")) & (F.col("v") == F.col("dst")))
        return {r.path_id for r in hit.select("path_id").distinct().collect()}

    assert route_ways(world({"#highway": "cycleway"})) == {"path/osm/835622320"}
    assert route_ways(
        world({"#highway": "cycleway", "diagonal:weight": "0.1"})
    ) == {"path/osm/835622319"}
