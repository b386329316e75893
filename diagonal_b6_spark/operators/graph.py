"""Graph / routing operators: b6's reachability family re-expressed for Spark.

The reference builds everything on one Dijkstra over street-graph Segment
edges with pluggable weights (reference: b6/graph/graph.go:316-532), run
in parallel across origins (fn graph.go:209-230).  Spark-first split:

* ``bounded_sssp`` -- Pregel-style iterative frontier relaxation: the
  distance table is re-joined to the edge table and min-aggregated per
  round.  Each round is one shuffle keyed by node; rounds are bounded the
  way b6 bounds traversal by cost budget (graph/graph.go:509-532).  This
  is THE scale path: the edge table can be 100 TB, partitioned by src, and
  every round is an ordinary equi-join Catalyst can plan (broadcast when
  the frontier is small, sort-merge otherwise).  Lineage is truncated with
  localCheckpoint every few rounds so plans don't grow unboundedly.

* ``dijkstra_per_origin`` -- exact Dijkstra inside ``applyInPandas``, one
  group per origin, mirroring b6's per-origin goroutine fan-out.  Right
  when the per-origin subgraph fits in one task (b6 itself bounds street
  networks at a 500 m connect threshold, fn graph.go:547-562); at scale
  the edge list handed to each group comes from a cell-cover subgraph
  extraction rather than a full broadcast.

* ``closest`` / ``reachable_count`` -- aggregations over the distance
  table (fn graph.go:402-446, 185-245).
"""

from __future__ import annotations

import heapq
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_edges(df: DataFrame, src: str = "src", dst: str = "dst", w: str = "w") -> DataFrame:
    """Collapse multi-edges to their minimum weight (the only edge a
    shortest path can use)."""
    return df.groupBy(src, dst).agg(F.min(w).alias(w))


def undirected(edges: DataFrame) -> DataFrame:
    """Add reverse edges (b6 walking weights are symmetric;
    one-way handling is a weight-column concern, graph/graph.go:87-126)."""
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w")
    )
    return edges.unionByName(rev)


def bounded_sssp(
    edges: DataFrame,
    origins: DataFrame,
    rounds: int,
    max_cost: float | None = None,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Multi-source shortest path, bounded at `rounds` hops.

    origins: DataFrame[origin, node] (an origin may seed several nodes).
    Returns DataFrame[origin, node, dist] -- min cost within <= rounds
    edges, optionally pruned at max_cost (b6's cost-budget bound).
    """
    dist = origins.select("origin", "node", F.lit(0.0).alias("dist"))
    for r in range(rounds):
        d, e = dist.alias("d"), edges.alias("e")
        relaxed = d.join(e, F.col("d.node") == F.col("e.src"), "inner").select(
            F.col("d.origin").alias("origin"),
            F.col("e.dst").alias("node"),
            (F.col("d.dist") + F.col("e.w")).alias("dist"),
        )
        if max_cost is not None:
            relaxed = relaxed.filter(F.col("dist") <= max_cost)
        dist = (
            dist.unionByName(relaxed)
            .groupBy("origin", "node")
            .agg(F.min("dist").alias("dist"))
        )
        if (r + 1) % checkpoint_every == 0 and r + 1 < rounds:
            dist = dist.localCheckpoint(eager=True)
    return dist


def closest(
    dist: DataFrame, targets: DataFrame, target_node: str = "node"
) -> DataFrame:
    """Per-origin nearest matching target (fn graph.go:402-446): the
    min-dist target node reachable, deterministic tie-break on node id."""
    hits = dist.join(targets, dist["node"] == targets[target_node], "leftsemi")
    return (
        hits.groupBy("origin")
        .agg(
            F.min(F.struct(F.col("dist"), F.col("node"))).alias("best"),
        )
        .select("origin", F.col("best.node").alias("node"), F.col("best.dist").alias("dist"))
    )


def reachable_count(dist: DataFrame, max_cost: float) -> DataFrame:
    """accessible-all summary: how many nodes each origin reaches within
    the budget (fn graph.go:185-245 -> groupBy shape)."""
    return (
        dist.filter(F.col("dist") <= max_cost)
        .groupBy("origin")
        .agg(F.count("*").alias("n_reachable"))
    )


def dijkstra_per_origin(
    origins: DataFrame,
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_w: np.ndarray,
    max_cost: float | None = None,
) -> DataFrame:
    """Exact Dijkstra per origin group under applyInPandas.

    The edge arrays are captured in the task closure (broadcast once per
    executor).  Appropriate when the (sub)graph fits a task -- the b6
    street-network case; for planetary graphs, extract the cell-bounded
    subgraph per origin first and cogroup instead.

    Returns DataFrame[origin, node, dist, pred] with pred = predecessor
    node on the shortest path tree (-1 at the origin), which is what
    `accessible-routes` / `paths-to-reach` consume (fn graph.go:312-339,
    451-499).
    """
    n = int(max(edge_src.max(initial=0), edge_dst.max(initial=0))) + 1
    # CSR adjacency built once per executor from the closure arrays
    order = np.argsort(edge_src, kind="stable")
    s_sorted = edge_src[order]
    starts = np.searchsorted(s_sorted, np.arange(n + 1))
    d_sorted = edge_dst[order]
    w_sorted = edge_w[order]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for origin, seed in zip(pdf["origin"], pdf["node"]):
            dist = {int(seed): 0.0}
            pred = {int(seed): -1}
            heap = [(0.0, int(seed))]
            while heap:
                d, u = heapq.heappop(heap)
                if d > dist.get(u, np.inf):
                    continue
                if u >= n:  # isolated seed: present in origins, no edges
                    continue
                for k in range(starts[u], starts[u + 1]):
                    v = int(d_sorted[k])
                    nd = d + float(w_sorted[k])
                    if max_cost is not None and nd > max_cost:
                        continue
                    if nd < dist.get(v, np.inf):
                        dist[v] = nd
                        pred[v] = u
                        heapq.heappush(heap, (nd, v))
            for node, d in dist.items():
                out.append((int(origin), node, d, pred[node]))
        return pd.DataFrame(out, columns=["origin", "node", "dist", "pred"])

    return origins.groupBy("origin").applyInPandas(
        run, schema="origin long, node long, dist double, pred long"
    )


def building_access(
    dist: DataFrame, buildings: DataFrame, max_cost: float
) -> DataFrame:
    """`building-access` / `filter-accessible` (fn access.go:10-42):
    buildings reachable within the cost budget per origin -- a semi-join
    of the distance table against the building node set plus the budget
    filter.  Returns (origin, node, dist)."""
    hits = dist.join(buildings, "node", "leftsemi")
    return hits.filter(F.col("dist") <= max_cost).select("origin", "node", "dist")


def reachable_area(dist: DataFrame, nodes: DataFrame, max_cost: float) -> DataFrame:
    """`reachable-area` (fn graph.go:503-519): convex-hull area of the
    node locations reachable within budget, per origin.  nodes:
    DataFrame[node, lat, lng]."""
    from ..kernels import geom as _geom

    pts = (
        dist.filter(F.col("dist") <= max_cost)
        .join(nodes, "node")
        .select("origin", "lat", "lng")
    )

    def hull_area(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["lng"].to_numpy()
        y = pdf["lat"].to_numpy()
        if len(x) < 3:
            return pd.DataFrame({"origin": [pdf["origin"].iloc[0]], "area_m2": [0.0]})
        idx = _geom.convex_hull(x, y)
        area = _geom.spherical_ring_area_m2(x[idx], y[idx])
        return pd.DataFrame({"origin": [pdf["origin"].iloc[0]], "area_m2": [area]})

    return pts.groupBy("origin").applyInPandas(hull_area, schema="origin long, area_m2 double")


def origin_subgraph_edges(
    edges: DataFrame, origins: DataFrame, max_rounds: int = 64
) -> DataFrame:
    """Per-origin reachable edge set: (origin, src, dst, w) rows covering
    every edge whose source is reachable from the origin.

    Distributed BFS closure (frontier expansion until fixpoint or
    max_rounds) -- the cell-bounded subgraph extraction that replaces
    shipping the whole edge table in a task closure.  Each round is one
    equi-join shuffle; lineage is truncated per round.  This is the feed
    for ``dijkstra_cogrouped``."""
    reached = origins.select("origin", "node").distinct()
    frontier = reached
    for _ in range(max_rounds):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select("origin", F.col("dst").alias("node"))
            .distinct()
            .join(reached, ["origin", "node"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        reached = reached.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return reached.join(edges, reached["node"] == edges["src"]).select(
        "origin", "src", "dst", "w"
    )


def dijkstra_cogrouped(
    origins: DataFrame,
    edges: DataFrame,
    max_cost: float | None = None,
    max_rounds: int = 64,
) -> DataFrame:
    """Exact per-origin Dijkstra with a DISTRIBUTED edge feed: the
    per-origin subgraph (``origin_subgraph_edges``) is cogrouped with the
    origin's seed rows, so no task ever sees more than one origin's
    subgraph and the driver never materializes the edge table
    (b6 per-origin goroutine fan-out, fn graph.go:209-230, at cluster
    scale).  Returns DataFrame[origin, node, dist, pred]."""
    # re-id the subgraph's output attributes: it descends from `origins`,
    # and cogrouping two frames that share attribute ids trips the
    # analyzer's ambiguous-self-join check when origins/edges also share
    # an upstream lineage (one world table feeding both)
    sub = origin_subgraph_edges(edges, origins, max_rounds).toDF(
        "origin", "src", "dst", "w"
    )

    def run(key, seeds: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
        adj: dict[int, list[tuple[int, float]]] = {}
        for s, d, w in zip(e["src"], e["dst"], e["w"]):
            adj.setdefault(int(s), []).append((int(d), float(w)))
        out = []
        for origin, seed in zip(seeds["origin"], seeds["node"]):
            dist = {int(seed): 0.0}
            pred = {int(seed): -1}
            heap = [(0.0, int(seed))]
            while heap:
                d, u = heapq.heappop(heap)
                if d > dist.get(u, np.inf):
                    continue
                for v, w in adj.get(u, ()):
                    nd = d + w
                    if max_cost is not None and nd > max_cost:
                        continue
                    if nd < dist.get(v, np.inf):
                        dist[v] = nd
                        pred[v] = u
                        heapq.heappush(heap, (nd, v))
            for node, d in dist.items():
                out.append((int(origin), node, d, pred[node]))
        return pd.DataFrame(out, columns=["origin", "node", "dist", "pred"])

    return (
        origins.groupBy("origin")
        .cogroup(sub.groupBy("origin"))
        .applyInPandas(run, schema="origin long, node long, dist double, pred long")
    )


def routes_from_pred(
    pred_routes: DataFrame, dests: DataFrame, pairs: DataFrame | None = None
) -> DataFrame:
    """`accessible-routes` step rebuild (reference fn graph.go:312-339 +
    BuildRoute b6/graph/graph.go:534-552): for every (origin, dest)
    pair with dest reachable, emit the ORDERED shortest-path step list
    origin -> dest as (origin, dest, step_idx, node, cum_cost) rows --
    step_idx 0 at the origin, cum_cost = shortest-path cost to that step.

    pred_routes: (origin, node, dist, pred) -- the oracle-verified
    shortest-path-tree output of ``dijkstra_cogrouped``.  dests:
    DataFrame[node], the destination set (applied to every origin, the
    accessible-routes shape: routes to every matched feature).

    Fully distributed: the dest set is replicated per origin with a
    cross join (dests are a query result -- small next to the corpus)
    and COGROUPED with the origin's tree, so each task walks only one
    origin's predecessor map and the driver never materializes
    anything.  The walk is O(sum of path lengths) per origin."""
    # rename through an alias so the replicated-dest side carries fresh
    # attribute ids (both cogroup sides derive from pred_routes, which
    # otherwise trips Spark's ambiguous-self-join detection)
    if pairs is not None:
        # restricted form: walk only the requested (origin, node) pairs
        # -- the every-dest-per-origin cross join below is the
        # accessible-routes shape, but quadratic when callers (e.g.
        # transit conflation's leg stitch) need one dest per origin
        per_origin_dests = pairs.select("origin", "node").distinct()
    else:
        origins_only = pred_routes.select(
            F.col("origin").alias("_rp_origin")
        ).distinct()
        per_origin_dests = origins_only.crossJoin(dests.select("node")).select(
            F.col("_rp_origin").alias("origin"), "node"
        )

    def walk(key, tree: pd.DataFrame, dd: pd.DataFrame) -> pd.DataFrame:
        pred = dict(zip(tree["node"].astype(int), tree["pred"].astype(int)))
        dist = dict(zip(tree["node"].astype(int), tree["dist"].astype(float)))
        out = []
        for origin, dest in zip(dd["origin"], dd["node"]):
            dest = int(dest)
            if dest not in pred:
                continue  # unreachable within the budget
            chain = []
            u = dest
            while u != -1:
                chain.append(u)
                u = pred[u]
            chain.reverse()
            for i, node in enumerate(chain):
                out.append((int(origin), dest, i, node, dist[node]))
        return pd.DataFrame(
            out, columns=["origin", "dest", "step_idx", "node", "cum_cost"]
        )

    return (
        pred_routes.groupBy("origin")
        .cogroup(per_origin_dests.groupBy("origin"))
        .applyInPandas(
            walk,
            schema="origin long, dest long, step_idx int, node long, cum_cost double",
        )
    )


def paths_to_reach(routes: DataFrame) -> DataFrame:
    """Edge-usage counts across all shortest-path trees
    (fn graph.go:451-499): every (pred -> node) edge of every origin's
    tree, counted over origins."""
    return (
        routes.filter(F.col("pred") >= 0)
        .groupBy(F.col("pred").alias("src"), F.col("node").alias("dst"))
        .agg(F.count("*").alias("n_paths"))
    )


def interpolate_shortest_path_distances(segments: DataFrame) -> DataFrame:
    """Per-vertex distances along a path segment whose two ends sit at
    known shortest-path distances (graph.go:266-298
    interpolateShortestPathDistances -- the forward/backward relaxation
    with early break reduces to an elementwise
    min(first + cum_i, last + (total - cum_i)) over the vertices walked
    from `first` to `last`; an infinite end leaves one-sided
    interpolation).  The OD-cost renderer uses this to colour segment
    interiors between graph nodes.

    Input columns: (xs, ys, first int, last int, first_m double,
    last_m double) plus any id columns; adds `dists array<double>`
    (meters, ordered from `first` toward `last`).  One Arrow batch per
    partition, vectorized haversine inside."""

    @F.pandas_udf("array<double>")
    def interp(
        xs: pd.Series, ys: pd.Series, first: pd.Series, last: pd.Series,
        first_m: pd.Series, last_m: pd.Series,
    ) -> pd.Series:
        from ..kernels.geom import cum_arc_length_m

        out = []
        for x, y, f, l, fm, lm in zip(xs, ys, first, last, first_m, last_m):
            f, l = int(f), int(l)
            step = 1 if l >= f else -1
            idx = np.arange(f, l + step, step)
            cum = cum_arc_length_m(
                np.asarray(x, dtype=np.float64)[idx],
                np.asarray(y, dtype=np.float64)[idx],
            )
            total = cum[-1]
            d = np.minimum(float(fm) + cum, float(lm) + (total - cum))
            out.append(d.tolist())
        return pd.Series(out)

    return segments.withColumn(
        "dists",
        interp(
            F.col("xs"), F.col("ys"), F.col("first"), F.col("last"),
            F.col("first_m"), F.col("last_m"),
        ),
    )
