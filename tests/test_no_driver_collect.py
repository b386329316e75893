"""Scale-shape guards: operator modules must not materialize
data-dependent tables on the driver (round-1 VERDICT items 2-3).

Two layers of evidence:
  1. source scan: no .collect()/.toPandas() in the operator modules
     (catalog-level scalar aggregates are allowed and live elsewhere);
  2. laziness probe: constructing each rewritten operator's DataFrame
     must launch ZERO Spark jobs -- the round-1 versions collected their
     small side at construction time.
"""

import inspect
import time

import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark.operators import (
    colouring,
    conflate,
    geo_fn,
    gridjoin,
    network,
    render,
    sightline,
)
from diagonal_b6_spark.operators import change as change_ops
from diagonal_b6_spark.operators import graph as graph_ops
from diagonal_b6_spark.sources import osm as osm_src
from diagonal_b6_spark.sources import uprn

# change_ops.apply_changes runs ONE bounded action (`take(8)` over the
# validation-error table) -- the transactional all-or-nothing gate, eager
# in the reference too (ingest/change.go:160-186).  Everything else in
# the guarded modules must stay lazy.
FORBIDDEN = (".collect()", ".toPandas()")
from diagonal_b6_spark.operators import compare as compare_ops

from diagonal_b6_spark.operators import dedup as dedup_ops
from diagonal_b6_spark.operators import sampling as sampling_ops
from diagonal_b6_spark.operators import text as text_ops
from diagonal_b6_spark.streaming import windows as stream_windows

MODULES = [network, sightline, gridjoin, colouring, conflate, render, uprn,
           osm_src, change_ops, compare_ops, dedup_ops, text_ops,
           sampling_ops, stream_windows]


@pytest.mark.parametrize("mod", MODULES, ids=lambda m: m.__name__)
def test_no_driver_materialization_in_source(mod):
    src = inspect.getsource(mod)
    for needle in FORBIDDEN:
        assert needle not in src, f"{mod.__name__} contains {needle}"


def test_snap_and_sightline_sources_clean():
    for fn in (geo_fn.snap_area_edges, sightline.sightline):
        src = inspect.getsource(fn)
        for needle in FORBIDDEN:
            assert needle not in src, f"{fn.__name__} contains {needle}"


def _n_jobs(spark):
    tracker = spark.sparkContext.statusTracker()
    return len(tracker.getJobIdsForGroup(None) or [])


def test_operator_construction_is_lazy(spark):
    """Building the operator DataFrames runs no Spark job (the collect-
    based round-1 versions ran jobs here)."""
    from diagonal_b6_spark import fixtures

    pts = spark.range(10).select(
        F.col("id").alias("pid"),
        (F.lit(51.5) + F.col("id") * 0.001).alias("lat"),
        (F.lit(-0.1) + F.col("id") * 0.001).alias("lng"),
    )
    feats = fixtures.features_table(spark)
    paths = feats.filter(F.col("feature_type") == "path")
    areas = feats.filter(F.col("feature_type") == "area")
    spots = pts.select("lat", "lng", F.col("pid").cast("double").alias("elev"))
    origins = pts.select(F.col("pid").alias("origin_id"), "lat", "lng")
    edges = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, w double")

    stops = pts.select(F.col("pid").alias("stop_id"), "lat", "lng")
    before = _n_jobs(spark)
    network.connect_to_network(pts, paths, 500.0, point_id="pid")
    network.elevation_idw(pts, spots, 3000.0, point_id="pid")
    geo_fn.snap_area_edges(areas, paths, 40.0)
    sightline.sightline(origins, areas, 300.0)
    colouring.area_adjacency(areas)  # (colour_areas itself iterates)
    conflate.project_stops(stops, paths)
    render.stage_basemap_features(feats, 14)
    nodes = pts.select(
        F.col("pid").alias("id"), "lat", F.col("lng").alias("lon"),
        F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        ).alias("tags"),
    )
    ways = spark.createDataFrame(
        [(1, [0, 1, 2], {})], "id long, refs array<long>, tags map<string,string>"
    )
    moves = spark.createDataFrame([(0, 51.6, -0.2)], "id long, lat double, lon double")
    osm_src.apply_osm_mutations(feats, nodes, ways, node_moves=moves)
    time.sleep(0.2)
    after = _n_jobs(spark)
    assert after == before, f"operator construction launched {after - before} job(s)"


def test_intersects_feature_construction_is_lazy(spark):
    """intersects_feature used to probe feature_type with .first() at
    plan-construction time (a driver action per call); the dispatcher now
    unions lazily-filtered branches and must launch zero jobs to build."""
    from diagonal_b6_spark import fixtures
    from diagonal_b6_spark.operators import spatial_join

    feats = fixtures.features_table(spark)
    pts = spark.range(10).select(
        F.col("id").alias("pid"),
        (F.lit(51.5) + F.col("id") * 0.001).alias("lat"),
        (F.lit(-0.1) + F.col("id") * 0.001).alias("lng"),
    )
    before = _n_jobs(spark)
    spatial_join.intersects_feature(pts, feats, point_id="pid")
    time.sleep(0.2)
    after = _n_jobs(spark)
    assert after == before, f"intersects_feature launched {after - before} job(s)"


def _single_partition_exchanges_are_bounded(plan: str) -> list[str]:
    """Return violations: 'Exchange SinglePartition' nodes whose subtree
    reaches a FileScan with no aggregation in between.  A single-partition
    exchange is the physical footprint of an unpartitioned global sort or
    window; it is only scale-safe when the data crossing it has already
    been collapsed by an aggregate (e.g. per-range-partition totals)."""
    import re

    lines = plan.splitlines()

    def depth(line: str) -> int:
        m = re.search(r"[+:]-", line)
        return m.start() if m else -1

    bad = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        d = depth(line)
        agg_seen = False
        for j in range(i + 1, len(lines)):
            dj = depth(lines[j])
            if 0 <= dj <= d:
                break
            if "Aggregate" in lines[j]:
                agg_seen = True
            if "FileScan" in lines[j] and not agg_seen:
                bad.append(line.strip())
                break
    return bad


def test_percentiles_has_no_unbounded_single_partition(spark, tmp_path):
    """percentiles used to be a global unpartitioned Window -- the whole
    input sorted in ONE task (round-3 VERDICT 'What's wrong #2').  The
    distributed rewrite may still use SinglePartition exchanges, but only
    over pre-aggregated (per-range-partition) tiny tables."""
    from diagonal_b6_spark.operators import agg as agg_ops

    path = str(tmp_path / "vals.parquet")
    spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    ).write.parquet(path)
    df = agg_ops.percentiles(spark.read.parquet(path), "v", "k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = _single_partition_exchanges_are_bounded(plan)
    assert not bad, f"unbounded single-partition exchange(s): {bad}"
    # and the distributed result still IS percent_rank
    from pyspark.sql import Window

    expect = (
        spark.read.parquet(path)
        .select("k", "v")
        .withColumn("pct", F.percent_rank().over(Window.orderBy(F.col("v").asc())))
    )
    got = {(r["k"], r["v"]): r["pct"] for r in df.collect()}
    for r in expect.collect():
        assert got[(r["k"], r["v"])] == r["pct"]


def test_text_and_dedup_construction_is_lazy(spark):
    """The seventh-sitting operators (span dedup, bigram LM, skew stats,
    streaming geofence) must launch zero jobs at plan construction."""
    from diagonal_b6_spark import fixtures
    from diagonal_b6_spark.operators import agg as agg_ops
    from diagonal_b6_spark.operators import cover as cover_ops
    from diagonal_b6_spark.operators import dedup as dd
    from diagonal_b6_spark.operators import text as tx
    from diagonal_b6_spark.streaming import windows as sw

    docs = spark.range(10).selectExpr(
        "cast(id as int) as doc_id", "concat('tok', id % 3, ' a b c d') as text"
    )
    pts = spark.range(5).select(
        F.col("id").alias("event_id"),
        (F.lit(51.5) + F.col("id") * 0.001).alias("lat"),
        (F.lit(-0.1) + F.col("id") * 0.001).alias("lng"),
    )
    feats = fixtures.features_table(spark)

    before = _n_jobs(spark)
    dd.duplicate_spans(docs, k=3)
    dd.remove_duplicate_spans(docs, k=3)
    tx.lm_bigram_scores(docs, "doc_id", "text")
    tx.token_count_bpe(docs, "doc_id", "text")
    agg_ops.key_skew_stats(docs, "doc_id")
    sw.streaming_geofence(cover_ops.with_point_cells(pts), feats)
    time.sleep(0.2)
    after = _n_jobs(spark)
    assert after == before, f"construction launched {after - before} job(s)"


def test_new_key_plan_shapes(spark):
    """Plan discipline for the seventh-sitting keys: quadkey encoding is
    a pure per-row projection (ZERO exchanges), skew-stats partial-
    aggregates map-side before its single shuffle, and the bigram-LM
    join graph contains no cartesian/nested-loop join."""
    from diagonal_b6_spark import catalog

    sf = "/root/testdata/sf0.001"

    qk = catalog.q_geo_quadkey(spark, sf)
    plan = qk._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "quadkey must not shuffle"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    sk = catalog.q_skew_stats(spark, sf)
    splan = sk._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in splan or "HashAggregate" in splan

    lm = catalog.q_lm_bigram_score(spark, sf)
    lplan = lm._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in lplan and "BroadcastNestedLoopJoin" not in lplan


def test_r5_key_plan_shapes(spark):
    """Plan discipline for the round-5 keys: the concave-clip corpus is
    pure codegen up to the single clip kernel (zero exchanges, zero
    ArrowEval -- the ring construction must never fall back to Python);
    the batch geofence-transition islands carry at most two exchanges
    (the broadcast of the feature cover + the per-entity window
    shuffle); the corpus covering-ring key builds its rings without a
    shuffle."""
    from diagonal_b6_spark import catalog

    sf = "/root/testdata/sf0.001"

    cp = catalog.q_geo_clip_general(spark, sf)
    plan = cp._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, "clip corpus must be map-side only"
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 1  # the clip kernel itself

    tr = catalog.q_geofence_transitions(spark, sf)
    tplan = tr._jdf.queryExecution().executedPlan().toString()
    assert tplan.count("Exchange") <= 2, tplan.count("Exchange")
    assert "CartesianProduct" not in tplan and "BroadcastNestedLoopJoin" not in tplan

    cr = catalog.q_geo_s2_covering_rings(spark, sf)
    rplan = cr._jdf.queryExecution().executedPlan().toString()
    assert rplan.count("Exchange") == 0, "ring build + covering must not shuffle"
