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

from diagonal_b6_spark.operators import geo_fn, gridjoin, network, sightline
from diagonal_b6_spark.operators import graph as graph_ops

FORBIDDEN = (".collect()", ".toPandas()")
MODULES = [network, sightline, gridjoin]


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

    before = _n_jobs(spark)
    network.connect_to_network(pts, paths, 500.0, point_id="pid")
    network.elevation_idw(pts, spots, 3000.0, point_id="pid")
    geo_fn.snap_area_edges(areas, paths, 40.0)
    sightline.sightline(origins, areas, 300.0)
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
