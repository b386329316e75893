"""GTFS-shaped transit graph building: consecutive-stop edges, peak
classification, and the sssp integration."""

from diagonal_b6_spark.operators import graph as graph_ops
from diagonal_b6_spark.sources import gtfs

ST_SCHEMA = "trip_id long, stop_id long, stop_seq int, departure_s long"


def _stop_times(spark):
    # trip 1 (off-peak, 10:00): 1 -> 2 -> 3, 300 s per hop
    # trip 2 (peak, 08:00):     1 -> 2, faster (240 s)
    rows = [
        (1, 1, 0, 36000), (1, 2, 1, 36300), (1, 3, 2, 36600),
        (2, 1, 0, 28800), (2, 2, 1, 29040),
    ]
    return spark.createDataFrame(rows, ST_SCHEMA)


def test_edges_and_peak_flags(spark):
    e = {(r["src"], r["dst"], r["peak"]): r["w"] for r in gtfs.transit_edges(_stop_times(spark)).collect()}
    assert e[(1, 2, False)] == 300.0
    assert e[(1, 2, True)] == 240.0
    assert e[(2, 3, False)] == 300.0
    assert (2, 3, True) not in e


def test_transit_graph_regimes(spark):
    st = _stop_times(spark)
    peak = {(r["src"], r["dst"]): r["w"] for r in gtfs.transit_graph(st, peak=True).collect()}
    off = {(r["src"], r["dst"]): r["w"] for r in gtfs.transit_graph(st, peak=False).collect()}
    assert peak[(1, 2)] == 240.0            # observed peak hop wins
    assert peak[(2, 3)] == 450.0            # off-peak-only hop penalized 1.5x
    assert off[(1, 2)] == 240.0             # min of raw observations
    assert off[(2, 3)] == 300.0


def test_sssp_over_transit_graph(spark):
    st = _stop_times(spark)
    origins = spark.createDataFrame([(0, 1)], "origin long, node long")
    dist = {
        r["node"]: r["dist"]
        for r in graph_ops.bounded_sssp(gtfs.transit_graph(st, peak=False), origins, rounds=3).collect()
    }
    assert dist == {1: 0.0, 2: 240.0, 3: 540.0}
