"""GTFS-shaped transit graph building: consecutive-stop edges, peak
classification, and the sssp integration."""

from diagonal_b6_spark.operators import graph as graph_ops
import pytest

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


# --- real feed files (sources/gtfs.py read_gtfs family) ---------------------


@pytest.fixture()
def feed_dir(tmp_path):
    (tmp_path / "stops.txt").write_text(
        'stop_id,stop_name,stop_lat,stop_lon\n'
        'A,"Alpha, North",51.50,-0.10\nB,Beta,51.51,-0.11\nC,Gamma,51.52,-0.12\n'
    )
    (tmp_path / "trips.txt").write_text(
        "route_id,service_id,trip_id\nr1,wk,t1\nr1,wk,t2\nr1,wk,t3\nr1,wk,t4\n"
    )
    (tmp_path / "routes.txt").write_text(
        "route_id,route_short_name,route_type\nr1,N1,3\n"
    )
    # non-dense sequences; hour 25 (sanitized mod 24); midnight wrap
    (tmp_path / "stop_times.txt").write_text(
        "trip_id,stop_id,stop_sequence,arrival_time,departure_time\n"
        "t1,A,10,08:29:00,08:30:00\n"
        "t1,B,20,08:40:00,08:41:00\n"
        "t1,C,30,08:50:00,08:51:00\n"
        "t2,A,1,11:59:00,12:00:00\n"
        "t2,B,2,12:15:00,12:16:00\n"
        "t2,C,3,12:25:00,12:26:00\n"
        "t3,B,1,23:54:00,23:55:00\n"
        "t3,C,2,25:05:00,25:06:00\n"
        "t4,A,1,09:59:00,10:00:00\n"
        "t4,C,2,10:20:00,10:21:00\n"
    )
    return str(tmp_path)


def test_gtfs_connections_reference_semantics(spark, feed_dir):
    """Averaged-then-ceil-minute weights, inclusive peak bounds, mod-24
    hour sanitize, midnight wrap (reference gtfs.go:21-146)."""
    feed = gtfs.read_gtfs(spark, feed_dir)
    got = {
        (r["from_stop"], r["to_stop"]): (r["peak_s"], r["offpeak_s"])
        for r in gtfs.gtfs_connections(feed).collect()
    }
    assert got == {
        # A->B: peak obs 600s; off-peak obs 900s
        ("A", "B"): (600, 900),
        # B->C: peak 540; off-peak avg(540, 4200 wrapped) = 2370 -> ceil -> 2400
        ("B", "C"): (540, 2400),
        # A->C: departs exactly 10:00:00 -- INCLUSIVE peak bound; never off-peak
        ("A", "C"): (1200, None),
    }


def test_gtfs_features_shapes(spark, feed_dir):
    feed = gtfs.read_gtfs(spark, feed_dir)
    feats = gtfs.gtfs_features(feed, operator="test").collect()
    pts = [f for f in feats if f.feature_type == "point"]
    paths = [f for f in feats if f.feature_type == "path"]
    assert len(pts) == 3 and len(paths) == 3
    names = {dict(p.tags)["name"] for p in pts}
    assert "Alpha, North" in names  # quoted CSV field survives
    by_tags = [dict(p.tags) for p in paths]
    assert all(t["#gtfs"] == "connection" for t in by_tags)
    ac = [t for t in by_tags if "gtfs:offpeak" not in t]
    assert len(ac) == 1 and ac[0]["gtfs:peak"] == "1200"
    assert all(len(p.xs) == 2 and len(p.ys) == 2 for p in paths)


def test_gtfs_contract_feeds_transit_graph(spark, feed_dir):
    """File feed -> long-id contract -> existing transit_graph builder:
    sequences densify per trip, ids hash stably, edges come out."""
    feed = gtfs.read_gtfs(spark, feed_dir)
    st = gtfs.to_stop_times_contract(feed)
    rows = st.collect()
    assert len(rows) == 10
    t1 = sorted(r["stop_seq"] for r in rows if r["departure_s"] == 8 * 3600 + 30 * 60
                or r["trip_id"] == next(x["trip_id"] for x in rows if x["departure_s"] == 8 * 3600 + 30 * 60))
    assert t1 == [0, 1, 2]  # non-dense 10/20/30 densified
    g = gtfs.transit_graph(st, peak=False).collect()
    # 3 distinct consolidated (src,dst) pairs, long ids
    assert len(g) == 3
    assert all(isinstance(r["src"], int) for r in g)
