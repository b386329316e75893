"""Network-connection joins: IDW elevation vs DuckDB oracle; nearest-
segment connect vs numpy brute force."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from diagonal_b6_spark import catalog, fixtures
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
