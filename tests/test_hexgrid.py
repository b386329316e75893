"""H3-style hex grid index: plane partition, disk fan-out, candidate-
join guarantee, and sf0.01 oracle parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark import catalog
from diagonal_b6_spark.operators import hexgrid

RES = 10


def test_hex_assignment_unique_and_packed(spark):
    pts = catalog._events_points(spark, "/root/testdata/sf0.001")
    out = hexgrid.with_hex_cells(pts, RES).collect()
    assert len(out) == pts.count()
    for r in out:
        # packing round-trips
        rid = r["hex_id"]
        assert rid % (1 << 26) - (1 << 25) == r["hex_r"]
        assert (rid // (1 << 26)) % (1 << 26) - (1 << 25) == r["hex_q"]
        assert rid // (1 << 26) // (1 << 26) == RES


def test_hex_disk_is_exactly_seven(spark):
    pts = catalog._events_points(spark, "/root/testdata/sf0.001").limit(20)
    d = hexgrid.explode_hex_disk(pts, RES)
    per = d.groupBy("event_id").agg(
        F.count("*").alias("n"), F.count_distinct("nbr_id").alias("nd")
    ).collect()
    assert all(r["n"] == 7 and r["nd"] == 7 for r in per)


def test_hex_disk_candidate_guarantee(spark):
    """Two points closer than the hex INRADIUS must be joinable through
    the disk: the second point's own hex appears in the first's 7-hex
    disk (the property a hex-bucketed proximity join relies on)."""
    rng = np.random.default_rng(7)
    size = hexgrid.HEX_SCALE / (8.0 * 2.0 ** RES)      # circumradius, hex units
    inradius_deg = size * np.sqrt(3) / 2 / hexgrid.HEX_SCALE * 360.0  # lng degrees
    base = rng.uniform([-10, -0.4], [10, 0.4], size=(40, 2))
    jitter = rng.uniform(-0.4, 0.4, size=(40, 2)) * inradius_deg
    rows = []
    for i, ((lat, lng), (jl, jg)) in enumerate(zip(base, jitter)):
        rows.append((2 * i, float(lat), float(lng)))
        rows.append((2 * i + 1, float(lat + jl * 0.5), float(lng + jg)))
    pts = spark.createDataFrame(rows, "pid long, lat double, lng double")
    disks = hexgrid.explode_hex_disk(pts, RES).select(
        (F.col("pid") / 2).cast("long").alias("pair"), "pid", "nbr_id"
    )
    own = hexgrid.with_hex_cells(pts, RES).select(
        (F.col("pid") / 2).cast("long").alias("pair"),
        F.col("pid").alias("other"), F.col("hex_id").alias("nbr_id"),
    )
    hits = (
        disks.join(own, ["pair", "nbr_id"])
        .where(F.col("pid") != F.col("other"))
        .select("pair").distinct().count()
    )
    assert hits == 40


def test_hex_cover_oracle_sf001(spark):
    sf = "/root/testdata/sf0.01"
    sdf = catalog.QUERIES["geo_hex_cover"](spark, sf)
    cols = sorted(sdf.columns)
    got = sorted(tuple(r[c] for c in cols) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    cur = con.execute(catalog.ORACLES["geo_hex_cover"])
    desc = [d[0] for d in cur.description]
    idx = [desc.index(c) for c in cols]
    want = sorted(tuple(w[i] for i in idx) for w in cur.fetchall())
    assert got == want
    assert len(got) > 50  # plural hexes, not one blob


def test_hex_nearest_radius_guard():
    with pytest.raises(ValueError, match="inradius"):
        hexgrid.hex_nearest(None, None, 13, 500.0, "a", "b", max_abs_lat=51.58)


def test_hex_nearest_matches_bruteforce(spark):
    """The 7-disk equi-join must find the exact same bounded nearest
    neighbor as an unpruned cross join (completeness of the 1-ring)."""
    pts = catalog._events_points(spark, "/root/testdata/sf0.001")
    got = {
        r["event_id"]: (r["nn_id"], round(r["nn_dist_m"], 6))
        for r in hexgrid.hex_nearest(
            pts, pts, 13, 250.0, "event_id", "event_id", max_abs_lat=51.58
        ).collect()
    }
    pdf = pts.toPandas()
    lat = np.radians(pdf["lat"].to_numpy())
    lng = np.radians(pdf["lng"].to_numpy())
    ids = pdf["event_id"].to_numpy()
    R = 6371000.0 * 2
    want = {}
    for i in range(len(ids)):
        dlat, dlng = lat - lat[i], lng - lng[i]
        h = np.sin(dlat / 2) ** 2 + np.cos(lat[i]) * np.cos(lat) * np.sin(dlng / 2) ** 2
        d = R * np.arcsin(np.sqrt(h))
        d[i] = np.inf
        j = int(np.argmin(d))
        if d[j] <= 250.0:
            want[int(ids[i])] = (int(ids[j]), round(float(d[j]), 6))
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-3)
