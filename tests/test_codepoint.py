"""GB Code-Point Open ingest + the BNG->WGS84 kernel.

Reference parity pinned: b6/ids_test.go's valid/invalid postcode
vectors; the OS guide's worked Transverse-Mercator example; the
reference's readColumnHeaders last-row-wins and Atoi-skip rules."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from diagonal_b6_spark.kernels import bng
from diagonal_b6_spark.sources import codepoint as cp


def _go_pack(postcode: str) -> int | None:
    """Driver-side mirror of PointIDFromGBPostcode (b6/ids.go:16-40)."""
    pc = postcode.upper().replace(" ", "")
    if not (5 <= len(pc) <= 7):
        return None
    packed = 0
    for i, ch in enumerate(pc):
        if i > 0:
            packed <<= 6
        if "0" <= ch <= "9":
            packed |= ord(ch) - 48
        elif "A" <= ch <= "Z":
            packed |= ord(ch) - 65 + 10
        else:
            return None
    return (packed << 2) | (len(pc) - 5)


def _unpack(pid: int) -> str:
    """PostcodeFromPointID (ids.go:42-58)."""
    n = (pid & 3) + 5
    packed = pid >> 2
    out = ""
    for _ in range(n):
        v = packed & 63
        out = (chr(48 + v) if v < 10 else chr(65 + v - 10)) + out
        packed >>= 6
    return out


def test_osgb36_worked_example():
    """OS guide Annexe C: E 651409.903, N 313177.270 ->
    52d39'27.2531\" N, 1d43'4.5177\" E on OSGB36."""
    lat, lng = bng.osgb36_from_bng(
        np.array([651409.903]), np.array([313177.270])
    )
    assert abs(lat[0] - (52 + 39 / 60 + 27.2531 / 3600)) * 3600 < 1e-3
    assert abs(lng[0] - (1 + 43 / 60 + 4.5177 / 3600)) * 3600 < 1e-3


def test_bng_sql_twin_matches_numpy():
    rng = np.random.default_rng(7)
    E = rng.uniform(100000, 650000, 64)
    N = rng.uniform(10000, 1200000, 64)
    lat, lng = bng.bng_to_wgs84(E, N)
    vals = ", ".join(
        f"({i}, {e!r}::DOUBLE, {n!r}::DOUBLE)" for i, (e, n) in enumerate(zip(E, N))
    )
    con = duckdb.connect()
    rows = con.execute(
        f"WITH src(rid, easting, northing) AS (VALUES {vals}),\n"
        f"{bng.sql_ctes('src')}\n"
        "SELECT rid, lat, lng FROM bng ORDER BY rid"
    ).fetchall()
    for rid, slat, slng in rows:
        assert abs(slat - lat[rid]) < 1e-11
        assert abs(slng - lng[rid]) < 1e-11


def test_bng_london_sanity():
    """E 530000 N 180000 is central London (~51.504 N, 0.128 W)."""
    lat, lng = bng.bng_to_wgs84(np.array([530000.0]), np.array([180000.0]))
    assert abs(lat[0] - 51.504) < 0.005
    assert abs(lng[0] - (-0.128)) < 0.005


def test_postcode_id_reference_vectors(spark):
    """ids_test.go:7-44: all spacing/case variants of N1C 4AB share one
    id; too-long and bad-char postcodes are invalid."""
    valid = ["N1C4AB", "N1C 4AB", "N 1C4AB", "n1c 4ab", "n1c4ab"]
    invalid = ["N1CZ 4ABZ", "N1C 4!B"]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(p,) for p in valid + invalid], "pc string")
    norm = cp.postcode_norm_col(F.col("pc"))
    got = df.select(
        F.col("pc"),
        cp.postcode_valid_col(norm).alias("ok"),
        cp.postcode_id_col(norm).alias("pid"),
    ).collect()
    by_pc = {r["pc"]: r for r in got}
    want = _go_pack("N1C4AB")
    for p in valid:
        assert by_pc[p]["ok"] and by_pc[p]["pid"] == want, p
    for p in invalid:
        assert not by_pc[p]["ok"], p
    assert _unpack(want) == "N1C4AB"


def test_postcode_id_all_lengths(spark):
    from pyspark.sql import functions as F

    pcs = ["AB1 2C", "AB1 2CD", "AB1 2CDE"]
    df = spark.createDataFrame([(p,) for p in pcs], "pc string")
    norm = cp.postcode_norm_col(F.col("pc"))
    got = {r["pc"]: r["pid"] for r in df.select("pc", cp.postcode_id_col(norm).alias("pid")).collect()}
    for p in pcs:
        assert got[p] == _go_pack(p)
        assert _unpack(got[p]) == p.replace(" ", "")


def test_read_codepoint_end_to_end(spark, tmp_path):
    """Header last-row-wins, comment lines, Atoi skip, tag + id + the
    projected location vs the kernel run directly."""
    doc = tmp_path / "headers.csv"
    # short-name row first, long-name row second (the product layout):
    # the reference's readColumnHeaders keeps the LAST assignment
    doc.write_text("PC,PQ,EA,NO\nPostcode,Positional_quality_indicator,Eastings,Northings\n")
    data = tmp_path / "ab.csv"
    data.write_text(
        "# comment line\n"
        '"N1C4AB",10,530000,180000\n'
        '"SW1A2AA",10,530268.5,179545\n'  # float easting -> Atoi skip
        '"E201AB",10,535000,182000\n'
    )
    out = cp.read_codepoint(spark, str(data), str(doc)).collect()
    rows = {r["feature_id"]: r for r in out}
    assert len(rows) == 2
    fid = f"point/gb/codepoint/{_go_pack('N1C4AB')}"
    assert fid in rows
    assert rows[fid]["tags"] == {"#place": "postal_code"}
    lat, lng = bng.bng_to_wgs84(np.array([530000.0]), np.array([180000.0]))
    assert abs(rows[fid]["ys"][0] - lat[0]) < 1e-12
    assert abs(rows[fid]["xs"][0] - lng[0]) < 1e-12


def test_read_codepoint_invalid_postcode_aborts(spark, tmp_path):
    """An invalid postcode aborts the ingest (the reference returns an
    error from Postcodes.Read); on_invalid='skip' drops it instead."""
    doc = tmp_path / "headers.csv"
    doc.write_text("Postcode,Eastings,Northings\n")
    data = tmp_path / "bad.csv"
    data.write_text('"N1C4AB",530000,180000\n"N1C!4AB",530100,180100\n')
    from pyspark.errors import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="invalid postcode"):
        cp.read_codepoint(spark, str(data), str(doc)).collect()
    kept = cp.read_codepoint(spark, str(data), str(doc), on_invalid="skip").collect()
    assert len(kept) == 1
