"""Image-payload operators: caption/meta oracle parity, decode stats,
round-trip invariant (BASELINE.json: exact for raw/bmp, PSNR >= 40 dB for
lossy, captions byte-equal), resize, and the banded phash dup join."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark import catalog, fixtures
from diagonal_b6_spark.kernels import imagecodec as ic
from diagonal_b6_spark.operators import images as image_ops

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", ["image_captions", "image_meta"])
def test_image_oracle_parity(spark, name):
    got = sorted(tuple(r) for r in catalog.QUERIES[name](spark, SF).collect())
    want = sorted(tuple(r) for r in duckdb.connect().execute(catalog.ORACLES[name]).fetchall())
    assert got == want
    assert len(got) == catalog.N_CATALOG_IMAGES


def test_roundtrip_invariant_holds_for_all(spark):
    out = catalog.q_image_pipeline(spark, SF)
    assert out.filter(~F.col("pixels_ok") | ~F.col("caption_ok")).count() == 0
    assert out.count() == catalog.N_CATALOG_IMAGES


def test_decode_stats_match_local_decode(spark):
    out = {r["image_id"]: r for r in catalog.q_image_pipeline(spark, SF).collect()}
    assert all(r["ok"] for r in out.values())
    # cross-check a few rows against a local decode
    for i in (0, 7, 1234):
        iid = f"img{i:012d}"
        w = fixtures.WIDTHS[i % 4]
        h = fixtures.HEIGHTS[(i // 4) % 4]
        fmt = fixtures.FMTS[i % 3]
        img = ic.decode(ic.encode(ic.pix_batch(np.array([i]), w, h)[0], fmt), fmt)
        assert out[iid]["mean_r"] == pytest.approx(img[:, :, 0].mean(), abs=1e-3)


def test_phash_dups_pinned(spark):
    """Images i and i+1792 have identical pixel buffers (pattern period
    lcm(256, 56) with matching w/h cycles) -> identical phash.  All such
    pairs, and only such pairs, must surface."""
    out = catalog.q_image_phash_dups(spark, SF).collect()
    ids = lambda s: int(s[3:])
    got = sorted((ids(r["id_a"]), ids(r["id_b"])) for r in out)
    n = 4000
    want = sorted(
        (a, b)
        for a in range(n)
        for b in range(a + 1792, n, 1792)
    )
    assert got == want
    assert all(r["hamming"] == 0 for r in out)


def test_resize_shapes_and_content(spark):
    out = image_ops.resize(fixtures.images_table(spark, 500), 16, 16).select(
        "image_id", "w", "h", "fmt", F.length("bytes").alias("n_bytes"), "bytes"
    ).collect()
    assert len(out) == 500
    assert all(r["w"] == 16 and r["h"] == 16 and r["fmt"] == "raw" for r in out)
    assert all(r["n_bytes"] == 12 + 16 * 16 * 3 for r in out)
    # content: resizing an already-16x16 raw image is identity
    img16 = image_ops.resize(
        fixtures.images_table(spark, 40).filter("w = 16 and h = 16 and fmt = 'raw'"),
        16,
        16,
    ).collect()
    for r in img16:
        i = int(r["image_id"][3:])
        expect = ic.pix_batch(np.array([i]), 16, 16)[0]
        assert (ic.decode_raw(bytes(r["bytes"])) == expect).all()


def test_bilinear_downsample_constant_image():
    img = np.full((1, 32, 32, 3), 77, dtype=np.uint8)
    out = image_ops._bilinear_batch(img, 8, 8)
    assert out.shape == (1, 8, 8, 3)
    assert (out == 77).all()


def test_phash_band_bucket_cap_drops_hot_buckets(spark):
    """The MAX_BAND_BUCKET skew guard: a corpus of identical-phash images
    collapses every band to one bucket; capping below the corpus size
    must drop the quadratic self-join entirely, while distinct-phash
    pairs below the cap still surface."""
    rows = [(f"i{k:03d}", 0x0123456789ABCDEF) for k in range(8)]
    rows += [("j000", 0x1111222233334444), ("j001", 0x1111222233334444)]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    uncapped = image_ops.phash_near_dup_pairs(df, max_hamming=0)
    assert uncapped.filter("id_a LIKE 'i%'").count() == 8 * 7 // 2
    capped = image_ops.phash_near_dup_pairs(df, max_hamming=0, max_bucket=4)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {("j000", "j001")}  # hot cluster capped out, small one kept


def test_lossy_dc_half_block_check_not_vacuous(spark):
    """r5: the half-block admissibility check must (a) pass on real
    encoder output, (b) actually see half blocks (non-vacuous), and
    (c) FAIL when a stored DC is corrupted beyond the two admissible
    half roundings -- i.e. it is a value check, not a tautology."""
    from diagonal_b6_spark import fixtures

    img = fixtures.images_table(spark, 60)
    out = image_ops.lossy_dc_checksum(img).toPandas()
    assert len(out) > 0 and out["half_ok"].all()
    assert (out["n_checked"] < out["n_blocks"]).any(), "no half blocks seen"

    # corrupt one half-block DC by +2 (outside {k, k+1}) and re-check
    import zlib

    row = img.filter("fmt = 'lossy'").limit(1).collect()[0]
    from diagonal_b6_spark.kernels import imagecodec as ic

    nby, nbx = row.h // 8, row.w // 8
    raw = np.frombuffer(zlib.decompress(bytes(row.bytes)[12:]), dtype=np.int16).copy()
    coeffs = raw.reshape(3, nby, nbx, 8, 8)
    pix = ic.pix(int(row.image_id[3:]), row.w, row.h).astype(np.int64)
    sums = pix.transpose(2, 0, 1).reshape(3, nby, 8, nbx, 8).sum(axis=(2, 4)) - 8192
    halves = np.argwhere(sums % 32 == 16)
    assert len(halves), "fixture image has no half block; pick another id"
    c, by, bx = halves[0]
    coeffs[c, by, bx, 0, 0] += 2
    bad_bytes = bytes(row.bytes)[:12] + zlib.compress(coeffs.tobytes(), level=6)
    bad = spark.createDataFrame(
        [(row.image_id, bad_bytes, row.w, row.h, "lossy")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    res = image_ops.lossy_dc_checksum(bad).collect()[0]
    assert not res["half_ok"]
