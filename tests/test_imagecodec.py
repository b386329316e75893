"""Codec round-trip + PSNR invariants (BASELINE.json input_hint)."""

import numpy as np

from diagonal_b6_spark.kernels import imagecodec as ic


def test_pix_deterministic():
    a = ic.pix(7, 32, 24)
    b = ic.pix(7, 32, 24)
    assert a.shape == (24, 32, 3) and a.dtype == np.uint8
    assert (a == b).all()
    assert not (ic.pix(8, 32, 24) == a).all()


def test_raw_roundtrip():
    img = ic.pix(3, 48, 16)
    assert (ic.decode_raw(ic.encode_raw(img)) == img).all()


def test_bmp_roundtrip_with_padding():
    # w=17 forces row padding (17*3=51 -> 52 bytes)
    img = ic.pix(11, 17, 9)
    out = ic.decode_bmp(ic.encode_bmp(img))
    assert (out == img).all()


def test_lossy_psnr_at_least_40db():
    for i, (w, h) in enumerate([(16, 16), (33, 17), (64, 64), (48, 24)]):
        img = ic.pix(i, w, h)
        dec = ic.decode_lossy(ic.encode_lossy(img))
        assert dec.shape == img.shape
        p = ic.psnr(img, dec)
        assert p >= 40.0, f"PSNR {p:.1f} dB < 40 for {w}x{h}"


def test_fnv1a64_matches_reference_vectors():
    # published FNV-1a 64 test vectors
    assert ic.fnv1a64(b"") == -3750763034362895579  # 0xcbf29ce484222325
    assert ic.fnv1a64(b"a") == int(np.uint64(0xAF63DC4C8601EC8C).astype(np.int64))
    assert ic.fnv1a64(b"foobar") == int(np.uint64(0x85944171F73967E8).astype(np.int64))


def test_fnv1a64_batch_matches_scalar():
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 256, size=(10, 37), dtype=np.uint8)
    batch = ic.fnv1a64_batch(rows)
    for r in range(10):
        assert int(batch[r]) == ic.fnv1a64(rows[r].tobytes())


def test_dispatch():
    img = ic.pix(1, 16, 16)
    for fmt in ("raw", "bmp", "lossy"):
        dec = ic.decode(ic.encode(img, fmt), fmt)
        assert ic.psnr(img, dec) >= 40.0
