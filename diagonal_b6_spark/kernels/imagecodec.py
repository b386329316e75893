"""Deterministic image codecs in pure numpy (no PIL in this sandbox).

Three formats exercise the BASELINE.json per-row invariant (decoded-pixel
allclose; PSNR >= 40 dB for lossy; captions byte-equal):

- ``raw``  : magic RAW1 + w/h uint32 LE + RGB bytes (lossless)
- ``bmp``  : standard 24-bit uncompressed BMP, bottom-up rows (lossless)
- ``lossy``: 8x8 blockwise orthonormal DCT-II, uniform quantization,
             zlib-compressed int16 coefficients (PSNR >= 40 dB by design)

Also the deterministic test pattern ``pix`` and the 64-bit FNV-1a
perceptual-hash stand-in mandated by FIXTURES.md §1.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)


def pix(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 test image: gradient + checker keyed by i."""
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = (x * 255) // max(w - 1, 1) + 0 * y
    g = (y * 255) // max(h - 1, 1) + 0 * x
    b = (((x // 4) ^ (y // 4)) & 1) * 200 + (i % 56)
    img = np.stack(
        [np.broadcast_to(r, (h, w)), np.broadcast_to(g, (h, w)), np.broadcast_to(b, (h, w))],
        axis=2,
    )
    return ((img + i) % 256).astype(np.uint8)


def pix_batch(ids: np.ndarray, w: int, h: int) -> np.ndarray:
    """(n, h, w, 3) uint8 batch of ``pix`` images, one einsum-free numpy
    pass across the whole batch (generation at bench scale runs through
    this, never the scalar path)."""
    ids = np.asarray(ids, dtype=np.int64)
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = np.broadcast_to((x * 255) // max(w - 1, 1), (h, w))
    g = np.broadcast_to((y * 255) // max(h - 1, 1), (h, w))
    checker = np.broadcast_to((((x // 4) ^ (y // 4)) & 1) * 200, (h, w))
    base = np.stack([r, g, checker], axis=2)[None, :, :, :]  # (1, h, w, 3)
    add = ids[:, None, None, None] + np.zeros((1, 1, 1, 3), dtype=np.int64)
    add[:, :, :, 2] += (ids % 56)[:, None, None]
    return ((base + add) % 256).astype(np.uint8)


def fnv1a64(data: bytes) -> int:
    """FNV-1a 64-bit of a byte string, returned as signed int64 (parquet-friendly)."""
    h = int(FNV_OFFSET)
    p = int(FNV_PRIME)
    mask = (1 << 64) - 1
    for b in data:
        h = ((h ^ b) * p) & mask
    return h - (1 << 64) if h >= (1 << 63) else h


def fnv1a64_batch(rows: np.ndarray) -> np.ndarray:
    """FNV-1a 64-bit over each row of a (n, k) uint8 matrix.

    Vectorized across rows (the sequential recurrence runs over the k byte
    positions, each step a whole-column numpy op) -- this is how phash is
    computed for millions of fixture rows without per-row Python.
    """
    rows = np.asarray(rows, dtype=np.uint8)
    h = np.full(rows.shape[0], FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(rows.shape[1]):
            h = (h ^ rows[:, k].astype(np.uint64)) * FNV_PRIME
    return h.astype(np.int64)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# --- raw ------------------------------------------------------------------


def encode_raw(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"RAW1" + struct.pack("<II", w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_raw(data: bytes) -> np.ndarray:
    assert data[:4] == b"RAW1", "bad raw magic"
    w, h = struct.unpack("<II", data[4:12])
    return np.frombuffer(data[12:], dtype=np.uint8).reshape(h, w, 3).copy()


# --- bmp (24-bit BI_RGB) ----------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = img[::-1, :, ::-1]  # bottom-up, BGR
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    assert data[:2] == b"BM", "bad bmp magic"
    offset = struct.unpack("<I", data[10:14])[0]
    w, h = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    assert bpp == 24, "only 24-bit BMP supported"
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(data[offset : offset + row_size * h], dtype=np.uint8).reshape(h, row_size)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()


# --- lossy (8x8 DCT + uniform quant + zlib) ---------------------------------

_BLK = 8
_QUANT = 4.0  # uniform step; keeps PSNR comfortably >= 40 dB


def _dct_matrix(n: int = _BLK) -> np.ndarray:
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * x + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0, :] = np.sqrt(1.0 / n)
    return m


_DCT = _dct_matrix()


def _blockify(chan: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = chan.shape
    ph = (h + _BLK - 1) // _BLK * _BLK
    pw = (w + _BLK - 1) // _BLK * _BLK
    padded = np.zeros((ph, pw), dtype=np.float64)
    padded[:h, :w] = chan
    # replicate edge pixels into padding to avoid ringing at borders
    padded[h:, :w] = chan[-1:, :]
    padded[:h, w:] = chan[:, -1:]
    padded[h:, w:] = chan[-1, -1]
    blocks = padded.reshape(ph // _BLK, _BLK, pw // _BLK, _BLK).transpose(0, 2, 1, 3)
    return blocks, ph, pw


def encode_lossy(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    coeffs = []
    for c in range(3):
        blocks, ph, pw = _blockify(img[:, :, c].astype(np.float64) - 128.0)
        d = _DCT @ blocks @ _DCT.T  # same matmul form as the batch path
        coeffs.append(np.round(d / _QUANT).astype(np.int16))
    payload = zlib.compress(np.stack(coeffs).tobytes(), level=6)
    return b"DCT1" + struct.pack("<II", w, h) + payload


def decode_lossy(data: bytes) -> np.ndarray:
    assert data[:4] == b"DCT1", "bad lossy magic"
    w, h = struct.unpack("<II", data[4:12])
    ph = (h + _BLK - 1) // _BLK * _BLK
    pw = (w + _BLK - 1) // _BLK * _BLK
    raw = np.frombuffer(zlib.decompress(data[12:]), dtype=np.int16)
    q = raw.reshape(3, ph // _BLK, pw // _BLK, _BLK, _BLK).astype(np.float64) * _QUANT
    out = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        blocks = _DCT.T @ q[c] @ _DCT
        full = blocks.transpose(0, 2, 1, 3).reshape(ph, pw)
        out[:, :, c] = np.clip(np.round(full[:h, :w] + 128.0), 0, 255).astype(np.uint8)
    return out


def encode_lossy_batch(imgs: np.ndarray) -> list[bytes]:
    """Batch lossy encode of (n, h, w, 3) images: one DCT einsum over the
    whole batch; only the per-image zlib call remains a loop."""
    n, h, w, _ = imgs.shape
    ph = (h + _BLK - 1) // _BLK * _BLK
    pw = (w + _BLK - 1) // _BLK * _BLK
    padded = np.zeros((n, 3, ph, pw), dtype=np.float64)
    chans = imgs.transpose(0, 3, 1, 2).astype(np.float64) - 128.0
    padded[:, :, :h, :w] = chans
    padded[:, :, h:, :w] = chans[:, :, -1:, :]
    padded[:, :, :h, w:] = chans[:, :, :, -1:]
    padded[:, :, h:, w:] = chans[:, :, -1:, -1:]
    blocks = padded.reshape(n, 3, ph // _BLK, _BLK, pw // _BLK, _BLK).transpose(0, 1, 2, 4, 3, 5)
    d = _DCT @ blocks @ _DCT.T  # broadcast matmul (BLAS) over all blocks
    q = np.round(d / _QUANT).astype(np.int16)
    head = b"DCT1" + struct.pack("<II", w, h)
    return [head + zlib.compress(q[k].tobytes(), level=6) for k in range(n)]


def encode_bmp_batch(imgs: np.ndarray) -> list[bytes]:
    """Batch BMP encode of (n, h, w, 3): header built once, rows padded in
    one vectorized pass."""
    n, h, w, _ = imgs.shape
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    rows = np.zeros((n, h, row_size), dtype=np.uint8)
    rows[:, :, : w * 3] = imgs[:, ::-1, :, ::-1].reshape(n, h, w * 3)
    return [header + info + rows[k].tobytes() for k in range(n)]


def encode_raw_batch(imgs: np.ndarray) -> list[bytes]:
    n, h, w, _ = imgs.shape
    head = b"RAW1" + struct.pack("<II", w, h)
    flat = np.ascontiguousarray(imgs, dtype=np.uint8).reshape(n, -1)
    return [head + flat[k].tobytes() for k in range(n)]


_BATCH_ENCODERS = {"raw": encode_raw_batch, "bmp": encode_bmp_batch, "lossy": encode_lossy_batch}


def encode_batch(imgs: np.ndarray, fmt: str) -> list[bytes]:
    return _BATCH_ENCODERS[fmt](imgs)


# --- dispatch ----------------------------------------------------------------

_ENCODERS = {"raw": encode_raw, "bmp": encode_bmp, "lossy": encode_lossy}
_DECODERS = {"raw": decode_raw, "bmp": decode_bmp, "lossy": decode_lossy}


def encode(img: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](img)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)
