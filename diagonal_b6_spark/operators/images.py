"""Image-payload operators over the (image_id, bytes, w, h, fmt, caption,
phash, lat, lng) table (BASELINE.json input_hint).

Decode/encode run in Arrow-batched ``mapInPandas`` with the pure-numpy
codecs (kernels/imagecodec.py) -- batch-vectorized within each Arrow
batch, never per-row Python beyond the unavoidable per-image bytes
boundary.  The banded phash near-dup join is pure JVM bit math
(shiftright/bit_count), the image analogue of MinHash-LSH banding:
identical bands collide, hamming distance refines -- a self-join that
shuffles once on (band_idx, band_value).

At 10^12 rows the bytes column never moves through a shuffle: stats,
resize and hashing are map-side; the near-dup join moves only (phash,
image_id) pairs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import imagecodec as ic


def decode_stats(images: DataFrame) -> DataFrame:
    """Per-image decoded-pixel statistics: mean/std per channel + a
    decoded-shape check against the metadata columns."""
    schema = (
        "image_id string, fmt string, ok boolean, mean_r double, mean_g double, "
        "mean_b double, std_all double"
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for r in pdf.itertuples(index=False):
                img = ic.decode(r.bytes, r.fmt)
                ok = img.shape == (r.h, r.w, 3)
                m = img.reshape(-1, 3).mean(axis=0)
                out.append(
                    (r.image_id, r.fmt, bool(ok), float(m[0]), float(m[1]), float(m[2]),
                     float(img.astype(np.float64).std()))
                )
            yield pd.DataFrame(
                out,
                columns=["image_id", "fmt", "ok", "mean_r", "mean_g", "mean_b", "std_all"],
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(stats, schema)


def roundtrip_check(images: DataFrame, min_psnr: float = 40.0) -> DataFrame:
    """The BASELINE.json per-row invariant as a DataFrame op: decode ->
    re-encode -> decode, assert pixels exact (raw/bmp) or PSNR >= 40 dB
    (lossy), captions byte-equal."""
    schema = "image_id string, fmt string, pixels_ok boolean, psnr double, caption_ok boolean"

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for r in pdf.itertuples(index=False):
                img = ic.decode(r.bytes, r.fmt)
                rt = ic.decode(ic.encode(img, r.fmt), r.fmt)
                p = ic.psnr(img, rt)
                ok = (img == rt).all() if r.fmt in ("raw", "bmp") else p >= min_psnr
                out.append((r.image_id, r.fmt, bool(ok), float(min(p, 1e9)), r.caption == r.caption))
            yield pd.DataFrame(
                out, columns=["image_id", "fmt", "pixels_ok", "psnr", "caption_ok"]
            )

    return images.select("image_id", "bytes", "fmt", "caption").mapInPandas(check, schema)


def resize(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Bilinear resize every image to (out_w, out_h); output re-encoded as
    'raw'.  Batch-vectorized per (w, h) group inside each Arrow batch."""
    schema = "image_id string, bytes binary, w int, h int, fmt string"

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, bufs = [], []
            for (w, h, fmt), grp in pdf.groupby(["w", "h", "fmt"], sort=False):
                imgs = np.stack([ic.decode(b, fmt) for b in grp["bytes"]])
                resized = _bilinear_batch(imgs, int(out_w), int(out_h))
                bufs.extend(ic.encode_raw_batch(resized))
                ids.extend(grp["image_id"].tolist())
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "bytes": bufs,
                    "w": np.full(len(ids), out_w, dtype=np.int32),
                    "h": np.full(len(ids), out_h, dtype=np.int32),
                    "fmt": ["raw"] * len(ids),
                }
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(do, schema)


def _bilinear_batch(imgs: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """(n, h, w, 3) -> (n, out_h, out_w, 3) bilinear, one vectorized pass."""
    n, h, w, _ = imgs.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[None, :, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, None, :, None]
    f = imgs.astype(np.float64)
    top = f[:, y0][:, :, x0] * (1 - wx) + f[:, y0][:, :, x1] * wx
    bot = f[:, y1][:, :, x0] * (1 - wx) + f[:, y1][:, :, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def resize_checksum(images: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """resize() -> raw re-encode -> decode -> integer checksums of the
    RESIZED pixels (red-channel sum + the position-weighted layout sum,
    same functionals as augment_center_crop_flip).  For the fixture
    dims every bilinear weight is dyadic ({0, .25, .5, .75}) and every
    weighted sum float64-exact, so numpy's round-half-even is
    deterministic and the whole resize kernel is SQL-replayable with an
    explicit banker's-rounding expression -- a FULL value oracle of the
    interpolation path, not just output-shape checks."""
    schema = "image_id string, sum_r long, wsum long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wx = np.arange(1, out_w + 1, dtype=np.int64)[None, :]
        wy = np.arange(1, out_h + 1, dtype=np.int64)[:, None]
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                img = ic.decode(r.bytes, r.fmt).astype(np.int64)
                v = img[:, :, 0] + 2 * img[:, :, 1] + 3 * img[:, :, 2]
                out.append(
                    (r.image_id, int(img[:, :, 0].sum()), int((v * wx * wy).sum()))
                )
            yield pd.DataFrame(out, columns=["image_id", "sum_r", "wsum"])

    return resize(images, out_w, out_h).mapInPandas(run, schema)


def lossy_dc_checksum(images: DataFrame) -> DataFrame:
    """Per-image checksum of the lossy encoder's quantized DC
    coefficients (kernels/imagecodec.encode_lossy: 8x8 orthonormal
    DCT-II, uniform step 4, per-channel int16 planes behind zlib).

    For an orthonormal 2D DCT the DC term is sum(block)/8, so each
    stored DC equals round((sum(pixels) - 64*128) / 32) -- a pure
    integer function of the ORIGINAL pixels, replayable in SQL from the
    fixture's closed-form pixel generator.  Blocks whose exact quotient
    lands ON the rounding half (sum - 8192 == 16 mod 32) are excluded
    from the checksum by BOTH engines: there the encoder's float path
    (~1e-12 off the exact half) rounds in a direction exact arithmetic
    cannot predict (it depends on the BLAS accumulation order inside
    the DCT matmul).  Those blocks are still VALUE-checked (r5): a half
    block's stored DC has exactly two admissible values, k and k+1
    where sum - 8192 = 32k + 16, and `half_ok` asserts every half block
    stored one of them -- any other value (wrong block sum, wrong
    quantizer step, transposed plane) fails.  Combined with the exact
    checksum over non-half blocks, every DC coefficient is now pinned
    up to the mathematically-irreducible half-step direction, which the
    PSNR>=40 round-trip pytest is insensitive to by construction.

    Output: (image_id, n_blocks = 3 * blocks/image, n_checked, dc_sum,
    half_ok).  Map-side only -- the bytes column never crosses a
    shuffle."""
    import zlib

    schema = (
        "image_id string, n_blocks long, n_checked long, dc_sum long, "
        "half_ok boolean"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                nby, nbx = r.h // 8, r.w // 8
                raw = np.frombuffer(zlib.decompress(r.bytes[12:]), dtype=np.int16)
                dc = (
                    raw.reshape(3, nby, nbx, 8, 8)[:, :, :, 0, 0].astype(np.int64)
                )
                img = ic.pix(int(r.image_id[3:]), int(r.w), int(r.h)).astype(np.int64)
                bs = (
                    img.transpose(2, 0, 1)
                    .reshape(3, nby, 8, nbx, 8)
                    .sum(axis=(2, 4))
                )
                sprime = bs - 64 * 128
                mask = (sprime % 32) != 16
                # half blocks: stored DC must be one of the two admissible
                # roundings of the exact half, k or k+1 (s' = 32k + 16)
                k = (sprime[~mask] - 16) // 32
                half_ok = bool(np.isin(dc[~mask] - k, (0, 1)).all())
                out.append(
                    (
                        r.image_id,
                        3 * nby * nbx,
                        int(mask.sum()),
                        int(dc[mask].sum()),
                        half_ok,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["image_id", "n_blocks", "n_checked", "dc_sum", "half_ok"],
            )

    return (
        images.filter(F.col("fmt") == "lossy")
        .select("image_id", "bytes", "w", "h")
        .mapInPandas(run, schema)
    )


def augment_center_crop_flip(images: DataFrame, frac: float = 0.5) -> DataFrame:
    """Training-pipeline augmentation: decode -> center-crop to
    (frac*w, frac*h) -> horizontal flip, emitting crop geometry and two
    integer checksums of the AUGMENTED pixels: the cropped red-channel
    sum (flip-invariant: pins the crop box and values) and a
    position-weighted sum ((r + 2g + 3b) * (x'+1) * (y'+1) over flipped
    coordinates: pins the flip direction -- any linear functional of
    the pixels is SQL-replayable on the closed-form fixture by mapping
    x' -> cw-1-(x-x0)).  Map-side only; bytes never cross a shuffle.
    Real augmentation sinks would re-encode `crop` instead of
    checksumming -- the geometry/indexing path is identical."""
    schema = "image_id string, new_w int, new_h int, sum_r long, wsum long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                img = ic.decode(r.bytes, r.fmt).astype(np.int64)
                cw, ch = int(r.w * frac), int(r.h * frac)
                x0, y0 = (int(r.w) - cw) // 2, (int(r.h) - ch) // 2
                crop = img[y0 : y0 + ch, x0 : x0 + cw, :][:, ::-1, :]
                wx = np.arange(1, cw + 1, dtype=np.int64)[None, :]
                wy = np.arange(1, ch + 1, dtype=np.int64)[:, None]
                v = crop[:, :, 0] + 2 * crop[:, :, 1] + 3 * crop[:, :, 2]
                out.append(
                    (r.image_id, cw, ch, int(crop[:, :, 0].sum()), int((v * wx * wy).sum()))
                )
            yield pd.DataFrame(
                out, columns=["image_id", "new_w", "new_h", "sum_r", "wsum"]
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(run, schema)


def phash_bands(images: DataFrame, n_bands: int = 4) -> DataFrame:
    """Explode each 64-bit phash into (band_idx, band_value) rows -- pure
    JVM bit math, the LSH-banding index side."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftrightunsigned(F.col("phash"), b * width).bitwiseAND(F.lit(mask)).alias("band_value"),
            )
            for b in range(n_bands)
        ]
    )
    return images.select("image_id", "phash", F.explode(bands).alias("b")).select(
        "image_id", "phash", F.col("b.band_idx"), F.col("b.band_value")
    )


MAX_BAND_BUCKET = 1024  # per-(band_idx, band_value) doc cap for the self-join


def phash_near_dup_pairs(
    images: DataFrame,
    max_hamming: int = 0,
    n_bands: int = 4,
    max_bucket: int = MAX_BAND_BUCKET,
) -> DataFrame:
    """Image near-duplicate pairs: band-equality candidate join + popcount
    hamming refine, all whole-stage-codegen (no Python).  max_hamming=0
    -> exact phash duplicates; the banding guarantees recall for any
    hamming < bits/n_bands by pigeonhole.

    Buckets holding more than `max_bucket` images are dropped before the
    self-join (the MAX_BUCKET skew guard from dedup.minhash_lsh_pairs):
    corpora heavy in near-constant images collapse to a handful of flat
    phash band values, and one such bucket otherwise costs O(bucket^2)
    candidate pairs.  Pairs in a dropped bucket can still collide in any
    of the other n_bands-1 bands; only pairs hot in EVERY band are lost
    -- by then they are a dense duplicate cluster better handled by the
    exact-dedup pass.  The cap bounds the join at max_bucket^2 rows per
    bucket."""
    b = phash_bands(images, n_bands)
    small = (
        b.groupBy("band_idx", "band_value")
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") <= max_bucket)
        .select("band_idx", "band_value")
    )
    capped = b.join(small, ["band_idx", "band_value"])
    a1 = capped.alias("a")
    a2 = capped.alias("b")
    cand = a1.join(
        a2,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_value") == F.col("b.band_value"))
        & (F.col("a.image_id") < F.col("b.image_id")),
        "inner",
    )
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        cand.select(
            F.col("a.image_id").alias("id_a"),
            F.col("b.image_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
