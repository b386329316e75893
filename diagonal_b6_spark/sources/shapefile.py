"""ESRI shapefile ingest (.shp geometry + .dbf attributes + .shx index).

Reference surface: b6-ingest-gdal (b6/ingest/gdal/, README.md:173-199)
uses GDAL to load shapefiles such as the ward-boundary fixtures; this
module implements the format directly from the public ESRI whitepaper
("ESRI Shapefile Technical Description", 1998) -- no GDAL dependency.

Layout implemented:
  .shp  100-byte header (BE file code 9994, BE length @24; LE version
        1000 @28, LE shape type @32), then records of
        [BE recno, BE content-length(16-bit words)][LE shape ...].
        Shape types: 0 null, 1 point, 3 polyline, 5 polygon, 8
        multipoint (+ their M/Z variants, extra coords ignored).
  .shx  100-byte header + (BE offset, BE length) per record -- the
        random-access index that makes the DISTRIBUTED read possible:
        the driver loads only the tiny .shx, executors fetch + decode
        their own .shp byte ranges (same blob-parallel shape as the
        PBF reader).
  .dbf  dBASE III: LE record count @4, header size @8, record size
        @10; 32-byte field descriptors (name, type, length) until 0x0D;
        fixed-width latin-1 records with a deletion-flag byte.

Polygon ring semantics: the spec says outer rings are clockwise and
holes counter-clockwise, but real files get this wrong (the reference
keeps a 'ward-inverted' fixture for exactly that), so classification
here is winding-PROOF: rings nest by even-odd containment depth
(|area|-descending, point-in-ring tests against larger rings) -- depth
0 rings are outers (one output feature each), odd-depth rings attach to
their immediately-containing outer as holes.  Matches GDAL's organize-
polygons behavior for valid inputs and degrades deterministically.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernels import geom

FEATURE_SCHEMA = (
    "feature_id string, feature_type string, ns string, tags map<string,string>, "
    "xs array<double>, ys array<double>, ring_offsets array<int>"
)

_TYPE_NAMES = {0: "null", 1: "point", 3: "path", 5: "area", 8: "multipoint"}


def _base_type(shape_type: int) -> int:
    """Collapse M (21,23,25,28) and Z (11,13,15,18) variants onto the
    2D base types -- the extra measures/z ranges trail the XY data and
    are simply not read."""
    return {11: 1, 13: 3, 15: 5, 18: 8, 21: 1, 23: 3, 25: 5, 28: 8}.get(
        shape_type, shape_type
    )


# --- .shx / .shp ------------------------------------------------------------


def shx_index(path: str) -> list[tuple[int, int, int]]:
    """(recno, byte offset, content bytes) per record from the .shx."""
    with open(path, "rb") as f:
        data = f.read()
    out = []
    for i, pos in enumerate(range(100, len(data), 8)):
        off, ln = struct.unpack(">II", data[pos : pos + 8])
        out.append((i + 1, off * 2, ln * 2))
    return out


def shp_scan_index(path: str) -> list[tuple[int, int, int]]:
    """Sequential fallback when no .shx exists: walk record headers."""
    out = []
    with open(path, "rb") as f:
        f.seek(24)
        total = struct.unpack(">I", f.read(4))[0] * 2
        f.seek(100)
        pos = 100
        while pos < total:
            recno, ln = struct.unpack(">II", f.read(8))
            out.append((recno, pos, ln * 2))
            f.seek(ln * 2, 1)
            pos += 8 + ln * 2
    return out


def record_index(shp_path: str) -> list[tuple[int, int, int]]:
    shx = os.path.splitext(shp_path)[0] + ".shx"
    return shx_index(shx) if os.path.exists(shx) else shp_scan_index(shp_path)


def parse_record(content: bytes) -> tuple[str, list[np.ndarray], list[np.ndarray]]:
    """One record's content -> (kind, [ring xs...], [ring ys...]).
    Points/multipoints return one single-vertex (or n-vertex) part."""
    st = _base_type(struct.unpack_from("<i", content, 0)[0])
    kind = _TYPE_NAMES.get(st)
    if kind is None:
        raise ValueError(f"unsupported shape type {st}")
    if kind == "null":
        return "null", [], []
    if kind == "point":
        x, y = struct.unpack_from("<2d", content, 4)
        return "point", [np.array([x])], [np.array([y])]
    if kind == "multipoint":
        n = struct.unpack_from("<i", content, 36)[0]
        pts = np.frombuffer(content, dtype="<f8", count=2 * n, offset=40).reshape(n, 2)
        return "multipoint", [pts[:, 0].copy()], [pts[:, 1].copy()]
    nparts, npoints = struct.unpack_from("<2i", content, 36)
    parts = np.frombuffer(content, dtype="<i4", count=nparts, offset=44)
    pts = np.frombuffer(
        content, dtype="<f8", count=2 * npoints, offset=44 + 4 * nparts
    ).reshape(npoints, 2)
    bounds = list(parts) + [npoints]
    xs = [pts[a:b, 0].copy() for a, b in zip(bounds, bounds[1:])]
    ys = [pts[a:b, 1].copy() for a, b in zip(bounds, bounds[1:])]
    return kind, xs, ys


# --- .dbf -------------------------------------------------------------------


def read_dbf(path: str) -> list[dict[str, str]]:
    """dBASE III attribute table -> one {field: value} dict per record
    (values as trimmed strings; deleted records skipped)."""
    with open(path, "rb") as f:
        data = f.read()
    n_rec = struct.unpack_from("<I", data, 4)[0]
    header_size, rec_size = struct.unpack_from("<2H", data, 8)
    fields = []
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos : pos + 11].split(b"\x00")[0].decode("latin-1")
        length = data[pos + 16]
        fields.append((name, length))
        pos += 32
    out = []
    for r in range(n_rec):
        base = header_size + r * rec_size
        if data[base : base + 1] == b"*":  # deleted
            continue
        row, off = {}, base + 1
        for name, length in fields:
            row[name] = data[off : off + length].decode("latin-1").strip()
            off += length
        out.append(row)
    return out


# --- ring nesting / feature assembly ----------------------------------------


def _ring_nesting(xs: list[np.ndarray], ys: list[np.ndarray]) -> list[tuple[int, list[int]]]:
    """[(outer ring idx, [hole ring idxs])] by even-odd containment
    depth -- winding-agnostic (the ward-inverted case)."""
    n = len(xs)
    if n == 1:
        return [(0, [])]
    from ..kernels.clip import ring_area

    areas = [abs(float(ring_area(xs[i], ys[i]))) for i in range(n)]
    order = sorted(range(n), key=lambda i: -areas[i])
    depth: dict[int, int] = {}
    parent: dict[int, int | None] = {}
    zero = np.array([0], dtype=np.int64)
    for pos, i in enumerate(order):
        # majority vote over spread sample vertices: a single probe vertex
        # can sit exactly on the other ring's edge (real ward data does
        # this) and the half-open PIP rule then votes arbitrarily
        k = min(len(xs[i]), 7)
        sel = np.linspace(0, len(xs[i]) - 1, k).astype(np.int64)
        px, py = xs[i][sel], ys[i][sel]
        containing = [
            j
            for j in order[:pos]  # strictly larger rings only
            if int(geom.points_in_polygon_planar(px, py, xs[j], ys[j], zero).sum()) * 2 > k
        ]
        depth[i] = len(containing)
        parent[i] = next(
            (j for j in containing if depth[j] == depth[i] - 1), None
        )
    out = []
    for i in order:
        if depth[i] % 2 == 0:
            out.append((i, [j for j in order if depth[j] == depth[i] + 1 and parent[j] == i]))
    return out


def _record_features(recno: int, kind: str, xs, ys, tags: dict) -> list[tuple]:
    rows = []
    if kind == "point":
        rows.append((f"point/shp/{recno}", "point", "shp", tags,
                     [float(xs[0][0])], [float(ys[0][0])], [0]))
    elif kind == "multipoint":
        for k in range(len(xs[0])):
            rows.append((f"point/shp/{recno}/{k}", "point", "shp", tags,
                         [float(xs[0][k])], [float(ys[0][k])], [0]))
    elif kind == "path":
        for k in range(len(xs)):
            fid = f"path/shp/{recno}" + (f"/{k}" if len(xs) > 1 else "")
            rows.append((fid, "path", "shp", tags,
                         [float(v) for v in xs[k]], [float(v) for v in ys[k]], [0]))
    elif kind == "area":
        # drop the spec's duplicated closing vertex per ring
        cxs = [x[:-1] if len(x) > 3 and x[0] == x[-1] and ys_[0] == ys_[-1] else x
               for x, ys_ in zip(xs, ys)]
        cys = [y[:-1] if len(x) > 3 and x[0] == x[-1] and y[0] == y[-1] else y
               for x, y in zip(xs, ys)]
        nested = _ring_nesting(cxs, cys)
        for k, (outer, holes) in enumerate(nested):
            ring_ids = [outer] + holes
            px, py, offs, off = [], [], [], 0
            for r in ring_ids:
                offs.append(off)
                px.extend(float(v) for v in cxs[r])
                py.extend(float(v) for v in cys[r])
                off += len(cxs[r])
            fid = f"area/shp/{recno}" + (f"/{k}" if len(nested) > 1 else "")
            rows.append((fid, "area", "shp", tags, px, py, offs))
    return rows


# --- Spark surface ----------------------------------------------------------


def read_shapefile(spark: SparkSession, shp_path: str) -> DataFrame:
    """Distributed shapefile read: the driver loads only the .shx/.dbf
    (tiny); executors fetch + decode their .shp record ranges inside
    mapInPandas.  Returns packed features (FEATURE_SCHEMA) -- the same
    table every other operator consumes."""
    index = record_index(shp_path)
    dbf_path = os.path.splitext(shp_path)[0] + ".dbf"
    attrs = read_dbf(dbf_path) if os.path.exists(dbf_path) else []
    tag_of = {i + 1: row for i, row in enumerate(attrs)}
    recs = spark.createDataFrame(
        [(r, o, l, tag_of.get(r, {})) for r, o, l in index],
        "recno int, offset long, length long, tags map<string,string>",
    ).repartition(max(1, min(len(index), spark.sparkContext.defaultParallelism)))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["feature_id", "feature_type", "ns", "tags", "xs", "ys", "ring_offsets"]
        with open(shp_path, "rb") as f:
            for pdf in batches:
                rows = []
                for recno, off, ln, tags in zip(
                    pdf["recno"], pdf["offset"], pdf["length"], pdf["tags"]
                ):
                    f.seek(int(off) + 8)  # skip the record header
                    kind, xs, ys = parse_record(f.read(int(ln)))
                    if kind != "null":
                        rows.extend(
                            _record_features(int(recno), kind, xs, ys, dict(tags))
                        )
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return recs.mapInPandas(decode, FEATURE_SCHEMA)


# --- writer (interchange/export utility + gate-fixture builder) -------------


def _shp_header(shape_type: int, total_words: int) -> bytes:
    h = struct.pack(">I20x", 9994) + struct.pack(">I", total_words)
    h += struct.pack("<2i", 1000, shape_type)
    h += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    return h


def polygon_content(rings: list, shape_type: int = 5) -> bytes:
    """Polygon record content: rings auto-closed; callers supply ESRI
    winding (outer CW, holes CCW) or rely on the reader's winding-proof
    nesting."""
    closed = [list(r) + [r[0]] for r in rings]
    npts = sum(len(r) for r in closed)
    c = struct.pack("<i", shape_type) + struct.pack("<4d", 0, 0, 0, 0)
    c += struct.pack("<2i", len(closed), npts)
    off = 0
    for r in closed:
        c += struct.pack("<i", off)
        off += len(r)
    for r in closed:
        for x, y in r:
            c += struct.pack("<2d", x, y)
    return c


def point_content(x: float, y: float) -> bytes:
    return struct.pack("<i2d", 1, x, y)


def write_shapefile(base: str, records: list, fields=None, rows=None) -> None:
    """Write .shp/.shx/.dbf.  records: [(shape_type, content_bytes)]
    built via polygon_content/point_content; fields: [(NAME, width)];
    rows: per-record attribute dicts.  Driver-side by design -- like
    PBF export this is an interchange extract, not a corpus sink."""
    recs, idx, pos = b"", b"", 100
    for i, (_, content) in enumerate(records):
        recs += struct.pack(">2I", i + 1, len(content) // 2) + content
        idx += struct.pack(">2I", pos // 2, len(content) // 2)
        pos += 8 + len(content)
    st = records[0][0] if records else 0
    with open(base + ".shp", "wb") as f:
        f.write(_shp_header(st, pos // 2) + recs)
    with open(base + ".shx", "wb") as f:
        f.write(_shp_header(st, (100 + len(idx)) // 2) + idx)
    fields = fields or [("NAME", 16)]
    rows = rows or [{"NAME": f"rec{i + 1}"} for i in range(len(records))]
    rec_size = 1 + sum(length for _, length in fields)
    head = struct.pack("<B3xI2H20x", 3, len(rows), 33 + 32 * len(fields), rec_size)
    for name, length in fields:
        head += struct.pack("<11sBI2B14x", name.encode(), ord("C"), 0, length, 0)
    head += b"\x0d"
    body = b""
    for r in rows:
        body += b" "
        for name, length in fields:
            body += str(r.get(name, "")).ljust(length)[:length].encode("latin-1")
    with open(base + ".dbf", "wb") as f:
        f.write(head + body + b"\x1a")
