"""Mapbox Vector Tile (MVT) wire-format encoder in pure Python.

Reference: the b6 renderer encodes tiles to MVT protobuf
(b6/renderer/renderer.go:109-143, encoder.go).  This is a from-scratch
writer of the published vector_tile.proto wire format (spec 2.1):

  Tile            { repeated Layer layers = 3; }
  Layer           { version=15 (=2), name=1, features=2, keys=3,
                    values=4, extent=5 }
  Feature         { id=1, tags=2 (packed), type=3, geometry=4 (packed) }
  Value           { string_value=1 }
  geometry cmds   : (id & 7) | (count << 3); MoveTo=1 LineTo=2 ClosePath=7
                    params zigzag-encoded integer deltas in tile-local
                    coordinates (extent 4096 by default)

Only the subset b6 renders is produced (string attribute values); the
decoder below exists for tests and debugging.
"""

from __future__ import annotations

import numpy as np

EXTENT = 4096

GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3


# --- protobuf primitives ----------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


# --- geometry command streams ----------------------------------------------


def _cmd(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


def _signed_area2(ring: np.ndarray) -> int:
    """Twice the signed shoelace area of a closed ring in tile coords
    (MVT 2.1 y-down convention: exterior rings must come out POSITIVE
    under the spec's surveyor's formula)."""
    x = np.asarray(ring[:, 0], dtype=np.int64)
    y = np.asarray(ring[:, 1], dtype=np.int64)
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    return int(np.sum(x * yn - xn * y))


def encode_geometry(geom_type: int, rings: list[np.ndarray]) -> list[int]:
    """rings: list of (n, 2) int arrays of tile-local coords.
    Point: one ring of k points -> single MoveTo(k).
    LineString: per ring MoveTo(1) + LineTo(n-1).
    Polygon: per ring MoveTo(1) + LineTo(n-1) + ClosePath; ring
    orientation normalized to spec 2.1 (first/exterior ring positive
    signed area, subsequent hole rings negative) so real renderers
    classify exterior vs hole correctly for counter-wound input."""
    out: list[int] = []
    cx = cy = 0
    if geom_type == GEOM_POINT:
        pts = rings[0]
        out.append(_cmd(1, len(pts)))
        for x, y in pts:
            out.append(_zigzag(int(x) - cx))
            out.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        return out
    if geom_type == GEOM_POLYGON:
        fixed = []
        for k, ring in enumerate(rings):
            a2 = _signed_area2(ring)
            want_positive = k == 0
            if (a2 < 0) == want_positive and a2 != 0:
                ring = ring[::-1]
            fixed.append(ring)
        rings = fixed
    for ring in rings:
        out.append(_cmd(1, 1))
        x0, y0 = int(ring[0][0]), int(ring[0][1])
        out.append(_zigzag(x0 - cx))
        out.append(_zigzag(y0 - cy))
        cx, cy = x0, y0
        out.append(_cmd(2, len(ring) - 1))
        for x, y in ring[1:]:
            out.append(_zigzag(int(x) - cx))
            out.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        if geom_type == GEOM_POLYGON:
            out.append(_cmd(7, 1))
    return out


def _packed_varints(field: int, values: list[int]) -> bytes:
    payload = b"".join(_varint(v) for v in values)
    return _len_delim(field, payload)


# --- layer / tile -----------------------------------------------------------


def encode_feature(
    fid: int, geom_type: int, rings: list[np.ndarray], tag_idx: list[int]
) -> bytes:
    body = b""
    body += _key(1, 0) + _varint(fid)
    if tag_idx:
        body += _packed_varints(2, tag_idx)
    body += _key(3, 0) + _varint(geom_type)
    body += _packed_varints(4, encode_geometry(geom_type, rings))
    return _len_delim(2, body)  # Feature is Layer field 2


def encode_layer(
    name: str, features: list[bytes], keys: list[str], values: list[str], extent: int = EXTENT
) -> bytes:
    body = b""
    body += _key(15, 0) + _varint(2)  # version
    body += _len_delim(1, name.encode())
    for f in features:
        body += f
    for k in keys:
        body += _len_delim(3, k.encode())
    for v in values:
        body += _len_delim(4, _len_delim(1, v.encode()))  # Value{string_value}
    body += _key(5, 0) + _varint(extent)
    return _len_delim(3, body)  # Layer is Tile field 3


def background_layer(extent: int = EXTENT) -> bytes:
    """renderer/encoder.go:63-75 newBackgroundLayer: every encoded tile
    leads with a 'background' layer holding one full-extent polygon
    (0,0) -> (extent-1,0) -> (extent-1,extent-1) -> (0,extent-1), close
    -- 11 geometry command ints, the count the reference's
    TestEncodeTile pins."""
    m = extent - 1
    geom = [
        _cmd(1, 1), _zigzag(0), _zigzag(0),
        _cmd(2, 3), _zigzag(m), _zigzag(0), _zigzag(0), _zigzag(m),
        _zigzag(-m), _zigzag(0),
        _cmd(7, 1),
    ]
    body = _key(3, 0) + _varint(GEOM_POLYGON)
    body += _packed_varints(4, geom)
    feat = _len_delim(2, body)  # no id, no tags (encoder.go:66-74)
    return encode_layer("background", [feat], [], [], extent=extent)


def latlng_to_tile_local(
    lat: np.ndarray, lng: np.ndarray, zoom: int, tx: int, ty: int, extent: int = EXTENT
) -> tuple[np.ndarray, np.ndarray]:
    """Project lat/lng into integer tile-local coordinates (may exceed
    [0, extent) for geometry spilling over the tile edge — MVT allows it).

    Quantization is floor, not round: the reference projects at
    zoom+TileExtent and truncates the (positive) global coordinate with
    int() before subtracting the tile origin (encoder.go:197-199 +
    NewEncoder's origin cursor), pinned by encoder_test.go's
    origin-relative vector."""
    n = float(1 << zoom)
    latc = np.clip(np.asarray(lat, dtype=np.float64), -85.05112878, 85.05112878)
    xf = (np.asarray(lng, dtype=np.float64) + 180.0) / 360.0 * n
    lr = np.radians(latc)
    yf = (1.0 - np.log(np.tan(lr) + 1.0 / np.cos(lr)) / np.pi) / 2.0 * n
    x = np.floor((xf - tx) * extent).astype(np.int64)
    y = np.floor((yf - ty) * extent).astype(np.int64)
    return x, y


# --- minimal decoder (tests / debugging) ------------------------------------


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def decode_tile(buf: bytes) -> list[dict]:
    """Parse a tile into [{name, extent, version, features:[{id, type,
    rings, tags}] , keys, values}] -- enough for round-trip assertions."""
    layers = []
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        assert field == 3 and wire == 2, "expected Layer"
        ln, i = _read_varint(buf, i)
        layers.append(_decode_layer(buf[i : i + ln]))
        i += ln
    return layers


def _decode_layer(buf: bytes) -> dict:
    out = {"features": [], "keys": [], "values": [], "extent": EXTENT}
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
            if field == 15:
                out["version"] = v
            elif field == 5:
                out["extent"] = v
        else:
            ln, i = _read_varint(buf, i)
            chunk = buf[i : i + ln]
            i += ln
            if field == 1:
                out["name"] = chunk.decode()
            elif field == 2:
                out["features"].append(_decode_feature(chunk))
            elif field == 3:
                out["keys"].append(chunk.decode())
            elif field == 4:
                out["values"].append(_decode_value(chunk))
    return out


def _decode_value(buf: bytes) -> str:
    key, i = _read_varint(buf, 0)
    assert key >> 3 == 1
    ln, i = _read_varint(buf, i)
    return buf[i : i + ln].decode()


def _decode_feature(buf: bytes) -> dict:
    out = {"id": None, "type": None, "rings": [], "tags": []}
    i = 0
    geom: list[int] = []
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
            if field == 1:
                out["id"] = v
            elif field == 3:
                out["type"] = v
        else:
            ln, i = _read_varint(buf, i)
            chunk = buf[i : i + ln]
            i += ln
            vals = []
            j = 0
            while j < len(chunk):
                v, j = _read_varint(chunk, j)
                vals.append(v)
            if field == 4:
                geom = vals
            elif field == 2:
                out["tags"] = vals
    # decode command stream back into rings
    cx = cy = 0
    k = 0
    ring: list[tuple[int, int]] = []
    while k < len(geom):
        cmd = geom[k]
        k += 1
        cid, cnt = cmd & 7, cmd >> 3
        if cid == 1:  # MoveTo
            if ring:
                out["rings"].append(np.array(ring))
                ring = []
            for _ in range(cnt):
                cx += _unzigzag(geom[k]); cy += _unzigzag(geom[k + 1]); k += 2
                ring.append((cx, cy))
        elif cid == 2:  # LineTo
            for _ in range(cnt):
                cx += _unzigzag(geom[k]); cy += _unzigzag(geom[k + 1]); k += 2
                ring.append((cx, cy))
        elif cid == 7:  # ClosePath
            pass
    if ring:
        out["rings"].append(np.array(ring))
    return out
