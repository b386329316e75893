"""OSM PBF writer (interchange/export utility + gate-fixture builder).

Counterpart of sources/pbf.py's reader, written from the same public
wire-format spec (https://wiki.openstreetmap.org/wiki/PBF_Format,
protobuf wire encoding): length-delimited Blob framing, per-block
string tables, DenseNodes with zigzag-delta packed coordinates, way
ref deltas, relation member triples.  Reference parity target:
b6/osm/pbf.go consumes this format; b6 exports it via osmium-shaped
tooling (cited for parity, no code consulted).

Posture: DRIVER-SIDE encode, like the reference's change files -- PBF
exports in this engine are interchange extracts, not a corpus sink
(a corpus-sized world belongs in parquet; see MAX_EXPORT_NODES guard).
The packed-varint encode is numpy-vectorized (9 exact threshold
comparisons for byte widths + one scatter pass per varint byte), so
the cost is file IO, not Python loops.

Coordinate quantization uses floor(u + 0.5) rather than Python's
round(): floor is bit-identical across numpy, Spark SQL, and DuckDB,
which lets the driver gate's oracle replay stored integer units
exactly (banker's rounding has no portable SQL equivalent).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

GRANULARITY = 100  # 1e-7 degree units, the OSM default
NANO = 1e-9

MAX_EXPORT_NODES = 5_000_000  # export is an extract, not a corpus sink

_POW7 = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def zigzag(v: np.ndarray) -> np.ndarray:
    """Signed int64 -> zigzag uint64, vectorized."""
    v = np.asarray(v, dtype=np.int64)
    return (v.astype(np.uint64) << np.uint64(1)) ^ (v >> np.int64(63)).astype(
        np.uint64
    )


def encode_varints(u: np.ndarray) -> bytes:
    """Concatenated base-128 varints of a uint64 array, vectorized:
    exact byte widths via 9 threshold compares, then one scatter per
    varint byte position (<= 10 numpy passes total)."""
    u = np.asarray(u, dtype=np.uint64)
    if len(u) == 0:
        return b""
    nb = np.ones(len(u), dtype=np.int64)
    for p in _POW7:
        nb += (u >= p).astype(np.int64)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(10):
        mask = nb > j
        if not mask.any():
            break
        b = ((u[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[mask] - 1 > j).astype(np.uint8) * np.uint8(0x80)
        out[starts[mask] + j] = b | cont
    return out.tobytes()


def _varint1(v: int) -> bytes:
    return encode_varints(np.array([v], dtype=np.uint64))


def _field(no: int, wiretype: int, payload: bytes) -> bytes:
    return _varint1((no << 3) | wiretype) + payload


def _ld(no: int, payload: bytes) -> bytes:
    """Length-delimited field."""
    return _field(no, 2, _varint1(len(payload)) + payload)


def _packed_deltas(no: int, values: np.ndarray) -> bytes:
    v = np.asarray(values, dtype=np.int64)
    deltas = np.diff(v, prepend=np.int64(0))
    return _ld(no, encode_varints(zigzag(deltas)))


def _packed(no: int, values) -> bytes:
    return _ld(no, encode_varints(np.asarray(values, dtype=np.uint64)))


def quantize(deg: np.ndarray, granularity: int = GRANULARITY) -> np.ndarray:
    """Degrees -> stored integer units, floor(u + 0.5) (see module doc)."""
    return np.floor(
        np.asarray(deg, dtype=np.float64) / (granularity * NANO) + 0.5
    ).astype(np.int64)


class _StringTable:
    def __init__(self) -> None:
        self._idx: dict[str, int] = {"": 0}

    def sid(self, s: str) -> int:
        if s not in self._idx:
            self._idx[s] = len(self._idx)
        return self._idx[s]

    def encode(self) -> bytes:
        return _ld(
            1, b"".join(_ld(1, s.encode()) for s in self._idx)
        )


def _dense_nodes(
    ids: np.ndarray,
    lats: np.ndarray,
    lons: np.ndarray,
    tags: list | None = None,
    st: _StringTable | None = None,
) -> bytes:
    msg = _packed_deltas(1, ids)
    if tags is not None and st is not None and any(tags):
        kv: list[int] = []
        for t in tags:
            for k, v in (t or {}).items():
                kv.append(st.sid(k))
                kv.append(st.sid(v))
            kv.append(0)
        msg += _packed(10, kv)
    msg += _packed_deltas(8, quantize(lats))
    msg += _packed_deltas(9, quantize(lons))
    return _ld(2, msg)


def _way(st: _StringTable, wid: int, refs, tags: dict) -> bytes:
    msg = _field(1, 0, _varint1(wid))
    msg += _packed(2, [st.sid(k) for k in tags])
    msg += _packed(3, [st.sid(v) for v in tags.values()])
    msg += _packed_deltas(8, np.asarray(list(refs), dtype=np.int64))
    return _ld(3, msg)


def _relation(st: _StringTable, rid: int, members, tags: dict) -> bytes:
    tcode = {"node": 0, "way": 1, "relation": 2}
    msg = _field(1, 0, _varint1(rid))
    msg += _packed(2, [st.sid(k) for k in tags])
    msg += _packed(3, [st.sid(v) for v in tags.values()])
    msg += _packed(8, [st.sid(m["role"]) for m in members])
    msg += _packed_deltas(9, np.asarray([m["ref"] for m in members], dtype=np.int64))
    msg += _packed(10, [tcode[m["type"]] for m in members])
    return _ld(4, msg)


def _blob(kind: bytes, block: bytes) -> bytes:
    z = zlib.compress(block)
    body = _field(2, 0, _varint1(len(block))) + _ld(3, z)
    header = _ld(1, kind) + _field(3, 0, _varint1(len(body)))
    return struct.pack(">I", len(header)) + header + body


def write_pbf(
    path: str,
    nodes,
    ways=None,
    relations=None,
    granularity: int = GRANULARITY,
    nodes_per_blob: int = 8000,
    node_tags: list | None = None,
) -> None:
    """Write an .osm.pbf file.

    nodes: iterable of (id, lat, lon) or an (ids, lats, lons) ndarray
    triple; ways: [(id, refs, tags)]; relations: [(id, members, tags)]
    with members [{'type','ref','role'}]; node_tags: optional list of
    dicts aligned with the input node order (encoded as the DenseNodes
    keys_vals stream, 0-delimited pairs).  Nodes split across OSMData
    blobs of ``nodes_per_blob`` (independently decompressible -- the
    reader parallelizes at blob granularity); ways/relations follow in
    their own blob."""
    if isinstance(nodes, tuple) and len(nodes) == 3:
        ids, lats, lons = (np.asarray(a) for a in nodes)
    else:
        arr = np.asarray(list(nodes), dtype=np.float64)
        if arr.size == 0:
            ids = lats = lons = np.zeros(0)
        else:
            ids, lats, lons = arr[:, 0].astype(np.int64), arr[:, 1], arr[:, 2]
    if len(ids) > MAX_EXPORT_NODES:
        raise ValueError(
            f"write_pbf: {len(ids)} nodes exceeds MAX_EXPORT_NODES "
            f"({MAX_EXPORT_NODES}) -- PBF export is an interchange extract, "
            "not a corpus sink; write parquet instead"
        )
    order = np.argsort(ids, kind="stable")
    ids, lats, lons = ids[order], lats[order], lons[order]
    if node_tags is not None:
        if len(node_tags) != len(ids):
            raise ValueError(
                f"write_pbf: node_tags length {len(node_tags)} != "
                f"{len(ids)} nodes"
            )
        node_tags = [node_tags[int(i)] for i in order]
    with open(path, "wb") as f:
        hb = _ld(1, b"OSMHeader") + _field(3, 0, _varint1(2))
        f.write(struct.pack(">I", len(hb)) + hb + b"\x08\x00")
        for i in range(0, max(len(ids), 1), nodes_per_blob):
            sl = slice(i, i + nodes_per_blob)
            if len(ids[sl]) == 0:
                continue
            st = _StringTable()
            # Encode the group BEFORE st.encode(): keys_vals populates
            # the string table as a side effect.
            dense = _ld(
                2,
                _dense_nodes(
                    ids[sl], lats[sl], lons[sl],
                    node_tags[sl] if node_tags is not None else None, st,
                ),
            )
            block = st.encode() + dense
            block += _field(17, 0, _varint1(granularity))
            f.write(_blob(b"OSMData", block))
        if ways or relations:
            st = _StringTable()
            groups = b"".join(
                _ld(2, _way(st, w[0], w[1], w[2])) for w in (ways or [])
            )
            groups += b"".join(
                _ld(2, _relation(st, r[0], r[1], r[2])) for r in (relations or [])
            )
            block = st.encode() + groups + _field(17, 0, _varint1(granularity))
            f.write(_blob(b"OSMData", block))
