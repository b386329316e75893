"""OSM PBF binary parser: wire-format round-trip against a minimal
encoder written from the same public spec, vectorized varint kernel
properties, and end-to-end decode -> way/relation assembly."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from diagonal_b6_spark.sources import pbf


# --- minimal PBF encoder (test fixture; same public spec) -------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _field(no: int, wt: int, payload: bytes) -> bytes:
    return _varint(no << 3 | wt) + payload


def _ld(no: int, payload: bytes) -> bytes:
    return _field(no, 2, _varint(len(payload)) + payload)


def _packed_deltas(no: int, values: list[int]) -> bytes:
    prev, out = 0, b""
    for v in values:
        out += _varint(_zigzag(v - prev))
        prev = v
    return _ld(no, out)


def _packed(no: int, values: list[int]) -> bytes:
    return _ld(no, b"".join(_varint(v) for v in values))


def make_pbf(path, nodes, ways, relations, granularity=100, blobs_of=2):
    """nodes: [(id, lat, lon)], ways: [(id, refs, tags)],
    relations: [(id, members, tags)].  Splits nodes across several
    OSMData blobs to exercise blob-level parallelism."""
    strings = [""]

    def sid(s):
        if s not in strings:
            strings.append(s)
        return strings.index(s)

    def stringtable():
        return _ld(1, b"".join(_ld(1, s.encode()) for s in strings))

    def dense(ns):
        ids = _packed_deltas(1, [n[0] for n in ns])
        kv = b""
        if any(len(n) > 3 and n[3] for n in ns):
            flat = []
            for n in ns:
                for k, v in (n[3] if len(n) > 3 else {}).items():
                    flat += [sid(k), sid(v)]
                flat.append(0)
            kv = _packed(10, flat)
        lats = _packed_deltas(8, [round(n[1] / (granularity * 1e-9)) for n in ns])
        lons = _packed_deltas(9, [round(n[2] / (granularity * 1e-9)) for n in ns])
        return _ld(2, ids + kv + lats + lons)

    def way(w):
        wid, refs, tags = w
        msg = _field(1, 0, _varint(wid))
        msg += _packed(2, [sid(k) for k in tags])
        msg += _packed(3, [sid(v) for v in tags.values()])
        msg += _packed_deltas(8, refs)
        return _ld(3, msg)

    def relation(r):
        rid, members, tags = r
        tcode = {"node": 0, "way": 1, "relation": 2}
        msg = _field(1, 0, _varint(rid))
        msg += _packed(2, [sid(k) for k in tags])
        msg += _packed(3, [sid(v) for v in tags.values()])
        msg += _packed(8, [sid(m["role"]) for m in members])
        msg += _packed_deltas(9, [m["ref"] for m in members])
        msg += _packed(10, [tcode[m["type"]] for m in members])
        return _ld(4, msg)

    def block(groups):
        body = stringtable() + b"".join(_ld(2, g) for g in groups)
        body += _field(17, 0, _varint(granularity))
        return body

    def blob(block_bytes):
        z = zlib.compress(block_bytes)
        b = _field(2, 0, _varint(len(block_bytes))) + _ld(3, z)
        header = _ld(1, b"OSMData") + _field(3, 0, _varint(len(b)))
        return struct.pack(">I", len(header)) + header + b

    chunks = [nodes[i::blobs_of] for i in range(blobs_of)]
    with open(path, "wb") as f:
        # header blob first, as real files have
        hb = _ld(1, b"OSMHeader") + _field(3, 0, _varint(2))
        f.write(struct.pack(">I", len(hb)) + hb + b"\x08\x00")
        for i, ns in enumerate(chunks):
            groups = [dense(sorted(ns))] if ns else []
            if i == 0:
                groups += [way(w) for w in ways] + [relation(r) for r in relations]
            f.write(blob(block(groups)))


# --- tests ------------------------------------------------------------------


def test_packed_varint_kernel_matches_scalar():
    rng = np.random.default_rng(7)
    vals = [int(v) for v in rng.integers(0, 1 << 62, 200)] + [0, 1, (1 << 64) - 1]
    buf = b"".join(_varint(v) for v in vals)
    got = pbf.decode_packed_varints(memoryview(buf))
    assert [int(v) for v in got] == [v & ((1 << 64) - 1) for v in vals]


def test_zigzag_roundtrip():
    vals = [0, -1, 1, -2, 2**40, -(2**40), 2**62, -(2**62)]
    enc = b"".join(_varint(_zigzag(v)) for v in vals)
    dec = pbf._unzigzag(pbf.decode_packed_varints(memoryview(enc)))
    assert [int(v) for v in dec] == vals


NODES = [(1, 51.5350000, -0.1250000), (2, 51.5360000, -0.1240000),
         (3, 51.5370000, -0.1230000), (4, 51.5340000, -0.1260000),
         (5, 51.5355000, -0.1245000, {"amenity": "cafe", "name": "Test Cafe"})]
WAYS = [
    (10, [1, 2, 3], {"highway": "primary", "name": "test street"}),
    (11, [1, 2, 3, 4, 1], {"building": "yes"}),
]
RELS = [
    (20,
     [{"type": "way", "ref": 10, "role": "outer"},
      {"type": "node", "ref": 5, "role": "admin_centre"}],
     {"type": "multipolygon"}),
]


def test_pbf_roundtrip_tables(spark, tmp_path):
    p = str(tmp_path / "t.pbf")
    make_pbf(p, NODES, WAYS, RELS)
    idx = pbf.blob_index(p)
    assert [t for t, _, _ in idx] == ["OSMHeader", "OSMData", "OSMData"]
    t = pbf.read_pbf(spark, p)
    nodes = sorted(t["nodes"].collect(), key=lambda r: r.id)
    for got, want in zip(nodes, sorted(NODES)):
        assert got.id == want[0]
        assert got.lat == pytest.approx(want[1], abs=1e-9)
        assert got.lon == pytest.approx(want[2], abs=1e-9)
        assert dict(got.tags) == (want[3] if len(want) > 3 else {})
    ways = {r["id"]: r for r in t["ways"].collect()}
    assert ways[10]["refs"] == [1, 2, 3]
    assert dict(ways[10]["tags"]) == {"highway": "primary", "name": "test street"}
    assert ways[11]["refs"] == [1, 2, 3, 4, 1]
    rels = {r["id"]: r for r in t["relations"].collect()}
    ms = [(m["type"], m["ref"], m["role"]) for m in rels[20]["members"]]
    assert ms == [("way", 10, "outer"), ("node", 5, "admin_centre")]
    assert dict(rels[20]["tags"]) == {"type": "multipolygon"}


def test_pbf_feeds_way_assembly(spark, tmp_path):
    """decode -> sources/osm.py assembly end-to-end: the closed building
    way becomes an 'area' feature, the street a 'path'."""
    from diagonal_b6_spark.sources import osm

    p = str(tmp_path / "t.pbf")
    make_pbf(p, NODES, WAYS, RELS)
    t = pbf.read_pbf(spark, p)
    feats = {r["feature_id"]: r for r in osm.ways_to_features(t["nodes"], t["ways"]).collect()}
    assert feats["area/osm/11"]["feature_type"] == "area"
    assert len(feats["area/osm/11"]["xs"]) == 4  # closing vertex dropped
    assert feats["path/osm/10"]["feature_type"] == "path"
    assert len(feats["path/osm/10"]["xs"]) == 3
    # coordinates survive the granularity encoding at nano precision
    assert feats["path/osm/10"]["ys"][0] == pytest.approx(51.535, abs=1e-7)


# --- package encoder (sources/pbf_encode.py) --------------------------------


def test_encoder_varints_match_scalar():
    from diagonal_b6_spark.sources import pbf_encode

    rng = np.random.default_rng(11)
    vals = np.array(
        [0, 1, 127, 128, (1 << 64) - 1] + [int(v) for v in rng.integers(0, 1 << 62, 500)],
        dtype=np.uint64,
    )
    assert pbf_encode.encode_varints(vals) == b"".join(_varint(int(v)) for v in vals)


def test_encoder_zigzag_matches_scalar():
    from diagonal_b6_spark.sources import pbf_encode

    vals = np.array([0, -1, 1, -2, 2**40, -(2**40), 2**62, -(2**62)], dtype=np.int64)
    assert [int(z) for z in pbf_encode.zigzag(vals)] == [_zigzag(int(v)) for v in vals]


def test_package_encoder_roundtrip(spark, tmp_path):
    """write_pbf -> read_pbf round trip, multi-blob nodes."""
    from diagonal_b6_spark.sources import pbf_encode

    p = str(tmp_path / "enc.pbf")
    ids = np.arange(1, 21, dtype=np.int64)
    lats = 51.5 + 0.0001 * ids
    lons = -0.125 + 0.0001 * ids
    pbf_encode.write_pbf(p, (ids, lats, lons), WAYS, RELS, nodes_per_blob=7)
    idx = pbf.blob_index(p)
    assert [t for t, _, _ in idx] == ["OSMHeader"] + ["OSMData"] * 4  # 3 node + 1 way blob
    t = pbf.read_pbf(spark, p)
    nodes = sorted(t["nodes"].collect(), key=lambda r: r.id)
    assert len(nodes) == 20
    for got, want_id in zip(nodes, ids):
        assert got.id == want_id
        assert got.lat == pytest.approx(51.5 + 0.0001 * want_id, abs=1e-7)
        assert got.lon == pytest.approx(-0.125 + 0.0001 * want_id, abs=1e-7)
        assert dict(got.tags) == {}
    ways = {r["id"]: r for r in t["ways"].collect()}
    assert ways[10]["refs"] == [1, 2, 3]
    assert dict(ways[11]["tags"]) == {"building": "yes"}
    rels = {r["id"]: r for r in t["relations"].collect()}
    assert [(m["type"], m["ref"], m["role"]) for m in rels[20]["members"]] == [
        ("way", 10, "outer"), ("node", 5, "admin_centre")
    ]


def test_encoder_export_guard():
    from diagonal_b6_spark.sources import pbf_encode

    big = np.zeros(pbf_encode.MAX_EXPORT_NODES + 1, dtype=np.int64)
    try:
        pbf_encode.write_pbf("/tmp/never.pbf", (big, big, big))
        assert False, "guard did not fire"
    except ValueError as e:
        assert "corpus sink" in str(e)


def test_blob_codec_rejection_and_lzma():
    import lzma

    from diagonal_b6_spark.sources.pbf import _decode_blob

    body = b"hello osm"
    # field 4 (lzma), wiretype 2
    enc = lzma.compress(body)
    blob = b"\x22" + _varint(len(enc)) + enc
    assert bytes(_decode_blob(blob)) == body
    # field 6 (lz4) must be rejected BY NAME at decode time
    blob = b"\x32" + _varint(4) + b"\x00\x00\x00\x00"
    try:
        _decode_blob(blob)
        assert False, "lz4 blob not rejected"
    except ValueError as e:
        assert "lz4" in str(e) and "field 6" in str(e)


def test_package_encoder_node_tags_roundtrip(spark, tmp_path):
    """write_pbf(node_tags=...) -> read_pbf: the DenseNodes keys_vals
    stream (0-delimited pairs) survives the round trip, including the
    re-sort of unsorted input ids."""
    from diagonal_b6_spark.sources import pbf_encode

    p = str(tmp_path / "tags.pbf")
    ids = np.array([30, 10, 20], dtype=np.int64)  # deliberately unsorted
    lats = np.array([51.51, 51.52, 51.53])
    lons = np.array([-0.11, -0.12, -0.13])
    tags = [{"amenity": "cafe", "name": "Vermuteria"}, {}, {"barrier": "gate"}]
    pbf_encode.write_pbf(p, (ids, lats, lons), node_tags=tags)
    t = pbf.read_pbf(spark, p)
    got = {r.id: (r.lat, dict(r.tags)) for r in t["nodes"].collect()}
    assert got[30] == (pytest.approx(51.51, abs=1e-7), {"amenity": "cafe", "name": "Vermuteria"})
    assert got[10] == (pytest.approx(51.52, abs=1e-7), {})
    assert got[20] == (pytest.approx(51.53, abs=1e-7), {"barrier": "gate"})

    with pytest.raises(ValueError, match="node_tags length"):
        pbf_encode.write_pbf(p, (ids, lats, lons), node_tags=[{}])
