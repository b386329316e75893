"""YAML change-file interchange (reference b6/ingest/yaml.go): golden
document shape, round-trip fidelity, apply-equivalence through the
change operators, and the full modification-export mirror of
ingest/yaml_test.go TestExportModificationsAsYAML."""

import pytest
import yaml as pyyaml

from diagonal_b6_spark import fixtures
from diagonal_b6_spark.operators import change as change_ops
from diagonal_b6_spark.sources import changes_yaml


def test_yaml_golden_shape(spark, tmp_path):
    adds = spark.createDataFrame(
        [("point/test/7", "#amenity", "bench")], "feature_id string, k string, v string"
    )
    rms = spark.createDataFrame([("point/test/7", "old")], "feature_id string, k string")
    added = spark.createDataFrame(
        [("point/new/1", "point", "new", {"name": "spot"}, [-0.125], [51.535], [0])],
        fixtures.FEATURE_SCHEMA,
    )
    p = str(tmp_path / "c.yaml")
    changes_yaml.export_changes_yaml(p, adds, rms, added)
    got = open(p).read()
    # multi-doc stream; ids carry the reference's "/" prefix
    # (world.go FeatureID.MarshalYAML), point geometry lives in the
    # b6.PointTag tag with the 6-decimal "lat, lng" form
    assert got.startswith("id: /point/test/7\n")
    assert "- key: '#amenity'\n  value: bench" in got
    assert "remove:\n- old" in got
    assert "id: /point/new/1" in got
    assert "key: point" in got and "value: 51.535000, -0.125000" in got
    assert "key: name" in got and "value: spot" in got


def test_yaml_roundtrip_and_apply(spark, tmp_path):
    feats = fixtures.features_table(spark)
    adds = spark.createDataFrame(
        [("area/test/1", "#roof", "flat"), ("area/test/2", "#roof", "tile")],
        "feature_id string, k string, v string",
    )
    rms = spark.createDataFrame([("area/test/1", "#building")], "feature_id string, k string")
    added = spark.createDataFrame(
        [("path/new/9", "path", "new", {"#highway": "cycleway"},
          [-0.125, -0.124875], [51.535, 51.535125], [0])],
        fixtures.FEATURE_SCHEMA,
    )
    p = str(tmp_path / "c.yaml")
    changes_yaml.export_changes_yaml(p, adds, rms, added)
    back = changes_yaml.import_changes_yaml(spark, p)

    def apply(a, r, n):
        return change_ops.add_features(
            change_ops.remove_tags(change_ops.add_tags(feats, a), r), n
        )

    direct = apply(adds, rms, added).collect()
    via_yaml = apply(back["tag_adds"], back["tag_removes"], back["added"]).collect()
    assert sorted(
        [(r.feature_id, dict(r.tags), r.xs, r.ys) for r in direct]
    ) == sorted([(r.feature_id, dict(r.tags), r.xs, r.ys) for r in via_yaml])
    new = {r.feature_id: r for r in via_yaml}["path/new/9"]
    assert new.xs == [-0.125, -0.124875] and dict(new.tags) == {"#highway": "cycleway"}


def test_yaml_area_nested_loops_roundtrip(spark, tmp_path):
    """Area docs use the reference's nested form (features.go
    AreaFeature.MarshalYAML): area = [polygon]; polygon = [loop...];
    loop = ["lat, lng"...].  Holes survive via ring_offsets."""
    # outer square + inner hole: ring_offsets [0, 4]
    xs = [-0.13, -0.12, -0.12, -0.13, -0.127, -0.123, -0.123, -0.127]
    ys = [51.50, 51.50, 51.51, 51.51, 51.503, 51.503, 51.507, 51.507]
    added = spark.createDataFrame(
        [("area/new/5", "area", "new", {"#building": "yes"}, xs, ys, [0, 4])],
        fixtures.FEATURE_SCHEMA,
    )
    p = str(tmp_path / "a.yaml")
    changes_yaml.export_changes_yaml(p, added=added)
    docs = [d for d in pyyaml.safe_load_all(open(p)) if d]
    assert len(docs) == 1
    area = docs[0]["area"]
    # one polygon, two loops (outer + hole), each a list of "lat, lng" strings
    assert len(area) == 1 and len(area[0]) == 2
    assert [len(loop) for loop in area[0]] == [4, 4]
    assert area[0][0][0] == "51.500000, -0.130000"
    assert area[0][1][0] == "51.503000, -0.127000"

    back = changes_yaml.import_changes_yaml(spark, p)
    row = back["added"].collect()[0]
    assert row.feature_type == "area"
    assert list(row.ring_offsets) == [0, 4]
    assert row.xs == xs and row.ys == ys


def test_yaml_unresolvable_reference_rejected(spark, tmp_path):
    """The path-ID loop variant (yaml.go newAreaFromYAML) carries
    references; when the referenced path is neither earlier in the
    stream nor in a provided world, the importer fails loudly naming
    the ids instead of crashing on float()."""
    p = str(tmp_path / "ref.yaml")
    with open(p, "w") as f:
        f.write("id: /area/x/1\narea:\n- - /path/test/3\n  - /path/test/4\n")
    with pytest.raises(ValueError, match="unresolved feature references"):
        changes_yaml.import_changes_yaml(spark, p)


def test_yaml_delta_size_guard(spark, tmp_path):
    """Change files are driver-collected edit deltas; a corpus-sized input
    must fail loudly BEFORE collect()."""
    big = spark.range(50).selectExpr(
        "concat('point/test/', id) AS feature_id", "'k' AS k", "'v' AS v"
    )
    with pytest.raises(ValueError, match="exceeds"):
        changes_yaml.export_changes_yaml(
            str(tmp_path / "x.yaml"), tag_adds=big, max_rows=10
        )


# --- the TestExportModificationsAsYAML mirror (ingest/yaml_test.go:17) ---
#
# The reference's scenario: tag modifications on two base-world nodes
# (Caravan gains wheelchair=yes and loses cuisine; Dishoom gains
# wheelchair=no), then one added feature of every kind -- a point (IFO),
# a footway whose vertices mix feature-ID references with a raw lat-lng,
# a closed boundary path, an area whose loop is a path-ID reference to
# the boundary, a relation ranking the cafes with roles, a collection
# keyed by their ids, and an expression feature -- exported as one YAML
# stream and re-ingested, feature for feature.

CARAVAN = "point/openstreetmap.org/node/2300722786"
DISHOOM = "point/openstreetmap.org/node/3501612811"


@pytest.fixture()
def base_world(spark):
    rows = [
        (CARAVAN, "point", "openstreetmap.org",
         {"name": "Caravan", "cuisine": "coffee_shop"},
         [-0.1253052], [51.5357237], [0]),
        (DISHOOM, "point", "openstreetmap.org",
         {"name": "Dishoom"}, [-0.126826], [51.536454], [0]),
    ]
    return spark.createDataFrame(rows, fixtures.FEATURE_SCHEMA)


def _modifications(spark):
    adds = spark.createDataFrame(
        [(CARAVAN, "wheelchair", "yes"), (DISHOOM, "wheelchair", "no")],
        "feature_id string, k string, v string",
    )
    rms = spark.createDataFrame([(CARAVAN, "cuisine")], "feature_id string, k string")
    added = spark.createDataFrame(
        [
            ("point/diagonal.works/test/3868276529", "point", "diagonal.works",
             {"name": "Identified Flying Object", "tourism": "attraction"},
             [-0.1250181], [51.5321749], [0]),
            ("path/diagonal.works/test/1", "path", "diagonal.works",
             {"highway": "footway"},
             [-0.1253052, -0.126046, -0.126826],
             [51.5357237, 51.535632, 51.536454], [0]),
            ("path/diagonal.works/test/2", "path", "diagonal.works",
             {"highway": "footway"},
             [-0.1253052, -0.126826, -0.126046, -0.1253052],
             [51.5357237, 51.536454, 51.535632, 51.5357237], [0]),
            ("relation/diagonal.works/test/4", "relation", "diagonal.works",
             {"member:0": CARAVAN, "member_role:0": "good",
              "member:1": DISHOOM, "member_role:1": "best",
              "source": "diagonal"}, [], [], []),
            ("collection/diagonal.works/test/5", "collection", "diagonal.works",
             {"member_key:0": CARAVAN, "member:0": "good",
              "member_key:1": DISHOOM, "member:1": "best",
              "source": "diagonal"}, [], [], []),
            ("expression/diagonal.works/test/6", "expression", "diagonal.works",
             {"b6:expression": 'find (and [#highway=cycleway] (intersecting /area/openstreetmap.org/way/222021571))',
              "source": "diagonal"}, [], [], []),
        ],
        fixtures.FEATURE_SCHEMA,
    )
    return adds, rms, added


def test_yaml_modifications_roundtrip(spark, tmp_path, base_world):
    """Our own export -> import of the full scenario is lossless."""
    adds, rms, added = _modifications(spark)
    p = str(tmp_path / "mods.yaml")
    changes_yaml.export_changes_yaml(p, adds, rms, added)
    back = changes_yaml.import_changes_yaml(spark, p, world=base_world)

    assert sorted(map(tuple, back["tag_adds"].collect())) == sorted(
        map(tuple, adds.collect())
    )
    assert sorted(map(tuple, back["tag_removes"].collect())) == sorted(
        map(tuple, rms.collect())
    )
    # the reference's LatLngYAML form is "%f" (6 decimals), so geometry
    # round-trips to 6-decimal precision -- the reference's own test
    # compares approximately too (yaml_test.go approxAngles / 3cm cover)
    want = {
        r["feature_id"]: (r["feature_type"], dict(r["tags"]), list(r["xs"]), list(r["ys"]))
        for r in added.collect()
    }
    got = {
        r["feature_id"]: (r["feature_type"], dict(r["tags"]), list(r["xs"]), list(r["ys"]))
        for r in back["added"].collect()
    }
    assert set(got) == set(want)
    for fid, (ftype, tags, xs, ys) in want.items():
        gtype, gtags, gxs, gys = got[fid]
        assert (gtype, gtags) == (ftype, tags), fid
        assert gxs == pytest.approx(xs, abs=5e-7) and gys == pytest.approx(ys, abs=5e-7), fid

    # apply-equivalence through the change operators
    direct = change_ops.add_features(
        change_ops.remove_tags(change_ops.add_tags(base_world, adds), rms), added
    ).collect()
    via = change_ops.add_features(
        change_ops.remove_tags(
            change_ops.add_tags(base_world, back["tag_adds"]), back["tag_removes"]
        ),
        back["added"],
    ).collect()
    k = lambda rows: {r.feature_id: (dict(r.tags), r.xs, r.ys) for r in rows}
    kd, kv = k(direct), k(via)
    assert set(kd) == set(kv)
    for fid, (tags, xs, ys) in kd.items():
        vtags, vxs, vys = kv[fid]
        assert vtags == tags, fid
        assert vxs == pytest.approx(xs, abs=5e-7) and vys == pytest.approx(ys, abs=5e-7), fid
    caravan = {r.feature_id: r for r in via}[CARAVAN]
    assert dict(caravan.tags) == {"name": "Caravan", "wheelchair": "yes"}


def test_yaml_reference_shaped_stream_imports(spark, tmp_path, base_world):
    """A stream written the way the reference writes it TODAY
    (ingest/features.go MarshalYAML forms: "/"-prefixed ids, point/path
    geometry tags, ";"-joined path expressions mixing feature-ID
    references with raw lat-lngs, a path-ID area loop, relation members,
    collection literal pairs with {id:} choice maps, a structured
    expression tree) imports and applies."""
    stream = f"""\
id: /{CARAVAN}
add:
- key: wheelchair
  value: "yes"
remove:
- cuisine
---
id: /point/diagonal.works/test/3868276529
tags:
- key: point
  value: 51.532175, -0.125018
- key: name
  value: Identified Flying Object
- key: tourism
  value: attraction
---
id: /path/diagonal.works/test/1
tags:
- key: path
  value: {CARAVAN};51.535632, -0.126046;{DISHOOM}
- key: highway
  value: footway
---
id: /path/diagonal.works/test/2
tags:
- key: path
  value: {CARAVAN};{DISHOOM};51.535632, -0.126046;{CARAVAN}
- key: highway
  value: footway
---
id: /area/diagonal.works/test/3
area:
- - /path/diagonal.works/test/2
---
id: /relation/diagonal.works/test/4
relation:
- id: /{CARAVAN}
  role: good
- id: /{DISHOOM}
  role: best
tags:
- key: source
  value: diagonal
---
id: /collection/diagonal.works/test/5
collection:
- - id: /{CARAVAN}
  - good
- - id: /{DISHOOM}
  - best
tags:
- key: source
  value: diagonal
---
id: /expression/diagonal.works/test/6
expression:
  call:
    function:
      symbol: find
    args:
    - query:
        intersection:
        - tagged:
            key: '#highway'
            value: cycleway
        - intersectsFeature:
            id: /area/openstreetmap.org/way/222021571
tags:
- key: source
  value: diagonal
"""
    p = str(tmp_path / "ref_stream.yaml")
    with open(p, "w") as f:
        f.write(stream)
    back = changes_yaml.import_changes_yaml(spark, p, world=base_world)
    rows = {r.feature_id: r for r in back["added"].collect()}

    ifo = rows["point/diagonal.works/test/3868276529"]
    assert ifo.feature_type == "point"
    assert (ifo.ys[0], ifo.xs[0]) == (51.532175, -0.125018)
    assert dict(ifo.tags) == {"name": "Identified Flying Object", "tourism": "attraction"}

    # footway: Caravan ref -> raw point -> Dishoom ref, resolved via world
    fw = rows["path/diagonal.works/test/1"]
    assert fw.feature_type == "path"
    assert fw.ys == [51.5357237, 51.535632, 51.536454]
    assert fw.xs == [-0.1253052, -0.126046, -0.126826]
    assert dict(fw.tags) == {"highway": "footway"}

    # area loop = reference to the boundary path ADDED EARLIER IN THE
    # SAME STREAM (references feed first); the closing duplicate vertex
    # of the referenced loop drops
    sq = rows["area/diagonal.works/test/3"]
    assert sq.feature_type == "area"
    assert list(sq.ring_offsets) == [0]
    assert sq.ys == [51.5357237, 51.536454, 51.535632]

    rel = rows["relation/diagonal.works/test/4"]
    assert dict(rel.tags) == {
        "member:0": CARAVAN, "member_role:0": "good",
        "member:1": DISHOOM, "member_role:1": "best",
        "source": "diagonal",
    }

    coll = rows["collection/diagonal.works/test/5"]
    assert dict(coll.tags) == {
        "member_key:0": CARAVAN, "member:0": "good",
        "member_key:1": DISHOOM, "member:1": "best",
        "source": "diagonal",
    }

    # the structured expression tree is preserved losslessly and
    # re-exports byte-equal
    expr = rows["expression/diagonal.works/test/6"]
    tree = pyyaml.safe_load(dict(expr.tags)["b6:expression:yaml"])
    assert tree["call"]["function"]["symbol"] == "find"
    p2 = str(tmp_path / "reexport.yaml")
    changes_yaml.export_changes_yaml(p2, added=back["added"])
    docs2 = {d["id"]: d for d in pyyaml.safe_load_all(open(p2)) if d}
    assert docs2["/expression/diagonal.works/test/6"]["expression"] == tree
    # relation + collection docs re-export in the reference's shape
    assert docs2["/relation/diagonal.works/test/4"]["relation"] == [
        {"id": "/" + CARAVAN, "role": "good"},
        {"id": "/" + DISHOOM, "role": "best"},
    ]
    assert docs2["/collection/diagonal.works/test/5"]["collection"] == [
        [{"id": "/" + CARAVAN}, "good"],
        [{"id": "/" + DISHOOM}, "best"],
    ]
