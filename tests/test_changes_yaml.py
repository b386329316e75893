"""YAML change-file interchange (reference b6/ingest/yaml.go): golden
document shape, round-trip fidelity, and apply-equivalence through the
change operators."""

import textwrap

from pyspark.sql import functions as F

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
    want = textwrap.dedent("""\
        id: point/test/7
        add:
        - key: '#amenity'
          value: bench
        remove:
        - old
        --- !!python/none ''
        """)
    # multi-doc stream: first doc is the tag change, second the added
    # feature with the reference's 6-decimal "lat, lng" form
    assert got.startswith("id: point/test/7\n")
    assert "- key: '#amenity'\n  value: bench" in got
    assert "remove:\n- old" in got
    assert "point: 51.535000, -0.125000" in got
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
    key = lambda r: r["feature_id"]
    assert sorted(
        [(r.feature_id, dict(r.tags), r.xs, r.ys) for r in direct]
    ) == sorted([(r.feature_id, dict(r.tags), r.xs, r.ys) for r in via_yaml])
    new = {r.feature_id: r for r in via_yaml}["path/new/9"]
    assert new.xs == [-0.125, -0.124875] and dict(new.tags) == {"#highway": "cycleway"}


def test_yaml_area_nested_loops_roundtrip(spark, tmp_path):
    """Area docs use the reference's nested form (features.go
    AreaFeature.MarshalYAML): area = [polygon]; polygon = [loop...];
    loop = ["lat, lng"...].  Holes survive via ring_offsets."""
    import yaml

    # outer square + inner hole: ring_offsets [0, 4]
    xs = [-0.13, -0.12, -0.12, -0.13, -0.127, -0.123, -0.123, -0.127]
    ys = [51.50, 51.50, 51.51, 51.51, 51.503, 51.503, 51.507, 51.507]
    added = spark.createDataFrame(
        [("area/new/5", "area", "new", {"#building": "yes"}, xs, ys, [0, 4])],
        fixtures.FEATURE_SCHEMA,
    )
    p = str(tmp_path / "a.yaml")
    changes_yaml.export_changes_yaml(p, added=added)
    docs = [d for d in yaml.safe_load_all(open(p)) if d]
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


def test_yaml_area_path_id_variant_rejected(spark, tmp_path):
    """The reference's alternate loop form (a list of path-ID strings,
    yaml.go newAreaFromYAML) carries references, not coordinates -- the
    importer must reject it explicitly, not crash on float()."""
    import pytest

    p = str(tmp_path / "ref.yaml")
    with open(p, "w") as f:
        f.write("id: area/x/1\narea:\n- - path/test/3\n  - path/test/4\n")
    with pytest.raises(ValueError, match="path reference"):
        changes_yaml.import_changes_yaml(spark, p)


def test_yaml_delta_size_guard(spark, tmp_path):
    """Change files are driver-collected edit deltas; a corpus-sized input
    must fail loudly BEFORE collect()."""
    import pytest

    big = spark.range(50).selectExpr(
        "concat('point/test/', id) AS feature_id", "'k' AS k", "'v' AS v"
    )
    with pytest.raises(ValueError, match="exceeds"):
        changes_yaml.export_changes_yaml(
            str(tmp_path / "x.yaml"), tag_adds=big, max_rows=10
        )
