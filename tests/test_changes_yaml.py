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
