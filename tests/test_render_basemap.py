"""Full BasemapRenderer parity (b6/renderer/renderer.go:216-401,
api/tiles.go:10-32), mirroring the reference's own renderer_test.go:

* TestFeaturesHaveTagsForNamespaceAndID -- rendered tile features carry
  `ns` (namespace) and `id` (lowercase hex of the numeric id) tags,
  split to shrink the string table (renderer.go:365-373).
* TestFeaturesAreOrderedByLayerTag -- features within a tile render in
  byLayerThenID order: the integer `layer` tag (Atoi, default 0), then
  FeatureID order (renderer.go:18-37).
* TestFillColourFromFeature -- the b6:colour dispatch vectors, including
  the gradient point 0.75 -> #f87f51 and the dropped invalids.
* TestRulesThatMatchAllTagValues -- a rule with an empty value matches
  any tag value (renderer.go:128-135).

Tile feature ids are the reference's FNV-1 TileFeatureID; the kernel is
pinned on Landon Noll's published FNV-1 64 test vectors.
"""

import pyspark.sql.functions as F
import pytest

from diagonal_b6_spark import fixtures
from diagonal_b6_spark.kernels import mvt
from diagonal_b6_spark.operators import render as R


def _tags(layer: dict, f: dict) -> dict:
    ti = f["tags"]
    return {
        layer["keys"][ti[i]]: layer["values"][ti[i + 1]] for i in range(0, len(ti), 2)
    }


def _area(fid, tags, clat, clng, half_m):
    xs, ys = fixtures._square(clat, clng, half_m)
    return {
        "feature_id": f"area/test/{fid}",
        "feature_type": "area",
        "ns": "test/fixtures",
        "tags": tags,
        "xs": [float(v) for v in xs],
        "ys": [float(v) for v in ys],
        "ring_offsets": [0],
    }


def test_fnv1_64_published_vectors():
    """FNV-1 64 test vectors from Noll's published reference list ("a",
    "foobar"), plus the offset basis for empty input -- pins that the
    kernel is FNV-1 (multiply then xor), matching Go's fnv.New64()."""
    h = 0xCBF29CE484222325
    for b in b"a":
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        h ^= b
    assert h == 0xAF63BD4C8601B7BE
    h = 0xCBF29CE484222325
    for b in b"foobar":
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        h ^= b
    assert h == 0x340D8765A4DDA9C2
    # the composed TileFeatureID forms differ per polygon index
    assert R.fnv1_64(2, "test", 7) != R.fnv1_64(2, "test", 7, polygon=0)
    assert R.fnv1_64(2, "test", 7, polygon=0) != R.fnv1_64(2, "test", 7, polygon=1)


def test_reference_hex_id_formatting():
    """renderer_test.go:54-56: LightermanWay's id renders as hex
    19813dd2 -- the exact FormatUint(v, 16) rule our F.hex/lower pair
    reproduces."""
    assert format(427900370, "x") == "19813dd2"


def test_tile_features_have_ns_and_id_tags(spark):
    """TestFeaturesHaveTagsForNamespaceAndID, on a synthetic building."""
    rows = [_area(427900370, {"#building": "yes"}, 51.535, -0.125, 50.0)]
    df = spark.createDataFrame(rows, schema=fixtures.FEATURE_SCHEMA)
    tiles = R.render_basemap_tiles(df, 16).collect()
    assert len(tiles) >= 1
    found = False
    for t in tiles:
        decoded = mvt.decode_tile(bytes(t["mvt"]))
        assert decoded[0]["name"] == "background"  # encoder.go:34-38
        layers = {l["name"]: l for l in decoded}
        assert set(layers) == {"background", *R.BASEMAP_LAYER_NAMES}
        for f in layers["building"]["features"]:
            tags = _tags(layers["building"], f)
            if tags.get("ns") == "test/fixtures" and tags.get("id") == "19813dd2":
                assert tags.get("building") == "yes"
                assert f["id"] == R.fnv1_64(2, "test/fixtures", 427900370, polygon=0)
                found = True
    assert found


def test_features_ordered_by_layer_tag(spark):
    """TestFeaturesAreOrderedByLayerTag: basement (layer -1) before the
    untagged original before the roof (layer 2), via decoded ids."""
    rows = [
        _area(1, {"#building": "yes"}, 51.535, -0.125, 50.0),
        _area(2, {"#building": "yes", "layer": "2"}, 51.535, -0.125, 50.0),  # roof
        _area(3, {"#building": "yes", "layer": "-1"}, 51.535, -0.125, 50.0),  # basement
    ]
    df = spark.createDataFrame(rows, schema=fixtures.FEATURE_SCHEMA)
    tiles = R.render_basemap_tiles(df, 16).collect()
    order = [
        R.fnv1_64(2, "test/fixtures", 3, polygon=0),
        R.fnv1_64(2, "test/fixtures", 1, polygon=0),
        R.fnv1_64(2, "test/fixtures", 2, polygon=0),
    ]
    checked = 0
    for t in tiles:
        layers = {l["name"]: l for l in mvt.decode_tile(bytes(t["mvt"]))}
        ids = [f["id"] for f in layers["building"]["features"]]
        if len(ids) == 3:
            assert ids == order
            checked += 1
    assert checked >= 1


@pytest.mark.parametrize(
    "value,expect",
    [
        ("#ff0000", "#ff0000"),  # RGB literal
        ("#ff000011", None),  # 8-digit: dropped
        ("#gg000011", None),  # bad hex, wrong length: dropped
        ("0.75", "#f87f51"),  # gradient point (the reference's own vector)
        ("4", "4"),  # palette index passthrough
        ("red", None),  # invalid: dropped
    ],
)
def test_fill_colour_from_feature_vectors(spark, value, expect):
    """TestFillColourFromFeature's table, through the staged tile tags."""
    rows = [_area(1, {"#building": "yes", "b6:colour": value}, 51.535, -0.125, 50.0)]
    df = spark.createDataFrame(rows, schema=fixtures.FEATURE_SCHEMA)
    st = R.stage_basemap_features(df, 16).collect()
    assert len(st) == 1
    got = dict(st[0]["tile_tags"]).get("b6:colour")
    assert got == expect


def test_rules_match_all_tag_values(spark):
    """TestRulesThatMatchAllTagValues: an empty rule value matches any
    tag value; a different key never matches."""
    rules = [("#building", "", 0, 0, "building", False)]
    rows = [
        _area(1, {"#building": "yes"}, 51.535, -0.125, 50.0),
        _area(2, {"#amenity": "cafe"}, 51.536, -0.126, 50.0),
    ]
    df = spark.createDataFrame(rows, schema=fixtures.FEATURE_SCHEMA)
    st = R.stage_basemap_features(df, 16, rules=rules).collect()
    assert [r["feature_id"] for r in st] == ["area/test/1"]
    assert st[0]["rule_key"] == "building"
    assert st[0]["rule_value"] == "yes"


def test_highway_area_demotes_to_linestring(spark):
    """fillFeaturesFromArea (renderer.go:283-295): a #highway area with
    no `area` tag (or area=no) renders as a linestring of its boundary
    path -- path-typed FNV id, no rule attribute tag -- while area=yes
    keeps the polygon form."""
    rows = [
        _area(90, {"#highway": "pedestrian"}, 51.535, -0.125, 40.0),
        _area(91, {"#highway": "pedestrian", "area": "yes"}, 51.535, -0.125, 40.0),
        _area(92, {"#highway": "pedestrian", "area": "no"}, 51.535, -0.125, 40.0),
    ]
    df = spark.createDataFrame(rows, schema=fixtures.FEATURE_SCHEMA)
    st = {r["feature_id"]: r for r in R.stage_basemap_features(df, 16).collect()}
    assert st["area/test/90"]["demoted"] and st["area/test/90"]["render_type"] == "path"
    assert st["area/test/92"]["demoted"]
    assert not st["area/test/91"]["demoted"]
    assert st["area/test/91"]["render_type"] == "area"
    assert "highway" not in dict(st["area/test/90"]["tile_tags"])
    assert dict(st["area/test/91"]["tile_tags"])["highway"] == "pedestrian"

    tiles = R.render_basemap_tiles(df, 16).collect()
    got = set()
    for t in tiles:
        layers = {l["name"]: l for l in mvt.decode_tile(bytes(t["mvt"]))}
        for f in layers["road"]["features"]:
            got.add((f["id"], f["type"]))
    # demoted areas carry the boundary PATH's id (type order 1, no
    # polygon suffix); the honest area keeps the polygon id
    assert (R.fnv1_64(1, "test/fixtures", 90), mvt.GEOM_LINESTRING) in got
    assert (R.fnv1_64(1, "test/fixtures", 92), mvt.GEOM_LINESTRING) in got
    assert (R.fnv1_64(2, "test/fixtures", 91, polygon=0), mvt.GEOM_POLYGON) in got


def test_dispatch_ignores_zoom_but_admission_does_not(spark):
    """renderFeature (renderer.go:235-244) matches rules WITHOUT a zoom
    check -- only findFeatures' admission query is zoom-gated.  A
    feature with #water and #building=yes at z8 is admitted via the
    water rule but renders as a building (the earlier match)."""
    rows = [_area(1, {"#water": "yes", "#building": "yes"}, 51.535, -0.125, 50.0)]
    df = spark.createDataFrame(rows, schema=fixtures.FEATURE_SCHEMA)
    st = R.stage_basemap_features(df, 8).collect()
    assert len(st) == 1 and st[0]["layer"] == "building"
    # a plain z12 building is NOT admitted at z8 at all
    rows2 = [_area(2, {"#building": "yes"}, 51.535, -0.125, 50.0)]
    df2 = spark.createDataFrame(rows2, schema=fixtures.FEATURE_SCHEMA)
    assert R.stage_basemap_features(df2, 8).count() == 0


def test_stage_plan_is_pure_codegen(spark):
    """The staging operator is one whole-stage Project over the scan --
    no Python/Arrow eval nodes; the only Python in the basemap path is
    the per-tile MVT byte assembly."""
    feats = fixtures.features_table(spark)
    plan = R.stage_basemap_features(feats, 14)._jdf.queryExecution().executedPlan().toString()
    for needle in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert needle not in plan


def test_non_physical_features_stage_nothing(spark):
    """FillFeaturesFromFeature type-switches on PhysicalFeature
    (renderer.go:246-259): a relation matching a render rule emits no
    tile feature."""
    rows = [
        {
            "feature_id": "relation/test/7",
            "feature_type": "relation",
            "ns": "test/fixtures",
            "tags": {"#building": "yes", "member:0": "area/test/1"},
            "xs": [],
            "ys": [],
            "ring_offsets": [],
        },
        _area(1, {"#building": "yes"}, 51.535, -0.125, 50.0),
    ]
    df = spark.createDataFrame(rows, schema=fixtures.FEATURE_SCHEMA)
    st = R.stage_basemap_features(df, 16).collect()
    assert [r["feature_id"] for r in st] == ["area/test/1"]
