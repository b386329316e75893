"""Vector-tile sink: render features into MVT protobuf tiles per (z, x, y).

Reference lifecycle: a tile request runs the query against the world,
projects to tile coordinates, simplifies and encodes MVT
(b6/renderer/query.go:48-119, renderer.go:109-143, encoder.go;
b6/tiles.go:52-63 tile bounds; 10k features/tile cap).  Spark-first:
batch-materialize ALL tiles of a zoom in one job -- explode each feature
to the tiles it covers (tile_cover), groupBy tile, and encode each
group's features in an ``applyInPandas`` kernel using the pure-Python
MVT writer (kernels/mvt.py).  The shuffle key is the tile id, so tile
render parallelism equals tile count; a per-tile feature cap mirrors the
reference's 10k limit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import geom as geom_kernel
from ..kernels import mvt
from . import geo_fn

_GEOM_TYPE = {"point": mvt.GEOM_POINT, "path": mvt.GEOM_LINESTRING, "area": mvt.GEOM_POLYGON}


def render_tiles(
    features: DataFrame,
    zoom: int,
    layer_name: str = "features",
    max_features_per_tile: int = 10_000,
) -> DataFrame:
    """(zoom, tile_x, tile_y, n_features, mvt binary) per covered tile."""
    cover = geo_fn.tile_cover(features, zoom).select("feature_id", "tile_x", "tile_y")
    tagged = features.select(
        "feature_id", "feature_type", "tags", "xs", "ys", "ring_offsets"
    )
    joined = cover.join(tagged, "feature_id")

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tile_x"].iloc[0])
        ty = int(pdf["tile_y"].iloc[0])
        pdf = pdf.iloc[:max_features_per_tile]
        keys: list[str] = []
        values: list[str] = []
        kidx: dict[str, int] = {}
        vidx: dict[str, int] = {}
        feats: list[bytes] = []
        for fid_num, r in enumerate(pdf.itertuples(index=False)):
            xs = np.asarray(r.xs, dtype=np.float64)
            ys = np.asarray(r.ys, dtype=np.float64)
            offs = list(r.ring_offsets) + [len(xs)]
            rings = []
            for a, b in zip(offs[:-1], offs[1:]):
                x, y = mvt.latlng_to_tile_local(ys[a:b], xs[a:b], zoom, tx, ty)
                if len(x) > 1000:
                    # reference encoder.go:80-84: rings over 1000 points
                    # are Douglas-Peucker-simplified at 5.0 tile-pixel
                    # units before encoding (kernels/geom.douglas_peucker
                    # matches renderer/simplify.go exactly)
                    keep = geom_kernel.douglas_peucker(x, y, 5.0)
                    x, y = x[keep], y[keep]
                rings.append(np.stack([x, y], axis=1))
            tag_idx: list[int] = []
            for k, v in sorted((r.tags or {}).items()):
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                if v not in vidx:
                    vidx[v] = len(values)
                    values.append(v)
                tag_idx += [kidx[k], vidx[v]]
            feats.append(
                mvt.encode_feature(fid_num, _GEOM_TYPE[r.feature_type], rings, tag_idx)
            )
        # every encoded tile leads with the full-extent background layer
        # (renderer/encoder.go:34-38,63-75; TestEncodeTile's layer order)
        tile = mvt.background_layer() + mvt.encode_layer(
            layer_name, feats, keys, values
        )
        return pd.DataFrame(
            {
                "zoom": [zoom],
                "tile_x": [tx],
                "tile_y": [ty],
                "n_features": [len(feats)],
                "mvt": [tile],
            }
        )

    return joined.groupBy("tile_x", "tile_y").applyInPandas(
        encode, schema="zoom int, tile_x long, tile_y long, n_features int, mvt binary"
    )


# --- renderer colour pipeline (b6/renderer/colours.go + renderer.go:375-401) -

# "Blue to red gradient from simona@diagonal.works" (renderer.go:376-381)
DEFAULT_GRADIENT: list[tuple[float, str]] = [
    (0.0, "#d3d6fd"),
    (0.30, "#fca364"),
    (0.60, "#f88a4f"),
    (1.00, "#f96c53"),
]


def _hex_rgb(s: str) -> tuple[float, float, float]:
    return tuple(int(s[i : i + 2], 16) / 255.0 for i in (1, 3, 5))


def gradient_interpolate_col(value, gradient: list[tuple[float, str]] | None = None):
    """Gradient.Interpolate (colours.go:44-53) as one pure column
    expression: sort.Search's first-stop-greater-than-value bracket,
    linear channel interpolation, ToHexString's round-half-away channel
    quantization.  Values below the first stop clamp to it; at or above
    the last stop clamp to the last (the reference's -1.0 / 2.0 cases)."""
    g = gradient or DEFAULT_GRADIENT
    stops = [(v, _hex_rgb(c)) for v, c in g]

    def chan(k: int):
        expr = F.lit(stops[-1][1][k])
        # build the CASE chain from the last bracket down
        for i in range(len(stops) - 1, 0, -1):
            v0, c0 = stops[i - 1]
            v1, c1 = stops[i]
            ratio = (value - F.lit(v0)) / F.lit(v1 - v0)
            interp = F.lit(c0[k]) + (F.lit(c1[k]) - F.lit(c0[k])) * ratio
            expr = F.when(value < F.lit(v1), interp).otherwise(expr)
        return F.when(value < F.lit(stops[0][0]), F.lit(stops[0][1][k])).otherwise(expr)

    def byte(c):
        return F.round(c * F.lit(255.0), 0).cast("int")

    return F.format_string(
        "#%02x%02x%02x", byte(chan(0)), byte(chan(1)), byte(chan(2))
    )


def colour_from_hex_col(v):
    """ColourFromHexString -> ToHexString roundtrip (colours.go:15-23),
    including Sscanf's stop-at-first-failure semantics: a channel parses
    only if every earlier channel parsed; anything else reads as 0
    (so "invalid" -> #000000, the reference's own test vector)."""
    hex2 = "[0-9a-fA-F]{2}"
    ok_r = (F.length(v) >= 3) & (v.substr(1, 1) == "#") & v.substr(2, 2).rlike(f"^{hex2}$")
    ok_g = ok_r & (F.length(v) >= 5) & v.substr(4, 2).rlike(f"^{hex2}$")
    ok_b = ok_g & (F.length(v) >= 7) & v.substr(6, 2).rlike(f"^{hex2}$")

    def chan(ok, pos):
        return F.when(ok, F.conv(v.substr(pos, 2), 16, 10).cast("int")).otherwise(F.lit(0))

    return F.format_string(
        "#%02x%02x%02x", chan(ok_r, 2), chan(ok_g, 4), chan(ok_b, 6)
    )


def colour_from_tag_value_col(v):
    """colourFromTagValue (renderer.go:383-394): 7-char #hex strings
    roundtrip-sanitise; integer strings pass through as palette indices;
    float strings interpolate the default gradient; anything else ''."""
    is_hexish = (F.length(v) == 7) & (v.substr(1, 1) == "#")
    is_int = v.rlike("^[+-]?[0-9]+$")
    as_float = v.try_cast("double")
    return (
        F.when(is_hexish, colour_from_hex_col(v))
        .when(is_int, v)
        .when(as_float.isNotNull(), gradient_interpolate_col(as_float))
        .otherwise(F.lit(""))
    )


# --- basemap render rules (renderer.go:109-211) ------------------------------

# (key, value or None = any, min_zoom, max_zoom, layer, label) -- the
# reference's BasemapRenderRules verbatim (renderer.go:171-211); 0 means
# no bound, matching RenderRule.ToQuery's zoom test (renderer.go:118-121)
BASEMAP_RENDER_RULES: list[tuple] = [
    ("#building", "train_station", 8, 0, "building", False),
    ("#building", None, 12, 0, "building", False),
    ("#amenity", None, 12, 0, "amenity", False),
    ("#highway", "cycleway", 14, 0, "road", False),
    ("#highway", "footway", 14, 0, "road", False),
    ("#highway", "motorway", 8, 0, "road", False),
    ("#highway", "path", 14, 0, "road", False),
    ("#highway", "pedestrian", 14, 0, "road", False),
    ("#highway", "primary", 8, 0, "road", True),
    ("#highway", "residential", 12, 0, "road", False),
    ("#highway", "secondary", 14, 0, "road", True),
    ("#highway", "service", 12, 0, "road", False),
    ("#highway", "street", 12, 0, "road", False),
    ("#highway", "tertiary", 12, 0, "road", True),
    ("#highway", "trunk", 8, 0, "road", True),
    ("#highway", "unclassified", 12, 0, "road", False),
    ("#landuse", "cemetary", 12, 0, "landuse", False),
    ("#landuse", "forest", 12, 0, "landuse", False),
    ("#landuse", "grass", 12, 0, "landuse", False),
    ("#landuse", "heath", 14, 0, "landuse", False),
    ("#landuse", "meadow", 14, 0, "landuse", False),
    ("#landuse", "park", 12, 0, "landuse", False),
    ("#landuse", "pitch", 12, 0, "landuse", False),
    ("#landuse", "vacant", 12, 0, "landuse", False),
    ("#leisure", "park", 12, 0, "landuse", False),
    ("#leisure", "pitch", 12, 0, "landuse", False),
    ("#leisure", "playground", 12, 0, "landuse", False),
    ("#leisure", "garden", 12, 0, "landuse", False),
    ("#leisure", "nature_reserve", 12, 0, "landuse", False),
    ("#natural", "coastline", 8, 0, "boundary", False),
    ("#natural", "heath", 12, 0, "landuse", False),
    ("#outline", "contour", 12, 0, "contour", False),
    ("#railway", "rail", 8, 0, "road", False),
    ("#water", None, 8, 0, "water", False),
    ("#waterway", None, 8, 0, "water", False),
    ("#place", "city", 0, 12, "label", True),
    ("#place", "town", 0, 14, "label", True),
]


def apply_render_rules(features: DataFrame, zoom: int, rules=None) -> DataFrame:
    """RenderRules.ToQuery at `zoom` (renderer.go:140-148): keep only
    features matched by SOME zoom-admitted rule, and attach the FIRST
    matching rule's layer + label flag (rule order is the reference's
    declaration order).  Pure column predicate over the tags map --
    whole-stage codegen, replayable verbatim in SQL."""
    rs = rules or BASEMAP_RENDER_RULES
    layer_expr, label_expr, any_match = None, None, None
    for key, value, mn, mx, layer, label in rs:
        if (mn > 0 and zoom < mn) or (mx > 0 and zoom > mx):
            continue
        t = F.col("tags").getItem(key)
        cond = t.isNotNull() if value is None else (t == value)
        any_match = cond if any_match is None else (any_match | cond)
        layer_expr = (
            F.when(cond, F.lit(layer))
            if layer_expr is None
            else layer_expr.when(cond, F.lit(layer))
        )
        label_expr = (
            F.when(cond, F.lit(label))
            if label_expr is None
            else label_expr.when(cond, F.lit(label))
        )
    if any_match is None:  # no rule admits this zoom
        return features.filter(F.lit(False)).withColumn(
            "layer", F.lit(None).cast("string")
        ).withColumn("label", F.lit(None).cast("boolean"))
    return features.filter(any_match).withColumn("layer", layer_expr).withColumn(
        "label", label_expr
    )


# --- QueryRenderer: shell-query string -> MVT "query" layer ------------------

# renderer/query.go:23-34 QueryRenderRules: the feature-type attribute
# keys, first match wins, emitted with the '#' stripped.
QUERY_RENDER_RULE_KEYS = [
    "#amenity",
    "#boundary",
    "#highway",
    "#landuse",
    "#natural",
    "#place",
    "#railway",
    "#water",
    "#waterway",
]

QUERY_RENDERER_MAX_FEATURES_PER_TILE = 10_000  # query.go:36


def render_query_tiles(
    spark,
    features: DataFrame,
    q: str,
    zoom: int,
    v: str | None = None,
) -> DataFrame:
    """The QueryRenderer endpoint (renderer/query.go:48-119) Spark-first:
    evaluate the shell-language query string against the feature table,
    attach the feature-type attribute (first matching
    QUERY_RENDER_RULE_KEYS key, '#' stripped) plus the optional value
    function's result as tag "v", and batch-render EVERY covered tile of
    the zoom (the per-request MightIntersect(tile) of the reference IS
    the tile_cover join key here).

    `v` is a shell expression returning a function (e.g.
    'get-string "name"'); like the reference, only int- and
    string-valued results are attached (query.go:96-104 switches on
    int/string/Stringer and silently drops everything else).  The name
    label the reference adds via RenderRule{Label: true} rides along as
    the "name" tag when present."""
    from ..shell import parse_expression
    from ..shell.evaluate import (
        ColVal,
        Env,
        RowRef,
        ShellError,
        _as_callable,
        _find,
        evaluate_expression,
    )

    env = Env(spark, features)
    matched = _find(env, parse_expression(q))

    # feature-type attribute: first matching rule key, '#' stripped --
    # the same AddTags semantics as the other renderers, over the
    # query-renderer's key-only rule list
    query_rules = [(k, None, 0, 0, None, False) for k in QUERY_RENDER_RULE_KEYS]
    tags = F.map_concat(_rules_type_tag(query_rules), _label_tag())

    if v is not None:
        fn = _as_callable(evaluate_expression(parse_expression(v), env))
        out = fn.apply(env, [RowRef(matched)])
        if not isinstance(out, ColVal):
            raise ShellError(f"expected {v!r} to return a per-feature value")
        dtype = matched.select(out.col.alias("_v")).schema["_v"].dataType.simpleString()
        if dtype in ("string",) or dtype.startswith(("int", "bigint", "smallint", "tinyint", "long")):
            vm = F.when(
                out.col.isNotNull(),
                F.create_map(F.lit("v"), out.col.cast("string")),
            ).otherwise(_empty_tag_map())
            tags = F.map_concat(tags, vm)

    staged = matched.withColumn("tags", tags)
    return render_tiles(
        staged,
        zoom,
        layer_name="query",
        max_features_per_tile=QUERY_RENDERER_MAX_FEATURES_PER_TILE,
    )


def _empty_tag_map():
    return F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )


def _rules_type_tag(rs) -> "F.Column":
    """RenderRules.AddTags (renderer.go:161-169): first matching rule's
    key with '#' stripped, no zoom gate; value-specific rules need the
    value to match, key rules need presence."""
    return F.coalesce(
        *[
            F.when(
                (
                    F.col("tags").getItem(key).isNotNull()
                    if value is None
                    else (F.col("tags").getItem(key) == value)
                ),
                F.create_map(F.lit(key[1:]), F.col("tags").getItem(key)),
            )
            for key, value, _mn, _mx, _layer, _label in rs
        ],
        _empty_tag_map(),
    )


def _label_tag() -> "F.Column":
    return F.when(
        F.col("tags").getItem("name").isNotNull(),
        F.create_map(F.lit("name"), F.col("tags").getItem("name")),
    ).otherwise(_empty_tag_map())


def render_histogram_tiles(
    features: DataFrame,
    buckets: DataFrame,
    zoom: int,
    rules=None,
) -> DataFrame:
    """The HistogramRenderer endpoint (renderer/histogram.go:23-81):
    features that appear in a histogram collection render with their
    bucket index as tag "bucket" (stringified int) plus the
    render-rules type attribute and name label, layer 'histogram';
    features absent from the histogram don't render.

    `buckets` is the (feature_id, bucket int) table -- the natural
    DataFrame form of the reference's bucketed collection (the
    histogram_b6 / histogram_swatch operators emit exactly this)."""
    rs = rules or BASEMAP_RENDER_RULES
    b = buckets.select(
        "feature_id", F.col("bucket").cast("int").alias("_bucket")
    )
    members = features.join(b, "feature_id")
    tags = F.map_concat(
        _rules_type_tag(rs),
        _label_tag(),
        F.create_map(F.lit("bucket"), F.col("_bucket").cast("string")),
    )
    staged = members.withColumn("tags", tags).drop("_bucket")
    return render_tiles(staged, zoom, layer_name="histogram")


# --- full BasemapRenderer staging (renderer.go:216-401) ----------------------

# BasemapLayer enum order (renderer.go:41-55): layers render in this
# order inside every tile, and NewLayers creates all nine even if empty.
BASEMAP_LAYER_NAMES = [
    "boundary", "contour", "water", "road", "landuse",
    "building", "point", "label", "amenity",
]

# FeatureID.Less orders by (Type, Namespace, Value) (world.go:401-411);
# the Type enum is Point, Path, Area, Relation, Invalid, Collection,
# Expression (world.go:285-291).
FEATURE_TYPE_ORDER = {
    "point": 0, "path": 1, "area": 2, "relation": 3,
    "collection": 5, "expression": 6,
}


def fnv1_64(type_order: int, ns: str, value: int, polygon: int | None = None) -> int:
    """api/tiles.go:10-32 TileFeatureID / TileFeatureIDForPolygon: Go's
    fnv.New64() (FNV-1: multiply then xor) over LE-uint64(type) + the
    namespace bytes + LE-uint64(value), plus LE-uint64(polygon) for the
    per-polygon variant."""
    h = 0xCBF29CE484222325

    def mix(bs: bytes) -> None:
        nonlocal h
        for b in bs:
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            h ^= b

    mix(int(type_order).to_bytes(8, "little"))
    mix(ns.encode())
    mix((int(value) & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little"))
    if polygon is not None:
        mix(int(polygon).to_bytes(8, "little"))
    return h


def stage_basemap_features(features: DataFrame, zoom: int, rules=None) -> DataFrame:
    """The BasemapRenderer feature stage (renderer.go:216-401) as pure
    column expressions:

    * admission: a feature enters the tile iff SOME zoom-admitted rule
      matches it (findFeatures runs RenderRules.ToQuery(zoom),
      renderer.go:228-233);
    * dispatch: the rendering rule is the FIRST match over the FULL rule
      list -- renderFeature (renderer.go:235-244) does NOT re-check the
      zoom, so a feature admitted by one rule can render under an
      earlier, zoom-inadmissible one;
    * tile tags (fillTagsFromTags, renderer.go:343-401): the rule key
      with '#' stripped mapped to the FEATURE's value, the label-gated
      name (addr:housename over name), the sanitised b6:colour
      (colourFromTagValue -- dropped when it converts to ''), and the
      split id: `id` = lowercase hex of the numeric id, `ns` = the
      feature's namespace;
    * highway-area demotion (fillFeaturesFromArea, renderer.go:283-295):
      an area tagged #highway whose `area` tag is absent or "no" renders
      as a LINESTRING of its boundary path and carries only
      fillTagsFromTags tags (no rule-type tag);
    * sort keys: byLayerThenID (renderer.go:18-37) -- the integer
      `layer` tag (strict Atoi, anything else 0), then FeatureID order
      (type, namespace, value).

    Returns one row per tile feature: feature_id, render_type (the MVT
    geometry type after demotion), layer, layer_num/type_order/ns/value
    (the sort key), label, demoted, tile_tags, and the packed geometry.
    """
    rs = rules or BASEMAP_RENDER_RULES

    def t(key):
        return F.col("tags").getItem(key)

    def matches(key, value):
        # RenderRule.Matches (renderer.go:128-135): nil/"" value = any
        if value is None or value == "":
            return t(key).isNotNull()
        return t(key) == value

    admitted = None
    for key, value, mn, mx, _layer, _label in rs:
        if (mn > 0 and zoom < mn) or (mx > 0 and zoom > mx):
            continue
        cond = matches(key, value)
        admitted = cond if admitted is None else (admitted | cond)
    if admitted is None:
        admitted = F.lit(False)

    rule_key = layer_expr = label_expr = any_rule = None
    for key, value, _mn, _mx, layer, label in rs:
        cond = matches(key, value)
        rule_key = (
            F.when(cond, F.lit(key)) if rule_key is None else rule_key.when(cond, F.lit(key))
        )
        layer_expr = (
            F.when(cond, F.lit(layer)) if layer_expr is None else layer_expr.when(cond, F.lit(layer))
        )
        label_expr = (
            F.when(cond, F.lit(label)) if label_expr is None else label_expr.when(cond, F.lit(label))
        )
        any_rule = cond if any_rule is None else (any_rule | cond)

    # only physical features render: FillFeaturesFromFeature type-switches
    # on PhysicalFeature (renderer.go:246-259) -- a relation or collection
    # matching a rule stages nothing
    physical = F.col("feature_type").isin("point", "path", "area")
    staged = features.filter(admitted & any_rule & physical).select(
        "*",
        rule_key.alias("_rk"),
        layer_expr.alias("layer"),
        label_expr.alias("label"),
    )

    demoted = (
        (F.col("feature_type") == "area")
        & t("#highway").isNotNull()
        & (t("area").isNull() | (t("area") == "no"))
    )
    # numeric id for the split id tag + sort key; relation-derived areas
    # carry an r-prefixed value ("area/osm/r5"), so fall back to the
    # digit run (the reference keys those by the relation id too --
    # its namespaces differ where ours share "osm", a documented
    # id-collision nuance between way- and relation-derived areas)
    tail = F.element_at(F.split("feature_id", "/"), -1)
    value_num = F.coalesce(
        tail.try_cast("long"),
        F.regexp_extract(tail, "([0-9]+)", 1).try_cast("long"),
        F.lit(0),
    )
    layer_num = F.coalesce(
        F.when(
            t("layer").rlike("^[+-]?[0-9]+$"), t("layer").try_cast("int")
        ),
        F.lit(0),
    )
    type_order = F.coalesce(
        *[
            F.when(F.col("feature_type") == k, F.lit(v))
            for k, v in FEATURE_TYPE_ORDER.items()
        ]
    )

    rule_tag = F.when(
        demoted, _empty_tag_map()
    ).otherwise(
        F.create_map(
            F.expr("substring(_rk, 2)"), F.col("tags").getItem(F.col("_rk"))
        )
    )
    name_tag = F.when(
        F.col("label")
        & F.coalesce(t("addr:housename"), t("name")).isNotNull(),
        F.create_map(
            F.lit("name"), F.coalesce(t("addr:housename"), t("name"))
        ),
    ).otherwise(_empty_tag_map())
    colour = F.when(
        t("b6:colour").isNotNull(), colour_from_tag_value_col(t("b6:colour"))
    ).otherwise(F.lit(""))
    colour_tag = F.when(
        colour != "", F.create_map(F.lit("b6:colour"), colour)
    ).otherwise(_empty_tag_map())
    id_tags = F.create_map(
        F.lit("id"), F.lower(F.hex(value_num)),
        F.lit("ns"), F.col("ns"),
    )

    return staged.select(
        "feature_id",
        "feature_type",
        F.when(demoted, F.lit("path")).otherwise(F.col("feature_type")).alias(
            "render_type"
        ),
        "layer",
        "label",
        demoted.alias("demoted"),
        F.when(demoted, F.lit(None).cast("string"))
        .otherwise(F.expr("substring(_rk, 2)"))
        .alias("rule_key"),
        F.when(demoted, F.lit(None).cast("string"))
        .otherwise(F.col("tags").getItem(F.col("_rk")))
        .alias("rule_value"),
        layer_num.alias("layer_num"),
        type_order.alias("type_order"),
        "ns",
        value_num.alias("value"),
        F.map_concat(rule_tag, name_tag, colour_tag, id_tags).alias("tile_tags"),
        "xs",
        "ys",
        "ring_offsets",
    )


def render_basemap_tiles(features: DataFrame, zoom: int, rules=None) -> DataFrame:
    """BasemapRenderer.Render (renderer.go:221-233), batch form: one MVT
    tile per covered (x, y) at `zoom`, each carrying all nine basemap
    layers in enum order.  Features are sorted byLayerThenID within the
    tile; tile feature ids are the reference's FNV-1 TileFeatureID
    (TileFeatureIDForPolygon with polygon 0 for areas -- our packed area
    rows hold one polygon; demoted highway areas take the boundary
    path's id, which for closed-way areas is the same numeric value
    under the path type)."""
    staged = stage_basemap_features(features, zoom, rules)
    cover = geo_fn.tile_cover(staged, zoom).select("feature_id", "tile_x", "tile_y")
    joined = cover.join(staged, "feature_id")

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tile_x"].iloc[0])
        ty = int(pdf["tile_y"].iloc[0])
        pdf = pdf.sort_values(
            ["layer_num", "type_order", "ns", "value"], kind="stable"
        )
        layer_feats: dict[str, list[bytes]] = {n: [] for n in BASEMAP_LAYER_NAMES}
        layer_keys: dict[str, list] = {n: ([], [], {}, {}) for n in BASEMAP_LAYER_NAMES}
        n_feats = 0
        for r in pdf.itertuples(index=False):
            xs = np.asarray(r.xs, dtype=np.float64)
            ys = np.asarray(r.ys, dtype=np.float64)
            offs = list(r.ring_offsets) + [len(xs)]
            rings = []
            for a, b in zip(offs[:-1], offs[1:]):
                x, y = mvt.latlng_to_tile_local(ys[a:b], xs[a:b], zoom, tx, ty)
                if len(x) > 1000:
                    keep = geom_kernel.douglas_peucker(x, y, 5.0)
                    x, y = x[keep], y[keep]
                rings.append(np.stack([x, y], axis=1))
            if bool(r.demoted):
                fid = fnv1_64(FEATURE_TYPE_ORDER["path"], r.ns, r.value)
            elif r.feature_type == "area":
                fid = fnv1_64(FEATURE_TYPE_ORDER["area"], r.ns, r.value, polygon=0)
            else:
                fid = fnv1_64(r.type_order, r.ns, r.value)
            keys, values, kidx, vidx = layer_keys[r.layer]
            tag_idx: list[int] = []
            for k, v in sorted((r.tile_tags or {}).items()):
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                if v not in vidx:
                    vidx[v] = len(values)
                    values.append(v)
                tag_idx += [kidx[k], vidx[v]]
            layer_feats[r.layer].append(
                mvt.encode_feature(fid, _GEOM_TYPE[r.render_type], rings, tag_idx)
            )
            n_feats += 1
        tile = mvt.background_layer() + b"".join(
            mvt.encode_layer(
                name, layer_feats[name], layer_keys[name][0], layer_keys[name][1]
            )
            for name in BASEMAP_LAYER_NAMES
        )
        return pd.DataFrame(
            {
                "zoom": [zoom],
                "tile_x": [tx],
                "tile_y": [ty],
                "n_features": [n_feats],
                "mvt": [tile],
            }
        )

    return joined.groupBy("tile_x", "tile_y").applyInPandas(
        encode, schema="zoom int, tile_x long, tile_y long, n_features int, mvt binary"
    )


def render_collection_tiles(
    features: DataFrame,
    collection_id: str,
    zoom: int,
    rules=None,
) -> DataFrame:
    """The CollectionRenderer endpoint (renderer/collection.go:22-66):
    resolve a stored collection feature's members -- ids appear on BOTH
    the key and value sides (collection_test.go expects the distinct
    union) -- find them in the world, attach the render-rules type
    attribute ('#' stripped, first matching rule, no zoom gate in
    AddTags) plus the name label, and render layer 'collection' for
    every covered tile of the zoom.

    Our collection features store members as member:<i> /
    member_key:<i> tag entries (the FEATURE_SCHEMA pairing documented
    at shell/stdlib._composite_feature_change)."""
    rs = rules or BASEMAP_RENDER_RULES
    ids = (
        features.filter(F.col("feature_id") == collection_id)
        .select(F.explode("tags").alias("k", "v"))
        .filter(F.col("k").rlike("^member(_key)?:"))
        .select(F.col("v").alias("feature_id"))
        .distinct()
    )
    members = features.join(F.broadcast(ids), "feature_id", "semi")
    staged = members.withColumn(
        "tags", F.map_concat(_rules_type_tag(rs), _label_tag())
    )
    return render_tiles(staged, zoom, layer_name="collection")
