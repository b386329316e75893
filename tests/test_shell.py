"""Shell-language front end: parse shapes vs the reference's grammar tests
(b6/api/shell_test.go) and Spark evaluation vs direct operator calls."""

import pytest

import diagonal_b6_spark.shell.parse as P
from diagonal_b6_spark import fixtures
from diagonal_b6_spark.operators import find as find_ops
from diagonal_b6_spark.shell import ParseError, parse_expression, run

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ------------------------------------------------------------ parse shapes --
# Mirrors the grammar cases of the reference's shell_test.go (parse trees,
# not protos): literals, calls, pipelines, lambdas, queries, collections.


def test_parse_literals():
    assert parse_expression("42") == P.Int(42)
    assert parse_expression("42.0") == P.Float(42.0)
    assert parse_expression("19.4008, -99.1663") == P.Point(19.4008, -99.1663)
    assert parse_expression("#highway=path") == P.Tag("#highway", "path")
    assert parse_expression("#nhs:hospital=yes") == P.Tag("#nhs:hospital", "yes")
    assert parse_expression('name="The Lighterman"') == P.Tag(
        "name", "The Lighterman"
    )


def test_parse_condensed_feature_ids():
    # alias table shell.go:60-110: /n /w /a /r expand into full ids
    # (targeting the OSM world's "osm" namespace, parse.py:_ALIAS_NS)
    e = parse_expression("find-feature /n/6082053666")
    assert e.args == [P.FeatureId("point/osm/6082053666")]
    e = parse_expression("find-area /a/115912092")
    assert e.args == [P.FeatureId("area/osm/115912092")]
    e = parse_expression("find-feature /area/test/1")
    assert e.args == [P.FeatureId("area/test/1")]


def test_parse_pipeline_is_pipelined_call():
    # `a | b` => Call(fn=b, args=[a], pipelined) (shell.go Pipeline)
    e = parse_expression('find "highway=primary" | highlight')
    assert isinstance(e, P.Call) and e.pipelined
    assert e.fn.fn == P.Symbol("highlight")
    assert isinstance(e.args[0], P.Call)
    assert e.args[0].fn == P.Symbol("find")


def test_parse_three_stage_pipeline_left_assoc():
    e = parse_expression("all-areas | filter | highlight")
    assert e.pipelined and e.fn.fn == P.Symbol("highlight")
    inner = e.args[0]
    assert inner.pipelined and inner.fn.fn == P.Symbol("filter")


def test_parse_lambda_forms():
    e = parse_expression('map {f -> tag f "name"} (all-areas)')
    lam = e.args[0]
    assert isinstance(lam, P.Lambda) and lam.args == ["f"]
    e = parse_expression("with-change {-> building-access}")
    lam = e.args[0]
    assert isinstance(lam, P.Lambda) and lam.args == []


def test_parse_query_nesting():
    e = parse_expression(
        "find [#building=yes & [#shop=supermarket | #shop=convenience]]"
    )
    q = e.args[0].node
    assert isinstance(q, P.QAnd)
    assert q.a == P.QTagged("#building", "yes")
    assert isinstance(q.b, P.QOr)
    assert q.b.a == P.QTagged("#shop", "supermarket")


def test_parse_query_without_value():
    e = parse_expression("find [#building]")
    assert e.args[0].node == P.QKeyed("#building")


def test_parse_collection_literals():
    # explicit keys -> pair(k, v); implicit keys fill 0..n-1 (reduceCollectionItems)
    e = parse_expression('{"motorway": 36.0, "primary": 32.0}')
    assert e.fn == P.Symbol("collection") and len(e.args) == 2
    assert e.args[0].args == [P.Str("motorway"), P.Float(36.0)]
    e = parse_expression('{"motorway", "primary"}')
    assert e.args[0].args == [P.Int(0), P.Str("motorway")]
    assert e.args[1].args == [P.Int(1), P.Str("primary")]


def test_parse_latlng_only_in_expression_position():
    # inside a collection, FLOAT ',' FLOAT stays two items (goyacc context)
    e = parse_expression("{36.0, 32.0}")
    assert len(e.args) == 2
    # in arg position it's a point literal
    e = parse_expression("pair 55.614929, -2.8048709 /area/test/9")
    assert e.args[0] == P.Point(55.614929, -2.8048709)


def test_parse_group_nesting():
    e = parse_expression("find (intersecting (find-area /area/test/1))")
    inner = e.args[0]
    assert inner.fn == P.Symbol("intersecting")
    assert inner.args[0].fn == P.Symbol("find-area")


def test_parse_errors():
    with pytest.raises(ParseError):
        parse_expression('find "unterminated')
    with pytest.raises(ParseError):
        parse_expression("find [")
    with pytest.raises(ParseError):
        parse_expression("1.2.3")


# -------------------------------------------------------------- evaluation --


@pytest.fixture(scope="module")
def feats(spark):
    return fixtures.features_table(spark)


def test_eval_find_tag_query_matches_operator(spark, feats):
    got = run(spark, feats, "find [#amenity=pub]").select("feature_id")
    want = find_ops.find(feats, find_ops.tagged("#amenity", "pub")).select(
        "feature_id"
    )
    assert sorted(r.feature_id for r in got.collect()) == sorted(
        r.feature_id for r in want.collect()
    )


def test_eval_take_is_feature_id_ordered(spark, feats):
    rows = run(spark, feats, "find [#amenity=pub] | take 3").collect()
    ids = [r.feature_id for r in rows]
    assert ids == sorted(ids) and len(ids) == 3


def test_eval_map_lambda_compiles_to_columns(spark, feats):
    out = run(spark, feats, 'find [#amenity] | map {f -> get f "#amenity"}')
    assert isinstance(out, DataFrame)
    # no Python row loop: the plan is a pure Project over the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # get returns a TAG: the engine's "key=value" double
    # (ui/lines_test.go TestHistogramWithTagKeys)
    vals = {r.tag for r in out.collect()}
    assert vals == {"#amenity=bench", "#amenity=cafe", "#amenity=pub"}


def test_eval_count_values(spark, feats):
    out = run(
        spark, feats, 'find [#amenity] | map {f -> get f "#amenity"} | count-values'
    )
    got = {r.value: r["count"] for r in out.collect()}
    assert got == {"#amenity=bench": 7, "#amenity=cafe": 7, "#amenity=pub": 6}


def test_eval_implicit_lambda_partial_application(spark, feats):
    # `map (tag "name")` binds the key; the mapped feature arrives first
    # (vm.go partialCall: bound args fill the LAST slots); the result is
    # a Tag per feature, materialized as its "key=value" double
    out = run(spark, feats, 'all-areas | map (tag "name")')
    got = dict((r.feature_id, r.tag) for r in out.collect())
    assert got["area/test/1"] == "name=square" and got["area/test/3"] == "name=concave"


def test_eval_nested_query_and_or(spark, feats):
    out = run(spark, feats, "find [#building=yes | #landuse=park]")
    ids = {r.feature_id for r in out.collect()}
    assert ids == {"area/test/1", "area/test/2", "area/test/3"}


def test_eval_intersecting_point_routes_to_containment_join(spark, feats):
    out = run(spark, feats, "find (intersecting 51.535, -0.125)")
    ids = {r.feature_id for r in out.collect()}
    assert ids == {"area/test/1"}


def test_eval_filter_with_query_and_count(spark, feats):
    out = run(spark, feats, "all-areas | filter [#building] | count")
    assert out.collect()[0].value == 3


def test_eval_find_feature_and_area(spark, feats):
    out = run(spark, feats, "find-feature /area/test/1 | area")
    v = out.collect()[0].value
    assert v == pytest.approx(160000.0, rel=0.05)  # 400 m x 400 m square


def test_eval_add_tag_overwrites(spark, feats):
    out = run(spark, feats, "all-areas | add-tag #reviewed=yes")
    tags = {r.feature_id: r.tags for r in out.collect()}
    assert all(t["#reviewed"] == "yes" for t in tags.values())
    assert tags["area/test/1"]["#building"] == "yes"  # others kept


def test_eval_collection_literal(spark, feats):
    out = run(spark, feats, '{"motorway": 36.0, "primary": 32.0}')
    got = {r.key: r.value for r in out.collect()}
    assert got == {"motorway": 36.0, "primary": 32.0}  # typed (vm_test.go:329)


def test_eval_string_query_convenience(spark, feats):
    got = run(spark, feats, 'find "#amenity=cafe"').count()
    assert got == 7


def test_eval_intersecting_cap(spark, feats):
    # 30 m cap around the first in-square POI catches only nearby points
    out = run(
        spark, feats, "find (intersecting-cap 51.535, -0.125 400.0)"
    )
    ids = {r.feature_id for r in out.collect()}
    # all 10 in-square points are within 400 m of the square's centre
    # (plus the shop pinned on street vertex 3); the square's own
    # vertices too
    assert "area/test/1" in ids
    assert "point/test/27" in ids
    assert sum(1 for i in ids if i.startswith("point/")) == 11


def test_eval_intersecting_area_feature(spark, feats):
    # the reference's NestedGroups expression shape: features intersecting
    # a named area (vertex-containment semantics, v1)
    out = run(spark, feats, "find (intersecting (find-area /area/test/1))")
    ids = {r.feature_id for r in out.collect()}
    assert "area/test/1" in ids  # the area itself
    pts = {i for i in ids if i.startswith("point/")}
    assert len(pts) == 10  # exactly the 10 in-square POIs


def test_eval_typed_constructor(spark, feats):
    out = run(spark, feats, "find (type-point (keyed \"#amenity\"))")
    assert out.count() == 20
    out2 = run(spark, feats, "find (type-area (keyed \"#amenity\"))")
    assert out2.count() == 0


def test_repl_module_imports():
    from diagonal_b6_spark.shell import __main__ as repl

    assert callable(repl.main)


# --- vm_test.go semantics (the reference's own VM test expressions) ---------


def test_vm_pipeline_inside_lambda(spark, feats):
    """vm_test.go:113-140 TestWithVMAndPipelineInLamba:
    `find [#building] | map {b -> area b | gt 1000.0} | count-values`
    yields per-boolean counts covering every building."""
    out = run(spark, feats, 'find [#building] | map {b -> area b | gt 1000.0} | count-values')
    got = {r["value"]: r["count"] for r in out.collect()}
    # fixtures: square (400 m) and hole (600 m) are > 1000 m2, tiny is not
    assert got == {True: 2, False: 1}


def test_vm_map_literal_collection_implicit_keys(spark, feats):
    """vm_test.go:349-368: `map {36, 42} (add 10)` -> {0: 46, 1: 52},
    values still integers."""
    out = run(spark, feats, 'map {36, 42} (add 10)')
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [(0, 46), (1, 52)]
    assert dict(out.dtypes)["value"] == "bigint"


def test_vm_map_literal_collection_tag_keys(spark, feats):
    """vm_test.go:329-348: tag-literal keys survive the map and values
    increment."""
    out = run(spark, feats, 'map {highway="motorway": 2, highway="primary": 6} (add 1)')
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [("highway=motorway", 3), ("highway=primary", 7)]


def test_vm_quoted_tag_key_literal(spark, feats):
    out = run(spark, feats, 'map {"highway"="motorway": 2} (add 1)')
    assert [tuple(r) for r in out.collect()] == [("highway=motorway", 3)]


def test_vm_length_pipeline_in_lambda(spark, feats):
    out = run(spark, feats, 'find [#highway] | map {p -> length p | divide 1000.0} | take 2')
    rows = out.collect()
    assert len(rows) == 1 and abs(rows[0]["value"] - 1.3143) < 0.001


def test_vm_return_functions_geojson_chain(spark, feats):
    """vm_test.go:141-164 TestReturnFunctions: to-geojson-collection |
    map-geometries (apply-to-area {a -> centroid a}) turns every
    building area into a Point document, keeping identity and tags."""
    import json

    out = run(
        spark, feats,
        'find (keyed "#building") | to-geojson-collection'
        ' | map-geometries (apply-to-area {a -> centroid a})',
    )
    rows = out.collect()
    assert len(rows) == 3  # square, hole, tiny
    for r in rows:
        assert r["feature_type"] == "point"
        assert "#building" in r["tags"] and "name" in r["tags"]
        doc = json.loads(r["geojson"])
        assert doc["geometry"]["type"] == "Point"
        assert doc["geometry"]["coordinates"] == [r["xs"][0], r["ys"][0]]


def test_vm_filter_accepts_unindexed_query_keys(spark, feats):
    """vm_test.go:192-219: a query passed where a bool function is
    needed becomes Query.Matches -- a direct tag test with NO search-
    index key restriction ('name' and 'addr:postcode' are unindexed)."""
    assert run(spark, feats, "find [#building] | filter [name]").count() == 3
    assert run(spark, feats, "find [#building] | filter [addr:postcode]").count() == 0
    # and the indexed form still works through the same path
    assert run(spark, feats, "find [#building] | filter [#building=yes]").count() == 2


def test_eval_generated_expressions_total(spark, feats):
    """Evaluator totality over a deterministic sweep of generated
    well-formed expressions: every one either evaluates (DataFrame /
    scalar / query / change) or raises ShellError -- never a raw
    Python exception from inside the evaluator."""
    from diagonal_b6_spark.shell.evaluate import ShellError

    leaves = ['1', '2.5', '"x"', '[#building]', '[#amenity=bench]', 'all']
    pipes = ['take 2', 'count', 'count-values', 'map {f -> get f "name"}',
             'filter [#building=yes]', 'map {b -> area b | gt 100.0}']
    exprs = []
    for leaf in leaves:
        exprs.append(leaf)
        if leaf.startswith('['):
            exprs.append(f'find {leaf}')
            for p in pipes:
                exprs.append(f'find {leaf} | {p}')
    exprs += [
        'map {1, 2, 3} (add 1) | count-values',
        '{0: (find [#building] | count)}',
        'find [#building] | map {b -> get-centroid b} | take 1',
        'add 1 (divide 4 2.0)',
        'find-feature /area/test/1 | to-geojson',
        'all-tags (find [#amenity])',
    ]
    for e in exprs:
        try:
            out = run(spark, feats, e)
            if isinstance(out, DataFrame):
                out.limit(1).collect()
        except ShellError:
            pass
        except Exception as ex:  # noqa: BLE001 -- the assertion itself
            raise AssertionError(f"{e!r} leaked {type(ex).__name__}: {ex}") from ex


def test_eval_value_over_mapped_tag_collection(spark, feats):
    # a tag collection (get result) maps through a second lambda: value
    # extracts the bare tag value (the reference's Tag.Value)
    out = run(
        spark, feats,
        'find [#amenity] | map {f -> get f "#amenity"} | map {t -> value t}',
    )
    vals = {r.value for r in out.collect()}
    assert vals == {"bench", "cafe", "pub"}


def test_eval_int_value_of_constructed_tag(spark, feats):
    # constructor-built tags carry the same "key=value" double as get
    # results; int-value parses the VALUE half (fn features.go int-value)
    out = run(spark, feats, '{1: 3, 2: 5} | map {v -> int-value (tag "#levels" v)}')
    vals = sorted(r[len(r) - 1] for r in out.collect())
    assert vals == [3, 5]
