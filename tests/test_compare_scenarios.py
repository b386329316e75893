"""Scenario comparison (ui/ui.go CompareHandler + equaliseBars), mirroring
ui_test.go:188-277 TestCompareScenarios on the real granary world and
:279-406 TestEqualiseBars with the reference's exact fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark.operators import change as change_ops
from diagonal_b6_spark.operators import compare as compare_ops
from diagonal_b6_spark.shell import run
from diagonal_b6_spark.sources.osm import world_from_pbf

GRANARY = "/root/reference/data/tests/granary-square.osm.pbf"
DISHOOM = "point/osm/3501612811"  # camden.go:26 DishoomNode, engine id form


@pytest.fixture(scope="module")
def world(spark):
    w = world_from_pbf(spark, GRANARY)
    w.persist()
    w.count()
    yield w
    w.unpersist()


# ui_test.go:279-406 TestEqualiseBars: the reference's exact bar fixture.
def test_equalise_bars_reference_fixture(spark):
    h0 = spark.createDataFrame(
        [("0", 40, 42), ("1", 2, 42)], "label string, value long, total long"
    )
    h1 = spark.createDataFrame(
        [("1", 30, 36), ("2", 6, 36)], "label string, value long, total long"
    )
    out = compare_ops.equalise_bars([h0, h1])
    got = {
        (r["world"], r["index"]): (r["label"], r["value"], r["total"])
        for r in out.collect()
    }
    assert got == {
        (0, 0): ("0", 40, 42),
        (0, 1): ("1", 2, 42),
        (0, 2): ("2", 0, 42),
        (1, 0): ("0", 0, 36),
        (1, 1): ("1", 30, 36),
        (1, 2): ("2", 6, 36),
    }


# SortableKeyForAtom (lines.go:610-635): integer labels order numerically
# via %010d (100 after 99, negatives first); non-integers sort as strings.
def test_equalise_bars_numeric_label_order(spark):
    h = spark.createDataFrame(
        [("100", 1, 10), ("99", 2, 10), ("-5", 3, 10), ("kiosk", 4, 10)],
        "label string, value long, total long",
    )
    out = compare_ops.equalise_bars([h])
    order = [r["label"] for r in out.orderBy("index").collect()]
    assert order == ["-5", "99", "100", "kiosk"]


# ui_test.go:188-277 TestCompareScenarios: the same analysis re-evaluated
# in a scenario world where Dishoom's #amenity flips restaurant->dentist
# produces exactly three differing bars after equalisation.
def test_compare_scenarios_granary(spark, world):
    delta = spark.createDataFrame(
        [(DISHOOM, "#amenity", "dentist")], "feature_id string, k string, v string"
    )
    scenario = change_ops.add_tags(world, delta)

    def analysis(w):
        return run(
            spark, w,
            'find [#amenity=restaurant] | map {r -> get-string r "cuisine"} '
            "| histogram",
        )

    out = compare_ops.compare_scenarios(world, [scenario], analysis).collect()
    baseline = {r["index"]: r for r in out if r["world"] == 0}
    scen = {r["index"]: r for r in out if r["world"] == 1}
    # equalised: same bucket set in the same order in both worlds
    assert set(baseline) == set(scen) and len(baseline) > 0
    for i in baseline:
        assert baseline[i]["label"] == scen[i]["label"]
    different = sum(
        1 for i in baseline if baseline[i]["value"] != scen[i]["value"]
    )
    assert different == 3  # the reference's pinned count
    # each world keeps its own total on every bar, zero-filled included
    assert len({r["total"] for r in out if r["world"] == 0}) == 1
    assert len({r["total"] for r in out if r["world"] == 1}) == 1
    # Dishoom is the only restaurant lost: totals differ by exactly 1
    b_tot = next(iter(baseline.values()))["total"]
    s_tot = next(iter(scen.values()))["total"]
    assert b_tot - s_tot == 1


# histogram_bars formats numeric buckets with the reference's formatLabel
# rules (histogram.go:187-229): exact ints, lo+1 collapse, open ranges.
def test_histogram_bars_numeric_labels(spark):
    hist = spark.createDataFrame(
        [(0, 1.0, 1.0, 7), (1, 2.0, 3.0, 5), (2, 3.0, 10.5, 4), (3, 12.0, None, 2)],
        "bucket int, lo double, hi double, n long",
    )
    bars = compare_ops.histogram_bars(hist).collect()
    assert [(r["label"], r["value"], r["total"]) for r in bars] == [
        ("1", 7, 18),
        ("2", 5, 18),  # int bounds with hi == lo+1 collapse to "lo"
        ("3-10.5", 4, 18),
        ("12-", 2, 18),
    ]
