"""Mutation/change operators (SURVEY.md §2.12): snapshot-delta application
vs the DuckDB oracle, plus overlay/merge semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark import catalog
from diagonal_b6_spark.operators import change as change_ops

SF = "/root/testdata/sf0.001"


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF}/customer.parquet')"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


@pytest.mark.parametrize("name", ["change_tags", "change_overlay"])
def test_change_oracle_parity(spark, name):
    got = sorted(tuple(r) for r in catalog.QUERIES[name](spark, SF).collect())
    want = _oracle(catalog.ORACLES[name])
    assert got == want
    assert len(got) > 0


def test_add_tags_overwrites(spark):
    feats = spark.createDataFrame(
        [("f1", {"a": "1", "b": "2"}), ("f2", {"a": "9"})],
        "feature_id string, tags map<string,string>",
    )
    delta = spark.createDataFrame(
        [("f1", "b", "NEW"), ("f1", "c", "3")], "feature_id string, k string, v string"
    )
    out = {r["feature_id"]: r["tags"] for r in change_ops.add_tags(feats, delta).collect()}
    assert out["f1"] == {"a": "1", "b": "NEW", "c": "3"}
    assert out["f2"] == {"a": "9"}


def test_remove_tags(spark):
    feats = spark.createDataFrame(
        [("f1", {"a": "1", "b": "2"})], "feature_id string, tags map<string,string>"
    )
    delta = spark.createDataFrame([("f1", "a")], "feature_id string, k string")
    out = change_ops.remove_tags(feats, delta).collect()[0]["tags"]
    assert out == {"b": "2"}


def test_overlay_world(spark):
    base = spark.createDataFrame(
        [("f1", {"x": "base"}), ("f2", {"y": "base"})],
        "feature_id string, tags map<string,string>",
    )
    overlay = spark.createDataFrame(
        [("f2", {"y": "new"}), ("f3", {"z": "new"})],
        "feature_id string, tags map<string,string>",
    )
    out = {r["feature_id"]: r["tags"] for r in change_ops.overlay_world(base, overlay).collect()}
    assert out == {"f1": {"x": "base"}, "f2": {"y": "new"}, "f3": {"z": "new"}}


def test_merge_changes_later_wins(spark):
    d1 = spark.createDataFrame([("f1", "k", "old")], "feature_id string, k string, v string")
    d2 = spark.createDataFrame([("f1", "k", "new")], "feature_id string, k string, v string")
    out = change_ops.merge_changes(d1, d2).collect()
    assert len(out) == 1 and out[0]["v"] == "new"
