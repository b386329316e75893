"""Expression storage: `add-expression` / `evaluate-feature` / `call`.

Reference semantics: b6 stores an analysis expression as a feature (an
ExpressionFeature row in the world) and re-evaluates it later --
fn functions.go:90-91,142 register `evaluate-feature` and `call`, and
change.go:72-255 applies AddExpression changes; the Python client's
b6_test.py exercises store-then-evaluate round trips.

Spark-first re-expression: an expression feature is an ordinary feature
row whose tags carry the catalog query name and a JSON parameter blob --
so expressions live IN the data plane (joinable, checkpointable,
exportable like any other feature) and evaluation is a registry dispatch,
not a VM.  The callable registry is the engine's own query catalog, which
is exactly the set of analyses a b6 user can save.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXPR_KEY = "b6:expression"
PARAMS_KEY = "b6:params"

_EXPR_SCHEMA = (
    "feature_id string, feature_type string, tags map<string,string>, "
    "xs array<double>, ys array<double>, ring_offsets array<int>"
)


def add_expression(
    spark: SparkSession,
    name: str,
    query: str,
    params: dict | None = None,
) -> DataFrame:
    """An expression feature row: tags = {b6:expression: query,
    b6:params: json}.  Geometry-less (empty packed arrays), so it unions
    cleanly into any features table (the AddExpression change shape)."""
    tags = {EXPR_KEY: query, PARAMS_KEY: json.dumps(params or {}, sort_keys=True)}
    row = (f"expression/{name}", "expression", tags, [], [], [])
    return spark.createDataFrame([row], schema=_EXPR_SCHEMA)


def expressions_of(features: DataFrame) -> DataFrame:
    """All expression features of a world: (feature_id, query, params)."""
    return features.filter(F.col("tags")[EXPR_KEY].isNotNull()).select(
        "feature_id",
        F.col("tags")[EXPR_KEY].alias("query"),
        F.col("tags")[PARAMS_KEY].alias("params"),
    )


def evaluate_feature(
    spark: SparkSession,
    features: DataFrame,
    feature_id: str,
    registry: dict[str, Callable[..., DataFrame]],
    *args,
) -> DataFrame:
    """`evaluate-feature`: look up the stored expression feature by id and
    re-run its catalog query (`call` with the stored parameters).

    The stored row is read via a driver lookup of ONE feature row (an
    id-equality filter -- index lookup at scale, not a table scan)."""
    row = (
        expressions_of(features)
        .filter(F.col("feature_id") == feature_id)
        .limit(1)
        .collect()
    )
    if not row:
        raise KeyError(f"no expression feature {feature_id!r}")
    query = row[0]["query"]
    params = json.loads(row[0]["params"] or "{}")
    if query not in registry:
        raise KeyError(f"expression {feature_id!r} references unknown query {query!r}")
    return registry[query](spark, *args, **params)
