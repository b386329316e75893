"""Driver contract for the spark-graft builder (PySpark target).

entry():    flagship spatial query (cell-cover -> containment join -> PIP
            refine) over deterministic points derived from sf0.001 events.
queries():  one entry per implemented operator (SURVEY.md §2 + the
            training-data pipeline ops), from diagonal_b6_spark.catalog.
oracle_sql(): DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from diagonal_b6_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PIP containment join at sf0.001 (driver checks rows>=0)."""
    return catalog.q_geo_pip(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(catalog.ORACLES)
