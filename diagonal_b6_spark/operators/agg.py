"""Aggregation / ordering / set operators mirroring the reference's
collection functions (SURVEY.md §2.6-2.8).  All pure DataFrame ops --
Catalyst handles partial aggregation, and every groupBy shuffles exactly
once on its key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def count_values(df: DataFrame, value_col: str) -> DataFrame:
    """value -> occurrence count (fn collections.go:303-326)."""
    return df.groupBy(F.col(value_col).alias("value")).agg(F.count("*").alias("n"))


def sum_by_key(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """key -> sum(value) (fn collections.go:278-300)."""
    return df.groupBy(F.col(key_col).alias("key")).agg(F.sum(value_col).alias("total"))


def top_k(df: DataFrame, value_col: str, k: int, tiebreak: str) -> DataFrame:
    """n largest by value, deterministic tiebreak (fn collections.go:159-213;
    the reference uses a bounded min-heap -- Spark's sort+limit is the
    distributed equivalent: per-partition top-k then merge)."""
    return df.orderBy(F.col(value_col).desc(), F.col(tiebreak).asc()).limit(k)


def take(df: DataFrame, order_col: str, n: int) -> DataFrame:
    """First n in collection order (IDs for find results; fn collections.go:120-122)."""
    return df.orderBy(F.col(order_col).asc()).limit(n)


def percentiles(df: DataFrame, value_col: str, id_col: str) -> DataFrame:
    """value -> percentile rank (fn math.go:85-115)."""
    w = Window.orderBy(F.col(value_col).asc())
    return df.select(id_col, value_col).withColumn("pct", F.percent_rank().over(w))


def histogram(df: DataFrame, value_col: str, bucket_size: float) -> DataFrame:
    """Numeric bucketing -> counts (fn collections.go:447-483,
    b6/api/histogram.go:130-374: <=6 uniques categorical else numeric
    buckets; we expose the numeric-bucket form, categorical is
    count_values)."""
    bucket = F.floor(F.col(value_col) / F.lit(bucket_size)).cast("long").alias("bucket")
    return df.groupBy(bucket).agg(F.count("*").alias("n"))


def histogram_auto(df: DataFrame, value_col: str, max_categories: int = 6, n_buckets: int = 8) -> DataFrame:
    """b6's auto-bucketing (b6/api/histogram.go:130-374): <= max_categories
    distinct values -> one categorical bucket per value; otherwise
    equal-width numeric buckets over [min, max].  Two cheap aggregates
    decide the mode; the bucketing itself is one groupBy either way."""
    stats = df.agg(
        F.countDistinct(value_col).alias("nd"),
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
    ).collect()[0]
    if stats["nd"] <= max_categories:
        return df.groupBy(F.col(value_col).cast("string").alias("bucket")).agg(
            F.count("*").alias("n")
        )
    lo, hi = float(stats["lo"]), float(stats["hi"])
    width = (hi - lo) / n_buckets or 1.0
    b = F.least(
        F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("long"),
        F.lit(n_buckets - 1),
    )
    return df.groupBy(b.cast("string").alias("bucket")).agg(F.count("*").alias("n"))


def join_missing(base: DataFrame, joined: DataFrame, key: str) -> DataFrame:
    """base UNION (joined minus base-keyed): keeps the base row when keys
    collide (fn collections.go:485-583 sorted-merge semantics)."""
    return base.unionByName(joined.join(base.select(key), key, "left_anti"))


def flatten(df: DataFrame, array_col: str) -> DataFrame:
    """Collection[_, Collection] -> concatenated (fn collections.go:389-444)."""
    return df.select(F.explode(F.col(array_col)).alias("value"))


def count_keys(df: DataFrame, key_col: str, valid_col: str | None = None) -> DataFrame:
    """key -> count, optionally counting only valid values but emitting
    0-count keys (fn collections.go:329-387 count-valid-keys)."""
    if valid_col is None:
        return df.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("n"))
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.sum(F.when(F.col(valid_col), 1).otherwise(0)).alias("n")
    )


def histogram_with_id(
    df: DataFrame, value_col: str, width: float, id_col: str
) -> DataFrame:
    """`histogram-with-id` / `histogram-swatch` (fn collections.go:447-483):
    fixed-width buckets with provenance -- an example feature id per
    bucket plus a stable swatch index (the reference assigns UI swatches
    by bucket order)."""
    from pyspark.sql import Window

    h = df.groupBy(
        F.floor(F.col(value_col) / width).cast("long").alias("bucket")
    ).agg(F.count("*").alias("n"), F.min(id_col).alias("example_id"))
    w = Window.orderBy(F.col("bucket").asc())
    return h.withColumn("swatch", F.row_number().over(w) - 1)
