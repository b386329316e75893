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
    """value -> percentile rank (fn math.go:85-115).

    Distributed percent_rank.  A ``Window.orderBy`` with no partitioning
    would drag the entire input into ONE task -- correct at sf0.1, a
    single-partition sort at 100x.  Instead:

      1. ``groupBy(value)`` -> per-value count (one combiner-backed shuffle;
         the distinct-value table is <= the input, usually far smaller);
      2. range-partition the distinct values and take per-PARTITION prefix
         sums with a window keyed on ``spark_partition_id`` -- every window
         here is partitioned, so no task ever sees more than one range;
      3. per-partition totals collapse to a provably tiny table (exactly one
         row per range partition); its cumulative offsets use an
         unpartitioned window over those <=O(shuffle.partitions) rows only;
      4. ``rows_below(v) = offset + local_prefix - count(v)`` and
         ``pct = rows_below / (n-1)`` -- exactly percent_rank's
         ``(rank-1)/(n-1)`` with ties sharing the first rank (reference
         tie semantics, fn math.go:85-115), bit-equal double division.
    """
    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    vals = (
        df.groupBy(F.col(value_col).alias("_v"))
        .agg(F.count("*").alias("_c"))
        .repartitionByRange(nparts, F.col("_v").asc())
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(F.col("_v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vals = vals.withColumn("_cum", F.sum("_c").over(w_local))
    # one row per range partition: tiny by construction, so the
    # unpartitioned windows below never see an unbounded input
    totals = vals.groupBy("_pid").agg(F.sum("_c").alias("_pc"))
    w_off = Window.orderBy(F.col("_pid").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = totals.select(
        "_pid",
        F.coalesce(F.sum("_pc").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_pc").over(w_all).alias("_n"),
    )
    pct = F.when(
        F.col("_n") > 1,
        (F.col("_off") + F.col("_cum") - F.col("_c")).cast("double")
        / (F.col("_n") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    ranked = vals.join(F.broadcast(offs), "_pid").select(
        F.col("_v"), pct.alias("pct")
    )
    base = df.select(id_col, value_col)
    return base.join(
        ranked, F.col(value_col).eqNullSafe(F.col("_v")), "inner"
    ).select(id_col, value_col, "pct")


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
    """Collection[_, Collection] -> concatenated (fn collections.go:389-444).

    The reference's flattenCollection iterates the INNER collections'
    (key, value) pairs, keeping both (collections_test.go TestFlatten) --
    so an array<struct> column explodes into its struct fields; a plain
    scalar array keeps the bare `value` shape."""
    exploded = df.select(F.explode(F.col(array_col)).alias("value"))
    if dict(exploded.dtypes)["value"].startswith("struct"):
        return exploded.select("value.*")
    return exploded


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


MAX_HISTOGRAM_BUCKETS = 6  # api/histogram.go:245


def _bucket_positions(n: int, max_buckets: int = MAX_HISTOGRAM_BUCKETS):
    """The reference's greedy equal-count split of n sorted distinct
    values (api/histogram.go:269-300 uniform()): bucket i takes
    remaining // (max_buckets - i) distinct values; the last bucket is
    open-ended.  Returns [(start_rank, end_rank_or_None), ...]."""
    out: list[tuple[int, int | None]] = []
    start, rem = 0, n
    while rem > 0:
        size = rem // (max_buckets - len(out))
        if rem > size:
            out.append((start, start + size))
            start += size
            rem -= size
        else:
            out.append((start, None))
            break
    return out


def histogram_buckets(
    df: DataFrame, value_col: str, max_buckets: int = MAX_HISTOGRAM_BUCKETS
) -> DataFrame:
    """The reference's auto-bucketed histogram, exactly
    (api/histogram.go:231-374 bucketValues):

      numeric column, <= max_buckets distinct  one bucket per value
      numeric, more                            uniform(): greedy
          EQUAL-COUNT split of the SORTED DISTINCT values (not
          equal-width, not row-weighted); last bucket open-ended
      non-numeric, <= max_buckets distinct     one bucket per value
      non-numeric, more                        categorical(): top
          (max_buckets - 1) values by count desc (value asc on ties,
          where the reference's unstable sort is arbitrary), everything
          else in an "other" bucket

    Returns (bucket int, lo, hi, n): lo/hi are the bucket's value range
    (hi null = open / exact bucket).  Label formatting
    (histogram.go:187-229) is renderer presentation and intentionally
    not part of this result.

    Distributed shape: one groupBy(value) combiner shuffle; ranks over
    the distinct-value table via range-partitioned prefix sums (the
    percentiles machinery -- no unpartitioned window); the <= 12
    boundary values collect to the driver (bounded by max_buckets);
    assignment is a codegen CASE.
    """
    numeric = dict(df.dtypes)[value_col] in (
        "tinyint", "smallint", "int", "bigint", "float", "double",
        "decimal", "long", "short", "byte",
    ) or dict(df.dtypes)[value_col].startswith("decimal")
    counts = df.groupBy(F.col(value_col).alias("_v")).agg(F.count("*").alias("_c"))
    if not numeric:
        top = counts.orderBy(F.col("_c").desc(), F.col("_v").asc()).limit(
            max_buckets + 1
        ).collect()
        keys = [r["_v"] for r in top[:max_buckets]]
        if len(top) > max_buckets:
            keys = keys[: max_buckets - 1]  # 6th bucket becomes "other"
        expr = None
        for i, k in enumerate(keys):
            expr = (
                F.when(F.col(value_col) == k, F.lit(i))
                if expr is None
                else expr.when(F.col(value_col) == k, F.lit(i))
            )
        bucket = expr.otherwise(F.lit(len(keys))) if expr is not None else F.lit(0)
        out = df.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))
        bounds = [(i, k, k) for i, k in enumerate(keys)]
        if len(top) > max_buckets:
            bounds.append((len(keys), None, None))  # "other"
        spark = df.sparkSession
        bdf = spark.createDataFrame(
            [(i, str(lo) if lo is not None else None, str(hi) if hi is not None else None) for i, lo, hi in bounds],
            "bucket int, lo string, hi string",
        )
        return out.join(bdf, "bucket").select("bucket", "lo", "hi", "n")

    # numeric: rank the distinct values without an unpartitioned window
    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    vals = counts.select("_v").repartitionByRange(nparts, F.col("_v").asc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(F.col("_v").asc())
    vals = vals.withColumn("_rn", F.row_number().over(w_local))
    totals = vals.groupBy("_pid").agg(F.count("*").alias("_pc"))
    w_off = Window.orderBy(F.col("_pid").asc()).rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select("_pid", F.coalesce(F.sum("_pc").over(w_off), F.lit(0)).alias("_off"))
    ranked = vals.join(offs, "_pid").select(
        "_v", (F.col("_off") + F.col("_rn") - 1).alias("_rank")
    )
    n = counts.count()
    if n == 0:  # bucketValues' empty-collection branch (histogram.go:355-357)
        spark = df.sparkSession
        return spark.createDataFrame([], "bucket int, lo double, hi double, n long")
    if n <= max_buckets:
        # one bucket per exact value, in value order
        b = ranked.withColumnRenamed("_rank", "bucket").withColumnRenamed("_v", "_k")
        out = df.join(b, df[value_col] == b["_k"]).groupBy(
            F.col("bucket").cast("int").alias("bucket")
        ).agg(F.count("*").alias("n"))
        bb = b.select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("_k").cast("double").alias("lo"),
            F.col("_k").cast("double").alias("hi"),
        )
        return out.join(bb, "bucket").select("bucket", "lo", "hi", "n")
    pos = _bucket_positions(n, max_buckets)
    want = sorted({p for p, _ in pos} | {e for _, e in pos if e is not None})
    bvals = {
        int(r["_rank"]): r["_v"]
        for r in ranked.filter(F.col("_rank").isin(want)).collect()
    }
    expr = None
    bounds = []
    for i, (s, e) in enumerate(pos):
        lo = float(bvals[s])
        hi = float(bvals[e]) if e is not None else None
        cond = (F.col(value_col) >= F.lit(lo)) & (
            F.lit(True) if hi is None else (F.col(value_col) < F.lit(hi))
        )
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
        bounds.append((i, lo, hi))
    out = df.groupBy(expr.alias("bucket")).agg(F.count("*").alias("n"))
    bdf = spark.createDataFrame(bounds, "bucket int, lo double, hi double")
    return out.join(bdf, "bucket").select("bucket", "lo", "hi", "n")


def key_skew_stats(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Hot-key diagnostics: the top-N keys by row count with each key's
    share of the table -- the measurement that picks salt factors and
    flags AQE-skew-join candidates before a 100 TB shuffle.

    One groupBy (map-side partial counts) + a global top-N (tiny) + a
    broadcast of the single-row total; the input is never shuffled
    whole.  Deterministic: ties order by key."""
    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("_total"))
    ranked = counts.orderBy(F.desc("n"), F.col(key)).limit(top)
    return ranked.crossJoin(F.broadcast(total)).select(
        key,
        "n",
        F.round(F.col("n") / F.col("_total"), 6).alias("share"),
    )
