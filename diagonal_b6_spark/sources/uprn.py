"""GB UPRN ingest: the reference's uprn.Source + ClusterSource.

Reference behavior being reproduced: b6/ingest/gb/uprn/source.go --
  * Source (source.go:31-158): a (gzipped) CSV with header columns
    UPRN, LATITUDE, LONGITUDE (any order, BOM-tolerant) becomes point
    features in the gb/uprn namespace, each tagged #place=uprn, with
    optional extra tags joined by UPRN id from side CSVs
    (ingest.JoinTags, ingest/join.go:13-95: header row names the tag
    keys, each data row is id + values, empty values skipped).
  * ClusterSource (source.go:160-244): UPRN points aggregate by their
    LEVEL-25 S2 cell (~30 cm edges); each occupied cell emits ONE
    cluster point feature whose id IS the uint64 cell id, located at
    the cell center, tagged #place=uprn_cluster and
    uprn_cluster:size=<count>.  The reference's own test pins two
    exact cell ids (source_test.go:41-44), which
    tests/test_uprn.py reproduces bit-for-bit through
    kernels/cellmath's Hilbert id path.

Spark-first shape: spark.read.csv handles .gz transparently and splits
across executors; the cluster stage is ONE groupBy on the level-25 cell
id (computed in an Arrow-batched pandas UDF over kernels/cellmath's
vectorized numpy -- the full Hilbert position is needed because the
cell id is the feature id, not just a bucket).  The tag join is a
broadcast-friendly left join on the id string.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

CLUSTER_S2_LEVEL = 25  # ~30 cm cell edges (source.go:160-162)


def read_uprn(
    spark: SparkSession, path: str, join_tags: DataFrame | None = None
) -> DataFrame:
    """UPRN CSV(.gz) -> point feature rows (uprn.Source).

    join_tags: optional (id string, key string, value string) rows from
    ``join_tags_from_csv``; matching ids gain those tags on top of
    #place=uprn (source.go:125-127's AddTags)."""
    raw = spark.read.csv(path, header=True)
    # BOM-tolerant header match (source.go:63-72 trims ﻿)
    cols = {c.strip("﻿"): c for c in raw.columns}
    for need in ("UPRN", "LATITUDE", "LONGITUDE"):
        if need not in cols:
            raise ValueError(f"uprn: missing column {need!r} in {path}")
    pts = raw.select(
        F.col(cols["UPRN"]).cast("long").alias("uprn"),
        F.col(cols["LATITUDE"]).cast("double").alias("lat"),
        F.col(cols["LONGITUDE"]).cast("double").alias("lng"),
    )
    if join_tags is not None:
        extra = join_tags.groupBy("id").agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("key"), F.col("value")))
            ).alias("extra")
        )
        pts = pts.join(extra, pts["uprn"].cast("string") == extra["id"], "left").drop(
            "id"
        )
        tags = F.map_concat(
            F.create_map(F.lit("#place"), F.lit("uprn")),
            F.coalesce(
                F.col("extra"),
                F.map_from_arrays(
                    F.array().cast("array<string>"), F.array().cast("array<string>")
                ),
            ),
        )
    else:
        tags = F.create_map(F.lit("#place"), F.lit("uprn"))
    return pts.select(
        F.concat(F.lit("point/gb/uprn/"), F.col("uprn").cast("string")).alias(
            "feature_id"
        ),
        F.lit("point").alias("feature_type"),
        F.lit("gb/uprn").alias("ns"),
        tags.alias("tags"),
        F.array(F.col("lng")).alias("xs"),
        F.array(F.col("lat")).alias("ys"),
        F.array(F.lit(0)).alias("ring_offsets"),
    )


def join_tags_from_csv(spark: SparkSession, path: str) -> DataFrame:
    """ingest/join.go's tag-join CSV: header names the tag keys, each
    row is (id, value...); empty values drop.  Returns
    (id, key, value) rows ready for ``read_uprn``."""
    raw = spark.read.csv(path, header=True)
    idc = raw.columns[0]
    keys = raw.columns[1:]
    if not keys:
        raise ValueError(f"join_tags: expected at least 2 columns in {path}")
    pairs = F.array(
        *[
            F.struct(F.lit(k).alias("key"), F.col(k).alias("value"))
            for k in keys
        ]
    )
    return raw.select(
        F.col(idc).alias("id"), F.explode(pairs).alias("p")
    ).select(
        "id", F.col("p.key").alias("key"), F.col("p.value").alias("value")
    ).filter(F.col("value").isNotNull() & (F.col("value") != ""))


def _cell25_udf():
    @pandas_udf("long")
    def cell25(lat: pd.Series, lng: pd.Series) -> pd.Series:
        from ..kernels import cellmath as cm

        ids = cm.cell_id_from_latlng(
            lat.to_numpy(dtype=np.float64),
            lng.to_numpy(dtype=np.float64),
            CLUSTER_S2_LEVEL,
        )
        # uint64 -> int64 bit reinterpret (ids stay < 2^63 for valid
        # cells, but keep the mapping explicit)
        return pd.Series(ids.astype(np.int64))

    return cell25


def _cell_center_udf():
    @pandas_udf("lat double, lng double")
    def center(cell: pd.Series) -> pd.DataFrame:
        from ..kernels import cellmath as cm

        lat, lng = cm.cell_center_latlng(
            cell.to_numpy(dtype=np.int64).astype(np.uint64)
        )
        return pd.DataFrame({"lat": lat, "lng": lng})

    return center


def uprn_clusters(points: DataFrame) -> DataFrame:
    """ClusterSource (source.go:171-244): one cluster point feature per
    occupied level-25 cell -- feature id IS the cell id, location is the
    cell center, uprn_cluster:size counts the member UPRNs."""
    cells = points.select(
        _cell25_udf()(F.element_at("ys", 1), F.element_at("xs", 1)).alias("cell")
    )
    agg = cells.groupBy("cell").agg(F.count("*").alias("n"))
    out = agg.withColumn("c", _cell_center_udf()(F.col("cell")))
    return out.select(
        F.concat(F.lit("point/diagonal/uprn_cluster/"), F.col("cell").cast("string")).alias(
            "feature_id"
        ),
        F.lit("point").alias("feature_type"),
        F.lit("diagonal/uprn_cluster").alias("ns"),
        F.map_from_arrays(
            F.array(F.lit("#place"), F.lit("uprn_cluster:size")),
            F.array(F.lit("uprn_cluster"), F.col("n").cast("string")),
        ).alias("tags"),
        F.array(F.col("c.lng")).alias("xs"),
        F.array(F.col("c.lat")).alias("ys"),
        F.array(F.lit(0)).alias("ring_offsets"),
        F.col("cell").alias("cell_id"),
        F.col("n").alias("size"),
    )
