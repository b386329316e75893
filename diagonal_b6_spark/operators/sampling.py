"""Deterministic corpus sampling / splitting (training-pipeline ops).

A 100 TB training pipeline needs sample membership and train/val/test
assignment to be a PURE FUNCTION of the row id — never of partitioning,
cluster size, execution order, or Spark's RNG — so that re-running,
resharding, or incrementally extending the corpus never moves a document
across the split boundary (train/test leakage).  Both operators below
hash the id with the same portable md5-prefix hash the dedup family uses
(`dedup._h15`; DuckDB replays it as CAST('0x' || substr(md5(x),1,15) AS
BIGINT)), bucket it mod 10_000, and decide from the bucket alone:
shuffle-free, map-side, reproducible everywhere.

The salt namespaces decisions: a different salt gives an independent
split/sample over the same corpus (e.g. one salt per epoch-subset or
per ablation), while the same salt is stable forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _h15

_BUCKETS = 10_000


def _bucket(id_col: str, salt: str) -> Column:
    key = F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
    return F.pmod(_h15(key), F.lit(_BUCKETS))


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split with the given
    weights (fractions summing to ~1; the LAST split absorbs the
    rounding remainder so assignment is total).  Adds a `split` column;
    pure column math, no shuffle, no RNG."""
    names = list(weights)
    bucket = _bucket(id_col, salt)
    expr = None
    hi = 0
    for name in names[:-1]:
        hi += int(round(weights[name] * _BUCKETS))
        expr = (
            F.when(bucket < hi, F.lit(name))
            if expr is None
            else expr.when(bucket < hi, F.lit(name))
        )
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep a stable `fraction` of rows: bucket(id) < fraction * 10000.
    Membership never changes with partitioning or cluster size, and a
    larger fraction with the same salt is a SUPERSET of a smaller one
    (nested samples for scaling-law runs)."""
    return df.filter(_bucket(id_col, salt) < F.lit(int(round(fraction * _BUCKETS))))
