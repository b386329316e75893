"""`spark.sql` registered-function surface for the text/dedup/geo
families (round-4 backlog item).

Every function is a Spark SQL-DEFINED function (``CREATE TEMPORARY
FUNCTION ... RETURN <expression>``), so calls stay inside Catalyst and
whole-stage codegen -- this module adds ZERO Python UDFs.  The bodies
mirror the Column-expression operators in operators/text.py and
operators/cover.py; tests/test_sqlfuncs.py pins each function equal to
its operator twin on the documents/events tables, so the two surfaces
cannot silently diverge.

Usage::

    from diagonal_b6_spark import sqlfuncs
    sqlfuncs.register_sql_functions(spark)
    spark.sql("SELECT doc_id, b6_token_count(text) FROM docs")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .operators.text import BPE_TOKEN_RE, EN_STOPWORDS

# name -> (signature, return type, body).  Bodies reference parameters by
# name; keep them pure expressions (no subqueries) so they inline into
# the caller's plan.
_DEFS: dict[str, tuple[str, str, str]] = {
    # --- text family (operators/text.py twins) ---
    "b6_token_count": (
        "(t STRING)", "INT",
        r"size(split(trim(t), '\\s+'))",
    ),
    "b6_token_count_bpe": (
        "(t STRING)", "INT",
        # SQL string literal: double the backslashes and the quotes
        "size(regexp_extract_all(t, '"
        + BPE_TOKEN_RE.replace("\\", "\\\\").replace("'", "''")
        + "', 0))",
    ),
    "b6_punct_ratio": (
        "(t STRING)", "DOUBLE",
        r"round((length(t) - length(regexp_replace(t, '[.,!?;:]', ''))) / length(t), 6)",
    ),
    "b6_stopword_hits": (
        "(t STRING)", "BIGINT",
        " + ".join(
            f"CAST((length(concat(' ', lower(t), ' ')) - "
            f"length(replace(concat(' ', lower(t), ' '), ' {w} ', ''))) "
            f"/ {len(w) + 2} AS BIGINT)"
            for w in EN_STOPWORDS
        ),
    ),
    # --- dedup family building blocks (operators/dedup.py shingle key) ---
    # distinct word k-gram shingles, exactly operators/dedup.shingles:
    # gated on size >= k, 1-based slice, space-joined, deduplicated
    "b6_shingles": (
        "(t STRING, k INT)", "ARRAY<STRING>",
        r"CASE WHEN size(split(trim(t), '\\s+')) >= k THEN "
        r"array_distinct(transform("
        r"sequence(1, size(split(trim(t), '\\s+')) - (k - 1)), "
        r"i -> concat_ws(' ', slice(split(trim(t), '\\s+'), i, k)))) "
        r"ELSE array() END",
    ),
    "b6_doc_hash": (
        "(t STRING)", "STRING",
        "md5(t)",
    ),
    # --- geo family (operators/cover.py + kernels/geom.py twins) ---
    "b6_haversine_m": (
        "(lat1 DOUBLE, lng1 DOUBLE, lat2 DOUBLE, lng2 DOUBLE)", "DOUBLE",
        "2 * 6371010.0 * asin(sqrt("
        "pow(sin((radians(lat2) - radians(lat1)) / 2), 2) "
        "+ cos(radians(lat1)) * cos(radians(lat2)) "
        "* pow(sin((radians(lng2) - radians(lng1)) / 2), 2)))",
    ),
    # exact operators/cover.tile_xy_cols semantics: clamped web-mercator
    # latitude domain and x/y clamped to [0, 2^zoom - 1]
    "b6_tile_x": (
        "(lng DOUBLE, zoom INT)", "BIGINT",
        "greatest(CAST(0 AS BIGINT), least("
        "CAST(floor((lng + 180.0) / 360.0 * CAST(shiftleft(CAST(1 AS BIGINT), zoom) AS DOUBLE)) AS BIGINT), "
        "CAST(shiftleft(CAST(1 AS BIGINT), zoom) - 1 AS BIGINT)))",
    ),
    "b6_tile_y": (
        "(lat DOUBLE, zoom INT)", "BIGINT",
        "greatest(CAST(0 AS BIGINT), least("
        "CAST(floor((1.0 - ln(tan(radians(greatest(-85.05112878, least(lat, 85.05112878)))) "
        "+ 1.0 / cos(radians(greatest(-85.05112878, least(lat, 85.05112878))))) / pi())"
        " / 2.0 * CAST(shiftleft(CAST(1 AS BIGINT), zoom) AS DOUBLE)) AS BIGINT), "
        "CAST(shiftleft(CAST(1 AS BIGINT), zoom) - 1 AS BIGINT)))",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every function as a session-scoped SQL UDF; returns the
    registered names.  Idempotent (CREATE OR REPLACE)."""
    for name, (sig, ret, body) in _DEFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
    return list(_DEFS)
