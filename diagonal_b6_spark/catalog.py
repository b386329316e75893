"""Query catalog: every implemented operator exposed as a
(spark_query, duckdb_oracle_sql) pair for the driver's correctness gate.

Geo queries derive deterministic point locations from `events.event_id`
with exact integer arithmetic (identical in Spark and DuckDB), so the
spatial operators are oracle-checkable without external data.  Float
aggregates are summed as DECIMAL and rounded on BOTH sides so the
value-hash comparison is bit-stable.

Naming contract: every computed column is aliased identically in the
Spark plan and the oracle SQL (driver hashes values after sorting
columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fixtures
from .operators import agg as agg_ops
from .operators import cover as cover_ops
from .operators import dedup as dedup_ops
from .operators import graph as graph_ops
from .operators import knn as knn_ops
from .operators import similarity as sim_ops
from .operators import spatial_join
from .operators import text as text_ops

# --- deterministic derived geometry (identical SQL text both engines) ------

LAT_SQL = "51.50 + 0.08 * (((event_id * 2654435761) % 1000003) / 1000003.0)"
LNG_SQL = "-0.16 + 0.10 * (((event_id * 40503) % 999983) / 999983.0)"
PROBE_LAT_SQL = "51.50 + 0.08 * ((((probe_id + 7) * 104729) % 10007) / 10007.0)"
PROBE_LNG_SQL = "-0.16 + 0.10 * ((((probe_id + 3) * 7919) % 9973) / 9973.0)"

N_PROBES = 16
KNN_K = 5
CAP_LAT, CAP_LNG, CAP_R_M = 51.535, -0.125, 2500.0


def _events_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fixtures.testdata(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.expr(LAT_SQL).alias("lat"), F.expr(LNG_SQL).alias("lng")
    )


def _probes(spark: SparkSession) -> DataFrame:
    return spark.range(N_PROBES).select(
        F.col("id").alias("probe_id"),
        F.expr(PROBE_LAT_SQL.replace("probe_id", "id")).alias("lat"),
        F.expr(PROBE_LNG_SQL.replace("probe_id", "id")).alias("lng"),
    )


_PTS_CTE = f"pts AS (SELECT event_id, {LAT_SQL} AS lat, {LNG_SQL} AS lng FROM events)"
_PROBES_CTE = (
    f"probes AS (SELECT range AS probe_id, "
    f"{PROBE_LAT_SQL.replace('probe_id', 'range')} AS plat, "
    f"{PROBE_LNG_SQL.replace('probe_id', 'range')} AS plng FROM range({N_PROBES}))"
)
# haversine mirroring kernels/geom.py exactly: radians first, then subtract
_HAV = (
    "2 * 6371010.0 * asin(sqrt("
    "pow(sin((radians({lat2}) - radians({lat1})) / 2), 2) "
    "+ cos(radians({lat1})) * cos(radians({lat2})) "
    "* pow(sin((radians({lng2}) - radians({lng1})) / 2), 2)))"
)


def _polygon_edges_values() -> str:
    """VALUES rows (pid, x1, y1, x2, y2) for all fixture area rings."""
    rows = []
    for f in fixtures.feature_rows():
        if f["feature_type"] != "area":
            continue
        offs = list(f["ring_offsets"]) + [len(f["xs"])]
        for r in range(len(offs) - 1):
            xs = f["xs"][offs[r] : offs[r + 1]]
            ys = f["ys"][offs[r] : offs[r + 1]]
            for k in range(len(xs)):
                x1, y1 = xs[k], ys[k]
                x2, y2 = xs[(k + 1) % len(xs)], ys[(k + 1) % len(xs)]
                rows.append(f"('{f['feature_id']}', {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    return ",\n    ".join(rows)


# --- geo queries ------------------------------------------------------------


def q_geo_pip(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = cover_ops.with_point_cells(_events_points(spark, sf_dir))
    feats = fixtures.features_table(spark)
    out = spatial_join.containment_join_broadcast(pts, feats, point_id="event_id")
    return out.select("event_id", "feature_id")


def sql_geo_pip() -> str:
    return f"""
WITH {_PTS_CTE},
edges(pid, x1, y1, x2, y2) AS (VALUES
    {_polygon_edges_values()}),
crossings AS (
  SELECT p.event_id, e.pid
  FROM pts p JOIN edges e
    ON ((e.y1 > p.lat) != (e.y2 > p.lat))
   AND p.lng < e.x1 + (p.lat - e.y1) * (e.x2 - e.x1) / (e.y2 - e.y1)
)
SELECT event_id, pid AS feature_id
FROM crossings GROUP BY event_id, pid HAVING count(*) % 2 = 1
"""


def q_geo_pip_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result through the salted bucketed join (skew path)."""
    pts = cover_ops.with_point_cells(_events_points(spark, sf_dir))
    feats = fixtures.features_table(spark)
    out = spatial_join.containment_join_bucketed(pts, feats, point_id="event_id", salt=8)
    return out.select("event_id", "feature_id")


def q_geo_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline import tile_assignments

    pts = _events_points(spark, sf_dir)
    t = tile_assignments(pts.withColumnRenamed("event_id", "image_id"), zooms=(12, 16))
    return t.select(F.col("image_id").alias("event_id"), "zoom", "tile_x", "tile_y")


def sql_geo_tiles() -> str:
    return f"""
WITH {_PTS_CTE},
zooms(zoom, n) AS (VALUES (12, 4096.0), (16, 65536.0))
SELECT event_id, zoom,
  CAST(floor((lng + 180.0) / 360.0 * n) AS BIGINT) AS tile_x,
  CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * n) AS BIGINT) AS tile_y
FROM pts, zooms
"""


def q_geo_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _events_points(spark, sf_dir)
    out = knn_ops.knn_bruteforce(pts, _probes(spark), KNN_K, point_id="event_id")
    return out.select("probe_id", "rank", "event_id")


def sql_geo_knn() -> str:
    hav = _HAV.format(lat1="plat", lng1="plng", lat2="lat", lng2="lng")
    return f"""
WITH {_PTS_CTE},
{_PROBES_CTE},
d AS (SELECT probe_id, event_id, {hav} AS dist_m FROM probes, pts),
r AS (SELECT probe_id, event_id,
        row_number() OVER (PARTITION BY probe_id ORDER BY dist_m ASC, event_id ASC) AS rank
      FROM d)
SELECT probe_id, rank, event_id FROM r WHERE rank <= {KNN_K}
"""


def q_geo_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _events_points(spark, sf_dir)
    out = spatial_join.distance_join(pts, CAP_LAT, CAP_LNG, CAP_R_M, point_id="event_id")
    return out.select("event_id")


def sql_geo_cap() -> str:
    hav = _HAV.format(lat1=repr(CAP_LAT), lng1=repr(CAP_LNG), lat2="lat", lng2="lng")
    return f"""
WITH {_PTS_CTE}
SELECT event_id FROM pts WHERE {hav} <= {CAP_R_M!r}
"""


def q_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _events_points(spark, sf_dir)
    return (
        pts.groupBy(
            F.floor(F.col("lat") * 100).cast("long").alias("gy"),
            F.floor(F.col("lng") * 100).cast("long").alias("gx"),
        )
        .agg(F.count("*").alias("n"))
    )


def sql_geo_grid() -> str:
    return f"""
WITH {_PTS_CTE}
SELECT CAST(floor(lat * 100) AS BIGINT) AS gy, CAST(floor(lng * 100) AS BIGINT) AS gx,
       count(*) AS n
FROM pts GROUP BY 1, 2
"""


def q_geo_s2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True S2 index columns (not SQL-expressible -> rows-only check)."""
    pts = cover_ops.with_point_cells(_events_points(spark, sf_dir))
    return pts.select("event_id", "cell16", "bucket")


def q_geo_s2_cell_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram over level-10 S2 cells (s2-grid analogue; rows-only)."""
    pts = cover_ops.with_point_cells(_events_points(spark, sf_dir))
    return (
        pts.withColumn("cell10", cover_ops.ancestor_at(F.col("cell16"), 10))
        .groupBy("cell10")
        .agg(F.count("*").alias("n"))
    )


# --- relational / aggregation parity (SURVEY.md §2.6-2.8) -------------------


def _dsum(col, scale: int = 2):
    return F.round(F.sum(F.col(col).cast("decimal(25,6)")), scale).cast("double")


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = fixtures.testdata(spark, sf_dir, "lineitem")
    f = l.filter(F.col("l_shipdate") <= "1998-09-02")
    return (
        f.withColumn("disc_price", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            F.round(F.sum("disc_price"), 2).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def sql_tpch_q1() -> str:
    return """
SELECT l_returnflag, l_linestatus,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(25,6))), 2) AS DOUBLE) AS sum_qty,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(25,6))), 2) AS DOUBLE) AS sum_base_price,
  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))), 2) AS DOUBLE) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = fixtures.testdata(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = fixtures.testdata(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    l = fixtures.testdata(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    joined = l.join(o, l.l_orderkey == o.o_orderkey).join(F.broadcast(c), o.o_custkey == c.c_custkey)
    rev = joined.withColumn(
        "disc_price", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)")
    )
    out = rev.groupBy("l_orderkey").agg(
        F.round(F.sum("disc_price"), 2).cast("double").alias("revenue")
    )
    return agg_ops.top_k(out, "revenue", 10, "l_orderkey")


def sql_tpch_q3() -> str:
    return """
SELECT l_orderkey,
  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fixtures.testdata(spark, sf_dir, "events")
    return agg_ops.count_values(ev, "event_type")


def sql_count_values() -> str:
    return "SELECT event_type AS value, count(*) AS n FROM events GROUP BY 1"


def q_sum_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fixtures.testdata(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("decimal(25,6)")
    )
    out = agg_ops.sum_by_key(ev, "user_id", "value")
    return out.select("key", F.round(F.col("total"), 2).cast("double").alias("total"))


def sql_sum_by_key() -> str:
    return """
SELECT user_id AS key, CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
FROM events GROUP BY 1
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = fixtures.testdata(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return agg_ops.top_k(o, "o_totalprice", 10, "o_orderkey")


def sql_top_orders() -> str:
    return """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = fixtures.testdata(spark, sf_dir, "orders")
    return agg_ops.percentiles(o, "o_totalprice", "o_orderkey")


def sql_percentiles() -> str:
    return """
SELECT o_orderkey, o_totalprice, percent_rank() OVER (ORDER BY o_totalprice ASC) AS pct
FROM orders
"""


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = fixtures.testdata(spark, sf_dir, "orders")
    return agg_ops.histogram(o, "o_totalprice", 50000.0)


def sql_histogram() -> str:
    return """
SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket, count(*) AS n
FROM orders GROUP BY 1
"""


def q_join_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = fixtures.testdata(spark, sf_dir, "customer")
    base = c.filter(F.col("c_acctbal") >= 5000).select("c_custkey", F.col("c_name").alias("name"))
    joined = c.select("c_custkey", F.upper(F.col("c_name")).alias("name"))
    return agg_ops.join_missing(base, joined, "c_custkey")


def sql_join_missing() -> str:
    return """
SELECT c_custkey, c_name AS name FROM customer WHERE c_acctbal >= 5000
UNION ALL
SELECT c_custkey, upper(c_name) AS name FROM customer
WHERE c_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal >= 5000)
"""


def q_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = fixtures.testdata(spark, sf_dir, "lineitem")
    return l.groupBy(F.col("l_partkey").alias("node")).agg(
        F.countDistinct("l_suppkey").alias("degree")
    )


def sql_degree() -> str:
    return "SELECT l_partkey AS node, count(DISTINCT l_suppkey) AS degree FROM lineitem GROUP BY 1"


def q_flatten_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fixtures.testdata(spark, sf_dir, "documents")
    w = dedup_ops.words(d.select("doc_id", F.lower(F.col("text")).alias("text")), "doc_id", "text")
    counts = w.groupBy("word").agg(F.count("*").alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("word").asc()).limit(20)


def sql_flatten_words() -> str:
    return r"""
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word FROM documents)
WHERE word <> ''
GROUP BY 1 ORDER BY n DESC, word ASC LIMIT 20
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch equivalent of the tumbling-window stream aggregation."""
    ev = fixtures.testdata(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("HOUR", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), _dsum("value").alias("total"))
    )


def sql_events_hourly() -> str:
    return """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
  count(*) AS n,
  CAST(round(sum(CAST(value AS DECIMAL(25,6))), 2) AS DOUBLE) AS total
FROM events GROUP BY 1, 2
"""


# --- graph / routing (SURVEY.md §2.9) ---------------------------------------
#
# Deterministic street-graph stand-in: a DAG derived from lineitem
# (src = l_orderkey % 500, dst = l_partkey % 500, src < dst, w = quantity),
# so DuckDB can oracle-check the bounded-hop relaxation by unrolling the
# rounds as plain min-aggregations (no recursion -> guaranteed convergence).

GRAPH_N_NODES = 500
GRAPH_N_ORIGINS = 5
GRAPH_ROUNDS = 3


def _graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = fixtures.testdata(spark, sf_dir, "lineitem")
    raw = l.select(
        (F.col("l_orderkey") % GRAPH_N_NODES).alias("src"),
        (F.col("l_partkey") % GRAPH_N_NODES).alias("dst"),
        F.col("l_quantity").cast("long").cast("double").alias("w"),
    ).filter(F.col("src") < F.col("dst"))
    return graph_ops.min_edges(raw)


def _graph_origins(spark: SparkSession) -> DataFrame:
    return spark.range(GRAPH_N_ORIGINS).select(
        F.col("id").alias("origin"), F.col("id").alias("node")
    )


_GRAPH_EDGES_CTE = f"""raw AS (
  SELECT l_orderkey % {GRAPH_N_NODES} AS src, l_partkey % {GRAPH_N_NODES} AS dst,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem WHERE l_orderkey % {GRAPH_N_NODES} < l_partkey % {GRAPH_N_NODES}
),
e AS (SELECT src, dst, min(w) AS w FROM raw GROUP BY 1, 2)"""


def _graph_relax_ctes() -> str:
    """d0..dN CTEs: one min-aggregated relaxation per bounded hop."""
    parts = [
        f"d0 AS (SELECT CAST(range AS BIGINT) AS origin, CAST(range AS BIGINT) AS node, "
        f"CAST(0 AS BIGINT) AS dist FROM range({GRAPH_N_ORIGINS}))"
    ]
    for r in range(1, GRAPH_ROUNDS + 1):
        p = f"d{r - 1}"
        parts.append(
            f"d{r} AS (SELECT origin, node, min(dist) AS dist FROM ("
            f"SELECT * FROM {p} UNION ALL "
            f"SELECT {p}.origin, e.dst AS node, {p}.dist + e.w AS dist "
            f"FROM {p} JOIN e ON e.src = {p}.node) GROUP BY 1, 2)"
        )
    return ",\n".join(parts)


def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    dist = graph_ops.bounded_sssp(
        _graph_edges(spark, sf_dir), _graph_origins(spark), rounds=GRAPH_ROUNDS
    )
    return dist.select("origin", "node", F.col("dist").cast("long").alias("dist"))


def sql_graph_sssp() -> str:
    return f"""
WITH {_GRAPH_EDGES_CTE},
{_graph_relax_ctes()}
SELECT origin, node, dist FROM d{GRAPH_ROUNDS}
"""


def q_graph_closest(spark: SparkSession, sf_dir: str) -> DataFrame:
    dist = graph_ops.bounded_sssp(
        _graph_edges(spark, sf_dir), _graph_origins(spark), rounds=GRAPH_ROUNDS
    )
    targets = spark.range(GRAPH_N_NODES).filter((F.col("id") % 7 == 0) & (F.col("id") > 0)).select(
        F.col("id").alias("node")
    )
    out = graph_ops.closest(dist, targets)
    return out.select("origin", "node", F.col("dist").cast("long").alias("dist"))


def sql_graph_closest() -> str:
    return f"""
WITH {_GRAPH_EDGES_CTE},
{_graph_relax_ctes()},
hits AS (
  SELECT origin, node, dist,
         row_number() OVER (PARTITION BY origin ORDER BY dist ASC, node ASC) AS rn
  FROM d{GRAPH_ROUNDS} WHERE node % 7 = 0 AND node > 0
)
SELECT origin, node, dist FROM hits WHERE rn = 1
"""


def q_graph_reachable(spark: SparkSession, sf_dir: str) -> DataFrame:
    dist = graph_ops.bounded_sssp(
        _graph_edges(spark, sf_dir), _graph_origins(spark), rounds=GRAPH_ROUNDS
    )
    return graph_ops.reachable_count(dist, max_cost=60.0)


def sql_graph_reachable() -> str:
    return f"""
WITH {_GRAPH_EDGES_CTE},
{_graph_relax_ctes()}
SELECT origin, count(*) AS n_reachable FROM d{GRAPH_ROUNDS} WHERE dist <= 60 GROUP BY 1
"""


def q_graph_dijkstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-origin Dijkstra under applyInPandas (rows-only check;
    pytest pins it against the iterative path run to convergence)."""
    import numpy as np

    e = _graph_edges(spark, sf_dir).toPandas()
    routes = graph_ops.dijkstra_per_origin(
        _graph_origins(spark),
        e["src"].to_numpy(np.int64),
        e["dst"].to_numpy(np.int64),
        e["w"].to_numpy(np.float64),
    )
    return routes.select("origin", "node", F.col("dist").cast("long").alias("dist"), "pred")


def q_graph_paths_to_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-usage counts over shortest-path trees (rows-only check)."""
    import numpy as np

    e = _graph_edges(spark, sf_dir).toPandas()
    routes = graph_ops.dijkstra_per_origin(
        _graph_origins(spark),
        e["src"].to_numpy(np.int64),
        e["dst"].to_numpy(np.int64),
        e["w"].to_numpy(np.float64),
    )
    return graph_ops.paths_to_reach(routes)


# --- dedup / text / similarity (training-data pipeline ops) -----------------


def _docs_with_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus synthetic exact duplicates (every 10th doc)."""
    d = fixtures.testdata(spark, sf_dir, "documents")
    dup = d.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    return d.unionByName(dup)


_DOCS_DUP_CTE = """docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
)"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_ops.exact_duplicates(_docs_with_dupes(spark, sf_dir), "doc_id", "text")


def sql_dedup_exact() -> str:
    return f"""
WITH {_DOCS_DUP_CTE}
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keeper
FROM docs GROUP BY 1 HAVING count(*) > 1
"""


_SHINGLE_CTE = r"""toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM docs
),
sh AS (
  SELECT DISTINCT doc_id, toks[t.i + 1] || ' ' || toks[t.i + 2] || ' ' || toks[t.i + 3] AS shingle
  FROM toks, LATERAL (SELECT unnest(range(len(toks) - 2)) AS i) t
  WHERE len(toks) >= 3
)"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_ops.minhash_lsh_pairs(_docs_with_dupes(spark, sf_dir), "doc_id", "text")


def sql_minhash_lsh() -> str:
    p = dedup_ops.MOD
    hs = dedup_ops.MINHASH_PARAMS
    sig = ", ".join(
        f"min((sh * {a} + {b}) % {p}) AS mh{i}" for i, (a, b) in enumerate(hs)
    )
    return f"""
WITH {_DOCS_DUP_CTE},
{_SHINGLE_CTE},
hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % {p} AS sh FROM sh
),
sig AS (SELECT doc_id, {sig} FROM hashed GROUP BY doc_id),
bands AS (
  SELECT doc_id, 'b0' || '_' || mh0 || '_' || mh1 AS bucket FROM sig
  UNION ALL
  SELECT doc_id, 'b1' || '_' || mh2 || '_' || mh3 AS bucket FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fixtures.testdata(spark, sf_dir, "documents")
    return dedup_ops.simhash(d, "doc_id", "text", bits=16)


def sql_simhash() -> str:
    bits = 16
    votes = ", ".join(
        f"CAST(sum(((h >> {k}) & 1) * 2 - 1) AS BIGINT) AS v{k}" for k in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN v{k} > 0 THEN {1 << k} ELSE 0 END)" for k in range(bits))
    return rf"""
WITH w AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents
),
h AS (
  SELECT doc_id, CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) AS h
  FROM w WHERE word <> ''
),
v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM v
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_ops.ngram_jaccard_pairs(_docs_with_dupes(spark, sf_dir), "doc_id", "text", threshold=0.2)


def sql_ngram_jaccard() -> str:
    return f"""
WITH {_DOCS_DUP_CTE},
{_SHINGLE_CTE},
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter / (sa.sz + sb.sz - inter) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE inter / (sa.sz + sb.sz - inter) >= 0.2
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fixtures.testdata(spark, sf_dir, "documents")
    return text_ops.token_count(d, "doc_id", "text")


def sql_token_count() -> str:
    return r"""
SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens
FROM documents
"""


def q_language_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fixtures.testdata(spark, sf_dir, "documents")
    return text_ops.language_score(d, "doc_id", "text")


def sql_language_score() -> str:
    def hits(words):
        terms = []
        for w in words:
            pat = f" {w} "
            terms.append(
                f"(length(' ' || lower(text) || ' ') - "
                f"length(replace(' ' || lower(text) || ' ', '{pat}', ''))) / {len(pat)}"
            )
        return "CAST(" + " + ".join(terms) + " AS BIGINT)"

    en, de, fr = (hits(w) for w in (text_ops.EN_STOPWORDS, text_ops.DE_STOPWORDS, text_ops.FR_STOPWORDS))
    return f"""
WITH s AS (SELECT doc_id, {en} AS en_hits, {de} AS de_hits, {fr} AS fr_hits FROM documents)
SELECT doc_id, en_hits, de_hits, fr_hits,
  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
       WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS lang_guess
FROM s
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fixtures.testdata(spark, sf_dir, "documents")
    return text_ops.quality_score(d, "doc_id", "text")


def sql_quality_score() -> str:
    def hits(words):
        terms = []
        for w in words:
            pat = f" {w} "
            terms.append(
                f"(length(' ' || lower(text) || ' ') - "
                f"length(replace(' ' || lower(text) || ' ', '{pat}', ''))) / {len(pat)}"
            )
        return "CAST(" + " + ".join(terms) + " AS BIGINT)"

    en = hits(text_ops.EN_STOPWORDS)
    return rf"""
SELECT doc_id,
  length(text) AS n_chars,
  length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
  {en} AS stopword_hits,
  round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / length(text), 6) AS punct_ratio,
  round({en} / CAST(len(string_split_regex(trim(text), '\s+')) AS INT), 6) AS stopword_ratio
FROM documents
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprint (pandas-UDF kernel; rows-only check)."""
    d = fixtures.testdata(spark, sf_dir, "documents")
    return text_ops.fingerprint(d, "doc_id", "text")


def q_embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fixtures.testdata(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    out = sim_ops.cosine_topk_bruteforce(emb, probes, 5)
    return out.select("probe_id", "rank", "vec_id")


def sql_embedding_knn() -> str:
    dot = (
        "list_inner_product(list_transform({a}, x -> CAST(x AS DOUBLE)), "
        "list_transform({b}, x -> CAST(x AS DOUBLE)))"
    )
    cos = (
        dot.format(a="p.e", b="v.embedding")
        + " / (sqrt(" + dot.format(a="p.e", b="p.e") + ") * sqrt("
        + dot.format(a="v.embedding", b="v.embedding") + "))"
    )
    return f"""
WITH pv AS (SELECT vec_id AS probe_id, embedding AS e FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT p.probe_id, v.vec_id, {cos} AS cos
  FROM pv p, embeddings v WHERE v.vec_id != p.probe_id
),
r AS (SELECT probe_id, vec_id,
        row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id ASC) AS rank
      FROM scored)
SELECT probe_id, rank, vec_id FROM r WHERE rank <= 5
"""


def q_embedding_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN variant (recall<1 by design -> rows-only check)."""
    emb = fixtures.testdata(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    return sim_ops.cosine_topk_lsh(emb, probes, 5, dim=64)


# --- registry ----------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "geo_pip": q_geo_pip,
    "geo_pip_salted": q_geo_pip_salted,
    "geo_tiles": q_geo_tiles,
    "geo_knn": q_geo_knn,
    "geo_cap": q_geo_cap,
    "geo_grid": q_geo_grid,
    "geo_s2_cells": q_geo_s2_cells,
    "geo_s2_cell_count": q_geo_s2_cell_count,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "count_values": q_count_values,
    "sum_by_key": q_sum_by_key,
    "top_orders": q_top_orders,
    "percentiles": q_percentiles,
    "histogram": q_histogram,
    "join_missing": q_join_missing,
    "degree": q_degree,
    "flatten_words": q_flatten_words,
    "events_hourly": q_events_hourly,
    "graph_sssp": q_graph_sssp,
    "graph_closest": q_graph_closest,
    "graph_reachable": q_graph_reachable,
    "graph_dijkstra": q_graph_dijkstra,
    "graph_paths_to_reach": q_graph_paths_to_reach,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_minhash_lsh,
    "dedup_simhash": q_simhash,
    "dedup_ngram_jaccard": q_ngram_jaccard,
    "token_count": q_token_count,
    "language_score": q_language_score,
    "quality_score": q_quality_score,
    "doc_fingerprint": q_fingerprint,
    "embedding_knn": q_embedding_knn,
    "embedding_knn_lsh": q_embedding_knn_lsh,
}

ORACLES: dict[str, str] = {
    "geo_pip": sql_geo_pip(),
    "geo_pip_salted": sql_geo_pip(),  # same result, different physical plan
    "geo_tiles": sql_geo_tiles(),
    "geo_knn": sql_geo_knn(),
    "geo_cap": sql_geo_cap(),
    "geo_grid": sql_geo_grid(),
    "tpch_q1": sql_tpch_q1(),
    "tpch_q3": sql_tpch_q3(),
    "count_values": sql_count_values(),
    "sum_by_key": sql_sum_by_key(),
    "top_orders": sql_top_orders(),
    "percentiles": sql_percentiles(),
    "histogram": sql_histogram(),
    "join_missing": sql_join_missing(),
    "degree": sql_degree(),
    "flatten_words": sql_flatten_words(),
    "events_hourly": sql_events_hourly(),
    "graph_sssp": sql_graph_sssp(),
    "graph_closest": sql_graph_closest(),
    "graph_reachable": sql_graph_reachable(),
    "dedup_exact": sql_dedup_exact(),
    "dedup_minhash_lsh": sql_minhash_lsh(),
    "dedup_simhash": sql_simhash(),
    "dedup_ngram_jaccard": sql_ngram_jaccard(),
    "token_count": sql_token_count(),
    "language_score": sql_language_score(),
    "quality_score": sql_quality_score(),
    "embedding_knn": sql_embedding_knn(),
    # rows-only (non-SQL-expressible): geo_s2_cells, geo_s2_cell_count,
    # doc_fingerprint, embedding_knn_lsh
}
