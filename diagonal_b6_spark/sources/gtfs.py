"""GTFS-shaped transit ingest: stop_times -> transit graph edges.

Reference surface: b6 ingests GTFS feeds and builds transit connections
with peak/off-peak aware weights (b6/graph/graph.go:32-264's bus/transit
weighting).  No GTFS data ships in this sandbox, so this module
implements the graph-building stage against GTFS-shaped DataFrames --
the two tables any GTFS loader produces:

    stops(stop_id long, stop_lat double, stop_lon double)
    stop_times(trip_id long, stop_id long, stop_seq int, departure_s long)

Spark-first: consecutive stops of a trip pair up with ONE self-join on
(trip_id, seq+1) -- identical shape to the reference's per-trip edge
emission -- and collapse to min travel time per (src, dst, peak) with a
single groupBy.  Peak classification is a pure column predicate over the
departure second-of-day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# peak windows in seconds-of-day: 07:00-09:30 and 16:00-19:00
PEAK_WINDOWS = ((7 * 3600, 9 * 3600 + 1800), (16 * 3600, 19 * 3600))


def peak_col(departure_s):
    cond = None
    for lo, hi in PEAK_WINDOWS:
        c = (departure_s % 86400 >= lo) & (departure_s % 86400 < hi)
        cond = c if cond is None else (cond | c)
    return cond


def transit_edges(stop_times: DataFrame) -> DataFrame:
    """(src, dst, w, peak): directed stop-to-stop hops with travel-time
    weight in seconds, min-collapsed per (src, dst, peak)."""
    a = stop_times.alias("a")
    b = stop_times.alias("b")
    hops = a.join(
        b,
        (F.col("a.trip_id") == F.col("b.trip_id"))
        & (F.col("b.stop_seq") == F.col("a.stop_seq") + 1),
    ).select(
        F.col("a.stop_id").alias("src"),
        F.col("b.stop_id").alias("dst"),
        (F.col("b.departure_s") - F.col("a.departure_s")).cast("double").alias("w"),
        peak_col(F.col("a.departure_s")).alias("peak"),
    )
    return hops.groupBy("src", "dst", "peak").agg(F.min("w").alias("w"))


def transit_graph(stop_times: DataFrame, peak: bool, peak_factor: float = 1.5) -> DataFrame:
    """Edge table for one service regime, ready for bounded_sssp: peak
    hops keep their observed times; when querying the peak regime,
    off-peak-only connections are penalized by `peak_factor` (the
    reference's conservative crowding model); off-peak queries use the
    raw off-peak times and ignore peak-only observations' penalty."""
    e = transit_edges(stop_times)
    if peak:
        w = F.when(F.col("peak"), F.col("w")).otherwise(F.col("w") * peak_factor)
    else:
        w = F.col("w")
    return e.select("src", "dst", w.alias("w")).groupBy("src", "dst").agg(F.min("w").alias("w"))


# --- real GTFS feed files (stops.txt / trips.txt / stop_times.txt) ----------
#
# Reference: b6/ingest/gtfs/gtfs.go:260-294 (TXTFilesGTFSSource) +
# b6/ingest/transit/gtfs.go (the CSV readers).  The reference's feed
# semantics, mirrored exactly:
#   * times are 'HH:MM:SS' with HH allowed past 24 (service past
#     midnight); hours wrap mod 24 (gtfs.go:32-45 sanitizeTime);
#   * per trip, stops sort by stop_sequence and consecutive stops pair
#     into directed connections (gtfs.go:148-169 tripConnections);
#   * travel time = arrival(to) - departure(from), +24h on midnight wrap
#     (gtfs.go:61-90 travelTimes);
#   * a connection is PEAK iff departure or (unwrapped) arrival falls in
#     [08:00,10:00] or [16:00,18:00] INCLUSIVE (gtfs.go:21-30); a
#     wrapped arrival is next-day and never peak;
#   * duplicate (from,to) pairs consolidate by averaging peak and
#     off-peak observations separately (gtfs.go:120-146), emitted
#     rounded UP to whole minutes (gtfs.go:199-219 path()).
#
# Spark-first: spark.read.csv does the distributed parse; the per-trip
# consecutive pairing is a lead() window partitioned by trip_id (GTFS
# sequences need not be dense integers, so seq+1 equi-join is wrong for
# real feeds); consolidation is one groupBy.  Stop identity follows the
# reference's hash-of-id+location scheme with xxhash64 standing in for
# fnv64a (namespace-internal identity; only stability matters).

GTFS_PEAK_WINDOWS = ((8 * 3600, 10 * 3600), (16 * 3600, 18 * 3600))


def gtfs_time_s(col):
    """'HH:MM:SS' -> seconds-of-day; hours wrap mod 24 like the
    reference's sanitizeTime.  Malformed times -> NULL (the row drops in
    the connection join, matching the reference's skip-with-error)."""
    p = F.split(col, ":")
    h, m, s = (p.getItem(i).cast("int") for i in range(3))
    return F.when(
        h.isNotNull() & m.isNotNull() & s.isNotNull(),
        (h % 24) * 3600 + m * 60 + s,
    )


def _gtfs_peak(sec):
    cond = None
    for lo, hi in GTFS_PEAK_WINDOWS:
        c = (sec >= lo) & (sec <= hi)
        cond = c if cond is None else (cond | c)
    return cond


def read_gtfs(spark, directory: str) -> dict[str, DataFrame]:
    """Read a GTFS feed directory (the four files TXTFilesGTFSSource
    expects).  Returns {'stops', 'trips', 'routes', 'stop_times'} with
    typed columns; ids stay strings (real feeds use opaque ids)."""
    def csv(name):
        return spark.read.csv(f"{directory}/{name}.txt", header=True)

    stops = csv("stops").select(
        F.col("stop_id"),
        F.col("stop_name"),
        F.col("stop_lat").cast("double"),
        F.col("stop_lon").cast("double"),
    )
    trips = csv("trips").select("route_id", "service_id", "trip_id")
    routes = csv("routes").select("route_id", "route_short_name", "route_type")
    stop_times = csv("stop_times").select(
        "trip_id",
        "stop_id",
        F.col("stop_sequence").cast("int").alias("stop_sequence"),
        gtfs_time_s(F.col("arrival_time")).alias("arrival_s"),
        gtfs_time_s(F.col("departure_time")).alias("departure_s"),
    )
    return {"stops": stops, "trips": trips, "routes": routes, "stop_times": stop_times}


def gtfs_connections(feed: dict) -> DataFrame:
    """Consolidated stop-to-stop connections with the reference's
    averaged + ceil-minute weights: (from_stop, to_stop, peak_s,
    offpeak_s) -- peak_s/offpeak_s NULL when that regime was never
    observed (the reference omits the tag)."""
    from pyspark.sql import Window

    st = feed["stop_times"]
    w = Window.partitionBy("trip_id").orderBy("stop_sequence")
    hops = st.select(
        F.col("stop_id").alias("from_stop"),
        F.lead("stop_id").over(w).alias("to_stop"),
        F.col("departure_s").alias("dep"),
        F.lead("arrival_s").over(w).alias("arr"),
    ).where(F.col("to_stop").isNotNull() & F.col("dep").isNotNull() & F.col("arr").isNotNull())
    wrapped = F.col("arr") < F.col("dep")
    travel = F.when(wrapped, F.col("arr") + 86400 - F.col("dep")).otherwise(
        F.col("arr") - F.col("dep")
    ).cast("double")
    peak = _gtfs_peak(F.col("dep")) | (~wrapped & _gtfs_peak(F.col("arr")))
    obs = hops.select("from_stop", "to_stop", travel.alias("t"), peak.alias("peak"))
    ceil_min = lambda c: (F.ceil(c / 60.0) * 60).cast("long")  # noqa: E731
    return obs.groupBy("from_stop", "to_stop").agg(
        ceil_min(F.avg(F.when(F.col("peak"), F.col("t")))).alias("peak_s"),
        ceil_min(F.avg(F.when(~F.col("peak"), F.col("t")))).alias("offpeak_s"),
    )


def gtfs_features(feed: dict, operator: str = "") -> DataFrame:
    """Emit the feed as engine features (reference point()/path(),
    gtfs.go:47-59,171-221): one point per stop tagged #gtfs=stop, one
    2-point path per consolidated connection tagged #gtfs=connection
    with gtfs:peak/gtfs:offpeak whole-minute travel times."""
    stops = feed["stops"]
    conns = gtfs_connections(feed)
    ns = f"gtfs{operator}"
    pts = stops.select(
        F.concat(F.lit("point/"), F.lit(ns), F.lit("/"),
                 F.xxhash64("stop_id", "stop_lat", "stop_lon").cast("string")).alias("feature_id"),
        F.lit("point").alias("feature_type"),
        F.lit(ns).alias("ns"),
        F.create_map(F.lit("#gtfs"), F.lit("stop"), F.lit("name"), F.col("stop_name")).alias("tags"),
        F.array(F.col("stop_lon")).alias("xs"),
        F.array(F.col("stop_lat")).alias("ys"),
        F.array(F.lit(0)).alias("ring_offsets"),
    )
    locs = stops.select(
        "stop_id", F.col("stop_lat").alias("lat"), F.col("stop_lon").alias("lon")
    )
    c = (
        conns.join(locs.withColumnRenamed("stop_id", "from_stop"), "from_stop")
        .withColumnsRenamed({"lat": "from_lat", "lon": "from_lon"})
        .join(locs.withColumnRenamed("stop_id", "to_stop"), "to_stop")
    )
    tag_pairs = [
        (F.lit("#gtfs"), F.lit("connection")),
        (F.lit("gtfs:peak"), F.col("peak_s").cast("string")),
        (F.lit("gtfs:offpeak"), F.col("offpeak_s").cast("string")),
    ]
    tags = F.map_filter(
        F.create_map(*[x for kv in tag_pairs for x in kv]), lambda k, v: v.isNotNull()
    )
    paths = c.select(
        F.concat(F.lit("path/"), F.lit(ns), F.lit("/"),
                 F.xxhash64("from_stop", "to_stop").cast("string")).alias("feature_id"),
        F.lit("path").alias("feature_type"),
        F.lit(ns).alias("ns"),
        tags.alias("tags"),
        F.array(F.col("from_lon"), F.col("lon")).alias("xs"),
        F.array(F.col("from_lat"), F.col("lat")).alias("ys"),
        F.array(F.lit(0)).alias("ring_offsets"),
    )
    return pts.unionByName(paths)


def to_stop_times_contract(feed: dict) -> DataFrame:
    """Adapt a file-read feed to the long-id stop_times contract the
    transit_edges/transit_graph builders consume (string ids hashed via
    xxhash64, sequences re-densified per trip)."""
    from pyspark.sql import Window

    st = feed["stop_times"]
    w = Window.partitionBy("trip_id").orderBy("stop_sequence")
    return st.select(
        F.xxhash64("trip_id").alias("trip_id"),
        F.xxhash64("stop_id").alias("stop_id"),
        (F.row_number().over(w) - 1).alias("stop_seq"),
        F.col("departure_s").cast("long").alias("departure_s"),
    ).where(F.col("departure_s").isNotNull())
