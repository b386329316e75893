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
