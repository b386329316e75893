"""Structured Streaming operators.

The reference has no streaming subsystem (SURVEY.md §2.13) -- its only
temporal notion is static GTFS peak/off-peak tags.  Our engine adds the
standard streaming capability a web-scale ingest pipeline needs: event-time
tumbling/sliding windows with watermarked late-data handling, streaming
dedupe, and a per-tile throughput monitor that reuses the SAME JVM-side
tile expressions as the batch pipeline (one code path, two execution
modes -- the Spark-first answer to "streams are tables").

All transforms take/return DataFrames, so each works identically on a
batch frame (tested against groupBy equivalents) and a readStream frame
(tested through file-source + availableNow triggers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import cover as cover_ops


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling (or sliding) event-time window counts + value sums with a
    watermark bounding state for late data."""
    # watermarks require TIMESTAMP (tz); parquet fixtures carry TIMESTAMP_NTZ
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        src.groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "total",
        )
    )


def streaming_dedupe(
    events: DataFrame,
    id_col: str = "event_id",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once-per-id stream: dropDuplicates bounded by watermark
    (state stays finite at 10^12-event scale because expired ids age out)."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.dropDuplicates([id_col])


def tile_throughput(
    points: DataFrame,
    zoom: int = 12,
    window: str = "15 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Images/events per web-mercator tile per window -- the streaming
    twin of the batch tile-assignment stage, sharing cover.tile_xy_cols
    so batch and stream can never disagree on tile math."""
    x, y = cover_ops.tile_xy_cols(zoom)
    points = points.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    src = points.withWatermark(ts_col, watermark) if points.isStreaming else points
    with_tiles = src.withColumn("tile_x", x).withColumn("tile_y", y)
    return (
        with_tiles.groupBy(
            F.window(F.col(ts_col), window).alias("win"),
            F.lit(zoom).alias("zoom"),
            "tile_x",
            "tile_y",
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"), "zoom", "tile_x", "tile_y", "n"
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INNER join within a bounded arrival window: each
    left row pairs with right rows carrying the same key whose event
    time lands in [left_ts, left_ts + max_delay] -- the canonical
    image+caption pairing job (captions trail their images by bounded
    skew; an unbounded join would hold infinite state).  Watermarks on
    BOTH sides plus the time-range condition let Spark expire state, so
    per-executor state stays finite at 10^12-row scale.  Works
    identically on batch frames (no watermark, same join condition) --
    the batch==stream equivalence test keys on that."""
    lt, rt = f"__l_{left_ts}", f"__r_{right_ts}"
    lf = left.withColumn(lt, F.col(left_ts).cast("timestamp"))
    rf = right.withColumn(rt, F.col(right_ts).cast("timestamp"))
    if lf.isStreaming:
        lf = lf.withWatermark(lt, watermark)
    if rf.isStreaming:
        rf = rf.withWatermark(rt, watermark)
    lf = lf.alias("l")
    rf = rf.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{rt}") >= F.col(f"l.{lt}"))
        & (F.col(f"r.{rt}") <= F.col(f"l.{lt}") + F.expr(f"INTERVAL {max_delay}"))
    )
    return lf.join(rf, cond, "inner").select(
        F.col(f"l.{key}").alias(key),
        F.col(f"l.{lt}").alias("left_ts"),
        F.col(f"r.{rt}").alias("right_ts"),
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, spark=None, output_mode: str = "complete"
) -> DataFrame:
    """Drain a (bounded) stream into an in-memory table with the
    availableNow trigger; returns the result as a batch DataFrame.
    Default complete output mode (windowed aggs over file sources);
    stateful append-mode operators pass output_mode='append'."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    session = spark or stream_df.sparkSession
    return session.table(query_name)


def stateful_session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
):
    """Custom stateful operator under ``applyInPandasWithState``: per-key
    SESSION aggregation with a gap timeout (the brief's custom-stateful
    pattern; sessionization is the canonical op the built-in windows
    can't express).  State per key = (session_start, last_ts, n, total);
    a processing round extends the open session or -- via the
    EventTimeTimeout -- flushes it once the watermark passes last_ts+gap.

    Emits one row per CLOSED session: (user_id, session_start,
    session_end, n_events, total_value).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = _duration_s(gap)

    def _emit(key, sessions):
        return pd.DataFrame(
            {
                "user_id": [key[0]] * len(sessions),
                "session_start": [s[0] for s in sessions],
                "session_end": [s[1] for s in sessions],
                "n_events": [s[2] for s in sessions],
                "total_value": [s[3] for s in sessions],
            }
        )

    def fn(key, pdfs, state: GroupState):
        gap_ms = gap_s * 1000
        if state.hasTimedOut:
            closed = [tuple(state.get)]
            state.remove()
            yield _emit(key, closed)
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts = rows["ts"].astype("int64") // 1_000_000  # ms epoch
        vals = rows["value"].astype(float)
        cur = tuple(state.get) if state.exists else None
        closed = []
        for t, v in zip(ts, vals):
            t = int(t)
            if cur is None:
                cur = (t, t, 1, float(v))
            elif t - cur[1] > gap_ms:
                closed.append(cur)  # gap inside the data closes the session
                cur = (t, t, 1, float(v))
            else:
                # min() on the start: a sample from a LATER micro-batch can
                # legitimately precede the open session's first sample
                # (cross-batch out-of-order within the watermark); the
                # batch twin sorts globally, so the session start must
                # absorb it.  t < start - gap cannot occur: the watermark
                # delay equals the gap, so any admitted t >= max_seen -
                # gap >= start - gap.
                cur = (min(cur[0], t), max(cur[1], t), cur[2] + 1, cur[3] + float(v))
        state.update(cur)
        # clamp above the current watermark: a borderline-late event
        # touching stale state (last_ts + gap <= watermark) would
        # otherwise make Spark throw ("timeout timestamp must be greater
        # than watermark") and kill the query.
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(cur[1] + gap_ms, wm + 1, 1))
        if closed:
            yield _emit(key, closed)

    out_schema = (
        "user_id long, session_start long, session_end long, "
        "n_events long, total_value double"
    )
    state_schema = "start long, last long, n long, total double"
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark(ts_col, gap)
    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )


def _duration_s(d: str) -> int:
    n, unit = d.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600}[unit]
    return int(n) * mult


def streaming_geofence(
    points: DataFrame,
    polygons: DataFrame,
    point_id: str = "event_id",
    lat: str = "lat",
    lng: str = "lng",
    extras: "list[str] | None" = None,
) -> DataFrame:
    """Streaming spatial containment (geofencing): each arriving point
    emits one row per containing polygon.  Reuses the BATCH broadcast
    PIP containment join VERBATIM -- the stream-static equi-join on the
    bucket key and the Arrow PIP refine both run unchanged under
    Structured Streaming (stateless, append mode), so batch == stream
    by construction (pinned in tests).  The polygon cover index is
    static; Spark re-broadcasts it per micro-batch."""
    from ..operators import spatial_join

    return spatial_join.containment_join_broadcast(
        points, polygons, point_id, lat, lng, extras=extras
    )


def geofence_occupancy(
    points: DataFrame,
    polygons: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    point_id: str = "event_id",
    lat: str = "lat",
    lng: str = "lng",
) -> DataFrame:
    """Windowed per-geofence occupancy: the containment join carries the
    event-time column through the Arrow refine (the watermark re-attaches
    AFTER the join, since custom mapInPandas output drops event-time
    metadata), then a watermarked tumbling-window count per polygon.
    State stays finite at web scale: the join is stateless and the
    windowed aggregation expires by watermark."""
    pts = points.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    hits = streaming_geofence(pts, polygons, point_id, lat, lng, extras=[ts_col])
    src = hits.withWatermark(ts_col, watermark) if hits.isStreaming else hits
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("feature_id"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "feature_id",
            "n",
        )
    )


def geofence_transitions(
    points: DataFrame,
    polygons: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    entity_col: str = "user_id",
    point_id: str = "event_id",
    lat: str = "lat",
    lng: str = "lng",
) -> DataFrame:
    """Enter/exit presence episodes per (entity, geofence) -- the
    stateful twin of geofence_occupancy.  Sampling-based semantics (the
    standard telemetry contract): an entity ENTERS a polygon at its
    first contained sample and EXITS when no contained sample arrives
    for `gap` of event time, so the episode is the island of contained
    samples separated by > gap.

    Streaming input: the containment join (stateless, the same
    stream-static broadcast PIP as streaming_geofence) feeds an
    ``applyInPandasWithState`` keyed by (entity, feature_id) with an
    EventTimeTimeout -- the same session machinery as
    stateful_session_stats -- emitting one row per CLOSED episode.
    State per key is a constant-size triple, so state stays finite at
    web scale and expires by watermark.

    Batch input: the identical islands computed with window functions
    (lag > gap starts a new episode), which is also the shape the
    DuckDB oracle replays -- batch == stream is pinned in
    tests/test_streaming.py.

    Output: (entity, feature_id, enter_ms, exit_ms, n_samples) with
    epoch-millisecond bounds (enter = first, exit = last contained
    sample of the episode)."""
    import pandas as pd

    gap_ms = _duration_s(gap) * 1000
    pts = points.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    hits = streaming_geofence(
        pts, polygons, point_id, lat, lng, extras=[ts_col, entity_col]
    )
    # the entity column keeps its REAL input type (a string device_id
    # must not be silently declared long in the streaming state schema)
    etype = points.schema[entity_col].dataType.simpleString()
    out_schema = (
        f"{entity_col} {etype}, feature_id string, enter_ms long, exit_ms long, "
        "n_samples long"
    )

    if not hits.isStreaming:
        from pyspark.sql.window import Window

        w = Window.partitionBy(entity_col, "feature_id").orderBy("_ms")
        # floor-divided micros: exact integer ms, no double roundoff
        ms = F.expr(f"unix_micros({ts_col}) div 1000")
        marked = hits.select(
            entity_col, "feature_id", ms.alias("_ms")
        ).withColumn(
            "_new",
            (F.lag("_ms").over(w).isNull()
             | (F.col("_ms") - F.lag("_ms").over(w) > gap_ms)).cast("int"),
        ).withColumn(
            "_ep",
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        return marked.groupBy(entity_col, "feature_id", "_ep").agg(
            F.min("_ms").alias("enter_ms"),
            F.max("_ms").alias("exit_ms"),
            F.count("*").alias("n_samples"),
        ).drop("_ep")

    from pyspark.sql.streaming.state import GroupState

    def _emit(key, episodes):
        return pd.DataFrame(
            {
                entity_col: [key[0]] * len(episodes),
                "feature_id": [key[1]] * len(episodes),
                "enter_ms": [e[0] for e in episodes],
                "exit_ms": [e[1] for e in episodes],
                "n_samples": [e[2] for e in episodes],
            }
        )

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            closed = [tuple(state.get)]
            state.remove()
            yield _emit(key, closed)
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        ts = rows[ts_col].astype("int64") // 1_000_000  # ms epoch
        cur = tuple(state.get) if state.exists else None
        closed = []
        for t in ts:
            t = int(t)
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] > gap_ms:
                closed.append(cur)
                cur = (t, t, 1)
            else:
                # min() on enter: cross-batch out-of-order samples within
                # the watermark may precede the open episode's first
                # sample; the batch islands sort globally, so enter_ms
                # must absorb them (t < enter - gap cannot occur -- the
                # watermark delay equals the gap)
                cur = (min(cur[0], t), max(cur[1], t), cur[2] + 1)
        state.update(cur)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(cur[1] + gap_ms, wm + 1, 1))
        if closed:
            yield _emit(key, closed)

    src = hits.withWatermark(ts_col, gap)
    return src.groupBy(entity_col, "feature_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="enter long, last long, n long",
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
