"""Structured Streaming: the same transforms produce identical results in
batch mode and via readStream file source + availableNow trigger."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from diagonal_b6_spark import fixtures
from diagonal_b6_spark.streaming import windows as sw

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """events split into 3 parquet chunks in a stream-source directory."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = fixtures.testdata(spark, SF, "events")
    ev.repartition(3).write.mode("overwrite").parquet(d)
    return d


def _stream(spark, d):
    batch = fixtures.testdata(spark, SF, "events")
    return spark.readStream.schema(batch.schema).parquet(d)


def test_windowed_counts_stream_equals_batch(spark, events_stream_dir):
    batch = fixtures.testdata(spark, SF, "events")
    want = sorted(
        tuple(r)
        for r in sw.windowed_event_counts(batch, window="1 hour")
        .withColumn("total", F.round("total", 2))
        .collect()
    )
    stream = _stream(spark, events_stream_dir)
    got_df = sw.run_stream_to_memory(
        sw.windowed_event_counts(stream, window="1 hour"), "win_counts", spark
    )
    got = sorted(
        tuple(r) for r in got_df.withColumn("total", F.round("total", 2)).collect()
    )
    assert got == want
    assert len(got) > 0


def test_tile_throughput_stream_equals_batch(spark, events_stream_dir):
    from diagonal_b6_spark import catalog

    batch = fixtures.testdata(spark, SF, "events").withColumn(
        "lat", F.expr(catalog.LAT_SQL)
    ).withColumn("lng", F.expr(catalog.LNG_SQL))
    want = sorted(tuple(r) for r in sw.tile_throughput(batch, zoom=12).collect())

    stream = _stream(spark, events_stream_dir).withColumn(
        "lat", F.expr(catalog.LAT_SQL)
    ).withColumn("lng", F.expr(catalog.LNG_SQL))
    got_df = sw.run_stream_to_memory(sw.tile_throughput(stream, zoom=12), "tile_tp", spark)
    got = sorted(tuple(r) for r in got_df.collect())
    assert got == want
    assert len(got) > 0


def test_streaming_dedupe(spark, events_stream_dir):
    batch = fixtures.testdata(spark, SF, "events")
    doubled_dir = events_stream_dir + "_doubled"
    if not os.path.exists(doubled_dir):
        batch.unionByName(batch).repartition(4).write.parquet(doubled_dir)
    stream = spark.readStream.schema(batch.schema).parquet(doubled_dir)
    deduped = sw.streaming_dedupe(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedupe_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("dedupe_out").count() == batch.count()


def test_stateful_sessionization(spark, tmp_path_factory):
    """applyInPandasWithState sessionization: two sessions per user when
    the event gap exceeds the timeout; totals and bounds correct."""
    import datetime as dt

    d = str(tmp_path_factory.mktemp("sess_stream"))
    base = dt.datetime(2024, 1, 1, 8, 0, 0)
    rows = [
        # user 1: burst of 3, then a 2h gap, then 2 more
        (1, base, 1.0), (1, base + dt.timedelta(minutes=5), 2.0),
        (1, base + dt.timedelta(minutes=10), 3.0),
        (1, base + dt.timedelta(hours=2, minutes=10), 4.0),
        (1, base + dt.timedelta(hours=2, minutes=15), 5.0),
        # user 2: one session
        (2, base + dt.timedelta(minutes=1), 10.0),
        # a late "clock advancer" so the watermark passes every gap
        (99, base + dt.timedelta(hours=9), 0.0),
    ]
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).repartition(1).write.mode("overwrite").parquet(d)

    schema = "user_id long, ts timestamp, value double"
    stream = spark.readStream.schema(schema).parquet(d)
    out = sw.stateful_session_stats(stream, gap="30 minutes")
    got_df = sw.run_stream_to_memory(out, "sessions", spark, output_mode="append")
    got = {
        (r["user_id"], r["n_events"]): r
        for r in got_df.collect()
    }
    # closed sessions: user1 first burst (3 events, 6.0) is guaranteed
    # closed by the in-data gap; later sessions close only if the
    # watermark timeout fired before shutdown
    assert (1, 3) in got
    r = got[(1, 3)]
    assert r["total_value"] == pytest.approx(6.0)
    assert r["session_end"] - r["session_start"] == 10 * 60 * 1000


@pytest.fixture(scope="module")
def captions_stream_dir(spark, tmp_path_factory):
    """A 'captions' stream derived from events: each caption trails its
    image by (event_id % 3) minutes, so a 90-second join window admits
    exactly the event_id % 3 in {0, 1} rows."""
    d = str(tmp_path_factory.mktemp("captions_stream"))
    ev = fixtures.testdata(spark, SF, "events")
    caps = ev.select(
        "event_id",
        (F.col("ts").cast("timestamp")
         + F.expr("make_interval(0, 0, 0, 0, 0, event_id % 3, 0)")).alias("ts"),
    )
    caps.repartition(2).write.mode("overwrite").parquet(d)
    return d


def test_stream_interval_join_equals_batch(spark, events_stream_dir, captions_stream_dir):
    batch_l = fixtures.testdata(spark, SF, "events")
    batch_r = spark.read.parquet(captions_stream_dir)
    want = sorted(
        tuple(r)
        for r in sw.stream_interval_join(
            batch_l, batch_r, key="event_id", max_delay="90 seconds"
        ).collect()
    )
    # delays are 0/1/2 min: the 90 s window keeps exactly ids % 3 in {0, 1}
    n_events = batch_l.count()
    assert len(want) == sum(1 for i in range(n_events) if i % 3 in (0, 1))

    sl = _stream(spark, events_stream_dir)
    sr = spark.readStream.schema(batch_r.schema).parquet(captions_stream_dir)
    got_df = sw.run_stream_to_memory(
        sw.stream_interval_join(sl, sr, key="event_id", max_delay="90 seconds"),
        "interval_join",
        spark,
        output_mode="append",
    )
    got = sorted(tuple(r) for r in got_df.collect())
    assert got == want


def test_streaming_geofence_equals_batch(spark, events_stream_dir):
    """The broadcast PIP containment join runs unchanged as a
    stream-static join: per-point containing-polygon pairs from the
    stream equal the batch result row-for-row."""
    from diagonal_b6_spark import catalog
    from diagonal_b6_spark.operators import cover as cover_ops

    feats = fixtures.features_table(spark)

    def pts(df):
        return cover_ops.with_point_cells(
            df.withColumn("lat", F.expr(catalog.LAT_SQL)).withColumn(
                "lng", F.expr(catalog.LNG_SQL)
            )
        )

    batch = pts(fixtures.testdata(spark, SF, "events"))
    want = sorted(
        (r.event_id, r.feature_id)
        for r in sw.streaming_geofence(batch, feats).collect()
    )
    assert len(want) > 0

    stream = pts(_stream(spark, events_stream_dir))
    got_df = sw.run_stream_to_memory(
        sw.streaming_geofence(stream, feats), "geofence_hits", spark,
        output_mode="append",
    )
    got = sorted((r.event_id, r.feature_id) for r in got_df.collect())
    assert got == want


def test_geofence_occupancy_stream_equals_batch(spark, events_stream_dir):
    """Watermarked windowed occupancy per geofence: stream (append mode,
    availableNow) equals the batch groupBy twin."""
    from diagonal_b6_spark import catalog
    from diagonal_b6_spark.operators import cover as cover_ops

    feats = fixtures.features_table(spark)

    def pts(df):
        return cover_ops.with_point_cells(
            df.withColumn("lat", F.expr(catalog.LAT_SQL)).withColumn(
                "lng", F.expr(catalog.LNG_SQL)
            )
        )

    batch = pts(fixtures.testdata(spark, SF, "events"))
    want = sorted(
        tuple(r) for r in sw.geofence_occupancy(batch, feats, window="1 hour").collect()
    )
    assert len(want) > 0

    stream = pts(_stream(spark, events_stream_dir))
    # complete mode: append would withhold windows newer than the final
    # watermark at availableNow termination (same convention as the
    # windowed_event_counts test)
    got_df = sw.run_stream_to_memory(
        sw.geofence_occupancy(stream, feats, window="1 hour"),
        "geofence_occ", spark,
    )
    got = sorted(tuple(r) for r in got_df.collect())
    assert got == want


def test_geofence_transitions_stream_equals_batch(spark, events_stream_dir):
    """Enter/exit presence episodes (r5): the stateful stream emits only
    episodes CLOSED by the event-time timeout before shutdown; every one
    of them must match a batch-islands episode exactly, and the episodes
    guaranteed closed by an in-data gap (> 30 min before the stream's
    final watermark) must all be present."""
    from diagonal_b6_spark import catalog
    from diagonal_b6_spark.operators import cover as cover_ops

    feats = fixtures.features_table(spark)

    def pts(df):
        return cover_ops.with_point_cells(
            df.withColumn("lat", F.expr(catalog.LAT_SQL)).withColumn(
                "lng", F.expr(catalog.LNG_SQL)
            )
        )

    batch = pts(fixtures.testdata(spark, SF, "events"))
    want = {
        (r.user_id, r.feature_id, r.enter_ms, r.exit_ms, r.n_samples)
        for r in sw.geofence_transitions(batch, feats, gap="30 minutes").collect()
    }
    assert len(want) > 0

    stream = pts(_stream(spark, events_stream_dir))
    got_df = sw.run_stream_to_memory(
        sw.geofence_transitions(stream, feats, gap="30 minutes"),
        "geofence_trans", spark, output_mode="append",
    )
    got = {
        (r.user_id, r.feature_id, r.enter_ms, r.exit_ms, r.n_samples)
        for r in got_df.collect()
    }
    # soundness: every stream-closed episode is a batch episode
    assert got <= want, got - want
    # completeness for guaranteed-closed episodes: any batch episode
    # whose exit precedes (final watermark - gap) must have been closed
    batch_hits = sw.streaming_geofence(batch, feats, extras=["ts"])
    max_ms = batch_hits.agg(
        F.expr("max(unix_micros(CAST(ts AS TIMESTAMP))) div 1000")
    ).collect()[0][0]
    gap_ms = 30 * 60 * 1000
    guaranteed = {w for w in want if w[3] + gap_ms < max_ms - gap_ms}
    assert guaranteed <= got, guaranteed - got
