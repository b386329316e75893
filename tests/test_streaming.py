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
