"""Structured Streaming execution tests: the same windowed-agg plan run
as a real stream (availableNow trigger, memory sink) must equal its
batch execution."""

import os

import pytest
from pyspark.sql import functions as F

from padua_spark.streaming import (
    read_event_stream,
    session_window_agg,
    sessionize_batch,
    tumbling_window_agg,
)
from padua_spark.streaming.windows import nanos_to_timestamp
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # File stream sources require a DIRECTORY; testdata ships single
    # parquet files, so expose one via symlink.
    d = tmp_path_factory.mktemp("events_stream")
    os.symlink(
        f"{SF_SMALL}/events.parquet", str(d / "events.parquet")
    )
    return str(d)


def test_stream_equals_batch_tumbling(spark, events_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)
    assert stream.isStreaming

    def build(df):
        return tumbling_window_agg(
            df,
            nanos_to_timestamp(F.col("ts")),
            ["event_type"],
            [F.count(F.lit(1)).alias("n"),
             F.round(F.avg("value"), 6).alias("avg_value")],
            window_duration="1 hour",
            watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["avg_value"])
        for r in spark.sql("SELECT * FROM t_winagg").collect()
    }
    exp = {
        (r["window_start"], r["event_type"]): (r["n"], r["avg_value"])
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0


def test_session_window_stream_runs(spark, events_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)
    agg = session_window_agg(
        stream,
        nanos_to_timestamp(F.col("ts")),
        ["user_id"],
        [F.count(F.lit(1)).alias("n")],
        gap="30 minutes",
        watermark="2 hours",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    stream_rows = spark.sql(
        "SELECT count(*) AS c, sum(n) AS total FROM t_sessions"
    ).collect()[0]
    # session count must equal the batch lag+cumsum sessionization, and
    # every event lands in exactly one session
    batch_sessions = sessionize_batch(
        batch.select("user_id", "event_id",
                     F.expr("ts DIV 1000").alias("tsu")),
        ["user_id"], "tsu", gap=1_800_000_000,
        tiebreak_cols=["event_id"],
    )
    assert stream_rows["total"] == batch.count()
    assert stream_rows["c"] == batch_sessions.count()


def test_dedup_stream_equals_batch(spark, events_dir):
    """Streaming exact dedup (dropDuplicatesWithinWatermark) keeps one
    row per key and matches the batch dedup key set."""
    from padua_spark.streaming import dedup_stream, read_event_stream

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    deduped = dedup_stream(
        stream,
        ["user_id", "event_type"],
        event_time=nanos_to_timestamp(F.col("ts")),
        watermark="4 hours",
    ).select("user_id", "event_type")
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["user_id"], r["event_type"])
        for r in spark.sql("SELECT * FROM t_dedup").collect()
    }
    exp = {
        (r["user_id"], r["event_type"])
        for r in dedup_stream(
            batch,
            ["user_id", "event_type"],
            event_time=nanos_to_timestamp(F.col("ts")),
        ).select("user_id", "event_type").collect()
    }
    assert got == exp and len(got) > 0
    # streaming emitted exactly one row per key
    n = spark.sql("SELECT count(*) c FROM t_dedup").collect()[0]["c"]
    assert n == len(got)
