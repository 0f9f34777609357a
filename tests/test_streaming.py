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
from padua_spark.streaming.windows import epoch_us_col, event_time_col
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
            event_time_col(df),
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


def test_stream_equals_batch_sliding(spark, events_dir):
    from padua_spark.streaming import sliding_window_agg

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        return sliding_window_agg(
            df,
            event_time_col(df),
            ["event_type"],
            [F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 6).alias("sum_value")],
            window_duration="1 hour",
            slide_duration="30 minutes",
            watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_slideagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM t_slideagg").collect()
    }
    exp = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # every event lands in exactly window/slide = 2 windows
    n_events = batch.count()
    assert sum(v[0] for v in exp.values()) == 2 * n_events


def test_session_window_stream_runs(spark, events_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)
    agg = session_window_agg(
        stream,
        event_time_col(stream),
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
                     epoch_us_col(batch).alias("tsu")),
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
        event_time=event_time_col(stream),
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
            event_time=event_time_col(batch),
        ).select("user_id", "event_type").collect()
    }
    assert got == exp and len(got) > 0
    # streaming emitted exactly one row per key
    n = spark.sql("SELECT count(*) c FROM t_dedup").collect()[0]["c"]
    assert n == len(got)


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory, spark):
    # sf0.001 documents have no exact duplicates and no sub-threshold
    # docs, so plant both: copies of doc 0/1 under new ids + a short doc
    d = str(tmp_path_factory.mktemp("docs_stream"))
    base = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    planted = (
        base.limit(2)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        .union(
            spark.createDataFrame(
                [(2_000_000, "too short", "en", "srcX", 9)],
                "doc_id long, text string, lang string, "
                "source string, n_chars long",
            )
        )
    )
    base.unionByName(planted).coalesce(1).write.mode("overwrite").parquet(d)
    return d


def test_curate_stream_equals_batch(spark, docs_dir):
    """Streaming curation (quality gate + watermarked fingerprint
    dedup) run as a real stream matches its batch twin's surviving doc
    set, and duplicates collapse to one row."""
    from padua_spark.extensions.curation import curate_stream

    batch = spark.read.parquet(docs_dir)
    # +1 day: an event time of exactly epoch 0 equals the operator's
    # INITIAL watermark and is discarded as late by the stateful dedup
    et = F.timestamp_micros(
        (F.col("doc_id") * 1000 + 86_400_000_000).cast("bigint")
    )
    stream = (
        spark.readStream.schema(batch.schema).parquet(docs_dir)
    )
    out = curate_stream(
        stream, "doc_id", "text", event_time=et, min_tokens=5
    ).select("doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("t_curate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    from padua_spark.extensions.text import fingerprint

    def fp_set(df):
        return {
            r["fp"]
            for r in df.join(batch, on="doc_id").select(
                fingerprint(F.col("text")).alias("fp")
            ).collect()
        }

    got_df = spark.sql("SELECT * FROM t_curate")
    exp_df = curate_stream(
        batch, "doc_id", "text", event_time=et, min_tokens=5
    ).select("doc_id")
    # the dedup KEY SET (fingerprints) must match exactly; which member
    # of a duplicate group survives is first-arrival in the stream vs
    # min-event-time in batch, so doc_ids may differ within a group
    got, exp = fp_set(got_df), fp_set(exp_df)
    assert got == exp and len(got) > 0
    assert got_df.count() == len(got)  # one survivor per fingerprint
    assert len(got) < batch.count()  # gate + dedup actually dropped rows


def test_ingest_stream_incremental_novelty(spark, tmp_path):
    """foreachBatch incremental ingestion: micro-batches arriving later
    must not re-ingest texts already in the corpus (cross-batch
    fingerprint dedup), and each batch self-dedupes. Forced into
    multiple micro-batches via maxFilesPerTrigger=1."""
    import pandas as pd

    from padua_spark.extensions.curation import ingest_stream

    src = tmp_path / "src"
    src.mkdir()
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    # file names order batch arrival; batch b must see a's output
    pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["alpha beta", "alpha beta", "gamma"]}
    ).to_parquet(src / "a.parquet")
    pd.DataFrame(
        {"doc_id": [4, 5], "text": ["Alpha   Beta", "delta"]}
    ).to_parquet(src / "b.parquet")

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        ingest_stream(stream, "doc_id", "text", corpus, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    # 1 kept (2 is an in-batch dup), 3 kept, 4 dropped (normalizes to
    # doc 1's text if batches ordered a→b; if b ran first, 1 drops
    # instead), 5 kept
    assert len(got) == 3
    assert 3 in got and 5 in got
    assert (1 in got) != (4 in got)


def test_kmv_stream_equals_batch_exactly(spark, tmp_path):
    """Streaming KMV cardinality: because k-min merge is associative,
    commutative, and idempotent, the final streamed sketch equals the
    batch sketch over the same rows EXACTLY — regardless of
    micro-batch boundaries (forced via maxFilesPerTrigger=1)."""
    import pandas as pd

    from padua_spark.extensions.sketches import kmv_distinct
    from padua_spark.streaming.stateful import kmv_distinct_stream

    src = tmp_path / "ksrc"
    src.mkdir()
    rows_a = [("g1", (i * 2654435761) % 2147483647) for i in range(400)]
    rows_b = [("g1", (i * 48271) % 2147483647) for i in range(400)]
    rows_b += [("g2", (i * 16807 + 3) % 2147483647) for i in range(50)]
    pd.DataFrame(rows_a, columns=["g", "h"]).to_parquet(src / "a.parquet")
    pd.DataFrame(rows_b, columns=["g", "h"]).to_parquet(src / "b.parquet")

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        kmv_distinct_stream(stream, "g", "h", k=64)
        .writeStream.format("memory")
        .queryName("t_kmv")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    # last emitted row per key = final state
    got = {}
    for r in spark.sql(
        "SELECT * FROM t_kmv"
    ).collect():
        got[r.key] = (r.n_sketch, r.est_distinct)  # later rows overwrite
    batch = {
        r.g: (r.n_sketch, r.est_distinct)
        for r in kmv_distinct(
            spark.read.parquet(str(src)), ["g"], "h", k=64
        ).withColumnRenamed("g", "g").collect()
    }
    assert got == batch


def test_stream_equals_batch_interval_join(spark, events_dir):
    """Stream-stream interval join (watermarked both sides, bounded
    range, append mode) equals its batch execution."""
    from padua_spark.streaming import interval_join

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def sides(df):
        e = df.select(
            "user_id", "event_id", "event_type",
            event_time_col(df).alias("et"),
        )
        views = e.where(F.col("event_type") == "view").select(
            "user_id", F.col("event_id").alias("view_id"),
            F.col("et").alias("vt"),
        )
        purchases = e.where(F.col("event_type") == "purchase").select(
            "user_id", F.col("event_id").alias("purchase_id"),
            F.col("et").alias("pt"),
        )
        return views, purchases

    def build(df, watermark):
        v, p = sides(df)
        return interval_join(
            v, p, ["user_id"], F.col("vt"), F.col("pt"),
            lower="0 seconds", upper="30 minutes", watermark=watermark,
        ).select("user_id", "view_id", "purchase_id")

    q = (
        build(stream, "2 hours")
        .writeStream.format("memory")
        .queryName("t_ivjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["user_id"], r["view_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM t_ivjoin").collect()
    }
    exp = {
        (r["user_id"], r["view_id"], r["purchase_id"])
        for r in build(batch, None).collect()
    }
    assert got == exp and len(exp) > 0


def test_incremental_agg_maintenance(spark, events_dir, tmp_path):
    """Lakehouse pattern: a foreachBatch sink maintains a per-key
    aggregate state table by merging each micro-batch's partial
    aggregate with setops.upsert. After the stream drains, the state
    table equals the one-shot batch aggregate EXACTLY (integer
    micro-units, so partial-merge order can't drift)."""
    from padua_spark.operators.setops import upsert

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    state_dir = str(tmp_path / "agg_state")

    def agg(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("value") * 1_000_000).cast("bigint")
            ).alias("total_micro"),
        )

    def merge_batch(bdf, batch_id):
        part = agg(bdf)
        s = bdf.sparkSession
        try:
            prev = s.read.parquet(state_dir)
        except Exception:
            prev = None
        if prev is None:
            merged = part
        else:
            # combine: sum overlapping keys, then upsert into state
            merged = (
                prev.unionByName(part)
                .groupBy("event_type")
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("total_micro").alias("total_micro"),
                )
            )
            merged = upsert(prev, merged, ["event_type"])
        merged.write.mode("overwrite").parquet(state_dir + "_next")
        # swap (test-local; a lake deployment repoints the catalog)
        import shutil

        shutil.rmtree(state_dir, ignore_errors=True)
        shutil.move(state_dir + "_next", state_dir)

    stream = read_event_stream(
        spark, events_dir, schema=batch.schema, max_files_per_trigger=1
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        r["event_type"]: (r["n"], r["total_micro"])
        for r in spark.read.parquet(state_dir).collect()
    }
    exp = {
        r["event_type"]: (r["n"], r["total_micro"])
        for r in agg(batch).collect()
    }
    assert got == exp and len(got) > 0


def test_stream_equals_batch_windowed_histogram(spark, events_dir):
    """The drift monitor's front half (windowed bin counts) is one
    stateful aggregation: identical output on stream and batch, and
    the PSI finalizer over those counts matches the batch-only path."""
    from padua_spark.extensions.quality import psi_vs_reference
    from padua_spark.streaming import windowed_value_histogram

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        return windowed_value_histogram(
            df, event_time_col(df), "value",
            lo=0.0, hi=500.0, n_bins=10,
            window_duration="1 hour", watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winhist")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["window_start"], r["bin"]): r["n"]
        for r in spark.sql("SELECT * FROM t_winhist").collect()
    }
    exp = {
        (r["window_start"], r["bin"]): r["n"]
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # finalize PSI from the streamed counts == from the batch counts
    sc = spark.sql(
        "SELECT CAST(window_start AS LONG) AS ws, bin, n FROM t_winhist"
    )
    bc = build(batch).select(
        F.col("window_start").cast("long").alias("ws"), "bin", "n"
    )
    ref = bc.groupBy("bin").agg(F.sum("n").alias("ref_n"))
    a = {r["ws"]: round(r["psi"], 9) for r in
         psi_vs_reference(sc, ref, 10, ["ws"]).collect()}
    b = {r["ws"]: round(r["psi"], 9) for r in
         psi_vs_reference(bc, ref, 10, ["ws"]).collect()}
    assert a == b and len(a) > 0


def test_stream_equals_batch_windowed_cms(spark, events_dir):
    """The windowed count-min sketch is one stateful aggregation:
    identical (window, j, bucket, cnt) grid on stream and batch, and
    the per-window state is capped at depth*width rows."""
    from padua_spark.streaming import windowed_cms_sketch

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)
    depth, width = 4, 64

    def build(df):
        return windowed_cms_sketch(
            df,
            event_time_col(df),
            F.get_json_object(F.col("props"), "$.k"),
            depth=depth,
            width=width,
            window_duration="1 day",
            watermark="2 days",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_wincms")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["window_start"], r["j"], r["bucket"]): r["cnt"]
        for r in spark.sql("SELECT * FROM t_wincms").collect()
    }
    exp = {
        (r["window_start"], r["j"], r["bucket"]): r["cnt"]
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # state cap: per (window, j) at most `width` buckets
    from collections import Counter

    per_line = Counter((w, j) for (w, j, _b) in got)
    assert max(per_line.values()) <= width


def test_stream_equals_batch_windowed_ddsketch(spark, events_dir):
    """The windowed DDSketch is one stateful aggregation: identical
    (window, bucket, n) grid on stream and batch; finalizing the
    streamed counts with ddsketch_quantiles matches the batch
    finalize; per-window state stays bucket-bounded."""
    from padua_spark.extensions.sketches import ddsketch_quantiles
    from padua_spark.streaming import windowed_ddsketch

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)
    alpha = 0.01

    def build(df):
        return windowed_ddsketch(
            df,
            event_time_col(df),
            F.col("value"),
            relative_accuracy=alpha,
            window_duration="1 day",
            watermark="2 days",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winddsk")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["window_start"], r["bucket"]): r["n"]
        for r in spark.sql("SELECT * FROM t_winddsk").collect()
    }
    exp = {
        (r["window_start"], r["bucket"]): r["n"]
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # finalize: streamed counts -> same quantiles as batch counts
    sc = spark.sql(
        "SELECT CAST(window_start AS LONG) AS ws, bucket, n "
        "FROM t_winddsk"
    )
    bc = build(batch).select(
        F.col("window_start").cast("long").alias("ws"), "bucket", "n"
    )
    a = {
        (r["ws"], r["q"]): r["estimate"]
        for r in ddsketch_quantiles(
            sc, ["ws"], [0.5, 0.95], alpha
        ).collect()
    }
    b = {
        (r["ws"], r["q"]): r["estimate"]
        for r in ddsketch_quantiles(
            bc, ["ws"], [0.5, 0.95], alpha
        ).collect()
    }
    assert a == b and len(a) > 0
    # state cap: bucket rows per window bounded by the value range's
    # decade span, not the event count
    from collections import Counter

    per_win = Counter(ws for ws, _ in got)
    assert max(per_win.values()) < 3000


def test_stream_equals_batch_windowed_token_counts(spark, events_dir):
    """The JS/Hellinger drift monitor's front half (windowed token
    counts) is one stateful aggregation: identical output on stream
    and batch, and the divergence finalizer over the streamed counts
    matches the batch-only path."""
    from padua_spark.streaming import (
        js_hellinger_vs_reference,
        windowed_token_counts,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        return windowed_token_counts(
            df, event_time_col(df), "props",
            window_duration="1 hour", watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_wintok")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["window_start"], r["token"]): r["n"]
        for r in spark.sql("SELECT * FROM t_wintok").collect()
    }
    exp = {
        (r["window_start"], r["token"]): r["n"]
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    sc = spark.sql(
        "SELECT CAST(window_start AS LONG) AS ws, token, n "
        "FROM t_wintok"
    )
    bc = build(batch).select(
        F.col("window_start").cast("long").alias("ws"), "token", "n"
    )
    ref = bc.groupBy("token").agg(
        F.sum("n").cast("bigint").alias("ref_n")
    )
    a = {
        r["ws"]: (r["js_divergence"], r["hellinger"], r["n_tokens"])
        for r in js_hellinger_vs_reference(sc, ref, 20, ["ws"]).collect()
    }
    b = {
        r["ws"]: (r["js_divergence"], r["hellinger"], r["n_tokens"])
        for r in js_hellinger_vs_reference(bc, ref, 20, ["ws"]).collect()
    }
    assert a == b and len(a) > 0
    import math

    for js, hel, _ in a.values():
        assert 0.0 <= js <= math.log(2) + 1e-9
        assert 0.0 <= hel <= 1.0


def test_stream_equals_batch_windowed_confusion(spark, events_dir):
    """The windowed confusion battery is one stateful aggregation to
    four exact integers per window: identical counts AND identical
    closed-form metrics on stream and batch; metrics agree with the
    batch confusion_stats on the same hourly keys."""
    from padua_spark.extensions.quality import confusion_stats
    from padua_spark.streaming import windowed_confusion

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        return windowed_confusion(
            df, event_time_col(df),
            (F.col("value") > 100.0).cast("int"),
            F.col("event_type").isin("click", "view").cast("int"),
            window_duration="1 hour", watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winconf")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    cols = ["tp", "fp", "fn", "tn", "accuracy", "precision",
            "recall", "f1", "mcc"]
    got = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM t_winconf").collect()
    }
    exp = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # the windowed metrics equal batch confusion_stats keyed by hour
    hourly = batch.withColumn(
        "_h", F.date_trunc("hour", event_time_col(batch))
    ).withColumn(
        "_p", (F.col("value") > 100.0).cast("int")
    ).withColumn(
        "_y", F.col("event_type").isin("click", "view").cast("int")
    )
    ref = {
        r["_h"]: tuple(r[c] for c in cols)
        for r in confusion_stats(hourly, ["_h"], "_p", "_y").collect()
    }
    assert got == ref


def test_stream_equals_batch_windowed_ece(spark, events_dir):
    """Windowed ECE/MCE is one stateful aggregation over
    compile-time bin columns: identical summary on stream and batch,
    and the division-free ECE equals a numpy binned replica."""
    import numpy as np

    from padua_spark.streaming import windowed_ece

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        return windowed_ece(
            df, event_time_col(df),
            F.least(
                F.lit(1.0),
                F.greatest(F.lit(0.0), F.col("value") / 200.0),
            ),
            F.col("event_type").isin("click", "view").cast("int"),
            window_duration="1 hour", watermark="2 hours",
            n_bins=10,
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winece")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        r["window_start"]: (r["n"], r["ece"], r["mce"])
        for r in spark.sql("SELECT * FROM t_winece").collect()
    }
    exp = {
        r["window_start"]: (r["n"], r["ece"], r["mce"])
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # numpy replica on one hour's rows
    ws = sorted(got)[0]
    rows = (
        batch.withColumn("_t", event_time_col(batch))
        .where(
            (F.date_trunc("hour", F.col("_t")) == F.lit(ws))
            & F.col("value").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select("value", "event_type")
        .collect()
    )
    p = np.clip(np.array([r["value"] for r in rows]) / 200.0, 0, 1)
    y = np.array(
        [r["event_type"] in ("click", "view") for r in rows],
        dtype=float,
    )
    bins = np.minimum(9, np.floor(p * 10).astype(int))
    num = 0.0
    mce = 0.0
    for k in range(10):
        m = bins == k
        if m.sum() == 0:
            continue
        num += abs(p[m].sum() - y[m].sum())
        mce = max(mce, abs(p[m].sum() - y[m].sum()) / m.sum())
    assert got[ws][0] == len(rows)
    assert got[ws][1] == pytest.approx(num / len(rows), abs=1e-6)
    assert got[ws][2] == pytest.approx(mce, abs=1e-6)


def test_stream_equals_batch_windowed_binned_auc(spark, events_dir):
    """Windowed binned AUC: stream == batch, and the binned midrank
    formula equals the exact tie-aware AUC of the QUANTIZED scores
    computed by a numpy rank replica."""
    import numpy as np

    from padua_spark.streaming import windowed_binned_auc

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        return windowed_binned_auc(
            df, event_time_col(df),
            F.least(
                F.lit(1.0),
                F.greatest(F.lit(0.0), F.col("value") / 200.0),
            ),
            F.col("event_type").isin("click", "view").cast("int"),
            window_duration="1 hour", watermark="2 hours",
            n_bins=64,
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winauc")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        r["window_start"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in spark.sql("SELECT * FROM t_winauc").collect()
    }
    exp = {
        r["window_start"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # exact midrank AUC of the quantized scores (scipy-free replica),
    # on the first window where BOTH classes appear (single-class
    # windows correctly emit NULL auc)
    ws = sorted(
        w for w, (np_, nn_, _) in got.items() if np_ > 0 and nn_ > 0
    )[0]
    rows = (
        batch.withColumn("_t", event_time_col(batch))
        .where(
            (F.date_trunc("hour", F.col("_t")) == F.lit(ws))
            & F.col("value").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select("value", "event_type")
        .collect()
    )
    s = np.clip(np.array([r["value"] for r in rows]) / 200.0, 0, 1)
    y = np.array(
        [r["event_type"] in ("click", "view") for r in rows],
        dtype=int,
    )
    b = np.minimum(63, np.floor(s * 64).astype(int)).astype(float)
    order = np.argsort(b, kind="stable")
    sb, sy = b[order], y[order]
    ranks = np.empty(len(sb))
    i = 0
    while i < len(sb):
        j = i
        while j < len(sb) and sb[j] == sb[i]:
            j += 1
        ranks[i:j] = (i + 1 + j) / 2.0  # midrank of the tie block
        i = j
    n_pos, n_neg = int(y.sum()), int((1 - y).sum())
    auc = (ranks[sy == 1].sum() - n_pos * (n_pos + 1) / 2.0) / (
        n_pos * n_neg
    )
    assert got[ws][0] == n_pos and got[ws][1] == n_neg
    assert got[ws][2] == pytest.approx(auc, abs=1e-6)


def test_stream_equals_batch_windowed_quality_screen(spark, docs_dir):
    """The windowed Gopher screen is one stateful aggregation to nine
    exact integers per window: identical counts on stream and batch,
    and the window sums reconcile with the batch gopher_rules flags
    on the same hourly keys."""
    from padua_spark.extensions.quality import gopher_rules
    from padua_spark.streaming import windowed_quality_screen

    batch = spark.read.parquet(docs_dir)
    stream = spark.readStream.schema(batch.schema).parquet(docs_dir)
    et = F.timestamp_seconds(F.col("doc_id") * 60)

    def build(df):
        return windowed_quality_screen(
            df.withColumn("_ts", et), F.col("_ts"), "text",
            window_duration="1 hour", watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winqual")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    cols = [
        "n_docs", "n_pass", "pass_rate", "fail_word_count",
        "fail_mean_word_len", "fail_symbol_ratio", "fail_bullet",
        "fail_ellipsis", "fail_alpha", "fail_stopwords",
    ]
    got = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM t_winqual").collect()
    }
    exp = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 1
    # window totals reconcile with the batch rule battery
    flags = gopher_rules(
        batch.where(F.col("text").isNotNull()).withColumn("_ts", et),
        "text",
    ).withColumn("_h", F.date_trunc("hour", F.col("_ts")))
    ref = {
        r["_h"]: (r["n"], r["p"])
        for r in flags.groupBy("_h").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("quality_pass").cast("int")).alias("p"),
        ).collect()
    }
    for ws, vals in got.items():
        assert ref[ws][0] == vals[0] and ref[ws][1] == vals[1]


def test_stream_equals_batch_windowed_novelty(spark, docs_dir):
    """Windowed n-gram novelty is a stream-static left join plus one
    two-integer stateful aggregation: identical windows on stream and
    batch, and the window sums reconcile with batch ngram_novelty on
    the same hourly keys."""
    from padua_spark.extensions.dedup import ngram_novelty
    from padua_spark.streaming import windowed_novelty

    batch = spark.read.parquet(docs_dir)
    ref = batch.where(F.col("doc_id") % 7 == 0)
    stream = spark.readStream.schema(batch.schema).parquet(docs_dir)
    et = F.timestamp_seconds(F.col("doc_id") * 60)

    def build(df):
        tr = df.where(F.col("doc_id") % 7 != 0).withColumn("_ts", et)
        return windowed_novelty(
            tr, F.col("_ts"), "text", ref, n_tokens=5,
            window_duration="1 hour", watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winnov")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    cols = ["n_ngrams", "n_novel", "novelty_rate"]
    got = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM t_winnov").collect()
    }
    exp = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 1
    # window sums reconcile with the batch per-doc operator
    tr = batch.where(F.col("doc_id") % 7 != 0)
    per_doc = ngram_novelty(
        tr, ref, "doc_id", "text", n_tokens=5
    ).withColumn("_h", F.date_trunc("hour", et))
    ref_sums = {
        r["_h"]: (r["s1"], r["s2"])
        for r in per_doc.groupBy("_h").agg(
            F.sum("n_ngrams").alias("s1"),
            F.sum("n_novel").alias("s2"),
        ).collect()
    }
    for ws, vals in got.items():
        assert ref_sums[ws] == (vals[0], vals[1])


def test_stream_equals_batch_windowed_circular(spark, events_dir):
    """Windowed circular stats are one three-sum stateful
    aggregation: identical windows on stream and batch, and the
    closed-form finalizer matches the batch rayleigh_uniformity on
    the same daily keys."""
    from padua_spark.operators.temporal import rayleigh_uniformity
    from padua_spark.streaming import windowed_circular_stats

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        us = epoch_us_col(df, "ts")
        withts = df.where(F.col("ts").isNotNull()).select(
            F.timestamp_micros(us).alias("_et"),
            (
                2.0 * 3.141592653589793
                * (
                    (us % 86400000000).cast("double") / 86400000000.0
                )
            ).alias("theta"),
        )
        return windowed_circular_stats(
            withts, F.col("_et"), F.col("theta"),
            window_duration="1 day", watermark="2 days",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_wincirc")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    cols = [
        "n", "mean_direction", "r_bar", "circ_variance",
        "rayleigh_z", "p_value",
    ]
    got = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM t_wincirc").collect()
    }
    exp = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in build(batch).collect()
    }
    assert got == exp and len(got) >= 1
    # reconcile one window against the batch operator on its slice
    us = epoch_us_col(batch, "ts")
    day0 = sorted(got)[0]
    import calendar

    day0_us = calendar.timegm(day0.timetuple()) * 1_000_000
    sl = batch.where(F.col("ts").isNotNull()).where(
        (us >= day0_us) & (us < day0_us + 86400000000)
    ).select(
        (
            2.0 * 3.141592653589793
            * ((us % 86400000000).cast("double") / 86400000000.0)
        ).alias("theta")
    )
    ref = rayleigh_uniformity(sl, "theta").collect()[0]
    assert got[day0][0] == ref["n"]
    assert got[day0][2] == ref["r_bar"]


def test_stream_equals_batch_windowed_average_precision(
    spark, events_dir
):
    """Windowed binned AP: stream == batch, and the high-to-low fold
    equals a numpy replica of step-interpolated AP over the quantized
    scores (sklearn convention, whole bin admitted per threshold)."""
    import numpy as np

    from padua_spark.streaming import windowed_average_precision

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        return windowed_average_precision(
            df, event_time_col(df),
            F.least(
                F.lit(1.0),
                F.greatest(F.lit(0.0), F.col("value") / 200.0),
            ),
            F.col("event_type").isin("click", "view").cast("int"),
            window_duration="1 hour", watermark="2 hours",
            n_bins=64,
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winap")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        r["window_start"]: (
            r["n_pos"], r["n_neg"], r["average_precision"]
        )
        for r in spark.sql("SELECT * FROM t_winap").collect()
    }
    exp = {
        r["window_start"]: (
            r["n_pos"], r["n_neg"], r["average_precision"]
        )
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    ws = sorted(
        w for w, (np_, nn_, _) in got.items() if np_ > 0 and nn_ > 0
    )[0]
    rows = (
        batch.withColumn("_t", event_time_col(batch))
        .where(
            (F.date_trunc("hour", F.col("_t")) == F.lit(ws))
            & F.col("value").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select("value", "event_type")
        .collect()
    )
    p = np.clip(np.array([r["value"] for r in rows]) / 200.0, 0, 1)
    y = np.array(
        [r["event_type"] in ("click", "view") for r in rows],
        dtype=float,
    )
    bins = np.minimum(63, np.floor(p * 64).astype(int))
    tp = fp = 0.0
    num = 0.0
    for k in range(63, -1, -1):
        m = bins == k
        pk = y[m].sum()
        gk = m.sum() - pk
        tp += pk
        fp += gk
        if pk > 0:
            num += pk * tp / (tp + fp)
    assert got[ws][0] == y.sum()
    assert got[ws][2] == pytest.approx(num / y.sum(), abs=1e-6)


def test_stream_equals_batch_windowed_pinball(spark, events_dir):
    """Windowed pinball loss + coverage: stream == batch, and the
    per-window values match a pandas replica (cents + dyadic
    quantiles so sums are exact)."""
    import numpy as np

    from padua_spark.streaming import windowed_pinball_loss

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        cents = F.round(F.col("value") * 100).cast("double")
        return windowed_pinball_loss(
            df.where(F.col("value").isNotNull()),
            event_time_col(df),
            cents,
            {0.5: cents * 0.5, 0.75: cents * 1.5},
            window_duration="1 hour", watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winpin")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["window_start"], r["quantile"]): (
            r["n"], r["pinball"], r["coverage"]
        )
        for r in spark.sql("SELECT * FROM t_winpin").collect()
    }
    exp = {
        (r["window_start"], r["quantile"]): (
            r["n"], r["pinball"], r["coverage"]
        )
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # replica on one non-empty window at q=0.75 (forecast = 1.5a:
    # always covering, loss = 0.25*0.5a per row)
    ws = sorted(w for (w, qq), (n, _, _) in got.items() if n > 0)[0]
    rows = (
        batch.withColumn("_t", event_time_col(batch))
        .where(
            (F.date_trunc("hour", F.col("_t")) == F.lit(ws))
            & F.col("value").isNotNull()
        )
        .select("value")
        .collect()
    )
    a = np.round(np.array([r["value"] for r in rows]) * 100)
    loss75 = 0.25 * (1.5 * a - a)
    n, p, c = got[(ws, 0.75)]
    assert n == len(a)
    assert p == pytest.approx(loss75.mean(), abs=2e-6)
    assert c == pytest.approx(1.0, abs=1e-9)


def test_stream_equals_batch_windowed_control_check(
    spark, events_dir
):
    """Windowed SPC check: stream == batch; flags match a pandas
    replica on a window with known breaches."""
    import numpy as np

    from padua_spark.streaming import windowed_control_check

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        cents = F.round(F.col("value") * 100).cast("double")
        return windowed_control_check(
            df.where(F.col("value").isNotNull()),
            event_time_col(df), cents,
            center=10000.0, ucl=15000.0, lcl=2000.0,
            window_duration="1 hour", watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winctl")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        r["window_start"]: (
            r["n"], r["mean"], r["n_above_ucl"], r["n_below_lcl"],
            r["frac_out"], r["mean_out"],
        )
        for r in spark.sql("SELECT * FROM t_winctl").collect()
    }
    exp = {
        r["window_start"]: (
            r["n"], r["mean"], r["n_above_ucl"], r["n_below_lcl"],
            r["frac_out"], r["mean_out"],
        )
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    ws = sorted(got)[0]
    rows = (
        batch.withColumn("_t", event_time_col(batch))
        .where(
            (F.date_trunc("hour", F.col("_t")) == F.lit(ws))
            & F.col("value").isNotNull()
        )
        .select("value")
        .collect()
    )
    v = np.round(np.array([r["value"] for r in rows]) * 100)
    n, mean, above, below, frac, mo = got[ws]
    assert n == len(v)
    assert mean == pytest.approx(v.mean(), abs=1e-6)
    assert above == (v > 15000).sum()
    assert below == (v < 2000).sum()
    assert frac == pytest.approx(
        ((v > 15000) | (v < 2000)).mean(), abs=1e-6
    )
    assert mo == bool(v.mean() > 15000 or v.mean() < 2000)


def test_stream_equals_batch_windowed_fairness(spark, events_dir):
    """Windowed fairness monitor: stream == batch; reference-group
    gaps are 0 by construction; a planted per-group prediction skew
    shows in dp_gap."""
    from padua_spark.streaming import windowed_fairness_check

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        base = df.where(
            F.col("user_id").isNotNull() & F.col("value").isNotNull()
        )
        return windowed_fairness_check(
            base,
            event_time_col(base),
            (F.col("user_id") % 2).cast("bigint"),
            [0, 1],
            F.col("event_type").isin("click", "view").cast("int"),
            # planted skew: group 1's threshold is easier
            (
                F.col("value")
                > F.when(F.col("user_id") % 2 == 1, 50.0)
                .otherwise(120.0)
            ).cast("int"),
            0,
            window_duration="1 hour", watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winfair")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["window_start"], r["group"]): (
            r["n"], r["ppr"], r["dp_gap"], r["tpr_gap"]
        )
        for r in spark.sql("SELECT * FROM t_winfair").collect()
    }
    exp = {
        (r["window_start"], r["group"]): (
            r["n"], r["ppr"], r["dp_gap"], r["tpr_gap"]
        )
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # reference rows: zero gaps; skewed group: positive dp_gap in
    # windows where both groups have data
    # reference rows carry zero gaps wherever defined; group-1 gaps
    # are defined whenever both groups have data (per-window sign is
    # noise at ~1 event/hour in the smoke fixture, so the skew's
    # direction is asserted in test_units' batch fairness test)
    ref_defined = [
        w for (w, g) in got if g == 0 and got[(w, 0)][1] is not None
    ]
    assert ref_defined
    for w in ref_defined:
        assert got[(w, 0)][2] == 0.0
    both = [
        w for (w, g) in got
        if g == 1 and got[(w, 0)][0] > 0 and got[(w, 1)][0] > 0
    ]
    assert both
    for w in both:
        assert got[(w, 1)][2] is not None


def test_stream_equals_batch_windowed_gains_table(spark, events_dir):
    """Windowed gains table: stream == batch on every per-bucket row;
    cumulative capture hits 1.0 at the last non-empty bucket of each
    window and pos_rate is weakly better in bucket 1 than the window
    base rate for a score positively tied to the label."""
    from padua_spark.streaming import windowed_gains_table

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        base = df.where(F.col("value").isNotNull())
        return windowed_gains_table(
            base,
            event_time_col(base),
            F.least(
                F.lit(1.0),
                F.greatest(F.lit(0.0), F.col("value") / 200.0),
            ),
            F.col("event_type").isin("click", "view").cast("int"),
            window_duration="1 hour", watermark="2 hours",
            n_bins=64, n_buckets=4,
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_wingains")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["window_start"], r["bucket"]): (
            r["n"], r["n_pos"], r["pos_rate"], r["lift"],
            r["cum_capture"], r["cum_lift"],
        )
        for r in spark.sql("SELECT * FROM t_wingains").collect()
    }
    exp = {
        (r["window_start"], r["bucket"]): (
            r["n"], r["n_pos"], r["pos_rate"], r["lift"],
            r["cum_capture"], r["cum_lift"],
        )
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # per window: bucket counts sum to the window's row count and
    # cum_capture at the deepest non-empty bucket is 1.0 whenever the
    # window has positives
    windows = {w for (w, b) in got}
    for w in windows:
        buckets = sorted(b for (ww, b) in got if ww == w)
        n_w = sum(got[(w, b)][0] for b in buckets)
        p_w = sum(got[(w, b)][1] for b in buckets)
        assert n_w > 0
        if p_w > 0:
            assert got[(w, buckets[-1])][4] == pytest.approx(1.0)


def test_windowed_gains_table_matches_batch_gains_on_lattice(spark):
    """CONTRACT: on scores that sit exactly on the bin lattice (no
    straddling), the streaming quantized gains table equals the exact
    batch gains_table bucket-for-bucket (same boundary law)."""
    import datetime

    from padua_spark.extensions.features import gains_table
    from padua_spark.streaming import windowed_gains_table

    rows = []
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    # 40 rows in one hour, scores on the 1/64 lattice (bin centers
    # never straddle), labels correlated with score
    for i in range(40):
        s = (i % 32) * 2 / 64.0
        y = 1 if (i % 32) >= 20 else 0
        rows.append((t0 + datetime.timedelta(minutes=i), float(s), y))
    df = spark.createDataFrame(rows, ["ts", "s", "y"])
    streamed = windowed_gains_table(
        df, F.col("ts"), F.col("s"), F.col("y"),
        window_duration="1 hour", n_bins=64, n_buckets=5,
    ).collect()
    exact = {
        r["bucket"]: (r["n"], r["n_pos"], r["pos_rate"],
                      r["cum_capture"], r["cum_lift"])
        for r in gains_table(df, "s", "y", n_bins=5).collect()
    }
    assert len(streamed) > 0
    got = {
        r["bucket"]: (r["n"], r["n_pos"], r["pos_rate"],
                      r["cum_capture"], r["cum_lift"])
        for r in streamed
    }
    assert got == exact


def test_stream_equals_batch_windowed_srm(spark, events_dir):
    """Windowed SRM monitor: stream == batch on every window row; a
    deliberately skewed declared ratio flags, the true even split
    doesn't flag anywhere near as hard."""
    from padua_spark.streaming import windowed_srm

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df, ratios=None):
        base = df.where(F.col("user_id").isNotNull())
        return windowed_srm(
            base,
            event_time_col(base),
            F.col("user_id") % 2,
            [0, 1],
            expected_ratios=ratios,
            window_duration="1 hour", watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winsrm")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        r["window_start"]: (
            r["n"], r["n_arm_0"], r["n_arm_1"], r["chi2"],
            r["p_value"], r["srm_flag_1pct"],
        )
        for r in spark.sql("SELECT * FROM t_winsrm").collect()
    }
    exp = {
        r["window_start"]: (
            r["n"], r["n_arm_0"], r["n_arm_1"], r["chi2"],
            r["p_value"], r["srm_flag_1pct"],
        )
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # chi2 replica on one window
    w0 = sorted(got)[0]
    n, n0, n1, chi2, p, flag = got[w0]
    e = 0.5 * n
    assert chi2 == pytest.approx(
        (n0 - e) ** 2 / e + (n1 - e) ** 2 / e, abs=1e-6
    )
    # grossly skewed declared ratios must flag harder than the truth
    skewed = {
        r["window_start"]: r["chi2"]
        for r in build(batch, ratios=[0.9, 0.1]).collect()
    }
    assert sum(skewed.values()) > sum(v[3] for v in got.values())


def test_stream_equals_batch_windowed_binned_gini(spark, events_dir):
    """Windowed binned Gini: stream == batch on every window row;
    values in [0, 1/3] of the bins give the same statistic as a
    dense grouped-Gini replica."""
    import numpy as np

    from padua_spark.streaming import windowed_binned_gini

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        base = df.where(F.col("value").isNotNull())
        return windowed_binned_gini(
            base,
            event_time_col(base),
            F.least(
                F.lit(1.0),
                F.greatest(F.lit(0.0), F.col("value") / 200.0),
            ),
            window_duration="1 hour", watermark="2 hours",
            n_bins=64,
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_wingini")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        r["window_start"]: (r["n"], r["total"], r["gini_binned"])
        for r in spark.sql("SELECT * FROM t_wingini").collect()
    }
    exp = {
        r["window_start"]: (r["n"], r["total"], r["gini_binned"])
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # dense grouped replica on a synthetic single-window frame
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    vals = np.array([0.1] * 50 + [0.9] * 5)  # concentrated mass
    dfv = spark.createDataFrame(
        [(t0, float(v)) for v in vals], ["ts", "v"]
    )
    r = windowed_binned_gini(
        dfv, F.col("ts"), F.col("v"), window_duration="1 hour",
        n_bins=64,
    ).collect()[0]
    # grouped replica over the quantized bins
    bins = np.minimum(63, np.floor(vals * 64)).astype(int)
    order = np.argsort(bins, kind="mergesort")
    import collections

    agg = collections.OrderedDict()
    for b in sorted(set(bins)):
        sel = vals[bins == b]
        agg[b] = (len(sel), sel.sum())
    n, st = len(vals), vals.sum()
    cum, acc = 0.0, 0.0
    for b, (c, s) in agg.items():
        acc += (c / n) * (cum / st + (cum + s) / st)
        cum += s
    assert r["gini_binned"] == pytest.approx(1.0 - acc, abs=1e-6)
    assert r["gini_binned"] > 0.2  # concentration detected


def test_stream_equals_batch_windowed_embedding_drift(spark, events_dir):
    """Windowed embedding drift: stream == batch; a synthetic frame
    whose vectors equal the reference has zero L2 and cosine 1; a
    shifted window reports the planted distance."""
    import datetime

    from padua_spark.streaming import windowed_embedding_drift

    ref = [1.0, 0.0, 2.0]
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(t0, [1.0, 0.0, 2.0])] * 10 + [
        (t0 + datetime.timedelta(hours=2), [2.0, 0.0, 2.0])
    ] * 4
    df = spark.createDataFrame(rows, ["ts", "vec"])
    out = {
        r["window_start"].hour: r
        for r in windowed_embedding_drift(
            df, F.col("ts"), F.col("vec"), ref,
            window_duration="1 hour",
        ).collect()
    }
    assert out[0]["l2_distance"] == pytest.approx(0.0)
    assert out[0]["cosine_sim"] == pytest.approx(1.0)
    assert out[2]["l2_distance"] == pytest.approx(1.0)  # +1 in dim 0
    assert out[2]["n"] == 4
    # stream == batch over the real events fixture with a 3-dim
    # deterministic synthetic vector derived from value
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(d):
        base = d.where(F.col("value").isNotNull())
        vec = F.array(
            F.col("value") / 200.0,
            (F.col("user_id") % 7).cast("double"),
            F.lit(1.0),
        )
        return windowed_embedding_drift(
            base.withColumn("_vec", vec),
            event_time_col(base), F.col("_vec"),
            [0.5, 3.0, 1.0],
            window_duration="1 hour", watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_windrift")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        r["window_start"]: (r["n"], r["l2_distance"], r["cosine_sim"])
        for r in spark.sql("SELECT * FROM t_windrift").collect()
    }
    exp = {
        r["window_start"]: (r["n"], r["l2_distance"], r["cosine_sim"])
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0


def test_stream_equals_batch_windowed_benford(spark, events_dir):
    """Windowed Benford audit: stream == batch on every window row;
    digit counts sum to n, chi2 replicated from the pinned Benford
    probabilities on one window."""
    from padua_spark.streaming.windows import _BENFORD_P, windowed_benford

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        return windowed_benford(
            df,
            event_time_col(df),
            F.round(F.col("value").cast("double") * 100).cast("bigint"),
            window_duration="1 hour",
            watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winbenford")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    cols = (
        ["n"] + [f"n_d{d}" for d in range(1, 10)]
        + ["chi2", "p_value", "mad", "nonconforming_mad"]
    )
    got = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM t_winbenford").collect()
    }
    exp = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # replica on one window
    w0 = sorted(got)[0]
    vals = dict(zip(cols, got[w0]))
    assert sum(vals[f"n_d{d}"] for d in range(1, 10)) == vals["n"]
    chi2 = sum(
        (vals[f"n_d{d}"] - _BENFORD_P[d - 1] * vals["n"]) ** 2
        / (_BENFORD_P[d - 1] * vals["n"])
        for d in range(1, 10)
    )
    assert vals["chi2"] == pytest.approx(chi2, abs=1e-5)
    mad = sum(
        abs(vals[f"n_d{d}"] / vals["n"] - _BENFORD_P[d - 1])
        for d in range(1, 10)
    ) / 9.0
    assert vals["mad"] == pytest.approx(mad, abs=1e-6)
    assert vals["nonconforming_mad"] == (mad > 0.015)


def test_stream_equals_batch_windowed_concentration(spark, events_dir):
    """Windowed HHI concentration: stream == batch on every window
    row; HHI / effective_n / top_share replicated from the per-key
    counts on one window."""
    from padua_spark.streaming.windows import windowed_concentration

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)
    keys = ["click", "error", "purchase", "signup", "view"]

    def build(df):
        return windowed_concentration(
            df,
            event_time_col(df),
            F.col("event_type"),
            keys,
            window_duration="1 hour",
            watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winconc")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    cols = ["n", "n_other", "hhi", "effective_n", "top_share"]
    got = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM t_winconc").collect()
    }
    exp = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # replica on one window from raw batch counts
    import datetime

    w0 = sorted(got)[0]
    w1 = w0 + datetime.timedelta(hours=1)
    sub = (
        batch.where(F.col("value").isNotNull() | F.lit(True))
        .select(event_time_col(batch).alias("_t"), "event_type")
        .where((F.col("_t") >= w0) & (F.col("_t") < w1))
        .groupBy("event_type").count().collect()
    )
    counts = {r["event_type"]: r["count"] for r in sub}
    n = sum(counts.get(k, 0) for k in keys)
    shares = [counts.get(k, 0) / n for k in keys]
    hhi = sum(s * s for s in shares)
    vals = dict(zip(cols, got[w0]))
    assert vals["n"] == n
    assert vals["hhi"] == pytest.approx(hhi, abs=1e-6)
    assert vals["effective_n"] == pytest.approx(1.0 / hhi, abs=1e-5)
    assert vals["top_share"] == pytest.approx(max(shares), abs=1e-6)


def test_stream_equals_batch_windowed_binned_ks(spark, events_dir):
    """Windowed binned KS: stream == batch on every window row; the
    max CDF gap replicated from raw edge counts on one window, and a
    deliberately wrong reference CDF flags harder than a fitted one."""
    from padua_spark.streaming.windows import windowed_binned_ks

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)
    edges = [15.0, 35.0, 70.0, 150.0]
    ref = [0.25, 0.5, 0.75, 0.95]

    def build(df, cdf=None):
        return windowed_binned_ks(
            df,
            event_time_col(df),
            F.col("value"),
            bin_edges=edges,
            reference_cdf=cdf or ref,
            window_duration="1 hour",
            watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winbks")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    cols = ["n", "ks_stat", "critical_5pct", "drift_flag_5pct"]
    got = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM t_winbks").collect()
    }
    exp = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    # replica on one window
    import datetime

    w0 = sorted(got)[0]
    w1 = w0 + datetime.timedelta(hours=1)
    sub = (
        batch.where(F.col("value").isNotNull())
        .select(
            event_time_col(batch).alias("_t"),
            F.col("value").cast("double").alias("_v"),
        )
        .where((F.col("_t") >= w0) & (F.col("_t") < w1))
        .collect()
    )
    vs = [r["_v"] for r in sub]
    n = len(vs)
    ks = max(
        abs(sum(1 for v in vs if v <= e) / n - r0)
        for e, r0 in zip(edges, ref)
    )
    vals = dict(zip(cols, got[w0]))
    assert vals["n"] == n
    assert vals["ks_stat"] == pytest.approx(ks, abs=1e-6)
    assert vals["critical_5pct"] == pytest.approx(
        1.36 / n ** 0.5, abs=1e-6
    )
    assert vals["drift_flag_5pct"] == (ks > 1.36 / n ** 0.5)
    # an absurd reference CDF must produce a larger total KS
    absurd = {
        r["window_start"]: r["ks_stat"]
        for r in build(batch, cdf=[0.01, 0.02, 0.03, 0.04]).collect()
    }
    assert sum(absurd.values()) > sum(v[1] for v in got.values())


def test_stream_equals_batch_windowed_extremes(spark, events_dir):
    """Windowed extremes/POT monitor: stream == batch on every window
    row; exceedance stats replicated from raw values on one window."""
    from padua_spark.streaming.windows import windowed_extremes

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)

    def build(df):
        return windowed_extremes(
            df, event_time_col(df), F.col("value"), threshold=150.0,
            window_duration="1 hour", watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winext")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    cols = ["n", "v_max", "v_min", "n_exceed", "mean_excess",
            "max_excess"]
    got = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM t_winext").collect()
    }
    exp = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    import datetime

    w0 = sorted(got)[0]
    w1 = w0 + datetime.timedelta(hours=1)
    vs = [
        r["_v"]
        for r in batch.where(F.col("value").isNotNull())
        .select(
            event_time_col(batch).alias("_t"),
            F.col("value").cast("double").alias("_v"),
        )
        .where((F.col("_t") >= w0) & (F.col("_t") < w1))
        .collect()
    ]
    vals = dict(zip(cols, got[w0]))
    exc = [v - 150.0 for v in vs if v > 150.0]
    assert vals["n"] == len(vs)
    assert vals["v_max"] == pytest.approx(max(vs), abs=1e-6)
    assert vals["v_min"] == pytest.approx(min(vs), abs=1e-6)
    assert vals["n_exceed"] == len(exc)
    if exc:
        assert vals["mean_excess"] == pytest.approx(
            sum(exc) / len(exc), abs=1e-6
        )
        assert vals["max_excess"] == pytest.approx(max(exc), abs=1e-6)


def test_stream_equals_batch_windowed_entropy(spark, events_dir):
    """Windowed entropy monitor: stream == batch on every window row;
    entropy replicated from per-key counts on one window, and a
    single-key-dominated synthetic window scores lower entropy."""
    import math

    from padua_spark.streaming.windows import windowed_entropy

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = read_event_stream(spark, events_dir, schema=batch.schema)
    keys = ["click", "error", "purchase", "signup", "view"]

    def build(df):
        return windowed_entropy(
            df, event_time_col(df), F.col("event_type"), keys,
            window_duration="1 hour", watermark="2 hours",
        )

    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName("t_winent")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    cols = ["n", "n_other", "entropy_nats", "entropy_norm",
            "effective_alphabet"]
    got = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM t_winent").collect()
    }
    exp = {
        r["window_start"]: tuple(r[c] for c in cols)
        for r in build(batch).collect()
    }
    assert got == exp and len(got) > 0
    import datetime

    w0 = sorted(got)[0]
    w1 = w0 + datetime.timedelta(hours=1)
    counts = {
        r["event_type"]: r["count"]
        for r in batch.select(
            event_time_col(batch).alias("_t"), "event_type"
        )
        .where((F.col("_t") >= w0) & (F.col("_t") < w1))
        .groupBy("event_type").count().collect()
    }
    n = sum(counts.get(k, 0) for k in keys)
    h = -sum(
        (counts.get(k, 0) / n) * math.log(counts.get(k, 0) / n)
        for k in keys if counts.get(k, 0) > 0
    )
    vals = dict(zip(cols, got[w0]))
    assert vals["n"] == n
    assert vals["entropy_nats"] == pytest.approx(h, abs=1e-6)
    assert vals["entropy_norm"] == pytest.approx(
        h / math.log(len(keys)), abs=1e-6
    )
    assert vals["effective_alphabet"] == pytest.approx(
        math.exp(h), abs=1e-5
    )
    # dominated synthetic window scores lower than the observed mix
    t0 = datetime.datetime(2030, 1, 1)
    dom = spark.createDataFrame(
        [(t0, "click")] * 96 + [(t0, k) for k in keys[1:]],
        ["ts", "event_type"],
    )
    r = windowed_entropy(
        dom, F.col("ts"), F.col("event_type"), keys,
        window_duration="1 hour",
    ).collect()[0]
    assert r["entropy_nats"] < vals["entropy_nats"]
