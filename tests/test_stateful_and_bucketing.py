"""Stateful streaming (applyInPandasWithState) and bucketed-join tests."""

import os

import pytest
from pyspark.sql import functions as F

from padua_spark.io_utils import write_bucketed
from padua_spark.plans import explain_str
from padua_spark.streaming.stateful import (
    running_stats_batch,
    running_stats_stream,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_state")
    os.symlink(f"{SF_SMALL}/events.parquet", str(d / "events.parquet"))
    return str(d)


def test_stateful_running_stats_stream(spark, events_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    out = running_stats_stream(stream, "user_id", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("t_running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    # last emitted row per key == batch aggregate
    got = {
        r["key"]: (r["n"], round(r["total"], 6))
        for r in spark.sql(
            "SELECT * FROM t_running"
        ).collect()
    }
    exp = {
        r["key"]: (r["n"], round(r["total"], 6))
        for r in running_stats_batch(batch, "user_id", "value").collect()
    }
    assert got == exp


def test_bucketed_join_no_shuffle(spark, tmp_path):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "t_li_bucketed", ["l_orderkey"], 8)
    write_bucketed(orders, "t_orders_bucketed", ["o_orderkey"], 8)
    a = spark.table("t_li_bucketed")
    b = spark.table("t_orders_bucketed")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.l_orderkey == b.o_orderkey).groupBy(
            "l_orderkey"
        ).agg(F.sum("l_quantity").alias("q"))
        plan = explain_str(joined, mode="simple")
        assert "Exchange" not in plan, plan[:1500]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")


def test_stateful_cusum_stream_equals_batch(spark, events_dir):
    """cusum_stream's final emitted state equals the batch
    cusum_changepoint(..., target=t) over the same events — the
    reflection-identity fold with carried state is exact across
    micro-batch splits."""
    from padua_spark.operators.temporal import cusum_changepoint
    from padua_spark.streaming.stateful import cusum_stream

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    target = 50.0
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    out = cusum_stream(stream, "user_id", "value", "ts", target)
    q = (
        out.writeStream.format("memory")
        .queryName("t_cusum")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        r["key"]: (
            r["n_obs"],
            round(r["cusum_pos_max"], 6),
            round(r["cusum_neg_max"], 6),
            r["cp_pos"],
            r["cp_neg"],
        )
        for r in spark.sql("SELECT * FROM t_cusum").collect()
    }
    exp_df = cusum_changepoint(
        batch.where(F.col("value").isNotNull()),
        ["user_id"],
        ["ts", "event_id"],
        "value",
        target=target,
    )
    exp = {
        r["user_id"]: (
            r["n_obs"],
            round(r["cusum_pos_max"], 6),
            round(r["cusum_neg_max"], 6),
            r["cp_pos"],
            r["cp_neg"],
        )
        for r in exp_df.collect()
    }
    assert got == exp


def test_cusum_fold_chunk_split_invariant():
    """_cusum_fold_chunk equals the sequential textbook recursion for
    EVERY way of splitting the series into chunks — the property that
    makes the streaming operator exact across micro-batch boundaries."""
    import numpy as np

    from padua_spark.streaming.stateful import _cusum_fold_chunk

    rng = np.random.default_rng(7)
    z = rng.normal(0.0, 3.0, 40)
    z[20:] += 4.0  # drift onset

    # ground truth: sequential recursion with first-max positions,
    # at drift=0 AND with a damping allowance k>0 (S+ = max(0, S+z-k),
    # S- = max(0, S-z-k) — k damps BOTH sides)
    for k_allow in (0.0, 0.6):
        sp = sn = spm = snm = 0.0
        cpp = cpn = 0
        for i, zi in enumerate(z, 1):
            sp = max(0.0, sp + zi - k_allow)
            sn = max(0.0, sn - zi - k_allow)
            if sp > spm:
                spm, cpp = sp, i
            if sn > snm:
                snm, cpn = sn, i
        truth = (spm, snm, cpp, cpn)

        for cuts in [[40], [1, 39], [13, 13, 14], [5] * 8, [39, 1]]:
            st = (0.0, 0.0, 0.0, 0.0, 0, 0, 0)
            pos = 0
            for c in cuts:
                st = _cusum_fold_chunk(st, z[pos:pos + c], k_allow)
                pos += c
            got = (st[2], st[3], st[4], st[5])
            assert np.allclose(got[:2], truth[:2], atol=1e-9), (k_allow, cuts)
            assert got[2:] == truth[2:], (k_allow, cuts)
            assert st[6] == 40
