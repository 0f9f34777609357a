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
