"""Round-12 dissection of the pagerank pair's wall time (VERDICT r11
item 1): stage-by-stage floor measurement plus the broadcast-outdeg /
broadcast-orders levers, interleaved A/B in one session.

Stages timed (pagerank_trade shape, sf0.1):
  build_und    lineitem⋈orders → distinct pair frame, persisted + count
  nodes        union-distinct node set + count
  contrib      edge⋈outdeg persist + count  (variant: broadcast outdeg)
  iterate      5 fused broadcast-join iterations + noop write
Run: python tools/pagerank_dissect.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from padua_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def run_variant(spark, broadcast_orders: bool, broadcast_outdeg: bool):
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    stages = {}
    okeys = o.select("o_orderkey", "o_custkey")
    if broadcast_orders:
        okeys = F.broadcast(okeys)
    und = (
        li.select("l_orderkey", "l_suppkey")
        .join(okeys, li["l_orderkey"] == okeys["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("sn"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cn"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stages["build_und"], n_und = t(und.count)
    e = und.select(
        F.col("sn").alias("_s"), F.col("cn").alias("_d")
    ).unionAll(
        und.select(F.col("cn").alias("_s"), F.col("sn").alias("_d"))
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .persist()
    )
    stages["nodes"], n_nodes = t(nodes.count)
    outdeg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_o"))
    if broadcast_outdeg:
        outdeg = F.broadcast(outdeg)
    contrib = e.join(outdeg, on="_s").persist()
    stages["contrib"], _ = t(contrib.count)

    def iterate():
        damping, k_iters, base = 0.85, 5, (1.0 - 0.85) / n_nodes
        od = F.col("_o").cast("double")
        inc = contrib.groupBy(F.col("_d").alias("node")).agg(
            F.sum(F.lit(1.0 / n_nodes) / od).alias("_in")
        )
        for _ in range(k_iters - 1):
            rank_u = F.lit(base) + F.lit(damping) * F.coalesce(
                F.col("_in"), F.lit(0.0)
            )
            inc = (
                contrib.join(
                    F.broadcast(inc), contrib["_s"] == inc["node"], "left"
                )
                .select(F.col("_d").alias("node"), (rank_u / od).alias("_m"))
                .groupBy("node")
                .agg(F.sum("_m").alias("_in"))
            )
        ranks = nodes.join(F.broadcast(inc), on="node", how="left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
            ).alias("rank"),
        )
        ranks.write.format("noop").mode("overwrite").save()

    stages["iterate"], _ = t(iterate)
    stages["total"] = round(sum(stages.values()), 3)
    stages["n_und"], stages["n_nodes"] = n_und, n_nodes
    for d in (und, nodes, contrib):
        d.unpersist()
    return stages


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark(app_name="pagerank_dissect")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    warm.write.format("noop").mode("overwrite").save()
    variants = [
        ("baseline", dict(broadcast_orders=False, broadcast_outdeg=False)),
        ("bcast_outdeg", dict(broadcast_orders=False, broadcast_outdeg=True)),
        ("bcast_both", dict(broadcast_orders=True, broadcast_outdeg=True)),
    ]
    for rep in range(reps):
        for name, kw in variants:
            stages = run_variant(spark, **kw)
            print(f"rep{rep} {name:13s} {stages}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
