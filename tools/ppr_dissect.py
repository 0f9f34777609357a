"""Round-13 dissection of personalized_pagerank's wall time (VERDICT
r12 item 1): the trade shape got its floor measured in round 12
(tools/pagerank_dissect.py); the personalized shape never did, and it
sits at 1.73x the probe-sum vs the trade's 1.31x. This replays the
EXACT __spark_entry__.q_personalized_pagerank shape stage by stage so
the residual can be attributed (extra stages: seed distinct, seed-flag
fuse, per-iteration restart-mass term, label re-render projection).

Stages timed (sf0.1 unless SPARK_GRAFT_SF_DIR):
  build_und   lineitem broadcast-join orders -> int-id pair distinct,
              persist + count (identical to the trade shape)
  seeds       und.select(sn).distinct() -> op-internal distinct+persist
              + count
  nodes       union-distinct over 2x edges + seeds, broadcast seed
              flag, persist + the op's count/seed-count agg
  contrib     edge join broadcast-outdeg join broadcast-seed-flag,
              persist + count (the op defers this to iteration 1)
  iterate     5 fused broadcast-join iterations + label render + noop

Also prints the 3 bench.py calibration probes (scan/shuffle/window)
per rep so every wall can be read as a probe-sum multiple.
Run: python tools/ppr_dissect.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark import StorageLevel
from pyspark.sql import functions as F

from padua_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def run(spark):
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    stages = {}
    okeys = F.broadcast(o.select("o_orderkey", "o_custkey"))
    und = (
        li.select("l_orderkey", "l_suppkey")
        .join(okeys, li["l_orderkey"] == okeys["o_orderkey"])
        .select(
            (F.col("l_suppkey").cast("long") + 1).alias("sn"),
            (-F.col("o_custkey").cast("long") - 1).alias("cn"),
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
    sd = (
        und.select(F.col("sn").alias("node"))
        .distinct()
        .where(F.col("node").isNotNull())
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stages["seeds"], _ = t(sd.count)
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .union(sd.select("node"))
        .distinct()
        .join(
            F.broadcast(sd.withColumn("_seed", F.lit(True))),
            "node",
            "left",
        )
        .select(
            "node",
            F.coalesce(F.col("_seed"), F.lit(False)).alias("is_seed"),
        )
        .persist()
    )

    def nodes_agg():
        row = nodes.agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("is_seed").cast("int")).alias("_ns"),
        ).collect()[0]
        return row["_n"], row["_ns"] or 0

    stages["nodes"], (n_nodes, n_seeds) = t(nodes_agg)
    outdeg = F.broadcast(
        e.groupBy("_s").agg(F.count(F.lit(1)).alias("_o"))
    )
    # lever probe: PPR_COALESCE=n shrinks the cached contribution
    # table's partition count (e is 2x und's 32 shuffle partitions =
    # 64 cached partitions of ~18k rows at sf0.1 — tiny tasks)
    ncoal = int(os.environ.get("PPR_COALESCE", "0"))
    esrc = e.coalesce(ncoal) if ncoal else e
    contrib = (
        esrc.join(outdeg, on="_s")
        .join(
            F.broadcast(
                sd.select(
                    F.col("node").alias("_s"),
                    F.lit(True).alias("_sseed"),
                )
            ),
            on="_s",
            how="left",
        )
        .select(
            "_s", "_d", "_o",
            F.coalesce(F.col("_sseed"), F.lit(False)).alias("_sseed"),
        )
        .persist()
    )
    stages["contrib"], _ = t(contrib.count)

    def iterate():
        damping, k_iters = 0.85, 5
        od = F.col("_o").cast("double")
        src_mass = F.when(
            F.col("_sseed"), F.lit(1.0 / n_seeds)
        ).otherwise(F.lit(0.0))
        inc = (
            contrib.where(F.col("_sseed"))
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum(F.lit(1.0 / n_seeds) / od).alias("_in"))
        )
        for _ in range(k_iters - 1):
            rank_u = F.lit(1.0 - damping) * src_mass + F.lit(
                damping
            ) * F.coalesce(F.col("_in"), F.lit(0.0))
            inc = (
                contrib.join(
                    F.broadcast(inc),
                    contrib["_s"] == inc["node"],
                    "left",
                )
                .select(
                    F.col("_d").alias("node"),
                    (rank_u / od).alias("_m"),
                )
                .groupBy("node")
                .agg(F.sum("_m").alias("_in"))
            )
        seed_mass = F.when(
            F.col("is_seed"), F.lit(1.0 / n_seeds)
        ).otherwise(F.lit(0.0))
        out = nodes.join(
            F.broadcast(inc), on="node", how="left"
        ).select(
            "node",
            (
                F.lit(1.0 - damping) * seed_mass
                + F.lit(damping)
                * F.coalesce(F.col("_in"), F.lit(0.0))
            ).alias("rank"),
            "is_seed",
        )
        res = out.select(
            F.when(
                F.col("node") > 0,
                F.concat(F.lit("s"), F.col("node") - 1),
            )
            .otherwise(F.concat(F.lit("c"), -F.col("node") - 1))
            .alias("node"),
            F.round("rank", 9).alias("rank"),
            "is_seed",
        )
        res.write.format("noop").mode("overwrite").save()

    stages["iterate"], _ = t(iterate)
    stages["total"] = round(
        sum(v for k, v in stages.items() if k != "total"), 3
    )
    stages["n_und"], stages["n_nodes"], stages["n_seeds"] = (
        n_und, n_nodes, n_seeds,
    )
    for d in (und, sd, nodes, contrib):
        d.unpersist()
    return stages


def main():
    import bench

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ppr_dissect")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    warm.write.format("noop").mode("overwrite").save()
    for rep in range(reps):
        probes = bench._calibration_probes(spark)
        psum = round(sum(probes.values()), 3)
        stages = run(spark)
        ratio = round(stages["total"] / psum, 2) if psum else None
        print(
            f"rep{rep} probes={probes} probe_sum={psum} "
            f"stages={stages} total/probe_sum={ratio}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
