"""Custom stateful streaming operators via ``applyInPandasWithState``
(the escape hatch for semantics Spark's built-in windowed aggs can't
express — SURVEY.md driver north-star item).

State is per group key, bounded by a processing-time timeout; each
micro-batch updates the state with its rows and emits the current
running aggregate. Batch-mode twin: a plain groupBy aggregation (used
by tests to check the final emitted state).
"""

from __future__ import annotations

import sys

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

try:
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


def running_stats_stream(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running (count, sum, mean) maintained across
    micro-batches. Emits one row per key per batch with the updated
    running aggregate — the streaming analogue of
    ``groupBy(key).agg(count, avg)`` with full history."""
    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("mean", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += len(vals)
            total += float(vals.sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n": [n],
                "total": [total],
                "mean": [total / n if n else None],
            }
        )

    return (
        df.select(F.col(key_col).alias("key"), F.col(value_col))
        .groupBy("key")
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def running_stats_batch(df: DataFrame, key_col: str, value_col: str):
    """Batch twin of :func:`running_stats_stream`'s final state."""
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.col(value_col)).alias("n"),
        F.sum(F.col(value_col)).alias("total"),
        F.avg(F.col(value_col)).alias("mean"),
    )


def kmv_distinct_stream(
    df: DataFrame,
    key_col: str,
    hash_col: str,
    k: int = 64,
    mod: int = 2147483647,
) -> DataFrame:
    """Streaming cardinality tracking: a per-key KMV sketch maintained
    across micro-batches (see ``extensions/sketches.py``) — "how many
    distinct fingerprints/tokens has this source produced so far?"
    without unbounded distinct state. State per key is EXACTLY the k
    smallest distinct hashes seen — bounded at k int64s forever, and
    because k-min merge is associative/commutative/idempotent the
    emitted estimate after any micro-batch split equals the batch
    sketch over the same rows: stream==batch holds exactly, not
    approximately (tested).

    Emits (key, n_sketch, est_distinct) per key per batch."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("n_sketch", T.IntegerType()),
            T.StructField("est_distinct", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("kmin", T.ArrayType(T.LongType()))]
    )

    def update(key, pdfs, state: GroupState):
        prev = (
            np.array(state.get[0], dtype="int64")
            if state.exists
            else np.empty(0, dtype="int64")
        )
        for pdf in pdfs:
            vals = pdf[hash_col].dropna().to_numpy(dtype="int64")
            prev = np.unique(np.concatenate([prev, vals]))[:k]
        state.update((prev.tolist(),))
        n = int(len(prev))
        est = (
            float(n)
            if n < k
            else float(k - 1) * float(mod) / float(prev[k - 1])
        )
        yield pd.DataFrame(
            {"key": [key[0]], "n_sketch": [n], "est_distinct": [est]}
        )

    return (
        df.select(
            F.col(key_col).cast("string").alias("key"), F.col(hash_col)
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
