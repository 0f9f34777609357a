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


def _cusum_fold_chunk(st: tuple, dev, drift: float = 0.0):
    """Fold one ordered chunk of deviations ``dev = v - target`` into
    CUSUM state ``(sp, sn, spm, snm, cpp, cpn, n)`` via the reflection
    identity with the carried S as initial condition —
    chunk-split-invariant (unit-tested against the sequential
    recursion), which is what makes :func:`cusum_stream` exactly equal
    its batch twin. The allowance ``drift`` damps BOTH sides: the
    positive fold accumulates ``dev - drift``, the negative fold
    ``-dev - drift`` (i.e. ``-(dev + drift)``) — mirroring the two
    cumsums of ``operators.temporal.cusum_changepoint``."""
    import numpy as np

    sp, sn, spm, snm, cpp, cpn, n = st

    def _fold(s0: float, zz):
        c = s0 + np.cumsum(zz)
        runmin = np.minimum.accumulate(np.minimum(c, 0.0))
        return c - runmin

    s_pos = _fold(sp, dev - drift)
    s_neg = _fold(sn, -dev - drift)
    bm = float(s_pos.max())
    if bm > spm:
        spm, cpp = bm, n + int(np.argmax(s_pos)) + 1
    bm = float(s_neg.max())
    if bm > snm:
        snm, cpn = bm, n + int(np.argmax(s_neg)) + 1
    return (
        float(s_pos[-1]),
        float(s_neg[-1]),
        spm,
        snm,
        cpp,
        cpn,
        n + len(dev),
    )


def cusum_stream(
    df: DataFrame,
    key_col: str,
    value_col: str,
    order_col: str,
    target: float,
    drift: float = 0.0,
) -> DataFrame:
    """Streaming CUSUM drift monitor: per-key one-sided CUSUM statistics
    against a FIXED reference ``target`` (the control-chart form — an
    online monitor cannot know the series mean in advance), maintained
    exactly across micro-batches.

    State per key is FIVE scalars + two counters (current S+, S-, their
    historical maxima, first-max positions, n) — O(1) forever, no row
    retention. Within each micro-batch rows are sorted by ``order_col``
    and folded with the same reflection identity the batch operator
    uses (vectorized numpy cumsum/accumulate, no per-row Python), with
    the carried S as the initial condition:

    ``s_i = (s0 + c_i) - min(0, running_min(s0 + c))``

    so after any micro-batch split the emitted statistics equal
    ``operators.temporal.cusum_changepoint(..., target=target)`` over
    the same rows — stream == batch holds exactly (tested). Assumes
    in-order arrival across batches (the file-source replay and any
    watermarked upstream satisfy this).

    Emits ``(key, n_obs, cusum_pos_max, cusum_neg_max, cp_pos,
    cp_neg)`` per key per batch.
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("n_obs", T.LongType()),
            T.StructField("cusum_pos_max", T.DoubleType()),
            T.StructField("cusum_neg_max", T.DoubleType()),
            T.StructField("cp_pos", T.LongType()),
            T.StructField("cp_neg", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("sp", T.DoubleType()),
            T.StructField("sn", T.DoubleType()),
            T.StructField("spm", T.DoubleType()),
            T.StructField("snm", T.DoubleType()),
            T.StructField("cpp", T.LongType()),
            T.StructField("cpn", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        st = (
            state.get if state.exists
            else (0.0, 0.0, 0.0, 0.0, 0, 0, 0)
        )
        for pdf in pdfs:
            pdf = pdf.dropna(subset=[value_col]).sort_values(order_col)
            if not len(pdf):
                continue
            dev = pdf[value_col].to_numpy(dtype="float64") - float(target)
            st = _cusum_fold_chunk(st, dev, float(drift))
        state.update(st)
        sp, sn, spm, snm, cpp, cpn, n = st
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_obs": [n],
                "cusum_pos_max": [spm],
                "cusum_neg_max": [snm],
                "cp_pos": [cpp],
                "cp_neg": [cpn],
            }
        )

    return (
        df.select(
            F.col(key_col).alias("key"),
            F.col(value_col),
            F.col(order_col),
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
