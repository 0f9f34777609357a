"""Missing-value imputation (reference: ``padua/imputation.py``).

Determinism contract (SURVEY.md §7.4): the reference uses *unseeded*
``np.random.normal`` (imputation.py:58) — unreproducible, and unsound
under distributed retries. We derive noise deterministically from a key
column via exact integer arithmetic (see
``padua_spark.functions.scalar.deterministic_gaussian``), so imputed
values are identical across runs, partitionings, engines, and task
retries. This is the *correct* distributed semantics, documented as a
deliberate improvement over the reference.
"""

from __future__ import annotations

import sys

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from padua_spark.functions.scalar import deterministic_gaussian

# applyInPandas closures reference this module — serialize by value for
# foreign-cwd executors (see functions/distributions.py).
try:
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


def impute_gaussian(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str | Column,
    width: float = 0.3,
    downshift: float = -1.8,
    seed: int = 0,
    out_col: str | None = None,
    mask_col: str = "imputed",
) -> DataFrame:
    """Perseus-style downshifted-normal imputation (reference:
    ``imputation.gaussian``, imputation.py:14-63): per sample group,
    missing values ← N(mean + downshift·sd, (width·sd)²).

    Plan: per-group mean/sd via one hash agg, broadcast back, then a
    pure projection — the fact table is never shuffled. The boolean
    ``mask_col`` replicates the reference's returned imputation mask.

    ``key_col`` must be a **row-unique** numeric key (e.g. an event or
    measurement id); it drives the deterministic noise, so two rows
    sharing a key value would receive the *same* draw — e.g. a bare
    feature id repeated across samples would correlate every imputed
    cell of that feature, unlike the reference's independent per-cell
    draws. For composite identity, build a unique key first, e.g.
    ``F.xxhash64(feature_id, sample_label)``.
    """
    out_col = out_col or value_col
    v = F.col(value_col)
    stats = df.groupBy(*group_cols).agg(
        F.avg(v).alias("_imp_mean"), F.stddev_samp(v).alias("_imp_sd")
    )
    joined = df.join(F.broadcast(stats), on=group_cols, how="left")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    noise = deterministic_gaussian(key, salt=seed)
    imputed_value = (
        F.col("_imp_mean")
        + F.lit(downshift) * F.col("_imp_sd")
        + F.lit(width) * F.col("_imp_sd") * noise
    )
    return (
        joined.withColumn(mask_col, v.isNull())
        .withColumn(out_col, F.coalesce(v, imputed_value))
        .drop("_imp_mean", "_imp_sd")
    )


def impute_pls(
    df: DataFrame,
    feature_col: str,
    sample_col: str,
    value_col: str,
    n_components: int = 2,
    max_model_features: int = 500,
) -> DataFrame:
    """PLS-regression imputation (reference: ``imputation.pls``,
    imputation.py:66-114 — broken as shipped via removed ``df.ix``; we
    implement the documented intent, SURVEY.md §5).

    Semantics per reference: the model matrix is the set of COMPLETE
    features (no missing values across samples); each incomplete
    feature's trajectory is PLS(2)-regressed on it (NaNs median-filled
    for the fit) and its missing samples predicted from the model.

    Spark shape: the reference's per-protein Python loop
    (imputation.py:96-109, its worst scalability pain point) becomes an
    ``applyInPandas`` grouped map over features — embarrassingly
    parallel, with the (samples × ≤max_model_features) model matrix
    broadcast once. Complete features pass through untouched.
    """
    import numpy as np

    from padua_spark.operators.ml import nipals_pls

    samples = sorted(
        r[0] for r in df.select(sample_col).distinct().collect()
    )
    n_samples = len(samples)
    sidx = {s: i for i, s in enumerate(samples)}
    counts = df.groupBy(feature_col).agg(
        F.count(F.col(value_col)).alias("_n")
    )
    complete_ids = [
        r[0]
        for r in counts.filter(F.col("_n") >= n_samples)
        .orderBy(feature_col)
        .limit(max_model_features)
        .collect()
    ]
    model_rows = (
        df.filter(F.col(feature_col).isin(complete_ids))
        .select(feature_col, sample_col, value_col)
        .collect()
    )
    fidx = {f: i for i, f in enumerate(complete_ids)}
    Xo = np.zeros((n_samples, len(complete_ids)))
    for r in model_rows:
        Xo[sidx[r[1]], fidx[r[0]]] = r[2]
    bc = df.sparkSession.sparkContext.broadcast(
        (Xo, samples)
    )
    schema = T.StructType(
        [
            df.schema[feature_col],
            df.schema[sample_col],
            T.StructField(value_col, T.DoubleType()),
            T.StructField("imputed", T.BooleanType()),
        ]
    )

    def _impute(pdf):
        import numpy as np
        import pandas as pd

        Xo_, samples_ = bc.value
        s_to_i = {s: i for i, s in enumerate(samples_)}
        y = np.full(len(samples_), np.nan)
        for _, row in pdf.iterrows():
            y[s_to_i[row[sample_col]]] = (
                np.nan if row[value_col] is None else row[value_col]
            )
        missing = np.isnan(y)
        out_vals = y.copy()
        if missing.any() and not missing.all() and Xo_.shape[1] > 0:
            y_fit = y.copy()
            y_fit[missing] = np.nanmedian(y)
            k = min(n_components, Xo_.shape[1], len(samples_) - 1)
            T_, W, P, Q = nipals_pls(Xo_, y_fit, n_components=k)
            try:
                B = W @ np.linalg.inv(P.T @ W) @ Q.T
            except np.linalg.LinAlgError:
                B = np.zeros((Xo_.shape[1], 1))
            Xc = Xo_ - Xo_.mean(axis=0)
            preds = Xc @ B[:, 0] + y_fit.mean()
            out_vals[missing] = preds[missing]
        feature_value = pdf[feature_col].iloc[0]
        return pd.DataFrame(
            {
                feature_col: [feature_value] * len(samples_),
                sample_col: samples_,
                value_col: out_vals,
                "imputed": missing,
            }
        )

    return df.groupBy(feature_col).applyInPandas(_impute, schema)
