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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from padua_spark.functions.scalar import deterministic_gaussian


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

    ``key_col`` must be a numeric row key (e.g. feature id); it drives
    the deterministic noise.
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
