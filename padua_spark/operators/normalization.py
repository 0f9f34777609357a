"""Normalization (reference: ``padua/normalization.py``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from padua_spark.functions.scalar import nan_and_inf_to_null


def subtract_group_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str | None = None,
    exact: bool = True,
    approx_accuracy: int = 10000,
) -> DataFrame:
    """Median normalization: subtract each group's (= sample column's)
    median from its values (reference: ``padua/normalization.py:4-22``;
    per-column median over the wide matrix ⇔ per-sample median over the
    long table). ±inf coerced to NULL first (normalization.py:17).

    Plan: one hash aggregation on the (small-cardinality) sample key
    computing the exact median, then a broadcast join back — no shuffle
    of the fact table at all. A window over ``partitionBy(sample)``
    would instead shuffle + sort the full fact table; at 100 TB the
    agg+broadcast form wins by a wide margin.

    ``exact=False`` switches to ``percentile_approx`` (a mergeable
    KLL-style sketch): at extreme per-group cardinalities the exact
    median's sort-based aggregation can be traded for a bounded-error
    sketch with pure map-side combine. Default stays exact — it matches
    the reference and is fine up to billions of rows per group.
    """
    out_col = out_col or value_col
    v = nan_and_inf_to_null(value_col)
    med = (
        F.median(v)
        if exact
        else F.percentile_approx(v, 0.5, approx_accuracy)
    )
    medians = df.groupBy(*group_cols).agg(med.alias("_group_median"))
    joined = df.join(F.broadcast(medians), on=group_cols, how="left")
    return joined.withColumn(out_col, v - F.col("_group_median")).drop(
        "_group_median"
    )
