"""Skew-handling primitives (SURVEY.md driver north-star: "skewed keys
hurt … salting for skew").

AQE's skew-join splitting covers sort-merge joins automatically; these
helpers cover the remaining cases — heavily skewed *aggregations* and
broadcast-ineligible skewed joins — with explicit salting:

- salted aggregation: two-phase groupBy where phase 1 fans each hot key
  out over ``n_salts`` partial groups; requires an algebraic aggregate
  (sum/count/min/max or anything with a merge step).
- salted join: replicate the small side per salt so the big side's hot
  key spreads over ``n_salts`` reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof per-key count/sum/mean via two-phase aggregation.

    Phase 1 groups on (key, salt) — hot keys split across ``n_salts``
    reducers; phase 2 merges the tiny partials. Output columns:
    key_cols + n, total, mean.

    The salt comes from a hash of the full row's value (not rand()), so
    the operator stays deterministic under retries.
    """
    salt = F.pmod(
        F.xxhash64(F.col(value_col), *[F.col(c) for c in key_cols]),
        F.lit(n_salts),
    )
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.count(F.col(value_col)).alias("_n"),
            F.sum(F.col(value_col)).alias("_sum"),
        )
    )
    return (
        phase1.groupBy(*key_cols)
        .agg(
            F.sum("_n").alias("n"),
            F.sum("_sum").alias("total"),
        )
        .withColumn(
            "mean",
            F.when(F.col("n") > 0, F.col("total") / F.col("n")),
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the big side's key,
    replicate the small side once per salt value, join on (key, salt).
    The hot key's rows spread over ``n_salts`` reducers instead of one.

    Only ``inner`` and ``left`` are correct under small-side
    replication: with ``right``/``full``, every unmatched small-side
    row would survive once per salt copy, inflating the result
    ``n_salts``-fold.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "salted_join supports how='inner' or 'left' only: the "
            f"replicated small side breaks outer semantics (got {how!r})"
        )
    big_salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
               F.lit(n_salts)),
    )
    small_replicated = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast(
            "array<bigint>"
        )),
    )
    out = big_salted.join(
        small_replicated, on=[key_col, "_salt"], how=how
    )
    return out.drop("_salt")
