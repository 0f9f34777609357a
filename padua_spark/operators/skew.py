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


def skew_profile(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 20,
) -> DataFrame:
    """Key-skew diagnostic for join/aggregation planning: the
    ``top_k`` heaviest keys with their row counts, share of the
    table, and skew ratio against the mean key size. The first thing
    to run before shuffling 100 TB on a key — a skew_ratio in the
    hundreds means AQE skew-split, salting, or a broadcast rethink.

    Plan: one hash aggregation to per-key counts (map-side partial),
    a 1-row global summary broadcast-crossed back (never a
    partitionless window over the data-sized key frame), and a
    TakeOrdered top-k. Output: ``key_cols + (n_rows, share,
    skew_ratio)`` ordered by n_rows desc.
    """
    counts = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    summary = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    joined = counts.crossJoin(F.broadcast(summary))
    mean_n = F.col("_total").cast("double") / F.col("_n_keys").cast(
        "double"
    )
    return (
        joined.select(
            *key_cols,
            "n_rows",
            (
                F.col("n_rows").cast("double")
                / F.col("_total").cast("double")
            ).alias("share"),
            (F.col("n_rows").cast("double") / mean_n).alias(
                "skew_ratio"
            ),
        )
        .orderBy(
            F.col("n_rows").desc(), *[F.col(c).asc() for c in key_cols]
        )
        .limit(top_k)
    )


def join_cardinality(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
) -> DataFrame:
    """EXACT pre-flight join-size estimate from the two key-count
    tables: ``|A ⋈ B| = Σ_k cA(k)·cB(k)`` — the check to run before
    committing a 100 TB shuffle join, since a single hot key pair can
    make the output quadratic. Costs two key aggregations and a join
    of the (much smaller) count tables — never touches the payload
    columns (column pruning reaches both scans).

    Products and their sum are decimal-exact (cA·cB alone can exceed
    int64 at hot keys). Output 1 row: ``(matched_keys, join_rows,
    max_key_pairs, top_key_share)`` — top_key_share is the largest
    single key's fraction of the join output, the skew headline.
    """
    ca = left.groupBy(F.col(left_key).alias("_k")).agg(
        F.count(F.lit(1)).alias("_ca")
    )
    cb = right.groupBy(F.col(right_key).alias("_k")).agg(
        F.count(F.lit(1)).alias("_cb")
    )
    dec = "decimal(38,0)"
    pairs = ca.join(cb, on="_k").select(
        (F.col("_ca").cast(dec) * F.col("_cb").cast(dec)).alias("_p")
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("matched_keys"),
        F.sum("_p").alias("_rows"),
        F.max("_p").alias("_maxp"),
    )
    return agg.select(
        "matched_keys",
        F.col("_rows").cast("long").alias("join_rows"),
        F.col("_maxp").cast("long").alias("max_key_pairs"),
        F.when(
            F.col("_rows") > 0,
            F.col("_maxp").cast("double") / F.col("_rows").cast("double"),
        ).alias("top_key_share"),
    )
