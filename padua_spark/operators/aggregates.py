"""Aggregation operators (reference: SURVEY.md §2.5 — padua's QC
summaries, enrichment ratios, group collapses).

Every operator is a single hash aggregation (partial+final map-side
combine for free); outputs are small summary tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from padua_spark.functions.scalar import protein_id


def non_zero_sum(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Sum of strictly-positive values per group (reference:
    ``analysis._non_zero_sum``, analysis.py:221-229)."""
    v = F.col(value_col)
    return df.groupBy(*group_cols).agg(
        F.sum(F.when(v > 0, v)).alias("nonzero_sum")
    )


def enrichment(
    df: DataFrame,
    group_cols: list[str],
    flag: Column,
    value_col: str,
) -> DataFrame:
    """Fraction of summed intensity attributable to a modification flag
    (reference: ``analysis.enrichment_from_evidence`` analysis.py:232-258
    and ``enrichment_from_msp`` analysis.py:263-287 — flag rows by
    substring, sum per (group, flag), ratio modified/total). Zeros are
    treated as missing (analysis.py:280: 0 → NaN).

    One conditional aggregation — no pivot needed.
    """
    v = F.when(F.col(value_col) != 0, F.col(value_col))
    return df.groupBy(*group_cols).agg(
        F.sum(F.when(flag, v).otherwise(0.0)).alias("modified_sum"),
        F.sum(F.when(~flag, v).otherwise(0.0)).alias("unmodified_sum"),
        (
            F.sum(F.when(flag, v).otherwise(0.0))
            / F.sum(F.coalesce(v, F.lit(0.0)))
        ).alias("enrichment"),
    )


def sites_peptides_proteins(
    df: DataFrame,
    locprob_col: str = "Localization prob",
    seqwindow_col: str = "Sequence window",
    proteins_col: str = "Proteins",
    site_localization_probability: float = 0.75,
) -> DataFrame:
    """Three summary counts in one pass (reference:
    ``analysis.sitespeptidesproteins``, analysis.py:291-309): sites with
    localization ≥ threshold, distinct sequence windows (peptides),
    distinct leading proteins."""
    return df.agg(
        F.count(
            F.when(
                F.col(locprob_col) >= site_localization_probability, 1
            )
        ).alias("sites"),
        F.countDistinct(F.col(seqwindow_col)).alias("peptides"),
        F.countDistinct(protein_id(proteins_col)).alias("proteins"),
    )


def value_counts(df: DataFrame, col: str) -> DataFrame:
    """Category histogram (reference: ``analysis.modifiedaminoacids``
    value_counts, analysis.py:312-333)."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias("count"))


def quality_control_counts(
    df: DataFrame, flag_cols: list[str], flag_value: str = "+"
) -> DataFrame:
    """Per-flag '+' counts plus total, single pass (reference:
    ``visualize.quality_control``, visualize.py:1625-1662)."""
    aggs = [
        F.count(F.when(F.col(c) == flag_value, 1)).alias(
            c.lower().replace(" ", "_") + "_count"
        )
        for c in flag_cols
    ]
    aggs.append(F.count(F.lit(1)).alias("total_count"))
    return df.agg(*aggs)


def collapse_technical_replicates(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    stat: str = "median",
) -> DataFrame:
    """Collapse the Technical level by per-key median (reference
    workflow step ``df.median(axis=1, level=[0,1,2])``, SURVEY.md §2.5
    A9). ``stat`` ∈ {median, mean}. The median path uses the relational
    sort-based exact median (see
    :func:`padua_spark.operators.normalization.group_medians`) instead
    of Spark's object-buffering Median aggregate."""
    v = F.col(value_col)
    if stat == "median":
        from padua_spark.operators.normalization import group_medians

        # group_medians drops all-NULL groups (it filters NULL values
        # before grouping); rejoin against the full key set so those
        # groups come back as (key, NULL) — same key set as F.median
        # and as the stat='mean' path.
        keys = df.groupBy(*key_cols).agg(
            F.lit(1).alias("_present")
        ).drop("_present")
        return keys.join(
            group_medians(df, key_cols, v, value_col),
            on=key_cols,
            how="left",
        )
    return df.groupBy(*key_cols).agg(F.avg(v).alias(value_col))


def group_mean_ratio(
    df: DataFrame,
    feature_cols: list[str],
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    log2_out: bool = True,
) -> DataFrame:
    """Per-feature ratio of group means (reference: A10 —
    ``df[a].mean(axis=1) / df[c].mean(axis=1)``, io.py:176,
    visualize.py:534-539). Conditional aggregations — one pass, no
    self-join."""
    va = F.when(F.col(group_col) == F.lit(group_a), F.col(value_col))
    vb = F.when(F.col(group_col) == F.lit(group_b), F.col(value_col))
    agg = df.groupBy(*feature_cols).agg(
        F.avg(va).alias("mean_a"), F.avg(vb).alias("mean_b")
    )
    ratio = F.when(F.col("mean_b") != 0, F.col("mean_a") / F.col("mean_b"))
    out = agg.withColumn("ratio", ratio)
    if log2_out:
        out = out.withColumn(
            "log2_ratio", F.when(F.col("ratio") > 0, F.log2(F.col("ratio")))
        )
    return out


def localization_class_counts(
    df: DataFrame, locprob_col: str = "Localization prob"
) -> DataFrame:
    """Perseus class I/II/III binning: (0.75,1], (0.5,0.75], (0.25,0.5]
    (reference: visualize.py:756-777)."""
    p = F.col(locprob_col)
    bucket = (
        F.when(p > 0.75, "Class I")
        .when(p > 0.5, "Class II")
        .when(p > 0.25, "Class III")
        .otherwise("Unclassified")
    )
    return (
        df.withColumn("loc_class", bucket)
        .groupBy("loc_class")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Fixed-width histogram (reference: ``np.histogram`` uses,
    visualize.py:1374-1385). ``floor((v-lo)/w)`` bucketing keeps the
    expression portable (same arithmetic in any SQL engine); values at
    ``hi`` fold into the last bin like numpy."""
    v = F.col(value_col)
    w = (hi - lo) / n_bins
    bucket = F.least(
        F.floor((v - F.lit(lo)) / F.lit(w)), F.lit(n_bins - 1)
    ).cast("int")
    return (
        df.filter(v.isNotNull() & (v >= lo) & (v <= hi))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def pairwise_correlation(
    df: DataFrame,
    sample_col: str,
    feature_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Pairwise-complete Pearson correlation between all sample pairs
    (reference: ``analysis.correlation``, analysis.py:26-48 —
    ``np.ma.corrcoef`` masked semantics).

    Self-join on the feature key aligns each pair's values; ``F.corr``
    ignores null pairs — exactly the masked-pairwise semantics. The join
    is feature-key-partitioned (co-partitioned shuffle once), output is
    n_samples² rows (tiny). For very wide sample counts prefer
    assembling per-sample vectors + ``Correlation.corr`` — at padua
    scale (≤ dozens of samples) the self-join is simpler and exact.
    """
    left = df.select(
        *[F.col(c) for c in feature_cols],
        F.col(sample_col).alias("sample_x"),
        F.col(value_col).alias("_vx"),
    )
    right = df.select(
        *[F.col(c) for c in feature_cols],
        F.col(sample_col).alias("sample_y"),
        F.col(value_col).alias("_vy"),
    )
    pairs = left.join(right, on=feature_cols)
    return (
        pairs.groupBy("sample_x", "sample_y")
        .agg(F.corr("_vx", "_vy").alias("pearson_r"))
    )


def correlation_significance(
    df: DataFrame,
    sample_col: str,
    feature_cols: list[str],
    value_col: str,
) -> DataFrame:
    """:func:`pairwise_correlation` plus the significance test the
    reference leaves to the reader: under H₀ (ρ=0),
    ``t = r·√(n−2)/√(1−r²) ~ t(n−2)`` with n the pairwise-complete
    count. Same single self-join + aggregation; the p-value crosses to
    Python only for the n_samples² aggregated rows (t CDF pandas UDF).

    Output: ``(sample_x, sample_y, pearson_r, n_pairs, t_stat,
    p_value)``; degenerate pairs (n<3 or |r|=1) yield NULL t/p.
    """
    from padua_spark.functions.distributions import t_sf_udf

    left = df.select(
        *[F.col(c) for c in feature_cols],
        F.col(sample_col).alias("sample_x"),
        F.col(value_col).alias("_vx"),
    )
    right = df.select(
        *[F.col(c) for c in feature_cols],
        F.col(sample_col).alias("sample_y"),
        F.col(value_col).alias("_vy"),
    )
    pairs = left.join(right, on=feature_cols)
    both = F.col("_vx").isNotNull() & F.col("_vy").isNotNull()
    agg = pairs.groupBy("sample_x", "sample_y").agg(
        F.corr("_vx", "_vy").alias("pearson_r"),
        F.count(F.when(both, 1)).alias("n_pairs"),
    )
    n = F.col("n_pairs").cast("double")
    r = F.col("pearson_r")
    # |r| ≈ 1 guard with a tolerance band, not equality: engines land
    # on different sides of exact 1.0 for degenerate (self/duplicate)
    # pairs (measured: DuckDB corr(x,x) = 1 − 2e-16, Spark exactly 1),
    # and t would explode to ±3e9 on one side only.
    t = F.when(
        (n > 2) & r.isNotNull() & (F.lit(1.0) - r * r > F.lit(1e-12)),
        r * F.sqrt(n - 2) / F.sqrt(1.0 - r * r),
    )
    staged = agg.withColumn("t_stat", t).withColumn(
        "_p_raw", t_sf_udf(F.col("t_stat"), n - 2)
    )
    return staged.select(
        "sample_x", "sample_y", "pearson_r", "n_pairs", "t_stat",
        F.col("_p_raw").alias("p_value"),
    )


def rank_intensity(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    descending: bool = True,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Rank features by (log10) intensity (reference:
    ``visualize.rankintensity``, visualize.py:1075-1129). Global-order
    window over the (feature-level, already aggregated) table;
    ``tiebreak_cols`` make the ranking deterministic under value ties."""
    from pyspark.sql import Window

    v = F.col(value_col)
    order = [v.desc() if descending else v.asc()]
    order += [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.orderBy(*order)
    return df.withColumn("rank", F.row_number().over(w)).withColumn(
        "log10_value", F.when(v > 0, F.log10(v))
    )


def find_nearest(
    df: DataFrame, value_col: str, target: float, key_col: str
) -> DataFrame:
    """Row whose value is nearest to ``target`` (reference:
    ``utils.find_nearest_idx``, utils.py:320-330) — ``min_by`` single
    aggregation, no sort."""
    diff = F.abs(F.col(value_col) - F.lit(target))
    return df.agg(
        F.min_by(F.col(key_col), diff).alias("nearest_key"),
        F.min(diff).alias("abs_diff"),
    )
