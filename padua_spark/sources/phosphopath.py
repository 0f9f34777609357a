"""Phosphopath / R interchange sinks.

Reference: ``padua/io.py:95-127`` (``write_phosphopath``: 4-column
``protein<TAB>protein-Rsite<TAB>Rsite<TAB>multiplicity`` rows),
``io.py:129-185`` (``write_phosphopath_ratio``: per-comparison mean
ratios with ordinalized timepoints), ``io.py:188-203`` (``write_r``:
CSV with ``@``-joined row keys — the reference's version is broken,
io.py:202 builds columns from the index; we implement the documented
intent, SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from padua_spark.functions.scalar import protein_id_base


def phosphopath_rows(
    features: DataFrame,
    proteins_col: str = "Proteins",
    amino_acid_col: str = "Amino acid",
    position_cols: tuple[str, ...] = (
        "Position",
        "Positions",
        "Positions within proteins",
    ),
    multiplicity_col: str = "Multiplicity",
) -> DataFrame:
    """Build the 4-column Phosphopath export (reference io.py:95-127).

    The position fallback chain (io.py:87-93) becomes ``F.coalesce``
    over the candidate columns; the leading protein id strips isoform
    suffixes (io.py:85).
    """
    present = [c for c in position_cols if c in features.columns]
    if not present:
        raise ValueError("no position column present")
    position = F.coalesce(*[F.col(c).cast("string") for c in present])
    position = F.split(position, ";").getItem(0)
    protein = protein_id_base(proteins_col)
    rsite = F.concat(F.col(amino_acid_col), position)
    mult = (
        F.concat(F.lit("x"), F.col(multiplicity_col).cast("string"))
        if multiplicity_col in features.columns
        else F.lit("x1")
    )
    return features.select(
        protein.alias("protein"),
        F.concat_ws("-", protein, rsite).alias("protein_rsite"),
        rsite.alias("rsite"),
        mult.alias("multiplicity"),
    )


def write_phosphopath(features: DataFrame, path: str, **kw) -> None:
    phosphopath_rows(features, **kw).coalesce(1).write.option(
        "sep", "\t"
    ).option("header", False).mode("overwrite").csv(path)


def phosphopath_ratio_rows(
    measurements: DataFrame,
    feature_id_col: str,
    group_col: str,
    timepoint_col: str,
    value_col: str,
    control_group,
    comparison_groups: list,
) -> DataFrame:
    """Mean-ratio rows per comparison group vs control, with the
    timepoint ordinalized (reference io.py:129-185: ratio of group
    means at io.py:176, timepoint index at io.py:169-178).

    One conditional aggregation per feature computes the control mean
    and each comparison mean; ratios + ordinal timepoints are
    projections. Timepoint ordinalization = ``dense_rank`` over the
    distinct timepoints (a tiny broadcast).
    """
    ctrl = F.when(
        F.col(group_col) == F.lit(control_group), F.col(value_col)
    )
    aggs = [F.avg(ctrl).alias("_ctrl_mean")]
    for g in comparison_groups:
        aggs.append(
            F.avg(
                F.when(F.col(group_col) == F.lit(g), F.col(value_col))
            ).alias(f"_mean_{g}")
        )
    per_feature = measurements.groupBy(
        feature_id_col, timepoint_col
    ).agg(*aggs)
    tp_rank = (
        measurements.select(timepoint_col)
        .distinct()
        .withColumn(
            "_tp_ordinal",
            F.dense_rank().over(Window.orderBy(F.col(timepoint_col))),
        )
    )
    per_feature = per_feature.join(
        F.broadcast(tp_rank), on=timepoint_col, how="left"
    )
    frames = []
    for g in comparison_groups:
        frames.append(
            per_feature.select(
                F.concat_ws(
                    "_",
                    F.col(feature_id_col).cast("string"),
                    F.col("_tp_ordinal").cast("string"),
                ).alias("ID"),
                F.when(
                    F.col("_ctrl_mean") != 0,
                    F.col(f"_mean_{g}") / F.col("_ctrl_mean"),
                ).alias("Ratio"),
                F.lit(str(g)).alias("comparison"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def write_r(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    sep: str = ",",
) -> None:
    """CSV sink with ``@``-joined row keys (reference io.py:188-203,
    documented intent — the shipped version is broken)."""
    keyed = df.select(
        F.concat_ws("@", *[F.col(c).cast("string") for c in key_cols]).alias(
            "row_key"
        ),
        *[c for c in df.columns if c not in key_cols],
    )
    keyed.coalesce(1).write.option("sep", sep).option(
        "header", True
    ).mode("overwrite").csv(path)
