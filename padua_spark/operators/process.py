"""Reshaping and design-table operators (reference: ``padua/process.py``).

The reference's central reshaping concern — building a column MultiIndex
from an experimental-design table — becomes, in the long model, a plain
**broadcast equi-join** of the measurements fact table against the tiny
design dimension (SURVEY.md §2.4 J1). Wide↔long conversion (melt /
pivot) happens only at ingest or presentation edges.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from padua_spark.functions.scalar import nan_and_inf_to_null, safe_log2


def melt(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "sample_label",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long unpivot. Pure metadata op (no shuffle): each input row
    fans out to ``len(value_cols)`` output rows inside the scan stage."""
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )


def pivot_wider(
    df: DataFrame,
    key_cols: list[str],
    pivot_col: str,
    value_col: str,
    agg: Column | None = None,
    pivot_values: list | None = None,
) -> DataFrame:
    """Long → wide (presentation edge / ``fold_columns_to_rows`` inverse;
    reference: ``padua/process.py:330-377``). Pass ``pivot_values`` when
    known to skip the extra distinct-values job."""
    agg = agg if agg is not None else F.first(F.col(value_col))
    p = df.groupBy(*key_cols).pivot(pivot_col, pivot_values)
    return p.agg(agg)


def join_design(
    measurements: DataFrame,
    design: DataFrame,
    label_col: str = "sample_label",
    design_label_col: str = "Label",
    strip_prefix: str | None = None,
    unmatched: str = "drop",
) -> DataFrame:
    """Annotate measurements with experimental-design levels
    (Group/Timepoint/Replicate/Technical…).

    Reference: ``process.build_index_from_design`` (process.py:23-111) —
    there a Python loop over column labels with ``design.loc`` lookups;
    here a single **broadcast hash join** (the design table is tiny by
    construction). ``strip_prefix`` replicates the label prefix-strip
    (process.py:69-76); ``unmatched='keep'|'drop'`` replicates
    ``unmatched_columns`` (process.py:100-105).
    """
    key = F.col(label_col)
    if strip_prefix:
        key = F.regexp_replace(key, f"^{re.escape(strip_prefix)}", "")
    key = F.trim(key)
    m = measurements.withColumn("_design_key", key)
    d = design.withColumnRenamed(design_label_col, "_design_key")
    how = "inner" if unmatched == "drop" else "left"
    return m.join(F.broadcast(d), on="_design_key", how=how).drop("_design_key")


def build_labels_from_regex(
    df: DataFrame,
    label_col: str,
    levels: list[tuple[str, str]],
    types: dict[str, str] | None = None,
) -> DataFrame:
    """Extract design levels from sample labels by regex — one derived
    column per ``(name, pattern)``, group(1) captured, optionally cast
    (reference: ``process.build_index_from_labels``, process.py:114-165).
    No join needed; pure projection."""
    types = types or {}
    out = df
    for name, pattern in levels:
        c = F.regexp_extract(F.col(label_col), pattern, 1)
        c = F.when(c == "", None).otherwise(c)
        if name in types:
            c = c.cast(types[name])
        out = out.withColumn(name, c)
    return out


def apply_experimental_design(
    df: DataFrame,
    template: DataFrame,
    label_col: str = "sample_label",
    experiment_col: str = "Experiment",
    name_col: str = "Name",
) -> DataFrame:
    """Rename sample labels via the MaxQuant experimentalDesignTemplate
    (``Experiment`` → ``Name``; reference: ``process.py:280-306``) —
    broadcast left join + coalesce."""
    t = template.select(
        F.col(experiment_col).alias("_exp"), F.col(name_col).alias("_name")
    )
    return (
        df.join(F.broadcast(t), df[label_col] == F.col("_exp"), "left")
        .withColumn(label_col, F.coalesce(F.col("_name"), F.col(label_col)))
        .drop("_exp", "_name")
    )


def expand_side_table(
    df: DataFrame,
    id_cols: list[str],
    multiplicity_cols: dict[str, list[str]],
    multiplicity_col: str = "multiplicity",
) -> DataFrame:
    """Perseus "expand side table": unpivot ``col___1/___2/___3``
    multiplicity-suffixed columns into k× rows with a multiplicity key;
    base columns replicated (reference: ``process.py:221-277``).

    ``multiplicity_cols`` maps base name → suffixed column names, e.g.
    ``{"Intensity S1": ["Intensity S1___1", "Intensity S1___2", ...]}``.
    Implemented as a single ``stack`` unpivot — row fan-out inside the
    scan stage, no shuffle. In the long model this disappears entirely:
    multiplicity is parsed into a key column at ingest
    (see sources.maxquant).
    """
    n = {len(v) for v in multiplicity_cols.values()}
    if len(n) != 1:
        raise ValueError("all bases must have the same multiplicity count")
    k = n.pop()
    stack_args: list[str] = []
    for m in range(1, k + 1):
        cells = ", ".join(
            f"`{cols[m - 1]}`" for cols in multiplicity_cols.values()
        )
        stack_args.append(f"{m}, {cells}")
    base_aliases = [f"`{b}`" for b in multiplicity_cols]
    expr = (
        f"stack({k}, {', '.join(stack_args)}) as "
        f"({multiplicity_col}, {', '.join(base_aliases)})"
    )
    return df.selectExpr(*[f"`{c}`" for c in id_cols], expr)


def transform_values(
    df: DataFrame,
    value_col: str,
    fn=None,
    out_col: str | None = None,
) -> DataFrame:
    """Apply a column-expression transform to the value column, coercing
    ±inf/NaN to NULL (reference: ``process.transform_expression_columns``,
    process.py:309-327; default ``np.log2``).

    ``fn`` is a ``Column -> Column`` callable (native expressions stay in
    codegen); default is the reference's log2.
    """
    out_col = out_col or value_col
    if fn is None:
        return df.withColumn(out_col, safe_log2(value_col))
    return df.withColumn(
        out_col, nan_and_inf_to_null(fn(F.col(value_col)))
    )


def combine_expression_columns(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    combine_map_col: Column,
) -> DataFrame:
    """Mean-merge measurement groups (reference pairwise column mean,
    ``process.py:198-218``): relabel samples via ``combine_map_col`` then
    average per (feature, merged label)."""
    return (
        df.withColumn("_merged", combine_map_col)
        .groupBy(*group_cols, "_merged")
        .agg(F.avg(F.col(value_col)).alias(value_col))
        .withColumnRenamed("_merged", "sample_label")
    )


def strip_index_labels(
    df: DataFrame, label_col: str, strip: str
) -> DataFrame:
    """Remove a substring from sample labels (reference:
    ``process.strip_index_labels``, process.py:178-195 — whose axis=0
    branch is buggy; we implement the documented intent)."""
    return df.withColumn(
        label_col, F.regexp_replace(F.col(label_col), re.escape(strip), "")
    )


def distinct_level_values(df: DataFrame, col: str) -> DataFrame:
    """Distinct values of a key column (reference intent of the broken
    ``process.get_unique_indices``, process.py:168-175)."""
    return df.select(col).distinct()
