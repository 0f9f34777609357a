"""Row filters and column projections (reference: ``padua/filters.py``).

All filters are single ``Filter`` nodes — Catalyst pushes them into the
parquet/CSV scan (check with ``df.explain``: they appear under
``PushedFilters``), so at 100 TB they prune row groups before any I/O.

Null semantics: pandas ``nan != '+'`` evaluates True, so padua's
equality filters *keep* rows with missing flags (filters.py:17).
SQL ``NULL != '+'`` is NULL (row dropped) — we replicate pandas by
adding an explicit ``IS NULL`` escape. This is the
"non-standard null filter semantics" watch item of SURVEY.md §7.4.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def remove_rows_matching(df: DataFrame, column: str, match) -> DataFrame:
    """Drop rows where ``column == match``; NULLs are kept
    (reference: ``padua/filters.py:4-18``)."""
    c = F.col(column)
    return df.filter((c != F.lit(match)) | c.isNull())


def remove_rows_containing(df: DataFrame, column: str, match: str) -> DataFrame:
    """Drop rows where ``column`` contains ``match`` as a substring;
    NULLs are kept (reference: ``padua/filters.py:21-35``)."""
    c = F.col(column).cast("string")
    return df.filter(~c.contains(match) | c.isNull())


def remove_reverse(df: DataFrame, column: str = "Reverse") -> DataFrame:
    """Drop MaxQuant decoy hits flagged ``'+'``
    (reference: ``padua/filters.py:37-47``)."""
    return remove_rows_containing(df, column, "+")


def _resolve_column(df: DataFrame, candidates: list[str]) -> str | None:
    for c in candidates:
        if c in df.columns:
            return c
    return None


def remove_contaminants(df: DataFrame) -> DataFrame:
    """Drop contaminant rows; resolves ``Contaminant`` vs
    ``Potential contaminant`` by presence (reference:
    ``padua/filters.py:49-61``)."""
    col = _resolve_column(df, ["Contaminant", "Potential contaminant"])
    if col is None:
        return df
    return remove_rows_containing(df, col, "+")


def remove_only_identified_by_site(df: DataFrame) -> DataFrame:
    """Reference: ``padua/filters.py:64-74``."""
    col = _resolve_column(df, ["Only identified by site"])
    return df if col is None else remove_rows_containing(df, col, "+")


def filter_localization_probability(
    df: DataFrame, threshold: float = 0.75, column: str = "Localization prob"
) -> DataFrame:
    """Keep Class-I sites: ``Localization prob >= threshold``
    (reference: ``padua/filters.py:77-90``)."""
    return df.filter(F.col(column) >= F.lit(threshold))


def search(df: DataFrame, match: str, columns: list[str]) -> DataFrame:
    """Keep rows where ``match`` appears in ANY of ``columns``.

    Reference: ``padua/filters.py:132-152``. NB the reference ignores its
    ``columns`` argument (hardcoded list, filters.py:147) — we implement
    the documented intent and honor the argument (SURVEY.md §5
    known-broken list).
    """
    preds = [
        F.col(c).cast("string").contains(match) & F.col(c).isNotNull()
        for c in columns
    ]
    return df.filter(reduce(or_, preds))


def minimum_valid_values_in_any_group(
    df: DataFrame,
    feature_cols: list[str],
    group_cols: list[str],
    value_col: str,
    n: int = 1,
) -> DataFrame:
    """Keep features having ≥ ``n`` non-null values in at least one group.

    Reference: ``padua/filters.py:93-129`` (indicator →
    ``sum(axis=1, level=...)`` → ``max(axis=1) >= n``). Long-model plan:

        groupBy(feature, group).count(value)
        → groupBy(feature).max(count) >= n
        → LEFT SEMI JOIN back to the fact table

    Scale: two partial-aggregatable shuffles on the feature key plus a
    semi join that AQE converts to broadcast when the surviving feature
    set is small (it usually is — this is a heavy row filter).
    """
    counts = (
        df.groupBy(*feature_cols, *group_cols)
        .agg(F.count(F.col(value_col)).alias("_valid"))
        .groupBy(*feature_cols)
        .agg(F.max("_valid").alias("_max_valid"))
        .filter(F.col("_max_valid") >= F.lit(n))
        .select(*feature_cols)
    )
    return df.join(counts, on=feature_cols, how="left_semi")


def filter_exclude(df: DataFrame, match: str) -> DataFrame:
    """Drop columns whose NAME contains ``match`` (wide-model projection;
    reference: ``padua/filters.py:154-161``). Driver-side name match —
    Catalyst then prunes the dropped columns out of the scan."""
    keep = [c for c in df.columns if match not in c]
    return df.select(*keep)


def filter_select_columns(
    df: DataFrame, pattern: str, keep_also: list[str] | None = None
) -> DataFrame:
    """Keep columns matching a regex plus named metadata columns
    (generalizes ``filter_select_columns_intensity`` / ``_ratio``,
    reference: ``padua/filters.py:163-174``)."""
    import re

    rx = re.compile(pattern)
    keep_also = [c for c in (keep_also or []) if c in df.columns]
    matched = [c for c in df.columns if rx.search(c) and c not in keep_also]
    return df.select(*(keep_also + matched))


def filter_kind_label(
    df: DataFrame,
    kind: str,
    label_contains: str | None = None,
    kind_col: str = "kind",
    label_col: str = "sample_label",
) -> DataFrame:
    """Long-model equivalent of ``filter_intensity`` /
    ``filter_intensity_lfq`` / ``filter_ratio`` (reference:
    ``padua/filters.py:177-211``): predicate on the measurement-kind and
    sample-label dimensions instead of regexes over column names."""
    out = df.filter(F.col(kind_col) == F.lit(kind))
    if label_contains is not None:
        out = out.filter(F.col(label_col).contains(label_contains))
    return out


def filter_intensity_columns(
    df: DataFrame,
    label: str = "",
    with_multiplicity: bool = False,
    prefix: str = "Intensity",
) -> DataFrame:
    """Wide-model twin of :func:`filter_kind_label` (reference:
    ``filters.filter_intensity`` / ``_lfq`` / ``_ratio``,
    filters.py:177-211): keep non-expression columns plus the
    ``{prefix} <label>[___k]`` expression columns. Prefer the long
    model at scale; this exists for wide-matrix interop."""
    import re

    from padua_spark.sources.maxquant import parse_expression_columns

    parsed = parse_expression_columns(df.columns)
    expr_cols = {p["column"] for p in parsed}
    meta = [c for c in df.columns if c not in expr_cols]
    suffix = r"___\d" if with_multiplicity else ""
    rx = re.compile(
        rf"^{re.escape(prefix)} .*{re.escape(label)}.*{suffix}$"
    )
    keep = [c for c in df.columns if c in expr_cols and rx.match(c)]
    return df.select(*(meta + keep))
