"""Thin visualization layer (reference: ``padua/visualize.py``, 1965
LoC of matplotlib).

Design split: every reference plot's *compute core* is an operator in
``padua_spark.operators`` (SURVEY.md §2 T6/T7, A8, A10-A13, M4-M7, J4,
O3); this module wires those operators to plot-shaped summary tables
and — only if matplotlib is importable (it is not in this container) —
renders them. The returned DataFrames ARE the parity surface; rendering
is presentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from padua_spark.operators import aggregates as _agg
from padua_spark.operators import stats as _st

try:  # pragma: no cover - not installed here
    import matplotlib  # noqa: F401

    HAS_MPL = True
except ImportError:
    HAS_MPL = False


def _maybe_render(fn):
    """Decorate a table-builder with optional rendering: returns the
    computed DataFrame always; plots when matplotlib exists and
    ``render=True`` is passed."""

    def wrapper(*args, render: bool = False, **kwargs):
        table = fn(*args, **kwargs)
        if render and not HAS_MPL:
            raise NotImplementedError(
                "matplotlib is not available in this environment"
            )
        return table

    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    return wrapper


@_maybe_render
def volcano(df, feature_cols, group_col, value_col, group_a, group_b,
            **kw) -> DataFrame:
    """Volcano plot table (reference: visualize.py:458-676): the full
    stats composite — log2 fc, t, p, s0 class, direction."""
    return _st.volcano_stats(
        df, feature_cols, group_col, value_col, group_a, group_b, **kw
    )


@_maybe_render
def rankintensity(df, key_cols, value_col, **kw) -> DataFrame:
    """Rank-vs-log10-intensity table (reference: visualize.py:1075-1129)."""
    return _agg.rank_intensity(df, key_cols, value_col, **kw)


@_maybe_render
def correlation(df, sample_col, feature_cols, value_col) -> DataFrame:
    """Sample correlation matrix table (reference: visualize.py:1245-1291)."""
    return _agg.pairwise_correlation(df, sample_col, feature_cols, value_col)


@_maybe_render
def enrichment(df, group_cols, flag, value_col) -> DataFrame:
    """Modification-enrichment table (reference: visualize.py:433-455)."""
    return _agg.enrichment(df, group_cols, flag, value_col)


@_maybe_render
def quality_control(df, flag_cols, **kw) -> DataFrame:
    """QC bar-plot table (reference: visualize.py:1625-1662)."""
    return _agg.quality_control_counts(df, flag_cols, **kw)


@_maybe_render
def modificationlocalization(df, locprob_col="Localization prob") -> DataFrame:
    """Class I/II/III localization table (reference: visualize.py:751-795)."""
    return _agg.localization_class_counts(df, locprob_col)


@_maybe_render
def modifiedaminoacids(df, col="Amino acid") -> DataFrame:
    """Amino-acid frequency table (reference: visualize.py:697-748)."""
    return _agg.value_counts(df, col)


@_maybe_render
def venn(dfs: dict[str, DataFrame], key_col: str) -> DataFrame:
    """Venn membership counts (reference: visualize.py:979-1033)."""
    from padua_spark.operators.setops import venn_counts

    return venn_counts(dfs, key_col)


# --- SVG figure backend (no matplotlib required) ---------------------------
# The reference renders with matplotlib; padua_spark.svg is a
# dependency-free SVG writer over the same computed tables, so real
# figures exist even in matplotlib-less environments. Each wrapper
# collects the (small) plot table and returns the SVG string.


def volcano_svg(table: DataFrame, **kw) -> str:
    """Render a ``volcano(...)`` result table to SVG."""
    from padua_spark import svg as _svg

    return _svg.volcano_svg(table.collect(), **kw)


def correlation_svg(table: DataFrame, **kw) -> str:
    """Render a ``correlation(...)`` (sample_x, sample_y, r) table."""
    from padua_spark import svg as _svg

    return _svg.heatmap_svg(table.collect(), **kw)


def counts_bar_svg(table: DataFrame, label_col: str, value_col: str,
                   **kw) -> str:
    """Render any counts table (QC, amino-acid frequencies) as bars."""
    from padua_spark import svg as _svg

    return _svg.bar_svg(table.collect(), label_col, value_col, **kw)


def rankintensity_svg(table: DataFrame, **kw) -> str:
    from padua_spark import svg as _svg

    return _svg.rank_intensity_svg(table.collect(), **kw)


def hierarchical_svg(linkage, samples: list[str], **kw) -> str:
    """Render the ``hierarchical(...)`` linkage as a dendrogram."""
    from padua_spark import svg as _svg

    return _svg.dendrogram_svg(linkage, samples, **kw)


def hierarchical(df, feature_cols, sample_col, value_col,
                 n_clusters: int = 6):
    """Clustered-heatmap prep (reference: visualize.py:1733-1869):
    z-score → distributed sample-distance matrix → driver-side Ward
    linkage → flat clusters. Returns (linkage, sample order, labels)."""
    import numpy as np

    from padua_spark.operators import ml

    z = ml.zscore(df, feature_cols, value_col)
    rows = ml.sample_distance_matrix(
        z, feature_cols, sample_col, "z"
    ).collect()
    samples = sorted({r["sample_x"] for r in rows})
    idx = {s: i for i, s in enumerate(samples)}
    D = np.zeros((len(samples), len(samples)))
    for r in rows:
        D[idx[r["sample_x"]], idx[r["sample_y"]]] = r["distance"]
    link = ml.ward_linkage(D)
    _thr, labels = ml.optimize_cluster_threshold(
        link, len(samples), target_n=n_clusters
    )
    return link, samples, labels


def hierarchical_timecourse(df, feature_cols, sample_col, value_col,
                            group_cols, n_clusters: int = 6) -> DataFrame:
    """Cluster-mean trajectories (reference: visualize.py:1872-1965):
    cluster FEATURES by their sample profiles via Ward on a distributed
    distance matrix, then aggregate per-cluster means distributed."""
    import numpy as np

    from padua_spark.operators import ml

    # Feature-level clustering: entities are FEATURES, the join key is
    # the sample axis (sample_distance_matrix with the roles swapped).
    z = ml.zscore(df, feature_cols, value_col)
    rows = ml.sample_distance_matrix(
        z, [sample_col], feature_cols[0], "z"
    ).collect()
    feats = sorted({r["sample_x"] for r in rows})
    idx = {s: i for i, s in enumerate(feats)}
    D = np.zeros((len(feats), len(feats)))
    for r in rows:
        D[idx[r["sample_x"]], idx[r["sample_y"]]] = r["distance"]
    link = ml.ward_linkage(D)
    _thr, labels = ml.optimize_cluster_threshold(
        link, len(feats), target_n=n_clusters
    )
    cluster_map = {feats[i]: int(labels[i]) for i in range(len(feats))}
    return ml.cluster_timecourse_means(
        df, feature_cols, cluster_map, group_cols, value_col
    )
