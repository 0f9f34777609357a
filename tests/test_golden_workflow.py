"""Golden workflow test — the reference's entry-point pipeline
(SURVEY.md §3.1/§3.2) run end-to-end on a MaxQuant-shaped fixture,
checked against an independent pandas/numpy computation of the same
reference formulas (masked-NaN semantics)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from padua_spark.functions.distributions import student_t_sf
from padua_spark.operators import (
    aggregates as agg_ops,
    filters as flt,
    normalization as norm,
    process as proc,
    stats as st,
)
from padua_spark.sources import maxquant_long, read_design, read_maxquant
from tests.fixtures import GROUPS, make_protein_groups, write_fixture


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("maxquant")
    return write_fixture(str(d))


def _pandas_reference(pg_path, design_path):
    """The reference pipeline in eager pandas (formulas from
    /root/reference/padua: filters.py:37-61, process.py:309-325,
    normalization.py:4-22, analysis.py:467-498)."""
    df = pd.read_csv(pg_path, sep="\t")
    # remove_reverse / remove_contaminants (nan-keeps semantics)
    df = df[~df["Reverse"].astype(str).str.contains(r"\+", na=False)]
    df = df[
        ~df["Potential contaminant"].astype(str).str.contains(r"\+", na=False)
    ]
    design = pd.read_csv(design_path)
    labels = list(design["Label"])
    icols = [f"Intensity {l}" for l in labels]
    mat = df[icols].astype(float).to_numpy()
    with np.errstate(divide="ignore"):
        mat = np.log2(mat)
    mat[np.isinf(mat)] = np.nan
    # subtract_column_median
    med = np.nanmedian(mat, axis=0)
    mat = mat - med[None, :]
    groups = design.set_index("Label")["Group"]
    ga = np.array([groups[l] == GROUPS[0] for l in labels])
    gb = np.array([groups[l] == GROUPS[1] for l in labels])

    def gstats(sub):
        import warnings

        n = np.sum(~np.isnan(sub), axis=1)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            mean = np.nanmean(sub, axis=1)
            var = np.nanvar(sub, axis=1, ddof=1)
        return n, mean, var

    na, ma, va = gstats(mat[:, ga])
    nb, mb, vb = gstats(mat[:, gb])
    dof = na + nb - 2
    with np.errstate(invalid="ignore", divide="ignore"):
        pooled = ((na - 1) * va + (nb - 1) * vb) / dof
        t = (ma - mb) / np.sqrt(pooled * (1.0 / na + 1.0 / nb))
    p = student_t_sf(t, dof)
    out = pd.DataFrame(
        {
            "feature_id": df["id"].to_numpy(),
            "mean_a": ma,
            "mean_b": mb,
            "n_a": na,
            "n_b": nb,
            "t_stat": t,
            "p_value": p,
            "log2_fc": ma - mb,
        }
    )
    ok = (na >= 2) & (nb >= 2)
    out.loc[~ok, ["t_stat", "p_value"]] = np.nan
    return out


def test_volcano_pipeline_matches_pandas_reference(spark, fixture_paths):
    pg_path, design_path = fixture_paths
    wide = read_maxquant(spark, pg_path)
    wide = flt.remove_reverse(wide)
    wide = flt.remove_contaminants(wide)
    meas, feats = maxquant_long(wide, zeros_to_null=True)
    intens = meas.filter(
        (F.col("kind") == "Intensity") & F.col("sample_label").isNotNull()
    )
    logd = proc.transform_values(intens, "value")  # log2, inf→NULL
    normd = norm.subtract_group_median(logd, ["sample_label"], "value")
    design = read_design(spark, design_path)
    joined = proc.join_design(normd, design, label_col="sample_label")
    result = st.ttest_ind(
        joined, ["feature_id"], "Group", "value", GROUPS[0], GROUPS[1]
    ).withColumn("log2_fc", F.col("mean_a") - F.col("mean_b"))
    got = {r["feature_id"]: r for r in result.collect()}
    expected = _pandas_reference(pg_path, design_path)
    assert len(got) == len(expected)
    for _, e in expected.iterrows():
        g = got[e["feature_id"]]
        for col in ["mean_a", "mean_b", "t_stat", "p_value", "log2_fc"]:
            ev, gv = e[col], g[col]
            if pd.isna(ev):
                assert gv is None or pd.isna(gv), (
                    f"feature {e['feature_id']} {col}: expected NaN got {gv}"
                )
            else:
                assert gv == pytest.approx(ev, rel=1e-9, abs=1e-12), (
                    f"feature {e['feature_id']} {col}: {gv} != {ev}"
                )
        assert g["n_a"] == e["n_a"] and g["n_b"] == e["n_b"]


def test_known_signal_recovered(spark, fixture_paths):
    """Features 0..19 carry a +2 log2FC in PGE2; the volcano must flag
    them 'down' vs Control (mean_a - mean_b = -2) and recover them."""
    pg_path, design_path = fixture_paths
    wide = read_maxquant(spark, pg_path)
    meas, _ = maxquant_long(wide, zeros_to_null=True)
    intens = meas.filter(
        (F.col("kind") == "Intensity") & F.col("sample_label").isNotNull()
    )
    logd = proc.transform_values(intens, "value")
    design = read_design(spark, design_path)
    joined = proc.join_design(logd, design, label_col="sample_label")
    res = st.volcano_stats(
        joined, ["feature_id"], "Group", "value", "Control", "PGE2",
        minimum_sample_n=3, s0=0.2, minratio=0.5,
    ).collect()
    sig_down = {
        r["feature_id"] for r in res if r["direction"] == "down"
    }
    planted = set(range(20))
    missed = planted - sig_down
    assert len(missed) <= 2, f"missed planted features: {missed}"
    false_pos = sig_down - planted
    assert len(false_pos) <= 2, f"false positives: {false_pos}"


def test_min_valid_values_group_missingness(spark, fixture_paths):
    """Features 180+ are fully missing in PGE2 → a per-group n≥3 filter
    must still keep them (Control group qualifies) but a PGE2-only
    filter must drop them."""
    pg_path, design_path = fixture_paths
    wide = read_maxquant(spark, pg_path)
    meas, _ = maxquant_long(wide, zeros_to_null=True)
    intens = meas.filter(
        (F.col("kind") == "Intensity") & F.col("sample_label").isNotNull()
    )
    design = read_design(spark, design_path)
    joined = proc.join_design(intens, design, label_col="sample_label")
    kept_any = flt.minimum_valid_values_in_any_group(
        joined, ["feature_id"], ["Group"], "value", n=3
    )
    kept_ids = {
        r["feature_id"]
        for r in kept_any.select("feature_id").distinct().collect()
    }
    assert set(range(180, 200)) <= kept_ids
    pge2_only = joined.filter(F.col("Group") == "PGE2")
    kept_pge2 = flt.minimum_valid_values_in_any_group(
        pge2_only, ["feature_id"], ["Group"], "value", n=3
    )
    kept_pge2_ids = {
        r["feature_id"]
        for r in kept_pge2.select("feature_id").distinct().collect()
    }
    assert not (set(range(180, 200)) & kept_pge2_ids)


def test_technical_replicate_collapse(spark, fixture_paths):
    pg_path, design_path = fixture_paths
    wide = read_maxquant(spark, pg_path)
    meas, _ = maxquant_long(wide, zeros_to_null=True)
    intens = meas.filter(
        (F.col("kind") == "Intensity") & F.col("sample_label").isNotNull()
    )
    design = read_design(spark, design_path)
    joined = proc.join_design(intens, design, label_col="sample_label")
    collapsed = agg_ops.collapse_technical_replicates(
        joined, ["feature_id", "Group", "Replicate"], "value", stat="median"
    )
    # 200 features × 2 groups × 3 replicates, minus fully-missing cells
    n = collapsed.filter(F.col("value").isNotNull()).count()
    assert 0 < n <= 200 * 2 * 3
