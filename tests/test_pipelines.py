"""End-to-end pipeline tests on the MaxQuant fixture (SURVEY.md §3)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from padua_spark import pipelines
from tests.fixtures import make_protein_groups, write_fixture


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    return write_fixture(str(d))


def test_phospho_lfq_pipeline(spark, fixture_paths, tmp_path):
    pg, design = fixture_paths
    out = pipelines.phospho_lfq(
        spark, pg, design, "Control", "PGE2",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    volcano = out["volcano"].collect()
    assert len(volcano) > 100
    down = {r["feature_id"] for r in volcano if r["direction"] == "down"}
    # planted +2 log2FC in PGE2 → Control-vs-PGE2 direction 'down'
    assert len(down & set(range(20))) >= 15
    corr = out["correlation"].collect()
    n_samples = 12
    assert len(corr) == n_samples * n_samples
    diag = [r for r in corr if r["sample_x"] == r["sample_y"]]
    assert all(r["pearson_r"] == pytest.approx(1.0) for r in diag)
    collapsed = out["collapsed"]
    assert set(collapsed.columns) == {
        "feature_id", "Group", "Replicate", "value"
    } | ({"Timepoint"} & set(collapsed.columns))


def test_msp_enrichment_pipeline(spark, tmp_path):
    # modificationSpecificPeptides-shaped fixture (FIXTURES.md §3)
    rng = np.random.default_rng(13)
    n = 120
    labels = ["S1", "S2"]
    df = pd.DataFrame({"id": np.arange(n)})
    df["Modifications"] = [
        "Phospho (STY)" if i % 3 == 0 else "Unmodified" for i in range(n)
    ]
    for lab in labels:
        df[f"Intensity {lab}"] = rng.uniform(0, 1000, n).round(2)
    path = str(tmp_path / "msp.txt")
    df.to_csv(path, sep="\t", index=False)
    out = pipelines.msp_enrichment(spark, path).collect()
    assert {r["sample_label"] for r in out} == {"S1", "S2"}
    for r in out:
        # ~1/3 of rows modified with uniform intensities
        assert 0.15 < r["enrichment"] < 0.55
        # modified + unmodified sums to the total
        pdf = df[df["Modifications"].str.contains("Phospho")]
        expected = pdf[f"Intensity {r['sample_label']}"].sum()
        assert r["modified_sum"] == pytest.approx(expected, rel=1e-9)
    # design-join roll-up (E287): per-Group pooled + order-fixed mean
    design = pd.DataFrame(
        {"Label": labels, "Group": ["A", "A"], "Replicate": [1, 2]}
    )
    dpath = str(tmp_path / "design.csv")
    design.to_csv(dpath, index=False)
    rolled = pipelines.msp_enrichment(
        spark, path, design_path=dpath
    ).collect()
    assert len(rolled) == 1
    g = rolled[0]
    per = {r["sample_label"]: r for r in out}
    mod = sum(r["modified_sum"] for r in per.values())
    tot = sum(
        r["modified_sum"] + r["unmodified_sum"] for r in per.values()
    )
    assert g["grp"] == "A" and g["n_samples"] == 2
    assert g["modified_sum"] == pytest.approx(mod, rel=1e-9)
    assert g["pooled_enrichment"] == pytest.approx(mod / tot, rel=1e-9)
    mean = (per["S1"]["enrichment"] + per["S2"]["enrichment"]) / 2
    assert g["mean_enrichment"] == pytest.approx(mean, rel=1e-12)


def test_protein_groups_ratio_pipeline(spark, tmp_path):
    """Entry point B (SURVEY §3.2): ratio pipeline one-sample t vs 0
    matches an independent pandas computation and flags the planted
    ratio shift."""
    import os

    from tests.fixtures import write_fixture

    d = str(tmp_path / "silac")
    os.makedirs(d, exist_ok=True)
    pg, _ = write_fixture(d)
    # ratio design: Label = 'E1'... (labels after 'Ratio H/L normalized ')
    ratio_design = pd.DataFrame(
        {"Label": ["E1", "E2", "E3"], "Group": ["t1", "t1", "t1"],
         "Replicate": [1, 2, 3]}
    )
    design_path = f"{d}/ratio_design.csv"
    ratio_design.to_csv(design_path, index=False)
    out = pipelines.protein_groups_ratio(
        spark, pg, design_path, min_valid_per_group=2
    )
    got = {r["feature_id"]: r for r in out["onesample_ttest"].collect()}
    # pandas reference
    raw = pd.read_csv(pg, sep="\t")
    raw = raw[~raw["Reverse"].astype(str).str.contains(r"\+", na=False)]
    raw = raw[~raw["Potential contaminant"].astype(str)
              .str.contains(r"\+", na=False)]
    raw = raw[~raw["Only identified by site"].astype(str)
              .str.contains(r"\+", na=False)]
    cols = [f"Ratio H/L normalized E{e}" for e in (1, 2, 3)]
    mat = np.log2(raw[cols].to_numpy())
    n = np.sum(~np.isnan(mat), axis=1)
    keep = n >= 2
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        mean = np.nanmean(mat, axis=1)
        sd = np.nanstd(mat, axis=1, ddof=1)
    ids = raw["id"].to_numpy()
    checked = 0
    for i, fid in enumerate(ids):
        if not keep[i]:
            assert fid not in got
            continue
        r = got[fid]
        assert r["mean"] == pytest.approx(mean[i], rel=1e-9)
        if sd[i] > 0 and n[i] >= 2:
            t = mean[i] / (sd[i] / np.sqrt(n[i]))
            assert r["t_stat"] == pytest.approx(t, rel=1e-9)
            checked += 1
    assert checked > 100
    # planted ratio features have strongly positive mean log2 ratio
    planted = [got[f]["mean"] for f in range(20) if f in got]
    rest = [got[f]["mean"] for f in range(30, 150) if f in got]
    assert np.mean(planted) > np.mean(rest) + 1.0
