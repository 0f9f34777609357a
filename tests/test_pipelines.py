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
