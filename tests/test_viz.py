"""Viz layer: every plot builder returns its computed table; rendering
is gated on matplotlib availability."""

import pytest
from pyspark.sql import functions as F

from padua_spark import viz


def _meas(spark):
    rows = []
    for f in range(12):
        for g in ("Control", "PGE2"):
            for r in range(3):
                base = 10.0 + f + (3.0 if g == "PGE2" and f < 4 else 0.0)
                rows.append((f, f"{g}_{r}", g, r, base + 0.1 * r))
    return spark.createDataFrame(
        rows, ["fid", "sample", "grp", "rep", "v"]
    )


def test_volcano_table(spark):
    out = viz.volcano(
        _meas(spark), ["fid"], "grp", "v", "PGE2", "Control"
    )
    rows = {r["fid"]: r for r in out.collect()}
    assert rows[0]["log2_fc"] == pytest.approx(3.0)
    assert rows[10]["log2_fc"] == pytest.approx(0.0)


def test_render_without_matplotlib_raises(spark):
    if viz.HAS_MPL:
        pytest.skip("matplotlib present")
    with pytest.raises(NotImplementedError):
        viz.modifiedaminoacids(_meas(spark), "grp", render=True)


def test_hierarchical_timecourse_clusters_signal(spark):
    out = viz.hierarchical_timecourse(
        _meas(spark), ["fid"], "sample", "v", ["grp"], n_clusters=2
    )
    rows = out.collect()
    assert {r["cluster"] for r in rows} == {0, 1}
    # within each cluster both groups appear
    pairs = {(r["cluster"], r["grp"]) for r in rows}
    assert len(pairs) == 4


def test_hierarchical_sample_clustering(spark):
    link, samples, labels = viz.hierarchical(
        _meas(spark), ["fid"], "sample", "v", n_clusters=2
    )
    assert len(samples) == 6 and len(labels) == 6
