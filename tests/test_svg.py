"""SVG figure backend: well-formed XML, right mark counts, and
bit-deterministic output over the real computed plot tables."""

import xml.etree.ElementTree as ET

import numpy as np
from pyspark.sql import functions as F

from padua_spark import viz
from padua_spark.operators import ml


def _parse(svg: str) -> ET.Element:
    root = ET.fromstring(svg)
    assert root.tag.endswith("svg")
    return root


def _count(root, tag):
    return len(
        [e for e in root.iter() if e.tag.endswith("}" + tag)]
        or [e for e in root.iter() if e.tag == tag]
    )


def test_volcano_svg(spark):
    rows = []
    for f in range(30):
        for g in ("a", "b"):
            for rep in range(4):
                rows.append(
                    (f, g, float(f % 7 + (2.0 if g == "b" and f < 5 else 0)
                                 + rep * 0.1))
                )
    df = spark.createDataFrame(rows, ["fid", "grp", "v"])
    table = viz.volcano(
        df, ["fid"], "grp", "v", "a", "b", minimum_sample_n=3
    )
    svg1 = viz.volcano_svg(table)
    svg2 = viz.volcano_svg(table)
    assert svg1 == svg2  # deterministic bytes
    root = _parse(svg1)
    n_rows = table.where(
        F.col("log2_fc").isNotNull() & F.col("p_value").isNotNull()
    ).count()
    assert _count(root, "circle") == n_rows > 0
    assert "log2 fold change" in svg1


def test_correlation_heatmap_svg(spark):
    rows = [
        (f, s, float((f * 3 + i) % 11))
        for f in range(20)
        for i, s in enumerate(["s1", "s2", "s3"])
    ]
    df = spark.createDataFrame(rows, ["fid", "sample", "v"])
    table = viz.correlation(df, "sample", ["fid"], "v")
    svg = viz.correlation_svg(table)
    root = _parse(svg)
    # 3x3 cells + background rect
    assert _count(root, "rect") == 9 + 1
    assert svg == viz.correlation_svg(table)


def test_bar_svg(spark):
    df = spark.createDataFrame(
        [("S", 120), ("T", 80), ("Y", 15)], ["aa", "n"]
    )
    svg = viz.counts_bar_svg(df, "aa", "n", title="Modified AAs")
    root = _parse(svg)
    assert _count(root, "rect") == 3 + 1  # bars + background
    assert "Modified AAs" in svg


def test_dendrogram_svg():
    rng = np.random.default_rng(5)
    X = rng.normal(size=(6, 6))
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    link = ml.ward_linkage(D)
    labels = [f"s{i}" for i in range(6)]
    svg = viz.hierarchical_svg(link, labels)
    root = _parse(svg)
    # 5 merges x 3 segments + 2 axis lines + y ticks
    n_lines = _count(root, "line")
    assert n_lines >= 5 * 3 + 2
    for lab in labels:
        assert lab in svg
    assert svg == viz.hierarchical_svg(link, labels)


def test_rank_intensity_svg(spark):
    df = spark.createDataFrame(
        [(i, float(1000 - i * 7)) for i in range(50)], ["k", "v"]
    )
    table = viz.rankintensity(df, ["k"], "v")
    svg = viz.rankintensity_svg(table)
    root = _parse(svg)
    assert _count(root, "circle") == 50
