"""Tests: offline-stubbed external operators, PLS imputation, cluster
timecourse means, optimize-threshold search."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from padua_spark.operators import ml
from padua_spark.operators.external import (
    collect_distinct_ids,
    go_enrichment,
    kegg_color_table,
    stub_go_fetch,
    uniprot_mapping_join,
)
from padua_spark.operators.imputation import impute_pls


def test_go_enrichment_offline(spark):
    df = spark.createDataFrame(
        [(i, f"P{i:03d};Q{i:03d}") for i in range(40)],
        ["id", "Proteins"],
    )
    out = go_enrichment(df, fetch=stub_go_fetch, fdr=0.05).collect()
    assert len(out) > 0
    ps = [r["P"] for r in out]
    assert ps == sorted(ps)
    assert all(p < 0.05 for p in ps)


def test_go_enrichment_requires_transport(spark):
    df = spark.createDataFrame([(1, "P1")], ["id", "Proteins"])
    with pytest.raises(NotImplementedError):
        go_enrichment(df)


def test_collect_distinct_ids(spark):
    df = spark.createDataFrame(
        [(1, "P1;P2"), (2, "P2;P3_HUMAN x")], ["id", "Proteins"]
    )
    ids = set(collect_distinct_ids(df, "Proteins"))
    assert ids == {"P1", "P2", "P3"}


def test_uniprot_mapping_join(spark):
    df = spark.createDataFrame([("P1",), ("P2",), ("P9",)], ["pid"])
    out = uniprot_mapping_join(
        df, "pid", fetch=lambda ids: {i: f"K_{i}" for i in ids if i != "P9"}
    ).collect()
    got = {r["pid"]: r["mapped_id"] for r in out}
    assert got["P1"] == "K_P1" and got["P9"] is None


def test_hypergeom_enrichment_exact(spark):
    """p-value matches the exact rational tail computed with
    math.comb; counts and fold enrichment match hand-derived values;
    unannotated selected ids drop out of n (PantherDB's unmapped-ID
    behavior)."""
    import math

    from padua_spark.operators.external import hypergeom_enrichment

    # 20 ids, two terms: T1 on ids 0..9, T2 on ids 10..19;
    # hits = {0..5, 12} plus an unannotated id 99 (must be ignored)
    ann = spark.createDataFrame(
        [(i, "T1" if i < 10 else "T2") for i in range(20)],
        ["id", "term"],
    )
    sel = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 4, 5, 12, 99]], ["id"]
    )
    out = {r["term"]: r for r in
           hypergeom_enrichment(sel, ann, "id", "term").collect()}
    assert set(out) == {"T1", "T2"}
    r1 = out["T1"]
    assert (r1["k_selected"], r1["n_selected"]) == (6, 7)
    assert (r1["k_background"], r1["n_background"]) == (10, 20)
    assert r1["fold_enrichment"] == pytest.approx((6 / 7) / (10 / 20))

    def exact_tail(k, K, n, N):
        return sum(
            math.comb(K, i) * math.comb(N - K, n - i)
            for i in range(k, min(K, n) + 1)
        ) / math.comb(N, n)

    assert r1["p_value"] == pytest.approx(
        exact_tail(6, 10, 7, 20), abs=1e-10
    )
    r2 = out["T2"]
    assert r2["p_value"] == pytest.approx(
        exact_tail(1, 10, 7, 20), abs=1e-10
    )
    # empty hit list: k=0 everywhere, p = full pmf sum = 1
    empty = spark.createDataFrame([], "id int")
    out0 = hypergeom_enrichment(empty, ann, "id", "term").collect()
    for r in out0:
        assert r["k_selected"] == 0 and r["n_selected"] == 0
        assert r["p_value"] == pytest.approx(1.0, abs=1e-9)


def test_kegg_color_table(spark):
    rows = []
    for s in range(4):
        rows.append((1, "a" if s < 2 else "b", 8.0 if s < 2 else 2.0))
        rows.append((2, "a" if s < 2 else "b", 2.0 if s < 2 else 8.0))
    df = spark.createDataFrame(rows, ["fid", "grp", "v"])
    out = {
        r["fid"]: r
        for r in kegg_color_table(
            df, ["fid"], "grp", "v", "a", "b"
        ).collect()
    }
    assert out[1]["log2_ratio"] == pytest.approx(2.0)
    assert out[1]["color_bin"] == 6  # clamped top bin
    assert out[2]["log2_ratio"] == pytest.approx(-2.0)
    assert out[2]["color_bin"] == 0


def test_impute_pls_recovers_linear_structure(spark):
    rng = np.random.default_rng(9)
    n_samples, n_complete = 24, 20
    X = rng.normal(size=(n_samples, n_complete))
    # incomplete feature = linear combo of two complete ones
    y = 2.0 * X[:, 0] - 1.0 * X[:, 1]
    missing_at = (2, 5)
    rows = []
    for f in range(n_complete):
        for s in range(n_samples):
            rows.append((f, f"s{s:02d}", float(X[s, f])))
    for s in range(n_samples):
        rows.append(
            (99, f"s{s:02d}", None if s in missing_at else float(y[s]))
        )
    df = spark.createDataFrame(rows, ["fid", "sample", "v"])
    out = impute_pls(df, "fid", "sample", "v", n_components=2)
    got = {
        (r["fid"], r["sample"]): r
        for r in out.filter(F.col("fid") == 99).collect()
    }
    for s in missing_at:
        r = got[(99, f"s{s:02d}")]
        assert r["imputed"]
        assert abs(r["v"] - y[s]) < 0.5 * np.std(y)
    # observed values pass through unchanged
    assert not got[(99, "s00")]["imputed"]
    assert got[(99, "s00")]["v"] == pytest.approx(float(y[0]))


def test_cluster_timecourse_means(spark):
    rows = [
        (1, "g1", 0, 1.0), (1, "g1", 5, 2.0),
        (2, "g1", 0, 3.0), (2, "g1", 5, 4.0),
        (3, "g1", 0, 10.0), (3, "g1", 5, 20.0),
    ]
    df = spark.createDataFrame(rows, ["fid", "grp", "tp", "v"])
    out = ml.cluster_timecourse_means(
        df, ["fid"], {1: 0, 2: 0, 3: 1}, ["grp", "tp"], "v"
    ).collect()
    d = {(r["cluster"], r["tp"]): r["mean_value"] for r in out}
    assert d[(0, 0)] == pytest.approx(2.0)
    assert d[(0, 5)] == pytest.approx(3.0)
    assert d[(1, 5)] == pytest.approx(20.0)


def test_optimize_cluster_threshold():
    pts = np.array(
        [[0, 0], [0.1, 0], [5, 5], [5.1, 5], [10, 0], [10.1, 0]]
    ).astype(float)
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    link = ml.ward_linkage(d)
    thr, labels = ml.optimize_cluster_threshold(link, 6, target_n=3)
    assert labels.max() + 1 == 3
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[4] == labels[5]
