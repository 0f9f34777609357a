"""Tests: distributed-Gram PCA vs direct numpy SVD, NIPALS PLS sanity,
Ward clustering, Perseus round-trip, Phosphopath export shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from padua_spark.operators import ml
from padua_spark.sources.perseus import read_perseus, write_perseus
from padua_spark.sources.phosphopath import (
    phosphopath_ratio_rows,
    phosphopath_rows,
)


def _long_df(spark, X, samples):
    rows = [
        (f, s, float(X[j, f]))
        for f in range(X.shape[1])
        for j, s in enumerate(samples)
    ]
    return spark.createDataFrame(rows, ["feature_id", "sample", "value"])


def test_pca_matches_numpy_svd(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(6, 40))  # 6 samples × 40 features
    samples = [f"s{i}" for i in range(6)]
    df = _long_df(spark, X, samples)
    scores_df, weights_df, evr = ml.pca(
        df, ["feature_id"], "sample", "value", n_components=3
    )
    # Direct reference: SVD of feature-centered X.
    Xc = X - X.mean(axis=0, keepdims=True)
    U, S, Vt = np.linalg.svd(Xc, full_matrices=False)
    expected_scores = U[:, :3] * S[:3]
    expected_evr = (S**2 / (S**2).sum())[:3]
    assert np.allclose(evr, expected_evr, rtol=1e-8)
    got = np.zeros((6, 3))
    for r in scores_df.collect():
        got[samples.index(r["sample"]), r["pc"] - 1] = r["score"]
    for c in range(3):
        dot = np.dot(got[:, c], expected_scores[:, c])
        sign = 1.0 if dot >= 0 else -1.0
        assert np.allclose(got[:, c], sign * expected_scores[:, c],
                           atol=1e-6), f"PC{c+1}"
    # weights reproduce V (up to the same signs)
    W = np.zeros((40, 3))
    for r in weights_df.collect():
        W[r["feature_id"], r["pc"] - 1] = r["weight"]
    for c in range(3):
        dot = np.dot(W[:, c], Vt[c])
        sign = 1.0 if dot >= 0 else -1.0
        assert np.allclose(W[:, c], sign * Vt[c], atol=1e-6)


def test_pca_sign_canonical_and_gram_reconstruction(spark):
    """Scores are deterministic (not merely up-to-sign): the
    largest-|score| coordinate of every PC is positive, the result is
    invariant to input row order/partitioning, and at k = n the
    reconstruction Σ_pc score_x·score_y reproduces the centered Gram
    — the invariant the pca_scores oracle gate relies on."""
    rng = np.random.default_rng(11)
    X = rng.normal(size=(5, 30))
    samples = [f"s{i}" for i in range(5)]
    df = _long_df(spark, X, samples)
    scores_df, _, _ = ml.pca(
        df, ["feature_id"], "sample", "value", n_components=5
    )
    got = np.zeros((5, 5))
    for r in scores_df.collect():
        got[samples.index(r["sample"]), r["pc"] - 1] = r["score"]
    for c in range(5):
        j = int(np.argmax(np.abs(got[:, c])))
        assert got[j, c] >= 0, f"PC{c + 1} not sign-canonical"
    # row-order / partitioning invariance
    shuffled = df.orderBy(F.rand(7)).repartition(13)
    scores2, _, _ = ml.pca(
        shuffled, ["feature_id"], "sample", "value", n_components=5
    )
    got2 = np.zeros((5, 5))
    for r in scores2.collect():
        got2[samples.index(r["sample"]), r["pc"] - 1] = r["score"]
    assert np.allclose(got, got2, atol=1e-9)
    # Gram reconstruction at full rank
    Xc = X - X.mean(axis=0, keepdims=True)
    G = Xc @ Xc.T
    assert np.allclose(got @ got.T, G, atol=1e-8)


def test_pls_gram_matches_driver_nipals(spark):
    """The distributed Gram-trick PLS (sample-space kernel NIPALS +
    X₀ᵀr weight recovery) reproduces the driver-side full-matrix
    NIPALS scores and weights on wide data — the at-scale path that
    removes the MAX_DRIVER_CELLS guard."""
    rng = np.random.default_rng(17)
    n_s, n_f, k = 6, 300, 3
    X = rng.normal(size=(n_s, n_f))
    samples = [f"s{i}" for i in range(n_s)]
    y = np.array([1.0 if i % 2 else 0.0 for i in range(n_s)])
    df = _long_df(spark, X, samples)
    scores_df, weights_df = ml.pls_gram(
        df, ["feature_id"], "sample", "value",
        {s: y[i] for i, s in enumerate(samples)}, n_components=k,
    )
    T_ref, W_ref, _P, _Q = ml.nipals_pls(X, y, n_components=k)
    T = np.zeros((n_s, k))
    for r in scores_df.collect():
        T[samples.index(r["sample"]), r["pc"] - 1] = r["score"]
    assert np.allclose(T, T_ref, atol=1e-8), np.abs(T - T_ref).max()
    W = np.zeros((n_f, k))
    for r in weights_df.collect():
        W[r["feature_id"], r["pc"] - 1] = r["weight"]
    assert np.allclose(W, W_ref, atol=1e-8), np.abs(W - W_ref).max()
    # scores orthogonal (PLS invariant)
    TT = T.T @ T
    off = TT - np.diag(np.diag(TT))
    assert np.abs(off).max() < 1e-8


def test_nipals_pls_sanity(spark):
    rng = np.random.default_rng(5)
    X = rng.normal(size=(12, 30))
    beta = np.zeros(30)
    beta[:3] = [2.0, -1.0, 0.5]
    y = X @ beta + rng.normal(scale=0.01, size=12)
    T, W, P, Q = ml.nipals_pls(X, y, n_components=5)
    # scores orthogonal
    TT = T.T @ T
    off = TT - np.diag(np.diag(TT))
    assert np.abs(off).max() < 1e-8
    # regression recovers y well
    y_pred = T @ Q.T[:, 0] + y.mean()
    resid = y - y_pred
    assert np.std(resid) < 0.1 * np.std(y)
    assert np.corrcoef(y_pred, y)[0, 1] > 0.99


def test_plsda_separates_groups(spark):
    rng = np.random.default_rng(11)
    X = rng.normal(size=(10, 25))
    X[:5, :5] += 3.0  # group a shifted in first 5 features
    samples = [f"s{i}" for i in range(10)]
    df = _long_df(spark, X, samples).withColumn(
        "grp",
        F.when(
            F.col("sample").isin([f"s{i}" for i in range(5)]), "a"
        ).otherwise("b"),
    )
    T, W, got_samples, feats = ml.plsda(
        df, ["feature_id"], "sample", "value", "grp", "a", "b"
    )
    t1 = {s: T[i, 0] for i, s in enumerate(got_samples)}
    a_scores = [t1[f"s{i}"] for i in range(5)]
    b_scores = [t1[f"s{i}"] for i in range(5, 10)]
    assert max(a_scores) < min(b_scores) or min(a_scores) > max(b_scores)


def test_ward_clustering_obvious_groups(spark):
    pts = np.array(
        [[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [5.0, 5.0], [5.1, 5.0],
         [5.0, 5.1]]
    )
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    link = ml.ward_linkage(d)
    labels = ml.fcluster_by_distance(link, 1.0, 6)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5]
    assert labels[0] != labels[3]


def test_distributed_distance_matrix(spark):
    X = np.array([[0.0, 3.0], [4.0, 0.0]]).T  # 2 samples, 2 features
    df = _long_df(spark, X.T, ["a", "b"])
    rows = ml.sample_distance_matrix(
        df, ["feature_id"], "sample", "value"
    ).collect()
    d = {(r["sample_x"], r["sample_y"]): r["distance"] for r in rows}
    assert d[("a", "b")] == pytest.approx(5.0)
    assert d[("a", "a")] == pytest.approx(0.0)


def test_perseus_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, "P1;P2", "+", 100.5), (1, "P3", None, 7.25)],
        ["id", "Proteins", "Reverse", "Intensity S1"],
    )
    path = str(tmp_path / "perseus.txt")
    write_perseus(df, path)
    lines = open(path).read().splitlines()
    assert lines[1].startswith("#!{Type}")
    assert lines[1].split("\t") == ["#!{Type}N", "T", "C", "E"]
    back = read_perseus(spark, path)
    # 'id' is tagged N → cast to double by the type row
    rows = {r["id"]: r for r in back.collect()}
    assert rows[0.0]["Intensity S1"] == 100.5
    assert rows[1.0]["Proteins"] == "P3"


def test_phosphopath_rows(spark):
    feats = spark.createDataFrame(
        [
            ("P07830-2;Q5", "S", 15, 2),
            ("Q9Y6K9", "Y", 7, 1),
        ],
        ["Proteins", "Amino acid", "Position", "Multiplicity"],
    )
    rows = {r["protein"]: r for r in phosphopath_rows(feats).collect()}
    assert rows["P07830"]["protein_rsite"] == "P07830-S15"
    assert rows["P07830"]["multiplicity"] == "x2"
    assert rows["Q9Y6K9"]["rsite"] == "Y7"


def test_phosphopath_ratio_rows(spark):
    meas = spark.createDataFrame(
        [
            (1, "Control", 0, 2.0),
            (1, "Control", 0, 4.0),
            (1, "PGE2", 0, 6.0),
            (1, "Control", 5, 1.0),
            (1, "PGE2", 5, 3.0),
        ],
        ["feature_id", "Group", "Timepoint", "value"],
    )
    out = phosphopath_ratio_rows(
        meas, "feature_id", "Group", "Timepoint", "value", "Control",
        ["PGE2"],
    ).collect()
    d = {r["ID"]: r["Ratio"] for r in out}
    assert d["1_1"] == pytest.approx(2.0)   # 6 / mean(2,4)
    assert d["1_2"] == pytest.approx(3.0)   # 3 / 1


def test_write_r_roundtrip(spark, tmp_path):
    """S6 write_r: @-joined row keys, CSV round-trips (documented
    intent of the reference's broken io.write_r, io.py:188-203)."""
    from padua_spark.sources.phosphopath import write_r

    df = spark.createDataFrame(
        [("P1", "S", 12, 1.5), ("P2", "T", 7, -0.25)],
        "protein string, aa string, pos int, v double",
    )
    out = str(tmp_path / "rcsv")
    write_r(df, out, key_cols=["protein", "aa", "pos"])
    back = spark.read.option("header", True).csv(out)
    rows = {r["row_key"]: r["v"] for r in back.collect()}
    assert rows == {"P1@S@12": "1.5", "P2@T@7": "-0.25"}


def test_distinct_level_values(spark):
    """R5: distinct values of an index level (reference intent of the
    broken process.get_unique_indices, process.py:168-175)."""
    from padua_spark.operators.process import distinct_level_values

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "lvl string, v int"
    )
    got = sorted(
        r["lvl"] for r in distinct_level_values(df, "lvl").collect()
    )
    assert got == ["a", "b"]


def test_persisted_intermediates_tracked_and_freed(spark):
    """Operators that persist() a shared stage record it on the lazy
    result; unpersist_intermediates frees the blocks after the caller's
    action (the long-lived-session leak fix)."""
    from padua_spark.extensions.dedup import minhash_lsh_candidates
    from padua_spark.io_utils import unpersist_intermediates

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 3} jumps over the lazy dog")
         for i in range(30)],
        ["doc_id", "text"],
    )
    out = minhash_lsh_candidates(docs, "doc_id", "text")
    out.count()  # materializes the persisted signature stage
    cached = getattr(out, "_padua_cached", [])
    assert len(cached) == 1
    assert cached[0].storageLevel.useMemory  # actually persisted
    n = unpersist_intermediates(out, blocking=True)
    assert n == 1
    assert not cached[0].storageLevel.useMemory  # freed
    assert unpersist_intermediates(out) == 0  # idempotent


def test_compact_parquet(spark, tmp_path):
    """Compaction rewrites a many-small-files directory into few
    even-sized files with identical data, and refuses in-place."""
    import glob

    import pytest as _pytest

    from padua_spark.io_utils import compact_parquet

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    spark.range(10_000).selectExpr(
        "id", "id * 2 AS v"
    ).repartition(64).write.parquet(src)
    assert len(glob.glob(src + "/part-*.parquet")) == 64
    n = compact_parquet(spark, src, dst, target_mb=512)
    files = glob.glob(dst + "/part-*.parquet")
    assert len(files) == n == 1  # tiny data -> one file
    a = sorted(r["id"] for r in spark.read.parquet(dst).collect())
    assert a == list(range(10_000))
    with _pytest.raises(ValueError):
        compact_parquet(spark, src, src)
    # aliases of the source must be rejected too: trailing slash,
    # relative path, file: scheme, and a symlink to the directory
    import os

    with _pytest.raises(ValueError):
        compact_parquet(spark, src, src + "/")
    with _pytest.raises(ValueError):
        compact_parquet(spark, src, "file:" + src)
    rel = os.path.relpath(src, os.getcwd())
    with _pytest.raises(ValueError):
        compact_parquet(spark, src, rel)
    link = str(tmp_path / "frag_link")
    os.symlink(src, link)
    with _pytest.raises(ValueError):
        compact_parquet(spark, src, link)


def test_jsonl_source_quarantine_and_roundtrip(spark, tmp_path):
    """JSONL ingest: clean lane parses typed rows, corrupt lines land
    raw in the quarantine lane (never dropped, never fatal), and the
    write side round-trips."""
    from padua_spark.io_utils import unpersist_intermediates
    from padua_spark.sources.jsonl import (
        read_jsonl_docs,
        split_corrupt,
        write_jsonl,
    )

    src = tmp_path / "docs.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "a"}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "b"}\n'
        '{"doc_id": 3, "text": "truncated...\n'  # malformed
        'not json at all\n'                      # malformed
        '{"doc_id": 4, "text": "ok", "lang": "en", "source": "a"}\n'
    )
    df = read_jsonl_docs(spark, str(src))
    clean, bad = split_corrupt(df)
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[2]["lang"] == "fr"
    bad_rows = [r["raw_record"] for r in bad.collect()]
    assert len(bad_rows) == 2
    assert "not json at all" in bad_rows
    assert unpersist_intermediates(clean) == 1
    out = str(tmp_path / "out")
    write_jsonl(clean, out, compression="gzip")
    back = read_jsonl_docs(spark, out)
    clean2, bad2 = split_corrupt(back)
    assert clean2.count() == 3 and bad2.count() == 0


def test_jsonl_split_corrupt_via_sink(spark, tmp_path):
    """The at-scale quarantine variant: clean lane lands in parquet
    with no persist of the raw scan, and the from_json re-parse lane
    partitions the input identically to split_corrupt — including a
    schema-violating (valid-JSON) line."""
    from padua_spark.sources.jsonl import (
        read_jsonl_docs,
        split_corrupt,
        split_corrupt_via_sink,
    )

    src = tmp_path / "docs.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en", "source": "a"}\n'
        '{"doc_id": "oops", "text": "bad id", "lang": "en", "source": "a"}\n'
        '{"doc_id": 3, "text": "truncated...\n'
        'not json at all\n'
        '{"doc_id": 4, "text": "ok", "lang": "en", "source": "a"}\n'
    )
    clean, bad = split_corrupt_via_sink(
        spark, str(src), str(tmp_path / "clean_pq")
    )
    got_clean = sorted(r["doc_id"] for r in clean.collect())
    got_bad = sorted(r["raw_record"] for r in bad.collect())
    # reference semantics: whatever the cached variant produces
    ref_clean, ref_bad = split_corrupt(read_jsonl_docs(spark, str(src)))
    assert got_clean == sorted(r["doc_id"] for r in ref_clean.collect())
    assert got_bad == sorted(r["raw_record"] for r in ref_bad.collect())
    # the two lanes partition the 5 input lines
    assert len(got_clean) + len(got_bad) == 5
    assert "not json at all" in got_bad
    # clean lane is parquet-backed (re-readable without the source)
    import os

    assert any(
        f.endswith(".parquet") for f in os.listdir(tmp_path / "clean_pq")
    )
