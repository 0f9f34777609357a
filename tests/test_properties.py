"""Property-based tests (hypothesis) — SURVEY.md §5 test plan: filter
idempotence, q-value monotonicity, melt/pivot round-trip, t-test vs
direct numpy, and engine-vs-SQL-twin equality for deterministic noise."""

import math

import duckdb
import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hst
from pyspark.sql import functions as F

from padua_spark.functions.distributions import student_t_sf
from padua_spark.functions.scalar import (
    deterministic_gaussian_sql,
    deterministic_uniform_sql,
)
from padua_spark.operators import filters as flt
from padua_spark.operators import process as proc
from padua_spark.operators import stats as st

SPARK_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SPARK_SETTINGS
@given(
    rows=hst.lists(
        hst.tuples(
            hst.integers(0, 50),
            hst.sampled_from(["a", "b", None]),
        ),
        min_size=1,
        max_size=60,
    ),
    match=hst.sampled_from(["a", "b", "c"]),
)
def test_remove_rows_matching_properties(spark, rows, match):
    df = spark.createDataFrame(rows, "k int, flag string")
    kept = flt.remove_rows_matching(df, "flag", match)
    once = kept.count()
    # idempotent
    assert flt.remove_rows_matching(kept, "flag", match).count() == once
    # complement partition: kept + (flag == match) == total (NULLs kept)
    dropped = df.filter(F.col("flag") == match).count()
    assert once + dropped == len(rows)


@SPARK_SETTINGS
@given(
    ps=hst.lists(
        hst.floats(
            min_value=0.0, max_value=1.0,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=80,
    )
)
def test_qvalues_properties(spark, ps):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], ["k", "p_value"]
    )
    out = sorted(
        st.qvalues(df, "p_value", pi0=1.0).collect(),
        key=lambda r: (r["p_value"], r["k"]),
    )
    qs = [r["q_value"] for r in out]
    assert all(0 <= q <= 1 for q in qs)
    assert all(a <= b + 1e-12 for a, b in zip(qs, qs[1:]))
    assert all(r["q_value"] >= r["p_value"] - 1e-12 for r in out)
    # the smallest q equals min(m·p/rank) overall
    m = len(ps)
    expected_min = min(
        min(1.0, m * p / (i + 1)) for i, p in enumerate(sorted(ps))
    )
    assert min(qs) == pytest.approx(expected_min, rel=1e-12)


@SPARK_SETTINGS
@given(
    vals=hst.lists(
        hst.tuples(
            hst.integers(0, 8),
            hst.sampled_from(["x", "y", "z"]),
            hst.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_melt_pivot_roundtrip(spark, vals):
    df = spark.createDataFrame(vals, ["k", "s", "v"])
    wide = proc.pivot_wider(
        df, ["k"], "s", "v", pivot_values=["x", "y", "z"]
    )
    back = proc.melt(wide, ["k"], ["x", "y", "z"], "s", "v").filter(
        F.col("v").isNotNull()
    )
    got = {(r["k"], r["s"]): r["v"] for r in back.collect()}
    assert got == {(k, s): v for k, s, v in vals}


@SPARK_SETTINGS
@given(
    data=hst.lists(
        hst.tuples(
            hst.sampled_from(["a", "b"]),
            hst.floats(
                min_value=-100, max_value=100,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=4,
        max_size=50,
    )
)
def test_ttest_matches_numpy(spark, data):
    a = np.array([v for g, v in data if g == "a"])
    b = np.array([v for g, v in data if g == "b"])
    df = spark.createDataFrame(
        [(1, g, float(v)) for g, v in data], ["f", "grp", "v"]
    )
    row = st.ttest_ind(df, ["f"], "grp", "v", "a", "b").collect()[0]
    if len(a) < 2 or len(b) < 2:
        assert row["t_stat"] is None
        return
    va, vb = a.var(ddof=1), b.var(ddof=1)
    dof = len(a) + len(b) - 2
    pooled = ((len(a) - 1) * va + (len(b) - 1) * vb) / dof
    denom = math.sqrt(pooled * (1 / len(a) + 1 / len(b)))
    if denom == 0:
        assert row["t_stat"] is None
        return
    t = (a.mean() - b.mean()) / denom
    assert row["t_stat"] == pytest.approx(t, rel=1e-9, abs=1e-9)
    assert row["p_value"] == pytest.approx(
        float(student_t_sf(t, dof)), rel=1e-9, abs=1e-12
    )


@settings(max_examples=50, deadline=None)
@given(
    key=hst.integers(0, 2**40),
    salt=hst.integers(0, 1000),
)
def test_noise_sql_twin_bit_exact(key, salt):
    """The DuckDB rendering of the LCG noise must equal the same
    arithmetic evaluated in Python (what Spark computes)."""
    con = duckdb.connect()
    u_sql = con.execute(
        f"SELECT {deterministic_uniform_sql(str(key), salt)}"
    ).fetchone()[0]
    g_sql = con.execute(
        f"SELECT {deterministic_gaussian_sql(str(key), salt)}"
    ).fetchone()[0]
    M, A, B = 2147483647, 48271, 1013904223 % 2147483647
    x = ((key % M) + (salt * 2654435761) % M) % M
    for _ in range(3):
        x = (x * A + B) % M
    xs = []
    xx = x
    for _ in range(12):
        xx = (xx * A + B) % M
        xs.append(xx / M)
    assert u_sql == xs[0]
    # left-associated sequential sum — the order both engines evaluate
    assert g_sql == sum(xs) - 6.0


@SPARK_SETTINGS
@given(
    vals=hst.lists(
        hst.tuples(
            hst.sampled_from(["g1", "g2", "g3"]),
            hst.one_of(
                hst.none(),
                hst.floats(
                    min_value=-1e6,
                    max_value=1e6,
                    allow_nan=False,
                    allow_infinity=False,
                ),
            ),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_group_medians_match_numpy(spark, vals):
    """Relational exact median == numpy median per group, nulls
    excluded, groups with no non-null values absent."""
    from padua_spark.operators.normalization import group_medians

    df = spark.createDataFrame(vals, "g string, v double")
    got = {
        r["g"]: r["m"]
        for r in group_medians(df, ["g"], "v", "m").collect()
    }
    expect = {}
    for g in {g for g, _ in vals}:
        xs = [v for gg, v in vals if gg == g and v is not None]
        if xs:
            expect[g] = float(np.median(xs))
    assert set(got) == set(expect)
    for g in expect:
        assert got[g] == pytest.approx(expect[g], rel=1e-12, abs=1e-12)


@SPARK_SETTINGS
@given(
    rows=hst.lists(
        hst.tuples(
            hst.sampled_from(["k1", "k2"]),
            hst.integers(0, 3),  # keep value with deliberate ties
        ),
        min_size=1,
        max_size=40,
    )
)
def test_exact_dedup_id_tiebreak_unique(spark, rows):
    """With a row-unique id_col, exact_dedup emits exactly one row per
    key — the lexicographic (keep, id) minimum — under any tie
    pattern."""
    from padua_spark.extensions.dedup import exact_dedup

    data = [(k, keep, i) for i, (k, keep) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, keep int, rid int")
    out = exact_dedup(df, ["k"], "keep", id_col="rid").collect()
    keys = [r["k"] for r in out]
    assert len(keys) == len(set(keys))  # one row per key
    expect = {}
    for k, keep, rid in data:
        cur = expect.get(k)
        if cur is None or (keep, rid) < cur:
            expect[k] = (keep, rid)
    got = {r["k"]: (r["keep"], r["rid"]) for r in out}
    assert got == expect


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=hst.lists(
        hst.text(
            alphabet=" \t\n\x0b\f\rabzAZ09.,!'—中é" ,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_bpe_pattern_java_re2_parity(spark, texts):
    """BPE_PATTERN must count identically under Java regex (Spark) and
    RE2 (DuckDB) for arbitrary text including the \\x0B whitespace
    corner Java's \\s and RE2's \\s disagree on."""
    from padua_spark.extensions.text import BPE_PATTERN, bpe_token_count

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    got = {r["id"]: r["n"] for r in df.select(
        "id", bpe_token_count(F.col("text")).alias("n")
    ).collect()}
    con = duckdb.connect()
    pat = BPE_PATTERN.replace("'", "''")
    exp = {}
    for i, t in enumerate(texts):
        exp[i] = con.execute(
            f"SELECT coalesce(len(regexp_extract_all(?, '{pat}')), 0)",
            [t],
        ).fetchone()[0]
    assert got == exp


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=hst.lists(
        hst.text(
            alphabet=" \t\nabzAZ09.,!'中é\U0001F600",
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_fingerprint_duckdb_parity(spark, texts):
    """Rolling-hash fingerprint must be bit-identical across engines
    for arbitrary text, including astral-plane codepoints (Spark
    split('') and DuckDB string_split('') both yield codepoints)."""
    from padua_spark.extensions.text import fingerprint

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    got = {r["id"]: r["fp"] for r in df.select(
        "id", fingerprint(F.col("text")).alias("fp")
    ).collect()}
    con = duckdb.connect()
    sql = r"""
SELECT list_reduce(
  list_prepend(CAST(0 AS BIGINT),
    list_transform(
      list_filter(
        string_split(regexp_replace(lower(trim(?)), '\s+', ' ', 'g'), ''),
        c -> c <> ''),
      c -> CAST(ord(c) AS BIGINT))),
  (acc, c) -> (acc * 131 + c) % 2147483647)
"""
    exp = {i: con.execute(sql, [t]).fetchone()[0]
           for i, t in enumerate(texts)}
    assert got == exp


def test_weighted_sample_partition_invariant_and_weighted(spark):
    """weighted_sample_k: identical selection under any partitioning;
    heavier rows are (statistically) more likely to be selected; rows
    with non-positive weight never selected."""
    from padua_spark.extensions.sampling import weighted_sample_k

    rows = [(i, float(1 + (i % 10) * 10)) for i in range(500)]
    rows += [(1000, 0.0), (1001, -3.0)]
    df = spark.createDataFrame(rows, ["k", "w"])
    sel1 = {
        r.k for r in weighted_sample_k(df, "k", "w", 50, salt=3).collect()
    }
    sel2 = {
        r.k
        for r in weighted_sample_k(
            df.repartition(13), "k", "w", 50, salt=3
        ).collect()
    }
    assert sel1 == sel2
    assert len(sel1) == 50
    assert not sel1 & {1000, 1001}
    # weight 91 rows (i%10==9) should be overrepresented vs weight 1
    heavy = sum(1 for k in sel1 if k % 10 == 9)
    light = sum(1 for k in sel1 if k % 10 == 0)
    assert heavy > light


def test_winsorize_bounds_and_nulls(spark):
    """winsorize: output within the group percentile bounds, interior
    values untouched, NULLs preserved."""
    from padua_spark.operators.normalization import winsorize

    rows = [("g", float(v)) for v in range(1, 101)] + [("g", None)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = winsorize(df, ["grp"], "v", lo=0.1, hi=0.9).collect()
    vals = [r.v_winsor for r in out if r.v is not None]
    lo = np.percentile(np.arange(1.0, 101.0), 10)
    hi = np.percentile(np.arange(1.0, 101.0), 90)
    assert min(vals) == pytest.approx(lo)
    assert max(vals) == pytest.approx(hi)
    untouched = [r for r in out if r.v is not None and lo < r.v < hi]
    assert all(r.v_winsor == r.v for r in untouched)
    assert any(r.v is None and r.v_winsor is None for r in out)


def test_tfidf_rare_term_outranks_common(spark):
    """tfidf_top_terms: a term unique to one doc outranks a term that
    appears in every doc, at equal in-doc frequency."""
    from padua_spark.extensions.text import tfidf_top_terms

    docs = [(0, "common rare common rare")] + [
        (i, "common filler common filler") for i in range(1, 5)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    top = tfidf_top_terms(df, "doc_id", "text", k=1).collect()
    d0 = [r for r in top if r.doc_id == 0][0]
    assert d0.token == "rare"
    assert d0.doc_freq == 1


def test_bigram_lm_score_short_docs_and_repeats(spark):
    """bigram_lm_score: docs with <2 tokens produce no row; a document
    made of the corpus's dominant repeated bigram scores higher than a
    one-off transition."""
    from padua_spark.extensions.text import bigram_lm_score

    docs = [
        (0, "a b a b a b a b"),
        (1, "a b a b a b"),
        (2, "x y"),
        (3, "single"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.doc_id: r for r in bigram_lm_score(df, "doc_id", "text").collect()}
    assert 3 not in out and 4 not in out
    assert out[0].mean_logp > out[2].mean_logp


def test_kmv_sketch_partition_invariant_and_accurate(spark):
    """KMV: estimate is partitioning-invariant (k-min of a union is the
    union of k-mins), exact below k, and within the ~1/sqrt(k) relative
    error envelope above k."""
    from padua_spark.extensions.sketches import kmv_distinct

    rows = [("big", (i * 2654435761) % 2147483647) for i in range(5000)]
    rows += [("small", h) for h in (7, 42, 99)]
    df = spark.createDataFrame(rows, ["g", "h"])
    k = 128
    out1 = {
        r.g: r for r in kmv_distinct(df, ["g"], "h", k=k).collect()
    }
    out2 = {
        r.g: r
        for r in kmv_distinct(df.repartition(17), ["g"], "h", k=k).collect()
    }
    for g in out1:
        assert out1[g].est_distinct == out2[g].est_distinct
        assert out1[g].kth_hash == out2[g].kth_hash
    assert out1["small"].est_distinct == 3.0
    assert out1["small"].kth_hash is None
    true_n = len({h for g, h in rows if g == "big"})
    est = out1["big"].est_distinct
    assert abs(est - true_n) / true_n < 4.0 / (k ** 0.5)


def test_novel_documents_semantics(spark):
    """novel_documents: batch-internal dup keeps min id; docs whose
    normalized text already exists in the seen corpus are dropped;
    whitespace-normalization-equal texts collide."""
    from padua_spark.extensions.dedup import novel_documents

    seen = spark.createDataFrame(
        [(100, "already known text")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [
            (1, "fresh document"),
            (2, "fresh document"),          # batch dup of 1
            (3, "Already   KNOWN text"),    # normalizes to seen
            (4, "another new one"),
        ],
        ["doc_id", "text"],
    )
    out = sorted(
        r.doc_id for r in novel_documents(new, seen, "doc_id", "text").collect()
    )
    assert out == [1, 4]


def test_kmv_overlap_identical_and_disjoint(spark):
    """kmv_overlap: two groups with identical value sets estimate
    Jaccard 1.0; disjoint groups estimate 0.0; estimates are
    partitioning-invariant."""
    from padua_spark.extensions.sketches import kmv_overlap

    shared = [((i * 48271) % 2147483647) for i in range(300)]
    other = [((i * 48271 + 7) % 2147483647) for i in range(300)]
    rows = (
        [("a", h) for h in shared]
        + [("b", h) for h in shared]
        + [("c", h) for h in other]
    )
    df = spark.createDataFrame(rows, ["g", "h"])
    out = {
        (r.g_a, r.g_b): r
        for r in kmv_overlap(df, "g", "h", k=64).collect()
    }
    out2 = {
        (r.g_a, r.g_b): r
        for r in kmv_overlap(df.repartition(11), "g", "h", k=64).collect()
    }
    assert out[("a", "b")].est_jaccard == 1.0
    ac = out[("a", "c")]
    assert ac.est_jaccard < 0.2
    for key in out:
        assert out[key].est_overlap == out2[key].est_overlap


def test_quantile_normalize_equalizes_distributions(spark):
    """After quantile normalization, every equal-depth sample holds
    exactly the same multiset of values (the defining property), and
    the common distribution is the rank-wise mean of the inputs."""
    from padua_spark.operators.normalization import quantile_normalize

    rows = (
        [("s1", i, float(v)) for i, v in enumerate([5, 2, 3, 4])]
        + [("s2", i, float(v)) for i, v in enumerate([400, 100, 300, 200])]
    )
    df = spark.createDataFrame(rows, ["sample", "fid", "v"])
    out = quantile_normalize(df, ["sample"], "v", ["fid"]).collect()
    by_sample = {}
    for r in out:
        by_sample.setdefault(r.sample, []).append(r.v_qnorm)
    assert sorted(by_sample["s1"]) == sorted(by_sample["s2"])
    # rank-wise means: sorted s1 = 2,3,4,5; s2 = 100,200,300,400
    assert sorted(by_sample["s1"]) == [51.0, 101.5, 152.0, 202.5]
    # null passes through unchanged
    df2 = spark.createDataFrame(
        rows + [("s1", 99, None)], ["sample", "fid", "v"]
    )
    out2 = quantile_normalize(df2, ["sample"], "v", ["fid"]).collect()
    nulls = [r for r in out2 if r.fid == 99]
    assert len(nulls) == 1 and nulls[0].v_qnorm is None


def test_quantize_int8_bounds_and_error(spark):
    """quantize_int8: q_max <= 127 always; per-element reconstruction
    error is bounded by scale/2, so mse <= scale^2/4; zero vectors
    quantize to zeros with scale 0."""
    from padua_spark.extensions.similarity import quantize_int8

    rows = [
        (0, [1.0, -2.0, 0.5, 127.0]),
        (1, [0.001, -0.003, 0.002, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r for r in quantize_int8(df, "vec_id", "embedding").collect()}
    for r in out.values():
        assert r.q_max is None or r.q_max <= 127
        assert all(abs(v) <= 127 for v in r.q)
    assert out[0].q[3] == 127 and out[0].scale == 1.0
    for vid in (0, 1):
        assert out[vid].mse <= out[vid].scale ** 2 / 4 + 1e-12
    assert out[2].scale == 0.0 and out[2].q == [0, 0, 0, 0]
    assert out[2].mse == 0.0


def test_kmv_partials_memory_bound(spark):
    """Scale probe: the KMV partial frame is bounded by
    partitions x groups rows with <= k values each, regardless of input
    size — the property that makes the sketch feasible at 100 TB."""
    from padua_spark.extensions.sketches import kmv_partials

    n = 50_000
    df = (
        spark.range(n)
        .selectExpr("id % 2 AS g", "(id * 2654435761) % 2147483647 AS h")
        .repartition(8)
    )
    part = kmv_partials(df, ["g"], "h", k=32).collect()
    assert len(part) <= 8 * 2
    assert all(len(r.kmin) <= 32 for r in part)
    assert all(r.kmin == sorted(r.kmin) for r in part)


@SPARK_SETTINGS
@given(
    vals=hst.lists(
        hst.tuples(
            hst.sampled_from(["g1", "g2"]),
            hst.one_of(
                hst.none(),
                hst.floats(
                    min_value=-1e6,
                    max_value=1e6,
                    allow_nan=False,
                    allow_infinity=False,
                ),
            ),
        ),
        min_size=1,
        max_size=60,
    ),
    p=hst.sampled_from([0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]),
)
def test_group_percentiles_match_numpy(spark, vals, p):
    """Relational exact interpolated percentile == numpy
    (linear-interpolation definition) per group, at the boundaries
    too; all-NULL groups absent."""
    from padua_spark.operators.normalization import group_percentiles

    df = spark.createDataFrame(vals, "g string, v double")
    got = {
        r["g"]: r["q"]
        for r in group_percentiles(df, ["g"], "v", {"q": p}).collect()
    }
    expect = {}
    for g in {g for g, _ in vals}:
        xs = [v for gg, v in vals if gg == g and v is not None]
        if xs:
            expect[g] = float(np.percentile(xs, p * 100))
    assert set(got) == set(expect)
    for g in expect:
        assert got[g] == pytest.approx(expect[g], rel=1e-9, abs=1e-9)


@SPARK_SETTINGS
@given(
    tgt=hst.lists(
        hst.tuples(hst.integers(0, 6), hst.integers(0, 100)),
        min_size=0, max_size=12, unique_by=lambda t: t[0],
    ),
    upd=hst.lists(
        hst.tuples(hst.integers(0, 6), hst.integers(0, 100)),
        min_size=0, max_size=12, unique_by=lambda t: t[0],
    ),
)
def test_upsert_properties(spark, tgt, upd):
    """MERGE invariants: output keys = union of keys; every update key
    carries the update's value; every unmatched target key survives
    unchanged; output has one row per key."""
    from padua_spark.operators.setops import upsert

    target = spark.createDataFrame(tgt, "k int, v int") if tgt else \
        spark.createDataFrame([], "k int, v int")
    updates = spark.createDataFrame(upd, "k int, v int") if upd else \
        spark.createDataFrame([], "k int, v int")
    got = {r["k"]: r["v"] for r in upsert(target, updates, ["k"]).collect()}
    t, u = dict(tgt), dict(upd)
    expect = {**t, **u}
    assert got == expect


@SPARK_SETTINGS
@given(
    left=hst.lists(
        hst.tuples(hst.integers(0, 2), hst.integers(0, 50)),
        min_size=0, max_size=10,
    ),
    right=hst.lists(
        hst.tuples(hst.integers(0, 2), hst.integers(0, 50)),
        min_size=0, max_size=10,
    ),
)
def test_interval_join_matches_bruteforce(spark, left, right):
    """Interval join == brute-force pair filter on (key match, rt in
    [lt, lt+10s])."""
    from pyspark.sql import functions as F

    from padua_spark.streaming import interval_join

    lf = spark.createDataFrame(
        [(k, i, t) for i, (k, t) in enumerate(left)],
        "k int, lid int, lsec int",
    )
    rf = spark.createDataFrame(
        [(k, i, t) for i, (k, t) in enumerate(right)],
        "k int, rid int, rsec int",
    )
    out = interval_join(
        lf.select("k", "lid", F.timestamp_seconds("lsec").alias("lts")),
        rf.select("k", "rid", F.timestamp_seconds("rsec").alias("rts")),
        ["k"],
        F.col("lts"),
        F.col("rts"),
        lower="0 seconds",
        upper="10 seconds",
    )
    got = {(r["k"], r["lid"], r["rid"]) for r in out.collect()}
    expect = {
        (lk, li, ri)
        for li, (lk, lt) in enumerate(left)
        for ri, (rk, rt) in enumerate(right)
        if lk == rk and lt <= rt <= lt + 10
    }
    assert got == expect


@SPARK_SETTINGS
@given(
    a=hst.lists(hst.integers(0, 8), min_size=1, max_size=20),
    b=hst.lists(hst.integers(0, 8), min_size=1, max_size=20),
)
def test_ks_and_mannwhitney_match_bruteforce(spark, a, b):
    """KS D == brute-force sup over jump points; 2U == brute-force
    doubled midrank sum — including heavy ties (small integer values
    force collisions)."""
    from padua_spark.operators.stats import ks_2samp_stat, mannwhitney_u_stat

    rows = [("a", float(x)) for x in a] + [("b", float(x)) for x in b]
    df = spark.createDataFrame(rows, "g string, v double")
    ks = ks_2samp_stat(df, "g", "v", "a", "b").collect()[0]
    mw = mannwhitney_u_stat(df, "g", "v", "a", "b").collect()[0]

    sa, sb = sorted(a), sorted(b)
    xs = sorted(set(a) | set(b))
    import bisect

    d_exp = max(
        abs(
            bisect.bisect_right(sa, x) / len(a)
            - bisect.bisect_right(sb, x) / len(b)
        )
        for x in xs
    )
    assert ks["d_stat"] == pytest.approx(d_exp, abs=1e-12)
    assert (ks["n_a"], ks["n_b"]) == (len(a), len(b))

    allv = sorted(a + b)
    # doubled midrank of value v among allv (1-based ranks)
    def two_rbar(v):
        lo = bisect.bisect_left(allv, v)
        hi = bisect.bisect_right(allv, v)
        return (lo + 1) + hi  # 2 * (lo+1+hi)/2

    r2a = sum(two_rbar(v) for v in a)
    u2a_exp = r2a - len(a) * (len(a) + 1)
    assert mw["u2_a"] == u2a_exp
    assert mw["u2_a"] + mw["u2_b"] == 2 * len(a) * len(b)


@SPARK_SETTINGS
@given(
    ann=hst.lists(
        hst.tuples(hst.integers(0, 25), hst.sampled_from(["T1", "T2", "T3"])),
        min_size=1,
        max_size=60,
    ),
    sel=hst.lists(hst.integers(0, 30), min_size=0, max_size=15),
)
def test_hypergeom_enrichment_properties(spark, ann, sel):
    """Against exact math.comb rationals under arbitrary annotation /
    hit-list shapes (duplicates, unannotated hits, empty selection):
    p in [0,1], counts consistent, and the tail sum exact to 1e-9."""
    from padua_spark.operators.external import hypergeom_enrichment

    ann_df = spark.createDataFrame(ann, "id int, term string")
    sel_df = spark.createDataFrame([(s,) for s in sel], "id int")
    out = hypergeom_enrichment(sel_df, ann_df, "id", "term").collect()
    ann_set = set(ann)
    bg = {i for i, _ in ann_set}
    hits = set(sel) & bg
    n_sel, n_bg = len(hits), len(bg)
    terms = {t for _, t in ann_set}
    assert {r["term"] for r in out} == terms
    for r in out:
        ids_t = {i for i, t in ann_set if t == r["term"]}
        k, bigk = len(ids_t & hits), len(ids_t)
        assert (r["k_selected"], r["k_background"]) == (k, bigk)
        assert (r["n_selected"], r["n_background"]) == (n_sel, n_bg)
        p_exact = sum(
            math.comb(bigk, i) * math.comb(n_bg - bigk, n_sel - i)
            for i in range(k, min(bigk, n_sel) + 1)
        ) / math.comb(n_bg, n_sel)
        assert abs(r["p_value"] - min(1.0, p_exact)) < 1e-9
        assert 0.0 <= r["p_value"] <= 1.0


@SPARK_SETTINGS
@given(
    n_s=hst.integers(3, 7),
    n_f=hst.integers(4, 24),
    k=hst.integers(1, 3),
    seed=hst.integers(0, 10_000),
)
def test_pls_gram_matches_nipals_properties(spark, n_s, n_f, k, seed):
    """Distributed kernel-PLS == driver full-matrix NIPALS across
    random shapes/components (scores AND weights, atol 1e-7)."""
    from padua_spark.operators import ml

    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n_s, n_f))
    y = rng.integers(0, 2, size=n_s).astype(float)
    if y.min() == y.max():  # degenerate response: flip one
        y[0] = 1.0 - y[0]
    samples = [f"s{i}" for i in range(n_s)]
    rows = [
        (f, s, float(X[j, f]))
        for f in range(n_f)
        for j, s in enumerate(samples)
    ]
    df = spark.createDataFrame(rows, ["feature_id", "sample", "value"])
    k = min(k, n_s - 1)
    scores_df, weights_df = ml.pls_gram(
        df, ["feature_id"], "sample", "value",
        {s: y[i] for i, s in enumerate(samples)}, n_components=k,
    )
    T_ref, W_ref, _P, _Q = ml.nipals_pls(X, y, n_components=k)
    T = np.zeros((n_s, k))
    for r in scores_df.collect():
        T[samples.index(r["sample"]), r["pc"] - 1] = r["score"]
    assert np.allclose(T, T_ref, atol=1e-7), np.abs(T - T_ref).max()
    W = np.zeros((n_f, k))
    for r in weights_df.collect():
        W[r["feature_id"], r["pc"] - 1] = r["weight"]
    assert np.allclose(W, W_ref, atol=1e-7), np.abs(W - W_ref).max()


def test_cms_sketch_bounds_and_width_exactness(spark):
    """Count-min invariants: estimates NEVER undercount (est >= exact
    for every token, even at width=8 where collisions are forced); at
    a width far above the vocabulary size the estimates are exact; the
    sketch is partition-invariant (mergeable partial aggregation)."""
    from padua_spark.extensions.sketches import (
        cms_estimate,
        cms_token_sketch,
    )

    rows = [
        (i, " ".join(f"tok{(i * 7 + j) % 13}" for j in range(20)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    toks = df.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    exact = {
        r["token"]: r["n"]
        for r in toks.groupBy("token").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    probes = spark.createDataFrame(
        [(t,) for t in exact], ["token"]
    )
    for width, must_be_exact in [(8, False), (4096, True)]:
        sketch = cms_token_sketch(df, "text", depth=4, width=width)
        est = {
            r["token"]: r["cms_est"]
            for r in cms_estimate(
                sketch, probes, depth=4, width=width
            ).collect()
        }
        for t, n in exact.items():
            assert est[t] >= n, (width, t, est[t], n)
            if must_be_exact:
                assert est[t] == n, (width, t, est[t], n)
    # partition invariance: same grid from a reshuffled input
    a = sorted(
        tuple(r)
        for r in cms_token_sketch(df, "text", depth=4, width=64).collect()
    )
    b = sorted(
        tuple(r)
        for r in cms_token_sketch(
            df.repartition(17), "text", depth=4, width=64
        ).collect()
    )
    assert a == b


@SPARK_SETTINGS
@given(
    docs=hst.lists(
        hst.lists(
            hst.sampled_from(["x", "y", "z", "w"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    ),
    k=hst.integers(1, 4),
)
def test_dedup_spans_properties(spark, docs, k):
    """Against a direct per-span simulation under arbitrary tiny
    corpora: surviving occurrences are EXACTLY the (id, pos)-first
    occurrence of each distinct span, and reconstruction preserves
    surviving-span order."""
    from padua_spark.extensions.dedup import dedup_spans

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           dedup_spans(df, "doc_id", "text", span_tokens=k).collect()}
    seen: set = set()
    for i, toks in enumerate(docs):
        spans = [
            " ".join(toks[b * k:(b + 1) * k])
            for b in range((len(toks) + k - 1) // k)
        ]
        kept = []
        for s in spans:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        assert out[i]["n_spans"] == len(spans)
        assert out[i]["n_kept"] == len(kept)
        assert out[i]["text_dedup"] == " ".join(kept)


@SPARK_SETTINGS
@given(
    pairs=hst.lists(
        hst.tuples(hst.integers(0, 6), hst.integers(0, 6)),
        min_size=3,
        max_size=25,
    )
)
def test_wilcoxon_signed_rank_matches_bruteforce(spark, pairs):
    """W+ equals the brute-force midrank sum of positive differences
    under heavy ties (small integers), zeros dropped, and
    W+ + W- == n(n+1)/2 (doubled: 2W+ + 2W- == n(n+1))."""
    import bisect

    from padua_spark.operators.stats import wilcoxon_signed_rank_stats

    rows = []
    for i, (a, b) in enumerate(pairs):
        rows.append((i, "x", float(a)))
        rows.append((i, "y", float(b)))
    df = spark.createDataFrame(rows, ["pair", "cond", "v"])
    out = wilcoxon_signed_rank_stats(
        df, ["pair"], "cond", "v", "x", "y"
    ).collect()[0]
    d = [a - b for a, b in pairs if a != b]
    if not d:
        assert out["n_nonzero"] is None or out["n_nonzero"] == 0
        return
    absd = sorted(abs(x) for x in d)

    def two_rbar(v):
        lo = bisect.bisect_left(absd, v)
        hi = bisect.bisect_right(absd, v)
        return (lo + 1) + hi

    w2p = sum(two_rbar(abs(x)) for x in d if x > 0)
    assert out["w2_plus"] == w2p
    assert out["n_nonzero"] == len(d)
    n = len(d)
    assert out["w2_plus"] + out["w2_minus"] == n * (n + 1)


@SPARK_SETTINGS
@given(
    docs=hst.lists(
        hst.lists(
            hst.sampled_from(["spark", "join", "scan", "row", "fast"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=12,
    ),
    query=hst.lists(
        hst.sampled_from(["spark", "join", "missing"]),
        min_size=1,
        max_size=3,
    ),
)
def test_bm25_matches_pure_python(spark, docs, query):
    """bm25_topk equals a direct pure-Python BM25 on random tiny
    corpora (scores to 1e-9, identical ranked id set)."""
    from padua_spark.extensions.text import bm25_topk

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    qs = " ".join(query)
    q_toks = sorted(set(query))
    # pure-python reference
    tokenized = {i: toks for i, toks in enumerate(docs)}
    n_docs = len(docs)
    avgdl = sum(len(t) for t in tokenized.values()) / n_docs
    dfreq = {
        t: sum(1 for toks in tokenized.values() if t in toks)
        for t in q_toks
    }
    expected = {}
    for i, toks in tokenized.items():
        s, hits = 0.0, 0
        for t in q_toks:
            tf = toks.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(
                1 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            )
            denom = tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl)
            s += idf * tf * 2.2 / denom
        if hits:
            expected[i] = (s, hits)
    got = {
        r["doc_id"]: (r["score"], r["n_hits"])
        for r in bm25_topk(
            df, "doc_id", "text", qs, k=len(docs)
        ).collect()
    }
    assert set(got) == set(expected)
    for i, (s, h) in expected.items():
        assert got[i][1] == h
        assert abs(got[i][0] - s) < 1e-9


@SPARK_SETTINGS
@given(
    docs=hst.lists(
        hst.lists(
            hst.sampled_from(["a", "b", "c"]), min_size=0, max_size=14
        ),
        min_size=1,
        max_size=10,
    ),
    n=hst.integers(2, 4),
)
def test_repeated_ngram_stats_matches_counter(spark, docs, n):
    """repeated_ngram_stats equals a direct Counter-based computation
    for arbitrary n and tiny random docs (including empty)."""
    from collections import Counter

    from padua_spark.extensions.quality import repeated_ngram_stats

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in repeated_ngram_stats(df, "doc_id", "text", n=n).collect()
    }
    for i, toks in enumerate(docs):
        grams = [
            " ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)
        ]
        c = Counter(grams)
        r = got[i]
        assert r["n_grams"] == len(grams)
        assert r["n_distinct"] == len(c)
        assert r["top_gram_count"] == (max(c.values()) if c else 0)
        dup = (len(grams) - len(c)) / len(grams) if grams else 0.0
        assert abs(r["dup_fraction"] - dup) < 1e-12
        tf = (
            (max(c.values()) if c else 0) * n / len(toks)
            if toks
            else 0.0
        )
        assert abs(r["top_gram_frac"] - tf) < 1e-12


@SPARK_SETTINGS
@given(
    vecs=hst.lists(
        hst.lists(
            hst.integers(-5, 5), min_size=3, max_size=3
        ),
        min_size=3,
        max_size=14,
    ),
    k=hst.integers(2, 3),
)
def test_kmeans_quantized_matches_pure_python(spark, vecs, k):
    """kmeans_quantized equals a direct pure-Python replica of its
    contract (quantize -> smallest-id seeds -> 2 Lloyd iterations with
    exact integer sums, sequential-fold distances, lowest-cluster tie
    break, empty clusters keep centroids) on random tiny corpora."""
    k = min(k, len(vecs))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    from padua_spark.extensions.similarity import kmeans_quantized

    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in kmeans_quantized(
            df, "vec_id", "embedding", k=k, n_iter=2
        ).collect()
    }
    # pure-python replica
    q = {i: [round(x * 1_000_000) for x in v] for i, (_, v) in
         enumerate(rows)}
    cents = {c + 1: (list(q[c]), 1) for c in range(k)}

    def assign(state):
        out = {}
        for i, qv in q.items():
            best = None
            for cl in sorted(state):
                s, n = state[cl]
                d = 0.0
                for xi, si in zip(qv, s):
                    e = float(xi) - si / n
                    d += e * e
                cand = (d, cl)
                if best is None or cand < best:
                    best = cand
            out[i] = best
        return out

    for _ in range(2):
        a = assign(cents)
        sums: dict = {}
        for i, (_d, cl) in a.items():
            e = sums.setdefault(cl, ([0] * 3, 0))
            s, n = e
            sums[cl] = ([x + y for x, y in zip(s, q[i])], n + 1)
        cents = {
            cl: sums.get(cl, cents[cl]) for cl in cents
        }
    final = assign(cents)
    import math

    for i in q:
        d, cl = final[i]
        assert got[i][0] == cl, (i, got[i], final[i])
        assert abs(got[i][1] - math.sqrt(d)) < 1e-9
