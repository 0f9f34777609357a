"""Skew-handling operators: salted aggregation and salted join equal
their unsalted counterparts, with the hot key split across reducers."""

import pytest
from pyspark.sql import functions as F

from padua_spark.operators.skew import salted_join, salted_sum_count


def _skewed(spark):
    # one hot key with 10k rows, 50 cold keys with 10 each
    hot = spark.range(10000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(500).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["n"], r["total"])
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["total"])
        for r in salted_sum_count(df, ["k"], "v", n_salts=16).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert salted[k][1] == pytest.approx(plain[k][1], rel=1e-12)


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("HOT", 1.5), ("c1", 2.0), ("c2", 3.0)], ["k", "w"]
    )
    plain = (
        big.join(small, on="k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s"))
        .collect()
    )
    salted = (
        salted_join(big, small, "k", n_salts=8)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s"))
        .collect()
    )
    p = {r["k"]: (r["n"], round(r["s"], 6)) for r in plain}
    s = {r["k"]: (r["n"], round(r["s"], 6)) for r in salted}
    assert p == s


def test_salted_join_rejects_outer(spark):
    """right/full outer would replicate unmatched small-side rows once
    per salt (ADVICE r1) — the operator must refuse."""
    big = _skewed(spark)
    small = spark.createDataFrame([("HOT", 1.5)], ["k", "w"])
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(big, small, "k", n_salts=4, how="right")
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(big, small, "k", n_salts=4, how="full")
    # left stays allowed
    assert salted_join(big, small, "k", n_salts=4, how="left").count() == big.count()
