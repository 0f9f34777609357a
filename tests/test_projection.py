"""Johnson–Lindenstrauss random projection: determinism, shape, and
the actual JL property (norm preservation within ε, non-degenerate
sign matrix)."""

import math

import pytest
from pyspark.sql import functions as F

from padua_spark.extensions.similarity import random_projection


@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=64)]) for i in range(200)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestRandomProjection:
    def test_shape_and_determinism(self, spark, emb):
        out = random_projection(emb, "vec_id", "embedding", out_dim=16)
        rows = {r.vec_id: r for r in out.collect()}
        assert len(rows) == 200
        assert all(len(r.proj) == 16 and r.in_dims == 64
                   for r in rows.values())
        again = {
            r.vec_id: r
            for r in random_projection(
                emb, "vec_id", "embedding", out_dim=16
            ).collect()
        }
        assert rows[0].proj == again[0].proj

    def test_norm_preservation(self, spark, emb):
        out = random_projection(emb, "vec_id", "embedding", out_dim=16)
        joined = (
            emb.join(out, "vec_id")
            .select(
                F.sqrt(
                    F.aggregate(
                        F.transform(
                            "embedding",
                            lambda x: x.cast("double") * x.cast("double"),
                        ),
                        F.lit(0.0),
                        lambda a, v: a + v,
                    )
                ).alias("n_in"),
                F.sqrt(
                    F.aggregate(
                        F.transform("proj", lambda x: x * x),
                        F.lit(0.0),
                        lambda a, v: a + v,
                    )
                ).alias("n_out"),
            )
            .collect()
        )
        ratios = [r.n_out / r.n_in for r in joined]
        mean = sum(ratios) / len(ratios)
        var = sum((x - mean) ** 2 for x in ratios) / len(ratios)
        # E[ratio]≈1; std ~ 1/sqrt(2k) ≈ 0.18 at k=16
        assert abs(mean - 1.0) < 0.1
        assert math.sqrt(var) < 0.35

    def test_sign_matrix_not_degenerate(self, spark):
        # one-hot inputs read the sign matrix columns directly; the old
        # parity-of-linear-hash bug made every output component equal
        # up to a global sign (rank-1 matrix)
        onehot = [
            (j, [1.0 if jj == j else 0.0 for jj in range(64)])
            for j in range(64)
        ]
        df = spark.createDataFrame(
            onehot, "vec_id long, embedding array<float>"
        )
        out = random_projection(df, "vec_id", "embedding", out_dim=16)
        cols = [r.proj for r in out.orderBy("vec_id").collect()]
        # rows of the sign matrix = transpose of per-one-hot outputs
        k, d = 16, 64
        rows = [[cols[j][i] for j in range(d)] for i in range(k)]
        for a in range(k):
            for b in range(a + 1, k):
                agree = sum(
                    1 for j in range(d)
                    if (rows[a][j] > 0) == (rows[b][j] > 0)
                )
                corr = abs(2 * agree - d) / d
                assert corr < 0.6, (a, b, corr)

    def test_zero_shuffles(self, spark, emb):
        from padua_spark.plans.inspect import count_exchanges

        out = random_projection(emb, "vec_id", "embedding", out_dim=8)
        assert count_exchanges(out) == 0
