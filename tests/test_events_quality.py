"""Unit tests for the event-log analytics operators (funnel, retention,
decayed scoring), the Gopher rule battery, the hashed classifier, and
the dedup keep-best step — semantics on small hand-built frames (the
sf0.01 oracle parity lives in test_oracle_parity.py)."""

import math

import pytest
from pyspark.sql import functions as F

from padua_spark.extensions.quality import (
    gopher_rules,
    hashed_classifier_score,
)
from padua_spark.operators.events import (
    decayed_score,
    funnel_conversion,
    retention_cohorts,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "u long, ts long, et string")


class TestFunnel:
    def test_strict_ordering_chains(self, spark):
        # u1 completes a->b->c in order; u2 does b before a (no chain
        # past a); u3 only a.
        rows = [
            (1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
            (2, 10, "b"), (2, 20, "a"), (2, 30, "c"),
            (3, 5, "a"),
        ]
        out = funnel_conversion(
            _events(spark, rows), "u", "ts", "et", ["a", "b", "c"]
        ).collect()
        by_stage = {r.stage: r for r in out}
        assert by_stage["a"].n_users == 3
        # u2's b happened before its a -> does not count; u2's c DOES
        # follow a but needs a completed b first -> no.
        assert by_stage["b"].n_users == 1
        assert by_stage["c"].n_users == 1
        assert by_stage["a"].conversion == 1.0
        assert abs(by_stage["b"].conversion - round(1 / 3, 6)) < 1e-12

    def test_same_timestamp_does_not_chain(self, spark):
        rows = [(1, 10, "a"), (1, 10, "b")]
        out = funnel_conversion(
            _events(spark, rows), "u", "ts", "et", ["a", "b"]
        ).collect()
        by_stage = {r.stage: r for r in out}
        assert by_stage["a"].n_users == 1
        assert by_stage["b"].n_users == 0

    def test_later_first_stage_does_not_uncomplete(self, spark):
        # a at 10 and 50; b at 20 chains off the EARLIEST prior a.
        rows = [(1, 10, "a"), (1, 50, "a"), (1, 20, "b")]
        out = funnel_conversion(
            _events(spark, rows), "u", "ts", "et", ["a", "b"]
        ).collect()
        assert {r.stage: r.n_users for r in out} == {"a": 1, "b": 1}

    def test_non_stage_events_ignored(self, spark):
        rows = [(1, 10, "a"), (1, 15, "noise"), (1, 20, "b")]
        out = funnel_conversion(
            _events(spark, rows), "u", "ts", "et", ["a", "b"]
        ).collect()
        assert {r.stage: r.n_users for r in out} == {"a": 1, "b": 1}

    def test_single_shuffle_plan(self, spark):
        from padua_spark.plans.inspect import count_exchanges

        rows = [(1, 10, "a"), (1, 20, "b")]
        df = funnel_conversion(
            _events(spark, rows), "u", "ts", "et", ["a", "b"]
        )
        # one exchange for the per-user window chain + rollup, one for
        # the global 1-row count — independent of funnel depth.
        assert count_exchanges(df) <= 2

    def test_requires_two_stages(self, spark):
        with pytest.raises(ValueError):
            funnel_conversion(_events(spark, []), "u", "ts", "et", ["a"])


class TestRetention:
    def test_triangle(self, spark):
        rows = [
            (1, 0, "e"), (1, 25, "e"),   # cohort 0, offsets 0 and 2
            (2, 11, "e"), (2, 19, "e"),  # cohort 1, offsets 0 and 0
        ]
        out = retention_cohorts(
            _events(spark, rows), "u", "ts", period=10
        ).collect()
        cells = {(r.cohort, r.offset): r.n_users for r in out}
        assert cells == {(0, 0): 1, (0, 2): 1, (1, 0): 1}

    def test_distinct_users_not_events(self, spark):
        rows = [(1, 0, "e"), (1, 1, "e"), (2, 3, "e")]
        out = retention_cohorts(
            _events(spark, rows), "u", "ts", period=10
        ).collect()
        assert {(r.cohort, r.offset): r.n_users for r in out} == {(0, 0): 2}


class TestDecayedScore:
    def test_half_life(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 8.0), (1, 10, 8.0), (1, 20, 8.0)],
            "u long, ts long, v double",
        )
        out = decayed_score(df, ["u"], "ts", "v", half_life=10.0).collect()
        # t_ref = 20: 8/4 + 8/2 + 8 = 14
        assert out[0].n_events == 3
        assert abs(out[0].decayed_sum - 14.0) < 1e-9

    def test_explicit_tref(self, spark):
        df = spark.createDataFrame([(1, 0, 4.0)], "u long, ts long, v double")
        out = decayed_score(
            df, ["u"], "ts", "v", half_life=10.0, t_ref=10
        ).collect()
        assert abs(out[0].decayed_sum - 2.0) < 1e-12


class TestGopherRules:
    def test_clean_doc_passes(self, spark):
        text = " ".join(["the quick brown fox jumps over a lazy dog"] * 6)
        df = spark.createDataFrame([(1, text)], "id long, text string")
        r = gopher_rules(df, "text").collect()[0]
        assert r.n_words == 54
        assert r.quality_pass is True

    def test_short_doc_fails_word_count(self, spark):
        df = spark.createDataFrame([(1, "too short")], "id long, text string")
        r = gopher_rules(df, "text").collect()[0]
        assert r.rule_word_count is False
        assert r.quality_pass is False

    def test_bullet_and_ellipsis_lines(self, spark):
        text = "- item one\n- item two\nnormal line ending...\n"
        df = spark.createDataFrame([(1, text)], "id long, text string")
        r = gopher_rules(df, "text").collect()[0]
        # 4 lines (trailing \n yields an empty 4th line)
        assert abs(r.bullet_frac - 0.5) < 1e-12
        assert abs(r.ellipsis_frac - 0.25) < 1e-12

    def test_symbol_ratio(self, spark):
        df = spark.createDataFrame(
            [(1, "# header with … and more...")], "id long, text string"
        )
        r = gopher_rules(df, "text").collect()[0]
        assert abs(r.symbol_ratio - 3 / 6) < 1e-12

    def test_no_shuffle(self, spark):
        from padua_spark.plans.inspect import count_exchanges

        df = spark.createDataFrame([(1, "x")], "id long, text string")
        assert count_exchanges(gopher_rules(df, "text")) == 0


class TestHashedClassifier:
    def test_deterministic_and_bounded(self, spark):
        df = spark.createDataFrame(
            [(1, "hello world"), (2, "hello world"), (3, "")],
            "id long, text string",
        )
        out = {r.id: r for r in hashed_classifier_score(df, "text").collect()}
        assert out[1].weight_sum == out[2].weight_sum
        assert -1.0 < out[1].margin < 1.0
        assert 0.2 < out[1].prob < 0.8
        assert abs(
            out[1].prob - 1.0 / (1.0 + math.exp(-out[1].margin))
        ) < 1e-12

    def test_exact_integer_weight_sum(self, spark):
        # one-token doc: weight_sum == ((hash % 1024) * K) % 2^31
        df = spark.createDataFrame([(1, "a")], "id long, text string")
        r = hashed_classifier_score(df, "text").collect()[0]
        h = (7 * 131 + ord("a")) % 2147483647
        assert r.weight_sum == ((h % 1024) * 2654435761) % 2147483648

    def test_no_shuffle(self, spark):
        from padua_spark.plans.inspect import count_exchanges

        df = spark.createDataFrame([(1, "x")], "id long, text string")
        assert count_exchanges(hashed_classifier_score(df, "text")) == 0


class TestKeepBest:
    def test_canonical_election(self, spark):
        from padua_spark.extensions.graph import keep_best_per_cluster

        docs = spark.createDataFrame(
            [(1, 10), (2, 30), (3, 30), (4, 5)], "id long, q long"
        )
        pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
        out = {
            r.cluster_id: r
            for r in keep_best_per_cluster(docs, "id", pairs, "q").collect()
        }
        # cluster {1,2,3}: max q=30 tie between 2 and 3 -> min id 2
        assert out[1].canonical_id == 2
        assert out[1].best_quality == 30
        assert out[1].cluster_size == 3
        # singleton
        assert out[4].canonical_id == 4
        assert out[4].cluster_size == 1
