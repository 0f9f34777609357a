"""Event-log analytics: funnel conversion, retention cohorts, and
time-decayed scoring.

The reference has no event-log surface (padua is a proteomics matrix
library); these are beyond-reference operators for the `events` table,
in the same family as the streaming windows/sessionization extensions
(streaming/windows.py). All three are expressed as native DataFrame
plans — no Python in the row path.

Scale notes
-----------
``funnel_conversion`` is the interesting one: the naive formulation is
k-1 self-joins (stage i joined against "users who completed stage
i-1"), i.e. k-1 shuffles of the event table. Here the whole funnel is
ONE shuffle: partition by user, sort by time once, and chain k window
expressions over the SAME window spec — each stage's "completed
strictly before this row" timestamp feeds the next stage's completion
predicate. Spark plans this as a single Exchange + Sort followed by
chained Window nodes (the sort satisfies every spec), so the cost is
one pass over the sorted events regardless of funnel depth.

``retention_cohorts`` likewise avoids the first-event self-join with a
per-user window min (one shuffle on user), then a partial-aggregated
rollup on (cohort, offset).

``decayed_score``'s reference time is a 1-row global aggregate joined
back by broadcast — never a single-partition global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    stage_col: str,
    stages: list[str],
) -> DataFrame:
    """Strict-order funnel: how many users completed stage i AFTER
    having completed stages 0..i-1, each strictly later in event time.

    Returns one row per stage: ``(stage_idx, stage, n_users,
    conversion)`` where ``conversion`` is n_users / n_users(stage 0)
    (NULL when stage 0 has no users).

    "Strictly later" is enforced with a RANGE frame ending at ``-1``
    on the (numeric) ``ts_col`` — two stages at the same timestamp do
    NOT chain. ``ts_col`` must therefore be a numeric epoch column
    (the caller picks the resolution).

    One shuffle total: every per-stage completion time is a window
    min over the same ``(user, ts)`` spec, so Catalyst reuses one
    Exchange+Sort for the whole chain; the final per-user rollup is a
    partial-aggregated groupBy and the stage table it feeds is tiny.
    """
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    idx = F.array_position(
        F.array(*[F.lit(s) for s in stages]), F.col(stage_col)
    )  # 1-based; 0 = not a funnel stage
    e = (
        df.filter(F.col(stage_col).isin(stages))
        .select(
            F.col(user_col).alias("_u"),
            F.col(ts_col).cast("long").alias("_ts"),
            idx.cast("int").alias("_stage"),
        )
    )
    strictly_before = (
        Window.partitionBy("_u")
        .orderBy("_ts")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    # comp_i = this row completes stage i (its prior stages chain
    # strictly before it); prev = min completion ts of stage i-1
    # strictly before the current row.
    comp = F.when(F.col("_stage") == 1, F.col("_ts"))
    e = e.withColumn("_c1", comp)
    for i in range(2, len(stages) + 1):
        prev = F.min(f"_c{i - 1}").over(strictly_before)
        e = e.withColumn(
            f"_c{i}",
            F.when(
                (F.col("_stage") == i) & prev.isNotNull(), F.col("_ts")
            ),
        )
    per_user = e.groupBy("_u").agg(
        *[
            F.min(f"_c{i}").alias(f"_t{i}")
            for i in range(1, len(stages) + 1)
        ]
    )
    counts = per_user.agg(
        *[
            F.count(f"_t{i}").alias(f"_n{i}")
            for i in range(1, len(stages) + 1)
        ]
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("stage_idx"),
                    F.lit(stages[i - 1]).alias("stage"),
                    F.col(f"_n{i}").alias("n_users"),
                )
                for i in range(1, len(stages) + 1)
            ]
        )
    ).alias("s")
    return counts.select(rows).select(
        "s.stage_idx",
        "s.stage",
        "s.n_users",
        F.when(
            F.col("s.n_users").isNotNull(),
            F.round(
                F.col("s.n_users")
                / F.first_value(F.col("s.n_users")).over(
                    Window.orderBy("s.stage_idx").rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                ),
                6,
            ),
        ).alias("conversion"),
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: int,
) -> DataFrame:
    """Cohort retention triangle: users are cohorted by the period of
    their FIRST event; each (cohort, offset) cell counts the distinct
    users from that cohort active ``offset`` periods later.

    ``ts_col`` must be numeric epoch; ``period`` is the cohort grain
    in the same units (e.g. 86_400_000_000 for daily cohorts over µs).

    Plan: per-user first-event time is a window min (one shuffle on
    user, no self-join), then a distinct on (cohort, offset, user) and
    a partial-aggregated count — both reuse the hash partitioning AQE
    picks; no row ever visits the driver.
    """
    def idiv(c: Column) -> Column:
        # exact integer floor division for non-negative epochs: the
        # mod-subtract makes the numerator an exact multiple, so the
        # double division is exact (epochs < 2^53 — µs until ~2255).
        # A plain (c / period).cast("long") can round UP across an
        # integer boundary before truncation.
        return ((c - (c % period)) / period).cast("long")

    ts = F.col(ts_col).cast("long")
    first_ts = F.min(ts).over(Window.partitionBy(user_col))
    cohort = idiv(first_ts).alias("cohort")
    offset = (idiv(ts) - idiv(first_ts)).alias("offset")
    return (
        df.select(F.col(user_col).alias("user"), cohort, offset)
        .distinct()
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def decayed_score(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
    half_life: float,
    t_ref: int | None = None,
) -> DataFrame:
    """Per-group exponentially time-decayed sum:
    ``score = Σ value · 2^(-(t_ref - ts)/half_life)`` — recency-weighted
    engagement / freshness scoring. ``half_life`` and timestamps share
    units.

    ``t_ref`` defaults to the global max of ``ts_col``, computed as a
    1-row aggregate cross-joined back (AQE broadcasts a 1-row side;
    never a global single-partition window). One shuffle for the group
    aggregation; partial aggregation applies map-side.
    """
    ts = F.col(ts_col).cast("long")
    if t_ref is None:
        ref = df.agg(F.max(ts).alias("_tref"))
        base = df.crossJoin(F.broadcast(ref))
        tref: Column = F.col("_tref")
    else:
        base = df
        tref = F.lit(int(t_ref))
    decay = F.pow(
        F.lit(2.0), -((tref - ts).cast("double") / F.lit(float(half_life)))
    )
    return base.groupBy(*group_cols).agg(
        F.sum(F.col(value_col).cast("double") * decay).alias("decayed_sum"),
        F.count(F.lit(1)).alias("n_events"),
    )
