"""Set operations (reference: SURVEY.md §2.12 — venn intersections at
``padua/visualize.py:979-1033``, concat row-appends)."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def venn_counts(dfs: dict[str, DataFrame], key_col: str) -> DataFrame:
    """N-way set-overlap counts over a key column (reference:
    ``visualize.venn``, visualize.py:979-1033 — 2/3-way index-set
    intersections).

    Implemented as a single union + membership-bitmap aggregation (one
    shuffle on the key), not pairwise intersect jobs: each key gets a
    sorted set of source names, then we count per combination.
    """
    tagged = None
    for name, df in dfs.items():
        t = df.select(F.col(key_col).alias("key")).distinct().withColumn(
            "src", F.lit(name)
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    membership = tagged.groupBy("key").agg(
        F.array_sort(F.collect_set("src")).alias("members")
    )
    return (
        membership.groupBy("members")
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn("members", F.array_join(F.col("members"), "&"))
    )


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """Row-append by column name (reference ``pd.concat`` at
    process.py:271, io.py:185)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """SCD-type-1 MERGE without a table format: rows from ``updates``
    win on the key; ``target`` rows with no matching update survive
    unchanged. Schemas must align on column names (output columns
    follow ``target``'s order).

    Plan shape: one left_anti join on the key (matched target rows are
    never materialized) + a union — the relational core of
    ``MERGE INTO … WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`` for
    full-snapshot dims. On a real lake deployment the same updates
    frame feeds Delta/Iceberg ``MERGE`` for file-level pruning; the
    semantics here are identical and engine-checkable.

    Updates carrying duplicate keys are NOT collapsed (both rows land
    in the output, exactly as a MERGE with duplicate source keys would
    error or multiply) — dedupe upstream if the source can repeat.

    No broadcast hint: incremental update batches are usually small
    (AQE broadcasts them at runtime), but a full-refresh updates side
    can be as large as the target — a forced broadcast would be wrong
    there.
    """
    survivors = target.join(
        updates.select(*key_cols).distinct(),
        on=key_cols,
        how="left_anti",
    )
    return updates.select(*target.columns).unionByName(survivors)
