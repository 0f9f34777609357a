"""Storage-layout helpers for co-located joins at scale.

Bucketing pre-shuffles a table ONCE at write time; subsequent joins and
aggregations on the bucket key read co-located data and skip the
exchange entirely — the right layout for the measurements fact table
keyed by ``feature_id`` when many per-feature statistics run against
it (every §2.6 stat operator shuffles on that key otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Joins/aggregations between tables bucketed identically on the join
    key execute WITHOUT a shuffle (verify: no ``Exchange`` in the
    plan — tested in tests/test_bucketing.py).
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
