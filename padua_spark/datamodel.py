"""Canonical long-model schemas and storage layout (SURVEY.md §1.5).

The engine's core tables and the layout that makes them fast at 100 TB:

- ``measurements`` — the fact table. Partition by ``kind`` (predicates
  on measurement kind prune whole directories) and bucket by
  ``feature_id`` (every §2.6 statistic aggregates on it; bucketed
  writes make those aggregations and the feature-key self-joins
  shuffle-free — see io_utils.write_bucketed / tests/test_bucketing).
- ``features`` / ``samples`` — dimension tables; small, broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEASUREMENTS_SCHEMA = T.StructType(
    [
        T.StructField("feature_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("sample_label", T.StringType(), True),
        T.StructField("multiplicity", T.IntegerType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("feature_id", T.LongType(), False),
        T.StructField("Proteins", T.StringType(), True),
        T.StructField("Gene names", T.StringType(), True),
        T.StructField("Protein names", T.StringType(), True),
        T.StructField("Amino acid", T.StringType(), True),
        T.StructField("Position", T.IntegerType(), True),
        T.StructField("Localization prob", T.DoubleType(), True),
        T.StructField("Reverse", T.StringType(), True),
        T.StructField("Potential contaminant", T.StringType(), True),
    ]
)

SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("Label", T.StringType(), False),
        T.StructField("Group", T.StringType(), True),
        T.StructField("Timepoint", T.IntegerType(), True),
        T.StructField("Replicate", T.IntegerType(), True),
        T.StructField("Technical", T.IntegerType(), True),
    ]
)


def write_measurements(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("kind",),
    mode: str = "overwrite",
) -> None:
    """Persist the fact table partitioned for kind-predicate pruning.

    For repeated per-feature analytics over the same stored table,
    prefer ``io_utils.write_bucketed(df, table, ["feature_id"])`` —
    the bucketed layout removes the aggregation shuffle entirely.
    """
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def read_measurements(spark, path: str) -> DataFrame:
    return spark.read.schema(MEASUREMENTS_SCHEMA).parquet(path)
