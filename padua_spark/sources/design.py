"""Experimental-design table reader.

Reference: ``process.build_index_from_design`` consumes a small CSV
keyed by sample ``Label`` with level columns (Group/Timepoint/
Replicate/Technical), coercing listed levels to int
(``padua/process.py:23-111``, types at :61-64). The design table is a
broadcast dimension in the long model (see operators.process.join_design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_INT_LEVELS = ("Timepoint", "Replicate", "Technical")


def read_design(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    int_levels: tuple[str, ...] = DEFAULT_INT_LEVELS,
) -> DataFrame:
    df = (
        spark.read.option("sep", sep)
        .option("header", True)
        .csv(path)
    )
    for lvl in int_levels:
        if lvl in df.columns:
            df = df.withColumn(lvl, F.col(lvl).cast("int"))
    return df
