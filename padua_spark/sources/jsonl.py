"""JSONL corpus source/sink — the de-facto interchange format for
web-scale text corpora (one JSON document per line).

The 100 TB concern is not parsing — Spark's JSON reader is fine — but
**corrupt lines**: a crawl shard with a few truncated records must not
fail the job OR silently drop data. This source reads PERMISSIVE with
an explicit corrupt-record column and splits the result into a clean
lane and a quarantine lane carrying the raw offending line, so ingest
jobs can load clean data and audit/replay the rest.

No padua equivalent (the reference reads MaxQuant TSVs); this is
infrastructure for the training-data extension surface (documents
table shape: ``doc_id, text, lang, source, …``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Default documents schema, matching the testdata `documents` table.
DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string"

CORRUPT_COL = "_corrupt_record"


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: str = DOCS_SCHEMA,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read a JSONL directory/file with an EXPLICIT schema (schema
    inference at 100 TB is a full extra pass — never infer in
    production) in PERMISSIVE mode: malformed lines yield a row whose
    data columns are NULL and whose ``corrupt_col`` holds the raw
    line. Split lanes with :func:`split_corrupt`.
    """
    full_schema = f"{schema}, {corrupt_col} string"
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """Split a :func:`read_jsonl_docs` frame into ``(clean, bad)``.

    ``clean`` drops the corrupt column; ``bad`` is
    ``(raw_record string)`` — the quarantine lane for audit/replay.
    Spark refuses queries that reference ONLY the corrupt column over
    a raw JSON scan (the pruned scan couldn't know what was corrupt),
    so the frame is cached before the lanes split; callers that have
    already materialized (e.g. wrote clean to parquet) can unpersist.
    """
    cached = df.cache()
    is_bad = F.col(corrupt_col).isNotNull()
    clean = cached.where(~is_bad).drop(corrupt_col)
    bad = cached.where(is_bad).select(
        F.col(corrupt_col).alias("raw_record")
    )
    from padua_spark.io_utils import track_cached

    return track_cached(clean, cached), track_cached(bad, cached)


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str = "gzip",
    mode: str = "error",
) -> None:
    """Write a frame as compressed JSONL (one JSON object per line) —
    the interchange export for downstream tokenizer/training jobs."""
    df.write.mode(mode).option("compression", compression).json(path)
