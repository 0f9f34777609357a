"""End-to-end corpus curation: the composition a training-data
pipeline actually runs, built entirely from this package's
oracle-checked primitives.

Stages (each one shuffle-bounded and individually tested):

1. quality gate — token-count threshold, a pure pushdown-able filter;
2. exact dedup — normalized-text rolling-hash fingerprint, one hash
   aggregation + semi join (``extensions.dedup.exact_dedup``);
3. near-dup removal — banded MinHash LSH candidates at/above a Jaccard
   threshold; of each candidate pair the lower id survives
   (``extensions.dedup.minhash_lsh_candidates``).

At 100 TB each stage keeps its scale posture: the quality filter
reaches the scan, the fingerprint dedup is one shuffle on the hash,
and the near-dup join only ever touches LSH-bucket collisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from padua_spark.extensions.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
)
from padua_spark.extensions.text import fingerprint, token_count


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 3,
    jaccard_threshold: float = 0.5,
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    portable_keys: bool = False,
) -> DataFrame:
    """Surviving rows of ``df`` after the three curation stages.

    Near-dup removal semantics: every candidate pair (id_a < id_b) with
    ``est_jaccard >= jaccard_threshold`` drops id_b — a deterministic
    keep-the-lowest-id rule (transitive chains keep their minimum and
    possibly later members that never pair with it directly; exact
    clustering would need a connected-components pass).
    """
    kept = df.where(token_count(F.col(text_col)) >= F.lit(min_tokens))
    # internal column name must not collide with user data: an input
    # that already has _fp would be silently overwritten and dropped
    fp_col = "_fp"
    while fp_col in df.columns:
        fp_col += "_"
    keyed = kept.withColumn(fp_col, fingerprint(F.col(text_col)))
    deduped = exact_dedup(keyed, [fp_col], id_col).drop(fp_col)
    cands = minhash_lsh_candidates(
        deduped,
        id_col,
        text_col,
        k_shingle=k_shingle,
        num_hashes=num_hashes,
        bands=bands,
        portable_keys=portable_keys,
    )
    losers = (
        cands.where(F.col("est_jaccard") >= F.lit(jaccard_threshold))
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return deduped.join(losers, on=id_col, how="left_anti")


def write_corpus(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    mode: str = "overwrite",
) -> None:
    """Persist a curated corpus partitioned by low-cardinality routing
    columns (lang, source, snapshot …). At 100 TB this layout is what
    makes downstream reads cheap: a per-language training mix or an
    incremental re-curation touches only its partition directories —
    partition PRUNING at the file-listing level, before any I/O.
    Verify with ``PartitionFilters`` in the scan node (tested in
    tests/test_units.py::test_write_corpus_partition_pruning)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_corpus(spark, path: str) -> DataFrame:
    """Read a partitioned corpus; partition-column predicates prune
    directories instead of filtering rows."""
    return spark.read.parquet(path)


def curate_stream(
    df: DataFrame,
    id_col: str,
    text_col: str,
    event_time,
    min_tokens: int = 3,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of the first two :func:`curate_corpus` stages for
    continuous ingest: quality gate (stateless filter) + exact
    fingerprint dedup with watermark-bounded state
    (``dropDuplicatesWithinWatermark`` — the only state contract that
    survives unbounded streams). Works on batch frames too (min-by-
    event-time semantics), so stream==batch is testable.

    The near-dup (MinHash) stage is deliberately batch-only: LSH
    candidate pairing is a self-join across arrival order, which has no
    bounded-state streaming form — run it as a periodic batch
    compaction over the streamed output (the standard arrangement for
    continuous corpus construction)."""
    from padua_spark.streaming.windows import dedup_stream

    kept = df.where(token_count(F.col(text_col)) >= F.lit(min_tokens))
    fp_col = "_fp"
    while fp_col in df.columns:
        fp_col += "_"
    keyed = kept.withColumn(fp_col, fingerprint(F.col(text_col)))
    return dedup_stream(
        keyed,
        [fp_col],
        event_time=event_time,
        watermark=watermark,
        tiebreak_col=id_col,
    ).drop(fp_col)


def ingest_stream(
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    corpus_dir: str,
    checkpoint_dir: str,
):
    """Continuous corpus construction: a ``foreachBatch`` sink that
    dedupes every micro-batch within itself AND against everything
    already ingested (:func:`padua_spark.extensions.dedup.
    novel_documents`), appending only novel rows to ``corpus_dir``.
    Returns the started-query builder (caller picks the trigger).

    foreachBatch is the right tool here — the dedup is a batch
    anti-join against an external, growing table, which has no bounded
    streaming-state form (unlike the watermark-horizon dedup of
    :func:`curate_stream`); each micro-batch runs it as a normal batch
    plan with exactly-once sink semantics from the checkpoint.

    Scale note: the seen side reduces to the fingerprint column before
    the anti-join, so each batch reads one bigint column of the corpus
    (columnar scan, dictionary/bloom-prunable). At very large corpus
    sizes keep a dedicated fingerprint-only table updated in the same
    batch (write both inside ``_sink``) instead of re-deriving
    fingerprints from text."""
    from padua_spark.extensions.dedup import novel_documents

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            seen = spark.read.parquet(corpus_dir)
        except Exception:
            # first batch: nothing ingested yet — still self-dedup
            seen = batch_df.limit(0)
        novel = novel_documents(batch_df, seen, id_col, text_col)
        novel.write.mode("append").parquet(corpus_dir)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )


def filter_funnel(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Sequential filter funnel with a per-stage audit report — the
    curation-ablation view every corpus pipeline publishes (how many
    documents each rule removed, in order). Returns
    ``(kept_df, report_df)``:

    - ``kept_df`` — rows passing ALL rules (NULL rule values count as
      fail, matching ``gopher_rules``' conjunction semantics);
    - ``report_df(stage, rule, n_in, n_out, n_dropped)`` — one row per
      rule, where ``n_in`` of stage k is ``n_out`` of stage k−1.

    The whole report is ONE conditional-count aggregation over the
    input (map-side partials; rule k's count is the conjunction of
    rules 1..k) reshaped by an explode of literal structs — fully
    lazy, no driver collect, no second scan per stage.
    """
    aggs = [F.count(F.lit(1)).alias("_n_input")]
    acc: Column = F.lit(True)
    names = list(rules)
    for name in names:
        acc = acc & F.coalesce(rules[name], F.lit(False))
        aggs.append(F.count(F.when(acc, 1)).alias(f"_n_{name}"))
    one = df.agg(*aggs)
    stages = []
    prev = "_n_input"
    for i, name in enumerate(names, 1):
        cur = f"_n_{name}"
        stages.append(
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(name).alias("rule"),
                F.col(prev).alias("n_in"),
                F.col(cur).alias("n_out"),
                (F.col(prev) - F.col(cur)).alias("n_dropped"),
            )
        )
        prev = cur
    report = one.select(
        F.explode(F.array(*stages)).alias("_s")
    ).select("_s.*")
    kept_cond: Column = F.lit(True)
    for name in names:
        kept_cond = kept_cond & F.coalesce(rules[name], F.lit(False))
    return df.where(kept_cond), report


def split_leakage_audit(
    assign_df: DataFrame,
    id_col: str,
    split_col: str,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Train/val/test LEAKAGE audit: given a split assignment and a
    near-duplicate candidate pair frame (MinHash/SimHash/n-gram
    output), count duplicate pairs per unordered split combination and
    flag the cross-split ones — the pairs that leak evaluation data
    into training. Row-level hashing splits (``split_assign`` keyed on
    the doc id) WILL leak near-duplicates across splits; keying the
    split on a group column (domain, source, cluster canonical id)
    drives the leaked count to zero — this audit is the measurement
    that justifies the group key.

    Scale shape: two broadcast-or-shuffle hash joins of the (tiny
    relative to corpus) candidate-pair frame against the two-column
    (id, split) projection, then one aggregation over |splits|² rows.
    Output: ``(split_x, split_y, n_pairs, leaked)`` with
    ``split_x <= split_y``.
    """
    a = assign_df.select(
        F.col(id_col).alias(id_a), F.col(split_col).alias("_sa")
    )
    b = assign_df.select(
        F.col(id_col).alias(id_b), F.col(split_col).alias("_sb")
    )
    joined = pairs.join(a, on=id_a).join(b, on=id_b)
    sx = F.least(F.col("_sa"), F.col("_sb"))
    sy = F.greatest(F.col("_sa"), F.col("_sb"))
    return (
        joined.groupBy(sx.alias("split_x"), sy.alias("split_y"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("leaked", F.col("split_x") != F.col("split_y"))
    )
