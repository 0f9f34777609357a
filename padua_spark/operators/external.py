"""External-service operators (reference: SURVEY.md §2.13) with
pluggable, offline-stubbed transports.

The reference calls PantherDB (GO enrichment, analysis.py:336-384),
UniProt (ID mapping, utils.py:332-356) and KEGG (pathway colorizer,
visualize.py:1495-1605) over HTTP. The Spark design splits each into:

1. a **distributed prepare** step (collect the small distinct ID set /
   compute per-protein colors),
2. a driver-side transport call — injected as a callable so tests and
   air-gapped clusters stub it (no network in this environment), and
3. a **distributed consume** step (parse → DataFrame → broadcast join).
"""

from __future__ import annotations

import io
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from padua_spark.functions.scalar import protein_ids


def collect_distinct_ids(
    df: DataFrame, proteins_col: str, max_ids: int = 100_000
) -> list[str]:
    """Distinct first-protein IDs, collected for a driver-side service
    call (reference: ``utils.get_protein_id_list``, utils.py:142-162).
    The distinct runs distributed; only the ID list lands on the
    driver, with an explicit bound."""
    rows = (
        df.select(F.explode(protein_ids(proteins_col)).alias("pid"))
        .filter(F.col("pid") != "")
        .distinct()
        .limit(max_ids + 1)
        .collect()
    )
    if len(rows) > max_ids:
        raise ValueError(f"more than {max_ids} distinct IDs; filter first")
    return [r["pid"] for r in rows]


def go_enrichment(
    df: DataFrame,
    proteins_col: str = "Proteins",
    fdr: float = 0.05,
    fetch: Callable[[list[str]], str] | None = None,
) -> DataFrame:
    """GO-term enrichment via an injected PantherDB-style transport
    (reference: ``analysis.go_enrichment``, analysis.py:336-384).

    ``fetch(ids) -> tsv`` must return the service's TSV
    (``GO, Name, Gene ID, P, FDR``). The post-processing replicates the
    reference: mean-collapse duplicate GO terms, keep ``P < fdr``, sort
    ascending (analysis.py:377-384) — all as Spark aggregations.
    """
    if fetch is None:
        raise NotImplementedError(
            "no network in this environment — inject fetch= (see "
            "stub_go_fetch for the offline test transport)"
        )
    ids = collect_distinct_ids(df, proteins_col)
    tsv = fetch(ids)
    spark = df.sparkSession
    import csv

    rows = list(csv.reader(io.StringIO(tsv), delimiter="\t"))
    header, data = rows[0], rows[1:]
    res = spark.createDataFrame(data, header)
    res = res.withColumn("P", F.col("P").cast("double")).withColumn(
        "FDR", F.col("FDR").cast("double")
    )
    return (
        res.groupBy("GO", "Name")
        .agg(F.avg("P").alias("P"), F.avg("FDR").alias("FDR"))
        .filter(F.col("P") < fdr)
        .orderBy("P")
    )


def stub_go_fetch(ids: list[str]) -> str:
    """Deterministic offline transport for tests: every 10th ID forms an
    enriched pseudo-term."""
    lines = ["GO\tName\tGene ID\tP\tFDR"]
    for i, pid in enumerate(sorted(ids)):
        p = ((i * 2654435761) % 1000003) / 1000003.0
        term = f"GO:{i % 7:07d}"
        lines.append(f"{term}\tterm{i % 7}\t{pid}\t{p / 50}\t{p / 25}")
    return "\n".join(lines)


def uniprot_mapping_join(
    df: DataFrame,
    id_col: str,
    fetch: Callable[[list[str]], dict[str, str]] | None = None,
    mapped_col: str = "mapped_id",
) -> DataFrame:
    """UniProt-style bulk ID mapping applied as a broadcast join
    (reference: ``utils.get_uniprot_id_mapping_pairs``, utils.py:332-356
    builds a dict; applied at visualize.py:1556-1568)."""
    if fetch is None:
        raise NotImplementedError("inject fetch= (offline environment)")
    ids = [
        r[0]
        for r in df.select(id_col).distinct().collect()
        if r[0] is not None
    ]
    mapping = fetch(ids)
    spark = df.sparkSession
    mdf = spark.createDataFrame(
        list(mapping.items()), [id_col, mapped_col]
    )
    return df.join(F.broadcast(mdf), on=id_col, how="left")


def kegg_color_table(
    df: DataFrame,
    feature_cols: list[str],
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    min_log2: float = -2.0,
    max_log2: float = 2.0,
    n_bins: int = 7,
) -> DataFrame:
    """The compute core of the KEGG pathway colorizer (reference:
    ``visualize.kegg_pathway``, visualize.py:1495-1605): per-feature
    group log2 ratio, clamped and binned into a diverging color index;
    the HTTP POST + image handling stay driver-side and optional."""
    va = F.when(F.col(group_col) == F.lit(group_a), F.col(value_col))
    vb = F.when(F.col(group_col) == F.lit(group_b), F.col(value_col))
    agg = df.groupBy(*feature_cols).agg(
        F.avg(va).alias("_ma"), F.avg(vb).alias("_mb")
    )
    ratio = F.when(
        (F.col("_ma") > 0) & (F.col("_mb") > 0),
        F.log2(F.col("_ma") / F.col("_mb")),
    )
    clamped = F.greatest(
        F.least(ratio, F.lit(max_log2)), F.lit(min_log2)
    )
    width = (max_log2 - min_log2) / n_bins
    bin_idx = F.least(
        F.floor((clamped - F.lit(min_log2)) / F.lit(width)),
        F.lit(n_bins - 1),
    ).cast("int")
    return agg.select(
        *feature_cols,
        ratio.alias("log2_ratio"),
        # undefined ratio (missing group / non-positive mean) must stay
        # uncolored — least/greatest skip NULLs, so an unguarded bin
        # would paint those features as maximum up-regulation
        F.when(ratio.isNotNull(), bin_idx).alias("color_bin"),
    )
