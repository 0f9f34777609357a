"""Frequent-pattern mining over basket-shaped data.

A curation / analytics pipeline repeatedly needs "what co-occurs":
co-purchased parts, co-firing event types, co-occurring tags. This
module mines pairwise association rules with the Apriori pruning
order — support filters collapse the candidate space BEFORE the
quadratic basket self-join, the same prune-first discipline as
:func:`padua_spark.extensions.text.token_pmi`.

Beyond the reference (padua has no itemset mining; its co-occurrence
surface is the correlation matrix, analysis.py:640).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support_count: int = 2,
    min_confidence: float = 0.0,
    max_basket_items: int = 1000,
) -> DataFrame:
    """Pairwise association rules ``antecedent → consequent`` with
    support / confidence / lift (Agrawal & Srikant 1994, restricted
    to 2-itemsets — the overwhelmingly-queried case):

    ``support = P(a,b)``, ``confidence = P(b|a)``,
    ``lift = P(a,b) / (P(a)·P(b))``.

    Scale shape (Apriori property enforced relationally): items below
    ``min_support_count`` baskets are dropped FIRST (a pair can only
    be frequent if both members are), baskets larger than
    ``max_basket_items`` surviving items are excluded by an explicit
    bound (the per-basket pair join is quadratic in basket size — a
    degenerate mega-basket would dominate the shuffle while carrying
    no per-pair signal), and only then does the single basket-keyed
    self-join run. One distinct, two aggregations, one equi-join —
    no cartesian products, no windows over data-sized frames. All
    three statistics are single divisions of exact integer counts,
    engine-reproducible at any scale. Output: one row per directed
    rule over unordered frequent pairs —
    ``(antecedent, consequent, pair_count, support, confidence,
    lift)``, floats 6dp, restricted to
    ``confidence ≥ min_confidence``.
    """
    from pyspark import StorageLevel

    # The deduped incidence frame has FOUR independent consumers in
    # this lineage (item supports, basket-size filter, the pair
    # self-join via kept, and the basket-universe count) and Spark
    # reuses no exchanges across differently-projected branches — the
    # scan + distinct shuffle would otherwise re-run per consumer
    # (traced: ~7 evaluations per execution). Persist it once; same
    # for the small per-item support frame, which is consumed by the
    # pruning semi-join and twice by the output stitch.
    base = (
        df.select(
            F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
        )
        .where(F.col("_b").isNotNull() & F.col("_i").isNotNull())
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_baskets = base.select(
        F.countDistinct("_b").cast("bigint").alias("_n")
    )
    isup = base.groupBy("_i").agg(
        F.count(F.lit(1)).cast("bigint").alias("_ci")
    )
    freq = isup.where(
        F.col("_ci") >= F.lit(int(min_support_count))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    kept = base.join(freq.select("_i"), on="_i", how="left_semi")
    ok_baskets = (
        kept.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .where(F.col("_sz") <= F.lit(int(max_basket_items)))
        .select("_b")
    )
    # the pruned basket frame feeds BOTH sides of the pair self-join
    # (plus its upstream was already consumed by the basket-size
    # filter): persist it once — Spark reuses no exchanges across
    # differently-projected branches, so without the cache the
    # distinct + semi-joins recompute per consumer (~1.6x warm win)
    kept = kept.join(ok_baskets, on="_b", how="left_semi").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = kept.select("_b", F.col("_i").alias("_ia"))
    b = kept.select("_b", F.col("_i").alias("_ib"))
    pairs = (
        a.join(b, on="_b")
        .where(F.col("_ia") < F.col("_ib"))
        .groupBy("_ia", "_ib")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_cp"))
        .where(F.col("_cp") >= F.lit(int(min_support_count)))
    )
    directed = pairs.select(
        F.col("_ia").alias("_ant"),
        F.col("_ib").alias("_con"),
        "_cp",
    ).unionByName(
        pairs.select(
            F.col("_ib").alias("_ant"),
            F.col("_ia").alias("_con"),
            "_cp",
        )
    )
    out = (
        directed.join(
            freq.select(F.col("_i").alias("_ant"),
                        F.col("_ci").alias("_ca")),
            on="_ant",
        )
        .join(
            freq.select(F.col("_i").alias("_con"),
                        F.col("_ci").alias("_cc")),
            on="_con",
        )
        .join(F.broadcast(n_baskets))
        .select(
            F.col("_ant").alias("antecedent"),
            F.col("_con").alias("consequent"),
            F.col("_cp").alias("pair_count"),
            F.round(
                F.col("_cp").cast("double") / F.col("_n").cast("double"), 6
            ).alias("support"),
            (
                F.col("_cp").cast("double") / F.col("_ca").cast("double")
            ).alias("_conf"),
            F.round(
                F.col("_cp").cast("double") * F.col("_n").cast("double")
                / (
                    F.col("_ca").cast("double")
                    * F.col("_cc").cast("double")
                ),
                6,
            ).alias("lift"),
        )
        .where(F.col("_conf") >= F.lit(float(min_confidence)))
        .withColumn("confidence", F.round("_conf", 6))
        .drop("_conf")
    )
    from padua_spark.io_utils import track_cached

    return track_cached(out, kept, base, freq)


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support_count: int = 2,
    max_basket_items: int = 1000,
) -> DataFrame:
    """Item-item co-occurrence cosine similarity — the classic
    neighborhood model for "users who took A also took B"
    (Sarwar et al. 2001), sharing :func:`association_rules`'
    Apriori-pruned plan but scoring with the symmetric cosine
    (lift/confidence are directional; similarity search wants a
    metric):

    ``cos(a, b) = c_ab / √(c_a · c_b)``

    over DISTINCT (basket, item) pairs — binary incidence, so the
    cosine numerator is the raw co-basket count and the norms are the
    per-item basket counts: three exact integers per pair. Same scale
    contract as association_rules: items below ``min_support_count``
    leave before the basket-keyed self-join (a pair needs both
    members frequent), baskets above ``max_basket_items`` surviving
    items are excluded by the explicit quadratic bound. One distinct,
    two aggregations, one equi-join. Output: one row per unordered
    frequent pair — ``(item_a, item_b, pair_count, count_a, count_b,
    cosine)``, cosine rounded to 6dp, ``item_a < item_b``.
    """
    from pyspark import StorageLevel

    # same multi-consumer persists as association_rules (see note
    # there): base feeds supports + basket filter + pair join; freq
    # feeds the pruning semi-join and the two output stitches.
    base = (
        df.select(
            F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
        )
        .where(F.col("_b").isNotNull() & F.col("_i").isNotNull())
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    isup = base.groupBy("_i").agg(
        F.count(F.lit(1)).cast("bigint").alias("_ci")
    )
    freq = isup.where(
        F.col("_ci") >= F.lit(int(min_support_count))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    kept = base.join(freq.select("_i"), on="_i", how="left_semi")
    ok_baskets = (
        kept.groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .where(F.col("_sz") <= F.lit(int(max_basket_items)))
        .select("_b")
    )
    kept = kept.join(ok_baskets, on="_b", how="left_semi").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a = kept.select("_b", F.col("_i").alias("_ia"))
    b = kept.select("_b", F.col("_i").alias("_ib"))
    pairs = (
        a.join(b, on="_b")
        .where(F.col("_ia") < F.col("_ib"))
        .groupBy("_ia", "_ib")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_cp"))
        .where(F.col("_cp") >= F.lit(int(min_support_count)))
    )
    out = (
        pairs.join(
            freq.select(F.col("_i").alias("_ia"),
                        F.col("_ci").alias("count_a")),
            on="_ia",
        )
        .join(
            freq.select(F.col("_i").alias("_ib"),
                        F.col("_ci").alias("count_b")),
            on="_ib",
        )
        .select(
            F.col("_ia").alias("item_a"),
            F.col("_ib").alias("item_b"),
            F.col("_cp").alias("pair_count"),
            "count_a",
            "count_b",
            F.round(
                F.col("_cp").cast("double")
                / (
                    F.sqrt(F.col("count_a").cast("double"))
                    * F.sqrt(F.col("count_b").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    from padua_spark.io_utils import track_cached

    return track_cached(out, kept, base, freq)
