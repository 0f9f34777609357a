"""Deterministic sampling & splitting for training-data pipelines.

Spark's ``df.sample``/``sampleBy`` draw from per-partition RNG streams:
the selected set changes with partitioning, task retries, and AQE
re-splits — unacceptable for reproducible corpus construction. These
operators derive the randomness from the ROW KEY via the exact-integer
LCG in ``functions.scalar`` (``deterministic_uniform``), so the sample
is a pure function of the data: identical on any engine, any
partitioning, any retry, and stable under incremental re-runs (a row's
fate never changes when other rows are added). Every operator is a
single scan-level predicate/projection — no shuffle, fully pushdown-
friendly — except the exact-k variant, which needs one per-stratum
top-k (WindowGroupLimit keeps that map-side bounded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from padua_spark.functions.scalar import (
    deterministic_uniform,
    deterministic_uniform_sql,
)


def _fraction_expr(
    strata_col: str, fractions: dict[str, float], default: float
) -> Column:
    expr: Column = F.lit(float(default))
    for s, frac in sorted(fractions.items(), reverse=True):
        expr = F.when(
            F.col(strata_col) == F.lit(s), F.lit(float(frac))
        ).otherwise(expr)
    return expr


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum Bernoulli sample: a row survives iff its key-derived
    uniform draw is below its stratum's fraction. Strata missing from
    ``fractions`` use ``default``. Pure filter — reaches the scan."""
    u = deterministic_uniform(F.col(key_col), salt)
    return df.where(u < _fraction_expr(strata_col, fractions, default))


def stratified_sample_sql(
    key_expr: str,
    strata_expr: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: int = 0,
) -> str:
    """ANSI-SQL WHERE predicate twin of :func:`stratified_sample`."""
    u = deterministic_uniform_sql(key_expr, salt)
    whens = " ".join(
        f"WHEN '{s}' THEN {float(f)!r}"
        for s, f in sorted(fractions.items())
    )
    return f"{u} < (CASE {strata_expr} {whens} ELSE {float(default)!r} END)"


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    out_col: str = "split",
    salt: int = 0,
) -> DataFrame:
    """Train/val/test assignment: one ``out_col`` label per row, chosen
    by where the key's uniform draw falls among the cumulative split
    weights (splits ordered by name for determinism; weights need not
    sum to 1 — they are normalized). Pure projection, no shuffle; a
    row's split never changes as the corpus grows."""
    total = float(sum(splits.values()))
    u = deterministic_uniform(F.col(key_col), salt)
    cum = 0.0
    expr: Column | None = None
    names = sorted(splits)
    for name in names[:-1]:
        cum += float(splits[name]) / total
        e = F.when(u < F.lit(cum), F.lit(name))
        expr = e if expr is None else expr.when(u < F.lit(cum), F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def split_assign_sql(
    key_expr: str, splits: dict[str, float], salt: int = 0
) -> str:
    """ANSI-SQL expression twin of :func:`split_assign`."""
    total = float(sum(splits.values()))
    u = deterministic_uniform_sql(key_expr, salt)
    names = sorted(splits)
    cum = 0.0
    whens = []
    for name in names[:-1]:
        cum += float(splits[name]) / total
        whens.append(f"WHEN {u} < {cum!r} THEN '{name}'")
    return f"(CASE {' '.join(whens)} ELSE '{names[-1]}' END)"


def sample_k_per_stratum(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Exactly ``min(k, stratum size)`` rows per stratum: the k rows
    with the smallest key-derived uniform draws (deterministic
    reservoir-sample equivalent). The rank filter compiles to
    WindowGroupLimit in Spark 3.5+: each map task pre-prunes to its
    local top-k before the shuffle, so the exchange carries at most
    k·tasks rows per stratum — the scale path for k ≪ stratum size."""
    u = deterministic_uniform(F.col(key_col), salt).alias("_u")
    w = Window.partitionBy(strata_col).orderBy(F.col("_u"), F.col(key_col))
    staged = df.withColumn("_u", u)
    return (
        staged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.lit(k))
        .drop("_u", "_rn")
    )


def mix_corpus(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    weights: dict[str, float],
    default: float = 1.0,
    salt: int = 0,
    out_col: str = "epoch",
) -> DataFrame:
    """Epoch-weighted domain mixing: each row is emitted
    ``floor(w)`` times plus one more with probability ``frac(w)``,
    where ``w`` is its domain's mixing weight — the standard LLM
    data-recipe step (domains seen for >1 epoch get integer repeats;
    fractional parts are a deterministic key-derived Bernoulli draw,
    so the realized mix is reproducible under any partitioning/retry
    and stable as the corpus grows). Weights < 1 downsample, = 0 drop
    the domain. Output = input columns + ``out_col`` (1-based repeat
    index).

    Pure projection + explode — no shuffle; rows multiply by the
    per-domain weight but the plan stays a single map stage."""
    w = _fraction_expr(domain_col, weights, default)
    u = deterministic_uniform(F.col(key_col), salt)
    n = (
        F.floor(w)
        + F.when(u < (w - F.floor(w)), F.lit(1)).otherwise(F.lit(0))
    ).cast("int")
    copies = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return df.select("*", F.explode(copies).alias(out_col))


def mix_copies_sql(
    key_expr: str,
    domain_expr: str,
    weights: dict[str, float],
    default: float = 1.0,
    salt: int = 0,
) -> str:
    """ANSI-SQL expression twin of :func:`mix_corpus`'s per-row copy
    count (same double arithmetic, same draw)."""
    whens = " ".join(
        f"WHEN '{s}' THEN {float(f)!r}"
        for s, f in sorted(weights.items())
    )
    w = f"(CASE {domain_expr} {whens} ELSE {float(default)!r} END)"
    u = deterministic_uniform_sql(key_expr, salt)
    return (
        f"(CAST(floor({w}) AS BIGINT) + "
        f"CASE WHEN {u} < ({w} - floor({w})) THEN 1 ELSE 0 END)"
    )


def weighted_sample_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: int = 0,
    es_key_col: str = "es_key",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the
    ``k`` rows with the largest Efraimidis–Spirakis keys
    ``ln(u) / w`` (rank-equivalent to ``u^(1/w)``), where ``u`` is the
    row's key-derived uniform draw and ``w`` its weight — the standard
    one-pass reservoir scheme for quality-weighted corpus subsampling.
    Rows with ``w <= 0`` or NULL are excluded.

    Same determinism contract as the other samplers: the draw is a
    pure function of the row key, so the selected set is identical on
    any engine/partitioning/retry. The key is rounded to 9dp before
    ranking: engines round ``ln`` within 1 ulp of each other, and the
    rounding turns any such sub-1e-9 discrepancy into an exact tie
    that the ``key_col`` tiebreak resolves identically everywhere.

    Scale shape: scan-level projection + global top-k via
    ``TakeOrderedAndProject`` (per-partition heap, driver merges k per
    partition) — no sort, no shuffle of the full table."""
    if es_key_col in df.columns:
        raise ValueError(
            f"es_key_col {es_key_col!r} already exists in the input — "
            "pass a different name (withColumn would overwrite it)"
        )
    u = deterministic_uniform(F.col(key_col), salt)
    w = F.col(weight_col).cast("double")
    es = F.round(F.log(u) / w, 9)
    return (
        df.where(w > 0)
        .withColumn(es_key_col, es)
        .orderBy(F.col(es_key_col).desc(), F.col(key_col).asc())
        .limit(k)
    )


def es_key_sql(key_expr: str, weight_expr: str, salt: int = 0) -> str:
    """ANSI-SQL twin of :func:`weighted_sample_k`'s ES key."""
    u = deterministic_uniform_sql(key_expr, salt)
    return f"round(ln({u}) / CAST({weight_expr} AS DOUBLE), 9)"


def mixing_temperature_weights(
    df: DataFrame,
    domain_col: str,
    tau: float,
    size_col: str | None = None,
    token_budget: int | None = None,
) -> DataFrame:
    """Temperature-scaled domain mixing weights — the standard
    multi-source sampling recipe (multilingual mC4/XLM-R style
    ``p_i^τ`` re-balancing; ``τ=1`` keeps natural proportions, ``τ→0``
    approaches uniform): per domain,

    ``p_i = n_i / N``, ``weight_i = p_i^τ / Σ_j p_j^τ``,

    where ``n_i`` counts rows (or sums ``size_col`` — e.g. tokens —
    when given). With ``token_budget``, also emits
    ``epochs = weight_i · budget / n_i``, the per-domain repeat factor
    a sampler like :func:`mix_corpus` consumes directly.

    Output: ``(domain, n, p_raw, weight[, epochs])``, one row per
    domain, ``n`` exact bigint.

    Scale + determinism: one map-side-combining groupBy to the
    k-domain frame; every cross-domain reduction after that runs as a
    window ORDERED BY domain over that constant-size frame, so the
    float summation order is pinned — bit-identical on any engine or
    partitioning (the same discipline as ``qvalues_by``'s harmonic
    sum). Floats are rounded to 9dp.
    """
    n = (
        F.sum(F.col(size_col).cast("bigint"))
        if size_col
        else F.count(F.lit(1))
    )
    per = df.where(F.col(domain_col).isNotNull()).groupBy(
        F.col(domain_col).alias("domain")
    ).agg(n.cast("bigint").alias("n"))
    w_all = Window.orderBy("domain").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = per.select(
        "domain",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(w_all).cast("double")
        ).alias("_p"),
    )
    staged = staged.select(
        "domain",
        "n",
        "_p",
        F.pow(F.col("_p"), F.lit(float(tau))).alias("_pt"),
    )
    weight = F.col("_pt") / F.sum("_pt").over(w_all)
    out_cols = [
        F.col("domain"),
        F.col("n"),
        F.round("_p", 9).alias("p_raw"),
        F.round(weight, 9).alias("weight"),
    ]
    if token_budget is not None:
        out_cols.append(
            F.round(
                weight * F.lit(float(token_budget))
                / F.col("n").cast("double"),
                9,
            ).alias("epochs")
        )
    return staged.select(*out_cols)


def cluster_aware_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    splits: dict[str, float],
    out_col: str = "split",
    salt: int = 0,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Near-dup-leakage-free train/val/test assignment: documents are
    split by their DUPLICATE CLUSTER, not individually, so two near-
    duplicates can never land in different splits (the train/test
    contamination mode :func:`curation.split_leakage_audit` detects
    after the fact — this prevents it by construction). ``pairs`` is
    any candidate-duplicate edge list (e.g.
    :func:`dedup.minhash_lsh_candidates` filtered at a threshold).

    Composes :func:`graph.cluster_assignments` (connected components →
    ``cluster_id``) with :func:`split_assign` keyed on the CLUSTER id:
    the split is a pure function of the cluster's canonical id, so it
    is reproducible under any partitioning and stable as unrelated
    docs are added. Output: ``df.columns + [cluster_id, out_col]``.
    """
    from padua_spark.extensions.graph import cluster_assignments

    labeled = cluster_assignments(df, id_col, pairs, pair_a, pair_b)
    return split_assign(labeled, "cluster_id", splits, out_col, salt)


def dsir_logweights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col: str,
    n_buckets: int = 8192,
    smoothing: float = 0.5,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): per-document importance log-weight under hashed-unigram
    bag-of-words language models of a TARGET domain vs the RAW corpus,

    ``log w(d) = Σ_{tokens t∈d} [ log p_target(bucket(t)) −
    log p_raw(bucket(t)) ]``

    with add-``smoothing`` estimates
    ``p(b) = (c_b + a) / (N + a·B)`` over ``B = n_buckets`` hashed
    token buckets. ``target_col`` is a boolean column marking the
    target-domain rows (they stay in the raw estimate too — raw = the
    whole corpus, per the paper). Resample with
    :func:`weighted_sample_k` on ``exp(log_weight)`` or threshold
    downstream. Output: ``(id, n_tokens, log_weight)`` per document
    with at least one token; ``log_weight`` rounded to 6dp.

    Tokens are the single-space model shared with the dedup family;
    the bucket is the portable codepoint polynomial hash
    (``dedup.token_hashes``) mod ``B`` — engine-reproducible, no
    engine-specific hash.

    Scale shape: ONE corpus scan (explode) → groupBy ``(doc, bucket)``
    (the only data-sized shuffle; map-side combine collapses repeated
    tokens) → the bucket LM table is a SECOND groupBy of that frame's
    output (``B``-row result), its corpus totals pinned by a window
    ordered over the bounded ``B``-row frame, then a BROADCAST join
    back and a per-doc sum. The per-token work never touches Python.
    """
    from padua_spark.extensions.dedup import token_hashes

    a = float(smoothing)
    # Stage the hash array as a plain column BEFORE the explode (the
    # heavy-computed-array rule: an optimizer-synthesized size()>0
    # filter must re-evaluate only a column ref, never the per-token
    # polynomial hashes).
    staged = df.select(
        F.col(id_col),
        F.col(target_col).cast("boolean").alias("_tgt"),
        token_hashes(F.col(text_col)).alias("_arr"),
    )
    toked = staged.select(
        id_col, "_tgt", F.explode("_arr").alias("_tb")
    ).select(
        id_col, "_tgt", (F.col("_tb") % F.lit(n_buckets)).alias("_b")
    )
    per_db = toked.groupBy(id_col, "_b").agg(
        F.count(F.lit(1)).alias("_c"),
        F.first("_tgt").alias("_tgt"),
    )
    bstats = per_db.groupBy("_b").agg(
        F.sum("_c").cast("bigint").alias("_cr"),
        F.sum(F.when(F.col("_tgt"), F.col("_c")).otherwise(0))
        .cast("bigint")
        .alias("_ct"),
    )
    w_all = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lam = (
        F.log(F.col("_ct").cast("double") + F.lit(a))
        - F.log(
            F.sum("_ct").over(w_all).cast("double")
            + F.lit(a * n_buckets)
        )
        - F.log(F.col("_cr").cast("double") + F.lit(a))
        + F.log(
            F.sum("_cr").over(w_all).cast("double")
            + F.lit(a * n_buckets)
        )
    )
    lm = bstats.select("_b", lam.alias("_lam"))
    return (
        per_db.join(F.broadcast(lm), on="_b")
        .groupBy(id_col)
        .agg(
            F.sum("_c").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("_c").cast("double") * F.col("_lam")), 6
            ).alias("log_weight"),
        )
    )


# Poisson(1) CDF, exact doubles shared verbatim with the SQL twin:
# both engines parse the same 17-significant-digit literals to the
# same IEEE754 values, so the per-draw CASE chain is bit-identical.
_POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
    0.999998874797402,
]


def _poisson1_draw(u: Column) -> Column:
    expr = F.lit(len(_POISSON1_CDF))
    for kk in range(len(_POISSON1_CDF) - 1, -1, -1):
        expr = F.when(u < F.lit(_POISSON1_CDF[kk]), F.lit(kk)).otherwise(
            expr
        )
    return expr.cast("bigint")


def poisson1_draw_sql(u_expr: str) -> str:
    """ANSI-SQL twin of the deterministic Poisson(1) draw."""
    whens = " ".join(
        f"WHEN {u_expr} < CAST({c!r} AS DOUBLE) THEN {k}"
        for k, c in enumerate(_POISSON1_CDF)
    )
    return f"(CASE {whens} ELSE {len(_POISSON1_CDF)} END)"


def poisson_bootstrap_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_reps: int = 200,
    alpha: float = 0.05,
    salt: int = 0,
) -> DataFrame:
    """Distributed bootstrap confidence interval for the mean via
    POISSON resampling — the standard streaming/map-reduce bootstrap
    (each replicate weights every row ``w ~ Poisson(1)``, an
    asymptotically exact surrogate for multinomial resampling that
    needs NO global coordination): all ``n_reps`` replicates run in
    ONE data pass. The draw is the repo's key-derived LCG on the
    composed key ``key·n_reps + rep`` (truncated at w=10,
    P < 1e-8), so every replicate is a pure function of the data —
    reproducible on any engine/partitioning/retry.

    CI bounds are exact order statistics of the replicate means:
    ``lo = m_(⌊α/2·R⌋+1)``, ``hi = m_(R−⌊α/2·R⌋)`` — integer ranks,
    no interpolation. Output 1 row:
    ``(n_reps, n_rows, mean, ci_lo, ci_hi)``, floats rounded to 6dp.

    Scale shape: the explode to ``n_reps`` copies is map-side only —
    hash aggregation partially combines to ``n_reps`` rows per task
    BEFORE the (tiny) shuffle, so the exchange carries
    O(R·tasks) rows, never R·data. The replicate-mean frame is
    ``n_reps`` rows — the partitionless rank window over it is over a
    constant-size frame (the allowed pattern). Choose ``n_reps`` for
    the CPU budget: the scan does R LCG draws per row.
    """
    from pyspark.sql import Window

    x = F.col(value_col).cast("double")
    base = df.where(x.isNotNull()).select(
        F.col(key_col).alias("_k"), x.alias("_x")
    )
    reps = base.select(
        "_x",
        F.explode(
            F.sequence(F.lit(1), F.lit(int(n_reps)))
        ).alias("_r"),
        "_k",
    )
    u = deterministic_uniform(
        F.col("_k") * F.lit(int(n_reps)) + F.col("_r"), salt
    )
    weighted = reps.select(
        "_r", _poisson1_draw(u).alias("_w"), "_x"
    )
    per_rep = weighted.groupBy("_r").agg(
        (
            F.sum(F.col("_w").cast("double") * F.col("_x"))
            / F.sum("_w").cast("double")
        ).alias("_m")
    )
    w_rank = Window.orderBy(F.col("_m").asc(), F.col("_r").asc())
    w_all = Window.partitionBy()
    k_lo = int(alpha / 2.0 * n_reps) + 1
    k_hi = n_reps - int(alpha / 2.0 * n_reps)
    ranked = per_rep.select(
        "_m", F.row_number().over(w_rank).alias("_rk")
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.avg("_x").alias("_mean"),
    )
    ci = ranked.agg(
        F.min(F.when(F.col("_rk") == k_lo, F.col("_m"))).alias("_lo"),
        F.min(F.when(F.col("_rk") == k_hi, F.col("_m"))).alias("_hi"),
    )
    return (
        stats.crossJoin(F.broadcast(ci))
        .select(
            F.lit(int(n_reps)).alias("n_reps"),
            "n_rows",
            F.round("_mean", 6).alias("mean"),
            F.round("_lo", 6).alias("ci_lo"),
            F.round("_hi", 6).alias("ci_hi"),
        )
    )


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    strata_cols: list[str] | None = None,
    out_col: str = "fold",
    salt: int = 0,
) -> DataFrame:
    """Deterministic k-fold assignment for cross-validation corpus
    construction — a row's fold is a pure function of its key (and
    salt), so folds are identical on any engine/partitioning/retry
    and stable as the corpus grows (the same non-negotiables as
    :func:`split_assign`).

    Two regimes:
    - ``strata_cols=None`` (default): ``fold = ⌊u·k⌋`` from the
      key-derived exact-integer uniform — a pure scan-level
      projection, no shuffle, folds balanced to within sampling
      noise.
    - ``strata_cols`` given: EXACT balance within each stratum
      (fold sizes differ by ≤ 1) via
      ``fold = (row_number − 1) mod k`` over the stratum ordered by
      ``(u, key)`` — one shuffle on the strata; the hash order makes
      the assignment deterministic yet pseudorandom, and the usual
      bounded-key caveat applies (per-stratum state is the ordered
      partition).

    Returns the input plus ``out_col`` (int 0..k−1); NULL key rows
    get NULL fold.
    """
    if k < 2:
        raise ValueError("kfold_assign: k must be >= 2")
    u = deterministic_uniform(F.col(key_col), salt)
    if not strata_cols:
        fold = F.when(
            F.col(key_col).isNotNull(),
            F.least(F.lit(k - 1), F.floor(u * k).cast("int")),
        )
        return df.withColumn(out_col, fold)
    # NULL-key rows must not consume row_number slots (they would
    # skew the within-stratum balance): fold the non-null subset and
    # union the NULL-key rows back with NULL fold
    valid = df.where(F.col(key_col).isNotNull())
    nulls = df.where(F.col(key_col).isNull()).withColumn(
        out_col, F.lit(None).cast("int")
    )
    w = Window.partitionBy(*strata_cols).orderBy(
        u.asc(), F.col(key_col).asc()
    )
    folded = valid.withColumn(
        out_col, ((F.row_number().over(w) - 1) % k).cast("int")
    )
    return folded.unionByName(nulls)


def kfold_assign_sql(
    key_expr: str, k: int, salt: int = 0
) -> str:
    """ANSI-SQL expression twin of the unstratified
    :func:`kfold_assign` fold."""
    u = deterministic_uniform_sql(key_expr, salt)
    # outer CAST: DuckDB types bare least(...) INT64 here, and the
    # typed oracle gate compares against Spark's INT32 fold column
    return (
        f"CAST(least({k - 1}, CAST(floor({u} * {k}) AS INT)) AS INT)"
    )


def packing_efficiency(
    df: DataFrame,
    token_count_col: str,
    context_len: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Sequence-packing budget profile per optional group — the
    training-data planning numbers for a context window of
    ``context_len`` tokens ("how many sequences does this corpus
    fill, how much is lost to truncation, how much padding would
    one-doc-per-sequence waste?"):

    ``n_docs, total_tokens``; TRUNCATION view (each doc clipped to
    the window): ``n_truncated`` docs over the limit,
    ``tokens_truncated = Σ max(0, tok − L)``, ``tokens_kept``;
    PACKING lower bound ``seq_lower_bound = ⌈tokens_kept / L⌉``
    (greedy concat-packing cannot beat it, first-fit-decreasing is
    within one doc of it per bin); one-doc-per-sequence padding view:
    ``padding_waste = Σ (L − min(tok, L))`` and ``padding_frac``.

    Exact integer aggregation — ONE pass, no sort, no windows (a
    true sequential packer is an inherently serial fold; the bound
    plus the padding extreme bracket every real packer, documented).
    Output per group: ``(groups..., n_docs, total_tokens,
    n_truncated, tokens_truncated, tokens_kept, seq_lower_bound,
    padding_waste, padding_frac)``, frac 6dp.

    Beyond the reference; the standard pre-training batch-planning
    audit.
    """
    group_cols = group_cols or []
    L = int(context_len)
    if L <= 0:
        raise ValueError("packing_efficiency: context_len must be > 0")
    t = F.col(token_count_col).cast("bigint")
    base = df.where(t.isNotNull() & (t >= 0)).select(
        *group_cols, t.alias("_t")
    )
    kept = F.least(F.col("_t"), F.lit(L))
    agg = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_t").cast("bigint").alias("total_tokens"),
        F.sum((F.col("_t") > L).cast("int")).cast("bigint")
        .alias("n_truncated"),
        F.sum(F.greatest(F.col("_t") - L, F.lit(0)))
        .cast("bigint").alias("tokens_truncated"),
        F.sum(kept).cast("bigint").alias("tokens_kept"),
        F.sum(F.lit(L) - kept).cast("bigint").alias("padding_waste"),
    )
    return agg.select(
        *group_cols,
        "n_docs", "total_tokens", "n_truncated", "tokens_truncated",
        "tokens_kept",
        F.ceil(
            F.col("tokens_kept").cast("double") / F.lit(float(L))
        ).cast("bigint").alias("seq_lower_bound"),
        "padding_waste",
        F.round(
            F.col("padding_waste").cast("double")
            / (F.col("n_docs").cast("double") * F.lit(float(L))),
            6,
        ).alias("padding_frac"),
    )
