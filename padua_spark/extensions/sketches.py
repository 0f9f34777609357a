"""Mergeable sketches for corpus profiling at scale.

The profiling questions a 100 TB curation run asks per group (distinct
tokens per language, distinct fingerprints per source, ...) cannot
afford an exact global ``count_distinct`` — that is a full shuffle of
every distinct value. The K-minimum-values (KMV) sketch (Bar-Yossef et
al., "Counting distinct elements in a data stream") answers them with a
bounded summary: keep the k smallest distinct hash values; the
estimator ``(k-1) / u_k`` (``u_k`` = k-th smallest hash normalized to
[0, 1)) is unbiased, and two k-min sets MERGE by union + re-truncation
— exactly the partial/final aggregation shape Spark wants.

Unlike HyperLogLog (whose per-engine implementations differ), KMV over
this package's *portable polynomial hashes* is bit-reproducible on any
engine: the k smallest distinct hashes of the same data are the same
set everywhere, so the estimate is EXACTLY oracle-checkable in DuckDB
— a sketch with a hash-match correctness gate.

Plan shape: JVM-side token hashing (scan-level projection) → one
Arrow-batched ``mapInPandas`` partial pass that holds at most
``k`` values per (group, partition) — memory is O(groups·k),
independent of data size → a tiny native merge aggregation
(``collect_list`` of k-arrays → flatten/distinct/sort/slice). The big
table is never shuffled; only k·partitions values per group move.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from padua_spark.extensions.dedup import MOD

# mapInPandas closures reference this module; executor workers launched
# from a foreign-cwd driver can't import it by name — serialize by value
try:  # pragma: no cover
    import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


def kmv_partials(
    hashed: DataFrame, group_cols: list[str], hash_col: str, k: int
) -> DataFrame:
    """Per-partition KMV partials: one row per (partition, group) with
    that partition's k smallest distinct hash values as an array.

    State is pruned to k values per group after every Arrow batch, so
    the Python side holds O(groups·k) int64s no matter how large the
    partition is."""
    import numpy as np
    import pandas as pd

    gcols = list(group_cols)
    bad = {"kmin", "n_sketch", "kth_hash", "est_distinct"}.intersection(
        gcols
    )
    if bad:
        raise ValueError(
            f"group_cols {sorted(bad)} collide with sketch output columns"
        )

    def _partial(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        state: dict[tuple, "np.ndarray"] = {}
        for pdf in batches:
            # dropna=False: a NULL group key is a real group (pandas
            # silently drops NaN keys by default, which would lose
            # whole groups from the sketch)
            for key, sub in pdf.groupby(gcols, sort=False, dropna=False):
                kt = key if isinstance(key, tuple) else (key,)
                vals = sub[hash_col].to_numpy(dtype="int64")
                prev = state.get(kt)
                if prev is not None:
                    vals = np.concatenate([prev, vals])
                vals = np.unique(vals)  # sorted distinct
                state[kt] = vals[:k]
        if state:
            yield pd.DataFrame(
                [list(kt) + [st.tolist()] for kt, st in state.items()],
                columns=gcols + ["kmin"],
            )

    schema = ", ".join(
        [f"`{c}` {hashed.schema[c].dataType.simpleString()}" for c in gcols]
        + ["kmin array<bigint>"]
    )
    return hashed.select(*gcols, hash_col).mapInPandas(_partial, schema)


def kmv_distinct(
    hashed: DataFrame,
    group_cols: list[str],
    hash_col: str,
    k: int = 64,
    mod: int = MOD,
) -> DataFrame:
    """Approximate distinct count per group from a KMV sketch over
    ``hash_col`` (integer hashes uniform on [0, ``mod``)).

    Output: ``group_cols + (n_sketch, kth_hash, est_distinct)``.
    When a group has fewer than k distinct hashes the sketch IS the
    distinct set and the estimate is exact; otherwise
    ``est = (k-1)·mod / h_k``."""
    partials = kmv_partials(hashed, group_cols, hash_col, k)
    merged = partials.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmin")))),
            1,
            k,
        ).alias("_kmin")
    )
    n = F.size(F.col("_kmin"))
    kth = F.element_at(F.col("_kmin"), k)
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(mod)) / kth.cast("double")
    )
    return merged.select(
        *group_cols,
        n.alias("n_sketch"),
        F.when(n >= k, kth).alias("kth_hash"),
        est.alias("est_distinct"),
    )


def kmv_distinct_tokens(
    df: DataFrame,
    group_cols: list[str],
    text_col: str,
    k: int = 64,
) -> DataFrame:
    """Distinct-token estimate per group: JVM-side per-token polynomial
    hashing (same hash as the dedup pipeline — scan-level projection,
    whole-stage codegen), then the KMV sketch."""
    from padua_spark.extensions.dedup import token_hashes

    staged = df.select(
        *group_cols, token_hashes(F.col(text_col)).alias("_th")
    )
    hashed = staged.select(
        *group_cols, F.explode("_th").alias("_h")
    ).where(F.col("_h").isNotNull())
    return kmv_distinct(hashed, group_cols, "_h", k)


def kmv_overlap(
    hashed: DataFrame,
    group_col: str,
    hash_col: str,
    k: int = 64,
    mod: int = MOD,
) -> DataFrame:
    """Pairwise distinct-overlap estimates between groups from their
    KMV sketches — "how much vocabulary do these two corpora share?"
    without ever shuffling the full value sets.

    For groups A and B: merge the two k-min sets, re-truncate to the k
    smallest (= the KMV sketch of A∪B), estimate ``|A∪B|`` from its
    k-th value, count how many survivors lie in both sketches to get a
    Jaccard estimate, and scale: ``|A∩B| ≈ J·|A∪B|``. All arithmetic
    is over the portable hashes, so the estimates are engine-exact
    (oracle-checkable) like :func:`kmv_distinct`.

    Output: one row per unordered group pair ``(g_a < g_b)`` with
    ``est_union, est_jaccard, est_overlap``. The pair join runs over
    SKETCHES (one k-array row per group), so its cost is
    O(groups²·k) — independent of data size."""
    partials = kmv_partials(hashed, [group_col], hash_col, k)
    sk = partials.groupBy(group_col).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmin")))),
            1,
            k,
        ).alias("_kmin")
    )
    a = sk.select(
        F.col(group_col).alias("g_a"), F.col("_kmin").alias("_ka")
    )
    b = sk.select(
        F.col(group_col).alias("g_b"), F.col("_kmin").alias("_kb")
    )
    pairs = a.join(b, a["g_a"] < b["g_b"])
    u = F.slice(
        F.array_sort(F.array_union(F.col("_ka"), F.col("_kb"))), 1, k
    )
    staged = pairs.select("g_a", "g_b", "_ka", "_kb", u.alias("_ku"))
    n_u = F.size(F.col("_ku"))
    kth = F.element_at(F.col("_ku"), k)
    est_union = F.when(n_u < k, n_u.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(mod)) / kth.cast("double")
    )
    n_both = F.size(
        F.array_intersect(
            F.array_intersect(F.col("_ku"), F.col("_ka")), F.col("_kb")
        )
    )
    jac = n_both.cast("double") / n_u.cast("double")
    return staged.select(
        "g_a",
        "g_b",
        est_union.alias("est_union"),
        jac.alias("est_jaccard"),
        (jac * est_union).alias("est_overlap"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable frequency summary (Cormode & Muthukrishnan,
# "An improved data stream summary: the count-min sketch"). Like KMV
# above, built on the portable polynomial/affine hashes so the ESTIMATE
# itself is bit-reproducible and oracle-checkable in any SQL engine.
# ---------------------------------------------------------------------------


def _char_poly(tok):
    """Per-token polynomial char hash — identical arithmetic to
    ``dedup.token_hashes`` (base 131 over codepoints, mod 2^31−1)."""
    return F.aggregate(
        F.transform(
            F.filter(F.split(tok, ""), lambda ch: ch != ""),
            lambda ch: F.ascii(ch).cast("bigint"),
        ),
        F.lit(7).cast("bigint"),
        lambda acc, c: (acc * F.lit(131) + c) % F.lit(MOD),
    )


def cms_token_sketch(
    df: DataFrame,
    text_col: str,
    depth: int = 4,
    width: int = 1024,
    lowercase: bool = True,
) -> DataFrame:
    """Count-min sketch of corpus token frequencies: ``depth`` hash
    rows × ``width`` buckets of exact integer counts, as rows
    ``(j, bucket, cnt)``.

    Scale shape: one tokenize/explode scan; each token contributes one
    row per hash line, and the ``groupBy(j, bucket)`` partial
    aggregation caps every map task's shuffle output at depth·width
    rows — the sketch is MERGEABLE, so shuffle volume is independent
    of corpus size (the whole point vs an exact token groupBy whose
    key cardinality is the vocabulary). Estimates are upper bounds:
    ``est(t) = min_j cnt[j][h_j(t)] ≥ true(t)``, within
    ``ε·total_tokens`` with probability 1−δ for width=e/ε, depth=ln(1/δ).

    Buckets come from the package's deterministic affine permutations
    of the char-polynomial token hash, so two engines build the SAME
    grid — the estimate is hash-checkable, unlike library CMS
    implementations whose hash families differ.
    """
    from padua_spark.extensions.dedup import _affine_constants

    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = df.select(
        F.explode(
            F.filter(F.split(t, " "), lambda x: x != "")
        ).alias("_tok")
    )
    # stage the heavy char hash ONCE before fanning out to the d
    # affine lines (interpreted HOFs do no CSE)
    hashed = toks.select(_char_poly(F.col("_tok")).alias("_th"))
    lines = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    (F.col("_th") * F.lit(a) + F.lit(b)) % F.lit(MOD)
                    % F.lit(width)
                ).alias("bucket"),
            )
            for j, (a, b) in enumerate(_affine_constants(depth))
        ]
    )
    return (
        hashed.select(F.explode(lines).alias("_l"))
        .select(F.col("_l.j").alias("j"), F.col("_l.bucket").alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each probe token:
    ``est = min_j cnt[j][h_j(token)]`` (0 for never-touched buckets).
    The probe set is small by construction (heavy-hitter candidates),
    so it broadcasts onto the depth·width-row sketch."""
    from padua_spark.extensions.dedup import _affine_constants

    hashed = probes.select(
        F.col(token_col), _char_poly(F.col(token_col)).alias("_th")
    )
    lines = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    (F.col("_th") * F.lit(a) + F.lit(b)) % F.lit(MOD)
                    % F.lit(width)
                ).alias("bucket"),
            )
            for j, (a, b) in enumerate(_affine_constants(depth))
        ]
    )
    fanned = hashed.select(token_col, F.explode(lines).alias("_l")).select(
        token_col, F.col("_l.j").alias("j"), F.col("_l.bucket").alias("bucket")
    )
    joined = fanned.join(sketch, on=["j", "bucket"], how="left")
    return joined.groupBy(token_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    hash_col: str,
    p: int = 10,
) -> DataFrame:
    """Portable HyperLogLog distinct-count estimate per group
    (Flajolet et al. 2007) — the industry-standard mergeable
    cardinality sketch beside the exact-k :func:`kmv_distinct`:
    ``m = 2^p`` registers, register ``j = h & (m-1)`` keeps the max
    leading-zero rank of ``h >> p``.

    Engine-portable by construction: the input is this package's
    31-bit polynomial hash, the rank is computed with an UNROLLED
    threshold-comparison sum (``msb = Σ_k [w >= 2^k]``) — never
    ``floor(log2(w))``, whose float error at exact powers of two
    flips the register — and the bias-corrected estimate
    ``α_m·m²/Σ2^{-M_j}`` with the small-range linear-counting
    fallback (``m·ln(m/V)``) is plain arithmetic any engine
    reproduces bit-for-bit.

    Cost shape: one explode-side aggregation to (group, register) max
    ranks — m rows per group regardless of data size, the whole point
    of the sketch — then an m-row fold per group. 31-bit hashing
    bounds usable cardinality well under 2^{31-p}; raise ``mod``-width
    hashing before trusting estimates beyond ~10^7.

    Returns ``(groups..., n_registers_hit, hll_estimate)``.
    """
    import math

    m = 1 << p
    wbits = 31 - p
    h = F.col(hash_col).cast("bigint")
    regs = df.select(
        *group_cols,
        h.bitwiseAND(F.lit(m - 1)).alias("_reg"),
        F.shiftright(h, p).alias("_w"),
    )
    msb = sum(
        F.when(F.col("_w") >= F.lit(1 << k), 1).otherwise(0)
        for k in range(wbits)
    )
    rho = F.when(F.col("_w") > 0, F.lit(wbits) + 1 - msb).otherwise(
        F.lit(wbits) + 1
    )
    rmax = regs.select(*group_cols, "_reg", rho.alias("_rho")).groupBy(
        *group_cols, "_reg"
    ).agg(F.max("_rho").alias("_m"))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = rmax.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_registers_hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("_m"))).alias("_hsum"),
    )
    # absent registers (rank 0) contribute 2^0 = 1 each to the
    # harmonic sum; V = m - hit is also the linear-counting zero count
    hsum = F.col("_hsum") + (F.lit(m) - F.col("n_registers_hit"))
    raw = F.lit(alpha * m * m) / hsum
    v = (F.lit(m) - F.col("n_registers_hit")).cast("double")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0), lc).otherwise(raw)
    return agg.select(
        *group_cols,
        "n_registers_hit",
        est.alias("hll_estimate"),
    )


def ddsketch_counts(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    relative_accuracy: float = 0.01,
) -> DataFrame:
    """DDSketch bucket counts per group (Masson et al., VLDB 2019) —
    the mergeable quantile sketch with a RELATIVE-error guarantee,
    the production answer to "p99 latency per service over 100 TB of
    events": unlike rank-error sketches (GK/KLL), the estimate is
    within ``±α`` of the TRUE VALUE at every quantile, and the state
    is just (bucket → count), so shards merge by adding counts — one
    ``groupBy`` on any engine, no sequential merge logic.

    Bucket index for ``x > 0``: ``k = ceil(ln(x)/ln(γ))`` with
    ``γ = (1+α)/(1−α)``; zero and negative values land in the
    reserved ``k = NULL`` zero-bucket (this sketch variant covers the
    non-negative metrics it is used for; negatives are counted, and
    quantiles that fall inside the zero-bucket report 0.0).

    ONE hash aggregation over the fact table to (group, bucket,
    count) — map-side combined, bucket domain bounded by
    ``log_γ(max/min)`` (≈ 2900 buckets for α=1% over 12 decades),
    never by data size. Output: ``(groups..., bucket, n)``; feed to
    :func:`ddsketch_quantiles` (which accepts the SAME frame from any
    number of unioned shards — merging IS the groupBy).
    """
    alpha = float(relative_accuracy)
    if not 0 < alpha < 1:
        raise ValueError("relative_accuracy must be in (0, 1)")
    gamma = (1.0 + alpha) / (1.0 - alpha)
    import math

    v = F.col(value_col).cast("double")
    bucket = F.when(
        v > 0, F.ceil(F.log(v) / F.lit(math.log(gamma))).cast("bigint")
    )
    return (
        df.where(v.isNotNull())
        .groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def ddsketch_quantiles(
    counts: DataFrame,
    group_cols: list[str],
    qs: list[float],
    relative_accuracy: float = 0.01,
) -> DataFrame:
    """Quantile estimates from :func:`ddsketch_counts` bucket state:
    for each q, the value of the bucket where the running count first
    reaches ``ceil(q·(n−1)) + 1`` (DDSketch's rank convention), read
    back as the bucket midpoint ``2·γ^k/(γ+1)`` — guaranteed within
    relative ``α`` of the exact quantile of the sketched data.

    The per-group bucket frame is BOUNDED (log_γ of the value range),
    so the ordered cumulative window runs over sketch-sized state —
    never the fact table; the same counts frame from many shards
    (unioned) is first re-merged with one aggregation, making this
    pair a true distributed-sketch API. Output one row per (group,
    q): ``(groups..., q, n_total, estimate)``, estimate rounded 6dp;
    a rank landing in the zero-bucket reports 0.0.
    """
    alpha = float(relative_accuracy)
    gamma = (1.0 + alpha) / (1.0 - alpha)
    import math

    from pyspark import StorageLevel

    # sketch-sized state, consumed once per requested quantile: persist
    # so the q-loop never re-aggregates the fact table
    merged = counts.groupBy(*group_cols, "bucket").agg(
        F.sum("n").cast("bigint").alias("n")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("bucket").asc_nulls_first()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy(*group_cols)
    staged = merged.select(
        *group_cols,
        "bucket",
        F.sum("n").over(w).alias("_cum"),
        F.sum("n").over(w_all).alias("n_total"),
    )
    mid = (
        2.0
        * F.pow(F.lit(gamma), F.col("bucket").cast("double"))
        / F.lit(gamma + 1.0)
    )
    est = F.when(F.col("bucket").isNull(), F.lit(0.0)).otherwise(mid)
    out = None
    for q in qs:
        rank = (
            F.ceil(
                F.lit(float(q))
                * (F.col("n_total").cast("double") - 1.0)
            ).cast("bigint")
            + 1
        )
        hit = (
            staged.where(F.col("_cum") >= rank)
            .groupBy(*group_cols)
            .agg(
                F.max("n_total").alias("n_total"),
                F.round(
                    F.min_by(est, F.col("_cum")), 6
                ).alias("estimate"),
            )
            .select(
                *group_cols,
                F.lit(float(q)).alias("q"),
                "n_total",
                "estimate",
            )
        )
        out = hit if out is None else out.unionByName(hit)
    from padua_spark.io_utils import track_cached

    return track_cached(out, merged)


def ams_f2_sketch(
    df: DataFrame,
    text_col: str,
    n_estimators: int = 16,
    lowercase: bool = True,
) -> DataFrame:
    """AMS (Alon–Matias–Szegedy) F₂ sketch of the corpus token
    frequency vector vs the exact second moment — the self-join-size
    / skew estimator ("how concentrated is this vocabulary?" —
    F₂ = Σ c_t² is exactly the token self-join row count, the number
    every shuffle-join planner wants cheaply):

    each estimator i keeps ONE counter ``Z_i = Σ_t σ_i(t)·c_t`` with
    a ±1 sign hash; ``E[Z_i²] = F₂`` and the estimate is the MEAN of
    ``n_estimators`` independent ``Z_i²`` (pinned — no median-of-
    means stage; 16 means the standard error is ~F₂/2 under Zipf,
    reported honestly via the exact twin). Signs come from the
    package's deterministic affine permutations of the
    char-polynomial token hash (parity bit of the permuted hash), so
    both engines build the SAME sketch — estimate hash-checkable.

    Scale shape: one token aggregation to (token, count), the char
    hash staged ONCE per distinct token, 16 conditional sums in ONE
    aggregation (counters are bigint; squares promoted to
    decimal(38,0) BEFORE multiplying — Z can reach the corpus token
    count). The exact F₂ is computed off the same (token, count)
    frame in the same aggregation. Output 1 row: ``(n_tokens,
    n_types, f2_exact, f2_estimate, rel_error)``, 6dp.

    Beyond the reference; standard per Alon, Matias & Szegedy 1996.
    """
    from padua_spark.extensions.dedup import _affine_constants

    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.filter(F.split(t, " "), lambda x: x != "")
            ).alias("_tok")
        )
        .groupBy("_tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )
    hashed = toks.select(
        "_c", _char_poly(F.col("_tok")).alias("_th")
    )
    aggs = [
        F.sum("_c").cast("bigint").alias("_n"),
        F.count(F.lit(1)).cast("bigint").alias("_v"),
        F.sum(
            F.col("_c").cast("decimal(38,0)") * F.col("_c")
        ).alias("_f2"),
    ]
    for i, (a, b) in enumerate(_affine_constants(int(n_estimators))):
        sign = 1 - 2 * (
            (F.col("_th") * F.lit(a) + F.lit(b)) % F.lit(MOD)
            % F.lit(2)
        )
        aggs.append(
            F.sum(sign * F.col("_c")).cast("bigint").alias(f"_z{i}")
        )
    agg = hashed.agg(*aggs)
    est = None
    for i in range(int(n_estimators)):
        z2 = (
            F.col(f"_z{i}").cast("decimal(38,0)")
            * F.col(f"_z{i}")
        )
        est = z2 if est is None else est + z2
    estd = est.cast("double") / float(n_estimators)
    f2d = F.col("_f2").cast("double")
    return agg.select(
        F.col("_n").alias("n_tokens"),
        F.col("_v").alias("n_types"),
        F.col("_f2").cast("double").alias("f2_exact"),
        F.round(estd, 6).alias("f2_estimate"),
        F.round(
            F.when(f2d > 0, F.abs(estd - f2d) / f2d), 6
        ).alias("rel_error"),
    )


def bloom_membership(
    ref: DataFrame,
    probe: DataFrame,
    text_col: str,
    m_bits: int = 8192,
    k_hashes: int = 4,
    lowercase: bool = True,
) -> DataFrame:
    """Bloom-filter membership audit — build an ``m_bits``/``k``
    Bloom filter over the REFERENCE corpus's token types, probe it
    with another corpus's types, and report the realized
    false-positive rate against exact membership ("can a 1 KB filter
    stand in for the 100 GB reference vocabulary in a streaming
    decontamination pre-screen, and at what FP cost?").

    Set-bit positions come from the package's deterministic affine
    permutations of the char-polynomial token hash
    (``(h·a_j + b_j) mod p mod m``), so both engines build the SAME
    filter — the audit is hash-checkable end to end.

    Scale shape: the filter is a DISTINCT-positions frame (≤ m_bits
    rows, broadcast into the probe join — the bit array never
    materializes driver-side); probe tokens fan out to k positions,
    map-side combined back to per-token matched counts; exact
    membership is one vocab-sized LEFT join. Predicted member =
    all k positions set. Output 1 row: ``(n_ref_types,
    n_probe_types, bits_set, m_bits, k_hashes, n_true_member,
    n_predicted_member, n_false_positive, fp_rate,
    theoretical_fp_rate)``, 6dp; fp_rate over the true NON-members
    (NULL when none), theoretical = (bits_set/m)^k.
    """
    from padua_spark.extensions.dedup import _affine_constants

    m = int(m_bits)
    k = int(k_hashes)

    def types_of(d):
        t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
        return (
            d.where(F.col(text_col).isNotNull())
            .select(
                F.explode(
                    F.filter(F.split(t, " "), lambda x: x != "")
                ).alias("_tok")
            )
            .distinct()
        )

    consts = _affine_constants(k)

    def positions(hashed):
        return F.array(
            *[
                (
                    (F.col("_th") * F.lit(a) + F.lit(b)) % F.lit(MOD)
                    % F.lit(m)
                ).cast("int")
                for a, b in consts
            ]
        )

    from pyspark import StorageLevel

    # ref_types feeds TWO consumers (the bit-position build and the
    # exact-membership join) — persist or the distinct re-runs
    ref_types = types_of(ref).persist(StorageLevel.MEMORY_AND_DISK)
    probe_types = types_of(probe)
    ref_hashed = ref_types.select(
        "_tok", _char_poly(F.col("_tok")).alias("_th")
    )
    bits = (
        ref_hashed.select(
            F.explode(positions(ref_hashed)).alias("_pos")
        )
        .distinct()
    )
    probe_hashed = probe_types.select(
        "_tok", _char_poly(F.col("_tok")).alias("_th")
    )
    fanned = probe_hashed.select(
        "_tok", F.explode(positions(probe_hashed)).alias("_pos")
    )
    matched = (
        fanned.join(
            F.broadcast(bits.withColumn("_hit", F.lit(1))),
            on="_pos",
            how="left",
        )
        .groupBy("_tok")
        .agg(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .alias("_nhit")
        )
    )
    flagged = matched.join(
        ref_types.withColumn("_member", F.lit(True)),
        on="_tok",
        how="left",
    ).select(
        (F.col("_nhit") == k).alias("_pred"),
        F.coalesce(F.col("_member"), F.lit(False)).alias("_true"),
    )
    stats = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probe_types"),
        F.sum(F.col("_true").cast("int")).cast("bigint")
        .alias("n_true_member"),
        F.sum(F.col("_pred").cast("int")).cast("bigint")
        .alias("n_predicted_member"),
        F.sum(
            (F.col("_pred") & ~F.col("_true")).cast("int")
        ).cast("bigint").alias("n_false_positive"),
    )
    scalars = (
        ref_types.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ref_types")
        )
        .crossJoin(
            F.broadcast(
                bits.agg(
                    F.count(F.lit(1)).cast("bigint").alias("bits_set")
                )
            )
        )
    )
    from padua_spark.io_utils import track_cached

    out = stats.crossJoin(F.broadcast(scalars))
    nonmember = (
        F.col("n_probe_types") - F.col("n_true_member")
    ).cast("double")
    fill = (
        F.col("bits_set").cast("double") / float(m)
    )
    final = out.select(
        "n_ref_types", "n_probe_types", "bits_set",
        F.lit(m).cast("bigint").alias("m_bits"),
        F.lit(k).cast("bigint").alias("k_hashes"),
        "n_true_member", "n_predicted_member", "n_false_positive",
        F.round(
            F.when(
                nonmember > 0,
                F.col("n_false_positive").cast("double") / nonmember,
            ),
            6,
        ).alias("fp_rate"),
        F.round(F.pow(fill, F.lit(float(k))), 6)
        .alias("theoretical_fp_rate"),
    )
    return track_cached(final, ref_types)
