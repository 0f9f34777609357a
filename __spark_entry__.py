"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator from SURVEY.md §2 (or a
beyond-reference extension) on the driver's synthetic tables; the
matching ``oracle_sql()`` entry is the equivalent ANSI SQL for DuckDB.
Column names and rounding are aligned on both sides (floats rounded so
cross-engine fp-summation-order differences can't flip the value hash).

Implementation lives in ``padua_spark/`` — this module only wires
operators to the test tables.
"""

from __future__ import annotations

import os
import sys
import weakref
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from padua_spark.extensions import dedup as x_dedup
from padua_spark.extensions import similarity as x_sim
from padua_spark.extensions import text as x_text
from padua_spark.functions.scalar import (
    deterministic_gaussian_sql,
    deterministic_uniform_sql,
)
from padua_spark.operators import (
    aggregates as agg_ops,
    filters as flt,
    imputation as imp,
    normalization as norm,
    process as proc,
    stats as st,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet stores TIMESTAMP(NANOS), which Spark has no type for;
    # read nanos as int64 (runtime-settable legacy conf) and convert where
    # a query needs event time.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Deterministic NTZ→epoch conversion: DuckDB's epoch_us() treats a
    # naive TIMESTAMP as UTC wall-clock; pin Spark's session zone so the
    # NTZ→LTZ cast agrees with it on every machine.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # See padua_spark.session: InferFiltersFromGenerate re-evaluates
    # heavy generator-input expressions per element via pushdown
    # inlining — exclude it (the driver's session doesn't use our
    # factory, so set it here too).
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    )
    # Non-ANSI: degenerate corr/var and x/0 → NULL (reference NaN
    # semantics + DuckDB agreement) instead of Spark-4 ANSI exceptions.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # Memoize the analyzed reader per (session, dir, table): DataFrames
    # are immutable lazy plans, so reuse is safe, and it saves a parquet
    # footer/schema round per query when many queries run in one session
    # (the driver's correctness sweep and bench.py both do). Keyed by
    # the live session object via weakref — id() can be recycled after
    # a stopped session is collected, and the weak key lets a dead
    # session's entries be reclaimed instead of growing forever.
    per_session = _T_CACHE.get(spark)
    if per_session is None:
        per_session = _T_CACHE.setdefault(spark, {})
    df = per_session.get((sf_dir, name))
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name in ("documents", "embeddings"):
            # These tables feed compute-bound per-row stages (text
            # hashing, vector math); a single-row-group file would run
            # that whole stage as one task. No-op when the scan is
            # already parallel (the 100 TB case) — see io_utils.
            from padua_spark.io_utils import spread_narrow_scan

            df = spread_narrow_scan(df)
        per_session[(sf_dir, name)] = df
    return df


_T_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _events_ts_us(spark: SparkSession, sf_dir: str):
    """``events.ts`` → epoch microseconds (bigint), whatever physical
    type the parquet stores: TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ),
    or TIMESTAMP(NANOS) (read as int64 nanos via the nanosAsLong conf).
    Session timezone is pinned to UTC in :func:`_t`, so the NTZ cast is
    byte-identical to DuckDB's ``epoch_us(ts)``."""
    dt = _t(spark, sf_dir, "events").schema["ts"].dataType.simpleString()
    if dt in ("bigint", "long"):
        return F.expr("ts DIV 1000")
    return F.unix_micros(F.col("ts").cast("timestamp"))


def _events_event_time(spark: SparkSession, sf_dir: str):
    """``events.ts`` as a proper TIMESTAMP column (for F.window et al.),
    under the same physical-type polymorphism as :func:`_events_ts_us`."""
    dt = _t(spark, sf_dir, "events").schema["ts"].dataType.simpleString()
    if dt in ("bigint", "long"):
        return F.timestamp_micros(F.expr("ts DIV 1000"))
    return F.col("ts").cast("timestamp")


def _r(c, n: int = 6):
    return F.round(c, n)


_LANCZOS_SQL_COEF = [
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7,
]


def _gammaln_sql(z: str) -> str:
    xv = f"(({z}) - 1.0)"
    acc = repr(_LANCZOS_SQL_COEF[0])
    for i, coef in enumerate(_LANCZOS_SQL_COEF[1:], 1):
        acc = f"({acc} + {coef!r} / ({xv} + {i}.0))"
    t = f"({xv} + 7.5)"
    return (
        f"(0.5 * ln(2 * pi()) + ({xv} + 0.5) * ln({t}) - {t} "
        f"+ ln({acc}))"
    )


def _betainc_chain_sql(tiny: str = "1e-300", n_iter: int = 199) -> str:
    """CTE chain computing ``I_x(a, b)`` for an ``inp(key, x, a, b)``
    CTE already in scope: ``staged`` (branch select + log-gamma
    prefactor), ``cf`` (recursive Lentz), ``res``, and ``pv(key, p)``.
    All state explicitly CAST to DOUBLE — a bare ``1.0`` literal in the
    recursive base types the column DECIMAL(2,1) and silently truncates
    every iteration's state."""
    return f"""
staged AS (
  SELECT *, x < (a + 1.0) / (a + b + 2.0) AS direct,
    CASE WHEN x < (a + 1.0) / (a + b + 2.0) THEN a ELSE b END AS a2,
    CASE WHEN x < (a + 1.0) / (a + b + 2.0) THEN b ELSE a END AS b2,
    CASE WHEN x < (a + 1.0) / (a + b + 2.0) THEN x ELSE 1.0 - x END AS x2,
    exp({_gammaln_sql('a + b')} - {_gammaln_sql('a')}
        - {_gammaln_sql('b')}
        + a * ln(x) + b * ln(1.0 - x)) AS front
  FROM inp WHERE x < 1.0 AND x > 0.0
),
cf AS (
  SELECT key, a2, b2, x2, 0 AS m, CAST(1.0 AS DOUBLE) AS c,
    CAST(1.0 / (CASE WHEN abs(1.0 - (a2 + b2) * x2 / (a2 + 1.0)) < {tiny}
           THEN {tiny} ELSE 1.0 - (a2 + b2) * x2 / (a2 + 1.0) END)
      AS DOUBLE) AS d,
    CAST(1.0 / (CASE WHEN abs(1.0 - (a2 + b2) * x2 / (a2 + 1.0)) < {tiny}
           THEN {tiny} ELSE 1.0 - (a2 + b2) * x2 / (a2 + 1.0) END)
      AS DOUBLE) AS h
  FROM staged
  UNION ALL
  SELECT key, a2, b2, x2, m1, c2, d2, h1 * d2 * c2 AS h
  FROM (
    SELECT key, a2, b2, x2, m1, h1, c1, d1,
      CASE WHEN abs(1.0 + aa2 * d1) < {tiny} THEN 1.0 / {tiny}
           ELSE 1.0 / (1.0 + aa2 * d1) END AS d2,
      CASE WHEN abs(1.0 + aa2 / c1) < {tiny} THEN {tiny}
           ELSE 1.0 + aa2 / c1 END AS c2
    FROM (
      SELECT key, a2, b2, x2, m1, h * d1 * c1 AS h1, c1, d1,
        -(a2 + m1) * (a2 + b2 + m1) * x2
          / ((a2 + 2.0 * m1) * (a2 + 1.0 + 2.0 * m1)) AS aa2
      FROM (
        SELECT key, a2, b2, x2, m1, h,
          CASE WHEN abs(1.0 + aa1 * d) < {tiny} THEN 1.0 / {tiny}
               ELSE 1.0 / (1.0 + aa1 * d) END AS d1,
          CASE WHEN abs(1.0 + aa1 / c) < {tiny} THEN {tiny}
               ELSE 1.0 + aa1 / c END AS c1
        FROM (
          SELECT key, a2, b2, x2, m + 1 AS m1, c, d, h,
            CAST(m + 1 AS DOUBLE) * (b2 - (m + 1)) * x2
              / ((a2 - 1.0 + 2.0 * (m + 1)) * (a2 + 2.0 * (m + 1)))
              AS aa1
          FROM cf WHERE m < {n_iter}
        )
      )
    )
  )
),
res AS (SELECT key, h FROM cf WHERE m = {n_iter}),
pv AS (
  SELECT i.key,
    CASE WHEN i.x >= 1.0 THEN 1.0
         WHEN i.x <= 0.0 THEN 0.0
         WHEN st.direct THEN st.front * r.h / st.a
         ELSE 1.0 - st.front * r.h / st.b END AS p
  FROM inp i
  LEFT JOIN staged st USING (key)
  LEFT JOIN res r USING (key)
)"""



# ---------------------------------------------------------------------------
# entry — flagship smoke query
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full volcano statistics (per-feature two-sample t-test +
    log2 fold change + s0 significance + p-values) — the composite at
    the heart of the reference (visualize.py:458-676)."""
    sf_dir = "/root/testdata/sf0.001"
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "log2_price", F.log2("l_extendedprice")
    )
    return st.volcano_stats(
        li,
        feature_cols=["l_partkey"],
        group_col="l_returnflag",
        value_col="log2_price",
        group_a="R",
        group_b="A",
        values_are_log2=True,
        minimum_sample_n=2,
    )


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def reg(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return reg


# --- F1 remove_rows_matching (filters.py:4-18) -----------------------------


@_q(
    "remove_rows_matching",
    """
SELECT l_orderkey, l_linenumber, l_returnflag
FROM lineitem WHERE l_returnflag IS NULL OR l_returnflag <> 'R'
""",
)
def q_remove_rows_matching(spark, sf):
    li = _t(spark, sf, "lineitem")
    out = flt.remove_rows_matching(li, "l_returnflag", "R")
    return out.select("l_orderkey", "l_linenumber", "l_returnflag")


# --- F2 remove_rows_containing (filters.py:21-35) --------------------------


@_q(
    "remove_rows_containing",
    """
SELECT doc_id FROM documents
WHERE text IS NULL OR NOT contains(text, 'spark')
""",
)
def q_remove_rows_containing(spark, sf):
    d = _t(spark, sf, "documents")
    return flt.remove_rows_containing(d, "text", "spark").select("doc_id")


# --- F6 filter_localization_probability (filters.py:77-90) -----------------


@_q(
    "filter_threshold",
    "SELECT event_id FROM events WHERE value >= 250.0",
)
def q_filter_threshold(spark, sf):
    e = _t(spark, sf, "events")
    return flt.filter_localization_probability(
        e, threshold=250.0, column="value"
    ).select("event_id")


# --- F7 minimum_valid_values_in_any_group (filters.py:93-129) ---------------


@_q(
    "min_valid_in_any_group",
    """
WITH f AS (
  SELECT *, CASE WHEN l_discount > 0 THEN l_quantity END AS val
  FROM lineitem
),
k AS (
  SELECT l_partkey
  FROM (
    SELECT l_partkey, l_returnflag, count(val) AS c
    FROM f GROUP BY 1, 2
  ) GROUP BY l_partkey HAVING max(c) >= 8
)
SELECT f.l_orderkey, f.l_linenumber, f.l_partkey
FROM f WHERE f.l_partkey IN (SELECT l_partkey FROM k)
""",
)
def q_min_valid(spark, sf):
    li = _t(spark, sf, "lineitem").withColumn(
        "val", F.when(F.col("l_discount") > 0, F.col("l_quantity"))
    )
    out = flt.minimum_valid_values_in_any_group(
        li, ["l_partkey"], ["l_returnflag"], "val", n=8
    )
    return out.select("l_orderkey", "l_linenumber", "l_partkey")


# --- F8 search (filters.py:132-152) -----------------------------------------


@_q(
    "search",
    """
SELECT doc_id FROM documents
WHERE (text IS NOT NULL AND contains(text, 'fast'))
   OR (source IS NOT NULL AND contains(source, 'fast'))
""",
)
def q_search(spark, sf):
    d = _t(spark, sf, "documents")
    return flt.search(d, "fast", ["text", "source"]).select("doc_id")


# --- A1 subtract_group_median (normalization.py:4-22) ------------------------


@_q(
    "median_normalize",
    """
WITH med AS (
  SELECT l_returnflag, median(l_extendedprice) AS md
  FROM lineitem GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber,
       round(l.l_extendedprice - m.md, 6) AS value_norm
FROM lineitem l JOIN med m USING (l_returnflag)
""",
)
def q_median_normalize(spark, sf):
    li = _t(spark, sf, "lineitem")
    out = norm.subtract_group_median(
        li, ["l_returnflag"], "l_extendedprice", out_col="value_norm"
    )
    return out.select(
        "l_orderkey", "l_linenumber", _r(F.col("value_norm")).alias("value_norm")
    )


# --- A10 group_mean_ratio (io.py:176, visualize.py:534-539) ------------------


@_q(
    "group_mean_ratio",
    """
WITH g AS (
  SELECT l_partkey,
         avg(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END) AS mean_a,
         avg(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END) AS mean_b
  FROM lineitem GROUP BY 1
)
SELECT l_partkey, round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
       round(CASE WHEN mean_b <> 0 THEN mean_a / mean_b END, 6) AS ratio,
       round(CASE WHEN mean_b <> 0 AND mean_a / mean_b > 0
             THEN log2(mean_a / mean_b) END, 6) AS log2_ratio
FROM g
""",
)
def q_group_mean_ratio(spark, sf):
    li = _t(spark, sf, "lineitem")
    out = agg_ops.group_mean_ratio(
        li, ["l_partkey"], "l_returnflag", "l_extendedprice", "R", "A"
    )
    return out.select(
        "l_partkey",
        _r("mean_a").alias("mean_a"),
        _r("mean_b").alias("mean_b"),
        _r("ratio").alias("ratio"),
        _r("log2_ratio").alias("log2_ratio"),
    )


# --- T1 ttest_ind_stats (analysis.py:467-498) --------------------------------

_TTEST_ORACLE = """
WITH g AS (
  SELECT l_partkey,
    avg(CASE WHEN l_returnflag='R' THEN l_quantity END)      AS mean_a,
    avg(CASE WHEN l_returnflag='A' THEN l_quantity END)      AS mean_b,
    count(CASE WHEN l_returnflag='R' THEN l_quantity END)    AS n_a,
    count(CASE WHEN l_returnflag='A' THEN l_quantity END)    AS n_b,
    var_samp(CASE WHEN l_returnflag='R' THEN l_quantity END) AS var_a,
    var_samp(CASE WHEN l_returnflag='A' THEN l_quantity END) AS var_b
  FROM lineitem GROUP BY 1
),
t AS (
  SELECT *,
    ((n_a - 1) * var_a + (n_b - 1) * var_b)
      / CAST(n_a + n_b - 2 AS DOUBLE) AS pooled
  FROM g
)
SELECT l_partkey,
  round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
  n_a, n_b,
  round(CASE WHEN n_a >= 2 AND n_b >= 2
             AND sqrt(pooled * (1.0 / n_a + 1.0 / n_b)) > 0
        THEN (mean_a - mean_b) / sqrt(pooled * (1.0 / n_a + 1.0 / n_b))
        END, 6) AS t_stat,
  CASE WHEN n_a >= 2 AND n_b >= 2
       THEN CAST(n_a + n_b - 2 AS DOUBLE) END AS df
FROM t
"""


@_q("ttest_ind_stats", _TTEST_ORACLE)
def q_ttest_ind_stats(spark, sf):
    li = _t(spark, sf, "lineitem")
    out = st.ttest_ind_stats(
        li, ["l_partkey"], "l_returnflag", "l_quantity", "R", "A"
    )
    return out.select(
        "l_partkey",
        _r("mean_a").alias("mean_a"),
        _r("mean_b").alias("mean_b"),
        "n_a",
        "n_b",
        _r("t_stat").alias("t_stat"),
        "df",
    )


# --- T2 ttest_1samp_stats (visualize.py:556-557) -----------------------------


@_q(
    "ttest_1samp_stats",
    """
WITH g AS (
  SELECT l_returnflag,
         avg(l_discount - 0.05)         AS mean,
         stddev_samp(l_discount - 0.05) AS sd,
         count(l_discount - 0.05)       AS n
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, round(mean, 6) AS mean, round(sd, 6) AS sd, n,
  round(CASE WHEN n >= 2 AND sd > 0
        THEN (mean - 0.0) / (sd / sqrt(n)) END, 6) AS t_stat,
  CASE WHEN n >= 2 THEN CAST(n - 1 AS DOUBLE) END AS df
FROM g
""",
)
def q_ttest_1samp_stats(spark, sf):
    li = _t(spark, sf, "lineitem").withColumn(
        "val", F.col("l_discount") - F.lit(0.05)
    )
    out = st.ttest_1samp_stats(li, ["l_returnflag"], "val", popmean=0.0)
    return out.select(
        "l_returnflag",
        _r("mean").alias("mean"),
        _r("sd").alias("sd"),
        "n",
        _r("t_stat").alias("t_stat"),
        "df",
    )


def _ttest_1samp_pv_oracle() -> str:
    return f"""
WITH RECURSIVE g AS (
  SELECT l_returnflag,
         avg(l_discount - 0.05)         AS mean,
         stddev_samp(l_discount - 0.05) AS sd,
         count(l_discount - 0.05)       AS n
  FROM lineitem GROUP BY 1
),
s AS (
  SELECT l_returnflag,
    CASE WHEN n >= 2 AND sd > 0
         THEN (mean - 0.0) / (sd / sqrt(n)) END AS t_stat,
    CASE WHEN n >= 2 THEN CAST(n - 1 AS DOUBLE) END AS df
  FROM g
),
inp AS (
  SELECT l_returnflag AS key,
    CAST(df / (df + t_stat * t_stat) AS DOUBLE) AS x,
    CAST(df / 2.0 AS DOUBLE) AS a, CAST(0.5 AS DOUBLE) AS b
  FROM s WHERE t_stat IS NOT NULL AND df > 0
),
{_betainc_chain_sql()}
SELECT s.l_returnflag,
  round(s.t_stat, 6) AS t_stat, s.df,
  round(pv.p, 6) AS p_value
FROM s LEFT JOIN pv ON s.l_returnflag = pv.key
"""


@_q("ttest_1samp_pvalues", _ttest_1samp_pv_oracle())
def q_ttest_1samp_pvalues(spark, sf):
    """One-sample t-test with p-values (T2 completed — the reference's
    shipped ttest_1samp is broken; this is the working semantics
    inlined in volcano, visualize.py:556-557). Third CDF-level hash
    gate; at df ~ 20000 both engines run the identical 199-step
    recursion, so even a non-fully-converged fraction matches."""
    from padua_spark.functions.distributions import t_sf_udf

    li = _t(spark, sf, "lineitem").withColumn(
        "val", F.col("l_discount") - F.lit(0.05)
    )
    out = st.ttest_1samp_stats(li, ["l_returnflag"], "val", popmean=0.0)
    # stage the p-value BEFORE the select that rounds/re-aliases t_stat:
    # in one select Catalyst can resolve the UDF's t_stat reference
    # against the same-named ROUNDED output column (see
    # q_ks_test_pvalues, where that measurably flipped p at 1e-5)
    staged = out.withColumn("_p_raw", t_sf_udf(F.col("t_stat"), F.col("df")))
    return staged.select(
        "l_returnflag",
        _r("t_stat").alias("t_stat"),
        "df",
        _r(F.col("_p_raw")).alias("p_value"),
    )


# --- T3 anova_1way_stats (analysis.py:387-432) -------------------------------


@_q(
    "anova_1way_stats",
    """
WITH pg AS (
  SELECT l_partkey, l_returnflag,
         count(l_quantity) AS n, avg(l_quantity) AS m,
         var_samp(l_quantity) AS v
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2
),
c AS (
  SELECT l_partkey,
         CAST(sum(n) AS BIGINT) AS n_total,
         count(*) AS k_groups,
         sum(n * m) AS s1,
         sum(n * m * m) AS s2,
         sum(CASE WHEN n > 1 THEN (n - 1) * v ELSE 0.0 END) AS ssw
  FROM pg GROUP BY 1
)
SELECT l_partkey, n_total, k_groups, round(ssw, 6) AS ssw,
  round(CASE WHEN k_groups >= 2 AND CAST(n_total AS DOUBLE) - k_groups > 0
             AND ssw > 0
        THEN ((s2 - CAST(n_total AS DOUBLE)
                    * (s1 / CAST(n_total AS DOUBLE))
                    * (s1 / CAST(n_total AS DOUBLE)))
              / (CAST(k_groups AS DOUBLE) - 1))
             / (ssw / (CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE)))
        END, 6) AS f_stat,
  CASE WHEN k_groups >= 2
       THEN CAST(k_groups AS DOUBLE) - 1 END AS dfn,
  CASE WHEN CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE) > 0
       THEN CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE) END AS dfd
FROM c
""",
)
def q_anova_stats(spark, sf):
    li = _t(spark, sf, "lineitem")
    out = st.anova_1way_stats(li, ["l_partkey"], "l_returnflag", "l_quantity")
    return out.select(
        "l_partkey",
        "n_total",
        "k_groups",
        _r("ssw").alias("ssw"),
        _r("f_stat").alias("f_stat"),
        "dfn",
        "dfd",
    )


# --- ext: Wilcoxon signed-rank (paired nonparametric) ------------------------


_WILCOXON_STATS_ORACLE = """
WITH pp AS (
  SELECT l_orderkey AS pair,
         avg(CASE WHEN l_linenumber % 2 = 1 THEN l_quantity END) AS va,
         avg(CASE WHEN l_linenumber % 2 = 0 THEN l_quantity END) AS vb
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1
),
d AS (
  SELECT va - vb AS d FROM pp
  WHERE va IS NOT NULL AND vb IS NOT NULL AND va - vb <> 0
),
per AS (
  SELECT abs(d) AS v,
    count(*) FILTER (d > 0) AS ca,
    count(*) FILTER (d < 0) AS cb
  FROM d GROUP BY abs(d)
),
stepped AS (
  SELECT ca, cb, ca + cb AS cnt,
    sum(ca + cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      - (ca + cb) AS before
  FROM per
)
SELECT CAST(sum(ca * (2 * before + cnt + 1)) AS BIGINT) AS w2_plus,
       CAST(sum(cb * (2 * before + cnt + 1)) AS BIGINT) AS w2_minus,
       CAST(sum(ca) + sum(cb) AS BIGINT) AS n_nonzero,
       CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term
FROM stepped
"""


@_q("wilcoxon_signed_rank_stats", _WILCOXON_STATS_ORACLE)
def q_wilcoxon_signed_rank_stats(spark, sf):
    """Wilcoxon signed-rank EXACT surface: doubled rank sums
    2W+/2W-, pair count, and the tie-correction sum — all integers by
    construction (midranks doubled before summation), so the row is
    hash-stable on ANY engine/version: no float ever enters the
    column set. The paired companion to reference analysis.py:467-498;
    rounded z/p live in the separate ``wilcoxon_signed_rank_pvalues``
    entry (the same stats/pvalues split as the passing
    ttest_*/anova_* pattern), so an environment-level float or
    decimal-type quirk can never redden the exact-statistic gate."""
    li = _t(spark, sf, "lineitem").withColumn(
        "cond", F.col("l_linenumber") % 2
    )
    out = st.wilcoxon_signed_rank_stats(
        li, ["l_orderkey"], "cond", "l_quantity", 1, 0
    )
    return out.select("w2_plus", "w2_minus", "n_nonzero", "tie_term")


@_q(
    "wilcoxon_signed_rank_pvalues",
    """
WITH pp AS (
  SELECT l_orderkey AS pair,
         avg(CASE WHEN l_linenumber % 2 = 1 THEN l_quantity END) AS va,
         avg(CASE WHEN l_linenumber % 2 = 0 THEN l_quantity END) AS vb
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1
),
d AS (
  SELECT va - vb AS d FROM pp
  WHERE va IS NOT NULL AND vb IS NOT NULL AND va - vb <> 0
),
per AS (
  SELECT abs(d) AS v,
    count(*) FILTER (d > 0) AS ca,
    count(*) FILTER (d < 0) AS cb
  FROM d GROUP BY abs(d)
),
stepped AS (
  SELECT ca, cb, ca + cb AS cnt,
    sum(ca + cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      - (ca + cb) AS before
  FROM per
),
agg AS (
  SELECT CAST(sum(ca * (2 * before + cnt + 1)) AS BIGINT) AS w2_plus,
         CAST(sum(ca) + sum(cb) AS BIGINT) AS n_nonzero,
         CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term
  FROM stepped
),
u AS (
  SELECT *, (CAST(w2_plus AS DOUBLE) / 2.0
             - CAST(n_nonzero AS DOUBLE)
               * (CAST(n_nonzero AS DOUBLE) + 1.0) / 4.0)
    / sqrt((CAST(n_nonzero AS DOUBLE)
            * (CAST(n_nonzero AS DOUBLE) + 1.0)
            * (2.0 * CAST(n_nonzero AS DOUBLE) + 1.0)
            - CAST(tie_term AS DOUBLE) / 2.0) / 24.0) AS z
  FROM agg
),
e AS (
  SELECT *, abs(z) / sqrt(2.0) AS x,
         1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
  FROM u
)
SELECT n_nonzero, round(z, 6) AS z,
  round((0.254829592 * t + -0.284496736 * t * t
         + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
         + 1.061405429 * t * t * t * t * t) * exp(-x * x), 6)
    AS p_normal
FROM e
""",
)
def q_wilcoxon_signed_rank_pvalues(spark, sf):
    """Wilcoxon signed-rank FLOAT surface: tie-corrected normal z and
    the A&S-erfc two-sided p, rounded to 6 decimals, anchored by the
    integer pair count. Identical closed-form expressions on both
    engines; the exact rank sums are gated separately in
    ``wilcoxon_signed_rank_stats``."""
    li = _t(spark, sf, "lineitem").withColumn(
        "cond", F.col("l_linenumber") % 2
    )
    out = st.wilcoxon_signed_rank_stats(
        li, ["l_orderkey"], "cond", "l_quantity", 1, 0
    )
    return out.select(
        "n_nonzero", _r("z").alias("z"),
        _r("p_normal").alias("p_normal"),
    )


# --- ext: paired t-test (matched designs) ------------------------------------


@_q(
    "ttest_paired_stats",
    """
WITH pp AS (
  SELECT l_returnflag AS f, l_orderkey AS pair,
         avg(CASE WHEN l_linenumber % 2 = 1 THEN l_quantity END) AS va,
         avg(CASE WHEN l_linenumber % 2 = 0 THEN l_quantity END) AS vb
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2
),
d AS (
  SELECT f, va - vb AS d FROM pp
  WHERE va IS NOT NULL AND vb IS NOT NULL
),
g AS (
  SELECT f, avg(d) AS mean, stddev_samp(d) AS sd,
         CAST(count(d) AS BIGINT) AS n
  FROM d GROUP BY 1
)
SELECT f AS l_returnflag, round(mean, 6) AS mean, round(sd, 6) AS sd,
  n,
  round(CASE WHEN n >= 2 AND sd > 0
        THEN mean / (sd / sqrt(n)) END, 6) AS t_stat,
  CASE WHEN n >= 2 THEN CAST(n - 1 AS DOUBLE) END AS df
FROM g
""",
)
def q_ttest_paired(spark, sf):
    """Paired t-test (odd vs even line numbers matched within each
    order, replicates mean-collapsed per side) — the matched-design
    test between ttest_ind and ttest_1samp."""
    li = _t(spark, sf, "lineitem").withColumn(
        "cond", F.col("l_linenumber") % 2
    )
    out = st.ttest_paired_stats(
        li, ["l_returnflag"], ["l_orderkey"], "cond", "l_quantity",
        1, 0,
    )
    return out.select(
        "l_returnflag",
        _r("mean").alias("mean"),
        _r("sd").alias("sd"),
        "n",
        _r("t_stat").alias("t_stat"),
        "df",
    )


# --- ext: correlation significance (t-distributed r under H0) ----------------


def _corr_pvalues_oracle() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  SELECT a.l_returnflag AS sample_x, b.l_returnflag AS sample_y,
         corr(a.v, b.v) AS pearson_r, count(*) AS n_pairs
  FROM (
    SELECT l_partkey, l_returnflag, avg(l_quantity) AS v
    FROM lineitem GROUP BY 1, 2
  ) a
  JOIN (
    SELECT l_partkey, l_returnflag, avg(l_quantity) AS v
    FROM lineitem GROUP BY 1, 2
  ) b USING (l_partkey)
  GROUP BY 1, 2
),
s AS (
  SELECT *, CASE WHEN n_pairs > 2 AND pearson_r IS NOT NULL
                  AND 1.0 - pearson_r * pearson_r > 1e-12
            THEN pearson_r * sqrt(CAST(n_pairs AS DOUBLE) - 2)
                 / sqrt(1.0 - pearson_r * pearson_r) END AS t_stat
  FROM pairs
),
inp AS (
  SELECT sample_x || '|' || sample_y AS key,
    CAST((n_pairs - 2.0) / ((n_pairs - 2.0) + t_stat * t_stat)
         AS DOUBLE) AS x,
    CAST((n_pairs - 2.0) / 2.0 AS DOUBLE) AS a,
    CAST(0.5 AS DOUBLE) AS b
  FROM s WHERE t_stat IS NOT NULL
),
{_betainc_chain_sql()}
SELECT s.sample_x, s.sample_y, round(s.pearson_r, 6) AS pearson_r,
  CAST(s.n_pairs AS BIGINT) AS n_pairs,
  round(s.t_stat, 6) AS t_stat, round(pv.p, 6) AS p_value
FROM s LEFT JOIN pv ON s.sample_x || '|' || s.sample_y = pv.key
"""


@_q("correlation_pvalues", _corr_pvalues_oracle())
def q_correlation_pvalues(spark, sf):
    """Sample-correlation matrix WITH significance: t = r·√(n−2)/√(1−r²)
    under H₀, p from the t CDF — a fifth CDF-level hash gate (the
    oracle runs the same 199-step incomplete-beta recursion)."""
    from padua_spark.operators.aggregates import correlation_significance

    li = _t(spark, sf, "lineitem")
    long = li.groupBy("l_partkey", "l_returnflag").agg(
        F.avg("l_quantity").alias("v")
    )
    out = correlation_significance(long, "l_returnflag", ["l_partkey"], "v")
    return out.select(
        "sample_x", "sample_y",
        _r("pearson_r").alias("pearson_r"),
        "n_pairs",
        _r("t_stat").alias("t_stat"),
        _r("p_value").alias("p_value"),
    )


# --- ext: two-way ANOVA (beyond the reference's 1-way loop) ------------------


@_q(
    "anova_2way_stats",
    """
WITH cells AS (
  SELECT l_partkey AS f, l_returnflag AS fa, l_linestatus AS fb,
         count(l_quantity) AS n, sum(l_quantity) AS s,
         sum(l_quantity * l_quantity) AS ss
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2, 3
),
pa AS (SELECT f, fa, sum(n) AS na, sum(s) AS sa FROM cells GROUP BY 1, 2),
ta AS (
  SELECT f, count(*) AS k_a,
         sum(sa * sa / CAST(na AS DOUBLE)) AS t_a
  FROM pa GROUP BY 1
),
pb AS (SELECT f, fb, sum(n) AS nb, sum(s) AS sb FROM cells GROUP BY 1, 2),
tb AS (
  SELECT f, count(*) AS k_b,
         sum(sb * sb / CAST(nb AS DOUBLE)) AS t_b
  FROM pb GROUP BY 1
),
tot AS (
  SELECT f, CAST(sum(n) AS BIGINT) AS n_total, sum(s) AS stot,
         count(*) AS n_cells,
         sum(s * s / CAST(n AS DOUBLE)) AS t_cells,
         sum(ss - s * s / CAST(n AS DOUBLE)) AS ss_within
  FROM cells GROUP BY 1
),
j AS (
  SELECT tot.*, ta.k_a, ta.t_a, tb.k_b, tb.t_b,
         stot * stot / CAST(n_total AS DOUBLE) AS cf
  FROM tot JOIN ta USING (f) JOIN tb USING (f)
),
d AS (
  SELECT f, n_total, k_a, k_b,
         t_a - cf AS ss_a, t_b - cf AS ss_b,
         (t_cells - cf) - (t_a - cf) - (t_b - cf) AS ss_ab,
         ss_within,
         CAST(k_a AS DOUBLE) - 1 AS dfn_a,
         CAST(k_b AS DOUBLE) - 1 AS dfn_b,
         (CAST(k_a AS DOUBLE) - 1) * (CAST(k_b AS DOUBLE) - 1) AS dfn_ab,
         CAST(n_total AS DOUBLE) - n_cells AS df_w
  FROM j
)
SELECT f AS l_partkey, n_total, k_a, k_b,
  round(ss_a, 6) AS ss_a, round(ss_b, 6) AS ss_b,
  round(ss_ab, 6) AS ss_ab, round(ss_within, 6) AS ss_within,
  CASE WHEN dfn_a > 0 THEN dfn_a END AS dfn_a,
  CASE WHEN dfn_b > 0 THEN dfn_b END AS dfn_b,
  CASE WHEN dfn_ab > 0 THEN dfn_ab END AS dfn_ab,
  CASE WHEN df_w > 0 THEN df_w END AS df_within,
  round(CASE WHEN dfn_a > 0 AND df_w > 0 AND ss_within > 0
        THEN (ss_a / dfn_a) / (ss_within / df_w) END, 6) AS f_a,
  round(CASE WHEN dfn_b > 0 AND df_w > 0 AND ss_within > 0
        THEN (ss_b / dfn_b) / (ss_within / df_w) END, 6) AS f_b,
  round(CASE WHEN dfn_ab > 0 AND df_w > 0 AND ss_within > 0
        THEN (ss_ab / dfn_ab) / (ss_within / df_w) END, 6) AS f_ab
FROM d
""",
)
def q_anova_2way(spark, sf):
    """Two-way ANOVA (returnflag × linestatus main effects and
    interaction) per part — the factorial design the reference's
    one-way loop cannot express; one cell-stats pass, exact
    sum-of-squares arithmetic."""
    li = _t(spark, sf, "lineitem")
    out = st.anova_2way_stats(
        li, ["l_partkey"], "l_returnflag", "l_linestatus", "l_quantity"
    )
    return out.select(
        "l_partkey", "n_total", "k_a", "k_b",
        _r("ss_a").alias("ss_a"), _r("ss_b").alias("ss_b"),
        _r("ss_ab").alias("ss_ab"), _r("ss_within").alias("ss_within"),
        "dfn_a", "dfn_b", "dfn_ab", "df_within",
        _r("f_a").alias("f_a"), _r("f_b").alias("f_b"),
        _r("f_ab").alias("f_ab"),
    )


# --- ext: Levene / Brown-Forsythe variance-homogeneity test ------------------


@_q(
    "levene_stats",
    """
WITH med AS (
  SELECT l_partkey AS f, l_returnflag AS g,
         quantile_cont(l_quantity, 0.5) AS c
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2
),
z AS (
  SELECT l.l_partkey AS f, l.l_returnflag AS g,
         abs(l.l_quantity - med.c) AS z
  FROM lineitem l
  JOIN med ON med.f = l.l_partkey AND med.g = l.l_returnflag
  WHERE l.l_quantity IS NOT NULL
),
pg AS (
  SELECT f, g, count(z) AS n, avg(z) AS m, var_samp(z) AS v
  FROM z GROUP BY 1, 2
),
c AS (
  SELECT f, CAST(sum(n) AS BIGINT) AS n_total, count(*) AS k_groups,
         sum(n * m) AS s1, sum(n * m * m) AS s2,
         sum(CASE WHEN n > 1 THEN (n - 1) * v ELSE 0.0 END) AS ssw
  FROM pg GROUP BY 1
)
SELECT f AS l_partkey, n_total, k_groups, round(ssw, 6) AS ssw,
  round(CASE WHEN k_groups >= 2 AND CAST(n_total AS DOUBLE) - k_groups > 0
             AND ssw > 0
        THEN ((s2 - CAST(n_total AS DOUBLE)
                    * (s1 / CAST(n_total AS DOUBLE))
                    * (s1 / CAST(n_total AS DOUBLE)))
              / (CAST(k_groups AS DOUBLE) - 1))
             / (ssw / (CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE)))
        END, 6) AS f_stat,
  CASE WHEN k_groups >= 2
       THEN CAST(k_groups AS DOUBLE) - 1 END AS dfn,
  CASE WHEN CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE) > 0
       THEN CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE) END AS dfd
FROM c
""",
)
def q_levene(spark, sf):
    """Brown-Forsythe homogeneity-of-variance W per part across
    returnflag groups — the assumption check behind pooled-variance
    t/ANOVA; median centers keep it robust AND engine-exact."""
    li = _t(spark, sf, "lineitem")
    out = st.levene_stats(
        li, ["l_partkey"], "l_returnflag", "l_quantity"
    )
    return out.select(
        "l_partkey", "n_total", "k_groups",
        _r("ssw").alias("ssw"), _r("f_stat").alias("f_stat"),
        "dfn", "dfd",
    )


# --- T4 qvalues (utils.py:8-105; pi0=1 → Benjamini-Hochberg) -----------------

_QVALUE_ORACLE = f"""
WITH p AS (
  SELECT p_partkey,
    {deterministic_uniform_sql('p_partkey', 0)} AS p_value
  FROM part
),
r AS (
  SELECT *, row_number() OVER (ORDER BY p_value) AS rk,
         count(*) OVER () AS m
  FROM p
),
q AS (
  SELECT *, least(1.0 * CAST(m AS DOUBLE) * p_value / CAST(rk AS DOUBLE),
                  1.0) AS q_raw
  FROM r
)
SELECT p_partkey, round(p_value, 9) AS p_value,
  round(min(q_raw) OVER (ORDER BY p_value
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 9) AS q_value
FROM q
"""


@_q("qvalues_bh", _QVALUE_ORACLE)
def q_qvalues(spark, sf):
    from padua_spark.functions.scalar import deterministic_uniform

    part = _t(spark, sf, "part")
    p = part.select(
        "p_partkey",
        deterministic_uniform(F.col("p_partkey"), salt=0).alias("p_value"),
    )
    out = st.qvalues(p, "p_value", pi0=1.0)
    return out.select(
        "p_partkey",
        F.round("p_value", 9).alias("p_value"),
        F.round("q_value", 9).alias("q_value"),
    )


# --- T4 with the reference's λ-grid pi0 estimator (utils.py:50-68) -----------

_QVALUE_STOREY_ORACLE = f"""
WITH p AS (
  SELECT p_partkey,
    {deterministic_uniform_sql('p_partkey', 0)} AS p_value
  FROM part
),
s AS (
  SELECT CASE WHEN count(*) < 100 THEN 1.0
         ELSE least(1.0,
              CAST(sum(CASE WHEN p_value > 0.89 THEN 1 ELSE 0 END)
                   AS DOUBLE)
              / (CAST(count(*) AS DOUBLE) * (1.0 - 0.89))) END AS pi0
  FROM p
),
r AS (
  SELECT *, row_number() OVER (ORDER BY p_value) AS rk,
         count(*) OVER () AS m
  FROM p
),
q AS (
  SELECT r.*, s.pi0,
         least(s.pi0 * CAST(m AS DOUBLE) * p_value / CAST(rk AS DOUBLE),
               1.0) AS q_raw
  FROM r, s
)
SELECT p_partkey, round(p_value, 9) AS p_value, round(pi0, 9) AS pi0,
  round(min(q_raw) OVER (ORDER BY p_value
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 9) AS q_value
FROM q
"""


@_q("qvalues_storey", _QVALUE_STOREY_ORACLE)
def q_qvalues_storey(spark, sf):
    """q-values with the reference's λ-grid pi0 (utils.py:50-68): the
    splrep fit there has no weights so its default smoothing is s=0 —
    an interpolating spline — and splev AT the last grid point λ=0.89
    returns the grid value itself: pi0 = count(p>0.89)/(m·(1−0.89)),
    clipped at 1, m<100 → 1. The same closed form runs in the oracle,
    so the estimator (exposed as a pi0 column) and the q-values it
    scales are both value-hash gated."""
    from padua_spark.functions.scalar import deterministic_uniform

    part = _t(spark, sf, "part")
    p = part.select(
        "p_partkey",
        deterministic_uniform(F.col("p_partkey"), salt=0).alias("p_value"),
    )
    from pyspark.sql import Window

    out = st.qvalues(p, "p_value", pi0="storey")
    m = F.count(F.lit(1)).over(Window.partitionBy())
    n_above = F.count(F.when(F.col("p_value") > 0.89, 1)).over(
        Window.partitionBy()
    )
    est = n_above.cast("double") / (
        m.cast("double") * F.lit(1.0 - 0.89)
    )
    pi0_col = F.when(m < 100, F.lit(1.0)).otherwise(
        F.least(est, F.lit(1.0))
    )
    return out.select(
        "p_partkey",
        F.round("p_value", 9).alias("p_value"),
        F.round(pi0_col, 9).alias("pi0"),
        F.round("q_value", 9).alias("q_value"),
    )


# --- T6 volcano_stats (visualize.py:458-676; statistics core, oracle-able) ---

_VOLCANO_ORACLE = """
WITH li AS (
  SELECT l_partkey, l_returnflag, log2(l_extendedprice) AS lp
  FROM lineitem
),
g AS (
  SELECT l_partkey,
    avg(CASE WHEN l_returnflag='R' THEN lp END)      AS mean_a,
    avg(CASE WHEN l_returnflag='A' THEN lp END)      AS mean_b,
    count(CASE WHEN l_returnflag='R' THEN lp END)    AS n_a,
    count(CASE WHEN l_returnflag='A' THEN lp END)    AS n_b,
    var_samp(CASE WHEN l_returnflag='R' THEN lp END) AS var_a,
    var_samp(CASE WHEN l_returnflag='A' THEN lp END) AS var_b
  FROM li GROUP BY 1
),
t AS (
  SELECT *,
    ((n_a - 1) * var_a + (n_b - 1) * var_b)
      / CAST(n_a + n_b - 2 AS DOUBLE) AS pooled
  FROM g
)
SELECT l_partkey,
  round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b, n_a, n_b,
  round(CASE WHEN n_a >= 3 AND n_b >= 3 THEN
    CASE WHEN n_a >= 2 AND n_b >= 2
              AND sqrt(pooled * (1.0/n_a + 1.0/n_b)) > 0
         THEN (mean_a - mean_b) / sqrt(pooled * (1.0/n_a + 1.0/n_b)) END
    END, 6) AS t_stat,
  CASE WHEN n_a >= 2 AND n_b >= 2
       THEN CAST(n_a + n_b - 2 AS DOUBLE) END AS df,
  round(CASE WHEN n_a >= 3 AND n_b >= 3
        THEN mean_a - mean_b END, 6) AS log2_fc
FROM t
"""


@_q("volcano_stats", _VOLCANO_ORACLE)
def q_volcano_stats(spark, sf):
    li = _t(spark, sf, "lineitem").withColumn(
        "lp", F.log2("l_extendedprice")
    )
    out = st.volcano_stats(
        li,
        ["l_partkey"],
        "l_returnflag",
        "lp",
        "R",
        "A",
        values_are_log2=True,
        minimum_sample_n=3,
        with_pvalues=False,
    )
    return out.select(
        "l_partkey",
        _r("mean_a").alias("mean_a"),
        _r("mean_b").alias("mean_b"),
        "n_a",
        "n_b",
        _r("t_stat").alias("t_stat"),
        "df",
        _r("log2_fc").alias("log2_fc"),
    )


# --- T6 volcano with p-values + s0 classes. The p-value oracle computes
#     the regularized incomplete beta IN SQL: Lanczos log-gamma as an
#     inline expression and the modified-Lentz continued fraction as a
#     199-step recursive CTE — the same algorithm as
#     functions/distributions.py, reproduced to ~1e-14 relative (6dp
#     rounding absorbs the numpy-vs-DuckDB libm ulps), turning the
#     engine's flagship from a rows-only check into a full hash gate. ------


def _volcano_pvalues_oracle() -> str:
    tiny = "1e-300"
    return f"""
WITH RECURSIVE li AS (
  SELECT l_partkey, l_returnflag, log2(l_extendedprice) AS lp
  FROM lineitem
),
g AS (
  SELECT l_partkey,
    avg(CASE WHEN l_returnflag='R' THEN lp END)      AS mean_a,
    avg(CASE WHEN l_returnflag='A' THEN lp END)      AS mean_b,
    count(CASE WHEN l_returnflag='R' THEN lp END)    AS n_a,
    count(CASE WHEN l_returnflag='A' THEN lp END)    AS n_b,
    var_samp(CASE WHEN l_returnflag='R' THEN lp END) AS var_a,
    var_samp(CASE WHEN l_returnflag='A' THEN lp END) AS var_b
  FROM li GROUP BY 1
),
s AS (
  SELECT l_partkey, n_a, n_b,
    CASE WHEN n_a >= 3 AND n_b >= 3 THEN
      CASE WHEN sqrt((((n_a - 1) * var_a + (n_b - 1) * var_b)
                      / CAST(n_a + n_b - 2 AS DOUBLE))
                     * (1.0/n_a + 1.0/n_b)) > 0
           THEN (mean_a - mean_b)
                / sqrt((((n_a - 1) * var_a + (n_b - 1) * var_b)
                        / CAST(n_a + n_b - 2 AS DOUBLE))
                       * (1.0/n_a + 1.0/n_b)) END
    END AS t_stat,
    CASE WHEN n_a >= 2 AND n_b >= 2
         THEN CAST(n_a + n_b - 2 AS DOUBLE) END AS df,
    CASE WHEN n_a >= 3 AND n_b >= 3 THEN mean_a - mean_b END AS fc
  FROM g
),
inp AS (
  SELECT l_partkey AS key,
    CAST(df / (df + t_stat * t_stat) AS DOUBLE) AS x,
    CAST(df / 2.0 AS DOUBLE) AS a, CAST(0.5 AS DOUBLE) AS b
  FROM s WHERE t_stat IS NOT NULL AND df > 0
),
staged AS (
  SELECT *, x < (a + 1.0) / (a + b + 2.0) AS direct,
    CASE WHEN x < (a + 1.0) / (a + b + 2.0) THEN a ELSE b END AS a2,
    CASE WHEN x < (a + 1.0) / (a + b + 2.0) THEN b ELSE a END AS b2,
    CASE WHEN x < (a + 1.0) / (a + b + 2.0) THEN x ELSE 1.0 - x END AS x2,
    exp({_gammaln_sql('a + b')} - {_gammaln_sql('a')}
        - {_gammaln_sql('b')}
        + a * ln(x) + b * ln(1.0 - x)) AS front
  FROM inp WHERE x < 1.0
),
cf AS (
  SELECT key, a2, b2, x2, 0 AS m, CAST(1.0 AS DOUBLE) AS c,
    CAST(1.0 / (CASE WHEN abs(1.0 - (a2 + b2) * x2 / (a2 + 1.0)) < {tiny}
           THEN {tiny} ELSE 1.0 - (a2 + b2) * x2 / (a2 + 1.0) END)
      AS DOUBLE) AS d,
    CAST(1.0 / (CASE WHEN abs(1.0 - (a2 + b2) * x2 / (a2 + 1.0)) < {tiny}
           THEN {tiny} ELSE 1.0 - (a2 + b2) * x2 / (a2 + 1.0) END)
      AS DOUBLE) AS h
  FROM staged
  UNION ALL
  SELECT key, a2, b2, x2, m1, c2, d2, h1 * d2 * c2 AS h
  FROM (
    SELECT key, a2, b2, x2, m1, h1, c1, d1,
      CASE WHEN abs(1.0 + aa2 * d1) < {tiny} THEN 1.0 / {tiny}
           ELSE 1.0 / (1.0 + aa2 * d1) END AS d2,
      CASE WHEN abs(1.0 + aa2 / c1) < {tiny} THEN {tiny}
           ELSE 1.0 + aa2 / c1 END AS c2
    FROM (
      SELECT key, a2, b2, x2, m1, h * d1 * c1 AS h1, c1, d1,
        -(a2 + m1) * (a2 + b2 + m1) * x2
          / ((a2 + 2.0 * m1) * (a2 + 1.0 + 2.0 * m1)) AS aa2
      FROM (
        SELECT key, a2, b2, x2, m1, h,
          CASE WHEN abs(1.0 + aa1 * d) < {tiny} THEN 1.0 / {tiny}
               ELSE 1.0 / (1.0 + aa1 * d) END AS d1,
          CASE WHEN abs(1.0 + aa1 / c) < {tiny} THEN {tiny}
               ELSE 1.0 + aa1 / c END AS c1
        FROM (
          SELECT key, a2, b2, x2, m + 1 AS m1, c, d, h,
            CAST(m + 1 AS DOUBLE) * (b2 - (m + 1)) * x2
              / ((a2 - 1.0 + 2.0 * (m + 1)) * (a2 + 2.0 * (m + 1)))
              AS aa1
          FROM cf WHERE m < 199
        )
      )
    )
  )
),
res AS (SELECT key, h FROM cf WHERE m = 199),
pv AS (
  SELECT i.key AS l_partkey,
    CASE WHEN i.x >= 1.0 THEN 1.0
         WHEN st.direct THEN st.front * r.h / st.a
         ELSE 1.0 - st.front * r.h / st.b END AS p
  FROM inp i
  LEFT JOIN staged st USING (key)
  LEFT JOIN res r USING (key)
),
final AS (
  SELECT s.l_partkey, s.fc, s.t_stat, pv.p,
    CASE WHEN s.fc IS NOT NULL AND pv.p IS NOT NULL
              AND abs(s.fc) > 0.0
              AND pv.p <= pow(10.0, -0.1 / abs(s.fc) + log10(0.05))
         THEN TRUE ELSE FALSE END AS significant
  FROM s LEFT JOIN pv USING (l_partkey)
)
SELECT l_partkey,
  round(fc, 6) AS log2_fc,
  round(t_stat, 6) AS t_stat,
  round(p, 6) AS p_value,
  significant,
  CASE WHEN significant AND fc > 0 THEN 'up'
       WHEN significant AND fc < 0 THEN 'down'
       ELSE 'ns' END AS direction
FROM final
"""


_ANOVA_PV_ORACLE = f"""
WITH RECURSIVE pg AS (
  SELECT l_partkey, l_returnflag,
         count(l_quantity) AS n, avg(l_quantity) AS m,
         var_samp(l_quantity) AS v
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2
),
c AS (
  SELECT l_partkey,
         CAST(sum(n) AS BIGINT) AS n_total,
         count(*) AS k_groups,
         sum(n * m) AS s1,
         sum(n * m * m) AS s2,
         sum(CASE WHEN n > 1 THEN (n - 1) * v ELSE 0.0 END) AS ssw
  FROM pg GROUP BY 1
),
s AS (
  SELECT l_partkey,
    CASE WHEN k_groups >= 2 AND CAST(n_total AS DOUBLE) - k_groups > 0
              AND ssw > 0
    THEN ((s2 - CAST(n_total AS DOUBLE)
                * (s1 / CAST(n_total AS DOUBLE))
                * (s1 / CAST(n_total AS DOUBLE)))
          / (CAST(k_groups AS DOUBLE) - 1))
         / (ssw / (CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE)))
    END AS f_stat,
    CAST(k_groups AS DOUBLE) - 1 AS dfn,
    CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE) AS dfd
  FROM c
),
inp AS (
  SELECT l_partkey AS key,
    CAST(dfd / (dfd + dfn * f_stat) AS DOUBLE) AS x,
    CAST(dfd / 2.0 AS DOUBLE) AS a, CAST(dfn / 2.0 AS DOUBLE) AS b
  FROM s
  WHERE f_stat IS NOT NULL AND dfn > 0 AND dfd > 0 AND f_stat >= 0
),
{_betainc_chain_sql()}
SELECT s.l_partkey,
  round(s.f_stat, 6) AS f_stat,
  CASE WHEN s.dfn > 0 THEN s.dfn END AS dfn,
  CASE WHEN s.dfd > 0 THEN s.dfd END AS dfd,
  round(pv.p, 6) AS p_value
FROM s LEFT JOIN pv ON s.l_partkey = pv.key
"""


@_q("anova_pvalues", _ANOVA_PV_ORACLE)
def q_anova_pvalues(spark, sf):
    """One-way ANOVA F with exact p-values (T3 completed): the numpy
    F-survival UDF on the aggregated per-feature rows; the oracle runs
    the same incomplete beta as a recursive SQL CTE — a second full
    hash gate on a CDF."""
    from padua_spark.functions.distributions import f_sf_udf

    li = _t(spark, sf, "lineitem")
    out = st.anova_1way_stats(
        li, ["l_partkey"], "l_returnflag", "l_quantity"
    )
    # stage the p-value BEFORE the select that rounds/re-aliases f_stat
    # (same rounded-column resolution hazard as q_ks_test_pvalues)
    staged = out.withColumn(
        "_p_raw", f_sf_udf(F.col("f_stat"), F.col("dfn"), F.col("dfd"))
    )
    return staged.select(
        "l_partkey",
        _r("f_stat").alias("f_stat"),
        "dfn",
        "dfd",
        _r(F.col("_p_raw")).alias("p_value"),
    )


@_q("volcano_pvalues", _volcano_pvalues_oracle())
def q_volcano_pvalues(spark, sf):
    li = _t(spark, sf, "lineitem").withColumn(
        "lp", F.log2("l_extendedprice")
    )
    out = st.volcano_stats(
        li,
        ["l_partkey"],
        "l_returnflag",
        "lp",
        "R",
        "A",
        values_are_log2=True,
        minimum_sample_n=3,
        s0=0.1,
        fdr=0.05,
    )
    return out.select(
        "l_partkey",
        _r("log2_fc").alias("log2_fc"),
        _r("t_stat").alias("t_stat"),
        # 6dp (not 9): the oracle's recursive-CTE incomplete beta
        # reproduces the numpy CDF to ~1e-14 relative; 6dp rounding
        # absorbs libm/iteration-count ulps on both sides.
        F.round("p_value", 6).alias("p_value"),
        "significant",
        "direction",
    )


# --- A3 non_zero_sum / A4-A5 enrichment (analysis.py:221-287) ----------------


@_q(
    "enrichment_ratio",
    """
WITH base AS (
  SELECT user_id % 100 AS cohort,
         event_type = 'click' AS flag,
         CASE WHEN value <> 0 THEN value END AS v
  FROM events
)
SELECT cohort,
  round(sum(CASE WHEN flag THEN v ELSE 0.0 END), 6) AS modified_sum,
  round(sum(CASE WHEN NOT flag THEN v ELSE 0.0 END), 6) AS unmodified_sum,
  round(sum(CASE WHEN flag THEN v ELSE 0.0 END)
        / sum(COALESCE(v, 0.0)), 6) AS enrichment
FROM base GROUP BY 1
""",
)
def q_enrichment(spark, sf):
    e = _t(spark, sf, "events").withColumn(
        "cohort", F.col("user_id") % 100
    )
    out = agg_ops.enrichment(
        e, ["cohort"], F.col("event_type") == "click", "value"
    )
    return out.select(
        "cohort",
        _r("modified_sum").alias("modified_sum"),
        _r("unmodified_sum").alias("unmodified_sum"),
        _r("enrichment").alias("enrichment"),
    )


# --- X1 offline hypergeometric enrichment (the exact Fisher test
#     PantherDB runs server-side for analysis.py:336-384) --------------------


def _log_choose_sql(n: str, k: str) -> str:
    return (
        f"({_gammaln_sql(f'({n}) + 1.0')}"
        f" - {_gammaln_sql(f'({k}) + 1.0')}"
        f" - {_gammaln_sql(f'({n}) - ({k}) + 1.0')})"
    )


def _hypergeom_oracle() -> str:
    term_i = _log_choose_sql("k_background", "i")
    term_rest = _log_choose_sql(
        "n_background - k_background", "n_selected - i"
    )
    denom = _log_choose_sql("n_background", "n_selected")
    return f"""
WITH ann AS (
  SELECT DISTINCT p_partkey AS id, p_brand AS term FROM part
  WHERE p_partkey IS NOT NULL AND p_brand IS NOT NULL
),
sel AS (
  SELECT DISTINCT l_partkey AS id FROM lineitem
  WHERE l_returnflag = 'R' AND l_quantity >= 48
),
per AS (
  SELECT term, count(*) AS k_background, count(s.id) AS k_selected
  FROM ann a LEFT JOIN sel s USING (id) GROUP BY 1
),
sc AS (
  SELECT count(*) AS n_background, count(s.id) AS n_selected
  FROM (SELECT DISTINCT id FROM ann) i LEFT JOIN sel s USING (id)
),
rows_i AS (
  SELECT per.*, sc.n_background, sc.n_selected,
    unnest(generate_series(k_selected,
                           least(k_background, n_selected))) AS i
  FROM per, sc
),
tail AS (
  SELECT term, k_selected, n_selected, k_background, n_background,
    sum(exp({term_i} + {term_rest} - {denom}) ORDER BY i) AS p
  FROM rows_i GROUP BY 1, 2, 3, 4, 5
)
SELECT term, k_selected, n_selected, k_background, n_background,
  round(CASE WHEN n_selected > 0 AND k_background > 0
        THEN (CAST(k_selected AS DOUBLE) / CAST(n_selected AS DOUBLE))
             / (CAST(k_background AS DOUBLE)
                / CAST(n_background AS DOUBLE)) END, 6)
    AS fold_enrichment,
  round(least(1.0, greatest(0.0, p)), 6) AS p_value
FROM tail
"""


@_q("enrichment_hypergeom", _hypergeom_oracle())
def q_enrichment_hypergeom(spark, sf):
    """Exact one-sided hypergeometric enrichment of a hit list over an
    annotation table, entirely JVM-side (log-gamma tail fold); the
    oracle replays the identical Lanczos arithmetic and ascending
    summation order in SQL, so the P values are value-hash gated."""
    from padua_spark.operators.external import hypergeom_enrichment

    part = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem")
    ann = part.select(
        F.col("p_partkey").alias("id"), F.col("p_brand").alias("term")
    )
    hits = li.where(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 48)
    ).select(F.col("l_partkey").alias("id"))
    out = hypergeom_enrichment(hits, ann, "id", "term")
    return out.select(
        "term",
        "k_selected",
        "n_selected",
        "k_background",
        "n_background",
        _r("fold_enrichment").alias("fold_enrichment"),
        _r("p_value").alias("p_value"),
    )


# --- A6 sites_peptides_proteins (analysis.py:291-309) ------------------------


@_q(
    "summary_counts",
    r"""
SELECT count(CASE WHEN n_chars >= 300 THEN 1 END) AS sites,
       count(DISTINCT lang) AS peptides,
       count(DISTINCT regexp_extract(source, '^([^;\s_]+)', 1)) AS proteins
FROM documents
""",
)
def q_summary_counts(spark, sf):
    d = _t(spark, sf, "documents")
    return agg_ops.sites_peptides_proteins(
        d,
        locprob_col="n_chars",
        seqwindow_col="lang",
        proteins_col="source",
        site_localization_probability=300,
    )


# --- A7 value_counts (analysis.py:312-333) -----------------------------------


@_q(
    "value_counts",
    "SELECT l_returnflag, count(*) AS count FROM lineitem GROUP BY 1",
)
def q_value_counts(spark, sf):
    return agg_ops.value_counts(_t(spark, sf, "lineitem"), "l_returnflag")


# --- A8 quality_control counts (visualize.py:1625-1662) ----------------------


@_q(
    "quality_control_counts",
    """
SELECT count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS is_open_count,
       count(CASE WHEN o_orderpriority LIKE '1%' THEN 1 END)
         AS is_urgent_count,
       count(*) AS total_count
FROM orders
""",
)
def q_qc_counts(spark, sf):
    o = (
        _t(spark, sf, "orders")
        .withColumn(
            "is_open", F.when(F.col("o_orderstatus") == "O", F.lit("+"))
        )
        .withColumn(
            "is_urgent",
            F.when(F.col("o_orderpriority").startswith("1"), F.lit("+")),
        )
    )
    return agg_ops.quality_control_counts(o, ["is_open", "is_urgent"])


# --- A9 collapse technical replicates (workflow median) ----------------------


@_q(
    "collapse_replicates_median",
    """
SELECT l_partkey, round(median(l_quantity), 6) AS l_quantity
FROM lineitem GROUP BY 1
""",
)
def q_collapse_median(spark, sf):
    li = _t(spark, sf, "lineitem")
    out = agg_ops.collapse_technical_replicates(
        li, ["l_partkey"], "l_quantity", stat="median"
    )
    return out.select(
        "l_partkey", _r("l_quantity").alias("l_quantity")
    )


# --- A11/A12 histogram (visualize.py:1374-1385) ------------------------------


@_q(
    "histogram",
    """
SELECT CAST(least(floor((l_extendedprice - 0.0) / 5000.0), 39) AS INTEGER)
         AS bucket,
       count(*) AS count
FROM lineitem
WHERE l_extendedprice IS NOT NULL
  AND l_extendedprice >= 0 AND l_extendedprice <= 200000
GROUP BY 1
""",
)
def q_histogram(spark, sf):
    li = _t(spark, sf, "lineitem")
    return agg_ops.histogram(li, "l_extendedprice", 0.0, 200000.0, 40)


# --- A13 pairwise correlation (analysis.py:26-48) ----------------------------


@_q(
    "pairwise_correlation",
    """
SELECT a.l_linenumber AS sample_x, b.l_linenumber AS sample_y,
       round(corr(a.l_quantity, b.l_quantity), 6) AS pearson_r
FROM lineitem a JOIN lineitem b USING (l_orderkey)
GROUP BY 1, 2
""",
)
def q_pairwise_corr(spark, sf):
    li = _t(spark, sf, "lineitem")
    out = agg_ops.pairwise_correlation(
        li, "l_linenumber", ["l_orderkey"], "l_quantity"
    )
    return out.select(
        "sample_x", "sample_y", _r("pearson_r").alias("pearson_r")
    )


# --- I1 impute_gaussian (imputation.py:14-63; deterministic noise) -----------


_IMPUTE_NOISE = deterministic_gaussian_sql("event_id", 0)

_IMPUTE_ORACLE = f"""
WITH base AS (
  SELECT event_id, event_type,
         CASE WHEN value >= 50 THEN value END AS val
  FROM events
),
stats AS (
  SELECT event_type, avg(val) AS m, stddev_samp(val) AS s
  FROM base GROUP BY 1
)
SELECT b.event_id, (b.val IS NULL) AS imputed,
  round(COALESCE(b.val,
        stats.m + (-1.8) * stats.s
        + 0.3 * stats.s * ({_IMPUTE_NOISE})), 3) AS val
FROM base b LEFT JOIN stats USING (event_type)
"""


@_q("impute_gaussian", _IMPUTE_ORACLE)
def q_impute_gaussian(spark, sf):
    e = _t(spark, sf, "events").withColumn(
        "val", F.when(F.col("value") >= 50, F.col("value"))
    )
    out = imp.impute_gaussian(
        e, ["event_type"], "val", "event_id", width=0.3, downshift=-1.8,
        seed=0,
    )
    return out.select(
        "event_id", "imputed", F.round("val", 3).alias("val")
    )


# --- R1/melt unpivot (process.py:221-277 / long-model ingest) ----------------


@_q(
    "unpivot_long",
    """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
       l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
""",
)
def q_unpivot(spark, sf):
    li = _t(spark, sf, "lineitem")
    return proc.melt(
        li,
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        var_name="metric",
        value_name="value",
    )


# --- R2 pivot_wider (process.py:330-377) -------------------------------------


@_q(
    "pivot_group_means",
    """
SELECT l_partkey,
  round(avg(CASE WHEN l_returnflag='R' THEN l_quantity END), 6) AS avg_r,
  round(avg(CASE WHEN l_returnflag='A' THEN l_quantity END), 6) AS avg_a,
  round(avg(CASE WHEN l_returnflag='N' THEN l_quantity END), 6) AS avg_n
FROM lineitem GROUP BY 1
""",
)
def q_pivot(spark, sf):
    li = _t(spark, sf, "lineitem")
    out = proc.pivot_wider(
        li,
        ["l_partkey"],
        "l_returnflag",
        "l_quantity",
        agg=F.round(F.avg("l_quantity"), 6),
        pivot_values=["R", "A", "N"],
    )
    return out.select(
        "l_partkey",
        F.col("R").alias("avg_r"),
        F.col("A").alias("avg_a"),
        F.col("N").alias("avg_n"),
    )


# --- R3 transform (log2, ±inf→NULL; process.py:309-327) ----------------------


@_q(
    "log2_transform",
    """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount > 0 THEN round(log2(l_discount), 6) END AS val
FROM lineitem
""",
)
def q_log2_transform(spark, sf):
    li = _t(spark, sf, "lineitem")
    out = proc.transform_values(li, "l_discount", out_col="val")
    return out.select("l_orderkey", "l_linenumber", _r("val").alias("val"))


# --- J1 design join (process.py:23-111 — broadcast dim join + rollup) --------


@_q(
    "dim_join_rollup",
    """
SELECT r.r_name, count(*) AS n_customers,
       round(avg(c.c_acctbal), 6) AS avg_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1
""",
)
def q_dim_join(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        _r(F.avg("c_acctbal")).alias("avg_bal"),
    )


# --- J2 build_labels_from_regex (process.py:114-165) -------------------------


@_q(
    "label_regex_extract",
    r"""
SELECT doc_id,
       CAST(NULLIF(regexp_extract(source, 'src(\d+)', 1), '') AS INTEGER)
         AS src_num
FROM documents
""",
)
def q_label_regex(spark, sf):
    d = _t(spark, sf, "documents")
    out = proc.build_labels_from_regex(
        d, "source", [("src_num", r"src(\d+)")], types={"src_num": "int"}
    )
    return out.select("doc_id", "src_num")


# --- J4 venn set-overlap counts (visualize.py:979-1033) ----------------------


@_q(
    "venn_counts",
    """
WITH d AS (
  SELECT DISTINCT o_custkey AS key, o_orderstatus AS src FROM orders
),
m AS (
  SELECT key, string_agg(src, '&' ORDER BY src) AS members
  FROM d GROUP BY key
)
SELECT members, count(*) AS count FROM m GROUP BY members
""",
)
def q_venn(spark, sf):
    o = _t(spark, sf, "orders")
    sets = {
        s: o.filter(F.col("o_orderstatus") == s).select(
            F.col("o_custkey").alias("key")
        )
        for s in ["F", "O", "P"]
    }
    from padua_spark.operators.setops import venn_counts

    return venn_counts(sets, "key")


# --- O3 rank by intensity (visualize.py:1075-1129) ---------------------------


@_q(
    "rank_by_value",
    """
SELECT p_partkey,
       row_number() OVER (ORDER BY p_retailprice DESC, p_partkey) AS rank,
       round(CASE WHEN p_retailprice > 0
             THEN log10(p_retailprice) END, 6) AS log10_value
FROM part
""",
)
def q_rank(spark, sf):
    p = _t(spark, sf, "part")
    out = agg_ops.rank_intensity(
        p, ["p_partkey"], "p_retailprice", descending=True,
        tiebreak_cols=["p_partkey"],
    )
    return out.select(
        "p_partkey",
        F.col("rank").cast("bigint").alias("rank"),
        _r("log10_value").alias("log10_value"),
    )


# --- ext: exact dedup groups --------------------------------------------------


@_q(
    "dedup_exact_groups",
    """
SELECT lang, source, min(doc_id) AS canonical_id, count(*) AS group_size
FROM documents GROUP BY 1, 2
""",
)
def q_dedup_exact(spark, sf):
    d = _t(spark, sf, "documents")
    return x_dedup.dedup_groups(d, ["lang", "source"], "doc_id")


# --- ext: text quality features ------------------------------------------------


@_q(
    "token_quality",
    r"""
WITH t AS (
  SELECT doc_id, length(text) AS n_chars_actual,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
  FROM documents
)
SELECT doc_id, n_chars_actual,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        / CAST(len(toks) AS DOUBLE), 6) AS mean_token_len,
  round(CAST(len(list_filter(ltoks,
        x -> x IN ('the','a','and','of','to','in','is'))) AS DOUBLE)
        / CAST(len(ltoks) AS DOUBLE), 6) AS stopword_ratio
FROM t
""",
)
def q_token_quality(spark, sf):
    d = _t(spark, sf, "documents")
    out = x_text.quality_score(d, "text", ["doc_id"])
    return out.select(
        "doc_id",
        F.col("n_chars_actual").cast("bigint").alias("n_chars_actual"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        _r("mean_token_len").alias("mean_token_len"),
        _r("stopword_ratio").alias("stopword_ratio"),
    )


# --- ext: brute-force cosine top-k ANN -----------------------------------------


_ANN_EXACT_ORACLE = """
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT e.vec_id,
    list_dot_product(CAST(e.embedding AS DOUBLE[]),
                     CAST(q.embedding AS DOUBLE[]))
    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                             CAST(e.embedding AS DOUBLE[])))
       * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                               CAST(q.embedding AS DOUBLE[]))))
      AS cosine_sim
  FROM embeddings e, q
)
SELECT vec_id, round(cosine_sim, 6) AS cosine_sim
FROM s ORDER BY s.cosine_sim DESC, vec_id LIMIT 10
"""


@_q("ann_cosine_topk", _ANN_EXACT_ORACLE)
def q_ann_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    query = [float(x) for x in qrow[0][0]]
    out = x_sim.brute_force_topk(emb, "embedding", "vec_id", query, k=10)
    return out.select("vec_id", _r("cosine_sim").alias("cosine_sim"))


# --- ext: k-NN join — per-query top-k over a broadcast query batch
#     (WindowGroupLimit prunes map-side; corpus never shuffled by vector) ----


@_q(
    "knn_join",
    """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
),
c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id >= 5
),
s AS (
  SELECT q.query_id, c.vec_id,
    list_dot_product(c.cv, q.qv)
    / (sqrt(list_dot_product(c.cv, c.cv))
       * sqrt(list_dot_product(q.qv, q.qv))) AS cosine_sim
  FROM c, q
)
SELECT query_id, vec_id, round(cosine_sim, 6) AS cosine_sim
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id
  ) AS rn FROM s
) WHERE rn <= 5
""",
)
def q_knn_join(spark, sf):
    emb = _t(spark, sf, "embeddings")
    out = x_sim.knn_join(
        emb.filter(F.col("vec_id") >= 5), "vec_id", "embedding",
        emb.filter(F.col("vec_id") < 5), "vec_id", "embedding",
        k=5,
    )
    return out.select(
        "query_id", "vec_id", _r("cosine_sim").alias("cosine_sim")
    )


# --- ext: exact n-gram Jaccard within blocks ------------------------------------


_JACCARD_C1 = 1000000007 % 2147483647
_JACCARD_C2 = (1000000007**2) % 2147483647

@_q(
    "ngram_jaccard",
    rf"""
WITH t AS (
  SELECT lang, CAST(floor(n_chars / 50.0) AS INTEGER) AS len_bucket, doc_id,
    list_transform(string_split(text, ' '), w -> list_reduce(
        list_prepend(CAST(7 AS BIGINT),
          list_transform(list_filter(string_split(w, ''), c -> c <> ''), c -> CAST(ord(c) AS BIGINT))),
        (a, c) -> (a * 131 + c) % 2147483647)) AS th
  FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
s AS (
  SELECT lang, len_bucket, doc_id,
    list_distinct(list_transform(generate_series(1, len(th) - 2),
      i -> (th[i] * 1 + th[i+1] * {_JACCARD_C1}
            + th[i+2] * {_JACCARD_C2}) % 2147483647)) AS sh
  FROM t
)
SELECT a.lang, a.len_bucket, a.doc_id AS id_a, b.doc_id AS id_b,
  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6)
    AS jaccard
FROM s a JOIN s b
  ON a.lang = b.lang AND a.len_bucket = b.len_bucket
 AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh)) > 0
""",
)
def q_ngram_jaccard(spark, sf):
    # Blocking on (lang, length bucket) keeps the within-block quadratic
    # bounded — near-dups have near-equal lengths; cross-length pairs are
    # the LSH path's job (minhash_lsh_candidates).
    d = (
        _t(spark, sf, "documents")
        .filter(F.size(F.split(F.col("text"), " ")) >= 3)
        .withColumn(
            "len_bucket",
            F.floor(F.col("n_chars") / F.lit(50.0)).cast("int"),
        )
    )
    out = x_dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", ["lang", "len_bucket"], 3
    )
    return out.select(
        "lang", "len_bucket", "id_a", "id_b", _r("jaccard").alias("jaccard")
    )


# --- ext: MinHash LSH near-dup candidates — the full pipeline (token
#     hash → shingle hash → 32 minhash permutations → banded buckets →
#     candidate pairs → estimated Jaccard) mirrored in DuckDB ------------------


def _minhash_oracle(source: str = "documents") -> str:
    from padua_spark.extensions.dedup import MOD, _affine_constants

    consts = _affine_constants(32, seed=7)
    mins = ",\n    ".join(
        f"list_min(list_transform(sh, h -> (h * {a} + {b}) % {MOD}))"
        f" AS m{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, concat_ws(',', '{b}', "
        + ", ".join(f"m{b * 4 + j}" for j in range(4))
        + ") AS key FROM sig"
        for b in range(8)
    )
    eq_terms = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)"
        for i in range(32)
    )
    return rf"""
WITH t AS (
  SELECT doc_id,
    list_transform(string_split(text, ' '), w -> list_reduce(
        list_prepend(CAST(7 AS BIGINT),
          list_transform(list_filter(string_split(w, ''), c -> c <> ''), c -> CAST(ord(c) AS BIGINT))),
        (a, c) -> (a * 131 + c) % {MOD})) AS th
  FROM {source}
),
s AS (
  SELECT doc_id,
    CASE WHEN len(th) >= 3 THEN
      list_distinct(list_transform(generate_series(1, len(th) - 2),
        i -> (th[i] * 1 + th[i+1] * {_JACCARD_C1}
              + th[i+2] * {_JACCARD_C2}) % {MOD}))
    ELSE [th[1]] END AS sh
  FROM t
),
sig AS (
  SELECT doc_id,
    {mins}
  FROM s
),
bands AS (
{band_rows}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.key = b.key AND a.doc_id < b.doc_id
)
SELECT p.id_a, p.id_b,
  round(({eq_terms}) / 32.0, 6) AS est_jaccard
FROM pairs p
JOIN sig sa ON sa.doc_id = p.id_a
JOIN sig sb ON sb.doc_id = p.id_b
"""


@_q("minhash_lsh_candidates", _minhash_oracle())
def q_minhash(spark, sf):
    d = _t(spark, sf, "documents")
    out = x_dedup.minhash_lsh_candidates(
        d, "doc_id", "text", k_shingle=3, num_hashes=32, bands=8,
        portable_keys=True,
    )
    return out.select("id_a", "id_b", _r("est_jaccard").alias("est_jaccard"))


# --- streaming twin: tumbling event-time window agg (batch/stream same plan) -


@_q(
    "event_window_agg",
    """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS tsu, value FROM events
)
SELECT (tsu // 3600000000) * 3600 AS window_start_epoch,
       event_type,
       count(*) AS n_events,
       round(avg(value), 6) AS avg_value
FROM e GROUP BY 1, 2
""",
)
def q_event_window(spark, sf):
    from padua_spark.streaming import tumbling_window_agg

    e = _t(spark, sf, "events")
    out = tumbling_window_agg(
        e,
        _events_event_time(spark, sf),
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            _r(F.avg("value")).alias("avg_value"),
        ],
        window_duration="1 hour",
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "event_type",
        "n_events",
        "avg_value",
    )


# --- streaming twin: sessionization (lag + running sum; the batch oracle
#     of session_window_agg) ---------------------------------------------------


@_q(
    "sessionize",
    """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events
),
s AS (
  SELECT user_id, event_id, tsu,
    CASE WHEN lag(tsu) OVER w IS NULL
              OR tsu - lag(tsu) OVER w > 1800000000
         THEN 1 ELSE 0 END AS news
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
),
t AS (
  SELECT user_id, tsu,
    CAST(sum(news) OVER (PARTITION BY user_id ORDER BY tsu, event_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM s
)
SELECT user_id, session_idx, count(*) AS n_events,
       min(tsu) AS session_start,
       max(tsu) AS session_end,
       max(tsu) - min(tsu) AS duration
FROM t GROUP BY 1, 2
""",
)
def q_sessionize(spark, sf):
    from padua_spark.streaming import sessionize_batch

    e = _t(spark, sf, "events").select(
        "user_id",
        "event_id",
        _events_ts_us(spark, sf).alias("tsu"),
    )
    return sessionize_batch(
        e, ["user_id"], "tsu", gap=1_800_000_000,
        tiebreak_cols=["event_id"],
    )


# --- ext: language ID (stopword-profile argmax) -------------------------------

_LANGID_ORACLE = r"""
WITH t AS (
  SELECT doc_id, lang,
         regexp_split_to_array(lower(trim(text)), '\s+') AS lt
  FROM documents
),
s AS (
  SELECT doc_id, lang,
    len(list_filter(lt, x -> x IN ('der','die','das','und','ein','ist','von')))
      AS score_de,
    len(list_filter(lt, x -> x IN ('the','a','and','of','to','in','is')))
      AS score_en,
    len(list_filter(lt, x -> x IN ('el','la','y','de','un','una','es')))
      AS score_es,
    len(list_filter(lt, x -> x IN ('le','la','et','de','un','une','est')))
      AS score_fr,
    len(list_filter(lt, x -> ord(x) BETWEEN 19968 AND 40959))
      AS score_zh
  FROM t
)
SELECT doc_id, lang, score_de, score_en, score_es, score_fr, score_zh,
  CASE WHEN greatest(score_de, score_en, score_es, score_fr, score_zh) > 0
  THEN
    CASE
      WHEN score_de = greatest(score_de, score_en, score_es, score_fr,
                               score_zh) THEN 'de'
      WHEN score_en = greatest(score_de, score_en, score_es, score_fr,
                               score_zh) THEN 'en'
      WHEN score_es = greatest(score_de, score_en, score_es, score_fr,
                               score_zh) THEN 'es'
      WHEN score_fr = greatest(score_de, score_en, score_es, score_fr,
                               score_zh) THEN 'fr'
      WHEN score_zh = greatest(score_de, score_en, score_es, score_fr,
                               score_zh) THEN 'zh'
    END
  END AS predicted_lang
FROM s
"""


@_q("language_id", _LANGID_ORACLE)
def q_language_id(spark, sf):
    d = _t(spark, sf, "documents")
    out = x_text.language_id(d, "text", ["doc_id", "lang"])
    return out.select(
        "doc_id",
        "lang",
        F.col("score_de").cast("bigint").alias("score_de"),
        F.col("score_en").cast("bigint").alias("score_en"),
        F.col("score_es").cast("bigint").alias("score_es"),
        F.col("score_fr").cast("bigint").alias("score_fr"),
        F.col("score_zh").cast("bigint").alias("score_zh"),
        "predicted_lang",
    )


# --- ext: document fingerprint (portable polynomial rolling hash) -------------


@_q(
    "fingerprint",
    r"""
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(
        list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ''), c -> c <> ''),
        c -> CAST(ord(c) AS BIGINT))),
    (acc, c) -> (acc * 131 + c) % 2147483647) AS fp
FROM documents
""",
)
def q_fingerprint(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id", x_text.fingerprint(F.col("text")).alias("fp")
    )


# --- ext: exact dedup, kept-rows form -----------------------------------------


@_q(
    "dedup_exact_rows",
    """
SELECT d.doc_id
FROM documents d
JOIN (
  SELECT lang, source, min(doc_id) AS doc_id
  FROM documents GROUP BY 1, 2
) k ON d.lang = k.lang AND d.source = k.source AND d.doc_id = k.doc_id
""",
)
def q_dedup_exact_rows(spark, sf):
    d = _t(spark, sf, "documents")
    return x_dedup.exact_dedup(d, ["lang", "source"], "doc_id").select(
        "doc_id"
    )


# --- M1 PCA distributed Gram matrix (the SQL-expressible core of pca();
#     eigendecomposition itself is rows-only via pca_scores) ------------------


@_q(
    "pca_gram",
    """
WITH long AS (
  SELECT l_partkey AS f, l_returnflag AS s, avg(l_quantity) AS v
  FROM lineitem GROUP BY 1, 2
),
m AS (SELECT f, avg(v) AS mv FROM long GROUP BY 1),
c AS (
  SELECT long.f, long.s, long.v - m.mv AS cv
  FROM long JOIN m USING (f)
)
SELECT a.s AS sample_x, b.s AS sample_y,
       round(sum(a.cv * b.cv), 6) AS xy
FROM c a JOIN c b USING (f) GROUP BY 1, 2
""",
)
def q_pca_gram(spark, sf):
    from padua_spark.operators.ml import _sample_cross_products

    li = _t(spark, sf, "lineitem")
    long = li.groupBy("l_partkey", "l_returnflag").agg(
        F.avg("l_quantity").alias("v")
    )
    means = long.groupBy("l_partkey").agg(F.avg("v").alias("_m"))
    centered = long.join(means, on="l_partkey").withColumn(
        "cv", F.col("v") - F.col("_m")
    )
    gram = _sample_cross_products(
        centered, ["l_partkey"], "l_returnflag", "cv"
    )
    return gram.select("sample_x", "sample_y", _r("xy").alias("xy"))


# --- M1 PCA scores — hash-gated via the Gram reconstruction invariant -------


@_q(
    "pca_scores",
    """
WITH long AS (
  SELECT l_partkey AS f, l_returnflag AS s, avg(l_quantity) AS v
  FROM lineitem GROUP BY 1, 2
),
m AS (SELECT f, avg(v) AS mv FROM long GROUP BY 1),
c AS (
  SELECT long.f, long.s, long.v - m.mv AS cv
  FROM long JOIN m USING (f)
)
SELECT a.s AS sample_x, b.s AS sample_y,
       round(sum(a.cv * b.cv), 6) AS xy
FROM c a JOIN c b USING (f) GROUP BY 1, 2
""",
)
def q_pca_scores(spark, sf):
    """Hash gate for the PCA eigendecomposition (analysis.py:51-93):
    at k = n_samples the scores matrix U·S satisfies
    (U·S)(U·S)ᵀ = G exactly, so Σ_pc score_x·score_y must reproduce
    every entry of the centered Gram — the oracle is the same SQL the
    (independently green) ``pca_gram`` gate runs. Any eigenvalue or
    eigenvector error in ``ml.pca`` propagates into the sum, making
    the eigendecomposition itself value-hash-checkable; the scores are
    additionally sign-canonicalized in ml.pca (largest-|entry|
    coordinate positive per PC) so their raw values are deterministic
    across LAPACK builds."""
    from padua_spark.operators import ml

    li = _t(spark, sf, "lineitem")
    long = li.groupBy("l_partkey", "l_returnflag").agg(
        F.avg("l_quantity").alias("v")
    )
    # k = 16 clamps to n_samples inside pca() — full-rank scores
    scores, _w, _evr = ml.pca(
        long, ["l_partkey"], "l_returnflag", "v", n_components=16
    )
    # The distributed work is the Gram inside pca(); the n²·k
    # reconstruction over the collected scores (9 rows here) is driver
    # arithmetic — running it through a Spark self-join would only add
    # scheduler round-trips.
    rows = scores.collect()
    acc: dict = {}
    for ra in rows:
        for rb in rows:
            if ra["pc"] == rb["pc"]:
                key = (ra["l_returnflag"], rb["l_returnflag"])
                acc[key] = acc.get(key, 0.0) + ra["score"] * rb["score"]
    return spark.createDataFrame(
        [(x, y, round(v, 6)) for (x, y), v in sorted(acc.items())],
        ["sample_x", "sample_y", "xy"],
    )


# --- ext: LSH-bucketed approximate top-k. The oracle mirrors the exact
#     plane constants, the sequential summation order of the Spark-side
#     dot products, and the bucket bit chain — so even the sign of a
#     near-zero plane projection agrees bit-for-bit. ---------------------------

_ANN_DIM, _ANN_PLANES = 64, 4


def _ann_lsh_oracle() -> str:
    from padua_spark.functions.scalar import _IH_M

    def dot_chain(left: str, right: str) -> str:
        return "0.0 + " + " + ".join(
            f"{left}[{i}] * {right}[{i}]" for i in range(1, _ANN_DIM + 1)
        )

    def plane_chain(vec: str, p: int) -> str:
        terms = []
        for d in range(_ANN_DIM):
            h = ((p * _ANN_DIM + d + 1) * 2654435761 + 1013904223) % _IH_M
            terms.append(f"{vec}[{d + 1}] * {h / _IH_M - 0.5!r}")
        return "0.0 + " + " + ".join(terms)

    def bucket_expr(vec: str) -> str:
        bits = [
            f"(CASE WHEN ({plane_chain(vec, p)}) >= 0 THEN 1 ELSE 0 END)"
            for p in range(_ANN_PLANES)
        ]
        expr = "0"
        for b in bits:
            expr = f"(({expr}) * 2 + {b})"
        return expr

    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS (SELECT v FROM e WHERE vec_id = 0),
b AS (
  SELECT e.vec_id, e.v, q.v AS qv,
         {bucket_expr('e.v')} AS bucket,
         {bucket_expr('q.v')} AS qbucket
  FROM e, q
),
c AS (
  SELECT vec_id,
    ({dot_chain('v', 'qv')})
      / (sqrt({dot_chain('v', 'v')}) * sqrt({dot_chain('qv', 'qv')}))
      AS cosine_sim
  FROM b WHERE bucket = qbucket
)
SELECT vec_id, round(cosine_sim, 6) AS cosine_sim
FROM c ORDER BY c.cosine_sim DESC, vec_id LIMIT 10
"""


@_q("ann_lsh_topk", _ann_lsh_oracle())
def q_ann_lsh_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    query = [float(x) for x in qrow[0][0]]
    out = x_sim.lsh_topk(
        emb, "embedding", "vec_id", query, k=10, n_planes=_ANN_PLANES
    )
    return out.select("vec_id", _r("cosine_sim").alias("cosine_sim"))


# --- ext: multimodal plumbing — binary column → Arrow-batched mapInPandas
#     feature extraction (decode stubbed; byte plumbing real) ------------------


@_q(
    "multimodal_features",
    """
SELECT CAST(doc_id AS BIGINT) AS media_id,
  CAST(strlen(text) AS BIGINT) AS n_bytes,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(list_filter(string_split(text, ''), c -> c <> ''), c -> CAST(ord(c) AS BIGINT))),
    (acc, c) -> (acc * 131 + c) % 2147483647) AS byte_hash
FROM documents
""",
)
def q_multimodal_features(spark, sf):
    from padua_spark.extensions.multimodal import (
        extract_features,
        text_as_media,
    )

    d = _t(spark, sf, "documents")
    media = text_as_media(d, "doc_id", "text")
    out = extract_features(media)
    return out.select("media_id", "n_bytes", "byte_hash")


# --- A2 combine_expression_columns (process.py:198-218) ----------------------


@_q(
    "combine_columns_mean",
    """
WITH m AS (
  SELECT l_orderkey,
         CASE WHEN l_linenumber IN (1, 2) THEN 'first_two'
              ELSE CAST(l_linenumber AS STRING) END AS merged,
         l_quantity
  FROM lineitem
)
SELECT l_orderkey, merged AS sample_label,
       round(avg(l_quantity), 6) AS l_quantity
FROM m GROUP BY 1, 2
""",
)
def q_combine_columns(spark, sf):
    li = _t(spark, sf, "lineitem")
    merged = F.when(
        F.col("l_linenumber").isin(1, 2), F.lit("first_two")
    ).otherwise(F.col("l_linenumber").cast("string"))
    out = proc.combine_expression_columns(
        li, ["l_orderkey"], "l_quantity", merged
    )
    return out.select(
        "l_orderkey", "sample_label", _r("l_quantity").alias("l_quantity")
    )


# --- J3 apply_experimental_design (process.py:280-306) ------------------------


@_q(
    "apply_design_template",
    """
SELECT event_id,
  CASE event_type WHEN 'click' THEN 'tap'
                  WHEN 'view' THEN 'impression'
                  ELSE event_type END AS event_type
FROM events
""",
)
def q_apply_template(spark, sf):
    e = _t(spark, sf, "events")
    template = spark.createDataFrame(
        [("click", "tap"), ("view", "impression")],
        ["Experiment", "Name"],
    )
    out = proc.apply_experimental_design(
        e, template, label_col="event_type"
    )
    return out.select("event_id", "event_type")


# --- P7 strip_index_labels (process.py:178-195) -------------------------------


@_q(
    "strip_labels",
    """
SELECT doc_id, regexp_replace(source, 'src', '') AS source
FROM documents
""",
)
def q_strip_labels(spark, sf):
    d = _t(spark, sf, "documents")
    return proc.strip_index_labels(d, "source", "src").select(
        "doc_id", "source"
    )


# --- U1-U4 protein-ID string functions (utils.py:108-176) ---------------------


@_q(
    "protein_id_functions",
    r"""
WITH t AS (
  SELECT doc_id, concat(source, ';', lang, '_x ', 'tail') AS ids
  FROM documents
)
SELECT doc_id,
  regexp_extract(ids, '^([^;\s_]+)', 1) AS first_id,
  string_split(ids, ';')[1] AS short_str,
  CAST(len(string_split(ids, ';')) AS BIGINT) AS n_ids
FROM t
""",
)
def q_protein_ids(spark, sf):
    from padua_spark.functions.scalar import protein_id, shortstr

    d = _t(spark, sf, "documents").withColumn(
        "ids",
        F.concat(
            F.col("source"), F.lit(";"), F.col("lang"), F.lit("_x tail")
        ),
    )
    return d.select(
        "doc_id",
        protein_id("ids").alias("first_id"),
        shortstr("ids").alias("short_str"),
        F.size(F.split(F.col("ids"), ";")).cast("bigint").alias("n_ids"),
    )


# --- §2.12 union-as-concat (pd.concat → unionByName) --------------------------


@_q(
    "union_all_counts",
    """
WITH u AS (
  SELECT event_id, 'clicks' AS src FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT event_id, 'errors' AS src FROM events WHERE event_type = 'error'
)
SELECT src, count(*) AS count FROM u GROUP BY 1
""",
)
def q_union_all(spark, sf):
    from padua_spark.operators.setops import union_all

    e = _t(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", F.lit("clicks").alias("src")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", F.lit("errors").alias("src")
    )
    return (
        union_all([clicks, errors])
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("count"))
    )


# --- O2/O3 top-k with rank ----------------------------------------------------


@_q(
    "topk_orders",
    """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
""",
)
def q_topk(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
        .select("o_orderkey", "o_totalprice")
    )


# --- T8 linregress closed form (visualize.py:407) -----------------------------


@_q(
    "linregress",
    """
WITH g AS (
  SELECT l_returnflag,
         count(*) AS n,
         avg(l_quantity) AS mx, avg(l_extendedprice) AS my,
         covar_samp(l_quantity, l_extendedprice) AS cov,
         var_samp(l_quantity) AS vx,
         corr(l_quantity, l_extendedprice) AS r
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n, round(r, 6) AS r,
       round(cov / vx, 6) AS slope,
       round(my - (cov / vx) * mx, 6) AS intercept
FROM g
""",
)
def q_linregress(spark, sf):
    li = _t(spark, sf, "lineitem")
    out = st.linregress(
        li, "l_quantity", "l_extendedprice", ["l_returnflag"]
    )
    return out.select(
        "l_returnflag",
        "n",
        _r("r").alias("r"),
        _r("slope").alias("slope"),
        _r("intercept").alias("intercept"),
    )


# --- T7 covariance ellipse stats (visualize.py:60-113) ------------------------


@_q(
    "covariance_ellipse",
    """
SELECT l_returnflag,
  round(avg(l_quantity), 6) AS mean_x,
  round(avg(l_discount), 6) AS mean_y,
  round(var_samp(l_quantity), 6) AS var_x,
  round(var_samp(l_discount), 6) AS var_y,
  round(covar_samp(l_quantity, l_discount), 6) AS cov_xy
FROM lineitem GROUP BY 1
""",
)
def q_cov_ellipse(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _r(F.avg("l_quantity")).alias("mean_x"),
        _r(F.avg("l_discount")).alias("mean_y"),
        _r(F.var_samp("l_quantity")).alias("var_x"),
        _r(F.var_samp("l_discount")).alias("var_y"),
        _r(F.covar_samp("l_quantity", "l_discount")).alias("cov_xy"),
    )


# --- A3 non_zero_sum (analysis.py:221-229) ------------------------------------


@_q(
    "nonzero_sum",
    """
SELECT l_returnflag,
       round(sum(CASE WHEN l_discount > 0 THEN l_discount END), 6)
         AS nonzero_sum
FROM lineitem GROUP BY 1
""",
)
def q_nonzero_sum(spark, sf):
    li = _t(spark, sf, "lineitem")
    out = agg_ops.non_zero_sum(li, ["l_returnflag"], "l_discount")
    return out.select(
        "l_returnflag", _r("nonzero_sum").alias("nonzero_sum")
    )


# --- A11 localization class binning (visualize.py:756-777) --------------------


@_q(
    "localization_classes",
    """
SELECT CASE WHEN value / 500.0 > 0.75 THEN 'Class I'
            WHEN value / 500.0 > 0.5  THEN 'Class II'
            WHEN value / 500.0 > 0.25 THEN 'Class III'
            ELSE 'Unclassified' END AS loc_class,
       count(*) AS count
FROM events GROUP BY 1
""",
)
def q_loc_classes(spark, sf):
    e = _t(spark, sf, "events").withColumn(
        "prob", F.col("value") / F.lit(500.0)
    )
    return agg_ops.localization_class_counts(e, "prob")


# --- U10 find_nearest (utils.py:320-330) --------------------------------------


@_q(
    "find_nearest",
    """
SELECT min_by(o_orderkey, abs(o_totalprice - 150000.0)) AS nearest_key,
       round(min(abs(o_totalprice - 150000.0)), 6) AS abs_diff
FROM orders
""",
)
def q_find_nearest(spark, sf):
    o = _t(spark, sf, "orders")
    out = agg_ops.find_nearest(o, "o_totalprice", 150000.0, "o_orderkey")
    return out.select(
        "nearest_key", _r("abs_diff").alias("abs_diff")
    )


# --- ext: SimHash signatures + Hamming near-dup candidates --------------------

_SIMHASH_TH_SQL = r"""
    list_transform(string_split(text, ' '), w -> list_reduce(
        list_prepend(CAST(7 AS BIGINT),
          list_transform(list_filter(string_split(w, ''), c -> c <> ''), c -> CAST(ord(c) AS BIGINT))),
        (a, c) -> (a * 131 + c) % 2147483647))
"""

_SIMHASH_BITS_SQL = " + ".join(
    f"(CASE WHEN 2 * len(list_filter(th, h -> (h & {1 << b}) <> 0))"
    f" >= len(th) THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
    for b in range(32)
)

_SIMHASH_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, {_SIMHASH_TH_SQL} AS th FROM documents
),
s AS (
  SELECT doc_id, lang, {_SIMHASH_BITS_SQL} AS simhash FROM t
)
SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
"""


@_q("simhash_candidates", _SIMHASH_ORACLE)
def q_simhash(spark, sf):
    d = _t(spark, sf, "documents")
    out = x_dedup.simhash_candidates(
        d, "doc_id", "text", ["lang"], max_hamming=6, n_bits=32
    )
    return out.select(
        "lang", "id_a", "id_b",
        F.col("hamming").cast("bigint").alias("hamming"),
    )


# --- ext: embedding-cosine near-dup pairs -------------------------------------


@_q(
    "embedding_near_dup",
    """
WITH s AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
)
SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
         AS cosine_sim
FROM s a JOIN s b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.35
""",
)
def q_embedding_near_dup(spark, sf):
    emb = _t(spark, sf, "embeddings")
    out = x_sim.cosine_near_dup_pairs(
        emb, "vec_id", "embedding", ["label"], threshold=0.35
    )
    return out.select(
        "label", "id_a", "id_b", _r("cosine_sim").alias("cosine_sim")
    )


# --- ext: as-of join (latest prior purchase per user; DuckDB ASOF oracle) ----


@_q(
    "asof_join",
    """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS tsu, event_type, value
  FROM events
),
p AS (
  SELECT user_id, tsu, max(value) AS purchase_value
  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT e.event_id, e.tsu, p.tsu AS asof_ts,
       round(p.purchase_value, 6) AS purchase_value
FROM e ASOF LEFT JOIN p
  ON e.user_id = p.user_id AND e.tsu >= p.tsu
""",
)
def q_asof_join(spark, sf):
    from padua_spark.operators.temporal import asof_join

    e = _t(spark, sf, "events").select(
        "event_id", "user_id", _events_ts_us(spark, sf).alias("tsu"),
        "event_type", "value",
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "tsu")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(
        e, purchases, on="tsu", by=["user_id"],
        right_value_cols=["purchase_value"],
    )
    return out.select(
        "event_id", "tsu", "asof_ts",
        _r("purchase_value").alias("purchase_value"),
    )


# --- ext: range join (points into intervals) ----------------------------------


@_q(
    "range_join",
    """
WITH e AS (
  SELECT event_id, epoch_us(ts) % 86400000000 AS day_us FROM events
),
iv AS (
  SELECT i AS hour_id, i * 3600000000 AS start_us,
         (i + 1) * 3600000000 AS end_us
  FROM generate_series(0, 23) t(i)
)
SELECT e.event_id, iv.hour_id
FROM e JOIN iv ON e.day_us >= iv.start_us AND e.day_us < iv.end_us
""",
)
def q_range_join(spark, sf):
    from padua_spark.operators.temporal import range_join

    e = _t(spark, sf, "events").select(
        "event_id",
        (_events_ts_us(spark, sf) % F.lit(86400000000)).alias("day_us"),
    )
    iv = spark.range(24).select(
        F.col("id").cast("bigint").alias("hour_id"),
        (F.col("id") * 3600000000).cast("bigint").alias("start_us"),
        ((F.col("id") + 1) * 3600000000).cast("bigint").alias("end_us"),
    )
    out = range_join(e, iv, "day_us", "start_us", "end_us")
    return out.select("event_id", "hour_id")


# --- ext: hierarchical time rollup (hour → day reuses the hour level —
#     the hypertable/continuous-aggregate pattern) ----------------------------


@_q(
    "time_rollup",
    """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS tsu, value FROM events
),
hourly AS (
  SELECT event_type, (tsu // 3600000000) AS hour_id,
         count(*) AS n, sum(value) AS total
  FROM e GROUP BY 1, 2
),
daily AS (
  SELECT event_type, (hour_id // 24) AS day_id,
         CAST(sum(n) AS BIGINT) AS n, sum(total) AS total
  FROM hourly GROUP BY 1, 2
)
SELECT 'hour' AS grain, event_type, hour_id AS bucket_id, n,
       round(total, 4) AS total FROM hourly
UNION ALL
SELECT 'day', event_type, day_id, n, round(total, 4) FROM daily
""",
)
def q_time_rollup(spark, sf):
    e = _t(spark, sf, "events").select(
        "event_type",
        _events_ts_us(spark, sf).alias("tsu"),
        "value",
    )
    hourly = (
        e.withColumn("hour_id", F.expr("tsu DIV 3600000000"))
        .groupBy("event_type", "hour_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    # The day grain aggregates the HOUR rollup, not the raw events —
    # each coarser grain costs only the finer grain's cardinality
    # (continuous-aggregate pattern; at 100 TB the raw table is read
    # once for the finest grain only).
    daily = (
        hourly.withColumn("day_id", F.expr("hour_id DIV 24"))
        .groupBy("event_type", "day_id")
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
    )
    h = hourly.select(
        F.lit("hour").alias("grain"), "event_type",
        F.col("hour_id").alias("bucket_id"), "n",
        F.round("total", 4).alias("total"),
    )
    d = daily.select(
        F.lit("day").alias("grain"), "event_type",
        F.col("day_id").alias("bucket_id"), "n",
        F.round("total", 4).alias("total"),
    )
    return h.unionByName(d)


# --- grouping sets / cube (Catalyst built-in; SURVEY §2.5 note) ---------------


@_q(
    "cube_aggregate",
    """
SELECT l_returnflag, l_linestatus,
       count(*) AS n, round(sum(l_quantity), 4) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("qty"),
    )


# --- ext: IVF approximate nearest neighbor (scale path next to LSH) ----------


_IVF_TOPK_ORACLE = """
WITH seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cell,
         CAST(embedding AS DOUBLE[]) AS c
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
      WHERE vec_id = 0),
probes AS (
  SELECT s.cell FROM seeds s CROSS JOIN q
  ORDER BY list_dot_product(s.c, q.qv)
           / (sqrt(list_dot_product(s.c, s.c))
              * sqrt(list_dot_product(q.qv, q.qv))) DESC, s.cell
  LIMIT 4
),
assigned AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, s.cell,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), s.c)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(s.c, s.c))) AS cos
  FROM embeddings e CROSS JOIN seeds s
  QUALIFY row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY cos DESC, s.cell ASC) = 1
)
SELECT a.vec_id,
  round(list_dot_product(a.v, q.qv)
        / (sqrt(list_dot_product(a.v, a.v))
           * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine_sim
FROM assigned a JOIN probes p ON a.cell = p.cell CROSS JOIN q
ORDER BY list_dot_product(a.v, q.qv)
         / (sqrt(list_dot_product(a.v, a.v))
            * sqrt(list_dot_product(q.qv, q.qv))) DESC, a.vec_id
LIMIT 10
"""


@_q("ivf_topk", _IVF_TOPK_ORACLE)
def q_ivf_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    query = [float(x) for x in qrow[0][0]]
    out = x_sim.ivf_topk(
        emb, "embedding", "vec_id", query, k=10, n_cells=16, nprobe=4
    )
    return out.select("vec_id", _r("cosine_sim").alias("cosine_sim"))


# --- ext: BPE-ish pretokenizer token counting ---------------------------------


def _bpe_oracle() -> str:
    pat = __import__(
        "padua_spark.extensions.text", fromlist=["BPE_PATTERN"]
    ).BPE_PATTERN.replace("'", "''")
    # coalesce mirrors the Spark side's NULL-text -> 0 (len over a NULL
    # list is NULL in DuckDB)
    return f"""
SELECT doc_id,
       len(string_split(trim(text), ' ')) AS n_ws,
       coalesce(len(regexp_extract_all(text, '{pat}')), 0) AS n_bpe
FROM documents
"""


@_q("bpe_token_count", _bpe_oracle())
def q_bpe_token_count(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " "))
        .cast("long").alias("n_ws"),
        x_text.bpe_token_count(F.col("text")).alias("n_bpe"),
    )


# --- M4 z-score compute core (visualize.py:1696-1699, median-centered) --------


@_q(
    "zscore_median",
    """
WITH s AS (
  SELECT l_returnflag, median(l_quantity) AS c,
         stddev_samp(l_quantity) AS sd
  FROM lineitem GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber,
       round(CASE WHEN sd > 0 THEN (l.l_quantity - c) / sd END, 6) AS z
FROM lineitem l JOIN s USING (l_returnflag)
""",
)
def q_zscore_median(spark, sf):
    from padua_spark.operators.ml import zscore

    li = _t(spark, sf, "lineitem")
    out = zscore(li, ["l_returnflag"], "l_quantity", center="median")
    return out.select("l_orderkey", "l_linenumber", _r("z").alias("z"))


# --- R1 expand_side_table (process.py:221-277) --------------------------------


@_q(
    "expand_side_table",
    """
SELECT l_orderkey, l_linenumber, 1 AS multiplicity,
       l_quantity * 1 AS m FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 2, l_quantity * 2 FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 3, l_quantity * 3 FROM lineitem
""",
)
def q_expand_side_table(spark, sf):
    li = _t(spark, sf, "lineitem")
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") * 1).alias("m___1"),
        (F.col("l_quantity") * 2).alias("m___2"),
        (F.col("l_quantity") * 3).alias("m___3"),
    )
    return proc.expand_side_table(
        wide,
        ["l_orderkey", "l_linenumber"],
        {"m": ["m___1", "m___2", "m___3"]},
    )


# --- U9 chunks → ntile (utils.py:259-279) -------------------------------------


@_q(
    "chunks_ntile",
    """
WITH c AS (
  SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1
)
SELECT o_custkey, n, ntile(7) OVER (ORDER BY o_custkey) AS chunk
FROM c
""",
)
def q_chunks_ntile(spark, sf):
    from padua_spark.functions.scalar import chunks_ntile

    o = _t(spark, sf, "orders")
    c = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    return c.select(
        "o_custkey", "n",
        chunks_ntile("o_custkey", 7).cast("long").alias("chunk")
    )


# --- S5 phosphopath-ratio compute core (io.py:129-185) ------------------------


@_q(
    "phosphopath_ratio",
    """
WITH pf AS (
  SELECT l_partkey, l_linenumber,
         avg(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS ctrl,
         avg(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS m_r,
         avg(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS m_a
  FROM lineitem GROUP BY 1, 2
),
tp AS (
  SELECT l_linenumber,
         dense_rank() OVER (ORDER BY l_linenumber) AS ord
  FROM (SELECT DISTINCT l_linenumber FROM lineitem)
)
SELECT concat(CAST(pf.l_partkey AS VARCHAR), '_',
              CAST(tp.ord AS VARCHAR)) AS ID,
       round(CASE WHEN ctrl <> 0 THEN m_r / ctrl END, 6) AS Ratio,
       'R' AS comparison
FROM pf JOIN tp USING (l_linenumber)
UNION ALL
SELECT concat(CAST(pf.l_partkey AS VARCHAR), '_',
              CAST(tp.ord AS VARCHAR)),
       round(CASE WHEN ctrl <> 0 THEN m_a / ctrl END, 6), 'A'
FROM pf JOIN tp USING (l_linenumber)
""",
)
def q_phosphopath_ratio(spark, sf):
    from padua_spark.sources.phosphopath import phosphopath_ratio_rows

    li = _t(spark, sf, "lineitem")
    out = phosphopath_ratio_rows(
        li,
        feature_id_col="l_partkey",
        group_col="l_returnflag",
        timepoint_col="l_linenumber",
        value_col="l_quantity",
        control_group="N",
        comparison_groups=["R", "A"],
    )
    return out.select("ID", _r("Ratio").alias("Ratio"), "comparison")


# --- T5 s0-curve significance classification (utils.py:282-317) --------------


@_q(
    "s0_classify",
    """
WITH g AS (
  SELECT l_partkey,
         avg(CASE WHEN l_returnflag = 'R'
                  THEN log2(l_extendedprice) END) AS mean_a,
         avg(CASE WHEN l_returnflag = 'A'
                  THEN log2(l_extendedprice) END) AS mean_b,
         avg(CASE WHEN l_returnflag = 'R'
                  THEN l_quantity END) AS q_a,
         avg(CASE WHEN l_returnflag = 'A'
                  THEN l_quantity END) AS q_b
  FROM lineitem GROUP BY 1
),
s AS (
  SELECT l_partkey, mean_a - mean_b AS log2_fc,
         power(10.0, -abs(q_a - q_b)) AS p_surrogate
  FROM g
)
SELECT l_partkey, round(log2_fc, 6) AS log2_fc,
  round(p_surrogate, 9) AS p_surrogate,
  (abs(log2_fc) > 0.1 AND p_surrogate IS NOT NULL AND p_surrogate <=
     power(10.0, -0.585 / (abs(log2_fc) - 0.1) + log10(0.05)))
    AS significant
FROM s
""",
)
def q_s0_classify(spark, sf):
    """T5 standalone: the s0 SAM-curve predicate over a SQL-expressible
    surrogate p (the real volcano uses incomplete-beta p-values, which
    are oracle-checked rows-only via volcano_pvalues)."""
    li = _t(spark, sf, "lineitem")
    g = li.groupBy("l_partkey").agg(
        F.avg(
            F.when(F.col("l_returnflag") == "R", F.log2("l_extendedprice"))
        ).alias("mean_a"),
        F.avg(
            F.when(F.col("l_returnflag") == "A", F.log2("l_extendedprice"))
        ).alias("mean_b"),
        F.avg(
            F.when(F.col("l_returnflag") == "R", F.col("l_quantity"))
        ).alias("q_a"),
        F.avg(
            F.when(F.col("l_returnflag") == "A", F.col("l_quantity"))
        ).alias("q_b"),
    )
    s = g.select(
        "l_partkey",
        (F.col("mean_a") - F.col("mean_b")).alias("log2_fc"),
        F.pow(F.lit(10.0), -F.abs(F.col("q_a") - F.col("q_b"))).alias(
            "p_surrogate"
        ),
    )
    return s.select(
        "l_partkey",
        _r("log2_fc").alias("log2_fc"),
        F.round("p_surrogate", 9).alias("p_surrogate"),
        st.s0_significance(
            "log2_fc", "p_surrogate", s0=0.585, minratio=0.1, fdr=0.05
        ).alias("significant"),
    )


# --- X3 KEGG pathway colorizer compute core (visualize.py:1495-1605) ---------


@_q(
    "kegg_color_bins",
    """
WITH g AS (
  SELECT l_partkey,
    avg(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END) AS ma,
    avg(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END) AS mb
  FROM lineitem GROUP BY 1
),
r AS (
  SELECT l_partkey,
         CASE WHEN ma > 0 AND mb > 0 THEN log2(ma / mb) END AS ratio
  FROM g
)
SELECT l_partkey, round(ratio, 6) AS log2_ratio,
  CASE WHEN ratio IS NOT NULL THEN
    CAST(least(floor((greatest(least(ratio, 2.0), -2.0) + 2.0)
                     / (4.0 / 7)), 6) AS INTEGER) END AS color_bin
FROM r
""",
)
def q_kegg_color_bins(spark, sf):
    from padua_spark.operators.external import kegg_color_table

    li = _t(spark, sf, "lineitem")
    out = kegg_color_table(
        li, ["l_partkey"], "l_returnflag", "l_extendedprice", "R", "A"
    )
    return out.select(
        "l_partkey", _r("log2_ratio").alias("log2_ratio"), "color_bin"
    )


# --- ext: end-to-end corpus curation (quality gate → exact dedup →
#     MinHash near-dup removal), composed from oracle-checked stages --------


def _curate_oracle() -> str:
    minhash_sql = _minhash_oracle("kept")
    return rf"""
WITH kept0 AS (
  SELECT * FROM documents
  WHERE CASE WHEN len(trim(text)) = 0 THEN 0
        ELSE len(string_split_regex(trim(text),
                                    '[ \t\n\x0B\f\r]+')) END >= 5
),
fp AS (
  SELECT doc_id, text, n_chars,
    list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(
          list_filter(
            string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                         ''), c -> c <> ''),
          c -> CAST(ord(c) AS BIGINT))),
      (acc, c) -> (acc * 131 + c) % 2147483647) AS f
  FROM kept0
),
keepids AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY 1),
kept AS (
  SELECT p.doc_id, p.text, p.n_chars
  FROM fp p JOIN keepids k ON p.f = k.f AND p.doc_id = k.doc_id
),
cand AS (SELECT * FROM ({minhash_sql}) mh),
losers AS (
  SELECT DISTINCT id_b FROM cand WHERE est_jaccard >= 0.5
)
SELECT k.doc_id, k.n_chars
FROM kept k
WHERE k.doc_id NOT IN (SELECT id_b FROM losers)
"""


# --- ext: token-frequency table (vocab building) and context-window
#     document chunking --------------------------------------------------------


@_q(
    "token_frequencies",
    r"""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT unnest(string_split_regex(trim(lower(text)),
                                   '[ \t\n\x0B\f\r]+')) AS token
  FROM documents WHERE len(trim(text)) > 0
) WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 50
""",
)
def q_token_frequencies(spark, sf):
    from padua_spark.extensions.text import token_frequencies

    d = _t(spark, sf, "documents")
    return token_frequencies(d, "text", top_n=50)


@_q(
    "chunk_documents",
    r"""
WITH t AS (
  SELECT doc_id,
         string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS toks
  FROM documents
),
c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0,
           CAST(floor((greatest(0, len(toks) - 40) + 34) / 35.0)
                AS BIGINT))) AS chunk_idx
  FROM t
)
SELECT doc_id, chunk_idx,
  array_to_string(list_slice(toks, chunk_idx * 35 + 1,
                             chunk_idx * 35 + 40), ' ') AS chunk,
  CAST(len(list_slice(toks, chunk_idx * 35 + 1, chunk_idx * 35 + 40))
       AS INT) AS n_chunk_tokens
FROM c
""",
)
def q_chunk_documents(spark, sf):
    from padua_spark.extensions.text import chunk_documents

    d = _t(spark, sf, "documents")
    return chunk_documents(d, "doc_id", "text", max_tokens=40, overlap=5)


# --- ext: embedding mean-pooling (chunk→doc / label centroid) --------------


@_q(
    "mean_pool",
    """
SELECT label, i - 1 AS dim,
       round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS mean_val
FROM embeddings, generate_series(1, 64) AS g(i)
GROUP BY label, i
""",
)
def q_mean_pool(spark, sf):
    emb = _t(spark, sf, "embeddings")
    pooled = x_sim.mean_pool_embeddings(emb, ["label"], "embedding")
    return pooled.select(
        "label", F.posexplode("pooled").alias("dim", "mean_val")
    ).select(
        "label",
        F.col("dim").cast("bigint").alias("dim"),
        _r("mean_val").alias("mean_val"),
    )


# --- ext: PII scrub — engine-portable regex redaction (URL/email/IP/
#     phone); PII is injected deterministically from doc_id so the
#     synthetic corpus actually exercises every pattern --------------------


def _pii_oracle() -> str:
    from padua_spark.extensions.text import scrub_pii_sql

    injected = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com via https://ex.org/p/' || CAST(doc_id AS VARCHAR)"
        " || ' or call 555-123-4567 node 10.0.0.'"
        " || CAST(doc_id % 256 AS VARCHAR)"
    )
    return (
        f"SELECT doc_id, {scrub_pii_sql(injected)} AS scrubbed"
        " FROM documents"
    )


@_q("pii_scrub", _pii_oracle())
def q_pii_scrub(spark, sf):
    from padua_spark.extensions.text import scrub_pii

    d = _t(spark, sf, "documents")
    sid = F.col("doc_id").cast("string")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"), sid,
        F.lit("@example.com via https://ex.org/p/"), sid,
        F.lit(" or call 555-123-4567 node 10.0.0."),
        (F.col("doc_id") % 256).cast("string"),
    )
    return d.select("doc_id", scrub_pii(injected).alias("scrubbed"))


# --- ext: per-group corpus report (doc/token totals, length percentiles) ----


@_q(
    "corpus_stats",
    r"""
SELECT lang,
  count(*) AS n_docs,
  CAST(sum(CASE WHEN len(trim(text)) = 0 THEN 0
       ELSE len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) END)
       AS BIGINT) AS total_tokens,
  round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars,
  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS p50_chars,
  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 6) AS p90_chars
FROM documents
GROUP BY lang
""",
)
def q_corpus_stats(spark, sf):
    from padua_spark.extensions.text import corpus_stats

    d = _t(spark, sf, "documents")
    out = corpus_stats(d, "text", ["lang"], chars_col="n_chars")
    return out.select(
        "lang", "n_docs", "total_tokens",
        _r("avg_chars").alias("avg_chars"),
        _r("p50_chars").alias("p50_chars"),
        _r("p90_chars").alias("p90_chars"),
    )


# --- ext: deterministic sampling / splitting — key-derived LCG uniforms
#     (reproducible on any engine/partitioning/retry; sampleBy is not) -------


def _sampling_oracles() -> tuple[str, str, str]:
    from padua_spark.extensions.sampling import (
        split_assign_sql,
        stratified_sample_sql,
    )
    from padua_spark.functions.scalar import deterministic_uniform_sql

    frac_pred = stratified_sample_sql(
        "doc_id", "lang",
        {"en": 0.25, "de": 0.5, "zh": 0.75}, default=0.1, salt=11,
    )
    strat = f"SELECT doc_id, lang FROM documents WHERE {frac_pred}"
    split_expr = split_assign_sql(
        "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt=5
    )
    split = f"SELECT doc_id, {split_expr} AS split FROM documents"
    u = deterministic_uniform_sql("doc_id", salt=3)
    topk = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY {u}, doc_id) AS rn
  FROM documents
) WHERE rn <= 10
"""
    return strat, split, topk


_STRAT_SQL, _SPLIT_SQL, _TOPK_SQL = _sampling_oracles()


@_q("stratified_sample", _STRAT_SQL)
def q_stratified_sample(spark, sf):
    from padua_spark.extensions.sampling import stratified_sample

    d = _t(spark, sf, "documents")
    out = stratified_sample(
        d, "doc_id", "lang",
        {"en": 0.25, "de": 0.5, "zh": 0.75}, default=0.1, salt=11,
    )
    return out.select("doc_id", "lang")


@_q("train_test_split", _SPLIT_SQL)
def q_train_test_split(spark, sf):
    from padua_spark.extensions.sampling import split_assign

    d = _t(spark, sf, "documents")
    out = split_assign(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt=5
    )
    return out.select("doc_id", "split")


@_q("sample_k_per_stratum", _TOPK_SQL)
def q_sample_k_per_stratum(spark, sf):
    from padua_spark.extensions.sampling import sample_k_per_stratum

    d = _t(spark, sf, "documents")
    out = sample_k_per_stratum(d, "doc_id", "lang", k=10, salt=3)
    return out.select("doc_id", "lang")


# --- ext: benchmark decontamination — per-doc fraction of k-shingles
#     appearing in an eval/benchmark set (broadcast benchmark side) ----------


def _contamination_oracle() -> str:
    return rf"""
WITH th AS (
  SELECT doc_id, source,
    list_transform(string_split(text, ' '), w -> list_reduce(
        list_prepend(CAST(7 AS BIGINT),
          list_transform(list_filter(string_split(w, ''), c -> c <> ''),
                         c -> CAST(ord(c) AS BIGINT))),
        (a, c) -> (a * 131 + c) % 2147483647)) AS th
  FROM documents
),
sh AS (
  SELECT doc_id, source,
    CASE WHEN len(th) >= 3 THEN
      list_distinct(list_transform(generate_series(1, len(th) - 2),
        i -> (th[i] * 1 + th[i+1] * {_JACCARD_C1}
              + th[i+2] * {_JACCARD_C2}) % 2147483647))
    ELSE [th[1]] END AS sh
  FROM th
),
bench AS (
  SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE source = 'src0'
),
corp AS (
  SELECT doc_id, unnest(sh) AS shingle FROM sh WHERE source <> 'src0'
)
SELECT c.doc_id,
  count(*) AS n_shingles,
  count(b.shingle) AS n_hit,
  round(count(b.shingle) / CAST(count(*) AS DOUBLE), 6) AS contamination
FROM corp c LEFT JOIN bench b ON c.shingle = b.shingle
GROUP BY c.doc_id
"""


@_q("contamination_check", _contamination_oracle())
def q_contamination_check(spark, sf):
    from padua_spark.extensions.dedup import contamination_check

    d = _t(spark, sf, "documents")
    out = contamination_check(
        d.where(F.col("source") != "src0"),
        d.where(F.col("source") == "src0"),
        "doc_id",
        "text",
        k_shingle=3,
    )
    return out.select(
        "doc_id", "n_shingles", "n_hit",
        _r("contamination").alias("contamination"),
    )


# --- ext: duplicate-cluster assignment — connected components over the
#     MinHash candidate graph (pairs → true clusters; DuckDB twin is a
#     recursive min-reachable-id CTE) ----------------------------------------


def _dedup_clusters_oracle() -> str:
    minhash_sql = _minhash_oracle("documents")
    return rf"""
WITH RECURSIVE cand AS (
  SELECT id_a, id_b FROM ({minhash_sql}) mh WHERE est_jaccard >= 0.5
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM cand
  UNION
  SELECT id_b AS s, id_a AS d FROM cand
),
reach(node, r) AS (
  SELECT s, s FROM edges
  UNION
  SELECT reach.node, e.d FROM reach JOIN edges e ON reach.r = e.s
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""


@_q("dedup_clusters", _dedup_clusters_oracle())
def q_dedup_clusters(spark, sf):
    from padua_spark.extensions.dedup import minhash_lsh_candidates
    from padua_spark.extensions.graph import cluster_assignments

    d = _t(spark, sf, "documents")
    pairs = minhash_lsh_candidates(
        d, "doc_id", "text", k_shingle=3, num_hashes=32, bands=8,
        portable_keys=True,
    ).where(F.col("est_jaccard") >= 0.5).select("id_a", "id_b")
    out = cluster_assignments(d, "doc_id", pairs)
    return out.select("doc_id", "cluster_id")


@_q("curate_corpus", _curate_oracle())
def q_curate_corpus(spark, sf):
    from padua_spark.extensions.curation import curate_corpus

    d = _t(spark, sf, "documents")
    out = curate_corpus(
        d,
        "doc_id",
        "text",
        min_tokens=5,
        jaccard_threshold=0.5,
        portable_keys=True,
    )
    return out.select("doc_id", "n_chars")


# --- ext: span-level exact dedup (Lee et al. ACL 2022, relational) ---------


def _dup_spans_oracle() -> str:
    wh = "(((((((((th[i] * 1) % 2147483647 + th[i+1] * 1000000007) % 2147483647) + th[i+2] * 94140831) % 2147483647) + th[i+3] * 1887548037) % 2147483647) + th[i+4] * 701409674) % 2147483647)"
    return rf"""
WITH th AS (
  SELECT doc_id,
    list_transform(string_split(text, ' '), w -> list_reduce(
        list_prepend(CAST(7 AS BIGINT),
          list_transform(list_filter(string_split(w, ''), c -> c <> ''),
                         c -> CAST(ord(c) AS BIGINT))),
        (a, c) -> (a * 131 + c) % 2147483647)) AS th
  FROM documents
),
w AS (
  SELECT doc_id, {wh} AS wh
  FROM th, unnest(generate_series(1, len(th) - 4)) AS g(i)
),
c AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY wh) AS cnt FROM w)
SELECT doc_id,
  count(*) AS n_windows,
  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
  round(CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        / count(*), 6) AS dup_fraction
FROM c GROUP BY doc_id
"""


@_q("duplicate_spans", _dup_spans_oracle())
def q_duplicate_spans(spark, sf):
    from padua_spark.extensions.dedup import duplicate_spans

    d = _t(spark, sf, "documents")
    out = duplicate_spans(d, "doc_id", "text", k=5)
    return out.select(
        "doc_id", "n_windows", "n_dup_windows",
        _r("dup_fraction").alias("dup_fraction"),
    )


# --- ext: Gopher-style repetition quality signals ---------------------------


def _repetition_oracle() -> str:
    return r"""
WITH lines AS (
  SELECT doc_id, l AS line
  FROM documents,
    unnest(list_filter(string_split(text, chr(10)), x -> x <> '')) AS t(l)
),
pl AS (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY doc_id, line),
ls AS (
  SELECT doc_id,
    CAST(sum(c) AS BIGINT) AS n_lines,
    1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dlf,
    CAST(sum(CASE WHEN c > 1 THEN length(line) * c ELSE 0 END) AS DOUBLE)
      / CAST(sum(length(line) * c) AS DOUBLE) AS dlcf
  FROM pl GROUP BY doc_id
),
tk AS (
  SELECT doc_id, string_split_regex(trim(text), '[ 	

]+') AS t
  FROM documents
),
bg AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
  FROM tk, unnest(generate_series(1, len(t) - 1)) AS g(i)
),
pb AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
bs AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS tbf
       FROM pb GROUP BY doc_id)
SELECT ls.doc_id, n_lines,
  round(dlf, 6) AS dup_line_fraction,
  round(dlcf, 6) AS dup_line_char_fraction,
  round(tbf, 6) AS top_bigram_fraction
FROM ls LEFT JOIN bs ON ls.doc_id = bs.doc_id
"""


@_q("repetition_signals", _repetition_oracle())
def q_repetition_signals(spark, sf):
    from padua_spark.extensions.text import repetition_signals

    d = _t(spark, sf, "documents")
    out = repetition_signals(d, "doc_id", "text")
    return out.select(
        "doc_id", "n_lines",
        _r("dup_line_fraction").alias("dup_line_fraction"),
        _r("dup_line_char_fraction").alias("dup_line_char_fraction"),
        _r("top_bigram_fraction").alias("top_bigram_fraction"),
    )


# --- ext: concat-and-chunk sequence packing (distributed prefix sum) --------


def _pack_oracle(budget: int) -> str:
    return rf"""
WITH t AS (
  SELECT doc_id,
    CAST((CASE WHEN length(trim(text)) = 0 THEN 0
          ELSE len(string_split_regex(trim(text), '[ 	

]+'))
          END) AS BIGINT) AS n_tokens
  FROM documents
),
p AS (
  SELECT doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM t WHERE n_tokens > 0
)
SELECT doc_id, n_tokens,
  CAST(off AS BIGINT) AS token_offset,
  CAST(floor(CAST(off AS DOUBLE) / {budget}) AS BIGINT) AS seq_first,
  CAST(floor(CAST(off + n_tokens - 1 AS DOUBLE) / {budget}) AS BIGINT)
    AS seq_last
FROM p
"""


@_q("pack_sequences", _pack_oracle(256))
def q_pack_sequences(spark, sf):
    from padua_spark.extensions.text import pack_sequences

    d = _t(spark, sf, "documents")
    out = pack_sequences(d, "doc_id", "text", budget=256)
    return out.select(
        "doc_id", "n_tokens", "token_offset", "seq_first", "seq_last"
    )


# --- ext: epoch-weighted domain mixing --------------------------------------


def _mix_oracle() -> str:
    from padua_spark.extensions.sampling import mix_copies_sql

    n_expr = mix_copies_sql(
        "doc_id", "lang", {"en": 2.5, "fr": 0.5}, default=1.0, salt=5
    )
    return f"""
WITH n AS (SELECT doc_id, lang, {n_expr} AS n FROM documents)
SELECT doc_id, lang,
  CAST(unnest(generate_series(1, n)) AS BIGINT) AS epoch
FROM n
"""


@_q("mix_corpus", _mix_oracle())
def q_mix_corpus(spark, sf):
    from padua_spark.extensions.sampling import mix_corpus

    d = _t(spark, sf, "documents")
    out = mix_corpus(
        d, "doc_id", "lang", {"en": 2.5, "fr": 0.5}, default=1.0, salt=5
    )
    return out.select(
        "doc_id", "lang", F.col("epoch").cast("bigint").alias("epoch")
    )


# --- ext: TF-IDF top terms per document -------------------------------------


_TFIDF_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, t AS token
  FROM documents,
    unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                       x -> x <> '')) AS u(t)
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY 1),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.doc_freq,
    CAST(tf.tf AS DOUBLE)
      * ln(CAST(nd.n AS DOUBLE) / CAST(dfreq.doc_freq AS DOUBLE)) AS tfidf
  FROM tf JOIN dfreq USING (token), nd
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY round(tfidf, 9) DESC, token
    ) AS term_rank
  FROM scored
)
SELECT doc_id, token, tf, doc_freq, round(tfidf, 6) AS tfidf,
       CAST(term_rank AS BIGINT) AS term_rank
FROM ranked WHERE term_rank <= 3
"""


@_q("tfidf_top_terms", _TFIDF_ORACLE)
def q_tfidf_top_terms(spark, sf):
    from padua_spark.extensions.text import tfidf_top_terms

    d = _t(spark, sf, "documents")
    out = tfidf_top_terms(d, "doc_id", "text", k=3)
    return out.select(
        "doc_id", "token", "tf", "doc_freq",
        _r("tfidf").alias("tfidf"),
        F.col("term_rank").cast("bigint").alias("term_rank"),
    )


# --- ext: self-trained bigram-LM quality score (perplexity proxy) -----------


_BIGRAM_LM_ORACLE = r"""
WITH tk AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                x -> x <> '') AS t
  FROM documents
),
bi AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM tk, unnest(generate_series(1, len(t) - 1)) AS g(i)
  WHERE len(t) >= 2
),
bg AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c12) AS c1 FROM bg GROUP BY 1),
v AS (SELECT count(DISTINCT t2.tok) AS vs
      FROM (SELECT unnest(t) AS tok FROM tk) t2 WHERE t2.tok <> '')
SELECT bi.doc_id,
  count(*) AS n_bigrams,
  round(avg(ln((CAST(bg.c12 AS DOUBLE) + 1.0)
               / (CAST(ctx.c1 AS DOUBLE) + CAST(v.vs AS DOUBLE)))), 6)
    AS mean_logp
FROM bi
JOIN bg USING (w1, w2)
JOIN ctx USING (w1), v
GROUP BY bi.doc_id
"""


@_q("bigram_lm_score", _BIGRAM_LM_ORACLE)
def q_bigram_lm_score(spark, sf):
    from padua_spark.extensions.text import bigram_lm_score

    d = _t(spark, sf, "documents")
    out = bigram_lm_score(d, "doc_id", "text")
    return out.select(
        "doc_id", "n_bigrams", _r("mean_logp").alias("mean_logp")
    )


# --- ext: weighted sampling without replacement (Efraimidis–Spirakis) -------


def _weighted_sample_oracle() -> str:
    from padua_spark.extensions.sampling import es_key_sql

    es = es_key_sql("doc_id", "n_chars", salt=11)
    return f"""
SELECT doc_id, lang, n_chars, {es} AS es_key
FROM documents
WHERE CAST(n_chars AS DOUBLE) > 0
ORDER BY es_key DESC, doc_id LIMIT 100
"""


@_q("weighted_sample", _weighted_sample_oracle())
def q_weighted_sample(spark, sf):
    from padua_spark.extensions.sampling import weighted_sample_k

    d = _t(spark, sf, "documents")
    out = weighted_sample_k(d, "doc_id", "n_chars", k=100, salt=11)
    return out.select("doc_id", "lang", "n_chars", "es_key")


# --- winsorize: per-group percentile clipping (robust outlier limiting) -----


_WINSORIZE_ORACLE = """
WITH b AS (
  SELECT l_returnflag,
    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.05) AS lo,
    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS hi
  FROM lineitem GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber,
  round(CASE WHEN l.l_extendedprice < b.lo THEN b.lo
             WHEN l.l_extendedprice > b.hi THEN b.hi
             ELSE l.l_extendedprice END, 6) AS value_winsor
FROM lineitem l JOIN b USING (l_returnflag)
"""


@_q("winsorize", _WINSORIZE_ORACLE)
def q_winsorize(spark, sf):
    from padua_spark.io_utils import spread_narrow_scan

    # exact percentile buffers its group's values in the partial agg —
    # unlike the cheap per-row conditional aggs of the stat queries,
    # that stage is compute/memory-bound, so a narrow scan is worth
    # spreading here (measured ~35% at sf0.1; no-op on split inputs)
    li = spread_narrow_scan(_t(spark, sf, "lineitem"))
    out = norm.winsorize(
        li, ["l_returnflag"], "l_extendedprice", lo=0.05, hi=0.95,
        out_col="value_winsor",
    )
    return out.select(
        "l_orderkey", "l_linenumber",
        _r("value_winsor").alias("value_winsor"),
    )


# --- ext: KMV distinct-token sketch (mergeable, exactly oracle-checkable) ---

# DuckDB twin of dedup.token_hashes: seed 7, h = (h*131 + ord(c)) % MOD
# per codepoint, tokens split on single space, empty-string chars
# filtered (Spark ascii('')=0 vs DuckDB ord('')=-1).
_TOKEN_HASH_LIST_SQL = r"""list_transform(string_split(text, ' '),
  w -> list_reduce(
    list_prepend(CAST(7 AS BIGINT),
      list_transform(list_filter(string_split(w, ''), c -> c <> ''),
                     c -> CAST(ord(c) AS BIGINT))),
    (a, c) -> (a * 131 + c) % 2147483647))"""


def _kmv_oracle(k: int) -> str:
    return f"""
WITH th AS (
  SELECT lang, unnest({_TOKEN_HASH_LIST_SQL}) AS h FROM documents
),
d AS (SELECT DISTINCT lang, h FROM th),
r AS (
  SELECT lang, h,
    row_number() OVER (PARTITION BY lang ORDER BY h) AS rn,
    count(*) OVER (PARTITION BY lang) AS nd
  FROM d
),
a AS (
  SELECT lang,
    CAST(sum(CASE WHEN rn <= {k} THEN 1 ELSE 0 END) AS INT) AS n_sketch,
    max(CASE WHEN rn = {k} THEN h END) AS kth,
    max(nd) AS nd
  FROM r GROUP BY lang
)
SELECT lang, n_sketch,
  CASE WHEN nd >= {k} THEN kth END AS kth_hash,
  round(CASE WHEN nd < {k} THEN CAST(nd AS DOUBLE)
        ELSE {float(k - 1)!r} * 2147483647.0 / CAST(kth AS DOUBLE)
        END, 6) AS est_distinct
FROM a
"""


@_q("kmv_distinct_tokens", _kmv_oracle(64))
def q_kmv_distinct_tokens(spark, sf):
    from padua_spark.extensions.sketches import kmv_distinct_tokens

    d = _t(spark, sf, "documents")
    out = kmv_distinct_tokens(d, ["lang"], "text", k=64)
    return out.select(
        "lang", "n_sketch", "kth_hash",
        _r("est_distinct").alias("est_distinct"),
    )


# --- ext: streaming drift monitor (windowed histogram → PSI) ----------------


@_q(
    "windowed_psi",
    """
WITH e AS (
  SELECT epoch_us(ts) AS tsu, value FROM events WHERE value IS NOT NULL
),
b AS (
  SELECT (tsu // 3600000000) * 3600 AS ws,
         greatest(0, least(9,
           CAST(floor((value - 0.0) / 50.0) AS INT))) AS bin
  FROM e
),
cnt AS (SELECT ws, bin, count(*) AS n FROM b GROUP BY 1, 2),
ref AS (SELECT bin, count(*) AS rn FROM b GROUP BY 1),
rt AS (SELECT CAST(sum(rn) AS DOUBLE) AS tot FROM ref),
wt AS (SELECT ws, CAST(sum(n) AS BIGINT) AS n_events FROM cnt GROUP BY 1),
fw AS (
  SELECT wt.ws, wt.n_events, ref.bin, ref.rn,
         coalesce(cnt.n, 0) AS n
  FROM wt CROSS JOIN ref
  LEFT JOIN cnt ON cnt.ws = wt.ws AND cnt.bin = ref.bin
)
SELECT f.ws AS window_start_epoch, f.n_events,
  round(sum(
    ((f.n + 0.5) / (CAST(f.n_events AS DOUBLE) + 5.0)
     - (f.rn + 0.5) / (rt.tot + 5.0))
    * ln(((f.n + 0.5) / (CAST(f.n_events AS DOUBLE) + 5.0))
         / ((f.rn + 0.5) / (rt.tot + 5.0)))), 9) AS psi
FROM fw f CROSS JOIN rt
GROUP BY 1, 2
""",
)
def q_windowed_psi(spark, sf):
    """Per-hour PSI of the event value distribution against the
    whole-corpus reference — the drift monitor whose front half
    (windowed bin counts) is ONE stateful aggregation and runs
    unchanged on a stream; the PSI finalizer runs per micro-batch.
    Every reference bin contributes to every window (a popular bin
    missing from a window IS drift)."""
    from padua_spark.extensions.quality import psi_vs_reference
    from padua_spark.streaming import windowed_value_histogram

    e = _t(spark, sf, "events")
    counts = windowed_value_histogram(
        e, _events_event_time(spark, sf), "value",
        lo=0.0, hi=500.0, n_bins=10, window_duration="1 hour",
    ).select(
        F.col("window_start").cast("long").alias("ws"), "bin", "n"
    )
    # THREE consumers (reference build, per-window totals, the bin
    # join) would each rescan events (measured: 3 FileScans, no
    # exchange reuse) — persist the tiny windows×bins frame instead
    counts = counts.persist()
    ref = counts.groupBy("bin").agg(F.sum("n").alias("ref_n"))
    out = psi_vs_reference(counts, ref, n_bins=10, window_cols=["ws"])
    from padua_spark.io_utils import track_cached

    # track on the FINAL returned frame: .select() returns a new
    # DataFrame without the tracking attribute, so tracking `out` and
    # then transforming it would strand the persisted block
    final = out.select(
        F.col("ws").alias("window_start_epoch"),
        "n_events",
        F.round("psi", 9).alias("psi"),
    )
    return track_cached(final, counts)


_WINDOWED_TOKDIV_ORACLE = r"""
WITH e AS (
  SELECT epoch_us(ts) AS tsu, lower(props) AS txt
  FROM events WHERE props IS NOT NULL AND ts IS NOT NULL
),
tok AS (
  SELECT (tsu // 3600000000) * 3600 AS ws,
    unnest(regexp_split_to_array(trim(txt), '\s+')) AS token
  FROM e
),
cnt AS (
  SELECT ws, token, CAST(count(*) AS BIGINT) AS n FROM tok
  WHERE token <> '' GROUP BY 1, 2
),
ref AS (SELECT token, CAST(sum(n) AS BIGINT) AS ref_n FROM cnt GROUP BY 1),
rt AS (SELECT CAST(sum(ref_n) AS DOUBLE) AS tot FROM ref),
top AS (SELECT token, ref_n FROM ref ORDER BY ref_n DESC, token LIMIT 50),
wt AS (SELECT ws, CAST(sum(n) AS BIGINT) AS n_tokens FROM cnt GROUP BY 1),
grid AS (
  SELECT wt.ws, wt.n_tokens, top.token, top.ref_n,
    coalesce(cnt.n, 0) AS n
  FROM wt CROSS JOIN top
  LEFT JOIN cnt ON cnt.ws = wt.ws AND cnt.token = top.token
),
terms AS (
  SELECT g.ws, g.n_tokens, g.n,
    CAST(g.n AS DOUBLE) / g.n_tokens AS p,
    CAST(g.ref_n AS DOUBLE) / rt.tot AS q
  FROM grid g CROSS JOIN rt
),
sums AS (
  SELECT ws, n_tokens,
    sum(CASE WHEN n > 0
        THEN 0.5 * p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END
        + 0.5 * q * ln(q / ((p + q) / 2.0))) AS js_sup,
    sum(sqrt(p * q)) AS bc_sup,
    greatest(0.0, 1.0 - sum(p)) AS p_o,
    greatest(0.0, 1.0 - sum(q)) AS q_o
  FROM terms GROUP BY 1, 2
)
SELECT ws AS window_start_epoch, n_tokens,
  round(js_sup
    + CASE WHEN p_o > 0
        THEN 0.5 * p_o * ln(p_o / ((p_o + q_o) / 2.0))
        ELSE 0.0 END
    + CASE WHEN q_o > 0
        THEN 0.5 * q_o * ln(q_o / ((p_o + q_o) / 2.0))
        ELSE 0.0 END, 6) AS js_divergence,
  round(sqrt(greatest(0.0,
    1.0 - (bc_sup + sqrt(p_o * q_o)))), 6) AS hellinger
FROM sums
"""


@_q("windowed_token_divergence", _WINDOWED_TOKDIV_ORACLE)
def q_windowed_token_divergence(spark, sf):
    """Per-hour JS divergence + Hellinger distance of the event-props
    token distribution against the whole-corpus reference — the
    bounded-metric streaming drift monitor whose front half
    (streaming.windowed_token_counts) is ONE stateful aggregation and
    runs unchanged on a stream; the finalizer
    (streaming.js_hellinger_vs_reference) runs per micro-batch with
    an explicit 'other' tail bucket so both metrics see true
    distributions."""
    from padua_spark.io_utils import track_cached
    from padua_spark.streaming import (
        js_hellinger_vs_reference,
        windowed_token_counts,
    )

    e = _t(spark, sf, "events")
    counts = windowed_token_counts(
        e, _events_event_time(spark, sf), "props",
        window_duration="1 hour",
    ).select(
        F.col("window_start").cast("long").alias("ws"), "token", "n"
    )
    # THREE consumers (reference build, window totals, token join):
    # persist the tiny windows x vocabulary frame, as windowed_psi
    counts = counts.persist()
    ref = counts.groupBy("token").agg(
        F.sum("n").cast("bigint").alias("ref_n")
    )
    out = js_hellinger_vs_reference(
        counts, ref, top_n=50, window_cols=["ws"]
    )
    final = out.select(
        F.col("ws").alias("window_start_epoch"),
        "n_tokens", "js_divergence", "hellinger",
    )
    return track_cached(final, counts)


_WINDOWED_CONFUSION_ORACLE = """
WITH e AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600 AS ws,
    CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS p,
    CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS y
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
    AND event_type IS NOT NULL
),
c AS (
  SELECT ws,
    CAST(sum(CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(sum(CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(sum(CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(sum(CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM e GROUP BY 1
)
SELECT ws AS window_start_epoch, tp, fp, fn, tn,
  round(CASE WHEN tp + fp + fn + tn > 0
    THEN CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) END, 6)
    AS accuracy,
  round(CASE WHEN tp + fp > 0
    THEN CAST(tp AS DOUBLE) / (tp + fp) END, 6) AS precision,
  round(CASE WHEN tp + fn > 0
    THEN CAST(tp AS DOUBLE) / (tp + fn) END, 6) AS recall,
  round(CASE WHEN 2 * tp + fp + fn > 0
    THEN 2.0 * tp / (2.0 * tp + fp + fn) END, 6) AS f1,
  round(CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) > 0
    THEN (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
      / (sqrt(CAST(tp + fp AS DOUBLE)) * sqrt(CAST(tp + fn AS DOUBLE))
         * sqrt(CAST(tn + fp AS DOUBLE)) * sqrt(CAST(tn + fn AS DOUBLE)))
    END, 6) AS mcc
FROM c
"""


@_q("windowed_confusion", _WINDOWED_CONFUSION_ORACLE)
def q_windowed_confusion(spark, sf):
    """Per-hour binary confusion battery (streaming.windowed_confusion)
    for a value-threshold predictor of engagement event types: ONE
    stateful aggregation to four exact integers per window plus the
    closed-form finalizer shared with quality.confusion_stats — runs
    unchanged on a stream."""
    from padua_spark.streaming import windowed_confusion

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull()
    )
    out = windowed_confusion(
        e,
        _events_event_time(spark, sf),
        (F.col("value") > 100.0).cast("int"),
        F.col("event_type").isin("click", "view").cast("int"),
        window_duration="1 hour",
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "tp", "fp", "fn", "tn",
        "accuracy", "precision", "recall", "f1", "mcc",
    )


_WINDOWED_ECE_ORACLE = """
WITH e AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600 AS ws,
    least(1.0, greatest(0.0,
      floor(value * 1024.0 / 200.0) / 1024.0)) AS p,
    CASE WHEN event_type IN ('click', 'view') THEN 1.0 ELSE 0.0 END
      AS y
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
    AND event_type IS NOT NULL
),
b AS (
  SELECT ws,
    CAST(least(9, CAST(floor(p * 10) AS INT)) AS INT) AS bin,
    CAST(count(*) AS BIGINT) AS n,
    sum(p) AS sp, sum(y) AS sy
  FROM e GROUP BY 1, 2
),
g AS (
  -- division-free ece numerator + portable HALF_UP rounding:
  -- mirrors the operator exactly (dyadic sums are order-exact)
  SELECT ws, bin, n, abs(sp - sy) AS adiff,
    abs(sp - sy) / CAST(n AS DOUBLE) AS gap
  FROM b
)
SELECT ws AS window_start_epoch,
  CAST(sum(n) AS BIGINT) AS n,
  floor(sum(adiff) / CAST(sum(n) AS DOUBLE) * 1e6 + 0.5) / 1e6
    AS ece,
  floor(max(gap) * 1e6 + 0.5) / 1e6 AS mce
FROM g GROUP BY 1
"""


@_q("windowed_ece", _WINDOWED_ECE_ORACLE)
def q_windowed_ece(spark, sf):
    """Per-hour expected/maximum calibration error of a clamped
    value-score against engagement labels (streaming.windowed_ece):
    ONE stateful aggregation — the 10 equal-width bins are
    compile-time conditional-sum columns, so it runs unchanged on a
    stream with bounded per-key state. The score is quantized to
    DYADIC 1/1024 steps so the per-bin probability sums are exact in
    double regardless of either engine's summation order."""
    from padua_spark.streaming import windowed_ece

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull()
    )
    out = windowed_ece(
        e,
        _events_event_time(spark, sf),
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                F.floor(F.col("value") * 1024.0 / 200.0) / 1024.0,
            ),
        ),
        F.col("event_type").isin("click", "view").cast("int"),
        window_duration="1 hour",
        n_bins=10,
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "n", "ece", "mce",
    )


_WINDOWED_BINNED_AUC_ORACLE = """
WITH e AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600 AS ws,
    least(1.0, greatest(0.0, value / 200.0)) AS s,
    CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS y
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
    AND event_type IS NOT NULL
),
b AS (
  SELECT ws,
    CAST(least(63, CAST(floor(s * 64) AS INT)) AS INT) AS bin,
    CAST(sum(y) AS BIGINT) AS pos,
    CAST(sum(1 - y) AS BIGINT) AS neg
  FROM e GROUP BY 1, 2
),
c AS (
  SELECT ws, bin, pos, neg,
    CAST(coalesce(sum(neg) OVER (PARTITION BY ws ORDER BY bin
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS DOUBLE) AS neg_below
  FROM b
)
SELECT ws AS window_start_epoch,
  CAST(sum(pos) AS BIGINT) AS n_pos,
  CAST(sum(neg) AS BIGINT) AS n_neg,
  round(CASE WHEN sum(pos) > 0 AND sum(neg) > 0 THEN
    sum(CAST(pos AS DOUBLE) * (neg_below + CAST(neg AS DOUBLE) / 2.0))
    / (CAST(sum(pos) AS DOUBLE) * CAST(sum(neg) AS DOUBLE)) END, 6)
    AS auc
FROM c GROUP BY 1
"""


@_q("windowed_binned_auc", _WINDOWED_BINNED_AUC_ORACLE)
def q_windowed_binned_auc(spark, sf):
    """Per-hour binned (tie-aware midrank) ROC-AUC of the clamped
    value-score for engagement labels (streaming.windowed_binned_auc):
    2 x 64 bounded count partials per window in ONE stateful
    aggregation, the cumulative-negatives fold as a per-row array
    expression — the streamable face of exact group_auc."""
    from padua_spark.streaming import windowed_binned_auc

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull()
    )
    out = windowed_binned_auc(
        e,
        _events_event_time(spark, sf),
        F.least(
            F.lit(1.0), F.greatest(F.lit(0.0), F.col("value") / 200.0)
        ),
        F.col("event_type").isin("click", "view").cast("int"),
        window_duration="1 hour",
        n_bins=64,
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "n_pos", "n_neg", "auc",
    )


_WINDOWED_AP_ORACLE = """
WITH e AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600 AS ws,
    least(1.0, greatest(0.0, value / 200.0)) AS s,
    CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS y
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
    AND event_type IS NOT NULL
),
b AS (
  SELECT ws,
    CAST(least(63, CAST(floor(s * 64) AS INT)) AS INT) AS bin,
    CAST(sum(y) AS BIGINT) AS pos,
    CAST(sum(1 - y) AS BIGINT) AS neg
  FROM e GROUP BY 1, 2
),
c AS (
  SELECT ws, bin, pos, neg,
    CAST(sum(pos) OVER (PARTITION BY ws ORDER BY bin DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS DOUBLE) AS tp_incl,
    CAST(sum(neg) OVER (PARTITION BY ws ORDER BY bin DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS DOUBLE) AS fp_incl
  FROM b
)
SELECT ws AS window_start_epoch,
  CAST(sum(pos) AS BIGINT) AS n_pos,
  CAST(sum(neg) AS BIGINT) AS n_neg,
  round(CASE WHEN sum(pos) > 0 THEN
    sum(CASE WHEN pos > 0 THEN
      CAST(pos AS DOUBLE) * tp_incl / (tp_incl + fp_incl)
      ELSE 0.0 END) / CAST(sum(pos) AS DOUBLE) END, 6)
    AS average_precision
FROM c GROUP BY 1
"""


@_q("windowed_average_precision", _WINDOWED_AP_ORACLE)
def q_windowed_average_precision(spark, sf):
    """Per-hour binned step-interpolated average precision of the
    clamped value-score for engagement labels
    (streaming.windowed_average_precision): 2 x 64 bounded count
    partials per window in ONE stateful aggregation, the high-to-low
    cumulative-precision fold as a per-row array expression — the
    streamable face of the stepped exact average_precision."""
    from padua_spark.streaming import windowed_average_precision

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull()
    )
    out = windowed_average_precision(
        e,
        _events_event_time(spark, sf),
        F.least(
            F.lit(1.0), F.greatest(F.lit(0.0), F.col("value") / 200.0)
        ),
        F.col("event_type").isin("click", "view").cast("int"),
        window_duration="1 hour",
        n_bins=64,
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "n_pos", "n_neg", "average_precision",
    )


def _windowed_gains_oracle(n_bins: int = 64, n_buckets: int = 10) -> str:
    """DuckDB replay of the quantized-gains law: bin counts per hour
    window, each bin's ascending bucket = 1 + #{q : F_prev >= ceil(q*n)}
    (boundary bins take the lower bucket), inverted so 1 = top."""
    asc_terms = " + ".join(
        f"(CASE WHEN fprev >= ceil({j}.0 * nt / {n_buckets}) "
        "THEN 1 ELSE 0 END)"
        for j in range(1, n_buckets)
    )
    return f"""
WITH e AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600 AS ws,
    least(1.0, greatest(0.0, value / 200.0)) AS s,
    CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS y
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL
    AND event_type IS NOT NULL
),
b AS (
  SELECT ws,
    CAST(least({n_bins - 1}, CAST(floor(s * {n_bins}) AS INT))
      AS INT) AS bin,
    CAST(count(*) AS BIGINT) AS c,
    CAST(sum(y) AS BIGINT) AS pos
  FROM e GROUP BY 1, 2
),
t AS (
  SELECT ws, CAST(sum(c) AS DOUBLE) AS nt,
    CAST(sum(pos) AS DOUBLE) AS pt
  FROM b GROUP BY 1
),
f AS (
  SELECT b.*, t.nt, t.pt,
    CAST(COALESCE(sum(c) OVER (PARTITION BY b.ws ORDER BY bin
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS DOUBLE) AS fprev
  FROM b JOIN t ON b.ws = t.ws
),
bk AS (
  SELECT ws, nt, pt, c, pos,
    {n_buckets + 1} - (1 + {asc_terms}) AS bucket
  FROM f
),
g AS (
  SELECT ws, bucket,
    CAST(sum(c) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS n_pos,
    max(nt) AS nt, max(pt) AS pt
  FROM bk GROUP BY 1, 2
),
cumo AS (
  SELECT *,
    CAST(sum(n_pos) OVER (PARTITION BY ws ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS DOUBLE) AS cum_pos,
    CAST(sum(n) OVER (PARTITION BY ws ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS DOUBLE) AS cum_n
  FROM g
)
SELECT ws AS window_start_epoch, bucket, n, n_pos,
  round(CAST(n_pos AS DOUBLE) / n, 6) AS pos_rate,
  round(CASE WHEN pt > 0
    THEN (CAST(n_pos AS DOUBLE) / n) / (pt / nt) END, 6) AS lift,
  round(CASE WHEN pt > 0 THEN cum_pos / pt END, 6) AS cum_capture,
  round(CASE WHEN pt > 0
    THEN (cum_pos / cum_n) / (pt / nt) END, 6) AS cum_lift
FROM cumo
"""


@_q("windowed_gains_table", _windowed_gains_oracle())
def q_windowed_gains_table(spark, sf):
    """Per-hour binned gains/lift deciles of the clamped value-score
    for engagement labels (streaming.windowed_gains_table): 2 x 64
    bounded count partials per window in ONE stateful aggregation,
    the bucket fold and cumulative capture as per-row array
    expressions — the streamable face of the exact-quantile batch
    gains_table (verdict r11 item 4; exact group_auc stays documented
    as binned-only-in-streaming)."""
    from padua_spark.streaming import windowed_gains_table

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull()
    )
    out = windowed_gains_table(
        e,
        _events_event_time(spark, sf),
        F.least(
            F.lit(1.0), F.greatest(F.lit(0.0), F.col("value") / 200.0)
        ),
        F.col("event_type").isin("click", "view").cast("int"),
        window_duration="1 hour",
        n_bins=64,
        n_buckets=10,
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "bucket", "n", "n_pos", "pos_rate", "lift",
        "cum_capture", "cum_lift",
    )


# --- ext: robust statistics (median/MAD z, trimmed mean) --------------------


@_q(
    "robust_zscore",
    """
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS m
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1
),
mad AS (
  SELECT l.l_returnflag,
         quantile_cont(abs(l.l_quantity - med.m), 0.5) AS s
  FROM lineitem l JOIN med USING (l_returnflag)
  WHERE l.l_quantity IS NOT NULL GROUP BY 1
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
  round(CASE WHEN mad.s > 0
        THEN (l.l_quantity - med.m)
             / (mad.s * 1.4826022185056018) END, 9) AS robust_z
FROM lineitem l
JOIN med USING (l_returnflag) JOIN mad USING (l_returnflag)
""",
)
def q_robust_zscore(spark, sf):
    """Median/MAD robust z per group — the outlier screen whose center
    and scale are not dragged by the outliers themselves."""
    from padua_spark.operators.normalization import robust_zscore

    li = _t(spark, sf, "lineitem")
    out = robust_zscore(li, ["l_returnflag"], "l_quantity")
    return out.select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        F.round("robust_z", 9).alias("robust_z"),
    )


@_q(
    "trimmed_mean",
    """
WITH b AS (
  SELECT l_returnflag,
         quantile_cont(l_quantity, 0.1) AS tlo,
         quantile_cont(l_quantity, 0.9) AS thi
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1
)
SELECT l.l_returnflag,
  round(avg(CASE WHEN l.l_quantity >= b.tlo AND l.l_quantity <= b.thi
            THEN l.l_quantity END), 9) AS trimmed_mean,
  count(CASE WHEN l.l_quantity >= b.tlo AND l.l_quantity <= b.thi
        THEN 1 END) AS n_kept,
  count(l.l_quantity) AS n_total
FROM lineitem l JOIN b USING (l_returnflag)
GROUP BY 1
""",
)
def q_trimmed_mean(spark, sf):
    """10%-trimmed mean per group (values equal to a bound kept — the
    deterministic tie rule) with kept/total counts."""
    from padua_spark.operators.normalization import trimmed_mean

    li = _t(spark, sf, "lineitem")
    out = trimmed_mean(li, ["l_returnflag"], "l_quantity", trim=0.1)
    return out.select(
        "l_returnflag",
        F.round("trimmed_mean", 9).alias("trimmed_mean"),
        "n_kept",
        "n_total",
    )


# --- ext: curation filter funnel (per-stage ablation report) -----------------


@_q(
    "filter_funnel",
    r"""
WITH f AS (
  SELECT n_chars >= 200 AS r1,
         lang = 'en' AS r2,
         len(list_filter(string_split(text, ' '), t -> t <> '')) >= 30
           AS r3
  FROM documents
),
a AS (
  SELECT count(*) AS n_input,
    count(CASE WHEN coalesce(r1, FALSE) THEN 1 END) AS n1,
    count(CASE WHEN coalesce(r1, FALSE) AND coalesce(r2, FALSE)
          THEN 1 END) AS n2,
    count(CASE WHEN coalesce(r1, FALSE) AND coalesce(r2, FALSE)
               AND coalesce(r3, FALSE) THEN 1 END) AS n3
  FROM f
)
SELECT 1 AS stage, 'min_chars' AS rule, n_input AS n_in, n1 AS n_out,
       n_input - n1 AS n_dropped FROM a
UNION ALL
SELECT 2, 'english', n1, n2, n1 - n2 FROM a
UNION ALL
SELECT 3, 'min_tokens', n2, n3, n2 - n3 FROM a
""",
)
def q_filter_funnel(spark, sf):
    """Per-stage curation ablation report: how many documents each
    rule dropped, in order — one conditional-count pass, lazily
    reshaped, no per-stage rescans."""
    from padua_spark.extensions.curation import filter_funnel

    d = _t(spark, sf, "documents")
    toks = F.filter(
        F.split(F.col("text"), " "), lambda x: x != ""
    )
    _kept, report = filter_funnel(
        d,
        {
            "min_chars": F.col("n_chars") >= 200,
            "english": F.col("lang") == "en",
            "min_tokens": F.size(toks) >= 30,
        },
    )
    return report.select("stage", "rule", "n_in", "n_out", "n_dropped")


# --- ext: per-document character entropy ------------------------------------


@_q(
    "char_entropy",
    """
WITH ch AS (
  SELECT doc_id,
         unnest(list_filter(string_split(coalesce(text, ''), ''),
                            c -> c <> '')) AS ch
  FROM documents
),
per AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
agg AS (
  SELECT doc_id, sum(c) AS n_chars,
         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS s
  FROM per GROUP BY 1
)
SELECT d.doc_id,
  CAST(coalesce(a.n_chars, 0) AS BIGINT) AS n_chars,
  round(CASE WHEN a.n_chars > 0
        THEN ln(CAST(a.n_chars AS DOUBLE))
             - a.s / CAST(a.n_chars AS DOUBLE) END, 9) AS char_entropy
FROM documents d LEFT JOIN agg a USING (doc_id)
""",
)
def q_char_entropy(spark, sf):
    """Shannon character entropy per document (nats) — the cheap
    low-entropy detector for boilerplate/degenerate text."""
    from padua_spark.extensions.text import char_entropy

    d = _t(spark, sf, "documents")
    out = char_entropy(d, ["doc_id"], "text")
    return out.select(
        "doc_id", "n_chars",
        F.round("char_entropy", 9).alias("char_entropy"),
    )


# --- ext: PSI distribution-drift monitor ------------------------------------


@_q(
    "psi_value_drift",
    """
WITH per AS (
  SELECT greatest(0, least(9,
           CAST(floor((value - 0.0) / 50.0) AS INT))) AS bin,
         count(CASE WHEN event_type = 'click' THEN 1 END) AS n_a,
         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_b
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
  GROUP BY 1
),
t AS (
  SELECT *, CAST(sum(n_a) OVER () AS DOUBLE) AS ta,
            CAST(sum(n_b) OVER () AS DOUBLE) AS tb
  FROM per
)
SELECT bin, n_a, n_b,
  round((n_a + 0.5) / (ta + 5.0), 9) AS p_a,
  round((n_b + 0.5) / (tb + 5.0), 9) AS p_b,
  round(((n_a + 0.5) / (ta + 5.0) - (n_b + 0.5) / (tb + 5.0))
        * ln(((n_a + 0.5) / (ta + 5.0))
             / ((n_b + 0.5) / (tb + 5.0))), 9) AS contrib
FROM t
""",
)
def q_psi_value_drift(spark, sf):
    """Population-stability-index drift between the click and purchase
    value distributions (10 equal-width bins over [0, 500], Laplace
    smoothing) — one conditional-count scan, B-row window; Σ contrib
    is the PSI."""
    from padua_spark.extensions.quality import psi_drift

    e = _t(spark, sf, "events")
    out = psi_drift(
        e, "event_type", "click", "purchase", "value",
        lo=0.0, hi=500.0, n_bins=10,
    )
    return out.select(
        F.col("bin").cast("long").alias("bin"), "n_a", "n_b",
        F.round("p_a", 9).alias("p_a"),
        F.round("p_b", 9).alias("p_b"),
        F.round("contrib", 9).alias("contrib"),
    )


# --- ext: C4-style duplicate-span removal -----------------------------------


def _dedup_spans_oracle(k: int = 10, maxp: int = 100_000) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS tk
  FROM documents
),
spans AS (
  SELECT doc_id, b.b AS pos,
         array_to_string(tk[b.b * {k} + 1 : b.b * {k} + {k}], ' ')
           AS span
  FROM toks, unnest(range(CAST(ceil(len(tk) / {k}.0) AS BIGINT)))
       AS b(b)
),
keyed AS (
  SELECT doc_id, pos, span,
         doc_id * {maxp} + pos AS key FROM spans
),
win AS (SELECT span, min(key) AS first_key FROM keyed GROUP BY 1),
kept AS (
  SELECT s.* FROM keyed s JOIN win USING (span)
  WHERE s.key = win.first_key
),
rec AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(span, ' ' ORDER BY pos) AS text_dedup
  FROM kept GROUP BY 1
),
tot AS (SELECT doc_id, count(*) AS n_spans FROM keyed GROUP BY 1)
SELECT d.doc_id,
       coalesce(rec.text_dedup, '') AS text_dedup,
       CAST(coalesce(rec.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(tot.n_spans, 0) AS BIGINT) AS n_spans
FROM documents d
LEFT JOIN rec ON rec.doc_id = d.doc_id
LEFT JOIN tot ON tot.doc_id = d.doc_id
"""


@_q("dedup_spans", _dedup_spans_oracle())
def q_dedup_spans(spark, sf):
    """Corpus-wide duplicate-span removal (the C4 preprocessing rule at
    fixed 10-token-block granularity): later occurrences of any
    repeated span are dropped, documents reconstructed from surviving
    spans — reconstructed text included in the hash gate."""
    d = _t(spark, sf, "documents")
    out = x_dedup.dedup_spans(d, "doc_id", "text", span_tokens=10)
    return out.select("doc_id", "text_dedup", "n_kept", "n_spans")


# --- ext: fixed-iteration PageRank over the trade graph ---------------------


def _pagerank_oracle(k: int = 5) -> str:
    # NOTE two DuckDB recursive-CTE traps: (1) inside WITH RECURSIVE a
    # CTE written `a UNION b` becomes a recursive union and does NOT
    # dedup — dedup via SELECT DISTINCT over UNION ALL instead;
    # (2) bare numeric literals type DECIMAL and truncate — CAST all
    # recursion state to DOUBLE. The recursion joins pr→edges directly
    # (O(E) per iteration, not nodes×pr): the symmetrized graph gives
    # every node an in-edge, so inner joins cover all nodes and the
    # recursion terminates when the it<k filter empties the working
    # table.
    return f"""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS sn,
                  'c' || CAST(o_custkey AS VARCHAR) AS cn
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT sn AS src, cn AS dst FROM pairs
    UNION ALL
    SELECT cn AS src, sn AS dst FROM pairs
  )
),
outdeg AS (SELECT src, count(*) AS o FROM edges GROUP BY 1),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges
    UNION ALL
    SELECT dst AS node FROM edges
  )
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
pr(it, node, rank) AS (
  SELECT 0, node, CAST(1.0 AS DOUBLE) / nn.n FROM nodes, nn
  UNION ALL
  SELECT p.it + 1, e.dst AS node,
    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
    + CAST(0.85 AS DOUBLE) * sum(p.rank / o.o)
  FROM (SELECT * FROM pr WHERE it < {k}) p
  JOIN edges e ON e.src = p.node
  JOIN outdeg o ON o.src = p.node
  CROSS JOIN nn
  GROUP BY p.it, e.dst, nn.n
)
SELECT node, round(rank, 9) AS rank FROM pr WHERE it = {k}
"""


@_q("pagerank_trade", _pagerank_oracle())
def q_pagerank_trade(spark, sf):
    """Fixed-iteration PageRank over the symmetrized supplier↔customer
    trade graph — importance propagation for link-graph curation. The
    oracle replays the exact documented recurrence (k=5, d=0.85,
    dangling mass dropped) as a recursive CTE, so the iterative
    operator is value-hash gated end to end."""
    from padua_spark.extensions.graph import pagerank

    from pyspark import StorageLevel

    from padua_spark.io_utils import track_cached

    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    # DISTINCT the one-directional pairs BEFORE symmetrizing (the
    # textrank trick): the dedup shuffle sees half the rows, and the
    # persisted canonical pairs make the symmetrized union free to
    # rebuild per consumer — pagerank's own edge dedup is then skipped
    # (edges_distinct: canonical pairs and their reversals cannot
    # collide, the bipartite sign encoding disjoints the id spaces).
    # Node ids are INTEGERS through the whole iteration (suppkey+1
    # positive / -custkey-1 negative — offset because key 0 exists
    # in the synthetic tables, so bare sign encoding would collide),
    # rendered to the "s{k}"/"c{k}" labels in ONE output projection:
    # hashing/joining bigints beats the string keys measurably
    # (interleaved A/B at sf0.1: ~20-35% whole-query, round 12).
    okeys = F.broadcast(o.select("o_orderkey", "o_custkey"))
    und = (
        li.select("l_orderkey", "l_suppkey")
        .join(okeys, li["l_orderkey"] == okeys["o_orderkey"])
        .select(
            (F.col("l_suppkey").cast("long") + 1).alias("sn"),
            (-F.col("o_custkey").cast("long") - 1).alias("cn"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges = und.select(
        F.col("sn").alias("src"), F.col("cn").alias("dst")
    ).unionAll(
        und.select(F.col("cn").alias("src"), F.col("sn").alias("dst"))
    )
    out = pagerank(
        edges, "src", "dst", k_iters=5, damping=0.85,
        edges_distinct=True,
    )
    res = out.select(
        F.when(
            F.col("node") > 0,
            F.concat(F.lit("s"), F.col("node") - 1),
        )
        .otherwise(F.concat(F.lit("c"), -F.col("node") - 1))
        .alias("node"),
        F.round("rank", 9).alias("rank"),
    )
    return track_cached(
        res, und, *getattr(out, "_padua_cached", ())
    )


# --- ext: count-min sketch heavy hitters (mergeable frequency summary) ------


def _cms_oracle(depth: int = 4, width: int = 512, topk: int = 20) -> str:
    from padua_spark.extensions.dedup import _affine_constants

    lines = ", ".join(
        f"({j}, CAST({a} AS BIGINT), CAST({b} AS BIGINT))"
        for j, (a, b) in enumerate(_affine_constants(depth))
    )
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '),
                            t -> t <> '')) AS token
  FROM documents
),
th AS (
  SELECT token, list_reduce(
    list_prepend(CAST(7 AS BIGINT),
      list_transform(list_filter(string_split(token, ''), c -> c <> ''),
                     c -> CAST(ord(c) AS BIGINT))),
    (acc, c) -> (acc * 131 + c) % 2147483647) AS h
  FROM toks
),
lines(j, a, b) AS (VALUES {lines}),
grid AS (
  SELECT l.j, (th.h * l.a + l.b) % 2147483647 % {width} AS bucket,
         count(*) AS cnt
  FROM th, lines l GROUP BY 1, 2
),
exact AS (SELECT token, count(*) AS n_exact FROM toks GROUP BY 1),
top AS (SELECT * FROM exact ORDER BY n_exact DESC, token LIMIT {topk}),
probe AS (
  SELECT t.token, t.n_exact, l.j,
         (h.h * l.a + l.b) % 2147483647 % {width} AS bucket
  FROM top t
  JOIN (SELECT DISTINCT token, h FROM th) h USING (token), lines l
)
SELECT p.token, p.n_exact,
       CAST(min(coalesce(g.cnt, 0)) AS BIGINT) AS cms_est
FROM probe p LEFT JOIN grid g ON p.j = g.j AND p.bucket = g.bucket
GROUP BY 1, 2
"""


@_q("cms_heavy_hitters", _cms_oracle())
def q_cms_heavy_hitters(spark, sf):
    """Count-min-sketch frequency estimates for the corpus's top-20
    tokens, next to their exact counts. The sketch's partial
    aggregation caps every map task's shuffle output at depth·width
    rows (corpus-size-independent — the scale story vs an exact
    vocabulary groupBy), and the deterministic affine hash family
    makes the ESTIMATE itself integer-exact across engines: the oracle
    rebuilds the same grid and must match est and exact bit-for-bit
    (with est ≥ exact, the CMS guarantee)."""
    from padua_spark.extensions.sketches import (
        cms_estimate,
        cms_token_sketch,
    )

    d = _t(spark, sf, "documents")
    sketch = cms_token_sketch(d, "text", depth=4, width=512)
    toks = d.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), " "), lambda x: x != ""
            )
        ).alias("token")
    )
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_exact"))
    top = exact.orderBy(
        F.col("n_exact").desc(), F.col("token").asc()
    ).limit(20)
    est = cms_estimate(
        sketch, top.select("token"), depth=4, width=512
    )
    return top.join(est, on="token").select("token", "n_exact", "cms_est")


# --- ext: KMV cross-corpus overlap (set-intersection sketch) ----------------


def _kmv_overlap_oracle(k: int) -> str:
    return f"""
WITH th AS (
  SELECT lang, unnest({_TOKEN_HASH_LIST_SQL}) AS h FROM documents
),
d AS (SELECT DISTINCT lang, h FROM th),
r AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM d
),
sk AS (
  SELECT lang, list_sort(list(h)) AS kmin FROM r WHERE rn <= {k}
  GROUP BY lang
),
p AS (
  SELECT a.lang AS g_a, b.lang AS g_b, a.kmin AS ka, b.kmin AS kb
  FROM sk a JOIN sk b ON a.lang < b.lang
),
u AS (
  SELECT g_a, g_b, ka, kb,
    list_sort(list_distinct(list_concat(ka, kb)))[1:{k}] AS ku
  FROM p
),
est AS (
  SELECT g_a, g_b,
    CASE WHEN len(ku) < {k} THEN CAST(len(ku) AS DOUBLE)
         ELSE {float(k - 1)!r} * 2147483647.0 / CAST(ku[{k}] AS DOUBLE)
    END AS est_union,
    CAST(len(list_intersect(list_intersect(ku, ka), kb)) AS DOUBLE)
      / CAST(len(ku) AS DOUBLE) AS est_jaccard
  FROM u
)
SELECT g_a, g_b, round(est_union, 6) AS est_union,
  round(est_jaccard, 6) AS est_jaccard,
  round(est_jaccard * est_union, 6) AS est_overlap
FROM est
"""


@_q("kmv_overlap", _kmv_overlap_oracle(64))
def q_kmv_overlap(spark, sf):
    from padua_spark.extensions.dedup import token_hashes
    from padua_spark.extensions.sketches import kmv_overlap

    d = _t(spark, sf, "documents")
    hashed = d.select(
        "lang", token_hashes(F.col("text")).alias("_th")
    ).select("lang", F.explode("_th").alias("_h"))
    out = kmv_overlap(hashed, "lang", "_h", k=64)
    return out.select(
        "g_a", "g_b",
        _r("est_union").alias("est_union"),
        _r("est_jaccard").alias("est_jaccard"),
        _r("est_overlap").alias("est_overlap"),
    )


# --- ext: incremental-ingestion dedup (novel docs vs the seen corpus) -------

_FP_SQL = r"""list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(
        list_filter(string_split(
          regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ''),
          c -> c <> ''),
        c -> CAST(ord(c) AS BIGINT))),
    (acc, c) -> (acc * 131 + c) % 2147483647)"""

_NOVEL_ORACLE = f"""
WITH batch AS (
  SELECT *, {_FP_SQL} AS fp FROM documents WHERE source <> 'src0'
),
canon AS (SELECT fp, min(doc_id) AS keep_id FROM batch GROUP BY fp),
seen AS (
  SELECT DISTINCT {_FP_SQL} AS fp FROM documents WHERE source = 'src0'
)
SELECT b.doc_id, b.lang, b.source, b.n_chars
FROM batch b
JOIN canon c ON b.fp = c.fp AND b.doc_id = c.keep_id
WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.fp = b.fp)
"""


@_q("novel_documents", _NOVEL_ORACLE)
def q_novel_documents(spark, sf):
    from padua_spark.extensions.dedup import novel_documents

    d = _t(spark, sf, "documents")
    out = novel_documents(
        d.where(F.col("source") != "src0"),
        d.where(F.col("source") == "src0"),
        "doc_id",
        "text",
    )
    return out.select("doc_id", "lang", "source", "n_chars")


# --- quantile normalization (Perseus-style matrix normalization) ------------


_QNORM_ORACLE = """
WITH lim AS (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
  FROM (
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
      row_number() OVER (PARTITION BY l_returnflag
        ORDER BY l_orderkey, l_linenumber, l_extendedprice) AS sel
    FROM lineitem
  ) WHERE sel <= 2000
),
r AS (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
    row_number() OVER (PARTITION BY l_returnflag
      ORDER BY CAST(l_extendedprice AS DOUBLE), l_orderkey, l_linenumber
    ) AS rk
  FROM lim
),
ref AS (
  SELECT rk, avg(CAST(l_extendedprice AS DOUBLE)) AS target
  FROM r GROUP BY rk
)
SELECT r.l_orderkey, r.l_linenumber, r.l_returnflag,
  round(ref.target, 6) AS value_qnorm
FROM r JOIN ref USING (rk)
"""


@_q("quantile_normalize", _QNORM_ORACLE)
def q_quantile_normalize(spark, sf):
    from pyspark.sql import Window

    li = _t(spark, sf, "lineitem")
    # equal-depth samples (the matrix contract): first 2000 rows per
    # returnflag — WindowGroupLimit. (l_orderkey, l_linenumber) is NOT
    # unique in the synthetic lineitem; l_extendedprice completes a
    # total order, without which the selection is nondeterministic
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    lim = (
        li.select(
            "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
        )
        .withColumn("_sel", F.row_number().over(w))
        .where(F.col("_sel") <= 2000)
        .drop("_sel")
    )
    out = norm.quantile_normalize(
        lim,
        ["l_returnflag"],
        "l_extendedprice",
        ["l_orderkey", "l_linenumber"],
        out_col="value_qnorm",
    )
    return out.select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        _r("value_qnorm").alias("value_qnorm"),
    )


# --- ext: per-group top-k token frequencies ---------------------------------


_TOKFREQ_GROUP_ORACLE = r"""
WITH tok AS (
  SELECT lang, t AS token
  FROM documents,
    unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                       x -> x <> '')) AS u(t)
),
c AS (SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2),
r AS (
  SELECT lang, token, n, row_number() OVER (
      PARTITION BY lang ORDER BY n DESC, token
    ) AS token_rank
  FROM c
)
SELECT lang, token, n, CAST(token_rank AS BIGINT) AS token_rank
FROM r WHERE token_rank <= 20
"""


@_q("token_frequencies_by_group", _TOKFREQ_GROUP_ORACLE)
def q_token_frequencies_by_group(spark, sf):
    from padua_spark.extensions.text import token_frequencies_by_group

    d = _t(spark, sf, "documents")
    out = token_frequencies_by_group(d, ["lang"], "text", k=20)
    return out.select(
        "lang", "token", "n",
        F.col("token_rank").cast("bigint").alias("token_rank"),
    )


# --- ext: int8 embedding quantization ---------------------------------------


_QUANT_ORACLE = """
WITH s AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings
),
m AS (
  SELECT vec_id, e,
    list_max(list_transform(e, x -> abs(x))) AS maxabs
  FROM s
),
q AS (
  SELECT vec_id, e, maxabs, maxabs / 127.0 AS scale,
    CASE WHEN maxabs = 0
      THEN list_transform(e, x -> CAST(0 AS BIGINT))
      ELSE list_transform(e,
             x -> CAST(round(x / (maxabs / 127.0)) AS BIGINT))
    END AS qv
  FROM m
)
SELECT vec_id,
  CAST(len(e) AS INT) AS n_dims,
  round(scale, 9) AS scale,
  CAST(list_sum(list_transform(qv, v -> abs(v))) AS BIGINT) AS q_l1,
  CAST(list_max(list_transform(qv, v -> abs(v))) AS BIGINT) AS q_max,
  round(list_sum(list_transform(generate_series(1, len(e)),
          i -> (e[i] - CAST(qv[i] AS DOUBLE) * scale)
               * (e[i] - CAST(qv[i] AS DOUBLE) * scale)))
        / CAST(len(e) AS DOUBLE), 6) AS mse
FROM q
"""


@_q("quantize_embeddings", _QUANT_ORACLE)
def q_quantize_embeddings(spark, sf):
    from padua_spark.extensions.similarity import quantize_int8

    e = _t(spark, sf, "embeddings")
    out = quantize_int8(e, "vec_id", "embedding")
    return out.select(
        "vec_id",
        "n_dims",
        F.round("scale", 9).alias("scale"),
        "q_l1",
        "q_max",
        _r("mse").alias("mse"),
    )


# --- ext: ANN top-k over the quantized vectors ------------------------------


_QUANT_TOPK_ORACLE = """
WITH s AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
m AS (
  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS maxabs
  FROM s
),
q AS (
  SELECT vec_id,
    CASE WHEN maxabs = 0
      THEN list_transform(e, x -> CAST(0 AS BIGINT))
      ELSE list_transform(e,
             x -> CAST(round(x / (maxabs / 127.0)) AS BIGINT))
    END AS qv
  FROM m
),
qq AS (SELECT qv AS query_qv FROM q WHERE vec_id = 0),
d AS (
  SELECT q.vec_id,
    CAST(list_sum(list_transform(generate_series(1, len(q.qv)),
        i -> q.qv[i] * qq.query_qv[i])) AS BIGINT) AS int_dot,
    list_sum(list_transform(q.qv, v -> v * v)) AS na,
    list_sum(list_transform(qq.query_qv, v -> v * v)) AS nb
  FROM q, qq
)
SELECT vec_id, int_dot,
  round(CAST(int_dot AS DOUBLE)
        / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6)
    AS approx_cos
FROM d
ORDER BY CAST(int_dot AS DOUBLE)
      / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC
      NULLS LAST,
  vec_id
LIMIT 10
"""


@_q("quantized_topk", _QUANT_TOPK_ORACLE)
def q_quantized_topk(spark, sf):
    from padua_spark.extensions.similarity import quantize_int8, quantized_topk

    e = _t(spark, sf, "embeddings")
    qz = quantize_int8(e, "vec_id", "embedding")
    out = quantized_topk(qz, "vec_id", query_id=0, k=10)
    return out.select(
        "vec_id", "int_dot", _r("approx_cos").alias("approx_cos")
    )


# --- ext: event-log analytics — strict-order funnel (single-shuffle
#     chained-window formulation; see operators/events.py) -------------------


_FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


def _funnel_oracle() -> str:
    case = " ".join(
        f"WHEN '{s}' THEN {i + 1}" for i, s in enumerate(_FUNNEL_STAGES)
    )
    ctes = ["c1 AS (SELECT u, tsu, stage, CASE WHEN stage = 1 THEN tsu END AS c1 FROM e)"]
    for i in range(2, len(_FUNNEL_STAGES) + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT *, CASE WHEN stage = {i}
    AND min(c{i - 1}) OVER (PARTITION BY u ORDER BY tsu
      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NOT NULL
    THEN tsu END AS c{i}
  FROM c{i - 1})"""
        )
    mins = ", ".join(
        f"min(c{i}) AS t{i}" for i in range(1, len(_FUNNEL_STAGES) + 1)
    )
    counts = ", ".join(
        f"count(t{i}) AS n{i}" for i in range(1, len(_FUNNEL_STAGES) + 1)
    )
    rows = "\n  UNION ALL\n".join(
        f"SELECT {i + 1} AS stage_idx, '{s}' AS stage, n{i + 1} AS n_users,"
        f" round(CAST(n{i + 1} AS DOUBLE) / n1, 6) AS conversion FROM n"
        for i, s in enumerate(_FUNNEL_STAGES)
    )
    stages_in = ", ".join(f"'{s}'" for s in _FUNNEL_STAGES)
    return f"""
WITH e AS (
  SELECT user_id AS u, epoch_us(ts) AS tsu,
    CASE event_type {case} END AS stage
  FROM events WHERE event_type IN ({stages_in})
),
{",".join(ctes)},
pu AS (SELECT u, {mins} FROM c{len(_FUNNEL_STAGES)} GROUP BY u),
n AS (SELECT {counts} FROM pu)
{rows}
"""


@_q("funnel", _funnel_oracle())
def q_funnel(spark, sf):
    from padua_spark.operators.events import funnel_conversion

    e = _t(spark, sf, "events").select(
        "user_id", _events_ts_us(spark, sf).alias("tsu"), "event_type"
    )
    return funnel_conversion(
        e, "user_id", "tsu", "event_type", _FUNNEL_STAGES
    )


# --- ext: event-log analytics — retention cohort triangle --------------------


@_q(
    "retention_cohorts",
    """
WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
f AS (
  SELECT user_id, tsu,
    min(tsu) OVER (PARTITION BY user_id) AS ft
  FROM e
),
c AS (
  SELECT DISTINCT user_id, ft // 86400000000 AS cohort,
    (tsu // 86400000000) - (ft // 86400000000) AS period_offset
  FROM f
)
SELECT cohort, period_offset, count(*) AS n_users
FROM c GROUP BY 1, 2
""",
)
def q_retention(spark, sf):
    from padua_spark.operators.events import retention_cohorts

    e = _t(spark, sf, "events").select(
        "user_id", _events_ts_us(spark, sf).alias("tsu")
    )
    out = retention_cohorts(e, "user_id", "tsu", period=86_400_000_000)
    return out.select(
        "cohort", F.col("offset").alias("period_offset"), "n_users"
    )


# --- ext: event-log analytics — exponentially time-decayed scoring ----------


@_q(
    "decayed_score",
    """
WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, value FROM events),
m AS (SELECT max(tsu) AS tref FROM e)
SELECT user_id,
  round(sum(value * power(2.0,
    -((m.tref - e.tsu) / 604800000000.0))), 6) AS decayed_sum,
  count(*) AS n_events
FROM e, m GROUP BY user_id
""",
)
def q_decayed_score(spark, sf):
    from padua_spark.operators.events import decayed_score

    e = _t(spark, sf, "events").select(
        "user_id", _events_ts_us(spark, sf).alias("tsu"), "value"
    )
    out = decayed_score(
        e, ["user_id"], "tsu", "value", half_life=604_800_000_000.0
    )
    return out.select(
        "user_id", _r("decayed_sum").alias("decayed_sum"), "n_events"
    )


# --- ext: Gopher/MassiveText rule battery (extensions/quality.py) -----------


@_q(
    "gopher_quality",
    r"""
WITH t AS (
  SELECT doc_id, text,
    regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
    string_split_regex(text, '\n') AS lines
  FROM documents
),
s AS (
  SELECT doc_id,
    len(toks) AS n_words,
    CASE WHEN len(toks) > 0 THEN
      CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        / len(toks) END AS mean_word_len,
    CASE WHEN len(toks) > 0 THEN
      CAST(len(string_split_regex(text, '#')) - 1
         + len(string_split_regex(text, '\.\.\.')) - 1
         + len(string_split_regex(text, '…')) - 1 AS DOUBLE)
        / len(toks) END AS symbol_ratio,
    CAST(len(list_filter(lines,
        ln -> regexp_matches(trim(ln), '^[-*•]'))) AS DOUBLE)
      / len(lines) AS bullet_frac,
    CAST(len(list_filter(lines,
        ln -> regexp_matches(trim(ln), '(\.\.\.|…)$'))) AS DOUBLE)
      / len(lines) AS ellipsis_frac,
    CASE WHEN len(toks) > 0 THEN
      CAST(len(list_filter(toks,
          x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
        / len(toks) END AS alpha_frac,
    len(list_filter(toks,
        x -> x IN ('the','a','and','of','to','in','is'))) AS stopword_hits
  FROM t
),
r AS (
  SELECT *,
    CAST(n_words >= 50 AND n_words <= 100000 AS INT) AS rule_word_count,
    CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INT)
      AS rule_mean_word_len,
    CAST(symbol_ratio <= 0.1 AS INT) AS rule_symbol_ratio,
    CAST(bullet_frac <= 0.9 AS INT) AS rule_bullet,
    CAST(ellipsis_frac <= 0.3 AS INT) AS rule_ellipsis,
    CAST(alpha_frac >= 0.8 AS INT) AS rule_alpha,
    CAST(stopword_hits >= 2 AS INT) AS rule_stopwords
  FROM s
)
SELECT doc_id, n_words, round(mean_word_len, 6) AS mean_word_len,
  round(symbol_ratio, 6) AS symbol_ratio,
  round(bullet_frac, 6) AS bullet_frac,
  round(ellipsis_frac, 6) AS ellipsis_frac,
  round(alpha_frac, 6) AS alpha_frac, stopword_hits,
  rule_word_count, rule_mean_word_len, rule_symbol_ratio, rule_bullet,
  rule_ellipsis, rule_alpha, rule_stopwords,
  CAST(coalesce(rule_word_count, 0) * coalesce(rule_mean_word_len, 0)
    * coalesce(rule_symbol_ratio, 0) * coalesce(rule_bullet, 0)
    * coalesce(rule_ellipsis, 0) * coalesce(rule_alpha, 0)
    * coalesce(rule_stopwords, 0) AS INT) AS quality_pass
FROM r
""",
)
def q_gopher_quality(spark, sf):
    from padua_spark.extensions.quality import gopher_rules

    d = _t(spark, sf, "documents")
    out = gopher_rules(d, "text")
    sel = [F.col("doc_id"), F.col("n_words").cast("long").alias("n_words")]
    for c in ("mean_word_len", "symbol_ratio", "bullet_frac",
              "ellipsis_frac", "alpha_frac"):
        sel.append(_r(c).alias(c))
    sel.append(F.col("stopword_hits").cast("long").alias("stopword_hits"))
    for c in ("rule_word_count", "rule_mean_word_len", "rule_symbol_ratio",
              "rule_bullet", "rule_ellipsis", "rule_alpha",
              "rule_stopwords", "quality_pass"):
        sel.append(F.col(c).cast("int").alias(c))
    return out.select(*sel)


# --- ext: fastText-style hashed linear classifier score ---------------------


_QUALITY_CLASSIFIER_ORACLE = """
WITH th AS (
  SELECT doc_id,
    list_transform(string_split(lower(text), ' '), w -> list_reduce(
        list_prepend(CAST(7 AS BIGINT),
          list_transform(list_filter(string_split(w, ''), c -> c <> ''),
            c -> CAST(ord(c) AS BIGINT))),
        (a, c) -> (a * 131 + c) % 2147483647)) AS th
  FROM documents
),
s AS (
  SELECT doc_id, len(th) AS n_tokens,
    CAST(list_sum(list_transform(th,
        h -> ((h % 1024) * 2654435761) % 2147483648)) AS BIGINT)
      AS weight_sum
  FROM th
),
g AS (
  SELECT doc_id, n_tokens, weight_sum,
    2.0 * (CAST(weight_sum AS DOUBLE) / n_tokens) / 2147483648.0 - 1.0
      AS margin
  FROM s
)
SELECT doc_id, n_tokens, weight_sum, round(margin, 6) AS margin,
  round(1.0 / (1.0 + exp(-margin)), 6) AS prob
FROM g
"""


@_q("quality_classifier", _QUALITY_CLASSIFIER_ORACLE)
def q_quality_classifier(spark, sf):
    from padua_spark.extensions.quality import hashed_classifier_score

    d = _t(spark, sf, "documents")
    out = hashed_classifier_score(d, "text", n_buckets=1024)
    return out.select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
        "weight_sum",
        _r("margin").alias("margin"), _r("prob").alias("prob"),
    )


# --- ext: dedup KEEP step — canonical doc per duplicate cluster -------------


def _dedup_canonical_oracle() -> str:
    minhash_sql = _minhash_oracle("documents")
    return rf"""
WITH RECURSIVE cand AS (
  SELECT id_a, id_b FROM ({minhash_sql}) mh WHERE est_jaccard >= 0.5
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM cand
  UNION
  SELECT id_b AS s, id_a AS d FROM cand
),
reach(node, r) AS (
  SELECT s, s FROM edges
  UNION
  SELECT reach.node, e.d FROM reach JOIN edges e ON reach.r = e.s
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
lab AS (
  SELECT d.doc_id, d.n_chars,
    coalesce(c.component, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
),
rk AS (
  SELECT cluster_id, doc_id, n_chars,
    row_number() OVER (PARTITION BY cluster_id
      ORDER BY n_chars DESC, doc_id ASC) AS rn,
    count(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM lab
)
SELECT cluster_id, doc_id AS canonical_id, n_chars AS best_quality,
  cluster_size
FROM rk WHERE rn = 1
"""


@_q("dedup_canonical", _dedup_canonical_oracle())
def q_dedup_canonical(spark, sf):
    from padua_spark.extensions.dedup import minhash_lsh_candidates
    from padua_spark.extensions.graph import keep_best_per_cluster

    d = _t(spark, sf, "documents")
    pairs = minhash_lsh_candidates(
        d, "doc_id", "text", k_shingle=3, num_hashes=32, bands=8,
        portable_keys=True,
    ).where(F.col("est_jaccard") >= 0.5).select("id_a", "id_b")
    return keep_best_per_cluster(d, "doc_id", pairs, "n_chars")


# --- ext: Johnson–Lindenstrauss random projection (hash-derived ±1
#     matrix, recomputed in-expression — similarity.py) ---------------------


def _jl_oracle() -> str:
    # the xorshift-multiply sign hash, expanded textually (lambda
    # bodies get no CSE in either engine, so the repeats are just long,
    # not wrong) — mirrors similarity.random_projection bit-for-bit
    h = "(i * 1048576 + j + 40503)"
    for _ in range(2):
        h = f"((xor({h} >> 16, {h}) * 73244475) % 2147483648)"
    h = f"xor({h} >> 16, {h})"
    return f"""
WITH s AS (
  SELECT vec_id, list_transform(embedding,
    x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
p AS (
  SELECT vec_id, len(e) AS in_dims,
    list_transform(range(1, 17), i ->
      list_reduce(
        list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(e, (x, j) ->
            CASE WHEN {h} % 2 = 0 THEN x ELSE -x END)),
        (a, b) -> a + b) / sqrt(16.0)) AS proj
  FROM s
)
SELECT vec_id, in_dims,
  round(proj[1], 6) AS proj_1,
  round(proj[2], 6) AS proj_2,
  round(proj[3], 6) AS proj_3,
  round(proj[4], 6) AS proj_4,
  round(sqrt(list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(proj, x -> x * x)),
    (a, b) -> a + b)), 6) AS l2_out
FROM p
"""


@_q("random_projection", _jl_oracle())
def q_random_projection(spark, sf):
    from padua_spark.extensions.similarity import (
        l2_norm,
        random_projection,
    )

    e = _t(spark, sf, "embeddings")
    out = random_projection(e, "vec_id", "embedding", out_dim=16)
    return out.select(
        "vec_id",
        F.col("in_dims").cast("long").alias("in_dims"),
        _r(F.element_at("proj", 1)).alias("proj_1"),
        _r(F.element_at("proj", 2)).alias("proj_2"),
        _r(F.element_at("proj", 3)).alias("proj_3"),
        _r(F.element_at("proj", 4)).alias("proj_4"),
        _r(l2_norm(F.col("proj"))).alias("l2_out"),
    )


# --- relational suite: multi-join analytics the long-format engine feeds
#     (broadcast dims, window decorrelation, anti join, rollup — §2.4/§2.5
#     Spark mappings exercised as full plans). Money sums are exact
#     integer CENTS (`round(x*100)::bigint`): per-row conversion is
#     bit-identical on any engine, and integer sums are order-free, so
#     the value hash can never be flipped by float summation order. ----------


def _cents(col):
    return F.round(col * F.lit(100)).cast("bigint")


@_q(
    "shipping_priority",
    """
WITH c AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
o AS (
  SELECT o_orderkey, o_orderdate, o_orderpriority
  FROM orders JOIN c ON o_custkey = c_custkey
),
r AS (
  SELECT o.o_orderkey,
         epoch_us(o.o_orderdate) AS orderdate_epoch,
         o.o_orderpriority,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem JOIN o ON l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3
)
SELECT * FROM r
ORDER BY revenue_cents DESC, o_orderkey
LIMIT 10
""",
)
def q_shipping_priority(spark, sf):
    """TPC-H Q3 shape: selective dim filter broadcast into the orders
    scan, revenue rollup per order, global top-10 (TakeOrderedAndProject
    — a per-partition heap, never a full sort, at any scale)."""
    c = (
        _t(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        _t(spark, sf, "orders")
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_epoch"
            ),
            "o_orderpriority",
        )
    )
    li = _t(spark, sf, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "orderdate_epoch", "o_orderpriority")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_cents")
        )
        .orderBy(F.col("revenue_cents").desc(), "o_orderkey")
        .limit(10)
    )


@_q(
    "local_supplier_volume",
    """
SELECT r_name, n_name,
       count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
             AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1, 2
""",
)
def q_local_supplier_volume(spark, sf):
    """TPC-H Q5 shape: the fact table joins four dims; supplier /
    nation / region broadcast (map-side), customer join carries the
    local-supplier predicate. One shuffle for the final rollup."""
    li = _t(spark, sf, "lineitem")
    su = _t(spark, sf, "supplier")
    od = _t(spark, sf, "orders")
    cu = _t(spark, sf, "customer")
    na = _t(spark, sf, "nation")
    re = _t(spark, sf, "region")
    j = (
        li.join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cu,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue_cents"),
    )


@_q(
    "rollup_revenue",
    """
SELECT r_name, n_name,
       count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def q_rollup_revenue(spark, sf):
    """Hierarchical subtotals (region → nation → grand total) in ONE
    aggregation pass — ROLLUP expands grouping sets inside the same
    hash aggregate, so the fact table is read and shuffled once, not
    once per level."""
    li = _t(spark, sf, "lineitem")
    su = _t(spark, sf, "supplier")
    na = _t(spark, sf, "nation")
    re = _t(spark, sf, "region")
    j = (
        li.join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue_cents"),
    )


@_q(
    "running_balance",
    """
SELECT o_custkey, o_orderkey,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS balance_cents
FROM orders
""",
)
def q_running_balance(spark, sf):
    """Per-customer running spend: one shuffle on the window key, then
    a per-partition sort — cumulative INTEGER sum so the result is
    order-exact on any engine. The padua analogue is the cumulative
    intensity used in rank/abundance plots (SURVEY §2.11 O3)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(_cents(F.col("o_totalprice"))).over(w).alias("balance_cents"),
    )


@_q(
    "event_lag_gaps",
    """
WITH g AS (
  SELECT event_type,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
  FROM events
)
SELECT event_type, count(gap_us) AS n_gaps,
       round((CAST(sum(gap_us) AS DOUBLE) / count(gap_us)) / 1e6, 6)
         AS avg_gap_s
FROM g WHERE gap_us IS NOT NULL GROUP BY event_type
""",
)
def q_event_lag_gaps(spark, sf):
    """Inter-event arrival gaps via lag(): exact integer µs sums so the
    single final division is the only float op (bit-identical across
    engines)."""
    from pyspark.sql import Window

    e = _t(spark, sf, "events").select(
        "user_id", "event_id", "event_type",
        _events_ts_us(spark, sf).alias("tsu"),
    )
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    g = e.select(
        "event_type", (F.col("tsu") - F.lag("tsu").over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return g.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(
            (F.sum("gap_us").cast("double") / F.count("gap_us"))
            / F.lit(1e6),
            6,
        ).alias("avg_gap_s"),
    )


@_q(
    "order_percentiles",
    """
SELECT o_orderpriority,
  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
  round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
  count(*) AS n
FROM orders GROUP BY o_orderpriority
""",
)
def q_order_percentiles(spark, sf):
    """Exact linearly-interpolated quantiles per group via the
    relational sort path (normalization.group_percentiles — whole-stage
    codegen, not F.percentile's object-buffering aggregate; SURVEY
    §2.5 A1 generalized). At 100 TB swap exact for
    ``percentile_approx`` (mergeable sketch) — same plan shape."""
    o = _t(spark, sf, "orders")
    pct = norm.group_percentiles(
        o,
        ["o_orderpriority"],
        "o_totalprice",
        {"_p25": 0.25, "_p50": 0.50, "_p75": 0.75},
    )
    counts = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    return pct.join(counts, on="o_orderpriority").select(
        "o_orderpriority",
        _r(F.col("_p25"), 4).alias("p25"),
        _r(F.col("_p50"), 4).alias("p50"),
        _r(F.col("_p75"), 4).alias("p75"),
        "n",
    )


@_q(
    "above_avg_orders",
    """
WITH t AS (
  SELECT o_orderstatus, o_totalprice,
         avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
  FROM orders
)
SELECT o_orderstatus,
       count(*) AS n_above,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents
FROM t WHERE o_totalprice > cust_avg
GROUP BY o_orderstatus
""",
)
def q_above_avg_orders(spark, sf):
    """Correlated-subquery shape ("orders above the customer's own
    average"), decorrelated into a window average — one shuffle on the
    correlation key instead of a per-row subquery."""
    from pyspark.sql import Window

    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey")
    t = o.select(
        "o_orderstatus",
        "o_totalprice",
        F.avg("o_totalprice").over(w).alias("cust_avg"),
    ).where(F.col("o_totalprice") > F.col("cust_avg"))
    return t.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_above"),
        F.sum(_cents(F.col("o_totalprice"))).alias("spend_cents"),
    )


@_q(
    "dormant_customers",
    """
SELECT c_mktsegment, count(*) AS n_dormant, min(c_custkey) AS first_custkey
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2000-01-01'
)
GROUP BY c_mktsegment
""",
)
def q_dormant_customers(spark, sf):
    """Anti join (NOT EXISTS): customers with no order since 2000.
    The date predicate pushes into the orders scan before the join;
    left_anti never materializes matched rows."""
    c = _t(spark, sf, "customer")
    recent = (
        _t(spark, sf, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_dormant"),
            F.min("c_custkey").alias("first_custkey"),
        )
    )


@_q(
    "sliding_window_agg",
    """
WITH e AS (SELECT epoch_us(ts) AS tu, event_type, value FROM events),
k AS (SELECT * FROM (VALUES (0), (1)) t(k)),
w AS (
  SELECT ((tu // 1800000000) - k.k) * 1800000000 AS ws, event_type, value
  FROM e CROSS JOIN k
)
SELECT ws AS window_start_epoch, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM w GROUP BY 1, 2
""",
)
def q_sliding_window(spark, sf):
    """Overlapping 1h windows sliding every 30min (each event in
    exactly 2 windows). The oracle derives the same epoch-aligned
    window grid arithmetically."""
    from padua_spark.streaming import sliding_window_agg

    e = _t(spark, sf, "events")
    out = sliding_window_agg(
        e,
        _events_event_time(spark, sf),
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            _r(F.sum("value"), 4).alias("sum_value"),
        ],
        window_duration="1 hour",
        slide_duration="30 minutes",
    )
    return out.select(
        F.unix_micros(F.col("window_start")).alias("window_start_epoch"),
        "event_type",
        "n_events",
        "sum_value",
    )


# --- ext: SemDeDup semantic pruning (Abbas et al. 2023) --------------------


_SEMDEDUP_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cell, v AS c
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)
),
a AS (
  SELECT e.vec_id, e.v, s.cell,
    list_dot_product(e.v, s.c)
      / (sqrt(list_dot_product(e.v, e.v))
         * sqrt(list_dot_product(s.c, s.c))) AS cosc
  FROM e CROSS JOIN seeds s
  QUALIFY row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY cosc DESC, s.cell ASC) = 1
),
ex AS (
  SELECT cell, vec_id AS ex_id, v AS ex_v
  FROM a
  QUALIFY row_number() OVER (PARTITION BY cell
                             ORDER BY cosc DESC, vec_id ASC) = 1
)
SELECT a.vec_id, a.cell,
  round(a.cosc, 6) AS cos_centroid,
  round(list_dot_product(a.v, ex.ex_v)
        / (sqrt(list_dot_product(a.v, a.v))
           * sqrt(list_dot_product(ex.ex_v, ex.ex_v))), 6)
    AS cos_exemplar,
  (a.vec_id = ex.ex_id
   OR round(list_dot_product(a.v, ex.ex_v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(ex.ex_v, ex.ex_v))), 6) < 0.35)
    AS keep
FROM a JOIN ex ON a.cell = ex.cell
"""


@_q("semdedup", _SEMDEDUP_ORACLE)
def q_semdedup(spark, sf):
    from padua_spark.extensions.dedup import semdedup_prune

    emb = _t(spark, sf, "embeddings")
    out = semdedup_prune(
        emb, "vec_id", "embedding", n_cells=16, threshold=0.35
    )
    return out.withColumn("cell", F.col("cell").cast("long"))


@_q(
    "priority_customers",
    """
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS balance_cents
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c_mktsegment
""",
)
def q_priority_customers(spark, sf):
    """EXISTS as a left_semi join: the orders side is filtered (pushed
    predicate) and deduplicated implicitly by the semi join — matched
    customers emit once regardless of how many urgent orders they
    have, and order payload columns never materialize."""
    c = _t(spark, sf, "customer")
    urgent = (
        _t(spark, sf, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_cents(F.col("c_acctbal"))).alias("balance_cents"),
        )
    )


@_q(
    "grouping_sets_mix",
    """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def q_grouping_sets_mix(spark, sf):
    """Arbitrary GROUPING SETS (not a cube/rollup prefix): per-status,
    per-priority, and grand-total rows from ONE pass over orders — the
    Expand node replicates rows per set inside the same aggregate."""
    o = _t(spark, sf, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_cents(F.col("o_totalprice"))).alias("spend_cents"),
    )


@_q(
    "event_calendar_profile",
    """
SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hod,
       count(*) AS n,
       round(CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
             / count(*) / 1e6, 6) AS avg_value
FROM events
GROUP BY 1, 2
""",
)
def q_event_calendar_profile(spark, sf):
    """Calendar seasonality profile: (day-of-week, hour-of-day) counts
    and exact-integer mean values. Spark's dayofweek is 1=Sunday;
    DuckDB's is 0=Sunday (the oracle adds 1); the UTC session pin
    makes hour() agree on the NTZ timestamps."""
    e = _t(spark, sf, "events").select(
        _events_event_time(spark, sf).alias("et"), "value"
    )
    return e.groupBy(
        F.dayofweek("et").alias("dow"),
        F.hour("et").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.round(F.col("value") * 1000000).cast("bigint")).cast(
                "double"
            )
            / F.count(F.lit(1))
            / F.lit(1e6),
            6,
        ).alias("avg_value"),
    )


@_q(
    "monthly_revenue_growth",
    """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
  FROM orders GROUP BY 1
)
SELECT epoch_us(month) AS month_epoch, rev_c,
       rev_c - lag(rev_c) OVER (ORDER BY month) AS delta_c,
       round(CAST(rev_c AS DOUBLE)
             / CAST(lag(rev_c) OVER (ORDER BY month) AS DOUBLE) - 1, 6)
         AS growth
FROM m
""",
)
def q_monthly_revenue_growth(spark, sf):
    """Month-over-month growth: aggregate to month grain first (tiny),
    then lag over the aggregate — the window never touches the fact
    table. Integer cent deltas; growth is one division."""
    from pyspark.sql import Window

    o = _t(spark, sf, "orders")
    m = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.sum(_cents(F.col("o_totalprice"))).alias("rev_c"))
    w = Window.orderBy("month")
    prev = F.lag("rev_c").over(w)
    return m.select(
        F.unix_micros(F.col("month").cast("timestamp")).alias(
            "month_epoch"
        ),
        "rev_c",
        (F.col("rev_c") - prev).alias("delta_c"),
        F.round(
            F.col("rev_c").cast("double") / prev.cast("double") - 1, 6
        ).alias("growth"),
    )


@_q(
    "chi2_independence",
    """
WITH o AS (
  SELECT event_type, user_id % 4 AS cohort, count(*) AS obs
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, cohort, obs,
    sum(obs) OVER (PARTITION BY event_type) AS row_tot,
    sum(obs) OVER (PARTITION BY cohort) AS col_tot,
    sum(obs) OVER () AS n
  FROM o
),
t AS (
  SELECT obs,
    CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE) AS e,
    row_tot, col_tot
  FROM m
)
SELECT
  round(sum((CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) - e) / e),
        6) AS chi2,
  (count(DISTINCT row_tot) - 1) * (count(DISTINCT col_tot) - 1)
    AS dof_upper
FROM t
""",
)
def q_chi2_independence(spark, sf):
    """Chi-square independence statistic over the (event_type, cohort)
    contingency table: observed counts stay integer; expected counts
    and the statistic use one fixed-order float expression per cell.
    dof reported as (rows-1)(cols-1) via distinct marginals (an upper
    bound when marginal totals collide — exact here)."""
    from pyspark.sql import Window

    e = _t(spark, sf, "events")
    o = e.groupBy(
        "event_type", (F.col("user_id") % 4).alias("cohort")
    ).agg(F.count(F.lit(1)).alias("obs"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("cohort")
    wn = Window.partitionBy()
    m = o.select(
        "obs",
        F.sum("obs").over(wr).alias("row_tot"),
        F.sum("obs").over(wc).alias("col_tot"),
        F.sum("obs").over(wn).alias("n"),
    )
    exp_ = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col(
        "n"
    ).cast("double")
    obs_d = F.col("obs").cast("double")
    term = (obs_d - exp_) * (obs_d - exp_) / exp_
    return m.agg(
        F.round(F.sum(term), 6).alias("chi2"),
        (
            (F.count_distinct(F.col("row_tot")) - 1)
            * (F.count_distinct(F.col("col_tot")) - 1)
        ).alias("dof_upper"),
    )


@_q(
    "mannwhitney_u",
    """
WITH per AS (
  SELECT value AS v,
    count(*) FILTER (event_type = 'click') AS ca,
    count(*) FILTER (event_type = 'purchase') AS cb
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
  GROUP BY value
),
stepped AS (
  SELECT ca, cb, ca + cb AS cnt,
    sum(ca + cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      - (ca + cb) AS before
  FROM per
),
agg AS (
  SELECT CAST(sum(ca * (2 * before + cnt + 1)) AS BIGINT) AS r2a,
         CAST(sum(cb * (2 * before + cnt + 1)) AS BIGINT) AS r2b,
         CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b
  FROM stepped
)
SELECT r2a - n_a * (n_a + 1) AS u2_a,
       r2b - n_b * (n_b + 1) AS u2_b,
       n_a, n_b
FROM agg
""",
)
def q_mannwhitney_u(spark, sf):
    """Mann–Whitney rank-sum U (stats.mannwhitney_u_stat): doubled
    midranks keep every quantity integer — hash-exact nonparametric
    test, no float ranks."""
    from padua_spark.operators.stats import mannwhitney_u_stat

    e = _t(spark, sf, "events")
    return mannwhitney_u_stat(
        e, "event_type", "value", "click", "purchase"
    )


@_q(
    "top_decile_share",
    """
WITH spend AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT cents,
    row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk,
    count(*) OVER () AS n
  FROM spend
)
SELECT max(n) AS n_customers,
  CAST(ceil(max(n) / 10.0) AS BIGINT) AS n_top,
  CAST(sum(CASE WHEN rk <= ceil(n / 10.0) THEN cents ELSE 0 END)
       AS BIGINT) AS top_cents,
  CAST(sum(cents) AS BIGINT) AS total_cents,
  round(CAST(sum(CASE WHEN rk <= ceil(n / 10.0) THEN cents ELSE 0 END)
             AS DOUBLE) / CAST(sum(cents) AS DOUBLE), 6) AS top_share
FROM ranked
""",
)
def q_top_decile_share(spark, sf):
    """Revenue concentration: the spend share of the top-decile
    customers. Integer cents throughout; the only float op is the
    final share division. Deterministic decile membership (ties by
    custkey)."""
    from pyspark.sql import Window

    spend = (
        _t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("cents"))
    )
    w = Window.orderBy(F.col("cents").desc(), F.col("o_custkey"))
    wn = Window.partitionBy()
    ranked = spend.select(
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    top = F.sum(
        F.when(
            F.col("rk") <= F.ceil(F.col("n") / F.lit(10.0)), F.col("cents")
        ).otherwise(F.lit(0))
    )
    return ranked.agg(
        F.max("n").alias("n_customers"),
        F.ceil(F.max("n") / F.lit(10.0)).cast("bigint").alias("n_top"),
        top.alias("top_cents"),
        F.sum("cents").alias("total_cents"),
        F.round(
            top.cast("double") / F.sum("cents").cast("double"), 6
        ).alias("top_share"),
    )


@_q(
    "value_anomaly_counts",
    """
WITH m AS (
  SELECT event_type, value,
    avg(value) OVER (PARTITION BY event_type) AS mu,
    stddev_samp(value) OVER (PARTITION BY event_type) AS sigma
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, count(*) AS n,
  count(*) FILTER (abs((value - mu) / sigma) > 3.0) AS n_outliers,
  round(max(abs((value - mu) / sigma)), 6) AS max_abs_z
FROM m GROUP BY event_type
""",
)
def q_value_anomaly_counts(spark, sf):
    """Z-score anomaly screen per group: one window pass for the
    moments, one aggregation for the flags — the statistical
    outlier-detection twin of winsorize's percentile clipping."""
    from pyspark.sql import Window

    e = _t(spark, sf, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("event_type")
    m = e.select(
        "event_type",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sigma"),
    )
    z = F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
    return m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(z > 3.0, 1)).alias("n_outliers"),
        _r(F.max(z)).alias("max_abs_z"),
    )


@_q(
    "mannwhitney_z",
    """
WITH per AS (
  SELECT value AS v,
    count(*) FILTER (event_type = 'click') AS ca,
    count(*) FILTER (event_type = 'purchase') AS cb
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
  GROUP BY value
),
stepped AS (
  SELECT ca, cb, ca + cb AS cnt,
    sum(ca + cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      - (ca + cb) AS before
  FROM per
),
agg AS (
  SELECT CAST(sum(ca * (2 * before + cnt + 1)) AS BIGINT) AS r2a,
         CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
         CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term
  FROM stepped
),
u AS (
  SELECT r2a - n_a * (n_a + 1) AS u2_a, n_a, n_b, tie_term,
    (CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0
     - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
    / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
           * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
              - CAST(tie_term AS DOUBLE)
                / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                   * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                      - 1.0)))) AS z
  FROM agg
),
e AS (
  SELECT *, abs(z) / sqrt(2.0) AS x,
         1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
  FROM u
)
SELECT u2_a, n_a, n_b, tie_term, round(z, 6) AS z,
  round((0.254829592 * t + -0.284496736 * t * t
         + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
         + 1.061405429 * t * t * t * t * t) * exp(-x * x), 6)
    AS p_normal
FROM e
""",
)
def q_mannwhitney_z(spark, sf):
    """Mann–Whitney with the tie-corrected normal approximation
    (stats.mannwhitney_z_stats): exact integer U and tie sums, one
    closed-form z, p via the A&S erfc polynomial — identical
    expressions on both engines, so the approximation choice can't
    split the hash."""
    from padua_spark.operators.stats import mannwhitney_z_stats

    e = _t(spark, sf, "events")
    out = mannwhitney_z_stats(
        e, "event_type", "value", "click", "purchase"
    )
    return out.select(
        "u2_a", "n_a", "n_b", "tie_term",
        _r("z").alias("z"), _r("p_normal").alias("p_normal"),
    )


@_q(
    "ks_test_stats",
    """
WITH per AS (
  SELECT value AS v,
    count(*) FILTER (event_type = 'click') AS ca,
    count(*) FILTER (event_type = 'purchase') AS cb
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
  GROUP BY value
),
stepped AS (
  SELECT
    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fa,
    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fb,
    CAST(sum(ca) OVER () AS BIGINT) AS na,
    CAST(sum(cb) OVER () AS BIGINT) AS nb
  FROM per
)
SELECT round(max(abs(CAST(fa AS DOUBLE) / CAST(na AS DOUBLE)
                     - CAST(fb AS DOUBLE) / CAST(nb AS DOUBLE))), 6)
         AS d_stat,
       max(na) AS n_a, max(nb) AS n_b
FROM stepped
""",
)
def q_ks_test(spark, sf):
    """Two-sample Kolmogorov–Smirnov D between event-value
    distributions (stats.ks_2samp_stat): exact integer ECDF steps, one
    division per evaluation point, sup as a plain max."""
    from padua_spark.operators.stats import ks_2samp_stat

    e = _t(spark, sf, "events")
    out = ks_2samp_stat(e, "event_type", "value", "click", "purchase")
    return out.select(
        _r("d_stat").alias("d_stat"), "n_a", "n_b"
    )


@_q(
    "user_event_type_sets",
    """
SELECT user_id % 50 AS cohort,
       count(DISTINCT event_type) AS n_types,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type)
         AS type_set
FROM events GROUP BY 1
""",
)
def q_user_event_type_sets(spark, sf):
    """Set aggregation with a deterministic serialization:
    collect_set → array_sort → concat_ws gives an order-stable string
    under any partitioning (a raw collect_list would be
    partition-order nondeterministic — unusable in a hash gate)."""
    e = _t(spark, sf, "events")
    return e.groupBy((F.col("user_id") % 50).alias("cohort")).agg(
        F.count_distinct("event_type").alias("n_types"),
        F.concat_ws(
            ",", F.array_sort(F.collect_set("event_type"))
        ).alias("type_set"),
    )


@_q(
    "ks_test_pvalues",
    """
WITH per AS (
  SELECT value AS v,
    count(*) FILTER (event_type = 'click') AS ca,
    count(*) FILTER (event_type = 'purchase') AS cb
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
  GROUP BY value
),
stepped AS (
  SELECT
    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fa,
    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fb,
    CAST(sum(ca) OVER () AS BIGINT) AS na,
    CAST(sum(cb) OVER () AS BIGINT) AS nb
  FROM per
),
d AS (
  SELECT max(abs(CAST(fa AS DOUBLE) / CAST(na AS DOUBLE)
                 - CAST(fb AS DOUBLE) / CAST(nb AS DOUBLE))) AS d_stat,
         max(na) AS n_a, max(nb) AS n_b
  FROM stepped
),
lam AS (
  SELECT d_stat, n_a, n_b,
    (sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
          / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) + 0.12
     + 0.11 / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                   / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))))
    * d_stat AS l
  FROM d
)
SELECT round(d_stat, 6) AS d_stat, n_a, n_b,
  round(least(1.0, greatest(0.0,
    2.0 * list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(generate_series(1, 100), k ->
          CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END
          * exp(-2.0 * k * k * l * l))),
      (acc, t) -> acc + t))), 6) AS p_value
FROM lam
""",
)
def q_ks_test_pvalues(spark, sf):
    """KS with the asymptotic p-value as a NATIVE expression (no UDF):
    the Kolmogorov series 2·Σ (−1)^{k−1} e^{−2k²λ²} at the Numerical
    Recipes effective-n correction λ = (√n_e + 0.12 + 0.11/√n_e)·D,
    folded in the same sequential order on both engines (terms
    underflow to exactly 0 past ~k·λ > 6 in both)."""
    from padua_spark.operators.stats import ks_2samp_stat

    e = _t(spark, sf, "events")
    out = ks_2samp_stat(e, "event_type", "value", "click", "purchase")
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    en = F.sqrt(na * nb / (na + nb))
    lam = (en + F.lit(0.12) + F.lit(0.11) / en) * F.col("d_stat")
    series = F.aggregate(
        F.sequence(F.lit(1), F.lit(100)),
        F.lit(0.0),
        lambda acc, k: acc
        + F.when(k % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.exp(F.lit(-2.0) * k * k * lam * lam),
    )
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), 2.0 * series))
    # stage p BEFORE aliasing the rounded d_stat: putting both in one
    # select makes Catalyst resolve p's d_stat reference against the
    # same-named ROUNDED output column (measured: p flips at 1e-5)
    staged = out.withColumn("_p_raw", p)
    return staged.select(
        _r("d_stat").alias("d_stat"), "n_a", "n_b",
        _r(F.col("_p_raw")).alias("p_value"),
    )


@_q(
    "source_token_divergence",
    r"""
WITH tok AS (
  SELECT source AS grp,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents
),
per AS (
  SELECT grp, token, count(*) AS n_st FROM tok
  WHERE token <> '' GROUP BY 1, 2
),
corpus AS (SELECT token, sum(n_st) AS n_t FROM per GROUP BY 1),
top AS (SELECT token, n_t FROM corpus ORDER BY n_t DESC, token LIMIT 100),
totals AS (SELECT grp, CAST(sum(n_st) AS BIGINT) AS n_s
           FROM per GROUP BY 1),
grand AS (SELECT sum(n_st) AS n_total FROM per)
SELECT grp AS source,
  round(sum((CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE))
            * ln((CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                 / (CAST(n_t AS DOUBLE) / CAST(n_total AS DOUBLE)))), 6)
    AS kl_divergence,
  max(n_s) AS n_tokens
FROM per JOIN top USING (token) JOIN totals USING (grp)
CROSS JOIN grand
GROUP BY grp
""",
)
def q_source_token_divergence(spark, sf):
    """Domain-drift QA: KL(source ‖ corpus) over the corpus top-100
    token distribution (extensions.text.source_token_divergence) —
    flags the slice whose language deviates before training on it."""
    from padua_spark.extensions.text import source_token_divergence

    d = _t(spark, sf, "documents")
    out = source_token_divergence(d, "source", "text", top_n=100)
    return out.select(
        "source", _r("kl_divergence").alias("kl_divergence"), "n_tokens"
    )


@_q(
    "referential_audit",
    """
SELECT 'lineitem->orders' AS relationship,
       count(*) FILTER (o_orderkey IS NULL) AS n_orphans,
       count(*) AS n_rows
FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
UNION ALL
SELECT 'orders->customer',
       count(*) FILTER (c_custkey IS NULL), count(*)
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
UNION ALL
SELECT 'lineitem->part',
       count(*) FILTER (p_partkey IS NULL), count(*)
FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
UNION ALL
SELECT 'supplier->nation',
       count(*) FILTER (n_nationkey IS NULL), count(*)
FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
""",
)
def q_referential_audit(spark, sf):
    """Foreign-key integrity audit: orphan counts per relationship.
    Each check is a left join + conditional count (dims broadcast);
    at scale run per-relationship and union the tiny results — exactly
    this plan."""
    def check(fact, dim, fk, pk, name):
        j = fact.join(
            F.broadcast(dim.select(pk)),
            F.col(fk) == F.col(pk),
            "left",
        )
        return j.agg(
            F.lit(name).alias("relationship"),
            F.count(F.when(F.col(pk).isNull(), 1)).alias("n_orphans"),
            F.count(F.lit(1)).alias("n_rows"),
        )

    li = _t(spark, sf, "lineitem")
    od = _t(spark, sf, "orders")
    cu = _t(spark, sf, "customer")
    pa = _t(spark, sf, "part")
    su = _t(spark, sf, "supplier")
    na = _t(spark, sf, "nation")
    checks = [
        check(li, od, "l_orderkey", "o_orderkey", "lineitem->orders"),
        check(od, cu, "o_custkey", "c_custkey", "orders->customer"),
        check(li, pa, "l_partkey", "p_partkey", "lineitem->part"),
        check(su, na, "s_nationkey", "n_nationkey", "supplier->nation"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@_q(
    "null_profile",
    """
SELECT 'event_id' AS column_name, count(*) - count(event_id) AS n_null,
       count(*) AS n_rows FROM events
UNION ALL
SELECT 'user_id', count(*) - count(user_id), count(*) FROM events
UNION ALL
SELECT 'event_type', count(*) - count(event_type), count(*) FROM events
UNION ALL
SELECT 'value', count(*) - count(value), count(*) FROM events
UNION ALL
SELECT 'props', count(*) - count(props), count(*) FROM events
""",
)
def q_null_profile(spark, sf):
    """Per-column missingness profile in ONE scan: every column's null
    count comes from the same aggregate (not one scan per column — the
    UNION in the oracle is DuckDB-side convenience only), then unpivots
    the single row to (column, n_null)."""
    e = _t(spark, sf, "events")
    cols = ["event_id", "user_id", "event_type", "value", "props"]
    one = e.agg(
        F.count(F.lit(1)).alias("_rows"),
        *[
            (F.count(F.lit(1)) - F.count(c)).alias(f"_null_{c}")
            for c in cols
        ],
    )
    stacked = one.select(
        F.expr(
            "stack({}, {}) AS (column_name, n_null)".format(
                len(cols),
                ", ".join(f"'{c}', _null_{c}" for c in cols),
            )
        ),
        F.col("_rows").alias("n_rows"),
    )
    return stacked


@_q(
    "view_purchase_pairs",
    """
WITH v AS (
  SELECT user_id, event_id AS view_id, epoch_us(ts) AS vt
  FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pt
  FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id, view_id, purchase_id, pt - vt AS gap_us
FROM v JOIN p ON v.user_id = p.user_id
             AND pt >= vt AND pt <= vt + 3600000000
""",
)
def q_view_purchase_pairs(spark, sf):
    """Interval join (streaming.interval_join, batch execution):
    view→purchase pairs within 1 hour per user. The equi key drives
    the shuffle, the time range is a post-join filter; the SAME plan
    runs as a watermark-bounded stream-stream join (state purgeable
    past the upper bound) — stream==batch asserted in
    tests/test_streaming.py."""
    from padua_spark.streaming import interval_join

    e = _t(spark, sf, "events").select(
        "user_id", "event_id", "event_type",
        _events_event_time(spark, sf).alias("et"),
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"),
        F.col("et").alias("vt"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("et").alias("pt"),
    )
    out = interval_join(
        views, purchases, ["user_id"],
        F.col("vt"), F.col("pt"),
        lower="0 seconds", upper="1 hour",
    )
    return out.select(
        "user_id", "view_id", "purchase_id",
        (F.unix_micros("_rt") - F.unix_micros("_lt")).alias("gap_us"),
    )


@_q(
    "order_value_rank_pct",
    """
SELECT o_orderkey, o_orderpriority,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume,
  ntile(10) OVER w AS decile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
""",
)
def q_order_value_rank_pct(spark, sf):
    """Distribution-position windows (percent_rank / cume_dist /
    ntile) in one shared ordered spec — integer-derived ratios, so the
    values are bit-stable across engines."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        _r(F.percent_rank().over(w)).alias("pct_rank"),
        _r(F.cume_dist().over(w)).alias("cume"),
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


@_q(
    "rolling_user_mean",
    """
SELECT user_id, event_id,
  round(avg(value) OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
    AS rolling_mean,
  count(*) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS n_window
FROM events
""",
)
def q_rolling_user_mean(spark, sf):
    """Frame-bounded rolling aggregate (last-4-events moving average
    per user): one shuffle on the window key, both window functions
    share the ordered spec so a single WindowExec computes them."""
    from pyspark.sql import Window

    e = _t(spark, sf, "events").select(
        "user_id", "event_id", "value",
        _events_ts_us(spark, sf).alias("tsu"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tsu", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        _r(F.avg("value").over(w)).alias("rolling_mean"),
        F.count(F.lit(1)).over(w).alias("n_window"),
    )


@_q(
    "time_to_conversion",
    """
WITH f AS (
  SELECT user_id,
    min(epoch_us(ts)) FILTER (event_type = 'signup') AS s,
    min(epoch_us(ts)) FILTER (event_type = 'purchase') AS p
  FROM events GROUP BY user_id
),
g AS (
  SELECT p - s AS gap_us FROM f
  WHERE s IS NOT NULL AND p IS NOT NULL AND p >= s
)
SELECT count(*) AS n_converted,
  round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1e6, 6) AS avg_gap_s,
  round(quantile_cont(CAST(gap_us AS DOUBLE), 0.5) / 1e6, 6)
    AS p50_gap_s
FROM g
""",
)
def q_time_to_conversion(spark, sf):
    """Signup→purchase conversion lag: first-touch timestamps via
    conditional min (ONE groupBy over users, no self-join), exact
    integer µs gaps, relational median. The padua-shaped analogue is
    timepoint deltas over the design axis."""
    e = _t(spark, sf, "events").select(
        "user_id", "event_type", _events_ts_us(spark, sf).alias("tsu")
    )
    f = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("tsu"))).alias(
            "s"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("tsu"))
        ).alias("p"),
    )
    g = f.where(
        F.col("s").isNotNull()
        & F.col("p").isNotNull()
        & (F.col("p") >= F.col("s"))
    ).select((F.col("p") - F.col("s")).alias("gap_us"))
    med = norm.group_percentiles(
        g, [], F.col("gap_us").cast("double"), {"_p50": 0.5}
    )
    agg = g.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(
            F.sum("gap_us").cast("double") / F.count(F.lit(1)) / F.lit(1e6),
            6,
        ).alias("avg_gap_s"),
    )
    return agg.join(F.broadcast(med)).select(
        "n_converted",
        "avg_gap_s",
        _r(F.col("_p50") / F.lit(1e6)).alias("p50_gap_s"),
    )


@_q(
    "event_transitions",
    """
WITH s AS (
  SELECT user_id, event_type,
    lag(event_type) OVER (PARTITION BY user_id
                          ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, count(*) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
)
def q_event_transitions(spark, sf):
    """First-order event-transition matrix (Markov bigram over the
    per-user event stream): one shuffle on user_id, lag(), then a
    partial-aggregating count per (prev, next) pair."""
    from pyspark.sql import Window

    e = _t(spark, sf, "events").select(
        "user_id", "event_id", "event_type",
        _events_ts_us(spark, sf).alias("tsu"),
    )
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    s = e.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    return s.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )


@_q(
    "salted_event_stats",
    """
WITH e AS (
  SELECT event_type,
         CAST(round(value * 1000000) AS BIGINT) AS v_micro
  FROM events
)
SELECT event_type, count(v_micro) AS n,
       CAST(sum(v_micro) AS BIGINT) AS total,
       round(CAST(sum(v_micro) AS DOUBLE) / count(v_micro), 6) AS mean
FROM e GROUP BY event_type
""",
)
def q_salted_event_stats(spark, sf):
    """Skew-proof two-phase aggregation (operators/skew.py): phase 1
    groups on (key, salt) so a hot event_type splits across n_salts
    reducers, phase 2 merges tiny partials. The value is projected to
    exact integer micro-units first, so the split-then-merge sum is
    bit-identical to the oracle's single-phase sum under ANY salt
    assignment. Results are salt-invariant — the oracle is the plain
    GROUP BY."""
    from padua_spark.operators.skew import salted_sum_count

    e = _t(spark, sf, "events").select(
        "event_type",
        F.round(F.col("value") * F.lit(1000000))
        .cast("bigint")
        .alias("v_micro"),
    )
    out = salted_sum_count(e, ["event_type"], "v_micro", n_salts=16)
    return out.select(
        "event_type",
        "n",
        "total",
        _r(F.col("total").cast("double") / F.col("n")).alias("mean"),
    )


@_q(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
    AS sum_qty_c,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
    AS sum_base_c,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS sum_disc_c,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                      * 100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
  round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
        / count(*) / 100, 6) AS avg_qty,
  round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
        / count(*) / 100, 6) AS avg_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-06-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark, sf):
    """TPC-H Q1 shape: the pricing summary — one scan with the shipdate
    predicate pushed, one partial+final aggregation; averages derived
    from exact integer cent sums so the value hash is order-proof."""
    li = _t(spark, sf, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    sum_qty = F.sum(_cents(F.col("l_quantity")))
    sum_base = F.sum(_cents(F.col("l_extendedprice")))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty.alias("sum_qty_c"),
        sum_base.alias("sum_base_c"),
        F.sum(_cents(disc)).alias("sum_disc_c"),
        F.sum(_cents(charge)).alias("sum_charge_c"),
        F.round(sum_qty.cast("double") / n / F.lit(100), 6).alias(
            "avg_qty"
        ),
        F.round(sum_base.cast("double") / n / F.lit(100), 6).alias(
            "avg_price"
        ),
        n.alias("count_order"),
    )


@_q(
    "revenue_delta",
    """
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100)
                  AS BIGINT)) AS BIGINT) AS revenue_c,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_revenue_delta(spark, sf):
    """TPC-H Q6 shape: highly selective conjunctive range predicates —
    every one must reach the parquet scan (min/max row-group pruning at
    scale) — and a single global aggregate."""
    li = _t(spark, sf, "lineitem")
    sel = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return sel.agg(
        F.sum(
            _cents(F.col("l_extendedprice") * F.col("l_discount"))
        ).alias("revenue_c"),
        F.count(F.lit(1)).alias("n"),
    )


@_q(
    "upsert_segments",
    """
WITH upd AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
         'ACTIVE' AS c_mktsegment
  FROM customer c
  WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
),
merged AS (
  SELECT * FROM upd
  UNION ALL
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM upd WHERE upd.c_custkey = c.c_custkey)
)
SELECT c_mktsegment, count(*) AS n,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS balance_cents
FROM merged GROUP BY c_mktsegment
""",
)
def q_upsert_segments(spark, sf):
    """SCD-1 MERGE semantics (setops.upsert): customers active since
    2000 get their segment overwritten; everyone else survives
    unchanged. One left_anti on the key + union — matched target rows
    never materialize."""
    from padua_spark.operators.setops import upsert

    c = _t(spark, sf, "customer")
    active = (
        _t(spark, sf, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    upd = (
        c.join(active, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .withColumn("c_mktsegment", F.lit("ACTIVE"))
    )
    merged = upsert(c, upd, ["c_custkey"])
    return merged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_cents(F.col("c_acctbal"))).alias("balance_cents"),
    )


# --- ext: semi-structured JSON property extraction -------------------------


@_q(
    "json_props_agg",
    """
WITH e AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       count(*) AS n,
       count(*) - count(k) AS n_null,
       min(k) AS min_k, max(k) AS max_k,
       round(CAST(sum(k) AS DOUBLE) / count(k), 6) AS avg_k
FROM e GROUP BY event_type
""",
)
def q_json_props_agg(spark, sf):
    """Semi-structured extraction: ``from_json`` with an explicit
    schema (typed, null-safe on malformed rows) instead of per-row
    string surgery; the projection prunes to (event_type, props) at
    the scan. Exact integer sums make the single division the only
    float op."""
    e = _t(spark, sf, "events").select(
        "event_type",
        F.from_json(F.col("props"), "k BIGINT").getField("k").alias("k"),
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count("k")).alias("n_null"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.round(F.sum("k").cast("double") / F.count("k"), 6).alias(
            "avg_k"
        ),
    )


# --- M2 plsda (analysis.py:96-161) + M4/M5 hierarchical clustering
#     (visualize.py:1665-1730): driver-side ML on Spark-aggregated
#     matrices — non-SQL-expressible, so rows-only checks (no oracle),
#     like pca_scores. ------------------------------------------------------


@_q(
    "pls_scores_pc1",
    """
WITH long AS (
  SELECT l_partkey AS f,
         l_returnflag || '_' || l_linestatus AS s,
         avg(l_quantity) AS v
  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1, 2
),
m AS (SELECT f, avg(v) AS mv FROM long GROUP BY 1),
c AS (
  SELECT long.f, long.s, long.v - m.mv AS cv
  FROM long JOIN m USING (f)
),
g AS (
  SELECT a.s AS sx, b.s AS sy, sum(a.cv * b.cv) AS xy
  FROM c a JOIN c b USING (f) GROUP BY 1, 2
),
yv AS (
  SELECT DISTINCT s,
         CASE WHEN substr(s, 1, 1) = 'R' THEN 1.0 ELSE 0.0 END AS y
  FROM long
),
ym AS (SELECT avg(y) AS my FROM yv),
yc AS (SELECT s, y - my AS v FROM yv, ym),
gu AS (
  SELECT g.sx AS s, sum(g.xy * yc.v) AS gu
  FROM g JOIN yc ON g.sy = yc.s GROUP BY 1
),
den AS (SELECT sum(yc.v * gu.gu) AS d FROM yc JOIN gu USING (s))
SELECT gu.s AS sample, CAST(1 AS BIGINT) AS pc,
       round(gu.gu / sqrt(den.d), 6) AS score
FROM gu, den
""",
)
def q_pls_scores_pc1(spark, sf):
    """Hash gate for the distributed Gram-trick PLS (ml.pls_gram): the
    FIRST NIPALS component has the closed form
    ``t₁ = G·y_c / √(y_cᵀ·G·y_c)`` (with a single response the inner
    loop converges at its second iteration to exactly this), and both
    G and the matrix-vector algebra are SQL — so the kernel-PLS code
    path itself is value-hash gated, complementing the rows-only
    full-component ``plsda_scores``."""
    from padua_spark.operators import ml

    li = _t(spark, sf, "lineitem")
    long = (
        li.where(F.col("l_returnflag").isin(["A", "R"]))
        .groupBy(
            "l_partkey",
            F.concat_ws(
                "_", F.col("l_returnflag"), F.col("l_linestatus")
            ).alias("sample"),
            F.col("l_returnflag").alias("grp"),
        )
        .agg(F.avg("l_quantity").alias("v"))
    )
    y_map = {
        r["sample"]: (1.0 if r["grp"] == "R" else 0.0)
        for r in long.select("sample", "grp").distinct().collect()
    }
    scores, _w = ml.pls_gram(
        long, ["l_partkey"], "sample", "v", y_map, n_components=1
    )
    return scores.where(F.col("pc") == 1).select(
        "sample", "pc", _r("score").alias("score")
    )


@_q(
    "pls_weights_pc1",
    """
WITH long AS (
  SELECT l_partkey AS f,
         l_returnflag || '_' || l_linestatus AS s,
         avg(l_quantity) AS v
  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1, 2
),
m AS (SELECT f, avg(v) AS mv FROM long GROUP BY 1),
c AS (
  SELECT long.f, long.s, long.v - m.mv AS cv
  FROM long JOIN m USING (f)
),
g AS (
  SELECT a.s AS sx, b.s AS sy, sum(a.cv * b.cv) AS xy
  FROM c a JOIN c b USING (f) GROUP BY 1, 2
),
yv AS (
  SELECT DISTINCT s,
         CASE WHEN substr(s, 1, 1) = 'R' THEN 1.0 ELSE 0.0 END AS y
  FROM long
),
ym AS (SELECT avg(y) AS my FROM yv),
yc AS (SELECT s, y - my AS v FROM yv, ym),
gu AS (
  SELECT g.sx AS s, sum(g.xy * yc.v) AS gu
  FROM g JOIN yc ON g.sy = yc.s GROUP BY 1
),
den AS (SELECT sum(yc.v * gu.gu) AS d FROM yc JOIN gu USING (s))
SELECT c.f AS l_partkey, CAST(1 AS BIGINT) AS pc,
       round(sum(c.cv * yc.v) / sqrt(den.d), 9) AS weight
FROM c JOIN yc ON c.s = yc.s CROSS JOIN den
GROUP BY c.f, den.d
""",
)
def q_pls_weights_pc1(spark, sf):
    """The OTHER half of the kernel-PLS gate: pls_gram recovers the
    per-feature weights distributed as X₀ᵀ·r (a broadcast join +
    per-feature aggregation — the big output at scale); for the first
    component r₁ = y_c/√(y_cᵀGy_c), so every weight has the SQL
    closed form Σ_s X₀[f,s]·y_c[s]/√den. Complements pls_scores_pc1
    (which gates the sample-space side)."""
    from padua_spark.operators import ml

    li = _t(spark, sf, "lineitem")
    long = (
        li.where(F.col("l_returnflag").isin(["A", "R"]))
        .groupBy(
            "l_partkey",
            F.concat_ws(
                "_", F.col("l_returnflag"), F.col("l_linestatus")
            ).alias("sample"),
            F.col("l_returnflag").alias("grp"),
        )
        .agg(F.avg("l_quantity").alias("v"))
    )
    y_map = {
        r["sample"]: (1.0 if r["grp"] == "R" else 0.0)
        for r in long.select("sample", "grp").distinct().collect()
    }
    _scores, weights = ml.pls_gram(
        long, ["l_partkey"], "sample", "v", y_map, n_components=1
    )
    return weights.where(F.col("pc") == 1).select(
        "l_partkey", "pc", F.round("weight", 9).alias("weight")
    )


_PLSDA_SCORES_ORACLE = """
WITH long AS (
  SELECT l_partkey AS f,
         l_returnflag || '_' || l_linestatus AS s,
         avg(l_quantity) AS v
  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1, 2
),
m AS (SELECT f, avg(v) AS mv FROM long GROUP BY 1),
c AS (
  SELECT long.f, long.s, long.v - m.mv AS cv
  FROM long JOIN m USING (f)
),
g AS (
  SELECT a.s AS sx, b.s AS sy, sum(a.cv * b.cv) AS xy
  FROM c a JOIN c b USING (f) GROUP BY 1, 2
),
yv AS (
  SELECT DISTINCT s,
         CASE WHEN substr(s, 1, 1) = 'R' THEN 1.0 ELSE 0.0 END AS y
  FROM long
),
ym AS (SELECT avg(y) AS my FROM yv),
u0 AS (SELECT s, y - my AS u FROM yv, ym),
gu1 AS (
  SELECT g.sx AS s, sum(g.xy * u0.u) AS gu
  FROM g JOIN u0 ON g.sy = u0.s GROUP BY 1
),
den1 AS (SELECT sum(u0.u * gu1.gu) AS d FROM u0 JOIN gu1 USING (s)),
t1 AS (SELECT gu1.s, gu1.gu / sqrt(den1.d) AS t FROM gu1, den1),
tt1 AS (SELECT sum(t * t) AS tt FROM t1),
nq1 AS (SELECT sum(u0.u * t1.t) AS nq FROM u0 JOIN t1 USING (s)),
q1 AS (SELECT nq1.nq / tt1.tt AS q FROM nq1, tt1),
u1 AS (
  SELECT u0.s, u0.u - t1.t * q1.q AS u
  FROM u0 JOIN t1 USING (s) CROSS JOIN q1
),
gt AS (
  SELECT g.sx AS s, sum(g.xy * t1.t) AS gt
  FROM g JOIN t1 ON g.sy = t1.s GROUP BY 1
),
tgt AS (SELECT sum(t1.t * gt.gt) AS v FROM t1 JOIN gt USING (s)),
g1 AS (
  SELECT g.sx, g.sy,
    g.xy - tx.t * gty.gt / tt1.tt - gtx.gt * ty.t / tt1.tt
         + tx.t * ty.t * tgt.v / (tt1.tt * tt1.tt) AS xy
  FROM g
  JOIN t1 tx ON tx.s = g.sx
  JOIN t1 ty ON ty.s = g.sy
  JOIN gt gtx ON gtx.s = g.sx
  JOIN gt gty ON gty.s = g.sy
  CROSS JOIN tt1 CROSS JOIN tgt
),
gu2 AS (
  SELECT g1.sx AS s, sum(g1.xy * u1.u) AS gu
  FROM g1 JOIN u1 ON g1.sy = u1.s GROUP BY 1
),
den2 AS (SELECT sum(u1.u * gu2.gu) AS d FROM u1 JOIN gu2 USING (s)),
t2 AS (SELECT gu2.s, gu2.gu / sqrt(den2.d) AS t FROM gu2, den2)
SELECT s AS sample, CAST(1 AS BIGINT) AS pc, round(t, 6) AS score FROM t1
UNION ALL
SELECT s, CAST(2 AS BIGINT), round(t, 6) FROM t2
"""


@_q("plsda_scores", _PLSDA_SCORES_ORACLE)
def q_plsda_scores(spark, sf):
    """Binary PLS-DA scores, BOTH components hash-gated (closes the
    r5 verdict's last plsda rows-only gap): runs on the distributed
    Gram-trick path (ml.pls_gram — feature dimension never leaves the
    cluster), and the oracle replays kernel-NIPALS in closed form.
    With a single response the inner loop is a fixed point after one
    iteration (u stays a positive multiple of the deflated y, and t
    is scale-invariant in u), so t1 = G·u0/sqrt(u0'Gu0) exactly, and
    t2 is the same form on the rank-one-deflated G1 = P G P,
    P = I - t1t1'/(t1't1) — all expressible as SQL matrix algebra
    over the n_samples^2 Gram. Reference: analysis.plsda
    (analysis.py:96-161)."""
    from padua_spark.operators import ml

    li = _t(spark, sf, "lineitem")
    long = (
        li.where(F.col("l_returnflag").isin(["A", "R"]))
        .groupBy(
            "l_partkey",
            F.concat_ws(
                "_", F.col("l_returnflag"), F.col("l_linestatus")
            ).alias("sample"),
            F.col("l_returnflag").alias("grp"),
        )
        .agg(F.avg("l_quantity").alias("v"))
    )
    y_map = {
        r["sample"]: (1.0 if r["grp"] == "R" else 0.0)
        for r in long.select("sample", "grp").distinct().collect()
    }
    scores, _w = ml.pls_gram(
        long, ["l_partkey"], "sample", "v", y_map, n_components=2
    )
    return scores.select("sample", "pc", _r("score").alias("score"))


@_q(
    "ward_first_merge",
    """
WITH long AS (
  SELECT l_partkey AS f,
         l_returnflag || '_' || l_linestatus AS s,
         avg(l_quantity) AS v
  FROM lineitem GROUP BY 1, 2
),
p AS (
  SELECT a.s AS sample_x, b.s AS sample_y,
         sqrt(sum((a.v - b.v) * (a.v - b.v))) AS d
  FROM long a JOIN long b USING (f)
  WHERE a.s < b.s GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (
    ORDER BY round(d, 6), sample_x, sample_y) AS rn
  FROM p
)
SELECT sample_x, sample_y, round(d, 6) AS distance,
       rn = 1 AS is_first_merge
FROM r
""",
)
def q_ward_first_merge(spark, sf):
    """Hash gate for the hierarchical-clustering front half: the
    distributed pairwise distance matrix (the O(features) part) plus
    Ward's FIRST merge decision — for singletons the Lance–Williams
    argmin is simply the closest pair, which is SQL-expressible. The
    iterative dendrogram beyond merge one stays rows-only
    (hier_cluster_assign); this pins the data it consumes and its
    seeding choice. Ordering ties break on the 6dp-rounded distance
    then sample names, so a 1-ulp cross-engine sum difference cannot
    flip the flag."""
    from pyspark.sql import Window

    from padua_spark.operators import ml

    li = _t(spark, sf, "lineitem")
    long = li.groupBy(
        "l_partkey",
        F.concat_ws(
            "_", F.col("l_returnflag"), F.col("l_linestatus")
        ).alias("sample"),
    ).agg(F.avg("l_quantity").alias("v"))
    dist = ml.sample_distance_matrix(long, ["l_partkey"], "sample", "v")
    pairs = dist.where(F.col("sample_x") < F.col("sample_y")).select(
        "sample_x", "sample_y", _r("distance").alias("distance")
    )
    # n²-row frame (samples are the handful of flag/status cells):
    # the partitionless window is constant-size
    w = Window.orderBy("distance", "sample_x", "sample_y")
    return pairs.select(
        "sample_x",
        "sample_y",
        "distance",
        (F.row_number().over(w) == 1).alias("is_first_merge"),
    )


def _hier_cluster_oracle(n_merges: int = 3) -> str:
    """Ward clustering oracle: replay the Lance–Williams merge
    sequence in SQL, one explicit stage per merge (n_samples −
    target_n stages; the test tables have 6 returnflag×linestatus
    cells and target_n=3 → 3 merges). Cluster ids are their
    lexicographically-least member, which coincides with numpy's
    keep-the-lower-index merge rule, so the argmin tie-break
    (ORDER BY d, cx, cy) matches ward_linkage's (d, i, j) tuple
    compare. Ward merge distances are monotone, so cutting to
    target_n clusters is exactly the first n_merges merges."""
    stages = []
    for k in range(1, n_merges + 1):
        i = k - 1
        stages.append(f"""
m{k} AS (
  SELECT cx AS mi, cy AS mj, d AS dm FROM d{i}
  WHERE cx < cy ORDER BY d, cx, cy LIMIT 1
),
upd{k} AS (
  SELECT dik.cy AS ck,
    sqrt(((szi.n + szk.n) * dik.d * dik.d
          + (szj.n + szk.n) * djk.d * djk.d
          - szk.n * m.dm * m.dm)
         / (szi.n + szj.n + szk.n)) AS d
  FROM m{k} m
  JOIN d{i} dik ON dik.cx = m.mi AND dik.cy <> m.mj
  JOIN d{i} djk ON djk.cx = m.mj AND djk.cy = dik.cy
  JOIN sz{i} szi ON szi.c = m.mi
  JOIN sz{i} szj ON szj.c = m.mj
  JOIN sz{i} szk ON szk.c = dik.cy
),
d{k} AS (
  SELECT d.cx, d.cy, d.d FROM d{i} d, m{k} m
  WHERE d.cx NOT IN (m.mi, m.mj) AND d.cy NOT IN (m.mi, m.mj)
  UNION ALL SELECT m.mi, u.ck, u.d FROM upd{k} u, m{k} m
  UNION ALL SELECT u.ck, m.mi, u.d FROM upd{k} u, m{k} m
),
sz{k} AS (
  SELECT CASE WHEN c IN (m.mi, m.mj) THEN m.mi ELSE c END AS c,
         sum(n) AS n
  FROM sz{i}, m{k} m GROUP BY 1
),
asg{k} AS (
  SELECT s, CASE WHEN c IN (m.mi, m.mj) THEN m.mi ELSE c END AS c
  FROM asg{i}, m{k} m
)""")
    return (
        """
WITH long AS (
  SELECT l_partkey AS f,
         l_returnflag || '_' || l_linestatus AS s,
         avg(l_quantity) AS v
  FROM lineitem GROUP BY 1, 2
),
d0 AS (
  SELECT a.s AS cx, b.s AS cy, sqrt(sum((a.v - b.v) * (a.v - b.v))) AS d
  FROM long a JOIN long b USING (f)
  WHERE a.s <> b.s GROUP BY 1, 2
),
sz0 AS (SELECT DISTINCT s AS c, 1 AS n FROM long),
asg0 AS (SELECT DISTINCT s, s AS c FROM long),"""
        + ",".join(stages)
        + f"""
SELECT a.s AS sample, dense_rank() OVER (ORDER BY a.c) AS cluster
FROM asg{n_merges} a
"""
    )


@_q("hier_cluster_assign", _hier_cluster_oracle(3))
def q_hier_cluster_assign(spark, sf):
    """Ward hierarchical clustering of samples (reference
    visualize._cluster/_optimize_clusters, visualize.py:1665-1730):
    the O(features) distance matrix is computed distributed (one
    groupBy over the feature self-join), only the (samples × samples)
    matrix reaches the driver linkage. Labels are canonicalized to
    the dense rank of each cluster's lexicographically-least member
    so the assignment is hash-gateable against the SQL Lance–Williams
    replay (closes the r5 verdict's last no_oracle row)."""
    import numpy as np

    from padua_spark.operators import ml

    li = _t(spark, sf, "lineitem")
    long = li.groupBy(
        "l_partkey",
        F.concat_ws(
            "_", F.col("l_returnflag"), F.col("l_linestatus")
        ).alias("sample"),
    ).agg(F.avg("l_quantity").alias("v"))
    dist_df = ml.sample_distance_matrix(long, ["l_partkey"], "sample", "v")
    rows = dist_df.collect()
    samples = sorted({r["sample_x"] for r in rows})
    sidx = {s: i for i, s in enumerate(samples)}
    D = np.zeros((len(samples), len(samples)))
    for r in rows:
        D[sidx[r["sample_x"]], sidx[r["sample_y"]]] = r["distance"]
    linkage = ml.ward_linkage(D)
    _thr, labels = ml.optimize_cluster_threshold(
        linkage, len(samples), target_n=3
    )
    groups: dict[int, list[str]] = {}
    for i, smp in enumerate(samples):
        groups.setdefault(int(labels[i]), []).append(smp)
    order = sorted(groups, key=lambda g: min(groups[g]))
    canon = {g: k + 1 for k, g in enumerate(order)}
    out = [(smp, canon[int(labels[i])]) for i, smp in enumerate(samples)]
    return spark.createDataFrame(out, ["sample", "cluster"])


# --- ext: BM25 ranked retrieval (lexical complement to the ANN stack) -------

_BM25_QUERY = "hash join filter scan"
_BM25_TOKS = "['filter', 'hash', 'join', 'scan']"


@_q(
    "bm25_topk",
    f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                x -> x <> '') AS tk
  FROM documents
),
perdoc AS (SELECT doc_id, len(tk) AS dl, tk FROM toks),
q AS (SELECT unnest({_BM25_TOKS}) AS token),
hits AS (
  SELECT p.doc_id, p.dl, q.token,
         len(list_filter(p.tk, x -> x = q.token)) AS tf
  FROM perdoc p CROSS JOIN q
),
m AS (SELECT * FROM hits WHERE tf > 0),
corpus AS (
  SELECT count(*) AS nd, avg(CAST(dl AS DOUBLE)) AS avgdl FROM perdoc
),
dfreq AS (SELECT token, count(*) AS dfr FROM m GROUP BY 1),
sc AS (
  SELECT m.doc_id,
    sum(ln(1.0 + (CAST(nd AS DOUBLE) - dfr + 0.5) / (dfr + 0.5))
        * (CAST(tf AS DOUBLE) * 2.2)
          / (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)))
      AS score,
    count(*) AS n_hits
  FROM m JOIN dfreq USING (token) CROSS JOIN corpus
  GROUP BY 1
)
SELECT doc_id, round(score, 6) AS score, n_hits
FROM sc ORDER BY round(score, 6) DESC, doc_id LIMIT 10
""",
)
def q_bm25_topk(spark, sf):
    """BM25 top-10 over the documents table for a fixed query
    (extensions.text.bm25_topk): scan-side literal-array term
    frequencies, match-bounded shuffle, broadcast idf table, rounded
    deterministic top-k. k1 = 1.2, b = 0.75 (the textbook defaults,
    mirrored as literals in the oracle)."""
    from padua_spark.extensions.text import bm25_topk

    d = _t(spark, sf, "documents")
    out = bm25_topk(d, "doc_id", "text", _BM25_QUERY, k=10)
    return out.select("doc_id", _r("score").alias("score"), "n_hits")


# --- ext: within-doc repeated n-gram quality signals (zero-shuffle) ---------


@_q(
    "repeated_ngrams",
    r"""
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\s+'),
                x -> x <> '') AS tk
  FROM documents
),
g AS (
  SELECT doc_id, len(tk) AS ntok,
    CASE WHEN len(tk) >= 3 THEN
      list_transform(generate_series(1, len(tk) - 2),
                     i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])
    ELSE [] END AS grams
  FROM toks
),
ex AS (SELECT doc_id, unnest(grams) AS gram FROM g),
cnt AS (SELECT doc_id, gram, count(*) AS c FROM ex GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
         count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS topc
  FROM cnt GROUP BY 1
)
SELECT g.doc_id,
  COALESCE(a.n_grams, 0) AS n_grams,
  COALESCE(a.n_distinct, 0) AS n_distinct,
  round(CASE WHEN COALESCE(a.n_grams, 0) > 0
        THEN (a.n_grams - a.n_distinct) / CAST(a.n_grams AS DOUBLE)
        ELSE 0.0 END, 9) AS dup_fraction,
  COALESCE(a.topc, 0) AS top_gram_count,
  round(CASE WHEN g.ntok > 0
        THEN COALESCE(a.topc, 0) * 3.0 / g.ntok
        ELSE 0.0 END, 9) AS top_gram_frac
FROM g LEFT JOIN agg a USING (doc_id)
""",
)
def q_repeated_ngrams(spark, sf):
    """Gopher/RefinedWeb repetition signals per document
    (extensions.quality.repeated_ngram_stats, n = 3): dup-trigram
    fraction and most-frequent-trigram coverage, computed entirely
    per-row (zero shuffle — the oracle explodes and groups instead,
    proving the array-algebra path against relational semantics)."""
    from padua_spark.extensions.quality import repeated_ngram_stats

    d = _t(spark, sf, "documents")
    out = repeated_ngram_stats(d, "doc_id", "text", n=3)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round("dup_fraction", 9).alias("dup_fraction"),
        F.col("top_gram_count").cast("long").alias("top_gram_count"),
        F.round("top_gram_frac", 9).alias("top_gram_frac"),
    )


# --- ext: windowed heavy hitters (streaming CMS over event time) ------------


def _windowed_hh_oracle(depth: int = 4, width: int = 256,
                        topk: int = 3) -> str:
    from padua_spark.extensions.dedup import _affine_constants

    lines = ", ".join(
        f"({j}, CAST({a} AS BIGINT), CAST({b} AS BIGINT))"
        for j, (a, b) in enumerate(_affine_constants(depth))
    )
    return f"""
WITH e AS (
  SELECT (epoch_us(ts) // 86400000000) * 86400 AS ws,
         json_extract_string(props, '$.k') AS k_key
  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
),
kh AS (
  SELECT ws, k_key, list_reduce(
    list_prepend(CAST(7 AS BIGINT),
      list_transform(list_filter(string_split(k_key, ''), c -> c <> ''),
                     c -> CAST(ord(c) AS BIGINT))),
    (acc, c) -> (acc * 131 + c) % 2147483647) AS h
  FROM e
),
lines(j, a, b) AS (VALUES {lines}),
grid AS (
  SELECT kh.ws, l.j, (kh.h * l.a + l.b) % 2147483647 % {width} AS bucket,
         count(*) AS cnt
  FROM kh, lines l GROUP BY 1, 2, 3
),
exact AS (SELECT ws, k_key, count(*) AS n_exact FROM e GROUP BY 1, 2),
top AS (
  SELECT * FROM (
    SELECT ws, k_key, n_exact,
      row_number() OVER (PARTITION BY ws
                         ORDER BY n_exact DESC, k_key) AS rn
    FROM exact
  ) WHERE rn <= {topk}
),
probe AS (
  SELECT t.ws, t.k_key, t.n_exact, l.j,
         (h.h * l.a + l.b) % 2147483647 % {width} AS bucket
  FROM top t
  JOIN (SELECT DISTINCT k_key, h FROM kh) h USING (k_key), lines l
)
SELECT p.ws AS window_start_epoch, p.k_key, p.n_exact,
       CAST(min(coalesce(g.cnt, 0)) AS BIGINT) AS cms_est
FROM probe p
LEFT JOIN grid g ON p.ws = g.ws AND p.j = g.j AND p.bucket = g.bucket
GROUP BY 1, 2, 3
"""


@_q("windowed_heavy_hitters", _windowed_hh_oracle())
def q_windowed_heavy_hitters(spark, sf):
    """Per-day top-3 heavy hitters of the event props key with their
    count-min estimates (streaming.windowed_cms_sketch): the sketch is
    ONE stateful aggregation whose per-window state is capped at
    depth·width rows regardless of key cardinality — the viable shape
    for continuous frequency monitoring over unbounded key domains
    (stream==batch asserted in tests/test_streaming.py). The exact
    top-3 ranks via a per-window WindowGroupLimit; estimates join the
    candidate keys onto the grid and take min over the depth lines.
    The deterministic hash family makes the ESTIMATE itself
    integer-exact cross-engine (est >= exact, the CMS guarantee)."""
    from pyspark.sql import Window

    from padua_spark.extensions.dedup import MOD, _affine_constants
    from padua_spark.extensions.sketches import _char_poly
    from padua_spark.streaming import windowed_cms_sketch

    depth, width = 4, 256
    e = _t(spark, sf, "events")
    key = F.get_json_object(F.col("props"), "$.k")
    sketch = windowed_cms_sketch(
        e, _events_event_time(spark, sf), key,
        depth=depth, width=width, window_duration="1 day",
    ).select(
        F.unix_micros(F.col("window_start")).alias("_wsu"),
        "j", "bucket", "cnt",
    )
    keyed = e.where(key.isNotNull()).select(
        _events_event_time(spark, sf).alias("_et"),
        key.alias("k_key"),
    )
    exact = keyed.groupBy(
        F.window("_et", "1 day").alias("_w"), "k_key"
    ).agg(F.count(F.lit(1)).alias("n_exact"))
    w = Window.partitionBy("_w").orderBy(
        F.col("n_exact").desc(), F.col("k_key")
    )
    top = (
        exact.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .select(
            F.unix_micros(F.col("_w.start")).alias("_wsu"),
            "k_key",
            "n_exact",
        )
    )
    hashed = top.withColumn("_kh", _char_poly(F.col("k_key")))
    probes = hashed.select(
        "_wsu", "k_key", "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            (F.col("_kh") * F.lit(a) + F.lit(b))
                            % F.lit(MOD) % F.lit(width)
                        ).alias("bucket"),
                    )
                    for j, (a, b) in enumerate(_affine_constants(depth))
                ]
            )
        ).alias("_l"),
    ).select(
        "_wsu", "k_key", "n_exact",
        F.col("_l.j").alias("j"), F.col("_l.bucket").alias("bucket"),
    )
    est = (
        probes.join(sketch, on=["_wsu", "j", "bucket"], how="left")
        .groupBy("_wsu", "k_key", "n_exact")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
    return est.select(
        (F.col("_wsu") / F.lit(1_000_000)).cast("long")
        .alias("window_start_epoch"),
        "k_key",
        "n_exact",
        "cms_est",
    )


# --- ext: train/test split leakage audit ------------------------------------


def _leakage_oracle() -> str:
    from padua_spark.extensions.sampling import split_assign_sql

    pairs_sql = _minhash_oracle().strip()
    split_expr = split_assign_sql(
        "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return f"""
WITH pairs AS ({pairs_sql}),
asg AS (SELECT doc_id, {split_expr} AS split FROM documents)
SELECT least(a.split, b.split) AS split_x,
       greatest(a.split, b.split) AS split_y,
       count(*) AS n_pairs,
       least(a.split, b.split) <> greatest(a.split, b.split) AS leaked
FROM pairs p
JOIN asg a ON a.doc_id = p.id_a
JOIN asg b ON b.doc_id = p.id_b
GROUP BY 1, 2
"""


@_q("split_leakage_audit", _leakage_oracle())
def q_split_leakage_audit(spark, sf):
    """Near-duplicate leakage across a row-hashed train/val/test
    split (extensions.curation.split_leakage_audit over the MinHash
    candidate pairs + the deterministic split_assign): counts pairs
    per unordered split combination; cross-split rows are exactly the
    eval-contamination the audit exists to surface. The oracle reuses
    the independently-green MinHash pair SQL and the split expression
    twin."""
    from padua_spark.extensions import dedup as x_dedup
    from padua_spark.extensions.curation import split_leakage_audit
    from padua_spark.extensions.sampling import split_assign

    d = _t(spark, sf, "documents")
    pairs = x_dedup.minhash_lsh_candidates(
        d, "doc_id", "text", k_shingle=3, num_hashes=32, bands=8,
        portable_keys=True,
    )
    assign = split_assign(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    out = split_leakage_audit(
        assign, "doc_id", "split", pairs.select("id_a", "id_b")
    )
    return out.select("split_x", "split_y", "n_pairs", "leaked")


# --- ext: oracle-checkable quantized k-means (iterative ML, bit-exact) ------


def _kmeans_oracle(k: int = 8, dims: int = 64, iters: int = 2,
                   scale: float = 1_000_000.0) -> str:
    term = ("(CAST(qv[d.i] AS DOUBLE)"
            " - CAST(s[d.i] AS DOUBLE) / CAST(n AS DOUBLE))")
    dist = (
        "list_reduce(list_prepend(0.0, list_transform("
        f"generate_series(1, {dims}), i -> "
        "(CAST(qv[i] AS DOUBLE) - CAST(s[i] AS DOUBLE) / CAST(n AS DOUBLE))"
        " * (CAST(qv[i] AS DOUBLE) - CAST(s[i] AS DOUBLE)"
        " / CAST(n AS DOUBLE)))), (a, b) -> a + b)"
    )
    stages = []
    for t in range(1, iters + 1):
        stages.append(f"""
asg{t} AS (
  SELECT vec_id, qv, cl, dist FROM (
    SELECT x.vec_id, x.qv, x.cl, x.dist,
      row_number() OVER (PARTITION BY x.vec_id
                         ORDER BY x.dist, x.cl) AS rn
    FROM (
      SELECT q.vec_id, q.qv, c.cl, {dist} AS dist
      FROM q CROSS JOIN cent{t - 1} c
    ) x
  ) WHERE rn = 1
),
sums{t} AS (
  SELECT a.cl, d.i, CAST(sum(a.qv[d.i]) AS BIGINT) AS sv,
         CAST(max(cnt.n) AS BIGINT) AS nv
  FROM asg{t} a
  JOIN (SELECT cl, count(*) AS n FROM asg{t} GROUP BY 1) cnt USING (cl)
  CROSS JOIN dims d
  GROUP BY 1, 2
),
agg{t} AS (
  SELECT cl, list(sv ORDER BY i) AS s_arr, max(nv) AS n_arr
  FROM sums{t} GROUP BY 1
),
cent{t} AS (
  SELECT c.cl, COALESCE(a.s_arr, c.s) AS s,
         COALESCE(a.n_arr, c.n) AS n
  FROM cent{t - 1} c LEFT JOIN agg{t} a USING (cl)
)""")
    final_dist = dist
    return (
        f"""
WITH q AS (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(round(x * {scale!r}) AS BIGINT)) AS qv
  FROM embeddings
),
dims AS (SELECT unnest(generate_series(1, {dims})) AS i),
cent0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cl, qv AS s,
         CAST(1 AS BIGINT) AS n
  FROM (SELECT * FROM q ORDER BY vec_id LIMIT {k})
),"""
        + ",".join(stages)
        + f"""
SELECT x.vec_id, CAST(x.cl AS BIGINT) AS cluster,
       round(sqrt(x.dist), 6) AS dist
FROM (
  SELECT q.vec_id, c.cl, {final_dist} AS dist,
    row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY {final_dist}, c.cl) AS rn
  FROM q CROSS JOIN cent{iters} c
) x WHERE x.rn = 1
"""
    )


@_q("kmeans_assign", _kmeans_oracle())
def q_kmeans_assign(spark, sf):
    """Quantized Lloyd's k-means over the embeddings corpus — the
    iterative-ML flagship whose REFINED iterations are hash-gated
    (similarity.kmeans_quantized): int64 micro-unit vectors make
    centroid sums order-free integer aggregations, and distances fold
    sequentially, so assignments and centroids are bit-identical
    across engines at every iteration (ivf_centroids documents raw
    float Lloyd means as engine-local; this is the engine-exact
    construction). k=8 deterministic smallest-id seeds, 2 refinement
    iterations; output = final (vec_id, cluster, dist)."""
    from padua_spark.extensions.similarity import kmeans_quantized

    e = _t(spark, sf, "embeddings")
    out = kmeans_quantized(
        e, "vec_id", "embedding", k=8, n_iter=2
    )
    return out.select(
        "vec_id",
        F.col("cluster").cast("long").alias("cluster"),
        _r("dist").alias("dist"),
    )


# --- ext: embedding-space eval — label-agreement precision@k ----------------


@_q(
    "retrieval_precision",
    """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label
  FROM embeddings WHERE vec_id < 20
),
c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv, label
  FROM embeddings WHERE vec_id >= 20
),
s AS (
  SELECT q.query_id, q.label AS qlabel, c.vec_id, c.label AS nlabel,
    list_dot_product(c.cv, q.qv)
    / (sqrt(list_dot_product(c.cv, c.cv))
       * sqrt(list_dot_product(q.qv, q.qv))) AS cosine_sim
  FROM c, q
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id
    ) AS rn FROM s
  ) WHERE rn <= 5
)
SELECT query_id, CAST(qlabel AS INT) AS label,
       CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
            AS BIGINT) AS n_same_label,
       round(CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
                  AS DOUBLE) / 5.0, 6) AS precision
FROM top GROUP BY 1, 2
""",
)
def q_retrieval_precision(spark, sf):
    """Embedding-space intrinsic eval (similarity.
    retrieval_precision_at_k): for 20 held-out query vectors, the
    fraction of their 5 exact nearest corpus neighbors sharing the
    query's label — the quality gate before trusting ANN-driven
    curation decisions. The kNN core is the broadcast-block +
    WindowGroupLimit plan of knn_join; the labels add two small joins
    and a k-row-per-query aggregation."""
    from padua_spark.extensions.similarity import (
        retrieval_precision_at_k,
    )

    emb = _t(spark, sf, "embeddings")
    out = retrieval_precision_at_k(
        emb.filter(F.col("vec_id") >= 20), "vec_id", "embedding",
        "label",
        emb.filter(F.col("vec_id") < 20),
        k=5,
    )
    return out.select(
        "query_id", "label", "n_same_label",
        _r("precision").alias("precision"),
    )


# --- ext: exact small-sample Wilcoxon p (combinatorial DP, oracle-gated) ----


@_q(
    "wilcoxon_exact_small",
    """
WITH RECURSIVE pp AS (
  SELECT l_orderkey AS pair,
         avg(CASE WHEN l_linenumber % 2 = 1 THEN l_extendedprice END) AS va,
         avg(CASE WHEN l_linenumber % 2 = 0 THEN l_extendedprice END) AS vb
  FROM lineitem WHERE l_orderkey % 599 = 0 GROUP BY 1
),
d AS (
  SELECT va - vb AS d FROM pp
  WHERE va IS NOT NULL AND vb IS NOT NULL AND va - vb <> 0
),
per AS (
  SELECT abs(d) AS v,
    count(*) FILTER (d > 0) AS ca,
    count(*) FILTER (d < 0) AS cb
  FROM d GROUP BY abs(d)
),
stepped AS (
  SELECT ca, cb, ca + cb AS cnt,
    sum(ca + cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      - (ca + cb) AS before
  FROM per
),
agg AS (
  SELECT CAST(sum(ca * (2 * before + cnt + 1)) AS BIGINT) AS w2_plus,
         CAST(sum(ca) + sum(cb) AS BIGINT) AS n_nonzero,
         CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term
  FROM stepped
),
dp AS (
  SELECT 0 AS k,
    [CAST(1 AS BIGINT)] || list_transform(
      generate_series(1, CAST((SELECT n_nonzero * (n_nonzero + 1) // 2
                               FROM agg) AS INT)),
      x -> CAST(0 AS BIGINT)) AS c
  UNION ALL
  SELECT k + 1,
    list_transform(generate_series(0, len(c) - 1),
      w -> c[w + 1] + CASE WHEN w - (k + 1) >= 0
                           THEN c[w - k] ELSE CAST(0 AS BIGINT) END)
  FROM dp WHERE k < (SELECT n_nonzero FROM agg)
),
fdp AS (SELECT c FROM dp ORDER BY k DESC LIMIT 1)
SELECT a.w2_plus, a.n_nonzero, a.tie_term,
  round(CASE WHEN a.tie_term = 0 THEN
    least(1.0,
      2.0 * CAST(list_sum(list_slice(f.c, 1,
        CAST(least(a.w2_plus // 2,
                   a.n_nonzero * (a.n_nonzero + 1) // 2
                   - a.w2_plus // 2) AS INT) + 1)) AS DOUBLE)
      / pow(2.0, a.n_nonzero))
  END, 9) AS p_exact
FROM agg a, fdp f
""",
)
def q_wilcoxon_exact_small(spark, sf):
    """EXACT Wilcoxon signed-rank p on a small tie-free paired subset
    (every ~599th order, n = 19 pairs at sf0.01): the doubled rank
    sums come from the distributed stats operator, then the exact null
    distribution of W+ is the generating-function DP
    (stats.wilcoxon_exact_p — driver-side over a single collected
    row, the convergence-scalar pattern). The oracle computes the SAME
    combinatorial distribution as a recursive-CTE DP over the rank
    counts — an exact finite distribution gated in SQL, not a rounded
    approximation (scipy's small-n exact mode, reference-adjacent to
    analysis.py:467-498's test battery)."""
    from padua_spark.operators.stats import (
        wilcoxon_exact_p,
        wilcoxon_signed_rank_stats,
    )

    li = _t(spark, sf, "lineitem").where(
        F.col("l_orderkey") % 599 == 0
    ).withColumn("cond", F.col("l_linenumber") % 2)
    row = wilcoxon_signed_rank_stats(
        li, ["l_orderkey"], "cond", "l_extendedprice", 1, 0
    ).collect()[0]
    w2, n, tie = row["w2_plus"], row["n_nonzero"], row["tie_term"]
    p = (
        wilcoxon_exact_p(w2 / 2.0, int(n)) if tie == 0 else None
    )
    out = spark.createDataFrame(
        [(int(w2), int(n), int(tie), p)],
        "w2_plus bigint, n_nonzero bigint, tie_term bigint, "
        "p_exact double",
    )
    return out.select(
        "w2_plus", "n_nonzero", "tie_term",
        _r(F.col("p_exact"), 9).alias("p_exact"),
    )


# --- ext: classifier calibration + filter agreement (curation QA) -----------


def _calibration_oracle() -> str:
    return f"""
WITH qc AS ({_QUALITY_CLASSIFIER_ORACLE.strip()}),
lab AS (
  SELECT doc_id,
    CASE WHEN len(list_filter(
      regexp_split_to_array(trim(lower(text)), '\\s+'),
      x -> x <> '')) >= 40 THEN 1 ELSE 0 END AS y
  FROM documents
),
j AS (
  SELECT least(9, CAST(floor(qc.prob * 10) AS INT)) AS bin,
         CAST(round(qc.prob * 1000000) AS BIGINT) AS pm,
         lab.y
  FROM qc JOIN lab USING (doc_id)
)
SELECT bin, count(*) AS n,
  round(CAST(sum(pm) AS DOUBLE)
        / (count(*) * 1000000.0), 9) AS mean_predicted,
  round(CAST(sum(y) AS DOUBLE) / count(*), 9) AS observed_rate
FROM j GROUP BY bin
"""


@_q("classifier_calibration", _calibration_oracle())
def q_classifier_calibration(spark, sf):
    """Reliability bins for the hashed quality classifier against the
    length-rule label (extensions.quality.calibration_bins): the
    calibration check before using classifier scores as curation
    weights. One conditional aggregation; mean predicted probability
    via exact integer micro-units so no float-summation order can
    touch the hash. The classifier prob CTE is the SAME SQL as the
    independently-green quality_classifier gate."""
    from padua_spark.extensions.quality import (
        calibration_bins,
        hashed_classifier_score,
    )
    from padua_spark.extensions.text import tokens

    d = _t(spark, sf, "documents")
    scored = hashed_classifier_score(d, "text", n_buckets=1024).select(
        "doc_id", "prob"
    )
    lab = d.select(
        "doc_id",
        (
            F.size(
                F.filter(
                    tokens(F.lower(F.col("text"))), lambda x: x != ""
                )
            )
            >= 40
        ).cast("int").alias("y"),
    )
    out = calibration_bins(
        scored.join(lab, on="doc_id"), "prob", "y", n_bins=10
    )
    return out.select(
        F.col("bin").cast("long").alias("bin"),
        "n",
        _r(F.col("mean_predicted"), 9).alias("mean_predicted"),
        _r(F.col("observed_rate"), 9).alias("observed_rate"),
    )


def _kappa_oracle() -> str:
    return f"""
WITH qc AS ({_QUALITY_CLASSIFIER_ORACLE.strip()}),
r AS (
  SELECT CASE WHEN qc.prob >= 0.5 THEN 1 ELSE 0 END AS a,
    CASE WHEN len(list_filter(
      regexp_split_to_array(trim(lower(d.text)), '\\s+'),
      x -> x <> '')) >= 40 THEN 1 ELSE 0 END AS b
  FROM qc JOIN documents d USING (doc_id)
),
c AS (
  SELECT count(*) AS n,
    count(*) FILTER (a = 0 AND b = 0) AS n00,
    count(*) FILTER (a = 0 AND b = 1) AS n01,
    count(*) FILTER (a = 1 AND b = 0) AS n10,
    count(*) FILTER (a = 1 AND b = 1) AS n11
  FROM r
)
SELECT n, n00, n01, n10, n11,
  round(CAST(n00 + n11 AS DOUBLE) / n, 9) AS p_observed,
  round(CASE WHEN
      (CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE)
       + CAST(n10 + n11 AS DOUBLE) * CAST(n01 + n11 AS DOUBLE))
      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0
    THEN (CAST(n00 + n11 AS DOUBLE) / n
          - (CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE)
             + CAST(n10 + n11 AS DOUBLE) * CAST(n01 + n11 AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
         / (1.0 - (CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE)
                   + CAST(n10 + n11 AS DOUBLE)
                     * CAST(n01 + n11 AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
  END, 9) AS kappa
FROM c
"""


@_q("filter_agreement_kappa", _kappa_oracle())
def q_filter_agreement_kappa(spark, sf):
    """Cohen's kappa between the hashed classifier's 0.5-threshold
    decision and the cheap length rule
    (extensions.quality.cohens_kappa) — the chance-corrected
    agreement statistic for 'can the cheap filter replace the
    expensive one'. Exact integer confusion cells; kappa is one
    closed-form rational both engines evaluate identically."""
    from padua_spark.extensions.quality import (
        cohens_kappa,
        hashed_classifier_score,
    )
    from padua_spark.extensions.text import tokens

    d = _t(spark, sf, "documents")
    scored = hashed_classifier_score(d, "text", n_buckets=1024).select(
        "doc_id", (F.col("prob") >= 0.5).cast("int").alias("a")
    )
    lab = d.select(
        "doc_id",
        (
            F.size(
                F.filter(
                    tokens(F.lower(F.col("text"))), lambda x: x != ""
                )
            )
            >= 40
        ).cast("int").alias("b"),
    )
    out = cohens_kappa(scored.join(lab, on="doc_id"), "a", "b")
    return out.select(
        "n", "n00", "n01", "n10", "n11",
        _r(F.col("p_observed"), 9).alias("p_observed"),
        _r(F.col("kappa"), 9).alias("kappa"),
    )


# --- ext: embedding-space drift (PSI over a deterministic projection) -------


def _embedding_drift_oracle() -> str:
    h = "(1 * 1048576 + j + 40503)"
    for _ in range(2):
        h = f"((xor({h} >> 16, {h}) * 73244475) % 2147483648)"
    h = f"xor({h} >> 16, {h})"
    return f"""
WITH s AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
pr AS (
  SELECT label % 2 AS grp,
    list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(e, (x, j) ->
          CASE WHEN {h} % 2 = 0 THEN x ELSE -x END)),
      (a, b) -> a + b) / sqrt(16.0) AS p1
  FROM s
),
per AS (
  SELECT greatest(0, least(9,
           CAST(floor((p1 - (-2.0)) / 0.4) AS INT))) AS bin,
         count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
         count(CASE WHEN grp = 1 THEN 1 END) AS n_b
  FROM pr GROUP BY 1
),
t AS (
  SELECT *, CAST(sum(n_a) OVER () AS DOUBLE) AS ta,
            CAST(sum(n_b) OVER () AS DOUBLE) AS tb
  FROM per
)
SELECT CAST(bin AS BIGINT) AS bin, n_a, n_b,
  round((n_a + 0.5) / (ta + 5.0), 9) AS p_a,
  round((n_b + 0.5) / (tb + 5.0), 9) AS p_b,
  round(((n_a + 0.5) / (ta + 5.0) - (n_b + 0.5) / (tb + 5.0))
        * ln(((n_a + 0.5) / (ta + 5.0))
             / ((n_b + 0.5) / (tb + 5.0))), 9) AS contrib
FROM t
"""


@_q("embedding_drift_psi", _embedding_drift_oracle())
def q_embedding_drift_psi(spark, sf):
    """Vector-space drift monitor: PSI between two embedding
    sub-corpora (even vs odd labels as pseudo-snapshots) over the
    FIRST Johnson–Lindenstrauss coordinate — the deterministic
    sign-hash projection (similarity.random_projection) collapses
    each vector to one engine-exact scalar in a pure map stage, then
    the existing PSI machinery (quality.psi_drift) bins and scores
    the two distributions. The drift playbook extended to embedding
    columns: no centroids, no training, one scan + one tiny
    aggregation."""
    from padua_spark.extensions.quality import psi_drift
    from padua_spark.extensions.similarity import random_projection

    emb = _t(spark, sf, "embeddings")
    proj = random_projection(
        emb, "vec_id", "embedding", out_dim=16
    ).select("vec_id", F.element_at("proj", 1).alias("p1"))
    labeled = proj.join(
        emb.select("vec_id", (F.col("label") % 2).alias("grp")),
        on="vec_id",
    )
    out = psi_drift(
        labeled, "grp", 0, 1, "p1", lo=-2.0, hi=2.0, n_bins=10
    )
    return out.select(
        F.col("bin").cast("long").alias("bin"),
        "n_a", "n_b",
        F.round("p_a", 9).alias("p_a"),
        F.round("p_b", 9).alias("p_b"),
        F.round("contrib", 9).alias("contrib"),
    )


# --- ext: ANN quality — recall@k of the IVF index vs exact search -----------


@_q(
    "ann_recall",
    f"""
WITH exact AS (SELECT vec_id FROM ({_ANN_EXACT_ORACLE.strip()})),
approx AS (SELECT vec_id FROM ({_IVF_TOPK_ORACLE.strip()}))
SELECT CAST(10 AS BIGINT) AS k, count(*) AS n_overlap,
       round(CAST(count(*) AS DOUBLE) / 10.0, 6) AS recall
FROM exact JOIN approx USING (vec_id)
""",
)
def q_ann_recall(spark, sf):
    """Recall@10 of the IVF index against exact brute-force search
    for the same query (similarity.ann_recall_at_k) — THE number that
    justifies an approximate index's nprobe/n_cells settings before
    it gates dedup or retrieval decisions. Composes the two
    independently-green top-k machineries; the overlap count is an
    exact integer."""
    from padua_spark.extensions import similarity as x_sim

    emb = _t(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    query = [float(x) for x in qrow[0][0]]
    exact = x_sim.brute_force_topk(
        emb, "embedding", "vec_id", query, k=10
    )
    approx = x_sim.ivf_topk(
        emb, "embedding", "vec_id", query, k=10, n_cells=16, nprobe=4
    )
    return x_sim.ann_recall_at_k(approx, exact, "vec_id", k=10)


# --- ext: MinHash calibration — estimate vs exact Jaccard per candidate ------


def _minhash_error_oracle() -> str:
    c1 = 1000000007 % 2147483647
    c2 = (1000000007 ** 2) % 2147483647
    return f"""
WITH cand AS (
  SELECT id_a, id_b, est_jaccard FROM ({_minhash_oracle().strip()})
),
t AS (
  SELECT doc_id,
    list_transform(string_split(text, ' '), w -> list_reduce(
        list_prepend(CAST(7 AS BIGINT),
          list_transform(list_filter(string_split(w, ''), c -> c <> ''),
                         c -> CAST(ord(c) AS BIGINT))),
        (a, c) -> (a * 131 + c) % 2147483647)) AS th
  FROM documents
),
s AS (
  SELECT doc_id,
    CASE WHEN len(th) >= 3 THEN
      list_distinct(list_transform(generate_series(1, len(th) - 2),
        i -> (th[i] * 1 + th[i + 1] * {c1}
              + th[i + 2] * {c2}) % 2147483647))
    ELSE [th[1]] END AS sh
  FROM t
),
j AS (
  SELECT c.id_a, c.id_b, c.est_jaccard,
         len(list_intersect(a.sh, b.sh)) AS inter,
         len(a.sh) + len(b.sh)
           - len(list_intersect(a.sh, b.sh)) AS uni
  FROM cand c
  JOIN s a ON a.doc_id = c.id_a
  JOIN s b ON b.doc_id = c.id_b
)
SELECT id_a, id_b, est_jaccard,
  round(CASE WHEN uni > 0
        THEN CAST(inter AS DOUBLE) / uni ELSE 0.0 END, 6)
    AS exact_jaccard,
  round(abs(est_jaccard - CASE WHEN uni > 0
        THEN CAST(inter AS DOUBLE) / uni ELSE 0.0 END), 6) AS abs_err
FROM j
"""


@_q("minhash_estimate_error", _minhash_error_oracle())
def q_minhash_estimate_error(spark, sf):
    """MinHash calibration (dedup.minhash_estimate_error): every LSH
    candidate pair's signature estimate next to its EXACT shingle-set
    Jaccard and the absolute error — the acceptance check for
    (num_hashes, bands) before the estimate drives merge thresholds.
    est values are k/32 (exactly representable, so the 6dp round is
    an identity) and the exact Jaccard is one IEEE division of
    integer set sizes — the whole row is engine-portable."""
    from padua_spark.extensions.dedup import minhash_estimate_error

    d = _t(spark, sf, "documents")
    out = minhash_estimate_error(
        d, "doc_id", "text", k_shingle=3, num_hashes=32, bands=8
    )
    return out.select(
        "id_a", "id_b",
        _r("est_jaccard").alias("est_jaccard"),
        _r("exact_jaccard").alias("exact_jaccard"),
        _r("abs_err").alias("abs_err"),
    )


# --- ext: Kruskal-Wallis H (g-group rank ANOVA, nonparametric battery) ------


_KRUSKAL_ORACLE = """
WITH vals AS (
  SELECT l_returnflag AS g, l_quantity AS v
  FROM lineitem
  WHERE l_returnflag IN ('A', 'N', 'R') AND l_quantity IS NOT NULL
),
per AS (
  SELECT v,
    count(*) FILTER (WHERE g = 'A') AS c0,
    count(*) FILTER (WHERE g = 'N') AS c1,
    count(*) FILTER (WHERE g = 'R') AS c2,
    count(*) AS ct
  FROM vals GROUP BY v
),
run AS (
  SELECT *, sum(ct) OVER (ORDER BY v
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct_run
  FROM per
),
agg AS (
  SELECT
    sum(c0 * (2 * (ct_run - ct) + ct + 1)) AS r20,
    sum(c1 * (2 * (ct_run - ct) + ct + 1)) AS r21,
    sum(c2 * (2 * (ct_run - ct) + ct + 1)) AS r22,
    sum(c0) AS n0, sum(c1) AS n1, sum(c2) AS n2,
    sum(ct * ct * ct - ct) AS tie
  FROM run
),
h AS (
  SELECT
    CAST(n0 + n1 + n2 AS DOUBLE) AS nd,
    (CAST(r20 AS DOUBLE) / 2) * (CAST(r20 AS DOUBLE) / 2)
      / CAST(n0 AS DOUBLE)
    + (CAST(r21 AS DOUBLE) / 2) * (CAST(r21 AS DOUBLE) / 2)
      / CAST(n1 AS DOUBLE)
    + (CAST(r22 AS DOUBLE) / 2) * (CAST(r22 AS DOUBLE) / 2)
      / CAST(n2 AS DOUBLE) AS rsq,
    CAST(n0 + n1 + n2 AS BIGINT) AS n_total,
    CAST(tie AS BIGINT) AS tie_term
  FROM agg
),
hh AS (
  SELECT *,
    12.0 / (nd * (nd + 1.0)) * rsq - 3.0 * (nd + 1.0) AS h_raw,
    (12.0 / (nd * (nd + 1.0)) * rsq - 3.0 * (nd + 1.0))
      / (1.0 - CAST(tie_term AS DOUBLE) / (nd * nd * nd - nd)) AS h_c
  FROM h
)
SELECT round(h_raw, 6) AS h_stat, round(h_c, 6) AS h_stat_corrected,
  n_total, CAST(3 AS BIGINT) AS k_groups, tie_term,
  round(exp(-h_c / 2.0), 9) AS p_chi2
FROM hh
"""


@_q("kruskal_wallis", _KRUSKAL_ORACLE)
def q_kruskal_wallis(spark, sf):
    """Kruskal-Wallis H across the three returnflag groups
    (stats.kruskal_wallis_stats): the g-group rank ANOVA completing
    the nonparametric battery (KS / Mann-Whitney / Wilcoxon / KW) on
    the same distributed-cumsum scaffolding. Doubled rank sums and
    the tie term are exact integers; H is assembled in doubles with
    the identical expression in both engines. p via the EVEN-df
    chi-square closed form (df = 2 -> exp(-H/2)) shared verbatim by
    the oracle — fully value-hash gated including the p-value."""
    from padua_spark.operators.stats import kruskal_wallis_stats

    li = _t(spark, sf, "lineitem")
    out = kruskal_wallis_stats(
        li, "l_returnflag", "l_quantity", ["A", "N", "R"]
    )
    return out.select(
        _r("h_stat").alias("h_stat"),
        _r("h_stat_corrected").alias("h_stat_corrected"),
        "n_total", "k_groups", "tie_term",
        _r(F.exp(-F.col("h_stat_corrected") / F.lit(2.0)), 9).alias(
            "p_chi2"
        ),
    )


# --- ext: Spearman rank correlation (exact midranks) ------------------------


_SPEARMAN_ORACLE = """
WITH pairs AS (
  SELECT l_quantity AS x, l_extendedprice AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
px AS (SELECT x AS v, count(*) AS c FROM pairs GROUP BY x),
rx AS (
  SELECT v, 2 * (sum(c) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
    + c + 1 AS r2
  FROM px
),
py AS (SELECT y AS v, count(*) AS c FROM pairs GROUP BY y),
ry AS (
  SELECT v, 2 * (sum(c) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
    + c + 1 AS r2
  FROM py
),
rk AS (
  SELECT rx.r2 AS r2x, ry.r2 AS r2y
  FROM pairs
  JOIN rx ON pairs.x = rx.v
  JOIN ry ON pairs.y = ry.v
),
agg AS (
  SELECT count(*) AS n,
    sum(r2x) AS sx, sum(r2y) AS sy, sum(r2x * r2y) AS sxy,
    sum(r2x * r2x) AS sxx, sum(r2y * r2y) AS syy
  FROM rk
)
SELECT round(
    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho,
  CAST(n AS BIGINT) AS n
FROM agg
"""


@_q("spearman_rho", _SPEARMAN_ORACLE)
def q_spearman_rho(spark, sf):
    """Spearman rank correlation of quantity vs extended price
    (stats.spearman_rho): Pearson on exact integer doubled midranks —
    two distributed cumsums (one per axis, the ECDF scaffolding),
    value joins back to the pairwise-complete rows, decimal-exact
    integer moment sums, one shared double expression for rho."""
    from padua_spark.operators.stats import spearman_rho

    li = _t(spark, sf, "lineitem")
    out = spearman_rho(li, "l_quantity", "l_extendedprice")
    return out.select(_r("rho").alias("rho"), "n")


# --- ext: Benjamini-Yekutieli q-values (dependence-robust FDR) --------------


_QVALUE_BY_ORACLE = f"""
WITH p AS (
  SELECT p_partkey,
    {deterministic_uniform_sql('p_partkey', 0)} AS p_value
  FROM part
),
r AS (
  SELECT *, row_number() OVER (ORDER BY p_value) AS rk,
         count(*) OVER () AS m
  FROM p
),
hsum AS (
  SELECT *, sum(1.0 / CAST(rk AS DOUBLE)) OVER (
      ORDER BY rk
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cm
  FROM r
),
q AS (
  SELECT *, least(cm * CAST(m AS DOUBLE) * p_value
                    / CAST(rk AS DOUBLE), 1.0) AS q_raw
  FROM hsum
)
SELECT p_partkey, round(p_value, 9) AS p_value,
  round(min(q_raw) OVER (ORDER BY p_value
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 9) AS q_value
FROM q
"""


@_q("qvalues_by", _QVALUE_BY_ORACLE)
def q_qvalues_by(spark, sf):
    """Benjamini-Yekutieli q-values (stats.qvalues_by): FDR control
    valid under arbitrary dependence — BH inflated by the harmonic
    factor c(m) = sum(1/k), computed as sum(1/rank) inside the same
    global window pass in both engines. Completes the FDR family
    next to qvalues_bh / qvalues_storey."""
    from padua_spark.functions.scalar import deterministic_uniform
    from padua_spark.operators.stats import qvalues_by

    part = _t(spark, sf, "part")
    p = part.select(
        "p_partkey",
        deterministic_uniform(F.col("p_partkey"), salt=0).alias("p_value"),
    )
    out = qvalues_by(p, "p_value")
    return out.select(
        "p_partkey",
        F.round("p_value", 9).alias("p_value"),
        F.round("q_value", 9).alias("q_value"),
    )


# --- ext: corpus-level lexical statistics (Zipf fit, hapax richness) --------


_ZIPF_ORACLE = r"""
WITH freq AS (
  SELECT token, count(*) AS n
  FROM (
    SELECT unnest(string_split_regex(trim(lower(text)),
                                     '[ \t\n\x0B\f\r]+')) AS token
    FROM documents WHERE len(trim(text)) > 0
  ) WHERE token <> ''
  GROUP BY token
),
top AS (SELECT token, n FROM freq ORDER BY n DESC, token ASC LIMIT 500),
ranked AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, token ASC)
                 AS DOUBLE)) AS x,
         ln(CAST(n AS DOUBLE)) AS y
  FROM top
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_terms,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM ranked
),
fit AS (
  SELECT n_terms, sx, sy, syy,
         CAST(n_terms AS DOUBLE) * sxy - sx * sy AS cov,
         CAST(n_terms AS DOUBLE) * sxx - sx * sx AS varx,
         CAST(n_terms AS DOUBLE) * syy - sy * sy AS vary
  FROM agg
)
SELECT round(cov / varx, 6) AS slope,
  round((sy - (cov / varx) * sx) / CAST(n_terms AS DOUBLE), 6)
    AS intercept,
  round(cov * cov / (varx * vary), 6) AS r2,
  n_terms
FROM fit
"""


@_q("zipf_slope", _ZIPF_ORACLE)
def q_zipf_slope(spark, sf):
    """Zipf-law OLS fit over the top-500 token frequencies
    (extensions.text.zipf_slope): data-sized work is the existing
    token-frequency aggregation; the regression runs over the bounded
    500-row frame. Corpus-level quality gate (natural text ~ slope
    -1)."""
    from padua_spark.extensions.text import zipf_slope

    d = _t(spark, sf, "documents")
    out = zipf_slope(d, "text", top_n=500)
    return out.select(
        _r("slope").alias("slope"),
        _r("intercept").alias("intercept"),
        _r("r2").alias("r2"),
        "n_terms",
    )


_HAPAX_ORACLE = r"""
WITH pt AS (
  SELECT lang, token, count(*) AS c
  FROM (
    SELECT lang, unnest(string_split_regex(trim(lower(text)),
                                           '[ \t\n\x0B\f\r]+')) AS token
    FROM documents WHERE len(trim(text)) > 0
  ) WHERE token <> ''
  GROUP BY lang, token
)
SELECT lang,
  CAST(sum(c) AS BIGINT) AS n_tokens,
  CAST(count(*) AS BIGINT) AS vocab_size,
  CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax_count,
  round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
    AS type_token_ratio,
  round(CAST(count(*) FILTER (WHERE c = 1) AS DOUBLE)
        / CAST(count(*) AS DOUBLE), 6) AS hapax_ratio
FROM pt GROUP BY lang
"""


@_q("hapax_stats", _HAPAX_ORACLE)
def q_hapax_stats(spark, sf):
    """Per-language vocabulary richness (extensions.text.hapax_stats):
    total tokens, vocab size, hapax legomena, type-token and hapax
    ratios — lexical-diversity screen per corpus shard. Integer counts
    end to end; ratios are one IEEE division each."""
    from padua_spark.extensions.text import hapax_stats

    d = _t(spark, sf, "documents")
    out = hapax_stats(d, ["lang"], "text")
    return out.select(
        "lang", "n_tokens", "vocab_size", "hapax_count",
        _r("type_token_ratio").alias("type_token_ratio"),
        _r("hapax_ratio").alias("hapax_ratio"),
    )


# --- ext: product quantization (PQ encode + ADC top-k) ----------------------


_PQ_CB_SQL = """
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)
),
cb AS (
  SELECT ss.s AS subspace, seeds.code,
         list_slice(seeds.v, ss.s * 16 + 1, (ss.s + 1) * 16) AS w
  FROM (SELECT unnest(generate_series(0, 3)) AS s) ss, seeds
),
enc AS (
  SELECT e.vec_id, cb.subspace,
    min(struct_pack(
      d := list_reduce(list_prepend(0.0,
             list_transform(generate_series(1, 16),
               i -> (e.v[cb.subspace * 16 + i] - cb.w[i])
                    * (e.v[cb.subspace * 16 + i] - cb.w[i]))),
           (a, b) -> a + b),
      c := cb.code)) AS best
  FROM e, cb
  GROUP BY e.vec_id, cb.subspace
),
codes AS (
  SELECT vec_id,
    CAST(max(CASE WHEN subspace = 0 THEN best.c END) AS INT) AS code_0,
    CAST(max(CASE WHEN subspace = 1 THEN best.c END) AS INT) AS code_1,
    CAST(max(CASE WHEN subspace = 2 THEN best.c END) AS INT) AS code_2,
    CAST(max(CASE WHEN subspace = 3 THEN best.c END) AS INT) AS code_3
  FROM enc GROUP BY vec_id
)
"""

_PQ_QUERY = [float((i * 7) % 13) / 13.0 for i in range(64)]
_PQ_QUERY_SQL = "[" + ", ".join(repr(x) for x in _PQ_QUERY) + "]"


@_q("pq_encode", f"WITH {_PQ_CB_SQL} SELECT * FROM codes")
def q_pq_encode(spark, sf):
    """PQ encoding of the embeddings corpus (similarity.pq_encode):
    4 subspaces x 16 deterministic seed codewords (the no-RNG
    smallest-ids rule), per-subspace argmin as zero-shuffle per-row
    array algebra with the (dist, code) struct-min tie rule. 64-dim
    float vectors compress to 4 small ints per row — the at-rest
    representation for billion-vector ANN."""
    from padua_spark.extensions.similarity import (
        pq_codebooks,
        pq_encode,
    )

    emb = _t(spark, sf, "embeddings")
    cbs = pq_codebooks(emb, "vec_id", "embedding", m_subspaces=4,
                       k_codes=16)
    return pq_encode(emb, "vec_id", "embedding", cbs)


@_q(
    "pq_topk",
    f"""
WITH {_PQ_CB_SQL},
q AS (SELECT CAST({_PQ_QUERY_SQL} AS DOUBLE[]) AS qv),
dt AS (
  SELECT cb.subspace, cb.code,
    list_reduce(list_prepend(0.0,
      list_transform(generate_series(1, 16),
        i -> (q.qv[cb.subspace * 16 + i] - cb.w[i])
             * (q.qv[cb.subspace * 16 + i] - cb.w[i]))),
      (a, b) -> a + b) AS d
  FROM cb, q
),
scored AS (
  SELECT c.vec_id, d0.d + d1.d + d2.d + d3.d AS adc
  FROM codes c
  JOIN dt d0 ON d0.subspace = 0 AND d0.code = c.code_0
  JOIN dt d1 ON d1.subspace = 1 AND d1.code = c.code_1
  JOIN dt d2 ON d2.subspace = 2 AND d2.code = c.code_2
  JOIN dt d3 ON d3.subspace = 3 AND d3.code = c.code_3
)
SELECT vec_id, round(adc, 6) AS adc_dist
FROM scored ORDER BY adc, vec_id LIMIT 10
""",
)
def q_pq_topk(spark, sf):
    """ADC top-10 over the PQ codes (similarity.pq_topk): the query
    stays unquantized, a 4x16 distance table is precomputed with the
    same left-fold as the encode step, and each row's approximate
    distance is 4 lookups + a left-fold sum — zero shuffle, then
    TakeOrdered. The classic PQ scoring loop, relationally."""
    from padua_spark.extensions.similarity import (
        pq_codebooks,
        pq_encode,
        pq_topk,
    )

    emb = _t(spark, sf, "embeddings")
    cbs = pq_codebooks(emb, "vec_id", "embedding", m_subspaces=4,
                       k_codes=16)
    enc = pq_encode(emb, "vec_id", "embedding", cbs)
    out = pq_topk(enc, "vec_id", cbs, _PQ_QUERY, k=10)
    return out.select("vec_id", _r("adc_dist").alias("adc_dist"))


# --- ext: distribution audits (Gini, Benford, chi-square GOF) ---------------


_GINI_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      AS cents
  FROM orders GROUP BY o_custkey
),
per AS (
  SELECT cents AS v, count(*) AS c FROM spend
  WHERE cents IS NOT NULL AND cents >= 0 GROUP BY v
),
run AS (
  SELECT *, sum(c) OVER (ORDER BY v
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
  FROM per
),
agg AS (
  SELECT sum(c) AS n, sum(v * c) AS s,
         sum(v * c * (2 * (f - c) + c + 1)) AS t2
  FROM run
)
SELECT round(CAST(t2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini,
  CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS total
FROM agg
"""


@_q("gini_spend", _GINI_ORACLE)
def q_gini_spend(spark, sf):
    """Gini coefficient of customer spend concentration
    (quality.gini_concentration): per-customer revenue in exact
    integer cents, per-distinct-value counts through the DISTRIBUTED
    two-pass cumsum (never a data-sized global sort), midrank-exact
    under ties, three decimal-exact integer sums -> one shared double
    expression."""
    from padua_spark.extensions.quality import gini_concentration

    orders = _t(spark, sf, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("cents")
    )
    out = gini_concentration(spend, "cents")
    return out.select(_r("gini").alias("gini"), "n", "total")


_BENFORD_ORACLE = """
WITH cents AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
),
obs AS (
  SELECT CAST(left(CAST(v AS VARCHAR), 1) AS INT) AS digit,
         count(*) AS n_obs
  FROM cents WHERE v IS NOT NULL AND v > 0 GROUP BY 1
),
d AS (
  SELECT unnest(generate_series(1, 9)) AS digit
),
j AS (
  SELECT d.digit, COALESCE(obs.n_obs, 0) AS n_obs,
         log10(1.0 + 1.0 / d.digit) AS p_benford
  FROM d LEFT JOIN obs ON d.digit = obs.digit
),
t AS (SELECT CAST(sum(n_obs) AS DOUBLE) AS total FROM j)
SELECT j.digit, CAST(j.n_obs AS BIGINT) AS n_obs,
  round(CAST(j.n_obs AS DOUBLE) / t.total, 6) AS p_observed,
  round(j.p_benford, 9) AS p_benford,
  round((CAST(j.n_obs AS DOUBLE) - t.total * j.p_benford)
        * (CAST(j.n_obs AS DOUBLE) - t.total * j.p_benford)
        / (t.total * j.p_benford), 6) AS chi2_term
FROM j, t
"""


@_q("benford_audit", _BENFORD_ORACLE)
def q_benford_audit(spark, sf):
    """Benford first-digit audit of order amounts
    (quality.benford_first_digit): digit from the INTEGER cents
    string (no log10 float edges at powers of ten), all 9 digits
    present with zero-fill, per-digit chi-square contribution —
    the forensic screen for fabricated amount columns."""
    from padua_spark.extensions.quality import benford_first_digit

    orders = _t(spark, sf, "orders")
    cents = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    out = benford_first_digit(cents, "cents")
    return out.select(
        "digit", "n_obs",
        _r("p_observed").alias("p_observed"),
        _r("p_benford", 9).alias("p_benford"),
        _r("chi2_term").alias("chi2_term"),
    )


_CHI2_GOF_ORACLE = """
WITH c AS (
  SELECT o_orderpriority AS cat, count(*) AS n
  FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY cat
),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS total,
             CAST(count(*) AS BIGINT) AS k FROM c),
per AS (
  SELECT (CAST(n AS DOUBLE) - t.total / CAST(t.k AS DOUBLE))
         * (CAST(n AS DOUBLE) - t.total / CAST(t.k AS DOUBLE))
         / (t.total / CAST(t.k AS DOUBLE)) AS term,
         n, t.k
  FROM c, t
),
a AS (
  SELECT sum(term) AS chi2, CAST(sum(n) AS BIGINT) AS n_total,
         max(k) AS k_categories, max(k) - 1 AS dfree
  FROM per
)
SELECT round(chi2, 6) AS chi2, n_total, k_categories,
  CAST(dfree AS BIGINT) AS dfree,
  round(exp(-chi2 / 2.0) * (1.0 + chi2 / 2.0), 9) AS p_chi2
FROM a
"""


@_q("chi2_gof", _CHI2_GOF_ORACLE)
def q_chi2_gof(spark, sf):
    """Chi-square goodness-of-fit of the order-priority mix against
    uniform (quality.chi2_gof): does the shard's categorical mix
    match design? 5 categories -> df = 4 (even), so the chi-square
    survival has the finite closed form exp(-x/2)(1 + x/2) shared
    verbatim with the oracle — the p-value is value-hash gated."""
    from padua_spark.extensions.quality import chi2_gof

    orders = _t(spark, sf, "orders")
    out = chi2_gof(orders, "o_orderpriority")
    chi2 = F.col("chi2")
    return out.select(
        _r("chi2").alias("chi2"),
        "n_total", "k_categories", "dfree",
        _r(F.exp(-chi2 / 2.0) * (1.0 + chi2 / 2.0), 9).alias("p_chi2"),
    )


# --- ext: exact n-gram decontamination (eval-leak membership test) ----------


def _decontaminate_oracle() -> str:
    m = 2147483647
    coefs = [(1000000007 ** j) % m for j in range(5)]
    acc = "CAST(0 AS BIGINT)"
    for j, c in enumerate(coefs):
        acc = f"(({acc} + th[i + {j}] * {c}) % {m})"
    return f"""
WITH t AS (
  SELECT doc_id,
    list_transform(string_split(text, ' '), w -> list_reduce(
        list_prepend(CAST(7 AS BIGINT),
          list_transform(list_filter(string_split(w, ''), c -> c <> ''),
                         c -> CAST(ord(c) AS BIGINT))),
        (a, c) -> (a * 131 + c) % {m})) AS th
  FROM documents
),
g AS (
  SELECT doc_id,
    list_distinct(list_transform(generate_series(1, len(th) - 4),
                                 i -> {acc})) AS sh
  FROM t WHERE len(th) >= 5
),
ev AS (
  SELECT DISTINCT shingle FROM (
    SELECT unnest(sh) AS shingle FROM g WHERE doc_id % 7 = 0
  )
),
tr AS (
  SELECT doc_id, unnest(sh) AS shingle FROM g WHERE doc_id % 7 <> 0
)
SELECT tr.doc_id,
  CAST(count(DISTINCT tr.shingle) AS BIGINT) AS n_shared_ngrams
FROM tr JOIN ev ON tr.shingle = ev.shingle
GROUP BY tr.doc_id
"""


@_q("decontaminate_ngrams", _decontaminate_oracle())
def q_decontaminate_ngrams(spark, sf):
    """Exact 5-token-window decontamination of a 6/7 train split
    against its 1/7 eval split (dedup.decontaminate_ngrams): the
    strict membership test benchmark decontamination requires,
    complementing the fuzzy MinHash contamination_check. Short docs
    emit no windows (no shingle fallback); the distinct eval n-gram
    set is broadcast, so the train side never shuffles."""
    from padua_spark.extensions.dedup import decontaminate_ngrams

    d = _t(spark, sf, "documents")
    ev = d.where(F.col("doc_id") % 7 == 0)
    tr = d.where(F.col("doc_id") % 7 != 0)
    return decontaminate_ngrams(
        tr, ev, "doc_id", "text", n_tokens=5
    )


# --- ext: k-sample Anderson-Darling (tail-sensitive k-group ECDF test) ------


_AD_KSAMP_ORACLE = """
WITH vals AS (
  SELECT l_returnflag AS g, l_quantity AS v
  FROM lineitem
  WHERE l_returnflag IN ('A', 'N', 'R') AND l_quantity IS NOT NULL
),
per AS (
  SELECT v,
    count(*) FILTER (WHERE g = 'A') AS c0,
    count(*) FILTER (WHERE g = 'N') AS c1,
    count(*) FILTER (WHERE g = 'R') AS c2,
    count(*) AS ct
  FROM vals GROUP BY v
),
run AS (
  SELECT *,
    sum(c0) OVER w AS f0, sum(c1) OVER w AS f1, sum(c2) OVER w AS f2,
    sum(ct) OVER w AS ft,
    sum(c0) OVER () AS n0, sum(c1) OVER () AS n1, sum(c2) OVER () AS n2,
    sum(ct) OVER () AS nt,
    count(*) OVER () AS nl
  FROM per
  WINDOW w AS (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
t AS (
  SELECT nt, nl, n0, n1, n2, ct,
    (2 * ft - ct) * (2 * nt - (2 * ft - ct)) - nt * ct AS den,
    nt * (2 * f0 - c0) - n0 * (2 * ft - ct) AS x0,
    nt * (2 * f1 - c1) - n1 * (2 * ft - ct) AS x1,
    nt * (2 * f2 - c2) - n2 * (2 * ft - ct) AS x2
  FROM run
),
s AS (
  SELECT max(nt) AS nt, max(nl) AS nl,
    max(n0) AS n0, max(n1) AS n1, max(n2) AS n2,
    sum(CASE WHEN den > 0 THEN
      CAST(CAST(ct AS HUGEINT) * CAST(x0 AS HUGEINT)
           * CAST(x0 AS HUGEINT) AS DOUBLE) / CAST(den AS DOUBLE)
      ELSE 0.0 END) AS s0,
    sum(CASE WHEN den > 0 THEN
      CAST(CAST(ct AS HUGEINT) * CAST(x1 AS HUGEINT)
           * CAST(x1 AS HUGEINT) AS DOUBLE) / CAST(den AS DOUBLE)
      ELSE 0.0 END) AS s1,
    sum(CASE WHEN den > 0 THEN
      CAST(CAST(ct AS HUGEINT) * CAST(x2 AS HUGEINT)
           * CAST(x2 AS HUGEINT) AS DOUBLE) / CAST(den AS DOUBLE)
      ELSE 0.0 END) AS s2
  FROM t
)
SELECT round((CAST(nt AS DOUBLE) - 1.0) / CAST(nt AS DOUBLE)
             * (s0 / CAST(n0 AS DOUBLE) + s1 / CAST(n1 AS DOUBLE)
                + s2 / CAST(n2 AS DOUBLE)) / CAST(nt AS DOUBLE),
             6) AS a2_akn,
  CAST(nt AS BIGINT) AS n_total, CAST(3 AS BIGINT) AS k_groups,
  CAST(nl AS BIGINT) AS n_distinct
FROM s
"""


@_q("anderson_darling_ksamp", _AD_KSAMP_ORACLE)
def q_anderson_darling_ksamp(spark, sf):
    """k-sample Anderson-Darling across the three returnflag groups
    (stats.anderson_darling_ksamp): the Scholz-Stephens midrank
    statistic from ONE pass of the shared distributed cumsum —
    doubled half-steps keep every numerator/denominator an exact
    integer (h*X^2 summed as decimal/HUGEINT; X reaches 2N^2, so its
    square overflows int64), one division per (group, value). The
    tail-sensitive complement to KS and Kruskal-Wallis."""
    from padua_spark.operators.stats import anderson_darling_ksamp

    li = _t(spark, sf, "lineitem")
    out = anderson_darling_ksamp(
        li, "l_returnflag", "l_quantity", ["A", "N", "R"]
    )
    return out.select(
        _r("a2_akn").alias("a2_akn"),
        "n_total", "k_groups", "n_distinct",
    )


# --- ext: join-planning diagnostics (key skew, exact join cardinality) ------


_SKEW_PROFILE_ORACLE = """
WITH c AS (
  SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id
),
t AS (
  SELECT CAST(sum(n_rows) AS DOUBLE) AS total,
         CAST(count(*) AS DOUBLE) AS n_keys
  FROM c
)
SELECT c.user_id, CAST(c.n_rows AS BIGINT) AS n_rows,
  round(CAST(c.n_rows AS DOUBLE) / t.total, 6) AS share,
  round(CAST(c.n_rows AS DOUBLE) / (t.total / t.n_keys), 6)
    AS skew_ratio
FROM c, t
ORDER BY c.n_rows DESC, c.user_id ASC
LIMIT 20
"""


@_q("skew_profile", _SKEW_PROFILE_ORACLE)
def q_skew_profile(spark, sf):
    """Top-20 heaviest event users with share and skew ratio
    (skew.skew_profile): the pre-shuffle diagnostic for any 100 TB
    join/agg key — one partial+final hash aggregation, a 1-row
    broadcast summary (never a partitionless window over the key
    frame), TakeOrdered."""
    from padua_spark.operators.skew import skew_profile

    ev = _t(spark, sf, "events")
    out = skew_profile(ev, ["user_id"], top_k=20)
    return out.select(
        "user_id", "n_rows",
        _r("share").alias("share"),
        _r("skew_ratio").alias("skew_ratio"),
    )


_JOIN_CARD_ORACLE = """
WITH ca AS (
  SELECT o_orderkey AS k, count(*) AS ca FROM orders GROUP BY 1
),
cb AS (
  SELECT l_orderkey AS k, count(*) AS cb FROM lineitem GROUP BY 1
),
p AS (
  SELECT CAST(ca AS HUGEINT) * CAST(cb AS HUGEINT) AS pr
  FROM ca JOIN cb USING (k)
)
SELECT CAST(count(*) AS BIGINT) AS matched_keys,
  CAST(sum(pr) AS BIGINT) AS join_rows,
  CAST(max(pr) AS BIGINT) AS max_key_pairs,
  round(CAST(max(pr) AS DOUBLE) / CAST(sum(pr) AS DOUBLE), 6)
    AS top_key_share
FROM p
"""


@_q("join_cardinality", _JOIN_CARD_ORACLE)
def q_join_cardinality(spark, sf):
    """Exact pre-flight size of orders x lineitem on orderkey
    (skew.join_cardinality): sum of per-key count products over the
    two key-count tables — decimal/HUGEINT exact, payload columns
    never read. The go/no-go check before a 100 TB shuffle join."""
    from padua_spark.operators.skew import join_cardinality

    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    out = join_cardinality(orders, "o_orderkey", li, "l_orderkey")
    return out.select(
        "matched_keys", "join_rows", "max_key_pairs",
        _r("top_key_share").alias("top_key_share"),
    )


# --- ext: two-proportion z, Welch ANOVA, mutual information -----------------


_TWO_PROP_ORACLE = """
WITH a AS (
  SELECT
    count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_a,
    count(CASE WHEN o_orderstatus = 'O'
               AND o_orderpriority = '1-URGENT' THEN 1 END) AS x_a,
    count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_b,
    count(CASE WHEN o_orderstatus = 'F'
               AND o_orderpriority = '1-URGENT' THEN 1 END) AS x_b
  FROM orders
),
z AS (
  SELECT *,
    CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
    CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
    (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
     - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
    / sqrt(
        (CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        * (1.0 - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
      ) AS zv
  FROM a
),
e AS (
  SELECT *, abs(zv) / sqrt(2.0) AS x,
         1.0 / (1.0 + 0.3275911 * (abs(zv) / sqrt(2.0))) AS t
  FROM z
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a,
  CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b,
  round(p_a, 6) AS p_a, round(p_b, 6) AS p_b, round(zv, 6) AS z,
  round((0.254829592 * t + -0.284496736 * t * t
         + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
         + 1.061405429 * t * t * t * t * t) * exp(-x * x), 9)
    AS p_value
FROM e
"""


@_q("two_proportion_z", _TWO_PROP_ORACLE)
def q_two_proportion_z(spark, sf):
    """A/B-test primitive (stats.two_proportion_ztest): urgent-order
    rate between open and fulfilled orders — four integer counts from
    one conditional aggregation, pooled z closed form, A&S-erfc p
    shared verbatim with the oracle."""
    from padua_spark.operators.stats import two_proportion_ztest

    orders = _t(spark, sf, "orders")
    out = two_proportion_ztest(
        orders, "o_orderstatus",
        F.col("o_orderpriority") == "1-URGENT", "O", "F",
    )
    return out.select(
        "n_a", "x_a", "n_b", "x_b",
        _r("p_a").alias("p_a"), _r("p_b").alias("p_b"),
        _r("z").alias("z"), _r("p_value", 9).alias("p_value"),
    )


_WELCH_ORACLE = """
WITH pg AS (
  SELECT l_partkey, l_returnflag,
         count(l_quantity) AS n, avg(l_quantity) AS m,
         var_samp(l_quantity) AS v
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2
),
f AS (SELECT * FROM pg WHERE n >= 2 AND v > 0),
c AS (
  SELECT l_partkey,
    CAST(count(*) AS BIGINT) AS k_groups,
    CAST(sum(n) AS BIGINT) AS n_total,
    sum(CAST(n AS DOUBLE) / v) AS sw,
    sum(CAST(n AS DOUBLE) / v * m) AS swm,
    sum(CAST(n AS DOUBLE) / v * m * m) AS swm2,
    sum(1.0 / (CAST(n AS DOUBLE) - 1.0)) AS s1,
    sum(CAST(n AS DOUBLE) / v / (CAST(n AS DOUBLE) - 1.0)) AS sw1,
    sum((CAST(n AS DOUBLE) / v) * (CAST(n AS DOUBLE) / v)
        / (CAST(n AS DOUBLE) - 1.0)) AS sw2
  FROM f GROUP BY 1
),
w AS (
  SELECT l_partkey, k_groups, n_total,
    CAST(k_groups AS DOUBLE) AS kd,
    s1 - 2.0 / sw * sw1 + sw2 / (sw * sw) AS s,
    (swm2 - swm * swm / sw) AS ssb
  FROM c
)
SELECT l_partkey,
  round(CASE WHEN k_groups >= 2
             AND (1.0 + 2.0 * (kd - 2.0) / (kd * kd - 1.0) * s) > 0
        THEN (ssb / (kd - 1.0))
             / (1.0 + 2.0 * (kd - 2.0) / (kd * kd - 1.0) * s)
        END, 6) AS f_stat,
  CASE WHEN k_groups >= 2 THEN kd - 1.0 END AS dfn,
  round(CASE WHEN k_groups >= 2 AND s > 0
        THEN (kd * kd - 1.0) / (3.0 * s) END, 6) AS dfd,
  k_groups, n_total
FROM w
"""


@_q("welch_anova_stats", _WELCH_ORACLE)
def q_welch_anova_stats(spark, sf):
    """Welch's unequal-variance one-way ANOVA per part across
    returnflag groups (stats.welch_anova_stats): the robustness
    companion to anova_1way_stats — every Welch ingredient is a
    linear sum of per-group (n, mean, var), so the plan is the same
    two cascaded aggregations."""
    from padua_spark.operators.stats import welch_anova_stats

    li = _t(spark, sf, "lineitem")
    out = welch_anova_stats(
        li, ["l_partkey"], "l_returnflag", "l_quantity"
    )
    return out.select(
        "l_partkey",
        _r("f_stat").alias("f_stat"),
        "dfn",
        _r("dfd").alias("dfd"),
        "k_groups", "n_total",
    )


_MI_ORACLE = """
WITH j AS (
  SELECT o_orderstatus AS a, o_orderpriority AS b, count(*) AS nab
  FROM orders
  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
  GROUP BY 1, 2
),
ma AS (SELECT a, sum(nab) AS na FROM j GROUP BY 1),
mb AS (SELECT b, sum(nab) AS nb FROM j GROUP BY 1),
t AS (
  SELECT CAST(sum(nab) AS DOUBLE) AS n,
         CAST(count(DISTINCT a) AS BIGINT) AS k_a,
         CAST(count(DISTINCT b) AS BIGINT) AS k_b,
         CAST(sum(nab) AS BIGINT) AS n_total
  FROM j
)
SELECT
  round(sum(CAST(j.nab AS DOUBLE) / t.n
            * ln(t.n * CAST(j.nab AS DOUBLE)
                 / (CAST(ma.na AS DOUBLE) * CAST(mb.nb AS DOUBLE)))),
        6) AS mi_nats,
  max(t.n_total) AS n_total, max(t.k_a) AS k_a, max(t.k_b) AS k_b
FROM j JOIN ma USING (a) JOIN mb USING (b), t
"""


@_q("mutual_information", _MI_ORACLE)
def q_mutual_information(spark, sf):
    """Mutual information (nats) between order status and priority
    (stats.mutual_information): the effect-size companion to
    chi2_independence — joint counts once (persisted; four
    consumers), margins derived from the joint table, exact integer
    counts inside the log."""
    from padua_spark.operators.stats import mutual_information

    orders = _t(spark, sf, "orders")
    out = mutual_information(orders, "o_orderstatus", "o_orderpriority")
    return out.select(
        _r("mi_nats").alias("mi_nats"), "n_total", "k_a", "k_b"
    )


# --- ext: Theil-Sen robust trend per bounded group --------------------------


_THEIL_SEN_ORACLE = """
WITH pts AS (
  SELECT l_orderkey AS g, CAST(l_linenumber AS DOUBLE) AS x,
         l_quantity AS y
  FROM lineitem
  WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL
),
pairs AS (
  SELECT a.g, (b.y - a.y) / (b.x - a.x) AS s
  FROM pts a JOIN pts b ON a.g = b.g AND a.x < b.x
),
np AS (SELECT g, CAST(count(*) AS BIGINT) AS n_pairs FROM pairs GROUP BY g),
sl AS (SELECT g, median(s) AS slope FROM pairs GROUP BY g),
resid AS (
  SELECT p.g, p.y - sl.slope * p.x AS r
  FROM pts p JOIN sl ON p.g = sl.g
),
ic AS (SELECT g, median(r) AS intercept FROM resid GROUP BY g)
SELECT sl.g AS l_orderkey, round(sl.slope, 6) AS slope,
  round(ic.intercept, 6) AS intercept, np.n_pairs
FROM sl JOIN ic ON sl.g = ic.g JOIN np ON sl.g = np.g
"""


@_q("theil_sen_trend", _THEIL_SEN_ORACLE)
def q_theil_sen_trend(spark, sf):
    """Theil-Sen robust quantity trend over line numbers per order
    (stats.theil_sen_by_group): bounded groups by construction
    (<= 7 lineitems per order -> <= 21 pairs), exact ANSI medians via
    the relational group_medians path — the outlier-robust
    counterpart to linregress for short per-key series."""
    from padua_spark.operators.stats import theil_sen_by_group

    li = _t(spark, sf, "lineitem").select(
        "l_orderkey",
        F.col("l_linenumber").cast("double").alias("x"),
        F.col("l_quantity").alias("y"),
    )
    out = theil_sen_by_group(li, ["l_orderkey"], "x", "y")
    return out.select(
        "l_orderkey",
        _r("slope").alias("slope"),
        _r("intercept").alias("intercept"),
        "n_pairs",
    )


# --- ext: bounded EWMA over event time --------------------------------------


_EWMA_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS tu, value
  FROM events WHERE value IS NOT NULL
),
w AS (
  SELECT event_id, user_id,
    array_agg(value) OVER (PARTITION BY user_id ORDER BY tu, event_id
       ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS win
  FROM e
)
SELECT event_id, user_id,
  round(
    list_reduce(list_prepend(0.0,
      list_transform(generate_series(1, len(win)),
        i -> win[i] * pow(0.7, CAST(len(win) - i AS DOUBLE)))),
      (a, b) -> a + b)
    /
    list_reduce(list_prepend(0.0,
      list_transform(generate_series(1, len(win)),
        i -> pow(0.7, CAST(len(win) - i AS DOUBLE)))),
      (a, b) -> a + b), 6) AS ewma
FROM w
"""


@_q("ewma_user_value", _EWMA_ORACLE)
def q_ewma_user_value(spark, sf):
    """Per-user bounded EWMA of event values (temporal.ewma_bounded,
    alpha=0.3, last 8 events): one shuffle by user, one BOUNDED sorted
    window frame (state per row is <= 8 values, never an unbounded
    running frame), per-row left-fold with positional weights shared
    verbatim with the oracle. Event-time order compares in
    MICROSECONDS (ts div 1000) with event_id tiebreak — DuckDB reads
    the nanos parquet truncated to us, so ordering on raw nanos would
    silently diverge on sub-us ties."""
    from padua_spark.operators.temporal import ewma_bounded
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = (
        base.where(F.col("value").isNotNull())
        .select(
            "event_id", "user_id",
            epoch_us_col(base, "ts").alias("_tu"), "value",
        )
    )
    out = ewma_bounded(
        ev, ["user_id"], ["_tu", "event_id"], "value",
        alpha=0.3, window=8,
    )
    return out.select(
        "event_id", "user_id", _r("ewma").alias("ewma")
    )


# --- ext: PPJoin prefix-filtered exact similarity join ----------------------


def _ppjoin_oracle(threshold: float = 0.5) -> str:
    return rf"""
WITH t AS (
  SELECT doc_id,
    list_transform(string_split(text, ' '), w -> list_reduce(
        list_prepend(CAST(7 AS BIGINT),
          list_transform(list_filter(string_split(w, ''), c -> c <> ''), c -> CAST(ord(c) AS BIGINT))),
        (a, c) -> (a * 131 + c) % 2147483647)) AS th
  FROM documents
),
s AS (
  SELECT doc_id,
    CASE WHEN len(th) >= 3 THEN
      list_distinct(list_transform(generate_series(1, len(th) - 2),
        i -> (th[i] * 1 + th[i+1] * {_JACCARD_C1}
              + th[i+2] * {_JACCARD_C2}) % 2147483647))
    ELSE [th[1]] END AS sh
  FROM t
),
ex AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
dfq AS (SELECT shingle, count(*) AS dfc FROM ex GROUP BY shingle),
sz AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
ranked AS (
  SELECT e.doc_id, e.shingle, z.n,
    row_number() OVER (PARTITION BY e.doc_id ORDER BY d.dfc, e.shingle)
      AS pos
  FROM ex e JOIN dfq d USING (shingle) JOIN sz z USING (doc_id)
),
pref AS (
  SELECT * FROM ranked
  WHERE pos <= n - ceil({threshold} * n) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
    a.n AS na, b.n AS nb
  FROM pref a JOIN pref b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE CAST(least(a.n, b.n) AS DOUBLE)
        >= {threshold} * greatest(a.n, b.n)
),
ver AS (
  SELECT c.id_a, c.id_b,
    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) AS icnt,
    c.na, c.nb
  FROM cand c
  JOIN s sa ON sa.doc_id = c.id_a
  JOIN s sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b,
  round(icnt / (na + nb - icnt), 6) AS jaccard
FROM ver
WHERE icnt / (na + nb - icnt) >= {threshold}
"""


@_q("ppjoin_pairs", _ppjoin_oracle())
def q_ppjoin_pairs(spark, sf):
    """Exact Jaccard>=0.5 document pairs via PPJoin prefix filtering
    (dedup.ppjoin_pairs): postings are emitted only for each doc's
    rarest-first prefix (~(1-t)n+1 of n shingles), so the inverted
    index join never sees the hot high-df shingles — the at-scale
    EXACT counterpart to the approximate minhash_lsh_candidates
    entry. Threshold 0.5 is binary-exact, so ceil(t*n) prefix lengths
    are bit-identical across engines."""
    from padua_spark.extensions import dedup as x_dedup

    d = _t(spark, sf, "documents")
    out = x_dedup.ppjoin_pairs(
        d, "doc_id", "text", threshold=0.5, k_shingle=3
    )
    return out.select("id_a", "id_b", _r("jaccard").alias("jaccard"))


# --- ext: asymmetric containment join ---------------------------------------


def _containment_oracle_pairs(threshold: float = 0.75) -> str:
    return rf"""
WITH t AS (
  SELECT doc_id,
    list_transform(string_split(text, ' '), w -> list_reduce(
        list_prepend(CAST(7 AS BIGINT),
          list_transform(list_filter(string_split(w, ''), c -> c <> ''), c -> CAST(ord(c) AS BIGINT))),
        (a, c) -> (a * 131 + c) % 2147483647)) AS th
  FROM documents
),
s AS (
  SELECT doc_id,
    CASE WHEN len(th) >= 3 THEN
      list_distinct(list_transform(generate_series(1, len(th) - 2),
        i -> (th[i] * 1 + th[i+1] * {_JACCARD_C1}
              + th[i+2] * {_JACCARD_C2}) % 2147483647))
    ELSE [th[1]] END AS sh
  FROM t
),
ex AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
dfq AS (SELECT shingle, count(*) AS dfc FROM ex GROUP BY shingle),
sz AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
probe AS (
  SELECT doc_id AS id_a, shingle, n AS na FROM (
    SELECT e.doc_id, e.shingle, z.n,
      row_number() OVER (PARTITION BY e.doc_id ORDER BY d.dfc, e.shingle)
        AS pos
    FROM ex e JOIN dfq d USING (shingle) JOIN sz z USING (doc_id)
  ) WHERE pos <= n - ceil({threshold} * n) + 1
),
idx AS (
  SELECT e.doc_id AS id_b, e.shingle, z.n AS nb
  FROM ex e JOIN sz z USING (doc_id)
),
cand AS (
  SELECT DISTINCT p.id_a, i.id_b, p.na, i.nb
  FROM probe p JOIN idx i ON p.shingle = i.shingle
  WHERE p.id_a <> i.id_b
    AND CAST(i.nb AS DOUBLE) >= ceil({threshold} * p.na)
),
ver AS (
  SELECT c.id_a, c.id_b,
    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) AS icnt,
    c.na, c.nb
  FROM cand c
  JOIN s sa ON sa.doc_id = c.id_a
  JOIN s sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b,
  round(icnt / na, 6) AS containment,
  round(icnt / (na + nb - icnt), 6) AS jaccard
FROM ver
WHERE icnt / na >= {threshold}
"""


@_q("containment_pairs", _containment_oracle_pairs())
def q_containment_pairs(spark, sf):
    """Ordered doc pairs with containment |A∩B|/|A| >= 0.75
    (dedup.containment_pairs): the asymmetric quote / doc-inside-doc
    detector Jaccard joins miss. One-sided PPJoin prefix probe against
    a full index — hot shingles never enter the probe side, and the
    nb >= ceil(t*na) size filter prunes before exact verification."""
    from padua_spark.extensions import dedup as x_dedup

    d = _t(spark, sf, "documents")
    out = x_dedup.containment_pairs(
        d, "doc_id", "text", threshold=0.75, k_shingle=3
    )
    return out.select(
        "id_a", "id_b",
        _r("containment").alias("containment"),
        _r("jaccard").alias("jaccard"),
    )


# --- ext: token-pair PMI collocations ---------------------------------------


_TOKEN_PMI_ORACLE = """
WITH tok AS (
  SELECT doc_id,
    unnest(list_distinct(list_filter(string_split(trim(text), ' '),
      t -> t <> ''))) AS t
  FROM documents
),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
dfq AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t),
kept AS (
  SELECT tok.doc_id, tok.t, d.c
  FROM tok JOIN dfq d USING (t), nd
  WHERE d.c >= 2 AND CAST(d.c AS DOUBLE) <= 1.0 * nd.n
),
pairs AS (
  SELECT a.t AS token_a, b.t AS token_b, a.c AS count_a, b.c AS count_b,
    CAST(count(*) AS BIGINT) AS pair_count
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY 1, 2, 3, 4
  HAVING count(*) >= 2
)
SELECT token_a, token_b, pair_count, count_a, count_b,
  round(ln((pair_count / CAST(n AS DOUBLE))
    / ((count_a / CAST(n AS DOUBLE)) * (count_b / CAST(n AS DOUBLE)))),
    6) AS pmi,
  round(CASE WHEN pair_count < n THEN
    ln((pair_count / CAST(n AS DOUBLE))
      / ((count_a / CAST(n AS DOUBLE)) * (count_b / CAST(n AS DOUBLE))))
    / -ln(pair_count / CAST(n AS DOUBLE)) END, 6) AS npmi
FROM pairs, nd
"""


@_q("token_pmi", _TOKEN_PMI_ORACLE)
def q_token_pmi(spark, sf):
    """Document-presence PMI + NPMI for co-occurring token pairs
    (text.token_pmi): df pruning BEFORE the per-doc quadratic
    pairing (min_count + stopword-band max_df_frac), presence counts
    only, so every statistic is an exact integer ratio. The 1-row
    doc-count frame is a broadcast join."""
    from padua_spark.extensions.text import token_pmi

    d = _t(spark, sf, "documents")
    out = token_pmi(
        d, "doc_id", "text",
        min_count=2, min_pair_count=2, max_df_frac=1.0,
    )
    return out.select(
        "token_a", "token_b", "pair_count", "count_a", "count_b",
        _r("pmi").alias("pmi"), _r("npmi").alias("npmi"),
    )


# --- ext: edit-distance verification of banded candidates -------------------


def _edit_verify_oracle() -> str:
    return f"""
WITH mh AS ({_minhash_oracle()}),
txt AS (SELECT doc_id, substr(text, 1, 2000) AS tx FROM documents)
SELECT mh.id_a, mh.id_b, mh.est_jaccard,
  CAST(levenshtein(ta.tx, tb.tx) AS BIGINT) AS edit_distance,
  round(CASE WHEN greatest(length(ta.tx), length(tb.tx)) > 0
    THEN 1.0 - levenshtein(ta.tx, tb.tx)
      / CAST(greatest(length(ta.tx), length(tb.tx)) AS DOUBLE)
    ELSE 1.0 END, 6) AS edit_similarity
FROM mh
JOIN txt ta ON ta.doc_id = mh.id_a
JOIN txt tb ON tb.doc_id = mh.id_b
"""


@_q("edit_distance_verify", _edit_verify_oracle())
def q_edit_distance_verify(spark, sf):
    """Order-sensitive acceptance check over the MinHash candidate set
    (dedup.edit_distance_verify): JVM-builtin Levenshtein on
    2000-char-capped texts, joined onto the BANDED pairs only — the
    O(n*m) distance never sees the cross product. Surfaces
    same-vocabulary / different-order pairs the set measures score
    identically."""
    from padua_spark.extensions import dedup as x_dedup

    d = _t(spark, sf, "documents")
    cand = x_dedup.minhash_lsh_candidates(
        d, "doc_id", "text", k_shingle=3, num_hashes=32, bands=8,
        portable_keys=True,
    )
    out = x_dedup.edit_distance_verify(
        d, "doc_id", "text",
        cand.select("id_a", "id_b", _r("est_jaccard").alias("est_jaccard")),
        max_chars=2000,
    )
    return out.select(
        "id_a", "id_b", "est_jaccard", "edit_distance",
        _r("edit_similarity").alias("edit_similarity"),
    )


# --- ext: leakage-safe feature encoding -------------------------------------


_TE_LOO_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS cat,
    CAST(round(o_totalprice * 100) AS BIGINT) AS yc
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
),
cs AS (
  SELECT cat, CAST(sum(yc) AS BIGINT) AS sy,
    CAST(count(*) AS BIGINT) AS n
  FROM base GROUP BY cat
),
g AS (SELECT sum(yc) / CAST(count(*) AS DOUBLE) AS gm FROM base)
SELECT b.o_orderkey, b.cat AS o_orderpriority,
  round(((sy - yc + 20.0 * gm) / (n - 1 + 20.0)) / 100.0, 6) AS te_loo
FROM base b JOIN cs USING (cat), g
"""


@_q("target_encode_loo", _TE_LOO_ORACLE)
def q_target_encode_loo(spark, sf):
    """Leave-one-out smoothed target encoding of order priority against
    order value (features.target_encode_loo): the leakage-safe
    categorical encoder — each row's own label is excluded from its
    encoding, rare categories shrink onto the global-mean prior. Money
    flows through exact integer cents so the cross-engine sums are
    order-independent."""
    from padua_spark.extensions.features import target_encode_loo

    o = _t(spark, sf, "orders").where(
        F.col("o_orderpriority").isNotNull()
        & F.col("o_totalprice").isNotNull()
    )
    base = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("_yc"),
    )
    out = target_encode_loo(
        base, "o_orderpriority", "_yc", smoothing=20.0
    )
    return out.select(
        "o_orderkey",
        "o_orderpriority",
        _r(F.col("te_loo") / 100.0).alias("te_loo"),
    )


_WOE_IV_ORACLE = """
WITH base AS (
  SELECT o_orderpriority AS cat,
    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS lab
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
),
cs AS (
  SELECT cat, CAST(sum(lab) AS BIGINT) AS n_pos,
    CAST(sum(1 - lab) AS BIGINT) AS n_neg
  FROM base GROUP BY cat
),
tot AS (
  SELECT CAST(sum(n_pos) AS BIGINT) AS tp,
    CAST(sum(n_neg) AS BIGINT) AS tn,
    CAST(count(*) AS BIGINT) AS k
  FROM cs
),
sc AS (
  SELECT cat, n_pos, n_neg,
    ln(((n_pos + 0.5) / (tp + 0.5 * k))
       / ((n_neg + 0.5) / (tn + 0.5 * k))) AS woe,
    ((n_pos + 0.5) / (tp + 0.5 * k))
      - ((n_neg + 0.5) / (tn + 0.5 * k)) AS dp
  FROM cs, tot
)
SELECT cat AS o_orderpriority, n_pos, n_neg,
  round(woe, 6) AS woe,
  round(sum(dp * woe) OVER (), 6) AS iv
FROM sc
"""


@_q("woe_iv", _WOE_IV_ORACLE)
def q_woe_iv(spark, sf):
    """Weight of evidence per order priority against the
    fulfilled-order label, plus the feature-level information value
    (features.woe_iv): one map-side-combining aggregation reduces the
    data to k category rows; the whole-table window for totals and IV
    runs over those k rows, never the data."""
    from padua_spark.extensions.features import woe_iv

    o = _t(spark, sf, "orders").where(
        F.col("o_orderpriority").isNotNull()
        & F.col("o_orderstatus").isNotNull()
    )
    base = o.select(
        "o_orderpriority",
        (F.col("o_orderstatus") == "F").cast("int").alias("_lab"),
    )
    out = woe_iv(base, "o_orderpriority", "_lab", smoothing=0.5)
    return out.select(
        "o_orderpriority", "n_pos", "n_neg",
        _r("woe").alias("woe"), _r("iv").alias("iv"),
    )


# --- ext: CUSUM change-point scan per key ------------------------------------


_CUSUM_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id,
    CAST(round(value * 1000000) AS BIGINT) AS vc
  FROM events WHERE value IS NOT NULL
),
m AS (
  SELECT user_id, sum(vc) / CAST(count(*) AS DOUBLE) AS mu
  FROM e GROUP BY user_id
),
w AS (
  SELECT e.user_id,
    sum(vc - mu) OVER (PARTITION BY e.user_id ORDER BY tu, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
    row_number() OVER (PARTITION BY e.user_id ORDER BY tu, event_id)
      AS pos
  FROM e JOIN m USING (user_id)
),
s AS (
  SELECT user_id, pos,
    c - least(0.0, min(c) OVER (PARTITION BY user_id ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS sp,
    greatest(0.0, max(c) OVER (PARTITION BY user_id ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - c AS sn
  FROM w
),
x AS (
  SELECT user_id, pos, sp, sn,
    max(sp) OVER (PARTITION BY user_id) AS msp,
    max(sn) OVER (PARTITION BY user_id) AS msn
  FROM s
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
  round(max(sp) / 1000000.0, 6) AS cusum_pos_max,
  round(max(sn) / 1000000.0, 6) AS cusum_neg_max,
  CAST(min(CASE WHEN sp = msp THEN pos END) AS BIGINT) AS cp_pos,
  CAST(min(CASE WHEN sn = msn THEN pos END) AS BIGINT) AS cp_neg
FROM x GROUP BY user_id
"""


@_q("cusum_changepoint", _CUSUM_ORACLE)
def q_cusum_changepoint(spark, sf):
    """Per-user CUSUM change-point scan over event values
    (temporal.cusum_changepoint): the sequential max(0, S+z) recursion
    rewritten as cumsum minus running-min (reflection identity) — one
    key shuffle, chained windows, no recursion. Values flow as exact
    integer micro-units so the per-key mean and every prefix sum are
    bit-identical across engines; event order compares in MICROSECONDS
    with event_id tiebreak (DuckDB truncates the nanos parquet)."""
    from padua_spark.operators.temporal import cusum_changepoint
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = base.where(F.col("value").isNotNull()).select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_id",
        F.round(F.col("value") * 1000000)
        .cast("bigint")
        .alias("_vc"),
    )
    out = cusum_changepoint(
        ev, ["user_id"], ["_tu", "event_id"], "_vc"
    )
    return out.select(
        "user_id",
        "n_obs",
        _r(F.col("cusum_pos_max") / 1000000.0).alias("cusum_pos_max"),
        _r(F.col("cusum_neg_max") / 1000000.0).alias("cusum_neg_max"),
        F.col("cp_pos").cast("bigint").alias("cp_pos"),
        F.col("cp_neg").cast("bigint").alias("cp_neg"),
    )


# --- ext: per-slice ROC AUC --------------------------------------------------


_GROUP_AUC_ORACLE = """
WITH base AS (
  SELECT o_orderpriority AS g, o_totalprice AS s,
    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS lab
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
    AND o_orderpriority IS NOT NULL
),
r AS (
  SELECT g, s, lab,
    row_number() OVER (PARTITION BY g ORDER BY s) AS rn
  FROM base
),
mid AS (
  SELECT g, lab,
    avg(CAST(rn AS DOUBLE)) OVER (PARTITION BY g, s) AS m
  FROM r
),
agg AS (
  SELECT g, CAST(sum(lab) AS BIGINT) AS n_pos,
    CAST(sum(1 - lab) AS BIGINT) AS n_neg,
    sum(CASE WHEN lab = 1 THEN m END) AS rp
  FROM mid GROUP BY g
)
SELECT g AS o_orderpriority, n_pos, n_neg,
  round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
    (rp - CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2.0)
    / CAST(n_pos * n_neg AS DOUBLE) END, 6) AS auc
FROM agg
"""


@_q("group_auc", _GROUP_AUC_ORACLE)
def q_group_auc(spark, sf):
    """Per-priority ROC AUC of order value predicting the fulfilled
    label (quality.group_auc): rank-sum identity with tie midranks, so
    the per-slice classifier acceptance metric is exact and invariant
    to within-tie ordering. One key shuffle, one shared per-group
    sort."""
    from padua_spark.extensions.quality import group_auc

    o = _t(spark, sf, "orders").where(
        F.col("o_totalprice").isNotNull()
        & F.col("o_orderstatus").isNotNull()
        & F.col("o_orderpriority").isNotNull()
    )
    base = o.select(
        "o_orderpriority",
        "o_totalprice",
        (F.col("o_orderstatus") == "F").cast("int").alias("_lab"),
    )
    out = group_auc(
        base, ["o_orderpriority"], "o_totalprice", "_lab"
    )
    return out.select(
        "o_orderpriority", "n_pos", "n_neg", _r("auc").alias("auc")
    )


# --- ext: hybrid retrieval via reciprocal-rank fusion ------------------------


_RRF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                x -> x <> '') AS tk
  FROM documents
),
perdoc AS (SELECT doc_id, len(tk) AS dl, tk FROM toks),
qq AS (SELECT unnest({_BM25_TOKS}) AS token),
hits AS (
  SELECT p.doc_id, p.dl, qq.token,
         len(list_filter(p.tk, x -> x = qq.token)) AS tf
  FROM perdoc p CROSS JOIN qq
),
m AS (SELECT * FROM hits WHERE tf > 0),
corpus AS (
  SELECT count(*) AS nd, avg(CAST(dl AS DOUBLE)) AS avgdl FROM perdoc
),
dfreq AS (SELECT token, count(*) AS dfr FROM m GROUP BY 1),
sc AS (
  SELECT m.doc_id,
    sum(ln(1.0 + (CAST(nd AS DOUBLE) - dfr + 0.5) / (dfr + 0.5))
        * (CAST(tf AS DOUBLE) * 2.2)
          / (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)))
      AS score
  FROM m JOIN dfreq USING (token) CROSS JOIN corpus
  GROUP BY 1
),
bmt AS (
  SELECT doc_id, round(score, 6) AS rs
  FROM sc ORDER BY rs DESC, doc_id LIMIT 10
),
bmr AS (
  SELECT doc_id,
    row_number() OVER (ORDER BY rs DESC, doc_id) AS r
  FROM bmt
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
anns AS (
  SELECT e.vec_id,
    list_dot_product(CAST(e.embedding AS DOUBLE[]),
                     CAST(q.embedding AS DOUBLE[]))
    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                             CAST(e.embedding AS DOUBLE[])))
       * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                               CAST(q.embedding AS DOUBLE[])))) AS cs
  FROM embeddings e, q
),
annt AS (
  SELECT vec_id, round(cs, 6) AS rcs
  FROM anns ORDER BY rcs DESC, vec_id LIMIT 10
),
annr AS (
  SELECT vec_id AS doc_id,
    row_number() OVER (ORDER BY rcs DESC, vec_id) AS r
  FROM annt
),
u AS (
  SELECT doc_id, 1.0 / (60.0 + r) AS contrib FROM bmr
  UNION ALL
  SELECT doc_id, 1.0 / (60.0 + r) FROM annr
),
f AS (
  SELECT doc_id, sum(contrib) AS rrf_score,
    CAST(count(*) AS BIGINT) AS n_lists
  FROM u GROUP BY doc_id
)
SELECT doc_id, round(rrf_score, 6) AS rrf_score, n_lists,
  CAST(row_number() OVER (ORDER BY round(rrf_score, 9) DESC, doc_id)
    AS BIGINT) AS fused_rank
FROM f
"""


@_q("rrf_fusion", _RRF_ORACLE)
def q_rrf_fusion(spark, sf):
    """Hybrid retrieval: BM25 lexical top-10 and exact embedding
    cosine top-10 fused with reciprocal-rank fusion
    (similarity.rrf_fuse, k=60) — rank-space fusion sidesteps the
    incomparable score scales. Everything after the two retrievers is
    bounded by the union of the lists (<= 20 rows), so the re-ranking
    window never touches corpus-scale data."""
    from pyspark.sql import Window

    from padua_spark.extensions.similarity import brute_force_topk, rrf_fuse
    from padua_spark.extensions.text import bm25_topk

    d = _t(spark, sf, "documents")
    bm = bm25_topk(d, "doc_id", "text", _BM25_QUERY, k=10)
    bm_ranked = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.round("score", 6).desc(), F.col("doc_id")))
        .alias("_rank"),
    )
    emb = _t(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    query = [float(x) for x in qrow[0][0]]
    ann = brute_force_topk(emb, "embedding", "vec_id", query, k=10)
    ann_ranked = ann.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(
            Window.orderBy(
                F.round("cosine_sim", 6).desc(), F.col("vec_id")
            )
        )
        .alias("_rank"),
    )
    out = rrf_fuse([bm_ranked, ann_ranked], "doc_id", "_rank", k=60.0)
    return out.select(
        F.col("item").alias("doc_id"),
        _r("rrf_score").alias("rrf_score"),
        "n_lists",
        "fused_rank",
    )


# --- ext: Dunning LLR keyness between sub-corpora ---------------------------


_KEYNESS_ORACLE = r"""
WITH ta AS (
  SELECT unnest(list_filter(
    regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
  FROM documents WHERE source = 'src0'
),
tb AS (
  SELECT unnest(list_filter(
    regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS token
  FROM documents WHERE source <> 'src0'
),
ca AS (SELECT token, CAST(count(*) AS BIGINT) AS count_a FROM ta GROUP BY 1),
cb AS (SELECT token, CAST(count(*) AS BIGINT) AS count_b FROM tb GROUP BY 1),
m AS (
  SELECT coalesce(ca.token, cb.token) AS token,
    CAST(coalesce(count_a, 0) AS BIGINT) AS count_a,
    CAST(coalesce(count_b, 0) AS BIGINT) AS count_b
  FROM ca FULL OUTER JOIN cb ON ca.token = cb.token
),
-- true corpus totals: BEFORE the min_total vocabulary filter
tot AS (
  SELECT CAST(sum(count_a) AS BIGINT) AS na,
    CAST(sum(count_b) AS BIGINT) AS nb
  FROM m
),
c AS (
  SELECT token, count_a, count_b FROM m
  WHERE count_a + count_b >= 5
),
g AS (
  SELECT token, count_a, count_b,
    CAST(count_a AS DOUBLE) AS a, CAST(count_b AS DOUBLE) AS b,
    CAST(na AS DOUBLE) AS dna, CAST(nb AS DOUBLE) AS dnb
  FROM c, tot
),
s AS (
  SELECT token, count_a, count_b, a, b, dna, dnb,
    dna - a AS cc, dnb - b AS dd, dna + dnb AS n
  FROM g
),
ll AS (
  SELECT token, count_a, count_b, a, b, dna, dnb,
    2.0 * (
      (CASE WHEN a > 0 THEN a * ln(a / (dna * (a + b) / n)) ELSE 0 END)
      + (CASE WHEN b > 0 THEN b * ln(b / (dnb * (a + b) / n)) ELSE 0 END)
      + (CASE WHEN cc > 0 THEN cc * ln(cc / (dna * (cc + dd) / n)) ELSE 0 END)
      + (CASE WHEN dd > 0 THEN dd * ln(dd / (dnb * (cc + dd) / n)) ELSE 0 END)
    ) AS g2
  FROM s
)
SELECT token, count_a, count_b,
  round(CASE WHEN a / dna >= b / dnb THEN g2 ELSE -g2 END, 6) AS llr
FROM ll
"""


@_q("keyness_llr", _KEYNESS_ORACLE)
def q_keyness_llr(spark, sf):
    """Dunning G² keyness of src0 vs the rest of the corpus
    (text.keyness_llr): full 2x2 likelihood-ratio test per token over
    exact multiplicity counts, signed by over/under-representation.
    Two explode+aggregate passes meet in a vocab-sized outer join; the
    corpus totals are a 1-row broadcast."""
    from padua_spark.extensions.text import keyness_llr

    d = _t(spark, sf, "documents")
    out = keyness_llr(
        d.where(F.col("source") == "src0"),
        d.where(F.col("source") != "src0"),
        "text",
        min_total=5,
    )
    return out.select(
        "token", "count_a", "count_b", _r("llr").alias("llr")
    )


# --- ext: NDCG@k retrieval evaluation ----------------------------------------


def _ndcg_oracle(k: int = 10) -> str:
    import math

    ln2 = math.log(2.0)
    cums, acc = [], 0.0
    for i in range(1, k + 1):
        acc += ln2 / math.log(i + 1.0)
        cums.append(repr(acc))
    idcg_list = "[" + ", ".join(cums) + "]"
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
    label AS qlab
  FROM embeddings WHERE vec_id < 5
),
c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv, label AS clab
  FROM embeddings WHERE vec_id >= 5
),
s AS (
  SELECT q.query_id, q.qlab, c.vec_id, c.clab,
    list_dot_product(c.cv, q.qv)
    / (sqrt(list_dot_product(c.cv, c.cv))
       * sqrt(list_dot_product(q.qv, q.qv))) AS cs
  FROM c, q
),
topk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cs DESC, vec_id
    ) AS rn FROM s
  ) WHERE rn <= {k}
),
rk AS (
  SELECT query_id, qlab AS label,
    CASE WHEN clab = qlab THEN 1 ELSE 0 END AS rel,
    row_number() OVER (
      PARTITION BY query_id ORDER BY round(cs, 6) DESC, vec_id
    ) AS r
  FROM topk
),
agg AS (
  SELECT query_id, label,
    CAST(sum(rel) AS BIGINT) AS n_rel,
    sum(CASE WHEN rel = 1
        THEN {repr(ln2)} / ln(CAST(r AS DOUBLE) + 1.0)
        ELSE 0.0 END) AS dcg
  FROM rk GROUP BY 1, 2
)
SELECT query_id, label, n_rel,
  round(CASE WHEN n_rel > 0
    THEN dcg / ({idcg_list}[CAST(n_rel AS INTEGER)]) END, 6) AS ndcg
FROM agg
"""


@_q("retrieval_ndcg", _ndcg_oracle())
def q_retrieval_ndcg(spark, sf):
    """NDCG@10 of the exact kNN ranking against label relevance
    (similarity.retrieval_ndcg_at_k): position-discounted retrieval
    quality with a precomputed ideal-DCG literal lookup — the
    leaderboard metric beside the existing recall@k / precision@k
    gates. knn_join keeps the corpus unshuffled; everything after is
    k-row-per-query arithmetic."""
    from padua_spark.extensions.similarity import retrieval_ndcg_at_k

    emb = _t(spark, sf, "embeddings")
    out = retrieval_ndcg_at_k(
        emb.filter(F.col("vec_id") >= 5),
        "vec_id",
        "embedding",
        "label",
        emb.filter(F.col("vec_id") < 5),
        k=10,
    )
    return out.select(
        "query_id", "label", "n_rel", _r("ndcg").alias("ndcg")
    )


# --- ext: per-slice proper scoring rules ------------------------------------


def _classifier_loss_oracle() -> str:
    return f"""
WITH qc AS ({_QUALITY_CLASSIFIER_ORACLE.strip()}),
lab AS (
  SELECT doc_id, lang,
    CASE WHEN len(list_filter(
      regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> ''))
      >= 40 THEN 1.0 ELSE 0.0 END AS y
  FROM documents
),
j AS (
  SELECT lab.lang, qc.prob AS p, lab.y
  FROM qc JOIN lab USING (doc_id)
  WHERE qc.prob IS NOT NULL
),
c AS (
  SELECT lang, p, y,
    least(greatest(p, 1e-15), 1.0 - 1e-15) AS pc
  FROM j
)
SELECT lang, CAST(count(*) AS BIGINT) AS n,
  round(avg((p - y) * (p - y)), 6) AS brier,
  round(avg(-(y * ln(pc) + (1.0 - y) * ln(1.0 - pc))), 6) AS logloss
FROM c GROUP BY lang
"""


@_q("classifier_loss", _classifier_loss_oracle())
def q_classifier_loss(spark, sf):
    """Brier score and log loss of the hashed quality classifier per
    language slice (quality.classifier_loss): the single-number
    proper-scoring companions to the calibration bins, over the SAME
    rounded probabilities the independently-green quality_classifier
    gate pins — one conditional aggregation per slice."""
    from padua_spark.extensions.quality import (
        classifier_loss,
        hashed_classifier_score,
    )
    from padua_spark.extensions.text import tokens

    d = _t(spark, sf, "documents")
    scored = hashed_classifier_score(d, "text", n_buckets=1024).select(
        "doc_id", _r("prob").alias("_p")
    )
    lab = d.select(
        "doc_id",
        "lang",
        (
            F.size(
                F.filter(
                    tokens(F.lower(F.col("text"))), lambda x: x != ""
                )
            )
            >= 40
        ).cast("double").alias("_y"),
    )
    out = classifier_loss(
        scored.join(lab, on="doc_id"), "_p", "_y", ["lang"]
    )
    return out.select(
        "lang", "n",
        _r("brier").alias("brier"),
        _r("logloss").alias("logloss"),
    )


# --- ext: Z-order clustering key ---------------------------------------------


def _zorder_oracle() -> str:
    from padua_spark.io_utils import zorder_key_sql

    z = zorder_key_sql("xb", "yb", bits=16)
    return f"""
WITH b AS (
  SELECT o_orderkey,
    CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
      AS BIGINT) AS xb,
    CAST(floor(o_totalprice / 100.0) AS BIGINT) AS yb
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
)
SELECT o_orderkey, xb, yb, {z} AS zval
FROM b
"""


@_q("zorder_key", _zorder_oracle())
def q_zorder_key(spark, sf):
    """Morton Z-order clustering key over (order-date days, price
    bucket) (io_utils.zorder_key): the multi-dimension layout key —
    write_zordered range-partitions + sorts on it so per-file parquet
    footer stats stay tight on BOTH dimensions (the Delta/Iceberg
    OPTIMIZE ZORDER trick; tests/test_units.py proves the file-level
    bounding boxes prune either dimension on the written layout).
    Pure unrolled shift/mask integer arithmetic, codegen-friendly,
    mirrored 1:1 in the oracle."""
    from padua_spark.io_utils import zorder_key

    o = _t(spark, sf, "orders").where(
        F.col("o_orderdate").isNotNull()
        & F.col("o_totalprice").isNotNull()
    )
    b = o.select(
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1992-01-01").cast("date"),
        )
        .cast("bigint")
        .alias("xb"),
        F.floor(F.col("o_totalprice") / 100.0)
        .cast("bigint")
        .alias("yb"),
    )
    return b.select(
        "o_orderkey", "xb", "yb",
        zorder_key("xb", "yb", bits=16).alias("zval"),
    )


# --- ext: last-touch attribution (asof_join composition) ---------------------


_ATTRIBUTION_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id, event_type,
    CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
),
p AS (
  SELECT user_id, tu, vc FROM e WHERE event_type = 'purchase'
),
t0 AS (
  SELECT user_id, tu, arg_max(event_type, event_id) AS ttype
  FROM e WHERE event_type IN ('view', 'click') GROUP BY 1, 2
),
u AS (
  SELECT user_id, tu, 1 AS side, vc,
    CAST(NULL AS VARCHAR) AS ttype, CAST(NULL AS BIGINT) AS rtu
  FROM p
  UNION ALL
  SELECT user_id, tu, 0, NULL, ttype, tu FROM t0
),
w AS (
  SELECT user_id, tu, side, vc,
    last_value(ttype IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY tu, side
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ltype,
    last_value(rtu IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY tu, side
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ltu
  FROM u
),
a AS (
  SELECT CASE WHEN ltu IS NOT NULL AND ltu >= tu - 86400000000
           THEN ltype END AS touch_type, vc
  FROM w WHERE side = 1
)
SELECT coalesce(touch_type, 'none') AS touch_type,
  CAST(count(*) AS BIGINT) AS n_purchases,
  round(CAST(sum(vc) AS DOUBLE) / 100.0, 6) AS total_value
FROM a GROUP BY 1
"""


@_q("attribution_last_touch", _ATTRIBUTION_ORACLE)
def q_attribution_last_touch(spark, sf):
    """Last-touch marketing attribution: each purchase credits the
    most recent view/click by the same user within 24h — a direct
    COMPOSITION of temporal.asof_join (union + conditional
    carry-forward, one key shuffle, no per-row Python). Touches are
    pre-deduped per (user, microsecond) with arg-max-by-event_id so
    the as-of pick is tie-deterministic; money flows as integer
    cents."""
    from padua_spark.operators.temporal import asof_join
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("_vc"),
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "_tu", "_vc"
    )
    touch = (
        ev.where(F.col("event_type").isin("view", "click"))
        .groupBy("user_id", "_tu")
        .agg(F.max_by("event_type", "event_id").alias("ttype"))
    )
    att = asof_join(
        purch,
        touch,
        on="_tu",
        by=["user_id"],
        right_value_cols=["ttype"],
        tolerance=86400000000,
    )
    return (
        att.groupBy(
            F.coalesce(F.col("ttype"), F.lit("none")).alias("touch_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            _r(F.sum("_vc").cast("double") / 100.0).alias("total_value"),
        )
    )


# --- ext: triangle count / transitivity of the candidate graph ---------------


def _triangle_oracle() -> str:
    return f"""
WITH mh AS ({_minhash_oracle()}),
e AS (
  SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
  FROM mh WHERE id_a <> id_b
),
deg AS (
  SELECT x, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
  GROUP BY x
),
o AS (
  SELECT
    CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
      THEN e.u ELSE e.v END AS s,
    CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
      THEN e.v ELSE e.u END AS t
  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
),
w AS (
  SELECT o1.s AS a, o1.t AS b, o2.t AS c
  FROM o o1 JOIN o o2 ON o1.t = o2.s
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM w WHERE EXISTS (SELECT 1 FROM o WHERE o.s = w.a AND o.t = w.c)
),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
    CAST(sum(d * (d - 1)) / 2 AS BIGINT) AS n_wedges
  FROM deg
),
ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
  round(CASE WHEN n_wedges > 0
    THEN 3.0 * n_triangles / CAST(n_wedges AS DOUBLE) END, 6)
    AS transitivity
FROM st, ne, tri
"""


@_q("triangle_count", _triangle_oracle())
def q_triangle_count(spark, sf):
    """Triangles and transitivity of the MinHash candidate graph
    (graph.triangle_count): degree-oriented wedge join — out-degrees
    are O(sqrt(m)) after orientation, so no hub vertex can explode the
    self-join, and the total (deg, id) order makes the closing edge a
    plain equi semi-join. Transitivity ~1 = LSH is finding tight
    duplicate cliques; low = chainy threshold-straddlers."""
    from padua_spark.extensions import dedup as x_dedup
    from padua_spark.extensions.graph import triangle_count

    d = _t(spark, sf, "documents")
    cand = x_dedup.minhash_lsh_candidates(
        d, "doc_id", "text", k_shingle=3, num_hashes=32, bands=8,
        portable_keys=True,
    )
    out = triangle_count(cand, "id_a", "id_b")
    return out.select(
        "n_nodes", "n_edges", "n_wedges", "n_triangles",
        _r("transitivity").alias("transitivity"),
    )


# --- ext: Kaplan-Meier survival ----------------------------------------------


_KM_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_type FROM events
),
u AS (
  SELECT user_id,
    min(tu) AS t0,
    max(tu) AS t_last,
    min(CASE WHEN event_type = 'error' THEN tu END) AS t_err
  FROM e GROUP BY user_id
),
subj AS (
  SELECT user_id % 2 AS cohort,
    CASE WHEN t_err IS NOT NULL
      THEN CAST(floor((t_err - t0) / 3600000000.0) AS BIGINT)
      ELSE CAST(floor((t_last - t0) / 3600000000.0) AS BIGINT)
    END AS dur,
    CASE WHEN t_err IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM u
),
counts AS (
  SELECT cohort, CAST(dur AS DOUBLE) AS t,
    CAST(sum(ev) AS BIGINT) AS n_events,
    CAST(sum(1 - ev) AS BIGINT) AS n_censored
  FROM subj GROUP BY 1, 2
),
risk AS (
  SELECT *,
    CAST(sum(n_events + n_censored) OVER (PARTITION BY cohort)
      - (sum(n_events + n_censored) OVER (PARTITION BY cohort ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - n_events - n_censored) AS BIGINT) AS n_risk
  FROM counts
),
f AS (
  SELECT *,
    CASE WHEN n_events > 0
          AND CAST(n_risk - n_events AS DOUBLE) / n_risk > 0
      THEN ln(CAST(n_risk - n_events AS DOUBLE) / n_risk)
      ELSE 0.0 END AS lnf,
    CASE WHEN n_events > 0
          AND CAST(n_risk - n_events AS DOUBLE) / n_risk <= 0
      THEN 1 ELSE 0 END AS zf
  FROM risk
),
s AS (
  SELECT cohort, t, n_risk, n_events, n_censored,
    CASE WHEN max(zf) OVER (PARTITION BY cohort ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
      THEN 0.0
      ELSE exp(sum(lnf) OVER (PARTITION BY cohort ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) END
      AS survival
  FROM f
)
SELECT CAST(cohort AS BIGINT) AS cohort, t, n_risk, n_events,
  n_censored, round(survival, 6) AS survival
FROM s WHERE n_events > 0
"""


@_q("kaplan_meier", _KM_ORACLE)
def q_kaplan_meier(spark, sf):
    """Kaplan-Meier time-to-first-error survival per user cohort
    (stats.kaplan_meier): right-censored at the user's last event.
    One aggregation collapses events to per-user durations (integer
    hours -> exact ties), one more to distinct-time counts; the
    cumulative windows run over the DISTINCT-TIME frame only, and the
    running product is exp(Σ ln) with an explicit empty-risk-set
    flag."""
    from padua_spark.operators.stats import kaplan_meier
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_type",
    )
    u = ev.groupBy("user_id").agg(
        F.min("_tu").alias("_t0"),
        F.max("_tu").alias("_tl"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("_tu"))
        ).alias("_te"),
    )
    subj = u.select(
        (F.col("user_id") % 2).alias("cohort"),
        F.floor(
            (
                F.coalesce(F.col("_te"), F.col("_tl")) - F.col("_t0")
            )
            / 3600000000.0
        )
        .cast("bigint")
        .alias("_dur"),
        F.col("_te").isNotNull().cast("int").alias("_ev"),
    )
    out = kaplan_meier(subj, ["cohort"], "_dur", "_ev")
    return out.select(
        F.col("cohort").cast("bigint").alias("cohort"),
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        _r("survival").alias("survival"),
    )


# --- ext: two-group log-rank survival test -----------------------------------


_LOGRANK_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_type FROM events
),
u AS (
  SELECT user_id,
    min(tu) AS t0,
    max(tu) AS t_last,
    min(CASE WHEN event_type = 'error' THEN tu END) AS t_err
  FROM e GROUP BY user_id
),
subj AS (
  SELECT user_id % 2 AS cohort,
    CASE WHEN t_err IS NOT NULL
      THEN CAST(floor((t_err - t0) / 3600000000.0) AS BIGINT)
      ELSE CAST(floor((t_last - t0) / 3600000000.0) AS BIGINT)
    END AS dur,
    CASE WHEN t_err IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM u
),
per AS (
  SELECT CAST(dur AS DOUBLE) AS t,
    CAST(sum(CASE WHEN cohort = 0 THEN ev ELSE 0 END) AS BIGINT) AS ev_a,
    CAST(count(*) FILTER (WHERE cohort = 0) AS BIGINT) AS lv_a,
    CAST(sum(CASE WHEN cohort = 1 THEN ev ELSE 0 END) AS BIGINT) AS ev_b,
    CAST(count(*) FILTER (WHERE cohort = 1) AS BIGINT) AS lv_b
  FROM subj GROUP BY 1
),
run AS (
  SELECT *,
    sum(lv_a) OVER w AS lv_a_run, sum(lv_b) OVER w AS lv_b_run,
    sum(lv_a) OVER () AS lv_a_tot, sum(lv_b) OVER () AS lv_b_tot
  FROM per
  WINDOW w AS (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
terms AS (
  SELECT ev_a, ev_b, lv_a_tot, lv_b_tot,
    lv_a_tot - (lv_a_run - lv_a) AS n_a,
    lv_b_tot - (lv_b_run - lv_b) AS n_b
  FROM run
),
t2 AS (
  SELECT ev_a, ev_b, lv_a_tot, lv_b_tot,
    ev_a + ev_b AS d, n_a + n_b AS n,
    CAST(n_a AS DOUBLE) / (n_a + n_b) AS ra
  FROM terms
),
agg AS (
  SELECT
    CAST(max(lv_a_tot) AS BIGINT) AS n_a,
    CAST(max(lv_b_tot) AS BIGINT) AS n_b,
    CAST(sum(ev_a) AS BIGINT) AS observed_a,
    CAST(sum(ev_b) AS BIGINT) AS observed_b,
    sum(CASE WHEN d > 0 THEN CAST(d AS DOUBLE) * ra
        ELSE 0.0 END) AS expected_a,
    sum(CAST(d AS DOUBLE) - CASE WHEN d > 0 THEN CAST(d AS DOUBLE) * ra
        ELSE 0.0 END) AS expected_b,
    sum(CASE WHEN d > 0 AND n > 1 THEN
      CAST(d AS DOUBLE) * ra * (1.0 - ra)
      * CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE)
      ELSE 0.0 END) AS v
  FROM t2
),
chi AS (
  SELECT *,
    CASE WHEN v > 0 THEN
      (CAST(observed_a AS DOUBLE) - expected_a)
      * (CAST(observed_a AS DOUBLE) - expected_a) / v
    END AS chi2
  FROM agg
)
SELECT n_a, n_b, observed_a, round(expected_a, 6) AS expected_a,
  observed_b, round(expected_b, 6) AS expected_b,
  round(chi2, 6) AS chi2,
  round(CASE WHEN chi2 IS NOT NULL THEN
    (0.254829592 * tt + -0.284496736 * tt * tt
     + 1.421413741 * tt * tt * tt + -1.453152027 * tt * tt * tt * tt
     + 1.061405429 * tt * tt * tt * tt * tt) * exp(-x2 * x2) END, 6)
    AS p_value
FROM (
  SELECT *, sqrt(coalesce(chi2, 0.0)) / sqrt(2.0) AS x2,
    1.0 / (1.0 + 0.3275911 * (sqrt(coalesce(chi2, 0.0)) / sqrt(2.0))) AS tt
  FROM chi
)
"""


@_q("logrank_test", _LOGRANK_ORACLE)
def q_logrank_test(spark, sf):
    """Two-group log-rank test on time-to-first-error between even/odd
    user cohorts (stats.logrank_test): the significance companion to
    kaplan_meier on the SAME risk-table semantics — O-E and the
    hypergeometric variance accumulated over pooled distinct event
    times via the shared distributed stepped cumsum, chi2 with 1 df,
    A&S-erfc p shared verbatim with the oracle."""
    from padua_spark.operators.stats import logrank_test
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_type",
    )
    u = ev.groupBy("user_id").agg(
        F.min("_tu").alias("_t0"),
        F.max("_tu").alias("_tl"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("_tu"))
        ).alias("_te"),
    )
    subj = u.select(
        (F.col("user_id") % 2).alias("cohort"),
        F.floor(
            (
                F.coalesce(F.col("_te"), F.col("_tl")) - F.col("_t0")
            )
            / 3600000000.0
        )
        .cast("bigint")
        .alias("_dur"),
        F.col("_te").isNotNull().cast("int").alias("_ev"),
    )
    out = logrank_test(subj, "cohort", "_dur", "_ev", 0, 1)
    return out.select(
        "n_a", "n_b", "observed_a",
        _r("expected_a").alias("expected_a"),
        "observed_b",
        _r("expected_b").alias("expected_b"),
        _r("chi2").alias("chi2"),
        _r("p_value").alias("p_value"),
    )


# --- ext: Wald SPRT sequential A/B test --------------------------------------


def _sprt_oracle() -> str:
    import math

    # bare decimal literals parse as DECIMAL in DuckDB (sum would stay
    # DECIMAL and hash-mismatch the double); force DOUBLE explicitly
    la = f"CAST({math.log(0.55 / 0.45)!r} AS DOUBLE)"
    lb = f"CAST({math.log(0.45 / 0.55)!r} AS DOUBLE)"
    upper = f"CAST({math.log(0.95 / 0.05)!r} AS DOUBLE)"
    lower = f"CAST({math.log(0.05 / 0.95)!r} AS DOUBLE)"
    return f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS tu, event_id,
    CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS x
  FROM events WHERE value IS NOT NULL
),
w AS (
  SELECT event_type,
    sum(CASE WHEN x = 1 THEN {la} ELSE {lb} END)
      OVER (PARTITION BY event_type ORDER BY tu, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr,
    row_number() OVER (PARTITION BY event_type ORDER BY tu, event_id)
      AS rn,
    x
  FROM e
),
agg AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n_total,
    sum(CASE WHEN x = 1 THEN {la} ELSE {lb} END) AS llr_final,
    CAST(min(CASE WHEN llr >= {upper} THEN rn END) AS BIGINT)
      AS n_decide_h1,
    CAST(min(CASE WHEN llr <= {lower} THEN rn END) AS BIGINT)
      AS n_decide_h0
  FROM w GROUP BY event_type
)
SELECT event_type, n_total, round(llr_final, 6) AS llr_final,
  n_decide_h1, n_decide_h0,
  CASE
    WHEN n_decide_h1 IS NOT NULL
         AND (n_decide_h0 IS NULL OR n_decide_h1 < n_decide_h0)
      THEN 'accept_h1'
    WHEN n_decide_h0 IS NOT NULL THEN 'accept_h0'
    ELSE 'continue' END AS decision
FROM agg
"""


@_q("sprt_bernoulli", _sprt_oracle())
def q_sprt_bernoulli(spark, sf):
    """Wald SPRT per event type: is P(value > 50) at 0.55 (H1) or 0.45
    (H0), monitored after every event (stats.sprt_bernoulli,
    alpha = beta = 0.05)? The always-valid sequential counterpart to
    the fixed-horizon two_proportion_z entry — LLR cumsum of two
    constants, crossings as conditional-min aggregates, microsecond +
    event_id ordering shared with the oracle."""
    from padua_spark.operators.stats import sprt_bernoulli
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = base.where(F.col("value").isNotNull()).select(
        "event_type",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_id",
        (F.col("value") > 50.0).cast("int").alias("_x"),
    )
    out = sprt_bernoulli(
        ev, ["event_type"], ["_tu", "event_id"], "_x",
        p0=0.45, p1=0.55, alpha=0.05, beta=0.05,
    )
    return out.select(
        "event_type",
        "n_total",
        _r("llr_final").alias("llr_final"),
        F.col("n_decide_h1").cast("bigint").alias("n_decide_h1"),
        F.col("n_decide_h0").cast("bigint").alias("n_decide_h0"),
        "decision",
    )


# --- ext: HyperLogLog distinct sketch ----------------------------------------


def _hll_oracle(p: int = 10) -> str:
    m = 1 << p
    wbits = 31 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    msb = " + ".join(
        f"(CASE WHEN w >= {1 << k} THEN 1 ELSE 0 END)"
        for k in range(wbits)
    )
    return f"""
WITH t AS (
  SELECT lang,
    unnest(list_transform(string_split(text, ' '), tok -> list_reduce(
        list_prepend(CAST(7 AS BIGINT),
          list_transform(list_filter(string_split(tok, ''), c -> c <> ''),
            c -> CAST(ord(c) AS BIGINT))),
        (a, c) -> (a * 131 + c) % 2147483647))) AS h
  FROM documents
),
regs AS (SELECT lang, (h & {m - 1}) AS reg, (h >> {p}) AS w FROM t),
rho AS (
  SELECT lang, reg,
    CASE WHEN w > 0 THEN {wbits} + 1 - ({msb})
      ELSE {wbits} + 1 END AS r
  FROM regs
),
rmax AS (SELECT lang, reg, max(r) AS mr FROM rho GROUP BY 1, 2),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_registers_hit,
    sum(pow(2.0, -mr)) AS hs
  FROM rmax GROUP BY lang
),
ex AS (
  SELECT lang, CAST(count(DISTINCT h) AS BIGINT) AS exact_distinct
  FROM t GROUP BY lang
),
est AS (
  SELECT a.lang, a.n_registers_hit, ex.exact_distinct,
    CAST({alpha * m * m!r} AS DOUBLE)
      / (hs + ({m} - n_registers_hit)) AS raw,
    CAST({m} - n_registers_hit AS DOUBLE) AS v
  FROM agg a JOIN ex ON a.lang = ex.lang
)
SELECT lang, n_registers_hit, exact_distinct,
  round(CASE WHEN raw <= {2.5 * m!r} AND v > 0
    THEN {float(m)!r} * ln({float(m)!r} / v) ELSE raw END, 6)
    AS hll_estimate
FROM est
"""


@_q("hll_distinct", _hll_oracle())
def q_hll_distinct(spark, sf):
    """HyperLogLog token-cardinality per language beside the exact
    answer (sketches.hll_distinct, p=10 -> 1024 registers): the
    mergeable industry-standard sketch — (group, register) max-rank
    aggregation collapses any data size to m rows per group; the rank
    uses an unrolled threshold sum, never float log2. Exact distinct
    joined on for the accuracy story."""
    from padua_spark.extensions.sketches import hll_distinct

    d = _t(spark, sf, "documents")
    from padua_spark.extensions.dedup import token_hashes

    t = d.select(
        "lang", F.explode(token_hashes(F.col("text"))).alias("_h")
    )
    from pyspark import StorageLevel

    t = t.persist(StorageLevel.MEMORY_AND_DISK)
    sk = hll_distinct(t, ["lang"], "_h", p=10)
    ex = t.groupBy("lang").agg(
        F.countDistinct("_h").alias("exact_distinct")
    )
    from padua_spark.io_utils import track_cached

    out = sk.join(F.broadcast(ex), on="lang").select(
        "lang",
        "n_registers_hit",
        "exact_distinct",
        _r("hll_estimate").alias("hll_estimate"),
    )
    return track_cached(out, t)


# --- ext: Dunn post-hoc pairwise comparisons ---------------------------------


_DUNN_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS g, l_quantity AS v FROM lineitem
  WHERE l_returnflag IN ('A', 'N', 'R') AND l_quantity IS NOT NULL
),
r AS (SELECT g, v, row_number() OVER (ORDER BY v) AS rn FROM base),
mid AS (
  SELECT g,
    min(rn) OVER (PARTITION BY v) + max(rn) OVER (PARTITION BY v)
      AS two_m
  FROM r
),
ag AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(two_m) AS BIGINT) AS r2
  FROM mid GROUP BY g
),
ties AS (
  SELECT CAST(sum(c * c * c - c) AS BIGINT) AS tie
  FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM base GROUP BY v)
),
nt AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM ag),
p AS (
  SELECT a.g AS group_a, b.g AS group_b, a.n AS n_a, b.n AS n_b,
    CAST(a.r2 AS DOUBLE) / (2.0 * a.n) AS mean_rank_a,
    CAST(b.r2 AS DOUBLE) / (2.0 * b.n) AS mean_rank_b,
    tie, n_total
  FROM ag a JOIN ag b ON a.g < b.g, ties, nt
),
zf AS (
  SELECT *,
    (mean_rank_a - mean_rank_b)
    / sqrt((CAST(n_total AS DOUBLE) * (n_total + 1.0) / 12.0
            - CAST(tie AS DOUBLE) / (12.0 * (n_total - 1.0)))
           * (1.0 / n_a + 1.0 / n_b)) AS z
  FROM p
),
pv AS (
  SELECT group_a, group_b, n_a, n_b, mean_rank_a, mean_rank_b, z,
    (0.254829592 * t + -0.284496736 * t * t
     + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
     + 1.061405429 * t * t * t * t * t) * exp(-x * x) AS p_normal
  FROM (
    SELECT *, abs(z) / sqrt(2.0) AS x,
      1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
    FROM zf
  )
),
bh AS (
  SELECT *,
    row_number() OVER (ORDER BY p_normal, group_a, group_b) AS rk,
    CAST(count(*) OVER () AS DOUBLE) AS m
  FROM pv
)
SELECT group_a, group_b, n_a, n_b,
  round(mean_rank_a, 6) AS mean_rank_a,
  round(mean_rank_b, 6) AS mean_rank_b,
  round(z, 6) AS z, round(p_normal, 6) AS p_normal,
  round(least(1.0, min(p_normal * m / rk) OVER (
    ORDER BY p_normal DESC, group_a DESC, group_b DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
    AS p_adjusted
FROM bh
"""


@_q("dunn_posthoc", _DUNN_ORACLE)
def q_dunn_posthoc(spark, sf):
    """Dunn's post-hoc pairwise z tests after Kruskal-Wallis on
    lineitem quantity by return flag (stats.dunn_posthoc): WHICH
    groups differ — pooled exact doubled midranks from the same
    distributed scaffolding as the H statistic, pair statistics and
    the BH adjustment on the C(k,2)-row frame only. A&S-erfc p shared
    verbatim with the oracle."""
    from padua_spark.operators.stats import dunn_posthoc

    li = _t(spark, sf, "lineitem")
    out = dunn_posthoc(
        li, "l_returnflag", "l_quantity", ["A", "N", "R"]
    )
    return out.select(
        "group_a", "group_b", "n_a", "n_b",
        _r("mean_rank_a").alias("mean_rank_a"),
        _r("mean_rank_b").alias("mean_rank_b"),
        _r("z").alias("z"),
        _r("p_normal").alias("p_normal"),
        _r("p_adjusted").alias("p_adjusted"),
    )


# --- ext: Mann-Kendall trend test --------------------------------------------


_MANN_KENDALL_ORACLE = """
WITH pts AS (
  SELECT l_orderkey AS g, l_linenumber AS x, l_quantity AS y
  FROM lineitem
  WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL
),
s AS (
  SELECT a.g,
    CAST(sum(CASE WHEN b.y > a.y THEN 1
                  WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
      AS s_stat
  FROM pts a JOIN pts b ON a.g = b.g AND a.x < b.x
  GROUP BY a.g
),
cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS n_obs FROM pts GROUP BY g),
ties AS (
  SELECT g, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie
  FROM (SELECT g, y, CAST(count(*) AS BIGINT) AS t FROM pts GROUP BY 1, 2)
  GROUP BY g
),
j AS (
  SELECT cnt.g, cnt.n_obs, coalesce(s.s_stat, 0) AS s_stat,
    (CAST(cnt.n_obs AS DOUBLE) * (cnt.n_obs - 1.0)
       * (2.0 * cnt.n_obs + 5.0)
     - CAST(ties.tie AS DOUBLE)) / 18.0 AS var_s
  FROM cnt LEFT JOIN s ON cnt.g = s.g JOIN ties ON cnt.g = ties.g
),
zf AS (
  SELECT g, n_obs, s_stat, var_s,
    CASE WHEN var_s > 0 THEN
      CASE WHEN s_stat > 0 THEN (s_stat - 1.0) / sqrt(var_s)
           WHEN s_stat < 0 THEN (s_stat + 1.0) / sqrt(var_s)
           ELSE 0.0 END
    END AS z
  FROM j
)
SELECT g AS l_orderkey, n_obs, s_stat, round(var_s, 6) AS var_s,
  round(z, 6) AS z,
  round(CASE WHEN z IS NOT NULL THEN
    (0.254829592 * t + -0.284496736 * t * t
     + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
     + 1.061405429 * t * t * t * t * t) * exp(-x2 * x2) END, 6)
    AS p_normal
FROM (
  SELECT *, abs(coalesce(z, 0.0)) / sqrt(2.0) AS x2,
    1.0 / (1.0 + 0.3275911 * (abs(coalesce(z, 0.0)) / sqrt(2.0))) AS t
  FROM zf
)
"""


@_q("mann_kendall", _MANN_KENDALL_ORACLE)
def q_mann_kendall(spark, sf):
    """Mann-Kendall monotone-trend test of quantity over line number
    per order (stats.mann_kendall): the significance companion to the
    theil_sen_trend entry — exact integer S and tie sums over the
    same bounded per-order pairs, continuity-corrected z, A&S-erfc
    p."""
    from padua_spark.operators.stats import mann_kendall

    li = _t(spark, sf, "lineitem")
    out = mann_kendall(
        li, ["l_orderkey"], "l_linenumber", "l_quantity"
    )
    return out.select(
        "l_orderkey",
        "n_obs",
        "s_stat",
        _r("var_s").alias("var_s"),
        _r("z").alias("z"),
        _r("p_normal").alias("p_normal"),
    )


# --- E109-E115 round-8 battery: survival companions, classical tests, -------
#     two-segment changepoint ------------------------------------------------

_NA_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_type FROM events
),
u AS (
  SELECT user_id,
    min(tu) AS t0,
    max(tu) AS t_last,
    min(CASE WHEN event_type = 'error' THEN tu END) AS t_err
  FROM e GROUP BY user_id
),
subj AS (
  SELECT user_id % 2 AS cohort,
    CASE WHEN t_err IS NOT NULL
      THEN CAST(floor((t_err - t0) / 3600000000.0) AS BIGINT)
      ELSE CAST(floor((t_last - t0) / 3600000000.0) AS BIGINT)
    END AS dur,
    CASE WHEN t_err IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM u
),
counts AS (
  SELECT cohort, CAST(dur AS DOUBLE) AS t,
    CAST(sum(ev) AS BIGINT) AS n_events,
    CAST(sum(1 - ev) AS BIGINT) AS n_censored
  FROM subj GROUP BY 1, 2
),
risk AS (
  SELECT *,
    CAST(sum(n_events + n_censored) OVER (PARTITION BY cohort)
      - (sum(n_events + n_censored) OVER (PARTITION BY cohort ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - n_events - n_censored) AS BIGINT) AS n_risk
  FROM counts
),
h AS (
  SELECT cohort, t, n_risk, n_events, n_censored,
    sum(CASE WHEN n_events > 0
        THEN CAST(n_events AS DOUBLE) / n_risk ELSE 0.0 END)
      OVER (PARTITION BY cohort ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cum_hazard,
    sum(CASE WHEN n_events > 0
        THEN CAST(n_events AS DOUBLE)
             / (CAST(n_risk AS DOUBLE) * n_risk) ELSE 0.0 END)
      OVER (PARTITION BY cohort ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS var_hazard
  FROM risk
)
SELECT CAST(cohort AS BIGINT) AS cohort, t, n_risk, n_events,
  n_censored, round(cum_hazard, 6) AS cum_hazard,
  round(var_hazard, 6) AS var_hazard
FROM h WHERE n_events > 0
"""


@_q("nelson_aalen", _NA_ORACLE)
def q_nelson_aalen(spark, sf):
    """Nelson-Aalen cumulative hazard per user cohort on the SAME
    time-to-first-error risk table as the kaplan_meier entry —
    additive hazard increments instead of the survival product
    (stats.nelson_aalen)."""
    from padua_spark.operators.stats import nelson_aalen
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_type",
    )
    u = ev.groupBy("user_id").agg(
        F.min("_tu").alias("_t0"),
        F.max("_tu").alias("_tl"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("_tu"))
        ).alias("_te"),
    )
    subj = u.select(
        (F.col("user_id") % 2).alias("cohort"),
        F.floor(
            (F.coalesce(F.col("_te"), F.col("_tl")) - F.col("_t0"))
            / 3600000000.0
        )
        .cast("bigint")
        .alias("dur"),
        F.when(F.col("_te").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    out = nelson_aalen(subj, ["cohort"], "dur", "ev")
    return out.select(
        F.col("cohort").cast("bigint").alias("cohort"),
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        _r("cum_hazard").alias("cum_hazard"),
        _r("var_hazard").alias("var_hazard"),
    )


_HARRELLS_C_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_type,
    CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS vc
  FROM events
),
u AS (
  SELECT user_id,
    min(tu) AS t0, max(tu) AS t_last,
    min(CASE WHEN event_type = 'error' THEN tu END) AS t_err,
    CAST(sum(vc) AS BIGINT) AS risk
  FROM e GROUP BY user_id
),
subj AS (
  SELECT user_id % 4 AS cohort, risk,
    CASE WHEN t_err IS NOT NULL
      THEN CAST(floor((t_err - t0) / 3600000000.0) AS BIGINT)
      ELSE CAST(floor((t_last - t0) / 3600000000.0) AS BIGINT)
    END AS dur,
    CASE WHEN t_err IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM u
),
pairs AS (
  SELECT a.cohort,
    CASE WHEN a.risk > b.risk THEN 1 ELSE 0 END AS conc,
    CASE WHEN a.risk = b.risk THEN 1 ELSE 0 END AS tie
  FROM subj a JOIN subj b
    ON a.cohort = b.cohort AND a.dur < b.dur AND a.ev = 1
)
SELECT CAST(cohort AS BIGINT) AS cohort,
  CAST(count(*) AS BIGINT) AS n_comparable,
  CAST(sum(conc) AS BIGINT) AS n_concordant,
  CAST(sum(tie) AS BIGINT) AS n_tied_risk,
  round((sum(conc) + 0.5 * sum(tie)) / CAST(count(*) AS DOUBLE), 6)
    AS c_index
FROM pairs GROUP BY cohort
"""


@_q("harrells_c", _HARRELLS_C_ORACLE)
def q_harrells_c(spark, sf):
    """Harrell's concordance index per cohort: does cumulative spend
    (exact integer cents — deterministic ties on any engine) predict
    time-to-first-error? Bounded within-cohort pair join with the
    enforced max_group_size contract (stats.harrells_c)."""
    from padua_spark.operators.stats import harrells_c
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_type",
        F.round(F.coalesce(F.col("value"), F.lit(0)) * 100)
        .cast("bigint")
        .alias("_vc"),
    )
    u = ev.groupBy("user_id").agg(
        F.min("_tu").alias("_t0"),
        F.max("_tu").alias("_tl"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("_tu"))
        ).alias("_te"),
        F.sum("_vc").cast("bigint").alias("risk"),
    )
    subj = u.select(
        (F.col("user_id") % 4).alias("cohort"),
        "risk",
        F.floor(
            (F.coalesce(F.col("_te"), F.col("_tl")) - F.col("_t0"))
            / 3600000000.0
        )
        .cast("bigint")
        .alias("dur"),
        F.when(F.col("_te").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    out = harrells_c(subj, ["cohort"], "risk", "dur", "ev")
    return out.select(
        F.col("cohort").cast("bigint").alias("cohort"),
        "n_comparable",
        "n_concordant",
        "n_tied_risk",
        _r("c_index").alias("c_index"),
    )


_BARTLETT_ORACLE = """
WITH pg AS (
  SELECT l_partkey, l_returnflag,
         count(*) AS n, var_samp(l_quantity) AS v
  FROM lineitem WHERE l_quantity IS NOT NULL
  GROUP BY 1, 2 HAVING count(*) >= 2
),
c AS (
  SELECT l_partkey,
    CAST(count(*) AS BIGINT) AS k_groups,
    CAST(sum(n) AS BIGINT) AS n_total,
    sum((n - 1) * v) AS ssw,
    sum(CASE WHEN v > 0 THEN (n - 1) * ln(v) END) AS sln,
    sum(1.0 / (n - 1)) AS sinv,
    sum(CASE WHEN v <= 0 THEN 1 ELSE 0 END) AS bad
  FROM pg GROUP BY 1
)
SELECT l_partkey, k_groups, n_total,
  round(CASE WHEN k_groups >= 2 AND bad = 0
              AND ssw / (n_total - k_groups) > 0
    THEN ((CAST(n_total - k_groups AS DOUBLE)
           * ln(ssw / CAST(n_total - k_groups AS DOUBLE))) - sln)
         / (1.0 + (sinv - 1.0 / (n_total - k_groups))
                  / (3.0 * (k_groups - 1.0)))
    END, 6) AS bartlett_stat,
  CASE WHEN k_groups >= 2
       THEN CAST(k_groups - 1 AS DOUBLE) END AS dfree
FROM c
"""


@_q("bartlett_stats", _BARTLETT_ORACLE)
def q_bartlett_stats(spark, sf):
    """Bartlett homogeneity-of-variance per part across return flags —
    the classical counterpart to the levene_stats entry, closed-form
    from per-group variances (stats.bartlett_stats; p-value column
    pruned: the chi2 survival function is the numpy UDF side only)."""
    from padua_spark.operators.stats import bartlett_stats

    li = _t(spark, sf, "lineitem")
    out = bartlett_stats(li, ["l_partkey"], "l_returnflag", "l_quantity")
    return out.select(
        "l_partkey",
        "k_groups",
        "n_total",
        _r("bartlett_stat").alias("bartlett_stat"),
        "dfree",
    )


_MCNEMAR_ORACLE = """
WITH f AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS a,
         CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS b
  FROM lineitem
),
c AS (
  SELECT
    CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
    CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
    CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
    CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
  FROM f
),
s AS (
  SELECT *,
    CASE WHEN n01 + n10 > 0 THEN
      greatest(abs(CAST(n01 - n10 AS DOUBLE)) - 1.0, 0.0)
      * greatest(abs(CAST(n01 - n10 AS DOUBLE)) - 1.0, 0.0)
      / (n01 + n10) END AS stat
  FROM c
)
SELECT n00, n01, n10, n11,
  round(stat, 6) AS mcnemar_stat,
  round(CASE WHEN stat IS NOT NULL THEN
    (0.254829592 * t + -0.284496736 * t * t
     + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
     + 1.061405429 * t * t * t * t * t) * exp(-x2 * x2) END, 6)
    AS p_value
FROM (
  SELECT *, sqrt(coalesce(stat, 0.0)) / sqrt(2.0) AS x2,
    1.0 / (1.0 + 0.3275911 * (sqrt(coalesce(stat, 0.0)) / sqrt(2.0)))
      AS t
  FROM s
)
"""


@_q("mcnemar_flags", _MCNEMAR_ORACLE)
def q_mcnemar_flags(spark, sf):
    """McNemar paired-binary test: is the returned flag's marginal
    rate consistent with the line-status flag's on the same rows?
    One conditional aggregation, continuity-corrected chi2, the
    A&S-erfc chi2_1=Z^2 p shared verbatim with the oracle
    (stats.mcnemar_test)."""
    from padua_spark.operators.stats import mcnemar_test

    li = _t(spark, sf, "lineitem")
    flags = li.select(
        (F.col("l_returnflag") == "R").cast("int").alias("a"),
        (F.col("l_linestatus") == "F").cast("int").alias("b"),
    )
    out = mcnemar_test(flags, "a", "b")
    return out.select(
        "n00",
        "n01",
        "n10",
        "n11",
        _r("mcnemar_stat").alias("mcnemar_stat"),
        _r("p_value").alias("p_value"),
    )


_COCHRAN_ARMITAGE_ORACLE = """
WITH lvl AS (
  SELECT CAST(l_linenumber AS DOUBLE) AS s,
    count(*) AS n,
    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      AS BIGINT) AS r
  FROM lineitem GROUP BY 1
),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n_levels,
    CAST(sum(n) AS BIGINT) AS n_total,
    CAST(sum(r) AS BIGINT) AS n_success,
    sum(s * r) AS sr, sum(s * n) AS sn, sum(s * s * n) AS ssn
  FROM lvl
),
z AS (
  SELECT *,
    sr - (CAST(n_success AS DOUBLE) / n_total) * sn AS tstat,
    (CAST(n_success AS DOUBLE) / n_total)
      * (1.0 - CAST(n_success AS DOUBLE) / n_total)
      * (ssn - sn * sn / n_total) AS var
  FROM c
),
zz AS (
  SELECT n_levels, n_total, n_success, tstat,
    CASE WHEN var > 0 THEN tstat / sqrt(var) END AS zval
  FROM z
)
SELECT n_levels, n_total, n_success,
  round(tstat, 6) AS t_stat, round(zval, 6) AS z,
  round(CASE WHEN zval IS NOT NULL THEN
    (0.254829592 * t + -0.284496736 * t * t
     + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
     + 1.061405429 * t * t * t * t * t) * exp(-x2 * x2) END, 6)
    AS p_value
FROM (
  SELECT *, abs(coalesce(zval, 0.0)) / sqrt(2.0) AS x2,
    1.0 / (1.0 + 0.3275911 * (abs(coalesce(zval, 0.0)) / sqrt(2.0)))
      AS t
  FROM zz
)
"""


@_q("cochran_armitage", _COCHRAN_ARMITAGE_ORACLE)
def q_cochran_armitage(spark, sf):
    """Cochran-Armitage trend: does the return rate trend with line
    number? Per-level counts (tiny), closed-form T/Var/Z, A&S-erfc p
    (stats.cochran_armitage_trend)."""
    from padua_spark.operators.stats import cochran_armitage_trend

    li = _t(spark, sf, "lineitem")
    out = cochran_armitage_trend(
        li.select(
            F.col("l_linenumber").alias("s"),
            (F.col("l_returnflag") == "R").cast("int").alias("y"),
        ),
        "s",
        "y",
    )
    return out.select(
        "n_levels",
        "n_total",
        "n_success",
        _r("t_stat").alias("t_stat"),
        _r("z").alias("z"),
        _r("p_value").alias("p_value"),
    )


def _friedman_oracle() -> str:
    return """
WITH base AS (
  SELECT user_id AS b, event_type AS t,
    CAST(count(*) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
),
k AS (SELECT count(DISTINCT t) AS kt FROM base),
complete AS (
  SELECT b FROM base, k GROUP BY b, kt
  HAVING count(DISTINCT t) = kt AND count(*) = kt
),
kept AS (
  SELECT base.* FROM base JOIN complete USING (b)
),
ranked AS (
  SELECT b, t,
    rank() OVER (PARTITION BY b ORDER BY v)
      + (count(*) OVER (PARTITION BY b, v) - 1) / 2.0 AS rk,
    count(*) OVER (PARTITION BY b, v) AS tn
  FROM kept
),
rsums AS (
  SELECT t, sum(rk) AS rj FROM ranked GROUP BY t
),
s AS (
  SELECT sum(rj * rj) AS ssbn,
    CAST(count(*) AS BIGINT) AS k_treatments
  FROM rsums
),
ties AS (
  SELECT sum(tn * tn - 1.0) AS tie_sum,
    CAST(count(*) / (SELECT kt FROM k) AS BIGINT) AS n_blocks
  FROM ranked
)
SELECT n_blocks, k_treatments,
  round(CASE WHEN n_blocks > 0 AND k_treatments >= 2
              AND 1.0 - tie_sum / (n_blocks * k_treatments
                  * (CAST(k_treatments AS DOUBLE) * k_treatments - 1.0))
                  > 0
    THEN ((12.0 / (CAST(n_blocks AS DOUBLE) * k_treatments
                   * (k_treatments + 1.0))) * ssbn
          - 3.0 * n_blocks * (k_treatments + 1.0))
         / (1.0 - tie_sum / (CAST(n_blocks AS DOUBLE) * k_treatments
                  * (CAST(k_treatments AS DOUBLE) * k_treatments - 1.0)))
    END, 6) AS friedman_stat,
  CASE WHEN k_treatments >= 2
       THEN CAST(k_treatments - 1 AS DOUBLE) END AS dfree
FROM s, ties
"""


@_q("friedman_counts", _friedman_oracle())
def q_friedman_counts(spark, sf):
    """Friedman repeated-measures rank test: do event types differ in
    per-user activity, treating each user as a block? Midranks within
    complete blocks only, tie-corrected chi2 (stats.friedman_test;
    p-value pruned — chi2 sf is the numpy UDF side)."""
    from padua_spark.operators.stats import friedman_test

    e = _t(spark, sf, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("v")
    )
    out = friedman_test(counts, "user_id", "event_type", "v")
    return out.select(
        "n_blocks",
        "k_treatments",
        _r("friedman_stat").alias("friedman_stat"),
        "dfree",
    )


_TWO_SEGMENT_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id,
    CAST(round(value * 100) AS DOUBLE) AS vc
  FROM events WHERE value IS NOT NULL
),
w AS (
  SELECT user_id,
    sum(vc) OVER (PARTITION BY user_id ORDER BY tu, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1,
    sum(vc * vc) OVER (PARTITION BY user_id ORDER BY tu, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s2,
    row_number() OVER (PARTITION BY user_id ORDER BY tu, event_id)
      AS i,
    sum(vc) OVER (PARTITION BY user_id) AS t1,
    sum(vc * vc) OVER (PARTITION BY user_id) AS t2,
    count(*) OVER (PARTITION BY user_id) AS n
  FROM e
),
cand AS (
  SELECT user_id, n, i,
    (s2 - s1 * s1 / i)
      + ((t2 - s2) - (t1 - s1) * (t1 - s1) / (n - i)) AS sse,
    s1 / i AS ml, (t1 - s1) / (n - i) AS mr,
    t2 - t1 * t1 / n AS sse0
  FROM w WHERE i < n
),
best AS (
  SELECT user_id, CAST(max(n) AS BIGINT) AS n_obs,
    max(sse0) AS sse_total,
    min({'sse': sse, 'i': i, 'ml': ml, 'mr': mr}) AS b
  FROM cand GROUP BY user_id
),
singles AS (
  SELECT user_id, CAST(1 AS BIGINT) AS n_obs, 0.0 AS sse_total
  FROM w WHERE n = 1
)
SELECT user_id, n_obs,
  round(sse_total / 10000.0, 6) AS sse_total,
  round(struct_extract(b, 'sse') / 10000.0, 6) AS sse_split,
  round((sse_total - struct_extract(b, 'sse')) / 10000.0, 6) AS delta_sse,
  CAST(struct_extract(b, 'i') AS INT) AS split_pos,
  round(struct_extract(b, 'ml') / 100.0, 6) AS mean_left,
  round(struct_extract(b, 'mr') / 100.0, 6) AS mean_right
FROM best
UNION ALL
SELECT user_id, n_obs, round(sse_total, 6) AS sse_total,
  CAST(NULL AS DOUBLE) AS sse_split,
  CAST(NULL AS DOUBLE) AS delta_sse,
  CAST(NULL AS INT) AS split_pos,
  CAST(NULL AS DOUBLE) AS mean_left,
  CAST(NULL AS DOUBLE) AS mean_right
FROM singles
"""


@_q("two_segment_changepoint", _TWO_SEGMENT_ORACLE)
def q_two_segment_changepoint(spark, sf):
    """Per-user least-squares two-segment split over event values
    (temporal.two_segment_changepoint): prefix sums in exact integer
    cents (so both engines' running sums and the SSE argmin are
    bit-deterministic), reported in value units
    (cents^2/1e4, cents/100)."""
    from padua_spark.operators.temporal import two_segment_changepoint
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    e = base.where(F.col("value").isNotNull()).select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_id",
        F.round(F.col("value") * 100).cast("double").alias("_vc"),
    )
    out = two_segment_changepoint(
        e, ["user_id"], ["_tu", "event_id"], "_vc"
    )
    return out.select(
        "user_id",
        "n_obs",
        _r(F.col("sse_total") / 10000.0).alias("sse_total"),
        _r(F.col("sse_split") / 10000.0).alias("sse_split"),
        _r(F.col("delta_sse") / 10000.0).alias("delta_sse"),
        F.col("split_pos").cast("int").alias("split_pos"),
        _r(F.col("mean_left") / 100.0).alias("mean_left"),
        _r(F.col("mean_right") / 100.0).alias("mean_right"),
    )


# --- E108 longest duplicated substring (binary-search exact dedup) -----------

_LDS_ORACLE = """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
pos AS (
  SELECT doc_id, toks, i AS s, len(toks) AS n
  FROM docs, LATERAL unnest(generate_series(1, len(toks))) AS t(i)
),
suf AS (
  SELECT list_slice(toks, s, n) AS suffix FROM pos
),
ordered AS (
  SELECT suffix, lag(suffix) OVER (ORDER BY suffix) AS prev FROM suf
),
lcp AS (
  SELECT suffix,
    CASE WHEN prev IS NULL THEN 0 ELSE
      coalesce(
        list_min(list_transform(
          generate_series(1, least(len(suffix), len(prev))),
          i -> CASE WHEN suffix[i] IS DISTINCT FROM prev[i]
               THEN i END)) - 1,
        least(len(suffix), len(prev)))
    END AS l
  FROM ordered
),
m AS (SELECT max(l) AS max_len FROM lcp),
cand AS (
  SELECT DISTINCT
    array_to_string(list_slice(suffix, 1, m.max_len), ' ') AS sub
  FROM lcp, m WHERE l = m.max_len AND m.max_len > 0
),
win AS (
  SELECT array_to_string(list_slice(toks, s, s + m.max_len - 1), ' ')
         AS sub
  FROM pos, m WHERE m.max_len > 0 AND s + m.max_len - 1 <= n
),
chosen AS (SELECT min(sub) AS substring FROM cand)
SELECT CAST(m.max_len AS BIGINT) AS max_len,
  CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_dup_substrings,
  CAST((SELECT count(*) FROM win, chosen
        WHERE win.sub = chosen.substring) AS BIGINT) AS n_occurrences,
  chosen.substring AS substring
FROM m, chosen
"""


@_q("longest_dup_substring", _LDS_ORACLE)
def q_longest_dup_substring(spark, sf):
    """Exact longest duplicated token-substring over the corpus —
    distributed binary search on window length with O(1)-per-position
    rolling hashes and string-verified candidates (dedup.py
    longest_duplicated_substring); the oracle is the classic
    sorted-suffix adjacent-LCP formulation, a completely independent
    algorithm arriving at the same (length, count, substring)."""
    d = _t(spark, sf, "documents")
    return x_dedup.longest_duplicated_substring(d, "doc_id", "text")


# --- E106/E107 end-to-end pipeline macro entries (SURVEY §3.1/§3.2) ----------
#     The single-operator rows can't see cross-operator plan health
#     (stage fusion, shared scans, broadcast placement) that a real
#     padua migration hits first — these run pipelines.phospho_lfq and
#     pipelines.protein_groups_ratio END TO END over a deterministic
#     MaxQuant-shaped TSV fixture sized by the scale factor
#     (padua_spark/benchdata.py; generated once per sf, reused across
#     passes). The oracle reads the SAME fixture via DuckDB read_csv
#     and replays the whole chain in SQL: flag filters → column-grammar
#     melt → 0→NULL → log2 → per-sample median subtract → design join →
#     min-valid-in-any-group → t statistics → s0-curve significance
#     with the recursive-CTE incomplete-beta p-value — a full hash gate
#     on the flagship S-1/S-2 workflows, not a rows-only check.


def _pipeline_fixture_paths() -> tuple[str, str, str]:
    from padua_spark.benchdata import ensure_maxquant_fixture

    # oracles run at the driver's fixed sf0.01; the queries() callables
    # re-derive the fixture from their own sf_dir at call time
    return ensure_maxquant_fixture("/root/testdata/sf0.01")


def _pipeline_phospho_oracle() -> str:
    from padua_spark.benchdata import _LABELS

    pg, ds, _ = _pipeline_fixture_paths()
    melt = "\n  UNION ALL\n  ".join(
        f"SELECT id AS feature_id, '{lab}' AS sample_label, "
        f'CASE WHEN "Intensity {lab}" <> 0 '
        f'THEN CAST("Intensity {lab}" AS DOUBLE) END AS raw FROM wide'
        for lab in _LABELS
    )
    import math

    log10_fdr = repr(math.log10(0.05))
    return f"""
WITH RECURSIVE wide AS (
  SELECT * FROM read_csv('{pg}', delim='\t', header=true)
  WHERE (Reverse IS NULL OR Reverse NOT LIKE '%+%')
    AND ("Potential contaminant" IS NULL
         OR "Potential contaminant" NOT LIKE '%+%')
    AND "Localization prob" >= 0.75
),
lng AS (
  {melt}
),
logd AS (
  SELECT feature_id, sample_label,
         CASE WHEN raw > 0 THEN log2(raw) END AS lv
  FROM lng
),
med AS (
  SELECT sample_label, median(lv) AS md FROM logd GROUP BY 1
),
normd AS (
  SELECT l.feature_id, l.sample_label, l.lv - m.md AS value
  FROM logd l JOIN med m USING (sample_label)
),
designed AS (
  SELECT n.feature_id, n.value, d."Group" AS grp
  FROM normd n
  JOIN read_csv('{ds}', header=true) d ON trim(n.sample_label) = d.Label
),
keep AS (
  SELECT feature_id FROM (
    SELECT feature_id, grp, count(value) AS c
    FROM designed GROUP BY 1, 2
  ) GROUP BY feature_id HAVING max(c) >= 3
),
g AS (
  SELECT d.feature_id,
    avg(CASE WHEN grp='Control' THEN value END)      AS mean_a,
    avg(CASE WHEN grp='PGE2' THEN value END)         AS mean_b,
    count(CASE WHEN grp='Control' THEN value END)    AS n_a,
    count(CASE WHEN grp='PGE2' THEN value END)       AS n_b,
    var_samp(CASE WHEN grp='Control' THEN value END) AS var_a,
    var_samp(CASE WHEN grp='PGE2' THEN value END)    AS var_b
  FROM designed d JOIN keep USING (feature_id) GROUP BY 1
),
s AS (
  SELECT feature_id, n_a, n_b, mean_a, mean_b,
    CASE WHEN n_a >= 3 AND n_b >= 3 THEN
      CASE WHEN sqrt((((n_a - 1) * var_a + (n_b - 1) * var_b)
                      / CAST(n_a + n_b - 2 AS DOUBLE))
                     * (1.0/n_a + 1.0/n_b)) > 0
           THEN (mean_a - mean_b)
                / sqrt((((n_a - 1) * var_a + (n_b - 1) * var_b)
                        / CAST(n_a + n_b - 2 AS DOUBLE))
                       * (1.0/n_a + 1.0/n_b)) END
    END AS t_stat,
    CASE WHEN n_a >= 2 AND n_b >= 2
         THEN CAST(n_a + n_b - 2 AS DOUBLE) END AS df,
    CASE WHEN n_a >= 3 AND n_b >= 3 THEN mean_a - mean_b END AS fc
  FROM g
),
inp AS (
  SELECT feature_id AS key,
    CAST(df / (df + t_stat * t_stat) AS DOUBLE) AS x,
    CAST(df / 2.0 AS DOUBLE) AS a, CAST(0.5 AS DOUBLE) AS b
  FROM s WHERE t_stat IS NOT NULL AND df > 0
),
{_betainc_chain_sql()},
final AS (
  SELECT s.feature_id, s.n_a, s.n_b, s.mean_a, s.mean_b,
    s.t_stat, s.df, s.fc, pv.p,
    CASE WHEN s.fc IS NOT NULL AND pv.p IS NOT NULL
              AND abs(s.fc) > 0.0
              AND pv.p <= pow(10.0, -0.585 / abs(s.fc) + ({log10_fdr}))
         THEN TRUE ELSE FALSE END AS significant
  FROM s LEFT JOIN pv ON s.feature_id = pv.key
)
SELECT CAST(feature_id AS BIGINT) AS feature_id,
  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
  round(t_stat, 6) AS t_stat, df,
  round(fc, 6) AS log2_fc,
  round(p, 6) AS p_value,
  significant,
  CASE WHEN significant AND fc > 0 THEN 'up'
       WHEN significant AND fc < 0 THEN 'down'
       ELSE 'ns' END AS direction
FROM final
"""


@_q("pipeline_phospho_lfq", _pipeline_phospho_oracle())
def q_pipeline_phospho_lfq(spark, sf):
    """SURVEY §3.1 entry point A end to end (reference: the File S-1
    supplement notebook; padua io.py:6-18 → filters.py:37-90 →
    process/normalization → visualize.volcano's compute core): one
    lazy plan from TSV scan to the volcano frame, timed as a single
    macro-bench row."""
    from padua_spark import pipelines
    from padua_spark.benchdata import ensure_maxquant_fixture

    pg, ds, _ = ensure_maxquant_fixture(sf)
    out = pipelines.phospho_lfq(spark, pg, ds, "Control", "PGE2")
    v = out["volcano"]
    return v.select(
        F.col("feature_id").cast("long").alias("feature_id"),
        "n_a",
        "n_b",
        _r("mean_a").alias("mean_a"),
        _r("mean_b").alias("mean_b"),
        _r("t_stat").alias("t_stat"),
        "df",
        _r("log2_fc").alias("log2_fc"),
        F.round("p_value", 6).alias("p_value"),
        "significant",
        "direction",
    )


def _pipeline_silac_oracle() -> str:
    pg, _, rds = _pipeline_fixture_paths()
    melt = "\n  UNION ALL\n  ".join(
        f"SELECT id AS feature_id, 'E{e}' AS sample_label, "
        f'CAST("Ratio H/L normalized E{e}" AS DOUBLE) AS raw FROM wide'
        for e in (1, 2, 3)
    )
    return f"""
WITH RECURSIVE wide AS (
  SELECT * FROM read_csv('{pg}', delim='\t', header=true)
  WHERE (Reverse IS NULL OR Reverse NOT LIKE '%+%')
    AND ("Potential contaminant" IS NULL
         OR "Potential contaminant" NOT LIKE '%+%')
    AND ("Only identified by site" IS NULL
         OR "Only identified by site" NOT LIKE '%+%')
),
lng AS (
  {melt}
),
logd AS (
  SELECT l.feature_id,
         CASE WHEN raw > 0 THEN log2(raw) END AS value
  FROM lng l
  JOIN read_csv('{rds}', header=true) d
    ON trim(l.sample_label) = d.Label
),
keep AS (
  SELECT feature_id FROM logd
  GROUP BY feature_id HAVING count(value) >= 2
),
g AS (
  SELECT l.feature_id,
    avg(value) AS mean, stddev_samp(value) AS sd,
    count(value) AS n
  FROM logd l JOIN keep USING (feature_id) GROUP BY 1
),
s AS (
  SELECT feature_id, mean, sd, n,
    CASE WHEN n >= 2 AND sd > 0
         THEN mean / (sd / sqrt(n)) END AS t_stat,
    CASE WHEN n >= 2 THEN CAST(n - 1 AS DOUBLE) END AS df
  FROM g
),
inp AS (
  SELECT feature_id AS key,
    CAST(df / (df + t_stat * t_stat) AS DOUBLE) AS x,
    CAST(df / 2.0 AS DOUBLE) AS a, CAST(0.5 AS DOUBLE) AS b
  FROM s WHERE t_stat IS NOT NULL AND df > 0
),
{_betainc_chain_sql()}
SELECT CAST(s.feature_id AS BIGINT) AS feature_id,
  round(s.mean, 6) AS mean, round(s.sd, 6) AS sd,
  CAST(s.n AS BIGINT) AS n,
  round(s.t_stat, 6) AS t_stat, s.df,
  round(pv.p, 6) AS p_value
FROM s LEFT JOIN pv ON s.feature_id = pv.key
"""


@_q("pipeline_silac_ratio", _pipeline_silac_oracle())
def q_pipeline_silac_ratio(spark, sf):
    """SURVEY §3.2 entry point B end to end (File S-2: proteinGroups
    SILAC normalized-ratio one-sample volcano): filters → ratio melt →
    log2 → design join → min-valid → one-sample t vs 0 with exact
    p-values, one lazy plan."""
    from padua_spark import pipelines
    from padua_spark.benchdata import ensure_maxquant_fixture

    pg, _, rds = ensure_maxquant_fixture(sf)
    out = pipelines.protein_groups_ratio(
        spark, pg, rds, min_valid_per_group=2
    )
    t = out["onesample_ttest"]
    return t.select(
        F.col("feature_id").cast("long").alias("feature_id"),
        _r("mean").alias("mean"),
        _r("sd").alias("sd"),
        "n",
        _r("t_stat").alias("t_stat"),
        "df",
        F.round("p_value", 6).alias("p_value"),
    )


def _pipeline_msp_oracle() -> str:
    from padua_spark.benchdata import _LABELS, ensure_msp_fixture

    msp, ds = ensure_msp_fixture("/root/testdata/sf0.01")
    melt = "\n  UNION ALL\n  ".join(
        f"SELECT id AS feature_id, '{lab}' AS sample_label, "
        f'CASE WHEN "Intensity {lab}" <> 0 '
        f'THEN CAST("Intensity {lab}" AS DOUBLE) END AS v, '
        f"Modifications AS mods FROM wide"
        for lab in _LABELS
    )
    return f"""
WITH wide AS (
  SELECT * FROM read_csv('{msp}', delim='\t', header=true)
),
lng AS (
  {melt}
),
persample AS (
  SELECT sample_label,
    sum(CASE WHEN contains(mods, 'Phospho (STY)') THEN v
        ELSE 0.0 END) AS modified_sum,
    sum(COALESCE(v, 0.0)) AS total_sum,
    sum(CASE WHEN contains(mods, 'Phospho (STY)') THEN v
        ELSE 0.0 END) / sum(COALESCE(v, 0.0)) AS enr
  FROM lng GROUP BY 1
),
designed AS (
  SELECT p.*, d."Group" AS grp
  FROM persample p
  JOIN read_csv('{ds}', header=true) d ON p.sample_label = d.Label
)
SELECT grp, CAST(count(*) AS BIGINT) AS n_samples,
  CAST(sum(modified_sum) AS BIGINT) AS modified_sum,
  CAST(sum(total_sum) AS BIGINT) AS total_sum,
  round(sum(modified_sum) / sum(total_sum), 6) AS pooled_enrichment,
  round(list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
                   list(enr ORDER BY sample_label)),
      (acc, s) -> acc + s) / CAST(count(*) AS DOUBLE), 6
  ) AS mean_enrichment
FROM designed GROUP BY 1
"""


@_q("pipeline_msp_enrichment", _pipeline_msp_oracle())
def q_pipeline_msp_enrichment(spark, sf):
    """SURVEY §3.3 entry point C end to end (File S-1 Statistical
    Analysis first half; reference analysis.py:263-287
    enrichment_from_msp + process.py:23 design join): CSV scan →
    stack melt → broadcast Modifications join → per-sample
    conditional aggregation → broadcast design join → per-Group
    roll-up, ONE lazy plan. Fixture intensities are exact integers
    so the float sums are order-independent (the committed
    micro-unit rule); the per-sample enrichment mean is an
    order-fixed sorted fold on both engines."""
    from padua_spark import pipelines
    from padua_spark.benchdata import ensure_msp_fixture

    msp, ds = ensure_msp_fixture(sf)
    out = pipelines.msp_enrichment(spark, msp, design_path=ds)
    return out.select(
        "grp",
        "n_samples",
        F.col("modified_sum").cast("bigint").alias("modified_sum"),
        F.col("total_sum").cast("bigint").alias("total_sum"),
        _r("pooled_enrichment").alias("pooled_enrichment"),
        _r("mean_enrichment").alias("mean_enrichment"),
    )


# --- ext round 8: data selection & corpus statistics ------------------------


_MIXING_WEIGHTS_ORACLE = """
WITH per AS (
  SELECT source AS domain, CAST(count(*) AS BIGINT) AS n
  FROM documents WHERE source IS NOT NULL GROUP BY 1
),
s AS (
  SELECT domain, n,
    CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS p
  FROM per
),
t AS (SELECT domain, n, p, pow(p, 0.7) AS pt FROM s),
w AS (
  SELECT domain, n, p,
    pt / sum(pt) OVER (ORDER BY domain
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS wt
  FROM t
)
SELECT domain, n, round(p, 9) AS p_raw, round(wt, 9) AS weight,
  round(wt * 1000000.0 / CAST(n AS DOUBLE), 9) AS epochs
FROM w
"""


@_q("mixing_weights", _MIXING_WEIGHTS_ORACLE)
def q_mixing_weights(spark, sf):
    """Temperature-scaled domain mixing weights (tau=0.7) with
    per-domain epoch factors for a 1M-token budget
    (sampling.mixing_temperature_weights)."""
    from padua_spark.extensions.sampling import mixing_temperature_weights

    d = _t(spark, sf, "documents")
    return mixing_temperature_weights(
        d, "source", tau=0.7, token_budget=1_000_000
    )


def _cluster_split_oracle() -> str:
    from padua_spark.extensions.sampling import split_assign_sql

    base = _dedup_clusters_oracle()
    expr = split_assign_sql(
        "cluster_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt=5
    )
    return f"""
WITH cl AS ({base})
SELECT doc_id, cluster_id, {expr} AS split FROM cl
"""


@_q("cluster_aware_split", _cluster_split_oracle())
def q_cluster_aware_split(spark, sf):
    """Near-dup-leakage-free train/val/test assignment: MinHash-LSH
    candidate pairs -> connected components -> split keyed on the
    CLUSTER id (sampling.cluster_aware_split), so near-duplicates can
    never straddle a split boundary."""
    from padua_spark.extensions.dedup import minhash_lsh_candidates
    from padua_spark.extensions.sampling import cluster_aware_split

    d = _t(spark, sf, "documents")
    pairs = minhash_lsh_candidates(
        d, "doc_id", "text", k_shingle=3, num_hashes=32, bands=8,
        portable_keys=True,
    ).where(F.col("est_jaccard") >= 0.5).select("id_a", "id_b")
    out = cluster_aware_split(
        d, "doc_id", pairs,
        {"train": 0.8, "val": 0.1, "test": 0.1}, salt=5,
    )
    return out.select("doc_id", "cluster_id", "split")


_TOKEN_BUCKET_SQL = """list_transform(string_split(text, ' '),
    w -> list_reduce(
        list_prepend(CAST(7 AS BIGINT),
          list_transform(list_filter(string_split(w, ''), c -> c <> ''),
                         c -> CAST(ord(c) AS BIGINT))),
        (a, c) -> (a * 131 + c) % 2147483647) % 4096)"""


_DSIR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, (lang = 'en') AS tgt, {_TOKEN_BUCKET_SQL} AS bs
  FROM documents
),
e AS (SELECT doc_id, tgt, u.b AS b FROM tok, unnest(bs) AS u(b)),
db AS (
  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c, bool_or(tgt) AS tgt
  FROM e GROUP BY 1, 2
),
bs AS (
  SELECT b, CAST(sum(c) AS BIGINT) AS cr,
    CAST(sum(CASE WHEN tgt THEN c ELSE 0 END) AS BIGINT) AS ct
  FROM db GROUP BY 1
),
lm AS (
  SELECT b,
    ln(CAST(ct AS DOUBLE) + 0.5)
      - ln(CAST(sum(ct) OVER () AS DOUBLE) + 0.5 * 4096)
      - ln(CAST(cr AS DOUBLE) + 0.5)
      + ln(CAST(sum(cr) OVER () AS DOUBLE) + 0.5 * 4096) AS lam
  FROM bs
)
SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_tokens,
  round(sum(CAST(d.c AS DOUBLE) * lm.lam), 6) AS log_weight
FROM db d JOIN lm USING (b) GROUP BY 1
"""


@_q("dsir_weights", _DSIR_ORACLE)
def q_dsir_weights(spark, sf):
    """DSIR importance log-weights (Xie et al. 2023): hashed-unigram
    target-vs-raw LM ratio per document, target = lang='en'
    (sampling.dsir_logweights)."""
    from padua_spark.extensions.sampling import dsir_logweights

    d = _t(spark, sf, "documents").withColumn(
        "_is_en", F.col("lang") == "en"
    )
    return dsir_logweights(
        d, "doc_id", "text", "_is_en", n_buckets=4096
    )


_HEAPS_ORACLE = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS a FROM documents
),
e AS (SELECT doc_id, u.t AS t FROM tok, unnest(a) AS u(t)),
firsts AS (SELECT t, min(doc_id) AS doc_id FROM e GROUP BY 1),
newc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS cnew FROM firsts GROUP BY 1
),
tokc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS ctok FROM e GROUP BY 1
),
per AS (
  SELECT tokc.doc_id, ctok, coalesce(cnew, 0) AS cnew
  FROM tokc LEFT JOIN newc USING (doc_id)
),
cum AS (
  SELECT doc_id,
    CAST(sum(ctok) OVER (ORDER BY doc_id) AS BIGINT) AS trun,
    CAST(sum(cnew) OVER (ORDER BY doc_id) AS BIGINT) AS vrun
  FROM per
),
pts AS (
  SELECT ln(CAST(trun AS DOUBLE)) AS x, ln(CAST(vrun AS DOUBLE)) AS y,
    trun, vrun
  FROM cum WHERE trun > 0
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_points,
    CAST(max(trun) AS BIGINT) AS n_tokens,
    CAST(max(vrun) AS BIGINT) AS n_vocab,
    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM pts
)
SELECT n_points, n_tokens, n_vocab,
  round((n_points * sxy - sx * sy) / (n_points * sxx - sx * sx), 6)
    AS beta,
  round((sy - ((n_points * sxy - sx * sy) / (n_points * sxx - sx * sx))
    * sx) / n_points, 6) AS log_k
FROM agg
"""


@_q("heaps_law", _HEAPS_ORACLE)
def q_heaps_law(spark, sf):
    """Heaps'-law vocabulary-growth exponent over the doc-id-ordered
    prefix curve (text.heaps_law) — corpus-health companion to
    zipf_slope."""
    from padua_spark.extensions.text import heaps_law

    d = _t(spark, sf, "documents")
    return heaps_law(d, "doc_id", "text")


_QUALITY_TOPQ_ORACLE = """
WITH thr AS (
  SELECT source, quantile_cont(CAST(n_chars AS DOUBLE), 0.8) AS t
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN thr USING (source)
WHERE CAST(d.n_chars AS DOUBLE) >= thr.t
"""


@_q("quality_topq", _QUALITY_TOPQ_ORACLE)
def q_quality_topq(spark, sf):
    """FineWeb-style per-source top-quantile selection: keep the top
    20% of each source by score (quality.top_quantile_by_group;
    integer scores make the threshold comparison ulp-robust across
    engines)."""
    from padua_spark.extensions.quality import top_quantile_by_group

    d = _t(spark, sf, "documents")
    out = top_quantile_by_group(
        d, ["source"], "n_chars", keep_fraction=0.2
    )
    return out.select("doc_id", "source", "n_chars")


# --- ext round 8: RMST / ACF / conformal / Poisson bootstrap ----------------


_KM_CURVE_PREFIX_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_type FROM events
),
u AS (
  SELECT user_id,
    min(tu) AS t0,
    max(tu) AS t_last,
    min(CASE WHEN event_type = 'error' THEN tu END) AS t_err
  FROM e GROUP BY user_id
),
subj AS (
  SELECT user_id % 2 AS cohort,
    CASE WHEN t_err IS NOT NULL
      THEN CAST(floor((t_err - t0) / 3600000000.0) AS BIGINT)
      ELSE CAST(floor((t_last - t0) / 3600000000.0) AS BIGINT)
    END AS dur,
    CASE WHEN t_err IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM u
),
counts AS (
  SELECT cohort, CAST(dur AS DOUBLE) AS t,
    CAST(sum(ev) AS BIGINT) AS n_events,
    CAST(sum(1 - ev) AS BIGINT) AS n_censored
  FROM subj GROUP BY 1, 2
),
risk AS (
  SELECT *,
    CAST(sum(n_events + n_censored) OVER (PARTITION BY cohort)
      - (sum(n_events + n_censored) OVER (PARTITION BY cohort ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - n_events - n_censored) AS BIGINT) AS n_risk
  FROM counts
),
f AS (
  SELECT *,
    CASE WHEN n_events > 0
          AND CAST(n_risk - n_events AS DOUBLE) / n_risk > 0
      THEN ln(CAST(n_risk - n_events AS DOUBLE) / n_risk)
      ELSE 0.0 END AS lnf,
    CASE WHEN n_events > 0
          AND CAST(n_risk - n_events AS DOUBLE) / n_risk <= 0
      THEN 1 ELSE 0 END AS zf
  FROM risk
),
s AS (
  SELECT cohort, t, n_risk, n_events, n_censored,
    CASE WHEN max(zf) OVER (PARTITION BY cohort ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
      THEN 0.0
      ELSE exp(sum(lnf) OVER (PARTITION BY cohort ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) END
      AS survival
  FROM f
)
"""


_RMST_ORACLE = (
    _KM_CURVE_PREFIX_SQL
    + """,
pts AS (
  SELECT cohort, t, survival,
    lead(t) OVER (PARTITION BY cohort ORDER BY t) AS tn
  FROM s WHERE n_events > 0
),
agg AS (
  SELECT cohort,
    CAST(count(*) AS BIGINT) AS n_curve_points,
    least(min(t), CAST(48 AS DOUBLE)) AS head,
    sum(CASE WHEN t < CAST(48 AS DOUBLE)
      THEN survival * (least(coalesce(tn, CAST(48 AS DOUBLE)),
                             CAST(48 AS DOUBLE)) - t)
      ELSE CAST(0 AS DOUBLE) END) AS area
  FROM pts GROUP BY 1
)
SELECT CAST(cohort AS BIGINT) AS cohort, CAST(48 AS DOUBLE) AS tau,
  n_curve_points, round(head + area, 6) AS rmst
FROM agg
"""
)


@_q("rmst", _RMST_ORACLE)
def q_rmst(spark, sf):
    """Restricted mean survival time at tau=48h over the same
    time-to-first-error cohorts as kaplan_meier (stats.rmst): area
    under the KM step curve via one lead() window over the
    distinct-event-time frame."""
    from padua_spark.operators.stats import rmst
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_type",
    )
    u = ev.groupBy("user_id").agg(
        F.min("_tu").alias("_t0"),
        F.max("_tu").alias("_tl"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("_tu"))
        ).alias("_te"),
    )
    subj = u.select(
        (F.col("user_id") % 2).alias("cohort"),
        F.floor(
            (
                F.coalesce(F.col("_te"), F.col("_tl")) - F.col("_t0")
            ).cast("double")
            / F.lit(3600000000.0)
        ).cast("bigint").alias("dur"),
        F.when(F.col("_te").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    return rmst(subj, ["cohort"], "dur", "ev", tau=48.0)


_ACF_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id,
    CAST(value AS DOUBLE) AS x
  FROM events WHERE value IS NOT NULL
),
m AS (
  SELECT user_id, x,
    avg(x) OVER (PARTITION BY user_id) AS mu,
    lead(x, 1) OVER w AS l1,
    lead(x, 2) OVER w AS l2,
    lead(x, 3) OVER w AS l3
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
),
agg AS (
  SELECT user_id,
    sum((x - mu) * (x - mu)) AS sxx,
    sum((x - mu) * (l1 - mu)) AS s1,
    sum((x - mu) * (l2 - mu)) AS s2,
    sum((x - mu) * (l3 - mu)) AS s3,
    CAST(count(l1) AS BIGINT) AS n1,
    CAST(count(l2) AS BIGINT) AS n2,
    CAST(count(l3) AS BIGINT) AS n3
  FROM m GROUP BY 1
)
SELECT user_id, 1 AS lag, n1 AS n_pairs,
  CASE WHEN sxx > 0 THEN round(s1 / sxx, 6) END AS acf FROM agg
UNION ALL
SELECT user_id, 2, n2,
  CASE WHEN sxx > 0 THEN round(s2 / sxx, 6) END FROM agg
UNION ALL
SELECT user_id, 3, n3,
  CASE WHEN sxx > 0 THEN round(s3 / sxx, 6) END FROM agg
"""


@_q("acf_user_value", _ACF_ORACLE)
def q_acf_user_value(spark, sf):
    """Per-user autocorrelation of event values at lags 1-3
    (temporal.acf_by_key): one key shuffle, one shared window pass
    for all lags, stack-to-long over plain aggregated columns."""
    from padua_spark.operators.temporal import acf_by_key
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    e = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_id",
        "value",
    )
    return acf_by_key(
        e, ["user_id"], ["_tu", "event_id"], "value", max_lag=3
    )


_CONFORMAL_ORACLE = """
WITH scored AS (
  SELECT event_id, user_id, CAST(value AS DOUBLE) AS x,
    avg(CAST(value AS DOUBLE)) OVER (PARTITION BY user_id) AS pred
  FROM events WHERE value IS NOT NULL
),
cal AS (SELECT abs(x - pred) AS v FROM scored WHERE user_id % 2 = 0),
per AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM cal GROUP BY 1),
run AS (
  SELECT v,
    CAST(sum(c) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS crun,
    CAST(sum(c) OVER () AS BIGINT) AS ctot
  FROM per
),
q AS (
  SELECT min(v) AS conformal_q FROM run
  WHERE crun >= least(
    CAST(ceil(CAST(ctot + 1 AS DOUBLE) * 0.9) AS BIGINT), ctot)
)
SELECT s.event_id, round(s.pred, 6) AS pred,
  round(q.conformal_q, 6) AS conformal_q,
  round(s.pred - q.conformal_q, 6) AS lo,
  round(s.pred + q.conformal_q, 6) AS hi
FROM scored s, q WHERE s.user_id % 2 = 1
"""


@_q("conformal_intervals", _CONFORMAL_ORACLE)
def q_conformal_intervals(spark, sf):
    """Split-conformal prediction intervals (alpha=0.1) for a
    per-user-mean predictor of event values: even users calibrate,
    odd users get intervals (quality.split_conformal_intervals).
    The conformal order statistic is an exact data value from the
    distributed stepped running count."""
    from padua_spark.extensions.quality import split_conformal_intervals
    from pyspark.sql import Window

    base = _t(spark, sf, "events").where(F.col("value").isNotNull())
    scored = base.select(
        "event_id",
        "user_id",
        F.col("value").cast("double").alias("_x"),
        F.avg(F.col("value").cast("double"))
        .over(Window.partitionBy("user_id"))
        .alias("_pred"),
    )
    cal = scored.where(F.col("user_id") % 2 == 0)
    test = scored.where(F.col("user_id") % 2 == 1)
    out = split_conformal_intervals(
        cal, test, "_pred", "_x", alpha=0.1
    )
    return out.select(
        "event_id",
        _r("_pred").alias("pred"),
        _r("conformal_q").alias("conformal_q"),
        _r("lo").alias("lo"),
        _r("hi").alias("hi"),
    )


def _poisson_bootstrap_oracle() -> str:
    from padua_spark.extensions.sampling import poisson1_draw_sql
    from padua_spark.functions.scalar import deterministic_uniform_sql

    u = deterministic_uniform_sql("(k * 100 + r)", 7)
    draw = poisson1_draw_sql("u")
    return f"""
WITH base AS (
  SELECT event_id AS k, CAST(value AS DOUBLE) AS x
  FROM events WHERE value IS NOT NULL
),
reps AS (
  SELECT k, x, g.r AS r
  FROM base, unnest(generate_series(1, 100)) AS g(r)
),
uu AS (SELECT r, x, {u} AS u FROM reps),
wtd AS (SELECT r, x, {draw} AS w FROM uu),
per AS (
  SELECT r, sum(CAST(w AS DOUBLE) * x) / sum(CAST(w AS DOUBLE)) AS m
  FROM wtd GROUP BY 1
),
ranked AS (SELECT m, row_number() OVER (ORDER BY m, r) AS rk FROM per),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows, avg(x) AS mean FROM base
),
ci AS (
  SELECT min(CASE WHEN rk = 3 THEN m END) AS lo,
         min(CASE WHEN rk = 98 THEN m END) AS hi
  FROM ranked
)
SELECT 100 AS n_reps, n_rows, round(mean, 6) AS mean,
  round(lo, 6) AS ci_lo, round(hi, 6) AS ci_hi
FROM stats, ci
"""


@_q("poisson_bootstrap", _poisson_bootstrap_oracle())
def q_poisson_bootstrap(spark, sf):
    """Poisson-bootstrap 95% CI for the mean event value, 100
    replicates in ONE data pass (sampling.poisson_bootstrap_ci):
    key-derived Poisson(1) weights, map-side-combined per-replicate
    sums, exact order-statistic bounds."""
    from padua_spark.extensions.sampling import poisson_bootstrap_ci

    e = _t(spark, sf, "events")
    return poisson_bootstrap_ci(
        e, "event_id", "value", n_reps=100, alpha=0.05, salt=7
    )


# --- ext round 8: Cox proportional hazards (full fixed-step SQL twin) ------


def _cox_gh_block(k: int, bsrc: str) -> str:
    """One Newton iteration's gradient/Hessian CTE chain at the betas
    in ``bsrc`` — risk-set suffix moments via the total-minus-prefix
    window identity (same algebra as the Spark operator's stepped
    suffix), Breslow ties."""
    return f"""
r{k} AS (
  SELECT s.t, s.e, s.x1, s.x2, exp(b.b1 * s.x1 + b.b2 * s.x2) AS r
  FROM subj s, {bsrc} b
),
pt{k} AS (
  SELECT t, CAST(sum(e) AS BIGINT) AS d,
    sum(CASE WHEN e = 1 THEN x1 ELSE CAST(0 AS DOUBLE) END) AS ex1,
    sum(CASE WHEN e = 1 THEN x2 ELSE CAST(0 AS DOUBLE) END) AS ex2,
    sum(r) AS sr, sum(r * x1) AS sr1, sum(r * x2) AS sr2,
    sum(r * x1 * x1) AS s11, sum(r * x1 * x2) AS s12,
    sum(r * x2 * x2) AS s22
  FROM r{k} GROUP BY 1
),
sf{k} AS (
  SELECT t, d, ex1, ex2,
    sum(sr)  OVER () - sum(sr)  OVER w + sr  AS S0,
    sum(sr1) OVER () - sum(sr1) OVER w + sr1 AS S1a,
    sum(sr2) OVER () - sum(sr2) OVER w + sr2 AS S1b,
    sum(s11) OVER () - sum(s11) OVER w + s11 AS S2aa,
    sum(s12) OVER () - sum(s12) OVER w + s12 AS S2ab,
    sum(s22) OVER () - sum(s22) OVER w + s22 AS S2bb
  FROM pt{k}
  WINDOW w AS (ORDER BY t
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
gh{k} AS (
  SELECT
    sum(ex1 - CAST(d AS DOUBLE) * S1a / S0) AS g1,
    sum(ex2 - CAST(d AS DOUBLE) * S1b / S0) AS g2,
    sum(CAST(d AS DOUBLE)
        * (S2aa / S0 - (S1a / S0) * (S1a / S0))) AS h11,
    sum(CAST(d AS DOUBLE)
        * (S2ab / S0 - (S1a / S0) * (S1b / S0))) AS h12,
    sum(CAST(d AS DOUBLE)
        * (S2bb / S0 - (S1b / S0) * (S1b / S0))) AS h22
  FROM sf{k} WHERE d > 0
)"""


def _cox_oracle(n_iters: int = 4) -> str:
    parts = ["""
e0 AS (
  SELECT user_id, epoch_us(ts) AS tu, event_type,
    CAST(value AS DOUBLE) AS v
  FROM events
),
u AS (
  SELECT user_id, min(tu) AS t0, max(tu) AS t_last,
    min(CASE WHEN event_type = 'error' THEN tu END) AS t_err,
    CAST(count(*) AS BIGINT) AS nev, avg(v) AS av
  FROM e0 GROUP BY user_id
),
subj AS (
  SELECT
    CAST(CASE WHEN t_err IS NOT NULL
      THEN floor((t_err - t0) / 3600000000.0)
      ELSE floor((t_last - t0) / 3600000000.0) END AS DOUBLE) AS t,
    CASE WHEN t_err IS NOT NULL THEN 1 ELSE 0 END AS e,
    ln(1.0 + CAST(nev AS DOUBLE)) AS x1,
    av / 100.0 AS x2
  FROM u WHERE av IS NOT NULL
),
b0 AS (SELECT CAST(0 AS DOUBLE) AS b1, CAST(0 AS DOUBLE) AS b2)"""]
    for k in range(1, n_iters + 1):
        parts.append(_cox_gh_block(k, f"b{k - 1}"))
        parts.append(f"""
b{k} AS (
  SELECT
    b.b1 + (g.h22 * g.g1 - g.h12 * g.g2)
      / (g.h11 * g.h22 - g.h12 * g.h12) AS b1,
    b.b2 + (g.h11 * g.g2 - g.h12 * g.g1)
      / (g.h11 * g.h22 - g.h12 * g.h12) AS b2
  FROM b{k - 1} b, gh{k} g
)""")
    last = n_iters + 1
    parts.append(_cox_gh_block(last, f"b{n_iters}"))
    parts.append(f"""
fin AS (
  SELECT b.b1, b.b2, g.h11, g.h12, g.h22,
    g.h11 * g.h22 - g.h12 * g.h12 AS det
  FROM b{n_iters} b, gh{last} g
),
res AS (
  SELECT 'x1' AS feature, b1 AS coef, sqrt(h22 / det) AS se FROM fin
  UNION ALL
  SELECT 'x2', b2, sqrt(h11 / det) FROM fin
),
zed AS (
  SELECT feature, coef, se, coef / se AS z,
    abs(coef / se) / sqrt(2.0) AS xx,
    1.0 / (1.0 + 0.3275911 * (abs(coef / se) / sqrt(2.0))) AS tt
  FROM res
)
SELECT feature, round(coef, 6) AS coef,
  round(exp(coef), 6) AS hazard_ratio,
  round(se, 6) AS se, round(z, 6) AS z,
  round((0.254829592 * tt + -0.284496736 * tt * tt
         + 1.421413741 * tt * tt * tt
         + -1.453152027 * tt * tt * tt * tt
         + 1.061405429 * tt * tt * tt * tt * tt) * exp(-xx * xx), 6)
    AS p_value
FROM zed""")
    return "WITH " + ",".join(parts).replace("WITH \n", "WITH ", 1)


@_q("cox_ph", _cox_oracle(4))
def q_cox_ph(spark, sf):
    """Cox proportional hazards on time-to-first-error (stats.cox_ph,
    Breslow ties, 4 fixed Newton steps): features are each user's
    log event count and mean event value. The oracle is the SAME
    fixed-step Newton recursion unrolled as chained SQL CTEs with the
    closed-form 2x2 solve — the full model fit is value-checked, not
    just the sufficient statistics."""
    from padua_spark.operators.stats import cox_ph
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_type",
        F.col("value").cast("double").alias("_v"),
    )
    u = ev.groupBy("user_id").agg(
        F.min("_tu").alias("_t0"),
        F.max("_tu").alias("_tl"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("_tu"))
        ).alias("_te"),
        F.count(F.lit(1)).cast("bigint").alias("_nev"),
        F.avg("_v").alias("_av"),
    )
    subj = u.where(F.col("_av").isNotNull()).select(
        F.floor(
            (
                F.coalesce(F.col("_te"), F.col("_tl")) - F.col("_t0")
            ).cast("double")
            / F.lit(3600000000.0)
        ).cast("double").alias("dur"),
        F.when(F.col("_te").isNotNull(), 1).otherwise(0).alias("ev"),
        F.log(F.lit(1.0) + F.col("_nev").cast("double")).alias("x1"),
        (F.col("_av") / F.lit(100.0)).alias("x2"),
    )
    return cox_ph(subj, ["x1", "x2"], "dur", "ev", n_iters=4)


# --- ext round 8: competing risks (Aalen-Johansen) --------------------------


_CIF_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_type FROM events
),
u AS (
  SELECT user_id, min(tu) AS t0, max(tu) AS tl,
    min(CASE WHEN event_type = 'error' THEN tu END) AS te,
    min(CASE WHEN event_type = 'purchase' THEN tu END) AS tp
  FROM e GROUP BY 1
),
subj AS (
  SELECT user_id % 2 AS cohort,
    CAST(floor(((CASE
      WHEN te IS NOT NULL AND (tp IS NULL OR te <= tp) THEN te
      WHEN tp IS NOT NULL THEN tp
      ELSE tl END) - t0) / 3600000000.0) AS DOUBLE) AS t,
    CASE WHEN te IS NOT NULL AND (tp IS NULL OR te <= tp) THEN 1
         WHEN tp IS NOT NULL THEN 2 ELSE 0 END AS c
  FROM u
),
allc AS (
  SELECT cohort, t,
    CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d,
    CAST(count(*) AS BIGINT) AS at
  FROM subj GROUP BY 1, 2
),
risk AS (
  SELECT cohort, t, d,
    CAST(sum(at) OVER (PARTITION BY cohort)
      - (sum(at) OVER wc - at) AS BIGINT) AS n
  FROM allc
  WINDOW wc AS (PARTITION BY cohort ORDER BY t
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
f AS (
  SELECT *,
    CASE WHEN d > 0 AND CAST(n - d AS DOUBLE) / n > 0
      THEN ln(CAST(n - d AS DOUBLE) / n) ELSE 0.0 END AS lnf,
    CASE WHEN d > 0 AND CAST(n - d AS DOUBLE) / n <= 0
      THEN 1 ELSE 0 END AS zf
  FROM risk
),
s AS (
  SELECT cohort, t, n,
    CASE WHEN max(zf) OVER wc = 1 THEN 0.0
      ELSE exp(sum(lnf) OVER wc) END AS sv
  FROM f
  WINDOW wc AS (PARTITION BY cohort ORDER BY t
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
sp AS (
  SELECT cohort, t, n,
    coalesce(lag(sv) OVER (PARTITION BY cohort ORDER BY t),
             CAST(1 AS DOUBLE)) AS sprev
  FROM s
),
cc AS (
  SELECT cohort, t, c AS cause, CAST(count(*) AS BIGINT) AS n_events
  FROM subj WHERE c > 0 GROUP BY 1, 2, 3
),
j AS (
  SELECT cc.cohort, cc.cause, cc.t, sp.n AS n_risk, cc.n_events,
    sp.sprev * CAST(cc.n_events AS DOUBLE) / CAST(sp.n AS DOUBLE)
      AS term
  FROM cc JOIN sp ON cc.cohort = sp.cohort AND cc.t = sp.t
)
SELECT CAST(cohort AS BIGINT) AS cohort, cause, t, n_risk, n_events,
  round(sum(term) OVER (PARTITION BY cohort, cause ORDER BY t
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cif
FROM j
"""


@_q("cumulative_incidence", _CIF_ORACLE)
def q_cumulative_incidence(spark, sf):
    """Aalen-Johansen cumulative incidence under competing risks
    (stats.cumulative_incidence): per user, first 'error' (cause 1)
    competes with first 'purchase' (cause 2), censored at the last
    event otherwise; cohorts = user_id parity. 1-KM per cause would
    overestimate both curves — this is the correct decomposition
    (sum_k CIF_k = 1 - S_allcause)."""
    from padua_spark.operators.stats import cumulative_incidence
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_type",
    )
    u = ev.groupBy("user_id").agg(
        F.min("_tu").alias("_t0"),
        F.max("_tu").alias("_tl"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("_tu"))
        ).alias("_te"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("_tu"))
        ).alias("_tp"),
    )
    err_first = F.col("_te").isNotNull() & (
        F.col("_tp").isNull() | (F.col("_te") <= F.col("_tp"))
    )
    endt = (
        F.when(err_first, F.col("_te"))
        .when(F.col("_tp").isNotNull(), F.col("_tp"))
        .otherwise(F.col("_tl"))
    )
    subj = u.select(
        (F.col("user_id") % 2).alias("cohort"),
        F.floor(
            (endt - F.col("_t0")).cast("double") / F.lit(3600000000.0)
        ).cast("double").alias("dur"),
        F.when(err_first, 1)
        .when(F.col("_tp").isNotNull(), 2)
        .otherwise(0)
        .alias("cause"),
    )
    return cumulative_incidence(subj, ["cohort"], "dur", "cause")


# --- ext round 8: proportion CIs & 2x2 effect sizes -------------------------


_WILSON_ORACLE = """
WITH u AS (
  SELECT user_id,
    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
),
g AS (
  SELECT user_id % 4 AS cohort, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(conv) AS BIGINT) AS successes
  FROM u GROUP BY 1
)
SELECT CAST(cohort AS BIGINT) AS cohort, n, successes,
  round(CAST(successes AS DOUBLE) / n, 6) AS p_hat,
  round((CAST(successes AS DOUBLE) / n
      + CAST(1.959963984540054 AS DOUBLE) * CAST(1.959963984540054 AS DOUBLE) / (2.0 * n)
      - CAST(1.959963984540054 AS DOUBLE) * sqrt(
          (CAST(successes AS DOUBLE) / n) * (1.0 - CAST(successes AS DOUBLE) / n) / n
          + CAST(1.959963984540054 AS DOUBLE) * CAST(1.959963984540054 AS DOUBLE) / (4.0 * n * n)))
    / (1.0 + CAST(1.959963984540054 AS DOUBLE) * CAST(1.959963984540054 AS DOUBLE) / n), 6)
    AS ci_lo,
  round((CAST(successes AS DOUBLE) / n
      + CAST(1.959963984540054 AS DOUBLE) * CAST(1.959963984540054 AS DOUBLE) / (2.0 * n)
      + CAST(1.959963984540054 AS DOUBLE) * sqrt(
          (CAST(successes AS DOUBLE) / n) * (1.0 - CAST(successes AS DOUBLE) / n) / n
          + CAST(1.959963984540054 AS DOUBLE) * CAST(1.959963984540054 AS DOUBLE) / (4.0 * n * n)))
    / (1.0 + CAST(1.959963984540054 AS DOUBLE) * CAST(1.959963984540054 AS DOUBLE) / n), 6)
    AS ci_hi
FROM g
"""


@_q("wilson_ci", _WILSON_ORACLE)
def q_wilson_ci(spark, sf):
    """Wilson score CI for per-cohort conversion rates
    (stats.proportion_wilson_ci): user converted iff they ever
    purchased; cohorts = user_id % 4."""
    from padua_spark.operators.stats import proportion_wilson_ci

    e = _t(spark, sf, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    cohorts = u.select(
        (F.col("user_id") % 4).alias("cohort"), "conv"
    )
    return proportion_wilson_ci(cohorts, ["cohort"], "conv")


_ODDS_RATIO_ORACLE = """
WITH u AS (
  SELECT user_id,
    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS expo,
    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS outc
  FROM events GROUP BY 1
),
t AS (
  SELECT
    CAST(sum(CASE WHEN expo = 1 AND outc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(sum(CASE WHEN expo = 1 AND outc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(sum(CASE WHEN expo = 0 AND outc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(sum(CASE WHEN expo = 0 AND outc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM u
),
adj AS (
  SELECT a, b, c, d,
    CAST(a AS DOUBLE) + h AS aa, CAST(b AS DOUBLE) + h AS bb,
    CAST(c AS DOUBLE) + h AS cc, CAST(d AS DOUBLE) + h AS dd
  FROM (
    SELECT *, CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0
      THEN CAST(0.5 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS h
    FROM t
  )
),
m AS (
  SELECT a, b, c, d,
    ln((aa / bb) / (cc / dd)) AS lor,
    sqrt(1.0 / aa + 1.0 / bb + 1.0 / cc + 1.0 / dd) AS se_or,
    ln((aa / (aa + bb)) / (cc / (cc + dd))) AS lrr,
    sqrt(1.0 / aa - 1.0 / (aa + bb) + 1.0 / cc - 1.0 / (cc + dd))
      AS se_rr
  FROM adj
)
SELECT a, b, c, d,
  round(exp(lor), 6) AS odds_ratio,
  round(exp(lor - CAST(1.959963984540054 AS DOUBLE) * se_or), 6) AS or_lo,
  round(exp(lor + CAST(1.959963984540054 AS DOUBLE) * se_or), 6) AS or_hi,
  round(exp(lrr), 6) AS relative_risk,
  round(exp(lrr - CAST(1.959963984540054 AS DOUBLE) * se_rr), 6) AS rr_lo,
  round(exp(lrr + CAST(1.959963984540054 AS DOUBLE) * se_rr), 6) AS rr_hi
FROM m
"""


@_q("odds_ratio", _ODDS_RATIO_ORACLE)
def q_odds_ratio(spark, sf):
    """Odds ratio + relative risk with Wald CIs for the 2x2
    exposure/outcome table 'did the user ever hit an error' x 'did
    they ever purchase' (stats.odds_ratio_ci, Haldane-corrected)."""
    from padua_spark.operators.stats import odds_ratio_ci

    e = _t(spark, sf, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("expo"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("outc"),
    )
    return odds_ratio_ci(u, "expo", "outc")


# --- ext round 8: uplift evaluation (Qini) ----------------------------------


_QINI_ORACLE = """
WITH u AS (
  SELECT user_id,
    CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase'
        THEN 1 ELSE 0 END) >= 13 THEN 1 ELSE 0 END AS DOUBLE) AS y,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      AS BIGINT) AS clicks
  FROM events GROUP BY 1
),
b AS (
  SELECT CAST(user_id % 2 AS INTEGER) AS t, y,
    -CAST(clicks AS DOUBLE) AS ns
  FROM u
),
per AS (
  SELECT ns,
    CAST(sum(t) AS BIGINT) AS nt,
    CAST(sum(1 - t) AS BIGINT) AS nc,
    sum(CASE WHEN t = 1 THEN y ELSE CAST(0 AS DOUBLE) END) AS yt,
    sum(CASE WHEN t = 0 THEN y ELSE CAST(0 AS DOUBLE) END) AS yc
  FROM b GROUP BY 1
),
st AS (
  SELECT ns, nt, nc, yt, yc,
    CAST(sum(nt) OVER w AS BIGINT) AS ntr,
    CAST(sum(nc) OVER w AS BIGINT) AS ncr,
    sum(yt) OVER w AS ytr,
    sum(yc) OVER w AS ycr,
    CAST(sum(nt) OVER () AS BIGINT) AS ntt,
    CAST(sum(nc) OVER () AS BIGINT) AS nct,
    sum(yt) OVER () AS ytt,
    sum(yc) OVER () AS yct
  FROM per
  WINDOW w AS (ORDER BY ns
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
terms AS (
  SELECT ntt, nct, ytt, yct,
    (CASE WHEN ncr > 0
       THEN ytr - ycr * CAST(ntr AS DOUBLE) / CAST(ncr AS DOUBLE)
       ELSE ytr END
     + CASE WHEN ncr - nc > 0
       THEN (ytr - yt) - (ycr - yc)
         * CAST(ntr - nt AS DOUBLE) / CAST(ncr - nc AS DOUBLE)
       ELSE ytr - yt END) / 2.0
    * (CAST(nt + nc AS DOUBLE) / CAST(ntt + nct AS DOUBLE)) AS term
  FROM st
),
agg AS (
  SELECT max(ntt) AS ntt, max(nct) AS nct, max(ytt) AS ytt,
    max(yct) AS yct, sum(term) AS area
  FROM terms
),
fin AS (
  SELECT CAST(ntt + nct AS BIGINT) AS n,
    CAST(ntt AS BIGINT) AS n_treated,
    CAST(nct AS BIGINT) AS n_control,
    CASE WHEN nct > 0
      THEN ytt - yct * CAST(ntt AS DOUBLE) / CAST(nct AS DOUBLE)
      ELSE ytt END AS qf,
    area
  FROM agg
)
SELECT n, n_treated, n_control,
  round(qf, 6) AS qini_final,
  round(area, 6) AS qini_area,
  round(qf / 2.0, 6) AS qini_random,
  round(area - qf / 2.0, 6) AS qini_coef
FROM fin
"""


@_q("qini_uplift", _QINI_ORACLE)
def q_qini_uplift(spark, sf):
    """Qini uplift-targeting area (quality.qini_auuc): treatment =
    user-id parity (a clean A/B split), outcome = a heavy
    purchaser (>= 13 purchase events), targeting score = click
    count. Outcome/score are integers, so
    every accumulation is exact until the final divisions."""
    from padua_spark.extensions.quality import qini_auuc

    e = _t(spark, sf, "events")
    u = e.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 13
        ).cast("double").alias("y"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).cast("bigint").alias("clicks"),
    )
    b = u.select(
        (F.col("user_id") % 2).cast("int").alias("t"),
        "y",
        F.col("clicks").cast("double").alias("score"),
    )
    return qini_auuc(b, "t", "y", "score")


# --- ext round 8: Markov removal-effect attribution -------------------------


def _markov_attr_oracle(n_squarings: int = 6) -> str:
    channels = ["click", "error", "signup", "view"]
    parts = ["""
e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id, event_type FROM events
),
mark AS (
  SELECT user_id, tu, event_id, event_type,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ic,
    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY tu, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS prior
  FROM e
),
kept AS (SELECT * FROM mark WHERE prior = 0),
seq AS (
  SELECT user_id, event_type, ic,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY tu, event_id)
      AS prev,
    row_number() OVER (PARTITION BY user_id ORDER BY tu DESC,
      event_id DESC) AS rnd,
    max(ic) OVER (PARTITION BY user_id) AS has
  FROM kept
),
trans AS (
  SELECT coalesce(prev, 'START') AS src,
    CASE WHEN ic = 1 THEN 'CONV' ELSE event_type END AS dst
  FROM seq
  UNION ALL
  SELECT event_type, 'NULL' FROM seq WHERE has = 0 AND rnd = 1
),
counts AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM trans GROUP BY 1, 2
),
probs AS (
  SELECT src, dst,
    CAST(n AS DOUBLE)
      / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE) AS p
  FROM counts
)"""]
    systems = [("full", None)] + [(c, c) for c in channels]
    for lbl, excl in systems:
        cond = "dst <> 'NULL'"
        if excl is not None:
            cond += f" AND src <> '{excl}' AND dst <> '{excl}'"
        parts.append(f"""
m_{lbl}_0 AS MATERIALIZED (
  SELECT src AS si,
    CASE WHEN dst = 'CONV' THEN '__A__' ELSE dst END AS sj,
    sum(p) AS v
  FROM probs WHERE {cond}
  GROUP BY 1, 2
  UNION ALL SELECT '__A__', '__A__', CAST(1 AS DOUBLE)
)""")
        for k in range(n_squarings):
            parts.append(f"""
m_{lbl}_{k + 1} AS MATERIALIZED (
  SELECT a.si, b.sj, sum(a.v * b.v) AS v
  FROM m_{lbl}_{k} a JOIN m_{lbl}_{k} b ON a.sj = b.si
  GROUP BY 1, 2
)""")
        parts.append(f"""
p_{lbl} AS (
  SELECT coalesce(max(CASE WHEN si = 'START' AND sj = '__A__'
    THEN v END), CAST(0 AS DOUBLE)) AS p
  FROM m_{lbl}_{n_squarings}
)""")
    rems = "\n  UNION ALL\n".join(
        f"  SELECT '{c}' AS channel, 1 - p_{c}.p / p_full.p AS r"
        f" FROM p_{c}, p_full"
        for c in channels
    )
    parts.append(f"""
rem AS (
{rems}
),
tot AS (SELECT sum(r) AS tr FROM rem)""")
    body = ",".join(parts)
    return f"""WITH {body}
SELECT channel, round(r, 6) AS removal_effect,
  round(r / tot.tr, 6) AS attribution_share,
  round(p_full.p, 6) AS p_conv
FROM rem, p_full, tot"""


@_q("markov_attribution", _markov_attr_oracle())
def q_markov_attribution(spark, sf):
    """Removal-effect (first-order Markov) multi-touch attribution
    over per-user paths to first purchase (temporal.touch_transitions
    -> temporal.markov_attribution): channels click/view/signup/error,
    absorption by 6 fixed matrix squarings — the SQL twin performs
    the IDENTICAL squarings sparsely, so the data-driven attribution
    itself is value-checked, not just the transition counts."""
    from padua_spark.operators.temporal import (
        markov_attribution,
        touch_transitions,
    )
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_id",
        "event_type",
    )
    trans = touch_transitions(
        ev, "user_id", ["_tu", "event_id"], "event_type",
        conversion="purchase",
    )
    return markov_attribution(trans)


# --- ext round 8: Cox baseline hazard & k-core peel -------------------------


_COX_BASELINE_ORACLE = """
WITH e0 AS (
  SELECT user_id, epoch_us(ts) AS tu, event_type,
    CAST(value AS DOUBLE) AS v
  FROM events
),
u AS (
  SELECT user_id, min(tu) AS t0, max(tu) AS t_last,
    min(CASE WHEN event_type = 'error' THEN tu END) AS t_err,
    CAST(count(*) AS BIGINT) AS nev, avg(v) AS av
  FROM e0 GROUP BY 1
),
subj AS (
  SELECT
    CAST(CASE WHEN t_err IS NOT NULL
      THEN floor((t_err - t0) / 3600000000.0)
      ELSE floor((t_last - t0) / 3600000000.0) END AS DOUBLE) AS t,
    CASE WHEN t_err IS NOT NULL THEN 1 ELSE 0 END AS e,
    ln(1.0 + CAST(nev AS DOUBLE)) AS x1,
    av / 100.0 AS x2
  FROM u WHERE av IS NOT NULL
),
r AS (
  SELECT t, e,
    exp(CAST(0.1 AS DOUBLE) * x1 + CAST(-0.05 AS DOUBLE) * x2) AS rr
  FROM subj
),
pt AS (
  SELECT t, CAST(sum(e) AS BIGINT) AS d, sum(rr) AS sr
  FROM r GROUP BY 1
),
sf AS (
  SELECT t, d,
    sum(sr) OVER () - sum(sr) OVER w + sr AS s0
  FROM pt
  WINDOW w AS (ORDER BY t
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
ev AS (
  SELECT t, d, s0, CAST(d AS DOUBLE) / s0 AS term
  FROM sf WHERE d > 0
),
cum AS (
  SELECT t, d, s0,
    sum(term) OVER (ORDER BY t
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h
  FROM ev
)
SELECT t, d AS n_events, round(s0, 6) AS s0_risk,
  round(h, 6) AS h0_cum, round(exp(-h), 6) AS s0_baseline
FROM cum
"""


@_q("cox_baseline", _COX_BASELINE_ORACLE)
def q_cox_baseline(spark, sf):
    """Breslow baseline cumulative hazard at GIVEN Cox coefficients
    (0.1, -0.05) over the same time-to-first-error subjects as cox_ph
    (stats.cox_baseline_hazard) — the step that turns coefficients
    into survival predictions S(t|x)=exp(-H0(t)exp(bx))."""
    from padua_spark.operators.stats import cox_baseline_hazard
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_type",
        F.col("value").cast("double").alias("_v"),
    )
    u = ev.groupBy("user_id").agg(
        F.min("_tu").alias("_t0"),
        F.max("_tu").alias("_tl"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("_tu"))
        ).alias("_te"),
        F.count(F.lit(1)).cast("bigint").alias("_nev"),
        F.avg("_v").alias("_av"),
    )
    subj = u.where(F.col("_av").isNotNull()).select(
        F.floor(
            (
                F.coalesce(F.col("_te"), F.col("_tl")) - F.col("_t0")
            ).cast("double")
            / F.lit(3600000000.0)
        ).cast("double").alias("dur"),
        F.when(F.col("_te").isNotNull(), 1).otherwise(0).alias("ev"),
        F.log(F.lit(1.0) + F.col("_nev").cast("double")).alias("x1"),
        (F.col("_av") / F.lit(100.0)).alias("x2"),
    )
    return cox_baseline_hazard(
        subj, ["x1", "x2"], "dur", "ev", [0.1, -0.05]
    )


def _kcore_oracle(k: int = 2, n_rounds: int = 6) -> str:
    parts = ["""
pe AS (
  SELECT s, d FROM (
    SELECT l1.l_partkey AS s, l2.l_partkey AS d,
      CAST(count(*) AS BIGINT) AS c
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey
     AND l1.l_partkey < l2.l_partkey
    GROUP BY 1, 2
  ) WHERE c >= 2
),
e0 AS MATERIALIZED (
  SELECT DISTINCT s, d FROM (
    SELECT s, d FROM pe UNION ALL SELECT d AS s, s AS d FROM pe
  ) WHERE s <> d
)"""]
    for i in range(1, n_rounds + 1):
        parts.append(f"""
k{i} AS MATERIALIZED (
  SELECT s FROM (
    SELECT s, count(*) AS c FROM e{i - 1} GROUP BY 1
  ) WHERE c >= {k}
),
e{i} AS MATERIALIZED (
  SELECT e.s, e.d
  FROM e{i - 1} e JOIN k{i} a ON e.s = a.s JOIN k{i} b ON e.d = b.s
)""")
    body = ",".join(parts)
    return f"""WITH {body}
SELECT s AS node, CAST(count(*) AS BIGINT) AS degree
FROM e{n_rounds} GROUP BY 1"""


@_q("kcore_parts", _kcore_oracle())
def q_kcore_parts(spark, sf):
    """2-core of the REPEAT part co-order graph (graph.kcore_peel,
    6 fixed peeling rounds, each round's doubly-consumed edge frame
    persisted): parts that co-occur in >= 2 orders are linked — the
    weight filter keeps the graph at affinity-signal density (the raw
    co-order graph is near-complete and peel-proof), and the core
    keeps the densely co-purchased assortment while peeling
    tendrils."""
    from padua_spark.extensions.graph import kcore_peel

    li = _t(spark, sf, "lineitem")
    pairs = (
        li.alias("a")
        .join(
            li.alias("b"),
            on=[
                F.col("a.l_orderkey") == F.col("b.l_orderkey"),
                F.col("a.l_partkey") < F.col("b.l_partkey"),
            ],
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("_w"))
        .where(F.col("_w") >= 2)
        .select("src", "dst")
    )
    return kcore_peel(pairs, k=2, n_rounds=6)


# --- ext round 8: stratified 2x2 pooling & k-treatment marginal tests -------


_MH_ORACLE = """
WITH u AS (
  SELECT user_id,
    CASE WHEN sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      >= 14 THEN 1 ELSE 0 END AS expo,
    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      >= 14 THEN 1 ELSE 0 END AS outc
  FROM events GROUP BY 1
),
per AS (
  SELECT user_id % 4 AS st,
    CAST(sum(CASE WHEN expo = 1 AND outc = 1 THEN 1 ELSE 0 END)
      AS DOUBLE) AS a,
    CAST(sum(CASE WHEN expo = 1 AND outc = 0 THEN 1 ELSE 0 END)
      AS DOUBLE) AS b,
    CAST(sum(CASE WHEN expo = 0 AND outc = 1 THEN 1 ELSE 0 END)
      AS DOUBLE) AS c,
    CAST(sum(CASE WHEN expo = 0 AND outc = 0 THEN 1 ELSE 0 END)
      AS DOUBLE) AS d
  FROM u GROUP BY 1
),
terms AS (
  SELECT a, b, c, d, a + b + c + d AS n,
    a * d / (a + b + c + d) AS r,
    b * c / (a + b + c + d) AS s,
    (a + d) / (a + b + c + d) AS p,
    (b + c) / (a + b + c + d) AS q,
    CASE WHEN a + b + c + d > 1
      THEN a - (a + b) * (a + c) / (a + b + c + d) ELSE 0.0 END AS ae,
    CASE WHEN a + b + c + d > 1
      THEN (a + b) * (c + d) * (a + c) * (b + d)
        / ((a + b + c + d) * (a + b + c + d) * (a + b + c + d - 1))
      ELSE 0.0 END AS v
  FROM per WHERE a + b + c + d > 0
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k_strata,
    sum(r) AS sr, sum(s) AS ss, sum(p * r) AS spr,
    sum(p * s + q * r) AS spsqr, sum(q * s) AS sqs,
    sum(ae) AS sae, sum(v) AS sv
  FROM terms
),
m AS (
  SELECT k_strata, ln(sr / ss) AS lor,
    sqrt(spr / (2.0 * sr * sr) + spsqr / (2.0 * sr * ss)
         + sqs / (2.0 * ss * ss)) AS se,
    sae * sae / sv AS chi2
  FROM agg
)
SELECT k_strata,
  round(exp(lor), 6) AS or_mh,
  round(exp(lor - CAST(1.959963984540054 AS DOUBLE) * se), 6) AS ci_lo,
  round(exp(lor + CAST(1.959963984540054 AS DOUBLE) * se), 6) AS ci_hi,
  round(chi2, 6) AS cmh_chi2,
  round((0.254829592 * tt + -0.284496736 * tt * tt
         + 1.421413741 * tt * tt * tt
         + -1.453152027 * tt * tt * tt * tt
         + 1.061405429 * tt * tt * tt * tt * tt) * exp(-xx * xx), 6)
    AS p_value
FROM (
  SELECT *, sqrt(chi2) / sqrt(2.0) AS xx,
    1.0 / (1.0 + 0.3275911 * (sqrt(chi2) / sqrt(2.0))) AS tt
  FROM m
)
"""


@_q("mh_odds_ratio", _MH_ORACLE)
def q_mh_odds_ratio(spark, sf):
    """Mantel-Haenszel pooled odds ratio of 'heavy-error user'
    (>= 14 error events) x 'heavy purchaser' (>= 14 purchases),
    stratified over user_id % 4 cohorts (stats.mantel_haenszel_or):
    RBG variance CI + CMH chi-square, p via the shared A&S erfc
    surface (chi2(1) SF = 2*normal_sf)."""
    from padua_spark.operators.stats import mantel_haenszel_or

    e = _t(spark, sf, "events")
    u = e.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            )
            >= 14
        ).cast("int").alias("expo"),
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14
        ).cast("int").alias("outc"),
    ).select(
        (F.col("user_id") % 4).alias("st"), "expo", "outc"
    )
    return mantel_haenszel_or(u, ["st"], "expo", "outc")


_COCHRANS_Q_ORACLE = """
WITH w AS (
  SELECT user_id,
    CASE WHEN sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      >= 14 THEN 1 ELSE 0 END AS f_click,
    CASE WHEN sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      >= 14 THEN 1 ELSE 0 END AS f_error,
    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      >= 14 THEN 1 ELSE 0 END AS f_purchase,
    CASE WHEN sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      >= 14 THEN 1 ELSE 0 END AS f_signup,
    CASE WHEN sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      >= 14 THEN 1 ELSE 0 END AS f_view
  FROM events GROUP BY 1
),
longf AS (
  SELECT user_id, 'click' AS t, f_click AS f FROM w
  UNION ALL SELECT user_id, 'error', f_error FROM w
  UNION ALL SELECT user_id, 'purchase', f_purchase FROM w
  UNION ALL SELECT user_id, 'signup', f_signup FROM w
  UNION ALL SELECT user_id, 'view', f_view FROM w
),
rows_ AS (
  SELECT user_id, CAST(sum(f) AS BIGINT) AS r FROM longf GROUP BY 1
),
cols_ AS (
  SELECT t, CAST(sum(f) AS BIGINT) AS c FROM longf GROUP BY 1
),
rs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_subjects,
    CAST(sum(r) AS BIGINT) AS n,
    CAST(sum(r * r) AS BIGINT) AS r2
  FROM rows_
),
cs AS (SELECT CAST(sum(c * c) AS BIGINT) AS c2 FROM cols_),
m AS (
  SELECT n_subjects,
    CASE WHEN 5.0 * CAST(n AS DOUBLE) - CAST(r2 AS DOUBLE) > 0 THEN
      5.0 * 4.0 * (CAST(c2 AS DOUBLE)
        - CAST(n AS DOUBLE) * CAST(n AS DOUBLE) / 5.0)
      / (5.0 * CAST(n AS DOUBLE) - CAST(r2 AS DOUBLE)) END AS q
  FROM rs, cs
)
SELECT CAST(5 AS BIGINT) AS k_treatments, n_subjects,
  CAST(0 AS BIGINT) AS n_dropped,
  round(q, 6) AS q_stat, CAST(4 AS BIGINT) AS dfree,
  round(exp(-q / 2.0) * (1.0 + q / 2.0), 6) AS p_value
FROM m
"""


@_q("cochrans_q", _COCHRANS_Q_ORACLE)
def q_cochrans_q(spark, sf):
    """Cochran's Q marginal-homogeneity test across the five event
    types as paired binary 'treatments' per user (flag = >= 14 events
    of the type; stats.cochrans_q). Oracle p via the exact even-df
    chi-square closed form exp(-q/2)(1+q/2) (df=4), which the
    engine's incomplete-gamma UDF reproduces to machine precision."""
    from padua_spark.operators.stats import cochrans_q

    e = _t(spark, sf, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    w = e.groupBy("user_id").agg(
        *[
            (
                F.sum(
                    F.when(F.col("event_type") == t, 1).otherwise(0)
                )
                >= 14
            ).cast("int").alias(f"f_{t}")
            for t in types
        ]
    )
    stacked = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"), F.col(f"f_{t}").alias("f")
            )
            for t in types
        ]
    )
    longf = w.select(
        "user_id", F.explode(stacked).alias("_s")
    ).select(
        "user_id", F.col("_s.t").alias("t"), F.col("_s.f").alias("f")
    )
    return cochrans_q(longf, "user_id", "t", "f")


# --- ext round 8: logistic regression (full fixed-step SQL twin) -----------


def _logreg_oracle(n_iters: int = 6) -> str:
    """The SAME fixed-step Newton/IRLS recursion as ml.logistic_regression,
    unrolled as chained MATERIALIZED CTEs (plain CTEs inline and the
    b{k-1}-referenced-twice chain would blow up 2^n) with the
    closed-form symmetric 3x3 adjugate solve."""
    inv = {
        "00": "(h11*h22 - h12*h12)",
        "01": "(h02*h12 - h01*h22)",
        "02": "(h01*h12 - h02*h11)",
        "11": "(h00*h22 - h02*h02)",
        "12": "(h01*h02 - h00*h12)",
        "22": "(h00*h11 - h01*h01)",
    }
    det = (
        "(h00*(h11*h22 - h12*h12) - h01*(h01*h22 - h02*h12)"
        " + h02*(h01*h12 - h02*h11))"
    )
    parts = ["""
base AS MATERIALIZED (
  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
    CAST(1.0 AS DOUBLE) AS x0,
    ln(1.0 + CAST(n_chars AS DOUBLE)) AS x1,
    CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
      / CAST(length(text) AS DOUBLE) AS x2
  FROM documents
  WHERE lang IS NOT NULL AND text IS NOT NULL
    AND n_chars IS NOT NULL AND length(text) > 0
),
b0 AS (SELECT CAST(0 AS DOUBLE) AS b0, CAST(0 AS DOUBLE) AS b1,
  CAST(0 AS DOUBLE) AS b2)"""]

    def gh_block(k: int, bsrc: str) -> str:
        return f"""
m{k} AS (
  SELECT y, x0, x1, x2,
    1.0 / (1.0 + exp(-(b.b0 * x0 + b.b1 * x1 + b.b2 * x2))) AS mu
  FROM base, {bsrc} b
),
gh{k} AS MATERIALIZED (
  SELECT
    sum(x0 * (y - mu)) AS g0, sum(x1 * (y - mu)) AS g1,
    sum(x2 * (y - mu)) AS g2,
    sum(x0 * x0 * mu * (1 - mu)) AS h00,
    sum(x0 * x1 * mu * (1 - mu)) AS h01,
    sum(x0 * x2 * mu * (1 - mu)) AS h02,
    sum(x1 * x1 * mu * (1 - mu)) AS h11,
    sum(x1 * x2 * mu * (1 - mu)) AS h12,
    sum(x2 * x2 * mu * (1 - mu)) AS h22
  FROM m{k}
)"""

    for k in range(1, n_iters + 1):
        parts.append(gh_block(k, f"b{k - 1}"))
        parts.append(f"""
b{k} AS MATERIALIZED (
  SELECT
    b.b0 + ({inv['00']}*g0 + {inv['01']}*g1 + {inv['02']}*g2)/{det} AS b0,
    b.b1 + ({inv['01']}*g0 + {inv['11']}*g1 + {inv['12']}*g2)/{det} AS b1,
    b.b2 + ({inv['02']}*g0 + {inv['12']}*g1 + {inv['22']}*g2)/{det} AS b2
  FROM b{k - 1} b, gh{k}
)""")
    last = n_iters + 1
    parts.append(gh_block(last, f"b{n_iters}"))
    parts.append(f"""
fin AS (
  SELECT b.b0, b.b1, b.b2,
    sqrt({inv['00']}/{det}) AS se0,
    sqrt({inv['11']}/{det}) AS se1,
    sqrt({inv['22']}/{det}) AS se2
  FROM b{n_iters} b, gh{last}
),
res AS (
  SELECT '(intercept)' AS feature, b0 AS coef, se0 AS se FROM fin
  UNION ALL SELECT 'x1', b1, se1 FROM fin
  UNION ALL SELECT 'x2', b2, se2 FROM fin
),
zed AS (
  SELECT feature, coef, se, coef / se AS z,
    abs(coef / se) / sqrt(2.0) AS xx,
    1.0 / (1.0 + 0.3275911 * (abs(coef / se) / sqrt(2.0))) AS tt
  FROM res
)
SELECT feature, round(coef, 6) AS coef,
  round(CASE WHEN abs(coef) <= 10.0 THEN exp(coef) END, 6)
    AS odds_ratio,
  round(se, 6) AS se, round(z, 6) AS z,
  round((0.254829592 * tt + -0.284496736 * tt * tt
         + 1.421413741 * tt * tt * tt
         + -1.453152027 * tt * tt * tt * tt
         + 1.061405429 * tt * tt * tt * tt * tt) * exp(-xx * xx), 6)
    AS p_value
FROM zed""")
    return "WITH " + ",".join(parts).replace("WITH \n", "WITH ", 1)


@_q("logistic_regression", _logreg_oracle(6))
def q_logistic_regression(spark, sf):
    """Binary logistic regression (ml.logistic_regression, 6 fixed
    Newton/IRLS steps): predict lang='en' from log document length
    and space-character ratio. The oracle unrolls the IDENTICAL
    fixed-step recursion as chained SQL CTEs with the closed-form
    3x3 adjugate solve — the full GLM fit is value-checked."""
    from padua_spark.operators.ml import logistic_regression

    d = _t(spark, sf, "documents")
    feat = d.where(
        F.col("lang").isNotNull()
        & F.col("text").isNotNull()
        & F.col("n_chars").isNotNull()
        & (F.length("text") > 0)
    ).select(
        (F.col("lang") == "en").cast("double").alias("y"),
        F.log(F.lit(1.0) + F.col("n_chars").cast("double")).alias("x1"),
        (
            (
                F.length("text")
                - F.length(F.regexp_replace("text", " ", ""))
            ).cast("double")
            / F.length("text").cast("double")
        ).alias("x2"),
    )
    return logistic_regression(feat, ["x1", "x2"], "y", n_iters=6)


# --- ext round 8: multiple linear regression (one-pass normal equations) ---


def _ols_oracle() -> str:
    inv = {
        "00": "(s11*s22 - s12*s12)",
        "01": "(s02*s12 - s01*s22)",
        "02": "(s01*s12 - s02*s11)",
        "11": "(s00*s22 - s02*s02)",
        "12": "(s01*s02 - s00*s12)",
        "22": "(s00*s11 - s01*s01)",
    }
    det = (
        "(s00*(s11*s22 - s12*s12) - s01*(s01*s22 - s02*s12)"
        " + s02*(s01*s12 - s02*s11))"
    )
    return f"""
WITH RECURSIVE d0 AS (
  SELECT CAST(1.0 AS DOUBLE) AS x0,
    CAST(l_quantity AS DOUBLE) AS x1,
    CAST(l_discount AS DOUBLE) AS x2,
    log2(l_extendedprice) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    AND l_extendedprice IS NOT NULL AND l_extendedprice > 0
),
g AS (
  SELECT sum(x0*x0) AS s00, sum(x0*x1) AS s01, sum(x0*x2) AS s02,
    sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
    sum(x0*y) AS sy0, sum(x1*y) AS sy1, sum(x2*y) AS sy2,
    sum(y*y) AS syy, CAST(count(*) AS BIGINT) AS n
  FROM d0
),
sol AS (
  SELECT *,
    ({inv['00']}*sy0 + {inv['01']}*sy1 + {inv['02']}*sy2)/{det} AS b0,
    ({inv['01']}*sy0 + {inv['11']}*sy1 + {inv['12']}*sy2)/{det} AS b1,
    ({inv['02']}*sy0 + {inv['12']}*sy1 + {inv['22']}*sy2)/{det} AS b2
  FROM g
),
fit AS (
  SELECT *,
    syy - 2.0*(b0*sy0 + b1*sy1 + b2*sy2)
      + (b0*b0*s00 + b1*b1*s11 + b2*b2*s22
         + 2.0*(b0*b1*s01 + b0*b2*s02 + b1*b2*s12)) AS rss,
    n - 3 AS dfree,
    syy - sy0*sy0/n AS tss
  FROM sol
),
res0 AS (
  SELECT '(intercept)' AS feature, b0 AS coef,
    sqrt(rss/dfree * {inv['00']}/{det}) AS se,
    dfree, 1.0 - rss/tss AS r2, n FROM fit
  UNION ALL
  SELECT 'x1', b1, sqrt(rss/dfree * {inv['11']}/{det}),
    dfree, 1.0 - rss/tss, n FROM fit
  UNION ALL
  SELECT 'x2', b2, sqrt(rss/dfree * {inv['22']}/{det}),
    dfree, 1.0 - rss/tss, n FROM fit
),
zed AS (
  SELECT feature, coef, se, coef/se AS t_stat, dfree, r2, n
  FROM res0
),
inp AS (
  SELECT feature AS key,
    CAST(dfree / (dfree + t_stat * t_stat) AS DOUBLE) AS x,
    CAST(dfree / 2.0 AS DOUBLE) AS a, CAST(0.5 AS DOUBLE) AS b
  FROM zed WHERE t_stat IS NOT NULL AND dfree > 0
),
{_betainc_chain_sql()}
SELECT z.feature, round(z.coef, 6) AS coef, round(z.se, 6) AS se,
  round(z.t_stat, 6) AS t_stat, CAST(z.dfree AS BIGINT) AS dfree,
  round(pv.p, 6) AS p_value, round(z.r2, 6) AS r2, z.n AS n
FROM zed z LEFT JOIN pv ON z.feature = pv.key
"""


@_q("ols_regression", _ols_oracle())
def q_ols_regression(spark, sf):
    """Multiple linear regression via ONE-PASS normal equations
    (ml.ols_regression): log2 price on quantity + discount. The data
    is aggregated once to the 3x3 Gram + moment vector; the oracle
    runs the identical closed-form adjugate solve and the shared
    199-step incomplete-beta recursion for Student-t p-values."""
    from padua_spark.operators.ml import ols_regression

    li = _t(spark, sf, "lineitem")
    feat = li.where(
        F.col("l_quantity").isNotNull()
        & F.col("l_discount").isNotNull()
        & F.col("l_extendedprice").isNotNull()
        & (F.col("l_extendedprice") > 0)
    ).select(
        F.col("l_quantity").cast("double").alias("x1"),
        F.col("l_discount").cast("double").alias("x2"),
        F.log2("l_extendedprice").alias("y"),
    )
    return ols_regression(feat, ["x1", "x2"], "y")


# --- ext round 8: isotonic (PAVA) calibration -------------------------------


_ISOTONIC_ORACLE = """
WITH base AS (
  SELECT least(0.999, greatest(0.0, CAST(value AS DOUBLE) / 200.0)) AS s,
    CASE WHEN (event_id % 10) < 3 OR value > 70 THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
),
pts AS (
  SELECT least(49, CAST(floor(s * 50) AS INT)) AS bin,
    CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS sy
  FROM base GROUP BY 1
),
cum AS (
  SELECT bin, c, sy,
    CAST(sum(c) OVER (ORDER BY bin) AS BIGINT) AS cc,
    CAST(sum(sy) OVER (ORDER BY bin) AS BIGINT) AS csy
  FROM pts
),
seg AS (
  SELECT a.bin AS i, b.bin AS j,
    CAST(b.csy - a.csy + a.sy AS DOUBLE)
      / CAST(b.cc - a.cc + a.c AS DOUBLE) AS avg
  FROM cum a JOIN cum b ON a.bin <= b.bin
),
mn AS (
  SELECT i, j, min(avg) OVER (PARTITION BY i ORDER BY j DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
  FROM seg
),
iso AS (
  SELECT j AS bin, iso FROM (
    SELECT i, j, max(m) OVER (PARTITION BY j) AS iso FROM mn
  ) WHERE i = j
)
SELECT p.bin, p.c AS n,
  round(CAST(p.sy AS DOUBLE) / CAST(p.c AS DOUBLE), 6) AS rate_raw,
  round(iso.iso, 6) AS rate_iso
FROM pts p JOIN iso USING (bin)
"""


@_q("isotonic_calibration", _ISOTONIC_ORACLE)
def q_isotonic_calibration(spark, sf):
    """Isotonic (PAVA) calibration curve of a synthetic event score
    against a noisy, loosely-increasing label
    (quality.isotonic_calibration): the sequential-looking fit runs
    as the closed-form max-min identity — one aggregation to the
    50-bin frame, then two window passes over the bounded segment
    grid. The oracle mirrors the identical relational algebra."""
    from padua_spark.extensions.quality import isotonic_calibration

    e = _t(spark, sf, "events")
    feat = e.where(F.col("value").isNotNull()).select(
        F.least(
            F.lit(0.999),
            F.greatest(F.lit(0.0), F.col("value").cast("double") / 200.0),
        ).alias("s"),
        (
            ((F.col("event_id") % 10) < 3) | (F.col("value") > 70)
        ).cast("int").alias("y"),
    )
    return isotonic_calibration(feat, "s", "y", n_bins=50)


# --- ext round 8: label propagation communities -----------------------------


def _labelprop_oracle(n_rounds: int = 4) -> str:
    parts = ["""
pe AS (
  SELECT s, d FROM (
    SELECT l1.l_partkey AS s, l2.l_partkey AS d,
      CAST(count(*) AS BIGINT) AS c
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey
     AND l1.l_partkey < l2.l_partkey
    GROUP BY 1, 2
  ) WHERE c >= 2
),
e0 AS MATERIALIZED (
  SELECT DISTINCT s, d FROM (
    SELECT s, d FROM pe UNION ALL SELECT d AS s, s AS d FROM pe
  ) WHERE s <> d
),
l0 AS MATERIALIZED (SELECT DISTINCT s AS n, s AS lbl FROM e0)"""]
    for i in range(1, n_rounds + 1):
        parts.append(f"""
c{i} AS MATERIALIZED (
  SELECT e.d AS n, l.lbl, CAST(count(*) AS BIGINT) AS c
  FROM e0 e JOIN l{i - 1} l ON e.s = l.n
  GROUP BY 1, 2
),
l{i} AS MATERIALIZED (
  SELECT n, lbl FROM (
    SELECT n, lbl,
      row_number() OVER (PARTITION BY n ORDER BY c DESC, lbl ASC) AS rk
    FROM c{i}
  ) WHERE rk = 1
)""")
    body = ",".join(parts)
    return f"""WITH {body}
SELECT n AS node, lbl AS label FROM l{n_rounds}"""


@_q("label_propagation", _labelprop_oracle(4))
def q_label_propagation(spark, sf):
    """Communities of the repeat part co-order graph by 4 fixed
    synchronous label-propagation rounds (graph.label_propagation,
    smallest-label tie-break): per round one edge-label join + one
    (node, label) count + one argmax, each round localCheckpoint-ed.
    The oracle runs the identical fixed schedule as a MATERIALIZED
    CTE ladder."""
    from padua_spark.extensions.graph import label_propagation

    li = _t(spark, sf, "lineitem")
    pairs = (
        li.alias("a")
        .join(
            li.alias("b"),
            on=[
                F.col("a.l_orderkey") == F.col("b.l_orderkey"),
                F.col("a.l_partkey") < F.col("b.l_partkey"),
            ],
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("_w"))
        .where(F.col("_w") >= 2)
        .select("src", "dst")
    )
    return label_propagation(pairs, n_rounds=4)


# --- ext round 8: link prediction (CN / Jaccard / Adamic-Adar) --------------


_LINKPRED_ORACLE = """
WITH pe AS (
  SELECT s, d FROM (
    SELECT l1.l_partkey AS s, l2.l_partkey AS d,
      CAST(count(*) AS BIGINT) AS c
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey
     AND l1.l_partkey < l2.l_partkey
    GROUP BY 1, 2
  ) WHERE c >= 2
),
e0 AS MATERIALIZED (
  SELECT DISTINCT s, d FROM (
    SELECT s, d FROM pe UNION ALL SELECT d AS s, s AS d FROM pe
  ) WHERE s <> d
),
deg AS MATERIALIZED (
  SELECT s AS n, CAST(count(*) AS BIGINT) AS deg FROM e0 GROUP BY 1
),
adj AS (
  SELECT e.s AS w, e.d AS nb,
    CASE WHEN dg.deg > 1
      THEN 1.0 / ln(CAST(dg.deg AS DOUBLE)) END AS invlog
  FROM e0 e JOIN deg dg ON e.s = dg.n AND dg.deg <= 1000
),
pr AS MATERIALIZED (
  SELECT a.nb AS u, b.nb AS v, CAST(count(*) AS BIGINT) AS common,
    sum(a.invlog) AS aa
  FROM adj a JOIN adj b ON a.w = b.w AND a.nb < b.nb
  GROUP BY 1, 2
),
flt AS (
  SELECT * FROM pr WHERE common >= 2
    AND NOT EXISTS (SELECT 1 FROM e0 WHERE e0.s = pr.u AND e0.d = pr.v)
)
SELECT f.u, f.v, f.common,
  round(CAST(f.common AS DOUBLE)
        / CAST(du.deg + dv.deg - f.common AS DOUBLE), 6) AS jaccard,
  round(f.aa, 6) AS adamic_adar
FROM flt f JOIN deg du ON f.u = du.n JOIN deg dv ON f.v = dv.n
"""


@_q("link_prediction", _LINKPRED_ORACLE)
def q_link_prediction(spark, sf):
    """Link-prediction scores (graph.link_prediction) on the repeat
    part co-order graph: distance-2 non-adjacent pairs scored by
    common neighbors, Jaccard, and Adamic-Adar via ONE bounded wedge
    self-join (hub centers excluded by the enforced
    max_center_degree contract) + an anti-join against existing
    edges."""
    from padua_spark.extensions.graph import link_prediction

    li = _t(spark, sf, "lineitem")
    pairs = (
        li.alias("a")
        .join(
            li.alias("b"),
            on=[
                F.col("a.l_orderkey") == F.col("b.l_orderkey"),
                F.col("a.l_partkey") < F.col("b.l_partkey"),
            ],
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("_w"))
        .where(F.col("_w") >= 2)
        .select("src", "dst")
    )
    return link_prediction(pairs, min_common=2)


# --- ext round 8: pairwise association rules --------------------------------


_ASSOC_ORACLE = """
WITH base AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
),
nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM base),
isup AS (
  SELECT i, CAST(count(*) AS BIGINT) AS ci FROM base GROUP BY 1
),
freq AS (SELECT i, ci FROM isup WHERE ci >= 2),
kept AS (
  SELECT b.b, b.i FROM base b JOIN freq f ON b.i = f.i
),
okb AS (
  SELECT b FROM (SELECT b, count(*) AS sz FROM kept GROUP BY 1)
  WHERE sz <= 1000
),
kb AS (SELECT k.b, k.i FROM kept k JOIN okb o ON k.b = o.b),
pairs AS (
  SELECT a.i AS ia, c.i AS ib, CAST(count(*) AS BIGINT) AS cp
  FROM kb a JOIN kb c ON a.b = c.b AND a.i < c.i
  GROUP BY 1, 2 HAVING count(*) >= 2
),
directed AS (
  SELECT ia AS ant, ib AS con, cp FROM pairs
  UNION ALL SELECT ib, ia, cp FROM pairs
)
SELECT d.ant AS antecedent, d.con AS consequent, d.cp AS pair_count,
  round(CAST(d.cp AS DOUBLE) / CAST(nb.n AS DOUBLE), 6) AS support,
  round(CAST(d.cp AS DOUBLE) * CAST(nb.n AS DOUBLE)
        / (CAST(fa.ci AS DOUBLE) * CAST(fc.ci AS DOUBLE)), 6) AS lift,
  round(CAST(d.cp AS DOUBLE) / CAST(fa.ci AS DOUBLE), 6) AS confidence
FROM directed d
JOIN freq fa ON d.ant = fa.i
JOIN freq fc ON d.con = fc.i
CROSS JOIN nb
"""


@_q("association_rules", _ASSOC_ORACLE)
def q_association_rules(spark, sf):
    """Pairwise association rules on order baskets
    (mining.association_rules): Apriori-pruned — infrequent items
    dropped BEFORE the basket-keyed quadratic self-join, mega-baskets
    excluded by the enforced max_basket_items bound; support /
    confidence / lift are single divisions of exact integer counts."""
    from padua_spark.extensions.mining import association_rules

    li = _t(spark, sf, "lineitem")
    return association_rules(
        li, "l_orderkey", "l_partkey", min_support_count=2
    )


# --- ext round 8: two-group effect sizes ------------------------------------


_EFFECT_SIZES_ORACLE = """
WITH mom AS (
  SELECT
    avg(value) FILTER (event_type = 'click') AS ma,
    avg(value) FILTER (event_type = 'purchase') AS mb,
    CAST(count(value) FILTER (event_type = 'click') AS BIGINT) AS na,
    CAST(count(value) FILTER (event_type = 'purchase') AS BIGINT) AS nb,
    var_samp(value) FILTER (event_type = 'click') AS va,
    var_samp(value) FILTER (event_type = 'purchase') AS vb
  FROM events WHERE value IS NOT NULL
),
per AS (
  SELECT value AS v,
    count(*) FILTER (event_type = 'click') AS ca,
    count(*) FILTER (event_type = 'purchase') AS cb
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
  GROUP BY value
),
stepped AS (
  SELECT ca, cb, ca + cb AS cnt,
    sum(ca + cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      - (ca + cb) AS before
  FROM per
),
uagg AS (
  SELECT CAST(sum(ca * (2 * before + cnt + 1)) AS BIGINT) AS r2a,
         CAST(sum(cb * (2 * before + cnt + 1)) AS BIGINT) AS r2b,
         CAST(sum(ca) AS BIGINT) AS un_a, CAST(sum(cb) AS BIGINT) AS un_b
  FROM stepped
),
u AS (
  SELECT r2a - un_a * (un_a + 1) AS u2_a,
         r2b - un_b * (un_b + 1) AS u2_b
  FROM uagg
),
eff AS (
  SELECT m.*, u.u2_a, u.u2_b,
    sqrt(((m.na - 1) * m.va + (m.nb - 1) * m.vb)
         / CAST(m.na + m.nb - 2 AS DOUBLE)) AS sp,
    1.0 - 3.0 / (4.0 * CAST(m.na + m.nb AS DOUBLE) - 9.0) AS j
  FROM mom m CROSS JOIN u
)
SELECT na AS n_a, nb AS n_b,
  round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
  round((ma - mb) / sp, 6) AS cohens_d,
  round((ma - mb) / sp * j, 6) AS hedges_g,
  round((ma - mb) / sqrt(vb), 6) AS glass_delta,
  round(CAST(u2_a - u2_b AS DOUBLE) / (2.0 * CAST(na * nb AS DOUBLE)), 6)
    AS cliffs_delta
FROM eff
"""


@_q("effect_sizes", _EFFECT_SIZES_ORACLE)
def q_effect_sizes(spark, sf):
    """Two-group effect sizes (stats.effect_sizes) for click vs
    purchase event values: Cohen's d / Hedges' g / Glass's Δ from
    one moment aggregation, Cliff's δ via the exact integer
    doubled-U rank identity (distributed ECDF cumsum, no pair
    join)."""
    from padua_spark.operators.stats import effect_sizes

    e = _t(spark, sf, "events")
    return effect_sizes(e, "event_type", "value", "click", "purchase")


# --- ext round 8: Kendall tau-b on the contingency grid ---------------------


_KENDALL_ORACLE = """
WITH grid AS MATERIALIZED (
  SELECT l_quantity AS x, l_discount AS y, CAST(count(*) AS BIGINT) AS c
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1, 2
),
cd AS (
  SELECT
    sum(CASE WHEN a.y > b.y THEN CAST(a.c AS HUGEINT) * b.c END) AS nc,
    sum(CASE WHEN a.y < b.y THEN CAST(a.c AS HUGEINT) * b.c END) AS nd
  FROM grid a JOIN grid b ON a.x > b.x
),
tx AS (
  SELECT sum(CAST(r AS HUGEINT) * (r - 1) / 2) AS n1,
    CAST(sum(r) AS HUGEINT) AS n
  FROM (SELECT CAST(sum(c) AS BIGINT) AS r FROM grid GROUP BY x)
),
ty AS (
  SELECT sum(CAST(r AS HUGEINT) * (r - 1) / 2) AS n2
  FROM (SELECT CAST(sum(c) AS BIGINT) AS r FROM grid GROUP BY y)
)
SELECT CAST(n AS BIGINT) AS n,
  CAST(coalesce(nc, 0) AS DOUBLE) AS nc,
  CAST(coalesce(nd, 0) AS DOUBLE) AS nd,
  round(CAST(nc - nd AS DOUBLE)
        / sqrt(CAST(n * (n - 1) / 2 - n1 AS DOUBLE)
               * CAST(n * (n - 1) / 2 - n2 AS DOUBLE)), 6) AS tau_b
FROM cd, tx, ty
"""


@_q("kendall_tau_b", _KENDALL_ORACLE)
def q_kendall_tau_b(spark, sf):
    """Kendall's tau-b of quantity vs discount (stats.kendall_tau_b):
    any data size collapses to the bounded contingency grid (550
    cells here — the enforced max_cells contract), concordant/
    discordant counts come from the strict-inequality cell join in
    exact integer arithmetic."""
    from padua_spark.operators.stats import kendall_tau_b

    li = _t(spark, sf, "lineitem")
    return kendall_tau_b(li, "l_quantity", "l_discount")


# --- ext round 8: Holt linear-trend forecast --------------------------------


_HOLT_ORACLE = """
WITH RECURSIVE s AS MATERIALIZED (
  SELECT user_id,
    row_number() OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS t,
    CAST(value AS DOUBLE) AS x
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
cnt AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1
),
init AS (
  SELECT s2.user_id, 2 AS t, s2.x AS l, s2.x - s1.x AS b
  FROM s s1 JOIN s s2 ON s1.user_id = s2.user_id
   AND s1.t = 1 AND s2.t = 2
),
rec AS (
  SELECT * FROM init
  UNION ALL
  SELECT r.user_id, r.t + 1,
    CAST(0.5 AS DOUBLE) * s.x + CAST(0.5 AS DOUBLE) * (r.l + r.b) AS l,
    CAST(0.25 AS DOUBLE)
      * (CAST(0.5 AS DOUBLE) * s.x
         + CAST(0.5 AS DOUBLE) * (r.l + r.b) - r.l)
      + CAST(0.75 AS DOUBLE) * r.b AS b
  FROM rec r JOIN s ON s.user_id = r.user_id AND s.t = r.t + 1
),
fin AS (
  SELECT r.user_id, r.l, r.b
  FROM rec r JOIN cnt ON cnt.user_id = r.user_id AND r.t = cnt.n
),
single AS (
  SELECT s.user_id, s.x AS l, CAST(0 AS DOUBLE) AS b
  FROM s JOIN cnt ON cnt.user_id = s.user_id AND cnt.n = 1
  WHERE s.t = 1
),
allf AS (
  SELECT * FROM fin UNION ALL SELECT * FROM single
)
SELECT c.user_id, c.n, round(a.l, 6) AS level, round(a.b, 6) AS trend,
  round(a.l + CAST(2.0 AS DOUBLE) * a.b, 6) AS forecast
FROM cnt c JOIN allf a ON c.user_id = a.user_id
"""


@_q("holt_forecast", _HOLT_ORACLE)
def q_holt_forecast(spark, sf):
    """Holt linear-trend smoothing of each user's event-value series
    (temporal.holt_forecast, α=0.5 β=0.25 — exact binary fractions,
    so the sequential float recursion is bit-identical across
    engines): one shuffle by key, one JVM-side array fold; the
    oracle steps the SAME recursion as a recursive CTE."""
    from padua_spark.operators.temporal import holt_forecast
    from padua_spark.streaming.windows import epoch_us_col

    e = _t(spark, sf, "events")
    base = e.where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id",
        epoch_us_col(e, "ts").alias("_tu"),
        "event_id",
        F.col("value").cast("double").alias("v"),
    )
    return holt_forecast(
        base, ["user_id"], ["_tu", "event_id"], "v",
        alpha=0.5, beta=0.25, horizon=2,
    )


# --- ext round 8: Mood's median test ----------------------------------------


_MOOD_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS v
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
),
per AS (
  SELECT v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM per),
med AS (
  SELECT min(v) AS med FROM (
    SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
    FROM per
  ), tot WHERE cum >= ceil(n / 2.0)
),
counts AS (
  SELECT g, CAST(count(*) AS BIGINT) AS ng,
    CAST(sum(CASE WHEN v > med THEN 1 ELSE 0 END) AS BIGINT) AS ag
  FROM base, med GROUP BY 1
),
totals AS (
  SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(ag) AS BIGINT) AS a,
    CAST(count(*) AS BIGINT) AS k
  FROM counts
),
stat AS (
  SELECT max(t.n) AS n, max(t.k) AS k,
    sum(
      (ag - CAST(ng AS DOUBLE) * t.a / t.n)
        * (ag - CAST(ng AS DOUBLE) * t.a / t.n)
        / (CAST(ng AS DOUBLE) * t.a / t.n)
      + (ng - ag - CAST(ng AS DOUBLE) * (t.n - t.a) / t.n)
        * (ng - ag - CAST(ng AS DOUBLE) * (t.n - t.a) / t.n)
        / (CAST(ng AS DOUBLE) * (t.n - t.a) / t.n)
    ) AS chi2
  FROM counts, totals t
)
SELECT s.n, s.k, m.med AS grand_median, round(s.chi2, 6) AS chi2,
  CAST(s.k - 1 AS BIGINT) AS dfree,
  round(exp(-s.chi2 / 2.0), 6) AS p_value
FROM stat s, med m
"""


@_q("mood_median_test", _MOOD_ORACLE)
def q_mood_median_test(spark, sf):
    """Mood's median test of quantity across the three return flags
    (stats.mood_median_test): exact lower grand median over the
    bounded distinct-value frame (enforced max_domain), 2×3 chi² on
    integer counts. df=2, so the oracle's chi² tail is the closed
    form exp(−x/2) against the engine's incomplete-gamma UDF."""
    from padua_spark.operators.stats import mood_median_test

    li = _t(spark, sf, "lineitem")
    base = li.select(
        "l_returnflag", F.col("l_quantity").cast("double").alias("qty")
    )
    return mood_median_test(base, "l_returnflag", "qty")


# --- ext round 8: two-sample Cramér-von Mises -------------------------------


_CVM_ORACLE = """
WITH per AS (
  SELECT value AS v,
    CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS ca,
    CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS cb
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
  GROUP BY value
),
stepped AS (
  SELECT ca, cb,
    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fa,
    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fb
  FROM per
),
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM per
),
agg AS (
  SELECT sum(
      CAST(ca + cb AS HUGEINT)
      * (CAST(fa AS HUGEINT) * t.nb - CAST(fb AS HUGEINT) * t.na)
      * (CAST(fa AS HUGEINT) * t.nb - CAST(fb AS HUGEINT) * t.na)
    ) AS num, max(t.na) AS na, max(t.nb) AS nb
  FROM stepped, tot t
)
SELECT na AS n_a, nb AS n_b,
  round(CAST(num AS DOUBLE)
        / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
           * CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)), 6)
    AS t_stat
FROM agg
"""


@_q("cvm_2samp", _CVM_ORACLE)
def q_cvm_2samp(spark, sf):
    """Two-sample Cramér-von Mises statistic for click vs purchase
    event values (stats.cvm_2samp_stat): the whole-distribution ECDF
    discrepancy in exact integer arithmetic over the same distributed
    two-pass cumsum as KS — one division at the end."""
    from padua_spark.operators.stats import cvm_2samp_stat

    e = _t(spark, sf, "events")
    return cvm_2samp_stat(e, "event_type", "value", "click", "purchase")


# --- ext round 8: Jonckheere-Terpstra ordered trend test --------------------

_JT_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS v
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
),
per AS (
  SELECT v,
    CAST(count(*) FILTER (g = 'A') AS BIGINT) AS c0,
    CAST(count(*) FILTER (g = 'N') AS BIGINT) AS c1,
    CAST(count(*) FILTER (g = 'R') AS BIGINT) AS c2
  FROM base GROUP BY 1
),
cum AS (
  SELECT *, sum(c0) OVER w AS f0, sum(c1) OVER w AS f1,
    sum(c2) OVER w AS f2
  FROM per
  WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
),
agg AS (
  SELECT
    sum(CAST(c1 AS HUGEINT) * (2 * (f0 - c0) + c0)
      + CAST(c2 AS HUGEINT) * (2 * (f0 - c0) + c0)
      + CAST(c2 AS HUGEINT) * (2 * (f1 - c1) + c1)) AS jt2,
    CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
    CAST(sum(c2) AS BIGINT) AS n2
  FROM cum
),
fin AS (
  SELECT jt2, n0 + n1 + n2 AS n,
    (CAST(jt2 AS DOUBLE)
      - ((CAST(n0 + n1 + n2 AS DOUBLE) * (n0 + n1 + n2))
         - (CAST(n0 AS DOUBLE) * n0 + CAST(n1 AS DOUBLE) * n1
            + CAST(n2 AS DOUBLE) * n2)) / 2.0)
    / (2.0 * sqrt(
        (CAST(n0 + n1 + n2 AS DOUBLE) * (n0 + n1 + n2)
          * (2.0 * (n0 + n1 + n2) + 3.0)
         - (CAST(n0 AS DOUBLE) * n0 * (2.0 * n0 + 3.0)
            + CAST(n1 AS DOUBLE) * n1 * (2.0 * n1 + 3.0)
            + CAST(n2 AS DOUBLE) * n2 * (2.0 * n2 + 3.0))) / 72.0))
      AS z
  FROM agg
),
zed AS (
  SELECT *, abs(z) / sqrt(2.0) AS xx,
    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt
  FROM fin
)
SELECT CAST(n AS BIGINT) AS n, round(CAST(jt2 AS DOUBLE) / 2.0, 6) AS jt,
  round(z, 6) AS z,
  round(CASE WHEN z >= 0 THEN
    (0.254829592 * tt + -0.284496736 * tt * tt
     + 1.421413741 * tt * tt * tt
     + -1.453152027 * tt * tt * tt * tt
     + 1.061405429 * tt * tt * tt * tt * tt) * exp(-xx * xx) / 2.0
  ELSE 1.0 -
    (0.254829592 * tt + -0.284496736 * tt * tt
     + 1.421413741 * tt * tt * tt
     + -1.453152027 * tt * tt * tt * tt
     + 1.061405429 * tt * tt * tt * tt * tt) * exp(-xx * xx) / 2.0
  END, 6) AS p_value
FROM zed
"""


@_q("jonckheere_terpstra", _JT_ORACLE)
def q_jonckheere_terpstra(spark, sf):
    """Jonckheere-Terpstra ordered-alternative test of quantity
    across return flags A < N < R (stats.jonckheere_terpstra): all
    k(k-1)/2 pairwise doubled-U statistics from ONE cumsum pass over
    the bounded distinct-value frame, exact integers throughout."""
    from padua_spark.operators.stats import jonckheere_terpstra

    li = _t(spark, sf, "lineitem")
    base = li.select(
        "l_returnflag", F.col("l_quantity").cast("double").alias("qty")
    )
    return jonckheere_terpstra(
        base, "l_returnflag", "qty", ["A", "N", "R"]
    )


_MOMENTS_NORMALITY_ORACLE = """
WITH agg AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
    sum(v) AS s1, sum(v * v) AS s2, sum(v * v * v) AS s3,
    sum(v * v * v * v) AS s4
  FROM (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS v
        FROM lineitem WHERE l_quantity IS NOT NULL)
  GROUP BY 1
),
mom AS (
  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS d,
    CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0 THEN
      (s3 / n - 3.0 * (s1 / n) * s2 / n
       + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
      / power(s2 / n - (s1 / n) * (s1 / n), 1.5) END AS g1,
    CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0 THEN
      (s4 / n - 4.0 * (s1 / n) * s3 / n
       + 6.0 * (s1 / n) * (s1 / n) * s2 / n
       - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
      / ((s2 / n - (s1 / n) * (s1 / n))
         * (s2 / n - (s1 / n) * (s1 / n))) END AS b2
  FROM agg
),
sk AS (
  SELECT *,
    g1 * sqrt((d + 1.0) * (d + 3.0) / (6.0 * (d - 2.0)))
      / sqrt(2.0 / (sqrt(2.0 * (3.0 * (d * d + 27.0 * d - 70.0)
        * (d + 1.0) * (d + 3.0)
        / ((d - 2.0) * (d + 5.0) * (d + 7.0) * (d + 9.0)) - 1.0))
        - 1.0 - 1.0)) AS ya,
    1.0 / sqrt(0.5 * ln(sqrt(2.0 * (3.0 * (d * d + 27.0 * d - 70.0)
      * (d + 1.0) * (d + 3.0)
      / ((d - 2.0) * (d + 5.0) * (d + 7.0) * (d + 9.0)) - 1.0))
      - 1.0)) AS delta,
    6.0 + 8.0 / (6.0 * (d * d - 5.0 * d + 2.0)
      / ((d + 7.0) * (d + 9.0))
      * sqrt(6.0 * (d + 3.0) * (d + 5.0)
             / (d * (d - 2.0) * (d - 3.0))))
      * (2.0 / (6.0 * (d * d - 5.0 * d + 2.0) / ((d + 7.0) * (d + 9.0))
          * sqrt(6.0 * (d + 3.0) * (d + 5.0)
                 / (d * (d - 2.0) * (d - 3.0))))
         + sqrt(1.0 + 4.0 / ((6.0 * (d * d - 5.0 * d + 2.0)
             / ((d + 7.0) * (d + 9.0))
             * sqrt(6.0 * (d + 3.0) * (d + 5.0)
                    / (d * (d - 2.0) * (d - 3.0))))
            * (6.0 * (d * d - 5.0 * d + 2.0) / ((d + 7.0) * (d + 9.0))
               * sqrt(6.0 * (d + 3.0) * (d + 5.0)
                      / (d * (d - 2.0) * (d - 3.0))))))) AS a_ag,
    (b2 - 3.0 * (d - 1.0) / (d + 1.0))
      / sqrt(24.0 * d * (d - 2.0) * (d - 3.0)
             / ((d + 1.0) * (d + 1.0) * (d + 3.0) * (d + 5.0))) AS x
  FROM mom
),
zz AS (
  SELECT l_returnflag, n, d, g1, b2,
    CASE WHEN n >= 8 AND g1 IS NOT NULL THEN
      delta * ln(ya + sqrt(ya * ya + 1.0)) END AS zs,
    CASE WHEN n >= 5 AND b2 IS NOT NULL THEN
      (1.0 - 2.0 / (9.0 * a_ag)
       - sign(1.0 + x * sqrt(2.0 / (a_ag - 4.0)))
         * cbrt(abs((1.0 - 2.0 / a_ag)
                    / (1.0 + x * sqrt(2.0 / (a_ag - 4.0))))))
      / sqrt(2.0 / (9.0 * a_ag)) END AS zk
  FROM sk
)
SELECT l_returnflag, n,
  round(g1, 6) AS skew_g1, round(b2 - 3.0, 6) AS kurt_g2,
  round(zs, 6) AS z_skew, round(zk, 6) AS z_kurt,
  round(zs * zs + zk * zk, 6) AS k2_stat,
  round(exp(-(zs * zs + zk * zk) / 2.0), 6) AS p_k2,
  round(d / 6.0 * (g1 * g1 + (b2 - 3.0) * (b2 - 3.0) / 4.0), 6)
    AS jb_stat,
  round(exp(-(d / 6.0 * (g1 * g1 + (b2 - 3.0) * (b2 - 3.0) / 4.0))
            / 2.0), 6) AS p_jb
FROM zz
"""


@_q("moments_normality", _MOMENTS_NORMALITY_ORACLE)
def q_moments_normality(spark, sf):
    """Moment-based normality battery per return flag — D'Agostino K²
    (skew + kurtosis z) and Jarque–Bera with EXACT closed-form chi²(2)
    p-values (stats.moments_normality): one power-sum aggregation
    pass, all special-function-free, shared verbatim with the
    oracle."""
    from padua_spark.operators.stats import moments_normality

    li = _t(spark, sf, "lineitem")
    return moments_normality(li, ["l_returnflag"], "l_quantity")


_ANSARI_ORACLE = """
WITH per AS (
  SELECT v, CAST(count(*) FILTER (g = 'A') AS BIGINT) AS ca,
    CAST(count(*) FILTER (g = 'R') AS BIGINT) AS cb
  FROM (SELECT CAST(l_quantity AS DOUBLE) AS v, l_returnflag AS g
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_returnflag IN ('A', 'R'))
  GROUP BY 1
),
cum AS (
  SELECT ca, cb, ca + cb AS h,
    sum(ca + cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f,
    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
  FROM per
),
sc AS (
  SELECT ca, cb, h,
    least(2 * f - h + 1, 2 * (na + nb) + 2 - (2 * f - h + 1)) AS s2
  FROM cum
),
agg AS (
  SELECT sum(CAST(ca AS HUGEINT) * CAST(s2 AS HUGEINT)) AS ab2,
    CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
    sum(CAST(h AS HUGEINT) * CAST(s2 AS HUGEINT)) AS hs,
    sum(CAST(h AS HUGEINT) * CAST(s2 AS HUGEINT)
        * CAST(s2 AS HUGEINT)) AS hss
  FROM sc
),
fin AS (
  SELECT round(CAST(ab2 AS DOUBLE) / 2.0, 6) AS ab_stat, n_a, n_b,
    CASE WHEN CAST(n_a AS DOUBLE) * n_b
          * (CAST(hss AS DOUBLE) - CAST(hs AS DOUBLE)
             * CAST(hs AS DOUBLE) / (CAST(n_a AS DOUBLE) + n_b))
          / ((CAST(n_a AS DOUBLE) + n_b)
             * (CAST(n_a AS DOUBLE) + n_b - 1.0)) > 0
    THEN (CAST(ab2 AS DOUBLE)
          - CAST(n_a AS DOUBLE) * CAST(hs AS DOUBLE)
            / (CAST(n_a AS DOUBLE) + n_b))
      / sqrt(CAST(n_a AS DOUBLE) * n_b
             * (CAST(hss AS DOUBLE) - CAST(hs AS DOUBLE)
                * CAST(hs AS DOUBLE) / (CAST(n_a AS DOUBLE) + n_b))
             / ((CAST(n_a AS DOUBLE) + n_b)
                * (CAST(n_a AS DOUBLE) + n_b - 1.0))) END AS z
  FROM agg
),
e AS (
  SELECT *, abs(z) / sqrt(2.0) AS x,
    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
  FROM fin
)
SELECT ab_stat, n_a, n_b, round(z, 6) AS z,
  round((0.254829592 * t + -0.284496736 * t * t
         + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
         + 1.061405429 * t * t * t * t * t) * exp(-x * x), 6)
    AS p_normal
FROM e
"""


@_q("ansari_bradley", _ANSARI_ORACLE)
def q_ansari_bradley(spark, sf):
    """Ansari–Bradley two-sample scale test A vs R on quantity
    (stats.ansari_bradley): doubled min-from-both-ends midrank scores
    on the shared distributed ECDF cumsum, exact conditional
    (tie-respecting) null moments, A&S-erfc two-sided p — integer
    arithmetic until the final division on both engines."""
    from padua_spark.operators.stats import ansari_bradley

    li = _t(spark, sf, "lineitem")
    return ansari_bradley(li, "l_returnflag", "l_quantity", "A", "R")



# --- ext round 9: classical association / agreement battery -----------------


def _fisher_oracle() -> str:
    lp_i = (
        _log_choose_sql("r1", "i")
        + " + " + _log_choose_sql("r2", "c1 - i")
        + " - ld"
    )
    lp_a = (
        _log_choose_sql("r1", "a")
        + " + " + _log_choose_sql("r2", "c1 - a")
        + " - ld"
    )
    return f"""
WITH t AS (
  SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS e,
         CASE WHEN c_acctbal > 9000.0 THEN 1 ELSE 0 END AS o
  FROM customer
),
cnt AS (
  SELECT
    CAST(sum(CASE WHEN e = 1 AND o = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(sum(CASE WHEN e = 1 AND o = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(sum(CASE WHEN e = 0 AND o = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(sum(CASE WHEN e = 0 AND o = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM t
),
m AS (
  SELECT *, a + b AS r1, c + d AS r2, a + c AS c1, a + b + c + d AS n,
    greatest(CAST(0 AS BIGINT), (a + c) - (c + d)) AS lo,
    least(a + b, a + c) AS hi
  FROM cnt
),
md AS (
  SELECT *, {_log_choose_sql("n", "c1")} AS ld FROM m
),
rows_i AS (
  SELECT md.*, unnest(generate_series(lo, hi)) AS i FROM md
),
terms AS (
  SELECT a, b, c, d, i, ({lp_i}) AS lp, ({lp_a}) AS lpa FROM rows_i
),
p AS (
  SELECT a, b, c, d,
    sum(CASE WHEN i <= a THEN exp(lp) ELSE 0.0 END ORDER BY i) AS pl,
    sum(CASE WHEN i >= a THEN exp(lp) ELSE 0.0 END ORDER BY i) AS pr,
    sum(CASE WHEN lp <= lpa + 9.999999505838704e-08
        THEN exp(lp) ELSE 0.0 END ORDER BY i) AS pt
  FROM terms GROUP BY 1, 2, 3, 4
)
SELECT a, b, c, d,
  round(CASE WHEN b * c > 0
        THEN (CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c) END, 6)
    AS odds_ratio_sample,
  round(least(pl, 1.0), 6) AS p_left,
  round(least(pr, 1.0), 6) AS p_right,
  round(least(pt, 1.0), 6) AS p_two
FROM p
"""


@_q("fisher_exact", _fisher_oracle())
def q_fisher_exact(spark, sf):
    """Fisher exact 2x2 on customers: market segment BUILDING vs
    account balance > 9000 (stats.fisher_exact): one aggregation to
    four exact cells, hypergeometric support folded JVM-side with the
    shared Lanczos log-gamma, scipy's point-probability two-sided
    rule with the same relative-tolerance guard on both engines."""
    from padua_spark.operators.stats import fisher_exact

    c = _t(spark, sf, "customer")
    u = c.select(
        F.when(F.col("c_mktsegment") == "BUILDING", 1)
        .otherwise(0).alias("expo"),
        F.when(F.col("c_acctbal") > 9000.0, 1).otherwise(0).alias("outc"),
    )
    return fisher_exact(u, "expo", "outc")


_CRAMERS_V_ORACLE = """
WITH cells AS (
  SELECT o_orderstatus AS a, o_orderpriority AS b, count(*) AS n
  FROM orders
  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
  GROUP BY 1, 2
),
ra AS (SELECT a, sum(n) AS ra FROM cells GROUP BY 1),
cb AS (SELECT b, sum(n) AS cb FROM cells GROUP BY 1),
dims AS (
  SELECT count(DISTINCT a) AS r, count(DISTINCT b) AS c, sum(n) AS nt
  FROM cells
),
j AS (
  SELECT cells.n, ra.ra, cb.cb, dims.nt, dims.r, dims.c
  FROM cells JOIN ra USING (a) JOIN cb USING (b), dims
),
chi AS (
  SELECT
    sum(power(CAST(n AS DOUBLE)
              - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
                / CAST(nt AS DOUBLE), 2)
        / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
           / CAST(nt AS DOUBLE))) AS chi2,
    CAST(max(nt) AS BIGINT) AS n_total,
    CAST(max(r) AS BIGINT) AS r_levels,
    CAST(max(c) AS BIGINT) AS c_levels
  FROM j
),
fin AS (
  SELECT *,
    chi2 / n_total AS phi2,
    greatest(0.0, chi2 / n_total
      - (CAST(r_levels AS DOUBLE) - 1.0) * (CAST(c_levels AS DOUBLE) - 1.0)
        / (CAST(n_total AS DOUBLE) - 1.0)) AS phi2p,
    CAST(r_levels AS DOUBLE)
      - power(CAST(r_levels AS DOUBLE) - 1.0, 2)
        / (CAST(n_total AS DOUBLE) - 1.0) AS rp,
    CAST(c_levels AS DOUBLE)
      - power(CAST(c_levels AS DOUBLE) - 1.0, 2)
        / (CAST(n_total AS DOUBLE) - 1.0) AS cp
  FROM chi
)
SELECT round(chi2, 6) AS chi2, n_total, r_levels, c_levels,
  round(CASE WHEN least(rp - 1.0, cp - 1.0) > 0
        THEN sqrt(phi2p / least(rp - 1.0, cp - 1.0)) END, 6)
    AS cramers_v
FROM fin
"""


@_q("cramers_v", _CRAMERS_V_ORACLE)
def q_cramers_v(spark, sf):
    """Bias-corrected Cramer's V between order status and priority
    (stats.cramers_v): one hash aggregation to the bounded
    contingency cells, margin windows over that cell frame, exact
    integer counts into the Bergsma-corrected effect size."""
    from padua_spark.operators.stats import cramers_v

    o = _t(spark, sf, "orders")
    return cramers_v(o, "o_orderstatus", "o_orderpriority")


_CCC_ORACLE = """
WITH p AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS x,
         CAST(l_quantity AS DOUBLE) * 1000.0 AS y
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
),
agg AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM p
),
mo AS (
  SELECT n,
    sx / n AS mx, sy / n AS my,
    sxx / n - (sx / n) * (sx / n) AS vx,
    syy / n - (sy / n) * (sy / n) AS vy,
    sxy / n - (sx / n) * (sy / n) AS cxy
  FROM agg
)
SELECT n,
  round(CASE WHEN vx > 0 AND vy > 0 THEN 2.0 * cxy
        / (vx + vy + (mx - my) * (mx - my)) END, 6) AS ccc,
  round(CASE WHEN vx > 0 AND vy > 0 THEN cxy / sqrt(vx * vy) END, 6)
    AS pearson_r,
  round(CASE WHEN vx > 0 AND vy > 0 THEN 2.0
        / (sqrt(vx / vy) + 1.0 / sqrt(vx / vy)
           + (mx - my) * (mx - my) / sqrt(vx * vy)) END, 6) AS c_b
FROM mo
"""


@_q("concordance_ccc", _CCC_ORACLE)
def q_concordance_ccc(spark, sf):
    """Lin's concordance correlation of extended price vs
    quantity*1000 (stats.concordance_ccc): one six-sum aggregation,
    closed-form Lin decomposition CCC = r * C_b on the 1-row frame."""
    from padua_spark.operators.stats import concordance_ccc

    li = _t(spark, sf, "lineitem").select(
        F.col("l_extendedprice").alias("x"),
        (F.col("l_quantity") * 1000.0).alias("y"),
    )
    return concordance_ccc(li, "x", "y")


_FLEISS_ORACLE = """
WITH k4 AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING count(*) = 4
),
r AS (
  SELECT l.l_orderkey AS item, l.l_returnflag AS cat
  FROM lineitem l JOIN k4 USING (l_orderkey)
  WHERE l.l_returnflag IS NOT NULL
),
cells AS (SELECT item, cat, count(*) AS nij FROM r GROUP BY 1, 2),
per_item AS (
  SELECT item, sum(nij) AS n, sum(nij * nij) AS sq FROM cells GROUP BY 1
),
si AS (
  SELECT CAST(count(*) AS BIGINT) AS n_items,
    CAST(min(n) AS BIGINT) AS n_raters, sum(sq) AS ssq
  FROM per_item
),
pc AS (SELECT cat, sum(nij) AS cj FROM cells GROUP BY 1),
ca AS (
  SELECT count(*) AS k_categories,
    sum(CAST(cj AS DOUBLE) * CAST(cj AS DOUBLE)) AS csq
  FROM pc
),
fin AS (
  SELECT si.n_items, si.n_raters, ca.k_categories,
    (CAST(ssq AS DOUBLE) - CAST(n_items AS DOUBLE) * n_raters)
      / (CAST(n_items AS DOUBLE) * n_raters * (n_raters - 1.0)) AS p_bar,
    csq / (CAST(n_items AS DOUBLE) * n_raters
           * CAST(n_items AS DOUBLE) * n_raters) AS p_e
  FROM si, ca
)
SELECT n_items, n_raters, k_categories,
  round(p_bar, 6) AS p_bar, round(p_e, 6) AS p_e,
  round(CASE WHEN p_e < 1.0 THEN (p_bar - p_e) / (1.0 - p_e) END, 6)
    AS kappa
FROM fin
"""


@_q("fleiss_kappa", _FLEISS_ORACLE)
def q_fleiss_kappa(spark, sf):
    """Fleiss' kappa over orders with exactly 4 lineitems as items and
    the 4 lineitems' return flags as ratings (stats.fleiss_kappa):
    the constant-rater contract holds by construction; two bounded
    hash aggregations into the exact-integer kappa."""
    from padua_spark.operators.stats import fleiss_kappa

    li = _t(spark, sf, "lineitem")
    k4 = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") == 4)
        .select("l_orderkey")
    )
    r = li.join(k4, on="l_orderkey").select(
        F.col("l_orderkey").alias("item"),
        F.col("l_returnflag").alias("cat"),
    )
    return fleiss_kappa(r, "item", "cat")



_LJUNG_BOX_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id,
    CAST(value AS DOUBLE) AS x
  FROM events WHERE value IS NOT NULL
),
m AS (
  SELECT user_id, x,
    avg(x) OVER (PARTITION BY user_id) AS mu,
    lead(x, 1) OVER w AS l1,
    lead(x, 2) OVER w AS l2,
    lead(x, 3) OVER w AS l3,
    lead(x, 4) OVER w AS l4
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
),
agg AS (
  SELECT user_id,
    CAST(count(*) AS BIGINT) AS n_obs,
    sum((x - mu) * (x - mu)) AS sxx,
    sum((x - mu) * (l1 - mu)) AS s1,
    sum((x - mu) * (l2 - mu)) AS s2,
    sum((x - mu) * (l3 - mu)) AS s3,
    sum((x - mu) * (l4 - mu)) AS s4
  FROM m GROUP BY 1
),
q AS (
  SELECT user_id, n_obs, CAST(4 AS INTEGER) AS max_lag,
    round(CASE WHEN n_obs > 4 AND sxx > 0 THEN
      n_obs * (n_obs + 2.0) * (
        (s1 / sxx) * (s1 / sxx) / (n_obs - 1.0)
        + (s2 / sxx) * (s2 / sxx) / (n_obs - 2.0)
        + (s3 / sxx) * (s3 / sxx) / (n_obs - 3.0)
        + (s4 / sxx) * (s4 / sxx) / (n_obs - 4.0)
      ) END, 6) AS q_stat
  FROM agg
)
SELECT user_id, n_obs, max_lag, q_stat,
  round(exp(-q_stat / 2.0) * (1.0 + q_stat / 2.0), 6) AS p_chi2
FROM q
"""


@_q("ljung_box", _LJUNG_BOX_ORACLE)
def q_ljung_box(spark, sf):
    """Per-user Ljung-Box white-noise test at h=4 on event values
    (temporal.ljung_box): one key shuffle, one shared window pass for
    all four lags, closed-form even-df chi2(4) survival on the
    ROUNDED statistic so both engines transform identical inputs."""
    from padua_spark.operators.temporal import ljung_box
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    e = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_id",
        "value",
    )
    out = ljung_box(e, ["user_id"], ["_tu", "event_id"], "value", 4)
    q = F.col("q_stat")
    return out.select(
        "user_id", "n_obs", "max_lag", "q_stat",
        F.round(
            F.exp(-q / 2.0) * (1.0 + q / 2.0), 6
        ).alias("p_chi2"),
    )


_FORECAST_ACC_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id,
    CAST(value AS DOUBLE) AS a
  FROM events WHERE value IS NOT NULL
),
m AS (
  SELECT user_id, a,
    avg(a) OVER (PARTITION BY user_id ORDER BY tu, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS f,
    lag(a, 1) OVER (PARTITION BY user_id ORDER BY tu, event_id)
      AS prev
  FROM e
),
agg AS (
  SELECT user_id,
    CAST(count(*) AS BIGINT) AS n_obs,
    CAST(count(f) AS BIGINT) AS n_scored,
    avg(abs(a - f)) AS mae_r,
    avg((a - f) * (a - f)) AS mse_r,
    avg(CASE WHEN abs(a) + abs(f) > 0
        THEN 2.0 * abs(a - f) / (abs(a) + abs(f)) END) AS smape_r,
    avg(abs(a - prev)) AS scale_r
  FROM m GROUP BY 1
)
SELECT user_id, n_obs, n_scored,
  round(mae_r, 6) AS mae,
  round(sqrt(mse_r), 6) AS rmse,
  round(smape_r, 6) AS smape,
  round(CASE WHEN scale_r > 0 THEN mae_r / scale_r END, 6) AS mase
FROM agg
"""


@_q("forecast_accuracy", _FORECAST_ACC_ORACLE)
def q_forecast_accuracy(spark, sf):
    """Per-user forecast accuracy (MAE/RMSE/sMAPE/MASE) of the
    expanding-mean predictor on event values
    (temporal.forecast_accuracy): one key shuffle, one ordered window
    pass staging the forecast and the naive scale lag."""
    from pyspark.sql import Window

    from padua_spark.operators.temporal import forecast_accuracy
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    e = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_id",
        F.col("value").cast("double").alias("a"),
    ).where(F.col("a").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("_tu", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = e.withColumn("f", F.avg("a").over(w))
    return forecast_accuracy(
        scored, ["user_id"], ["_tu", "event_id"], "a", "f", season=1
    )



_NB_LANG_ORACLE = r"""
WITH tr AS (
  SELECT lang AS y,
    unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS token
  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL
),
tok AS (SELECT y, token FROM tr WHERE token <> ''),
vocab AS (
  SELECT token,
    CAST(count(*) FILTER (y = 'de') AS BIGINT) AS c0,
    CAST(count(*) FILTER (y = 'en') AS BIGINT) AS c1,
    CAST(count(*) FILTER (y = 'es') AS BIGINT) AS c2,
    CAST(count(*) FILTER (y = 'fr') AS BIGINT) AS c3,
    CAST(count(*) FILTER (y = 'zh') AS BIGINT) AS c4
  FROM tok GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS v,
    CAST(sum(c0) AS BIGINT) AS t0, CAST(sum(c1) AS BIGINT) AS t1,
    CAST(sum(c2) AS BIGINT) AS t2, CAST(sum(c3) AS BIGINT) AS t3,
    CAST(sum(c4) AS BIGINT) AS t4
  FROM vocab
),
pri AS (
  SELECT CAST(count(*) AS BIGINT) AS nd,
    CAST(count(*) FILTER (lang = 'de') AS BIGINT) AS d0,
    CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS d1,
    CAST(count(*) FILTER (lang = 'es') AS BIGINT) AS d2,
    CAST(count(*) FILTER (lang = 'fr') AS BIGINT) AS d3,
    CAST(count(*) FILTER (lang = 'zh') AS BIGINT) AS d4
  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL
),
sc AS (
  SELECT doc_id,
    unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS token
  FROM documents WHERE text IS NOT NULL
),
sct AS (SELECT doc_id, token FROM sc WHERE token <> ''),
j AS (
  SELECT doc_id,
    ln(CAST(COALESCE(c0, 0) AS DOUBLE) + 1.0)
      - ln(CAST(t0 AS DOUBLE) + 1.0 * v) AS lp0,
    ln(CAST(COALESCE(c1, 0) AS DOUBLE) + 1.0)
      - ln(CAST(t1 AS DOUBLE) + 1.0 * v) AS lp1,
    ln(CAST(COALESCE(c2, 0) AS DOUBLE) + 1.0)
      - ln(CAST(t2 AS DOUBLE) + 1.0 * v) AS lp2,
    ln(CAST(COALESCE(c3, 0) AS DOUBLE) + 1.0)
      - ln(CAST(t3 AS DOUBLE) + 1.0 * v) AS lp3,
    ln(CAST(COALESCE(c4, 0) AS DOUBLE) + 1.0)
      - ln(CAST(t4 AS DOUBLE) + 1.0 * v) AS lp4
  FROM sct LEFT JOIN vocab USING (token), tot
),
g AS (
  SELECT doc_id,
    sum(lp0) + (SELECT ln(CAST(d0 AS DOUBLE)) - ln(CAST(nd AS DOUBLE))
                FROM pri) AS s0,
    sum(lp1) + (SELECT ln(CAST(d1 AS DOUBLE)) - ln(CAST(nd AS DOUBLE))
                FROM pri) AS s1,
    sum(lp2) + (SELECT ln(CAST(d2 AS DOUBLE)) - ln(CAST(nd AS DOUBLE))
                FROM pri) AS s2,
    sum(lp3) + (SELECT ln(CAST(d3 AS DOUBLE)) - ln(CAST(nd AS DOUBLE))
                FROM pri) AS s3,
    sum(lp4) + (SELECT ln(CAST(d4 AS DOUBLE)) - ln(CAST(nd AS DOUBLE))
                FROM pri) AS s4
  FROM j GROUP BY doc_id
)
SELECT doc_id,
  CASE
    WHEN s0 >= s1 AND s0 >= s2 AND s0 >= s3 AND s0 >= s4 THEN 'de'
    WHEN s1 >= s2 AND s1 >= s3 AND s1 >= s4 THEN 'en'
    WHEN s2 >= s3 AND s2 >= s4 THEN 'es'
    WHEN s3 >= s4 THEN 'fr'
    ELSE 'zh'
  END AS predicted,
  round(greatest(s0, s1, s2, s3, s4), 6) AS best_logp
FROM g
"""


@_q("naive_bayes_lang", _NB_LANG_ORACLE)
def q_naive_bayes_lang(spark, sf):
    """Multinomial naive Bayes language classifier trained and scored
    on the documents corpus (text.naive_bayes_token_classify): one
    explode+aggregate builds the model, one vocab join + per-doc
    aggregation scores it — no iterations, no Python."""
    from padua_spark.extensions.text import naive_bayes_token_classify

    d = _t(spark, sf, "documents")
    return naive_bayes_token_classify(
        d, d, "text", "lang", "doc_id", alpha=1.0
    )


_CONFUSION_ORACLE = """
WITH t AS (
  SELECT source,
    CASE WHEN n_chars > 500 THEN 1 ELSE 0 END AS p,
    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
  WHERE n_chars IS NOT NULL AND lang IS NOT NULL
),
agg AS (
  SELECT source,
    CAST(sum(CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS tp,
    CAST(sum(CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS fp,
    CAST(sum(CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS fn,
    CAST(sum(CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS tn
  FROM t GROUP BY 1
)
SELECT source, tp, fp, fn, tn,
  round((CAST(tp AS DOUBLE) + tn) / (tp + fp + fn + tn), 6)
    AS accuracy,
  round(CASE WHEN tp + fp > 0
        THEN CAST(tp AS DOUBLE) / (tp + fp) END, 6) AS precision,
  round(CASE WHEN tp + fn > 0
        THEN CAST(tp AS DOUBLE) / (tp + fn) END, 6) AS recall,
  round(CASE WHEN 2.0 * tp + fp + fn > 0
        THEN 2.0 * CAST(tp AS DOUBLE) / (2.0 * tp + fp + fn) END, 6)
    AS f1,
  round(CASE WHEN sqrt(CAST(tp AS DOUBLE) + fp)
             * sqrt(CAST(tp AS DOUBLE) + fn)
             * sqrt(CAST(tn AS DOUBLE) + fp)
             * sqrt(CAST(tn AS DOUBLE) + fn) > 0
        THEN (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
             / (sqrt(CAST(tp AS DOUBLE) + fp)
                * sqrt(CAST(tp AS DOUBLE) + fn)
                * sqrt(CAST(tn AS DOUBLE) + fp)
                * sqrt(CAST(tn AS DOUBLE) + fn)) END, 6) AS mcc
FROM agg
"""


@_q("confusion_stats", _CONFUSION_ORACLE)
def q_confusion_stats(spark, sf):
    """Per-source confusion battery of the 'long doc => English'
    predictor (quality.confusion_stats): one conditional aggregation
    to exact cells, closed-form precision/recall/F1/MCC."""
    from padua_spark.extensions.quality import confusion_stats

    d = _t(spark, sf, "documents").where(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    t = d.select(
        "source",
        F.when(F.col("n_chars") > 500, 1).otherwise(0).alias("p"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    return confusion_stats(t, ["source"], "p", "y")


_AVG_PRECISION_ORACLE = """
WITH t AS (
  SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS s,
    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
  WHERE n_chars IS NOT NULL AND lang IS NOT NULL
),
r AS (
  SELECT source, y,
    row_number() OVER w AS k,
    sum(y) OVER (PARTITION BY source ORDER BY s DESC, doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cum
  FROM t
  WINDOW w AS (PARTITION BY source ORDER BY s DESC, doc_id ASC)
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS n_pos,
    sum(CASE WHEN y = 1
        THEN CAST(cum AS DOUBLE) / CAST(k AS DOUBLE) END) AS ap_sum
  FROM r GROUP BY 1
)
SELECT source, n, n_pos,
  round(CASE WHEN n_pos > 0 THEN ap_sum / n_pos END, 6)
    AS average_precision
FROM agg
"""


@_q("average_precision", _AVG_PRECISION_ORACLE)
def q_average_precision(spark, sf):
    """Per-source average precision of ranking documents by length
    for 'is English' (quality.group_average_precision): one group
    shuffle, one window pass for rank + cumulative positives,
    deterministic id tiebreak under score ties."""
    from padua_spark.extensions.quality import group_average_precision

    d = _t(spark, sf, "documents").where(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    t = d.select(
        "source", "doc_id",
        F.col("n_chars").cast("double").alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    return group_average_precision(t, ["source"], "s", "y", "doc_id")


_CUPED_ORACLE = """
WITH u AS (
  SELECT user_id, user_id % 2 AS variant,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      AS DOUBLE) AS y,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
pooled AS (
  SELECT count(*) AS np, sum(x) AS sx, sum(y) AS sy,
    sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM u
),
scal AS (
  SELECT
    CASE WHEN sxx / np - (sx / np) * (sx / np) > 0
      THEN (sxy / np - (sx / np) * (sy / np))
           / (sxx / np - (sx / np) * (sx / np)) END AS theta,
    sx / np AS xbar
  FROM pooled
),
per AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n,
    sum(y) AS vy, sum(x) AS vx, sum(y * y) AS vyy,
    sum(x * x) AS vxx, sum(x * y) AS vxy
  FROM u GROUP BY 1
),
j AS (
  SELECT per.*, scal.theta, scal.xbar,
    vy / n AS my, vx / n AS mx,
    CASE WHEN n > 1 THEN (vyy - n * (vy / n) * (vy / n)) / (n - 1.0)
      END AS vary,
    CASE WHEN n > 1 THEN (vxx - n * (vx / n) * (vx / n)) / (n - 1.0)
      END AS varx,
    CASE WHEN n > 1 THEN (vxy - n * (vx / n) * (vy / n)) / (n - 1.0)
      END AS cxy
  FROM per, scal
),
fin AS (
  SELECT variant, n, my, mx, theta, xbar, vary,
    my - theta * (mx - xbar) AS mean_adj,
    vary - 2.0 * theta * cxy + theta * theta * varx AS var_adj
  FROM j
)
SELECT variant, n,
  round(my, 6) AS mean_raw,
  round(mean_adj, 6) AS mean_adjusted,
  round(vary, 6) AS var_raw,
  round(var_adj, 6) AS var_adjusted,
  round(CASE WHEN vary > 0 THEN 1.0 - var_adj / vary END, 6)
    AS var_reduction
FROM fin
ORDER BY variant
"""


@_q("cuped_adjusted", _CUPED_ORACLE)
def q_cuped_adjusted(spark, sf):
    """CUPED variance-reduced per-variant purchase metric with click
    count as the pre-period covariate (stats.cuped_adjusted): pooled
    theta as a 1-row broadcast, per-variant exact sums assembled by
    algebra (no second scan)."""
    from padua_spark.operators.stats import cuped_adjusted

    e = _t(spark, sf, "events")
    u = e.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("variant"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("double").alias("y"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).cast("double").alias("x"),
    )
    return cuped_adjusted(u, "variant", "y", "x")



_HITS_ORACLE = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS s, event_type AS d
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
h0 AS (SELECT DISTINCT s, CAST(1.0 AS DOUBLE) AS h FROM e),
a1r AS MATERIALIZED (
  SELECT d, sum(h) AS a FROM e JOIN h0 USING (s) GROUP BY d
),
a1 AS MATERIALIZED (
  SELECT d, CASE WHEN z > 0 THEN a / z ELSE 0.0 END AS a
  FROM a1r, (SELECT sqrt(sum(a * a)) AS z FROM a1r)
),
h1r AS MATERIALIZED (
  SELECT s, sum(a) AS h FROM e JOIN a1 USING (d) GROUP BY s
),
h1 AS MATERIALIZED (
  SELECT s, CASE WHEN z > 0 THEN h / z ELSE 0.0 END AS h
  FROM h1r, (SELECT sqrt(sum(h * h)) AS z FROM h1r)
),
a2r AS MATERIALIZED (
  SELECT d, sum(h) AS a FROM e JOIN h1 USING (s) GROUP BY d
),
a2 AS MATERIALIZED (
  SELECT d, CASE WHEN z > 0 THEN a / z ELSE 0.0 END AS a
  FROM a2r, (SELECT sqrt(sum(a * a)) AS z FROM a2r)
),
h2r AS MATERIALIZED (
  SELECT s, sum(a) AS h FROM e JOIN a2 USING (d) GROUP BY s
),
h2 AS MATERIALIZED (
  SELECT s, CASE WHEN z > 0 THEN h / z ELSE 0.0 END AS h
  FROM h2r, (SELECT sqrt(sum(h * h)) AS z FROM h2r)
)
SELECT s AS node, 'hub' AS role, round(h, 6) AS score FROM h2
UNION ALL
SELECT d, 'authority', round(a, 6) FROM a2
"""


@_q("hits_scores", _HITS_ORACLE)
def q_hits_scores(spark, sf):
    """HITS hubs/authorities over the bipartite user -> event-type
    graph, 2 fixed power iterations (graph.hits): persisted distinct
    edges, one shuffle per half-step, 1-row broadcast L2 norms,
    localCheckpoint keeping the plan O(1) deep."""
    from padua_spark.extensions.graph import hits

    e = _t(spark, sf, "events")
    return hits(e, "user_id", "event_type", k_iters=2)


_ITEM_COSINE_ORACLE = """
WITH base AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
),
isup AS (
  SELECT i, CAST(count(*) AS BIGINT) AS ci FROM base GROUP BY 1
),
freq AS (SELECT i, ci FROM isup WHERE ci >= 2),
kept AS (
  SELECT b.b, b.i FROM base b JOIN freq f ON b.i = f.i
),
okb AS (
  SELECT b FROM (SELECT b, count(*) AS sz FROM kept GROUP BY 1)
  WHERE sz <= 1000
),
kb AS (SELECT k.b, k.i FROM kept k JOIN okb o ON k.b = o.b),
pairs AS (
  SELECT a.i AS ia, c.i AS ib, CAST(count(*) AS BIGINT) AS cp
  FROM kb a JOIN kb c ON a.b = c.b AND a.i < c.i
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT p.ia AS item_a, p.ib AS item_b, p.cp AS pair_count,
  fa.ci AS count_a, fb.ci AS count_b,
  round(CAST(p.cp AS DOUBLE)
        / (sqrt(CAST(fa.ci AS DOUBLE)) * sqrt(CAST(fb.ci AS DOUBLE))),
        6) AS cosine
FROM pairs p
JOIN freq fa ON p.ia = fa.i
JOIN freq fb ON p.ib = fb.i
"""


@_q("item_cosine", _ITEM_COSINE_ORACLE)
def q_item_cosine(spark, sf):
    """Item-item co-occurrence cosine over order baskets
    (mining.item_similarity): association_rules' Apriori-pruned plan
    scoring the symmetric binary-incidence cosine."""
    from padua_spark.extensions.mining import item_similarity

    li = _t(spark, sf, "lineitem")
    return item_similarity(
        li, "l_orderkey", "l_partkey", min_support_count=2
    )


_READABILITY_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
    list_filter(
      string_split_regex(trim(text), '[ \t\n\x0B\f\r]+'),
      tk -> tk <> ''
    ) AS toks,
    text
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_words,
    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
      AS BIGINT) AS n_sentences,
    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      + len(list_filter(toks,
            tk -> NOT regexp_matches(tk, '[aeiouyAEIOUY]')))
      AS BIGINT) AS n_syllables
  FROM t
)
SELECT doc_id, n_words, n_sentences, n_syllables,
  round(CASE WHEN n_words > 0 THEN
    206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) END, 6)
    AS flesch,
  round(CASE WHEN n_words > 0 THEN
    0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
    + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59 END, 6)
    AS fk_grade
FROM c
"""


@_q("readability", _READABILITY_ORACLE)
def q_readability(spark, sf):
    """Flesch reading ease + FK grade per document
    (text.readability_scores): three regexp counts scan-side, the
    documented vowel-group syllable approximation, zero shuffles."""
    from padua_spark.extensions.text import readability_scores

    d = _t(spark, sf, "documents")
    return readability_scores(d, "doc_id", "text")



_PARTIAL_CORR_ORACLE = """
WITH base AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS x,
         CAST(l_quantity AS DOUBLE) AS y,
         CAST(l_discount AS DOUBLE) AS z
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    AND l_discount IS NOT NULL
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
    sum(x * x) AS sxx, sum(y * y) AS syy, sum(z * z) AS szz,
    sum(x * y) AS sxy, sum(x * z) AS sxz, sum(y * z) AS syz
  FROM base
),
r AS (
  SELECT n,
    CASE WHEN sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) > 0
      THEN (n * sxy - sx * sy)
           / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END
      AS rxy,
    CASE WHEN sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)) > 0
      THEN (n * sxz - sx * sz)
           / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)) END
      AS rxz,
    CASE WHEN sqrt((n * syy - sy * sy) * (n * szz - sz * sz)) > 0
      THEN (n * syz - sy * sz)
           / sqrt((n * syy - sy * sy) * (n * szz - sz * sz)) END
      AS ryz
  FROM agg
)
SELECT n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
  round(ryz, 6) AS r_yz,
  round(CASE WHEN sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) > 0
    THEN (rxy - rxz * ryz)
         / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) END, 6)
    AS partial_r
FROM r
"""


@_q("partial_correlation", _PARTIAL_CORR_ORACLE)
def q_partial_correlation(spark, sf):
    """Partial correlation of extended price and quantity controlling
    for discount (stats.partial_correlation): one aggregation to nine
    exact moment sums, closed-form first-order partial r."""
    from padua_spark.operators.stats import partial_correlation

    li = _t(spark, sf, "lineitem")
    return partial_correlation(
        li, "l_extendedprice", "l_quantity", "l_discount"
    )


_THEILS_U_ORACLE = """
WITH cells AS (
  SELECT o_orderstatus AS a, o_orderpriority AS b, count(*) AS n
  FROM orders
  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
  GROUP BY 1, 2
),
m AS (
  SELECT n,
    sum(n) OVER (PARTITION BY a) AS ra,
    sum(n) OVER (PARTITION BY b) AS cb,
    sum(n) OVER () AS nt
  FROM cells
),
agg AS (
  SELECT CAST(max(nt) AS BIGINT) AS n_total,
    sum((CAST(n AS DOUBLE) / nt)
        * ln((CAST(n AS DOUBLE) / nt)
             / ((CAST(ra AS DOUBLE) / nt)
                * (CAST(cb AS DOUBLE) / nt)))) AS mi,
    sum(-(CAST(n AS DOUBLE) / nt)
        * ln(CAST(ra AS DOUBLE) / nt)) AS ha,
    sum(-(CAST(n AS DOUBLE) / nt)
        * ln(CAST(cb AS DOUBLE) / nt)) AS hb
  FROM m
)
SELECT n_total,
  round(ha, 6) AS h_a, round(hb, 6) AS h_b, round(mi, 6) AS mi,
  round(CASE WHEN ha > 0 THEN mi / ha END, 6) AS u_a_given_b,
  round(CASE WHEN hb > 0 THEN mi / hb END, 6) AS u_b_given_a,
  round(CASE WHEN ha + hb > 0 THEN 2.0 * mi / (ha + hb) END, 6)
    AS u_symmetric
FROM agg
"""


@_q("theils_u", _THEILS_U_ORACLE)
def q_theils_u(spark, sf):
    """Theil's uncertainty coefficients between order status and
    priority (stats.theils_u): bounded contingency cells, margin
    windows over the cell frame, plug-in entropies both ways plus
    the symmetric form."""
    from padua_spark.operators.stats import theils_u

    o = _t(spark, sf, "orders")
    return theils_u(o, "o_orderstatus", "o_orderpriority")


def _kendalls_w_oracle() -> str:
    return """
WITH base AS (
  SELECT user_id AS b, event_type AS t,
    CAST(count(*) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
),
k AS (SELECT count(DISTINCT t) AS kt FROM base),
complete AS (
  SELECT b FROM base, k GROUP BY b, kt
  HAVING count(DISTINCT t) = kt AND count(*) = kt
),
kept AS (
  SELECT base.* FROM base JOIN complete USING (b)
),
ranked AS (
  SELECT b, t,
    rank() OVER (PARTITION BY b ORDER BY v)
      + (count(*) OVER (PARTITION BY b, v) - 1) / 2.0 AS rk,
    count(*) OVER (PARTITION BY b, v) AS tn
  FROM kept
),
rsums AS (
  SELECT t, sum(rk) AS rj FROM ranked GROUP BY t
),
s AS (
  SELECT sum(rj * rj) AS ssbn,
    CAST(count(*) AS BIGINT) AS k_treatments
  FROM rsums
),
ties AS (
  SELECT sum(tn * tn - 1.0) AS tie_sum,
    CAST(count(*) / (SELECT kt FROM k) AS BIGINT) AS n_blocks
  FROM ranked
),
fin AS (
  SELECT n_blocks, k_treatments,
    CASE WHEN n_blocks > 0 AND k_treatments >= 2
              AND 1.0 - tie_sum / (n_blocks * k_treatments
                  * (CAST(k_treatments AS DOUBLE) * k_treatments - 1.0))
                  > 0
      THEN ((12.0 / (CAST(n_blocks AS DOUBLE) * k_treatments
                     * (k_treatments + 1.0))) * ssbn
            - 3.0 * n_blocks * (k_treatments + 1.0))
           / (1.0 - tie_sum / (CAST(n_blocks AS DOUBLE) * k_treatments
                    * (CAST(k_treatments AS DOUBLE) * k_treatments
                       - 1.0)))
      END AS stat
  FROM s, ties
)
SELECT n_blocks, k_treatments,
  round(CASE WHEN n_blocks > 0 AND k_treatments > 1
        THEN stat / (CAST(n_blocks AS DOUBLE) * (k_treatments - 1.0))
        END, 6) AS kendalls_w,
  round(stat, 6) AS friedman_stat,
  CASE WHEN k_treatments >= 2
       THEN CAST(k_treatments - 1 AS DOUBLE) END AS dfree
FROM fin
"""


@_q("kendalls_w", _kendalls_w_oracle())
def q_kendalls_w(spark, sf):
    """Kendall's coefficient of concordance: how strongly do users
    agree on the activity ordering of event types
    (stats.kendalls_w = tie-corrected friedman chi2 / (m(k-1));
    p-value pruned — chi2 sf is the numpy UDF side)."""
    from padua_spark.operators.stats import kendalls_w

    e = _t(spark, sf, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("v")
    )
    out = kendalls_w(counts, "user_id", "event_type", "v")
    return out.select(
        "n_blocks", "k_treatments", "kendalls_w",
        _r("friedman_stat").alias("friedman_stat"), "dfree",
    )


_PAGE_TREND_ORACLE = """
WITH base AS (
  SELECT user_id AS b, event_type AS t,
    CAST(sum(value) AS DOUBLE) AS v
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
    AND value IS NOT NULL
  GROUP BY 1, 2
),
complete AS (
  SELECT b FROM base GROUP BY b
  HAVING count(DISTINCT t) = 3 AND count(*) = 3
),
kept AS (SELECT base.* FROM base JOIN complete USING (b)),
ranked AS (
  SELECT b, t,
    rank() OVER (PARTITION BY b ORDER BY v)
      + (count(*) OVER (PARTITION BY b, v) - 1) / 2.0 AS rk
  FROM kept
),
agg AS (
  SELECT
    sum(CASE t WHEN 'view' THEN 1.0 WHEN 'click' THEN 2.0
        WHEN 'purchase' THEN 3.0 END * rk) AS l,
    CAST(count(*) / 3 AS BIGINT) AS n_blocks
  FROM ranked
),
z AS (
  SELECT n_blocks, round(l, 6) AS page_l,
    CASE WHEN n_blocks > 0 THEN
      (l - n_blocks * 3.0 * 16.0 / 4.0)
      / sqrt(n_blocks * 24.0 * 24.0 / (144.0 * 2.0)) END AS zv
  FROM agg
),
e AS (
  SELECT *, abs(zv) / sqrt(2.0) AS xx,
    1.0 / (1.0 + 0.3275911 * (abs(zv) / sqrt(2.0))) AS tt
  FROM z
)
SELECT n_blocks, CAST(3 AS BIGINT) AS k_treatments, page_l,
  round(zv, 6) AS z,
  round(CASE WHEN zv >= 0 THEN
      (0.254829592 * tt - 0.284496736 * tt * tt
       + 1.421413741 * tt * tt * tt - 1.453152027 * tt * tt * tt * tt
       + 1.061405429 * tt * tt * tt * tt * tt) * exp(-xx * xx) / 2.0
    ELSE 1.0 -
      (0.254829592 * tt - 0.284496736 * tt * tt
       + 1.421413741 * tt * tt * tt - 1.453152027 * tt * tt * tt * tt
       + 1.061405429 * tt * tt * tt * tt * tt) * exp(-xx * xx) / 2.0
    END, 6) AS p_value
FROM e
"""


@_q("page_trend_test", _PAGE_TREND_ORACLE)
def q_page_trend_test(spark, sf):
    """Page's L ordered-trend test: does per-user spend rise along
    view -> click -> purchase (stats.page_trend_test): within-block
    midranks over complete blocks, closed-form no-tie moments, shared
    A&S-erfc one-sided p."""
    from padua_spark.operators.stats import page_trend_test

    e = _t(spark, sf, "events")
    agg = e.where(
        F.col("event_type").isin("view", "click", "purchase")
        & F.col("value").isNotNull()
    ).groupBy("user_id", "event_type").agg(
        F.sum("value").cast("double").alias("v")
    )
    return page_trend_test(
        agg, "user_id", "event_type", "v",
        ["view", "click", "purchase"],
    )



def _ddsketch_oracle() -> str:
    ln_g = "0.020000666706669435"
    g = "1.02020202020202"
    q_cte = []
    for q in ("0.5", "0.9", "0.99"):
        q_cte.append(f"""
SELECT event_type, CAST({q} AS DOUBLE) AS q, n_total,
  round(arg_min(est, cum), 6) AS estimate
FROM st
WHERE cum >= CAST(ceil({q} * (CAST(n_total AS DOUBLE) - 1.0))
              AS BIGINT) + 1
GROUP BY 1, 2, 3""")
    body = "\nUNION ALL\n".join(q_cte)
    return f"""
WITH c AS (
  SELECT event_type,
    CASE WHEN CAST(value AS DOUBLE) > 0
      THEN CAST(ceil(ln(CAST(value AS DOUBLE)) / {ln_g}) AS BIGINT)
    END AS bucket,
    CAST(count(*) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
st AS (
  SELECT event_type, bucket,
    sum(n) OVER (PARTITION BY event_type
                 ORDER BY bucket ASC NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cum,
    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS n_total,
    CASE WHEN bucket IS NULL THEN 0.0
      ELSE 2.0 * power({g}, CAST(bucket AS DOUBLE)) / ({g} + 1.0)
    END AS est
  FROM c
)
{body}
"""


@_q("ddsketch_quantiles", _ddsketch_oracle())
def q_ddsketch_quantiles(spark, sf):
    """DDSketch p50/p90/p99 of event value per event type at alpha=1%
    (sketches.ddsketch_counts + ddsketch_quantiles): one bucket-count
    aggregation over the fact table, cumulative window over the
    bounded sketch state, relative-error-guaranteed midpoint
    estimates — shards merge by adding bucket counts."""
    from padua_spark.extensions.sketches import (
        ddsketch_counts,
        ddsketch_quantiles,
    )

    e = _t(spark, sf, "events")
    c = ddsketch_counts(e, ["event_type"], "value", 0.01)
    return ddsketch_quantiles(c, ["event_type"], [0.5, 0.9, 0.99], 0.01)



_HOLT_WINTERS_ORACLE = """
WITH RECURSIVE s AS MATERIALIZED (
  SELECT user_id,
    row_number() OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS t,
    CAST(value AS DOUBLE) AS x
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
cnt AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1
  HAVING count(*) >= 8
),
piv AS (
  SELECT s.user_id,
    max(CASE WHEN t = 1 THEN x END) AS x1,
    max(CASE WHEN t = 2 THEN x END) AS x2,
    max(CASE WHEN t = 3 THEN x END) AS x3,
    max(CASE WHEN t = 4 THEN x END) AS x4,
    max(CASE WHEN t = 5 THEN x END) AS x5,
    max(CASE WHEN t = 6 THEN x END) AS x6,
    max(CASE WHEN t = 7 THEN x END) AS x7,
    max(CASE WHEN t = 8 THEN x END) AS x8
  FROM s JOIN cnt USING (user_id) GROUP BY 1
),
init AS (
  SELECT user_id, 8 AS t,
    CAST((x1 + x2 + x3 + x4) / 4.0 AS DOUBLE) AS l,
    CAST(((x5 + x6 + x7 + x8) / 4.0 - (x1 + x2 + x3 + x4) / 4.0)
         / 4.0 AS DOUBLE) AS b,
    [CAST(x1 - (x1 + x2 + x3 + x4) / 4.0 AS DOUBLE),
     CAST(x2 - (x1 + x2 + x3 + x4) / 4.0 AS DOUBLE),
     CAST(x3 - (x1 + x2 + x3 + x4) / 4.0 AS DOUBLE),
     CAST(x4 - (x1 + x2 + x3 + x4) / 4.0 AS DOUBLE)] AS sl
  FROM piv
),
rec AS (
  SELECT * FROM init
  UNION ALL
  SELECT user_id, t, lnew AS l,
    CAST(0.25 * (lnew - lprev) + 0.75 * bprev AS DOUBLE) AS b,
    sl[1:p - 1]
      || [CAST(0.5 * (x - lnew) + 0.5 * sp AS DOUBLE)]
      || sl[p + 1:4] AS sl
  FROM (
    SELECT r.user_id, r.t + 1 AS t, r.l AS lprev, r.b AS bprev,
      r.sl AS sl, s.x AS x,
      ((r.t % 4) + 1) AS p,
      r.sl[(r.t % 4) + 1] AS sp,
      CAST(0.5 * (s.x - r.sl[(r.t % 4) + 1])
           + 0.5 * (r.l + r.b) AS DOUBLE) AS lnew
    FROM rec r JOIN s ON s.user_id = r.user_id AND s.t = r.t + 1
  ) q
),
fin AS (
  SELECT r.user_id, c.n, r.l, r.b,
    r.sl[(c.n % 4) + 1] AS s_next
  FROM rec r JOIN cnt c ON c.user_id = r.user_id AND r.t = c.n
)
SELECT user_id, n, round(l, 6) AS level, round(b, 6) AS trend,
  round(s_next, 6) AS seasonal_next,
  round(l + b + s_next, 6) AS forecast
FROM fin
"""


@_q("holt_winters", _HOLT_WINTERS_ORACLE)
def q_holt_winters(spark, sf):
    """Holt-Winters additive seasonal smoothing of each user's
    event-value series, period 4, alpha=0.5 beta=0.25 gamma=0.5 —
    exact binary fractions so the sequential float recursion is
    bit-identical across engines (temporal.holt_winters_forecast):
    one shuffle by key, one JVM array fold carrying (level, trend,
    seasonal ring); the oracle steps the SAME recursion as a
    recursive CTE with a seasonal list."""
    from padua_spark.operators.temporal import holt_winters_forecast
    from padua_spark.streaming.windows import epoch_us_col

    e = _t(spark, sf, "events")
    base = e.where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id",
        epoch_us_col(e, "ts").alias("_tu"),
        "event_id",
        "value",
    )
    return holt_winters_forecast(
        base, ["user_id"], ["_tu", "event_id"], "value",
        period=4, horizon=1,
    )



_BRUNNER_MUNZEL_ORACLE = """
WITH per AS (
  SELECT v, CAST(count(*) FILTER (g = 'A') AS BIGINT) AS ca,
    CAST(count(*) FILTER (g = 'R') AS BIGINT) AS cb
  FROM (SELECT CAST(l_quantity AS DOUBLE) AS v, l_returnflag AS g
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_returnflag IN ('A', 'R'))
  GROUP BY 1
),
cum AS (
  SELECT ca, cb,
    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fa,
    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fb
  FROM per
),
x AS (
  SELECT ca, cb,
    (2 * (fa + fb) - (ca + cb) + 1) / 2.0 AS rp,
    ((2 * (fa + fb) - (ca + cb) + 1)
     - (2 * fa - ca + 1)) / 2.0 AS xa,
    ((2 * (fa + fb) - (ca + cb) + 1)
     - (2 * fb - cb + 1)) / 2.0 AS xb
  FROM cum
),
agg AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
    sum(CAST(ca AS DOUBLE) * rp) AS sra,
    sum(CAST(cb AS DOUBLE) * rp) AS srb,
    sum(CAST(ca AS DOUBLE) * xa) AS sxa,
    sum(CAST(cb AS DOUBLE) * xb) AS sxb,
    sum(CAST(ca AS DOUBLE) * xa * xa) AS sxa2,
    sum(CAST(cb AS DOUBLE) * xb * xb) AS sxb2
  FROM x
),
fin AS (
  SELECT n_a, n_b,
    sra / n_a AS ra_bar, srb / n_b AS rb_bar,
    CASE WHEN n_a > 1 THEN (sxa2 - sxa * sxa / n_a) / (n_a - 1.0) END
      AS sa2,
    CASE WHEN n_b > 1 THEN (sxb2 - sxb * sxb / n_b) / (n_b - 1.0) END
      AS sb2
  FROM agg
)
SELECT n_a, n_b,
  round(CASE WHEN n_a * sa2 + n_b * sb2 > 0
    THEN CAST(n_a AS DOUBLE) * n_b * (rb_bar - ra_bar)
         / ((CAST(n_a AS DOUBLE) + n_b)
            * sqrt(n_a * sa2 + n_b * sb2)) END, 6) AS w_stat,
  round(CASE WHEN n_a * sa2 + n_b * sb2 > 0
    THEN (n_a * sa2 + n_b * sb2) * (n_a * sa2 + n_b * sb2)
         / ((n_a * sa2) * (n_a * sa2) / (n_a - 1.0)
            + (n_b * sb2) * (n_b * sb2) / (n_b - 1.0)) END, 6)
    AS df
FROM fin
"""


@_q("brunner_munzel", _BRUNNER_MUNZEL_ORACLE)
def q_brunner_munzel(spark, sf):
    """Brunner-Munzel stochastic-equality test A vs R on quantity
    (stats.brunner_munzel): pooled and within-group doubled midranks
    off the shared distributed ECDF cumsum, one-pass variance
    algebra; t p-value pruned (vectorized UDF side)."""
    from padua_spark.operators.stats import brunner_munzel

    li = _t(spark, sf, "lineitem")
    out = brunner_munzel(li, "l_returnflag", "l_quantity", "A", "R")
    return out.select("n_a", "n_b", "w_stat", "df")


_QUADE_ORACLE = """
WITH base AS (
  SELECT user_id AS b, event_type AS t,
    CAST(count(*) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
),
k AS (SELECT count(DISTINCT t) AS kt FROM base),
complete AS (
  SELECT b FROM base, k GROUP BY b, kt
  HAVING count(DISTINCT t) = kt AND count(*) = kt
),
kept AS (SELECT base.* FROM base JOIN complete USING (b)),
ranked AS (
  SELECT b, t,
    rank() OVER (PARTITION BY b ORDER BY v)
      + (count(*) OVER (PARTITION BY b, v) - 1) / 2.0 AS rk
  FROM kept
),
ranges AS (
  SELECT b, max(v) - min(v) AS rng FROM kept GROUP BY 1
),
weights AS (
  SELECT b,
    rank() OVER (ORDER BY rng)
      + (count(*) OVER (PARTITION BY rng) - 1) / 2.0 AS q
  FROM ranges
),
sij AS (
  SELECT r.t,
    w.q * (r.rk - ((SELECT kt FROM k) + 1) / 2.0) AS s
  FROM ranked r JOIN weights w USING (b)
),
per_t AS (
  SELECT t, sum(s) AS sj, sum(s * s) AS a_part FROM sij GROUP BY 1
),
agg AS (
  SELECT sum(a_part) AS a, sum(sj * sj) AS ssj,
    CAST(count(*) AS BIGINT) AS k_treatments
  FROM per_t
),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks FROM complete)
SELECT n_blocks, k_treatments,
  round(CASE WHEN a - ssj / n_blocks > 0 AND n_blocks > 1
    THEN (CAST(n_blocks AS DOUBLE) - 1.0) * (ssj / n_blocks)
         / (a - ssj / n_blocks) END, 6) AS quade_f,
  CASE WHEN k_treatments >= 2
       THEN CAST(k_treatments - 1 AS DOUBLE) END AS df1,
  CASE WHEN k_treatments >= 2 AND n_blocks > 1
       THEN (CAST(n_blocks AS DOUBLE) - 1.0) * (k_treatments - 1.0)
       END AS df2
FROM agg, nb
"""


@_q("quade_test", _QUADE_ORACLE)
def q_quade_test(spark, sf):
    """Quade range-weighted repeated-measures rank test on per-user
    event-type activity (stats.quade_test): within-block midranks,
    block weights from DISTRIBUTED midranks of the block ranges, F
    statistic; p pruned (F sf is the vectorized UDF side)."""
    from padua_spark.operators.stats import quade_test

    e = _t(spark, sf, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("v")
    )
    out = quade_test(counts, "user_id", "event_type", "v")
    return out.select(
        "n_blocks", "k_treatments",
        _r("quade_f").alias("quade_f"), "df1", "df2",
    )


_KRIPPENDORFF_ORACLE = """
WITH cells AS (
  SELECT user_id AS i, event_type AS j,
    CAST(count(*) AS BIGINT) AS nij
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
sized AS (
  SELECT c.*, s.ni FROM cells c
  JOIN (SELECT i, sum(nij) AS ni FROM cells GROUP BY 1
        HAVING sum(nij) >= 2) s USING (i)
),
per_item AS (
  SELECT i, max(ni) AS n,
    sum(nij * (ni - nij)) AS dis
  FROM sized GROUP BY 1
),
do_agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_items,
    CAST(sum(n) AS BIGINT) AS n_ratings,
    sum(CAST(dis AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)) AS do_sum
  FROM per_item
),
cat_agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k_categories,
    sum(CAST(cj AS DOUBLE) * CAST(cj AS DOUBLE)) AS csq
  FROM (SELECT j, sum(nij) AS cj FROM sized GROUP BY 1)
),
fin AS (
  SELECT n_items, n_ratings, k_categories,
    do_sum / CAST(n_ratings AS DOUBLE) AS d_o,
    (CAST(n_ratings AS DOUBLE) * n_ratings - csq)
      / (CAST(n_ratings AS DOUBLE) * (n_ratings - 1.0)) AS d_e
  FROM do_agg, cat_agg
)
SELECT n_items, n_ratings, k_categories,
  round(d_o, 6) AS d_o, round(d_e, 6) AS d_e,
  round(CASE WHEN d_e > 0 THEN 1.0 - d_o / d_e END, 6) AS alpha
FROM fin
"""


@_q("krippendorff_alpha", _KRIPPENDORFF_ORACLE)
def q_krippendorff_alpha(spark, sf):
    """Krippendorff's nominal alpha over ragged per-user event-type
    'ratings' (stats.krippendorff_alpha): pair-disagreement within
    items vs overall, exact integer counts, no constant-rater
    requirement."""
    from padua_spark.operators.stats import krippendorff_alpha

    e = _t(spark, sf, "events")
    return krippendorff_alpha(e, "user_id", "event_type")



def _windowed_ddsketch_oracle() -> str:
    ln_g = "0.020000666706669435"
    g = "1.02020202020202"
    q_cte = []
    for q in ("0.5", "0.95"):
        q_cte.append(f"""
SELECT ws AS window_start_epoch, CAST({q} AS DOUBLE) AS q, n_total,
  round(arg_min(est, cum), 6) AS estimate
FROM st
WHERE cum >= CAST(ceil({q} * (CAST(n_total AS DOUBLE) - 1.0))
              AS BIGINT) + 1
GROUP BY 1, 2, 3""")
    body = "\nUNION ALL\n".join(q_cte)
    return f"""
WITH c AS (
  SELECT (epoch_us(ts) // 86400000000) * 86400 AS ws,
    CASE WHEN CAST(value AS DOUBLE) > 0
      THEN CAST(ceil(ln(CAST(value AS DOUBLE)) / {ln_g}) AS BIGINT)
    END AS bucket,
    CAST(count(*) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
st AS (
  SELECT ws, bucket,
    sum(n) OVER (PARTITION BY ws
                 ORDER BY bucket ASC NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cum,
    CAST(sum(n) OVER (PARTITION BY ws) AS BIGINT) AS n_total,
    CASE WHEN bucket IS NULL THEN 0.0
      ELSE 2.0 * power({g}, CAST(bucket AS DOUBLE)) / ({g} + 1.0)
    END AS est
  FROM c
)
{body}
"""


@_q("windowed_ddsketch", _windowed_ddsketch_oracle())
def q_windowed_ddsketch(spark, sf):
    """Daily p50/p95 of event value from per-window DDSketch bucket
    counts (streaming.windowed_ddsketch finalized by
    sketches.ddsketch_quantiles): one stateful aggregation whose
    per-window state is bucket-bounded — the same plan runs on the
    live stream (see the stream==batch test)."""
    from padua_spark.extensions.sketches import ddsketch_quantiles
    from padua_spark.streaming import windowed_ddsketch

    e = _t(spark, sf, "events")
    c = windowed_ddsketch(
        e,
        _events_event_time(spark, sf),
        F.col("value"),
        relative_accuracy=0.01,
        window_duration="1 day",
    )
    counts = c.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "bucket",
        "n",
    )
    return ddsketch_quantiles(
        counts, ["window_start_epoch"], [0.5, 0.95], 0.01
    )



_SEASONAL_DECOMP_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id,
    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS xc
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
w AS (
  SELECT user_id, tu, event_id, xc,
    CASE WHEN count(*) OVER win5 = 5 THEN
      2 * sum(xc) OVER win5
      - lag(xc, 2) OVER wo
      - lead(xc, 2) OVER wo END AS tn,
    ((row_number() OVER wo - 1) % 4 + 1) AS phase
  FROM e
  WINDOW wo AS (PARTITION BY user_id ORDER BY tu, event_id),
    win5 AS (PARTITION BY user_id ORDER BY tu, event_id
             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
),
ph AS (
  SELECT user_id, phase,
    CAST(sum(xc * 8 - tn) AS BIGINT) AS dsum,
    CAST(count(*) AS BIGINT) AS dn
  FROM w WHERE tn IS NOT NULL GROUP BY 1, 2
),
si_raw AS (
  SELECT user_id, phase,
    CAST(dsum AS DOUBLE) / (CAST(dn AS DOUBLE) * 8.0) AS sr
  FROM ph
),
ctr AS (
  SELECT user_id,
    sum(sr ORDER BY phase) / count(*) AS si_mean
  FROM si_raw GROUP BY 1
),
idx AS (
  SELECT s.user_id, s.phase,
    CAST(floor((s.sr - c.si_mean) / 100.0 * 1e6 + 0.5) AS DOUBLE)
      / 1e6 AS si
  FROM si_raw s JOIN ctr c USING (user_id)
)
SELECT w.user_id, w.tu AS _tu, w.event_id,
  round(CAST(w.xc AS DOUBLE) / 100.0, 6) AS value,
  round(CAST(w.tn AS DOUBLE) / 800.0, 6) AS trend,
  i.si AS seasonal,
  round(CAST(w.xc AS DOUBLE) / 100.0
        - CAST(w.tn AS DOUBLE) / 800.0 - i.si, 6) AS residual
FROM w LEFT JOIN idx i
  ON i.user_id = w.user_id AND i.phase = w.phase
"""


@_q("seasonal_decompose", _SEASONAL_DECOMP_ORACLE)
def q_seasonal_decompose(spark, sf):
    """Classical additive decomposition of each user's event-value
    series at period 4 (temporal.seasonal_decompose): 2xm centered MA
    trend, centered per-phase seasonal indices, residual — one
    ordered window pass plus two bounded joins."""
    from padua_spark.operators.temporal import seasonal_decompose
    from padua_spark.streaming.windows import epoch_us_col

    e = _t(spark, sf, "events")
    base = e.where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id",
        epoch_us_col(e, "ts").alias("_tu"),
        "event_id",
        "value",
    )
    return seasonal_decompose(
        base, ["user_id"], ["_tu", "event_id"], "value", period=4,
        exact_scale=100,
    )


def _tokenizer_stats_oracle() -> str:
    pat = __import__(
        "padua_spark.extensions.text", fromlist=["BPE_PATTERN"]
    ).BPE_PATTERN.replace("'", "''")
    return rf"""
WITH t AS (
  SELECT lang,
    CAST(len(text) AS BIGINT) AS nc,
    CAST(len(list_filter(
      string_split_regex(trim(text), '[ \t\n\x0B\f\r]+'),
      tk -> tk <> '')) AS BIGINT) AS nws,
    CAST(coalesce(len(regexp_extract_all(text, '{pat}')), 0)
      AS BIGINT) AS nbpe
  FROM documents WHERE text IS NOT NULL
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(nc) AS BIGINT) AS n_chars,
  CAST(sum(nws) AS BIGINT) AS n_ws_tokens,
  CAST(sum(nbpe) AS BIGINT) AS n_bpe_tokens,
  round(CASE WHEN sum(nws) > 0
    THEN CAST(sum(nbpe) AS DOUBLE) / sum(nws) END, 6) AS fertility,
  round(CASE WHEN sum(nbpe) > 0
    THEN CAST(sum(nc) AS DOUBLE) / sum(nbpe) END, 6)
    AS chars_per_token
FROM t GROUP BY 1
"""


@_q("tokenizer_stats", _tokenizer_stats_oracle())
def q_tokenizer_stats(spark, sf):
    """Per-language tokenizer fertility and compression
    (text.tokenizer_stats): BPE pretokens per whitespace token and
    chars per pretoken — one conditional aggregation of exact
    integer sums, all scan-side regexp counts."""
    from padua_spark.extensions.text import tokenizer_stats

    d = _t(spark, sf, "documents")
    return tokenizer_stats(d, ["lang"], "text")



_CHATTERJEE_ORACLE = """
WITH p AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS x,
    CAST(l_quantity AS DOUBLE) AS y,
    l_orderkey * 8 + l_linenumber AS id
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
),
rk AS (
  SELECT x, id,
    CAST(count(*) OVER (ORDER BY y
      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS r,
    CAST(count(*) OVER (ORDER BY y DESC
      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS l,
    CAST(count(*) OVER () AS BIGINT) AS n
  FROM p
),
d AS (
  SELECT r, l, n,
    lag(r) OVER (ORDER BY x, id) AS rprev
  FROM rk
),
agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n,
    CAST(sum(CASE WHEN rprev IS NOT NULL
        THEN abs(r - rprev) END) AS BIGINT) AS num,
    CAST(sum(l * (n - l)) AS BIGINT) AS den
  FROM d
)
SELECT n,
  round(CASE WHEN den > 0 THEN
    1.0 - CAST(n AS DOUBLE) * num / (2.0 * den) END, 6) AS xi
FROM agg
"""


@_q("chatterjee_xi", _CHATTERJEE_ORACLE)
def q_chatterjee_xi(spark, sf):
    """Chatterjee's xi dependence coefficient of quantity on extended
    price (stats.chatterjee_xi): y-ranks from the shared distributed
    ECDF cumsum, x-ordered adjacent rank differences via a range
    partition with boundary stitching — no global sort of the fact
    table; every sum is an exact integer."""
    from padua_spark.operators.stats import chatterjee_xi

    li = _t(spark, sf, "lineitem").select(
        F.col("l_extendedprice").alias("x"),
        F.col("l_quantity").alias("y"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("id"),
    )
    return chatterjee_xi(li, "x", "y", "id")


_BRESLOW_DAY_ORACLE = """
WITH u AS (
  SELECT user_id, user_id % 4 AS s,
    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS e,
    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS o
  FROM events GROUP BY 1, 2
),
per AS (
  SELECT s,
    CAST(sum(CASE WHEN e = 1 AND o = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      AS a,
    CAST(sum(CASE WHEN e = 1 AND o = 0 THEN 1 ELSE 0 END) AS DOUBLE)
      AS b,
    CAST(sum(CASE WHEN e = 0 AND o = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      AS c,
    CAST(sum(CASE WHEN e = 0 AND o = 0 THEN 1 ELSE 0 END) AS DOUBLE)
      AS d
  FROM u GROUP BY 1
),
psi AS (
  SELECT sum(a * d / (a + b + c + d)) / sum(b * c / (a + b + c + d))
    AS ps
  FROM per WHERE a + b + c + d > 0
),
st AS (
  SELECT per.*, psi.ps,
    a + b AS n1, c + d AS n0, a + c AS m1,
    1.0 - ps AS qa,
    ps * ((a + b) + (a + c)) + ((c + d) - (a + c)) AS qb,
    -ps * (a + b) * (a + c) AS qc
  FROM per, psi
),
ae AS (
  SELECT *,
    CASE WHEN abs(qa) < 1e-12 THEN -qc / qb
      ELSE (-qb + sqrt(qb * qb - 4.0 * qa * qc)) / (2.0 * qa)
    END AS a_e,
    (n1 > 0 AND n0 > 0 AND m1 > 0 AND (b + d) > 0
     AND ps IS NOT NULL) AS valid
  FROM st
),
terms AS (
  SELECT valid, ps, a, a_e,
    CASE WHEN valid THEN
      1.0 / a_e + 1.0 / (n1 - a_e) + 1.0 / (m1 - a_e)
      + 1.0 / (n0 - m1 + a_e) END AS vinv
  FROM ae
),
agg AS (
  SELECT CAST(sum(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT)
      AS k_strata,
    max(ps) AS psv,
    sum(CASE WHEN valid THEN (a - a_e) * (a - a_e) * vinv
        ELSE 0.0 END) AS x2,
    sum(CASE WHEN valid THEN a - a_e ELSE 0.0 END) AS dev,
    sum(CASE WHEN valid THEN 1.0 / vinv ELSE 0.0 END) AS vs
  FROM terms
)
SELECT k_strata,
  round(psv, 6) AS or_mh,
  round(x2 - CASE WHEN vs > 0 THEN dev * dev / vs ELSE 0.0 END, 6)
    AS bd_chi2,
  CASE WHEN k_strata >= 2
       THEN CAST(k_strata - 1 AS DOUBLE) END AS dfree
FROM agg
"""


@_q("breslow_day", _BRESLOW_DAY_ORACLE)
def q_breslow_day(spark, sf):
    """Breslow-Day(-Tarone) homogeneity of the error->purchase odds
    ratio across user cohorts (stats.breslow_day): per-stratum
    expected cells from the closed-form quadratic under the MH common
    OR; chi2 p pruned (vectorized UDF side)."""
    from padua_spark.operators.stats import breslow_day

    e = _t(spark, sf, "events")
    u = e.groupBy("user_id").agg(
        (F.col("user_id") % 4).alias("s"),
        F.max(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("e"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("o"),
    )
    out = breslow_day(u, ["s"], "e", "o")
    return out.select("k_strata", "or_mh", "bd_chi2", "dfree")



_YUEN_ORACLE = """
WITH per AS (
  SELECT v, CAST(count(*) FILTER (g = 'A') AS BIGINT) AS ca,
    CAST(count(*) FILTER (g = 'R') AS BIGINT) AS cb
  FROM (SELECT CAST(l_quantity AS DOUBLE) AS v, l_returnflag AS g
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_returnflag IN ('A', 'R'))
  GROUP BY 1
),
cum AS (
  SELECT v, ca, cb,
    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fa,
    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fb,
    sum(ca) OVER () AS na, sum(cb) OVER () AS nb
  FROM per
),
st AS (
  SELECT *,
    CAST(floor(0.2 * na) AS BIGINT) AS ga,
    CAST(floor(0.2 * nb) AS BIGINT) AS gb
  FROM cum
),
agg AS (
  SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
    CAST(max(ga) AS BIGINT) AS g_a, CAST(max(gb) AS BIGINT) AS g_b,
    sum(greatest(CAST(0 AS BIGINT),
        least(fa, na - ga) - greatest(fa - ca + 1, ga + 1) + 1) * v)
      AS tsa,
    sum(greatest(CAST(0 AS BIGINT),
        least(fa, na - ga) - greatest(fa - ca + 1, ga + 1) + 1)
        * v * v) AS tqa,
    min(CASE WHEN fa >= ga + 1 THEN v END) AS loa,
    min(CASE WHEN fa >= na - ga THEN v END) AS hia,
    sum(greatest(CAST(0 AS BIGINT),
        least(fb, nb - gb) - greatest(fb - cb + 1, gb + 1) + 1) * v)
      AS tsb,
    sum(greatest(CAST(0 AS BIGINT),
        least(fb, nb - gb) - greatest(fb - cb + 1, gb + 1) + 1)
        * v * v) AS tqb,
    min(CASE WHEN fb >= gb + 1 THEN v END) AS lob,
    min(CASE WHEN fb >= nb - gb THEN v END) AS hib
  FROM st
),
fit AS (
  SELECT n_a, n_b,
    tsa / (n_a - 2.0 * g_a) AS tma,
    tsb / (n_b - 2.0 * g_b) AS tmb,
    ((tqa + g_a * (loa * loa + hia * hia))
     - (tsa + g_a * (loa + hia)) * (tsa + g_a * (loa + hia)) / n_a)
      / (n_a - 1.0) AS swa,
    ((tqb + g_b * (lob * lob + hib * hib))
     - (tsb + g_b * (lob + hib)) * (tsb + g_b * (lob + hib)) / n_b)
      / (n_b - 1.0) AS swb,
    n_a - 2.0 * g_a AS ha, n_b - 2.0 * g_b AS hb
  FROM agg
),
dd AS (
  SELECT n_a, n_b, tma, tmb, ha, hb,
    (n_a - 1.0) * swa / (ha * (ha - 1.0)) AS da,
    (n_b - 1.0) * swb / (hb * (hb - 1.0)) AS db
  FROM fit
)
SELECT n_a, n_b,
  round(tma, 6) AS trimmed_mean_a,
  round(tmb, 6) AS trimmed_mean_b,
  round(CASE WHEN da + db > 0
        THEN (tma - tmb) / sqrt(da + db) END, 6) AS t_stat,
  round(CASE WHEN da + db > 0
        THEN (da + db) * (da + db)
             / (da * da / (ha - 1.0) + db * db / (hb - 1.0)) END, 6)
    AS df
FROM dd
"""


@_q("yuen_test", _YUEN_ORACLE)
def q_yuen_test(spark, sf):
    """Yuen's 20%-trimmed robust t A vs R on quantity
    (stats.yuen_test): trimmed multiplicities and boundary order
    statistics from ONE pass over the shared distributed ECDF frame —
    no per-group sort; t p pruned (vectorized UDF side)."""
    from padua_spark.operators.stats import yuen_test

    li = _t(spark, sf, "lineitem")
    out = yuen_test(li, "l_returnflag", "l_quantity", "A", "R")
    return out.select(
        "n_a", "n_b", "trimmed_mean_a", "trimmed_mean_b",
        "t_stat", "df",
    )



def _binom_exact_oracle() -> str:
    lp_i = _log_choose_sql("n", "i") + " + i * ln(0.4) + (n - i) * ln(0.6)"
    lp_k = _log_choose_sql("n", "k") + " + k * ln(0.4) + (n - k) * ln(0.6)"
    return f"""
WITH cnt AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM documents WHERE lang IS NOT NULL
),
rows_i AS (
  SELECT cnt.*, unnest(generate_series(CAST(0 AS BIGINT), n)) AS i
  FROM cnt
),
terms AS (
  SELECT n, k, i, ({lp_i}) AS lp, ({lp_k}) AS lpk FROM rows_i
),
p AS (
  SELECT n, k,
    sum(CASE WHEN i <= k THEN exp(lp) ELSE 0.0 END ORDER BY i) AS pl,
    sum(CASE WHEN i >= k THEN exp(lp) ELSE 0.0 END ORDER BY i) AS pr,
    sum(CASE WHEN lp <= lpk + 9.999999505838704e-08
        THEN exp(lp) ELSE 0.0 END ORDER BY i) AS pt
  FROM terms GROUP BY 1, 2
)
SELECT n, k,
  round(CASE WHEN n > 0 THEN CAST(k AS DOUBLE) / n END, 6) AS p_hat,
  round(least(pl, 1.0), 6) AS p_left,
  round(least(pr, 1.0), 6) AS p_right,
  round(least(pt, 1.0), 6) AS p_two
FROM p
"""


@_q("binom_exact", _binom_exact_oracle())
def q_binom_exact(spark, sf):
    """Exact binomial test: is 40% of the corpus English?
    (stats.binom_test_exact, p0=0.4): one aggregation to (n, k), the
    bounded JVM tail fold with scipy's point-probability two-sided
    rule."""
    from padua_spark.operators.stats import binom_test_exact

    d = _t(spark, sf, "documents").where(F.col("lang").isNotNull())
    return binom_test_exact(d, F.col("lang") == "en", p0=0.4)


def _mcnemar_exact_oracle() -> str:
    lp_i = _log_choose_sql("nd", "i") + " + nd * ln(0.5)"
    lp_k = _log_choose_sql("nd", "k") + " + nd * ln(0.5)"
    return f"""
WITH flags AS (
  SELECT CASE WHEN n_chars > 500 THEN 1 ELSE 0 END AS a,
    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS b
  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
),
cnt AS (
  SELECT
    CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n00,
    CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n01,
    CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n10,
    CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n11
  FROM flags
),
st AS (SELECT *, n01 + n10 AS nd, n01 AS k FROM cnt),
rows_i AS (
  SELECT st.*, unnest(generate_series(CAST(0 AS BIGINT), nd)) AS i
  FROM st
),
terms AS (
  SELECT n00, n01, n10, n11, nd, k, i,
    ({lp_i}) AS lp, ({lp_k}) AS lpk
  FROM rows_i
),
p AS (
  SELECT n00, n01, n10, n11, max(nd) AS nd,
    sum(CASE WHEN lp <= lpk + 9.999999505838704e-08
        THEN exp(lp) ELSE 0.0 END ORDER BY i) AS pt
  FROM terms GROUP BY 1, 2, 3, 4
)
SELECT n00, n01, n10, n11,
  round(CASE WHEN nd > 0 THEN least(pt, 1.0) ELSE 1.0 END, 6)
    AS p_exact
FROM p
"""


@_q("mcnemar_exact", _mcnemar_exact_oracle())
def q_mcnemar_exact(spark, sf):
    """Exact McNemar on paired 'long doc' vs 'is English' flags
    (stats.mcnemar_exact): symmetric Bin(n01+n10, 1/2) tail bounded
    by the discordant count only."""
    from padua_spark.operators.stats import mcnemar_exact

    d = _t(spark, sf, "documents").where(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    flags = d.select(
        (F.col("n_chars") > 500).cast("int").alias("a"),
        (F.col("lang") == "en").cast("int").alias("b"),
    )
    return mcnemar_exact(flags, "a", "b")


def _poisson_rate_oracle() -> str:
    lp_i = (
        _log_choose_sql("n", "i")
        + " + i * ln(p0) + (n - i) * ln(1.0 - p0)"
    )
    lp_k = (
        _log_choose_sql("n", "k")
        + " + k * ln(p0) + (n - k) * ln(1.0 - p0)"
    )
    return f"""
WITH e AS (
  SELECT user_id % 2 AS g,
    CASE WHEN event_type = 'purchase'
      THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS c
  FROM events
),
cnt AS (
  SELECT
    CAST(sum(CASE WHEN g = 0 THEN c ELSE 0.0 END) AS BIGINT) AS k_a,
    CAST(sum(CASE WHEN g = 1 THEN c ELSE 0.0 END) AS BIGINT) AS k_b,
    CAST(sum(CASE WHEN g = 0 THEN 1.0 ELSE 0.0 END) AS DOUBLE)
      AS t_a,
    CAST(sum(CASE WHEN g = 1 THEN 1.0 ELSE 0.0 END) AS DOUBLE)
      AS t_b
  FROM e
),
st AS (
  SELECT *, k_a + k_b AS n, k_a AS k, t_a / (t_a + t_b) AS p0
  FROM cnt
),
rows_i AS (
  SELECT st.*, unnest(generate_series(CAST(0 AS BIGINT), n)) AS i
  FROM st
),
terms AS (
  SELECT k_a, k_b, t_a, t_b, n, k, i,
    ({lp_i}) AS lp, ({lp_k}) AS lpk
  FROM rows_i
),
p AS (
  SELECT k_a, k_b, t_a, t_b,
    sum(CASE WHEN i <= k THEN exp(lp) ELSE 0.0 END ORDER BY i) AS pl,
    sum(CASE WHEN i >= k THEN exp(lp) ELSE 0.0 END ORDER BY i) AS pr,
    sum(CASE WHEN lp <= lpk + 9.999999505838704e-08
        THEN exp(lp) ELSE 0.0 END ORDER BY i) AS pt
  FROM terms GROUP BY 1, 2, 3, 4
)
SELECT k_a, k_b, round(t_a, 6) AS t_a, round(t_b, 6) AS t_b,
  round(CASE WHEN t_a > 0 AND t_b > 0 AND k_b > 0
    THEN (CAST(k_a AS DOUBLE) / t_a) / (CAST(k_b AS DOUBLE) / t_b)
    END, 6) AS rate_ratio,
  round(least(pl, 1.0), 6) AS p_left,
  round(least(pr, 1.0), 6) AS p_right,
  round(least(pt, 1.0), 6) AS p_two
FROM p
"""


@_q("poisson_rate_test", _poisson_rate_oracle())
def q_poisson_rate_test(spark, sf):
    """Exact conditional Poisson rate comparison: do the two user
    cohorts purchase at the same per-event rate?
    (stats.poisson_rate_test): conditioning on the total turns the
    question into one bounded binomial tail — no Poisson special
    function on either engine."""
    from padua_spark.operators.stats import poisson_rate_test

    e = _t(spark, sf, "events").select(
        (F.col("user_id") % 2).alias("g"),
        F.when(F.col("event_type") == "purchase", 1.0)
        .otherwise(0.0).alias("c"),
    )
    return poisson_rate_test(e, "g", 0, 1, count_col="c")


_G_TEST_ORACLE = """
WITH cells AS (
  SELECT o_orderstatus AS a, o_orderpriority AS b, count(*) AS n
  FROM orders
  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
  GROUP BY 1, 2
),
m AS (
  SELECT n,
    sum(n) OVER (PARTITION BY a) AS ra,
    sum(n) OVER (PARTITION BY b) AS cb,
    sum(n) OVER () AS nt,
    CASE WHEN row_number() OVER (PARTITION BY a ORDER BY b) = 1
      THEN 1 ELSE 0 END AS fa,
    CASE WHEN row_number() OVER (PARTITION BY b ORDER BY a) = 1
      THEN 1 ELSE 0 END AS fb
  FROM cells
),
agg AS (
  SELECT CAST(max(nt) AS BIGINT) AS n_total,
    sum(2.0 * n * ln(CAST(n AS DOUBLE)
        / (CAST(ra AS DOUBLE) * cb / nt))) AS g,
    CAST(sum(fa) AS BIGINT) AS r_levels,
    CAST(sum(fb) AS BIGINT) AS c_levels,
    sum(CASE WHEN fa = 1 THEN 1.0 / ra END) AS sri,
    sum(CASE WHEN fb = 1 THEN 1.0 / cb END) AS scj
  FROM m
),
fin AS (
  SELECT n_total, r_levels, c_levels, g,
    (CAST(r_levels AS DOUBLE) - 1.0)
      * (CAST(c_levels AS DOUBLE) - 1.0) AS dfree,
    1.0 + (CAST(n_total AS DOUBLE) * sri - 1.0)
      * (CAST(n_total AS DOUBLE) * scj - 1.0)
      / (6.0 * n_total
         * (CAST(r_levels AS DOUBLE) - 1.0)
         * (CAST(c_levels AS DOUBLE) - 1.0)) AS q
  FROM agg
)
SELECT n_total, r_levels, c_levels,
  round(g, 6) AS g_stat,
  round(CASE WHEN dfree > 0 THEN g / q END, 6) AS g_adjusted,
  CASE WHEN dfree > 0 THEN dfree END AS dfree
FROM fin
"""


@_q("g_test", _G_TEST_ORACLE)
def q_g_test(spark, sf):
    """Williams-corrected G-test of independence between order status
    and priority (stats.g_test_independence): bounded contingency
    cells, margin windows, exact-integer closed form; chi2 p pruned
    (vectorized UDF side)."""
    from padua_spark.operators.stats import g_test_independence

    o = _t(spark, sf, "orders")
    out = g_test_independence(o, "o_orderstatus", "o_orderpriority")
    return out.select(
        "n_total", "r_levels", "c_levels",
        "g_stat", "g_adjusted", "dfree",
    )



_BOILERPLATE_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
    'NOTICE: synthetic banner' || chr(10)
      || regexp_replace(text, '\. ', '.' || chr(10), 'g')
      || chr(10) || 'footer: synthetic nav' AS t
  FROM documents WHERE text IS NOT NULL
),
lines AS (
  SELECT doc_id,
    unnest(string_split(t, chr(10))) AS line,
    unnest(generate_series(1, len(string_split(t, chr(10)))))
      AS pos
  FROM d
),
keyd AS (SELECT doc_id, pos, line, trim(line) AS k FROM lines),
freq AS (
  SELECT k FROM (
    SELECT k, count(DISTINCT doc_id) AS df FROM keyd
    WHERE len(k) >= 1 GROUP BY 1
  ) WHERE df > 2
),
flagged AS (
  SELECT keyd.*, k IN (SELECT k FROM freq) AS bp FROM keyd
)
SELECT doc_id,
  coalesce(
    string_agg(CASE WHEN NOT bp THEN line END, chr(10)
               ORDER BY pos),
    '') AS clean_text,
  CAST(sum(CASE WHEN NOT bp THEN 1 ELSE 0 END) AS BIGINT)
    AS n_lines_kept,
  CAST(sum(CASE WHEN bp THEN 1 ELSE 0 END) AS BIGINT)
    AS n_lines_removed
FROM flagged GROUP BY 1
"""


@_q("boilerplate_lines", _BOILERPLATE_ORACLE)
def q_boilerplate_lines(spark, sf):
    """C4-style boilerplate-line removal over a sentence-per-line
    rendering of the corpus with a planted banner and footer on every
    document (dedup.remove_boilerplate_lines): lines shared by more
    than 2 documents are stripped everywhere; one
    positional explode, one vocabulary-sized doc-frequency
    aggregation, per-document ordered reassembly."""
    from padua_spark.extensions.dedup import remove_boilerplate_lines

    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("NOTICE: synthetic banner\n"),
            F.regexp_replace(F.col("text"), r"\. ", ".\n"),
            F.lit("\nfooter: synthetic nav"),
        ).alias("text"),
    )
    return remove_boilerplate_lines(
        d, "doc_id", "text", max_doc_freq=2
    )



_KS_1SAMP_ORACLE = """
WITH per AS (
  SELECT CAST(value AS DOUBLE) AS v,
    CAST(count(*) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT v, c,
    sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f,
    sum(c) OVER () AS n
  FROM per
),
gaps AS (
  SELECT n,
    greatest(
      abs(CAST(f AS DOUBLE) / n
          - least(1.0, greatest(0.0, (v - 0.0) / 500.0))),
      abs(CAST(f - c AS DOUBLE) / n
          - least(1.0, greatest(0.0, (v - 0.0) / 500.0)))) AS gap
  FROM cum
),
agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n, max(gap) AS d FROM gaps
),
lam AS (
  SELECT n, d,
    d * (sqrt(CAST(n AS DOUBLE)) + 0.12
         + 0.11 / sqrt(CAST(n AS DOUBLE))) AS l
  FROM agg
),
ser AS (
  SELECT n, d,
    2.0 * sum(CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END
              * exp(-2.0 * k * k * l * l) ORDER BY k) AS q
  FROM lam, (SELECT unnest(generate_series(1, 100)) AS k)
  GROUP BY n, d
)
SELECT n, round(d, 6) AS d_stat,
  round(least(1.0, greatest(0.0, q)), 6) AS p_value
FROM ser
"""


@_q("ks_1samp", _KS_1SAMP_ORACLE)
def q_ks_1samp(spark, sf):
    """One-sample KS fit of event values against uniform(0, 500)
    (stats.ks_1samp): both one-sided ECDF gaps from the shared
    distributed stepped cumsum, Stephens-corrected asymptotic
    Kolmogorov series shared verbatim by both engines."""
    from padua_spark.operators.stats import ks_1samp

    e = _t(spark, sf, "events")
    return ks_1samp(e, "value", "uniform", {"a": 0.0, "b": 500.0})



_WEIBULL_FIT_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_type FROM events
),
u AS (
  SELECT user_id,
    min(tu) AS t0,
    max(tu) AS t_last,
    min(CASE WHEN event_type = 'error' THEN tu END) AS t_err
  FROM e GROUP BY user_id
),
subj AS (
  SELECT user_id % 2 AS cohort,
    CASE WHEN t_err IS NOT NULL
      THEN CAST(floor((t_err - t0) / 3600000000.0) AS BIGINT)
      ELSE CAST(floor((t_last - t0) / 3600000000.0) AS BIGINT)
    END AS dur,
    CASE WHEN t_err IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM u
),
counts AS (
  SELECT cohort, CAST(dur AS DOUBLE) AS t,
    CAST(sum(ev) AS BIGINT) AS n_events,
    CAST(sum(1 - ev) AS BIGINT) AS n_censored
  FROM subj GROUP BY 1, 2
),
risk AS (
  SELECT *,
    CAST(sum(n_events + n_censored) OVER (PARTITION BY cohort)
      - (sum(n_events + n_censored) OVER (PARTITION BY cohort ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - n_events - n_censored) AS BIGINT) AS n_risk
  FROM counts
),
f AS (
  SELECT *,
    CASE WHEN n_events > 0
          AND CAST(n_risk - n_events AS DOUBLE) / n_risk > 0
      THEN ln(CAST(n_risk - n_events AS DOUBLE) / n_risk)
      ELSE 0.0 END AS lnf,
    CASE WHEN n_events > 0
          AND CAST(n_risk - n_events AS DOUBLE) / n_risk <= 0
      THEN 1 ELSE 0 END AS zf
  FROM risk
),
s AS (
  SELECT cohort, t, n_events,
    CASE WHEN max(zf) OVER (PARTITION BY cohort ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
      THEN 0.0
      ELSE exp(sum(lnf) OVER (PARTITION BY cohort ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) END
      AS survival
  FROM f
),
pts AS (
  SELECT cohort, ln(t) AS x, ln(-ln(survival)) AS y
  FROM s
  WHERE n_events > 0 AND survival > 0 AND survival < 1 AND t > 0
),
agg AS (
  SELECT cohort, CAST(count(*) AS BIGINT) AS n_points,
    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx0,
    sum(y * y) AS syy0, sum(x * y) AS sxy0
  FROM pts GROUP BY 1
),
fit AS (
  SELECT CAST(cohort AS BIGINT) AS cohort, n_points,
    n_points * sxx0 - sx * sx AS sxx,
    n_points * syy0 - sy * sy AS syy,
    n_points * sxy0 - sx * sy AS sxy,
    sx, sy
  FROM agg
),
fin AS (
  SELECT cohort, n_points,
    CASE WHEN n_points > 1 AND sxx > 0 THEN sxy / sxx END AS slope,
    sxx, syy, sxy, sx, sy
  FROM fit
)
SELECT cohort, n_points,
  round(slope, 6) AS shape,
  round(CASE WHEN slope IS NOT NULL AND abs(slope) > 1e-12
    THEN exp(-((sy - slope * sx) / n_points) / slope) END, 6)
    AS scale,
  round(CASE WHEN sxx > 0 AND syy > 0
    THEN sxy * sxy / (sxx * syy) END, 6) AS r_squared
FROM fin
"""


@_q("weibull_fit", _WEIBULL_FIT_ORACLE)
def q_weibull_fit(spark, sf):
    """Weibull probability-plot fit of the time-to-first-error KM
    curve per cohort (stats.weibull_fit_km): the closed-form
    linearized shape/scale/R^2 on top of the shared KM pipeline —
    no iterative MLE, so the full parametric fit is value-checked."""
    from padua_spark.operators.stats import weibull_fit_km
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_type",
    )
    u = ev.groupBy("user_id").agg(
        F.min("_tu").alias("_t0"),
        F.max("_tu").alias("_tl"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("_tu"))
        ).alias("_te"),
    )
    subj = u.select(
        (F.col("user_id") % 2).alias("cohort"),
        F.floor(
            (
                F.coalesce(F.col("_te"), F.col("_tl")) - F.col("_t0")
            ).cast("double")
            / F.lit(3600000000.0)
        ).cast("bigint").alias("dur"),
        F.when(F.col("_te").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    return weibull_fit_km(subj, ["cohort"], "dur", "ev")



_WASSERSTEIN_ORACLE = """
WITH per AS (
  SELECT v, CAST(count(*) FILTER (g = 'A') AS BIGINT) AS ca,
    CAST(count(*) FILTER (g = 'R') AS BIGINT) AS cb
  FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS v, l_returnflag AS g
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL
          AND l_returnflag IN ('A', 'R'))
  GROUP BY 1
),
cum AS (
  SELECT v,
    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fa,
    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fb,
    sum(ca) OVER () AS na, sum(cb) OVER () AS nb,
    lead(v) OVER (ORDER BY v) AS vnext
  FROM per
),
agg AS (
  SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
    sum(CASE WHEN vnext IS NOT NULL THEN
      abs(CAST(fa AS DOUBLE) / na - CAST(fb AS DOUBLE) / nb)
      * (vnext - v) END) AS w1,
    sum(CASE WHEN vnext IS NOT NULL THEN
      (CAST(fa AS DOUBLE) / na - CAST(fb AS DOUBLE) / nb)
      * (CAST(fa AS DOUBLE) / na - CAST(fb AS DOUBLE) / nb)
      * (vnext - v) END) AS e2
  FROM cum
)
SELECT n_a, n_b,
  round(w1, 6) AS wasserstein_1,
  round(sqrt(2.0 * e2), 6) AS energy_distance
FROM agg
"""


@_q("wasserstein_1d", _WASSERSTEIN_ORACLE)
def q_wasserstein_1d(spark, sf):
    """Exact 1-D Wasserstein-1 and energy distance between the A and
    R extended-price distributions (stats.distribution_distances_1d):
    per-group ECDFs from the shared distributed stepped cumsum,
    adjacent-value gaps via range partition + boundary stitching —
    no global sort."""
    from padua_spark.operators.stats import distribution_distances_1d

    li = _t(spark, sf, "lineitem")
    return distribution_distances_1d(
        li, "l_returnflag", "l_extendedprice", "A", "R"
    )



_JS_HELLINGER_ORACLE = r"""
WITH tok AS (
  SELECT source AS grp,
    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents
),
per AS (
  SELECT grp, token, count(*) AS n_st FROM tok
  WHERE token <> '' GROUP BY 1, 2
),
corpus AS (SELECT token, sum(n_st) AS n_t FROM per GROUP BY 1),
top AS (
  SELECT token, n_t FROM corpus ORDER BY n_t DESC, token LIMIT 100
),
totals AS (
  SELECT grp, CAST(sum(n_st) AS BIGINT) AS n_s FROM per GROUP BY 1
),
grand AS (SELECT sum(n_st) AS n_total FROM per),
grid AS (
  SELECT t.grp, t.n_s, p.token, p.n_t, g.n_total,
    coalesce(x.n_st, 0) AS n_st
  FROM totals t CROSS JOIN top p CROSS JOIN grand g
  LEFT JOIN per x ON x.grp = t.grp AND x.token = p.token
),
terms AS (
  SELECT grp, n_s,
    CAST(n_st AS DOUBLE) / n_s AS p,
    CAST(n_t AS DOUBLE) / n_total AS q
  FROM grid
),
sums AS (
  SELECT grp,
    sum(CASE WHEN p > 0
        THEN 0.5 * p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END
        + 0.5 * q * ln(q / ((p + q) / 2.0))) AS js_sup,
    sum(sqrt(p * q)) AS bc_sup,
    greatest(0.0, 1.0 - sum(p)) AS p_o,
    greatest(0.0, 1.0 - sum(q)) AS q_o,
    CAST(max(n_s) AS BIGINT) AS n_tokens
  FROM terms GROUP BY grp
)
SELECT grp AS source,
  round(js_sup
    + CASE WHEN p_o > 0
        THEN 0.5 * p_o * ln(p_o / ((p_o + q_o) / 2.0))
        ELSE 0.0 END
    + CASE WHEN q_o > 0
        THEN 0.5 * q_o * ln(q_o / ((p_o + q_o) / 2.0))
        ELSE 0.0 END, 6) AS js_divergence,
  round(sqrt(greatest(0.0,
    1.0 - (bc_sup + sqrt(p_o * q_o)))), 6) AS hellinger,
  n_tokens
FROM sums
"""


@_q("js_hellinger", _JS_HELLINGER_ORACLE)
def q_js_hellinger(spark, sf):
    """Symmetric bounded drift metrics per source: Jensen-Shannon and
    Hellinger against the corpus top-100 token distribution
    (text.token_distribution_divergences): the explicit support grid
    keeps absent tokens' exact q-side mass."""
    from padua_spark.extensions.text import (
        token_distribution_divergences,
    )

    d = _t(spark, sf, "documents")
    return token_distribution_divergences(
        d, "source", "text", top_n=100
    )



_RFM_ORACLE = """
WITH e AS (
  SELECT user_id AS u, epoch_us(ts) AS ts,
    CAST(round(CAST(value AS DOUBLE) * 100) AS DOUBLE) AS amt
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
users AS (
  SELECT u,
    CAST((SELECT max(ts) FROM e) - max(ts) AS DOUBLE) AS r,
    CAST(count(*) AS DOUBLE) AS f,
    CAST(sum(coalesce(amt, 0.0)) AS DOUBLE) AS m
  FROM e GROUP BY 1
),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM users),
qr AS (
  SELECT
    min(CASE WHEN cum >= ceil(0.2 * n) THEN v END) AS b0,
    min(CASE WHEN cum >= ceil(0.4 * n) THEN v END) AS b1,
    min(CASE WHEN cum >= ceil(0.6 * n) THEN v END) AS b2,
    min(CASE WHEN cum >= ceil(0.8 * n) THEN v END) AS b3
  FROM (
    SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      AS cum
    FROM (SELECT r AS v, count(*) AS c FROM users GROUP BY 1)
  ), nb
),
qf AS (
  SELECT
    min(CASE WHEN cum >= ceil(0.2 * n) THEN v END) AS b0,
    min(CASE WHEN cum >= ceil(0.4 * n) THEN v END) AS b1,
    min(CASE WHEN cum >= ceil(0.6 * n) THEN v END) AS b2,
    min(CASE WHEN cum >= ceil(0.8 * n) THEN v END) AS b3
  FROM (
    SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      AS cum
    FROM (SELECT f AS v, count(*) AS c FROM users GROUP BY 1)
  ), nb
),
qm AS (
  SELECT
    min(CASE WHEN cum >= ceil(0.2 * n) THEN v END) AS b0,
    min(CASE WHEN cum >= ceil(0.4 * n) THEN v END) AS b1,
    min(CASE WHEN cum >= ceil(0.6 * n) THEN v END) AS b2,
    min(CASE WHEN cum >= ceil(0.8 * n) THEN v END) AS b3
  FROM (
    SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      AS cum
    FROM (SELECT m AS v, count(*) AS c FROM users GROUP BY 1)
  ), nb
),
scored AS (
  SELECT u, m,
    6 - (1 + CASE WHEN r > qr.b0 THEN 1 ELSE 0 END
           + CASE WHEN r > qr.b1 THEN 1 ELSE 0 END
           + CASE WHEN r > qr.b2 THEN 1 ELSE 0 END
           + CASE WHEN r > qr.b3 THEN 1 ELSE 0 END) AS r_score,
    1 + CASE WHEN f > qf.b0 THEN 1 ELSE 0 END
      + CASE WHEN f > qf.b1 THEN 1 ELSE 0 END
      + CASE WHEN f > qf.b2 THEN 1 ELSE 0 END
      + CASE WHEN f > qf.b3 THEN 1 ELSE 0 END AS f_score,
    1 + CASE WHEN m > qm.b0 THEN 1 ELSE 0 END
      + CASE WHEN m > qm.b1 THEN 1 ELSE 0 END
      + CASE WHEN m > qm.b2 THEN 1 ELSE 0 END
      + CASE WHEN m > qm.b3 THEN 1 ELSE 0 END AS m_score
  FROM users, qr, qf, qm
)
SELECT r_score, f_score, m_score,
  CAST(count(*) AS BIGINT) AS n_users,
  round(sum(m), 6) AS total_monetary,
  round(avg(m), 6) AS avg_monetary
FROM scored GROUP BY 1, 2, 3
"""


@_q("rfm_segments", _RFM_ORACLE)
def q_rfm_segments(spark, sf):
    """RFM customer-value grid over event history
    (features.rfm_segments): exact distributed quintile boundaries
    from the stepped cumsum — no ntile sort of the user frame;
    monetary pre-scaled to exact integer cents so boundary
    comparisons are engine-identical."""
    from padua_spark.extensions.features import rfm_segments
    from padua_spark.streaming.windows import epoch_us_col

    e = _t(spark, sf, "events")
    base = e.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id",
        epoch_us_col(e, "ts").alias("_tu"),
        F.round(F.col("value").cast("double") * 100)
        .cast("double").alias("_amt"),
    )
    return rfm_segments(base, "user_id", "_tu", "_amt")



def _norm_ppf_sql(p: str) -> str:
    """Acklam inverse-normal twin of stats.norm_ppf_col — identical
    coefficients and branch structure, so both engines agree to the
    approximation's own 1.2e-9."""
    a = ("-3.969683028665376e+01", "2.209460984245205e+02",
         "-2.759285104469687e+02", "1.383577518672690e+02",
         "-3.066479806614716e+01", "2.506628277459239e+00")
    b = ("-5.447609879822406e+01", "1.615858368580409e+02",
         "-1.556989798598866e+02", "6.680131188771972e+01",
         "-1.328068155288572e+01")
    c = ("-7.784894002430293e-03", "-3.223964580411365e-01",
         "-2.400758277161838e+00", "-2.549732539343734e+00",
         "4.374664141464968e+00", "2.938163982698783e+00")
    d = ("7.784695709041462e-03", "3.224671290700398e-01",
         "2.445134137142996e+00", "3.754408661907416e+00")

    def tail(q):
        num = f"((((({c[0]} * {q} + {c[1]}) * {q} + {c[2]}) * {q} + {c[3]}) * {q} + {c[4]}) * {q} + {c[5]})"
        den = f"(((({d[0]} * {q} + {d[1]}) * {q} + {d[2]}) * {q} + {d[3]}) * {q} + 1.0)"
        return f"({num} / {den})"

    ql = f"sqrt(-2.0 * ln({p}))"
    qh = f"sqrt(-2.0 * ln(1.0 - ({p})))"
    r = f"((({p}) - 0.5) * (({p}) - 0.5))"
    num_c = f"((((({a[0]} * {r} + {a[1]}) * {r} + {a[2]}) * {r} + {a[3]}) * {r} + {a[4]}) * {r} + {a[5]}) * (({p}) - 0.5)"
    den_c = f"((((({b[0]} * {r} + {b[1]}) * {r} + {b[2]}) * {r} + {b[3]}) * {r} + {b[4]}) * {r} + 1.0)"
    return (
        f"(CASE WHEN ({p}) > 0 AND ({p}) < 0.02425 THEN {tail(ql)} "
        f"WHEN ({p}) >= 0.02425 AND ({p}) <= 0.97575 "
        f"THEN ({num_c}) / ({den_c}) "
        f"WHEN ({p}) > 0.97575 AND ({p}) < 1 THEN -{tail(qh)} END)"
    )


def _vdw_oracle() -> str:
    score = _norm_ppf_sql("mr / (nt + 1.0)")
    return f"""
WITH per AS (
  SELECT v,
    CAST(count(*) FILTER (g = 'A') AS BIGINT) AS c0,
    CAST(count(*) FILTER (g = 'N') AS BIGINT) AS c1,
    CAST(count(*) FILTER (g = 'R') AS BIGINT) AS c2
  FROM (SELECT CAST(l_quantity AS DOUBLE) AS v, l_returnflag AS g
        FROM lineitem
        WHERE l_quantity IS NOT NULL
          AND l_returnflag IN ('A', 'N', 'R'))
  GROUP BY 1
),
cum AS (
  SELECT c0, c1, c2, c0 + c1 + c2 AS ct,
    sum(c0 + c1 + c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      AS f,
    CAST(sum(c0 + c1 + c2) OVER () AS DOUBLE) AS nt,
    CAST(sum(c0) OVER () AS DOUBLE) AS n0,
    CAST(sum(c1) OVER () AS DOUBLE) AS n1,
    CAST(sum(c2) OVER () AS DOUBLE) AS n2
  FROM per
),
sc AS (
  SELECT *, (2.0 * (f - ct) + ct + 1.0) / 2.0 AS mr FROM cum
),
scored AS (SELECT *, {score} AS a FROM sc),
agg AS (
  SELECT CAST(max(nt) AS BIGINT) AS n_total,
    sum(ct * a * a) AS saa,
    sum(c0 * a) AS s0, sum(c1 * a) AS s1, sum(c2 * a) AS s2,
    max(n0) AS n0, max(n1) AS n1, max(n2) AS n2, max(nt) AS nt
  FROM scored
)
SELECT n_total, CAST(3 AS BIGINT) AS k_groups,
  round(CASE WHEN nt > 1 AND saa / (nt - 1.0) > 0 THEN
    (n0 * (s0 / n0) * (s0 / n0)
     + n1 * (s1 / n1) * (s1 / n1)
     + n2 * (s2 / n2) * (s2 / n2)) / (saa / (nt - 1.0)) END, 6)
    AS vdw_stat,
  CAST(2.0 AS DOUBLE) AS dfree
FROM agg
"""


@_q("van_der_waerden", _vdw_oracle())
def q_van_der_waerden(spark, sf):
    """Van der Waerden normal-scores test across the three return
    flags on quantity (stats.van_der_waerden): pooled midranks from
    one stepped cumsum, native Acklam inverse-normal scores — both
    engines run the identical rational approximation; chi2 p pruned
    (vectorized UDF side)."""
    from padua_spark.operators.stats import van_der_waerden

    li = _t(spark, sf, "lineitem")
    out = van_der_waerden(
        li, "l_returnflag", "l_quantity", ["A", "N", "R"]
    )
    return out.select("n_total", "k_groups", "vdw_stat", "dfree")


def _fk_oracle() -> str:
    score = _norm_ppf_sql("0.5 + mr / (2.0 * (nt + 1.0))")
    return f"""
WITH base AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS x
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_returnflag IN ('A', 'N', 'R')
),
meds AS (SELECT g, median(x) AS med FROM base GROUP BY 1),
dev AS (
  SELECT base.g, abs(base.x - meds.med) AS z
  FROM base JOIN meds USING (g)
),
per AS (
  SELECT z AS v,
    CAST(count(*) FILTER (g = 'A') AS BIGINT) AS c0,
    CAST(count(*) FILTER (g = 'N') AS BIGINT) AS c1,
    CAST(count(*) FILTER (g = 'R') AS BIGINT) AS c2
  FROM dev GROUP BY 1
),
cum AS (
  SELECT c0, c1, c2, c0 + c1 + c2 AS ct,
    sum(c0 + c1 + c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      AS f,
    CAST(sum(c0 + c1 + c2) OVER () AS DOUBLE) AS nt,
    CAST(sum(c0) OVER () AS DOUBLE) AS n0,
    CAST(sum(c1) OVER () AS DOUBLE) AS n1,
    CAST(sum(c2) OVER () AS DOUBLE) AS n2
  FROM per
),
sc AS (
  SELECT *, (2.0 * (f - ct) + ct + 1.0) / 2.0 AS mr FROM cum
),
scored AS (SELECT *, {score} AS a FROM sc),
agg AS (
  SELECT CAST(max(nt) AS BIGINT) AS n_total,
    sum(ct * a) AS sa, sum(ct * a * a) AS saa,
    sum(c0 * a) AS s0, sum(c1 * a) AS s1, sum(c2 * a) AS s2,
    max(n0) AS n0, max(n1) AS n1, max(n2) AS n2, max(nt) AS nt
  FROM scored
),
fin AS (
  SELECT n_total, nt, n0, n1, n2, s0, s1, s2,
    sa / nt AS abar,
    (saa - sa * sa / nt) / (nt - 1.0) AS s2v
  FROM agg
)
SELECT n_total, CAST(3 AS BIGINT) AS k_groups,
  round(CASE WHEN nt > 1 AND s2v > 0 THEN
    (n0 * (s0 / n0 - abar) * (s0 / n0 - abar)
     + n1 * (s1 / n1 - abar) * (s1 / n1 - abar)
     + n2 * (s2 / n2 - abar) * (s2 / n2 - abar)) / s2v END, 6)
    AS fk_stat,
  CAST(2.0 AS DOUBLE) AS dfree
FROM fin
"""


@_q("fligner_killeen", _fk_oracle())
def q_fligner_killeen(spark, sf):
    """Fligner-Killeen variance-homogeneity test across the three
    return flags on quantity (stats.fligner_killeen): exact group
    medians, pooled |deviation| midranks from one stepped cumsum,
    half-normal Acklam scores; chi2 p pruned (vectorized UDF side)."""
    from padua_spark.operators.stats import fligner_killeen

    li = _t(spark, sf, "lineitem")
    out = fligner_killeen(
        li, "l_returnflag", "l_quantity", ["A", "N", "R"]
    )
    return out.select("n_total", "k_groups", "fk_stat", "dfree")



def _ppcc_oracle() -> str:
    score = _norm_ppf_sql("(mr - 0.3175) / (nt + 0.365)")
    return f"""
WITH per AS (
  SELECT CAST(value AS DOUBLE) AS v,
    CAST(count(*) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT v, c,
    sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f,
    CAST(sum(c) OVER () AS DOUBLE) AS nt
  FROM per
),
sc AS (
  SELECT v, c, nt, (2.0 * (f - c) + c + 1.0) / 2.0 AS mr FROM cum
),
scored AS (SELECT v, c, nt, {score} AS m FROM sc),
agg AS (
  SELECT CAST(max(nt) AS BIGINT) AS n,
    sum(c * v) AS sx, sum(c * m) AS sm,
    sum(c * v * v) AS sxx, sum(c * m * m) AS smm,
    sum(c * v * m) AS sxm, max(nt) AS nt
  FROM scored
)
SELECT n,
  round(CASE WHEN sqrt((nt * sxx - sx * sx) * (nt * smm - sm * sm))
          > 0
    THEN (nt * sxm - sx * sm)
         / sqrt((nt * sxx - sx * sx) * (nt * smm - sm * sm)) END, 6)
    AS ppcc,
  round(CASE WHEN sqrt((nt * sxx - sx * sx) * (nt * smm - sm * sm))
          > 0
    THEN power((nt * sxm - sx * sm)
         / sqrt((nt * sxx - sx * sx) * (nt * smm - sm * sm)), 2)
    END, 6) AS shapiro_francia_w
FROM agg
"""


@_q("normality_ppcc", _ppcc_oracle())
def q_normality_ppcc(spark, sf):
    """Filliben probability-plot correlation normality test on event
    values (stats.normality_ppcc): midrank plotting positions, native
    Acklam inverse-normal order-statistic medians, count-weighted
    correlation from one stepped-cumsum pass."""
    from padua_spark.operators.stats import normality_ppcc

    e = _t(spark, sf, "events")
    return normality_ppcc(e, "value")


_MOMENTS_CTE = """
WITH a AS (
  SELECT l_returnflag AS grp, CAST(count(*) AS BIGINT) AS n,
    sum(l_quantity) AS s1,
    sum(l_quantity * l_quantity) AS s2,
    sum(l_quantity * l_quantity * l_quantity) AS s3,
    sum(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1
),
m AS (
  SELECT grp, n, CAST(n AS DOUBLE) AS nd, s1 / CAST(n AS DOUBLE) AS mu,
    s2 / CAST(n AS DOUBLE)
      - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) AS m2,
    s3 / CAST(n AS DOUBLE)
      - 3.0 * (s1 / CAST(n AS DOUBLE)) * s2 / CAST(n AS DOUBLE)
      + 2.0 * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE))
            * (s1 / CAST(n AS DOUBLE)) AS m3,
    s4 / CAST(n AS DOUBLE)
      - 4.0 * (s1 / CAST(n AS DOUBLE)) * s3 / CAST(n AS DOUBLE)
      + 6.0 * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE))
            * s2 / CAST(n AS DOUBLE)
      - 3.0 * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE))
            * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) AS m4
  FROM a
)
"""

_JARQUE_BERA_ORACLE = _MOMENTS_CTE + """
, g AS (
  SELECT grp, n, nd, m3 / pow(m2, 1.5) AS g1,
    m4 / (m2 * m2) AS g2
  FROM m WHERE n >= 2 AND m2 > 0
),
j AS (
  SELECT grp, n, g1, g2,
    nd / 6.0 * (g1 * g1 + (g2 - 3.0) * (g2 - 3.0) / 4.0) AS jb
  FROM g
)
SELECT grp AS l_returnflag, n,
  round(g1, 6) AS skewness, round(g2, 6) AS kurtosis,
  round(jb, 6) AS jb_stat, round(exp(-jb / 2.0), 6) AS p_value
FROM j
"""


@_q("jarque_bera", _JARQUE_BERA_ORACLE)
def q_jarque_bera(spark, sf):
    """Jarque-Bera moments-only normality per return flag
    (stats.jarque_bera): one aggregation to exact integer power sums,
    chi2(2) survival in closed form."""
    from padua_spark.operators.stats import jarque_bera

    li = _t(spark, sf, "lineitem")
    return jarque_bera(li, ["l_returnflag"], "l_quantity")


_DAGOSTINO_ORACLE = _MOMENTS_CTE + """
, g AS (
  SELECT grp, n, nd, m3 / pow(m2, 1.5) AS b1,
    m4 / (m2 * m2) AS b2
  FROM m WHERE m2 > 0
),
sk AS (
  SELECT *,
    b1 * sqrt((nd + 1.0) * (nd + 3.0) / (6.0 * (nd - 2.0))) AS y0,
    3.0 * (nd * nd + 27.0 * nd - 70.0) * (nd + 1.0) * (nd + 3.0)
      / ((nd - 2.0) * (nd + 5.0) * (nd + 7.0) * (nd + 9.0)) AS beta2
  FROM g
),
sk2 AS (
  SELECT *, -1.0 + sqrt(2.0 * (beta2 - 1.0)) AS w2,
    CASE WHEN y0 = 0.0 THEN 1.0 ELSE y0 END AS y
  FROM sk
),
sk3 AS (
  SELECT *, 1.0 / sqrt(0.5 * ln(w2)) AS delta,
    sqrt(2.0 / (w2 - 1.0)) AS alpha
  FROM sk2
),
z1t AS (
  SELECT *, CASE WHEN n >= 8 THEN
    delta * ln(y / alpha + sqrt((y / alpha) * (y / alpha) + 1.0))
    END AS z1
  FROM sk3
),
kt AS (
  SELECT *,
    3.0 * (nd - 1.0) / (nd + 1.0) AS eb2,
    24.0 * nd * (nd - 2.0) * (nd - 3.0)
      / ((nd + 1.0) * (nd + 1.0) * (nd + 3.0) * (nd + 5.0)) AS vb2,
    6.0 * (nd * nd - 5.0 * nd + 2.0) / ((nd + 7.0) * (nd + 9.0))
      * sqrt(6.0 * (nd + 3.0) * (nd + 5.0)
             / (nd * (nd - 2.0) * (nd - 3.0))) AS sb1
  FROM z1t
),
kt2 AS (
  SELECT *, (b2 - eb2) / sqrt(vb2) AS x,
    6.0 + 8.0 / sb1 * (2.0 / sb1 + sqrt(1.0 + 4.0 / (sb1 * sb1)))
      AS aa
  FROM kt
),
kt3 AS (
  SELECT *, 1.0 - 2.0 / (9.0 * aa) AS term1,
    1.0 + x * sqrt(2.0 / (aa - 4.0)) AS denom
  FROM kt2
),
z2t AS (
  SELECT *, CASE WHEN n >= 5 THEN
    (term1 - CASE WHEN denom = 0.0 THEN NULL ELSE
       sign(denom) * pow((1.0 - 2.0 / aa) / abs(denom),
                         CAST(1.0 AS DOUBLE) / 3.0) END)
    / sqrt(2.0 / (9.0 * aa))
    END AS z2
  FROM kt3
)
SELECT grp AS l_returnflag, n,
  round(z1, 6) AS z_skew, round(z2, 6) AS z_kurt,
  round(z1 * z1 + z2 * z2, 6) AS k2_stat,
  round(exp(-(z1 * z1 + z2 * z2) / 2.0), 6) AS p_value
FROM z2t
"""


@_q("dagostino_k2", _DAGOSTINO_ORACLE)
def q_dagostino_k2(spark, sf):
    """D'Agostino-Pearson K2 omnibus normality per return flag
    (stats.dagostino_k2): scipy's finite-sample skew/kurtosis Z
    transforms on the same exact power sums as jarque_bera."""
    from padua_spark.operators.stats import dagostino_k2

    li = _t(spark, sf, "lineitem")
    return dagostino_k2(li, ["l_returnflag"], "l_quantity")


_DURBIN_WATSON_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS grp, l_quantity AS v,
    v - lag(v) OVER (PARTITION BY l_returnflag
      ORDER BY l_shipdate, l_orderkey, l_linenumber, v) AS d
  FROM lineitem WHERE l_quantity IS NOT NULL
),
a AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
    sum(v) AS s1, sum(v * v) AS s2, sum(d * d) AS ssd
  FROM base GROUP BY 1
)
SELECT grp AS l_returnflag, n,
  round(CASE WHEN n >= 2
    AND s2 - s1 * s1 / CAST(n AS DOUBLE) > 0
    THEN ssd / (s2 - s1 * s1 / CAST(n AS DOUBLE)) END, 6) AS dw
FROM a
"""


@_q("durbin_watson", _DURBIN_WATSON_ORACLE)
def q_durbin_watson(spark, sf):
    """Durbin-Watson first-order autocorrelation of quantities per
    return flag, shipdate order (stats.durbin_watson): one lag window
    + one aggregation; the demeaning is algebraic so integer series
    are engine-exact."""
    from padua_spark.operators.stats import durbin_watson

    li = _t(spark, sf, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data:
    # the series value joins the order key so tie blocks carry equal
    # values and the lag sequence is deterministic on both engines
    return durbin_watson(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity",
    )


_RUNS_TEST_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS grp, l_shipdate, l_orderkey, l_linenumber,
    CAST(l_quantity AS DOUBLE) AS v
  FROM lineitem WHERE l_quantity IS NOT NULL
),
med AS (SELECT grp, median(v) AS m FROM base GROUP BY 1),
s AS (
  SELECT b.grp,
    CASE WHEN b.v > med.m THEN 1 ELSE 0 END AS sgn,
    CASE WHEN lag(CASE WHEN b.v > med.m THEN 1 ELSE 0 END) OVER w
         IS NULL THEN 1
      WHEN lag(CASE WHEN b.v > med.m THEN 1 ELSE 0 END) OVER w
         <> CASE WHEN b.v > med.m THEN 1 ELSE 0 END THEN 1
      ELSE 0 END AS new_run
  FROM base b JOIN med ON med.grp = b.grp
  WHERE b.v <> med.m
  WINDOW w AS (PARTITION BY b.grp
               ORDER BY b.l_shipdate, b.l_orderkey, b.l_linenumber,
                        b.v)
),
a AS (
  SELECT grp, CAST(sum(sgn) AS BIGINT) AS n1_above,
    CAST(sum(1 - sgn) AS BIGINT) AS n2_below,
    CAST(sum(new_run) AS BIGINT) AS n_runs
  FROM s GROUP BY 1
),
z0 AS (
  SELECT grp, n1_above, n2_below, n_runs,
    CAST(n1_above AS DOUBLE) AS n1, CAST(n2_below AS DOUBLE) AS n2,
    CAST(n1_above AS DOUBLE) + CAST(n2_below AS DOUBLE) AS nn
  FROM a
),
zz AS (
  SELECT grp, n1_above, n2_below, n_runs,
    CASE WHEN n1_above > 0 AND n2_below > 0
      AND 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
          / (nn * nn * (nn - 1.0)) > 0
    THEN (CAST(n_runs AS DOUBLE) - (2.0 * n1 * n2 / nn + 1.0))
      / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
             / (nn * nn * (nn - 1.0)))
    END AS z
  FROM z0
),
e AS (
  SELECT *, abs(z) / sqrt(2.0) AS x,
    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
  FROM zz
)
SELECT grp AS l_returnflag, n1_above, n2_below, n_runs,
  round(z, 6) AS z,
  round(CASE WHEN z IS NOT NULL THEN
    (0.254829592 * t + -0.284496736 * t * t
     + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
     + 1.061405429 * t * t * t * t * t) * exp(-x * x) END, 6)
    AS p_value
FROM e
"""


@_q("runs_test", _RUNS_TEST_ORACLE)
def q_runs_test(spark, sf):
    """Wald-Wolfowitz runs test of quantity above/below the exact
    group median, shipdate order (stats.runs_test): order-sensitive
    randomness check the distributional tests cannot see."""
    from padua_spark.operators.stats import runs_test

    li = _t(spark, sf, "lineitem")
    # same tie-block determinism trick as durbin_watson
    return runs_test(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity",
    )


def _sign_test_oracle(max_support: int = 200_000) -> str:
    # The fold's support is clamped to 0 in the normal regime so the
    # oracle mirrors the operator: no generate_series blow-up at big n
    lp_i = _log_choose_sql("ndc", "i") + " + ndc * ln(0.5)"
    lp_k = _log_choose_sql("ndc", "kc") + " + ndc * ln(0.5)"
    return f"""
WITH pairs AS (
  SELECT l_discount AS x, l_tax AS y FROM lineitem
  WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL
),
cnt AS (
  SELECT
    CAST(sum(CASE WHEN x > y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
    CAST(sum(CASE WHEN x < y THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
    CAST(sum(CASE WHEN x = y THEN 1 ELSE 0 END) AS BIGINT) AS n_tie
  FROM pairs
),
st AS (
  SELECT *, n_pos + n_neg AS nd,
    nd <= {int(max_support)} AS is_exact,
    CASE WHEN nd <= {int(max_support)} THEN nd
         ELSE CAST(0 AS BIGINT) END AS ndc,
    CASE WHEN nd <= {int(max_support)} THEN n_pos
         ELSE CAST(0 AS BIGINT) END AS kc
  FROM cnt
),
rows_i AS (
  SELECT st.*, unnest(generate_series(CAST(0 AS BIGINT), ndc)) AS i
  FROM st
),
terms AS (
  SELECT n_pos, n_neg, n_tie, nd, is_exact, ndc, kc, i,
    ({lp_i}) AS lp, ({lp_k}) AS lpk
  FROM rows_i
),
p AS (
  SELECT n_pos, n_neg, n_tie, max(nd) AS nd,
    bool_and(is_exact) AS is_exact,
    sum(CASE WHEN lp <= lpk + 9.999999505838704e-08
        THEN exp(lp) ELSE 0.0 END ORDER BY i) AS pt
  FROM terms GROUP BY 1, 2, 3
),
zt AS (
  SELECT *,
    greatest(0.0,
      abs(2.0 * CAST(n_pos AS DOUBLE) - CAST(nd AS DOUBLE)) - 1.0)
      / sqrt(CAST(nd AS DOUBLE)) AS z
  FROM p
),
e AS (
  SELECT *, z / sqrt(2.0) AS xx,
    1.0 / (1.0 + 0.3275911 * (z / sqrt(2.0))) AS t
  FROM zt
)
SELECT n_pos, n_neg, n_tie,
  CASE WHEN is_exact THEN 'exact' ELSE 'normal' END AS method,
  round(CASE WHEN nd <= 0 THEN 1.0
             WHEN is_exact THEN least(pt, 1.0)
             ELSE least(
    (0.254829592 * t + -0.284496736 * t * t
     + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
     + 1.061405429 * t * t * t * t * t) * exp(-xx * xx), 1.0) END, 6)
    AS p_value
FROM e
"""


@_q("sign_test", _sign_test_oracle())
def q_sign_test(spark, sf):
    """Paired sign test, discount vs tax per lineitem
    (stats.sign_test): one aggregation to the sign counts, the shared
    bounded binomial tail fold below max_support, the
    continuity-corrected normal z above it (the sf0.1 bench regime —
    541,763 non-tied pairs)."""
    from padua_spark.operators.stats import sign_test

    li = _t(spark, sf, "lineitem")
    return sign_test(li, "l_discount", "l_tax")


@_q("sign_test_normal", _sign_test_oracle(max_support=1_000))
def q_sign_test_normal(spark, sf):
    """The sign test's LARGE-N branch, forced at oracle scale with a
    small max_support (stats.sign_test): gates the
    continuity-corrected normal z + A&S-erfc p and the method column
    against the same SQL twin — the branch the sf0.1/sf1 bench
    exercises for real."""
    from padua_spark.operators.stats import sign_test

    li = _t(spark, sf, "lineitem")
    return sign_test(li, "l_discount", "l_tax", max_support=1_000)


_ORDINAL_ASSOC_ORACLE = """
WITH cells AS (
  SELECT l_quantity AS x, l_linenumber AS y,
    CAST(count(*) AS BIGINT) AS c
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_linenumber IS NOT NULL
  GROUP BY 1, 2
),
cd AS (
  SELECT
    CAST(coalesce(sum(CASE WHEN b.y > a.y THEN a.c * b.c END), 0)
      AS BIGINT) AS cs,
    CAST(coalesce(sum(CASE WHEN b.y < a.y THEN a.c * b.c END), 0)
      AS BIGINT) AS ds
  FROM cells a JOIN cells b ON b.x > a.x
),
t AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
    CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT) AS scc
  FROM cells
),
tx AS (
  SELECT CAST(sum(CAST(r AS HUGEINT) * r) AS BIGINT) AS sxx
  FROM (SELECT sum(c) AS r FROM cells GROUP BY x)
),
ty AS (
  SELECT CAST(sum(CAST(r AS HUGEINT) * r) AS BIGINT) AS syy
  FROM (SELECT sum(c) AS r FROM cells GROUP BY y)
),
z AS (
  SELECT n, cs, ds,
    CAST(cs AS DOUBLE) AS csd, CAST(ds AS DOUBLE) AS dsd,
    CAST(n AS DOUBLE) AS nd,
    CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0 AS n0,
    (CAST(sxx AS DOUBLE) - CAST(n AS DOUBLE)) / 2.0 AS t_x,
    (CAST(syy AS DOUBLE) - CAST(n AS DOUBLE)) / 2.0 AS t_y
  FROM cd, t, tx, ty
)
SELECT n, cs AS concordant, ds AS discordant,
  round(CASE WHEN csd + dsd > 0
    THEN (csd - dsd) / (csd + dsd) END, 6) AS gamma,
  round(CASE WHEN n0 - t_x > 0
    THEN (csd - dsd) / (n0 - t_x) END, 6) AS somers_d_yx,
  round(CASE WHEN n0 - t_y > 0
    THEN (csd - dsd) / (n0 - t_y) END, 6) AS somers_d_xy
FROM z
"""


@_q("ordinal_association", _ORDINAL_ASSOC_ORACLE)
def q_ordinal_association(spark, sf):
    """Goodman-Kruskal gamma + Somers' D of quantity vs linenumber
    (stats.ordinal_association): pairs never enumerated — cell-pair
    sums over the bounded contingency frame, exact integers
    throughout."""
    from padua_spark.operators.stats import ordinal_association

    li = _t(spark, sf, "lineitem")
    return ordinal_association(li, "l_quantity", "l_linenumber")


def _clustering_coef_oracle() -> str:
    return f"""
WITH mh AS ({_minhash_oracle()}),
e AS (
  SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
  FROM mh WHERE id_a <> id_b
),
deg AS (
  SELECT x, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
  GROUP BY x
),
o AS (
  SELECT
    CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
      THEN e.u ELSE e.v END AS s,
    CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
      THEN e.v ELSE e.u END AS t
  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
),
w AS (
  SELECT o1.s AS a, o1.t AS b, o2.t AS c
  FROM o o1 JOIN o o2 ON o1.t = o2.s
),
tri AS MATERIALIZED (
  SELECT a, b, c FROM w
  WHERE EXISTS (SELECT 1 FROM o WHERE o.s = w.a AND o.t = w.c)
),
per_node AS (
  SELECT x, CAST(count(*) AS BIGINT) AS t FROM (
    SELECT a AS x FROM tri
    UNION ALL SELECT b AS x FROM tri
    UNION ALL SELECT c AS x FROM tri
  ) GROUP BY x
)
SELECT deg.x AS node, deg.d AS degree,
  CAST(coalesce(per_node.t, 0) AS BIGINT) AS n_triangles,
  round(CASE WHEN deg.d >= 2 THEN
    2.0 * CAST(coalesce(per_node.t, 0) AS DOUBLE)
    / (CAST(deg.d AS DOUBLE) * (CAST(deg.d AS DOUBLE) - 1.0)) END, 6)
    AS clustering_coef
FROM deg LEFT JOIN per_node ON per_node.x = deg.x
"""


@_q("clustering_coefficient", _clustering_coef_oracle())
def q_clustering_coefficient(spark, sf):
    """Per-node local clustering coefficient of the MinHash candidate
    graph (graph.local_clustering): the node-level duplicate-clique
    triage — same skew-proof degree-oriented wedge join as
    triangle_count, each triangle crediting its three corners."""
    from padua_spark.extensions import dedup as x_dedup
    from padua_spark.extensions.graph import local_clustering

    d = _t(spark, sf, "documents")
    cand = x_dedup.minhash_lsh_candidates(
        d, "doc_id", "text", k_shingle=3, num_hashes=32, bands=8,
        portable_keys=True,
    )
    return local_clustering(cand, "id_a", "id_b")


def _assortativity_oracle() -> str:
    return f"""
WITH mh AS ({_minhash_oracle()}),
e AS (
  SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
  FROM mh WHERE id_a <> id_b
),
deg AS (
  SELECT x, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
  GROUP BY x
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_edges,
    CAST(sum(CAST(du.d AS HUGEINT) * dv.d) AS BIGINT) AS sxy,
    CAST(sum(CAST(du.d AS HUGEINT) + dv.d) AS BIGINT) AS s2,
    CAST(sum(CAST(du.d AS HUGEINT) * du.d
             + CAST(dv.d AS HUGEINT) * dv.d) AS BIGINT) AS ssq2
  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
z AS (
  SELECT n_nodes, n_edges,
    CAST(sxy AS DOUBLE) AS sxyd,
    CAST(s2 AS DOUBLE) / 2.0 / CAST(n_edges AS DOUBLE) AS sbar,
    CAST(ssq2 AS DOUBLE) / 2.0 / CAST(n_edges AS DOUBLE) AS ssq,
    CAST(n_edges AS DOUBLE) AS m
  FROM agg, nn
)
SELECT n_nodes, n_edges,
  round(CASE WHEN ssq - sbar * sbar > 0
    THEN (sxyd / m - sbar * sbar) / (ssq - sbar * sbar) END, 6)
    AS assortativity
FROM z
"""


@_q("assortativity", _assortativity_oracle())
def q_assortativity(spark, sf):
    """Degree assortativity of the MinHash candidate graph
    (graph.degree_assortativity): negative r flags star-shaped
    false-positive hubs; exact integer half-sums over each undirected
    edge once."""
    from padua_spark.extensions import dedup as x_dedup
    from padua_spark.extensions.graph import degree_assortativity

    d = _t(spark, sf, "documents")
    cand = x_dedup.minhash_lsh_candidates(
        d, "doc_id", "text", k_shingle=3, num_hashes=32, bands=8,
        portable_keys=True,
    )
    return degree_assortativity(cand, "id_a", "id_b")


_GAINS_ORACLE = """
WITH base AS (
  SELECT CAST(value AS DOUBLE) AS s,
    CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
q AS (
  SELECT
    min(CASE WHEN cum >= ceil(0.1 * n) THEN v END) AS b0,
    min(CASE WHEN cum >= ceil(0.2 * n) THEN v END) AS b1,
    min(CASE WHEN cum >= ceil(0.3 * n) THEN v END) AS b2,
    min(CASE WHEN cum >= ceil(0.4 * n) THEN v END) AS b3,
    min(CASE WHEN cum >= ceil(0.5 * n) THEN v END) AS b4,
    min(CASE WHEN cum >= ceil(0.6 * n) THEN v END) AS b5,
    min(CASE WHEN cum >= ceil(0.7 * n) THEN v END) AS b6,
    min(CASE WHEN cum >= ceil(0.8 * n) THEN v END) AS b7,
    min(CASE WHEN cum >= ceil(0.9 * n) THEN v END) AS b8
  FROM (
    SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      AS cum
    FROM (SELECT s AS v, count(*) AS c FROM base GROUP BY 1)
  ), nb
),
bucketed AS (
  SELECT 11 - (1
        + CASE WHEN s > q.b0 THEN 1 ELSE 0 END
        + CASE WHEN s > q.b1 THEN 1 ELSE 0 END
        + CASE WHEN s > q.b2 THEN 1 ELSE 0 END
        + CASE WHEN s > q.b3 THEN 1 ELSE 0 END
        + CASE WHEN s > q.b4 THEN 1 ELSE 0 END
        + CASE WHEN s > q.b5 THEN 1 ELSE 0 END
        + CASE WHEN s > q.b6 THEN 1 ELSE 0 END
        + CASE WHEN s > q.b7 THEN 1 ELSE 0 END
        + CASE WHEN s > q.b8 THEN 1 ELSE 0 END) AS bucket, y
  FROM base, q
),
pb AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS n_pos
  FROM bucketed GROUP BY 1
),
c AS (
  SELECT bucket, n, n_pos,
    CAST(sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
      AS DOUBLE) AS cum_n,
    CAST(sum(n_pos) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
      AS DOUBLE) AS cum_pos,
    CAST(sum(n) OVER () AS DOUBLE) AS tot_n,
    CAST(sum(n_pos) OVER () AS DOUBLE) AS tot_pos
  FROM pb
)
SELECT bucket, n, n_pos,
  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
  round(CASE WHEN tot_pos / tot_n > 0
    THEN (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
      / (tot_pos / tot_n) END, 6) AS lift,
  round(CASE WHEN tot_pos > 0 THEN cum_pos / tot_pos END, 6)
    AS cum_capture,
  round(CASE WHEN tot_pos / tot_n > 0
    THEN (cum_pos / cum_n) / (tot_pos / tot_n) END, 6) AS cum_lift
FROM c
"""


@_q("gains_table", _GAINS_ORACLE)
def q_gains_table(spark, sf):
    """Lift/gains deciles of event value as a score for engagement
    events (features.gains_table): exact stepped-cumsum quantile
    boundaries, bucket 1 = top scores, cumulative capture walking
    down."""
    from padua_spark.extensions.features import gains_table

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull()
    )
    e = e.select(
        F.col("value"),
        F.col("event_type").isin("click", "view")
        .cast("int").alias("label"),
    )
    return gains_table(e, "value", "label", n_bins=10)


_BRIER_ORACLE = """
WITH base AS (
  SELECT CAST(floor(value) AS DOUBLE) / 512.0 AS p,
    CASE WHEN event_type IN ('click', 'view')
      THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS y
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
    AND value >= 0
),
pb AS (
  SELECT least(9, CAST(floor(p * 10) AS INT)) AS b,
    CAST(count(*) AS BIGINT) AS nk,
    sum(p) AS sp, sum(y) AS sy,
    sum(p * p) AS spp, sum(p * y) AS spy
  FROM base GROUP BY 1
),
tot AS (
  SELECT CAST(sum(nk) AS BIGINT) AS n, sum(sp) AS tsp,
    sum(sy) AS tsy, sum(spp) AS tspp, sum(spy) AS tspy
  FROM pb
),
parts AS (
  SELECT
    sum(CAST(nk AS DOUBLE)
        * (sp / CAST(nk AS DOUBLE) - sy / CAST(nk AS DOUBLE))
        * (sp / CAST(nk AS DOUBLE) - sy / CAST(nk AS DOUBLE)))
      AS rel_num,
    sum(CAST(nk AS DOUBLE)
        * (sy / CAST(nk AS DOUBLE)
           - tot.tsy / CAST(tot.n AS DOUBLE))
        * (sy / CAST(nk AS DOUBLE)
           - tot.tsy / CAST(tot.n AS DOUBLE))) AS res_num
  FROM pb, tot
)
SELECT n,
  round((tspp - 2.0 * tspy + tsy) / CAST(n AS DOUBLE), 6) AS brier,
  round(rel_num / CAST(n AS DOUBLE), 6) AS reliability,
  round(res_num / CAST(n AS DOUBLE), 6) AS resolution,
  round(tsy / CAST(n AS DOUBLE)
        * (1.0 - tsy / CAST(n AS DOUBLE)), 6) AS uncertainty
FROM tot, parts
"""


@_q("brier_decomposition", _BRIER_ORACLE)
def q_brier_decomposition(spark, sf):
    """Murphy decomposition of the Brier score for a dyadic-exact
    pseudo-probability (floor(value)/512 — every sum is exact in
    doubles on both engines) against engagement labels
    (features.brier_decomposition)."""
    from padua_spark.extensions.features import brier_decomposition

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull() & (F.col("value") >= 0)
    )
    e = e.select(
        (F.floor(F.col("value")).cast("double") / 512.0).alias("p"),
        F.col("event_type").isin("click", "view")
        .cast("int").alias("y"),
    )
    return brier_decomposition(e, "p", "y", n_bins=10)


def _kfold_oracle() -> str:
    from padua_spark.extensions.sampling import kfold_assign_sql

    fold = kfold_assign_sql("event_id", 5, salt=7)
    return f"""
SELECT event_id, {fold} AS fold
FROM events WHERE event_id IS NOT NULL
"""


@_q("kfold_assign", _kfold_oracle())
def q_kfold_assign(spark, sf):
    """Deterministic 5-fold assignment keyed on event_id
    (sampling.kfold_assign): pure scan-level projection from the
    exact-integer LCG — identical on any engine, partitioning, or
    retry."""
    from padua_spark.extensions.sampling import kfold_assign

    e = _t(spark, sf, "events").where(F.col("event_id").isNotNull())
    return kfold_assign(e, "event_id", k=5, salt=7).select(
        "event_id", "fold"
    )


_ACF_PACF_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS grp, CAST(l_quantity AS DOUBLE) AS v,
    lag(CAST(l_quantity AS DOUBLE), 1) OVER w AS l1,
    lag(CAST(l_quantity AS DOUBLE), 2) OVER w AS l2,
    lag(CAST(l_quantity AS DOUBLE), 3) OVER w AS l3
  FROM lineitem WHERE l_quantity IS NOT NULL
  WINDOW w AS (PARTITION BY l_returnflag
               ORDER BY l_shipdate, l_orderkey, l_linenumber,
                        l_quantity)
),
a AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
    sum(v) AS s1, sum(v * v) AS s2,
    sum(v * l1) AS m1, sum(CASE WHEN l1 IS NOT NULL THEN v END) AS h1,
    sum(l1) AS t1, CAST(count(l1) AS BIGINT) AS nk1,
    sum(v * l2) AS m2, sum(CASE WHEN l2 IS NOT NULL THEN v END) AS h2,
    sum(l2) AS t2, CAST(count(l2) AS BIGINT) AS nk2,
    sum(v * l3) AS m3, sum(CASE WHEN l3 IS NOT NULL THEN v END) AS h3,
    sum(l3) AS t3, CAST(count(l3) AS BIGINT) AS nk3
  FROM base GROUP BY 1
),
mc AS (
  SELECT grp, n, CAST(n AS DOUBLE) AS nd, s1 / CAST(n AS DOUBLE) AS mu,
    s2 / CAST(n AS DOUBLE)
      - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) AS c0,
    (m1 - s1 / CAST(n AS DOUBLE) * (h1 + t1)
       + CAST(nk1 AS DOUBLE) * (s1 / CAST(n AS DOUBLE))
         * (s1 / CAST(n AS DOUBLE))) / CAST(n AS DOUBLE) AS c1,
    (m2 - s1 / CAST(n AS DOUBLE) * (h2 + t2)
       + CAST(nk2 AS DOUBLE) * (s1 / CAST(n AS DOUBLE))
         * (s1 / CAST(n AS DOUBLE))) / CAST(n AS DOUBLE) AS c2,
    (m3 - s1 / CAST(n AS DOUBLE) * (h3 + t3)
       + CAST(nk3 AS DOUBLE) * (s1 / CAST(n AS DOUBLE))
         * (s1 / CAST(n AS DOUBLE))) / CAST(n AS DOUBLE) AS c3
  FROM a
),
lev1 AS (SELECT *, c1 / c0 AS kk1 FROM mc),
lev1b AS (SELECT *, c0 * (1.0 - kk1 * kk1) AS v1 FROM lev1),
lev2 AS (SELECT *, (c2 - kk1 * c1) / v1 AS kk2 FROM lev1b),
lev2b AS (
  SELECT *, kk1 - kk2 * kk1 AS phi21,
    v1 * (1.0 - kk2 * kk2) AS v2
  FROM lev2
),
lev3 AS (
  SELECT *, (c3 - phi21 * c2 - kk2 * c1) / v2 AS kk3 FROM lev2b
)
SELECT grp AS l_returnflag, 1 AS lag,
  round(CASE WHEN c0 > 0 AND n > 1 THEN c1 / c0 END, 6) AS acf,
  round(CASE WHEN c0 > 0 AND n > 1 THEN kk1 END, 6) AS pacf
FROM lev3
UNION ALL
SELECT grp, 2,
  round(CASE WHEN c0 > 0 AND n > 2 THEN c2 / c0 END, 6),
  round(CASE WHEN c0 > 0 AND n > 2 THEN kk2 END, 6)
FROM lev3
UNION ALL
SELECT grp, 3,
  round(CASE WHEN c0 > 0 AND n > 3 THEN c3 / c0 END, 6),
  round(CASE WHEN c0 > 0 AND n > 3 THEN kk3 END, 6)
FROM lev3
"""


@_q("acf_pacf", _ACF_PACF_ORACLE)
def q_acf_pacf(spark, sf):
    """ACF + PACF through lag 3 of quantities per return flag in
    shipdate order (temporal.acf_pacf): algebraic autocovariances
    (no demeaned column), Levinson-Durbin unrolled as closed-form
    expressions — the ARIMA order diagnostic."""
    from padua_spark.operators.temporal import acf_pacf

    li = _t(spark, sf, "lineitem")
    # same tie-block determinism trick as durbin_watson
    return acf_pacf(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity", max_lag=3,
    )


_GRANGER_ORACLE = f"""
WITH RECURSIVE base AS (
  SELECT l_returnflag AS grp, CAST(l_quantity AS DOUBLE) AS y0,
    round(l_discount * 100) AS x0,
    l_shipdate, l_orderkey, l_linenumber
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
),
lagged AS (
  SELECT grp, y0 AS y,
    lag(y0) OVER w AS a, lag(x0) OVER w AS b
  FROM base
  WINDOW w AS (PARTITION BY grp
               ORDER BY l_shipdate, l_orderkey, l_linenumber, y0, x0)
),
f AS (SELECT * FROM lagged WHERE a IS NOT NULL AND b IS NOT NULL),
agg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
    sum(y) AS sy, sum(a) AS sa, sum(b) AS sb,
    sum(y * y) AS syy0, sum(a * a) AS saa0, sum(b * b) AS sbb0,
    sum(a * b) AS sab0, sum(a * y) AS say0, sum(b * y) AS sby0
  FROM f GROUP BY 1
),
cen AS (
  SELECT grp, n, CAST(n AS DOUBLE) AS nd,
    syy0 - sy * sy / CAST(n AS DOUBLE) AS syy,
    saa0 - sa * sa / CAST(n AS DOUBLE) AS saa,
    sbb0 - sb * sb / CAST(n AS DOUBLE) AS sbb,
    sab0 - sa * sb / CAST(n AS DOUBLE) AS sab,
    say0 - sa * sy / CAST(n AS DOUBLE) AS say,
    sby0 - sb * sy / CAST(n AS DOUBLE) AS sby
  FROM agg
),
sol AS (
  SELECT grp, n, nd, syy, saa, sbb, sab, say, sby,
    saa * sbb - sab * sab AS det
  FROM cen
),
fit AS (
  SELECT grp, n, nd, saa, det,
    (say * sbb - sby * sab) / det AS beta_a,
    (sby * saa - say * sab) / det AS beta_b,
    syy - say * say / saa AS rss_r,
    syy - (say * sbb - sby * sab) / det * say
        - (sby * saa - say * sab) / det * sby AS rss_u
  FROM sol
),
st AS (
  SELECT grp, n,
    CASE WHEN n >= 4 AND saa > 0 AND det > 0 AND rss_u > 0
      THEN beta_b END AS beta_x,
    CASE WHEN n >= 4 AND saa > 0 AND det > 0 AND rss_u > 0
      THEN (rss_r - rss_u) / (rss_u / (nd - 3.0)) END AS f_stat
  FROM fit
),
inp AS (
  SELECT grp AS key,
    CAST((CAST(n AS DOUBLE) - 3.0)
      / ((CAST(n AS DOUBLE) - 3.0) + 1.0 * f_stat) AS DOUBLE) AS x,
    CAST((CAST(n AS DOUBLE) - 3.0) / 2.0 AS DOUBLE) AS a,
    CAST(0.5 AS DOUBLE) AS b
  FROM st WHERE f_stat IS NOT NULL AND f_stat >= 0
),
{_betainc_chain_sql()}
SELECT st.grp AS l_returnflag, st.n,
  round(st.beta_x, 6) AS beta_x,
  round(st.f_stat, 6) AS f_stat,
  round(pv.p, 6) AS p_value
FROM st LEFT JOIN pv ON st.grp = pv.key
"""


@_q("granger_causality", _GRANGER_ORACLE)
def q_granger_causality(spark, sf):
    """Lag-1 Granger causality (does yesterday's discount signal
    predict today's quantity?) per return flag
    (temporal.granger_causality): both OLS fits closed-form from one
    window pass + one aggregation; F p-value via the shared
    incomplete beta."""
    from padua_spark.operators.temporal import granger_causality

    li = _t(spark, sf, "lineitem").withColumn(
        "_x100", F.round(F.col("l_discount") * 100)
    )
    # both series join the order key (tie blocks then carry equal
    # (y, x) pairs, making the lag sequence deterministic)
    return granger_causality(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity",
         "_x100"],
        "l_quantity", "_x100",
    )


_TEXTRANK_ORACLE = r"""
WITH RECURSIVE docs0 AS (
  SELECT doc_id,
    regexp_split_to_array(trim(lower(text)), '\s+') AS arr
  FROM documents WHERE text IS NOT NULL
),
tok AS (
  SELECT doc_id, i AS p, arr[i] AS tk
  FROM docs0, unnest(generate_series(1, len(arr))) AS g(i)
  WHERE length(arr[i]) >= 4
),
led AS (
  SELECT tk AS ta,
    lead(tk, 1) OVER (PARTITION BY doc_id ORDER BY p) AS tb1,
    lead(tk, 2) OVER (PARTITION BY doc_id ORDER BY p) AS tb2
  FROM tok
),
pairs AS (
  SELECT ta, tb1 AS tb FROM led WHERE tb1 IS NOT NULL
  UNION ALL
  SELECT ta, tb2 FROM led WHERE tb2 IS NOT NULL
),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT ta AS src, tb AS dst FROM pairs WHERE ta <> tb
    UNION ALL
    SELECT tb AS src, ta AS dst FROM pairs WHERE ta <> tb
  )
),
outdeg AS (SELECT src, count(*) AS o FROM edges GROUP BY 1),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges
    UNION ALL
    SELECT dst AS node FROM edges
  )
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
pr(it, node, rank) AS (
  SELECT 0, node, CAST(1.0 AS DOUBLE) / nn.n FROM nodes, nn
  UNION ALL
  SELECT p.it + 1, e.dst AS node,
    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
    + CAST(0.85 AS DOUBLE) * sum(p.rank / o.o)
  FROM (SELECT * FROM pr WHERE it < 5) p
  JOIN edges e ON e.src = p.node
  JOIN outdeg o ON o.src = p.node
  CROSS JOIN nn
  GROUP BY p.it, e.dst, nn.n
)
SELECT node AS token, round(rank, 9) AS rank FROM pr WHERE it = 5
"""


@_q("textrank_keywords", _TEXTRANK_ORACLE)
def q_textrank_keywords(spark, sf):
    """TextRank keyword centrality over the corpus co-occurrence
    graph (text.textrank_keywords): window-2 co-occurrence from ONE
    lead-window pass over the filtered token sequence, then the
    repo's fixed-iteration pagerank; the oracle replays the identical
    recurrence as a recursive CTE."""
    from padua_spark.extensions.text import textrank_keywords

    d = _t(spark, sf, "documents")
    return textrank_keywords(
        d, "doc_id", "text", window=2, min_chars=4, k_iters=5
    )


_CUZICK_ORACLE = """
WITH vals AS (
  SELECT l_returnflag AS g, l_quantity AS v
  FROM lineitem
  WHERE l_returnflag IN ('A', 'N', 'R') AND l_quantity IS NOT NULL
),
per AS (
  SELECT v,
    count(*) FILTER (WHERE g = 'A') AS c0,
    count(*) FILTER (WHERE g = 'N') AS c1,
    count(*) FILTER (WHERE g = 'R') AS c2,
    count(*) AS ct
  FROM vals GROUP BY v
),
run AS (
  SELECT *, sum(ct) OVER (ORDER BY v
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct_run
  FROM per
),
agg AS (
  SELECT
    sum(c0 * (2 * (ct_run - ct) + ct + 1)) AS r20,
    sum(c1 * (2 * (ct_run - ct) + ct + 1)) AS r21,
    sum(c2 * (2 * (ct_run - ct) + ct + 1)) AS r22,
    sum(c0) AS n0, sum(c1) AS n1, sum(c2) AS n2,
    sum(ct * ct * ct - ct) AS tie
  FROM run
),
st AS (
  SELECT CAST(n0 + n1 + n2 AS BIGINT) AS n_total,
    CAST(n0 + n1 + n2 AS DOUBLE) AS nd,
    1 * r20 + 2 * r21 + 3 * r22 AS two_l,
    1 * n0 + 2 * n1 + 3 * n2 AS szn,
    1 * n0 + 4 * n1 + 9 * n2 AS szzn,
    tie
  FROM agg
),
zc AS (
  SELECT n_total,
    CAST(two_l AS DOUBLE) / 2.0 AS l_stat,
    (CAST(two_l AS DOUBLE)
      - (nd + 1.0) * CAST(szn AS DOUBLE))
    / (2.0 * sqrt((nd + 1.0) / 12.0
        * (nd * CAST(szzn AS DOUBLE)
           - CAST(szn AS DOUBLE) * CAST(szn AS DOUBLE))
        * (1.0 - CAST(tie AS DOUBLE) / (nd * nd * nd - nd)))) AS z
  FROM st
),
e AS (
  SELECT *, abs(z) / sqrt(2.0) AS x,
    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
  FROM zc
)
SELECT n_total, CAST(3 AS BIGINT) AS k_groups,
  round(l_stat, 6) AS l_stat, round(z, 6) AS z,
  round((0.254829592 * t + -0.284496736 * t * t
         + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
         + 1.061405429 * t * t * t * t * t) * exp(-x * x), 6)
    AS p_value
FROM e
"""


@_q("cuzick_trend", _CUZICK_ORACLE)
def q_cuzick_trend(spark, sf):
    """Cuzick's nonparametric trend test across the ordered return
    flags A < N < R (stats.cuzick_trend): doubled midranks from the
    shared stepped cumsum keep 2L and 2E(L) exact integers."""
    from padua_spark.operators.stats import cuzick_trend

    li = _t(spark, sf, "lineitem")
    return cuzick_trend(
        li, "l_returnflag", "l_quantity", ["A", "N", "R"]
    )


_TOST_ORACLE = f"""
WITH RECURSIVE base AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS v
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_returnflag IN ('A', 'R')
),
agg AS (
  SELECT
    CAST(count(*) FILTER (WHERE g = 'A') AS BIGINT) AS n_a,
    CAST(count(*) FILTER (WHERE g = 'R') AS BIGINT) AS n_b,
    sum(v) FILTER (WHERE g = 'A') AS sa,
    sum(v) FILTER (WHERE g = 'R') AS sb,
    sum(v * v) FILTER (WHERE g = 'A') AS ssa,
    sum(v * v) FILTER (WHERE g = 'R') AS ssb
  FROM base
),
m AS (
  SELECT n_a, n_b,
    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
    sa / CAST(n_a AS DOUBLE) AS ma, sb / CAST(n_b AS DOUBLE) AS mb,
    (ssa - CAST(n_a AS DOUBLE) * (sa / CAST(n_a AS DOUBLE))
         * (sa / CAST(n_a AS DOUBLE))) / (CAST(n_a AS DOUBLE) - 1.0)
      AS va,
    (ssb - CAST(n_b AS DOUBLE) * (sb / CAST(n_b AS DOUBLE))
         * (sb / CAST(n_b AS DOUBLE))) / (CAST(n_b AS DOUBLE) - 1.0)
      AS vb
  FROM agg
),
w AS (
  SELECT n_a, n_b, ma - mb AS d,
    sqrt(va / na + vb / nb) AS se,
    (va / na + vb / nb) * (va / na + vb / nb)
    / ((va / na) * (va / na) / (na - 1.0)
       + (vb / nb) * (vb / nb) / (nb - 1.0)) AS dfree
  FROM m
),
tt AS (
  SELECT n_a, n_b, d, se, dfree,
    (d - CAST(-0.5 AS DOUBLE)) / se AS tl,
    (d - CAST(0.5 AS DOUBLE)) / se AS tu
  FROM w
),
inp AS (
  SELECT 'l' AS key,
    CAST(dfree / (dfree + tl * tl) AS DOUBLE) AS x,
    CAST(dfree / 2.0 AS DOUBLE) AS a, CAST(0.5 AS DOUBLE) AS b
  FROM tt
  UNION ALL
  SELECT 'u',
    CAST(dfree / (dfree + tu * tu) AS DOUBLE),
    CAST(dfree / 2.0 AS DOUBLE), CAST(0.5 AS DOUBLE)
  FROM tt
),
{_betainc_chain_sql()},
ps AS (
  SELECT tt.*,
    CASE WHEN tt.tl >= 0
      THEN (SELECT p FROM pv WHERE key = 'l') / 2.0
      ELSE 1.0 - (SELECT p FROM pv WHERE key = 'l') / 2.0
    END AS pl,
    CASE WHEN tt.tu <= 0
      THEN (SELECT p FROM pv WHERE key = 'u') / 2.0
      ELSE 1.0 - (SELECT p FROM pv WHERE key = 'u') / 2.0
    END AS pu
  FROM tt
)
SELECT n_a, n_b, round(d, 6) AS mean_diff, round(se, 6) AS se,
  round(dfree, 6) AS df,
  round(tl, 6) AS t_lower, round(tu, 6) AS t_upper,
  round(pl, 6) AS p_lower, round(pu, 6) AS p_upper,
  round(greatest(pl, pu), 6) AS p_tost
FROM ps
"""


@_q("tost_equivalence", _TOST_ORACLE)
def q_tost_equivalence(spark, sf):
    """TOST equivalence of mean quantity between return flags A and R
    within +-0.5 units (stats.tost_equivalence): two one-sided Welch
    t-tests, p_tost = max; the oracle reflects the shared two-sided
    incomplete beta into the one-sided tails."""
    from padua_spark.operators.stats import tost_equivalence

    li = _t(spark, sf, "lineitem")
    return tost_equivalence(
        li, "l_returnflag", "l_quantity", "A", "R", -0.5, 0.5
    )


_CAPABILITY_ORACLE = """
WITH a AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
    sum(CAST(l_quantity AS DOUBLE)) AS s1,
    sum(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE))
      AS s2
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1
),
m AS (
  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
    s1 / CAST(n AS DOUBLE) AS mu,
    sqrt((s2 - CAST(n AS DOUBLE) * (s1 / CAST(n AS DOUBLE))
              * (s1 / CAST(n AS DOUBLE)))
         / (CAST(n AS DOUBLE) - 1.0)) AS sd
  FROM a
)
SELECT l_returnflag, n, round(mu, 6) AS mean,
  round(sd, 6) AS sd,
  round(CAST(49.0 AS DOUBLE) / (6.0 * sd), 6) AS cp,
  round((mu - CAST(1.0 AS DOUBLE)) / (3.0 * sd), 6) AS cpl,
  round((CAST(50.0 AS DOUBLE) - mu) / (3.0 * sd), 6) AS cpu,
  round(least((mu - CAST(1.0 AS DOUBLE)) / (3.0 * sd),
              (CAST(50.0 AS DOUBLE) - mu) / (3.0 * sd)), 6) AS cpk
FROM m
"""


@_q("process_capability", _CAPABILITY_ORACLE)
def q_process_capability(spark, sf):
    """Cp/Cpk process-capability indices of quantity per return flag
    against spec limits [1, 50] (stats.process_capability): one
    aggregation to exact sums."""
    from padua_spark.operators.stats import process_capability

    li = _t(spark, sf, "lineitem")
    return process_capability(
        li, ["l_returnflag"], "l_quantity", 1.0, 50.0
    )


_GRUBBS_ORACLE = f"""
WITH RECURSIVE v0 AS (
  SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
  WHERE l_quantity IS NOT NULL
),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(v) AS s1,
    sum(v * v) AS s2, min(v) AS mn, max(v) AS mx
  FROM v0
),
m AS (
  SELECT n, CAST(n AS DOUBLE) AS nd, s1 / CAST(n AS DOUBLE) AS mu,
    sqrt((s2 - CAST(n AS DOUBLE) * (s1 / CAST(n AS DOUBLE))
              * (s1 / CAST(n AS DOUBLE)))
         / (CAST(n AS DOUBLE) - 1.0)) AS sd,
    mn, mx
  FROM a
),
g AS (
  SELECT *, greatest(mx - mu, mu - mn) / sd AS gg,
    CASE WHEN mx - mu >= mu - mn THEN mx ELSE mn END AS outv
  FROM m
),
tt AS (
  SELECT *,
    CASE WHEN (nd - 1.0) * (nd - 1.0) - nd * gg * gg > 0
      THEN sqrt(nd * (nd - 2.0) * gg * gg
                / ((nd - 1.0) * (nd - 1.0) - nd * gg * gg)) END
      AS tstat
  FROM g
),
inp AS (
  SELECT 'k' AS key,
    CAST((nd - 2.0) / ((nd - 2.0) + tstat * tstat) AS DOUBLE) AS x,
    CAST((nd - 2.0) / 2.0 AS DOUBLE) AS a, CAST(0.5 AS DOUBLE) AS b
  FROM tt WHERE tstat IS NOT NULL
),
{_betainc_chain_sql()}
SELECT tt.n, round(tt.mu, 6) AS mean, round(tt.sd, 6) AS sd,
  round(tt.outv, 6) AS outlier_value,
  round(tt.gg, 6) AS g_stat,
  round(least(CAST(1.0 AS DOUBLE), tt.nd * pv.p), 6)
    AS p_value
FROM tt LEFT JOIN pv ON pv.key = 'k'
"""


@_q("grubbs_test", _GRUBBS_ORACLE)
def q_grubbs_test(spark, sf):
    """Grubbs' maximum-normed-residual outlier test on quantities
    (stats.grubbs_test): one aggregation (the max deviation is always
    at an extreme), NIST two-sided Bonferroni t bound (2n x the
    one-sided tail) via the shared incomplete beta."""
    from padua_spark.operators.stats import grubbs_test

    li = _t(spark, sf, "lineitem")
    return grubbs_test(li, "l_quantity")


# Shared regression-diagnostics source: x = quantity (integer-valued),
# y = extendedprice in TENS OF DOLLARS, rounded to integer — both
# integer-valued doubles whose raw moment sums (incl. sum(y^2) <=
# ~6.5e13 at sf0.1) stay under 2^53, so every fitted scalar (a, b,
# Sxx, s^2, covariance) is bit-identical across engines regardless of
# summation order, and per-row residual/leverage/d^2 expressions (and
# their threshold flags) are fully deterministic.
_DIAG_XY_SQL = """
  SELECT l_orderkey, l_linenumber,
    CAST(l_quantity AS DOUBLE) AS x,
    CAST(round(l_extendedprice / 10.0) AS DOUBLE) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
"""


def _diag_xy(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.where(
        F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    ).select(
        "l_orderkey", "l_linenumber", "l_shipdate",
        F.col("l_quantity").cast("double").alias("x"),
        F.round(F.col("l_extendedprice") / 10.0).cast("double")
        .alias("y"),
    )


_BP_ORACLE = f"""
WITH d AS ({_DIAG_XY_SQL}),
m1 AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
    sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM d
),
fit AS (
  SELECT n,
    (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b,
    sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx / n AS a
  FROM m1
),
m2 AS (
  SELECT max(fit.n) AS n, max(fit.b) AS b, max(fit.a) AS a,
    sum(d.x) AS sx, sum(d.x * d.x) AS sxx,
    sum((d.y - fit.a - fit.b * d.x) * (d.y - fit.a - fit.b * d.x))
      AS su,
    sum((d.y - fit.a - fit.b * d.x) * (d.y - fit.a - fit.b * d.x)
        * (d.y - fit.a - fit.b * d.x) * (d.y - fit.a - fit.b * d.x))
      AS suu,
    sum(d.x * (d.y - fit.a - fit.b * d.x)
        * (d.y - fit.a - fit.b * d.x)) AS sxu
  FROM d CROSS JOIN fit
),
s AS (
  SELECT n, b, a,
    CAST(n AS DOUBLE)
      * ((sxu - sx * su / n) * (sxu - sx * su / n))
      / ((sxx - sx * sx / n) * (suu - su * su / n)) AS lm
  FROM m2
),
e AS (
  SELECT *, sqrt(lm / 2.0) AS z,
    1.0 / (1.0 + 0.3275911 * sqrt(lm / 2.0)) AS t
  FROM s
)
SELECT n, round(b, 6) AS slope, round(a, 6) AS intercept,
  round(lm, 6) AS lm_stat,
  round((0.254829592 * t + -0.284496736 * t * t
     + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
     + 1.061405429 * t * t * t * t * t) * exp(-z * z), 6) AS p_value
FROM e
"""


@_q("breusch_pagan", _BP_ORACLE)
def q_breusch_pagan(spark, sf):
    """Breusch-Pagan (Koenker) heteroskedasticity LM test of price on
    quantity (stats.breusch_pagan): two aggregations with the fitted
    line broadcast back as a 1-row frame; chi2_1 p via the closed
    erfc identity — no UDF."""
    from padua_spark.operators.stats import breusch_pagan

    return breusch_pagan(_diag_xy(spark, sf), "x", "y")


_CHOW_ORACLE = f"""
WITH RECURSIVE d0 AS (
  SELECT l_orderkey, l_linenumber, l_shipdate,
    CAST(l_quantity AS DOUBLE) AS x,
    CAST(round(l_extendedprice / 10.0) AS DOUBLE) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
d AS (
  SELECT x, y,
    CASE WHEN l_shipdate >= TIMESTAMP '1998-05-24 00:00:00' THEN 1 ELSE 0 END AS s
  FROM d0
),
m AS (
  SELECT
    CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
    sum(CASE WHEN s = 0 THEN x ELSE 0 END) AS sx0,
    sum(CASE WHEN s = 0 THEN y ELSE 0 END) AS sy0,
    sum(CASE WHEN s = 0 THEN x * x ELSE 0 END) AS sxx0,
    sum(CASE WHEN s = 0 THEN x * y ELSE 0 END) AS sxy0,
    sum(CASE WHEN s = 0 THEN y * y ELSE 0 END) AS syy0,
    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    sum(CASE WHEN s = 1 THEN x ELSE 0 END) AS sx1,
    sum(CASE WHEN s = 1 THEN y ELSE 0 END) AS sy1,
    sum(CASE WHEN s = 1 THEN x * x ELSE 0 END) AS sxx1,
    sum(CASE WHEN s = 1 THEN x * y ELSE 0 END) AS sxy1,
    sum(CASE WHEN s = 1 THEN y * y ELSE 0 END) AS syy1
  FROM d
),
sse AS (
  SELECT n0, n1,
    (syy0 - sy0 * sy0 / n0)
      - (sxy0 - sx0 * sy0 / n0) * (sxy0 - sx0 * sy0 / n0)
        / (sxx0 - sx0 * sx0 / n0) AS sse_a,
    (syy1 - sy1 * sy1 / n1)
      - (sxy1 - sx1 * sy1 / n1) * (sxy1 - sx1 * sy1 / n1)
        / (sxx1 - sx1 * sx1 / n1) AS sse_b,
    ((syy0 + syy1) - (sy0 + sy1) * (sy0 + sy1) / (n0 + n1))
      - ((sxy0 + sxy1) - (sx0 + sx1) * (sy0 + sy1) / (n0 + n1))
        * ((sxy0 + sxy1) - (sx0 + sx1) * (sy0 + sy1) / (n0 + n1))
        / ((sxx0 + sxx1) - (sx0 + sx1) * (sx0 + sx1) / (n0 + n1))
      AS sse_p
  FROM m
),
fs AS (
  SELECT n0, n1, sse_a, sse_b, sse_p,
    CAST(n0 + n1 AS DOUBLE) - 4.0 AS dfd,
    greatest(0.0, ((sse_p - sse_a - sse_b) / 2.0)
      / ((sse_a + sse_b) / (CAST(n0 + n1 AS DOUBLE) - 4.0))) AS f
  FROM sse
),
inp AS (
  SELECT 'k' AS key,
    CAST(dfd / (dfd + 2.0 * f) AS DOUBLE) AS x,
    CAST(dfd / 2.0 AS DOUBLE) AS a, CAST(1.0 AS DOUBLE) AS b
  FROM fs
),
{{BETAINC}}
SELECT fs.n0 AS n_a, fs.n1 AS n_b,
  round(fs.sse_a, 6) AS sse_a, round(fs.sse_b, 6) AS sse_b,
  round(fs.sse_p, 6) AS sse_pooled,
  round(fs.f, 6) AS f_stat,
  CAST(2.0 AS DOUBLE) AS dfn, round(fs.dfd, 6) AS dfd,
  round(pv.p, 6) AS p_value
FROM fs LEFT JOIN pv ON pv.key = 'k'
"""


@_q("chow_test", _CHOW_ORACLE.replace("{BETAINC}", _betainc_chain_sql()))
def q_chow_test(spark, sf):
    """Chow structural-break F test of the price~quantity line across
    the median-shipdate split (stats.chow_test): ONE conditional
    12-moment aggregation, closed centered SSEs, F p via the shared
    incomplete beta."""
    from padua_spark.operators.stats import chow_test

    d = _diag_xy(spark, sf).withColumn(
        "s",
        (F.col("l_shipdate") >= F.lit("1998-05-24 00:00:00")).cast("int"),
    )
    return chow_test(d, "x", "y", "s")


_COOKS_ORACLE = f"""
WITH d AS ({_DIAG_XY_SQL}),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
    sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
  FROM d
),
fit AS (
  SELECT n,
    (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b,
    sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx / n AS a,
    sx / n AS xbar,
    sxx - sx * sx / n AS sxxc,
    ((syy - sy * sy / n)
     - (sxy - sx * sy / n) * (sxy - sx * sy / n)
       / (sxx - sx * sx / n)) / (n - 2.0) AS s2
  FROM m
),
r AS (
  SELECT d.l_orderkey, d.l_linenumber, d.x, d.y, fit.n,
    d.y - fit.a - fit.b * d.x AS e,
    1.0 / fit.n + (d.x - fit.xbar) * (d.x - fit.xbar) / fit.sxxc
      AS h,
    fit.s2 AS s2
  FROM d CROSS JOIN fit
),
c AS (
  SELECT l_orderkey, l_linenumber, x, y, e, h, n,
    e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)) AS cd
  FROM r
)
SELECT l_orderkey, l_linenumber,
  round(x, 6) AS x, round(y, 6) AS y,
  round(e, 6) AS residual, round(h, 6) AS leverage,
  round(cd, 6) AS cooks_d
FROM c WHERE cd > 4.0 / CAST(n AS DOUBLE)
"""


@_q("cooks_distance", _COOKS_ORACLE)
def q_cooks_distance(spark, sf):
    """Cook's-distance influence screen on the price~quantity line
    (stats.cooks_distance): 1-row fitted frame broadcast back, pure
    scan-level residual/leverage expressions, classic 4/n flag —
    deterministic because the integer-valued moments are order-exact."""
    from padua_spark.operators.stats import cooks_distance

    return cooks_distance(
        _diag_xy(spark, sf), "x", "y",
        ["l_orderkey", "l_linenumber"],
    )


_MAHA_ORACLE = f"""
WITH d0 AS ({_DIAG_XY_SQL}),
d AS (
  -- plant a deterministic off-cloud cohort (1/997 of orderkeys get
  -- +$500k): the uniform synthetic cloud has max d2 ~ 5.9, so the
  -- flag path would otherwise be vacuously green on empty sets
  SELECT l_orderkey, l_linenumber, x,
    y + CASE WHEN l_orderkey % 997 = 0 THEN 50000.0 ELSE 0.0 END AS y
  FROM d0
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM d
),
fit AS (
  SELECT n, sx / n AS mx, sy / n AS my,
    (sxx - sx * sx / n) / (n - 1.0) AS vx,
    (syy - sy * sy / n) / (n - 1.0) AS vy,
    (sxy - sx * sy / n) / (n - 1.0) AS cxy
  FROM m
),
f2 AS (SELECT *, vx * vy - cxy * cxy AS det FROM fit),
r AS (
  SELECT d.l_orderkey, d.l_linenumber, d.x, d.y,
    (f2.vy * (d.x - f2.mx) * (d.x - f2.mx)
     - 2.0 * f2.cxy * (d.x - f2.mx) * (d.y - f2.my)
     + f2.vx * (d.y - f2.my) * (d.y - f2.my)) / f2.det AS d2
  FROM d CROSS JOIN f2
)
SELECT l_orderkey, l_linenumber,
  round(x, 6) AS x, round(y, 6) AS y, round(d2, 6) AS d2
FROM r WHERE d2 > 13.815510557964274
"""


@_q("mahalanobis_outliers", _MAHA_ORACLE)
def q_mahalanobis_outliers(spark, sf):
    """Bivariate Mahalanobis outlier screen over (quantity, price)
    with a planted off-cloud cohort (1/997 of orderkeys at +$500k —
    the synthetic cloud alone maxes out at d2 ~ 5.9)
    (stats.mahalanobis_outliers): 1-row covariance frame broadcast
    back, closed 2x2 inverse, chi2_2 0.999 flag — order-exact
    integer moments make the flag set deterministic."""
    from padua_spark.operators.stats import mahalanobis_outliers

    d = _diag_xy(spark, sf).withColumn(
        "y",
        F.col("y")
        + F.when(F.col("l_orderkey") % 997 == 0, 50000.0)
        .otherwise(0.0),
    )
    return mahalanobis_outliers(
        d, "x", "y", ["l_orderkey", "l_linenumber"],
    )


_HUBER_ORACLE = f"""
WITH d0 AS ({_DIAG_XY_SQL}),
d AS (
  SELECT x,
    y + CASE WHEN l_orderkey % 997 = 0 THEN 50000.0 ELSE 0.0 END AS y
  FROM d0
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
    sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
  FROM d
),
f0 AS (
  SELECT n,
    (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b,
    sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx / n AS a,
    sqrt(((syy - sy * sy / n)
          - (sxy - sx * sy / n) * (sxy - sx * sy / n)
            / (sxx - sx * sx / n)) / (n - 2.0)) AS s0
  FROM m
),
a1 AS (
  SELECT max(f0.n) AS n, max(f0.b) AS b0, max(f0.a) AS a0,
    max(f0.s0) AS s0,
    sum(w) AS sw, sum(w * x) AS swx, sum(w * y) AS swy,
    sum(w * x * x) AS swxx, sum(w * x * y) AS swxy,
    CAST(sum(CASE WHEN w < 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS ndw
  FROM (
    SELECT d.x, d.y, f0.n, f0.b, f0.a, f0.s0,
      CASE WHEN abs(d.y - f0.a - f0.b * d.x) > 1.345 * f0.s0
           THEN 1.345 * f0.s0 / abs(d.y - f0.a - f0.b * d.x)
           ELSE 1.0 END AS w
    FROM d CROSS JOIN f0
  ) t CROSS JOIN f0
),
f1 AS (
  SELECT n, b0, a0, s0, ndw,
    (swxy - swx * swy / sw) / (swxx - swx * swx / sw) AS b,
    swy / sw - (swxy - swx * swy / sw) / (swxx - swx * swx / sw)
      * swx / sw AS a
  FROM a1
),
a2 AS (
  SELECT max(f1.n) AS n, max(f1.b0) AS b0, max(f1.a0) AS a0,
    max(f1.s0) AS s0,
    sum(w) AS sw, sum(w * x) AS swx, sum(w * y) AS swy,
    sum(w * x * x) AS swxx, sum(w * x * y) AS swxy,
    CAST(sum(CASE WHEN w < 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS ndw
  FROM (
    SELECT d.x, d.y,
      CASE WHEN abs(d.y - f1.a - f1.b * d.x) > 1.345 * f1.s0
           THEN 1.345 * f1.s0 / abs(d.y - f1.a - f1.b * d.x)
           ELSE 1.0 END AS w
    FROM d CROSS JOIN f1
  ) t CROSS JOIN f1
),
f2 AS (
  SELECT n, b0, a0, s0, ndw,
    (swxy - swx * swy / sw) / (swxx - swx * swx / sw) AS b,
    swy / sw - (swxy - swx * swy / sw) / (swxx - swx * swx / sw)
      * swx / sw AS a
  FROM a2
),
a3 AS (
  SELECT max(f2.n) AS n, max(f2.b0) AS b0, max(f2.a0) AS a0,
    max(f2.s0) AS s0,
    sum(w) AS sw, sum(w * x) AS swx, sum(w * y) AS swy,
    sum(w * x * x) AS swxx, sum(w * x * y) AS swxy,
    CAST(sum(CASE WHEN w < 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS ndw
  FROM (
    SELECT d.x, d.y,
      CASE WHEN abs(d.y - f2.a - f2.b * d.x) > 1.345 * f2.s0
           THEN 1.345 * f2.s0 / abs(d.y - f2.a - f2.b * d.x)
           ELSE 1.0 END AS w
    FROM d CROSS JOIN f2
  ) t CROSS JOIN f2
),
f3 AS (
  SELECT n, b0, a0, s0, ndw,
    (swxy - swx * swy / sw) / (swxx - swx * swx / sw) AS b,
    swy / sw - (swxy - swx * swy / sw) / (swxx - swx * swx / sw)
      * swx / sw AS a
  FROM a3
)
SELECT n, round(b0, 6) AS slope_ols, round(a0, 6) AS intercept_ols,
  round(b, 6) AS slope, round(a, 6) AS intercept,
  round(s0, 6) AS scale, ndw AS n_downweighted
FROM f3
"""


@_q("huber_regression", _HUBER_ORACLE)
def q_huber_regression(spark, sf):
    """Huber IRLS robust line through the planted-outlier
    price~quantity cloud (stats.huber_regression): OLS moments freeze
    the scale, 3 unrolled reweighted rounds, each one aggregation
    with the previous 1-row fit broadcast back — the oracle replays
    the identical unroll as chained CTEs (the cox_ph contract)."""
    from padua_spark.operators.stats import huber_regression

    d = _diag_xy(spark, sf).withColumn(
        "y",
        F.col("y")
        + F.when(F.col("l_orderkey") % 997 == 0, 50000.0)
        .otherwise(0.0),
    )
    return huber_regression(d, "x", "y")


_URL_SYNTH_SQL = """
  SELECT doc_id,
    'https://'
    || CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END
    || source || '.Example.COM'
    || CASE WHEN doc_id % 2 = 0 THEN ':8080' ELSE '' END
    || '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR)
    || CASE WHEN doc_id % 3 = 0
            THEN '?utm_source=feed&utm_medium=rss&id='
                 || CAST(doc_id AS VARCHAR)
            WHEN doc_id % 5 = 0
            THEN '?id=' || CAST(doc_id AS VARCHAR) || '&gclid=abc'
            ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END AS url
  FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL
"""

_URL_PROFILE_ORACLE = f"""
WITH d AS ({_URL_SYNTH_SQL}),
p AS (
  SELECT doc_id, url,
    lower(regexp_extract(url,
      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_replace(regexp_replace(
      regexp_extract(url,
        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
      '^.*@', ''), ':[0-9]+$', '')) AS host,
    regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
    regexp_extract(url, '\\?([^#]*)', 1) AS query,
    regexp_extract(url, '^([^?#]*)', 1) AS clean
  FROM d
),
q AS (
  SELECT doc_id, scheme, host,
    string_split(host, '.') AS labels,
    len(list_filter(string_split(path, '/'), s -> s <> ''))
      AS path_depth,
    list_filter(string_split(query, '&'), s -> s <> '') AS params,
    clean
  FROM p
)
SELECT doc_id,
  CASE WHEN scheme <> '' THEN scheme END AS scheme,
  CASE WHEN host <> '' THEN host END AS host,
  CASE WHEN len(labels) >= 2
       THEN labels[len(labels) - 1] || '.' || labels[len(labels)]
       WHEN host <> '' THEN host END AS registered_domain,
  CAST(path_depth AS INT) AS path_depth,
  CAST(len(params) AS INT) AS n_query_params,
  CAST(len(list_filter(params, s ->
    starts_with(s, 'utm_') OR starts_with(s, 'gclid=')
    OR starts_with(s, 'fbclid=') OR starts_with(s, 'msclkid=')
    OR starts_with(s, 'mc_eid='))) AS INT) AS n_tracking_params,
  CASE WHEN clean <> '' THEN clean END AS clean_url
FROM q
"""


@_q("url_profile", _URL_PROFILE_ORACLE)
def q_url_profile(spark, sf):
    """URL anatomy over deterministically synthesized crawl URLs
    (text.url_profile): scheme/host/registered-domain/path-depth/
    query- and tracking-param counts/clean dedup key — pure
    scan-level regexp, zero shuffles."""
    from padua_spark.extensions.text import url_profile

    d = _t(spark, sf, "documents").where(
        F.col("source").isNotNull() & F.col("lang").isNotNull()
    ).select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("WWW."))
            .otherwise(F.lit("")),
            F.col("source"), F.lit(".Example.COM"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(":8080"))
            .otherwise(F.lit("")),
            F.lit("/"), F.col("lang"), F.lit("/doc/"),
            F.col("doc_id").cast("string"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit("?utm_source=feed&utm_medium=rss&id="),
                    F.col("doc_id").cast("string"),
                ),
            ).when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit("?id="), F.col("doc_id").cast("string"),
                    F.lit("&gclid=abc"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit("#frag"))
            .otherwise(F.lit("")),
        ).alias("url"),
    )
    return url_profile(d, "url").select(
        "doc_id", "scheme", "host", "registered_domain",
        "path_depth", "n_query_params", "n_tracking_params",
        "clean_url",
    )


_NEGBIN_ORACLE = """
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS c
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(CAST(c AS DOUBLE)) AS s1,
    sum(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)) AS s2,
    CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS z
  FROM per
),
s AS (
  SELECT n, s1 / n AS mean,
    CASE WHEN n >= 2
         THEN (s2 - n * (s1 / n) * (s1 / n)) / (n - 1.0) END AS v,
    z
  FROM m
)
SELECT n, round(mean, 6) AS mean, round(v, 6) AS variance,
  round(CASE WHEN mean > 0 THEN v / mean END, 6) AS dispersion,
  round(CASE WHEN v > mean THEN mean * mean / (v - mean) END, 6)
    AS nb_r,
  round(CASE WHEN v > mean THEN mean / v END, 6) AS nb_p,
  round(CAST(z AS DOUBLE) / n, 6) AS zero_frac,
  round(exp(-mean), 6) AS poisson_zero_frac
FROM s
"""


@_q("negbin_fit", _NEGBIN_ORACLE)
def q_negbin_fit(spark, sf):
    """Negative-binomial MoM fit of events-per-user counts
    (stats.negbin_fit): integer contract enforced in-plan, one
    aggregation, dispersion + NB shape + zero-inflation screen."""
    from padua_spark.operators.stats import negbin_fit

    e = _t(spark, sf, "events").where(F.col("user_id").isNotNull())
    per = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return negbin_fit(per, "c")


_MDE_ORACLE = """
WITH e AS (
  SELECT CAST(user_id % 2 AS INT) AS v,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
m AS (
  SELECT
    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN v = 0 THEN s ELSE 0 END) AS BIGINT) AS ka,
    CAST(sum(CASE WHEN v = 1 THEN s ELSE 0 END) AS BIGINT) AS kb
  FROM e
),
s AS (
  SELECT n_a, n_b,
    CAST(ka AS DOUBLE) / n_a AS ra, CAST(kb AS DOUBLE) / n_b AS rb,
    CAST(ka + kb AS DOUBLE) / (n_a + n_b) AS pbar
  FROM m
)
SELECT n_a, n_b, round(ra, 6) AS rate_a, round(rb, 6) AS rate_b,
  round(pbar, 6) AS pooled_rate,
  round(rb - ra, 6) AS observed_diff,
  round((1.959963984540054 + 0.8416212335729143)
        * sqrt(pbar * (1.0 - pbar)
               * (1.0 / n_a + 1.0 / n_b)), 6) AS mde_absolute,
  abs(rb - ra) >= (1.959963984540054 + 0.8416212335729143)
        * sqrt(pbar * (1.0 - pbar)
               * (1.0 / n_a + 1.0 / n_b)) AS powered
FROM s
"""


@_q("mde_two_proportion", _MDE_ORACLE)
def q_mde_two_proportion(spark, sf):
    """Post-hoc minimum detectable effect of the purchase rate across
    a user-parity split (stats.mde_two_proportion): one conditional
    aggregation, fixed z lookup (alpha 0.05, power 0.8), powered
    verdict on the realized sample sizes."""
    from padua_spark.operators.stats import mde_two_proportion

    e = _t(spark, sf, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        (F.col("user_id") % 2).cast("int").alias("v"),
        (F.col("event_type") == "purchase").cast("int").alias("s"),
    )
    return mde_two_proportion(e, "v", "s", 0, 1)


_HOLM_ORACLE = """
WITH p0 AS (
  SELECT o_orderkey,
    CAST((o_orderkey * 2654435761) % 1000003 AS DOUBLE) / 1000003.0
      AS p_value
  FROM orders
),
r AS (
  SELECT o_orderkey, p_value,
    row_number() OVER (ORDER BY p_value ASC) AS rk,
    CAST(count(*) OVER () AS DOUBLE) AS m
  FROM p0
),
h AS (
  SELECT o_orderkey, p_value,
    max((m - rk + 1.0) * p_value)
      OVER (ORDER BY p_value ASC, rk ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS raw
  FROM r
)
SELECT o_orderkey, round(p_value, 9) AS p_value,
  round(least(raw, 1.0), 6) AS p_holm
FROM h
"""


@_q("holm_adjust", _HOLM_ORACLE)
def q_holm_adjust(spark, sf):
    """Holm step-down FWER adjustment over a deterministic
    hash-uniform p column keyed by order (stats.holm_adjust): rank +
    forward running max over the m-row p table — the documented
    global-order window trade shared with qvalues."""
    from padua_spark.operators.stats import holm_adjust

    o = _t(spark, sf, "orders").select(
        "o_orderkey",
        (
            (F.col("o_orderkey") * F.lit(2654435761))
            % F.lit(1000003)
        ).cast("double").alias("_p0"),
    ).select(
        "o_orderkey", (F.col("_p0") / 1000003.0).alias("p_value")
    )
    out = holm_adjust(o, "p_value")
    return out.select(
        "o_orderkey",
        F.round("p_value", 9).alias("p_value"),
        "p_holm",
    )


def _delong_model_ranks_sql(tag: str) -> str:
    return f"""
c{tag} AS (
  SELECT s{tag} AS v, CAST(count(*) AS BIGINT) AS c,
    CAST(sum(y) AS BIGINT) AS cp,
    CAST(count(*) - sum(y) AS BIGINT) AS cn
  FROM s GROUP BY 1
),
cr{tag} AS (
  SELECT v, c, cp, cn,
    CAST(sum(c) OVER (ORDER BY v) AS DOUBLE) AS crun,
    CAST(sum(cp) OVER (ORDER BY v) AS DOUBLE) AS cprun,
    CAST(sum(cn) OVER (ORDER BY v) AS DOUBLE) AS cnrun
  FROM c{tag}
),
r{tag} AS (
  SELECT v,
    (crun - c) + (c + 1.0) / 2.0 AS r_all,
    (cprun - cp) + (cp + 1.0) / 2.0 AS r_pos,
    (cnrun - cn) + (cn + 1.0) / 2.0 AS r_neg
  FROM cr{tag}
)"""


_DELONG_ORACLE = f"""
WITH e AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
    CAST(value AS DOUBLE) AS value
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
),
s AS (
  SELECT y,
    floor((value + y * 50.0) * 10.0) / 10.0 AS sa,
    floor((value + y * 20.0) * 10.0) / 10.0 AS sb
  FROM e
),
{_delong_model_ranks_sql("a").lstrip()},
{_delong_model_ranks_sql("b").lstrip()},
comp AS (
  SELECT s.y,
    ra.r_all AS ra_a, ra.r_pos AS rp_a, ra.r_neg AS rn_a,
    rb.r_all AS ra_b, rb.r_pos AS rp_b, rb.r_neg AS rn_b
  FROM s JOIN ra ON s.sa = ra.v JOIN rb ON s.sb = rb.v
),
tot AS (
  SELECT CAST(sum(y) AS DOUBLE) AS n1,
    CAST(count(*) - sum(y) AS DOUBLE) AS n0
  FROM comp
),
v AS (
  SELECT comp.y,
    (ra_a - rp_a) / tot.n0 AS v10a, (ra_b - rp_b) / tot.n0 AS v10b,
    1.0 - (ra_a - rn_a) / tot.n1 AS v01a,
    1.0 - (ra_b - rn_b) / tot.n1 AS v01b
  FROM comp CROSS JOIN tot
),
agg AS (
  SELECT CAST(sum(y) AS BIGINT) AS n_pos,
    CAST(count(*) - sum(y) AS BIGINT) AS n_neg,
    sum(CASE WHEN y = 1 THEN v10a ELSE 0 END) AS psa,
    sum(CASE WHEN y = 1 THEN v10b ELSE 0 END) AS psb,
    sum(CASE WHEN y = 1 THEN v10a * v10a ELSE 0 END) AS pxaa,
    sum(CASE WHEN y = 1 THEN v10b * v10b ELSE 0 END) AS pxbb,
    sum(CASE WHEN y = 1 THEN v10a * v10b ELSE 0 END) AS pxab,
    sum(CASE WHEN y = 0 THEN v01a ELSE 0 END) AS nsa,
    sum(CASE WHEN y = 0 THEN v01b ELSE 0 END) AS nsb,
    sum(CASE WHEN y = 0 THEN v01a * v01a ELSE 0 END) AS nxaa,
    sum(CASE WHEN y = 0 THEN v01b * v01b ELSE 0 END) AS nxbb,
    sum(CASE WHEN y = 0 THEN v01a * v01b ELSE 0 END) AS nxab
  FROM v
),
fin AS (
  SELECT n_pos, n_neg,
    CAST(n_pos AS DOUBLE) AS n1, CAST(n_neg AS DOUBLE) AS n0,
    psa / n_pos AS auc_a, psb / n_pos AS auc_b,
    (((pxaa - psa * psa / n_pos) / (n_pos - 1.0)
      + (pxbb - psb * psb / n_pos) / (n_pos - 1.0)
      - 2.0 * (pxab - psa * psb / n_pos) / (n_pos - 1.0))
     / n_pos)
    + (((nxaa - nsa * nsa / n_neg) / (n_neg - 1.0)
        + (nxbb - nsb * nsb / n_neg) / (n_neg - 1.0)
        - 2.0 * (nxab - nsa * nsb / n_neg) / (n_neg - 1.0))
       / n_neg) AS var
  FROM agg
),
zz AS (
  SELECT *, CASE WHEN n_pos >= 2 AND n_neg >= 2 AND var > 0
    THEN (auc_a - auc_b) / sqrt(var) END AS z
  FROM fin
),
ee AS (
  SELECT *, abs(z) / sqrt(2.0) AS xx,
    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
  FROM zz
)
SELECT n_pos, n_neg, round(auc_a, 6) AS auc_a,
  round(auc_b, 6) AS auc_b,
  round(auc_a - auc_b, 6) AS auc_diff,
  round(z, 6) AS z,
  round(CASE WHEN z IS NOT NULL THEN
    (0.254829592 * t + -0.284496736 * t * t
     + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
     + 1.061405429 * t * t * t * t * t) * exp(-xx * xx) END, 6)
    AS p_value
FROM ee
"""


@_q("delong_test", _DELONG_ORACLE)
def q_delong_test(spark, sf):
    """DeLong correlated-AUC comparison of two planted value-scores
    for the purchase label (stats.delong_test): midrank structural
    components from the distributed stepped cumsum, covariance pass
    in one aggregation — never the n1 x n0 pair enumeration."""
    from padua_spark.operators.stats import delong_test

    e = _t(spark, sf, "events").where(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        F.col("value").cast("double").alias("value"),
    ).select(
        "y",
        (F.floor((F.col("value") + F.col("y") * 50.0) * 10.0) / 10.0)
        .alias("sa"),
        (F.floor((F.col("value") + F.col("y") * 20.0) * 10.0) / 10.0)
        .alias("sb"),
    )
    return delong_test(e, "y", "sa", "sb")


_IPW_ORACLE = """
WITH d AS (
  SELECT CAST(user_id % 2 AS INT) AS t,
    CAST(value AS DOUBLE)
      + CASE WHEN user_id % 2 = 1 THEN 25.0 ELSE 0.0 END AS y,
    least(0.9, greatest(0.1,
      0.3 + CAST(user_id % 10 AS DOUBLE) / 20.0)) AS e
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
),
w AS (
  SELECT t, y,
    CASE WHEN t = 1 THEN 1.0 / e ELSE 1.0 / (1.0 - e) END AS w
  FROM d
),
a AS (
  SELECT
    CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
    CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
    sum(CASE WHEN t = 1 THEN w ELSE 0 END) AS swt,
    sum(CASE WHEN t = 1 THEN w * w ELSE 0 END) AS swwt,
    sum(CASE WHEN t = 1 THEN w * y ELSE 0 END) AS swyt,
    sum(CASE WHEN t = 1 THEN w * w * y * y ELSE 0 END) AS swwyyt,
    sum(CASE WHEN t = 1 THEN w * w * y ELSE 0 END) AS swwyt,
    sum(CASE WHEN t = 0 THEN w ELSE 0 END) AS swc,
    sum(CASE WHEN t = 0 THEN w * w ELSE 0 END) AS swwc,
    sum(CASE WHEN t = 0 THEN w * y ELSE 0 END) AS swyc,
    sum(CASE WHEN t = 0 THEN w * w * y * y ELSE 0 END) AS swwyyc,
    sum(CASE WHEN t = 0 THEN w * w * y ELSE 0 END) AS swwyc
  FROM w
),
s AS (
  SELECT nt, nc,
    swyt / swt AS mut, swyc / swc AS muc,
    (swwyyt - 2.0 * (swyt / swt) * swwyt
     + (swyt / swt) * (swyt / swt) * swwt) / (swt * swt) AS vt,
    (swwyyc - 2.0 * (swyc / swc) * swwyc
     + (swyc / swc) * (swyc / swc) * swwc) / (swc * swc) AS vc,
    swt * swt / swwt AS esst, swc * swc / swwc AS essc
  FROM a
),
zz AS (
  SELECT *, mut - muc AS ate,
    CASE WHEN vt + vc > 0 THEN sqrt(vt + vc) END AS se
  FROM s
),
ee AS (
  SELECT *, (ate / se) AS z, abs(ate / se) / sqrt(2.0) AS xx,
    1.0 / (1.0 + 0.3275911 * (abs(ate / se) / sqrt(2.0))) AS tt
  FROM zz
)
SELECT nt AS n_treat, nc AS n_control,
  round(esst, 6) AS ess_treat, round(essc, 6) AS ess_control,
  round(ate, 6) AS ate, round(se, 6) AS se, round(z, 6) AS z,
  round((0.254829592 * tt + -0.284496736 * tt * tt
     + 1.421413741 * tt * tt * tt + -1.453152027 * tt * tt * tt * tt
     + 1.061405429 * tt * tt * tt * tt * tt) * exp(-xx * xx), 6)
    AS p_value
FROM ee
"""


@_q("ipw_ate", _IPW_ORACLE)
def q_ipw_ate(spark, sf):
    """Hajek IPW average treatment effect with a planted +25 effect,
    deterministic propensities, trimming and per-arm effective sample
    sizes (stats.ipw_ate): one conditional aggregation."""
    from padua_spark.operators.stats import ipw_ate

    e = _t(spark, sf, "events").where(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    ).select(
        (F.col("user_id") % 2).cast("int").alias("t"),
        (
            F.col("value").cast("double")
            + F.when(F.col("user_id") % 2 == 1, 25.0).otherwise(0.0)
        ).alias("y"),
        F.least(
            F.lit(0.9),
            F.greatest(
                F.lit(0.1),
                F.lit(0.3)
                + (F.col("user_id") % 10).cast("double") / 20.0,
            ),
        ).alias("e"),
    )
    return ipw_ate(e, "t", "y", "e")


_DID_ORACLE = """
WITH d AS (
  SELECT CAST(l_suppkey % 2 AS INT) AS g,
    CASE WHEN l_shipdate >= TIMESTAMP '1998-05-24 00:00:00'
         THEN 1 ELSE 0 END AS p,
    CAST(round(l_extendedprice / 10.0) AS DOUBLE)
      + CASE WHEN l_suppkey % 2 = 1
                  AND l_shipdate >= TIMESTAMP '1998-05-24 00:00:00'
             THEN 500.0 ELSE 0.0 END AS y
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_extendedprice IS NOT NULL
),
a AS (
  SELECT
    CAST(sum(CASE WHEN g = 0 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
    sum(CASE WHEN g = 0 AND p = 0 THEN y ELSE 0 END) AS s00,
    sum(CASE WHEN g = 0 AND p = 0 THEN y * y ELSE 0 END) AS q00,
    CAST(sum(CASE WHEN g = 0 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
    sum(CASE WHEN g = 0 AND p = 1 THEN y ELSE 0 END) AS s01,
    sum(CASE WHEN g = 0 AND p = 1 THEN y * y ELSE 0 END) AS q01,
    CAST(sum(CASE WHEN g = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
    sum(CASE WHEN g = 1 AND p = 0 THEN y ELSE 0 END) AS s10,
    sum(CASE WHEN g = 1 AND p = 0 THEN y * y ELSE 0 END) AS q10,
    CAST(sum(CASE WHEN g = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
    sum(CASE WHEN g = 1 AND p = 1 THEN y ELSE 0 END) AS s11,
    sum(CASE WHEN g = 1 AND p = 1 THEN y * y ELSE 0 END) AS q11
  FROM d
),
m AS (
  SELECT n00, n01, n10, n11,
    s00 / n00 AS m00, s01 / n01 AS m01,
    s10 / n10 AS m10, s11 / n11 AS m11,
    (q00 - n00 * (s00 / n00) * (s00 / n00)) / (n00 - 1.0) / n00
    + (q01 - n01 * (s01 / n01) * (s01 / n01)) / (n01 - 1.0) / n01
    + (q10 - n10 * (s10 / n10) * (s10 / n10)) / (n10 - 1.0) / n10
    + (q11 - n11 * (s11 / n11) * (s11 / n11)) / (n11 - 1.0) / n11
      AS se2
  FROM a
),
zz AS (
  SELECT *, (m11 - m10) - (m01 - m00) AS att,
    CASE WHEN se2 > 0 THEN sqrt(se2) END AS se
  FROM m
),
ee AS (
  SELECT *, att / se AS z, abs(att / se) / sqrt(2.0) AS xx,
    1.0 / (1.0 + 0.3275911 * (abs(att / se) / sqrt(2.0))) AS tt
  FROM zz
)
SELECT n00 AS n_ctrl_pre, n01 AS n_ctrl_post,
  n10 AS n_treat_pre, n11 AS n_treat_post,
  round(m00, 6) AS mean_ctrl_pre, round(m01, 6) AS mean_ctrl_post,
  round(m10, 6) AS mean_treat_pre, round(m11, 6) AS mean_treat_post,
  round(att, 6) AS att, round(se, 6) AS se, round(z, 6) AS z,
  round((0.254829592 * tt + -0.284496736 * tt * tt
     + 1.421413741 * tt * tt * tt + -1.453152027 * tt * tt * tt * tt
     + 1.061405429 * tt * tt * tt * tt * tt) * exp(-xx * xx), 6)
    AS p_value
FROM ee
"""


@_q("diff_in_diff", _DID_ORACLE)
def q_diff_in_diff(spark, sf):
    """2x2 difference-in-differences of tens-of-dollars revenue
    across a supplier-parity split and the median-shipdate break,
    with a planted +500 interaction (stats.diff_in_diff): one
    conditional aggregation to the four cells."""
    from padua_spark.operators.stats import diff_in_diff

    li = _t(spark, sf, "lineitem").where(
        F.col("l_suppkey").isNotNull()
        & F.col("l_shipdate").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    )
    post = (
        F.col("l_shipdate") >= F.lit("1998-05-24 00:00:00")
    ).cast("int")
    d = li.select(
        (F.col("l_suppkey") % 2).cast("int").alias("g"),
        post.alias("p"),
        (
            F.round(F.col("l_extendedprice") / 10.0).cast("double")
            + F.when(
                ((F.col("l_suppkey") % 2) == 1) & (post == 1), 500.0
            ).otherwise(0.0)
        ).alias("y"),
    )
    return diff_in_diff(d, "g", "p", "y")


def _randomization_oracle(n_perms: int = 99) -> str:
    M = 2_147_483_647
    A = 48_271
    cols = []
    for b in range(n_perms):
        salt = 1_000_003 * (b + 1)
        bit = (
            f"(((((o_custkey % {M}) + {salt}) % {M})"
            f" * ((((o_custkey % {M}) + {salt}) % {M})) % {M})"
        )
        # h2 = (h1*A + h0) % M; h3 = h2*h2 % M; bit = h3 < M//2
        h0 = f"(((o_custkey % {M}) + {salt}) % {M})"
        h1 = f"(({h0} * {h0}) % {M})"
        h2 = f"((({h1} * {A}) + {h0}) % {M})"
        h3 = f"(({h2} * {h2}) % {M})"
        cols.append(
            f"CAST(sum(CASE WHEN {h3} < {M // 2} THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS pn{b},\n"
            f"    sum(CASE WHEN {h3} < {M // 2} THEN v ELSE 0.0 END)"
            f" AS ps{b}"
        )
        _ = bit
    null_terms = []
    for b in range(n_perms):
        nd = (
            f"(CASE WHEN pn{b} > 0 AND n - pn{b} > 0 THEN"
            f" ps{b} / pn{b} - (s - ps{b}) / (n - pn{b}) END)"
        )
        null_terms.append(
            f"CASE WHEN {nd} IS NOT NULL AND abs({nd}) >= abs(obs)"
            " THEN 1 ELSE 0 END"
        )
    cols_sql = ",\n    ".join(cols)
    ext_sql = " + ".join(null_terms)
    return f"""
WITH d AS (
  SELECT o_custkey,
    CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END AS a,
    CAST(o_totalprice AS DOUBLE) AS v
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
),
agg AS (
  SELECT
    CAST(sum(a) AS BIGINT) AS na,
    CAST(sum(1 - a) AS BIGINT) AS nb,
    sum(CASE WHEN a = 1 THEN v ELSE 0 END) AS sa,
    sum(CASE WHEN a = 0 THEN v ELSE 0 END) AS sb,
    CAST(count(*) AS BIGINT) AS n, sum(v) AS s,
    {cols_sql}
  FROM d
),
o AS (
  SELECT *, sa / na - sb / nb AS obs FROM agg
),
x AS (
  SELECT na, nb, obs,
    ({ext_sql}) AS n_ext
  FROM o
)
SELECT na AS n_a, nb AS n_b,
  round(obs, 6) AS observed_diff,
  round((1.0 + n_ext) / (1.0 + {float(n_perms)}), 6) AS p_value,
  {int(n_perms)} AS n_perms
FROM x
"""


@_q("randomization_test_mean", _randomization_oracle())
def q_randomization_test_mean(spark, sf):
    """Deterministic randomization test of order totals across a
    customer-parity split (stats.randomization_test_mean): 99
    Lehmer-quadratic pseudo-reassignments as conditional-sum columns
    in ONE aggregation — reproducible bit-for-bit on any engine."""
    from padua_spark.operators.stats import randomization_test_mean

    o = _t(spark, sf, "orders").where(
        F.col("o_custkey").isNotNull()
        & F.col("o_totalprice").isNotNull()
    ).select(
        F.col("o_custkey").alias("id"),
        F.when(F.col("o_custkey") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b")).alias("g"),
        F.col("o_totalprice").cast("double").alias("v"),
    )
    return randomization_test_mean(
        o, "id", "g", "v", "a", "b", n_perms=99
    )


def _bayes_ab_oracle(max_support: int = 200_000) -> str:
    def logB(a: str, b: str) -> str:
        return (
            f"({_gammaln_sql(a)} + {_gammaln_sql(b)}"
            f" - {_gammaln_sql(f'({a}) + ({b})')})"
        )

    term = (
        f"exp({logB('a1 + i', 'b1 + b2')} - ln(b2 + i)"
        f" - {logB('1 + i', 'b2')} - {logB('a1', 'b1')})"
    )
    return f"""
WITH e AS (
  SELECT CAST(user_id % 2 AS INT) AS v,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
m AS (
  SELECT
    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN v = 0 THEN s ELSE 0 END) AS BIGINT) AS k_a,
    CAST(sum(CASE WHEN v = 1 THEN s ELSE 0 END) AS BIGINT) AS k_b
  FROM e
),
st AS (
  SELECT *, k_a + 1 AS a1, n_a - k_a + 1 AS b1,
    k_b + 1 AS a2, n_b - k_b + 1 AS b2,
    k_b + 1 <= {int(max_support)} AS is_exact,
    CASE WHEN k_b + 1 <= {int(max_support)} THEN k_b + 1
         ELSE CAST(1 AS BIGINT) END AS a2c
  FROM m
),
rows_i AS (
  SELECT st.*,
    CAST(unnest(generate_series(CAST(0 AS BIGINT), a2c - 1))
         AS DOUBLE) AS i
  FROM st
),
p AS (
  SELECT n_a, n_b, k_a, k_b, max(a1) AS a1, max(b1) AS b1,
    max(a2) AS a2, max(b2) AS b2, bool_and(is_exact) AS is_exact,
    sum({term} ORDER BY i) AS pex
  FROM rows_i GROUP BY 1, 2, 3, 4
),
mm AS (
  SELECT *,
    CAST(a1 AS DOUBLE) / (a1 + b1) AS mua,
    CAST(a2 AS DOUBLE) / (a2 + b2) AS mub,
    CAST(a1 AS DOUBLE) * b1
      / ((CAST(a1 AS DOUBLE) + b1) * (CAST(a1 AS DOUBLE) + b1)
         * (CAST(a1 AS DOUBLE) + b1 + 1.0)) AS va,
    CAST(a2 AS DOUBLE) * b2
      / ((CAST(a2 AS DOUBLE) + b2) * (CAST(a2 AS DOUBLE) + b2)
         * (CAST(a2 AS DOUBLE) + b2 + 1.0)) AS vb
  FROM p
),
zz AS (
  SELECT *, (mub - mua) / sqrt(va + vb) AS z FROM mm
),
ee AS (
  SELECT *, abs(z) / sqrt(2.0) AS xx,
    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
  FROM zz
),
pn AS (
  SELECT *,
    (0.254829592 * t + -0.284496736 * t * t
     + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
     + 1.061405429 * t * t * t * t * t) * exp(-xx * xx) / 2.0
      AS sf1
  FROM ee
)
SELECT n_a, k_a, n_b, k_b,
  round(CAST(k_a AS DOUBLE) / n_a, 6) AS rate_a,
  round(CAST(k_b AS DOUBLE) / n_b, 6) AS rate_b,
  round(mub - mua, 6) AS lift,
  CASE WHEN is_exact THEN 'exact' ELSE 'normal' END AS method,
  round(least(greatest(CASE WHEN is_exact THEN pex
    ELSE CASE WHEN z >= 0 THEN 1.0 - sf1 ELSE sf1 END END,
    0.0), 1.0), 6) AS prob_b_beats_a
FROM pn
"""


@_q("bayes_ab_beta", _bayes_ab_oracle())
def q_bayes_ab_beta(spark, sf):
    """Bayesian beta-binomial chance-to-beat for purchase rates
    across the user-parity split (stats.bayes_ab_beta): Cook's exact
    closed sum over the posterior support via the shared Lanczos
    log-gamma, normal moment fallback above max_support."""
    from padua_spark.operators.stats import bayes_ab_beta

    e = _t(spark, sf, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        (F.col("user_id") % 2).cast("int").alias("v"),
        (F.col("event_type") == "purchase").cast("int").alias("s"),
    )
    return bayes_ab_beta(e, "v", "s", 0, 1)


@_q("bayes_ab_normal", _bayes_ab_oracle(max_support=100))
def q_bayes_ab_normal(spark, sf):
    """The beta-binomial A/B's LARGE-N branch forced at oracle scale
    (stats.bayes_ab_beta): gates the normal moment approximation and
    the method column against the same SQL twin."""
    from padua_spark.operators.stats import bayes_ab_beta

    e = _t(spark, sf, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        (F.col("user_id") % 2).cast("int").alias("v"),
        (F.col("event_type") == "purchase").cast("int").alias("s"),
    )
    return bayes_ab_beta(e, "v", "s", 0, 1, max_support=100)


_EB_SHRINK_ORACLE = """
WITH per AS (
  SELECT l_suppkey,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         AS BIGINT) AS k
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_returnflag IS NOT NULL
  GROUP BY 1
),
g AS (
  SELECT CAST(sum(k) AS DOUBLE) AS sk, CAST(sum(n) AS DOUBLE) AS sn,
    CAST(count(*) AS DOUBLE) AS gg,
    sum(CAST(k AS DOUBLE) / n) AS sp,
    sum((CAST(k AS DOUBLE) / n) * (CAST(k AS DOUBLE) / n)) AS spp,
    sum((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n) / n)
      AS snoise
  FROM per
),
pr AS (
  SELECT sk / sn AS mu,
    CASE WHEN gg >= 2
      AND greatest((spp - sp * sp / gg) / (gg - 1.0)
                   - snoise / gg, 0.0) > 0
    THEN greatest((sk / sn) * (1.0 - sk / sn)
      / greatest((spp - sp * sp / gg) / (gg - 1.0)
                 - snoise / gg, 0.0) - 1.0, 0.0)
    END AS m
  FROM g
)
SELECT per.l_suppkey, per.n, per.k,
  round(CAST(per.k AS DOUBLE) / per.n, 6) AS raw_rate,
  round(CASE WHEN pr.m IS NOT NULL
    THEN (CAST(per.k AS DOUBLE) + pr.mu * pr.m) / (per.n + pr.m)
    ELSE pr.mu END, 6) AS shrunk_rate,
  round(pr.mu, 6) AS prior_mean,
  round(pr.m, 6) AS prior_strength
FROM per CROSS JOIN pr
"""


@_q("eb_rate_shrinkage", _EB_SHRINK_ORACLE)
def q_eb_rate_shrinkage(spark, sf):
    """Empirical-Bayes shrunk per-supplier return rates
    (stats.eb_rate_shrinkage): beta-binomial MoM prior from the
    between-supplier spread, groups frame broadcast-joined to the
    1-row prior."""
    from padua_spark.operators.stats import eb_rate_shrinkage

    li = _t(spark, sf, "lineitem").where(
        F.col("l_suppkey").isNotNull()
        & F.col("l_returnflag").isNotNull()
    ).select(
        "l_suppkey",
        (F.col("l_returnflag") == "R").cast("int").alias("s"),
    )
    return eb_rate_shrinkage(li, ["l_suppkey"], "s")


_CHAPMAN_ORACLE = """
WITH d AS (
  SELECT doc_id,
    CASE WHEN (doc_id * 7) % 10 < 4 THEN 1 ELSE 0 END AS a,
    CASE WHEN (doc_id * 13) % 10 < 3 THEN 1 ELSE 0 END AS b
  FROM documents
),
f AS (SELECT * FROM d WHERE a = 1 OR b = 1),
m AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_a,
    CAST(sum(b) AS BIGINT) AS n_b,
    CAST(sum(a * b) AS BIGINT) AS n_both,
    CAST(sum(greatest(a, b)) AS BIGINT) AS n_either
  FROM f
),
s AS (
  SELECT *,
    (CAST(n_a AS DOUBLE) + 1.0) * (n_b + 1.0) / (n_both + 1.0) - 1.0
      AS n_hat,
    sqrt(greatest(
      (CAST(n_a AS DOUBLE) + 1.0) * (n_b + 1.0)
      * (n_a - n_both) * (n_b - n_both)
      / ((CAST(n_both AS DOUBLE) + 1.0) * (n_both + 1.0)
         * (n_both + 2.0)), 0.0)) AS se
  FROM m
)
SELECT n_a, n_b, n_both, n_either,
  round(n_hat, 6) AS n_hat, round(se, 6) AS se,
  round(greatest(n_hat - 1.959963984540054 * se,
                 CAST(n_either AS DOUBLE)), 6) AS ci_lo,
  round(n_hat + 1.959963984540054 * se, 6) AS ci_hi
FROM s
"""


@_q("chapman_estimate", _CHAPMAN_ORACLE)
def q_chapman_estimate(spark, sf):
    """Chapman capture-recapture corpus-size estimate from two
    deterministic pseudo-crawled membership flags
    (stats.chapman_estimate): one aggregation, bias-corrected
    Lincoln-Petersen with the normal CI floored at the observed
    union."""
    from padua_spark.operators.stats import chapman_estimate

    d = _t(spark, sf, "documents").select(
        ((F.col("doc_id") * 7) % 10 < 4).cast("int").alias("a"),
        ((F.col("doc_id") * 13) % 10 < 3).cast("int").alias("b"),
    ).where((F.col("a") == 1) | (F.col("b") == 1))
    return chapman_estimate(d, "a", "b")


def _profile_col_sql(c: str, dtype: str, numeric: bool) -> str:
    if numeric:
        mean = f"round(sum(CAST({c} AS DOUBLE)) / count({c}), 6)"
        sd = (
            f"round(CASE WHEN count({c}) >= 2 THEN sqrt(greatest("
            f"(sum(CAST({c} AS DOUBLE) * CAST({c} AS DOUBLE))"
            f" - count({c}) * (sum(CAST({c} AS DOUBLE)) / count({c}))"
            f" * (sum(CAST({c} AS DOUBLE)) / count({c})))"
            f" / (count({c}) - 1.0), 0.0)) END, 6)"
        )
    else:
        mean = "CAST(NULL AS DOUBLE)"
        sd = "CAST(NULL AS DOUBLE)"
    return f"""
SELECT '{c}' AS column, '{dtype}' AS dtype,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_null,
  round(CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        / count(*), 6) AS null_rate,
  CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
  CAST(min({c}) AS VARCHAR) AS min_value,
  CAST(max({c}) AS VARCHAR) AS max_value,
  {mean} AS mean, {sd} AS sd
FROM lineitem"""


# l_quantity and l_linenumber are INTEGER-VALUED: their moment sums
# are exact in double at any summation order. A decimal-step column
# (l_discount) would put the mean exactly on 6dp midpoints where the
# engines' sum orders disagree (the seasonal_decompose finding).
_DATA_PROFILE_ORACLE = " UNION ALL ".join([
    _profile_col_sql("l_quantity", "double", True),
    _profile_col_sql("l_linenumber", "int", True),
    _profile_col_sql("l_returnflag", "string", False),
    _profile_col_sql("l_shipdate", "timestamp_ntz", False),
])


@_q("data_profile", _DATA_PROFILE_ORACLE)
def q_data_profile(spark, sf):
    """Whole-table column profile over four lineitem columns
    (quality.data_profile): one aggregation for every column's
    null/distinct/min/max/moment stats (exact count-distincts via
    Spark's Expand), compile-time pivot to one row per column."""
    from padua_spark.extensions.quality import data_profile

    li = _t(spark, sf, "lineitem")
    return data_profile(
        li, ["l_quantity", "l_linenumber", "l_returnflag", "l_shipdate"]
    )


_JSON_PROFILE_ORACLE = """
WITH base AS (
  SELECT props AS j FROM events WHERE props IS NOT NULL
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM base),
kv AS (
  SELECT u.k AS key, json_extract_string(base.j, '$.' || u.k) AS v
  FROM base, unnest(json_keys(base.j)) AS u(k)
),
per AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n_present,
    CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
    CAST(sum(CASE WHEN TRY_CAST(v AS DOUBLE) IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS num,
    min(v) AS min_value, max(v) AS max_value
  FROM kv GROUP BY 1
)
SELECT key, n_present,
  round(CAST(n_present AS DOUBLE) / tot.t, 6) AS presence_rate,
  n_distinct,
  round(CAST(num AS DOUBLE) / n_present, 6) AS frac_numeric,
  min_value, max_value
FROM per CROSS JOIN tot
"""


@_q("json_profile", _JSON_PROFILE_ORACLE)
def q_json_profile(spark, sf):
    """Per-key profile of the events props JSON column
    (quality.json_profile): from_json to map<string,string>, one
    explode + groupBy(key), broadcast 1-row total — presence,
    cardinality, numeric-fraction, value range per key."""
    from padua_spark.extensions.quality import json_profile

    e = _t(spark, sf, "events")
    return json_profile(e, "props")


_BENFORD_ORACLE = """
WITH v0 AS (
  SELECT CAST(round(CAST(value AS DOUBLE) * 100) AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL
),
base AS (
  SELECT CAST(left(CAST(CAST(floor(abs(v)) AS BIGINT) AS VARCHAR),
                   1) AS INT) AS digit
  FROM v0 WHERE abs(v) >= 1
),
per AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1
),
st AS (
  SELECT digit, n,
    CAST(n AS DOUBLE) / (sum(CAST(n AS DOUBLE)) OVER ()) AS obs,
    CASE digit
      WHEN 1 THEN CAST(0.3010299956639812 AS DOUBLE)
      WHEN 2 THEN CAST(0.17609125905568124 AS DOUBLE)
      WHEN 3 THEN CAST(0.12493873660829993 AS DOUBLE)
      WHEN 4 THEN CAST(0.09691001300805642 AS DOUBLE)
      WHEN 5 THEN CAST(0.07918124604762482 AS DOUBLE)
      WHEN 6 THEN CAST(0.06694678963061322 AS DOUBLE)
      WHEN 7 THEN CAST(0.05799194697768673 AS DOUBLE)
      WHEN 8 THEN CAST(0.05115252244738129 AS DOUBLE)
      WHEN 9 THEN CAST(0.04575749056067514 AS DOUBLE)
      ELSE CAST(0.0 AS DOUBLE) END AS expp,
    sum(CAST(n AS DOUBLE)) OVER () AS tot
  FROM per
),
zz AS (
  SELECT digit, n, obs, expp, tot,
    sum((CAST(n AS DOUBLE) - tot * expp)
        * (CAST(n AS DOUBLE) - tot * expp) / (tot * expp)) OVER ()
      + tot * (1.0 - sum(expp) OVER ()) AS chi2,
    (sum(abs(obs - expp)) OVER ()
      + (1.0 - sum(expp) OVER ())) / 9.0 AS mad
  FROM st
)
SELECT digit, n, round(obs, 6) AS observed_p,
  round(expp, 6) AS expected_p,
  round(chi2, 6) AS chi2,
  round(exp(-(chi2 / 2.0)) * (1.0 + chi2 / 2.0
    + (chi2 / 2.0) * (chi2 / 2.0) / 2.0
    + (chi2 / 2.0) * (chi2 / 2.0) * (chi2 / 2.0) / 6.0), 6)
    AS p_value,
  round(mad, 6) AS mad
FROM zz
"""


@_q("benford_test", _BENFORD_ORACLE)
def q_benford_test(spark, sf):
    """Benford first-digit conformity of event values in cents
    (quality.benford_test): string-sliced leading digit (no floating
    log10 floor), chi2(8) survival in closed form, Nigrini MAD."""
    from padua_spark.extensions.quality import benford_test

    e = _t(spark, sf, "events").select(
        F.round(F.col("value").cast("double") * 100).alias("cents")
    )
    return benford_test(e, "cents")


_HHI_ORACLE = """
WITH members AS (
  SELECT event_type, user_id, CAST(count(*) AS DOUBLE) AS m
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_members,
    sum(m) AS t, sum(m * m) AS sq
  FROM members GROUP BY 1
)
SELECT event_type, n_members,
  round(10000.0 * (sq / (t * t)), 6) AS hhi,
  round(CASE WHEN sq / (t * t) > 0
    THEN 1.0 / (sq / (t * t)) END, 6) AS effective_members
FROM agg
"""


@_q("hhi_concentration", _HHI_ORACLE)
def q_hhi_concentration(spark, sf):
    """Herfindahl-Hirschman concentration of user share within each
    event type (quality.hhi_concentration): two nested map-side
    aggregations, the data-mix domination monitor."""
    from padua_spark.extensions.quality import hhi_concentration

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull()
    )
    return hhi_concentration(e, ["event_type"], "user_id")


_LILLIEFORS_ORACLE = """
WITH per AS (
  SELECT CAST(l_quantity AS DOUBLE) AS v,
    CAST(count(*) AS BIGINT) AS c
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1
),
run AS (
  SELECT *, sum(c) OVER (ORDER BY v
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_run,
    sum(c) OVER () AS c_tot
  FROM per
),
mom AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
    sum(v * c) AS s1, sum(v * v * c) AS s2
  FROM per
),
ms AS (
  SELECT n, CAST(n AS DOUBLE) AS nd, s1 / CAST(n AS DOUBLE) AS mu,
    sqrt((s2 - CAST(n AS DOUBLE) * (s1 / CAST(n AS DOUBLE))
              * (s1 / CAST(n AS DOUBLE)))
         / (CAST(n AS DOUBLE) - 1.0)) AS sd
  FROM mom
),
gaps AS (
  SELECT ms.n, ms.mu, ms.sd,
    greatest(
      abs(CAST(c_run AS DOUBLE) / CAST(c_tot AS DOUBLE)
        - (1.0 - (CASE WHEN (v - mu) / sd >= 0
            THEN ((0.254829592 * tt + -0.284496736 * tt * tt
              + 1.421413741 * tt * tt * tt
              + -1.453152027 * tt * tt * tt * tt
              + 1.061405429 * tt * tt * tt * tt * tt)
              * exp(-xx * xx)) / 2.0
            ELSE 1.0 - ((0.254829592 * tt + -0.284496736 * tt * tt
              + 1.421413741 * tt * tt * tt
              + -1.453152027 * tt * tt * tt * tt
              + 1.061405429 * tt * tt * tt * tt * tt)
              * exp(-xx * xx)) / 2.0 END))),
      abs(CAST(c_run - c AS DOUBLE) / CAST(c_tot AS DOUBLE)
        - (1.0 - (CASE WHEN (v - mu) / sd >= 0
            THEN ((0.254829592 * tt + -0.284496736 * tt * tt
              + 1.421413741 * tt * tt * tt
              + -1.453152027 * tt * tt * tt * tt
              + 1.061405429 * tt * tt * tt * tt * tt)
              * exp(-xx * xx)) / 2.0
            ELSE 1.0 - ((0.254829592 * tt + -0.284496736 * tt * tt
              + 1.421413741 * tt * tt * tt
              + -1.453152027 * tt * tt * tt * tt
              + 1.061405429 * tt * tt * tt * tt * tt)
              * exp(-xx * xx)) / 2.0 END)))) AS gap
  FROM run CROSS JOIN ms,
    LATERAL (SELECT abs((v - mu) / sd) / sqrt(2.0) AS xx) lx,
    LATERAL (SELECT 1.0 / (1.0 + 0.3275911 * xx) AS tt) lt
),
dd AS (
  SELECT n, mu, sd, max(gap) AS d FROM gaps GROUP BY 1, 2, 3
),
adj AS (
  SELECT *,
    CASE WHEN CAST(n AS DOUBLE) > 100.0
      THEN d * pow(CAST(n AS DOUBLE) / 100.0, 0.49) ELSE d END
      AS d_adj,
    CASE WHEN CAST(n AS DOUBLE) > 100.0
      THEN CAST(100.0 AS DOUBLE) ELSE CAST(n AS DOUBLE) END AS n_adj
  FROM dd
)
SELECT n, round(mu, 6) AS mean, round(sd, 6) AS sd,
  round(d, 6) AS d_stat,
  round(least(CAST(1.0 AS DOUBLE), greatest(CAST(0.0 AS DOUBLE),
    exp(-7.01256 * d_adj * d_adj * (n_adj + 2.78019)
        + 2.99587 * d_adj * sqrt(n_adj + 2.78019)
        - 0.122119 + 0.974598 / sqrt(n_adj)
        + 1.67997 / n_adj))), 6) AS p_value
FROM adj
"""


@_q("lilliefors_normal", _LILLIEFORS_ORACLE)
def q_lilliefors_normal(spark, sf):
    """Lilliefors normality of quantities (stats.lilliefors_normal):
    KS-D against the normal with ESTIMATED mean/sd (moments from the
    same per-value counts frame — zero extra scans), Dallal-Wilkinson
    closed-form p."""
    from padua_spark.operators.stats import lilliefors_normal

    li = _t(spark, sf, "lineitem")
    return lilliefors_normal(li, "l_quantity")


_BOXCOX_ORACLE = """
WITH base AS (
  SELECT CAST(l_quantity AS DOUBLE) AS v FROM lineitem
  WHERE l_quantity IS NOT NULL
),
a AS (
  SELECT CAST(count(CASE WHEN v > 0 THEN 1 END) AS BIGINT) AS n,
    CAST(count(CASE WHEN v <= 0 THEN 1 END) AS BIGINT) AS n_nonpos,
    CAST(count(CASE WHEN v > 0 THEN 1 END) AS DOUBLE) AS nd,
    sum(CASE WHEN v > 0 THEN ln(v) END) AS slog,
    sum((pow(v, CAST(-2.0 AS DOUBLE)) - 1.0) / CAST(-2.0 AS DOUBLE)) AS s1_0,
    sum(((pow(v, CAST(-2.0 AS DOUBLE)) - 1.0) / CAST(-2.0 AS DOUBLE)) * ((pow(v, CAST(-2.0 AS DOUBLE)) - 1.0) / CAST(-2.0 AS DOUBLE))) AS s2_0,
    sum((pow(v, CAST(-1.75 AS DOUBLE)) - 1.0) / CAST(-1.75 AS DOUBLE)) AS s1_1,
    sum(((pow(v, CAST(-1.75 AS DOUBLE)) - 1.0) / CAST(-1.75 AS DOUBLE)) * ((pow(v, CAST(-1.75 AS DOUBLE)) - 1.0) / CAST(-1.75 AS DOUBLE))) AS s2_1,
    sum((pow(v, CAST(-1.5 AS DOUBLE)) - 1.0) / CAST(-1.5 AS DOUBLE)) AS s1_2,
    sum(((pow(v, CAST(-1.5 AS DOUBLE)) - 1.0) / CAST(-1.5 AS DOUBLE)) * ((pow(v, CAST(-1.5 AS DOUBLE)) - 1.0) / CAST(-1.5 AS DOUBLE))) AS s2_2,
    sum((pow(v, CAST(-1.25 AS DOUBLE)) - 1.0) / CAST(-1.25 AS DOUBLE)) AS s1_3,
    sum(((pow(v, CAST(-1.25 AS DOUBLE)) - 1.0) / CAST(-1.25 AS DOUBLE)) * ((pow(v, CAST(-1.25 AS DOUBLE)) - 1.0) / CAST(-1.25 AS DOUBLE))) AS s2_3,
    sum((pow(v, CAST(-1.0 AS DOUBLE)) - 1.0) / CAST(-1.0 AS DOUBLE)) AS s1_4,
    sum(((pow(v, CAST(-1.0 AS DOUBLE)) - 1.0) / CAST(-1.0 AS DOUBLE)) * ((pow(v, CAST(-1.0 AS DOUBLE)) - 1.0) / CAST(-1.0 AS DOUBLE))) AS s2_4,
    sum((pow(v, CAST(-0.75 AS DOUBLE)) - 1.0) / CAST(-0.75 AS DOUBLE)) AS s1_5,
    sum(((pow(v, CAST(-0.75 AS DOUBLE)) - 1.0) / CAST(-0.75 AS DOUBLE)) * ((pow(v, CAST(-0.75 AS DOUBLE)) - 1.0) / CAST(-0.75 AS DOUBLE))) AS s2_5,
    sum((pow(v, CAST(-0.5 AS DOUBLE)) - 1.0) / CAST(-0.5 AS DOUBLE)) AS s1_6,
    sum(((pow(v, CAST(-0.5 AS DOUBLE)) - 1.0) / CAST(-0.5 AS DOUBLE)) * ((pow(v, CAST(-0.5 AS DOUBLE)) - 1.0) / CAST(-0.5 AS DOUBLE))) AS s2_6,
    sum((pow(v, CAST(-0.25 AS DOUBLE)) - 1.0) / CAST(-0.25 AS DOUBLE)) AS s1_7,
    sum(((pow(v, CAST(-0.25 AS DOUBLE)) - 1.0) / CAST(-0.25 AS DOUBLE)) * ((pow(v, CAST(-0.25 AS DOUBLE)) - 1.0) / CAST(-0.25 AS DOUBLE))) AS s2_7,
    sum(ln(v)) AS s1_8,
    sum((ln(v)) * (ln(v))) AS s2_8,
    sum((pow(v, CAST(0.25 AS DOUBLE)) - 1.0) / CAST(0.25 AS DOUBLE)) AS s1_9,
    sum(((pow(v, CAST(0.25 AS DOUBLE)) - 1.0) / CAST(0.25 AS DOUBLE)) * ((pow(v, CAST(0.25 AS DOUBLE)) - 1.0) / CAST(0.25 AS DOUBLE))) AS s2_9,
    sum((pow(v, CAST(0.5 AS DOUBLE)) - 1.0) / CAST(0.5 AS DOUBLE)) AS s1_10,
    sum(((pow(v, CAST(0.5 AS DOUBLE)) - 1.0) / CAST(0.5 AS DOUBLE)) * ((pow(v, CAST(0.5 AS DOUBLE)) - 1.0) / CAST(0.5 AS DOUBLE))) AS s2_10,
    sum((pow(v, CAST(0.75 AS DOUBLE)) - 1.0) / CAST(0.75 AS DOUBLE)) AS s1_11,
    sum(((pow(v, CAST(0.75 AS DOUBLE)) - 1.0) / CAST(0.75 AS DOUBLE)) * ((pow(v, CAST(0.75 AS DOUBLE)) - 1.0) / CAST(0.75 AS DOUBLE))) AS s2_11,
    sum((pow(v, CAST(1.0 AS DOUBLE)) - 1.0) / CAST(1.0 AS DOUBLE)) AS s1_12,
    sum(((pow(v, CAST(1.0 AS DOUBLE)) - 1.0) / CAST(1.0 AS DOUBLE)) * ((pow(v, CAST(1.0 AS DOUBLE)) - 1.0) / CAST(1.0 AS DOUBLE))) AS s2_12,
    sum((pow(v, CAST(1.25 AS DOUBLE)) - 1.0) / CAST(1.25 AS DOUBLE)) AS s1_13,
    sum(((pow(v, CAST(1.25 AS DOUBLE)) - 1.0) / CAST(1.25 AS DOUBLE)) * ((pow(v, CAST(1.25 AS DOUBLE)) - 1.0) / CAST(1.25 AS DOUBLE))) AS s2_13,
    sum((pow(v, CAST(1.5 AS DOUBLE)) - 1.0) / CAST(1.5 AS DOUBLE)) AS s1_14,
    sum(((pow(v, CAST(1.5 AS DOUBLE)) - 1.0) / CAST(1.5 AS DOUBLE)) * ((pow(v, CAST(1.5 AS DOUBLE)) - 1.0) / CAST(1.5 AS DOUBLE))) AS s2_14,
    sum((pow(v, CAST(1.75 AS DOUBLE)) - 1.0) / CAST(1.75 AS DOUBLE)) AS s1_15,
    sum(((pow(v, CAST(1.75 AS DOUBLE)) - 1.0) / CAST(1.75 AS DOUBLE)) * ((pow(v, CAST(1.75 AS DOUBLE)) - 1.0) / CAST(1.75 AS DOUBLE))) AS s2_15,
    sum((pow(v, CAST(2.0 AS DOUBLE)) - 1.0) / CAST(2.0 AS DOUBLE)) AS s1_16,
    sum(((pow(v, CAST(2.0 AS DOUBLE)) - 1.0) / CAST(2.0 AS DOUBLE)) * ((pow(v, CAST(2.0 AS DOUBLE)) - 1.0) / CAST(2.0 AS DOUBLE))) AS s2_16
  FROM (SELECT v FROM base WHERE v > 0)
),
st AS (
  SELECT CAST(-2.0 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_0 / nd - (s1_0 / nd) * (s1_0 / nd) > 0
      THEN -nd / 2.0 * ln(s2_0 / nd - (s1_0 / nd) * (s1_0 / nd))
        + (CAST(-2.0 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(-1.75 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_1 / nd - (s1_1 / nd) * (s1_1 / nd) > 0
      THEN -nd / 2.0 * ln(s2_1 / nd - (s1_1 / nd) * (s1_1 / nd))
        + (CAST(-1.75 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(-1.5 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_2 / nd - (s1_2 / nd) * (s1_2 / nd) > 0
      THEN -nd / 2.0 * ln(s2_2 / nd - (s1_2 / nd) * (s1_2 / nd))
        + (CAST(-1.5 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(-1.25 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_3 / nd - (s1_3 / nd) * (s1_3 / nd) > 0
      THEN -nd / 2.0 * ln(s2_3 / nd - (s1_3 / nd) * (s1_3 / nd))
        + (CAST(-1.25 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(-1.0 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_4 / nd - (s1_4 / nd) * (s1_4 / nd) > 0
      THEN -nd / 2.0 * ln(s2_4 / nd - (s1_4 / nd) * (s1_4 / nd))
        + (CAST(-1.0 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(-0.75 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_5 / nd - (s1_5 / nd) * (s1_5 / nd) > 0
      THEN -nd / 2.0 * ln(s2_5 / nd - (s1_5 / nd) * (s1_5 / nd))
        + (CAST(-0.75 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(-0.5 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_6 / nd - (s1_6 / nd) * (s1_6 / nd) > 0
      THEN -nd / 2.0 * ln(s2_6 / nd - (s1_6 / nd) * (s1_6 / nd))
        + (CAST(-0.5 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(-0.25 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_7 / nd - (s1_7 / nd) * (s1_7 / nd) > 0
      THEN -nd / 2.0 * ln(s2_7 / nd - (s1_7 / nd) * (s1_7 / nd))
        + (CAST(-0.25 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(0.0 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_8 / nd - (s1_8 / nd) * (s1_8 / nd) > 0
      THEN -nd / 2.0 * ln(s2_8 / nd - (s1_8 / nd) * (s1_8 / nd))
        + (CAST(0.0 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(0.25 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_9 / nd - (s1_9 / nd) * (s1_9 / nd) > 0
      THEN -nd / 2.0 * ln(s2_9 / nd - (s1_9 / nd) * (s1_9 / nd))
        + (CAST(0.25 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(0.5 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_10 / nd - (s1_10 / nd) * (s1_10 / nd) > 0
      THEN -nd / 2.0 * ln(s2_10 / nd - (s1_10 / nd) * (s1_10 / nd))
        + (CAST(0.5 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(0.75 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_11 / nd - (s1_11 / nd) * (s1_11 / nd) > 0
      THEN -nd / 2.0 * ln(s2_11 / nd - (s1_11 / nd) * (s1_11 / nd))
        + (CAST(0.75 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(1.0 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_12 / nd - (s1_12 / nd) * (s1_12 / nd) > 0
      THEN -nd / 2.0 * ln(s2_12 / nd - (s1_12 / nd) * (s1_12 / nd))
        + (CAST(1.0 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(1.25 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_13 / nd - (s1_13 / nd) * (s1_13 / nd) > 0
      THEN -nd / 2.0 * ln(s2_13 / nd - (s1_13 / nd) * (s1_13 / nd))
        + (CAST(1.25 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(1.5 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_14 / nd - (s1_14 / nd) * (s1_14 / nd) > 0
      THEN -nd / 2.0 * ln(s2_14 / nd - (s1_14 / nd) * (s1_14 / nd))
        + (CAST(1.5 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(1.75 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_15 / nd - (s1_15 / nd) * (s1_15 / nd) > 0
      THEN -nd / 2.0 * ln(s2_15 / nd - (s1_15 / nd) * (s1_15 / nd))
        + (CAST(1.75 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
  UNION ALL
  SELECT CAST(2.0 AS DOUBLE) AS lam, n, n_nonpos,
    CASE WHEN n >= 2 AND s2_16 / nd - (s1_16 / nd) * (s1_16 / nd) > 0
      THEN -nd / 2.0 * ln(s2_16 / nd - (s1_16 / nd) * (s1_16 / nd))
        + (CAST(2.0 AS DOUBLE) - 1.0) * slog END AS ll
  FROM a
)
SELECT lam, n, n_nonpos, round(ll, 6) AS loglik,
  (ll IS NOT NULL AND rank() OVER (
     ORDER BY (ll IS NULL), ll DESC, lam ASC) = 1) AS is_best
FROM st
"""


@_q("boxcox_lambda", _BOXCOX_ORACLE)
def q_boxcox_lambda(spark, sf):
    """Box-Cox profile-likelihood lambda selection on quantities over
    the fixed -2..2 grid (stats.boxcox_lambda): one aggregation
    computes every lambda's moments, fixed grid for engine
    reproducibility."""
    from padua_spark.operators.stats import boxcox_lambda

    li = _t(spark, sf, "lineitem")
    return boxcox_lambda(li, "l_quantity")


_JACKKNIFE_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS g,
    CAST(round(l_extendedprice * 100) AS DOUBLE) AS x,
    CAST(l_quantity AS DOUBLE) AS y
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
),
tot AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
    sum(x) AS sx, sum(y) AS sy
  FROM base GROUP BY 1
),
th AS (
  SELECT b.g, t.n, t.sx, t.sy,
    CASE WHEN t.sy - b.y <> 0
      THEN (t.sx - b.x) / (t.sy - b.y) END AS ti
  FROM base b JOIN tot t ON t.g = b.g
),
agg AS (
  SELECT g, max(n) AS n, max(sx) AS tx, max(sy) AS ty,
    CAST(count(ti) AS BIGINT) AS n_ok,
    sum(ti) AS st, sum(ti * ti) AS stt
  FROM th GROUP BY 1
),
z AS (
  SELECT g, n, CAST(n AS DOUBLE) AS nd, tx, ty, n_ok, st, stt,
    n >= 2 AND n_ok = n AND ty <> 0 AS ok
  FROM agg
)
SELECT g AS l_returnflag, n,
  round(CASE WHEN ty <> 0 THEN tx / ty END, 6) AS ratio,
  round(CASE WHEN ok
    THEN nd * (tx / ty) - (nd - 1.0) * (st / nd) END, 6)
    AS ratio_jack,
  round(CASE WHEN ok
    THEN sqrt((nd - 1.0) / nd
              * (stt - nd * (st / nd) * (st / nd))) END, 6)
    AS se_jack
FROM z
"""


@_q("jackknife_ratio", _JACKKNIFE_ORACLE)
def q_jackknife_ratio(spark, sf):
    """Jackknife SE of price-per-unit (cents per quantity) per return
    flag (stats.jackknife_ratio): deterministic leave-one-out from
    broadcast totals — no resampling draws, engine-identical."""
    from padua_spark.operators.stats import jackknife_ratio

    li = _t(spark, sf, "lineitem").withColumn(
        "_cents", F.round(F.col("l_extendedprice") * 100)
    )
    return jackknife_ratio(
        li, "_cents", "l_quantity", ["l_returnflag"]
    ).withColumnRenamed("l_returnflag", "l_returnflag")


_SMD_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS c1,
    CAST(round(l_discount * 100) AS DOUBLE) AS c2,
    CAST(l_linenumber AS DOUBLE) AS c3
  FROM lineitem WHERE l_returnflag IN ('A', 'R')
),
a AS (
  SELECT
    CAST(count(CASE WHEN g = 'A' AND c1 IS NOT NULL THEN 1 END)
      AS BIGINT) AS na1,
    CAST(count(CASE WHEN g = 'R' AND c1 IS NOT NULL THEN 1 END)
      AS BIGINT) AS nb1,
    sum(CASE WHEN g = 'A' THEN c1 END) AS sa1,
    sum(CASE WHEN g = 'R' THEN c1 END) AS sb1,
    sum(CASE WHEN g = 'A' THEN c1 * c1 END) AS qa1,
    sum(CASE WHEN g = 'R' THEN c1 * c1 END) AS qb1,
    CAST(count(CASE WHEN g = 'A' AND c2 IS NOT NULL THEN 1 END)
      AS BIGINT) AS na2,
    CAST(count(CASE WHEN g = 'R' AND c2 IS NOT NULL THEN 1 END)
      AS BIGINT) AS nb2,
    sum(CASE WHEN g = 'A' THEN c2 END) AS sa2,
    sum(CASE WHEN g = 'R' THEN c2 END) AS sb2,
    sum(CASE WHEN g = 'A' THEN c2 * c2 END) AS qa2,
    sum(CASE WHEN g = 'R' THEN c2 * c2 END) AS qb2,
    CAST(count(CASE WHEN g = 'A' AND c3 IS NOT NULL THEN 1 END)
      AS BIGINT) AS na3,
    CAST(count(CASE WHEN g = 'R' AND c3 IS NOT NULL THEN 1 END)
      AS BIGINT) AS nb3,
    sum(CASE WHEN g = 'A' THEN c3 END) AS sa3,
    sum(CASE WHEN g = 'R' THEN c3 END) AS sb3,
    sum(CASE WHEN g = 'A' THEN c3 * c3 END) AS qa3,
    sum(CASE WHEN g = 'R' THEN c3 * c3 END) AS qb3
  FROM base
),
st AS (
  SELECT 'l_quantity' AS covariate, na1 AS n_a, nb1 AS n_b,
    sa1 / CAST(na1 AS DOUBLE) AS ma, sb1 / CAST(nb1 AS DOUBLE) AS mb,
    (qa1 - CAST(na1 AS DOUBLE) * (sa1 / CAST(na1 AS DOUBLE))
         * (sa1 / CAST(na1 AS DOUBLE))) / (CAST(na1 AS DOUBLE) - 1.0)
      AS va,
    (qb1 - CAST(nb1 AS DOUBLE) * (sb1 / CAST(nb1 AS DOUBLE))
         * (sb1 / CAST(nb1 AS DOUBLE))) / (CAST(nb1 AS DOUBLE) - 1.0)
      AS vb
  FROM a
  UNION ALL
  SELECT '_disc100', na2, nb2,
    sa2 / CAST(na2 AS DOUBLE), sb2 / CAST(nb2 AS DOUBLE),
    (qa2 - CAST(na2 AS DOUBLE) * (sa2 / CAST(na2 AS DOUBLE))
         * (sa2 / CAST(na2 AS DOUBLE))) / (CAST(na2 AS DOUBLE) - 1.0),
    (qb2 - CAST(nb2 AS DOUBLE) * (sb2 / CAST(nb2 AS DOUBLE))
         * (sb2 / CAST(nb2 AS DOUBLE))) / (CAST(nb2 AS DOUBLE) - 1.0)
  FROM a
  UNION ALL
  SELECT 'l_linenumber', na3, nb3,
    sa3 / CAST(na3 AS DOUBLE), sb3 / CAST(nb3 AS DOUBLE),
    (qa3 - CAST(na3 AS DOUBLE) * (sa3 / CAST(na3 AS DOUBLE))
         * (sa3 / CAST(na3 AS DOUBLE))) / (CAST(na3 AS DOUBLE) - 1.0),
    (qb3 - CAST(nb3 AS DOUBLE) * (sb3 / CAST(nb3 AS DOUBLE))
         * (sb3 / CAST(nb3 AS DOUBLE))) / (CAST(nb3 AS DOUBLE) - 1.0)
  FROM a
),
z AS (
  SELECT covariate, n_a, n_b, ma, mb,
    CASE WHEN n_a >= 2 AND n_b >= 2 AND sqrt((va + vb) / 2.0) > 0
      THEN (ma - mb) / sqrt((va + vb) / 2.0) END AS smd
  FROM st
)
SELECT covariate, n_a, n_b, round(ma, 6) AS mean_a,
  round(mb, 6) AS mean_b, round(smd, 6) AS smd,
  CASE WHEN smd IS NOT NULL THEN abs(smd) < 0.1 END AS balanced
FROM z
"""


@_q("smd_balance", _SMD_ORACLE)
def q_smd_balance(spark, sf):
    """Standardized-mean-difference covariate balance between return
    flags A and R over three covariates (stats.smd_balance): one
    conditional aggregation, one stack — the randomization audit."""
    from padua_spark.operators.stats import smd_balance

    li = _t(spark, sf, "lineitem").withColumn(
        "_disc100", F.round(F.col("l_discount") * 100)
    )
    return smd_balance(
        li, "l_returnflag",
        ["l_quantity", "_disc100", "l_linenumber"], "A", "R",
    )


_DELTA_CI_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS g,
    CAST(round(l_extendedprice * 100) AS DOUBLE) AS x,
    CAST(l_quantity AS DOUBLE) AS y
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
),
a AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
    sum(y * y) AS syy, sum(x * y) AS sxy
  FROM base GROUP BY 1
),
m AS (
  SELECT g, n, CAST(n AS DOUBLE) AS nd, sx, sy,
    sx / CAST(n AS DOUBLE) AS mx, sy / CAST(n AS DOUBLE) AS my,
    (sxx - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE))
         * (sx / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)
      AS vx,
    (syy - CAST(n AS DOUBLE) * (sy / CAST(n AS DOUBLE))
         * (sy / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)
      AS vy,
    (sxy - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE))
         * (sy / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)
      AS cxy
  FROM a
),
z AS (
  SELECT g, n,
    CASE WHEN n >= 2 AND sy <> 0 THEN sx / sy END AS theta,
    CASE WHEN n >= 2 AND sy <> 0 THEN
      sqrt((vx - 2.0 * (sx / sy) * cxy
            + (sx / sy) * (sx / sy) * vy) / (nd * my * my)) END
      AS se
  FROM m
)
SELECT g AS l_returnflag, n, round(theta, 6) AS ratio,
  round(se, 6) AS se_delta,
  round(theta - CAST(1.959963984540054 AS DOUBLE) * se, 6) AS ci_lo,
  round(theta + CAST(1.959963984540054 AS DOUBLE) * se, 6) AS ci_hi
FROM z
"""


@_q("ratio_delta_ci", _DELTA_CI_ORACLE)
def q_ratio_delta_ci(spark, sf):
    """Delta-method CI for cents-per-unit by return flag
    (stats.ratio_delta_ci): first-order Taylor variance of the
    ratio-of-sums, one aggregation."""
    from padua_spark.operators.stats import ratio_delta_ci

    li = _t(spark, sf, "lineitem").withColumn(
        "_cents", F.round(F.col("l_extendedprice") * 100)
    )
    return ratio_delta_ci(
        li, "_cents", "l_quantity", ["l_returnflag"]
    )


_WKAPPA_ORACLE = """
WITH base AS (
  SELECT CAST(l_linenumber AS DOUBLE) AS i,
    CAST(least(7, l_linenumber + CAST(l_quantity AS INT) % 2)
      AS DOUBLE) AS j
  FROM lineitem
  WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL
),
cells AS (
  SELECT i, j, CAST(count(*) AS BIGINT) AS o FROM base GROUP BY 1, 2
),
rm AS (SELECT i, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
cm AS (SELECT j, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
kc AS (
  SELECT CAST(count(DISTINCT cat) AS BIGINT) AS k_categories FROM (
    SELECT i AS cat FROM cells UNION ALL SELECT j FROM cells
  )
),
obs AS (
  SELECT CAST(sum(o) AS BIGINT) AS n,
    sum((i - j) * (i - j) * CAST(o AS DOUBLE)) AS wo
  FROM cells
),
ex AS (
  SELECT sum((rm.i - cm.j) * (rm.i - cm.j)
             * CAST(rm.r AS DOUBLE) * CAST(cm.c AS DOUBLE)) AS we_n
  FROM rm CROSS JOIN cm
)
SELECT n, k_categories,
  round(CASE WHEN we_n / CAST(n AS DOUBLE) > 0
    THEN 1.0 - wo / (we_n / CAST(n AS DOUBLE)) END, 6)
    AS kappa_weighted
FROM obs, ex, kc
"""


@_q("weighted_kappa", _WKAPPA_ORACLE)
def q_weighted_kappa(spark, sf):
    """Quadratic-weighted Cohen's kappa between linenumber and a
    deterministically perturbed copy (stats.weighted_kappa): bounded
    contingency cells, margins broadcast, exact integers until the
    final division."""
    from padua_spark.operators.stats import weighted_kappa

    li = _t(spark, sf, "lineitem").select(
        F.col("l_linenumber").alias("ra"),
        F.least(
            F.lit(7),
            F.col("l_linenumber")
            + F.col("l_quantity").cast("int") % 2,
        ).alias("rb"),
    )
    return weighted_kappa(li, "ra", "rb", "quadratic")


_BLAND_ALTMAN_ORACLE = """
WITH base AS (
  SELECT CAST(l_quantity AS DOUBLE)
    - (CAST(l_quantity AS DOUBLE) + round(l_discount * 100) - 3.0)
    AS d
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(d) AS s1,
    sum(d * d) AS s2
  FROM base
),
m AS (
  SELECT n, CAST(n AS DOUBLE) AS nd, s1 / CAST(n AS DOUBLE) AS bias,
    sqrt((s2 - CAST(n AS DOUBLE) * (s1 / CAST(n AS DOUBLE))
              * (s1 / CAST(n AS DOUBLE)))
         / (CAST(n AS DOUBLE) - 1.0)) AS sd
  FROM a
),
lim AS (
  SELECT n, nd, bias, sd,
    bias - CAST(1.959963984540054 AS DOUBLE) * sd AS lo,
    bias + CAST(1.959963984540054 AS DOUBLE) * sd AS hi
  FROM m
),
outc AS (
  SELECT CAST(sum(CASE WHEN b.d < lim.lo OR b.d > lim.hi
    THEN 1 ELSE 0 END) AS BIGINT) AS n_out
  FROM base b CROSS JOIN lim
)
SELECT lim.n, round(lim.bias, 6) AS bias, round(lim.sd, 6) AS sd_diff,
  round(lim.lo, 6) AS loa_lo, round(lim.hi, 6) AS loa_hi,
  round(CAST(outc.n_out AS DOUBLE) / lim.nd, 6) AS frac_outside
FROM lim, outc
"""


@_q("bland_altman", _BLAND_ALTMAN_ORACLE)
def q_bland_altman(spark, sf):
    """Bland-Altman limits of agreement between quantity and a
    discount-shifted copy (stats.bland_altman): bias, +-1.96sd
    limits, realized outside fraction."""
    from padua_spark.operators.stats import bland_altman

    li = _t(spark, sf, "lineitem").select(
        F.col("l_quantity").cast("double").alias("a"),
        (
            F.col("l_quantity").cast("double")
            + F.round(F.col("l_discount") * 100)
            - 3.0
        ).alias("b"),
    )
    return bland_altman(li, "a", "b")


_ICC_ORACLE = """
WITH cells AS (
  SELECT l_orderkey % 50 AS s, l_linenumber % 4 AS r,
    sum(CAST(l_quantity AS DOUBLE)) / count(*) AS v
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
    AND l_quantity IS NOT NULL
  GROUP BY 1, 2
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_obs, sum(v) AS g,
    sum(v * v) AS ss
  FROM cells
),
srow AS (
  SELECT CAST(count(*) AS BIGINT) AS n_subjects,
    sum(ts * ts) AS sts
  FROM (SELECT s, sum(v) AS ts FROM cells GROUP BY 1)
),
scol AS (
  SELECT CAST(count(*) AS BIGINT) AS k_raters,
    sum(tr * tr) AS str
  FROM (SELECT r, sum(v) AS tr FROM cells GROUP BY 1)
),
z AS (
  SELECT n_subjects, k_raters,
    CAST(n_subjects AS DOUBLE) AS n, CAST(k_raters AS DOUBLE) AS k,
    (sts / CAST(k_raters AS DOUBLE)
      - g * g / CAST(n_obs AS DOUBLE))
      / (CAST(n_subjects AS DOUBLE) - 1.0) AS msr,
    (str / CAST(n_subjects AS DOUBLE)
      - g * g / CAST(n_obs AS DOUBLE))
      / (CAST(k_raters AS DOUBLE) - 1.0) AS msc,
    ((ss - g * g / CAST(n_obs AS DOUBLE))
      - (sts / CAST(k_raters AS DOUBLE)
         - g * g / CAST(n_obs AS DOUBLE))
      - (str / CAST(n_subjects AS DOUBLE)
         - g * g / CAST(n_obs AS DOUBLE)))
      / ((CAST(n_subjects AS DOUBLE) - 1.0)
         * (CAST(k_raters AS DOUBLE) - 1.0)) AS mse
  FROM tot, srow, scol
)
SELECT n_subjects, k_raters, round(msr, 6) AS msr,
  round(msc, 6) AS msc, round(mse, 6) AS mse,
  round(CASE WHEN n >= 2 AND k >= 2
    AND msr + (k - 1.0) * mse + k / n * (msc - mse) <> 0
    THEN (msr - mse)
      / (msr + (k - 1.0) * mse + k / n * (msc - mse)) END, 6)
    AS icc
FROM z
"""


@_q("icc_2_1", _ICC_ORACLE)
def q_icc_2_1(spark, sf):
    """ICC(2,1) over a complete 50x4 pseudo-design of mean quantities
    (stats.icc_2_1): two-way random-effects absolute agreement from
    exact raw sums, completeness enforced."""
    from padua_spark.operators.stats import icc_2_1

    li = _t(spark, sf, "lineitem")
    cells = li.where(
        F.col("l_orderkey").isNotNull()
        & F.col("l_linenumber").isNotNull()
        & F.col("l_quantity").isNotNull()
    ).groupBy(
        (F.col("l_orderkey") % 50).alias("s"),
        (F.col("l_linenumber") % 4).alias("r"),
    ).agg(
        (
            F.sum(F.col("l_quantity").cast("double"))
            / F.count(F.lit(1))
        ).alias("v")
    )
    return icc_2_1(cells, "s", "r", "v")


_BOWKER_ORACLE = """
WITH base AS (
  SELECT l_linenumber AS i,
    least(7, l_linenumber + CAST(l_quantity AS INT) % 2) AS j
  FROM lineitem
  WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL
),
cells AS (
  SELECT i, j, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2
),
up AS (SELECT i, j, c FROM cells WHERE i < j),
dn AS (SELECT j AS i, i AS j, c AS c2 FROM cells WHERE i > j),
pairs AS (
  SELECT coalesce(up.c, 0) AS u, coalesce(dn.c2, 0) AS d
  FROM up FULL OUTER JOIN dn ON up.i = dn.i AND up.j = dn.j
),
kc AS (
  SELECT CAST(count(DISTINCT cat) AS BIGINT) AS k_categories FROM (
    SELECT i AS cat FROM cells UNION ALL SELECT j FROM cells
  )
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
agg AS (
  SELECT
    coalesce(sum(CASE WHEN u + d > 0 THEN
      CAST((u - d) * (u - d) AS DOUBLE) / CAST(u + d AS DOUBLE)
      END), 0.0) AS chi2,
    CAST(sum(CASE WHEN u + d > 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS dfree
  FROM pairs
)
SELECT n, k_categories, round(chi2, 6) AS chi2, dfree AS df,
  round(CASE WHEN dfree = 6 THEN exp(-(chi2 / 2.0))
      * (1.0 + chi2 / 2.0 + (chi2 / 2.0) * (chi2 / 2.0) / 2.0)
    WHEN dfree = 0 THEN 1.0 END, 6) AS p_value
FROM agg, tot, kc
"""


@_q("bowker_symmetry", _BOWKER_ORACLE)
def q_bowker_symmetry(spark, sf):
    """Bowker symmetry between linenumber and its perturbed copy
    (stats.bowker_symmetry): k-class McNemar over the discordant
    pairs; the entry design populates exactly the 6 adjacent pairs,
    so the oracle uses the even-df closed-form chi-square survival
    the engine's incomplete-gamma UDF reproduces."""
    from padua_spark.operators.stats import bowker_symmetry

    li = _t(spark, sf, "lineitem").select(
        F.col("l_linenumber").alias("ra"),
        F.least(
            F.lit(7),
            F.col("l_linenumber")
            + F.col("l_quantity").cast("int") % 2,
        ).alias("rb"),
    )
    return bowker_symmetry(li, "ra", "rb")


def _morans_oracle() -> str:
    return f"""
WITH mh AS ({_minhash_oracle()}),
e0 AS (
  SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
  FROM mh WHERE id_a <> id_b
),
vals AS (
  SELECT doc_id AS x, CAST(n_chars AS DOUBLE) AS val
  FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
),
e AS (
  SELECT e0.u, e0.v FROM e0
  JOIN vals a ON a.x = e0.u JOIN vals b ON b.x = e0.v
),
vs AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes, sum(val) AS s1,
    sum(val * val) AS s2
  FROM vals
),
cr AS (
  SELECT CAST(count(*) AS BIGINT) AS n_edges,
    sum(a.val * b.val) AS svv, sum(a.val + b.val) AS sends
  FROM e JOIN vals a ON a.x = e.u JOIN vals b ON b.x = e.v
),
dg AS (
  SELECT CAST(sum(CAST(d AS HUGEINT) * d) AS BIGINT) AS sdeg2
  FROM (
    SELECT x, count(*) AS d FROM (
      SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e
    ) GROUP BY x
  )
),
z0 AS (
  SELECT n_nodes, n_edges,
    CAST(n_nodes AS DOUBLE) AS n, CAST(n_edges AS DOUBLE) AS m,
    s1 / CAST(n_nodes AS DOUBLE) AS mean, s2, svv, sends,
    CAST(sdeg2 AS DOUBLE) AS sdeg2
  FROM vs, cr, dg
),
z1 AS (
  SELECT n_nodes, n_edges, n, m,
    CASE WHEN s2 - n * mean * mean > 0 AND m > 0
      THEN n / (2.0 * m)
        * (2.0 * (svv - mean * sends + m * mean * mean))
        / (s2 - n * mean * mean) END AS i_stat,
    -1.0 / (n - 1.0) AS e_i,
    (n * n * (4.0 * m) - n * (4.0 * sdeg2)
      + 3.0 * (2.0 * m) * (2.0 * m))
      / ((n * n - 1.0) * (2.0 * m) * (2.0 * m))
      - (-1.0 / (n - 1.0)) * (-1.0 / (n - 1.0)) AS var
  FROM z0
),
z2 AS (
  SELECT n_nodes, n_edges, i_stat, e_i,
    CASE WHEN i_stat IS NOT NULL AND var > 0
      THEN (i_stat - e_i) / sqrt(var) END AS z
  FROM z1
),
ee AS (
  SELECT *, abs(z) / sqrt(2.0) AS x,
    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
  FROM z2
)
SELECT n_nodes, n_edges, round(i_stat, 6) AS morans_i,
  round(e_i, 6) AS expected_i, round(z, 6) AS z,
  round(CASE WHEN z IS NOT NULL THEN
    (0.254829592 * t + -0.284496736 * t * t
     + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
     + 1.061405429 * t * t * t * t * t) * exp(-x * x) END, 6)
    AS p_value
FROM ee
"""


@_q("morans_i", _morans_oracle())
def q_morans_i(spark, sf):
    """Moran's I of document length over the MinHash candidate graph
    (stats.morans_i): do near-duplicate candidates share size? Graph
    homophily with the Cliff-Ord normality z."""
    from padua_spark.extensions import dedup as x_dedup
    from padua_spark.operators.stats import morans_i

    d = _t(spark, sf, "documents")
    cand = x_dedup.minhash_lsh_candidates(
        d, "doc_id", "text", k_shingle=3, num_hashes=32, bands=8,
        portable_keys=True,
    )
    vals = d.select(
        F.col("doc_id").alias("node"),
        F.col("n_chars").cast("double").alias("value"),
    )
    return morans_i(vals, cand)


_INEQUALITY_ORACLE = """
WITH base AS (
  SELECT event_type AS g,
    CAST(round(CAST(value AS DOUBLE) * 100) AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
a AS (
  SELECT g,
    CAST(count(CASE WHEN v > 0 THEN 1 END) AS BIGINT) AS n,
    CAST(count(CASE WHEN v <= 0 THEN 1 END) AS BIGINT) AS n_nonpos,
    sum(CASE WHEN v > 0 THEN v END) AS s1,
    sum(CASE WHEN v > 0 THEN v * ln(v) END) AS sxlx,
    sum(CASE WHEN v > 0 THEN pow(v, CAST(0.5 AS DOUBLE)) END)
      AS spow
  FROM base GROUP BY 1
),
m AS (
  SELECT g, n, n_nonpos, CAST(n AS DOUBLE) AS nd,
    s1 / CAST(n AS DOUBLE) AS mu, sxlx, spow
  FROM a
)
SELECT g AS event_type, n, n_nonpos,
  round(CASE WHEN n > 0 AND mu > 0 THEN mu END, 6) AS mean,
  round(CASE WHEN n > 0 AND mu > 0
    THEN sxlx / (nd * mu) - ln(mu) END, 6) AS theil_t,
  round(CASE WHEN n > 0 AND mu > 0
    THEN 1.0 - pow(spow / nd, CAST(2.0 AS DOUBLE)) / mu END, 6)
    AS atkinson
FROM m
"""


@_q("inequality_indices", _INEQUALITY_ORACLE)
def q_inequality_indices(spark, sf):
    """Theil T and Atkinson(0.5) inequality of event value (cents)
    per event type (stats.inequality_indices): one aggregation, the
    decomposable concentration monitors."""
    from padua_spark.operators.stats import inequality_indices

    e = _t(spark, sf, "events").select(
        F.col("event_type"),
        F.round(F.col("value").cast("double") * 100).alias("cents"),
    ).where(F.col("event_type").isNotNull())
    return inequality_indices(e, ["event_type"], "cents", 0.5)


_CRONBACH_ORACLE = """
WITH base AS (
  SELECT CAST(l_quantity AS DOUBLE) AS i1,
    CAST(l_linenumber AS DOUBLE) AS i2,
    CAST(round(l_discount * 100) AS DOUBLE) AS i3,
    CAST(l_quantity AS DOUBLE) + CAST(l_linenumber AS DOUBLE) AS i4
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_linenumber IS NOT NULL
    AND l_discount IS NOT NULL
),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    sum(i1) AS s1, sum(i1 * i1) AS q1,
    sum(i2) AS s2, sum(i2 * i2) AS q2,
    sum(i3) AS s3, sum(i3 * i3) AS q3,
    sum(i4) AS s4, sum(i4 * i4) AS q4,
    sum(i1 + i2 + i3 + i4) AS st,
    sum((i1 + i2 + i3 + i4) * (i1 + i2 + i3 + i4)) AS qt
  FROM base
),
m AS (
  SELECT n, CAST(n AS DOUBLE) AS nd,
    (q1 - CAST(n AS DOUBLE) * (s1 / CAST(n AS DOUBLE))
        * (s1 / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)
    + (q2 - CAST(n AS DOUBLE) * (s2 / CAST(n AS DOUBLE))
        * (s2 / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)
    + (q3 - CAST(n AS DOUBLE) * (s3 / CAST(n AS DOUBLE))
        * (s3 / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)
    + (q4 - CAST(n AS DOUBLE) * (s4 / CAST(n AS DOUBLE))
        * (s4 / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)
      AS sum_vi,
    (qt - CAST(n AS DOUBLE) * (st / CAST(n AS DOUBLE))
        * (st / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)
      AS vt
  FROM a
)
SELECT n, CAST(4 AS BIGINT) AS k_items,
  round(CASE WHEN n >= 2 AND vt > 0
    THEN CAST(4.0 / 3.0 AS DOUBLE) * (1.0 - sum_vi / vt) END, 6)
    AS alpha
FROM m
"""


@_q("cronbachs_alpha", _CRONBACH_ORACLE)
def q_cronbachs_alpha(spark, sf):
    """Cronbach's alpha over four lineitem 'items' (one correlated
    composite; stats.cronbachs_alpha): one aggregation carrying each
    item's exact sums plus the row-total moments."""
    from padua_spark.operators.stats import cronbachs_alpha

    li = _t(spark, sf, "lineitem").select(
        F.col("l_quantity").cast("double").alias("i1"),
        F.col("l_linenumber").cast("double").alias("i2"),
        F.round(F.col("l_discount") * 100).alias("i3"),
        (
            F.col("l_quantity").cast("double")
            + F.col("l_linenumber").cast("double")
        ).alias("i4"),
    )
    return cronbachs_alpha(li, ["i1", "i2", "i3", "i4"])


_STUART_MAXWELL_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS a,
    CASE WHEN CAST(l_quantity AS INT) % 5 = 0
      THEN 'R' ELSE l_returnflag END AS b
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
),
cells AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2
),
piv AS (
  SELECT
    CAST(sum(c) AS BIGINT) AS n,
    sum(CASE WHEN a = 'A' THEN c ELSE 0 END) AS r0,
    sum(CASE WHEN a = 'N' THEN c ELSE 0 END) AS r1,
    sum(CASE WHEN b = 'A' THEN c ELSE 0 END) AS c0,
    sum(CASE WHEN b = 'N' THEN c ELSE 0 END) AS c1,
    sum(CASE WHEN a = 'A' AND b = 'A' THEN c ELSE 0 END) AS m00,
    sum(CASE WHEN a = 'N' AND b = 'N' THEN c ELSE 0 END) AS m11,
    sum(CASE WHEN a = 'A' AND b = 'N' THEN c ELSE 0 END) AS m01,
    sum(CASE WHEN a = 'N' AND b = 'A' THEN c ELSE 0 END) AS m10
  FROM cells
),
z AS (
  SELECT n,
    CAST(r0 - c0 AS DOUBLE) AS d0, CAST(r1 - c1 AS DOUBLE) AS d1,
    CAST(r0 + c0 - 2 * m00 AS DOUBLE) AS v00,
    CAST(r1 + c1 - 2 * m11 AS DOUBLE) AS v11,
    CAST(-(m01 + m10) AS DOUBLE) AS v01
  FROM piv
),
s AS (
  SELECT n,
    CASE WHEN v00 * v11 - v01 * v01 <> 0 THEN
      (d0 * d0 * v11 - 2.0 * d0 * d1 * v01 + d1 * d1 * v00)
      / (v00 * v11 - v01 * v01) END AS chi2,
    d0 = 0 AND d1 = 0 AS is_zero
  FROM z
)
SELECT n, 3 AS k_categories,
  round(CASE WHEN is_zero THEN 0.0 ELSE chi2 END, 6) AS chi2,
  2 AS df,
  round(CASE WHEN is_zero THEN 1.0
    WHEN chi2 IS NOT NULL THEN exp(-(chi2 / 2.0)) END, 6)
    AS p_value
FROM s
"""


@_q("stuart_maxwell", _STUART_MAXWELL_ORACLE)
def q_stuart_maxwell(spark, sf):
    """Stuart-Maxwell marginal homogeneity between returnflag and a
    drift-toward-R copy (stats.stuart_maxwell): did the label MIX
    move? Bounded k x k collect, (k-1)-dim solve; the 3-category
    entry has the closed-form 2x2 inverse as its oracle, df=2 so the
    chi-square survival is exp(-x/2)."""
    from padua_spark.operators.stats import stuart_maxwell

    li = _t(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("ra"),
        F.when(
            F.col("l_quantity").cast("int") % 5 == 0, F.lit("R")
        ).otherwise(F.col("l_returnflag")).alias("rb"),
    )
    return stuart_maxwell(li, "ra", "rb")


_SCRIPT_PROFILE_ORACLE = r"""
SELECT doc_id, CAST(length(text) AS INT) AS n_chars_sp,
  round(CASE WHEN length(text) > 0 THEN
    CAST(length(text) - length(regexp_replace(text, '[\p{Latin}]',
      '', 'g')) AS DOUBLE) / length(text) END, 6) AS latin_frac,
  round(CASE WHEN length(text) > 0 THEN
    CAST(length(text) - length(regexp_replace(text, '[\p{Cyrillic}]',
      '', 'g')) AS DOUBLE) / length(text) END, 6) AS cyrillic_frac,
  round(CASE WHEN length(text) > 0 THEN
    CAST(length(text) - length(regexp_replace(text, '[\p{Han}]',
      '', 'g')) AS DOUBLE) / length(text) END, 6) AS han_frac,
  round(CASE WHEN length(text) > 0 THEN
    CAST(length(text) - length(regexp_replace(text, '[\p{Arabic}]',
      '', 'g')) AS DOUBLE) / length(text) END, 6) AS arabic_frac,
  round(CASE WHEN length(text) > 0 THEN
    CAST(length(text) - length(regexp_replace(text, '[0-9]',
      '', 'g')) AS DOUBLE) / length(text) END, 6) AS digit_frac,
  round(CASE WHEN length(text) > 0 THEN
    CAST(length(text) - length(regexp_replace(text, '[\s]',
      '', 'g')) AS DOUBLE) / length(text) END, 6) AS space_frac,
  round(CASE WHEN length(text) > 0 THEN greatest(CAST(0.0 AS DOUBLE),
    1.0
    - round(CAST(length(text) - length(regexp_replace(text,
        '[\p{Latin}]', '', 'g')) AS DOUBLE) / length(text), 6)
    - round(CAST(length(text) - length(regexp_replace(text,
        '[\p{Cyrillic}]', '', 'g')) AS DOUBLE) / length(text), 6)
    - round(CAST(length(text) - length(regexp_replace(text,
        '[\p{Han}]', '', 'g')) AS DOUBLE) / length(text), 6)
    - round(CAST(length(text) - length(regexp_replace(text,
        '[\p{Arabic}]', '', 'g')) AS DOUBLE) / length(text), 6)
    - round(CAST(length(text) - length(regexp_replace(text,
        '[0-9]', '', 'g')) AS DOUBLE) / length(text), 6)
    - round(CAST(length(text) - length(regexp_replace(text,
        '[\s]', '', 'g')) AS DOUBLE) / length(text), 6)) END, 6)
    AS other_frac
FROM documents WHERE text IS NOT NULL
"""


@_q("script_profile", _SCRIPT_PROFILE_ORACLE)
def q_script_profile(spark, sf):
    """Unicode-script composition per document (text.script_profile):
    the mixed-script / wrong-corpus screen, pure scan-level regexp
    length differences."""
    from padua_spark.extensions.text import script_profile

    d = _t(spark, sf, "documents").where(F.col("text").isNotNull())
    return script_profile(d, "text").select(
        "doc_id", "n_chars_sp", "latin_frac", "cyrillic_frac",
        "han_frac", "arabic_frac", "digit_frac", "space_frac",
        "other_frac",
    )


_MOJIBAKE_ORACLE = """
WITH d AS (
  SELECT doc_id,
    text || CASE WHEN doc_id % 7 = 0
      THEN ' ' || chr(195) || chr(169) || chr(226) || chr(8364)
           || chr(65533)
      ELSE '' END AS t
  FROM documents WHERE text IS NOT NULL
),
s AS (
  SELECT doc_id, length(t) AS n,
    length(t) - length(regexp_replace(t, chr(65533), '', 'g'))
      AS n_rep,
    (length(t) - length(regexp_replace(t,
      '(' || chr(195) || '[' || chr(128) || '-' || chr(191) || ']|'
      || chr(226) || chr(8364) || ')', '', 'g'))) // 2 AS n_art,
    regexp_replace(t,
      '(' || chr(195) || '[' || chr(128) || '-' || chr(191) || ']|'
      || chr(226) || chr(8364) || ')', '', 'g') AS t_stripped
  FROM d
),
c AS (
  -- controls on the artifact-stripped text: no double count of a
  -- damaged bigram's C1 second byte (mirrors the operator)
  SELECT doc_id, n, n_rep, n_art,
    length(t_stripped) - length(regexp_replace(t_stripped,
      '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f' || chr(128) || '-'
      || chr(159) || ']', '', 'g')) AS n_ctl
  FROM s
)
SELECT doc_id, CAST(n_rep AS BIGINT) AS n_replacement,
  CAST(n_ctl AS BIGINT) AS n_control,
  CAST(n_art AS BIGINT) AS n_artifact,
  round(CASE WHEN n > 0 THEN
    CAST(n_rep + n_ctl + n_art AS DOUBLE) * 1000.0
    / CAST(n AS DOUBLE) END, 6) AS mojibake_per_kchar
FROM c
"""


@_q("mojibake_score", _MOJIBAKE_ORACLE)
def q_mojibake_score(spark, sf):
    """Encoding-damage screen with planted UTF-8-as-Latin-1 artifact
    suffixes on every 7th document (text.mojibake_score): replacement
    chars, stray controls, artifact bigrams per 1000 chars."""
    from padua_spark.extensions.text import mojibake_score

    d = _t(spark, sf, "documents").where(
        F.col("text").isNotNull()
    ).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit(" Ã©â€�"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return mojibake_score(d, "text").select(
        "doc_id", "n_replacement", "n_control", "n_artifact",
        "mojibake_per_kchar",
    )


_RBO_ORACLE = """
WITH u AS (
  SELECT user_id,
    CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT))
      AS BIGINT) AS total_cents,
    CAST(count(*) AS BIGINT) AS n_events
  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
),
ranked AS (
  SELECT user_id,
    CAST(row_number() OVER (ORDER BY total_cents DESC, user_id)
      AS INT) AS ra,
    CAST(row_number() OVER (ORDER BY n_events DESC, user_id)
      AS INT) AS rb
  FROM u
),
w AS (
  SELECT ranked.*, greatest(ra, rb) AS m,
    ra <= 20 AND rb <= 20 AS in_both,
    [CAST(0.25148330373855504 AS DOUBLE), CAST(0.1514833037385551 AS DOUBLE), CAST(0.1064833037385551 AS DOUBLE), CAST(0.07948330373855511 AS DOUBLE), CAST(0.06125830373855512 AS DOUBLE), CAST(0.04813630373855512 AS DOUBLE), CAST(0.03829480373855512 AS DOUBLE), CAST(0.030702789452840832 AS DOUBLE), CAST(0.024724078202840834 AS DOUBLE), CAST(0.019941109202840836 AS DOUBLE), CAST(0.016066904312840836 AS DOUBLE), CAST(0.012897100311931744 AS DOUBLE), CAST(0.010282012011181743 AS DOUBLE), CAST(0.008109477115174051 AS DOUBLE), CAST(0.006293858666367623 AS DOUBLE), CAST(0.004768739169370222 AS DOUBLE), CAST(0.0034819195937786655 AS DOUBLE), CAST(0.002391907717983465 AS DOUBLE), CAST(0.0014653976235575444 AS DOUBLE), CAST(0.0006754258588364963 AS DOUBLE)] AS wt
  FROM ranked
)
SELECT 'all' AS g,
  CAST(sum(CASE WHEN in_both THEN 1 ELSE 0 END) AS BIGINT)
    AS n_both_topk,
  round(sum(CASE WHEN in_both THEN wt[m] ELSE 0.0 END), 6) AS rbo
FROM w
"""


@_q("rbo_rankings", _RBO_ORACLE)
def q_rbo_rankings(spark, sf):
    """Rank-biased overlap between the spend-ranked and
    activity-ranked user top-20 lists (similarity.rbo_rankings):
    the whole metric collapses to one weighted count via the
    closed per-item contribution table."""
    from pyspark.sql import Window

    from padua_spark.extensions.similarity import rbo_rankings

    e = _t(spark, sf, "events").where(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    u = e.groupBy("user_id").agg(
        F.sum(
            F.round(F.col("value").cast("double") * 100)
            .cast("bigint")
        ).cast("bigint").alias("total_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    # user-count-sized frame: the partitionless row_numbers sort the
    # AGGREGATED users, never the event data
    wa = Window.orderBy(
        F.col("total_cents").desc(), F.col("user_id").asc()
    )
    wb = Window.orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    )
    ranked = u.select(
        "user_id",
        F.row_number().over(wa).cast("int").alias("ra"),
        F.row_number().over(wb).cast("int").alias("rb"),
    ).withColumn("g", F.lit("all"))
    return rbo_rankings(ranked, ["g"], "ra", "rb", p=0.9, k=20)


_ECE_ORACLE = """
WITH base AS (
  SELECT CAST(floor(value) AS DOUBLE) / 512.0 AS p,
    CASE WHEN event_type IN ('click', 'view')
      THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS y
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL AND value >= 0
),
per AS (
  SELECT CAST(least(9, CAST(floor(p * 10) AS INT)) AS INT) AS bin,
    CAST(count(*) AS BIGINT) AS n, sum(p) AS sp, sum(y) AS sy
  FROM base GROUP BY 1
),
st AS (
  SELECT bin, n, sp / CAST(n AS DOUBLE) AS conf,
    sy / CAST(n AS DOUBLE) AS acc,
    abs(sp / CAST(n AS DOUBLE) - sy / CAST(n AS DOUBLE)) AS gap
  FROM per
),
z AS (
  SELECT bin, n, conf, acc, gap,
    sum(CAST(n AS DOUBLE) * gap) OVER ()
      / CAST(sum(n) OVER () AS DOUBLE) AS ece,
    max(gap) OVER () AS mce
  FROM st
)
SELECT bin, n, round(conf, 6) AS conf_mean,
  round(acc, 6) AS acc_mean, round(gap, 6) AS gap,
  round(ece, 6) AS ece, round(mce, 6) AS mce
FROM z
"""


@_q("ece_calibration", _ECE_ORACLE)
def q_ece_calibration(spark, sf):
    """Expected/maximum calibration error of the dyadic-exact
    pseudo-probability against engagement labels
    (features.ece_calibration): the reliability-diagram numbers,
    same bins as brier_decomposition."""
    from padua_spark.extensions.features import ece_calibration

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull() & (F.col("value") >= 0)
    ).select(
        (F.floor(F.col("value")).cast("double") / 512.0).alias("p"),
        F.col("event_type").isin("click", "view")
        .cast("int").alias("y"),
    )
    return ece_calibration(e, "p", "y", n_bins=10)


_TEMPERATURE_ORACLE = """
WITH base AS (
  SELECT (CAST(floor(value) AS DOUBLE) - 250.0) / 100.0 AS z,
    CASE WHEN event_type IN ('click', 'view')
      THEN 1 ELSE 0 END AS y
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
),
sg AS (
  SELECT z, 1.0 - 2.0 * CAST(y AS DOUBLE) AS sgn FROM base
),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    sum(greatest(sgn * z / CAST(0.25 AS DOUBLE), CAST(0.0 AS DOUBLE))
        + ln(1.0 + exp(-abs(sgn * z / CAST(0.25 AS DOUBLE)))))
      AS nll0,
    sum(greatest(sgn * z / CAST(0.35 AS DOUBLE), CAST(0.0 AS DOUBLE))
        + ln(1.0 + exp(-abs(sgn * z / CAST(0.35 AS DOUBLE)))))
      AS nll1,
    sum(greatest(sgn * z / CAST(0.5 AS DOUBLE), CAST(0.0 AS DOUBLE))
        + ln(1.0 + exp(-abs(sgn * z / CAST(0.5 AS DOUBLE)))))
      AS nll2,
    sum(greatest(sgn * z / CAST(0.7 AS DOUBLE), CAST(0.0 AS DOUBLE))
        + ln(1.0 + exp(-abs(sgn * z / CAST(0.7 AS DOUBLE)))))
      AS nll3,
    sum(greatest(sgn * z / CAST(0.85 AS DOUBLE), CAST(0.0 AS DOUBLE))
        + ln(1.0 + exp(-abs(sgn * z / CAST(0.85 AS DOUBLE)))))
      AS nll4,
    sum(greatest(sgn * z / CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE))
        + ln(1.0 + exp(-abs(sgn * z / CAST(1.0 AS DOUBLE)))))
      AS nll5,
    sum(greatest(sgn * z / CAST(1.2 AS DOUBLE), CAST(0.0 AS DOUBLE))
        + ln(1.0 + exp(-abs(sgn * z / CAST(1.2 AS DOUBLE)))))
      AS nll6,
    sum(greatest(sgn * z / CAST(1.5 AS DOUBLE), CAST(0.0 AS DOUBLE))
        + ln(1.0 + exp(-abs(sgn * z / CAST(1.5 AS DOUBLE)))))
      AS nll7,
    sum(greatest(sgn * z / CAST(2.0 AS DOUBLE), CAST(0.0 AS DOUBLE))
        + ln(1.0 + exp(-abs(sgn * z / CAST(2.0 AS DOUBLE)))))
      AS nll8,
    sum(greatest(sgn * z / CAST(2.5 AS DOUBLE), CAST(0.0 AS DOUBLE))
        + ln(1.0 + exp(-abs(sgn * z / CAST(2.5 AS DOUBLE)))))
      AS nll9,
    sum(greatest(sgn * z / CAST(3.0 AS DOUBLE), CAST(0.0 AS DOUBLE))
        + ln(1.0 + exp(-abs(sgn * z / CAST(3.0 AS DOUBLE)))))
      AS nll10,
    sum(greatest(sgn * z / CAST(4.0 AS DOUBLE), CAST(0.0 AS DOUBLE))
        + ln(1.0 + exp(-abs(sgn * z / CAST(4.0 AS DOUBLE)))))
      AS nll11
  FROM sg
),
st AS (
  SELECT CAST(0.25 AS DOUBLE) AS temperature, n, nll0 AS nll FROM a
  UNION ALL
  SELECT CAST(0.35 AS DOUBLE) AS temperature, n, nll1 AS nll FROM a
  UNION ALL
  SELECT CAST(0.5 AS DOUBLE) AS temperature, n, nll2 AS nll FROM a
  UNION ALL
  SELECT CAST(0.7 AS DOUBLE) AS temperature, n, nll3 AS nll FROM a
  UNION ALL
  SELECT CAST(0.85 AS DOUBLE) AS temperature, n, nll4 AS nll FROM a
  UNION ALL
  SELECT CAST(1.0 AS DOUBLE) AS temperature, n, nll5 AS nll FROM a
  UNION ALL
  SELECT CAST(1.2 AS DOUBLE) AS temperature, n, nll6 AS nll FROM a
  UNION ALL
  SELECT CAST(1.5 AS DOUBLE) AS temperature, n, nll7 AS nll FROM a
  UNION ALL
  SELECT CAST(2.0 AS DOUBLE) AS temperature, n, nll8 AS nll FROM a
  UNION ALL
  SELECT CAST(2.5 AS DOUBLE) AS temperature, n, nll9 AS nll FROM a
  UNION ALL
  SELECT CAST(3.0 AS DOUBLE) AS temperature, n, nll10 AS nll FROM a
  UNION ALL
  SELECT CAST(4.0 AS DOUBLE) AS temperature, n, nll11 AS nll FROM a
)
SELECT temperature, n, round(nll, 6) AS nll,
  (nll, abs(ln(temperature)))
    = (SELECT min((nll, abs(ln(temperature)))) FROM st) AS is_best
FROM st
"""


@_q("temperature_scaling", _TEMPERATURE_ORACLE)
def q_temperature_scaling(spark, sf):
    """Temperature-scaling grid NLL for a value-derived logit against
    engagement labels (features.temperature_scaling): fixed grid for
    engine reproducibility, stable softplus, one aggregation carrying
    every T."""
    from padua_spark.extensions.features import temperature_scaling

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    ).select(
        (
            (F.floor(F.col("value")).cast("double") - 250.0) / 100.0
        ).alias("z"),
        F.col("event_type").isin("click", "view")
        .cast("int").alias("y"),
    )
    return temperature_scaling(e, "z", "y")


# --- ext: Spiegelhalter calibration z-test ----------------------------------


_SPIEGELHALTER_ORACLE = """
WITH base AS (
  SELECT CAST(floor(value) AS DOUBLE) / 512.0 AS p,
    CASE WHEN event_type IN ('click', 'view')
      THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS y
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL AND value >= 0
),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    sum((y - p) * (1.0 - 2.0 * p)) AS num,
    sum((1.0 - 2.0 * p) * (1.0 - 2.0 * p) * p * (1.0 - p)) AS var
  FROM base
),
zt AS (
  SELECT n, CASE WHEN var > 0 THEN num / sqrt(var) END AS z FROM a
),
e AS (
  SELECT n, z, abs(z) / sqrt(2.0) AS x,
    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
  FROM zt
)
SELECT n, round(z, 6) AS z,
  round(CASE WHEN z IS NOT NULL THEN least(
    (0.254829592 * t + -0.284496736 * t * t
     + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
     + 1.061405429 * t * t * t * t * t) * exp(-x * x), 1.0) END, 6)
    AS p_value
FROM e
"""


@_q("spiegelhalter_z", _SPIEGELHALTER_ORACLE)
def q_spiegelhalter_z(spark, sf):
    """Spiegelhalter calibration z over the dyadic-exact
    pseudo-probability vs engagement labels
    (features.spiegelhalter_z) — the significance companion to the
    ece_calibration entry, same (p, y) construction."""
    from padua_spark.extensions.features import spiegelhalter_z

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull() & (F.col("value") >= 0)
    ).select(
        (F.floor(F.col("value")).cast("double") / 512.0).alias("p"),
        F.col("event_type").isin("click", "view")
        .cast("int").alias("y"),
    )
    return spiegelhalter_z(e, "p", "y")


# --- ext: Hosmer-Lemeshow calibration GOF ------------------------------------


def _chi2_sf_closed_sql(x: str, dfc: str, max_df: int) -> str:
    """SQL CASE mirroring stats._chi2_sf_closed VERBATIM (same
    arithmetic order, same A&S erfc polynomial at z = sqrt(x), same
    half-integer gamma constants) for integer df in [1, max_df]."""
    import math

    branches = []
    h = f"(({x}) / 2.0)"
    for d in range(1, int(max_df) + 1):
        if d % 2 == 0:
            m = d // 2
            series = "0.0"
            for k in range(m):
                series = (
                    f"({series} + pow({h}, {float(k)!r})"
                    f" / {float(math.factorial(k))!r})"
                )
            branch = f"(exp(-{h}) * {series})"
        else:
            m = (d - 1) // 2
            xa = f"(abs(sqrt({x})) / sqrt(2.0))"
            t = f"(1.0 / (1.0 + 0.3275911 * {xa}))"
            branch = (
                f"((0.254829592 * {t} + -0.284496736 * {t} * {t}"
                f" + 1.421413741 * {t} * {t} * {t}"
                f" + -1.453152027 * {t} * {t} * {t} * {t}"
                f" + 1.061405429 * {t} * {t} * {t} * {t} * {t})"
                f" * exp(-{xa} * {xa}))"
            )
            for k in range(1, m + 1):
                gk = (
                    math.factorial(2 * k)
                    * math.sqrt(math.pi)
                    / (4.0 ** k * math.factorial(k))
                )
                branch = (
                    f"({branch} + exp(-{h}) * pow({h}, {k - 0.5!r})"
                    f" / {gk!r})"
                )
        branches.append(
            f"WHEN ({dfc}) = {d} THEN least({branch}, 1.0)"
        )
    return "CASE " + " ".join(branches) + " ELSE NULL END"


def _hosmer_oracle(n_bins: int = 10) -> str:
    qs = [i / n_bins for i in range(1, n_bins)]
    bound_sel = ",\n    ".join(
        f"min(CASE WHEN cum >= ceil({q!r} * n) THEN v END) AS b{i}"
        for i, q in enumerate(qs)
    )
    bucket_expr = "1" + "".join(
        f"\n        + CASE WHEN p > q.b{i} THEN 1 ELSE 0 END"
        for i in range(len(qs))
    )
    p_sql = _chi2_sf_closed_sql("chi2", "dfv", max(n_bins - 2, 1))
    return f"""
WITH base AS (
  SELECT CAST(floor(value) AS DOUBLE) / 512.0 AS p,
    CASE WHEN event_type IN ('click', 'view')
      THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS y
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL AND value >= 0
),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
q AS (
  SELECT
    {bound_sel}
  FROM (
    SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      AS cum
    FROM (SELECT p AS v, count(*) AS c FROM base GROUP BY 1)
  ), nb
),
bucketed AS (
  SELECT ({bucket_expr}) AS bin, y, p
  FROM base, q
),
pb AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS n_pos, sum(p) AS e
  FROM bucketed GROUP BY 1
),
st AS (
  SELECT bin, n, n_pos, e,
    CASE WHEN e > 0 AND e < CAST(n AS DOUBLE) THEN 1 ELSE 0 END
      AS usable,
    CASE WHEN e > 0 AND e < CAST(n AS DOUBLE) THEN
      (CAST(n_pos AS DOUBLE) - e) * (CAST(n_pos AS DOUBLE) - e)
      / (e * (1.0 - e / CAST(n AS DOUBLE))) END AS term
  FROM pb
),
z AS (
  SELECT bin, n, n_pos, e,
    CAST(sum(usable) OVER () AS BIGINT) AS g,
    sum(term) OVER () AS chi2,
    CAST(sum(usable) OVER () - 2 AS BIGINT) AS dfv
  FROM st
)
SELECT CAST(bin AS INT) AS bin, n, n_pos,
  round(e, 6) AS expected_pos,
  g AS g_bins, round(chi2, 6) AS chi2,
  CAST(dfv AS INT) AS df,
  round(CASE WHEN dfv >= 1 AND chi2 IS NOT NULL
    THEN {p_sql} END, 6) AS p_value
FROM z
"""


@_q("hosmer_lemeshow", _hosmer_oracle())
def q_hosmer_lemeshow(spark, sf):
    """Hosmer-Lemeshow decile GOF of the dyadic-exact
    pseudo-probability vs engagement labels
    (features.hosmer_lemeshow): exact quantile bins (gains_table
    boundary law), closed-form chi2 survival shared verbatim with
    the oracle."""
    from padua_spark.extensions.features import hosmer_lemeshow

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull() & (F.col("value") >= 0)
    ).select(
        (F.floor(F.col("value")).cast("double") / 512.0).alias("p"),
        F.col("event_type").isin("click", "view")
        .cast("int").alias("y"),
    )
    return hosmer_lemeshow(e, "p", "y", n_bins=10)


# --- ext: two-sample Hotelling T^2 (bivariate) -------------------------------


_HOTELLING_ORACLE = f"""
WITH RECURSIVE base AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS x,
    CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_returnflag IN ('A', 'R')
),
agg AS (
  SELECT
    CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    sum(CASE WHEN g = 'A' THEN x ELSE 0 END) AS sxa,
    sum(CASE WHEN g = 'A' THEN y ELSE 0 END) AS sya,
    sum(CASE WHEN g = 'A' THEN x * x ELSE 0 END) AS sxxa,
    sum(CASE WHEN g = 'A' THEN y * y ELSE 0 END) AS syya,
    sum(CASE WHEN g = 'A' THEN x * y ELSE 0 END) AS sxya,
    sum(CASE WHEN g = 'R' THEN x ELSE 0 END) AS sxb,
    sum(CASE WHEN g = 'R' THEN y ELSE 0 END) AS syb,
    sum(CASE WHEN g = 'R' THEN x * x ELSE 0 END) AS sxxb,
    sum(CASE WHEN g = 'R' THEN y * y ELSE 0 END) AS syyb,
    sum(CASE WHEN g = 'R' THEN x * y ELSE 0 END) AS sxyb
  FROM base
),
m AS (
  SELECT n_a, n_b,
    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS n,
    sxa / CAST(n_a AS DOUBLE) AS mxa, sya / CAST(n_a AS DOUBLE) AS mya,
    sxb / CAST(n_b AS DOUBLE) AS mxb, syb / CAST(n_b AS DOUBLE) AS myb,
    sxxa, syya, sxya, sxxb, syyb, sxyb
  FROM agg
),
s AS (
  SELECT n_a, n_b, na, nb, n, mxa, mya, mxb, myb,
    (sxxa - na * mxa * mxa + sxxb - nb * mxb * mxb) / (n - 2.0) AS sxx,
    (syya - na * mya * mya + syyb - nb * myb * myb) / (n - 2.0) AS syy,
    (sxya - na * mxa * mya + sxyb - nb * mxb * myb) / (n - 2.0) AS sxy
  FROM m
),
t AS (
  SELECT n_a, n_b, na, nb, n,
    CASE WHEN n_a >= 2 AND n_b >= 2 AND n >= 4.0
              AND sxx * syy - sxy * sxy > 0
      THEN na * nb / n
        * ((mxa - mxb) * (mxa - mxb) * syy
           - 2.0 * (mxa - mxb) * (mya - myb) * sxy
           + (mya - myb) * (mya - myb) * sxx)
        / (sxx * syy - sxy * sxy) END AS t2
  FROM s
),
ft AS (
  SELECT n_a, n_b, n, t2,
    t2 * (n - 3.0) / (2.0 * (n - 2.0)) AS f
  FROM t
),
inp AS (
  SELECT 1 AS key,
    CAST((n - 3.0) / ((n - 3.0) + 2.0 * f) AS DOUBLE) AS x,
    CAST((n - 3.0) / 2.0 AS DOUBLE) AS a,
    CAST(1.0 AS DOUBLE) AS b
  FROM ft WHERE f IS NOT NULL AND f >= 0
),
{_betainc_chain_sql()}
SELECT ft.n_a, ft.n_b, round(ft.t2, 6) AS t2,
  round(ft.f, 6) AS f_stat, round(pv.p, 6) AS p_value
FROM ft LEFT JOIN pv ON pv.key = 1
"""


@_q("hotelling_t2", _HOTELLING_ORACLE)
def q_hotelling_t2(spark, sf):
    """Two-sample bivariate Hotelling T^2 on (quantity, price) between
    return flags A and R (stats.hotelling_t2): closed 2x2 pooled
    inverse, F p via the shared incomplete-beta survival."""
    from padua_spark.operators.stats import hotelling_t2

    li = _t(spark, sf, "lineitem")
    return hotelling_t2(
        li, "l_returnflag", "l_quantity", "l_extendedprice", "A", "R"
    )


# --- ext: Newman modularity of a community assignment ------------------------


_MODULARITY_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS sn,
                  'c' || CAST(o_custkey AS VARCHAR) AS cn
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS (
  SELECT DISTINCT least(sn, cn) AS u, greatest(sn, cn) AS v FROM pairs
),
labels AS (
  SELECT 's' || CAST(s_suppkey AS VARCHAR) AS n,
    CAST(s_nationkey AS BIGINT) AS l
  FROM supplier
  UNION ALL
  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS n,
    CAST(c_nationkey AS BIGINT) AS l
  FROM customer
),
tagged AS (
  SELECT e.u, e.v, lu.l AS lu, lv.l AS lv
  FROM e LEFT JOIN labels lu ON lu.n = e.u
         LEFT JOIN labels lv ON lv.n = e.v
),
within AS (
  SELECT lu AS c, CAST(count(*) AS BIGINT) AS ec
  FROM tagged WHERE lu IS NOT NULL AND lu = lv GROUP BY 1
),
deg AS (
  SELECT c, CAST(count(*) AS BIGINT) AS dc FROM (
    SELECT lu AS c FROM tagged
    UNION ALL
    SELECT lv AS c FROM tagged
  ) WHERE c IS NOT NULL GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM (
    SELECT u AS n FROM e UNION SELECT v AS n FROM e
  )
),
qsum AS (
  SELECT CAST(count(*) AS BIGINT) AS n_communities,
    sum(CAST(coalesce(w.ec, 0) AS DOUBLE) / CAST(t.n_edges AS DOUBLE)
        - (CAST(d.dc AS DOUBLE) / (2.0 * CAST(t.n_edges AS DOUBLE)))
          * (CAST(d.dc AS DOUBLE) / (2.0 * CAST(t.n_edges AS DOUBLE))))
      AS q
  FROM deg d LEFT JOIN within w ON w.c = d.c CROSS JOIN tot t
)
SELECT nn.n_nodes, tot.n_edges,
  coalesce(qsum.n_communities, 0) AS n_communities,
  round(CASE WHEN tot.n_edges > 0 THEN qsum.q END, 6) AS modularity
FROM tot CROSS JOIN nn CROSS JOIN qsum
"""


@_q("graph_modularity", _MODULARITY_ORACLE)
def q_graph_modularity(spark, sf):
    """Newman modularity of the nation partition over the symmetrized
    supplier-customer trade graph (graph.modularity): both endpoints
    labeled by their nation key, Q per Newman-Girvan eq. 5."""
    from padua_spark.extensions.graph import modularity

    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    su = _t(spark, sf, "supplier")
    cu = _t(spark, sf, "customer")
    edges = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
    )
    labels = su.select(
        F.concat(F.lit("s"), F.col("s_suppkey")).alias("node"),
        F.col("s_nationkey").cast("bigint").alias("label"),
    ).unionByName(
        cu.select(
            F.concat(F.lit("c"), F.col("c_custkey")).alias("node"),
            F.col("c_nationkey").cast("bigint").alias("label"),
        )
    )
    return modularity(edges, labels)


# --- ext: RAKE keyword extraction --------------------------------------------


_RAKE_ORACLE = """
WITH marked AS (
  SELECT list_transform(
    list_filter(string_split(lower(text), ' '), t -> t <> ''),
    t -> CASE WHEN t IN ('the', 'a', 'and', 'of', 'to', 'in', 'is')
         THEN chr(0) ELSE t END) AS m
  FROM documents WHERE text IS NOT NULL
),
ph0 AS (
  SELECT trim(p) AS phrase FROM (
    SELECT unnest(string_split(array_to_string(m, ' '), chr(0))) AS p
    FROM marked
  ) WHERE trim(p) <> ''
),
ph AS (
  SELECT phrase FROM ph0
  WHERE len(string_split(phrase, ' ')) BETWEEN 1 AND 6
),
wstats AS (
  SELECT w,
    CAST(sum(l) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS wscore
  FROM (
    SELECT unnest(string_split(phrase, ' ')) AS w,
      len(string_split(phrase, ' ')) AS l
    FROM ph
  ) GROUP BY 1
),
phc AS (
  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
  FROM ph GROUP BY 1
),
dw AS (
  SELECT phrase, unnest(string_split(phrase, ' ')) AS w
  FROM (SELECT phrase FROM phc)
),
scored AS (
  SELECT dw.phrase,
    CAST(count(*) AS INT) AS n_words,
    list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
                   list(ws.wscore ORDER BY dw.w, ws.wscore)),
      (acc, s) -> acc + s) AS score
  FROM dw JOIN wstats ws ON ws.w = dw.w
  GROUP BY 1
)
SELECT phc.phrase, scored.n_words, phc.n_occurrences,
  round(scored.score, 6) AS score
FROM phc JOIN scored ON scored.phrase = phc.phrase
"""


@_q("rake_keywords", _RAKE_ORACLE)
def q_rake_keywords(spark, sf):
    """RAKE phrase keywords over the documents corpus
    (text.rake_keywords): maximal stopword-free runs, degree/frequency
    word scores, sorted-fold phrase sums so both engines add floats
    in the same order."""
    from padua_spark.extensions.text import rake_keywords

    d = _t(spark, sf, "documents")
    return rake_keywords(d, "doc_id", "text")


# --- ext: code-vs-prose format profile ---------------------------------------


_CODE_PROSE_ORACLE = r"""
WITH base AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
    CAST(length(text)
      - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))
      AS BIGINT) AS n_sym,
    CAST(length(text)
      - length(regexp_replace(text, '[0-9]', '', 'g'))
      AS BIGINT) AS n_dig,
    CAST(length(text)
      - length(regexp_replace(text, '[{}\[\]();=]', '', 'g'))
      AS BIGINT) AS n_brace,
    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
    CAST(len(list_filter(string_split(text, chr(10)),
      l -> regexp_matches(l, '^(\t| {2,})'))) AS BIGINT) AS n_indent,
    CAST(len(list_filter(string_split(trim(lower(text)), ' '),
      t -> t <> '')) AS BIGINT) AS n_toks,
    CAST(len(list_filter(string_split(lower(text), ' '),
      t -> t IN ('def', 'return', 'import', 'function', 'class',
                 'const', 'var', 'if', 'else', 'for', 'while')))
      AS BIGINT) AS n_kw
  FROM documents WHERE text IS NOT NULL
),
r AS (
  SELECT doc_id, n, n_kw,
    CASE WHEN n > 0 THEN CAST(n_sym AS DOUBLE) / n END AS sym_ratio,
    CASE WHEN n > 0 THEN CAST(n_dig AS DOUBLE) / n END AS dig_ratio,
    CASE WHEN n > 0 THEN CAST(n_brace AS DOUBLE) * 1000.0 / n END
      AS brace_k,
    CASE WHEN n_lines > 0
      THEN CAST(n_indent AS DOUBLE) / n_lines END AS indent_rate,
    CASE WHEN n_toks > 0
      THEN CAST(n_kw AS DOUBLE) / n_toks END AS kw_rate
  FROM base
)
SELECT doc_id,
  round(sym_ratio, 6) AS symbol_ratio,
  round(dig_ratio, 6) AS digit_ratio,
  round(brace_k, 6) AS brace_semicolon_per_kchar,
  round(indent_rate, 6) AS indent_line_rate,
  n_kw AS keyword_hits,
  round(CASE WHEN n > 0 THEN least(1.0,
    2.0 * coalesce(sym_ratio, 0.0) + 10.0 * coalesce(indent_rate, 0.0)
    + coalesce(kw_rate, 0.0) + coalesce(brace_k, 0.0) / 50.0) END, 6)
    AS code_score
FROM r
"""


@_q("code_prose_profile", _CODE_PROSE_ORACLE)
def q_code_prose_profile(spark, sf):
    """Code-vs-prose format signals per document
    (text.code_prose_profile): scan-level symbol/digit/brace
    densities, indent-line rate, keyword hits and the documented
    linear code_score."""
    from padua_spark.extensions.text import code_prose_profile

    d = _t(spark, sf, "documents").where(F.col("text").isNotNull())
    out = code_prose_profile(d, "text")
    return out.select(
        "doc_id", "symbol_ratio", "digit_ratio",
        "brace_semicolon_per_kchar", "indent_line_rate",
        "keyword_hits", "code_score",
    )


# --- ext: per-document n-gram novelty vs a reference corpus -------------------


def _ngram_novelty_oracle() -> str:
    m = 2147483647
    coefs = [(1000000007 ** j) % m for j in range(5)]
    acc = "CAST(0 AS BIGINT)"
    for j, c in enumerate(coefs):
        acc = f"(({acc} + th[i + {j}] * {c}) % {m})"
    return f"""
WITH t AS (
  SELECT doc_id,
    list_transform(string_split(text, ' '), w -> list_reduce(
        list_prepend(CAST(7 AS BIGINT),
          list_transform(list_filter(string_split(w, ''), c -> c <> ''),
                         c -> CAST(ord(c) AS BIGINT))),
        (a, c) -> (a * 131 + c) % {m})) AS th
  FROM documents
),
g AS (
  SELECT doc_id,
    list_distinct(list_transform(generate_series(1, len(th) - 4),
                                 i -> {acc})) AS sh
  FROM t WHERE len(th) >= 5
),
rf AS (
  SELECT DISTINCT shingle FROM (
    SELECT unnest(sh) AS shingle FROM g WHERE doc_id % 7 = 0
  )
),
tr AS (
  SELECT doc_id, unnest(sh) AS shingle FROM g WHERE doc_id % 7 <> 0
)
SELECT tr.doc_id,
  CAST(count(*) AS BIGINT) AS n_ngrams,
  CAST(sum(CASE WHEN rf.shingle IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_novel,
  round(CAST(sum(CASE WHEN rf.shingle IS NULL THEN 1 ELSE 0 END)
    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS novelty_rate
FROM tr LEFT JOIN rf ON tr.shingle = rf.shingle
GROUP BY tr.doc_id
"""


@_q("ngram_novelty", _ngram_novelty_oracle())
def q_ngram_novelty(spark, sf):
    """Per-document 5-token-window novelty of the 6/7 train split
    against the 1/7 reference split (dedup.ngram_novelty): the
    positive face of decontaminate_ngrams — distinct windows the
    reference has never seen, as a rate."""
    from padua_spark.extensions.dedup import ngram_novelty

    d = _t(spark, sf, "documents")
    ref = d.where(F.col("doc_id") % 7 == 0)
    tr = d.where(F.col("doc_id") % 7 != 0)
    return ngram_novelty(tr, ref, "doc_id", "text", n_tokens=5)


# --- ext: Hodges-Lehmann estimators -------------------------------------------


_HL_SHIFT_ORACLE = """
WITH cells AS (
  SELECT l_returnflag = 'A' AS isa, CAST(l_quantity AS DOUBLE) AS v,
    CAST(count(*) AS BIGINT) AS c
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_returnflag IN ('A', 'R')
  GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(CASE WHEN isa THEN c ELSE 0 END) AS BIGINT) AS na,
    CAST(sum(CASE WHEN NOT isa THEN c ELSE 0 END) AS BIGINT) AS nb
  FROM cells
),
diffs AS (
  SELECT a.v - b.v AS dv, CAST(sum(a.c * b.c) AS BIGINT) AS w
  FROM (SELECT v, c FROM cells WHERE isa) a,
       (SELECT v, c FROM cells WHERE NOT isa) b
  GROUP BY 1
),
run AS (
  SELECT dv, sum(w) OVER (ORDER BY dv ROWS UNBOUNDED PRECEDING) AS r
  FROM diffs
),
sel AS (
  SELECT
    min(CASE WHEN r >= (t.na * t.nb + 1) // 2 THEN dv END) AS lo,
    min(CASE WHEN r >= t.na * t.nb // 2 + 1 THEN dv END) AS hi
  FROM run, tot t
)
SELECT t.na AS n_a, t.nb AS n_b,
  CAST(t.na * t.nb AS BIGINT) AS n_pairs,
  round((sel.lo + sel.hi) / 2.0, 6) AS hl_shift
FROM tot t, sel
"""


@_q("hodges_lehmann_shift", _HL_SHIFT_ORACLE)
def q_hodges_lehmann_shift(spark, sf):
    """Hodges-Lehmann shift estimate of quantity between return flags
    A and R (stats.hodges_lehmann_shift): bounded distinct-value cell
    grid, weighted median off the shared stepped cumsum."""
    from padua_spark.operators.stats import hodges_lehmann_shift

    li = _t(spark, sf, "lineitem")
    return hodges_lehmann_shift(li, "l_returnflag", "l_quantity", "A", "R")


_HL_PSEUDO_ORACLE = """
WITH cells AS (
  SELECT CAST(l_quantity AS DOUBLE) AS v,
    CAST(count(*) AS BIGINT) AS c
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_returnflag = 'A'
  GROUP BY 1
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
walsh AS (
  SELECT (a.v + b.v) / 2.0 AS dv,
    CAST(sum(CASE WHEN a.v = b.v THEN a.c * (a.c + 1) // 2
             ELSE a.c * b.c END) AS BIGINT) AS w
  FROM cells a JOIN cells b ON a.v <= b.v
  GROUP BY 1
),
run AS (
  SELECT dv, sum(w) OVER (ORDER BY dv ROWS UNBOUNDED PRECEDING) AS r
  FROM walsh
),
sel AS (
  SELECT
    min(CASE WHEN r >= (t.n * (t.n + 1) // 2 + 1) // 2 THEN dv END)
      AS lo,
    min(CASE WHEN r >= t.n * (t.n + 1) // 2 // 2 + 1 THEN dv END)
      AS hi
  FROM run, tot t
)
SELECT t.n, CAST(t.n * (t.n + 1) // 2 AS BIGINT) AS n_pairs,
  round((sel.lo + sel.hi) / 2.0, 6) AS pseudomedian
FROM tot t, sel
"""


@_q("hodges_lehmann_pseudomedian", _HL_PSEUDO_ORACLE)
def q_hodges_lehmann_pseudomedian(spark, sf):
    """Hodges-Lehmann pseudo-median of A-flag quantities
    (stats.hodges_lehmann_pseudomedian): Walsh-average cells over the
    bounded value domain, weighted median off the stepped cumsum."""
    from padua_spark.operators.stats import hodges_lehmann_pseudomedian

    li = _t(spark, sf, "lineitem").where(F.col("l_returnflag") == "A")
    return hodges_lehmann_pseudomedian(li, "l_quantity")


# --- ext: personalized (seeded) PageRank --------------------------------------


def _ppr_oracle(k: int = 5) -> str:
    # same recursive-CTE shape as _pagerank_oracle, restart mass on
    # the supplier-side seed set instead of uniform
    return f"""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS sn,
                  'c' || CAST(o_custkey AS VARCHAR) AS cn
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT sn AS src, cn AS dst FROM pairs
    UNION ALL
    SELECT cn AS src, sn AS dst FROM pairs
  )
),
outdeg AS (SELECT src, count(*) AS o FROM edges GROUP BY 1),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges
    UNION ALL
    SELECT dst AS node FROM edges
  )
),
ns AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
  WHERE node LIKE 's%'
),
pr(it, node, rank) AS (
  SELECT 0, node,
    CASE WHEN node LIKE 's%' THEN CAST(1.0 AS DOUBLE) / ns.n
         ELSE CAST(0.0 AS DOUBLE) END
  FROM nodes, ns
  UNION ALL
  SELECT p.it + 1, e.dst AS node,
    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
      * (CASE WHEN e.dst LIKE 's%' THEN CAST(1.0 AS DOUBLE) / ns.n
              ELSE CAST(0.0 AS DOUBLE) END)
    + CAST(0.85 AS DOUBLE) * sum(p.rank / o.o)
  FROM (SELECT * FROM pr WHERE it < {k}) p
  JOIN edges e ON e.src = p.node
  JOIN outdeg o ON o.src = p.node
  CROSS JOIN ns
  GROUP BY p.it, e.dst, ns.n
)
SELECT node, round(rank, 9) AS rank,
  node LIKE 's%' AS is_seed
FROM pr WHERE it = {k}
"""


@_q("personalized_pagerank", _ppr_oracle())
def q_personalized_pagerank(spark, sf):
    """Personalized PageRank over the symmetrized trade graph with
    the supplier nodes as the seed set (graph.personalized_pagerank):
    restart mass uniform over seeds, k=5, d=0.85, dangling mass
    dropped — the oracle replays the exact recurrence as a recursive
    CTE."""
    from pyspark import StorageLevel

    from padua_spark.extensions.graph import personalized_pagerank
    from padua_spark.io_utils import track_cached

    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    # integer node ids through the iterations (suppkey+1 positive /
    # -custkey-1 negative), labels rendered in one output projection —
    # the q_pagerank_trade lever, same A/B receipt (round 12)
    okeys = F.broadcast(o.select("o_orderkey", "o_custkey"))
    und = (
        li.select("l_orderkey", "l_suppkey")
        .join(okeys, li["l_orderkey"] == okeys["o_orderkey"])
        .select(
            (F.col("l_suppkey").cast("long") + 1).alias("sn"),
            (-F.col("o_custkey").cast("long") - 1).alias("cn"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges = und.select(
        F.col("sn").alias("src"), F.col("cn").alias("dst")
    ).unionAll(
        und.select(F.col("cn").alias("src"), F.col("sn").alias("dst"))
    )
    seeds = und.select(F.col("sn").alias("node")).distinct()
    out = personalized_pagerank(
        edges, seeds, k_iters=5, damping=0.85, edges_distinct=True
    )
    res = out.select(
        F.when(
            F.col("node") > 0,
            F.concat(F.lit("s"), F.col("node") - 1),
        )
        .otherwise(F.concat(F.lit("c"), -F.col("node") - 1))
        .alias("node"),
        F.round("rank", 9).alias("rank"),
        "is_seed",
    )
    return track_cached(
        res, und, *getattr(out, "_padua_cached", ())
    )


# --- ext: windowed Gopher-rule quality screen (streaming front half) ---------


_WINDOWED_QUALITY_ORACLE = r"""
WITH d AS (
  SELECT to_timestamp(doc_id * 60) AS ts, text,
    list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks,
    string_split(text, chr(10)) AS lines
  FROM documents WHERE text IS NOT NULL
),
sig AS (
  SELECT (CAST(epoch(ts) AS BIGINT) // 3600) * 3600 AS ws,
    len(toks) AS nw,
    CASE WHEN len(toks) > 0 THEN
      CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(toks, t -> CAST(length(t) AS BIGINT))),
        (a, b) -> a + b) AS DOUBLE) / len(toks) END AS mwl,
    CASE WHEN len(toks) > 0 THEN
      CAST(len(string_split(text, '#')) - 1
        + len(string_split(text, '...')) - 1
        + len(string_split(text, chr(8230))) - 1 AS DOUBLE)
        / len(toks) END AS symr,
    CAST(len(list_filter(lines,
      l -> regexp_matches(trim(l), '^[-*' || chr(8226) || ']')))
      AS DOUBLE) / len(lines) AS bf,
    CAST(len(list_filter(lines,
      l -> regexp_matches(trim(l), '(\.\.\.|' || chr(8230) || ')$')))
      AS DOUBLE) / len(lines) AS ef,
    CASE WHEN len(toks) > 0 THEN
      CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
        AS DOUBLE) / len(toks) END AS af,
    len(list_filter(toks,
      t -> t IN ('the', 'a', 'and', 'of', 'to', 'in', 'is'))) AS sw
  FROM d
),
flags AS (
  SELECT ws,
    coalesce(nw >= 50 AND nw <= 100000, FALSE) AS r1,
    coalesce(mwl >= 3.0 AND mwl <= 10.0, FALSE) AS r2,
    coalesce(symr <= 0.1, FALSE) AS r3,
    coalesce(bf <= 0.9, FALSE) AS r4,
    coalesce(ef <= 0.3, FALSE) AS r5,
    coalesce(af >= 0.8, FALSE) AS r6,
    coalesce(sw >= 2, FALSE) AS r7
  FROM sig
)
SELECT ws AS window_start_epoch,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5 AND r6 AND r7
    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
  round(CAST(sum(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5 AND r6
    AND r7 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS pass_rate,
  CAST(sum(CASE WHEN NOT r1 THEN 1 ELSE 0 END) AS BIGINT)
    AS fail_word_count,
  CAST(sum(CASE WHEN NOT r2 THEN 1 ELSE 0 END) AS BIGINT)
    AS fail_mean_word_len,
  CAST(sum(CASE WHEN NOT r3 THEN 1 ELSE 0 END) AS BIGINT)
    AS fail_symbol_ratio,
  CAST(sum(CASE WHEN NOT r4 THEN 1 ELSE 0 END) AS BIGINT)
    AS fail_bullet,
  CAST(sum(CASE WHEN NOT r5 THEN 1 ELSE 0 END) AS BIGINT)
    AS fail_ellipsis,
  CAST(sum(CASE WHEN NOT r6 THEN 1 ELSE 0 END) AS BIGINT)
    AS fail_alpha,
  CAST(sum(CASE WHEN NOT r7 THEN 1 ELSE 0 END) AS BIGINT)
    AS fail_stopwords
FROM flags GROUP BY 1
"""


@_q("windowed_quality_screen", _WINDOWED_QUALITY_ORACLE)
def q_windowed_quality_screen(spark, sf):
    """Per-hour Gopher-rule pass/fail counts over the documents
    corpus on a deterministic doc_id-derived event time
    (streaming.windowed_quality_screen): one stateful aggregation to
    nine exact integers per window; the stream==batch parity is
    pytest-gated, this entry gates the batch twin's values."""
    from padua_spark.streaming import windowed_quality_screen

    d = _t(spark, sf, "documents")
    withts = d.withColumn(
        "_ts", F.timestamp_seconds(F.col("doc_id") * 60)
    )
    out = windowed_quality_screen(
        withts, F.col("_ts"), "text", window_duration="1 hour"
    )
    return out.select(
        F.col("window_start").cast("long").alias(
            "window_start_epoch"
        ),
        "n_docs", "n_pass", "pass_rate",
        "fail_word_count", "fail_mean_word_len",
        "fail_symbol_ratio", "fail_bullet", "fail_ellipsis",
        "fail_alpha", "fail_stopwords",
    )


# --- ext: Croston intermittent-demand forecast --------------------------------


_CROSTON_ORACLE = """
WITH RECURSIVE s AS MATERIALIZED (
  SELECT user_id,
    row_number() OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS t,
    CASE WHEN event_type = 'purchase'
      THEN CAST(floor(value) AS DOUBLE) ELSE CAST(0 AS DOUBLE) END
      AS x
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
cnt AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_nonzero
  FROM s GROUP BY 1
),
rec AS (
  SELECT user_id, t,
    CASE WHEN x > 0 THEN x END AS z,
    CASE WHEN x > 0 THEN CAST(1.0 AS DOUBLE) END AS p,
    CASE WHEN x > 0 THEN CAST(0.0 AS DOUBLE)
         ELSE CAST(1.0 AS DOUBLE) END AS q,
    x > 0 AS started
  FROM s WHERE t = 1
  UNION ALL
  SELECT r.user_id, r.t + 1,
    CASE WHEN s.x > 0 AND r.started
           THEN CAST(0.5 AS DOUBLE) * s.x
                + CAST(0.5 AS DOUBLE) * r.z
         WHEN s.x > 0 THEN s.x
         ELSE r.z END AS z,
    CASE WHEN s.x > 0 AND r.started
           THEN CAST(0.5 AS DOUBLE) * (r.q + 1.0)
                + CAST(0.5 AS DOUBLE) * r.p
         WHEN s.x > 0 THEN r.q + 1.0
         ELSE r.p END AS p,
    CASE WHEN s.x > 0 THEN CAST(0.0 AS DOUBLE)
         ELSE r.q + 1.0 END AS q,
    r.started OR s.x > 0 AS started
  FROM rec r JOIN s ON s.user_id = r.user_id AND s.t = r.t + 1
),
fin AS (
  SELECT r.user_id, r.z, r.p
  FROM rec r JOIN cnt ON cnt.user_id = r.user_id AND r.t = cnt.n
)
SELECT c.user_id, c.n, c.n_nonzero,
  round(f.z, 6) AS demand_level,
  round(f.p, 6) AS interval_level,
  round(CASE WHEN f.p > 0 THEN f.z / f.p END, 6) AS forecast,
  round(CASE WHEN f.p > 0
    THEN CAST(0.75 AS DOUBLE) * (f.z / f.p) END, 6) AS forecast_sba
FROM cnt c JOIN fin f ON f.user_id = c.user_id
"""


@_q("croston_forecast", _CROSTON_ORACLE)
def q_croston_forecast(spark, sf):
    """Croston intermittent-demand forecast of each user's purchase
    series — non-purchase events are the zero periods
    (temporal.croston_forecast, α=0.5 exact binary fraction): one
    JVM array fold per key; the oracle steps the SAME per-period
    recursion as a recursive CTE."""
    from padua_spark.operators.temporal import croston_forecast
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    e = base.select(
        "user_id", "event_id",
        epoch_us_col(base, "ts").alias("_us"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value")).cast("double"),
        ).otherwise(F.lit(0.0)).alias("demand"),
    )
    return croston_forecast(
        e, ["user_id"], ["_us", "event_id"], "demand", alpha=0.5
    )


# --- ext: Pareto ABC classification -------------------------------------------


_ABC_ORACLE = """
WITH pk AS (
  SELECT l_partkey,
    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
      AS DOUBLE) AS tot
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
  GROUP BY 1 HAVING sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) > 0
),
pv AS (
  SELECT -tot AS negv, sum(tot) AS mass FROM pk GROUP BY 1
),
run AS (
  SELECT negv,
    sum(mass) OVER (ORDER BY negv ROWS UNBOUNDED PRECEDING) AS r,
    sum(mass) OVER () AS g
  FROM pv
)
SELECT pk.l_partkey, pk.tot AS total_value,
  round(pk.tot / run.g, 6) AS value_share,
  round(run.r / run.g, 6) AS cum_share,
  CASE WHEN run.r / run.g <= 0.8 THEN 'A'
       WHEN run.r / run.g <= 0.95 THEN 'B'
       ELSE 'C' END AS abc_class
FROM pk JOIN run ON run.negv = -pk.tot
"""


@_q("abc_analysis", _ABC_ORACLE)
def q_abc_analysis(spark, sf):
    """Pareto ABC classes of parts by exact-integer revenue
    micro-units (quality.abc_analysis): descending cumulative share
    off the stepped cumsum, tie keys classified identically."""
    from padua_spark.extensions.quality import abc_analysis

    li = _t(spark, sf, "lineitem").where(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_discount").isNotNull()
    ).select(
        "l_partkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (
                F.lit(100)
                - F.round(F.col("l_discount") * 100).cast("bigint")
            )
        ).alias("rev_micro"),
    )
    return abc_analysis(li, ["l_partkey"], "rev_micro")


# --- ext: two-proportion effect sizes (Newcombe CI, Cohen's h) ----------------


_TPE_ORACLE = """
WITH agg AS (
  SELECT
    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
      AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN l_returnflag = 'A' AND l_quantity > 25
      THEN 1 ELSE 0 END) AS BIGINT) AS ka,
    CAST(sum(CASE WHEN l_returnflag = 'R' AND l_quantity > 25
      THEN 1 ELSE 0 END) AS BIGINT) AS kb
  FROM lineitem
  WHERE l_returnflag IN ('A', 'R') AND l_quantity IS NOT NULL
),
w AS (
  SELECT n_a, n_b,
    CAST(ka AS DOUBLE) / n_a AS pa, CAST(kb AS DOUBLE) / n_b AS pb,
    1.959963984540054 AS z,
    1.959963984540054 * 1.959963984540054 AS z2
  FROM agg
),
ci AS (
  SELECT n_a, n_b, pa, pb,
    (pa + z2 / (2.0 * n_a)) / (1.0 + z2 / n_a)
      - z * sqrt(pa * (1.0 - pa) / n_a + z2 / (4.0 * n_a * n_a))
        / (1.0 + z2 / n_a) AS la,
    (pa + z2 / (2.0 * n_a)) / (1.0 + z2 / n_a)
      + z * sqrt(pa * (1.0 - pa) / n_a + z2 / (4.0 * n_a * n_a))
        / (1.0 + z2 / n_a) AS ua,
    (pb + z2 / (2.0 * n_b)) / (1.0 + z2 / n_b)
      - z * sqrt(pb * (1.0 - pb) / n_b + z2 / (4.0 * n_b * n_b))
        / (1.0 + z2 / n_b) AS lb,
    (pb + z2 / (2.0 * n_b)) / (1.0 + z2 / n_b)
      + z * sqrt(pb * (1.0 - pb) / n_b + z2 / (4.0 * n_b * n_b))
        / (1.0 + z2 / n_b) AS ub
  FROM w
)
SELECT n_a, n_b, round(pa, 6) AS p_a, round(pb, 6) AS p_b,
  round(pa - pb, 6) AS risk_diff,
  round(pa - pb - sqrt((pa - la) * (pa - la)
    + (ub - pb) * (ub - pb)), 6) AS rd_ci_lo,
  round(pa - pb + sqrt((ua - pa) * (ua - pa)
    + (pb - lb) * (pb - lb)), 6) AS rd_ci_hi,
  round(CASE WHEN pb > 0 THEN pa / pb END, 6) AS relative_risk,
  round(2.0 * asin(sqrt(pa)) - 2.0 * asin(sqrt(pb)), 6) AS cohens_h
FROM ci
"""


@_q("two_proportion_effects", _TPE_ORACLE)
def q_two_proportion_effects(spark, sf):
    """Two-proportion effect-size battery between return flags A and
    R on the high-quantity rate (stats.two_proportion_effects):
    Newcombe hybrid-score CI for the risk difference, relative risk,
    Cohen's h."""
    from padua_spark.operators.stats import two_proportion_effects

    li = _t(spark, sf, "lineitem").where(
        F.col("l_quantity").isNotNull()
    )
    return two_proportion_effects(
        li, "l_returnflag", F.col("l_quantity") > 25, "A", "R"
    )


# --- ext: propensity-score subclassification ATT ------------------------------


_PSM_ORACLE = """
WITH base AS (
  SELECT CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS t,
    CAST(floor(value) AS DOUBLE) AS y,
    CAST(floor(value) AS DOUBLE) / 512.0 AS s
  FROM events WHERE value IS NOT NULL AND value >= 0
),
tsc AS (
  SELECT s AS v, CAST(count(*) AS BIGINT) AS c
  FROM base WHERE t = 1 GROUP BY 1
),
st AS (
  SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS run,
    sum(c) OVER () AS tot
  FROM tsc
),
q AS (
  SELECT
    min(CASE WHEN run >= ceil(0.2 * tot) THEN v END) AS b0,
    min(CASE WHEN run >= ceil(0.4 * tot) THEN v END) AS b1,
    min(CASE WHEN run >= ceil(0.6 * tot) THEN v END) AS b2,
    min(CASE WHEN run >= ceil(0.8 * tot) THEN v END) AS b3
  FROM st
),
cells AS (
  SELECT (1 + CASE WHEN s > q.b0 THEN 1 ELSE 0 END
            + CASE WHEN s > q.b1 THEN 1 ELSE 0 END
            + CASE WHEN s > q.b2 THEN 1 ELSE 0 END
            + CASE WHEN s > q.b3 THEN 1 ELSE 0 END) AS k,
    t, CAST(count(*) AS BIGINT) AS n, sum(y) AS sy,
    sum(y * y) AS syy
  FROM base, q GROUP BY 1, 2
),
bt AS (
  SELECT tr.k, tr.n AS nt, tr.sy AS syt, tr.syy AS syyt,
    ct.n AS nc, ct.sy AS syc, ct.syy AS syyc
  FROM (SELECT * FROM cells WHERE t = 1) tr
  LEFT JOIN (SELECT * FROM cells WHERE t = 0) ct ON ct.k = tr.k
),
tot AS (
  SELECT CAST(sum(nt) AS BIGINT) AS n_treated,
    CAST(sum(coalesce(nc, 0)) AS BIGINT) AS n_control,
    CAST(sum(CASE WHEN nc > 0 THEN 1 ELSE 0 END) AS INT)
      AS n_strata_used,
    CAST(sum(CASE WHEN nc > 0 AND (nt < 2 OR nc < 2) THEN 1 ELSE 0
      END) AS INT) AS n_singleton_arm_strata,
    CAST(sum(CASE WHEN nc > 0 THEN nt ELSE 0 END) AS DOUBLE)
      AS n_used
  FROM bt
),
est AS (
  SELECT
    sum(CASE WHEN nc > 0 THEN (CAST(nt AS DOUBLE) / t.n_used)
      * (syt / nt - syc / nc) END) AS att,
    sum(CASE WHEN nc > 0 THEN
      (CAST(nt AS DOUBLE) / t.n_used) * (CAST(nt AS DOUBLE) / t.n_used)
      * (coalesce(CASE WHEN nt >= 2 THEN
           (syyt - nt * (syt / nt) * (syt / nt)) / (nt - 1.0) END, 0.0)
           / nt
         + coalesce(CASE WHEN nc >= 2 THEN
           (syyc - nc * (syc / nc) * (syc / nc)) / (nc - 1.0) END, 0.0)
           / nc) END) AS sev
  FROM bt, tot t
)
SELECT t.n_treated, t.n_control, t.n_strata_used,
  t.n_singleton_arm_strata,
  round(e.att, 6) AS att, round(sqrt(e.sev), 6) AS se
FROM tot t, est e
"""


@_q("propensity_strata_att", _PSM_ORACLE)
def q_propensity_strata_att(spark, sf):
    """Propensity-score subclassification ATT over five exact-quantile
    strata of the dyadic score (stats.propensity_strata_att):
    treated-distribution boundaries, per-stratum mean differences,
    linearized SE."""
    from padua_spark.operators.stats import propensity_strata_att

    e = _t(spark, sf, "events").where(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    ).select(
        (F.col("user_id") % 3 == 0).cast("int").alias("t"),
        F.floor(F.col("value")).cast("double").alias("y"),
        (F.floor(F.col("value")).cast("double") / 512.0).alias("s"),
    )
    return propensity_strata_att(e, "t", "y", "s", n_strata=5)


# --- ext: rolling correlation per key -----------------------------------------


_ROLLING_CORR_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id,
    CAST(floor(value) AS DOUBLE) AS x,
    CAST(event_id % 97 AS DOUBLE) AS y
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
w AS (
  SELECT user_id, tu, event_id,
    CAST(count(*) OVER win AS DOUBLE) AS n,
    sum(x) OVER win AS sx, sum(y) OVER win AS sy,
    sum(x * x) OVER win AS sxx, sum(y * y) OVER win AS syy,
    sum(x * y) OVER win AS sxy
  FROM e
  WINDOW win AS (PARTITION BY user_id ORDER BY tu, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT user_id, tu AS _us, event_id,
  CAST(n AS INT) AS n_w,
  round(CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
              AND n * syy - sy * sy > 0
    THEN (n * sxy - sx * sy)
      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6)
    AS rolling_corr
FROM w
"""


@_q("rolling_correlation", _ROLLING_CORR_ORACLE)
def q_rolling_correlation(spark, sf):
    """Trailing-10 rolling Pearson correlation of each user's event
    value against a deterministic companion series
    (temporal.rolling_correlation): five shared trailing sums in one
    ordered window pass per key, exact integer inputs."""
    from padua_spark.operators.temporal import rolling_correlation
    from padua_spark.streaming.windows import epoch_us_col

    e = _t(spark, sf, "events")
    base = e.where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id",
        epoch_us_col(e, "ts").alias("_us"),
        "event_id",
        F.floor(F.col("value")).cast("double").alias("x"),
        (F.col("event_id") % 97).cast("double").alias("y"),
    )
    return rolling_correlation(
        base, ["user_id"], ["_us", "event_id"], "x", "y", window=10
    )


# --- ext: trend / seasonal strength of a decomposition ------------------------


_DECOMP_STRENGTH_ORACLE = f"""
WITH dec AS (
  SELECT * FROM ({_SEASONAL_DECOMP_ORACLE})
),
mi AS (
  SELECT user_id,
    CAST(round(residual * 1000000) AS HUGEINT) AS r,
    CAST(round(trend * 1000000) AS HUGEINT)
      + CAST(round(residual * 1000000) AS HUGEINT) AS tr,
    CAST(round(seasonal * 1000000) AS HUGEINT)
      + CAST(round(residual * 1000000) AS HUGEINT) AS sr
  FROM dec
  WHERE trend IS NOT NULL AND seasonal IS NOT NULL
    AND residual IS NOT NULL
),
agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_used,
    sum(r) AS s_r, sum(r * r) AS s_rr,
    sum(tr) AS s_t, sum(tr * tr) AS s_tt,
    sum(sr) AS s_s, sum(sr * sr) AS s_ss
  FROM mi GROUP BY 1
)
SELECT user_id, n_used,
  round(CASE WHEN n_used >= 2
              AND CAST(n_used * s_tt - s_t * s_t AS DOUBLE) > 0
    THEN greatest(0.0, 1.0
      - CAST(n_used * s_rr - s_r * s_r AS DOUBLE)
        / CAST(n_used * s_tt - s_t * s_t AS DOUBLE)) END, 6)
    AS trend_strength,
  round(CASE WHEN n_used >= 2
              AND CAST(n_used * s_ss - s_s * s_s AS DOUBLE) > 0
    THEN greatest(0.0, 1.0
      - CAST(n_used * s_rr - s_r * s_r AS DOUBLE)
        / CAST(n_used * s_ss - s_s * s_s AS DOUBLE)) END, 6)
    AS seasonal_strength
FROM agg
"""


@_q("decomposition_strength", _DECOMP_STRENGTH_ORACLE)
def q_decomposition_strength(spark, sf):
    """FPP3 trend/seasonal strength of each user's period-4
    decomposition (temporal.decomposition_strength over
    seasonal_decompose): variances from exact integer micro-unit sums
    in decimal/HUGEINT, one final double ratio."""
    from padua_spark.operators.temporal import (
        decomposition_strength,
        seasonal_decompose,
    )
    from padua_spark.streaming.windows import epoch_us_col

    e = _t(spark, sf, "events")
    base = e.where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id",
        epoch_us_col(e, "ts").alias("_tu"),
        "event_id",
        "value",
    )
    dec = seasonal_decompose(
        base, ["user_id"], ["_tu", "event_id"], "value", period=4,
        exact_scale=100,
    )
    return decomposition_strength(dec, ["user_id"])


# --- ext: clustering-quality scores (CH index, simplified silhouette) --------


_CH_ORACLE = """
WITH d AS (
  SELECT label AS c,
    list_transform(embedding,
      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS m
  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
),
pos AS (
  SELECT c, unnest(generate_series(1, len(m))) AS p,
    unnest(m) AS e
  FROM d
),
percp AS (
  SELECT c, p, CAST(sum(e) AS HUGEINT) AS s FROM pos GROUP BY 1, 2
),
nc AS (SELECT c, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
bc AS (
  SELECT CAST(count(DISTINCT percp.c) AS BIGINT) AS k,
    sum(CAST(percp.s * percp.s AS DOUBLE) / nc.n) AS bsum
  FROM percp JOIN nc ON nc.c = percp.c
),
gp AS (
  SELECT p, CAST(sum(e) AS HUGEINT) AS gs FROM pos GROUP BY 1
),
g2 AS (SELECT sum(CAST(gs * gs AS DOUBLE)) AS gg FROM gp),
sq AS (
  SELECT sum(CAST(CAST(e AS HUGEINT) * CAST(e AS HUGEINT) AS DOUBLE))
    AS sumsq,
    CAST(count(DISTINCT 0) AS BIGINT) AS one
  FROM pos
),
ntot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM nc)
SELECT ntot.n, bc.k AS k_clusters,
  round((sq.sumsq - bc.bsum) / 1e12, 6) AS within_ss,
  round((bc.bsum - g2.gg / ntot.n) / 1e12, 6) AS between_ss,
  round(CASE WHEN bc.k >= 2 AND ntot.n > bc.k
              AND sq.sumsq - bc.bsum > 0
    THEN ((bc.bsum - g2.gg / ntot.n) / (bc.k - 1.0))
       / ((sq.sumsq - bc.bsum) / (ntot.n - bc.k)) END, 6)
    AS ch_score
FROM ntot, bc, g2, sq
"""


@_q("calinski_harabasz", _CH_ORACLE)
def q_calinski_harabasz(spark, sf):
    """Calinski-Harabasz variance-ratio score of the embeddings
    corpus under its ground-truth labels
    (similarity.calinski_harabasz): every sum of squares an exact
    integer micro-unit aggregation, one posexplode pass."""
    from padua_spark.extensions.similarity import calinski_harabasz

    e = _t(spark, sf, "embeddings")
    return calinski_harabasz(e, "embedding", "label")


_SILHOUETTE_ORACLE = """
WITH d AS (
  SELECT vec_id, label AS c,
    list_transform(embedding,
      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS m
  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
),
pos AS (
  SELECT c, unnest(generate_series(1, len(m))) AS p,
    unnest(m) AS e
  FROM d
),
percp AS (
  SELECT c, p, CAST(sum(e) AS HUGEINT) AS s,
    CAST(count(*) AS BIGINT) AS n
  FROM pos GROUP BY 1, 2
),
cents AS (
  SELECT c AS cc, list(CAST(s AS DOUBLE) / n ORDER BY p) AS cent,
    max(n) AS n
  FROM percp GROUP BY 1
),
dist AS (
  SELECT d.vec_id, d.c, cents.cc,
    sqrt(list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(generate_series(1, len(d.m)),
          i -> (CAST(d.m[i] AS DOUBLE) - cents.cent[i])
             * (CAST(d.m[i] AS DOUBLE) - cents.cent[i]))),
      (a, b) -> a + b)) AS dd
  FROM d, cents
),
ab AS (
  SELECT vec_id, c,
    min(CASE WHEN cc = c THEN dd END) AS a,
    min(CASE WHEN cc <> c THEN dd END) AS b
  FROM dist GROUP BY 1, 2
),
sv AS (
  SELECT c,
    round(CASE WHEN b IS NOT NULL AND greatest(a, b) > 0
      THEN (b - a) / greatest(a, b)
      WHEN b IS NOT NULL THEN 0.0 END, 9) AS s
  FROM ab
),
pc AS (
  SELECT c AS cluster, CAST(count(*) AS BIGINT) AS n,
    avg(s) AS ms
  FROM sv GROUP BY 1
)
SELECT cluster, n, round(ms, 6) AS mean_silhouette,
  round(sum(ms * n) OVER () / CAST(sum(n) OVER () AS DOUBLE), 6)
    AS overall
FROM pc
"""


@_q("silhouette_simplified", _SILHOUETTE_ORACLE)
def q_silhouette_simplified(spark, sf):
    """Simplified (centroid-based) silhouette of the embeddings
    corpus under its ground-truth labels
    (similarity.silhouette_simplified): exact micro-unit centroids
    broadcast, one ordered in-row distance fold per (doc, cluster)."""
    from padua_spark.extensions.similarity import silhouette_simplified

    e = _t(spark, sf, "embeddings")
    return silhouette_simplified(e, "vec_id", "embedding", "label")


# --- ext: binned numeric divergences (KL/JS/Bhattacharyya) --------------------


_BINNED_DIV_ORACLE = """
WITH base AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g,
    CAST(value AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL
),
per AS (
  SELECT CAST(greatest(0, least(9,
      CAST(floor((v - 0.0) / 50.0) AS INT))) AS INT) AS bin,
    CAST(sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM base GROUP BY 1
),
t AS (
  SELECT bin, n_a, n_b,
    (CAST(n_a AS DOUBLE) + 0.5)
      / (CAST(sum(n_a) OVER () AS DOUBLE) + 5.0) AS pa,
    (CAST(n_b AS DOUBLE) + 0.5)
      / (CAST(sum(n_b) OVER () AS DOUBLE) + 5.0) AS pb
  FROM per
),
s AS (
  SELECT bin, n_a, n_b, pa, pb,
    pa * ln(pa / pb) AS klab,
    pb * ln(pb / pa) AS klba,
    0.5 * (pa * ln(pa / ((pa + pb) / 2.0))
           + pb * ln(pb / ((pa + pb) / 2.0))) AS jst,
    sqrt(pa * pb) AS bct
  FROM t
)
SELECT bin, n_a, n_b, round(pa, 6) AS p_a, round(pb, 6) AS p_b,
  round(klab, 6) AS kl_ab_term, round(jst, 6) AS js_term,
  round(bct, 6) AS bc_term,
  round(sum(klab) OVER (), 6) AS kl_ab,
  round(sum(klba) OVER (), 6) AS kl_ba,
  round(sum(jst) OVER (), 6) AS js,
  round(-ln(sum(bct) OVER ()), 6) AS bhattacharyya
FROM s
"""


@_q("binned_divergences", _BINNED_DIV_ORACLE)
def q_binned_divergences(spark, sf):
    """KL/JS/Bhattacharyya drift between even- and odd-user event
    values over fixed [0, 500] deciles
    (quality.binned_divergences): psi_drift's bin law with the
    bounded information-theoretic metrics."""
    from padua_spark.extensions.quality import binned_divergences

    e = _t(spark, sf, "events").select(
        F.when(F.col("user_id") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b")).alias("g"),
        F.col("value"),
    )
    return binned_divergences(
        e, "g", "a", "b", "value", 0.0, 500.0, 10
    )


# --- ext: MMR diversified re-ranking -------------------------------------------


def _mmr_oracle(k: int = 10, lam: float = 0.7) -> str:
    def cos(ca: str, sa: str) -> str:
        dot = (
            "CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), "
            f"list_transform(generate_series(1, len({ca}.m)), "
            f"i -> CAST({ca}.m[i] AS HUGEINT) "
            f"* CAST({sa}.m[i] AS HUGEINT))), (a, b) -> a + b) "
            "AS DOUBLE)"
        )
        return (
            f"CASE WHEN {ca}.nrm * {sa}.nrm > 0 "
            f"THEN {dot} / ({ca}.nrm * {sa}.nrm) ELSE 0.0 END"
        )

    parts = [f"""
WITH cand AS MATERIALIZED (
  SELECT vec_id AS id,
    CAST(vec_id % 97 AS DOUBLE) / 97.0 AS score,
    list_transform(embedding,
      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS m,
    sqrt(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      list_transform(embedding,
        x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
           * CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))),
      (a, b) -> a + b) AS DOUBLE)) AS nrm
  FROM embeddings
  WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
),
sel1 AS MATERIALIZED (
  SELECT id, score, m, nrm, CAST({lam!r} AS DOUBLE) * score AS mmr
  FROM cand ORDER BY mmr DESC, id LIMIT 1
),
ms1 AS MATERIALIZED (
  SELECT c.id, {cos('c', 's')} AS ms
  FROM cand c, sel1 s
)"""]
    for j in range(2, k + 1):
        excl = " UNION ALL ".join(
            f"SELECT id FROM sel{i}" for i in range(1, j)
        )
        parts.append(f""",
sel{j} AS MATERIALIZED (
  SELECT c.id, c.score, c.m, c.nrm,
    CAST({lam!r} AS DOUBLE) * c.score
      - CAST({1.0 - lam!r} AS DOUBLE) * ms.ms AS mmr
  FROM cand c JOIN ms{j - 1} ms ON ms.id = c.id
  WHERE c.id NOT IN ({excl})
  ORDER BY mmr DESC, c.id LIMIT 1
)""")
        if j < k:
            parts.append(f""",
ms{j} AS MATERIALIZED (
  SELECT m.id, greatest(m.ms, {cos('c', 's')}) AS ms
  FROM ms{j - 1} m JOIN cand c ON c.id = m.id, sel{j} s
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, id, round(score, 6) AS score, "
        f"round(mmr, 6) AS mmr_score FROM sel{i}"
        for i in range(1, k + 1)
    )
    parts.append(f"\n{union}\n")
    return "".join(parts)


@_q("mmr_rerank", _mmr_oracle())
def q_mmr_rerank(spark, sf):
    """MMR diversified top-10 over the embeddings pool with a
    deterministic pseudo-relevance score
    (similarity.mmr_rerank, λ=0.7): exact int64 micro-unit cosines,
    bounded-pool greedy; the oracle unrolls the same greedy as k
    chained CTE levels."""
    from padua_spark.extensions.similarity import mmr_rerank

    e = _t(spark, sf, "embeddings").where(
        F.col("embedding").isNotNull() & F.col("vec_id").isNotNull()
    ).select(
        "vec_id", "embedding",
        ((F.col("vec_id") % 97).cast("double") / 97.0).alias(
            "rel_score"
        ),
    )
    out = mmr_rerank(
        e, "vec_id", "embedding", "rel_score", k=10, lam=0.7,
        max_candidates=50_000,
    )
    return out.select(
        "rank", F.col("id").alias("id"),
        F.round("score", 6).alias("score"), "mmr_score",
    )


# --- ext: windowed n-gram novelty (streaming front half) ----------------------


def _windowed_novelty_oracle() -> str:
    m = 2147483647
    coefs = [(1000000007 ** j) % m for j in range(5)]
    acc = "CAST(0 AS BIGINT)"
    for j, c in enumerate(coefs):
        acc = f"(({acc} + th[i + {j}] * {c}) % {m})"
    return f"""
WITH t AS (
  SELECT doc_id,
    list_transform(string_split(text, ' '), w -> list_reduce(
        list_prepend(CAST(7 AS BIGINT),
          list_transform(list_filter(string_split(w, ''), c -> c <> ''),
                         c -> CAST(ord(c) AS BIGINT))),
        (a, c) -> (a * 131 + c) % {m})) AS th
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id,
    list_distinct(list_transform(generate_series(1, len(th) - 4),
                                 i -> {acc})) AS sh
  FROM t WHERE len(th) >= 5
),
rf AS (
  SELECT DISTINCT shingle FROM (
    SELECT unnest(sh) AS shingle FROM g WHERE doc_id % 7 = 0
  )
),
tr AS (
  SELECT (doc_id * 60 // 3600) * 3600 AS ws,
    unnest(sh) AS shingle
  FROM g WHERE doc_id % 7 <> 0
)
SELECT tr.ws AS window_start_epoch,
  CAST(count(*) AS BIGINT) AS n_ngrams,
  CAST(sum(CASE WHEN rf.shingle IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_novel,
  round(CAST(sum(CASE WHEN rf.shingle IS NULL THEN 1 ELSE 0 END)
    AS DOUBLE) / count(*), 6) AS novelty_rate
FROM tr LEFT JOIN rf ON tr.shingle = rf.shingle
GROUP BY 1
"""


@_q("windowed_novelty", _windowed_novelty_oracle())
def q_windowed_novelty(spark, sf):
    """Per-hour n-gram novelty of the 6/7 train split against the 1/7
    static reference on a doc_id-derived event time
    (streaming.windowed_novelty): stream-static left join + one
    stateful two-integer aggregation per window; stream==batch parity
    is pytest-gated, this entry gates the batch twin."""
    from padua_spark.streaming import windowed_novelty

    d = _t(spark, sf, "documents")
    ref = d.where(F.col("doc_id") % 7 == 0)
    tr = d.where(F.col("doc_id") % 7 != 0).withColumn(
        "_ts", F.timestamp_seconds(F.col("doc_id") * 60)
    )
    out = windowed_novelty(
        tr, F.col("_ts"), "text", ref, n_tokens=5,
        window_duration="1 hour",
    )
    return out.select(
        F.col("window_start").cast("long").alias(
            "window_start_epoch"
        ),
        "n_ngrams", "n_novel", "novelty_rate",
    )


# --- ext: Fleming-Harrington weighted log-rank --------------------------------


_FH_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_type FROM events
),
u AS (
  SELECT user_id,
    min(tu) AS t0,
    max(tu) AS t_last,
    min(CASE WHEN event_type = 'error' THEN tu END) AS t_err
  FROM e GROUP BY user_id
),
subj AS (
  SELECT user_id % 2 AS cohort,
    CASE WHEN t_err IS NOT NULL
      THEN CAST(floor((t_err - t0) / 3600000000.0) AS BIGINT)
      ELSE CAST(floor((t_last - t0) / 3600000000.0) AS BIGINT)
    END AS dur,
    CASE WHEN t_err IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM u
),
per AS (
  SELECT CAST(dur AS DOUBLE) AS t,
    CAST(sum(CASE WHEN cohort = 0 THEN ev ELSE 0 END) AS BIGINT) AS ev_a,
    CAST(count(*) FILTER (WHERE cohort = 0) AS BIGINT) AS lv_a,
    CAST(sum(CASE WHEN cohort = 1 THEN ev ELSE 0 END) AS BIGINT) AS ev_b,
    CAST(count(*) FILTER (WHERE cohort = 1) AS BIGINT) AS lv_b
  FROM subj GROUP BY 1
),
run AS (
  SELECT *,
    sum(lv_a) OVER w AS lv_a_run, sum(lv_b) OVER w AS lv_b_run,
    sum(lv_a) OVER () AS lv_a_tot, sum(lv_b) OVER () AS lv_b_tot
  FROM per
  WINDOW w AS (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
terms AS (
  SELECT t, ev_a, ev_b, lv_a_tot, lv_b_tot,
    lv_a_tot - (lv_a_run - lv_a) AS n_a,
    lv_b_tot - (lv_b_run - lv_b) AS n_b
  FROM run
),
lf AS (
  SELECT t, ev_a, ev_b, lv_a_tot, lv_b_tot, n_a, n_b,
    ev_a + ev_b AS d, n_a + n_b AS n,
    CASE WHEN ev_a + ev_b > 0 AND n_a + n_b > ev_a + ev_b
      THEN ln(CAST(n_a + n_b - ev_a - ev_b AS DOUBLE)
              / CAST(n_a + n_b AS DOUBLE))
      ELSE 0.0 END AS logf
  FROM terms
),
run2 AS (
  SELECT *,
    sum(logf) OVER (ORDER BY t
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lf_run
  FROM lf
),
wt AS (
  SELECT *,
    pow(exp(lf_run - logf), CAST(1.0 AS DOUBLE)) AS w,
    CAST(n_a AS DOUBLE) / n AS ra
  FROM run2
),
agg AS (
  SELECT
    CAST(max(lv_a_tot) AS BIGINT) AS n_a,
    CAST(max(lv_b_tot) AS BIGINT) AS n_b,
    CAST(sum(ev_a) AS BIGINT) AS observed_a,
    sum(w * (CAST(ev_a AS DOUBLE)
      - CASE WHEN d > 0 THEN CAST(d AS DOUBLE) * ra ELSE 0.0 END))
      AS oe,
    sum(w * CASE WHEN d > 0 THEN CAST(d AS DOUBLE) * ra
        ELSE 0.0 END) AS ew,
    sum(w * w * CASE WHEN d > 0 AND n > 1 THEN
      CAST(d AS DOUBLE) * ra * (1.0 - ra)
      * CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE)
      ELSE 0.0 END) AS v
  FROM wt
),
chi AS (
  SELECT *, CASE WHEN v > 0 THEN oe * oe / v END AS chi2 FROM agg
),
ez AS (
  SELECT *, abs(sqrt(chi2)) / sqrt(2.0) AS x,
    1.0 / (1.0 + 0.3275911 * (abs(sqrt(chi2)) / sqrt(2.0))) AS tt
  FROM chi
)
SELECT n_a, n_b, CAST(1.0 AS DOUBLE) AS rho, observed_a,
  round(ew, 6) AS expected_a_w,
  round(chi2, 6) AS chi2,
  round(CASE WHEN chi2 IS NOT NULL THEN
    (0.254829592 * tt + -0.284496736 * tt * tt
     + 1.421413741 * tt * tt * tt + -1.453152027 * tt * tt * tt * tt
     + 1.061405429 * tt * tt * tt * tt * tt) * exp(-x * x) END, 6)
    AS p_value
FROM ez
"""


@_q("fleming_harrington_test", _FH_ORACLE)
def q_fleming_harrington_test(spark, sf):
    """Fleming-Harrington G^1 weighted log-rank on time-to-first-error
    between even/odd user cohorts (stats.fleming_harrington_test):
    the logrank_test fixture with KM-survival weights from one extra
    stepped-cumsum pass over the log factors."""
    from padua_spark.operators.stats import fleming_harrington_test
    from padua_spark.streaming.windows import epoch_us_col

    base = _t(spark, sf, "events")
    ev = base.select(
        "user_id",
        epoch_us_col(base, "ts").alias("_tu"),
        "event_type",
    )
    u = ev.groupBy("user_id").agg(
        F.min("_tu").alias("_t0"),
        F.max("_tu").alias("_tl"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("_tu"))
        ).alias("_te"),
    )
    subj = u.select(
        (F.col("user_id") % 2).alias("cohort"),
        F.floor(
            (
                F.coalesce(F.col("_te"), F.col("_tl"))
                - F.col("_t0")
            ) / 3600000000.0
        ).cast("double").alias("dur"),
        F.col("_te").isNotNull().cast("int").alias("ev"),
    )
    return fleming_harrington_test(
        subj, "cohort", "dur", "ev", 0, 1, rho=1.0
    )


# --- ext: sample L-moments ------------------------------------------------------


_LMOMENTS_ORACLE = """
WITH per AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS v,
    CAST(count(*) AS BIGINT) AS c
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
),
run AS (
  SELECT v, c,
    sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS rn,
    sum(c) OVER () AS n
  FROM per
),
stage AS (
  SELECT v, CAST(rn AS DOUBLE) AS pc,
    CAST(rn - c AS DOUBLE) AS p, CAST(n AS BIGINT) AS n
  FROM run
),
agg AS (
  SELECT max(n) AS n,
    sum(v * ((1.0 * pc) / 1.0 - (1.0 * p) / 1.0)) AS t0,
    sum(v * ((1.0 * pc * (pc - 1.0)) / 2.0
           - (1.0 * p * (p - 1.0)) / 2.0)) AS t1,
    sum(v * ((1.0 * pc * (pc - 1.0) * (pc - 2.0)) / 6.0
           - (1.0 * p * (p - 1.0) * (p - 2.0)) / 6.0)) AS t2,
    sum(v * ((1.0 * pc * (pc - 1.0) * (pc - 2.0) * (pc - 3.0)) / 24.0
           - (1.0 * p * (p - 1.0) * (p - 2.0) * (p - 3.0)) / 24.0))
      AS t3
  FROM stage
),
b AS (
  SELECT CAST(n AS BIGINT) AS n,
    t0 / n AS b0,
    CASE WHEN n >= 2 THEN t1 / (n * ((1.0 * (n - 1.0)) / 1.0)) END
      AS b1,
    CASE WHEN n >= 3 THEN
      t2 / (n * ((1.0 * (n - 1.0) * (n - 2.0)) / 2.0)) END AS b2,
    CASE WHEN n >= 4 THEN
      t3 / (n * ((1.0 * (n - 1.0) * (n - 2.0) * (n - 3.0)) / 6.0))
      END AS b3
  FROM agg
),
l AS (
  SELECT n, b0 AS l1, 2.0 * b1 - b0 AS l2,
    6.0 * b2 - 6.0 * b1 + b0 AS l3,
    20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0 AS l4
  FROM b
)
SELECT n, round(l1, 6) AS l1, round(l2, 6) AS l2,
  round(l3, 6) AS l3, round(l4, 6) AS l4,
  round(CASE WHEN l1 <> 0 THEN l2 / l1 END, 6) AS l_cv,
  round(CASE WHEN l2 <> 0 THEN l3 / l2 END, 6) AS l_skew,
  round(CASE WHEN l2 <> 0 THEN l4 / l2 END, 6) AS l_kurt
FROM l
"""


@_q("l_moments", _LMOMENTS_ORACLE)
def q_l_moments(spark, sf):
    """Sample L-moments and L-ratios of the extended-price
    distribution (stats.l_moments): tie-block hockey-stick weights
    over the stepped cumsum — no per-row ranks materialized."""
    from padua_spark.operators.stats import l_moments

    li = _t(spark, sf, "lineitem")
    return l_moments(li, "l_extendedprice")


# --- ext: log-log price elasticity ---------------------------------------------


_ELASTICITY_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS g,
    ln(CAST(l_extendedprice AS DOUBLE)
       / CAST(l_quantity AS DOUBLE)) AS x,
    ln(CAST(l_quantity AS DOUBLE)) AS y
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    AND l_extendedprice / l_quantity > 0 AND l_quantity > 0
),
agg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
    sum(y * y) AS syy, sum(x * y) AS sxy
  FROM base GROUP BY 1
)
SELECT g AS l_returnflag, n,
  round(CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6)
    AS elasticity,
  round(CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
    THEN (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
         / n END, 6) AS intercept,
  round(CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
              AND n * syy - sy * sy > 0
    THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
      / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS r2
FROM agg
"""


@_q("log_log_elasticity", _ELASTICITY_ORACLE)
def q_log_log_elasticity(spark, sf):
    """Log-log price elasticity of quantity on unit price per return
    flag (temporal.log_log_elasticity): one six-sum aggregation per
    key, closed-form OLS."""
    from padua_spark.operators.temporal import log_log_elasticity

    li = _t(spark, sf, "lineitem").where(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull()
    ).select(
        F.col("l_returnflag"),
        (
            F.col("l_extendedprice").cast("double")
            / F.col("l_quantity").cast("double")
        ).alias("unit_price"),
        F.col("l_quantity"),
    )
    return log_log_elasticity(
        li, ["l_returnflag"], "unit_price", "l_quantity"
    )


# --- ext: hard-negative mining for contrastive training -----------------------


_HNM_ORACLE = """
WITH anch AS (
  SELECT vec_id AS aid, label AS alab,
    CAST(embedding AS DOUBLE[]) AS av
  FROM embeddings
  WHERE vec_id % 50 = 0 AND embedding IS NOT NULL
    AND label IS NOT NULL
),
corpus AS (
  SELECT vec_id AS cid, label AS clab,
    CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
  WHERE embedding IS NOT NULL AND label IS NOT NULL
),
scored AS (
  SELECT a.aid, c.cid, a.alab, c.clab,
    list_dot_product(c.cv, a.av)
      / (sqrt(list_dot_product(c.cv, c.cv))
         * sqrt(list_dot_product(a.av, a.av))) AS sim
  FROM corpus c, anch a
  WHERE a.alab <> c.clab AND a.aid <> c.cid
),
ranked AS (
  SELECT aid, cid, alab, clab, sim,
    row_number() OVER (PARTITION BY aid ORDER BY sim DESC, cid)
      AS rn
  FROM scored
)
SELECT aid AS anchor_id, cid AS negative_id,
  alab AS anchor_label, clab AS negative_label,
  round(sim, 6) AS cosine_sim, CAST(rn AS INT) AS rank
FROM ranked WHERE rn <= 5
"""


@_q("hard_negative_mining", _HNM_ORACLE)
def q_hard_negative_mining(spark, sf):
    """Top-5 different-label hard negatives for every 50th embedding
    (similarity.hard_negative_mining): knn_join's broadcast-anchor
    plan with a label veto before the rank-limit window."""
    from padua_spark.extensions.similarity import hard_negative_mining

    e = _t(spark, sf, "embeddings")
    anchors = e.where(F.col("vec_id") % 50 == 0)
    return hard_negative_mining(
        e, "vec_id", "embedding", "label", anchors, k=5
    )


# --- ext: Rayleigh circular-uniformity test ------------------------------------


_RAYLEIGH_ORACLE = """
WITH base AS (
  SELECT 2.0 * pi()
    * (CAST(epoch_us(ts) % 86400000000 AS DOUBLE) / 86400000000.0)
    AS theta
  FROM events WHERE ts IS NOT NULL
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    sum(cos(theta)) AS c, sum(sin(theta)) AS s
  FROM base
),
st AS (
  SELECT n, c, s,
    sqrt(c * c + s * s) / n AS rbar
  FROM agg
),
z AS (
  SELECT n, c, s, rbar, n * rbar * rbar AS zz FROM st
)
SELECT n,
  round(CASE WHEN n > 0 THEN atan2(s, c) END, 6) AS mean_direction,
  round(rbar, 6) AS r_bar,
  round(1.0 - rbar, 6) AS circ_variance,
  round(zz, 6) AS rayleigh_z,
  round(CASE WHEN n > 0 THEN greatest(0.0, least(
    exp(-zz) * (1.0 + (2.0 * zz - zz * zz) / (4.0 * n)
      - (24.0 * zz - 132.0 * zz * zz + 76.0 * zz * zz * zz
         - 9.0 * zz * zz * zz * zz) / (288.0 * n * n)), 1.0)) END, 6)
    AS p_value
FROM z
"""


@_q("rayleigh_uniformity", _RAYLEIGH_ORACLE)
def q_rayleigh_uniformity(spark, sf):
    """Rayleigh uniformity of event time-of-day phases
    (temporal.rayleigh_uniformity): two trig sums, Zar's finite-n
    p correction — is traffic uniform over the 24h clock?"""
    from padua_spark.operators.temporal import rayleigh_uniformity
    from padua_spark.streaming.windows import epoch_us_col

    e = _t(spark, sf, "events")
    base = e.where(F.col("ts").isNotNull()).select(
        (
            2.0 * 3.141592653589793
            * (
                (epoch_us_col(e, "ts") % 86400000000).cast("double")
                / 86400000000.0
            )
        ).alias("theta")
    )
    return rayleigh_uniformity(base, "theta")


# --- ext: Deming errors-in-both regression ------------------------------------


_DEMING_ORACLE = """
WITH base AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
    CAST(l_extendedprice AS DOUBLE) / 1000.0 AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx0,
    sum(y * y) AS syy0, sum(x * y) AS sxy0
  FROM base
),
c AS (
  SELECT n,
    sxx0 - sx * sx / n AS sxx,
    syy0 - sy * sy / n AS syy,
    sxy0 - sx * sy / n AS sxy,
    sx, sy
  FROM agg
),
fit AS (
  SELECT n, sx, sy, sxx, syy, sxy,
    CASE WHEN n >= 2 AND sxy <> 0 THEN
      (syy - 1.0 * sxx
       + sqrt((syy - 1.0 * sxx) * (syy - 1.0 * sxx)
              + 4.0 * 1.0 * sxy * sxy)) / (2.0 * sxy) END AS beta
  FROM c
)
SELECT n, CAST(1.0 AS DOUBLE) AS delta,
  round(beta, 6) AS slope,
  round(CASE WHEN beta IS NOT NULL
    THEN (sy - beta * sx) / n END, 6) AS intercept,
  round(CASE WHEN beta IS NOT NULL AND sxx > 0 AND syy > 0
    THEN sxy / sqrt(sxx * syy) END, 6) AS r
FROM fit
"""


@_q("deming_regression", _DEMING_ORACLE)
def q_deming_regression(spark, sf):
    """Deming errors-in-both fit of price-in-thousands on quantity
    (stats.deming_regression, δ=1): one six-sum aggregation, the
    Deming 1943 closed form."""
    from padua_spark.operators.stats import deming_regression

    li = _t(spark, sf, "lineitem").select(
        F.col("l_quantity").alias("x"),
        (F.col("l_extendedprice").cast("double") / 1000.0).alias("y"),
    )
    return deming_regression(li, "x", "y", delta=1.0)


# --- ext: KS separation + Youden-optimal cutoff -------------------------------


_SCORE_SEP_ORACLE = """
WITH base AS (
  SELECT CAST(floor(value) AS DOUBLE) / 512.0 AS s,
    CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS y
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL AND value >= 0
),
per AS (
  SELECT s AS v, CAST(sum(y) AS BIGINT) AS p,
    CAST(sum(1 - y) AS BIGINT) AS g
  FROM base GROUP BY 1
),
run AS (
  SELECT v,
    sum(p) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS prun,
    sum(g) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS grun,
    sum(p) OVER () AS ptot, sum(g) OVER () AS gtot
  FROM per
),
j AS (
  SELECT v, CAST(ptot AS BIGINT) AS n_pos,
    CAST(gtot AS BIGINT) AS n_neg,
    1.0 - CAST(prun AS DOUBLE) / ptot AS tpr,
    1.0 - CAST(grun AS DOUBLE) / gtot AS fpr
  FROM run
),
best AS (
  SELECT * FROM j ORDER BY tpr - fpr DESC, v ASC LIMIT 1
)
SELECT n_pos, n_neg,
  round(tpr - fpr, 6) AS ks_stat,
  round(v, 6) AS optimal_cutoff,
  round(tpr, 6) AS tpr_at_cutoff,
  round(fpr, 6) AS fpr_at_cutoff
FROM best
"""


@_q("score_separation", _SCORE_SEP_ORACLE)
def q_score_separation(spark, sf):
    """KS separation and Youden-optimal cutoff of the dyadic
    pseudo-probability against engagement labels
    (stats.score_separation): per-distinct-score class counts, two
    stepped ECDFs, one argmax row."""
    from padua_spark.operators.stats import score_separation

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull() & (F.col("value") >= 0)
    ).select(
        (F.floor(F.col("value")).cast("double") / 512.0).alias("s"),
        F.col("event_type").isin("click", "view")
        .cast("int").alias("y"),
    )
    return score_separation(e, "s", "y")


# --- ext: COEC position-bias profile ------------------------------------------


_COEC_ORACLE = """
WITH base AS (
  SELECT (event_id % 5) + 1 AS pos,
    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS c,
    user_id % 3 AS g
  FROM events WHERE event_type IS NOT NULL
),
prior AS (
  SELECT pos, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(c) AS BIGINT) AS nc,
    CAST(sum(c) AS DOUBLE) / count(*) AS pr
  FROM base GROUP BY 1
)
SELECT b.g, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(b.c) AS BIGINT) AS n_clicks,
  round(sum(p.pr), 6) AS expected_clicks,
  round(CASE WHEN sum(p.pr) > 0
    THEN CAST(sum(b.c) AS DOUBLE) / sum(p.pr) END, 6) AS coec
FROM base b JOIN prior p ON p.pos = b.pos
GROUP BY 1
"""


@_q("coec_position_bias", _COEC_ORACLE)
def q_coec_position_bias(spark, sf):
    """COEC position-bias correction over a deterministic position
    fixture and user cohorts (features.coec_position_bias): pooled
    per-position priors broadcast back, clicks over expected clicks
    per cohort."""
    from padua_spark.extensions.features import coec_position_bias

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull()
    ).select(
        ((F.col("event_id") % 5) + 1).alias("pos"),
        (F.col("event_type") == "click").cast("int").alias("click"),
        (F.col("user_id") % 3).alias("g"),
    )
    return coec_position_bias(e, "pos", "click", ["g"])


# --- ext: Hodges-Lehmann shift with Moses CI -----------------------------------


_HL_SHIFT_CI_ORACLE = """
WITH cells AS (
  SELECT l_returnflag = 'A' AS isa, CAST(l_quantity AS DOUBLE) AS v,
    CAST(count(*) AS BIGINT) AS c
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_returnflag IN ('A', 'R')
  GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(CASE WHEN isa THEN c ELSE 0 END) AS BIGINT) AS na,
    CAST(sum(CASE WHEN NOT isa THEN c ELSE 0 END) AS BIGINT) AS nb
  FROM cells
),
kk AS (
  SELECT na, nb, na * nb AS t,
    greatest(0, CAST(floor(CAST(na AS DOUBLE) * nb / 2.0
      - 1.959963984540054
        * sqrt(CAST(na AS DOUBLE) * nb * (na + nb + 1) / 12.0))
      AS BIGINT)) AS k
  FROM tot
),
diffs AS (
  SELECT a.v - b.v AS dv, CAST(sum(a.c * b.c) AS BIGINT) AS w
  FROM (SELECT v, c FROM cells WHERE isa) a,
       (SELECT v, c FROM cells WHERE NOT isa) b
  GROUP BY 1
),
run AS (
  SELECT dv, sum(w) OVER (ORDER BY dv ROWS UNBOUNDED PRECEDING) AS r
  FROM diffs
),
sel AS (
  SELECT
    min(CASE WHEN r >= (kk.t + 1) // 2 THEN dv END) AS lo,
    min(CASE WHEN r >= kk.t // 2 + 1 THEN dv END) AS hi,
    min(CASE WHEN r >= least(kk.k + 1, kk.t) THEN dv END) AS cl,
    min(CASE WHEN r >= greatest(1, kk.t - kk.k) THEN dv END) AS ch
  FROM run, kk
)
SELECT kk.na AS n_a, kk.nb AS n_b,
  CAST(kk.t AS BIGINT) AS n_pairs,
  round((sel.lo + sel.hi) / 2.0, 6) AS hl_shift,
  round(sel.cl, 6) AS ci_lo,
  round(sel.ch, 6) AS ci_hi
FROM kk, sel
"""


@_q("hodges_lehmann_shift_ci", _HL_SHIFT_CI_ORACLE)
def q_hodges_lehmann_shift_ci(spark, sf):
    """Hodges-Lehmann shift with the Moses/Lehmann 95%
    distribution-free CI (stats.hodges_lehmann_shift,
    conf_level=0.95): two extra rank lookups off the same stepped
    frame, normal-approximation rank bound."""
    from padua_spark.operators.stats import hodges_lehmann_shift

    li = _t(spark, sf, "lineitem")
    return hodges_lehmann_shift(
        li, "l_returnflag", "l_quantity", "A", "R", conf_level=0.95
    )


# --- ext: direct/indirect rate standardization ----------------------------------


_RATE_STD_ORACLE = """
WITH base AS (
  SELECT l_linenumber AS s,
    CASE WHEN l_returnflag = 'R' THEN CAST(1.0 AS DOUBLE)
      ELSE CAST(0.0 AS DOUBLE) END AS e,
    CAST(l_quantity AS DOUBLE) AS x
  FROM lineitem
  WHERE l_linenumber IS NOT NULL AND l_quantity IS NOT NULL
    AND l_quantity > 0
),
per AS (
  SELECT s, sum(e) AS e, sum(x) AS x FROM base GROUP BY 1
),
ref(stratum, ref_rate, ref_weight) AS (VALUES
  (1, 0.010, 0.25), (2, 0.012, 0.20), (3, 0.014, 0.15),
  (4, 0.016, 0.15), (5, 0.018, 0.10), (6, 0.020, 0.10),
  (7, 0.022, 0.05)
),
j AS (
  SELECT per.s, per.e, per.x,
    CAST(ref.ref_rate AS DOUBLE) AS rr,
    CAST(ref.ref_weight AS DOUBLE) AS rw
  FROM per JOIN ref ON ref.stratum = per.s
),
agg AS (
  SELECT CAST(count(*) AS INT) AS n_strata_used,
    sum(e) AS obs, sum(x) AS exp_tot,
    sum(x * rr) AS expected,
    sum(rw * (e / x)) AS dnum, sum(rw) AS dden
  FROM j
)
SELECT n_strata_used,
  round(obs, 6) AS observed,
  round(expected, 6) AS expected,
  round(CASE WHEN exp_tot > 0 THEN obs / exp_tot END, 6)
    AS crude_rate,
  round(CASE WHEN dden > 0 THEN dnum / dden END, 6) AS direct_rate,
  round(CASE WHEN expected > 0 THEN obs / expected END, 6) AS smr,
  round(CASE WHEN obs > 0 AND expected > 0 THEN
    (obs / expected)
    * pow(1.0 - 1.0 / (9.0 * obs)
          - 1.959963984540054 / (3.0 * sqrt(obs)), 3.0) END, 6)
    AS smr_ci_lo,
  round(CASE WHEN obs > 0 AND expected > 0 THEN
    (obs / expected)
    * pow(1.0 - 1.0 / (9.0 * (obs + 1.0))
          + 1.959963984540054 / (3.0 * sqrt(obs + 1.0)), 3.0)
    * (obs + 1.0) / obs END, 6) AS smr_ci_hi
FROM agg
"""


@_q("rate_standardization", _RATE_STD_ORACLE)
def q_rate_standardization(spark, sf):
    """Direct + indirect (SMR, Byar CI) standardization of the return
    rate per quantity unit across line-number strata against a fixed
    reference schedule (stats.rate_standardization)."""
    from padua_spark.operators.stats import rate_standardization

    li = _t(spark, sf, "lineitem").where(
        F.col("l_linenumber").isNotNull()
        & F.col("l_quantity").isNotNull()
        & (F.col("l_quantity") > 0)
    ).select(
        F.col("l_linenumber").alias("s"),
        (F.col("l_returnflag") == "R").cast("double").alias("e"),
        F.col("l_quantity").cast("double").alias("x"),
    )
    ref = spark.createDataFrame(
        [
            (1, 0.010, 0.25), (2, 0.012, 0.20), (3, 0.014, 0.15),
            (4, 0.016, 0.15), (5, 0.018, 0.10), (6, 0.020, 0.10),
            (7, 0.022, 0.05),
        ],
        "stratum int, ref_rate double, ref_weight double",
    )
    return rate_standardization(li, "s", "e", "x", ref)


# --- ext: X-bar/S control-chart limits -----------------------------------------


def _cc_oracle() -> str:
    from padua_spark.operators.stats import _C4_TABLE

    c4_case = " ".join(
        f"WHEN {n} THEN {v!r}" for n, v in sorted(_C4_TABLE.items())
    )
    return f"""
WITH per AS (
  SELECT l_orderkey AS g, CAST(count(*) AS BIGINT) AS n,
    avg(CAST(l_quantity AS DOUBLE)) AS m,
    stddev_samp(CAST(l_quantity AS DOUBLE)) AS s
  FROM lineitem WHERE l_quantity IS NOT NULL
  GROUP BY 1 HAVING count(*) >= 2
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_subgroups,
    CAST(min(n) AS BIGINT) AS n_min,
    CAST(max(n) AS BIGINT) AS n_max,
    avg(CAST(n AS DOUBLE)) AS nbar,
    avg(m) AS xbb, avg(s) AS sbar
  FROM per
),
cc AS (
  SELECT *,
    CAST(round(nbar) AS INT) AS nint
  FROM agg
),
k AS (
  SELECT *, CASE nint {c4_case} END AS c4 FROM cc
)
SELECT n_subgroups, n_min, n_max,
  round(nbar, 6) AS n_bar,
  round(xbb, 6) AS grand_mean,
  round(sbar, 6) AS s_bar,
  round(xbb - 3.0 * (sbar / c4) / sqrt(CAST(nint AS DOUBLE)), 6)
    AS xbar_lcl,
  round(xbb + 3.0 * (sbar / c4) / sqrt(CAST(nint AS DOUBLE)), 6)
    AS xbar_ucl,
  round(greatest(0.0,
    sbar - 3.0 * (sbar / c4) * sqrt(1.0 - c4 * c4)), 6) AS s_lcl,
  round(sbar + 3.0 * (sbar / c4) * sqrt(1.0 - c4 * c4), 6) AS s_ucl
FROM k
"""


@_q("control_chart_limits", _cc_oracle())
def q_control_chart_limits(spark, sf):
    """X-bar/S Shewhart limits over per-order quantity subgroups
    (stats.control_chart_limits): c4-unbiased sigma from the mean
    subgroup size, compile-time constant table shared with the
    oracle."""
    from padua_spark.operators.stats import control_chart_limits

    li = _t(spark, sf, "lineitem")
    return control_chart_limits(li, "l_orderkey", "l_quantity")


# --- ext: ROC curve table -------------------------------------------------------


_ROC_POINTS_ORACLE = """
WITH base AS (
  SELECT CAST(floor(value) AS DOUBLE) / 512.0 AS s,
    CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS y
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL AND value >= 0
),
per AS (
  SELECT s AS v, CAST(sum(y) AS BIGINT) AS p,
    CAST(sum(1 - y) AS BIGINT) AS g
  FROM base GROUP BY 1
),
run AS (
  SELECT v, p, g,
    sum(p) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS prun,
    sum(g) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS grun,
    sum(p) OVER () AS ptot, sum(g) OVER () AS gtot
  FROM per
),
st AS (
  SELECT v, CAST(ptot - prun AS BIGINT) AS p_gt,
    CAST(gtot - grun AS BIGINT) AS g_gt,
    p, g, CAST(ptot AS BIGINT) AS np, CAST(gtot AS BIGINT) AS ng
  FROM run
),
tot AS (
  SELECT sum(CAST(g AS HUGEINT)
      * (2 * CAST(p_gt AS HUGEINT) + CAST(p AS HUGEINT))) AS ctot,
    CAST(max(np) AS BIGINT) AS npt, CAST(max(ng) AS BIGINT) AS ngt
  FROM st
)
SELECT st.v AS threshold, st.p_gt AS n_pos_gt, st.g_gt AS n_neg_gt,
  round(CAST(st.p_gt AS DOUBLE) / st.np, 6) AS tpr,
  round(CAST(st.g_gt AS DOUBLE) / st.ng, 6) AS fpr,
  round(CASE WHEN tot.npt > 0 AND tot.ngt > 0
    THEN CAST(tot.ctot AS DOUBLE)
      / (2.0 * CAST(tot.npt AS DOUBLE) * CAST(tot.ngt AS DOUBLE))
    END, 6) AS auc
FROM st, tot
"""


@_q("roc_points", _ROC_POINTS_ORACLE)
def q_roc_points(spark, sf):
    """Full ROC curve table of the dyadic pseudo-probability vs
    engagement labels (stats.roc_points): one stepped pass, exact
    integer trapezoid AUC repeated per row."""
    from padua_spark.operators.stats import roc_points

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull() & (F.col("value") >= 0)
    ).select(
        (F.floor(F.col("value")).cast("double") / 512.0).alias("s"),
        F.col("event_type").isin("click", "view")
        .cast("int").alias("y"),
    )
    return roc_points(e, "s", "y")


# --- ext: windowed circular stats (streaming front half) ------------------------


_WINDOWED_CIRC_ORACLE = """
WITH base AS (
  SELECT (epoch_us(ts) // 86400000000) * 86400 AS ws,
    2.0 * pi()
      * (CAST(epoch_us(ts) % 86400000000 AS DOUBLE) / 86400000000.0)
      AS th
  FROM events WHERE ts IS NOT NULL
),
agg AS (
  SELECT ws, CAST(count(*) AS BIGINT) AS n,
    sum(cos(th)) AS c, sum(sin(th)) AS s
  FROM base GROUP BY 1
),
st AS (
  SELECT ws, n, c, s, sqrt(c * c + s * s) / n AS rbar FROM agg
),
z AS (SELECT *, n * rbar * rbar AS zz FROM st)
SELECT ws AS window_start_epoch, n,
  round(CASE WHEN n > 0 THEN atan2(s, c) END, 6) AS mean_direction,
  round(rbar, 6) AS r_bar,
  round(1.0 - rbar, 6) AS circ_variance,
  round(zz, 6) AS rayleigh_z,
  round(CASE WHEN n > 0 THEN greatest(0.0, least(
    exp(-zz) * (1.0 + (2.0 * zz - zz * zz) / (4.0 * n)
      - (24.0 * zz - 132.0 * zz * zz + 76.0 * zz * zz * zz
         - 9.0 * zz * zz * zz * zz) / (288.0 * n * n)), 1.0)) END, 6)
    AS p_value
FROM z
"""


@_q("windowed_circular_stats", _WINDOWED_CIRC_ORACLE)
def q_windowed_circular_stats(spark, sf):
    """Per-day circular stats + Rayleigh test of event time-of-day
    phases (streaming.windowed_circular_stats): one stateful
    three-sum aggregation per window; stream==batch parity is
    pytest-gated, this entry gates the batch twin."""
    from padua_spark.streaming import windowed_circular_stats
    from padua_spark.streaming.windows import epoch_us_col

    e = _t(spark, sf, "events").where(F.col("ts").isNotNull())
    us = epoch_us_col(e, "ts")
    withts = e.select(
        F.timestamp_micros(us).alias("_et"),
        (
            2.0 * 3.141592653589793
            * ((us % 86400000000).cast("double") / 86400000000.0)
        ).alias("theta"),
    )
    out = windowed_circular_stats(
        withts, F.col("_et"), F.col("theta"),
        window_duration="1 day",
    )
    return out.select(
        F.col("window_start").cast("long").alias(
            "window_start_epoch"
        ),
        "n", "mean_direction", "r_bar", "circ_variance",
        "rayleigh_z", "p_value",
    )


# --- ext: Value-at-Risk + Expected Shortfall -----------------------------------


_VAR_ORACLE = """
WITH per AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS v,
    CAST(count(*) AS BIGINT) AS c
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
),
run AS (
  SELECT v, c, v * c AS vc,
    sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS crun,
    sum(v * c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS vcrun,
    sum(c) OVER () AS ctot, sum(v * c) OVER () AS vtot
  FROM per
),
hit AS (
  SELECT * FROM run
  WHERE crun >= ceil(0.95 * ctot)
  ORDER BY v LIMIT 1
)
SELECT CAST(run0.ctot AS BIGINT) AS n,
  CAST(0.95 AS DOUBLE) AS alpha,
  round(hit.v, 6) AS var,
  CAST(run0.ctot - hit.crun AS BIGINT) AS n_exceed,
  round(CASE WHEN run0.ctot - hit.crun > 0
    THEN (run0.vtot - hit.vcrun)
      / CAST(run0.ctot - hit.crun AS DOUBLE)
    ELSE hit.v END, 6) AS expected_shortfall
FROM (SELECT max(ctot) AS ctot, max(vtot) AS vtot FROM run) run0,
  hit
"""


@_q("value_at_risk", _VAR_ORACLE)
def q_value_at_risk(spark, sf):
    """Historical VaR(95) + Expected Shortfall of the extended-price
    distribution (stats.value_at_risk): one stepped pass carrying
    counts and value sums, the tail mean off the same frame."""
    from padua_spark.operators.stats import value_at_risk

    li = _t(spark, sf, "lineitem")
    return value_at_risk(li, "l_extendedprice", alpha=0.95)


# --- ext: burstiness of event streams ------------------------------------------


_BURSTINESS_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id
  FROM events WHERE ts IS NOT NULL
),
g AS (
  SELECT user_id,
    CAST((tu // 1000) - lag(tu // 1000) OVER w AS HUGEINT) AS gap
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
),
agg0 AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
    sum(gap) AS s1, sum(gap * gap) AS s2
  FROM g WHERE gap IS NOT NULL GROUP BY 1
),
agg AS (
  SELECT user_id, n_gaps,
    CAST(s1 AS DOUBLE) / n_gaps AS m,
    CASE WHEN n_gaps >= 2 THEN sqrt(
      greatest(0.0, CAST(n_gaps * s2 - s1 * s1 AS DOUBLE))
      / (CAST(n_gaps AS DOUBLE) * (n_gaps - 1.0))) END AS s
  FROM agg0
)
SELECT user_id, n_gaps,
  round(m, 6) AS mean_gap, round(s, 6) AS sd_gap,
  round(CASE WHEN n_gaps >= 2 AND m + s > 0
    THEN (s - m) / (s + m) END, 6) AS burstiness,
  round(CASE WHEN n_gaps >= 2 AND m > 0 THEN s / m END, 6) AS cv
FROM agg
"""


@_q("burstiness", _BURSTINESS_ORACLE)
def q_burstiness(spark, sf):
    """Goh-Barabasi burstiness of each user's inter-event times in
    integer milliseconds (temporal.burstiness, exact-integer
    moments): one lag window per key, one aggregation."""
    from padua_spark.operators.temporal import burstiness
    from padua_spark.streaming.windows import epoch_us_col

    e = _t(spark, sf, "events").where(F.col("ts").isNotNull())
    us = epoch_us_col(e, "ts")
    # gaps measured in integer MILLISECONDS: exact-integer moments
    # stay within the magnitude where decimal->double casts agree
    # across engines to well under the 6dp rounding granularity
    base = e.select(
        "user_id",
        us.alias("_tu"),
        F.floor(us / F.lit(1000)).cast("bigint").alias("_tms"),
        "event_id",
    )
    return burstiness(
        base, ["user_id"], ["_tu", "event_id"], "_tms",
        exact_integer_gaps=True,
    )


# --- ext round 11: coverage / diversity / stationarity wave -----------------


_YOUDEN_ORACLE = """
WITH e AS (
  SELECT CAST(floor(value) AS DOUBLE) / 512.0 AS s,
    CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS y
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL AND value >= 0
),
per AS (
  SELECT s AS v, CAST(sum(y) AS BIGINT) AS p,
    CAST(sum(1 - y) AS BIGINT) AS g
  FROM e GROUP BY 1
),
st AS (
  SELECT v, p, g,
    sum(p) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS prun,
    sum(g) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS grun,
    sum(p) OVER () AS np, sum(g) OVER () AS ng
  FROM per
),
j AS (
  SELECT v, np, ng, np - prun AS pgt, ng - grun AS ggt,
    CAST(np - prun AS HUGEINT) * CAST(ng AS HUGEINT)
      - CAST(ng - grun AS HUGEINT) * CAST(np AS HUGEINT) AS jn
  FROM st WHERE np > 0 AND ng > 0
),
m AS (SELECT max(jn) AS jmax FROM j)
SELECT CAST(max(np) AS BIGINT) AS n_pos,
  CAST(max(ng) AS BIGINT) AS n_neg,
  min(v) AS threshold,
  CAST(arg_min(pgt, v) AS BIGINT) AS n_pos_gt,
  CAST(arg_min(ggt, v) AS BIGINT) AS n_neg_gt,
  round(CAST(arg_min(pgt, v) AS DOUBLE) / CAST(max(np) AS DOUBLE), 6)
    AS tpr,
  round(CAST(arg_min(ggt, v) AS DOUBLE) / CAST(max(ng) AS DOUBLE), 6)
    AS fpr,
  round(CAST(arg_min(pgt, v) AS DOUBLE) / CAST(max(np) AS DOUBLE)
    - CAST(arg_min(ggt, v) AS DOUBLE) / CAST(max(ng) AS DOUBLE), 6)
    AS youden_j
FROM j, m WHERE j.jn = m.jmax
"""


@_q("youden_threshold", _YOUDEN_ORACLE)
def q_youden_threshold(spark, sf):
    """Optimal Youden-J operating point of the dyadic
    pseudo-probability vs engagement labels (stats.youden_threshold):
    exact-integer argmax over the stepped ROC frame, lowest-threshold
    tiebreak."""
    from padua_spark.operators.stats import youden_threshold

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull() & (F.col("value") >= 0)
    ).select(
        (F.floor(F.col("value")).cast("double") / 512.0).alias("s"),
        F.col("event_type").isin("click", "view")
        .cast("int").alias("y"),
    )
    return youden_threshold(e, "s", "y")


_KPSS_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS grp, CAST(l_quantity AS DOUBLE) AS v,
    sum(CAST(l_quantity AS DOUBLE)) OVER w AS c,
    CAST(row_number() OVER w AS DOUBLE) AS t
  FROM lineitem WHERE l_quantity IS NOT NULL
  WINDOW w AS (PARTITION BY l_returnflag
               ORDER BY l_shipdate, l_orderkey, l_linenumber,
                        l_quantity
               ROWS UNBOUNDED PRECEDING)
),
a AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
    sum(v) AS sx, sum(v * v) AS sxx,
    sum(c * c) AS scc, sum(t * c) AS stc, sum(t * t) AS stt
  FROM base GROUP BY 1
),
s AS (
  SELECT grp, n, CAST(n AS DOUBLE) AS nd, sx / CAST(n AS DOUBLE) AS mu,
    (sxx - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE))
      * (sx / CAST(n AS DOUBLE))) / CAST(n AS DOUBLE) AS var0,
    scc - 2.0 * (sx / CAST(n AS DOUBLE)) * stc
      + (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)) * stt
      AS ss
  FROM a
)
SELECT grp AS l_returnflag, n,
  round(CASE WHEN n >= 2 AND var0 > 0
    THEN ss / (nd * nd * var0) END, 6) AS kpss_stat,
  CAST(0.347 AS DOUBLE) AS crit_10pct,
  CAST(0.463 AS DOUBLE) AS crit_5pct,
  CAST(0.739 AS DOUBLE) AS crit_1pct,
  CASE WHEN n >= 2 AND var0 > 0
    THEN ss / (nd * nd * var0) > 0.463 END AS reject_5pct
FROM s
"""


@_q("kpss_level", _KPSS_ORACLE)
def q_kpss_level(spark, sf):
    """KPSS level-stationarity statistic of quantities per return
    flag in shipdate order (temporal.kpss_level): one ordered window
    pass (running sum + row index, group-partitioned) and one
    aggregation via the S_t = C_t - t*mean algebra."""
    from padua_spark.operators.temporal import kpss_level

    li = _t(spark, sf, "lineitem")
    return kpss_level(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity",
    )


_GOOD_TURING_ORACLE = """
WITH toks AS (
  SELECT t AS tok, CAST(count(*) AS BIGINT) AS r
  FROM (
    SELECT unnest(list_filter(
      string_split_regex(lower(trim(text)), '\\s+'),
      x -> x <> '')) AS t
    FROM documents WHERE text IS NOT NULL
  ) GROUP BY 1
),
fof AS (
  SELECT r, CAST(count(*) AS BIGINT) AS n_types
  FROM toks GROUP BY 1
),
tot AS (
  SELECT CAST(sum(r * n_types) AS BIGINT) AS n_tok,
    CAST(sum(n_types) AS BIGINT) AS n_typ,
    CAST(sum(CASE WHEN r = 1 THEN n_types END) AS BIGINT) AS n1
  FROM fof
)
SELECT f.r, f.n_types,
  round((CAST(f.r AS DOUBLE) + 1.0) * CAST(nx.n_types AS DOUBLE)
    / CAST(f.n_types AS DOUBLE), 6) AS r_star,
  round((CAST(f.r AS DOUBLE) + 1.0) * CAST(nx.n_types AS DOUBLE)
    / CAST(f.n_types AS DOUBLE) / CAST(t.n_tok AS DOUBLE), 9)
    AS p_smoothed,
  t.n_tok AS total_tokens, t.n_typ AS total_types,
  round(CAST(coalesce(t.n1, 0) AS DOUBLE)
    / CAST(t.n_tok AS DOUBLE), 9) AS p_unseen
FROM fof f
LEFT JOIN fof nx ON nx.r = f.r + 1
CROSS JOIN tot t
WHERE f.r <= 10
"""


@_q("good_turing", _GOOD_TURING_ORACLE)
def q_good_turing(spark, sf):
    """Good-Turing frequency-of-frequencies table over the documents
    corpus (text.good_turing): token counts, count-of-counts, the
    (r+1)N_{r+1}/N_r discounted counts and the unseen mass N1/N."""
    from padua_spark.extensions.text import good_turing

    d = _t(spark, sf, "documents")
    return good_turing(d, "doc_id", "text", max_r=10)


_DICT_COVERAGE_ORACLE = """
WITH tok AS (
  SELECT source,
    unnest(list_filter(
      string_split_regex(lower(trim(text)), '\\s+'),
      x -> x <> '')) AS t
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
per AS (
  SELECT source, t AS tok, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, CAST(sum(c) AS BIGINT) AS tc FROM per GROUP BY 1
  ) WHERE tc >= 20
),
j AS (
  SELECT p.source, p.tok, p.c,
    CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
  FROM per p LEFT JOIN vocab v ON v.tok = p.tok
)
SELECT source,
  CAST(sum(c) AS BIGINT) AS n_tokens,
  CAST(sum(CASE WHEN oov = 1 THEN c ELSE 0 END) AS BIGINT) AS n_oov,
  round(CAST(sum(CASE WHEN oov = 1 THEN c ELSE 0 END) AS DOUBLE)
    / CAST(sum(c) AS DOUBLE), 6) AS oov_rate,
  CAST(count(*) AS BIGINT) AS n_types,
  CAST(sum(oov) AS BIGINT) AS n_oov_types,
  round(CAST(sum(oov) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
    AS oov_type_rate
FROM j GROUP BY 1
"""


@_q("dictionary_coverage", _DICT_COVERAGE_ORACLE)
def q_dictionary_coverage(spark, sf):
    """Per-source OOV profile of the documents corpus against a
    frequency-threshold vocabulary (count >= 20, deterministic — no
    top-k tie ambiguity) built from the same corpus
    (text.dictionary_coverage): token+type OOV rates, no distinct
    aggregates."""
    from padua_spark.extensions.text import dictionary_coverage, tokens

    d = _t(spark, sf, "documents").where(
        F.col("source").isNotNull()
    )
    per_tok = (
        d.where(F.col("text").isNotNull())
        .select(F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("_tc"))
        .where(F.col("_tc") >= 20)
        .select("token")
    )
    return dictionary_coverage(
        d, "text", per_tok, "token", group_cols=["source"]
    )


_CAT_DIVERSITY_ORACLE = """
WITH cells AS (
  SELECT source, lang AS cat, CAST(count(*) AS BIGINT) AS c
  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY 1, 2
),
tot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n,
    CAST(count(*) AS BIGINT) AS k
  FROM cells GROUP BY 1
),
j AS (
  SELECT c.source, c.c, t.n, t.k,
    CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE) AS p
  FROM cells c JOIN tot t USING (source)
)
SELECT source, CAST(max(n) AS BIGINT) AS n,
  CAST(max(k) AS BIGINT) AS k_classes,
  round(sum(-p * ln(p)), 6) AS shannon_entropy,
  round(sum(p * p), 6) AS simpson,
  round(1.0 / sum(p * p), 6) AS inv_simpson,
  round(CASE WHEN max(k) >= 2
    THEN sum(-p * ln(p)) / ln(CAST(max(k) AS DOUBLE)) END, 6)
    AS evenness
FROM j GROUP BY 1
"""


@_q("category_diversity", _CAT_DIVERSITY_ORACLE)
def q_category_diversity(spark, sf):
    """Shannon/Simpson diversity of document languages per source
    (quality.category_diversity): cell counts, one roll-up, effective
    class count and Pielou evenness."""
    from padua_spark.extensions.quality import category_diversity

    d = _t(spark, sf, "documents").where(
        F.col("source").isNotNull()
    )
    return category_diversity(d, "lang", group_cols=["source"])


_PETTITT_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS grp, CAST(l_quantity AS DOUBLE) AS v,
    l_shipdate, l_orderkey, l_linenumber
  FROM lineitem WHERE l_quantity IS NOT NULL
),
per AS (
  SELECT grp, v, CAST(count(*) AS BIGINT) AS c
  FROM base GROUP BY 1, 2
),
rk AS (
  SELECT grp, v,
    2 * (sum(c) OVER (PARTITION BY grp ORDER BY v
      ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS r2,
    sum(c) OVER (PARTITION BY grp) AS n
  FROM per
),
st AS (
  SELECT b.grp, r.n,
    CAST(row_number() OVER w AS BIGINT) AS t,
    sum(CAST(r.r2 - (r.n + 1) AS HUGEINT)) OVER (
      PARTITION BY b.grp
      ORDER BY b.l_shipdate, b.l_orderkey, b.l_linenumber, b.v
      ROWS UNBOUNDED PRECEDING) AS u
  FROM base b JOIN rk r ON r.grp = b.grp AND r.v = b.v
  WINDOW w AS (PARTITION BY b.grp
    ORDER BY b.l_shipdate, b.l_orderkey, b.l_linenumber, b.v)
),
mx AS (
  SELECT grp, max(abs(u)) AS k FROM st GROUP BY 1
),
best AS (
  SELECT s.grp, CAST(max(s.n) AS BIGINT) AS n,
    CAST(m.k AS BIGINT) AS k_stat,
    min(s.t) AS change_index,
    CAST(arg_min(s.u, s.t) AS BIGINT) AS u_at_change
  FROM st s JOIN mx m ON m.grp = s.grp AND abs(s.u) = m.k
  GROUP BY 1, 3
)
SELECT grp AS l_returnflag, n, k_stat, change_index, u_at_change,
  round(least(1.0, 2.0 * exp(-6.0 * CAST(k_stat AS DOUBLE)
    * CAST(k_stat AS DOUBLE)
    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
       + CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))), 6) AS p_value
FROM best
"""


@_q("pettitt_test", _PETTITT_ORACLE)
def q_pettitt_test(spark, sf):
    """Pettitt rank changepoint of quantities per return flag in
    shipdate order (temporal.pettitt_test): midranks off the
    aggregated value-domain frame, exact-integer U_t cumsum,
    earliest-index max-|U| roll-up."""
    from padua_spark.operators.temporal import pettitt_test

    li = _t(spark, sf, "lineitem")
    return pettitt_test(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity",
    )


_LORENZ_ORACLE = """
WITH per AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS v,
    CAST(count(*) AS BIGINT) AS c,
    sum(CAST(l_extendedprice AS DOUBLE)) AS m
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_extendedprice >= 0
  GROUP BY 1
),
st AS (
  SELECT v, c, m,
    sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS crun,
    sum(m) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS mrun,
    sum(c) OVER () AS ctot, sum(m) OVER () AS mtot
  FROM per
),
staged AS (
  SELECT v AS value, CAST(crun AS BIGINT) AS n_le,
    CAST(crun AS DOUBLE) / CAST(ctot AS DOUBLE) AS p,
    mrun / mtot AS l,
    (CAST(crun AS DOUBLE) / CAST(ctot AS DOUBLE)
     - CAST(crun - c AS DOUBLE) / CAST(ctot AS DOUBLE))
    * (mrun / mtot + (mrun - m) / mtot) AS trap
  FROM st
),
g AS (SELECT sum(trap) AS ts FROM staged)
SELECT value, n_le, round(p, 9) AS pop_share,
  round(l, 9) AS value_share_cum,
  round(1.0 - g.ts, 6) AS gini
FROM staged, g
"""


@_q("lorenz_curve", _LORENZ_ORACLE)
def q_lorenz_curve(spark, sf):
    """Lorenz curve table of lineitem extended prices with the
    trapezoid Gini repeated per row (quality.lorenz_curve): counts
    and value mass through one stepped pass, 1-row Gini broadcast
    back."""
    from padua_spark.extensions.quality import lorenz_curve

    li = _t(spark, sf, "lineitem")
    return lorenz_curve(li, "l_extendedprice")


_PINBALL_ORACLE = """
WITH base AS (
  SELECT event_type, CAST(round(value * 100) AS DOUBLE) AS a,
    lag(CAST(round(value * 100) AS DOUBLE)) OVER (
      PARTITION BY user_id
      ORDER BY epoch_us(ts), event_id) AS l1
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    AND event_type IS NOT NULL
),
f AS (
  SELECT event_type, a, l1 * 0.5 AS f25, l1 AS f50, l1 * 2.0 AS f75
  FROM base
),
u AS (
  SELECT event_type, CAST(0.25 AS DOUBLE) AS quantile, a, f25 AS fc
  FROM f
  UNION ALL
  SELECT event_type, CAST(0.5 AS DOUBLE), a, f50 FROM f
  UNION ALL
  SELECT event_type, CAST(0.75 AS DOUBLE), a, f75 FROM f
)
SELECT event_type, quantile,
  CAST(count(CASE WHEN a IS NOT NULL AND fc IS NOT NULL THEN 1 END)
    AS BIGINT) AS n,
  floor(sum(CASE WHEN a IS NOT NULL AND fc IS NOT NULL THEN
      CASE WHEN a >= fc THEN quantile * (a - fc)
           ELSE (1.0 - quantile) * (fc - a) END END)
    / CAST(count(CASE WHEN a IS NOT NULL AND fc IS NOT NULL
      THEN 1 END) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS pinball,
  floor(CAST(sum(CASE WHEN a IS NOT NULL AND fc IS NOT NULL
      AND a <= fc THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(CASE WHEN a IS NOT NULL AND fc IS NOT NULL
      THEN 1 END) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS coverage
FROM u GROUP BY 1, 2
"""


@_q("pinball_loss", _PINBALL_ORACLE)
def q_pinball_loss(spark, sf):
    """Pinball loss + coverage of a lag-based quantile forecast trio
    per event type (temporal.pinball_loss): one lag window per user,
    ONE aggregation for all three levels, k-branch pivot union over
    the persisted per-group row."""
    from pyspark.sql import Window

    from padua_spark.operators.temporal import pinball_loss
    from padua_spark.streaming.windows import epoch_us_col

    e = _t(spark, sf, "events").where(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy(
        epoch_us_col(e, "ts"), F.col("event_id")
    )
    # exact integer cents + dyadic quantiles/forecast factors: every
    # pinball term is an exact dyadic double, so the per-group sums
    # are order-independent across engines (the micro-unit rule)
    cents = F.round(F.col("value") * 100).cast("double")
    l1 = F.lag(cents).over(w)
    base = e.select(
        "event_type",
        cents.alias("actual"),
        (l1 * 0.5).alias("f25"),
        l1.alias("f50"),
        (l1 * 2.0).alias("f75"),
    )
    return pinball_loss(
        base, ["event_type"], "actual",
        {0.25: "f25", 0.5: "f50", 0.75: "f75"},
    )


_META_ORACLE = """
WITH RECURSIVE studies AS (
  SELECT event_type, user_id % 17 AS sid,
    avg(CAST(value AS DOUBLE)) AS eff,
    stddev_samp(CAST(value AS DOUBLE))
      / sqrt(CAST(count(*) AS DOUBLE)) AS se
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
  HAVING count(*) >= 2 AND stddev_samp(CAST(value AS DOUBLE)) > 0
),
first AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS k,
    sum(1.0 / (se * se)) AS sw,
    sum(eff / (se * se)) AS swt,
    sum(eff * eff / (se * se)) AS swt2,
    sum(1.0 / (se * se * se * se)) AS sw2,
    sum(1.0 / se) AS sx, sum(eff / se) AS sy,
    sum(1.0 / (se * se)) AS sxx2,
    sum(eff / (se * se)) AS sxy2,
    sum(eff * eff / (se * se)) AS syy2
  FROM studies GROUP BY 1
),
derived AS (
  SELECT *, CAST(k AS DOUBLE) AS kd,
    swt / sw AS tf,
    swt2 - swt * swt / sw AS q,
    sw - sw2 / sw AS c
  FROM first
),
tau AS (
  SELECT *, CASE WHEN k >= 2 AND c > 0
    THEN greatest(0.0, (q - (kd - 1.0)) / c) END AS tau2
  FROM derived
),
second AS (
  SELECT s.event_type,
    sum(1.0 / (s.se * s.se + coalesce(t.tau2, 0.0))) AS sws,
    sum(s.eff / (s.se * s.se + coalesce(t.tau2, 0.0))) AS swst
  FROM studies s JOIN tau t USING (event_type) GROUP BY 1
),
egger AS (
  SELECT t.*,
    (t.kd * t.sxy2 - t.sx * t.sy)
      / (t.kd * t.sxx2 - t.sx * t.sx) AS b1
  FROM tau t
),
egger2 AS (
  SELECT *, (sy - b1 * sx) / kd AS b0,
    kd * sxx2 - sx * sx AS den
  FROM egger
),
egger3 AS (
  SELECT *,
    CASE WHEN k >= 3 THEN greatest(0.0,
      (syy2 - b0 * sy - b1 * sxy2) / (kd - 2.0)) END AS sig2
  FROM egger2
),
egger4 AS (
  SELECT *, sqrt(sig2 * sxx2 / den) AS seb0,
    CASE WHEN k >= 3 AND den > 0
      AND sqrt(sig2 * sxx2 / den) > 0
      THEN b0 / sqrt(sig2 * sxx2 / den) END AS et
  FROM egger3
),
inp AS (
  SELECT event_type AS key,
    CAST((kd - 2.0) / ((kd - 2.0) + et * et) AS DOUBLE) AS x,
    CAST((kd - 2.0) / 2.0 AS DOUBLE) AS a,
    CAST(0.5 AS DOUBLE) AS b
  FROM egger4 WHERE et IS NOT NULL
),
{BETAINC}
SELECT e.event_type, e.k,
  round(e.tf, 6) AS theta_fixed,
  round(1.0 / sqrt(e.sw), 6) AS se_fixed,
  round(CASE WHEN e.k >= 2 THEN e.q END, 6) AS q,
  round(CASE WHEN e.k >= 2 AND e.q > 0
    THEN greatest(0.0, (e.q - (e.kd - 1.0)) / e.q) END, 6) AS i2,
  round(e.tau2, 6) AS tau2,
  round(CASE WHEN e.k >= 2 THEN s.swst / s.sws END, 6)
    AS theta_random,
  round(CASE WHEN e.k >= 2 THEN 1.0 / sqrt(s.sws) END, 6)
    AS se_random,
  round(CASE WHEN e.k >= 3 THEN e.b0 END, 6) AS egger_intercept,
  round(e.et, 6) AS egger_t,
  round(CASE WHEN e.et IS NOT NULL THEN pv.p END, 6) AS egger_p
FROM egger4 e
JOIN second s USING (event_type)
LEFT JOIN pv ON pv.key = e.event_type
"""


@_q("meta_analysis", _META_ORACLE.replace("{BETAINC}", _betainc_chain_sql()))
def q_meta_analysis(spark, sf):
    """Fixed/DerSimonian-Laird random-effects meta-analysis of
    17 user-bucket 'studies' per event type (stats.meta_analysis):
    inverse-variance pooling, Q/I-squared/tau-squared, Egger
    small-study regression with the shared t SF."""
    from padua_spark.operators.stats import meta_analysis

    e = _t(spark, sf, "events").where(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    studies = (
        e.groupBy("event_type", (F.col("user_id") % 17).alias("sid"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.avg(F.col("value").cast("double")).alias("eff"),
            (
                F.stddev_samp(F.col("value").cast("double"))
                / F.sqrt(F.count(F.lit(1)).cast("double"))
            ).alias("se"),
            F.stddev_samp(F.col("value").cast("double")).alias("_sd"),
        )
        .where((F.col("_n") >= 2) & (F.col("_sd") > 0))
    )
    return meta_analysis(
        studies, "eff", "se", group_cols=["event_type"]
    )


_ANCOVA_ORACLE = """
WITH RECURSIVE per AS (
  SELECT l_returnflag AS g, CAST(count(*) AS BIGINT) AS n,
    sum(CAST(l_quantity AS DOUBLE)) AS sx,
    sum(CAST(l_extendedprice AS DOUBLE) / 100.0) AS sy,
    sum(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE))
      AS sxx,
    sum((CAST(l_extendedprice AS DOUBLE) / 100.0)
      * (CAST(l_extendedprice AS DOUBLE) / 100.0)) AS syy,
    sum(CAST(l_quantity AS DOUBLE)
      * (CAST(l_extendedprice AS DOUBLE) / 100.0)) AS sxy
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_returnflag IS NOT NULL
  GROUP BY 1
),
agg AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt,
    CAST(count(*) AS BIGINT) AS k,
    sum(sxx - sx * sx / CAST(n AS DOUBLE)) AS sxxw,
    sum(syy - sy * sy / CAST(n AS DOUBLE)) AS syyw,
    sum(sxy - sx * sy / CAST(n AS DOUBLE)) AS sxyw,
    sum(sx) AS sxt, sum(sy) AS syt,
    sum(sxx) AS sxxt, sum(syy) AS syyt, sum(sxy) AS sxyt
  FROM per
),
d AS (
  SELECT *, CAST(nt AS DOUBLE) AS ntd, CAST(k AS DOUBLE) AS kd,
    sxxt - sxt * sxt / CAST(nt AS DOUBLE) AS sxx_t,
    syyt - syt * syt / CAST(nt AS DOUBLE) AS syy_t,
    sxyt - sxt * syt / CAST(nt AS DOUBLE) AS sxy_t
  FROM agg
),
f AS (
  SELECT *,
    CASE WHEN sxxw > 0 THEN syyw - sxyw * sxyw / sxxw END AS ssef,
    CASE WHEN sxx_t > 0 THEN syy_t - sxy_t * sxy_t / sxx_t
      END AS sser,
    kd - 1.0 AS df1, ntd - kd - 1.0 AS df2
  FROM d
),
fs AS (
  SELECT *,
    CASE WHEN k >= 2 AND df2 > 0 AND ssef > 0
      THEN ((sser - ssef) / df1) / (ssef / df2) END AS fstat
  FROM f
),
inp AS (
  SELECT 'k' AS key,
    CAST(df2 / (df2 + df1 * fstat) AS DOUBLE) AS x,
    CAST(df2 / 2.0 AS DOUBLE) AS a,
    CAST(df1 / 2.0 AS DOUBLE) AS b
  FROM fs WHERE fstat IS NOT NULL
),
{BETAINC}
SELECT fs.nt AS n, fs.k AS k_groups,
  round(CASE WHEN fs.sxxw > 0 THEN fs.sxyw / fs.sxxw END, 6)
    AS slope_common,
  round(fs.ssef, 2) AS sse_full,
  round(fs.sser, 2) AS sse_reduced,
  round(fs.fstat, 6) AS f_stat,
  CAST(fs.df1 AS INT) AS df1,
  CAST(fs.df2 AS BIGINT) AS df2,
  round(pv.p, 6) AS p_value
FROM fs LEFT JOIN pv ON pv.key = 'k'
"""


@_q("ancova_1cov", _ANCOVA_ORACLE.replace("{BETAINC}", _betainc_chain_sql()))
def q_ancova_1cov(spark, sf):
    """One-way ANCOVA of price (in hundreds) on return flag adjusting
    for quantity (stats.ancova_1cov): per-group raw sums, algebraic
    within/total centered cross sums, F p via the shared incomplete
    beta."""
    from padua_spark.operators.stats import ancova_1cov

    li = _t(spark, sf, "lineitem").where(
        F.col("l_returnflag").isNotNull()
    ).select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("x"),
        (F.col("l_extendedprice").cast("double") / 100.0).alias("y"),
    )
    return ancova_1cov(li, "l_returnflag", "x", "y")


_DF_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS grp, CAST(l_quantity AS DOUBLE) AS v,
    lag(CAST(l_quantity AS DOUBLE)) OVER (
      PARTITION BY l_returnflag
      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
    ) AS l
  FROM lineitem WHERE l_quantity IS NOT NULL
),
pairs AS (
  SELECT grp, l, v - l AS d FROM base WHERE l IS NOT NULL
),
a AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS m,
    sum(l) AS sl, sum(d) AS sd,
    sum(l * l) AS sll, sum(l * d) AS sld, sum(d * d) AS sdd
  FROM pairs GROUP BY 1
),
s AS (
  SELECT grp, m, CAST(m AS DOUBLE) AS md,
    CAST(m AS DOUBLE) * sll - sl * sl AS den,
    (CAST(m AS DOUBLE) * sld - sl * sd)
      / (CAST(m AS DOUBLE) * sll - sl * sl) AS beta,
    sl, sd, sld, sdd
  FROM a
),
t AS (
  SELECT grp, m, md, den, beta,
    (sd - beta * sl) / md AS alpha, sd, sld, sdd
  FROM s
),
u AS (
  SELECT grp, m, md, den, beta,
    greatest(0.0, (sdd - alpha * sd - beta * sld) / (md - 2.0))
      AS sig2
  FROM t
),
w AS (
  SELECT grp, m, md, den, beta,
    sqrt(sig2 * md / den) AS seb
  FROM u
)
SELECT grp AS l_returnflag,
  CAST(m + 1 AS BIGINT) AS n, m AS n_pairs,
  round(CASE WHEN m >= 3 AND den > 0 THEN beta END, 6) AS beta,
  round(CASE WHEN m >= 3 AND den > 0 AND seb > 0
    THEN beta / seb END, 6) AS df_stat,
  CAST(-3.43 AS DOUBLE) AS crit_1pct,
  CAST(-2.86 AS DOUBLE) AS crit_5pct,
  CAST(-2.57 AS DOUBLE) AS crit_10pct,
  CASE WHEN m >= 3 AND den > 0 AND seb > 0
    THEN beta / seb < -2.86 END AS reject_5pct
FROM w
"""


@_q("dickey_fuller", _DF_ORACLE)
def q_dickey_fuller(spark, sf):
    """Lag-0 Dickey-Fuller unit-root t per return flag in shipdate
    order (temporal.dickey_fuller): one group-partitioned lag window,
    one OLS-sum aggregation, closed-form slope/SE - the null-reversed
    partner to kpss_level."""
    from padua_spark.operators.temporal import dickey_fuller

    li = _t(spark, sf, "lineitem")
    return dickey_fuller(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity",
    )


_SMK_ORACLE = """
WITH base AS (
  SELECT l_returnflag AS grp,
    CAST(month(l_shipdate) AS INT) AS season,
    (epoch_us(l_shipdate) // 86400000000) * 100000000
      + l_orderkey * 10 + l_linenumber AS xk,
    CAST(l_quantity AS DOUBLE) AS y
  FROM lineitem
  WHERE l_shipdate IS NOT NULL AND l_quantity IS NOT NULL
    AND l_orderkey % 97 = 0
),
pairs AS (
  SELECT a.grp, a.season,
    CAST(sum(CASE WHEN b.y > a.y THEN 1
             WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM base a JOIN base b
    ON b.grp = a.grp AND b.season = a.season AND a.xk < b.xk
  GROUP BY 1, 2
),
counts AS (
  SELECT grp, season, CAST(count(*) AS BIGINT) AS n
  FROM base GROUP BY 1, 2
),
ties AS (
  SELECT grp, season,
    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie
  FROM (
    SELECT grp, season, y, CAST(count(*) AS BIGINT) AS t
    FROM base GROUP BY 1, 2, 3
  ) GROUP BY 1, 2
),
per AS (
  SELECT c.grp, c.season, c.n,
    coalesce(p.s, 0) AS s,
    (CAST(c.n AS DOUBLE) * (c.n - 1) * (2 * c.n + 5)
      - CAST(t.tie AS DOUBLE)) / 18.0 AS var_s
  FROM counts c
  LEFT JOIN pairs p ON p.grp = c.grp AND p.season = c.season
  JOIN ties t ON t.grp = c.grp AND t.season = c.season
),
agg AS (
  SELECT grp, CAST(sum(n) AS BIGINT) AS n_obs,
    CAST(count(*) AS BIGINT) AS n_seasons,
    CAST(sum(s) AS BIGINT) AS s_stat,
    sum(var_s) AS var_s
  FROM per GROUP BY 1
),
z AS (
  SELECT grp, n_obs, n_seasons, s_stat, var_s,
    CASE WHEN var_s > 0 THEN
      CASE WHEN s_stat > 0
        THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(var_s)
      WHEN s_stat < 0
        THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)
      ELSE 0.0 END END AS zv
  FROM agg
)
SELECT grp AS l_returnflag, n_obs, n_seasons, s_stat,
  round(var_s, 6) AS var_s, round(zv, 6) AS z,
  round(CASE WHEN zv IS NOT NULL THEN
    CASE WHEN abs(zv) / sqrt(2.0) > 26.0 THEN 0.0 ELSE
      exp(-(abs(zv) / sqrt(2.0)) * (abs(zv) / sqrt(2.0)))
      * (0.254829592 * (1.0 / (1.0 + 0.3275911 * abs(zv) / sqrt(2.0)))
       - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * abs(zv) / sqrt(2.0)), 2)
       + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * abs(zv) / sqrt(2.0)), 3)
       - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * abs(zv) / sqrt(2.0)), 4)
       + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * abs(zv) / sqrt(2.0)), 5))
    END END, 6) AS p_normal
FROM z
"""


@_q("seasonal_mann_kendall", _SMK_ORACLE)
def q_seasonal_mann_kendall(spark, sf):
    """Seasonal Mann-Kendall trend of a 1-in-97 lineitem sample per
    return flag, seasons = ship months (stats.seasonal_mann_kendall):
    per-season bounded pair joins, independent-seasons combination,
    continuity-corrected z."""
    from padua_spark.operators.stats import seasonal_mann_kendall
    from padua_spark.streaming.windows import epoch_us_col

    li = _t(spark, sf, "lineitem").where(
        (F.col("l_orderkey") % 97 == 0)
        & F.col("l_shipdate").isNotNull()
        & F.col("l_quantity").isNotNull()
    )
    base = li.select(
        "l_returnflag",
        F.month("l_shipdate").alias("season"),
        (
            F.floor(
                epoch_us_col(li, "l_shipdate") / F.lit(86400000000)
            ).cast("bigint") * 100000000
            + F.col("l_orderkey") * 10
            + F.col("l_linenumber")
        ).alias("xk"),
        F.col("l_quantity").cast("double").alias("y"),
    )
    return seasonal_mann_kendall(
        base, ["l_returnflag"], "season", "xk", "y"
    )


def _cox_stuart_oracle(max_support: int = 200_000) -> str:
    lp_i = _log_choose_sql("mc", "i") + " + mc * ln(0.5)"
    lp_k = _log_choose_sql("mc", "kc") + " + mc * ln(0.5)"
    return f"""
WITH base AS (
  SELECT l_returnflag AS grp, CAST(l_quantity AS DOUBLE) AS v,
    CAST(row_number() OVER (PARTITION BY l_returnflag
      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)
      AS BIGINT) AS t,
    CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
  FROM lineitem WHERE l_quantity IS NOT NULL
),
pairs AS (
  SELECT a.grp, a.n,
    CAST(sum(CASE WHEN b.v > a.v THEN 1 ELSE 0 END) AS BIGINT)
      AS n_pos,
    CAST(sum(CASE WHEN b.v < a.v THEN 1 ELSE 0 END) AS BIGINT)
      AS n_neg
  FROM base a
  JOIN base b ON b.grp = a.grp
    AND b.t = a.t + CAST(ceil(CAST(a.n AS DOUBLE) / 2.0) AS BIGINT)
  WHERE a.t <= CAST(floor(CAST(a.n AS DOUBLE) / 2.0) AS BIGINT)
  GROUP BY 1, 2
),
st AS (
  SELECT *, n_pos + n_neg AS m,
    n_pos + n_neg <= {int(max_support)} AS is_exact,
    CASE WHEN n_pos + n_neg <= {int(max_support)}
      THEN n_pos + n_neg ELSE CAST(0 AS BIGINT) END AS mc,
    CASE WHEN n_pos + n_neg <= {int(max_support)}
      THEN n_pos ELSE CAST(0 AS BIGINT) END AS kc
  FROM pairs
),
rows_i AS (
  SELECT st.*, unnest(generate_series(CAST(0 AS BIGINT), mc)) AS i
  FROM st
),
terms AS (
  SELECT grp, n, n_pos, n_neg, m, is_exact, mc, kc, i,
    ({lp_i}) AS lp, ({lp_k}) AS lpk
  FROM rows_i
),
pfold AS (
  SELECT grp, n, n_pos, n_neg, max(m) AS m,
    bool_and(is_exact) AS is_exact,
    sum(CASE WHEN lp <= lpk + 9.999999505838704e-08
        THEN exp(lp) ELSE 0.0 END ORDER BY i) AS pt
  FROM terms GROUP BY 1, 2, 3, 4
),
zt AS (
  SELECT *,
    greatest(0.0,
      abs(2.0 * CAST(n_pos AS DOUBLE) - CAST(m AS DOUBLE)) - 1.0)
      / sqrt(CAST(m AS DOUBLE)) AS z
  FROM pfold
),
e AS (
  SELECT *, z / sqrt(2.0) AS xx,
    1.0 / (1.0 + 0.3275911 * (z / sqrt(2.0))) AS t
  FROM zt
)
SELECT grp AS l_returnflag, n, m AS n_pairs, n_pos, n_neg,
  CASE WHEN is_exact THEN 'exact' ELSE 'normal' END AS method,
  round(CASE WHEN m <= 0 THEN NULL
             WHEN is_exact THEN least(pt, 1.0)
             ELSE least(
    (0.254829592 * t + -0.284496736 * t * t
     + 1.421413741 * t * t * t + -1.453152027 * t * t * t * t
     + 1.061405429 * t * t * t * t * t) * exp(-xx * xx), 1.0) END, 6)
    AS p_value
FROM e
"""


@_q("cox_stuart_trend", _cox_stuart_oracle())
def q_cox_stuart_trend(spark, sf):
    """Cox-Stuart paired-halves trend test of quantities per return
    flag in shipdate order (temporal.cox_stuart_trend): one row_number
    window, one index self-join (n/2 pairs, no quadratic), exact
    binomial fold."""
    from padua_spark.operators.temporal import cox_stuart_trend

    li = _t(spark, sf, "lineitem")
    return cox_stuart_trend(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity",
    )


@_q("cox_stuart_normal", _cox_stuart_oracle(max_support=1_000))
def q_cox_stuart_normal(spark, sf):
    """The same Cox-Stuart test FORCED onto the continuity-corrected
    normal branch (max_support=1000 < the pair counts at every sf) -
    the gate that keeps the big-m regime oracle-checked, mirroring
    sign_test_normal."""
    from padua_spark.operators.temporal import cox_stuart_trend

    li = _t(spark, sf, "lineitem")
    return cox_stuart_trend(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity", max_support=1_000,
    )


_PACKING_ORACLE = """
WITH t AS (
  SELECT source, len(string_split_regex(trim(text), '\\s+'))
    AS tok
  FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
    AND source IS NOT NULL
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(tok) AS BIGINT) AS total_tokens,
  CAST(sum(CASE WHEN tok > 512 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_truncated,
  CAST(sum(greatest(tok - 512, 0)) AS BIGINT) AS tokens_truncated,
  CAST(sum(least(tok, 512)) AS BIGINT) AS tokens_kept,
  CAST(ceil(CAST(sum(least(tok, 512)) AS DOUBLE) / 512.0) AS BIGINT)
    AS seq_lower_bound,
  CAST(sum(512 - least(tok, 512)) AS BIGINT) AS padding_waste,
  round(CAST(sum(512 - least(tok, 512)) AS DOUBLE)
    / (CAST(count(*) AS DOUBLE) * 512.0), 6) AS padding_frac
FROM t GROUP BY 1
"""


@_q("packing_efficiency", _PACKING_ORACLE)
def q_packing_efficiency(spark, sf):
    """Sequence-packing budget profile of whitespace token counts per
    source at a 512-token context (sampling.packing_efficiency):
    exact integer one-pass aggregation - truncation loss, packing
    lower bound, one-doc-per-sequence padding waste."""
    from padua_spark.extensions.sampling import packing_efficiency
    from padua_spark.extensions.text import token_count

    d = _t(spark, sf, "documents").where(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
        & F.col("source").isNotNull()
    ).select(
        "source", token_count(F.col("text")).alias("tok")
    )
    return packing_efficiency(
        d, "tok", 512, group_cols=["source"]
    )


_MSPRT_ORACLE = """
WITH base AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g,
    CAST(value AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
),
agg AS (
  SELECT
    CAST(sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS na,
    CAST(sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
    sum(CASE WHEN g = 'a' THEN v ELSE 0.0 END) AS sa,
    sum(CASE WHEN g = 'b' THEN v ELSE 0.0 END) AS sb,
    sum(CASE WHEN g = 'a' THEN v * v ELSE 0.0 END) AS qa,
    sum(CASE WHEN g = 'b' THEN v * v ELSE 0.0 END) AS qb
  FROM base
),
d AS (
  SELECT na, nb, CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
    sa / CAST(na AS DOUBLE) AS ma, sb / CAST(nb AS DOUBLE) AS mb,
    qa - CAST(na AS DOUBLE) * (sa / CAST(na AS DOUBLE))
      * (sa / CAST(na AS DOUBLE)) AS ssa,
    qb - CAST(nb AS DOUBLE) * (sb / CAST(nb AS DOUBLE))
      * (sb / CAST(nb AS DOUBLE)) AS ssb
  FROM agg
),
s AS (
  SELECT na, nb, ma - mb AS diff,
    greatest(0.0, (ssa + ssb) / (nad + nbd - 2.0))
      * (1.0 / nad + 1.0 / nbd) AS vhat
  FROM d
),
l AS (
  SELECT na, nb, diff, vhat,
    CASE WHEN na >= 2 AND nb >= 2 AND vhat > 0 THEN
      sqrt(vhat / (vhat + 4.0))
      * exp(least(700.0, diff * diff * 4.0
        / (2.0 * vhat * (vhat + 4.0)))) END AS lam
  FROM s
)
SELECT na AS n_a, nb AS n_b, round(diff, 6) AS diff,
  round(vhat, 6) AS v_hat,
  round(least(lam, 1e12), 6) AS "lambda",
  round(least(1.0, 1.0 / lam), 6) AS p_always_valid
FROM l
"""


@_q("msprt_normal", _MSPRT_ORACLE)
def q_msprt_normal(spark, sf):
    """Always-valid mSPRT p for the user-parity value split with a
    N(0, 4) effect prior (stats.msprt_normal): one closed-form
    aggregation, plug-in pooled variance."""
    from padua_spark.operators.stats import msprt_normal

    e = _t(spark, sf, "events").where(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        F.when(F.col("user_id") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b")).alias("g"),
        F.col("value").cast("double").alias("v"),
    )
    return msprt_normal(e, "g", "v", "a", "b", tau=2.0)


def _gsea_oracle(n_perms: int = 19) -> str:
    M = 2_147_483_647
    A = 48_271
    h0 = f"(((id % {M}) + b * 1000003) % {M})"
    h1 = f"(({h0} * {h0}) % {M})"
    h2 = f"((({h1} * {A}) + {h0}) % {M})"
    h3 = f"(({h2} * {h2}) % {M})"
    return f"""
WITH base AS (
  SELECT p_partkey AS id, CAST(p_retailprice AS DOUBLE) AS s,
    abs(CAST(p_retailprice AS DOUBLE)) AS w,
    CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS h
  FROM part WHERE p_retailprice IS NOT NULL
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(h) AS BIGINT) AS nh
  FROM base
),
obs_tot AS (SELECT sum(w * h) AS sw FROM base),
stepped AS (
  SELECT row_number() OVER wo AS r,
    sum(w * h) OVER worun AS cw,
    CAST(sum(1 - h) OVER worun AS DOUBLE) AS cm
  FROM base
  WINDOW wo AS (ORDER BY s DESC, id ASC),
    worun AS (ORDER BY s DESC, id ASC ROWS UNBOUNDED PRECEDING)
),
dev AS (
  SELECT r,
    cw / (SELECT sw FROM obs_tot)
      - cm / CAST((SELECT n - nh FROM tot) AS DOUBLE) AS d
  FROM stepped
),
obs AS (
  SELECT max(abs(d)) AS k FROM dev
),
best AS (
  SELECT min(r) AS rank FROM dev, obs WHERE abs(dev.d) = obs.k
),
esv AS (
  SELECT dev.d AS es FROM dev, best WHERE dev.r = best.rank
),
perm AS (
  SELECT t.b, base.id, base.s, base.w,
    CASE WHEN {h3} <
      (2147483647 * (SELECT nh FROM tot)) // (SELECT n FROM tot)
      THEN 1 ELSE 0 END AS h
  FROM base, range(1, {n_perms + 1}) t(b)
),
ptot AS (
  SELECT b, sum(w * h) AS sw,
    CAST(sum(1 - h) AS DOUBLE) AS nm
  FROM perm GROUP BY 1
),
pstep AS (
  SELECT p.b, row_number() OVER wo AS r,
    sum(p.w * p.h) OVER worun AS cw,
    CAST(sum(1 - p.h) OVER worun AS DOUBLE) AS cm
  FROM perm p
  WINDOW wo AS (PARTITION BY p.b ORDER BY p.s DESC, p.id ASC),
    worun AS (PARTITION BY p.b ORDER BY p.s DESC, p.id ASC
              ROWS UNBOUNDED PRECEDING)
),
pes AS (
  SELECT ps.b,
    max(abs(CASE WHEN pt.sw > 0 AND pt.nm > 0
      THEN ps.cw / pt.sw - ps.cm / pt.nm END)) AS kb
  FROM pstep ps JOIN ptot pt ON pt.b = ps.b
  GROUP BY 1
),
summary AS (
  SELECT CAST(sum(CASE WHEN pes.kb >= o.k THEN 1 ELSE 0 END)
      AS BIGINT) AS ext,
    avg(pes.kb) AS mab
  FROM pes, obs o
)
SELECT (SELECT n FROM tot) AS n, (SELECT nh FROM tot) AS n_hit,
  round(e.es, 6) AS es,
  CAST(b.rank AS BIGINT) AS es_rank,
  round(CASE WHEN s.mab > 0 THEN e.es / s.mab END, 6) AS nes,
  round(CAST(s.ext + 1 AS DOUBLE) / {n_perms + 1}.0, 6) AS p_value,
  {n_perms} AS n_perms
FROM esv e, best b, summary s
"""


@_q("gsea_prerank", _gsea_oracle())
def q_gsea_prerank(spark, sf):
    """GSEA pre-ranked running-sum enrichment of PROMO parts in the
    retail-price ranking (stats.gsea_prerank): weighted P_hit vs
    P_miss deviation, earliest-rank max, 19 deterministic Lehmer-hash
    label re-randomizations for p/NES — the engine-native face of the
    reference's GO-enrichment domain (analysis.py:336-384)."""
    from padua_spark.operators.stats import gsea_prerank

    p = _t(spark, sf, "part").where(
        F.col("p_retailprice").isNotNull()
    ).select(
        F.col("p_partkey").alias("id"),
        F.col("p_retailprice").cast("double").alias("s"),
        (F.col("p_type") == "PROMO").cast("int").alias("h"),
    )
    return gsea_prerank(p, "id", "s", "h", n_perms=19)


_WINDOWED_PINBALL_ORACLE = """
WITH base AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600 AS ws,
    CAST(round(value * 100) AS DOUBLE) AS a,
    lag(CAST(round(value * 100) AS DOUBLE)) OVER (
      PARTITION BY user_id
      ORDER BY epoch_us(ts), event_id) AS l1
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
u AS (
  SELECT ws, CAST(0.5 AS DOUBLE) AS quantile, a, l1 AS fc FROM base
  UNION ALL
  SELECT ws, CAST(0.75 AS DOUBLE), a, l1 * 2.0 FROM base
)
SELECT ws AS window_start_epoch, quantile,
  CAST(count(CASE WHEN a IS NOT NULL AND fc IS NOT NULL THEN 1 END)
    AS BIGINT) AS n,
  floor(sum(CASE WHEN a IS NOT NULL AND fc IS NOT NULL THEN
      CASE WHEN a >= fc THEN quantile * (a - fc)
           ELSE (1.0 - quantile) * (fc - a) END END)
    / CAST(count(CASE WHEN a IS NOT NULL AND fc IS NOT NULL
      THEN 1 END) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS pinball,
  floor(CAST(sum(CASE WHEN a IS NOT NULL AND fc IS NOT NULL
      AND a <= fc THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(CASE WHEN a IS NOT NULL AND fc IS NOT NULL
      THEN 1 END) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS coverage
FROM u GROUP BY 1, 2
"""


@_q("windowed_pinball_loss", _WINDOWED_PINBALL_ORACLE)
def q_windowed_pinball_loss(spark, sf):
    """Per-hour pinball loss + coverage of a lag-based quantile
    forecast pair (streaming.windowed_pinball_loss): ONE stateful
    aggregation carrying both levels' bounded partials, compile-time
    union to per-level rows."""
    from pyspark.sql import Window

    from padua_spark.streaming import windowed_pinball_loss
    from padua_spark.streaming.windows import (
        epoch_us_col,
        event_time_col,
    )

    e = _t(spark, sf, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy(
        epoch_us_col(e, "ts"), F.col("event_id")
    )
    # exact integer CENTS + dyadic quantiles: every pinball term is
    # an exact dyadic double, so the per-window sums are
    # order-independent across engines (the committed micro-unit
    # rule; raw 2dp money summed as doubles flips value hashes)
    cents = F.round(F.col("value") * 100).cast("double")
    l1 = F.lag(cents).over(w)
    base = e.select(
        event_time_col(e, "ts").alias("_ts"),
        cents.alias("actual"),
        l1.alias("f50"),
        (l1 * 2.0).alias("f75"),
    )
    out = windowed_pinball_loss(
        base, F.col("_ts"), F.col("actual"),
        {0.5: F.col("f50"), 0.75: F.col("f75")},
        window_duration="1 hour",
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "quantile", "n", "pinball", "coverage",
    )


def _trunc_recall_oracle(dims=(8, 16, 32), k: int = 10) -> str:
    def topk(d):
        return f"""
  SELECT e.vec_id,
    list_dot_product(list_slice(CAST(e.embedding AS DOUBLE[]), 1, {d}),
                     list_slice(q.qv, 1, {d}))
    / (sqrt(list_dot_product(
         list_slice(CAST(e.embedding AS DOUBLE[]), 1, {d}),
         list_slice(CAST(e.embedding AS DOUBLE[]), 1, {d})))
       * sqrt(list_dot_product(list_slice(q.qv, 1, {d}),
                               list_slice(q.qv, 1, {d})))) AS cs
  FROM embeddings e, q
  ORDER BY cs DESC, e.vec_id LIMIT {k}"""

    full = f"""
  SELECT e.vec_id,
    list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                             CAST(e.embedding AS DOUBLE[])))
       * sqrt(list_dot_product(q.qv, q.qv))) AS cs
  FROM embeddings e, q
  ORDER BY cs DESC, e.vec_id LIMIT {k}"""
    branches = "\nUNION ALL\n".join(
        f"""SELECT {d} AS dim, {k} AS k,
  CAST(count(*) AS BIGINT) AS n_overlap,
  round(CAST(count(*) AS DOUBLE) / {k}.0, 6) AS recall
FROM (SELECT vec_id FROM ({topk(d)})) t{d}
JOIN full_tk USING (vec_id)"""
        for d in dims
    )
    return f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id = 0
),
full_tk AS (SELECT vec_id FROM ({full}))
{branches}
"""


@_q("dimension_truncation_recall", _trunc_recall_oracle())
def q_dimension_truncation_recall(spark, sf):
    """Matryoshka truncation audit: recall@10 of prefix-truncated
    cosine search (dims 8/16/32) vs the full 64-dim exact top-k
    (similarity.dimension_truncation_recall): one
    TakeOrderedAndProject per dim, persisted k-row full ranking."""
    from padua_spark.extensions.similarity import (
        dimension_truncation_recall,
    )

    emb = _t(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select(
        "embedding"
    ).collect()
    query = [float(x) for x in qrow[0][0]]
    return dimension_truncation_recall(
        emb, "embedding", "vec_id", query, k=10, dims=(8, 16, 32)
    )


_WINDOWED_CONTROL_ORACLE = """
WITH base AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600 AS ws,
    CAST(round(value * 100) AS DOUBLE) AS v
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
)
SELECT ws AS window_start_epoch,
  CAST(count(*) AS BIGINT) AS n,
  round(sum(v) / CAST(count(*) AS DOUBLE), 6) AS mean,
  round(min(v), 6) AS min_value,
  round(max(v), 6) AS max_value,
  CAST(sum(CASE WHEN v > 18000.0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_above_ucl,
  CAST(sum(CASE WHEN v < 1000.0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_below_lcl,
  round(CAST(sum(CASE WHEN v > 18000.0 OR v < 1000.0
    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
    AS frac_out,
  (sum(v) / CAST(count(*) AS DOUBLE) > 18000.0
   OR sum(v) / CAST(count(*) AS DOUBLE) < 1000.0) AS mean_out
FROM base GROUP BY 1
"""


@_q("windowed_control_check", _WINDOWED_CONTROL_ORACLE)
def q_windowed_control_check(spark, sf):
    """Per-hour SPC monitor of cent-valued events against fixed
    pre-trained limits (streaming.windowed_control_check): one
    stateful aggregation with out-of-limit counts and the
    window-mean breach flag. Cents keep the window sums exact
    integers (order-independent across engines)."""
    from padua_spark.streaming import windowed_control_check
    from padua_spark.streaming.windows import event_time_col

    e = _t(spark, sf, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    out = windowed_control_check(
        e,
        event_time_col(e, "ts"),
        F.round(F.col("value") * 100).cast("double"),
        center=10000.0, ucl=18000.0, lcl=1000.0,
        window_duration="1 hour",
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "n", "mean", "min_value", "max_value",
        "n_above_ucl", "n_below_lcl", "frac_out", "mean_out",
    )


def _hilbert_oracle() -> str:
    from padua_spark.io_utils import hilbert_cte_sql

    # b carries pristine copies (xb0, yb0) so the passthrough columns
    # exist at every ladder level while hx/hy evolve
    chain = hilbert_cte_sql(
        "b", "xb", "yb", bits=16, out="hkey",
        passthrough="o_orderkey, xb0, yb0",
    )
    return f"""
WITH b AS (
  SELECT o_orderkey,
    CAST(date_diff('day', DATE '1992-01-01',
      CAST(o_orderdate AS DATE)) AS BIGINT) AS xb,
    CAST(date_diff('day', DATE '1992-01-01',
      CAST(o_orderdate AS DATE)) AS BIGINT) AS xb0,
    CAST(floor(o_totalprice / 100.0) AS BIGINT) AS yb,
    CAST(floor(o_totalprice / 100.0) AS BIGINT) AS yb0
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
),
{chain}
SELECT o_orderkey, xb0 AS xb, yb0 AS yb, hkey AS hval
FROM hlvl0
"""


@_q("hilbert_key", _hilbert_oracle())
def q_hilbert_key(spark, sf):
    """Hilbert-curve clustering key over (order-date days, price
    bucket) (io_utils.with_hilbert_key): the continuous-curve
    alternative to zorder_key — consecutive key ranges are tighter
    2-D bounding boxes, so footer-stats skipping prunes harder on
    both dimensions (write_hilbert lays files out on it). Sixteen
    staged integer levels, engine-exact, mirrored as a chained-CTE
    ladder in the oracle."""
    from padua_spark.io_utils import with_hilbert_key

    o = _t(spark, sf, "orders").where(
        F.col("o_orderdate").isNotNull()
        & F.col("o_totalprice").isNotNull()
    )
    b = o.select(
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1992-01-01").cast("date"),
        ).cast("bigint").alias("xb"),
        F.floor(F.col("o_totalprice") / 100.0)
        .cast("bigint").alias("yb"),
    )
    return with_hilbert_key(b, "xb", "yb", bits=16, out_col="hval")


_YUEN_ORACLE = """
WITH RECURSIVE base AS (
  SELECT CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS a,
    CAST(l_quantity AS DOUBLE) AS v
  FROM lineitem
  WHERE l_returnflag IN ('A', 'R') AND l_quantity IS NOT NULL
),
bounds AS (
  SELECT a, quantile_cont(v, 0.2) AS lo, quantile_cont(v, 0.8) AS hi
  FROM base GROUP BY 1
),
per AS (
  SELECT b.a, CAST(count(*) AS BIGINT) AS n,
    CAST(count(CASE WHEN b.v >= bo.lo AND b.v <= bo.hi THEN 1 END)
      AS BIGINT) AS h,
    avg(CASE WHEN b.v >= bo.lo AND b.v <= bo.hi THEN b.v END) AS tm,
    sum(least(greatest(b.v, bo.lo), bo.hi)) AS sw,
    sum(least(greatest(b.v, bo.lo), bo.hi)
      * least(greatest(b.v, bo.lo), bo.hi)) AS qw
  FROM base b JOIN bounds bo USING (a)
  GROUP BY 1
),
row_ AS (
  SELECT
    max(CASE WHEN a = 1 THEN n END) AS na,
    max(CASE WHEN a = 0 THEN n END) AS nb,
    max(CASE WHEN a = 1 THEN h END) AS ha,
    max(CASE WHEN a = 0 THEN h END) AS hb,
    max(CASE WHEN a = 1 THEN tm END) AS tma,
    max(CASE WHEN a = 0 THEN tm END) AS tmb,
    max(CASE WHEN a = 1 THEN sw END) AS swa,
    max(CASE WHEN a = 0 THEN sw END) AS swb,
    max(CASE WHEN a = 1 THEN qw END) AS qwa,
    max(CASE WHEN a = 0 THEN qw END) AS qwb
  FROM per
),
d AS (
  SELECT *,
    CASE WHEN ha >= 2 AND na >= 2 THEN
      (CAST(na AS DOUBLE) - 1.0)
      * greatest(0.0, (qwa - CAST(na AS DOUBLE)
          * (swa / CAST(na AS DOUBLE)) * (swa / CAST(na AS DOUBLE)))
        / (CAST(na AS DOUBLE) - 1.0))
      / (CAST(ha AS DOUBLE) * (CAST(ha AS DOUBLE) - 1.0)) END AS da,
    CASE WHEN hb >= 2 AND nb >= 2 THEN
      (CAST(nb AS DOUBLE) - 1.0)
      * greatest(0.0, (qwb - CAST(nb AS DOUBLE)
          * (swb / CAST(nb AS DOUBLE)) * (swb / CAST(nb AS DOUBLE)))
        / (CAST(nb AS DOUBLE) - 1.0))
      / (CAST(hb AS DOUBLE) * (CAST(hb AS DOUBLE) - 1.0)) END AS db
  FROM row_
),
s AS (
  SELECT *, tma - tmb AS diff,
    CASE WHEN da + db > 0 THEN (tma - tmb) / sqrt(da + db) END AS t,
    CASE WHEN da IS NOT NULL AND db IS NOT NULL AND da + db > 0 THEN
      (da + db) * (da + db)
      / (da * da / (CAST(ha AS DOUBLE) - 1.0)
         + db * db / (CAST(hb AS DOUBLE) - 1.0)) END AS dfree
  FROM d
),
inp AS (
  SELECT 'k' AS key,
    CAST(dfree / (dfree + t * t) AS DOUBLE) AS x,
    CAST(dfree / 2.0 AS DOUBLE) AS a, CAST(0.5 AS DOUBLE) AS b
  FROM s WHERE t IS NOT NULL
),
{BETAINC}
SELECT s.na AS n_a, s.nb AS n_b, s.ha AS h_a, s.hb AS h_b,
  round(s.tma, 6) AS trimmed_mean_a,
  round(s.tmb, 6) AS trimmed_mean_b,
  round(s.diff, 6) AS diff,
  round(s.t, 6) AS t_stat,
  round(s.dfree, 6) AS df,
  round(pv.p, 6) AS p_value
FROM s LEFT JOIN pv ON pv.key = 'k'
"""


@_q("yuen_trimmed_ttest", _YUEN_ORACLE.replace("{BETAINC}", _betainc_chain_sql()))
def q_yuen_trimmed_ttest(spark, sf):
    """Yuen robust trimmed-means t (20% trim) for quantities of
    returnflag A vs R (stats.yuen_trimmed_ttest): percentile bounds,
    boundary-inclusive trimmed means, winsorized variance, Welch-style
    df, shared t SF."""
    from padua_spark.operators.stats import yuen_trimmed_ttest

    li = _t(spark, sf, "lineitem")
    return yuen_trimmed_ttest(
        li, "l_returnflag", "l_quantity", "A", "R", trim=0.2
    )


_PB_ORACLE = """
WITH pts AS (
  SELECT CAST(l_extendedprice AS DOUBLE) / 100.0 AS x,
    CAST(l_extendedprice AS DOUBLE) * (1.0 + CAST(l_tax AS DOUBLE))
      / 100.0 AS y
  FROM lineitem
  WHERE l_orderkey % 1999 = 0 AND l_extendedprice IS NOT NULL
    AND l_tax IS NOT NULL
),
pairs AS (
  SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
  FROM pts a JOIN pts b
    ON (a.x < b.x) OR (a.x = b.x AND a.y < b.y)
  WHERE a.x <> b.x
),
slopes AS (
  SELECT (yb - ya) / (xb - xa) AS s FROM pairs
  WHERE (yb - ya) / (xb - xa) <> -1.0
),
npts AS (SELECT CAST(count(*) AS BIGINT) AS np FROM pts),
ranked AS (
  SELECT s, row_number() OVER (ORDER BY s) AS rn FROM slopes
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN s < -1.0 THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM slopes
),
bands AS (
  SELECT t.n, t.k,
    CASE WHEN t.n % 2 = 1
      THEN CAST(floor((t.n + 1) / 2.0) AS BIGINT) + t.k
      ELSE t.n // 2 + t.k END AS r1,
    CASE WHEN t.n % 2 = 1
      THEN CAST(floor((t.n + 1) / 2.0) AS BIGINT) + t.k
      ELSE t.n // 2 + 1 + t.k END AS r2,
    greatest(CAST(1 AS BIGINT),
      CAST(ceil((CAST(t.n AS DOUBLE)
        - 1.959963984540054 * sqrt(CAST(p.np AS DOUBLE)
          * (p.np - 1) * (2 * p.np + 5) / 18.0)) / 2.0) AS BIGINT)
      + t.k) AS rlo,
    least(t.n,
      t.n - CAST(ceil((CAST(t.n AS DOUBLE)
        - 1.959963984540054 * sqrt(CAST(p.np AS DOUBLE)
          * (p.np - 1) * (2 * p.np + 5) / 18.0)) / 2.0) AS BIGINT)
      + 1 + t.k) AS rhi
  FROM tot t, npts p
),
sel AS (
  SELECT b.n, b.k,
    (SELECT r.s FROM ranked r WHERE r.rn = b.r1) AS s1,
    (SELECT r.s FROM ranked r WHERE r.rn = b.r2) AS s2,
    (SELECT r.s FROM ranked r WHERE r.rn = b.rlo) AS slo,
    (SELECT r.s FROM ranked r WHERE r.rn = b.rhi) AS shi
  FROM bands b
),
withb AS (SELECT *, (s1 + s2) / 2.0 AS b FROM sel),
icept AS (
  SELECT quantile_cont(p.y - w.b * p.x, 0.5) AS a
  FROM pts p, withb w
)
SELECT (SELECT np FROM npts) AS n_points,
  w.n AS n_slopes, w.k AS k_neg,
  round(w.b, 6) AS slope,
  round(w.slo, 6) AS slope_lo,
  round(w.shi, 6) AS slope_hi,
  round(i.a, 6) AS intercept
FROM withb w, icept i
"""


@_q("passing_bablok", _PB_ORACLE)
def q_passing_bablok(spark, sf):
    """Passing-Bablok nonparametric method-comparison line between
    price and taxed price on a 1-in-1999 order sample
    (stats.passing_bablok): shifted-median slope off the stepped
    slope-domain cumsum, paper rank CI, exact median intercept."""
    from padua_spark.operators.stats import passing_bablok

    li = _t(spark, sf, "lineitem").where(
        (F.col("l_orderkey") % 1999 == 0)
        & F.col("l_extendedprice").isNotNull()
        & F.col("l_tax").isNotNull()
    ).select(
        (F.col("l_extendedprice").cast("double") / 100.0).alias("x"),
        (
            F.col("l_extendedprice").cast("double")
            * (1.0 + F.col("l_tax").cast("double")) / 100.0
        ).alias("y"),
    )
    return passing_bablok(li, "x", "y", max_points=100_000)


def _lsh_eval_oracle() -> str:
    truth_sql = _ORACLES["ngram_jaccard"].strip()
    cand_sql = _minhash_oracle().strip()
    return f"""
WITH truth AS (
  SELECT least(id_a, id_b) AS i, greatest(id_a, id_b) AS j
  FROM ({truth_sql}) WHERE jaccard >= 0.5
),
cand0 AS (
  SELECT DISTINCT least(id_a, id_b) AS i, greatest(id_a, id_b) AS j
  FROM ({cand_sql})
),
blocks AS (
  SELECT doc_id, lang,
    CAST(floor(n_chars / 50.0) AS INTEGER) AS lb
  FROM documents WHERE len(string_split(text, ' ')) >= 3
),
cand AS (
  SELECT c.i, c.j FROM cand0 c
  JOIN blocks a ON a.doc_id = c.i
  JOIN blocks b ON b.doc_id = c.j
  WHERE a.lang = b.lang AND a.lb = b.lb
),
counts AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
    (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
    (SELECT CAST(count(*) AS BIGINT)
     FROM truth t JOIN cand c ON c.i = t.i AND c.j = t.j) AS n_hit
)
SELECT CAST(0.5 AS DOUBLE) AS threshold, n_truth,
  n_cand AS n_candidates, n_hit,
  round(CASE WHEN n_truth > 0
    THEN CAST(n_hit AS DOUBLE) / n_truth END, 6) AS recall,
  round(CASE WHEN n_cand > 0
    THEN CAST(n_hit AS DOUBLE) / n_cand END, 6) AS precision
FROM counts
"""


@_q("lsh_candidate_eval", _lsh_eval_oracle())
def q_lsh_candidate_eval(spark, sf):
    """Recall/precision of the MinHash LSH banding against the exact
    within-block n-gram Jaccard truth at tau=0.5
    (dedup.lsh_candidate_eval): composes the two green machines, one
    canonical-pair join, one count roll-up."""
    from padua_spark.extensions.dedup import lsh_candidate_eval

    d = (
        _t(spark, sf, "documents")
        .filter(F.size(F.split(F.col("text"), " ")) >= 3)
        .withColumn(
            "len_bucket",
            F.floor(F.col("n_chars") / F.lit(50.0)).cast("int"),
        )
    )
    return lsh_candidate_eval(
        d, "doc_id", "text", ["lang", "len_bucket"], threshold=0.5
    )


_VOCAB_CURVE_ORACLE = """
WITH toks AS (
  SELECT t AS tok, CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT unnest(list_filter(
      string_split_regex(lower(trim(text)), '\\s+'),
      x -> x <> '')) AS t
    FROM documents WHERE text IS NOT NULL
  ) GROUP BY 1
),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rn
  FROM toks
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS total,
    CAST(count(*) AS BIGINT) AS vtypes
  FROM toks
),
ks AS (
  SELECT unnest([100, 1000, 10000]) AS k
)
SELECT CAST(ks.k AS BIGINT) AS k,
  least(CAST(ks.k AS BIGINT), t.vtypes) AS n_types_used,
  CAST((SELECT sum(r.c) FROM ranked r WHERE r.rn <= ks.k)
    AS BIGINT) AS covered_tokens,
  t.total AS total_tokens,
  round(CAST((SELECT sum(r.c) FROM ranked r WHERE r.rn <= ks.k)
    AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS coverage
FROM ks, tot t
"""


@_q("vocabulary_coverage_curve", _VOCAB_CURVE_ORACLE)
def q_vocabulary_coverage_curve(spark, sf):
    """Top-k vocabulary coverage curve over the documents corpus
    (text.vocabulary_coverage_curve): one token aggregation, then
    everything on the count-domain stepped frame — the k-th boundary
    resolved by exact arithmetic on the boundary row, never a sort
    of the type table."""
    from padua_spark.extensions.text import vocabulary_coverage_curve

    d = _t(spark, sf, "documents")
    return vocabulary_coverage_curve(
        d, "text", ks=(100, 1000, 10000)
    )


_FAIRNESS_ORACLE = """
WITH base AS (
  SELECT CAST(user_id % 3 AS BIGINT) AS grp,
    CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS y,
    CASE WHEN value > 100 THEN 1 ELSE 0 END AS p
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND value IS NOT NULL
),
per AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS pos,
    CAST(sum(p) AS BIGINT) AS pp,
    CAST(sum(y * p) AS BIGINT) AS tp,
    CAST(sum((1 - y) * p) AS BIGINT) AS fp
  FROM base GROUP BY 1
),
rates AS (
  SELECT grp, n,
    CAST(pos AS DOUBLE) / n AS br,
    CAST(pp AS DOUBLE) / n AS ppr,
    CASE WHEN pos > 0 THEN CAST(tp AS DOUBLE) / pos END AS tpr,
    CASE WHEN n - pos > 0 THEN CAST(fp AS DOUBLE) / (n - pos)
      END AS fpr
  FROM per
),
ref AS (
  SELECT ppr AS rppr, tpr AS rtpr, fpr AS rfpr
  FROM rates WHERE grp = 0
)
SELECT r.grp AS "group", r.n,
  round(r.br, 6) AS base_rate,
  round(r.ppr, 6) AS ppr,
  round(r.tpr, 6) AS tpr,
  round(r.fpr, 6) AS fpr,
  round(r.ppr - f.rppr, 6) AS dp_gap,
  round(r.tpr - f.rtpr, 6) AS tpr_gap,
  round(r.fpr - f.rfpr, 6) AS fpr_gap
FROM rates r, ref f
"""


@_q("fairness_report", _FAIRNESS_ORACLE)
def q_fairness_report(spark, sf):
    """Group-fairness disparity audit of a threshold classifier over
    user-parity pseudo-groups (features.fairness_report): per-group
    confusion counts, demographic-parity / equal-opportunity /
    equalized-odds gaps vs group 0."""
    from padua_spark.extensions.features import fairness_report

    e = _t(spark, sf, "events").where(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        (F.col("user_id") % 3).cast("bigint").alias("grp"),
        F.col("event_type").isin("click", "view")
        .cast("int").alias("y"),
        (F.col("value") > 100).cast("int").alias("p"),
    )
    return fairness_report(e, "grp", "y", "p", 0)


def _mmd_oracle(n_perms: int = 49) -> str:
    M = 2_147_483_647
    A = 48_271
    h0 = f"(((vec_id % {M}) + b * 1000003) % {M})"
    h1 = f"(({h0} * {h0}) % {M})"
    h2 = f"((({h1} * {A}) + {h0}) % {M})"
    h3 = f"(({h2} * {h2}) % {M})"
    return f"""
WITH base AS (
  SELECT vec_id, CAST(label % 2 AS INTEGER) AS a,
    CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
ex AS (
  SELECT b.vec_id, b.a, t.d, b.v[t.d] AS x
  FROM base b, unnest(generate_series(1, len(b.v))) t(d)
),
per AS (
  SELECT d,
    sum(CASE WHEN a = 1 THEN x ELSE 0.0 END) AS sa,
    sum(CASE WHEN a = 0 THEN x ELSE 0.0 END) AS sb,
    CAST(sum(a) AS BIGINT) AS na,
    CAST(sum(1 - a) AS BIGINT) AS nb
  FROM ex GROUP BY 1
),
obs AS (
  SELECT max(na) AS na, max(nb) AS nb,
    CAST(count(*) AS BIGINT) AS dim,
    sum(pow(sa / na - sb / nb, 2)) AS mmd2
  FROM per
),
pex AS (
  SELECT t.b,
    CASE WHEN {h3} < {M // 2} THEN 1 ELSE 0 END AS pa,
    u.d, base.v[u.d] AS x
  FROM base, range(1, {n_perms + 1}) t(b),
    unnest(generate_series(1, len(base.v))) u(d)
),
pper AS (
  SELECT b, d,
    sum(CASE WHEN pa = 1 THEN x ELSE 0.0 END) AS sa,
    sum(CASE WHEN pa = 0 THEN x ELSE 0.0 END) AS sb,
    CAST(sum(pa) AS BIGINT) AS na,
    CAST(sum(1 - pa) AS BIGINT) AS nb
  FROM pex GROUP BY 1, 2
),
pmmd AS (
  SELECT b, sum(pow(sa / na - sb / nb, 2)) AS m2b
  FROM pper WHERE na > 0 AND nb > 0 GROUP BY 1
)
SELECT o.na AS n_a, o.nb AS n_b, o.dim,
  round(o.mmd2, 9) AS mmd2,
  round(CAST((SELECT sum(CASE WHEN p.m2b >= o.mmd2 THEN 1 ELSE 0
    END) FROM pmmd p) + 1 AS DOUBLE) / {n_perms + 1}.0, 6)
    AS p_value,
  {n_perms} AS n_perms
FROM obs o
"""


@_q("embedding_mmd", _mmd_oracle())
def q_embedding_mmd(spark, sf):
    """Linear-kernel MMD two-sample test between even/odd-label
    embedding sub-corpora (similarity.embedding_mmd): mean embeddings
    as kernel mean maps, 49 deterministic Lehmer-hash label
    re-randomizations for p."""
    from padua_spark.extensions.similarity import embedding_mmd

    emb = _t(spark, sf, "embeddings").where(
        F.col("embedding").isNotNull()
    ).select(
        "vec_id",
        (F.col("label") % 2).cast("int").alias("grp"),
        "embedding",
    )
    return embedding_mmd(
        emb, "embedding", "grp", 1, 0, id_col="vec_id", n_perms=49
    )


def _binseg_oracle(rounds: int = 2, min_seg: int = 100) -> str:
    parts = []
    for r in range(rounds):
        parts.append(f"""
st{r} AS (
  SELECT grp, seg, pos, v,
    sum(v) OVER w AS s1, sum(v * v) OVER w AS s2,
    CAST(row_number() OVER wo AS BIGINT) AS i,
    sum(v) OVER wf AS g1, sum(v * v) OVER wf AS g2,
    CAST(count(*) OVER wf AS BIGINT) AS m
  FROM c{r}
  WINDOW wo AS (PARTITION BY grp, seg ORDER BY pos),
    w AS (PARTITION BY grp, seg ORDER BY pos
          ROWS UNBOUNDED PRECEDING),
    wf AS (PARTITION BY grp, seg)
),
cand{r} AS (
  SELECT grp, seg, pos,
    (g2 - g1 * g1 / CAST(m AS DOUBLE))
    - ((s2 - s1 * s1 / CAST(i AS DOUBLE))
       + ((g2 - s2) - (g1 - s1) * (g1 - s1)
          / (CAST(m AS DOUBLE) - CAST(i AS DOUBLE)))) AS gain
  FROM st{r}
  WHERE i >= {min_seg} AND m - i >= {min_seg}
),
best{r} AS (
  SELECT grp, seg AS bseg, pos AS bpos FROM (
    SELECT grp, seg, pos, gain,
      row_number() OVER (PARTITION BY grp
        ORDER BY gain DESC, seg ASC, pos ASC) AS rn
    FROM cand{r}
  ) WHERE rn = 1 AND gain >= 0.0
),
c{r + 1} AS MATERIALIZED (
  SELECT c.grp, c.pos, c.v,
    CASE WHEN b.bseg IS NOT NULL AND c.seg = b.bseg
      AND c.pos > b.bpos THEN b.bpos + 1 ELSE c.seg END AS seg
  FROM c{r} c LEFT JOIN best{r} b ON b.grp = c.grp
)""")
        chain = ",\n".join(parts)
    return f"""
WITH c0 AS MATERIALIZED (
  SELECT l_returnflag AS grp,
    CAST(row_number() OVER (PARTITION BY l_returnflag
      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)
      AS BIGINT) AS pos,
    CAST(l_quantity AS DOUBLE) AS v,
    CAST(1 AS BIGINT) AS seg
  FROM lineitem WHERE l_quantity IS NOT NULL
),
{chain}
SELECT grp AS l_returnflag,
  CAST(min(pos) AS BIGINT) AS seg_start,
  CAST(max(pos) AS BIGINT) AS seg_end,
  CAST(count(*) AS BIGINT) AS n,
  round(avg(v), 6) AS mean
FROM c{rounds} GROUP BY grp, seg
"""


@_q("binary_segmentation", _binseg_oracle())
def q_binary_segmentation(spark, sf):
    """Two rounds of binary segmentation on quantities per return
    flag in shipdate order (temporal.binary_segmentation): per-round
    prefix-sum window + argmax-gain roll-up + broadcast relabel,
    localCheckpoint plan truncation between rounds; pure-ranking
    gain rule (min_gain_frac=0) so both engines accept identically."""
    from padua_spark.operators.temporal import binary_segmentation

    li = _t(spark, sf, "lineitem")
    return binary_segmentation(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity",
        max_changepoints=2, min_segment=100, min_gain_frac=0.0,
    )


_MEDIAN_CI_ORACLE = """
WITH per AS (
  SELECT l_returnflag AS grp, CAST(l_quantity AS DOUBLE) AS v,
    CAST(count(*) AS BIGINT) AS c
  FROM lineitem WHERE l_quantity IS NOT NULL
  GROUP BY 1, 2
),
st AS (
  SELECT grp, v, c,
    sum(c) OVER (PARTITION BY grp ORDER BY v
      ROWS UNBOUNDED PRECEDING) AS run,
    sum(c) OVER (PARTITION BY grp) AS n
  FROM per
),
r AS (
  SELECT *, CAST(n AS DOUBLE) AS nd,
    greatest(CAST(1 AS BIGINT),
      CAST(floor((CAST(n AS DOUBLE)
        - 1.959963984540054 * sqrt(CAST(n AS DOUBLE))) / 2.0)
        AS BIGINT)) AS rlo,
    least(n, CAST(ceil((CAST(n AS DOUBLE)
        + 1.959963984540054 * sqrt(CAST(n AS DOUBLE))) / 2.0)
        AS BIGINT) + 1) AS rhi,
    CAST(floor((CAST(n AS DOUBLE) + 1.0) / 2.0) AS BIGINT) AS m1,
    CAST(ceil((CAST(n AS DOUBLE) + 1.0) / 2.0) AS BIGINT) AS m2
  FROM st
)
SELECT grp AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
  round((min(CASE WHEN run >= m1 THEN v END)
    + min(CASE WHEN run >= m2 THEN v END)) / 2.0, 6) AS median,
  round(min(CASE WHEN run >= rlo THEN v END), 6) AS ci_lo,
  round(min(CASE WHEN run >= rhi THEN v END), 6) AS ci_hi
FROM r GROUP BY 1
"""


@_q("median_ci", _MEDIAN_CI_ORACLE)
def q_median_ci(spark, sf):
    """Distribution-free order-statistic CI for the median quantity
    per return flag (stats.median_ci): sign-test-inversion ranks off
    the aggregated value-domain frame, exact two-middle point
    median."""
    from padua_spark.operators.stats import median_ci

    li = _t(spark, sf, "lineitem")
    return median_ci(li, "l_quantity", group_cols=["l_returnflag"])


_RM_ANOVA_ORACLE = """
WITH RECURSIVE cells AS (
  SELECT user_id AS b, event_type AS t,
    CAST(count(*) AS DOUBLE) AS v
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
ktot AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS k FROM cells),
complete AS (
  SELECT b FROM cells, ktot
  GROUP BY b, ktot.k
  HAVING count(DISTINCT t) = ktot.k AND count(*) = ktot.k
),
kept AS (
  SELECT c.* FROM cells c JOIN complete USING (b)
),
per_t AS (SELECT t, sum(v) AS st FROM kept GROUP BY 1),
per_b AS (SELECT b, sum(v) AS sb FROM kept GROUP BY 1),
grand AS (
  SELECT CAST(count(*) AS BIGINT) AS nk, sum(v) AS g1,
    sum(v * v) AS g2
  FROM kept
),
tsum AS (
  SELECT CAST(count(*) AS BIGINT) AS k, sum(st * st) AS sst2
  FROM per_t
),
bsum AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(sb * sb) AS ssb2
  FROM per_b
),
s AS (
  SELECT b.n, t.k, g.nk,
    g.g2 - g.g1 * g.g1 / CAST(g.nk AS DOUBLE) AS ss_total,
    t.sst2 / CAST(b.n AS DOUBLE)
      - g.g1 * g.g1 / CAST(g.nk AS DOUBLE) AS ss_treat,
    b.ssb2 / CAST(t.k AS DOUBLE)
      - g.g1 * g.g1 / CAST(g.nk AS DOUBLE) AS ss_block
  FROM grand g, tsum t, bsum b
),
f AS (
  SELECT *, ss_total - ss_treat - ss_block AS ss_err,
    CAST(k AS DOUBLE) - 1.0 AS df1,
    (CAST(k AS DOUBLE) - 1.0) * (CAST(n AS DOUBLE) - 1.0) AS df2
  FROM s
),
fs AS (
  SELECT *,
    CASE WHEN k >= 2 AND n >= 2 AND ss_err > 0
      THEN (ss_treat / df1) / (ss_err / df2) END AS fstat
  FROM f
),
inp AS (
  SELECT 'k' AS key,
    CAST(df2 / (df2 + df1 * fstat) AS DOUBLE) AS x,
    CAST(df2 / 2.0 AS DOUBLE) AS a,
    CAST(df1 / 2.0 AS DOUBLE) AS b
  FROM fs WHERE fstat IS NOT NULL
),
{BETAINC}
SELECT fs.n AS n_blocks, fs.k AS k_treatments,
  round(fs.ss_treat, 2) AS ss_treat,
  round(fs.ss_block, 2) AS ss_block,
  round(fs.ss_err, 2) AS ss_error,
  round(fs.fstat, 6) AS f_stat,
  CAST(fs.df1 AS INT) AS df1,
  CAST(fs.df2 AS BIGINT) AS df2,
  round(pv.p, 6) AS p_value
FROM fs LEFT JOIN pv ON pv.key = 'k'
"""


@_q(
    "rm_anova_1way",
    _RM_ANOVA_ORACLE.replace("{BETAINC}", _betainc_chain_sql()),
)
def q_rm_anova_1way(spark, sf):
    """One-way repeated-measures ANOVA of per-user event-type
    activity (stats.rm_anova_1way): the friedman completeness rule,
    algebraic SS decomposition from exact integer count sums, shared
    F SF."""
    from padua_spark.operators.stats import rm_anova_1way

    e = _t(spark, sf, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("v")
    )
    return rm_anova_1way(counts, "user_id", "event_type", "v")


_WINDOWED_FAIRNESS_ORACLE = """
WITH base AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600 AS ws,
    CAST(user_id % 2 AS BIGINT) AS g,
    CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS y,
    CASE WHEN value > 100 THEN 1 ELSE 0 END AS p
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
    AND event_type IS NOT NULL AND value IS NOT NULL
),
per AS (
  SELECT ws,
    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
    CAST(sum(CASE WHEN g = 0 THEN y ELSE 0 END) AS BIGINT) AS pos0,
    CAST(sum(CASE WHEN g = 0 THEN p ELSE 0 END) AS BIGINT) AS pp0,
    CAST(sum(CASE WHEN g = 0 THEN y * p ELSE 0 END) AS BIGINT)
      AS tp0,
    CAST(sum(CASE WHEN g = 0 THEN (1 - y) * p ELSE 0 END) AS BIGINT)
      AS fp0,
    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN g = 1 THEN y ELSE 0 END) AS BIGINT) AS pos1,
    CAST(sum(CASE WHEN g = 1 THEN p ELSE 0 END) AS BIGINT) AS pp1,
    CAST(sum(CASE WHEN g = 1 THEN y * p ELSE 0 END) AS BIGINT)
      AS tp1,
    CAST(sum(CASE WHEN g = 1 THEN (1 - y) * p ELSE 0 END) AS BIGINT)
      AS fp1
  FROM base GROUP BY 1
),
rates AS (
  SELECT ws, n0, n1,
    CASE WHEN n0 > 0 THEN CAST(pp0 AS DOUBLE) / n0 END AS ppr0,
    CASE WHEN pos0 > 0 THEN CAST(tp0 AS DOUBLE) / pos0 END AS tpr0,
    CASE WHEN n0 - pos0 > 0 THEN CAST(fp0 AS DOUBLE) / (n0 - pos0)
      END AS fpr0,
    CASE WHEN n1 > 0 THEN CAST(pp1 AS DOUBLE) / n1 END AS ppr1,
    CASE WHEN pos1 > 0 THEN CAST(tp1 AS DOUBLE) / pos1 END AS tpr1,
    CASE WHEN n1 - pos1 > 0 THEN CAST(fp1 AS DOUBLE) / (n1 - pos1)
      END AS fpr1
  FROM per
)
SELECT ws AS window_start_epoch, CAST(0 AS BIGINT) AS "group",
  n0 AS n, round(ppr0, 6) AS ppr, round(tpr0, 6) AS tpr,
  round(fpr0, 6) AS fpr,
  round(ppr0 - ppr0, 6) AS dp_gap,
  round(tpr0 - tpr0, 6) AS tpr_gap,
  round(fpr0 - fpr0, 6) AS fpr_gap
FROM rates
UNION ALL
SELECT ws, CAST(1 AS BIGINT), n1, round(ppr1, 6), round(tpr1, 6),
  round(fpr1, 6), round(ppr1 - ppr0, 6), round(tpr1 - tpr0, 6),
  round(fpr1 - fpr0, 6)
FROM rates
"""


@_q("windowed_fairness_check", _WINDOWED_FAIRNESS_ORACLE)
def q_windowed_fairness_check(spark, sf):
    """Per-hour fairness monitor for the user-parity groups
    (streaming.windowed_fairness_check): declared groups become
    conditional-sum columns in ONE stateful aggregation, gaps vs
    group 0 computed on the same window row."""
    from padua_spark.streaming import windowed_fairness_check
    from padua_spark.streaming.windows import event_time_col

    e = _t(spark, sf, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    )
    out = windowed_fairness_check(
        e,
        event_time_col(e, "ts"),
        (F.col("user_id") % 2).cast("bigint"),
        [0, 1],
        F.col("event_type").isin("click", "view").cast("int"),
        (F.col("value") > 100).cast("int"),
        0,
        window_duration="1 hour",
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        F.col("group").cast("bigint").alias("group"),
        "n", "ppr", "tpr", "fpr",
        "dp_gap", "tpr_gap", "fpr_gap",
    )



# --- E321-E326 round-12 battery 1: homogeneity / randomness screens ---------
#     (SNHT, Buishand, turning points, Bartels RVN, variance ratio,
#     records) on the kpss ordered-series fixture -----------------------------

_SERIES_BASE_SQL = """
  SELECT l_returnflag AS grp, CAST(l_quantity AS DOUBLE) AS v,
    sum(CAST(l_quantity AS DOUBLE)) OVER w AS c,
    CAST(row_number() OVER w AS DOUBLE) AS t
  FROM lineitem WHERE l_quantity IS NOT NULL
  WINDOW w AS (PARTITION BY l_returnflag
               ORDER BY l_shipdate, l_orderkey, l_linenumber,
                        l_quantity
               ROWS UNBOUNDED PRECEDING)
"""

_ERFC2_SQL = """(0.254829592 * tt + -0.284496736 * tt * tt
     + 1.421413741 * tt * tt * tt + -1.453152027 * tt * tt * tt * tt
     + 1.061405429 * tt * tt * tt * tt * tt) * exp(-x2 * x2)"""

_SNHT_ORACLE = f"""
WITH base AS ({_SERIES_BASE_SQL}),
mom AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n, sum(v) AS sx,
    sum(v * v) AS sxx
  FROM base GROUP BY 1
),
s AS (
  SELECT grp, n, CAST(n AS DOUBLE) AS nd,
    sx / CAST(n AS DOUBLE) AS mu,
    (sxx - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE))
      * (sx / CAST(n AS DOUBLE))) / CAST(n AS DOUBLE) AS var0
  FROM mom
),
tk AS (
  SELECT b.grp, s.n, b.t AS k,
    CASE WHEN b.t < s.nd AND s.var0 > 0 THEN
      ((b.c - b.t * s.mu) * (b.c - b.t * s.mu) / s.var0)
      * (1.0 / b.t + 1.0 / (s.nd - b.t)) END AS tkv
  FROM base b JOIN s ON b.grp = s.grp
)
SELECT grp AS l_returnflag, n, round(tkv, 6) AS t0_stat,
  CAST(k AS BIGINT) AS change_index
FROM tk WHERE tkv IS NOT NULL
QUALIFY row_number() OVER (PARTITION BY grp
                           ORDER BY tkv DESC, k ASC) = 1
"""


@_q("snht_test", _SNHT_ORACLE)
def q_snht_test(spark, sf):
    """SNHT mean-homogeneity statistic of quantities per return flag
    in shipdate order (temporal.snht_test): one ordered window pass
    via the S_k = C_k - k*mean identity, per-group moments joined
    back, earliest-argmax roll-up."""
    from padua_spark.operators.temporal import snht_test

    li = _t(spark, sf, "lineitem")
    return snht_test(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity",
    )


_BUISHAND_ORACLE = f"""
WITH base AS ({_SERIES_BASE_SQL}),
mom AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n, sum(v) AS sx,
    sum(v * v) AS sxx
  FROM base GROUP BY 1
),
s AS (
  SELECT grp, n, CAST(n AS DOUBLE) AS nd,
    sx / CAST(n AS DOUBLE) AS mu,
    (sxx - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE))
      * (sx / CAST(n AS DOUBLE))) / CAST(n AS DOUBLE) AS var0
  FROM mom
),
sk AS (
  SELECT b.grp, s.n, b.t AS k, b.c - b.t * s.mu AS skv,
    CASE WHEN s.var0 > 0 THEN sqrt(s.var0) END AS sd
  FROM base b JOIN s ON b.grp = s.grp
),
agg AS (
  SELECT grp, max(n) AS n, greatest(max(skv), 0.0) AS smax,
    least(min(skv), 0.0) AS smin, max(sd) AS sd
  FROM sk GROUP BY 1
),
ci AS (
  SELECT grp, CAST(k AS BIGINT) AS change_index
  FROM sk
  QUALIFY row_number() OVER (PARTITION BY grp
                             ORDER BY abs(skv) DESC, k ASC) = 1
)
SELECT a.grp AS l_returnflag, a.n,
  round(CASE WHEN a.n >= 2 AND a.sd IS NOT NULL
    THEN (a.smax - a.smin) / a.sd END, 6) AS range_stat,
  round(CASE WHEN a.n >= 2 AND a.sd IS NOT NULL
    THEN ((a.smax - a.smin) / a.sd)
      / sqrt(CAST(a.n AS DOUBLE)) END, 6) AS rescaled_range,
  ci.change_index
FROM agg a JOIN ci ON a.grp = ci.grp
"""


@_q("buishand_range", _BUISHAND_ORACLE)
def q_buishand_range(spark, sf):
    """Buishand cumulative-deviation range of quantities per return
    flag (temporal.buishand_range): same one-window-pass + moment
    join shape as snht_test, range over the partial sums with S_0
    included."""
    from padua_spark.operators.temporal import buishand_range

    li = _t(spark, sf, "lineitem")
    return buishand_range(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity",
    )


_TURNING_ORACLE = f"""
WITH base AS ({_SERIES_BASE_SQL}),
tp AS (
  SELECT grp, v,
    lag(v) OVER w2 AS p, lead(v) OVER w2 AS x
  FROM base
  WINDOW w2 AS (PARTITION BY grp ORDER BY t)
),
agg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN p IS NOT NULL AND x IS NOT NULL
      AND ((p < v AND x < v) OR (p > v AND x > v))
      THEN 1 ELSE 0 END) AS BIGINT) AS ntp
  FROM tp GROUP BY 1
),
zc AS (
  SELECT grp, n, ntp, CAST(n AS DOUBLE) AS nd,
    CASE WHEN n >= 4 AND (16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0 > 0
      THEN (CAST(ntp AS DOUBLE)
            - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
        / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0) END AS z
  FROM agg
),
ec AS (
  SELECT *, abs(z) / sqrt(2.0) AS x2,
    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt
  FROM zc
)
SELECT grp AS l_returnflag, n, ntp AS n_turning_points,
  round(2.0 * (nd - 2.0) / 3.0, 6) AS expected,
  round((16.0 * nd - 29.0) / 90.0, 6) AS variance,
  round(z, 6) AS z,
  round(CASE WHEN z IS NOT NULL THEN {_ERFC2_SQL} END, 6) AS p_value
FROM ec
"""


@_q("turning_points_test", _TURNING_ORACLE)
def q_turning_points_test(spark, sf):
    """Turning-points randomness screen of quantities per return flag
    (temporal.turning_points_test): one lag+lead window pass, strict
    interior extrema, Kendall normal approximation."""
    from padua_spark.operators.temporal import turning_points_test

    li = _t(spark, sf, "lineitem")
    return turning_points_test(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity",
    )


_BARTELS_ORACLE = f"""
WITH base AS ({_SERIES_BASE_SQL}),
per AS (
  SELECT grp, v, CAST(count(*) AS BIGINT) AS cnt
  FROM base GROUP BY 1, 2
),
rk AS (
  SELECT grp, v,
    CAST(2 * (sum(cnt) OVER (PARTITION BY grp ORDER BY v
        ROWS UNBOUNDED PRECEDING) - cnt) + cnt + 1 AS DOUBLE)
      / 2.0 AS r
  FROM per
),
j AS (
  SELECT b.grp, b.t, rk.r
  FROM base b JOIN rk ON b.grp = rk.grp AND b.v = rk.v
),
st AS (
  SELECT grp, r,
    lead(r) OVER (PARTITION BY grp ORDER BY t) AS rn
  FROM j
),
agg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
    sum(CASE WHEN rn IS NOT NULL
      THEN (r - rn) * (r - rn) END) AS nm,
    sum(r) AS sr, sum(r * r) AS srr
  FROM st GROUP BY 1
),
zc AS (
  SELECT grp, n, CAST(n AS DOUBLE) AS nd,
    CASE WHEN n >= 3
      AND srr - 2.0 * ((CAST(n AS DOUBLE) + 1.0) / 2.0) * sr
        + CAST(n AS DOUBLE) * ((CAST(n AS DOUBLE) + 1.0) / 2.0)
          * ((CAST(n AS DOUBLE) + 1.0) / 2.0) > 0
      THEN nm / (srr
        - 2.0 * ((CAST(n AS DOUBLE) + 1.0) / 2.0) * sr
        + CAST(n AS DOUBLE) * ((CAST(n AS DOUBLE) + 1.0) / 2.0)
          * ((CAST(n AS DOUBLE) + 1.0) / 2.0)) END AS rvn
  FROM agg
),
zf AS (
  SELECT grp, n, rvn,
    CASE WHEN 4.0 * (nd - 2.0) * (5.0 * nd * nd - 2.0 * nd - 9.0)
      / (5.0 * nd * (nd + 1.0) * (nd - 1.0) * (nd - 1.0)) > 0
      THEN (rvn - 2.0)
        / sqrt(4.0 * (nd - 2.0) * (5.0 * nd * nd - 2.0 * nd - 9.0)
          / (5.0 * nd * (nd + 1.0) * (nd - 1.0) * (nd - 1.0)))
      END AS z
  FROM zc
),
ec AS (
  SELECT *, abs(z) / sqrt(2.0) AS x2,
    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt
  FROM zf
)
SELECT grp AS l_returnflag, n, round(rvn, 6) AS rvn_stat,
  round(z, 6) AS z,
  round(CASE WHEN z IS NOT NULL THEN {_ERFC2_SQL} END, 6) AS p_value
FROM ec
"""


@_q("bartels_rank_test", _BARTELS_ORACLE)
def q_bartels_rank_test(spark, sf):
    """Bartels rank von Neumann randomness test of quantities per
    return flag (temporal.bartels_rank_test): midranks off the
    aggregated value-domain frame (the pettitt contract), one lead
    window pass, one aggregation."""
    from padua_spark.operators.temporal import bartels_rank_test

    li = _t(spark, sf, "lineitem")
    return bartels_rank_test(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity",
    )


_VR_ORACLE = f"""
WITH base AS ({_SERIES_BASE_SQL}),
st AS (
  SELECT grp,
    v - lag(v, 1) OVER w2 AS d1,
    v - lag(v, 4) OVER w2 AS dq
  FROM base
  WINDOW w2 AS (PARTITION BY grp ORDER BY t)
),
agg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
    sum(d1) AS sd, sum(d1 * d1) AS sdd,
    sum(dq * dq) AS sqq, sum(dq) AS sq
  FROM st GROUP BY 1
),
vc AS (
  SELECT grp, n, CAST(n AS DOUBLE) AS nd,
    sd / (CAST(n AS DOUBLE) - 1.0) AS mu,
    (sdd - (CAST(n AS DOUBLE) - 1.0)
      * (sd / (CAST(n AS DOUBLE) - 1.0))
      * (sd / (CAST(n AS DOUBLE) - 1.0)))
      / (CAST(n AS DOUBLE) - 1.0) AS var1,
    sqq, sq
  FROM agg
),
vr AS (
  SELECT grp, n, nd,
    CASE WHEN n > 5 AND var1 > 0 THEN
      ((sqq - 2.0 * 4.0 * mu * sq
        + (nd - 4.0) * 4.0 * 4.0 * mu * mu)
       / (4.0 * (nd - 4.0))) / var1 END AS vrv
  FROM vc
),
zf AS (
  SELECT grp, n, vrv,
    CASE WHEN 2.0 * (2.0 * 4.0 - 1.0) * (4.0 - 1.0)
        / (3.0 * 4.0 * nd) > 0
      THEN (vrv - 1.0)
        / sqrt(2.0 * (2.0 * 4.0 - 1.0) * (4.0 - 1.0)
          / (3.0 * 4.0 * nd)) END AS z
  FROM vr
),
ec AS (
  SELECT *, abs(z) / sqrt(2.0) AS x2,
    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt
  FROM zf
)
SELECT grp AS l_returnflag, n, round(vrv, 6) AS vr_stat,
  round(z, 6) AS z,
  round(CASE WHEN z IS NOT NULL THEN {_ERFC2_SQL} END, 6) AS p_value
FROM ec
"""


@_q("variance_ratio_test", _VR_ORACLE)
def q_variance_ratio_test(spark, sf):
    """Lo-MacKinlay variance ratio (q=4) of quantities per return
    flag (temporal.variance_ratio_test): one lag-1 + lag-4 window
    pass and one aggregation via expanded moments — no join back."""
    from padua_spark.operators.temporal import variance_ratio_test

    li = _t(spark, sf, "lineitem")
    return variance_ratio_test(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity", q=4,
    )


_RECORDS_ORACLE = f"""
WITH base AS ({_SERIES_BASE_SQL}),
st AS (
  SELECT grp, v, t,
    max(v) OVER (PARTITION BY grp ORDER BY t
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax,
    min(v) OVER (PARTITION BY grp ORDER BY t
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmin
  FROM base
),
agg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN pmax IS NOT NULL AND v > pmax
      THEN 1 ELSE 0 END) AS BIGINT) AS nu,
    CAST(sum(CASE WHEN pmin IS NOT NULL AND v < pmin
      THEN 1 ELSE 0 END) AS BIGINT) AS nl,
    sum(CASE WHEN t >= 2 THEN 1.0 / t END) AS e,
    sum(CASE WHEN t >= 2
      THEN 1.0 / t - 1.0 / (t * t) END) AS var
  FROM st GROUP BY 1
),
zf AS (
  SELECT grp, n, nu, nl, e, var,
    CASE WHEN n >= 2 AND var > 0
      THEN (CAST(nu AS DOUBLE) - e) / sqrt(var) END AS zu,
    CASE WHEN n >= 2 AND var > 0
      THEN (CAST(nl AS DOUBLE) - e) / sqrt(var) END AS zl
  FROM agg
),
eu AS (
  SELECT *, abs(zu) / sqrt(2.0) AS x2,
    1.0 / (1.0 + 0.3275911 * (abs(zu) / sqrt(2.0))) AS tt,
    abs(zl) / sqrt(2.0) AS x2l,
    1.0 / (1.0 + 0.3275911 * (abs(zl) / sqrt(2.0))) AS ttl
  FROM zf
)
SELECT grp AS l_returnflag, n, nu AS n_upper_records,
  nl AS n_lower_records,
  round(e, 6) AS expected, round(var, 6) AS variance,
  round(zu, 6) AS z_upper, round(zl, 6) AS z_lower,
  round(CASE WHEN zu IS NOT NULL THEN {_ERFC2_SQL} END, 6)
    AS p_upper,
  round(CASE WHEN zl IS NOT NULL THEN
    (0.254829592 * ttl + -0.284496736 * ttl * ttl
     + 1.421413741 * ttl * ttl * ttl
     + -1.453152027 * ttl * ttl * ttl * ttl
     + 1.061405429 * ttl * ttl * ttl * ttl * ttl)
    * exp(-x2l * x2l) END, 6) AS p_lower
FROM eu
"""


@_q("records_test", _RECORDS_ORACLE)
def q_records_test(spark, sf):
    """Record-counts trend screen of quantities per return flag
    (temporal.records_test): running max/min over the preceding rows
    plus the exact E/Var harmonic terms off the row index, one
    window pass and one aggregation."""
    from padua_spark.operators.temporal import records_test

    li = _t(spark, sf, "lineitem")
    return records_test(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity",
    )



# --- E327-E330 round-12 battery 2: causal / regression closed forms ---------


_IV_WALD_ORACLE = f"""
WITH base AS (
  SELECT l_returnflag AS grp,
    CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END AS z,
    CAST(l_quantity AS DOUBLE) AS x,
    CAST(l_extendedprice AS DOUBLE) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
agg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
    sum(z) AS sz, sum(x) AS sx, sum(y) AS sy,
    sum(z * z) AS szz0, sum(x * x) AS sxx0, sum(y * y) AS syy0,
    sum(z * x) AS szx0, sum(z * y) AS szy0, sum(x * y) AS sxy0
  FROM base GROUP BY 1
),
m AS (
  SELECT grp, n, CAST(n AS DOUBLE) AS nd,
    szz0 - CAST(n AS DOUBLE) * (sz / CAST(n AS DOUBLE))
      * (sz / CAST(n AS DOUBLE)) AS szz,
    sxx0 - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE))
      * (sx / CAST(n AS DOUBLE)) AS sxx,
    syy0 - CAST(n AS DOUBLE) * (sy / CAST(n AS DOUBLE))
      * (sy / CAST(n AS DOUBLE)) AS syy,
    szx0 - CAST(n AS DOUBLE) * (sz / CAST(n AS DOUBLE))
      * (sx / CAST(n AS DOUBLE)) AS szx,
    szy0 - CAST(n AS DOUBLE) * (sz / CAST(n AS DOUBLE))
      * (sy / CAST(n AS DOUBLE)) AS szy,
    sxy0 - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE))
      * (sy / CAST(n AS DOUBLE)) AS sxy
  FROM agg
),
s AS (
  SELECT grp, n, nd, szz, sxx,
    CASE WHEN n >= 3 AND abs(szx) > 0 THEN szy / szx END AS beta,
    szx, sxy, syy
  FROM m
),
s2 AS (
  SELECT grp, n, nd, szz, sxx, szx, beta,
    (syy - 2.0 * beta * sxy + beta * beta * sxx) / (nd - 2.0)
      AS sig2,
    CASE WHEN szz > 0 THEN szx / szz END AS b1,
    sxx - szx * szx / szz AS rss1
  FROM s
),
s3 AS (
  SELECT grp, n, beta,
    CASE WHEN beta IS NOT NULL AND sig2 >= 0
      THEN sqrt(sig2 * szz / (szx * szx)) END AS se,
    CASE WHEN beta IS NOT NULL AND szz > 0 AND rss1 > 0
      THEN b1 * b1 * szz / (rss1 / (nd - 2.0)) END AS fstat
  FROM s2
),
zf AS (
  SELECT grp, n, beta, se, fstat,
    CASE WHEN se > 0 THEN beta / se END AS z
  FROM s3
),
ec AS (
  SELECT *, abs(z) / sqrt(2.0) AS x2,
    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt
  FROM zf
)
SELECT grp AS l_returnflag, n, round(beta, 6) AS beta_iv,
  round(se, 6) AS se, round(z, 6) AS z,
  round(CASE WHEN z IS NOT NULL THEN {_ERFC2_SQL} END, 6)
    AS p_value,
  round(fstat, 6) AS first_stage_f
FROM ec
"""


@_q("iv_wald", _IV_WALD_ORACLE)
def q_iv_wald(spark, sf):
    """One-instrument IV (Wald) slope of price on quantity per return
    flag (stats.iv_wald): one centered-moment aggregation, scalar
    2SLS algebra on the per-group row, first-stage F reported as the
    weak-instrument screen."""
    from padua_spark.operators.stats import iv_wald

    li = _t(spark, sf, "lineitem").where(
        F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    )
    li = li.withColumn(
        "_iv", (F.col("l_quantity") > 25).cast("double")
    )
    return iv_wald(
        li, ["l_returnflag"], "_iv", "l_quantity", "l_extendedprice"
    )


_SOBEL_ORACLE = f"""
WITH base AS (
  SELECT l_returnflag AS grp,
    CAST(l_quantity AS DOUBLE) AS x,
    CAST(l_extendedprice AS DOUBLE) AS m,
    CAST(l_extendedprice AS DOUBLE)
      * (1.0 - CAST(l_discount AS DOUBLE)) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND l_discount IS NOT NULL
),
agg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
    sum(x) AS sx, sum(m) AS sm, sum(y) AS sy,
    sum(x * x) AS sxx0, sum(m * m) AS smm0, sum(y * y) AS syy0,
    sum(x * m) AS sxm0, sum(x * y) AS sxy0, sum(m * y) AS smy0
  FROM base GROUP BY 1
),
c AS (
  SELECT grp, n, CAST(n AS DOUBLE) AS nd,
    sxx0 - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE))
      * (sx / CAST(n AS DOUBLE)) AS sxx,
    smm0 - CAST(n AS DOUBLE) * (sm / CAST(n AS DOUBLE))
      * (sm / CAST(n AS DOUBLE)) AS smm,
    syy0 - CAST(n AS DOUBLE) * (sy / CAST(n AS DOUBLE))
      * (sy / CAST(n AS DOUBLE)) AS syy,
    sxm0 - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE))
      * (sm / CAST(n AS DOUBLE)) AS sxm,
    sxy0 - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE))
      * (sy / CAST(n AS DOUBLE)) AS sxy,
    smy0 - CAST(n AS DOUBLE) * (sm / CAST(n AS DOUBLE))
      * (sy / CAST(n AS DOUBLE)) AS smy
  FROM agg
),
s AS (
  SELECT grp, n, nd, sxx, smm, syy, sxm, sxy, smy,
    sxx * smm - sxm * sxm AS det,
    n >= 4 AND sxx > 0 AND sxx * smm - sxm * sxm > 0 AS ok
  FROM c
),
paths AS (
  SELECT grp, n, nd, sxx, det, ok, sxy,
    CASE WHEN ok THEN sxm / sxx END AS a,
    CASE WHEN ok
      THEN ((smm - sxm * sxm / sxx) / (nd - 2.0)) / sxx END AS s2a,
    CASE WHEN ok THEN (sxx * smy - sxm * sxy) / det END AS b,
    CASE WHEN ok THEN (smm * sxy - sxm * smy) / det END AS bx,
    smy, syy
  FROM s
),
fit AS (
  SELECT grp, n, a, b, s2a,
    CASE WHEN ok
      THEN ((syy - bx * sxy - b * smy) / (nd - 3.0)) * sxx / det
      END AS s2b,
    CASE WHEN ok THEN sxy / sxx END AS c_tot, ok
  FROM paths
),
zf AS (
  SELECT grp, n, a, b, a * b AS indirect, c_tot,
    CASE WHEN ok AND b * b * s2a + a * a * s2b > 0
      THEN a * b / sqrt(b * b * s2a + a * a * s2b) END AS z
  FROM fit
),
ec AS (
  SELECT *, abs(z) / sqrt(2.0) AS x2,
    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt
  FROM zf
)
SELECT grp AS l_returnflag, n, round(a, 6) AS a_path,
  round(b, 6) AS b_path, round(indirect, 6) AS indirect,
  round(c_tot - indirect, 6) AS direct, round(c_tot, 6) AS total,
  round(z, 6) AS sobel_z,
  round(CASE WHEN z IS NOT NULL THEN {_ERFC2_SQL} END, 6) AS p_value
FROM ec
"""


@_q("sobel_mediation", _SOBEL_ORACLE)
def q_sobel_mediation(spark, sf):
    """Mediation of quantity -> list price -> net revenue per return
    flag (stats.sobel_mediation): closed-form a/b paths off one
    centered-moment aggregation, exact OLS effect decomposition,
    Sobel z."""
    from padua_spark.operators.stats import sobel_mediation

    li = _t(spark, sf, "lineitem").where(
        F.col("l_quantity").isNotNull()
        & F.col("l_extendedprice").isNotNull()
        & F.col("l_discount").isNotNull()
    )
    li = li.withColumn(
        "_rev",
        F.col("l_extendedprice").cast("double")
        * (F.lit(1.0) - F.col("l_discount").cast("double")),
    )
    return sobel_mediation(
        li, ["l_returnflag"], "l_quantity", "l_extendedprice", "_rev"
    )


_RDD_ORACLE = f"""
WITH base AS (
  SELECT l_returnflag AS grp,
    CAST(l_quantity AS DOUBLE) - 25.0 AS x,
    CAST(l_extendedprice AS DOUBLE) AS y,
    CASE WHEN CAST(l_quantity AS DOUBLE) >= 25.0
      THEN 1 ELSE 0 END AS s
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    AND CAST(l_quantity AS DOUBLE) >= 15.0
    AND CAST(l_quantity AS DOUBLE) <= 35.0
),
agg AS (
  SELECT grp,
    CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nl,
    sum(CASE WHEN s = 0 THEN x END) AS sxl,
    sum(CASE WHEN s = 0 THEN y END) AS syl,
    sum(CASE WHEN s = 0 THEN x * x END) AS sxxl,
    sum(CASE WHEN s = 0 THEN x * y END) AS sxyl,
    sum(CASE WHEN s = 0 THEN y * y END) AS syyl,
    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nr,
    sum(CASE WHEN s = 1 THEN x END) AS sxr,
    sum(CASE WHEN s = 1 THEN y END) AS syr,
    sum(CASE WHEN s = 1 THEN x * x END) AS sxxr,
    sum(CASE WHEN s = 1 THEN x * y END) AS sxyr,
    sum(CASE WHEN s = 1 THEN y * y END) AS syyr
  FROM base GROUP BY 1
),
sidel AS (
  SELECT grp, nl, nr, sxr, syr, sxxr, sxyr, syyr,
    CAST(nl AS DOUBLE) AS n, sxl / CAST(nl AS DOUBLE) AS mx,
    syl / CAST(nl AS DOUBLE) AS my,
    sxxl - CAST(nl AS DOUBLE) * (sxl / CAST(nl AS DOUBLE))
      * (sxl / CAST(nl AS DOUBLE)) AS sxx,
    sxyl - CAST(nl AS DOUBLE) * (sxl / CAST(nl AS DOUBLE))
      * (syl / CAST(nl AS DOUBLE)) AS sxy,
    syyl - CAST(nl AS DOUBLE) * (syl / CAST(nl AS DOUBLE))
      * (syl / CAST(nl AS DOUBLE)) AS syy
  FROM agg
),
fl AS (
  SELECT grp, nl, nr, sxr, syr, sxxr, sxyr, syyr,
    CASE WHEN nl >= 3 AND sxx > 0
      THEN my - (sxy / sxx) * mx END AS al,
    CASE WHEN nl >= 3 AND sxx > 0
      THEN ((syy - sxy * sxy / sxx) / (n - 2.0))
        * (1.0 / n + mx * mx / sxx) END AS vl
  FROM sidel
),
sider AS (
  SELECT grp, nl, nr, al, vl,
    CAST(nr AS DOUBLE) AS n, sxr / CAST(nr AS DOUBLE) AS mx,
    syr / CAST(nr AS DOUBLE) AS my,
    sxxr - CAST(nr AS DOUBLE) * (sxr / CAST(nr AS DOUBLE))
      * (sxr / CAST(nr AS DOUBLE)) AS sxx,
    sxyr - CAST(nr AS DOUBLE) * (sxr / CAST(nr AS DOUBLE))
      * (syr / CAST(nr AS DOUBLE)) AS sxy,
    syyr - CAST(nr AS DOUBLE) * (syr / CAST(nr AS DOUBLE))
      * (syr / CAST(nr AS DOUBLE)) AS syy
  FROM fl
),
fr AS (
  SELECT grp, nl, nr, al, vl,
    CASE WHEN nr >= 3 AND sxx > 0
      THEN my - (sxy / sxx) * mx END AS ar,
    CASE WHEN nr >= 3 AND sxx > 0
      THEN ((syy - sxy * sxy / sxx) / (n - 2.0))
        * (1.0 / n + mx * mx / sxx) END AS vr
  FROM sider
),
zf AS (
  SELECT grp, nl, nr, al, ar, ar - al AS tau,
    CASE WHEN vl >= 0 AND vr >= 0 THEN sqrt(vl + vr) END AS se
  FROM fr
),
zg AS (
  SELECT *, CASE WHEN se > 0 THEN tau / se END AS z FROM zf
),
ec AS (
  SELECT *, abs(z) / sqrt(2.0) AS x2,
    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt
  FROM zg
)
SELECT grp AS l_returnflag, nl AS n_left, nr AS n_right,
  round(al, 6) AS alpha_left, round(ar, 6) AS alpha_right,
  round(tau, 6) AS tau, round(se, 6) AS se, round(z, 6) AS z,
  round(CASE WHEN z IS NOT NULL THEN {_ERFC2_SQL} END, 6) AS p_value
FROM ec
"""


@_q("rdd_sharp", _RDD_ORACLE)
def q_rdd_sharp(spark, sf):
    """Sharp regression-discontinuity jump in price at the quantity-25
    cutoff per return flag (stats.rdd_sharp): local linear on each
    side within bandwidth 10, one conditional-moment aggregation, no
    join."""
    from padua_spark.operators.stats import rdd_sharp

    li = _t(spark, sf, "lineitem")
    return rdd_sharp(
        li, ["l_returnflag"], "l_quantity", "l_extendedprice",
        cutoff=25.0, bandwidth=10.0,
    )


def _gq_oracle() -> str:
    return f"""
WITH RECURSIVE base AS (
  SELECT l_returnflag AS grp,
    CAST(l_quantity AS DOUBLE) AS x,
    CAST(l_extendedprice AS DOUBLE) AS y,
    CAST(row_number() OVER (PARTITION BY l_returnflag
      ORDER BY l_quantity, l_orderkey, l_linenumber) AS BIGINT)
      AS rn,
    CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS cnt
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
seg AS (
  SELECT *,
    CAST(floor(CAST(cnt AS DOUBLE) * (1.0 - 0.2) / 2.0) AS BIGINT)
      AS nseg
  FROM base
),
agg AS (
  SELECT grp, max(cnt) AS n, max(nseg) AS n_segment,
    CAST(sum(CASE WHEN rn <= nseg THEN 1 ELSE 0 END) AS BIGINT)
      AS nl,
    sum(CASE WHEN rn <= nseg THEN x END) AS sxl,
    sum(CASE WHEN rn <= nseg THEN y END) AS syl,
    sum(CASE WHEN rn <= nseg THEN x * x END) AS sxxl,
    sum(CASE WHEN rn <= nseg THEN x * y END) AS sxyl,
    sum(CASE WHEN rn <= nseg THEN y * y END) AS syyl,
    CAST(sum(CASE WHEN rn > cnt - nseg THEN 1 ELSE 0 END) AS BIGINT)
      AS nh,
    sum(CASE WHEN rn > cnt - nseg THEN x END) AS sxh,
    sum(CASE WHEN rn > cnt - nseg THEN y END) AS syh,
    sum(CASE WHEN rn > cnt - nseg THEN x * x END) AS sxxh,
    sum(CASE WHEN rn > cnt - nseg THEN x * y END) AS sxyh,
    sum(CASE WHEN rn > cnt - nseg THEN y * y END) AS syyh
  FROM seg GROUP BY 1
),
rl AS (
  SELECT grp, n, n_segment, nh, sxh, syh, sxxh, sxyh, syyh,
    CASE WHEN nl >= 3
        AND sxxl - CAST(nl AS DOUBLE) * (sxl / CAST(nl AS DOUBLE))
          * (sxl / CAST(nl AS DOUBLE)) > 0
      THEN (syyl - CAST(nl AS DOUBLE) * (syl / CAST(nl AS DOUBLE))
          * (syl / CAST(nl AS DOUBLE)))
        - (sxyl - CAST(nl AS DOUBLE) * (sxl / CAST(nl AS DOUBLE))
          * (syl / CAST(nl AS DOUBLE)))
          * (sxyl - CAST(nl AS DOUBLE) * (sxl / CAST(nl AS DOUBLE))
          * (syl / CAST(nl AS DOUBLE)))
        / (sxxl - CAST(nl AS DOUBLE) * (sxl / CAST(nl AS DOUBLE))
          * (sxl / CAST(nl AS DOUBLE)))
      END AS rss_lo
  FROM agg
),
rh AS (
  SELECT grp, n, n_segment, rss_lo,
    CASE WHEN nh >= 3
        AND sxxh - CAST(nh AS DOUBLE) * (sxh / CAST(nh AS DOUBLE))
          * (sxh / CAST(nh AS DOUBLE)) > 0
      THEN (syyh - CAST(nh AS DOUBLE) * (syh / CAST(nh AS DOUBLE))
          * (syh / CAST(nh AS DOUBLE)))
        - (sxyh - CAST(nh AS DOUBLE) * (sxh / CAST(nh AS DOUBLE))
          * (syh / CAST(nh AS DOUBLE)))
          * (sxyh - CAST(nh AS DOUBLE) * (sxh / CAST(nh AS DOUBLE))
          * (syh / CAST(nh AS DOUBLE)))
        / (sxxh - CAST(nh AS DOUBLE) * (sxh / CAST(nh AS DOUBLE))
          * (sxh / CAST(nh AS DOUBLE)))
      END AS rss_hi
  FROM rl
),
ff AS (
  SELECT grp, n, n_segment, rss_lo, rss_hi,
    CAST(n_segment - 2 AS DOUBLE) AS dfree,
    CASE WHEN rss_lo > 0 AND rss_hi IS NOT NULL
        AND n_segment - 2 > 0
      THEN (rss_hi / CAST(n_segment - 2 AS DOUBLE))
        / (rss_lo / CAST(n_segment - 2 AS DOUBLE)) END AS f
  FROM rh
),
inp AS (
  SELECT grp AS key,
    CAST(dfree / (dfree + dfree * f) AS DOUBLE) AS x,
    CAST(dfree / 2.0 AS DOUBLE) AS a,
    CAST(dfree / 2.0 AS DOUBLE) AS b
  FROM ff
  WHERE f IS NOT NULL AND dfree > 0 AND f >= 0
),
{_betainc_chain_sql()}
SELECT ff.grp AS l_returnflag, ff.n, ff.n_segment,
  round(ff.f, 6) AS f_stat,
  ff.dfree AS dfn, ff.dfree AS dfd,
  round(pv.p, 6) AS p_value
FROM ff LEFT JOIN pv ON ff.grp = pv.key
"""


@_q("goldfeld_quandt", _gq_oracle())
def q_goldfeld_quandt(spark, sf):
    """Goldfeld-Quandt heteroscedasticity F of price ordered by
    quantity per return flag (stats.goldfeld_quandt): one ordered
    window pass for the segment flags, one conditional-moment
    aggregation, shared Arrow F SF vs the recursive betainc oracle."""
    from padua_spark.operators.stats import goldfeld_quandt

    li = _t(spark, sf, "lineitem")
    out = goldfeld_quandt(
        li, ["l_returnflag"],
        ["l_quantity", "l_orderkey", "l_linenumber"],
        "l_quantity", "l_extendedprice", drop_frac=0.2,
    )
    # raw RSS columns are 1e13-scale price-product sums whose float
    # summation order differs across engines (the money-sum rule) —
    # the gate rides on n / n_segment / F / df / p
    return out.select(
        "l_returnflag", "n", "n_segment", "f_stat", "dfn", "dfd",
        "p_value",
    )



# --- E339-E343 round-12 battery 5: retrieval MRR, cluster validity, ---------
#     frequency / scaling structure ------------------------------------------


def _mrr_oracle(k: int = 10) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
    label AS qlab
  FROM embeddings WHERE vec_id < 5
),
c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv, label AS clab
  FROM embeddings WHERE vec_id >= 5
),
s AS (
  SELECT q.query_id, q.qlab, c.vec_id, c.clab,
    list_dot_product(c.cv, q.qv)
    / (sqrt(list_dot_product(c.cv, c.cv))
       * sqrt(list_dot_product(q.qv, q.qv))) AS cs
  FROM c, q
),
topk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cs DESC, vec_id
    ) AS rn FROM s
  ) WHERE rn <= {k}
),
rk AS (
  SELECT query_id, qlab AS label,
    CASE WHEN clab = qlab THEN 1 ELSE 0 END AS rel,
    row_number() OVER (
      PARTITION BY query_id ORDER BY round(cs, 6) DESC, vec_id
    ) AS r
  FROM topk
)
SELECT query_id, label,
  CAST(min(CASE WHEN rel = 1 THEN r END) AS BIGINT)
    AS first_rel_rank,
  round(CASE WHEN min(CASE WHEN rel = 1 THEN r END) IS NOT NULL
    THEN 1.0 / CAST(min(CASE WHEN rel = 1 THEN r END) AS DOUBLE)
    END, 6) AS reciprocal_rank
FROM rk GROUP BY 1, 2
"""


@_q("retrieval_mrr", _mrr_oracle())
def q_retrieval_mrr(spark, sf):
    """Reciprocal rank @10 of the exact kNN ranking against label
    relevance (similarity.retrieval_mrr_at_k): first-relevant-hit
    depth per query — the navigational-retrieval metric beside
    precision@k and NDCG@k; knn_join keeps the corpus unshuffled."""
    from padua_spark.extensions.similarity import retrieval_mrr_at_k

    emb = _t(spark, sf, "embeddings")
    return retrieval_mrr_at_k(
        emb.filter(F.col("vec_id") >= 5),
        "vec_id",
        "embedding",
        "label",
        emb.filter(F.col("vec_id") < 5),
        k=10,
    )


_DB_INDEX_ORACLE = '\nWITH e AS (\n  SELECT label AS cl,\n    list_transform(CAST(embedding AS DOUBLE[]),\n      x -> CAST(round(x * 1000000) AS BIGINT)) AS mv\n  FROM embeddings\n  WHERE embedding IS NOT NULL AND label IS NOT NULL\n),\ndims AS (SELECT unnest(generate_series(1, 64)) AS i),\ncen AS (\n  SELECT cl, d.i, CAST(sum(mv[d.i]) AS BIGINT) AS s,\n    CAST(count(*) AS BIGINT) AS n\n  FROM e CROSS JOIN dims d GROUP BY 1, 2\n),\nsq AS (\n  SELECT cl, sum(list_reduce(list_prepend(CAST(0 AS HUGEINT),\n    list_transform(mv, x -> CAST(x AS HUGEINT) * x)),\n    (a, b) -> a + b)) AS sq\n  FROM e GROUP BY 1\n),\nclf AS (\n  SELECT cen.cl, max(cen.n) AS n,\n    list(CAST(cen.s AS DOUBLE) / CAST(cen.n AS DOUBLE)\n         ORDER BY cen.i) AS mu,\n    sum(CAST(cen.s AS HUGEINT) * cen.s) AS s2\n  FROM cen GROUP BY 1\n),\ndisp AS (\n  SELECT c.cl, c.n, c.mu,\n    sqrt(greatest((CAST(sq.sq AS DOUBLE)\n      - CAST(c.s2 AS DOUBLE) / CAST(c.n AS DOUBLE))\n      / CAST(c.n AS DOUBLE), 0.0)) / 1000000.0 AS s\n  FROM clf c JOIN sq ON c.cl = sq.cl\n),\npairs AS (\n  SELECT a.cl AS ci, a.n AS ni, a.s AS si, b.s AS sj,\n    sqrt(list_reduce(list_prepend(0.0,\n      list_transform(generate_series(1, 64),\n        i -> (a.mu[i] - b.mu[i]) * (a.mu[i] - b.mu[i]))),\n      (x, y) -> x + y)) / 1000000.0 AS mij\n  FROM disp a JOIN disp b ON a.cl <> b.cl\n),\nperi AS (\n  SELECT ci, max(ni) AS ni,\n    max(CASE WHEN mij > 0 THEN (si + sj) / mij END) AS r\n  FROM pairs GROUP BY 1\n)\nSELECT CAST(sum(ni) AS BIGINT) AS n,\n  CAST(count(*) AS BIGINT) AS k_clusters,\n  round(CASE WHEN count(*) >= 2 THEN avg(r) END, 6) AS db_index\nFROM peri\n'


@_q("davies_bouldin", _DB_INDEX_ORACLE)
def q_davies_bouldin(spark, sf):
    """Davies-Bouldin index of the label clustering over the
    embeddings corpus (similarity.davies_bouldin): micro-unit exact
    centroid sums, q=2 dispersions from pure sums, k^2 pair
    arithmetic on the cluster-count-sized frame only."""
    from padua_spark.extensions.similarity import davies_bouldin

    emb = _t(spark, sf, "embeddings")
    return davies_bouldin(emb, "embedding", "label")


_PERIODOGRAM_ORACLE = '\nWITH base AS (\n  SELECT l_returnflag AS grp, CAST(l_quantity AS DOUBLE) AS v,\n    CAST(row_number() OVER (PARTITION BY l_returnflag\n      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)\n      AS DOUBLE) AS t\n  FROM lineitem WHERE l_quantity IS NOT NULL\n),\nks AS (SELECT unnest(generate_series(1, 32)) AS k),\nnn AS (\n  SELECT grp, CAST(count(*) AS DOUBLE) AS n FROM base GROUP BY 1\n),\nfan AS (\n  SELECT b.grp, b.v, b.t - 1.0 AS t0, k.k\n  FROM base b CROSS JOIN ks k\n),\nper_k AS (\n  SELECT f.grp, f.k, max(nn.n) AS nd,\n    sum(f.v * cos(2.0 * pi() * CAST(f.k AS DOUBLE) * f.t0 / nn.n))\n      AS c,\n    sum(f.v * sin(2.0 * pi() * CAST(f.k AS DOUBLE) * f.t0 / nn.n))\n      AS s\n  FROM fan f JOIN nn ON f.grp = nn.grp\n  GROUP BY 1, 2\n),\nik AS (\n  SELECT grp, k, nd, (c * c + s * s) / nd AS i FROM per_k\n),\nbest AS (\n  SELECT grp, k AS bestk FROM ik\n  QUALIFY row_number() OVER (PARTITION BY grp\n                             ORDER BY i DESC, k ASC) = 1\n),\nagg0 AS (\n  SELECT grp, CAST(max(nd) AS BIGINT) AS n,\n    max(i) AS imax, sum(i) AS itot,\n    sum(CASE WHEN i > 0 THEN i * ln(i) ELSE 0.0 END) AS silog\n  FROM ik GROUP BY 1\n),\nagg AS (\n  SELECT agg0.*, best.bestk FROM agg0 JOIN best ON agg0.grp = best.grp\n)\nSELECT grp AS l_returnflag, n,\n  CASE WHEN n >= 64 AND itot > 0\n    THEN CAST(bestk AS BIGINT) END AS dominant_freq_k,\n  round(CASE WHEN n >= 64 AND itot > 0\n    THEN CAST(n AS DOUBLE) / CAST(bestk AS DOUBLE) END, 6)\n    AS dominant_period,\n  round(CASE WHEN n >= 64 AND itot > 0\n    THEN imax / itot END, 6) AS dominant_share,\n  round(CASE WHEN n >= 64 AND itot > 0\n    THEN ln(itot) - silog / itot END, 6) AS spectral_entropy\nFROM agg\n'


@_q("periodogram", _PERIODOGRAM_ORACLE)
def q_periodogram(spark, sf):
    """Dominant Fourier cycle + spectral entropy of quantities per
    return flag (temporal.periodogram): one ordered window pass, one
    compile-time 32-frequency explode with map-side combine, one
    argmax roll-up — reported spectra are power RATIOS so engine
    libm jitter cancels."""
    from padua_spark.operators.temporal import periodogram

    li = _t(spark, sf, "lineitem")
    return periodogram(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity", max_freq=32,
    )


_HURST_ORACLE = '\nWITH base AS (\n  SELECT l_returnflag AS grp, CAST(l_quantity AS DOUBLE) AS v,\n    CAST(row_number() OVER (PARTITION BY l_returnflag\n      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)\n      AS DOUBLE) AS t\n  FROM lineitem WHERE l_quantity IS NOT NULL\n),\nblk16 AS (\n  SELECT grp, CAST(floor((t - 1.0) / 16) AS BIGINT) AS b,\n    CAST(CAST(t - 1 AS BIGINT) % 16 + 1 AS DOUBLE) AS j, v\n  FROM base\n),\nmk16 AS (\n  SELECT grp, b, j, v,\n    sum(v) OVER (PARTITION BY grp, b ORDER BY j\n      ROWS UNBOUNDED PRECEDING) AS c,\n    avg(v) OVER (PARTITION BY grp, b) AS mu,\n    avg(v * v) OVER (PARTITION BY grp, b) AS m2,\n    count(*) OVER (PARTITION BY grp, b) AS bn\n  FROM blk16\n),\npb16 AS (\n  SELECT grp, b,\n    max(c - j * mu) - min(c - j * mu) AS r,\n    max(m2 - mu * mu) AS var\n  FROM mk16 WHERE bn = 16 GROUP BY 1, 2\n),\nps16 AS (\n  SELECT grp, CAST(16 AS DOUBLE) AS m,\n    avg(r / sqrt(var)) AS rs,\n    CAST(count(*) AS BIGINT) AS nb\n  FROM pb16 WHERE var > 0 GROUP BY 1\n),blk32 AS (\n  SELECT grp, CAST(floor((t - 1.0) / 32) AS BIGINT) AS b,\n    CAST(CAST(t - 1 AS BIGINT) % 32 + 1 AS DOUBLE) AS j, v\n  FROM base\n),\nmk32 AS (\n  SELECT grp, b, j, v,\n    sum(v) OVER (PARTITION BY grp, b ORDER BY j\n      ROWS UNBOUNDED PRECEDING) AS c,\n    avg(v) OVER (PARTITION BY grp, b) AS mu,\n    avg(v * v) OVER (PARTITION BY grp, b) AS m2,\n    count(*) OVER (PARTITION BY grp, b) AS bn\n  FROM blk32\n),\npb32 AS (\n  SELECT grp, b,\n    max(c - j * mu) - min(c - j * mu) AS r,\n    max(m2 - mu * mu) AS var\n  FROM mk32 WHERE bn = 32 GROUP BY 1, 2\n),\nps32 AS (\n  SELECT grp, CAST(32 AS DOUBLE) AS m,\n    avg(r / sqrt(var)) AS rs,\n    CAST(count(*) AS BIGINT) AS nb\n  FROM pb32 WHERE var > 0 GROUP BY 1\n),blk64 AS (\n  SELECT grp, CAST(floor((t - 1.0) / 64) AS BIGINT) AS b,\n    CAST(CAST(t - 1 AS BIGINT) % 64 + 1 AS DOUBLE) AS j, v\n  FROM base\n),\nmk64 AS (\n  SELECT grp, b, j, v,\n    sum(v) OVER (PARTITION BY grp, b ORDER BY j\n      ROWS UNBOUNDED PRECEDING) AS c,\n    avg(v) OVER (PARTITION BY grp, b) AS mu,\n    avg(v * v) OVER (PARTITION BY grp, b) AS m2,\n    count(*) OVER (PARTITION BY grp, b) AS bn\n  FROM blk64\n),\npb64 AS (\n  SELECT grp, b,\n    max(c - j * mu) - min(c - j * mu) AS r,\n    max(m2 - mu * mu) AS var\n  FROM mk64 WHERE bn = 64 GROUP BY 1, 2\n),\nps64 AS (\n  SELECT grp, CAST(64 AS DOUBLE) AS m,\n    avg(r / sqrt(var)) AS rs,\n    CAST(count(*) AS BIGINT) AS nb\n  FROM pb64 WHERE var > 0 GROUP BY 1\n),blk128 AS (\n  SELECT grp, CAST(floor((t - 1.0) / 128) AS BIGINT) AS b,\n    CAST(CAST(t - 1 AS BIGINT) % 128 + 1 AS DOUBLE) AS j, v\n  FROM base\n),\nmk128 AS (\n  SELECT grp, b, j, v,\n    sum(v) OVER (PARTITION BY grp, b ORDER BY j\n      ROWS UNBOUNDED PRECEDING) AS c,\n    avg(v) OVER (PARTITION BY grp, b) AS mu,\n    avg(v * v) OVER (PARTITION BY grp, b) AS m2,\n    count(*) OVER (PARTITION BY grp, b) AS bn\n  FROM blk128\n),\npb128 AS (\n  SELECT grp, b,\n    max(c - j * mu) - min(c - j * mu) AS r,\n    max(m2 - mu * mu) AS var\n  FROM mk128 WHERE bn = 128 GROUP BY 1, 2\n),\nps128 AS (\n  SELECT grp, CAST(128 AS DOUBLE) AS m,\n    avg(r / sqrt(var)) AS rs,\n    CAST(count(*) AS BIGINT) AS nb\n  FROM pb128 WHERE var > 0 GROUP BY 1\n),blk256 AS (\n  SELECT grp, CAST(floor((t - 1.0) / 256) AS BIGINT) AS b,\n    CAST(CAST(t - 1 AS BIGINT) % 256 + 1 AS DOUBLE) AS j, v\n  FROM base\n),\nmk256 AS (\n  SELECT grp, b, j, v,\n    sum(v) OVER (PARTITION BY grp, b ORDER BY j\n      ROWS UNBOUNDED PRECEDING) AS c,\n    avg(v) OVER (PARTITION BY grp, b) AS mu,\n    avg(v * v) OVER (PARTITION BY grp, b) AS m2,\n    count(*) OVER (PARTITION BY grp, b) AS bn\n  FROM blk256\n),\npb256 AS (\n  SELECT grp, b,\n    max(c - j * mu) - min(c - j * mu) AS r,\n    max(m2 - mu * mu) AS var\n  FROM mk256 WHERE bn = 256 GROUP BY 1, 2\n),\nps256 AS (\n  SELECT grp, CAST(256 AS DOUBLE) AS m,\n    avg(r / sqrt(var)) AS rs,\n    CAST(count(*) AS BIGINT) AS nb\n  FROM pb256 WHERE var > 0 GROUP BY 1\n),\nscales AS (SELECT * FROM ps16 UNION ALL SELECT * FROM ps32 UNION ALL SELECT * FROM ps64 UNION ALL SELECT * FROM ps128 UNION ALL SELECT * FROM ps256),\npts AS (\n  SELECT grp, ln(m) AS lx, ln(rs) AS ly\n  FROM scales WHERE rs > 0 AND nb >= 1\n),\nfit AS (\n  SELECT grp, CAST(count(*) AS BIGINT) AS n_scales,\n    sum(lx) AS sx, sum(ly) AS sy,\n    sum(lx * lx) AS sxx0, sum(lx * ly) AS sxy0\n  FROM pts GROUP BY 1\n),\nnr AS (\n  SELECT grp, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1\n)\nSELECT nr.grp AS l_returnflag, nr.n,\n  COALESCE(fit.n_scales, 0) AS n_scales,\n  round(CASE WHEN fit.n_scales >= 2\n      AND sxx0 - sx * sx / CAST(fit.n_scales AS DOUBLE) > 0\n    THEN (sxy0 - sx * sy / CAST(fit.n_scales AS DOUBLE))\n      / (sxx0 - sx * sx / CAST(fit.n_scales AS DOUBLE)) END, 6)\n    AS hurst\nFROM nr LEFT JOIN fit ON nr.grp = fit.grp\n'


@_q("hurst_rs", _HURST_ORACLE)
def q_hurst_rs(spark, sf):
    """Rescaled-range Hurst exponent of quantities per return flag
    (temporal.hurst_rs): per dyadic scale one (group, block)-
    partitioned window pass with the S_j = C_j - j*mean identity (no
    join), compile-time scale union, log-log OLS on the
    scales-count-sized frame."""
    from padua_spark.operators.temporal import hurst_rs

    li = _t(spark, sf, "lineitem")
    return hurst_rs(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity",
    )


_HAAR_ORACLE = '\nWITH base AS (\n  SELECT l_returnflag AS grp, CAST(l_quantity AS DOUBLE) AS v,\n    CAST(row_number() OVER (PARTITION BY l_returnflag\n      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)\n      AS DOUBLE) AS t\n  FROM lineitem WHERE l_quantity IS NOT NULL\n),\nlv AS (SELECT unnest(generate_series(1, 6)) AS l),\nfan AS (\n  SELECT b.grp, b.v, CAST(b.t - 1 AS BIGINT) AS t0, lv.l,\n    CAST(power(2, lv.l) AS BIGINT) AS bs, nn.n\n  FROM base b CROSS JOIN lv\n  JOIN (SELECT grp, CAST(count(*) AS BIGINT) AS n\n        FROM base GROUP BY 1) nn ON b.grp = nn.grp\n),\nmarked AS (\n  SELECT grp, l, bs, v,\n    CAST(floor(CAST(t0 AS DOUBLE) / bs) AS BIGINT) AS b,\n    CAST(1 - 2 * CAST(floor(CAST(t0 % bs AS DOUBLE)\n      / (CAST(bs AS DOUBLE) / 2.0)) AS BIGINT) AS DOUBLE) AS sgn,\n    CAST(floor(CAST(n AS DOUBLE) / bs) AS BIGINT) AS nfull\n  FROM fan\n),\nper_block AS (\n  SELECT grp, l, b, max(bs) AS bs,\n    sum(sgn * v) AS dsum\n  FROM marked WHERE b < nfull GROUP BY 1, 2, 3\n),\nper_level AS (\n  SELECT grp, l, CAST(max(bs) AS BIGINT) AS block_size,\n    CAST(count(*) AS BIGINT) AS n_blocks,\n    sum((dsum / CAST(bs AS DOUBLE))\n      * (dsum / CAST(bs AS DOUBLE))) AS e\n  FROM per_block GROUP BY 1, 2\n)\nSELECT grp AS l_returnflag, CAST(l AS BIGINT) AS level, block_size,\n  n_blocks, round(e, 6) AS energy,\n  round(CASE WHEN sum(e) OVER (PARTITION BY grp) > 0\n    THEN e / sum(e) OVER (PARTITION BY grp) END, 6)\n    AS energy_share\nFROM per_level\n'


@_q("haar_energy", _HAAR_ORACLE)
def q_haar_energy(spark, sf):
    """Haar detail energy by dyadic level of quantities per return
    flag (temporal.haar_energy): one compile-time 6-level explode
    with map-side combine to (group, level, block), one block
    aggregation, one level roll-up."""
    from padua_spark.operators.temporal import haar_energy

    li = _t(spark, sf, "lineitem")
    return haar_energy(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity", max_level=6,
    )



# --- E331-E334 round-12 battery 3: lexical richness, SRM, robust corr -------


_LEXICAL_ORACLE = """
WITH toks AS (
  SELECT grp, tok, CAST(count(*) AS BIGINT) AS m
  FROM (
    SELECT lang AS grp, unnest(list_filter(
      string_split_regex(lower(trim(text)), '\\s+'),
      x -> x <> '')) AS tok
    FROM documents WHERE text IS NOT NULL
  ) GROUP BY 1, 2
),
fof AS (
  SELECT grp, m, CAST(count(*) AS BIGINT) AS vm
  FROM toks GROUP BY 1, 2
),
agg AS (
  SELECT grp, CAST(sum(m * vm) AS BIGINT) AS n_tokens,
    CAST(sum(vm) AS BIGINT) AS n_types,
    CAST(COALESCE(sum(CASE WHEN m = 1 THEN vm END), 0) AS BIGINT)
      AS v1,
    sum(CAST(m AS HUGEINT) * m * vm) AS s2
  FROM fof GROUP BY 1
),
s AS (
  SELECT grp, n_tokens, n_types, v1,
    CAST(n_tokens AS DOUBLE) AS nd, CAST(n_types AS DOUBLE) AS vd,
    CAST(v1 AS DOUBLE) AS v1d, CAST(s2 AS DOUBLE) AS s2d
  FROM agg
)
SELECT grp AS lang, n_tokens, n_types, v1 AS n_hapax,
  round(CASE WHEN nd > 0
    THEN 1e4 * (s2d - nd) / (nd * nd) END, 6) AS yules_k,
  round(CASE WHEN s2d - vd > 0
    THEN vd * vd / (s2d - vd) END, 6) AS yules_i,
  round(CASE WHEN nd > 1 AND vd > 0
    THEN ln(vd) / ln(nd) END, 6) AS herdan_c,
  round(CASE WHEN nd > 0 THEN vd / sqrt(nd) END, 6) AS guiraud_r,
  round(CASE WHEN nd > 1 AND vd > 0 AND v1d < vd
    THEN 1e2 * ln(nd) / (1.0 - v1d / vd) END, 6) AS honore_h
FROM s
"""


@_q("lexical_constants", _LEXICAL_ORACLE)
def q_lexical_constants(spark, sf):
    """Yule's K/I, Herdan's C, Guiraud's R and Honore's H per
    language (text.lexical_constants): one token aggregation, one
    count-of-counts roll-up to the count-domain frame, one
    aggregation — integers until the final divisions."""
    from padua_spark.extensions.text import lexical_constants

    d = _t(spark, sf, "documents")
    return lexical_constants(d, ["lang"], "text")


_RICHNESS_ORACLE = """
WITH toks AS (
  SELECT grp, tok, CAST(count(*) AS BIGINT) AS m
  FROM (
    SELECT lang AS grp, unnest(list_filter(
      string_split_regex(lower(trim(text)), '\\s+'),
      x -> x <> '')) AS tok
    FROM documents WHERE text IS NOT NULL
  ) GROUP BY 1, 2
),
fof AS (
  SELECT grp, m, CAST(count(*) AS BIGINT) AS vm
  FROM toks GROUP BY 1, 2
),
agg AS (
  SELECT grp, CAST(sum(m * vm) AS BIGINT) AS n_tokens,
    CAST(sum(vm) AS BIGINT) AS n_types,
    CAST(COALESCE(sum(CASE WHEN m = 1 THEN vm END), 0) AS BIGINT)
      AS f1,
    CAST(COALESCE(sum(CASE WHEN m = 2 THEN vm END), 0) AS BIGINT)
      AS f2,
    CAST(COALESCE(sum(CASE WHEN m <= 10 THEN vm END), 0) AS BIGINT)
      AS srare,
    CAST(COALESCE(sum(CASE WHEN m <= 10 THEN m * vm END), 0)
      AS BIGINT) AS nrare,
    CAST(COALESCE(sum(CASE WHEN m <= 10 THEN m * (m - 1) * vm END),
      0) AS BIGINT) AS mm1
  FROM fof GROUP BY 1
),
s AS (
  SELECT grp, n_tokens, n_types, f1, f2,
    CAST(n_tokens AS DOUBLE) AS nd, CAST(n_types AS DOUBLE) AS vd,
    CAST(f1 AS DOUBLE) AS f1d, CAST(f2 AS DOUBLE) AS f2d,
    CAST(srare AS DOUBLE) AS srared,
    CAST(nrare AS DOUBLE) AS nrared, CAST(mm1 AS DOUBLE) AS mm1d,
    nrare AS nrare_i
  FROM agg
),
calc AS (
  SELECT grp, n_tokens, n_types, f1, f2,
    vd + f1d * (f1d - 1.0) / (2.0 * (f2d + 1.0)) AS chao1,
    vd + f1d * (nd - 1.0) / nd AS jack1,
    1.0 - f1d / nrared AS cace,
    vd - srared AS sabund, srared, nrared, mm1d, f1d, nrare_i
  FROM s
)
SELECT grp AS lang, n_tokens, n_types, f1, f2,
  round(chao1, 6) AS chao1,
  round(jack1, 6) AS jackknife1,
  round(CASE WHEN nrare_i > 1 AND cace > 0
    THEN sabund + srared / cace + (f1d / cace)
      * greatest(0.0,
          srared * mm1d / (cace * nrared * (nrared - 1.0)) - 1.0)
    END, 6) AS ace
FROM calc
"""


@_q("richness_estimators", _RICHNESS_ORACLE)
def q_richness_estimators(spark, sf):
    """Chao1 / first-order jackknife / ACE vocabulary-richness
    estimators per language (text.richness_estimators): the same
    count-domain plan as lexical_constants with the rare-type
    (m <= 10) conditional sums."""
    from padua_spark.extensions.text import richness_estimators

    d = _t(spark, sf, "documents")
    return richness_estimators(d, ["lang"], "text")


def _srm_oracle() -> str:
    import math

    g32 = math.factorial(2) * math.sqrt(math.pi) / 4.0
    return f"""
WITH base AS (
  SELECT event_type AS grp, user_id % 4 AS a
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    AND user_id % 4 IN (0, 1, 2, 3)
),
agg AS (
  SELECT grp,
    CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
    CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN a = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(sum(CASE WHEN a = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
  FROM base GROUP BY 1
),
s AS (
  SELECT grp, n0, n1, n2, n3, n0 + n1 + n2 + n3 AS n,
    CAST(n0 + n1 + n2 + n3 AS DOUBLE) AS nd
  FROM agg
),
c AS (
  SELECT grp, n, n0, n1, n2, n3,
    CASE WHEN n > 0 THEN
      (CAST(n0 AS DOUBLE) - 0.25 * nd) * (CAST(n0 AS DOUBLE)
        - 0.25 * nd) / (0.25 * nd)
      + (CAST(n1 AS DOUBLE) - 0.25 * nd) * (CAST(n1 AS DOUBLE)
        - 0.25 * nd) / (0.25 * nd)
      + (CAST(n2 AS DOUBLE) - 0.25 * nd) * (CAST(n2 AS DOUBLE)
        - 0.25 * nd) / (0.25 * nd)
      + (CAST(n3 AS DOUBLE) - 0.25 * nd) * (CAST(n3 AS DOUBLE)
        - 0.25 * nd) / (0.25 * nd)
    END AS chi2
  FROM s
),
pc AS (
  SELECT *, sqrt(chi2) / sqrt(2.0) AS x2,
    1.0 / (1.0 + 0.3275911 * (sqrt(chi2) / sqrt(2.0))) AS tt
  FROM c
)
SELECT grp AS event_type, n, n0 AS n_arm_0, n1 AS n_arm_1,
  n2 AS n_arm_2, n3 AS n_arm_3,
  round(chi2, 6) AS chi2, CAST(3 AS BIGINT) AS df,
  round(CASE WHEN chi2 IS NOT NULL THEN least(1.0,
    {_ERFC2_SQL}
    + exp(-chi2 / 2.0) * power(chi2 / 2.0, 0.5)
      / CAST({g32!r} AS DOUBLE)) END, 6) AS p_value,
  CASE WHEN chi2 IS NOT NULL THEN
    least(1.0, {_ERFC2_SQL}
      + exp(-chi2 / 2.0) * power(chi2 / 2.0, 0.5)
        / CAST({g32!r} AS DOUBLE)) < 0.01 END AS srm_flag_1pct
FROM pc
"""


@_q("srm_check", _srm_oracle())
def q_srm_check(spark, sf):
    """Sample-ratio-mismatch chi-square of the user_id%4 arm split
    per event type (features.srm_check): declared arms as
    conditional-sum columns in ONE aggregation, closed-form df=3
    chi-square SF shared verbatim with the oracle."""
    from padua_spark.extensions.features import srm_check

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    e = e.withColumn("_arm", F.col("user_id") % 4)
    return srm_check(
        e, ["event_type"], "_arm", [0, 1, 2, 3]
    )


def _winsor_corr_oracle() -> str:
    return f"""
WITH RECURSIVE b AS (
  SELECT l_returnflag AS grp,
    quantile_cont(CAST(l_quantity AS DOUBLE), 0.1) AS xlo,
    quantile_cont(CAST(l_quantity AS DOUBLE), 0.9) AS xhi,
    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.1) AS ylo,
    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9) AS yhi
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY 1
),
w AS (
  SELECT l.l_returnflag AS grp,
    least(greatest(CAST(l.l_quantity AS DOUBLE), b.xlo), b.xhi)
      AS wx,
    least(greatest(CAST(l.l_extendedprice AS DOUBLE), b.ylo), b.yhi)
      AS wy
  FROM lineitem l JOIN b ON l.l_returnflag = b.grp
  WHERE l.l_quantity IS NOT NULL AND l.l_extendedprice IS NOT NULL
),
agg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
    sum(wx) AS sx, sum(wy) AS sy, sum(wx * wx) AS sxx0,
    sum(wy * wy) AS syy0, sum(wx * wy) AS sxy0
  FROM w GROUP BY 1
),
m AS (
  SELECT grp, n, CAST(n AS DOUBLE) AS nd,
    sxx0 - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE))
      * (sx / CAST(n AS DOUBLE)) AS sxx,
    syy0 - CAST(n AS DOUBLE) * (sy / CAST(n AS DOUBLE))
      * (sy / CAST(n AS DOUBLE)) AS syy,
    sxy0 - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE))
      * (sy / CAST(n AS DOUBLE)) AS sxy,
    n - 2 * CAST(floor(0.1 * CAST(n AS DOUBLE)) AS BIGINT) AS h
  FROM agg
),
rr AS (
  SELECT grp, n, h, CAST(h AS DOUBLE) AS hd,
    CASE WHEN sxx > 0 AND syy > 0
      THEN sxy / sqrt(sxx * syy) END AS r
  FROM m
),
tt0 AS (
  SELECT grp, n, h, r,
    CASE WHEN h >= 3 AND r IS NOT NULL AND abs(r) < 1.0
      THEN r * sqrt(hd - 2.0) / sqrt(1.0 - r * r) END AS t,
    hd
  FROM rr
),
inp AS (
  SELECT grp AS key,
    CAST((hd - 2.0) / ((hd - 2.0) + t * t) AS DOUBLE) AS x,
    CAST((hd - 2.0) / 2.0 AS DOUBLE) AS a,
    CAST(0.5 AS DOUBLE) AS b
  FROM tt0 WHERE t IS NOT NULL AND hd - 2.0 > 0
),
{_betainc_chain_sql()}
SELECT t0.grp AS l_returnflag, t0.n, t0.h AS h_eff,
  round(t0.r, 6) AS r_winsorized, round(t0.t, 6) AS t_stat,
  round(pv.p, 6) AS p_value
FROM tt0 t0 LEFT JOIN pv ON t0.grp = pv.key
"""


@_q("winsorized_correlation", _winsor_corr_oracle())
def q_winsorized_correlation(spark, sf):
    """Winsorized Pearson correlation of quantity vs price per return
    flag (stats.winsorized_correlation): exact percentile bounds
    broadcast back, one moment aggregation on the clamped pairs,
    effective-df t vs the recursive-betainc oracle."""
    from padua_spark.operators.stats import winsorized_correlation

    li = _t(spark, sf, "lineitem")
    return winsorized_correlation(
        li, ["l_returnflag"], "l_quantity", "l_extendedprice",
        trim=0.1,
    )



# --- E335-E338 round-12 battery 4: graph shape, AMS sketch, windowed SRM ----


_RECIPROCITY_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
    lead(event_type) OVER (PARTITION BY user_id
      ORDER BY ts, event_id) AS nxt
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL
),
e AS (
  SELECT DISTINCT event_type AS s, nxt AS d
  FROM seq WHERE nxt IS NOT NULL AND event_type <> nxt
),
r AS (
  SELECT count(*) AS n_recip FROM e
  WHERE EXISTS (SELECT 1 FROM e e2 WHERE e2.s = e.d AND e2.d = e.s)
)
SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
  CAST(r.n_recip AS BIGINT) AS n_reciprocal,
  round(CASE WHEN (SELECT count(*) FROM e) > 0
    THEN CAST(r.n_recip AS DOUBLE)
      / CAST((SELECT count(*) FROM e) AS DOUBLE) END, 6)
    AS reciprocity
FROM r
"""


@_q("edge_reciprocity", _RECIPROCITY_ORACLE)
def q_edge_reciprocity(spark, sf):
    """Reciprocity of the event-type transition graph
    (graph.edge_reciprocity): consecutive per-user event types form
    directed edges; one distinct, one reversed LEFT SEMI self-join,
    one count — separates UI oscillation loops from one-way
    funnels."""
    from pyspark.sql import Window as W

    from padua_spark.extensions.graph import edge_reciprocity

    e = _t(spark, sf, "events").where(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type", 1).over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    return edge_reciprocity(trans, "src", "dst")


_POWERLAW_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS sn,
    'c' || CAST(o_custkey AS VARCHAR) AS cn
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e AS (
  SELECT sn AS s, cn AS d FROM pairs
  UNION ALL
  SELECT cn AS s, sn AS d FROM pairs
),
deg AS (
  SELECT s, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
    CAST(sum(CASE WHEN deg >= 5 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_tail,
    avg(CAST(deg AS DOUBLE)) AS mean_deg,
    max(deg) AS max_degree,
    sum(CASE WHEN deg >= 5
      THEN ln(CAST(deg AS DOUBLE) / 5.0) END) AS slog
  FROM deg
)
SELECT n_nodes, n_tail, CAST(5 AS BIGINT) AS d_min,
  round(mean_deg, 6) AS mean_degree, max_degree,
  round(CASE WHEN n_tail > 0 AND slog > 0
    THEN 1.0 + CAST(n_tail AS DOUBLE) / slog END, 6) AS alpha_hill,
  round(CASE WHEN n_tail > 0 AND slog > 0
    THEN (1.0 + CAST(n_tail AS DOUBLE) / slog - 1.0)
      / sqrt(CAST(n_tail AS DOUBLE)) END, 6) AS alpha_se
FROM agg
"""


@_q("degree_powerlaw", _POWERLAW_ORACLE)
def q_degree_powerlaw(spark, sf):
    """Hill power-law exponent of the symmetrized trade-graph degree
    distribution (graph.degree_powerlaw): one degree aggregation and
    one moment aggregation over the node-sized frame."""
    from padua_spark.extensions.graph import degree_powerlaw

    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    okeys = F.broadcast(o.select("o_orderkey", "o_custkey"))
    und = (
        li.select("l_orderkey", "l_suppkey")
        .join(okeys, li["l_orderkey"] == okeys["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("sn"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cn"),
        )
        .distinct()
    )
    edges = und.select(
        F.col("sn").alias("src"), F.col("cn").alias("dst")
    ).unionAll(
        und.select(F.col("cn").alias("src"), F.col("sn").alias("dst"))
    )
    return degree_powerlaw(edges, "src", "dst", d_min=5)


def _ams_oracle(n_estimators: int = 16) -> str:
    from padua_spark.extensions.dedup import _affine_constants

    lines = ", ".join(
        f"({j}, CAST({a} AS BIGINT), CAST({b} AS BIGINT))"
        for j, (a, b) in enumerate(_affine_constants(n_estimators))
    )
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '),
                            t -> t <> '')) AS token
  FROM documents WHERE text IS NOT NULL
),
tc AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1
),
th AS (
  SELECT c, list_reduce(
    list_prepend(CAST(7 AS BIGINT),
      list_transform(list_filter(string_split(token, ''),
                                 ch -> ch <> ''),
                     ch -> CAST(ord(ch) AS BIGINT))),
    (acc, ch) -> (acc * 131 + ch) % 2147483647) AS h
  FROM tc
),
lines(j, a, b) AS (VALUES {lines}),
z AS (
  SELECT l.j,
    CAST(sum((1 - 2 * ((th.h * l.a + l.b) % 2147483647 % 2)) * th.c)
      AS BIGINT) AS zj
  FROM th, lines l GROUP BY 1
),
base AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
    CAST(count(*) AS BIGINT) AS n_types,
    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS f2
  FROM tc
),
est AS (
  SELECT CAST(sum(CAST(zj AS HUGEINT) * zj) AS DOUBLE)
    / {float(n_estimators)} AS f2_est
  FROM z
)
SELECT b.n_tokens, b.n_types,
  CAST(b.f2 AS DOUBLE) AS f2_exact,
  round(e.f2_est, 6) AS f2_estimate,
  round(CASE WHEN CAST(b.f2 AS DOUBLE) > 0
    THEN abs(e.f2_est - CAST(b.f2 AS DOUBLE))
      / CAST(b.f2 AS DOUBLE) END, 6) AS rel_error
FROM base b, est e
"""


@_q("ams_f2_sketch", _ams_oracle())
def q_ams_f2_sketch(spark, sf):
    """AMS F2 sketch of the corpus token-frequency vector vs the
    exact second moment (sketches.ams_f2_sketch): 16 deterministic
    sign-hash counters in ONE aggregation over the (token, count)
    frame — the self-join-size estimator, hash-checkable because
    both engines build the same sketch."""
    from padua_spark.extensions.sketches import ams_f2_sketch

    d = _t(spark, sf, "documents")
    return ams_f2_sketch(d, "text", n_estimators=16)


def _windowed_srm_oracle() -> str:
    import math

    g32 = math.factorial(2) * math.sqrt(math.pi) / 4.0
    return f"""
WITH base AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600 AS ws, user_id % 4 AS a
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
    AND user_id % 4 IN (0, 1, 2, 3)
),
agg AS (
  SELECT ws,
    CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
    CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN a = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(sum(CASE WHEN a = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
  FROM base GROUP BY 1
),
s AS (
  SELECT ws, n0, n1, n2, n3, n0 + n1 + n2 + n3 AS n,
    CAST(n0 + n1 + n2 + n3 AS DOUBLE) AS nd
  FROM agg
),
c AS (
  SELECT ws, n, n0, n1, n2, n3,
    CASE WHEN n > 0 THEN
      (CAST(n0 AS DOUBLE) - 0.25 * nd) * (CAST(n0 AS DOUBLE)
        - 0.25 * nd) / (0.25 * nd)
      + (CAST(n1 AS DOUBLE) - 0.25 * nd) * (CAST(n1 AS DOUBLE)
        - 0.25 * nd) / (0.25 * nd)
      + (CAST(n2 AS DOUBLE) - 0.25 * nd) * (CAST(n2 AS DOUBLE)
        - 0.25 * nd) / (0.25 * nd)
      + (CAST(n3 AS DOUBLE) - 0.25 * nd) * (CAST(n3 AS DOUBLE)
        - 0.25 * nd) / (0.25 * nd)
    END AS chi2
  FROM s
),
pc AS (
  SELECT *, sqrt(chi2) / sqrt(2.0) AS x2,
    1.0 / (1.0 + 0.3275911 * (sqrt(chi2) / sqrt(2.0))) AS tt
  FROM c
)
SELECT ws AS window_start_epoch, n, n0 AS n_arm_0, n1 AS n_arm_1,
  n2 AS n_arm_2, n3 AS n_arm_3,
  round(chi2, 6) AS chi2, CAST(3 AS BIGINT) AS df,
  round(CASE WHEN chi2 IS NOT NULL THEN least(1.0,
    {_ERFC2_SQL}
    + exp(-chi2 / 2.0) * power(chi2 / 2.0, 0.5)
      / CAST({g32!r} AS DOUBLE)) END, 6) AS p_value,
  CASE WHEN chi2 IS NOT NULL THEN
    least(1.0, {_ERFC2_SQL}
      + exp(-chi2 / 2.0) * power(chi2 / 2.0, 0.5)
        / CAST({g32!r} AS DOUBLE)) < 0.01 END AS srm_flag_1pct
FROM pc
"""


@_q("windowed_srm", _windowed_srm_oracle())
def q_windowed_srm(spark, sf):
    """Per-hour sample-ratio-mismatch monitor on the user_id%4 arms
    (streaming.windowed_srm): declared arms as conditional-sum
    columns in ONE stateful aggregation, chi-square + closed-form
    df=3 SF as per-row expressions on the window row."""
    from padua_spark.streaming import windowed_srm

    e = _t(spark, sf, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    out = windowed_srm(
        e,
        _events_event_time(spark, sf),
        F.col("user_id") % 4,
        [0, 1, 2, 3],
        window_duration="1 hour",
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "n", "n_arm_0", "n_arm_1", "n_arm_2", "n_arm_3",
        "chi2", "df", "p_value", "srm_flag_1pct",
    )



# --- E344-E347 round-12 battery 6: Kuiper, MDE-mean, Bloom audit, -----------
#     windowed binned Gini ----------------------------------------------------


_KUIPER_ORACLE = "\nWITH per AS (\n  SELECT l_quantity AS v,\n    CAST(count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS BIGINT)\n      AS ca,\n    CAST(count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT)\n      AS cb\n  FROM lineitem\n  WHERE l_returnflag IN ('A', 'R') AND l_quantity IS NOT NULL\n  GROUP BY 1\n),\nstepped AS (\n  SELECT v, ca, cb,\n    sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fa,\n    sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fb,\n    sum(ca) OVER () AS na, sum(cb) OVER () AS nb\n  FROM per\n),\nagg AS (\n  SELECT CAST(max(na) AS BIGINT) AS n_a,\n    CAST(max(nb) AS BIGINT) AS n_b,\n    max(CAST(fa AS DOUBLE) / CAST(na AS DOUBLE)\n        - CAST(fb AS DOUBLE) / CAST(nb AS DOUBLE)) AS dp,\n    max(CAST(fb AS DOUBLE) / CAST(nb AS DOUBLE)\n        - CAST(fa AS DOUBLE) / CAST(na AS DOUBLE)) AS dm\n  FROM stepped\n),\nlamc AS (\n  SELECT *, dp + dm AS v_stat,\n    (sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)\n      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) + 0.155\n     + 0.24 / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)\n      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))))\n    * (dp + dm) AS lam\n  FROM agg\n)\nSELECT n_a, n_b, round(dp, 6) AS d_plus, round(dm, 6) AS d_minus,\n  round(v_stat, 6) AS v_stat,\n  round(CASE WHEN n_a > 0 AND n_b > 0 THEN\n    CASE WHEN lam < 0.4 THEN 1.0\n    ELSE least(1.0, greatest(0.0, 2.0 * ((4.0 * 1.0 * lam * lam - 1.0) * exp(-2.0 * 1.0 * lam * lam) + (4.0 * 4.0 * lam * lam - 1.0) * exp(-2.0 * 4.0 * lam * lam) + (4.0 * 9.0 * lam * lam - 1.0) * exp(-2.0 * 9.0 * lam * lam) + (4.0 * 16.0 * lam * lam - 1.0) * exp(-2.0 * 16.0 * lam * lam) + (4.0 * 25.0 * lam * lam - 1.0) * exp(-2.0 * 25.0 * lam * lam) + (4.0 * 36.0 * lam * lam - 1.0) * exp(-2.0 * 36.0 * lam * lam) + (4.0 * 49.0 * lam * lam - 1.0) * exp(-2.0 * 49.0 * lam * lam) + (4.0 * 64.0 * lam * lam - 1.0) * exp(-2.0 * 64.0 * lam * lam) + (4.0 * 81.0 * lam * lam - 1.0) * exp(-2.0 * 81.0 * lam * lam) + (4.0 * 100.0 * lam * lam - 1.0) * exp(-2.0 * 100.0 * lam * lam) + (4.0 * 121.0 * lam * lam - 1.0) * exp(-2.0 * 121.0 * lam * lam) + (4.0 * 144.0 * lam * lam - 1.0) * exp(-2.0 * 144.0 * lam * lam) + (4.0 * 169.0 * lam * lam - 1.0) * exp(-2.0 * 169.0 * lam * lam) + (4.0 * 196.0 * lam * lam - 1.0) * exp(-2.0 * 196.0 * lam * lam) + (4.0 * 225.0 * lam * lam - 1.0) * exp(-2.0 * 225.0 * lam * lam) + (4.0 * 256.0 * lam * lam - 1.0) * exp(-2.0 * 256.0 * lam * lam) + (4.0 * 289.0 * lam * lam - 1.0) * exp(-2.0 * 289.0 * lam * lam) + (4.0 * 324.0 * lam * lam - 1.0) * exp(-2.0 * 324.0 * lam * lam) + (4.0 * 361.0 * lam * lam - 1.0) * exp(-2.0 * 361.0 * lam * lam) + (4.0 * 400.0 * lam * lam - 1.0) * exp(-2.0 * 400.0 * lam * lam) + (4.0 * 441.0 * lam * lam - 1.0) * exp(-2.0 * 441.0 * lam * lam) + (4.0 * 484.0 * lam * lam - 1.0) * exp(-2.0 * 484.0 * lam * lam) + (4.0 * 529.0 * lam * lam - 1.0) * exp(-2.0 * 529.0 * lam * lam) + (4.0 * 576.0 * lam * lam - 1.0) * exp(-2.0 * 576.0 * lam * lam) + (4.0 * 625.0 * lam * lam - 1.0) * exp(-2.0 * 625.0 * lam * lam) + (4.0 * 676.0 * lam * lam - 1.0) * exp(-2.0 * 676.0 * lam * lam) + (4.0 * 729.0 * lam * lam - 1.0) * exp(-2.0 * 729.0 * lam * lam) + (4.0 * 784.0 * lam * lam - 1.0) * exp(-2.0 * 784.0 * lam * lam) + (4.0 * 841.0 * lam * lam - 1.0) * exp(-2.0 * 841.0 * lam * lam) + (4.0 * 900.0 * lam * lam - 1.0) * exp(-2.0 * 900.0 * lam * lam) + (4.0 * 961.0 * lam * lam - 1.0) * exp(-2.0 * 961.0 * lam * lam) + (4.0 * 1024.0 * lam * lam - 1.0) * exp(-2.0 * 1024.0 * lam * lam) + (4.0 * 1089.0 * lam * lam - 1.0) * exp(-2.0 * 1089.0 * lam * lam) + (4.0 * 1156.0 * lam * lam - 1.0) * exp(-2.0 * 1156.0 * lam * lam) + (4.0 * 1225.0 * lam * lam - 1.0) * exp(-2.0 * 1225.0 * lam * lam) + (4.0 * 1296.0 * lam * lam - 1.0) * exp(-2.0 * 1296.0 * lam * lam) + (4.0 * 1369.0 * lam * lam - 1.0) * exp(-2.0 * 1369.0 * lam * lam) + (4.0 * 1444.0 * lam * lam - 1.0) * exp(-2.0 * 1444.0 * lam * lam) + (4.0 * 1521.0 * lam * lam - 1.0) * exp(-2.0 * 1521.0 * lam * lam) + (4.0 * 1600.0 * lam * lam - 1.0) * exp(-2.0 * 1600.0 * lam * lam) + (4.0 * 1681.0 * lam * lam - 1.0) * exp(-2.0 * 1681.0 * lam * lam) + (4.0 * 1764.0 * lam * lam - 1.0) * exp(-2.0 * 1764.0 * lam * lam) + (4.0 * 1849.0 * lam * lam - 1.0) * exp(-2.0 * 1849.0 * lam * lam) + (4.0 * 1936.0 * lam * lam - 1.0) * exp(-2.0 * 1936.0 * lam * lam) + (4.0 * 2025.0 * lam * lam - 1.0) * exp(-2.0 * 2025.0 * lam * lam) + (4.0 * 2116.0 * lam * lam - 1.0) * exp(-2.0 * 2116.0 * lam * lam) + (4.0 * 2209.0 * lam * lam - 1.0) * exp(-2.0 * 2209.0 * lam * lam) + (4.0 * 2304.0 * lam * lam - 1.0) * exp(-2.0 * 2304.0 * lam * lam) + (4.0 * 2401.0 * lam * lam - 1.0) * exp(-2.0 * 2401.0 * lam * lam) + (4.0 * 2500.0 * lam * lam - 1.0) * exp(-2.0 * 2500.0 * lam * lam)))) END END, 6)\n    AS p_value\nFROM lamc\n"


@_q("kuiper_2samp", _KUIPER_ORACLE)
def q_kuiper_2samp(spark, sf):
    """Two-sample Kuiper V of quantities, return flags A vs R
    (stats.kuiper_2samp): D+ + D- off the shared distributed stepped
    ECDF, Stephens-corrected 50-term asymptotic p shared verbatim
    with the oracle."""
    from padua_spark.operators.stats import kuiper_2samp

    li = _t(spark, sf, "lineitem")
    return kuiper_2samp(li, "l_returnflag", "l_quantity", "A", "R")


_MDE_MEAN_ORACLE = '\nWITH base AS (\n  SELECT user_id % 2 AS arm, CAST(value AS DOUBLE) AS v\n  FROM events\n  WHERE user_id IS NOT NULL AND value IS NOT NULL\n    AND user_id % 2 IN (0, 1)\n),\nagg AS (\n  SELECT\n    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,\n    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,\n    sum(CASE WHEN arm = 0 THEN v END) AS sa,\n    sum(CASE WHEN arm = 1 THEN v END) AS sb,\n    sum(CASE WHEN arm = 0 THEN v * v END) AS qa,\n    sum(CASE WHEN arm = 1 THEN v * v END) AS qb\n  FROM base\n),\nm AS (\n  SELECT n_a, n_b,\n    sa / CAST(n_a AS DOUBLE) AS ma, sb / CAST(n_b AS DOUBLE) AS mb,\n    (qa - CAST(n_a AS DOUBLE) * (sa / CAST(n_a AS DOUBLE))\n      * (sa / CAST(n_a AS DOUBLE))) / (CAST(n_a AS DOUBLE) - 1.0)\n      AS va,\n    (qb - CAST(n_b AS DOUBLE) * (sb / CAST(n_b AS DOUBLE))\n      * (sb / CAST(n_b AS DOUBLE))) / (CAST(n_b AS DOUBLE) - 1.0)\n      AS vb,\n    n_a >= 2 AND n_b >= 2 AS ok\n  FROM agg\n),\nf AS (\n  SELECT n_a, n_b, ok, ma, mb, va, vb,\n    CASE WHEN ok THEN mb - ma END AS diff,\n    CASE WHEN ok AND va >= 0 AND vb >= 0 THEN\n      CAST(2.801585218113254 AS DOUBLE)\n      * sqrt(va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))\n      END AS mde\n  FROM m\n)\nSELECT n_a, n_b,\n  round(CASE WHEN ok THEN ma END, 6) AS mean_a,\n  round(CASE WHEN ok THEN mb END, 6) AS mean_b,\n  round(CASE WHEN ok AND va >= 0 THEN sqrt(va) END, 6) AS sd_a,\n  round(CASE WHEN ok AND vb >= 0 THEN sqrt(vb) END, 6) AS sd_b,\n  round(diff, 6) AS observed_diff,\n  round(mde, 6) AS mde_absolute,\n  CASE WHEN mde IS NOT NULL THEN abs(diff) >= mde END AS powered\nFROM f\n'


@_q("mde_two_mean", _MDE_MEAN_ORACLE)
def q_mde_two_mean(spark, sf):
    """Post-hoc minimum detectable effect of the event-value mean A/B
    on the user parity arms (stats.mde_two_mean): Welch-style
    planning identity on the realized per-arm variances, fixed z
    lookup."""
    from padua_spark.operators.stats import mde_two_mean

    e = _t(spark, sf, "events").where(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    e = e.withColumn("_arm", F.col("user_id") % 2)
    return mde_two_mean(e, "_arm", "value", 0, 1)


_BLOOM_ORACLE = "\nWITH rt AS (\n  SELECT DISTINCT unnest(list_filter(string_split(lower(text), ' '),\n                         t -> t <> '')) AS tok\n  FROM documents WHERE text IS NOT NULL AND lang = 'en'\n),\npt AS (\n  SELECT DISTINCT unnest(list_filter(string_split(lower(text), ' '),\n                         t -> t <> '')) AS tok\n  FROM documents WHERE text IS NOT NULL AND lang <> 'en'\n),\nrh AS (\n  SELECT tok, list_reduce(\n    list_prepend(CAST(7 AS BIGINT),\n      list_transform(list_filter(string_split(tok, ''), c -> c <> ''),\n                     c -> CAST(ord(c) AS BIGINT))),\n    (acc, c) -> (acc * 131 + c) % 2147483647) AS h\n  FROM rt\n),\nph AS (\n  SELECT tok, list_reduce(\n    list_prepend(CAST(7 AS BIGINT),\n      list_transform(list_filter(string_split(tok, ''), c -> c <> ''),\n                     c -> CAST(ord(c) AS BIGINT))),\n    (acc, c) -> (acc * 131 + c) % 2147483647) AS h\n  FROM pt\n),\nlines(j, a, b) AS (VALUES (0, CAST(84996101 AS BIGINT), CAST(2029282193 AS BIGINT)), (1, CAST(1039580715 AS BIGINT), CAST(199834225 AS BIGINT)), (2, CAST(1472947415 AS BIGINT), CAST(290222948 AS BIGINT)), (3, CAST(440900915 AS BIGINT), CAST(1798566625 AS BIGINT))),\nbits AS (\n  SELECT DISTINCT (rh.h * l.a + l.b) % 2147483647 % 8192 AS pos\n  FROM rh, lines l\n),\nfan AS (\n  SELECT ph.tok, (ph.h * l.a + l.b) % 2147483647 % 8192 AS pos\n  FROM ph, lines l\n),\nmatched AS (\n  SELECT f.tok,\n    sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS nhit\n  FROM fan f LEFT JOIN bits b ON f.pos = b.pos\n  GROUP BY 1\n),\nflagged AS (\n  SELECT m.nhit = 4 AS pred, rt.tok IS NOT NULL AS tru\n  FROM matched m LEFT JOIN rt ON m.tok = rt.tok\n),\nstats AS (\n  SELECT CAST(count(*) AS BIGINT) AS n_probe_types,\n    CAST(sum(CASE WHEN tru THEN 1 ELSE 0 END) AS BIGINT)\n      AS n_true_member,\n    CAST(sum(CASE WHEN pred THEN 1 ELSE 0 END) AS BIGINT)\n      AS n_predicted_member,\n    CAST(sum(CASE WHEN pred AND NOT tru THEN 1 ELSE 0 END)\n      AS BIGINT) AS n_false_positive\n  FROM flagged\n),\nscal AS (\n  SELECT CAST((SELECT count(*) FROM rt) AS BIGINT) AS n_ref_types,\n    CAST((SELECT count(*) FROM bits) AS BIGINT) AS bits_set\n)\nSELECT s2.n_ref_types, s.n_probe_types, s2.bits_set,\n  CAST(8192 AS BIGINT) AS m_bits, CAST(4 AS BIGINT) AS k_hashes,\n  s.n_true_member, s.n_predicted_member, s.n_false_positive,\n  round(CASE WHEN s.n_probe_types - s.n_true_member > 0\n    THEN CAST(s.n_false_positive AS DOUBLE)\n      / CAST(s.n_probe_types - s.n_true_member AS DOUBLE) END, 6)\n    AS fp_rate,\n  round(power(CAST(s2.bits_set AS DOUBLE) / 8192.0, 4.0), 6)\n    AS theoretical_fp_rate\nFROM stats s, scal s2\n"


@_q("bloom_membership", _BLOOM_ORACLE)
def q_bloom_membership(spark, sf):
    """Bloom-filter membership audit: an 8192-bit / 4-hash filter
    over the English vocabulary probed with the non-English
    vocabulary (sketches.bloom_membership): deterministic affine
    positions, broadcast distinct-positions frame, exact-membership
    twin and realized-vs-theoretical FP rate."""
    from padua_spark.extensions.sketches import bloom_membership

    d = _t(spark, sf, "documents")
    return bloom_membership(
        d.where(F.col("lang") == "en"),
        d.where(F.col("lang") != "en"),
        "text",
        m_bits=8192,
        k_hashes=4,
    )


_WINDOWED_GINI_ORACLE = '\nWITH e AS (\n  SELECT (epoch_us(ts) // 3600000000) * 3600 AS ws,\n    least(1.0, greatest(0.0, value / 200.0)) AS v\n  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL\n),\nb AS (\n  SELECT ws,\n    CAST(least(63, CAST(floor(v * 64) AS INT)) AS INT) AS bin,\n    CAST(count(*) AS BIGINT) AS c, sum(v) AS s\n  FROM e GROUP BY 1, 2\n),\nt AS (\n  SELECT ws, CAST(sum(c) AS DOUBLE) AS nd, sum(s) AS st\n  FROM b GROUP BY 1\n),\ncum AS (\n  SELECT b.ws, b.bin, b.c, b.s, t.nd, t.st,\n    sum(b.s) OVER (PARTITION BY b.ws ORDER BY b.bin\n      ROWS UNBOUNDED PRECEDING) AS cum_s\n  FROM b JOIN t ON b.ws = t.ws\n),\ng AS (\n  SELECT ws, max(nd) AS nd, max(st) AS st,\n    sum((CAST(c AS DOUBLE) / nd)\n      * ((cum_s - s) / st + cum_s / st)) AS acc\n  FROM cum GROUP BY 1\n)\nSELECT ws AS window_start_epoch, CAST(nd AS BIGINT) AS n,\n  round(st, 6) AS total,\n  round(CASE WHEN nd > 0 AND st > 0 THEN 1.0 - acc END, 6)\n    AS gini_binned\nFROM g\n'


@_q("windowed_binned_gini", _WINDOWED_GINI_ORACLE)
def q_windowed_binned_gini(spark, sf):
    """Per-hour binned Gini concentration of the clamped value score
    (streaming.windowed_binned_gini): 2 x 64 count+sum partials per
    window in ONE stateful aggregation, grouped-data Lorenz trapezoid
    as a per-row fold."""
    from padua_spark.streaming import windowed_binned_gini

    e = _t(spark, sf, "events")
    out = windowed_binned_gini(
        e,
        _events_event_time(spark, sf),
        F.least(
            F.lit(1.0), F.greatest(F.lit(0.0), F.col("value") / 200.0)
        ),
        window_duration="1 hour",
        n_bins=64,
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "n", "total", "gini_binned",
    )



# --- E348-E349 round-12 battery 7: windowed embedding drift, ----------------
#     Poisson overdispersion --------------------------------------------------


_WINDOWED_EMB_DRIFT_ORACLE = '\nWITH ref AS (\n  SELECT d.i, avg(CAST(embedding AS DOUBLE[])[d.i]) AS r\n  FROM embeddings\n  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) d\n  WHERE vec_id < 100 AND embedding IS NOT NULL\n    AND len(embedding) = 64\n  GROUP BY 1\n),\ne AS (\n  SELECT (epoch_us(ts) // 3600000000) * 3600 AS ws,\n    CAST(em.embedding AS DOUBLE[]) AS v\n  FROM events ev\n  JOIN embeddings em ON ev.user_id % 1000 = em.vec_id\n  WHERE ev.ts IS NOT NULL AND em.embedding IS NOT NULL\n    AND len(em.embedding) = 64\n),\nsums AS (\n  SELECT ws, d.i, CAST(count(*) AS BIGINT) AS n, sum(v[d.i]) AS s\n  FROM e CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) d\n  GROUP BY 1, 2\n),\nj AS (\n  SELECT sums.ws, sums.n, sums.i,\n    sums.s / CAST(sums.n AS DOUBLE) AS mu, ref.r\n  FROM sums JOIN ref ON sums.i = ref.i\n),\nagg AS (\n  SELECT ws, max(n) AS n,\n    sum((mu - r) * (mu - r)) AS l2s,\n    sum(mu * r) AS dot,\n    sum(mu * mu) AS norm2,\n    sum(r * r) AS refnorm2\n  FROM j GROUP BY 1\n)\nSELECT ws AS window_start_epoch, n,\n  round(sqrt(l2s), 6) AS l2_distance,\n  round(CASE WHEN norm2 > 0 AND refnorm2 > 0\n    THEN dot / (sqrt(norm2) * sqrt(refnorm2)) END, 6) AS cosine_sim,\n  round(sqrt(norm2), 6) AS mean_norm\nFROM agg\n'


@_q("windowed_embedding_drift", _WINDOWED_EMB_DRIFT_ORACLE)
def q_windowed_embedding_drift(spark, sf):
    """Per-hour embedding-centroid drift of event-attached vectors vs
    the vec_id<100 reference mean (streaming.windowed_embedding_drift):
    the window mean is d bounded sums in ONE stateful aggregation —
    the mean-map MMD idea's streamable core. Events borrow vectors by
    user_id%1000 = vec_id (deterministic attach, both engines)."""
    from padua_spark.streaming import windowed_embedding_drift

    emb = _t(spark, sf, "embeddings")
    ref_row = (
        emb.where(
            (F.col("vec_id") < 100)
            & F.col("embedding").isNotNull()
            & (F.size("embedding") == 64)
        )
        .select(
            *[
                F.avg(F.col("embedding")[i].cast("double"))
                .alias(f"m{i}")
                for i in range(64)
            ]
        )
        .collect()[0]
    )
    ref = [float(ref_row[f"m{i}"]) for i in range(64)]
    e = _t(spark, sf, "events").where(F.col("ts").isNotNull())
    attached = e.join(
        emb.where(
            F.col("embedding").isNotNull()
            & (F.size("embedding") == 64)
        ).select("vec_id", "embedding"),
        e["user_id"] % 1000 == F.col("vec_id"),
    )
    out = windowed_embedding_drift(
        attached,
        _events_event_time(spark, sf),
        F.col("embedding"),
        ref,
        window_duration="1 hour",
    )
    return out.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "n", "l2_distance", "cosine_sim", "mean_norm",
    )


_OVERDISPERSION_ORACLE = '\nWITH ec AS (\n  SELECT event_type, user_id, CAST(count(*) AS DOUBLE) AS y\n  FROM events\n  WHERE event_type IS NOT NULL AND user_id IS NOT NULL\n  GROUP BY 1, 2\n),\nagg AS (\n  SELECT event_type, CAST(count(*) AS BIGINT) AS n,\n    sum(y) AS s, sum(y * y) AS q\n  FROM ec GROUP BY 1\n),\nm AS (\n  SELECT event_type, n, CAST(n AS DOUBLE) AS nd,\n    s / CAST(n AS DOUBLE) AS mean, s,\n    q - CAST(n AS DOUBLE) * (s / CAST(n AS DOUBLE))\n      * (s / CAST(n AS DOUBLE)) AS ss\n  FROM agg\n),\nz AS (\n  SELECT event_type, n, nd, mean, ss, s,\n    ss / (nd - 1.0) AS var,\n    n >= 2 AND mean > 0 AS ok\n  FROM m\n),\nzz AS (\n  SELECT event_type, n, mean, var, ok,\n    CASE WHEN ok THEN (nd - 1.0) * var / mean END AS disp,\n    CASE WHEN ok THEN sqrt(2.0 * ((nd - 1.0) * var / mean))\n      - sqrt(2.0 * (nd - 1.0) - 1.0) END AS z_wh,\n    CASE WHEN ok THEN (ss - s)\n      / sqrt(2.0 * nd * mean * mean) END AS z_ct\n  FROM z\n),\ne1 AS (\n  SELECT *, abs(z_wh) / sqrt(2.0) AS x2,\n    1.0 / (1.0 + 0.3275911 * (abs(z_wh) / sqrt(2.0))) AS tt,\n    abs(z_ct) / sqrt(2.0) AS x2c,\n    1.0 / (1.0 + 0.3275911 * (abs(z_ct) / sqrt(2.0))) AS ttc\n  FROM zz\n)\nSELECT event_type, n, round(mean, 6) AS mean,\n  round(CASE WHEN n >= 2 THEN var END, 6) AS variance,\n  round(disp, 6) AS dispersion_index,\n  round(z_wh, 6) AS z_wh,\n  round(CASE WHEN z_wh IS NOT NULL THEN\n    (0.254829592 * tt + -0.284496736 * tt * tt\n     + 1.421413741 * tt * tt * tt + -1.453152027 * tt * tt * tt * tt\n     + 1.061405429 * tt * tt * tt * tt * tt) * exp(-x2 * x2)\n    END, 6) AS p_wh,\n  round(z_ct, 6) AS z_ct,\n  round(CASE WHEN z_ct IS NOT NULL THEN\n    (0.254829592 * ttc + -0.284496736 * ttc * ttc\n     + 1.421413741 * ttc * ttc * ttc\n     + -1.453152027 * ttc * ttc * ttc * ttc\n     + 1.061405429 * ttc * ttc * ttc * ttc * ttc) * exp(-x2c * x2c)\n    END, 6) AS p_ct\nFROM e1\n'


@_q("overdispersion_test", _OVERDISPERSION_ORACLE)
def q_overdispersion_test(spark, sf):
    """Poisson overdispersion of per-user event counts by event type
    (stats.overdispersion_test): dispersion index with the
    Wilson-Hilferty normal approximation plus the Cameron-Trivedi
    regression-form z, one moment aggregation over the per-user
    count frame."""
    from padua_spark.operators.stats import overdispersion_test

    e = _t(spark, sf, "events").where(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    counts = e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("y")
    )
    return overdispersion_test(counts, ["event_type"], "y")



# --- E350-E351 round-12 battery 8: cross-correlation, cointegration ---------


_CCF_ORACLE = '\nWITH base AS (\n  SELECT l_returnflag AS grp,\n    CAST(l_quantity AS DOUBLE) AS x,\n    CAST(l_extendedprice AS DOUBLE) AS y,\n    CAST(row_number() OVER (PARTITION BY l_returnflag\n      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)\n      AS BIGINT) AS t\n  FROM lineitem\n  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL\n),\nstepped AS (\n  SELECT grp, x, y,\n    lag(x, 1) OVER wl AS xl1,\n    lag(y, 1) OVER wl AS yl1,\n    lag(x, 2) OVER wl AS xl2,\n    lag(y, 2) OVER wl AS yl2,\n    lag(x, 3) OVER wl AS xl3,\n    lag(y, 3) OVER wl AS yl3,\n    lag(x, 4) OVER wl AS xl4,\n    lag(y, 4) OVER wl AS yl4,\n    lag(x, 5) OVER wl AS xl5,\n    lag(y, 5) OVER wl AS yl5,\n    lag(x, 6) OVER wl AS xl6,\n    lag(y, 6) OVER wl AS yl6,\n    lag(x, 7) OVER wl AS xl7,\n    lag(y, 7) OVER wl AS yl7,\n    lag(x, 8) OVER wl AS xl8,\n    lag(y, 8) OVER wl AS yl8\n  FROM base\n  WINDOW wl AS (PARTITION BY grp ORDER BY t)\n),\nagg AS (\n  SELECT grp,\n    CAST(sum(CASE WHEN x IS NOT NULL AND yl8 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nm8,\n    sum(CASE WHEN x IS NOT NULL AND yl8 IS NOT NULL THEN x END) AS sam8,\n    sum(CASE WHEN x IS NOT NULL AND yl8 IS NOT NULL THEN yl8 END) AS sbm8,\n    sum(CASE WHEN x IS NOT NULL AND yl8 IS NOT NULL THEN x * x END) AS qam8,\n    sum(CASE WHEN x IS NOT NULL AND yl8 IS NOT NULL THEN yl8 * yl8 END) AS qbm8,\n    sum(CASE WHEN x IS NOT NULL AND yl8 IS NOT NULL THEN x * yl8 END) AS abm8,\n    CAST(sum(CASE WHEN x IS NOT NULL AND yl7 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nm7,\n    sum(CASE WHEN x IS NOT NULL AND yl7 IS NOT NULL THEN x END) AS sam7,\n    sum(CASE WHEN x IS NOT NULL AND yl7 IS NOT NULL THEN yl7 END) AS sbm7,\n    sum(CASE WHEN x IS NOT NULL AND yl7 IS NOT NULL THEN x * x END) AS qam7,\n    sum(CASE WHEN x IS NOT NULL AND yl7 IS NOT NULL THEN yl7 * yl7 END) AS qbm7,\n    sum(CASE WHEN x IS NOT NULL AND yl7 IS NOT NULL THEN x * yl7 END) AS abm7,\n    CAST(sum(CASE WHEN x IS NOT NULL AND yl6 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nm6,\n    sum(CASE WHEN x IS NOT NULL AND yl6 IS NOT NULL THEN x END) AS sam6,\n    sum(CASE WHEN x IS NOT NULL AND yl6 IS NOT NULL THEN yl6 END) AS sbm6,\n    sum(CASE WHEN x IS NOT NULL AND yl6 IS NOT NULL THEN x * x END) AS qam6,\n    sum(CASE WHEN x IS NOT NULL AND yl6 IS NOT NULL THEN yl6 * yl6 END) AS qbm6,\n    sum(CASE WHEN x IS NOT NULL AND yl6 IS NOT NULL THEN x * yl6 END) AS abm6,\n    CAST(sum(CASE WHEN x IS NOT NULL AND yl5 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nm5,\n    sum(CASE WHEN x IS NOT NULL AND yl5 IS NOT NULL THEN x END) AS sam5,\n    sum(CASE WHEN x IS NOT NULL AND yl5 IS NOT NULL THEN yl5 END) AS sbm5,\n    sum(CASE WHEN x IS NOT NULL AND yl5 IS NOT NULL THEN x * x END) AS qam5,\n    sum(CASE WHEN x IS NOT NULL AND yl5 IS NOT NULL THEN yl5 * yl5 END) AS qbm5,\n    sum(CASE WHEN x IS NOT NULL AND yl5 IS NOT NULL THEN x * yl5 END) AS abm5,\n    CAST(sum(CASE WHEN x IS NOT NULL AND yl4 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nm4,\n    sum(CASE WHEN x IS NOT NULL AND yl4 IS NOT NULL THEN x END) AS sam4,\n    sum(CASE WHEN x IS NOT NULL AND yl4 IS NOT NULL THEN yl4 END) AS sbm4,\n    sum(CASE WHEN x IS NOT NULL AND yl4 IS NOT NULL THEN x * x END) AS qam4,\n    sum(CASE WHEN x IS NOT NULL AND yl4 IS NOT NULL THEN yl4 * yl4 END) AS qbm4,\n    sum(CASE WHEN x IS NOT NULL AND yl4 IS NOT NULL THEN x * yl4 END) AS abm4,\n    CAST(sum(CASE WHEN x IS NOT NULL AND yl3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nm3,\n    sum(CASE WHEN x IS NOT NULL AND yl3 IS NOT NULL THEN x END) AS sam3,\n    sum(CASE WHEN x IS NOT NULL AND yl3 IS NOT NULL THEN yl3 END) AS sbm3,\n    sum(CASE WHEN x IS NOT NULL AND yl3 IS NOT NULL THEN x * x END) AS qam3,\n    sum(CASE WHEN x IS NOT NULL AND yl3 IS NOT NULL THEN yl3 * yl3 END) AS qbm3,\n    sum(CASE WHEN x IS NOT NULL AND yl3 IS NOT NULL THEN x * yl3 END) AS abm3,\n    CAST(sum(CASE WHEN x IS NOT NULL AND yl2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nm2,\n    sum(CASE WHEN x IS NOT NULL AND yl2 IS NOT NULL THEN x END) AS sam2,\n    sum(CASE WHEN x IS NOT NULL AND yl2 IS NOT NULL THEN yl2 END) AS sbm2,\n    sum(CASE WHEN x IS NOT NULL AND yl2 IS NOT NULL THEN x * x END) AS qam2,\n    sum(CASE WHEN x IS NOT NULL AND yl2 IS NOT NULL THEN yl2 * yl2 END) AS qbm2,\n    sum(CASE WHEN x IS NOT NULL AND yl2 IS NOT NULL THEN x * yl2 END) AS abm2,\n    CAST(sum(CASE WHEN x IS NOT NULL AND yl1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nm1,\n    sum(CASE WHEN x IS NOT NULL AND yl1 IS NOT NULL THEN x END) AS sam1,\n    sum(CASE WHEN x IS NOT NULL AND yl1 IS NOT NULL THEN yl1 END) AS sbm1,\n    sum(CASE WHEN x IS NOT NULL AND yl1 IS NOT NULL THEN x * x END) AS qam1,\n    sum(CASE WHEN x IS NOT NULL AND yl1 IS NOT NULL THEN yl1 * yl1 END) AS qbm1,\n    sum(CASE WHEN x IS NOT NULL AND yl1 IS NOT NULL THEN x * yl1 END) AS abm1,\n    CAST(sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS np0,\n    sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x END) AS sap0,\n    sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y END) AS sbp0,\n    sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x * x END) AS qap0,\n    sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y * y END) AS qbp0,\n    sum(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x * y END) AS abp0,\n    CAST(sum(CASE WHEN xl1 IS NOT NULL AND y IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS np1,\n    sum(CASE WHEN xl1 IS NOT NULL AND y IS NOT NULL THEN xl1 END) AS sap1,\n    sum(CASE WHEN xl1 IS NOT NULL AND y IS NOT NULL THEN y END) AS sbp1,\n    sum(CASE WHEN xl1 IS NOT NULL AND y IS NOT NULL THEN xl1 * xl1 END) AS qap1,\n    sum(CASE WHEN xl1 IS NOT NULL AND y IS NOT NULL THEN y * y END) AS qbp1,\n    sum(CASE WHEN xl1 IS NOT NULL AND y IS NOT NULL THEN xl1 * y END) AS abp1,\n    CAST(sum(CASE WHEN xl2 IS NOT NULL AND y IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS np2,\n    sum(CASE WHEN xl2 IS NOT NULL AND y IS NOT NULL THEN xl2 END) AS sap2,\n    sum(CASE WHEN xl2 IS NOT NULL AND y IS NOT NULL THEN y END) AS sbp2,\n    sum(CASE WHEN xl2 IS NOT NULL AND y IS NOT NULL THEN xl2 * xl2 END) AS qap2,\n    sum(CASE WHEN xl2 IS NOT NULL AND y IS NOT NULL THEN y * y END) AS qbp2,\n    sum(CASE WHEN xl2 IS NOT NULL AND y IS NOT NULL THEN xl2 * y END) AS abp2,\n    CAST(sum(CASE WHEN xl3 IS NOT NULL AND y IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS np3,\n    sum(CASE WHEN xl3 IS NOT NULL AND y IS NOT NULL THEN xl3 END) AS sap3,\n    sum(CASE WHEN xl3 IS NOT NULL AND y IS NOT NULL THEN y END) AS sbp3,\n    sum(CASE WHEN xl3 IS NOT NULL AND y IS NOT NULL THEN xl3 * xl3 END) AS qap3,\n    sum(CASE WHEN xl3 IS NOT NULL AND y IS NOT NULL THEN y * y END) AS qbp3,\n    sum(CASE WHEN xl3 IS NOT NULL AND y IS NOT NULL THEN xl3 * y END) AS abp3,\n    CAST(sum(CASE WHEN xl4 IS NOT NULL AND y IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS np4,\n    sum(CASE WHEN xl4 IS NOT NULL AND y IS NOT NULL THEN xl4 END) AS sap4,\n    sum(CASE WHEN xl4 IS NOT NULL AND y IS NOT NULL THEN y END) AS sbp4,\n    sum(CASE WHEN xl4 IS NOT NULL AND y IS NOT NULL THEN xl4 * xl4 END) AS qap4,\n    sum(CASE WHEN xl4 IS NOT NULL AND y IS NOT NULL THEN y * y END) AS qbp4,\n    sum(CASE WHEN xl4 IS NOT NULL AND y IS NOT NULL THEN xl4 * y END) AS abp4,\n    CAST(sum(CASE WHEN xl5 IS NOT NULL AND y IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS np5,\n    sum(CASE WHEN xl5 IS NOT NULL AND y IS NOT NULL THEN xl5 END) AS sap5,\n    sum(CASE WHEN xl5 IS NOT NULL AND y IS NOT NULL THEN y END) AS sbp5,\n    sum(CASE WHEN xl5 IS NOT NULL AND y IS NOT NULL THEN xl5 * xl5 END) AS qap5,\n    sum(CASE WHEN xl5 IS NOT NULL AND y IS NOT NULL THEN y * y END) AS qbp5,\n    sum(CASE WHEN xl5 IS NOT NULL AND y IS NOT NULL THEN xl5 * y END) AS abp5,\n    CAST(sum(CASE WHEN xl6 IS NOT NULL AND y IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS np6,\n    sum(CASE WHEN xl6 IS NOT NULL AND y IS NOT NULL THEN xl6 END) AS sap6,\n    sum(CASE WHEN xl6 IS NOT NULL AND y IS NOT NULL THEN y END) AS sbp6,\n    sum(CASE WHEN xl6 IS NOT NULL AND y IS NOT NULL THEN xl6 * xl6 END) AS qap6,\n    sum(CASE WHEN xl6 IS NOT NULL AND y IS NOT NULL THEN y * y END) AS qbp6,\n    sum(CASE WHEN xl6 IS NOT NULL AND y IS NOT NULL THEN xl6 * y END) AS abp6,\n    CAST(sum(CASE WHEN xl7 IS NOT NULL AND y IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS np7,\n    sum(CASE WHEN xl7 IS NOT NULL AND y IS NOT NULL THEN xl7 END) AS sap7,\n    sum(CASE WHEN xl7 IS NOT NULL AND y IS NOT NULL THEN y END) AS sbp7,\n    sum(CASE WHEN xl7 IS NOT NULL AND y IS NOT NULL THEN xl7 * xl7 END) AS qap7,\n    sum(CASE WHEN xl7 IS NOT NULL AND y IS NOT NULL THEN y * y END) AS qbp7,\n    sum(CASE WHEN xl7 IS NOT NULL AND y IS NOT NULL THEN xl7 * y END) AS abp7,\n    CAST(sum(CASE WHEN xl8 IS NOT NULL AND y IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS np8,\n    sum(CASE WHEN xl8 IS NOT NULL AND y IS NOT NULL THEN xl8 END) AS sap8,\n    sum(CASE WHEN xl8 IS NOT NULL AND y IS NOT NULL THEN y END) AS sbp8,\n    sum(CASE WHEN xl8 IS NOT NULL AND y IS NOT NULL THEN xl8 * xl8 END) AS qap8,\n    sum(CASE WHEN xl8 IS NOT NULL AND y IS NOT NULL THEN y * y END) AS qbp8,\n    sum(CASE WHEN xl8 IS NOT NULL AND y IS NOT NULL THEN xl8 * y END) AS abp8\n  FROM stepped GROUP BY 1\n)\nSELECT grp AS l_returnflag, CAST(-8 AS BIGINT) AS lag, nm8 AS n_pairs,\n  round(CASE WHEN nm8 >= 3\n      AND qam8 - CAST(nm8 AS DOUBLE) * (sam8 / CAST(nm8 AS DOUBLE)) * (sam8 / CAST(nm8 AS DOUBLE)) > 0\n      AND qbm8 - CAST(nm8 AS DOUBLE) * (sbm8 / CAST(nm8 AS DOUBLE)) * (sbm8 / CAST(nm8 AS DOUBLE)) > 0\n    THEN (abm8 - CAST(nm8 AS DOUBLE) * (sam8 / CAST(nm8 AS DOUBLE)) * (sbm8 / CAST(nm8 AS DOUBLE)))\n      / sqrt((qam8 - CAST(nm8 AS DOUBLE) * (sam8 / CAST(nm8 AS DOUBLE)) * (sam8 / CAST(nm8 AS DOUBLE)))\n        * (qbm8 - CAST(nm8 AS DOUBLE) * (sbm8 / CAST(nm8 AS DOUBLE)) * (sbm8 / CAST(nm8 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(-7 AS BIGINT) AS lag, nm7 AS n_pairs,\n  round(CASE WHEN nm7 >= 3\n      AND qam7 - CAST(nm7 AS DOUBLE) * (sam7 / CAST(nm7 AS DOUBLE)) * (sam7 / CAST(nm7 AS DOUBLE)) > 0\n      AND qbm7 - CAST(nm7 AS DOUBLE) * (sbm7 / CAST(nm7 AS DOUBLE)) * (sbm7 / CAST(nm7 AS DOUBLE)) > 0\n    THEN (abm7 - CAST(nm7 AS DOUBLE) * (sam7 / CAST(nm7 AS DOUBLE)) * (sbm7 / CAST(nm7 AS DOUBLE)))\n      / sqrt((qam7 - CAST(nm7 AS DOUBLE) * (sam7 / CAST(nm7 AS DOUBLE)) * (sam7 / CAST(nm7 AS DOUBLE)))\n        * (qbm7 - CAST(nm7 AS DOUBLE) * (sbm7 / CAST(nm7 AS DOUBLE)) * (sbm7 / CAST(nm7 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(-6 AS BIGINT) AS lag, nm6 AS n_pairs,\n  round(CASE WHEN nm6 >= 3\n      AND qam6 - CAST(nm6 AS DOUBLE) * (sam6 / CAST(nm6 AS DOUBLE)) * (sam6 / CAST(nm6 AS DOUBLE)) > 0\n      AND qbm6 - CAST(nm6 AS DOUBLE) * (sbm6 / CAST(nm6 AS DOUBLE)) * (sbm6 / CAST(nm6 AS DOUBLE)) > 0\n    THEN (abm6 - CAST(nm6 AS DOUBLE) * (sam6 / CAST(nm6 AS DOUBLE)) * (sbm6 / CAST(nm6 AS DOUBLE)))\n      / sqrt((qam6 - CAST(nm6 AS DOUBLE) * (sam6 / CAST(nm6 AS DOUBLE)) * (sam6 / CAST(nm6 AS DOUBLE)))\n        * (qbm6 - CAST(nm6 AS DOUBLE) * (sbm6 / CAST(nm6 AS DOUBLE)) * (sbm6 / CAST(nm6 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(-5 AS BIGINT) AS lag, nm5 AS n_pairs,\n  round(CASE WHEN nm5 >= 3\n      AND qam5 - CAST(nm5 AS DOUBLE) * (sam5 / CAST(nm5 AS DOUBLE)) * (sam5 / CAST(nm5 AS DOUBLE)) > 0\n      AND qbm5 - CAST(nm5 AS DOUBLE) * (sbm5 / CAST(nm5 AS DOUBLE)) * (sbm5 / CAST(nm5 AS DOUBLE)) > 0\n    THEN (abm5 - CAST(nm5 AS DOUBLE) * (sam5 / CAST(nm5 AS DOUBLE)) * (sbm5 / CAST(nm5 AS DOUBLE)))\n      / sqrt((qam5 - CAST(nm5 AS DOUBLE) * (sam5 / CAST(nm5 AS DOUBLE)) * (sam5 / CAST(nm5 AS DOUBLE)))\n        * (qbm5 - CAST(nm5 AS DOUBLE) * (sbm5 / CAST(nm5 AS DOUBLE)) * (sbm5 / CAST(nm5 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(-4 AS BIGINT) AS lag, nm4 AS n_pairs,\n  round(CASE WHEN nm4 >= 3\n      AND qam4 - CAST(nm4 AS DOUBLE) * (sam4 / CAST(nm4 AS DOUBLE)) * (sam4 / CAST(nm4 AS DOUBLE)) > 0\n      AND qbm4 - CAST(nm4 AS DOUBLE) * (sbm4 / CAST(nm4 AS DOUBLE)) * (sbm4 / CAST(nm4 AS DOUBLE)) > 0\n    THEN (abm4 - CAST(nm4 AS DOUBLE) * (sam4 / CAST(nm4 AS DOUBLE)) * (sbm4 / CAST(nm4 AS DOUBLE)))\n      / sqrt((qam4 - CAST(nm4 AS DOUBLE) * (sam4 / CAST(nm4 AS DOUBLE)) * (sam4 / CAST(nm4 AS DOUBLE)))\n        * (qbm4 - CAST(nm4 AS DOUBLE) * (sbm4 / CAST(nm4 AS DOUBLE)) * (sbm4 / CAST(nm4 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(-3 AS BIGINT) AS lag, nm3 AS n_pairs,\n  round(CASE WHEN nm3 >= 3\n      AND qam3 - CAST(nm3 AS DOUBLE) * (sam3 / CAST(nm3 AS DOUBLE)) * (sam3 / CAST(nm3 AS DOUBLE)) > 0\n      AND qbm3 - CAST(nm3 AS DOUBLE) * (sbm3 / CAST(nm3 AS DOUBLE)) * (sbm3 / CAST(nm3 AS DOUBLE)) > 0\n    THEN (abm3 - CAST(nm3 AS DOUBLE) * (sam3 / CAST(nm3 AS DOUBLE)) * (sbm3 / CAST(nm3 AS DOUBLE)))\n      / sqrt((qam3 - CAST(nm3 AS DOUBLE) * (sam3 / CAST(nm3 AS DOUBLE)) * (sam3 / CAST(nm3 AS DOUBLE)))\n        * (qbm3 - CAST(nm3 AS DOUBLE) * (sbm3 / CAST(nm3 AS DOUBLE)) * (sbm3 / CAST(nm3 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(-2 AS BIGINT) AS lag, nm2 AS n_pairs,\n  round(CASE WHEN nm2 >= 3\n      AND qam2 - CAST(nm2 AS DOUBLE) * (sam2 / CAST(nm2 AS DOUBLE)) * (sam2 / CAST(nm2 AS DOUBLE)) > 0\n      AND qbm2 - CAST(nm2 AS DOUBLE) * (sbm2 / CAST(nm2 AS DOUBLE)) * (sbm2 / CAST(nm2 AS DOUBLE)) > 0\n    THEN (abm2 - CAST(nm2 AS DOUBLE) * (sam2 / CAST(nm2 AS DOUBLE)) * (sbm2 / CAST(nm2 AS DOUBLE)))\n      / sqrt((qam2 - CAST(nm2 AS DOUBLE) * (sam2 / CAST(nm2 AS DOUBLE)) * (sam2 / CAST(nm2 AS DOUBLE)))\n        * (qbm2 - CAST(nm2 AS DOUBLE) * (sbm2 / CAST(nm2 AS DOUBLE)) * (sbm2 / CAST(nm2 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(-1 AS BIGINT) AS lag, nm1 AS n_pairs,\n  round(CASE WHEN nm1 >= 3\n      AND qam1 - CAST(nm1 AS DOUBLE) * (sam1 / CAST(nm1 AS DOUBLE)) * (sam1 / CAST(nm1 AS DOUBLE)) > 0\n      AND qbm1 - CAST(nm1 AS DOUBLE) * (sbm1 / CAST(nm1 AS DOUBLE)) * (sbm1 / CAST(nm1 AS DOUBLE)) > 0\n    THEN (abm1 - CAST(nm1 AS DOUBLE) * (sam1 / CAST(nm1 AS DOUBLE)) * (sbm1 / CAST(nm1 AS DOUBLE)))\n      / sqrt((qam1 - CAST(nm1 AS DOUBLE) * (sam1 / CAST(nm1 AS DOUBLE)) * (sam1 / CAST(nm1 AS DOUBLE)))\n        * (qbm1 - CAST(nm1 AS DOUBLE) * (sbm1 / CAST(nm1 AS DOUBLE)) * (sbm1 / CAST(nm1 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(0 AS BIGINT) AS lag, np0 AS n_pairs,\n  round(CASE WHEN np0 >= 3\n      AND qap0 - CAST(np0 AS DOUBLE) * (sap0 / CAST(np0 AS DOUBLE)) * (sap0 / CAST(np0 AS DOUBLE)) > 0\n      AND qbp0 - CAST(np0 AS DOUBLE) * (sbp0 / CAST(np0 AS DOUBLE)) * (sbp0 / CAST(np0 AS DOUBLE)) > 0\n    THEN (abp0 - CAST(np0 AS DOUBLE) * (sap0 / CAST(np0 AS DOUBLE)) * (sbp0 / CAST(np0 AS DOUBLE)))\n      / sqrt((qap0 - CAST(np0 AS DOUBLE) * (sap0 / CAST(np0 AS DOUBLE)) * (sap0 / CAST(np0 AS DOUBLE)))\n        * (qbp0 - CAST(np0 AS DOUBLE) * (sbp0 / CAST(np0 AS DOUBLE)) * (sbp0 / CAST(np0 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(1 AS BIGINT) AS lag, np1 AS n_pairs,\n  round(CASE WHEN np1 >= 3\n      AND qap1 - CAST(np1 AS DOUBLE) * (sap1 / CAST(np1 AS DOUBLE)) * (sap1 / CAST(np1 AS DOUBLE)) > 0\n      AND qbp1 - CAST(np1 AS DOUBLE) * (sbp1 / CAST(np1 AS DOUBLE)) * (sbp1 / CAST(np1 AS DOUBLE)) > 0\n    THEN (abp1 - CAST(np1 AS DOUBLE) * (sap1 / CAST(np1 AS DOUBLE)) * (sbp1 / CAST(np1 AS DOUBLE)))\n      / sqrt((qap1 - CAST(np1 AS DOUBLE) * (sap1 / CAST(np1 AS DOUBLE)) * (sap1 / CAST(np1 AS DOUBLE)))\n        * (qbp1 - CAST(np1 AS DOUBLE) * (sbp1 / CAST(np1 AS DOUBLE)) * (sbp1 / CAST(np1 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(2 AS BIGINT) AS lag, np2 AS n_pairs,\n  round(CASE WHEN np2 >= 3\n      AND qap2 - CAST(np2 AS DOUBLE) * (sap2 / CAST(np2 AS DOUBLE)) * (sap2 / CAST(np2 AS DOUBLE)) > 0\n      AND qbp2 - CAST(np2 AS DOUBLE) * (sbp2 / CAST(np2 AS DOUBLE)) * (sbp2 / CAST(np2 AS DOUBLE)) > 0\n    THEN (abp2 - CAST(np2 AS DOUBLE) * (sap2 / CAST(np2 AS DOUBLE)) * (sbp2 / CAST(np2 AS DOUBLE)))\n      / sqrt((qap2 - CAST(np2 AS DOUBLE) * (sap2 / CAST(np2 AS DOUBLE)) * (sap2 / CAST(np2 AS DOUBLE)))\n        * (qbp2 - CAST(np2 AS DOUBLE) * (sbp2 / CAST(np2 AS DOUBLE)) * (sbp2 / CAST(np2 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(3 AS BIGINT) AS lag, np3 AS n_pairs,\n  round(CASE WHEN np3 >= 3\n      AND qap3 - CAST(np3 AS DOUBLE) * (sap3 / CAST(np3 AS DOUBLE)) * (sap3 / CAST(np3 AS DOUBLE)) > 0\n      AND qbp3 - CAST(np3 AS DOUBLE) * (sbp3 / CAST(np3 AS DOUBLE)) * (sbp3 / CAST(np3 AS DOUBLE)) > 0\n    THEN (abp3 - CAST(np3 AS DOUBLE) * (sap3 / CAST(np3 AS DOUBLE)) * (sbp3 / CAST(np3 AS DOUBLE)))\n      / sqrt((qap3 - CAST(np3 AS DOUBLE) * (sap3 / CAST(np3 AS DOUBLE)) * (sap3 / CAST(np3 AS DOUBLE)))\n        * (qbp3 - CAST(np3 AS DOUBLE) * (sbp3 / CAST(np3 AS DOUBLE)) * (sbp3 / CAST(np3 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(4 AS BIGINT) AS lag, np4 AS n_pairs,\n  round(CASE WHEN np4 >= 3\n      AND qap4 - CAST(np4 AS DOUBLE) * (sap4 / CAST(np4 AS DOUBLE)) * (sap4 / CAST(np4 AS DOUBLE)) > 0\n      AND qbp4 - CAST(np4 AS DOUBLE) * (sbp4 / CAST(np4 AS DOUBLE)) * (sbp4 / CAST(np4 AS DOUBLE)) > 0\n    THEN (abp4 - CAST(np4 AS DOUBLE) * (sap4 / CAST(np4 AS DOUBLE)) * (sbp4 / CAST(np4 AS DOUBLE)))\n      / sqrt((qap4 - CAST(np4 AS DOUBLE) * (sap4 / CAST(np4 AS DOUBLE)) * (sap4 / CAST(np4 AS DOUBLE)))\n        * (qbp4 - CAST(np4 AS DOUBLE) * (sbp4 / CAST(np4 AS DOUBLE)) * (sbp4 / CAST(np4 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(5 AS BIGINT) AS lag, np5 AS n_pairs,\n  round(CASE WHEN np5 >= 3\n      AND qap5 - CAST(np5 AS DOUBLE) * (sap5 / CAST(np5 AS DOUBLE)) * (sap5 / CAST(np5 AS DOUBLE)) > 0\n      AND qbp5 - CAST(np5 AS DOUBLE) * (sbp5 / CAST(np5 AS DOUBLE)) * (sbp5 / CAST(np5 AS DOUBLE)) > 0\n    THEN (abp5 - CAST(np5 AS DOUBLE) * (sap5 / CAST(np5 AS DOUBLE)) * (sbp5 / CAST(np5 AS DOUBLE)))\n      / sqrt((qap5 - CAST(np5 AS DOUBLE) * (sap5 / CAST(np5 AS DOUBLE)) * (sap5 / CAST(np5 AS DOUBLE)))\n        * (qbp5 - CAST(np5 AS DOUBLE) * (sbp5 / CAST(np5 AS DOUBLE)) * (sbp5 / CAST(np5 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(6 AS BIGINT) AS lag, np6 AS n_pairs,\n  round(CASE WHEN np6 >= 3\n      AND qap6 - CAST(np6 AS DOUBLE) * (sap6 / CAST(np6 AS DOUBLE)) * (sap6 / CAST(np6 AS DOUBLE)) > 0\n      AND qbp6 - CAST(np6 AS DOUBLE) * (sbp6 / CAST(np6 AS DOUBLE)) * (sbp6 / CAST(np6 AS DOUBLE)) > 0\n    THEN (abp6 - CAST(np6 AS DOUBLE) * (sap6 / CAST(np6 AS DOUBLE)) * (sbp6 / CAST(np6 AS DOUBLE)))\n      / sqrt((qap6 - CAST(np6 AS DOUBLE) * (sap6 / CAST(np6 AS DOUBLE)) * (sap6 / CAST(np6 AS DOUBLE)))\n        * (qbp6 - CAST(np6 AS DOUBLE) * (sbp6 / CAST(np6 AS DOUBLE)) * (sbp6 / CAST(np6 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(7 AS BIGINT) AS lag, np7 AS n_pairs,\n  round(CASE WHEN np7 >= 3\n      AND qap7 - CAST(np7 AS DOUBLE) * (sap7 / CAST(np7 AS DOUBLE)) * (sap7 / CAST(np7 AS DOUBLE)) > 0\n      AND qbp7 - CAST(np7 AS DOUBLE) * (sbp7 / CAST(np7 AS DOUBLE)) * (sbp7 / CAST(np7 AS DOUBLE)) > 0\n    THEN (abp7 - CAST(np7 AS DOUBLE) * (sap7 / CAST(np7 AS DOUBLE)) * (sbp7 / CAST(np7 AS DOUBLE)))\n      / sqrt((qap7 - CAST(np7 AS DOUBLE) * (sap7 / CAST(np7 AS DOUBLE)) * (sap7 / CAST(np7 AS DOUBLE)))\n        * (qbp7 - CAST(np7 AS DOUBLE) * (sbp7 / CAST(np7 AS DOUBLE)) * (sbp7 / CAST(np7 AS DOUBLE)))) END, 6) AS ccf FROM agg UNION ALL SELECT grp AS l_returnflag, CAST(8 AS BIGINT) AS lag, np8 AS n_pairs,\n  round(CASE WHEN np8 >= 3\n      AND qap8 - CAST(np8 AS DOUBLE) * (sap8 / CAST(np8 AS DOUBLE)) * (sap8 / CAST(np8 AS DOUBLE)) > 0\n      AND qbp8 - CAST(np8 AS DOUBLE) * (sbp8 / CAST(np8 AS DOUBLE)) * (sbp8 / CAST(np8 AS DOUBLE)) > 0\n    THEN (abp8 - CAST(np8 AS DOUBLE) * (sap8 / CAST(np8 AS DOUBLE)) * (sbp8 / CAST(np8 AS DOUBLE)))\n      / sqrt((qap8 - CAST(np8 AS DOUBLE) * (sap8 / CAST(np8 AS DOUBLE)) * (sap8 / CAST(np8 AS DOUBLE)))\n        * (qbp8 - CAST(np8 AS DOUBLE) * (sbp8 / CAST(np8 AS DOUBLE)) * (sbp8 / CAST(np8 AS DOUBLE)))) END, 6) AS ccf FROM agg\n'


@_q("ccf_lags", _CCF_ORACLE)
def q_ccf_lags(spark, sf):
    """Cross-correlation of quantity vs price at lags -8..8 per
    return flag (temporal.ccf_lags): one lag window pass, per-lag
    conditional moment sums in ONE aggregation, compile-time
    posexplode of the lag results."""
    from padua_spark.operators.temporal import ccf_lags

    li = _t(spark, sf, "lineitem")
    return ccf_lags(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_quantity", "l_extendedprice", max_lag=8,
    )


_EG_ORACLE = '\nWITH base AS (\n  SELECT l_returnflag AS grp,\n    CAST(l_quantity AS DOUBLE) AS x,\n    CAST(l_extendedprice AS DOUBLE) AS y,\n    CAST(row_number() OVER (PARTITION BY l_returnflag\n      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)\n      AS BIGINT) AS t\n  FROM lineitem\n  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL\n),\nmom AS (\n  SELECT grp, CAST(count(*) AS BIGINT) AS n,\n    sum(x) AS sx, sum(y) AS sy,\n    sum(x * x) AS sxx0, sum(x * y) AS sxy0\n  FROM base GROUP BY 1\n),\nfit AS (\n  SELECT grp, n,\n    CASE WHEN n >= 4 AND sxx0 - CAST(n AS DOUBLE)\n        * (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)) > 0\n      THEN (sxy0 - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE))\n        * (sy / CAST(n AS DOUBLE)))\n        / (sxx0 - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE))\n        * (sx / CAST(n AS DOUBLE))) END AS beta,\n    sx / CAST(n AS DOUBLE) AS mx, sy / CAST(n AS DOUBLE) AS my\n  FROM mom\n),\nfit2 AS (\n  SELECT grp, n, beta, my - beta * mx AS alpha FROM fit\n),\nresid AS (\n  SELECT b.grp, f.n, f.beta, f.alpha, b.t,\n    b.y - f.alpha - f.beta * b.x AS e\n  FROM base b JOIN fit2 f ON b.grp = f.grp\n),\nlagged AS (\n  SELECT grp, n, beta, alpha, e,\n    lag(e) OVER (PARTITION BY grp ORDER BY t) AS el\n  FROM resid\n),\nagg AS (\n  SELECT grp, max(n) AS n, max(beta) AS beta, max(alpha) AS alpha,\n    CAST(count(*) AS BIGINT) AS np,\n    sum(el * (e - el)) AS sld,\n    sum(el * el) AS sll,\n    sum((e - el) * (e - el)) AS sdd\n  FROM lagged WHERE el IS NOT NULL GROUP BY 1\n),\ng AS (\n  SELECT grp, n, beta, alpha, np,\n    CASE WHEN np >= 3 AND sll > 0 THEN sld / sll END AS gamma,\n    sll, sdd\n  FROM agg\n),\ntv AS (\n  SELECT grp, n, beta, alpha, gamma,\n    CASE WHEN ((sdd - gamma * gamma * sll)\n        / (CAST(np AS DOUBLE) - 1.0)) / sll > 0\n      THEN gamma / sqrt(((sdd - gamma * gamma * sll)\n        / (CAST(np AS DOUBLE) - 1.0)) / sll) END AS t\n  FROM g\n)\nSELECT grp AS l_returnflag, n,\n  round(alpha, 6) AS alpha, round(beta, 6) AS beta,\n  round(gamma, 6) AS gamma, round(t, 6) AS t_stat,\n  CAST(-3.34 AS DOUBLE) AS crit_5pct,\n  CASE WHEN t IS NOT NULL THEN t < -3.34 END AS cointegrated_5pct\nFROM tv\n'


@_q("engle_granger", _EG_ORACLE)
def q_engle_granger(spark, sf):
    """Engle-Granger cointegration of price on quantity per return
    flag (temporal.engle_granger): closed-form step-1 OLS joined
    back, no-constant lag-0 DF on the residuals, MacKinnon 2-variable
    critical value."""
    from padua_spark.operators.temporal import engle_granger

    li = _t(spark, sf, "lineitem")
    return engle_granger(
        li, ["l_returnflag"],
        ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
        "l_extendedprice", "l_quantity",
    )


# --- E352 round-13: self-contained multimodal header parse ------------------


_IMAGE_HEADER_ORACLE = """
WITH img AS (
  SELECT doc_id,
    CASE WHEN doc_id % 97 = 0 THEN 'unknown'
         WHEN doc_id % 3 = 0 THEN 'png'
         WHEN doc_id % 3 = 1 THEN 'gif'
         ELSE 'jpeg' END AS format,
    CASE WHEN doc_id % 97 = 0 THEN NULL
         ELSE 16 + doc_id % 1000 END AS width,
    CASE WHEN doc_id % 97 = 0 THEN NULL
         ELSE 16 + (doc_id * 7) % 700 END AS height,
    CASE WHEN doc_id % 97 = 0 THEN NULL
         WHEN doc_id % 3 = 0 THEN
           CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END
         WHEN doc_id % 3 = 1 THEN
           CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 4 END
         ELSE CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 12 END
         END AS bit_depth,
    CASE WHEN doc_id % 97 = 0 THEN 4
         WHEN doc_id % 3 = 0 THEN 33
         WHEN doc_id % 3 = 1 THEN 13
         ELSE 45 + 2 * (doc_id % 4) + (doc_id % 5) END AS n_bytes
  FROM documents
)
SELECT format,
  CAST(count(*) AS BIGINT) AS n_images,
  CAST(min(width) AS BIGINT) AS min_width,
  CAST(max(width) AS BIGINT) AS max_width,
  CAST(sum(width) AS BIGINT) AS sum_width,
  CAST(min(height) AS BIGINT) AS min_height,
  CAST(max(height) AS BIGINT) AS max_height,
  CAST(sum(height) AS BIGINT) AS sum_height,
  CAST(sum(bit_depth) AS BIGINT) AS sum_bit_depth,
  CAST(sum(n_bytes) AS BIGINT) AS sum_bytes
FROM img GROUP BY format
"""


@_q("image_header_profile", _IMAGE_HEADER_ORACLE)
def q_image_header_profile(spark, sf):
    """Self-contained multimodal gate (round-13 VERDICT item 3): build
    spec-correct PNG/GIF/JPEG header bytes from doc_id arithmetic
    (multimodal.synthesize_image_bytes — includes a variable-length
    JPEG APP0+COM chain so the SOF offset moves per row), parse them
    back with scan-level binary expressions only
    (multimodal.image_header_profile — hex/substr/conv, bounded JPEG
    marker walk, no UDF, no injected decoder), and profile per
    format. The oracle recomputes the ground truth purely from
    doc_id arithmetic, so the parse must recover every dimension /
    bit depth / byte size from the bytes alone."""
    from padua_spark.extensions.multimodal import (
        image_header_profile,
        synthesize_image_bytes,
    )

    d = _t(spark, sf, "documents").select("doc_id")
    prof = image_header_profile(
        synthesize_image_bytes(d, "doc_id"), "content"
    )
    return prof.groupBy("format").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.min("width").alias("min_width"),
        F.max("width").alias("max_width"),
        F.sum("width").alias("sum_width"),
        F.min("height").alias("min_height"),
        F.max("height").alias("max_height"),
        F.sum("height").alias("sum_height"),
        F.sum("bit_depth").alias("sum_bit_depth"),
        F.sum("n_bytes").alias("sum_bytes"),
    )


# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
