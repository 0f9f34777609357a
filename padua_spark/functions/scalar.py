"""Native column builders for padua's scalar/string helpers.

Reference semantics cited per function (file:line into /root/reference/).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def protein_id(c: Column | str) -> Column:
    """First protein ID: text before the first of ``;``, space, ``_``.

    Reference: ``padua/utils.py:108-122`` (chained splits); the io.py:85
    variant additionally splits isoform ``-`` — pass ``isoform=True`` via
    :func:`protein_id_base`.
    """
    return F.regexp_extract(_col(c), r"^([^;\s_]+)", 1)


def protein_id_base(c: Column | str) -> Column:
    """Like :func:`protein_id` but also strips the ``-N`` isoform suffix
    (reference: ``padua/io.py:85``)."""
    return F.regexp_extract(_col(c), r"^([^;\s_\-]+)", 1)


def protein_ids(c: Column | str) -> Column:
    """All protein IDs as an array (reference: ``padua/utils.py:125-139``).

    Multi-valued fields are ``;``-joined strings in MaxQuant output; each
    element is further truncated at the first space/underscore.
    """
    return F.transform(
        F.split(_col(c), ";"),
        lambda x: F.regexp_extract(x, r"^([^\s_]+)", 1),
    )


def shortstr(c: Column | str, sep: str = ";") -> Column:
    """Text before the first separator (reference: ``padua/utils.py:165-176``)."""
    return F.split(_col(c), sep).getItem(0)


def first_token(c: Column | str, delimiters: str = r";,\s") -> Column:
    """Generic first-token extractor over a delimiter class."""
    return F.regexp_extract(_col(c), rf"^([^{delimiters}]+)", 1)


def try_numeric(c: Column | str) -> Column:
    """Best-effort str→int→float cast (reference: ``padua/process.py:7-20``).

    Returns int-valued doubles as ints where lossless; otherwise double;
    NULL if unparseable.
    """
    col = _col(c)
    as_int = col.try_cast("bigint")
    as_dbl = col.try_cast("double")
    return F.coalesce(as_int.cast("double"), as_dbl)


def nan_and_inf_to_null(c: Column | str) -> Column:
    """NaN/±inf → NULL — ingest-time normalization of padua's universal
    missing value (reference: ``padua/process.py:325``,
    ``padua/normalization.py:17`` coerce inf to NaN; NaN is pandas' NULL).
    """
    col = _col(c)
    return F.when(
        F.isnan(col)
        | (col == F.lit(float("inf")))
        | (col == F.lit(float("-inf"))),
        F.lit(None),
    ).otherwise(col)


def safe_log2(c: Column | str) -> Column:
    """log2 with non-positive inputs → NULL (padua computes ``np.log2`` and
    then coerces ±inf to NaN — ``padua/process.py:322-325``)."""
    col = _col(c)
    return F.when(col > 0, F.log2(col)).otherwise(F.lit(None))


# ---------------------------------------------------------------------------
# Deterministic pseudo-randomness.
#
# The reference imputes with an *unseeded* ``np.random.normal``
# (padua/imputation.py:58) — non-reproducible, and unsound on a cluster
# (retried tasks would produce different data). We instead derive noise
# deterministically from a key column with exact 64-bit integer
# arithmetic (a chained Lehmer/MINSTD LCG seeded from the key), so
# results are identical across engines, partitionings, retries, and
# re-runs. Gaussian shape: Irwin–Hall(12) — the sum of 12 consecutive
# LCG uniforms minus 6 ≈ N(0,1) (empirically μ≈0, σ≈0.9995, CDF error
# ~2e-3 — ample for downshifted-normal imputation noise).
#
# Each function has a ``*_sql`` twin producing the identical arithmetic
# as an ANSI-SQL string, so DuckDB oracles reproduce values bit-exactly.
# ---------------------------------------------------------------------------

_IH_M = 2147483647  # 2^31 − 1 (prime); products stay well inside int64
_LCG_A = 48271  # MINSTD multiplier
_LCG_B = 1013904223 % _IH_M
_SALT_MIX = 2654435761  # Knuth multiplicative-hash constant
_WARMUP = 3


def _lcg_state(key: Column | str, salt: int) -> Column:
    x = (
        F.pmod(_col(key).cast("bigint"), F.lit(_IH_M))
        + F.lit((salt * _SALT_MIX) % _IH_M)
    ) % F.lit(_IH_M)
    for _ in range(_WARMUP):
        x = (x * F.lit(_LCG_A) + F.lit(_LCG_B)) % F.lit(_IH_M)
    return x


def deterministic_uniform(key: Column | str, salt: int = 0) -> Column:
    """U(0,1) derived from an integer key — exact integer arithmetic,
    reproducible on any engine/partitioning."""
    x = _lcg_state(key, salt)
    x = (x * F.lit(_LCG_A) + F.lit(_LCG_B)) % F.lit(_IH_M)
    return x.cast("double") / F.lit(float(_IH_M))


def deterministic_gaussian(key: Column | str, salt: int = 0) -> Column:
    """≈N(0,1) from an integer key (Perseus-style imputation noise,
    reference ``padua/imputation.py:14-63`` — but reproducible)."""
    x = _lcg_state(key, salt)
    total = None
    for _ in range(12):
        x = (x * F.lit(_LCG_A) + F.lit(_LCG_B)) % F.lit(_IH_M)
        u = x.cast("double") / F.lit(float(_IH_M))
        total = u if total is None else total + u
    return total - F.lit(6.0)


def _lcg_state_sql(key_expr: str, salt: int) -> str:
    # CAST the seed to BIGINT so engines don't type the whole chain as
    # INT32 when key_expr is a small literal (DuckDB folds constants in
    # the literal's type and overflows otherwise).
    x = (
        f"((CAST({key_expr} AS BIGINT) % {_IH_M})"
        f" + {(salt * _SALT_MIX) % _IH_M}) % {_IH_M}"
    )
    for _ in range(_WARMUP):
        x = f"(({x}) * {_LCG_A} + {_LCG_B}) % {_IH_M}"
    return x


def deterministic_uniform_sql(key_expr: str, salt: int = 0) -> str:
    """ANSI-SQL twin of :func:`deterministic_uniform` (same arithmetic,
    same evaluation order → bit-identical doubles)."""
    x = _lcg_state_sql(key_expr, salt)
    x = f"(({x}) * {_LCG_A} + {_LCG_B}) % {_IH_M}"
    return f"(CAST({x} AS DOUBLE) / {float(_IH_M)!r})"


def deterministic_gaussian_sql(key_expr: str, salt: int = 0) -> str:
    """ANSI-SQL twin of :func:`deterministic_gaussian`."""
    x = _lcg_state_sql(key_expr, salt)
    terms = []
    for _ in range(12):
        x = f"(({x}) * {_LCG_A} + {_LCG_B}) % {_IH_M}"
        terms.append(f"(CAST({x} AS DOUBLE) / {float(_IH_M)!r})")
    return "(" + " + ".join(terms) + " - 6.0)"


def chunks_ntile(order_col: Column | str, n: int) -> Column:
    """Split ordered rows into n near-equal parts (reference:
    ``utils.chunks``, utils.py:259-279) — ``ntile`` over a global-order
    window; apply on small/aggregated tables."""
    from pyspark.sql import Window

    return F.ntile(n).over(Window.orderBy(_col(order_col)))


def format_label(
    cols: list[Column | str], sep: str = " ", fmt: str | None = None
) -> Column:
    """Join key columns into a display label (reference:
    ``utils.format_label`` / ``build_combined_label``,
    utils.py:191-225). ``fmt`` may be a ``format_string`` pattern."""
    cs = [_col(c).cast("string") for c in cols]
    if fmt is not None:
        return F.format_string(fmt, *cs)
    return F.concat_ws(sep, *cs)


def hierarchical_match(d: dict, key: tuple, default=None):
    """Dict lookup trying progressively shorter key prefixes
    (reference: ``utils.hierarchical_match``, utils.py:228-256) —
    driver-side plot-styling helper, pure Python."""
    k = tuple(key)
    while k:
        if k in d:
            return d[k]
        k = k[:-1]
    return d.get((), default)
