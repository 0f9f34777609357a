"""Scalar column-expression builders (reference: ``padua/utils.py``,
``padua/io.py:85``, ``padua/process.py:7-20``).

Everything here returns a ``pyspark.sql.Column`` built from native
functions — JVM-side, whole-stage-codegen friendly, no Python UDFs.
"""

from padua_spark.functions.scalar import (  # noqa: F401
    deterministic_gaussian,
    deterministic_uniform,
    first_token,
    nan_and_inf_to_null,
    protein_id,
    protein_ids,
    safe_log2,
    shortstr,
    try_numeric,
)
from padua_spark.functions.distributions import (  # noqa: F401
    f_sf_udf,
    t_sf_udf,
)
