from padua_spark.operators import (  # noqa: F401
    aggregates,
    filters,
    imputation,
    normalization,
    process,
    setops,
    stats,
)
