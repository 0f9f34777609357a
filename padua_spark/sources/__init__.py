"""Sources and sinks (reference: ``padua/io.py``): MaxQuant TSV tables,
experimental-design CSVs, Perseus annotated TSV, Phosphopath exports."""

from padua_spark.sources.maxquant import (  # noqa: F401
    maxquant_long,
    parse_expression_columns,
    read_maxquant,
)
from padua_spark.sources.design import read_design  # noqa: F401
