"""Physical-plan inspection helpers.

The engine's 100 TB posture is enforced in tests, not by hope:
``tests/test_plans.py`` asserts that dimension joins broadcast, that
filters reach the parquet scan (``PushedFilters``), and that
aggregations are partial+final (map-side combine). These helpers pull
the formatted plan string for those assertions.
"""

from padua_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    explain_str,
    has_broadcast_join,
    has_partial_aggregate,
    pushed_filters,
    scan_read_schema,
)
