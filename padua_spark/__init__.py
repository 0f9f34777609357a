"""padua_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``mfitzp/padua`` (quantitative proteomics:
MaxQuant/Perseus post-processing), re-architected for Spark.

Design (see SURVEY.md §1.5 / §7):

- **Long/tidy relational core** instead of padua's wide pandas matrix:
  a fact table ``measurements(feature_id, sample_id, kind, multiplicity,
  value)`` plus ``features`` / ``samples`` dimension tables. Wide↔long
  conversion happens at the edges (``padua_spark.process.melt`` /
  ``pivot_wider``).
- Every operator is a lazy DataFrame → DataFrame transform built from
  native ``pyspark.sql.functions`` (Catalyst-optimizable, whole-stage
  codegen). Python/pandas UDFs appear only where a closed form does not
  exist (t/F p-value CDFs over already-aggregated rows, PLS fits).
- Nulls: SQL ``NULL`` is the missing value (padua's ``np.nan``); ±inf is
  coerced to NULL at the point of creation (log2 of 0).

Modules mirror the reference's layout (citations in each docstring):
``io`` (sources/sinks), ``filters``, ``process``, ``normalization``,
``imputation``, ``analysis`` (stats + multivariate), ``utils`` (scalar
column functions), plus Spark-only extensions: ``extensions.dedup``,
``extensions.similarity``, ``extensions.text``, ``extensions.multimodal``,
``streaming``.
"""

from padua_spark import functions, operators  # noqa: F401

__version__ = "0.1.0"
