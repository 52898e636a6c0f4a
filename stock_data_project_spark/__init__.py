"""stock_data_project_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the
reference stock-market ETL project (star-schema build, derived
return/volatility metrics, filtered time-series queries) as idiomatic
Spark DataFrame / SQL plans, plus the large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB deployment needs.

Design rules:
- DataFrame/SQL first; Catalyst plans the physical execution.
- Hot paths stay JVM-side (built-in ``pyspark.sql.functions``).
- Pandas UDFs / ``applyInPandas`` only where built-ins can't express
  the semantics (as-of joins, stateful streaming, media decode).
- Every operator is a pure ``DataFrame -> DataFrame`` function so
  plans compose and Catalyst sees the whole pipeline.
"""

from stock_data_project_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
