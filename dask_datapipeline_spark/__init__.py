"""dask_datapipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference pipeline
(``priyanka57/dask-datapipeline``, surveyed in SURVEY.md) as a reusable,
Spark-first operator library plus LLM-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal columns, streaming).

Design principles (100 TB scale):

- DataFrame/SQL API end-to-end; Catalyst plans everything. No RDDs.
- Explicit ``StructType`` schemas — never ``inferSchema`` at scale.
- Lazy DAGs source→sink; ``.cache()`` only at genuine fan-out points.
- Broadcast small dimensions, sort-merge large facts; AQE enabled for
  runtime re-planning and skew-join handling.
- Built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched
  pandas UDFs only where built-ins cannot express the semantics.
"""

from dask_datapipeline_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
