"""metadata_ingestion_framework_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``shashank1855/metadata-ingestion-framework`` (a Scala/Delta metadata-driven
ingestion framework — see SURVEY.md) as an idiomatic PySpark library:

- plain functions over ``pyspark.sql.DataFrame`` (no Task/Node class DAG);
- Catalyst does the optimization (AQE on, broadcast hints for dims);
- SCD1/2/4 merge semantics implemented Spark-first (join-based MERGE on
  parquet-backed tables, Delta ``MERGE`` when delta-spark is importable);
- Structured Streaming (foreachBatch) for the streaming surfaces;
- plus the large-scale training-data operators (dedup families, similarity
  search, text analysis, multimodal plumbing) the reference lacks.

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

from metadata_ingestion_framework_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
