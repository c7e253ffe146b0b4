"""automated_etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark engine providing the query and
data-processing capabilities of the reference project
``nareshpendyala/Automated-ETL-Pipeline`` (a GCP batch ETL + analytics
pipeline; see SURVEY.md), generalized into first-class operators and
extended with LLM-data-pipeline operations (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB scale.

Design principles (SURVEY.md §7):
- DataFrame/SQL first: every operator builds a Catalyst logical plan;
  no RDDs, no driver-side row loops.
- Built-in ``pyspark.sql.functions`` in the hot path; Pandas UDFs only
  where built-ins cannot express the semantics.
- Broadcast small dimensions, AQE on, explicit schemas everywhere.
"""

from automated_etl_pipeline_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
