"""rfb_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of the reference ETL (`Carloscavalcante3/RFB-data-pipeline`,
see /root/reference/src/main.py), extended with the relational,
dedup, similarity-search, and text-analysis surface a large-scale
training-data pipeline needs.

Design stance (SURVEY.md §7): everything is declared with the
DataFrame/SQL API so Catalyst + Tungsten choose the physical plan;
Python UDFs are the last resort and always Arrow-batched.
"""

from rfb_data_pipeline_spark.session import get_spark
from rfb_data_pipeline_spark.catalog import load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
