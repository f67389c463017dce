"""worker_etl_spark — a PySpark-native messy-data ingestion & analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ingestion worker (APURVTHECODER/Worker-ETL, surveyed in SURVEY.md),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst, Pandas
UDFs only where built-ins can't express the semantics (grid table detection,
Excel decode), Structured Streaming for the file-arrival work queue — plus
scale-ready LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for partitioned 100 TB inputs.
"""

from worker_etl_spark.config import EngineConfig
from worker_etl_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]
__version__ = "0.1.0"
