"""PySpark-native analytics engine with the query and data-processing
capabilities of the CryptoCoinInsights reference pipeline
(SrujanGowda-10/CryptoCoinInsights-Data-Engineer-Project), rebuilt
Spark-first: DataFrame/SQL on Catalyst, Structured Streaming for the
sensor/poll machinery, plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Layout:
- ``session``    — SparkSession factory tuned for the local[32] harness
- ``catalog``    — parquet table loading for the driver-generated testdata
- ``operators``  — merge (upsert), dedup, similarity, text, multimodal
- ``pipeline``   — coin-pipeline parity (ingest → normalize → split → merge)
- ``streaming``  — Structured Streaming replacements for the Airflow sensors
- ``queries``    — named query registry + DuckDB oracle SQL twins
"""

__version__ = "0.1.0"
