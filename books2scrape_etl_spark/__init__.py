"""books2scrape_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL pipeline
(Samyam-Sapkota/books2scrape-etl: extract_pipeline.py,
transformation_pipeline.py, airflow.py), extended with the
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) a 100 TB training-data pipeline needs.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, UTC, tuned shuffle)
- ``io``         explicit schemas + parquet/CSV readers and writers
- ``functions``  pure-Catalyst column expression library (no UDFs)
- ``operators``  relational + LLM-pipeline operators (binning, dedup,
                 similarity, text analysis, multimodal)
- ``plans``      composed query plans (star-schema build, flagship,
                 summary report)
- ``sources``    scraper source (URL frontier -> parsed records) and
                 file sources
- ``streaming``  Structured Streaming variants (windows, watermark,
                 stateful)
- ``queries``    the driver-facing inventory: qname -> (spark fn,
                 DuckDB oracle SQL)
"""

__version__ = "0.1.0"
