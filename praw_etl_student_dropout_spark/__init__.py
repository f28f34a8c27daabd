"""praw_etl_student_dropout_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
repo ``nuahs07/praw-etl-student-dropout`` (a batch Reddit ETL + MySQL star
schema + pandas BI script, ``reddit_etl_proj/etl_pipeline.py``) as general,
reusable, scale-ready Spark operators, extended with large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Layout
------
- ``session``     SparkSession builder (AQE, Arrow, UTC) for local and cluster
- ``schemas``     explicit StructTypes for all fixture + star-schema tables
- ``sources``     readers/writers: parquet, CSV snapshot, JDBC, API ingestion
- ``functions``   scalar/array/text expression library (native-first, UDF last)
- ``operators``   relational + LLM-pipeline operators (joins, aggs, dedup, ANN)
- ``plans``       end-to-end composed pipelines (the reference's three flows)
- ``streaming``   Structured Streaming jobs + batch-mode window aggregates
"""

__version__ = "0.1.0"
