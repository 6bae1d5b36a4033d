"""flink_notebooks_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `flink-notebooks` project
(a Flink SQL 1.20 notebook gateway; see SURVEY.md).

Everything is expressed Spark-first: batch = DataFrame/Spark SQL (Catalyst +
Tungsten), streams = Structured Streaming. The package layers:

- :mod:`flink_notebooks_spark.session`   — SparkSession construction/tuning
- :mod:`flink_notebooks_spark.io`        — test-table loaders (parquet)
- :mod:`flink_notebooks_spark.queries`   — the declared correctness queries
  (SURVEY.md §2.11 Q1–Q18) plus LLM-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal)
- :mod:`flink_notebooks_spark.engine`    — session/statement/result protocol
  mirroring the reference's SQL-gateway surface (SURVEY.md §3.1)
- :mod:`flink_notebooks_spark.sources`   — datagen / filesystem source registry
  (SURVEY.md §2.1)
- :mod:`flink_notebooks_spark.streaming` — Structured Streaming equivalents of
  the reference's streaming semantics (SURVEY.md §2.8)
"""

__version__ = "0.1.0"
