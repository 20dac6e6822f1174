"""censo_escolar_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL pipeline (raffOps/censo_escolar, surveyed in SURVEY.md),
re-expressed Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, plus LLM-data-pipeline operators (dedup, similarity search,
text analysis, streaming) designed for 100 TB scale.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``sources``    : readers (parquet/csv-with-schema/json sidecars) + sinks
- ``functions``  : scalar/column expression library (decode, dates, text, vectors)
- ``operators``  : composite operators (dedup, similarity, as-of join, multimodal)
- ``plans``      : the query library exposed through __spark_entry__.py
- ``etl``        : reference-parity censo pipeline (prefix conventions, maps)
- ``streaming``  : Structured Streaming helpers (windows, watermarks, sessions)
"""

__version__ = "0.1.0"
