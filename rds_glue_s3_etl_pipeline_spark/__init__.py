"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference batch ETL job
(onewonderjapan/rds-glue-s3-etl-pipeline, surveyed in SURVEY.md),
re-expressed as a reusable DataFrame/SQL operator library plus
LLM-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Layout:
    session.py    SparkSession factory (AQE on, UTC, arrow)
    catalog.py    table loading/registration over the parquet star schema
    operators/    precedence merge, anti-join audit, as-of join, dedup,
                  similarity (the reference-semantics + extension ops)
    functions/    column-expression libraries (text analysis, vector math)
    sources/      readers (parquet/json/csv/jdbc) and sinks (single-file
                  CSV, partitioned parquet, notification callback)
    streaming/    Structured Streaming ops (windows, sessionization,
                  stateful dedup, stream-static join, foreachBatch sink)
    queries/      the registry consumed by __spark_entry__ — every
                  operator exposed as (spark, sf_dir) -> DataFrame with a
                  DuckDB oracle SQL string where SQL-expressible
    pipeline.py   the reference's end-to-end ETL dataflow re-expressed
                  (validate -> merge -> audit -> sink -> notify)
"""

__version__ = "0.1.0"
