"""big_data_analysis_project_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of SuryaKeyzz/Big_Data_Analysis_Project
(reference surveyed in SURVEY.md). All heavy lifting is declared via
the DataFrame/SQL API so Catalyst + Tungsten pick physical strategy;
Python UDFs appear only in the Phase-E extension operators where no
built-in exists, and there only as Arrow-batched pandas UDFs.

Layout:
    session.py    SparkSession factory (AQE, Arrow, Kryo, UTC, scale-aware)
    schemas.py    explicit StructTypes for every table the engine touches
    sources/      readers (csv/json/parquet/jdbc-gated) + synthetic generator
    operators/    cleaning, reshape (pivot/unpivot), joins, aggregates, windows
    functions/    rate derivation, text analytics, similarity primitives
    plans/        end-to-end pipelines (TB golden pipeline, serving queries)
    dedup/        exact + MinHash-LSH + SimHash + n-gram + embedding dedup
    streaming/    structured-streaming jobs over the events table
    sinks.py      parquet/csv/jdbc writers with partitioning + upsert keys
"""

__version__ = "0.1.0"
