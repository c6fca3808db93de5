"""etl_loading_scripts_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
``milosm-Bgd/ETL-loading-scripts`` reference (a monthly star-schema DWH
loading workload in T-SQL), re-expressed Spark-first:

- ``session``    — SparkSession factory tuned for local[N] and cluster use.
- ``catalog``    — parquet table loaders for the test star schema.
- ``constants``  — the reference's sentinel-key conventions (SURVEY §7.4 R3).
- ``functions``  — T-SQL-semantics scalar layer (SURVEY §2.8) as pure
  Column-builder functions over pyspark.sql.functions.
- ``operators``  — mutation primitives (SURVEY §1.3/§4): insert-if-absent,
  update-from-join, MERGE with by-source delete, surrogate keys, OR-join
  rewrite, atomic publish.
- ``queries``    — the operator inventory (SURVEY §2) as named queries over
  the test tables, each paired with a DuckDB oracle.
- ``llm``        — large-scale training-data pipeline operators: dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  similarity search, text analysis, multimodal column plumbing.
- ``streaming``  — Structured Streaming operators over the events table.

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

__version__ = "0.1.0"
