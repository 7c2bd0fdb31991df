"""PySpark-native analytics engine with the capabilities of the
``sandeep-devarapalli/Apache-Iceberg-with-clickhouse-olake`` lakehouse demo.

The reference is a Docker-composed medallion lakehouse (MySQL CDC -> OLake ->
Iceberg on MinIO -> ClickHouse silver/gold + analytics SQL). This package
re-expresses every capability Spark-first:

- ``session``     SparkSession factory tuned for columnar analytics (AQE,
                  Arrow, adaptive shuffle sizing).
- ``schemas``     Explicit StructType schemas (reference e-commerce model +
                  driver star schema + CDC envelope).
- ``sources``     Table readers/writers (parquet lake with partition
                  transforms), seeded data generation, simulated CDC feed.
- ``operators``   The full operator inventory of SURVEY.md section 2:
                  analytics queries, medallion builds, dedup family,
                  similarity search, text analysis, multimodal plumbing.
- ``functions``   Scalar function helpers mapping reference SQL functions
                  (ELT, NULLIF, toYYYYMM, ...) to pyspark.sql.functions.
- ``streaming``   Structured Streaming: CDC upsert apply, sessionization.
- ``plans``       Plan-inspection helpers (pushdown / codegen assertions).
"""

__version__ = "0.1.0"
