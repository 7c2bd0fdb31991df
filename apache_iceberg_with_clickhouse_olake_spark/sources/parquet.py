"""Lake table access (reference ops S1/S2, scripts/iceberg-setup.sql:5-43).

The reference registers Iceberg REST-catalog tables then scans them; here a
"lake" is a directory of parquet tables (the driver's testdata layout), and
registration is ``spark.read.parquet`` + ``createOrReplaceTempView``. The
declarative read path means Catalyst gets predicate pushdown, column
pruning, and partition pruning for free on every downstream query.

Scale: ``spark.read.parquet`` on a directory is already the 100 TB path -
file listing is distributed, scans split by ``maxPartitionBytes``, and
filters/projections reach the parquet reader (see plans.assert_pushdown).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver star schema (TESTDATA.md) + extension tables.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables BOUNDED at any data scale (region: 5 rows, nation: 25;
# supplier grows sub-linearly) -- always safe to broadcast. customer/part
# grow linearly with the fact tables and are deliberately NOT here: a forced
# broadcast of a scaling table OOMs executors at 100 TB, while AQE upgrades
# to broadcast at runtime whenever the built side is actually small.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1/S2: scan one lake table (inline, no registration needed).

    events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    rejects ([PARQUET_TYPE_ILLEGAL]); we read nanos as raw longs
    (spark.sql.legacy.parquet.nanosAsLong) and rebuild a microsecond
    timestamp with exact integer division (``div`` -- a double division
    would lose precision above 2^53 ns).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            # A session built without inferTimestampNTZ=false reads the
            # NANOS column as NTZ (nanosAsLong is then ignored); rebase
            # to TIMESTAMP so unix_micros()/window() work either way.
            # Session TZ is UTC, so wall time == instant, matching both
            # the long-rebuild path and the DuckDB oracle.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in names:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """S1: register lake tables for ``spark.sql`` access (the Spark
    equivalent of the reference's CREATE TABLE ... ENGINE=Iceberg(...) block,
    scripts/iceberg-setup.sql:5-43)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
