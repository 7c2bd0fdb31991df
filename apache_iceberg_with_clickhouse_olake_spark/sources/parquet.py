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


# widen_split_starved decision memo: (resolved path, layout
# fingerprint, cpus) -> bool. A partition-count probe per query BUILD
# (not per run) is already cheap, but the bench re-builds each query
# 5-7 times; the split count of an immutable fixture path cannot change
# mid-session, so memoize. The fingerprint (mtime_ns, size) invalidates
# the memo when a path is rewritten in-process (r19 ADVICE: tmp_path
# tests, compaction ops); a changed maxPartitionBytes between sessions
# never hits a stale entry because the memo dies with the process.
# This memoizes a PLAN-TIME property, never results.
_STARVED: dict[tuple[str, int, int, int], bool] = {}


def _layout_fingerprint(path: str) -> tuple[int, int]:
    try:
        st = os.stat(path)
    except OSError:
        return (0, 0)
    return (st.st_mtime_ns, st.st_size)


def widen_split_starved(df: DataFrame, key: str, path: str) -> DataFrame:
    """Parallelism-restoring exchange for split-starved scans (r19;
    optimization guide §2.5 "input skew: one huge unsplittable file ...
    repartition immediately after the read").

    A parquet file written as ONE row group cannot split below row-group
    granularity, so a fused scan->partial-aggregate stage runs on at most
    as many tasks as the input has row groups. Every fixture table is a
    single row group (pyarrow-verified), which serializes the
    decimal-heavy partial aggregation of the raw-layer queries onto one
    core: measured at sf0.1, pricing_summary's HashAggregate build was
    2.2 s of the 2.45 s wall, ALL on one task, while the scan itself
    cost 53 ms.

    The remedy is scale-ADAPTIVE (guide §2: derive partitioning from the
    input, never a constant tuned for one mode): insert a hash exchange
    on ``key`` only when the scan's actual split count starves the
    session's parallelism. On a production layout (splits >= cores) the
    probe is False and the plan is untouched -- this never becomes a
    blanket repartition of a 100 TB fact table. The key is a
    deterministic high-cardinality column (never round-robin/rand:
    retried tasks must reproduce their partition assignment,
    SPARK-38388).

    Result-identical by construction: every downstream aggregate here is
    algebraic (count/min/max) or the exact-decimal dsum/davg forms --
    all partition-order-independent (that is their contract).
    """
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    memo_key = (os.path.abspath(path), par, *_layout_fingerprint(path))
    starved = _STARVED.get(memo_key)
    if starved is None:
        starved = df.rdd.getNumPartitions() < par
        _STARVED[memo_key] = starved
    if not starved:
        return df
    from pyspark.sql import functions as F

    return df.repartition(par, F.col(key))


def load_table_wide(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> DataFrame:
    """load_table + widen_split_starved (the agg-heavy fact-scan path)."""
    return widen_split_starved(
        load_table(spark, sf_dir, name), key, table_path(sf_dir, name)
    )


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
