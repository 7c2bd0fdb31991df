"""The lake snapshot surface must behave identically through whichever
backend the runtime gate selects (sources/lake.py): real Iceberg when a
catalog + jar are present, versioned parquet directories otherwise.
This sandbox has no Iceberg jar, so the gate must pick ParquetBackend —
and the SAME roundtrip below runs unchanged (and must keep passing)
when an Iceberg runtime is configured."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_iceberg_with_clickhouse_olake_spark.sources.lake import (
    IcebergBackend,
    ParquetBackend,
    _backend,
    compact,
    iceberg_available,
    read_snapshot,
    snapshot_history,
    write_snapshot,
)
from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import load_table


def test_gate_detects_absence_of_iceberg(spark):
    # no spark.sql.catalog.* = SparkCatalog configured in the sandbox
    assert iceberg_available(spark) is False
    assert isinstance(_backend(spark), ParquetBackend)


def test_gate_requires_loadable_class(spark, monkeypatch):
    # even with a catalog configured, the class must load on the JVM
    monkeypatch.setenv("SPARK_GRAFT_ICEBERG_CATALOG", "lakehouse")
    assert iceberg_available(spark) is False
    assert isinstance(_backend(spark), ParquetBackend)


def test_snapshot_roundtrip_backend_agnostic(spark, sf_dir, tmp_path):
    """Write two snapshots, time-travel both, list history, compact —
    asserting only on the backend-independent contract (1-based versions
    ordered by commit time, identical query results)."""
    table = str(tmp_path / "orders_state")
    orders = load_table(spark, sf_dir, "orders")
    v1_df = orders.select("o_orderkey", "o_totalprice").filter(
        F.col("o_orderkey") % 2 == 0
    )
    v2_df = orders.select("o_orderkey", "o_totalprice")

    assert write_snapshot(v1_df, table) == 1
    assert write_snapshot(v2_df, table) == 2
    assert snapshot_history(spark, table) == [1, 2]

    got_v1 = read_snapshot(spark, table, 1)
    got_v2 = read_snapshot(spark, table, 2)
    got_latest = read_snapshot(spark, table)
    assert got_v1.count() == v1_df.count()
    assert got_v2.count() == v2_df.count()
    assert got_latest.count() == v2_df.count()
    # value-level: the pinned snapshot is immutable and exact
    assert (
        got_v1.agg(F.sum("o_orderkey")).first()[0]
        == v1_df.agg(F.sum("o_orderkey")).first()[0]
    )


def test_compact_preserves_rows(spark, sf_dir, tmp_path):
    data_dir = str(tmp_path / "fragmented")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(8).write.parquet(data_dir)
    n = spark.read.parquet(data_dir).count()
    before, after = compact(spark, data_dir, 1)
    assert before >= 8
    assert after <= 2
    assert spark.read.parquet(data_dir).count() == n


def test_iceberg_backend_identifier_mapping():
    be = IcebergBackend("lakehouse")
    assert be._ident("/tmp/x/orders_state") == "lakehouse.lake.orders_state"
    assert be._ident("/tmp/x/weird-name.v2/") == "lakehouse.lake.weird_name_v2"
