"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit": "sec", "queries": {...}, "sf"}.

Mirrors the reference's performance-comparison harness
(scripts/performance-with-timing.sh): the medallion build is SETUP (the
reference materializes silver/gold via iceberg-setup.sql before timing),
then the same group-by is timed against each layer -- raw scan
(2-5 s band), materialized silver (0.5-2 s band), materialized gold
(10-50 ms band) -- plus the heaviest fact-table queries from the suite
(compare-query-performance.sql Tests 1-4 shapes).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from apache_iceberg_with_clickhouse_olake_spark.session import get_spark

HEADLINE = (
    "orders_by_status",       # Test 1: raw group-by (the 2-5 s band shape)
    "monthly_revenue",        # Test 2: month x status rollup
    "high_value_orders",      # Test 3: multi-predicate filter
    "unique_customers",       # Test 4: exact distinct
    "gold_order_metrics",     # medallion gold build (raw -> gold pipeline)
    "gold_reaggregate",       # gold re-agg recomputed from raw
    "pricing_summary",        # biggest fact scan (TPC-H Q1 shape)
    "segment_lineitem_revenue",  # biggest shuffle join
    "revenue_by_nation",      # star join
    "daily_active_users",     # events rollup
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries = registry.all_queries()
    names = [n for n in HEADLINE if n in queries]

    # Warm the JVM + file listing once (excluded from timings).
    queries["orders_by_status"](spark, sf_dir).collect()

    def timed(fn, runs: int = 3) -> float:
        """Median of N runs -- keeps the recorded number stable against
        scheduler jitter."""
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        return round(samples[len(samples) // 2], 4)

    timings: dict[str, float] = {}
    for name in names:
        timings[name] = timed(lambda: queries[name](spark, sf_dir).collect())

    # --- Per-layer comparison over MATERIALIZED silver/gold (the setup the
    # reference harness assumes: iceberg-setup.sql runs before timing). ---
    from pyspark.sql import functions as F

    from apache_iceberg_with_clickhouse_olake_spark.functions import davg, dsum
    from apache_iceberg_with_clickhouse_olake_spark.operators.medallion import (
        build_medallion,
    )

    warehouse = tempfile.mkdtemp(prefix="bench_medallion_")
    try:
        paths = build_medallion(spark, sf_dir, warehouse)  # setup, untimed
        silver = spark.read.parquet(paths["silver_orders"])
        gold = spark.read.parquet(paths["gold_order_metrics"])
        silver.count(), gold.count()  # warm file listing

        timings["silver_groupby_premat"] = timed(
            lambda: silver.groupBy("status")
            .agg(
                F.count("*").alias("order_count"),
                davg("total_amount", "avg_order_value"),
            )
            .collect()
        )

        def gold_reagg(df):
            return (
                df.groupBy("status")
                .agg(
                    F.sum("order_count").alias("total_orders"),
                    dsum("gross_revenue", "total_revenue"),
                )
                .collect()
            )

        timings["gold_reagg_premat"] = timed(lambda: gold_reagg(gold))

        # Cached-gold variant: the reference's gold is a warm local
        # MergeTree table queried repeatedly (10-50 ms band); the Spark
        # equivalent is the in-memory columnar cache + a pre-resolved
        # plan (re-collecting one DataFrame reuses its QueryExecution --
        # the prepared-statement idiom), so the timed path is pure
        # execution, not per-run Catalyst analysis.
        gold_cached = gold.cache()
        gold_cached.count()  # populate cache (setup)
        reagg_prepared = gold_cached.groupBy("status").agg(
            F.sum("order_count").alias("total_orders"),
            dsum("gross_revenue", "total_revenue"),
        )
        reagg_prepared.collect()  # warm: codegen compile (setup)
        timings["gold_reagg_cached"] = timed(lambda: reagg_prepared.collect())
        gold_cached.unpersist()
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
