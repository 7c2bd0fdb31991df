"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit": "sec", "queries": {...}, "sf"}.

The headline set mirrors the reference's performance-comparison suite
(scripts/compare-query-performance.sql Tests 1-4 + the medallion gold
build) plus the heaviest fact-table queries, so the number tracks the
BASELINE.md bands (raw group-by 2-5 s / silver 0.5-2 s / gold 10-50 ms at
the reference's scale).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from apache_iceberg_with_clickhouse_olake_spark.session import get_spark

HEADLINE = (
    "orders_by_status",       # Test 1: raw group-by
    "monthly_revenue",        # Test 2: month x status rollup
    "high_value_orders",      # Test 3: multi-predicate filter
    "unique_customers",       # Test 4: exact distinct
    "gold_order_metrics",     # medallion gold build
    "gold_reaggregate",       # gold re-aggregation (the 10-50 ms class)
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

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

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
