"""Driver simulation: run every __spark_entry__ query at sf0.01 vs DuckDB oracle.

Mirrors the grading driver: row-count + schema + order-insensitive
value comparison. Prints MATCH/MISMATCH/ERROR per query name.
"""
from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from tests.oracle_utils import (
    canon_rows,
    duck_result_typed,
    spark_coltypes,
    spark_result,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = e.entry(spark).count()
    print(f"entry: {n} rows", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    only = sys.argv[1:]
    match = mismatch = err = rows_only = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            cols, rows = spark_result(df)
            if name not in oracles:
                print(f"ROWSONLY  {name}: {len(rows)} rows ({time.time()-t0:.1f}s)", flush=True)
                rows_only += 1
                continue
            ocols, orows, d_types = duck_result_typed(con, oracles[name])
            a = canon_rows(cols, rows)
            b = canon_rows(ocols, orows)
            s_types = spark_coltypes(df)
            drift = {
                c: (s_types[c], d_types.get(c))
                for c in s_types
                if s_types[c] != d_types.get(c)
            }
            if sorted(cols) != sorted(ocols):
                print(f"MISMATCH  {name}: schema {sorted(cols)} vs {sorted(ocols)}", flush=True)
                mismatch += 1
            elif drift:
                print(f"MISMATCH  {name}: dtype drift (spark,duck) {drift}", flush=True)
                mismatch += 1
            elif a != b:
                diff_a = [r for r in a if r not in set(b)][:2]
                diff_b = [r for r in b if r not in set(a)][:2]
                print(
                    f"MISMATCH  {name}: {len(a)} vs {len(b)} rows; spark-only={diff_a} oracle-only={diff_b}",
                    flush=True,
                )
                mismatch += 1
            else:
                print(f"MATCH     {name}: {len(a)} rows ({time.time()-t0:.1f}s)", flush=True)
                match += 1
        except Exception:
            print(f"ERROR     {name}:\n{traceback.format_exc()}", flush=True)
            err += 1
    print(f"\nsummary: {match} match, {mismatch} mismatch, {err} error, {rows_only} rows-only")

    # r5 verdict item 7: make the Iceberg-gated surface visible in every
    # round's driver artifacts, so the record shows exactly which ops
    # still ride the parquet fallback in this sandbox.
    from apache_iceberg_with_clickhouse_olake_spark.sources.lake import (
        gated_surface_report,
    )

    for line in gated_surface_report(spark):
        print(line)
    return 1 if (mismatch or err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
