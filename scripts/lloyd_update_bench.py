"""Isolate the Lloyd-update cost (r19): posexplode+davg vs wide agg.

Variants over the same assigned frame (vec_id, dv[64], cluster):
  A. current: posexplode -> groupBy(cluster, dim) davg -> collect_list
  B. wide: groupBy(cluster) with 64 per-component davg aggs -> array
  C. wide-double: same as B but plain double avg (isolates the decimal cost)

All three reduce to a k-row centroid frame; A and B must be
bit-identical (same per-(cluster,dim) value multiset into the same
exact-decimal avg).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from apache_iceberg_with_clickhouse_olake_spark.functions import davg
from apache_iceberg_with_clickhouse_olake_spark.session import get_spark

DIM = 64


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    k = 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("lloyd-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % k).alias("cluster"),
        F.expr(
            "transform(sequence(0, 63), i ->"
            " CAST(round(CAST(sin(id * 0.37 + i * 1.13) AS DECIMAL(30,6)),"
            " 4) AS DOUBLE))"
        ).alias("dv"),
    ).persist()
    base.count()

    a = (
        base.select("cluster", F.posexplode("dv").alias("dim", "x"))
        .groupBy("cluster", "dim")
        .agg(davg("x", "c"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("s"))
        .select("cluster", F.transform("s", lambda t: t["c"]).alias("cv"))
    )
    b = base.groupBy("cluster").agg(
        F.array(*[davg(F.col("dv")[i]) for i in range(DIM)]).alias("cv")
    ).select("cluster", "cv")
    c = base.groupBy("cluster").agg(
        F.array(
            *[
                F.round(F.avg(F.col("dv")[i]).cast("decimal(30,6)"), 4)
                .cast("double")
                for i in range(DIM)
            ]
        ).alias("cv")
    ).select("cluster", "cv")

    variants = {"A_posexplode": a, "B_wide_davg": b, "C_wide_dblavg": c}
    for name, df in variants.items():
        df.write.format("noop").mode("overwrite").save()  # warm
    samples = {kk: [] for kk in variants}
    for run in range(5):
        for name, df in variants.items():
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
    for name, vals in samples.items():
        vals.sort()
        print(f"{name}: median {vals[len(vals) // 2]:.3f}s min {vals[0]:.3f}s"
              f" max {vals[-1]:.3f}s")

    ra = {r["cluster"]: r["cv"] for r in a.collect()}
    rb = {r["cluster"]: r["cv"] for r in b.collect()}
    same = all(ra[kk] == rb[kk] for kk in ra) and set(ra) == set(rb)
    print(f"A==B bit-identical: {same}")
    return 0 if same else 1


if __name__ == "__main__":
    raise SystemExit(main())
