"""Microbench: HOF-fold dot product vs unrolled codegen sum (r19).

The quadratic pair joins (semantic_dedup family, embedding near-dup,
paraphrase mining) pay `_dot` per pair: aggregate(zip_with(a, b, *), 0.0,
+) -- a higher-order function, which is CodegenFallback in Spark: the
containing WholeStageCodegen stage calls Expression.eval per row,
allocating a 64-element ArrayData per pair and dispatching two lambda
closures per element. An UNROLLED fixed-dim sum
((0.0 + a[0]*b[0]) + a[1]*b[1]) + ... is plain arithmetic on GetArrayItem
nodes, fully codegen'd. IEEE addition order is identical (left fold from
0.0), so results are bit-identical; on short arrays (never in our
fixtures, dim is pinned 64) the HOF yields NULL via zip_with padding and
the unrolled form yields NULL via out-of-range [] access -- also
identical.

This script times both on the twolevel pair-join shape (the spread
corpus regime: ~1M within-leaf pairs) and checks bit-identity.

Usage: python scripts/dot_microbench.py [n_vectors]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from apache_iceberg_with_clickhouse_olake_spark.session import get_spark

DIM = 64


def unrolled_dot_sql(a: str, b: str, dim: int = DIM) -> str:
    expr = "0.0D"
    for i in range(dim):
        expr = f"({expr} + {a}[{i}] * {b}[{i}])"
    return expr


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dot-microbench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Synthetic leaves of ~250 vectors: the twolevel pair-join regime.
    leaf_size = 250
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") / leaf_size).cast("long").alias("leaf"),
        F.expr(
            "transform(sequence(0, 63), i ->"
            " CAST(sin(id * 0.37 + i * 1.13) AS DOUBLE))"
        ).alias("dv"),
    )
    base = base.persist()
    base.count()

    a, b = base.alias("a"), base.alias("b")
    join_cond = (
        (F.col("a.leaf") == F.col("b.leaf"))
        & (F.col("a.vec_id") < F.col("b.vec_id"))
    )

    hof_dot = F.aggregate(
        F.zip_with(F.col("a.dv"), F.col("b.dv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    unrolled = F.expr(unrolled_dot_sql("a.dv", "b.dv"))
    variants = {
        "hof": a.join(b, join_cond).select(hof_dot.alias("d")),
        "unrolled": a.join(b, join_cond).select(unrolled.alias("d")),
    }
    samples: dict[str, list[float]] = {k: [] for k in variants}
    # warm both (codegen compile, shuffle reuse) then interleave A/B/A/B
    # so ambient drift hits both variants equally (ab_dsir discipline).
    for name, df in variants.items():
        df.write.format("noop").mode("overwrite").save()
    for run in range(5):
        for name, df in variants.items():
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            print(f"  {name} run{run}: {dt:.3f}s", flush=True)
    for name, vals in samples.items():
        vals.sort()
        print(f"{name}: median {vals[len(vals) // 2]:.3f}s "
              f"min {vals[0]:.3f}s max {vals[-1]:.3f}s")

    # Bit-identity on a sample of pairs (both full collect on n<=2000).
    small_a = base.filter(F.col("vec_id") < 500).alias("a")
    small_b = base.filter(F.col("vec_id") < 500).alias("b")
    x = (
        small_a.join(small_b, join_cond)
        .select(
            F.col("a.vec_id").alias("i"), F.col("b.vec_id").alias("j"),
            hof_dot.alias("h"), unrolled.alias("u"),
        )
        .collect()
    )
    bad = [r for r in x if (r.h is None) != (r.u is None)
           or (r.h is not None and r.h != r.u)]
    print(f"identity check: {len(x)} pairs, {len(bad)} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
