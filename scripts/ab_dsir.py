"""Idle A/B for the dsir_importance_weights dual-gate bench verdict
(r10 VERDICT "What's wrong" item 1).

Replicates the bench.py lifecycle exactly — same session settings
(local[32], shuffle=32), same warm-then-3-timed-runs shape, same
median+IQR — for a target query, so the number is comparable to the
BENCH_r10 llm_suite row (3.47 s) and the idle SCALING row (2.29-2.47 s).

Usage: python scripts/ab_dsir.py [query ...]   (default: the two suspects)
Run once per checkout (HEAD vs 4d2fbb1~1 worktree) on an idle machine.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from apache_iceberg_with_clickhouse_olake_spark.operators import registry  # noqa: E402
from apache_iceberg_with_clickhouse_olake_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or ["dsir_importance_weights",
                             "semantic_dedup_cascade_stats"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ab", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    queries["orders_by_status"](spark, sf_dir).collect()  # JVM warm

    out = {"rev": os.environ.get("AB_REV", "?"), "sf_dir": sf_dir}
    for name in names:
        queries[name](spark, sf_dir).collect()  # warm (untimed)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        out[name] = {
            "median": round(samples[1], 4),
            "iqr": round(samples[2] - samples[0], 4),
            "samples": [round(s, 4) for s in samples],
        }
    print("AB_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
