"""Driver-side py4j plan-construction audit (r18 VERDICT item 5).

The r18 stage audit found a SYSTEMIC class invisible to stage metrics:
driver-side expression construction where every F.lit/F.col/operator is
a py4j gateway round-trip (~150 us each). PQ encode was 52k calls
(~8.8 s) and LSH _bucket 4k calls (~0.9 s) -- both misattributed to a
"codegen floor" for rounds because executors looked idle-clean. Fixed
by building the SAME expression tree as one SQL string
(similarity.py:_pq_sqdist_sql/_bucket are the template).

This script sweeps the remaining top SCALING 1x walls for the same
class: run each registered op once warm (JVM/codegen warmed), then run
it again under cProfile and report the cumulative time and call count
of py4j's socket round-trip (GatewayClient.send_command) against the
op's wall. A >0.5 s send_command cumtime at a warm run = the literal-
loop class; convert to a SQL-string build. Anything under that is
normal DataFrame-API chatter (every .select/.join costs a handful of
round-trips; that is not the pathology).

Usage: python scripts/py4j_audit.py [names...]
Default names: the top SCALING 1x walls named by the r18 verdict
(twolevel family, k-center, BPE, DSIR, PCA/power-iteration) that were
never stage-audited for this class.
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Top SCALING 1x walls (corpus suite, SCALING.md r18) minus the
# already-audited PQ family; ordered by 1x wall descending.
DEFAULT_NAMES = [
    "embedding_pca_top2",            # 7.30 s
    "bpe_heldout_compression",       # 3.72 s
    "embedding_power_iteration",     # 3.65 s
    "ann_twolevel_batch_recall",     # 3.18 s
    "ann_twolevel_probe_sweep",      # 3.11 s
    "semantic_dedup_twolevel_stats", # 3.00 s
    "ann_twolevel_filtered_recall",  # 2.92 s
    "leakage_safe_split_stats",      # 2.92 s
    "semantic_dedup_cascade_stats",  # 2.85 s
    "bpe_learn_merges",              # 2.62 s
    "dsir_resample_counts",          # 2.57 s
    "dsir_importance_weights",       # 2.47 s
    "greedy_kcenter_sample",         # 1.69 s (k-center, verdict-named)
]


def _py4j_stats(pr: cProfile.Profile) -> tuple[float, int, float]:
    """(send_command cumtime, ncalls, total profiled wall)."""
    buf = io.StringIO()
    st = pstats.Stats(pr, stream=buf)
    send_cum, send_n = 0.0, 0
    for (fname, _lineno, func), (cc, _nc, _tt, ct, _callers) in (
        st.stats.items()
    ):
        if "java_gateway" in fname and func == "send_command":
            # outermost send_command wrapper double-counts via
            # recursion into itself; take the max cumtime seen
            if ct > send_cum:
                send_cum, send_n = ct, cc
    return send_cum, send_n, st.total_tt


def main() -> int:
    from apache_iceberg_with_clickhouse_olake_spark.operators import (
        registry,
    )

    names = sys.argv[1:] or DEFAULT_NAMES
    queries = registry.all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown query names: {unknown}", file=sys.stderr)
        return 2

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("py4j-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    print(f"# py4j plan-construction audit at {SF_DIR}")
    print("name | wall_s | send_cum_s | send_calls | send_frac | class")
    rows = []
    for name in names:
        fn = queries[name]
        fn(spark, SF_DIR).collect()  # warm: JVM, codegen, file listing
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        fn(spark, SF_DIR).collect()
        pr.disable()
        wall = time.perf_counter() - t0
        cum, ncalls, _ = _py4j_stats(pr)
        frac = cum / wall if wall else 0.0
        verdict = (
            "LITERAL-LOOP" if cum > 0.5 else "ok"
        )
        rows.append((name, wall, cum, ncalls, frac, verdict))
        print(
            f"{name} | {wall:.2f} | {cum:.2f} | {ncalls} |"
            f" {frac:.0%} | {verdict}"
        )
    flagged = [r for r in rows if r[5] != "ok"]
    print(
        f"summary: {len(rows)} audited,"
        f" {len(flagged)} flagged (>0.5 s send_command cumtime)"
    )
    for r in flagged:
        print(f"  FLAG {r[0]}: {r[2]:.2f} s / {r[3]} gateway calls")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
