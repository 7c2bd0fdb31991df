"""Driver-side py4j plan-construction audit (r18 VERDICT item 5).

The r18 stage audit found a SYSTEMIC class invisible to stage metrics:
driver-side expression construction where every F.lit/F.col/operator is
a py4j gateway round-trip (~150 us each). PQ encode was 52k calls
(~8.8 s) and LSH _bucket 4k calls (~0.9 s) -- both misattributed to a
"codegen floor" for rounds because executors looked idle-clean. Fixed
by building the SAME expression tree as one SQL string
(similarity.py:_pq_sqdist_sql/_bucket are the template).

This script sweeps the remaining top SCALING 1x walls for the same
class. Raw cProfile cumtime of send_command is the WRONG metric: the
query's actual JVM execution also happens inside send_command round-
trips (collectToPython blocks on one call for the whole job), so
cumtime conflates execution with chatter and flags everything. The
honest discriminator is the PER-CALL duration distribution: plan-
construction chatter is ~100-300 us/call, execution/fetch calls are
ms-to-seconds. We monkey-patch GatewayClient.send_command with a
timer and split the cumulative wall into CHATTER (<5 ms calls -- the
literal-loop class lives here) vs WORK (>=5 ms calls: job execution,
collects, checkpoint writes). A warm-run chatter sum >0.5 s = the
literal-loop class; convert to a SQL-string build.

Usage: python scripts/py4j_audit.py [names...]
Default names: the top SCALING 1x walls named by the r18 verdict
(twolevel family, k-center, BPE, DSIR, PCA/power-iteration) that were
never stage-audited for this class.
"""
from __future__ import annotations

import os
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
    "pricing_summary",               # control: known-clean single agg
    "pq_adc_topk_recall",            # control: the r18-converted op
]


_CHATTER_CUTOFF = 0.005  # 5 ms: above this a call is executing work

_durations: list[float] = []


def _install_timer() -> None:
    """Wrap GatewayClient.send_command to record per-call wall."""
    from py4j.java_gateway import GatewayClient

    orig = GatewayClient.send_command

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            _durations.append(time.perf_counter() - t0)

    GatewayClient.send_command = timed


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
    _install_timer()

    print(f"# py4j plan-construction audit at {SF_DIR}")
    print(
        "name | wall_s | calls | chatter_s | chatter_calls |"
        " work_s | work_calls | class"
    )
    rows = []
    for name in names:
        fn = queries[name]
        fn(spark, SF_DIR).collect()  # warm: JVM, codegen, file listing
        _durations.clear()
        t0 = time.perf_counter()
        fn(spark, SF_DIR).collect()
        wall = time.perf_counter() - t0
        durs = list(_durations)
        chatter = [d for d in durs if d < _CHATTER_CUTOFF]
        work = [d for d in durs if d >= _CHATTER_CUTOFF]
        csum, wsum = sum(chatter), sum(work)
        verdict = "LITERAL-LOOP" if csum > 0.5 else "ok"
        rows.append((name, wall, len(durs), csum, len(chatter), verdict))
        print(
            f"{name} | {wall:.2f} | {len(durs)} | {csum:.2f} |"
            f" {len(chatter)} | {wsum:.2f} | {len(work)} | {verdict}"
        )
    flagged = [r for r in rows if r[5] != "ok"]
    print(
        f"summary: {len(rows)} audited,"
        f" {len(flagged)} flagged (>0.5 s sub-{_CHATTER_CUTOFF * 1e3:.0f}ms"
        " gateway-chatter sum)"
    )
    for r in flagged:
        print(
            f"  FLAG {r[0]}: {r[3]:.2f} s chatter across"
            f" {r[4]} gateway calls"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
