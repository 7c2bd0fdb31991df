"""Runtime recompute audit: count input-READING stages per registered query.

Static plans lie about work: a subplan that appears twice in
``explain()`` may execute once (AQE/static exchange reuse dedupes
identical subtrees) or twice (branch-specific column pruning makes the
exchanges non-identical, so the scan and everything under the branch
point re-EXECUTES -- the failure mode that made corpus_mixture_weights
tokenize the corpus twice and tfidf_top_terms three times, both caught
by this audit in r7 and re-planned as linear window chains).

This script measures the truth: run each query at sf0.001 and count the
completed stages with inputBytes > 0 via the Spark UI REST API.

Interpretation -- a count above 1 is NOT automatically a bug:
  * joins of k distinct tables read k times (revenue_by_nation: 3);
  * checkpointed iterations re-read their checkpoints by design
    (dedup_cluster_sizes, the streaming twins, lake readback ops);
  * self-joins of one derived frame SHOULD count once -- both sides
    reuse the same exchange when pruning is identical (the LSH pair
    ops measure 2: bands once + shingle-verify once);
  * a deliberate rescan can beat the alternative: see
    unigram_logprob_quality's docstring (broadcast-total branch vs a
    vocabulary-sized single-partition window).
Investigate when the count exceeds the op's distinct legitimate
inputs; the fix is usually a keyed or rank-RANGE window over the
already-aggregated frame (quality_length_pareto, tfidf_top_terms) or
an unbounded window over a cardinality-bounded rollup
(corpus_mixture_weights).

Usage: python scripts/stage_audit.py [names...]   (default: all)
"""
from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    from apache_iceberg_with_clickhouse_olake_spark.operators import registry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("stage-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    only = sys.argv[1:]
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    seen: set[int] = set()

    def completed():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE"
        ) as r:
            return json.load(r)

    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            qs[name](spark, SF_DIR).count()
            stages = completed()
            new = [s for s in stages if s["stageId"] not in seen]
            seen |= {s["stageId"] for s in stages}
            n = len([s for s in new if s["inputBytes"] > 0])
            print(f"{n:3d}  {name}", flush=True)
        except Exception as e:  # pragma: no cover - diagnostic path
            print(f"ERR  {name}: {str(e)[:80]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
