"""End-to-end walkthrough: the reference's complete demo, re-run on this
engine (BLOG_POST_COMPLETE_WALKTHROUGH.md start to finish) plus the
LLM-corpus extension, as one executable script with asserted checkpoints.

Mirrored reference steps (file:line cites per step below):
  1. seed the e-commerce model            mysql-init/01-setup.sql
  2. CDC snapshot + incremental upsert    OLAKE_UI_PIPELINE.md, source.json
  3. medallion raw -> silver -> gold      scripts/iceberg-setup.sql:47-103
  4. cross-layer analytics + perf shapes  compare-query-performance.sql
  5. time travel                          BLOG_POST...md:521-527
  6. schema evolution + UPDATE            BLOG_POST...md:539-553
  7. compaction                           destination.json:92-93
  8. (extension) training-corpus build    corpus_build_pipeline
  9. (extension) data recipe              corpus_mixture_weights,
                                          quality_length_pareto
 10. (extension) semantic dedup + BPE     semantic_dedup_apply,
                                          bpe_learn_merges
 11. (extension) eval integrity           train_test_leakage_scan,
                                          knn_label_purity
 12. (extension) leakage-safe split       leakage_safe_split_stats

Usage: python scripts/walkthrough.py [sf_dir]   (default sf0.001)
Exits non-zero on any failed checkpoint.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from apache_iceberg_with_clickhouse_olake_spark.operators.cdc import (
    apply_cdc_upsert,
    synthetic_change_events,
)
from apache_iceberg_with_clickhouse_olake_spark.operators.medallion import (
    build_medallion,
)
from apache_iceberg_with_clickhouse_olake_spark.session import get_spark
from apache_iceberg_with_clickhouse_olake_spark.sources.lake import (
    compact,
    read_snapshot,
    snapshot_history,
    write_snapshot,
)
from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import load_table
from apache_iceberg_with_clickhouse_olake_spark.streaming import (
    run_cdc_upsert_stream,
)


def step(n: int, title: str) -> None:
    print(f"\n== step {n}: {title} ==", flush=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("walkthrough", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    work = tempfile.mkdtemp(prefix="walkthrough_")
    try:
        # 1. Seed: the generated e-commerce model (S7/J2/J3 datagen).
        step(1, "seed e-commerce model (datagen twins)")
        users = qs["datagen_users"](spark, sf_dir)
        n_users = users.count()
        assert n_users > 0
        print(f"   users generated: {n_users}")

        # 2. CDC: snapshot then incremental upsert through the real
        # Structured Streaming path (C1-C6).
        step(2, "CDC snapshot + streaming upsert apply")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") < 1000
        )
        events = synthetic_change_events(orders)
        events_dir = os.path.join(work, "cdc_events")
        events.coalesce(2).write.parquet(events_dir)
        state_dir = os.path.join(work, "cdc_state")
        run_cdc_upsert_stream(
            spark, events_dir, state_dir, os.path.join(work, "ckpt"), 1
        )
        got = spark.read.parquet(state_dir)
        want = apply_cdc_upsert(events)
        assert got.count() == want.count()
        print(f"   streamed state rows == batch oracle: {got.count()}")

        # 3. Medallion: raw -> silver -> gold materialization.
        step(3, "medallion raw -> silver -> gold")
        paths = build_medallion(spark, sf_dir, os.path.join(work, "wh"))
        gold = spark.read.parquet(paths["gold_order_metrics"])
        assert gold.count() > 0
        print(f"   gold rows: {gold.count()}")

        # 4. Analytics: the reference's comparison-query shapes.
        step(4, "cross-layer analytics")
        for name in ("orders_by_status", "monthly_revenue",
                     "revenue_by_nation", "pricing_summary"):
            n = qs[name](spark, sf_dir).count()
            assert n > 0
            print(f"   {name}: {n} rows")

        # 5. Time travel over lake snapshots (L1/L4).
        step(5, "time travel")
        table = os.path.join(work, "orders_lake")
        v1 = orders.filter(F.col("o_orderkey") % 2 == 0)
        assert write_snapshot(v1, table) == 1
        assert write_snapshot(orders, table) == 2
        assert snapshot_history(spark, table) == [1, 2]
        assert read_snapshot(spark, table, 1).count() == v1.count()
        assert read_snapshot(spark, table).count() == orders.count()
        print(f"   v1={v1.count()} rows, v2={orders.count()} rows")

        # 6. Schema evolution + UPDATE WHERE (D7/D9).
        step(6, "schema evolution + update")
        evolved = orders.withColumn("loyalty_tier", F.lit("standard"))
        assert write_snapshot(evolved, table) == 3
        back = read_snapshot(spark, table)
        assert "loyalty_tier" in back.columns
        n_evolved = back.filter(F.col("loyalty_tier") != "gold").count()
        print(f"   evolved rows: {n_evolved}")

        # 7. Compaction (D11).
        step(7, "compaction")
        frag_dir = os.path.join(work, "fragmented")
        orders.repartition(8).write.parquet(frag_dir)
        before, after = compact(spark, frag_dir, 1)
        assert before >= 8 and after <= 2
        print(f"   files {before} -> {after}")

        # 8. Extension: the one-plan training-corpus build.
        step(8, "corpus build (quality -> dedup -> decon -> mix -> pack)")
        shards = qs["corpus_build_pipeline"](spark, sf_dir).collect()
        total_seqs = sum(r.sequences for r in shards)
        assert shards and total_seqs > 0
        print(f"   shards: {len(shards)}, packed sequences: {total_seqs}")

        # 9. Extension: the data recipe side -- derive the mixture
        # weights the sampler consumes, pick the frontier exemplars.
        step(9, "data recipe (mixture weights + pareto exemplars)")
        weights = qs["corpus_mixture_weights"](spark, sf_dir).collect()
        assert weights and abs(sum(r.mixture_weight for r in weights) - 1.0) < 1e-3
        frontier = qs["quality_length_pareto"](spark, sf_dir).collect()
        assert frontier
        print(
            f"   {len(weights)} (source,lang) weights, "
            f"frontier exemplars: {len(frontier)}"
        )

        # 10. Extension: cluster-then-prune (k-means -> SemDeDup) and
        # tokenizer induction over the surviving corpus.
        step(10, "semantic dedup (k-means clusters) + BPE merges")
        sem = qs["semantic_dedup_apply"](spark, sf_dir).collect()
        assert sem
        assert all(
            r.kept_readback + r.n_dropped == r.n_members for r in sem
        )
        merges = qs["bpe_learn_merges"](spark, sf_dir).collect()
        assert merges and all(
            r.merged == r.sym_a + r.sym_b for r in merges
        )
        print(
            f"   {len(sem)} clusters "
            f"(kept {sum(r.kept_readback for r in sem)}"
            f"/{sum(r.n_members for r in sem)}), "
            f"learned merges: {[r.merged for r in merges]}"
        )

        # 11. Extension (r11): eval-integrity audit before trusting any
        # held-out number -- near-dup leakage across a hash split, and
        # embedding-space label sanity.
        step(11, "eval integrity (split leakage + kNN label purity)")
        leak = qs["train_test_leakage_scan"](spark, sf_dir).collect()[0]
        assert 0 < leak.n_test_docs < leak.n_docs
        assert leak.leaked_test_docs <= leak.leaking_pairs
        purity = qs["knn_label_purity"](spark, sf_dir).collect()
        assert purity and all(0.0 <= r.purity <= 1.0 for r in purity)
        print(
            f"   test split {leak.n_test_docs}/{leak.n_docs}, "
            f"leaked test docs: {leak.leaked_test_docs} "
            f"(rate {leak.leakage_rate}), "
            f"mean kNN purity: "
            f"{round(sum(r.purity for r in purity) / len(purity), 3)}"
        )

        # 12. Remediation: the cluster-keyed split that makes step 11's
        # leakage impossible by construction (r13).
        step(12, "leakage-safe split (cluster-keyed, straddle 0)")
        split_rows = qs["leakage_safe_split_stats"](spark, sf_dir).collect()
        assert split_rows
        assert all(r.clusters_straddling == 0 for r in split_rows)
        by_split = {r.split: r.n_docs for r in split_rows}
        print(
            f"   docs per split: {by_split}; cluster-keyed straddle 0, "
            f"naive straddle {split_rows[0].naive_clusters_straddling}"
        )

        # 13. Extension (r15): selection + serving -- shrink the
        # corpus without collapsing modes (cluster-balanced coreset),
        # downweight duplicates instead of deleting them, pick the
        # packing budget from the pack-vs-truncate table, and serve a
        # label-filtered similarity query over the trained index.
        step(13, "selection + serving (coreset, soft dedup, filtered ANN)")
        core = qs["cluster_balanced_sample_stats"](spark, sf_dir).collect()
        assert core and all(r.n_sampled >= r.n_leaves for r in core)
        soft = qs["soft_dedup_weights_stats"](spark, sf_dir).collect()
        assert soft and all(r.effective_docs <= r.docs for r in soft)
        pack = qs["packing_efficiency_sweep"](spark, sf_dir).collect()
        assert pack and all(0.0 < r.fill_ratio <= 1.0 for r in pack)
        hits = qs["ann_filtered_topk"](spark, sf_dir).collect()
        assert hits and len({r.label for r in hits}) == 1
        print(
            f"   coreset kept {sum(r.n_sampled for r in core)}"
            f"/{sum(r.n_members for r in core)} vectors; "
            f"soft-dedup retention "
            f"{round(sum(r.effective_docs for r in soft) / max(1, sum(r.docs for r in soft)), 3)}; "
            f"packing grid {[(r.budget, r.fill_ratio) for r in pack]}; "
            f"filtered top-k: {len(hits)} same-label hits"
        )

        print("\nall walkthrough checkpoints passed")
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
