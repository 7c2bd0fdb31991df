"""Plan-property regression tests: the physical characteristics the 100 TB
story depends on (pushdown, pruning, no forced broadcast of scaling
tables, no needless global sorts) plus declared-schema pinning."""

from __future__ import annotations

import pytest

from apache_iceberg_with_clickhouse_olake_spark import schemas
from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from apache_iceberg_with_clickhouse_olake_spark.plans import (
    analyzed_plan,
    assert_no_global_sort,
    assert_pushed_filter,
    assert_scan_columns_at_most,
    physical_plan,
)
from apache_iceberg_with_clickhouse_olake_spark.sources.datagen import (
    gen_orders,
    gen_products,
    gen_sessions,
    gen_users,
)
from apache_iceberg_with_clickhouse_olake_spark.sources.multimodal import gen_media
from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import BROADCAST_DIMS

registry._load_all()
_Q = {name: spec.fn for name, spec in registry.REGISTRY.items()}


def test_broadcast_dims_exclude_scaling_tables():
    # customer/part/orders/lineitem grow linearly with scale: an explicit
    # broadcast hint would override AQE and OOM executors at 100 TB.
    assert BROADCAST_DIMS <= {"region", "nation", "supplier"}


def test_pricing_summary_pushes_shipdate_filter(spark, sf_dir):
    assert_pushed_filter(_Q["pricing_summary"](spark, sf_dir), "l_shipdate")


def test_high_value_orders_pushes_price_filter(spark, sf_dir):
    assert_pushed_filter(_Q["high_value_orders"](spark, sf_dir), "o_totalprice")


def test_pricing_summary_prunes_columns(spark, sf_dir):
    assert_scan_columns_at_most(
        _Q["pricing_summary"](spark, sf_dir),
        "lineitem",
        {
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        },
    )


@pytest.mark.parametrize(
    "name", ["silver_projection", "scalar_functions", "dedup_keep_first"]
)
def test_per_row_projections_have_no_global_sort(spark, sf_dir, name):
    assert_no_global_sort(_Q[name](spark, sf_dir))


@pytest.mark.parametrize(
    "name", ["revenue_by_nation", "segment_lineitem_revenue", "order_part_lookup"]
)
def test_no_broadcast_hint_on_scaling_tables(spark, sf_dir, name):
    """Explicit broadcast hints may only cover the fixed-size dims; the
    scans of customer/part/orders/lineitem must not sit under one. Hints
    appear as ResolvedHint nodes in the analyzed plan; we assert every
    hinted subtree references only safe dims."""
    plan = analyzed_plan(_Q[name](spark, sf_dir))
    blocks = plan.split("ResolvedHint")[1:]
    for block in blocks:
        scan_part = block[:2000].lower()
        for bad in ("customer.parquet", "part.parquet", "orders.parquet",
                    "lineitem.parquet"):
            assert bad not in scan_part, f"broadcast hint over {bad} in {name}"


def test_generator_schemas_pinned(spark):
    cases = [
        (gen_users(spark), schemas.USERS_SCHEMA),
        (gen_products(spark), schemas.PRODUCTS_SCHEMA),
        (gen_orders(spark), schemas.ORDERS_SCHEMA),
        (gen_sessions(spark), schemas.SESSIONS_SCHEMA),
    ]
    for df, expected in cases:
        assert schemas.names_and_types(df.schema) == schemas.names_and_types(
            expected
        )


def test_media_schema_pinned(spark, sf_dir):
    assert schemas.names_and_types(
        gen_media(spark, sf_dir).schema
    ) == schemas.names_and_types(schemas.MEDIA_SCHEMA)


def test_whole_stage_codegen_active(spark, sf_dir):
    """The hot aggregation path must stay inside whole-stage codegen
    (JVM-side, no Python in the loop)."""
    df = _Q["orders_by_status"](spark, sf_dir)
    df.collect()  # finalize AQE
    plan = physical_plan(df)
    # codegen stages surface as "*(n)" markers in the plan string
    assert "*(1)" in plan and "HashAggregate" in plan
    # map-side partial aggregation must precede the shuffle
    assert "partial_count" in plan


def test_partitioned_read_prunes_directories(spark, sf_dir, tmp_path):
    """A filter on partition columns must land in PartitionFilters (pruned
    at file-listing time), not as a post-scan data filter."""
    from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
        load_table,
    )
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    part_dir = str(tmp_path / "orders_partitioned")
    (
        orders.withColumn("order_year", F.year("o_orderdate").cast("int"))
        .write.partitionBy("order_year", "o_orderstatus")
        .parquet(part_dir)
    )
    back = spark.read.parquet(part_dir).filter(
        (F.col("order_year") == 1995) & (F.col("o_orderstatus") == "O")
    )
    plan = physical_plan(back.groupBy().count())
    scan = next(line for line in plan.splitlines() if "FileScan" in line)
    pf = scan.split("PartitionFilters:")[1].split("]")[0]
    assert "order_year" in pf and "o_orderstatus" in pf


def test_survey_inventory_fully_covered():
    """Every SURVEY.md §2 operator id must map to a registered query tag
    or a documented non-query implementation (scripts/gen_coverage.py)."""
    # id list inlined from scripts/gen_coverage.py (not an importable pkg)
    groups = [("S", 7), ("P", 9), ("J", 3), ("A", 11), ("O", 5), ("U", 3),
              ("F", 16), ("D", 13), ("C", 6), ("L", 4)]
    non_query = {"S5", "C2", "C6", "D10", "D13", "L3"}
    tags = set()
    for spec in registry.REGISTRY.values():
        tags.update(spec.tags)
    missing = [
        f"{p}{i}"
        for p, n in groups
        for i in range(1, n + 1)
        if f"{p}{i}" not in tags and f"{p}{i}" not in non_query
    ]
    assert not missing, f"uncovered SURVEY ids: {missing}"


def test_uniform_sample_is_take_ordered(spark, sf_dir):
    # the hash-order k-sample must plan as TakeOrderedAndProject
    # (per-partition heap + driver merge), never a global sort shuffle
    plan = physical_plan(_Q["uniform_hash_sample"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_decontamination_is_broadcast_equi_join(spark, sf_dir):
    # probe side broadcast, corpus side never shuffled before the join
    plan = physical_plan(_Q["decontamination_scan"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sequence_packing_reuses_shard_partitioning(spark, sf_dir):
    # the window cumsum shuffles once on shard; the per-shard rollup must
    # reuse that partitioning (no second hash exchange on the same key)
    plan = physical_plan(_Q["sequence_packing_stats"](spark, sf_dir))
    hash_exchanges = plan.count("Exchange hashpartitioning")
    assert hash_exchanges <= 1, plan


def test_bucketed_lookup_prunes_buckets(spark, sf_dir):
    # the bucketed table is a persistent hash index: an equality filter
    # on the bucket key must scan 1 bucket, not the whole table (D10)
    from pyspark.sql import functions as F

    from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
        load_table,
    )

    tbl = "orders_bucketed_plan_test"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    # autoBucketedScan drops bucketed reading when it sees no benefit;
    # bucket PRUNING is the benefit here, so pin it on for the assert
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        (
            load_table(spark, sf_dir, "orders")
            .write.bucketBy(16, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .saveAsTable(tbl)
        )
        plan = physical_plan(
            spark.table(tbl).filter(F.col("o_custkey") == 1)
        )
        assert "SelectedBucketsCount: 1 out of 16" in plan, plan
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_simhash_pairs_join_is_bucketed_not_allpairs(spark, sf_dir):
    # the band self-join must be an equi-join on (band_id, band_val) --
    # a cartesian/NLJ would mean the LSH bucketing degenerated to all-pairs
    plan = physical_plan(_Q["simhash_neardup_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_value_tier_range_join_broadcasts_constant_dim(spark, sf_dir):
    # a non-equi band join against a 4-row literal dim must broadcast the
    # dim (NLJ over a constant build side), never shuffle the fact table
    plan = physical_plan(_Q["order_value_tier_stats"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_pivot_is_single_aggregate_no_explosion(spark, sf_dir):
    # explicit pivot values => one scan, partial+final hash aggregate,
    # no Expand/Generate row amplification and no extra jobs
    plan = physical_plan(_Q["monthly_status_pivot"](spark, sf_dir))
    assert "HashAggregate" in plan
    assert "Generate" not in plan
    assert plan.count("FileScan") == 1


def test_sliding_windows_single_shuffle(spark, sf_dir):
    # explode(2 windows/event) then ONE shuffle keyed by window start;
    # countDistinct adds its expand/agg but no second scan of events
    plan = physical_plan(_Q["events_sliding_windows"](spark, sf_dir))
    assert plan.count("FileScan") == 1


def test_salted_join_keys_include_salt(spark, sf_dir):
    # the whole point of salting: the physical join key must be
    # (custkey, _salt), not custkey alone, so hot keys spread over
    # _JOIN_SALT reducers; and replication must not degenerate to NLJ
    plan = physical_plan(_Q["salted_skew_join"](spark, sf_dir))
    assert "_salt" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_pairs_have_no_distinct_shuffle(spark, sf_dir):
    # candidate-pair dedup must be the first-matching-band FILTER (band
    # hashes ride the exploded rows), not distinct(): a distinct would
    # hash-aggregate + reshuffle the quadratic candidate stream before
    # the Jaccard-verify joins
    plan = physical_plan(_Q["minhash_lsh_candidates"](spark, sf_dir))
    assert "HashAggregate" not in plan, plan
    assert "REPARTITION_BY_NUM" in plan, plan


def test_simhash_pairs_have_no_distinct_shuffle(spark, sf_dir):
    # pair dedup must be the first-matching-band FILTER, not distinct():
    # a distinct would hash-aggregate + reshuffle the quadratic pair
    # stream -- only the two band-join exchanges may appear
    plan = physical_plan(_Q["simhash_neardup_pairs"](spark, sf_dir))
    assert "HashAggregate" not in plan, plan
    # 4 allowed exchanges = 2x REPARTITION_BY_NUM fan-outs (UDF + band
    # bucketing, one per self-join branch); none may be an aggregate
    assert plan.count("Exchange hashpartitioning") <= 4, plan
    assert "REPARTITION_BY_NUM" in plan, plan


def test_embedding_neardup_join_keyed_on_lsh_band(spark, sf_dir):
    # the self-join must be an equi-join whose key includes the LSH
    # band_val (bucket granularity that scales with the corpus), not the
    # label alone (fixed cardinality => per-bucket linear growth =>
    # quadratic pair loop at scale); pair dedup must be the
    # first-matching-band filter, not a distinct() shuffle
    plan = physical_plan(_Q["embedding_near_dup_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "band_val" in plan, plan
    assert "HashAggregate" not in plan, plan
    # The pair join's shuffle granularity is pinned by an explicit
    # repartition on the band keys (exempt from AQE byte-based
    # coalescing): pair enumeration amplifies compute quadratically per
    # bucket, so coalescing this stage by shuffle bytes starves it of
    # parallelism and one hot-bucket partition becomes the straggler.
    assert "REPARTITION_BY_NUM" in plan, plan


def test_dedup_cascade_pair_join_sees_representatives_only(spark, sf_dir):
    # the cascade's whole point: minhash banding must consume the
    # MATERIALIZED representative set (localCheckpoint superstep -- the
    # fingerprint window runs once, not once per consuming branch), in
    # one composed plan with no cartesian and no distinct over pairs.
    # The checkpoint cuts lineage, so the final plan shows the banding
    # reading from the materialized RDD rather than re-deriving reps.
    plan = physical_plan(_Q["dedup_cascade_stats"](spark, sf_dir))
    # (the two 1-row stat crossJoins legitimately appear as broadcast
    # NLJ-Cross -- only a cartesian over DATA rows would be a bug)
    assert "ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "band_hash" in plan, plan


def test_embedding_cascade_pair_join_sees_representatives_only(spark, sf_dir):
    plan = physical_plan(_Q["embedding_dedup_cascade_stats"](spark, sf_dir))
    assert "ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "band_val" in plan, plan


def test_corpus_build_pipeline_two_data_shuffles(spark, sf_dir):
    """The flagship composition must stay a two-data-shuffle plan: one
    window exchange keyed by the dedup fingerprint, one keyed by the
    packing shard (which the per-shard rollup then REUSES -- the final
    aggregate may not introduce a third data exchange). Decontamination
    must ride a one-row broadcast (BNLJ-Cross over the collected probe
    hashes), never a data-scale cartesian, and the only SinglePartition
    exchange is the 5-row probe collect."""
    df = _Q["corpus_build_pipeline"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    # data shuffles: exactly the two window exchanges (fp + shard)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "hashpartitioning(fp#" in plan, plan
    assert "hashpartitioning(shard#" in plan, plan
    # the rollup reuses the shard partitioning: every HashAggregate keyed
    # by shard sits above the shard window with no exchange between
    assert plan.count("Exchange SinglePartition") == 1, plan
    # presentation sort of <= n_shards rows is the only range exchange
    assert plan.count("Exchange rangepartitioning") == 1, plan


def test_corpus_build_pipeline_prunes_documents_scan(spark, sf_dir):
    """The composition touches only doc_id/lang/text of documents (and
    the probe branch doc_id/text); source/n_chars must never be read —
    at 100 TB an unpruned column is terabytes of wasted IO."""
    assert_scan_columns_at_most(
        _Q["corpus_build_pipeline"](spark, sf_dir),
        "documents",
        {"doc_id", "lang", "text"},
    )


def test_repetition_and_pii_scans_prune(spark, sf_dir):
    assert_scan_columns_at_most(
        _Q["doc_repetition_stats"](spark, sf_dir),
        "documents",
        {"doc_id", "lang", "text"},
    )
    assert_scan_columns_at_most(
        _Q["pii_redaction_stats"](spark, sf_dir),
        "documents",
        {"doc_id", "source", "text"},
    )


def test_semantic_search_shape(spark, sf_dir):
    # top-k must be TakeOrderedAndProject; the metadata join happens on
    # the k winners (no cartesian); documents scan pruned to the four
    # columns the result needs
    df = _Q["semantic_search_topk"](spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert_scan_columns_at_most(
        df, "documents", {"doc_id", "lang", "source", "text"}
    )


def test_crossmodal_agreement_no_cartesian(spark, sf_dir):
    # band-keyed candidate join + doc_id-keyed shingle joins only; the
    # text payload must never ride the band explosion (no BNLJ over
    # data-scale frames, no cartesian)
    plan = physical_plan(_Q["crossmodal_neardup_agreement"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "band_val" in plan, plan


def test_sketch_only_twins_have_no_exact_distinct(spark, sf_dir):
    # the production sketch paths must never pay the exact countDistinct
    # their bounds-oracle verification variants fuse in (r5 ADVICE): one
    # sketch aggregate, no distinct expansion anywhere in the plan
    from apache_iceberg_with_clickhouse_olake_spark.operators.analytics import (
        daily_users_hll_sketch,
        unique_customers_sketch,
    )

    plan = physical_plan(unique_customers_sketch(spark, sf_dir))
    assert "approx_count_distinct" in plan, plan
    assert "count(distinct" not in plan.lower(), plan
    plan = physical_plan(daily_users_hll_sketch(spark, sf_dir))
    assert "hll_union_agg" in plan, plan
    assert "count(distinct" not in plan.lower(), plan


def test_ann_topk_plans_are_bucket_local_take_ordered(spark, sf_dir):
    """The ANN family's 100 TB contract: top-k is TakeOrderedAndProject
    (never a global sort), candidate selection is a broadcast HASH join
    keyed on the bucket/cell column (never an all-pairs cartesian), so
    the scored fraction of the corpus is bucket-local by plan shape,
    not by luck. ann_ivf_topk keeps one BroadcastNestedLoopJoin -- the
    single-row query-vector attach, constant-size at any corpus scale
    (same accepted shape as the value-tier constant dim)."""
    import re

    for name in ("ann_lsh_bucketed_topk", "ann_multiprobe_topk"):
        plan = physical_plan(_Q[name](spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, (name, plan)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)
        joins = re.findall(r"BroadcastHashJoin \[(\w+)#", plan)
        assert joins and all(k == "bucket" for k in joins), (name, joins)

    plan = physical_plan(_Q["ann_ivf_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    joins = re.findall(r"BroadcastHashJoin \[(\w+)#", plan)
    assert joins and all(k == "label" for k in joins), joins


def test_doc_contamination_probe_set_is_broadcast(spark, sf_dir):
    # probe hash set broadcast (shingle side streams past it map-side);
    # the only sort-merge joinable step is the per-doc hit join-back,
    # and nothing may degenerate to a cartesian / BNLJ
    plan = physical_plan(_Q["doc_contamination_fraction"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_quality_threshold_sweep_single_pass(spark, sf_dir):
    # one documents scan crossed with the broadcast 6-row grid -- never a
    # rescan per threshold; the cross join must be the broadcast
    # constant-grid shape, not a data-scale cartesian
    df = _Q["quality_threshold_sweep"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("Scan parquet") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert_scan_columns_at_most(df, "documents", {"text"})


def test_keep_best_dedup_reuses_fingerprint_exchange(spark, sf_dir):
    # both policy windows ride ONE fingerprint shuffle: a single
    # hashpartitioning(fp) exchange, two in-partition sorts, no join
    plan = physical_plan(_Q["dedup_keep_best_quality"](spark, sf_dir))
    import re

    fp_exchanges = len(re.findall(r"Exchange hashpartitioning\(fp", plan))
    assert fp_exchanges == 1, plan
    assert "Join" not in plan, plan


def test_pareto_frontier_single_scan_linear_chain(spark, sf_dir):
    # the skyline must plan as ONE documents scan feeding a linear
    # window chain -- the aggregate-and-join-back shape it replaced
    # planned the scan (and the phase-1 window) twice
    df = _Q["quality_length_pareto"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert_scan_columns_at_most(df, "documents", {"doc_id", "lang", "text"})


def test_mixture_weights_single_scan_rollup_window(spark, sf_dir):
    # ONE documents scan: normalization is an unbounded window over the
    # (source, lang) rollup — document rows collapse in the first
    # aggregate, so the window's single partition holds group rows
    # only. The branch-and-reaggregate alternative planned the
    # scan+tokenize twice (branch-specific pruning defeats exchange
    # reuse), which is what this pin forbids.
    df = _Q["corpus_mixture_weights"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert_scan_columns_at_most(
        df, "documents", {"source", "lang", "text", "n_chars"}
    )


def test_kmeans_assignment_is_broadcast_shuffle_free(spark, sf_dir):
    """The Lloyd assignment must never join vectors against a
    vector-scale side: centroids ride a single-row broadcast (BNLJ over
    the collect_list row -- constant k x dim bytes at any corpus scale),
    so the only legitimate joins are those 1-row attaches. No cartesian,
    no sort-merge join, and the only hash exchanges are the centroid
    rebuild / final profile aggregations. (Pins the lazy frame -- the
    registered query materializes to local rows, whose plan is just a
    LocalTableScan.)"""
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _kmeans_profile_frame,
        release_caches,
    )

    plan = physical_plan(_kmeans_profile_frame(spark, sf_dir))
    release_caches()
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_kmeans_vector_side_has_no_shuffle_before_assignment(spark, sf_dir):
    """r8 VERDICT item 6, made executable: the ASSIGNMENT stage itself
    is shuffle-free on the vector side. In the printed plan tree the
    streamed (vector) child of the BroadcastNestedLoopJoin renders
    BEFORE the BroadcastExchange build side, so every shuffle Exchange
    (hash/range/single-partition) must appear only AFTER the first
    BroadcastExchange line -- i.e. inside the tiny centroid lineage --
    and the embeddings FileScan must appear before it (the vectors flow
    scan -> project -> BNLJ with no exchange in between). The
    per-iteration centroid rebuild exchange is k x dim rows by
    construction (groupBy(cluster, dim) after posexplode with partial
    aggregation), pinned here by requiring every hash exchange to key on
    cluster/dim columns, never on vec_id."""
    import re

    from pyspark.sql import functions as F

    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _assign,
        _dvec,
        _init_centroids,
        release_caches,
    )
    from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec(F.col("embedding")).alias("dv")
    )
    assigned = _assign(emb, _init_centroids(emb, 8))
    plan = physical_plan(assigned)
    release_caches()
    lines = plan.splitlines()
    first_bx = next(
        i for i, ln in enumerate(lines) if "BroadcastExchange" in ln
    )
    shuffle_re = re.compile(
        r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)"
    )
    early_shuffles = [
        ln for ln in lines[:first_bx] if shuffle_re.search(ln)
    ]
    assert not early_shuffles, (
        "vector side shuffles before the broadcast attach:\n"
        + "\n".join(early_shuffles)
    )
    assert any(
        "FileScan" in ln and "embeddings" in ln for ln in lines[:first_bx]
    ), plan
    for ln in lines:
        m = shuffle_re.search(ln)
        if m and m.group(1) == "hashpartitioning":
            assert "vec_id" not in ln.split("hashpartitioning")[1], ln


def test_semantic_dedup_pair_join_is_cluster_keyed(spark, sf_dir):
    """SemDeDup's quadratic term must stay bounded by the cluster: the
    a-b pair join has to be an equi-join keyed on the cluster id, never
    a cartesian over the corpus."""
    import re

    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _semantic_stats_frame,
        release_caches,
    )

    plan = physical_plan(_semantic_stats_frame(spark, sf_dir))
    release_caches()
    assert "CartesianProduct" not in plan, plan
    keys = re.findall(
        r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) \[(\w+)#",
        plan,
    )
    assert keys and all(k == "cluster" for k in keys), (keys, plan)


def test_bpe_plans_are_type_table_shaped(spark, sf_dir):
    """BPE learning: the winning pair is a 1-row broadcast per iteration
    (BNLJ attaches only), never a cartesian / sort-merge join; the
    initial pair top-k is TakeOrderedAndProject, not a global sort."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.tokenizer import (
        _learn_merges_frame,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators._cache import (
        release_caches,
    )

    plan = physical_plan(_learn_merges_frame(spark, sf_dir))
    release_caches()
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    plan = physical_plan(_Q["bpe_pair_frequencies"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_stratified_quota_rate_table_is_broadcast(spark, sf_dir):
    """The data-derived per-stratum rate table is tiny and must attach
    as a broadcast hash join on the stratum key -- the corpus side
    streams past it map-side."""
    import re

    plan = physical_plan(_Q["stratified_quota_sample"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    keys = re.findall(r"BroadcastHashJoin \[(\w+)#", plan)
    assert keys and all(k == "source" for k in keys), (keys, plan)


def test_dsir_ratio_table_is_broadcast_and_topk_is_take_ordered(spark, sf_dir):
    """DSIR's 64-row log-ratio table must attach as a broadcast hash
    join on the bucket key (the corpus side streams past it), and the
    top-50 must be TakeOrderedAndProject, never a global sort."""
    import re

    from apache_iceberg_with_clickhouse_olake_spark.operators.sampling import (
        _dsir_weights,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators._cache import (
        release_caches,
    )
    from pyspark.sql import functions as F

    w = _dsir_weights(spark, sf_dir)
    top = w.orderBy(F.col("weight").desc_nulls_last(), "doc_id").limit(50)
    plan = physical_plan(top)
    release_caches()
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    keys = re.findall(r"BroadcastHashJoin \[(\w+)#", plan)
    assert keys and all(k == "b" for k in keys), (keys, plan)
    assert "TakeOrderedAndProject" in plan, plan


def test_hard_negative_argmax_is_partial_aggregable(spark, sf_dir):
    """The anchors ride a broadcast (BNLJ) and the per-anchor argmax is
    a hash aggregate (map-side partial combine) -- NOT a window over
    the scored pairs, whose |anchors| hot partitions would straggle."""
    from apache_iceberg_with_clickhouse_olake_spark.operators import registry

    plan = physical_plan(
        registry.REGISTRY["hard_negative_mining"].fn(spark, sf_dir)
    )
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Window" not in plan, plan
    # the argmax must run as an aggregate with a map-side partial pass
    # (struct-max plans as Sort/ObjectHashAggregate; what matters is the
    # partial_max combine before the tiny |anchors|-row shuffle)
    assert "partial_max" in plan, plan


def test_zorder_write_is_single_range_exchange(spark, sf_dir):
    """The z-ordered layout costs exactly one range-partition shuffle +
    per-partition sort -- no hash exchange, no global sort."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.evolution import (
        _Z_FILES,
        _Z_SPARK,
    )
    from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
        load_table,
    )
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    z = (
        orders.select(
            (F.col("o_custkey").cast("long") % 65536).alias("zx"),
            (F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            ).cast("long") % 65536).alias("zy"),
        )
        .select(F.expr(_Z_SPARK).cast("long").alias("z"))
        .repartitionByRange(_Z_FILES, "z")
        .sortWithinPartitions("z")
    )
    plan = physical_plan(z)
    assert plan.count("Exchange rangepartitioning") == 1, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_power_iteration_is_broadcast_only_on_the_vector_side(spark, sf_dir):
    """Each power iteration joins the corpus only against 1-row
    broadcasts (current vector, norm): no cartesian, no sort-merge
    join anywhere in the unrolled 3-iteration plan."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.linalg import (
        _pi_frame,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators._cache import (
        release_caches,
    )

    plan = physical_plan(_pi_frame(spark, sf_dir))
    release_caches()
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_argmin_join_is_partial_aggregable_not_windowed(spark, sf_dir):
    """The per-part min-cost supplier must reduce via a map-side
    partial struct-min (each partition collapses to its distinct
    partkeys before the exchange), never a rank-filter window over the
    raw fact rows."""
    plan = physical_plan(_Q["min_cost_supplier_per_part"](spark, sf_dir))
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_market_share_keeps_fact_join_shuffled_dims_broadcast(spark, sf_dir):
    """Q8 shape: supplier/nation attach as broadcasts; the lineitem-
    orders fact-fact join must NOT sit under an explicit broadcast hint
    (AQE may still choose one at toy scale -- the assert is on hints,
    which would override AQE at 100 TB)."""
    plan = analyzed_plan(_Q["nation_market_share"](spark, sf_dir))
    blocks = plan.split("ResolvedHint")[1:]
    for block in blocks:
        scan_part = block[:2000].lower()
        for bad in ("orders.parquet", "lineitem.parquet"):
            assert bad not in scan_part, f"broadcast hint over {bad}"
    pplan = physical_plan(_Q["nation_market_share"](spark, sf_dir))
    assert "CartesianProduct" not in pplan, pplan


def test_rollup_is_one_expand_one_scan(spark, sf_dir):
    """ROLLUP must plan as a single Expand + hash aggregate over ONE
    fact scan -- never the union of three per-level aggregations that
    each re-read the table."""
    plan = physical_plan(_Q["revenue_rollup_levels"](spark, sf_dir))
    assert "Expand" in plan, plan
    assert plan.count("FileScan") == 1, plan
    assert "Union" not in plan, plan


def test_ann_ivf_probe_is_bucket_local_and_topk_take_ordered(spark, sf_dir):
    """r9 VERDICT item 7 (ANN half): the IVF probe path scores ONLY the
    probed buckets -- the assigned corpus attaches the tiny probe set
    via a BroadcastHashJoin keyed on the cluster id (bucket-local scan:
    rows outside the probed clusters never survive the join), the
    1-row query vector rides BNLJ attaches, and the final top-k is
    TakeOrderedAndProject, never a global sort over the scored rows."""
    import re

    from apache_iceberg_with_clickhouse_olake_spark.operators._cache import (
        release_caches,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _ann_ivf_frame,
    )

    plan = physical_plan(_ann_ivf_frame(spark, sf_dir))
    release_caches()
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    keys = re.findall(r"BroadcastHashJoin \[(\w+)#", plan)
    assert keys and all(k == "cluster" for k in keys), (keys, plan)
    assert "TakeOrderedAndProject" in plan, plan
    # no full-corpus global sort: any rangepartitioning exchange would
    # mean the scored candidates were sorted corpus-wide
    assert "rangepartitioning" not in plan.lower(), plan


def test_twolevel_kmeans_and_probe_plans_stay_keyed(spark, sf_dir):
    """r14: the two-level family's physical contract. The profile's
    level-2 work is ONE cluster-keyed shuffle shared by the seed
    window, the seed-array attach is a keyed join (broadcast at
    fixture scale -- at extreme n it degrades to a keyed hash join,
    never a global broadcast of all n/target leaf centroids), and
    nothing plans a CartesianProduct or a corpus-wide sort-merge. The
    probe additionally ends in TakeOrderedAndProject with no
    rangepartitioning (no global sort of scored candidates) -- same
    contract as its single-level twin."""
    from apache_iceberg_with_clickhouse_olake_spark.operators._cache import (
        release_caches,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _ann_twolevel_frame,
        _kmeans_twolevel_frame,
    )

    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _twolevel_state_frames,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators.similarity import (
        _dvec,
    )
    from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
        load_table,
    )
    from pyspark.sql import functions as F

    try:
        plan = physical_plan(_kmeans_twolevel_frame(spark, sf_dir))
        assert "CartesianProduct" not in plan, plan
        assert "SortMergeJoin" not in plan, plan
        assert "Exchange hashpartitioning(cluster" in plan, plan
        # the fine frame must carry full parallelism regardless of how
        # AQE plans the seed-array join (r14: an AQE-coalesced join
        # output serialized the 268k-pair cos stage onto one task --
        # the r12 cache bug class in new clothing)
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", _dvec(F.col("embedding")).alias("dv")
        )
        fine = _twolevel_state_frames(emb)[3]
        par = spark.sparkContext.defaultParallelism
        assert fine.rdd.getNumPartitions() >= par
        probe_plan = physical_plan(_ann_twolevel_frame(spark, sf_dir))
        assert "CartesianProduct" not in probe_plan, probe_plan
        assert "SortMergeJoin" not in probe_plan, probe_plan
        assert "TakeOrderedAndProject" in probe_plan, probe_plan
        assert "rangepartitioning" not in probe_plan.lower(), probe_plan
    finally:
        release_caches()


def test_filtered_ann_and_balanced_sample_plans_stay_keyed(spark, sf_dir):
    """r15: the filtered-ANN probe's physical contract -- probe lists
    attach by a cluster-keyed broadcast, the label payload joins by
    vec_id (index-build-time, keyed -- never a cartesian), the head is
    TakeOrderedAndProject with no corpus-wide sort; the balanced
    sample's quota window is leaf-keyed (cluster, sub) over the fine
    frame and nothing plans a CartesianProduct."""
    import re

    from apache_iceberg_with_clickhouse_olake_spark.operators._cache import (
        release_caches,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _ann_filtered_frame,
        _balanced_sample_frame,
    )

    try:
        plan = physical_plan(_ann_filtered_frame(spark, sf_dir))
        assert "CartesianProduct" not in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
        assert "rangepartitioning" not in plan.lower(), plan
        # every equi-join keys on cluster/label (probe attach --
        # Catalyst folds the label = qlabel predicate INTO the hash
        # join keys, so the filter is applied by the join itself) or
        # vec_id (label payload attach at index-build time)
        keys = re.findall(r"BroadcastHashJoin \[(\w+)#", plan)
        assert keys and all(
            k in ("cluster", "vec_id", "label") for k in keys
        ), (keys, plan)
        sample_plan = physical_plan(_balanced_sample_frame(spark, sf_dir))
        assert "CartesianProduct" not in sample_plan, sample_plan
        # the quota window partitions by the full leaf key -- its sort
        # is leaf-local (~target rows), never corpus-global
        assert re.search(
            r"Exchange hashpartitioning\(cluster#\d+L?, sub#\d+", sample_plan
        ), sample_plan
        # (the plan's one rangepartitioning is the orderBy on the
        # k1-row RESULT -- a result sort, not a corpus sort, so it is
        # not asserted away here)
        # r15 late: the filtered TWO-LEVEL probe keeps the same
        # contract -- bounded leaf fetch, top-k head, no corpus sort
        from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (  # noqa: E501
            _ann_twolevel_filtered_frame,
        )

        tlf_plan = physical_plan(_ann_twolevel_filtered_frame(spark, sf_dir))
        assert "CartesianProduct" not in tlf_plan, tlf_plan
        assert "TakeOrderedAndProject" in tlf_plan, tlf_plan
        assert "rangepartitioning" not in tlf_plan.lower(), tlf_plan
        # r16: the filtered two-level RECALL eval keeps the contract on
        # its exact side too -- brute force over the filtered slice is
        # a broadcast-query scan with a top-k head, never a corpus
        # sort; the rollup joins two <= k-row frames (broadcast hash)
        from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (  # noqa: E501
            _ann_twolevel_filtered_recall_frame,
        )

        rec_plan = physical_plan(
            _ann_twolevel_filtered_recall_frame(spark, sf_dir)
        )
        assert "CartesianProduct" not in rec_plan, rec_plan
        assert "TakeOrderedAndProject" in rec_plan, rec_plan
        assert "rangepartitioning" not in rec_plan.lower(), rec_plan
        assert "SortMergeJoin" not in rec_plan, rec_plan
        # r16: the two-level width sweep -- one leaf pass serves every
        # width (the grid attaches as a broadcast range join, never a
        # cartesian or a per-width rescan), and the batch eval -- all
        # probe attaches broadcast, per-qid windows, no corpus sort
        from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (  # noqa: E501
            _batch_recall_frame,
            _twolevel_sweep_frame,
        )

        sweep_plan = physical_plan(_twolevel_sweep_frame(spark, sf_dir))
        assert "CartesianProduct" not in sweep_plan, sweep_plan
        assert "SortMergeJoin" not in sweep_plan, sweep_plan
        batch_plan = physical_plan(_batch_recall_frame(spark, sf_dir))
        assert "CartesianProduct" not in batch_plan, batch_plan
        assert "SortMergeJoin" not in batch_plan, batch_plan
        assert "BroadcastHashJoin" in batch_plan, batch_plan
    finally:
        release_caches()


def test_bpe_iteration_frames_are_vocabulary_sized(spark, sf_dir):
    """r9 VERDICT item 7 (BPE half): every merge iteration operates on
    the word-TYPE table, never re-reading the corpus -- the documents
    FileScan appears at most once in the fully-applied symbols plan
    (the type table is built by one corpus pass; iterations rewrite the
    persisted symbols), and each per-iteration winner attaches as a
    1-row broadcast (BNLJ), never a corpus-shuffling join."""
    from apache_iceberg_with_clickhouse_olake_spark.operators._cache import (
        release_caches,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators.tokenizer import (
        _N_MERGES,
        _merged_symbols,
    )

    plan = physical_plan(_merged_symbols(spark, sf_dir))
    release_caches()
    # r20: each iteration is lineage-truncated to the previous round's
    # checkpointed type-table RDD (the un-truncated plan doubled per
    # round -- 2^N Catalyst subtree visits), so the live plan -- what
    # the final iteration actually executes -- reads the materialized
    # type table (ExistingRDD), never documents.parquet, and never an
    # un-truncated InMemoryRelation chain.
    assert "documents.parquet" not in plan, plan
    assert "ExistingRDD" in plan, plan
    assert "InMemoryRelation" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the winner attaches as a 1-row broadcast nested-loop, never a
    # corpus-shuffling join (earlier rounds' identical shape is pinned
    # by construction: every round is the same fragment over the
    # previous checkpoint)
    assert plan.count("BroadcastNestedLoopJoin") >= 1, plan
    assert _N_MERGES >= 1  # loop actually ran


def test_disjunctive_hulls_push_to_both_scans(spark, sf_dir):
    """Q19 shape: the OR-of-ANDs is post-join, but its per-column hulls
    must reach the parquet scans -- brand IN-list + size envelope on
    part, quantity envelope on lineitem (the manual rewrite Catalyst
    won't derive)."""
    df = _Q["disjunctive_pred_revenue"](spark, sf_dir)
    assert_pushed_filter(df, "l_quantity")
    assert_pushed_filter(df, "p_brand")
    assert_pushed_filter(df, "p_size")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan


def test_promo_share_pushes_month_and_prunes(spark, sf_dir):
    """Q14 shape: the shipping-month range lands in the lineitem scan's
    PushedFilters and only the needed columns are read."""
    df = _Q["promo_revenue_share"](spark, sf_dir)
    assert_pushed_filter(df, "l_shipdate")
    assert_scan_columns_at_most(
        df,
        "lineitem",
        {"l_partkey", "l_extendedprice", "l_discount", "l_shipdate"},
    )


# -- r10 late additions: Q6 scan shape, PQ, winnowing, BM25/RRF -------------


def test_q6_is_pure_scan_aggregate(spark, sf_dir):
    """TPC-H Q6 must compile to scan -> filter -> partial/final agg:
    no join of any kind, all three predicates pushed to the reader,
    and the lineitem scan reading only the four referenced columns."""
    df = _Q["forecast_revenue_change"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Join" not in plan, plan
    assert_pushed_filter(df, "l_shipdate")
    assert_pushed_filter(df, "l_discount")
    assert_scan_columns_at_most(
        df,
        "lineitem",
        {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"},
    )


def test_pq_assignment_is_joinless_single_exchange(spark, sf_dir):
    """PQ assignment must inline the collected codebook as literals:
    the full-corpus scan projects argmin structs with NO join and NO
    vector shuffle -- the only exchange aggregates (M x K)-group
    partials."""
    plan = physical_plan(_Q["pq_codebook_stats"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_winnowing_pair_join_is_fingerprint_keyed(spark, sf_dir):
    """The winnowing inverted-index self-join must be an equi-join on
    the fingerprint (posting lists bound the cost), never a cartesian
    or nested-loop over documents."""
    plan = physical_plan(_Q["winnowing_neardup_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "fp#" in plan, plan


def test_winnowing_fingerprints_are_projection_only(spark, sf_dir):
    assert_no_global_sort(_Q["winnowing_fingerprints"](spark, sf_dir))


def test_bm25_prunes_documents_and_takeorders_topk(spark, sf_dir):
    """BM25's corpus pass must read only (doc_id, text) and the top-k
    must compile to TakeOrderedAndProject (per-partition heaps), never
    a global sort of the postings."""
    df = _Q["bm25_topk_search"](spark, sf_dir)
    assert_scan_columns_at_most(df, "documents", {"doc_id", "text"})
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan.replace("SortAggregate", ""), plan


def test_rrf_ranks_bounded_lists_not_the_corpus(spark, sf_dir):
    """RRF's row_number windows must run AFTER the per-retriever top-N
    (TakeOrderedAndProject), so the single-partition window sees at
    most N rows -- a global-window rank over the corpus is the scale
    anti-pattern this pins against."""
    plan = physical_plan(_Q["rrf_hybrid_search"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # both retriever branches collapse to TakeOrdered before any Window
    assert plan.count("TakeOrderedAndProject") >= 2, plan


def test_q13_reduces_orders_before_the_outer_join(spark, sf_dir):
    """Q13 must aggregate orders per custkey BEFORE the customer outer
    join (shuffled bytes are key columns, not order payloads), and the
    scans must prune to the two referenced columns each."""
    df = _Q["custdist_histogram"](spark, sf_dir)
    assert_scan_columns_at_most(
        df, "orders", {"o_custkey", "o_orderpriority"}
    )
    assert_scan_columns_at_most(df, "customer", {"c_custkey"})


def test_containment_pairs_reuse_the_exactly_once_band_filter(spark, sf_dir):
    """The containment op must inherit the calibration op's pair-stream
    shape: band-keyed equi-join, first-matching-band filter for pair
    dedup (no distinct/aggregate over the quadratic candidate stream),
    explicit band repartition exempt from AQE coalescing."""
    plan = physical_plan(_Q["shingle_containment_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" not in plan, plan
    assert "REPARTITION_BY_NUM" in plan, plan
    assert "band_hash" in plan, plan


def test_source_novelty_explodes_the_materialized_frame(spark, sf_dir):
    """The hashed-shingle frame must be a superstep (ExistingRDD): the
    explode generator otherwise re-inlines the staged shingle lambdas
    and re-evaluates them per generated row (measured 10.3 s vs 1.5 s
    at sf0.1)."""
    plan = physical_plan(_Q["source_ngram_novelty"](spark, sf_dir))
    assert "ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan


# -- r11: Q11/Q20 shape pins (r10 VERDICT item 6) ---------------------------


def test_q11_total_reuses_the_per_part_exchange(spark, sf_dir):
    """Q11's grand total must be a re-aggregation of the per-part
    frame, not a second fact scan: at runtime AQE's exchange reuse
    collapses the total branch onto the per-part shuffle, so the FINAL
    plan holds exactly ONE lineitem FileScan plus a ReusedExchange /
    table-cache hit, and the threshold attaches as a one-row broadcast
    (the legitimate BNLJ-Cross-over-a-scalar class)."""
    df = _Q["important_part_share"](spark, sf_dir)
    df.collect()  # finalize AQE so reuse is visible
    plan = physical_plan(df)
    final = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final, final
    assert final.count("lineitem.parquet") == 1, final
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in final, final


def test_q20_semi_join_probes_preaggregated_keys(spark, sf_dir):
    """Q20's IN-subquery must compile to a LEFT SEMI join whose build
    side is already reduced to qualifying supplier KEYS: the
    per-supplier SUM + HAVING filter sits strictly below the semi-join
    (shuffled bytes are keys, not lineitem payloads), the date window
    is pushed to the lineitem reader, and the scan reads only the four
    referenced columns."""
    df = _Q["heavy_red_part_suppliers"](spark, sf_dir)
    plan = physical_plan(df)
    semi = plan.index("LeftSemi")
    agg = plan.index("HashAggregate(keys=[l_suppkey")
    assert agg > semi, plan  # build side (printed below the join) aggregates
    assert "Filter (isnotnull(qty" in plan, plan
    assert_pushed_filter(df, "l_shipdate")
    assert_scan_columns_at_most(
        df,
        "lineitem",
        {"l_partkey", "l_suppkey", "l_quantity", "l_shipdate"},
    )


# -- r11 new ops: range-join decomposition, KL superstep, sign-ANN ---------


def test_interval_join_is_bucket_equi_never_theta(spark, sf_dir):
    """The interval x point range join must compile to a broadcast HASH
    join on the bucket id -- never a nested-loop/cartesian theta join --
    with the events scan pruned to the three referenced columns, and
    the data-derived grid scalars (tmin/step/width/bw) must ride a
    ScalarSubquery INSIDE the plan (r11 ADVICE: no eager span probe at
    query-construction time)."""
    df = _Q["events_interval_bucket_join"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin [bucket" in plan, plan
    assert "Subquery" in plan, plan  # in-plan span probe, not .first()
    assert_scan_columns_at_most(df, "events", {"user_id", "value", "ts"})


def test_source_kl_reaggregates_the_superstep_not_the_corpus(spark, sf_dir):
    """All three KL marginals must derive from the localCheckpoint'd
    (source, term) frame: the final plan contains ExistingRDD scans and
    ZERO documents.parquet scans (one corpus scan+tokenize total, paid
    at checkpoint time)."""
    plan = physical_plan(_Q["source_unigram_kl"](spark, sf_dir))
    assert "ExistingRDD" in plan, plan
    assert "documents.parquet" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_sign_hamming_topk_takes_ordered(spark, sf_dir):
    """Binary-quantized top-k must compile to TakeOrderedAndProject
    (per-partition heaps over integer Hamming), and the signature words
    must be scan-side projections (no shuffle of the float vectors
    before the 1-row broadcast join)."""
    plan = physical_plan(_Q["embedding_sign_hamming_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_centroid_outliers_broadcast_the_centroid_table(spark, sf_dir):
    """The distance pass must broadcast the label-keyed centroid table
    (labels x 1 rows) and report via TakeOrderedAndProject -- the
    vectors themselves never shuffle."""
    plan = physical_plan(_Q["label_centroid_outliers"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin [label" in plan, plan


def test_pmi_pairs_join_reads_the_superstep_with_lazy_scalar(spark, sf_dir):
    """The pair self-join must read the checkpointed (doc, vocab-term)
    frame (ExistingRDD), the n_docs scalar must stay IN-PLAN (one-row
    broadcast BNLJ -- no eager count at construction, never a
    CartesianProduct), and BOTH top-Vs (vocab selection and the final
    report) must compile to TakeOrderedAndProject, not a global
    row_number window over the term-df frame."""
    plan = physical_plan(_Q["term_cooccurrence_pmi"](spark, sf_dir))
    assert "ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # the 1-row scalar
    assert "TakeOrderedAndProject" in plan, plan
    # vocab selection runs before the checkpoint (invisible here); the
    # visible plan must hold no window operator at all
    assert "Window" not in plan, plan


def test_nearest_neardup_argmax_is_struct_max_not_window(spark, sf_dir):
    """The per-doc argmax must be a partial-aggregable struct MAX over
    the bounded pair stream -- never a rank window -- and the pair join
    stays band-keyed (no cartesian/BNLJ)."""
    plan = physical_plan(_Q["nearest_neardup_doc"](spark, sf_dir))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "partial_max" in plan, plan


def test_user_lifetime_stats_is_one_shuffle_pruned_scan(spark, sf_dir):
    """The lifetime profile is a user_id-keyed aggregation over a
    two-column scan: at most the standard two-phase-distinct pair of
    user_id-prefixed exchanges ((user_id, day) partial, then user_id),
    no join, no window, and the events reader pruned to (user_id, ts)."""
    df = _Q["user_lifetime_stats"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning(user_id") <= 2, plan
    assert_scan_columns_at_most(df, "events", {"user_id", "ts"})


def test_q21_distincts_never_expand(spark, sf_dir):
    """lonely_late_supplier's two distinct counts must ride the explicit
    two-level aggregate (distinct (orderkey, suppkey) pairs first) --
    never Catalyst's multi-distinct Expand, which triples every lineitem
    row before the shuffle (r12 A/B: two-level is 1.7x faster at 1x and
    8x; SCALING.md r12 residue audit)."""
    plan = physical_plan(_Q["lonely_late_supplier"](spark, sf_dir))
    assert "Expand" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_persisted_corpus_frames_run_at_full_parallelism(spark, sf_dir):
    """r13 persist-site audit (r12 VERDICT item 4): every persisted
    frame that feeds a CPU-heavy no-shuffle consumer must carry at
    least defaultParallelism partitions BEFORE the persist -- a cached
    frame inheriting file-count partitioning (1 file at sf0.1 = 1 task)
    serializes its hottest consumer stage onto one core, the bug class
    the r12 k-means fix exposed. Pins the three corpus-vector caches on
    their REAL builders: the power-iteration/PCA vector frame and the
    semantic-cascade fingerprint frame (both fixed r13), plus the Lloyd
    assignment frame (the r12 fix, whose parallelism the first two
    inherit-by-discipline). For the two r13 frames the projection
    (fp/dvec cast) must also sit ABOVE the exchange so the cache-build
    pass itself runs wide -- checked by Project appearing before the
    Exchange line in the physical tree (children print below parents)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _fp_vectors,
        _kmeans_assign,
        release_caches,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators.linalg import (
        _pi_vectors,
    )

    par = spark.sparkContext.defaultParallelism
    try:
        for frame in (_pi_vectors(spark, sf_dir), _fp_vectors(spark, sf_dir)):
            assert frame.rdd.getNumPartitions() >= par
            plan = physical_plan(frame)
            exch_at = plan.index("Exchange hashpartitioning(vec_id")
            assert "Project" in plan[:exch_at], plan  # cast runs wide
        assigned = _kmeans_assign(spark, sf_dir)
        assert assigned.rdd.getNumPartitions() >= par
    finally:
        release_caches()


def _persist_raw_scan_hits(source: str, fname: str) -> list[str]:
    """The persist-of-a-raw-scan linter (see
    test_no_operator_persists_a_raw_scan for the bug class): within
    each function, a local name is TAINTED when its assignment is a
    METHOD CHAIN rooted at load_table() or at an already-tainted name,
    without a .repartition/.repartitionByRange anywhere in the chain;
    `_persist(arg)` is flagged when the arg is tainted by the same
    rule. Taint stops at free-function boundaries on purpose
    (``_persist(helper(docs))`` is clean even when docs is a raw scan:
    helpers like _word_symbols_from or _kmeans_assign_frames reshuffle
    internally, and flagging them would indict every audited-OK site
    in the r13 sweep).

    Module-level so test_persist_raw_scan_lint_self_check can feed it
    synthetic sources (r14 ADVICE: the old ast.walk traversal was
    breadth-first, not source order, and never cleared taint on
    rebind)."""
    import ast

    _REPART = {"repartition", "repartitionByRange"}

    def _root(node: ast.AST) -> ast.AST:
        """Base of a method/attribute chain: ``a.b(x).c(y)`` -> ``a``;
        a free-function call is its own root (boundary)."""
        while True:
            if isinstance(node, ast.Call):
                if isinstance(node.func, ast.Attribute):
                    node = node.func.value
                else:
                    return node
            elif isinstance(node, (ast.Attribute, ast.Subscript)):
                node = node.value
            else:
                return node

    def _has_repartition(node: ast.AST) -> bool:
        return any(
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr in _REPART
            for n in ast.walk(node)
        )

    def _tainted(expr: ast.AST, taint: set[str]) -> bool:
        if _has_repartition(expr):
            return False
        root = _root(expr)
        if isinstance(root, ast.Name):
            return root.id in taint
        if isinstance(root, ast.Call) and isinstance(root.func, ast.Name):
            return root.func.id == "load_table"
        return False

    hits: list[str] = []

    def _own_exprs(stmt: ast.stmt) -> list[ast.AST]:
        """The statement's OWN expressions (header only for compound
        statements -- their bodies are walked separately, in source
        order, so taint state is right at every _persist site)."""
        if isinstance(stmt, (ast.If, ast.While)):
            return [stmt.test]
        if isinstance(stmt, (ast.For, ast.AsyncFor)):
            return [stmt.iter]
        if isinstance(stmt, (ast.With, ast.AsyncWith)):
            return [i.context_expr for i in stmt.items]
        if isinstance(stmt, ast.Try):
            return []
        return [stmt]

    def _scan(body: list[ast.stmt], taint: set[str], fn_name: str,
              fname: str) -> None:
        """Source-order walk (r14 ADVICE: ast.walk is breadth-first,
        so an assignment nested in a control-flow block was visited
        AFTER a later top-level _persist it should taint, and a name
        rebound through .repartition stayed tainted forever). Each
        Assign now either ADDS or REMOVES its targets from the taint
        set based on the RHS, at the point it executes."""
        for stmt in body:
            if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue  # own scope; the outer loop visits it fresh
            for expr in _own_exprs(stmt):
                for n in ast.walk(expr):
                    if (
                        isinstance(n, ast.Call)
                        and isinstance(n.func, ast.Name)
                        and n.func.id == "_persist"
                        and n.args
                        and _tainted(n.args[0], taint)
                    ):
                        hits.append(f"{fname}:{n.lineno} in {fn_name}")
            if isinstance(stmt, ast.Assign):
                names = {
                    t.id for t in stmt.targets if isinstance(t, ast.Name)
                }
                if _tainted(stmt.value, taint):
                    taint |= names
                else:
                    taint -= names
            elif (
                isinstance(stmt, ast.AnnAssign)
                and stmt.value is not None
                and isinstance(stmt.target, ast.Name)
            ):
                if _tainted(stmt.value, taint):
                    taint.add(stmt.target.id)
                else:
                    taint.discard(stmt.target.id)
            for field in ("body", "orelse", "finalbody"):
                sub = getattr(stmt, field, None)
                if sub:
                    _scan(sub, taint, fn_name, fname)
            for h in getattr(stmt, "handlers", []) or []:
                _scan(h.body, taint, fn_name, fname)

    tree = ast.parse(source)
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        _scan(fn.body, set(), fn.name, fname)
    return hits


def test_no_operator_persists_a_raw_scan():
    """Structural guard for the file-count-partitioning bug class (r12
    k-means, r13 PI/PCA/cascade-fingerprint): persisting a frame built
    directly on load_table() inherits however many files the fixture
    has (1 at sf0.1 = 1 task for every no-shuffle consumer). Any new
    persist must take its partitioning from an explicit repartition or
    a shuffle-born frame. Machinery in _persist_raw_scan_hits; the
    plan-level test_persisted_corpus_frames_run_at_full_parallelism is
    the backstop that checks the REAL builders' partition counts."""
    import pathlib

    from apache_iceberg_with_clickhouse_olake_spark import operators

    hits: list[str] = []
    pkg = pathlib.Path(operators.__file__).parent
    for path in sorted(pkg.glob("*.py")):
        hits += _persist_raw_scan_hits(path.read_text(), path.name)
    assert not hits, f"persist of a raw scan (file-count partitions): {hits}"


def test_persist_raw_scan_lint_self_check():
    """The r14 ADVICE failure shapes, run against the linter itself:
    (a) an assignment nested in a control-flow block must taint a
    LATER top-level _persist (the breadth-first walk missed it);
    (b) a name rebound through .repartition after a raw-scan
    assignment must be CLEARED (the old pass kept it tainted);
    (c) the historical cascade-fingerprint shape stays caught."""
    import textwrap

    nested = textwrap.dedent(
        """
        def op(spark, sf_dir):
            if spark:
                docs = load_table(spark, sf_dir, "documents")
            _persist(docs)
        """
    )
    assert _persist_raw_scan_hits(nested, "x.py"), (
        "nested raw-scan assignment must taint the later persist"
    )

    rebound = textwrap.dedent(
        """
        def op(spark, sf_dir):
            docs = load_table(spark, sf_dir, "documents")
            docs = docs.repartition(8, "doc_id")
            _persist(docs)
        """
    )
    assert not _persist_raw_scan_hits(rebound, "x.py"), (
        "rebind through .repartition must clear the taint"
    )

    plain = textwrap.dedent(
        """
        def op(spark, sf_dir):
            docs = load_table(spark, sf_dir, "documents")
            g = docs.select("a")
            _persist(g)
        """
    )
    assert _persist_raw_scan_hits(plain, "x.py"), (
        "the historical intermediate-variable shape must stay caught"
    )

    inline_ok = textwrap.dedent(
        """
        def op(spark, sf_dir):
            e = _persist(
                load_table(spark, sf_dir, "embeddings")
                .select("vec_id")
                .repartition(8, "vec_id")
            )
        """
    )
    assert not _persist_raw_scan_hits(inline_ok, "x.py"), (
        "repartition inside the persisted chain is clean"
    )


def test_pq_adc_scan_is_joinless_and_code_width(spark, sf_dir):
    """The ADC serving scan must be JOINLESS (codebook and query ride
    as literals -- the memory-bound PQ point): no sort-merge join, no
    cartesian anywhere; both top-k heads are TakeOrderedAndProject;
    and every corpus scan reads only (vec_id, embedding)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators._cache import (
        release_caches,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators.similarity import (
        _pq_adc_recall_frame,
    )

    try:
        df = _pq_adc_recall_frame(spark, sf_dir)
        plan = physical_plan(df)
        assert "SortMergeJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
        assert_scan_columns_at_most(
            df, "embeddings", {"vec_id", "embedding"}
        )
    finally:
        release_caches()


def test_ivfpq_probe_is_broadcast_and_adc_scan_joinless(spark, sf_dir):
    """IVF-PQ (r17): the coarse probe restricts the corpus via a
    broadcast-hash-join semi-filter (never a shuffle join — at 100 TB
    the probe is partition pruning), the ADC stage inherits the
    joinless constant-folded encode shape, and every embeddings scan
    reads only (vec_id, label, embedding)."""
    from apache_iceberg_with_clickhouse_olake_spark.operators._cache import (
        release_caches,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators.similarity import (
        _ivfpq_recall_frame,
    )

    try:
        df = _ivfpq_recall_frame(spark, sf_dir)
        plan = physical_plan(df)
        assert "SortMergeJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
        assert_scan_columns_at_most(
            df, "embeddings", {"vec_id", "label", "embedding"}
        )
    finally:
        release_caches()


def test_paraphrase_pairs_keep_payloads_off_the_band_explosion(
    spark, sf_dir
):
    """Paraphrase mining (r17) inherits the near-dup join discipline:
    no cartesian product anywhere, embeddings scans read only
    (vec_id, label, embedding), and the documents side contributes
    only (doc_id, text) — shingle payloads join AFTER pair formation."""
    df = registry.REGISTRY["paraphrase_mining_pairs"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert_scan_columns_at_most(
        df, "embeddings", {"vec_id", "label", "embedding"}
    )
    assert_scan_columns_at_most(df, "documents", {"doc_id", "text"})


def test_kcenter_passes_are_broadcast_and_assignment_joinless(
    spark, sf_dir
):
    """Each farthest-point pick is a corpus pass with a 1-row
    broadcast center (BNLJ) ending in a TakeOrdered head; the final
    assignment is the joinless broadcast-array argmin fold; the only
    equi-join is the 5-row broadcast stitch -- never a sort-merge or
    a cartesian."""
    from apache_iceberg_with_clickhouse_olake_spark.operators._cache import (
        release_caches,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (
        _kcenter_frame,
    )

    try:
        plan = physical_plan(_kcenter_frame(spark, sf_dir))
        assert "SortMergeJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
    finally:
        release_caches()


def test_curriculum_bins_one_pass_broadcast_cuts(spark, sf_dir):
    """The binning must be ONE tokenize pass + a broadcast 3-double
    cut row applied map-side: no sort-merge join, no cartesian, no
    per-doc window (the only OVER () runs on the 5-row bin frame),
    and the documents scan reads only (doc_id, text)."""
    df = _Q["curriculum_difficulty_bins"](spark, sf_dir)
    plan = physical_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert_scan_columns_at_most(df, "documents", {"doc_id", "text"})
