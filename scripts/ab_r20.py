"""Interleaved same-process A/B for the r20 structural changes.

Cross-session timings on this sandbox wander +/-25%, so keep-vs-revert
is decided ONLY by interleaving both variants in ONE session
(A, B, A, B, ...; medians of N pairs) -- the r19 discipline.

Variants:
  <semdedup query name> / spread : A = pre-r20 single-group kernel
              (monkeypatched back in), B = r20 _salted_block_dropped.
  leakage / bpe_heldout / kcenter : A = pre-r20 body (reconstructed
              inline from git history), B = registered op.
  embedding_power_iteration / embedding_pca_top2 : A = pre-r20 64-row
              state loop (monkeypatched), B = 1-row state loop.
  lloyd:<consumer query> : A = current lazy Lloyd, B = synchronous-
              update candidate (collect per iteration).
  shj:<query> : A = default join policy, B = preferSortMergeJoin=false
              + AQE local-map threshold 64m.

Usage: python scripts/ab_r20.py [pairs] [which ...]
"""
from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _old_salted_block_dropped(members, key_cols, out_schema, cap_rows=None):
    """The pre-r20 shape: one kernel group per block, no salting."""
    from apache_iceberg_with_clickhouse_olake_spark.operators._pair_cos_udf import (  # noqa: E501
        make_block_dropped_kernel,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators.clustering import (  # noqa: E501
        _SEMDEDUP_COS,
    )

    return members.groupBy(*key_cols).applyInPandas(
        make_block_dropped_kernel(list(key_cols), _SEMDEDUP_COS),
        schema=out_schema,
    )


def _old_leakage(spark, sf_dir):
    """Pre-r20 leakage_safe_split_stats assembly (three consumers of
    tagged + ns-nn join + two broadcasts), verbatim from git history."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from apache_iceberg_with_clickhouse_olake_spark.operators.dedup import (
        _cascade_rep_labels,
        _split_col,
    )

    grouped, reps, labels, prev = _cascade_rep_labels(
        spark, sf_dir, with_prev=True
    )
    rep_id = F.min("doc_id").over(Window.partitionBy("fp"))
    doc_rep = grouped.select("doc_id", rep_id.alias("rep_id"))
    lab = labels.select(
        F.col("doc_id").alias("rep_id"), F.col("label").alias("label")
    )
    cluster_id = F.coalesce("label", "rep_id")
    tagged = (
        doc_rep.join(lab, "rep_id", "left")
        .select(
            "doc_id",
            cluster_id.alias("cluster_id"),
            _split_col(cluster_id.cast("string")).alias("split"),
            _split_col(F.col("doc_id").cast("string")).alias("naive_split"),
        )
    )
    ns = (
        tagged.select("cluster_id", "split")
        .distinct()
        .groupBy("cluster_id")
        .agg(F.count("*").alias("ns"))
    )
    nn = (
        tagged.select("cluster_id", "naive_split")
        .distinct()
        .groupBy("cluster_id")
        .agg(F.count("*").alias("nn"))
    )
    straddle = ns.join(nn, "cluster_id").agg(
        F.sum((F.col("ns") > 1).cast("long")).alias("clusters_straddling"),
        F.sum((F.col("nn") > 1).cast("long")).alias(
            "naive_clusters_straddling"
        ),
    )
    conv = (
        labels.join(
            prev.select("doc_id", F.col("label").alias("prev_label")),
            "doc_id",
        )
        .agg(
            F.coalesce(
                F.sum((F.col("label") != F.col("prev_label")).cast("long")),
                F.lit(0).cast("long"),
            ).alias("propagation_label_changes")
        )
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(straddle))
        .crossJoin(F.broadcast(conv))
        .select(
            "split",
            "n_docs",
            "n_clusters",
            "clusters_straddling",
            "naive_clusters_straddling",
            "propagation_label_changes",
        )
        .orderBy("split")
    )


def _old_pi_loop(spark, emb, iters):
    """Pre-r20 power-iteration loop: 64-row state frame, separate n2
    aggregate + broadcast, collect_list state rebuild per iteration."""
    from pyspark.sql import functions as F

    from apache_iceberg_with_clickhouse_olake_spark.operators.linalg import (
        _DIM,
        _PI_DOT_SNAP6_SQL,
        _V0,
        _dsum_spark_sql,
    )

    v = spark.range(_DIM).select(
        F.col("id").alias("dim"), F.lit(_V0).alias("c")
    )
    for _ in range(iters):
        varr = v.agg(
            F.expr("array_sort(collect_list(struct(dim, c)))").alias("s")
        ).selectExpr("transform(s, t -> t.c) AS varr")
        s = emb.crossJoin(F.broadcast(varr)).selectExpr(
            "dv", f"{_PI_DOT_SNAP6_SQL} AS s"
        )
        u = (
            s.select("s", F.posexplode("dv").alias("dim", "x"))
            .groupBy("dim")
            .agg(F.expr(_dsum_spark_sql("x * s")).alias("u"))
        )
        n2 = u.agg(F.expr(_dsum_spark_sql("u * u")).alias("n2"))
        v = u.crossJoin(F.broadcast(n2)).selectExpr(
            "dim",
            "CAST(round(CAST(u / sqrt(n2) AS DECIMAL(30,6)), 4)"
            " AS DOUBLE) AS c",
        )
    return v.select(
        F.col("dim").cast("long").alias("dim"),
        F.col("c").alias("component"),
    ).orderBy("dim")


def _sync_kmeans_state_frames(emb, k_of=None):
    """CANDIDATE (r19 VERDICT item 4): Lloyd with a SYNCHRONOUS update
    -- the k x 64 centroid table is collected per iteration and
    rebuilt as a local frame, so the next assignment's plan does not
    embed the previous iteration's update + assignment lineage."""
    from pyspark.sql import functions as F

    from apache_iceberg_with_clickhouse_olake_spark.operators import (
        clustering as C,
    )

    k_of = k_of or C._k_for
    spark = emb.sparkSession
    par = spark.sparkContext.defaultParallelism
    emb = C._persist(emb.repartition(par, "vec_id"))
    k = k_of(emb.count())
    cent = C._init_centroids(emb, k)
    assigned = C._assign(emb, cent)
    for _ in range(C._ITERS - 1):
        cent_lazy = C._update_centroids(assigned)
        cent = spark.createDataFrame(
            cent_lazy.collect(), cent_lazy.schema
        )
        assigned = C._assign(emb, cent)
    return assigned, cent


def _old_bpe_heldout(spark, sf_dir):
    """Pre-r20 bpe_heldout_compression: per-round persist (no lineage
    truncation), verbatim from git history."""
    from pyspark.sql import functions as F

    from apache_iceberg_with_clickhouse_olake_spark.functions import (
        dround,
        md5_int60,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators import (
        tokenizer as T,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators._cache import (
        cache_scope,
        persist_tracked,
    )
    from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
        load_table,
    )

    with cache_scope():
        docs = load_table(spark, sf_dir, "documents")
        split = (
            md5_int60(
                F.concat(F.lit("split-"), F.col("doc_id").cast("string"))
            )
            % T._SPLIT_MOD
        )
        train_docs = docs.filter(split != 0)
        held_docs = docs.filter(split == 0)
        sym_t = T._word_symbols_from(train_docs)
        sym_h = T._word_symbols_from(held_docs)
        for _ in range(T._N_MERGES):
            sym_t = persist_tracked(sym_t)
            top = (
                T._pair_counts(sym_t)
                .orderBy(F.col("cnt").desc(), "a", "b")
                .limit(1)
                .select("a", "b")
            )
            sym_t = (
                sym_t.crossJoin(F.broadcast(top))
                .withColumn("s", F.expr(T._APPLY_MERGE))
                .select("word", "freq", "s")
            )
            sym_h = (
                sym_h.crossJoin(F.broadcast(top))
                .withColumn("s", F.expr(T._APPLY_MERGE))
                .select("word", "freq", "s")
            )
        wtok = sym_h.select(
            "word", F.size(F.split(F.trim(F.col("s")), " ")).alias("n_sym")
        )
        docw = held_docs.select(
            "lang",
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower(text), '{T._WORD_RE}', 0)"
                )
            ).alias("word"),
        )
        return (
            docw.join(F.broadcast(wtok), "word")
            .groupBy("lang")
            .agg(
                F.count("*").alias("words"),
                F.sum("n_sym").cast("long").alias("bpe_tokens"),
                dround(
                    F.sum("n_sym").cast("double") / F.count("*"), 4
                ).alias("tokens_per_word"),
            )
            .orderBy("lang")
            .collect()
        )


def _old_kcenter(spark, sf_dir):
    """Pre-r20 greedy k-center: per-pick persist (no lineage cut)."""
    from pyspark.sql import functions as F

    from apache_iceberg_with_clickhouse_olake_spark.operators import (
        clustering as C,
    )
    from apache_iceberg_with_clickhouse_olake_spark.operators._cache import (
        cache_scope,
        persist_tracked,
    )
    from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import (
        load_table,
    )

    with cache_scope():
        par = spark.sparkContext.defaultParallelism
        emb = (
            load_table(spark, sf_dir, "embeddings")
            .repartition(par, "vec_id")
            .select("vec_id", C._dvec(F.col("embedding")).alias("dv"))
        )
        c0 = (
            emb.orderBy("vec_id")
            .limit(1)
            .select(
                F.col("vec_id").alias("cid"),
                F.col("dv").alias("cv"),
                F.lit(0).cast("int").alias("ord"),
            )
        )
        m = persist_tracked(
            emb.crossJoin(F.broadcast(c0.select("cv"))).select(
                "vec_id", "dv",
                F.expr(C._d2_spark_sql("dv", "cv")).alias("mind"),
            )
        )
        centers = [c0]
        for t in range(1, C._KCENTER_PICKS + 1):
            ct = (
                m.orderBy(F.col("mind").desc_nulls_last(), "vec_id")
                .limit(1)
                .select(
                    F.col("vec_id").alias("cid"),
                    F.col("dv").alias("cv"),
                    F.lit(t).cast("int").alias("ord"),
                )
            )
            centers.append(ct)
            if t < C._KCENTER_PICKS:
                m = persist_tracked(
                    m.crossJoin(F.broadcast(ct.select("cv"))).select(
                        "vec_id", "dv",
                        F.least(
                            F.col("mind"),
                            F.expr(C._d2_spark_sql("dv", "cv")),
                        ).alias("mind"),
                    )
                )
        cents = centers[0]
        for c in centers[1:]:
            cents = cents.unionAll(c)
        cents = persist_tracked(cents)
        assign = C._assign(
            emb,
            cents.select(F.col("ord").cast("long").alias("cluster"), "cv"),
        ).select(
            "vec_id",
            F.col("cluster").cast("int").alias("ord"),
            F.col("d2").alias("d"),
        )
        per = assign.groupBy("ord").agg(
            F.count("vec_id").cast("long").alias("n_members"),
            F.max("d").alias("radius"),
            C.davg("d", "avg_dist"),
        )
        return (
            cents.select("cid", "ord")
            .join(F.broadcast(per), "ord", "left")
            .select(
                F.col("ord").alias("pick_order"),
                F.col("cid").alias("center_id"),
                F.coalesce("n_members", F.lit(0)).cast("long")
                .alias("n_members"),
                "radius",
                "avg_dist",
            )
            .orderBy("pick_order")
            .collect()
        )


def _build_spread(spark, sf_dir):
    """The bench.py spread corpus: 4x rotated replicas (untimed)."""
    from pyspark.sql import functions as SF

    out = tempfile.mkdtemp(prefix="ab_spread_")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dim = 64
    reps = []
    for r in range(4):
        shift = 16 * r
        rot = (
            SF.concat(
                SF.slice(SF.col("embedding"), shift + 1, dim - shift),
                SF.slice(SF.col("embedding"), 1, shift),
            )
            if shift
            else SF.col("embedding")
        )
        reps.append(
            emb.select(
                (SF.col("vec_id") * 4 + SF.lit(r)).alias("vec_id"),
                rot.alias("embedding"),
                "label",
            )
        )
    spread = reps[0]
    for rdf in reps[1:]:
        spread = spread.unionAll(rdf)
    spread.write.parquet(os.path.join(out, "embeddings.parquet"))
    return out


def main() -> int:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    which = sys.argv[2:] or [
        "semantic_dedup_stats",
        "semantic_dedup_cascade_stats",
        "semantic_dedup_twolevel_stats",
        "spread",
        "leakage",
    ]

    from apache_iceberg_with_clickhouse_olake_spark.operators import (
        clustering,
        registry,
    )
    from apache_iceberg_with_clickhouse_olake_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "ab-r20", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    new_salted = clustering._salted_block_dropped

    spread_dir = None
    try:
        for name in which:
            if name in ("embedding_power_iteration", "embedding_pca_top2"):
                import apache_iceberg_with_clickhouse_olake_spark.operators.linalg as L  # noqa: E501

                new_loop = L._pi_loop
                fn = queries[name]
                sfd = SF_DIR

                def run_a(fn=fn, sfd=sfd, L=L):
                    L._pi_loop = _old_pi_loop
                    try:
                        fn(spark, sfd).collect()
                    finally:
                        L._pi_loop = new_loop

                def run_b(fn=fn, sfd=sfd):
                    fn(spark, sfd).collect()

            elif name.startswith("lloyd:"):
                # A = current lazy Lloyd chain, B = synchronous-update
                # candidate; timed through a real consumer query
                qname = name.split(":", 1)[1]
                fn = queries[qname]
                sfd = SF_DIR
                orig_state = clustering._kmeans_state_frames

                def run_a(fn=fn, sfd=sfd):
                    fn(spark, sfd).collect()

                def run_b(fn=fn, sfd=sfd, orig=orig_state):
                    clustering._kmeans_state_frames = (
                        _sync_kmeans_state_frames
                    )
                    try:
                        fn(spark, sfd).collect()
                    finally:
                        clustering._kmeans_state_frames = orig

            elif name.startswith("shj:"):
                # r19 VERDICT item 6: A = default join policy, B =
                # allow shuffled-hash (preferSortMergeJoin=false + AQE
                # local-map threshold). The planner reads these at
                # query build, so per-run toggling in one session is a
                # valid interleaved A/B.
                qname = name.split(":", 1)[1]
                fn = queries[qname]
                sfd = SF_DIR
                conf = spark.conf

                def run_a(fn=fn, sfd=sfd):
                    conf.set("spark.sql.join.preferSortMergeJoin", "true")
                    conf.set(
                        "spark.sql.adaptive."
                        "maxShuffledHashJoinLocalMapThreshold",
                        "0",
                    )
                    fn(spark, sfd).collect()

                def run_b(fn=fn, sfd=sfd):
                    conf.set("spark.sql.join.preferSortMergeJoin", "false")
                    conf.set(
                        "spark.sql.adaptive."
                        "maxShuffledHashJoinLocalMapThreshold",
                        "64m",
                    )
                    try:
                        fn(spark, sfd).collect()
                    finally:
                        conf.set(
                            "spark.sql.join.preferSortMergeJoin", "true"
                        )
                        conf.set(
                            "spark.sql.adaptive."
                            "maxShuffledHashJoinLocalMapThreshold",
                            "0",
                        )

            elif name == "kcenter":
                sfd = SF_DIR

                def run_a():
                    _old_kcenter(spark, sfd)

                def run_b():
                    queries["greedy_kcenter_sample"](spark, sfd).collect()

            elif name == "bpe_heldout":
                sfd = SF_DIR

                def run_a():
                    _old_bpe_heldout(spark, sfd)

                def run_b():
                    queries["bpe_heldout_compression"](
                        spark, sfd
                    ).collect()

            elif name == "leakage":
                sfd = SF_DIR

                def run_a():
                    _old_leakage(spark, sfd).collect()

                def run_b():
                    queries["leakage_safe_split_stats"](spark, sfd).collect()

            else:
                if name == "spread":
                    if spread_dir is None:
                        spread_dir = _build_spread(spark, SF_DIR)
                    sfd = spread_dir
                    fn = queries["semantic_dedup_twolevel_stats"]
                else:
                    sfd = SF_DIR
                    fn = queries[name]

                def run_a(fn=fn, sfd=sfd):
                    clustering._salted_block_dropped = (
                        _old_salted_block_dropped
                    )
                    try:
                        fn(spark, sfd).collect()
                    finally:
                        clustering._salted_block_dropped = new_salted

                def run_b(fn=fn, sfd=sfd):
                    fn(spark, sfd).collect()

            # warm both once (codegen, listing, python workers)
            run_a()
            run_b()
            ta, tb = [], []
            for i in range(pairs):
                spark.sparkContext.setJobDescription(f"ab:{name}:A{i}")
                t0 = time.perf_counter()
                run_a()
                ta.append(time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(f"ab:{name}:B{i}")
                t0 = time.perf_counter()
                run_b()
                tb.append(time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(None)
            ma, mb = statistics.median(ta), statistics.median(tb)
            print(
                f"{name}: A(old)={ma:.3f}s B(new)={mb:.3f}s "
                f"ratio A/B={ma / mb:.3f}  "
                f"rawA={[round(x, 3) for x in ta]} "
                f"rawB={[round(x, 3) for x in tb]}",
                flush=True,
            )
    finally:
        if spread_dir:
            shutil.rmtree(spread_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
