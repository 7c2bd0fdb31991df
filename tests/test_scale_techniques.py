"""Scale-technique demonstrations the registry queries can't carry:
bucketed co-located joins (shuffle elimination) and arbitrary stateful
streaming via applyInPandasWithState."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import load_table
from apache_iceberg_with_clickhouse_olake_spark.streaming import (
    run_first_seen_stream,
)


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """Tables bucketed on the join key join WITHOUT an exchange on either
    side -- the co-located-join layout that kills the biggest shuffle of a
    repeated 100 TB fact-dim join."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    try:
        (
            orders.select("o_orderkey", "o_custkey", "o_totalprice")
            .write.bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .saveAsTable("b_orders")
        )
        (
            customer.select("c_custkey", "c_nationkey")
            .write.bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .mode("overwrite")
            .saveAsTable("b_customer")
        )
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        # Disable broadcast so the join layout (not size) decides the plan.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join still shuffles:\n" + plan
        )
        # And the answer matches the unbucketed join.
        got = joined.count()
        want = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_apply_in_pandas_with_state_streaming(spark, sf_dir, tmp_path):
    """applyInPandasWithState: custom per-key state across micro-batches
    (the escape hatch for operators session_window/window can't express).
    Two micro-batches of the same users: batch 1 emits kind='first',
    batch 2 kind='repeat' with n_new=0."""
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select("event_id", "user_id")
    )
    events_dir = str(tmp_path / "ev")
    events.repartition(2).write.parquet(events_dir)

    got = run_first_seen_stream(
        spark, events_dir, str(tmp_path / "ckpt")
    ).toPandas()
    assert (got[got.kind == "first"].n_new > 0).all()
    assert (got[got.kind == "repeat"].n_new == 0).all()
    firsts = set(got[got.kind == "first"].user_id)
    repeats = set(got[got.kind == "repeat"].user_id)
    assert repeats and repeats <= firsts


def test_hll_sketch_reagg_accuracy(spark, sf_dir):
    """Merged per-day HLL sketches must estimate monthly distinct users
    within 5% of the exact answer."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.analytics import (
        daily_users_hll_reagg,
    )

    got = {
        r.month_bucket: r.approx_users
        for r in daily_users_hll_reagg(spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events")
    exact = {
        r.month_bucket: r.exact
        for r in events.select(
            F.expr("cast((unix_micros(ts) div 86400000000) / 30 as int)").alias(
                "month_bucket"
            ),
            "user_id",
        )
        .groupBy("month_bucket")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k])
