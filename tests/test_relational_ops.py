"""Plan pins + semantic invariants for the semi/anti-join suite
(operators/relational.py). The value-level correctness gate is the
shared oracle sweep (test_correctness.py / driver_sim); these assert
the physical properties the 100 TB story depends on: correlated
predicates collapse to pre-join reductions, the fact table is scanned
once where the textbook plan scans it three times, filters ride the
parquet scans, and no scalar subquery turns into a Window."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_iceberg_with_clickhouse_olake_spark.operators import registry
from apache_iceberg_with_clickhouse_olake_spark.plans import (
    assert_pushed_filter,
    assert_scan_columns_at_most,
    physical_plan,
)
from apache_iceberg_with_clickhouse_olake_spark.sources.parquet import load_table

registry._load_all()
_Q = {name: spec.fn for name, spec in registry.REGISTRY.items()}


def _scan_count(plan: str, table: str) -> int:
    return sum(
        1
        for line in plan.splitlines()
        if "FileScan parquet" in line and f"{table}.parquet" in line
    )


# -- Q3 ---------------------------------------------------------------------


def test_q3_filters_push_and_topk_is_take_ordered(spark, sf_dir):
    df = _Q["shipping_priority_topk"](spark, sf_dir)
    assert_pushed_filter(df, "l_shipdate")
    assert_pushed_filter(df, "o_orderdate")
    assert_pushed_filter(df, "c_mktsegment")
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_q3_customer_scan_prunes_to_join_and_filter_columns(spark, sf_dir):
    assert_scan_columns_at_most(
        _Q["shipping_priority_topk"](spark, sf_dir),
        "customer",
        {"c_custkey", "c_mktsegment"},
    )


# -- Q4 ---------------------------------------------------------------------


def test_q4_exists_is_a_pre_join_reduction(spark, sf_dir):
    """The correlated EXISTS must compile to ONE narrow lineitem scan
    feeding a per-orderkey max -- no correlated-subquery rewrite
    artifacts, no second scan."""
    df = _Q["late_exists_order_priority"](spark, sf_dir)
    plan = physical_plan(df)
    assert _scan_count(plan, "lineitem") == 1, plan
    assert_scan_columns_at_most(df, "lineitem", {"l_orderkey", "l_shipdate"})
    assert_pushed_filter(df, "o_orderdate")


def test_q4_matches_literal_exists_semantics(spark, sf_dir):
    """max(shipdate) > bound  <=>  EXISTS(line with shipdate > bound):
    cross-check the reduction against Spark's own left-semi join with
    the raw correlated condition."""
    from apache_iceberg_with_clickhouse_olake_spark.operators.relational import (
        _Q4_HI,
        _Q4_LAG_DAYS,
        _Q4_LO,
    )

    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_HI).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    lag = F.expr(f"INTERVAL {_Q4_LAG_DAYS} DAYS")
    semi = (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + lag),
            "leftsemi",
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("n_orders"))
    )
    got = {
        r["priority"]: r["n_orders"]
        for r in _Q["late_exists_order_priority"](spark, sf_dir).collect()
    }
    want = {r["priority"]: r["n_orders"] for r in semi.collect()}
    assert got == want


# -- Q10 --------------------------------------------------------------------


def test_q10_scans_prune_and_push(spark, sf_dir):
    df = _Q["returned_items_ranking"](spark, sf_dir)
    assert_pushed_filter(df, "l_returnflag")
    assert_pushed_filter(df, "o_orderdate")
    assert_scan_columns_at_most(
        df,
        "lineitem",
        {"l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"},
    )
    # dims attach AFTER the customer-grain reduction: the top-k runs
    # over aggregated rows, never fact rows
    assert "TakeOrderedAndProject" in physical_plan(df)


# -- Q15 --------------------------------------------------------------------


def test_q15_scalar_max_is_not_a_window(spark, sf_dir):
    """The argmax filter must ride a one-row broadcast, never a Window
    over a single partition (which serializes all suppliers at scale)."""
    plan = physical_plan(_Q["top_supplier_revenue"](spark, sf_dir))
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_q15_ties_surface_every_argmax_supplier(spark, sf_dir):
    rows = _Q["top_supplier_revenue"](spark, sf_dir).collect()
    assert len(rows) >= 1
    revs = {r["total_revenue"] for r in rows}
    assert len(revs) == 1  # all returned rows share the max revenue


# -- Q18 --------------------------------------------------------------------


def test_q18_touches_the_fact_table_once(spark, sf_dir):
    df = _Q["large_quantity_orders"](spark, sf_dir)
    plan = physical_plan(df)
    assert _scan_count(plan, "lineitem") == 1, plan
    assert_scan_columns_at_most(df, "lineitem", {"l_orderkey", "l_quantity"})


def test_q18_every_row_clears_the_quantity_threshold(spark, sf_dir):
    from apache_iceberg_with_clickhouse_olake_spark.operators.relational import (
        _Q18_MIN_QTY,
    )

    rows = _Q["large_quantity_orders"](spark, sf_dir).collect()
    assert rows
    assert all(r["sum_qty"] > _Q18_MIN_QTY for r in rows)


# -- Q21 --------------------------------------------------------------------


def test_q21_single_fact_scan_replaces_the_triple_self_join(spark, sf_dir):
    """The EXISTS + NOT EXISTS pair must collapse into one per-orderkey
    aggregate: exactly ONE lineitem scan (the textbook plan takes
    three), reading only the three columns the blame logic needs."""
    df = _Q["lonely_late_supplier"](spark, sf_dir)
    plan = physical_plan(df)
    assert _scan_count(plan, "lineitem") == 1, plan
    assert_scan_columns_at_most(
        df, "lineitem", {"l_orderkey", "l_suppkey", "l_returnflag"}
    )


def test_q21_blame_is_sole_returned_supplier(spark, sf_dir):
    """Spot-check the blame semantics directly: every blamed (supplier,
    order) pair must have >=2 suppliers on the order and the blamed one
    as the ONLY supplier with an R line."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("n_rsupp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_rsupp") == 1))
    )
    total_blamed = per_order.count()
    rows = _Q["lonely_late_supplier"](spark, sf_dir).collect()
    assert rows
    # top-25 blame counts can't exceed the number of qualifying orders
    assert sum(r["blamed_orders"] for r in rows) <= total_blamed
    assert all(r["blamed_orders"] >= 1 for r in rows)


# -- Q22 --------------------------------------------------------------------


def test_q22_not_exists_is_an_anti_join_over_pruned_orders(spark, sf_dir):
    df = _Q["idle_rich_customers"](spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftAnti" in plan, plan
    assert_pushed_filter(df, "o_orderdate")
    assert_scan_columns_at_most(df, "orders", {"o_custkey", "o_orderdate"})


def test_q22_counts_respect_threshold_and_idleness(spark, sf_dir):
    from apache_iceberg_with_clickhouse_olake_spark.operators.relational import (
        _Q22_IDLE_SINCE,
    )

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("a"))
        .first()["a"]
    )
    recent_keys = {
        r["o_custkey"]
        for r in orders.filter(
            F.col("o_orderdate") >= F.lit(_Q22_IDLE_SINCE).cast("timestamp")
        )
        .select("o_custkey")
        .distinct()
        .collect()
    }
    expected = cust.filter(
        (F.col("c_acctbal") > avg_bal)
        & ~F.col("c_custkey").isin(list(recent_keys))
    ).count()
    got = sum(
        r["n_customers"]
        for r in _Q["idle_rich_customers"](spark, sf_dir).collect()
    )
    # davg snaps to 4 decimals; the raw-avg recomputation may disagree
    # only for customers whose balance sits within the snap epsilon
    assert abs(got - expected) <= 1
