"""Window-function operators (SURVEY.md §2.5: none exist in the reference
-- no OVER clause in any script -- so these are clearly-marked extensions
that the LLM-pipeline and CDC operators build on).

Scale notes: every window here partitions by a high-cardinality key
(customer, status) so state per partition is bounded; no windows over an
unpartitioned global ordering (a global Window.orderBy is the
single-task scale-killer and is deliberately absent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import ddbl_sql, dsnap_sql, dsum, dsum_sql
from ..sources.parquet import load_table
from .registry import query

_DEC = "decimal(30,6)"


@query(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (
             PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
    FROM orders
    QUALIFY rnk <= 3
    """,
    tags=("W-ext",),
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer top-3 orders by value: ranking window fully tie-broken
    (price DESC, then key) so results are deterministic on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "customer_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           date_diff('day',
                     lag(o_orderdate) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap_days
    FROM orders
    """,
    tags=("W-ext",),
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: days since the customer's previous order (NULL for the first).
    The as-of/temporal-ordering primitive."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("gap_days"),
    )


@query(
    "running_monthly_revenue",
    oracle=f"""
    WITH m AS (
      SELECT o_orderstatus AS status,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
             {dsum_sql('o_totalprice')} AS month_revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT status, order_month, month_revenue,
           {ddbl_sql(
               f"SUM({dsnap_sql('month_revenue')}) OVER ("
               " PARTITION BY status ORDER BY order_month"
               " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
           )}
             AS running_revenue
    FROM m
    """,
    tags=("W-ext", "A8"),
)
def running_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per status over months. Aggregated to one row
    per (status, month) BEFORE the window, so the running frame has no
    ties (deterministic) and the window state is tiny. Decimal cumsum ->
    engine-exact doubles."""
    from ..functions import dsum

    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.groupBy(
            F.col("o_orderstatus").alias("status"),
            F.trunc("o_orderdate", "month").alias("order_month"),
        )
        .agg(dsum("o_totalprice", "month_revenue"))
    )
    w = (
        Window.partitionBy("status")
        .orderBy("order_month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return m.select(
        "status",
        "order_month",
        "month_revenue",
        F.sum(F.col("month_revenue").cast(_DEC)).over(w).cast("double").alias(
            "running_revenue"
        ),
    )


@query(
    "order_value_dense_rank",
    oracle=f"""
    SELECT o_orderkey, o_orderstatus,
           CAST(year(o_orderdate)*100 + month(o_orderdate) AS INT) AS order_month,
           CAST(dense_rank() OVER (
             PARTITION BY CAST(year(o_orderdate)*100 + month(o_orderdate) AS INT)
             ORDER BY CAST(FLOOR(o_totalprice / 10000) AS BIGINT) DESC)
             AS BIGINT) AS value_decile_rank
    FROM orders
    WHERE o_orderdate >= DATE '2001-01-01'
    """,
    tags=("W-ext",),
)
def order_value_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DENSE_RANK over bucketed order value per month (bucketing makes the
    rank key discrete, so dense_rank is deterministic without a full
    tie-break)."""
    from ..functions import to_yyyymm

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("date")
    )
    month = to_yyyymm("o_orderdate")
    bucket = F.floor(F.col("o_totalprice") / 10000).cast("long")
    w = Window.partitionBy(month).orderBy(bucket.desc())
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        month.alias("order_month"),
        F.dense_rank().over(w).cast("long").alias("value_decile_rank"),
    )


# ---------------------------------------------------------------------------
# Tumbling event-time windows over the raw event stream
# ---------------------------------------------------------------------------

_TUMBLE_SECS = 900  # 15-minute buckets


@query(
    "events_tumbling_windows",
    oracle=f"""
    SELECT (epoch_us(ts) // 1000000) // {_TUMBLE_SECS} * {_TUMBLE_SECS}
             AS window_start_epoch,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS active_users,
           {dsum_sql('value')} AS window_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("C3", "A8"),
)
def events_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 15-minute event-time windows (the batch twin of the
    streaming window(ts, ...) aggregation; epoch bucketing sidesteps the
    ns-vs-us timestamp divergence between engines). Map-side partial
    aggregation; the shuffle key is the window bucket."""
    events = load_table(spark, sf_dir, "events")
    bucket = (
        F.expr(f"(unix_micros(ts) div 1000000) div {_TUMBLE_SECS}")
        * _TUMBLE_SECS
    )
    return (
        events.groupBy(bucket.alias("window_start_epoch"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("active_users"),
            dsum("value", "window_value"),
        )
        .orderBy("window_start_epoch")
    )


# Sliding (hopping) windows: width = 2 x slide, so every event lands in
# exactly width/slide = 2 overlapping windows.
_SLIDE_SECS = 900
_SLIDE_WIDTH = 2 * _SLIDE_SECS


@query(
    "events_sliding_windows",
    oracle=f"""
    WITH e AS (
      SELECT (epoch_us(ts) // 1000000) // {_SLIDE_SECS} * {_SLIDE_SECS}
               AS base,
             user_id, value
      FROM events
    ),
    s AS (
      SELECT base - {_SLIDE_SECS} * o.off AS window_start_epoch,
             user_id, value
      FROM e, (SELECT unnest([0, 1]) AS off) o
    )
    SELECT window_start_epoch,
           window_start_epoch + {_SLIDE_WIDTH} AS window_end_epoch,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS active_users,
           {dsum_sql('value')} AS window_value
    FROM s
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("C3", "W-ext"),
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 30-minute windows hopping every 15 minutes (the batch twin
    of streaming ``window(ts, '30 minutes', '15 minutes')``). Implemented
    as explicit window-start replication -- each event explodes into its
    width/slide = 2 covering windows, then one groupBy on the window
    start -- which is exactly what Spark's window() generator does
    physically, but kept as epoch arithmetic so the DuckDB oracle is
    expression-identical (and ns-timestamp-safe). At scale this is a
    2x row amplification into a map-side-combining shuffle keyed by the
    window bucket: amplification is bounded by width/slide, never by
    data volume."""
    events = load_table(spark, sf_dir, "events")
    base = (
        F.expr(f"(unix_micros(ts) div 1000000) div {_SLIDE_SECS}")
        * _SLIDE_SECS
    )
    exploded = events.select(
        F.explode(
            F.array(base - _SLIDE_SECS, base)
        ).alias("window_start_epoch"),
        "user_id",
        "value",
    )
    return (
        exploded.groupBy("window_start_epoch")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("active_users"),
            dsum("value", "window_value"),
        )
        .select(
            "window_start_epoch",
            (F.col("window_start_epoch") + _SLIDE_WIDTH).alias(
                "window_end_epoch"
            ),
            "n_events",
            "active_users",
            "window_value",
        )
        .orderBy("window_start_epoch")
    )
