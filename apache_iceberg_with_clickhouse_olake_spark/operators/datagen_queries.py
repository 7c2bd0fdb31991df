"""Registered queries over the seeded datagen (sources/datagen.py),
oracle-checked: because generation is a pure md5-hash function of row ids,
DuckDB can regenerate the identical tables from ``range()`` and the same
inlined expressions -- the generators themselves are under the
correctness gate (S7/G1 plus J2/O4/U2/F1/F4/F5/F6/F9/F11 closure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import davg_sql, dround_sql, dsum, dsum_sql, md5_int60_sql
from ..sources.datagen import (
    ANCHOR_DATE,
    CATEGORIES,
    COUNTRIES,
    DEVICES,
    N_PRODUCTS,
    N_USERS,
    ORDER_STATUSES,
    ORDERS_PER_USER,
    SESSIONS_PER_USER,
    gen_orders,
    gen_products,
    gen_sessions,
    gen_users,
)
from .registry import query


def _lst(choices: tuple[str, ...]) -> str:
    return "[" + ",".join(f"'{c}'" for c in choices) + "]"


def _h_sql(salt: str, idx: str) -> str:
    return md5_int60_sql(f"concat('{salt}-', CAST({idx} AS VARCHAR))")


_USERS_SQL = f"""
    SELECT i AS user_id,
           concat('user', CAST(i AS VARCHAR)) AS username,
           concat('user', CAST(i AS VARCHAR), '@example.com') AS email,
           CAST(18 + ({_h_sql('user', 'i')} % 53) AS INT) AS age,
           {_lst(COUNTRIES)}[CAST({_h_sql('user', 'i')} % 10 + 1 AS INT)] AS country,
           CASE WHEN {_h_sql('user', 'i')} % 10 < 9
                THEN 'active' ELSE 'inactive' END AS status,
           DATE '{ANCHOR_DATE}' - CAST({_h_sql('user', 'i')} % 365 AS INT)
             AS created_date
    FROM range(1, {N_USERS} + 1) t(i)
"""

_PRODUCTS_SQL = f"""
    SELECT i AS product_id,
           concat('Product ', CAST(i AS VARCHAR)) AS name,
           {_lst(CATEGORIES)}[CAST({_h_sql('prod', 'i')} % 6 + 1 AS INT)] AS category,
           {dround_sql(f"10.0 + CAST({_h_sql('prod', 'i')} % 299000 AS DOUBLE) / 100.0")}
             AS price,
           CAST({_h_sql('prod', 'i')} % 1000 AS INT) AS stock_quantity,
           {_h_sql('prod', 'i')} % 10 < 9 AS is_active
    FROM range(1, {N_PRODUCTS} + 1) t(i)
"""

_ORDERS_SQL = f"""
    WITH skeleton AS (
      SELECT i AS order_id,
             (i - 1) // {ORDERS_PER_USER} + 1 AS user_id,
             {_h_sql('order', 'i')} % {N_PRODUCTS} + 1 AS product_id,
             CAST({_h_sql('order', 'i')} % 5 + 1 AS INT) AS quantity,
             {_lst(ORDER_STATUSES)}[CAST({_h_sql('order', 'i')} % 5 + 1 AS INT)]
               AS status,
             DATE '{ANCHOR_DATE}' - CAST({_h_sql('order', 'i')} % 365 AS INT)
               AS order_date
      FROM range(1, {N_USERS} * {ORDERS_PER_USER} + 1) t(i)
    ),
    products AS (SELECT product_id, price AS unit_price FROM ({_PRODUCTS_SQL}))
    SELECT s.order_id, s.user_id, s.product_id, s.quantity, p.unit_price,
           {dround_sql('s.quantity * p.unit_price')} AS total_amount,
           s.status, s.order_date
    FROM skeleton s JOIN products p USING (product_id)
"""


@query("datagen_users", oracle=_USERS_SQL, tags=("S7", "G1", "F1", "F5", "F6", "F11", "J2"))
def datagen_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generated users table itself, row-for-row (1,000 rows)."""
    return gen_users(spark)


@query("datagen_products", oracle=_PRODUCTS_SQL, tags=("S7", "G1", "F2", "F4"))
def datagen_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generated products table, row-for-row (200 rows)."""
    return gen_products(spark)


@query(
    "datagen_orders_by_status",
    oracle=f"""
    SELECT status,
           COUNT(*) AS order_count,
           COUNT(DISTINCT user_id) AS customers,
           {dsum_sql('total_amount')} AS revenue
    FROM ({_ORDERS_SQL})
    GROUP BY status
    ORDER BY status
    """,
    tags=("S7", "G1", "O4", "J3", "F16"),
)
def datagen_orders_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full generator pipeline (hash product pick -> price lookup join ->
    generated total_amount) rolled up by status."""
    return (
        gen_orders(spark)
        .groupBy("status")
        .agg(
            F.count("*").alias("order_count"),
            F.countDistinct("user_id").alias("customers"),
            dsum("total_amount", "revenue"),
        )
        .orderBy("status")
    )


_SESSIONS_SQL = f"""
    SELECT i AS session_id,
           (i - 1) // {SESSIONS_PER_USER} + 1 AS user_id,
           concat('tok-', CAST({_h_sql('tok', 'i')} AS VARCHAR))
             AS session_token,
           {_lst(DEVICES)}[CAST({_h_sql('sess', 'i')} % 3 + 1 AS INT)] AS device,
           CAST({_h_sql('sess', 'i')} % 7200 AS INT) AS duration_secs,
           CAST({_h_sql('sess', 'i')} % 50 + 1 AS INT) AS pages_viewed,
           DATE '{ANCHOR_DATE}' - CAST({_h_sql('sess', 'i')} % 90 AS INT)
             AS login_date
    FROM range(1, {N_USERS} * {SESSIONS_PER_USER} + 1) t(i)
"""


@query(
    "datagen_sessions",
    oracle=_SESSIONS_SQL,
    tags=("S7", "G1", "F1", "F5", "F11"),
)
def datagen_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generated user_sessions table row-for-row (5,000 rows;
    generate_sessions stored-proc equivalent, 01-setup.sql:242-289)."""
    return gen_sessions(spark)


@query(
    "session_epoch_stats",
    oracle=f"""
    SELECT device,
           COUNT(*) AS sessions,
           {davg_sql('duration_secs')} AS avg_duration_secs,
           CAST(MIN(epoch(login_date)) AS BIGINT) AS first_login_epoch,
           CAST(MAX(epoch(login_date)) AS BIGINT) AS last_login_epoch
    FROM ({_SESSIONS_SQL})
    GROUP BY device
    ORDER BY device
    """,
    tags=("F15", "A2"),
)
def session_epoch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-device session rollup with UNIX_TIMESTAMP login bounds (F15,
    01-setup.sql:124-132 token-suffix idiom; session tz is UTC so Spark's
    unix_timestamp(date) and DuckDB's epoch(date) agree)."""
    from ..functions import davg

    return (
        gen_sessions(spark)
        .groupBy("device")
        .agg(
            F.count("*").alias("sessions"),
            davg("duration_secs", "avg_duration_secs"),
            F.min(F.unix_timestamp("login_date")).alias("first_login_epoch"),
            F.max(F.unix_timestamp("login_date")).alias("last_login_epoch"),
        )
        .orderBy("device")
    )


@query(
    "session_count_distribution",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n_sessions,
             COUNT(DISTINCT session_token) AS n_tokens
      FROM ({_SESSIONS_SQL})
      GROUP BY user_id
    )
    SELECT n_sessions AS sessions_per_user,
           COUNT(*) AS n_users,
           MIN(user_id) AS min_user_id,
           MAX(user_id) AS max_user_id,
           CAST(SUM(CASE WHEN n_tokens = n_sessions THEN 1 ELSE 0 END)
                AS BIGINT) AS users_with_unique_tokens
    FROM per_user
    GROUP BY n_sessions
    ORDER BY n_sessions
    """,
    tags=("S7", "G1", "A2"),
)
def session_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generator's per-user session-count DISTRIBUTION (r11 VERDICT
    item 6): generate_sessions deals each user exactly
    {SESSIONS_PER_USER} sessions (reference mysql-init/01-setup.sql:
    242-289 loops sessions_per_user times per user), so the
    distribution must collapse to a single row -- sessions_per_user =
    {SESSIONS_PER_USER} covering every user id -- with all session
    tokens unique per user. A second row appearing, or
    users_with_unique_tokens < n_users, is the generator-drift alarm
    this query exists to raise; the pytest twin lives in
    tests/test_r12_ops.py, this row makes the check driver-facing.

    Shape at scale: two cascaded groupBys (user, then count-of-counts);
    both have map-side partials, the second reduces to at most a
    handful of distinct counts."""
    return (
        gen_sessions(spark)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.countDistinct("session_token").alias("n_tokens"),
        )
        .groupBy(F.col("n_sessions").alias("sessions_per_user"))
        .agg(
            F.count("*").alias("n_users"),
            F.min("user_id").alias("min_user_id"),
            F.max("user_id").alias("max_user_id"),
            F.sum(
                F.when(F.col("n_tokens") == F.col("n_sessions"), 1).otherwise(0)
            ).alias("users_with_unique_tokens"),
        )
        .orderBy("sessions_per_user")
    )


session_count_distribution.__doc__ = session_count_distribution.__doc__.format(
    SESSIONS_PER_USER=SESSIONS_PER_USER
)


@query(
    "order_count_distribution",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n_orders,
             COUNT(DISTINCT order_id) AS n_ids,
             COUNT(DISTINCT product_id) AS n_products
      FROM ({_ORDERS_SQL})
      GROUP BY user_id
    )
    SELECT n_orders AS orders_per_user,
           COUNT(*) AS n_users,
           MIN(user_id) AS min_user_id,
           MAX(user_id) AS max_user_id,
           CAST(SUM(CASE WHEN n_ids = n_orders THEN 1 ELSE 0 END)
                AS BIGINT) AS users_with_unique_ids,
           MAX(n_products) AS max_products_per_user
    FROM per_user
    GROUP BY n_orders
    ORDER BY orders_per_user
    """,
    tags=("S7", "G1", "A2"),
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generator's per-user ORDER-count distribution (r12 VERDICT
    item 6, completing the generator-parity story the sessions row
    started): generate_orders deals each user exactly {ORDERS_PER_USER}
    orders (reference mysql-init/01-setup.sql:186-239 loops
    orders_per_user times per user id), so the distribution must
    collapse to a single row -- orders_per_user = {ORDERS_PER_USER}
    covering every user id -- with all order ids unique per user. A
    second row appearing, or users_with_unique_ids < n_users, is the
    generator-drift alarm; max_products_per_user additionally bounds the
    hash-assigned product fan-out (<= orders per user by construction).
    The pytest twin lives in tests/test_r12_ops.py; this row makes the
    check driver-facing like its sessions sibling.

    Shape at scale: two cascaded groupBys (user, then count-of-counts);
    both have map-side partials, the second reduces to at most a
    handful of distinct counts."""
    return (
        gen_orders(spark)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("order_id").alias("n_ids"),
            F.countDistinct("product_id").alias("n_products"),
        )
        .groupBy(F.col("n_orders").alias("orders_per_user"))
        .agg(
            F.count("*").alias("n_users"),
            F.min("user_id").alias("min_user_id"),
            F.max("user_id").alias("max_user_id"),
            F.sum(
                F.when(F.col("n_ids") == F.col("n_orders"), 1).otherwise(0)
            ).alias("users_with_unique_ids"),
            F.max("n_products").alias("max_products_per_user"),
        )
        .orderBy("orders_per_user")
    )


order_count_distribution.__doc__ = order_count_distribution.__doc__.format(
    ORDERS_PER_USER=ORDERS_PER_USER
)


@query(
    "datagen_ecommerce_counts",
    oracle=f"""
    SELECT 'users' AS table_name, COUNT(*) AS row_count FROM ({_USERS_SQL})
    UNION ALL
    SELECT 'products', COUNT(*) FROM ({_PRODUCTS_SQL})
    UNION ALL
    SELECT 'orders', COUNT(*) FROM ({_ORDERS_SQL})
    ORDER BY table_name
    """,
    tags=("A1", "U1", "U2", "S7"),
)
def datagen_ecommerce_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's table-count summary stack (U1,
    generate-more-data.sql:190-196) over the generated model."""
    parts = [
        gen_users(spark).agg(F.count("*").alias("row_count")).select(
            F.lit("users").alias("table_name"), "row_count"
        ),
        gen_products(spark).agg(F.count("*").alias("row_count")).select(
            F.lit("products").alias("table_name"), "row_count"
        ),
        gen_orders(spark).agg(F.count("*").alias("row_count")).select(
            F.lit("orders").alias("table_name"), "row_count"
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")
