"""Seeded e-commerce data generation (reference: mysql-init/01-setup.sql
-- 10 literal seed users/products (:74-132) plus generators for ~1,000
users (:138-160), ~200 products (:163-183), 10 orders/user and 5
sessions/user via stored procedures (:186-289)).

The reference's generators draw from RAND(); engine-portable RNG doesn't
exist, so randomness is replaced by the md5-derived integer hash
(functions.md5_int60) of the row id -- a pure function of the key. That
is *better* at scale (no RNG state, reproducible on any cluster/partition
topology) and makes every generated table oracle-checkable in DuckDB from
shared expressions. The fixed time anchor replaces NOW() (F9) the same
way the analytics suite anchors today() (operators/analytics.py:32).

Spark-first shape: ``spark.range(n)`` replaces the reference's 10x10x10
digit CROSS JOIN (J2, 01-setup.sql:148-160); the per-order "ORDER BY
RAND() LIMIT 1" product pick (O4, :210-212) becomes a hash pick joined to
products (J3) -- fully distributed, no driver loop, no shuffle beyond the
price-lookup join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dround, md5_int60

ANCHOR_DATE = "2026-01-01"  # fixed NOW() stand-in
N_USERS = 1000
N_PRODUCTS = 200
ORDERS_PER_USER = 10
SESSIONS_PER_USER = 5

COUNTRIES = (
    "USA", "Canada", "UK", "Germany", "France",
    "Japan", "Australia", "Brazil", "India", "Mexico",
)
CATEGORIES = ("Electronics", "Books", "Clothing", "Home", "Sports", "Toys")
ORDER_STATUSES = ("pending", "processing", "shipped", "delivered", "cancelled")
DEVICES = ("desktop", "mobile", "tablet")


def _h(salt: str, idx: Column) -> Column:
    """Deterministic 60-bit hash of (salt, id) -- the RAND() replacement."""
    return md5_int60(F.concat(F.lit(salt + "-"), idx.cast("string")))


def _elt(idx: Column, choices: tuple[str, ...]) -> Column:
    return F.element_at(F.array(*[F.lit(c) for c in choices]), idx)


def gen_users(spark: SparkSession, n: int = N_USERS) -> DataFrame:
    """users: username/email CONCAT (F1), hash-bucketed age/country (F3/F4
    via hash, F5 ELT), 90/10 active skew (F6 IF), created_at back-dated
    (F11 DATE_SUB)."""
    r = spark.range(1, n + 1).withColumnRenamed("id", "user_id")
    i = F.col("user_id")
    h = _h("user", i)
    return r.select(
        "user_id",
        F.concat(F.lit("user"), i.cast("string")).alias("username"),
        F.concat(F.lit("user"), i.cast("string"), F.lit("@example.com")).alias(
            "email"
        ),
        (F.lit(18) + (h % 53)).cast("int").alias("age"),
        _elt((h % 10 + 1).cast("int"), COUNTRIES).alias("country"),
        F.when(h % 10 < 9, F.lit("active"))
        .otherwise(F.lit("inactive"))
        .alias("status"),
        F.date_sub(F.lit(ANCHOR_DATE).cast("date"), (h % 365).cast("int")).alias(
            "created_date"
        ),
    )


def gen_products(spark: SparkSession, n: int = N_PRODUCTS) -> DataFrame:
    """products: category ELT, price 10..3000 with 2 decimals, stock,
    90/10 active flag (01-setup.sql:163-183)."""
    r = spark.range(1, n + 1).withColumnRenamed("id", "product_id")
    i = F.col("product_id")
    h = _h("prod", i)
    return r.select(
        "product_id",
        F.concat(F.lit("Product "), i.cast("string")).alias("name"),
        _elt((h % 6 + 1).cast("int"), CATEGORIES).alias("category"),
        dround(F.lit(10.0) + (h % 299000).cast("double") / 100.0, 2).alias(
            "price"
        ),
        (h % 1000).cast("int").alias("stock_quantity"),
        (h % 10 < 9).alias("is_active"),
    )


def gen_orders(spark: SparkSession, n_users: int = N_USERS,
               n_products: int = N_PRODUCTS,
               per_user: int = ORDERS_PER_USER) -> DataFrame:
    """orders: 10 per user (generate_orders stored-proc equivalent,
    01-setup.sql:186-239). Product pick is the O4 hash pick; unit price
    comes from a key join to products (J3/P9); total_amount is the
    generated column quantity*unit_price (F16, :44)."""
    r = spark.range(1, n_users * per_user + 1).withColumnRenamed("id", "order_id")
    i = F.col("order_id")
    h = _h("order", i)
    skeleton = r.select(
        "order_id",
        F.expr(f"(order_id - 1) div {per_user} + 1").alias("user_id"),
        (h % n_products + 1).alias("product_id"),
        (h % 5 + 1).cast("int").alias("quantity"),
        _elt((h % 5 + 1).cast("int"), ORDER_STATUSES).alias("status"),
        F.date_sub(F.lit(ANCHOR_DATE).cast("date"), (h % 365).cast("int")).alias(
            "order_date"
        ),
    )
    products = gen_products(spark, n_products).select(
        "product_id", F.col("price").alias("unit_price")
    )
    return (
        skeleton.join(products, "product_id")
        .select(
            "order_id",
            "user_id",
            "product_id",
            "quantity",
            "unit_price",
            dround(F.col("quantity") * F.col("unit_price"), 2).alias(
                "total_amount"
            ),
            "status",
            "order_date",
        )
    )


def gen_sessions(spark: SparkSession, n_users: int = N_USERS,
                 per_user: int = SESSIONS_PER_USER) -> DataFrame:
    """user_sessions: 5 per user (generate_sessions equivalent,
    01-setup.sql:242-289): device ELT, duration/pages hash-bucketed,
    login back-dated by minutes (F11/F15 shape)."""
    r = spark.range(1, n_users * per_user + 1).withColumnRenamed("id", "session_id")
    i = F.col("session_id")
    h = _h("sess", i)
    return r.select(
        "session_id",
        F.expr(f"(session_id - 1) div {per_user} + 1").alias("user_id"),
        F.concat(F.lit("tok-"), md5_int60(F.concat(F.lit("tok-"), i.cast("string"))).cast("string")).alias("session_token"),
        _elt((h % 3 + 1).cast("int"), DEVICES).alias("device"),
        (h % 7200).cast("int").alias("duration_secs"),
        (h % 50 + 1).cast("int").alias("pages_viewed"),
        F.date_sub(F.lit(ANCHOR_DATE).cast("date"), (h % 90).cast("int")).alias(
            "login_date"
        ),
    )
