"""Semi-/anti-join decision-support suite (TPC-H Q3/Q4/Q10/Q15/Q18/Q21/
Q22 shapes over the driver star schema).

The reference's OLAP engines answer these shapes with correlated
subqueries (EXISTS / NOT EXISTS / IN / scalar subselect); ClickHouse
rewrites them to semi/anti joins internally. Here each is declared as
the join Catalyst plans best, with the correlated predicate re-expressed
as a partial-aggregable reduction of the fact table wherever the
semantics allow -- the 100 TB discipline is "reduce before you join":
an EXISTS over lineitem becomes a per-orderkey MAX that shrinks the
probe side ~4:1 before any exchange, and a NOT EXISTS becomes an anti
join against a pre-projected key set.

The testdata schema omits l_commitdate/l_receiptdate/l_shipmode, so the
Q4/Q21 "late delivery" predicates are re-keyed to what the fixtures
carry: shipping lag vs the order date, and the R return flag
(FIXTURES.md section B). Shapes and plan disciplines are unchanged.

Reference parity: the grouped-agg cousins of these queries live in
compare-query-performance.sql:16-130; the lake round-trips they feed are
BLOG_POST_COMPLETE_WALKTHROUGH.md:441-553.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import (
    davg,
    davg_sql,
    dround,
    dround_sql,
    dsum,
    dsum_sql,
)
from ..sources.parquet import load_table
from .registry import query

# Fixed predicate anchors inside the static fixture ranges (orders span
# 1995-01..2001-08; lineitem ships through 2001-11 -- see FIXTURES.md).
_Q3_CUT = "1998-07-01"      # orders placed before / lines shipped after
_Q3_SEGMENT = "BUILDING"
_Q4_LAG_DAYS = 75           # a line this late marks the order delayed
_Q4_LO, _Q4_HI = "1997-01-01", "1997-07-01"
_Q10_LO, _Q10_HI = "1999-07-01", "2000-01-01"
_Q15_LO, _Q15_HI = "1999-01-01", "1999-04-01"
_Q18_MIN_QTY = 300
_Q22_IDLE_SINCE = "2000-07-01"


# ---------------------------------------------------------------------------
# Q3: unshipped-revenue shipping priority
# ---------------------------------------------------------------------------


@query(
    "shipping_priority_topk",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           o.o_orderdate AS order_date,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{_Q3_CUT} 00:00:00'
      AND l.l_shipdate > TIMESTAMP '{_Q3_CUT} 00:00:00'
    GROUP BY 1, 2
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
    tags=("J1", "A4", "O1", "O3", "P5"),
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 open orders by outstanding revenue for one market segment
    (TPC-H Q3). Both date predicates and the segment filter are Column
    predicates over the scans, so they push to the parquet readers
    before any join; customer grows linearly with scale so it carries NO
    broadcast hint (AQE promotes the join when the filtered side is
    actually small, keeps a shuffle join at 100 TB). The top-10 is
    TakeOrderedAndProject over the aggregated frame -- one row per
    order, never a global sort of fact rows."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == _Q3_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_CUT).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_CUT).cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("order_date"),
        )
        .agg(dsum(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), "orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4: order-priority counts gated on an EXISTS over lineitem
# ---------------------------------------------------------------------------


@query(
    "late_exists_order_priority",
    oracle=f"""
    SELECT o.o_orderpriority AS priority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{_Q4_HI} 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q4_LAG_DAYS} DAY
      )
    GROUP BY 1 ORDER BY 1
    """,
    tags=("A2", "P5", "J1"),
)
def late_exists_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per priority where at least one line shipped more
    than {lag} days after the order date (TPC-H Q4's EXISTS, re-keyed to
    shipping lag). The correlated EXISTS is NOT executed as a per-row
    probe: lineitem reduces to one (orderkey, max_shipdate) row per
    order first -- a partial-aggregable shuffle that shrinks the probe
    side by the lines-per-order factor BEFORE the join -- and the
    correlation becomes a plain inner-join filter `max_shipdate >
    o_orderdate + lag`, exactly equivalent to EXISTS because max(ship)
    exceeds the bound iff some line does. The date range prunes orders
    at the scan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_HI).cast("timestamp"))
    )
    latest = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_shipdate"))
    )
    lag = F.expr(f"INTERVAL {_Q4_LAG_DAYS} DAYS")
    return (
        orders.join(latest, orders.o_orderkey == latest.l_orderkey)
        .filter(F.col("max_shipdate") > F.col("o_orderdate") + lag)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("n_orders"))
        .orderBy("priority")
    )


late_exists_order_priority.__doc__ = late_exists_order_priority.__doc__.format(
    lag=_Q4_LAG_DAYS
)


# ---------------------------------------------------------------------------
# Q10: returned-item revenue ranking
# ---------------------------------------------------------------------------


@query(
    "returned_items_ranking",
    oracle=f"""
    WITH per_cust AS (
      SELECT o.o_custkey,
             {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '{_Q10_LO} 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '{_Q10_HI} 00:00:00'
      GROUP BY 1
    )
    SELECT c.c_custkey AS custkey, c.c_name AS cust_name,
           n.n_name AS nation, p.revenue
    FROM per_cust p
    JOIN customer c ON c.c_custkey = p.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
    tags=("J1", "A4", "O1", "O3"),
)
def returned_items_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returned lines in a
    half-year window (TPC-H Q10). Revenue aggregates down to one row
    per customer BEFORE any dimension attaches: the returnflag and date
    filters push to the scans, the lineitem-orders join shuffles on
    orderkey (AQE-sized), and only the customer-grain aggregate joins
    customer (linear dim, no hint) and broadcast nation. Joining dims
    after the reduction keeps the wide c_name/n_name strings out of the
    fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(dsum(rev, "revenue"))
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q15: top supplier via scalar-subquery max
# ---------------------------------------------------------------------------


@query(
    "top_supplier_revenue",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_Q15_LO} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{_Q15_HI} 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supplier_name,
           r.total_revenue
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY suppkey
    """,
    tags=("A4", "A5", "J1"),
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the quarter's maximum revenue (TPC-H Q15). The
    scalar subquery MAX is a one-row aggregate of the already-reduced
    per-supplier frame, broadcast back as a literal join -- NOT a
    window max, whose single-partition Window over all suppliers
    serializes at scale. The per-supplier reduction itself is one
    partial-aggregable shuffle of the date-pruned lines. Equality on
    the exact decimal sums is deterministic cross-engine (dsum snaps
    both sides identically), so ties surface every argmax row, exactly
    as the SQL does."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        dsum(rev, "total_revenue")
    )
    best = per_supp.agg(F.max("total_revenue").alias("best_revenue"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        per_supp.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_revenue"))
        .join(F.broadcast(supp), F.col("suppkey") == supp.s_suppkey)
        .select(
            "suppkey",
            F.col("s_name").alias("supplier_name"),
            "total_revenue",
        )
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------------------
# Q18: large-quantity orders (group-HAVING IN subquery)
# ---------------------------------------------------------------------------


@query(
    "large_quantity_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {dsum_sql('l_quantity')} AS sum_qty
      FROM lineitem GROUP BY 1
      HAVING {dsum_sql('l_quantity')} > {_Q18_MIN_QTY}
    )
    SELECT c.c_custkey AS custkey, c.c_name AS cust_name,
           o.o_orderkey AS orderkey, o.o_orderdate AS order_date,
           o.o_totalprice AS total_price, b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_price DESC, orderkey
    LIMIT 100
    """,
    tags=("A4", "A5", "J1", "O1", "O3"),
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold, with their
    customers (TPC-H Q18). The IN-subquery is the aggregate itself:
    lineitem reduces to (orderkey, sum_qty) with map-side combine, the
    HAVING filter drops ~99.7% of orders BEFORE any join, and only the
    surviving handful joins orders then customer -- AQE sees the tiny
    build side and broadcasts both attach joins at any scale. A naive
    IN-subquery translation would semi-join the full orders table
    against the full aggregate and then re-join lineitem; this plan
    touches the fact table once."""
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > _Q18_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.col("total_price").desc(), "orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q21: suppliers solely responsible for a returned multi-supplier order
# ---------------------------------------------------------------------------


@query(
    "lonely_late_supplier",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                 THEN l_suppkey END) AS n_rsupp,
             MAX(CASE WHEN l_returnflag = 'R'
                      THEN l_suppkey END) AS r_supp
      FROM lineitem GROUP BY 1
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supplier_name,
           COUNT(*) AS blamed_orders
    FROM per_order p
    JOIN supplier s ON s.s_suppkey = p.r_supp
    WHERE p.n_supp >= 2 AND p.n_rsupp = 1
    GROUP BY 1, 2
    ORDER BY blamed_orders DESC, suppkey
    LIMIT 25
    """,
    tags=("A2", "A6", "J1", "O1", "O3"),
)
def lonely_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the SOLE returned-line supplier on
    multi-supplier orders, ranked by blame count (TPC-H Q21's
    EXISTS + NOT EXISTS pair, re-keyed to the R return flag). The
    textbook formulation self-joins lineitem three times (l1 x exists
    l2 x not-exists l3) -- three shuffles of the largest fact table.
    Here both correlations collapse into ONE per-orderkey aggregate:
    n_supp >= 2 encodes the EXISTS (another supplier on the order),
    n_rsupp = 1 encodes the NOT EXISTS (no OTHER supplier was flagged),
    and when n_rsupp = 1 the MAX over the flagged suppkeys IS that sole
    supplier. One orderkey shuffle with partial distinct, one
    supplier-grain count, one broadcast name attach.

    The two distincts are computed by an EXPLICIT two-level aggregate
    -- collapse to distinct (orderkey, suppkey) pairs first (map-side
    partials), then plain counts per order -- instead of two
    countDistinct()s in one agg: Catalyst plans multi-distinct via an
    Expand that triples every lineitem row before the shuffle, and the
    r12 A/B measured the two-level form 1.7x faster at BOTH 1x and 8x
    replicated-fact scale (2.03->1.20 s, 2.83->1.73 s medians,
    identical results; SCALING.md r12 residue audit)."""
    per_pair = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.col("l_returnflag") == "R").alias("has_r"))
    )
    per_order = (
        per_pair.groupBy("l_orderkey")
        .agg(
            # count the carried KEY, not rows: COUNT(DISTINCT l_suppkey)
            # ignores NULLs, so a NULL-suppkey pair group must not count
            # toward either distinct (r12 ADVICE; no divergence on
            # TPC-H data where l_suppkey is NOT NULL, but the engine
            # must not depend on that fixture property)
            F.count("l_suppkey").alias("n_supp"),
            F.count(
                F.when(F.col("has_r"), F.col("l_suppkey"))
            ).alias("n_rsupp"),
            F.max(F.when(F.col("has_r"), F.col("l_suppkey"))).alias(
                "r_supp"
            ),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_rsupp") == 1))
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        per_order.groupBy("r_supp")
        .agg(F.count("*").alias("blamed_orders"))
        .join(F.broadcast(supp), F.col("r_supp") == supp.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier_name"),
            "blamed_orders",
        )
        .orderBy(F.col("blamed_orders").desc(), "suppkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Q22: rich-but-idle customers (anti join + scalar average)
# ---------------------------------------------------------------------------


@query(
    "idle_rich_customers",
    oracle=f"""
    WITH thresh AS (
      SELECT {davg_sql('c_acctbal')} AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name AS nation,
           COUNT(*) AS n_customers,
           {dsum_sql('c.c_acctbal')} AS total_balance
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey, thresh
    WHERE c.c_acctbal > thresh.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{_Q22_IDLE_SINCE} 00:00:00'
      )
    GROUP BY 1 ORDER BY 1
    """,
    tags=("A2", "A4", "J1", "P8"),
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation count and balance of above-average-balance customers
    with no recent orders (TPC-H Q22; the fixtures give every customer
    SOME order, so "never ordered" becomes "idle since a cutoff"). The
    scalar average is a one-row aggregate broadcast back as a literal
    cross join; the NOT EXISTS is a left-anti join against the
    date-pruned orders projected to DISTINCT custkeys -- the projection
    and distinct shrink the anti side before its shuffle, and the date
    filter rides the parquet scan. Nation attaches by broadcast after
    the per-nation reduction would be wrong (the group IS the nation),
    so it attaches to the filtered customer frame -- still only 25 rows
    built-side."""
    cust = load_table(spark, sf_dir, "customer")
    thresh = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", "avg_bal")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit(_Q22_IDLE_SINCE).cast("timestamp")
        )
        .select("o_custkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation")
    rich = cust.join(F.broadcast(thresh)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return (
        idle.join(F.broadcast(nation), idle.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal", "total_balance"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Q5: local-supplier volume (region-gated same-nation trade)
# ---------------------------------------------------------------------------

_Q5_REGION = "ASIA"
_Q5_LO, _Q5_HI = "1997-01-01", "1999-01-01"


@query(
    "intra_region_revenue",
    oracle=f"""
    SELECT n.n_name AS nation,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = '{_Q5_REGION}'
      AND o.o_orderdate >= TIMESTAMP '{_Q5_LO} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{_Q5_HI} 00:00:00'
    GROUP BY 1
    ORDER BY revenue DESC, nation
    """,
    tags=("J1", "A4", "O1"),
)
def intra_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped by a supplier in the CUSTOMER's own nation,
    per nation of one region (TPC-H Q5). The same-nation correlation
    (s_nationkey = c_nationkey) rides the broadcast supplier join as an
    extra equi-condition, so mismatched rows die at the probe instead
    of surviving to a filter; nation+region fold into one 25-row
    broadcast whose region predicate prunes BEFORE broadcasting. Fact
    shuffles: lineitem-orders on orderkey, then +customer on custkey --
    the two AQE-sized joins any fact-fact-dim plan needs; everything
    else is map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q5_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q5_HI).cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    local_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == _Q5_REGION)),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(
            F.broadcast(local_nations),
            cust.c_nationkey == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), "nation")
    )


# ---------------------------------------------------------------------------
# Q7: bilateral trade volume by ship-year
# ---------------------------------------------------------------------------

_Q7_NATION_A = "NATION_1"
_Q7_NATION_B = "NATION_2"


@query(
    "nation_trade_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS volume
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE (ns.n_name = '{_Q7_NATION_A}' AND nc.n_name = '{_Q7_NATION_B}')
       OR (ns.n_name = '{_Q7_NATION_B}' AND nc.n_name = '{_Q7_NATION_A}')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    tags=("J1", "A4", "A8"),
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral shipping volume between two nations per ship-year
    (TPC-H Q7). The supplier-side nation filter applies BEFORE the fact
    joins -- supplier broadcasts pre-filtered to the two nations, so
    only their lineitems survive the first probe and the orderkey/
    custkey shuffles carry a two-nation slice, not the whole fact
    table. The customer side can't pre-filter its join input the same
    way (any customer may buy from both), so its two-nation gate rides
    the broadcast-nation attach; the OR-pair predicate then reduces to
    excluding the two same-nation flows."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    pair = nation.filter(
        F.col("n_name").isin(_Q7_NATION_A, _Q7_NATION_B)
    ).select("n_nationkey", "n_name")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(pair.withColumnRenamed("n_name", "supp_nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    custn = (
        cust.join(
            F.broadcast(pair.withColumnRenamed("n_name", "cust_nation")),
            cust.c_nationkey == F.col("n_nationkey"),
        )
        .select("c_custkey", "cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(custn, orders.o_custkey == custn.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(dsum(rev, "volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# ---------------------------------------------------------------------------
# Q16: supplier diversity per (brand, size) with a NOT-IN exclusion
# ---------------------------------------------------------------------------

_Q16_BRANDS = ("Brand#12", "Brand#23", "Brand#34", "Brand#45")
_Q16_SIZES = (1, 4, 7, 10, 23, 36)
_Q16_EXCLUDED_NATION = 0


@query(
    "brand_size_supplier_counts",
    oracle=f"""
    SELECT p.p_brand AS brand,
           p.p_size AS size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand IN ({', '.join(f"'{b}'" for b in _Q16_BRANDS)})
      AND p.p_size IN ({', '.join(str(s) for s in _Q16_SIZES)})
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier
        WHERE s_nationkey = {_Q16_EXCLUDED_NATION}
      )
    GROUP BY 1, 2
    ORDER BY supplier_cnt DESC, brand, size
    """,
    tags=("P4", "A6", "J1", "O1"),
)
def brand_size_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier diversity per (brand, size), excluding one
    nation's suppliers (TPC-H Q16's NOT IN). The NOT IN compiles to a
    broadcast LEFT ANTI join against the pre-filtered supplier keys
    (safe here: s_suppkey is non-null, so anti-join and NOT IN agree);
    brand/size IN-lists push into the part scan, and part -- a linear
    dim -- carries no broadcast hint (AQE promotes the filtered slice).
    The distinct count shuffles only lines that survived both the
    exclusion and the part filter."""
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == _Q16_EXCLUDED_NATION)
        .select("s_suppkey")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(*_Q16_BRANDS)
        & F.col("p_size").isin(*_Q16_SIZES)
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(excluded),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "brand", "size")
    )


# ---------------------------------------------------------------------------
# Q6: forecasting revenue change (pure scan-filter aggregate)
# ---------------------------------------------------------------------------

_Q6_LO, _Q6_HI = "1998-01-01", "1999-01-01"
_Q6_DISC_LO, _Q6_DISC_HI = 0.05, 0.07
_Q6_MAX_QTY = 24


@query(
    "forecast_revenue_change",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q6_LO} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{_Q6_HI} 00:00:00'
      AND l_discount BETWEEN {_Q6_DISC_LO} AND {_Q6_DISC_HI}
      AND l_quantity < {_Q6_MAX_QTY}
    """,
    tags=("P3", "P5", "P6", "A1", "A4"),
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue that would be reclaimed by eliminating small discounts on
    low-quantity lines for one ship-year (TPC-H Q6). The whole query is
    a single scan-filter-aggregate: all three predicates are plain
    Column comparisons that push into the parquet reader (shipdate
    range prunes row groups via min/max stats; discount/quantity filter
    at the scan), and the global sum is a partial-agg pipeline with a
    one-row exchange. The plan every engine should produce -- no joins,
    no wide shuffle, scan-bound at any scale. Discount bounds compare
    the stored double against the same parsed literal in both engines,
    so the band edges agree bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(_Q6_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q6_HI).cast("timestamp"))
            & (F.col("l_discount") >= _Q6_DISC_LO)
            & (F.col("l_discount") <= _Q6_DISC_HI)
            & (F.col("l_quantity") < _Q6_MAX_QTY)
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * F.col("l_discount"),
                "revenue_delta",
            ),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q9: product-line profit by supplier nation and order year
# ---------------------------------------------------------------------------

_Q9_NAME_FRAGMENT = "gear"
# The fixture schema has no partsupp table (TESTDATA.md), so Q9's
# ps_supplycost is re-keyed to a 10% unit cost of the part's retail
# price -- the shape (profit = revenue - cost, cost via the part dim)
# is unchanged.
_Q9_COST_RATE = 0.1


@query(
    "product_profit_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           {dsum_sql(
               'l.l_extendedprice * (1 - l.l_discount)'
               f' - p.p_retailprice * l.l_quantity * {_Q9_COST_RATE}'
           )} AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
               AND p.p_name LIKE '%{_Q9_NAME_FRAGMENT}%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    ORDER BY nation, order_year DESC
    """,
    tags=("J1", "A4", "A8", "O2"),
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on one product line per supplier nation and order year
    (TPC-H Q9). The LIKE-filtered part slice joins lineitem FIRST --
    it's the most selective reduction (~1/4 of parts), so the orderkey
    shuffle that attaches the order date carries only surviving lines;
    supplier->nation folds into one broadcast attach. profit =
    revenue - unit_cost*qty is computed per row BEFORE aggregation so
    the decimal snap sees one column and the sum stays a single
    partial-agg pipeline. Part carries no broadcast hint (linear dim;
    AQE promotes the filtered slice when it is actually small)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"%{_Q9_NAME_FRAGMENT}%")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(_Q9_COST_RATE)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(dsum(profit, "profit"))
        .orderBy("nation", F.col("order_year").desc())
    )


# ---------------------------------------------------------------------------
# Q12: shipping-lag buckets vs order priority (conditional CASE counts)
# ---------------------------------------------------------------------------

# The fixture lineitem has no l_shipmode/l_receiptdate (FIXTURES.md), so
# Q12's two-mode grouping is re-keyed to shipping-lag buckets derived
# from columns the fixture carries; the CASE-count shape is unchanged.
_Q12_LO, _Q12_HI = "1998-01-01", "1999-01-01"
_Q12_SLOW_DAYS = 30
_Q12_LATE_DAYS = 90
_Q12_URGENT = ("1-URGENT", "2-HIGH")


@query(
    "ship_lag_priority_counts",
    oracle=f"""
    SELECT CASE
             WHEN l.l_shipdate >= o.o_orderdate
                  + INTERVAL {_Q12_LATE_DAYS} DAY THEN 'LATE'
             WHEN l.l_shipdate >= o.o_orderdate
                  + INTERVAL {_Q12_SLOW_DAYS} DAY THEN 'SLOW'
             ELSE 'FAST'
           END AS ship_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN
             ({', '.join(f"'{p}'" for p in _Q12_URGENT)})
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN
             ({', '.join(f"'{p}'" for p in _Q12_URGENT)})
             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '{_Q12_LO} 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '{_Q12_HI} 00:00:00'
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("A2", "A8", "F6", "P5"),
)
def ship_lag_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgent-vs-other line counts per shipping-lag bucket for one
    ship-year (TPC-H Q12's CASE-count shape over the lag buckets the
    fixture supports). One orderkey shuffle joins the shipdate-pruned
    lineitem slice to orders; both conditional counts ride the same
    3-group hash aggregate (map-side partials, a 3-row exchange). The
    bucket CASE uses timestamp+INTERVAL comparisons -- not day-diff
    arithmetic -- because the two engines agree on interval addition
    exactly while day-difference semantics differ on sub-day offsets."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q12_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q12_HI).cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    bucket = (
        F.when(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr(f"INTERVAL {_Q12_LATE_DAYS} DAY"),
            "LATE",
        )
        .when(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr(f"INTERVAL {_Q12_SLOW_DAYS} DAY"),
            "SLOW",
        )
        .otherwise("FAST")
    )
    is_urgent = F.col("o_orderpriority").isin(*_Q12_URGENT)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(is_urgent, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(is_urgent, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


# ---------------------------------------------------------------------------
# Q13: distribution of customers by order count (count-of-counts)
# ---------------------------------------------------------------------------

_Q13_EXCLUDED_PRIORITY = "4-NOT SPECIFIED"


@query(
    "custdist_histogram",
    oracle=f"""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        AND o.o_orderpriority <> '{_Q13_EXCLUDED_PRIORITY}'
      GROUP BY 1
    )
    GROUP BY 1
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("J1", "A2", "A9", "O1"),
)
def custdist_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed exactly N qualifying orders, including
    the zero-order tail (TPC-H Q13; the comment NOT LIKE is re-keyed to
    a priority-class exclusion the fixture carries). Orders pre-
    aggregate to per-customer counts BEFORE touching customer -- the
    pre-join reduction turns the outer join's right side from fact rows
    into one row per active customer -- then customer LEFT-joins the
    counts (zero tail = NULL -> 0) and the count-of-counts is a second,
    histogram-sized aggregate. Never joins customer rows to raw orders,
    so the shuffled bytes are two key columns, not order payloads."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != _Q13_EXCLUDED_PRIORITY)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            F.coalesce(F.col("n_orders"), F.lit(0))
            .cast("long")
            .alias("c_count")
        )
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue (per-part correlated average)
# ---------------------------------------------------------------------------

_Q17_BRAND = "Brand#3"
_Q17_TYPE = "SMALL"


@query(
    "small_qty_part_revenue",
    oracle=f"""
    WITH pl AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = '{_Q17_BRAND}' AND p.p_type = '{_Q17_TYPE}'
    ),
    th AS (
      SELECT l_partkey, {davg_sql('l_quantity')} AS avg_qty
      FROM pl GROUP BY 1
    )
    SELECT {dround_sql(f"{dsum_sql('pl.l_extendedprice')} / 7.0", 4)}
             AS avg_yearly,
           COUNT(*) AS n_lines
    FROM pl JOIN th USING (l_partkey)
    WHERE 5.0 * pl.l_quantity < th.avg_qty
    """,
    tags=("J1", "A2", "A4", "P3"),
)
def small_qty_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost by refusing small orders of one
    brand/type (TPC-H Q17). The correlated per-part AVG(quantity) is a
    pre-join reduction: the brand/type part slice filters lineitem
    first (that join is the big reduction -- ~1/150 of lines survive),
    the per-part average aggregates THAT slice, and the threshold joins
    back to the same slice keyed by partkey, so the quadratic-looking
    correlation costs one extra pass over an already-tiny frame. The
    0.2*avg threshold is compared as ``5*qty < avg`` -- integer-valued
    doubles times 5 are exact, and avg is the 4-decimal snapped davg,
    so the boundary is bit-identical cross-engine (0.2 itself is not
    representable)."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == _Q17_BRAND) & (F.col("p_type") == _Q17_TYPE)
    )
    pl = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    th = pl.groupBy("l_partkey").agg(davg("l_quantity", "avg_qty"))
    return (
        pl.join(F.broadcast(th.withColumnRenamed("l_partkey", "pk")),
                F.col("l_partkey") == F.col("pk"))
        .filter(5.0 * F.col("l_quantity") < F.col("avg_qty"))
        .agg(
            dround(dsum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q11: important parts by value share (global scalar-subquery threshold)
# ---------------------------------------------------------------------------

# The fixture schema has no partsupp (TESTDATA.md), so Q11's stock value
# is re-keyed to shipped lineitem value for one nation's suppliers; the
# shape -- per-key aggregate gated on a FRACTION of the same aggregate's
# grand total -- is unchanged.
_Q11_NATION = 3  # has suppliers at every fixture scale (sf0.001 holds 10 total)
_Q11_FRACTION = 0.001


@query(
    "important_part_share",
    oracle=f"""
    WITH pv AS (
      SELECT l.l_partkey AS partkey,
             {dsum_sql('l.l_extendedprice')} AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey = {_Q11_NATION}
      GROUP BY 1
    ),
    tot AS (SELECT {dsum_sql('value')} AS total FROM pv)
    SELECT pv.partkey, pv.value,
           {dround_sql('pv.value / tot.total', 6)} AS share
    FROM pv, tot
    WHERE pv.value > {_Q11_FRACTION} * tot.total
    ORDER BY pv.value DESC, pv.partkey
    """,
    tags=("J1", "A4", "A9", "O1"),
)
def important_part_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value for one nation's suppliers exceeds a
    fraction of that nation's grand total (TPC-H Q11's scalar-subquery
    threshold). The per-part aggregate is computed ONCE and consumed
    twice -- the grand total is a re-aggregation of the per-part frame
    (A9 discipline), never a second fact scan -- and the threshold
    attaches as a one-row broadcast (BNLJ-Cross over a scalar, the
    legitimate crossJoin class). The nation gate rides the broadcast
    supplier attach, so only that nation's lineitems reach the partkey
    exchange. Both engines re-sum the ALREADY-SNAPPED per-part doubles,
    so total and threshold are bit-identical."""
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == _Q11_NATION)
        .select("s_suppkey")
    )
    pv = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(dsum("l_extendedprice", "value"))
    )
    tot = pv.agg(dsum("value", "total"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > _Q11_FRACTION * F.col("total"))
        .select(
            "partkey",
            "value",
            dround(F.col("value") / F.col("total"), 6).alias("share"),
        )
        .orderBy(F.col("value").desc(), "partkey")
    )


# ---------------------------------------------------------------------------
# Q20: suppliers gated on an aggregate-thresholded semi-join
# ---------------------------------------------------------------------------

# No partsupp availqty in the fixture, so Q20's "excess stock" gate is
# re-keyed to shipped quantity of the name-filtered parts in the window;
# the shape -- supplier semi-joined to an aggregate-HAVING subquery over
# a name-LIKE part slice -- is unchanged.
_Q20_NAME_FRAGMENT = "red"
_Q20_LO, _Q20_HI = "1998-01-01", "1999-01-01"
_Q20_MIN_QTY = 50
_Q20_NATION = 3


@query(
    "heavy_red_part_suppliers",
    oracle=f"""
    SELECT s.s_suppkey AS suppkey, s.s_name AS name
    FROM supplier s
    WHERE s.s_nationkey = {_Q20_NATION}
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%{_Q20_NAME_FRAGMENT}%'
          AND l.l_shipdate >= TIMESTAMP '{_Q20_LO} 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '{_Q20_HI} 00:00:00'
        GROUP BY 1
        HAVING SUM(l.l_quantity) > {_Q20_MIN_QTY}
      )
    ORDER BY suppkey
    """,
    tags=("J1", "A4", "P5", "O1"),
)
def heavy_red_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's suppliers who moved more than {qty} units of
    name-filtered parts in the window (TPC-H Q20's aggregate-gated IN
    subquery). The IN compiles to a LEFT SEMI join against the
    pre-aggregated qualifying-supplier keys: the inner side reduces the
    fact table to per-supplier quantity sums BEFORE any contact with
    the supplier dim (part LIKE-slice joins first, date pushdown at the
    scan), so the semi-join probes a keys-only frame. SUM(quantity)
    compares against an integer literal -- integral doubles sum exactly
    far beyond any corpus size, so no snap is needed for the gate."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(f"%{_Q20_NAME_FRAGMENT}%")
    )
    qualifying = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q20_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q20_HI).cast("timestamp"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > _Q20_MIN_QTY)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") == _Q20_NATION
    )
    return (
        supp.join(
            qualifying,
            supp.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
        )
        .orderBy("suppkey")
    )


heavy_red_part_suppliers.__doc__ = heavy_red_part_suppliers.__doc__.format(
    qty=_Q20_MIN_QTY
)
