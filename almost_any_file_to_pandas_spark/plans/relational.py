"""Flagship relational queries over the TPC-H-ish testdata.

The reference has no relational operators (SURVEY.md §2.9) — these
queries are the Spark-native extension surface exercising joins,
aggregations, windows, sorts, and set ops, each paired with a DuckDB
oracle.

Determinism across engines: double-typed SUM/AVG accumulate in an
order Spark does not guarantee, so every money/quantity aggregate
casts to an exact DECIMAL first (bit-for-bit identical in Spark and
DuckDB), then casts the final value back to DOUBLE. Division happens
in double on both sides.

Scale notes (100 TB mindset): dimension joins (region/nation/customer
/supplier/part) are explicitly broadcast — at production scale these
stay far below the broadcast threshold relative to the fact tables,
eliminating the shuffle of the big side. Fact-fact joins
(orders⋈lineitem) shuffle on the join key; AQE coalesces partitions
and splits skew at runtime. All filters are Catalyst-pushable
(plain column comparisons) and reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from almost_any_file_to_pandas_spark.plans import register, table
from almost_any_file_to_pandas_spark.session import apply_engine_conf


def _dec_sum(col, alias, scale="(25,6)"):
    """Exact decimal accumulation → double result (engine-portable)."""
    return F.sum(col.cast(f"decimal{scale}")).cast("double").alias(alias)


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)        AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)   AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
                                                                    AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(25,6))) AS DOUBLE)
                                                                    AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)      AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)      AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary — the flagship query.

    Single fact scan; shipdate filter pushed to parquet; two-column
    group-by with map-side partial aggregation; no join. At 100 TB the
    plan is scan → partial agg → one shuffle on (returnflag,
    linestatus) → final agg: the minimum possible data movement.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
            _dec_sum(disc_price, "sum_disc_price"),
            _dec_sum(charge, "sum_charge"),
            (F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(25,6)")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT
      l.l_orderkey AS o_orderkey,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE)
        AS revenue,
      CAST(o.o_orderdate AS VARCHAR) AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style: 3-way join + agg + deterministic top-10.

    customer is a dimension → broadcast (no shuffle of orders);
    orders⋈lineitem shuffles on orderkey. Top-10 via global sort-limit
    (Spark's TakeOrderedAndProject — no full sort at scale).
    """
    apply_engine_conf(spark)
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    # customer is the only true dimension here — broadcast it; the
    # orders side is a fact table, so orders⋈lineitem stays a shuffle
    # join on orderkey and AQE demotes it to broadcast at runtime when
    # the filtered side turns out small (never assume it at plan time:
    # at 100 TB a forced broadcast of filtered orders is an OOM).
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(li.l_orderkey.alias("o_orderkey"), F.col("o_orderdate"))
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT
      n.n_name,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE)
        AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style: 5-way star join, dims all broadcast.

    region→nation→customer collapse into one broadcast dim; orders is
    filtered by date *before* the lineitem join so the pushed-down
    predicate shrinks the shuffle. Only orders⋈lineitem moves data.
    """
    apply_engine_conf(spark)
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")

    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    # dim (customer×nation×region) IS broadcastable — it's bounded by
    # customer cardinality. ord_dim is orders-sized: keep it a shuffle
    # join and let AQE broadcast it at runtime if the date filter
    # shrank it enough.
    ord_dim = (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .select("o_orderkey", "n_name")
    )
    return (
        li.join(ord_dim, li.l_orderkey == ord_dim.o_orderkey)
        .groupBy("n_name")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "monthly_revenue_rollup",
    oracle="""
    SELECT
      year(o_orderdate)  AS o_year,
      month(o_orderdate) AS o_month,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def monthly_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup — scan + two-int group-by, no join."""
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), "total_price"),
        )
    )


@register(
    "top_customers_per_segment",
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment, c.c_custkey, c.c_name,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY c_mktsegment ORDER BY total_spend DESC, c_custkey) AS rank
      FROM spend
    )
    SELECT c_mktsegment, c_custkey, c_name, total_spend, rank
    FROM ranked WHERE rank <= 3
    """,
)
def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — window ranking after a broadcast join + agg.

    The canonical scale shape: aggregate first (shrinks to one row per
    customer), then window over the small aggregate, never over the
    raw fact table.
    """
    apply_engine_conf(spark)
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    spend = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "c_custkey", "c_name")
        .agg(_dec_sum(F.col("o_totalprice"), "total_spend"))
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("total_spend"), F.asc("c_custkey")
    )
    return (
        spend.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


@register(
    "supplier_part_volume",
    oracle="""
    SELECT
      s.s_name,
      p.p_brand,
      CAST(SUM(CAST(l.l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty,
      COUNT(DISTINCT l.l_orderkey) AS n_orders
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE p.p_size >= 25
    GROUP BY 1, 2
    """,
)
def supplier_part_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact + two broadcast dims + distinct aggregation."""
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    part = table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("s_name", "p_brand")
        .agg(
            _dec_sum(F.col("l_quantity"), "total_qty"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


@register(
    "orders_without_lineitems",
    oracle="""
    SELECT o.o_orderstatus, COUNT(*) AS n_orders
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    GROUP BY 1
    """,
)
def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS) — Spark left_anti, shuffle on orderkey."""
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "revenue_cube",
    oracle="""
    SELECT
      year(o_orderdate) AS o_year,
      o_orderstatus,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (year(o_orderdate), o_orderstatus)
    -- observed-groups semantics: Spark's CUBE over an EMPTY scan
    -- emits no rows, DuckDB emits the all-NULL grand-total row;
    -- every real group has >= 1 row, so this only bites on empty
    HAVING COUNT(*) > 0
    """,
)
def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (year, orderstatus) — all 4 grouping combinations in
    one pass. Spark expands grouping sets map-side then shuffles once
    on the expanded key; no per-combination rescan of the fact table
    (the naive union-of-groupbys would scan 4×)."""
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube(F.year("o_orderdate").alias("o_year"), "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), "total_price"),
        )
    )


@register(
    "revenue_rollup_hierarchy",
    oracle="""
    SELECT
      year(o_orderdate) AS o_year,
      month(o_orderdate) AS o_month,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
    -- observed-groups semantics: Spark's ROLLUP over an EMPTY scan
    -- emits no rows, DuckDB emits the all-NULL grand-total row;
    -- every real group has >= 1 row, so this only bites on empty
    HAVING COUNT(*) > 0
    """,
)
def revenue_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP year→month: the time-hierarchy subtotal ladder (year-
    month, year, grand total) in one shuffle."""
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    return orders.rollup(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
    ).agg(F.count("*").alias("n_orders"))


@register(
    "order_value_percentiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5)  AS p50,
           quantile_cont(o_totalprice, 0.9)  AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (linear interpolation —
    the same definition as DuckDB quantile_cont). Exact percentile
    needs the group's values together (one shuffle); at 100 TB the
    approx_percentile sketch (t-digest, map-side mergeable) is the
    drop-in when ±ε is acceptable."""
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
    )


@register(
    "orders_with_returns_semijoin",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
    )
    GROUP BY o_orderpriority
    """,
)
def orders_with_returns_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style left-semi join (TPC-H Q4 shape): orders with at
    least one returned lineitem, counted per priority.

    ``left_semi`` is the right physical contract: the probe side
    short-circuits on first match and only the order key crosses the
    shuffle (no lineitem payload columns, no post-join dedup — the
    naive inner-join + distinct plan shuffles the full match
    multiplicity). The returnflag filter is pushed to the lineitem
    parquet scan. Complements ``orders_without_lineitems`` (anti).
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    returned = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        orders.join(returned, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "customer_order_analytics",
    oracle="""
    SELECT o_orderkey, o_custkey,
           date_diff('day',
                     CAST(lag(o_orderdate) OVER w AS DATE),
                     CAST(o_orderdate AS DATE)) AS days_since_prev,
           dense_rank() OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey ASC
           ) AS price_rank_in_priority,
           ntile(4) OVER w AS order_quartile,
           CAST(cume_dist() OVER (
             PARTITION BY o_custkey
             ORDER BY o_totalprice ASC, o_orderkey ASC
           ) AS DOUBLE) AS spend_cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def customer_order_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window suite over orders: lag (days since the
    customer's previous order), dense_rank (price rank inside
    priority), ntile quartile of the customer's order sequence, and
    cume_dist of spend within customer.

    All four share at most two physical sorts: the lag/ntile/cume_dist
    windows reuse ONE shuffle+sort on o_custkey (Catalyst merges
    same-partitioning windows); dense_rank needs its own on
    o_orderpriority. Every ORDER BY carries o_orderkey as the
    deterministic tie-break so ranks hash-match across engines.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    w_seq = W.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    w_price = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_spend = W.partitionBy("o_custkey").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w_seq),
        ).alias("days_since_prev"),
        F.dense_rank().over(w_price).alias("price_rank_in_priority"),
        F.ntile(4).over(w_seq).alias("order_quartile"),
        F.cume_dist().over(w_spend).alias("spend_cume_dist"),
    )


N_SALT = 8


@register(
    "events_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def events_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a low-cardinality, skewed
    key (event_type has a handful of values across ALL events — at
    100 TB one reducer per type would absorb terabytes).

    Phase 1 groups by (key, salt) with salt = id mod N_SALT, spreading
    each hot key over N_SALT reducers; phase 2 merges the N_SALT
    partials per key — a shuffle of only keys×N_SALT rows. SUM and
    COUNT re-aggregate losslessly (decimal keeps the double sum
    order-independent). Same result as the direct groupBy, which is
    what the oracle states. Spark's own map-side partial aggregation
    makes explicit salting redundant for *algebraic* aggregates like
    these; the pattern is load-bearing for holistic ones
    (collect_list, exact distinct) where partials can't combine —
    this query pins the mechanics oracle-checked.
    """
    apply_engine_conf(spark)
    events = table(spark, sf_dir, "events")
    partial = (
        events.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(N_SALT)))
        .groupBy("event_type", "_salt")
        .agg(
            F.sum(F.col("value").cast("decimal(25,6)")).alias("_sum"),
            F.count("*").alias("_cnt"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("_sum").cast("double").alias("total_value"),
        F.sum("_cnt").alias("n_events"),
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
                    / COUNT(*)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#9'
      AND l.l_quantity < a.qty_threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style correlated scalar subquery, decorrelated: the
    per-part average quantity becomes an aggregate joined back to the
    fact — the rewrite Catalyst itself applies to correlated scalar
    subqueries, here stated explicitly so the join strategy is
    auditable.

    Scale shape: both the threshold aggregate and the probe shuffle on
    l_partkey — ONE hash partitioning reused across the aggregate and
    the join (no second Exchange of the big side); the brand-filtered
    part dimension broadcasts. The threshold is computed in decimal so
    the comparison cut is bit-identical across engines.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#9")
    part_avg = li.groupBy("l_partkey").agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double")
                / F.count("*")
            )
        ).alias("qty_threshold")
    ).withColumnRenamed("l_partkey", "a_partkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(part_avg, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).cast(
                    "double"
                )
                / 7.0
            ).alias("avg_yearly")
        )
    )


Q18_QTY_THRESHOLD = 250


@register(
    "q18_large_orders",
    oracle=f"""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           o.o_totalprice,
           CAST(s.sum_qty AS DOUBLE) AS sum_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey,
             SUM(CAST(l_quantity AS DECIMAL(25,6))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > {Q18_QTY_THRESHOLD}
    ) s ON o.o_orderkey = s.l_orderkey
    ORDER BY sum_qty DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style: large-volume orders via a grouped HAVING
    subquery joined back to orders, deterministic top-20.

    Scale shape: the lineitem aggregate shuffles once on l_orderkey and
    the HAVING filter collapses it to the rare heavy orders *before*
    the join — the join's build side is tiny and AQE broadcasts it at
    runtime. Top-20 is TakeOrderedAndProject (per-partition heaps), not
    a global sort.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    heavy = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY_THRESHOLD)
    )
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("sum_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
               / COUNT(*) AS v
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.v
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-06-01'
      )
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style: scalar subquery (global average balance) +
    anti-join (customers with no *recent* orders — no order since
    2000-06-01) + rollup by nation.

    Scale shape: the scalar aggregate is one row — cross-joined as a
    broadcast, never a shuffle; the NOT EXISTS is a left_anti join on
    o_custkey (at scale: shuffle on custkey with AQE skew handling —
    anti joins can't broadcast the fact side, and the orders side only
    needs its join column, which column pruning reduces to one long
    per row). The balance cut is decimal-computed, identical across
    engines.
    """
    apply_engine_conf(spark)
    cust = table(spark, sf_dir, "customer")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double")
            / F.count("*")
        ).alias("v")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("v"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(25,6)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


APPROX_REL_TOL = 0.05


def exact_disc_quantiles(
    df: DataFrame, col: str, qs, nb: int = 4096, tail: int = 65536
) -> dict:
    """Distributed exact discrete quantiles (smallest value whose
    cumulative count reaches ⌈q·n⌉ — DuckDB's ``quantile_disc``)
    via iterative histogram refinement, NO global window and NO full
    sort — and ALL requested quantiles refined in the SAME passes.

    Each pass: ONE aggregate computes fixed-width bucket histograms
    for every still-unresolved target's current range simultaneously
    (ranges are keyed into one combined groupBy key; the driver gets
    ≤ ranges·NB rows — orchestration, not a data path), the driver
    walks cumulative counts to locate each target's bucket, and ONE
    exact-count probe re-establishes every target's invariant.
    So RFM/decile callers with 3–15 targets pay ⌈log_NB(n)⌉ scan
    passes total, not per target (the r03 verdict's #7: previously
    the loop ran per quantile → 3–15× the passes). Ranges shrink
    ~NB× per pass, so ⌈log_NB(n)⌉ passes (2 at 10⁹ rows, NB=4096)
    reach ranges holding ≤ TAIL rows; the final step takes every
    target's (target − rows_before)-th smallest in ONE batched pass —
    a window partitioned BY RANGE ID over the union of the tiny
    ranges (≤ targets·TAIL shuffled rows; never a global or
    single-partition window). A target that hits the ulp freeze
    (its range stopped narrowing) is excluded from that window and
    resolved by a per-target TakeOrderedAndProject heap instead, so
    the bound holds even when the frozen range exceeds TAIL rows. Every range filter is a plain
    comparison on the raw column, so it pushes to the parquet scan
    and later passes read a shrinking fraction of the data. A skewed bucket (all rows one repeated value)
    collapses to lo == hi and resolves directly.

    Exactness under batching: two targets' ranges are either
    identical or touch only at one inclusive boundary value; the
    combined histogram key assigns a boundary row to the first
    matching range, which can only shift which bucket the walk
    *chooses* — the per-range exact probe (plain comparisons, no
    bucketing) still verifies ``below < target ≤ below + inside``
    before any range is narrowed, so results are bit-identical to
    the sequential form (equality tests vs DuckDB pin this).
    """
    import math

    NB, TAIL = nb, tail
    stats = df.agg(
        F.count(col).alias("n"), F.min(col).alias("lo"), F.max(col).alias("hi")
    ).first()
    n = int(stats["n"])
    if n == 0:  # no non-null rows: quantiles undefined, mirror SQL NULL
        return {q: float("nan") for q in qs}
    targets = {q: max(1, math.ceil(q * n)) for q in qs}
    # rank -> [lo, hi, rows_before, in_range]; duplicate ranks share
    state = {
        r: [float(stats["lo"]), float(stats["hi"]), 0, n]
        for r in set(targets.values())
    }

    def _needs_pass(r):
        lo, hi, _, in_range = state[r]
        return in_range > TAIL and lo < hi and (hi - lo) / NB > 0

    while True:
        active = [r for r in state if _needs_pass(r)]
        if not active:
            break
        # distinct ranges among active targets (targets that chose the
        # same bucket share lo/hi AND rows_before by construction)
        ranges = {}
        for r in active:
            ranges.setdefault((state[r][0], state[r][1]), []).append(r)
        rlist = list(ranges)
        key, filt = None, None
        for i, (lo, hi) in enumerate(rlist):
            width = (hi - lo) / NB
            cond = (F.col(col) >= lo) & (F.col(col) <= hi)
            filt = cond if filt is None else (filt | cond)
            bucket = F.lit(i * NB) + F.least(
                F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("int"),
                F.lit(NB - 1),
            )
            key = (
                F.when(cond, bucket)
                if key is None
                else key.when(cond, bucket)
            )
        hist = {
            row["k"]: row["count"]
            for row in df.filter(filt).groupBy(key.alias("k")).count().collect()
        }
        # per-target bucket walk on the shared histograms
        probes = []  # (rank, lo, hi, new_lo, new_hi)
        for i, (lo, hi) in enumerate(rlist):
            width = (hi - lo) / NB
            counts = [hist.get(i * NB + b, 0) for b in range(NB)]
            for r in ranges[(lo, hi)]:
                cum = state[r][2]
                chosen = NB - 1
                for b in range(NB):
                    if cum + counts[b] >= r:
                        chosen = b
                        break
                    cum += counts[b]
                new_lo = lo + chosen * width
                new_hi = hi if chosen == NB - 1 else new_lo + width
                probes.append((r, lo, hi, new_lo, new_hi))
        # ONE exact-count probe pass for every target: plain-comparison
        # counts (floor() bucketing can disagree with >=/<= range
        # predicates by an ulp at bucket edges); rows_before must be
        # |{v < lo}| under the same predicates the final step filters
        # with.
        agg_exprs = []
        for idx, (r, lo, hi, new_lo, new_hi) in enumerate(probes):
            rng = (F.col(col) >= lo) & (F.col(col) <= hi)
            agg_exprs.append(
                F.sum(
                    F.when(rng & (F.col(col) < new_lo), 1).otherwise(0)
                ).alias(f"below_{idx}")
            )
            agg_exprs.append(
                F.sum(
                    F.when(
                        (F.col(col) >= new_lo) & (F.col(col) <= new_hi), 1
                    ).otherwise(0)
                ).alias(f"inside_{idx}")
            )
        probe_row = df.filter(filt).agg(*agg_exprs).first()
        for idx, (r, lo, hi, new_lo, new_hi) in enumerate(probes):
            below = state[r][2] + int(probe_row[f"below_{idx}"] or 0)
            inside = int(probe_row[f"inside_{idx}"] or 0)
            if not (below < r <= below + inside):
                # ulp edge case: stop refining, resolve within the
                # current range (in_range=-1 marks it FROZEN: the
                # range may hold far more than TAIL rows, so the
                # final step must NOT window it — it gets a heap
                # extraction instead, preserving the ≤ targets·TAIL
                # shuffle bound of the batched path)
                state[r] = [lo, hi, state[r][2], -1]
                continue
            state[r] = [new_lo, new_hi, below, inside]
    # Batched final extraction: ONE pass takes every target's k-th
    # smallest inside its (≤ TAIL-row, pushed-down) range. Rows are
    # EXPLODED over every range they fall in (touching ranges share
    # their inclusive boundary value — a keyed first-match assignment
    # would undercount the second range), then a window partitioned by
    # range id ranks within each range — never a global sort; the
    # shuffled volume is ≤ targets·TAIL rows total.
    from pyspark.sql import Window as _W

    # Frozen (ulp-edge) targets resolve via TakeOrderedAndProject
    # heaps — their range was never narrowed to ≤ TAIL rows, so the
    # row_number window below would otherwise pull the whole range
    # into one partition. Freezes are rare by construction (a bucket
    # boundary disagreeing with the probe by an ulp), so one small
    # heap job per frozen target is cheap and keeps the batched
    # path's documented ≤ targets·TAIL shuffle bound intact.
    frozen_vals = {}
    for r, (lo, hi, rows_before, in_range) in state.items():
        if in_range != -1:
            continue
        k = max(r - rows_before, 1)
        row = (
            df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
            .select(F.col(col).alias("_qv"))
            .orderBy(F.asc("_qv"))
            .limit(int(k))
            .agg(F.max("_qv").alias("v"))
            .first()
        )
        frozen_vals[r] = float(row["v"]) if row["v"] is not None else hi

    jobs = {}  # (lo, hi) -> {rank: k}
    for r, (lo, hi, rows_before, in_range) in state.items():
        if in_range == -1:
            continue
        jobs.setdefault((lo, hi), {})[r] = max(r - rows_before, 1)
    range_rows = []
    want_rows = []
    for rid, ((lo, hi), ranks) in enumerate(jobs.items()):
        range_rows.append((rid, lo, hi))
        for r, k in ranks.items():
            want_rows.append((rid, k, r))
    if not range_rows:  # every target hit the ulp freeze path
        vals = dict(frozen_vals)
        return {q: vals[targets[q]] for q in qs}
    matches = F.filter(
        F.array(
            *[
                F.struct(
                    F.lit(rid).alias("rid"),
                    F.lit(lo).alias("lo"),
                    F.lit(hi).alias("hi"),
                )
                for rid, lo, hi in range_rows
            ]
        ),
        lambda s: (F.col("_qv") >= s["lo"]) & (F.col("_qv") <= s["hi"]),
    )
    filt2 = None
    for _, lo, hi in range_rows:
        cond = (F.col(col) >= lo) & (F.col(col) <= hi)
        filt2 = cond if filt2 is None else (filt2 | cond)
    w = _W.partitionBy("rid").orderBy(F.asc("_qv"))
    ranked = (
        df.filter(filt2)
        .select(F.col(col).alias("_qv"))
        .select("_qv", F.explode(matches).alias("m"))
        .select("_qv", F.col("m.rid").alias("rid"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("cnt", F.count("*").over(_W.partitionBy("rid")))
    )
    # per-range wanted positions as a LITERAL predicate (no broadcast
    # join — its fixed per-job overhead dominates when the ranges are
    # small); ties to the last row cover k > range size (a skewed
    # range that resolved early)
    by_rid = {}
    for rid, k, r in want_rows:
        by_rid.setdefault(rid, []).append(k)
    keep = None
    for rid, ks in by_rid.items():
        cond = (F.col("rid") == rid) & (
            F.col("rn").isin([int(k) for k in ks])
            | ((F.col("cnt") < max(ks)) & (F.col("rn") == F.col("cnt")))
        )
        keep = cond if keep is None else (keep | cond)
    hits = ranked.filter(keep).collect()
    by_pos = {(row["rid"], row["rn"]): (float(row["_qv"]), row["cnt"]) for row in hits}
    last = {}
    for (rid, rn), (v, cnt) in by_pos.items():
        if rn == cnt:
            last[rid] = v
    vals = dict(frozen_vals)
    for rid, k, r in want_rows:
        hit = by_pos.get((rid, k))
        vals[r] = hit[0] if hit is not None else last[rid]
    return {q: vals[targets[q]] for q in qs}


@register(
    "events_approx_distinct",
    oracle=f"""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_tol
    FROM events
    GROUP BY event_type
    """,
)
def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type,
    *property-checked*: the emitted ``approx_within_tol`` is the
    engine-side claim that the sketch landed within ±5% of the exact
    count, and the oracle states it as literally TRUE — if Spark's
    HLL ever drifts outside tolerance the hash mismatch turns the
    gate red. The exact count rides along so the row is anchored to
    real values, not just the boolean.

    Scale shape: this is THE distinct-count pattern at 100 TB — the
    exact two-phase distinct shuffles every (type, user) pair once;
    the HLL sketch shuffles only fixed-size registers (map-side
    partials merge associatively). Running both here is the
    correctness harness; production keeps the sketch.
    """
    apply_engine_conf(spark)
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
    )
    tol = F.lit(APPROX_REL_TOL)
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= tol * F.col("exact_users")
        ).alias("approx_within_tol"),
    )


@register(
    "order_value_approx_percentiles",
    oracle="""
    -- empty-scan semantics: the engine's exact_disc_quantiles mirrors
    -- an undefined quantile as NaN and the tolerance comparison
    -- three-values to NULL; quantile_disc alone would say NULL/TRUE
    SELECT
      CASE WHEN COUNT(o_totalprice) = 0 THEN 'NaN'::DOUBLE
           ELSE CAST(quantile_disc(o_totalprice, 0.50) AS DOUBLE) END
        AS p50_exact,
      CASE WHEN COUNT(o_totalprice) = 0 THEN 'NaN'::DOUBLE
           ELSE CAST(quantile_disc(o_totalprice, 0.95) AS DOUBLE) END
        AS p95_exact,
      CASE WHEN COUNT(o_totalprice) = 0 THEN NULL ELSE TRUE END
        AS approx_within_tol
    FROM orders
    """,
)
def order_value_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) vs the exact
    discrete quantiles, property-checked like the HLL query: the
    emitted boolean claims the sketch landed within ±5% of exact, the
    oracle pins it TRUE, and the exact values anchor the row.

    Scale shape: the GK sketch is a bounded-memory mergeable summary —
    the one-pass way to percentile 100 TB; ``accuracy=10000`` keeps
    rank error ≤ 0.01%. The exact anchor is computed by
    :func:`exact_disc_quantiles` (multi-pass histogram refinement —
    pushed-down range filters + bounded driver histograms), NOT by a
    global window: the earlier ``cume_dist`` formulation moved the
    whole table through one WindowExec partition, defeating the
    query's own point.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.expr("percentile_approx(o_totalprice, 0.50, 10000)").alias("_p50a"),
        F.expr("percentile_approx(o_totalprice, 0.95, 10000)").alias("_p95a"),
    )
    # exact DISC quantiles, fully distributed (histogram refinement +
    # TakeOrderedAndProject — see exact_disc_quantiles; no global
    # WindowExec anywhere in this query's plans)
    exact = exact_disc_quantiles(orders, "o_totalprice", (0.50, 0.95))
    tol = 0.05
    return agg.select(
        F.lit(exact[0.50]).alias("p50_exact"),
        F.lit(exact[0.95]).alias("p95_exact"),
        (
            (F.abs(F.col("_p50a") - F.lit(exact[0.50])) <= tol * exact[0.50])
            & (F.abs(F.col("_p95a") - F.lit(exact[0.95])) <= tol * exact[0.95])
        ).alias("approx_within_tol"),
    )


@register(
    "orders_merge_changeset",
    oracle="""
    WITH changes AS (
      SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
             round(o_totalprice * 2.0, 2) AS o_totalprice, 1 AS src
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N' AS o_orderstatus,
             round(o_totalprice, 2) AS o_totalprice, 1 AS src
      FROM orders WHERE o_orderkey % 1000 = 0
    ), unioned AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             round(o_totalprice, 2) AS o_totalprice, 0 AS src
      FROM orders
      UNION ALL SELECT * FROM changes
    ), ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY o_orderkey ORDER BY src DESC) AS rn
      FROM unioned
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(src AS BIGINT) AS from_changeset
    FROM ranked WHERE rn = 1
    """,
)
def orders_merge_changeset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a transactional table format:
    apply a changeset (updates + inserts) onto a snapshot as a
    union + per-key preference window — the SCD-1 upsert.

    The changeset here is derived deterministically from the snapshot
    (every 10th order updated, every 1000th re-inserted under a new
    key) so the oracle can restate it; in production it arrives from
    CDC. Scale shape: ONE hash shuffle on the merge key for the
    window (a full-outer-join formulation shuffles both sides the
    same way but then pays coalesce-per-column); updates and inserts
    flow through the identical path, and the snapshot is never read
    twice. The streaming twin is the replay-idempotent foreachBatch
    sink in ``streaming/events.py``.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.lit(0).alias("src"),
    )
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        F.round(F.col("o_totalprice") * 2.0, 2).alias("o_totalprice"),
        F.lit(1).alias("src"),
    )
    inserts = orders.filter(F.col("o_orderkey") % 1000 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.lit(1).alias("src"),
    )
    unioned = base.unionByName(updates).unionByName(inserts)
    w = W.partitionBy("o_orderkey").orderBy(F.desc("src"))
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.col("src").cast("bigint").alias("from_changeset"),
        )
    )


@register(
    "orders_status_scd2",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           o_orderstatus,
           CAST(o_orderdate AS VARCHAR) AS valid_from,
           CAST(lead(o_orderdate) OVER w AS VARCHAR) AS valid_to,
           CAST(row_number() OVER w AS BIGINT) AS version,
           (lead(o_orderdate) OVER w IS NULL) AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def orders_status_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 history build: each
    customer's order stream becomes versioned validity intervals
    ``[valid_from, valid_to)`` with an ``is_current`` flag on the
    open-ended latest row — the warehouse-dimension counterpart of
    :func:`orders_merge_changeset`'s SCD-1 overwrite.

    ONE shuffle on the dimension key (``o_custkey``) feeds both the
    ``lead`` interval close and the version numbering — the same
    window, so Catalyst computes them in a single Window node over a
    single sort. No global ordering anywhere; at 100 TB the key
    partitioning is the same hash exchange any per-entity history
    build pays, and AQE handles hot entities.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate").cast("string").alias("valid_from"),
        nxt.cast("string").alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
        nxt.isNull().alias("is_current"),
    )


JOIN_SALT = 8


@register(
    "events_salted_selfjoin",
    oracle="""
    SELECT p.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(p.value + s.value AS DECIMAL(25,6))) AS DOUBLE)
             AS sum_pair_value
    FROM events p
    JOIN events s ON p.user_id = s.user_id
    WHERE p.event_type = 'purchase' AND s.event_type = 'signup'
    GROUP BY p.user_id
    """,
)
def events_salted_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted big-big equi-join — the join-side counterpart of
    :func:`events_salted_agg`'s aggregation salting. Purchases join
    signups per user; on a skewed key a plain shuffle join lands each
    hot user's entire row volume on ONE reducer pair. The standard
    treatment, shown oracle-checked: the left side takes a
    deterministic salt (event_id mod JOIN_SALT) appended to its join
    key; the right side replicates each row to ALL JOIN_SALT salt
    values (an explode — JOIN_SALT× the *smaller* side's bytes, the
    price of spreading the hot key over JOIN_SALT reducers). Each
    (purchase, signup) pair meets exactly once because the purchase
    row keeps a single salt. AQE's skew splitting makes hand salting
    unnecessary for moderate skew; the explicit form is load-bearing
    when one key exceeds what a single split can absorb, and this
    query pins its exactly-once pairing algebra against the unsalted
    oracle join.

    The pair-value sum accumulates in decimal so the per-salt partial
    sums merge order-independently (bit-identical to the oracle's
    single-group sum).
    """
    apply_engine_conf(spark)
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("value").alias("p_value"),
        F.pmod(F.col("event_id"), F.lit(JOIN_SALT)).alias("_salt"),
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("value").alias("s_value"),
            F.explode(
                F.sequence(F.lit(0), F.lit(JOIN_SALT - 1))
            ).alias("_salt"),
        )
    )
    return (
        purchases.join(signups, ["user_id", "_salt"])
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(
                (F.col("p_value") + F.col("s_value")).cast("decimal(25,6)")
            )
            .cast("double")
            .alias("sum_pair_value"),
        )
    )


DECILE_QS = tuple(round(0.1 * i, 1) for i in range(1, 10))


@register(
    "order_value_decile_binning",
    oracle=f"""
    WITH cuts AS (
      SELECT quantile_disc(o_totalprice,
               [{', '.join(str(q) for q in DECILE_QS)}]) AS ts
      FROM orders
    ), binned AS (
      SELECT o_totalprice AS v,
             1 + len(list_filter(cuts.ts, t -> o_totalprice > t)) AS decile
      FROM orders CROSS JOIN cuts
    )
    SELECT decile,
           COUNT(*) AS n_orders,
           ROUND(MIN(v), 2) AS min_value,
           ROUND(MAX(v), 2) AS max_value,
           -- integer cents of the exact decimal sum (house recipe):
           -- ROUND(CAST(sum AS DOUBLE), 2) is the banned fragile class
           CAST(FLOOR(SUM(CAST(v AS DECIMAL(25,6))) * 100 + 0.5)
                AS BIGINT) AS sum_value_cents
    FROM binned
    GROUP BY decile
    """,
)
def order_value_decile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) discretization of order values — the
    feature-binning primitive — WITHOUT ``ntile``: Spark's ``ntile``
    is a global window (single-partition sort of the fact table, the
    exact shape `order_value_approx_percentiles` exists to avoid).
    Instead the nine cut points come from the distributed exact-
    quantile refinement (bounded driver histograms, filters pushed to
    the scan), are embedded as nine literals, and binning is a pure
    per-row CASE over the scan — one narrow pass plus a 10-group
    aggregate.

    Bin rule matches ``quantile_disc`` semantics on both sides:
    decile = 1 + count of cut points strictly below the value, so
    boundary rows (value == cut) land in the lower bin.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    cuts = exact_disc_quantiles(orders, "o_totalprice", DECILE_QS)
    ts = [cuts[q] for q in DECILE_QS]
    decile = F.lit(1)
    for t in ts:
        decile = decile + F.when(F.col("o_totalprice") > t, 1).otherwise(0)
    return (
        orders.select(
            F.col("o_totalprice").alias("v"), decile.alias("decile")
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("v"), 2).alias("min_value"),
            F.round(F.max("v"), 2).alias("max_value"),
            F.floor(
                F.sum(F.col("v").cast("decimal(25,6)")) * 100 + F.lit(0.5)
            )
            .cast("bigint")
            .alias("sum_value_cents"),
        )
    )


@register(
    "referential_integrity_audit",
    oracle="""
    SELECT fk, n_rows, n_orphans FROM (
      SELECT 'orders.o_custkey->customer' AS fk,
             (SELECT COUNT(*) FROM orders) AS n_rows,
             (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)) AS n_orphans
      UNION ALL
      SELECT 'lineitem.l_orderkey->orders',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
      UNION ALL
      SELECT 'lineitem.l_partkey->part',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey))
      UNION ALL
      SELECT 'customer.c_nationkey->nation',
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM nation n
                                WHERE n.n_nationkey = c.c_nationkey))
    )
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema foreign-key audit: for each declared FK edge, the
    row count and the number of ORPHAN rows (FK value with no parent)
    — the constraint check a lakehouse runs after every load, since
    parquet enforces nothing. A fact joined through an orphaned key
    silently drops rows in inner joins; this makes the blast radius a
    number.

    Plan: each edge is a LEFT ANTI join counted — Spark plans the
    parent side as a broadcast build (dimensions) or falls back to
    shuffled hash for fact→fact; counts are map-side-partial folds.
    The four audits are independent one-row aggregates unioned
    driver-side: at 100 TB each runs as its own bounded job over a
    pruned two-column scan.
    """
    apply_engine_conf(spark)

    def audit(fk: str, child: DataFrame, key_col: str, parent: DataFrame,
              parent_key: str) -> DataFrame:
        # one pass per edge: left join against the distinct parent
        # keys, then count rows and misses in the same fold (an
        # anti-join + separate count would scan the child twice)
        hits = (
            parent.select(F.col(parent_key).alias(key_col))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        return (
            child.join(hits, key_col, "left")
            .agg(
                F.count("*").alias("n_rows"),
                # COALESCE: an empty child has ZERO orphans (the
                # oracle's COUNT says 0; SUM over no rows says NULL)
                F.coalesce(
                    F.sum(
                        F.when(F.col("_hit").isNull(), 1).otherwise(0)
                    ),
                    F.lit(0),
                ).alias("n_orphans"),
            )
            .select(F.lit(fk).alias("fk"), "n_rows", "n_orphans")
        )

    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    customer = table(spark, sf_dir, "customer")
    part = table(spark, sf_dir, "part")
    nation = table(spark, sf_dir, "nation")
    audits = [
        audit("orders.o_custkey->customer", orders.select("o_custkey"),
              "o_custkey", customer, "c_custkey"),
        audit("lineitem.l_orderkey->orders", lineitem.select("l_orderkey"),
              "l_orderkey", orders, "o_orderkey"),
        audit("lineitem.l_partkey->part", lineitem.select("l_partkey"),
              "l_partkey", part, "p_partkey"),
        audit("customer.c_nationkey->nation", customer.select("c_nationkey"),
              "c_nationkey", nation, "n_nationkey"),
    ]
    out = audits[0]
    for a in audits[1:]:
        out = out.unionAll(a)
    return out


PROFILE_COLUMNS = (
    ("l_quantity", "double"),
    ("l_extendedprice", "double"),
    ("l_discount", "double"),
    ("l_shipdate", "timestamp"),
    ("l_returnflag", "string"),
)


@register(
    "lineitem_column_profile",
    oracle="""
    SELECT col, n_rows, n_nulls, n_distinct, min_value, max_value
    FROM (
      SELECT 'l_quantity' AS col, COUNT(*) AS n_rows,
             COUNT(*) - COUNT(l_quantity) AS n_nulls,
             COUNT(DISTINCT l_quantity) AS n_distinct,
             CAST(ROUND(MIN(l_quantity), 6) AS VARCHAR) AS min_value,
             CAST(ROUND(MAX(l_quantity), 6) AS VARCHAR) AS max_value
      FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', COUNT(*),
             COUNT(*) - COUNT(l_extendedprice),
             COUNT(DISTINCT l_extendedprice),
             CAST(ROUND(MIN(l_extendedprice), 6) AS VARCHAR),
             CAST(ROUND(MAX(l_extendedprice), 6) AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT 'l_discount', COUNT(*),
             COUNT(*) - COUNT(l_discount),
             COUNT(DISTINCT l_discount),
             CAST(ROUND(MIN(l_discount), 6) AS VARCHAR),
             CAST(ROUND(MAX(l_discount), 6) AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT 'l_shipdate', COUNT(*),
             COUNT(*) - COUNT(l_shipdate),
             COUNT(DISTINCT l_shipdate),
             strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S'),
             strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S')
      FROM lineitem
      UNION ALL
      SELECT 'l_returnflag', COUNT(*),
             COUNT(*) - COUNT(l_returnflag),
             COUNT(DISTINCT l_returnflag),
             MIN(l_returnflag), MAX(l_returnflag)
      FROM lineitem
    )
    """,
)
def lineitem_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the engine-side ``df.summary()``): per
    audited column one row of count / null count / exact distinct /
    min / max, values rendered to strings so numeric, timestamp and
    string columns share a schema — the post-load data-profile every
    warehouse surfaces next to a table.

    Plan: all five columns profile in ONE pass over the scan — the
    count-distinct aggregates expand to the standard two-phase
    partial-distinct plan, sharing the single lineitem read (Spark
    plans multi-distinct with an Expand, not five scans); min/max/count
    fold map-side. The per-column rows are a driver-side pivot of the
    one aggregate row. At 100 TB an approx_count_distinct swap makes
    the distinct term one pass with constant memory (documented swap;
    the exact form is the oracle-matchable statement).
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for name, kind in PROFILE_COLUMNS:
        c = F.col(name)
        aggs += [
            F.count("*").alias(f"{name}__rows"),
            (F.count("*") - F.count(c)).alias(f"{name}__nulls"),
            F.countDistinct(c).alias(f"{name}__distinct"),
        ]
        if kind == "double":
            aggs += [
                F.round(F.min(c), 6).cast("string").alias(f"{name}__min"),
                F.round(F.max(c), 6).cast("string").alias(f"{name}__max"),
            ]
        elif kind == "timestamp":
            aggs += [
                F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss").alias(
                    f"{name}__min"
                ),
                F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss").alias(
                    f"{name}__max"
                ),
            ]
        else:
            aggs += [
                F.min(c).alias(f"{name}__min"),
                F.max(c).alias(f"{name}__max"),
            ]
    wide = li.agg(*aggs)
    # pivot to long form with ONE explode over the single aggregate
    # row — a union of per-column selects would duplicate the
    # aggregate subtree (and the scan) once per column
    structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("col"),
                F.col(f"{name}__rows").alias("n_rows"),
                F.col(f"{name}__nulls").alias("n_nulls"),
                F.col(f"{name}__distinct").alias("n_distinct"),
                F.col(f"{name}__min").alias("min_value"),
                F.col(f"{name}__max").alias("max_value"),
            )
            for name, _ in PROFILE_COLUMNS
        ]
    )
    return wide.select(F.explode(structs).alias("p")).select("p.*")


@register(
    "lineitem_profile_approx_floor",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_extendedprice) AS anchor_exact_distinct,
           TRUE AS anchor_within_tol,
           TRUE AS approx_bounded_all_columns
    FROM lineitem
    """,
)
def lineitem_profile_approx_floor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB shape of :func:`lineitem_column_profile`, registered
    runnable (the exact profile's documented approx swap, made real):
    all five columns' distinct counts via HyperLogLog++ in ONE
    aggregate pass — HLL sketches fold map-side into fixed-size
    registers, so the plan has NO multi-distinct Expand (the exact
    profile's 6× row multiplication, its only data-proportional
    curve).

    Property-checked like :func:`events_approx_distinct`:
    ``anchor_within_tol`` claims the sketch landed within
    ±APPROX_REL_TOL of the exact distinct on the highest-cardinality
    column (l_extendedprice — a SEPARATE single-column two-phase
    distinct pass, far cheaper than the 5-column Expand and kept out
    of the HLL aggregate so the sketches stay on the hash-aggregate
    fast path, is the harness anchor);
    ``approx_bounded_all_columns`` claims every column's sketch is
    sane (positive, ≤ its non-null count — HLL can overshoot slightly
    but never past tolerance on a count it also bounds). The oracle
    pins both TRUE with independently computed exact values.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    # The exact anchor runs as its OWN single-column aggregate: mixing
    # one count_distinct into the HLL aggregate forces the planner
    # through the distinct Expand + sort-aggregate path for EVERY
    # sketch update (measured 14.1s vs 1.05s HLL-only + 0.54s anchor
    # at sf0.1). Two pruned passes, each reading only its columns,
    # joined at one row each.
    aggs = [F.count("*").alias("n_rows")]
    for name, _ in PROFILE_COLUMNS:
        c = F.col(name)
        aggs += [
            F.approx_count_distinct(c, rsd=0.02).alias(f"{name}__approx"),
            F.count(c).alias(f"{name}__nonnull"),
        ]
    anchor = li.agg(
        F.count_distinct(F.col("l_extendedprice")).alias(
            "anchor_exact_distinct"
        )
    )
    wide = li.agg(*aggs).crossJoin(F.broadcast(anchor))
    tol = F.lit(APPROX_REL_TOL)
    anchor_ok = (
        F.abs(
            F.col("l_extendedprice__approx")
            - F.col("anchor_exact_distinct")
        )
        <= tol * F.col("anchor_exact_distinct")
    )
    bounded = F.lit(True)
    for name, _ in PROFILE_COLUMNS:
        bounded = bounded & (
            (F.col(f"{name}__approx") > 0)
            & (
                F.col(f"{name}__approx").cast("double")
                <= F.col(f"{name}__nonnull") * (1.0 + APPROX_REL_TOL)
            )
        )
    return wide.select(
        "n_rows",
        "anchor_exact_distinct",
        anchor_ok.alias("anchor_within_tol"),
        # vacuously TRUE over zero rows (approx > 0 would read an
        # empty sketch as a bound violation; the oracle says TRUE)
        F.when(F.col("n_rows") == 0, F.lit(True))
        .otherwise(bounded)
        .alias("approx_bounded_all_columns"),
    )


def column_profile_approx_frame(li: DataFrame) -> DataFrame:
    """The PRODUCTION 100 TB column profile: per-column rows of
    count / null count / HLL++ approximate distinct / min / max —
    identical output shape to :func:`lineitem_column_profile` with
    ``n_distinct`` replaced by ``ndv_approx``. ONE aggregate pass, no
    multi-distinct Expand anywhere in the plan (plan-asserted in
    pytest): the sketches fold map-side into fixed-size registers, so
    the profile's cost is one scan + one 1-row reduce regardless of
    column count or cardinality — the exact profile's ×|columns|
    Expand (its only data-proportional curve, SCALING 0.57→6.45s over
    100×) never happens.
    """
    aggs = []
    for name, kind in PROFILE_COLUMNS:
        c = F.col(name)
        aggs += [
            F.count("*").alias(f"{name}__rows"),
            (F.count("*") - F.count(c)).alias(f"{name}__nulls"),
            F.approx_count_distinct(c, rsd=0.02).alias(f"{name}__ndv"),
        ]
        if kind == "double":
            aggs += [
                F.round(F.min(c), 6).cast("string").alias(f"{name}__min"),
                F.round(F.max(c), 6).cast("string").alias(f"{name}__max"),
            ]
        elif kind == "timestamp":
            aggs += [
                F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss").alias(
                    f"{name}__min"
                ),
                F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss").alias(
                    f"{name}__max"
                ),
            ]
        else:
            aggs += [
                F.min(c).alias(f"{name}__min"),
                F.max(c).alias(f"{name}__max"),
            ]
    wide = li.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("col"),
                F.col(f"{name}__rows").alias("n_rows"),
                F.col(f"{name}__nulls").alias("n_nulls"),
                F.col(f"{name}__ndv").cast("long").alias("ndv_approx"),
                F.col(f"{name}__min").alias("min_value"),
                F.col(f"{name}__max").alias("max_value"),
            )
            for name, _ in PROFILE_COLUMNS
        ]
    )
    return wide.select(F.explode(structs).alias("p")).select("p.*")


@register(
    "lineitem_column_profile_approx",
    oracle="""
    SELECT col, n_rows, n_nulls, min_value, max_value,
           TRUE AS ndv_within_tol
    FROM (
      SELECT 'l_quantity' AS col, COUNT(*) AS n_rows,
             COUNT(*) - COUNT(l_quantity) AS n_nulls,
             CAST(ROUND(MIN(l_quantity), 6) AS VARCHAR) AS min_value,
             CAST(ROUND(MAX(l_quantity), 6) AS VARCHAR) AS max_value
      FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', COUNT(*),
             COUNT(*) - COUNT(l_extendedprice),
             CAST(ROUND(MIN(l_extendedprice), 6) AS VARCHAR),
             CAST(ROUND(MAX(l_extendedprice), 6) AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT 'l_discount', COUNT(*),
             COUNT(*) - COUNT(l_discount),
             CAST(ROUND(MIN(l_discount), 6) AS VARCHAR),
             CAST(ROUND(MAX(l_discount), 6) AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT 'l_shipdate', COUNT(*),
             COUNT(*) - COUNT(l_shipdate),
             strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S'),
             strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S')
      FROM lineitem
      UNION ALL
      SELECT 'l_returnflag', COUNT(*),
             COUNT(*) - COUNT(l_returnflag),
             MIN(l_returnflag), MAX(l_returnflag)
      FROM lineitem
    )
    """,
)
def lineitem_column_profile_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The registered, tolerance-checked form of the approx profile
    (r7 verdict Next-round #3: the documented approx-at-scale swap
    implemented as a real row, not a docstring): the drop-in
    :func:`column_profile_approx_frame` output with its per-column
    HLL estimate verified against the exact NDV — ``ndv_within_tol``
    claims every column's sketch landed within ±APPROX_REL_TOL of
    exact, and the oracle pins it TRUE with DuckDB's independently
    computed exact counts.

    The exact anchor (the 5-column multi-distinct Expand — the cost
    the approx path exists to avoid) runs here ONLY as the
    verification harness, as its own aggregate pass so the HLL
    aggregate keeps its Expand-free hash-aggregate plan (the
    floor-row discipline: mixing one count_distinct into a sketch
    aggregate forces everything through the Expand). A production
    profile at 100 TB is `column_profile_approx_frame` alone —
    count/nulls/min/max are exact there too; only NDV is estimated.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    approx = column_profile_approx_frame(li)
    exact = li.agg(
        *[
            F.countDistinct(F.col(name)).alias(f"{name}__exact")
            for name, _ in PROFILE_COLUMNS
        ]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("col"),
                        F.col(f"{name}__exact").alias("ndv_exact"),
                    )
                    for name, _ in PROFILE_COLUMNS
                ]
            )
        ).alias("e")
    ).select("e.*")
    tol = F.lit(APPROX_REL_TOL)
    return approx.join(F.broadcast(exact), "col").select(
        "col",
        "n_rows",
        "n_nulls",
        "min_value",
        "max_value",
        (
            F.abs(F.col("ndv_approx") - F.col("ndv_exact"))
            <= tol * F.col("ndv_exact")
        ).alias("ndv_within_tol"),
    )


RFM_QS = (0.2, 0.4, 0.6, 0.8)
RFM_REF_DATE = "1998-12-31"


@register(
    "customer_rfm_segments",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                            DATE '{RFM_REF_DATE}') AS DOUBLE) AS recency,
             CAST(COUNT(*) AS DOUBLE) AS frequency,
             CAST(SUM(o_totalprice) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey
    ), cuts AS (
      SELECT quantile_disc(recency,   [{', '.join(map(str, RFM_QS))}]) AS r_cuts,
             quantile_disc(frequency, [{', '.join(map(str, RFM_QS))}]) AS f_cuts,
             quantile_disc(monetary,  [{', '.join(map(str, RFM_QS))}]) AS m_cuts
      FROM per_cust
    ), scored AS (
      SELECT 1 + len(list_filter(c.r_cuts, t -> p.recency   > t)) AS r_bin,
             1 + len(list_filter(c.f_cuts, t -> p.frequency > t)) AS f_bin,
             1 + len(list_filter(c.m_cuts, t -> p.monetary  > t)) AS m_bin,
             p.monetary
      FROM per_cust p CROSS JOIN cuts c
    )
    SELECT r_bin, f_bin, m_bin,
           COUNT(*) AS n_customers,
           -- integer cents of the exact decimal sum (house recipe):
           -- ROUND(CAST(sum AS DOUBLE), 2) is the banned fragile class
           CAST(FLOOR(SUM(CAST(monetary AS DECIMAL(25,6))) * 100 + 0.5)
                AS BIGINT) AS total_monetary_cents
    FROM scored
    GROUP BY r_bin, f_bin, m_bin
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic warehouse customer-value cube:
    per customer recency (days from last order to a fixed reference
    date), frequency (order count) and monetary (total spend), each
    binned into population quintiles, then the ≤125-cell segment
    census. ``r_bin`` counts cut points strictly below the RAW
    recency, so bin 1 holds the most-recent customers (analysts may
    invert; the cube carries the raw axis).

    Scale shape: one aggregate folds orders to the per-customer frame
    (the only corpus shuffle); the fifteen quintile cut points come
    from the distributed exact-quantile refinement over that frame —
    bounded driver histograms, NO ntile/global window — and return as
    literals; binning is a narrow CASE; the final census groups ≤125
    cells. Tied cut values (frequency is small-integer) produce the
    identical duplicate-cut binning in both engines because the rule
    is the same arithmetic, not engine ntile.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_REF_DATE).cast("date"),
            F.max("o_orderdate").cast("date"),
        )
        .cast("double")
        .alias("recency"),
        F.count("*").cast("double").alias("frequency"),
        F.sum("o_totalprice").cast("double").alias("monetary"),
    )
    per_cust = per_cust.localCheckpoint()  # 3 quantile runs + the scan
    bins = {}
    for metric in ("recency", "frequency", "monetary"):
        cuts = exact_disc_quantiles(per_cust, metric, RFM_QS)
        expr = F.lit(1)
        for q in RFM_QS:
            expr = expr + F.when(F.col(metric) > cuts[q], 1).otherwise(0)
        bins[metric] = expr
    return (
        per_cust.select(
            bins["recency"].alias("r_bin"),
            bins["frequency"].alias("f_bin"),
            bins["monetary"].alias("m_bin"),
            "monetary",
        )
        .groupBy("r_bin", "f_bin", "m_bin")
        .agg(
            F.count("*").alias("n_customers"),
            F.floor(
                F.sum(F.col("monetary").cast("decimal(25,6)")) * 100
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("total_monetary_cents"),
        )
    )


@register(
    "orders_backlog_by_month",
    oracle="""
    WITH per_order AS (
      SELECT o.o_orderkey,
             strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS open_month,
             strftime(MAX(CAST(l.l_shipdate AS DATE)), '%Y-%m') AS close_month
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ), deltas AS (
      SELECT open_month AS month, 1 AS opened, 0 AS closed FROM per_order
      UNION ALL
      SELECT close_month, 0, 1 FROM per_order
    ), monthly AS (
      SELECT month, SUM(opened) AS n_opened, SUM(closed) AS n_closed
      FROM deltas GROUP BY month
    )
    SELECT month,
           CAST(n_opened AS BIGINT) AS n_opened,
           CAST(n_closed AS BIGINT) AS n_closed,
           CAST(SUM(n_opened) OVER w - SUM(n_closed) OVER w AS BIGINT)
             AS backlog_end
    FROM monthly
    WINDOW w AS (ORDER BY month ROWS UNBOUNDED PRECEDING)
    """,
)
def orders_backlog_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time — interval counting ("how many
    orders were open during month m") restated scale-first as
    DELTA-ENCODING + PREFIX SUM: each order contributes +1 at its
    open month and −1 at its close month (last lineitem shipdate);
    backlog at end of m = cumulative opens − cumulative closes. The
    naive form — join every order against every month it overlaps —
    replicates the fact table by average interval length; the delta
    form moves each order exactly twice, and the running sum touches
    only the ~85-row month table.

    Plan: orders⋈lineitem shuffles on orderkey once, and the
    per-order close aggregate REUSES that partitioning (group key ==
    join key, no second fact shuffle); the month aggregate is tiny;
    the cumulative window runs over months only ('yyyy-MM' sorts
    chronologically). Orders with no lineitems drop in the inner
    join, identically in both engines.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    per_order = (
        orders.select("o_orderkey", "o_orderdate")
        .join(li.select("l_orderkey", "l_shipdate"),
              orders.o_orderkey == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("close_ts"))
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("open_month"),
            F.date_format("close_ts", "yyyy-MM").alias("close_month"),
        )
    )
    deltas = per_order.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("open_month").alias("month"),
                    F.lit(1).alias("opened"),
                    F.lit(0).alias("closed"),
                ),
                F.struct(
                    F.col("close_month").alias("month"),
                    F.lit(0).alias("opened"),
                    F.lit(1).alias("closed"),
                ),
            )
        ).alias("d")
    ).select("d.*")
    monthly = deltas.groupBy("month").agg(
        F.sum("opened").alias("n_opened"),
        F.sum("closed").alias("n_closed"),
    )
    w = (
        W.partitionBy(F.pmod(F.length("month"), F.lit(1)))
        .orderBy("month")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return monthly.select(
        "month",
        F.col("n_opened").cast("bigint").alias("n_opened"),
        F.col("n_closed").cast("bigint").alias("n_closed"),
        (F.sum("n_opened").over(w) - F.sum("n_closed").over(w))
        .cast("bigint")
        .alias("backlog_end"),
    )


@register(
    "orders_incremental_agg_merge",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS revenue
    FROM orders GROUP BY 1
    """,
)
def orders_incremental_agg_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: the monthly
    revenue rollup is computed as BASE-state partials merged with a
    DELTA batch's partials — never re-reading the base fact rows —
    and the oracle recomputes from scratch, proving merge ≡ recompute.

    This is the algebra every streaming/batch materialized view
    relies on: keep (count, decimal-sum) partial state per group; a new
    batch folds to the same shape; the merge is a union + one
    re-aggregation over GROUP-sized (not fact-sized) frames. The
    deterministic base/delta split (o_orderkey % 10) stands in for
    yesterday's snapshot + today's arrivals. Decimal sums make the
    partial state re-aggregatable without float drift — the same
    reason the engine's sketches (HLL, GK, CMS) were chosen
    map-side-mergeable.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month")
        ).agg(
            F.count("*").alias("_n"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("_s"),
        )

    base = partials(orders.filter(F.col("o_orderkey") % 10 != 0))
    delta = partials(orders.filter(F.col("o_orderkey") % 10 == 0))
    return (
        base.unionByName(delta)
        .groupBy("month")
        .agg(
            F.sum("_n").alias("n_orders"),
            F.sum("_s").cast("double").alias("revenue"),
        )
    )


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             date_trunc('month', MIN(o_orderdate)) AS cohort_month
      FROM orders GROUP BY o_custkey
    ), aged AS (
      SELECT f.cohort_month,
             (date_part('year', o.o_orderdate)
              - date_part('year', f.cohort_month)) * 12
             + (date_part('month', o.o_orderdate)
                - date_part('month', f.cohort_month)) AS age_months,
             CAST(o.o_totalprice AS DECIMAL(25,6)) AS rev
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    ), cells AS (
      SELECT cohort_month, CAST(age_months AS INT) AS age_months,
             COUNT(*) AS n_orders,
             SUM(rev) AS rev
      FROM aged GROUP BY 1, 2
    )
    SELECT CAST(cohort_month AS VARCHAR) AS cohort_month, age_months,
           n_orders,
           -- integer cents, not ROUND(double): the running decimal
           -- sum is exact and o_totalprice has 2 decimals, so ×100
           -- is integer-valued — no float ever enters the output
           CAST(FLOOR(SUM(rev) OVER (
             PARTITION BY cohort_month ORDER BY age_months
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) * 100 + 0.5) AS BIGINT) AS cum_revenue_cents
    FROM cells
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: customers grouped by first-order month,
    cumulative revenue by months-since-first-order — the lifetime
    value curve a growth team reads cohort health from (the revenue
    sibling of the retention matrix).

    Plan: per-customer first order is ONE aggregate; the age join
    re-keys on custkey (AQE broadcasts the cohort side when customers
    fit, shuffle-joins otherwise); the cohort × age rollup is the
    only corpus-keyed shuffle; the cumulative window runs over the
    cohort × age CELL table (months², never row-scale) partitioned by
    cohort — no global window. Decimal sums keep the running revenue
    exact, and the output is integer CENTS (sum·100 is exactly
    integer-valued since o_totalprice has 2 decimals) — the fragile
    ROUND(double,2) class is banned from registered outputs; the
    cast to VARCHAR pins month rendering across engines.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate"))
        .cast("date")
        .alias("cohort_month")
    )
    aged = orders.join(firsts, "o_custkey").select(
        "cohort_month",
        (
            (F.year("o_orderdate") - F.year("cohort_month")) * 12
            + (F.month("o_orderdate") - F.month("cohort_month"))
        )
        .cast("int")
        .alias("age_months"),
        F.col("o_totalprice").cast("decimal(25,6)").alias("rev"),
    )
    cells = aged.groupBy("cohort_month", "age_months").agg(
        F.count("*").alias("n_orders"), F.sum("rev").alias("rev")
    )
    w = (
        W.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return cells.select(
        F.col("cohort_month").cast("string").alias("cohort_month"),
        "age_months",
        "n_orders",
        F.floor(F.sum("rev").over(w) * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cum_revenue_cents"),
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE
      (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 21)
      OR
      (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 40)
      OR
      (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity >= 20 AND l.l_quantity <= 50)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-style disjunctive-predicate revenue (adapted to the
    synthetic part schema: brand × size-range × quantity-range
    OR-of-ANDs). The query class that separates optimizers: the
    disjunction spans BOTH join sides, so the win is extracting the
    single-side residuals — brand/size conditions prune the part
    build side and the quantity envelope prunes the lineitem scan —
    before the join, leaving the full OR as a post-join filter.
    Spark's optimizer does exactly this (CNF conversion pushes
    ``p_brand IN (…)``/``p_size`` to the part scan and the quantity
    bounds to lineitem); the small filtered part side broadcasts, so
    at 100 TB the fact table never shuffles for the join.

    Revenue sums in decimal per the q1 contract.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part), part.p_partkey == li.l_partkey
    )
    arm = lambda b, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(s_lo, s_hi)
        & (F.col("l_quantity") >= q_lo)
        & (F.col("l_quantity") <= q_hi)
    )
    cond = (
        arm("Brand#1", 1, 15, 1, 21)
        | arm("Brand#2", 10, 30, 10, 40)
        | arm("Brand#3", 20, 50, 20, 50)
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(cond).agg(
        F.sum(disc_price.cast("decimal(25,6)"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "lineitem_scd2_point_in_time",
    oracle="""
    WITH dim AS (
      SELECT o_custkey, o_orderstatus,
             o_orderdate AS valid_from,
             lead(o_orderdate) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS valid_to
      FROM orders
    ), fact AS (
      SELECT l.l_shipdate, l.l_extendedprice, l.l_discount, o.o_custkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT d.o_orderstatus AS status_at_ship,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(f.l_extendedprice * (1 - f.l_discount)
                         AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM fact f JOIN dim d
      ON d.o_custkey = f.o_custkey
     AND f.l_shipdate >= d.valid_from
     AND (d.valid_to IS NULL OR f.l_shipdate < d.valid_to)
    GROUP BY d.o_orderstatus
    """,
)
def lineitem_scd2_point_in_time(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Point-in-time (PIT) dimension join — the query SCD2 histories
    exist to answer: each shipped lineitem joined to the customer-
    status VERSION that was valid at its ship date (not the current
    one — "as-was" reporting), rolled up to revenue per
    status-at-ship. The dimension is the same windowed interval build
    as :func:`orders_status_scd2`.

    Plan shape at 100 TB: the interval predicate rides on an EQUI
    join key (the dimension's natural key, o_custkey), so Spark plans
    a plain hash join with the BETWEEN as a residual filter — per-key
    interval counts are small (a customer's version history), so the
    residual scan per probe row is bounded; no non-equi explosion, no
    nested loop (the trap a bare interval join falls into, cf. the
    binned range join for the keyless case). One extra shuffle
    attaches custkey to lineitem via the orderkey join first.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dim = orders.select(
        "o_custkey",
        "o_orderstatus",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    fact = li.select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    ).join(
        orders.select("o_orderkey", "o_custkey"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    joined = fact.join(
        dim,
        (fact.o_custkey == dim.o_custkey)
        & (F.col("l_shipdate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("l_shipdate") < F.col("valid_to"))),
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy(
        F.col("o_orderstatus").alias("status_at_ship")
    ).agg(
        F.count("*").alias("n_lines"),
        F.sum(disc_price.cast("decimal(25,6)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "orders_rolling_7d_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             COUNT(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day,
           n_orders,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST(SUM(revenue) OVER (
             ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS revenue_7d
    FROM daily
    """,
)
def orders_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day revenue per day — the rolling dashboard metric.

    The frame is a time-RANGE window (calendar-aware: gaps in the
    day spine shorten the trailing sum correctly, unlike a ROWS
    frame), computed over the DAILY AGGREGATE — the corpus pays one
    (day)-keyed aggregate with map-side partials, and the
    single-partition ordered window runs over calendar-sized rows
    (~365/year at ANY corpus scale), the same boundedness argument as
    the dense month spine. Running a global window over raw orders
    instead would single-thread the corpus — the anti-pattern this
    restatement exists to avoid. Decimal accumulation end to end;
    doubles only at the output boundary (the q1 contract).
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("revenue"),
    )
    w = (
        W.orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "n_orders",
        F.col("revenue").cast("double").alias("revenue"),
        F.sum("revenue").over(w).cast("double").alias("revenue_7d"),
    )


@register(
    "part_supplier_concentration_hhi",
    oracle="""
    WITH per AS (
      SELECT l_partkey, l_suppkey, COUNT(*) AS c
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), agg AS (
      SELECT l_partkey,
             SUM(c) AS n_lines,
             COUNT(*) AS n_suppliers,
             SUM(CAST(c AS DECIMAL(38,0)) * c) AS sum_c2
      FROM per GROUP BY l_partkey
    )
    SELECT l_partkey,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_suppliers AS BIGINT) AS n_suppliers,
           CAST((CAST(sum_c2 AS HUGEINT) * 1000000)
                // (CAST(n_lines AS HUGEINT) * n_lines)
                AS BIGINT) AS hhi_q6
    FROM agg
    """,
)
def part_supplier_concentration_hhi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supply-concentration audit: per part, the Herfindahl–Hirschman
    index of its supplier line-share distribution — ``Σᵢ pᵢ²``, the
    standard concentration metric (1e6 = single-supplier part, a
    sourcing risk; → 1/k for k balanced suppliers). The Gini-impurity
    complement of `events_user_type_gini`, and the same EXACT-integer
    recipe: ``hhi_q6 = (Σc²·1e6) div n²`` with HUGEINT-widened
    products — never a float share, and integer-typed ``div``
    operands on both engines (DuckDB's DECIMAL ``//`` round-then-
    floors; see the gini docstring).

    Plan: one (part, supplier) aggregate with map-side partials, one
    per-part rollup on the part-prefixed key — the two-level rollup
    every concentration/diversity metric compiles to.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey", "l_suppkey").agg(F.count("*").alias("c"))
    agg = per.groupBy("l_partkey").agg(
        F.sum("c").alias("n_lines"),
        F.count("*").alias("n_suppliers"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("sum_c2"),
    )
    return agg.select(
        "l_partkey",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_suppliers").cast("long").alias("n_suppliers"),
        F.expr(
            "CAST((sum_c2 * 1000000) div "
            "(CAST(n_lines AS DECIMAL(38,0)) * n_lines) AS BIGINT)"
        ).alias("hhi_q6"),
    )


@register(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shape: priority census of orders with at least one
    LATE line (shipped >60 days after order), over one order-date
    half-year — the EXISTS/semi-join pattern (main.py has no joins;
    extension surface).

    Plan: the date window pushes to the orders scan; the EXISTS
    compiles to a LEFT SEMI join on orderkey with the late-line
    inequality as a residual — lineitem is never aggregated and each
    order emits at most once from the semi probe regardless of how
    many late lines it has (the semantics COUNT(*) over a join would
    get wrong). Aggregation is a ≤5-group map-side-partial fold.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (
                li.l_shipdate
                > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q10_returned_items_topk",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(FLOOR(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(25,6))) * 100 + 0.5) AS BIGINT)
             AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_cents DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shape: top-20 customers by revenue lost to returned
    items — join fact to two broadcastable dimensions, aggregate per
    customer, deterministic top-k.

    Plan: the returnflag filter pushes to the lineitem scan (reads
    the 'R' third of the fact); customer and nation broadcast;
    lineitem⋈orders shuffles on orderkey, then ONE customer-keyed
    aggregate; top-20 via TakeOrderedAndProject (per-partition heaps,
    never a global sort). Revenue is the exact-integer cents recipe.
    """
    apply_engine_conf(spark)
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.floor(
                F.sum(rev.cast("decimal(25,6)")) * 100 + F.lit(0.5)
            )
            .cast("bigint")
            .alias("revenue_cents")
        )
        .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND NOT EXISTS (
        SELECT 1 FROM supplier s
        WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shape: how many distinct (non-blacklisted) suppliers
    stock each part profile — grouped COUNT DISTINCT after an
    anti-join exclusion (negative-balance suppliers stand in for
    Q16's complaint list; the testdata has no comment column).

    Plan: the brand filter pushes to the broadcast part dimension;
    the blacklist is an anti join against a broadcast supplier
    subset; COUNT(DISTINCT suppkey) takes the standard two-phase
    plan (partial distinct on (group, suppkey), then the count) —
    no Expand, no row explosion beyond the distinct pairs.
    """
    apply_engine_conf(spark)
    part = table(spark, sf_dir, "part").filter(
        F.col("p_brand") != "Brand#1"
    )
    bad = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT
      CAST(FLOOR(SUM(CAST(l_extendedprice * l_discount
                         AS DECIMAL(25,6))) * 100 + 0.5) AS BIGINT)
        AS revenue_cents,
      COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 10
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shape: the pure scan-filter-aggregate — no join, no
    shuffle beyond the one-row fold. The benchmark's pushdown
    showcase: ALL four predicates (date window, discount band,
    quantity cap) must reach the parquet scan, and the read schema
    must prune to the three referenced columns — at 100 TB this query
    IS its scan, so plan hygiene is the whole game.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    f = (
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 10)
    )
    return li.filter(f).agg(
        F.floor(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(25,6)"
                )
            )
            * 100
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("revenue_cents"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    WITH j AS (
      SELECT CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(25,6)) AS rev,
             p.p_type LIKE 'PROMO%' AS is_promo
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
        AND l.l_shipdate < TIMESTAMP '1997-10-01'
    )
    SELECT
      CAST(FLOOR(SUM(CASE WHEN is_promo THEN rev ELSE 0 END) * 100 + 0.5)
           AS BIGINT) AS promo_revenue_cents,
      CAST(FLOOR(SUM(rev) * 100 + 0.5) AS BIGINT) AS total_revenue_cents,
      -- all-integer share: cents already exact, so the ratio is a
      -- HUGEINT division of two exact integers
      CAST((CAST(FLOOR(SUM(CASE WHEN is_promo THEN rev ELSE 0 END)
                       * 100 + 0.5) AS HUGEINT) * 1000000)
           // CAST(FLOOR(SUM(rev) * 100 + 0.5) AS HUGEINT)
           AS BIGINT) AS promo_share_q6
    FROM j
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shape: share of one month's revenue from PROMO
    parts — the conditional-aggregate-over-join pattern (a CASE
    inside SUM, not two passes).

    Plan: the one-month window pushes to the lineitem scan; part is
    a broadcast dimension carrying only (partkey, is_promo); ONE
    aggregate computes both sums map-side-partial. Share is the
    exact-integer cents ratio (house recipe).
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").alias("is_promo")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(25,6)"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        rev.alias("rev"), "is_promo"
    )
    promo_cents = F.floor(
        F.sum(F.when(F.col("is_promo"), F.col("rev")).otherwise(0)) * 100
        + F.lit(0.5)
    ).cast("bigint")
    total_cents = F.floor(F.sum("rev") * 100 + F.lit(0.5)).cast("bigint")
    return j.agg(
        promo_cents.alias("promo_revenue_cents"),
        total_cents.alias("total_revenue_cents"),
    ).select(
        "promo_revenue_cents",
        "total_revenue_cents",
        F.expr(
            "CAST(CAST(promo_revenue_cents AS DECIMAL(38,0)) * 1000000"
            " div total_revenue_cents AS BIGINT)"
        ).alias("promo_share_q6"),
    )


@register(
    "supplier_balance_rank_in_nation",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           RANK() OVER (PARTITION BY s_nationkey
                        ORDER BY s_acctbal DESC, s_suppkey) AS bal_rank,
           COUNT(*) OVER (PARTITION BY s_nationkey) AS n_in_nation,
           -- integer percent-rank (house recipe): (rank-1)*1e6 div
           -- (n-1); single-supplier nations pin to 0
           CASE WHEN COUNT(*) OVER (PARTITION BY s_nationkey) = 1 THEN 0
                ELSE ((RANK() OVER (PARTITION BY s_nationkey
                                    ORDER BY s_acctbal DESC, s_suppkey)
                       - 1) * 1000000)
                     // (COUNT(*) OVER (PARTITION BY s_nationkey) - 1)
           END AS pct_rank_q6
    FROM supplier
    """,
)
def supplier_balance_rank_in_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-nation supplier balance ranking with an integer
    percent-rank — the grouped ranking feature (who are the top
    suppliers WITHIN each market) plus the normalized position a
    model consumes, without the float percent_rank() output class.

    Plan: ONE hash-partitioned window on the (bounded-cardinality)
    nation key over the supplier dimension; both window functions
    share the same sort, so Spark plans a single exchange + sort.
    """
    apply_engine_conf(spark)
    sup = table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    wn = W.partitionBy("s_nationkey")
    return sup.select(
        "s_suppkey",
        "s_nationkey",
        F.rank().over(w).alias("bal_rank"),
        F.count("*").over(wn).alias("n_in_nation"),
        F.expr(
            "CASE WHEN COUNT(*) OVER (PARTITION BY s_nationkey) = 1"
            " THEN 0 ELSE"
            " (RANK() OVER (PARTITION BY s_nationkey"
            "               ORDER BY s_acctbal DESC, s_suppkey) - 1)"
            " * 1000000"
            " div (COUNT(*) OVER (PARTITION BY s_nationkey) - 1)"
            " END"
        ).alias("pct_rank_q6"),
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H-Q13-shape: the customer order-count histogram — a LEFT
    OUTER join with a join-side residual predicate (excluded order
    class stays a JOIN condition, not a WHERE, so zero-order
    customers survive with count 0) folded twice: per-customer count,
    then the distribution over counts.

    Plan: orders⋈customer shuffles on custkey (AQE broadcasts the
    dimension side when it fits); COUNT(o_orderkey) over the outer
    join counts only matched rows (NULL-skipping, the Q13 trick);
    the second aggregate runs over |distinct counts| rows. No window
    anywhere — both folds are hash aggregates with map-side partials.
    """
    apply_engine_conf(spark)
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


@register(
    "orders_fulfillment_latency_by_priority",
    oracle="""
    WITH per_order AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             datediff('day', CAST(o.o_orderdate AS DATE),
                      MIN(CAST(l.l_shipdate AS DATE))) AS days_to_ship
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(quantile_disc(days_to_ship, 0.5) AS BIGINT) AS p50_days,
           CAST(quantile_disc(days_to_ship, 0.9) AS BIGINT) AS p90_days,
           CAST(MAX(days_to_ship) AS BIGINT) AS max_days
    FROM per_order
    GROUP BY o_orderpriority
    """,
)
def orders_fulfillment_latency_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Days from order to FIRST shipment, p50/p90 per order priority
    — the SLA dashboard (does '1-URGENT' actually ship faster?).
    Second user of the grouped VALUE-HISTOGRAM quantile pattern
    (`events_hourly_quantiles_by_type`): latency days are small
    integers, so exact grouped quantiles need no per-group sort of
    orders — fold to a (priority, days) frequency table and
    cumulative-window the bounded distinct-value domain.

    Plan: one orderkey-keyed join+aggregate folds lineitem to first
    ship date per order (the only corpus shuffle); the histogram and
    its window run over ≤ priorities × distinct-day-counts rows.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min(F.col("l_shipdate").cast("date")).alias("first_ship"))
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("first_ship"), F.col("o_orderdate").cast("date")
            ).alias("days_to_ship"),
        )
    )
    hist = per_order.groupBy("o_orderpriority", "days_to_ship").agg(
        F.count("*").alias("c")
    )
    w_cum = (
        W.partitionBy("o_orderpriority")
        .orderBy("days_to_ship")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("o_orderpriority")
    cum = hist.select(
        "o_orderpriority",
        "days_to_ship",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("tot"),
        F.max("days_to_ship").over(w_all).alias("max_d"),
    )
    pick = lambda q: F.min(  # noqa: E731
        F.when(
            F.col("cum") >= F.ceil(F.lit(q) * F.col("tot")),
            F.col("days_to_ship"),
        )
    )
    return cum.groupBy("o_orderpriority").agg(
        F.max("tot").alias("n_orders"),
        pick(0.5).cast("bigint").alias("p50_days"),
        pick(0.9).cast("bigint").alias("p90_days"),
        F.max("max_d").cast("bigint").alias("max_days"),
    )


BASKET_TOP_K = 20


@register(
    "orders_market_basket_pairs",
    oracle=f"""
    WITH lines AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS support
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT part_a, part_b, support
    FROM pairs
    ORDER BY support DESC, part_a, part_b
    LIMIT {BASKET_TOP_K}
    """,
)
def orders_market_basket_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top co-purchased part pairs (market-basket support counts) —
    the association-mining primitive behind "bought together"
    recommendations.

    Plan: NOT the oracle's within-order self-join (which shuffles the
    fact twice and recomputes lineage) — one aggregate folds lines to
    a per-order DISTINCT part array (basket size is bounded by order
    width, ≤7 in TPC-H shape, so the in-row pair expansion is a
    constant-factor explode, the same capped in-bucket pattern as the
    LSH families but with a structural bound instead of a cap), then
    one pair-keyed count and a TakeOrderedAndProject top-k. Two
    shuffles total, both on uniform keys.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    n = F.size(F.col("parts"))
    pairs = baskets.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("parts"),
                        lambda a, i: F.transform(
                            F.slice(
                                F.col("parts"), i + 2, F.greatest(n - i - 1, F.lit(0))
                            ),
                            lambda b: F.struct(
                                a.alias("part_a"), b.alias("part_b")
                            ),
                        ),
                    )
                ),
                lambda s: s["part_a"] < s["part_b"],
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.part_a").alias("part_a"),
            F.col("p.part_b").alias("part_b"),
        )
        .agg(F.count("*").alias("support"))
        .orderBy(F.desc("support"), F.asc("part_a"), F.asc("part_b"))
        .limit(BASKET_TOP_K)
    )


@register(
    "q15_top_suppliers_by_quarter_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(FLOOR(SUM(CAST(l_extendedprice * (1 - l_discount)
                                AS DECIMAL(25,6))) * 100 + 0.5)
                  AS BIGINT) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT r.l_suppkey AS s_suppkey, s.s_name, r.total_cents
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_cents = (SELECT MAX(total_cents) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q15_top_suppliers_by_quarter_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H-Q15-shape: the supplier(s) with maximum quarterly
    revenue, TIES INCLUDED — the argmax-without-window pattern: a
    global window (rank over everything) would single-partition the
    supplier aggregate; instead the scalar max broadcasts back onto
    it (one extra tiny job, zero extra shuffle of the data).

    Plan: the quarter window pushes to the scan; ONE suppkey
    aggregate (exact integer cents) is the only corpus shuffle; the
    1-row max crossJoin-broadcasts; the name lookup broadcasts the
    supplier dimension.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.floor(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(25,6)")
            )
            * 100
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("total_cents")
    )
    rev = rev.localCheckpoint(eager=True)  # feeds max + filter
    mx = rev.agg(F.max("total_cents").alias("_mx"))
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("_mx"))
        .join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            "total_cents",
        )
        .orderBy("s_suppkey")
    )


@register(
    "customer_reorder_gap_by_segment",
    oracle="""
    WITH o AS (
      SELECT c.c_mktsegment, o.o_custkey,
             CAST(o.o_orderdate AS DATE) AS d, o.o_orderkey
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), gaps AS (
      SELECT c_mktsegment,
             datediff('day',
               lag(d) OVER (PARTITION BY o_custkey
                            ORDER BY d, o_orderkey), d) AS gap_days
      FROM o
    )
    SELECT c_mktsegment,
           COUNT(gap_days) AS n_gaps,
           CAST(quantile_disc(gap_days, 0.5) AS BIGINT) AS p50_days,
           CAST(quantile_disc(gap_days, 0.9) AS BIGINT) AS p90_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY c_mktsegment
    """,
)
def customer_reorder_gap_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Days between a customer's consecutive orders, p50/p90 per
    market segment — the purchase-frequency signal replenishment and
    churn models calibrate on (the events-side interarrival profile,
    restated on the commerce fact).

    Plan: ONE custkey-keyed window pass computes the lag gaps (same
    partitioning every per-customer operator shares; the segment
    label broadcasts on from the dimension), then the grouped
    value-histogram quantile pattern — integer day gaps, bounded
    distinct-value domain, no per-group sort of orders.
    """
    apply_engine_conf(spark)
    from pyspark.sql import Window as _W

    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d"), "o_orderkey"
    )
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = _W.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_mktsegment",
            F.datediff(F.col("d"), F.lag("d").over(w)).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    hist = gaps.groupBy("c_mktsegment", "gap_days").agg(
        F.count("*").alias("c")
    )
    w_cum = (
        _W.partitionBy("c_mktsegment")
        .orderBy("gap_days")
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    w_all = _W.partitionBy("c_mktsegment")
    cum = hist.select(
        "c_mktsegment",
        "gap_days",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("tot"),
    )
    pick = lambda q: F.min(  # noqa: E731
        F.when(
            F.col("cum") >= F.ceil(F.lit(q) * F.col("tot")),
            F.col("gap_days"),
        )
    )
    return cum.groupBy("c_mktsegment").agg(
        F.max("tot").alias("n_gaps"),
        pick(0.5).cast("bigint").alias("p50_days"),
        pick(0.9).cast("bigint").alias("p90_days"),
    )


# ---------------------------------------------------------------------------
# Round-5 extension: the remaining classic TPC-H join shapes (Q2, Q7,
# Q8, Q9, Q11, Q12, Q20, Q21), restated on the available columns (the
# testdata has no partsupp table and no commit/receipt dates — each
# docstring states the restatement).  The reference has no relational
# surface (SURVEY.md §2.9); these extend the Spark-native extension
# suite with the canonical multi-way-join / semi-anti-join / scalar-
# threshold plan shapes a warehouse workload exercises.
# ---------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-style bilateral trade volume: revenue shipped between
    two nations, per direction per year.

    Scale shape: the only fact-fact shuffle is orders⋈lineitem on
    orderkey; supplier/customer/nation are broadcast dimensions, and
    the nation-pair predicate is applied to the two broadcast maps
    (so most fact rows drop at the probe, before the groupBy's
    shuffle).  The shipdate range prunes at the parquet scan.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
    )


@register(
    "q8_market_share",
    oracle="""
    WITH flat AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(25,6)) AS vol,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
                     AND r.r_name = 'ASIA'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                         THEN vol ELSE CAST(0 AS DECIMAL(25,6)) END)
                AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM flat
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-style national market share: of all ECONOMY-part
    revenue sold to ASIA customers in 1996–1997, the fraction supplied
    by NATION_5, per order year.

    Scale shape: every dimension (part filtered to one type, customer
    keyed map, supplier, nation ×2, region) broadcasts; the single
    fact-fact shuffle is orders⋈lineitem.  Both the numerator and
    denominator accumulate in exact DECIMAL inside ONE aggregate (a
    conditional sum — no second pass, no self-join), and the final
    ratio is one double division on identical operands in both
    engines.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    region = (
        table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(25,6)"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
                        F.lit(0).cast("decimal(25,6)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - p.p_retailprice * l.l_quantity * 0.1
                         AS DECIMAL(25,6))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
                   AND p.p_name LIKE '%red%'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-style product-type profit, restated: the testdata has
    no partsupp/ps_supplycost, so cost is proxied as 10% of retail
    list value (``p_retailprice · l_quantity · 0.1``) — the plan
    shape (fact ⋈ filtered part ⋈ supplier ⋈ nation ⋈ orders, grouped
    by nation × order-year) is Q9's.

    Scale shape: part (name-filtered), supplier, and nation broadcast;
    orders⋈lineitem is the one big shuffle.  The per-row profit
    expression is pure double IEEE arithmetic (identical across
    engines) cast to exact DECIMAL before the sum.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "nation", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(_dec_sum(profit, "sum_profit"))
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(FLOOR(l_extendedprice * 1000000 + 0.5) AS BIGINT))
               // SUM(CAST(l_quantity AS BIGINT)) AS unit_cost_q6
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, MIN(unit_cost_q6) AS min_cost
      FROM cost GROUP BY l_partkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
           c.unit_cost_q6
    FROM cost c
    JOIN best b     ON c.l_partkey = b.l_partkey
                   AND c.unit_cost_q6 = b.min_cost
    JOIN part p     ON p.p_partkey = c.l_partkey
                   AND p.p_size <= 25 AND p.p_type = 'ECONOMY'
    JOIN supplier s ON c.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
                   AND r.r_name = 'EUROPE'
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-style minimum-cost supplier, restated: no partsupp
    table exists, so "supply cost" is the observed unit sell price —
    total extended price over total quantity per (part, supplier),
    quantized to exact integer micros (``Σ price_micros // Σ qty``,
    integer operands on BOTH engines so the floor-division semantics
    agree).  The Q2 correlated-MIN subquery is decorrelated into an
    aggregate joined back on (partkey, min_cost) — the rewrite
    Catalyst itself applies.

    Scale shape: the cost aggregate shuffles lineitem ONCE on
    (l_partkey, l_suppkey); the per-part MIN reuses that output (tiny
    — one row per part×supplier pair); the join-back is
    pair-table ⋈ part-level-min, both partkey-clustered, with the
    size/type-filtered part dimension and supplier/nation/region
    broadcast.  Deterministic top-100 via a full tie-break chain
    ending in the unique (p_partkey, s_name) pair —
    TakeOrderedAndProject, not a global sort.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.expr(
            "sum(CAST(FLOOR(l_extendedprice * 1000000 + 0.5) AS BIGINT))"
            " div sum(CAST(l_quantity AS BIGINT))"
        ).alias("unit_cost_q6")
    )
    best = cost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost_q6").alias("min_cost")
    )
    part = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 25) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey", "p_type")
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nat = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = (
        table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    return (
        cost.join(
            best,
            (cost.l_partkey == best.b_partkey)
            & (cost.unit_cost_q6 == best.min_cost),
        )
        .join(F.broadcast(part), cost.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), cost.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            "unit_cost_q6",
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(100)
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey,
             SUM(CAST(FLOOR(l.l_extendedprice * 1000000 + 0.5) AS BIGINT))
               AS value_micros
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
                     AND n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    ),
    tot AS (SELECT SUM(value_micros) AS t FROM val)
    SELECT v.l_partkey AS p_partkey,
           CAST(v.value_micros AS DOUBLE) / 1000000 AS value
    FROM val v, tot
    WHERE CAST(v.value_micros AS HUGEINT) * 1000 > tot.t
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-style important stock, restated: with no partsupp,
    "stock value" is shipped extended-price volume through NATION_3's
    suppliers; a part is *important* when its value exceeds 0.1% of
    the nation's total.

    Scale shape: ONE partkey shuffle builds the per-part value table;
    the global total folds that (tiny) table to one row, which
    broadcasts back as a cross-joined scalar — the Q11 HAVING-scalar
    shape with zero extra passes over the fact.  The threshold
    comparison is exact integer arithmetic, widened to
    DECIMAL(38,0)/HUGEINT (micros × 1000 overflows int64 at the
    100 TB corpus scale).
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(FLOOR(l_extendedprice * 1000000 + 0.5) AS BIGINT)"
                )
            ).alias("value_micros")
        )
    )
    tot = val.agg(
        F.sum(F.col("value_micros").cast("decimal(38,0)")).alias("t")
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value_micros").cast("decimal(38,0)") * 1000 > F.col("t")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_micros").cast("double") / 1000000).alias("value"),
        )
    )


@register(
    "q12_ship_latency_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE)) > 60
                THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q12_ship_latency_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-style shipping-priority split, restated: the testdata
    has no l_shipmode/commit/receipt dates, so lines bucket by ship
    *latency* (ship minus order date, >60 days = LATE) and the Q12
    conditional aggregation counts high- vs low-priority lines per
    bucket.

    Scale shape: one orders⋈lineitem shuffle on orderkey, then a
    2-group conditional aggregate (map-side partial).  The date filter
    prunes the fact scan; outputs are all-integer counts.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.when(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
                > 60,
                F.lit("LATE"),
            )
            .otherwise(F.lit("ONTIME"))
            .alias("ship_bucket"),
            F.when(high, 1).otherwise(0).alias("is_high"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).alias("low_line_count"),
        )
    )


@register(
    "q20_dominant_suppliers",
    oracle="""
    WITH fparts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ),
    shipped AS (
      SELECT l.l_partkey, l.l_suppkey,
             SUM(CAST(l.l_quantity AS BIGINT)) AS sup_qty
      FROM lineitem l
      JOIN fparts f ON l.l_partkey = f.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l.l_partkey, l.l_suppkey
    ),
    tot AS (
      SELECT l_partkey, SUM(sup_qty) AS part_qty
      FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
    FROM shipped sh
    JOIN tot t      ON sh.l_partkey = t.l_partkey
    JOIN supplier s ON sh.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
                   AND n.n_name = 'NATION_7'
    WHERE CAST(sh.sup_qty AS HUGEINT) * 4 > t.part_qty
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-style nested semi-join chain, restated: with no
    partsupp availability column, a supplier qualifies when it shipped
    MORE THAN a quarter of a filtered part's total 1997 volume (Q20's
    ``availqty > 0.5·Σqty`` threshold becomes a share-of-shipped
    threshold) — NATION_7 suppliers dominating any 'small…' part.

    Scale shape: the name-filtered part set broadcasts as a semi-join
    into the fact scan (date filter pruned at parquet); ONE
    (partkey, suppkey) shuffle builds per-supplier quantities; the
    part total re-aggregates that already-small pair table; the share
    predicate is exact integer arithmetic (×4, widened vs overflow);
    the surviving supplier keys collapse through DISTINCT before the
    broadcast supplier/nation decoration — the fact is never
    self-joined.
    """
    apply_engine_conf(spark)
    fparts = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(fparts), li.l_partkey == fparts.p_partkey, "leftsemi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sup_qty"))
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(F.col("sup_qty").cast("decimal(38,0)")).alias("part_qty")
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_7")
        .select("n_nationkey", "n_name")
    )
    return (
        shipped.join(tot, shipped.l_partkey == tot.t_partkey)
        .filter(
            F.col("sup_qty").cast("decimal(38,0)") * 4 > F.col("part_qty")
        )
        .join(F.broadcast(supp), shipped.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH base AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS is_late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM base l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
                   AND n.n_name = 'NATION_2'
    WHERE l1.is_late
      AND EXISTS (
        SELECT 1 FROM base l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM base l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.is_late
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style "suppliers who kept orders waiting", restated:
    with no commit/receipt dates, a line is *late* when it shipped
    more than 90 days after the order date; count, per NATION_2
    supplier, its late lines on finished ('F') multi-supplier orders
    where it was the ONLY late supplier.

    Scale shape: the oracle states Q21's EXISTS / NOT-EXISTS pair; the
    Spark plan replaces both fact self-joins with ONE per-pair
    aggregate — group (orderkey, suppkey) carrying MAX(is_late) and
    the count of late lines — from which BOTH sides of the remaining
    join derive: the per-order summary (count suppliers / late
    suppliers; ``n_supp ≥ 2 AND n_late_supp = 1`` is exactly "another
    supplier exists, no OTHER late supplier exists" for a supplier
    already known late) and the qualifying pairs themselves.  Because
    both branches sit on the SAME (orderkey, suppkey) exchange,
    ReuseExchange executes the fact scan and shuffle once; the
    supplier/nation decoration broadcasts.  Deterministic top-100 via
    (numwait DESC, s_name).
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    base = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .cast("int")
        .alias("is_late"),
    )
    per_pair = base.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("pair_late"),
        F.sum("is_late").alias("n_late_lines"),
    )
    per_order = per_pair.groupBy(
        F.col("l_orderkey").alias("o_key")
    ).agg(
        F.count("*").alias("n_supp"),
        F.sum("pair_late").alias("n_late_supp"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_2")
        .select("n_nationkey")
    )
    return (
        per_pair.filter(F.col("pair_late") == 1)
        .join(per_order, F.col("l_orderkey") == F.col("o_key"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


PARETO_PS = (0.5, 0.8, 0.9)
PARETO_NB = 4096  # histogram buckets per refinement pass


@register(
    "orders_pareto_concentration",
    oracle="""
    WITH cust_rev AS (
      SELECT o_custkey,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
               AS rev
      FROM orders GROUP BY o_custkey
    ), tot AS (
      SELECT COUNT(*) AS n_customers,
             SUM(CAST(rev AS HUGEINT)) AS total
      FROM cust_rev
    ), ranked AS (
      SELECT rev,
             SUM(CAST(rev AS HUGEINT)) OVER (
               ORDER BY rev DESC, o_custkey
               ROWS UNBOUNDED PRECEDING) AS cum,
             ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rk
      FROM cust_rev
    )
    SELECT t.n_customers,
           (SELECT MIN(rk) FROM ranked, tot
             WHERE cum >= CAST(CEIL(0.5 * total) AS HUGEINT))
             AS top_k_50,
           (SELECT MIN(rk) FROM ranked, tot
             WHERE cum >= CAST(CEIL(0.8 * total) AS HUGEINT))
             AS top_k_80,
           (SELECT MIN(rk) FROM ranked, tot
             WHERE cum >= CAST(CEIL(0.9 * total) AS HUGEINT))
             AS top_k_90
    FROM tot t
    """,
)
def orders_pareto_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pareto revenue concentration: how many top customers carry
    50 / 80 / 90% of total revenue — the "who carries the corpus"
    audit (the same machinery audits source-level token mass before
    a mixing run).

    The oracle ranks customers with a global window; the engine NEVER
    sorts.  Per percentile it finds the boundary revenue level
    T* = max{v : mass(rev ≥ v) ≥ ⌈p·total⌉} by WEIGHTED histogram
    descent — the ``exact_disc_quantiles`` refinement with
    per-bucket (count, mass) pairs instead of counts — carrying
    (count, mass) of everything strictly above the shrinking bracket
    in driver state, so when the bracket reaches width 1 the answer
    is closed-form integer arithmetic:
    ``k = cnt(rev > T*) + ⌈(target − mass(rev > T*)) / T*⌉``
    (boundary ties each contribute exactly T*, so only their count
    matters — no ordering among tied customers affects k).

    Each descent round serves ALL still-unresolved percentiles from
    shared histogram aggregates: brackets for increasing targets are
    provably ordered (a deeper mass target needs an equal-or-smaller
    threshold), so per round the distinct brackets number at most
    |percentiles| and each is ONE conditional aggregate over the
    localCheckpointed customer frame.  ⌈log_NB(cents range)⌉ ≈ 2–3
    rounds at any realistic scale; shuffle volume is the customer
    aggregate, once.
    """
    import math

    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    cust_rev = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(
                F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
            ).alias("rev")
        )
        .select(F.col("rev").cast("decimal(38,0)").alias("rev"))
        .localCheckpoint(eager=True)
    )
    stats = cust_rev.agg(
        F.count("*").alias("n"),
        F.sum("rev").alias("total"),
        F.min("rev").alias("lo"),
        F.max("rev").alias("hi"),
    ).first()
    if int(stats["n"]) == 0:
        # empty corpus: no customers, every top-k target undefined
        # (the oracle's MIN over an empty walk is NULL)
        return spark.createDataFrame(
            [(0, None, None, None)],
            "n_customers bigint, top_k_50 bigint, top_k_80 bigint,"
            " top_k_90 bigint",
        )
    n_customers, total = int(stats["n"]), int(stats["total"])
    glo, ghi = int(stats["lo"]), int(stats["hi"])
    targets = {p: math.ceil(p * total) for p in PARETO_PS}
    # per-p state: bracket [lo, hi] containing T*, plus exact
    # (cnt, mass) of rev STRICTLY ABOVE hi — maintained so the final
    # step needs no extra probe
    state = {p: [glo, ghi, 0, 0] for p in PARETO_PS}

    def _histogram(lo: int, hi: int, width: int):
        """Bucket (count, mass) pairs for rev ∈ [lo, hi], descending
        bucket order — one conditional aggregate."""
        rows = (
            cust_rev.filter((F.col("rev") >= lo) & (F.col("rev") <= hi))
            .groupBy(
                F.floor((F.col("rev") - F.lit(lo)) / F.lit(width)).alias(
                    "b"
                )
            )
            .agg(F.count("*").alias("cnt"), F.sum("rev").alias("mass"))
            .orderBy(F.desc("b"))
            .collect()
        )
        return [(int(r["b"]), int(r["cnt"]), int(r["mass"])) for r in rows]

    unresolved = set(PARETO_PS)
    while unresolved:
        # distinct brackets this round (ties collapse: equal targets'
        # brackets start equal and narrow identically)
        brackets = {}
        for p in unresolved:
            lo, hi = state[p][0], state[p][1]
            brackets.setdefault((lo, hi), []).append(p)
        for (lo, hi), ps in brackets.items():
            if lo >= hi:
                unresolved -= set(ps)
                continue
            width = max(1, (hi - lo + PARETO_NB) // PARETO_NB)
            hist = _histogram(lo, hi, width)
            for p in ps:
                _, _, cnt_above, mass_above = state[p]
                target = targets[p]
                acc_c, acc_m = cnt_above, mass_above
                chosen = None
                for b, c, m in hist:  # top bucket first
                    if acc_m + m >= target:
                        chosen = (b, acc_c, acc_m)
                        break
                    acc_c += c
                    acc_m += m
                if chosen is None:
                    # mass_ge(lo) < target can only happen for the
                    # full-range first round if total < target —
                    # impossible for p < 1; keep the bottom bucket
                    chosen = (hist[-1][0], acc_c, acc_m)
                b, c_up, m_up = chosen
                new_lo = lo + b * width
                new_hi = min(hi, lo + (b + 1) * width - 1)
                state[p] = [new_lo, new_hi, c_up, m_up]
                if new_lo >= new_hi:
                    unresolved.discard(p)
    # every bracket is now a single level: T* = lo, with exact
    # (cnt, mass) above it in state — closed-form k
    results = {}
    for p in PARETO_PS:
        t_star, _, cnt_above, mass_above = (
            state[p][0],
            state[p][1],
            state[p][2],
            state[p][3],
        )
        need = targets[p] - mass_above
        results[p] = cnt_above + (
            -(-need // t_star) if t_star > 0 and need > 0 else 0
        )
    return spark.createDataFrame(
        [(n_customers, results[0.5], results[0.8], results[0.9])],
        "n_customers bigint, top_k_50 bigint, top_k_80 bigint,"
        " top_k_90 bigint",
    )


@register(
    "part_skyline_frontier",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_size,
             CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents
      FROM part
    )
    SELECT a.p_partkey, a.p_size, a.price_cents
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.p_size >= a.p_size AND b.price_cents <= a.price_cents
        AND (b.p_size > a.p_size OR b.price_cents < a.price_cents)
    )
    """,
)
def part_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query: the parts no other part
    dominates on (cheaper-or-equal price, bigger-or-equal size, at
    least one strict) — the classic multi-objective shortlist
    operator (Börzsönyi et al., ICDE'01) the engine needs wherever
    "best trade-offs" beats "best single metric".

    The oracle is the quadratic NOT-EXISTS spec. The engine exploits
    the 2-D structure: dominance only flows through the per-size
    price minimum, so it (1) aggregates ``min(price)`` per size —
    one map-side-combined shuffle on a BOUNDED key domain (p_size is
    a small-int attribute), (2) runs the suffix-min window over that
    size-domain-sized frame (dozens of rows at ANY corpus scale —
    the single-partition window is bounded by the attribute domain,
    not the corpus), keeping sizes whose min undercuts every larger
    size, and (3) broadcast-semi-joins the frontier ``(size,
    min_price)`` pairs back to the part scan, so equal-price ties at
    a frontier point all survive — exactly the spec's semantics
    (equal pairs never dominate each other).

    Prices quantize to integer cents (``FLOOR(x·100+0.5)``, the house
    recipe) so the frontier comparison is exact on both engines.

    Plan: one bounded-domain aggregate + one broadcast join; the
    part scan is read once per side, filters pushed.
    """
    apply_engine_conf(spark)
    part = table(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        "p_size",
        F.expr(
            "CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)"
        ).alias("price_cents"),
    )
    per_size = p.groupBy("p_size").agg(
        F.min("price_cents").alias("min_cents")
    )
    # min price over all strictly LARGER sizes; NULL for the largest
    w_above = (
        W.orderBy(F.col("p_size").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    frontier = (
        per_size.withColumn("best_above", F.min("min_cents").over(w_above))
        .filter(
            F.col("best_above").isNull()
            | (F.col("min_cents") < F.col("best_above"))
        )
        .select("p_size", "min_cents")
    )
    # explicit aliases: `frontier` derives from `p`, so attribute
    # references like p.p_size would resolve to the SAME expression id
    # on both sides and compile to a trivially-true predicate
    return p.alias("p").join(
        F.broadcast(frontier.alias("f")),
        (F.col("p.p_size") == F.col("f.p_size"))
        & (F.col("p.price_cents") == F.col("f.min_cents")),
        "left_semi",
    ).select("p.p_partkey", "p.p_size", "p.price_cents")


@register(
    "orders_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT COUNT(*) AS n, SUM(CAST(rev AS HUGEINT)) AS total FROM daily
    ), walk AS (
      SELECT day,
             CAST(t.n AS HUGEINT)
               * SUM(CAST(rev AS HUGEINT)) OVER (ORDER BY day)
               - CAST(ROW_NUMBER() OVER (ORDER BY day) AS HUGEINT)
               * t.total AS s_n
      FROM daily, tot t
    )
    SELECT CAST(day AS VARCHAR) AS changepoint_day,
           (SELECT CAST(n AS BIGINT) FROM tot) AS n_days,
           CAST(abs(s_n) AS DECIMAL(38,0)) AS cusum_abs_n,
           CASE WHEN s_n > 0 THEN 1 ELSE -1 END AS direction
    FROM walk
    ORDER BY abs(s_n) DESC, day ASC
    LIMIT 1
    """,
)
def orders_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection over the daily-revenue series via CUSUM:
    the day where the cumulative deviation from the series mean peaks
    — Page's classic statistic, the standard first-pass answer to
    "when did this metric shift?".

    Exact-integer formulation: with daily cents ``x_i``, prefix sums
    ``P_t`` and total ``T`` over ``n`` days, the mean-centered CUSUM
    scaled by n is ``n·P_t − t·T`` — all integer products (no mean
    division, no float accumulation), HUGEINT/DECIMAL(38,0)-widened
    per the house overflow recipe. The argmax tie-breaks to the
    earliest day; ``direction`` is +1 when the early segment runs
    above the overall mean (a downward shift after the peak).

    Plan shape (100 TB): the corpus pays ONE day-keyed aggregate with
    map-side partials; the CUSUM walk (two windows + rank) runs over
    the calendar-sized daily frame — bounded at any corpus scale, the
    same argument as the rolling-7d and month-spine operators.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).alias("rev")
    )
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    w_ord = W.orderBy("day")
    walk = daily.select(
        "day",
        (
            F.count("*").over(w_all).cast("decimal(38,0)")
            * F.sum(F.col("rev").cast("decimal(38,0)")).over(
                w_ord.rowsBetween(W.unboundedPreceding, 0)
            )
            - F.row_number().over(w_ord).cast("decimal(38,0)")
            * F.sum(F.col("rev").cast("decimal(38,0)")).over(w_all)
        ).alias("s_n"),
        F.count("*").over(w_all).alias("n_days"),
    )
    return (
        walk.orderBy(F.abs(F.col("s_n")).desc(), F.col("day").asc())
        .limit(1)
        .select(
            F.col("day").cast("string").alias("changepoint_day"),
            F.col("n_days").cast("long").alias("n_days"),
            F.abs(F.col("s_n")).cast("decimal(38,0)").alias("cusum_abs_n"),
            F.when(F.col("s_n") > 0, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("direction"),
        )
    )


# Benford first-digit expectations log10(1+1/d), quantized to q6 —
# exact constants, so no transcendental evaluates in either engine.
_BENFORD_Q6 = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


@register(
    "orders_benford_first_digit",
    oracle=f"""
    WITH b(digit, benford_q6) AS (VALUES
      {", ".join(f"({d}, {q})" for d, q in sorted(_BENFORD_Q6.items()))}
    ), c AS (
      SELECT CAST(SUBSTR(CAST(
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
             AS VARCHAR), 1, 1) AS INT) AS digit,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    ), tot AS (SELECT SUM(n) AS total FROM c)
    SELECT b.digit,
           COALESCE(CAST(c.n AS BIGINT), 0) AS n,
           CAST(COALESCE(c.n, 0) * 1000000 // t.total AS BIGINT)
             AS share_q6,
           CAST(COALESCE(c.n, 0) * 1000000 // t.total AS BIGINT)
             - b.benford_q6 AS deviation_q6
    FROM b LEFT JOIN c ON b.digit = c.digit, tot t
    """,
)
def orders_benford_first_digit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benford's-law conformance audit over order totals: the
    first-significant-digit distribution vs the log10(1+1/d)
    expectation — the classic fraud/synthetic-data screen (organic
    multiplicative totals follow Benford; fabricated or uniform
    generators don't, and THIS synthetic corpus is expected to
    deviate — the audit reports the deviation, it doesn't assert
    conformance).

    Exactness: totals quantize to integer cents, the first digit is
    a string head of the integer (no log10 at query time), shares
    are the house integer-q6 division, and the Benford targets are
    q6-quantized CONSTANTS baked into both engines — no
    transcendental evaluates anywhere.

    Plan: one 9-bucket aggregate with map-side partials; the digit
    spine is a 9-row literal frame left-joined so absent digits
    report share 0 (never silently vanish).
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    counts = orders.select(
        F.expr(
            "CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5)"
            " AS BIGINT) AS STRING), 1, 1) AS INT)"
        ).alias("digit")
    ).groupBy("digit").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    spine = spark.createDataFrame(
        sorted(_BENFORD_Q6.items()), "digit int, benford_q6 bigint"
    )
    return (
        spine.join(F.broadcast(counts), "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            F.expr(
                "CAST(COALESCE(n, 0) * 1000000 div total AS BIGINT)"
            ).alias("share_q6"),
            (
                F.expr("CAST(COALESCE(n, 0) * 1000000 div total AS BIGINT)")
                - F.col("benford_q6")
            ).alias("deviation_q6"),
        )
    )


EWMA_LAGS = 40  # α=1/2 EWMA truncated to 40 calendar lags (tail < 2⁻⁴⁰)


@register(
    "orders_ewma_trailing_demand",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
      FROM orders GROUP BY 1
    )
    SELECT CAST(a.day AS VARCHAR) AS day,
           CAST(a.rev AS BIGINT) AS rev_cents,
           CAST(COUNT(*) AS BIGINT) AS n_days_in_window,
           CAST(SUM(CAST(b.rev AS HUGEINT)
                    * (CAST(1 AS HUGEINT)
                       << ({EWMA_LAGS - 1} - (a.day - b.day))))
                // SUM(CAST(1 AS HUGEINT)
                       << ({EWMA_LAGS - 1} - (a.day - b.day)))
                AS BIGINT) AS ewma_cents
    FROM daily a JOIN daily b
      ON b.day <= a.day AND b.day > a.day - {EWMA_LAGS}
    GROUP BY a.day, a.rev
    """,
)
def orders_ewma_trailing_demand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exponentially-weighted trailing demand (α = 1/2) per day — the
    smoothing every ops dashboard layers over a noisy daily series,
    made EXACT: with α = 1/2 the weights are powers of two, so the
    windowed EWMA is a ratio of two integer sums
    (``Σ revᵢ·2^(39-lagᵢ) div Σ 2^(39-lagᵢ)``) — no float recursion,
    no accumulation-order sensitivity, and the weight sum adapts
    itself to series heads and calendar gaps (missing days simply
    contribute no term). Truncating at {EWMA_LAGS} lags drops
    < 2⁻⁴⁰ of the mass — below one cent at any conceivable scale.

    Scale shape: the corpus pays one day-keyed aggregate; the
    weighted self-join runs over the calendar-sized daily frame
    (≤ {EWMA_LAGS} partners per row — a banded range join on a
    bounded frame), the same boundedness argument as the CUSUM walk
    and rolling-7d. A ROWS/RANGE window cannot express per-row
    distance weights, so the banded join IS the right plan, not a
    fallback.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).alias("rev")
    ).localCheckpoint(eager=True)  # calendar-sized; feeds both join sides
    a = daily.select(
        F.col("day").alias("a_day"),
        F.unix_date("day").alias("a_d"),
        F.col("rev").alias("a_rev"),
    )
    b = daily.select(
        F.unix_date("day").alias("b_d"), F.col("rev").alias("b_rev")
    )
    j = a.join(
        b,
        (F.col("b_d") <= F.col("a_d"))
        & (F.col("b_d") > F.col("a_d") - EWMA_LAGS),
    )
    w = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {EWMA_LAGS - 1} - (a_d - b_d))"
    )
    return j.groupBy("a_day", "a_rev").agg(
        F.count("*").alias("n_days_in_window"),
        F.expr(
            f"CAST(SUM(CAST(b_rev AS DECIMAL(38,0))"
            f" * shiftleft(CAST(1 AS BIGINT), {EWMA_LAGS - 1} - (a_d - b_d)))"
            f" div SUM(CAST(shiftleft(CAST(1 AS BIGINT),"
            f" {EWMA_LAGS - 1} - (a_d - b_d)) AS DECIMAL(38,0)))"
            f" AS BIGINT)"
        ).alias("ewma_cents"),
    ).select(
        F.col("a_day").cast("string").alias("day"),
        F.col("a_rev").cast("long").alias("rev_cents"),
        F.col("n_days_in_window").cast("long").alias("n_days_in_window"),
        "ewma_cents",
    )


@register(
    "orders_daily_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             COUNT(*) AS n_orders,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
      FROM orders GROUP BY 1
    ), spine AS (
      SELECT CAST(UNNEST(generate_series(
               (SELECT MIN(day) FROM daily),
               (SELECT MAX(day) FROM daily),
               INTERVAL 1 DAY)) AS DATE) AS day
    )
    SELECT CAST(s.day AS VARCHAR) AS day,
           CAST(COALESCE(d.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(last_value(d.rev IGNORE NULLS) OVER (
             ORDER BY s.day ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS rev_cents_filled,
           CASE WHEN d.day IS NULL THEN 1 ELSE 0 END AS imputed
    FROM spine s LEFT JOIN daily d ON d.day = s.day
    """,
)
def orders_daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling with fill-forward imputation — the
    timeseries-hygiene operator every downstream model assumes
    already ran: a dense day spine over the observed range, observed
    daily revenue where present, the MOST RECENT observed value
    carried forward through gaps, and an ``imputed`` flag so
    consumers can tell carried values from real ones (silent
    imputation is the data bug; flagged imputation is the feature).

    The fill is ``last_value IGNORE NULLS`` over the day-ordered
    spine — one pass, no self-join, and NULL-vs-0 semantics stay
    honest: a day with zero orders is genuinely absent from the
    aggregate, so its count reports 0 while its revenue carries
    forward (a closed store still has yesterday's run-rate).

    Scale shape: the corpus pays one day-keyed aggregate; the spine
    join and ordered fill run over the calendar-sized frame (the
    dense-month-spine boundedness argument). The first spine day is
    by construction an observed day (MIN comes from the data), so
    the fill never reads an empty preceding frame.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(
            F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).alias("rev"),
    )
    bounds = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    j = spine.join(daily.withColumnRenamed("day", "obs_day"),
                   spine.day == F.col("obs_day"), "left")
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return j.select(
        F.col("day").cast("string").alias("day"),
        F.coalesce(F.col("n_orders"), F.lit(0))
        .cast("long")
        .alias("n_orders"),
        F.last("rev", ignorenulls=True)
        .over(w)
        .cast("long")
        .alias("rev_cents_filled"),
        F.when(F.col("obs_day").isNull(), 1).otherwise(0).alias("imputed"),
    )


@register(
    "customer_decile_churn",
    oracle="""
    WITH span AS (
      SELECT EXTRACT(YEAR FROM MIN(o_orderdate)) AS y0,
             EXTRACT(YEAR FROM MAX(o_orderdate)) AS y1
      FROM orders
    ), per AS (
      SELECT o_custkey AS c, EXTRACT(YEAR FROM o_orderdate) AS y,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
      FROM orders, span
      WHERE EXTRACT(YEAR FROM o_orderdate) IN (span.y0, span.y1)
      GROUP BY 1, 2
    ), ranked AS (
      SELECT c, y, rev,
             ROW_NUMBER() OVER (PARTITION BY y
                                ORDER BY rev DESC, c ASC) AS rn,
             COUNT(*) OVER (PARTITION BY y) AS n
      FROM per
    ), churned AS (
      SELECT c FROM ranked, span
      WHERE y = span.y0 AND rn <= GREATEST(n // 10, 1)
      EXCEPT
      SELECT c FROM ranked, span
      WHERE y = span.y1 AND rn <= GREATEST(n // 10, 1)
    )
    SELECT ch.c AS c_custkey, r.rev AS first_year_rev_cents
    FROM churned ch JOIN ranked r ON r.c = ch.c
    CROSS JOIN span WHERE r.y = span.y0
    """,
)
def customer_decile_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churned whales: customers in the TOP REVENUE DECILE of the
    first observed year who are absent from the top decile of the
    last observed year — the account-management escalation list, and
    the registry's EXCEPT set-op shape (semi/anti joins are covered
    elsewhere; this is the distinct-set subtraction).

    Determinism: deciles are exact ranks ((revenue DESC, custkey ASC)
    row_number ≤ max(n/10, 1)) over integer-cents sums — never an
    ntile over floats; the year scalars come from one min/max
    aggregate. EXCEPT compiles to a left-anti hash join on Spark; the
    oracle uses the literal EXCEPT keyword.

    Scale: one year-filtered (custkey, year) aggregate (filter pushed
    to the scan), per-year ranking windows partitioned by year over
    the customer-sized frame, and the subtraction joins two
    decile-sized shortlists (≤ n/10 rows each side).
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    span = orders.agg(
        F.year(F.min("o_orderdate")).alias("y0"),
        F.year(F.max("o_orderdate")).alias("y1"),
    )
    per = (
        orders.crossJoin(F.broadcast(span))
        .filter(
            (F.year("o_orderdate") == F.col("y0"))
            | (F.year("o_orderdate") == F.col("y1"))
        )
        .groupBy(
            F.col("o_custkey").alias("c"),
            F.year("o_orderdate").alias("y"),
            "y0",
            "y1",
        )
        .agg(
            F.sum(
                F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
            ).alias("rev")
        )
    )
    w_y = W.partitionBy("y")
    ranked = per.select(
        "c",
        "y",
        "y0",
        "y1",
        "rev",
        F.row_number()
        .over(w_y.orderBy(F.col("rev").desc(), F.col("c").asc()))
        .alias("rn"),
        F.count("*").over(w_y).alias("n"),
    ).filter(F.col("rn") <= F.greatest(F.expr("n div 10"), F.lit(1)))
    top_first = ranked.filter(F.col("y") == F.col("y0"))
    top_last = ranked.filter(F.col("y") == F.col("y1")).select("c")
    churned = top_first.select("c").exceptAll(top_last).distinct()
    return churned.join(top_first, "c").select(
        F.col("c").alias("c_custkey"),
        F.col("rev").alias("first_year_rev_cents"),
    )


BASKET_MIN_SUPPORT = 2  # association rules need repeated evidence


@register(
    "orders_market_basket_lift",
    oracle=f"""
    WITH lines AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lines
    ), item AS (
      SELECT l_partkey, COUNT(*) AS c FROM lines GROUP BY 1
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS support
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
    )
    SELECT p.part_a, p.part_b, CAST(p.support AS BIGINT) AS support,
           CAST(CAST(p.support AS HUGEINT) * n.n_orders * 1000000
                // (CAST(ia.c AS HUGEINT) * ib.c) AS BIGINT) AS lift_q6,
           CAST(CAST(p.support AS HUGEINT) * 1000000 // ia.c
                AS BIGINT) AS conf_a_to_b_q6,
           CAST(CAST(p.support AS HUGEINT) * 1000000 // ib.c
                AS BIGINT) AS conf_b_to_a_q6
    FROM pairs p
    JOIN item ia ON ia.l_partkey = p.part_a
    JOIN item ib ON ib.l_partkey = p.part_b
    CROSS JOIN n
    """,
)
def orders_market_basket_lift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Association-rule strength over repeated co-purchases: for
    every part pair seen together in ≥{BASKET_MIN_SUPPORT} orders,
    the LIFT (observed co-rate over the independence expectation —
    >1e6 means genuinely associated, not just individually popular)
    and both directional confidences — the metrics that turn
    `orders_market_basket_pairs`' raw supports into rankable rules.

    All-integer: ``lift_q6 = (support·n_orders·1e6) div (c_a·c_b)``
    with HUGEINT/DECIMAL(38,0)-widened products (three counts
    multiply — the widening is load-bearing at corpus scale), and
    confidences are plain q6 count ratios. No float enters the hash.

    Plan: the basket-array explode of the pairs operator (per-order
    distinct array, structurally bounded in-row pair expansion), the
    support HAVING-filter BEFORE any join (candidate volume drops to
    repeated pairs only), then two broadcast joins against the
    part-frequency aggregate and the one-row order count.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    lines = li.distinct()
    n_orders = lines.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    item = lines.groupBy("l_partkey").agg(F.count("*").alias("c"))
    baskets = lines.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pair_expr = F.expr(
        "flatten(transform(parts, (x, i) -> "
        "transform(slice(parts, i + 2, size(parts) - i - 1), "
        "y -> struct(x AS part_a, y AS part_b))))"
    )
    pairs = (
        baskets.select(F.explode(pair_expr).alias("p"))
        .groupBy(
            F.col("p.part_a").alias("part_a"),
            F.col("p.part_b").alias("part_b"),
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= BASKET_MIN_SUPPORT)
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b")
    )
    return (
        pairs.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("support").cast("long").alias("support"),
            F.expr(
                "CAST(CAST(support AS DECIMAL(38,0)) * n_orders"
                " * 1000000 div (CAST(c_a AS DECIMAL(38,0)) * c_b)"
                " AS BIGINT)"
            ).alias("lift_q6"),
            F.expr(
                "CAST(CAST(support AS DECIMAL(38,0)) * 1000000 div c_a"
                " AS BIGINT)"
            ).alias("conf_a_to_b_q6"),
            F.expr(
                "CAST(CAST(support AS DECIMAL(38,0)) * 1000000 div c_b"
                " AS BIGINT)"
            ).alias("conf_b_to_a_q6"),
        )
    )


# Wilson lower-bound arithmetic, one shared expression TEXT injected
# into BOTH engines: every operation (literal parse, + * /, sqrt) is
# IEEE correctly-rounded, so identical text on identical integer
# inputs yields bit-identical doubles — the quantized bound hashes.
# Constants are exact decimal squares of z = 1.96.
_WILSON_LO = (
    "CAST(FLOOR((("
    "(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
    " + 1.9208 / CAST(n AS DOUBLE)"
    " - 1.96 * sqrt((((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
    " * (1.0 - (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))))"
    " + 0.9604 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))"
    ") / (1.0 + 3.8416 / CAST(n AS DOUBLE)))"
    " * 1000000 + 0.5) AS BIGINT)"
)


@register(
    "lineitem_return_rate_wilson",
    oracle=f"""
    WITH m AS (
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
             COUNT(*) AS n,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS k
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(month AS VARCHAR) AS month,
           CAST(n AS BIGINT) AS n_lines,
           CAST(k AS BIGINT) AS n_returned,
           CAST(CAST(k AS HUGEINT) * 1000000 // n AS BIGINT)
             AS rate_q6,
           {_WILSON_LO} AS wilson_lo_q6
    FROM m
    """,
)
def lineitem_return_rate_wilson(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Monthly return-rate monitor with the Wilson-score LOWER bound —
    the statistically honest alert threshold: a small month with a
    high raw rate gets a low bound (not enough evidence), a big month
    with the same rate gets a tight one. Alerting on the bound
    instead of the point rate is the standard fix for
    low-volume-false-positive pages.

    Cross-engine exactness without integers-only: the bound needs
    sqrt and division, but BOTH are IEEE correctly-rounded and the
    formula is injected as ONE shared expression text into Spark and
    DuckDB — identical text on identical integer (k, n) inputs gives
    bit-identical doubles, so the q6 quantization hashes. (This is
    the same exemption the cosine family rides: sqrt of a
    deterministic double is bit-identical everywhere; the ban is on
    transcendentals and order-sensitive aggregates, neither of which
    appears here.)

    Plan: one month-keyed aggregate with map-side partials; the
    bound is a per-row projection over the calendar-sized frame.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate"))
        .cast("date")
        .alias("month")
    ).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("k"),
    )
    return m.select(
        F.col("month").cast("string").alias("month"),
        F.col("n").cast("long").alias("n_lines"),
        F.col("k").cast("long").alias("n_returned"),
        F.expr(
            "CAST(CAST(k AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"
        ).alias("rate_q6"),
        F.expr(_WILSON_LO).alias("wilson_lo_q6"),
    )


@register(
    "orders_ship_latency_life_table",
    oracle="""
    WITH shipped AS (
      SELECT o.o_orderkey,
             GREATEST(0, date_diff('day', o.o_orderdate,
                                   MIN(l.l_shipdate))) AS t,
             1 AS ev
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ), horizon AS (
      SELECT MAX(l_shipdate) AS h FROM lineitem
    ), censored AS (
      SELECT o.o_orderkey,
             GREATEST(0, date_diff('day', o.o_orderdate, hz.h)) AS t,
             0 AS ev
      FROM orders o CROSS JOIN horizon hz
      WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
      )
    ), pooled AS (
      SELECT t, ev FROM shipped UNION ALL SELECT t, ev FROM censored
    ), per_t AS (
      SELECT t, SUM(ev) AS d, SUM(1 - ev) AS c
      FROM pooled GROUP BY t
    ), risk AS (
      SELECT t, d,
             SUM(d + c) OVER (ORDER BY t DESC
                              ROWS UNBOUNDED PRECEDING) AS n_at_risk
      FROM per_t
    )
    SELECT CAST(t AS BIGINT) AS latency_days,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_shipped,
           CAST(CAST(d AS HUGEINT) * 1000000 // n_at_risk AS BIGINT)
             AS hazard_q6
    FROM risk WHERE d > 0
    """,
)
def orders_ship_latency_life_table(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Survival analysis with RIGHT-CENSORING, as a discrete life
    table: per latency day t, how many orders were still waiting
    (the risk set), how many shipped exactly at t, and the discrete
    hazard d_t/n_t. Orders with no lineitems are CENSORED at the
    observation horizon (the global max shipdate) — dropping them
    would bias the hazard up, the mistake this operator exists to
    avoid; this is the Kaplan–Meier life table minus the survival
    product (hazards are integer-exact q6 ratios; the Π(1−h) curve
    is derivable downstream but its float product is the banned
    accumulation class, so the table IS the contract).

    Plan: one orders⋈lineitem first-ship aggregate, one broadcast
    anti-join for the censored arm against the one-row horizon, a
    latency-day-keyed count, and the risk-set suffix-sum window over
    the DOMAIN-sized latency axis (days, not orders) — the CUSUM
    boundedness argument again.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    shipped = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            F.greatest(
                F.lit(0),
                F.datediff(
                    F.col("first_ship").cast("date"),
                    F.col("o_orderdate").cast("date"),
                ),
            ).alias("t"),
            F.lit(1).alias("ev"),
        )
    )
    horizon = li.agg(F.max("l_shipdate").alias("h"))
    censored = (
        orders.join(
            li.select("l_orderkey").distinct(),
            orders.o_orderkey == F.col("l_orderkey"),
            "left_anti",
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            F.greatest(
                F.lit(0),
                F.datediff(
                    F.col("h").cast("date"),
                    F.col("o_orderdate").cast("date"),
                ),
            ).alias("t"),
            F.lit(0).alias("ev"),
        )
    )
    per_t = (
        shipped.unionAll(censored)
        .groupBy("t")
        .agg(F.sum("ev").alias("d"), F.sum(1 - F.col("ev")).alias("c"))
    )
    w_suffix = (
        W.orderBy(F.col("t").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    risk = per_t.select(
        "t",
        "d",
        F.sum(F.col("d") + F.col("c")).over(w_suffix).alias("n_at_risk"),
    )
    return risk.filter(F.col("d") > 0).select(
        F.col("t").cast("long").alias("latency_days"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("n_shipped"),
        F.expr(
            "CAST(CAST(d AS DECIMAL(38,0)) * 1000000 div n_at_risk"
            " AS BIGINT)"
        ).alias("hazard_q6"),
    )


TRIM_DENOM = 20  # drop n div 20 (5%) from each tail


@register(
    "orders_trimmed_mean_by_priority",
    oracle=f"""
    WITH census AS (
      SELECT o_orderpriority AS pr,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             COUNT(*) AS cnt
      FROM orders GROUP BY 1, 2
    ), walk AS (
      SELECT pr, cents, cnt,
             SUM(cnt) OVER (PARTITION BY pr ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY pr) AS n
      FROM census
    ), cuts AS (
      SELECT pr, cents, cnt, cum, n,
             n // {TRIM_DENOM} AS lo_k,
             n - n // {TRIM_DENOM} AS hi_k,
             cum - cnt AS cum_before
      FROM walk
    ), kept AS (
      -- per bucket, how many of its cnt copies survive both cuts:
      -- overlap of [cum_before+1, cum] with [lo_k+1, hi_k]
      SELECT pr, n, lo_k, hi_k,
             GREATEST(0, LEAST(cum, hi_k)
                         - GREATEST(cum_before, lo_k)) AS keep_cnt,
             cents
      FROM cuts
    )
    SELECT pr AS o_orderpriority,
           CAST(n AS BIGINT) AS n_orders,
           CAST(n - 2 * lo_k AS BIGINT) AS n_kept,
           CAST(SUM(CAST(keep_cnt AS HUGEINT) * cents) * 1000000
                // (n - 2 * lo_k) AS BIGINT) AS trimmed_mean_cents_q6
    FROM kept
    GROUP BY pr, n, lo_k
    """,
)
def orders_trimmed_mean_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact 5%-trimmed mean per priority — the robust center that a
    handful of mega-orders can't drag, computed WITHOUT any
    per-group row sort: the per-(group, cents) VALUE CENSUS is the
    unit of work, each census bucket intersects its rank interval
    ``[cum−cnt+1, cum]`` with the keep window ``[n/20+1, n−n/20]``,
    and the surviving copies weight the exact integer sum. Rank-cut
    trimming over a census is the two-pass restatement that survives
    skewed groups (a group's window runs over its DISTINCT values,
    not its rows — the budget-trim/histogram-cube argument).

    All-integer: cents quantization, integer rank arithmetic,
    HUGEINT/DECIMAL(38,0)-widened weighted sum, q6 mean by integer
    division. Ties at the cut boundary resolve by count arithmetic
    (buckets are value-aggregated), identically in both engines.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    census = orders.groupBy(
        F.col("o_orderpriority").alias("pr"),
        F.expr(
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
        ).alias("cents"),
    ).agg(F.count("*").alias("cnt"))
    w_pr = W.partitionBy("pr")
    walk = census.select(
        "pr",
        "cents",
        "cnt",
        F.sum("cnt")
        .over(w_pr.orderBy("cents").rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt").over(w_pr).alias("n"),
    )
    cuts = walk.select(
        "pr",
        "cents",
        "cnt",
        "cum",
        "n",
        F.expr(f"n div {TRIM_DENOM}").alias("lo_k"),
        F.expr(f"n - n div {TRIM_DENOM}").alias("hi_k"),
        (F.col("cum") - F.col("cnt")).alias("cum_before"),
    )
    kept = cuts.select(
        "pr",
        "n",
        "lo_k",
        "cents",
        F.greatest(
            F.lit(0),
            F.least(F.col("cum"), F.col("hi_k"))
            - F.greatest(F.col("cum_before"), F.col("lo_k")),
        ).alias("keep_cnt"),
    )
    return kept.groupBy("pr", "n", "lo_k").agg(
        F.expr(
            f"CAST(SUM(CAST(keep_cnt AS DECIMAL(38,0)) * cents)"
            f" * 1000000 div (n - 2 * lo_k) AS BIGINT)"
        ).alias("trimmed_mean_cents_q6")
    ).select(
        F.col("pr").alias("o_orderpriority"),
        F.col("n").cast("long").alias("n_orders"),
        F.expr("CAST(n - 2 * lo_k AS BIGINT)").alias("n_kept"),
        "trimmed_mean_cents_q6",
    )


@register(
    "part_brand_type_chi2",
    oracle="""
    WITH o AS (
      SELECT p_brand, p_type, COUNT(*) AS obs FROM part GROUP BY 1, 2
    ), r AS (
      SELECT p_brand, SUM(obs) AS rn FROM o GROUP BY 1
    ), c AS (
      SELECT p_type, SUM(obs) AS cn FROM o GROUP BY 1
    ), n AS (
      SELECT SUM(obs) AS n FROM o
    )
    SELECT CAST(n.n AS BIGINT) AS n_parts,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           -- chi² scaled by n, exact: Σ (O·n − r·c)² / (r·c·n) with
           -- every term an integer division of widened products
           CAST(SUM(
             (CAST(o.obs AS HUGEINT) * n.n - CAST(r.rn AS HUGEINT) * c.cn)
             * (CAST(o.obs AS HUGEINT) * n.n - CAST(r.rn AS HUGEINT) * c.cn)
             // (CAST(r.rn AS HUGEINT) * c.cn * n.n)
           ) AS BIGINT) AS chi2_scaled
    FROM o JOIN r USING (p_brand) JOIN c USING (p_type) CROSS JOIN n
    GROUP BY n.n
    """,
)
def part_brand_type_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-independence screen: Pearson's chi² between brand
    and type over the part dimension — the EDA question "does brand
    determine product type?" answered exactly. Only OBSERVED cells
    enter the sum (absent combinations contribute E, not (O−E)²/E —
    the standard sparse-contingency shortcut is NOT taken; instead
    the scaled identity ``Σ(O·n − r·c)²/(r·c·n)`` over observed
    cells EQUALS n·χ² minus the absent-cell expectations, a
    deterministic statistic both engines compute identically —
    what matters for the gate is exactness, and for the analyst the
    ranking, which this preserves).

    All-integer: counts only, widened HUGEINT/DECIMAL(38,0)
    products, per-term truncating division. Plan: one (brand, type)
    aggregate, two marginal rollups broadcast back, a one-row total.
    """
    apply_engine_conf(spark)
    part = table(spark, sf_dir, "part")
    o = part.groupBy("p_brand", "p_type").agg(F.count("*").alias("obs"))
    r = o.groupBy("p_brand").agg(F.sum("obs").alias("rn"))
    c = o.groupBy("p_type").agg(F.sum("obs").alias("cn"))
    n = o.agg(F.sum("obs").alias("n"))
    return (
        o.join(F.broadcast(r), "p_brand")
        .join(F.broadcast(c), "p_type")
        .crossJoin(F.broadcast(n))
        .groupBy("n")
        .agg(
            F.count("*").alias("n_cells"),
            F.sum(
                F.expr(
                    "(CAST(obs AS DECIMAL(38,0)) * n"
                    " - CAST(rn AS DECIMAL(38,0)) * cn)"
                    " * (CAST(obs AS DECIMAL(38,0)) * n"
                    " - CAST(rn AS DECIMAL(38,0)) * cn)"
                    " div (CAST(rn AS DECIMAL(38,0)) * cn * n)"
                )
            )
            .cast("long")
            .alias("chi2_scaled"),
        )
        .select(
            F.col("n").cast("long").alias("n_parts"),
            F.col("n_cells").cast("long").alias("n_cells"),
            "chi2_scaled",
        )
    )


AUTOCORR_LAG = 7  # weekly periodicity probe over the daily series


@register(
    "events_weekly_autocorr",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             COUNT(*) AS x
      FROM events GROUP BY 1
    ), tot AS (
      SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS t FROM daily
    ), dev AS (
      SELECT day,
             CAST(tot.n AS HUGEINT) * x - tot.t AS d,
             LEAD(CAST(tot.n AS HUGEINT) * x - tot.t, {AUTOCORR_LAG})
               OVER (ORDER BY day) AS d_lead
      FROM daily, tot
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n_days,
           CAST(SUM(d * d_lead) FILTER (WHERE d_lead IS NOT NULL)
                * 1000000 // SUM(d * d) AS BIGINT) AS autocorr_lag7_q6
    FROM dev
    """,
)
def events_weekly_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-periodicity probe: the lag-{AUTOCORR_LAG}
    autocorrelation of the daily event-count series — near 1e6 means
    strong day-of-week structure (schedule batch jobs and staffing by
    it), near 0 means the series is aperiodic.

    Exact-integer trick: the mean-centered deviation ``x_t − μ``
    scaled by n is ``n·x_t − T`` — an integer — so both the lag
    product sum and the variance sum are exact widened-integer
    aggregates and the q6 ratio is one integer division (the n²
    scaling cancels). No float ever accumulates; the CUSUM recipe
    applied to autocorrelation.

    Plan: one day-keyed aggregate; the lag window and both sums run
    over the calendar-sized daily frame.
    """
    apply_engine_conf(spark)
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("x")
    )
    tot = daily.agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("t"),
    )
    w_day = W.orderBy("day")
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        (
            F.col("n").cast("decimal(38,0)") * F.col("x") - F.col("t")
        ).alias("d"),
    )
    dev = dev.select(
        "day",
        "d",
        F.lead("d", AUTOCORR_LAG).over(w_day).alias("d_lead"),
    )
    # global fold + crossJoin tot (not a groupBy on the constant n):
    # the summary row must survive an EMPTY daily frame — a groupBy
    # over zero rows emits nothing, while the oracle's scalar
    # subquery always yields its (n_days=0, NULL) row
    sums = dev.agg(
        F.expr(
            "SUM(CASE WHEN d_lead IS NOT NULL THEN d * d_lead END)"
        ).alias("num"),
        F.expr("SUM(d * d)").alias("den"),
    )
    return sums.crossJoin(F.broadcast(tot)).select(
        F.col("n").cast("long").alias("n_days"),
        F.expr(
            "CAST(num * 1000000 div den AS BIGINT)"
        ).alias("autocorr_lag7_q6"),
    )


@register(
    "customer_revenue_gini",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS x
      FROM orders GROUP BY 1
    ), census AS (
      SELECT x, COUNT(*) AS cnt FROM per GROUP BY x
    ), walk AS (
      SELECT x, cnt,
             SUM(cnt) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS n,
             SUM(CAST(x AS HUGEINT) * cnt) OVER () AS t
      FROM census
    ), s AS (
      -- Σ 2·rank·x over a tie bucket: ranks are cum−cnt+1 … cum, so
      -- 2·Σrank = cnt·(cum + cum−cnt+1); ×x stays integral
      SELECT n, t,
             SUM(CAST(x AS HUGEINT) * cnt * (2 * cum - cnt + 1))
               AS two_rank_x
      FROM walk GROUP BY n, t
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(t AS DECIMAL(38,0)) AS total_cents,
           CAST((two_rank_x * 1000000 // (CAST(n AS HUGEINT) * t))
                - (CAST(n AS HUGEINT) + 1) * 1000000 // n
                AS BIGINT) AS gini_q6
    FROM s
    """,
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini coefficient over customers — the
    single number behind the Lorenz curve (0 = perfectly even, →1e6 =
    one whale), complementing `orders_pareto_concentration`'s top-k
    cuts with the standard inequality index.

    Sort-free census formulation: Gini needs ranks of sorted
    revenues, but ranks of a TIE BUCKET are a contiguous integer run,
    so ``Σ 2·rank·x`` folds out of the (value, count) census as
    ``Σ x·cnt·(2·cum − cnt + 1)`` — exact integers end to end
    (the trimmed-mean census argument applied to Lorenz ranks), and
    ``G = Σ2·rank·x/(n·T) − (n+1)/n`` becomes two integer divisions.
    The window runs over DISTINCT revenue values, not customers.

    Plan: one custkey aggregate, one value census, one ordered walk
    over the value domain, a one-row fold.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.sum(
            F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).alias("x")
    )
    census = per.groupBy("x").agg(F.count("*").alias("cnt"))
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    w_ord = W.orderBy("x").rowsBetween(W.unboundedPreceding, 0)
    walk = census.select(
        "x",
        "cnt",
        F.sum("cnt").over(w_ord).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("cnt"))
        .over(w_all)
        .alias("t"),
    )
    s = walk.groupBy("n", "t").agg(
        F.sum(
            F.col("x").cast("decimal(38,0)")
            * F.col("cnt")
            * (2 * F.col("cum") - F.col("cnt") + 1)
        ).alias("two_rank_x")
    )
    return s.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("t").cast("decimal(38,0)").alias("total_cents"),
        F.expr(
            "CAST((two_rank_x * 1000000"
            " div (CAST(n AS DECIMAL(38,0)) * t))"
            " - (CAST(n AS DECIMAL(38,0)) + 1) * 1000000 div n"
            " AS BIGINT)"
        ).alias("gini_q6"),
    )


# ---- incremental view maintenance: JOIN delta decomposition ----------
# Deterministic change batch carved out of the static corpus: orders
# with orderkey % 17 == 0 and customers with custkey % 13 == 0 play
# the deltas; the rest is the standing materialization.
IVM_ORDER_MOD = 17
IVM_CUST_MOD = 13


@register(
    "orders_join_ivm_delta",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS segment,
             (o.o_orderkey % {IVM_ORDER_MOD} = 0) AS d_o,
             (c.c_custkey % {IVM_CUST_MOD} = 0) AS d_c,
             CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT segment,
           CAST(SUM(CASE WHEN NOT d_o AND NOT d_c THEN 1 ELSE 0 END)
                AS BIGINT) AS base_pairs,
           CAST(SUM(CASE WHEN d_o OR d_c THEN 1 ELSE 0 END)
                AS BIGINT) AS delta_pairs,
           CAST(COUNT(*) AS BIGINT) AS total_pairs,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM j GROUP BY segment
    """,
)
def orders_join_ivm_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN materialization: with
    a change batch ΔO against orders and ΔC against customer, the
    maintained view obeys the bilinear identity

        (O∪ΔO) ⋈ (C∪ΔC) = O⋈C  ∪  O⋈ΔC  ∪  ΔO⋈C  ∪  ΔO⋈ΔC

    so a refresh touches only the three delta terms — never the
    standing O⋈C materialization. The engine COMPUTES the per-segment
    rollup through that four-term decomposition (four joins unioned,
    then one aggregate); the oracle computes the SAME rollup from the
    monolithic full join. Hash equality is a numeric proof of the
    maintenance identity — the two sides never share an algorithm.

    At 100 TB the three delta joins are delta-sized on at least one
    side: ΔC (customers touched this batch) broadcasts everywhere it
    appears, and ΔO⋈C is the only fact-sized probe. The base term
    exists here only to reconstitute the total for the proof; a real
    deployment reads it from the materialization. Change membership
    is a deterministic keyspace carve (orderkey/custkey modulo), so
    both engines agree on the batch without a shared clock.

    Plan: orders scanned once per O-side term with the delta
    predicate pushed to parquet; customer delta side broadcast; one
    hash aggregate over the union.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    d_o = F.col("o_orderkey") % IVM_ORDER_MOD == 0
    d_c = F.col("c_custkey") % IVM_CUST_MOD == 0
    o_base, o_delta = orders.filter(~d_o), orders.filter(d_o)
    c_base, c_delta = cust.filter(~d_c), cust.filter(d_c)

    def term(o_side: DataFrame, c_side: DataFrame, is_base: bool,
             broadcast_c: bool = False):
        # only the ΔC side gets the broadcast HINT (delta-sized by
        # construction at any corpus scale); the full-customer sides
        # are left to Catalyst/AQE, which broadcasts them at test SF
        # and shuffles them when the dimension outgrows the threshold
        c = F.broadcast(c_side) if broadcast_c else c_side
        return o_side.join(
            c, o_side.o_custkey == c_side.c_custkey
        ).select(
            F.col("c_mktsegment").alias("segment"),
            "cents",
            F.lit(is_base).alias("is_base"),
        )

    unioned = (
        term(o_base, c_base, True)          # standing materialization
        .unionByName(term(o_base, c_delta, False, True))   # O ⋈ ΔC
        .unionByName(term(o_delta, c_base, False))         # ΔO ⋈ C
        .unionByName(term(o_delta, c_delta, False, True))  # ΔO ⋈ ΔC
    )
    return unioned.groupBy("segment").agg(
        F.sum(F.when(F.col("is_base"), 1).otherwise(0))
        .cast("long")
        .alias("base_pairs"),
        F.sum(F.when(F.col("is_base"), 0).otherwise(1))
        .cast("long")
        .alias("delta_pairs"),
        F.count("*").cast("long").alias("total_pairs"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


# ---- fixed-basket price indices --------------------------------------
PRICE_INDEX_BASE_YEAR = 1995
PRICE_INDEX_CURR_YEAR = 2001


@register(
    "lineitem_price_index_basket",
    oracle=f"""
    WITH per_part AS (
      SELECT l_partkey,
             SUM(CASE WHEN year(l_shipdate) = {PRICE_INDEX_BASE_YEAR}
                 THEN CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                 ELSE 0 END) AS p0_cents,
             SUM(CASE WHEN year(l_shipdate) = {PRICE_INDEX_BASE_YEAR}
                 THEN CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                 ELSE 0 END) AS q0,
             SUM(CASE WHEN year(l_shipdate) = {PRICE_INDEX_CURR_YEAR}
                 THEN CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                 ELSE 0 END) AS p1_cents,
             SUM(CASE WHEN year(l_shipdate) = {PRICE_INDEX_CURR_YEAR}
                 THEN CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                 ELSE 0 END) AS q1
      FROM lineitem
      WHERE year(l_shipdate) IN ({PRICE_INDEX_BASE_YEAR},
                                 {PRICE_INDEX_CURR_YEAR})
      GROUP BY 1
    ), matched AS (
      SELECT l_partkey,
             p0_cents * 1000000 // q0 AS p0u,
             p1_cents * 1000000 // q1 AS p1u,
             q0, q1
      FROM per_part WHERE q0 > 0 AND q1 > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_matched_parts,
           CAST(SUM(CAST(p1u AS HUGEINT) * q0) * 1000000
                // SUM(CAST(p0u AS HUGEINT) * q0) AS BIGINT)
             AS laspeyres_q6,
           CAST(SUM(CAST(p1u AS HUGEINT) * q1) * 1000000
                // SUM(CAST(p0u AS HUGEINT) * q1) AS BIGINT)
             AS paasche_q6
    FROM matched
    """,
)
def lineitem_price_index_basket(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matched-model fixed-basket price indices between a base and a
    current year: Laspeyres (base-period quantity weights — "what
    would the old basket cost now") and Paasche (current weights) —
    the standard pair bracketing true inflation, computed over parts
    sold in BOTH periods. Per-part unit prices are exact integer
    micro-cents (``p_cents·1e6 div q`` — whole-unit TPC-H quantities
    make q an exact integer), and both index numerators/denominators
    widen to DECIMAL(38,0)/HUGEINT before the product-sum (BIGINT
    overflows past ~1e5 parts × large weights — the gini/hhi recipe).

    Scale: the year filter is pushed to the parquet scan; ONE hash
    aggregate with conditional sums builds both periods in a single
    pass over the fact (no per-period scan, no self-join — the
    classic two-CTE formulation reads lineitem twice); everything
    after is part-count-sized. One shuffle total.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    y0, y1 = PRICE_INDEX_BASE_YEAR, PRICE_INDEX_CURR_YEAR
    cents = "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
    qty = "CAST(FLOOR(l_quantity + 0.5) AS BIGINT)"
    per_part = (
        li.filter(F.expr(f"year(l_shipdate) IN ({y0}, {y1})"))
        .groupBy("l_partkey")
        .agg(
            F.expr(
                f"SUM(CASE WHEN year(l_shipdate) = {y0}"
                f" THEN {cents} ELSE 0 END)"
            ).alias("p0_cents"),
            F.expr(
                f"SUM(CASE WHEN year(l_shipdate) = {y0}"
                f" THEN {qty} ELSE 0 END)"
            ).alias("q0"),
            F.expr(
                f"SUM(CASE WHEN year(l_shipdate) = {y1}"
                f" THEN {cents} ELSE 0 END)"
            ).alias("p1_cents"),
            F.expr(
                f"SUM(CASE WHEN year(l_shipdate) = {y1}"
                f" THEN {qty} ELSE 0 END)"
            ).alias("q1"),
        )
    )
    matched = per_part.filter("q0 > 0 AND q1 > 0").select(
        F.expr("p0_cents * 1000000 div q0").alias("p0u"),
        F.expr("p1_cents * 1000000 div q1").alias("p1u"),
        "q0",
        "q1",
    )
    return matched.agg(
        F.count("*").cast("long").alias("n_matched_parts"),
        F.expr(
            "CAST(SUM(CAST(p1u AS DECIMAL(38,0)) * q0) * 1000000"
            " div SUM(CAST(p0u AS DECIMAL(38,0)) * q0) AS BIGINT)"
        ).alias("laspeyres_q6"),
        F.expr(
            "CAST(SUM(CAST(p1u AS DECIMAL(38,0)) * q1) * 1000000"
            " div SUM(CAST(p0u AS DECIMAL(38,0)) * q1) AS BIGINT)"
        ).alias("paasche_q6"),
    )


@register(
    "part_brand_type_cramers_v",
    oracle="""
    WITH o AS (
      SELECT p_brand, p_type, COUNT(*) AS obs FROM part GROUP BY 1, 2
    ), r AS (
      SELECT p_brand, SUM(obs) AS rn FROM o GROUP BY 1
    ), c AS (
      SELECT p_type, SUM(obs) AS cn FROM o GROUP BY 1
    ), n AS (
      SELECT SUM(obs) AS n FROM o
    ), dims AS (
      SELECT (SELECT COUNT(*) FROM r) AS n_rows_lvls,
             (SELECT COUNT(*) FROM c) AS n_col_lvls
    ), chi AS (
      SELECT n.n AS n,
             SUM(
               (CAST(o.obs AS HUGEINT) * n.n
                - CAST(r.rn AS HUGEINT) * c.cn)
               * (CAST(o.obs AS HUGEINT) * n.n
                  - CAST(r.rn AS HUGEINT) * c.cn)
               // (CAST(r.rn AS HUGEINT) * c.cn * n.n)
             ) AS chi2_scaled
      FROM o JOIN r USING (p_brand) JOIN c USING (p_type) CROSS JOIN n
      GROUP BY n.n
    )
    SELECT CAST(chi.n AS BIGINT) AS n_parts,
           CAST(d.n_rows_lvls AS BIGINT) AS n_brand_levels,
           CAST(d.n_col_lvls AS BIGINT) AS n_type_levels,
           CAST(chi.chi2_scaled AS BIGINT) AS chi2_scaled,
           CAST(CASE
             WHEN LEAST(d.n_rows_lvls, d.n_col_lvls) < 2 THEN NULL
             ELSE chi.chi2_scaled * 1000000
                  // (CAST(chi.n AS HUGEINT) * chi.n
                      * (LEAST(d.n_rows_lvls, d.n_col_lvls) - 1))
           END AS BIGINT) AS cramers_v2_q6
    FROM chi CROSS JOIN dims d
    """,
)
def part_brand_type_cramers_v(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cramér's V (squared, exact q6) for the brand×type association
    — the EFFECT SIZE the chi² screen
    (:func:`part_brand_type_chi2`) lacks: chi² grows with n, so only
    ``V² = χ²/(n·min(r−1, c−1)) ∈ [0, 1]`` says whether an
    association is material. Reported squared to stay in exact
    integer arithmetic (sqrt of a q6 integer is irrational; the
    ordering and thresholds analysts use survive squaring).

    Same observed-cell scaled identity as the chi² screen
    (``chi2_scaled = n·χ²`` over observed cells), so
    ``V²_q6 = chi2_scaled·1e6 div (n²·(min(r,c)−1))`` — all widened
    integer products; NULL below a 2×2 table (V undefined).

    Plan: identical cost to the chi² screen — one (brand, type)
    aggregate, marginal rollups broadcast back, level counts from
    the SAME marginal frames (no extra corpus pass).
    """
    apply_engine_conf(spark)
    part = table(spark, sf_dir, "part")
    o = part.groupBy("p_brand", "p_type").agg(F.count("*").alias("obs"))
    r = o.groupBy("p_brand").agg(F.sum("obs").alias("rn"))
    c = o.groupBy("p_type").agg(F.sum("obs").alias("cn"))
    n = o.agg(F.sum("obs").alias("n"))
    dims = r.agg(F.count("*").alias("n_rows_lvls")).crossJoin(
        c.agg(F.count("*").alias("n_col_lvls"))
    )
    term = (
        "(CAST(obs AS DECIMAL(38,0)) * n - CAST(rn AS DECIMAL(38,0)) * cn)"
        " * (CAST(obs AS DECIMAL(38,0)) * n"
        "    - CAST(rn AS DECIMAL(38,0)) * cn)"
        " div (CAST(rn AS DECIMAL(38,0)) * cn * n)"
    )
    chi = (
        o.join(r, "p_brand")
        .join(c, "p_type")
        .crossJoin(F.broadcast(n))
        .groupBy("n")
        .agg(F.expr(f"SUM({term})").alias("chi2_scaled"))
    )
    return chi.crossJoin(F.broadcast(dims)).select(
        F.col("n").cast("long").alias("n_parts"),
        F.col("n_rows_lvls").cast("long").alias("n_brand_levels"),
        F.col("n_col_lvls").cast("long").alias("n_type_levels"),
        F.col("chi2_scaled").cast("long").alias("chi2_scaled"),
        F.expr(
            "CAST(CASE WHEN LEAST(n_rows_lvls, n_col_lvls) < 2"
            " THEN NULL ELSE chi2_scaled * 1000000"
            " div (CAST(n AS DECIMAL(38,0)) * n"
            "      * (LEAST(n_rows_lvls, n_col_lvls) - 1))"
            " END AS BIGINT)"
        ).alias("cramers_v2_q6"),
    )


@register(
    "star_referential_integrity_audit",
    oracle="""
    WITH o AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
               AS n_distinct_orderkeys,
             CAST(SUM(CASE WHEN o_orderkey IS NULL
                      THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_orderkeys,
             CAST(SUM(CASE WHEN o_custkey IS NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_null_custkeys
      FROM orders
    ), orphan_o AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan_orders
      FROM orders t WHERE t.o_custkey IS NOT NULL AND NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = t.o_custkey)
    ), l AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems FROM lineitem
    ), orphan_l AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan_lineitems
      FROM lineitem t WHERE t.l_orderkey IS NOT NULL AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_orderkey = t.l_orderkey)
    )
    SELECT o.n_orders, o.n_distinct_orderkeys,
           o.n_orders - o.n_distinct_orderkeys
             - o.n_null_orderkeys AS n_dup_orderkeys,
           o.n_null_orderkeys, o.n_null_custkeys,
           oo.n_orphan_orders, l.n_lineitems, ol.n_orphan_lineitems
    FROM o, orphan_o oo, l, orphan_l ol
    """,
)
def star_referential_integrity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-row referential-integrity audit of the fact spine — the
    ingest gate every warehouse load runs before queries are allowed
    to trust joins: primary-key duplication and NULLs on orders, and
    FK orphan counts along both star edges (orders→customer,
    lineitem→orders). All-zero orphan/dup columns on healthy data is
    the point: the audit asserts it instead of assuming it.

    Plan: two key-pruned aggregates plus two LEFT ANTI joins (each
    keyed on the FK, the dimension side broadcast when small, and
    only a COUNT leaves the join) — at 100 TB the audit costs two
    narrow fact scans; nothing is collected, nothing re-shuffles the
    facts twice. DISTINCT on a single key avoids the multi-distinct
    Expand (each distinct count lives in its own pass).
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    lineitem = table(spark, sf_dir, "lineitem")
    o = orders.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.countDistinct("o_orderkey")
        .cast("long")
        .alias("n_distinct_orderkeys"),
        F.sum(
            F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_null_orderkeys"),
        F.sum(
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_null_custkeys"),
    )
    orphan_o = (
        orders.filter(F.col("o_custkey").isNotNull())
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count("*").cast("long").alias("n_orphan_orders"))
    )
    li = lineitem.agg(
        F.count("*").cast("long").alias("n_lineitems")
    )
    orphan_l = (
        lineitem.filter(F.col("l_orderkey").isNotNull())
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count("*").cast("long").alias("n_orphan_lineitems"))
    )
    return (
        o.crossJoin(F.broadcast(orphan_o))
        .crossJoin(F.broadcast(li))
        .crossJoin(F.broadcast(orphan_l))
        .selectExpr(
            "n_orders",
            "n_distinct_orderkeys",
            "n_orders - n_distinct_orderkeys - n_null_orderkeys"
            " AS n_dup_orderkeys",
            "n_null_orderkeys",
            "n_null_custkeys",
            "n_orphan_orders",
            "n_lineitems",
            "n_orphan_lineitems",
        )
    )


@register(
    "customer_cohort_ltv_curve",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             year(o_orderdate) * 100 + month(o_orderdate) AS ym,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), coh AS (
      SELECT o_custkey, MIN(ym) AS cohort_ym FROM base GROUP BY 1
    ), j AS (
      SELECT b.o_custkey, c.cohort_ym,
             (b.ym // 100 * 12 + b.ym % 100)
             - (c.cohort_ym // 100 * 12 + c.cohort_ym % 100)
               AS age_months,
             b.cents
      FROM base b JOIN coh c USING (o_custkey)
    ), g AS (
      SELECT cohort_ym, age_months,
             COUNT(DISTINCT o_custkey) AS n_active,
             SUM(cents) AS revenue_cents
      FROM j GROUP BY 1, 2
    )
    SELECT CAST(cohort_ym AS BIGINT) AS cohort_ym,
           CAST(age_months AS BIGINT) AS age_months,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(revenue_cents AS BIGINT) AS revenue_cents,
           CAST(SUM(revenue_cents) OVER (
             PARTITION BY cohort_ym ORDER BY age_months
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents
    FROM g
    """,
)
def customer_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve — the revenue twin of
    ``events_retention_cohort``: customers cohorted by first-order
    month, then per (cohort, age-in-months) the active-customer count,
    the month's revenue, and the cohort's CUMULATIVE revenue — the
    curve an LTV model is fit to. Integer end-to-end: months as
    yyyymm ints (no date-type parity risk), money as FLOOR(·100+0.5)
    cents (the cross-engine rounding invariant).

    Plan: cohort assignment is one groupBy(custkey) min joined back on
    the same key (co-partitioned — AQE plans the second stage without
    a new exchange); the (cohort, age) aggregate is bounded by
    calendar² cells; the cumulative window walks each cohort's ≤
    calendar-length frame. Nothing here scales with row count past
    the two custkey-keyed passes.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    base = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    coh = base.groupBy("o_custkey").agg(F.min("ym").alias("cohort_ym"))
    j = base.join(coh, "o_custkey").select(
        "o_custkey",
        "cohort_ym",
        F.expr(
            "(ym div 100) * 12 + ym % 100"
            " - ((cohort_ym div 100) * 12 + cohort_ym % 100)"
        ).alias("age_months"),
        "cents",
    )
    g = j.groupBy("cohort_ym", "age_months").agg(
        F.count_distinct("o_custkey").alias("n_active"),
        F.sum("cents").alias("revenue_cents"),
    )
    w = (
        W.partitionBy("cohort_ym")
        .orderBy("age_months")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return g.select(
        F.col("cohort_ym").cast("long"),
        F.col("age_months").cast("long"),
        F.col("n_active").cast("long"),
        F.col("revenue_cents").cast("long"),
        F.sum("revenue_cents").over(w).cast("long").alias(
            "cum_revenue_cents"
        ),
    )


# Candidate bucket counts for the physical-design advisor: one shard
# per leading md5 hex digit (16) and per two digits (256) — string
# prefixes keep the bucket key portable across engines (no hex->int
# parsing divergence risk).
BUCKET_ADVISOR_PREFIXES = (1, 2)


@register(
    "lineitem_bucket_advisor",
    oracle="""
    WITH fine AS (
      SELECT substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) AS b2,
             COUNT(*) AS n
      FROM lineitem GROUP BY b2
    ), levels AS (
      SELECT 16 AS n_buckets, substr(b2, 1, 1) AS bucket, SUM(n) AS n
      FROM fine GROUP BY 2
      UNION ALL
      SELECT 256, b2, n FROM fine
    ), tot AS (SELECT COALESCE(SUM(n), 0) AS total FROM fine)
    SELECT CAST(l.n_buckets AS BIGINT) AS n_buckets,
           CAST(COUNT(*) AS BIGINT) AS n_nonempty,
           CAST(MAX(l.n) AS BIGINT) AS max_bucket_rows,
           CAST(MIN(l.n) AS BIGINT) AS min_bucket_rows,
           -- skew = max bucket load vs the uniform ideal, q6
           -- (HUGEINT-widened; 1e6 = perfectly uniform)
           CAST(CAST(MAX(l.n) AS HUGEINT) * 1000000 * l.n_buckets
                // MAX(t.total) AS BIGINT) AS max_load_q6
    FROM levels l, tot t
    GROUP BY l.n_buckets
    """,
)
def lineitem_bucket_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHYSICAL-DESIGN advisor for bucketed tables: before paying for
    ``df.write.bucketBy(n, "l_orderkey")`` — the layout that makes
    every subsequent orders⋈lineitem join shuffle-free — this row
    prices the candidate bucket counts on the REAL key distribution:
    non-empty buckets, min/max bucket loads, and ``max_load_q6``
    (largest bucket vs the uniform ideal; 1e6 = perfectly uniform).
    A key whose max_load_q6 explodes at every width is a skewed join
    key that bucketing cannot fix (salt it instead); a flat curve
    says pick the width matching executor memory. The md5-prefix
    bucket key is the portable stand-in for Spark's bucketing hash —
    the DISTRIBUTION verdict (uniform vs skewed) is hash-invariant.

    Plan: ONE corpus shuffle to the FINEST level (256 groups,
    map-side combined — at 100 TB this is a full-scan count, the
    cheapest statement of the question), then the coarser level
    derives by PREFIX ROLLUP of the 256-row frame — never a second
    scan; the totals fold back as a broadcast scalar.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    fine = (
        li.select(
            F.substring(
                F.md5(F.col("l_orderkey").cast("string")), 1, 2
            ).alias("b2")
        )
        .groupBy("b2")
        .agg(F.count("*").alias("n"))
        # 256-row frame: materialize once for both levels + the total
        .localCheckpoint(eager=True)
    )
    coarse = fine.groupBy(
        F.substring(F.col("b2"), 1, 1).alias("bucket")
    ).agg(F.sum("n").alias("n"))
    levels = coarse.select(
        F.lit(16).alias("n_buckets"), "n"
    ).unionByName(fine.select(F.lit(256).alias("n_buckets"), "n"))
    tot = fine.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("total"))
    return (
        levels.crossJoin(F.broadcast(tot))
        .groupBy("n_buckets")
        .agg(
            F.count("*").cast("long").alias("n_nonempty"),
            F.max("n").cast("long").alias("max_bucket_rows"),
            F.min("n").cast("long").alias("min_bucket_rows"),
            F.expr(
                "CAST(CAST(MAX(n) AS DECIMAL(38,0)) * 1000000"
                " * n_buckets div MAX(total) AS BIGINT)"
            ).alias("max_load_q6"),
        )
        .select(
            F.col("n_buckets").cast("long").alias("n_buckets"),
            "n_nonempty",
            "max_bucket_rows",
            "min_bucket_rows",
            "max_load_q6",
        )
    )


@register(
    "lineitem_join_order_advisor",
    oracle="""
    WITH nc AS (SELECT COUNT(*) AS n FROM customer),
    no AS (SELECT COUNT(*) AS n FROM orders),
    fc AS (
      SELECT COUNT(*) AS n FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ), fo AS (
      SELECT COUNT(*) AS n FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ), fl AS (
      SELECT COUNT(*) AS n FROM lineitem
      WHERE l_shipdate > TIMESTAMP '1998-01-01'
    ), j1 AS (
      SELECT COUNT(*) AS n
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    ), j2 AS (
      SELECT COUNT(*) AS n
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
        AND l.l_shipdate > TIMESTAMP '1998-01-01'
    ), u AS (
      SELECT 'customer_join_orders' AS step,
             CAST(fo.n * fc.n // NULLIF(nc.n, 0) AS BIGINT) AS est_rows,
             CAST(j1.n AS BIGINT) AS actual_rows
      FROM fo, fc, nc, j1
      UNION ALL
      SELECT 'plus_lineitem',
             CAST(fl.n::HUGEINT * j1.n // NULLIF(no.n, 0) AS BIGINT),
             CAST(j2.n AS BIGINT)
      FROM fl, j1, no, j2
    )
    SELECT step, est_rows, actual_rows,
           CAST(est_rows * 1000000 // NULLIF(actual_rows, 0) AS BIGINT)
             AS est_over_actual_q6
    FROM u
    """,
)
def lineitem_join_order_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cardinality-estimation audit for the Q3 join pipeline — the
    fifth physical-design advisor (buckets, z-order, encodings,
    zone maps, now JOIN CARDINALITIES): at each join step it compares
    the textbook independence/FK-uniformity ESTIMATE (next estimate =
    |σ(probe)| · selectivity(build side): ``|σo|·|σc| div |customer|``
    then ``|σl|·|c⋈o| div |orders|``) against the ACTUAL exact count,
    reporting the q6 over/under-estimation ratio — the number a
    cost-based optimizer's misestimation audit reads, and the
    empirical check on whether the broadcast-then-shuffle order the
    frozen q3 row pins is actually right at this data's correlation
    structure. Exact integers throughout (HUGEINT/DECIMAL-widened
    products — |σl|·|j1| passes int64 at web scale).

    100 TB shape: three pushdown-filtered counts (map-side combined),
    plus the two actual join counts the pipeline pays anyway — at
    production this runs as a side-channel of the real query (the
    counts are free observability off the same joins); nothing here
    is quadratic and every frame after the scans is one row.
    """
    apply_engine_conf(spark)
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    c_f = cust.filter(F.col("c_mktsegment") == "BUILDING")
    o_f = orders.filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l_f = li.filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    nc = cust.agg(F.count("*").alias("nc"))
    no = orders.agg(F.count("*").alias("no"))
    fc = c_f.agg(F.count("*").alias("fc"))
    fo = o_f.agg(F.count("*").alias("fo"))
    fl = l_f.agg(F.count("*").alias("fl"))
    j1df = c_f.join(
        o_f, F.col("o_custkey") == F.col("c_custkey")
    ).localCheckpoint(eager=True)
    j1 = j1df.agg(F.count("*").alias("j1"))
    j2 = (
        j1df.join(l_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(F.count("*").alias("j2"))
    )
    row1 = (
        fo.crossJoin(fc)
        .crossJoin(nc)
        .crossJoin(j1)
        .selectExpr(
            "'customer_join_orders' AS step",
            "CAST(fo * fc div NULLIF(nc, 0) AS BIGINT) AS est_rows",
            "CAST(j1 AS BIGINT) AS actual_rows",
        )
    )
    row2 = (
        fl.crossJoin(j1)
        .crossJoin(no)
        .crossJoin(j2)
        .selectExpr(
            "'plus_lineitem' AS step",
            "CAST(CAST(fl AS DECIMAL(38,0)) * j1 div NULLIF(no, 0)"
            " AS BIGINT) AS est_rows",
            "CAST(j2 AS BIGINT) AS actual_rows",
        )
    )
    return row1.unionAll(row2).selectExpr(
        "step",
        "est_rows",
        "actual_rows",
        "CAST(est_rows * 1000000 div NULLIF(actual_rows, 0) AS BIGINT)"
        " AS est_over_actual_q6",
    )


@register(
    "star_denormalize_audit",
    oracle="""
    WITH wide AS (
      SELECT l.l_quantity, l.l_extendedprice, l.l_discount,
             o.o_orderdate, o.o_orderpriority,
             c.c_mktsegment, p.p_brand, s.s_name,
             n.n_name AS cust_nation, r.r_name AS cust_region
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    SELECT cust_region,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
           CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM wide GROUP BY cust_region
    """,
)
def star_denormalize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wide-table materialization audit — the join a training
    pipeline runs to denormalize the full star (fact lineitem ⨝ fact
    orders ⨝ five dimensions) into one feature table, reduced to a
    per-region census so the row is oracle-checkable: row count,
    dimension-coverage distincts, exact revenue/quantity masses. At
    100 TB this is THE canonical plan-shape test: the fact-fact join
    (lineitem ⨝ orders on orderkey) is the only sort-merge-eligible
    edge, and EVERY dimension hop (customer, part, supplier, nation,
    region) must broadcast — a single dimension spilling to a
    shuffle join multiplies the job's exchange volume by the fact
    size. The plan test pins exactly that: ≥ 5 BroadcastHashJoins
    and at most one non-broadcast join.

    Column pruning matters as much as join strategy here: the scan
    must read only the 4+3 joined/aggregated fact columns, not the
    full 16-column lineitem — asserted via ReadSchema in the plan
    test.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    wide = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == region["r_regionkey"],
        )
    )
    rev = F.expr(
        "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
        " AS BIGINT)"
    )
    return wide.groupBy(F.col("r_name").alias("cust_region")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("c_mktsegment").cast("long").alias("n_segments"),
        F.countDistinct("p_brand").cast("long").alias("n_brands"),
        F.sum(rev).cast("long").alias("revenue_cents"),
        F.sum(F.col("l_quantity").cast("long"))
        .cast("long")
        .alias("total_qty"),
    )
