"""Decision-support query shapes completing the TPC-H-style family
(SURVEY.md §2.3-§2.7): correlated scalar subqueries, EXISTS
semi-joins with interval predicates, multi-nation trade volume,
group-vs-global HAVING, NOT IN anti-subqueries, IN-with-HAVING, and
two-level nested IN subqueries.

Each query is ONE SQL text executed verbatim on both engines (Spark
via temp views, DuckDB as the oracle) — the dialect subset used
(CTEs, correlated subqueries, INTERVAL literals, DECIMAL casts,
year()) parses identically on both. All money/quantity aggregates go
through the repo's integer canon (DECIMAL -> cents BIGINT) so the
order-insensitive value hash is exact across engines.

Spark-first notes per query are in each docstring; the plans are
audited by tests/test_plan_audit_all.py like every other batch query
(no CartesianProduct, no row-Python).

Reference parity: the reference's analytics layer is dbt SQL over a
warehouse (dbt/models/gold/*.sql); these shapes extend the same
"SQL-on-tables" surface the reference exposes to its users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hr_moderndatapipeline_spark.sources.readers import load_table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# ── Q2 shape: cheapest supplier per part (correlated scalar MIN) ──

MIN_COST_SUPPLIER_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT))
           AS min_price_cents
  FROM lineitem
  GROUP BY l_partkey, l_suppkey),
ranked AS (
  SELECT l_partkey, l_suppkey, min_price_cents,
         MIN(min_price_cents) OVER (PARTITION BY l_partkey) AS part_min_cents
  FROM cost)
SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, c.min_price_cents
FROM part p
JOIN ranked c ON c.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = c.l_suppkey
WHERE p.p_size <= 5
  AND c.min_price_cents = c.part_min_cents
ORDER BY p.p_partkey, s.s_suppkey
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small part, the supplier(s) offering
    its minimum observed price. The textbook form phrases the
    per-part minimum as a correlated scalar subquery over the cost
    CTE; Catalyst decorrelates that into a SECOND aggregate of the
    CTE — a second full lineitem scan + shuffle (measured: 2 scans,
    7 exchanges). This form gets the identical result from a window
    MIN over the already-grouped cost rows: one lineitem scan, one
    groupBy shuffle, one O(#part×supp)-row window — the plan you
    want at 100 TB. (The correlated-scalar shape itself is covered
    by orders_above_customer_avg.) Part/supplier joins broadcast."""
    _views(spark, sf_dir, "part", "supplier", "lineitem")
    return spark.sql(MIN_COST_SUPPLIER_SQL)


# ── Q4 shape: EXISTS semi-join with an interval predicate ──

PRIORITY_LATE_EXISTS_SQL = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL '90' DAY)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


def q_priority_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders (one year) with at least one line item
    shipped >90 days after the order date, counted by priority. The
    dataset has no l_commitdate/l_receiptdate, so the canonical
    "commit < receipt" predicate becomes ship-vs-order-date lag —
    same EXISTS-with-non-key-residual shape. Catalyst plans a
    LeftSemi join on l_orderkey with the interval comparison as a
    residual; the date filter on orders is pushed to the scan."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(PRIORITY_LATE_EXISTS_SQL)


# ── Q7 shape: bilateral trade volume between two nations ──

NATION_TRADE_VOLUME_SQL = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(round(CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * CAST(1 - l.l_discount AS DECIMAL(18,2)) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipped revenue between two specific nations
    (both directions), by supplier nation, customer nation, and ship
    year. Five joins, but only lineitem⋈orders is a real shuffle:
    customer/supplier/nation all qualify for broadcast, and the
    disjunctive nation filter prunes most build rows before the big
    join probes them."""
    _views(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    return spark.sql(NATION_TRADE_VOLUME_SQL)


# ── Q11 shape: groups exceeding a global-share threshold ──

IMPORTANT_PARTS_SQL = """
WITH pv AS (
  SELECT l_partkey,
         CAST(SUM(CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
                       AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem
  GROUP BY l_partkey)
SELECT l_partkey, value_cents
FROM pv
WHERE value_cents * 1500 > (SELECT SUM(value_cents) FROM pv)
ORDER BY value_cents DESC, l_partkey
"""


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds 1/1500 of
    the total — a per-group aggregate compared against an uncorrelated
    global scalar over the SAME aggregate (CTE reused twice). The
    threshold comparison is pure integer arithmetic
    (value*1500 > total) rather than a float fraction, so both
    engines agree exactly and no double→int cast (which truncates on
    Spark but rounds on DuckDB) ever happens. One shuffle for the
    groupBy; the scalar is an O(#parts) rollup of the reused CTE."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(IMPORTANT_PARTS_SQL)


# ── Q16 shape: supplier variety with a NOT IN anti-subquery ──

SUPPLIER_PART_VARIETY_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each
    surviving (brand, type, size) combination, excluding
    negative-balance suppliers via NOT IN. s_suppkey is non-null so
    NOT IN is a plain LeftAnti (broadcast — supplier is tiny);
    the part-side predicates push to the part scan before the join.
    count(DISTINCT) partial-aggregates per partition first."""
    _views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(SUPPLIER_PART_VARIETY_SQL)


# ── Q18 shape: IN-subquery with HAVING (large-volume orders) ──

LARGE_VOLUME_CUSTOMERS_SQL = """
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(round(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
         AS total_price_cents,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2)) * 100) AS BIGINT)
         AS sum_qty_e2
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey
                       HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
ORDER BY total_price_cents DESC, o.o_orderkey
"""


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers holding orders whose total quantity
    exceeds a threshold — an IN subquery that is itself a grouped
    HAVING over the fact table, then a re-join and re-aggregation of
    the survivors. Catalyst plans the IN as a LeftSemi on
    o_orderkey; at 100 TB the HAVING aggregate shuffles lineitem
    once on its natural key and the semi-join reuses that key, so
    AQE can chain the exchanges. Quantities ride the integer canon
    (qty×100 as BIGINT) for cross-engine hash equality."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(LARGE_VOLUME_CUSTOMERS_SQL)


# ── Q20 shape: two-level nested IN subqueries ──

EXCESS_QTY_SUPPLIERS_SQL = """
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
ORDER BY s.s_suppkey
"""


def q_excess_qty_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers that moved a large volume of
    'red*' parts — IN nested inside IN, each level collapsing to a
    semi-join. The inner part filter broadcasts (part is a dim);
    the grouped HAVING aggregates lineitem only for matching parts
    (filter applied before the shuffle); the outer IN is a broadcast
    semi-join into the tiny supplier table."""
    _views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(EXCESS_QTY_SUPPLIERS_SQL)


# ── LATERAL subquery: per-outer-row dependent top-k ──

REGION_TOP_NATIONS_SQL = """
SELECT r.r_name, t.n_name, t.n_supp
FROM region r,
LATERAL (
  SELECT n.n_name, COUNT(s.s_suppkey) AS n_supp
  FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name
  ORDER BY n_supp DESC, n.n_name
  LIMIT 2
) t
ORDER BY r.r_name, t.n_supp DESC, t.n_name
"""


def q_region_top_nations_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (Spark 4 `DecorrelateInnerQuery`):
    for each region, its top-2 nations by supplier count. The
    correlated LIMIT decorrelates to a ranked window over the joined
    aggregate — per-group top-k without a driver loop. All tables
    here are dims; at 100 TB the same shape against a fact inner
    query keeps the outer side broadcast."""
    _views(spark, sf_dir, "region", "nation", "supplier")
    return spark.sql(REGION_TOP_NATIONS_SQL)


# ── GROUPING SETS with GROUPING() markers ──

SEGMENT_PRIORITY_GROUPING_SETS_SQL = """
SELECT c.c_mktsegment, o.o_orderpriority,
       CAST(GROUPING(c.c_mktsegment) AS INTEGER) AS g_seg,
       CAST(GROUPING(o.o_orderpriority) AS INTEGER) AS g_pri,
       COUNT(*) AS n_orders
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY GROUPING SETS ((c.c_mktsegment, o.o_orderpriority),
                        (c.c_mktsegment), (o.o_orderpriority), ())
ORDER BY g_seg, g_pri, c.c_mktsegment, o.o_orderpriority
"""


def q_segment_priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind status_cube's
    CUBE) with GROUPING() null-vs-rollup disambiguation markers —
    one Expand + one aggregate, not four scans. The NULL a rollup
    row carries is distinguishable from a NULL group value only via
    GROUPING(); surfacing both markers makes the contract testable
    cross-engine."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(SEGMENT_PRIORITY_GROUPING_SETS_SQL)


# ── Recursive CTE: gap-filled monthly calendar spine ──

MONTHLY_ORDER_SPINE_SQL = """
WITH RECURSIVE years(y) AS (
  SELECT CAST(year(MIN(o_orderdate)) AS INTEGER) FROM orders
  UNION ALL
  SELECT y + 1 FROM years
  WHERE y < (SELECT CAST(year(MAX(o_orderdate)) AS INTEGER) FROM orders)
),
bounds AS (
  SELECT CAST(year(MIN(o_orderdate)) AS INTEGER) * 12
           + CAST(month(MIN(o_orderdate)) AS INTEGER) AS lo,
         CAST(year(MAX(o_orderdate)) AS INTEGER) * 12
           + CAST(month(MAX(o_orderdate)) AS INTEGER) AS hi
  FROM orders),
months AS (
  SELECT y AS year, m.m AS month
  FROM years CROSS JOIN (SELECT 1 AS m UNION ALL SELECT 2 UNION ALL SELECT 3
    UNION ALL SELECT 4 UNION ALL SELECT 5 UNION ALL SELECT 6
    UNION ALL SELECT 7 UNION ALL SELECT 8 UNION ALL SELECT 9
    UNION ALL SELECT 10 UNION ALL SELECT 11 UNION ALL SELECT 12) m
  WHERE y * 12 + m.m BETWEEN (SELECT lo FROM bounds) AND (SELECT hi FROM bounds)
)
SELECT months.year, months.month, CAST(COALESCE(c.n, 0) AS BIGINT) AS order_count
FROM months LEFT JOIN (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yy,
         CAST(month(o_orderdate) AS INTEGER) AS mm, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
) c ON c.yy = months.year AND c.mm = months.month
ORDER BY months.year, months.month
"""


def q_monthly_order_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 UnionLoop): a month-granular calendar
    spine from min to max order date, left-joined to per-month counts
    so empty months report 0 — the gap-filled time spine every
    reporting layer needs. Recursion runs per YEAR (~7 steps) with
    months expanded by a 12-row literal dim: each UnionLoop step is
    a full sequential Spark job, so a per-month recursion paid ~80
    job-scheduling round trips (~19s at sf0.01) for the same 80
    rows this form produces in ~7 (~3s). Depth stays bounded by the
    SCHEMA's date span, never data volume. The years×months cross
    join is a reviewed tiny-side nested-loop (≤ #years × 12 rows,
    allowlisted in tests/test_plan_audit_all.py)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(MONTHLY_ORDER_SPINE_SQL)


# ── sequence()/explode daily spine — the non-recursive scale path ──


def q_daily_order_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-granular gap-filled spine via ``sequence() + explode`` —
    the scale-correct sibling of ``monthly_order_spine``: one row of
    bounds, one generator expression, zero recursion (a recursive
    CTE here would need ~2,400 sequential iterations). The oracle
    uses DuckDB's generate_series — same relation, engine-native
    generator on each side. Spine and per-day counts join on the
    epoch-day integer; empty days report 0."""
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL '1' DAY"))).alias("d")
    ).select(F.datediff("d", F.lit("1970-01-01")).alias("epoch_day"))
    per_day = o.groupBy(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01")).alias("epoch_day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.join(per_day, "epoch_day", "left")
        .select("epoch_day", F.coalesce("n", F.lit(0)).cast("bigint").alias("order_count"))
        .orderBy("epoch_day")
    )


DAILY_ORDER_SPINE_SQL = """
WITH bounds AS (
  SELECT CAST(MIN(o_orderdate) AS DATE) AS lo, CAST(MAX(o_orderdate) AS DATE) AS hi
  FROM orders),
spine AS (
  SELECT CAST(datediff('day', DATE '1970-01-01', d) AS INTEGER) AS epoch_day
  FROM bounds, LATERAL (SELECT unnest(generate_series(lo, hi, INTERVAL '1' DAY)) AS d) g),
per_day AS (
  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
           AS epoch_day,
         COUNT(*) AS n
  FROM orders GROUP BY 1)
SELECT s.epoch_day, CAST(COALESCE(p.n, 0) AS BIGINT) AS order_count
FROM spine s LEFT JOIN per_day p ON p.epoch_day = s.epoch_day
ORDER BY s.epoch_day
"""


# ── Q6 shape: scan-only predicate revenue (pushdown showcase) ──

FORECAST_REVENUE_SQL = """
SELECT CAST(SUM(CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_discount AS DECIMAL(18,2)) * 100)
                     AS BIGINT)) AS BIGINT) AS promo_discount_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1997-01-01'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue that would be recovered by dropping a
    discount band — a pure scan-side query with NO join and NO
    groupBy key: every predicate (date range, discount band,
    quantity cap) must reach the parquet reader as a pushed filter,
    and the aggregate is a single map-side-combinable global sum.
    The simplest query in the family and the sharpest pushdown
    canary: if `.explain` ever shows these filters above the scan,
    the scan layer regressed."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(FORECAST_REVENUE_SQL)


# ── Q10 shape: returned-item revenue ranking ──

RETURNED_ITEM_CUSTOMERS_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(round(CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * CAST(1 - l.l_discount AS DECIMAL(18,2)) * 100)
                     AS BIGINT)) AS BIGINT) AS lost_revenue_cents
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY lost_revenue_cents DESC, c.c_custkey ASC
LIMIT 20
"""


def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns
    in one quarter. The date filter prunes orders at the scan, the
    returnflag filter prunes lineitem at the scan, nation broadcasts,
    and the TopK is a global sort of the already-aggregated customer
    rows (ORDER BY + LIMIT → TakeOrderedAndProject, never a full
    sort). Ties broken by custkey for a deterministic hash."""
    _views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(RETURNED_ITEM_CUSTOMERS_SQL)


# ── Q13 shape: customer order-count distribution ──

CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey) cc
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of per-customer order counts
    (how many customers placed k orders), with a residual predicate
    ON the left join so zero-order customers are KEPT and counted at
    0 — COUNT(o.o_orderkey) over the null-extended rows, not
    COUNT(*). The canonical NOT LIKE comment filter becomes a
    priority exclusion (this corpus has no o_comment); the operator
    shape — left join + residual + double aggregation — is
    preserved. Two shuffles: the join and the O(#customers)
    re-aggregation."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(CUSTOMER_ORDER_DISTRIBUTION_SQL)


# ── Q17 shape: small-quantity lines vs per-part average ──

SMALL_QTY_REVENUE_SQL = """
SELECT CAST(SUM(CAST(round(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100)
                     AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                      FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
"""


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from order lines far below their
    part's average quantity — the classic correlated scalar AVG that
    Catalyst decorrelates into an aggregate-then-join (one extra
    lineitem scan; the brand filter broadcasts part onto both). The
    0.2·avg threshold is a double derived identically on both
    engines (integer sum / count, then one multiply), so the
    comparison is bit-deterministic."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(SMALL_QTY_REVENUE_SQL)


QUERIES = {
    "forecast_revenue_change": q_forecast_revenue_change,
    "returned_item_customers": q_returned_item_customers,
    "customer_order_distribution": q_customer_order_distribution,
    "small_qty_revenue": q_small_qty_revenue,
    "min_cost_supplier": q_min_cost_supplier,
    "priority_late_exists": q_priority_late_exists,
    "nation_trade_volume": q_nation_trade_volume,
    "important_parts": q_important_parts,
    "supplier_part_variety": q_supplier_part_variety,
    "large_volume_customers": q_large_volume_customers,
    "excess_qty_suppliers": q_excess_qty_suppliers,
    "region_top_nations_lateral": q_region_top_nations_lateral,
    "segment_priority_grouping_sets": q_segment_priority_grouping_sets,
    "monthly_order_spine": q_monthly_order_spine,
    "daily_order_spine": q_daily_order_spine,
}

ORACLES = {
    "forecast_revenue_change": FORECAST_REVENUE_SQL,
    "returned_item_customers": RETURNED_ITEM_CUSTOMERS_SQL,
    "customer_order_distribution": CUSTOMER_ORDER_DISTRIBUTION_SQL,
    "small_qty_revenue": SMALL_QTY_REVENUE_SQL,
    "min_cost_supplier": MIN_COST_SUPPLIER_SQL,
    "priority_late_exists": PRIORITY_LATE_EXISTS_SQL,
    "nation_trade_volume": NATION_TRADE_VOLUME_SQL,
    "important_parts": IMPORTANT_PARTS_SQL,
    "supplier_part_variety": SUPPLIER_PART_VARIETY_SQL,
    "large_volume_customers": LARGE_VOLUME_CUSTOMERS_SQL,
    "excess_qty_suppliers": EXCESS_QTY_SUPPLIERS_SQL,
    "region_top_nations_lateral": REGION_TOP_NATIONS_SQL,
    "segment_priority_grouping_sets": SEGMENT_PRIORITY_GROUPING_SETS_SQL,
    "monthly_order_spine": MONTHLY_ORDER_SPINE_SQL,
    "daily_order_spine": DAILY_ORDER_SPINE_SQL,
}
