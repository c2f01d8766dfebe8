"""Relational operator inventory — SURVEY.md §2.3-2.9 re-expressed Spark-first.

Every construct the reference's packet corpus exercises (projections, filters,
joins of every flavor, aggregation, windows, set ops, CTEs, series generation,
string/date/math/array/conditional functions, subqueries) appears here as a
registered query with a DuckDB oracle. Where the Spark SQL dialect and DuckDB
coincide, one SQL string serves both engines; otherwise the two texts are kept
side by side.

Numeric discipline for oracle parity: money/value columns are converted to
integer cents (``CAST(ROUND(x*100) AS BIGINT)``) BEFORE aggregation so sums
are exact integers in both engines — summation order of doubles is not
deterministic under parallelism, integer sums are. Single double divisions of
exact integers are deterministic and safe.

Reference citations (what each query stands in for) are on the builders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from db_converter_spark.catalog import load_table, register_views
from db_converter_spark.registry import query

CENTS = "CAST(ROUND({col} * 100) AS BIGINT)"


def _sql(spark: SparkSession, sf_dir: str, stmt: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(stmt)


# ---------------------------------------------------------------------------
# Aggregation (SURVEY §2.5)
# ---------------------------------------------------------------------------

_Q01 = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)                  AS sum_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                                                                   AS sum_disc_cents,
  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT)
                                                                   AS sum_charge_cents,
  ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 / COUNT(*), 2)
                                                                   AS avg_price,
  CAST(COUNT(*) AS BIGINT)                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q01_pricing_summary", oracle=_Q01, tags=("agg", "filter"))
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: multi-aggregate groupBy with arithmetic
    inside aggregates (reference: CASE/agg mix, alert_bloat/01_step.sql:37-60).
    Map-side partial aggregation + 2-col shuffle key → scales linearly."""
    return _sql(spark, sf_dir, _Q01)


_Q18 = """
SELECT
  o_orderpriority,
  o_orderstatus,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY 1, 2
HAVING COUNT(*) > 10
ORDER BY 1, 2
"""


@query("q18_group_ordinal_having", oracle=_Q18, tags=("agg", "having", "ordinal"))
def q18_group_ordinal_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ordinal + HAVING (reference: alert_bloat/01_step.sql:60 GROUP BY
    1..10; dba_idx_diag/07_step.sql:18 HAVING count(*) > 1)."""
    return _sql(spark, sf_dir, _Q18)


_Q19 = """
SELECT
  o_orderpriority,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial,
  CASE WHEN COUNT(*) > 100 THEN 'big' ELSE 'small' END                 AS bucket
FROM orders
GROUP BY o_orderpriority
"""


@query("q19_case_agg", oracle=_Q19, tags=("agg", "case"))
def q19_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE inside aggregate and aggregate inside CASE (reference:
    alert_bloat/01_step.sql:40-43, 02_step.sql:13)."""
    return _sql(spark, sf_dir, _Q19)


_Q24 = """
SELECT
  c_mktsegment,
  CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
  CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
GROUP BY c_mktsegment
"""


@query("q24_distinct_agg", oracle=_Q24, tags=("agg", "distinct"))
def q24_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) (reference: array_agg(distinct ...) at
    dba_idx_diag/07_step.sql:7 — the distinct-aggregate family)."""
    return _sql(spark, sf_dir, _Q24)


_Q24B_SPARK = """
SELECT
  n_name,
  array_join(array_sort(collect_set(c_mktsegment)), ',') AS segments,
  CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

_Q24B_ORACLE = """
SELECT
  n_name,
  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
  CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@query("q24b_array_agg_distinct", oracle=_Q24B_ORACLE, tags=("agg", "array"))
def q24b_array_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg(DISTINCT x) rendered to a sorted joined string — the
    reference's sorted-array-agg pattern (dba_idx_diag/07_step.sql:7,23;
    SURVEY risk §7.4.3: sort for determinism)."""
    return _sql(spark, sf_dir, _Q24B_SPARK)


_Q25 = """
SELECT
  COALESCE(l_returnflag, 'ALL')  AS returnflag,
  COALESCE(l_linestatus, 'ALL')  AS linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("q25_rollup", oracle=_Q25, tags=("agg", "rollup"))
def q25_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals (not in the reference corpus — Spark built-in,
    SURVEY §2.5 'Spark provides natively if ever needed')."""
    return _sql(spark, sf_dir, _Q25)


_Q29 = """
SELECT
  o_orderpriority,
  percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT))
    AS median_cents,
  percentile_cont(0.9) WITHIN GROUP (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT))
    AS p90_cents
FROM orders
GROUP BY o_orderpriority
"""


@query("q29_percentile", oracle=_Q29, tags=("agg", "percentile"))
def q29_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles over integer cents (deterministic in
    both engines)."""
    return _sql(spark, sf_dir, _Q29)


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.4)
# ---------------------------------------------------------------------------


@query(
    "q02_top_revenue_orders",
    oracle="""
SELECT o.o_orderkey, c.c_name,
  CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, c.c_name
ORDER BY revenue_cents DESC, o_orderkey
LIMIT 10
""",
    tags=("join", "agg", "topk"),
)
def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + group + top-k (TPC-H-Q3 shape; reference inner equi joins,
    alert_bloat/01_step.sql:19-26). Scale shape: lineitem is pre-aggregated
    by orderkey BEFORE the join (map-side combine — the shuffle carries one
    row per order, not one per lineitem, and no re-aggregation happens after
    the join); customer is broadcast; top-k compiles to
    TakeOrderedAndProject — no global sort."""
    register_views(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    revenue_cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    rev_by_order = lineitem.groupBy("l_orderkey").agg(
        F.sum(revenue_cents).alias("revenue_cents")
    )
    return (
        F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(rev_by_order, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderkey", "c_name", "revenue_cents")
        .orderBy(F.col("revenue_cents").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q03_nation_revenue",
    oracle="""
SELECT n.n_name, r.r_name,
  CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
    AS revenue_cents,
  CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
GROUP BY n.n_name, r.r_name
""",
    tags=("join", "agg", "multiway"),
)
def q03_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table multi-way join with dim filters (reference: 6-table join,
    alert_bloat/01_step.sql:19-26). region/nation/customer broadcast; the only
    shuffle at scale is orders⋈lineitem on orderkey."""
    register_views(spark, sf_dir)
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    dims = F.broadcast(
        r.join(n, n.n_regionkey == r.r_regionkey).join(c, c.c_nationkey == n.n_nationkey)
    )
    revenue_cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (
        o.join(dims, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.sum(revenue_cents).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_Q04 = """
SELECT c.c_custkey, c.c_name,
  CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
  CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0) AS BIGINT) AS spent_cents
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
"""


@query("q04_left_join_counts", oracle=_Q04, tags=("join", "outer", "agg"))
def q04_left_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving zero-order customers (reference: LEFT JOIN
    pg_constraint, alert_bloat/01_step.sql:26; alert_stat/01_step.sql:10)."""
    return _sql(spark, sf_dir, _Q04)


@query(
    "q05_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
    tags=("join", "anti"),
)
def q05_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (reference: NOT EXISTS / left-join-IS-NULL missing-PK check,
    dba_idx_diag/03_step.sql:10-15). DataFrame `left_anti`. The URGENT filter
    keeps the result non-empty at every SF (every customer has some order)."""
    register_views(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q06_customers_with_big_order",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
)
""",
    tags=("join", "semi"),
)
def q06_customers_with_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join via EXISTS (reference: actiontracker dedup EXISTS,
    actiontracker/actiontracker.py:106-114). DataFrame `left_semi`."""
    register_views(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


_Q07_SPARK = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         NULLIF(CAST(ROUND(value) AS BIGINT) % 50, 0) AS vkey
  FROM events
)
SELECT a.vkey AS vkey,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM e a JOIN e b
  ON a.user_id = b.user_id
 AND a.vkey <=> b.vkey
 AND a.event_id < b.event_id
GROUP BY a.vkey
"""

_Q07_ORACLE = _Q07_SPARK.replace("a.vkey <=> b.vkey", "a.vkey IS NOT DISTINCT FROM b.vkey")


@query("q07_nullsafe_self_join", oracle=_Q07_ORACLE, tags=("join", "nullsafe", "self"))
def q07_nullsafe_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe (`IS NOT DISTINCT FROM` → `<=>`) self-join with NULL keys
    matching each other (reference: 9-key null-safe blocked×blocking locks
    join, dba_locks/01_step.sql:9-20)."""
    return _sql(spark, sf_dir, _Q07_SPARK)


_Q08 = """
SELECT a.l_returnflag AS l_returnflag,
  CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
WHERE a.l_returnflag = b.l_returnflag
GROUP BY a.l_returnflag
"""


@query("q08_self_join_pairs", oracle=_Q08, tags=("join", "self", "theta"))
def q08_self_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self theta-join within a key group (reference: pg_locks self join with
    compound ON, dbccore/dbccore.py:188-193). Equi key + range residual —
    shuffles once on orderkey, the inequality is a post-join filter."""
    return _sql(spark, sf_dir, _Q08)


@query(
    "q14_in_subquery",
    oracle="""
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
  AND o_orderpriority NOT IN ('5-LOW', '4-NOT SPECIFIED')
GROUP BY o_orderstatus
""",
    tags=("subquery", "in"),
)
def q14_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery + NOT IN literal list (reference: `nspname NOT IN (...)`,
    alert_bloat/01_step.sql:28)."""
    return _sql(
        spark,
        sf_dir,
        """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
  AND o_orderpriority NOT IN ('5-LOW', '4-NOT SPECIFIED')
GROUP BY o_orderstatus
""",
    )


_Q13 = """
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE CAST(ROUND(p_retailprice * 100) AS BIGINT) * (SELECT COUNT(*) FROM part)
      > (SELECT SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) FROM part)
"""


@query("q13_scalar_subquery", oracle=_Q13, tags=("subquery", "scalar"))
def q13_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subqueries in WHERE (reference: alert_max_connections/
    01_step.sql:4-6). Above-average test done in exact integer arithmetic
    (price*n > sum) so both engines agree bit-for-bit."""
    return _sql(spark, sf_dir, _Q13)


# ---------------------------------------------------------------------------
# Windows (SURVEY §2.6)
# ---------------------------------------------------------------------------


@query(
    "q09_window_top2_orders",
    oracle="""
SELECT c_custkey, o_orderkey, rn
FROM (
  SELECT o.o_custkey AS c_custkey, o.o_orderkey,
         ROW_NUMBER() OVER (
           PARTITION BY o.o_custkey
           ORDER BY CAST(ROUND(o.o_totalprice * 100) AS BIGINT) DESC, o.o_orderkey
         ) AS rn
  FROM orders o
) t
WHERE rn <= 2
""",
    tags=("window",),
)
def q09_window_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number() — the corpus's one window construct (reference:
    test_int4_to_int8/02_gen_obj.sql:12,19) generalized to partitioned top-n.
    Fully-specified ORDER (cents desc, key) ⇒ deterministic."""
    register_views(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey").orderBy(cents.desc(), F.col("o_orderkey"))
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 2)
    )


_Q10 = """
SELECT event_id, user_id,
  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS running_cents,
  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq,
  LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
FROM events
"""


@query("q10_window_running_sum", oracle=_Q10, tags=("window", "frame"))
def q10_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames (running sum), sequence numbering, and LAG — the window
    family beyond the corpus's row_number (SURVEY §2.6 'comes free')."""
    return _sql(spark, sf_dir, _Q10)


# ---------------------------------------------------------------------------
# Set ops / CTEs / sort-limit (SURVEY §2.7)
# ---------------------------------------------------------------------------

_Q11 = """
SELECT n_nationkey AS nationkey, 'customer_only' AS src FROM (
  SELECT c_nationkey AS n_nationkey FROM customer
  EXCEPT
  SELECT s_nationkey FROM supplier
) t
UNION ALL
SELECT n_nationkey, 'both' AS src FROM (
  SELECT c_nationkey AS n_nationkey FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
) t2
"""


@query("q11_set_ops", oracle=_Q11, tags=("setop",))
def q11_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / UNION ALL / INTERSECT / EXCEPT (reference: UNION in
    test_gens/01_gen_nsp.sql:2-6; INTERSECT/EXCEPT are Spark-native extras)."""
    return _sql(spark, sf_dir, _Q11)


_Q12 = """
WITH order_rev AS (
  SELECT l_orderkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS rev_cents
  FROM lineitem GROUP BY l_orderkey
), joined AS (
  SELECT o.o_custkey, o.o_orderdate, r.rev_cents
  FROM orders o JOIN order_rev r ON o.o_orderkey = r.l_orderkey
), per_cust AS (
  SELECT o_custkey, SUM(rev_cents) AS cust_cents, COUNT(*) AS n_orders
  FROM joined GROUP BY o_custkey
), bands AS (
  SELECT o_custkey, cust_cents, n_orders,
         CASE WHEN cust_cents > 100000000 THEN 'platinum'
              WHEN cust_cents > 50000000 THEN 'gold'
              ELSE 'standard' END AS band
  FROM per_cust
)
SELECT band,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(cust_cents) AS BIGINT) AS band_cents,
  CAST(SUM(n_orders) AS BIGINT) AS band_orders
FROM bands GROUP BY band
"""


@query("q12_cte_chain", oracle=_Q12, tags=("cte",))
def q12_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-deep chained CTEs (reference: alert_bloat/01_step.sql:1-109 step1→4
    chain)."""
    return _sql(spark, sf_dir, _Q12)


_Q17_SPARK = """
SELECT w.weight, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN VALUES ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3), ('4-NOT SPECIFIED', 2), ('5-LOW', 1)
  AS w(prio, weight)
ON o.o_orderpriority = w.prio
GROUP BY w.weight
"""

_Q17_ORACLE = """
SELECT w.weight, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN (VALUES ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3), ('4-NOT SPECIFIED', 2), ('5-LOW', 1))
  AS w(prio, weight)
ON o.o_orderpriority = w.prio
GROUP BY w.weight
"""


@query("q17_values_inline", oracle=_Q17_ORACLE, tags=("values", "join"))
def q17_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES table joined to data (reference: VALUES at
    test_blocker_tx/01_step.sql:6). Inline tables broadcast for free."""
    return _sql(spark, sf_dir, _Q17_SPARK)


_Q28_SPARK = """
SELECT c.c_custkey, t.o_orderkey AS top_orderkey, t.cents AS top_cents
FROM customer c
JOIN LATERAL (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY cents DESC, o_orderkey
  LIMIT 1
) t
WHERE c.c_mktsegment = 'AUTOMOBILE'
"""

_Q28_ORACLE = """
SELECT c.c_custkey, t.o_orderkey AS top_orderkey, t.cents AS top_cents
FROM customer c
JOIN LATERAL (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY cents DESC, o_orderkey
  LIMIT 1
) t ON true
WHERE c.c_mktsegment = 'AUTOMOBILE'
"""


@query("q28_lateral_top1", oracle=_Q28_ORACLE, tags=("join", "lateral"))
def q28_lateral_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER/LIMIT (reference: LEFT JOIN
    LATERAL FK check, dba_idx_diag/06_step.sql:30-42)."""
    return _sql(spark, sf_dir, _Q28_SPARK)


# ---------------------------------------------------------------------------
# Series generation / explode (SURVEY §2.2 set-returning sources)
# ---------------------------------------------------------------------------

_Q15_SPARK = """
SELECT n % 7 AS bucket,
  CAST(COUNT(*) AS BIGINT) AS cnt,
  CAST(SUM(n) AS BIGINT) AS sum_n,
  CAST(MIN(n) AS BIGINT) AS min_n,
  CAST(MAX(n) AS BIGINT) AS max_n
FROM (SELECT explode(sequence(1, 10000, 3)) AS n)
GROUP BY 1
"""

_Q15_ORACLE = """
SELECT n % 7 AS bucket,
  CAST(COUNT(*) AS BIGINT) AS cnt,
  CAST(SUM(n) AS BIGINT) AS sum_n,
  CAST(MIN(n) AS BIGINT) AS min_n,
  CAST(MAX(n) AS BIGINT) AS max_n
FROM (SELECT CAST(g AS BIGINT) AS n FROM generate_series(1, 10000, 3) t(g))
GROUP BY 1
"""


@query("q15_generate_series", oracle=_Q15_ORACLE, tags=("series",))
def q15_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generate_series(a,b,step) → sequence+explode (reference:
    test_int4_to_int8/02_gen_obj.sql:14,21; SURVEY §2.2). At scale prefer
    ``spark.range`` (distributed, no single array)."""
    return _sql(spark, sf_dir, _Q15_SPARK)


_Q16_SPARK = """
SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (
  SELECT explode(split(text, ' ')) AS word FROM documents
) t
WHERE word <> ''
GROUP BY word
HAVING COUNT(*) >= 100
"""

_Q16_ORACLE = """
SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
) t
WHERE word <> ''
GROUP BY word
HAVING COUNT(*) >= 100
"""


@query("q16_unnest_words", oracle=_Q16_ORACLE, tags=("explode", "text"))
def q16_unnest_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unnest/regexp_split_to_table → explode(split()) (reference:
    alert_bloat/01_step.sql:9; test_gens/00_step.sql:9-10)."""
    return _sql(spark, sf_dir, _Q16_SPARK)


# ---------------------------------------------------------------------------
# Scalar function surface (SURVEY §2.9)
# ---------------------------------------------------------------------------

_Q20_SPARK = """
SELECT p_partkey,
  substring(p_name, 1, 10)                         AS name10,
  upper(p_brand)                                    AS brand_up,
  lower(p_type)                                     AS type_low,
  replace(p_type, ' ', '_')                         AS type_snake,
  concat(p_brand, ':', p_type)                      AS brand_type,
  md5(p_name)                                       AS name_md5,
  length(p_name)                                    AS name_len,
  regexp_extract(p_type, '^([A-Z]+)', 1)            AS type_head,
  array_join(slice(split(p_name, ' '), 1, 2), '-')  AS first_two,
  format_string('%s/%d', p_brand, p_size)           AS brand_size
FROM part
WHERE p_size <= 10
"""

_Q20_ORACLE = """
SELECT p_partkey,
  substring(p_name, 1, 10)                          AS name10,
  upper(p_brand)                                    AS brand_up,
  lower(p_type)                                     AS type_low,
  replace(p_type, ' ', '_')                         AS type_snake,
  concat(p_brand, ':', p_type)                      AS brand_type,
  md5(p_name)                                       AS name_md5,
  CAST(length(p_name) AS INT)                       AS name_len,
  regexp_extract(p_type, '^([A-Z]+)', 1)            AS type_head,
  array_to_string(string_split(p_name, ' ')[1:2], '-') AS first_two,
  printf('%s/%d', p_brand, p_size)                  AS brand_size
FROM part
WHERE p_size <= 10
"""


@query("q20_string_funcs", oracle=_Q20_ORACLE, tags=("scalar", "string"))
def q20_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface: substring/replace/concat/md5/regexp_extract/
    split+array_join/format (reference: SURVEY §2.9 string list —
    dba_active_maint, alert_bloat, test_placeholders usages)."""
    return _sql(spark, sf_dir, _Q20_SPARK)


_Q21_SPARK = """
SELECT
  date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd') AS order_month,
  CAST(year(o_orderdate) AS BIGINT)              AS order_year,
  CAST(month(o_orderdate) AS BIGINT)             AS order_mon,
  CAST(COUNT(*) AS BIGINT)                       AS n_orders,
  date_format(MIN(o_orderdate + INTERVAL 30 DAY), 'yyyy-MM-dd') AS min_due
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1, 2, 3
"""

_Q21_ORACLE = """
SELECT
  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
  CAST(year(o_orderdate) AS BIGINT)              AS order_year,
  CAST(month(o_orderdate) AS BIGINT)             AS order_mon,
  CAST(COUNT(*) AS BIGINT)                       AS n_orders,
  strftime(MIN(o_orderdate + INTERVAL 30 DAY), '%Y-%m-%d') AS min_due
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1, 2, 3
"""


@query("q21_date_funcs", oracle=_Q21_ORACLE, tags=("scalar", "datetime"))
def q21_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / extract / interval arithmetic (reference: SURVEY §2.9
    date list — now(), age(), date_trunc, interval literals)."""
    return _sql(spark, sf_dir, _Q21_SPARK)


_Q22_SPARK = """
SELECT
  CAST(l_quantity AS BIGINT) % 5                               AS qty_mod,
  CAST(COUNT(*) AS BIGINT)                                     AS cnt,
  CAST(SUM(CAST(l_quantity AS BIGINT) DIV 7) AS BIGINT)        AS sum_intdiv,
  CAST(SUM(CAST(CEIL(l_discount * 10) AS BIGINT)) AS BIGINT)   AS sum_ceil,
  CAST(SUM(CAST(FLOOR(l_tax * 10) AS BIGINT)) AS BIGINT)       AS sum_floor,
  CAST(SUM(CAST(POW(CAST(l_linenumber AS BIGINT) % 3, 2) AS BIGINT)) AS BIGINT) AS sum_pow,
  ROUND(MIN(l_extendedprice), 1)                               AS min_price_r1
FROM lineitem
GROUP BY 1
"""

_Q22_ORACLE = """
SELECT
  CAST(l_quantity AS BIGINT) % 5                               AS qty_mod,
  CAST(COUNT(*) AS BIGINT)                                     AS cnt,
  CAST(SUM(CAST(l_quantity AS BIGINT) // 7) AS BIGINT)         AS sum_intdiv,
  CAST(SUM(CAST(CEIL(l_discount * 10) AS BIGINT)) AS BIGINT)   AS sum_ceil,
  CAST(SUM(CAST(FLOOR(l_tax * 10) AS BIGINT)) AS BIGINT)       AS sum_floor,
  CAST(SUM(CAST(POW(CAST(l_linenumber AS BIGINT) % 3, 2) AS BIGINT)) AS BIGINT) AS sum_pow,
  ROUND(MIN(l_extendedprice), 1)                               AS min_price_r1
FROM lineitem
GROUP BY 1
"""


@query("q22_math_funcs", oracle=_Q22_ORACLE, tags=("scalar", "math"))
def q22_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface: modulo, PG int-division (`div` ↔ `//`), ceil/floor,
    power, round (reference: SURVEY §2.9 math — alert_bloat ops incl.
    int-division parity trap)."""
    return _sql(spark, sf_dir, _Q22_SPARK)


_Q23 = """
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(ROUND(COALESCE(NULLIF(value, 0.0), 1.0) * 100) AS BIGINT)) AS BIGINT)
    AS sum_defaulted_cents,
  CAST(SUM(CAST(LEAST(CAST(ROUND(value) AS BIGINT), 100) AS BIGINT)) AS BIGINT) AS sum_capped,
  CAST(SUM(CAST(GREATEST(CAST(ROUND(value) AS BIGINT), 10) AS BIGINT)) AS BIGINT) AS sum_floored,
  CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even_users
FROM events
GROUP BY event_type
"""


@query("q23_conditional_funcs", oracle=_Q23, tags=("scalar", "conditional"))
def q23_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / least / greatest / CASE (reference: SURVEY §2.9
    conditional list — alert_bloat coalesce, alert_int4_capacity nullif,
    dba_long_queries least/greatest)."""
    return _sql(spark, sf_dir, _Q23)


_Q26_SPARK = """
SELECT
  CAST(count_if(p_type LIKE 'SMALL%') AS BIGINT)        AS n_small,
  CAST(count_if(p_type ILIKE '%copper%') AS BIGINT)     AS n_copper,
  CAST(count_if(p_name RLIKE '^[a-f]') AS BIGINT)       AS n_af,
  CAST(count_if(p_brand NOT LIKE 'Brand#1%') AS BIGINT) AS n_not_b1
FROM part
"""

_Q26_ORACLE = """
SELECT
  CAST(count_if(p_type LIKE 'SMALL%') AS BIGINT)                AS n_small,
  CAST(count_if(p_type ILIKE '%copper%') AS BIGINT)             AS n_copper,
  CAST(count_if(regexp_matches(p_name, '^[a-f]')) AS BIGINT)    AS n_af,
  CAST(count_if(p_brand NOT LIKE 'Brand#1%') AS BIGINT)         AS n_not_b1
FROM part
"""


@query("q26_like_patterns", oracle=_Q26_ORACLE, tags=("filter", "pattern"))
def q26_like_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / ILIKE / regex-match predicates (reference: ilike at
    dba_active_maint/01_step.sql:22-33; `~`/`!~` at dba_top_tables)."""
    return _sql(spark, sf_dir, _Q26_SPARK)


_Q27_SPARK = """
SELECT * FROM (
  SELECT o_orderpriority, o_orderstatus FROM orders
)
PIVOT (
  COUNT(*) AS cnt FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p)
)
"""

_Q27_ORACLE = """
SELECT o_orderpriority,
  CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS f,
  CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS o,
  CAST(count_if(o_orderstatus = 'P') AS BIGINT) AS p
FROM orders
GROUP BY o_orderpriority
"""


@query("q27_pivot", oracle=_Q27_ORACLE, tags=("pivot",))
def q27_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (Spark-native) vs conditional aggregation oracle."""
    return _sql(spark, sf_dir, _Q27_SPARK)


_Q30_SPARK = """
SELECT CAST(get_json_object(props, '$.k') AS BIGINT) % 10 AS k_mod,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
WHERE props IS NOT NULL
GROUP BY 1
"""

_Q30_ORACLE = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
WHERE props IS NOT NULL
GROUP BY 1
"""


@query("q30_json_extract", oracle=_Q30_ORACLE, tags=("scalar", "json"))
def q30_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (reference: jsonb meta_data,
    actiontracker/actiontracker.py:45; SURVEY §2.9 JSON)."""
    return _sql(spark, sf_dir, _Q30_SPARK)


_Q31_SPARK = """
SELECT r_name,
  array_join(transform(sequence(1, 3), i -> substring(r_name, i, 1)), '.') AS head3,
  CAST(element_at(split(r_name, ' '), 1) = r_name AS BOOLEAN) AS single_word,
  CAST(size(split(r_name, ' ')) AS BIGINT) AS n_words
FROM region
"""

_Q31_ORACLE = """
SELECT r_name,
  array_to_string([substring(r_name, i, 1) for i in generate_series(1, 3)], '.') AS head3,
  (string_split(r_name, ' ')[1] = r_name) AS single_word,
  CAST(length(string_split(r_name, ' ')) AS BIGINT) AS n_words
FROM region
"""


@query("q31_array_funcs", oracle=_Q31_ORACLE, tags=("scalar", "array"))
def q31_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: transform/sequence/element_at (PG 1-based subscripts →
    element_at, SURVEY §2.9 array; reference indkey[0] at
    dba_idx_diag/07_step.sql:15)."""
    return _sql(spark, sf_dir, _Q31_SPARK)


# ---------------------------------------------------------------------------
# q32 / q33 — set-op completeness + pagination (SURVEY §2.7 gaps)
# ---------------------------------------------------------------------------

_Q32 = """
WITH c95 AS (
  SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
), c96 AS (
  SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
)
SELECT
  CAST((SELECT COUNT(*) FROM (SELECT o_custkey FROM c95 INTERSECT SELECT o_custkey FROM c96) t) AS BIGINT) AS n_both,
  CAST((SELECT COUNT(*) FROM (SELECT o_custkey FROM c95 EXCEPT    SELECT o_custkey FROM c96) t) AS BIGINT) AS n_only_95
"""


@query("q32_intersect_except", oracle=_Q32, tags=("setop",))
def q32_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT — completes the set-op family beyond the corpus's
    UNION/UNION ALL (SURVEY §2.7 lists them as absent from the reference;
    both are native Catalyst ops: semi/anti joins after distinct)."""
    return _sql(spark, sf_dir, _Q32)


_Q33 = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 40
"""


@query("q33_offset_fetch", oracle=_Q33, tags=("sort", "limit"))
def q33_offset_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keyset-less pagination: ORDER BY ... LIMIT/OFFSET
    (absent from the corpus, SURVEY §2.7; Spark ≥3.4 supports OFFSET and
    still plans TakeOrderedAndProject — no global sort)."""
    return _sql(spark, sf_dir, _Q33)


_Q34 = """
SELECT
  COALESCE(l_returnflag, 'ALL')  AS returnflag,
  COALESCE(l_linestatus, 'ALL')  AS linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                        (l_linestatus), ())
"""


@query("q34_cube_grouping_sets", oracle=_Q34, tags=("agg", "cube"))
def q34_cube_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS spelling out the full CUBE lattice — completes
    the grouping family next to q25's ROLLUP (absent from the reference
    corpus, SURVEY §2.5; Catalyst expands the sets into one Expand + single
    hash aggregate, so at scale this stays one shuffle)."""
    return _sql(spark, sf_dir, _Q34)


# ---------------------------------------------------------------------------
# q35 — construct probes (SURVEY §2.3/§2.7/§2.9 condensed)
# ---------------------------------------------------------------------------
# The correctness harness checks at most 50 registered queries; the registry
# keeps one slot for this combined probe so the scalar/function constructs
# whose dedicated queries sit past the cap (q13-q17, q20-q23, q26, q30-q33,
# q32) still get an OFFICIAL per-construct correctness signal. One row per
# construct, (construct STRING, val STRING), all values integer- or
# literal-derived so both engines format identically.

_Q35_LEGS: tuple[tuple[str, str, str | None], ...] = (
    # (construct, spark SQL leg, duckdb SQL leg or None if identical)
    (
        "scalar_subquery",
        "CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice > "
        "(SELECT AVG(o_totalprice) FROM orders)) AS STRING)",
        None,
    ),
    (
        "in_subquery",
        "CAST((SELECT COUNT(*) FROM customer WHERE c_nationkey IN "
        "(SELECT n_nationkey FROM nation WHERE n_name LIKE 'NATION_1%')) AS STRING)",
        None,
    ),
    (
        "generate_series",
        "CAST(aggregate(sequence(1, 100), 0, (acc, x) -> acc + x) AS STRING)",
        "CAST((SELECT SUM(x) FROM generate_series(1, 100) t(x)) AS STRING)",
    ),
    (
        "unnest",
        "CAST((SELECT SUM(x) FROM (SELECT explode(array(1,2,3,4)) AS x)) AS STRING)",
        "CAST((SELECT SUM(x) FROM (SELECT UNNEST([1,2,3,4]) AS x)) AS STRING)",
    ),
    (
        "values_inline",
        "CAST((SELECT SUM(v) FROM (VALUES (1),(2),(3)) AS t(v)) AS STRING)",
        None,
    ),
    (
        "string_funcs",
        "substr(md5(upper(replace('ab-cd', '-', '_'))), 1, 8) || '/' || "
        "CAST(length('hello') AS STRING)",
        None,
    ),
    (
        "date_funcs",
        "CAST(CAST(date_trunc('month', DATE '2024-03-15') AS DATE) AS STRING) "
        "|| '/' || CAST(CAST(extract(year FROM DATE '2024-03-15') AS INT) AS STRING)",
        None,
    ),
    (
        "math_funcs",
        "CAST(CAST(floor(7.5) + ceil(2.1) + pow(2, 10) + mod(17, 5) AS BIGINT) AS STRING)",
        None,
    ),
    (
        "conditional_funcs",
        "CAST(coalesce(NULL, 5) + coalesce(nullif(3, 3), 0) + least(1, 2) + "
        "greatest(1, 2) + CASE WHEN 1 < 2 THEN 10 ELSE 0 END AS STRING)",
        None,
    ),
    (
        "like_patterns",
        "CAST((SELECT COUNT(*) FROM part WHERE p_name LIKE '%al%') AS STRING) "
        "|| '/' || CAST((SELECT COUNT(*) FROM part WHERE p_name ILIKE 'RED%') AS STRING)",
        None,
    ),
    (
        "regex_match",
        "CAST((SELECT COUNT(*) FROM part WHERE p_name RLIKE '^(red|blue)') AS STRING)",
        "CAST((SELECT COUNT(*) FROM part WHERE regexp_matches(p_name, '^(red|blue)')) AS STRING)",
    ),
    (
        "json_extract",
        "get_json_object('{\"a\": {\"b\": 7}}', '$.a.b')",
        "json_extract_string('{\"a\": {\"b\": 7}}', '$.a.b')",
    ),
    (
        "array_funcs",
        "CAST(element_at(array(10,20,30), 2) + size(array(10,20,30)) + "
        "aggregate(transform(array(1,2,3), x -> x * 2), 0, (a, x) -> a + x) AS STRING)",
        "CAST(([10,20,30])[2] + len([10,20,30]) + "
        "list_aggregate(list_transform([1,2,3], x -> x * 2), 'sum') AS STRING)",
    ),
    (
        "offset_fetch",
        "CAST((SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 1 OFFSET 10) AS STRING)",
        None,
    ),
    (
        # the Spark leg is produced BY the PG dialect rewriter at import time,
        # so this probe officially exercises the @> compilation itself
        # (reference: alert_check_autovacuum/01_step.sql:6)
        "array_containment",
        None,  # filled below via pgdialect.rewrite
        "CAST(list_has_all(['a','b','c'], ['b','c']) AS STRING) || '/' || "
        "CAST(list_has_all(['a'], ['b']) AS STRING)",
    ),
    (
        "intersect_except",
        "CAST((SELECT COUNT(*) FROM (SELECT c_nationkey FROM customer INTERSECT "
        "SELECT n_nationkey FROM nation)) AS STRING) || '/' || "
        "CAST((SELECT COUNT(*) FROM (SELECT n_nationkey FROM nation EXCEPT "
        "SELECT n_nationkey FROM nation WHERE n_regionkey = 0)) AS STRING)",
        None,
    ),
)


def _pg_containment_leg() -> str:
    from db_converter_spark.plans.pgdialect import rewrite as _pg_rewrite

    return _pg_rewrite(
        "CAST('{a,b,c}'::text[] @> '{b,c}'::text[] AS STRING) || '/' || "
        "CAST('{a}'::text[] @> '{b}'::text[] AS STRING)"
    ).strip()


def _q35_text(dialect: str) -> str:
    parts = []
    for name, spark_leg, duck_leg in _Q35_LEGS:
        if spark_leg is None:
            spark_leg = _pg_containment_leg()
        expr = spark_leg if dialect == "spark" or duck_leg is None else duck_leg
        parts.append(f"SELECT '{name}' AS construct, {expr} AS val")
    return "\nUNION ALL\n".join(parts)


@query("q35_construct_probes", oracle=_q35_text("duck"), tags=("probe", "functions"))
def q35_construct_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row-per-construct probe battery: scalar/IN subqueries, series
    generation, unnest, inline VALUES, string/date/math/conditional/array
    functions, LIKE/ILIKE/regex, JSON extraction, OFFSET pagination,
    INTERSECT/EXCEPT — each leg a deterministic integer- or literal-valued
    expression. Exists so every construct keeps an official correctness row
    within the harness's 50-query budget; the dedicated per-construct
    queries (tail of the registry) remain the deep tests."""
    return _sql(spark, sf_dir, _q35_text("spark"))


# ---------------------------------------------------------------------------
# q36 — recursive CTE (hierarchy walk)
# ---------------------------------------------------------------------------


def _q36(intdiv: str) -> str:
    # Implicit binary tree over customer keys (parent(k) = k div 2, root 1):
    # a deterministic hierarchy that needs NO synthetic tables, walked with
    # WITH RECURSIVE (Spark 4 executes it as an iterative union — each level
    # is one hash join). Depth histogram is the output. The walked domain is
    # capped at custkey <= 4096 so the construct demo runs a FIXED 12
    # recursion rounds at any scale factor — each Spark recursion round has
    # ~0.7 s fixed cost, so an uncapped walk grows log2(corpus) rounds for
    # no added coverage; the cap also pushes c_custkey <= 4096 into every
    # round's customer scan (r3 verdict: tame q36).
    return f"""
WITH RECURSIVE tree(custkey, depth) AS (
  SELECT CAST(1 AS BIGINT) AS custkey, CAST(0 AS BIGINT) AS depth
  UNION ALL
  SELECT c.c_custkey, t.depth + 1
  FROM customer c JOIN tree t ON {intdiv} = t.custkey
  WHERE c.c_custkey > 1 AND c.c_custkey <= 4096
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(custkey) AS BIGINT) AS min_key,
       CAST(MAX(custkey) AS BIGINT) AS max_key
FROM tree GROUP BY depth
"""


@query(
    "q36_recursive_cte",
    oracle=_q36("c.c_custkey // 2"),
    tags=("sql", "recursive", "hierarchy"),
)
def q36_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE hierarchy walk (Spark 4 recursive CTE): level-by-level
    reachability over the implicit custkey binary tree, depth histogram out.
    Each recursion level plans as one hash join against the frontier —
    ~log2(n) rounds total, frontier-sized state, no driver-side loop. The
    reference's recursive surface is DuckDB/PG ``WITH RECURSIVE`` (e.g. the
    dd08 oracle); this is the same construct executed natively by Spark."""
    register_views(spark, sf_dir)
    return spark.sql(_q36("c.c_custkey div 2"))


# ---------------------------------------------------------------------------
# q37 — PIVOT (wide-format conditional aggregation)
# ---------------------------------------------------------------------------

_Q37_SPARK = """
SELECT o_orderstatus,
  COALESCE(y1995, 0) AS y1995, COALESCE(y1996, 0) AS y1996,
  COALESCE(y1997, 0) AS y1997, COALESCE(y1998, 0) AS y1998,
  COALESCE(y1999, 0) AS y1999, COALESCE(y2000, 0) AS y2000
FROM (
  SELECT o_orderstatus, year(o_orderdate) AS y,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
PIVOT (
  SUM(cents) FOR y IN (1995 AS y1995, 1996 AS y1996, 1997 AS y1997,
                       1998 AS y1998, 1999 AS y1999, 2000 AS y2000)
)
"""

# the oracle spells the same relation as conditional aggregation — PIVOT
# is syntactic sugar over exactly this, which is also what Spark plans
# (one HashAggregate, no Expand needed for a single agg function)
_Q37_DUCK = """
SELECT o_orderstatus,
  CAST(COALESCE(SUM(cents) FILTER (y = 1995), 0) AS BIGINT) AS y1995,
  CAST(COALESCE(SUM(cents) FILTER (y = 1996), 0) AS BIGINT) AS y1996,
  CAST(COALESCE(SUM(cents) FILTER (y = 1997), 0) AS BIGINT) AS y1997,
  CAST(COALESCE(SUM(cents) FILTER (y = 1998), 0) AS BIGINT) AS y1998,
  CAST(COALESCE(SUM(cents) FILTER (y = 1999), 0) AS BIGINT) AS y1999,
  CAST(COALESCE(SUM(cents) FILTER (y = 2000), 0) AS BIGINT) AS y2000
FROM (
  SELECT o_orderstatus, year(o_orderdate) AS y,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
) t
GROUP BY o_orderstatus
"""


@query("q37_pivot", oracle=_Q37_DUCK, tags=("sql", "pivot", "agg"))
def q37_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native PIVOT: order value (integer cents) by status × year in wide
    format — the construct probe for Spark's PIVOT clause, which plans as
    ONE conditional-aggregation pass (no per-column scans); the oracle
    spells the identical relation with FILTERed aggregates."""
    register_views(spark, sf_dir)
    return spark.sql(_Q37_SPARK)


# ---------------------------------------------------------------------------
# q38 — UNPIVOT (wide-format back to long; the inverse construct of q37)
# ---------------------------------------------------------------------------

_Q38_WIDE = """
  SELECT o_orderpriority,
    SUM(CASE WHEN o_orderstatus = 'O' THEN cents END) AS st_open,
    SUM(CASE WHEN o_orderstatus = 'F' THEN cents END) AS st_filled,
    SUM(CASE WHEN o_orderstatus = 'P' THEN cents END) AS st_partial
  FROM (
    SELECT o_orderpriority, o_orderstatus,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
  ) t
  GROUP BY o_orderpriority
"""

_Q38_SPARK = f"""
WITH wide AS ({_Q38_WIDE})
SELECT o_orderpriority, status, CAST(cents AS BIGINT) AS cents
FROM wide
UNPIVOT (cents FOR status IN (st_open AS `O`, st_filled AS `F`,
                              st_partial AS `P`))
"""

# the oracle spells UNPIVOT's exact semantics — one branch per unpivoted
# column, NULL cells dropped (Spark UNPIVOT's default EXCLUDE NULLS)
_Q38_DUCK = f"""
WITH wide AS ({_Q38_WIDE})
SELECT o_orderpriority, status, CAST(cents AS BIGINT) AS cents FROM (
  SELECT o_orderpriority, 'O' AS status, st_open AS cents FROM wide
  UNION ALL
  SELECT o_orderpriority, 'F' AS status, st_filled AS cents FROM wide
  UNION ALL
  SELECT o_orderpriority, 'P' AS status, st_partial AS cents FROM wide
) u
WHERE cents IS NOT NULL
"""


@query("q38_unpivot", oracle=_Q38_DUCK, tags=("sql", "unpivot"))
def q38_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native UNPIVOT (wide order-value matrix back to long): the inverse
    construct probe of q37 — Spark plans it as ONE Expand pass over the
    aggregated wide relation (3 rows emitted per input row, NULL cells
    dropped), never a per-column re-scan or self-join; the oracle spells
    the identical relation as a three-branch UNION ALL."""
    register_views(spark, sf_dir)
    return spark.sql(_Q38_SPARK)
