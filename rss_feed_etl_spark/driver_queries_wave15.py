"""Driver-contract queries, wave 15: decision-support shapes (TPC-H
Q4/Q13/Q15/Q16/Q17/Q18/Q19/Q21/Q22 adapted to the testdata schema) plus a
two-window analytic ranking.  See operators/decision_support.py for the
schema adaptations and plan notes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import decision_support as ds


def _t(spark, sf_dir, name):
    return td.load_table(spark, sf_dir, name)


# --- Q4: order priority with a late lineitem -------------------------------

_Q4_START, _Q4_END, _Q4_LATE = "1996-01-01", "1996-07-01", 30


def _q_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.order_priority_late(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem"),
        _Q4_START, _Q4_END, late_days=_Q4_LATE,
    )


_register(
    "order_priority_late",
    _q_priority_late,
    f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{_Q4_START} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{_Q4_END} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q4_LATE} DAY)
GROUP BY 1
""",
)


# --- Q13: customer order-count distribution --------------------------------


def _q_cust_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.customer_order_distribution(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


_register(
    "customer_order_distribution",
    _q_cust_dist,
    """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY 1)
GROUP BY 1
""",
)


# --- Q17: small-quantity order revenue -------------------------------------

_Q17_BRAND, _Q17_FRAC = "Brand#13", 0.5


def _q_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.small_quantity_revenue(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part"),
        _Q17_BRAND, frac=_Q17_FRAC,
    )


_register(
    "small_quantity_revenue",
    _q_small_qty,
    f"""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = '{_Q17_BRAND}'
  AND l_quantity < (SELECT {_Q17_FRAC} * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
)


# --- Q18: large-volume orders ----------------------------------------------

_Q18_MINQTY, _Q18_TOP = 150.0, 100


def _q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.large_order_customers(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"), min_qty=_Q18_MINQTY, top=_Q18_TOP,
    )


_register(
    "large_order_customers",
    _q_large_orders,
    f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, sum_qty
FROM orders
JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING sum_qty > {_Q18_MINQTY})
  ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT {_Q18_TOP}
""",
)


# --- Q19: disjunctive brand/quantity/size revenue --------------------------

_Q19_CLAUSES = [
    ("Brand#11", 1.0, 11.0, 1, 5),
    ("Brand#13", 10.0, 20.0, 1, 10),
    ("Brand#15", 20.0, 30.0, 1, 15),
]


def _q_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.disjunctive_brand_revenue(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part"), _Q19_CLAUSES
    )


_Q19_ORS = " OR ".join(
    f"(p_brand = '{b}' AND l_quantity BETWEEN {ql} AND {qh}"
    f" AND p_size BETWEEN {sl} AND {sh})"
    for b, ql, qh, sl, sh in _Q19_CLAUSES
)
_register(
    "disjunctive_brand_revenue",
    _q_disjunctive,
    f"""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_Q19_ORS}
""",
)


# --- Q15: top supplier of a quarter ----------------------------------------

_Q15_START, _Q15_END = "1996-01-01", "1996-04-01"


def _q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.top_supplier_quarter(
        _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "lineitem"),
        _Q15_START, _Q15_END,
    )


_register(
    "top_supplier_quarter",
    _q_top_supplier,
    f"""
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_START} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{_Q15_END} 00:00:00'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
""",
)


# --- Q16: distinct suppliers per (brand, type, size) -----------------------

_Q16_EXCL, _Q16_TOP = "Brand#11", 40


def _q_brand_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.brand_supplier_counts(
        _t(spark, sf_dir, "part"), _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "lineitem"), exclude_brand=_Q16_EXCL, top=_Q16_TOP,
    )


_register(
    "brand_supplier_counts",
    _q_brand_suppliers,
    f"""
WITH pairs AS (
  SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand <> '{_Q16_EXCL}'
    AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < (SELECT avg(s_acctbal)
                                             FROM supplier)))
SELECT p_brand, p_type, p_size, count(*) AS supplier_cnt
FROM pairs GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT {_Q16_TOP}
""",
)


# --- Q21: sole late supplier on multi-supplier orders ----------------------

_Q21_LATE, _Q21_TOP = 60, 20


def _q_sole_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.sole_late_suppliers(
        _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"), late_days=_Q21_LATE, top=_Q21_TOP,
    )


_register(
    "sole_late_suppliers",
    _q_sole_late,
    f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'),
per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_shipdate > o_orderdate
                                  + INTERVAL {_Q21_LATE} DAY
                             THEN l_suppkey END) AS n_late,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL {_Q21_LATE} DAY
                  THEN l_suppkey END) AS late_supp
  FROM li GROUP BY 1)
SELECT s_name, count(*) AS numwait
FROM per_order JOIN supplier ON s_suppkey = late_supp
WHERE n_supp > 1 AND n_late = 1
GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT {_Q21_TOP}
""",
)


# --- Q22: rich customers who never ordered, by nation ----------------------


_Q22_SINCE = "1999-01-01"


def _q_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.idle_rich_customers(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "nation"), since=_Q22_SINCE,
    )


_register(
    "idle_rich_customers",
    _q_idle_rich,
    f"""
SELECT n_name, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer JOIN nation ON n_nationkey = c_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{_Q22_SINCE} 00:00:00')
GROUP BY 1
""",
)


# --- analytic: decile + running share within priority class ----------------


def _q_decile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.decile_rank_orders(_t(spark, sf_dir, "orders"))


_register(
    "order_decile_rank",
    _q_decile_rank,
    """
WITH t AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders)
SELECT o_orderkey, o_orderpriority, o_totalprice,
       ntile(10) OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey) AS price_decile,
       round(sum(cents) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW)
             / sum(cents) OVER (PARTITION BY o_orderpriority), 6)
         AS running_share
FROM t
""",
)
