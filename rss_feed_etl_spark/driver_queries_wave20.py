"""Driver-contract queries, wave 20: the remaining classic decision-support
shapes (TPC-H Q2/Q11/Q12/Q20 adapted to the testdata schema — see
operators/decision_support.py for the adaptations: no partsupp table, so the
(part, supplier) supply relation derives from lineitem; no l_shipmode, so
Q12 classes derive from ship latency)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import decision_support as ds


def _t(spark, sf_dir, name):
    return td.load_table(spark, sf_dir, name)


# --- Q2: min-cost supplier per part ----------------------------------------

_Q2 = dict(p_type="STANDARD", p_size_max=15)


def _q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.min_cost_supplier(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "nation"), **_Q2,
    )


_register(
    "min_cost_supplier",
    _q_min_cost_supplier,
    f"""
WITH p AS (SELECT p_partkey FROM part
           WHERE p_type = '{_Q2["p_type"]}' AND p_size <= {_Q2["p_size_max"]}),
supply AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
  FROM lineitem JOIN p ON l_partkey = p_partkey
  GROUP BY 1, 2),
best AS (SELECT l_partkey AS b_partkey, min(cost) AS best_cost
         FROM supply GROUP BY 1)
SELECT l_partkey AS p_partkey, s_name, n_name AS supp_nation,
       cost AS min_cost
FROM supply
JOIN best ON l_partkey = b_partkey AND cost = best_cost
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
""",
)


# --- Q11: important parts by traded value ----------------------------------

_Q11 = dict(nation_name="NATION_5", avg_mult=2.0)


def _q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.important_part_values(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"), **_Q11,
    )


_register(
    "important_part_values",
    _q_important_parts,
    f"""
WITH s AS (SELECT s_suppkey FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           WHERE n_name = '{_Q11["nation_name"]}'),
li AS (SELECT l_partkey, l_extendedprice * (1 - l_discount) AS val
       FROM lineitem JOIN s ON l_suppkey = s_suppkey),
per_part AS (SELECT l_partkey, sum(val) AS part_value FROM li GROUP BY 1),
t AS (SELECT {_Q11["avg_mult"]} * sum(val) / count(DISTINCT l_partkey) AS threshold
      FROM li)
SELECT l_partkey, round(part_value, 2) AS part_value
FROM per_part, t
WHERE part_value > threshold
""",
)


# --- Q12: ship-latency class vs order priority ------------------------------

_Q12 = dict(start="1995-01-01", end="1997-01-01", fast_days=30, slow_days=60)


def _q_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.ship_latency_priority(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders"), **_Q12,
    )


_register(
    "ship_latency_priority",
    _q_ship_latency,
    f"""
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= {_Q12["fast_days"]}
            THEN 'FAST'
            WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) > {_Q12["slow_days"]}
            THEN 'SLOW' ELSE 'MEDIUM' END AS latency_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{_Q12["start"]} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{_Q12["end"]} 00:00:00'
GROUP BY 1
""",
)


# --- Q20: suppliers dominating a part's shipped quantity --------------------

_Q20 = dict(name_sub="wid", start="1995-01-01", end="1997-01-01", share=0.5)


def _q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.dominant_share_suppliers(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "nation"), **_Q20,
    )


_register(
    "dominant_share_suppliers",
    _q_dominant_suppliers,
    f"""
WITH p AS (SELECT p_partkey FROM part WHERE contains(p_name, '{_Q20["name_sub"]}')),
li AS (SELECT l_partkey, l_suppkey, l_quantity
       FROM lineitem JOIN p ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '{_Q20["start"]} 00:00:00'
         AND l_shipdate <  TIMESTAMP '{_Q20["end"]} 00:00:00'),
per_ps AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
           FROM li GROUP BY 1, 2),
per_p AS (SELECT l_partkey AS t_partkey, sum(supp_qty) AS total_qty
          FROM per_ps GROUP BY 1),
dom AS (SELECT DISTINCT l_suppkey
        FROM per_ps JOIN per_p ON l_partkey = t_partkey
        WHERE supp_qty > {_Q20["share"]} * total_qty)
SELECT s_name, n_name AS supp_nation
FROM dom JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
""",
)
