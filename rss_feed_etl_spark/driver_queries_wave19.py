"""Driver-contract queries, wave 19: remaining classic decision-support
shapes (TPC-H Q6/Q7/Q8/Q9 adapted to the testdata schema — see
operators/decision_support.py for the adaptations)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import decision_support as ds


def _t(spark, sf_dir, name):
    return td.load_table(spark, sf_dir, name)


# --- Q7: volume shipping between two nations -------------------------------

_Q7 = dict(n1="NATION_1", n2="NATION_2", start="1996-01-01", end="1998-01-01")


def _q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.volume_shipping(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"), **_Q7,
    )


_register(
    "volume_shipping",
    _q_volume_shipping,
    f"""
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '{_Q7["start"]} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{_Q7["end"]} 00:00:00'
    AND ns.n_name IN ('{_Q7["n1"]}', '{_Q7["n2"]}')
    AND nc.n_name IN ('{_Q7["n1"]}', '{_Q7["n2"]}')
    AND ns.n_name <> nc.n_name)
GROUP BY 1, 2, 3
""",
)


# --- Q8: national market share ---------------------------------------------

_Q8 = dict(target_nation="NATION_3", target_region="EUROPE",
           part_type="ECONOMY", start="1995-01-01", end="1997-01-01")


def _q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.market_share(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region"),
        _Q8["target_nation"], _Q8["target_region"],
        _t(spark, sf_dir, "part"), _Q8["part_type"], _Q8["start"], _Q8["end"],
    )


_register(
    "market_share",
    _q_market_share,
    f"""
SELECT o_year,
       round(sum(CASE WHEN supp_nation = '{_Q8["target_nation"]}'
                      THEN volume ELSE 0.0 END) / sum(volume), 6) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         ns.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region   ON nc.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE r_name = '{_Q8["target_region"]}'
    AND p_type = '{_Q8["part_type"]}'
    AND o_orderdate >= TIMESTAMP '{_Q8["start"]} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{_Q8["end"]} 00:00:00')
GROUP BY o_year
""",
)


# --- Q9: profit by supplier nation and year --------------------------------

_Q9_NAME, _Q9_COST = "widget", 0.6


def _q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.nation_profit(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "part"), _Q9_NAME, cost_factor=_Q9_COST,
    )


_register(
    "nation_profit",
    _q_nation_profit,
    f"""
SELECT supp_nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (
  SELECT ns.n_name AS supp_nation, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount)
           - {_Q9_COST} * p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey
  WHERE contains(p_name, '{_Q9_NAME}'))
GROUP BY 1, 2
""",
)


# --- Q6: discount-band revenue opportunity ---------------------------------

_Q6 = dict(start="1996-01-01", end="1997-01-01", disc_lo=0.05, disc_hi=0.07,
           max_qty=24.0)


def _q_discount_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ds.discount_opportunity(_t(spark, sf_dir, "lineitem"), **_Q6)


_register(
    "discount_opportunity",
    _q_discount_opportunity,
    f"""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6["start"]} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{_Q6["end"]} 00:00:00'
  AND l_discount >= {_Q6["disc_lo"]} AND l_discount <= {_Q6["disc_hi"]}
  AND l_quantity < {_Q6["max_qty"]}
""",
)
