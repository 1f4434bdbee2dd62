"""Driver-contract queries, wave 8: promo revenue ratio (the last unused
testdata table, ``part``, joins the fact scan) and the custom-UDAF surface
(Arrow grouped-agg pandas UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register

# --- promo revenue ratio (TPC-H Q14 shape) --------------------------------


def _q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from PROMO-type parts, by month.  ``part`` is a
    dimension — broadcast, so the only exchange is the final month-grain
    aggregation; revenue sums in DECIMAL for bit-exact oracle parity.
    Conditional aggregation (sum-when) replaces Q14's two-scan ratio."""
    li = td.load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        td.load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(12,2)"))), 2)
            .cast("double")
            .alias("promo_revenue"),
            F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
            # ratio in DOUBLE: the sums are exact decimals on both engines,
            # but decimal DIVISION scale/rounding rules differ between
            # Spark and DuckDB — casting the operands first makes the
            # division bit-identical
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(12,2)"))).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_pct"),
        )
    )


_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
_PROMO = f"CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE CAST(0 AS DECIMAL(12,2)) END"
_register(
    "promo_revenue_ratio",
    _q_promo_revenue,
    f"""
SELECT date_trunc('month', l_shipdate) AS ship_month,
       CAST(round(sum({_PROMO}), 2) AS DOUBLE) AS promo_revenue,
       CAST(round(sum({_REV}), 2) AS DOUBLE) AS total_revenue,
       round(100.0 * CAST(sum({_PROMO}) AS DOUBLE) / CAST(sum({_REV}) AS DOUBLE), 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
""",
)


# --- custom UDAF: geometric mean per group --------------------------------


def _q_gmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean of event values per type via an Arrow grouped-agg
    pandas UDF — the engine's UDAF registration surface (SURVEY §2.10,
    absent in the reference).  One batch per (group × partition) reaches
    Python; Spark plans it like any aggregate (partial pieces stay JVM-side,
    the UDF sees each group's values Arrow-batched).  The log-space mean is
    rounded to 6dp so cross-engine float summation order cannot surface."""
    from .operators.udafs import gmean_udaf as gmean
    from .session import ensure_executors_can_import

    ensure_executors_can_import(spark)

    ev = td.load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(F.round(gmean("value"), 6).alias("gmean_value"))
    )


_register(
    "gmean_value_udaf",
    _q_gmean,
    """
SELECT event_type,
       round(exp(avg(ln(value))), 6) AS gmean_value
FROM events WHERE value > 0
GROUP BY event_type
""",
)


# --- nearest-centroid classification over labeled embeddings --------------


def _q_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import nearest_centroid_confusion

    emb = td.load_table(spark, sf_dir, "embeddings")
    return nearest_centroid_confusion(emb)


def _centroid_sql() -> str:
    from .driver_queries_corpus import _cos_sql

    return f"""
WITH comp AS (
  SELECT label AS c_label, i - 1 AS pos,
         round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS cv
  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
  GROUP BY label, i),
cent AS (
  SELECT c_label, list(cv ORDER BY pos) AS cvec FROM comp GROUP BY c_label),
scored AS (
  SELECT e.vec_id AS id, e.label AS true_label, c.c_label,
         {_cos_sql("e.embedding", "c.cvec")} AS cos
  FROM embeddings e CROSS JOIN cent c),
assigned AS (
  SELECT id, true_label, c_label AS predicted_label,
         row_number() OVER (PARTITION BY id ORDER BY cos DESC, c_label ASC) AS rn
  FROM scored)
SELECT true_label, predicted_label, count(*) AS n
FROM assigned WHERE rn = 1 GROUP BY 1, 2
"""


_register("label_centroid_confusion", _q_centroid_confusion, _centroid_sql())
