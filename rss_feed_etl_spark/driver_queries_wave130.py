"""Driver-contract queries, wave 130: in-engine logistic regression
(unrolled Newton/IRLS) and UCB1 bandit ranking.

Reference anchor: the reference calls an external LLM for every score
(src/rss_feed_etl/llm/scorer.py); the logistic fit is the in-engine
baseline such calls should beat, and UCB1 is the budget allocator that
decides which arm (source) earns the next expensive call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics, profiling

# --- 1-D logistic fit ---------------------------------------------------------------

_LG_ITERS = 2


def _q_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    staged = ev.select(
        ((F.col("value") - 60.0) / 30.0).alias("x"),
        (F.col("value") + (F.col("event_id") % 40) > 60).cast("int")
        .alias("y"),
    )
    return profiling.logistic_1d_fit(staged, iters=_LG_ITERS)


def _lg_sql() -> str:
    clamp = (
        "least(CAST(1.0 AS DOUBLE) - 1e-9, greatest(CAST(1e-9 AS DOUBLE), "
        "CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-({a} + {b} * x)))))"
    )
    dec = "CAST(sum(CAST(round({t}, 9) AS DECIMAL(38,10))) AS DOUBLE)"
    steps = []
    prev = "s0"
    for i in range(1, _LG_ITERS + 1):
        p = clamp.format(a="a", b="b")
        steps.append(
            f"""st{i} AS (
  SELECT {dec.format(t=f"y - {p}")} AS g0,
         {dec.format(t=f"(y - {p}) * x")} AS g1,
         {dec.format(t=f"{p} * (CAST(1.0 AS DOUBLE) - {p})")} AS h00,
         {dec.format(t=f"{p} * (CAST(1.0 AS DOUBLE) - {p}) * x")} AS h01,
         {dec.format(t=f"{p} * (CAST(1.0 AS DOUBLE) - {p}) * x * x")} AS h11,
         max(a) AS a, max(b) AS b
  FROM rows_, {prev}),
s{i} AS (
  SELECT round(a + (h11 * g0 - h01 * g1)
               / (h00 * h11 - h01 * h01), 9) AS a,
         round(b + (h00 * g1 - h01 * g0)
               / (h00 * h11 - h01 * h01), 9) AS b
  FROM st{i})"""
        )
        prev = f"s{i}"
    pf = clamp.format(a="a", b="b")
    nll = f"-(y * ln({pf}) + (CAST(1.0 AS DOUBLE) - y) * ln(CAST(1.0 AS DOUBLE) - {pf}))"
    return f"""
WITH rows_ AS (
  SELECT (value - 60.0) / 30.0 AS x,
         CASE WHEN value + (event_id % 40) > 60 THEN CAST(1.0 AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS y
  FROM events),
s0 AS (SELECT CAST(0.0 AS DOUBLE) AS a, CAST(0.0 AS DOUBLE) AS b),
{", ".join(steps)}
SELECT CAST(count(*) AS BIGINT) AS n,
       round(max(a), 6) AS a, round(max(b), 6) AS b,
       round({dec.format(t=nll)} / count(*), 6) AS mean_nll
FROM rows_, {prev}
"""


_register("logistic_1d_fit", _q_logistic, _lg_sql())


# --- UCB1 bandit ranking ------------------------------------------------------------

_UCB_TOP = 20


def _q_ucb(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    staged = ev.select(
        F.get_json_object("props", "$.k").cast("long").alias("item"),
        (F.col("event_type") == "purchase").cast("double").alias("reward"),
    ).filter(F.col("item").isNotNull())
    return eventanalytics.ucb1_ranking(staged, top=_UCB_TOP)


_register(
    "ucb1_ranking",
    _q_ucb,
    f"""
WITH staged AS (
  SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS item,
         CASE WHEN event_type = 'purchase' THEN CAST(1.0 AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS reward
  FROM events WHERE json_extract(props, '$.k') IS NOT NULL),
arms AS (SELECT item, CAST(count(*) AS BIGINT) AS n_pulls,
                sum(reward) AS rsum
         FROM staged GROUP BY 1),
tot AS (SELECT CAST(sum(n_pulls) AS DOUBLE) AS N FROM arms)
SELECT item, n_pulls,
       round(rsum / n_pulls, 6) AS mean_reward,
       round(rsum / n_pulls + sqrt(2.0 * ln(N) / n_pulls), 6) AS ucb
FROM arms, tot
ORDER BY ucb DESC, item ASC LIMIT {_UCB_TOP}
""",
)
