"""Driver-contract queries, wave 27: growth-accounting analytics —
rolling-window stickiness (DAU/WAU), churn candidates, new-vs-returning
daily split, and event-type basket lift.

The rolling DISTINCT in ``daily_stickiness`` is the interesting scale
shape: count_distinct has no window-frame support, so each day-user pair
CONTRIBUTES to its trailing window days via a sequence explode and the
rolling distinct becomes a plain groupBy — day-user-grain shuffles only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import eventanalytics as ea

# --- DAU / rolling WAU stickiness ------------------------------------------

_W_DAYS = 7


def _q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.daily_stickiness(
        td.load_table(spark, sf_dir, "events"), window_days=_W_DAYS
    )


_register(
    "daily_stickiness",
    _q_stickiness,
    f"""
WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id AS u
            FROM events),
contrib AS (SELECT u, unnest(generate_series(day,
                     day + INTERVAL {_W_DAYS - 1} DAY, INTERVAL 1 DAY)) AS tday
            FROM du),
wau AS (SELECT tday, count(DISTINCT u) AS window_active FROM contrib GROUP BY 1),
dau AS (SELECT day, count(DISTINCT u) AS dau FROM du GROUP BY 1)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(dau AS BIGINT) AS dau,
       CAST(window_active AS BIGINT) AS window_active,
       round(dau * 1.0 / window_active, 6) AS stickiness
FROM dau JOIN wau ON dau.day = wau.tday
""",
)


# --- churn candidates ------------------------------------------------------

_CHURN_DAYS = 1


def _q_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.churned_users(
        td.load_table(spark, sf_dir, "events"), inactive_days=_CHURN_DAYS
    )


_register(
    "churned_users",
    _q_churn,
    f"""
WITH l AS (SELECT user_id, max(date_trunc('day', ts)) AS last_day
           FROM events GROUP BY 1),
m AS (SELECT max(date_trunc('day', ts)) AS max_day FROM events)
SELECT user_id, strftime(last_day, '%Y-%m-%d') AS last_day,
       CAST(date_diff('day', last_day, max_day) AS BIGINT) AS days_inactive
FROM l, m
WHERE date_diff('day', last_day, max_day) >= {_CHURN_DAYS}
""",
)


# --- new vs returning ------------------------------------------------------


def _q_nvr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.new_vs_returning(td.load_table(spark, sf_dir, "events"))


_register(
    "new_vs_returning",
    _q_nvr,
    """
WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id AS u
            FROM events),
f AS (SELECT u, min(day) AS first_day FROM du GROUP BY 1)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
           AS new_users,
       CAST(sum(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
           AS returning_users
FROM du JOIN f USING (u) GROUP BY 1
""",
)


# --- event-type basket lift ------------------------------------------------


def _q_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.event_type_lift(td.load_table(spark, sf_dir, "events"))


_register(
    "event_type_lift",
    _q_lift,
    """
WITH b AS (SELECT DISTINCT
             user_id || '#' || strftime(date_trunc('day', ts), '%Y-%m-%d') AS bid,
             event_type AS t
           FROM events),
nb AS (SELECT count(DISTINCT bid) AS n FROM b),
pt AS (SELECT t, count(*) AS nt FROM b GROUP BY 1),
pc AS (SELECT b1.t AS a, b2.t AS b, count(*) AS n_ab
       FROM b b1 JOIN b b2 ON b1.bid = b2.bid AND b1.t < b2.t
       GROUP BY 1, 2)
SELECT a, b, CAST(n_ab AS BIGINT) AS n_ab,
       round(n_ab * 1.0 * n / (pa.nt * pb.nt), 6) AS lift
FROM pc JOIN pt pa ON pc.a = pa.t JOIN pt pb ON pc.b = pb.t, nb
""",
)
