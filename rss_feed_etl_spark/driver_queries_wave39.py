"""Driver-contract queries, wave 39: CCNet-style paragraph-grain corpus
dedup, Kaplan-Meier user-lifetime survival, and exponential time-decay
multi-touch attribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _hexfold
from .operators import dedup, eventanalytics as ea

# --- paragraph-grain keep-first dedup --------------------------------------

_P_WIDTH = 15


def _q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.paragraph_dedup(
        td.load_table(spark, sf_dir, "documents"), width=_P_WIDTH
    )


_register(
    "paragraph_dedup",
    _q_paragraph_dedup,
    f"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
p AS (SELECT doc_id, CAST(i AS INT) AS pos,
             array_to_string(
               w[CAST(i*{_P_WIDTH}+1 AS INT):CAST((i+1)*{_P_WIDTH} AS INT)], ' ') AS para
      FROM (SELECT doc_id, w,
                   unnest(range(CAST(ceil(len(w)/{_P_WIDTH}.0) AS BIGINT))) AS i
            FROM t)),
r AS (SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY {_hexfold('para')}
                                ORDER BY doc_id, pos) AS rn
      FROM p),
k AS (SELECT doc_id,
             array_to_string(list(para ORDER BY pos), ' ') AS clean_text,
             CAST(count(*) AS BIGINT) AS n_kept
      FROM r WHERE rn = 1 GROUP BY doc_id)
SELECT t.doc_id, coalesce(k.clean_text, '') AS clean_text,
       CAST(ceil(len(t.w)/{_P_WIDTH}.0) AS BIGINT) AS n_paras,
       coalesce(k.n_kept, 0) AS n_kept
FROM t LEFT JOIN k ON t.doc_id = k.doc_id
""",
)


# --- Kaplan-Meier survival --------------------------------------------------

_KM_CENSOR = 3


def _q_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.kaplan_meier(
        td.load_table(spark, sf_dir, "events"), censor_days=_KM_CENSOR
    )


_register(
    "km_survival",
    _q_km,
    f"""
WITH pu AS (SELECT user_id, min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l
            FROM events GROUP BY 1),
h AS (SELECT max(CAST(ts AS DATE)) AS m FROM events),
fl AS (SELECT date_diff('day', f, l) AS duration_days,
              CASE WHEN l <= m - {_KM_CENSOR} THEN 1 ELSE 0 END AS e
       FROM pu, h),
g AS (SELECT duration_days, CAST(sum(e) AS BIGINT) AS n_events,
             CAST(sum(1 - e) AS BIGINT) AS n_censored
      FROM fl GROUP BY 1),
a AS (SELECT *, CAST(sum(n_events + n_censored) OVER (
             ORDER BY duration_days DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
      FROM g),
s AS (SELECT *,
             max(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END) OVER w2 AS dead,
             sum(CASE WHEN n_events < n_risk
                      THEN ln(1 - n_events / CAST(n_risk AS DOUBLE)) END)
               OVER w2 AS cum
      FROM a
      WINDOW w2 AS (ORDER BY duration_days ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT duration_days, n_risk, n_events, n_censored,
       CASE WHEN dead = 1 THEN 0.0
            ELSE round(exp(coalesce(cum, 0.0)), 6) END AS survival
FROM s
""",
)


# --- time-decay attribution -------------------------------------------------

_TDA_SOURCES = ["view", "click"]
_TDA_HL = 7.0


def _q_tda(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.time_decay_attribution(
        td.load_table(spark, sf_dir, "events"),
        source_types=_TDA_SOURCES,
        half_life_days=_TDA_HL,
    )


_register(
    "time_decay_attribution",
    _q_tda,
    f"""
WITH e AS (SELECT events.*,
        (epoch(ts) - min(epoch(ts)) OVER (PARTITION BY user_id)) / 86400.0 AS d
      FROM events),
r AS (SELECT *,
        sum(CASE WHEN event_type = 'view' THEN pow(2.0, d / {_TDA_HL})
                 ELSE 0.0 END) OVER w AS rs0,
        sum(CASE WHEN event_type = 'click' THEN pow(2.0, d / {_TDA_HL})
                 ELSE 0.0 END) OVER w AS rs1
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
c AS (SELECT value,
             rs0 * pow(2.0, -d / {_TDA_HL}) AS w0,
             rs1 * pow(2.0, -d / {_TDA_HL}) AS w1
      FROM r WHERE event_type = 'purchase'),
u AS (
  SELECT 'view' AS source,
         CASE WHEN w0 + w1 > 0 THEN w0 / (w0 + w1) ELSE 0.0 END AS share,
         value FROM c
  UNION ALL
  SELECT 'click',
         CASE WHEN w0 + w1 > 0 THEN w1 / (w0 + w1) ELSE 0.0 END, value FROM c
  UNION ALL
  SELECT 'direct',
         CASE WHEN w0 + w1 > 0 THEN 0.0 ELSE 1.0 END, value FROM c)
SELECT source, round(sum(share), 3) AS credited_conversions,
       round(sum(share * value), 2) AS credited_value
FROM u GROUP BY 1
""",
)
