"""Driver-contract queries, wave 14: adjacent-bigram counts (one BPE merge
step) and last-touch conversion attribution."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .driver_queries_corpus import _W
from .operators import eventanalytics as ea
from .operators import textstats

# --- adjacent bigrams ------------------------------------------------------

_BG_TOP = 30


def _q_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.top_bigrams(
        td.load_table(spark, sf_dir, "documents"), top=_BG_TOP
    )


_register(
    "top_bigrams",
    _q_bigrams,
    f"""
WITH t AS (SELECT {_W} AS w FROM documents),
p AS (SELECT w[i] AS term_a, w[i + 1] AS term_b
      FROM t CROSS JOIN LATERAL (SELECT unnest(range(1, len(w))) AS i) _)
SELECT term_a, term_b, count(*) AS n
FROM p GROUP BY 1, 2
ORDER BY n DESC, term_a ASC, term_b ASC
LIMIT {_BG_TOP}
""",
)


# --- last-touch attribution ------------------------------------------------

_ATTR_SOURCES = ["view", "click"]
_ATTR_DAYS = 7


def _q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ea.last_touch_attribution(
        td.load_table(spark, sf_dir, "events"),
        source_types=_ATTR_SOURCES,
        max_age_days=_ATTR_DAYS,
    )


_SRC_LIST = ", ".join(f"'{s}'" for s in _ATTR_SOURCES)
_register(
    "last_touch_attribution",
    _q_attribution,
    f"""
WITH flagged AS (
  SELECT event_type, value, ts,
         last_value(CASE WHEN event_type IN ({_SRC_LIST}) THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS src,
         last_value(CASE WHEN event_type IN ({_SRC_LIST}) THEN ts END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS src_ts
  FROM events)
SELECT CASE WHEN src IS NOT NULL AND src_ts >= ts - INTERVAL {_ATTR_DAYS} DAY
            THEN src ELSE 'direct' END AS source,
       count(*) AS n_conversions,
       round(sum(value), 2) AS total_value
FROM flagged WHERE event_type = 'purchase'
GROUP BY 1
""",
)
