"""Driver-contract queries, wave 146: Ljung-Box whiteness statistic and
the Hill tail-index estimator.

Reference anchor: the reference's monitoring is a lookback-window
re-scan with no notion of structure (run_job_filter.py date windows);
Ljung-Box turns the registered ACF into the one thresholdable whiteness
number, and the Hill estimator completes the frequency-law pair started
by ``zipf_fit`` (OLS over the whole curve) with the MLE read of the
top-k tail — the number that says whether dedup/mixing heavy-hitter
guards are sized against a genuinely heavy tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import ORACLES, _register
from .operators import textstats, timeseries

_LB_MAXLAG = 14
_HILL_K = 100

_TRI_TOKS = (
    r"SELECT unnest(list_transform(range(1, len(w) - 1), "
    r"i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok "
    r"FROM (SELECT string_split_regex(trim(lower(text)), '\s+') AS w "
    r"FROM documents)"
)


def _q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    return timeseries.ljung_box_q(ev, max_lag=_LB_MAXLAG)


# Q cumulates the REGISTERED acf oracle's rounded r_j (identical doubles
# on both engines), with per-lag terms rounded to 9 dp and DECIMAL-summed.
_register(
    "ljung_box_whiteness",
    _q_ljung_box,
    f"""
WITH acf AS (SELECT * FROM ({ORACLES["daily_autocorrelation"]}) t),
nd AS (SELECT CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days
       FROM events),
staged AS (
  SELECT lag, n_days, acf,
         round((acf * acf) / CAST(n_days - lag AS DOUBLE), 9) AS term
  FROM acf CROSS JOIN nd)
SELECT lag, n_days, acf,
       round(CAST(n_days AS DOUBLE) * (n_days + 2)
             * CAST(sum(CAST(term AS DECIMAL(30,10))) OVER (
                 ORDER BY lag ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE), 6) AS q_stat
FROM staged
""",
)


def _q_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return textstats.hill_tail_index(docs, k=_HILL_K)


_register(
    "hill_tail_index",
    _q_hill,
    f"""
WITH tris AS ({_TRI_TOKS}),
counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS f FROM tris GROUP BY 1),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM counts),
top AS (SELECT f, tok FROM counts
        ORDER BY f DESC, tok ASC LIMIT {_HILL_K + 1}),
ranked AS (SELECT f, round(ln(CAST(f AS DOUBLE)), 9) AS lnf,
                  row_number() OVER (ORDER BY f DESC, tok ASC) AS r
           FROM top),
head AS (SELECT CAST(sum(CAST(lnf AS DECIMAL(30,10))) AS DOUBLE)
                  / {float(_HILL_K)} AS mean_ln
         FROM ranked WHERE r <= {_HILL_K}),
boundary AS (SELECT f AS f_k1, lnf AS ln_k1 FROM ranked
             WHERE r = {_HILL_K + 1})
SELECT CAST({_HILL_K} AS BIGINT) AS k, n_types, f_k1,
       CASE WHEN mean_ln > ln_k1
            THEN round(1.0 / (mean_ln - ln_k1), 6) END AS hill_alpha
FROM boundary CROSS JOIN head CROSS JOIN nt
""",
)
