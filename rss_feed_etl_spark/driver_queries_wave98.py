"""Driver-contract queries, wave 98: mergeable-histogram incremental
maintenance and token-Gini concentration — the materialized-profile fold
and the template-source detector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata as td
from .driver_queries import _register
from .operators import sketches, textstats

# --- incremental histogram fold ------------------------------------------------

_H_LO, _H_HI, _H_BINS = 0.0, 500.0, 20
_H_SPLIT = td.CUTOFF[:10]


def _q_hist_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    old = ev.filter(F.to_date("ts") < F.lit(_H_SPLIT))
    batch = ev.filter(F.to_date("ts") >= F.lit(_H_SPLIT))
    old_hist = old.groupBy(
        F.width_bucket("value", F.lit(_H_LO), F.lit(_H_HI), F.lit(_H_BINS))
        .cast("bigint")
        .alias("bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(30,10)")).alias("total_exact"),
    )
    # total_exact is persistence state for the NEXT fold, not part of the
    # maintained view the oracle recomputes
    return sketches.incremental_histogram_fold(
        old_hist, batch, lo=_H_LO, hi=_H_HI, n_bins=_H_BINS
    ).drop("total_exact")


_register(
    "incremental_histogram_fold",
    _q_hist_fold,
    f"""
SELECT CASE WHEN value < {_H_LO} THEN 0
            WHEN value >= {_H_HI} THEN {_H_BINS + 1}
            ELSE CAST(floor((value - {_H_LO}) / {(_H_HI - _H_LO) / _H_BINS}) AS BIGINT) + 1
       END AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 2) AS total
FROM events GROUP BY 1
""",
)


# --- token Gini by source --------------------------------------------------------


def _q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_gini_by_source(td.load_table(spark, sf_dir, "documents"))


_register(
    "token_gini_by_source",
    _q_gini,
    r"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
  FROM documents),
c AS (SELECT source, tok, count(*) AS f FROM toks GROUP BY 1, 2),
ff AS (SELECT source, f, count(*) AS m FROM c GROUP BY 1, 2),
r AS (
  SELECT source, f, m,
         sum(m) OVER (PARTITION BY source ORDER BY f
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
  FROM ff),
g AS (
  SELECT source,
         sum(m) AS n_types,
         sum(CAST(f AS DECIMAL(38,0)) * m) AS tot,
         sum(CAST(f AS DECIMAL(38,0))
             * (cm * (cm + 1) - (cm - m) * (cm - m + 1))) AS ws2
  FROM r GROUP BY 1)
SELECT source,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(tot AS BIGINT) AS n_tokens,
       round(CAST(ws2 AS DOUBLE)
               / (CAST(n_types AS DOUBLE) * CAST(tot AS DOUBLE))
             - (CAST(n_types AS DOUBLE) + 1.0) / CAST(n_types AS DOUBLE),
             6) AS gini
FROM g
""",
)
